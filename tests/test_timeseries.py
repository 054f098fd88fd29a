"""time_grid / resample_locf / sliding_window_agg / decontaminate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframeintervals_jl_spark.operators.dedup import decontaminate
from dataframeintervals_jl_spark.operators.timeseries import (
    resample_locf,
    sliding_window_agg,
    time_grid,
)


def _obs(spark):
    # two keys; key 1 spans [100, 370], key 2 a single point
    rows = [
        (1, 100, 1.0),
        (1, 250, 2.0),
        (1, 370, 3.0),
        (2, 1000, 9.0),
    ]
    return spark.createDataFrame(rows, "k int, ts long, v double")


def test_time_grid_keyed(spark):
    g = time_grid(_obs(spark), on="ts", step=100, by="k")
    got = {(r["k"], r["ts"]) for r in g.collect()}
    assert got == {(1, 100), (1, 200), (1, 300), (2, 1000)}


def test_time_grid_keyless_and_validation(spark):
    g = time_grid(_obs(spark), on="ts", step=500)
    assert {r["ts"] for r in g.collect()} == {0, 500, 1000}
    with pytest.raises(ValueError, match="step"):
        time_grid(_obs(spark), on="ts", step=0)


def test_resample_locf_carries_and_nulls(spark):
    out = resample_locf(_obs(spark), on="ts", step=100, by="k")
    got = {
        (r["k"], r["ts"]): (r["ts_right"], r["v_right"]) for r in out.collect()
    }
    assert got == {
        (1, 100): (100, 1.0),
        (1, 200): (100, 1.0),  # carried forward
        (1, 300): (250, 2.0),
        (2, 1000): (1000, 9.0),
    }


def test_resample_locf_tolerance(spark):
    out = resample_locf(_obs(spark), on="ts", step=100, by="k", tolerance=50)
    got = {
        (r["k"], r["ts"]): (r["ts_right"], r["v_right"]) for r in out.collect()
    }
    # grid 200 is 100ns after obs@100 -> outside tolerance, nulled
    assert got[(1, 200)] == (None, None)
    assert got[(1, 100)] == (100, 1.0)


def test_sliding_window_membership(spark):
    df = spark.createDataFrame([(0, 10.0), (25, 20.0), (99, 30.0)], "ts long, v double")
    out = sliding_window_agg(
        df,
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
        on="ts",
        length=40,
        slide=10,
    )
    got = {r["w_start"]: (r["w_end"], r["n"], r["s"]) for r in out.collect()}
    # each event appears in exactly length/slide = 4 windows
    assert sum(n for (_, n, _) in got.values()) == 12
    # ts=0 lands in starts {-30,-20,-10,0}; ts=25 in {-10,0,10,20}
    assert got[0] == (40, 2, 30.0)
    assert got[-10] == (30, 2, 30.0)
    assert got[20] == (60, 1, 20.0)
    # every window satisfies w_start <= ts < w_end for its members
    assert all(we == ws + 40 for ws, (we, _, _) in got.items())


def test_sliding_window_tumbling_degenerate_and_errors(spark):
    df = spark.createDataFrame([(5, 1.0), (15, 2.0)], "ts long, v double")
    out = sliding_window_agg(
        df, aggs=[F.count(F.lit(1)).alias("n")], on="ts", length=10, slide=10
    )
    got = {r["w_start"]: r["n"] for r in out.collect()}
    assert got == {0: 1, 10: 1}
    with pytest.raises(ValueError, match="length % slide"):
        sliding_window_agg(df, aggs=[F.count(F.lit(1)).alias("n")], length=25, slide=10)


def test_sliding_window_keyed(spark):
    df = spark.createDataFrame(
        [(0, "a"), (5, "b"), (12, "a")], "ts long, g string"
    )
    out = sliding_window_agg(
        df,
        aggs=[F.count(F.lit(1)).alias("n")],
        on="ts",
        length=20,
        slide=10,
        by="g",
    )
    got = {(r["g"], r["w_start"]): r["n"] for r in out.collect()}
    assert got == {
        ("a", -10): 1,
        ("a", 0): 2,
        ("a", 10): 1,
        ("b", -10): 1,
        ("b", 0): 1,
    }


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("portable", [False, True])
def test_decontaminate(spark, portable):
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 3-gram runs
            (2, "zeta eta theta iota"),  # clean
            (3, "alpha beta gamma zeta"),  # shares exactly one 3-gram
        ],
    )
    eval_df = _docs(spark, [(100, "alpha beta gamma delta phi")])
    out = decontaminate(
        corpus, eval_df, shingle_k=3, min_overlap=2, portable=portable
    )
    got = {r["doc_id"]: (r["n_overlap"], r["contaminated"]) for r in out.collect()}
    # doc 1 shares "alpha beta gamma" + "beta gamma delta"; doc 3 one
    assert got == {1: (2, True), 2: (0, False), 3: (1, False)}


def test_decontaminate_short_doc_whole_text_shingle(spark):
    # docs shorter than k collapse to one whole-text shingle
    corpus = _docs(spark, [(1, "tiny doc"), (2, "other words")])
    eval_df = _docs(spark, [(9, "tiny doc")])
    out = decontaminate(corpus, eval_df, shingle_k=5, min_overlap=1)
    got = {r["doc_id"]: r["contaminated"] for r in out.collect()}
    assert got == {1: True, 2: False}
