"""quantile_windows / dfspan contract (reference src:348-387 and
test/runtests.jl:21-29): n contiguous closed-open windows tiling the
covering span, equal widths to within 1ns, integer-floor boundaries,
label handling, min_duration ignored, None on empty input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframeintervals_jl_spark import dfspan, quantile_windows

from .conftest import make_span_df


def _windows(df):
    return [
        (r["span"]["start"], r["span"]["stop"], r[1])
        for r in df.orderBy("index").collect()
    ]


def test_windows_tile_span_exactly(spark, spans_df):
    lo, hi = dfspan(spans_df)
    for n in (1, 3, 4, 7, 100):
        w = quantile_windows(spark, n, spans_df)
        rows = _windows(w)
        assert len(rows) == n
        assert rows[0][0] == lo and rows[-1][1] == hi
        # contiguity: each window starts where the previous stopped
        for (_, stop_prev, _), (start_next, _, _) in zip(rows, rows[1:]):
            assert start_next == stop_prev
        # equal width to within 1ns (reference test:23-29)
        widths = {stop - start for start, stop, _ in rows}
        assert max(widths) - min(widths) <= 1
        # exact reference boundary formula: lo + (i*(hi-lo))//n
        for i, (start, stop, idx) in enumerate(rows):
            assert start == lo + (i * (hi - lo)) // n
            assert idx == i + 1


def test_window_boundaries_no_float_drift(spark):
    # epoch-ns magnitudes are beyond float64's 2^53 integer range; the
    # boundaries must still be exact integers from the floor formula.
    lo = 1_700_000_000_000_000_001
    hi = 1_700_000_000_000_000_001 + 7_777_777_777_777
    n = 13
    w = quantile_windows(spark, n, (lo, hi))
    for i, (start, stop, _) in enumerate(_windows(w)):
        assert start == lo + (i * (hi - lo)) // n
        assert stop == lo + ((i + 1) * (hi - lo)) // n


def test_label_name_and_values(spark):
    w = quantile_windows(spark, 4, (0, 400), label="quarter")
    assert w.columns == ["span", "quarter"]
    assert [r["quarter"] for r in w.orderBy("quarter").collect()] == [1, 2, 3, 4]

    w2 = quantile_windows(spark, 3, (0, 300), label=("name", ["a", "b", "c"]))
    assert w2.columns == ["span", "name"]
    assert sorted(r["name"] for r in w2.collect()) == ["a", "b", "c"]

    with pytest.raises(ValueError, match="length 3"):
        quantile_windows(spark, 3, (0, 300), label=("name", ["a"]))


def test_min_duration_accepted_and_ignored(spark):
    # dead parameter in the reference v0.2.0 (src:368-372): same output
    a = quantile_windows(spark, 4, (0, 400)).collect()
    b = quantile_windows(spark, 4, (0, 400), min_duration=10**18).collect()
    assert a == b


def test_empty_input_returns_none(spark):
    empty = make_span_df(spark, []).limit(0)
    assert quantile_windows(spark, 4, empty) is None
    assert dfspan(empty) is None
    assert quantile_windows(spark, 4, None) is None


def test_dfspan_values(spark):
    df = make_span_df(spark, [(5, 10), (0, 3), (7, 20)])
    assert dfspan(df) == (0, 20)


def test_custom_spancol(spark):
    df = make_span_df(spark, [(0, 100)]).withColumnRenamed("span", "period")
    assert dfspan(df, "period") == (0, 100)
    w = quantile_windows(spark, 2, df, spancol="period")
    assert w.columns == ["period", "index"]


# ---------------------------------------------------------------------------
# data_quantile_windows (equal-count extension, not in the reference)
# ---------------------------------------------------------------------------


def _dq_bounds(win_rows):
    rows = sorted(win_rows, key=lambda r: r["index"])
    return [r["span"]["start"] for r in rows] + [rows[-1]["span"]["stop"] - 1]


def test_data_quantiles_match_sorted_brute_force(spark):
    import random

    from dataframeintervals_jl_spark import data_quantile_windows

    rng = random.Random(1234)
    # heavy ties + extreme magnitudes + negatives in one column
    vals = (
        [rng.randrange(-(10**18), 10**18) for _ in range(3000)]
        + [42] * 400
        + [-(10**17)] * 250
        + [0, 1, -1]
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sv = sorted(vals)
    big_n = len(sv)
    for n in (1, 2, 5, 16, 33):
        win = data_quantile_windows(df, n, "v").collect()
        assert len(win) == n
        expected = [sv[(k * (big_n - 1)) // n] for k in range(n + 1)]
        assert _dq_bounds(win) == expected


def test_data_quantiles_counts_cover_all_rows(spark):
    from dataframeintervals_jl_spark import data_quantile_windows

    vals = [(i * i * 7919) % 100003 for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    win = data_quantile_windows(df, 8, "v")
    flat = win.select(
        "index",
        F.col("span.start").alias("s"),
        F.col("span.stop").alias("e"),
    )
    joined = df.join(
        F.broadcast(flat), (F.col("v") >= F.col("s")) & (F.col("v") < F.col("e"))
    )
    # windows partition the data: every row lands in exactly one window
    assert joined.count() == len(vals)
    counts = {
        r["index"]: r["cnt"]
        for r in joined.groupBy("index").agg(F.count("*").alias("cnt")).collect()
    }
    # near-equal counts (ties can skew, this fixture has none)
    assert max(counts.values()) - min(counts.values()) <= len(vals) // 8


def test_data_quantiles_empty_and_errors(spark):
    import pytest as _pytest

    from dataframeintervals_jl_spark import data_quantile_windows

    df = spark.createDataFrame([(1,)], "v long")
    assert data_quantile_windows(df.filter("v > 5"), 4, "v") is None
    with _pytest.raises(ValueError, match="n must be"):
        data_quantile_windows(df, 0, "v")


def test_exact_quantile_longs_small_ranges(spark):
    from dataframeintervals_jl_spark import exact_quantile_longs

    vals = [5, 5, 5, 7, 9]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = exact_quantile_longs(df, "v", [1, 2, 3, 4, 5], 5, 9, 5, buckets=2)
    assert got == [5, 5, 5, 7, 9]


def test_split_spans_tiles_parent_exactly(spark):
    from dataframeintervals_jl_spark.operators.quantile_windows import (
        split_spans,
    )

    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [({"start": 0, "stop": 10}, 0), ({"start": 5, "stop": 7}, 1),
         ({"start": 3, "stop": 3}, 2)],  # zero-width parent
        "span struct<start: long, stop: long>, rid long",
    )
    out = split_spans(df, 3)
    rows = sorted(
        (r["rid"], r["sub_index"], r["span"]["start"], r["span"]["stop"])
        for r in out.collect()
    )
    # parent [0,10): widths 4,3,3 — floor boundaries 0,3(+1),6(+?) ->
    # b_i = (i*10)//3: 0,3,6,10
    assert [(s, e) for rid, i, s, e in rows if rid == 0] == [
        (0, 3), (3, 6), (6, 10)
    ]
    assert [(s, e) for rid, i, s, e in rows if rid == 1] == [
        (5, 5), (5, 6), (6, 7)
    ]
    # zero-width parent: 3 empty sub-spans, coverage preserved (none)
    assert [(s, e) for rid, i, s, e in rows if rid == 2] == [
        (3, 3), (3, 3), (3, 3)
    ]
    # tiling invariant on every row: first=parent.start, last=parent.stop,
    # adjacent boundaries meet
    per = {}
    for rid, i, s, e in rows:
        per.setdefault(rid, []).append((i, s, e))
    for rid, subs in per.items():
        subs.sort()
        assert subs[0][1] == {0: 0, 1: 5, 2: 3}[rid]
        assert subs[-1][2] == {0: 10, 1: 7, 2: 3}[rid]
        for (_i1, _s1, e1), (_i2, s2, _e2) in zip(subs, subs[1:]):
            assert e1 == s2
    with pytest.raises(ValueError, match="n must be"):
        split_spans(df, 0)


def test_split_spans_date_domain(spark):
    import datetime as dt

    from pyspark.sql import types as T

    from dataframeintervals_jl_spark.operators.quantile_windows import (
        split_spans,
    )

    D = dt.date
    df = spark.createDataFrame(
        [({"start": D(2024, 1, 1), "stop": D(2024, 1, 11)}, 0)],
        "span struct<start: date, stop: date>, rid long",
    )
    out = split_spans(df, 2)
    got = sorted(
        (r["sub_index"], r["span"]["start"], r["span"]["stop"])
        for r in out.collect()
    )
    assert got == [
        (1, D(2024, 1, 1), D(2024, 1, 6)),
        (2, D(2024, 1, 6), D(2024, 1, 11)),
    ]
    assert isinstance(
        out.schema["span"].dataType.fields[0].dataType, T.DateType
    )
