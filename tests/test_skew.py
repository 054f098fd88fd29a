"""Salted-join: result parity with the plain join + the salted
shuffle mechanism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframeintervals_jl_spark import salted_join


@pytest.fixture()
def skewed(spark):
    # 500 rows on hot key 0, a trickle elsewhere, key 7 unmatched-left
    rows = [(0, i) for i in range(500)] + [(k, k) for k in range(1, 8)]
    left = spark.createDataFrame(rows, "k long, v long")
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(7)], "k long, name string"
    )
    return left, right


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_matches_plain(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", n_salt=4)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _multiset(salted.select(*plain.columns)) == _multiset(plain)


def test_salted_left_keeps_unmatched_once(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k", "left")
    salted = salted_join(left, right, "k", n_salt=4, how="left")
    assert _multiset(salted.select(*plain.columns)) == _multiset(plain)
    # the unmatched key appears exactly once, not once per salt
    assert salted.filter(F.col("k") == 7).count() == 1


def test_salted_join_shuffles_on_salt(spark, skewed):
    """With broadcast disabled (the regime salting exists for), the
    exchange must hash on (k, salt) — the hot key provably spreads."""
    left, right = skewed
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            salted_join(left, right, "k", n_salt=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert "__salt" in plan.split("Exchange hashpartitioning", 1)[1][:120]


def test_salted_join_rejects_bad_args(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, "k", n_salt=1)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


def test_key_skew_report_exact_small(spark):
    """Known zipf-ish key distribution: summary columns exact; sketch
    quantiles equal exact type-1 quantiles when k covers all keys."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.operators.skew import key_skew_report

    # key i in 0..29 appears (i+1) times; key 99 is hot with 400 rows
    df = spark.range(30).select(
        F.explode(F.expr("array_repeat(id, int(id + 1))")).alias("k")
    ).unionByName(
        spark.range(400).select(F.lit(99).alias("k"))
    )
    rows = key_skew_report(
        df, "k", probs_ppm=[0, 500_000, 1_000_000], k=1024
    ).collect()
    got = {r["prob_ppm"]: r for r in rows}
    n_keys, total = 31, sum(range(1, 31)) + 400
    cnts = sorted(list(range(1, 31)) + [400])
    for ppm in (0, 500_000, 1_000_000):
        r = got[ppm]
        assert (r["n_keys"], r["max_cnt"], r["total_rows"]) == (
            n_keys, 400, total)
        assert r["mean_cnt"] == total // n_keys
        assert r["cnt_quantile"] == cnts[ppm * (n_keys - 1) // 1_000_000]
        assert r["n_sample"] == n_keys
