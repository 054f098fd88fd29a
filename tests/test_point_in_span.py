"""point_in_span_join — stabbing semantics, boundary behavior, and the
zero-width-span trap it exists to avoid."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframeintervals_jl_spark.operators.interval_join import (
    interval_join,
    point_in_span_join,
)
from dataframeintervals_jl_spark.functions.spans import make_span

E = 1_700_000_000_000_000_000


@pytest.fixture()
def spans_df(spark):
    rows = [
        (1, E + 0, E + 100),
        (2, E + 100, E + 200),  # touching: boundary point belongs HERE
        (3, E + 150, E + 300),  # overlaps span 2
    ]
    return spark.createDataFrame(rows, "sid long, s long, e long").select(
        "sid", make_span(F.col("s"), F.col("e")).alias("span")
    )


def _attribution(spark, spans_df, pts):
    pdf = spark.createDataFrame([(i, E + t) for i, t in pts], "pid long, ts long")
    out = point_in_span_join(
        pdf, spans_df, ts_col="ts", validate="skip", strategy="broadcast_right"
    )
    return {(r["pid"], r["sid"]) for r in out.collect()}


def test_stabbing_semantics(spark, spans_df):
    got = _attribution(
        spark, spans_df, [(1, 0), (2, 99), (3, 100), (4, 175), (5, 300), (6, 500)]
    )
    # start inclusive, stop exclusive: point 3 at the touching boundary
    # belongs to the span STARTING at 100, not span 1; point 4 sits in
    # two overlapping spans and matches both; points 5 (== stop) and 6
    # (uncovered) match nothing
    assert got == {(1, 1), (2, 1), (3, 2), (4, 2), (4, 3)}


def test_keep_unmatched(spark, spans_df):
    pdf = spark.createDataFrame([(1, E + 50), (2, E + 999)], "pid long, ts long")
    out = point_in_span_join(
        pdf,
        spans_df,
        ts_col="ts",
        keep_unmatched=True,
        validate="skip",
        strategy="broadcast_right",
    ).collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r["pid"], []).append(r["sid"])
    assert by_pid[1] == [1]
    assert by_pid[2] == [None]  # uncovered point kept, span side null


def test_zero_width_trap_documented(spark, spans_df):
    """The naive zero-width encoding matches nothing — the reason this
    operator exists."""
    pdf = spark.createDataFrame([(1, E + 50)], "pid long, ts long").select(
        "pid", make_span(F.col("ts"), F.col("ts")).alias("span")
    )
    j = interval_join(pdf, spans_df, validate="skip", strategy="broadcast_right")
    assert j.count() == 0


def test_binned_strategy_parity(spark, spans_df):
    pts = [(i, i * 7 % 350) for i in range(100)]
    pdf = spark.createDataFrame([(i, E + t) for i, t in pts], "pid long, ts long")
    broadcast = point_in_span_join(
        pdf, spans_df, ts_col="ts", validate="skip", strategy="broadcast_right"
    )
    binned = point_in_span_join(
        pdf, spans_df, ts_col="ts", validate="skip", strategy="binned"
    )
    key = lambda rows: sorted((r["pid"], r["sid"]) for r in rows)
    assert key(broadcast.collect()) == key(binned.collect())


def test_rejects_non_integral_ts(spark, spans_df):
    pdf = spark.createDataFrame([(1, 1.5)], "pid long, ts double")
    with pytest.raises(ValueError, match="integral"):
        point_in_span_join(pdf, spans_df, ts_col="ts")
