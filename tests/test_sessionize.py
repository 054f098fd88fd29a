"""sessionize (batch) and the streaming counterparts: gap-boundary
semantics, span construction, and batch/stream consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframeintervals_jl_spark import sessionize
from dataframeintervals_jl_spark.streaming import (
    stream_sessionize,
    stream_tumbling_agg,
)

US = 1_000  # ns per µs — streaming ops are µs-resolution


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts long")


def _spans(df):
    return sorted(
        (r["user_id"], r["span"]["start"], r["span"]["stop"], r["n_events"])
        for r in df.collect()
    )


def test_sessionize_basic(spark):
    ev = _events(
        spark,
        [(1, 0), (1, 10), (1, 25), (1, 100), (1, 105), (2, 7)],
    )
    out = sessionize(ev, gap=20, ts_col="ts", by="user_id")
    assert _spans(out) == [
        (1, 0, 25, 3),  # 0,10,25 chain (gaps 10, 15 <= 20)
        (1, 100, 105, 2),
        (2, 7, 7, 1),  # singleton: zero-width [t, t)
    ]
    assert out.columns == ["user_id", "session_id", "span", "n_events"]


def test_gap_boundary_inclusive(spark):
    """diff == gap stays in the session (strict > breaks)."""
    ev = _events(spark, [(1, 0), (1, 20), (1, 41)])
    out = sessionize(ev, gap=20, ts_col="ts", by="user_id")
    assert _spans(out) == [(1, 0, 20, 2), (1, 41, 41, 1)]


def test_extend_by_gap(spark):
    ev = _events(spark, [(1, 0), (1, 10)])
    out = sessionize(ev, gap=20, ts_col="ts", by="user_id", extend_by_gap=True)
    assert _spans(out) == [(1, 0, 30, 2)]


def test_session_ids_sequential_per_key(spark):
    ev = _events(spark, [(1, 0), (1, 100), (1, 200), (2, 0)])
    out = sessionize(ev, gap=20, ts_col="ts", by="user_id")
    ids = sorted(
        (r["user_id"], r["session_id"]) for r in out.collect()
    )
    assert ids == [(1, 1), (1, 2), (1, 3), (2, 1)]


def test_gap_must_be_positive(spark):
    with pytest.raises(ValueError, match="positive"):
        sessionize(_events(spark, [(1, 0)]), gap=0)


def test_stream_sessionize_batch_mode_matches_semantics(spark):
    """session_window (batch mode): break at diff >= gap, stop = last+gap.
    Timestamps in whole µs so the ns->timestamp conversion is lossless."""
    ev = _events(
        spark,
        [(1, 0), (1, 10 * US), (1, 29 * US), (1, 100 * US), (2, 7 * US)],
    )
    out = stream_sessionize(ev, gap_ns=20 * US, ts_col="ts", by="user_id")
    # chaining: [0,20) + 10 -> [0,30) + 29 -> [0,49); 100 starts fresh
    assert _spans(out) == [
        (1, 0, 49 * US, 3),
        (1, 100 * US, 120 * US, 1),
        (2, 7 * US, 27 * US, 1),
    ]


def test_stream_vs_batch_sessionize_on_events_shape(spark):
    """On µs-aligned data, session_window == batch sessionize with
    extend_by_gap, except at exact-gap boundaries (none here)."""
    rows = [
        (u, (u * 977 + i * i * 131) % 5_000 * US) for u in (1, 2, 3) for i in range(30)
    ]
    ev = _events(spark, rows).distinct()
    gap = 300 * US
    a = _spans(stream_sessionize(ev, gap_ns=gap, ts_col="ts", by="user_id"))
    b = _spans(
        sessionize(ev, gap=gap, ts_col="ts", by="user_id", extend_by_gap=True).drop(
            "session_id"
        )
    )
    # no two consecutive events in this data differ by exactly `gap`
    assert a == b


def test_stream_tumbling_agg_batch_mode(spark):
    ev = spark.createDataFrame(
        [(1, 0, 1.0), (1, 5 * US, 3.0), (1, 10 * US, 10.0), (2, 12 * US, 4.0)],
        "user_id long, ts long, value double",
    )
    out = stream_tumbling_agg(
        ev,
        width_ns=10 * US,
        aggs=[F.sum("value").alias("sum_v"), F.count(F.lit(1)).alias("n")],
        ts_col="ts",
        by="user_id",
    )
    rows = sorted(
        (r["user_id"], r["span"]["start"], r["span"]["stop"], r["sum_v"], r["n"])
        for r in out.collect()
    )
    assert rows == [
        (1, 0, 10 * US, 4.0, 2),
        (1, 10 * US, 20 * US, 10.0, 1),
        (2, 10 * US, 20 * US, 4.0, 1),
    ]


def test_streaming_plan_builds(spark, tmp_path):
    """The streaming path itself: rate-source plan with watermark +
    session_window must pass analysis (no execution needed)."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(
            F.col("value").alias("user_id"),
            (F.unix_micros("timestamp") * 1000).alias("ts"),
        )
    )
    out = stream_sessionize(stream, gap_ns=10**9, ts_col="ts", by="user_id")
    assert out.isStreaming
    # analysis succeeds -> schema resolvable
    assert [f.name for f in out.schema.fields] == ["user_id", "span", "n_events"]
