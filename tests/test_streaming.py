"""Streaming operators validated end-to-end on file-source streams
(``availableNow`` trigger drains the whole input, so the streaming
result is comparable row-for-row against the batch operator)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframeintervals_jl_spark.operators.interval_join import interval_join
from dataframeintervals_jl_spark.streaming import (
    stream_interval_join,
    stream_tumbling_agg,
)
from tests.conftest import EPOCH0, make_span_df

US = 1_000  # ns per µs — all fixture endpoints µs-aligned so batch (ns)
# and streaming (µs event time) see identical boundaries
HOUR = 3_600_000_000_000


def _spans(spark, n, width, step, name):
    rows = [(EPOCH0 + i * step * US, EPOCH0 + (i * step + width) * US, i) for i in range(n)]
    return make_span_df(spark, rows, extra=[("rid", __import__("pyspark.sql.types", fromlist=["LongType"]).LongType())]).toDF(
        "span", name
    )


def _roundtrip_stream(spark, df, path):
    df.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(df.schema).parquet(path)


def test_stream_interval_join_matches_batch(spark, tmp_path):
    left = _spans(spark, 40, width=90_000, step=60_000, name="lid")
    right = _spans(spark, 25, width=50_000, step=100_000, name="rid")

    batch = interval_join(left, right, validate="skip", strategy="broadcast_right")
    expected = sorted(
        (r["lid"], r["rid"]) for r in batch.select("lid", "rid").collect()
    )
    assert expected, "fixture must produce matches"

    ls = _roundtrip_stream(spark, left, str(tmp_path / "l"))
    rs = _roundtrip_stream(spark, right, str(tmp_path / "r"))
    out = stream_interval_join(
        ls, rs, watermark="1 second", max_span_ns=90_000 * US
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sij")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_rows = spark.sql("SELECT * FROM sij").collect()
    got = sorted((r["lid"], r["rid"]) for r in got_rows)
    assert got == expected
    # output schema contract: renamed spans + intersection appended last
    cols = spark.sql("SELECT * FROM sij").columns
    assert cols[-1] == "span" and "span_left" in cols and "span_right" in cols
    for r in got_rows:
        assert r["span"]["start"] == max(
            r["span_left"]["start"], r["span_right"]["start"]
        )
        assert r["span"]["stop"] == min(
            r["span_left"]["stop"], r["span_right"]["stop"]
        )


def test_stream_tumbling_agg_matches_manual_binning(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, EPOCH0 + i * 600_000_000_000) for i in range(50)],
        "event_id long, ts long",
    )
    stream = _roundtrip_stream(spark, ev, str(tmp_path / "ev"))
    out = stream_tumbling_agg(
        stream, width_ns=HOUR, aggs=[F.count(F.lit(1)).alias("n")]
    )
    # complete mode: append would hold back the newest window until a
    # later event advances the watermark past it — on a drained file
    # stream that event never comes
    q = (
        out.writeStream.format("memory")
        .queryName("tumble")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["span"]["start"], r["span"]["stop"]): r["n"]
        for r in spark.sql("SELECT * FROM tumble").collect()
    }
    # 6 events/hour (every 10 min), windows tile the hour grid
    expected = {}
    for i in range(50):
        t = EPOCH0 + i * 600_000_000_000
        lo = t - t % HOUR
        expected[(lo, lo + HOUR)] = expected.get((lo, lo + HOUR), 0) + 1
    assert got == expected


def test_stream_exact_dedup_across_microbatches(spark, tmp_path):
    """First occurrence per key survives; duplicates are dropped both
    within a micro-batch and against keys seen in earlier batches
    (maxFilesPerTrigger=1 forces two batches)."""
    from dataframeintervals_jl_spark.streaming import stream_exact_dedup

    batch1 = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa")], "row_id long, h string"
    )
    batch2 = spark.createDataFrame(
        [(4, "aa"), (5, "cc"), (6, "cc")], "row_id long, h string"
    )
    d = str(tmp_path / "dedup_in")
    batch1.coalesce(1).write.parquet(d + "/f1")
    batch2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_exact_dedup(stream, "h")
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["h"] for r in spark.sql("SELECT * FROM sdedup").collect()}
    assert got == {"aa", "bb", "cc"}
    n = spark.sql("SELECT count(*) AS n FROM sdedup").first()["n"]
    assert n == 3  # exactly one survivor per key


def test_stream_interval_join_sub_us_alignment(spark, tmp_path):
    """ns-unaligned stops: the last touched bin must come from
    floor((stop_ns-1)/1000), not from the µs-truncated stop — a pair
    whose intersection starts in that final µs was silently dropped
    before."""
    rows_l = [(EPOCH0, EPOCH0 + 10_500, 0),  # stop mid-µs
              (EPOCH0 + 30_000, EPOCH0 + 30_001, 1)]  # sub-µs span
    rows_r = [(EPOCH0 + 10_000, EPOCH0 + 20_000, 0),
              (EPOCH0 + 30_000, EPOCH0 + 31_000, 1)]
    from pyspark.sql.types import LongType

    left = make_span_df(spark, rows_l, extra=[("lid", LongType())])
    right = make_span_df(spark, rows_r, extra=[("rid", LongType())])
    batch = interval_join(left, right, validate="skip", strategy="broadcast_right")
    expected = sorted((r["lid"], r["rid"]) for r in batch.select("lid", "rid").collect())
    assert (0, 0) in expected and (1, 1) in expected

    ls = _roundtrip_stream(spark, left, str(tmp_path / "l2"))
    rs = _roundtrip_stream(spark, right, str(tmp_path / "r2"))
    out = stream_interval_join(
        ls, rs, bin_width_ns=1_000, watermark="1 second", max_span_ns=1_000_000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sij_ns")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["lid"], r["rid"]) for r in spark.sql("SELECT * FROM sij_ns").collect()
    )
    assert got == expected


def test_stream_interval_join_max_span_bound(spark, tmp_path):
    """max_span_ns adds the watermark-relating range predicate without
    changing results for compliant spans, and rejects violators."""
    left = _spans(spark, 20, width=90_000, step=60_000, name="lid")
    right = _spans(spark, 12, width=50_000, step=100_000, name="rid")
    batch = interval_join(left, right, validate="skip", strategy="broadcast_right")
    expected = sorted((r["lid"], r["rid"]) for r in batch.select("lid", "rid").collect())

    # batch-mode run of the streaming operator (isStreaming=False path)
    out = stream_interval_join(left, right, max_span_ns=90_000 * US)
    got = sorted((r["lid"], r["rid"]) for r in out.select("lid", "rid").collect())
    assert got == expected

    too_small = stream_interval_join(left, right, max_span_ns=10_000 * US)
    with pytest.raises(Exception, match="max_span_ns"):
        too_small.collect()


def _with_flush(spark, df, t):
    """Append a far-future sentinel span (id -1) that drives the
    watermark past every real row so append-mode outer results flush."""
    flush = spark.createDataFrame(
        [({"start": t, "stop": t + 1_000 * US}, -1)], df.schema
    )
    return df.unionByName(flush)


def test_stream_interval_join_left_outer_matches_batch_keepleft(
    spark, tmp_path
):
    """Streaming keepleft parity: unmatched left rows emit (null right
    columns, null intersection) once the watermark passes them; matched
    pairs equal the inner join exactly — asymmetric binning produces
    each pair once (no bin-copy padding artifacts)."""
    left = _spans(spark, 40, width=90_000, step=60_000, name="lid")
    # sparse right: lefts inside the 300ms gaps go unmatched
    right = _spans(spark, 10, width=50_000, step=300_000, name="rid")
    batch = interval_join(
        left, right, keepleft=True, validate="skip",
        strategy="broadcast_right",
    )
    expected = sorted(
        ((r["lid"], r["rid"]) for r in batch.select("lid", "rid").collect()),
        key=repr,
    )
    assert any(rid is None for _, rid in expected), "need unmatched lefts"

    day = 86_400_000_000_000
    ls = _roundtrip_stream(
        spark, _with_flush(spark, left, EPOCH0 + day), str(tmp_path / "lo_l")
    )
    rs = _roundtrip_stream(
        spark, _with_flush(spark, right, EPOCH0 + day), str(tmp_path / "lo_r")
    )
    out = stream_interval_join(
        ls, rs, watermark="1 second", max_span_ns=90_000 * US,
        how="left_outer",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sij_lo")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        r for r in spark.sql("SELECT * FROM sij_lo").collect()
        if r["lid"] != -1
    ]
    got = sorted(((r["lid"], r["rid"]) for r in rows), key=repr)
    assert got == expected
    for r in rows:
        if r["rid"] is None:
            assert r["span_right"] is None and r["span"] is None
        else:
            assert r["span"]["start"] == max(
                r["span_left"]["start"], r["span_right"]["start"]
            )


def test_stream_interval_join_left_outer_batch_mode_parity(spark):
    """The asymmetric scheme is exact in batch mode too (isStreaming
    False): same rows as batch keepleft."""
    left = _spans(spark, 30, width=90_000, step=60_000, name="lid")
    right = _spans(spark, 8, width=50_000, step=300_000, name="rid")
    expected = sorted(
        (
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, keepleft=True, validate="skip",
                strategy="broadcast_right",
            ).select("lid", "rid").collect()
        ),
        key=repr,
    )
    out = stream_interval_join(
        left, right, max_span_ns=90_000 * US, how="left_outer"
    )
    got = sorted(
        ((r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()),
        key=repr,
    )
    assert got == expected


def test_stream_interval_join_right_outer_batch_mode_parity(spark):
    """right_outer is the mirror image: parity vs batch keepright."""
    left = _spans(spark, 8, width=50_000, step=300_000, name="lid")
    right = _spans(spark, 30, width=90_000, step=60_000, name="rid")
    expected = sorted(
        (
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, keepright=True, validate="skip",
                strategy="broadcast_left",
            ).select("lid", "rid").collect()
        ),
        key=repr,
    )
    out = stream_interval_join(
        left, right, max_span_ns=90_000 * US, how="right_outer"
    )
    got = sorted(
        ((r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()),
        key=repr,
    )
    assert got == expected
    assert any(lid is None for lid, _ in got), "need unmatched rights"


def test_stream_interval_join_right_outer_tightened_reach_parity(spark):
    """Batch-batch right_outer tightens the exploded side's reach-back
    from max_span_ns to the preserved side's observed max duration
    (round 11).  Force the probe path (max_span/bin_width > 4, with a
    max_span 10x the true durations) and assert both the parity and
    the plan-visible tightening (the explode's reach literal must come
    from the 90ms observed bound, not the 900ms contract bound)."""
    left = _spans(spark, 8, width=50_000, step=300_000, name="lid")
    right = _spans(spark, 30, width=90_000, step=60_000, name="rid")
    expected = sorted(
        (
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, keepright=True, validate="skip",
                strategy="broadcast_left",
            ).select("lid", "rid").collect()
        ),
        key=repr,
    )
    out = stream_interval_join(
        left,
        right,
        max_span_ns=900_000 * US,
        bin_width_ns=10_000 * US,
        how="right_outer",
    )
    got = sorted(
        ((r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()),
        key=repr,
    )
    assert got == expected
    assert any(lid is None for lid, _ in got), "need unmatched rights"
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the reach literal is subtracted from the start µs inside the
    # explode: floor(reach_ns/1000)+1 µs — tightened = 90_001.  (The
    # bare "900001" also appears legitimately as the watermark-slack
    # INTERVAL, so match the subtraction expression.)
    assert "- 90001)" in plan, "exploded side must reach back 90ms"
    assert "- 900001)" not in plan, "untightened max_span reach survived"


def test_stream_interval_join_outer_pads_empty_preserved_spans(spark):
    """Batch keepleft pads zero-width left spans with nulls; the
    streaming operator's pre-padded branch must do the same (and such
    rows must never MATCH — [t,t) is empty under '[)')."""
    from pyspark.sql.types import LongType

    t0 = EPOCH0 + 50_000 * US
    rows_l = [(EPOCH0, EPOCH0 + 90_000 * US, 0), (t0, t0, 1)]  # [t,t)
    rows_r = [(EPOCH0 + 10_000 * US, EPOCH0 + 95_000 * US, 0)]
    left = make_span_df(spark, rows_l, extra=[("lid", LongType())])
    right = make_span_df(spark, rows_r, extra=[("rid", LongType())])
    expected = sorted(
        (
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, keepleft=True, validate="skip",
                strategy="broadcast_right",
            ).select("lid", "rid").collect()
        ),
        key=repr,
    )
    assert (1, None) in expected  # batch pads the empty span
    out = stream_interval_join(
        left, right, max_span_ns=90_000 * US + 1, how="left_outer"
    )
    got = sorted(
        ((r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()),
        key=repr,
    )
    assert got == expected
    pad = out.filter(F.col("rid").isNull()).first()
    assert pad["span_right"] is None and pad["span"] is None


def test_stream_interval_join_left_outer_contract(spark):
    left = _spans(spark, 3, width=90_000, step=60_000, name="lid")
    right = _spans(spark, 3, width=50_000, step=100_000, name="rid")
    with pytest.raises(ValueError, match="left_outer.*requires max_span"):
        stream_interval_join(left, right, how="left_outer")
    with pytest.raises(ValueError, match="right_outer.*requires max_span"):
        stream_interval_join(left, right, how="right_outer")
    with pytest.raises(ValueError, match="unsupported how"):
        stream_interval_join(left, right, how="full_outer")


def test_stream_stream_requires_max_span(spark, tmp_path):
    """Both inputs streaming + no max_span_ns = unbounded join state —
    construction must fail fast, not defer the OOM to production."""
    left = _spans(spark, 5, width=90_000, step=60_000, name="lid")
    right = _spans(spark, 5, width=50_000, step=100_000, name="rid")
    ls = _roundtrip_stream(spark, left, str(tmp_path / "gl"))
    rs = _roundtrip_stream(spark, right, str(tmp_path / "gr"))
    with pytest.raises(ValueError, match="max_span_ns"):
        stream_interval_join(ls, rs)
    # mixed stream-batch stays allowed (state bounded by the batch side)
    assert stream_interval_join(ls, right).isStreaming
    # with the bound, the analyzed stream-stream plan carries the derived
    # time-range constraint between the two watermarked event-time
    # columns — the condition Spark's state eviction needs
    out = stream_interval_join(ls, rs, max_span_ns=90_000 * US)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "__ts_l" in plan and "__ts_r" in plan


def test_stream_merge_spans_matches_batch(spark, tmp_path):
    """Multi-batch file stream: emitted islands (watermark-closed) must
    equal the batch merge_spans islands.  A far-future sentinel span per
    key in the last file advances the watermark past every real island
    so all of them flush; the sentinel's own island stays in state."""
    import random

    from dataframeintervals_jl_spark import merge_spans
    from dataframeintervals_jl_spark.streaming import stream_merge_spans

    rng = random.Random(42)
    base = 1_700_000_000_000_000_000
    hour = 3_600_000_000_000
    rows = [
        (k, base + s * hour, base + (s + rng.randrange(1, 8)) * hour)
        for k in ("a", "b")
        for s in (rng.randrange(0, 200) for _ in range(60))
    ]
    sentinel_start = base + 10_000 * hour
    sentinels = [(k, sentinel_start, sentinel_start + hour) for k in ("a", "b")]

    schema = "user_id string, span struct<start: long, stop: long>"

    def to_df(rs):
        return spark.createDataFrame(
            [(k, {"start": s, "stop": e}) for k, s, e in rs], schema
        )

    d = str(tmp_path / "smerge_in")
    half = len(rows) // 2
    to_df(rows[:half]).coalesce(1).write.parquet(d + "/f1")
    to_df(rows[half:]).coalesce(1).write.parquet(d + "/f2")
    to_df(sentinels).coalesce(1).write.parquet(d + "/f3")

    stream = (
        spark.readStream.schema(to_df(rows[:1]).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_merge_spans(stream, by="user_id", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("smerge")
        .option("checkpointLocation", str(tmp_path / "smerge_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["span"]["start"], r["span"]["stop"], r["n_spans"])
        for r in spark.sql("SELECT * FROM smerge").collect()
        if r["span"]["start"] < sentinel_start
    )
    expected = sorted(
        (r["user_id"], r["span"]["start"], r["span"]["stop"], r["n_spans"])
        for r in merge_spans(to_df(rows), by="user_id").collect()
    )
    assert got == expected


def test_stream_merge_spans_batch_delegation(spark):
    """On a batch input the operator IS merge_spans (same rows/schema)."""
    from dataframeintervals_jl_spark import merge_spans
    from dataframeintervals_jl_spark.streaming import stream_merge_spans

    df = spark.createDataFrame(
        [("u", {"start": 0, "stop": 10}), ("u", {"start": 5, "stop": 20}),
         ("v", {"start": 100, "stop": 110})],
        "user_id string, span struct<start: long, stop: long>",
    )
    got = sorted(map(tuple, stream_merge_spans(df, by="user_id").collect()))
    exp = sorted(map(tuple, merge_spans(df, by="user_id").collect()))
    assert got == exp and stream_merge_spans(df, by="user_id").columns == [
        "user_id", "span", "n_spans",
    ]


def test_stream_minhash_candidates_matches_batch_components(spark, tmp_path):
    """Streaming LSH candidates (star edges vs each bucket's first doc)
    must induce the SAME duplicate clusters as the batch clique pairs —
    the invariant that matters for dedup.  Two micro-batches force the
    cross-batch state path."""
    from dataframeintervals_jl_spark.operators.dedup import minhash_lsh_pairs
    from dataframeintervals_jl_spark.streaming import stream_minhash_candidates

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = []
    for i in range(12):
        # 4 clusters of 3 near-identical docs (one word tweaked), ids interleaved
        cluster = i % 4
        text = base.replace("river", f"stream{cluster}") + f" tail{cluster} " + (
            "x" * (i // 4)  # small unique suffix per member
        )
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    d = str(tmp_path / "smh_in")
    df.filter("doc_id % 2 = 0").coalesce(1).write.parquet(d + "/f1")
    df.filter("doc_id % 2 = 1").coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_minhash_candidates(stream, num_hashes=32, bands=8)
    q = (
        out.writeStream.format("memory")
        .queryName("smh")
        .option("checkpointLocation", str(tmp_path / "smh_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_edges = {
        tuple(sorted((r["id_dup"], r["id_first"])))
        for r in spark.sql("SELECT * FROM smh").collect()
    }
    batch_edges = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in minhash_lsh_pairs(df, num_hashes=32, bands=8).collect()
    }
    assert stream_edges  # the near-dup clusters produce collisions

    def components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        groups = {}
        for n in nodes:
            groups.setdefault(find(n), set()).add(n)
        return {frozenset(g) for g in groups.values()}

    nodes = set(range(12))
    assert components(stream_edges, nodes) == components(batch_edges, nodes)


def test_stream_interval_filter_matches_batch_semi_anti(spark, tmp_path):
    """Stream-static overlap filtering == batch semi/anti joins on a
    two-micro-batch file stream, both keep directions."""
    from dataframeintervals_jl_spark.operators.interval_join import (
        interval_anti_join,
        interval_semi_join,
    )
    from dataframeintervals_jl_spark.streaming import stream_interval_filter

    left = _spans(spark, 30, width=80_000, step=60_000, name="lid")
    win = _spans(spark, 4, width=200_000, step=500_000, name="wid").select("span")

    exp_in = sorted(r["lid"] for r in interval_semi_join(left, win).collect())
    exp_out = sorted(r["lid"] for r in interval_anti_join(left, win).collect())
    assert exp_in and exp_out, "fixture needs both matched and unmatched"

    d = str(tmp_path / "sif")
    left.filter("lid % 2 = 0").coalesce(1).write.parquet(d + "/f1")
    left.filter("lid % 2 = 1").coalesce(1).write.parquet(d + "/f2")
    ls = (
        spark.readStream.schema(left.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    for keep, expected in (("inside", exp_in), ("outside", exp_out)):
        out = stream_interval_filter(ls, win, keep=keep)
        assert out.isStreaming
        qn = f"sif_{keep}"
        q = (
            out.writeStream.format("memory")
            .queryName(qn)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{keep}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(r["lid"] for r in spark.sql(f"SELECT * FROM {qn}").collect())
        assert got == expected
    import pytest

    with pytest.raises(ValueError, match="STATIC"):
        stream_interval_filter(ls, ls)
    with pytest.raises(ValueError, match="keep must be"):
        stream_interval_filter(ls, win, keep="sideways")


def test_stream_incremental_dedup_matches_batch(spark, tmp_path):
    """The stateless stream-static probe must flag exactly the rows the
    batch incremental_minhash_dedup flags, on a real file stream split
    across two micro-batches, against a really-persisted index."""
    from dataframeintervals_jl_spark.operators.dedup import (
        incremental_minhash_dedup,
        write_minhash_index,
    )
    from dataframeintervals_jl_spark.streaming import stream_incremental_dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    hist_rows = [(i, base + f" variant {i}") for i in range(10)]
    # increment: ids 100+; half are near-copies of history, half novel
    inc_rows = [
        (100 + i, base + f" variant {i}") for i in range(5)
    ] + [
        (200 + i, f"completely different text number {i} with unrelated words here")
        for i in range(5)
    ]
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    inc = spark.createDataFrame(inc_rows, "doc_id long, text string")

    write_minhash_index(
        hist,
        "dfi_sid_test_idx",
        n_buckets=4,
        path=str(tmp_path / "idx"),
        num_hashes=32,
        bands=8,
    )
    idx = spark.table("dfi_sid_test_idx")

    expected = {
        r["doc_id"]: r["kept"]
        for r in incremental_minhash_dedup(
            inc, idx, num_hashes=32, bands=8
        ).collect()
    }
    assert set(expected.values()) == {True, False}, "fixture needs both outcomes"

    d = str(tmp_path / "sid_in")
    inc.filter("doc_id < 200").coalesce(1).write.parquet(d + "/f1")
    inc.filter("doc_id >= 200").coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(inc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_incremental_dedup(stream, idx, num_hashes=32, bands=8)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sid")
        .option("checkpointLocation", str(tmp_path / "sid_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["kept"] for r in spark.sql("SELECT * FROM sid").collect()
    }
    assert got == expected
    # batch-mode run of the same composition agrees too
    batch_mode = {
        r["doc_id"]: r["kept"]
        for r in stream_incremental_dedup(inc, idx, num_hashes=32, bands=8).collect()
    }
    assert batch_mode == expected


def test_stream_minhash_rejects_batch_input(spark):
    from dataframeintervals_jl_spark.streaming import stream_minhash_candidates

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="streaming input"):
        stream_minhash_candidates(df)


def test_stream_sliding_agg_matches_batch_operator(spark, tmp_path):
    from dataframeintervals_jl_spark.operators.timeseries import sliding_window_agg
    from dataframeintervals_jl_spark.streaming import stream_sliding_agg

    ev = spark.createDataFrame(
        [(i, EPOCH0 + i * 600_000_000_000) for i in range(50)],
        "event_id long, ts long",
    )
    batch = sliding_window_agg(
        ev,
        aggs=[F.count(F.lit(1)).alias("n")],
        on="ts",
        length=2 * HOUR,
        slide=HOUR,
    )
    expected = {
        (r["w_start"], r["w_end"]): r["n"] for r in batch.collect()
    }
    assert expected and max(expected.values()) > 6, "windows must overlap"

    stream = _roundtrip_stream(spark, ev, str(tmp_path / "sl"))
    out = stream_sliding_agg(
        stream, width_ns=2 * HOUR, slide_ns=HOUR,
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sliding")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["span"]["start"], r["span"]["stop"]): r["n"]
        for r in spark.sql("SELECT * FROM sliding").collect()
    }
    assert got == expected


def test_stream_sliding_agg_validation(spark):
    from dataframeintervals_jl_spark.streaming import stream_sliding_agg

    ev = spark.createDataFrame([(1, EPOCH0)], "event_id long, ts long")
    with pytest.raises(ValueError, match="multiple of slide"):
        stream_sliding_agg(ev, width_ns=HOUR * 3, slide_ns=HOUR * 2, aggs=[])
    with pytest.raises(ValueError, match="microsecond"):
        stream_sliding_agg(ev, width_ns=10, slide_ns=10, aggs=[])


def test_chunk_documents_streaming_passthrough(spark, tmp_path):
    """chunk_documents is pure narrow expressions, so it must work
    unchanged on a streaming input (stateless transform)."""
    from dataframeintervals_jl_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z")], "doc_id long, text string"
    )
    batch = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=3, stride=2).collect()
    }
    stream = _roundtrip_stream(spark, docs, str(tmp_path / "docs"))
    out = chunk_documents(stream, chunk_tokens=3, stride=2)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("chunks")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in spark.sql("SELECT * FROM chunks").collect()
    }
    assert got == batch


def test_stream_resample_locf_matches_batch(spark, tmp_path):
    """Multi-batch file stream: watermark-finalized grid points must
    equal the batch resample_locf rows.  A far-future sentinel obs per
    key advances the watermark past every real grid point; comparison
    is restricted to the batch operator's grid range."""
    import random

    from dataframeintervals_jl_spark.operators.timeseries import resample_locf
    from dataframeintervals_jl_spark.streaming import stream_resample_locf

    rng = random.Random(7)
    base = 1_700_000_000_000_000_000
    hour = 3_600_000_000_000
    step = 12 * hour
    rows = [
        (k, base + rng.randrange(0, 400) * hour, float(i))
        for i, k in enumerate(k for k in (1, 2) for _ in range(40))
    ]
    # unique (key, ts): keep the last value per slot like a real stream
    dedup = {}
    for k, t, v in rows:
        dedup[(k, t)] = v
    rows = [(k, t, v) for (k, t), v in dedup.items()]
    sentinel_ts = base + 1000 * hour
    sentinels = [(k, sentinel_ts, -1.0) for k in (1, 2)]

    schema = "user_id long, ts long, value double"
    batch_df = spark.createDataFrame(rows, schema)
    expected = sorted(
        (r["user_id"], r["ts"], r["ts_right"], r["value_right"])
        for r in resample_locf(
            batch_df, on="ts", step=step, by="user_id"
        ).collect()
    )
    max_gt_by_key: dict = {}
    for k, t, _, _ in expected:
        max_gt_by_key[k] = max(max_gt_by_key.get(k, t), t)

    d = str(tmp_path / "locf_in")
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.parquet(d + "/f1")
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.parquet(d + "/f2")
    spark.createDataFrame(sentinels, schema).coalesce(1).write.parquet(d + "/f3")

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_resample_locf(
        stream, step_ns=step, by="user_id", watermark="0 seconds"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("slocf")
        .option("checkpointLocation", str(tmp_path / "locf_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["ts"], r["ts_right"], r["value_right"])
        for r in spark.sql("SELECT * FROM slocf").collect()
        if r["ts"] <= max_gt_by_key[r["user_id"]]
    )
    assert got == expected


def test_stream_resample_locf_batch_delegation(spark):
    from dataframeintervals_jl_spark.operators.timeseries import resample_locf
    from dataframeintervals_jl_spark.streaming import stream_resample_locf

    df = spark.createDataFrame(
        [(1, 100, 1.0), (1, 250, 2.0)], "user_id long, ts long, value double"
    )
    a = sorted(map(tuple, stream_resample_locf(df, step_ns=100_000).collect()))
    # NS_PER_US floor means step must be >= 1us; use the batch op directly
    b = sorted(
        map(
            tuple,
            resample_locf(df, on="ts", step=100_000, by="user_id").collect(),
        )
    )
    assert a == b


def test_stream_latest_by_key_across_microbatches(spark, tmp_path):
    """Latest change per key wins across micro-batches; equal-ts ties
    break toward the delete; final complete-mode table matches the
    batch reduction of the same change log."""
    from dataframeintervals_jl_spark.streaming import stream_latest_by_key

    schema = "k long, v string, ts long, op string"
    batch1 = spark.createDataFrame(
        [(1, "one-v1", 100, "U"), (2, "two-v1", 100, "U")], schema
    )
    batch2 = spark.createDataFrame(
        [
            (1, "one-v2", 200, "U"),
            (2, None, 100, "D"),  # equal ts as two-v1: delete wins
            (3, "three", 50, "U"),
        ],
        schema,
    )
    d = str(tmp_path / "cdc_in")
    batch1.coalesce(1).write.parquet(d + "/f1")
    batch2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_latest_by_key(stream, "k", ts_col="ts", op_col="op")
    q = (
        out.writeStream.format("memory")
        .queryName("slatest")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_latest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["k"]: (r["v"], r["op"])
        for r in spark.sql("SELECT * FROM slatest").collect()
    }
    assert got == {1: ("one-v2", "U"), 2: (None, "D"), 3: ("three", "U")}

    # batch parity: same expression over the unioned log
    batch = stream_latest_by_key(
        batch1.unionByName(batch2), "k", ts_col="ts", op_col="op"
    )
    assert {r["k"]: (r["v"], r["op"]) for r in batch.collect()} == got


def test_stream_cusum_parity_across_microbatches(spark, tmp_path):
    """Streaming CUSUM over two in-order micro-batches equals the
    batch operator over the union — including an accumulator carried
    across the batch boundary and post-alarm resets."""
    from dataframeintervals_jl_spark.operators.timeseries import (
        cusum_changepoints,
    )
    from dataframeintervals_jl_spark.streaming import stream_cusum

    schema = "k long, ts long, x long"
    # baseline then a sustained shift straddling the batch boundary
    b1 = spark.createDataFrame(
        [(1, t, 100) for t in range(3)] + [(1, 3, 160), (1, 4, 160)], schema
    )
    b2 = spark.createDataFrame(
        [(1, 5, 160), (1, 6, 160), (2, 0, 100), (2, 1, 400)], schema
    )
    d = str(tmp_path / "cusum_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    args = dict(target=100, slack=20, threshold=100, ts_col="ts", by="k")
    out = stream_cusum(stream, "x", **args)
    q = (
        out.writeStream.format("memory")
        .queryName("scusum")
        .option("checkpointLocation", str(tmp_path / "ckpt_cusum"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM scusum").collect())
    )
    want = sorted(
        map(
            tuple,
            cusum_changepoints(b1.unionByName(b2), "x", **args).collect(),
        )
    )
    assert got == want
    # the boundary-straddling shift did alarm
    assert any(r[-1] for r in got)


def test_stream_hampel_parity_with_batch_prefix(spark, tmp_path):
    """Every streamed row is bit-identical to the batch operator; the
    stream emits exactly all but the trailing half_window samples per
    key, including across a micro-batch boundary."""
    from dataframeintervals_jl_spark.operators.timeseries import (
        hampel_despike,
    )
    from dataframeintervals_jl_spark.streaming import stream_hampel

    schema = "k long, ts long, x long"
    vals1 = [(1, t, 100) for t in range(5)] + [(1, 5, 9000)]
    vals2 = [(1, t, 100) for t in range(6, 12)] + [(2, t, 7 * t) for t in range(5)]
    b1 = spark.createDataFrame(vals1, schema)
    b2 = spark.createDataFrame(vals2, schema)
    d = str(tmp_path / "hampel_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_hampel(stream, "x", ts_col="ts", by="k", half_window=2)
    q = (
        out.writeStream.format("memory")
        .queryName("shampel")
        .option("checkpointLocation", str(tmp_path / "ckpt_hampel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["ts"]): tuple(r)
        for r in spark.sql("SELECT * FROM shampel").collect()
    }
    batch = {
        (r["k"], r["ts"]): tuple(r)
        for r in hampel_despike(
            b1.unionByName(b2), "x", "ts", by="k", half_window=2
        ).collect()
    }
    # emitted = all but the trailing half_window samples per key
    want_keys = {(1, t) for t in range(10)} | {(2, t) for t in range(3)}
    assert set(got) == want_keys
    for kk in got:
        assert got[kk] == batch[kk], kk
    # row tuple = (k, ts, x, med, mad, is_spike, cleaned): the spike
    # was flagged and repaired in-stream
    assert got[(1, 5)][5] is True and got[(1, 5)][6] == 100


def test_stream_hampel_rejects_non_bigint_stream_ts(spark, tmp_path):
    """The streaming path's state ring is LongType — a timestamp ts
    must be rejected loudly, not TypeError inside an executor."""
    from dataframeintervals_jl_spark.streaming import stream_hampel

    df = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", 5)], "k long, ts string, x long"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "x")
    d = str(tmp_path / "hampel_ts_in")
    df.write.parquet(d)
    stream = spark.readStream.schema(df.schema).parquet(d)
    with pytest.raises(ValueError, match="BIGINT"):
        stream_hampel(stream, "x", ts_col="ts", by="k")


def test_stream_validity_intervals_parity_across_microbatches(
    spark, tmp_path
):
    """Streaming SCD2 over two in-order micro-batches == the batch
    operator's CLOSED intervals over the union — including a run
    carried open across the batch boundary and null attrs as values."""
    from dataframeintervals_jl_spark.operators.timeseries import (
        validity_intervals,
    )
    from dataframeintervals_jl_spark.streaming import (
        stream_validity_intervals,
    )

    schema = "k long, ts long, attr string, eid long"
    b1 = spark.createDataFrame(
        [
            (1, 0, "a", 0),
            (1, 1, "a", 1),
            (1, 2, None, 2),   # null run begins
            (2, 0, "x", 3),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (1, 3, None, 4),   # null run continues across the boundary
            (1, 4, "b", 5),    # closes the null run
            (2, 1, "y", 6),    # closes x
        ],
        schema,
    )
    d = str(tmp_path / "svi_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_validity_intervals(
        stream, attrs=["attr"], on="ts", by="k", order_tiebreak="eid"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("svi")
        .option("checkpointLocation", str(tmp_path / "ckpt_svi"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM svi").collect()), key=repr
    )
    batch = validity_intervals(
        b1.unionByName(b2), attrs=["attr"], on="ts", by="k", order=["eid"]
    )
    want = sorted(
        map(tuple, batch.filter("valid_to IS NOT NULL").collect()),
        key=repr,
    )
    assert got == want
    assert (1, None, 2, 4) in got  # the boundary-straddling null run
    # batch input delegates to the batch operator (open rows included)
    assert sorted(
        map(
            tuple,
            stream_validity_intervals(
                b1.unionByName(b2), attrs=["attr"], on="ts", by="k",
                order_tiebreak="eid",
            ).collect(),
        ),
        key=repr,
    ) == sorted(map(tuple, batch.collect()), key=repr)


def test_stream_asof_enrich_static_matches_batch_asof(spark, tmp_path):
    """Streaming events against a STATIC dimension: the stateless
    validity-window stream-static join must equal batch
    asof_join(direction='backward') — ties match, pre-first-state
    events get nulls, and the last state's open window carries
    forward."""
    from dataframeintervals_jl_spark import asof_join
    from dataframeintervals_jl_spark.streaming import stream_asof_enrich_static

    ev = spark.createDataFrame(
        [(1, 5, 0), (1, 10, 1), (1, 20, 2), (2, 3, 3), (2, 4, 4), (3, 1, 5)],
        "k long, ts long, eid long",
    )
    st = spark.createDataFrame(
        [(1, 5, "a"), (1, 15, "b"), (2, 4, "x")], "k long, ts long, ver string"
    )
    expected = sorted(
        (r["eid"], r["ts_right"], r["ver_right"])
        for r in asof_join(
            ev, st, on="ts", by="k", direction="backward"
        ).collect()
    )

    d = str(tmp_path / "enrich_static")
    ev.filter("eid < 3").coalesce(1).write.parquet(d + "/ev/f1")
    ev.filter("eid >= 3").coalesce(1).write.parquet(d + "/ev/f2")
    evs = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/ev/*")
    )
    out = stream_asof_enrich_static(evs, st, on="ts", by="k")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("enrich_static")
        .option("checkpointLocation", str(tmp_path / "ckpt_es"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["eid"], r["ts_right"], r["ver_right"])
        for r in spark.sql("SELECT * FROM enrich_static").collect()
    )
    assert got == expected
    # batch-mode run of the identical plan agrees
    bt = sorted(
        (r["eid"], r["ts_right"], r["ver_right"])
        for r in stream_asof_enrich_static(ev, st, on="ts", by="k").collect()
    )
    assert bt == expected
    # a streaming states side is rejected
    import pytest

    with pytest.raises(ValueError, match="STATIC"):
        stream_asof_enrich_static(evs, evs, on="ts", by="k")


def test_stream_asof_enrich_parity_across_microbatches(spark, tmp_path):
    """Streaming as-of enrichment over two in-order micro-batches ==
    batch asof_join(direction='backward') over the union — including a
    state carried across the batch boundary and exact-tie matching."""
    from dataframeintervals_jl_spark import asof_join
    from dataframeintervals_jl_spark.streaming import stream_asof_enrich

    ev_schema = "k long, ts long, eid long"
    st_schema = "k long, ts long, ver string"
    ev1 = spark.createDataFrame(
        [(1, 5, 0), (1, 10, 1), (2, 3, 2)], ev_schema
    )
    ev2 = spark.createDataFrame(
        [(1, 20, 3), (2, 4, 4), (3, 1, 5)], ev_schema
    )
    st1 = spark.createDataFrame(
        [(1, 5, "a"), (2, 4, "x")], st_schema  # ties: ts=5 ev, ts=4 ev
    )
    st2 = spark.createDataFrame([(1, 15, "b")], st_schema)

    d = str(tmp_path / "enrich")
    ev1.coalesce(1).write.parquet(d + "/ev/f1")
    ev2.coalesce(1).write.parquet(d + "/ev/f2")
    st1.coalesce(1).write.parquet(d + "/st/f1")
    st2.coalesce(1).write.parquet(d + "/st/f2")
    evs = (
        spark.readStream.schema(ev1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/ev/*")
    )
    sts = (
        spark.readStream.schema(st1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/st/*")
    )
    out = stream_asof_enrich(evs, sts, on="ts", by="k")
    q = (
        out.writeStream.format("memory")
        .queryName("enrich")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM enrich").collect()), key=repr
    )
    want = sorted(
        map(
            tuple,
            asof_join(
                ev1.unionByName(ev2),
                st1.unionByName(st2),
                on="ts",
                by="k",
                direction="backward",
            ).collect(),
        ),
        key=repr,
    )
    assert got == want
    by_eid = {r[2]: r for r in got}  # eid at position 2
    assert by_eid[0][4] == "a"   # exact tie ts=5 matches
    assert by_eid[3][4] == "b"   # cross-batch state update applied
    assert by_eid[5][4] is None  # key with no state rows
    # batch-batch inputs delegate to asof_join directly
    bb = stream_asof_enrich(
        ev1.unionByName(ev2), st1.unionByName(st2), on="ts", by="k"
    )
    assert sorted(map(tuple, bb.collect()), key=repr) == want


def test_stream_interval_join_full_batch_mode_parity(spark):
    """Packaged full-outer composition in batch mode: identical pair
    multiset to batch interval_join(keepleft=True, keepright=True) —
    the reference's full-outer coverage (test:50-54 analog)."""
    from dataframeintervals_jl_spark.streaming import stream_interval_join_full

    left = _spans(spark, 30, width=90_000, step=60_000, name="lid")
    right = _spans(spark, 8, width=50_000, step=300_000, name="rid")
    # shift right so some rights precede every left -> unmatched rights
    right = right.withColumn(
        "span",
        F.struct(
            (F.col("span.start") - 2_000_000 * US).alias("start"),
            (F.col("span.stop") - 2_000_000 * US).alias("stop"),
        ),
    )
    expected = sorted(
        (
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, keepleft=True, keepright=True, validate="skip",
                strategy="broadcast_right",
            ).select("lid", "rid").collect()
        ),
        key=repr,
    )
    assert any(lid is None for lid, _ in expected), "need unmatched rights"
    assert any(rid is None for _, rid in expected), "need unmatched lefts"
    out = stream_interval_join_full(
        left, right, max_span_ns=90_000 * US + 2
    )
    got = sorted(
        ((r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()),
        key=repr,
    )
    assert got == expected


def test_stream_interval_join_full_file_stream_parity(spark, tmp_path):
    """Full-outer composition on real file streams: both inputs
    consumed twice (two outer join states), result equals batch full
    outer after the flush sentinel advances both watermarks."""
    from dataframeintervals_jl_spark.streaming import stream_interval_join_full

    left = _spans(spark, 24, width=90_000, step=60_000, name="lid")
    right = _spans(spark, 6, width=50_000, step=300_000, name="rid")
    right = right.withColumn(
        "span",
        F.struct(
            (F.col("span.start") - 2_000_000 * US).alias("start"),
            (F.col("span.stop") - 2_000_000 * US).alias("stop"),
        ),
    )
    batch = interval_join(
        left, right, keepleft=True, keepright=True, validate="skip",
        strategy="broadcast_right",
    )
    expected = sorted(
        ((r["lid"], r["rid"]) for r in batch.select("lid", "rid").collect()),
        key=repr,
    )
    day = 86_400_000_000_000
    ls = _roundtrip_stream(
        spark, _with_flush(spark, left, EPOCH0 + day), str(tmp_path / "fo_l")
    )
    rs = _roundtrip_stream(
        spark, _with_flush(spark, right, EPOCH0 + day), str(tmp_path / "fo_r")
    )
    out = stream_interval_join_full(
        ls, rs, watermark="1 second", max_span_ns=90_000 * US + 2
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sij_full")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = [
        r
        for r in spark.sql("SELECT * FROM sij_full").collect()
        if r["lid"] != -1 and r["rid"] != -1
    ]
    got = sorted(((r["lid"], r["rid"]) for r in rows), key=repr)
    assert got == expected
    for r in rows:
        if r["lid"] is None:
            assert r["span_left"] is None and r["span"] is None
        if r["rid"] is None:
            assert r["span_right"] is None and r["span"] is None


def _keyed_spans(spark, n, width, step, name, n_keys=3):
    from pyspark.sql.types import LongType

    rows = [
        (EPOCH0 + i * step * US, EPOCH0 + (i * step + width) * US, i)
        for i in range(n)
    ]
    df = make_span_df(spark, rows, extra=[("rid", LongType())]).toDF(
        "span", name
    )
    return df.withColumn("user_id", F.col(name) % n_keys)


def test_stream_interval_join_by_batch_mode_parity(spark):
    """Keyed streaming join (by='user_id') == batch interval_join_by:
    pairs must share the key AND overlap; the output carries the key
    ONCE."""
    from dataframeintervals_jl_spark.operators.interval_join import (
        interval_join_by,
    )

    left = _keyed_spans(spark, 30, width=90_000, step=60_000, name="lid")
    right = _keyed_spans(spark, 25, width=50_000, step=100_000, name="rid")
    expected = sorted(
        (r["user_id"], r["lid"], r["rid"])
        for r in interval_join_by(
            left, right, by="user_id", validate="skip", strategy="hash"
        ).select("user_id", "lid", "rid").collect()
    )
    assert expected, "fixture must produce keyed matches"
    # and the keyed result must differ from the keyless one
    keyless = interval_join(
        left.drop("user_id"), right.drop("user_id"),
        validate="skip", strategy="broadcast_right",
    ).count()
    assert keyless > len(expected)

    out = stream_interval_join(left, right, by="user_id")
    assert out.columns.count("user_id") == 1
    got = sorted(
        (r["user_id"], r["lid"], r["rid"])
        for r in out.select("user_id", "lid", "rid").collect()
    )
    assert got == expected


def test_stream_interval_join_by_outer_batch_mode_parity(spark):
    """Keyed left/right outer: parity vs interval_join_by keepleft /
    keepright; padded rows keep the preserved side's key."""
    from dataframeintervals_jl_spark.operators.interval_join import (
        interval_join_by,
    )

    left = _keyed_spans(spark, 30, width=90_000, step=60_000, name="lid")
    right = _keyed_spans(spark, 6, width=50_000, step=300_000, name="rid")
    for how, keep in (("left_outer", "keepleft"), ("right_outer", "keepright")):
        expected = sorted(
            (
                (r["user_id"], r["lid"], r["rid"])
                for r in interval_join_by(
                    left, right, by="user_id", validate="skip",
                    strategy="hash", **{keep: True},
                ).select("user_id", "lid", "rid").collect()
            ),
            key=repr,
        )
        out = stream_interval_join(
            left, right, by="user_id", max_span_ns=90_000 * US, how=how
        )
        got = sorted(
            (
                (r["user_id"], r["lid"], r["rid"])
                for r in out.select("user_id", "lid", "rid").collect()
            ),
            key=repr,
        )
        assert got == expected, how
        assert all(u is not None for u, _, _ in got), how


def test_stream_interval_join_by_file_stream(spark, tmp_path):
    """Keyed join on real file streams: same pairs as the batch keyed
    join after draining."""
    from dataframeintervals_jl_spark.operators.interval_join import (
        interval_join_by,
    )

    left = _keyed_spans(spark, 24, width=90_000, step=60_000, name="lid")
    right = _keyed_spans(spark, 18, width=50_000, step=100_000, name="rid")
    expected = sorted(
        (r["user_id"], r["lid"], r["rid"])
        for r in interval_join_by(
            left, right, by="user_id", validate="skip", strategy="hash"
        ).select("user_id", "lid", "rid").collect()
    )
    ls = _roundtrip_stream(spark, left, str(tmp_path / "kl"))
    rs = _roundtrip_stream(spark, right, str(tmp_path / "kr"))
    out = stream_interval_join(
        ls, rs, by="user_id", watermark="1 second", max_span_ns=90_000 * US
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sij_by")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["lid"], r["rid"])
        for r in spark.sql("SELECT * FROM sij_by").collect()
    )
    assert got == expected


def test_stream_interval_join_by_validates_keys(spark):
    left = _keyed_spans(spark, 4, width=10_000, step=20_000, name="lid")
    right = _keyed_spans(spark, 4, width=10_000, step=20_000, name="rid")
    with pytest.raises(ValueError, match="must exist on both"):
        stream_interval_join(left, right, by="nope")
    with pytest.raises(ValueError, match="cannot be the on column"):
        stream_interval_join(left, right, by="span")


def test_qsk_register_index_foreachbatch_merge(spark, tmp_path):
    """The quantile sketch's streaming story: maintain a persisted
    register index by merging each micro-batch's registers via
    foreachBatch — the final index must equal the whole input's batch
    registers exactly, so sketch quantiles over the stream equal the
    batch answer."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.operators.sampling import (
        qsk_merge_registers,
        qsk_quantiles,
        qsk_registers,
    )

    df = spark.range(600).select(
        (F.col("id") % 2).alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") * 13 % 997).alias("v"),
    )
    d = str(tmp_path / "qsk_in")
    df.filter("id % 3 = 0").coalesce(1).write.parquet(d + "/f1")
    df.filter("id % 3 = 1").coalesce(1).write.parquet(d + "/f2")
    df.filter("id % 3 = 2").coalesce(1).write.parquet(d + "/f3")
    from dataframeintervals_jl_spark.sources.sinks import (
        update_register_index,
    )

    idx = str(tmp_path / "qsk_idx")

    def update_index(batch, batch_id):
        update_register_index(
            batch.sparkSession,
            idx,
            qsk_registers(batch, "v", "rid", k=48, by="g"),
            lambda a, b: qsk_merge_registers(a, b, k=48, by="g"),
        )

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(update_index)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    from dataframeintervals_jl_spark.sources.sinks import (
        read_register_index,
    )

    final = read_register_index(spark, idx)
    whole = qsk_registers(df, "v", "rid", k=48, by="g")
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, whole.collect())
    )
    sq = sorted(
        map(tuple, qsk_quantiles(final, [500_000], by="g").collect())
    )
    bq = sorted(
        map(tuple, qsk_quantiles(whole, [500_000], by="g").collect())
    )
    assert sq == bq


def test_cms_estimate_streaming_probe_of_static_registers(spark, tmp_path):
    """cms_estimate's docstringed 100 TB shape works as the STREAMING
    probe too: a stream of point queries against a static (persisted)
    corpus register table is a plain update-mode aggregation — final
    estimates equal the batch call exactly."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.operators.sampling import (
        cms_estimate,
        cms_registers,
    )

    corpus = spark.range(3000).select(
        F.concat(F.lit("w"), F.col("id") % 37).alias("w")
    )
    regs_path = str(tmp_path / "cms_regs")
    cms_registers(corpus, "w", width=64, depth=3).write.parquet(regs_path)
    regs = spark.read.parquet(regs_path)

    probes = spark.createDataFrame(
        [("w0",), ("w5",), ("w36",), ("zz-unseen",)], "w string"
    )
    batch_est = sorted(
        map(tuple, cms_estimate(regs, probes, "w", 64, 3).collect())
    )

    d = str(tmp_path / "probe_in")
    probes.limit(2).coalesce(1).write.parquet(d + "/f1")
    probes.subtract(probes.limit(2)).coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(probes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = cms_estimate(regs, stream, "w", 64, 3)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("cmsprobe")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits refinements; each probe's LAST row is final,
    # and since a probe appears in exactly one file, rows are final
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT * FROM cmsprobe"
            ).dropDuplicates(["w"]).collect(),
        )
    )
    assert got == batch_est


def test_stream_lsh_probe_matches_batch(spark, tmp_path):
    """The stateless persisted-index ANN probe must emit exactly the
    same thresholded (q_id, n_id, score) rows on a real file stream
    (two micro-batches) as in batch mode, each pair exactly once (the
    row-local first-table guard replaces a dedup shuffle)."""
    from dataframeintervals_jl_spark.operators.similarity import (
        write_lsh_index,
    )
    from dataframeintervals_jl_spark.sources import read_table
    from dataframeintervals_jl_spark.streaming import stream_lsh_probe

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 6)
    path = str(tmp_path / "lshp")
    write_lsh_index(emb, path, dim=64, n_planes=8, n_tables=4)

    expected = {
        (r["q_id"], r["n_id"]): r["score"]
        for r in stream_lsh_probe(
            spark, path, q, threshold=0.1, probe_radius=2
        ).collect()
    }
    assert expected, "fixture must emit rows"
    # emit-once: batch mode must not duplicate pairs
    n_rows = stream_lsh_probe(
        spark, path, q, threshold=0.1, probe_radius=2
    ).count()
    assert n_rows == len(expected)

    d = str(tmp_path / "lshp_in")
    q.filter("vec_id < 3").coalesce(1).write.parquet(d + "/f1")
    q.filter("vec_id >= 3").coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(q.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_lsh_probe(spark, path, stream, threshold=0.1, probe_radius=2)
    assert out.isStreaming
    sq = (
        out.writeStream.format("memory")
        .queryName("lshp")
        .option("checkpointLocation", str(tmp_path / "lshp_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(120)
    got = {
        (r["q_id"], r["n_id"]): r["score"]
        for r in spark.sql("SELECT * FROM lshp").collect()
    }
    assert got == expected


def test_foreachbatch_register_index_maintenance(spark, tmp_path):
    """update_register_index driven from an ACTUAL stream via
    foreachBatch: two file micro-batches of events merge their CMS
    registers through the versioned on-disk index, and the final
    read-back equals the whole input's registers bit-for-bit — the
    streaming maintenance story of the sketch family."""
    from dataframeintervals_jl_spark.operators.sampling import (
        cms_merge_registers,
        cms_registers,
    )
    from dataframeintervals_jl_spark.sources import read_table
    from dataframeintervals_jl_spark.sources.sinks import (
        read_register_index,
        update_register_index,
    )

    ev = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id"
    )
    d = str(tmp_path / "ev_in")
    ev.filter("event_id % 2 = 0").coalesce(1).write.parquet(d + "/f1")
    ev.filter("event_id % 2 = 1").coalesce(1).write.parquet(d + "/f2")
    idx_path = str(tmp_path / "cms_idx")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )

    def upd(batch_df, batch_id):
        update_register_index(
            spark,
            idx_path,
            cms_registers(batch_df, "user_id", width=128, depth=4),
            cms_merge_registers,
        )

    q = (
        stream.writeStream.foreachBatch(upd)
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["__row"], r["__bkt"]): r["__cnt"]
        for r in read_register_index(spark, idx_path).collect()
    }
    want = {
        (r["__row"], r["__bkt"]): r["__cnt"]
        for r in cms_registers(ev, "user_id", width=128, depth=4).collect()
    }
    assert got == want


def test_maintain_lsh_index_stream_parity(spark, tmp_path):
    """Streaming LSH index maintenance: an index built on part of the
    corpus and maintained from a two-file stream of the remaining
    vectors (maintain_lsh_index -> epoch-idempotent append segments)
    must answer queries IDENTICALLY to an index batch-built on the
    whole corpus; a replayed epoch (same epoch id re-applied) must not
    change the answer (idempotent overwrite, exactly-once)."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.operators.similarity import (
        append_lsh_index,
        lsh_rerank_topk_indexed,
        write_lsh_index,
    )
    from dataframeintervals_jl_spark.sources import read_table
    from dataframeintervals_jl_spark.streaming import maintain_lsh_index

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    third = F.pmod(F.col("vec_id"), F.lit(3))

    # full batch build = the reference answer
    full_path = str(tmp_path / "lsh_full")
    write_lsh_index(emb, full_path, dim=64, n_planes=8, n_tables=3)
    want = sorted(
        map(tuple, lsh_rerank_topk_indexed(
            spark, full_path, q, k=4, probe_radius=2
        ).collect())
    )

    # base on one third; stream the other two thirds as two files
    m_path = str(tmp_path / "lsh_maint")
    write_lsh_index(
        emb.filter(third == 0), m_path, dim=64, n_planes=8, n_tables=3
    )
    d = str(tmp_path / "vec_in")
    emb.filter(third == 1).coalesce(1).write.parquet(d + "/f1")
    emb.filter(third == 2).coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    sq = maintain_lsh_index(
        stream,
        m_path,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    sq.awaitTermination(120)

    got = sorted(
        map(tuple, lsh_rerank_topk_indexed(
            spark, m_path, q, k=4, probe_radius=2
        ).collect())
    )
    assert got == want

    # replayed epoch (deterministic, no stream ordering assumption):
    # appending the SAME batch under the SAME epoch id twice rewrites
    # the segment in place — no duplicate rows, answer unchanged
    r_path = str(tmp_path / "lsh_replay")
    write_lsh_index(
        emb.filter(third == 0), r_path, dim=64, n_planes=8, n_tables=3
    )
    append_lsh_index(emb.filter(third == 1), r_path, 0)
    append_lsh_index(emb.filter(third == 1), r_path, 0)  # replay
    append_lsh_index(emb.filter(third == 2), r_path, 1)
    again = sorted(
        map(tuple, lsh_rerank_topk_indexed(
            spark, r_path, q, k=4, probe_radius=2
        ).collect())
    )
    assert again == want


def test_stream_bloom_decontaminate_file_stream(spark, tmp_path):
    """The row-local bloom probe on an ACTUAL file stream: two
    micro-batches of corpus documents flagged against a static eval
    split must equal the batch operator's output exactly (same
    deterministic bloom, same one-sided error) — and the batch-mode
    plan must be join-free and shuffle-free (that statelessness is
    what makes the streaming form legal without state or watermark)."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.operators.dedup import (
        bloom_decontaminate,
    )
    from dataframeintervals_jl_spark.plans import (
        count_exchanges,
        join_strategies,
    )
    from dataframeintervals_jl_spark.sources import read_table
    from dataframeintervals_jl_spark.streaming import (
        stream_bloom_decontaminate,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    is_eval = F.pmod(F.col("doc_id"), F.lit(23)) == 0
    corpus, ev = docs.filter(~is_eval), docs.filter(is_eval)
    kw = dict(
        shingle_k=4, min_overlap=2, n_bits=1 << 14, n_hashes=4, portable=True
    )

    want = sorted(
        (r["doc_id"], r["n_bloom"], r["contaminated"])
        for r in bloom_decontaminate(corpus, ev, **kw).collect()
    )

    d = str(tmp_path / "docs_in")
    corpus.filter("doc_id % 2 = 0").coalesce(1).write.parquet(d + "/f1")
    corpus.filter("doc_id % 2 = 1").coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    flagged = stream_bloom_decontaminate(stream, ev, **kw).select(
        "doc_id", "n_bloom", "contaminated"
    )
    q = (
        flagged.writeStream.format("memory")
        .queryName("bloomdec")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["doc_id"], r["n_bloom"], r["contaminated"])
        for r in spark.sql("SELECT * FROM bloomdec").collect()
    )
    assert got == want

    batch_plan = stream_bloom_decontaminate(corpus, ev, **kw).select(
        "doc_id", "n_bloom", "contaminated"
    )
    assert count_exchanges(batch_plan) == 0
    assert join_strategies(batch_plan) == []


def test_stream_mixture_sample_matches_batch(spark, tmp_path):
    """Frozen thresholds applied on a real file stream keep EXACTLY the
    rows the batch operator keeps (bit-identical row-local filter), and
    the streaming plan is stateless append (no state store, no shuffle
    commitment needed: memory-sink availableNow completes in one pass)."""
    from dataframeintervals_jl_spark.operators.sampling import (
        mixture_sample,
        mixture_thresholds,
    )
    from dataframeintervals_jl_spark.streaming import stream_mixture_sample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    weights = {"a": 3, "b": 1, "c": 1}
    expected = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df, "src", "doc_id", weights=weights, salt="st"
        ).collect()
    )
    assert 0 < len(expected) < 300

    thr = mixture_thresholds(df, "src", weights=weights)
    stream = _roundtrip_stream(spark, df, str(tmp_path / "mix"))
    out = stream_mixture_sample(
        stream, thr, by="src", key_col="doc_id", salt="st"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("smix")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM smix").collect())
    assert got == expected


def test_maintain_ivfpq_index_stream(spark, tmp_path):
    """Streaming IVF-PQ maintenance: a base index maintained from a
    two-file stream of new vectors answers queries identically to the
    same base index with the same vectors appended by the BATCH append
    path (frozen-model encoding is deterministic, so the stream and
    batch segments hold identical codes)."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.operators.similarity import (
        append_ivfpq_index,
        ivf_pq_topk_indexed,
        write_ivfpq_index,
    )
    from dataframeintervals_jl_spark.sources import read_table
    from dataframeintervals_jl_spark.streaming import maintain_ivfpq_index

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    third = F.pmod(F.col("vec_id"), F.lit(3))
    base = emb.filter(third == 0)
    rest1 = emb.filter(third == 1)
    rest2 = emb.filter(third == 2)

    # reference: base index + batch appends
    b_path = str(tmp_path / "ivfpq_b")
    write_ivfpq_index(base, b_path, n_centroids=8, m_sub=32, ks=256)
    append_ivfpq_index(rest1, b_path, 0)
    append_ivfpq_index(rest2, b_path, 1)
    want = sorted(
        map(tuple, ivf_pq_topk_indexed(
            spark, b_path, q, n_probe=2, k=4
        ).collect())
    )

    # same base maintained from a file stream (one file per epoch)
    m_path = str(tmp_path / "ivfpq_m")
    write_ivfpq_index(base, m_path, n_centroids=8, m_sub=32, ks=256)
    d = str(tmp_path / "vec_in")
    rest1.coalesce(1).write.parquet(d + "/f1")
    rest2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    sq = maintain_ivfpq_index(
        stream,
        m_path,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    sq.awaitTermination(120)
    got = sorted(
        map(tuple, ivf_pq_topk_indexed(
            spark, m_path, q, n_probe=2, k=4
        ).collect())
    )
    assert got == want and len(got) == 12


def test_stream_duplicate_spans_matches_batch(spark, tmp_path):
    """Streamed passage-dedup reports (foreachBatch probe of the
    persisted gram index) equal the batch incremental report over the
    same increments — increments never pair against each other, so the
    union of per-batch reports IS the batch answer."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.operators.dedup import (
        incremental_duplicate_spans,
        write_gram_index,
    )
    from dataframeintervals_jl_spark.streaming import stream_duplicate_spans

    boiler = "one two three four five six seven eight"
    hist = spark.createDataFrame(
        [(i, f"h{i}a h{i}b {boiler} h{i}c") for i in range(6)],
        "doc_id long, text string",
    )
    inc = spark.createDataFrame(
        [
            (100, f"fresh opening {boiler} fresh closing"),
            (101, "entirely novel content with no history overlap"),
            (102, f"{boiler} tail tail tail"),
        ],
        "doc_id long, text string",
    )
    tbl = "t_stream_gram_idx"
    write_gram_index(
        hist, tbl, n_buckets=4, path=str(tmp_path / "gidx"),
        shingle_k=4, portable=True,
    )
    want = sorted(
        map(tuple, incremental_duplicate_spans(
            inc, spark.table(tbl), shingle_k=4, portable=True
        ).collect())
    )
    assert want, "fixture must produce history-duplicated spans"

    d = str(tmp_path / "docs_in")
    inc.filter("doc_id < 102").coalesce(1).write.parquet(d + "/f1")
    inc.filter("doc_id = 102").coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(inc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    got_rows = []
    sq = stream_duplicate_spans(
        stream,
        tbl,
        lambda df, epoch: got_rows.extend(map(tuple, df.collect())),
        checkpoint=str(tmp_path / "ckpt"),
        shingle_k=4,
        portable=True,
        available_now=True,
    )
    sq.awaitTermination(120)
    assert sorted(got_rows) == want


def test_stream_winsorize_matches_batch(spark, tmp_path):
    """Frozen bounds on a real file stream clip EXACTLY like the batch
    winsorize at the same parameters (full-sample sketch so bounds are
    deterministic), NULLs stay NULL, unknown groups pass through."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.operators.sampling import (
        winsorize,
        winsorize_bounds,
    )
    from dataframeintervals_jl_spark.streaming import stream_winsorize

    rows = [(i, ["a", "b"][i % 2], (i * 37) % 100) for i in range(200)]
    rows += [(500, "a", None), (501, "zzz", 42)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    want = sorted(
        (r["id"], r["v_w"])
        for r in winsorize(
            df, "v", "id", lo_ppm=100_000, hi_ppm=900_000, k=256, by="g"
        ).collect()
        if r["g"] != "zzz"  # frozen-bounds side drops no groups either;
        # the batch operator also leaves zzz unclipped — compare below
    )
    b = winsorize_bounds(
        df, "v", "id", lo_ppm=100_000, hi_ppm=900_000, k=256, by="g"
    )
    assert set(b) == {"a", "b", "zzz"}
    stream = _roundtrip_stream(spark, df, str(tmp_path / "w"))
    out = stream_winsorize(stream, b, "v", by="g")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("swin")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_all = {
        r["id"]: r["v_w"] for r in spark.sql("SELECT * FROM swin").collect()
    }
    got = sorted((i, v) for i, v in got_all.items()
                 if i not in (501,))
    want_all = {(i): v for i, v in want}
    assert got == sorted(want_all.items())
    assert got_all[500] is None
    # zzz: single-value group -> lo == hi == 42 -> unchanged
    assert got_all[501] == 42


def test_training_transforms_stream_valid(spark, tmp_path):
    """The round-9 row-local transforms (clean_text, redact_pii,
    span_corrupt, fim_split) are pure projections, so they apply to a
    real file stream UNCHANGED and keep bit-identical outputs to the
    batch run — no state store, stateless append."""
    from dataframeintervals_jl_spark.functions.text import (
        clean_text,
        redact_pii,
    )
    from dataframeintervals_jl_spark.operators.corruption import (
        fim_split,
        span_corrupt,
    )

    rows = [
        (i, f"alpha\tbeta  {i} mail u{i}@ex.org gamma delta epsilon")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def xf(d):
        base = d.select(
            "doc_id", redact_pii(clean_text(F.col("text"))).alias("text")
        )
        return (
            span_corrupt(base, start_ppm=300_000, max_span=2)
            .join(fim_split(base).select("doc_id", "psm"), "doc_id")
        )

    expected = sorted(tuple(r) for r in xf(df).collect())

    stream = _roundtrip_stream(spark, df, str(tmp_path / "tt"))
    out = xf(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ttx")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM ttx").collect())
    assert got == expected


def test_stream_duration_in_state_parity(spark, tmp_path):
    """Streaming time-in-state increments over two micro-batches,
    summed at the sink, == the batch-mode closed-runs rollup == the
    clamped batch operator (exact here because a terminal sentinel
    sample at the windows' max stop closes every key's last real run
    — the clamp then adds an empty [whi, whi) tail only)."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.timeseries import (
        duration_in_state,
    )
    from dataframeintervals_jl_spark.streaming import (
        stream_duration_in_state,
    )

    schema = "k long, ts long, st string, eid long"
    b1 = spark.createDataFrame(
        [(1, 0, "up", 0), (1, 30, "down", 1), (2, 10, "up", 2)], schema
    )
    b2 = spark.createDataFrame(
        [(1, 70, "up", 3), (2, 60, "down", 4),
         (1, 100, "~end~", 5), (2, 100, "~end~", 6)],  # sentinels at whi
        schema,
    )
    windows = spark.createDataFrame(
        [(0, 50, 1), (50, 100, 2)], "a long, b long, widx int"
    ).select(make_span(F.col("a"), F.col("b")).alias("span"), "widx")

    d = str(tmp_path / "sdis_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_duration_in_state(
        stream, windows, "st", ts_col="ts", by="k", order_tiebreak="eid"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sdis")
        .option("checkpointLocation", str(tmp_path / "ckpt_sdis"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["widx"], r["st"]): r["s"]
        for r in spark.sql(
            "SELECT k, widx, st, CAST(sum(dur_ns) AS BIGINT) AS s "
            "FROM sdis GROUP BY k, widx, st"
        ).collect()
    }
    union = b1.unionByName(b2)
    batch_mode = {
        (r["k"], r["widx"], r["st"]): r["dur_ns"]
        for r in stream_duration_in_state(
            union, windows, "st", ts_col="ts", by="k", order_tiebreak="eid"
        ).collect()
    }
    clamped = {
        (r["k"], r["widx"], r["st"]): r["dur_ns"]
        for r in duration_in_state(
            union, windows, "st", ts_col="ts", by="k", order=["eid"]
        ).collect()
    }
    assert got == batch_mode == clamped
    # hand spots: k=1 up [0,30) -> w1:30; down [30,70) -> w1:20 + w2:20
    assert got[(1, 1, "up")] == 30
    assert got[(1, 1, "down")] == 20 and got[(1, 2, "down")] == 20
    assert got[(1, 2, "up")] == 30  # [70,100) closed by the sentinel


def test_stream_counter_windows_parity(spark, tmp_path):
    """Streaming counter observation increments summed per (key,
    window) reproduce batch counter_windows EXACTLY — including a
    reset straddling the micro-batch boundary and the anchor-only
    first sample."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.timeseries import (
        counter_windows,
    )
    from dataframeintervals_jl_spark.streaming import (
        stream_counter_windows,
    )

    schema = "k long, ts long, v long, eid long"
    b1 = spark.createDataFrame(
        [(1, 10, 10, 0), (1, 40, 25, 1), (2, 30, 7, 2)], schema
    )
    b2 = spark.createDataFrame(
        [(1, 60, 5, 3), (1, 140, 9, 4), (2, 130, 507, 5)], schema
    )
    windows = spark.createDataFrame(
        [(0, 100, 1), (100, 200, 2)], "a long, b long, widx int"
    ).select(make_span(F.col("a"), F.col("b")).alias("span"), "widx")

    d = str(tmp_path / "scw_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_counter_windows(
        stream, windows, "v", ts_col="ts", by="k", order_tiebreak="eid"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("scw")
        .option("checkpointLocation", str(tmp_path / "ckpt_scw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["widx"]): (r["d"], r["r"], r["n"], r["cd"])
        for r in spark.sql(
            "SELECT k, widx, CAST(sum(step) AS BIGINT) AS d, "
            "CAST(sum(reset) AS BIGINT) AS r, count(*) AS n, "
            "CAST(sum(dur) AS BIGINT) AS cd FROM scw GROUP BY k, widx"
        ).collect()
    }
    batch = {
        (r["k"], r["widx"]): (
            r["delta"], r["n_resets"], r["n_obs"], r["covered_dur"]
        )
        for r in counter_windows(
            b1.unionByName(b2), windows, "v", ts_col="ts", by="k",
            order=["eid"],
        ).collect()
    }
    assert got == batch
    # the boundary-straddling reset: 25 -> 5 at t=60 lands in window 1
    assert got[(1, 1)] == (20, 1, 2, 50)


def test_stream_gauge_windows_parity(spark, tmp_path):
    """Streaming gauge increments summed per (key, window) reproduce
    batch gauge_windows' delta/covered_dur exactly (signed steps, no
    reset rule), and the latest increment matches batch idelta."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.timeseries import (
        gauge_windows,
    )
    from dataframeintervals_jl_spark.streaming import stream_gauge_windows

    schema = "k long, ts long, v long, eid long"
    b1 = spark.createDataFrame(
        [(1, 10, 10, 0), (1, 40, 25, 1), (2, 30, 7, 2)], schema
    )
    b2 = spark.createDataFrame(
        [(1, 60, 5, 3), (1, 140, 9, 4), (2, 130, -13, 5)], schema
    )
    windows = spark.createDataFrame(
        [(0, 100, 1), (100, 200, 2)], "a long, b long, widx int"
    ).select(make_span(F.col("a"), F.col("b")).alias("span"), "widx")

    d = str(tmp_path / "sgw_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_gauge_windows(
        stream, windows, "v", ts_col="ts", by="k", order_tiebreak="eid"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sgw")
        .option("checkpointLocation", str(tmp_path / "ckpt_sgw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["widx"]): (r["d"], r["n"], r["cd"], r["last_d"])
        for r in spark.sql(
            "SELECT k, widx, CAST(sum(d) AS BIGINT) AS d, count(*) AS n, "
            "CAST(sum(dur) AS BIGINT) AS cd, max_by(d, ts) AS last_d "
            "FROM sgw GROUP BY k, widx"
        ).collect()
    }
    batch = {
        (r["k"], r["widx"]): (
            r["delta"], r["n_obs"], r["covered_dur"], r["idelta"]
        )
        for r in gauge_windows(
            b1.unionByName(b2), windows, "v", ts_col="ts", by="k",
            order=["eid"],
        ).collect()
    }
    assert got == batch
    # signed: k=1 window 1 saw +15 then -20
    assert got[(1, 1)][0] == -5 and got[(1, 1)][3] == -20


def test_stream_ohlc_windows_parity(spark, tmp_path):
    """The stateless streaming candlestick feed: sink-side OHLC picks
    over the increment stream equal batch ohlc_windows exactly, incl.
    a candle whose open and close arrive in different micro-batches."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.timeseries import (
        ohlc_windows,
    )
    from dataframeintervals_jl_spark.streaming import stream_ohlc_windows

    schema = "k long, ts long, v long, eid long"
    b1 = spark.createDataFrame(
        [(1, 0, 10, 0), (1, 40, 25, 1), (2, 70, -3, 2)], schema
    )
    b2 = spark.createDataFrame(
        [(1, 60, 5, 3), (1, 140, 9, 4), (2, 70, 8, 5)], schema
    )
    windows = spark.createDataFrame(
        [(0, 100, 1), (100, 200, 2)], "a long, b long, widx int"
    ).select(make_span(F.col("a"), F.col("b")).alias("span"), "widx")

    d = str(tmp_path / "sohlc_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_ohlc_windows(
        stream, windows, "v", ts_col="ts", by="k", order_tiebreak="eid"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sohlc")
        .option("checkpointLocation", str(tmp_path / "ckpt_sohlc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["widx"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"]
        )
        for r in spark.sql(
            "SELECT k, widx, min_by(v, struct(ts, eid)) AS open, "
            "max(v) AS high, min(v) AS low, "
            "max_by(v, struct(ts, eid)) AS close, count(*) AS n "
            "FROM sohlc GROUP BY k, widx"
        ).collect()
    }
    batch = {
        (r["k"], r["widx"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_samples"]
        )
        for r in ohlc_windows(
            b1.unionByName(b2), windows, "v", ts_col="ts", by="k",
            order=["eid"],
        ).collect()
    }
    assert got == batch
    # k=1 window 1: open 10 (batch 1), close 5 (batch 2), high 25
    assert got[(1, 1)] == (10, 25, 5, 5, 3)
    # k=2: tied ts across batches — eid orders open(-3)/close(8)
    assert got[(2, 1)] == (-3, 8, -3, 8, 2)


def test_stream_time_weighted_parity(spark, tmp_path):
    """Streaming LOCF time-weight increments summed at the sink
    (Σ v·dur DIV Σ dur) equal the batch-mode closed-runs rollup ==
    the clamped batch time_weighted_avg when a terminal sample closes
    every series."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.timeseries import (
        time_weighted_avg,
    )
    from dataframeintervals_jl_spark.streaming import stream_time_weighted

    schema = "k string, ts long, v long, eid long"
    b1 = spark.createDataFrame(
        [("a", 0, 10, 0), ("a", 40, 30, 1)], schema
    )
    b2 = spark.createDataFrame(
        [("a", 100, 99, 2)], schema  # terminal sample at the horizon
    )
    windows = spark.createDataFrame(
        [(0, 50, 1), (50, 100, 2)], "lo long, hi long, widx int"
    ).select(make_span(F.col("lo"), F.col("hi")).alias("span"), "widx")

    d = str(tmp_path / "stw_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_time_weighted(
        stream, windows, "v", ts_col="ts", by="k", order_tiebreak="eid"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("stw")
        .option("checkpointLocation", str(tmp_path / "ckpt_stw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["widx"]): (r["cd"], r["twa"])
        for r in spark.sql(
            "SELECT k, widx, CAST(sum(dur_ns) AS BIGINT) AS cd, "
            "CAST(sum(CAST(v AS DECIMAL(38,0)) * dur_ns) "
            "DIV sum(CAST(dur_ns AS DECIMAL(38,0))) AS BIGINT) AS twa "
            "FROM stw GROUP BY k, widx"
        ).collect()
    }
    union = b1.unionByName(b2)
    batch_mode = {
        (r["k"], r["widx"]): (r["covered_dur"], r["twa"])
        for r in stream_time_weighted(
            union, windows, "v", ts_col="ts", by="k", order_tiebreak="eid"
        ).collect()
    }
    clamped = {
        (r["key"] if "key" in r else r["k"], r["widx"]): (
            r["covered_dur"], r["twa"]
        )
        for r in time_weighted_avg(
            union, windows, "v", ts_col="ts", by="k", order=["eid"]
        ).collect()
    }
    assert got == batch_mode == clamped
    # window 1: 10 holds [0,40), 30 holds [40,50) -> (400+300)//50 = 14
    assert got[("a", 1)] == (50, 14)
    assert got[("a", 2)] == (50, 30)


def test_stream_stats2d_windows_parity(spark, tmp_path):
    """Sink-side DECIMAL moment sums over the stateless increment
    stream equal batch stats2d_windows exactly — the mergeability
    property live: per-micro-batch sums just add."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.timeseries import (
        stats2d_windows,
    )
    from dataframeintervals_jl_spark.streaming import (
        stream_stats2d_windows,
    )

    schema = "k string, ts long, x long, y long"
    b1 = spark.createDataFrame(
        [("a", 10, 3, 9), ("a", 20, -1, 2), ("b", 10, 5, 1)], schema
    )
    b2 = spark.createDataFrame(
        [("a", 30, 4, 15), ("a", 140, 7, 7), ("b", 60, 5, 8)], schema
    )
    windows = spark.createDataFrame(
        [(0, 100, 1), (100, 200, 2)], "lo long, hi long, widx int"
    ).select(make_span(F.col("lo"), F.col("hi")).alias("span"), "widx")

    d = str(tmp_path / "ss2d_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_stats2d_windows(
        stream, windows, "x", "y", ts_col="ts", by="k"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ss2d")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss2d"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dec = "DECIMAL(38,0)"
    got = {
        (r["k"], r["widx"]): tuple(r)[2:]
        for r in spark.sql(
            f"SELECT k, widx, count(*) AS n, "
            f"CAST(sum(CAST(x AS {dec})) AS STRING) AS sum_x, "
            f"CAST(sum(CAST(y AS {dec})) AS STRING) AS sum_y, "
            f"CAST(sum(CAST(x AS {dec}) * CAST(x AS {dec})) AS STRING) AS sum_xx, "
            f"CAST(sum(CAST(x AS {dec}) * CAST(y AS {dec})) AS STRING) AS sum_xy, "
            f"CAST(sum(CAST(y AS {dec}) * CAST(y AS {dec})) AS STRING) AS sum_yy "
            f"FROM ss2d GROUP BY k, widx"
        ).collect()
    }
    batch = {
        (r["k"], r["widx"]): (
            r["n"], r["sum_x"], r["sum_y"],
            r["sum_xx"], r["sum_xy"], r["sum_yy"],
        )
        for r in stats2d_windows(
            b1.unionByName(b2), windows, "x", "y", ts_col="ts", by="k"
        ).collect()
    }
    assert got == batch


def test_stream_hll_windows_parity(spark, tmp_path):
    """Sink-side re-max of the streamed register coordinates equals
    batch hll_registers BIT-FOR-BIT, and the finalized estimate equals
    batch hll_distinct — the register-merge maintenance pattern live
    across micro-batches."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.interval_join import (
        point_in_span_join,
    )
    from dataframeintervals_jl_spark.operators.sampling import (
        hll_distinct,
        hll_from_registers,
    )
    from dataframeintervals_jl_spark.streaming import stream_hll_windows

    schema = "user_id long, ts long"
    b1 = spark.createDataFrame(
        [(u, t) for u in range(40) for t in (10 + u, 110 + u)], schema
    )
    b2 = spark.createDataFrame(
        [(u, t) for u in range(20, 70) for t in (50 + u % 30,)], schema
    )
    windows = spark.createDataFrame(
        [(0, 100, 1), (100, 200, 2)], "lo long, hi long, widx int"
    ).select(make_span(F.col("lo"), F.col("hi")).alias("span"), "widx")

    d = str(tmp_path / "hllw_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_hll_windows(stream, windows, "user_id", p=6, ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("hllw")
        .option("checkpointLocation", str(tmp_path / "ckpt_hllw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sink_regs = spark.sql(
        "SELECT widx, __idx, max(__rho) AS __rho FROM hllw "
        "GROUP BY widx, __idx"
    )
    batch_in = b1.unionByName(b2)
    est = {
        (r["widx"],): (r["hll_est"], r["v_zero"])
        for r in hll_from_registers(sink_regs, p=6, by="widx").collect()
    }
    batch_est = {
        (r["widx"],): (r["hll_est"], r["v_zero"])
        for r in hll_distinct(
            point_in_span_join(
                batch_in, windows, ts_col="ts", validate="skip"
            ),
            "user_id",
            p=6,
            by="widx",
        ).collect()
    }
    assert est == batch_est
    # batch-mode delegate: same composition
    bd = stream_hll_windows(batch_in, windows, "user_id", p=6, ts_col="ts")
    assert {
        (r["widx"],): (r["hll_est"], r["v_zero"]) for r in bd.collect()
    } == batch_est


def test_stream_topn_windows_parity(spark, tmp_path):
    """Sink-side count accumulation + read-time rank equals batch
    topn_windows exactly, ties included (cnt DESC, key ASC)."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.timeseries import (
        topn_windows,
    )
    from dataframeintervals_jl_spark.streaming import stream_topn_windows

    schema = "user_id long, ts long"
    b1 = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30), (3, 40), (2, 150), (4, 160)], schema
    )
    b2 = spark.createDataFrame(
        [(2, 15), (3, 25), (3, 35), (5, 170), (4, 180), (4, 190)], schema
    )
    windows = spark.createDataFrame(
        [(0, 100, 1), (100, 200, 2)], "lo long, hi long, widx int"
    ).select(make_span(F.col("lo"), F.col("hi")).alias("span"), "widx")

    d = str(tmp_path / "topnw_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_topn_windows(stream, windows, "user_id", 2, ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("topnw")
        .option("checkpointLocation", str(tmp_path / "ckpt_topnw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT widx, user_id, cnt, CAST(rank AS INT) AS rank FROM ("
            "  SELECT widx, user_id, count(*) AS cnt,"
            "         row_number() OVER (PARTITION BY widx"
            "            ORDER BY count(*) DESC, user_id ASC) AS rank"
            "  FROM topnw GROUP BY widx, user_id)"
            " WHERE rank <= 2"
        ).collect()
    }
    batch = {
        tuple(r)
        for r in topn_windows(
            b1.unionByName(b2), windows, "user_id", 2, ts_col="ts"
        )
        .select("widx", "user_id", "cnt", "rank")
        .collect()
    }
    assert got == batch


def test_stream_heartbeat_windows_parity(spark, tmp_path):
    """Finalized islands through the stream-static overlap join: the
    sink's per-(key, window) sum(live_ns)/count equals batch
    heartbeat_windows exactly.  Each island is emitted once (a
    terminal far-future beat per key flushes the watermark), so the
    sink sums add trivially across micro-batches."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.timeseries import (
        heartbeat_windows,
    )
    from dataframeintervals_jl_spark.streaming import (
        stream_heartbeat_windows,
    )

    NS = 1_000_000_000
    live = 30 * NS
    T0 = 1_000_000 * NS  # keep clear of epoch 0: Spark's stateful-op
    # late filter drops rows at event-time <= the INITIAL watermark
    schema = "user_id long, ts long"
    # beats in seconds-scale ns; islands: a[0..30)+[20..50) merged,
    # a[100..130); b[10..40); terminal flush beats far in the future
    b1 = spark.createDataFrame(
        [(1, T0 + 0 * NS), (1, T0 + 20 * NS), (2, T0 + 10 * NS)], schema
    )
    b2 = spark.createDataFrame(
        [(1, T0 + 100 * NS), (1, T0 + 10_000 * NS),
         (2, T0 + 10_000 * NS)], schema
    )
    windows = spark.createDataFrame(
        [(0, 60 * NS, 1), (60 * NS, 200 * NS, 2)],
        "lo long, hi long, widx int",
    ).select(
        make_span(T0 + F.col("lo"), T0 + F.col("hi")).alias("span"),
        "widx",
    )

    d = str(tmp_path / "hbw_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_heartbeat_windows(
        stream, windows, live, ts_col="ts", by="user_id",
        watermark="10 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hbw")
        .option("checkpointLocation", str(tmp_path / "ckpt_hbw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["widx"]): (r["s"], r["c"])
        for r in spark.sql(
            "SELECT user_id, widx, sum(live_ns) AS s, count(*) AS c "
            "FROM hbw GROUP BY user_id, widx"
        ).collect()
    }
    batch_in = b1.unionByName(b2)
    batch = {
        (r["user_id"], r["widx"]): (r["live_ns"], r["n_islands"])
        for r in heartbeat_windows(
            batch_in, windows, live, ts_col="ts", by="user_id"
        ).collect()
    }
    # the terminal flush beats form their own islands past both
    # windows, so they contribute no (key, window) rows to either side
    assert got == batch


def test_stream_histogram_windows_parity(spark, tmp_path):
    """Sink-side count accumulation over the streamed (key, window,
    bucket) rows equals batch histogram_windows exactly, including the
    underflow/overflow buckets."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.timeseries import (
        histogram_windows,
    )
    from dataframeintervals_jl_spark.streaming import (
        stream_histogram_windows,
    )

    schema = "k string, ts long, v long"
    b1 = spark.createDataFrame(
        [("a", 10, -5), ("a", 20, 0), ("a", 30, 9), ("b", 40, 55)], schema
    )
    b2 = spark.createDataFrame(
        [("a", 50, 99), ("a", 60, 100), ("b", 150, 250), ("b", 160, 55)],
        schema,
    )
    windows = spark.createDataFrame(
        [(0, 100, 1), (100, 200, 2)], "lo long, hi long, widx int"
    ).select(make_span(F.col("lo"), F.col("hi")).alias("span"), "widx")

    d = str(tmp_path / "histw_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_histogram_windows(
        stream, windows, "v", 0, 100, 10, ts_col="ts", by="k"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("histw")
        .option("checkpointLocation", str(tmp_path / "ckpt_histw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT k, widx, bucket, count(*) AS n FROM histw"
            " GROUP BY k, widx, bucket"
        ).collect()
    }
    batch = {
        tuple(r)
        for r in histogram_windows(
            b1.unionByName(b2), windows, "v", 0, 100, 10,
            ts_col="ts", by="k",
        )
        .select("k", "widx", "bucket", "n")
        .collect()
    }
    assert got == batch and len(got) >= 5


def test_stream_entropy_windows_parity(spark, tmp_path):
    """Sink-side pivoted count accumulation + read-time entropy
    projection equals batch entropy_windows exactly."""
    import math

    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.timeseries import (
        entropy_windows,
    )
    from dataframeintervals_jl_spark.streaming import (
        stream_entropy_windows,
    )

    schema = "lab string, ts long"
    b1 = spark.createDataFrame(
        [("a", 10), ("b", 20), ("zz", 30), ("a", 150)], schema
    )
    b2 = spark.createDataFrame(
        [("b", 40), ("a", 160), ("b", 170), ("a", 60)], schema
    )
    windows = spark.createDataFrame(
        [(0, 100, 1), (100, 200, 2)], "lo long, hi long, widx int"
    ).select(make_span(F.col("lo"), F.col("hi")).alias("span"), "widx")

    d = str(tmp_path / "entw_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_entropy_windows(
        stream, windows, "lab", ["a", "b"], ts_col="ts"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("entw")
        .option("checkpointLocation", str(tmp_path / "ckpt_entw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    lnk = repr(math.log(3))
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT widx, n, n_a, n_b, other,"
            " round(e, 6) AS entropy, round(e / " + lnk + ", 6) AS ne"
            " FROM ("
            "  SELECT widx, n, n_a, n_b, other,"
            "    (CASE WHEN n_a > 0 THEN (-(CAST(n_a AS DOUBLE)/CAST(n AS DOUBLE)))"
            "        * ln(CAST(n_a AS DOUBLE)/CAST(n AS DOUBLE)) ELSE 0.0 END"
            "   + CASE WHEN n_b > 0 THEN (-(CAST(n_b AS DOUBLE)/CAST(n AS DOUBLE)))"
            "        * ln(CAST(n_b AS DOUBLE)/CAST(n AS DOUBLE)) ELSE 0.0 END"
            "   + CASE WHEN other > 0 THEN (-(CAST(other AS DOUBLE)/CAST(n AS DOUBLE)))"
            "        * ln(CAST(other AS DOUBLE)/CAST(n AS DOUBLE)) ELSE 0.0 END) AS e"
            "  FROM ("
            "   SELECT widx, count(*) AS n,"
            "     sum(CASE WHEN lab = 'a' THEN 1 ELSE 0 END) AS n_a,"
            "     sum(CASE WHEN lab = 'b' THEN 1 ELSE 0 END) AS n_b,"
            "     sum(CASE WHEN lab IS NULL OR lab NOT IN ('a','b')"
            "         THEN 1 ELSE 0 END) AS other"
            "   FROM entw GROUP BY widx))"
        ).collect()
    }
    batch = {
        tuple(r)
        for r in entropy_windows(
            b1.unionByName(b2), windows, "lab", ["a", "b"], ts_col="ts"
        )
        .select("widx", "n", "n_a", "n_b", "other", "entropy",
                "norm_entropy")
        .collect()
    }
    assert got == batch and len(got) == 2


def test_stream_psi_timeline_parity(spark, tmp_path):
    """Sink-side (period, bucket) count accumulation + read-time PSI
    projection equals batch psi_timeline exactly (nbuckets=1 ->
    3-bucket grid keeps the read-time formula small)."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.operators.profile import psi_timeline
    from dataframeintervals_jl_spark.streaming import stream_psi_timeline

    schema = "v long, ts long"
    b1 = spark.createDataFrame(
        [(5, 0), (15, 1), (5, 10), (25, 11), (-3, 12)], schema
    )
    b2 = spark.createDataFrame(
        [(5, 2), (5, 13), (15, 20), (15, 21), (5, 22)], schema
    )
    d = str(tmp_path / "psi_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_psi_timeline(stream, "v", 0, 20, 1, 10, ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("psit")
        .option("checkpointLocation", str(tmp_path / "ckpt_psit"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # read-time projection: pivot the accumulated counts, join each
    # period to its predecessor, apply the identical PSI term order
    pterm = lambda i: (  # noqa: E731
        f"((CAST(c{i} AS DOUBLE)+1)/(CAST(n AS DOUBLE)+3)"
        f" - (CAST(g{i} AS DOUBLE)+1)/(CAST(n_prev AS DOUBLE)+3))"
        f" * ln(((CAST(c{i} AS DOUBLE)+1)/(CAST(n AS DOUBLE)+3))"
        f" / ((CAST(g{i} AS DOUBLE)+1)/(CAST(n_prev AS DOUBLE)+3)))"
    )
    psi = " + ".join(pterm(i) for i in range(3))
    got = {
        tuple(r)
        for r in spark.sql(
            "WITH per AS ("
            " SELECT period, count(*) AS n,"
            "  sum(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS c0,"
            "  sum(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS c1,"
            "  sum(CASE WHEN bucket = 2 THEN 1 ELSE 0 END) AS c2"
            " FROM psit GROUP BY period),"
            " j AS (SELECT a.period, a.n AS n, b.n AS n_prev,"
            "  a.c0, a.c1, a.c2, b.c0 AS g0, b.c1 AS g1, b.c2 AS g2"
            "  FROM per a JOIN per b ON a.period = b.period + 1)"
            f" SELECT period, n, n_prev, round({psi}, 6) AS psi FROM j"
        ).collect()
    }
    batch = {
        tuple(r)
        for r in psi_timeline(
            b1.unionByName(b2), "v", 0, 20, 1, 10, ts_col="ts"
        ).collect()
    }
    assert got == batch and len(got) >= 1


def test_stream_benford_parity(spark, tmp_path):
    """Sink-side digit-count accumulation + read-time expected/chi2
    projection equals batch benford_digits exactly."""
    from dataframeintervals_jl_spark.operators.profile import (
        benford_digits,
    )
    from dataframeintervals_jl_spark.streaming import stream_benford

    schema = "v double"
    b1 = spark.createDataFrame([(123.4,), (19.0,), (0.5,)], schema)
    b2 = spark.createDataFrame([(1.0,), (-250.0,), (None,)], schema)
    d = str(tmp_path / "benford_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_benford(stream, "v")
    q = (
        out.writeStream.format("memory")
        .queryName("benf")
        .option("checkpointLocation", str(tmp_path / "ckpt_benf"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    p = "ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)"
    e = f"CAST(total AS DOUBLE) * ({p})"
    got = {
        tuple(r)
        for r in spark.sql(
            "WITH c AS (SELECT digit, count(*) AS n FROM benf"
            " GROUP BY digit),"
            " t AS (SELECT sum(n) AS total FROM c)"
            f" SELECT digit, n, (n * 1000000) div total AS obs_ppm,"
            f" round(({p}) * 1000000, 6) AS expected_ppm,"
            f" round((CAST(n AS DOUBLE) - ({e}))"
            f" * (CAST(n AS DOUBLE) - ({e})) / ({e}), 6) AS chi2_term"
            " FROM c, t"
        ).collect()
    }
    batch = {
        tuple(r)
        for r in benford_digits(b1.unionByName(b2), "v").collect()
    }
    assert got == batch and len(got) == 2


def test_stream_interarrival_parity(spark, tmp_path):
    """Stateful gap carry: the gap that SPANS the micro-batch boundary
    must be emitted exactly once (per-key last-ts state), and the
    sink-side decade projection equals batch interarrival_histogram."""
    from dataframeintervals_jl_spark.operators.timeseries import (
        interarrival_histogram,
    )
    from dataframeintervals_jl_spark.streaming import stream_interarrival

    schema = "event_id long, user_id long, ts long"
    # user 1: gaps 9 (in b1), 991 (ACROSS the boundary), 10 (in b2)
    # user 2: single event in each batch -> one cross-batch gap 5
    b1 = spark.createDataFrame(
        [(1, 1, 0), (2, 1, 9), (10, 2, 100)], schema
    )
    b2 = spark.createDataFrame(
        [(3, 1, 1000), (4, 1, 1010), (11, 2, 105)], schema
    )
    d = str(tmp_path / "ia_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_interarrival(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("iarr")
        .option("checkpointLocation", str(tmp_path / "ckpt_iarr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT CAST(CASE WHEN gap <= 0 THEN -1"
            " ELSE length(CAST(gap AS STRING)) - 1 END AS BIGINT) AS decade,"
            " CAST(count(*) AS BIGINT) AS n,"
            " min(gap) AS min_gap, max(gap) AS max_gap"
            " FROM iarr GROUP BY 1"
        ).collect()
    }
    batch = {
        tuple(r)
        for r in interarrival_histogram(b1.unionByName(b2)).collect()
    }
    assert got == batch
    # the boundary gaps really are present: 991 (user 1) and 5 (user 2)
    gaps = sorted(r["gap"] for r in spark.sql("SELECT gap FROM iarr").collect())
    assert gaps == [5, 9, 10, 991]


def test_stream_markov_pairs_parity(spark, tmp_path):
    """Stateful transition carry: the cross-batch transition emits
    exactly once, NULL types break the chain across batches too, and
    the sink count + read-time probability projection equals batch
    markov_transitions."""
    from dataframeintervals_jl_spark.operators.asof_join import (
        markov_transitions,
    )
    from dataframeintervals_jl_spark.streaming import stream_markov_pairs

    schema = "event_id long, user_id long, event_type string, ts long"
    # user 1: a,b in b1; c in b2 -> transitions a->b (b1), b->c (boundary)
    # user 2: a in b1; NULL in b2 then b -> chain broken at the boundary
    b1 = spark.createDataFrame(
        [(1, 1, "a", 0), (2, 1, "b", 1), (10, 2, "a", 0)], schema
    )
    b2 = spark.createDataFrame(
        [(3, 1, "c", 2), (11, 2, None, 1), (12, 2, "b", 2)], schema
    )
    d = str(tmp_path / "mk_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_markov_pairs(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("mkv")
        .option("checkpointLocation", str(tmp_path / "ckpt_mkv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "WITH c AS (SELECT from_type, to_type,"
            " CAST(count(*) AS BIGINT) AS n FROM mkv"
            " GROUP BY from_type, to_type),"
            " t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from"
            " FROM c GROUP BY from_type)"
            " SELECT c.from_type, c.to_type, c.n, t.n_from,"
            " (c.n * 1000000) div t.n_from AS prob_ppm"
            " FROM c JOIN t ON t.from_type = c.from_type"
        ).collect()
    }
    batch = {
        tuple(r)
        for r in markov_transitions(b1.unionByName(b2)).collect()
    }
    assert got == batch
    assert got == {
        ("a", "b", 1, 1, 1000000),  # in-batch
        ("b", "c", 1, 1, 1000000),  # across the boundary, exactly once
    }


def test_stream_drawdown_parity(spark, tmp_path):
    """Stateful peak carry: a batch-2 decline measured against the
    batch-1 peak, sink max()-merge per key equals batch max_drawdown
    bit-for-bit (same IEEE ops on both paths)."""
    from dataframeintervals_jl_spark.operators.timeseries import (
        max_drawdown,
    )
    from dataframeintervals_jl_spark.streaming import stream_drawdown

    schema = "event_id long, user_id long, value double, ts long"
    # user 1: peak 12.0 set in b1; b2's 3.0 must measure against it
    b1 = spark.createDataFrame(
        [(1, 1, 10.0, 0), (2, 1, 12.0, 1), (10, 2, -5.0, 0)], schema
    )
    b2 = spark.createDataFrame(
        [(3, 1, 3.0, 2), (11, 2, -9.0, 1), (12, 2, None, 2)], schema
    )
    d = str(tmp_path / "dd_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_drawdown(stream, "value")
    q = (
        out.writeStream.format("memory")
        .queryName("sdd")
        .option("checkpointLocation", str(tmp_path / "ckpt_sdd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: tuple(r)[1:]
        for r in spark.sql(
            "SELECT user_id, max(peak) AS peak,"
            " max(max_drawdown) AS max_drawdown,"
            " max(max_drawdown_rel) AS max_drawdown_rel"
            " FROM sdd GROUP BY user_id"
        ).collect()
    }
    batch = {
        r["user_id"]: (r["peak"], r["max_drawdown"], r["max_drawdown_rel"])
        for r in max_drawdown(b1.unionByName(b2), "value").collect()
    }
    assert got == batch
    assert got[1] == (12.0, 9.0, 0.75)  # 3.0 vs the CARRIED peak 12.0
    assert got[2] == (-5.0, 4.0, None)


def test_stream_event_paths_parity(spark, tmp_path):
    """Stateful window carry: runs straddling the batch boundary
    (both one- and two-elements-held positions) emit exactly once;
    a NULL inside the carried window blocks runs across it; sink
    counts equal batch event_path_counts(min_count=1)."""
    from dataframeintervals_jl_spark.operators.asof_join import (
        event_path_counts,
    )
    from dataframeintervals_jl_spark.streaming import stream_event_paths

    schema = "event_id long, user_id long, event_type string, ts long"
    # user 1: a b | c d  -> runs abc (straddling, 2 held), bcd
    # user 2: x | NULL y z -> NULL blocks x?y; only NULL-free run: none
    #         (x,NULL,y) and (NULL,y,z) both contain NULL -> nothing
    b1 = spark.createDataFrame(
        [(1, 1, "a", 0), (2, 1, "b", 1), (10, 2, "x", 0)], schema
    )
    b2 = spark.createDataFrame(
        [(3, 1, "c", 2), (4, 1, "d", 3),
         (11, 2, None, 1), (12, 2, "y", 2), (13, 2, "z", 3)], schema
    )
    d = str(tmp_path / "pth_in")
    b1.coalesce(1).write.parquet(d + "/f1")
    b2.coalesce(1).write.parquet(d + "/f2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = stream_event_paths(stream, depth=3)
    q = (
        out.writeStream.format("memory")
        .queryName("pth")
        .option("checkpointLocation", str(tmp_path / "ckpt_pth"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT step_1, step_2, step_3,"
            " CAST(count(*) AS BIGINT) AS n"
            " FROM pth GROUP BY 1, 2, 3"
        ).collect()
    }
    batch = {
        tuple(r)
        for r in event_path_counts(
            b1.unionByName(b2), depth=3, min_count=1
        ).collect()
    }
    assert got == batch
    assert got == {("a", "b", "c", 1), ("b", "c", "d", 1)}
