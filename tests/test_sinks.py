"""Sink layouts and the plans they buy on re-read: partition pruning,
shuffle-free bucketed joins, row-group skipping for span slices."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframeintervals_jl_spark.plans import (
    count_exchanges,
    join_strategies,
    partition_filters,
    pushed_filters,
)
from dataframeintervals_jl_spark.sources.sinks import (
    read_bucketed,
    write_bucketed,
    write_partitioned,
    write_sorted_spans,
)
from tests.conftest import make_span_df


@pytest.fixture()
def docs(spark):
    rows = [(i, f"lang{i % 3}", float(i)) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string, score double")


def test_partitioned_write_prunes_directories(spark, docs, tmp_path):
    path = str(tmp_path / "docs_part")
    write_partitioned(docs, path, ["lang"])
    back = spark.read.parquet(path).filter(F.col("lang") == "lang1")
    assert partition_filters(back), "no PartitionFilters in plan"
    assert back.count() == 100
    # the partition predicate must NOT appear as a data filter
    assert not any("lang" in f for f in pushed_filters(back))


def test_bucketed_join_needs_no_shuffle(spark, docs, tmp_path):
    other = docs.select("doc_id", (F.col("score") * 2).alias("boost"))
    write_bucketed(
        docs, "t_docs_b", ["doc_id"], 4, sort_cols=["doc_id"],
        path=str(tmp_path / "b1"),
    )
    write_bucketed(
        other, "t_boost_b", ["doc_id"], 4, sort_cols=["doc_id"],
        path=str(tmp_path / "b2"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "t_docs_b").join(
            read_bucketed(spark, "t_boost_b"), "doc_id"
        )
        assert join_strategies(j) == ["SortMergeJoin"]
        assert count_exchanges(j) == 0, "bucketed join must not shuffle"
        assert j.count() == 300
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_boost_b")


def test_bucketed_groupby_needs_no_shuffle(spark, docs, tmp_path):
    write_bucketed(docs, "t_docs_g", ["doc_id"], 4, path=str(tmp_path / "g1"))
    try:
        agg = (
            read_bucketed(spark, "t_docs_g")
            .groupBy("doc_id")
            .agg(F.sum("score").alias("s"))
        )
        assert count_exchanges(agg) == 0
        assert agg.count() == 300
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_g")


def test_sorted_span_layout_pushes_range_filter(spark, tmp_path):
    df = make_span_df(
        spark, [(i * 10, i * 10 + 5) for i in range(1000)]
    ).withColumn("i", F.monotonically_increasing_id())
    path = str(tmp_path / "spans_sorted")
    write_sorted_spans(df, path, n_files=4)
    back = spark.read.parquet(path).filter(
        (F.col("span.start") >= 2000) & (F.col("span.start") < 3000)
    )
    assert back.count() == 100
    assert any("span.start" in f for f in pushed_filters(back)), (
        "nested span.start filter must reach the parquet reader"
    )


def test_csv_json_roundtrip_with_explicit_schema(spark, docs, tmp_path):
    from dataframeintervals_jl_spark.sources import read_csv, read_json

    ddl = "doc_id bigint, lang string, score double"
    cpath, jpath = str(tmp_path / "docs_csv"), str(tmp_path / "docs_json")
    docs.write.mode("overwrite").option("header", "true").csv(cpath)
    docs.write.mode("overwrite").json(jpath)
    for back in (read_csv(spark, cpath, ddl), read_json(spark, jpath, ddl)):
        assert back.schema.simpleString() == docs.schema.simpleString()
        assert back.count() == 300
        got = {r["doc_id"]: (r["lang"], r["score"]) for r in back.collect()}
        exp = {r["doc_id"]: (r["lang"], r["score"]) for r in docs.collect()}
        assert got == exp


def test_prebinned_interval_join_no_shuffle(spark, tmp_path):
    """write_binned_spans + interval_join_prebinned: the binned interval
    join over co-bucketed pre-exploded tables plans with ZERO Exchange
    and matches the on-the-fly binned strategy exactly."""
    from dataframeintervals_jl_spark.operators.interval_join import (
        interval_join,
        interval_join_prebinned,
    )
    from dataframeintervals_jl_spark.sources.sinks import write_binned_spans
    from tests.conftest import collect_sorted

    width = 64
    lefts = make_span_df(
        spark, [(i * 7 % 500, i * 7 % 500 + 1 + i % 40) for i in range(300)]
    ).withColumn("lid", F.monotonically_increasing_id())
    rights = make_span_df(
        spark, [(j * 11 % 520, j * 11 % 520 + 1 + j % 25) for j in range(200)]
    ).withColumn("rid", F.monotonically_increasing_id())
    lefts, rights = lefts.cache(), rights.cache()
    lefts.count(), rights.count()  # pin ids before the double use

    write_binned_spans(lefts, "t_spans_l", width, 4, path=str(tmp_path / "pl"))
    write_binned_spans(rights, "t_spans_r", width, 4, path=str(tmp_path / "pr"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = interval_join_prebinned(
            read_bucketed(spark, "t_spans_l"),
            read_bucketed(spark, "t_spans_r"),
            bin_width=width,
        )
        assert count_exchanges(j) == 0, "prebinned join must not shuffle"
        expect = interval_join(
            lefts, rights, validate="skip", strategy="binned", bin_width=width
        )
        assert collect_sorted(j) == collect_sorted(expect)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_spans_l")
        spark.sql("DROP TABLE IF EXISTS t_spans_r")


def test_prebinned_join_requires_bin_column(spark):
    from dataframeintervals_jl_spark.operators.interval_join import (
        interval_join_prebinned,
    )

    plain = make_span_df(spark, [(0, 10)])
    with pytest.raises(ValueError, match="bin column"):
        interval_join_prebinned(plain, plain, bin_width=10)


def test_write_sized_compacts_small_partitions(spark, tmp_path):
    import os

    from dataframeintervals_jl_spark.sources.sinks import write_sized

    df = spark.range(10_000).repartition(64)  # 64 tiny partitions
    path = str(tmp_path / "sized")
    n = write_sized(df, path, target_file_mb=256)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert n < 64 and len(files) == n
    back = spark.read.parquet(path)
    assert back.count() == 10_000


def test_compact_table_shrinks_files_preserves_rows(spark, tmp_path):
    import pyarrow.parquet as pq

    from dataframeintervals_jl_spark.sources.sinks import compact_table

    df = spark.range(20_000).withColumn("k", F.col("id") % 97)
    frag = str(tmp_path / "frag")
    df.repartition(48).write.parquet(frag)  # 48 tiny files
    out = str(tmp_path / "compacted")
    stats = compact_table(spark, frag, out, sort_cols=["id"])
    assert stats["files_before"] == 48
    assert stats["files_after"] < 48
    assert stats["rows"] == 20_000
    # sorted layout: per-file id ranges must be non-overlapping, so
    # footer min/max stats prune time/key-slice reads
    import glob
    import os

    ranges = []
    for f in glob.glob(os.path.join(out, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        ids = [
            (
                md.row_group(g).column(0).statistics.min,
                md.row_group(g).column(0).statistics.max,
            )
            for g in range(md.num_row_groups)
        ]
        if ids:
            ranges.append((min(lo for lo, _ in ids), max(hi for _, hi in ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # round-trip contents identical
    back = spark.read.parquet(out)
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(20_000))


def test_zorder_value_matches_python_interleave(spark):
    from dataframeintervals_jl_spark.sources.sinks import zorder_value

    def morton(x, y):
        out = 0
        for b in range(21):
            out |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return out

    rows = [(x, y) for x in (0, 1, 5, 1023, 2**21 - 1) for y in (0, 2, 77, 2**20)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r["z"] == morton(r["x"], r["y"]), (r["x"], r["y"])
    plan = df.select(zorder_value(F.col("x"), F.col("y")))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_zordered_layout_clusters_both_dimensions(spark, tmp_path):
    """A filter on EITHER dimension touches few files under z-order;
    under a single-key sort the second dimension is scattered across
    every file."""
    from dataframeintervals_jl_spark.sources.sinks import write_zordered

    n, files = 256, 16
    rows = [(x, y, x * n + y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")

    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, cols=("x", "y"), n_files=files)
    xpath = str(tmp_path / "xsorted")
    (
        df.repartitionByRange(files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    def files_touched(path, cond=None):
        back = spark.read.parquet(path)
        if cond is not None:
            back = back.filter(cond)
        return (
            back.select(F.input_file_name().alias("f")).distinct().count()
        )

    # denominators are the files ACTUALLY written: range-partition
    # sampling can leave empty partitions (no part-file), so bounds
    # against the requested n_files flake under load
    zn, xn = files_touched(zpath), files_touched(xpath)
    y_band = (F.col("y") >= 16) & (F.col("y") < 32)
    assert files_touched(xpath, y_band) == xn  # scattered everywhere
    assert files_touched(zpath, y_band) <= max(zn // 2, 1)

    box = (F.col("x") < 64) & (F.col("y") < 64)  # 1/16 of the grid
    assert files_touched(zpath, box) <= max(zn // 2, 1)
    # correctness: layout changes nothing about the rows
    assert (
        spark.read.parquet(zpath).filter(box).count()
        == spark.read.parquet(xpath).filter(box).count()
        == 64 * 64
    )


def test_zordered_empty_input_and_bad_args(spark, tmp_path):
    from dataframeintervals_jl_spark.sources.sinks import write_zordered

    empty = spark.createDataFrame([], "x long, y long")
    p = str(tmp_path / "zempty")
    write_zordered(empty, p, cols=("x", "y"), n_files=4)
    assert spark.read.parquet(p).count() == 0
    with pytest.raises(ValueError):
        write_zordered(empty, p, cols=("x", "y"), n_files=0)
    with pytest.raises(ValueError):
        write_zordered(empty, p, cols=("x",), n_files=4)


def test_zordered_three_columns(spark, tmp_path):
    from dataframeintervals_jl_spark.sources.sinks import write_zordered

    n, files = 32, 8
    rows = [(x, y, z, 0) for x in range(n) for y in range(n) for z in range(n)]
    df = spark.createDataFrame(rows, "x long, y long, z long, p long")
    path = str(tmp_path / "z3")
    write_zordered(df, path, cols=("x", "y", "z"), n_files=files)
    back = spark.read.parquet(path)
    assert back.count() == n**3
    total = back.select(F.input_file_name()).distinct().count()
    for c in ("x", "y", "z"):
        touched = (
            back.filter(F.col(c) < 4)
            .select(F.input_file_name())
            .distinct()
            .count()
        )
        # every dimension must skip files (a single-key sort skips none
        # on its secondary dims); bound against the files ACTUALLY
        # written — range-partition sampling can leave empty partitions
        assert touched < total, (c, touched, total)


@pytest.mark.parametrize("side", ["keepleft", "keepright"])
def test_prebinned_outer_matches_batch_and_matched_path_no_shuffle(
    spark, tmp_path, side
):
    """Prebinned keepleft/keepright: storage-resident row ids recover
    unmatched base rows (one padded row each, null other side + null
    intersection), pair multiset equals the batch outer join, and the
    MATCHED branch of the plan stays Exchange-free (only the padding
    anti-join may shuffle)."""
    from dataframeintervals_jl_spark.operators.interval_join import (
        interval_join,
        interval_join_prebinned,
    )
    from dataframeintervals_jl_spark.plans import simple_plan
    from dataframeintervals_jl_spark.sources.sinks import write_binned_spans

    width = 64
    # sparse rights: many lefts unmatched (and vice versa at the edges)
    lefts = make_span_df(
        spark, [(i * 37 % 3000, i * 37 % 3000 + 1 + i % 30) for i in range(250)]
    ).withColumn("lid", F.monotonically_increasing_id())
    rights = make_span_df(
        spark, [(j * 211 % 3200, j * 211 % 3200 + 1 + j % 20) for j in range(40)]
    ).withColumn("rid", F.monotonically_increasing_id())
    lefts, rights = lefts.cache(), rights.cache()
    lefts.count(), rights.count()

    tl, tr = f"t_ob_l_{side}", f"t_ob_r_{side}"
    write_binned_spans(lefts, tl, width, 4, path=str(tmp_path / "ol"))
    write_binned_spans(rights, tr, width, 4, path=str(tmp_path / "or"))
    kw = {"keepleft": side == "keepleft", "keepright": side == "keepright"}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = interval_join_prebinned(
            read_bucketed(spark, tl),
            read_bucketed(spark, tr),
            bin_width=width,
            **kw,
        )
        expect = interval_join(
            lefts, rights, validate="skip", strategy="binned",
            bin_width=width, **kw,
        )
        got = sorted(
            ((r["lid"], r["rid"]) for r in j.select("lid", "rid").collect()),
            key=repr,
        )
        exp = sorted(
            ((r["lid"], r["rid"]) for r in expect.select("lid", "rid").collect()),
            key=repr,
        )
        assert got == exp
        assert any(None in p for p in exp), "need unmatched rows"
        # no internal columns leak
        assert not [c for c in j.columns if c.startswith("__dfi")]
        # padded rows carry a null intersection
        nullside = "rid" if side == "keepleft" else "lid"
        pad = j.filter(F.col(nullside).isNull()).first()
        assert pad["span"] is None
        # matched path exchange-free: the inner-only query over the
        # same bucketed tables plans with zero Exchange; the outer
        # plan's exchanges all belong to the padding anti-join branch
        assert "LeftAnti" in simple_plan(j)
        ji = interval_join_prebinned(
            read_bucketed(spark, tl), read_bucketed(spark, tr), bin_width=width
        )
        assert count_exchanges(ji) == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {tl}")
        spark.sql(f"DROP TABLE IF EXISTS {tr}")


def test_prebinned_outer_requires_row_ids(spark, tmp_path):
    from dataframeintervals_jl_spark.operators.interval_join import (
        interval_join_prebinned,
    )
    from dataframeintervals_jl_spark.sources.sinks import write_binned_spans

    spans = make_span_df(spark, [(0, 10), (50, 60)])
    write_binned_spans(
        spans, "t_norid", 16, 2, path=str(tmp_path / "nr"), row_ids=False
    )
    try:
        t = read_bucketed(spark, "t_norid")
        with pytest.raises(ValueError, match="row_ids=True"):
            interval_join_prebinned(t, t, bin_width=16, keepleft=True)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_norid")


def test_update_register_index_versions_merge_and_prune(spark, tmp_path):
    """The generic sketch-index maintenance: each update merges the
    batch registers with the persisted latest and prunes to
    keep_versions; the final index equals whole-input registers for
    BOTH a bottom-k (qsk) and a re-sum (cms) family."""
    import glob
    import pytest
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.operators.sampling import (
        cms_merge_registers,
        cms_registers,
        qsk_merge_registers,
        qsk_registers,
    )
    from dataframeintervals_jl_spark.sources.sinks import (
        read_register_index,
        update_register_index,
    )

    df = spark.range(900).select(
        (F.col("id") % 2).alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") * 17 % 401).alias("v"),
        F.concat(F.lit("w"), F.col("id") % 23).alias("w"),
    )
    slices = [df.filter(F.col("id") % 3 == i) for i in range(3)]

    qpath = str(tmp_path / "qsk_idx")
    for s in slices:
        update_register_index(
            spark,
            qpath,
            qsk_registers(s, "v", "rid", k=32, by="g"),
            lambda a, b: qsk_merge_registers(a, b, k=32, by="g"),
        )
    final = read_register_index(spark, qpath)
    whole = qsk_registers(df, "v", "rid", k=32, by="g")
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, whole.collect())
    )
    assert len(glob.glob(qpath + "/v*")) == 2  # keep_versions default

    cpath = str(tmp_path / "cms_idx")
    for s in slices:
        update_register_index(
            spark,
            cpath,
            cms_registers(s, "w", 32, 3),
            cms_merge_registers,
            keep_versions=1,
        )
    cfinal = read_register_index(spark, cpath)
    cwhole = cms_registers(df, "w", 32, 3)
    assert sorted(map(tuple, cfinal.collect())) == sorted(
        map(tuple, cwhole.collect())
    )
    assert len(glob.glob(cpath + "/v*")) == 1  # pruned to newest only
    with pytest.raises(FileNotFoundError):
        read_register_index(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="keep_versions"):
        update_register_index(spark, cpath, cwhole, cms_merge_registers, 0)

    # time travel: within the qsk index's retention window both v1 and
    # v2 are readable; v2 pinned == latest; v0 was pruned -> typed miss
    pinned = read_register_index(spark, qpath, version=2)
    assert sorted(map(tuple, pinned.collect())) == sorted(
        map(tuple, final.collect())
    )
    prev = read_register_index(spark, qpath, version=1)
    two = qsk_merge_registers(
        qsk_registers(slices[0], "v", "rid", k=32, by="g"),
        qsk_registers(slices[1], "v", "rid", k=32, by="g"),
        k=32,
        by="g",
    )
    assert sorted(map(tuple, prev.collect())) == sorted(
        map(tuple, two.collect())
    )
    with pytest.raises(FileNotFoundError, match="kept versions"):
        read_register_index(spark, qpath, version=0)


def test_update_register_index_order_independent(spark, tmp_path):
    """Feeding the same slices in a different order converges to the
    same final index (merge associativity/commutativity is the whole
    point of the register contract)."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.operators.sampling import (
        qsk_merge_registers,
        qsk_registers,
    )
    from dataframeintervals_jl_spark.sources.sinks import (
        read_register_index,
        update_register_index,
    )

    df = spark.range(500).select(
        F.col("id").alias("rid"), (F.col("id") * 31 % 257).alias("v")
    )
    slices = [df.filter(F.col("id") % 3 == i) for i in range(3)]
    merge = lambda a, b: qsk_merge_registers(a, b, k=24)  # noqa: E731
    finals = []
    for order in ((0, 1, 2), (2, 0, 1)):
        path = str(tmp_path / f"idx_{order[0]}{order[1]}{order[2]}")
        for i in order:
            update_register_index(
                spark, path, qsk_registers(slices[i], "v", "rid", k=24), merge
            )
        finals.append(
            sorted(map(tuple, read_register_index(spark, path).collect()))
        )
    assert finals[0] == finals[1]


def test_orc_roundtrip_with_pushdown(spark, docs, tmp_path):
    """ORC interchange: values round-trip exactly and an equality
    filter reaches the ORC reader as a pushed filter (the native
    datasource does pushdown + pruning like parquet)."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.sources import read_orc

    p = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(p)
    back = read_orc(spark, p)
    assert back.schema.simpleString() == docs.schema.simpleString()
    got = {r["doc_id"]: (r["lang"], r["score"]) for r in back.collect()}
    exp = {r["doc_id"]: (r["lang"], r["score"]) for r in docs.collect()}
    assert got == exp

    flt = read_orc(spark, p).filter(F.col("lang") == "en")
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan.split(
        "PushedFilters"
    )[1][:120], "lang filter must reach the ORC reader"


def test_write_jsonl_roundtrip_and_sharding(spark, tmp_path):
    """write_jsonl: text with quotes/newlines/unicode survives the
    encode/decode hop exactly; target_rows_per_file controls shard
    count; gzip names the codec in the part files."""
    from dataframeintervals_jl_spark.sources import read_json
    from dataframeintervals_jl_spark.sources.sinks import write_jsonl

    rows = [
        (1, 'he said "hi"\nand left', "en"),
        (2, "tabs\tandé unicode 中文", "zh"),
        (3, "plain", "en"),
        (4, None, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "jl")
    write_jsonl(df, out, target_rows_per_file=2)
    import glob

    parts = glob.glob(out + "/part-*")
    assert len(parts) == 2, parts
    back = read_json(spark, out, df.schema)
    assert {tuple(r) for r in back.collect()} == set(rows)

    gz = str(tmp_path / "jlgz")
    write_jsonl(df, gz, compression="gzip")
    assert glob.glob(gz + "/part-*.gz")
    assert {
        tuple(r) for r in read_json(spark, gz, df.schema).collect()
    } == set(rows)
