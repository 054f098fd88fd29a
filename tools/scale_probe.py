"""10x scale probe (round 9): measure the heavy operator families at
sf0.1 AND at a synthesized 10x-sf0.1 dataset, so the engine's scale
claims have a measured slope instead of plan-shape arguments alone.

The 10x tables are 10 tagged copies of documents / events / embeddings:

- ``documents``: doc_id shifted per copy; copies > 0 get EVERY token
  prefixed with a copy tag (``c3foo``), so every shingle differs
  across copies and each copy is an INDEPENDENT corpus with the
  original's internal near-dup density.  (A first version appended a
  2-token copy tag instead — that prevents only EXACT duplication:
  MinHash signatures of 100-token docs barely move when 2 tokens
  change, so copies band-collided and the pair OUTPUT grew
  quadratically in the copy count — a 30x run measured 35x minhash
  cost from the inflated output, not from the engine);
- ``events``: user/event ids shifted per copy (each copy is a fresh
  user population) and the timeline laid end-to-end (ts shifted by a
  full dataset span per copy) — temporal density per bin is unchanged,
  the TIMELINE is 10x longer, which is what 10x event data means;
- ``embeddings``: vec_id shifted, first dimension perturbed per copy.

Usage:
    python tools/scale_probe.py [--copies 10] [--skip-small]

Prints one JSON line: per-query seconds at sf0.1 and at 10x, plus the
slope (x10_sec / sf01_sec; ~<= 10 means at-worst-linear scaling for a
10x input on fixed cores).  One sample per point — read slopes, not
absolute values, and re-run if the host is stealing CPU.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
OUT = "/tmp/dfi_scale10"
ID_SHIFT = 100_000_000

HEAVY = [
    "q_interval_join_binned",
    "q_minhash_lsh_pairs",
    "q_simhash_pairs",
    "q_incremental_dedup",
    "q_similarity_pq",
    "q_pagerank",
    "q_k_core",
    "q_dedup_lines",
    "q_pack_sequences",
    "q_duplicate_spans",
    # round-10 hypertable window-aggregate family (VERDICT r10 #4):
    # events scale 10x/30x in COUNT and TIMELINE; the windows side
    # stays 16 rows, so slopes read the stab/validity machinery
    "q_time_weighted_locf",
    "q_time_weighted_linear",
    "q_gapfill_locf",
    "q_gapfill_interp",
    "q_hll_windows",
    "q_stats2d_windows",
    "q_masked_twa",
    # round-11 additions: equi-width histogram (stab + partial-agg
    # count) and the ACF correlogram (one per-key sort window + explode
    # + partial-agged moments)
    "q_histogram_windows",
    "q_acf",
    # chunked ACF: same answer, parallelism = #chunks not #keys — the
    # slope should collapse vs q_acf's key-limited 26.7
    "q_acf_chunked",
    # round-11 continuation: shingle-shuffle novelty, bigram PMI, and
    # the island-merge + keyed-interval-join agreement composition
    "q_gram_novelty",
    "q_pmi_collocations",
    "q_interval_agreement",
    # round-11 continuation session 2: interval NMS (keyed interval
    # join + anti), the event-sequence operators (one user-keyed
    # window each), and the orders-based rollups (scaled orders table:
    # fresh customer population per copy, timeline laid end-to-end)
    "q_nms_spans",
    "q_markov_transitions",
    "q_drawdown",
    "q_interarrival",
    "q_rfm",
    "q_cohort_ltv",
    # bucketed global row_number: the slope reads whether the
    # value-range decomposition really avoids a global-sort blowup
    "q_global_rank",
    # lineitem-based (scaled lineitem: fresh order/part population per
    # copy): basket self-join and the decimal-sum Gini over the rank
    "q_item_cooccurrence",
    "q_gini",
    "q_spearman",
]


def build_scaled(
    spark,
    copies: int,
    out: str = OUT,
    src_dir: str = SF01,
    tables=("documents", "events", "orders", "lineitem", "embeddings"),
) -> None:
    """Write ``copies`` tagged copies of the selected sf0.1 tables to
    ``out`` (see module docstring for the copy semantics per table).
    ``tables`` lets a caller (e.g. bench.py's x10 block) skip tables
    its queries never read — the build is untimed but not free."""
    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark.sources import read_table

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def _union(parts):
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    if "documents" in tables:
        docs = read_table(spark, src_dir, "documents")
        parts = []
        for k in range(copies):
            c = docs.select(
                (F.col("doc_id") + F.lit(k * ID_SHIFT)).alias("doc_id"),
                (
                    F.col("text")
                    if k == 0
                    else F.regexp_replace(F.col("text"), r"(\S+)", f"c{k}$1")
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            parts.append(c)
        _union(parts).repartition(32).write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )

    if "events" in tables:
        ev = read_table(spark, src_dir, "events")
        rng = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
        span = int(rng["hi"]) - int(rng["lo"]) + 86_400_000_000_000
        parts = []
        for k in range(copies):
            c = ev.select(
                (F.col("event_id") + F.lit(k * ID_SHIFT)).alias("event_id"),
                (F.col("user_id") + F.lit(k * ID_SHIFT)).alias("user_id"),
                "event_type",
                (F.col("ts") + F.lit(k * span)).alias("ts"),
                "value",
            )
            parts.append(c)
        _union(parts).repartition(32).write.mode("overwrite").parquet(
            f"{out}/events.parquet"
        )

    if "orders" in tables:
        od = read_table(spark, src_dir, "orders")
        orng = od.agg(
            F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
        ).first()
        odays = (orng["hi"] - orng["lo"]).days + 1
        parts = []
        for k in range(copies):
            c = od.select(
                (F.col("o_orderkey") + F.lit(k * ID_SHIFT)).alias("o_orderkey"),
                (F.col("o_custkey") + F.lit(k * ID_SHIFT)).alias("o_custkey"),
                "o_orderstatus",
                "o_totalprice",
                (
                    F.col("o_orderdate")
                    + F.make_dt_interval(F.lit(k * odays))
                ).alias("o_orderdate"),
                "o_orderpriority",
            )
            parts.append(c)
        _union(parts).repartition(32).write.mode("overwrite").parquet(
            f"{out}/orders.parquet"
        )

    if "lineitem" in tables:
        li = read_table(spark, src_dir, "lineitem")
        parts = []
        for k in range(copies):
            c = li.select(
                (F.col("l_orderkey") + F.lit(k * ID_SHIFT)).alias(
                    "l_orderkey"
                ),
                (F.col("l_partkey") + F.lit(k * ID_SHIFT)).alias("l_partkey"),
                (F.col("l_suppkey") + F.lit(k * ID_SHIFT)).alias("l_suppkey"),
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            )
            parts.append(c)
        _union(parts).repartition(32).write.mode("overwrite").parquet(
            f"{out}/lineitem.parquet"
        )

    if "embeddings" in tables:
        emb = read_table(spark, src_dir, "embeddings")
        parts = []
        for k in range(copies):
            c = emb.select(
                (F.col("vec_id") + F.lit(k * ID_SHIFT)).alias("vec_id"),
                F.transform(
                    F.col("embedding"),
                    lambda x, i: x
                    + F.when(i == 0, F.lit(float(k) * 0.01)).otherwise(
                        F.lit(0.0)
                    ),
                ).alias("embedding"),
            )
            parts.append(c)
        _union(parts).repartition(32).write.mode("overwrite").parquet(
            f"{out}/embeddings.parquet"
        )


def main() -> None:
    copies = 10
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    skip_small = "--skip-small" in sys.argv
    families = HEAVY
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        families = [n for n in HEAVY if n in only]

    from dataframeintervals_jl_spark import get_spark
    from dataframeintervals_jl_spark.queries import QUERIES

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dfi_scale_probe", cpus=cpus)

    t0 = time.time()
    build_scaled(spark, copies)
    gen_sec = round(time.time() - t0, 1)

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    def _clean():
        spark.catalog.clearCache()
        try:
            from dataframeintervals_jl_spark.operators.similarity import (
                release_ann_caches,
            )

            release_ann_caches()
        except Exception:
            pass

    def _cpu_probe() -> float:
        # bench.py's contemporaneous host-steal indicator: a fixed
        # single-thread workload, ~0.07s on a quiet core — recorded per
        # query slot so a slow reading with a slow probe reads as
        # environment noise, not engine behavior
        t0 = time.perf_counter()
        x = 0
        for i in range(2_000_000):
            x += i
        assert x >= 0
        return round(time.perf_counter() - t0, 4)

    probes = {}

    def run(name, sf_dir):
        # best-of-3 (steal windows on this host inflate single samples
        # 3-25x): intermediates cleaned between samples
        fn = QUERIES[name][0]
        probes.setdefault(name, []).append(_cpu_probe())
        samples = []
        for _ in range(3):
            t0 = time.time()
            _force(fn(spark, sf_dir))
            samples.append(time.time() - t0)
            _clean()
        return round(min(samples), 2)

    # untimed warmup: touch both directories and pay scan-metadata +
    # codegen init before the first measured query
    for d in ([SF01] if not skip_small else []) + [OUT]:
        from dataframeintervals_jl_spark.sources import read_table as _rt

        for t in ("documents", "events", "embeddings"):
            _rt(spark, d, t).limit(1).count()

    out = {}
    for name in families:
        rec = {}
        try:
            if not skip_small:
                rec["sf0.1_sec"] = run(name, SF01)
            rec[f"x{copies}_sec"] = run(name, OUT)
            if "sf0.1_sec" in rec and rec["sf0.1_sec"] > 0:
                rec["slope"] = round(rec[f"x{copies}_sec"] / rec["sf0.1_sec"], 2)
        except Exception as exc:  # noqa: BLE001
            rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = rec
        print(f"## {name}: {rec}", flush=True)

    spark.stop()
    print(
        json.dumps(
            {
                "copies": copies,
                "gen_sec": gen_sec,
                "queries": out,
                "cpu_probe": probes,
            }
        )
    )


if __name__ == "__main__":
    main()
