"""Regenerate docs/PLANS.md — the physical plans of the headline
operators, captured from a live session at sf0.001."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataframeintervals_jl_spark as dfi
from pyspark.sql import functions as F

from dataframeintervals_jl_spark.operators.groupby_interval_join import (
    groupby_interval_join,
)
from dataframeintervals_jl_spark.operators.interval_join import interval_join
from dataframeintervals_jl_spark.operators.quantile_windows import quantile_windows
from dataframeintervals_jl_spark.plans import simple_plan
from dataframeintervals_jl_spark.sources import event_spans, read_table


def main() -> None:
    spark = dfi.get_spark(app_name="dump_plans", cpus=8)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    es = event_spans(spark, sf)
    w = quantile_windows(spark, 4, es, label="quarter")

    sections = []

    def add(title, note, df):
        sections.append((title, note, simple_plan(df)))

    add(
        "interval_join — broadcast path (small windows side)",
        "One BroadcastExchange for the 4-row windows table; the events side is "
        "never shuffled by the join itself (the single Exchange below feeds the "
        "lead() window that derives spans). BroadcastNestedLoopJoin over a "
        "broadcast side of n rows is O(n) per input row with n tiny — optimal here.",
        interval_join(es, w, validate="skip", strategy="broadcast_right"),
    )
    add(
        "interval_join — binned path (large x large)",
        "Both sides explode into fixed-width bins and meet in a bin equi-join "
        "(SortMergeJoin after Exchange hashpartitioning on the bin id) — "
        "horizontally scalable where a nested loop is quadratic. The residual "
        "overlap predicate + emit-once guard run inside the join; no "
        "distinct/dedup shuffle follows.",
        interval_join(
            es, w, validate="skip", strategy="binned", bin_width=3_600_000_000_000
        ),
    )
    g = groupby_interval_join(
        es,
        w,
        groups=["quarter", "event_type"],
        validate="skip",
        strategy="broadcast_right",
    )
    add(
        "groupby_interval_join — fused join+agg",
        "Catalyst pipelines join -> partial HashAggregate -> Exchange on the "
        "group key -> final HashAggregate: the joined rows are never "
        "materialized, which is the entire point of the reference's "
        "GroupedIntervalJoin, here for free.",
        g.agg(F.count(F.lit(1)).alias("n")),
    )
    docs = (
        read_table(spark, sf, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "lang")
    )
    add(
        "scan with pushdown + pruning",
        "PushedFilters and a 2-column ReadSchema at the FileScan: predicate "
        "and projection reach the reader.",
        docs,
    )

    from dataframeintervals_jl_spark import (
        interval_join_by,
        interval_semi_join,
        overlap_profile,
    )

    clicks = es.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "span"
    )
    views = es.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("v_event"), "span"
    )
    add(
        "interval_join_by — keyed overlap join (hash path)",
        "Both sides shuffle ONCE on the key; the join is an equi join "
        "(sort-merge / shuffled-hash, AQE's choice) with the overlap "
        "predicate as residual. No cross-key candidate is ever generated — "
        "the shape that survives high key cardinality.",
        interval_join_by(clicks, views, by="user_id", validate="skip"),
    )
    add(
        "interval_semi_join — broadcast existence probe",
        "One BroadcastExchange of the span column, BroadcastNestedLoopJoin "
        "LeftSemi streamed over the big side: multiset-preserving EXISTS "
        "with zero shuffles of the probe side and no dedup.",
        interval_semi_join(
            es, w.filter(F.col("quarter").isin(2, 3)).select("span"),
            strategy="broadcast_right",
        ),
    )
    add(
        "overlap_profile — keyless sweep line without SinglePartition",
        "Boundary deltas collapse in a map-side-partial groupBy; the running "
        "depth runs per range-bucket with driver-broadcast prefix "
        "corrections — no single-partition Exchange anywhere.",
        overlap_profile(es.select("span")),
    )

    from dataframeintervals_jl_spark.operators.profile import profile_table
    from dataframeintervals_jl_spark.operators.sampling import qsk_registers

    docs_full = read_table(spark, sf, "documents")
    add(
        "qsk_registers — quantile-sketch bottom-k with WindowGroupLimit",
        "The only data-sized stage: WindowGroupLimit prunes each task to k "
        "rows per group BEFORE the exchange, so shuffle volume is "
        "O(tasks·groups·k) regardless of input size — the contract every "
        "sketch in the family (KMV / QSK / overlap matrix) relies on.",
        qsk_registers(docs_full, "n_chars", "doc_id", k=64, by="lang"),
    )
    add(
        "profile_table — one composite aggregate + one shared sketch pass",
        "Pass 1 partial-aggregates every column's null/min/max/sum "
        "expressions map-side into a single row (no data shuffle); pass 2 is "
        "the KMV explode whose bottom-k is WindowGroupLimit-pruned per "
        "column. The glue join is |columns| x |columns| rows.",
        profile_table(docs_full, k=64),
    )

    from dataframeintervals_jl_spark.operators.similarity import (
        lsh_rerank_topk,
    )

    emb = read_table(spark, sf, "embeddings")
    add(
        "lsh_rerank_topk — narrow candidate join + exact re-rank fetch",
        "Stage 1 joins only (table, bucket, id) triples — the probe side, "
        "the deduped candidate ids, and the query vectors all arrive as "
        "BroadcastExchanges, so the corpus is never shuffled and no "
        "Exchange carries a vector column; stage 2's exact cosine touches "
        "raw vectors for |candidates| rows only.",
        lsh_rerank_topk(
            emb, emb.filter(F.col("vec_id") < 3), dim=64, k=3, n_tables=2
        ),
    )

    from dataframeintervals_jl_spark.operators.asof_join import funnel_counts

    ev = read_table(spark, sf, "events")
    add(
        "funnel_counts — forward as-of joins over shrinking anchors",
        "Each stage is the as-of family's bucketed per-key merge from the "
        "surviving anchors onto the next step's events, then a tiny "
        "count-distinct; the anchor set only ever shrinks, and nothing "
        "driver-side grows with data volume.",
        funnel_counts(ev, ["view", "click"], within=6 * 3_600_000_000_000),
    )

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "PLANS.md")
    with open(out, "w") as f:
        f.write("# Physical plans of the headline operators\n\n")
        f.write(
            "Captured from `df.explain()` at sf0.001 (plan shapes are "
            "scale-independent; AQE\nmay further coalesce partitions at "
            "runtime). Regenerate with\n`python tools/dump_plans.py`. These "
            "are the plans `tests/test_plans.py` locks in.\n"
        )
        for title, note, plan in sections:
            f.write(f"\n## {title}\n\n{note}\n\n```\n{plan.strip()}\n```\n")
    spark.stop()
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
