"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "suite_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Execution is forced through the noop sink (full computation, no driver
collect).  Two extra entries beyond the driver catalog measure the
engine's one inherited algorithmic claim (binned range join beats the
nested-loop plan on large×large):

- selfjoin_binned: event_spans x event_spans overlap join at full sf
  via the binned equi-join rewrite;
- selfjoin_bnl_sample: the same join on a 1/16 sample through the
  BroadcastNestedLoopJoin plan (full-size BNLJ is O(n^2) and would not
  finish) — scale the per-pair cost x256 to compare.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from dataframeintervals_jl_spark import get_spark, interval_join
    from dataframeintervals_jl_spark.queries import QUERIES
    from dataframeintervals_jl_spark.sources import event_spans

    spark = get_spark(app_name="dfi_bench", cpus=cpus)

    timings: dict[str, float] = {}

    def bench(name, build):
        t0 = time.time()
        _force(build())
        timings[name] = round(time.time() - t0, 3)

    for name, (fn, _) in QUERIES.items():
        bench(name, lambda fn=fn: fn(spark, sf_dir))

    # large x large SELECTIVE case: ~100k spans x 10k fine windows.
    # BNLJ must evaluate all 1e9 pairs; the binned rewrite only meets
    # pairs sharing a bin (tens of millions).  A self-overlap-join is
    # NOT a good benchmark here: with ~1500 always-concurrent users the
    # result itself is ~300M rows, so any strategy is output-bound.
    from dataframeintervals_jl_spark import quantile_windows

    es = event_spans(spark, sf_dir).select("event_id", "user_id", "span")
    w10k = quantile_windows(spark, 10_000, es, label="idx")
    bench(
        "windows10k_binned",
        lambda: interval_join(es, w10k, validate="skip", strategy="binned"),
    )
    bench(
        "windows10k_bnl",
        lambda: interval_join(es, w10k, validate="skip", strategy="broadcast_right"),
    )

    spark.stop()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "suite_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
