"""Solo re-baselining runs for individual catalog queries.

Replicates bench.py's GC-clean measurement protocol (noop-sink force,
clearCache + conditional System.gc between samples, contemporaneous
cpu_probe) for a handful of queries named on the command line —
the tool behind BASELINE.md's re-baselining entries.

    python tools/solo_perf.py [n_runs] q_name [q_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_runs = int(sys.argv[1]) if sys.argv[1].isdigit() else 6
    names = [a for a in sys.argv[1:] if not a.isdigit()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from dataframeintervals_jl_spark import get_spark
    from dataframeintervals_jl_spark.queries import QUERIES

    spark = get_spark(app_name="dfi_solo_perf", cpus=cpus)

    def probe() -> float:
        t0 = time.perf_counter()
        x = 0
        for i in range(2_000_000):
            x += i
        assert x >= 0
        return round(time.perf_counter() - t0, 4)

    out = {}
    for name in names:
        fn = QUERIES[name][0]
        samples, probes = [], []
        # untimed warmup once per query
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        for _ in range(n_runs):
            probes.append(probe())
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 2))
            spark.catalog.clearCache()
            try:
                debris = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
            except Exception:
                debris = 0
            if debris:
                import gc

                gc.collect()
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
        out[name] = {"samples": samples, "probes": probes}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
