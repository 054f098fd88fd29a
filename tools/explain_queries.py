"""Dump .explain('formatted') for named catalog queries to plans/r11/.

    python tools/explain_queries.py before q_masked_twa q_pagerank ...
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dataframeintervals_jl_spark import get_spark
    from dataframeintervals_jl_spark.queries import QUERIES

    spark = get_spark(app_name="dfi_explain", cpus=8)
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r11",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = QUERIES[name][0]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan.splitlines())} plan lines")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
