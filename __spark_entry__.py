"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``dataframeintervals_jl_spark`` package;
this file only adapts it to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Interval overlap join of per-user event spans against 4 equal-width
    quantile windows, grouped per (window, event_type).
    """
    from dataframeintervals_jl_spark import ensure_session_configs
    from dataframeintervals_jl_spark.queries import q_groupby_interval_join_agg

    ensure_session_configs(spark)
    return q_groupby_interval_join_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dataframeintervals_jl_spark.queries import QUERIES

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from dataframeintervals_jl_spark import ensure_session_configs

            ensure_session_configs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    from dataframeintervals_jl_spark.queries import QUERIES

    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
