"""Physical-plan introspection and scale-assertions.

The reference has no optimizer or physical plans (SURVEY.md §3 — eager
operator-at-a-time Julia); in our engine Catalyst owns planning, and
this module is how we *verify* the plans are the ones a 100 TB run
needs: filters pushed into the parquet scan, small sides broadcast,
no Python UDF inside a hot path, and no more shuffles (Exchanges) than
the query fundamentally requires.  Tests use these assertions so a
regression that silently de-optimizes a plan (e.g. a cast that blocks
pushdown, a join that falls back to nested-loop) fails CI rather than
surfacing as a 100x slowdown on a cluster.

Everything here reads ``df._jdf.queryExecution()`` output strings —
stable across Spark 3.x/4.x — and performs no job execution: plans are
analyzed/optimized lazily without running the query.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (same text as ``df.explain('formatted')``
    prints), returned instead of printed so code can assert on it."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    """The one-line-per-operator physical plan (``explain()`` text)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan.

    Every Exchange is a full shuffle of its input at cluster scale —
    the single most important number to watch when reviewing a plan.
    Broadcast exchanges are excluded (they move only the small side).
    """
    plan = simple_plan(df)
    return len(re.findall(r"Exchange (?:hash|range|Single)", plan))


def count_broadcast_exchanges(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastExchange", simple_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """The filters the parquet scan will evaluate inside the reader
    (row-group / page skipping).  Empty when nothing was pushed."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Directory-pruning predicates on hive-partitioned reads — these
    eliminate whole partitions before any file is opened."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", physical_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Top-level column names each parquet scan actually reads — the
    column-pruning check (a 2-column projection must not read 16)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)", physical_plan(df)):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operators in plan order (e.g. ``SortMergeJoin``,
    ``BroadcastHashJoin``, ``BroadcastNestedLoopJoin``)."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        simple_plan(df),
    )


def uses_python_eval(df: DataFrame) -> bool:
    """True when the plan contains a row-at-a-time Python UDF evaluation
    (``BatchEvalPython``) — the slow path our hot operators must avoid.
    Arrow-batched pandas UDFs show as ``ArrowEvalPython``/``FlatMapGroups
    InPandas`` and are allowed where declared."""
    return "BatchEvalPython" in simple_plan(df)


def whole_stage_codegen_ids(df: DataFrame) -> list[int]:
    """Distinct WholeStageCodegen span ids — wider/fewer spans mean more
    of the plan compiles to a single JVM loop."""
    text = simple_plan(df)
    ids = {int(x) for x in re.findall(r"\*\((\d+)\)", text)}
    ids |= {int(x) for x in re.findall(r"WholeStageCodegen \((\d+)\)", text)}
    return sorted(ids)


# ---------------------------------------------------------------------------
# assertions (raise AssertionError with the offending plan attached)
# ---------------------------------------------------------------------------


def _fail(msg: str, df: DataFrame) -> None:
    raise AssertionError(f"{msg}\n--- physical plan ---\n{simple_plan(df)}")


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    """Assert the plan shuffles at most ``n`` times."""
    actual = count_exchanges(df)
    if actual > n:
        _fail(f"expected <= {n} shuffle Exchange(s), found {actual}", df)


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert some filter containing ``fragment`` reached the scan."""
    filters = pushed_filters(df)
    if not any(fragment in f for f in filters):
        _fail(f"no pushed filter contains {fragment!r} (pushed: {filters})", df)

def assert_reads_only(df: DataFrame, columns: set[str]) -> None:
    """Assert every parquet scan reads a subset of ``columns``."""
    extra = set(scan_read_schema(df)) - set(columns)
    if extra:
        _fail(f"scan reads unexpected columns {sorted(extra)}", df)


def assert_join_strategy(df: DataFrame, *expected: str) -> None:
    """Assert the physical join operators are exactly ``expected`` in
    plan order."""
    actual = join_strategies(df)
    if actual != list(expected):
        _fail(f"expected join strategies {list(expected)}, found {actual}", df)


def assert_no_python_row_udf(df: DataFrame) -> None:
    if uses_python_eval(df):
        _fail("plan contains row-at-a-time BatchEvalPython", df)
