"""Gap-based sessionization: point-event streams → interval tables.

Engine extension beyond the reference (which consumes interval columns
but offers no way to BUILD them from events; SURVEY.md §2.C).  This is
the canonical producer feeding ``interval_join``/``quantile_windows``:
cut each key's event stream wherever the gap to the previous event
exceeds ``gap`` ns, and emit one span row per session.

Execution: two window functions over one shuffle on the ``by`` keys
(lag → boundary flag → running sum = session id), then a groupBy on
(by, session id) — Catalyst keeps the second aggregation on the same
partitioning when ``by`` is a prefix of the grouping key, so at 100 TB
this is one wide shuffle + a local sort, all spillable.  The same
semantics stream with ``F.session_window`` (see streaming module).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.spans import make_span


def sessionize(
    df: DataFrame,
    gap: int,
    ts_col: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    spancol: str = "span",
    extend_by_gap: bool = False,
) -> DataFrame:
    """One row per (by-keys, session): ``by + [spancol, n_events]``.

    A new session starts when ``ts - previous ts > gap`` (a gap of
    exactly ``gap`` ns still belongs to the running session).  The span
    is ``[first_ts, last_ts)`` — or ``[first_ts, last_ts + gap)`` when
    ``extend_by_gap`` (the session-window convention, matching
    ``F.session_window``'s half-open windows).
    """
    if gap <= 0:
        raise ValueError(f"gap must be positive ns, got {gap}")
    by_cols = [by] if isinstance(by, str) else list(by)

    w = Window.partitionBy(*by_cols).orderBy(F.col(ts_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (prev.isNull() | (F.col(ts_col).cast("long") - prev.cast("long") > gap)).cast("long")
    sessioned = df.select(
        *by_cols,
        F.col(ts_col).cast("long").alias(ts_col),
        F.sum(is_new).over(
            Window.partitionBy(*by_cols)
            .orderBy(F.col(ts_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__dfi_session"),
    )
    stop = F.max(ts_col).cast("long") + (F.lit(int(gap)) if extend_by_gap else F.lit(0))
    return (
        sessioned.groupBy(*by_cols, "__dfi_session")
        .agg(
            F.min(ts_col).alias("__start"),
            stop.alias("__stop"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            *by_cols,
            F.col("__dfi_session").alias("session_id"),
            make_span(F.col("__start"), F.col("__stop")).alias(spancol),
            "n_events",
        )
    )
