"""As-of (nearest-event) join — engine extension beyond the reference.

The reference has no as-of join (SURVEY.md §2.C: interval overlap is its
only join); a training-data pipeline needs one constantly (attach the
latest state/annotation at-or-before each sample's timestamp).

Spark-first execution: the classic union+window rewrite instead of a
range join.  Tag both inputs, union them, and carry the most recent
right row forward with ``last(..., ignorenulls=True)`` over a window
partitioned by the ``by`` keys and ordered by (time, tag).  Cost: ONE
shuffle on the ``by`` keys (the same shuffle a groupBy would do) —
horizontally scalable at 100 TB, with no nested-loop join and no
per-key skew beyond what the key distribution itself has.  A range-join
formulation would be O(n·m) per key; this is O((n+m) log(n+m)) per
partition (the window sort), and the sort is spillable.

Right rows sort BEFORE left rows at equal timestamps, so an exact
timestamp tie matches (``t_right <= t_left``), exactly like DuckDB's
``ASOF JOIN`` (the correctness oracle).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__dfi_asof_tag"
_CARRY = "__dfi_asof_carry"
_RTIME = "__dfi_asof_rtime"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, tuple] = "ts",
    by: Union[str, Sequence[str], None] = None,
    direction: str = "backward",
    tolerance: Optional[int] = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the single nearest right row.

    ``direction='backward'`` (default): latest right row with
    ``r.on <= l.on``; ``'forward'``: earliest right row with
    ``r.on >= l.on``.  ``by`` equi-keys restrict matches (e.g. per
    user).  ``tolerance`` (same unit as ``on``, typically ns) nulls the
    match when the time gap exceeds it.

    Output: all left columns, then each right payload column renamed
    with ``suffix`` (the right ``on`` column becomes ``on + suffix``
    too, holding the matched timestamp).  Unmatched left rows keep
    nulls — left-outer semantics, one output row per left row (ties on
    the right side resolved by the later row in input order being
    carried; pre-aggregate the right side if you need a different rule).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    left_on, right_on = (on, on) if isinstance(on, str) else on
    by_cols = [by] if isinstance(by, str) else list(by or [])
    for c in [left_on] + by_cols:
        if c not in left.columns:
            raise ValueError(f"column {c!r} not found in left table")
    for c in [right_on] + by_cols:
        if c not in right.columns:
            raise ValueError(f"column {c!r} not found in right table")

    right_payload = [c for c in right.columns if c != right_on and c not in by_cols]
    out_right_names = {c: f"{c}{suffix}" for c in right_payload}
    clash = [n for n in out_right_names.values() if n in left.columns]
    clash += [f"{left_on}{suffix}"] if f"{left_on}{suffix}" in left.columns else []
    if clash:
        raise ValueError(f"suffixed right columns clash with left columns: {clash}")

    # Tagged union: right rows carry their payload in ONE struct column
    # (so a legitimately-null payload field is still carried — carrying
    # fields separately with ignorenulls would resurrect older values).
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_TAG),
        F.lit(None).cast("struct<" + ",".join(
            f"`{c}`: {right.schema[c].dataType.simpleString()}" for c in right_payload
        ) + ">" if right_payload else "struct<__dummy: int>").alias(_CARRY),
        F.lit(None).cast("long").alias(_RTIME),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by_cols and c != left_on],
        *[F.col(c) for c in by_cols],
        F.col(right_on).cast("long").alias(left_on),
        F.lit(0).alias(_TAG),
        (F.struct(*[F.col(c) for c in right_payload]) if right_payload
         else F.struct(F.lit(0).alias("__dummy"))).alias(_CARRY),
        F.col(right_on).cast("long").alias(_RTIME),
    ).select(*l_tagged.columns)  # align column order

    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        order = [F.col(left_on).asc(), F.col(_TAG).asc()]
    else:
        order = [F.col(left_on).desc(), F.col(_TAG).asc()]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col(_TAG),
        F.last(_CARRY, ignorenulls=True).over(w).alias(_CARRY),
        F.last(_RTIME, ignorenulls=True).over(w).alias(_RTIME),
    ).filter(F.col(_TAG) == 1)

    matched = F.col(_RTIME).isNotNull()
    if tolerance is not None:
        gap = (
            F.col(left_on).cast("long") - F.col(_RTIME)
            if direction == "backward"
            else F.col(_RTIME) - F.col(left_on).cast("long")
        )
        matched = matched & (gap <= F.lit(int(tolerance)))

    out = [F.col(c) for c in left.columns]
    out.append(F.when(matched, F.col(_RTIME)).alias(f"{left_on}{suffix}"))
    for c in right_payload:
        out.append(
            F.when(matched, F.col(_CARRY).getField(c)).alias(out_right_names[c])
        )
    return filled.select(*out)
