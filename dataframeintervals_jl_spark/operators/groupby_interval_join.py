"""Fused (lazy) interval-join + group-by.

Parity target: ``groupby_interval_join`` / ``GroupedIntervalJoin`` /
``combine`` / ``iterate``
(/root/reference/src/DataFrameIntervals.jl:241-329).  The reference
builds this operator because materializing the full join before
grouping is memory-hungry in an eager engine; in Spark EVERY DataFrame
is lazy and Catalyst pipelines join→partial-agg→final-agg without ever
materializing the join to storage, so the semantics come for free:
``interval_join(...).groupBy(groups).agg(...)``.  The class below
exists to reproduce the reference's API shape, its selector resolution
(left/right split, error cases) and its output column order
(right group cols, then left group cols — reference src:320-329).
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.selectors import Invalid, find_valid
from .interval_join import _apply_rename, _as_pair, _resolve_on, interval_join


class GroupedIntervalJoin:
    """Lazy join+group handle supporting ``agg`` (≅ reference
    ``combine``), ``apply_in_pandas`` (≅ ``AsTable(:) => f => AsTable``)
    and iteration over per-group DataFrames (≅ ``Base.iterate``,
    small-result use only)."""

    def __init__(self, joined: DataFrame, right_cols: list, left_cols: list):
        self._joined = joined
        self.right_cols = right_cols
        self.left_cols = left_cols
        self.group_cols = right_cols + left_cols

    @property
    def df(self) -> DataFrame:
        """The (lazy) joined DataFrame."""
        return self._joined

    def grouped(self):
        return self._joined.groupBy(*self.group_cols)

    def agg(self, *exprs: Column) -> DataFrame:
        """Grouped aggregation; output columns = right group cols, then
        left group cols (reference order, src:320-329), then aggregates."""
        return self.grouped().agg(*exprs)

    def apply_in_pandas(self, func, schema) -> DataFrame:
        """Arbitrary per-group table function — the Spark expression of
        the reference's ``AsTable(:) => helper => AsTable`` pattern
        (src:323)."""
        return self.grouped().applyInPandas(func, schema)

    def __iter__(self) -> Iterator[tuple]:
        """Yield ``(group_key_row, pandas.DataFrame)`` per group,
        right-group-major like the reference's ``iterate``
        (src:293-310): groups stream in natural value order of the
        right group columns, then the left group columns, from ONE
        sorted pass (``orderBy`` + ``toLocalIterator`` — a single
        global-sort job streamed partition by partition, not one job
        per group).

        Driver-side convenience for small results only (the reference's
        ``iterate`` is likewise a client-side stream); at scale use
        :meth:`agg` / :meth:`apply_in_pandas`.
        """
        import pandas as pd
        from pyspark.sql import Row

        cols = self._joined.columns
        ordered = self._joined.orderBy(
            *[F.col(c).asc_nulls_last() for c in self.group_cols]
        )

        def _emit(key, rows):
            key_row = Row(**dict(zip(self.group_cols, key)))
            return key_row, pd.DataFrame(rows, columns=cols)

        cur_key, buf = None, []
        for row in ordered.toLocalIterator():
            k = tuple(row[c] for c in self.group_cols)
            if cur_key is not None and k != cur_key:
                yield _emit(cur_key, buf)
                buf = []
            cur_key = k
            buf.append(tuple(row))
        if cur_key is not None:
            yield _emit(cur_key, buf)


def groupby_interval_join(
    left: DataFrame,
    right: DataFrame,
    groups,
    on="span",
    renamecols=None,
    renameon=("_left", "_right"),
    makeunique: bool = False,
    bounds: str = "[)",
    validate: str = "error",
    strategy: str = "auto",
    bin_width: Optional[int] = None,
) -> GroupedIntervalJoin:
    """Group the (lazy) interval join by a mix of left/right columns.

    ``groups`` uses the selector language of
    :mod:`..functions.selectors` and is resolved against each side's
    ORIGINAL (pre-rename) column names, exactly like the reference
    (find_valid called at src:265-266 before renaming at src:280);
    resolved names are then mapped through the rename protocol so
    non-identity ``renamecols`` still work.
    """
    left_on_in, right_on_in = _resolve_on(on)
    right_groups = find_valid(right_on_in, right.columns, groups)
    left_groups = find_valid(left_on_in, left.columns, groups)

    right_cols = [x for x in right_groups if isinstance(x, str)]
    right_invalid = {x for x in right_groups if isinstance(x, Invalid)}
    left_cols = [x for x in left_groups if isinstance(x, str)]
    left_invalid = {x for x in left_groups if isinstance(x, Invalid)}
    invalid = sorted(right_invalid & left_invalid, key=lambda x: x.name)
    if invalid:
        names = [x.name for x in invalid]
        joined = (
            names[0]
            if len(names) == 1
            else ", ".join(names[:-1]) + " and " + names[-1]
        )
        raise ValueError(f"Columns do not exist: {joined}")

    joined = interval_join(
        left,
        right,
        on=on,
        renamecols=renamecols,
        renameon=renameon,
        makeunique=makeunique,
        bounds=bounds,
        validate=validate,
        strategy=strategy,
        bin_width=bin_width,
    )

    # map resolved (pre-rename) names to their final joined names
    ren_l, ren_r = _as_pair(renamecols)
    final_left = [_apply_rename(c, ren_l) for c in left_cols]
    final_right = [_apply_rename(c, ren_r) for c in right_cols]
    return GroupedIntervalJoin(joined, final_right, final_left)
