"""Equal-width window generation.

Parity target: ``quantile_windows`` / ``dfspan``
(/root/reference/src/DataFrameIntervals.jl:348-387).  Despite the name
these are equal-TIME-width contiguous closed-open windows tiling a span,
labeled 1..n (or a user iterable) — not data quantiles.

Reference quirks reproduced deliberately (SURVEY.md §2.A):
- ``min_duration`` is accepted and IGNORED (the reference computes it at
  src:368-372 but never uses it — dead parameter in v0.2.0);
- default label column name is ``index`` (implementation default at
  src:363 wins over the docstring's ``count``);
- empty dataframe input → ``missing`` (src:364, 380-382) → ``None`` here.

Boundary arithmetic: the reference builds a float-ns linspace and rounds
each boundary DOWN (src:341-346).  We use exact integer floor
``lo + (i*(hi-lo)) // n`` decomposed as ``i*q + (i*r)//n`` so no value
ever exceeds int64 — float64 cannot even represent modern epoch-ns
timestamps, so float math would drift boundaries by ~hundreds of ns.
The DuckDB oracle uses the same integer formula.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.spans import make_span

Span = Tuple[int, int]


def dfspan(df: DataFrame, spancol: str = "span") -> Optional[Span]:
    """Covering span ``[min(start), max(stop))`` of an interval column.

    Parity: ``dfspan`` = ``superset(IntervalSet(...))``
    (/root/reference/src/DataFrameIntervals.jl:380-387); ``None`` on
    empty input.  One tiny agg action (min/max are partial-aggregated
    map-side, so this scales to any row count).
    """
    row = df.agg(
        F.min(F.col(spancol).getField("start")).alias("lo"),
        F.max(F.col(spancol).getField("stop")).alias("hi"),
    ).first()
    if row is None or row["lo"] is None or row["hi"] is None:
        return None
    return int(row["lo"]), int(row["hi"])


def quantile_windows(
    spark: SparkSession,
    n: int,
    span: Union[DataFrame, Span, None],
    spancol: str = "span",
    label: Union[str, Tuple[str, Iterable]] = "index",
    min_duration=None,  # accepted-and-ignored: reference parity (src:368-372)
) -> Optional[DataFrame]:
    """n equal-width closed-open windows tiling ``span``.

    ``span`` may be a ``(lo, hi)`` pair of epoch-ns ints or a DataFrame
    (covering span derived via :func:`dfspan`).  ``label`` is a column
    name (values ``1..n``) or a ``(name, iterable-of-n-values)`` pair
    (reference ``label_helper``/``value_helper`` src:331-334).

    Output: ``spancol`` struct column + label column; n rows.  Built
    from ``spark.range(n)`` with pure integer expressions — the windows
    table is tiny and is the natural broadcast side of interval joins.
    """
    if isinstance(span, DataFrame):
        span = dfspan(span, spancol)
    if span is None:
        return None
    lo, hi = int(span[0]), int(span[1])

    width = hi - lo
    # lo + (i*width)//n  ==  lo + i*q + (i*r)//n  with width = q*n + r;
    # i <= n and r < n keep every intermediate far below 2^63.
    q, r = divmod(width, n)

    def boundary(i):
        # (i*r)//n computed in long arithmetic, cast BEFORE the big-add:
        # mixing a double into the sum would round the ~1e18 base.
        ir = i.cast("long") * F.lit(r)
        frac = ((ir - F.pmod(ir, F.lit(n))) / F.lit(n)).cast("long")
        return F.lit(lo) + i.cast("long") * F.lit(q) + frac

    idx = F.col("id")
    win = spark.range(n).select(
        make_span(boundary(idx), boundary(idx + F.lit(1))).alias(spancol),
        (idx + 1).cast("long").alias("__dfi_i"),
    )

    if isinstance(label, tuple):
        label_name, values = label
        vals = list(values)
        if len(vals) != n:
            raise ValueError(f"label values must have length {n}, got {len(vals)}")
        arr = F.array(*[F.lit(v) for v in vals])
        win = win.select(spancol, arr[F.col("__dfi_i") - 1].alias(label_name))
    else:
        win = win.select(spancol, F.col("__dfi_i").alias(label))
    return win
