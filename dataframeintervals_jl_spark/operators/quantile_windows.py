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

import datetime as _dt
from typing import Iterable, Optional, Tuple, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import driver_row, driver_rows
from ..functions.spans import (
    make_span,
    span_endpoint_domain,
    span_from_ordinal,
    span_to_ordinal,
)

Span = Tuple[int, int]

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)


def _ordinal_to_py(v: int, domain: str):
    if domain == "date":
        return _EPOCH_DATE + _dt.timedelta(days=v)
    return _EPOCH_DT + _dt.timedelta(microseconds=v)


def _py_to_ordinal(v) -> Tuple[int, Optional[str]]:
    from ..functions.spans import py_endpoint_to_ordinal

    return py_endpoint_to_ordinal(v)


def _ordinal_bounds(
    df: DataFrame, spancol: str, domain: Optional[str]
) -> Optional[Span]:
    c = (
        F.col(spancol)
        if domain is None
        else span_to_ordinal(F.col(spancol), domain)
    )
    row = driver_row(
        df.agg(
            F.min(c.getField("start")).alias("lo"),
            F.max(c.getField("stop")).alias("hi"),
        )
    )
    if row is None or row["lo"] is None or row["hi"] is None:
        return None
    return int(row["lo"]), int(row["hi"])


def dfspan(df: DataFrame, spancol: str = "span"):
    """Covering span ``[min(start), max(stop))`` of an interval column.

    Parity: ``dfspan`` = ``superset(IntervalSet(...))``
    (/root/reference/src/DataFrameIntervals.jl:380-387); ``None`` on
    empty input.  One tiny agg action (min/max are partial-aggregated
    map-side, so this scales to any row count).  Generic over endpoint
    domains like the reference (src:31-46): date / timestamp /
    timestamp_ntz span columns return ``(date, date)`` /
    ``(datetime, datetime)`` endpoints.
    """
    from ..functions.spans import normalize_span_field_order

    df = normalize_span_field_order(df, spancol)
    domain = span_endpoint_domain(df.schema[spancol].dataType)
    b = _ordinal_bounds(df, spancol, domain)
    if b is None:
        return None
    if domain is None:
        return b
    return _ordinal_to_py(b[0], domain), _ordinal_to_py(b[1], domain)


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

    Generic over endpoint domains (reference src:31-46): a DataFrame
    with date/timestamp spans — or a ``(date, date)`` /
    ``(datetime, datetime)`` pair — yields windows in that domain
    (boundaries computed on exact integer ordinals, restored on
    output), ready to join against same-domain span tables.
    """
    domain = None
    if isinstance(span, DataFrame):
        from ..functions.spans import normalize_span_field_order

        span = normalize_span_field_order(span, spancol)
        domain = span_endpoint_domain(span.schema[spancol].dataType)
        span = _ordinal_bounds(span, spancol, domain)
    elif span is not None:
        lo_v, dom_lo = _py_to_ordinal(span[0])
        hi_v, dom_hi = _py_to_ordinal(span[1])
        if dom_lo != dom_hi:
            raise ValueError(
                f"span endpoints must share a domain, got {span!r}"
            )
        domain, span = dom_lo, (lo_v, hi_v)
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

    span_out = (
        F.col(spancol)
        if domain is None
        else span_from_ordinal(F.col(spancol), domain).alias(spancol)
    )
    if isinstance(label, tuple):
        label_name, values = label
        vals = list(values)
        if len(vals) != n:
            raise ValueError(f"label values must have length {n}, got {len(vals)}")
        arr = F.array(*[F.lit(v) for v in vals])
        win = win.select(span_out, arr[F.col("__dfi_i") - 1].alias(label_name))
    else:
        win = win.select(span_out, F.col("__dfi_i").alias(label))
    return win


# ---------------------------------------------------------------------------
# data-quantile (equal-count) windows
# ---------------------------------------------------------------------------


def exact_quantile_longs(
    df: DataFrame,
    col: str,
    ranks: "list[int]",
    lo: int,
    hi: int,
    total: int,
    buckets: int = 4096,
    max_passes: int = 16,
) -> "list[int]":
    """Exact order statistics of a bigint column at the given 1-indexed
    ``ranks``, by iterative histogram refinement.

    Scale design (the reason this exists instead of a sort): a total
    sort of the column is a full-data range-shuffle — at 100 TB that is
    the bottleneck stage.  Here each pass is ONE column-pruned scan
    whose aggregate output is at most ``len(ranks) * buckets`` rows
    (collected to the driver), and the candidate range for every rank
    shrinks by ~``buckets``x per pass, so epoch-ns domains resolve in
    4-6 scans with zero large shuffles.  The classic distributed
    selection recipe (Munro-Paterson lineage); deterministic, hence
    oracle-able, unlike ``approxQuantile``.

    Invariant per unresolved rank r: ``base < r <= base + |values in
    [lo, hi]|`` and the r-th smallest value lies in ``[lo, hi]``.
    """
    out: dict[int, int] = {}
    # state per distinct rank: (lo, hi, base = count of values < lo)
    state: dict[int, tuple[int, int, int]] = {}
    for r in ranks:
        if not (1 <= r <= total):
            raise ValueError(f"rank {r} out of range 1..{total}")
        state[r] = (lo, hi, 0)

    for _ in range(max_passes):
        pending = {r: s for r, s in state.items() if r not in out}
        for r, (rlo, rhi, _b) in list(pending.items()):
            if rlo == rhi:
                out[r] = rlo
                del pending[r]
        if not pending:
            return [out[r] for r in ranks]

        # distinct ranges → shared histograms (pass 1: all ranks share
        # the full [lo, hi] range → exactly one histogram, one scan)
        ranges: list[tuple[int, int]] = sorted({(s[0], s[1]) for s in pending.values()})
        rid_of = {rg: i for i, rg in enumerate(ranges)}
        widths = [rhi - rlo + 1 for rlo, rhi in ranges]
        bws = [-(-w // buckets) for w in widths]  # ceil

        # `div` (not `/`): pass-1 offsets reach ~1e16-1e18, beyond
        # float64's exact-integer range — double division would
        # misassign values near bucket edges.
        entries = [
            F.expr(
                f"CASE WHEN __dfi_v BETWEEN {rlo} AND {rhi} THEN "
                f"named_struct('rid', {i}, 'bkt', (__dfi_v - {rlo}) div {bws[i]}) END"
            )
            for i, (rlo, rhi) in enumerate(ranges)
        ]
        hist = (
            df.select(F.col(col).cast("long").alias("__dfi_v"))
            .select(
                F.explode(
                    F.filter(F.array(*entries), lambda x: x.isNotNull())
                ).alias("e")
            )
            .groupBy(F.col("e.rid").alias("rid"), F.col("e.bkt").alias("bkt"))
            .count()
        )
        hist = driver_rows(hist)
        counts: dict[tuple[int, int], int] = {
            (row["rid"], row["bkt"]): row["count"] for row in hist
        }

        for r, (rlo, rhi, base) in pending.items():
            rid = rid_of[(rlo, rhi)]
            bw = bws[rid]
            cum = base
            nb = -(-(rhi - rlo + 1) // bw)
            for b in range(nb):
                c = counts.get((rid, b), 0)
                if cum + c >= r:
                    nlo = rlo + b * bw
                    nhi = min(rhi, nlo + bw - 1)
                    if bw == 1 or nlo == nhi:
                        out[r] = nlo
                    else:
                        state[r] = (nlo, nhi, cum)
                    break
                cum += c
            else:  # pragma: no cover — violates the rank invariant
                raise RuntimeError(f"rank {r} not found in [{rlo}, {rhi}]")

    raise RuntimeError(f"quantile refinement did not converge in {max_passes} passes")


def data_quantile_windows(
    df: DataFrame,
    n: int,
    col: str,
    spancol: str = "span",
    label: str = "index",
    buckets: int = 4096,
) -> Optional[DataFrame]:
    """n closed-open windows over the VALUES of a bigint column with
    ~equal row counts (true data quantiles — the operator the name
    ``quantile_windows`` suggests; the reference's version is
    equal-time-width only, src/DataFrameIntervals.jl:348-387, so this
    is an extension).

    Boundary k (k = 0..n) is the exact order statistic at 1-indexed
    rank ``1 + (k*(N-1))//n`` (k=0 → min, k=n → max).  Window k
    (1..n) is ``[B_{k-1}, B_k)``; the last window is
    ``[B_{n-1}, B_n + 1)`` so the maximum is covered.  Ties that
    straddle a boundary make counts approximately (not exactly) equal —
    assignment is by value, deterministic on both engines.

    Cost: one min/max/count agg + :func:`exact_quantile_longs` (a few
    pruned scans, no sort shuffle).  Returns ``None`` on empty input,
    matching :func:`quantile_windows`.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    agg = driver_row(
        df.agg(
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
            F.count(col).alias("cnt"),
        )
    )
    if agg is None or agg["cnt"] == 0:
        return None
    lo, hi, total = int(agg["lo"]), int(agg["hi"]), int(agg["cnt"])

    inner = sorted({1 + (k * (total - 1)) // n for k in range(1, n)} - {1, total})
    resolved = dict(zip(inner, exact_quantile_longs(df, col, inner, lo, hi, total, buckets)))
    resolved[1] = lo
    resolved[total] = hi
    bounds = [resolved[1 + (k * (total - 1)) // n] for k in range(n + 1)]

    spark = df.sparkSession
    rows = [
        (k + 1, bounds[k], bounds[k + 1] + (1 if k == n - 1 else 0))
        for k in range(n)
    ]
    win = spark.createDataFrame(rows, f"{label} long, __s long, __e long")
    return win.select(
        make_span(F.col("__s"), F.col("__e")).alias(spancol), F.col(label)
    )


def split_spans(
    df: DataFrame,
    n: int,
    spancol: str = "span",
    index_col: str = "sub_index",
) -> DataFrame:
    """Split EVERY row's span into ``n`` equal closed-open sub-spans —
    the per-row form of :func:`quantile_windows` (epoching, the
    reference's home-domain step: cut each recording into n equal
    epochs).  Output: the input columns with ``spancol`` replaced by
    the sub-span, plus ``index_col`` (1..n).

    Boundary math is the same exact int64 decomposition as
    :func:`quantile_windows` (``b_i = s + i*q + (i*r) DIV n`` with
    ``q, r = divmod(stop-start, n)``) evaluated per row in pure column
    expressions — map-only explode, no shuffle, no Python; sub-spans
    tile the parent exactly (``b_0 = start``, ``b_n = stop``).  Spans
    narrower than ``n`` units produce empty sub-spans (``b_i ==
    b_{i+1}``) rather than losing coverage.  Generic over endpoint
    domains via the usual ordinal adapters.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    domain = span_endpoint_domain(df.schema[spancol].dataType)
    if domain is not None:
        conv = df.withColumn(
            spancol, span_to_ordinal(F.col(spancol), domain)
        )
        out = split_spans(conv, n, spancol, index_col)
        return out.withColumn(
            spancol, span_from_ordinal(F.col(spancol), domain)
        )
    s = F.col(spancol).getField("start").cast("long")
    q = F.expr(f"({spancol}.stop - {spancol}.start) DIV {n}")
    # (i*r) DIV n per row; i < n and r < n keep i*r < n² — tiny
    r_expr = f"pmod({spancol}.stop - {spancol}.start, {n})"

    def boundary(i_sql: str, i_col):
        return s + i_col.cast("long") * q + F.expr(
            f"(({i_sql}) * {r_expr}) DIV {n}"
        )

    i = F.col("__dfi_si")
    lo = boundary("__dfi_si", i)
    hi = boundary("__dfi_si + 1", i + 1)
    other = [c for c in df.columns if c != spancol]
    return (
        df.withColumn(
            "__dfi_si", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
        )
        .select(
            *other,
            make_span(lo, hi).alias(spancol),
            (F.col("__dfi_si") + 1).cast("long").alias(index_col),
        )
    )
