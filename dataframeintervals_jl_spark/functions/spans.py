"""Canonical interval ("span") type and pure-expression helpers.

The engine's canonical interval representation is a Spark struct column
``struct<start: bigint, stop: bigint>`` holding epoch **nanoseconds**,
half-open ``[start, stop)``.  This mirrors the reference's TimeSpan
semantics (``Interval{Nanosecond,Closed,Open}``,
/root/reference/src/DataFrameIntervals.jl:52) and subsumes its
NamedTuple ``(start, stop)`` closed-open representation
(/root/reference/src/DataFrameIntervals.jl:38-46).

Everything here is a pure Column expression — no Python UDFs — so
Catalyst folds, prunes and codegens these, and predicates push into
parquet scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The canonical Spark type for an interval column.
SPAN_TYPE = T.StructType(
    [
        T.StructField("start", T.LongType(), True),
        T.StructField("stop", T.LongType(), True),
    ]
)

#: SQL DDL string of the canonical span type.
SPAN_DDL = "struct<start: bigint, stop: bigint>"

NS_PER_US = 1_000
NS_PER_MS = 1_000_000
NS_PER_SECOND = 1_000_000_000


def _c(x) -> Column:
    """Coerce a column name / python int / Column into a Column."""
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


def exact_floor_div(a, divisor: int) -> Column:
    """Exact ``floor(a / divisor)`` on bigint columns.

    Plain ``/`` is double division in Spark; epoch-ns magnitudes
    (~1.7e18) exceed float64's 2^53 exact-integer range, so double math
    mis-rounds near boundaries.  ``a - pmod(a, d)`` is ``floor(a/d)*d``
    exactly in long arithmetic (pmod is nonnegative for positive d), and
    dividing that exact multiple via decimal is exact."""
    if divisor <= 0:
        raise ValueError(f"divisor must be positive, got {divisor}")
    al = _c(a).cast("long")
    fd = al - F.pmod(al, F.lit(int(divisor)))
    return (fd.cast("decimal(38,0)") / F.lit(int(divisor))).cast("long")


def make_span(start, stop) -> Column:
    """Build a canonical span struct from two bigint-ns endpoints.

    Mirrors the NamedTuple constructor semantics of the reference
    (closed-open ``[start, stop)``,
    /root/reference/src/DataFrameIntervals.jl:44).
    """
    return F.struct(
        _c(start).cast("long").alias("start"),
        _c(stop).cast("long").alias("stop"),
    )


def span_from_timestamps(start_ts, stop_ts) -> Column:
    """Build a span from two (microsecond-precision) timestamp columns.

    Spark ``TimestampType``/``TimestampNTZType`` carry microseconds; we
    widen to nanoseconds so all spans share one unit.
    """
    return make_span(
        F.unix_micros(_c(start_ts)) * NS_PER_US,
        F.unix_micros(_c(stop_ts)) * NS_PER_US,
    )


def span_start(span) -> Column:
    return _c(span).getField("start")


def span_stop(span) -> Column:
    return _c(span).getField("stop")


def span_duration(span) -> Column:
    """Width of the span in nanoseconds (``stop - start``).

    Parity with TimeSpans.duration used throughout the reference tests
    (/root/reference/test/runtests.jl:23-29,37).
    """
    s = _c(span)
    return s.getField("stop") - s.getField("start")


def spans_overlap(l, r, bounds: str = "[)") -> Column:
    """Overlap predicate: true iff the two spans are NOT disjoint.

    The reference joins on ``!isdisjoint(x, y)``
    (/root/reference/src/DataFrameIntervals.jl:104-105).  For the
    default closed-open bounds this is strict inequality both ways:
    touching windows ``[a,b)`` / ``[b,c)`` do NOT match and zero-width
    spans match nothing.  ``bounds='[]'`` gives closed-closed semantics
    (touching endpoints DO match), covering the reference's native
    ``Interval{T,Closed,Closed}`` inputs.
    """
    lc, rc = _c(l), _c(r)
    lo = F.greatest(lc.getField("start"), rc.getField("start"))
    hi = F.least(lc.getField("stop"), rc.getField("stop"))
    # "intersection non-empty" rather than the 2-term strict comparison:
    # the latter wrongly matches zero-width [a,a) spans lying inside the
    # other interval (the empty set is disjoint from everything).
    # greatest/least SKIP nulls, so a null span would otherwise match
    # everything — guard so null spans match nothing (SQL semantics; the
    # validate='error' path never reaches here with nulls anyway).
    not_null = lc.isNotNull() & rc.isNotNull()
    if bounds == "[)":
        return not_null & (lo < hi)
    if bounds == "[]":
        return not_null & (lo <= hi)
    raise ValueError(f"unsupported bounds {bounds!r}; use '[)' or '[]'")


def span_intersect(l, r) -> Column:
    """Pairwise intersection of two spans, null-propagating.

    Mirrors ``intersect_`` (/root/reference/src/DataFrameIntervals.jl:13-17):
    missing propagates.  Spark's ``greatest``/``least`` *skip* nulls, so
    we guard explicitly: if either input span is null the result is null
    (this is what makes outer-join rows carry a null intersection).
    """
    lc, rc = _c(l), _c(r)
    inter = F.struct(
        F.greatest(lc.getField("start"), rc.getField("start")).alias("start"),
        F.least(lc.getField("stop"), rc.getField("stop")).alias("stop"),
    )
    return F.when(lc.isNull() | rc.isNull(), F.lit(None).cast(SPAN_TYPE)).otherwise(
        inter
    )


def span_contains(span, point) -> Column:
    """True iff ``point`` (bigint ns) lies inside the half-open span."""
    s = _c(span)
    p = _c(point)
    return (s.getField("start") <= p) & (p < s.getField("stop"))
