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

#: Double-endpoint span variant — the reference joins intervals over any
#: ordered T (src/DataFrameIntervals.jl:31-46); this covers float
#: domains (depth ranges, scores, unit-scaled time) without fake-scaling
#: into int64.
SPAN_TYPE_DOUBLE = T.StructType(
    [
        T.StructField("start", T.DoubleType(), True),
        T.StructField("stop", T.DoubleType(), True),
    ]
)

SPAN_DDL_DOUBLE = "struct<start: double, stop: double>"

#: Endpoint types a span struct may carry (both fields must match).
_ENDPOINT_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.StringType,
)


def validate_span_type(dtype: T.DataType, where: str = "span") -> T.DataType:
    """Check that ``dtype`` is a well-formed span struct and return its
    endpoint type.

    Accepts ``struct<start: E, stop: E>`` for any numeric endpoint
    ``E`` (the comparison/greatest/least expressions are type-generic)
    and — reference parity with ``Interval{T}`` over ANY ordered ``T``
    (/root/reference/src/DataFrameIntervals.jl:31-46) — STRING
    endpoints, which are ordered but not arithmetic: overlap,
    intersection, and the broadcast join strategies apply, while the
    binned rewrite (needs endpoint arithmetic) rejects them with a
    typed error.  Anything else raises with a clear message instead of
    failing deep in ANSI execution."""
    ok = (
        isinstance(dtype, T.StructType)
        and [f.name for f in dtype.fields] == ["start", "stop"]
        and isinstance(dtype.fields[0].dataType, _ENDPOINT_TYPES)
        and type(dtype.fields[0].dataType) is type(dtype.fields[1].dataType)
    )
    if not ok:
        raise ValueError(
            f"`{where}` must be a span struct<start: E, stop: E> with both "
            f"endpoints of one numeric (e.g. {SPAN_DDL} or "
            f"{SPAN_DDL_DOUBLE}) or string type; got {dtype.simpleString()}"
        )
    return dtype.fields[0].dataType


def normalize_span_field_order(df, spancol: str):
    """Accept a span struct whose fields arrive as ``(stop, start)``
    and rewrite it to the canonical ``(start, stop)`` order —
    reference parity: NamedTuple intervals are accepted in BOTH field
    orders (/root/reference/src/DataFrameIntervals.jl:38), e.g. a
    parquet table written with ``struct<stop, start>``.  Field access
    is BY NAME, so the rewrite is a pure null-preserving projection;
    everything downstream (and the output) is canonical order.  A
    no-op for canonical spans and for anything that is not a
    reversed-order struct (``validate_span_type`` rejects those with
    its own message downstream)."""
    if spancol not in df.columns:
        return df
    dt = df.schema[spancol].dataType
    if not (
        isinstance(dt, T.StructType)
        and [f.name for f in dt.fields] == ["stop", "start"]
    ):
        return df
    s = F.col(spancol)
    out = F.struct(
        s.getField("start").alias("start"),
        s.getField("stop").alias("stop"),
    )
    return df.withColumn(spancol, F.when(s.isNotNull(), out))


def span_endpoints_orderable_only(dtype: T.DataType) -> bool:
    """True when the span's endpoints are ordered but NOT arithmetic
    (strings): comparisons, greatest/least, and broadcast joins work;
    bin math, durations, and quantile boundaries do not."""
    return isinstance(validate_span_type(dtype), T.StringType)


def span_endpoints_integral(dtype: T.DataType) -> bool:
    """True when the span's endpoints are an integral type (exact long
    arithmetic applies; doubles use IEEE floor arithmetic instead)."""
    ep = validate_span_type(dtype)
    return isinstance(
        ep, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ) or (isinstance(ep, T.DecimalType) and ep.scale == 0)

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


def make_span_double(start, stop) -> Column:
    """Build a double-endpoint span struct (generic-``T`` parity with the
    reference's arbitrary ordered interval types, src:31-46)."""
    return F.struct(
        _c(start).cast("double").alias("start"),
        _c(stop).cast("double").alias("stop"),
    )


def make_span_string(start, stop) -> Column:
    """Build a STRING-endpoint span struct — the reference's arbitrary
    ordered ``T`` (src:31-46) for dictionary-ordered domains (name
    ranges, version prefixes, key ranges).  Ordering is Spark's binary
    (codepoint) string comparison; see
    :func:`span_endpoints_orderable_only` for what such spans support."""
    return F.struct(
        _c(start).cast("string").alias("start"),
        _c(stop).cast("string").alias("stop"),
    )


#: Ordered non-numeric endpoint domains accepted via one-time cast
#: adapters (reference parity: the reference is generic over ANY
#: ordered endpoint type T, /root/reference/src/DataFrameIntervals.jl:31-46).
#: Each maps to an exact integer ordinal — days since epoch for dates,
#: epoch-µs for timestamps — so every integral-path optimization
#: (binned rewrite, exact bin math, pushdown) applies unchanged.
_DOMAIN_ORDINALS = {
    "date": T.DateType,
    "timestamp": T.TimestampType,
    "timestamp_ntz": T.TimestampNTZType,
}


def span_endpoint_domain(dtype: T.DataType):
    """``'date'`` / ``'timestamp'`` / ``'timestamp_ntz'`` when ``dtype``
    is a span struct over that ordered endpoint type, else ``None``
    (numeric spans — the canonical path — or anything invalid, which
    ``validate_span_type`` rejects downstream with its own message)."""
    if not (
        isinstance(dtype, T.StructType)
        and [f.name for f in dtype.fields] == ["start", "stop"]
        and type(dtype.fields[0].dataType) is type(dtype.fields[1].dataType)
    ):
        return None
    for name, tp in _DOMAIN_ORDINALS.items():
        if isinstance(dtype.fields[0].dataType, tp):
            return name
    return None


def endpoint_to_ordinal(col, domain: str) -> Column:
    """Scalar endpoint → exact integer ordinal: days since epoch for
    ``'date'``, epoch-µs for ``'timestamp'``/``'timestamp_ntz'`` (the
    NTZ cast relies on the UTC-pinned session, session.py — same
    contract as :func:`span_from_timestamps`).  The single source of
    truth for the mapping; the struct adapters and every operator-level
    conversion route through here."""
    c = _c(col)
    if domain == "date":
        return F.unix_date(c).cast("long")
    return F.unix_micros(c.cast("timestamp"))


def ordinal_to_endpoint(col, domain: str) -> Column:
    """Inverse of :func:`endpoint_to_ordinal`."""
    c = _c(col)
    if domain == "date":
        # day ordinals fit int; the source may carry them as long
        return F.date_from_unix_date(c.cast("int"))
    ts = F.timestamp_micros(c.cast("long"))
    return ts.cast("timestamp_ntz") if domain == "timestamp_ntz" else ts


def span_to_ordinal(span, domain: str) -> Column:
    """Cast a date/timestamp-endpoint span struct to its exact integer
    ordinal span (days-since-epoch / epoch-µs)."""
    s = _c(span)
    out = F.struct(
        endpoint_to_ordinal(s.getField("start"), domain).alias("start"),
        endpoint_to_ordinal(s.getField("stop"), domain).alias("stop"),
    )
    return F.when(s.isNotNull(), out)


def span_from_ordinal(span, domain: str) -> Column:
    """Inverse of :func:`span_to_ordinal` — restore the user's endpoint
    domain on an integer-ordinal span (null-preserving, so outer-join
    rows keep their null spans)."""
    s = _c(span)
    out = F.struct(
        ordinal_to_endpoint(s.getField("start"), domain).alias("start"),
        ordinal_to_endpoint(s.getField("stop"), domain).alias("stop"),
    )
    return F.when(s.isNotNull(), out)


def py_endpoint_to_ordinal(v):
    """(ordinal, domain) for a python endpoint value: date → days since
    epoch, datetime → epoch-µs (naive = UTC wall clock; tz-AWARE values
    are converted to UTC first — the engine pins everything to UTC),
    int → itself (no domain).  The python-scalar twin of
    :func:`endpoint_to_ordinal` for lo/hi arguments."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        delta = v - _dt.datetime(1970, 1, 1)
        return delta // _dt.timedelta(microseconds=1), "timestamp"
    if isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days, "date"
    return int(v), None


def span_from_timestamps(start_ts, stop_ts) -> Column:
    """Build a span from two (microsecond-precision) timestamp columns.

    Spark ``TimestampType``/``TimestampNTZType`` carry microseconds; we
    widen to nanoseconds so all spans share one unit.  The cast to
    TIMESTAMP before ``unix_micros`` is load-bearing: ``unix_micros``
    rejects TIMESTAMP_NTZ outright (the type parquet scans actually
    deliver), and with the session timezone pinned to UTC
    (session.py) the cast is a pure reinterpretation.
    """
    return make_span(
        F.unix_micros(_c(start_ts).cast("timestamp")) * NS_PER_US,
        F.unix_micros(_c(stop_ts).cast("timestamp")) * NS_PER_US,
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


#: the four supported bounds flavors (reference Interval{T,L,R},
#: src:31-35); a join may apply one uniformly or a (left, right) pair
BOUNDS = ("[)", "(]", "[]", "()")


def normalize_bounds(bounds) -> tuple:
    """Canonicalize a ``bounds`` argument into a ``(left, right)`` pair.

    Accepts a single flavor string (applied to both sides — the common
    case) or a 2-sequence assigning each side its own flavor, mirroring
    the reference's per-interval-type bound parameters
    (/root/reference/src/DataFrameIntervals.jl:31-46): a join there may
    mix e.g. a closed-closed left column with a closed-open right one.

    Per-ROW flavors (full ``Interval{T,L,R}`` element parity, reference
    src:31-35): an element of the pair may instead be a pyspark
    ``Column`` holding flavor strings — each row then carries its own
    bounds.  Columns pass through unvalidated here (values are checked
    row-side: an invalid flavor yields null closedness flags, which
    match nothing; :func:`~..operators.interval_join.interval_join`
    additionally raises under ``validate='error'``).
    """
    if isinstance(bounds, Column):
        return bounds, bounds
    if isinstance(bounds, str):
        if bounds not in BOUNDS:
            raise ValueError(
                f"unsupported bounds {bounds!r}; use '[)', '(]', '[]' or '()'"
            )
        return bounds, bounds
    try:
        lb, rb = bounds
    except (TypeError, ValueError):
        raise ValueError(
            f"unsupported bounds {bounds!r}; use '[)', '(]', '[]' or '()' "
            "or a (left, right) pair of them"
        ) from None
    for b in (lb, rb):
        if not isinstance(b, Column) and b not in BOUNDS:
            raise ValueError(
                f"unsupported bounds {bounds!r}; use '[)', '(]', '[]' or "
                "'()', a (left, right) pair of them, or a per-row flavor "
                "Column on either side"
            )
    return lb, rb


def _bound_flags(flavor: str) -> tuple:
    """(lower_closed, upper_closed) for one flavor string."""
    return flavor[0] == "[", flavor[1] == "]"


def flavor_flags(spec) -> tuple:
    """(lower_closed, upper_closed) as boolean COLUMNS for one side's
    bounds spec — ``lit`` flags for a flavor string, per-row flags for a
    flavor Column (invalid flavor values yield null flags, so they
    satisfy no overlap predicate)."""
    if isinstance(spec, str):
        lc, uc = _bound_flags(spec)
        return F.lit(lc), F.lit(uc)
    c = _c(spec)
    lo = F.when(F.substring(c, 1, 1) == "[", F.lit(True)).when(
        F.substring(c, 1, 1) == "(", F.lit(False)
    )
    up = F.when(F.substring(c, 2, 1) == "]", F.lit(True)).when(
        F.substring(c, 2, 1) == ")", F.lit(False)
    )
    return lo, up


def spans_overlap(l, r, bounds="[)") -> Column:
    """Overlap predicate: true iff the two spans are NOT disjoint.

    The reference joins on ``!isdisjoint(x, y)``
    (/root/reference/src/DataFrameIntervals.jl:104-105).  Under interval
    (continuous-domain) semantics the intersection of two same-bounds
    intervals is an interval with the same bounds over
    ``(max(starts), min(stops))`` — nonempty iff ``lo < hi`` for any
    flavor with at least one open side ('[)', '(]', '()': touching
    endpoints do NOT overlap and zero-width spans are empty), and
    ``lo <= hi`` for closed-closed ('[]': touching endpoints DO match,
    zero-width [a,a] is the point a).

    ``bounds`` may also be a ``(left, right)`` pair of flavors — the
    reference's ``Interval{T,L,R}`` types mixed across the two sides
    (src:31-46).  The mixed predicate tracks which side supplies the
    intersection's lower/upper endpoint and whether that endpoint is
    closed: nonempty iff ``lo < hi``, or ``lo == hi`` with both the
    binding lower and upper bounds closed (which also rules out empty
    zero-width inputs of any open flavor, with no separate emptiness
    term).
    """
    lb, rb = normalize_bounds(bounds)
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
    if isinstance(lb, str) and lb == rb:
        if lb in ("[)", "(]", "()"):
            return not_null & (lo < hi)
        return not_null & (lo <= hi)
    # general branch: per-side flavor strings AND/OR per-row flavor
    # Columns share one expression — closedness becomes a (possibly
    # per-row) boolean flag instead of a Python literal
    l_lc, l_uc = flavor_flags(lb)
    r_lc, r_uc = flavor_flags(rb)
    ls, rs = lc.getField("start"), rc.getField("start")
    le, re_ = lc.getField("stop"), rc.getField("stop")
    lo_closed = (
        F.when(ls > rs, l_lc).when(ls < rs, r_lc).otherwise(l_lc & r_lc)
    )
    hi_closed = (
        F.when(le < re_, l_uc).when(le > re_, r_uc).otherwise(l_uc & r_uc)
    )
    return not_null & (
        ((lo < hi) & l_lc.isNotNull() & l_uc.isNotNull()
         & r_lc.isNotNull() & r_uc.isNotNull())
        | ((lo == hi) & lo_closed & hi_closed)
    )


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
    # when-without-otherwise yields NULL *of the intersection's own
    # type*, so this stays correct for any endpoint type (long, double,
    # ...) without hard-casting to the bigint span type
    return F.when(~(lc.isNull() | rc.isNull()), inter)


def span_contains(span, point) -> Column:
    """True iff ``point`` (bigint ns) lies inside the half-open span."""
    s = _c(span)
    p = _c(point)
    return (s.getField("start") <= p) & (p < s.getField("stop"))


#: the 13 Allen interval-algebra relations, classified by endpoint
#: comparisons alone.  Classification treats spans as closed intervals
#: of their endpoint pair (the relation between [s, o) half-open spans
#: with o > s is identical) — two spans with as==bs and ao==bo are
#: 'equals', a.stop == b.start is 'meets', etc.
ALLEN_RELATIONS = (
    "precedes", "meets", "overlaps", "finished_by", "contains", "starts",
    "equals", "started_by", "during", "finishes", "overlapped_by",
    "met_by", "preceded_by",
)


def allen_relation(l, r) -> Column:
    """Allen's interval-algebra relation of span ``l`` w.r.t. ``r`` as a
    string column (one of :data:`ALLEN_RELATIONS`) — the exhaustive,
    mutually-exclusive classification of how two intervals relate
    (Allen 1983).  Null if either span is null.  Pure endpoint
    comparisons — codegen'd, no shuffle."""
    lc, rc = _c(l), _c(r)
    ls, lo = lc.getField("start"), lc.getField("stop")
    rs, ro = rc.getField("start"), rc.getField("stop")
    rel = (
        F.when(lo < rs, F.lit("precedes"))
        .when(lo == rs, F.lit("meets"))
        .when(ro < ls, F.lit("preceded_by"))
        .when(ro == ls, F.lit("met_by"))
        .when((ls == rs) & (lo == ro), F.lit("equals"))
        .when((ls == rs) & (lo < ro), F.lit("starts"))
        .when((ls == rs) & (lo > ro), F.lit("started_by"))
        .when((lo == ro) & (ls > rs), F.lit("finishes"))
        .when((lo == ro) & (ls < rs), F.lit("finished_by"))
        .when((ls > rs) & (lo < ro), F.lit("during"))
        .when((ls < rs) & (lo > ro), F.lit("contains"))
        .when((ls < rs) & (lo < ro), F.lit("overlaps"))
        .otherwise(F.lit("overlapped_by"))
    )
    return F.when(~(lc.isNull() | rc.isNull()), rel)


def span_iou(l, r) -> Column:
    """Intersection-over-union of two spans (double in [0, 1], rounded
    to 6 places): ``|l ∩ r| / (|l| + |r| - |l ∩ r|)``, null when either
    span is null or the union measure is zero.

    The intersection/union measures are exact bigint arithmetic; the
    single double division is one correctly-rounded IEEE op, so any SQL
    engine computing the same expression matches bit-for-bit.  Never
    scale ns durations into fixed point here — ``duration · 10⁶``
    overflows long for multi-day spans; aggregate IoUs with
    order-independent min/max/count, not float sums."""
    lc, rc = _c(l), _c(r)
    inter = F.greatest(
        F.least(lc.getField("stop"), rc.getField("stop"))
        - F.greatest(lc.getField("start"), rc.getField("start")),
        F.lit(0),
    )
    union = (
        (lc.getField("stop") - lc.getField("start"))
        + (rc.getField("stop") - rc.getField("start"))
        - inter
    )
    return F.when(
        ~(lc.isNull() | rc.isNull()) & (union > 0),
        F.round(inter.cast("double") / union.cast("double"), 6),
    )
