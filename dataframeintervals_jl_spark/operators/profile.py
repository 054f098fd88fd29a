"""One-pass table profiling (the ANALYZE-TABLE / Deequ shape).

Before a 100 TB corpus is joined, deduped, or sampled, the pipeline
needs its shape: row count, per-column null counts, distinct-value
estimates, and numeric ranges.  ``profile_table`` computes all of it
in two scale-bounded passes — one composite aggregate (no shuffle of
data rows, one partial-agg row per task) and one KMV distinct-sketch
pass (shuffle bounded at O(tasks · columns · k) by the same
WindowGroupLimit pruning the KMV family relies on) — instead of the
per-column job loops profiling tools usually run.

Everything is deterministic (portable-hash KMV, bigint min/max/sum),
so the whole profile is oracle-replayable bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import driver_count, driver_row, driver_rows
from pyspark.sql.types import (
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from ..functions.spans import endpoint_to_ordinal
from .sampling import kmv_distinct

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
_ORDINAL = {
    DateType: "date",
    TimestampType: "timestamp",
    TimestampNTZType: "timestamp_ntz",
}
_FLOATY = (FloatType, DoubleType)


def profile_table(
    df: DataFrame,
    columns: Union[Sequence[str], None] = None,
    k: int = 256,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Profile ``columns`` (default: all) in two passes: one row per
    column — per GROUP when ``by`` is given (the partitioned-corpus
    profile: per source / per language / per day, same two bounded
    passes, group keys prepended to the output) — with ``(col_name,
    n_rows, n_nulls, n_distinct_est, min_v, max_v, sum_v)``.

    - ``n_rows`` / ``n_nulls``: exact, from ONE composite aggregate —
      every column's null count is a partial-agg expression in the
      same job, so the data is scanned once with no shuffle.
    - ``n_distinct_est``: the deterministic KMV sketch
      (:func:`~.sampling.kmv_distinct`) over the STRING-cast values
      (faithful for integral columns; profiling semantics for the
      rest), exact below ``k`` distinct.  All columns share one
      explode + sketch job.
    - ``min_v`` / ``max_v``: exact bigints for integral columns AND
      (round 7) for date/timestamp/timestamp_ntz columns via the span
      family's ordinal adapters — days-since-epoch for dates, epoch-µs
      for timestamps (:func:`~..functions.spans.endpoint_to_ordinal`,
      the same exact mapping every interval operator uses).  Null for
      other types and columns with no non-null values.
    - ``sum_v``: exact decimal(38,0) — a BIGINT accumulator overflows
      immediately on wide-domain columns (an epoch-µs column at
      ~1.7e15 overflows int64 within ten thousand rows), so the sum
      runs in Spark's 38-digit decimal domain end-to-end (ordinal
      domain for date/timestamp columns).
    - ``min_d`` / ``max_d``: exact doubles for float/double columns —
      a min/max picks an actual stored element (no accumulation, so
      it is bit-reproducible cross-engine, unlike a float SUM, which
      is order-dependent and deliberately not offered).
    - ``len_min`` / ``len_max`` / ``len_sum``: exact character-length
      stats for string columns (same composite aggregate; a length sum
      is bounded by total corpus characters, bigint-safe), null
      elsewhere — the text-curation numbers (truncation, empty-field,
      bytes-per-row) a document table profile exists for.

    Scale shape (100 TB): pass 1 reduces to a single row map-side;
    pass 2 explodes each row into ``|columns|`` (column, value) pairs
    but the per-column bottom-k prunes every task to ``k`` hashes per
    column before the shuffle, so shuffle volume is independent of
    row count.  The final join glues |columns| rows to |columns| rows.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    for kc in keys:
        if kc not in df.columns:
            raise ValueError(f"unknown `by` column: {kc!r}")
    cols = (
        list(columns)
        if columns is not None
        else [c for c in df.columns if c not in keys]
    )
    missing = [c for c in cols if c not in df.columns]
    overlap = [c for c in cols if c in keys]
    if not cols or missing or overlap:
        raise ValueError(
            f"unknown/empty/key-overlapping columns: "
            f"{missing or overlap or cols}"
        )
    integral = {
        f.name for f in df.schema.fields if isinstance(f.dataType, _INTEGRAL)
    }
    stringy = {
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    }
    ordinal = {
        f.name: _ORDINAL[type(f.dataType)]
        for f in df.schema.fields
        if type(f.dataType) in _ORDINAL
    }
    floaty = {
        f.name for f in df.schema.fields if isinstance(f.dataType, _FLOATY)
    }

    def _ord_or_raw(c):
        if c in ordinal:
            return endpoint_to_ordinal(F.col(c), ordinal[c])
        return F.col(c)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{i}"))
        if c in integral or c in ordinal:
            v = _ord_or_raw(c)
            aggs.append(F.min(v).cast("long").alias(f"__mn_{i}"))
            aggs.append(F.max(v).cast("long").alias(f"__mx_{i}"))
            aggs.append(
                F.sum(v.cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .alias(f"__sm_{i}")
            )
        elif c in floaty:
            aggs.append(
                F.min(F.col(c)).cast("double").alias(f"__dmn_{i}")
            )
            aggs.append(
                F.max(F.col(c)).cast("double").alias(f"__dmx_{i}")
            )
        elif c in stringy:
            ln = F.length(F.col(c))
            aggs.append(F.min(ln).cast("long").alias(f"__lmn_{i}"))
            aggs.append(F.max(ln).cast("long").alias(f"__lmx_{i}"))
            aggs.append(F.sum(ln.cast("long")).alias(f"__lsm_{i}"))
    stats = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)

    null_long = F.lit(None).cast("long")
    null_dec = F.lit(None).cast("decimal(38,0)")
    null_dbl = F.lit(None).cast("double")
    exact = integral | set(ordinal)
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            # sum over an EMPTY table is NULL; a zero-row table has
            # zero nulls, so pin it (matches the oracle's count(*)-count(v))
            F.coalesce(F.col(f"__nn_{i}"), F.lit(0).cast("long")).alias(
                "n_nulls"
            ),
            (F.col(f"__mn_{i}") if c in exact else null_long).alias("min_v"),
            (F.col(f"__mx_{i}") if c in exact else null_long).alias("max_v"),
            (F.col(f"__sm_{i}") if c in exact else null_dec).alias("sum_v"),
            (F.col(f"__dmn_{i}") if c in floaty else null_dbl).alias("min_d"),
            (F.col(f"__dmx_{i}") if c in floaty else null_dbl).alias("max_d"),
            (F.col(f"__lmn_{i}") if c in stringy else null_long).alias("len_min"),
            (F.col(f"__lmx_{i}") if c in stringy else null_long).alias("len_max"),
            (F.col(f"__lsm_{i}") if c in stringy else null_long).alias("len_sum"),
        )
        for i, c in enumerate(cols)
    ]
    long = stats.select(
        *keys,
        F.col("__n").alias("n_rows"),
        F.explode(F.array(*entries)).alias("e"),
    ).select(
        *keys,
        "e.col_name", "n_rows", "e.n_nulls", "e.min_v", "e.max_v", "e.sum_v",
        "e.min_d", "e.max_d", "e.len_min", "e.len_max", "e.len_sum",
    )

    def _kmv_repr(c):
        # canonical string for the distinct-sketch hash: engines do NOT
        # agree on timestamp/double formatting, so hash the exact
        # integer ordinal for date/timestamp columns and a floor-
        # quantized micro-unit bigint for float/double columns
        # (documented profiling semantics: distinct-after-1e-6-
        # quantization; floor is deterministic on identical doubles
        # where round half-cases are not)
        if c in ordinal:
            return endpoint_to_ordinal(F.col(c), ordinal[c]).cast("string")
        if c in floaty:
            # NaN/Inf would overflow the long cast to null and silently
            # vanish from the distinct sketch (while still counting as
            # non-null); map them to sentinel strings instead so each
            # counts as one distinct value — and so the DuckDB oracle
            # (whose CAST would ERROR on them) sees the same stream.
            d = F.col(c).cast("double")
            return (
                F.when(F.isnan(d), F.lit("__nan__"))
                .when(d == F.lit(float("inf")), F.lit("__inf__"))
                .when(d == F.lit(float("-inf")), F.lit("__-inf__"))
                .otherwise(
                    F.floor(d * 1_000_000).cast("long").cast("string")
                )
            )
        return F.col(c).cast("string")

    pairs = (
        df.select(
            *keys,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col_name"),
                            _kmv_repr(c).alias("__v"),
                        )
                        for c in cols
                    ]
                )
            ).alias("e"),
        )
        .select(*keys, "e.col_name", "e.__v")
        .filter(F.col("__v").isNotNull())
    )
    est = kmv_distinct(pairs, "__v", k=k, by=keys + ["col_name"]).select(
        *keys, "col_name", "n_distinct_est"
    )
    return long.join(est, keys + ["col_name"], "left").select(
        *keys,
        "col_name",
        "n_rows",
        "n_nulls",
        F.coalesce("n_distinct_est", F.lit(0).cast("long")).alias(
            "n_distinct_est"
        ),
        "min_v",
        "max_v",
        "sum_v",
        "min_d",
        "max_d",
        "len_min",
        "len_max",
        "len_sum",
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    lo: int,
    hi: int,
    nbuckets: int,
    split_col: str,
) -> DataFrame:
    """Population Stability Index per segment — the dataset-drift
    staple of training-data pipelines: for every value of
    ``split_col`` (source, snapshot, time slice), the PSI of the
    segment's ``value_col`` distribution against the WHOLE table's,
    over the same equi-width nbuckets+2 grid as
    :func:`~.timeseries.histogram_windows` (underflow / interior /
    overflow, exact-integer bucketing via
    :func:`~.timeseries.histogram_bucket_expr`).

    ``PSI = Σ_i (p_i − q_i) · ln(p_i / q_i)`` with add-one (Laplace)
    smoothing — ``p_i = (c_i + 1) / (n + B)`` over ALL ``B =
    nbuckets + 2`` buckets including empty ones — so the log never
    sees zero.  < 0.1 is conventionally "no drift", 0.1–0.25
    "moderate", > 0.25 "major".

    Determinism: the bucket counts PIVOT into B integer columns
    (exact, order-insensitive partial aggregation), and the PSI sum
    is ONE fixed-order double expression over those columns — the
    repo's shared hash contract (no distributed double sum whose
    combine order could drift).

    Output per split value: ``n`` (segment rows) + ``psi`` (round 6).

    Scale shape: ONE partial-agged shuffle whose exchange carries
    (split, B counts) rows; the corpus baseline derives from the
    per-split table (integer sums over #splits rows) and broadcasts
    back.  B is bounded (pivot width is plan-time constant);
    nothing driver-side."""
    from .timeseries import histogram_bucket_expr

    if nbuckets < 1:
        raise ValueError(f"nbuckets must be >= 1, got {nbuckets}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    b_total = nbuckets + 2
    bucket = histogram_bucket_expr(value_col, lo, hi, nbuckets)
    per = df.select(
        F.col(split_col).alias("split"), F.expr(bucket).alias("__b")
    ).groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.when(F.col("__b") == i, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"c{i}")
            for i in range(b_total)
        ],
    )
    tot = per.agg(
        F.sum("n").alias("nt"),
        *[F.sum(f"c{i}").alias(f"g{i}") for i in range(b_total)],
    )
    j = per.crossJoin(F.broadcast(tot))
    p = lambda i: (F.col(f"c{i}") + 1).cast("double") / (  # noqa: E731
        F.col("n") + b_total
    ).cast("double")
    q = lambda i: (F.col(f"g{i}") + 1).cast("double") / (  # noqa: E731
        F.col("nt") + b_total
    ).cast("double")
    psi = None
    for i in range(b_total):
        term = (p(i) - q(i)) * F.log(p(i) / q(i))
        psi = term if psi is None else psi + term
    return j.select(
        F.col("split").alias(split_col), "n", F.round(psi, 6).alias("psi")
    )


def psi_timeline(
    df: DataFrame,
    value_col: str,
    lo: int,
    hi: int,
    nbuckets: int,
    period_ns: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Drift monitor over time — PSI between CONSECUTIVE periods: fold
    rows into ``period = ts DIV period_ns`` slices, pivot each slice's
    ``value_col`` distribution into exact integer bucket counts (the
    shared nbuckets+2 grid), and score each period against its
    predecessor with the same add-one-smoothed
    ``Σ (p_i − q_i)·ln(p_i/q_i)`` as :func:`psi_drift` — the
    production "did yesterday's data shift?" alarm.

    Output per period WITH an existing predecessor: ``period``,
    ``n`` (rows), ``n_prev``, ``psi`` (round 6; fixed-order double
    expression over the pivoted integer counts).

    Scale shape: one partial-agged shuffle carries (period, B counts)
    pivot rows; the consecutive-period comparison is a self-join of
    that DIMENSION-SIZED table on ``period = prev + 1``.  Periods with
    no predecessor slice (including gaps in the timeline) emit
    nothing — a gap means there is no adjacent baseline to drift
    from."""
    from .timeseries import histogram_bucket_expr

    if nbuckets < 1:
        raise ValueError(f"nbuckets must be >= 1, got {nbuckets}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if period_ns <= 0:
        raise ValueError(f"period_ns must be positive, got {period_ns}")
    b_total = nbuckets + 2
    t = f"CAST({ts_col} AS BIGINT)"
    period = f"(({t} - pmod({t}, {period_ns})) DIV {period_ns})"
    bucket = histogram_bucket_expr(value_col, lo, hi, nbuckets)
    per = df.select(
        F.expr(period).alias("period"), F.expr(bucket).alias("__b")
    ).groupBy("period").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.when(F.col("__b") == i, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"c{i}")
            for i in range(b_total)
        ],
    )
    prev = per.select(
        (F.col("period") + 1).alias("period"),
        F.col("n").alias("n_prev"),
        *[F.col(f"c{i}").alias(f"g{i}") for i in range(b_total)],
    )
    j = per.join(prev, "period")
    p = lambda i: (F.col(f"c{i}") + 1).cast("double") / (  # noqa: E731
        F.col("n") + b_total
    ).cast("double")
    q = lambda i: (F.col(f"g{i}") + 1).cast("double") / (  # noqa: E731
        F.col("n_prev") + b_total
    ).cast("double")
    psi = None
    for i in range(b_total):
        term = (p(i) - q(i)) * F.log(p(i) / q(i))
        psi = term if psi is None else psi + term
    return j.select(
        "period", "n", "n_prev", F.round(psi, 6).alias("psi")
    )


def rfm_segments(
    df: DataFrame,
    key: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_buckets: int = 5,
) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary
    quantile scores, the classic marketing-analytics rollup, computed
    with NO global sort.

    Semantics (pinned for the oracle): amounts become exact cents via
    ``floor(amount*100 + 0.5)``; per key ``recency_days`` is the whole
    days between the key's latest date and the CORPUS latest date
    (epoch-day integers), ``frequency`` the row count and
    ``monetary_cents`` the exact integer cent sum.  Each metric's
    bucket boundaries are the order statistics at 1-indexed ranks
    ``ceil(j*n/B), j=1..B-1`` over the n per-key rows, and a key's
    score is ``1 + #{j : metric beats b_j}`` — "beats" meaning ``>``
    for frequency/monetary (higher is better) and ``<`` for recency
    (lower is better) — so exact ties always share a bucket and the
    top quantile scores ``B``.  ``rfm = r*100 + f*10 + m`` (B <= 9).

    Scale shape: one groupBy shuffle builds the per-key table (eagerly
    materialized — bounded by |keys|, still distributed); boundaries
    come from :func:`..quantile_windows.exact_quantile_longs`'s
    iterative histogram refinement — O(B·buckets) driver rows per
    pass, 4-6 column-pruned scans of the per-key table, NO full-data
    range shuffle; scores are then pure broadcast-literal expressions.
    """
    if not (2 <= int(n_buckets) <= 9):
        raise ValueError(f"n_buckets must be in 2..9, got {n_buckets}")
    from .quantile_windows import exact_quantile_longs
    from ..sources import col_to_ns

    day_ns = 86_400_000_000_000
    ns = col_to_ns(F.col(date_col), df.schema[date_col].dataType)
    o = (
        df.select(
            F.col(key),
            ns.cast("long").alias("__ns"),
            F.floor(F.col(amount_col) * 100 + F.lit(0.5))
            .cast("long")
            .alias("__cents"),
        )
        # integer div, NOT double division: epoch-ns (~1e18) is far
        # beyond float64's exact-integer range
        .withColumn("__d", F.expr(f"__ns div {day_ns}"))
        .drop("__ns")
    )
    maxd = driver_rows(o.agg(F.max("__d")))[0][0]
    cust = (
        o.groupBy(key)
        .agg(
            (F.lit(int(maxd)) - F.max("__d")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("__cents").alias("monetary_cents"),
        )
        .localCheckpoint(eager=True)
    )
    n = driver_count(cust)
    B = int(n_buckets)
    ranks = [-(-(j * n) // B) for j in range(1, B)]  # ceil(j*n/B)

    def bounds(colname, better_low):
        row = driver_row(
            cust.agg(F.min(colname).alias("lo"), F.max(colname).alias("hi"))
        )
        # better_low (recency): boundaries are DESC-order statistics —
        # rank r from the top is ascending rank n+1-r — so the best
        # (smallest) value strictly beats all B-1 boundaries
        rk = [n + 1 - r for r in ranks] if better_low else ranks
        return exact_quantile_longs(
            cust, colname, rk, int(row["lo"]), int(row["hi"]), n
        )

    rb = bounds("recency_days", True)
    fb = bounds("frequency", False)
    mb = bounds("monetary_cents", False)

    def score(colname, bs, better_low):
        c = F.col(colname)
        terms = [
            F.when(c < F.lit(b) if better_low else c > F.lit(b), 1)
            .otherwise(0)
            for b in bs
        ]
        e = F.lit(1)
        for t in terms:
            e = e + t
        return e.cast("long")

    return cust.select(
        key,
        "recency_days",
        "frequency",
        "monetary_cents",
        score("recency_days", rb, True).alias("r_score"),
        score("frequency", fb, False).alias("f_score"),
        score("monetary_cents", mb, False).alias("m_score"),
    ).withColumn(
        "rfm",
        (F.col("r_score") * 100 + F.col("f_score") * 10
         + F.col("m_score")).cast("long"),
    )


def benford_digits(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fraud / synthetic-data / unit-mixup detector in data
    quality audits (public knowledge: Newcomb 1881, Benford 1938;
    chi-square framing per standard forensic-accounting practice).

    Semantics (pinned for the oracle): rows with ``floor(abs(v)) < 1``
    (zero/NULL/sub-unit) drop — the first significant digit of the
    INTEGER part is tested, which suits magnitude-spanning positive
    measures; ``obs_ppm`` is the truncating ``n*1e6 DIV total``
    (exact); ``expected_ppm`` and ``chi2_term`` are each ONE
    fixed-order double formula over exact integers
    (``p = ln(1+1/d)/ln(10)``, ``e = total*p``,
    ``term = (n-e)^2/e``), rounded to 6 — no distributed double sums.

    Scale shape: one column-pruned scan, partial-agged groupBy bounded
    at 9 rows, and a 9-row window for the total.  No Python.

    Output: ``(digit, n, obs_ppm, expected_ppm, chi2_term)``, one row
    per observed digit 1-9.
    """
    v = F.abs(F.col(col))
    iv = F.floor(v).cast("long")
    d = (
        df.select(iv.alias("__iv"))
        .filter(F.col("__iv") >= 1)
        .select(
            F.substring(F.col("__iv").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window as _W

    total = F.sum("n").over(_W.partitionBy())  # <= 9 rows: safe
    c = c.withColumn("total", total)
    p = "ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)"
    e = f"CAST(total AS DOUBLE) * ({p})"
    return c.select(
        "digit",
        "n",
        F.expr("(n * 1000000L) div total").alias("obs_ppm"),
        F.expr(f"round(({p}) * 1000000, 6)").alias("expected_ppm"),
        F.expr(
            f"round((CAST(n AS DOUBLE) - ({e}))"
            f" * (CAST(n AS DOUBLE) - ({e})) / ({e}), 6)"
        ).alias("chi2_term"),
    )


def cohort_ltv(
    df: DataFrame,
    key: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    period_days: int = 30,
) -> DataFrame:
    """Cohort lifetime-value matrix: keys grouped by first-activity
    period, each later period's revenue summed by cohort age — the
    revenue companion to the retention triangle (``q_retention_cohorts``).

    Semantics (pinned for the oracle): periods are
    ``epoch_day DIV period_days`` (exact integers); a key's cohort is
    its minimum period; ``age = period - cohort``; ``ltv_cents`` is
    the exact integer cent sum (``floor(amount*100 + 0.5)``) and
    ``n_keys`` the distinct keys active in the cell.

    Scale shape: two partial-agged passes + one equi-join on the key —
    identical structure to the retention triangle; no doubles anywhere.
    """
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    from ..sources import col_to_ns

    day_ns = 86_400_000_000_000
    ns = col_to_ns(F.col(date_col), df.schema[date_col].dataType)
    o = (
        df.select(
            F.col(key),
            ns.cast("long").alias("__ns"),
            F.floor(F.col(amount_col) * 100 + F.lit(0.5))
            .cast("long")
            .alias("__cents"),
        )
        .withColumn(
            "period", F.expr(f"__ns div {day_ns} div {period_days}")
        )
        .drop("__ns")
    )
    first = o.groupBy(key).agg(F.min("period").alias("cohort"))
    return (
        o.join(first, key)
        .groupBy(
            "cohort", (F.col("period") - F.col("cohort")).alias("age")
        )
        .agg(
            F.sum("__cents").alias("ltv_cents"),
            F.count_distinct(F.col(key)).alias("n_keys"),
        )
    )


def proportion_ztest(
    df: DataFrame,
    variant_col: str,
    success_col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Two-sample proportion z-test — the A/B-experiment readout:
    success rates of variants A (0) and B (1) compared under the
    pooled standard error (public formula:
    ``z = (pB − pA) / sqrt(p(1−p)(1/nA + 1/nB))``).

    Semantics (pinned for the oracle): ``variant_col`` must be 0/1
    (other values raise at plan build when detectable, else land in
    neither arm and are ignored); ``success_col`` is a boolean/0-1
    flag; counts are exact integers from ONE partial-agged pivot and
    every rate/z column is a fixed-order double formula over them
    (NULL z when either arm is empty or the pooled rate is degenerate
    0/1).  Optional ``by`` keys give per-segment tests.

    Output per group: ``(by..., n_a, c_a, n_b, c_b, rate_a_ppm,
    rate_b_ppm, z)`` — rates as truncating integer ppm, ``z`` round 6.
    """
    keys = list(by)
    v = F.col(variant_col).cast("long")
    s = F.col(success_col).cast("long")
    g = df.groupBy(*keys).agg(
        F.sum(F.when(v == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(v == 0, s).otherwise(0)).alias("c_a"),
        F.sum(F.when(v == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(v == 1, s).otherwise(0)).alias("c_b"),
    )
    pooled = (
        "(CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
    )
    z = (
        f"round((CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)"
        f" - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
        f" / sqrt({pooled} * (1.0 - {pooled})"
        f" * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)"
    )
    return g.select(
        *keys,
        "n_a", "c_a", "n_b", "c_b",
        F.expr("CASE WHEN n_a > 0 THEN (c_a * 1000000L) div n_a END")
        .alias("rate_a_ppm"),
        F.expr("CASE WHEN n_b > 0 THEN (c_b * 1000000L) div n_b END")
        .alias("rate_b_ppm"),
        F.expr(
            f"CASE WHEN n_a > 0 AND n_b > 0 AND c_a + c_b > 0"
            f" AND c_a + c_b < n_a + n_b THEN {z} END"
        ).alias("z"),
    )


def item_cooccurrence(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pairs: int = 2,
) -> DataFrame:
    """Market-basket co-occurrence with cosine affinity: for every
    unordered item pair sharing at least ``min_pairs`` baskets,
    ``cosine = n_ab / sqrt(n_a · n_b)`` over exact basket counts — the
    item-item collaborative-filtering primitive.

    Semantics (pinned for the oracle): (basket, item) pairs are
    DISTINCT first (quantity within a basket does not inflate
    affinity); pairs are emitted once with ``item_a < item_b``; the
    cosine is ONE fixed-order double formula over three exact bigints,
    round 6.

    Scale shape: the pair generation is a self-equi-join on the basket
    key — work is Σ_b k_b², bounded by (max basket size)·rows, NOT
    |items|²; counts partial-aggregate; the per-item totals join back
    by BROADCAST when the item dimension is small (Catalyst/AQE
    decides from stats).  No Python.

    Output: ``(item_a, item_b, n_ab, n_a, n_b, cosine)``.
    """
    if min_pairs < 1:
        raise ValueError(f"min_pairs must be >= 1, got {min_pairs}")
    bi = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    bi = bi.localCheckpoint(eager=True)  # three consumers below
    totals = bi.groupBy(F.col("__i").alias("item")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a = bi.select("__b", F.col("__i").alias("item_a"))
    b = bi.select("__b", F.col("__i").alias("item_b"))
    pairs = (
        a.join(b, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    ta = totals.select(
        F.col("item").alias("item_a"), F.col("n").alias("n_a")
    )
    tb = totals.select(
        F.col("item").alias("item_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(ta, "item_a")
        .join(tb, "item_b")
        .select(
            "item_a", "item_b", "n_ab", "n_a", "n_b",
            F.expr(
                "round(CAST(n_ab AS DOUBLE)"
                " / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)"
            ).alias("cosine"),
        )
    )
