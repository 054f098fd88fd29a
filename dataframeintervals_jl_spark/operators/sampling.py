"""Deterministic sampling and dataset splitting.

Training pipelines need REPRODUCIBLE subsets: `df.sample()` is seeded
per-partition, so the row set changes with partitioning, retries, and
cluster size.  These operators derive membership from a content/key
hash instead — the same row lands in the same split on any cluster,
any partitioning, any engine (the hash is the portable md5-prefix form
DuckDB computes bit-identically), and the split is a pure narrow
filter: no shuffle, fully pushdown-friendly, trivially resumable.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import driver_count, driver_row, driver_rows

from ..functions.text import portable_hash60

#: Denominator of the hash-bucket space used for rates/weights.
BUCKETS = 1_000_000


def _bucket(key_col, salt: str) -> Column:
    return F.pmod(portable_hash60(F.concat_ws("|", F.lit(salt), key_col)), F.lit(BUCKETS))


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep a row iff ``hash(salt|key) mod 1e6 < rate * 1e6`` — an
    exact, engine-independent ppm-resolution sample keyed on content,
    not partition layout.  Same key → same decision, so derived tables
    sampled with the same salt stay aligned across runs and engines."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thresh = int(round(rate * BUCKETS))
    return df.filter(_bucket(F.col(key_col), salt) < F.lit(thresh))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[float],
    labels: Sequence[str] = ("train", "val", "test"),
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one split by hash range — the
    deterministic train/val/test partition.  ``weights`` are
    proportions (normalized); boundaries are exact ppm bucket counts,
    so the assignment is reproducible to the row on any engine.

    Returns ``df`` plus a ``split_col`` label column; filter on it (a
    narrow, pushdown-friendly predicate) to materialize each split.
    """
    return df.withColumn(
        split_col, _split_label_expr(F.col(key_col), weights, labels, salt)
    )


def _split_label_expr(key_expr, weights, labels, salt: str):
    """The hash-range split label as an expression over an arbitrary
    key column — shared by :func:`hash_split` (row key) and
    :func:`leakage_safe_split` (cluster-representative key)."""
    if len(weights) != len(labels):
        raise ValueError(
            f"got {len(weights)} weights for {len(labels)} labels"
        )
    if any(w < 0 for w in weights) or sum(weights) <= 0:
        raise ValueError("weights must be nonnegative and sum > 0")
    total = float(sum(weights))
    bounds, acc = [], 0
    for w in weights[:-1]:
        acc += int(round(w / total * BUCKETS))
        bounds.append(acc)
    b = _bucket(key_expr, salt)
    expr = F.lit(labels[-1])
    for bound, label in zip(reversed(bounds), reversed(labels[:-1])):
        expr = F.when(b < F.lit(bound), F.lit(label)).otherwise(expr)
    return expr


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str,
    weights: Sequence[float],
    labels: Sequence[str] = ("train", "val", "test"),
    salt: str = "split",
    split_col: str = "split",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """:func:`hash_split` with a LEAKAGE GUARD: rows are split by their
    near-duplicate CLUSTER representative (the connected-components
    min-label over ``pairs``), so every member of a near-dup cluster
    lands in the SAME split — the guard that keeps a test set from
    containing paraphrases of training documents.  Rows in no cluster
    split by their own key, and since the representative IS the
    cluster's minimum member id, a cluster's split equals the plain
    :func:`hash_split` of its min member — adding newly-discovered
    duplicates of a document never moves the document's split.

    Cost over :func:`hash_split`: the components computation
    (vertex-sized state, O(log d) label rounds) plus ONE join of the
    duplicate-vertex-sized cluster map onto the corpus (broadcast when
    small; a key-equi hash join otherwise) — the membership expression
    itself stays row-local."""
    from .dedup import connected_components

    comp = connected_components(pairs, src=src, dst=dst)
    rep = comp.select(
        F.col("v").alias("__lsv"), F.col("cluster_id").alias("__lsc")
    )
    out = df.join(rep, F.col(key_col) == F.col("__lsv"), "left")
    skey = F.coalesce(F.col("__lsc"), F.col(key_col))
    return out.withColumn(
        split_col, _split_label_expr(skey, weights, labels, salt)
    ).drop("__lsv", "__lsc")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sample: keep a row iff
    ``hash(salt|key) mod 1e6 < rates[stratum] * 1e6``.  The standard
    data-mixture rebalancing step (e.g. downsample the dominant
    language, keep 100% of the rare ones); strata absent from ``rates``
    use ``default_rate``.

    Like every operator here the decision is a pure row-local
    expression keyed on content — no shuffle, pushdown-friendly, and
    the same row survives on any cluster or engine.  The per-stratum
    threshold is a CASE expression (strata counts are small); at 100 TB
    nothing is collected or broadcast.
    """
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thresh = F.lit(int(round(default_rate * BUCKETS)))
    for s, r in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(s), F.lit(int(round(r * BUCKETS)))
        ).otherwise(thresh)
    return df.filter(_bucket(F.col(key_col), salt) < thresh)


def mixture_sample(
    df: DataFrame,
    by: str,
    key_col: str,
    weights: Union[Mapping[str, float], None] = None,
    temperature: float = 1.0,
    exact: bool = False,
    salt: str = "mix",
) -> DataFrame:
    """Rebalance ``df`` toward a TARGET MIXTURE over the groups of
    ``by`` — the general data-mixing primitive behind training-corpus
    source weighting (q_source_mix's uniform rebalance is the
    ``weights=None, temperature=inf`` special case; tuned per-source
    weights with a temperature knob are the production shape).

    Target share of group g: ``s_g ∝ base_g ** (1/temperature)`` where
    ``base_g = weights[g]`` when ``weights`` is given (groups ABSENT
    from ``weights`` get share 0 — dropped, the source-filter idiom)
    and ``base_g = n_g`` (the empirical count) when it is ``None`` —
    so with no weights, ``temperature=1`` keeps the natural
    distribution (every threshold saturates, no row dropped) and
    ``temperature → inf`` flattens toward uniform, the standard
    multilingual temperature-sampling convention (p ∝ p_emp^(1/T)).

    Keep-rates are DOWNSAMPLING-ONLY (deterministic content-keyed ppm
    thresholds — no upsampling, no duplication):

    - ``exact=False`` (default): ``r_g = min(1, s_g · N / n_g)`` —
      keeps the most data; over-represented groups come down to their
      share, groups already below it keep everything (the realized mix
      is approximate where the cap binds — q_source_mix's policy).
    - ``exact=True``: ``r_g = s_g · K / n_g`` with
      ``K = min_g n_g / s_g`` — the realized mixture matches the
      target exactly (up to ppm rounding) at the cost of scaling every
      group down to the binding one.

    Thresholds are computed driver-side from ONE collected O(groups)
    count table in EXACT rational arithmetic (``Fraction``; the power
    is an exact binary fraction of the IEEE result), floored to ppm —
    bit-reproducible across runs and engines, and for integer weights
    at ``temperature=1`` identical to what a SQL oracle computes with
    integer division.  The filter itself is one narrow row-local CASE
    over ``hash(salt|key)`` — no shuffle, pushdown-friendly, nothing
    broadcast beyond the CASE literal (groups are assumed few: sources,
    languages, domains)."""
    thresholds = mixture_thresholds(
        df, by, weights=weights, temperature=temperature, exact=exact
    )
    return apply_mixture_thresholds(df, thresholds, by, key_col, salt=salt)


def mixture_thresholds(
    df: DataFrame,
    by: str,
    weights: Union[Mapping[str, float], None] = None,
    temperature: float = 1.0,
    exact: bool = False,
) -> dict:
    """The driver-side half of :func:`mixture_sample`: ONE collected
    O(groups) count table → per-group keep thresholds in ppm, exact
    rational arithmetic (see mixture_sample for the share math).
    Factored out so a STREAMING pipeline can freeze thresholds from a
    batch snapshot and apply them row-locally with
    :func:`apply_mixture_thresholds` (a stream cannot be counted)."""
    from fractions import Fraction

    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    if weights is not None:
        for g, w in weights.items():
            if w < 0:
                raise ValueError(f"weight for {g!r} must be >= 0, got {w}")
    counts = {
        r[by]: r["n"]
        for r in driver_rows(df.groupBy(by).agg(F.count(F.lit(1)).alias("n")))
    }
    if not counts:
        return {}
    total = sum(counts.values())

    def base(g):
        if weights is not None:
            return Fraction(weights.get(g, 0))
        return Fraction(counts[g])

    def powered(g):
        b = base(g)
        if b == 0:
            return Fraction(0)
        if temperature == 1.0:
            return b
        return Fraction(float(b) ** (1.0 / float(temperature)))

    shares = {g: powered(g) for g in counts}
    denom = sum(shares.values())
    if denom == 0:
        return {g: 0 for g in counts}
    shares = {g: s / denom for g, s in shares.items()}
    if exact:
        scale = min(
            Fraction(counts[g]) / s for g, s in shares.items() if s > 0
        )
    else:
        scale = Fraction(total)
    return {
        g: min(BUCKETS, int(shares[g] * scale * BUCKETS / counts[g]))
        for g in counts
    }


def apply_mixture_thresholds(
    df: DataFrame,
    thresholds: Mapping,
    by: str,
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Apply frozen per-group ppm keep ``thresholds`` (from
    :func:`mixture_thresholds`) as the pure row-local content-keyed
    hash filter — one narrow CASE, no shuffle, no state; valid on
    batch AND streaming DataFrames (groups absent from ``thresholds``
    are dropped, matching mixture_sample's weights contract)."""
    thr = F.lit(0)
    for g in sorted(thresholds, key=str):
        thr = F.when(F.col(by) == F.lit(g), F.lit(thresholds[g])).otherwise(
            thr
        )
    return df.filter(_bucket(F.col(key_col), salt) < thr)


def topk_per_group(
    df: DataFrame,
    by: Union[str, Sequence[str]],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per group under a deterministic ordering
    (``order_by`` must be a total order — include a unique tiebreaker).

    Plans as one shuffle on the group keys + a per-partition rank with
    the ``rank <= k`` filter evaluated inside the window stage (Spark's
    ``WindowGroupLimit`` pushes the limit below the sort at scale), so
    no group ever materializes more than its top slice downstream.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    by_cols = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*by_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    rate_col,
    salt: str = "wsample",
) -> DataFrame:
    """Per-row-rate deterministic Bernoulli sample: keep a row iff
    ``hash(salt|key) mod 1e6 < round(rate · 1e6)``, with ``rate_col`` a
    per-row column in [0, 1] — importance sampling by quality, size, or
    domain weight, with the same content-keyed determinism contract as
    :func:`deterministic_sample` (same key + salt → same decision on
    any cluster, partitioning, or engine).  Pure narrow filter: no
    shuffle, pushdown-friendly."""
    rate = F.col(rate_col) if isinstance(rate_col, str) else rate_col
    thresh = F.round(rate * F.lit(float(BUCKETS))).cast("long")
    return df.filter(_bucket(F.col(key_col), salt) < thresh)


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 64,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """K-minimum-values distinct-count sketch: per group, the estimate
    ``(k-1) · H / h_k`` where ``h_k`` is the k-th smallest 60-bit hash
    of the values and ``H`` the hash range — the classic mergeable
    cardinality sketch (Bar-Yossef et al.), here in a DETERMINISTIC
    form: the hash is the portable md5-based 60-bit hash, minima are
    order-independent, and the estimate is one bigint floor division —
    so unlike HLL the result is bit-identical on any engine, any
    partitioning, any merge order.

    Output: group keys + ``n_distinct_est`` (bigint) + ``n_hashes``
    (min(k, true distinct), bigint; groups with fewer than ``k``
    distinct values report the EXACT count in ``n_distinct_est``).

    Scale shape: one shuffle of (group, hash) pairs for the distinct,
    then a per-group window keeping rank <= k — WindowGroupLimit prunes
    to each partition's k smallest before the final rank, so no group's
    full hash set is ever held."""
    if k < 2 or k > 100_000:
        raise ValueError(f"k must be in [2, 100000], got {k}")
    keys = [by] if isinstance(by, str) else list(by or [])
    # 53-bit hash domain keeps (k-1)·H inside ANSI long range for any
    # allowed k ((10^5)·2^53 < 2^63); the 60→53-bit fold loses nothing
    # a sketch cares about and the SQL oracle applies the same fold
    H = 1 << 53
    # shiftright, NOT `/128`: double division would round the >2^53
    # hash before the floor
    h = df.select(
        *keys,
        F.shiftright(portable_hash60(F.col(col)), 7).alias("__h"),
    ).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    ranked = h.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    g = ranked.groupBy(*keys).agg(
        F.max("__h").alias("__hk"),
        F.count(F.lit(1)).alias("n_hashes"),
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("long")
    ).otherwise(
        # greatest(.., 1): hash value 0 is possible; ANSI DIV by zero
        # would error the whole job for one pathological group
        F.expr(f"({k - 1} * {H}L) DIV greatest(__hk, 1L)")
    )
    return g.select(
        *keys,
        est.alias("n_distinct_est"),
        F.col("n_hashes").cast("long").alias("n_hashes"),
    )


def sample_per_group(
    df: DataFrame,
    by: Union[str, Sequence[str]],
    key_col: str,
    k: int,
    salt: str = "gsample",
    rank_col: str = "rank",
) -> DataFrame:
    """Deterministic fixed-size sample of ``k`` rows per group — the
    bounded-reservoir companion to :func:`stratified_sample` (which is
    per-group *rate*, so group sizes still vary).  Ordering is by the
    portable content hash of ``(salt, key)`` with the key as
    tiebreaker: uniform-ish, engine/partitioning-independent, and
    stable under resalting only when intended.  Inspect-a-stratum,
    eval-subset, and per-source cap use cases.

    Plans exactly like :func:`topk_per_group`: one shuffle on the group
    keys, WindowGroupLimit keeps only each partition's k smallest
    hashes ahead of the final rank — no group's full row set survives
    the window stage."""
    key = F.col(key_col)
    return topk_per_group(
        df,
        by,
        order_by=[
            _bucket(key, salt).asc(),
            # full-width hash tiebreak, then the key itself: total order
            portable_hash60(F.concat_ws("|", F.lit(salt), key)).asc(),
            key.asc(),
        ],
        k=k,
        rank_col=rank_col,
    )


def heavy_hitters(
    df: DataFrame,
    col,
    min_share_ppm: int,
    out_col: str = "value",
) -> DataFrame:
    """EXACT frequency heavy hitters: every distinct value whose count
    is at least ``min_share_ppm`` parts-per-million of the total row
    count, with its exact count and integer ppm share — the
    over-represented-value detector (domain spam, boilerplate tokens,
    stuck sensors).  Threshold arithmetic is pure bigint
    (``1e6·cnt >= ppm·total``), so no float boundary row flips between
    engines.

    Output: ``(out_col, count, share_ppm)``.

    Scale shape (100 TB): the groupBy partial-aggregates map-side, so
    a value holding 10% of all rows contributes ONE partial row per
    task — skew concentrates no reducer (this is the same reason a
    sketch is unnecessary here: the reduced table is |distinct| rows,
    and the φ-threshold filter prunes it before any further stage).
    The total-count scalar is one extra partial-agg action; the
    sketch-free exactness is the point — Misra-Gries/CMS trade exact
    counts away to bound memory that Spark's partial aggregation
    already bounds."""
    if not (0 < min_share_ppm <= BUCKETS):
        raise ValueError(
            f"min_share_ppm must be in (0, 1e6], got {min_share_ppm}"
        )
    c = F.col(col) if isinstance(col, str) else col
    counts = df.select(c.alias(out_col)).groupBy(out_col).agg(
        F.count(F.lit(1)).alias("count")
    )
    total = driver_count(df)
    return counts.filter(
        F.col("count") * F.lit(BUCKETS) >= F.lit(int(min_share_ppm) * total)
    ).select(
        out_col,
        "count",
        F.expr(f"(count * {BUCKETS}L) DIV {total}L").alias("share_ppm"),
    )


def kmv_overlap_estimate(
    a: DataFrame,
    b: DataFrame,
    col: str,
    k: int = 256,
) -> DataFrame:
    """Key-overlap / join-cardinality estimation between two tables
    from bottom-k (KMV) sketches — answer "how big would this join
    be?" with one cheap distinct-and-take-k pass per side instead of
    running the join.  Same determinism contract as
    :func:`kmv_distinct`: portable hash, integer arithmetic, identical
    on any engine or partitioning.

    Estimators (Beyer et al., SIGMOD'07): the union's KMV gives
    ``union_est``; the fraction of the union's bottom-k present in
    BOTH sides estimates Jaccard; ``intersect_est = union_est ·
    jaccard``.  Below-k cardinalities are exact by construction.

    Output: one row ``(n_bottom, union_est, jaccard_ppm,
    intersect_est)`` — ppm/floored bigints throughout.

    Scale shape: each side is one partial-aggregated distinct on the
    53-bit hash followed by TakeOrdered(k) — no full-width shuffle of
    either table, no join of the tables themselves; everything after
    the two sketches is k-row arithmetic.
    """
    if k < 2 or k > 100_000:
        raise ValueError(f"k must be in [2, 100000], got {k}")
    H = 1 << 53

    def sketch(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.shiftright(portable_hash60(F.col(col)), 7).alias("__h")
            )
            .distinct()
            .orderBy("__h")
            .limit(k)
        )

    # the k-row sketches are read twice each (union + membership join);
    # an eager checkpoint stops the full-table distinct from running
    # twice per side — this IS the "one pass per side" the docstring
    # promises
    ha = sketch(a).withColumn("__ina", F.lit(1)).localCheckpoint(eager=True)
    hb = sketch(b).withColumn("__inb", F.lit(1)).localCheckpoint(eager=True)
    u = (
        ha.select("__h")
        .unionByName(hb.select("__h"))
        .distinct()
        .orderBy("__h")
        .limit(k)
    )
    j = (
        u.join(ha, "__h", "left")
        .join(hb, "__h", "left")
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n_bottom"),
        F.max("__h").alias("__hk"),
        F.sum(
            (F.col("__ina").isNotNull() & F.col("__inb").isNotNull()).cast(
                "long"
            )
        ).alias("__both"),
    )
    union_est = F.when(
        F.col("n_bottom") < F.lit(k), F.col("n_bottom")
    ).otherwise(F.expr(f"({k} - 1) * {H}L DIV __hk"))
    pre = agg.select(
        F.col("n_bottom").cast("long").alias("n_bottom"),
        union_est.cast("long").alias("union_est"),
        F.expr("__both * 1000000 DIV n_bottom").alias("jaccard_ppm"),
    )
    return pre.select(
        "n_bottom",
        "union_est",
        "jaccard_ppm",
        # bigint floor throughout — no float division anywhere
        F.expr("(union_est * jaccard_ppm) DIV 1000000").alias("intersect_est"),
    )


def _hll_alpha(m: int) -> float:
    """Standard HyperLogLog bias constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_params(p: int) -> dict:
    """Shared HLL constants for the operator and its SQL oracle:
    ``m`` registers, hash split widths, the scaled-integer register
    sum exponent, the numerator constant ``C = alpha·m²·2^SCALE``
    (emitted as the SAME double literal in both engines), and the
    precomputed linear-counting table ``lc[V] = round(m·ln(m/V))``
    (1-indexed; a table lookup instead of a runtime ``ln`` keeps the
    small-range correction bit-identical across engines)."""
    import math

    if not (4 <= p <= 12):
        raise ValueError(f"p must be in [4, 12], got {p}")
    m = 1 << p
    scale = 53 - p  # bit width of the rho window; max register sum m·2^scale = 2^53
    return {
        "p": p,
        "m": m,
        "scale": scale,
        "c_lit": repr(_hll_alpha(m) * m * m * float(1 << scale)),
        "lc": [int(round(m * math.log(m / v))) for v in range(1, m + 1)],
    }


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 8,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """The MERGEABLE half of :func:`hll_distinct`: group keys +
    ``(__idx, __rho)`` register rows (max rho per occupied register).
    Registers from disjoint inputs (partitions, days, corpora, stream
    micro-batches) union + re-max to exactly the registers of the
    combined input — max is associative/commutative/idempotent — so
    this is the persistable incremental-cardinality sketch: store
    ≤ 2^p rows per group, merge with :func:`hll_merge_registers`,
    finalize with :func:`hll_from_registers`.  The projection is
    row-local, so it runs unchanged on a STREAMING input as a single
    update-mode aggregation."""
    keys = [by] if isinstance(by, str) else list(by or [])
    idx, rho = hll_register_exprs(col, p)
    return (
        df.select(*keys, idx.alias("__idx"), rho.alias("__rho"))
        .groupBy(*keys, "__idx")
        .agg(F.max("__rho").alias("__rho"))
    )


def hll_register_exprs(col, p: int = 8):
    """The ROW-LOCAL half of :func:`hll_registers` as a pair of plain
    Column expressions ``(idx, rho)`` — what a STREAMING producer emits
    per row in append mode so the sink's ``max(rho) per (group, idx)``
    maintains the sketch across micro-batches (max is associative /
    commutative / idempotent; :func:`~..streaming.stream_hll_windows`
    composes this with the stabbing join)."""
    prm = hll_params(p)
    m, scale = prm["m"], prm["scale"]
    h = F.shiftright(portable_hash60(F.col(col) if isinstance(col, str) else col), 7)
    w = F.shiftright(h, p)
    bitlen = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(scale + 1)).otherwise(F.lit(scale + 1) - bitlen)
    return F.pmod(h, F.lit(m)), rho


def hll_merge_registers(
    *regs: DataFrame, by: Union[str, Sequence[str], None] = None
) -> DataFrame:
    """Union register tables from disjoint inputs into one — the
    sketch-merge that makes HLL the 100 TB cardinality shape: per-day
    register tables of ≤ 2^p rows each combine in O(tables · m), never
    re-reading the data they summarize."""
    keys = [by] if isinstance(by, str) else list(by or [])
    out = regs[0]
    for r in regs[1:]:
        out = out.unionByName(r)
    return out.groupBy(*keys, "__idx").agg(F.max("__rho").alias("__rho"))


def hll_from_registers(
    regs: DataFrame,
    p: int = 8,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Finalize a register table into ``(keys, hll_est, v_zero)`` —
    the non-mergeable last step of :func:`hll_distinct` (see there for
    the determinism contract)."""
    prm = hll_params(p)
    m, scale, c_lit, lc = prm["m"], prm["scale"], prm["c_lit"], prm["lc"]
    keys = [by] if isinstance(by, str) else list(by or [])
    g = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__present"),
        # rho can exceed SCALE only for w == 0; least() caps its
        # contribution at 1 (deterministically — the oracle applies
        # the identical cap)
        F.sum(
            F.expr(f"shiftleft(1L, {scale} - least(__rho, {scale}))")
        ).alias("__s_present"),
    )
    v_zero = F.lit(m) - F.col("__present")
    s_total = F.col("__s_present") + v_zero * F.lit(1 << scale)
    raw = F.expr(f"CAST(floor({c_lit} / __s)  AS BIGINT)")
    lc_arr = F.array(*[F.lit(v).cast("long") for v in lc])
    est = F.when(
        (F.col("__v") > 0) & (raw <= F.lit(5 * m // 2)),
        F.element_at(lc_arr, F.col("__v").cast("int")),
    ).otherwise(raw)
    return (
        g.select(*keys, v_zero.alias("__v"), s_total.alias("__s"))
        .select(*keys, est.alias("hll_est"), F.col("__v").cast("long").alias("v_zero"))
    )


def hll_distinct(
    df: DataFrame,
    col: str,
    p: int = 8,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007), in a
    fully DETERMINISTIC cross-engine form: the portable 53-bit hash
    splits into a register index (low ``p`` bits) and a rho window
    (high ``53-p`` bits); rho is computed by integer bit-length
    (``length(conv(w, 10, 2))``), the harmonic mean is a scaled
    BIGINT sum ``S = Σ 2^(SCALE-rho)`` (order-independent, exact),
    the raw estimate is ONE IEEE double division by a shared literal
    constant, and the small-range linear-counting correction is a
    precomputed integer table lookup — no runtime ``ln``, no
    float accumulation, so the result is bit-identical on any engine,
    any partitioning, any merge order (same contract as
    :func:`kmv_distinct`, at ~1.04/√m relative error for a fraction
    of KMV's state: 2^p registers vs k 64-bit minima).

    Output: group keys + ``hll_est`` (bigint) + ``v_zero`` (bigint,
    the count of untouched registers — 0 means the sketch is
    saturated and the raw estimator is in effect).

    Scale shape (100 TB): rows map to ``(key, idx, rho)`` and
    partial-aggregate to at most ``m`` register rows PER TASK before
    the shuffle — the shuffle carries O(groups·m) rows no matter the
    input size, and register merge (max) is associative, so the same
    construction serves batch, incremental append, and streaming
    merge (the split lives in :func:`hll_registers` /
    :func:`hll_from_registers`; this is their composition)."""
    return hll_from_registers(hll_registers(df, col, p, by), p, by)


def greedy_coverage_select(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy maximum-coverage data selection: pick ``k`` documents,
    each round choosing the document covering the most DISTINCT tokens
    not yet covered by earlier picks — the classic (1-1/e)-approximate
    submodular selection used to build small, diverse eval/seed sets
    from a large corpus.

    Output: ``(sel_rank, id_col, gain)`` — rank 1..k in selection
    order, ``gain`` = newly covered distinct tokens at pick time.
    Ties break by (gain DESC, id ASC): fully deterministic, so an
    unrolled SQL oracle replays every round.

    Scale shape: the (doc, token) incidence table is built once
    (distinct, persisted) and then SHRINKS monotonically: after each
    pick, the winner's remaining terms (one document's vocabulary —
    always broadcast-able) are anti-joined away and the residual is
    re-persisted with bounded lineage.  Each round's gain scan is then
    a bare partial-aggregated count + 1-row TakeOrdered over the
    (shrinking) residual — no per-round join against a growing covered
    set, no re-scan of already-covered rows (min-of-5 at sf0.1, k=5:
    5.5s vs the prior shape's 6.8s record, on a noisy host).  The
    driver holds only the k winners.  Raises if
    every document is fully covered before ``k`` picks (ambiguous
    remainder)."""
    from ..functions.text import shingles as _shingles

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # coverage units are word 3-gram SHINGLES, not tokens: a synthetic
    # or templated corpus can have a tiny token vocabulary (this
    # testdata: 31), which one document saturates — phrase-level units
    # keep the marginal-gain landscape meaningful.  Units are carried
    # as portable 60-bit HASHES: every round re-aggregates this table,
    # and 8-byte keys shuffle/compare far cheaper than 40-byte phrases
    # (collisions only merge units — harmless at 2^60)
    t = (
        docs.select(
            F.col(id_col),
            F.explode(_shingles(F.lower(F.col(text_col)), 3)).alias("__sh"),
        )
        .select(id_col, portable_hash60(F.col("__sh")).alias("term"))
        .distinct()
        .persist()
    )
    driver_count(t)

    spark = docs.sparkSession
    id_type = dict(docs.dtypes)[id_col]
    cur = t
    prev = None
    picks: list[tuple] = []
    try:
        for r in range(1, k + 1):
            # `cur` already excludes every covered term, so the gain
            # scan is a bare agg — no join in the hot job.  For r > 1
            # this ONE action also materializes `cur`'s persist (the
            # anti-join reads the PREVIOUS residual's still-live cache
            # inside the same job), so the per-round driver_count
            # materialization job is gone: one scheduler round-trip
            # per round instead of two (guide §1.2).
            gains = driver_rows(
                cur.groupBy(id_col)
                .agg(F.count(F.lit(1)).alias("gain"))
                .orderBy(F.col("gain").desc(), F.col(id_col))
                .limit(1)
            )
            # the previous residual may only be released AFTER the scan
            # above has populated cur's cache off it
            if prev is not None and prev is not t:
                prev.unpersist()
                prev = None
            if not gains:
                raise RuntimeError(
                    f"greedy_coverage_select: all documents fully "
                    f"covered after {r - 1} picks — k={k} is larger "
                    "than the productive selection"
                )
            doc, gain = gains[0][id_col], int(gains[0]["gain"])
            picks.append((r, doc, gain))
            if r == k:
                break
            # subtract the winner's remaining terms (one document's
            # vocabulary — always broadcast-able); the shrunken
            # residual materializes inside the NEXT round's gain scan
            delta = cur.filter(F.col(id_col) == doc).select("term")
            nxt = cur.join(F.broadcast(delta), "term", "left_anti").persist()
            prev, cur = cur, nxt
    finally:
        # also reached on the all-covered error path — never leak the
        # incidence table or any residual into session storage
        t.unpersist()
        for d in (prev, cur):
            if d is not None and d is not t:
                d.unpersist()
    return spark.createDataFrame(
        picks, f"sel_rank long, {id_col} {id_type}, gain long"
    )


# --- Count-Min sketch ------------------------------------------------------

#: Mersenne-prime hash modulus shared with the minhash family: inputs
#: reduce below 2^31 so a*h + b stays under 2^61 (ANSI-long safe) with
#: coefficients < 2^30.
_CMS_MOD = (1 << 31) - 1


def cms_params(width: int = 512, depth: int = 4) -> dict:
    """Shared Count-Min constants for the operator and its SQL oracle:
    ``depth`` independent ``(a, b)`` pairwise hash rows (same splitmix64
    family as minhash — deterministic, engine-independent) over a
    ``width``-bucket table.  Standard guarantees (Cormode & Muthukrishnan
    2005): overestimate only, error ≤ 2N/width with prob 1 - 2^-depth."""
    from .dedup import _hash_family

    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1, got {width}x{depth}")
    return {"width": width, "depth": depth, "family": _hash_family(depth)}


def _cms_bucket_array(col, family, width: int) -> Column:
    h = F.pmod(portable_hash60(col), F.lit(_CMS_MOD))
    return F.array(
        *[
            F.pmod(F.pmod(h * F.lit(a) + F.lit(b), F.lit(_CMS_MOD)), F.lit(width))
            for a, b in family
        ]
    )


def cms_registers(
    df: DataFrame,
    col: str,
    width: int = 512,
    depth: int = 4,
    weight_col: Union[str, None] = None,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """The MERGEABLE half of a Count-Min frequency sketch: group keys +
    ``(__row, __bkt, __cnt)`` register rows — for every input occurrence
    of ``col``, each of the ``depth`` hash rows increments one of its
    ``width`` buckets by 1 (or by ``weight_col``).  Registers from
    disjoint inputs (partitions, days, stream micro-batches) union +
    re-SUM to exactly the combined input's registers — sum is
    associative/commutative — so this is the persistable incremental
    frequency sketch: store ≤ depth·width rows per group, merge with
    :func:`cms_merge_registers`, query with :func:`cms_estimate`.

    Scale shape (100 TB): rows map to ``depth`` (row, bucket) pairs and
    partial-aggregate to at most depth·width register rows PER TASK
    before the shuffle — shuffle volume is O(groups·depth·width)
    regardless of input size.  The projection + sum is a plain
    streaming update-mode aggregation, so the SAME call is the
    streaming twin (tested).

    ``weight_col`` MUST be non-negative and non-null: Count-Min's
    overestimate-only guarantee (which :func:`cms_estimate` and
    :func:`cms_join_size` rely on — min over hash rows assumes counts
    only ever add) breaks under negative updates.  Enforced row-wise
    with ``assert_true`` (a task-failing check, costs one codegen'd
    comparison)."""
    prm = cms_params(width, depth)
    keys = [by] if isinstance(by, str) else list(by or [])
    if weight_col:
        wc = F.col(weight_col)
        w = F.when(
            F.assert_true(
                wc.isNotNull() & (wc >= 0),
                f"cms_registers: weight_col {weight_col!r} must be "
                "non-negative and non-null (Count-Min is overestimate-"
                "only; negative updates break cms_estimate/cms_join_size)",
            ).isNull(),
            wc.cast("long"),
        )
    else:
        w = F.lit(1).cast("long")
    return (
        df.select(
            *keys,
            F.posexplode(
                _cms_bucket_array(F.col(col), prm["family"], width)
            ).alias("__row", "__bkt"),
            w.alias("__w"),
        )
        .groupBy(*keys, "__row", "__bkt")
        .agg(F.sum("__w").alias("__cnt"))
    )


def cms_merge_registers(
    *regs: DataFrame, by: Union[str, Sequence[str], None] = None
) -> DataFrame:
    """Union Count-Min register tables from disjoint inputs into one —
    per-slice sketches of ≤ depth·width rows combine in
    O(tables·depth·width), never re-reading the data they summarize."""
    keys = [by] if isinstance(by, str) else list(by or [])
    out = regs[0]
    for r in regs[1:]:
        out = out.unionByName(r)
    return out.groupBy(*keys, "__row", "__bkt").agg(
        F.sum("__cnt").alias("__cnt")
    )


def cms_estimate(
    regs: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 512,
    depth: int = 4,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Point-query a register table: for each row of ``items``, the
    Count-Min estimate ``cms_est`` = min over the ``depth`` hash rows of
    that item's bucket count (missing bucket → 0; never underestimates
    the true count, deterministically replayable).

    The registers (≤ groups·depth·width rows) BROADCAST to the items —
    querying a 100 TB corpus sketch against any number of probe items is
    a map-only pass over the items."""
    prm = cms_params(width, depth)
    keys = [by] if isinstance(by, str) else list(by or [])
    probes = items.select(
        "*",
        F.posexplode(_cms_bucket_array(F.col(col), prm["family"], width)).alias(
            "__row", "__bkt"
        ),
    )
    item_cols = items.columns
    joined = probes.join(
        F.broadcast(regs), [*keys, "__row", "__bkt"], "left"
    ).withColumn("__cnt", F.coalesce(F.col("__cnt"), F.lit(0).cast("long")))
    return joined.groupBy(*item_cols).agg(F.min("__cnt").alias("cms_est"))


def cms_sql_registers(
    source_sql: str,
    expr: str,
    width: int = 512,
    depth: int = 4,
    weight: str = "1::BIGINT",
) -> str:
    """DuckDB CTE body replaying :func:`cms_registers` bit-for-bit on
    ``source_sql`` (a relation exposing ``{expr}`` per occurrence):
    emits ``(__row, __bkt, __cnt)``.  Shared by the catalog oracles."""
    from ..functions.text import PORTABLE_HASH60_SQL

    prm = cms_params(width, depth)
    h = f"({PORTABLE_HASH60_SQL.format(x=expr)} % {_CMS_MOD})"
    rows = " UNION ALL ".join(
        f"SELECT {i} AS __row, ((({h}*{a} + {b}) % {_CMS_MOD}) % {width}) AS __bkt,"
        f" {weight} AS __w FROM ({source_sql}) __src"
        for i, (a, b) in enumerate(prm["family"])
    )
    return (
        f"SELECT __row, __bkt, sum(__w)::BIGINT AS __cnt FROM ({rows}) "
        f"GROUP BY __row, __bkt"
    )

# --- Quantile sketch (bottom-k row sample) ---------------------------------

#: Register-count cap: 16384 values per group is ~0.4% rank error at
#: the median, and the per-group collect in qsk_quantiles stays tiny.
QSK_MAX_K = 16_384


def qsk_registers(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 256,
    by: Union[str, Sequence[str], None] = None,
    salt: str = "qsk",
) -> DataFrame:
    """The MERGEABLE half of a quantile sketch: per group, the ``k``
    rows with the smallest portable hash of ``(salt, key_col)`` — a
    deterministic uniform ROW sample (keys must be distinct per row,
    e.g. a doc id; hashing the key rather than the value is what makes
    it a row sample and not a distinct-value sample).  Registers are
    group keys + ``(__pri, __val)`` rows.  Registers from disjoint
    inputs (partitions, days, stream micro-batches) union +
    re-bottom-k to exactly the combined input's registers — bottom-k
    under a total order is associative — so this is the persistable
    incremental quantile sketch completing the family (KMV/HLL =
    cardinality, CMS = frequency, QSK = quantiles): store ≤ k rows per
    group, merge with :func:`qsk_merge_registers`, query with
    :func:`qsk_quantiles`.  Rank error is the binomial sampling error,
    ~``sqrt(p(1-p)/k)`` at quantile ``p``.

    Scale shape (100 TB): one shuffle of (group, pri, val) triples;
    WindowGroupLimit prunes each task to its k smallest priorities
    BEFORE the shuffle, so no group's full row set ever moves.  The
    bottom-k maintenance is a window, not an aggregate, so the
    STREAMING story is micro-batch register merging (foreachBatch:
    ``qsk_merge_registers(index, qsk_registers(batch, ...))`` — the
    register table is ≤ groups·k rows), mirroring
    ``incremental_minhash_dedup``'s persisted-index shape."""
    if k < 8 or k > QSK_MAX_K:
        raise ValueError(f"k must be in [8, {QSK_MAX_K}], got {k}")
    keys = [by] if isinstance(by, str) else list(by or [])
    pri = portable_hash60(
        F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string"))
    )
    # NULL values carry no quantile information and would desync the
    # sorted-array index math downstream (collect_list drops nulls but
    # a count would include them) — exclude them BEFORE sampling so
    # the k-row budget is spent on real values
    h = df.filter(F.col(value_col).isNotNull()).select(
        *keys, pri.alias("__pri"), F.col(value_col).alias("__val")
    )
    return _bottom_k(h, keys, k)


def _bottom_k(h: DataFrame, keys: list, k: int) -> DataFrame:
    """Bottom-k rows by (__pri, __val) per group — as a rank window
    when grouped (WindowGroupLimit prunes each task to k rows per
    group pre-shuffle) and as ``orderBy().limit(k)`` when KEYLESS:
    Spark plans that as TakeOrderedAndProject (distributed partial
    top-k, map-side heaps), where an empty-partition rank window would
    funnel every row through ONE partition (the same single-window
    trap the round-5 vocabulary rankings hit).  Rows beyond the cut
    that tie on the full (__pri, __val) tuple are interchangeable, so
    either physical form yields the same register multiset."""
    if keys:
        w = Window.partitionBy(*keys).orderBy("__pri", "__val")
        return (
            h.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    return h.orderBy("__pri", "__val").limit(k)


def qsk_merge_registers(
    *regs: DataFrame, k: int = 256, by: Union[str, Sequence[str], None] = None
) -> DataFrame:
    """Union quantile-sketch register tables from disjoint inputs and
    re-apply the bottom-k — per-slice sketches of ≤ k rows combine in
    O(tables·k) without re-reading the data they summarize.  ``k`` must
    match the k the slices were built with (a larger k here cannot
    invent rows the slices already dropped)."""
    if k < 8 or k > QSK_MAX_K:
        raise ValueError(f"k must be in [8, {QSK_MAX_K}], got {k}")
    keys = [by] if isinstance(by, str) else list(by or [])
    out = regs[0]
    for r in regs[1:]:
        out = out.unionByName(r)
    return _bottom_k(out, keys, k)


def qsk_quantiles(
    regs: DataFrame,
    probs_ppm: Sequence[int],
    by: Union[str, Sequence[str], None] = None,
    out_col: str = "q_val",
) -> DataFrame:
    """Query a register table for quantiles: per group and requested
    probability (parts-per-million, so the index math is pure bigint),
    the TYPE-1 (lower) sample quantile — sort the ≤ k sampled values,
    take element ``(ppm·(n-1)) DIV 1e6`` (0-based).  No interpolation,
    no floats: bit-identical on any engine.

    Output: group keys + ``prob_ppm`` + ``out_col`` + ``n_sample``.
    The per-group collect_list is bounded by the sketch's k."""
    probs = [int(p) for p in probs_ppm]
    if not probs or any(p < 0 or p > BUCKETS for p in probs):
        raise ValueError(f"probs_ppm must be within [0, {BUCKETS}], got {probs_ppm}")
    keys = [by] if isinstance(by, str) else list(by or [])
    g = regs.groupBy(*keys).agg(
        F.sort_array(F.collect_list("__val")).alias("__vs"),
        F.count(F.lit(1)).alias("n_sample"),
    )
    return g.select(
        *keys,
        F.explode(F.array(*[F.lit(p) for p in probs])).alias("prob_ppm"),
        F.col("__vs"),
        F.col("n_sample"),
    ).select(
        *keys,
        "prob_ppm",
        F.element_at(
            F.col("__vs"),
            F.expr(
                f"CAST((prob_ppm * (n_sample - 1)) DIV {BUCKETS} AS INT) + 1"
            ),
        ).alias(out_col),
        F.col("n_sample").cast("long").alias("n_sample"),
    )


def kmv_overlap_matrix(
    df: DataFrame,
    col: str,
    by: str,
    k: int = 256,
    max_groups: int = 64,
) -> DataFrame:
    """Pairwise key-overlap MATRIX between the groups of ``by`` from
    per-group KMV sketches — "how much do my sources share users /
    domains / documents?" for every source pair at once, the
    dataset-mixing diagnostic (estimators as in
    :func:`kmv_overlap_estimate`, Beyer et al. SIGMOD'07; same
    determinism contract: portable hash, bigint-only arithmetic).

    Output: one row per unordered pair ``(group_a, group_b, n_bottom,
    union_est, jaccard_ppm, intersect_est)`` with ``group_a <
    group_b``; below-k unions are exact by construction.

    Scale shape (100 TB): ONE distinct + bottom-k pass over the data
    (WindowGroupLimit prunes to k hashes per group per task — the only
    stage that sees the input); everything after operates on the
    G·k-row sketch table, expanded to at most G²·k/2 pair rows via two
    equi-joins against the broadcast pair list.  G is gated by
    ``max_groups`` (the matrix is meant for source/split-level G, not
    per-user G; the gate's group count is read off the ≤ G·k-row
    sketch, not the input)."""
    if k < 2 or k > 100_000:
        raise ValueError(f"k must be in [2, 100000], got {k}")
    H = 1 << 53
    h = df.select(
        F.col(by).alias("__g"),
        F.shiftright(portable_hash60(F.col(col)), 7).alias("__h"),
    ).distinct()
    w = Window.partitionBy("__g").orderBy("__h")
    s = (
        h.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        # reused three times (group list + both pair sides): checkpoint
        # the G·k-row sketch so the full-table distinct runs once
        .localCheckpoint(eager=True)
    )
    gs = s.select("__g").distinct()
    n_groups = driver_count(gs)
    if n_groups > max_groups:
        raise ValueError(
            f"{n_groups} groups exceeds max_groups={max_groups}; "
            f"the pairwise matrix is O(G^2) — raise max_groups only if "
            f"G^2*k rows are acceptable"
        )
    pairs = (
        gs.select(F.col("__g").alias("__ga"))
        .crossJoin(gs.select(F.col("__g").alias("__gb")))
        .filter(F.col("__ga") < F.col("__gb"))
    )
    ua = F.broadcast(pairs).join(s, s["__g"] == F.col("__ga")).select(
        "__ga", "__gb", "__h",
        F.lit(1).alias("__ia"), F.lit(0).alias("__ib"),
    )
    ub = F.broadcast(pairs).join(s, s["__g"] == F.col("__gb")).select(
        "__ga", "__gb", "__h",
        F.lit(0).alias("__ia"), F.lit(1).alias("__ib"),
    )
    m = (
        ua.unionByName(ub)
        .groupBy("__ga", "__gb", "__h")
        .agg(F.max("__ia").alias("__ina"), F.max("__ib").alias("__inb"))
    )
    w2 = Window.partitionBy("__ga", "__gb").orderBy("__h")
    r = m.withColumn("__rn", F.row_number().over(w2)).filter(
        F.col("__rn") <= k
    )
    agg = r.groupBy("__ga", "__gb").agg(
        F.count(F.lit(1)).alias("n_bottom"),
        F.max("__h").alias("__hk"),
        F.sum((F.col("__ina") + F.col("__inb") == 2).cast("long")).alias(
            "__both"
        ),
    )
    union_est = F.when(
        F.col("n_bottom") < F.lit(k), F.col("n_bottom")
    ).otherwise(F.expr(f"({k} - 1) * {H}L DIV greatest(__hk, 1L)"))
    pre = agg.select(
        F.col("__ga").alias("group_a"),
        F.col("__gb").alias("group_b"),
        F.col("n_bottom").cast("long").alias("n_bottom"),
        union_est.cast("long").alias("union_est"),
        F.expr("__both * 1000000 DIV n_bottom").alias("jaccard_ppm"),
    )
    # per-group cardinality estimates from the SAME sketches (exactly
    # kmv_distinct's estimator) feed the DIRECTIONAL containment
    # |A∩B|/|A| — the "is source A mostly inside B" signal Jaccard
    # cannot express for asymmetric sizes; capped at 1e6 because the
    # two estimates are independently noisy
    gstats = s.groupBy("__g").agg(
        F.max("__h").alias("__ghk"), F.count(F.lit(1)).alias("__gn")
    )
    n_est = F.when(F.col("__gn") < F.lit(k), F.col("__gn")).otherwise(
        F.expr(f"({k} - 1) * {H}L DIV greatest(__ghk, 1L)")
    )
    ga = gstats.select(
        F.col("__g").alias("group_a"), n_est.cast("long").alias("n_a_est")
    )
    gb = gstats.select(
        F.col("__g").alias("group_b"), n_est.cast("long").alias("n_b_est")
    )
    pre2 = (
        pre.withColumn(
            "intersect_est",
            F.expr("(union_est * jaccard_ppm) DIV 1000000"),
        )
        .join(F.broadcast(ga), "group_a")
        .join(F.broadcast(gb), "group_b")
    )
    return pre2.select(
        "group_a",
        "group_b",
        "n_bottom",
        "union_est",
        "jaccard_ppm",
        "intersect_est",
        "n_a_est",
        "n_b_est",
        F.expr(
            "least(1000000L, intersect_est * 1000000 DIV greatest(n_a_est, 1L))"
        ).alias("containment_a_ppm"),
        F.expr(
            "least(1000000L, intersect_est * 1000000 DIV greatest(n_b_est, 1L))"
        ).alias("containment_b_ppm"),
    )


def cms_join_size(
    regs_a: DataFrame,
    regs_b: DataFrame,
    width: int = 512,
    depth: int = 4,
    by: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Equi-join SIZE estimate from two Count-Min register tables —
    the classic sketch inner product (Cormode & Muthukrishnan 2005,
    §4.2): per hash row, ``Σ_bucket cnt_a · cnt_b`` estimates
    ``Σ_key f_a(key) · f_b(key)`` = the join's output rows; the MIN
    over the ``depth`` rows is the estimate.  Overestimate-only
    (collisions only add), deterministic, and computed WITHOUT
    touching either table again: "how big is this join?" for the
    planner / skew guard from two ≤ depth·width-row sketches that may
    have been built days apart or streamed (:func:`cms_registers` is
    an update-mode streaming aggregation).

    Output: group keys + ``join_rows_est`` (bigint).  Registers must
    share ``width``/``depth`` (same hash family by construction).

    Scale shape: O(depth·width) arithmetic per group — the input data
    is never re-read."""
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1, got {width}x{depth}")
    keys = [by] if isinstance(by, str) else list(by or [])
    a = regs_a.select(*keys, "__row", "__bkt", F.col("__cnt").alias("__ca"))
    b = regs_b.select(*keys, "__row", "__bkt", F.col("__cnt").alias("__cb"))
    # inner join: a bucket missing from either sketch contributes 0.
    # products and sums run in decimal(38,0): two billion-row sides can
    # put a single bucket product past int64 (profile_table's sum uses
    # the same domain for the same reason), and the DuckDB replay
    # promotes to HUGEINT — a wrapping long would break both the
    # overestimate guarantee and the cross-engine contract
    prod = a.join(b, [*keys, "__row", "__bkt"]).select(
        *keys,
        "__row",
        (F.col("__ca").cast("decimal(38,0)") * F.col("__cb")).alias("__p"),
    )
    rows = prod.groupBy(*keys, "__row").agg(
        F.sum("__p").cast("decimal(38,0)").alias("__ip")
    )
    # a hash row with ZERO shared buckets has inner product 0 — it
    # vanishes from the inner join, so min-over-present-rows would
    # overestimate; fewer than `depth` surviving rows means the true
    # min is 0
    est = rows.groupBy(*keys).agg(
        F.when(F.count(F.lit(1)) < depth, F.lit(0).cast("long"))
        .otherwise(F.min("__ip").cast("long"))
        .alias("join_rows_est")
    )
    if not keys:
        return est
    # grouped: a group whose sketches share NO bucket on any row (or
    # that exists on only one side) vanishes from the inner join — a
    # planner iterating groups must see 0, not a missing row, so
    # re-anchor on every group present in either register table
    universe = (
        regs_a.select(*keys).unionByName(regs_b.select(*keys)).distinct()
    )
    return universe.join(est, keys, "left").select(
        *keys,
        F.coalesce("join_rows_est", F.lit(0).cast("long")).alias(
            "join_rows_est"
        ),
    )


def importance_resample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    max_keep_ppm: int = BUCKETS,
    salt: str = "isr",
) -> DataFrame:
    """Keep each row with probability PROPORTIONAL TO ITS WEIGHT — the
    resampling half of importance-weighted data selection (pair with
    :func:`~.tfidf.dsir_weights`: weight, then resample toward the
    target distribution).  Deterministic and engine-independent: a row
    survives iff ``hash(salt|key) mod 1e6 < thr`` with
    ``thr = min(max_keep_ppm, (weight · max_keep_ppm) DIV w_max)`` —
    the maximum weight ``w_max`` comes from ONE 1-row aggregate, so
    the highest-weight rows keep at ``max_keep_ppm`` (default: always)
    and everything else scales down linearly in exact bigint floor
    arithmetic.  Same key → same decision across runs, engines, and
    partitionings — reproducible corpus construction.

    ``weight_col`` must be a non-negative integral column (ppm-scaled
    weights are the house convention).  Rows with NULL weight are
    dropped (NULL thr compares false).  One narrow row-local filter —
    no shuffle, no broadcast beyond two literals."""
    if max_keep_ppm < 1 or max_keep_ppm > BUCKETS:
        raise ValueError(
            f"max_keep_ppm must be in [1, {BUCKETS}], got {max_keep_ppm}"
        )
    w_max = driver_rows(df.agg(F.max(weight_col)))[0][0]
    if w_max is None or w_max <= 0:
        return df.filter(F.lit(False))
    # least() SKIPS nulls (least(1e6, NULL) = 1e6), which would keep
    # NULL-weight rows at FULL rate — gate the null explicitly
    thr = F.when(
        F.col(weight_col).isNotNull(),
        F.least(
            F.lit(max_keep_ppm),
            F.expr(f"({weight_col} * {int(max_keep_ppm)}) DIV {int(w_max)}"),
        ),
    )
    return df.filter(_bucket(F.col(key_col), salt) < thr)


def winsorize(
    df: DataFrame,
    value_col: str,
    key_col: str,
    lo_ppm: int = 10_000,
    hi_ppm: int = 990_000,
    k: int = 256,
    by: Union[str, Sequence[str], None] = None,
    salt: str = "qsk",
    out_col: Union[str, None] = None,
) -> DataFrame:
    """Clip outliers to SKETCH-ESTIMATED quantile bounds — the robust
    preprocessing step (cap pathological token counts, clamp sensor
    glitches) at 100 TB prices: the bounds come from the deterministic
    QSK bottom-k row sample (:func:`qsk_registers` — one pruned
    shuffle, ≤ k register rows per group), the per-group (lo, hi) pair
    table is broadcast back, and the clip is a pure row expression.
    Everything is exact type-1 sample-quantile selection — no floats,
    no interpolation — so a SQL oracle replays it bit-for-bit.

    Semantics: values BELOW the ``lo_ppm`` sample quantile rise to it,
    values above ``hi_ppm`` drop to it.  NULL values pass through NULL
    (explicitly gated — ``greatest(NULL, lo)`` would silently turn
    NULLs into the lower bound, the least()-skips-nulls trap).  Groups
    with no sketch rows (all-NULL values) keep their values unclipped:
    there, ``least``/``greatest`` skipping the NULL bounds is exactly
    the wanted no-op and is the same in DuckDB.

    Output: ``df``'s columns + ``out_col`` (default
    ``f"{value_col}_w"``) — the clipped value in the input column's
    type."""
    if not (0 <= lo_ppm <= hi_ppm <= BUCKETS):
        raise ValueError(
            f"need 0 <= lo_ppm <= hi_ppm <= {BUCKETS}, "
            f"got ({lo_ppm}, {hi_ppm})"
        )
    out_col = out_col or f"{value_col}_w"
    keys = [by] if isinstance(by, str) else list(by or [])
    regs = qsk_registers(df, value_col, key_col, k=k, by=by, salt=salt)
    qs = qsk_quantiles(regs, [lo_ppm, hi_ppm], by=by)
    bounds = qs.groupBy(*keys).agg(
        F.min(
            F.when(F.col("prob_ppm") == lo_ppm, F.col("q_val"))
        ).alias("__lo"),
        F.min(
            F.when(F.col("prob_ppm") == hi_ppm, F.col("q_val"))
        ).alias("__hi"),
    )
    if keys:
        joined = df.join(F.broadcast(bounds), keys, "left")
    else:
        joined = df.crossJoin(F.broadcast(bounds))
    v = F.col(value_col)
    clip = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    )
    return joined.select(*df.columns, clip.alias(out_col))


def winsorize_bounds(
    df: DataFrame,
    value_col: str,
    key_col: str,
    lo_ppm: int = 10_000,
    hi_ppm: int = 990_000,
    k: int = 256,
    by: Union[str, Sequence[str], None] = None,
    salt: str = "qsk",
) -> dict:
    """The driver-side half of :func:`winsorize`: the per-group
    ``(lo, hi)`` clip bounds as a plain dict (``{group: (lo, hi)}``;
    keyless → ``{(): (lo, hi)}``), collected from the O(groups·2)
    quantile table — so a STREAMING pipeline can freeze bounds from a
    batch snapshot and clip row-locally
    (:func:`~..streaming.stream_winsorize`), the
    mixture_thresholds / apply_mixture_thresholds pattern."""
    if not (0 <= lo_ppm <= hi_ppm <= BUCKETS):
        raise ValueError(
            f"need 0 <= lo_ppm <= hi_ppm <= {BUCKETS}, "
            f"got ({lo_ppm}, {hi_ppm})"
        )
    keys = [by] if isinstance(by, str) else list(by or [])
    regs = qsk_registers(df, value_col, key_col, k=k, by=by, salt=salt)
    qs = qsk_quantiles(regs, [lo_ppm, hi_ppm], by=by)
    out: dict = {}
    for r in driver_rows(qs):
        g = tuple(r[c] for c in keys) if keys else ()
        g = g[0] if len(keys) == 1 else g
        lo, hi = out.get(g, (None, None))
        if r["prob_ppm"] == lo_ppm:
            lo = r["q_val"]
        if r["prob_ppm"] == hi_ppm:
            hi = r["q_val"]
        out[g] = (lo, hi)
    return out


def apply_winsorize_bounds(
    df: DataFrame,
    bounds: Mapping,
    value_col: str,
    by: Union[str, None] = None,
    out_col: Union[str, None] = None,
) -> DataFrame:
    """Apply frozen :func:`winsorize_bounds` as a pure row-local CASE
    clip — valid on batch AND streaming frames.  NULL values stay
    NULL; groups absent from ``bounds`` pass through unclipped."""
    out_col = out_col or f"{value_col}_w"
    v = F.col(value_col)
    clipped = v
    for g in sorted(bounds, key=str):
        lo, hi = bounds[g]
        expr = v
        if lo is not None:
            expr = F.greatest(expr, F.lit(lo))
        if hi is not None:
            expr = F.least(expr, F.lit(hi))
        if by is None:
            clipped = expr
            break
        clipped = F.when(F.col(by) == F.lit(g), expr).otherwise(clipped)
    return df.select(
        "*", F.when(v.isNotNull(), clipped).alias(out_col)
    )


def temporal_split(
    df: DataFrame,
    boundaries: Sequence[int],
    embargo_ns: int = 0,
    ts_col: str = "ts",
    labels: Sequence[str] = ("train", "val", "test"),
) -> DataFrame:
    """Walk-forward temporal split with a purge embargo — the
    time-series counterpart of :func:`hash_split`: rows partition into
    consecutive time segments at the given boundaries (``len(labels)
    - 1`` sorted cut points; segment i is ``[b_{i-1}, b_i)``), and
    rows inside the ``embargo_ns`` window BEFORE each boundary are
    DROPPED — the standard purged walk-forward guard (a sample whose
    temporal neighborhood straddles the cut leaks target information
    across the split; the embargo removes the straddle zone).

    Appends ``split``; embargoed rows are absent from the output.
    Pure expression — one CASE chain, no shuffle, no state; Catalyst
    pushes the embargo filter into the scan."""
    labels = list(labels)
    bs = [int(b) for b in boundaries]
    if len(bs) != len(labels) - 1:
        raise ValueError(
            f"need len(labels)-1 boundaries, got {len(bs)} for "
            f"{len(labels)} labels"
        )
    if bs != sorted(bs) or len(set(bs)) != len(bs):
        raise ValueError("boundaries must be strictly increasing")
    if embargo_ns < 0:
        raise ValueError(f"embargo_ns must be >= 0, got {embargo_ns}")
    t = F.col(ts_col).cast("long")
    keep = F.lit(True)
    for b in bs:
        keep = keep & ~((t >= b - embargo_ns) & (t < b))
    split = F.lit(labels[-1])
    for b, lab in zip(reversed(bs), reversed(labels[:-1])):
        split = F.when(t < b, F.lit(lab)).otherwise(split)
    return df.filter(keep).withColumn("split", split)
