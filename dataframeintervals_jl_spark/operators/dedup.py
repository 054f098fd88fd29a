"""Deduplication operators for training-data pipelines.

Four families, each shuffle-conscious for the 100 TB case:

- exact: hash-groupBy on a content fingerprint — one shuffle on a short
  key (never on the raw text);
- MinHash + LSH: shingle → minhash signature → band → bucket equi-join —
  near-dup candidate pairs WITHOUT the O(n²) cross join;
- SimHash: 64-bit weighted fingerprint, hamming-bucketed;
- n-gram Jaccard: exact verification on candidate pairs only.

Everything is built from Spark built-ins (xxhash64, transform,
aggregate, explode, groupBy) — no Python on the hot path.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import driver_count, driver_row, driver_rows

from ..functions.text import content_hash, portable_hash60, shingles
from ..sources import ensure_parallelism

# deterministic hash family h_i(x) = (a_i*x + b_i) mod M.  The domain is
# kept at 31 bits and a_i < 2^30 so a_i*x + b_i < 2^62 — Spark 4 runs in
# ANSI mode, where a silent long overflow is an ARITHMETIC_OVERFLOW error.
_MOD = (1 << 31) - 1
_COEF = 1 << 30

# polynomial band-fold constants for the portable path (two independent
# 31-bit folds joined together ≈ 62-bit band key; pure arithmetic both
# engines compute identically — acc < M < 2^31, B < 2^30 keeps every
# intermediate acc*B + h under 2^61, inside ANSI long range)
_FOLD_BASES = (1_000_003, 356_735_609)


def _hash_family(num: int) -> list[tuple[int, int]]:
    """Deterministic pseudo-random (a, b) pairs via splitmix64 steps."""
    pairs = []
    state = 0x9E3779B97F4A7C15
    for _ in range(num):
        out = []
        for _ in range(2):
            state = (state + 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
            z = state
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
            out.append((z ^ (z >> 31)) % _COEF)
        pairs.append((out[0] or 1, out[1]))
    return pairs


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of identical content: ``(content_hash, keep_id, n_dups)``.

    ``keep_id`` = min id per group (deterministic survivor).  The
    shuffle key is the 32-hex digest, not the document — at 100 TB the
    map side projects (hash, id) only, so shuffle volume is tiny."""
    return df.groupBy(content_hash(F.col(text_col)).alias("h")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n")
    )


def exact_dedup_keep(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The surviving rows themselves (first id per identical content)."""
    keep = exact_dedup(df, text_col, id_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """(id, sig: array<bigint>) — minhash over word-shingle hashes.

    sig[i] = min over shingles of (a_i * h + b_i mod M); computed with
    ``transform``+``aggregate`` array expressions, fully JVM-side.
    ``portable=True`` uses the md5-based :func:`portable_hash60` base
    hash (DuckDB-recomputable) instead of xxhash64."""
    return _with_minhash_sig(
        ensure_parallelism(df).select(F.col(id_col), F.col(text_col)),
        text_col,
        num_hashes,
        shingle_k,
        portable,
    ).select(id_col, F.col("__dfi_sig").alias("sig"))


def _with_minhash_sig(
    df: DataFrame,
    text_col: str,
    num_hashes: int,
    shingle_k: int,
    portable: bool,
) -> DataFrame:
    """All input columns + ``__dfi_sig`` (array<long> minhash
    signature).  Two projection steps so the shingle hashing is
    computed once, not once per signature slot."""
    sh = F.array_distinct(shingles(F.col(text_col), shingle_k))
    if portable:
        hashed = F.transform(sh, lambda s: portable_hash60(s) % _MOD)
    else:
        hashed = F.transform(sh, lambda s: F.abs(F.xxhash64(s)) % _MOD)
    family = _hash_family(num_hashes)

    # `num_hashes` array_min(transform(...)) passes over the hashed
    # shingle array.  NOTE: a "smarter" single-aggregate shape with an
    # array<long> accumulator and zip_with against a struct-array of
    # (a_i, b_i) coefficients measured ~35x MORE cpu — nested
    # higher-order functions with struct field access fall out of
    # codegen into interpreted evaluation, while these flat
    # transform/array_min chains stay compiled.  Keep the flat shape.
    def _affine(a: int, b: int):
        # closure factory: F.transform inspects the lambda's arity, so
        # the per-hash coefficients can't ride along as default args
        return lambda h: (h * F.lit(a) + F.lit(b)) % _MOD

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__dfi_sh"), _affine(a, b)))
            for a, b in family
        ]
    )
    return (
        df.withColumn("__dfi_sh", hashed)
        .withColumn("__dfi_sig", sig)
        .drop("__dfi_sh")
    )


def _band_fold(sig_col, b: int, rows: int, base: int):
    """Polynomial fold of one band's signature values mod _MOD."""
    acc = F.lit(0).cast("long")
    for r in range(rows):
        acc = (acc * base + sig_col[b * rows + r]) % _MOD
    return acc


def _band_key_array(sig_col, num_hashes: int, bands: int, portable: bool):
    """array<long> of the ``bands`` LSH band-bucket keys of a minhash
    signature column — the row-local fold shared by every banding
    consumer."""
    rows = num_hashes // bands
    if portable:
        return F.array(
            *[
                _band_fold(sig_col, b, rows, _FOLD_BASES[0])
                * (_MOD + 1)  # pack the two 31-bit folds into one long
                + _band_fold(sig_col, b, rows, _FOLD_BASES[1])
                for b in range(bands)
            ]
        )
    return F.array(
        *[
            F.xxhash64(
                F.concat_ws(",", *[sig_col[b * rows + r] for r in range(rows)])
            )
            for b in range(bands)
        ]
    )


def with_minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    portable: bool = False,
    out_col: str = "__bk",
) -> DataFrame:
    """All input columns + ``out_col``: the array<long> of LSH band
    keys — the column-preserving form of :func:`minhash_banded` for
    operators that must keep the document row intact (the streaming
    probe).  Two projection steps so the shingle hashing is computed
    once, not once per signature slot."""
    assert num_hashes % bands == 0
    return (
        _with_minhash_sig(df, text_col, num_hashes, shingle_k, portable)
        .withColumn(
            out_col, _band_key_array(F.col("__dfi_sig"), num_hashes, bands, portable)
        )
        .drop("__dfi_sig")
    )


def minhash_banded(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """(id, band, bh) band-bucket rows — the LSH banding projection
    shared by the batch pair join (:func:`minhash_lsh_pairs`) and the
    streaming candidate operator
    (:func:`~..streaming.stream_minhash_candidates`).  Pure projection
    (signatures + band folds are row-local expressions), so it works
    unchanged on a streaming input."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k, portable)
    band_key = _band_key_array(F.col("sig"), num_hashes, bands, portable)
    return sigs.select(
        F.col(id_col),
        F.posexplode(band_key).alias("band", "bh"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    portable: bool = False,
    max_bucket: Union[int, None] = None,
) -> DataFrame:
    """Near-dup candidate pairs (id_a < id_b, n_shared_bands).

    Band the signature (rows = num_hashes/bands per band), bucket-join
    on (band_idx, band_hash).  The equi-join shuffles on the band hash —
    horizontally scalable, no cross join.  Downstream verification (true
    Jaccard) runs only on candidates.

    ``portable=True`` makes the whole candidate generation
    DuckDB-recomputable: md5-based base hash + two polynomial band
    folds (≈62-bit combined key) instead of xxhash64.

    ``max_bucket`` is the HOT-BUCKET guard for degenerate corpora: a
    band bucket shared by w documents (empty texts, boilerplate, exact
    template spam) emits w·(w-1)/2 pairs — quadratic INSIDE one bucket,
    the one place AQE's skew split can only spread, not shrink, the
    work.  With ``max_bucket`` set, buckets wider than it are DROPPED
    from pair generation and a warning reports how many buckets/rows
    were skipped (no silent caps).  Dropping is the honest mitigation:
    every member of a degenerate bucket collides in all its other
    bands too (near-identical docs agree on most bands), so real
    duplicate clusters keep their edges through the surviving buckets,
    while salting would still emit every within-bucket pair.  NOTE:
    with ``max_bucket`` set, ``n_shared_bands`` counts SURVIVING
    buckets only — a pair that additionally collided in a dropped
    bucket reports a lower count, so a ``min n_shared_bands``
    threshold applied downstream is conservative (under-counts, never
    over-counts) on corpora that trip the guard.  Default ``None`` =
    exact reference semantics (required by the catalog oracles, which
    replay every pair)."""
    assert num_hashes % bands == 0
    banded = minhash_banded(
        df, text_col, id_col, num_hashes, bands, shingle_k, portable
    )
    # persist is load-bearing, not a cache hint: without a materialization
    # boundary CollapseProject inlines the whole signature aggregate into
    # every band-hash expression (x bands) and the self-join doubles it
    # again — measured 8-20x the work at sf0.1.  The persisted table is
    # 3 longs x (docs x bands) rows, MEMORY_AND_DISK, negligible at any
    # scale relative to the corpus itself.
    banded = banded.persist()
    # eager: both self-join sides otherwise race the cold cache and each
    # computes the signatures (bimodal 4x timings observed at sf0.1)
    driver_count(banded)
    if max_bucket is not None:
        if max_bucket < 2:
            raise ValueError(f"max_bucket must be >= 2, got {max_bucket}")
        # one partial agg over the (already persisted) banded table —
        # O(buckets) output; the wide set is tiny by construction, so
        # the exclusion is a broadcast anti-join (map-side, no shuffle
        # of the banded table)
        wide = (
            banded.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("__w"))
            .filter(F.col("__w") > max_bucket)
        )
        stats = driver_row(
            wide.agg(
                F.count(F.lit(1)).alias("n"), F.sum("__w").alias("rows")
            )
        )
        if stats["n"]:
            import warnings

            warnings.warn(
                f"minhash_lsh_pairs: dropping {stats['n']} band bucket(s) "
                f"wider than max_bucket={max_bucket} "
                f"({stats['rows']} banded rows) from pair generation — "
                "pairs exclusively within those buckets are NOT emitted",
                stacklevel=2,
            )
            banded = banded.join(
                F.broadcast(wide.select("band", "bh")),
                ["band", "bh"],
                "left_anti",
            )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard similarity on candidate (id_a, id_b) pairs.

    Joins the shingle sets back onto the (small) candidate list —
    verification cost is O(candidates), not O(n²)."""
    # persisted: referenced twice (id_a and id_b sides) — without the
    # boundary the shingle pass over the full corpus runs twice
    sh = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.array_distinct(shingles(F.col(text_col), shingle_k)).alias("sh"),
        )
        .persist()
    )
    driver_count(sh)  # eager — both candidate-join sides read it concurrently
    out = (
        candidates.join(
            sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
        )
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double")
            ).alias("jaccard"),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def jaccard_similarity_join(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """EXACT n-gram Jaccard set-similarity self-join: every (id_a <
    id_b) pair with ``J >= threshold``, with NO approximation — the
    deterministic counterpart of :func:`minhash_lsh_pairs` (which can
    miss pairs).

    Scale path is PREFIX FILTERING (Chaudhuri et al., SSJoin; Xiao et
    al., PPJoin): order each document's shingle set by ascending global
    frequency (rarest first, ties on the shingle itself — a total
    order), keep only the first ``|S| - ceil(t*|S|) + 1`` shingles, and
    equi-join on those prefix shingles.  Two sets with ``J >= t`` MUST
    share a prefix shingle, so the block generation is lossless; the
    frequency ordering keeps ubiquitous shingles out of prefixes, so
    unrelated documents rarely collide.  A symmetric length filter
    (``t*|A| <= |B| <= |A|/t``) prunes candidates before verification;
    exact Jaccard then runs on candidates only
    (:func:`ngram_jaccard_pairs`).

    Shuffle profile: one shuffle on the shingle for the frequency
    aggregate, one on the id for the per-document ordering, one on the
    prefix shingle for the candidate join, then the verification's
    candidate-sized joins — all equi-joins, no cross join anywhere.
    Float guards: prefix length and length filter are biased by 1e-9
    toward KEEPING candidates, so IEEE rounding can only add a
    candidate (harmless — verification is exact), never drop a true
    pair."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("jaccard_similarity_join: threshold must be in (0, 1]")
    sh = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(shingles(F.col(text_col), shingle_k))
            ).alias("sh"),
        )
        .persist()
    )
    driver_count(sh)  # eager: read by the frequency agg AND the ordering join
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__dfi_f"))
    ordered = (
        sh.join(freq, "sh")
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("__dfi_f", "sh"))).alias("__dfi_o"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    prefix_len = (
        F.col("sz")
        - F.ceil(F.col("sz") * F.lit(float(threshold)) - F.lit(1e-9))
        + F.lit(1)
    ).cast("int")
    prefix = ordered.select(
        F.col(id_col),
        "sz",
        F.posexplode(F.slice("__dfi_o", F.lit(1), prefix_len)).alias(
            "__dfi_pos", "__dfi_p"
        ),
    ).select(
        id_col,
        "sz",
        # 1-based position of the shingle in the doc's global order —
        # feeds the PPJoin positional filter below
        (F.col("__dfi_pos") + 1).alias("__dfi_pos"),
        F.col("__dfi_p.sh").alias("sh"),
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"),
        F.col("sz").alias("__sz_a"),
        F.col("__dfi_pos").alias("__pos_a"),
        "sh",
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"),
        F.col("sz").alias("__sz_b"),
        F.col("__dfi_pos").alias("__pos_b"),
        "sh",
    )
    eps = F.lit(1e-9)
    # PPJoin positional filter (Xiao et al., WWW'08): J >= t  <=>
    # overlap >= t/(1+t) * (|A|+|B|).  A prefix match at positions
    # (pa, pb) bounds the achievable overlap by
    # 1 + min(|A|-pa, |B|-pb) (everything after the matched element,
    # plus the match itself); pairs whose bound cannot reach the
    # overlap threshold are pruned before the distinct/verify stages.
    # The bound is biased by eps toward KEEPING candidates, so IEEE
    # rounding can only add a candidate, never drop a true pair.
    o_req = (
        (F.col("__sz_a") + F.col("__sz_b")).cast("double")
        * F.lit(float(threshold) / (1.0 + float(threshold)))
        - eps
    )
    o_bound = 1 + F.least(
        F.col("__sz_a") - F.col("__pos_a"), F.col("__sz_b") - F.col("__pos_b")
    )
    cand = (
        a.join(b, "sh")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("__sz_a") >= F.col("__sz_b") * F.lit(float(threshold)) - eps)
            & (F.col("__sz_b") >= F.col("__sz_a") * F.lit(float(threshold)) - eps)
            & (o_bound.cast("double") >= o_req)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    return ngram_jaccard_pairs(
        df, cand, text_col=text_col, id_col=id_col,
        shingle_k=shingle_k, threshold=threshold,
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """SimHash fingerprints: (id, simhash bigint).

    Per token-hash, each bit votes +1/-1; the sign of each bit-sum forms
    the fingerprint.  Implemented as array expressions over the token
    list (aggregate over bit positions).  ``portable=True`` uses the
    md5-based 60-bit token hash (and caps ``bits`` at 60) so a DuckDB
    oracle recomputes identical fingerprints."""
    if portable:
        bits = min(bits, 60)
    toks = F.array_distinct(
        F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
    )
    if portable:
        th = F.transform(toks, lambda t: portable_hash60(t))
    else:
        th = F.transform(toks, lambda t: F.xxhash64(t))
    # ONE aggregate pass with an array<int> accumulator (the naive
    # per-bit formulation is `bits` separate aggregates, i.e. `bits`
    # traversals of the token array — measured 64x the work)
    zero = F.array(*[F.lit(0) for _ in range(bits)])
    bit_sums = F.aggregate(
        th,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                    for i in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    # materialize the bit-sum array in its own projection: the fp
    # assembly references it `bits` times, and CollapseProject keeps the
    # boundary because the aggregate is non-cheap — without it the whole
    # token traversal would be inlined once per bit.
    sums = ensure_parallelism(df).select(F.col(id_col), bit_sums.alias("__dfi_bs"))
    # assemble the fingerprint bit-by-bit (shiftleft needs a literal
    # shift amount, so this is a python loop over fixed bit positions;
    # bit 63 is the long sign bit → its literal is -(2^63))
    fp = F.lit(0).cast("long")
    for i in range(bits):
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        fp = fp.bitwiseOR(
            F.when(F.col("__dfi_bs")[i] > 0, F.lit(bit_val))
            .otherwise(F.lit(0))
            .cast("long")
        )
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into ``blocks``
    chunks; any pair within distance ``max_hamming < blocks`` agrees on
    ≥1 chunk, so an equi-join per chunk finds all candidates without a
    cross join; exact popcount verifies.  With ``portable=True`` the
    fingerprint is the 60-bit md5-based variant (top 4 bits zero —
    block layout over 64 bits is unchanged and still exhaustive)."""
    fps = simhash(df, text_col, id_col, portable=portable)
    width = 64 // blocks
    chunked = fps.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.blk", "c.key")
    # materialization boundary: stops the fingerprint aggregate from
    # being inlined per chunk and recomputed on both self-join sides
    chunked = chunked.persist()
    driver_count(chunked)  # eager — see minhash_lsh_pairs
    a = chunked.alias("a")
    b = chunked.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    hamming = F.bit_count(xor)
    # emit-once guard instead of a trailing .distinct() (one fewer
    # shuffle): a pair agrees on block i iff the xor's block-i bits are
    # all zero, so emit the pair only from its LOWEST agreeing block —
    # computable from the xor alone, no extra state.
    mask = (1 << width) - 1
    lowest_agreeing = F.lit(blocks - 1)
    for i in reversed(range(blocks - 1)):
        blk_bits = F.shiftright(xor, i * width).bitwiseAND(F.lit(mask))
        lowest_agreeing = F.when(blk_bits == 0, F.lit(i)).otherwise(lowest_agreeing)
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("a.blk") == lowest_agreeing),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over an undirected edge list: one row per
    vertex appearing in ``pairs``, labeled ``cluster_id`` = the minimum
    vertex id reachable from it.  This is the step that turns near-dup
    PAIRS (minhash/simhash/embedding) into duplicate CLUSTERS a pipeline
    can act on (keep one representative per cluster).

    Execution: iterative min-label propagation with POINTER JUMPING —
    each round first takes ``label(v) <- min(label(v), min label of
    neighbors)`` (join + groupBy), then path-halves with
    ``label(v) <- label(label(v))`` (labels are always vertex ids, so
    the jump is a self-join on the label key).  Propagation alone needs
    O(component diameter) rounds — measured 14 on chain-shaped near-dup
    components — while the jump compresses paths so the effective
    diameter halves per round: O(log d) rounds, each shuffling only
    (vertex, label) pairs, never vectors or documents.  The driver loop
    checks a single summed-change counter per round (tiny agg action)
    and stops at fixpoint — the same driver-coordinated-iteration shape
    as the IVF k-means trainer.  Deterministic (min is
    order-insensitive), hence oracle-checkable against a recursive-CTE
    reachability query.
    """
    # the edge input is typically a candidate-join pipeline (LSH bands,
    # simhash blocks, ...); materialize it ONCE — the union below reads
    # it twice, and lazy persist would let the two branches race the
    # cold cache inside one job
    spark = pairs.sparkSession
    pairs = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    n_edges = driver_count(pairs)

    if n_edges <= driver_threshold:
        # SMALL-GRAPH FALLBACK: near-dup edge lists are typically many
        # orders of magnitude smaller than the corpus (dedup pairs are
        # the exception, not the rule).  Below the threshold (~16 MB of
        # ids at 1M edges) a driver-side union-find beats the iterative
        # path outright: label propagation costs O(log d) ROUNDS of
        # cluster-wide jobs, and per-round scheduling overhead dwarfs
        # the data movement for small graphs.  Same bounded-driver-state
        # trade as the IVF k-means trainer; the distributed path below
        # remains the 100 TB route and computes the identical labels.
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while x != root:  # path compression
                nxt = parent[x]
                parent[x] = root
                x = nxt
            return root

        # collect, not toLocalIterator: the row volume is bounded by the
        # threshold, and toLocalIterator pays one driver round-trip per
        # partition (candidate joins leave 32-64 mostly-empty ones)
        for row in pairs.collect():
            ra, rb = find(row[0]), find(row[1])
            if ra != rb:
                # attach the larger root under the smaller, so every
                # root is its component's minimum id (= the oracle's
                # min-reachable label)
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
            parent.setdefault(ra, ra)
            parent.setdefault(rb, rb)
        out = spark.createDataFrame(
            [(v, find(v)) for v in parent],
            schema="v long, cluster_id long",
        )
        pairs.unpersist()
        return out

    e = (
        pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    # localCheckpoint (eager), NOT persist: round n's plan references
    # round n-1's labels twice (neighbor-min + outer join), so without
    # lineage truncation the logical plan doubles every round and
    # Catalyst analysis goes exponential around round ~10 (a 12-hop
    # chain hung; with checkpointing it is linear).
    labels = (
        e.select(F.col("a").alias("v"), F.col("a").alias("lbl"))
        .distinct()
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # neighbor minimum, then keep the smaller of (own, neighbors)
        nbr = (
            e.join(labels, e["b"] == labels["v"])
            .select(e["a"].alias("v"), F.col("lbl"))
            .groupBy("v")
            .agg(F.min("lbl").alias("nmin"))
        )
        cand = labels.join(nbr, "v", "left").select(
            "v",
            F.least(F.col("lbl"), F.col("nmin")).alias("lbl"),
            F.col("lbl").alias("old"),
        )
        # pointer jump: label(v) <- label(label(v)).  Labels are vertex
        # ids and label(l) <= l monotonically, so one extra self-join on
        # the label key halves every path — without it, chain components
        # converge only after diameter rounds.
        lk = cand.select(F.col("v").alias("lv"), F.col("lbl").alias("llbl"))
        new_labels = (
            cand.join(lk, cand["lbl"] == lk["lv"], "left")
            .select(
                "v",
                F.least(F.col("lbl"), F.col("llbl")).alias("lbl"),
                (F.least(F.col("lbl"), F.col("llbl")) < F.col("old"))
                .cast("long")
                .alias("chg"),
            )
            .localCheckpoint()
        )
        changed = driver_row(new_labels.agg(F.sum("chg")))[0] or 0
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    e.unpersist()
    pairs.unpersist()
    return labels.select(F.col("v"), F.col("lbl").alias("cluster_id"))


def dedup_cluster_keep(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one representative per duplicate CLUSTER (transitive
    closure of the pair relation), not merely per pair: rows never
    mentioned in ``pairs`` survive untouched; within each component the
    row with the minimum id survives.  One broadcast-friendly join of
    the (tiny) non-representative id set against the corpus."""
    comp = connected_components(pairs, src, dst)
    drop = comp.filter(F.col("v") != F.col("cluster_id")).select(
        F.col("v").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    min_overlap: int = 1,
    portable: bool = False,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, count the
    distinct word ``shingle_k``-grams it shares with an evaluation
    corpus, and flag documents at or above ``min_overlap`` shared
    n-grams as contaminated (the standard train/test-leak filter for
    training corpora; the reference has no text layer — SURVEY.md §2.C).

    Output: one row per corpus document — ``id_col``, ``n_overlap``
    (bigint, 0 when clean), ``contaminated`` (boolean).

    Scale design (100 TB corpus, MB-scale eval set): the eval side's
    distinct shingle-hash table is tiny and is BROADCAST, so the
    corpus-side pass is map-only (shingle → hash → broadcast semi-join
    → partial count); the only shuffles are the per-doc count over the
    *hit* rows (usually a vanishing fraction of the corpus) and the
    final id left-join, whose small side AQE broadcasts.  Shingles are
    joined as 64-bit hashes, never as strings — ``portable=True`` swaps
    xxhash64 for the md5-prefix hash a SQL oracle can recompute
    (:func:`..functions.text.portable_hash60`).
    """
    hash_fn = portable_hash60 if portable else F.xxhash64
    sh_of = lambda d: F.explode(  # noqa: E731
        F.array_distinct(shingles(F.col(text_col), shingle_k))
    )
    ev_sh = (
        eval_df.select(sh_of(eval_df).alias("__s"))
        .select(hash_fn(F.col("__s")).alias("__sh"))
        .distinct()
    )
    corp_sh = ensure_parallelism(corpus).select(
        F.col(id_col), sh_of(corpus).alias("__s")
    ).select(id_col, hash_fn(F.col("__s")).alias("__sh"))
    hits = (
        corp_sh.join(F.broadcast(ev_sh), "__sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    n = F.coalesce(F.col("n_overlap"), F.lit(0).cast("long"))
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            n.alias("n_overlap"),
            (n >= F.lit(min_overlap)).alias("contaminated"),
        )
    )


def contamination_spans(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    portable: bool = False,
    merge_touching: bool = True,
) -> DataFrame:
    """SPAN-LEVEL decontamination report: instead of
    :func:`decontaminate`'s per-document flag, the exact TOKEN RANGES
    of each corpus document that overlap the evaluation set — so a
    pipeline can surgically excise leaked passages (the Lee/Brown
    "remove the contaminated span, keep the document" policy) rather
    than drop whole documents.

    Per document: every word ``shingle_k``-gram whose hash appears in
    the eval set's shingle table becomes the token span
    ``[pos, pos+k)``; overlapping/touching hit spans are coalesced by
    the engine's own interval algebra (:func:`~.coalesce.merge_spans`
    on the token-ordinal domain).  Output: ``id_col`` + ``span``
    (struct<start,stop> token offsets, 0-based half-open) +
    ``n_spans`` (hit grams merged into the island) — one row per
    maximal contaminated region; clean documents are absent.

    Scale shape: identical to :func:`decontaminate` — the eval shingle
    hash table broadcasts, the corpus pass is map-only, and only HIT
    grams (a vanishing fraction) reach the per-document merge, which
    is a window over each document's own hits.  Documents shorter than
    ``shingle_k`` tokens match as one whole-text gram spanning
    ``[0, n_tokens)``, mirroring :func:`~..functions.text.shingles`."""
    from ..functions.spans import make_span
    from ..functions.text import tokens
    from .coalesce import merge_spans

    hash_fn = portable_hash60 if portable else F.xxhash64
    ev = (
        eval_df.select(
            F.explode(
                F.array_distinct(shingles(F.col(text_col), shingle_k))
            ).alias("__s")
        )
        .select(hash_fn(F.col("__s")).alias("__sh"))
        .distinct()
    )
    toks_n = F.size(tokens(F.col(text_col)))
    grams = ensure_parallelism(corpus).select(
        F.col(id_col),
        toks_n.alias("__n"),
        F.posexplode(shingles(F.col(text_col), shingle_k)).alias(
            "__i", "__s"
        ),
    )
    hits = (
        grams.join(
            F.broadcast(ev),
            hash_fn(F.col("__s")) == F.col("__sh"),
            "left_semi",
        )
        # zero-token documents produce shingles()' degenerate empty
        # gram; a zero-width [0, 0) "contaminated region" is
        # meaningless — no tokens, nothing to excise — so drop it
        .filter(F.col("__n") > 0)
        .select(
            id_col,
            make_span(
                F.col("__i"),
                F.least(F.col("__i") + F.lit(int(shingle_k)), F.col("__n")),
            ).alias("span"),
        )
        .distinct()
    )
    return merge_spans(
        hits, "span", by=id_col, merge_touching=merge_touching
    )


def duplicate_spans(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    min_docs: int = 2,
    max_docs: Union[int, None] = None,
    portable: bool = False,
    merge_touching: bool = True,
) -> DataFrame:
    """CORPUS-INTERNAL duplicate-span report: per document, the
    maximal TOKEN RANGES whose word ``shingle_k``-grams also occur in
    at least ``min_docs`` distinct documents (the document itself
    included) — the gram-granular Spark shape of the suffix-array
    self-dedup in Lee et al., "Deduplicating Training Data Makes
    Language Models Better": find the boilerplate/template passages
    duplicated ACROSS the corpus so they can be excised while the
    documents are kept.  The corpus-facing counterpart of
    :func:`contamination_spans` (which matches an external eval set);
    the reference has no text layer at all (SURVEY.md §2.C).

    Semantics (pinned for the oracle): a token position ``i`` of a
    document is duplicated when the exact word gram ``tokens[i:i+k]``
    appears in ``>= min_docs`` distinct documents (within-document
    repetition alone does NOT qualify — doc counts are DISTINCT);
    hit positions become spans ``[i, i+k)`` and overlapping/touching
    spans coalesce into islands exactly as
    :func:`~.coalesce.merge_spans` would.  Output: ``id_col`` +
    ``span`` (struct<start,stop>, 0-based half-open token offsets) +
    ``n_spans`` (hit grams merged into the island) +
    ``n_docs_sharing`` (the MAX distinct-doc count among the island's
    grams — how hot its hottest passage is).  Documents shorter than
    ``shingle_k`` tokens participate as one whole-text gram spanning
    ``[0, n_tokens)`` (two short identical documents flag each other
    entirely); zero-token documents emit nothing.  ``max_docs`` is an
    optional REPORTING ceiling — grams in more than ``max_docs``
    documents are excluded (e.g. to separate rare template reuse from
    corpus-wide boilerplate); it is a semantic filter, not a
    performance guard.

    Scale shape (100 TB): two map-only passes over the corpus — one
    into a partial-aggregated distinct-doc count per gram HASH (never
    the gram string), one probing that count table with an equi-join
    on the hash.  The count side is pre-filtered to duplicated grams
    (``>= min_docs``) BEFORE the join, so the join's build side is the
    duplicated-gram fraction only; a corpus-wide hot gram is w probe
    rows against ONE build row — linear, no within-bucket quadratic
    hazard (unlike LSH band buckets, which pair rows), so no
    ``max_bucket``-style cap is needed.  The island merge is a window
    over each document's own hits.  ``portable=True`` swaps xxhash64
    for the md5-prefix hash a SQL oracle recomputes exactly."""
    from ..functions.spans import make_span

    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if max_docs is not None and max_docs < min_docs:
        raise ValueError(
            f"max_docs ({max_docs}) must be >= min_docs ({min_docs})"
        )
    hash_fn = portable_hash60 if portable else F.xxhash64
    grams = _doc_grams(corpus, text_col, id_col, shingle_k, hash_fn)

    cnt_pred = F.col("n_docs_sharing") >= F.lit(int(min_docs))
    if max_docs is not None:
        cnt_pred = cnt_pred & (F.col("n_docs_sharing") <= F.lit(int(max_docs)))
    dup_grams = (
        grams.groupBy("__h")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs_sharing"))
        .filter(cnt_pred)
    )
    hits = grams.join(dup_grams, "__h").select(
        id_col,
        make_span(
            F.col("__i"),
            F.least(F.col("__i") + F.lit(int(shingle_k)), F.col("__n")),
        ).alias("span"),
        "n_docs_sharing",
    )
    return _merge_hit_islands(hits, id_col, merge_touching)


def _doc_grams(
    corpus: DataFrame, text_col: str, id_col: str, shingle_k: int, hash_fn
) -> DataFrame:
    """(id, __n token count, __i position, __h gram hash) rows of a
    corpus — the posexplode'd k-gram stream :func:`duplicate_spans`
    and :func:`incremental_duplicate_spans` both probe with; the gram
    STRING is hashed away immediately (only 64-bit hashes ever reach
    a shuffle).  Zero-token documents are dropped (their degenerate
    whole-text gram spans nothing)."""
    from ..functions.text import tokens

    return ensure_parallelism(corpus).select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("__n"),
        F.posexplode(shingles(F.col(text_col), shingle_k)).alias(
            "__i", "__s"
        ),
    ).select(
        id_col, "__n", "__i", hash_fn(F.col("__s")).alias("__h")
    ).filter(F.col("__n") > 0)


def _merge_hit_islands(
    hits: DataFrame, id_col: str, merge_touching: bool
) -> DataFrame:
    """Coalesce per-document hit spans ``(id_col, span,
    n_docs_sharing)`` into maximal islands — merge_spans' keyed plan
    (coalesce.py:88-103) plus the max-sharing aggregate merge_spans
    does not carry.  One shuffle on the doc id; islands per doc are
    few by construction."""
    from pyspark.sql import Window

    from ..functions.spans import make_span
    from .coalesce import _ISL, _break_expr

    start = F.col("span").getField("start")
    stop = F.col("span").getField("stop")
    w = Window.partitionBy(id_col).orderBy(start, stop)
    pmax = F.max(stop).over(w.rowsBetween(Window.unboundedPreceding, -1))
    isl = F.sum(_break_expr(start, pmax, merge_touching)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hits.select(
            id_col, F.col("span"), "n_docs_sharing", isl.alias(_ISL)
        )
        .groupBy(id_col, _ISL)
        .agg(
            F.min(start).alias("__s"),
            F.max(stop).alias("__e"),
            F.count(F.lit(1)).alias("n_spans"),
            F.max("n_docs_sharing").alias("n_docs_sharing"),
        )
        .select(
            id_col,
            make_span(F.col("__s"), F.col("__e")).alias("span"),
            "n_spans",
            "n_docs_sharing",
        )
    )


def write_gram_index(
    docs: DataFrame,
    table: str,
    n_buckets: int = 64,
    path: Union[str, None] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    portable: bool = False,
    mode: str = "overwrite",
) -> None:
    """Persist the corpus' gram-hash doc-count table ``(__h, n_docs)``
    — the index that makes :func:`duplicate_spans` INCREMENTAL: each
    new batch probes this table for its duplicated-against-history
    token ranges instead of re-scanning history text.

    Layout: hash-BUCKETED by ``__h`` (sorted within buckets) and
    registered as ``table`` — the probe join's big side is
    pre-partitioned on disk, so only the increment moves.  One row per
    DISTINCT gram in the corpus (vocabulary-of-grams-sized, far below
    the corpus).  ``mode='append'`` accepts later batches' counts:
    with the DISJOINT-ID contract (each document indexed exactly once
    — same contract as :func:`write_minhash_index` appends) per-hash
    counts from different segments simply ADD, and the probe sums
    segments per hash over HIT rows only.  The gram parameters
    (``shingle_k``/``portable``) are part of the index identity, like
    the minhash index's banding parameters."""
    from ..sources.sinks import write_bucketed

    hash_fn = portable_hash60 if portable else F.xxhash64
    counts = (
        _doc_grams(docs, text_col, id_col, shingle_k, hash_fn)
        .groupBy("__h")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    )
    write_bucketed(
        counts, table, ["__h"], n_buckets, sort_cols=["__h"], path=path,
        mode=mode,
    )


def incremental_duplicate_spans(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    min_docs: int = 2,
    portable: bool = False,
    merge_touching: bool = True,
    broadcast_increment: bool = True,
) -> DataFrame:
    """Span report of NEW documents against INDEXED history
    (:func:`write_gram_index`): per increment document, the maximal
    token ranges whose gram appears in at least ``min_docs - 1``
    history documents — the new document itself supplies the
    ``min_docs``-th copy, so ``n_docs_sharing`` (history + 1) lines up
    with :func:`duplicate_spans`' batch semantics.  The
    ingest-time "is this passage already in the corpus?" probe.

    Plan shape (the incremental-dedup shape, same as
    :func:`incremental_minhash_dedup`): the increment's gram stream
    broadcasts (``broadcast_increment=True``, the common small-batch
    case) against the bucketed index — history is read in place,
    NEVER reshuffled; with it false the increment shuffles into the
    index's bucket layout.  Only HIT grams reach the per-(doc,
    position) segment-sum (bounded by increment hits × index
    segments) and the per-document island merge.  Increment documents
    are not paired against EACH OTHER (run :func:`duplicate_spans`
    within the batch when batches self-duplicate), and ids must be
    disjoint from history's."""
    from ..functions.spans import make_span

    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    hash_fn = portable_hash60 if portable else F.xxhash64
    grams = _doc_grams(new_docs, text_col, id_col, shingle_k, hash_fn)
    probe = F.broadcast(grams) if broadcast_increment else grams
    hits = (
        index.select("__h", "n_docs")
        .join(probe, "__h")
        # appended indexes hold one row per (segment, hash): disjoint
        # ids mean history counts ADD across segments
        .groupBy(id_col, "__n", "__i")
        .agg(F.sum("n_docs").alias("__hist"))
        .filter(F.col("__hist") >= F.lit(int(min_docs) - 1))
        .select(
            id_col,
            make_span(
                F.col("__i"),
                F.least(F.col("__i") + F.lit(int(shingle_k)), F.col("__n")),
            ).alias("span"),
            (F.col("__hist") + F.lit(1)).alias("n_docs_sharing"),
        )
    )
    return _merge_hit_islands(hits, id_col, merge_touching)


def bloom_decontaminate_rowlocal(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    min_overlap: int = 1,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    portable: bool = False,
) -> DataFrame:
    """ROW-LOCAL bloom decontamination — :func:`bloom_decontaminate`
    with the filter COLLECTED into one array LITERAL (``n_bits/32``
    bigints: 16 KiB at the 2^16 default — a single Literal node, not
    an expression tree, so no janino size hazard) and the probe folded
    into a pure per-row expression over the document's own distinct
    shingles.  NO join, NO shuffle, NO aggregation: the decision is a
    narrow filter-shaped projection, which makes this the STREAMING
    decontamination twin — it runs unchanged on a streaming DataFrame
    (stateless, append-mode, no watermark), flagging every arriving
    document against the eval set at ingest.

    Identical output contract to :func:`bloom_decontaminate` at the
    same parameters (same double-hashed positions, same one-sided
    error: ``n_bloom`` is an upper bound on the true shingle overlap,
    contaminated-and-missed impossible; false-positive rate
    ~(fill)^n_hashes, so size ``n_bits`` to the eval set) — the two
    are parity-tested, and a SQL oracle replays the exact output.
    Driver-side state is the collected word table, ≤ ``n_bits/32``
    rows by construction regardless of eval-set size.

    Output: every ``corpus`` row + ``n_bloom`` (bigint) +
    ``contaminated`` — per ROW, so no per-doc re-aggregation is ever
    needed (a document IS a row)."""
    if n_bits & (n_bits - 1) or n_bits < _BLOOM_WORD:
        raise ValueError(f"n_bits must be a power of two >= 32, got {n_bits}")
    if not (1 <= n_hashes <= 16):
        raise ValueError(f"n_hashes must be in [1, 16], got {n_hashes}")
    hash_fn = portable_hash60 if portable else F.xxhash64
    spark = corpus.sparkSession
    ev_sh = (
        eval_df.select(
            F.explode(
                F.array_distinct(shingles(F.col(text_col), shingle_k))
            ).alias("__s")
        )
        .select(hash_fn(F.col("__s")).alias("__sh"))
        .distinct()
    )
    pos = _bloom_positions(n_bits, n_hashes)
    words = (
        ev_sh.select(F.explode(F.array(*pos)).alias("__pos"))
        .select(
            F.expr(f"__pos DIV {_BLOOM_WORD}").alias("__w"),
            F.pmod(F.col("__pos"), F.lit(_BLOOM_WORD)).alias("__b"),
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(shiftleft(1L, CAST(__b AS INT)))").alias("__word"))
    )
    words = driver_rows(words)
    table = [0] * (n_bits // _BLOOM_WORD)
    for r in words:
        table[int(r["__w"])] = int(r["__word"])
    words_lit = F.lit(table)  # ONE Literal node of array<bigint>

    def _member(sh):
        """All n_hashes positions set for shingle-hash column sh."""
        h1 = F.pmod(sh, F.lit(n_bits))
        h2 = F.pmod(F.shiftright(sh, 20), F.lit(n_bits)) * 2 + 1
        hit = F.lit(True)
        for i in range(n_hashes):
            p = F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits))
            word = F.element_at(
                words_lit, (p / F.lit(_BLOOM_WORD)).cast("int") + 1
            )
            # F.shiftleft only takes a literal count; the SQL function
            # itself accepts a column — invoke it directly
            bit = F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod(p, F.lit(_BLOOM_WORD)).cast("int"),
            )
            hit = hit & (word.bitwiseAND(bit) != 0)
        return hit

    n_bloom = F.size(
        F.filter(
            F.transform(
                F.array_distinct(shingles(F.col(text_col), shingle_k)),
                lambda s: hash_fn(s),
            ),
            _member,
        )
    ).cast("long")
    # the probe is CPU-bound (shingle + n_hashes bit tests per gram);
    # parallelize a one-file batch scan — but never touch a STREAMING
    # frame (partition inspection would break the stateless contract)
    if not corpus.isStreaming:
        corpus = ensure_parallelism(corpus)
    return corpus.select(
        "*",
        n_bloom.alias("n_bloom"),
        (n_bloom >= F.lit(min_overlap)).alias("contaminated"),
    )


def excise_token_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_col: str = "span",
    out_col: str = "text_clean",
) -> DataFrame:
    """Apply a span-level dedup/decontamination report: REMOVE the
    flagged token ranges from each document's text — the consumer of
    :func:`contamination_spans` and :func:`duplicate_spans` that turns
    "these token ranges are leaked/boilerplate" into the cleaned
    corpus (excise the passage, keep the document — the Lee et al.
    policy the span finders exist for).

    ``spans``: ``(id_col, span struct<start,stop>)`` rows, 0-based
    half-open TOKEN offsets under the same whitespace tokenization as
    :func:`~..functions.text.tokens` (exactly what the span finders
    emit).  Output: every ``docs`` row (documents with no spans pass
    through whole) with ``out_col`` = the surviving tokens re-joined
    by single spaces, plus ``n_tokens_removed`` (distinct token
    positions covered — overlapping spans do not double-count).

    Scale shape: spans aggregate to ONE array per document (islands
    per doc are few by construction — the finders coalesce), the join
    back to the corpus is a plain equi-join on ``id_col`` (AQE
    broadcasts the span side when the flagged fraction is small), and
    the excision is a pure expression — tokenize once, keep positions
    hit by no span (O(tokens·islands) comparisons per row, all
    codegen'd; no Python, no explode of the corpus)."""
    from ..functions.text import tokens

    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.col(span_col)).alias("__spans")
    )
    # the excision expression below is CPU-bound (tokenize + per-token
    # span comparisons); a one-file corpus scan would run it single-task
    joined = ensure_parallelism(docs).join(per_doc, id_col, "left")
    toks = tokens(F.col(text_col))
    spans_arr = F.coalesce(
        F.col("__spans"),
        F.array().cast("array<struct<start: bigint, stop: bigint>>"),
    )
    # (token, position) pairs; keep those no span covers
    idx = F.zip_with(
        toks,
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda t, i: F.struct(t.alias("t"), i.alias("i")),
    )
    kept = F.filter(
        idx,
        lambda e: ~F.exists(
            spans_arr,
            lambda s: (e["i"] >= s["start"]) & (e["i"] < s["stop"]),
        ),
    )
    cleaned = F.array_join(
        F.transform(kept, lambda e: e["t"]), " "
    )
    removed = (F.size(toks) - F.size(kept)).cast("long")
    return joined.select(
        *docs.columns,
        F.when(F.size(toks) > 0, cleaned).otherwise(F.lit("")).alias(out_col),
        F.when(F.size(toks) > 0, removed).otherwise(F.lit(0).cast("long")).alias(
            "n_tokens_removed"
        ),
    )


#: word width of the bloom bitset table — 32 bits per BIGINT word keeps
#: every shift strictly below the sign bit, so both engines (Spark ANSI,
#: DuckDB overflow-checked ``<<``) compute the same positive words
_BLOOM_WORD = 32


def _bloom_positions(n_bits: int, n_hashes: int) -> list:
    """The ``n_hashes`` bloom positions of hash column ``__sh`` via
    double hashing (Kirsch & Mitzenmacher): ``pos_i = (h1 + i·h2) mod
    n_bits`` with ``h1 = sh mod n_bits`` and ``h2`` an odd offset from
    the high hash bits — full-cycle for power-of-two ``n_bits``, and
    pure positive-integer arithmetic a SQL oracle replays exactly."""
    h1 = F.pmod(F.col("__sh"), F.lit(n_bits))
    h2 = F.pmod(F.shiftright(F.col("__sh"), 20), F.lit(n_bits)) * 2 + 1
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes)]


def bloom_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    min_overlap: int = 1,
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Decontamination via a BLOOM FILTER of the eval set's shingles —
    the constant-broadcast variant of :func:`decontaminate` for when
    even the eval side's distinct-shingle table is too large to ship:
    the broadcast is ``n_bits/8`` bytes (128 KiB at the 2^20 default)
    REGARDLESS of eval-set size, vs the full shingle-hash table
    (8 bytes × |eval shingles|, unbounded).

    The filter is a (word_idx, word) table of 32-bit words built with
    ``n_hashes`` double-hashed positions per shingle; the corpus probe
    is ``n_hashes`` broadcast LEFT joins on word index — every probe
    row stays ONE row (no explode, no per-shingle re-aggregation), so
    the corpus pass is map-only and the only shuffle is the per-doc
    count over bloom-positive shingles.  Deterministic by construction
    (hash positions are pure integer arithmetic), so false positives
    are REPRODUCIBLE and a SQL oracle replays the exact output;
    ``n_overlap`` here is an upper bound on the true shingle overlap
    (one-sided error: clean-and-flagged possible at the ~(fill)^k
    bloom rate, contaminated-and-missed impossible).

    Output: ``(id_col, n_bloom, contaminated)`` — one row per corpus
    document, like :func:`decontaminate`.
    """
    if n_bits & (n_bits - 1) or n_bits < _BLOOM_WORD:
        raise ValueError(f"n_bits must be a power of two >= 32, got {n_bits}")
    if not (1 <= n_hashes <= 16):
        raise ValueError(f"n_hashes must be in [1, 16], got {n_hashes}")
    hash_fn = portable_hash60 if portable else F.xxhash64
    sh_of = lambda d: F.explode(  # noqa: E731
        F.array_distinct(shingles(F.col(text_col), shingle_k))
    )
    ev_sh = (
        eval_df.select(sh_of(eval_df).alias("__s"))
        .select(hash_fn(F.col("__s")).alias("__sh"))
        .distinct()
    )
    pos = _bloom_positions(n_bits, n_hashes)
    words = (
        ev_sh.select(F.explode(F.array(*pos)).alias("__pos"))
        .select(
            F.expr(f"__pos DIV {_BLOOM_WORD}").alias("__w"),
            F.pmod(F.col("__pos"), F.lit(_BLOOM_WORD)).alias("__b"),
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(shiftleft(1L, CAST(__b AS INT)))").alias("__word"))
    )
    # the ``n_hashes`` probe joins broadcast differently-renamed views
    # of this table, so exchange reuse never kicks in — a lazy local
    # checkpoint materializes the eval-side scan ONCE (<= n_bits/32
    # rows) instead of once per hash function
    words = words.localCheckpoint(eager=False)
    probe = ensure_parallelism(corpus).select(
        F.col(id_col), sh_of(corpus).alias("__s")
    ).select(
        id_col,
        hash_fn(F.col("__s")).alias("__sh"),
    )
    probe = probe.select(
        id_col,
        *[p.alias(f"__p{i}") for i, p in enumerate(pos)],
    ).select(
        id_col,
        *[F.expr(f"__p{i} DIV {_BLOOM_WORD}").alias(f"__w{i}") for i in range(n_hashes)],
        *[F.pmod(F.col(f"__p{i}"), F.lit(_BLOOM_WORD)).alias(f"__b{i}") for i in range(n_hashes)],
    )
    hit = F.lit(True)
    for i in range(n_hashes):
        w = words.select(
            F.col("__w").alias(f"__w{i}"), F.col("__word").alias(f"__word{i}")
        )
        probe = probe.join(F.broadcast(w), f"__w{i}", "left")
        hit = hit & (
            F.expr(
                f"coalesce(__word{i}, 0L) & shiftleft(1L, CAST(__b{i} AS INT))"
            )
            != 0
        )
    hits = (
        probe.filter(hit)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bloom"))
    )
    n = F.coalesce(F.col("n_bloom"), F.lit(0).cast("long"))
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            n.alias("n_bloom"),
            (n >= F.lit(min_overlap)).alias("contaminated"),
        )
    )


def shared_shingle_pairs(
    df: DataFrame,
    shingle_k: int = 16,
    min_shared: int = 1,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Exact-substring duplication candidates: document pairs sharing at
    least ``min_shared`` distinct word ``shingle_k``-grams — the
    equi-join formulation of substring-level dedup (a shared long
    n-gram IS a shared substring; near-dup MinHash deliberately ignores
    where the overlap sits, this catches verbatim block reuse).

    Output: ``(id_a, id_b, n_shared)``, ``id_a < id_b``.

    Scale design: the pair generator is a self EQUI-join on shingle
    hashes — never a cross join.  Its blow-up risk is boilerplate
    shingles shared by thousands of documents (a df-F shingle emits
    O(df²) pairs), so shingles with document frequency > ``max_df``
    are dropped first (one partial-agg count over hashes) — the
    standard stop-shingle guard: a 16-gram in >``max_df`` documents is
    boilerplate, not duplication signal, and dropping it bounds
    per-shingle fan-out at ``max_df²`` independent of corpus size.
    Joins carry 64-bit hashes, never shingle strings."""
    hash_fn = portable_hash60 if portable else F.xxhash64
    sh = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.array_distinct(shingles(F.col(text_col), shingle_k))
            ).alias("__s"),
        )
        .select("__id", hash_fn(F.col("__s")).alias("__sh"))
    )
    freq = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
    kept = sh.join(freq.filter(F.col("__df") <= max_df), "__sh").select(
        "__id", "__sh"
    )
    # persisted: both sides of the self-join read it — without the
    # boundary the shingle+freq pipeline runs twice
    kept = kept.persist()
    driver_count(kept)
    pairs = (
        kept.alias("a")
        .join(
            kept.select(
                F.col("__id").alias("__id_b"), F.col("__sh").alias("__sh")
            ).alias("b"),
            "__sh",
        )
        .filter(F.col("a.__id") < F.col("__id_b"))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("__id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    if min_shared > 1:
        pairs = pairs.filter(F.col("n_shared") >= min_shared)
    return pairs


# ---------------------------------------------------------------------------
# incremental dedup: a persisted band-bucket index for batch-over-history
# ---------------------------------------------------------------------------


def write_minhash_index(
    docs: DataFrame,
    table: str,
    n_buckets: int = 64,
    path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    portable: bool = False,
    mode: str = "overwrite",
) -> None:
    """Persist the corpus' MinHash band-bucket table — the index that
    makes dedup INCREMENTAL: each new batch probes this table instead
    of re-pairing against the full history.

    Layout: ``(id, band, bh)`` hash-BUCKETED by ``bh`` (sorted within
    buckets), registered as ``table`` in the session catalog.  The
    probe join's hot side is therefore pre-partitioned on disk: when
    the increment is too large to broadcast, only the increment
    shuffles — the 100 TB history is read in place, never exchanged.
    The index costs ``bands`` rows per document of (long, int, long) —
    ~1e11 rows at 100 TB, parquet-encoded ~100s of GB, ~0.3% of the
    corpus it replaces in every later dedup pass.

    The banding parameters are part of the index identity: probes MUST
    use the same ``num_hashes/bands/shingle_k/portable`` (stored
    nowhere — at production scale they belong in the table comment or
    a sidecar; here the catalog query pins them by construction)."""
    from ..sources.sinks import write_bucketed

    bnd = minhash_banded(
        docs, text_col, id_col, num_hashes, bands, shingle_k, portable
    )
    write_bucketed(
        bnd, table, ["bh"], n_buckets, sort_cols=["bh"], path=path, mode=mode
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    portable: bool = False,
    min_shared_bands: int = 1,
    broadcast_increment: bool = True,
) -> DataFrame:
    """Flag each increment row against the persisted history index:
    ``new_docs`` columns + ``kept`` (true = no indexed near-duplicate).

    The production dedup shape: history is indexed ONCE
    (:func:`write_minhash_index`), every arriving batch is banded and
    probed against the index — never against raw history text, never
    all-pairs.  A row is a duplicate when it shares ≥
    ``min_shared_bands`` (band, bucket) cells with any indexed row.

    Plan shape: with ``broadcast_increment=True`` (the common
    small-batch case) the banded increment broadcasts and the index
    scan is map-side — ZERO shuffle of history.  With it false, the
    increment shuffles into the index's bucket layout and the bucketed
    side still moves nothing.  Keep id spaces disjoint between history
    and increment (the probe does not filter self-matches — an
    increment doc already present in the index under the same id is,
    correctly, a duplicate).

    After accepting a batch, append its kept rows' bands to the index
    (:func:`write_minhash_index` with ``mode='append'``) so the next
    batch dedups against them too — intra-batch duplicates are NOT
    resolved here (run :func:`minhash_lsh_pairs` +
    :func:`dedup_cluster_keep` within the batch first when batches are
    large enough to self-duplicate)."""
    inc = minhash_banded(
        new_docs, text_col, id_col, num_hashes, bands, shingle_k, portable
    )
    probe = F.broadcast(inc) if broadcast_increment else inc
    hits = index.select("band", "bh").join(probe, ["band", "bh"])
    # k history docs in one bucket must count as ONE matched band for
    # an increment row — countDistinct on the (small) hit set, never a
    # distinct over the full index
    if min_shared_bands <= 1:
        matched = hits.select(id_col).distinct()
    else:
        matched = (
            hits.groupBy(id_col)
            .agg(F.countDistinct("band").alias("__nb"))
            .filter(F.col("__nb") >= min_shared_bands)
            .select(id_col)
        )
    m = matched.withColumnRenamed(id_col, "__dup_id")
    return new_docs.join(
        m, new_docs[id_col] == m["__dup_id"], "left"
    ).select(
        *[F.col(c) for c in new_docs.columns],
        F.col("__dup_id").isNull().alias("kept"),
    )


def keep_best_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    score,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Duplicate-cluster KEEP policy: given near-dup ``pairs`` over rows
    of ``df``, keep exactly one row per connected duplicate cluster —
    the HIGHEST-``score`` member, ties to the smaller id — and every
    row that is in no cluster.  This is the decision step real pipelines
    run after MinHash/SimHash/embedding pair generation: not "drop all
    but the minimum id" (:func:`connected_components` + arbitrary pick)
    but "keep the best copy" (longest, cleanest, highest-quality).

    ``score`` is a Column evaluated against ``df``'s columns (e.g. a
    ppm-quantized quality score — keep it integer or an exactly
    reproducible double for cross-engine determinism).  ``id_col`` must
    be numeric: the deterministic argmax is a single
    ``max(struct(score, -id))`` aggregate (``max_by`` is
    tie-nondeterministic, a window sort is a full per-cluster sort;
    the struct-max is one partial-aggregated pass).

    Returns the kept rows of ``df`` with all original columns.

    Scale shape (100 TB): components run on the pair list (vertex-sized
    state, never documents); the label join back to ``df`` is an
    id-keyed hash join; the winner agg shuffles one (cluster, score,
    id) row per document; the final ``left_semi`` is id-keyed.  No
    stage carries text or vectors."""
    comp = connected_components(pairs, src=src, dst=dst)
    labeled = (
        df.select(F.col(id_col).alias("__id"), score.alias("__s"))
        .join(comp.withColumnRenamed("v", "__id"), "__id", "left")
        .select(
            "__id",
            "__s",
            F.coalesce(F.col("cluster_id"), F.col("__id")).alias("__c"),
        )
    )
    winners = (
        labeled.groupBy("__c")
        .agg(
            F.max(
                F.struct(
                    F.col("__s").alias("s"), (-F.col("__id")).alias("ni")
                )
            ).alias("__w")
        )
        .select((-F.col("__w.ni")).alias(id_col))
    )
    return df.join(winners, id_col, "left_semi")


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Corpus-level exact LINE deduplication — the C4/RefinedWeb
    boilerplate rule: any line occurring in at least ``min_df``
    DISTINCT documents (nav menus, cookie banners, license footers,
    and — deliberately — blank lines) is removed from every document;
    the rest of each document survives in original line order.

    Output: ``(id_col, text, n_removed)`` for every input row —
    ``text`` is the surviving lines re-joined with ``\\n`` (possibly
    empty), ``n_removed`` the count of removed line occurrences.

    Shape: one posexplode to ``(id, pos, line_hash, line)``, one
    distinct-doc frequency aggregation on the line hash, one left_anti
    join against the hot-hash set, and one per-document reassembly
    (``sort_array(collect_list(struct(pos, line)))`` — deterministic
    regardless of partitioning).  At 100 TB the frequency agg is
    partial-aggregated (boilerplate hashes combine map-side, so the
    one skewed key class collapses before the exchange) and the
    anti-join's build side holds ONLY hot hashes — typically small
    enough for AQE to broadcast, never full text.  ``portable=True``
    swaps xxhash64 for the md5 60-bit hash so a SQL oracle replays
    hash-for-hash."""
    from ..functions.text import portable_hash60

    from ..sources import ensure_parallelism

    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    hash_fn = portable_hash60 if portable else F.xxhash64
    idc = F.col(id_col)
    # the split+explode+hash pass is CPU-bound and runs twice (hot-set
    # build + anti join); a small parquet input is one scan task
    lines = ensure_parallelism(docs).select(
        idc.alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__p", "__l"),
    ).select("__id", "__p", "__l", hash_fn(F.col("__l")).alias("__h"))
    hot = (
        lines.groupBy("__h")
        .agg(F.countDistinct("__id").alias("__df"))
        .filter(F.col("__df") >= min_df)
        .select("__h")
    )
    kept = lines.join(hot, "__h", "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("__p").alias("p"), F.col("__l").alias("l"))
                    )
                ),
                lambda s: s["l"],
            ),
        ).alias("__text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    n_lines = F.size(F.split(F.col(text_col), "\n"))
    return (
        docs.select(idc.alias("__id"), n_lines.alias("__n_lines"))
        .join(rebuilt, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("__text"), F.lit("")).alias("text"),
            (
                F.col("__n_lines") - F.coalesce(F.col("__n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )


def gram_novelty(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    min_df: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Per-document n-gram novelty — the memorization/diversity
    metric of a training corpus: the fraction of a document's DISTINCT
    word ``shingle_k``-grams that no other document shares.  A page of
    boilerplate scores near 0 (every gram is corpus-common); unique
    prose scores near 1e6 ppm.  The corpus-internal complement of
    :func:`decontaminate` (which asks the same question against an
    EVAL set).

    Per doc: ``n_grams`` (distinct shingles), ``n_shared`` (those
    appearing in at least ``min_df`` documents — shingles are
    de-duplicated per doc first, so a gram's count IS its document
    frequency), and ``novelty_ppm = 1e6·(n_grams − n_shared) DIV
    n_grams`` — exact integer floor arithmetic end-to-end.
    Documents shorter than ``shingle_k`` tokens collapse to one
    whole-text shingle (the :func:`~..functions.text.shingles`
    contract), so every document scores.

    Scale shape: shuffles carry (doc, gram-hash) pairs — never text;
    the df table partial-aggregates (common grams combine map-side),
    the join back keys an aggregated table, and the final per-doc agg
    is the only id-bearing pass.  ``portable=True`` switches
    xxhash64 → md5-60bit so the DuckDB oracle replays hashes
    exactly."""
    from ..functions.text import portable_hash60, shingles

    if shingle_k < 1:
        raise ValueError(f"shingle_k must be >= 1, got {shingle_k}")
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    h = (
        portable_hash60
        if portable
        else (lambda c: F.xxhash64(F.col(c) if isinstance(c, str) else c))
    )
    ex = corpus.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles(F.col(text_col), shingle_k))
        ).alias("__s"),
    ).select(id_col, h("__s").alias("__h"))
    # both the document-frequency aggregate and the join-back branch
    # scan `ex` — uncached, the tokenize+shingle+hash projection (the
    # dominant cost) runs twice inside one job, and a lazy persist
    # lets the branches race the cold cache (the minhash_lsh_pairs
    # lesson).  The table is two longs per (doc, gram).
    ex = ex.persist()
    driver_count(ex)
    df_t = ex.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    out = (
        ex.join(df_t, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("__df") >= min_df, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_shared"),
        )
        .select(
            id_col,
            "n_grams",
            "n_shared",
            F.expr(
                "(1000000L * (n_grams - n_shared)) DIV n_grams"
            ).alias("novelty_ppm"),
        )
    )
    # checkpoint the (document-sized) result eagerly, THEN release the
    # gram table — unpersisting before the caller's action would
    # silently recompute the hash pass twice (the triangle_counts
    # leak-free pattern)
    out = out.localCheckpoint(eager=True)
    ex.unpersist()
    return out
