"""Training-example transforms — T5-style span corruption and
fill-in-the-middle (FIM) splits.

Beyond the reference's surface (SURVEY.md §2.C); added per the
engine's training-data mandate: after curation/dedup/packing, the
last step of a pre-training pipeline is turning documents into
(input, target) examples.  Both transforms here are PURE COLUMN
EXPRESSIONS — one narrow projection, zero shuffles, no Python on the
data path — and every random choice is a deterministic
``portable_hash60`` decision keyed on (salt, doc id, position), so
the same example set materializes on any cluster, any partitioning,
any engine (the DuckDB oracles replay every mask decision).

- :func:`span_corrupt` — T5/UL2-style denoising pairs: token spans
  are masked and replaced by ``<extra_id_k>`` sentinels in the input;
  the target is the sentinel-delimited sequence of masked spans.
- :func:`fim_split` — fill-in-the-middle (Bavarian et al. 2022):
  deterministic (prefix, middle, suffix) token split plus the PSM
  serialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, tokens

#: hash-bucket space for the per-position start decision (ppm scale)
PPM = 1_000_000


def _pos_hash(salt: str, id_col, j) -> F.Column:
    """Deterministic per-(doc, position) 60-bit hash; ``j`` may be a
    position column or a literal tag string."""
    jj = j.cast("string") if not isinstance(j, str) else F.lit(j)
    return portable_hash60(
        F.concat(F.lit(salt + "|"), id_col.cast("string"), F.lit("|"), jj)
    )


def span_corrupt(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_ppm: int = 100_000,
    max_span: int = 3,
    salt: str = "spancorrupt",
) -> DataFrame:
    """T5-style span-corruption pairs: ``corrupted`` (input with each
    masked RUN collapsed to one ``<extra_id_k>`` sentinel, k counting
    from 0 left-to-right) and ``targets`` (the masked spans, each
    prefixed by its sentinel) — plus ``n_spans`` / ``n_masked``
    audit counts.

    A span STARTS at token position j iff
    ``hash(salt|id|j) % 1e6 < start_ppm`` and runs for
    ``1 + hash(saltL|id|j) % max_span`` tokens; overlapping spans
    merge into one run (the T5 behavior).  Fold semantics are a
    single ``aggregate`` over token positions with a struct
    accumulator — whole-stage-codegen'd, O(tokens·starts) per row,
    no UDF, no shuffle.  Zero-token documents produce empty strings
    and zero counts."""
    if not (0 < start_ppm < PPM):
        raise ValueError(f"start_ppm must be in (0, 1e6), got {start_ppm}")
    if max_span < 1:
        raise ValueError(f"max_span must be >= 1, got {max_span}")
    d = F.col(id_col)

    # round 11: hash each position ONCE.  The fixed-width OR that
    # derives the mask flag at j re-reads the start/len decision of
    # the last max_span positions; with the hashes inlined that was
    # max_span·2 md5 evaluations per position (lambda bodies get no
    # subexpression elimination).  Materializing the per-position
    # decision ARRAYS in their own projection first (CollapseProject
    # keeps non-cheap multi-referenced aliases separate) makes the OR
    # read attribute arrays via element_at — 2 hashes per position
    # total, identical decisions.  (An exists() over a filtered starts
    # array re-evaluates that md5-hashed array for EVERY element of
    # the enclosing transform — O(n²) hashing, measured 28s at sf0.1;
    # and element_at over a flags array inside the fold lambda is
    # worse still, O(n³) — the arrays must be COLUMNS, not inlined
    # expressions, before a lambda may reference them.)
    p1 = df.select(id_col, tokens(F.col(text_col)).alias("__t"))
    n1 = F.size(F.col("__t"))
    p2 = p1.select(
        id_col,
        "__t",
        F.transform(
            F.sequence(F.lit(1), n1),
            lambda j: _pos_hash(salt, d, j) % PPM < F.lit(start_ppm),
        ).alias("__st"),
        F.transform(
            F.sequence(F.lit(1), n1),
            lambda j: F.lit(1) + _pos_hash(salt + "L", d, j) % F.lit(max_span),
        ).alias("__ln"),
    )

    toks = F.col("__t")
    n = F.size(toks)
    seq = F.sequence(F.lit(1), n)

    def masked_at(j):
        # span starting at s covers j iff o = j - s ∈ [0, span_len(s));
        # o is bounded by max_span, so the mask flag is a FIXED-WIDTH
        # OR over the last max_span positions — array reads only
        cond = None
        for o in range(max_span):
            s = (j - F.lit(o)).cast("int")
            c = (
                (s >= 1)
                & F.element_at(F.col("__st"), s)
                & (F.lit(o) < F.element_at(F.col("__ln"), s))
            )
            cond = c if cond is None else (cond | c)
        return cond

    # the fold's INPUT is one zipped (tok, masked) array so the
    # hash-derived mask flags are evaluated exactly once per row
    zipped = F.zip_with(
        toks,
        F.transform(seq, masked_at),
        lambda t, m: F.struct(t.alias("tok"), m.alias("masked")),
    )
    # n == 0 guard: sequence(1, 0) is the descending [1, 0], whose
    # hash decisions must not leak into an empty doc
    zipped = F.when(n >= 1, zipped).otherwise(
        F.array().cast("array<struct<tok: string, masked: boolean>>")
    )
    empty = F.array().cast("array<string>")
    acc0 = F.struct(
        empty.alias("out"),
        empty.alias("tgt"),
        F.lit(-1).cast("int").alias("k"),
        F.lit(False).alias("prev"),
        F.lit(0).cast("long").alias("nm"),
    )

    def step(acc, x):
        tok, masked = x.tok, x.masked
        k2 = F.when(masked & ~acc.prev, acc.k + 1).otherwise(acc.k)
        sent = F.concat(F.lit("<extra_id_"), k2.cast("string"), F.lit(">"))
        out2 = (
            F.when(~masked, F.concat(acc.out, F.array(tok)))
            .when(~acc.prev, F.concat(acc.out, F.array(sent)))
            .otherwise(acc.out)
        )
        tgt2 = (
            F.when(masked & ~acc.prev, F.concat(acc.tgt, F.array(sent, tok)))
            .when(masked, F.concat(acc.tgt, F.array(tok)))
            .otherwise(acc.tgt)
        )
        return F.struct(
            out2.alias("out"), tgt2.alias("tgt"), k2.alias("k"),
            masked.alias("prev"),
            F.when(masked, acc.nm + 1).otherwise(acc.nm).alias("nm"),
        )

    # two-step projection: `__f` is non-cheap and consumed four times,
    # so CollapseProject keeps the boundary and the fold runs once/row
    inner = p2.select(id_col, F.aggregate(zipped, acc0, step).alias("__f"))
    f = F.col("__f")
    return inner.select(
        id_col,
        F.array_join(f.getField("out"), " ").alias("corrupted"),
        F.array_join(f.getField("tgt"), " ").alias("targets"),
        (f.getField("k") + 1).cast("long").alias("n_spans"),
        f.getField("nm").alias("n_masked"),
    )


def fim_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle split: deterministic token cut points
    ``a = hash(salt|id|a) % (n+1)`` and
    ``b = a + hash(salt|id|b) % (n-a+1)`` yield ``prefix``
    (tokens 1..a), ``middle`` (a+1..b), ``suffix`` (b+1..n) plus the
    PSM serialization ``<PRE>prefix<SUF>suffix<MID>middle`` — the
    standard FIM training example.  Pure expressions; zero-token
    documents produce three empty strings."""
    d = F.col(id_col)
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    a = (_pos_hash(salt, d, "a") % (n.cast("long") + 1)).cast("int")
    b = a + (_pos_hash(salt, d, "b") % (n.cast("long") - a + 1)).cast("int")
    prefix = F.array_join(F.slice(toks, F.lit(1), a), " ")
    middle = F.array_join(F.slice(toks, a + 1, b - a), " ")
    suffix = F.array_join(F.slice(toks, b + 1, n - b), " ")
    return df.select(
        id_col,
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
        F.concat(
            F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix, F.lit("<MID>"),
            middle,
        ).alias("psm"),
    )
