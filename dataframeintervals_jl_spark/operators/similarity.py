"""Approximate-nearest-neighbor search over embedding columns.

Two paths over an ``array<float>`` column:

- ``cosine_topk``: exact brute-force top-k.  The query side is
  broadcast; dot products are array expressions (``zip_with`` +
  ``aggregate``, JVM-side); top-k via window row_number.  At 100 TB this
  is one broadcast pass over the corpus — no shuffle of the corpus
  itself — so it is the right *baseline*, linear in corpus size.
- ``lsh_topk``: random-hyperplane (signed projection) LSH buckets; the
  corpus is hashed once, queries probe only matching buckets — the
  scale path that avoids reading the whole corpus per query.

Determinism note: dot products are computed on fixed-point int64
(``round(x * 10^6)``) so results are exactly reproducible across
engines (integer sums are order-independent; float sums are not) — this
is also what the DuckDB oracle computes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000


def _quantized(col):
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (q_id, rank, n_id, score).

    ``queries`` is broadcast (the typical many-corpus × few-queries
    shape); ties broken by neighbor id so ranking is total."""
    c = corpus.select(
        F.col(id_col).alias("n_id"), _quantized(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _dot(F.col("cv"), F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("q_id"), _quantized(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))

    pairs = c.join(F.broadcast(q), F.lit(True))
    if exclude_self:
        pairs = pairs.filter(F.col("n_id") != F.col("q_id"))
    dot = _dot(F.col("cv"), F.col("qv"))
    scored = pairs.select(
        "q_id",
        "n_id",
        (
            dot.cast("double")
            / F.sqrt(F.col("cn").cast("double") * F.col("qn").cast("double"))
        ).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("score", 6).alias("score"))
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes (splitmix64 → ±small ints)."""
    planes = []
    state = 0x243F6A8885A308D3
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state + 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
            z = state
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
            z ^= z >> 31
            row.append((z % 2001) - 1000)  # ~uniform in [-1000, 1000]
        planes.append(row)
    return planes


def lsh_bucket(vec_col, dim: int, n_planes: int = 16):
    """Signed-projection LSH bucket id (bigint) for an embedding column."""
    qv = _quantized(vec_col)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(_hyperplanes(dim, n_planes)):
        proj = F.aggregate(
            F.zip_with(
                qv,
                F.array(*[F.lit(c) for c in plane]),
                lambda x, w: x * w,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bit = (1 << i) if i < 63 else -(1 << 63)
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.lit(bit)).otherwise(F.lit(0)).cast("long")
        )
    return bucket


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    n_planes: Optional[int] = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine: (id_a, id_b, score)
    with ``score >= threshold`` and ``id_a < id_b``.

    Exact mode (``n_planes=None``): self-join with only the id-ordering
    predicate — O(n²/2) pair evaluations, the correctness baseline.
    LSH mode (``dim`` + ``n_planes`` set): candidates restricted to
    equal signed-projection buckets first, an equi-join that shuffles on
    the bucket key — the 100 TB path (near-identical vectors land in the
    same bucket with probability ≈ (1 - θ/π)^planes, ≈ .97^planes at
    cos ≥ .99).
    """
    proj = [F.col(id_col).alias("id"), _quantized(F.col(vec_col)).alias("v")]
    if n_planes is not None:
        if dim is None:
            raise ValueError("LSH mode needs `dim`")
        proj.append(lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"))
    base = corpus.select(*proj).withColumn("nrm", _dot(F.col("v"), F.col("v")))
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if n_planes is not None:
        cond = (F.col("a.bucket") == F.col("b.bucket")) & cond
    dot = _dot(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                dot.cast("double")
                / F.sqrt(F.col("a.nrm").cast("double") * F.col("b.nrm").cast("double"))
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", F.round("score", 6).alias("score"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine within the bucket.  The corpus is hashed once and
    the join is a bucket equi-join (shuffle on the bucket key) — at
    scale, pair it with bucketed storage so it's shuffle-free."""
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        _quantized(F.col(vec_col)).alias("cv"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    ).withColumn("cn", _dot(F.col("cv"), F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        _quantized(F.col(vec_col)).alias("qv"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))

    pairs = c.join(q, "bucket").filter(F.col("n_id") != F.col("q_id"))
    dot = _dot(F.col("cv"), F.col("qv"))
    scored = pairs.select(
        "q_id",
        "n_id",
        (
            dot.cast("double")
            / F.sqrt(F.col("cn").cast("double") * F.col("qn").cast("double"))
        ).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("score", 6).alias("score"))
    )
