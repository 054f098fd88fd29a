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

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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

    b = _bucket(F.col(key_col), salt)
    expr = F.lit(labels[-1])
    for bound, label in zip(reversed(bounds), reversed(labels[:-1])):
        expr = F.when(b < F.lit(bound), F.lit(label)).otherwise(expr)
    return df.withColumn(split_col, expr)
