"""Explicit skew mitigation: salted equi-join.

AQE's skew-join split (the engine's default answer, see session.py and
the bench's skew entry) only fires on sort-merge joins whose runtime
partition stats cross the skew thresholds, and it cannot help when the
skewed side feeds a join *inside* a single stage or when AQE is off
(streaming, some nested plans).  Salting is the explicit, planner-
independent fallback: split each hot key into ``n_salt`` sub-keys on
the big side, replicate the small side once per sub-key, and join on
``(key, salt)`` — the hot key's rows now spread across ``n_salt``
reducers by construction.

The cost is deliberate and bounded: the small side is duplicated
``n_salt`` times (choose ``n_salt`` ≈ hot-key share × shuffle
partitions; 8–32 covers real skew) and every right row is shuffled
``n_salt`` times.  The result multiset is IDENTICAL to the plain join
— which salt a left row draws is irrelevant because every salt value
of its key exists on the right — so the oracle for a salted join is
simply the unsalted SQL join.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Key = Union[str, Sequence[str]]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Key,
    n_salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``left`` (large, possibly key-skewed) with ``right``
    (small enough to replicate ``n_salt``×) on ``on``, spreading each
    key across ``n_salt`` shuffle sub-partitions.

    ``how`` supports ``inner`` and ``left`` (outer semantics are safe:
    an unmatched left row is unmatched under every salt, so no
    duplicate null-padded rows appear).  The salt is drawn row-locally
    (seeded ``rand`` — per-partition deterministic); the OUTPUT is
    salt-independent, so retries/replans cannot change the result
    multiset.

    Output columns: the plain join's columns (key columns once, then
    left payload, then right payload) — no salt column leaks.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salt < 2:
        raise ValueError(f"n_salt must be >= 2, got {n_salt}")
    keys = [on] if isinstance(on, str) else list(on)

    l = left.withColumn(
        "__salt", F.floor(F.rand(seed) * n_salt).cast("int")
    )
    r = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salt)])),
    )
    out = l.join(r, keys + ["__salt"], how).drop("__salt")
    return out


def key_skew_report(
    df: DataFrame,
    key: Key,
    probs_ppm: Sequence[int] = (500_000, 900_000, 990_000),
    k: int = 1024,
) -> DataFrame:
    """Per-key-count distribution report - the diagnostic that decides
    WHETHER :func:`salted_join` (or AQE's skew split) is needed and how
    to size ``n_salt``: one row per requested quantile with the count
    distribution's summary alongside.

    Output columns: ``prob_ppm``, ``cnt_quantile`` (QSK sketch quantile
    of per-key row counts, deterministic), ``n_sample``, plus repeated
    summary columns ``n_keys``, ``max_cnt``, ``total_rows``,
    ``mean_cnt`` (floor) - all exact bigints.  A hot key shows up as
    ``max_cnt`` (or the p99) standing far above ``mean_cnt``;
    ``n_salt ~ max_cnt / p50`` is the salting rule of thumb.

    Scale shape (100 TB): ONE groupBy produces the per-key counts (the
    same shuffle the join under diagnosis would pay, minus the probe
    side); the quantile sketch and the 1-row summary both reduce that
    counts table with bounded state (WindowGroupLimit k rows / one
    partial-agg row per task).  No driver-side collection."""
    from .sampling import qsk_quantiles, qsk_registers

    keys = [key] if isinstance(key, str) else list(key)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__cnt"))
    # the key itself is the per-row identity for the count-row sample
    kc = counts.withColumn("__k", F.concat_ws("|", *keys))
    quants = qsk_quantiles(
        qsk_registers(kc, "__cnt", "__k", k=k),
        probs_ppm,
        out_col="cnt_quantile",
    )
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__cnt").alias("max_cnt"),
        F.sum("__cnt").alias("total_rows"),
    ).select(
        "n_keys",
        "max_cnt",
        "total_rows",
        F.expr("total_rows DIV n_keys").alias("mean_cnt"),
    )
    return quants.crossJoin(F.broadcast(summary))
