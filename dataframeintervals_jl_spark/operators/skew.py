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
