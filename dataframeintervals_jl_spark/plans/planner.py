"""Sketch-driven join planning: the Count-Min toolkit wired INTO
strategy selection instead of sitting beside it as a diagnostic.

The keyed interval join has three physical shapes (hash co-partition,
broadcast, composite (key, bin) equi-join), and the right pick depends
on quantities plain side-stats cannot see:

- the PAIR WORK ``J = Σ_k n_l(k) · n_r(k)`` — how many same-key pairs
  the hash path's per-key nested loop would evaluate.  Two sides of a
  million rows each are trivial at a million distinct keys (J ≈ 1M)
  and catastrophic at ten keys (J ≈ 1e11);
- the HOT-PAIR share ``H / J`` — whether one key contributes most of
  that work (skew the (key, bin) shuffle can only spread by making
  bins narrower, and the sort-merge path can only survive via AQE's
  skew split or salting).

Both come from the classic Count-Min inner product (Cormode &
Muthukrishnan 2005 §4.2 — the same estimator as
:func:`~..operators.sampling.cms_join_size`): one bounded
map-side-combined register pass per side (shuffle volume
O(depth·width), never the data), registers collected (≤ depth·width
rows each) and the products computed driver-side.  ``J`` is
overestimate-only, so every decision below errs toward the safer
plan (more bins, earlier warning).

The reference has no planner at all (eager operator-at-a-time Julia,
SURVEY.md §3); this module is engine-original.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import driver_rows

#: CMS geometry for planning probes: wide enough that the inner
#: product's +2N²/width bias stays small relative to real pair work,
#: small enough that the collected registers are a few KB.
PROBE_WIDTH = 256
PROBE_DEPTH = 3

#: A key whose estimated pair share exceeds this fraction of J gets the
#: skew warning (one shuffle partition will carry most of the join).
HOT_PAIR_WARN_SHARE = 0.5

#: The hash path is preferred until predicted pair evaluations exceed
#: this multiple of the rows shuffled — below it, the per-key nested
#: loop is cheaper than the binned path's explode + double shuffle.
PAIR_WORK_FACTOR = 16


@dataclass
class KeyedJoinProfile:
    """Driver-side planning profile of one keyed join."""

    n_left: int
    n_right: int
    join_rows_est: int  #: J — CMS inner product, overestimate-only
    heavy_pair_est: int  #: H — upper bound on max_k n_l(k)·n_r(k)

    @property
    def pair_key_factor(self) -> float:
        """Effective key cardinality for the binned width model:
        ``n_l·n_r / J``.  Equals the true distinct-key count K for
        uniform keys (J = n_l·n_r/K) and SHRINKS under skew — the
        dominant key's pair mass inflates J, which narrows the bins,
        which is exactly the salting a composite (key, bin) shuffle
        key admits.  CMS overestimates J, so the factor only ever errs
        narrow (more bins, less within-partition work)."""
        if self.join_rows_est <= 0:
            return 1.0
        return max(1.0, (self.n_left * self.n_right) / self.join_rows_est)

    @property
    def hot_share(self) -> float:
        """Estimated fraction of pair work owed to the single hottest
        key (H/J; both overestimates, the ratio is indicative)."""
        if self.join_rows_est <= 0:
            return 0.0
        return min(1.0, self.heavy_pair_est / self.join_rows_est)


def _collect_registers(
    df: DataFrame, keys: Sequence[str], width: int, depth: int
) -> tuple[list[list[int]], int]:
    """(depth × width register matrix, row count) from ONE bounded agg
    pass: per-row the composite key maps to ``depth`` (row, bucket)
    cells, partial-aggregated map-side so at most depth·width rows per
    task reach the shuffle.  Null keys are excluded — equi-joins never
    match them."""
    from ..operators.sampling import cms_registers

    key_col = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    nn = df
    for k in keys:
        nn = nn.filter(F.col(k).isNotNull())
    keyed = nn.select(key_col.alias("__pk"))
    regs = cms_registers(keyed, "__pk", width=width, depth=depth)
    mat = [[0] * width for _ in range(depth)]
    n = 0
    rows = driver_rows(regs)
    for r in rows:
        mat[r["__row"]][r["__bkt"]] = int(r["__cnt"])
    # row 0 sums every (non-null-key) input row exactly once
    n = sum(mat[0])
    return mat, n


def keyed_join_profile(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str],
    width: int = PROBE_WIDTH,
    depth: int = PROBE_DEPTH,
) -> KeyedJoinProfile:
    """Profile a keyed join's pair work from two Count-Min register
    passes: ``join_rows_est`` is the min-over-rows inner product
    (:func:`~..operators.sampling.cms_join_size` semantics, computed
    driver-side from the collected registers), ``heavy_pair_est`` the
    min-over-rows MAX bucket product — an upper bound on the hottest
    key's pair count, since that key lands in one bucket per row and
    collisions only add."""
    ml, nl = _collect_registers(left, left_keys, width, depth)
    mr, nr = _collect_registers(right, right_keys, width, depth)
    j = None
    h = None
    for d in range(depth):
        row_j = sum(a * b for a, b in zip(ml[d], mr[d]))
        row_h = max(
            (a * b for a, b in zip(ml[d], mr[d])), default=0
        )
        j = row_j if j is None else min(j, row_j)
        h = row_h if h is None else min(h, row_h)
    return KeyedJoinProfile(
        n_left=nl, n_right=nr, join_rows_est=int(j or 0),
        heavy_pair_est=int(h or 0),
    )


def choose_keyed_strategy(profile: KeyedJoinProfile) -> str:
    """'hash' vs 'binned' from predicted pair work: the hash path
    evaluates every same-key pair (J); when J dwarfs the rows shuffled
    (``> PAIR_WORK_FACTOR · (n_l + n_r)``) the per-key nested loops are
    the bottleneck and the composite (key, bin) rewrite — which only
    meets same-bin pairs — wins despite its explode + second shuffle.
    High-cardinality keys (per-key groups of a handful of rows) stay on
    the hash path, where the equi-join IS the plan a 100 TB run wants."""
    scan_work = profile.n_left + profile.n_right
    if profile.join_rows_est > PAIR_WORK_FACTOR * max(scan_work, 1):
        return "binned"
    return "hash"


def warn_if_hot_key(profile: KeyedJoinProfile, where: str) -> bool:
    """Emit the salt-or-warn advisory when one key is predicted to own
    ``>= HOT_PAIR_WARN_SHARE`` of the join's pair work AND that work is
    big enough to matter (beyond what one task absorbs).  Returns
    whether the warning fired (unit-testable)."""
    if (
        profile.hot_share >= HOT_PAIR_WARN_SHARE
        and profile.heavy_pair_est > 1_000_000
    ):
        warnings.warn(
            f"{where}: a single join key is predicted to contribute "
            f"~{profile.hot_share:.0%} of ~{profile.join_rows_est:,} "
            "same-key pair evaluations. The binned rewrite narrows bins "
            "to spread it; for the hash path enable AQE skew join "
            "(spark.sql.adaptive.skewJoin.enabled) or pre-split the key "
            "(salted_join) — see key_skew_report for the distribution.",
            stacklevel=3,
        )
        return True
    return False
