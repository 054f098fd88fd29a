"""Change-data-capture operators: snapshot diffing and change-log
application.

Training-data pipelines are incremental in production: a corpus is
re-crawled, re-filtered, re-scored, and the downstream consumer needs
*what changed* (to re-embed only changed documents) and *the merged
current state* (to train on).  Engine extension — the reference
(/root/reference/src/DataFrameIntervals.jl) has no table-maintenance
surface; these compose Spark built-ins the way `validity_intervals`
(SCD2) does for the history-keeping variant.

Scale notes (100 TB): both operators shuffle on the key columns only.
`snapshot_diff` is one full-outer equi-join with null-safe column
comparison — AQE handles key skew; unchanged rows (the overwhelming
majority of a production diff) are dropped before any downstream
stage.  `apply_cdc` reduces the change log with a partial-aggregated
per-key window, and the typically-small reduced log joins the large
base via a plain equi-join that AQE will broadcast when it fits.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Key = Union[str, Sequence[str]]


def _keys(keys: Key) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Key,
    compare_cols: Sequence[str] | None = None,
    change_col: str = "change",
) -> DataFrame:
    """Row-level delta between two snapshots of the same table:
    one output row per key that was ``added`` (in ``new`` only),
    ``removed`` (in ``old`` only), or ``changed`` (in both, any
    compared column differs under null-safe equality).  Unchanged keys
    produce no output.

    Output: key columns, then ``old_<c>`` / ``new_<c>`` for each
    compared column, then ``change_col`` — the re-embed / re-index
    worklist for an incremental pipeline.

    ``compare_cols`` defaults to every shared non-key column.  Rows
    within a snapshot must be unique per key (a snapshot, not a log);
    duplicate keys would fan out the join.
    """
    ks = _keys(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in ks]
    cmp_cols = list(compare_cols)

    o = old.select(
        *[F.col(k).alias(k) for k in ks],
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in cmp_cols],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in ks],
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in cmp_cols],
    )
    j = o.join(n, ks, "full_outer")
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn(change_col, change)
        .filter(F.col(change_col).isNotNull())
        .select(
            *ks,
            *[f"old_{c}" for c in cmp_cols],
            *[f"new_{c}" for c in cmp_cols],
            change_col,
        )
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: Key,
    ts_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Merge a change log into a snapshot: per key, the latest change
    (by ``ts_col``) wins — an upsert replaces or inserts the row, a
    ``delete_op`` removes it; untouched base rows pass through.  This
    is the MERGE/upsert compaction step of any incremental table
    (the stateless counterpart of `validity_intervals`, which keeps
    the history instead of the latest state).

    ``changes`` must carry the base's payload columns plus ``ts_col``
    and ``op_col``.  Ties on ``ts_col`` within a key break toward the
    delete (an explicit boolean sort key, not op-string order), so the
    merge is deterministic under equal timestamps.

    Output: the base schema (key + payload columns), post-merge.
    """
    ks = _keys(keys)
    payload = [c for c in base.columns if c not in ks]

    w = Window.partitionBy(*ks).orderBy(
        F.col(ts_col).desc(),
        # equal-ts tie: the delete wins, deterministically
        (F.col(op_col) == F.lit(delete_op)).desc(),
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # the reduced log is usually tiny next to a 100 TB base — let AQE
    # broadcast it; the anti-join and the union read it twice, so
    # persist would pay off on a big log (caller's call at real scale)
    survivors = base.join(latest.select(*ks), ks, "left_anti")
    # null-safe: a malformed NULL op must act as an upsert (the row is
    # preserved), not silently satisfy neither branch and vanish
    upserts = latest.filter(
        ~F.col(op_col).eqNullSafe(F.lit(delete_op))
    ).select(*ks, *payload)
    return survivors.select(*ks, *payload).unionByName(upserts)


def incremental_agg_update(
    state: DataFrame,
    diff: DataFrame,
    group_col: str,
    val_col: str,
    n_col: str = "n",
    sum_col: str = "sum_val",
) -> DataFrame:
    """Materialized-view maintenance: update a per-group (count, sum)
    aggregate from a :func:`snapshot_diff` worklist WITHOUT rescanning
    the base table — the 100 TB reason this operator family exists (a
    nightly 0.1% delta should cost 0.1%, not a full re-aggregation).

    ``state`` is the current aggregate ``(group_col, n_col, sum_col)``;
    ``diff`` carries ``old_<group>/new_<group>/old_<val>/new_<val>/
    change`` (so a row whose GROUP changed moves between groups: its
    old value is retracted from the old group and its new value added
    to the new one).  Count and sum must be bigint — retraction needs
    exact invertibility, which floats don't grant (min/max aren't
    incrementally maintainable at all: a retraction below the max
    forces a rescan — keep those in a periodic full refresh).

    Output: the updated state; groups whose count reaches zero are
    dropped.  Shuffles only the (tiny) delta aggregation and one
    equi-join against the state — the base table is never read.
    """
    og, ng = f"old_{group_col}", f"new_{group_col}"
    ov, nv = f"old_{val_col}", f"new_{val_col}"
    ch = F.col("change")
    retract = diff.filter(ch.isin("removed", "changed")).select(
        F.col(og).alias(group_col),
        F.lit(-1).cast("long").alias("__dn"),
        (-F.col(ov).cast("long")).alias("__ds"),
    )
    apply_ = diff.filter(ch.isin("added", "changed")).select(
        F.col(ng).alias(group_col),
        F.lit(1).cast("long").alias("__dn"),
        F.col(nv).cast("long").alias("__ds"),
    )
    deltas = (
        retract.unionByName(apply_)
        .groupBy(group_col)
        .agg(F.sum("__dn").alias("__dn"), F.sum("__ds").alias("__ds"))
    )
    # NULL is a legitimate group value: a name-list equi-join would
    # leave the state's NULL group and the delta's NULL group forever
    # unmatched (two output rows instead of one merged aggregate), so
    # the join condition is null-safe and the key re-coalesced
    st = state.select(
        F.col(group_col).alias("__gs"),
        F.col(n_col).alias("__n0"),
        F.col(sum_col).alias("__s0"),
    )
    merged = st.join(
        deltas.withColumnRenamed(group_col, "__gd"),
        F.col("__gs").eqNullSafe(F.col("__gd")),
        "full_outer",
    ).select(
        F.coalesce(F.col("__gs"), F.col("__gd")).alias(group_col),
        (
            F.coalesce(F.col("__n0"), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).alias(n_col),
        (
            F.coalesce(F.col("__s0"), F.lit(0))
            + F.coalesce(F.col("__ds"), F.lit(0))
        ).alias(sum_col),
    )
    return merged.filter(F.col(n_col) > 0)


def diff_to_changes(
    diff: DataFrame,
    keys: Key,
    compare_cols: Sequence[str],
    ts: int = 1,
    op_col: str = "op",
    ts_col: str = "ts",
    delete_op: str = "D",
) -> DataFrame:
    """Convert a :func:`snapshot_diff` worklist into an
    :func:`apply_cdc` change log: added/changed rows become upserts
    carrying their ``new_*`` values, removed rows become deletes.
    Closes the family's algebra — for any two snapshots,

        ``apply_cdc(old, diff_to_changes(snapshot_diff(old, new)))``

    reconstructs ``new`` exactly (property-tested), which is also the
    cheapest way to SHIP a snapshot update: transfer the delta-sized
    change log, not the table."""
    ks = _keys(keys)
    cols = list(compare_cols)
    ch = F.col("change")
    upserts = diff.filter(ch.isin("added", "changed")).select(
        *ks,
        *[F.col(f"new_{c}").alias(c) for c in cols],
        F.lit(ts).alias(ts_col),
        F.lit("U").alias(op_col),
    )
    deletes = diff.filter(ch == "removed").select(
        *ks,
        *[F.col(f"old_{c}").alias(c) for c in cols],
        F.lit(ts).alias(ts_col),
        F.lit(delete_op).alias(op_col),
    )
    return upserts.unionByName(deletes)
