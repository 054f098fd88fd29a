"""Driver-facing query catalog: Spark implementations + DuckDB oracles.

Each entry in :data:`QUERIES` is ``name -> (spark_fn, oracle_sql|None)``
where ``spark_fn(spark, sf_dir) -> DataFrame`` runs the engine and the
oracle is equivalent ANSI SQL DuckDB executes over the same parquet
(driver compares row count + schema + order-insensitive value hash).

Cross-engine determinism rules applied throughout:

- events.ts: DuckDB reads parquet ``timestamp[ns]`` at µs precision, so
  the Spark side truncates ns → µs*1000 (``event_spans(truncate_us=True)``)
  and the oracle uses ``epoch_ns(ts)`` — identical bigints both sides.
- no floating-point aggregation: sums are bigint (durations, cents);
  doubles only pass through untouched or via min/max (exact).
- window boundaries use the same exact integer floor formula both sides
  (``lo + i*q + (i*r)//n``); all quantities nonnegative so DuckDB's
  truncating ``//`` equals floor.
- struct columns are flattened to scalar BIGINT columns at the query
  boundary; every computed column is aliased identically both sides.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.spans import make_span
from .session import driver_row
from .functions.text import char_count, content_hash, token_count, unique_token_count
from .operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs, simhash_near_pairs
from .operators.coalesce import overlap_profile, span_difference
from .operators.groupby_interval_join import groupby_interval_join
from .operators.interval_join import (
    interval_anti_join,
    interval_join,
    interval_join_by,
    interval_semi_join,
)
from .operators.quantile_windows import data_quantile_windows, dfspan, quantile_windows
from .operators.similarity import cosine_topk, lsh_topk
from .sources import col_to_ns, event_spans, order_spans, read_table

# ---------------------------------------------------------------------------
# shared oracle SQL fragments
# ---------------------------------------------------------------------------

_DAY_NS = 86_400 * 1_000_000_000

# event spans at µs-precision ns (matches Spark truncate_us=True)
_ES_CTE = """sp AS (
  SELECT event_id, user_id, event_type, value, epoch_ns(ts) AS s,
         lead(epoch_ns(ts)) OVER (PARTITION BY user_id
                                  ORDER BY epoch_ns(ts), event_id) AS e
  FROM events
), es AS (SELECT * FROM sp WHERE e IS NOT NULL),
b AS (SELECT min(s) AS lo, max(e) AS hi FROM es)"""


def _w_cte(n: int, label: str, src: str = "b") -> str:
    """n equal-width windows from a (lo, hi) single-row CTE — the exact
    integer floor formula quantile_windows uses."""
    return f"""w AS (
  SELECT lo + i*((hi-lo)//{n}) + (i*((hi-lo)%{n}))//{n} AS w_start,
         lo + (i+1)*((hi-lo)//{n}) + ((i+1)*((hi-lo)%{n}))//{n} AS w_stop,
         CAST(i+1 AS BIGINT) AS {label}
  FROM {src}, generate_series(0,{n - 1}) t(i))"""


_JOIN_COLS_SQL = """es.event_id, es.user_id, es.event_type, es.value,
       es.s AS l_start, es.e AS l_stop, w.w_start, w.w_stop, w.quarter,
       CASE WHEN es.s IS NULL OR w.w_start IS NULL THEN NULL
            ELSE greatest(es.s, w.w_start) END AS i_start,
       CASE WHEN es.s IS NULL OR w.w_start IS NULL THEN NULL
            ELSE least(es.e, w.w_stop) END AS i_stop"""

_OVERLAP_SQL = "greatest(es.s, w.w_start) < least(es.e, w.w_stop)"


def _flat_join(j: DataFrame, label: str = "quarter") -> DataFrame:
    return j.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.col("span_left.start").alias("l_start"),
        F.col("span_left.stop").alias("l_stop"),
        F.col("span_right.start").alias("w_start"),
        F.col("span_right.stop").alias("w_stop"),
        label,
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


def _es_windows(spark, sf_dir, n, label):
    es = event_spans(spark, sf_dir, truncate_us=True)
    # windows bounds via a partial-aggregated per-user min/max/count
    # instead of min/max over the lead()-window span derivation: a user
    # with n >= 2 events contributes spans [ts_1, ts_n), so
    # lo = min over such users of min(ts) and hi = max of max(ts) —
    # identical (lo, hi) by monotonicity of the µs truncation, without
    # paying the key shuffle + per-key sort of event_spans just to SIZE
    # the windows (guide §2.3 "aggregate before you shuffle"; the main
    # job still evaluates event_spans itself).  Measured: the bounds
    # job drops from a 2-stage sort+window pass to one partial agg.
    ev = read_table(spark, sf_dir, "events")
    ts = F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))
    row = (
        ev.groupBy("user_id")
        .agg(
            F.min(ts).alias("lo"),
            F.max(ts).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
    )
    row = driver_row(row)
    span = (
        (int(row["lo"]), int(row["hi"]))
        if row is not None and row["lo"] is not None
        else None
    )
    w = quantile_windows(spark, n, span, label=label)
    return es, w


# ---------------------------------------------------------------------------
# core interval queries
# ---------------------------------------------------------------------------


def q_quantile_windows(spark, sf_dir):
    es, w = _es_windows(spark, sf_dir, 8, "idx")
    return w.select(
        F.col("span.start").alias("w_start"), F.col("span.stop").alias("w_stop"), "idx"
    )


_SQL_QUANTILE_WINDOWS = f"WITH {_ES_CTE},\n{_w_cte(8, 'idx')}\nSELECT w_start, w_stop, idx FROM w"


def q_dfspan(spark, sf_dir):
    es = event_spans(spark, sf_dir, truncate_us=True)
    lo, hi = dfspan(es)
    return spark.range(1).select(F.lit(lo).alias("lo"), F.lit(hi).alias("hi"))


_SQL_DFSPAN = f"WITH {_ES_CTE}\nSELECT lo, hi FROM b"


def q_interval_join_inner(spark, sf_dir):
    es, w = _es_windows(spark, sf_dir, 4, "quarter")
    j = interval_join(es, w, validate="skip", strategy="broadcast_right")
    return _flat_join(j)


_SQL_JOIN_INNER = f"""WITH {_ES_CTE},
{_w_cte(4, "quarter")}
SELECT {_JOIN_COLS_SQL}
FROM es JOIN w ON {_OVERLAP_SQL}"""


def q_interval_join_binned(spark, sf_dir):
    es, w = _es_windows(spark, sf_dir, 4, "quarter")
    j = interval_join(es, w, validate="skip", strategy="binned")
    return _flat_join(j)


def q_interval_join_keepleft(spark, sf_dir):
    es, w = _es_windows(spark, sf_dir, 4, "quarter")
    j = interval_join(
        es,
        w.filter(F.col("quarter") <= 3),
        keepleft=True,
        validate="skip",
        strategy="broadcast_right",
    )
    return _flat_join(j)


_SQL_JOIN_KEEPLEFT = f"""WITH {_ES_CTE},
{_w_cte(4, "quarter")}
SELECT {_JOIN_COLS_SQL}
FROM es LEFT JOIN (SELECT * FROM w WHERE quarter <= 3) w ON {_OVERLAP_SQL}"""


def q_interval_join_prebinned_keepleft(spark, sf_dir):
    """OUTER recovery on the PREBINNED path (interval_join.py:630):
    both sides are written with write_binned_spans (pre-exploded,
    hash-bucketed, storage-resident row ids), read back, and joined
    keepleft — the matched branch is the exchange-free co-located
    equi-join, the padding branch anti-joins the disk-resident first-
    bin ids.  Shares q_interval_join_keepleft's exact fixture and
    oracle (same windows, same quarter<=3 right filter), so prebinned-
    outer must reproduce the on-the-fly outer join bit-for-bit."""
    import os

    from .operators.interval_join import interval_join_prebinned
    from .sources.sinks import read_bucketed, write_binned_spans

    es, w = _es_windows(spark, sf_dir, 4, "quarter")
    lo, hi = dfspan(es)
    width = max((hi - lo) // 256, 1)
    pid = os.getpid()
    tl, tr = f"dfi_prebin_l_{pid}", f"dfi_prebin_r_{pid}"
    write_binned_spans(
        es, tl, width, 8, path=_fixture_scratch(sf_dir, "prebin_l")
    )
    write_binned_spans(
        w.filter(F.col("quarter") <= 3),
        tr,
        width,
        8,
        path=_fixture_scratch(sf_dir, "prebin_r"),
    )
    j = interval_join_prebinned(
        read_bucketed(spark, tl),
        read_bucketed(spark, tr),
        bin_width=width,
        keepleft=True,
    )
    return _flat_join(j)


def q_interval_join_prebinned_full(spark, sf_dir):
    """FULL outer recovery on the prebinned path: both sides written
    with storage-resident row ids, both preserved — the matched branch
    stays the co-located equi-join, each padding branch anti-joins its
    side's disk-resident first-bin ids.  Shares q_interval_join_full's
    exact fixture and oracle."""
    import os

    from .operators.interval_join import interval_join_prebinned
    from .sources.sinks import read_bucketed, write_binned_spans

    es, w = _es_windows(spark, sf_dir, 8, "idx")
    lo, hi = dfspan(es)
    mid = lo + (hi - lo) // 2
    width = max((hi - lo) // 256, 1)
    pid = os.getpid()
    tl, tr = f"dfi_prebinf_l_{pid}", f"dfi_prebinf_r_{pid}"
    write_binned_spans(
        es.filter(F.col("span.stop") <= F.lit(mid)),
        tl,
        width,
        8,
        path=_fixture_scratch(sf_dir, "prebinf_l"),
    )
    write_binned_spans(
        w.filter(F.col("idx") >= 5),
        tr,
        width,
        8,
        path=_fixture_scratch(sf_dir, "prebinf_r"),
    )
    j = interval_join_prebinned(
        read_bucketed(spark, tl),
        read_bucketed(spark, tr),
        bin_width=width,
        keepleft=True,
        keepright=True,
    )
    return _flat_join(j, label="idx")


def q_interval_join_keepright(spark, sf_dir):
    es, w = _es_windows(spark, sf_dir, 8, "idx")
    lo, hi = dfspan(es)
    mid = lo + (hi - lo) // 2
    es_half = es.filter(F.col("span.stop") <= F.lit(mid))
    j = interval_join(
        es_half, w, keepright=True, validate="skip", strategy="broadcast_right"
    )
    return _flat_join(j, label="idx")


_SQL_JOIN_KEEPRIGHT = f"""WITH {_ES_CTE},
{_w_cte(8, "idx")},
esh AS (SELECT es.* FROM es, b WHERE es.e <= b.lo + (b.hi - b.lo)//2)
SELECT esh.event_id, esh.user_id, esh.event_type, esh.value,
       esh.s AS l_start, esh.e AS l_stop, w.w_start, w.w_stop, w.idx,
       CASE WHEN esh.s IS NULL OR w.w_start IS NULL THEN NULL
            ELSE greatest(esh.s, w.w_start) END AS i_start,
       CASE WHEN esh.s IS NULL OR w.w_start IS NULL THEN NULL
            ELSE least(esh.e, w.w_stop) END AS i_stop
FROM esh RIGHT JOIN w ON greatest(esh.s, w.w_start) < least(esh.e, w.w_stop)"""


def q_interval_join_full(spark, sf_dir):
    es, w = _es_windows(spark, sf_dir, 8, "idx")
    lo, hi = dfspan(es)
    mid = lo + (hi - lo) // 2
    es_half = es.filter(F.col("span.stop") <= F.lit(mid))
    j = interval_join(
        es_half,
        w.filter(F.col("idx") >= 5),
        keepleft=True,
        keepright=True,
        validate="skip",
        strategy="broadcast_right",
    )
    return _flat_join(j, label="idx")


_SQL_JOIN_FULL = f"""WITH {_ES_CTE},
{_w_cte(8, "idx")},
esh AS (SELECT es.* FROM es, b WHERE es.e <= b.lo + (b.hi - b.lo)//2),
w58 AS (SELECT * FROM w WHERE idx >= 5)
SELECT esh.event_id, esh.user_id, esh.event_type, esh.value,
       esh.s AS l_start, esh.e AS l_stop, w.w_start, w.w_stop, w.idx,
       CASE WHEN esh.s IS NULL OR w.w_start IS NULL THEN NULL
            ELSE greatest(esh.s, w.w_start) END AS i_start,
       CASE WHEN esh.s IS NULL OR w.w_start IS NULL THEN NULL
            ELSE least(esh.e, w.w_stop) END AS i_stop
FROM esh FULL OUTER JOIN w58 w ON greatest(esh.s, w.w_start) < least(esh.e, w.w_stop)"""


def q_interval_join_closed(spark, sf_dir):
    """bounds='[]' (closed-closed): touching spans DO match — the
    reference's native Interval{T,Closed,Closed} semantics."""
    es, w = _es_windows(spark, sf_dir, 4, "quarter")
    j = interval_join(
        es, w, bounds="[]", validate="skip", strategy="broadcast_right"
    )
    return _flat_join(j)


_SQL_JOIN_CLOSED = f"""WITH {_ES_CTE},
{_w_cte(4, "quarter")}
SELECT {_JOIN_COLS_SQL}
FROM es JOIN w ON greatest(es.s, w.w_start) <= least(es.e, w.w_stop)"""


def q_interval_join_openclosed(spark, sf_dir):
    """bounds='(]' (open-closed): strict nonempty-intersection semantics
    like '[)' — touching endpoints never overlap, zero-width spans are
    empty — but intervals are interpreted as (start, stop]."""
    es, w = _es_windows(spark, sf_dir, 6, "idx")
    j = interval_join(
        es, w, bounds="(]", validate="skip", strategy="broadcast_right"
    )
    return _flat_join(j, label="idx")


_SQL_JOIN_OPENCLOSED = f"""WITH {_ES_CTE},
{_w_cte(6, "idx")}
SELECT es.event_id, es.user_id, es.event_type, es.value,
       es.s AS l_start, es.e AS l_stop, w.w_start, w.w_stop, w.idx,
       CASE WHEN es.s IS NULL OR w.w_start IS NULL THEN NULL
            ELSE greatest(es.s, w.w_start) END AS i_start,
       CASE WHEN es.s IS NULL OR w.w_start IS NULL THEN NULL
            ELSE least(es.e, w.w_stop) END AS i_stop
FROM es JOIN w ON {_OVERLAP_SQL}"""


def q_interval_join_float(spark, sf_dir):
    """Double-endpoint (generic T) spans: event values as float
    intervals [v, v + 1/32) joined against 8 fixed dyadic windows.
    All window boundaries are dyadic rationals, so every comparison is
    bit-exact across engines."""
    from .functions.spans import make_span_double

    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    left = ev.select(
        "event_id",
        make_span_double(F.col("value"), F.col("value") + F.lit(0.03125)).alias(
            "span"
        ),
    )
    w = spark.range(8).select(
        (F.col("id") + 1).alias("idx"),
        make_span_double(
            F.col("id") / F.lit(8.0), (F.col("id") + 1) / F.lit(8.0)
        ).alias("span"),
    )
    j = interval_join(left, w, validate="skip", strategy="broadcast_right")
    return j.select(
        "event_id",
        F.col("span_left.start").alias("l_start"),
        F.col("span_left.stop").alias("l_stop"),
        F.col("span_right.start").alias("w_start"),
        F.col("span_right.stop").alias("w_stop"),
        "idx",
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


_SQL_JOIN_FLOAT = """WITH ev AS (
  SELECT event_id, value AS s, value + 0.03125 AS e
  FROM events WHERE value IS NOT NULL
), w AS (
  SELECT CAST(i + 1 AS BIGINT) AS idx, i/8.0 AS ws, (i+1)/8.0 AS we
  FROM generate_series(0, 7) t(i)
)
SELECT ev.event_id, ev.s AS l_start, ev.e AS l_stop,
       w.ws AS w_start, w.we AS w_stop, w.idx,
       greatest(ev.s, w.ws) AS i_start, least(ev.e, w.we) AS i_stop
FROM ev JOIN w ON greatest(ev.s, w.ws) < least(ev.e, w.we)"""


def q_interval_join_mixed_bounds(spark, sf_dir):
    """Per-side bounds pair: closed-closed event spans joined against
    closed-open windows — the reference's joins across DIFFERENT
    Interval{T,L,R} types (src:31-46).  A span whose stop lands exactly
    on a window start matches here (its closed stop binds against the
    window's closed start) but not under uniform '[)'.  Runs the binned
    strategy so the per-side bin/empty-filter logic is oracle-gated at
    scale, not just property-tested."""
    es, w = _es_windows(spark, sf_dir, 6, "idx")
    j = interval_join(
        es, w, bounds=("[]", "[)"), validate="skip", strategy="binned"
    )
    return _flat_join(j, label="idx")


# mixed ('[]', '[)') predicate: lower bound of the intersection is always
# closed (both lower bounds are '['), the upper is closed only when the
# LEFT supplies it (l.e < w_stop) -> overlap iff lo < hi, or lo == hi
# binding with the left's closed stop
_SQL_JOIN_MIXED_BOUNDS = f"""WITH {_ES_CTE},
{_w_cte(6, "idx")}
SELECT es.event_id, es.user_id, es.event_type, es.value,
       es.s AS l_start, es.e AS l_stop, w.w_start, w.w_stop, w.idx,
       CASE WHEN es.s IS NULL OR w.w_start IS NULL THEN NULL
            ELSE greatest(es.s, w.w_start) END AS i_start,
       CASE WHEN es.s IS NULL OR w.w_start IS NULL THEN NULL
            ELSE least(es.e, w.w_stop) END AS i_stop
FROM es JOIN w
  ON greatest(es.s, w.w_start) < least(es.e, w.w_stop)
  OR (greatest(es.s, w.w_start) = least(es.e, w.w_stop) AND es.e < w.w_stop)"""


def q_interval_join_rowbounds(spark, sf_dir):
    """Per-ROW bound flavors (full Interval{T,L,R} element parity,
    reference src:31-35): every event span and every window carries its
    own '[)' / '(]' / '[]' / '()' flavor derived from its id — one
    table freely mixing closed and open rows, joined in a single pass
    (no user-side split by flavor).  Binned strategy so the per-row
    bin-coverage and empty-span logic is oracle-gated, not just
    property-tested."""
    es, w = _es_windows(spark, sf_dir, 6, "idx")
    flav = F.array(F.lit("[)"), F.lit("(]"), F.lit("[]"), F.lit("()"))
    es = es.withColumn(
        "bnd", F.element_at(flav, F.pmod(F.col("event_id"), 4).cast("int") + 1)
    )
    w = w.withColumn(
        "wbnd", F.element_at(flav, F.pmod(F.col("idx"), 4).cast("int") + 1)
    )
    j = interval_join(
        es, w, bounds=("bnd", "wbnd"), validate="skip", strategy="binned"
    )
    return j.select(
        "event_id",
        "user_id",
        "bnd",
        "wbnd",
        F.col("span_left.start").alias("l_start"),
        F.col("span_left.stop").alias("l_stop"),
        F.col("span_right.start").alias("w_start"),
        F.col("span_right.stop").alias("w_stop"),
        "idx",
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


_SQL_FLAV = "CASE {x} % 4 WHEN 0 THEN '[)' WHEN 1 THEN '(]' WHEN 2 THEN '[]' ELSE '()' END"

# per-row predicate: lo < hi, or lo == hi with the binding lower and
# upper bounds both closed (the side supplying the larger start / the
# smaller stop supplies the bound; exact ties need both sides closed)
_SQL_JOIN_ROWBOUNDS = f"""WITH {_ES_CTE},
{_w_cte(6, "idx")},
eb AS (SELECT es.*, {_SQL_FLAV.format(x='event_id')} AS bnd FROM es),
wb AS (SELECT w.*, {_SQL_FLAV.format(x='idx')} AS wbnd FROM w)
SELECT eb.event_id, eb.user_id, eb.bnd, wb.wbnd,
       eb.s AS l_start, eb.e AS l_stop, wb.w_start, wb.w_stop, wb.idx,
       greatest(eb.s, wb.w_start) AS i_start,
       least(eb.e, wb.w_stop) AS i_stop
FROM eb JOIN wb
  ON greatest(eb.s, wb.w_start) < least(eb.e, wb.w_stop)
  OR (greatest(eb.s, wb.w_start) = least(eb.e, wb.w_stop)
      AND (CASE WHEN eb.s > wb.w_start THEN substr(eb.bnd, 1, 1) = '['
                WHEN eb.s < wb.w_start THEN substr(wb.wbnd, 1, 1) = '['
                ELSE substr(eb.bnd, 1, 1) = '[' AND substr(wb.wbnd, 1, 1) = '['
           END)
      AND (CASE WHEN eb.e < wb.w_stop THEN substr(eb.bnd, 2, 1) = ']'
                WHEN eb.e > wb.w_stop THEN substr(wb.wbnd, 2, 1) = ']'
                ELSE substr(eb.bnd, 2, 1) = ']' AND substr(wb.wbnd, 2, 1) = ']'
           END))"""


def q_interval_join_float_binned(spark, sf_dir):
    """The binned strategy over double-endpoint spans (IEEE float
    binning, `_float_floor_div`): same query as q_interval_join_float,
    same oracle — the two physical plans must hash-match."""
    from .functions.spans import make_span_double

    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    left = ev.select(
        "event_id",
        make_span_double(F.col("value"), F.col("value") + F.lit(0.03125)).alias(
            "span"
        ),
    )
    w = spark.range(8).select(
        (F.col("id") + 1).alias("idx"),
        make_span_double(
            F.col("id") / F.lit(8.0), (F.col("id") + 1) / F.lit(8.0)
        ).alias("span"),
    )
    j = interval_join(
        left, w, validate="skip", strategy="binned", bin_width=0.125
    )
    return j.select(
        "event_id",
        F.col("span_left.start").alias("l_start"),
        F.col("span_left.stop").alias("l_stop"),
        F.col("span_right.start").alias("w_start"),
        F.col("span_right.stop").alias("w_stop"),
        "idx",
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


def q_groupby_interval_join_agg(spark, sf_dir):
    es, w = _es_windows(spark, sf_dir, 4, "quarter")
    g = groupby_interval_join(
        es, w, groups=["quarter", "event_type"], validate="skip",
        strategy="broadcast_right",
    )
    return g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("span.stop") - F.col("span.start")).alias("sum_dur"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )


_SQL_GROUPBY_AGG = f"""WITH {_ES_CTE},
{_w_cte(4, "quarter")}
SELECT w.quarter, es.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(least(es.e, w.w_stop) - greatest(es.s, w.w_start)) AS BIGINT) AS sum_dur,
       min(es.value) AS min_v, max(es.value) AS max_v
FROM es JOIN w ON {_OVERLAP_SQL}
GROUP BY w.quarter, es.event_type"""


def q_time_weighted_avg(spark, sf_dir):
    """Duration-weighted value statistics per (window, event_type) —
    THE canonical biosignal rollup (windows x grouped interval join x
    intersection-weighted agg).  Fixed-point arithmetic end to end:
    value floored to millis, durations to whole seconds, so both
    engines sum identical bigints in any order (sums of doubles are
    order-dependent and would not hash-match)."""
    es, w = _es_windows(spark, sf_dir, 6, "win")
    g = groupby_interval_join(
        es, w, groups=["win", "event_type"], validate="skip",
        strategy="broadcast_right",
    )
    v_milli = F.floor(F.col("value") * 1000).cast("long")
    dur_s = F.expr("(span.stop - span.start) DIV 1000000000")
    return g.agg(
        F.sum(v_milli * dur_s).alias("sum_vdur"),
        F.sum(dur_s).alias("sum_dur_s"),
        F.count(F.lit(1)).alias("n"),
    )


_SQL_TIME_WEIGHTED = f"""WITH {_ES_CTE},
{_w_cte(6, "win")}
SELECT w.win, es.event_type,
       CAST(sum(CAST(floor(es.value * 1000) AS BIGINT)
                * ((least(es.e, w.w_stop) - greatest(es.s, w.w_start))
                   // 1000000000)) AS BIGINT) AS sum_vdur,
       CAST(sum((least(es.e, w.w_stop) - greatest(es.s, w.w_start))
                // 1000000000) AS BIGINT) AS sum_dur_s,
       CAST(count(*) AS BIGINT) AS n
FROM es JOIN w ON {_OVERLAP_SQL}
GROUP BY w.win, es.event_type"""


def q_orders_interval_join(spark, sf_dir):
    os_ = order_spans(spark, sf_dir)
    w = quantile_windows(spark, 12, os_, label="idx")
    j = interval_join(os_, w, validate="skip", strategy="broadcast_right")
    return j.groupBy("idx").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("sum_cents"),
    )


_SQL_ORDERS_JOIN = """WITH os AS (
  SELECT o_orderkey, o_totalprice, epoch_ns(o_orderdate) AS s,
         epoch_ns(o_orderdate) + 2592000000000000 AS e
  FROM orders
), ob AS (SELECT min(s) AS lo, max(e) AS hi FROM os),
w AS (
  SELECT lo + i*((hi-lo)//12) + (i*((hi-lo)%12))//12 AS w_start,
         lo + (i+1)*((hi-lo)//12) + ((i+1)*((hi-lo)%12))//12 AS w_stop,
         CAST(i+1 AS BIGINT) AS idx
  FROM ob, generate_series(0,11) t(i))
SELECT w.idx, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(os.o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM os JOIN w ON greatest(os.s, w.w_start) < least(os.e, w.w_stop)
GROUP BY w.idx"""


def q_interval_join_string(spark, sf_dir):
    """STRING-endpoint span join (reference parity: Interval{T} over
    ANY ordered T, src:31-46 — the last uncovered endpoint class):
    customer names as degenerate [name, name||chr(1)) string spans
    stabbed into literal dictionary ranges, then per-range counts and
    the lexicographic min/max of the intersections.  Strings are
    ordered but not arithmetic, so the engine routes this through the
    broadcast strategy (the binned rewrite is typed-rejected for
    string endpoints) with intersection via type-generic
    greatest/least."""
    from .functions.spans import make_span_string

    cust = read_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey"),
        make_span_string(
            F.col("c_name"), F.concat(F.col("c_name"), F.lit("\x01"))
        ).alias("span"),
    )
    bands = [("lo", "Customer#000000000", "Customer#000000400"),
             ("mid", "Customer#000000400", "Customer#000000900"),
             ("hi", "Customer#000000900", "Customer#999999999")]
    ranges = spark.createDataFrame(
        bands, "label string, lo string, hi string"
    ).select("label", make_span_string("lo", "hi").alias("span"))
    j = interval_join(
        pts, ranges, validate="skip", strategy="broadcast_right"
    )
    return j.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("span.start")).alias("first_name"),
        F.max(F.col("span.start")).alias("last_name"),
    )


def _sql_join_string() -> str:
    vals = (
        "('lo', 'Customer#000000000', 'Customer#000000400'), "
        "('mid', 'Customer#000000400', 'Customer#000000900'), "
        "('hi', 'Customer#000000900', 'Customer#999999999')"
    )
    return f"""WITH r(label, lo, hi) AS (VALUES {vals})
SELECT label, CAST(count(*) AS BIGINT) AS n,
       min(greatest(c_name, lo)) AS first_name,
       max(greatest(c_name, lo)) AS last_name
FROM customer JOIN r
  ON greatest(c_name, lo) < least(c_name || chr(1), hi)
GROUP BY label"""


def q_interval_join_date(spark, sf_dir):
    """Generic-endpoint-domain join (reference parity: arbitrary
    ordered T, src:31-46): 30-day order spans with DATE endpoints
    joined against quarterly DATE windows.  interval_join adapts the
    date structs to exact day ordinals internally (binned integral
    path) and restores DATE on output — this query round-trips the
    adapter end-to-end against DuckDB's native date-overlap join."""
    from .functions.spans import exact_floor_div
    from .sources import col_to_ns

    day_ns = 86_400_000_000_000
    od = read_table(spark, sf_dir, "orders")
    start_ns = col_to_ns(
        F.col("o_orderdate"), od.schema["o_orderdate"].dataType
    )
    start_date = F.date_from_unix_date(
        exact_floor_div(start_ns, day_ns).cast("int")
    )
    orders = od.select(
        "o_orderkey",
        F.struct(
            start_date.alias("start"),
            F.date_add(start_date, 30).alias("stop"),
        ).alias("span"),
    )
    epoch = F.lit("1995-01-01").cast("date")
    quarters = spark.range(28).select(
        F.col("id").cast("long").alias("q_id"),
        F.struct(
            F.add_months(epoch, F.col("id").cast("int") * 3).alias("start"),
            F.add_months(epoch, (F.col("id").cast("int") + 1) * 3).alias(
                "stop"
            ),
        ).alias("span"),
    )
    j = interval_join(
        orders, quarters, validate="skip", strategy="broadcast_right"
    )
    return j.select(
        "o_orderkey",
        "q_id",
        F.col("span_left.start").alias("o_start"),
        F.col("span_left.stop").alias("o_stop"),
        F.col("span_right.start").alias("q_start"),
        F.col("span_right.stop").alias("q_stop"),
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


_SQL_JOIN_DATE = """WITH o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + 30 AS e
  FROM orders
), q AS (
  SELECT CAST(i AS BIGINT) AS q_id,
         CAST(DATE '1995-01-01' + to_months(CAST(3*i AS INT)) AS DATE) AS s,
         CAST(DATE '1995-01-01' + to_months(CAST(3*(i+1) AS INT)) AS DATE)
           AS e
  FROM (SELECT unnest(range(0, 28)) AS i)
)
SELECT o.o_orderkey, q.q_id,
       o.s AS o_start, o.e AS o_stop,
       q.s AS q_start, q.e AS q_stop,
       greatest(o.s, q.s) AS i_start, least(o.e, q.e) AS i_stop
FROM o JOIN q ON greatest(o.s, q.s) < least(o.e, q.e)"""


def q_lineitem_interval_agg(spark, sf_dir):
    """Fused interval-join + group over the engine's largest input
    (~600k rows at sf0.1): 7-day shipping spans x 8 equal windows,
    grouped by (window, returnflag)."""
    li = read_table(spark, sf_dir, "lineitem")
    start_ns = col_to_ns(F.col("l_shipdate"), li.schema["l_shipdate"].dataType)
    day_ns = 86_400_000_000_000
    spans = li.select(
        "l_returnflag",
        "l_quantity",
        "l_extendedprice",
        make_span(start_ns, start_ns + F.lit(7) * day_ns).alias("span"),
    )
    w = quantile_windows(spark, 8, spans, label="idx")
    g = groupby_interval_join(
        spans, w, groups=["idx", "l_returnflag"], validate="skip",
        strategy="broadcast_right",
    )
    return g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_qty_c"
        ),
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("sum_price_c"),
    )


_SQL_LINEITEM_AGG = """WITH sp AS (
  SELECT l_returnflag, l_quantity, l_extendedprice,
         epoch_ns(l_shipdate) AS s,
         epoch_ns(l_shipdate) + 604800000000000 AS e
  FROM lineitem
), b AS (SELECT min(s) AS lo, max(e) AS hi FROM sp),
w AS (
  SELECT lo + i*((hi-lo)//8) + (i*((hi-lo)%8))//8 AS w_start,
         lo + (i+1)*((hi-lo)//8) + ((i+1)*((hi-lo)%8))//8 AS w_stop,
         CAST(i+1 AS BIGINT) AS idx
  FROM b, generate_series(0,7) t(i))
SELECT w.idx, sp.l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(sp.l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(floor(sp.l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_price_c
FROM sp JOIN w ON greatest(sp.s, w.w_start) < least(sp.e, w.w_stop)
GROUP BY w.idx, sp.l_returnflag"""


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy(content_hash(F.col("text")).alias("h")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n")
    )


_SQL_DEDUP_EXACT = """SELECT md5(text) AS h, min(doc_id) AS keep_id,
       CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY md5(text)"""


def q_readability(spark, sf_dir):
    """Readability scoring (functions/text.py: flesch_reading_ease /
    fk_grade_level): exact integer word / sentence-terminator /
    vowel-group counts per document, then the two public formulas each
    as ONE fixed-order double expression (NULL on zero words) — the
    quality-filtering feature set of curation pipelines, pure
    expressions, zero shuffles beyond the scan."""
    from .functions.text import (
        fk_grade_level,
        flesch_reading_ease,
        sentence_count,
        syllable_count,
        token_count,
    )

    docs = read_table(spark, sf_dir, "documents")
    out = docs.select(
        "doc_id",
        token_count("text").cast("long").alias("n_words"),
        sentence_count("text").cast("long").alias("n_sentences"),
        syllable_count("text").cast("long").alias("n_syllables"),
    )
    return out.select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        F.round(
            flesch_reading_ease("n_words", "n_sentences", "n_syllables"), 6
        ).alias("flesch"),
        F.round(
            fk_grade_level("n_words", "n_sentences", "n_syllables"), 6
        ).alias("fk_grade"),
    )


_SQL_READABILITY = r"""WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 THEN round(
         206.835
         - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
         6) END AS flesch,
       CASE WHEN n_words > 0 THEN round(
         0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         - 15.59, 6) END AS fk_grade
FROM c"""


def q_code_detect(spark, sf_dir):
    """Code-vs-prose routing (functions/text.py: code_signal_counts /
    code_score_ppt): exact symbol / keyword / indented-line counts per
    document, weighted into a clamped integer ppt score and a
    threshold flag — all truncating integer arithmetic, pure
    expressions, zero shuffles.  The oracle replays the three regexes
    and the identical weight/threshold constants."""
    from .functions.text import (
        CODE_PPT_THRESHOLD,
        code_score_ppt,
        code_signal_counts,
    )

    docs = read_table(spark, sf_dir, "documents")
    counts = code_signal_counts("text")
    out = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_t"),
        *[c.cast("long").alias(n) for n, c in counts],
    )
    return out.select(
        "doc_id", "n_sym", "n_kw", "n_indent",
        code_score_ppt(n_chars="n_chars_t").alias("code_ppt"),
    ).withColumn(
        "is_code", (F.col("code_ppt") >= CODE_PPT_THRESHOLD).cast("long")
    )


def _sql_code_detect() -> str:
    from .functions.text import (
        CODE_PPT_THRESHOLD,
        _CODE_INDENT_RE,
        _CODE_KW_RE,
        _CODE_SYM_RE,
        _CODE_W_INDENT,
        _CODE_W_KW,
        _CODE_W_SYM,
    )

    return f"""WITH c AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS nc,
         CAST(len(regexp_extract_all(text, '{_CODE_SYM_RE}'))
              AS BIGINT) AS n_sym,
         CAST(len(regexp_extract_all(text, '{_CODE_KW_RE}'))
              AS BIGINT) AS n_kw,
         CAST(len(regexp_extract_all(text, '{_CODE_INDENT_RE}'))
              AS BIGINT) AS n_indent
  FROM documents
), s AS (
  SELECT doc_id, n_sym, n_kw, n_indent,
         least(1000, ((n_sym * {_CODE_W_SYM} + n_kw * {_CODE_W_KW}
                       + n_indent * {_CODE_W_INDENT}) * 1000)
                     // greatest(nc, 1)) AS code_ppt
  FROM c
)
SELECT doc_id, n_sym, n_kw, n_indent, code_ppt,
       CAST(CASE WHEN code_ppt >= {CODE_PPT_THRESHOLD} THEN 1 ELSE 0 END
            AS BIGINT) AS is_code
FROM s"""


def q_ab_test(spark, sf_dir):
    """A/B proportion z-test (profile.py: proportion_ztest): users
    split by parity into arms A/B, success = the event is a purchase,
    segmented by day-of-week — exact pivoted counts from ONE
    partial-agged pass, rates as truncating ppm, z as a single
    fixed-order formula with degenerate-pool guards."""
    from .operators.profile import proportion_ztest

    ev = read_table(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(2)).alias("variant"),
        (F.col("event_type") == "purchase").alias("converted"),
        F.expr(f"pmod(ts div {_DAY_NS}, 7)").alias("dow"),
    )
    return proportion_ztest(ev, "variant", "converted", by=["dow"])


_SQL_AB_TEST = f"""WITH ev AS (
  SELECT user_id % 2 AS variant,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
         (epoch_ns(ts) // {_DAY_NS}) % 7 AS dow
  FROM events
), g AS (
  SELECT dow,
         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_b
  FROM ev GROUP BY dow
)
SELECT dow, n_a, c_a, n_b, c_b,
       CASE WHEN n_a > 0 THEN (c_a * 1000000) // n_a END AS rate_a_ppm,
       CASE WHEN n_b > 0 THEN (c_b * 1000000) // n_b END AS rate_b_ppm,
       CASE WHEN n_a > 0 AND n_b > 0 AND c_a + c_b > 0
             AND c_a + c_b < n_a + n_b THEN
         round((CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
               / sqrt((CAST(c_a + c_b AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 - (CAST(c_a + c_b AS DOUBLE)
                                / CAST(n_a + n_b AS DOUBLE)))
                      * (1.0 / CAST(n_a AS DOUBLE)
                         + 1.0 / CAST(n_b AS DOUBLE))), 6)
       END AS z
FROM g"""


def q_text_token_stats(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("sum_tokens"),
        F.sum(char_count(F.col("text")).cast("long")).alias("sum_chars"),
    )


_SQL_TOKEN_STATS = r"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)) AS BIGINT) AS sum_tokens,
       CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang"""


def q_text_quality(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        unique_token_count(F.col("text")).cast("long").alias("n_uniq"),
        char_count(F.col("text")).cast("long").alias("n_chars"),
    )


_SQL_TEXT_QUALITY = r"""SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_uniq,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents"""


def q_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split of documents by key
    hash (partition-layout-independent, engine-reproducible), verified
    via per-(split, lang) counts."""
    from .operators.sampling import hash_split

    docs = read_table(spark, sf_dir, "documents")
    out = hash_split(docs, "doc_id", (0.8, 0.1, 0.1))
    return out.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(char_count(F.col("text"))).cast("long").alias("sum_chars"),
    )


_SQL_HASH_SPLIT = """WITH b AS (
  SELECT lang, length(text) AS chars,
         ('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 15))::BIGINT
           % 1000000 AS bkt
  FROM documents
), lab AS (
  SELECT lang, chars,
         CASE WHEN bkt < 800000 THEN 'train'
              WHEN bkt < 900000 THEN 'val'
              ELSE 'test' END AS split
  FROM b
)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(chars) AS BIGINT) AS sum_chars
FROM lab GROUP BY split, lang"""


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 characteristic terms per document, TF x integer-scaled IDF
    (exact bigint arithmetic both engines — see operators/tfidf.py)."""
    from .operators.tfidf import tf_idf_top_terms

    docs = read_table(spark, sf_dir, "documents")
    return tf_idf_top_terms(docs, k=3)


_SQL_TFIDF = r"""WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
), tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS N FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf * ((n.N * 1000000) // dfq.df) AS BIGINT) AS score
  FROM tf JOIN dfq USING (term), n
), ranked AS (
  SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS BIGINT) AS rank,
         term, score
  FROM scored)
SELECT doc_id, rank, term, score FROM ranked WHERE rank <= 3"""


def q_similarity_topk(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk(emb, queries, k=5)
    return out.select(
        "q_id", F.col("rank").cast("long").alias("rank"), "n_id", "score"
    )


_SQL_SIMILARITY_TOPK = """WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v
  FROM embeddings
), n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM e),
q AS (SELECT * FROM n WHERE vec_id < 5),
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         CAST(list_dot_product(c.v, q.v) AS DOUBLE)
           / sqrt(CAST(c.nrm AS DOUBLE) * CAST(q.nrm AS DOUBLE)) AS score
  FROM n c, q WHERE c.vec_id <> q.vec_id
), ranked AS (
  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, n_id) AS BIGINT) AS rank,
         n_id, round(score, 6) AS score
  FROM pairs)
SELECT q_id, rank, n_id, score FROM ranked WHERE rank <= 5"""


def q_random_projection(spark, sf_dir):
    """Deterministic JL sign projection of the 64-d embeddings to 8
    bigint components — map-only pure expressions, exact fixed-point
    sums, mirrored bit-for-bit by the DuckDB 2-arg-lambda oracle.  The
    pre-ANN dimensionality-reduction step at corpus scale."""
    from .operators.similarity import random_projection

    emb = read_table(spark, sf_dir, "embeddings")
    proj = random_projection(emb, out_dims=8)
    return proj.select("vec_id", F.posexplode("proj")).select(
        "vec_id",
        F.col("pos").cast("long").alias("j"),
        F.col("col").alias("y"),
    )


_SQL_RANDOM_PROJECTION = """WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v
  FROM embeddings
), js AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS j)
SELECT e.vec_id, js.j,
       CAST(CASE WHEN len(e.v) = 0 THEN 0
            ELSE list_sum(list_transform(e.v, (x, i) ->
              x * (1 - 2 * ((xor((i-1)*73856093, js.j*19349663) >> 13)
                            & 1))))
            END AS BIGINT) AS y
FROM e, js"""


def q_lang_id(spark, sf_dir):
    from .functions.text import lang_id

    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id(F.col("text")).alias("pred"))


def _lang_sql():
    from .functions.text import LANG_SIGNALS

    scores = ", ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lang}"
        for lang, pat in LANG_SIGNALS.items()
    )
    langs = list(LANG_SIGNALS)
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    # tie-break = signal order (first language wins), 'und' on all-zero —
    # the same chained-when order the Spark expression builds
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{l} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return (
        f"WITH s AS (SELECT doc_id, lang, {scores} FROM documents)\n"
        f"SELECT doc_id, lang, {case} AS pred FROM s"
    )


_SQL_LANG_ID = _lang_sql()


def q_quality_score(spark, sf_dir):
    from .functions.text import quality_score

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(quality_score(F.col("text")), 6).alias("quality")
    )


_SQL_QUALITY = r"""WITH m AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS DOUBLE) AS n_uniq,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents)
SELECT doc_id,
       round((CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.5 END)
           * (CASE WHEN n_punct / greatest(n_chars, 1.0) < 0.2 THEN 1.0 ELSE 0.6 END)
           * (n_uniq / greatest(n_tok, 1.0)), 6) AS quality
FROM m"""


def q_training_prep(spark, sf_dir):
    """End-to-end training-data prep DAG: exact-dedup survivors →
    quality gate → per-language corpus stats.  One shuffle for the
    dedup group, one semi-join back, one final agg — the composed
    shape a 100 TB preprocessing run uses."""
    from .functions.text import quality_score
    from .operators.dedup import exact_dedup_keep

    docs = read_table(spark, sf_dir, "documents")
    kept = exact_dedup_keep(docs)
    good = kept.filter(F.round(quality_score(F.col("text")), 6) >= 0.5)
    return good.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long")).alias("sum_tokens"),
    )


_SQL_TRAINING_PREP = r"""WITH keep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), kept AS (
  SELECT d.* FROM documents d JOIN keep k ON d.doc_id = k.doc_id
), m AS (
  SELECT doc_id, lang, text,
         CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS DOUBLE) AS n_uniq,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM kept
), scored AS (
  SELECT *, round((CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.5 END)
       * (CASE WHEN n_punct / greatest(n_chars, 1.0) < 0.2 THEN 1.0 ELSE 0.6 END)
       * (n_uniq / greatest(n_tok, 1.0)), 6) AS q
  FROM m)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)) AS BIGINT) AS sum_tokens
FROM scored WHERE q >= 0.5 GROUP BY lang"""


def q_asof_join(spark, sf_dir):
    from .operators.asof_join import asof_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))).alias("ts"),
    )
    left = ev.select("event_id", "user_id", "event_type", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(left, purchases, on="ts", by="user_id")
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.col("ts_right").alias("purchase_ts"),
        F.col("purchase_value_right").alias("purchase_value"),
    )


_SQL_ASOF = """WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_ns(ts) AS t, value FROM events
), p AS (
  SELECT user_id, t, max(value) AS pv FROM ev
  WHERE event_type = 'purchase' GROUP BY user_id, t
)
SELECT e.event_id, e.user_id, e.event_type, e.t AS ts,
       p.t AS purchase_ts, p.pv AS purchase_value
FROM ev e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.t >= p.t"""


def q_retention_weekly(spark, sf_dir):
    """WEEKLY retention matrix — complements q_retention_cohorts (which
    anchors each user to their FIRST-activity day): here EVERY active
    week is a cohort, and (cohort_week, offset) counts users active in
    both weeks — the rolling engagement matrix.  Shape: one distinct
    over (user, week) — shuffle bounded by active pairs, not events —
    then a self equi-join on user (weeks-per-user is small) and a
    count-distinct per (cohort, offset)."""
    ev = read_table(spark, sf_dir, "events")
    week_ns = 7 * 86_400_000_000_000
    # integer DIV, not float division: epoch-ns exceeds double's 53-bit
    # mantissa, so a float path can misplace week-boundary events
    uw = ev.select(
        "user_id", F.expr(f"ts DIV {week_ns}").alias("week")
    ).distinct()
    a, b = uw.alias("a"), uw.alias("b")
    return (
        a.join(b, "user_id")
        .filter(F.col("b.week") >= F.col("a.week"))
        .groupBy(
            F.col("a.week").alias("cohort_week"),
            (F.col("b.week") - F.col("a.week")).alias("offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_SQL_RETENTION_WEEKLY = """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // (7*86400000000000) AS week
  FROM events
)
SELECT a.week AS cohort_week, b.week - a.week AS "offset",
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM uw a JOIN uw b ON a.user_id = b.user_id AND b.week >= a.week
GROUP BY 1, 2"""


def q_funnel_counts(spark, sf_dir):
    """Conversion funnel view → click → purchase within 6 hours
    (asof_join.py: funnel_counts): every step-1 event anchors a chain
    extended greedily to the earliest strictly-later next-step event —
    s-1 forward as-of joins over a monotonically shrinking anchor set,
    exact by anchor enumeration.  The oracle replays every anchor's
    greedy chain with correlated min() lookups."""
    from .operators.asof_join import funnel_counts

    ev = read_table(spark, sf_dir, "events")
    hour_ns = 3_600_000_000_000
    return funnel_counts(
        ev, ["view", "click", "purchase"], within=6 * hour_ns
    )


def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (asof_join.py: markov_transitions): consecutive
    same-user event-type pairs ordered by (ts, event_id), counted,
    with the empirical transition probability as the truncating
    integer ``n * 1e6 DIV n_from`` — exact ppm, no double sums.  One
    user-keyed window shuffle + a |types|^2-bounded partial agg + a
    broadcast totals join.  The oracle replays lead() over the same
    deterministic order and the identical truncating division."""
    from .operators.asof_join import markov_transitions

    ev = read_table(spark, sf_dir, "events")
    return markov_transitions(ev)


_SQL_MARKOV = """WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_type
  FROM events
), c AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM seq
  WHERE from_type IS NOT NULL AND to_type IS NOT NULL
  GROUP BY from_type, to_type
), t AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
  FROM c GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n, t.n_from,
       (c.n * 1000000) // t.n_from AS prob_ppm
FROM c JOIN t ON t.from_type = c.from_type"""


def q_stream_markov(spark, sf_dir):
    """The STREAMING Markov twin in batch mode (streaming.py:
    stream_markov_pairs — per-key last-type STATE carries the
    batch-boundary transition; mergeable pair counts, probabilities
    are a read-time projection; file-stream parity pytest-gated).
    Batch inputs delegate to markov_transitions; shares its oracle."""
    from .streaming import stream_markov_pairs

    ev = read_table(spark, sf_dir, "events")
    return stream_markov_pairs(ev)


def q_drawdown(spark, sf_dir):
    """Per-user maximum drawdown of the event value series
    (timeseries.py: max_drawdown): largest decline below the running
    peak, absolute and relative — every double op is per-row then
    MAX-reduced (order-independent, bit-identical cross-engine).  One
    keyed window shuffle whose hash partitioning the following groupBy
    reuses.  The oracle replays the explicit ROWS frame and the same
    guarded ratio."""
    from .operators.timeseries import max_drawdown

    ev = read_table(spark, sf_dir, "events")
    return max_drawdown(ev, "value")


_SQL_DRAWDOWN = """WITH s AS (
  SELECT user_id, value,
         max(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS runmax
  FROM events WHERE value IS NOT NULL
)
SELECT user_id, max(runmax) AS peak,
       max(runmax - value) AS max_drawdown,
       max(CASE WHEN runmax > 0 THEN (runmax - value) / runmax END)
         AS max_drawdown_rel
FROM s GROUP BY user_id"""


def q_benford(spark, sf_dir):
    """Benford first-digit audit of l_extendedprice (profile.py:
    benford_digits): exact per-digit counts, truncating obs ppm, and
    the expected/chi-square columns as single fixed-order double
    formulas over those integers.  One pruned scan + a 9-row agg.  The
    oracle replays the substring digit extraction and the identical
    formula text."""
    from .operators.profile import benford_digits

    li = read_table(spark, sf_dir, "lineitem")
    return benford_digits(li, "l_extendedprice")


_SQL_BENFORD = """WITH v AS (
  SELECT CAST(floor(abs(l_extendedprice)) AS BIGINT) AS iv
  FROM lineitem WHERE floor(abs(l_extendedprice)) >= 1
), d AS (
  SELECT CAST(substr(CAST(iv AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM v
), c AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
), t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
SELECT digit, n, (n * 1000000) // total AS obs_ppm,
       round((ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)) * 1000000,
             6) AS expected_ppm,
       round((CAST(n AS DOUBLE)
              - (CAST(total AS DOUBLE)
                 * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))))
             * (CAST(n AS DOUBLE)
                - (CAST(total AS DOUBLE)
                   * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))))
             / (CAST(total AS DOUBLE)
                * (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))),
             6) AS chi2_term
FROM c, t"""


def q_rfm(spark, sf_dir):
    """RFM customer segmentation (profile.py: rfm_segments): exact
    integer recency/frequency/monetary per customer, quintile scores
    from order statistics at ranks ceil(j*n/5) — computed by the
    engine's iterative-histogram exact selection (no global sort), so
    the whole result is integers and hash-exact.  The oracle replays
    the ranked-CTE order statistics and the identical beat counts."""
    from .operators.profile import rfm_segments

    od = read_table(spark, sf_dir, "orders")
    return rfm_segments(od)


def _sql_rfm() -> str:
    day_ns = 86_400_000_000_000

    def b_cte(name, metric, order):
        return f"""{name} AS (
  SELECT max(CASE WHEN rn = (n*1+4)//5 THEN v END) AS b1,
         max(CASE WHEN rn = (n*2+4)//5 THEN v END) AS b2,
         max(CASE WHEN rn = (n*3+4)//5 THEN v END) AS b3,
         max(CASE WHEN rn = (n*4+4)//5 THEN v END) AS b4
  FROM (SELECT {metric} AS v,
               row_number() OVER (ORDER BY {metric} {order}) AS rn
        FROM c), nn
)"""

    def score(metric, tbl, op):
        terms = " + ".join(
            f"(CASE WHEN {metric} {op} {tbl}.b{j} THEN 1 ELSE 0 END)"
            for j in (1, 2, 3, 4)
        )
        return f"CAST(1 + {terms} AS BIGINT)"

    return f"""WITH o AS (
  SELECT o_custkey, epoch_ns(o_orderdate) // {day_ns} AS d,
         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders
), c AS (
  SELECT o_custkey,
         (SELECT max(d) FROM o) - max(d) AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(cents) AS BIGINT) AS monetary_cents
  FROM o GROUP BY o_custkey
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
{b_cte("rb", "recency_days", "DESC")},
{b_cte("fb", "frequency", "ASC")},
{b_cte("mb", "monetary_cents", "ASC")}
SELECT c.o_custkey, c.recency_days, c.frequency, c.monetary_cents,
       {score("c.recency_days", "rb", "<")} AS r_score,
       {score("c.frequency", "fb", ">")} AS f_score,
       {score("c.monetary_cents", "mb", ">")} AS m_score,
       CAST(({score("c.recency_days", "rb", "<")}) * 100
            + ({score("c.frequency", "fb", ">")}) * 10
            + ({score("c.monetary_cents", "mb", ">")}) AS BIGINT) AS rfm
FROM c, rb, fb, mb"""


def q_item_cooccurrence(spark, sf_dir):
    """Market-basket affinity (profile.py: item_cooccurrence): part
    pairs sharing >= 2 orders with cosine over exact basket counts —
    pair work is Σ_b k_b² (basket-bounded, ~4 lines/order), never
    |items|².  The oracle replays the distinct, the ordered self-join,
    and the identical cosine formula."""
    from .operators.profile import item_cooccurrence

    li = read_table(spark, sf_dir, "lineitem")
    return item_cooccurrence(li, "l_orderkey", "l_partkey", min_pairs=2)


_SQL_ITEM_COOC = """WITH bi AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
), t AS (
  SELECT i, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY i
), p AS (
  SELECT a.i AS item_a, c.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT p.item_a, p.item_b, p.n_ab, ta.n AS n_a, tb.n AS n_b,
       round(CAST(n_ab AS DOUBLE)
             / sqrt(CAST(ta.n AS DOUBLE) * CAST(tb.n AS DOUBLE)),
             6) AS cosine
FROM p JOIN t ta ON ta.i = p.item_a
       JOIN t tb ON tb.i = p.item_b"""


def q_gini(spark, sf_dir):
    """Revenue concentration (ranking.py: gini_coefficient over
    global_order_rank): the Gini index of l_extendedprice cents —
    ascending global ranks from the bucketed decomposition (no
    single-partition window), both sums in decimal(38,0) (rank·cents
    overflows int64), one fixed-order final formula.  The oracle uses
    the plain row_number the decomposition must match exactly."""
    from .operators.ranking import gini_coefficient

    li = read_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
        .alias("cents"),
        F.expr("l_orderkey * 10 + l_linenumber").alias("line_id"),
    )
    return gini_coefficient(li, "cents", "line_id")


_SQL_GINI = """WITH v AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         l_orderkey * 10 + l_linenumber AS line_id
  FROM lineitem
), r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, line_id) AS i
  FROM v
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(cents AS DECIMAL(38,0))) AS sv,
         sum(CAST(i AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0))) AS ws
  FROM r
)
SELECT n, sv::DECIMAL(38,0)::VARCHAR AS sum_v,
       ws::DECIMAL(38,0)::VARCHAR AS weighted_sum,
       round((2.0 * CAST(ws AS DOUBLE)) / (CAST(n AS DOUBLE)
              * CAST(sv AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE),
             6) AS gini
FROM s"""


def q_spearman(spark, sf_dir):
    """Exact Spearman rank correlation (ranking.py: spearman_rho):
    price vs quantity over lineitem — two bucketed global-rank passes
    (tie-broken total order, so the closed form 1 − 6Σd²/(n(n²−1)) is
    exact), Σd² in decimal(38,0), one fixed-order final formula.  The
    oracle uses two plain row_number windows the decomposition must
    match rank-for-rank."""
    from .operators.ranking import spearman_rho

    li = read_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
        .alias("price_c"),
        F.expr("CAST(round(l_quantity) AS BIGINT)").alias("qty"),
        F.expr("l_orderkey * 10 + l_linenumber").alias("line_id"),
    )
    return spearman_rho(li, "price_c", "qty", "line_id")


_SQL_SPEARMAN = """WITH v AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         l_orderkey * 10 + l_linenumber AS line_id
  FROM lineitem
), r AS (
  SELECT row_number() OVER (ORDER BY price_c, line_id) - 1 AS ra,
         row_number() OVER (ORDER BY qty, line_id) - 1 AS rb
  FROM v
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(ra - rb AS DECIMAL(38,0))
             * CAST(ra - rb AS DECIMAL(38,0))) AS sd2
  FROM r
)
SELECT n, sd2::DECIMAL(38,0)::VARCHAR AS sum_d2,
       CASE WHEN n >= 2 THEN
         round(1.0 - (6.0 * CAST(sd2 AS DOUBLE))
               / (CAST(n AS DOUBLE)
                  * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)), 6)
       END AS rho
FROM s"""


def q_global_rank(spark, sf_dir):
    """Distributed global row_number (ranking.py: global_order_rank):
    every event ranked by (fixed-point value DESC, event_id) with NO
    single-partition window — value-range buckets (equal values share
    a bucket, so the order is total), O(buckets) driver prefix
    offsets, per-bucket row_number.  The oracle is the plain global
    row_number the decomposition must reproduce exactly."""
    from .operators.ranking import global_order_rank

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 1_000).cast("long").alias("v_fx"),
    ).filter(F.col("v_fx").isNotNull())
    return global_order_rank(ev, "v_fx", "event_id", descending=True)


_SQL_GLOBAL_RANK = """WITH ev AS (
  SELECT event_id, CAST(round(value * 1000) AS BIGINT) AS v_fx
  FROM events WHERE value IS NOT NULL
)
SELECT event_id, v_fx,
       CAST(row_number() OVER (ORDER BY v_fx DESC, event_id) - 1
            AS BIGINT) AS rank
FROM ev"""


def q_survival_curve(spark, sf_dir):
    """Uncensored survival/duration curve (timeseries.py:
    survival_curve): per-user lifetime in whole days, then for every
    distinct lifetime the exact end count, risk set, survivor ppm and
    discrete hazard ppm — with no censoring Kaplan-Meier reduces to
    the empirical survivor function, so everything is truncating
    integer arithmetic (no cumulative float product).  The cumulative
    window runs over the dimension-sized distinct-duration table."""
    from .operators.timeseries import survival_curve

    ev = read_table(spark, sf_dir, "events")
    return survival_curve(ev)


_SQL_SURVIVAL = """WITH per AS (
  SELECT user_id,
         (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 86400000000000
           AS duration
  FROM events GROUP BY user_id
), g AS (
  SELECT duration, CAST(count(*) AS BIGINT) AS n_end
  FROM per GROUP BY duration
), c AS (
  SELECT duration, n_end,
         sum(n_end) OVER (ORDER BY duration
                          ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n_end) OVER () AS tot
  FROM g
)
SELECT duration, n_end, CAST(tot - cum + n_end AS BIGINT) AS n_at_risk,
       CAST(((tot - cum) * 1000000) // tot AS BIGINT) AS survival_ppm,
       CAST((n_end * 1000000) // (tot - cum + n_end) AS BIGINT)
         AS hazard_ppm
FROM c"""


def q_event_paths(spark, sf_dir):
    """3-step path mining (asof_join.py: event_path_counts): every
    run of three consecutive same-user events counted, >= 5
    occurrences — ONE Window node carries both leads (shared window
    spec), one |types|^3-bounded partial agg.  The oracle replays the
    two leads over the identical deterministic order."""
    from .operators.asof_join import event_path_counts

    ev = read_table(spark, sf_dir, "events")
    return event_path_counts(ev, depth=3, min_count=5)


_SQL_EVENT_PATHS = """WITH seq AS (
  SELECT event_type AS step_1,
         lead(event_type, 1) OVER w AS step_2,
         lead(event_type, 2) OVER w AS step_3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT step_1, step_2, step_3, CAST(count(*) AS BIGINT) AS n
FROM seq
WHERE step_1 IS NOT NULL AND step_2 IS NOT NULL AND step_3 IS NOT NULL
GROUP BY 1, 2, 3 HAVING count(*) >= 5"""


def q_stream_event_paths(spark, sf_dir):
    """The STREAMING path-mining twin in batch mode (streaming.py:
    stream_event_paths — per-key last-(depth-1)-types STATE carries
    boundary-straddling runs; mergeable path counts; file-stream
    parity pytest-gated).  Batch inputs delegate to event_path_counts
    with min_count=1 (the unfiltered feed); the oracle drops the
    HAVING accordingly."""
    from .streaming import stream_event_paths

    ev = read_table(spark, sf_dir, "events")
    return stream_event_paths(ev, depth=3)


_SQL_EVENT_PATHS_ALL = """WITH seq AS (
  SELECT event_type AS step_1,
         lead(event_type, 1) OVER w AS step_2,
         lead(event_type, 2) OVER w AS step_3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT step_1, step_2, step_3, CAST(count(*) AS BIGINT) AS n
FROM seq
WHERE step_1 IS NOT NULL AND step_2 IS NOT NULL AND step_3 IS NOT NULL
GROUP BY 1, 2, 3"""


def q_attribution_linear(spark, sf_dir):
    """Multi-touch attribution, LINEAR model (asof_join.py:
    attribution_weights): each purchase's credit split 1/n over the
    same-user view/click touches in its 6-hour lookback window
    [conv_ts - within, conv_ts) — candidate pairs via the engine's own
    keyed interval join (point touches × lookback windows), weights
    via one per-conversion window.  Exact double 1.0/n (a single
    division — bit-identical cross-engine, unlike a float SUM)."""
    from .operators.asof_join import attribution_weights

    ev = read_table(spark, sf_dir, "events")
    hour_ns = 3_600_000_000_000
    return attribution_weights(
        ev, "purchase", ["view", "click"], within=6 * hour_ns,
        model="linear",
    )


def q_attribution_last(spark, sf_dir):
    """Multi-touch attribution, LAST-TOUCH model: the latest in-window
    touch (ties by event id) takes weight 1 — the row_number pick the
    oracle replays with QUALIFY."""
    from .operators.asof_join import attribution_weights

    ev = read_table(spark, sf_dir, "events")
    hour_ns = 3_600_000_000_000
    return attribution_weights(
        ev, "purchase", ["view", "click"], within=6 * hour_ns,
        model="last_touch",
    )


def _sql_attribution(within_ns: int, model: str) -> str:
    base = f"""WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_ns(ts) AS t FROM events
), conv AS (
  SELECT user_id, event_id AS conv_id, t AS conv_ts
  FROM ev WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id, event_id AS touch_id, event_type AS touch_type,
         t AS touch_ts
  FROM ev WHERE event_type IN ('view', 'click')
), pairs AS (
  SELECT c.user_id, conv_id, conv_ts, touch_id, touch_type, touch_ts
  FROM conv c JOIN touch tt USING (user_id)
  WHERE tt.touch_ts >= c.conv_ts - {within_ns}
    AND tt.touch_ts < c.conv_ts
)"""
    if model == "linear":
        return base + """
SELECT user_id, conv_id, conv_ts, touch_id, touch_type, touch_ts,
       1.0 / (count(*) OVER (PARTITION BY conv_id)) AS weight
FROM pairs"""
    return base + """
SELECT user_id, conv_id, conv_ts, touch_id, touch_type, touch_ts,
       CAST(1.0 AS DOUBLE) AS weight
FROM pairs
QUALIFY row_number() OVER (
  PARTITION BY conv_id ORDER BY touch_ts DESC, touch_id DESC) = 1"""


def _sql_funnel_counts(within_ns: int = 6 * 3_600_000_000_000) -> str:
    return f"""WITH ev AS (
  SELECT user_id, event_type, epoch_ns(ts) AS t FROM events
), a1 AS (
  SELECT user_id, t AS t1 FROM ev WHERE event_type = 'view'
), a2 AS (
  SELECT a1.user_id, t1,
         (SELECT min(e.t) FROM ev e
          WHERE e.user_id = a1.user_id AND e.event_type = 'click'
            AND e.t > a1.t1) AS t2
  FROM a1
), a2f AS (
  SELECT * FROM a2 WHERE t2 IS NOT NULL AND t2 <= t1 + {within_ns}
), a3 AS (
  SELECT a2f.user_id, t1,
         (SELECT min(e.t) FROM ev e
          WHERE e.user_id = a2f.user_id AND e.event_type = 'purchase'
            AND e.t > a2f.t2) AS t3
  FROM a2f
), a3f AS (
  SELECT * FROM a3 WHERE t3 IS NOT NULL AND t3 <= t1 + {within_ns}
)
SELECT 1 AS stage, 'view' AS step,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys FROM a1
UNION ALL
SELECT 2, 'click', CAST(count(DISTINCT user_id) AS BIGINT) FROM a2f
UNION ALL
SELECT 3, 'purchase', CAST(count(DISTINCT user_id) AS BIGINT) FROM a3f"""


def q_asof_join_date(spark, sf_dir):
    """KEYLESS as-of over the DATE domain: each order's date matched to
    the latest month-start marker at-or-before it — exercises the
    bucketed global (no-keys) carry AND the date ordinal adapters in
    one query, against DuckDB's native ASOF JOIN on dates."""
    from .functions.spans import exact_floor_div
    from .operators.asof_join import asof_join
    from .sources import col_to_ns

    day_ns = 86_400_000_000_000
    od = read_table(spark, sf_dir, "orders")
    start_ns = col_to_ns(
        F.col("o_orderdate"), od.schema["o_orderdate"].dataType
    )
    orders = od.select(
        "o_orderkey",
        F.date_from_unix_date(
            exact_floor_div(start_ns, day_ns).cast("int")
        ).alias("ts"),
    )
    epoch = F.lit("1995-01-01").cast("date")
    markers = spark.range(85).select(
        F.add_months(epoch, F.col("id").cast("int")).alias("ts"),
        F.col("id").cast("long").alias("month_id"),
    )
    out = asof_join(orders, markers, on="ts", direction="backward")
    return out.select(
        "o_orderkey",
        "ts",
        F.col("ts_right").alias("month_start"),
        F.col("month_id_right").alias("month_id"),
    )


_SQL_ASOF_DATE = """WITH o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS ts FROM orders
), m AS (
  SELECT CAST(DATE '1995-01-01' + to_months(CAST(i AS INT)) AS DATE)
           AS ts,
         CAST(i AS BIGINT) AS month_id
  FROM (SELECT unnest(range(0, 85)) AS i)
)
SELECT o.o_orderkey, o.ts, m.ts AS month_start, m.month_id
FROM o ASOF LEFT JOIN m ON o.ts >= m.ts"""


def _order_date_spans(spark, sf_dir, modulus: int, width_days: int):
    """Sparse DATE spans from orders: every ``modulus``-th order key,
    span ``[o_orderdate, +width_days)`` — sparse enough that islands
    and gaps are non-trivial."""
    from .functions.spans import exact_floor_div
    from .sources import col_to_ns

    day_ns = 86_400_000_000_000
    od = read_table(spark, sf_dir, "orders").filter(
        F.pmod(F.col("o_orderkey"), F.lit(modulus)) == 0
    )
    start_ns = col_to_ns(
        F.col("o_orderdate"), od.schema["o_orderdate"].dataType
    )
    d0 = F.date_from_unix_date(exact_floor_div(start_ns, day_ns).cast("int"))
    return od.select(
        "o_orderkey",
        F.struct(
            d0.alias("start"), F.date_add(d0, width_days).alias("stop")
        ).alias("span"),
    )


def q_merge_spans_date(spark, sf_dir):
    """Interval coalesce in the DATE domain: sparse 3-day order spans
    merged into maximal islands — drives the set-algebra ordinal
    adapters (merge on day ordinals, islands restored as dates) against
    a DuckDB gaps-and-islands window oracle."""
    from .operators.coalesce import merge_spans

    spans = _order_date_spans(spark, sf_dir, 37, 3).select("span")
    m = merge_spans(spans)
    return m.select(
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
        "n_spans",
    )


_SQL_MERGE_SPANS_DATE = """WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + 3 AS e
  FROM orders WHERE o_orderkey % 37 = 0
), m AS (
  SELECT s, e,
         CASE WHEN s > coalesce(max(e) OVER (ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                DATE '0001-01-01')
              THEN 1 ELSE 0 END AS brk
  FROM o
), g AS (
  SELECT s, e, sum(brk) OVER (ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM m
)
SELECT min(s) AS i_start, max(e) AS i_stop,
       CAST(count(*) AS BIGINT) AS n_spans
FROM g GROUP BY isl"""


def q_quantile_windows_date(spark, sf_dir):
    """quantile_windows over a DATE span table: 8 equal-day windows
    tiling the covering span of the sparse order spans, joined back for
    per-window counts — domain window generation + domain join in one
    oracle-gated query."""
    spans = _order_date_spans(spark, sf_dir, 37, 3)
    w = quantile_windows(spark, 8, spans.select("span"), label="w_id")
    j = interval_join(
        spans, w, validate="skip", strategy="broadcast_right"
    )
    return j.groupBy("w_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("span_left.start")).alias("first_start"),
    )


_SQL_QW_DATE = """WITH o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + 3 AS e
  FROM orders WHERE o_orderkey % 37 = 0
), b AS (
  SELECT CAST(min(s) - DATE '1970-01-01' AS BIGINT) AS lo,
         CAST(max(e) - DATE '1970-01-01' AS BIGINT) AS hi
  FROM o
), w AS (
  SELECT DATE '1970-01-01'
           + CAST(lo + i*((hi-lo)//8) + (i*((hi-lo)%8))//8 AS INT)
           AS w_start,
         DATE '1970-01-01'
           + CAST(lo + (i+1)*((hi-lo)//8) + ((i+1)*((hi-lo)%8))//8
                  AS INT) AS w_stop,
         CAST(i+1 AS BIGINT) AS w_id
  FROM b, generate_series(0, 7) t(i)
)
SELECT w.w_id, CAST(count(*) AS BIGINT) AS n, min(o.s) AS first_start
FROM o JOIN w ON greatest(o.s, w.w_start) < least(o.e, w.w_stop)
GROUP BY w.w_id"""


def q_asof_nearest(spark, sf_dir):
    """direction='nearest' as-of: attach whichever purchase (before or
    after) is closest in time, absolute-gap tolerance of 12h; exact
    distance ties go to the earlier row.  Oracle: DuckDB lateral
    min-|gap| lookup with the same tie order."""
    from .operators.asof_join import asof_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    left = ev.select("event_id", "user_id", "event_type", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(
        left,
        purchases,
        on="ts",
        by="user_id",
        direction="nearest",
        tolerance=12 * 3_600 * 1_000_000_000,
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.col("ts_right").alias("purchase_ts"),
        F.col("purchase_value_right").alias("purchase_value"),
    )


_SQL_ASOF_NEAREST = """WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_ns(ts) AS t, value FROM events
), p AS (
  SELECT user_id, t, max(value) AS pv FROM ev
  WHERE event_type = 'purchase' GROUP BY user_id, t
)
SELECT e.event_id, e.user_id, e.event_type, e.t AS ts,
       b.t AS purchase_ts, b.pv AS purchase_value
FROM ev e LEFT JOIN LATERAL (
  SELECT p.t, p.pv FROM p
  WHERE p.user_id = e.user_id
    AND abs(e.t - p.t) <= 43200000000000
  ORDER BY abs(e.t - p.t), p.t LIMIT 1
) b ON TRUE"""


_GAP_NS = 6 * 3_600 * 1_000_000_000  # 6h session gap


def q_sessionize(spark, sf_dir):
    from .operators.sessionize import sessionize

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", (F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))).alias("ts")
    )
    s = sessionize(ev, gap=_GAP_NS, ts_col="ts", by="user_id")
    return s.select(
        "user_id",
        "session_id",
        F.col("span.start").alias("s_start"),
        F.col("span.stop").alias("s_stop"),
        "n_events",
    )


_SQL_SESSIONIZE = f"""WITH ev AS (
  SELECT user_id, epoch_ns(ts) AS t FROM events
), m AS (
  SELECT user_id, t,
         CASE WHEN lag(t) OVER w IS NULL
                OR t - lag(t) OVER w > {_GAP_NS} THEN 1 ELSE 0 END AS brk
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t)
), s AS (
  SELECT user_id, t,
         sum(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM m)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       min(t) AS s_start, max(t) AS s_stop,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid"""


def q_stream_sessionize(spark, sf_dir):
    """session_window running in batch mode — same plan as the stream."""
    from .streaming import stream_sessionize

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    s = stream_sessionize(ev, gap_ns=_GAP_NS, ts_col="ts", by="user_id")
    return s.select(
        "user_id",
        F.col("span.start").alias("s_start"),
        F.col("span.stop").alias("s_stop"),
        "n_events",
    )


# session_window breaks at gap >= (half-open window), batch sessionize at
# gap > — hence >= here, and stop = last + gap
_SQL_STREAM_SESSIONIZE = f"""WITH ev AS (
  SELECT user_id, epoch_ns(ts) AS t FROM events
), m AS (
  SELECT user_id, t,
         CASE WHEN lag(t) OVER w IS NULL
                OR t - lag(t) OVER w >= {_GAP_NS} THEN 1 ELSE 0 END AS brk
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t)
), s AS (
  SELECT user_id, t,
         sum(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM m)
SELECT user_id, min(t) AS s_start, max(t) + {_GAP_NS} AS s_stop,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid"""


_HOUR_NS = 3_600_000_000_000


def q_stream_interval_join(spark, sf_dir):
    """The STREAMING binned interval join run in its batch-batch mode —
    same operator, same bin/emit-once logic Structured Streaming uses —
    checked against the plain inner-join oracle: the stream path must
    compute exactly the batch join at µs resolution."""
    from .streaming import stream_interval_join

    es = event_spans(spark, sf_dir, truncate_us=True).select(
        "event_id", "user_id", "span"
    )
    es_w, w = _es_windows(spark, sf_dir, 8, "idx")
    j = stream_interval_join(es, w, bin_width_ns=21_600_000_000_000)
    return j.select(
        "event_id",
        "user_id",
        "idx",
        F.col("span_left.start").alias("l_start"),
        F.col("span_left.stop").alias("l_stop"),
        F.col("span_right.start").alias("w_start"),
        F.col("span_right.stop").alias("w_stop"),
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


_SQL_STREAM_JOIN = f"""WITH {_ES_CTE},
{_w_cte(8, 'idx')}
SELECT es.event_id, es.user_id, w.idx,
       es.s AS l_start, es.e AS l_stop, w.w_start, w.w_stop,
       greatest(es.s, w.w_start) AS i_start, least(es.e, w.w_stop) AS i_stop
FROM es JOIN w ON {_OVERLAP_SQL}"""


def q_stream_join_keepleft(spark, sf_dir):
    """The STREAMING left-outer interval join in batch-batch mode —
    asymmetric binning (left keeps its start bin, right explodes back
    by max_span) — against the plain LEFT JOIN oracle.  Only 2 of 8
    windows survive the filter, so a large fraction of event spans are
    genuinely unmatched and exercise the outer padding."""
    from .streaming import stream_interval_join

    es = event_spans(spark, sf_dir, truncate_us=True).select(
        "event_id", "user_id", "span"
    )
    _, w = _es_windows(spark, sf_dir, 8, "idx")
    w2 = w.filter(F.col("idx").isin(2, 5))
    j = stream_interval_join(
        es,
        w2,
        bin_width_ns=21_600_000_000_000,
        max_span_ns=35 * 86_400_000_000_000,  # > the ~31-day data range
        how="left_outer",
    )
    return j.select(
        "event_id",
        "user_id",
        "idx",
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


_SQL_STREAM_JOIN_KEEPLEFT = f"""WITH {_ES_CTE},
{_w_cte(8, 'idx')},
w2 AS (SELECT * FROM w WHERE idx IN (2, 5))
SELECT es.event_id, es.user_id, w2.idx,
       CASE WHEN w2.idx IS NULL THEN NULL
            ELSE greatest(es.s, w2.w_start) END AS i_start,
       CASE WHEN w2.idx IS NULL THEN NULL
            ELSE least(es.e, w2.w_stop) END AS i_stop
FROM es LEFT JOIN w2
  ON greatest(es.s, w2.w_start) < least(es.e, w2.w_stop)"""


def q_stream_join_full(spark, sf_dir):
    """The STREAMING full-outer interval join composition
    (left_outer ∪ unmatched-right of right_outer) in batch-batch mode —
    against the plain FULL JOIN oracle.  Only 2 of 8 windows survive,
    so both genuinely-unmatched event spans AND (via the narrow span
    filter) unmatched windows exercise both padding directions."""
    from .streaming import stream_interval_join_full

    es = event_spans(spark, sf_dir, truncate_us=True).select(
        "event_id", "user_id", "span"
    )
    # drop long spans so some WINDOWS go unmatched too
    es = es.filter(
        (F.col("span.stop") - F.col("span.start")) < 6 * 3_600_000_000_000
    )
    _, w = _es_windows(spark, sf_dir, 8, "idx")
    w2 = w.filter(F.col("idx").isin(2, 5))
    j = stream_interval_join_full(
        es,
        w2,
        bin_width_ns=21_600_000_000_000,
        max_span_ns=35 * 86_400_000_000_000,  # > the ~31-day data range
    )
    return j.select(
        "event_id",
        "user_id",
        "idx",
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


_SQL_STREAM_JOIN_FULL = f"""WITH {_ES_CTE},
{_w_cte(8, 'idx')},
es2 AS (SELECT * FROM es WHERE e - s < 6 * 3600000000000),
w2 AS (SELECT * FROM w WHERE idx IN (2, 5))
SELECT es2.event_id, es2.user_id, w2.idx,
       CASE WHEN w2.idx IS NULL OR es2.event_id IS NULL THEN NULL
            ELSE greatest(es2.s, w2.w_start) END AS i_start,
       CASE WHEN w2.idx IS NULL OR es2.event_id IS NULL THEN NULL
            ELSE least(es2.e, w2.w_stop) END AS i_stop
FROM es2 FULL JOIN w2
  ON greatest(es2.s, w2.w_start) < least(es2.e, w2.w_stop)"""


def q_split_spans(spark, sf_dir):
    """Per-row epoching: every event span split into 4 equal closed-open
    sub-spans with the exact int64 boundary decomposition — map-only
    explode, no shuffle; the reference's home-domain step (cut each
    recording into n epochs) as a row-wise operator."""
    from .operators.quantile_windows import split_spans

    es = event_spans(spark, sf_dir, truncate_us=True).select(
        "event_id", "span"
    )
    out = split_spans(es, 4)
    return out.select(
        "event_id",
        "sub_index",
        F.col("span.start").alias("e_start"),
        F.col("span.stop").alias("e_stop"),
    )


_SQL_SPLIT_SPANS = f"""WITH {_ES_CTE},
i AS (SELECT unnest(range(0, 4)) AS si)
SELECT es.event_id, CAST(si + 1 AS BIGINT) AS sub_index,
       es.s + si*((es.e - es.s)//4) + (si*((es.e - es.s)%4))//4
         AS e_start,
       es.s + (si+1)*((es.e - es.s)//4) + ((si+1)*((es.e - es.s)%4))//4
         AS e_stop
FROM es, i"""


def q_merge_spans(spark, sf_dir):
    """Interval coalesce (span-set union): 1-hour event spans merged
    into per-user coverage islands — gaps-and-islands, one shuffle."""
    from .operators.coalesce import merge_spans

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", (F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))).alias("ts")
    )
    spans = ev.select(
        "user_id", make_span(F.col("ts"), F.col("ts") + F.lit(_HOUR_NS)).alias("span")
    )
    m = merge_spans(spans, by="user_id")
    return m.select(
        "user_id",
        F.col("span.start").alias("s_start"),
        F.col("span.stop").alias("s_stop"),
        "n_spans",
    )


_SQL_MERGE_CTE = f"""sp AS (
  SELECT user_id, epoch_ns(ts) AS s, epoch_ns(ts) + {_HOUR_NS} AS e FROM events
), m AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
              THEN 1 ELSE 0 END AS brk
  FROM sp WINDOW w AS (PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), i AS (
  SELECT user_id, s, e,
         sum(brk) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS UNBOUNDED PRECEDING) AS isl
  FROM m
), isl AS (
  SELECT user_id, min(s) AS s_start, max(e) AS s_stop,
         CAST(count(*) AS BIGINT) AS n_spans
  FROM i GROUP BY user_id, isl
)"""

_SQL_MERGE_SPANS = f"""WITH {_SQL_MERGE_CTE}
SELECT user_id, s_start, s_stop, n_spans FROM isl"""


def q_span_coverage(spark, sf_dir):
    """Covered duration per user (union measure — overlaps counted once)."""
    from .operators.coalesce import span_coverage

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", (F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))).alias("ts")
    )
    spans = ev.select(
        "user_id", make_span(F.col("ts"), F.col("ts") + F.lit(_HOUR_NS)).alias("span")
    )
    return span_coverage(spans, by="user_id")


_SQL_SPAN_COVERAGE = f"""WITH {_SQL_MERGE_CTE}
SELECT user_id, CAST(sum(s_stop - s_start) AS BIGINT) AS covered,
       CAST(count(*) AS BIGINT) AS n_islands
FROM isl GROUP BY user_id"""


def q_stream_drawdown(spark, sf_dir):
    """The STREAMING drawdown twin in batch mode (streaming.py:
    stream_drawdown — per-key running-peak STATE; every emitted
    statistic is a running max, so the sink merge is max() per key;
    file-stream parity pytest-gated).  Batch inputs delegate to
    max_drawdown; shares its oracle."""
    from .streaming import stream_drawdown

    ev = read_table(spark, sf_dir, "events")
    return stream_drawdown(ev, "value")


def q_nms_spans(spark, sf_dir):
    """Interval non-maximum suppression (coalesce.py:
    suppress_dominated_spans): per-user 1-hour activity spans scored
    by the event value; a span survives unless an overlapping
    same-user span has a strictly higher score (exact-tie -> lower
    event_id wins).  Candidate pairs route through the keyed interval
    join (auto strategy); survivors via one LEFT ANTI join.  The
    oracle is the NOT EXISTS dominance predicate."""
    from .operators.coalesce import suppress_dominated_spans

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value",
        (F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))).alias("ts"),
    )
    spans = ev.select(
        "event_id", "user_id", "value",
        make_span(F.col("ts"), F.col("ts") + F.lit(_HOUR_NS)).alias("span"),
    )
    out = suppress_dominated_spans(spans, "value", "event_id", by="user_id")
    return out.select(
        "event_id", "user_id", "value",
        F.col("span.start").alias("s_start"),
        F.col("span.stop").alias("s_stop"),
    )


_SQL_NMS_SPANS = f"""WITH sp AS (
  SELECT event_id, user_id, value,
         epoch_ns(ts) AS s_start, epoch_ns(ts) + {_HOUR_NS} AS s_stop
  FROM events WHERE value IS NOT NULL
)
SELECT a.event_id, a.user_id, a.value, a.s_start, a.s_stop
FROM sp a
WHERE NOT EXISTS (
  SELECT 1 FROM sp b
  WHERE b.user_id = a.user_id
    AND b.s_start < a.s_stop AND a.s_start < b.s_stop
    AND (b.value > a.value
         OR (b.value = a.value AND b.event_id < a.event_id))
)"""


def q_span_coverage_daily(spark, sf_dir):
    """Utilization by CALENDAR BUCKET: per (user, day), nanoseconds of
    the day covered by the union of the user's activity spans —
    merge_spans islands exploded over the days they touch, each piece
    clipped to its day, map-only after the merge (one sequence explode
    per island, bounded by the island's day count; no join).  The
    session-length-by-day report every activity pipeline ships."""
    from .operators.coalesce import merge_spans

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))).alias("ts"),
    )
    spans = ev.select(
        "user_id",
        make_span(F.col("ts"), F.col("ts") + F.lit(_HOUR_NS)).alias("span"),
    )
    isl = merge_spans(spans, by="user_id")
    s, e = F.col("span.start"), F.col("span.stop")
    day = F.lit(_DAY_NS)
    exploded = isl.select(
        "user_id",
        "span",
        F.explode(
            F.sequence(F.expr(f"span.start DIV {_DAY_NS}"),
                       F.expr(f"(span.stop - 1) DIV {_DAY_NS}"))
        ).alias("__d"),
    )
    piece = F.least(e, (F.col("__d") + 1) * day) - F.greatest(
        s, F.col("__d") * day
    )
    return (
        exploded.select(
            "user_id",
            (F.col("__d") * day).alias("day_start"),
            piece.alias("__p"),
        )
        .groupBy("user_id", "day_start")
        .agg(F.sum("__p").alias("covered"))
    )


_SQL_SPAN_COVERAGE_DAILY = f"""WITH {_SQL_MERGE_CTE},
ex AS (
  SELECT user_id, s_start, s_stop,
         unnest(range(s_start // {_DAY_NS}, (s_stop - 1) // {_DAY_NS} + 1))
           AS d
  FROM isl
)
SELECT user_id, CAST(d * {_DAY_NS} AS BIGINT) AS day_start,
       CAST(sum(least(s_stop, (d + 1) * {_DAY_NS})
                - greatest(s_start, d * {_DAY_NS})) AS BIGINT) AS covered
FROM ex GROUP BY user_id, d"""


def q_embedding_neardup(spark, sf_dir):
    from .operators.similarity import embedding_neardup_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.4)


_SQL_EMB_NEARDUP = """WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v
  FROM embeddings
), n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM e),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_dot_product(a.v, b.v) AS DOUBLE)
           / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) AS score
  FROM n a, n b WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, round(score, 6) AS score FROM p WHERE score >= 0.4"""


def q_multimodal_meta(spark, sf_dir):
    from .operators.multimodal import decode_media_meta, documents_as_media

    docs = read_table(spark, sf_dir, "documents")
    return decode_media_meta(documents_as_media(docs))


_SQL_MM_META = """SELECT doc_id AS id, 'image' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(64 + octet_length(encode(text)) % 193 AS INT) AS width,
       CAST(64 + (octet_length(encode(text)) // 193) % 157 AS INT) AS height,
       CAST(1 + octet_length(encode(text)) % 7 AS INT) AS n_frames
FROM documents"""


def q_multimodal_frames(spark, sf_dir):
    from .operators.multimodal import documents_as_media, sample_frames

    docs = read_table(spark, sf_dir, "documents")
    return sample_frames(documents_as_media(docs), every_n=2).select(
        "id", F.col("frame_idx").cast("int").alias("frame_idx")
    )


_SQL_MM_FRAMES = """SELECT doc_id AS id,
       CAST(unnest(generate_series(0,
         greatest(1 + octet_length(encode(text)) % 7 - 1, 0), 2)) AS INT)
         AS frame_idx
FROM documents"""


# ---------------------------------------------------------------------------
# portable-hash queries + generated oracles (deterministic DuckDB recompute)
#
# The signatures/buckets below are fully deterministic, so the oracle
# REPLAYS candidate generation in SQL: the md5-based 60-bit base hash
# (functions.text.portable_hash60) replaces xxhash64, and every derived
# constant (minhash affine family, band-fold bases, LSH hyperplanes,
# k-means sample order) is inlined into the generated SQL string.
# ---------------------------------------------------------------------------

from .functions.text import _ROLL_BASE, _ROLL_MOD  # noqa: E402
from .operators.dedup import _FOLD_BASES, _MOD as _MH_MOD, _hash_family  # noqa: E402
from .operators.similarity import (  # noqa: E402
    IVF_ITERS,
    QUANT,
    SAMPLE_A,
    SAMPLE_B,
    SAMPLE_M,
    _hyperplanes,
)

#: DuckDB twin of functions.text.portable_hash60 ({x} = string expr)
_PH60 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def q_multimodal_features(spark, sf_dir):
    """Feature extraction (content-digest fake encoder).  The feature
    floats are dyadic rationals (uint16/2^16), so their sum ×2^16 is an
    exact integer both engines agree on bit-for-bit."""
    from .operators.multimodal import documents_as_media, extract_features

    docs = read_table(spark, sf_dir, "documents")
    out = extract_features(documents_as_media(docs))
    return out.select(
        "id",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x) * 65536)
        .cast("long")
        .alias("feat_sum_u16"),
    )


_SQL_MM_FEATURES = """SELECT doc_id AS id,
  CAST(list_sum(list_transform(range(0, 8), j ->
     ('0x' || substr(md5(text), 4*j+1, 2))::BIGINT
     + 256 * ('0x' || substr(md5(text), 4*j+3, 2))::BIGINT)) AS BIGINT)
     AS feat_sum_u16
FROM documents"""


def q_minhash_lsh_pairs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs, num_hashes=32, bands=8, portable=True)
    return ngram_jaccard_pairs(docs, cand, threshold=0.3).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def _sql_minhash_pairs(
    num_hashes: int = 32, bands: int = 8, k: int = 3, threshold: float = 0.3
) -> str:
    rows = num_hashes // bands
    fam = _hash_family(num_hashes)
    h = _PH60.format(x="s")
    sig_items = ",\n    ".join(
        f"list_min(list_transform(hl, h -> (h*{a} + {b}) % {_MH_MOD}))"
        for a, b in fam
    )

    def fold(base: int) -> str:
        return (
            f"list_reduce(list_prepend(0::BIGINT, "
            f"sig[band*{rows}+1 : band*{rows}+{rows}]), "
            f"(a, h) -> (a*{base} + h) % {_MH_MOD})"
        )

    return f"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tl FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(tl) < {k} THEN [array_to_string(tl, ' ')]
       ELSE list_transform(range(1, len(tl) - {k} + 2),
                           i -> array_to_string(tl[i:i+{k - 1}], ' ')) END AS sl
  FROM toks
), hs AS MATERIALIZED (
  SELECT doc_id, list_transform(list_distinct(sl), s -> {h} % {_MH_MOD}) AS hl
  FROM sh
), sig AS MATERIALIZED (
  SELECT doc_id, [{sig_items}] AS sig FROM hs
), bnd AS MATERIALIZED (
  SELECT doc_id, band, ({fold(_FOLD_BASES[0])}) * {_MH_MOD + 1}
         + ({fold(_FOLD_BASES[1])}) AS bh
  FROM sig, range(0, {bands}) t(band)
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bnd a JOIN bnd b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), shd AS MATERIALIZED (
  SELECT doc_id, list_distinct(sl) AS s FROM sh
)
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE) AS jaccard
  FROM cand c JOIN shd x ON x.doc_id = c.id_a
              JOIN shd y ON y.doc_id = c.id_b)
WHERE jaccard >= {threshold}"""


def _fixture_scratch(sf_dir: str, name: str) -> str:
    """Per-(sf_dir, process) scratch path for queries that write an
    index/table fixture before reading it back.  Keyed on the sf_dir
    (different scale factors must not clobber each other's fixtures)
    AND the pid (concurrent suite runs on one host race a fixed path:
    an overwrite mid-read in run A while run B rewrites is a wrong
    answer, not just a crash)."""
    import hashlib as _hashlib
    import os as _os

    tag = _hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/dfi_fixtures_{tag}_{_os.getpid()}/{name}"


def q_incremental_dedup(spark, sf_dir):
    """Incremental dedup against a PERSISTED band-bucket index — the
    production shape: history (doc_id % 5 != 0) is indexed once
    (bucketed by bucket hash), the increment (doc_id % 5 == 0) is
    banded, broadcast, and probed map-side — zero shuffle, zero
    re-pairing of history text.  The oracle recomputes both sides'
    bands directly, so the Spark path's index write+read round-trip is
    verified against a pure recomputation."""
    import os

    from .operators.dedup import (
        incremental_minhash_dedup,
        write_minhash_index,
    )

    docs = read_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    inc = docs.filter(F.col("doc_id") % 5 == 0)
    tbl = f"dfi_minhash_idx_q_{os.getpid()}"
    write_minhash_index(
        hist,
        tbl,
        n_buckets=16,
        path=_fixture_scratch(sf_dir, "minhash_idx_q"),
        num_hashes=32,
        bands=8,
        portable=True,
    )
    idx = spark.table(tbl)
    out = incremental_minhash_dedup(
        inc, idx, num_hashes=32, bands=8, portable=True
    )
    return out.select("doc_id", "kept")


def q_stream_incremental_dedup(spark, sf_dir):
    """Batch-mode run of the STREAMING incremental-dedup probe over
    q_incremental_dedup's exact fixture: the stateless bands-wide
    stream-static join composition must produce the same kept set as
    the batch operator, so it shares the same pure-recomputation
    oracle."""
    import os

    from .operators.dedup import write_minhash_index
    from .streaming import stream_incremental_dedup

    docs = read_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    inc = docs.filter(F.col("doc_id") % 5 == 0)
    tbl = f"dfi_minhash_idx_qs_{os.getpid()}"
    write_minhash_index(
        hist,
        tbl,
        n_buckets=16,
        path=_fixture_scratch(sf_dir, "minhash_idx_qs"),
        num_hashes=32,
        bands=8,
        portable=True,
    )
    idx = spark.table(tbl)
    out = stream_incremental_dedup(
        inc, idx, num_hashes=32, bands=8, portable=True
    )
    return out.select("doc_id", "kept")


def _sql_incremental_dedup(num_hashes: int = 32, bands: int = 8, k: int = 3) -> str:
    rows = num_hashes // bands
    fam = _hash_family(num_hashes)
    h = _PH60.format(x="s")
    sig_items = ",\n    ".join(
        f"list_min(list_transform(hl, h -> (h*{a} + {b}) % {_MH_MOD}))"
        for a, b in fam
    )

    def fold(base: int) -> str:
        return (
            f"list_reduce(list_prepend(0::BIGINT, "
            f"sig[band*{rows}+1 : band*{rows}+{rows}]), "
            f"(a, h) -> (a*{base} + h) % {_MH_MOD})"
        )

    return f"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tl FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(tl) < {k} THEN [array_to_string(tl, ' ')]
       ELSE list_transform(range(1, len(tl) - {k} + 2),
                           i -> array_to_string(tl[i:i+{k - 1}], ' ')) END AS sl
  FROM toks
), hs AS MATERIALIZED (
  SELECT doc_id, list_transform(list_distinct(sl), s -> {h} % {_MH_MOD}) AS hl
  FROM sh
), sig AS MATERIALIZED (
  SELECT doc_id, [{sig_items}] AS sig FROM hs
), bnd AS MATERIALIZED (
  SELECT doc_id, band, ({fold(_FOLD_BASES[0])}) * {_MH_MOD + 1}
         + ({fold(_FOLD_BASES[1])}) AS bh
  FROM sig, range(0, {bands}) t(band)
), matched AS (
  SELECT DISTINCT i.doc_id
  FROM bnd i JOIN bnd h ON i.band = h.band AND i.bh = h.bh
  WHERE i.doc_id % 5 = 0 AND h.doc_id % 5 <> 0
)
SELECT d.doc_id, (m.doc_id IS NULL) AS kept
FROM documents d LEFT JOIN matched m ON d.doc_id = m.doc_id
WHERE d.doc_id % 5 = 0"""


def q_ngram_jaccard_join(spark, sf_dir):
    """Exact set-similarity self-join (prefix filtering) — the oracle is
    the NAIVE all-pairs Jaccard: prefix filtering is lossless, so the
    outputs must be identical, no candidate-generation replay needed.

    threshold=0.7 is the realistic near-dup operating point AND the
    regime prefix filtering is built for: prefix length is
    |S|-ceil(t|S|)+1 ≈ (1-t)|S|, so t=0.3 keeps ~70% of every shingle
    set in the join (measured 3× the wall time for the identical
    output on this corpus — every true pair here has J≥0.7)."""
    from .operators.dedup import jaccard_similarity_join

    docs = read_table(spark, sf_dir, "documents")
    return jaccard_similarity_join(docs, threshold=0.7).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def _sql_ngram_jaccard(k: int = 3, threshold: float = 0.3) -> str:
    return f"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tl FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(tl) < {k} THEN [array_to_string(tl, ' ')]
       ELSE list_transform(range(1, len(tl) - {k} + 2),
                           i -> array_to_string(tl[i:i+{k - 1}], ' ')) END AS sl
  FROM toks
), shd AS MATERIALIZED (
  SELECT doc_id, list_distinct(sl) AS s FROM sh
)
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b,
         CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE) AS jaccard
  FROM shd x JOIN shd y ON x.doc_id < y.doc_id)
WHERE jaccard >= {threshold}"""


def q_simhash_pairs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, max_hamming=8, blocks=4, portable=True)


def _sql_simhash_pairs(
    max_hamming: int = 8, blocks: int = 4, bits: int = 60
) -> str:
    h = _PH60.format(x="t")
    width = 64 // blocks
    mask = (1 << width) - 1
    agree = " OR ".join(f"((x >> {i * width}) & {mask}) = 0" for i in range(blocks))
    return f"""WITH th AS (
  SELECT doc_id,
         list_transform(list_distinct(regexp_extract_all(text, '\\S+')),
                        t -> {h}) AS hl
  FROM documents
), fp AS (
  SELECT doc_id, CAST(list_sum(list_transform(range(0, {bits}), i ->
       CASE WHEN list_sum(list_transform(hl, h ->
                 CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
            THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS sh
  FROM th
)
SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.sh, b.sh)) AS hamming, xor(a.sh, b.sh) AS x
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
WHERE ({agree}) AND hamming <= {max_hamming}"""


def q_rolling_fingerprint(spark, sf_dir):
    """Order-sensitive token-level document fingerprint (polynomial
    rolling hash over portable 60-bit token hashes)."""
    from .functions.text import rolling_fingerprint

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rolling_fingerprint(F.col("text"), portable=True).alias("fp")
    )


_SQL_ROLLING_FP = f"""WITH t AS (
  SELECT doc_id, list_transform(regexp_extract_all(text, '\\S+'),
         s -> {_PH60.format(x="s")} % {_ROLL_MOD}) AS hl
  FROM documents)
SELECT doc_id, CAST(list_reduce(list_prepend(0::BIGINT, hl),
       (a, h) -> (a * {_ROLL_BASE} + h) % {_ROLL_MOD}) AS BIGINT) AS fp
FROM t"""


def _sql_bucket_expr(
    dim: int, n_planes: int, vexpr: str = "v", seed: Optional[int] = None
) -> str:
    """Signed-projection LSH bucket with the hyperplane constants inlined."""
    from .operators.similarity import LSH_BASE_SEED

    terms = []
    planes = _hyperplanes(dim, n_planes, LSH_BASE_SEED if seed is None else seed)
    for i, plane in enumerate(planes):
        arr = "[" + ", ".join(str(c) for c in plane) + "]::BIGINT[]"
        terms.append(
            f"CASE WHEN list_dot_product({vexpr}, {arr}) > 0 "
            f"THEN {1 << i}::BIGINT ELSE 0::BIGINT END"
        )
    return "(" + "\n   + ".join(terms) + ")"


_QUANT_V = (
    "list_transform(embedding, x -> "
    f"CAST(round(CAST(x AS DOUBLE)*{QUANT}) AS BIGINT))"
)


def q_embedding_neardup_lsh(spark, sf_dir):
    """LSH-bucketed near-dup (the 100 TB path): 2 tables x 8 planes,
    multi-probe radius 3.  Measured recall vs the exact blocked
    all-pairs at sf0.1: 0.90, always a subset (was 0.30 single-table
    radius 1).  Deterministic given the fixed hyperplane seeds, so the
    oracle replays bucketing, probing and the first-table guard."""
    from .operators.similarity import embedding_neardup_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        emb, threshold=0.4, dim=64, n_planes=8, probe_radius=3, n_tables=2
    )


def _sql_emb_neardup_lsh(
    threshold: float = 0.4,
    dim: int = 64,
    n_planes: int = 8,
    probe_radius: int = 3,
    n_tables: int = 2,
) -> str:
    from .operators.similarity import lsh_table_seed, probe_masks

    masks = ", ".join(str(m) for m in probe_masks(n_planes, probe_radius))
    bucket_cols = ",\n         ".join(
        f"{_sql_bucket_expr(dim, n_planes, seed=lsh_table_seed(t))} AS b{t}"
        for t in range(n_tables)
    )
    tbls = ", ".join(str(t) for t in range(n_tables))
    pick = lambda side: (  # noqa: E731
        "CASE tt.tbl "
        + " ".join(f"WHEN {t} THEN {side}.b{t}" for t in range(n_tables))
        + " END"
    )
    guards = []
    for t in range(1, n_tables):
        earlier = " OR ".join(
            f"bit_count(xor(a.b{tp}, b.b{tp})) <= {probe_radius}"
            for tp in range(t)
        )
        guards.append(f"(tt.tbl = {t} AND ({earlier}))")
    guard_sql = f" AND NOT ({' OR '.join(guards)})" if guards else ""
    return f"""WITH e AS (
  SELECT vec_id, {_QUANT_V} AS v FROM embeddings
), n AS MATERIALIZED (
  SELECT vec_id, v, CAST(list_dot_product(v, v) AS BIGINT) AS nrm,
         {bucket_cols}
  FROM e
)
SELECT id_a, id_b, round(score, 6) AS score FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_dot_product(a.v, b.v) AS DOUBLE)
           / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) AS score
  FROM n a, unnest([{tbls}]::BIGINT[]) tt(tbl),
       unnest([{masks}]::BIGINT[]) mm(m), n b
  WHERE xor({pick('a')}, mm.m) = {pick('b')}
    AND a.vec_id < b.vec_id{guard_sql})
WHERE score >= {threshold}"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup pairs -> duplicate CLUSTERS: connected components by
    iterative min-label propagation (the step that turns pair lists
    into keep/drop decisions).  Pairs come from the LSH generator (same
    config as q_embedding_neardup_lsh) so the whole pipeline is the
    100 TB shape — bucketed candidate join into label propagation, no
    all-pairs stage anywhere.  Deterministic, so the oracle replays the
    LSH pairs and recomputes reachability with a recursive CTE,
    labelling each vertex with the minimum reachable id."""
    from .operators.dedup import connected_components
    from .operators.similarity import embedding_neardup_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(
        emb, threshold=0.4, dim=64, n_planes=8, probe_radius=3, n_tables=2
    )
    comp = connected_components(pairs)
    return comp.select(
        F.col("v").cast("long").alias("vec_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def _sql_dedup_clusters() -> str:
    return f"""WITH RECURSIVE pr AS MATERIALIZED (
  FROM ({_sql_emb_neardup_lsh()}) SELECT id_a, id_b
), ed AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pr
  UNION
  SELECT id_b AS a, id_a AS b FROM pr
), reach(v, r) AS (
  SELECT a, a FROM ed
  UNION
  SELECT reach.v, ed.b FROM reach JOIN ed ON reach.r = ed.a
)
SELECT CAST(v AS BIGINT) AS vec_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY v"""


def q_leakage_split(spark, sf_dir):
    """Leakage-safe train/val/test split (sampling.py:
    leakage_safe_split): MinHash near-dup pairs → connected
    components → every cluster splits by its REPRESENTATIVE's hash, so
    no near-duplicate pair ever straddles train and test — the
    benchmark-decontamination guard a real pre-training split needs.
    Unclustered docs split by their own key (identical to plain
    hash_split).  The oracle replays the pairs, the reachability
    closure, and every hash-range decision."""
    from .operators.sampling import leakage_safe_split

    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=8, portable=True)
    out = leakage_safe_split(
        docs, pairs, "doc_id", (0.8, 0.1, 0.1), salt="lsplit"
    )
    return out.select("doc_id", "split")


def _sql_leakage_split() -> str:
    base = _sql_minhash_pairs(num_hashes=32, bands=8, k=3, threshold=0.0)
    h = _PH60.format(x="'lsplit|' || coalesce(c.c, d.doc_id)::VARCHAR")
    return rf"""WITH RECURSIVE mh AS MATERIALIZED ({base}),
ed AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM mh
  UNION
  SELECT id_b AS a, id_a AS b FROM mh
), reach(v, r) AS (
  SELECT a, a FROM ed
  UNION
  SELECT reach.v, ed.b FROM reach JOIN ed ON reach.r = ed.a
), comp AS (
  SELECT v, min(r) AS c FROM reach GROUP BY v
)
SELECT d.doc_id,
       CASE WHEN ({h} % 1000000) < 800000 THEN 'train'
            WHEN ({h} % 1000000) < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM documents d LEFT JOIN comp c ON d.doc_id = c.v"""


def q_pipeline_curate_split(spark, sf_dir):
    """End-to-end curation pipeline over the round-9 surface, starting
    from RAW MARKUP (round 11, VERDICT r10 Missing #1): html
    boilerplate extraction → text cleanup → URL/domain extraction →
    blocklist → per-domain quota sampling → leakage-safe
    train/val/test split → per-split corpus stats.  Every stage is
    row-local or broadcast-joined except the one components
    computation — the composed DAG a real crawl-intake run ships,
    with every hash decision and the reachability closure replayed by
    the oracle.  (Near-dup pairs come from the FULL corpus, so
    documents dropped by curation still bind their surviving
    duplicates' split — the conservative leakage stance.)"""
    from .functions.text import clean_text, html_extract
    from .operators.curation import (
        blocklist_filter,
        domain_quota_sample,
        extract_url_parts,
    )
    from .operators.sampling import leakage_safe_split

    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        clean_text(html_extract(_html_wrap_expr())).alias("ct"),
    )
    parts = extract_url_parts(base.withColumn("url", _url_expr()))
    kept = blocklist_filter(parts, ["src1.com", "src3.com"])
    kept = domain_quota_sample(kept, quota=12)
    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=8, portable=True)
    split = leakage_safe_split(
        kept, pairs, "doc_id", (0.8, 0.1, 0.1), salt="lsplit"
    )
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("ct")).cast("long").alias("sum_chars"),
        F.count_distinct("domain").alias("n_domains"),
    )


def _sql_pipeline_curate_split() -> str:
    base = _sql_minhash_pairs(num_hashes=32, bands=8, k=3, threshold=0.0)
    hq = _PH60.format(x="'domquota|' || doc_id::VARCHAR")
    hs = _PH60.format(x="'lsplit|' || coalesce(c.c, k2.doc_id)::VARCHAR")
    return rf"""WITH RECURSIVE mh AS MATERIALIZED ({base}),
ed AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM mh
  UNION
  SELECT id_b AS a, id_a AS b FROM mh
), reach(v, r) AS (
  SELECT a, a FROM ed
  UNION
  SELECT reach.v, ed.b FROM reach JOIN ed ON reach.r = ed.a
), comp AS (
  SELECT v, min(r) AS c FROM reach GROUP BY v
), {_sql_html_cte("source, ")}, cleaned AS (
  SELECT doc_id, source,
         trim(regexp_replace(
           regexp_replace(m, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
           '\s+', ' ', 'g')) AS ct
  FROM hmain
), d AS (
  SELECT doc_id, ct,
         array_to_string(sl[greatest(len(sl) - 1, 1):], '.') AS domain
  FROM (
    SELECT doc_id, ct,
           string_split(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1),
                        '.') AS sl
    FROM (
      SELECT doc_id, ct,
             'https://'
             || CASE WHEN doc_id % 3 = 0 THEN 'www.'
                     WHEN doc_id % 3 = 1 THEN 'cdn.' ELSE '' END
             || source
             || CASE WHEN doc_id % 4 = 0 THEN '.org' ELSE '.com' END
             || '/p/' || doc_id::VARCHAR AS url
      FROM cleaned))
), k1 AS (
  SELECT * FROM d WHERE domain NOT IN ('src1.com', 'src3.com')
), rate AS (
  SELECT domain, least(1000000, (12 * 1000000) // count(*)) AS rppm
  FROM k1 GROUP BY domain
), k2 AS (
  SELECT k1.* FROM k1 JOIN rate USING (domain)
  WHERE ({hq} % 1000000) < rate.rppm
), labeled AS (
  SELECT k2.doc_id, k2.ct, k2.domain,
         CASE WHEN ({hs} % 1000000) < 800000 THEN 'train'
              WHEN ({hs} % 1000000) < 900000 THEN 'val'
              ELSE 'test' END AS split
  FROM k2 LEFT JOIN comp c ON k2.doc_id = c.v
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(ct)) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT domain) AS BIGINT) AS n_domains
FROM labeled GROUP BY split"""


def q_dedup_keep_best(spark, sf_dir):
    """Cluster-aware dedup KEEP policy end-to-end: MinHash near-dup
    pairs → connected components → keep the highest-quality member of
    each cluster (ppm-quantized quality score, ties to the smaller id)
    plus all unclustered documents — the decision step a production
    dedup pipeline actually ships, not just the pair list."""
    from .functions.text import quality_score
    from .operators.dedup import keep_best_per_cluster

    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=8, portable=True)
    score = F.round(quality_score(F.col("text")) * 1_000_000).cast("long")
    kept = keep_best_per_cluster(docs, pairs, score)
    return kept.select("doc_id", "lang")


def _sql_dedup_keep_best() -> str:
    base = _sql_minhash_pairs(num_hashes=32, bands=8, k=3, threshold=0.0)
    return rf"""WITH RECURSIVE mh AS MATERIALIZED ({base}),
ed AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM mh
  UNION
  SELECT id_b AS a, id_a AS b FROM mh
), reach(v, r) AS (
  SELECT a, a FROM ed
  UNION
  SELECT reach.v, ed.b FROM reach JOIN ed ON reach.r = ed.a
), comp AS (
  SELECT v, min(r) AS c FROM reach GROUP BY v
), m AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS DOUBLE)
           AS n_uniq,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents
), sc AS (
  SELECT doc_id,
         CAST(round(
           (CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.5 END)
           * (CASE WHEN n_punct / greatest(n_chars, 1.0) < 0.2
              THEN 1.0 ELSE 0.6 END)
           * (n_uniq / greatest(n_tok, 1.0)) * 1000000) AS BIGINT) AS s
  FROM m
), lab AS (
  SELECT d.doc_id, coalesce(comp.c, d.doc_id) AS c, sc.s
  FROM documents d JOIN sc USING (doc_id)
  LEFT JOIN comp ON comp.v = d.doc_id
), win AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY c ORDER BY s DESC, doc_id ASC)
             AS rn
    FROM lab) WHERE rn = 1
)
SELECT d.doc_id, d.lang FROM documents d JOIN win USING (doc_id)"""


def q_similarity_lsh(spark, sf_dir):
    """LSH-bucketed ANN top-k: 2 hash tables x 8 planes, multi-probe
    radius 3 (93 probes/table on the tiny query side).  Measured recall
    vs exact top-5 at sf0.1: 0.80 (single table at radius 2 measured
    0.20 — the L tables compound as 1-(1-p)^L)."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = lsh_topk(
        emb, queries, dim=64, k=5, n_planes=8, probe_radius=3, n_tables=2
    )
    return out.select(
        "q_id", F.col("rank").cast("long").alias("rank"), "n_id", "score"
    )


def _sql_similarity_lsh(
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    qmax: int = 5,
    probe_radius: int = 3,
    n_tables: int = 2,
) -> str:
    from .operators.similarity import lsh_table_seed, probe_masks

    masks = ", ".join(str(m) for m in probe_masks(n_planes, probe_radius))
    bucket_cols = ",\n         ".join(
        f"{_sql_bucket_expr(dim, n_planes, seed=lsh_table_seed(t))} AS b{t}"
        for t in range(n_tables)
    )
    tbls = ", ".join(str(t) for t in range(n_tables))
    pick = (
        "CASE tbl "
        + " ".join(f"WHEN {t} THEN b{t}" for t in range(n_tables))
        + " END"
    )
    # first-matching-table emit-once guard, mirroring lsh_topk
    guards = []
    for t in range(1, n_tables):
        earlier = " OR ".join(
            f"bit_count(xor(c.b{tp}, qp.b{tp})) <= {probe_radius}"
            for tp in range(t)
        )
        guards.append(f"(c.tbl = {t} AND ({earlier}))")
    guard_sql = f"AND NOT ({' OR '.join(guards)})" if guards else ""
    bsel = ", ".join(f"b{t}" for t in range(n_tables))
    return f"""WITH e AS (
  SELECT vec_id, {_QUANT_V} AS v FROM embeddings
), n AS MATERIALIZED (
  SELECT vec_id, v, list_dot_product(v, v) AS nrm,
         {bucket_cols}
  FROM e
), q AS (SELECT * FROM n WHERE vec_id < {qmax}),
cp AS (
  SELECT vec_id, v, nrm, {bsel}, t.tbl, {pick} AS bucket
  FROM n, unnest([{tbls}]::BIGINT[]) t(tbl)
),
qp AS (
  SELECT vec_id, v, nrm, {bsel}, tbl, xor({pick}, m) AS bucket
  FROM q, unnest([{tbls}]::BIGINT[]) t(tbl), unnest([{masks}]::BIGINT[]) mm(m)
),
pairs AS (
  SELECT qp.vec_id AS q_id, c.vec_id AS n_id,
         CAST(list_dot_product(c.v, qp.v) AS DOUBLE)
           / sqrt(CAST(c.nrm AS DOUBLE) * CAST(qp.nrm AS DOUBLE)) AS score
  FROM cp c JOIN qp ON c.tbl = qp.tbl AND c.bucket = qp.bucket
                   AND c.vec_id <> qp.vec_id
  {guard_sql}
), ranked AS (
  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, n_id) AS BIGINT) AS rank,
         n_id, round(score, 6) AS score
  FROM pairs)
SELECT q_id, rank, n_id, score FROM ranked WHERE rank <= {k}"""


def q_similarity_lsh_rerank(spark, sf_dir):
    """Two-stage LSH retrieval (similarity.py: lsh_rerank_topk): a
    NARROW id-only bucket join over 4 tables × radius-3 probes
    generates candidates, then the exact cosine re-rank fetches raw
    vectors for just those ids via broadcast semi-join.  Measured
    recall vs exact top-5 at sf0.1: ≥0.95 (lsh_topk's 2 carried-vector
    tables sit at 0.80 — the narrowness pays for the extra tables)."""
    from .operators.similarity import lsh_rerank_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = lsh_rerank_topk(
        emb, queries, dim=64, k=5, n_planes=8, probe_radius=3, n_tables=4
    )
    return out.select(
        "q_id", F.col("rank").cast("long").alias("rank"), "n_id", "score"
    )


def _sql_similarity_lsh_rerank(
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    qmax: int = 5,
    probe_radius: int = 3,
    n_tables: int = 4,
) -> str:
    from .operators.similarity import lsh_table_seed, probe_masks

    masks = ", ".join(str(m) for m in probe_masks(n_planes, probe_radius))
    bucket_cols = ",\n         ".join(
        f"{_sql_bucket_expr(dim, n_planes, seed=lsh_table_seed(t))} AS b{t}"
        for t in range(n_tables)
    )
    tbls = ", ".join(str(t) for t in range(n_tables))
    pick = (
        "CASE tbl "
        + " ".join(f"WHEN {t} THEN b{t}" for t in range(n_tables))
        + " END"
    )
    return f"""WITH e AS (
  SELECT vec_id, {_QUANT_V} AS v FROM embeddings
), n AS MATERIALIZED (
  SELECT vec_id, v, list_dot_product(v, v) AS nrm,
         {bucket_cols}
  FROM e
), q AS (SELECT * FROM n WHERE vec_id < {qmax}),
cp AS (
  SELECT vec_id, t.tbl, {pick} AS bucket
  FROM n, unnest([{tbls}]::BIGINT[]) t(tbl)
),
qp AS (
  SELECT vec_id, tbl, xor({pick}, m) AS bucket
  FROM q, unnest([{tbls}]::BIGINT[]) t(tbl), unnest([{masks}]::BIGINT[]) mm(m)
),
cand AS (
  SELECT DISTINCT qp.vec_id AS q_id, c.vec_id AS n_id
  FROM cp c JOIN qp ON c.tbl = qp.tbl AND c.bucket = qp.bucket
                   AND c.vec_id <> qp.vec_id
),
pairs AS (
  SELECT cand.q_id, cand.n_id,
         CAST(list_dot_product(x.v, y.v) AS DOUBLE)
           / sqrt(CAST(x.nrm AS DOUBLE) * CAST(y.nrm AS DOUBLE)) AS score
  FROM cand JOIN n x ON x.vec_id = cand.n_id
            JOIN n y ON y.vec_id = cand.q_id
), ranked AS (
  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, n_id) AS BIGINT) AS rank,
         n_id, round(score, 6) AS score
  FROM pairs)
SELECT q_id, rank, n_id, score FROM ranked WHERE rank <= {k}"""


def q_similarity_lsh_indexed(spark, sf_dir):
    """Persisted-LSH-index query (similarity.py: write_lsh_index /
    lsh_rerank_topk_indexed): the corpus is hashed ONCE into an
    id-only bucket table partitioned by (tbl, bucket) plus a raw
    fetch table; the query probes push a static (tbl, bucket)
    partition filter (plan-asserted in pytest) and re-rank exactly.
    Shares q_similarity_lsh_rerank's oracle — the index round-trip
    must be invisible in the results."""
    import shutil

    from .operators.similarity import (
        lsh_rerank_topk_indexed,
        write_lsh_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    path = _fixture_scratch(sf_dir, "lsh_idx")
    shutil.rmtree(path, ignore_errors=True)
    write_lsh_index(emb, path, dim=64, n_planes=8, n_tables=4)
    out = lsh_rerank_topk_indexed(spark, path, queries, k=5, probe_radius=3)
    return out.select(
        "q_id", F.col("rank").cast("long").alias("rank"), "n_id", "score"
    )


def q_similarity_lsh_maintained(spark, sf_dir):
    """MAINTAINED persisted-LSH-index query (similarity.py:
    append_lsh_index / streaming.maintain_lsh_index): the index is
    built from one third of the corpus, the other two thirds arrive as
    two append segments (epoch-idempotent update directories — the
    foreachBatch maintenance path), and the probe unions base +
    segments.  Shares q_similarity_lsh_rerank's oracle — maintenance
    must be invisible in the results vs a full batch build."""
    import shutil

    from .operators.similarity import (
        append_lsh_index,
        lsh_rerank_topk_indexed,
        write_lsh_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    path = _fixture_scratch(sf_dir, "lsh_idx_maint")
    shutil.rmtree(path, ignore_errors=True)
    third = F.pmod(F.col("vec_id"), F.lit(3))
    write_lsh_index(
        emb.filter(third == 0), path, dim=64, n_planes=8, n_tables=4
    )
    # The two append segments are independent jobs writing disjoint
    # epoch directories (each hashes its own batch against the base
    # meta, with its own internal cache), so submit them from driver
    # threads and let the second segment's tasks back-fill the first's
    # stragglers (guide §2.6).  foreachBatch maintenance arrives
    # serially in production — this parallelism is the batch-replay
    # case (N segments to catch up), where it is exactly the
    # independent-jobs overlap the guide prescribes.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _f1 = _pool.submit(
            inheritable_thread_target(
                lambda: append_lsh_index(emb.filter(third == 1), path, 0)
            )
        )
        _f2 = _pool.submit(
            inheritable_thread_target(
                lambda: append_lsh_index(emb.filter(third == 2), path, 1)
            )
        )
        _f1.result()
        _f2.result()
    out = lsh_rerank_topk_indexed(spark, path, queries, k=5, probe_radius=3)
    return out.select(
        "q_id", F.col("rank").cast("long").alias("rank"), "n_id", "score"
    )


def q_stream_lsh_probe(spark, sf_dir):
    """Batch-mode run of the STREAMING persisted-index ANN probe
    (streaming.stream_lsh_probe): query vectors hashed row-locally,
    probed stream-static against the id-only bucket table, exact-
    cosine scored, thresholded — stateless append-mode online
    retrieval.  Emit-once across tables via the row-local first-
    matching-table guard (both sides carry their bucket arrays); the
    oracle replays hashing, probing, the guard, and the threshold."""
    import shutil

    from .operators.similarity import write_lsh_index
    from .streaming import stream_lsh_probe

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    path = _fixture_scratch(sf_dir, "lsh_probe_idx")
    shutil.rmtree(path, ignore_errors=True)
    write_lsh_index(emb, path, dim=64, n_planes=8, n_tables=4)
    return stream_lsh_probe(
        spark, path, queries, threshold=0.25, probe_radius=3
    )


def _sql_stream_lsh_probe(
    threshold: float = 0.25,
    dim: int = 64,
    n_planes: int = 8,
    qmax: int = 5,
    probe_radius: int = 3,
    n_tables: int = 4,
) -> str:
    from .operators.similarity import lsh_table_seed, probe_masks

    masks = ", ".join(str(m) for m in probe_masks(n_planes, probe_radius))
    bucket_cols = ",\n         ".join(
        f"{_sql_bucket_expr(dim, n_planes, seed=lsh_table_seed(t))} AS b{t}"
        for t in range(n_tables)
    )
    tbls = ", ".join(str(t) for t in range(n_tables))
    pick = (
        "CASE tbl "
        + " ".join(f"WHEN {t} THEN b{t}" for t in range(n_tables))
        + " END"
    )
    guards = []
    for t in range(1, n_tables):
        earlier = " OR ".join(
            f"bit_count(xor(c.b{tp}, qp.b{tp})) <= {probe_radius}"
            for tp in range(t)
        )
        guards.append(f"(c.tbl = {t} AND ({earlier}))")
    guard_sql = f"AND NOT ({' OR '.join(guards)})" if guards else ""
    bsel = ", ".join(f"b{t}" for t in range(n_tables))
    return f"""WITH e AS (
  SELECT vec_id, {_QUANT_V} AS v FROM embeddings
), n AS MATERIALIZED (
  SELECT vec_id, v, list_dot_product(v, v) AS nrm,
         {bucket_cols}
  FROM e
), q AS (SELECT * FROM n WHERE vec_id < {qmax}),
cp AS (
  SELECT vec_id, v, nrm, {bsel}, t.tbl, {pick} AS bucket
  FROM n, unnest([{tbls}]::BIGINT[]) t(tbl)
),
qp AS (
  SELECT vec_id, v, nrm, {bsel}, tbl, xor({pick}, m) AS bucket
  FROM q, unnest([{tbls}]::BIGINT[]) t(tbl), unnest([{masks}]::BIGINT[]) mm(m)
),
pairs AS (
  SELECT qp.vec_id AS q_id, c.vec_id AS n_id,
         CAST(list_dot_product(c.v, qp.v) AS DOUBLE)
           / sqrt(CAST(c.nrm AS DOUBLE) * CAST(qp.nrm AS DOUBLE)) AS score
  FROM cp c JOIN qp ON c.tbl = qp.tbl AND c.bucket = qp.bucket
                   AND c.vec_id <> qp.vec_id
  {guard_sql}
)
SELECT q_id, n_id, round(score, 6) AS score
FROM pairs WHERE score >= {threshold}"""


def q_similarity_ivf(spark, sf_dir):
    """IVF-indexed ANN top-k (probe 8 of 32 cells — finer cells at the
    same scanned fraction beat coarse cells: recall 0.80 vs 0.36 at
    sf0.1).  Training is
    bit-reproducible (exact ints + correctly rounded IEEE ops), so the
    oracle replays all k-means iterations in unrolled SQL."""
    from .operators.similarity import ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = ivf_topk(emb, queries, n_centroids=32, n_probe=8, k=5)
    return out.select(
        "q_id", F.col("rank").cast("long").alias("rank"), "n_id", "score"
    )


def _sql_kmeans_cor(
    n_centroids: int = 16, dim: int = 64, corpus_where: str = ""
) -> tuple:
    """Shared unrolled k-means replay: the CTE chain through ``cor``
    (every corpus vector with its quantized form, self-dot, and
    assigned cell) — the common prefix of the IVF and semantic-dedup
    oracles.  ``corpus_where`` filters the corpus BEFORE sampling,
    training, and assignment (the filtered-ANN variant — the whole
    index pipeline sees only matching vectors).  Returns
    ``(prefix_sql, nrm)`` where ``nrm`` renders the
    exact-int-then-IEEE norm expression."""
    sample_n = 256 * n_centroids
    key = f"(id * {SAMPLE_A} + {SAMPLE_B}) % {SAMPLE_M}"
    where = f" WHERE {corpus_where}" if corpus_where else ""

    def nrm(c: str) -> str:
        return (
            f"sqrt(CAST(list_sum(list_transform({c}, z -> z::HUGEINT * z))"
            " AS DOUBLE))"
        )

    # every iteration CTE is MATERIALIZED: DuckDB inlines CTEs by
    # default, and c{n} references c{n-1} twice — inlining would expand
    # the chain 2^ITERS times
    parts = [
        f"""WITH e AS MATERIALIZED (
  SELECT vec_id AS id, {_QUANT_V} AS v FROM embeddings{where}
), samp AS MATERIALIZED (
  SELECT id, v FROM e ORDER BY {key}, id LIMIT {sample_n}
), c0 AS MATERIALIZED (
  SELECT cell, cv FROM (
    SELECT CAST(row_number() OVER (ORDER BY {key}, id) AS INTEGER) - 1 AS cell,
           v AS cv
    FROM samp) WHERE cell < {n_centroids}
)"""
    ]
    for n in range(1, IVF_ITERS + 1):
        parts.append(
            f""", s{n} AS MATERIALIZED (
  SELECT s.id, s.v, c.cell,
         row_number() OVER (PARTITION BY s.id
           ORDER BY list_dot_product(s.v, c.cv) / {nrm("c.cv")} DESC, c.cell)
           AS rn
  FROM samp s, c{n - 1} c
), g{n} AS MATERIALIZED (
  SELECT cell, list(mv ORDER BY i) AS m FROM (
    SELECT cell, i, CAST(sum(v[i]) AS BIGINT) AS mv
    FROM s{n}, range(1, {dim + 1}) t(i) WHERE rn = 1 GROUP BY cell, i)
  GROUP BY cell
), c{n} AS MATERIALIZED (
  SELECT p.cell, CASE WHEN g.cell IS NULL THEN p.cv ELSE
    list_transform(g.m, y -> CAST(floor(({QUANT}::BIGINT * y) / {nrm("g.m")})
                                  AS BIGINT)) END AS cv
  FROM c{n - 1} p LEFT JOIN g{n} g ON p.cell = g.cell
)"""
        )
    cN = f"c{IVF_ITERS}"
    parts.append(
        f""", cor AS MATERIALIZED (
  SELECT id AS n_id, v AS cv, CAST(list_dot_product(v, v) AS BIGINT) AS cn,
         cell FROM (
    SELECT e.id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.id
             ORDER BY list_dot_product(e.v, c.cv) / {nrm("c.cv")} DESC, c.cell)
             AS rn
    FROM e, {cN} c) WHERE rn = 1
)"""
    )
    return "".join(parts), nrm


def _sql_ivf(
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 5,
    dim: int = 64,
    qmax: int = 5,
    corpus_where: str = "",
) -> str:
    """Unrolled replay of ivf_topk: shared k-means/cor prefix → query
    probe assignment → probe equi-join → exact rerank.
    ``corpus_where`` filters the CORPUS side only (training, cells,
    candidates); queries always come from the full table."""
    prefix, nrm = _sql_kmeans_cor(n_centroids, dim, corpus_where)
    cN = f"c{IVF_ITERS}"
    return prefix + f""", eq AS MATERIALIZED (
  SELECT vec_id AS id, {_QUANT_V} AS v FROM embeddings WHERE vec_id < {qmax}
), qp AS (
  SELECT id AS q_id, v AS qv, CAST(list_dot_product(v, v) AS BIGINT) AS qn,
         cell FROM (
    SELECT e.id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.id
             ORDER BY list_dot_product(e.v, c.cv) / {nrm("c.cv")} DESC, c.cell)
             AS rn
    FROM eq e, {cN} c) WHERE rn <= {n_probe}
), scored AS (
  SELECT qp.q_id, cor.n_id,
         CAST(list_dot_product(cor.cv, qp.qv) AS DOUBLE)
           / sqrt(CAST(cor.cn AS DOUBLE) * CAST(qp.qn AS DOUBLE)) AS score
  FROM cor JOIN qp ON cor.cell = qp.cell WHERE cor.n_id <> qp.q_id
), ranked AS (
  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, n_id) AS BIGINT) AS rank,
         n_id, round(score, 6) AS score FROM scored)
SELECT q_id, rank, n_id, score FROM ranked WHERE rank <= {k}"""


def q_similarity_ivf_filtered(spark, sf_dir):
    """Metadata-FILTERED ANN: IVF top-k where the corpus is restricted
    to ``label % 3 = 1`` BEFORE training — pre-filtering, the correct
    strategy when the predicate is selective (post-filtering a top-k
    can return fewer than k survivors and re-probing is wasted work;
    pre-filtering keeps the guarantee and the label predicate pushes
    into the parquet scan, so at 100 TB only matching row groups are
    decoded).  Centroids train on the filtered corpus, so cells follow
    the restricted distribution — the oracle replays the whole
    filtered pipeline."""
    from .operators.similarity import ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.pmod(F.col("label"), F.lit(3)) == 1)
    queries = emb.filter(F.col("vec_id") < 5)
    out = ivf_topk(corpus, queries, n_centroids=16, n_probe=4, k=5)
    return out.select(
        "q_id", F.col("rank").cast("long").alias("rank"), "n_id", "score"
    )


def q_similarity_pq(spark, sf_dir):
    """Product-quantization ANN top-k (32 subspaces × 256 codes over
    the 64-dim embeddings — 8× compression, measured recall@5 0.92 vs
    the exact baseline at sf0.01 and sf0.1).  Training, encoding and
    ADC scoring are exact-integer, so the oracle replays every Lloyd
    iteration, the code assignment, and the reconstructed-cosine
    score in unrolled SQL."""
    from .operators.similarity import pq_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = pq_topk(emb, queries, m_sub=32, ks=256, k=5)
    return out.select(
        "q_id", F.col("rank").cast("long").alias("rank"), "n_id", "score"
    )


def _sql_pq(
    m_sub: int = 32,
    ks: int = 256,
    k: int = 5,
    dim: int = 64,
    qmax: int = 5,
    shortlist: int | None = None,
) -> str:
    """Unrolled replay of pq_topk: per-subspace k-means (PQ_ITERS
    Lloyd iterations under exact integer arithmetic — the assignment
    objective is ``c·c - 2·x·c`` with ties to the lowest code, the
    update is the per-dim FLOOR-divided mean via the pmod trick since
    DuckDB ``//`` truncates toward zero), then corpus code assignment
    and the reconstructed-cosine ADC score.  With ``shortlist`` set it
    replays pq_rerank_topk instead: the ADC ranking keeps ``shortlist``
    candidates per query and the final ranking is the EXACT cosine on
    the raw quantized vectors."""
    from .operators.similarity import PQ_ITERS

    ds = dim // m_sub
    sample_n = 256 * ks
    key = f"(id * {SAMPLE_A} + {SAMPLE_B}) % {SAMPLE_M}"
    parts = [
        f"""WITH e AS MATERIALIZED (
  SELECT vec_id AS id, {_QUANT_V} AS v FROM embeddings
), sub AS MATERIALIZED (
  SELECT id, m, v[m*{ds}+1 : (m+1)*{ds}] AS sv
  FROM e, range(0, {m_sub}) t(m)
), samp AS MATERIALIZED (
  SELECT id, v, CAST(row_number() OVER (ORDER BY {key}, id) AS INTEGER) - 1
         AS sr
  FROM e ORDER BY {key}, id LIMIT {sample_n}
), ssub AS MATERIALIZED (
  SELECT sr, m, v[m*{ds}+1 : (m+1)*{ds}] AS sv
  FROM samp, range(0, {m_sub}) t(m)
), cb0 AS MATERIALIZED (
  SELECT m, sr AS code, sv AS cv FROM ssub WHERE sr < {ks}
)"""
    ]
    for n in range(1, PQ_ITERS + 1):
        parts.append(
            f""", s{n} AS MATERIALIZED (
  SELECT s.sr, s.m, s.sv, c.code,
         row_number() OVER (PARTITION BY s.sr, s.m
           ORDER BY CAST(list_dot_product(c.cv, c.cv) AS BIGINT)
                    - 2*CAST(list_dot_product(s.sv, c.cv) AS BIGINT) ASC,
                    c.code) AS rn
  FROM ssub s JOIN cb{n - 1} c ON s.m = c.m
), g{n} AS MATERIALIZED (
  SELECT m, code, cnt, list(mv ORDER BY i) AS sm FROM (
    SELECT m, code, i, CAST(sum(sv[i]) AS BIGINT) AS mv,
           CAST(count(*) AS BIGINT) AS cnt
    FROM s{n}, range(1, {ds + 1}) t(i) WHERE rn = 1 GROUP BY m, code, i)
  GROUP BY m, code, cnt
), cb{n} AS MATERIALIZED (
  SELECT p.m, p.code, CASE WHEN g.code IS NULL THEN p.cv ELSE
    list_transform(g.sm,
                   y -> (y - ((y % g.cnt + g.cnt) % g.cnt)) // g.cnt)
  END AS cv
  FROM cb{n - 1} p LEFT JOIN g{n} g ON p.m = g.m AND p.code = g.code
)"""
        )
    cbN = f"cb{PQ_ITERS}"
    parts.append(
        f""", codes AS MATERIALIZED (
  SELECT id AS n_id, m, code, cn FROM (
    SELECT s.id, s.m, c.code,
           CAST(list_dot_product(c.cv, c.cv) AS BIGINT) AS cn,
           row_number() OVER (PARTITION BY s.id, s.m
             ORDER BY CAST(list_dot_product(c.cv, c.cv) AS BIGINT)
                      - 2*CAST(list_dot_product(s.sv, c.cv) AS BIGINT) ASC,
                      c.code) AS rn
    FROM sub s JOIN {cbN} c ON s.m = c.m) WHERE rn = 1
), qn AS (
  SELECT id AS q_id, CAST(list_dot_product(v, v) AS BIGINT) AS qn
  FROM e WHERE id < {qmax}
), qsub AS (
  SELECT id AS q_id, m, sv FROM sub WHERE id < {qmax}
), scored AS (
  SELECT q.q_id, cd.n_id,
         CAST(SUM(CAST(list_dot_product(q.sv, c.cv) AS BIGINT)) AS DOUBLE)
           / sqrt(CAST(MIN(qn.qn) AS DOUBLE) * CAST(SUM(cd.cn) AS DOUBLE))
           AS score
  FROM codes cd
  JOIN {cbN} c ON cd.m = c.m AND cd.code = c.code
  JOIN qsub q ON q.m = cd.m
  JOIN qn ON qn.q_id = q.q_id
  WHERE cd.n_id <> q.q_id
  GROUP BY q.q_id, cd.n_id
), ranked AS (
  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, n_id) AS BIGINT) AS rank,
         n_id, round(score, 6) AS score FROM scored)"""
    )
    if shortlist is None:
        parts.append(
            f"\nSELECT q_id, rank, n_id, score FROM ranked WHERE rank <= {k}"
        )
    else:
        parts.append(
            f""", cand AS (
  SELECT q_id, n_id FROM ranked WHERE rank <= {shortlist}
), ex AS (
  SELECT cand.q_id, cand.n_id,
         CAST(list_dot_product(nc.v, qe.v) AS DOUBLE)
           / sqrt(CAST(list_dot_product(nc.v, nc.v) AS DOUBLE)
                  * CAST(list_dot_product(qe.v, qe.v) AS DOUBLE)) AS score
  FROM cand JOIN e nc ON nc.id = cand.n_id JOIN e qe ON qe.id = cand.q_id
), rr AS (
  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, n_id) AS BIGINT) AS rank,
         n_id, round(score, 6) AS score FROM ex)
SELECT q_id, rank, n_id, score FROM rr WHERE rank <= {k}"""
        )
    return "".join(parts)


def q_similarity_pq_rerank(spark, sf_dir):
    """Two-stage ANN: PQ ADC shortlist (20 candidates from the 8-byte
    codes scan) re-ranked by the EXACT cosine on raw vectors fetched
    for only those candidates — the production serving shape where
    the compressed scan finds candidates and full-precision work is
    paid on |Q|·shortlist rows only.  Recall@k dominates plain PQ at
    the same k; the oracle replays both stages bit-for-bit."""
    from .operators.similarity import pq_rerank_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = pq_rerank_topk(emb, queries, m_sub=32, ks=256, k=5, shortlist=20)
    return out.select(
        "q_id", F.col("rank").cast("long").alias("rank"), "n_id", "score"
    )


def _sql_semantic_dedup(n_centroids: int = 16, threshold: float = 0.85) -> str:
    """Replay of semantic_dedup: shared k-means/cor prefix, then the
    within-cell lower-id neighbor test at the exact same IEEE score."""
    prefix, _ = _sql_kmeans_cor(n_centroids)
    return prefix + f""", dup AS (
  SELECT DISTINCT a.n_id FROM cor a JOIN cor b
    ON a.cell = b.cell AND b.n_id < a.n_id
  WHERE CAST(list_dot_product(a.cv, b.cv) AS DOUBLE)
        / sqrt(CAST(a.cn AS DOUBLE) * CAST(b.cn AS DOUBLE)) >= {threshold!r}
)
SELECT c.n_id AS vec_id, c.cell, (d.n_id IS NULL) AS kept
FROM cor c LEFT JOIN dup d ON c.n_id = d.n_id"""


def q_interval_join_by(spark, sf_dir):
    """Keyed overlap join: each user's click spans x that user's
    purchase spans only — co-partitioned equi+range join, the per-entity
    shape that scales where the all-pairs join cannot."""
    es = event_spans(spark, sf_dir, truncate_us=True)
    clicks = es.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "span"
    )
    # a user's event spans are adjacent (lead-derived), so widen the
    # purchase side ±12h to create genuine same-user overlaps
    pad = 43_200_000_000_000
    purch = es.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event"),
        make_span(
            F.col("span.start") - F.lit(pad), F.col("span.stop") + F.lit(pad)
        ).alias("span"),
    )
    j = interval_join_by(clicks, purch, by="user_id", validate="skip")
    return j.select(
        "user_id",
        "event_id",
        "p_event",
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


def q_interval_join_by_auto(spark, sf_dir):
    """q_interval_join_by through the SKETCH-DRIVEN strategy='auto'
    path (plans/planner.py): broadcast fast paths, then the Count-Min
    pair-work estimate decides hash vs binned.  Shares the hash-path
    oracle — whatever physical shape auto picks, the rows must be
    identical (the planner is an execution detail, never a semantics
    change)."""
    es = event_spans(spark, sf_dir, truncate_us=True)
    clicks = es.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "span"
    )
    pad = 43_200_000_000_000
    purch = es.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event"),
        make_span(
            F.col("span.start") - F.lit(pad), F.col("span.stop") + F.lit(pad)
        ).alias("span"),
    )
    j = interval_join_by(
        clicks, purch, by="user_id", validate="skip", strategy="auto"
    )
    return j.select(
        "user_id",
        "event_id",
        "p_event",
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


_SQL_JOIN_BY = f"""WITH {_ES_CTE},
c AS (SELECT user_id, event_id, s, e FROM es WHERE event_type = 'click'),
p AS (SELECT user_id, event_id AS p_event,
             s - 43200000000000 AS s, e + 43200000000000 AS e FROM es
      WHERE event_type = 'purchase')
SELECT c.user_id, c.event_id, p.p_event,
       greatest(c.s, p.s) AS i_start, least(c.e, p.e) AS i_stop
FROM c JOIN p ON c.user_id = p.user_id
             AND greatest(c.s, p.s) < least(c.e, p.e)"""


def q_stream_join_by(spark, sf_dir):
    """The KEYED streaming interval join (by='user_id') in batch-batch
    mode — the streaming twin of interval_join_by: the key compounds
    the bin equi-join, so per-user streams co-partition and never meet
    cross-user candidates.  Same fixture as q_interval_join_by (clicks
    × ±12h-widened same-user purchases), same oracle."""
    from .streaming import stream_interval_join

    es = event_spans(spark, sf_dir, truncate_us=True)
    clicks = es.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "span"
    )
    wide = 43_200_000_000_000
    purch = es.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event"),
        make_span(
            F.col("span.start") - F.lit(wide), F.col("span.stop") + F.lit(wide)
        ).alias("span"),
    )
    j = stream_interval_join(
        clicks,
        purch,
        by="user_id",
        bin_width_ns=21_600_000_000_000,
        max_span_ns=35 * 86_400_000_000_000,
    )
    return j.select(
        "user_id",
        "event_id",
        "p_event",
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


def q_interval_join_by_keepleft(spark, sf_dir):
    """Keyed LEFT-OUTER overlap join through the BINNED strategy: every
    click row survives (null purchase columns when no same-user overlap)
    — exercises the keyed binned path's persisted-id anti-join recovery
    end-to-end against the oracle.  Purchases here keep their raw
    (unwidened) spans so a large fraction of clicks are genuinely
    unmatched."""
    es = event_spans(spark, sf_dir, truncate_us=True)
    clicks = es.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "span"
    )
    pad = 3_600_000_000_000  # ±1h — some matches, many padded rows
    purch = es.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event"),
        make_span(
            F.col("span.start") - F.lit(pad), F.col("span.stop") + F.lit(pad)
        ).alias("span"),
    )
    # explicit 7-day bins: the key already partitions the join, so wide
    # bins minimize explode fan-out (measured 1.9s vs 3.7s with the
    # global-join width estimate at sf0.1) and skip the stats scans
    j = interval_join_by(
        clicks,
        purch,
        by="user_id",
        keepleft=True,
        validate="skip",
        strategy="binned",
        bin_width=7 * 24 * 3_600_000_000_000,
    )
    return j.select(
        "user_id",
        "event_id",
        "p_event",
        F.col("span.start").alias("i_start"),
        F.col("span.stop").alias("i_stop"),
    )


_SQL_JOIN_BY_KEEPLEFT = f"""WITH {_ES_CTE},
c AS (SELECT user_id, event_id, s, e FROM es WHERE event_type = 'click'),
p AS (SELECT user_id, event_id AS p_event,
             s - 3600000000000 AS s, e + 3600000000000 AS e FROM es
      WHERE event_type = 'purchase')
SELECT c.user_id, c.event_id, p.p_event,
       CASE WHEN p.p_event IS NULL THEN NULL
            ELSE greatest(c.s, p.s) END AS i_start,
       CASE WHEN p.p_event IS NULL THEN NULL
            ELSE least(c.e, p.e) END AS i_stop
FROM c LEFT JOIN p ON c.user_id = p.user_id
                  AND greatest(c.s, p.s) < least(c.e, p.e)"""


def q_overlap_profile(spark, sf_dir):
    """Per-user concurrency depth profile of event spans (sweep-line):
    disjoint segments + how many spans cover them."""
    es = event_spans(spark, sf_dir, truncate_us=True)
    prof = overlap_profile(es.select("user_id", "span"), by="user_id")
    return prof.select(
        "user_id",
        F.col("span.start").alias("seg_start"),
        F.col("span.stop").alias("seg_stop"),
        "depth",
    )


_SQL_OVERLAP_PROFILE = f"""WITH {_ES_CTE},
pts AS (
  SELECT user_id, s AS pos, 1 AS d FROM es
  UNION ALL
  SELECT user_id, e AS pos, -1 AS d FROM es
),
agg AS (SELECT user_id, pos, sum(d) AS delta FROM pts GROUP BY user_id, pos),
prof AS (
  SELECT user_id, pos,
         sum(delta) OVER (PARTITION BY user_id ORDER BY pos) AS depth,
         lead(pos) OVER (PARTITION BY user_id ORDER BY pos) AS nxt
  FROM agg
)
SELECT user_id, pos AS seg_start, nxt AS seg_stop,
       CAST(depth AS BIGINT) AS depth
FROM prof WHERE nxt IS NOT NULL AND depth > 0"""


def q_span_difference(spark, sf_dir):
    """Per-user event spans minus the union of that user's 'click'
    spans — interval subtraction via the complement rewrite (no per-row
    state; merge + key-equi join)."""
    es = event_spans(spark, sf_dir, truncate_us=True)
    right = es.filter(F.col("event_type") == "click").select("user_id", "span")
    diff = span_difference(
        es.select("event_id", "user_id", "span"), right, by="user_id"
    )
    return diff.select(
        "event_id",
        "user_id",
        F.col("span.start").alias("f_start"),
        F.col("span.stop").alias("f_stop"),
    )


_SQL_SPAN_DIFFERENCE = f"""WITH {_ES_CTE},
r AS (SELECT user_id, s, e FROM es WHERE event_type = 'click'),
m1 AS (SELECT user_id, s, e,
        max(e) OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       FROM r),
m2 AS (SELECT user_id, s, e,
        CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS brk FROM m1),
m3 AS (SELECT user_id, s, e,
        sum(brk) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
       FROM m2),
islands AS (SELECT user_id, min(s) AS i_s, max(e) AS i_e
            FROM m3 GROUP BY user_id, isl),
comp AS (
  SELECT user_id, i_e AS cs,
         coalesce(lead(i_s) OVER (PARTITION BY user_id ORDER BY i_s),
                  (SELECT hi FROM b)) AS ce
  FROM islands
  UNION ALL
  SELECT user_id, (SELECT lo FROM b) AS cs, min(i_s) AS ce
  FROM islands GROUP BY user_id
),
compn AS (SELECT * FROM comp WHERE cs < ce),
frag AS (
  SELECT es.event_id, es.user_id,
         greatest(es.s, c.cs) AS f_start, least(es.e, c.ce) AS f_stop
  FROM es JOIN compn c
    ON es.user_id = c.user_id AND c.cs < es.e AND es.s < c.ce
  UNION ALL
  SELECT es.event_id, es.user_id, es.s AS f_start, es.e AS f_stop
  FROM es ANTI JOIN (SELECT DISTINCT user_id FROM r) u USING (user_id)
)
SELECT event_id, user_id, f_start, f_stop FROM frag"""


def q_interval_semijoin(spark, sf_dir):
    """Event spans overlapping windows 3 or 6 of 8 — native
    BroadcastNestedLoop LeftSemi, output multiset = filtered left."""
    es, w = _es_windows(spark, sf_dir, 8, "idx")
    wsel = w.filter(F.col("idx").isin(3, 6)).select("span")
    out = interval_semi_join(es, wsel, strategy="broadcast_right")
    return out.select(
        "event_id",
        "user_id",
        F.col("span.start").alias("s"),
        F.col("span.stop").alias("e"),
    )


def q_interval_antijoin(spark, sf_dir):
    """Complement of q_interval_semijoin, forced down the BINNED
    existence path so the id-stamped large-right strategy is under the
    oracle gate too."""
    es, w = _es_windows(spark, sf_dir, 8, "idx")
    wsel = w.filter(F.col("idx").isin(3, 6)).select("span")
    out = interval_anti_join(es, wsel, strategy="binned")
    return out.select(
        "event_id",
        "user_id",
        F.col("span.start").alias("s"),
        F.col("span.stop").alias("e"),
    )


_SQL_SEMIJOIN = f"""WITH {_ES_CTE},
{_w_cte(8, 'idx')},
ws AS (SELECT w_start, w_stop FROM w WHERE idx IN (3, 6))
SELECT es.event_id, es.user_id, es.s, es.e
FROM es WHERE EXISTS (SELECT 1 FROM ws
                      WHERE ws.w_start < es.e AND es.s < ws.w_stop)"""

_SQL_ANTIJOIN = f"""WITH {_ES_CTE},
{_w_cte(8, 'idx')},
ws AS (SELECT w_start, w_stop FROM w WHERE idx IN (3, 6))
SELECT es.event_id, es.user_id, es.s, es.e
FROM es WHERE NOT EXISTS (SELECT 1 FROM ws
                          WHERE ws.w_start < es.e AND es.s < ws.w_stop)"""


def q_stream_interval_filter(spark, sf_dir):
    """Batch-mode run of the STREAMING stream-static overlap filter
    (both keep directions over q_interval_semijoin's exact fixture,
    tagged and unioned): the stateless broadcast semi/anti composition
    must partition the left multiset exactly — every row lands on
    exactly one side, so the oracle is one EXISTS CASE over es."""
    from .streaming import stream_interval_filter

    es, w = _es_windows(spark, sf_dir, 8, "idx")
    wsel = w.filter(F.col("idx").isin(3, 6)).select("span")
    parts = [
        stream_interval_filter(es, wsel, keep=keep).withColumn(
            "side", F.lit(keep)
        )
        for keep in ("inside", "outside")
    ]
    return (
        parts[0]
        .unionByName(parts[1])
        .select(
            "event_id",
            "user_id",
            F.col("span.start").alias("s"),
            F.col("span.stop").alias("e"),
            "side",
        )
    )


_SQL_STREAM_INTERVAL_FILTER = f"""WITH {_ES_CTE},
{_w_cte(8, 'idx')},
ws AS (SELECT w_start, w_stop FROM w WHERE idx IN (3, 6))
SELECT es.event_id, es.user_id, es.s, es.e,
       CASE WHEN EXISTS (SELECT 1 FROM ws
                         WHERE ws.w_start < es.e AND es.s < ws.w_stop)
            THEN 'inside' ELSE 'outside' END AS side
FROM es"""


def q_data_quantile_windows(spark, sf_dir):
    """16 equal-count windows over event timestamps (exact data
    quantiles via iterative histogram refinement — no sort shuffle),
    then per-window row counts via a broadcast range join.

    Scale shape: the windows table is 16 known rows → broadcast side of
    an inner BNLJ streamed over events; empty windows recovered by a
    tiny windows-side left join afterward.  No stage touches more than
    one full scan of the single pruned column."""
    ev = read_table(spark, sf_dir, "events").select(
        (F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))).alias("v")
    )
    win = data_quantile_windows(ev, 16, "v", label="idx")
    flat = win.select(
        "idx",
        F.col("span.start").alias("w_start"),
        F.col("span.stop").alias("w_stop"),
    )
    counts = (
        ev.join(
            F.broadcast(flat),
            (F.col("v") >= F.col("w_start")) & (F.col("v") < F.col("w_stop")),
            "inner",
        )
        .groupBy("idx")
        .agg(F.count("v").alias("n_rows"))
    )
    return flat.join(counts, "idx", "left").select(
        "idx",
        "w_start",
        "w_stop",
        F.coalesce(F.col("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
    )


_SQL_DATA_QUANTILES = """WITH v AS (SELECT epoch_ns(ts) AS v FROM events),
st AS (SELECT count(*) AS N FROM v),
s AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
bd AS (
  SELECT k, (SELECT min(v) FROM s WHERE rn = 1 + (k*(N-1))//16) AS b
  FROM generate_series(0,16) t(k), st
),
w AS (
  SELECT k+1 AS idx, b AS w_start,
         lead(b) OVER (ORDER BY k) + (CASE WHEN k = 15 THEN 1 ELSE 0 END)
           AS w_stop
  FROM bd
)
SELECT idx, w_start, w_stop, CAST(count(v.v) AS BIGINT) AS n_rows
FROM w LEFT JOIN v ON v.v >= w.w_start AND v.v < w.w_stop
WHERE w_stop IS NOT NULL
GROUP BY idx, w_start, w_stop"""


def q_span_gaps(spark, sf_dir):
    """Uncovered gaps between a user's coalesced coverage islands —
    the dual of q_merge_spans (same single shuffle; islands then a
    per-key lead)."""
    from .operators.coalesce import span_gaps

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", (F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))).alias("ts")
    )
    spans = ev.select(
        "user_id", make_span(F.col("ts"), F.col("ts") + F.lit(_HOUR_NS)).alias("span")
    )
    g = span_gaps(spans, by="user_id")
    return g.select(
        "user_id",
        F.col("span.start").alias("g_start"),
        F.col("span.stop").alias("g_stop"),
    )


_SQL_SPAN_GAPS = f"""WITH {_SQL_MERGE_CTE},
nx AS (
  SELECT user_id, s_start, s_stop,
         lead(s_start) OVER (PARTITION BY user_id ORDER BY s_start) AS nxt
  FROM isl)
SELECT user_id, s_stop AS g_start, nxt AS g_stop
FROM nx WHERE nxt IS NOT NULL AND nxt > s_stop"""


def q_span_complement(spark, sf_dir):
    """Per-user complement of coverage within the global observed range
    [min start, max stop) — head + gaps + tail pieces.  The bounds agg
    is one tiny partial-aggregated action; the complement itself is the
    merge_spans shuffle + a per-key lead."""
    from .operators.coalesce import span_complement

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", (F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))).alias("ts")
    )
    spans = ev.select(
        "user_id", make_span(F.col("ts"), F.col("ts") + F.lit(_HOUR_NS)).alias("span")
    )
    b = driver_row(spans.agg(
        F.min(F.col("span.start")).alias("lo"), F.max(F.col("span.stop")).alias("hi")
    ))
    comp = span_complement(spans, int(b["lo"]), int(b["hi"]), by="user_id")
    return comp.select(
        "user_id",
        F.col("span.start").alias("c_start"),
        F.col("span.stop").alias("c_stop"),
    )


_SQL_SPAN_COMPLEMENT = f"""WITH {_SQL_MERGE_CTE},
b AS (SELECT min(s_start) AS lo, max(s_stop) AS hi FROM isl),
nx AS (
  SELECT user_id, s_start, s_stop,
         lead(s_start) OVER (PARTITION BY user_id ORDER BY s_start) AS nxt
  FROM isl),
head AS (
  SELECT user_id, (SELECT lo FROM b) AS cs, min(s_start) AS ce
  FROM isl GROUP BY user_id),
mt AS (
  SELECT user_id, s_stop AS cs, coalesce(nxt, (SELECT hi FROM b)) AS ce
  FROM nx),
allc AS (SELECT * FROM head UNION ALL SELECT * FROM mt)
SELECT user_id, cs AS c_start, ce AS c_stop FROM allc WHERE cs < ce"""


def q_stream_tumbling_agg(spark, sf_dir):
    """Tumbling 1-hour windows + per-event-type aggregation through the
    STREAMING operator in batch mode — F.window() epoch-aligned windows
    must reproduce the arithmetic floor-to-hour bucketing exactly.
    Value sums are fixed-point bigints (round(value*1e6)) so the result
    is invariant to partial-aggregation order on both engines."""
    from .streaming import stream_tumbling_agg

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    out = stream_tumbling_agg(
        ev,
        _HOUR_NS,
        [
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v_fx").alias("sum_value_fx"),
        ],
        ts_col="ts",
        by="event_type",
    )
    return out.select(
        "event_type",
        F.col("span.start").alias("w_start"),
        F.col("span.stop").alias("w_stop"),
        "n_events",
        "sum_value_fx",
    )


_SQL_STREAM_TUMBLING = f"""WITH ev AS (
  SELECT event_type, epoch_ns(ts) AS t,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events)
SELECT event_type,
       t - t % {_HOUR_NS} AS w_start,
       t - t % {_HOUR_NS} + {_HOUR_NS} AS w_stop,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(v_fx) AS BIGINT) AS sum_value_fx
FROM ev GROUP BY event_type, w_start, w_stop"""


_PACK_BUDGET = 1024


def q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing of the whole corpus (GLOBAL
    order by doc_id, 1024-token budget): each document is assigned to
    the context-window chunk where its first token lands.  Exercises
    the keyless exclusive running sum — range-bucketed two-pass, no
    single-partition window (see operators/packing.py)."""
    from .operators.packing import pack_sequences

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    packed = pack_sequences(
        docs, budget=_PACK_BUDGET, tokens_col="n_tokens", order_col="doc_id"
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_offset").cast("long").alias("chunk_offset"),
    )


_SQL_PACK_SEQUENCES = rf"""WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM t)
SELECT doc_id, n_tokens,
       CAST(s // {_PACK_BUDGET} AS BIGINT) AS chunk_id,
       CAST(s % {_PACK_BUDGET} AS BIGINT) AS chunk_offset
FROM c"""


def q_stratified_sample(spark, sf_dir):
    """Per-language deterministic downsampling (data-mixture
    rebalancing): en kept at 30%, fr at 70%, everything else at 100% —
    membership is a pure hash filter, reproducible on any engine or
    partitioning."""
    from .operators.sampling import stratified_sample

    docs = read_table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs,
        strata_col="lang",
        rates={"en": 0.3, "fr": 0.7},
        key_col="doc_id",
        default_rate=1.0,
    )
    return out.select("doc_id", "lang")


_SQL_STRATIFIED = """WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('stratified|' || doc_id::VARCHAR), 1, 15))::BIGINT
           % 1000000 AS bkt
  FROM documents)
SELECT doc_id, lang FROM b
WHERE bkt < CASE lang WHEN 'en' THEN 300000
                      WHEN 'fr' THEN 700000
                      ELSE 1000000 END"""


def q_topk_per_group(spark, sf_dir):
    """Top-3 longest documents per language — the per-group limit
    staple (one shuffle on the group key; Spark's WindowGroupLimit
    keeps only each partition's top slice ahead of the final rank)."""
    from .operators.sampling import topk_per_group

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", char_count(F.col("text")).cast("long").alias("n_chars")
    )
    out = topk_per_group(
        docs, "lang", [F.col("n_chars").desc(), F.col("doc_id")], k=3
    )
    return out.select(
        "doc_id", "lang", "n_chars", F.col("rank").cast("long").alias("rank")
    )


_SQL_TOPK_PER_GROUP = """WITH t AS (
  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars FROM documents
), r AS (
  SELECT doc_id, lang, n_chars,
         CAST(row_number() OVER (PARTITION BY lang
              ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
  FROM t)
SELECT doc_id, lang, n_chars, rank FROM r WHERE rank <= 3"""


def q_point_in_span(spark, sf_dir):
    """Stabbing join: each raw event attributed to the one 8-window
    slot CONTAINING its timestamp (span.start <= ts < span.stop) —
    the point-event attribution shape, via the [t, t+1) encoding over
    the broadcast interval-join machinery."""
    from .operators.interval_join import point_in_span_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))).alias("ts"),
    )
    _, w = _es_windows(spark, sf_dir, 8, "idx")
    j = point_in_span_join(
        ev, w, ts_col="ts", strategy="broadcast_right", validate="skip"
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        "idx",
        F.col("span_right.start").alias("w_start"),
        F.col("span_right.stop").alias("w_stop"),
    )


_SQL_POINT_IN_SPAN = f"""WITH {_ES_CTE},
{_w_cte(8, 'idx')},
ev AS (
  SELECT event_id, user_id,
         epoch_ns(ts) - epoch_ns(ts) % 1000 AS t
  FROM events)
SELECT ev.event_id, ev.user_id, ev.t AS ts, w.idx, w.w_start, w.w_stop
FROM ev JOIN w ON ev.t >= w.w_start AND ev.t < w.w_stop"""


def q_repetition_score(spark, sf_dir):
    """Per-document repetition signal (fraction of word-3-gram
    occurrences repeating an earlier one) — the boilerplate/stuffing
    filter; plus the filter decision at the conventional 0.2 cutoff."""
    from .functions.text import repetition_score

    docs = read_table(spark, sf_dir, "documents")
    rep = repetition_score(F.col("text"), 3)
    return docs.select(
        "doc_id",
        F.round(rep, 6).alias("rep_frac"),
        (rep <= 0.2).alias("keep"),
    )


_SQL_REPETITION = r"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(tl) < 3 THEN [array_to_string(tl, ' ')]
       ELSE list_transform(range(1, len(tl) - 1),
                           i -> array_to_string(tl[i:i+2], ' ')) END AS sl
  FROM toks
), r AS (
  SELECT doc_id,
         1.0 - CAST(len(list_distinct(sl)) AS DOUBLE)
               / CAST(len(sl) AS DOUBLE) AS rep
  FROM sh)
SELECT doc_id, round(rep, 6) AS rep_frac, rep <= 0.2 AS keep FROM r"""


def q_pack_greedy(spark, sf_dir):
    """No-split greedy packing per language: chunks close when the next
    document would overflow the 1024-token budget (documents never
    straddle chunks — sample-level packing).  Sequential per key, so
    the oracle replays it with a recursive CTE."""
    from .operators.packing import pack_sequences_greedy

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    packed = pack_sequences_greedy(
        docs, budget=_PACK_BUDGET, tokens_col="n_tokens", order_col="doc_id",
        by="lang",
    )
    return packed.select("doc_id", "lang", "n_tokens", "chunk_id")


_SQL_PACK_GREEDY = rf"""WITH RECURSIVE t AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM t
), s AS (
  SELECT doc_id, lang, n_tokens, rn,
         CAST(0 AS BIGINT) AS chunk_id, n_tokens AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.doc_id, o.lang, o.n_tokens, o.rn,
         CASE WHEN s.fill > 0 AND s.fill + o.n_tokens > {_PACK_BUDGET}
              THEN s.chunk_id + 1 ELSE s.chunk_id END,
         CASE WHEN s.fill > 0 AND s.fill + o.n_tokens > {_PACK_BUDGET}
              THEN o.n_tokens ELSE s.fill + o.n_tokens END
  FROM s JOIN o ON o.lang = s.lang AND o.rn = s.rn + 1
)
SELECT doc_id, lang, n_tokens, chunk_id FROM s"""


def q_training_prep_v2(spark, sf_dir):
    """End-to-end corpus preparation composing the round-4 operators:
    exact dedup -> quality floor -> repetition filter -> per-language
    stratified downsampling (en 50%) -> greedy no-split packing into
    1024-token chunks -> per-(lang, chunk) manifest.  Every stage is
    deterministic, so ONE oracle replays the whole pipeline."""
    from .functions.text import quality_score, repetition_score
    from .operators.dedup import exact_dedup_keep
    from .operators.packing import pack_sequences_greedy
    from .operators.sampling import stratified_sample

    docs = read_table(spark, sf_dir, "documents")
    kept = exact_dedup_keep(docs)
    good = kept.filter(
        (F.round(quality_score(F.col("text")), 6) >= 0.5)
        & (F.round(repetition_score(F.col("text"), 3), 6) <= 0.2)
    )
    sampled = stratified_sample(
        good, strata_col="lang", rates={"en": 0.5}, key_col="doc_id",
        default_rate=1.0,
    ).select(
        "doc_id", "lang", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    packed = pack_sequences_greedy(
        sampled, budget=_PACK_BUDGET, tokens_col="n_tokens",
        order_col="doc_id", by="lang",
    )
    return packed.groupBy("lang", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


_SQL_TRAINING_PREP_V2 = rf"""WITH RECURSIVE keep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), kept AS (
  SELECT d.* FROM documents d JOIN keep k ON d.doc_id = k.doc_id
), m AS (
  SELECT doc_id, lang, text,
         regexp_extract_all(text, '\S+') AS tl,
         CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS DOUBLE) AS n_uniq,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM kept
), scored AS (
  SELECT *, round((CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.5 END)
       * (CASE WHEN n_punct / greatest(n_chars, 1.0) < 0.2 THEN 1.0 ELSE 0.6 END)
       * (n_uniq / greatest(n_tok, 1.0)), 6) AS q
  FROM m
), shingled AS (
  SELECT doc_id, lang, tl, q,
         CASE WHEN len(tl) < 3 THEN [array_to_string(tl, ' ')]
              ELSE list_transform(range(1, len(tl) - 1),
                                  i -> array_to_string(tl[i:i+2], ' ')) END AS sl
  FROM scored
), filt AS (
  SELECT doc_id, lang, CAST(len(tl) AS BIGINT) AS n_tokens
  FROM shingled
  WHERE q >= 0.5
    AND round(1.0 - CAST(len(list_distinct(sl)) AS DOUBLE)
              / CAST(len(sl) AS DOUBLE), 6) <= 0.2
    AND (('0x' || substr(md5('stratified|' || doc_id::VARCHAR), 1, 15))::BIGINT
         % 1000000) < CASE lang WHEN 'en' THEN 500000 ELSE 1000000 END
), o AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM filt
), s AS (
  SELECT doc_id, lang, n_tokens, rn,
         CAST(0 AS BIGINT) AS chunk_id, n_tokens AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.doc_id, o.lang, o.n_tokens, o.rn,
         CASE WHEN s.fill > 0 AND s.fill + o.n_tokens > {_PACK_BUDGET}
              THEN s.chunk_id + 1 ELSE s.chunk_id END,
         CASE WHEN s.fill > 0 AND s.fill + o.n_tokens > {_PACK_BUDGET}
              THEN o.n_tokens ELSE s.fill + o.n_tokens END
  FROM s JOIN o ON o.lang = s.lang AND o.rn = s.rn + 1
)
SELECT lang, chunk_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM s GROUP BY lang, chunk_id"""


def q_decontaminate(spark, sf_dir):
    """Test-set decontamination over the documents corpus: the eval set
    is the deterministic ``doc_id % 23 == 0`` slice; a corpus doc is
    contaminated when it shares >= 2 distinct word 4-grams with any
    eval doc.  Eval shingle hashes broadcast; corpus pass is map-only."""
    from .operators.dedup import decontaminate

    docs = read_table(spark, sf_dir, "documents")
    is_eval = F.pmod(F.col("doc_id"), F.lit(23)) == 0
    return decontaminate(
        docs.filter(~is_eval),
        docs.filter(is_eval),
        shingle_k=4,
        min_overlap=2,
        portable=True,
    )


_SQL_DECONTAMINATE = rf"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(tl) < 4 THEN [array_to_string(tl, ' ')]
       ELSE list_transform(range(1, len(tl) - 2),
                           i -> array_to_string(tl[i:i+3], ' ')) END AS sl
  FROM toks
), ex AS (
  SELECT doc_id, {_PH60.format(x="s")} AS h
  FROM (SELECT doc_id, unnest(list_distinct(sl)) AS s FROM sh)
), evs AS (
  SELECT DISTINCT h FROM ex WHERE doc_id % 23 = 0
), hits AS (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n
  FROM ex c JOIN evs USING (h) WHERE c.doc_id % 23 <> 0 GROUP BY 1
)
SELECT d.doc_id, COALESCE(h.n, 0) AS n_overlap,
       COALESCE(h.n, 0) >= 2 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 23 <> 0"""


def q_contamination_spans(spark, sf_dir):
    """Span-level decontamination over q_decontaminate's eval split:
    per corpus document, the maximal contaminated TOKEN RANGES
    (coalesced by the engine's own merge_spans on the token-ordinal
    domain) — the surgical excise-the-passage policy instead of
    drop-the-document.  Oracle replays shingling, the eval probe, and
    the island merge (gaps-and-islands SQL)."""
    from .operators.dedup import contamination_spans

    docs = read_table(spark, sf_dir, "documents")
    is_eval = F.pmod(F.col("doc_id"), F.lit(23)) == 0
    out = contamination_spans(
        docs.filter(~is_eval),
        docs.filter(is_eval),
        shingle_k=4,
        portable=True,
    )
    return out.select(
        "doc_id",
        F.col("span.start").alias("tok_start"),
        F.col("span.stop").alias("tok_stop"),
        "n_spans",
    )


def _sql_contamination_spans(k: int = 4) -> str:
    h = _PH60.format(x="s")
    return rf"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM documents
), grams0 AS (
  SELECT doc_id, len(tl) AS n,
         CASE WHEN len(tl) < {k} THEN [array_to_string(tl, ' ')]
              ELSE list_transform(
                     range(1, greatest(len(tl) - {k} + 1, 1) + 1),
                     i -> array_to_string(tl[i:i+{k - 1}], ' ')) END AS sl
  FROM toks
), grams AS (
  SELECT doc_id,
         generate_subscripts(sl, 1) - 1 AS pos,
         CASE WHEN n < {k} THEN least({k}::BIGINT, n)
              ELSE generate_subscripts(sl, 1) - 1 + {k} END AS stop,
         unnest(sl) AS s
  FROM grams0
), evs AS (
  SELECT DISTINCT {h} AS hh FROM grams WHERE doc_id % 23 = 0
), hits AS (
  SELECT DISTINCT doc_id, pos, stop
  FROM grams WHERE doc_id % 23 <> 0 AND stop > pos
    AND {h} IN (SELECT hh FROM evs)
), ordd AS (
  SELECT doc_id, pos, stop,
         max(stop) OVER (PARTITION BY doc_id ORDER BY pos, stop
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM hits
), isl AS (
  SELECT doc_id, pos, stop,
         sum(CASE WHEN prev_max IS NULL OR prev_max < pos
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos, stop) AS isl_id
  FROM ordd
)
SELECT doc_id, min(pos) AS tok_start, max(stop) AS tok_stop,
       CAST(count(*) AS BIGINT) AS n_spans
FROM isl GROUP BY doc_id, isl_id"""


def q_duplicate_spans(spark, sf_dir):
    """Corpus-INTERNAL duplicate spans over the documents table: per
    document, the maximal token ranges whose word 4-grams appear in
    >= 2 distinct documents — the self-dedup counterpart of
    q_contamination_spans (Lee et al. passage-level boilerplate
    excision).  Oracle replays shingling, the distinct-doc gram
    counts, and the island merge."""
    from .operators.dedup import duplicate_spans

    docs = read_table(spark, sf_dir, "documents")
    out = duplicate_spans(docs, shingle_k=4, min_docs=2, portable=True)
    return out.select(
        "doc_id",
        F.col("span.start").alias("tok_start"),
        F.col("span.stop").alias("tok_stop"),
        "n_spans",
        "n_docs_sharing",
    )


def _sql_duplicate_spans(k: int = 4, min_docs: int = 2) -> str:
    h = _PH60.format(x="s")
    return rf"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM documents
), grams0 AS (
  SELECT doc_id, len(tl) AS n,
         CASE WHEN len(tl) < {k} THEN [array_to_string(tl, ' ')]
              ELSE list_transform(
                     range(1, greatest(len(tl) - {k} + 1, 1) + 1),
                     i -> array_to_string(tl[i:i+{k - 1}], ' ')) END AS sl
  FROM toks
), grams AS (
  SELECT doc_id,
         generate_subscripts(sl, 1) - 1 AS pos,
         CASE WHEN n < {k} THEN least({k}::BIGINT, n)
              ELSE generate_subscripts(sl, 1) - 1 + {k} END AS stop,
         unnest(sl) AS s
  FROM grams0
), g AS (
  SELECT doc_id, pos, stop, {h} AS hh FROM grams WHERE stop > pos
), cnts AS (
  SELECT hh, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM g GROUP BY hh HAVING count(DISTINCT doc_id) >= {min_docs}
), hits AS (
  SELECT g.doc_id, g.pos, g.stop, c.n_docs
  FROM g JOIN cnts c USING (hh)
), ordd AS (
  SELECT doc_id, pos, stop, n_docs,
         max(stop) OVER (PARTITION BY doc_id ORDER BY pos, stop
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM hits
), isl AS (
  SELECT doc_id, pos, stop, n_docs,
         sum(CASE WHEN prev_max IS NULL OR prev_max < pos
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos, stop) AS isl_id
  FROM ordd
)
SELECT doc_id, min(pos) AS tok_start, max(stop) AS tok_stop,
       CAST(count(*) AS BIGINT) AS n_spans,
       max(n_docs) AS n_docs_sharing
FROM isl GROUP BY doc_id, isl_id"""


def q_incremental_duplicate_spans(spark, sf_dir):
    """Span-level self-dedup against a PERSISTED gram index — the
    ingest-time "is this passage already in the corpus?" probe:
    history (doc_id % 3 != 0) is indexed once as bucketed gram-hash
    doc counts, the increment (doc_id % 3 == 0) is gram'd, broadcast,
    and probed map-side — history never reshuffles.  A span is
    reported when its gram lives in >= 1 history document
    (min_docs=2, the new doc supplying the second copy);
    n_docs_sharing = history + 1 lines up with q_duplicate_spans'
    batch convention.  The oracle recomputes both sides' grams
    directly, verifying the index write+read round-trip against a
    pure recomputation."""
    import os

    from .operators.dedup import (
        incremental_duplicate_spans,
        write_gram_index,
    )

    docs = read_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 3 != 0)
    inc = docs.filter(F.col("doc_id") % 3 == 0)
    tbl = f"dfi_gram_idx_q_{os.getpid()}"
    write_gram_index(
        hist,
        tbl,
        n_buckets=16,
        path=_fixture_scratch(sf_dir, "gram_idx_q"),
        shingle_k=4,
        portable=True,
    )
    out = incremental_duplicate_spans(
        inc, spark.table(tbl), shingle_k=4, min_docs=2, portable=True
    )
    return out.select(
        "doc_id",
        F.col("span.start").alias("tok_start"),
        F.col("span.stop").alias("tok_stop"),
        "n_spans",
        "n_docs_sharing",
    )


def _sql_incremental_duplicate_spans(k: int = 4, min_docs: int = 2) -> str:
    h = _PH60.format(x="s")
    return rf"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM documents
), grams0 AS (
  SELECT doc_id, len(tl) AS n,
         CASE WHEN len(tl) < {k} THEN [array_to_string(tl, ' ')]
              ELSE list_transform(
                     range(1, greatest(len(tl) - {k} + 1, 1) + 1),
                     i -> array_to_string(tl[i:i+{k - 1}], ' ')) END AS sl
  FROM toks
), grams AS (
  SELECT doc_id,
         generate_subscripts(sl, 1) - 1 AS pos,
         CASE WHEN n < {k} THEN least({k}::BIGINT, n)
              ELSE generate_subscripts(sl, 1) - 1 + {k} END AS stop,
         unnest(sl) AS s
  FROM grams0
), g AS (
  SELECT doc_id, pos, stop, {h} AS hh FROM grams WHERE stop > pos
), hist AS (
  SELECT hh, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM g WHERE doc_id % 3 <> 0 GROUP BY hh
), hits AS (
  SELECT g.doc_id, g.pos, g.stop, h.n_docs + 1 AS n_docs
  FROM g JOIN hist h USING (hh)
  WHERE g.doc_id % 3 = 0 AND h.n_docs >= {min_docs - 1}
), ordd AS (
  SELECT doc_id, pos, stop, n_docs,
         max(stop) OVER (PARTITION BY doc_id ORDER BY pos, stop
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM hits
), isl AS (
  SELECT doc_id, pos, stop, n_docs,
         sum(CASE WHEN prev_max IS NULL OR prev_max < pos
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos, stop) AS isl_id
  FROM ordd
)
SELECT doc_id, min(pos) AS tok_start, max(stop) AS tok_stop,
       CAST(count(*) AS BIGINT) AS n_spans,
       max(n_docs) AS n_docs_sharing
FROM isl GROUP BY doc_id, isl_id"""


def q_excise_duplicate_spans(spark, sf_dir):
    """End-to-end span-level self-dedup: find the cross-document
    duplicated token ranges (q_duplicate_spans' exact report) and
    EXCISE them — every document survives with its boilerplate
    passages removed and the removal count exact.  The oracle replays
    the report and the excision (anti-exists on token positions +
    ordered string_agg)."""
    from .operators.dedup import duplicate_spans, excise_token_spans

    docs = read_table(spark, sf_dir, "documents")
    rep = duplicate_spans(docs, shingle_k=4, min_docs=2, portable=True)
    out = excise_token_spans(docs, rep)
    return out.select("doc_id", "text_clean", "n_tokens_removed")


def _sql_excise_duplicate_spans(k: int = 4, min_docs: int = 2) -> str:
    inner = _sql_duplicate_spans(k, min_docs)
    return rf"""WITH rep AS (
  SELECT * FROM ({inner})
), toksx AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM documents
), tokx AS (
  SELECT doc_id, unnest(tl) AS t,
         generate_subscripts(tl, 1) - 1 AS p, len(tl) AS n
  FROM toksx
), keptx AS (
  SELECT k.doc_id, k.t, k.p, k.n
  FROM tokx k
  WHERE NOT EXISTS (
    SELECT 1 FROM rep r
    WHERE r.doc_id = k.doc_id AND k.p >= r.tok_start AND k.p < r.tok_stop)
), aggx AS (
  SELECT doc_id, string_agg(t, ' ' ORDER BY p) AS text_clean,
         CAST(any_value(n) - count(*) AS BIGINT) AS n_tokens_removed
  FROM keptx GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.text_clean, '') AS text_clean,
       COALESCE(a.n_tokens_removed,
                CAST(len(regexp_extract_all(d.text, '\S+')) AS BIGINT))
         AS n_tokens_removed
FROM documents d LEFT JOIN aggx a USING (doc_id)"""


def q_bloom_decontaminate(spark, sf_dir):
    """Bloom-filter decontamination over the same eval split as
    q_decontaminate: the eval shingles are folded into a 2^16-bit bloom
    (8 KiB broadcast, constant in eval-set size) and the corpus probe
    is 4 broadcast left joins on word index — map-only, no explode, no
    per-shingle regroup.  Deterministic one-sided error: the oracle
    replays bloom construction and probe bit-for-bit, so the (rare,
    reproducible) false positives hash-match too."""
    from .operators.dedup import bloom_decontaminate
    from .sources import ensure_parallelism

    # repartition at the scan: the corpus probe reaches the operator as
    # a derived filter, past its own bare-scan parallelism guard
    docs = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    is_eval = F.pmod(F.col("doc_id"), F.lit(23)) == 0
    return bloom_decontaminate(
        docs.filter(~is_eval),
        docs.filter(is_eval),
        shingle_k=4,
        min_overlap=2,
        n_bits=1 << 16,
        n_hashes=4,
        portable=True,
    )


def q_stream_bloom_decontaminate(spark, sf_dir):
    """Batch-mode run of the STATELESS streaming decontamination twin
    (dedup.bloom_decontaminate_rowlocal via streaming alias): the eval
    bloom collapses to ONE 2 KiB array literal and every document is
    flagged by a pure row-local expression — zero joins, zero
    exchanges, zero state; runs unchanged on a streaming DataFrame.
    Shares q_bloom_decontaminate's oracle: the row-local probe is
    bit-identical to the join-shaped batch plan."""
    from .operators.dedup import bloom_decontaminate_rowlocal
    from .sources import ensure_parallelism

    docs = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    is_eval = F.pmod(F.col("doc_id"), F.lit(23)) == 0
    return bloom_decontaminate_rowlocal(
        docs.filter(~is_eval),
        docs.filter(is_eval),
        shingle_k=4,
        min_overlap=2,
        n_bits=1 << 16,
        n_hashes=4,
        portable=True,
    ).select("doc_id", "n_bloom", "contaminated")


def _sql_bloom_decon(n_bits: int, n_hashes: int) -> str:
    """DuckDB replay of q_bloom_decontaminate: same double-hashed
    positions (h1 = h mod n_bits, h2 = odd((h >> 20) mod n_bits)),
    same 32-bit word table, same all-bits-set probe."""
    idx = "[" + ", ".join(str(i) for i in range(n_hashes)) + "]"
    p_of = (
        f"((h % {n_bits}) + t.i * (((h // 1048576) % {n_bits}) * 2 + 1))"
        f" % {n_bits}"
    )
    return rf"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(tl) < 4 THEN [array_to_string(tl, ' ')]
       ELSE list_transform(range(1, len(tl) - 2),
                           i -> array_to_string(tl[i:i+3], ' ')) END AS sl
  FROM toks
), ex AS (
  SELECT doc_id, {_PH60.format(x="s")} AS h
  FROM (SELECT doc_id, unnest(list_distinct(sl)) AS s FROM sh)
), epos AS (
  SELECT {p_of} AS p
  FROM (SELECT DISTINCT h FROM ex WHERE doc_id % 23 = 0),
       (SELECT unnest({idx}) AS i) t
), words AS (
  SELECT p // 32 AS w, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS word
  FROM epos GROUP BY 1
), cprobe AS (
  SELECT doc_id, h, {p_of} AS p
  FROM (SELECT doc_id, h FROM ex WHERE doc_id % 23 <> 0),
       (SELECT unnest({idx}) AS i) t
), cbits AS (
  SELECT doc_id, h, count(*) AS nset
  FROM cprobe LEFT JOIN words ON (p // 32) = words.w
  WHERE (COALESCE(word, 0) & (1::BIGINT << CAST(p % 32 AS INT))) <> 0
  GROUP BY doc_id, h
), hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n
  FROM cbits WHERE nset = {n_hashes} GROUP BY 1
)
SELECT d.doc_id, COALESCE(hi.n, 0) AS n_bloom,
       COALESCE(hi.n, 0) >= 2 AS contaminated
FROM documents d LEFT JOIN hits hi USING (doc_id)
WHERE d.doc_id % 23 <> 0"""


_LOCF_STEP_NS = 12 * 3_600 * 1_000_000_000  # 12h grid


def q_resample_locf(spark, sf_dir):
    """Regularize the per-user event stream onto a 12h grid with
    last-observation-carried-forward; grid points before a user's first
    event stay null.  Oracle: DuckDB generate-grid + ``ASOF LEFT JOIN``."""
    from .operators.timeseries import resample_locf

    ev = read_table(spark, sf_dir, "events")
    obs = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    out = resample_locf(obs, on="ts", step=_LOCF_STEP_NS, by="user_id")
    return out.select(
        "user_id",
        F.col("ts").alias("grid_ts"),
        F.col("ts_right").alias("obs_ts"),
        F.col("value_right").alias("value"),
    )


_SQL_RESAMPLE_LOCF = f"""WITH ev AS (
  SELECT user_id, epoch_ns(ts) AS t, value FROM events
), o AS (
  SELECT user_id, t, max(value) AS value FROM ev GROUP BY 1, 2
), b AS (
  SELECT user_id, min(t) AS lo, max(t) AS hi FROM o GROUP BY 1
), g AS (
  SELECT user_id,
         unnest(range(lo - lo % {_LOCF_STEP_NS},
                      hi - hi % {_LOCF_STEP_NS} + 1,
                      {_LOCF_STEP_NS})) AS gt
  FROM b
)
SELECT g.user_id, g.gt AS grid_ts, o.t AS obs_ts, o.value AS value
FROM g ASOF LEFT JOIN o ON g.user_id = o.user_id AND g.gt >= o.t"""


_HOP_LEN_NS = 24 * 3_600 * 1_000_000_000  # 24h windows ...
_HOP_SLIDE_NS = 6 * 3_600 * 1_000_000_000  # ... hopping every 6h


#: shared hopping-window aggs: the mean comes from an EXACT fixed-point
#: bigint sum + one fixed-order double division — ``round(avg(value))``
#: would hinge on float partial-sum order, which diverges from a
#: single-pass oracle in the 6th decimal once groups are large enough.
def _hop_aggs():
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
            "__sum_fx"
        ),
    ]


def _hop_finish(df):
    return df.withColumn(
        "avg_value",
        F.round(
            F.col("__sum_fx").cast("double")
            / F.lit(1_000_000.0)
            / F.col("n_events").cast("double"),
            6,
        ),
    ).drop("__sum_fx")


def q_sliding_window_agg(spark, sf_dir):
    """Hopping-window rollup (24h windows, 6h hop — every event lands in
    4 windows) of the event stream per event_type."""
    from .operators.timeseries import sliding_window_agg

    ev = read_table(spark, sf_dir, "events")
    out = sliding_window_agg(
        ev,
        aggs=_hop_aggs(),
        on="ts",
        length=_HOP_LEN_NS,
        slide=_HOP_SLIDE_NS,
        by="event_type",
    )
    return _hop_finish(out)


_SQL_SLIDING_WINDOW = f"""WITH ev AS (
  SELECT event_type, epoch_ns(ts) AS t,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), x AS (
  SELECT event_type, t, v_fx,
         t - t % {_HOP_SLIDE_NS} - k * {_HOP_SLIDE_NS} AS w_start
  FROM ev, range(0, {_HOP_LEN_NS // _HOP_SLIDE_NS}) r(k)
)
SELECT w_start, w_start + {_HOP_LEN_NS} AS w_end, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(CAST(sum(v_fx) AS BIGINT) AS DOUBLE) / 1000000.0
             / CAST(count(*) AS DOUBLE), 6) AS avg_value
FROM x GROUP BY 1, 2, 3"""


def q_gopher_rules(spark, sf_dir):
    """Gopher-style composite quality gate: per-document rule booleans
    (token-count window, mean-word-length window, stopword floor,
    unique-token floor) and the conjunctive keep flag — the standard
    rule-based corpus filter, all codegen'd expressions."""
    from .functions.text import (
        stopword_count,
        token_count,
        unique_token_count,
    )

    docs = read_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_tok = token_count(t)
    mean_len = F.length(
        F.regexp_replace(t, r"\s+", "")
    ).cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    uniq_frac = unique_token_count(t).cast("double") / F.greatest(
        n_tok, F.lit(1)
    ).cast("double")
    r_len = (n_tok >= 30) & (n_tok <= 50_000)
    r_wordlen = (F.round(mean_len, 6) >= 2.0) & (F.round(mean_len, 6) <= 12.0)
    r_stop = stopword_count(t) >= 2
    r_uniq = F.round(uniq_frac, 6) > 0.2
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_word_len"),
        r_len.alias("r_len"),
        r_wordlen.alias("r_wordlen"),
        r_stop.alias("r_stop"),
        r_uniq.alias("r_uniq"),
        (r_len & r_wordlen & r_stop & r_uniq).alias("keep"),
    )


_STOPWORD_SQL_RE = (
    r"\b(the|a|an|and|or|of|to|in|is|are|was|for|on|with|as|at|by|it|this|that)\b"
)

_SQL_GOPHER = rf"""WITH m AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS DOUBLE)
           AS n_uniq,
         CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS n_ns,
         CAST(len(regexp_extract_all(lower(text), '{_STOPWORD_SQL_RE}'))
              AS BIGINT) AS n_stop
  FROM documents
), r AS (
  SELECT doc_id, n_tok,
         round(n_ns / greatest(CAST(n_tok AS DOUBLE), 1.0), 6) AS mean_word_len,
         (n_tok >= 30 AND n_tok <= 50000) AS r_len,
         n_stop >= 2 AS r_stop,
         round(n_uniq / greatest(CAST(n_tok AS DOUBLE), 1.0), 6) > 0.2 AS r_uniq
  FROM m
)
SELECT doc_id, n_tok AS n_tokens, mean_word_len, r_len,
       (mean_word_len >= 2.0 AND mean_word_len <= 12.0) AS r_wordlen,
       r_stop, r_uniq,
       (r_len AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
        AND r_stop AND r_uniq) AS keep
FROM r"""


def q_trailing_sum(spark, sf_dir):
    """Per-user trailing-1h running aggregate via an ANSI RANGE frame
    (``[ts - 1h, ts]`` inclusive, peers included) — the time-windowed
    running feature every event pipeline computes.  One shuffle on the
    user key, per-partition sort, no explode; fixed-point value sums so
    frame-internal order cannot perturb the result."""
    from pyspark.sql import Window as W

    hour = 3_600 * 1_000_000_000
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(-hour, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum("v_fx").over(w).alias("sum_v_fx"),
    )


_SQL_TRAILING_SUM = """WITH ev AS (
  SELECT event_id, user_id, epoch_ns(ts) AS t,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
)
SELECT event_id, user_id, t AS ts,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing,
       CAST(sum(v_fx) OVER w AS BIGINT) AS sum_v_fx
FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t
        RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)"""


_PROX_GAP_NS = 3_600 * 1_000_000_000  # 1h


def q_proximity_join(spark, sf_dir):
    """Near-miss join: every (purchase, error) event pair within 1h of
    each other — overlap joins can't express "nearby"; the proximity
    rewrite pads one side and reuses the binned equi-join strategy, so
    no cross join at any scale."""
    from .operators.interval_join import proximity_join

    ev = read_table(spark, sf_dir, "events")
    point = lambda f: make_span(F.col("ts"), F.col("ts") + F.lit(1))  # noqa: E731
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), point("ts").alias("span")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), point("ts").alias("span")
    )
    out = proximity_join(
        p, e, max_gap=_PROX_GAP_NS, validate="skip", strategy="binned"
    )
    return out.select("p_id", "e_id", "gap")


_SQL_PROXIMITY = f"""WITH p AS (
  SELECT event_id AS p_id, epoch_ns(ts) AS t FROM events
  WHERE event_type = 'purchase'
), e AS (
  SELECT event_id AS e_id, epoch_ns(ts) AS t2 FROM events
  WHERE event_type = 'error'
)
SELECT p_id, e_id,
       CAST(greatest(greatest(t - (t2 + 1), t2 - (t + 1)), 0) AS BIGINT)
         AS gap
FROM p JOIN e
  ON greatest(greatest(t - (t2 + 1), t2 - (t + 1)), 0) <= {_PROX_GAP_NS}"""


def q_source_mix(spark, sf_dir):
    """Data-mixture rebalancing toward a uniform source distribution:
    each source's keep-threshold is the pure-integer
    ``min(1e6, total·1e6 / (n_sources · count_s))`` ppm rate applied
    through the content-keyed hash filter — over-represented sources
    downsample toward the uniform share, rare sources keep everything.
    One tiny collected count table; the filter itself is narrow."""
    from .operators.sampling import mixture_sample

    docs = read_table(spark, sf_dir, "documents")
    kept = mixture_sample(
        docs, "source", "doc_id", temperature=float("inf"), salt="mix"
    )
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


def q_mixture_sample(spark, sf_dir):
    """Data-mixture rebalancing toward TUNED per-language weights
    (fr:4 de:2 es:2 en:1 zh:1 — upweight the rare languages), the
    general mixture_sample operator at temperature=1: each language's
    keep-threshold is ``min(1e6, w·N·1e6 // (W·n_lang))`` ppm through
    the content-keyed hash filter — exact integer arithmetic a SQL
    oracle replays verbatim."""
    from .operators.sampling import mixture_sample

    docs = read_table(spark, sf_dir, "documents")
    kept = mixture_sample(
        docs,
        "lang",
        "doc_id",
        weights={"en": 1, "de": 2, "es": 2, "fr": 4, "zh": 1},
        salt="mix",
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


_SQL_MIXTURE_SAMPLE = f"""WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
), w AS (
  SELECT lang, n,
         CASE lang WHEN 'fr' THEN 4 WHEN 'de' THEN 2 WHEN 'es' THEN 2
                   WHEN 'en' THEN 1 WHEN 'zh' THEN 1 ELSE 0 END AS wt
  FROM c
), t AS (
  SELECT lang, n,
         least(1000000,
               (wt * (SELECT sum(n) FROM c) * 1000000)
               // ((SELECT sum(wt) FROM w) * n)) AS thr
  FROM w
), kept AS (
  SELECT d.lang FROM documents d JOIN t USING (lang)
  WHERE ({_PH60.format(x="'mix|' || doc_id::VARCHAR")} % 1000000) < t.thr
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY lang"""


def q_stream_mixture_sample(spark, sf_dir):
    """Batch-mode run of the STREAMING mixture-sampling twin: per-lang
    keep thresholds are frozen from a batch snapshot
    (mixture_thresholds), then applied as the pure row-local hash
    filter a stateless stream runs at ingest — bit-identical to the
    batch operator on the same rows (en-heavy weights, own salt, so
    the gate is independent of q_mixture_sample)."""
    from .operators.sampling import mixture_thresholds
    from .streaming import stream_mixture_sample

    docs = read_table(spark, sf_dir, "documents")
    thr = mixture_thresholds(
        docs, "lang", weights={"en": 3, "fr": 2, "de": 1, "es": 1, "zh": 1}
    )
    kept = stream_mixture_sample(
        docs, thr, by="lang", key_col="doc_id", salt="smix"
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


_SQL_STREAM_MIXTURE_SAMPLE = f"""WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
), w AS (
  SELECT lang, n,
         CASE lang WHEN 'en' THEN 3 WHEN 'fr' THEN 2 WHEN 'de' THEN 1
                   WHEN 'es' THEN 1 WHEN 'zh' THEN 1 ELSE 0 END AS wt
  FROM c
), t AS (
  SELECT lang, n,
         least(1000000,
               (wt * (SELECT sum(n) FROM c) * 1000000)
               // ((SELECT sum(wt) FROM w) * n)) AS thr
  FROM w
), kept AS (
  SELECT d.lang FROM documents d JOIN t USING (lang)
  WHERE ({_PH60.format(x="'smix|' || doc_id::VARCHAR")} % 1000000) < t.thr
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY lang"""


_SQL_SOURCE_MIX = f"""WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source
), t AS (
  SELECT source, n,
         least(1000000,
               ((SELECT sum(n) FROM c) * 1000000)
               // ((SELECT count(*) FROM c) * n)) AS thr
  FROM c
), kept AS (
  SELECT d.source FROM documents d JOIN t USING (source)
  WHERE ({_PH60.format(x="'mix|' || doc_id::VARCHAR")} % 1000000) < t.thr
)
SELECT source, CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY source"""


def q_kmv_distinct(spark, sf_dir):
    """KMV cardinality sketch vs exact truth: per event_type, the
    k=64 minimum-values estimate of distinct users alongside the exact
    distinct count — the deterministic (portable-hash, bigint-only)
    mergeable sketch, bit-identical on any engine or partitioning."""
    from .operators.sampling import kmv_distinct

    ev = read_table(spark, sf_dir, "events")
    est = kmv_distinct(ev, "user_id", k=64, by="event_type")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_distinct_est", "n_hashes", "n_exact"
    )


_SQL_KMV = f"""WITH h AS (
  SELECT DISTINCT event_type,
         {_PH60.format(x="user_id::VARCHAR")} // 128 AS hv
  FROM events
), r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
), g AS (
  SELECT event_type, max(hv) AS hk, CAST(count(*) AS BIGINT) AS n_hashes
  FROM r WHERE rn <= 64 GROUP BY event_type
), x AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT g.event_type,
       CAST(CASE WHEN g.n_hashes < 64 THEN g.n_hashes
            ELSE (63 * {1 << 53}) // greatest(g.hk, 1) END AS BIGINT)
         AS n_distinct_est,
       g.n_hashes, x.n_exact
FROM g JOIN x USING (event_type)"""


def q_kmv_overlap_matrix(spark, sf_dir):
    """Pairwise user-overlap matrix across event types from per-group
    KMV sketches (k=32): one distinct+bottom-k pass over the data,
    then pure G²·k-row arithmetic — the dataset-mixing diagnostic, and
    the matrix generalization of q_kmv_overlap."""
    from .operators.sampling import kmv_overlap_matrix

    ev = read_table(spark, sf_dir, "events")
    return kmv_overlap_matrix(ev, "user_id", by="event_type", k=32)


def _sql_kmv_overlap_matrix(k: int = 32) -> str:
    h = _PH60.format(x="user_id::VARCHAR")
    return f"""WITH h AS (
  SELECT DISTINCT event_type AS g, {h} // 128 AS hv FROM events
), s AS (
  SELECT g, hv FROM (
    SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
    FROM h)
  WHERE rn <= {k}
), p AS (
  SELECT a.g AS ga, b.g AS gb
  FROM (SELECT DISTINCT g FROM s) a
  JOIN (SELECT DISTINCT g FROM s) b ON a.g < b.g
), u AS (
  SELECT p.ga, p.gb, s.hv,
         CASE WHEN s.g = p.ga THEN 1 ELSE 0 END AS ia,
         CASE WHEN s.g = p.gb THEN 1 ELSE 0 END AS ib
  FROM p JOIN s ON s.g = p.ga OR s.g = p.gb
), m AS (
  SELECT ga, gb, hv, max(ia) AS ina, max(ib) AS inb FROM u
  GROUP BY ga, gb, hv
), r AS (
  SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY hv) AS rn
  FROM m
), gg AS (
  SELECT ga, gb, CAST(count(*) AS BIGINT) AS n_bottom, max(hv) AS hk,
         CAST(sum(CASE WHEN ina + inb = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_both
  FROM r WHERE rn <= {k} GROUP BY ga, gb
), pre AS (
  SELECT ga AS group_a, gb AS group_b, n_bottom,
         CAST(CASE WHEN n_bottom < {k} THEN n_bottom
              ELSE {k - 1} * {1 << 53} // greatest(hk, 1) END AS BIGINT)
           AS union_est,
         CAST(n_both * 1000000 // n_bottom AS BIGINT) AS jaccard_ppm
  FROM gg
), nest AS (
  SELECT g, CAST(CASE WHEN gn < {k} THEN gn
            ELSE {k - 1} * {1 << 53} // greatest(ghk, 1) END AS BIGINT)
         AS n_est
  FROM (SELECT g, max(hv) AS ghk, CAST(count(*) AS BIGINT) AS gn
        FROM s GROUP BY g)
), pre2 AS (
  SELECT pre.*,
         CAST(union_est * jaccard_ppm // 1000000 AS BIGINT) AS intersect_est
  FROM pre)
SELECT p.group_a, p.group_b, p.n_bottom, p.union_est, p.jaccard_ppm,
       p.intersect_est, a.n_est AS n_a_est, b.n_est AS n_b_est,
       CAST(least(1000000, p.intersect_est * 1000000 // greatest(a.n_est, 1))
            AS BIGINT) AS containment_a_ppm,
       CAST(least(1000000, p.intersect_est * 1000000 // greatest(b.n_est, 1))
            AS BIGINT) AS containment_b_ppm
FROM pre2 p JOIN nest a ON a.g = p.group_a JOIN nest b ON b.g = p.group_b"""


def q_profile_documents(spark, sf_dir):
    """One-pass table profile of the documents table: per column, the
    exact row/null counts and bigint min/max/sum (integral columns)
    from ONE composite aggregate, plus the deterministic KMV distinct
    estimate (k=64, exact below 64 distinct) from one shared sketch
    pass — the ANALYZE-TABLE shape whose shuffle volume is independent
    of row count.

    ``sum_v`` is DECIMAL(38,0) inside :func:`profile_table` (bigint
    overflows on wide-domain columns); the QUERY output casts it to
    string because decimal canonicalization differs between Spark and
    DuckDB's Arrow path (``124750`` vs ``124750.0``) in cross-engine
    hashers — the value itself is exact either way."""
    from .operators.profile import profile_table

    docs = read_table(spark, sf_dir, "documents")
    prof = profile_table(docs, k=64)
    return prof.withColumn("sum_v", F.col("sum_v").cast("string"))


def _sql_profile_documents(k: int = 64) -> str:
    h = _PH60.format(x="v")
    return f"""WITH nr AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows FROM documents
), vals AS (
  SELECT 'doc_id' AS col_name, doc_id::VARCHAR AS v FROM documents
  UNION ALL SELECT 'text', text FROM documents
  UNION ALL SELECT 'lang', lang FROM documents
  UNION ALL SELECT 'source', source FROM documents
  UNION ALL SELECT 'n_chars', n_chars::VARCHAR FROM documents
), nn AS (
  SELECT col_name, CAST(count(*) - count(v) AS BIGINT) AS n_nulls
  FROM vals GROUP BY col_name
), hh AS (
  SELECT DISTINCT col_name, {h} // 128 AS hv FROM vals WHERE v IS NOT NULL
), r AS (
  SELECT col_name, hv,
         row_number() OVER (PARTITION BY col_name ORDER BY hv) AS rn
  FROM hh
), g AS (
  SELECT col_name, max(hv) AS hk, CAST(count(*) AS BIGINT) AS n_hashes
  FROM r WHERE rn <= {k} GROUP BY col_name
), mm AS (
  SELECT 'doc_id' AS col_name, min(doc_id)::BIGINT AS min_v,
         max(doc_id)::BIGINT AS max_v,
         sum(doc_id)::DECIMAL(38,0)::VARCHAR AS sum_v
  FROM documents
  UNION ALL
  SELECT 'n_chars', min(n_chars)::BIGINT, max(n_chars)::BIGINT,
         sum(n_chars)::DECIMAL(38,0)::VARCHAR
  FROM documents
), ll AS (
  SELECT 'text' AS col_name, min(length(text))::BIGINT AS len_min,
         max(length(text))::BIGINT AS len_max,
         sum(length(text))::BIGINT AS len_sum
  FROM documents
  UNION ALL
  SELECT 'lang', min(length(lang))::BIGINT, max(length(lang))::BIGINT,
         sum(length(lang))::BIGINT
  FROM documents
  UNION ALL
  SELECT 'source', min(length(source))::BIGINT, max(length(source))::BIGINT,
         sum(length(source))::BIGINT
  FROM documents
)
SELECT nn.col_name, nr.n_rows, nn.n_nulls,
       CAST(coalesce(CASE WHEN g.n_hashes < {k} THEN g.n_hashes
            ELSE ({k - 1} * {1 << 53}) // greatest(g.hk, 1) END, 0) AS BIGINT)
         AS n_distinct_est,
       mm.min_v, mm.max_v, mm.sum_v,
       NULL::DOUBLE AS min_d, NULL::DOUBLE AS max_d,
       ll.len_min, ll.len_max, ll.len_sum
FROM nn CROSS JOIN nr
LEFT JOIN g USING (col_name) LEFT JOIN mm USING (col_name)
LEFT JOIN ll USING (col_name)"""


def q_profile_events(spark, sf_dir):
    """Profile of the events table exercising the round-7 non-integral
    orderable extensions: a TIMESTAMP_NTZ column (``ts_t``) profiles
    min/max/sum in the exact epoch-µs ordinal domain and a DATE column
    (``ts_d``) in days-since-epoch (the same adapters every interval
    operator uses), while the DOUBLE column reports exact min_d/max_d
    (a min/max picks a stored element — bit-reproducible where a float
    sum is not) and its distinct sketch hashes the floor-quantized
    micro-unit bigint so both engines hash identical strings.  The
    typed time columns are derived from read_table's normalized
    epoch-ns bigint (exact: the testdata's ns values are µs·1000), so
    the fixture is robust to the driver flipping ts's physical parquet
    type between rounds.  sum_v → string for the same cross-engine
    decimal canonicalization reason as q_profile_documents."""
    from .operators.profile import profile_table

    ev = read_table(spark, sf_dir, "events")
    evp = ev.select(
        "event_id",
        F.expr("timestamp_micros(ts DIV 1000)")
        .cast("timestamp_ntz")
        .alias("ts_t"),
        F.expr("date_from_unix_date(CAST(ts DIV 86400000000000 AS INT))")
        .alias("ts_d"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    prof = profile_table(evp, k=64)
    return prof.withColumn("sum_v", F.col("sum_v").cast("string"))


def _sql_profile_events(k: int = 64) -> str:
    h = _PH60.format(x="v")
    day_ns = 86_400_000_000_000
    return f"""WITH ev AS (
  SELECT event_id, user_id, event_type, value, props,
         epoch_ns(ts) // 1000 AS us,
         epoch_ns(ts) // {day_ns} AS day
  FROM events
), nr AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows FROM ev
), vals AS (
  SELECT 'event_id' AS col_name, event_id::VARCHAR AS v FROM ev
  UNION ALL SELECT 'ts_t', us::VARCHAR FROM ev
  UNION ALL SELECT 'ts_d', day::VARCHAR FROM ev
  UNION ALL SELECT 'user_id', user_id::VARCHAR FROM ev
  UNION ALL SELECT 'event_type', event_type FROM ev
  UNION ALL SELECT 'value',
    CAST(floor(value * 1000000) AS BIGINT)::VARCHAR FROM ev
  UNION ALL SELECT 'props', props FROM ev
), nn AS (
  SELECT col_name, CAST(count(*) - count(v) AS BIGINT) AS n_nulls
  FROM vals GROUP BY col_name
), hh AS (
  SELECT DISTINCT col_name, {h} // 128 AS hv FROM vals WHERE v IS NOT NULL
), r AS (
  SELECT col_name, hv,
         row_number() OVER (PARTITION BY col_name ORDER BY hv) AS rn
  FROM hh
), g AS (
  SELECT col_name, max(hv) AS hk, CAST(count(*) AS BIGINT) AS n_hashes
  FROM r WHERE rn <= {k} GROUP BY col_name
), mm AS (
  SELECT 'event_id' AS col_name, min(event_id)::BIGINT AS min_v,
         max(event_id)::BIGINT AS max_v,
         sum(event_id)::DECIMAL(38,0)::VARCHAR AS sum_v
  FROM ev
  UNION ALL
  SELECT 'user_id', min(user_id)::BIGINT, max(user_id)::BIGINT,
         sum(user_id)::DECIMAL(38,0)::VARCHAR
  FROM ev
  UNION ALL
  SELECT 'ts_t', min(us)::BIGINT, max(us)::BIGINT,
         sum(us::DECIMAL(38,0))::DECIMAL(38,0)::VARCHAR
  FROM ev
  UNION ALL
  SELECT 'ts_d', min(day)::BIGINT, max(day)::BIGINT,
         sum(day::DECIMAL(38,0))::DECIMAL(38,0)::VARCHAR
  FROM ev
), dd AS (
  SELECT 'value' AS col_name, min(value)::DOUBLE AS min_d,
         max(value)::DOUBLE AS max_d
  FROM ev
), ll AS (
  SELECT 'event_type' AS col_name,
         min(length(event_type))::BIGINT AS len_min,
         max(length(event_type))::BIGINT AS len_max,
         sum(length(event_type))::BIGINT AS len_sum
  FROM ev
  UNION ALL
  SELECT 'props', min(length(props))::BIGINT, max(length(props))::BIGINT,
         sum(length(props))::BIGINT
  FROM ev
)
SELECT nn.col_name, nr.n_rows, nn.n_nulls,
       CAST(coalesce(CASE WHEN g.n_hashes < {k} THEN g.n_hashes
            ELSE ({k - 1} * {1 << 53}) // greatest(g.hk, 1) END, 0) AS BIGINT)
         AS n_distinct_est,
       mm.min_v, mm.max_v, mm.sum_v, dd.min_d, dd.max_d,
       ll.len_min, ll.len_max, ll.len_sum
FROM nn CROSS JOIN nr
LEFT JOIN g USING (col_name) LEFT JOIN mm USING (col_name)
LEFT JOIN dd USING (col_name) LEFT JOIN ll USING (col_name)"""


def q_compact_roundtrip(spark, sf_dir):
    """Storage-maintenance round-trip (sinks.py: compact_table): the
    documents table is deliberately fragmented (64 tiny files — the
    small-files debris incremental appends leave), compacted with a
    doc_id range-sort restoration, and the COMPACTED output is read
    back and aggregated per source — count, char sum, id range must
    equal the original table exactly, so the rewrite is verified
    lossless by the oracle.  The file-count reduction and footer range
    restoration are asserted in pytest (tests/test_sinks.py); this
    entry puts the data-fidelity half on the driver's cross-engine
    gate."""
    import shutil

    from .sources.sinks import compact_table

    docs = read_table(spark, sf_dir, "documents")
    frag = _fixture_scratch(sf_dir, "compact_frag")
    out = _fixture_scratch(sf_dir, "compact_out")
    shutil.rmtree(frag, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    compact_table(spark, frag, out, sort_cols=["doc_id"])
    comp = spark.read.parquet(out)
    return comp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def q_jsonl_roundtrip(spark, sf_dir):
    """JSONL interchange round-trip (sinks.py: write_jsonl +
    sources.read_json): the documents table goes out as line-delimited
    JSON and comes back through the schema-explicit reader; per-source
    count, char sum, id range, AND a 60-bit md5 content checksum of
    every text must equal the original parquet exactly — byte fidelity
    of the encode/decode hop is what the oracle certifies.  Checksum
    sums run in decimal(38,0) (60-bit hashes overflow int64 within
    ~16k rows) and compare as strings."""
    import shutil

    from .functions.text import portable_hash60
    from .sources import read_json
    from .sources.sinks import write_jsonl

    docs = read_table(spark, sf_dir, "documents")
    out = _fixture_scratch(sf_dir, "jsonl_out")
    shutil.rmtree(out, ignore_errors=True)
    write_jsonl(docs, out)
    back = read_json(spark, out, docs.schema)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
        F.sum(portable_hash60(F.col("text")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("text_checksum"),
    )


_SQL_JSONL_ROUNDTRIP = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_id, max(doc_id) AS max_id,
       sum(('0x' || substr(md5(text), 1, 15))::BIGINT)
         ::DECIMAL(38,0)::VARCHAR AS text_checksum
FROM documents GROUP BY source"""


_SQL_COMPACT_ROUNDTRIP = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents GROUP BY source"""


def q_register_index_update(spark, sf_dir):
    """Versioned register-index round-trip (sinks.py:
    update_register_index / read_register_index): the events table is
    split into two disjoint batches, each batch's Count-Min registers
    are merged into the on-disk index in turn (write v0, then
    read-merge-write v1 with pruning), and the read-back index must
    equal the WHOLE input's registers bit-for-bit — the mergeability
    contract that makes the sketch families incrementally
    maintainable.  The oracle recomputes the whole-input registers
    directly, so the disk round-trip, version listing, and merge are
    all on the verified path."""
    import shutil

    from .operators.sampling import cms_merge_registers, cms_registers
    from .sources.sinks import read_register_index, update_register_index

    ev = read_table(spark, sf_dir, "events")
    path = _fixture_scratch(sf_dir, "cms_reg_idx")
    shutil.rmtree(path, ignore_errors=True)  # fresh round-trip per run
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    update_register_index(
        spark,
        path,
        cms_registers(a, "user_id", width=256, depth=4),
        cms_merge_registers,
    )
    update_register_index(
        spark,
        path,
        cms_registers(b, "user_id", width=256, depth=4),
        cms_merge_registers,
    )
    idx = read_register_index(spark, path)
    return idx.select("__row", "__bkt", "__cnt")


def _sql_register_index_update(width: int = 256, depth: int = 4) -> str:
    from .operators.sampling import cms_sql_registers

    return cms_sql_registers(
        "SELECT user_id::VARCHAR AS w FROM events", "w", width, depth
    )


def q_profile_by_lang(spark, sf_dir):
    """GROUPED table profile (round 7: profile_table(by=...)): the
    documents table profiled per language — per (lang, column), exact
    row/null counts, bigint min/max/sum, string length stats, and the
    per-group KMV distinct estimate, still two bounded passes (the
    composite agg groups by lang; the sketch prunes bottom-k per
    (lang, column) before its one shuffle).  sum_v → string for the
    cross-engine decimal canonicalization reason shared by the other
    profile queries."""
    from .operators.profile import profile_table

    docs = read_table(spark, sf_dir, "documents")
    prof = profile_table(
        docs, columns=["doc_id", "n_chars", "text"], k=64, by="lang"
    )
    return prof.withColumn("sum_v", F.col("sum_v").cast("string"))


def _sql_profile_by_lang(k: int = 64) -> str:
    h = _PH60.format(x="v")
    return f"""WITH nr AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_rows FROM documents GROUP BY lang
), vals AS (
  SELECT lang, 'doc_id' AS col_name, doc_id::VARCHAR AS v FROM documents
  UNION ALL SELECT lang, 'n_chars', n_chars::VARCHAR FROM documents
  UNION ALL SELECT lang, 'text', text FROM documents
), nn AS (
  SELECT lang, col_name, CAST(count(*) - count(v) AS BIGINT) AS n_nulls
  FROM vals GROUP BY lang, col_name
), hh AS (
  SELECT DISTINCT lang, col_name, {h} // 128 AS hv
  FROM vals WHERE v IS NOT NULL
), r AS (
  SELECT lang, col_name, hv,
         row_number() OVER (PARTITION BY lang, col_name ORDER BY hv) AS rn
  FROM hh
), g AS (
  SELECT lang, col_name, max(hv) AS hk, CAST(count(*) AS BIGINT) AS n_hashes
  FROM r WHERE rn <= {k} GROUP BY lang, col_name
), mm AS (
  SELECT lang, 'doc_id' AS col_name, min(doc_id)::BIGINT AS min_v,
         max(doc_id)::BIGINT AS max_v,
         sum(doc_id)::DECIMAL(38,0)::VARCHAR AS sum_v
  FROM documents GROUP BY lang
  UNION ALL
  SELECT lang, 'n_chars', min(n_chars)::BIGINT, max(n_chars)::BIGINT,
         sum(n_chars)::DECIMAL(38,0)::VARCHAR
  FROM documents GROUP BY lang
), ll AS (
  SELECT lang, 'text' AS col_name,
         min(length(text))::BIGINT AS len_min,
         max(length(text))::BIGINT AS len_max,
         sum(length(text))::BIGINT AS len_sum
  FROM documents GROUP BY lang
)
SELECT nn.lang, nn.col_name, nr.n_rows, nn.n_nulls,
       CAST(coalesce(CASE WHEN g.n_hashes < {k} THEN g.n_hashes
            ELSE ({k - 1} * {1 << 53}) // greatest(g.hk, 1) END, 0) AS BIGINT)
         AS n_distinct_est,
       mm.min_v, mm.max_v, mm.sum_v,
       NULL::DOUBLE AS min_d, NULL::DOUBLE AS max_d,
       ll.len_min, ll.len_max, ll.len_sum
FROM nn JOIN nr USING (lang)
LEFT JOIN g USING (lang, col_name) LEFT JOIN mm USING (lang, col_name)
LEFT JOIN ll USING (lang, col_name)"""


def q_json_extract(spark, sf_dir):
    """Semi-structured ingestion: the events props JSON column parsed
    with an EXPLICIT schema (``from_json`` — JVM expression, no
    Python, no schema inference pass) and aggregated per event type —
    the normalize-at-the-edge pattern every log pipeline needs.  Null
    handling is part of the contract: unparseable/missing keys
    aggregate as nulls, counted separately."""
    ev = read_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k bigint").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k").isNull().cast("long")).alias("n_null_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_SQL_JSON_EXTRACT = """
WITH x AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) - count(k) AS BIGINT) AS n_null_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM x GROUP BY event_type"""


def q_key_skew_report(spark, sf_dir):
    """Planner-toolkit skew diagnostic: the per-key row-count
    distribution of events.user_id — p50/p90/p99 QSK quantiles of the
    counts next to the exact n_keys/max_cnt/total_rows/mean_cnt
    summary — the number that decides WHETHER a salted join or AQE
    skew split is needed and how to size n_salt (~max_cnt/p50).  One
    groupBy produces the counts; the sketch and summary reduce them
    with bounded state (operators/skew.py:71)."""
    from .operators.skew import key_skew_report

    ev = read_table(spark, sf_dir, "events")
    return key_skew_report(
        ev, "user_id", probs_ppm=(500_000, 900_000, 990_000), k=1024
    )


def _sql_key_skew_report(k: int = 1024) -> str:
    h = _PH60.format(x="('qsk|' || k)")
    return f"""WITH counts AS (
  SELECT user_id::VARCHAR AS k, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
), pri AS (
  SELECT {h} AS __pri, cnt AS __val FROM counts
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY __pri, __val) AS rn FROM pri
), samp AS (
  SELECT __val FROM ranked WHERE rn <= {k}
), ord AS (
  SELECT __val, row_number() OVER (ORDER BY __val) AS vi,
         count(*) OVER () AS n
  FROM samp
), probs AS (SELECT unnest([500000, 900000, 990000]) AS prob_ppm),
summ AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys, max(cnt) AS max_cnt,
         CAST(sum(cnt) AS BIGINT) AS total_rows,
         CAST(sum(cnt) // count(*) AS BIGINT) AS mean_cnt
  FROM counts
)
SELECT CAST(p.prob_ppm AS INT) AS prob_ppm, o.__val AS cnt_quantile,
       CAST(o.n AS BIGINT) AS n_sample,
       s.n_keys, s.max_cnt, s.total_rows, s.mean_cnt
FROM ord o JOIN probs p ON o.vi = (p.prob_ppm * (o.n - 1)) // 1000000 + 1
CROSS JOIN summ s"""


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog cardinality sketch vs exact truth: per event_type,
    the p=8 (256-register) estimate of distinct users alongside the
    exact count — deterministic cross-engine HLL (portable hash,
    integer bit-length rho, scaled-bigint harmonic sum, table-lookup
    linear counting; no runtime ln, no float accumulation), the
    bounded-state twin of q_kmv_distinct: the shuffle carries at most
    m register rows per group per task regardless of input size."""
    from .operators.sampling import hll_distinct

    ev = read_table(spark, sf_dir, "events")
    est = hll_distinct(ev, "user_id", p=8, by="event_type")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type", "hll_est", "v_zero", "n_exact"
    )


def _sql_hll(p: int = 8) -> str:
    """Bit-exact DuckDB replay of hll_distinct(events.user_id, p,
    by=event_type): same hash split, same integer rho, same scaled
    register sum, same shared double literal for the raw estimator,
    same precomputed linear-counting table."""
    from .operators.sampling import hll_params

    prm = hll_params(p)
    m, scale, c_lit, lc = prm["m"], prm["scale"], prm["c_lit"], prm["lc"]
    lc_lit = "[" + ", ".join(str(v) for v in lc) + "]"
    h = _PH60.format(x="user_id::VARCHAR") + " // 128"
    return f"""WITH h AS (
  SELECT event_type, {h} AS hv FROM events
), r AS (
  SELECT event_type, hv % {m} AS idx,
         CASE WHEN (hv // {m}) = 0 THEN {scale + 1}
              ELSE {scale + 1} - length(to_base(hv // {m}, 2)) END AS rho
  FROM h
), regs AS (
  SELECT event_type, idx, max(rho) AS rho FROM r GROUP BY event_type, idx
), g AS (
  SELECT event_type, count(*) AS present,
         CAST(sum(1::BIGINT << ({scale} - least(rho, {scale}))) AS BIGINT) AS sp
  FROM regs GROUP BY event_type
), e AS (
  SELECT event_type, ({m} - present) AS v,
         sp + ({m} - present) * (1::BIGINT << {scale}) AS s
  FROM g
), x AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(CASE WHEN v > 0 AND CAST(floor({c_lit} / s) AS BIGINT) <= {5 * m // 2}
                 THEN ({lc_lit})[v]
                 ELSE CAST(floor({c_lit} / s) AS BIGINT) END AS BIGINT) AS hll_est,
       CAST(v AS BIGINT) AS v_zero, x.n_exact
FROM e JOIN x USING (event_type)"""


def q_hll_windows(spark, sf_dir):
    """Windowed approximate-distinct (hll_distinct over the stabbing
    join — the hypertable ``approx_count_distinct per time_bucket``
    staple): per 16-window, the p=8 HLL estimate of distinct users
    alongside the exact count.  Register state stays ≤ m rows per
    window per task regardless of event volume — the sketch family's
    bounded-shuffle contract under time windowing; the oracle replays
    the stab containment and every register bit."""
    from .operators.interval_join import point_in_span_join
    from .operators.sampling import hll_distinct

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    j = point_in_span_join(
        ev, w, ts_col="ts", validate="skip", strategy="broadcast_right"
    )
    est = hll_distinct(j, "user_id", p=8, by="widx")
    exact = j.groupBy("widx").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return est.join(exact, "widx").select(
        "widx", "hll_est", "v_zero", "n_exact"
    )


def _sql_hll_windows(p: int = 8) -> str:
    """Bit-exact DuckDB replay of q_hll_windows: the stab containment
    feeds the same hash split / rho / scaled register sum / linear-
    counting table as _sql_hll, grouped by window."""
    from .operators.sampling import hll_params

    prm = hll_params(p)
    m, scale, c_lit, lc = prm["m"], prm["scale"], prm["c_lit"], prm["lc"]
    lc_lit = "[" + ", ".join(str(v) for v in lc) + "]"
    h = _PH60.format(x="user_id::VARCHAR") + " // 128"
    return f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
pts AS (
  SELECT w.widx, ev.user_id
  FROM (SELECT user_id, epoch_ns(ts) AS t FROM events) ev
  JOIN w ON w.w_start <= ev.t AND ev.t < w.w_stop
), h AS (
  SELECT widx, {h} AS hv FROM pts
), r AS (
  SELECT widx, hv % {m} AS idx,
         CASE WHEN (hv // {m}) = 0 THEN {scale + 1}
              ELSE {scale + 1} - length(to_base(hv // {m}, 2)) END AS rho
  FROM h
), regs AS (
  SELECT widx, idx, max(rho) AS rho FROM r GROUP BY widx, idx
), g AS (
  SELECT widx, count(*) AS present,
         CAST(sum(1::BIGINT << ({scale} - least(rho, {scale}))) AS BIGINT) AS sp
  FROM regs GROUP BY widx
), e AS (
  SELECT widx, ({m} - present) AS v,
         sp + ({m} - present) * (1::BIGINT << {scale}) AS s
  FROM g
), x AS (
  SELECT widx, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM pts GROUP BY widx
)
SELECT e.widx,
       CAST(CASE WHEN v > 0 AND CAST(floor({c_lit} / s) AS BIGINT) <= {5 * m // 2}
                 THEN ({lc_lit})[v]
                 ELSE CAST(floor({c_lit} / s) AS BIGINT) END AS BIGINT) AS hll_est,
       CAST(v AS BIGINT) AS v_zero, x.n_exact
FROM e JOIN x USING (widx)"""


def q_cms_word_counts(spark, sf_dir):
    """Count-Min frequency sketch vs exact truth: a 256x4 register
    table over every document token, point-queried for the exact
    top-20 words (ties broken by word) — deterministic cross-engine
    CMS (portable hash, splitmix64 pairwise rows, bigint counts), the
    frequency twin of q_hll_distinct: shuffle volume is depth*width
    register rows regardless of corpus size, estimates never
    underestimate, and the oracle replays every collision
    bit-for-bit."""
    from .functions.text import tokens
    from .operators.sampling import cms_estimate, cms_registers

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    probes = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "w")
        .limit(20)
    )
    regs = cms_registers(toks, "w", width=256, depth=4)
    return cms_estimate(regs, probes, "w", width=256, depth=4).select(
        "w", "exact_cnt", "cms_est"
    )


def _sql_cms_word_counts(width: int = 256, depth: int = 4) -> str:
    from .operators.sampling import _CMS_MOD, cms_params, cms_sql_registers

    prm = cms_params(width, depth)
    reg = cms_sql_registers("SELECT w FROM src", "w", width, depth)
    h = f"({_PH60.format(x='p.w')} % {_CMS_MOD})"
    probe_rows = " UNION ALL ".join(
        f"SELECT p.w, p.exact_cnt, {i} AS __row, "
        f"((({h}*{a} + {b}) % {_CMS_MOD}) % {width}) AS __bkt FROM probes p"
        for i, (a, b) in enumerate(prm["family"])
    )
    return rf"""WITH src AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents
), reg AS (
  {reg}
), exact AS (
  SELECT w, count(*)::BIGINT AS exact_cnt FROM src GROUP BY w
), probes AS (
  SELECT w, exact_cnt FROM exact ORDER BY exact_cnt DESC, w LIMIT 20
), pb AS (
  {probe_rows}
)
SELECT pb.w, pb.exact_cnt,
       CAST(min(coalesce(r.__cnt, 0)) AS BIGINT) AS cms_est
FROM pb LEFT JOIN reg r ON pb.__row = r.__row AND pb.__bkt = r.__bkt
GROUP BY pb.w, pb.exact_cnt"""


def q_quantile_sketch(spark, sf_dir):
    """Mergeable quantile sketch (bottom-k row sample): per language,
    a k=128 deterministic uniform row sample of document lengths
    (priority = portable hash of the doc id) queried at p10/p50/p90 as
    exact type-1 sample quantiles — the quantile member of the sketch
    family (KMV/HLL = cardinality, CMS = frequency).  Registers are
    ≤ k rows per group, merge by union + re-bottom-k, and the oracle
    replays the sample AND the index math bit-for-bit."""
    from .operators.sampling import qsk_quantiles, qsk_registers

    docs = read_table(spark, sf_dir, "documents")
    regs = qsk_registers(docs, "n_chars", "doc_id", k=128, by="lang")
    return qsk_quantiles(
        regs, [100_000, 500_000, 900_000], by="lang"
    ).select("lang", "prob_ppm", "q_val", "n_sample")


def _sql_quantile_sketch(k: int = 128) -> str:
    h = _PH60.format(x="('qsk|' || doc_id::VARCHAR)")
    return f"""WITH pri AS (
  SELECT lang, {h} AS __pri, n_chars AS __val FROM documents
  WHERE n_chars IS NOT NULL
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY __pri, __val) AS rn
  FROM pri
), samp AS (
  SELECT lang, __val FROM ranked WHERE rn <= {k}
), ord AS (
  SELECT lang, __val,
         row_number() OVER (PARTITION BY lang ORDER BY __val) AS vi,
         count(*) OVER (PARTITION BY lang) AS n
  FROM samp
), probs AS (SELECT unnest([100000, 500000, 900000]) AS prob_ppm)
SELECT o.lang, CAST(p.prob_ppm AS INT) AS prob_ppm, o.__val AS q_val,
       CAST(o.n AS BIGINT) AS n_sample
FROM ord o JOIN probs p ON o.vi = (p.prob_ppm * (o.n - 1)) // 1000000 + 1"""


def q_winsorize(spark, sf_dir):
    """Sketch-bounded outlier clipping: per event_type, values clip to
    the QSK sample's [p5, p95] (exact type-1 quantiles of the
    deterministic bottom-k row sample, broadcast back, pure row
    expression) — reported as per-type clip counts and the clipped
    fixed-point sum."""
    from .operators.sampling import winsorize

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    w = winsorize(
        ev, "v_fx", "event_id", lo_ppm=50_000, hi_ppm=950_000,
        k=128, by="event_type",
    )
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("v_fx_w") > F.col("v_fx")).cast("long")).alias(
            "n_raised"
        ),
        F.sum((F.col("v_fx_w") < F.col("v_fx")).cast("long")).alias(
            "n_lowered"
        ),
        F.sum("v_fx_w").alias("sum_clipped_fx"),
    )


def q_stream_winsorize(spark, sf_dir):
    """Batch-mode run of the STREAMING clip twin: bounds frozen from a
    batch snapshot (winsorize_bounds), applied as the pure row-local
    CASE a stateless stream runs at ingest — bit-identical to the
    batch winsorize on the same rows, so it shares q_winsorize's
    oracle."""
    from .operators.sampling import winsorize_bounds
    from .streaming import stream_winsorize

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    b = winsorize_bounds(
        ev, "v_fx", "event_id", lo_ppm=50_000, hi_ppm=950_000,
        k=128, by="event_type",
    )
    w = stream_winsorize(ev, b, "v_fx", by="event_type")
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("v_fx_w") > F.col("v_fx")).cast("long")).alias(
            "n_raised"
        ),
        F.sum((F.col("v_fx_w") < F.col("v_fx")).cast("long")).alias(
            "n_lowered"
        ),
        F.sum("v_fx_w").alias("sum_clipped_fx"),
    )


def _sql_winsorize(k: int = 128, lo: int = 50_000, hi: int = 950_000) -> str:
    h = _PH60.format(x="('qsk|' || event_id::VARCHAR)")
    return f"""WITH ev AS (
  SELECT event_id, event_type,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), pri AS (
  SELECT event_type, {h} AS __pri, v_fx AS __val FROM ev
  WHERE v_fx IS NOT NULL
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY __pri, __val) AS rn
  FROM pri
), samp AS (
  SELECT event_type, __val FROM ranked WHERE rn <= {k}
), ord AS (
  SELECT event_type, __val,
         row_number() OVER (PARTITION BY event_type ORDER BY __val) AS vi,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM samp
), b AS (
  SELECT event_type,
         min(CASE WHEN which = {lo} THEN __val END) AS lo_v,
         min(CASE WHEN which = {hi} THEN __val END) AS hi_v
  FROM ord, (SELECT unnest([{lo}, {hi}]) AS which)
  WHERE vi = (which * (n - 1)) // 1000000 + 1
  GROUP BY event_type
), w AS (
  SELECT ev.event_type, ev.v_fx,
         CASE WHEN ev.v_fx IS NULL THEN NULL
              ELSE least(greatest(ev.v_fx, b.lo_v), b.hi_v) END AS v_w
  FROM ev LEFT JOIN b USING (event_type)
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN v_w > v_fx THEN 1 ELSE 0 END) AS BIGINT)
         AS n_raised,
       CAST(sum(CASE WHEN v_w < v_fx THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lowered,
       CAST(sum(v_w) AS BIGINT) AS sum_clipped_fx
FROM w GROUP BY event_type"""


def q_cms_join_size(spark, sf_dir):
    """Join-size estimation WITHOUT running the join: the Count-Min
    inner product (Cormode & Muthukrishnan §4.2) of the click-side and
    purchase-side user-frequency sketches estimates how many rows
    clicks⋈purchases-on-user would produce, next to the exact answer —
    the planner/skew-guard primitive; the sketches are ≤ depth·width
    rows each and the data is never re-read.  Deterministic: the
    oracle replays both register tables and the min-of-inner-products
    bit-for-bit."""
    from .operators.sampling import cms_join_size, cms_registers

    ev = read_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    est = cms_join_size(
        cms_registers(a, "user_id", width=256, depth=4),
        cms_registers(b, "user_id", width=256, depth=4),
        width=256,
        depth=4,
    )
    ca = a.groupBy("user_id").agg(F.count(F.lit(1)).alias("__ca"))
    cb = b.groupBy("user_id").agg(F.count(F.lit(1)).alias("__cb"))
    exact = ca.join(cb, "user_id").agg(
        F.coalesce(F.sum(F.col("__ca") * F.col("__cb")), F.lit(0))
        .cast("long")
        .alias("exact_rows")
    )
    return est.crossJoin(exact)


def _sql_cms_join_size(width: int = 256, depth: int = 4) -> str:
    from .operators.sampling import cms_sql_registers

    ra = cms_sql_registers(
        "SELECT user_id::VARCHAR AS w FROM events WHERE event_type = 'click'",
        "w", width, depth,
    )
    rb = cms_sql_registers(
        "SELECT user_id::VARCHAR AS w FROM events WHERE event_type = 'purchase'",
        "w", width, depth,
    )
    return f"""WITH ra AS (
  {ra}
), rb AS (
  {rb}
), ip AS (
  SELECT a.__row, sum(a.__cnt * b.__cnt) AS p
  FROM ra a JOIN rb b ON a.__row = b.__row AND a.__bkt = b.__bkt
  GROUP BY a.__row
), est AS (
  SELECT CAST(CASE WHEN count(*) < {depth} THEN 0 ELSE min(p) END AS BIGINT)
    AS join_rows_est FROM ip
), ex AS (
  SELECT CAST(coalesce(sum(x.ca * y.cb), 0) AS BIGINT) AS exact_rows
  FROM (SELECT user_id, count(*) AS ca FROM events
        WHERE event_type = 'click' GROUP BY user_id) x
  JOIN (SELECT user_id, count(*) AS cb FROM events
        WHERE event_type = 'purchase' GROUP BY user_id) y USING (user_id)
)
SELECT est.join_rows_est, ex.exact_rows FROM est CROSS JOIN ex"""


def q_time_weighted_locf(spark, sf_dir):
    """LOCF time-weighted average per window (timeseries.py:
    time_weighted_avg — the TimescaleDB ``time_weight('LOCF')``
    shape): per event_type, each sample's fixed-point value holds
    until the next sample; 16 equal windows over the event-span range
    each average the held value weighted by exactly the nanoseconds it
    covered.  Products accumulate in DECIMAL(38,0) (ns durations
    overflow int64 products), floor-divided — the oracle replays the
    validity build, the clamp, the overlap join, and the HUGEINT
    weighted mean bit-for-bit."""
    from .operators.timeseries import time_weighted_avg

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = time_weighted_avg(
        ev, w, "v_fx", ts_col="ts", by="event_type", order=["event_id"]
    )
    return out.select("event_type", "widx", "covered_dur", "twa")


_SQL_TIME_WEIGHT_LOCF = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT event_type, epoch_ns(ts) AS t, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), m AS (
  SELECT *, lag(v_fx) OVER pk AS prev
  FROM ev WINDOW pk AS (PARTITION BY event_type ORDER BY t, event_id)
), runs AS (
  SELECT event_type, v_fx, t, event_id FROM m
  WHERE prev IS NULL OR prev IS DISTINCT FROM v_fx
), vi AS (
  SELECT event_type, v_fx, t AS f,
         lead(t) OVER (PARTITION BY event_type ORDER BY t, event_id) AS vt
  FROM runs
), whi AS (SELECT max(w_stop) AS hi2 FROM w),
vc AS (
  SELECT event_type, v_fx, f,
         least(coalesce(vt, hi2), hi2) AS s
  FROM vi, whi
  WHERE f < least(coalesce(vt, hi2), hi2)
), j AS (
  SELECT vc.event_type, vc.v_fx, w.widx,
         least(vc.s, w.w_stop) - greatest(vc.f, w.w_start) AS dur
  FROM vc JOIN w ON greatest(vc.f, w.w_start) < least(vc.s, w.w_stop)
)
SELECT event_type, widx,
       CAST(sum(dur) AS BIGINT) AS covered_dur,
       CAST(sum(v_fx::HUGEINT * dur) // sum(dur::HUGEINT) AS BIGINT) AS twa
FROM j GROUP BY event_type, widx"""


def q_time_weighted_linear(spark, sf_dir):
    """Linear time-weighted average per window (timeseries.py:
    time_weighted_avg(method='linear') — the TimescaleDB
    ``time_weight('Linear')`` shape): per event_type the fixed-point
    value interpolates linearly between consecutive samples (no
    extrapolation past the last one); 16 equal windows average the
    ramp by trapezoid area with the engine's truncated-interpolation
    fixed-point rule, DECIMAL(38,0) end to end.  The oracle replays
    the segment build, the overlap join, and every HUGEINT truncated
    division bit-for-bit."""
    from .operators.timeseries import time_weighted_avg

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = time_weighted_avg(
        ev, w, "v_fx", ts_col="ts", by="event_type", order=["event_id"],
        method="linear",
    )
    return out.select("event_type", "widx", "covered_dur", "twa")


_SQL_TIME_WEIGHT_LINEAR = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT event_type, epoch_ns(ts) AS t, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), sg AS (
  SELECT event_type, v_fx AS v0, t AS t0,
         lead(t) OVER pk AS t1, lead(v_fx) OVER pk AS v1
  FROM ev WINDOW pk AS (PARTITION BY event_type ORDER BY t, event_id)
), s AS (
  SELECT event_type, v0, v1 - v0 AS dv, t0, t1, t1 - t0 AS d
  FROM sg WHERE t1 IS NOT NULL AND t1 > t0
), j AS (
  SELECT s.event_type, w.widx, s.v0, s.dv, s.d,
         greatest(s.t0, w.w_start) - s.t0 AS a,
         least(s.t1, w.w_stop) - s.t0 AS b
  FROM s JOIN w ON greatest(s.t0, w.w_start) < least(s.t1, w.w_stop)
), p AS (
  SELECT event_type, widx, b - a AS dur,
         (b - a)::HUGEINT
           * ((v0 + (dv::HUGEINT * a) // d) + (v0 + (dv::HUGEINT * b) // d))
           AS num
  FROM j
)
SELECT event_type, widx,
       CAST(sum(dur) AS BIGINT) AS covered_dur,
       CAST(sum(num) // (2 * sum(dur::HUGEINT)) AS BIGINT) AS twa
FROM p GROUP BY event_type, widx"""


def q_duration_in_state(spark, sf_dir):
    """Per-window time-in-state (timeseries.py: duration_in_state —
    the hypertable ``state_agg`` aggregate, and the categorical twin
    of q_time_weighted_locf): the GLOBAL event_type stream holds each
    state LOCF-style until the next event; 16 equal windows report
    nanoseconds spent in each state.  Exercises the keyless
    (range-bucketed) validity path end-to-end under an overlap join;
    the oracle replays the global run collapse, the clamp, and every
    duration sum."""
    from .operators.timeseries import duration_in_state

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id"
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = duration_in_state(
        ev, w, "event_type", ts_col="ts", by=None, order=["event_id"]
    )
    return out.select("widx", "event_type", "dur_ns")


_SQL_DURATION_IN_STATE = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT event_type, epoch_ns(ts) AS t, event_id FROM events
), m AS (
  SELECT *, lag(event_type) OVER (ORDER BY t, event_id) AS prev FROM ev
), runs AS (
  SELECT event_type, t, event_id FROM m
  WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
), vi AS (
  SELECT event_type, t AS f,
         lead(t) OVER (ORDER BY t, event_id) AS vt
  FROM runs
), whi AS (SELECT max(w_stop) AS hi2 FROM w),
vc AS (
  SELECT event_type, f, least(coalesce(vt, hi2), hi2) AS s
  FROM vi, whi
  WHERE f < least(coalesce(vt, hi2), hi2)
), j AS (
  SELECT vc.event_type, w.widx,
         least(vc.s, w.w_stop) - greatest(vc.f, w.w_start) AS dur
  FROM vc JOIN w ON greatest(vc.f, w.w_start) < least(vc.s, w.w_stop)
)
SELECT widx, event_type, CAST(sum(dur) AS BIGINT) AS dur_ns
FROM j GROUP BY widx, event_type"""


def q_counter_total(spark, sf_dir):
    """Counter rollup with reset handling (timeseries.py:
    counter_total — the hypertable ``counter_agg``/Prometheus rate
    base): per user, the total increase of the fixed-point value
    series where any decrease is a counter reset (the new reading
    counts whole), plus reset and sample counts.  One per-key window
    pass + one partial-agged group; the oracle replays the lag
    deltas exactly."""
    from .operators.timeseries import counter_total

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    return counter_total(
        ev, "v_fx", ts_col="ts", by="user_id", order=["event_id"]
    )


_SQL_COUNTER_TOTAL = """WITH ev AS (
  SELECT user_id, epoch_ns(ts) AS t, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), d AS (
  SELECT user_id,
         v_fx - lag(v_fx) OVER pk AS delta, v_fx
  FROM ev WINDOW pk AS (PARTITION BY user_id ORDER BY t, event_id)
)
SELECT user_id,
       CAST(sum(CASE WHEN delta IS NULL THEN 0
                     WHEN delta < 0 THEN v_fx ELSE delta END) AS BIGINT)
         AS total_delta,
       CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_resets,
       CAST(count(*) AS BIGINT) AS n_samples
FROM d GROUP BY user_id"""


def q_counter_windows(spark, sf_dir):
    """Windowed counter delta + rate with reset handling
    (timeseries.py: counter_windows — the hypertable
    ``counter_agg(ts, value) → delta/rate`` over ``time_bucket``
    staple): per (user, window), the counter increase observed at
    sample instants inside the window (decreases are resets, the new
    reading counts whole), the observed duration, and the fixed-point
    per-second rate.  Window deltas partition counter_total's
    total_delta when the windows tile the series (pytest invariant).
    One per-key lag pass + one stabbing join (broadcast windows) +
    one partial-agged group; the oracle replays the lag deltas, the
    point-in-window containment, and the HUGEINT rate division."""
    from .operators.timeseries import counter_windows

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = counter_windows(
        ev, w, "v_fx", ts_col="ts", by="user_id", order=["event_id"]
    )
    return out.select(
        "user_id", "widx", "delta", "n_resets", "n_obs",
        "covered_dur", "rate_fp6",
    )


_SQL_COUNTER_WINDOWS = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT user_id, epoch_ns(ts) AS t, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), d AS (
  SELECT user_id, t, v_fx,
         v_fx - lag(v_fx) OVER pk AS delta,
         t - lag(t) OVER pk AS dur
  FROM ev WINDOW pk AS (PARTITION BY user_id ORDER BY t, event_id)
), o AS (
  SELECT user_id, t,
         CASE WHEN delta < 0 THEN v_fx ELSE delta END AS st,
         CASE WHEN delta < 0 THEN 1 ELSE 0 END AS rs, dur
  FROM d WHERE delta IS NOT NULL
)
SELECT o.user_id, w.widx,
       CAST(sum(o.st) AS BIGINT) AS delta,
       CAST(sum(o.rs) AS BIGINT) AS n_resets,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(sum(o.dur) AS BIGINT) AS covered_dur,
       CAST(sum(o.st::HUGEINT) * 1000000000000000
            // nullif(sum(o.dur::HUGEINT), 0) AS BIGINT) AS rate_fp6
FROM o JOIN w ON w.w_start <= o.t AND o.t < w.w_stop
GROUP BY o.user_id, w.widx"""


def q_gauge_windows(spark, sf_dir):
    """Windowed gauge delta/idelta/rate/irate (timeseries.py:
    gauge_windows — the TimescaleDB gauge_agg / Prometheus gauge
    family, the signed no-reset companion of q_counter_windows): per
    (user, window), the signed sum of consecutive differences observed
    in the window, the mean and instantaneous fixed-point slopes, and
    the last observation's difference.  The oracle replays the lag
    pass, the stab containment, the HUGEINT slope divisions, and the
    (t, event_id)-latest pick."""
    from .operators.timeseries import gauge_windows

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = gauge_windows(
        ev, w, "v_fx", ts_col="ts", by="user_id", order=["event_id"]
    )
    return out.select(
        "user_id", "widx", "delta", "n_obs", "covered_dur",
        "rate_fp6", "idelta", "irate_fp6",
    )


_SQL_GAUGE_WINDOWS = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT user_id, epoch_ns(ts) AS t, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), o AS (
  SELECT user_id, t, event_id,
         v_fx - lag(v_fx) OVER pk AS d,
         t - lag(t) OVER pk AS dur
  FROM ev WINDOW pk AS (PARTITION BY user_id ORDER BY t, event_id)
), j AS (
  SELECT o.user_id, o.t, o.event_id, o.d, o.dur, w.widx
  FROM o JOIN w ON w.w_start <= o.t AND o.t < w.w_stop
  WHERE o.d IS NOT NULL
), g AS (
  SELECT user_id, widx,
         CAST(sum(d) AS BIGINT) AS delta,
         CAST(count(*) AS BIGINT) AS n_obs,
         CAST(sum(dur) AS BIGINT) AS covered_dur,
         CAST(sum(d::HUGEINT) * 1000000000000000
              // nullif(sum(dur::HUGEINT), 0) AS BIGINT) AS rate_fp6
  FROM j GROUP BY user_id, widx
), l AS (
  SELECT user_id, widx, d, dur FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, widx
                                 ORDER BY t DESC, event_id DESC) AS rn
    FROM j) WHERE rn = 1
)
SELECT g.user_id, g.widx, g.delta, g.n_obs, g.covered_dur, g.rate_fp6,
       l.d AS idelta,
       CAST(l.d::HUGEINT * 1000000000000000
            // nullif(l.dur::HUGEINT, 0) AS BIGINT) AS irate_fp6
FROM g JOIN l USING (user_id, widx)"""


def q_lttb(spark, sf_dir):
    """Largest-Triangle-Three-Buckets downsample, parallel mode
    (timeseries.py: lttb_downsample — the TimescaleDB toolkit ``lttb``
    visualization decimator): per user, ~8 surviving points (endpoints
    + 6 bucket winners by largest fixed-point triangle area against
    truncated-average neighbor anchors).  Pure window + groupBy +
    max_by argmax — no sequential scan; the oracle replays the rank,
    the floor bucketing, the DECIMAL anchor truncation, every HUGEINT
    area, and the (score DESC, rank ASC) tie-break."""
    from .operators.timeseries import lttb_downsample

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    out = lttb_downsample(
        ev, 8, "v_fx", ts_col="ts", by="user_id", order=["event_id"]
    )
    return out.select("user_id", "ts", "v_fx", "bucket")


_SQL_LTTB = """WITH ev AS (
  SELECT user_id, epoch_ns(ts) AS x, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS y
  FROM events
), p AS (
  SELECT user_id, x, y,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY x, event_id) - 1 AS r,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM ev
), small AS (
  SELECT user_id, x AS ts, y AS v_fx, -1 AS bucket FROM p WHERE n <= 8
), big AS (SELECT * FROM p WHERE n > 8),
ends AS (
  SELECT user_id, x AS ts, y AS v_fx, -1 AS bucket
  FROM big WHERE r = 0 OR r = n - 1
), inter AS (
  SELECT *, ((r - 1) * 6) // (n - 2) AS b
  FROM big WHERE r BETWEEN 1 AND n - 2
), firsts AS (SELECT user_id, x AS fx, y AS fy FROM big WHERE r = 0),
lasts AS (SELECT user_id, x AS lx, y AS ly FROM big WHERE r = n - 1),
stats AS (
  SELECT user_id, b,
         CAST(sum(x::HUGEINT) // count(*) AS BIGINT) AS ax,
         CAST(CASE WHEN sum(y::HUGEINT) >= 0
                   THEN sum(y::HUGEINT) // count(*)
                   ELSE -((-sum(y::HUGEINT)) // count(*)) END
              AS BIGINT) AS ay
  FROM inter GROUP BY user_id, b
), anch AS (
  SELECT s.user_id, s.b,
         coalesce(lag(ax) OVER pk, f.fx) AS px,
         coalesce(lag(ay) OVER pk, f.fy) AS py,
         coalesce(lead(ax) OVER pk, l.lx) AS nx,
         coalesce(lead(ay) OVER pk, l.ly) AS ny
  FROM stats s JOIN firsts f USING (user_id) JOIN lasts l USING (user_id)
  WINDOW pk AS (PARTITION BY s.user_id ORDER BY s.b)
), sc AS (
  SELECT i.user_id, i.b, i.x, i.y, i.r,
         abs((a.px - a.nx)::HUGEINT * (i.y - a.py)::HUGEINT
             - (a.px - i.x)::HUGEINT * (a.ny - a.py)::HUGEINT) AS s
  FROM inter i JOIN anch a ON i.user_id = a.user_id AND i.b = a.b
), winners AS (
  SELECT user_id, x AS ts, y AS v_fx, CAST(b AS INT) AS bucket
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, b
                                     ORDER BY s DESC, r ASC) AS rn
        FROM sc)
  WHERE rn = 1
)
SELECT * FROM small UNION ALL SELECT * FROM ends
UNION ALL SELECT * FROM winners"""


def q_gapfill_locf(spark, sf_dir):
    """Gap-filled boundary snapshots (timeseries.py: gapfill_windows —
    the ``time_bucket_gapfill + locf()`` shape): EVERY (user, window)
    pair emitted — 150 users × 16 windows = dense 2400 rows at sf0.01
    — carrying the fixed-point value held at each window's start
    (latest sample at-or-before it, ties to the max event_id), NULL
    before the user's first sample.  One distinct-keys pass, one
    broadcast grid build, one as-of join; the oracle replays via a
    correlated LATERAL top-1."""
    from .operators.timeseries import gapfill_windows

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = gapfill_windows(
        ev, w, "v_fx", ts_col="ts", by="user_id", order=["event_id"]
    )
    return out.select("user_id", "widx", "w_start", "v_fx", "sample_ts")


_SQL_GAPFILL_LOCF = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
o AS (
  SELECT user_id, epoch_ns(ts) AS t, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), g AS (
  SELECT k.user_id, w.widx, w.w_start
  FROM (SELECT DISTINCT user_id FROM events) k CROSS JOIN w
)
SELECT g.user_id, g.widx, g.w_start, b.v_fx, b.t AS sample_ts
FROM g LEFT JOIN LATERAL (
  SELECT o.v_fx, o.t FROM o
  WHERE o.user_id = g.user_id AND o.t <= g.w_start
  ORDER BY o.t DESC, o.event_id DESC LIMIT 1
) b ON TRUE"""


def q_gapfill_interp(spark, sf_dir):
    """Interpolated gap-fill (timeseries.py: gapfill_windows
    method='linear' — the ``time_bucket_gapfill + interpolate()``
    shape): every (user, window) boundary value lerps exactly between
    the neighboring samples (truncated fixed-point rule), exact on a
    sample, NULL outside the observed range.  Two as-of passes; the
    oracle replays via two correlated LATERAL top-1s and the same
    HUGEINT lerp."""
    from .operators.timeseries import gapfill_windows

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = gapfill_windows(
        ev, w, "v_fx", ts_col="ts", by="user_id", order=["event_id"],
        method="linear",
    )
    return out.select(
        "user_id", "widx", "w_start", "v_fx", "prev_ts", "next_ts"
    )


_SQL_GAPFILL_INTERP = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
o AS (
  SELECT user_id, epoch_ns(ts) AS t, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), g AS (
  SELECT k.user_id, w.widx, w.w_start
  FROM (SELECT DISTINCT user_id FROM events) k CROSS JOIN w
)
SELECT g.user_id, g.widx, g.w_start,
       CASE WHEN b.t = g.w_start THEN b.v_fx
            WHEN b.t IS NOT NULL AND f.t IS NOT NULL THEN
              CAST(b.v_fx + ((f.v_fx - b.v_fx)::HUGEINT
                             * (g.w_start - b.t))
                   // nullif(f.t - b.t, 0) AS BIGINT)
       END AS v_fx,
       b.t AS prev_ts, f.t AS next_ts
FROM g
LEFT JOIN LATERAL (
  SELECT o.v_fx, o.t FROM o
  WHERE o.user_id = g.user_id AND o.t <= g.w_start
  ORDER BY o.t DESC, o.event_id DESC LIMIT 1
) b ON TRUE
LEFT JOIN LATERAL (
  SELECT o.v_fx, o.t FROM o
  WHERE o.user_id = g.user_id AND o.t >= g.w_start
  ORDER BY o.t ASC, o.event_id DESC LIMIT 1
) f ON TRUE"""


def q_topn_windows(spark, sf_dir):
    """Top-5 users per window by event count (timeseries.py:
    topn_windows — the "top keys per time_bucket" staple): stab join,
    partial-agged counts, then a WindowGroupLimit-pruned rank with the
    deterministic (count DESC, user ASC) total order.  The oracle
    replays the containment, the counts, and every tie."""
    from .operators.timeseries import topn_windows

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = topn_windows(ev, w, "user_id", 5, ts_col="ts")
    return out.select("widx", "user_id", "cnt", "rank")


_SQL_TOPN_WINDOWS = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
pts AS (
  SELECT w.widx, ev.user_id
  FROM (SELECT user_id, epoch_ns(ts) AS t FROM events) ev
  JOIN w ON w.w_start <= ev.t AND ev.t < w.w_stop
), c AS (
  SELECT widx, user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM pts GROUP BY widx, user_id
)
SELECT widx, user_id, cnt, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY widx
                               ORDER BY cnt DESC, user_id ASC) AS rank
  FROM c)
WHERE rank <= 5"""


def q_stream_ohlc_windows(spark, sf_dir):
    """The STREAMING candlestick twin in batch mode (streaming.py:
    stream_ohlc_windows — the STATELESS member of the family: OHLC
    needs no cross-row state, so streaming is just the broadcast stab
    join and the sink derives the candle; parity pytest-gated).  Batch
    inputs delegate to ohlc_windows; shares its oracle."""
    from .streaming import stream_ohlc_windows

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stream_ohlc_windows(
        ev, w, "v_fx", ts_col="ts", by="user_id",
        order_tiebreak="event_id",
    )
    return out.select(
        "user_id", "widx", "open", "high", "low", "close",
        "n_samples", "first_ts", "last_ts",
    )


def q_stream_stats2d(spark, sf_dir):
    """The STREAMING 2-D statistics twin in batch mode (streaming.py:
    stream_stats2d_windows — stateless like the candlestick twin:
    every sample is its own moment increment, the sink's DECIMAL sums
    just add per micro-batch; parity pytest-gated).  Batch inputs
    delegate to stats2d_windows; shares its oracle."""
    from .streaming import stream_stats2d_windows

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("x_fx"),
        F.expr(
            "CAST(round(value * 1000000) AS BIGINT) DIV 3"
            " + (event_id % 97) * 1000"
        ).alias("y_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stream_stats2d_windows(
        ev, w, "x_fx", "y_fx", ts_col="ts", by="user_id"
    )
    return out.select(
        "user_id", "widx", "n", "sum_x", "sum_y",
        "sum_xx", "sum_xy", "sum_yy",
    )


def q_stream_hll_windows(spark, sf_dir):
    """The STREAMING windowed-HLL twin in batch mode (streaming.py:
    stream_hll_windows — the register-merge maintenance pattern: the
    stream emits row-local (widx, __idx, __rho) register coordinates
    in append mode, the sink re-maxes registers per micro-batch;
    file-stream parity pytest-gated).  Batch inputs delegate to the
    stab + hll_distinct composition; the oracle projects the batch
    windowed-HLL replay."""
    from .streaming import stream_hll_windows

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stream_hll_windows(ev, w, "user_id", p=8, ts_col="ts")
    return out.select("widx", "hll_est", "v_zero")


def _sql_stream_hll_windows() -> str:
    return (
        "SELECT widx, hll_est, v_zero FROM (\n"
        + _sql_hll_windows(8)
        + "\n) __hllw"
    )


def q_stream_topn_windows(spark, sf_dir):
    """The STREAMING top-N twin in batch mode (streaming.py:
    stream_topn_windows — counts are the mergeable sink state, the
    rank derives at read time over O(windows · keys) rows; file-stream
    parity pytest-gated).  Batch inputs delegate to topn_windows;
    shares its oracle."""
    from .streaming import stream_topn_windows

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stream_topn_windows(ev, w, "user_id", 5, ts_col="ts")
    return out.select("widx", "user_id", "cnt", "rank")


def q_stream_heartbeat_windows(spark, sf_dir):
    """The STREAMING heartbeat-uptime twin in batch mode (streaming.py:
    stream_heartbeat_windows — finalized islands from the stateful
    stream merge, stream-static broadcast overlap join, sink-side
    sums; file-stream parity pytest-gated).  Batch inputs delegate to
    heartbeat_windows; shares its oracle."""
    from .streaming import stream_heartbeat_windows

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stream_heartbeat_windows(
        ev, w, _HB_LIVE_NS, ts_col="ts", by="user_id"
    )
    return out.select("user_id", "widx", "live_ns", "n_islands")


def q_masked_twa(spark, sf_dir):
    """Artifact-masked time-weighted average — the biosignal flagship
    COMPOSITION (the reference's home domain: average a signal per
    window EXCLUDING artifact blackouts): 2-minute masks anchored at
    every 17th event subtract from the 16 windows via span_difference
    (fragments keep their widx labels), and time_weighted_avg runs
    unchanged over the fragment set — same-label fragments aggregate
    back together, so the result IS the masked TWA.  (2 minutes, not
    the original 30: the events tables share a fixed 720 h range at
    every SF while mask COUNT scales with rows, so 30-min masks merge
    into total coverage at sf0.1 and the bench would measure an empty
    result; 120 s keeps coverage at 0.3 %/2.7 %/27 % across
    sf0.001/0.01/0.1 — non-degenerate everywhere.)  clamp_at pins
    the open-run horizon to the ORIGINAL windows' max stop (a tail
    mask would otherwise shift the fragment max).  The fragment set is
    eagerly localCheckpoint'ed: it derives from a scan+join pipeline
    that every downstream reference (horizon agg, join-strategy
    probes) would otherwise replay — the round-10 plan carried 11
    Window passes for exactly this reason; materialized, the executed
    plan holds 3.  The windows table itself needs no checkpoint since
    _es_windows computes its bounds driver-side (round 11) — it is a
    pure ``spark.range(16)`` projection.
    The oracle replays it by inclusion-exclusion over merged mask
    islands: |run∩w\\M| = |run∩w| − Σ_i |run∩w∩island_i|, exact
    HUGEINT end to end."""
    from .functions.spans import make_span
    from .operators.coalesce import span_difference
    from .operators.timeseries import time_weighted_avg

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    # w is a pure spark.range(16) projection since _es_windows derives
    # its bounds driver-side — nothing to checkpoint (the round-10
    # eager materialization predates that change)
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    masks = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 17 == 0)
        .select(
            make_span(
                F.col("ts"), F.col("ts") + F.lit(120_000_000_000)
            ).alias("span")
        )
    )
    # LAZY checkpoint (round 12): the very next driver action is the
    # auto-join's dimension-side count probe on this table, so eager
    # materialization is one redundant scheduler round-trip — the probe
    # materializes the checkpoint and every later reference reads it
    frags = span_difference(w, masks).localCheckpoint(eager=False)
    horizon = w.agg(F.max("span.stop"))
    out = time_weighted_avg(
        ev, frags, "v_fx", ts_col="ts", by="event_type",
        order=["event_id"], clamp_at=horizon,
    )
    return out.select("event_type", "widx", "covered_dur", "twa")


def _sql_masked_twa(closed_runs: bool = False) -> str:
    """Masked-TWA replay by inclusion-exclusion over merged mask
    islands.  ``closed_runs=False``: the batch contract (open runs
    clamp to the windows' max stop).  ``closed_runs=True``: the
    streaming-twin contract (the open run never emits — what
    stream_time_weighted's closed-runs composition computes)."""
    vc = (
        """vc AS (
  SELECT event_type, v_fx, f, vt AS s
  FROM vi WHERE vt IS NOT NULL AND f < vt
), mk AS ("""
        if closed_runs
        else """whi AS (SELECT max(w_stop) AS hi2 FROM w),
vc AS (
  SELECT event_type, v_fx, f,
         least(coalesce(vt, hi2), hi2) AS s
  FROM vi, whi
  WHERE f < least(coalesce(vt, hi2), hi2)
), mk AS ("""
    )
    return f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT event_type, epoch_ns(ts) AS t, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), m AS (
  SELECT *, lag(v_fx) OVER pk AS prev
  FROM ev WINDOW pk AS (PARTITION BY event_type ORDER BY t, event_id)
), runs AS (
  SELECT event_type, v_fx, t, event_id FROM m
  WHERE prev IS NULL OR prev IS DISTINCT FROM v_fx
), vi AS (
  SELECT event_type, v_fx, t AS f,
         lead(t) OVER (PARTITION BY event_type ORDER BY t, event_id) AS vt
  FROM runs
), {vc}
  SELECT epoch_ns(ts) AS t FROM events WHERE event_id % 17 = 0
), mi AS (
  SELECT min(t) AS mf, max(t + 120000000000) AS me FROM (
    SELECT t, sum(brk) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS isl
    FROM (
      SELECT t, CASE WHEN pmax IS NULL OR t > pmax THEN 1 ELSE 0 END AS brk
      FROM (
        SELECT t, max(t + 120000000000)
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS pmax
        FROM mk) p1) p2) p3
  GROUP BY isl
), base AS (
  SELECT vc.event_type, w.widx,
         sum(v_fx::HUGEINT
             * (least(vc.s, w.w_stop) - greatest(vc.f, w.w_start))) AS vnum,
         sum((least(vc.s, w.w_stop) - greatest(vc.f, w.w_start))::HUGEINT)
           AS den
  FROM vc JOIN w ON greatest(vc.f, w.w_start) < least(vc.s, w.w_stop)
  GROUP BY vc.event_type, w.widx
), sub AS (
  SELECT vc.event_type, w.widx,
         sum(v_fx::HUGEINT
             * (least(vc.s, w.w_stop, mi.me)
                - greatest(vc.f, w.w_start, mi.mf))) AS vnum,
         sum((least(vc.s, w.w_stop, mi.me)
              - greatest(vc.f, w.w_start, mi.mf))::HUGEINT) AS den
  FROM vc
  JOIN w ON greatest(vc.f, w.w_start) < least(vc.s, w.w_stop)
  JOIN mi ON greatest(vc.f, w.w_start, mi.mf)
             < least(vc.s, w.w_stop, mi.me)
  GROUP BY vc.event_type, w.widx
)
SELECT b.event_type, b.widx,
       CAST(b.den - coalesce(s.den, 0) AS BIGINT) AS covered_dur,
       CAST((b.vnum - coalesce(s.vnum, 0))
            // (b.den - coalesce(s.den, 0)) AS BIGINT) AS twa
FROM base b LEFT JOIN sub s
  ON b.event_type = s.event_type AND b.widx = s.widx
WHERE b.den - coalesce(s.den, 0) > 0"""


_SQL_MASKED_TWA = _sql_masked_twa(closed_runs=False)


def q_stream_masked_twa(spark, sf_dir):
    """The STREAMING artifact-masked TWA twin in batch mode — the
    flagship composition composes unchanged with the streaming layer:
    the mask-fragment table is STATIC (derived batch-side, eagerly
    materialized exactly as in q_masked_twa), and
    stream_time_weighted runs over it — closed value runs emit
    per-(run ∩ fragment) increments through the broadcast overlap
    join; the sink derives Σ(v·dur) DIV Σdur.  Same-label fragments
    aggregate back together, so the sink result IS the masked TWA
    (open runs never emit — the family's documented batch/stream
    divergence; the oracle replays inclusion-exclusion over merged
    mask islands with the open tail DROPPED).  Stream-path parity is
    covered by stream_duration_in_state's file-stream tests — this
    operator is that composition with fragments as the windows."""
    from .functions.spans import make_span
    from .operators.coalesce import span_difference
    from .streaming import stream_time_weighted

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")  # range(16) projection
    masks = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 17 == 0)
        .select(
            make_span(
                F.col("ts"), F.col("ts") + F.lit(120_000_000_000)
            ).alias("span")
        )
    )
    # lazy for the same probe-materializes-it reason as q_masked_twa
    frags = span_difference(w, masks).localCheckpoint(eager=False)
    out = stream_time_weighted(
        ev, frags, "v_fx", ts_col="ts", by="event_type",
        order_tiebreak="event_id",
    )
    return out.select("event_type", "widx", "covered_dur", "twa")


def q_stats2d_windows(spark, sf_dir):
    """2-D statistical rollup per window (timeseries.py:
    stats2d_windows — the hypertable ``stats_agg(x, y)`` shape): per
    (user, window), EXACT DECIMAL(38,0) moment sums (n, Σx, Σy, Σx²,
    Σxy, Σy²) of the contained sample pairs, strings both sides (the
    cross-engine DECIMAL canonicalization rule).  x is the fixed-point
    value; y a deterministic integer-exact second signal.  The float
    corr/slope derivations (corr_from_stats2d) are pytest-checked
    against numpy; the gate hashes the exact sums."""
    from .operators.timeseries import stats2d_windows

    v_fx = F.round(F.col("value") * 1_000_000).cast("long")
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        v_fx.alias("x_fx"),
        F.expr(
            "CAST(round(value * 1000000) AS BIGINT) DIV 3"
            " + (event_id % 97) * 1000"
        ).alias("y_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stats2d_windows(
        ev, w, "x_fx", "y_fx", ts_col="ts", by="user_id",
        order=["event_id"],
    )
    return out.select(
        "user_id", "widx", "n", "sum_x", "sum_y",
        "sum_xx", "sum_xy", "sum_yy",
    )


_SQL_STATS2D_WINDOWS = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT user_id, epoch_ns(ts) AS t,
         CAST(round(value * 1000000) AS BIGINT) AS x,
         CAST(round(value * 1000000) AS BIGINT) // 3
           + (event_id % 97) * 1000 AS y
  FROM events
), j AS (
  SELECT ev.user_id, ev.x, ev.y, w.widx
  FROM ev JOIN w ON w.w_start <= ev.t AND ev.t < w.w_stop
)
SELECT user_id, widx, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x::HUGEINT) AS VARCHAR) AS sum_x,
       CAST(sum(y::HUGEINT) AS VARCHAR) AS sum_y,
       CAST(sum(x::HUGEINT * x) AS VARCHAR) AS sum_xx,
       CAST(sum(x::HUGEINT * y) AS VARCHAR) AS sum_xy,
       CAST(sum(y::HUGEINT * y) AS VARCHAR) AS sum_yy
FROM j GROUP BY user_id, widx"""


def q_stream_gauge_windows(spark, sf_dir):
    """The STREAMING windowed gauge twin in batch mode (streaming.py:
    stream_gauge_windows — the signed no-reset sibling of
    q_stream_counter_windows, same prev-sample state + static stab
    join): batch inputs delegate to gauge_windows; streaming
    increments sum to it exactly (file-stream parity pytest-gated).
    Shares the gauge_windows oracle."""
    from .streaming import stream_gauge_windows

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stream_gauge_windows(
        ev, w, "v_fx", ts_col="ts", by="user_id",
        order_tiebreak="event_id",
    )
    return out.select(
        "user_id", "widx", "delta", "n_obs", "covered_dur",
        "rate_fp6", "idelta", "irate_fp6",
    )


def q_stream_time_weighted(spark, sf_dir):
    """The STREAMING LOCF time-weight twin in batch mode
    (streaming.py: stream_time_weighted — stream_duration_in_state
    with the VALUE as the state, the weighted sink derivation on
    top): per event_type, closed value runs only (the open run never
    emits on an unbounded stream; batch time_weighted_avg clamps it —
    the documented divergence), 16 windows, DECIMAL-exact weighted
    means.  The oracle replays the run collapse with the open tail
    DROPPED and the HUGEINT weighted mean."""
    from .streaming import stream_time_weighted

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stream_time_weighted(
        ev, w, "v_fx", ts_col="ts", by="event_type",
        order_tiebreak="event_id",
    )
    return out.select("event_type", "widx", "covered_dur", "twa")


_SQL_STREAM_TIME_WEIGHTED = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT event_type, epoch_ns(ts) AS t, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), m AS (
  SELECT *, lag(v_fx) OVER pk AS prev
  FROM ev WINDOW pk AS (PARTITION BY event_type ORDER BY t, event_id)
), runs AS (
  SELECT event_type, v_fx, t, event_id FROM m
  WHERE prev IS NULL OR prev IS DISTINCT FROM v_fx
), vi AS (
  SELECT event_type, v_fx, t AS f,
         lead(t) OVER (PARTITION BY event_type ORDER BY t, event_id) AS vt
  FROM runs
), vc AS (
  SELECT event_type, v_fx, f, vt AS s FROM vi
  WHERE vt IS NOT NULL AND f < vt
), j AS (
  SELECT vc.event_type, vc.v_fx, w.widx,
         least(vc.s, w.w_stop) - greatest(vc.f, w.w_start) AS dur
  FROM vc JOIN w ON greatest(vc.f, w.w_start) < least(vc.s, w.w_stop)
)
SELECT event_type, widx,
       CAST(sum(dur) AS BIGINT) AS covered_dur,
       CAST(sum(v_fx::HUGEINT * dur) // sum(dur::HUGEINT) AS BIGINT) AS twa
FROM j GROUP BY event_type, widx"""


def q_ohlc_windows(spark, sf_dir):
    """Candlestick / M4-downsampling rollup (timeseries.py:
    ohlc_windows — the hypertable ``candlestick_agg`` shape): per
    (user, window), open/close by (ts, event_id) order plus high/low
    over the raw fixed-point samples stabbed into 16 windows — one
    broadcast stab join + one partial-agged group, no per-key sort.
    The oracle replays the containment and the first/last picks via
    row_number."""
    from .operators.timeseries import ohlc_windows

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = ohlc_windows(
        ev, w, "v_fx", ts_col="ts", by="user_id", order=["event_id"]
    )
    return out.select(
        "user_id", "widx", "open", "high", "low", "close",
        "n_samples", "first_ts", "last_ts",
    )


_SQL_OHLC_WINDOWS = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT user_id, epoch_ns(ts) AS t, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), j AS (
  SELECT ev.user_id, ev.t, ev.event_id, ev.v_fx, w.widx
  FROM ev JOIN w ON w.w_start <= ev.t AND ev.t < w.w_stop
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, widx
                            ORDER BY t, event_id) AS rna,
         row_number() OVER (PARTITION BY user_id, widx
                            ORDER BY t DESC, event_id DESC) AS rnd
  FROM j
)
SELECT user_id, widx,
       max(CASE WHEN rna = 1 THEN v_fx END) AS open,
       max(v_fx) AS high, min(v_fx) AS low,
       max(CASE WHEN rnd = 1 THEN v_fx END) AS close,
       CAST(count(*) AS BIGINT) AS n_samples,
       min(t) AS first_ts, max(t) AS last_ts
FROM r GROUP BY user_id, widx"""


_HB_LIVE_NS = 21_600_000_000_000  # 6h liveness per heartbeat


def q_heartbeat_windows(spark, sf_dir):
    """Heartbeat uptime per window (timeseries.py: heartbeat_windows —
    the hypertable ``heartbeat_agg``/uptime shape): every event is a
    liveness assertion [t, t+6h) for its user; merged live islands
    clamp into 16 windows and sum to exact ns alive.  One island
    shuffle + one broadcast overlap join; the oracle replays the
    running-max island detection and every clamped duration."""
    from .operators.timeseries import heartbeat_windows

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts")
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = heartbeat_windows(
        ev, w, _HB_LIVE_NS, ts_col="ts", by="user_id"
    )
    return out.select("user_id", "widx", "live_ns", "n_islands")


_SQL_HEARTBEAT_WINDOWS = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
hb AS (
  SELECT user_id, epoch_ns(ts) AS t,
         epoch_ns(ts) + {_HB_LIVE_NS} AS e
  FROM events
), m AS (
  SELECT user_id, t, e,
         max(e) OVER (PARTITION BY user_id ORDER BY t, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS pmax
  FROM hb
), g AS (
  SELECT user_id, t, e,
         sum(CASE WHEN pmax IS NULL OR t > pmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY t, e
                 ROWS UNBOUNDED PRECEDING) AS isl
  FROM m
), isls AS (
  SELECT user_id, min(t) AS f, max(e) AS s
  FROM g GROUP BY user_id, isl
), j AS (
  SELECT isls.user_id, w.widx,
         least(s, w.w_stop) - greatest(f, w.w_start) AS dur
  FROM isls JOIN w ON greatest(f, w.w_start) < least(s, w.w_stop)
)
SELECT user_id, widx, CAST(sum(dur) AS BIGINT) AS live_ns,
       CAST(count(*) AS BIGINT) AS n_islands
FROM j GROUP BY user_id, widx"""


def q_stream_duration_in_state(spark, sf_dir):
    """The STREAMING time-in-state twin in batch mode (streaming.py:
    stream_duration_in_state — stream_validity_intervals composed with
    the stateless stream-static broadcast interval join): per-user
    CLOSED state runs only (the open run never emits on an unbounded
    stream; batch duration_in_state instead clamps it — the one
    documented divergence), 16 windows, exact ns sums.  The file-
    stream micro-batch parity vs this same composition is pytest-
    gated; the oracle replays the per-user run collapse with the open
    tail DROPPED."""
    from .streaming import stream_duration_in_state

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stream_duration_in_state(
        ev, w, "event_type", ts_col="ts", by="user_id",
        order_tiebreak="event_id",
    )
    return out.select("user_id", "widx", "event_type", "dur_ns")


_SQL_STREAM_DURATION_IN_STATE = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT user_id, event_type, epoch_ns(ts) AS t, event_id FROM events
), m AS (
  SELECT *, lag(event_type) OVER pk AS prev
  FROM ev WINDOW pk AS (PARTITION BY user_id ORDER BY t, event_id)
), runs AS (
  SELECT user_id, event_type, t, event_id FROM m
  WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
), vi AS (
  SELECT user_id, event_type, t AS f,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS vt
  FROM runs
), vc AS (
  SELECT user_id, event_type, f, vt AS s FROM vi
  WHERE vt IS NOT NULL AND f < vt
), j AS (
  SELECT vc.user_id, vc.event_type, w.widx,
         least(vc.s, w.w_stop) - greatest(vc.f, w.w_start) AS dur
  FROM vc JOIN w ON greatest(vc.f, w.w_start) < least(vc.s, w.w_stop)
)
SELECT user_id, widx, event_type, CAST(sum(dur) AS BIGINT) AS dur_ns
FROM j GROUP BY user_id, widx, event_type"""


def q_stream_counter_windows(spark, sf_dir):
    """The STREAMING windowed counter twin in batch mode (streaming.py:
    stream_counter_windows — a tiny prev-sample state emits
    observations that stab the static windows): batch inputs delegate
    to counter_windows, whose observation-instant attribution makes
    streaming increments sum to the batch rollup EXACTLY (file-stream
    parity pytest-gated).  Shares the counter_windows oracle."""
    from .streaming import stream_counter_windows

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stream_counter_windows(
        ev, w, "v_fx", ts_col="ts", by="user_id",
        order_tiebreak="event_id",
    )
    return out.select(
        "user_id", "widx", "delta", "n_resets", "n_obs",
        "covered_dur", "rate_fp6",
    )


def q_scd2_intervals(spark, sf_dir):
    """SCD2 temporal-table build: collapse each user's event_type
    change stream into validity intervals [valid_from, valid_to) with
    the current run open (null valid_to) — one shuffle, two window
    passes over one per-key sort."""
    from .operators.timeseries import validity_intervals

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return validity_intervals(
        ev, attrs=["event_type"], on="ts", by="user_id", order=["event_id"]
    )


_SQL_SCD2 = """WITH ev AS (
  SELECT user_id, event_type, epoch_ns(ts) AS t, event_id FROM events
), m AS (
  SELECT *, lag(event_type) OVER w AS prev
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), runs AS (
  SELECT user_id, event_type, t, event_id FROM m
  WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type, t AS valid_from,
       lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to
FROM runs"""


def q_validity_intervals_global(spark, sf_dir):
    """KEYLESS SCD2: collapse the single global event_type change
    stream (all users interleaved, ordered by (ts, event_id)) into
    validity intervals — exercises the bucketed keyless path
    (operators/timeseries.py::_validity_intervals_global): range-bucket
    by time, per-bucket lag/lead, O(buckets) boundary repair, NO
    single-partition window."""
    from .operators.timeseries import validity_intervals

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id"
    )
    return validity_intervals(
        ev, attrs=["event_type"], on="ts", by=None, order=["event_id"]
    )


_SQL_VALIDITY_GLOBAL = """WITH ev AS (
  SELECT event_type, epoch_ns(ts) AS t, event_id FROM events
), m AS (
  SELECT *, lag(event_type) OVER (ORDER BY t, event_id) AS prev FROM ev
), runs AS (
  SELECT event_type, t, event_id FROM m
  WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
)
SELECT event_type, t AS valid_from,
       lead(t) OVER (ORDER BY t, event_id) AS valid_to
FROM runs"""


_SNAPSHOT_T_NS = 1_705_276_800_000_000_000  # 2024-01-15T00:00Z


def q_snapshot_at(spark, sf_dir):
    """Temporal snapshot: each user's state (current event_type run) AS
    OF a fixed instant — the SCD2 table filtered to the validity
    interval containing T (open current rows match any later T)."""
    from .operators.timeseries import validity_intervals

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    scd = validity_intervals(
        ev, attrs=["event_type"], on="ts", by="user_id", order=["event_id"]
    )
    t = F.lit(_SNAPSHOT_T_NS)
    return scd.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (t < F.col("valid_to")))
    ).select("user_id", "event_type", "valid_from")


_SQL_SNAPSHOT = f"""WITH ev AS (
  SELECT user_id, event_type, epoch_ns(ts) AS t, event_id FROM events
), m AS (
  SELECT *, lag(event_type) OVER w AS prev
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), runs AS (
  SELECT user_id, event_type, t, event_id FROM m
  WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
), scd AS (
  SELECT user_id, event_type, t AS valid_from,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to
  FROM runs
)
SELECT user_id, event_type, valid_from FROM scd
WHERE valid_from <= {_SNAPSHOT_T_NS}
  AND (valid_to IS NULL OR {_SNAPSHOT_T_NS} < valid_to)"""


def q_dominant_label(spark, sf_dir):
    """Overlap-weighted label transfer: each 8-ile window takes the
    event_type with the largest total overlap duration (exact bigint
    ns sums; ties to the lexicographically first type) — the standard
    annotate-windows-from-events shape."""
    from pyspark.sql import Window as W

    es, w = _es_windows(spark, sf_dir, 8, "idx")
    j = interval_join(es, w, validate="skip", strategy="broadcast_right")
    dur = (
        j.select(
            "idx",
            "event_type",
            (F.col("span.stop") - F.col("span.start")).alias("d"),
        )
        .groupBy("idx", "event_type")
        .agg(F.sum("d").alias("overlap_ns"))
    )
    ww = W.partitionBy("idx").orderBy(
        F.col("overlap_ns").desc(), F.col("event_type")
    )
    return (
        dur.withColumn("rn", F.row_number().over(ww))
        .filter(F.col("rn") == 1)
        .select("idx", "event_type", "overlap_ns")
    )


_SQL_DOMINANT = f"""WITH {_ES_CTE}, {_w_cte(8, "idx")},
d AS (
  SELECT w.idx, es.event_type,
         CAST(sum(least(es.e, w.w_stop) - greatest(es.s, w.w_start))
              AS BIGINT) AS overlap_ns
  FROM es JOIN w ON {_OVERLAP_SQL}
  GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (PARTITION BY idx
            ORDER BY overlap_ns DESC, event_type) AS rn
  FROM d
)
SELECT idx, event_type, overlap_ns FROM r WHERE rn = 1"""


def q_interval_join_iou(spark, sf_dir):
    """Overlap join filtered by overlap QUALITY: keep only (span,
    window) pairs whose IoU >= 0.2 — the composable
    join-then-similarity-threshold shape (event mostly inside the
    window, not merely touching it)."""
    from .functions.spans import span_iou

    es, w = _es_windows(spark, sf_dir, 8, "idx")
    j = interval_join(es, w, validate="skip", strategy="broadcast_right")
    return (
        j.select(
            "event_id",
            "idx",
            span_iou(F.col("span_left"), F.col("span_right")).alias("iou"),
        )
        .filter(F.col("iou") >= 0.2)
    )


_SQL_JOIN_IOU = f"""WITH {_ES_CTE}, {_w_cte(8, "idx")},
p AS (
  SELECT es.event_id, w.idx,
         greatest(least(es.e, w.w_stop) - greatest(es.s, w.w_start), 0)
           AS inter,
         (es.e - es.s) + (w.w_stop - w.w_start) AS lens
  FROM es JOIN w ON {_OVERLAP_SQL.replace("w.quarter", "w.idx")}
)
SELECT event_id, idx,
       round(CAST(inter AS DOUBLE) / CAST(lens - inter AS DOUBLE), 6) AS iou
FROM p
WHERE round(CAST(inter AS DOUBLE) / CAST(lens - inter AS DOUBLE), 6) >= 0.2"""


def q_mean_token_rank(spark, sf_dir):
    """Commonness score: per document, the mean frequency rank of its
    tokens against the corpus vocabulary (rank 0 = most frequent) — an
    integer-exact proxy for unigram perplexity (rare-word-heavy docs
    score high).  Sum of bigint ranks per doc, one fixed-order double
    division at the end.

    Scale shape: ranks come from the distributed prefix-offset rank
    (operators/ranking.py — no single-partition window), and the
    token→vocab join is a plain equi-join (NOT a broadcast hint: the
    web-scale vocabulary is itself huge; AQE still broadcasts it when
    it measures small)."""
    from .functions.text import tokens
    from .operators.ranking import frequency_rank

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = frequency_rank(
        tf, count_col="cnt", tie_col="term", rank_col="rank"
    ).select("term", "rank")
    return (
        toks.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("rank").alias("rank_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("rank_sum").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("mean_rank"),
        )
    )


_SQL_MEAN_TOKEN_RANK = r"""WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
), tf AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
vocab AS (
  SELECT term,
         CAST(row_number() OVER (ORDER BY cnt DESC, term) - 1 AS BIGINT)
           AS rank
  FROM tf
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(CAST(sum(rank) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS mean_rank
FROM toks JOIN vocab USING (term)
GROUP BY doc_id"""


def q_label_centroids(spark, sf_dir):
    """Embedding-space label classification: per-label mean centroid
    from EXACT fixed-point per-dimension sums, every vector assigned to
    its nearest centroid by cosine (deterministic tie-break on label),
    reported as the (true label, predicted label) confusion counts.
    The centroid table is tiny — broadcast; the corpus-side pass is one
    narrow projection + partial-agg count."""
    from pyspark.sql import Window as W

    emb = read_table(spark, sf_dir, "embeddings")
    # per-(label, dim) exact sums + counts -> integer centroid
    # (floor of the scaled mean: sum_fx DIV n)
    ex = emb.select(
        "label", F.posexplode(F.col("embedding"))
    ).select(
        "label",
        "pos",
        F.round(F.col("col").cast("double") * 1_000_000).cast("long").alias("x"),
    )
    cent = (
        ex.groupBy("label", "pos")
        .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
        .select("label", "pos", F.expr("sx DIV n").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            F.col("label").alias("c_label"),
            F.transform(F.col("pc"), lambda s: s["c"]).alias("cv"),
        )
    )
    from .operators.similarity import _dot, _quantized

    cent = cent.withColumn("cn", _dot(F.col("cv"), F.col("cv")))
    v = emb.select(
        "vec_id", "label", _quantized(F.col("embedding")).alias("qv")
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    scored = v.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "c_label",
        (
            _dot(F.col("qv"), F.col("cv")).cast("double")
            / F.sqrt(F.col("qn").cast("double") * F.col("cn").cast("double"))
        ).alias("score"),
    )
    w = W.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("c_label")
    )
    best = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return best.groupBy(
        F.col("label").alias("true_label"),
        F.col("c_label").alias("pred_label"),
    ).agg(F.count(F.lit(1)).alias("n"))


_SQL_LABEL_CENTROIDS = """WITH ex AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS x
  FROM embeddings
), cd AS (
  SELECT label, pos,
         CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
  FROM ex GROUP BY label, pos
), cent AS (
  SELECT label AS c_label, list(c ORDER BY pos) AS cv FROM cd GROUP BY label
), cn AS (
  SELECT c_label, cv, list_dot_product(cv, cv) AS cnorm FROM cent
), vl AS (
  SELECT vec_id, label, list(x ORDER BY pos) AS qv FROM ex
  GROUP BY vec_id, label
), vn AS (
  SELECT vec_id, label, qv, list_dot_product(qv, qv) AS qnorm FROM vl
), scored AS (
  SELECT vn.vec_id, vn.label, cn.c_label,
         CAST(list_dot_product(vn.qv, cn.cv) AS DOUBLE)
           / sqrt(CAST(vn.qnorm AS DOUBLE) * CAST(cn.cnorm AS DOUBLE))
           AS score
  FROM vn, cn
), best AS (
  SELECT vec_id, label, c_label,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, c_label) AS rn
  FROM scored
)
SELECT label AS true_label, c_label AS pred_label,
       CAST(count(*) AS BIGINT) AS n
FROM best WHERE rn = 1
GROUP BY 1, 2"""


def q_weighted_sample(spark, sf_dir):
    """Importance sampling: keep each document with probability
    proportional to its size (n_chars·2000 ppm, capped at 1) — the
    deterministic per-row-rate Bernoulli filter (same content-keyed
    contract as hash_split)."""
    from .operators.sampling import weighted_sample

    docs = read_table(spark, sf_dir, "documents")
    rate = F.least(
        F.col("n_chars").cast("double") * 2000 / 1_000_000.0, F.lit(1.0)
    )
    return weighted_sample(docs, "doc_id", rate).select(
        "doc_id", "lang", "n_chars"
    )


_SQL_WEIGHTED_SAMPLE = """SELECT doc_id, lang, n_chars
FROM documents
WHERE (('0x' || substr(md5('wsample|' || doc_id::VARCHAR), 1, 15))::BIGINT
       % 1000000)
      < CAST(round(least(CAST(n_chars AS DOUBLE) * 2000 / 1000000.0, 1.0)
                   * 1000000.0) AS BIGINT)"""


def q_rag_prep(spark, sf_dir):
    """End-to-end RAG corpus preparation composing this round's
    operators: rule quality gate -> overlapping 32/16 token chunking ->
    exact chunk-level dedup (first (doc, chunk) per chunk text wins) ->
    chunk manifest.  Every stage deterministic; ONE oracle replays the
    pipeline."""
    from pyspark.sql import Window as W

    from .functions.text import stopword_count, token_count
    from .operators.packing import chunk_documents

    docs = read_table(spark, sf_dir, "documents")
    good = docs.filter(
        (token_count(F.col("text")) >= 30)
        & (stopword_count(F.col("text")) >= 2)
    )
    chunks = chunk_documents(good, chunk_tokens=32, stride=16)
    w = W.partitionBy(F.md5(F.col("chunk_text"))).orderBy(
        "doc_id", "chunk_id"
    )
    return (
        chunks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "chunk_id", "chunk_start", "n_tokens")
    )


_SQL_RAG_PREP = rf"""WITH good AS (
  SELECT doc_id, text FROM documents
  WHERE len(regexp_extract_all(text, '\S+')) >= 30
    AND len(regexp_extract_all(lower(text), '{_STOPWORD_SQL_RE}')) >= 2
), toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM good
), st AS (
  SELECT doc_id, tl, unnest(range(0, greatest(len(tl), 1), 16)) AS s
  FROM toks WHERE len(tl) > 0
), ch AS (
  SELECT doc_id, CAST(s // 16 AS BIGINT) AS chunk_id,
         CAST(s AS BIGINT) AS chunk_start,
         CAST(len(tl[s + 1 : s + 32]) AS BIGINT) AS n_tokens,
         array_to_string(tl[s + 1 : s + 32], ' ') AS chunk_text
  FROM st
), d AS (
  SELECT *, row_number() OVER (PARTITION BY md5(chunk_text)
            ORDER BY doc_id, chunk_id) AS rn
  FROM ch
)
SELECT doc_id, chunk_id, chunk_start, n_tokens FROM d WHERE rn = 1"""


def q_pagerank(spark, sf_dir):
    """PageRank (5 iterations, damping 17/20, fixed-point bigint) over
    the MinHash duplicate-pair graph — iterative distributed
    computation with a fully unrolled SQL oracle (the IVF-k-means
    replay strategy applied to a graph loop)."""
    from .operators.graph import pagerank

    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=8, portable=True)
    return pagerank(pairs, iterations=5)


def _sql_pagerank(iters: int = 5) -> str:
    from .operators.graph import PR_SCALE

    base = _sql_minhash_pairs(num_hashes=32, bands=8, k=3, threshold=0.0)
    tele = f"({PR_SCALE} - ({PR_SCALE} * 17) // 20)"
    parts = [
        f"""mh AS MATERIALIZED ({base}),
e AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM mh
  UNION SELECT id_b, id_a FROM mh
), deg AS MATERIALIZED (
  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY u
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
it0 AS (SELECT u AS v, CAST({PR_SCALE} // nn.n AS BIGINT) AS r FROM deg, nn)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""it{i} AS (
  SELECT e.v AS v,
         CAST({tele} // nn.n + (sum(p.r // d.deg) * 17) // 20 AS BIGINT) AS r
  FROM e JOIN it{i - 1} p ON e.u = p.v JOIN deg d ON d.u = e.u, nn
  GROUP BY e.v, nn.n)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT v, r AS rank_fx FROM it{iters}"
    )


_SQL_PAGERANK = _sql_pagerank(5)


def q_funnel(spark, sf_dir):
    """Ordered funnel: per user, the first view, the first click AFTER
    that view, the first purchase AFTER that click; report how many
    users reach each stage.  Three partial-aggregated groupBys + two
    broadcast-sized joins on the user key — no window sort over the
    event stream."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("1_view").alias("stage"), "n")
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("2_click").alias("stage"), "n"
            )
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("3_purchase").alias("stage"), "n"
            )
        )
    )


_SQL_FUNNEL = """WITH ev AS (
  SELECT user_id, event_type, epoch_ns(ts) AS t FROM events
), v AS (
  SELECT user_id, min(t) AS t_view FROM ev
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT ev.user_id, min(t) AS t_click FROM ev JOIN v USING (user_id)
  WHERE event_type = 'click' AND t > t_view GROUP BY ev.user_id
), p AS (
  SELECT ev.user_id, min(t) AS t_purchase FROM ev JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND t > t_click GROUP BY ev.user_id
)
SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n FROM v
UNION ALL
SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
UNION ALL
SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p"""


def q_retention_cohorts(spark, sf_dir):
    """Cohort retention: users grouped by first-activity day, counted by
    distinct active day offset — the standard retention triangle.  Two
    partial-aggregated passes + one join on the user key."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts DIV {_DAY_NS}").alias("day")
    )
    ud = ev.distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ud.join(first, "user_id")
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_SQL_RETENTION = f"""WITH ud AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // {_DAY_NS} AS day FROM events
), first AS (
  SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id
)
SELECT cohort_day, day - cohort_day AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM ud JOIN first USING (user_id)
GROUP BY 1, 2"""


def q_interarrival(spark, sf_dir):
    """Inter-arrival decade histogram (timeseries.py:
    interarrival_histogram): gaps between consecutive same-user
    events, bucketed by floor(log10) computed as the INTEGER decimal
    string length (no float-log boundary drift), ties in decade -1,
    exact min/max gap per decade.  One keyed window shuffle + a
    19-row-bounded agg.  The oracle replays the lead(), the string
    length, and the tie bucket."""
    from .operators.timeseries import interarrival_histogram

    ev = read_table(spark, sf_dir, "events")
    return interarrival_histogram(ev)


_SQL_INTERARRIVAL = """WITH g AS (
  SELECT lead(epoch_ns(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) - epoch_ns(ts) AS gap
  FROM events
)
SELECT CAST(CASE WHEN gap <= 0 THEN -1
            ELSE length(CAST(gap AS VARCHAR)) - 1 END AS BIGINT) AS decade,
       CAST(count(*) AS BIGINT) AS n,
       min(gap) AS min_gap, max(gap) AS max_gap
FROM g WHERE gap IS NOT NULL
GROUP BY 1"""


def q_stream_interarrival(spark, sf_dir):
    """The STREAMING inter-arrival twin in batch mode (streaming.py:
    stream_interarrival — per-key last-timestamp STATE via
    applyInPandasWithState carries the batch-boundary gap; mergeable
    per-decade sink counts; file-stream parity pytest-gated).  Batch
    inputs delegate to interarrival_histogram; shares its oracle."""
    from .streaming import stream_interarrival

    ev = read_table(spark, sf_dir, "events")
    return stream_interarrival(ev)


def q_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value matrix (profile.py: cohort_ltv): 30-day
    periods from exact epoch-day integers, cohort = first period per
    customer, exact cent sums and distinct-customer counts per
    (cohort, age) cell — the revenue companion to the retention
    triangle, zero doubles.  Two partial-agged passes + one key
    equi-join."""
    from .operators.profile import cohort_ltv

    od = read_table(spark, sf_dir, "orders")
    return cohort_ltv(od)


_SQL_COHORT_LTV = """WITH o AS (
  SELECT o_custkey,
         (epoch_ns(o_orderdate) // 86400000000000) // 30 AS period,
         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders
), first AS (
  SELECT o_custkey, min(period) AS cohort FROM o GROUP BY o_custkey
)
SELECT cohort, period - cohort AS age,
       CAST(sum(cents) AS BIGINT) AS ltv_cents,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_keys
FROM o JOIN first ON o.o_custkey = first.o_custkey
GROUP BY 1, 2"""


def q_anomaly_flags(spark, sf_dir):
    """Per-user z-score anomaly flags from EXACT bigint moment sums:
    mean/variance per user via (n, Σx, Σx²) fixed-point sums, then one
    fixed-order double formula flags events with |x - μ| > 2σ.  One agg
    + one broadcast-sized join back on the key."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 1_000).cast("long").alias("x"),
    )
    s = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    joined = ev.join(s, "user_id")
    mu = d("sx") / d("n")
    var = d("sx2") / d("n") - mu * mu
    z_num = F.abs(d("x") - mu)
    flag = (var > 0) & (z_num * z_num > F.lit(4.0) * var)
    return joined.select(
        "event_id", "user_id", "x", flag.alias("is_anomaly")
    )


_SQL_ANOMALY = """WITH ev AS (
  SELECT event_id, user_id, CAST(round(value * 1000) AS BIGINT) AS x
  FROM events
), s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sx2
  FROM ev GROUP BY user_id
)
SELECT event_id, user_id, x,
       ((CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) > 0
        AND abs(CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * abs(CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            > 4.0 * (CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))
         AS is_anomaly
FROM ev JOIN s USING (user_id)"""


def q_build_vocab(spark, sf_dir):
    """Frequency-ranked vocabulary over the corpus: (term, token_id,
    count) with ids assigned by (count desc, term) — the deterministic
    tokenizer-vocab construction step.  One partial-aggregated term
    count; ids come from the distributed prefix-offset rank
    (operators/ranking.py) — NO single-partition window, so the
    hundreds-of-millions-row web-scale vocabulary never funnels
    through one task."""
    from .functions.text import tokens
    from .operators.ranking import frequency_rank

    docs = read_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return frequency_rank(
        tf, count_col="count", tie_col="term", rank_col="token_id"
    ).select("term", "token_id", "count")


_SQL_VOCAB = r"""WITH tf AS (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
), c AS (SELECT term, CAST(count(*) AS BIGINT) AS count FROM tf GROUP BY term)
SELECT term,
       CAST(row_number() OVER (ORDER BY count DESC, term) - 1 AS BIGINT)
         AS token_id,
       count
FROM c"""


def q_levenshtein_pairs(spark, sf_dir):
    """Character-level verification of MinHash near-dup candidates:
    exact Levenshtein distance and its length-normalized similarity on
    candidate pairs only — edit distance is O(len²) per pair, so it
    NEVER runs all-pairs; the LSH candidate generator bounds the work.
    Both engines ship the same built-in."""
    from .operators.dedup import minhash_lsh_pairs

    docs = read_table(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs, num_hashes=32, bands=8, portable=True)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    out = cand.join(a, "id_a").join(b, "id_b")
    dist = F.levenshtein("ta", "tb")
    maxlen = F.greatest(F.length("ta"), F.length("tb"))
    return out.select(
        "id_a",
        "id_b",
        dist.cast("long").alias("edit_dist"),
        F.round(
            F.lit(1.0) - dist.cast("double") / maxlen.cast("double"), 6
        ).alias("edit_sim"),
    )


def _sql_levenshtein() -> str:
    # reuse the minhash candidate replay, then score with the built-in
    base = _sql_minhash_pairs(num_hashes=32, bands=8, k=3, threshold=0.0)
    # the replay's final SELECT keeps pairs at any jaccard; wrap it
    return f"""WITH mh AS ({base})
SELECT mh.id_a, mh.id_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
       round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
             / CAST(greatest(length(a.text), length(b.text)) AS DOUBLE), 6)
         AS edit_sim
FROM mh JOIN documents a ON a.doc_id = mh.id_a
        JOIN documents b ON b.doc_id = mh.id_b"""


_SQL_LEVENSHTEIN = _sql_levenshtein()


def q_chunk_documents(spark, sf_dir):
    """RAG chunking: overlapping 32-token windows every 16 tokens over
    the documents corpus — narrow expressions only, no shuffle."""
    from .operators.packing import chunk_documents

    docs = read_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=32, stride=16)


_SQL_CHUNK_DOCS = r"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM documents
), st AS (
  SELECT doc_id, tl,
         unnest(range(0, greatest(len(tl), 1), 16)) AS s
  FROM toks WHERE len(tl) > 0
)
SELECT doc_id, CAST(s // 16 AS BIGINT) AS chunk_id,
       CAST(s AS BIGINT) AS chunk_start,
       CAST(len(tl[s + 1 : s + 32]) AS BIGINT) AS n_tokens,
       array_to_string(tl[s + 1 : s + 32], ' ') AS chunk_text
FROM st"""


_ALLEN_CASE_SQL = """CASE
    WHEN alo < brs THEN 'precedes'
    WHEN alo = brs THEN 'meets'
    WHEN bro < als THEN 'preceded_by'
    WHEN bro = als THEN 'met_by'
    WHEN als = brs AND alo = bro THEN 'equals'
    WHEN als = brs AND alo < bro THEN 'starts'
    WHEN als = brs AND alo > bro THEN 'started_by'
    WHEN alo = bro AND als > brs THEN 'finishes'
    WHEN alo = bro AND als < brs THEN 'finished_by'
    WHEN als > brs AND alo < bro THEN 'during'
    WHEN als < brs AND alo > bro THEN 'contains'
    WHEN als < brs AND alo < bro THEN 'overlaps'
    ELSE 'overlapped_by' END"""


def q_allen_relations(spark, sf_dir):
    """Allen interval-algebra census: classify every (event span, 8-ile
    window) pair into its Allen relation and report per-relation counts
    + IoU extrema (min/max are order-independent, so double IoUs stay
    oracle-safe).  The windows side is 8 rows — broadcast cross join,
    codegen'd classification, one tiny final aggregation."""
    from .functions.spans import allen_relation, span_iou

    es, w = _es_windows(spark, sf_dir, 8, "idx")
    pairs = es.select(F.col("span").alias("a")).crossJoin(
        F.broadcast(w.select(F.col("span").alias("b")))
    )
    return (
        pairs.select(
            allen_relation("a", "b").alias("relation"),
            span_iou("a", "b").alias("iou"),
        )
        .groupBy("relation")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("iou").alias("min_iou"),
            F.max("iou").alias("max_iou"),
        )
    )


_SQL_ALLEN = f"""WITH {_ES_CTE}, {_w_cte(8, "idx")},
p AS (
  SELECT es.s AS als, es.e AS alo, w.w_start AS brs, w.w_stop AS bro
  FROM es, w
), c AS (
  SELECT {_ALLEN_CASE_SQL} AS relation,
         greatest(least(alo, bro) - greatest(als, brs), 0) AS inter,
         (alo - als) + (bro - brs) AS lens
  FROM p
)
SELECT relation, CAST(count(*) AS BIGINT) AS n_pairs,
       min(CASE WHEN lens - inter > 0 THEN
           round(CAST(inter AS DOUBLE) / CAST(lens - inter AS DOUBLE), 6)
           END) AS min_iou,
       max(CASE WHEN lens - inter > 0 THEN
           round(CAST(inter AS DOUBLE) / CAST(lens - inter AS DOUBLE), 6)
           END) AS max_iou
FROM c GROUP BY relation"""


def q_group_percentiles(spark, sf_dir):
    """Exact nearest-rank percentiles (p50/p90/p99) of the fixed-point
    value per event_type: rank ``ceil(p·n/100)`` over the per-group sort
    — integer ranks over an integer multiset, so the selected values are
    deterministic regardless of tie order.  One shuffle on the group
    key."""
    from pyspark.sql import Window as W

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1_000).cast("long").alias("v_fx"),
    )
    w = W.partitionBy("event_type").orderBy("v_fx")
    wn = W.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "v_fx",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    rank_of = lambda p: F.expr(f"(n * {p} + 99) DIV 100")  # noqa: E731
    return ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == rank_of(50), F.col("v_fx"))).alias("p50_fx"),
        F.max(F.when(F.col("rn") == rank_of(90), F.col("v_fx"))).alias("p90_fx"),
        F.max(F.when(F.col("rn") == rank_of(99), F.col("v_fx"))).alias("p99_fx"),
        F.max("n").alias("n"),
    )


_SQL_GROUP_PERCENTILES = """WITH ev AS (
  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS v_fx FROM events
), ranked AS (
  SELECT event_type, v_fx,
         row_number() OVER (PARTITION BY event_type ORDER BY v_fx) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
)
SELECT event_type,
       CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN v_fx END) AS BIGINT) AS p50_fx,
       CAST(max(CASE WHEN rn = (n * 90 + 99) // 100 THEN v_fx END) AS BIGINT) AS p90_fx,
       CAST(max(CASE WHEN rn = (n * 99 + 99) // 100 THEN v_fx END) AS BIGINT) AS p99_fx,
       CAST(max(n) AS BIGINT) AS n
FROM ranked GROUP BY event_type"""


def q_value_correlation(spark, sf_dir):
    """Pearson correlation of value vs hour-of-day per event_type from
    EXACT bigint moment sums (n, Σx, Σy, Σxy, Σx², Σy² — fixed-point x,
    integer y), combined into the correlation in one fixed-order double
    formula — partial-aggregation order cannot perturb the result, and
    the oracle recomputes the identical expression."""
    hour_ns = 3_600 * 1_000_000_000
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1_000).cast("long").alias("x"),
        F.pmod(F.expr(f"ts DIV {hour_ns}"), F.lit(24)).cast("long").alias("y"),
    )
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    corr = (d("n") * d("sxy") - d("sx") * d("sy")) / F.sqrt(
        (d("n") * d("sx2") - d("sx") * d("sx"))
        * (d("n") * d("sy2") - d("sy") * d("sy"))
    )
    return s.select(
        "event_type", "n", F.round(corr, 6).alias("corr_value_hour")
    )


_SQL_VALUE_CORR = """WITH ev AS (
  SELECT event_type,
         CAST(round(value * 1000) AS BIGINT) AS x,
         (epoch_ns(ts) // 3600000000000) % 24 AS y
  FROM events
), s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sx2,
         CAST(sum(y * y) AS BIGINT) AS sy2
  FROM ev GROUP BY event_type
)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS corr_value_hour
FROM s"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_user_activity(spark, sf_dir):
    """Wide per-user activity matrix via ``pivot`` with an explicit
    value list (single-pass, no distinct-values pre-scan): one count
    column per event type.  Missing combinations surface as 0."""
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type")
    p = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    )


_SQL_PIVOT_USER = f"""SELECT user_id,
       {", ".join(f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}" for t in _EVENT_TYPES)}
FROM events GROUP BY user_id"""


def q_similarity_sq8(spark, sf_dir):
    """Cosine top-5 over int8 scalar-quantized vectors (4x compression;
    per-dimension max-magnitude codebook derived from the data in both
    engines — see operators/similarity.py sq8_topk)."""
    from .operators.similarity import sq8_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = sq8_topk(emb, queries, k=5)
    return out.select(
        "q_id", F.col("rank").cast("long").alias("rank"), "n_id", "score"
    )


_SQL_SIMILARITY_SQ8 = """WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), mx AS (
  SELECT pos, CASE WHEN max(abs(x)) > 0 THEN max(abs(x)) ELSE 1.0 END AS m
  FROM ex GROUP BY pos
), qv AS (
  SELECT vec_id, pos, CAST(round((x * 127.0) / m) AS BIGINT) AS qx
  FROM ex JOIN mx USING (pos)
), vl AS (
  SELECT vec_id, list(qx ORDER BY pos) AS v FROM qv GROUP BY vec_id
), n AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM vl),
q AS (SELECT * FROM n WHERE vec_id < 5),
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         CAST(list_dot_product(c.v, q.v) AS DOUBLE)
           / sqrt(CAST(c.nrm AS DOUBLE) * CAST(q.nrm AS DOUBLE)) AS score
  FROM n c, q WHERE c.vec_id <> q.vec_id
), ranked AS (
  SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, n_id) AS BIGINT) AS rank,
         n_id, round(score, 6) AS score
  FROM pairs)
SELECT q_id, rank, n_id, score FROM ranked WHERE rank <= 5"""


def q_rollup_daily(spark, sf_dir):
    """Multi-granularity rollup of the event stream: (event_type, day)
    -> (event_type) -> grand total in ONE pass via grouping sets —
    Spark's ``rollup`` and ANSI ``GROUP BY ROLLUP`` must agree on
    subtotal rows, null markers, and grouping ids.  Value sums are
    fixed-point bigints so partial-agg order cannot perturb them."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts") - F.pmod(F.col("ts"), F.lit(_DAY_NS))).alias("day"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    return ev.rollup("event_type", "day").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v_fx").alias("sum_value_fx"),
    )


_SQL_ROLLUP_DAILY = f"""WITH ev AS (
  SELECT event_type,
         epoch_ns(ts) - epoch_ns(ts) % {_DAY_NS} AS day,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
)
SELECT event_type, day,
       CAST(GROUPING(event_type, day) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(v_fx) AS BIGINT) AS sum_value_fx
FROM ev GROUP BY ROLLUP (event_type, day)"""


def q_dedup_lines(spark, sf_dir):
    """C4-style corpus-level LINE dedup: the synthetic docs are flat,
    so the query first folds them into 2-token lines (deterministic
    expression both engines replay), then strips every line appearing
    in >= 20 distinct documents — boilerplate removal, the line-level
    complement of document near-dup."""
    from .functions.text import tokens
    from .operators.dedup import dedup_lines
    from .sources import ensure_parallelism

    # the 2-token line folding below is CPU-bound and evaluated through
    # both of dedup_lines' passes — parallelize at the bare scan (the
    # operator's own guard sees only this derived plan)
    docs = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    n = F.size(toks)
    # n == 0 guard: sequence(0, -1) defaults to step -1 in Spark and
    # yields [0, -1] (two blank lines) where the oracle's range() yields
    # none — a zero-token document must fold to the empty string
    lined = F.when(
        n >= 1,
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.ceil(n / 2).cast("int") - 1),
                lambda i: F.array_join(F.slice(toks, i * 2 + 1, 2), " "),
            ),
            "\n",
        ),
    ).otherwise(F.lit(""))
    docs2 = docs.select("doc_id", lined.alias("text"))
    out = dedup_lines(docs2, min_df=20, portable=True)
    return out.select("doc_id", "text", "n_removed")


_SQL_DEDUP_LINES = rf"""WITH lined AS (
  SELECT doc_id,
         array_to_string(
           list_transform(range(1, len(tl) + 1, 2),
                          i -> array_to_string(tl[i:i+1], ' ')),
           chr(10)) AS text
  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS tl
        FROM documents)
), l AS (
  SELECT doc_id, unnest(range(1, len(sl) + 1)) AS pos, unnest(sl) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS sl FROM lined)
), hot AS (
  SELECT {_PH60.format(x="line")} AS h
  FROM l GROUP BY 1 HAVING count(DISTINCT doc_id) >= 20
), kept AS (
  SELECT doc_id, pos, line FROM l
  WHERE {_PH60.format(x="line")} NOT IN (SELECT h FROM hot)
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(r.text, '') AS text,
       CAST(len(string_split(d.text, chr(10))) - coalesce(r.n_kept, 0)
            AS BIGINT) AS n_removed
FROM lined d LEFT JOIN rebuilt r USING (doc_id)"""


def q_multi_rollup(spark, sf_dir):
    """Hour AND day rollups of the event stream in ONE aggregation
    pass (GROUP BY GROUPING SETS — shared scan + shared map-side
    partial agg, one exchange): the hypertable continuous-aggregate
    shape.  Fixed-point value sums; exact pmod bucket alignment."""
    from .operators.timeseries import multi_resolution_rollup

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_fx"),
    )
    return multi_resolution_rollup(
        ev,
        "ts",
        {"hour": _HOUR_NS, "day": _DAY_NS},
        by="event_type",
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v_fx").alias("sum_value_fx"),
        ],
    )


_SQL_MULTI_ROLLUP = f"""WITH ev AS (
  SELECT event_type, epoch_ns(ts) AS t,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
), b AS (
  SELECT event_type, t - t % {3_600_000_000_000} AS bh,
         t - t % {86_400 * 1_000_000_000} AS bd, v_fx
  FROM ev
)
SELECT event_type,
       CASE WHEN GROUPING(bh) = 0 THEN 'hour'
            WHEN GROUPING(bd) = 0 THEN 'day' END AS resolution,
       CASE WHEN GROUPING(bh) = 0 THEN bh ELSE bd END AS bucket_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(v_fx) AS BIGINT) AS sum_value_fx
FROM b GROUP BY GROUPING SETS ((event_type, bh), (event_type, bd))"""


def q_shingle_dup_pairs(spark, sf_dir):
    """Exact-substring duplication candidates: pairs sharing >= 3
    distinct word 16-grams (stop-shingle guard df <= 50) — the
    substring-level complement of MinHash near-dup."""
    from .operators.dedup import shared_shingle_pairs

    docs = read_table(spark, sf_dir, "documents")
    return shared_shingle_pairs(
        docs, shingle_k=16, min_shared=3, max_df=50, portable=True
    )


_SQL_SHINGLE_DUP = rf"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(tl) < 16 THEN [array_to_string(tl, ' ')]
       ELSE list_transform(range(1, len(tl) - 14),
                           i -> array_to_string(tl[i:i+15], ' ')) END AS sl
  FROM toks
), ex AS (
  SELECT doc_id, {_PH60.format(x="s")} AS h
  FROM (SELECT doc_id, unnest(list_distinct(sl)) AS s FROM sh)
), freq AS (
  SELECT h, count(*) AS df FROM ex GROUP BY 1
), keep AS (
  SELECT doc_id, h FROM ex JOIN freq USING (h) WHERE df <= 50
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM keep a JOIN keep b USING (h)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 3"""


def q_stream_sliding_agg(spark, sf_dir):
    """The hopping-window rollup through the STREAMING operator in batch
    mode — Spark's native ``F.window(ts, length, slide)`` must reproduce
    the batch arithmetic windowing exactly (shared oracle with
    q_sliding_window_agg)."""
    from .streaming import stream_sliding_agg

    ev = read_table(spark, sf_dir, "events")
    out = stream_sliding_agg(
        ev,
        width_ns=_HOP_LEN_NS,
        slide_ns=_HOP_SLIDE_NS,
        aggs=_hop_aggs(),
        ts_col="ts",
        by="event_type",
    )
    return _hop_finish(out).select(
        F.col("span.start").alias("w_start"),
        F.col("span.stop").alias("w_end"),
        "event_type",
        "n_events",
        "avg_value",
    )


_BM25_QUERIES = (
    ("q1", "spark hash join"),
    ("q2", "window agg stream"),
    ("q3", "dup filter"),
)


def q_bm25_topk(spark, sf_dir):
    """BM25 lexical retrieval: top-5 documents per fixed query under the
    exact-bigint BM25 scoring (k1=1.2, b=0.75 — see operators/tfidf.py:
    no libm log, no float summation, so ranking and ties are
    oracle-identical)."""
    from .operators.tfidf import bm25_topk

    docs = read_table(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(
        list(_BM25_QUERIES), "query_id string, query_text string"
    )
    return bm25_topk(docs, qdf, k=5)


def _sql_bm25(k: int = 5) -> str:
    values = ", ".join(f"('{qid}', '{qt}')" for qid, qt in _BM25_QUERIES)
    return rf"""WITH q(query_id, query_text) AS (VALUES {values}),
qt AS (
  SELECT DISTINCT query_id, unnest(regexp_extract_all(lower(query_text), '\S+')) AS term
  FROM q
), toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), tfq AS (
  SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM qt) USING (term)
), dfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfq GROUP BY 1
), dl AS (
  SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS dl
  FROM documents
), st AS (
  SELECT CAST(sum(dl) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n FROM dl
), scored AS (
  SELECT qt.query_id, tfq.doc_id,
         CAST(sum(((st.n * 1000 // dfq.df) * tfq.tf * 22 * st.total)
              // ((tfq.tf * 10 + 3) * st.total + 9 * dl.dl * st.n))
              AS BIGINT) AS score
  FROM tfq JOIN dfq USING (term) JOIN qt USING (term)
           JOIN dl USING (doc_id), st
  GROUP BY 1, 2
), ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
         doc_id, score
  FROM scored)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}"""


_SQL_BM25 = _sql_bm25(5)


def q_lm_score(spark, sf_dir):
    """Bigram-LM likelihood quality score per document: corpus-trained
    conditional probabilities, exact bigint floor arithmetic end-to-end
    (the perplexity filter without libm log) — see
    :func:`~dataframeintervals_jl_spark.operators.tfidf.bigram_lm_score`."""
    from .operators.tfidf import bigram_lm_score

    docs = read_table(spark, sf_dir, "documents")
    return bigram_lm_score(docs)


_SQL_LM_SCORE = r"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents
), bg AS (
  -- parallel unnests zip in DuckDB: adjacent-pair stream without a
  -- lateral index join
  SELECT doc_id, unnest(t[:len(t) - 1]) AS w1, unnest(t[2:]) AS w2
  FROM toks
), c2 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1
), p AS (
  SELECT w1, w2, (1000000::BIGINT * c2) // (c1 + 4) AS p
  FROM c2 JOIN c1 USING (w1)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(CAST(sum(p) AS BIGINT) // count(*) AS BIGINT) AS lm_score
FROM bg JOIN p USING (w1, w2)
GROUP BY doc_id"""


def q_lm_buckets(spark, sf_dir):
    """CCNet-style quality bucketing: per language, documents ranked by
    the bigram-LM score and cut into exact integer quartiles
    (``bucket = (rank-1)*4 DIV n`` — no percentile floats), with
    per-bucket counts and score extrema.  The standard head/middle/tail
    split a perplexity-filtered corpus ships with.

    Scale note: the rank window partitions by LANGUAGE — a handful of
    giant partitions at corpus scale.  There, replace the window with
    the two-pass distributed rank (``ranking.frequency_rank``'s shape:
    per-partition partial counts + broadcast boundary offsets) or cut
    buckets on a quantile-sketch threshold (``qsk_quantiles``) instead
    of exact ranks; this catalog query is the exact-integer oracle of
    the bucket SEMANTICS."""
    from pyspark.sql import Window

    from .operators.tfidf import bigram_lm_score

    docs = read_table(spark, sf_dir, "documents")
    sc = bigram_lm_score(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy("lang").orderBy("lm_score", "doc_id")
    n = Window.partitionBy("lang")
    ranked = sc.select(
        "lang",
        "lm_score",
        F.row_number().over(w).alias("__r"),
        F.count(F.lit(1)).over(n).alias("__n"),
    ).select(
        "lang",
        "lm_score",
        F.expr("(( __r - 1) * 4) DIV __n").cast("long").alias("bucket"),
    )
    return ranked.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("lm_score").alias("min_score"),
        F.max("lm_score").alias("max_score"),
    )


_SQL_LM_BUCKETS = rf"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents
), bg AS (
  SELECT doc_id, unnest(t[:len(t) - 1]) AS w1, unnest(t[2:]) AS w2
  FROM toks
), c2 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1
), p AS (
  SELECT w1, w2, (1000000::BIGINT * c2) // (c1 + 4) AS p
  FROM c2 JOIN c1 USING (w1)
), lm AS (
  SELECT doc_id, CAST(CAST(sum(p) AS BIGINT) // count(*) AS BIGINT)
           AS lm_score
  FROM bg JOIN p USING (w1, w2)
  GROUP BY doc_id
), ranked AS (
  SELECT d.lang, lm.lm_score,
         ((row_number() OVER (PARTITION BY d.lang
                              ORDER BY lm.lm_score, lm.doc_id) - 1) * 4)
         // (count(*) OVER (PARTITION BY d.lang)) AS bucket
  FROM lm JOIN documents d USING (doc_id)
)
SELECT lang, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(lm_score) AS BIGINT) AS min_score,
       CAST(max(lm_score) AS BIGINT) AS max_score
FROM ranked GROUP BY lang, bucket"""


def q_dsir_weights(spark, sf_dir):
    """DSIR-style data-selection weights: hashed bigram bucket
    distributions of the whole corpus vs the English subset (the
    'target' domain), add-one-smoothed ppm importance ratio per
    bucket, floor-mean per document — exact bigint end-to-end (see
    :func:`~dataframeintervals_jl_spark.operators.tfidf.dsir_weights`).
    English documents should score above the cross-language rest."""
    from .operators.tfidf import dsir_weights

    docs = read_table(spark, sf_dir, "documents")
    return dsir_weights(docs, docs.filter(F.col("lang") == "en"))


def _sql_dsir_weights(n: int = 2, buckets: int = 4096) -> str:
    ph = _PH60.format(x="g")
    sh = (
        f"CASE WHEN len(tl) < {n} THEN [array_to_string(tl, ' ')] "
        f"ELSE list_transform(range(1, len(tl) - {n} + 2), "
        f"i -> array_to_string(tl[i:i+{n - 1}], ' ')) END"
    )
    return rf"""WITH tt AS (
  SELECT regexp_extract_all(lower(text), '\S+') AS tl
  FROM documents WHERE lang = 'en'
), tg AS (
  SELECT unnest({sh}) AS g FROM tt
), tb AS (
  SELECT ({ph} % {buckets}) AS b FROM tg
), ct AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c FROM tb GROUP BY b
), ctoks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tl
  FROM documents
), cgr AS (
  SELECT doc_id, unnest({sh}) AS g FROM ctoks
), cb AS MATERIALIZED (
  SELECT doc_id, ({ph} % {buckets}) AS b FROM cgr
), cr AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c FROM cb GROUP BY b
), nt AS (
  SELECT CAST(coalesce(sum(c), 0) + {buckets} AS BIGINT) AS n FROM ct
), nr AS (
  SELECT CAST(coalesce(sum(c), 0) + {buckets} AS BIGINT) AS n FROM cr
), ratio AS (
  SELECT cr.b,
         least((1000000 * (coalesce(ct.c, 0) + 1) * nr.n)
               // ((cr.c + 1) * nt.n), 1000000000000) AS r
  FROM cr LEFT JOIN ct USING (b), nt, nr
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(CAST(sum(r) AS BIGINT) // count(*) AS BIGINT) AS dsir_weight
FROM cb JOIN ratio USING (b)
GROUP BY doc_id"""


def q_dsir_resample(spark, sf_dir):
    """The full DSIR pipeline: hashed-bigram importance weights toward
    the English target distribution, then deterministic
    weight-proportional resampling (importance_resample) — per-lang
    kept counts.  English documents survive at ~the max rate, the
    rest proportionally below."""
    from .operators.sampling import importance_resample
    from .operators.tfidf import dsir_weights

    docs = read_table(spark, sf_dir, "documents")
    w = dsir_weights(docs, docs.filter(F.col("lang") == "en"))
    kept = importance_resample(w, "dsir_weight", "doc_id", salt="isr")
    return (
        kept.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


def _sql_dsir_resample() -> str:
    ph = _PH60.format(x="'isr|' || doc_id::VARCHAR")
    return f"""WITH dw AS MATERIALIZED (
  FROM ({_sql_dsir_weights(2, 4096)})
), wm AS (
  SELECT max(dsir_weight) AS m FROM dw
), kept AS (
  SELECT doc_id FROM dw, wm
  WHERE ({ph} % 1000000)
        < least(1000000, (dsir_weight * 1000000) // wm.m)
)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
FROM kept JOIN documents d USING (doc_id)
GROUP BY d.lang"""


def q_snapshot_diff(spark, sf_dir):
    """Incremental-pipeline delta: diff the documents table against a
    deterministically perturbed re-crawl of itself (drops, edits, and
    new ids), emitting the added/removed/changed worklist a downstream
    re-embed/re-index stage would consume.  One full-outer equi-join
    on the key; unchanged keys (the vast majority) are filtered before
    any downstream stage."""
    from .operators.cdc import snapshot_diff

    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    edited = d % 7 == F.lit(2)
    new = (
        docs.filter(d % 11 != F.lit(3))
        .select(
            "doc_id",
            F.when(edited, F.concat(F.col("text"), F.lit(" [rev2]")))
            .otherwise(F.col("text"))
            .alias("text"),
            (
                F.col("n_chars") + F.when(edited, F.lit(7)).otherwise(F.lit(0))
            ).alias("n_chars"),
        )
        .unionByName(
            docs.filter(d % 13 == F.lit(5)).select(
                (d + F.lit(100000)).alias("doc_id"),
                F.concat(F.lit("new "), F.col("text")).alias("text"),
                F.col("n_chars"),
            )
        )
    )
    return snapshot_diff(
        docs, new, "doc_id", compare_cols=("text", "n_chars")
    )


_SQL_SNAPSHOT_DIFF = r"""WITH newt AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 2 THEN text || ' [rev2]' ELSE text END AS text,
         n_chars + CASE WHEN doc_id % 7 = 2 THEN 7 ELSE 0 END AS n_chars
  FROM documents WHERE doc_id % 11 <> 3
  UNION ALL
  SELECT doc_id + 100000, 'new ' || text, n_chars
  FROM documents WHERE doc_id % 13 = 5
), o AS (SELECT doc_id, text, n_chars FROM documents)
SELECT * FROM (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         o.text AS old_text, o.n_chars AS old_n_chars,
         n.text AS new_text, n.n_chars AS new_n_chars,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text IS NOT DISTINCT FROM n.text
                   AND o.n_chars IS NOT DISTINCT FROM n.n_chars THEN NULL
              ELSE 'changed' END AS change
  FROM o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id)
WHERE change IS NOT NULL"""


def q_apply_cdc(spark, sf_dir):
    """CDC merge: apply a derived change log (two upsert generations,
    deletes, and brand-new keys — with overlapping keys exercising
    latest-wins and the delete tie-break) onto the documents snapshot
    and return the merged current state."""
    from .operators.cdc import apply_cdc

    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def ch(pred, key, text, nchars, ts, op):
        return docs.filter(pred).select(
            key.alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            nchars.alias("n_chars"),
            F.lit(ts).alias("ts"),
            F.lit(op).alias("op"),
        )

    t, n = F.col("text"), F.col("n_chars")
    changes = (
        ch(d % 5 == 0, d, F.concat(t, F.lit(" v2")), n + 3, 100, "U")
        .unionByName(ch(d % 10 == 0, d, F.concat(t, F.lit(" v3")), n + 3, 200, "U"))
        .unionByName(ch(d % 9 == 4, d, t, n, 150, "D"))
        .unionByName(
            ch(d % 17 == 6, d + 100000, F.concat(F.lit("ins "), t), n, 100, "U")
        )
    )
    return apply_cdc(docs, changes, "doc_id", ts_col="ts")


_SQL_APPLY_CDC = r"""WITH ch AS (
  SELECT doc_id, text || ' v2' AS text, lang, source,
         n_chars + 3 AS n_chars, 100 AS ts, 'U' AS op
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, text || ' v3', lang, source, n_chars + 3, 200, 'U'
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars, 150, 'D'
  FROM documents WHERE doc_id % 9 = 4
  UNION ALL
  SELECT doc_id + 100000, 'ins ' || text, lang, source, n_chars, 100, 'U'
  FROM documents WHERE doc_id % 17 = 6
), latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY ts DESC, (op = 'D') DESC) AS rn
    FROM ch) WHERE rn = 1
)
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM latest)
UNION ALL
SELECT doc_id, text, lang, source, n_chars FROM latest WHERE op <> 'D'"""


def q_sample_per_group(spark, sf_dir):
    """Fixed-size deterministic per-source document sample (k=20 per
    source by portable content hash) — bounded eval subsets per
    stratum, engine- and partitioning-independent."""
    from .operators.sampling import sample_per_group

    docs = read_table(spark, sf_dir, "documents")
    return sample_per_group(docs, by="source", key_col="doc_id", k=20).select(
        "source", "doc_id", F.col("rank").cast("long").alias("rank")
    )


_SQL_SAMPLE_PER_GROUP = r"""WITH h AS (
  SELECT source, doc_id,
         ('0x' || substr(md5('gsample|' || doc_id::VARCHAR), 1, 15))::BIGINT
           AS h60
  FROM documents
)
SELECT source, doc_id, rank FROM (
  SELECT source, doc_id,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY h60 % 1000000, h60, doc_id)
           AS BIGINT) AS rank
  FROM h)
WHERE rank <= 20"""


def q_heavy_hitters(spark, sf_dir):
    """Exact token heavy hitters: every token holding >= 0.2% of all
    token occurrences, with exact count and integer ppm share —
    map-side partial aggregation is the whole skew story, no sketch
    needed."""
    from .functions.text import tokens
    from .operators.sampling import heavy_hitters

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    return heavy_hitters(toks, "tok", min_share_ppm=2000)


_SQL_HEAVY_HITTERS = r"""WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS value
  FROM documents
), c AS (
  SELECT value, CAST(count(*) AS BIGINT) AS count FROM toks GROUP BY value
), t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM toks)
SELECT value, count,
       CAST((count * 1000000) // total AS BIGINT) AS share_ppm
FROM c, t
WHERE count * 1000000 >= 2000 * total"""


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup: deterministic k-means cells over the embedding space,
    then drop docs with a same-cell lower-id neighbor at cosine >= 0.4
    — paraphrase-level dedup that MinHash cannot see.  Clustering is
    the blocking structure: the pair search is a cell equi-join."""
    from .operators.similarity import semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, n_centroids=16, threshold=0.4)


def q_salted_join(spark, sf_dir):
    """Salted equi-join under synthetic key skew (half of all events
    collapse onto key 0): the hot key spreads across 8 shuffle
    sub-partitions by construction, planner-independent — the explicit
    fallback for when AQE's skew split cannot fire.  The oracle is the
    PLAIN join: salting must not change the result multiset."""
    from .operators.skew import salted_join

    ev = read_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, F.lit(0).cast("long"))
        .otherwise(F.col("user_id") % 25)
        .alias("k"),
        F.round(F.col("value") * 1000000).cast("long").alias("v_fx"),
    )
    nat = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"), "n_name"
    )
    j = salted_join(ev, nat, "k", n_salt=8)
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v_fx").alias("sum_v")
    )


_SQL_SALTED_JOIN = r"""WITH ev AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id % 25 END AS k,
         CAST(round(value * 1000000) AS BIGINT) AS v_fx
  FROM events
)
SELECT n_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(v_fx) AS BIGINT) AS sum_v
FROM ev JOIN nation ON ev.k = n_nationkey
GROUP BY n_name"""


def q_stream_latest_by_key(spark, sf_dir):
    """Streaming CDC latest-state view (batch-batch mode, like the
    other q_stream_* entries): the same derived change log as
    q_apply_cdc reduced to one winning row per key — max_by over a
    (ts, is_delete) ordering, state bounded by key cardinality."""
    from .streaming import stream_latest_by_key

    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def ch(pred, key, text, nchars, ts, op):
        return docs.filter(pred).select(
            key.alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            nchars.alias("n_chars"),
            F.lit(ts).alias("ts"),
            F.lit(op).alias("op"),
        )

    t, n = F.col("text"), F.col("n_chars")
    changes = (
        ch(d % 5 == 0, d, F.concat(t, F.lit(" v2")), n + 3, 100, "U")
        .unionByName(ch(d % 10 == 0, d, F.concat(t, F.lit(" v3")), n + 3, 200, "U"))
        .unionByName(ch(d % 9 == 4, d, t, n, 150, "D"))
        .unionByName(
            ch(d % 17 == 6, d + 100000, F.concat(F.lit("ins "), t), n, 100, "U")
        )
    )
    return stream_latest_by_key(changes, "doc_id", ts_col="ts", op_col="op")


_SQL_STREAM_LATEST = r"""WITH ch AS (
  SELECT doc_id, text || ' v2' AS text, lang, source,
         n_chars + 3 AS n_chars, 100 AS ts, 'U' AS op
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, text || ' v3', lang, source, n_chars + 3, 200, 'U'
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars, 150, 'D'
  FROM documents WHERE doc_id % 9 = 4
  UNION ALL
  SELECT doc_id + 100000, 'ins ' || text, lang, source, n_chars, 100, 'U'
  FROM documents WHERE doc_id % 17 = 6
)
SELECT doc_id, text, lang, source, n_chars, ts, op FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY ts DESC, (op = 'D') DESC) AS rn
  FROM ch) WHERE rn = 1"""


def _pii_aug_expr():
    """Shared synthetic-PII augmentation for the PII queries: emails,
    IPs, phone runs, SSN-shaped ids, and UUIDs keyed off doc_id —
    deterministic, replayed verbatim by the oracles."""
    d = F.col("doc_id")
    ds = d.cast("string")
    return F.concat(
        F.col("text"),
        F.when(d % 3 == 0, F.concat(F.lit(" u"), ds, F.lit("@ex.org"))).otherwise(""),
        F.when(d % 4 == 0, F.concat(F.lit(" ip 10.1.2."), (d % 250).cast("string"))).otherwise(""),
        F.when(d % 5 == 0, F.lit(" call 555-123-4567 now")).otherwise(""),
        F.when(d % 7 == 0, F.lit(" ssn 123-45-6789")).otherwise(""),
        F.when(
            d % 11 == 0,
            F.concat(
                F.lit(" id 123e4567-e89b-12d3-a456-"),
                F.lpad((d % 1000).cast("string"), 12, "0"),
            ),
        ).otherwise(""),
    )


_SQL_PII_AUG = r"""
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' u' || doc_id::VARCHAR || '@ex.org' ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' ip 10.1.2.' || (doc_id % 250)::VARCHAR ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 555-123-4567 now' ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' ssn 123-45-6789' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' id 123e4567-e89b-12d3-a456-'
                      || lpad((doc_id % 1000)::VARCHAR, 12, '0') ELSE '' END
         AS a
  FROM documents
"""


def q_pii_redact(spark, sf_dir):
    """PII scrub audit: deterministic synthetic PII (emails, IPs,
    phone runs, SSN-shaped ids, UUIDs keyed off doc_id) is injected,
    counted per pattern, and redacted — output carries the md5 of the
    redacted text so the oracle checks the exact scrub, byte for
    byte.  Pure chained regexp_replace: codegen'd, RE2-compatible
    subset (functions/text.py: scrub_patterns over PII_PATTERNS)."""
    from .functions.text import pii_counts, redact_pii

    docs = read_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", _pii_aug_expr().alias("__aug"))
    sel = [F.col("doc_id")]
    for name, cnt in pii_counts(F.col("__aug")):
        sel.append(cnt.cast("long").alias(f"n_{name}"))
    sel.append(F.md5(redact_pii(F.col("__aug"))).alias("red_md5"))
    return base.select(*sel)


def _sql_pii_redact() -> str:
    """Audit counts + redaction chain generated from PII_PATTERNS
    itself, so pattern/order changes stay oracle-synchronized."""
    from .functions.text import PII_PATTERNS

    counts = ",\n".join(
        f"  CAST(len(regexp_extract_all(a,\n    '{pat}')) AS BIGINT)"
        f" AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "a"
    for _, pat, tag in PII_PATTERNS:
        red = f"regexp_replace({red},\n    '{pat}', '{tag}', 'g')"
    return (
        f"WITH aug AS ({_SQL_PII_AUG})\n"
        f"SELECT doc_id,\n{counts},\n  md5({red}) AS red_md5\nFROM aug"
    )


def q_pii_spans(spark, sf_dir):
    """Span-level PII report: per injected-PII document, the exact
    character span ``[start, stop)`` of every match of every PII
    class on the pre-redaction text (functions/text.py: match_spans —
    the split/extract offset derivation, expression-only).  The spans
    are the engine's standard closed-open struct, so downstream span
    algebra (excise_token_spans-style removal, coverage stats)
    composes directly; the oracle re-derives every offset from the
    same split/extract prefix sums."""
    from .functions.text import PII_PATTERNS, match_spans

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    )
    base = docs.select("doc_id", _pii_aug_expr().alias("__aug"))
    per_class = [
        base.select(
            "doc_id",
            F.lit(name).alias("pii_class"),
            F.explode(match_spans(F.col("__aug"), pat)).alias("__s"),
        )
        for name, pat, _ in PII_PATTERNS
    ]
    out = per_class[0]
    for p in per_class[1:]:
        out = out.unionByName(p)
    return out.select(
        "doc_id",
        "pii_class",
        F.col("__s.start").alias("start"),
        F.col("__s.stop").alias("stop"),
    )


def _sql_pii_spans() -> str:
    """Offset replay for :func:`q_pii_spans`: per class, the matches
    and between-segments, then match k's start as the prefix sum
    len(parts[1..k]) + len(matches[1..k-1]) — identical arithmetic to
    the Spark expression."""
    from .functions.text import PII_PATTERNS

    branches = []
    for name, pat, _ in PII_PATTERNS:
        branches.append(
            f"""SELECT doc_id, '{name}' AS pii_class,
       CAST(list_sum(list_transform(ps[1:i], x -> len(x)))
            + coalesce(list_sum(list_transform(ms[1:i-1], x -> len(x))), 0)
            AS BIGINT) AS start,
       CAST(list_sum(list_transform(ps[1:i], x -> len(x)))
            + coalesce(list_sum(list_transform(ms[1:i-1], x -> len(x))), 0)
            + len(ms[i]) AS BIGINT) AS stop
FROM (
  SELECT doc_id, ms, ps, unnest(range(1, len(ms) + 1)) AS i
  FROM (SELECT doc_id, regexp_extract_all(a, '{pat}') AS ms,
               regexp_split_to_array(a, '{pat}') AS ps
        FROM aug)
)"""
        )
    body = "\nUNION ALL\n".join(branches)
    return (
        f"WITH aug AS (\n  SELECT doc_id, a FROM ({_SQL_PII_AUG})\n"
        f"  WHERE doc_id % 3 = 0\n)\n{body}"
    )


def _url_expr():
    """Deterministic synthetic URL per document (the corpus has no URL
    column): subdomain, registered domain from ``source``, and tld all
    keyed off doc_id — replayed verbatim by the oracles."""
    d = F.col("doc_id")
    sub = (
        F.when(d % 3 == 0, F.lit("www."))
        .when(d % 3 == 1, F.lit("cdn."))
        .otherwise(F.lit(""))
    )
    tld = F.when(d % 4 == 0, F.lit(".org")).otherwise(F.lit(".com"))
    return F.concat(
        F.lit("https://"), sub, F.col("source"), tld, F.lit("/p/"),
        d.cast("string"),
    )


_SQL_URL_PARTS = r"""
  SELECT doc_id, n_chars, domain,
         regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host
  FROM (
    SELECT doc_id, n_chars, url,
           array_to_string(sl[greatest(len(sl) - 1, 1):], '.') AS domain
    FROM (
      SELECT doc_id, n_chars, url,
             string_split(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1),
                          '.') AS sl
      FROM (
        SELECT doc_id, n_chars,
               'https://'
               || CASE WHEN doc_id % 3 = 0 THEN 'www.'
                       WHEN doc_id % 3 = 1 THEN 'cdn.' ELSE '' END
               || source
               || CASE WHEN doc_id % 4 = 0 THEN '.org' ELSE '.com' END
               || '/p/' || doc_id::VARCHAR AS url
        FROM documents)))
"""


def q_domain_caps(spark, sf_dir):
    """Per-domain document caps — the anti-SEO-spam / source-balance
    curation gate (operators/curation.py): host + registered-domain
    extraction (pure expressions), then at most 8 docs per domain
    preferring the longest (n_chars DESC, doc_id tiebreak).  Plans as
    ONE shuffle on the domain key with the cap evaluated inside the
    window stage (WindowGroupLimit), so a million-document domain
    never materializes past its top 8."""
    from .operators.curation import domain_caps, extract_url_parts

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    parts = extract_url_parts(docs.withColumn("url", _url_expr()))
    capped = domain_caps(
        parts, 8, [F.col("n_chars").desc(), F.col("doc_id")]
    )
    return capped.select("doc_id", "host", "domain", "domain_rank")


_SQL_DOMAIN_CAPS = rf"""WITH d AS ({_SQL_URL_PARTS})
SELECT doc_id, host, domain, CAST(rn AS INT) AS domain_rank FROM (
  SELECT doc_id, host, domain,
         row_number() OVER (
           PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rn
  FROM d)
WHERE rn <= 8"""


def q_domain_blocklist(spark, sf_dir):
    """Blocklist curation: documents whose registered domain is on a
    (dimension-sized) blocklist are dropped via a broadcast LEFT ANTI
    join — map-side at any corpus size, zero shuffle of the corpus —
    then per-domain survivor stats.  Exact-match contract: 'src1.com'
    blocks only src1's .com documents, not its .org ones."""
    from .operators.curation import blocklist_filter, extract_url_parts

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    parts = extract_url_parts(docs.withColumn("url", _url_expr()))
    kept = blocklist_filter(
        parts, ["src1.com", "src3.com", "src7.org", "src12.com"]
    )
    return kept.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


_SQL_DOMAIN_BLOCKLIST = rf"""WITH d AS ({_SQL_URL_PARTS})
SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM d
WHERE domain NOT IN ('src1.com', 'src3.com', 'src7.org', 'src12.com')
GROUP BY domain"""


def q_span_corrupt(spark, sf_dir):
    """T5-style span-corruption training pairs
    (operators/corruption.py: span_corrupt): per document, the
    sentinel-masked input, the sentinel-delimited target spans, and
    the span/token audit counts.  Every mask decision is a
    portable-hash choice keyed on (salt, doc_id, position) — ONE
    narrow projection, zero shuffles — and the oracle replays the
    start/length decisions, the overlapping-span merge
    (gaps-and-islands), and both serializations verbatim."""
    from .operators.corruption import span_corrupt
    from .sources import ensure_parallelism

    # hash-heavy expression pass over a (possibly) one-file scan —
    # parallelize at the bare scan like the other CPU-bound queries
    docs = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return span_corrupt(docs, start_ppm=100_000, max_span=3)


def _sql_span_corrupt(
    start_ppm: int = 100_000, max_span: int = 3, salt: str = "spancorrupt"
) -> str:
    h1 = _PH60.format(
        x=f"'{salt}|' || doc_id::VARCHAR || '|' || j::VARCHAR"
    )
    h2 = _PH60.format(
        x=f"'{salt}L|' || doc_id::VARCHAR || '|' || j::VARCHAR"
    )
    return rf"""WITH tl AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents
), tok AS (
  SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS j FROM tl
), dec AS (
  SELECT doc_id, j, ts[j] AS tok,
         ({h1} % 1000000) < {start_ppm} AS is_start,
         1 + ({h2} % {max_span}) AS slen
  FROM tok
), m AS (
  SELECT d.doc_id, d.j, d.tok,
         EXISTS (SELECT 1 FROM dec s
                 WHERE s.doc_id = d.doc_id AND s.is_start
                   AND s.j <= d.j AND d.j < s.j + s.slen) AS masked
  FROM dec d
), isl AS (
  SELECT doc_id, j, tok,
         j - row_number() OVER (PARTITION BY doc_id ORDER BY j) AS grp
  FROM m WHERE masked
), isl2 AS (
  SELECT doc_id, j, tok, grp,
         dense_rank() OVER (PARTITION BY doc_id ORDER BY grp) - 1 AS k,
         row_number() OVER (PARTITION BY doc_id, grp ORDER BY j) AS rn
  FROM isl
), corr AS (
  SELECT doc_id, string_agg(piece, ' ' ORDER BY j) AS corrupted FROM (
    SELECT doc_id, j, tok AS piece FROM m WHERE NOT masked
    UNION ALL
    SELECT doc_id, j, '<extra_id_' || k::VARCHAR || '>' FROM isl2
    WHERE rn = 1
  ) GROUP BY doc_id
), tgt AS (
  SELECT doc_id, string_agg(piece, ' ' ORDER BY j) AS targets FROM (
    SELECT doc_id, j,
           CASE WHEN rn = 1
                THEN '<extra_id_' || k::VARCHAR || '> ' || tok
                ELSE tok END AS piece
    FROM isl2
  ) GROUP BY doc_id
), stats AS (
  SELECT doc_id, count(DISTINCT grp) AS n_spans, count(*) AS n_masked
  FROM isl GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(c.corrupted, '') AS corrupted,
       coalesce(g.targets, '') AS targets,
       CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(s.n_masked, 0) AS BIGINT) AS n_masked
FROM tl t LEFT JOIN corr c USING (doc_id)
LEFT JOIN tgt g USING (doc_id)
LEFT JOIN stats s USING (doc_id)"""


def q_fim_split(spark, sf_dir):
    """Fill-in-the-middle training split (operators/corruption.py:
    fim_split): deterministic hash-chosen (prefix, middle, suffix)
    token cut plus the PSM serialization — pure expressions, zero
    shuffles; the oracle recomputes both cut points and all four
    strings."""
    from .operators.corruption import fim_split

    docs = read_table(spark, sf_dir, "documents")
    return fim_split(docs)


def _sql_fim_split(salt: str = "fim") -> str:
    ha = _PH60.format(x=f"'{salt}|' || doc_id::VARCHAR || '|a'")
    hb = _PH60.format(x=f"'{salt}|' || doc_id::VARCHAR || '|b'")
    return rf"""WITH tl AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents
), c AS (
  SELECT doc_id, ts, len(ts) AS n,
         ({ha} % (len(ts) + 1)) AS a
  FROM tl
), c2 AS (
  SELECT doc_id, ts, n, a, a + ({hb} % (n - a + 1)) AS b FROM c
)
SELECT doc_id,
       coalesce(array_to_string(ts[1:a], ' '), '') AS prefix,
       coalesce(array_to_string(ts[a+1:b], ' '), '') AS middle,
       coalesce(array_to_string(ts[b+1:n], ' '), '') AS suffix,
       '<PRE>' || coalesce(array_to_string(ts[1:a], ' '), '')
       || '<SUF>' || coalesce(array_to_string(ts[b+1:n], ' '), '')
       || '<MID>' || coalesce(array_to_string(ts[a+1:b], ' '), '') AS psm
FROM c2"""


def q_domain_quota(spark, sf_dir):
    """Uniform per-domain quota sampling (operators/curation.py:
    domain_quota_sample): ~8 docs kept per registered domain by a
    broadcast per-domain rate + row-local hash threshold — no window,
    no sort; the map-side shape that survives a trillion-document
    crawl.  The oracle replays the count, the integer ppm rate, and
    every hash decision."""
    from .operators.curation import domain_quota_sample, extract_url_parts

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    parts = extract_url_parts(docs.withColumn("url", _url_expr()))
    kept = domain_quota_sample(parts, quota=8)
    return kept.select("doc_id", "domain")


_SQL_DOMAIN_QUOTA = rf"""WITH d AS ({_SQL_URL_PARTS}),
c AS (
  SELECT domain, least(1000000, (8 * 1000000) // count(*)) AS rppm
  FROM d GROUP BY domain
)
SELECT d.doc_id, d.domain
FROM d JOIN c ON d.domain IS NOT DISTINCT FROM c.domain
WHERE ({_PH60.format(x="'domquota|' || doc_id::VARCHAR")} % 1000000)
      < c.rppm"""


def q_clean_text(spark, sf_dir):
    """Crawl-ingest text cleanup (functions/text.py: clean_text):
    deterministic control-char + messy-whitespace noise keyed off
    doc_id is injected, cleaned, and the exact result string verified
    via md5 plus before/after lengths — chained regexp_replace in the
    RE2-compatible subset, byte-replayed by the oracle."""
    from .functions.text import clean_text

    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    noisy = F.concat(
        F.when(d % 2 == 0, F.lit("\t  ")).otherwise(F.lit("")),
        F.col("text"),
        F.when(d % 3 == 0, F.concat(F.lit("\x07zap\x1b"), F.lit("\n\n "))).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("  tail\r\n")).otherwise(F.lit("")),
    )
    base = docs.select("doc_id", noisy.alias("__t"))
    return base.select(
        "doc_id",
        F.length("__t").cast("long").alias("len_before"),
        F.length(clean_text(F.col("__t"))).cast("long").alias("len_after"),
        F.md5(clean_text(F.col("__t"))).alias("clean_md5"),
    )


_SQL_CLEAN_TEXT = r"""WITH noisy AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN chr(9) || '  ' ELSE '' END
         || text
         || CASE WHEN doc_id % 3 = 0
                 THEN chr(7) || 'zap' || chr(27) || chr(10) || chr(10) || ' '
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN '  tail' || chr(13) || chr(10) ELSE '' END AS t
  FROM documents
), cleaned AS (
  SELECT doc_id, t,
         trim(regexp_replace(
           regexp_replace(t, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
           '\s+', ' ', 'g')) AS ct
  FROM noisy
)
SELECT doc_id,
       CAST(length(t) AS BIGINT) AS len_before,
       CAST(length(ct) AS BIGINT) AS len_after,
       md5(ct) AS clean_md5
FROM cleaned"""


def _html_wrap_expr():
    """Deterministic synthetic markup per document (the corpus ships
    extracted text, real crawls ship HTML): title/style/script head, a
    nav bar, an h1 and two body paragraphs cut from the text, an
    ad-looking link block on every 3rd doc, a comment and a footer —
    replayed byte-for-byte by the oracle."""
    d = F.col("doc_id")
    t = F.col("text")
    return F.concat(
        F.lit("<html><head><title>Doc "),
        d.cast("string"),
        F.lit(
            "</title><style>p{color:red}</style>"
            "<script>var x=1;</script></head><body>"
        ),
        F.lit('<nav><a href="/h">home</a> <a href="/a">about</a></nav>'),
        F.lit("<h1>"),
        F.substring(t, 1, 40),
        F.lit("</h1><p>"),
        F.substring(t, 1, 120),
        F.lit(" &amp; tail</p>"),
        F.when(
            d % 3 == 0,
            F.lit('<div><a href="/ad">click here now</a></div>'),
        ).otherwise(F.lit("")),
        F.lit("<p>"),
        F.substring(t, 121, 200),
        F.lit("</p><!-- boilerplate --><footer>"),
        F.lit('<a href="/p">privacy</a> <a href="/t">terms</a>'),
        F.lit("</footer></body></html>"),
    )


def q_html_extract(spark, sf_dir):
    """Crawl-ingest stage ZERO (functions/text.py: html_extract /
    strip_tags / html_blocks): markup synthesized from each document,
    boilerplate-filtered to main text (block split on block-level
    tags, per-block min-length + integer link-density-ppt gates), and
    the exact extracted string verified via md5 against the flat
    tag-strip baseline.  Pure Column expressions in the RE2 subset —
    no Python, byte-replayed by the oracle."""
    from .functions.text import html_blocks, html_extract, strip_tags

    docs = read_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", _html_wrap_expr().alias("__h"))
    h = F.col("__h")
    return base.select(
        "doc_id",
        F.size(html_blocks(h)).cast("long").alias("n_blocks"),
        F.length(strip_tags(h)).cast("long").alias("len_flat"),
        F.length(html_extract(h)).cast("long").alias("len_main"),
        F.md5(html_extract(h)).alias("main_md5"),
    )


def _sql_html_cte(extra_cols: str = "") -> str:
    """The html-extraction replay as a reusable CTE chain (hw → hblk →
    htxt → hmain), GENERATED from the engine's own pattern constants
    (functions/text.py) so the two sides cannot drift — same policy as
    the PII oracle.  ``extra_cols`` (e.g. ``"source, "``) is carried
    through every stage.  hmain outputs: doc_id, extras, n_blocks,
    flat (tag-strip baseline), m (boilerplate-filtered main text)."""
    from .functions.text import (
        _ANCHOR_ELEM_RE,
        _BLOCK_TAG_RE,
        _DROP_ELEM_RES,
        _HTML_ENTITIES,
    )

    drop = "h"
    for pat in _DROP_ELEM_RES:
        drop = f"regexp_replace({drop}, '{pat}', ' ', 'g')"
    ent_tx = "regexp_replace(b, '<[^>]*>', '', 'g')"
    ent_sx = (
        f"regexp_replace(regexp_replace(b, '{_ANCHOR_ELEM_RE}', ' ', 'g'),"
        " '<[^>]*>', '', 'g')"
    )

    def _decode(expr):
        out = expr
        for ent, rep in _HTML_ENTITIES:
            r = rep.replace("'", "''")
            out = f"replace({out}, '{ent}', '{r}')"
        return out

    tx = f"trim(regexp_replace({_decode(ent_tx)}, '\\s+', ' ', 'g'))"
    sx = f"trim(regexp_replace({_decode(ent_sx)}, '\\s+', ' ', 'g'))"
    flat_inner = (
        f"regexp_replace(regexp_replace({drop}, '{_BLOCK_TAG_RE}', ' ', 'g'),"
        " '<[^>]*>', '', 'g')"
    )
    flat = (
        f"trim(regexp_replace({_decode(flat_inner)}, '\\s+', ' ', 'g'))"
    )
    x = extra_cols
    return f"""hw AS (
  SELECT doc_id, {x}
         '<html><head><title>Doc ' || doc_id::VARCHAR
         || '</title><style>p{{color:red}}</style>'
         || '<script>var x=1;</script></head><body>'
         || '<nav><a href="/h">home</a> <a href="/a">about</a></nav>'
         || '<h1>' || substr(text, 1, 40) || '</h1><p>'
         || substr(text, 1, 120) || ' &amp; tail</p>'
         || CASE WHEN doc_id % 3 = 0
                 THEN '<div><a href="/ad">click here now</a></div>'
                 ELSE '' END
         || '<p>' || substr(text, 121, 200)
         || '</p><!-- boilerplate --><footer>'
         || '<a href="/p">privacy</a> <a href="/t">terms</a>'
         || '</footer></body></html>' AS h
  FROM documents
), hblk AS (
  SELECT doc_id, {x} {flat} AS flat,
         list_filter(
           string_split_regex(
             regexp_replace({drop}, '{_BLOCK_TAG_RE}', chr(10), 'g'),
             '\n+'),
           b -> trim(b) <> '') AS bl
  FROM hw
), htxt AS (
  SELECT doc_id, {x} flat,
         len(bl) AS n_blocks,
         list_transform(bl, b -> {tx}) AS tx,
         list_transform(bl, b -> {sx}) AS sx
  FROM hblk
), hmain AS (
  SELECT doc_id, {x} flat, n_blocks,
         coalesce(array_to_string(
           list_transform(
             list_filter(range(1, len(tx) + 1),
               i -> length(tx[i]) >= 20
                    AND (1000 * greatest(length(tx[i]) - length(sx[i]), 0))
                        // length(tx[i]) <= 330),
             i -> tx[i]), chr(10)), '') AS m
  FROM htxt
)"""


def _sql_html_extract() -> str:
    return f"""WITH {_sql_html_cte()}
SELECT doc_id,
       CAST(n_blocks AS BIGINT) AS n_blocks,
       CAST(length(flat) AS BIGINT) AS len_flat,
       CAST(length(m) AS BIGINT) AS len_main,
       md5(m) AS main_md5
FROM hmain"""


def q_url_canonical_dedup(spark, sf_dir):
    """URL-canonicalization dedup (curation.py: canonical_url — RFC
    3986 normalization + tracking-param strip as pure expressions):
    five deterministic messy variants per document (casing, default
    ports, www., trailing slashes, fragments, utm/gclid/fbclid/mc_*
    noise) all collapse to one canonical page key; the dedup is a
    plain groupBy over that key — count per page + the kept (minimum)
    doc_id, with the canonical string itself hashed by the gate.  The
    oracle replays every regex byte-for-byte (generated from the same
    TRACKING_PARAM_RE constant)."""
    from .operators.curation import canonical_url

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    pid = (d % 97).cast("string")
    k = (d % 3).cast("string")
    v = d % 5
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("https://www.src"), k, F.lit(".com:443/p/"),
                pid, F.lit("/?utm_source=a#sec"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("HTTPS://SRC"), k, F.lit(".COM/p/"), pid
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://src"), k, F.lit(".com/p/"), pid,
                F.lit("/?gclid=x&fbclid=y"),
            ),
        )
        .when(
            v == 3,
            F.concat(
                F.lit("https://src"), k, F.lit(".com/p/"), pid,
                F.lit("#top"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://src"), k, F.lit(".com/p/"), pid,
                F.lit("///?utm_campaign=z&mc_cid=1"),
            )
        )
    )
    canon = docs.select("doc_id", canonical_url(url).alias("canon"))
    return canon.groupBy("canon").agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.min("doc_id").alias("keep_doc_id"),
    )


def _sql_url_canonical_dedup() -> str:
    """Oracle generated from the engine's TRACKING_PARAM_RE."""
    from .operators.curation import TRACKING_PARAM_RE

    return f"""WITH u0 AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 0 THEN 'https://www.src' || (doc_id % 3)::VARCHAR
                || '.com:443/p/' || (doc_id % 97)::VARCHAR
                || '/?utm_source=a#sec'
           WHEN 1 THEN 'HTTPS://SRC' || (doc_id % 3)::VARCHAR
                || '.COM/p/' || (doc_id % 97)::VARCHAR
           WHEN 2 THEN 'https://src' || (doc_id % 3)::VARCHAR
                || '.com/p/' || (doc_id % 97)::VARCHAR
                || '/?gclid=x&fbclid=y'
           WHEN 3 THEN 'https://src' || (doc_id % 3)::VARCHAR
                || '.com/p/' || (doc_id % 97)::VARCHAR || '#top'
           ELSE 'https://src' || (doc_id % 3)::VARCHAR
                || '.com/p/' || (doc_id % 97)::VARCHAR
                || '///?utm_campaign=z&mc_cid=1'
         END AS u
  FROM documents
), parts AS (
  SELECT doc_id,
         lower(regexp_extract(uf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         lower(regexp_extract(uf,
           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
         regexp_replace(uf,
           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+', '') AS rest
  FROM (SELECT doc_id, regexp_replace(u, '#.*$', '') AS uf FROM u0)
), norm AS (
  SELECT doc_id, scheme,
         regexp_replace(
           CASE WHEN scheme = 'http'
                THEN regexp_replace(hostport, ':80$', '')
                WHEN scheme = 'https'
                THEN regexp_replace(hostport, ':443$', '')
                ELSE hostport END,
           '^www\.', '') AS host,
         regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '')
           AS path,
         coalesce(array_to_string(
           list_filter(string_split(
               regexp_extract(rest, '\?(.*)$', 1), '&'),
             p -> p <> ''
                  AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')),
           '&'), '') AS qs
  FROM parts
), canon AS (
  SELECT doc_id,
         CASE WHEN scheme <> '' AND host <> ''
              THEN scheme || '://' || host || path
                   || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
         END AS canon
  FROM norm
)
SELECT canon, CAST(count(*) AS BIGINT) AS n_dups,
       min(doc_id) AS keep_doc_id
FROM canon GROUP BY canon"""


def q_sentence_stats(spark, sf_dir):
    """Sentence segmentation (functions/text.py: split_sentences — the
    chunking/packing precursor as a pure RE2-subset expression with an
    abbreviation guard): sentence-shaped text is synthesized from each
    document (capitalized clause cuts + an abbreviation + mixed
    enders), segmented, and the exact sentence array is verified via
    count, total length, and md5 of the joined sentences."""
    from .functions.text import split_sentences

    docs = read_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.lit("Dr. Alpha saw "),
        F.substring("text", 1, 40),
        F.lit(". Then Beta left for "),
        F.substring("text", 41, 30),
        F.lit("! Was it No. 42? It was. The end."),
    )
    s = split_sentences(synth)
    return docs.select(
        "doc_id",
        F.size(s).cast("long").alias("n_sentences"),
        F.length(F.array_join(s, "|")).cast("long").alias("joined_len"),
        F.md5(F.array_join(s, "|")).alias("sent_md5"),
    )


def _sql_sentence_stats() -> str:
    """Oracle generated from the engine's ABBREV_RE (DuckDB replacement
    syntax uses backslash-group refs where Spark uses $-refs)."""
    from .functions.text import ABBREV_RE

    sents = f"""list_filter(
      list_transform(
        string_split(
          regexp_replace(
            regexp_replace(synth, '{ABBREV_RE}', '\\1' || chr(31), 'g'),
            '([.!?])\\s+([A-Z0-9])', '\\1' || chr(30) || '\\2', 'g'),
          chr(30)),
        s -> trim(replace(s, chr(31), '.'))),
      s -> s <> '')"""
    return f"""WITH synth0 AS (
  SELECT doc_id,
         'Dr. Alpha saw ' || substr(text, 1, 40)
         || '. Then Beta left for ' || substr(text, 41, 30)
         || '! Was it No. 42? It was. The end.' AS synth
  FROM documents
), seg AS (
  SELECT doc_id, {sents} AS s FROM synth0
)
SELECT doc_id,
       CAST(len(s) AS BIGINT) AS n_sentences,
       CAST(length(coalesce(array_to_string(s, '|'), ''))
            AS BIGINT) AS joined_len,
       md5(coalesce(array_to_string(s, '|'), '')) AS sent_md5
FROM seg"""


def q_chunk_by_sentences(spark, sf_dir):
    """Sentence-aware greedy chunking (packing.py: chunk_by_sentences
    — split_sentences + an F.aggregate greedy fold + per-chunk
    regroup, all row-local array expressions, zero shuffles): the
    sentence-shaped synthesis from q_sentence_stats packs into
    60-char chunks; the gate hashes every chunk string.  The oracle
    replays the greedy fold with a recursive CTE over sentence
    positions and regroups with an ordered string_agg."""
    from .operators.packing import chunk_by_sentences

    docs = read_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.lit("Dr. Alpha saw "),
        F.substring("text", 1, 40),
        F.lit(". Then Beta left for "),
        F.substring("text", 41, 30),
        F.lit("! Was it No. 42? It was. The end."),
    )
    out = chunk_by_sentences(
        docs.select("doc_id", synth.alias("text")),
        "text",
        max_chars=60,
    )
    return out.select(
        "doc_id", "chunk_idx", "n_sentences",
        F.md5("chunk_text").alias("chunk_md5"),
    )


def _sql_chunk_by_sentences(max_chars: int = 60) -> str:
    from .functions.text import ABBREV_RE

    sents = f"""list_filter(
      list_transform(
        string_split(
          regexp_replace(
            regexp_replace(synth, '{ABBREV_RE}', '\\1' || chr(31), 'g'),
            '([.!?])\\s+([A-Z0-9])', '\\1' || chr(30) || '\\2', 'g'),
          chr(30)),
        s -> trim(replace(s, chr(31), '.'))),
      s -> s <> '')"""
    return f"""WITH RECURSIVE synth0 AS (
  SELECT doc_id,
         'Dr. Alpha saw ' || substr(text, 1, 40)
         || '. Then Beta left for ' || substr(text, 41, 30)
         || '! Was it No. 42? It was. The end.' AS synth
  FROM documents
), seg AS (
  SELECT doc_id, {sents} AS s FROM synth0 WHERE len({sents}) > 0
), st AS (
  SELECT doc_id, 1 AS i, 0 AS idx,
         CAST(length(s[1]) AS BIGINT) AS acc
  FROM seg
  UNION ALL
  SELECT st.doc_id, st.i + 1,
         CASE WHEN st.acc + 1 + length(seg.s[st.i + 1]) > {max_chars}
              THEN st.idx + 1 ELSE st.idx END,
         CASE WHEN st.acc + 1 + length(seg.s[st.i + 1]) > {max_chars}
              THEN CAST(length(seg.s[st.i + 1]) AS BIGINT)
              ELSE st.acc + 1 + length(seg.s[st.i + 1]) END
  FROM st JOIN seg ON st.doc_id = seg.doc_id
  WHERE st.i < len(seg.s)
)
SELECT st.doc_id,
       CAST(st.idx AS BIGINT) AS chunk_idx,
       CAST(count(*) AS BIGINT) AS n_sentences,
       md5(string_agg(seg.s[st.i], ' ' ORDER BY st.i)) AS chunk_md5
FROM st JOIN seg ON st.doc_id = seg.doc_id
GROUP BY st.doc_id, st.idx"""


def q_bpe_merges(spark, sf_dir):
    """Tokenizer training on-cluster: the first 10 BPE merge rules
    learned from the corpus word-frequency table (Sennrich et al.
    2016) — each round a vocabulary-sized pair-count aggregation, the
    corpus touched exactly once.  The oracle replays every round
    unrolled, including the greedy left-to-right merge application."""
    from .operators.bpe import bpe_merges_frame

    docs = read_table(spark, sf_dir, "documents")
    return bpe_merges_frame(docs, n_merges=10)


def _sql_bpe(n_merges: int = 10) -> str:
    """Unrolled replay of learn_bpe_merges: per round, pair counts from
    the packed symbol strings, the (count DESC, lhs, rhs) winner, and
    the literal-replace merge — every symbol is wrapped in the two
    sentinels chr(30)/chr(31), so the replace pattern only matches two
    COMPLETE adjacent symbols, and `replace` scans left-to-right over
    non-overlapping occurrences in both engines, which IS BPE's greedy
    merge order (run merges chain: aaaa -> (aa)(aa))."""
    from .operators.bpe import L as _L, R as _R, _SYM_RE

    sym_re = _SYM_RE.replace("'", "''")
    parts = [
        f"""WITH wt AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents) GROUP BY w
), w0 AS MATERIALIZED (
  SELECT array_to_string(
    list_transform(regexp_extract_all(w, '.'),
                   c -> chr(30) || c || chr(31)), '') AS s, cnt
  FROM wt
)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f""", p{r} AS MATERIALIZED (
  SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS c FROM (
    SELECT unnest(sy[:len(sy) - 1]) AS lhs, unnest(sy[2:]) AS rhs, cnt
    FROM (SELECT regexp_extract_all(s, '{sym_re}', 1) AS sy, cnt
          FROM w{r - 1}))
  GROUP BY lhs, rhs
), m{r} AS MATERIALIZED (
  SELECT {r} AS merge_rank, lhs, rhs, c
  FROM p{r} ORDER BY c DESC, lhs, rhs LIMIT 1
), w{r} AS MATERIALIZED (
  SELECT replace(w.s,
                 chr(30) || m.lhs || chr(31) || chr(30) || m.rhs || chr(31),
                 chr(30) || m.lhs || m.rhs || chr(31)) AS s,
         w.cnt
  FROM w{r - 1} w, m{r} m
)"""
        )
    union = "\n  UNION ALL ".join(
        f"SELECT * FROM m{r}" for r in range(1, n_merges + 1)
    )
    parts.append(
        f"""
SELECT CAST(merge_rank AS BIGINT) AS merge_rank, lhs, rhs,
       c AS pair_count
FROM ({union})"""
    )
    return "".join(parts)


def q_apply_bpe_merges(spark, sf_dir):
    """Tokenizer INFERENCE on-cluster (bpe.py: apply_bpe_merges): the
    10 merges learned by q_bpe_merges' exact procedure are applied to
    every 37th document — per doc, the full token count and the first
    24 tokens.  The application is k literal codegen'd ``replace`` ops
    in rank order over sentinel-packed words (no Python on the data
    path); the oracle replays learning AND application unrolled, so
    the greedy left-to-right merge semantics are cross-engine
    verified."""
    from .operators.bpe import apply_bpe_merges, learn_bpe_merges

    docs = read_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, n_merges=10)
    toks = apply_bpe_merges(F.col("text"), merges)
    return (
        docs.filter(F.col("doc_id") % 37 == 0)
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.concat_ws("|", F.slice(toks, 1, 24)).alias("head_tokens"),
        )
    )


def _sql_apply_bpe(n_merges: int = 10) -> str:
    """Learning chain identical to :func:`_sql_bpe`, then the merges
    applied to the selected documents: per word, sentinel-pack the
    characters and run the same literal replaces in rank order (the
    1-row m{r} CTEs cross-join in; DuckDB lambdas capture the merge
    row's columns)."""
    from .operators.bpe import _SYM_RE

    sym_re = _SYM_RE.replace("'", "''")
    parts = [
        f"""WITH wt AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents) GROUP BY w
), w0 AS MATERIALIZED (
  SELECT array_to_string(
    list_transform(regexp_extract_all(w, '.'),
                   c -> chr(30) || c || chr(31)), '') AS s, cnt
  FROM wt
)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f""", p{r} AS MATERIALIZED (
  SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS c FROM (
    SELECT unnest(sy[:len(sy) - 1]) AS lhs, unnest(sy[2:]) AS rhs, cnt
    FROM (SELECT regexp_extract_all(s, '{sym_re}', 1) AS sy, cnt
          FROM w{r - 1}))
  GROUP BY lhs, rhs
), m{r} AS MATERIALIZED (
  SELECT {r} AS merge_rank, lhs, rhs, c
  FROM p{r} ORDER BY c DESC, lhs, rhs LIMIT 1
), w{r} AS MATERIALIZED (
  SELECT replace(w.s,
                 chr(30) || m.lhs || chr(31) || chr(30) || m.rhs || chr(31),
                 chr(30) || m.lhs || m.rhs || chr(31)) AS s,
         w.cnt
  FROM w{r - 1} w, m{r} m
)"""
        )
    parts.append(
        """, a0 AS (
  SELECT doc_id, list_transform(
    regexp_extract_all(lower(text), '[a-z]+'),
    w -> array_to_string(
      list_transform(regexp_extract_all(w, '.'),
                     c -> chr(30) || c || chr(31)), '')) AS ps
  FROM documents WHERE doc_id % 37 = 0
)"""
    )
    for r in range(1, n_merges + 1):
        parts.append(
            f""", a{r} AS (
  SELECT a.doc_id, list_transform(a.ps, s -> replace(s,
    chr(30) || m.lhs || chr(31) || chr(30) || m.rhs || chr(31),
    chr(30) || m.lhs || m.rhs || chr(31))) AS ps
  FROM a{r - 1} a, m{r} m
)"""
        )
    parts.append(
        f""", toks AS (
  SELECT doc_id, flatten(list_transform(
    ps, s -> regexp_extract_all(s, '{sym_re}', 1))) AS ts
  FROM a{n_merges}
)
SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
       array_to_string(ts[:24], '|') AS head_tokens
FROM toks"""
    )
    return "".join(parts)


def q_apply_bpe_vocab(spark, sf_dir):
    """Tokenizer inference at REAL vocabulary scale (bpe.py:
    bpe_tokenize): 64 deterministic merge rules (synthetic_merges —
    chained multi-char symbols included) applied through the
    Arrow-batched greedy-merge tokenizer, NOT the literal-replace
    expression chain, which cannot carry a production 32k-merge vocab.
    The oracle replays the merges as 64 unrolled literal replaces over
    sentinel-packed words — so the Arrow path's exact equivalence to
    the sequential replace chain is cross-engine verified (and
    property-tested against apply_bpe_merges in pytest)."""
    from .operators.bpe import bpe_tokenize, synthetic_merges
    from .sources import ensure_parallelism

    # parallelize at the bare scan: the Arrow tokenizer is CPU-bound
    # and a small parquet input is otherwise ONE task
    docs = ensure_parallelism(read_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % 29 == 0
    )
    out = bpe_tokenize(docs, synthetic_merges(64))
    return out.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.concat_ws("|", F.slice(F.col("tokens"), 1, 24)).alias("head_tokens"),
    )


def _sql_synthetic_bpe_chain(n_merges: int, where: str = "") -> str:
    """CTE chain ``a0 .. a<n> , toks`` applying the synthetic merge
    constants as unrolled literal replaces over sentinel-packed words
    (no learning CTEs) — DuckDB's ``replace`` scans left-to-right over
    non-overlapping occurrences exactly like the engine's greedy merge
    pass.  Shared by every synthetic-vocab BPE oracle."""
    from .operators.bpe import _SYM_RE, synthetic_merges

    sym_re = _SYM_RE.replace("'", "''")
    parts = [
        f"""WITH a0 AS (
  SELECT doc_id, list_transform(
    regexp_extract_all(lower(text), '[a-z]+'),
    w -> array_to_string(
      list_transform(regexp_extract_all(w, '.'),
                     c -> chr(30) || c || chr(31)), '')) AS ps
  FROM documents {where}
)"""
    ]
    for r, lhs, rhs, _ in synthetic_merges(n_merges):
        pat = f"chr(30) || '{lhs}' || chr(31) || chr(30) || '{rhs}' || chr(31)"
        rep = f"chr(30) || '{lhs}{rhs}' || chr(31)"
        parts.append(
            f""", a{r} AS (
  SELECT doc_id, list_transform(ps, s -> replace(s, {pat}, {rep})) AS ps
  FROM a{r - 1}
)"""
        )
    parts.append(
        f""", toks AS (
  SELECT doc_id, flatten(list_transform(
    ps, s -> regexp_extract_all(s, '{sym_re}', 1))) AS ts
  FROM a{n_merges}
)"""
    )
    return "".join(parts)


def _sql_apply_bpe_vocab(n_merges: int = 64) -> str:
    """Per-doc replay for :func:`q_apply_bpe_vocab` over the shared
    synthetic-merge chain."""
    return (
        _sql_synthetic_bpe_chain(n_merges, "WHERE doc_id % 29 = 0")
        + """
SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
       array_to_string(ts[:24], '|') AS head_tokens
FROM toks"""
    )


def q_bpe_token_counts(spark, sf_dir):
    """Tokenize-and-count — the top-5 pipeline staple the Arrow
    tokenizer unblocks at production vocab sizes: the WHOLE corpus is
    BPE-tokenized (64 synthetic merges, bpe.py: bpe_tokenize) and the
    corpus-level token histogram aggregated, keeping tokens with
    count >= 5.  One Arrow projection + explode + one partial-agged
    groupBy on (token) — the shuffle carries (token, count) pairs
    only, never text.  The oracle replays the full merge chain and
    the histogram."""
    from .operators.bpe import bpe_tokenize, synthetic_merges
    from .sources import ensure_parallelism

    docs = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    toks = bpe_tokenize(docs, synthetic_merges(64))
    return (
        toks.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


def _sql_bpe_token_counts(n_merges: int = 64) -> str:
    return (
        _sql_synthetic_bpe_chain(n_merges)
        + """
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(ts) AS token FROM toks)
GROUP BY token HAVING count(*) >= 5"""
    )


def q_incremental_agg(spark, sf_dir):
    """Materialized-view maintenance: a per-lang (count, sum n_chars)
    aggregate updated from a snapshot diff — drops, edits, group moves
    (lang reassignments) and inserts — WITHOUT rescanning the base.
    The oracle recomputes the aggregate from the perturbed snapshot
    directly: incremental must equal full recompute."""
    from .operators.cdc import incremental_agg_update, snapshot_diff

    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    edited, relabeled = d % 7 == F.lit(2), d % 13 == F.lit(1)
    new = (
        docs.filter(d % 11 != F.lit(3))
        .select(
            "doc_id",
            F.when(relabeled, F.lit("xx")).otherwise(F.col("lang")).alias("lang"),
            (
                F.col("n_chars") + F.when(edited, F.lit(7)).otherwise(F.lit(0))
            ).alias("n_chars"),
        )
        .unionByName(
            docs.filter(d % 13 == F.lit(5)).select(
                (d + F.lit(100000)).alias("doc_id"), "lang", "n_chars"
            )
        )
    )
    state = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("sum_val")
    )
    diff = snapshot_diff(docs, new, "doc_id", compare_cols=("lang", "n_chars"))
    return incremental_agg_update(state, diff, "lang", "n_chars")


_SQL_INCREMENTAL_AGG = r"""WITH newt AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 1 THEN 'xx' ELSE lang END AS lang,
         n_chars + CASE WHEN doc_id % 7 = 2 THEN 7 ELSE 0 END AS n_chars
  FROM documents WHERE doc_id % 11 <> 3
  UNION ALL
  SELECT doc_id + 100000, lang, n_chars FROM documents WHERE doc_id % 13 = 5
)
SELECT lang, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_chars) AS BIGINT) AS sum_val
FROM newt GROUP BY lang"""


def q_triangle_counts(spark, sf_dir):
    """Per-vertex triangle participation over the MinHash duplicate-
    pair graph (degree-ordered node-iterator — each triangle
    materializes once, hub fan-out bounded by the orientation).  The
    structural-vs-noise signal on near-dup clusters."""
    from .operators.graph import triangle_counts

    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=8, portable=True)
    return triangle_counts(pairs)


def _sql_triangles() -> str:
    base = _sql_minhash_pairs(num_hashes=32, bands=8, k=3, threshold=0.0)
    return f"""WITH mh AS MATERIALIZED ({base}),
e AS MATERIALIZED (
  SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
  FROM mh WHERE id_a <> id_b
), deg AS (
  SELECT x, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x
),
o AS MATERIALIZED (
  SELECT CASE WHEN (ka.d, ka.x) < (kb.d, kb.x) THEN e.u ELSE e.v END AS s,
         CASE WHEN (ka.d, ka.x) < (kb.d, kb.x) THEN e.v ELSE e.u END AS t,
         CASE WHEN (ka.d, ka.x) < (kb.d, kb.x)
              THEN struct_pack(d := kb.d, i := kb.x)
              ELSE struct_pack(d := ka.d, i := ka.x) END AS kt
  FROM e JOIN deg ka ON e.u = ka.x JOIN deg kb ON e.v = kb.x
), tri AS (
  SELECT e1.s AS x, e1.t AS y, e2.t AS z
  FROM o e1 JOIN o e2 ON e1.s = e2.s AND e1.kt < e2.kt
  JOIN o e3 ON e3.s = e1.t AND e3.t = e2.t
)
SELECT v, CAST(count(*) AS BIGINT) AS n_triangles FROM (
  SELECT x AS v FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri) GROUP BY v"""


def q_clustering_coefficient(spark, sf_dir):
    """Per-vertex local clustering coefficient over the MinHash
    duplicate-pair graph (graph.py: clustering_coefficient):
    2T/(d(d-1)) in exact ppm floor arithmetic — separates structural
    duplicate cliques (→1e6) from chain-like accidental similarity
    (→0).  Same O(m^1.5) oriented wedge pass as q_triangle_counts plus
    one degree join."""
    from .operators.graph import clustering_coefficient

    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=8, portable=True)
    return clustering_coefficient(pairs)


def _sql_clustering_coefficient() -> str:
    base = _sql_minhash_pairs(num_hashes=32, bands=8, k=3, threshold=0.0)
    return f"""WITH mh AS MATERIALIZED ({base}),
e AS MATERIALIZED (
  SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
  FROM mh WHERE id_a <> id_b
), deg AS (
  SELECT x, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x
),
o AS MATERIALIZED (
  SELECT CASE WHEN (ka.d, ka.x) < (kb.d, kb.x) THEN e.u ELSE e.v END AS s,
         CASE WHEN (ka.d, ka.x) < (kb.d, kb.x) THEN e.v ELSE e.u END AS t,
         CASE WHEN (ka.d, ka.x) < (kb.d, kb.x)
              THEN struct_pack(d := kb.d, i := kb.x)
              ELSE struct_pack(d := ka.d, i := ka.x) END AS kt
  FROM e JOIN deg ka ON e.u = ka.x JOIN deg kb ON e.v = kb.x
), tri AS (
  SELECT e1.s AS x, e1.t AS y, e2.t AS z
  FROM o e1 JOIN o e2 ON e1.s = e2.s AND e1.kt < e2.kt
  JOIN o e3 ON e3.s = e1.t AND e3.t = e2.t
), nt AS (
  SELECT v, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT x AS v FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri) GROUP BY v
)
SELECT deg.x AS v, deg.d,
       coalesce(nt.n_triangles, 0)::BIGINT AS n_triangles,
       CAST(2 * coalesce(nt.n_triangles, 0) * 1000000
            // (deg.d * (deg.d - 1)) AS BIGINT) AS coeff_ppm
FROM deg LEFT JOIN nt ON nt.v = deg.x
WHERE deg.d >= 2"""


def q_k_core(spark, sf_dir):
    """2-core of the MinHash duplicate-pair graph at a FIXED peel
    count (rounds=6, at/above the sf0.01 peel depth): strips pendant
    and chain-like accidental similarity, keeping only vertices with
    >= 2 surviving neighbors — the cheap densest-region filter below
    triangles.  Fixed rounds make the operator a pure function of the
    input; the oracle unrolls the same 6 peels (the pagerank replay
    strategy)."""
    from .operators.graph import k_core

    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=32, bands=8, portable=True)
    return k_core(pairs, k=2, rounds=6)


def _sql_k_core(k: int = 2, rounds: int = 6) -> str:
    base = _sql_minhash_pairs(num_hashes=32, bands=8, k=3, threshold=0.0)
    parts = [
        f"""mh AS MATERIALIZED ({base}),
u0 AS MATERIALIZED (
  SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
  FROM mh WHERE id_a <> id_b
), s0 AS (
  SELECT a, b FROM u0 UNION ALL SELECT b, a FROM u0
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""v{i} AS (
  SELECT a FROM s{i - 1} GROUP BY a HAVING count(*) >= {k}
), s{i} AS (
  SELECT s.a, s.b FROM s{i - 1} s
  JOIN v{i} va ON s.a = va.a JOIN v{i} vb ON s.b = vb.a)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT a AS v, CAST(count(*) AS BIGINT) AS deg
FROM s{rounds} GROUP BY a"""
    )


def q_kmv_overlap(spark, sf_dir):
    """Join-cardinality estimation without running the join: KMV
    bottom-256 sketches of orders.o_custkey vs customer.c_custkey —
    union / Jaccard / intersection estimates in pure bigint, one
    distinct+take-k pass per side."""
    from .operators.sampling import kmv_overlap_estimate

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    return kmv_overlap_estimate(
        orders.select(F.col("o_custkey").alias("k")),
        cust.select(F.col("c_custkey").alias("k")),
        "k",
        k=256,
    )


_SQL_KMV_OVERLAP = r"""WITH ha AS (
  SELECT DISTINCT
    (('0x' || substr(md5(o_custkey::VARCHAR), 1, 15))::BIGINT // 128) AS h
  FROM orders ORDER BY h LIMIT 256
), hb AS (
  SELECT DISTINCT
    (('0x' || substr(md5(c_custkey::VARCHAR), 1, 15))::BIGINT // 128) AS h
  FROM customer ORDER BY h LIMIT 256
), u AS (
  SELECT DISTINCT h FROM (
    SELECT h FROM ha UNION ALL SELECT h FROM hb) ORDER BY h LIMIT 256
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_bottom, max(u.h) AS hk,
         CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS nboth
  FROM u LEFT JOIN ha a ON u.h = a.h LEFT JOIN hb b ON u.h = b.h
), pre AS (
  SELECT n_bottom,
         CAST(CASE WHEN n_bottom < 256 THEN n_bottom
              ELSE (255 * 9007199254740992) // hk END AS BIGINT) AS union_est,
         CAST((nboth * 1000000) // n_bottom AS BIGINT) AS jaccard_ppm
  FROM agg)
SELECT n_bottom, union_est, jaccard_ppm,
       CAST((union_est * jaccard_ppm) // 1000000 AS BIGINT) AS intersect_est
FROM pre"""


def q_hampel_despike(spark, sf_dir):
    """Biosignal despiking: Hampel filter (rolling lower-median ±
    4.4478·MAD, exact bigint fixed-point) per user over the event
    value stream — robust outlier repair where mean±σ is dragged by
    the spike itself."""
    from .operators.timeseries import hampel_despike

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 1000000).cast("long").alias("x"),
    )
    return hampel_despike(
        ev, "x", ts_col="ts", by="user_id", order_tiebreak="event_id"
    )


_SQL_HAMPEL = r"""WITH e AS (
  SELECT user_id, epoch_ns(ts) AS ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS x
  FROM events
), f AS (
  SELECT user_id, ts, x, list_sort(list(x) OVER w) AS vals
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), m AS (
  SELECT user_id, ts, x, vals, vals[(len(vals) + 1) // 2] AS med FROM f
), d AS (
  SELECT user_id, ts, x, med,
         list_sort(list_transform(vals, v -> abs(v - med)))
           [(len(vals) + 1) // 2] AS mad
  FROM m
)
SELECT user_id, ts, x, med, mad,
       (abs(x - med) * 10000 > 44478 * mad) AS is_spike,
       CASE WHEN abs(x - med) * 10000 > 44478 * mad THEN med ELSE x END
         AS cleaned
FROM d"""


def q_ewma(spark, sf_dir):
    """Per-user EWMA baseline (alpha=1/8) over the event value stream
    in exact integer recursion with true FLOOR rounding — the scan's
    per-step floor is non-linear, so this is a sanctioned Arrow
    operator with a recursive-CTE replay oracle."""
    from .operators.timeseries import ewma

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 1000000).cast("long").alias("x"),
    )
    return ewma(ev, "x", ts_col="ts", by="user_id", order_tiebreak="event_id")


_SQL_EWMA = r"""WITH RECURSIVE e AS (
  SELECT user_id, epoch_ns(ts) AS ts,
         CAST(round(value * 1000000) AS BIGINT) AS x,
         CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
           AS BIGINT) AS rn
  FROM events
), r AS (
  SELECT user_id, rn, ts, x, x AS ew FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.ts, e.x,
         -- floor division via nonneg pmod: ((d % 8 + 8) % 8) makes the
         -- numerator divisible, so integer division is exact floor
         r.ew + ((e.x - r.ew) - (((e.x - r.ew) % 8 + 8) % 8)) // 8
  FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT user_id, ts, x, CAST(ew AS BIGINT) AS ewma FROM r"""


def q_resample_interp(spark, sf_dir):
    """Linear-interpolation resampling of the per-user value stream
    onto the 12h grid (exact integer blend, floor rounding for
    negative slopes, nulls outside support) — the between-samples
    counterpart of q_resample_locf, oracle via DuckDB ASOF joins in
    both directions."""
    from .operators.timeseries import resample_interp

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.round(F.col("value") * 1000000).cast("long").alias("x"),
    )
    return resample_interp(
        ev, "x", on="ts", step=_LOCF_STEP_NS, by="user_id"
    )


_SQL_RESAMPLE_INTERP = f"""WITH ev AS (
  SELECT user_id, epoch_ns(ts) AS t,
         CAST(round(value * 1000000) AS BIGINT) AS x
  FROM events
), o AS (
  SELECT user_id, t, max(x) AS x FROM ev GROUP BY 1, 2
), bnd AS (
  SELECT user_id, min(t) AS lo, max(t) AS hi FROM o GROUP BY 1
), g AS (
  SELECT user_id,
         unnest(range(lo - lo % {_LOCF_STEP_NS},
                      hi - hi % {_LOCF_STEP_NS} + 1,
                      {_LOCF_STEP_NS})) AS gt
  FROM bnd
), bk AS (
  SELECT g.user_id, g.gt, o.t AS tp, o.x AS xp
  FROM g ASOF LEFT JOIN o ON g.user_id = o.user_id AND g.gt >= o.t
), fw AS (
  SELECT g.user_id, g.gt, o.t AS tn, o.x AS xn
  FROM g ASOF LEFT JOIN o ON g.user_id = o.user_id AND g.gt <= o.t
), j AS (
  SELECT bk.user_id, bk.gt, tp, xp, tn, xn,
         CASE WHEN tp IS NULL OR tn IS NULL OR tn = tp THEN 0
              ELSE ((bk.gt - tp) * 1000) // (tn - tp) END AS r
  FROM bk JOIN fw ON bk.user_id = fw.user_id AND bk.gt = fw.gt
), p AS (
  SELECT user_id, gt, tp, tn, xp, xn, (xn - xp) * r AS prod FROM j
)
SELECT user_id, gt AS ts, tp AS t_prev, tn AS t_next,
       CAST(CASE WHEN tp IS NULL OR tn IS NULL THEN NULL
            WHEN tn = tp THEN xp
            ELSE xp + (prod - ((prod % 1000 + 1000) % 1000)) // 1000
       END AS BIGINT) AS interp
FROM p"""


_CUSUM_T = 35_000_000  # target 35.0 (~the value median), 1e6 fixed point
_CUSUM_K = 10_000_000  # slack 10.0
_CUSUM_H = 200_000_000  # alarm threshold: 200.0 cumulative excess


def q_cusum(spark, sf_dir):
    """Two-sided CUSUM level-shift detection per user over the value
    stream (Page's test, exact integer recursion with post-alarm
    resets) — recursive-CTE replay oracle like q_ewma."""
    from .operators.timeseries import cusum_changepoints

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 1000000).cast("long").alias("x"),
    )
    return cusum_changepoints(
        ev,
        "x",
        target=_CUSUM_T,
        slack=_CUSUM_K,
        threshold=_CUSUM_H,
        ts_col="ts",
        by="user_id",
        order_tiebreak="event_id",
    )


def _sql_cusum(t: int, k: int, h: int) -> str:
    up = f"greatest(0, r.c_hi + e.x - {t} - {k})"
    dn = f"greatest(0, r.c_lo + {t} - e.x - {k})"
    up0 = f"greatest(0, x - {t} - {k})"
    dn0 = f"greatest(0, {t} - x - {k})"
    return f"""WITH RECURSIVE e AS (
  SELECT user_id, epoch_ns(ts) AS ts,
         CAST(round(value * 1000000) AS BIGINT) AS x,
         CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
           AS BIGINT) AS rn
  FROM events
), r AS (
  SELECT user_id, rn, ts, x,
         {up0} AS s_hi, {dn0} AS s_lo,
         ({up0} > {h} OR {dn0} > {h}) AS alarm,
         CASE WHEN {up0} > {h} OR {dn0} > {h} THEN 0 ELSE {up0} END AS c_hi,
         CASE WHEN {up0} > {h} OR {dn0} > {h} THEN 0 ELSE {dn0} END AS c_lo
  FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.ts, e.x,
         {up}, {dn},
         ({up} > {h} OR {dn} > {h}),
         CASE WHEN {up} > {h} OR {dn} > {h} THEN 0 ELSE {up} END,
         CASE WHEN {up} > {h} OR {dn} > {h} THEN 0 ELSE {dn} END
  FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT user_id, ts, x, CAST(s_hi AS BIGINT) AS s_hi,
       CAST(s_lo AS BIGINT) AS s_lo, alarm
FROM r"""


def q_stream_cusum(spark, sf_dir):
    """Streaming CUSUM in batch-batch mode (delegates to the batch
    recursion — the two operators are parity-tested across real
    micro-batch boundaries in tests/test_streaming.py); shares
    q_cusum's recursive-CTE oracle."""
    from .streaming import stream_cusum

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 1000000).cast("long").alias("x"),
    )
    out = stream_cusum(
        ev,
        "x",
        target=_CUSUM_T,
        slack=_CUSUM_K,
        threshold=_CUSUM_H,
        ts_col="ts",
        by="user_id",
        order_tiebreak="event_id",
    )
    return out.select("user_id", "ts", "x", "s_hi", "s_lo", "alarm")


def q_curation_report(spark, sf_dir):
    """Per-source curation dashboard: how many documents each quality
    gate would drop (unknown language, low quality score, repetition,
    too short) and how many pass all gates — ONE codegen'd pass over
    the corpus, conditional aggregation only, the triage view a data
    team reads before committing a 100 TB filtering run."""
    from .functions.text import (
        lang_id,
        quality_score,
        repetition_score,
        token_count,
    )

    docs = read_table(spark, sf_dir, "documents")
    q = F.round(quality_score(F.col("text")), 6)
    rep = F.round(repetition_score(F.col("text"), 3), 6)
    und = lang_id(F.col("text")) == F.lit("und")
    tc = token_count(F.col("text")).cast("long")

    def n(c):
        return F.sum(c.cast("long"))

    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        n(und).alias("n_lang_unknown"),
        n(q < 0.5).alias("n_low_quality"),
        n(rep > 0.2).alias("n_repetitive"),
        n(tc < 10).alias("n_short"),
        n(~und & (q >= 0.5) & (rep <= 0.2) & (tc >= 10)).alias("n_pass"),
    )


def _sql_curation() -> str:
    from .functions.text import LANG_SIGNALS

    scores = ", ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lang}"
        for lang, pat in LANG_SIGNALS.items()
    )
    best = "greatest(" + ", ".join(f"s_{l}" for l in LANG_SIGNALS) + ")"
    return rf"""WITH m AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
         CAST(len(list_distinct(regexp_extract_all(text, '\S+')))
              AS DOUBLE) AS n_uniq,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS n_punct,
         CAST(length(text) AS DOUBLE) AS n_chars,
         regexp_extract_all(text, '\S+') AS tl,
         {scores}
  FROM documents
), sh AS (
  SELECT *, CASE WHEN len(tl) < 3 THEN [array_to_string(tl, ' ')]
       ELSE list_transform(range(1, len(tl) - 1),
                           i -> array_to_string(tl[i:i+2], ' ')) END AS sl
  FROM m
), d AS (
  SELECT source,
         round((CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.5 END)
             * (CASE WHEN n_punct / greatest(n_chars, 1.0) < 0.2
                     THEN 1.0 ELSE 0.6 END)
             * (n_uniq / greatest(n_tok, 1.0)), 6) AS quality,
         round(1.0 - CAST(len(list_distinct(sl)) AS DOUBLE)
                     / CAST(len(sl) AS DOUBLE), 6) AS rep,
         ({best} = 0) AS und,
         CAST(n_tok AS BIGINT) AS tc
  FROM sh
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN und THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lang_unknown,
       CAST(sum(CASE WHEN quality < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_quality,
       CAST(sum(CASE WHEN rep > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repetitive,
       CAST(sum(CASE WHEN tc < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       CAST(sum(CASE WHEN NOT und AND quality >= 0.5 AND rep <= 0.2
                     AND tc >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM d GROUP BY source"""


def q_oov_rate(spark, sf_dir):
    """Tokenizer-eval staple: per-document out-of-vocabulary fraction
    against the frequency-ranked top-1000 vocabulary (integer ppm) —
    the vocabulary table is tiny and BROADCAST; the corpus-side pass
    is one explode + one broadcast join + one per-doc agg.

    The top-1000 cut is ``orderBy().limit()`` — Spark plans it as
    TakeOrderedAndProject (per-partition partial top-k, driver merge
    of k-row heaps), never a global window over the full vocabulary."""
    from .functions.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        tf.orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(1000)
        .select("term", F.lit(True).alias("__in_v"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("__in_v").isNull().cast("long")).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.expr("(n_oov * 1000000) DIV n_tokens").alias("oov_ppm"),
        )
    )


_SQL_OOV = r"""WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
), tf AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
vocab AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY cnt DESC, term) AS r FROM tf)
  WHERE r <= 1000
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST((sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS oov_ppm
FROM toks t LEFT JOIN vocab v ON t.term = v.term
GROUP BY doc_id"""


def q_coverage_select(spark, sf_dir):
    """Greedy maximum-coverage selection of 5 documents (submodular
    (1-1/e) greedy — the diverse seed/eval-set builder): each round an
    anti-join against the covered-token set + one TakeOrdered; the
    oracle replays all rounds unrolled."""
    from .operators.sampling import greedy_coverage_select

    docs = read_table(spark, sf_dir, "documents")
    return greedy_coverage_select(docs, k=5)


def _sql_coverage(k: int = 5) -> str:
    parts = [
        r"""WITH tl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tl
  FROM documents
), t AS MATERIALIZED (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           ('0x' || substr(md5(
             unnest(CASE WHEN len(tl) < 3 THEN [array_to_string(tl, ' ')]
                  ELSE list_transform(range(1, len(tl) - 1),
                                      i -> array_to_string(tl[i:i+2], ' '))
                  END)), 1, 15))::BIGINT AS term
    FROM tl)
), c0 AS (SELECT term FROM t WHERE 1 = 0)"""
    ]
    for r in range(1, k + 1):
        parts.append(
            f""", g{r} AS MATERIALIZED (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM t ANTI JOIN c{r - 1} USING (term)
  GROUP BY doc_id
), w{r} AS MATERIALIZED (
  SELECT {r} AS sel_rank, doc_id, gain
  FROM g{r} ORDER BY gain DESC, doc_id LIMIT 1
), c{r} AS MATERIALIZED (
  SELECT term FROM c{r - 1}
  UNION SELECT t.term FROM t JOIN w{r} USING (doc_id)
)"""
        )
    union = "\n  UNION ALL ".join(
        f"SELECT * FROM w{r}" for r in range(1, k + 1)
    )
    parts.append(
        f"""
SELECT CAST(sel_rank AS BIGINT) AS sel_rank, doc_id, gain FROM ({union})"""
    )
    return "".join(parts)


def q_semantic_clusters(spark, sf_dir):
    """Semantic duplicate CLUSTERS: within-cell cosine pairs from the
    k-means blocking (semantic_dup_pairs) fed into connected
    components — paraphrase-level cluster discovery; the oracle
    replays k-means bit-for-bit and recomputes reachability with a
    recursive CTE."""
    from .operators.dedup import connected_components
    from .operators.similarity import semantic_dup_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    pairs = semantic_dup_pairs(emb, n_centroids=16, threshold=0.4)
    comp = connected_components(pairs)
    return comp.select(
        F.col("v").cast("long").alias("vec_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def _sql_semantic_pairs(n_centroids: int = 16, threshold: float = 0.4) -> str:
    """Full query: semantic near-dup pairs (id_a < id_b) — the SQL twin
    of semantic_dup_pairs, embeddable as a subquery."""
    prefix, _ = _sql_kmeans_cor(n_centroids)
    return prefix + f"""
SELECT b.n_id AS id_a, a.n_id AS id_b
FROM cor a JOIN cor b ON a.cell = b.cell AND b.n_id < a.n_id
WHERE CAST(list_dot_product(a.cv, b.cv) AS DOUBLE)
      / sqrt(CAST(a.cn AS DOUBLE) * CAST(b.cn AS DOUBLE)) >= {threshold!r}"""


_SQL_REACH_TAIL = """, ed AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pr
  UNION
  SELECT id_b AS a, id_a AS b FROM pr
), reach(v, r) AS (
  SELECT a, a FROM ed
  UNION
  SELECT reach.v, ed.b FROM reach JOIN ed ON reach.r = ed.a
)
SELECT CAST(v AS BIGINT) AS vec_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY v"""


def _sql_semantic_clusters(n_centroids: int = 16, threshold: float = 0.4) -> str:
    return (
        f"""WITH RECURSIVE pr AS MATERIALIZED (
{_sql_semantic_pairs(n_centroids, threshold)})"""
        + _SQL_REACH_TAIL
    )


def _sql_hybrid_clusters(n_centroids: int = 16, threshold: float = 0.4) -> str:
    """Lexical (MinHash) and semantic (k-means cell) pair generators
    unioned into one reachability computation."""
    lex = _sql_minhash_pairs(num_hashes=32, bands=8, k=3, threshold=0.0)
    sem = _sql_semantic_pairs(n_centroids, threshold)
    return (
        f"""WITH RECURSIVE lex AS MATERIALIZED (
  SELECT id_a, id_b FROM ({lex})
), sem AS MATERIALIZED (
{sem}), pr AS MATERIALIZED (
  SELECT id_a, id_b FROM lex UNION SELECT id_a, id_b FROM sem
)"""
        + _SQL_REACH_TAIL
    )


def q_hybrid_dedup_clusters(spark, sf_dir):
    """Hybrid duplicate clustering: verbatim near-dups (MinHash over
    text) and paraphrase near-dups (k-means-blocked cosine over
    embeddings) unioned into ONE edge list before connected components
    — the production dedup shape where neither signal alone suffices.
    Both generators and the reachability are deterministic, so one
    oracle replays the whole composition."""
    from .operators.dedup import connected_components
    from .operators.similarity import semantic_dup_pairs

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    lex = minhash_lsh_pairs(docs, num_hashes=32, bands=8, portable=True).select(
        "id_a", "id_b"
    )
    sem = semantic_dup_pairs(emb, n_centroids=16, threshold=0.4)
    pairs = lex.unionByName(sem).distinct()
    comp = connected_components(pairs)
    return comp.select(
        F.col("v").cast("long").alias("vec_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def q_stream_hampel(spark, sf_dir):
    """Streaming Hampel in batch-batch mode (delegates to the batch
    operator; the streaming path is parity-tested across real
    micro-batch boundaries in tests/test_streaming.py); shares
    q_hampel_despike's oracle."""
    from .streaming import stream_hampel

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 1000000).cast("long").alias("x"),
    )
    return stream_hampel(
        ev, "x", ts_col="ts", by="user_id", order_tiebreak="event_id"
    )


def q_pack_stats(spark, sf_dir):
    """Per-chunk fill report over the packed corpus: documents/tokens
    per 1024-token context window and the fill ratio — the packing
    efficiency dashboard (fill > 1 marks chunks a long document spills
    out of)."""
    from .operators.packing import pack_sequences, pack_stats

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    packed = pack_sequences(
        docs, budget=_PACK_BUDGET, tokens_col="n_tokens", order_col="doc_id"
    )
    st = pack_stats(packed, budget=_PACK_BUDGET)
    return st.select(
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "n_docs",
        "n_tokens",
        F.round("fill_ratio", 6).alias("fill_ratio"),
    )


_SQL_PACK_STATS = rf"""WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM t
), p AS (
  SELECT CAST(s // {_PACK_BUDGET} AS BIGINT) AS chunk_id, n_tokens FROM c)
SELECT chunk_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE)
             / {float(_PACK_BUDGET)!r}, 6) AS fill_ratio
FROM p GROUP BY chunk_id"""


_HIST_LO, _HIST_HI, _HIST_NB = 0, 100_000, 10


def q_histogram_windows(spark, sf_dir):
    """Windowed equi-width histogram (timeseries.py: histogram_windows
    — the TimescaleDB ``histogram(value, lo, hi, nbuckets)`` aggregate
    over the stabbing join): per (event_type, window, bucket), the
    sample count, with TimescaleDB's nbuckets+2 layout (bucket 0 =
    underflow, nbuckets+1 = overflow, interior via exact integer
    ``(v-lo)*nb DIV (hi-lo)``).  Sparse — empty buckets are absent.
    The oracle replays the fixed-point projection, the stab
    containment, and the integer bucket formula."""
    from .operators.timeseries import histogram_windows

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 1_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = histogram_windows(
        ev, w, "v_fx", _HIST_LO, _HIST_HI, _HIST_NB,
        ts_col="ts", by="event_type",
    )
    return out.select("event_type", "widx", "bucket", "n")


_SQL_HISTOGRAM_WINDOWS = f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT event_type, epoch_ns(ts) AS t,
         CAST(round(value * 1000) AS BIGINT) AS v
  FROM events
), j AS (
  SELECT ev.event_type, w.widx,
         CASE WHEN ev.v < {_HIST_LO} THEN 0
              WHEN ev.v >= {_HIST_HI} THEN {_HIST_NB + 1}
              ELSE 1 + ((ev.v - {_HIST_LO})::HUGEINT * {_HIST_NB}
                        // ({_HIST_HI - _HIST_LO})::HUGEINT) END AS bucket
  FROM ev JOIN w ON w.w_start <= ev.t AND ev.t < w.w_stop
)
SELECT event_type, widx, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM j GROUP BY event_type, widx, bucket"""


def q_stream_histogram_windows(spark, sf_dir):
    """The STREAMING histogram twin in batch mode (streaming.py:
    stream_histogram_windows — bucket counts are the mergeable sink
    state, the stream is the stateless bucket projection + broadcast
    stab join; file-stream parity pytest-gated).  Batch inputs
    delegate to histogram_windows; shares its oracle."""
    from .streaming import stream_histogram_windows

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 1_000).cast("long").alias("v_fx"),
    )
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stream_histogram_windows(
        ev, w, "v_fx", _HIST_LO, _HIST_HI, _HIST_NB,
        ts_col="ts", by="event_type",
    )
    return out.select("event_type", "widx", "bucket", "n")


_ACF_MAX_LAG = 4


def q_acf(spark, sf_dir):
    """Row-lag autocorrelation ACF(1..4) per event_type (timeseries.py:
    autocorrelation — the correlogram staple): Pearson correlation of
    the (ts, event_id)-ordered fixed-point value series against its
    k-row-lagged self, from EXACT DECIMAL(38,0) moment sums combined
    in one fixed-order double formula.  The oracle replays the lag
    window per k, the pair filter, the HUGEINT moments, and the
    identical formula."""
    from .operators.timeseries import autocorrelation

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000).cast("long").alias("v_fx"),
    )
    out = autocorrelation(
        ev, "v_fx", _ACF_MAX_LAG, ts_col="ts",
        by="event_type", order=["event_id"],
    )
    return out.select("event_type", "lag", "n", "acf")


def q_acf_chunked(spark, sf_dir):
    """The DISTRIBUTED-RANK ACF path (timeseries.py: autocorrelation
    with chunk_ns — chunk-local row numbers + prefix-offset cumsum +
    hash-parallel rank-lag self-join, parallelism = #chunks instead of
    #keys): bit-identical to q_acf by construction, gated against the
    SAME oracle to prove it."""
    from .operators.timeseries import autocorrelation

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1_000).cast("long").alias("v_fx"),
    )
    out = autocorrelation(
        ev, "v_fx", _ACF_MAX_LAG, ts_col="ts",
        by="event_type", order=["event_id"],
        chunk_ns=6 * 3_600 * 1_000_000_000,
    )
    return out.select("event_type", "lag", "n", "acf")


def _sql_acf() -> str:
    lagged = "\n  UNION ALL\n".join(
        f"""  SELECT event_type, CAST({k} AS BIGINT) AS lag, x,
         lag(x, {k}) OVER (PARTITION BY event_type
                           ORDER BY t, event_id) AS y FROM ev"""
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    return f"""WITH ev AS (
  SELECT event_type, epoch_ns(ts) AS t, event_id,
         CAST(round(value * 1000) AS BIGINT) AS x
  FROM events
), l AS (
{lagged}
), p AS (SELECT * FROM l WHERE y IS NOT NULL),
s AS (
  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
         sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         sum(x::HUGEINT * y::HUGEINT) AS sxy,
         sum(x::HUGEINT * x::HUGEINT) AS sx2,
         sum(y::HUGEINT * y::HUGEINT) AS sy2
  FROM p GROUP BY event_type, lag
)
SELECT event_type, lag, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0), 6)
         AS acf
FROM s"""


_SEASON_BUCKET_NS = 3_600 * 1_000_000_000
_SEASON_PERIOD_NS = 24 * _SEASON_BUCKET_NS


def q_seasonal_anomaly(spark, sf_dir):
    """Hour-of-day seasonal baseline anomalies (timeseries.py:
    seasonal_anomaly_counts): per (event_type, hour-of-day), the
    sample count, the exact truncated fixed-point mean, and the count
    of samples beyond 2σ of THEIR hour's baseline — the z-test is
    ENTIRELY exact integers ((n·x−Σx)² > z²·(n·Σx²−Σx²) in HUGEINT),
    so the hash can never drift.  The oracle replays the pmod season
    fold, the moment sums, and the integer test."""
    from .operators.timeseries import seasonal_anomaly_counts

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 1_000).cast("long").alias("v_fx"),
    )
    out = seasonal_anomaly_counts(
        ev, "v_fx", _SEASON_PERIOD_NS, _SEASON_BUCKET_NS,
        ts_col="ts", by="event_type", z=2,
    )
    return out.select("event_type", "season", "n", "mu_fp6", "n_anomalies")


_SQL_SEASONAL_ANOMALY = f"""WITH ev AS (
  SELECT event_type,
         (((((epoch_ns(ts) - ((epoch_ns(ts) % {_SEASON_BUCKET_NS}
              + {_SEASON_BUCKET_NS}) % {_SEASON_BUCKET_NS}))
            // {_SEASON_BUCKET_NS}) % 24) + 24) % 24) AS season,
         CAST(round(value * 1000) AS BIGINT) AS x
  FROM events
), s AS (
  SELECT event_type, season, CAST(count(*) AS BIGINT) AS n,
         sum(x::HUGEINT) AS sx, sum(x::HUGEINT * x::HUGEINT) AS sx2
  FROM ev GROUP BY event_type, season
)
SELECT s.event_type, CAST(s.season AS BIGINT) AS season, s.n,
       CAST(s.sx * 1000000 // s.n AS BIGINT) AS mu_fp6,
       CAST(sum(CASE WHEN (s.n::HUGEINT * ev.x::HUGEINT - s.sx)
                          * (s.n::HUGEINT * ev.x::HUGEINT - s.sx)
                     > 4 * (s.n::HUGEINT * s.sx2 - s.sx * s.sx)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM ev JOIN s USING (event_type, season)
GROUP BY s.event_type, s.season, s.n, s.sx"""


_TSPLIT_B1 = 1_704_931_200 * 1_000_000_000  # 2024-01-11T00:00Z in ns
_TSPLIT_B2 = 1_705_795_200 * 1_000_000_000  # 2024-01-21T00:00Z in ns
_TSPLIT_EMBARGO = 3_600 * 1_000_000_000


def q_temporal_split(spark, sf_dir):
    """Purged walk-forward temporal split (sampling.py: temporal_split
    — the time-series leakage guard): events cut into train/val/test
    at two date boundaries with a 1-hour purge embargo before each
    cut; per split, count and exact ts extrema.  The oracle replays
    the embargo filter and the CASE chain."""
    from .operators.sampling import temporal_split

    ev = read_table(spark, sf_dir, "events").select("event_id", "ts")
    out = temporal_split(
        ev, [_TSPLIT_B1, _TSPLIT_B2], embargo_ns=_TSPLIT_EMBARGO,
        ts_col="ts",
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    )


def _sql_temporal_split() -> str:
    b1, b2, e = _TSPLIT_B1, _TSPLIT_B2, _TSPLIT_EMBARGO
    return f"""WITH ev AS (
  SELECT event_id, epoch_ns(ts) AS t FROM events
), k AS (
  SELECT event_id, t,
         CASE WHEN t < {b1} THEN 'train'
              WHEN t < {b2} THEN 'val'
              ELSE 'test' END AS split
  FROM ev
  WHERE NOT (t >= {b1 - e} AND t < {b1})
    AND NOT (t >= {b2 - e} AND t < {b2})
)
SELECT split, CAST(count(*) AS BIGINT) AS n,
       min(t) AS ts_min, max(t) AS ts_max
FROM k GROUP BY split"""


def q_interval_agreement(spark, sf_dir):
    """Inter-annotator agreement over interval sets (coalesce.py:
    interval_agreement — Cohen's kappa on time, the reference's
    home-domain annotation-comparison question): per user, the exact
    ns time-confusion quadrant between 1-hour spans anchored at
    even-event_id events (annotator A) and odd ones (annotator B)
    over the shared global domain, plus the chance-corrected kappa in
    one fixed-order double formula.  The oracle replays the clamp,
    both island merges, the disjoint-island overlap join, and the
    identical formula."""
    from .operators.coalesce import interval_agreement

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        (F.col("ts") - F.pmod(F.col("ts"), F.lit(1000))).alias("ts"),
    )
    bounds = driver_row(ev.agg(
        F.min("ts").alias("lo"), (F.max("ts") + F.lit(_HOUR_NS)).alias("hi")
    ))
    spans = ev.select(
        "user_id",
        "event_id",
        make_span(F.col("ts"), F.col("ts") + F.lit(_HOUR_NS)).alias("span"),
    )
    out = interval_agreement(
        spans.filter(F.col("event_id") % 2 == 0).select("user_id", "span"),
        spans.filter(F.col("event_id") % 2 == 1).select("user_id", "span"),
        int(bounds["lo"]),
        int(bounds["hi"]),
        by="user_id",
    )
    return out.select("user_id", "t11", "t10", "t01", "t00", "kappa")


def _sql_interval_agreement() -> str:
    H = _HOUR_NS
    isl = lambda src, name: f"""m_{name} AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
              THEN 1 ELSE 0 END AS brk
  FROM {src} WINDOW w AS (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), i_{name} AS (
  SELECT user_id, s, e,
         sum(brk) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS UNBOUNDED PRECEDING) AS isl
  FROM m_{name}
), isl_{name} AS (
  SELECT user_id, min(s) AS s, max(e) AS e
  FROM i_{name} GROUP BY user_id, isl
)"""  # noqa: E731
    return f"""WITH sp AS (
  SELECT user_id, event_id,
         epoch_ns(ts) - (epoch_ns(ts) % 1000) AS s
  FROM events
), b AS (SELECT min(s) AS lo, max(s) + {H} AS hi FROM sp),
ra AS (SELECT user_id, s, s + {H} AS e FROM sp WHERE event_id % 2 = 0),
rb AS (SELECT user_id, s, s + {H} AS e FROM sp WHERE event_id % 2 = 1),
{isl("ra", "a")},
{isl("rb", "b")},
da AS (SELECT user_id, CAST(sum(e - s) AS BIGINT) AS dur_a
       FROM isl_a GROUP BY user_id),
db AS (SELECT user_id, CAST(sum(e - s) AS BIGINT) AS dur_b
       FROM isl_b GROUP BY user_id),
ov AS (
  SELECT a.user_id,
         CAST(sum(least(a.e, x.e) - greatest(a.s, x.s)) AS BIGINT) AS t11
  FROM isl_a a JOIN isl_b x ON a.user_id = x.user_id
   AND a.s < x.e AND x.s < a.e
  GROUP BY a.user_id
), q AS (
  SELECT coalesce(da.user_id, db.user_id) AS user_id,
         coalesce(dur_a, 0) AS dur_a, coalesce(dur_b, 0) AS dur_b,
         coalesce(t11, 0) AS t11
  FROM da FULL JOIN db USING (user_id)
  LEFT JOIN ov USING (user_id)
)
SELECT user_id, t11,
       dur_a - t11 AS t10,
       dur_b - t11 AS t01,
       (hi - lo) - dur_a - dur_b + t11 AS t00,
       CASE WHEN (CAST(dur_a AS DOUBLE) / CAST(hi - lo AS DOUBLE))
                 * (CAST(dur_b AS DOUBLE) / CAST(hi - lo AS DOUBLE))
                 + (1.0 - CAST(dur_a AS DOUBLE) / CAST(hi - lo AS DOUBLE))
                   * (1.0 - CAST(dur_b AS DOUBLE) / CAST(hi - lo AS DOUBLE))
                 <> 1.0
            THEN round(
              ((CAST(t11 AS DOUBLE) + CAST((hi - lo) - dur_a - dur_b + t11
                                           AS DOUBLE))
                 / CAST(hi - lo AS DOUBLE)
               - ((CAST(dur_a AS DOUBLE) / CAST(hi - lo AS DOUBLE))
                  * (CAST(dur_b AS DOUBLE) / CAST(hi - lo AS DOUBLE))
                  + (1.0 - CAST(dur_a AS DOUBLE)
                           / CAST(hi - lo AS DOUBLE))
                    * (1.0 - CAST(dur_b AS DOUBLE)
                             / CAST(hi - lo AS DOUBLE))))
              / (1.0
                 - ((CAST(dur_a AS DOUBLE) / CAST(hi - lo AS DOUBLE))
                    * (CAST(dur_b AS DOUBLE) / CAST(hi - lo AS DOUBLE))
                    + (1.0 - CAST(dur_a AS DOUBLE)
                             / CAST(hi - lo AS DOUBLE))
                      * (1.0 - CAST(dur_b AS DOUBLE)
                               / CAST(hi - lo AS DOUBLE)))), 6)
       END AS kappa
FROM q, b"""


def q_pmi_collocations(spark, sf_dir):
    """PMI collocations over the corpus (tfidf.py: pmi_collocations):
    adjacent token pairs with >= 5 joint occurrences scored by
    ln((c_xy·Nu²)/(Nb·u_x·u_y)) — one fixed-order double formula over
    exact integer counts.  The oracle replays the parallel-unnest
    bigram zip, the counts, the filter, and the identical formula."""
    from .operators.tfidf import pmi_collocations

    docs = read_table(spark, sf_dir, "documents")
    return pmi_collocations(docs, min_count=5)


_SQL_PMI = r"""WITH toks AS (
  SELECT regexp_extract_all(lower(text), '\S+') AS t FROM documents
), bg AS (
  SELECT unnest(t[:len(t) - 1]) AS w1, unnest(t[2:]) AS w2 FROM toks
), uni AS (
  SELECT unnest(t) AS w FROM toks
), c2 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
  FROM bg GROUP BY w1, w2 HAVING count(*) >= 5
), u AS (
  SELECT w, CAST(count(*) AS BIGINT) AS u FROM uni GROUP BY w
), tot AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM bg) AS nb,
         (SELECT CAST(count(*) AS BIGINT) FROM uni) AS nu
)
SELECT c2.w1, c2.w2, c2.pair_count,
       round(ln((CAST(pair_count AS DOUBLE) * CAST(nu AS DOUBLE)
                 * CAST(nu AS DOUBLE))
                / (CAST(nb AS DOUBLE) * CAST(ux.u AS DOUBLE)
                   * CAST(uy.u AS DOUBLE))), 6) AS pmi
FROM c2
JOIN u ux ON ux.w = c2.w1
JOIN u uy ON uy.w = c2.w2
CROSS JOIN tot"""


def q_entropy_windows(spark, sf_dir):
    """Label-diversity monitor per window (timeseries.py:
    entropy_windows): Shannon entropy of the event_type mix in each of
    16 windows, pivoted exact counts over the explicit label list +
    fixed-order −Σp·ln p (p·ln p → 0 guard, no smoothing), plus the
    ln(k)-normalized 0–1 balance score.  The oracle replays the stab,
    the pivot, the term order, and the identical ln(k) literal."""
    from .operators.timeseries import entropy_windows

    ev = read_table(spark, sf_dir, "events").select("event_type", "ts")
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = entropy_windows(ev, w, "event_type", list(_EVENT_TYPES), ts_col="ts")
    return out.select(
        "widx", "n",
        *[f"n_{lab}" for lab in _EVENT_TYPES],
        "other", "entropy", "norm_entropy",
    )


def _sql_entropy_windows() -> str:
    import math

    labs = list(_EVENT_TYPES)
    k = len(labs) + 1
    lnk = repr(math.log(k))
    cs = ",\n         ".join(
        f"CAST(sum(CASE WHEN event_type = '{lab}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{lab}"
        for lab in labs
    )
    other = (
        "CAST(sum(CASE WHEN event_type IS NULL OR event_type NOT IN ("
        + ", ".join(f"'{lab}'" for lab in labs)
        + ") THEN 1 ELSE 0 END) AS BIGINT) AS other"
    )
    cols = [f"n_{lab}" for lab in labs] + ["other"]
    term = lambda c: (  # noqa: E731
        f"CASE WHEN {c} > 0 THEN (-(CAST({c} AS DOUBLE) / CAST(n AS DOUBLE)))"
        f" * ln(CAST({c} AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END"
    )
    e = "\n         + ".join(term(c) for c in cols)
    return f"""WITH {_ES_CTE},
{_w_cte(16, "widx")},
ev AS (
  SELECT event_type, epoch_ns(ts) AS t FROM events
), j AS (
  SELECT ev.event_type, w.widx
  FROM ev JOIN w ON w.w_start <= ev.t AND ev.t < w.w_stop
), g AS (
  SELECT widx, CAST(count(*) AS BIGINT) AS n,
         {cs},
         {other}
  FROM j GROUP BY widx
)
SELECT widx, n, {', '.join(cols)},
       round({e}, 6) AS entropy,
       round(({e}) / {lnk}, 6) AS norm_entropy
FROM g"""


def q_gram_novelty(spark, sf_dir):
    """Per-document 5-gram novelty (dedup.py: gram_novelty — the
    memorization/diversity metric): distinct-shingle counts, the
    corpus-shared subset (df >= 2), and the exact integer novelty ppm.
    The oracle replays the shingle zip, the md5-60bit hash, the df
    counts, and the floor division."""
    from .operators.dedup import gram_novelty

    docs = read_table(spark, sf_dir, "documents")
    return gram_novelty(docs, shingle_k=5, min_df=2, portable=True)


_SQL_GRAM_NOVELTY = rf"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tl FROM documents
), sh AS (
  SELECT doc_id, CASE WHEN len(tl) < 5 THEN [array_to_string(tl, ' ')]
       ELSE list_transform(range(1, len(tl) - 3),
                           i -> array_to_string(tl[i:i+4], ' ')) END AS sl
  FROM toks
), ex AS (
  SELECT doc_id, {_PH60.format(x="s")} AS h
  FROM (SELECT doc_id, unnest(list_distinct(sl)) AS s FROM sh)
), freq AS (
  SELECT h, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       CAST((1000000 * (count(*) - sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)))
         // count(*) AS BIGINT) AS novelty_ppm
FROM ex JOIN freq USING (h)
GROUP BY doc_id"""


def q_stream_entropy_windows(spark, sf_dir):
    """The STREAMING entropy twin in batch mode (streaming.py:
    stream_entropy_windows — pivoted label counts are the mergeable
    sink state, entropy is a read-time projection; file-stream parity
    pytest-gated).  Batch inputs delegate to entropy_windows; shares
    its oracle."""
    from .streaming import stream_entropy_windows

    ev = read_table(spark, sf_dir, "events").select("event_type", "ts")
    _, w = _es_windows(spark, sf_dir, 16, "widx")
    out = stream_entropy_windows(
        ev, w, "event_type", list(_EVENT_TYPES), ts_col="ts"
    )
    return out.select(
        "widx", "n",
        *[f"n_{lab}" for lab in _EVENT_TYPES],
        "other", "entropy", "norm_entropy",
    )


_PSI_T_PERIOD = _DAY_NS
_PSI_T_LO, _PSI_T_HI, _PSI_T_NB = 0, 100_000, 10


def q_psi_timeline(spark, sf_dir):
    """Day-over-day drift monitor (profile.py: psi_timeline): PSI of
    each day's fixed-point value distribution against the previous
    day over the shared 12-bucket grid — pivoted integer counts, one
    fixed-order double formula, consecutive-period self-join of the
    dimension-sized pivot table.  The oracle replays the day fold,
    the pivot, the join, and the term order."""
    from .operators.profile import psi_timeline

    ev = read_table(spark, sf_dir, "events").select(
        "ts", F.round(F.col("value") * 1_000).cast("long").alias("v_fx")
    )
    return psi_timeline(
        ev, "v_fx", _PSI_T_LO, _PSI_T_HI, _PSI_T_NB, _PSI_T_PERIOD,
        ts_col="ts",
    )


def q_stream_psi_timeline(spark, sf_dir):
    """The STREAMING drift-monitor twin in batch mode (streaming.py:
    stream_psi_timeline — (period, bucket) counts are the mergeable
    sink state, PSI is a read-time projection; file-stream parity
    pytest-gated).  Batch inputs delegate to psi_timeline; shares its
    oracle."""
    from .streaming import stream_psi_timeline

    ev = read_table(spark, sf_dir, "events").select(
        "ts", F.round(F.col("value") * 1_000).cast("long").alias("v_fx")
    )
    return stream_psi_timeline(
        ev, "v_fx", _PSI_T_LO, _PSI_T_HI, _PSI_T_NB, _PSI_T_PERIOD,
        ts_col="ts",
    )


def q_stream_benford(spark, sf_dir):
    """The STREAMING Benford-audit twin in batch mode (streaming.py:
    stream_benford — per-digit counts are the mergeable sink state,
    expected/chi-square columns are a read-time projection;
    file-stream parity pytest-gated).  Batch inputs delegate to
    benford_digits; shares its oracle."""
    from .streaming import stream_benford

    li = read_table(spark, sf_dir, "lineitem")
    return stream_benford(li, "l_extendedprice")


def _sql_psi_timeline() -> str:
    nb, lo, hi, P = _PSI_T_NB, _PSI_T_LO, _PSI_T_HI, _PSI_T_PERIOD
    b = nb + 2
    bucket = (
        f"CASE WHEN x < {lo} THEN 0 WHEN x >= {hi} THEN {nb + 1} "
        f"ELSE 1 + ((x - {lo})::HUGEINT * {nb} // ({hi - lo})::HUGEINT) END"
    )
    cs = ",\n         ".join(
        f"CAST(sum(CASE WHEN b = {i} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        for i in range(b)
    )
    p = lambda i: (  # noqa: E731
        f"(CAST(cur.c{i} + 1 AS DOUBLE) / CAST(cur.n + {b} AS DOUBLE))"
    )
    q = lambda i: (  # noqa: E731
        f"(CAST(prv.c{i} + 1 AS DOUBLE) / CAST(prv.n + {b} AS DOUBLE))"
    )
    terms = "\n       + ".join(
        f"(({p(i)} - {q(i)}) * ln({p(i)} / {q(i)}))" for i in range(b)
    )
    return f"""WITH ev AS (
  SELECT ((epoch_ns(ts) - ((epoch_ns(ts) % {P} + {P}) % {P})) // {P})
           AS period,
         CAST(round(value * 1000) AS BIGINT) AS x
  FROM events
), e AS (
  SELECT period, {bucket} AS b FROM ev
), per AS (
  SELECT period, CAST(count(*) AS BIGINT) AS n,
         {cs}
  FROM e GROUP BY period
)
SELECT cur.period, cur.n, prv.n AS n_prev,
       round({terms}, 6) AS psi
FROM per cur JOIN per prv ON cur.period = prv.period + 1"""


_CCF_BUCKET_NS = 3_600 * 1_000_000_000
_CCF_MAX_LAG = 6


def q_ccf(spark, sf_dir):
    """Cross-correlogram between the hourly click and error count
    series (timeseries.py: cross_correlation — the lead/lag detector):
    CCF(-6..6) over the zero-densified shared hour grid, exact HUGEINT
    moments, fixed-order double Pearson.  The oracle replays the
    bucket fold, the grid fill, the shifted join, and the formula."""
    from .operators.timeseries import cross_correlation

    ev = read_table(spark, sf_dir, "events")
    return cross_correlation(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "error"),
        _CCF_BUCKET_NS,
        _CCF_MAX_LAG,
        ts_col="ts",
    )


def _sql_ccf() -> str:
    B, K = _CCF_BUCKET_NS, _CCF_MAX_LAG
    fold = f"((epoch_ns(ts) - ((epoch_ns(ts) % {B} + {B}) % {B})) // {B})"
    return f"""WITH sa AS (
  SELECT {fold} AS bucket, CAST(count(*) AS BIGINT) AS v
  FROM events WHERE event_type = 'click' GROUP BY 1
), sb AS (
  SELECT {fold} AS bucket, CAST(count(*) AS BIGINT) AS v
  FROM events WHERE event_type = 'error' GROUP BY 1
), sp AS (
  SELECT min(bucket) AS lo, max(bucket) AS hi
  FROM (SELECT bucket FROM sa UNION ALL SELECT bucket FROM sb)
), g AS (
  SELECT unnest(range(lo, hi + 1)) AS bucket FROM sp
), gx AS (
  SELECT g.bucket, coalesce(sa.v, 0) AS x FROM g LEFT JOIN sa USING (bucket)
), gy AS (
  SELECT g.bucket, coalesce(sb.v, 0) AS y FROM g LEFT JOIN sb USING (bucket)
), p AS (
  SELECT k.lag, gx.x, gy.y
  FROM gx CROSS JOIN (SELECT unnest(range(-{K}, {K + 1})) AS lag) k
  JOIN gy ON gy.bucket = gx.bucket + k.lag
), s AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         sum(x::HUGEINT * y::HUGEINT) AS sxy,
         sum(x::HUGEINT * x::HUGEINT) AS sx2,
         sum(y::HUGEINT * y::HUGEINT) AS sy2
  FROM p GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0), 6)
         AS ccf
FROM s"""


_PSI_LO, _PSI_HI, _PSI_NB = 0, 600, 12


def q_psi_drift(spark, sf_dir):
    """Population Stability Index per source (profile.py: psi_drift —
    the dataset-drift detector of training pipelines): each source's
    n_chars distribution against the whole corpus over a 14-bucket
    equi-width grid with add-one smoothing.  Bucket counts pivot into
    exact integer columns; PSI is ONE fixed-order double expression —
    the oracle replays the identical pivot and term order."""
    from .operators.profile import psi_drift

    docs = read_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    return psi_drift(docs, "x", _PSI_LO, _PSI_HI, _PSI_NB, "source")


def _sql_psi_drift() -> str:
    nb, lo, hi = _PSI_NB, _PSI_LO, _PSI_HI
    b = nb + 2
    bucket = (
        f"CASE WHEN x < {lo} THEN 0 WHEN x >= {hi} THEN {nb + 1} "
        f"ELSE 1 + ((x - {lo})::HUGEINT * {nb} // ({hi - lo})::HUGEINT) END"
    )
    cs = ",\n         ".join(
        f"CAST(sum(CASE WHEN b = {i} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        for i in range(b)
    )
    gs = ", ".join(f"sum(c{i}) AS g{i}" for i in range(b))
    p = lambda i: (  # noqa: E731
        f"(CAST(c{i} + 1 AS DOUBLE) / CAST(n + {b} AS DOUBLE))"
    )
    q = lambda i: (  # noqa: E731
        f"(CAST(g{i} + 1 AS DOUBLE) / CAST(nt + {b} AS DOUBLE))"
    )
    terms = "\n       + ".join(
        f"(({p(i)} - {q(i)}) * ln({p(i)} / {q(i)}))" for i in range(b)
    )
    return f"""WITH d AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents
), e AS (
  SELECT source, {bucket} AS b FROM d
), per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         {cs}
  FROM e GROUP BY source
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, {gs} FROM per
)
SELECT source, n, round({terms}, 6) AS psi
FROM per, tot"""


# ---------------------------------------------------------------------------
# catalog
# ---------------------------------------------------------------------------

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], Optional[str]]] = {
    "q_quantile_windows": (q_quantile_windows, _SQL_QUANTILE_WINDOWS),
    "q_data_quantile_windows": (q_data_quantile_windows, _SQL_DATA_QUANTILES),
    "q_dfspan": (q_dfspan, _SQL_DFSPAN),
    "q_interval_join_inner": (q_interval_join_inner, _SQL_JOIN_INNER),
    "q_interval_join_binned": (q_interval_join_binned, _SQL_JOIN_INNER),
    "q_interval_join_keepleft": (q_interval_join_keepleft, _SQL_JOIN_KEEPLEFT),
    "q_interval_join_prebinned_keepleft": (
        q_interval_join_prebinned_keepleft,
        _SQL_JOIN_KEEPLEFT,
    ),
    "q_interval_join_prebinned_full": (
        q_interval_join_prebinned_full,
        _SQL_JOIN_FULL,
    ),
    "q_interval_join_keepright": (q_interval_join_keepright, _SQL_JOIN_KEEPRIGHT),
    "q_interval_join_full": (q_interval_join_full, _SQL_JOIN_FULL),
    "q_interval_join_closed": (q_interval_join_closed, _SQL_JOIN_CLOSED),
    "q_interval_join_openclosed": (q_interval_join_openclosed, _SQL_JOIN_OPENCLOSED),
    "q_interval_join_float": (q_interval_join_float, _SQL_JOIN_FLOAT),
    "q_interval_join_float_binned": (q_interval_join_float_binned, _SQL_JOIN_FLOAT),
    "q_interval_join_mixed_bounds": (
        q_interval_join_mixed_bounds,
        _SQL_JOIN_MIXED_BOUNDS,
    ),
    "q_interval_join_rowbounds": (
        q_interval_join_rowbounds,
        _SQL_JOIN_ROWBOUNDS,
    ),
    "q_groupby_interval_join_agg": (q_groupby_interval_join_agg, _SQL_GROUPBY_AGG),
    "q_time_weighted_avg": (q_time_weighted_avg, _SQL_TIME_WEIGHTED),
    "q_orders_interval_join": (q_orders_interval_join, _SQL_ORDERS_JOIN),
    "q_interval_join_date": (q_interval_join_date, _SQL_JOIN_DATE),
    "q_interval_join_string": (q_interval_join_string, _sql_join_string()),
    "q_lineitem_interval_agg": (q_lineitem_interval_agg, _SQL_LINEITEM_AGG),
    "q_dedup_exact": (q_dedup_exact, _SQL_DEDUP_EXACT),
    "q_text_token_stats": (q_text_token_stats, _SQL_TOKEN_STATS),
    "q_text_quality": (q_text_quality, _SQL_TEXT_QUALITY),
    "q_tfidf_top_terms": (q_tfidf_top_terms, _SQL_TFIDF),
    "q_hash_split": (q_hash_split, _SQL_HASH_SPLIT),
    "q_similarity_topk": (q_similarity_topk, _SQL_SIMILARITY_TOPK),
    "q_random_projection": (q_random_projection, _SQL_RANDOM_PROJECTION),
    "q_lang_id": (q_lang_id, _SQL_LANG_ID),
    "q_quality_score": (q_quality_score, _SQL_QUALITY),
    "q_training_prep": (q_training_prep, _SQL_TRAINING_PREP),
    "q_asof_join": (q_asof_join, _SQL_ASOF),
    "q_asof_join_date": (q_asof_join_date, _SQL_ASOF_DATE),
    "q_attribution_linear": (
        q_attribution_linear,
        _sql_attribution(6 * 3_600_000_000_000, "linear"),
    ),
    "q_attribution_last": (
        q_attribution_last,
        _sql_attribution(6 * 3_600_000_000_000, "last_touch"),
    ),
    "q_funnel_counts": (q_funnel_counts, _sql_funnel_counts()),
    "q_retention_weekly": (q_retention_weekly, _SQL_RETENTION_WEEKLY),
    "q_merge_spans_date": (q_merge_spans_date, _SQL_MERGE_SPANS_DATE),
    "q_quantile_windows_date": (q_quantile_windows_date, _SQL_QW_DATE),
    "q_asof_nearest": (q_asof_nearest, _SQL_ASOF_NEAREST),
    "q_sessionize": (q_sessionize, _SQL_SESSIONIZE),
    "q_merge_spans": (q_merge_spans, _SQL_MERGE_SPANS),
    "q_split_spans": (q_split_spans, _SQL_SPLIT_SPANS),
    "q_span_coverage": (q_span_coverage, _SQL_SPAN_COVERAGE),
    "q_span_coverage_daily": (q_span_coverage_daily, _SQL_SPAN_COVERAGE_DAILY),
    "q_span_difference": (q_span_difference, _SQL_SPAN_DIFFERENCE),
    "q_overlap_profile": (q_overlap_profile, _SQL_OVERLAP_PROFILE),
    "q_interval_semijoin": (q_interval_semijoin, _SQL_SEMIJOIN),
    "q_interval_join_by": (q_interval_join_by, _SQL_JOIN_BY),
    "q_interval_join_by_auto": (q_interval_join_by_auto, _SQL_JOIN_BY),
    "q_interval_join_by_keepleft": (
        q_interval_join_by_keepleft,
        _SQL_JOIN_BY_KEEPLEFT,
    ),
    "q_interval_antijoin": (q_interval_antijoin, _SQL_ANTIJOIN),
    "q_stream_interval_filter": (
        q_stream_interval_filter,
        _SQL_STREAM_INTERVAL_FILTER,
    ),
    "q_stream_sessionize": (q_stream_sessionize, _SQL_STREAM_SESSIONIZE),
    "q_stream_interval_join": (q_stream_interval_join, _SQL_STREAM_JOIN),
    "q_stream_join_keepleft": (
        q_stream_join_keepleft,
        _SQL_STREAM_JOIN_KEEPLEFT,
    ),
    "q_stream_join_full": (
        q_stream_join_full,
        _SQL_STREAM_JOIN_FULL,
    ),
    "q_embedding_neardup": (q_embedding_neardup, _SQL_EMB_NEARDUP),
    "q_multimodal_meta": (q_multimodal_meta, _SQL_MM_META),
    "q_multimodal_frames": (q_multimodal_frames, _SQL_MM_FRAMES),
    "q_minhash_lsh_pairs": (q_minhash_lsh_pairs, _sql_minhash_pairs()),
    "q_ngram_jaccard_join": (q_ngram_jaccard_join, _sql_ngram_jaccard(threshold=0.7)),
    "q_simhash_pairs": (q_simhash_pairs, _sql_simhash_pairs()),
    "q_similarity_lsh": (q_similarity_lsh, _sql_similarity_lsh()),
    "q_similarity_lsh_rerank": (
        q_similarity_lsh_rerank,
        _sql_similarity_lsh_rerank(),
    ),
    "q_similarity_lsh_indexed": (
        q_similarity_lsh_indexed,
        _sql_similarity_lsh_rerank(),
    ),
    "q_similarity_lsh_maintained": (
        q_similarity_lsh_maintained,
        _sql_similarity_lsh_rerank(),
    ),
    "q_stream_lsh_probe": (q_stream_lsh_probe, _sql_stream_lsh_probe()),
    "q_similarity_ivf": (q_similarity_ivf, _sql_ivf(n_centroids=32, n_probe=8)),
    "q_similarity_ivf_filtered": (
        q_similarity_ivf_filtered,
        _sql_ivf(n_centroids=16, n_probe=4, corpus_where="label % 3 = 1"),
    ),
    "q_similarity_pq": (q_similarity_pq, _sql_pq()),
    "q_similarity_pq_rerank": (
        q_similarity_pq_rerank,
        _sql_pq(shortlist=20),
    ),
    "q_incremental_dedup": (q_incremental_dedup, _sql_incremental_dedup()),
    "q_stream_incremental_dedup": (
        q_stream_incremental_dedup,
        _sql_incremental_dedup(),
    ),
    "q_stream_join_by": (q_stream_join_by, _SQL_JOIN_BY),
    "q_rolling_fingerprint": (q_rolling_fingerprint, _SQL_ROLLING_FP),
    "q_multimodal_features": (q_multimodal_features, _SQL_MM_FEATURES),
    "q_embedding_neardup_lsh": (q_embedding_neardup_lsh, _sql_emb_neardup_lsh()),
    "q_dedup_clusters": (q_dedup_clusters, _sql_dedup_clusters()),
    "q_dedup_keep_best": (q_dedup_keep_best, _sql_dedup_keep_best()),
    "q_leakage_split": (q_leakage_split, _sql_leakage_split()),
    "q_pipeline_curate_split": (
        q_pipeline_curate_split,
        _sql_pipeline_curate_split(),
    ),
    "q_dedup_lines": (q_dedup_lines, _SQL_DEDUP_LINES),
    "q_span_gaps": (q_span_gaps, _SQL_SPAN_GAPS),
    "q_span_complement": (q_span_complement, _SQL_SPAN_COMPLEMENT),
    "q_stream_tumbling_agg": (q_stream_tumbling_agg, _SQL_STREAM_TUMBLING),
    "q_pack_sequences": (q_pack_sequences, _SQL_PACK_SEQUENCES),
    "q_stratified_sample": (q_stratified_sample, _SQL_STRATIFIED),
    "q_topk_per_group": (q_topk_per_group, _SQL_TOPK_PER_GROUP),
    "q_point_in_span": (q_point_in_span, _SQL_POINT_IN_SPAN),
    "q_repetition_score": (q_repetition_score, _SQL_REPETITION),
    "q_pack_greedy": (q_pack_greedy, _SQL_PACK_GREEDY),
    "q_training_prep_v2": (q_training_prep_v2, _SQL_TRAINING_PREP_V2),
    "q_decontaminate": (q_decontaminate, _SQL_DECONTAMINATE),
    "q_contamination_spans": (
        q_contamination_spans,
        _sql_contamination_spans(),
    ),
    "q_duplicate_spans": (q_duplicate_spans, _sql_duplicate_spans()),
    "q_incremental_duplicate_spans": (
        q_incremental_duplicate_spans,
        _sql_incremental_duplicate_spans(),
    ),
    "q_excise_duplicate_spans": (
        q_excise_duplicate_spans,
        _sql_excise_duplicate_spans(),
    ),
    "q_bloom_decontaminate": (q_bloom_decontaminate, _sql_bloom_decon(1 << 16, 4)),
    "q_stream_bloom_decontaminate": (
        q_stream_bloom_decontaminate,
        _sql_bloom_decon(1 << 16, 4),
    ),
    "q_resample_locf": (q_resample_locf, _SQL_RESAMPLE_LOCF),
    "q_sliding_window_agg": (q_sliding_window_agg, _SQL_SLIDING_WINDOW),
    "q_gopher_rules": (q_gopher_rules, _SQL_GOPHER),
    "q_bm25_topk": (q_bm25_topk, _SQL_BM25),
    "q_stream_sliding_agg": (q_stream_sliding_agg, _SQL_SLIDING_WINDOW),
    "q_shingle_dup_pairs": (q_shingle_dup_pairs, _SQL_SHINGLE_DUP),
    "q_rollup_daily": (q_rollup_daily, _SQL_ROLLUP_DAILY),
    "q_multi_rollup": (q_multi_rollup, _SQL_MULTI_ROLLUP),
    "q_similarity_sq8": (q_similarity_sq8, _SQL_SIMILARITY_SQ8),
    "q_trailing_sum": (q_trailing_sum, _SQL_TRAILING_SUM),
    "q_group_percentiles": (q_group_percentiles, _SQL_GROUP_PERCENTILES),
    "q_value_correlation": (q_value_correlation, _SQL_VALUE_CORR),
    "q_pivot_user_activity": (q_pivot_user_activity, _SQL_PIVOT_USER),
    "q_allen_relations": (q_allen_relations, _SQL_ALLEN),
    "q_chunk_documents": (q_chunk_documents, _SQL_CHUNK_DOCS),
    "q_levenshtein_pairs": (q_levenshtein_pairs, _SQL_LEVENSHTEIN),
    "q_funnel": (q_funnel, _SQL_FUNNEL),
    "q_retention_cohorts": (q_retention_cohorts, _SQL_RETENTION),
    "q_anomaly_flags": (q_anomaly_flags, _SQL_ANOMALY),
    "q_build_vocab": (q_build_vocab, _SQL_VOCAB),
    "q_pagerank": (q_pagerank, _SQL_PAGERANK),
    "q_weighted_sample": (q_weighted_sample, _SQL_WEIGHTED_SAMPLE),
    "q_rag_prep": (q_rag_prep, _SQL_RAG_PREP),
    "q_interval_join_iou": (q_interval_join_iou, _SQL_JOIN_IOU),
    "q_kmv_distinct": (q_kmv_distinct, _SQL_KMV),
    "q_hll_distinct": (q_hll_distinct, _sql_hll(8)),
    "q_hll_windows": (q_hll_windows, _sql_hll_windows(8)),
    "q_cms_word_counts": (q_cms_word_counts, _sql_cms_word_counts()),
    "q_cms_join_size": (q_cms_join_size, _sql_cms_join_size()),
    "q_quantile_sketch": (q_quantile_sketch, _sql_quantile_sketch()),
    "q_winsorize": (q_winsorize, _sql_winsorize(128, 50_000, 950_000)),
    "q_stream_winsorize": (q_stream_winsorize, _sql_winsorize(128, 50_000, 950_000)),
    "q_profile_documents": (q_profile_documents, _sql_profile_documents()),
    "q_profile_events": (q_profile_events, _sql_profile_events()),
    "q_key_skew_report": (q_key_skew_report, _sql_key_skew_report()),
    "q_json_extract": (q_json_extract, _SQL_JSON_EXTRACT),
    "q_profile_by_lang": (q_profile_by_lang, _sql_profile_by_lang()),
    "q_register_index_update": (
        q_register_index_update,
        _sql_register_index_update(),
    ),
    "q_compact_roundtrip": (q_compact_roundtrip, _SQL_COMPACT_ROUNDTRIP),
    "q_kmv_overlap_matrix": (
        q_kmv_overlap_matrix,
        _sql_kmv_overlap_matrix(),
    ),
    "q_source_mix": (q_source_mix, _SQL_SOURCE_MIX),
    "q_mixture_sample": (q_mixture_sample, _SQL_MIXTURE_SAMPLE),
    "q_stream_mixture_sample": (
        q_stream_mixture_sample,
        _SQL_STREAM_MIXTURE_SAMPLE,
    ),
    "q_proximity_join": (q_proximity_join, _SQL_PROXIMITY),
    "q_scd2_intervals": (q_scd2_intervals, _SQL_SCD2),
    "q_time_weighted_locf": (q_time_weighted_locf, _SQL_TIME_WEIGHT_LOCF),
    "q_time_weighted_linear": (
        q_time_weighted_linear,
        _SQL_TIME_WEIGHT_LINEAR,
    ),
    "q_duration_in_state": (q_duration_in_state, _SQL_DURATION_IN_STATE),
    "q_counter_total": (q_counter_total, _SQL_COUNTER_TOTAL),
    "q_counter_windows": (q_counter_windows, _SQL_COUNTER_WINDOWS),
    "q_gauge_windows": (q_gauge_windows, _SQL_GAUGE_WINDOWS),
    "q_ohlc_windows": (q_ohlc_windows, _SQL_OHLC_WINDOWS),
    "q_stream_gauge_windows": (q_stream_gauge_windows, _SQL_GAUGE_WINDOWS),
    "q_heartbeat_windows": (q_heartbeat_windows, _SQL_HEARTBEAT_WINDOWS),
    "q_stream_heartbeat_windows": (
        q_stream_heartbeat_windows, _SQL_HEARTBEAT_WINDOWS
    ),
    "q_lttb": (q_lttb, _SQL_LTTB),
    "q_stats2d_windows": (q_stats2d_windows, _SQL_STATS2D_WINDOWS),
    "q_masked_twa": (q_masked_twa, _SQL_MASKED_TWA),
    "q_stream_masked_twa": (
        q_stream_masked_twa, _sql_masked_twa(closed_runs=True)
    ),
    "q_gapfill_locf": (q_gapfill_locf, _SQL_GAPFILL_LOCF),
    "q_gapfill_interp": (q_gapfill_interp, _SQL_GAPFILL_INTERP),
    "q_topn_windows": (q_topn_windows, _SQL_TOPN_WINDOWS),
    "q_histogram_windows": (q_histogram_windows, _SQL_HISTOGRAM_WINDOWS),
    "q_acf": (q_acf, _sql_acf()),
    "q_acf_chunked": (q_acf_chunked, _sql_acf()),
    "q_stream_histogram_windows": (
        q_stream_histogram_windows, _SQL_HISTOGRAM_WINDOWS,
    ),
    "q_seasonal_anomaly": (q_seasonal_anomaly, _SQL_SEASONAL_ANOMALY),
    "q_psi_drift": (q_psi_drift, _sql_psi_drift()),
    "q_ccf": (q_ccf, _sql_ccf()),
    "q_pmi_collocations": (q_pmi_collocations, _SQL_PMI),
    "q_interval_agreement": (
        q_interval_agreement, _sql_interval_agreement(),
    ),
    "q_temporal_split": (q_temporal_split, _sql_temporal_split()),
    "q_psi_timeline": (q_psi_timeline, _sql_psi_timeline()),
    "q_entropy_windows": (q_entropy_windows, _sql_entropy_windows()),
    "q_stream_entropy_windows": (
        q_stream_entropy_windows, _sql_entropy_windows(),
    ),
    "q_gram_novelty": (q_gram_novelty, _SQL_GRAM_NOVELTY),
    "q_stream_ohlc_windows": (q_stream_ohlc_windows, _SQL_OHLC_WINDOWS),
    "q_stream_time_weighted": (
        q_stream_time_weighted,
        _SQL_STREAM_TIME_WEIGHTED,
    ),
    "q_stream_stats2d": (q_stream_stats2d, _SQL_STATS2D_WINDOWS),
    "q_stream_hll_windows": (q_stream_hll_windows, _sql_stream_hll_windows()),
    "q_stream_topn_windows": (q_stream_topn_windows, _SQL_TOPN_WINDOWS),
    "q_stream_duration_in_state": (
        q_stream_duration_in_state,
        _SQL_STREAM_DURATION_IN_STATE,
    ),
    "q_stream_counter_windows": (
        q_stream_counter_windows,
        _SQL_COUNTER_WINDOWS,
    ),
    "q_validity_intervals_global": (
        q_validity_intervals_global,
        _SQL_VALIDITY_GLOBAL,
    ),
    "q_snapshot_at": (q_snapshot_at, _SQL_SNAPSHOT),
    "q_dominant_label": (q_dominant_label, _SQL_DOMINANT),
    "q_mean_token_rank": (q_mean_token_rank, _SQL_MEAN_TOKEN_RANK),
    "q_label_centroids": (q_label_centroids, _SQL_LABEL_CENTROIDS),
    "q_lm_score": (q_lm_score, _SQL_LM_SCORE),
    "q_lm_buckets": (q_lm_buckets, _SQL_LM_BUCKETS),
    "q_dsir_weights": (q_dsir_weights, _sql_dsir_weights(2, 4096)),
    "q_dsir_resample": (q_dsir_resample, _sql_dsir_resample()),
    "q_snapshot_diff": (q_snapshot_diff, _SQL_SNAPSHOT_DIFF),
    "q_apply_cdc": (q_apply_cdc, _SQL_APPLY_CDC),
    "q_sample_per_group": (q_sample_per_group, _SQL_SAMPLE_PER_GROUP),
    "q_heavy_hitters": (q_heavy_hitters, _SQL_HEAVY_HITTERS),
    "q_semantic_dedup": (q_semantic_dedup, _sql_semantic_dedup(16, 0.4)),
    "q_salted_join": (q_salted_join, _SQL_SALTED_JOIN),
    "q_stream_latest_by_key": (q_stream_latest_by_key, _SQL_STREAM_LATEST),
    "q_pii_redact": (q_pii_redact, _sql_pii_redact()),
    "q_pii_spans": (q_pii_spans, _sql_pii_spans()),
    "q_domain_caps": (q_domain_caps, _SQL_DOMAIN_CAPS),
    "q_domain_blocklist": (q_domain_blocklist, _SQL_DOMAIN_BLOCKLIST),
    "q_domain_quota": (q_domain_quota, _SQL_DOMAIN_QUOTA),
    "q_clean_text": (q_clean_text, _SQL_CLEAN_TEXT),
    "q_html_extract": (q_html_extract, _sql_html_extract()),
    "q_url_canonical_dedup": (
        q_url_canonical_dedup, _sql_url_canonical_dedup()
    ),
    "q_sentence_stats": (q_sentence_stats, _sql_sentence_stats()),
    "q_chunk_by_sentences": (
        q_chunk_by_sentences, _sql_chunk_by_sentences()
    ),
    "q_bpe_merges": (q_bpe_merges, _sql_bpe(10)),
    "q_apply_bpe_merges": (q_apply_bpe_merges, _sql_apply_bpe(10)),
    "q_apply_bpe_vocab": (q_apply_bpe_vocab, _sql_apply_bpe_vocab(64)),
    "q_bpe_token_counts": (q_bpe_token_counts, _sql_bpe_token_counts(64)),
    "q_span_corrupt": (q_span_corrupt, _sql_span_corrupt()),
    "q_fim_split": (q_fim_split, _sql_fim_split()),
    "q_incremental_agg": (q_incremental_agg, _SQL_INCREMENTAL_AGG),
    "q_triangle_counts": (q_triangle_counts, _sql_triangles()),
    "q_clustering_coefficient": (
        q_clustering_coefficient,
        _sql_clustering_coefficient(),
    ),
    "q_k_core": (q_k_core, _sql_k_core(2, 6)),
    "q_kmv_overlap": (q_kmv_overlap, _SQL_KMV_OVERLAP),
    "q_hampel_despike": (q_hampel_despike, _SQL_HAMPEL),
    "q_ewma": (q_ewma, _SQL_EWMA),
    "q_resample_interp": (q_resample_interp, _SQL_RESAMPLE_INTERP),
    "q_cusum": (q_cusum, _sql_cusum(_CUSUM_T, _CUSUM_K, _CUSUM_H)),
    "q_stream_cusum": (q_stream_cusum, _sql_cusum(_CUSUM_T, _CUSUM_K, _CUSUM_H)),
    "q_curation_report": (q_curation_report, _sql_curation()),
    "q_oov_rate": (q_oov_rate, _SQL_OOV),
    "q_coverage_select": (q_coverage_select, _sql_coverage(5)),
    "q_semantic_clusters": (q_semantic_clusters, _sql_semantic_clusters(16, 0.4)),
    "q_hybrid_dedup_clusters": (q_hybrid_dedup_clusters, _sql_hybrid_clusters(16, 0.4)),
    "q_stream_hampel": (q_stream_hampel, _SQL_HAMPEL),
    "q_pack_stats": (q_pack_stats, _SQL_PACK_STATS),
    "q_markov_transitions": (q_markov_transitions, _SQL_MARKOV),
    "q_stream_markov": (q_stream_markov, _SQL_MARKOV),
    "q_drawdown": (q_drawdown, _SQL_DRAWDOWN),
    "q_stream_drawdown": (q_stream_drawdown, _SQL_DRAWDOWN),
    "q_nms_spans": (q_nms_spans, _SQL_NMS_SPANS),
    "q_rfm": (q_rfm, _sql_rfm()),
    "q_benford": (q_benford, _SQL_BENFORD),
    "q_stream_psi_timeline": (q_stream_psi_timeline, _sql_psi_timeline()),
    "q_stream_benford": (q_stream_benford, _SQL_BENFORD),
    "q_interarrival": (q_interarrival, _SQL_INTERARRIVAL),
    "q_stream_interarrival": (q_stream_interarrival, _SQL_INTERARRIVAL),
    "q_cohort_ltv": (q_cohort_ltv, _SQL_COHORT_LTV),
    "q_jsonl_roundtrip": (q_jsonl_roundtrip, _SQL_JSONL_ROUNDTRIP),
    "q_readability": (q_readability, _SQL_READABILITY),
    "q_survival_curve": (q_survival_curve, _SQL_SURVIVAL),
    "q_global_rank": (q_global_rank, _SQL_GLOBAL_RANK),
    "q_item_cooccurrence": (q_item_cooccurrence, _SQL_ITEM_COOC),
    "q_gini": (q_gini, _SQL_GINI),
    "q_spearman": (q_spearman, _SQL_SPEARMAN),
    "q_event_paths": (q_event_paths, _SQL_EVENT_PATHS),
    "q_stream_event_paths": (q_stream_event_paths, _SQL_EVENT_PATHS_ALL),
    "q_code_detect": (q_code_detect, _sql_code_detect()),
    "q_ab_test": (q_ab_test, _SQL_AB_TEST),
}

# ---------------------------------------------------------------------------
# driver-gate ordering (round-6, coverage-aware): the driver's CORRECTNESS
# gate checks the FIRST 50 catalog entries only, so insertion order is a
# correctness-signal budget.  The order is a pure function of repo-COMMITTED
# state -- the CORRECTNESS_r*.json files the driver itself writes into the
# repo each round:
#   1. a small pinned core (the flagship interval-join surface) stays gated
#      every round as a regression tripwire;
#   2. every catalog entry that has NEVER had a green driver row across all
#      committed CORRECTNESS_r*.json comes next -- brand-new queries land
#      here by construction, so the gate always verifies new and
#      never-verified entries first;
#   3. the already-driver-verified remainder is ordered STALEST FIRST
#      (round 10+, was a fixed-offset rotation in rounds 7-9): each
#      entry's age is the highest round whose committed
#      CORRECTNESS_r*.json gave it a green row, and the free window
#      slots always take the globally oldest-gated entries.  Gating an
#      entry bumps its age to the current round, pushing it to the back
#      -- the scheme is self-advancing (no round counter needed) and
#      WORST-CASE staleness is bounded by ceil(len(verified)/free)
#      rounds, where the old offset rotation only bounded the average.
# With zero CORRECTNESS files on disk the order degrades to pinned-core
# + catalog order (fails safe, and the next round's file restores
# coverage-awareness).
# ``_gate_order`` is pure and unit-tested in tests/test_plans.py.
# ---------------------------------------------------------------------------

#: driver gate width: the correctness driver verifies the first 50
#: catalog entries each round
_GATE_WINDOW = 50

#: committed catalog size, bumped on every addition — the guard test
#: asserts ``len(QUERIES)`` against it so a silently-shadowing
#: duplicate key (which Python would otherwise accept and drop an
#: entry) fails CI even if the source-scan test is skipped
EXPECTED_CATALOG_SIZE = 256

#: pinned regression tripwires in PRIORITY order — ``_gate_order``
#: keeps as many as fit beside the never-verified entries, dropping
#: from the tail first, so growing the catalog can never push a
#: never-verified entry out of the driver's window
_GATE_PINNED = [
    "q_interval_join_inner",
    "q_interval_join_binned",
    "q_interval_join_full",
    "q_interval_join_by",
    "q_quantile_windows",
    "q_groupby_interval_join_agg",
    "q_interval_join_mixed_bounds",
    "q_asof_join_date",
    "q_stream_join_keepleft",
    "q_interval_join_date",
    "q_dfspan",
]


def _driver_verified_rounds(root: str) -> dict:
    """``{name: last_green_round}`` read from the committed
    CORRECTNESS_r*.json files — for every query name, the HIGHEST round
    number whose driver record gave it a green row.  A row counts as
    green when rows and schema match and the value hash either matched
    or was not computed (the driver's weaker rows-only check for
    non-SQL-expressible ops).  Unparseable files or rows are skipped
    (fails safe to "never verified")."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    seen = {}
    for path in sorted(_glob.glob(_os.path.join(root, "CORRECTNESS_r*.json"))):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        round_no = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = _json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
            ):
                seen[name] = max(seen.get(name, 0), round_no)
    return seen


def _gate_order(
    queries: dict,
    pinned: list,
    verified,
    window: int = _GATE_WINDOW,
) -> dict:
    """Pure reordering: pinned core, then never-driver-verified entries
    in catalog order, then the verified remainder ordered STALEST FIRST
    — by last-gated round ascending (``verified`` is a mapping
    ``{name: last_green_round}``; a plain set is accepted and treated as
    all-same-age, degrading to catalog order), catalog position as the
    tiebreak.  The driver's window therefore always re-gates the
    globally oldest-verified entries, and gating bumps an entry's age,
    so worst-case staleness is bounded by ceil(len(verified)/free)
    rounds without any external round counter.  Never drops or alters
    entries; names in ``pinned`` missing from the catalog are skipped.
    When pinned + never-verified would overflow the driver's
    ``window``, pinned names are dropped from the TAIL until every
    never-verified entry fits (never-verified coverage outranks the
    tripwires: a pinned entry has already had green driver rows)."""
    ages = (
        verified
        if hasattr(verified, "get")
        else {n: 0 for n in verified}
    )
    pin = [n for n in pinned if n in queries]
    n_never = sum(1 for n in queries if n not in set(pin) and n not in ages)
    if len(pin) + n_never > window:
        pin = pin[: max(0, window - n_never)]
    head_set = set(pin)
    never = [n for n in queries if n not in head_set and n not in ages]
    pos = {n: i for i, n in enumerate(queries)}
    rest = sorted(
        (n for n in queries if n not in head_set and n in ages),
        key=lambda n: (ages[n], pos[n]),
    )
    return {n: queries[n] for n in pin + never + rest}


_REPO_ROOT = __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))
)

#: entries whose SEMANTICS (query + oracle) changed after already
#: holding a green driver row — their committed age would keep them
#: out of the gate window exactly when re-verification matters most.
#: Maps name -> the last round whose green rows PREDATE the change: a
#: green row from a round <= that value is IGNORED (the entry
#: re-enters the window as never-verified); the first green row from a
#: LATER round — the gate that validates the new semantics — retires
#: the exclusion automatically, no manual cleanup.
_CHANGED_SEMANTICS = {
    "q_masked_twa": 10,  # changed in r11: 120s masks, oracle updated
    "q_pipeline_curate_split": 10,  # changed in r11: raw-markup start
}

_verified_ages = {
    n: r
    for n, r in _driver_verified_rounds(_REPO_ROOT).items()
    if r > _CHANGED_SEMANTICS.get(n, -1)
}
QUERIES = _gate_order(
    QUERIES,
    _GATE_PINNED,
    _verified_ages,
)
