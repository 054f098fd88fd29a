"""Structured Streaming counterparts of the batch interval operators.

The reference is fully batch (SURVEY.md §2.C) — these are engine
extensions so the same interval semantics run over unbounded event
streams: a streaming sessionizer (``F.session_window``, matching batch
:func:`~..operators.sessionize.sessionize` with ``extend_by_gap=True``)
and tumbling-window aggregation (the streaming analogue of
``quantile_windows`` + ``groupby_interval_join``).

Timestamps: Structured Streaming watermarks need a TimestampType column,
so these helpers take the µs-precision timestamp view of our ns-native
world (`ts_ns / 1000` cast to timestamp); output spans are converted
back to canonical bigint-ns structs, truncated to µs — document the 3
dropped decimal digits when feeding results back into ns-exact joins.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.spans import NS_PER_US, exact_floor_div, make_span
from ..session import driver_row


def _ns_to_ts(col):
    return F.timestamp_micros(exact_floor_div(col, NS_PER_US))


def _window_span(window_col):
    return make_span(
        F.unix_micros(window_col.getField("start")) * NS_PER_US,
        F.unix_micros(window_col.getField("end")) * NS_PER_US,
    )


def stream_sessionize(
    events: DataFrame,
    gap_ns: int,
    ts_col: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    watermark: str = "10 minutes",
    spancol: str = "span",
) -> DataFrame:
    """Streaming gap-sessionization: one row per closed session with the
    canonical span struct ``[first_event, last_event + gap)`` and event
    count — semantics of batch ``sessionize(extend_by_gap=True)`` at µs
    resolution.

    Works on a streaming OR batch ``events`` (session_window is valid in
    both); on a stream, rows emit once the watermark passes the session
    end (append mode).  State is Spark-managed session-window state —
    scales horizontally, keyed by ``by``.
    """
    if gap_ns < NS_PER_US:
        raise ValueError("gap_ns must be at least one microsecond")
    by_cols = [by] if isinstance(by, str) else list(by)
    gap_us = gap_ns // NS_PER_US
    with_ts = events.withColumn("__ts", _ns_to_ts(F.col(ts_col)))
    if events.isStreaming:
        with_ts = with_ts.withWatermark("__ts", watermark)
    sw = F.session_window(F.col("__ts"), f"{gap_us} microseconds")
    return (
        with_ts.groupBy(sw.alias("__w"), *by_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *by_cols,
            _window_span(F.col("__w")).alias(spancol),
            "n_events",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "span",
    bin_width_ns: int = 3_600_000_000_000,
    watermark: str = "10 minutes",
    renameon=("_left", "_right"),
    max_span_ns: int | None = None,
    how: str = "inner",
    by=None,
) -> DataFrame:
    """Stream-stream (or mixed / batch-batch) interval overlap join —
    unbounded counterpart of batch ``interval_join`` (half-open;
    ``how='inner'`` or ``'left_outer'``).

    Spark refuses stream-stream joins without an equality predicate, so
    this is the streaming form of the engine's binned rewrite (batch
    ``strategy='binned'``, SURVEY.md §4.3): each span explodes into the
    fixed-width bins it touches, the join is an EQUI-join on the bin id
    plus the residual overlap predicate and the emit-once guard (a pair
    is produced only in the bin where its intersection starts, so no
    deduplication state is needed).

    STATE BOUNDING: watermarks alone do not let Spark evict stream-
    stream join state here — the equi-key is a bin id, not an event-time
    column, and without a time-range constraint relating the two
    watermarked timestamps the state grows without bound.  Pass
    ``max_span_ns`` (an upper bound on span duration, enforced with a
    fused runtime assertion) to add the derivable constraint
    ``|__ts_l - __ts_r| <= max_span_ns`` — any overlapping pair's span
    starts are provably within ``max_span_ns`` of each other, so Spark
    can expire rows once the other side's watermark moves past them.
    When BOTH inputs are streaming, ``max_span_ns`` is therefore
    REQUIRED (a ``ValueError`` otherwise): an unbounded-state production
    join is a deferred OOM, not a working operator.  Batch/availableNow
    and mixed stream-batch inputs may omit it — their state is bounded
    by the batch side.

    ``bin_width_ns`` trades bin fan-out (long spans touch
    ``len/W`` bins) against per-bin pair volume — same cost model as the
    batch path, but streaming favors wider bins since state, not
    shuffle, dominates.  Output matches batch ``interval_join`` at µs
    resolution: renamed span structs plus the intersection column
    appended last.  The reference is fully batch (SURVEY.md §2.C) —
    this is an engine extension, validated against the batch operator
    on file streams in tests.

    ``how='left_outer'`` (streaming counterpart of batch ``keepleft``:
    unmatched left rows emit once the right watermark passes them, with
    null right columns and a null intersection) switches to an
    ASYMMETRIC binning: the symmetric explode would null-pad every
    *bin copy* of a left row that found no partner in that bin, so
    instead the left side keeps exactly ONE row (its start bin) and the
    right side explodes over ``[start - max_span_ns, stop)``.  Any
    overlapping pair then meets in exactly the left row's start bin
    (the left start lies in ``(r.start - left_duration, r.stop)``), so
    no emit-once guard is needed, and outer padding is exact — one
    padded row per truly-unmatched left row.  ``max_span_ns`` is
    REQUIRED for ``left_outer`` (it bounds the right-side bin fan-out
    AND supplies the watermark time-range constraint Spark needs to
    emit outer results); the right fan-out grows by
    ``max_span_ns / bin_width_ns`` bins per row — pick ``bin_width_ns``
    near ``max_span_ns`` when spans are short.  ``how='right_outer'``
    is the mirror image (right side preserved, left side explodes the
    extended range).

    ``by`` (a column name or list) adds equi-key matching — the
    streaming twin of batch ``interval_join_by``: pairs must agree on
    the keys AND overlap.  The keys compound the bin id in the
    equi-join condition, so per-key streams co-partition exactly like
    the batch keyed join; the output carries each key once (coalesced
    across sides, so outer-padded rows keep the preserved side's key).

    Streaming full outer is intentionally not a
    ``how`` mode: with either side exploded, unmatched bin copies would
    each null-pad — use :func:`stream_interval_join_full`, the packaged
    exact two-join composition.
    """
    if how not in ("inner", "left_outer", "right_outer"):
        raise ValueError(
            f"unsupported how {how!r}; use 'inner', 'left_outer' or "
            "'right_outer' (a single-pass streaming full outer would "
            "null-pad every bin copy of the exploded side — use "
            "stream_interval_join_full, the exact two-join composition)"
        )
    outer = how != "inner"
    if outer and max_span_ns is None:
        raise ValueError(
            f"stream_interval_join(how={how!r}) requires max_span_ns: "
            "it bounds the exploded side's bin expansion and provides "
            "the watermark range constraint outer state eviction needs"
        )
    if bin_width_ns < NS_PER_US:
        raise ValueError("bin_width_ns must be at least one microsecond")
    if left.isStreaming and right.isStreaming and max_span_ns is None:
        raise ValueError(
            "stream_interval_join: both inputs are streaming; pass "
            "max_span_ns (an upper bound on span duration) so the join "
            "state is evictable — without the derived time-range "
            "constraint Spark keeps every row ever seen"
        )
    by_keys = [by] if isinstance(by, str) else list(by or [])
    for k in by_keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(
                f"stream_interval_join: by-key {k!r} must exist on both "
                f"sides (left: {left.columns}, right: {right.columns})"
            )
        if k == on:
            raise ValueError(
                "stream_interval_join: by-key cannot be the on column"
            )
    # the right side's keys are renamed for the join and coalesced back
    # into ONE output key column afterwards
    for k in by_keys:
        right = right.withColumnRenamed(k, f"__by_{k}")
    w_us = bin_width_ns // NS_PER_US
    ron_l, ron_r = renameon
    lon, ron = f"{on}{ron_l}", f"{on}{ron_r}"

    # The exploded side's reach-back only has to cover the PRESERVED
    # side's longest span (an overlapping preserved start lies in
    # (start - preserved_duration, stop) — see the prep comment below),
    # but the streaming contract can only promise max_span_ns.  In
    # batch-batch right_outer mode the preserved side is the dimension
    # side of this engine's fact × windows convention, so its true max
    # duration is one tiny column-pruned agg away — and the exploded
    # side is the FACT side, whose bin fan-out multiplies the join
    # build by max_span/bin_width copies per row (141x in
    # q_stream_join_full's 35-day max_span over 6-hour bins).  Probe
    # and tighten (guide §2.3: shuffle/broadcast fewer bytes); skipped
    # for left_outer, where the probe would cost a full pass over the
    # preserved FACT side to shrink the already-small dimension-side
    # explode, and for streams, which cannot be aggregated statically.
    reach_back_ns = int(max_span_ns) if max_span_ns is not None else None
    if (
        how == "right_outer"
        and not left.isStreaming
        and not right.isStreaming
        and reach_back_ns // bin_width_ns > 4
    ):
        _mx = driver_row(
            right.agg(
                F.max(
                    F.col(on).getField("stop") - F.col(on).getField("start")
                )
            )
        )[0]
        if _mx is not None:
            # a non-positive max (all spans empty) still yields a valid
            # bound: prep drops empty preserved spans, so nothing can
            # match and zero reach loses no pairs
            reach_back_ns = min(reach_back_ns, max(int(_mx), 0))

    def prep(df: DataFrame, out_name: str, tag: str):
        d = df.withColumnRenamed(on, out_name)
        start_ns = F.col(f"{out_name}.start")
        stop_ns = F.col(f"{out_name}.stop")
        # empty spans match nothing under '[)'; dropping them also keeps
        # the bin sequence ascending for sub-µs spans
        d = d.filter(stop_ns > start_ns)
        if max_span_ns is not None:
            d = d.filter(
                F.assert_true(
                    stop_ns - start_ns <= F.lit(int(max_span_ns)),
                    F.lit(
                        f"stream_interval_join: span longer than "
                        f"max_span_ns={int(max_span_ns)}"
                    ),
                ).isNull()
            )
        start_us = exact_floor_div(start_ns, NS_PER_US)
        # last touched µs point is floor((stop_ns - 1)/1000) — truncating
        # stop to µs FIRST would drop the final µs (and possibly its bin)
        # for non-µs-aligned stops
        last_us = exact_floor_div(stop_ns - 1, NS_PER_US)
        d = d.withColumn(f"__ts{tag}", F.timestamp_micros(start_us))
        if df.isStreaming:
            d = d.withWatermark(f"__ts{tag}", watermark)
        keep_tag = {"left_outer": "_l", "right_outer": "_r"}.get(how)
        if tag == keep_tag:
            # asymmetric scheme: the preserved side's row exists ONCE,
            # in its start bin — outer padding stays one row per
            # unmatched preserved row
            return d.withColumn("__bin", exact_floor_div(start_us, w_us))
        first_us = start_us
        if keep_tag is not None:
            # ...and the exploded side reaches back far enough to meet
            # any preserved-side start that could overlap it: those
            # starts lie in (start - other_duration, stop) ⊆
            # [start - max_span, stop); +1µs covers the floor-to-µs
            # truncation of a non-µs-aligned max_span (a start exactly
            # max_span-minus-sub-µs earlier floors one µs — possibly
            # one BIN — below the aligned reach)
            first_us = start_us - F.lit(
                reach_back_ns // NS_PER_US + 1
            )
        return d.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    exact_floor_div(first_us, w_us),
                    exact_floor_div(last_us, w_us),
                )
            ),
        )

    l = prep(left, lon, "_l")
    r = prep(right, ron, "_r")
    ls, lstop = F.col(f"{lon}.start"), F.col(f"{lon}.stop")
    rs, rstop = F.col(f"{ron}.start"), F.col(f"{ron}.stop")
    inter_start_us = exact_floor_div(F.greatest(ls, rs), NS_PER_US)
    cond = (l["__bin"] == r["__bin"]) & (ls < rstop) & (rs < lstop)
    for k in by_keys:
        cond = cond & (l[k] == r[f"__by_{k}"])
    if how == "inner":
        # emit-once guard — only meaningful for the symmetric explode;
        # the asymmetric left_outer scheme produces each pair exactly
        # once by construction (the left row exists in one bin)
        cond = cond & (l["__bin"] == exact_floor_div(inter_start_us, w_us))
    if max_span_ns is not None:
        # overlapping spans' starts differ by < max_span (each start is
        # within max_span of the intersection start); +1µs covers the
        # floor-to-µs truncation of both timestamps.  This predicate is
        # on the WATERMARKED columns, which is what lets Spark derive
        # state eviction for the stream-stream case.
        slack_us = int(max_span_ns) // NS_PER_US + 1
        iv = F.expr(f"INTERVAL {slack_us} MICROSECONDS")
        cond = (
            cond
            & (l["__ts_l"] >= r["__ts_r"] - iv)
            & (l["__ts_l"] <= r["__ts_r"] + iv)
        )
    out_cols = [c for c in l.columns if c not in ("__bin", "__ts_l")] + [
        c
        for c in r.columns
        if c not in ("__bin", "__ts_r")
        and c not in [f"__by_{k}" for k in by_keys]
    ]
    # greatest/least SKIP nulls, so guard: padded outer rows must carry
    # a NULL intersection, not the left span
    inter = F.when(
        F.col(lon).isNotNull() & F.col(ron).isNotNull(),
        make_span(F.greatest(ls, rs), F.least(lstop, rstop)),
    ).alias(on)
    out_exprs = [
        F.coalesce(F.col(c), F.col(f"__by_{c}")).alias(c)
        if c in by_keys
        else F.col(c)
        for c in out_cols
    ]
    joined = l.join(r, cond, how).select(*out_exprs, inter)
    if how == "inner":
        return joined
    # outer parity with batch keepleft/keepright: EMPTY preserved-side
    # spans were dropped before the join (they must never match — the
    # raw ls<rstop & rs<lstop predicate would wrongly admit them), but
    # batch pads such rows with nulls; re-add them as a stateless
    # pre-padded branch unioned after the join
    preserved, pres_on, other = (
        (left, lon, r) if how == "left_outer" else (right, ron, l)
    )
    if preserved.isStreaming != joined.isStreaming:
        # batch-preserved vs streaming-other: Spark rejects that outer
        # join shape itself; nothing to pad here
        return joined
    other_cols = [c for c in other.columns if c not in ("__bin", "__ts_l", "__ts_r")]
    empt = preserved.withColumnRenamed(on, pres_on).filter(
        F.col(f"{pres_on}.stop") <= F.col(f"{pres_on}.start")
    )
    def _pad_col(c):
        if c in by_keys:
            # the preserved side owns the key in a padded row; on the
            # right_outer path the preserved frame carries it renamed
            return (
                F.col(c)
                if how == "left_outer"
                else F.col(f"__by_{c}").alias(c)
            )
        if c not in other_cols or c == pres_on:
            return F.col(c)
        return F.lit(None).cast(other.schema[c].dataType).alias(c)

    padded = empt.select(
        *[_pad_col(c) for c in out_cols],
        F.lit(None).cast(joined.schema[on].dataType).alias(on),
    )
    return joined.unionByName(padded)


def stream_interval_join_full(
    left: DataFrame,
    right: DataFrame,
    on: str = "span",
    bin_width_ns: int = 3_600_000_000_000,
    watermark: str = "10 minutes",
    renameon=("_left", "_right"),
    max_span_ns: int | None = None,
    by=None,
) -> DataFrame:
    """Streaming FULL-outer interval join — packaged two-join
    composition (batch ``keepleft=True, keepright=True`` counterpart).

    A single-pass streaming full outer is unsound under the binned
    rewrite: whichever side explodes into bin copies would null-pad
    every unmatched COPY, not every unmatched row (see
    :func:`stream_interval_join`).  The exact composition instead runs
    the two asymmetric outer joins and unions the left-outer result
    with the right-outer result RESTRICTED to unmatched right rows::

        full = left_outer ∪ σ[left is null](right_outer)

    Matched pairs appear once (from the left-outer pass), each
    unmatched row of either side pads once.  Cost: both inputs are
    consumed twice (two join states in streaming mode) — the price of
    exactness; prefer a one-sided outer when only one side needs
    padding.  ``max_span_ns`` is required, as for each outer pass.
    Parity-tested against batch ``interval_join(keepleft=True,
    keepright=True)`` in batch mode and on file streams (the reference
    exercises full outer at test:50-54).
    """
    kwargs = dict(
        on=on,
        bin_width_ns=bin_width_ns,
        watermark=watermark,
        renameon=renameon,
        max_span_ns=max_span_ns,
        by=by,
    )
    if not left.isStreaming and not right.isStreaming:
        # batch-batch mode evaluates ``left`` three times — the
        # left-outer join's preserved side, its empty-span pad branch,
        # and the right-outer pass's exploded side.  When the caller
        # hands a derived pipeline (scan + shuffle + sort + window is
        # the common case), each branch would replay it; persisting the
        # input lets all three read one materialization.  Streaming
        # inputs cannot be persisted (and re-consume by design).
        left = left.persist()
    lo = stream_interval_join(left, right, how="left_outer", **kwargs)
    ro = stream_interval_join(left, right, how="right_outer", **kwargs)
    lon = f"{on}{renameon[0]}"
    return lo.unionByName(ro.filter(F.col(lon).isNull()))


def stream_exact_dedup(
    events: DataFrame,
    key_col: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming exact deduplication: emit only the FIRST row seen per
    ``key_col`` value, across micro-batches, with Spark-managed state —
    the custom-stateful-operator form (``applyInPandasWithState``) of
    batch ``exact_dedup_keep``.

    State is one boolean per distinct key, partitioned by the key — it
    shuffles like a groupBy and scales horizontally; at 100 TB the state
    store holds one entry per distinct document hash, not per row.
    Rows within one micro-batch deduplicate against each other AND
    against all previously seen keys.  Use a hash/fingerprint column as
    ``key_col`` (e.g. ``content_hash(text)`` projected beforehand) so
    the shuffle and the state key stay small.

    Spark's built-in ``dropDuplicates`` on a stream has the same
    semantics but unbounded state and no batch-side equivalence hook;
    this operator exists as the template for richer per-key streaming
    state (counters, seen-window sets, TTL via ``timeout``).
    """
    out_schema = events.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def dedup(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier batch
        first = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.iloc[[0]]
                break
        state.update((True,))
        if first is not None:
            yield first

    return events.groupBy(key_col).applyInPandasWithState(
        dedup, out_schema, state_schema, "append", timeout
    )


def stream_tumbling_agg(
    events: DataFrame,
    width_ns: int,
    aggs: Sequence,
    ts_col: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    watermark: str = "10 minutes",
    spancol: str = "span",
) -> DataFrame:
    """Tumbling fixed-width windows + aggregation over a (possibly
    streaming) event table — the streaming analogue of joining against
    ``quantile_windows`` output: every event lands in exactly one
    ``[k·width, (k+1)·width)`` window.

    ``aggs`` are ready-made aggregate Columns (e.g. ``F.avg('value')``).
    """
    if width_ns < NS_PER_US:
        raise ValueError("width_ns must be at least one microsecond")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    width_us = width_ns // NS_PER_US
    with_ts = events.withColumn("__ts", _ns_to_ts(F.col(ts_col)))
    if events.isStreaming:
        with_ts = with_ts.withWatermark("__ts", watermark)
    win = F.window(F.col("__ts"), f"{width_us} microseconds")
    agged = with_ts.groupBy(win.alias("__w"), *by_cols).agg(*aggs)
    agg_cols = [c for c in agged.columns if c != "__w" and c not in by_cols]
    return agged.select(
        *by_cols,
        _window_span(F.col("__w")).alias(spancol),
        *agg_cols,
    )


def stream_sliding_agg(
    events: DataFrame,
    width_ns: int,
    slide_ns: int,
    aggs: Sequence,
    ts_col: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    watermark: str = "10 minutes",
    spancol: str = "span",
) -> DataFrame:
    """Hopping (sliding) windows + aggregation over a (possibly
    streaming) event table: every event lands in the ``width/slide``
    slide-aligned windows containing it.  ``width_ns % slide_ns == 0``
    required; ``width == slide`` degenerates to
    :func:`stream_tumbling_agg`.

    Runs through Spark's native ``F.window(ts, width, slide)`` —
    watermark-evictable state in streaming mode, plain expand+hash-agg
    in batch mode.  Window alignment (starts ≡ 0 mod slide from the
    epoch) is identical to the batch arithmetic operator
    (:func:`~..operators.timeseries.sliding_window_agg`), so the two
    share one oracle; parity is test-asserted."""
    if width_ns < NS_PER_US or slide_ns < NS_PER_US:
        raise ValueError("width_ns and slide_ns must be at least one microsecond")
    if width_ns % slide_ns != 0:
        raise ValueError(
            f"width must be a multiple of slide, got {width_ns=} {slide_ns=}"
        )
    by_cols = [by] if isinstance(by, str) else list(by or [])
    with_ts = events.withColumn("__ts", _ns_to_ts(F.col(ts_col)))
    if events.isStreaming:
        with_ts = with_ts.withWatermark("__ts", watermark)
    win = F.window(
        F.col("__ts"),
        f"{width_ns // NS_PER_US} microseconds",
        f"{slide_ns // NS_PER_US} microseconds",
    )
    agged = with_ts.groupBy(win.alias("__w"), *by_cols).agg(*aggs)
    agg_cols = [c for c in agged.columns if c != "__w" and c not in by_cols]
    return agged.select(
        *by_cols,
        _window_span(F.col("__w")).alias(spancol),
        *agg_cols,
    )


def stream_merge_spans(
    spans: DataFrame,
    spancol: str = "span",
    by: Union[str, Sequence[str]] = "user_id",
    watermark: str = "10 minutes",
    merge_touching: bool = True,
) -> DataFrame:
    """Streaming island coalescing — the unbounded counterpart of batch
    :func:`~..operators.coalesce.merge_spans` (keyed form).

    An island is emitted exactly once, when the event-time watermark
    (on span START, µs resolution) passes its stop: at that point no
    future span can overlap or touch it, so it is final.  Implemented
    as a custom stateful operator (``applyInPandasWithState``,
    EventTimeTimeout): per-key state is the list of still-open islands
    (arrays of starts/stops/counts — bounded by the watermark delay
    plus span spread, NOT by stream length), merged against each
    micro-batch's sorted spans in O(batch + islands).  Keys idle long
    enough flush via the timeout path, so islands emit even when their
    key never appears again.

    On a BATCH input this delegates to :func:`merge_spans` — identical
    output schema (``by`` + ``spancol`` + ``n_spans``), which is what
    the oracle gate checks; the stream path is validated against the
    batch operator on multi-file streams in tests.

    Watermark caveat: rows are ordered only to watermark precision — a
    span arriving more than ``watermark`` after later starts may be
    merged incorrectly (standard late-data semantics; Spark drops rows
    older than the watermark before the operator sees them).  That
    same filter makes spans starting AT epoch 0 invisible (event-time
    ≤ the engine's initial watermark) — real event data never sits at
    the epoch, but synthetic fixtures must offset their timeline.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError("stream_merge_spans requires at least one key column")

    if not spans.isStreaming:
        from ..operators.coalesce import merge_spans

        return merge_spans(spans, spancol, by_cols, merge_touching)

    src = spans.select(
        *by_cols,
        F.col(spancol).getField("start").alias("__s"),
        F.col(spancol).getField("stop").alias("__e"),
    ).withColumn("__ts", _ns_to_ts(F.col("__s")))
    src = src.withWatermark("__ts", watermark)

    key_fields = [spans.schema[c] for c in by_cols]
    out_schema = T.StructType(
        list(key_fields)
        + [
            T.StructField("__s", T.LongType()),
            T.StructField("__e", T.LongType()),
            T.StructField("n_spans", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("starts", T.ArrayType(T.LongType())),
            T.StructField("stops", T.ArrayType(T.LongType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
        ]
    )
    touch = merge_touching

    def flush(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        islands: list[list[int]] = []
        if state.exists:
            starts, stops, counts = state.get
            islands = [[s, e, c] for s, e, c in zip(starts, stops, counts)]

        if not state.hasTimedOut:
            rows = []
            for pdf in pdfs:
                rows.extend(zip(pdf["__s"].tolist(), pdf["__e"].tolist()))
            for s, e in sorted(rows):
                merged = False
                for isl in islands:
                    # extendable iff intervals overlap or (touching) abut
                    if (s <= isl[1] if touch else s < isl[1]) and (
                        isl[0] <= e if touch else isl[0] < e
                    ):
                        isl[0] = min(isl[0], s)
                        isl[1] = max(isl[1], e)
                        isl[2] += 1
                        merged = True
                        break
                if not merged:
                    islands.append([s, e, 1])
            # merging a new span can bridge two existing islands
            islands.sort()
            compact: list[list[int]] = []
            for isl in islands:
                if compact and (
                    isl[0] <= compact[-1][1] if touch else isl[0] < compact[-1][1]
                ):
                    compact[-1][1] = max(compact[-1][1], isl[1])
                    compact[-1][2] += isl[2]
                else:
                    compact.append(isl)
            islands = compact

        wm_ms = state.getCurrentWatermarkMs()
        wm_ns = wm_ms * 1_000_000
        # closed: no future span (start_ns >= wm_ns) can extend it
        closed = [i for i in islands if (i[1] < wm_ns if touch else i[1] <= wm_ns)]
        if touch:
            open_ = [i for i in islands if i[1] >= wm_ns]
        else:
            open_ = [i for i in islands if i[1] > wm_ns]

        if open_:
            state.update(
                (
                    [i[0] for i in open_],
                    [i[1] for i in open_],
                    [i[2] for i in open_],
                )
            )
            # flush when the watermark passes the earliest open stop;
            # must be strictly beyond the current watermark
            target_ms = min(i[1] for i in open_) // 1_000_000 + 1
            state.setTimeoutTimestamp(max(target_ms, wm_ms + 1))
        else:
            state.remove()

        if closed:
            kvals = list(key) if isinstance(key, tuple) else [key]
            yield pd.DataFrame(
                [kvals + isl for isl in sorted(closed)],
                columns=by_cols + ["__s", "__e", "n_spans"],
            )

    out = src.groupBy(*by_cols).applyInPandasWithState(
        flush, out_schema, state_schema, "append", "EventTimeTimeout"
    )
    return out.select(
        *by_cols,
        make_span(F.col("__s"), F.col("__e")).alias(spancol),
        "n_spans",
    )


def stream_resample_locf(
    obs: DataFrame,
    step_ns: int,
    value_col: str = "value",
    ts_col: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming last-observation-carried-forward resampling — the
    unbounded counterpart of batch
    :func:`~..operators.timeseries.resample_locf` (keyed form, same
    output columns: keys, ``ts`` = grid timestamp, ``ts_right`` /
    ``value_right`` = the carried observation, nulls before a key's
    first observation).

    A grid point ``gt`` is emitted exactly once, when the event-time
    watermark passes it: at that instant no observation with
    ``obs_ts <= gt`` can still arrive, so the carried value is final.
    Custom stateful operator (``applyInPandasWithState``,
    EventTimeTimeout): per-key state is the next unemitted grid point,
    the latest finalized observation, the max observed timestamp (the
    grid ceiling, matching the batch operator's per-key ``[floor(min),
    floor(max)]`` range), and a buffer of not-yet-final observations —
    bounded by the watermark delay, NOT stream length.  Idle keys drain
    via the timeout path.

    Batch inputs delegate to the batch operator."""
    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError("stream_resample_locf requires at least one key")
    if step_ns < NS_PER_US:
        raise ValueError("step_ns must be at least one microsecond")

    if not obs.isStreaming:
        from ..operators.timeseries import resample_locf

        return resample_locf(
            obs.select(*by_cols, ts_col, value_col),
            on=ts_col,
            step=step_ns,
            by=by_cols,
        )

    src = obs.select(
        *by_cols,
        F.col(ts_col).cast("long").alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
    ).withColumn("__ts", _ns_to_ts(F.col("__t")))
    src = src.withWatermark("__ts", watermark)

    key_fields = [obs.schema[c] for c in by_cols]
    out_schema = T.StructType(
        list(key_fields)
        + [
            T.StructField(ts_col, T.LongType()),
            T.StructField(f"{ts_col}_right", T.LongType()),
            T.StructField(f"{value_col}_right", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("next_gt", T.LongType()),
            T.StructField("last_ts", T.LongType()),
            T.StructField("last_val", T.DoubleType()),
            T.StructField("max_ts", T.LongType()),
            T.StructField("buf_ts", T.ArrayType(T.LongType())),
            T.StructField("buf_val", T.ArrayType(T.DoubleType())),
        ]
    )
    step = int(step_ns)

    def flush(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        next_gt = last_ts = max_ts = None
        last_val = None
        buf: list = []
        if state.exists:
            next_gt, last_ts, last_val, max_ts, bts, bvs = state.get
            buf = list(zip(bts, bvs))

        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(zip(pdf["__t"].tolist(), pdf["__v"].tolist()))

        wm_ns = state.getCurrentWatermarkMs() * 1_000_000
        final = sorted(t_v for t_v in buf if t_v[0] < wm_ns)
        buf = [t_v for t_v in buf if t_v[0] >= wm_ns]
        if final or buf:
            hi = max(t for t, _ in final + buf)
            max_ts = hi if max_ts is None else max(max_ts, hi)

        emitted = []
        if final and next_gt is None:
            next_gt = final[0][0] - final[0][0] % step
        grid_hi = None if max_ts is None else max_ts - max_ts % step

        def drain(limit_ns):
            nonlocal next_gt
            while (
                next_gt is not None
                and grid_hi is not None
                and next_gt <= grid_hi
                and next_gt < limit_ns
                and next_gt < wm_ns
            ):
                emitted.append((next_gt, last_ts, last_val))
                next_gt += step

        for t, v in final:
            drain(t)  # grid points strictly before this obs
            last_ts, last_val = t, v
        drain(wm_ns)  # remainder final under the watermark

        done = (
            not buf
            and grid_hi is not None
            and next_gt is not None
            and next_gt > grid_hi
        )
        if done:
            state.remove()
        else:
            state.update(
                (
                    next_gt,
                    last_ts,
                    last_val,
                    max_ts,
                    [t for t, _ in buf],
                    [v for _, v in buf],
                )
            )
            # wake when the watermark passes the next grid point (or
            # the earliest buffered obs, whichever can finalize first)
            pend = [next_gt] if next_gt is not None else []
            pend += [t for t, _ in buf]
            wm_ms = state.getCurrentWatermarkMs()
            if pend:
                state.setTimeoutTimestamp(
                    max(min(pend) // 1_000_000 + 1, wm_ms + 1)
                )
            else:
                state.setTimeoutTimestamp(wm_ms + 60_000)

        if emitted:
            kvals = list(key) if isinstance(key, tuple) else [key]
            yield pd.DataFrame(
                [kvals + list(row) for row in emitted],
                columns=by_cols
                + [ts_col, f"{ts_col}_right", f"{value_col}_right"],
            )

    return src.groupBy(*by_cols).applyInPandasWithState(
        flush, out_schema, state_schema, "append", "EventTimeTimeout"
    )


def stream_minhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    portable: bool = False,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming MinHash near-duplicate CANDIDATES: for every incoming
    document that lands in an LSH band bucket some earlier document
    already occupies, emit ``(id_dup, id_first, band)`` — the streaming
    counterpart of batch :func:`~..operators.dedup.minhash_lsh_pairs`'s
    candidate generation.

    The banding projection is row-local (shared with the batch
    operator, :func:`~..operators.dedup.minhash_banded`), so the only
    stateful piece is one long per occupied (band, bucket): the FIRST
    document id seen there.  State shuffles like a groupBy on the
    bucket key and scales horizontally; at 100 TB it holds one entry
    per occupied bucket, not per document.

    Semantics note: the batch operator emits the full per-bucket
    clique with band counts; the stream emits the STAR (each later doc
    against the bucket's first doc, once per shared band).  Both edge
    sets induce the same connected components, i.e. the same duplicate
    clusters — the invariant the parity test asserts.  Exact
    first-doc identity depends on arrival order (within one micro-batch
    ties break by ascending id).

    Batch inputs are rejected — ``applyInPandasWithState`` is
    streaming-only; use :func:`~..operators.dedup.minhash_lsh_pairs`.
    """
    if not docs.isStreaming:
        raise ValueError(
            "stream_minhash_candidates needs a streaming input; use "
            "operators.dedup.minhash_lsh_pairs for batch tables"
        )
    from ..operators.dedup import minhash_banded

    banded = minhash_banded(
        docs, text_col, id_col, num_hashes, bands, shingle_k, portable
    )
    out_schema = T.StructType(
        [
            T.StructField("id_dup", T.LongType()),
            T.StructField("id_first", T.LongType()),
            T.StructField("band", T.IntegerType()),
        ]
    )
    state_schema = T.StructType([T.StructField("first_id", T.LongType())])
    docs_id_name = id_col

    def emit(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        band = int(key[0])
        first = state.get[0] if state.exists else None
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(v) for v in pdf[docs_id_name].tolist())
        ids.sort()
        dups = []
        for i in ids:
            if first is None:
                first = i
            elif i != first:
                dups.append((i, first, band))
        state.update((first,))
        if dups:
            yield pd.DataFrame(dups, columns=["id_dup", "id_first", "band"])

    return banded.groupBy("band", "bh").applyInPandasWithState(
        emit, out_schema, state_schema, "append", timeout
    )


def stream_interval_filter(
    stream: DataFrame,
    windows: DataFrame,
    on: str = "span",
    bounds: str = "[)",
    keep: str = "inside",
) -> DataFrame:
    """Keep (``keep='inside'``) or drop (``'outside'``) streaming rows
    whose span overlaps a STATIC window set — the stream-static twin
    of :func:`~..operators.interval_join.interval_semi_join` /
    ``interval_anti_join``: retain only rows inside experiment /
    recording / business-hours windows, or censor rows inside
    maintenance / contamination windows, as events arrive.

    STATELESS: the window table broadcasts and the probe is one
    BroadcastNestedLoop left-semi (or left-anti) stream-static join —
    append-mode, no state store, no watermark, output rows are the
    input rows unchanged (never duplicated, however many windows
    match; SQL EXISTS semantics — null spans drop on 'inside' and
    keep on 'outside', like the batch operators, which also makes the
    batch operators the parity oracle).  The static side re-plans per
    micro-batch, so swapping the window table between triggers is
    picked up.

    The window set must be broadcast-sized (it is forced to the
    broadcast strategy — the binned existence path persists id-stamped
    inputs, which a stream cannot).  At 100 TB-of-stream scale that is
    the right constraint: window sets are calendars, not data."""
    if windows.isStreaming:
        raise ValueError(
            "stream_interval_filter requires a STATIC windows table "
            "(use stream_interval_join for stream-stream matching)"
        )
    from ..operators.interval_join import (
        interval_anti_join,
        interval_semi_join,
    )

    if keep == "inside":
        return interval_semi_join(
            stream, windows, on=on, bounds=bounds, strategy="broadcast_right"
        )
    if keep == "outside":
        return interval_anti_join(
            stream, windows, on=on, bounds=bounds, strategy="broadcast_right"
        )
    raise ValueError(f"keep must be 'inside' or 'outside', got {keep!r}")


def stream_incremental_dedup(
    docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    portable: bool = False,
    min_shared_bands: int = 1,
) -> DataFrame:
    """Streaming twin of
    :func:`~..operators.dedup.incremental_minhash_dedup`: every
    arriving document is probed against a PERSISTED history band index
    (:func:`~..operators.dedup.write_minhash_index`) and emitted with
    ``kept`` — the online ingest-dedup shape: history is never
    re-paired, the probe is per-document, and the output is
    append-mode with NO state and NO watermark.

    Statelessness is the design: instead of exploding the band keys
    (which would force a per-document re-aggregation the streaming
    engine only allows under a watermark), the ``bands`` keys stay as
    one array column and the probe is ``bands`` stream-static LEFT
    joins on band key — each a static-side equi-join the engine
    re-plans per micro-batch, so index updates between batches are
    picked up automatically.  ``kept`` is false when >=
    ``min_shared_bands`` of the joins hit (matching the batch
    operator's countDistinct-band semantics: k history docs in one
    bucket count once).

    Works unchanged on a batch ``docs`` input (the joins are ordinary),
    which is how the oracle and the batch-parity test drive it.

    Scale shape: each join's static side is the per-band slice of the
    index, pre-bucketed on ``bh`` by the index writer — the stream side
    is micro-batch-sized, so every join broadcasts or shuffles only the
    increment; history is read in place.  Persist/cache the index table
    when micro-batches are frequent — ``bands`` scans per trigger
    otherwise."""
    from ..operators.dedup import with_minhash_bands

    keyed = with_minhash_bands(
        docs, text_col, num_hashes, bands, shingle_k, portable, out_col="__bk"
    )
    probe = keyed.select(
        "*", *[F.col("__bk")[b].alias(f"__k{b}") for b in range(bands)]
    ).drop("__bk")
    n_hit = F.lit(0)
    for b in range(bands):
        side = (
            index.filter(F.col("band") == b)
            .select(F.col("bh").alias(f"__k{b}"))
            .distinct()
            .withColumn(f"__hit{b}", F.lit(1))
        )
        probe = probe.join(side, f"__k{b}", "left")
        n_hit = n_hit + F.when(F.col(f"__hit{b}").isNotNull(), 1).otherwise(0)
    return probe.select(
        *docs.columns,
        (n_hit < F.lit(min_shared_bands)).alias("kept"),
    )


def stream_latest_by_key(
    changes: DataFrame,
    keys: Union[str, Sequence[str]],
    ts_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Streaming latest-state (CDC upsert) view: one row per key
    holding the most recent change by ``ts_col`` — the streaming form
    of :func:`~..operators.cdc.apply_cdc`'s per-key reduction, as a
    plain stateful aggregation (``max_by`` over a ``(ts, is_delete)``
    struct ordering, so equal-timestamp ties break toward the delete
    exactly like the batch operator).

    Run with ``outputMode('update')`` (each trigger emits only keys
    whose latest row changed) or ``'complete'``.  Deletes surface as
    TOMBSTONE rows with ``op_col`` retained — an append-only sink
    cannot retract, so downstream consumers filter
    ``op != delete_op``; keep ``op_col=None`` for insert/update-only
    streams.  The same expression runs unchanged on a batch DataFrame,
    which is how the DuckDB oracle checks it.

    State: ONE struct per distinct key (the winning row), partitioned
    by key — bounded by key cardinality, not stream length; no
    watermark needed because late data is handled by the ordering
    itself (an older change simply loses ``max_by``).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    payload = [c for c in changes.columns if c not in ks]
    is_del = (
        (F.col(op_col) == F.lit(delete_op)) if op_col else F.lit(False)
    )
    order = F.struct(F.col(ts_col).alias("t"), is_del.alias("d"))
    agg = changes.groupBy(*ks).agg(
        F.max_by(F.struct(*payload), order).alias("__latest")
    )
    return agg.select(
        *ks, *[F.col(f"__latest.{c}").alias(c) for c in payload]
    )


def stream_cusum(
    events: DataFrame,
    value_col: str,
    target: int,
    slack: int,
    threshold: int,
    ts_col: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Streaming two-sided CUSUM change detection — the unbounded
    counterpart of batch
    :func:`~..operators.timeseries.cusum_changepoints` (same output
    columns: keys, ``ts_col``, ``value_col``, ``s_hi``, ``s_lo``,
    ``alarm``; same integer recursion with post-alarm resets).

    Custom stateful operator (``applyInPandasWithState``): per-key
    state is exactly TWO bigints (the post-reset accumulators) — the
    smallest possible streaming state, independent of stream length.
    Rows within a micro-batch are processed in ``ts_col`` order;
    CROSS-batch ordering is the source's responsibility (CUSUM is a
    sequential statistic — out-of-order arrival changes any online
    implementation; feed it per-key-ordered streams, e.g. a
    partitioned log).  Batch inputs delegate to the batch operator,
    which is also the parity oracle.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError("stream_cusum requires at least one key")
    if threshold <= 0 or slack < 0:
        raise ValueError(
            f"need threshold > 0 and slack >= 0, got {threshold=} {slack=}"
        )

    if not events.isStreaming:
        from ..operators.timeseries import cusum_changepoints

        return cusum_changepoints(
            events,
            value_col,
            target=target,
            slack=slack,
            threshold=threshold,
            ts_col=ts_col,
            by=by_cols,
            order_tiebreak=order_tiebreak,
        )

    tgt, k, h = int(target), int(slack), int(threshold)
    key_fields = [events.schema[c] for c in by_cols]
    out_schema = T.StructType(
        list(key_fields)
        + [
            T.StructField(ts_col, events.schema[ts_col].dataType),
            T.StructField(value_col, events.schema[value_col].dataType),
            T.StructField("s_hi", T.LongType()),
            T.StructField("s_lo", T.LongType()),
            T.StructField("alarm", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("c_hi", T.LongType()),
            T.StructField("c_lo", T.LongType()),
        ]
    )
    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    src = events.select(
        *by_cols, *([order_tiebreak] if order_tiebreak else []), ts_col,
        value_col,
    )

    def scan(key, pdfs, state):
        hi, lo = state.get if state.exists else (0, 0)
        hi, lo = int(hi), int(lo)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((hi, lo))
            return
        batch = pd.concat(chunks).sort_values(order, kind="mergesort")
        his, los, alarms = [], [], []
        for x in batch[value_col].tolist():
            x = int(x)
            hi = max(0, hi + (x - tgt - k))
            lo = max(0, lo + (tgt - x - k))
            alarm = hi > h or lo > h
            his.append(hi)
            los.append(lo)
            alarms.append(alarm)
            if alarm:
                hi = lo = 0
        state.update((hi, lo))
        out = batch[[*by_cols, ts_col, value_col]].copy()
        out["s_hi"], out["s_lo"], out["alarm"] = his, los, alarms
        yield out

    return src.groupBy(*by_cols).applyInPandasWithState(
        scan, out_schema, state_schema, "append", "NoTimeout"
    )


def stream_hampel(
    events: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    half_window: int = 3,
    k_num: int = 44478,
    k_den: int = 10000,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Streaming Hampel despiking — the unbounded counterpart of batch
    :func:`~..operators.timeseries.hampel_despike` (same columns, same
    exact lower-median/MAD bigint test).

    A sample emits once ``half_window`` LATER samples of its key have
    arrived: its rolling frame is then complete, so every emitted row
    is bit-identical to the batch operator's (including each key's
    FIRST samples, whose leading edge shrinks the same way).  The
    trailing edge — the newest ``half_window`` samples — stays pending
    in state (an unbounded stream has no end to clip against); state
    per key is one ``2·half_window+1``-sample ring plus a counter,
    independent of stream length.  In-order per-key arrival assumed
    (see :func:`stream_cusum`).  Batch inputs delegate to the batch
    operator, which is also the parity oracle."""
    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError("stream_hampel requires at least one key")
    if half_window < 1:
        raise ValueError(f"half_window must be >= 1, got {half_window}")

    if not events.isStreaming:
        from ..operators.timeseries import hampel_despike

        return hampel_despike(
            events,
            value_col,
            ts_col=ts_col,
            by=by_cols,
            half_window=half_window,
            k_num=k_num,
            k_den=k_den,
            order_tiebreak=order_tiebreak,
        )

    # the state ring is LongType: the streaming path requires bigint
    # ts and value (the engine's ns-native/fixed-point contract) —
    # fail loudly rather than TypeError inside an executor
    for c in (ts_col, value_col):
        if not isinstance(events.schema[c].dataType, T.LongType):
            raise ValueError(
                f"stream_hampel: streaming input column {c!r} must be "
                f"BIGINT (got {events.schema[c].dataType.simpleString()}"
                "); convert timestamps to epoch-ns first"
            )
    w, kn, kd = int(half_window), int(k_num), int(k_den)
    key_fields = [events.schema[c] for c in by_cols]
    out_schema = T.StructType(
        list(key_fields)
        + [
            T.StructField(ts_col, events.schema[ts_col].dataType),
            T.StructField(value_col, events.schema[value_col].dataType),
            T.StructField("med", T.LongType()),
            T.StructField("mad", T.LongType()),
            T.StructField("is_spike", T.BooleanType()),
            T.StructField("cleaned", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("buf_ts", T.ArrayType(T.LongType())),
            T.StructField("buf_x", T.ArrayType(T.LongType())),
            T.StructField("n_seen", T.LongType()),
        ]
    )
    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    src = events.select(
        *by_cols, *([order_tiebreak] if order_tiebreak else []), ts_col,
        value_col,
    )

    def scan(key, pdfs, state):
        buf: list = []
        n_seen = 0
        if state.exists:
            bts, bxs, n_seen = state.get
            buf = list(zip(bts, bxs))
            n_seen = int(n_seen)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update(
                ([t for t, _ in buf], [x for _, x in buf], n_seen)
            )
            return
        batch = pd.concat(chunks).sort_values(order, kind="mergesort")
        out = []
        for t, x in zip(batch[ts_col].tolist(), batch[value_col].tolist()):
            buf.append((int(t), int(x)))
            if len(buf) > 2 * w + 1:
                buf.pop(0)
            n_seen += 1
            if n_seen > w:
                # center = the sample w positions back; its frame is the
                # whole ring (leading edges shrink exactly like batch)
                ci = len(buf) - 1 - w
                vals = sorted(v for _, v in buf)
                med = vals[(len(vals) + 1) // 2 - 1]
                devs = sorted(abs(v - med) for v in vals)
                mad = devs[(len(devs) + 1) // 2 - 1]
                tc, xc = buf[ci]
                spike = abs(xc - med) * kd > kn * mad
                out.append(
                    (tc, xc, med, mad, spike, med if spike else xc)
                )
        state.update(([t for t, _ in buf], [x for _, x in buf], n_seen))
        if out:
            res = pd.DataFrame(
                out,
                columns=[ts_col, value_col, "med", "mad", "is_spike", "cleaned"],
            )
            for i, c in enumerate(by_cols):
                res[c] = key[i]
            yield res[[*by_cols, ts_col, value_col, "med", "mad", "is_spike", "cleaned"]]

    return src.groupBy(*by_cols).applyInPandasWithState(
        scan, out_schema, state_schema, "append", "NoTimeout"
    )


def stream_validity_intervals(
    events: DataFrame,
    attrs: Sequence[str],
    on: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Streaming SCD2 construction — the unbounded counterpart of batch
    :func:`~..operators.timeseries.validity_intervals`: one row per
    CLOSED run of unchanged ``attrs``, ``[valid_from, valid_to)``.

    Append-mode semantics: a run emits when the NEXT run's first event
    closes it; each key's current run stays open in state (batch mode
    emits it with null ``valid_to`` — streaming never can, an unbounded
    stream may always extend it), so streaming output == the batch
    operator's non-null-``valid_to`` rows — the parity oracle.

    Custom stateful operator (``applyInPandasWithState``): per-key
    state is the open run's attrs + start time — independent of stream
    length.  Null attribute values are values (null-safe change
    comparison, same contract as batch).  In-order per-key arrival
    assumed (see :func:`stream_cusum`).  Batch inputs delegate to the
    batch operator.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError("stream_validity_intervals requires at least one key")
    attrs = list(attrs)
    if not attrs:
        raise ValueError("attrs must be non-empty")

    if not events.isStreaming:
        from ..operators.timeseries import validity_intervals

        return validity_intervals(
            events,
            attrs=attrs,
            on=on,
            by=by_cols,
            order=[order_tiebreak] if order_tiebreak else (),
        )

    on_type = events.schema[on].dataType
    key_fields = [events.schema[c] for c in by_cols]
    out_schema = T.StructType(
        list(key_fields)
        + [events.schema[a] for a in attrs]
        + [
            T.StructField("valid_from", on_type),
            T.StructField("valid_to", on_type),
        ]
    )
    # state: open-run attrs (their own types) + run start + a has-run flag
    state_schema = T.StructType(
        [T.StructField(f"a_{i}", events.schema[a].dataType)
         for i, a in enumerate(attrs)]
        + [
            T.StructField("run_from", on_type),
            T.StructField("has_run", T.BooleanType()),
        ]
    )
    order = [on] + ([order_tiebreak] if order_tiebreak else [])
    src = events.select(
        *by_cols, *([order_tiebreak] if order_tiebreak else []), on, *attrs
    )

    def _canon(v):
        # pandas surfaces SQL NULL as None or NaN depending on dtype;
        # canonicalize so the null-safe comparison sees one null
        if v is None or (isinstance(v, float) and v != v):
            return None
        return v

    def scan(key, pdfs, state):
        if state.exists:
            st = state.get
            cur = tuple(_canon(x) for x in st[: len(attrs)])
            run_from, has_run = st[len(attrs)], bool(st[len(attrs) + 1])
        else:
            cur, run_from, has_run = (), None, False
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update(tuple(cur) + (run_from, has_run) if has_run
                         else tuple([None] * len(attrs)) + (None, False))
            return
        batch = pd.concat(chunks).sort_values(order, kind="mergesort")
        closed = []
        for row in batch.itertuples(index=False):
            rd = row._asdict()
            vals = tuple(_canon(rd[a]) for a in attrs)
            t = rd[on]
            if not has_run:
                cur, run_from, has_run = vals, t, True
            elif vals != cur:
                closed.append(cur + (run_from, t))
                cur, run_from = vals, t
        state.update(tuple(cur) + (run_from, True))
        if closed:
            res = pd.DataFrame(
                closed, columns=[*attrs, "valid_from", "valid_to"]
            )
            for i, c in enumerate(by_cols):
                res[c] = key[i]
            yield res[[*by_cols, *attrs, "valid_from", "valid_to"]]

    return src.groupBy(*by_cols).applyInPandasWithState(
        scan, out_schema, state_schema, "append", "NoTimeout"
    )


def stream_asof_enrich_static(
    events: DataFrame,
    states: DataFrame,
    on: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    payload: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of enrichment of a STREAMING event stream against a STATIC
    states table — the mixed case :func:`stream_asof_enrich` (a
    stream↔stream union-and-scan) cannot express: attach to every
    event the latest state row with ``state.on <= event.on`` for the
    same key, where the dimension is a fixed table (reference data, a
    published SCD snapshot, yesterday's model registry).

    STATELESS by construction: each state row is turned into its
    validity window ``[on, next on)`` with one ``lead()`` window over
    the static side, and the probe is a single stream-static LEFT join
    on ``key AND event.on inside window`` — append-mode, no state
    store, no watermark, and the static plan is re-evaluated per
    micro-batch, so replacing the underlying table between batches is
    picked up.  Exactly one match per event (windows partition the
    timeline per key), so the join IS the as-of.

    ``(by, on)`` must be unique on the states side (duplicate
    timestamps would make windows ambiguous — raise upstream or
    pre-reduce).  Batch inputs run the identical plan, which is how
    the parity test pins it to :func:`~..operators.asof_join.asof_join`
    (``direction='backward'``, tie matches, like DuckDB ASOF).

    Output: event columns + ``<on><suffix>`` (matched state timestamp,
    null when no state precedes) + each payload column as
    ``<col><suffix>``.

    Scale shape: the static side shuffles once per micro-batch for the
    ``lead()`` window and then joins by key — persist the windowed
    dimension (or pre-write it with
    :func:`~..operators.timeseries.validity_intervals`) when triggers
    are frequent; the stream side is micro-batch-sized."""
    from pyspark.sql import Window

    if states.isStreaming:
        raise ValueError(
            "stream_asof_enrich_static requires a STATIC states table; "
            "use stream_asof_enrich for stream-stream enrichment"
        )
    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError("stream_asof_enrich_static requires at least one key")
    pay = [c for c in (payload or
                       [c for c in states.columns
                        if c != on and c not in by_cols])]
    if not pay:
        raise ValueError("states has no payload columns")
    w = Window.partitionBy(*by_cols).orderBy(on)
    iv = states.select(*by_cols, on, *pay).withColumn(
        "__vto", F.lead(on).over(w)
    )
    iv = iv.select(
        *[F.col(k).alias(f"__k_{i}") for i, k in enumerate(by_cols)],
        F.col(on).alias(f"{on}{suffix}"),
        F.col("__vto"),
        *[F.col(c).alias(f"{c}{suffix}") for c in pay],
    )
    cond = F.lit(True)
    for i, k in enumerate(by_cols):
        cond = cond & (events[k] == iv[f"__k_{i}"])
    cond = (
        cond
        & (events[on] >= iv[f"{on}{suffix}"])
        & (iv["__vto"].isNull() | (events[on] < iv["__vto"]))
    )
    return events.join(iv, cond, "left").select(
        *[events[c] for c in events.columns],
        iv[f"{on}{suffix}"],
        *[iv[f"{c}{suffix}"] for c in pay],
    )


def stream_asof_enrich(
    events: DataFrame,
    states: DataFrame,
    on: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    payload: Sequence[str] | None = None,
    suffix: str = "_right",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Streaming as-of enrichment: attach to every ``events`` row the
    most recent ``states`` row with ``state.on <= event.on`` for the
    same key — the unbounded counterpart of batch
    :func:`~..operators.asof_join.asof_join` (``direction='backward'``;
    exact timestamp ties match, like DuckDB ASOF and the batch
    operator).

    The classic stream-enrichment shape (attach latest user profile /
    model version / experiment arm to each event).  Both inputs are
    unioned into ONE keyed stream and scanned by a custom stateful
    operator (``applyInPandasWithState``): per-key state is the latest
    state row's payload + timestamp — independent of stream length,
    shuffled once on the key like a groupBy.

    Ordering contract: rows are processed in ``(on, tiebreak)`` order
    WITHIN a micro-batch (state rows before event rows on exact ties),
    and batches must arrive per-key in order across sources — the same
    in-order contract as every sequential twin here
    (:func:`stream_cusum`); feed it per-key-partitioned logs.  Batch
    inputs delegate to the batch operator, which is the parity oracle.

    Output: event columns + each payload column as ``<col><suffix>`` +
    ``<on><suffix>`` (the matched state timestamp; all null when no
    state row precedes the event).

    Mode contract: both inputs streaming (the union-and-scan path) or
    both batch (delegates to :func:`asof_join`).  A streaming events
    table against a STATIC states table is not supported here — the
    two sides are unioned, and Spark rejects a stream↔batch union;
    that shape is :func:`stream_asof_enrich_static` (a stateless
    validity-window stream-static join).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError("stream_asof_enrich requires at least one key")
    if events.isStreaming != states.isStreaming:
        raise ValueError(
            "stream_asof_enrich requires both inputs streaming or both "
            "batch (the sides are unioned into one keyed stream, and "
            "Spark does not support a stream↔batch union). For a static "
            "states table use stream_asof_enrich_static."
        )
    pay = [c for c in (payload or
                       [c for c in states.columns
                        if c != on and c not in by_cols])]
    if not pay:
        raise ValueError("states has no payload columns")

    if not events.isStreaming and not states.isStreaming:
        from ..operators.asof_join import asof_join

        return asof_join(
            events,
            states.select(*by_cols, on, *pay),
            on=on,
            by=by_cols,
            direction="backward",
            suffix=suffix,
        )

    on_type = events.schema[on].dataType
    ev_cols = events.columns
    out_schema = T.StructType(
        [events.schema[c] for c in ev_cols]
        + [T.StructField(f"{on}{suffix}", on_type)]
        + [
            T.StructField(f"{c}{suffix}", states.schema[c].dataType)
            for c in pay
        ]
    )
    state_schema = T.StructType(
        [T.StructField(f"p_{i}", states.schema[c].dataType)
         for i, c in enumerate(pay)]
        + [T.StructField("s_ts", on_type)]
    )

    # tagged union: state rows tag 0 (sort before events at equal ts),
    # event rows tag 1 carrying their full payload as null state cols
    tiebreak = [order_tiebreak] if order_tiebreak else []
    ev_side = events.select(
        *by_cols,
        F.col(on).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in tiebreak],
        F.struct(*[F.col(c) for c in ev_cols]).alias("__ev"),
        *[F.lit(None).cast(states.schema[c].dataType).alias(f"__p_{i}")
          for i, c in enumerate(pay)],
    )
    st_side = states.select(
        *by_cols,
        F.col(on).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(events.schema[c].dataType
                           if c in ev_cols else "long").alias(c)
          for c in tiebreak],
        F.lit(None).cast(ev_side.schema["__ev"].dataType).alias("__ev"),
        *[F.col(c).alias(f"__p_{i}") for i, c in enumerate(pay)],
    ).select(*ev_side.columns)
    unioned = ev_side.unionByName(st_side)

    order = ["__t", "__tag", *tiebreak]

    def scan(key, pdfs, state):
        if state.exists:
            st = state.get
            last_p, last_t = list(st[: len(pay)]), st[len(pay)]
        else:
            last_p, last_t = [None] * len(pay), None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update(tuple(last_p) + (last_t,))
            return
        batch = pd.concat(chunks).sort_values(order, kind="mergesort")
        out_rows = []
        # itertuples mangles dunder-prefixed names — use dict records
        for rd in batch.to_dict("records"):
            if rd["__tag"] == 0:
                last_p = [rd[f"__p_{i}"] for i in range(len(pay))]
                last_t = rd["__t"]
            else:
                ev = rd["__ev"]
                vals = (ev if isinstance(ev, dict)
                        else ev._asdict() if hasattr(ev, "_asdict")
                        else dict(zip(ev_cols, ev)))
                out_rows.append(
                    tuple(vals[c] for c in ev_cols)
                    + (last_t,)
                    + tuple(last_p)
                )
        state.update(tuple(last_p) + (last_t,))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[*ev_cols, f"{on}{suffix}",
                         *[f"{c}{suffix}" for c in pay]],
            )

    return unioned.groupBy(*by_cols).applyInPandasWithState(
        scan, out_schema, state_schema, "append", "NoTimeout"
    )


def stream_lsh_probe(
    spark,
    path: str,
    queries: DataFrame,
    threshold: float = 0.8,
    probe_radius: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming ANN probe against a PERSISTED LSH index
    (:func:`~..operators.similarity.write_lsh_index`): every arriving
    query vector is hashed row-locally (the same deterministic
    hyperplanes, Arrow-batched), its probe buckets joined
    stream-static against the id-only bucket table, candidates fetched
    from the raw table and scored with the EXACT cosine; rows with
    ``score >= threshold`` are emitted as ``(q_id, n_id, score)`` —
    the online retrieval shape (dedup-on-ingest, near-real-time
    similarity alerts).

    Stateless by design: append-mode, NO state, NO watermark.  Top-k
    ranking is a non-time window (not allowed stateless), so the
    streaming operator emits the THRESHOLDED candidate set; a
    downstream batch step ranks if needed.  A (q, n) pair reachable
    through several tables is emitted exactly once WITHOUT a dedup
    shuffle: within a table at most one probe mask can hit a given
    neighbor (the mask is determined by the two buckets), and across
    tables a first-matching-table guard — computable row-locally
    because BOTH sides carry their per-table bucket arrays — keeps
    only the earliest table within ``probe_radius`` hamming distance
    (same emit-once philosophy as the batch multi-table join and the
    binned interval join).

    Works unchanged on a batch ``queries`` input, which is how the
    oracle (`q_stream_lsh_probe`) and the parity test drive it.

    Scale shape: the static sides are re-planned per micro-batch (index
    updates picked up automatically); the stream side is micro-batch
    sized, so each join moves only the increment."""
    from ..operators.similarity import (
        _dot,
        _explode_probes,
        lsh_hash_frame,
        lsh_table_seed,
        probe_masks,
    )

    meta = driver_row(spark.read.parquet(f"{path}/meta"))
    dim, n_planes, n_tables = (
        meta["dim"], meta["n_planes"], meta["n_tables"],
    )
    seeds = [lsh_table_seed(t) for t in range(n_tables)]
    masks = probe_masks(n_planes, probe_radius)

    qh = lsh_hash_frame(queries, id_col, vec_col, dim, n_planes, seeds)
    qe = _explode_probes(
        qh.select(
            F.col("id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("bs").alias("qbs"),
            "bs",
        ),
        n_tables,
        masks,
    )
    from ..operators.similarity import _read_lsh_tables

    bt, raw = _read_lsh_tables(spark, path)
    cand = qe.join(bt, ["tbl", "bucket"]).filter(
        F.col("n_id") != F.col("q_id")
    )
    fetched = cand.join(raw, "n_id")
    # first-matching-table emit-once guard: tables are probed in order;
    # keep the row only when no EARLIER table already matched within
    # probe_radius (least() skips the null branches of unmatched tables)
    first_tbl = F.least(
        *[
            F.when(
                F.bit_count(
                    F.element_at(F.col("qbs"), t + 1).bitwiseXOR(
                        F.element_at(F.col("cbs"), t + 1)
                    )
                )
                <= probe_radius,
                F.lit(t),
            )
            for t in range(n_tables)
        ]
    ) if n_tables > 1 else F.lit(0)
    score = (
        _dot(F.col("cv"), F.col("qv")).cast("double")
        / F.sqrt(F.col("cn").cast("double") * F.col("qn").cast("double"))
    )
    return (
        fetched.filter(F.col("tbl") == first_tbl)
        .select("q_id", "n_id", score.alias("score"))
        .filter(F.col("score") >= float(threshold))
        .select("q_id", "n_id", F.round("score", 6).alias("score"))
    )


def stream_bloom_decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    min_overlap: int = 1,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Streaming decontamination at ingest: every arriving document is
    flagged against the (static, batch) eval set by
    :func:`~..operators.dedup.bloom_decontaminate_rowlocal` — the eval
    bloom is ONE collected array literal (n_bits/8 bytes, constant in
    eval-set size) and the probe is a pure row-local expression, so
    the streaming plan is stateless, append-mode, join-free, and
    shuffle-free (zero Exchanges, plan-tested).  One-sided error as
    the batch twin: a truly contaminated document is never missed.
    The eval side is evaluated ONCE when the query is defined —
    re-define the stream to pick up eval-set changes."""
    from ..operators.dedup import bloom_decontaminate_rowlocal

    return bloom_decontaminate_rowlocal(
        docs,
        eval_df,
        text_col=text_col,
        id_col=id_col,
        shingle_k=shingle_k,
        min_overlap=min_overlap,
        n_bits=n_bits,
        n_hashes=n_hashes,
        portable=portable,
    )


def stream_mixture_sample(
    docs: DataFrame,
    thresholds,
    by: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Streaming data-mixture rebalancing at ingest: arriving documents
    pass the same content-keyed ppm hash filter as
    :func:`~..operators.sampling.mixture_sample`, against thresholds
    FROZEN from a batch snapshot
    (:func:`~..operators.sampling.mixture_thresholds` — a stream has
    no count table to collect).  The filter is one narrow row-local
    CASE: stateless, append-mode, join-free, shuffle-free, and
    bit-identical to the batch operator on the same rows, so a
    backfill and the live stream keep exactly the same documents.
    Re-define the stream to pick up refreshed thresholds."""
    from ..operators.sampling import apply_mixture_thresholds

    return apply_mixture_thresholds(
        docs, thresholds, by=by, key_col=key_col, salt=salt
    )


def stream_duplicate_spans(
    docs: DataFrame,
    index_table: str,
    sink,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    min_docs: int = 2,
    portable: bool = False,
    available_now: bool = False,
):
    """Ingest-time PASSAGE dedup on a stream: every micro-batch of
    arriving documents is probed against the persisted gram index
    (:func:`~..operators.dedup.write_gram_index`) with
    :func:`~..operators.dedup.incremental_duplicate_spans`, and the
    per-batch span report is handed to ``sink(report_df, epoch_id)``.

    Why foreachBatch and not a stream-static join chain like
    :func:`stream_incremental_dedup`: the span report needs a
    per-(doc, position) aggregation AND the island-merge window —
    steps append-mode streaming disallows without state, but which are
    a bounded batch job per trigger (increment-sized, history read in
    place, never reshuffled).  The index TABLE NAME is re-resolved
    every trigger, so ``write_gram_index(mode='append')`` segments
    landing between batches are picked up automatically.  Zero
    streaming state; exactly-once is the sink's contract — write
    idempotently by ``epoch_id`` (the append_lsh_index pattern).
    Returns the started StreamingQuery."""
    from ..operators.dedup import incremental_duplicate_spans

    def _apply(batch, epoch_id):
        if batch.isEmpty():
            return
        idx = batch.sparkSession.table(index_table)
        report = incremental_duplicate_spans(
            batch,
            idx,
            text_col=text_col,
            id_col=id_col,
            shingle_k=shingle_k,
            min_docs=min_docs,
            portable=portable,
        )
        sink(report, epoch_id)

    writer = (
        docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_ivfpq_index(
    vectors: DataFrame,
    path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = False,
):
    """Maintain a persisted IVF-PQ index from a STREAM of arriving
    vectors — :func:`maintain_lsh_index`'s twin for the quantized
    index: each micro-batch is cell-assigned and PQ-encoded with the
    index's FROZEN models and appended as an idempotent epoch-named
    update segment
    (:func:`~..operators.similarity.append_ivfpq_index`).  Probes via
    ``ivf_pq_topk_indexed`` see arrivals immediately; a periodic
    ``write_ivfpq_index`` rebuild re-trains the models and compacts
    the segments away.  Returns the started StreamingQuery."""
    from ..operators.similarity import append_ivfpq_index

    def _apply(batch, epoch_id):
        if batch.isEmpty():
            return
        append_ivfpq_index(batch, path, epoch_id, id_col, vec_col)

    writer = (
        vectors.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_lsh_index(
    vectors: DataFrame,
    path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = False,
):
    """Maintain a persisted LSH index from a STREAM of arriving
    vectors — the write twin of :func:`stream_lsh_probe`: each
    micro-batch is hashed with the index's own meta parameters and
    appended as an idempotent epoch-named update segment
    (:func:`~..operators.similarity.append_lsh_index`), so probes
    defined after the batch see the new vectors WITHOUT a full index
    rebuild.  Returns the started StreamingQuery.

    Exactly-once: foreachBatch may replay an epoch after failure; the
    segment write is mode-overwrite into ``updates/e{epoch}``, so a
    replay rewrites the identical directory (the same idempotence
    contract update_register_index gets from version-then-prune —
    append-only data wants segments, merge-able sketches want
    versions).  Segment count grows one per batch: periodically
    rebuild with write_lsh_index (drops ``updates/`` wholesale) — the
    compaction step.  The index must already exist (``meta`` holds the
    hashing parameters new segments must share)."""
    from ..operators.similarity import append_lsh_index

    def _apply(batch, epoch_id):
        if batch.isEmpty():
            return
        append_lsh_index(batch, path, epoch_id, id_col, vec_col)

    writer = (
        vectors.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_winsorize(
    docs: DataFrame,
    bounds,
    value_col: str,
    by: str = None,
    out_col: str = None,
) -> DataFrame:
    """Streaming outlier clipping at ingest: arriving rows clip to
    per-group quantile bounds FROZEN from a batch snapshot
    (:func:`~..operators.sampling.winsorize_bounds` — a stream has no
    sample to rank).  One narrow row-local CASE — stateless,
    append-mode, join-free, bit-identical to the batch
    :func:`~..operators.sampling.winsorize` on the same rows and
    bounds.  Re-define the stream to pick up refreshed bounds."""
    from ..operators.sampling import apply_winsorize_bounds

    return apply_winsorize_bounds(
        docs, bounds, value_col, by=by, out_col=out_col
    )


def stream_duration_in_state(
    samples: DataFrame,
    windows: DataFrame,
    state_col: str,
    ts_col: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    order_tiebreak: str | None = None,
    window_span_col: str = "span",
) -> DataFrame:
    """Streaming time-in-state per window — the unbounded twin of batch
    :func:`~..operators.timeseries.duration_in_state`, composing
    :func:`stream_validity_intervals` (the hard stateful half) with a
    stateless stream-static broadcast interval join against the STATIC
    ``windows`` dimension table.

    Append-mode semantics: a state run contributes once it CLOSES (the
    next state change arrives); the streaming output is the PER-RUN
    increment stream ``(keys, window labels, state, dur_ns)`` — one row
    per (closed run ∩ window) piece — because an aggregation after a
    stateful operator cannot emit in append mode.  Sum ``dur_ns`` per
    (key, window, state) at the sink (or in a foreachBatch rollup
    merge): that sum equals the batch operator restricted to closed
    runs (pytest parity, exact when a terminal sample closes each
    key's last run).  The open run's tail is never emitted — an
    unbounded stream may always extend it; batch mode instead clamps
    it, the one documented divergence.

    Batch inputs run the SAME closed-runs composition and return the
    AGGREGATED rollup (keys + window labels + state + dur_ns) — this
    is the shape ``q_stream_duration_in_state`` gates against its
    closed-runs oracle.  Keys are required (per-key state).
    """
    from ..operators.interval_join import interval_join

    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError("stream_duration_in_state requires at least one key")
    label_cols = [c for c in windows.columns if c != window_span_col]
    if not label_cols:
        raise ValueError(
            "stream_duration_in_state: windows must carry at least one "
            "label column besides the span"
        )
    runs = stream_validity_intervals(
        samples,
        attrs=[state_col],
        on=ts_col,
        by=by_cols,
        order_tiebreak=order_tiebreak,
    )
    vs = (
        runs.filter(
            F.col("valid_to").isNotNull()
            & (F.col("valid_from") < F.col("valid_to"))
        )
        .select(
            *by_cols,
            state_col,
            make_span(F.col("valid_from"), F.col("valid_to")).alias("span"),
        )
    )
    # Join strategy per deployment mode: a live stream-static join must
    # broadcast the static side (stateless append-mode operator).  In
    # BATCH mode the same closed-runs composition is free to pick the
    # join physically — against a LARGE windows side (e.g. the masked-
    # TWA fragment set) the forced broadcast is a BroadcastNestedLoop
    # evaluating |runs|·|windows| pairs, while auto's binned rewrite
    # meets only same-bin pairs (guide §3.1).  The runs table is
    # persisted so auto's stats probe does not recompute the validity
    # pipeline (same pattern as batch time_weighted_avg).
    w2 = (
        windows.withColumnRenamed(window_span_col, "span")
        if window_span_col != "span"
        else windows
    )
    if samples.isStreaming:
        j = interval_join(vs, w2, validate="skip", strategy="broadcast_right")
    else:
        vs = vs.persist()
        j = interval_join(vs, w2, validate="skip", strategy="auto")
    pieces = j.select(
        *by_cols,
        *label_cols,
        state_col,
        (F.col("span.stop") - F.col("span.start")).alias("dur_ns"),
    )
    if samples.isStreaming:
        return pieces
    return pieces.groupBy(*by_cols, *label_cols, state_col).agg(
        F.expr("CAST(sum(dur_ns) AS BIGINT)").alias("dur_ns")
    )


def stream_counter_windows(
    samples: DataFrame,
    windows: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    order_tiebreak: str | None = None,
    window_span_col: str = "span",
) -> DataFrame:
    """Streaming windowed counter deltas — the unbounded twin of batch
    :func:`~..operators.timeseries.counter_windows`: a tiny per-key
    state (previous sample's value + timestamp) turns each arriving
    sample into an OBSERVATION (step under the reset rule, reset flag,
    covered ns), which then stabs the STATIC ``windows`` table through
    the stateless broadcast point-in-span join.

    Append-mode semantics: the output is the per-observation increment
    stream ``(keys, window labels, step, reset, dur)`` — counter
    attribution already happens at observation instants, so summing
    the increments per (key, window) reproduces the batch operator
    EXACTLY (no open-run divergence; the first sample per key anchors
    only, same as batch).  ``rate_fp6`` is a sink-side derivation:
    ``Σstep · 1e15 DIV Σdur``.  In-order per-key arrival assumed
    (see :func:`stream_cusum`).

    Batch inputs delegate to :func:`~..operators.timeseries.
    counter_windows` (identical semantics, aggregated shape) — what
    ``q_stream_counter_windows`` gates against the shared oracle.
    """
    from ..operators.interval_join import point_in_span_join
    from ..operators.timeseries import counter_windows

    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError("stream_counter_windows requires at least one key")
    label_cols = [c for c in windows.columns if c != window_span_col]
    if not label_cols:
        raise ValueError(
            "stream_counter_windows: windows must carry at least one "
            "label column besides the span"
        )
    if not samples.isStreaming:
        return counter_windows(
            samples,
            windows,
            value_col,
            ts_col=ts_col,
            by=by_cols,
            order=[order_tiebreak] if order_tiebreak else (),
            window_span_col=window_span_col,
        )
    j = _stream_obs_windows(
        samples, windows, value_col, ts_col, by_cols,
        order_tiebreak, window_span_col, gauge=False,
    )
    label_cols = [c for c in windows.columns if c != window_span_col]
    return j.select(
        *by_cols,
        *label_cols,
        F.col("__st").alias("step"),
        F.col("__rs").alias("reset"),
        F.col("__dur").alias("dur"),
    )


def _stream_obs_windows(
    samples: DataFrame,
    windows: DataFrame,
    value_col: str,
    ts_col: str,
    by_cols: list,
    order_tiebreak: str | None,
    window_span_col: str,
    gauge: bool,
) -> DataFrame:
    """Shared streaming kernel of :func:`stream_counter_windows` and
    :func:`stream_gauge_windows`: per-key prev-sample state turns each
    arrival into an observation — ``__st`` under the counter reset
    rule, or the raw SIGNED difference when ``gauge`` — plus the reset
    flag and covered ns, then stabs the static windows broadcast-side.
    Returns the joined increment stream with internal column names."""
    from ..operators.interval_join import point_in_span_join

    on_type = samples.schema[ts_col].dataType
    if on_type.simpleString() != "bigint":
        raise ValueError(
            "streaming windowed counters/gauges: ts_col must be BIGINT "
            f"epoch-ns in streaming mode, got {on_type.simpleString()}"
        )
    key_fields = [samples.schema[c] for c in by_cols]
    out_schema = T.StructType(
        list(key_fields)
        + [
            T.StructField(ts_col, T.LongType()),
            T.StructField("__st", T.LongType()),
            T.StructField("__rs", T.LongType()),
            T.StructField("__dur", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("prev_v", T.LongType()),
            T.StructField("prev_t", T.LongType()),
            T.StructField("has", T.BooleanType()),
        ]
    )
    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    src = samples.select(
        *by_cols,
        *([order_tiebreak] if order_tiebreak else []),
        ts_col,
        # itertuples renames underscore-leading columns positionally —
        # keep the internal value alias underscore-free
        F.col(value_col).cast("long").alias("cw_v"),
    )

    def scan(key, pdfs, state):
        if state.exists:
            prev_v, prev_t, has = state.get
            has = bool(has)
        else:
            prev_v, prev_t, has = None, None, False
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((prev_v, prev_t, has))
            return
        batch = pd.concat(chunks).sort_values(order, kind="mergesort")
        obs = []
        for row in batch.itertuples(index=False):
            rd = row._asdict()
            t, v = int(rd[ts_col]), int(rd["cw_v"])
            if has:
                delta = v - prev_v
                if gauge:
                    st, rs = delta, 0
                else:
                    st = v if delta < 0 else delta
                    rs = 1 if delta < 0 else 0
                obs.append((t, st, rs, t - prev_t))
            prev_v, prev_t, has = v, t, True
        state.update((prev_v, prev_t, True))
        if obs:
            res = pd.DataFrame(
                obs, columns=[ts_col, "__st", "__rs", "__dur"]
            )
            for i, c in enumerate(by_cols):
                res[c] = key[i]
            yield res[[*by_cols, ts_col, "__st", "__rs", "__dur"]]

    observations = src.groupBy(*by_cols).applyInPandasWithState(
        scan, out_schema, state_schema, "append", "NoTimeout"
    )
    return point_in_span_join(
        observations,
        windows.withColumnRenamed(window_span_col, "span")
        if window_span_col != "span"
        else windows,
        ts_col=ts_col,
        validate="skip",
        strategy="broadcast_right",
    )


def stream_gauge_windows(
    samples: DataFrame,
    windows: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    order_tiebreak: str | None = None,
    window_span_col: str = "span",
) -> DataFrame:
    """Streaming windowed gauge deltas — the unbounded twin of batch
    :func:`~..operators.timeseries.gauge_windows` and the signed
    no-reset sibling of :func:`stream_counter_windows` (same
    prev-sample state, same static stab join): the output is the
    per-observation increment stream ``(keys, window labels, d, dur)``
    with ``d`` the raw SIGNED consecutive difference.  Summing ``d``
    and ``dur`` per (key, window) reproduces the batch ``delta`` /
    ``covered_dur`` / ``rate_fp6`` EXACTLY; ``idelta``/``irate`` are
    the latest increment per group at the sink (each arriving
    increment simply supersedes the previous — the append stream IS
    the irate feed).  In-order per-key arrival assumed.

    Batch inputs delegate to the batch operator (aggregated shape,
    incl. idelta/irate) — what ``q_stream_gauge_windows`` gates
    against the shared oracle."""
    from ..operators.timeseries import gauge_windows

    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError("stream_gauge_windows requires at least one key")
    label_cols = [c for c in windows.columns if c != window_span_col]
    if not label_cols:
        raise ValueError(
            "stream_gauge_windows: windows must carry at least one "
            "label column besides the span"
        )
    if not samples.isStreaming:
        return gauge_windows(
            samples,
            windows,
            value_col,
            ts_col=ts_col,
            by=by_cols,
            order=[order_tiebreak] if order_tiebreak else (),
            window_span_col=window_span_col,
        )
    j = _stream_obs_windows(
        samples, windows, value_col, ts_col, by_cols,
        order_tiebreak, window_span_col, gauge=True,
    )
    return j.select(
        *by_cols,
        *label_cols,
        F.col(ts_col),
        F.col("__st").alias("d"),
        F.col("__dur").alias("dur"),
    )


def stream_ohlc_windows(
    samples: DataFrame,
    windows: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    order_tiebreak: str | None = None,
    window_span_col: str = "span",
) -> DataFrame:
    """Streaming candlestick feed — the STATELESS member of the
    windowed-twin family: OHLC needs no cross-row state at all (every
    sample is its own increment), so the streaming path is just the
    broadcast stabbing join, emitting ``(keys, window labels, ts,
    [tiebreak], v)`` rows in append mode.  The sink derives the candle
    with the same partial-aggregable picks batch uses
    (``min_by/max_by(v, struct(ts, tiebreak))``, ``min``, ``max`` —
    parity-tested).  Batch inputs delegate to
    :func:`~..operators.timeseries.ohlc_windows` (aggregated shape),
    which is what ``q_stream_ohlc_windows`` gates against the shared
    oracle."""
    from ..operators.interval_join import point_in_span_join
    from ..operators.timeseries import ohlc_windows

    by_cols = [by] if isinstance(by, str) else list(by or [])
    label_cols = [c for c in windows.columns if c != window_span_col]
    if not label_cols:
        raise ValueError(
            "stream_ohlc_windows: windows must carry at least one "
            "label column besides the span"
        )
    if not samples.isStreaming:
        return ohlc_windows(
            samples,
            windows,
            value_col,
            ts_col=ts_col,
            by=by_cols or None,
            order=[order_tiebreak] if order_tiebreak else (),
            window_span_col=window_span_col,
        )
    pts = samples.select(
        *by_cols,
        ts_col,
        *([order_tiebreak] if order_tiebreak else []),
        F.col(value_col).cast("long").alias("v"),
    )
    return point_in_span_join(
        pts,
        windows.withColumnRenamed(window_span_col, "span")
        if window_span_col != "span"
        else windows,
        ts_col=ts_col,
        validate="skip",
        strategy="broadcast_right",
    )


def stream_time_weighted(
    samples: DataFrame,
    windows: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    order_tiebreak: str | None = None,
    window_span_col: str = "span",
) -> DataFrame:
    """Streaming LOCF time-weight — the unbounded twin of batch
    :func:`~..operators.timeseries.time_weighted_avg` and a direct
    REUSE of :func:`stream_duration_in_state` with the VALUE column
    playing the state: a held fixed-point value is just a state whose
    per-window duration is its LOCF weight.

    Streaming output: the per-closed-run increment stream
    ``(keys, window labels, value, dur_ns)``; the sink derives the
    average as ``Σ(value·dur_ns) DIV Σdur_ns`` (DECIMAL-accumulated,
    parity-tested).  Closed-runs semantics: the open run never emits
    (batch ``time_weighted_avg`` instead clamps it to the horizon —
    the family's one documented batch/stream divergence; exact parity
    when a terminal sample closes each series).

    Batch inputs run the same closed-runs composition and return the
    aggregated ``covered_dur``/``twa`` rollup — what
    ``q_stream_time_weighted`` gates against its open-tail-dropped
    oracle."""
    pieces = stream_duration_in_state(
        samples,
        windows,
        value_col,
        ts_col=ts_col,
        by=by,
        order_tiebreak=order_tiebreak,
        window_span_col=window_span_col,
    )
    if samples.isStreaming:
        return pieces
    by_cols = [by] if isinstance(by, str) else list(by)
    label_cols = [c for c in windows.columns if c != window_span_col]
    dec = "DECIMAL(38,0)"
    return pieces.groupBy(*by_cols, *label_cols).agg(
        F.expr("CAST(sum(dur_ns) AS BIGINT)").alias("covered_dur"),
        F.expr(
            f"CAST(sum(CAST({value_col} AS {dec})"
            f" * CAST(dur_ns AS {dec}))"
            f" DIV sum(CAST(dur_ns AS {dec})) AS BIGINT)"
        ).alias("twa"),
    )


def stream_stats2d_windows(
    samples: DataFrame,
    windows: DataFrame,
    x_col: str,
    y_col: str,
    ts_col: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    window_span_col: str = "span",
) -> DataFrame:
    """Streaming 2-D statistics feed — stateless like
    :func:`stream_ohlc_windows`: every sample is its own moment
    increment ``(1, x, y, x², xy, y²)``, so the stream is the
    broadcast stabbing join emitting ``(keys, window labels, x, y)``
    rows in append mode; the sink accumulates the DECIMAL moment sums
    (``sum(CAST(x AS DECIMAL(38,0)))`` etc. — parity-tested against
    batch) and the float statistics derive from those exactly as
    :func:`~..operators.timeseries.corr_from_stats2d` does.  This is
    the streaming face of the stats_agg MERGEABILITY property: the
    per-batch sums the sink keeps simply add.

    Batch inputs delegate to
    :func:`~..operators.timeseries.stats2d_windows` (aggregated
    string-sum shape) — what ``q_stream_stats2d`` gates against the
    shared oracle."""
    from ..operators.interval_join import point_in_span_join
    from ..operators.timeseries import stats2d_windows

    by_cols = [by] if isinstance(by, str) else list(by or [])
    label_cols = [c for c in windows.columns if c != window_span_col]
    if not label_cols:
        raise ValueError(
            "stream_stats2d_windows: windows must carry at least one "
            "label column besides the span"
        )
    if not samples.isStreaming:
        return stats2d_windows(
            samples,
            windows,
            x_col,
            y_col,
            ts_col=ts_col,
            by=by_cols or None,
            window_span_col=window_span_col,
        )
    pts = samples.select(
        *by_cols,
        ts_col,
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    return point_in_span_join(
        pts,
        windows.withColumnRenamed(window_span_col, "span")
        if window_span_col != "span"
        else windows,
        ts_col=ts_col,
        validate="skip",
        strategy="broadcast_right",
    )


def stream_hll_windows(
    samples: DataFrame,
    windows: DataFrame,
    key_col: str,
    p: int = 8,
    ts_col: str = "ts",
    window_span_col: str = "span",
) -> DataFrame:
    """Streaming windowed approximate-distinct feed — the register-
    merge maintenance pattern live: every sample row-locally maps to
    its HLL register coordinate ``(window labels, __idx, __rho)``
    (:func:`~..operators.sampling.hll_register_exprs`) through the
    broadcast stabbing join, emitted stateless in APPEND mode; the
    sink maintains ``max(__rho)`` per (labels, __idx) — max is
    associative/commutative/idempotent, so per-micro-batch maxima
    just re-max, and
    :func:`~..operators.sampling.hll_from_registers` finalizes the
    estimate from ≤ 2^p register rows per window at read time
    (parity-tested against batch registers bit-for-bit).

    Batch inputs delegate to the stab + hll_distinct composition —
    what ``q_stream_hll_windows`` gates against the shared register-
    replay oracle."""
    from ..operators.interval_join import point_in_span_join
    from ..operators.sampling import hll_distinct, hll_register_exprs

    label_cols = [c for c in windows.columns if c != window_span_col]
    if not label_cols:
        raise ValueError(
            "stream_hll_windows: windows must carry at least one "
            "label column besides the span"
        )
    j = point_in_span_join(
        samples.select(key_col, ts_col),
        windows.withColumnRenamed(window_span_col, "span")
        if window_span_col != "span"
        else windows,
        ts_col=ts_col,
        validate="skip",
        strategy="broadcast_right",
    )
    if not samples.isStreaming:
        return hll_distinct(j, key_col, p=p, by=label_cols)
    idx, rho = hll_register_exprs(key_col, p)
    return j.select(
        *label_cols, idx.alias("__idx"), rho.alias("__rho")
    )


def stream_topn_windows(
    samples: DataFrame,
    windows: DataFrame,
    key_col: str,
    n: int,
    ts_col: str = "ts",
    window_span_col: str = "span",
    weight_col: Optional[str] = None,
) -> DataFrame:
    """Streaming top-N-keys-per-window feed — counts are the mergeable
    state (per-micro-batch (window, key) counts just add; the rank is
    a read-time derivation over O(windows · keys) sink rows, never
    over samples): the stream is the broadcast stabbing join emitting
    ``(window labels, key[, weight])`` rows in APPEND mode; the sink
    accumulates ``count(*)`` / ``sum(weight)`` per (labels, key) and
    ranks with the batch operator's deterministic (cnt DESC, key ASC)
    total order.

    Batch inputs delegate to
    :func:`~..operators.timeseries.topn_windows` — what
    ``q_stream_topn_windows`` gates against the shared oracle."""
    from ..operators.interval_join import point_in_span_join
    from ..operators.timeseries import topn_windows

    label_cols = [c for c in windows.columns if c != window_span_col]
    if not label_cols:
        raise ValueError(
            "stream_topn_windows: windows must carry at least one "
            "label column besides the span"
        )
    if not samples.isStreaming:
        return topn_windows(
            samples,
            windows,
            key_col,
            n,
            ts_col=ts_col,
            window_span_col=window_span_col,
            weight_col=weight_col,
        )
    return point_in_span_join(
        samples.select(
            key_col, ts_col, *([weight_col] if weight_col else [])
        ),
        windows.withColumnRenamed(window_span_col, "span")
        if window_span_col != "span"
        else windows,
        ts_col=ts_col,
        validate="skip",
        strategy="broadcast_right",
    ).select(*label_cols, key_col, *([weight_col] if weight_col else []))


def stream_heartbeat_windows(
    beats: DataFrame,
    windows: DataFrame,
    liveness_ns: int,
    ts_col: str = "ts",
    by: Union[str, Sequence[str]] = "user_id",
    window_span_col: str = "span",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming heartbeat-uptime feed — the composition twin of
    :func:`~..operators.timeseries.heartbeat_windows`: beats become
    liveness spans ``[t, t+liveness_ns)``, :func:`stream_merge_spans`
    emits each live ISLAND exactly once when the watermark passes its
    stop (bounded per-key state), and a stream-static broadcast
    overlap join clamps finalized islands into the dimension-sized
    windows — the stream carries ``(keys, window labels, live_ns,
    island)`` rows in APPEND mode, one per (island, window)
    intersection; the sink accumulates ``sum(live_ns)`` /
    ``count(*)`` per (keys, labels), which add trivially across
    micro-batches because each island is emitted once (parity-tested
    against batch).

    Batch inputs delegate to the batch operator — what
    ``q_stream_heartbeat_windows`` gates against the shared oracle."""
    from ..operators.timeseries import heartbeat_windows

    if liveness_ns <= 0:
        raise ValueError(
            f"liveness_ns must be positive, got {liveness_ns}"
        )
    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError(
            "stream_heartbeat_windows requires at least one key column"
        )
    label_cols = [c for c in windows.columns if c != window_span_col]
    if not label_cols:
        raise ValueError(
            "stream_heartbeat_windows: windows must carry at least one "
            "label column besides the span"
        )
    if not beats.isStreaming:
        return heartbeat_windows(
            beats,
            windows,
            liveness_ns,
            ts_col=ts_col,
            by=by_cols,
            window_span_col=window_span_col,
        )
    t = F.col(ts_col).cast("long")
    spans = beats.select(
        *by_cols, make_span(t, t + F.lit(int(liveness_ns))).alias("span")
    )
    islands = stream_merge_spans(
        spans, "span", by_cols, watermark=watermark
    )
    w = windows.withColumnRenamed(window_span_col, "span") \
        if window_span_col != "span" else windows
    iv = F.col("__dfi_hb_i.span")
    wv = F.col("__dfi_hb_w.span")
    inter = F.least(iv.getField("stop"), wv.getField("stop")) - F.greatest(
        iv.getField("start"), wv.getField("start")
    )
    return (
        islands.alias("__dfi_hb_i")
        .join(
            F.broadcast(w.alias("__dfi_hb_w")),
            (iv.getField("start") < wv.getField("stop"))
            & (wv.getField("start") < iv.getField("stop")),
            "inner",
        )
        .select(
            *by_cols,
            *label_cols,
            inter.cast("long").alias("live_ns"),
        )
    )


def stream_histogram_windows(
    samples: DataFrame,
    windows: DataFrame,
    value_col: str,
    lo: int,
    hi: int,
    nbuckets: int,
    ts_col: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    window_span_col: str = "span",
) -> DataFrame:
    """Streaming equi-width-histogram feed — the twin of
    :func:`~..operators.timeseries.histogram_windows`: bucket counts
    are the mergeable sink state (per-micro-batch (key, window,
    bucket) counts just add), so the stream is the bucket projection
    + broadcast stabbing join emitting ``(keys, window labels,
    bucket)`` rows in APPEND mode — stateless, no watermark needed —
    and the sink accumulates ``count(*)`` per group.

    Batch inputs delegate to the batch operator — what
    ``q_stream_histogram_windows`` gates against the shared oracle."""
    from ..operators.interval_join import point_in_span_join
    from ..operators.timeseries import (
        _by_cols,
        histogram_bucket_expr,
        histogram_windows,
    )

    if not samples.isStreaming:
        return histogram_windows(
            samples,
            windows,
            value_col,
            lo,
            hi,
            nbuckets,
            ts_col=ts_col,
            by=by,
            window_span_col=window_span_col,
        )
    keys = _by_cols(by)
    label_cols = [c for c in windows.columns if c != window_span_col]
    if not label_cols:
        raise ValueError(
            "stream_histogram_windows: windows must carry at least "
            "one label column besides the span"
        )
    obs = samples.select(
        *keys,
        F.col(ts_col),
        F.expr(histogram_bucket_expr(value_col, lo, hi, nbuckets)).alias(
            "bucket"
        ),
    )
    return point_in_span_join(
        obs,
        windows.withColumnRenamed(window_span_col, "span")
        if window_span_col != "span"
        else windows,
        ts_col=ts_col,
        validate="skip",
        strategy="broadcast_right",
    ).select(*keys, *label_cols, "bucket")


def stream_entropy_windows(
    samples: DataFrame,
    windows: DataFrame,
    label_col: str,
    labels: Sequence[str],
    ts_col: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    window_span_col: str = "span",
) -> DataFrame:
    """Streaming label-diversity feed — the twin of
    :func:`~..operators.timeseries.entropy_windows`: the pivoted label
    counts are the mergeable sink state (per-micro-batch (key, window,
    label) counts just add; the entropy formula is a read-time
    projection over the dimension-sized count table), so the stream is
    the stateless broadcast stabbing join emitting ``(keys, window
    labels, label)`` rows in APPEND mode.

    Batch inputs delegate to the batch operator — what
    ``q_stream_entropy_windows`` gates against the shared oracle."""
    from ..operators.interval_join import point_in_span_join
    from ..operators.timeseries import _by_cols, entropy_windows

    if not samples.isStreaming:
        return entropy_windows(
            samples,
            windows,
            label_col,
            labels,
            ts_col=ts_col,
            by=by,
            window_span_col=window_span_col,
        )
    keys = _by_cols(by)
    label_cols = [c for c in windows.columns if c != window_span_col]
    if not label_cols:
        raise ValueError(
            "stream_entropy_windows: windows must carry at least one "
            "label column besides the span"
        )
    return point_in_span_join(
        samples.select(*keys, F.col(ts_col), F.col(label_col)),
        windows.withColumnRenamed(window_span_col, "span")
        if window_span_col != "span"
        else windows,
        ts_col=ts_col,
        validate="skip",
        strategy="broadcast_right",
    ).select(*keys, *label_cols, label_col)


def stream_psi_timeline(
    df: DataFrame,
    value_col: str,
    lo: int,
    hi: int,
    nbuckets: int,
    period_ns: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming drift-monitor feed — the twin of
    :func:`~..operators.profile.psi_timeline`: the (period, bucket)
    integer counts are the mergeable sink state (per-micro-batch
    counts just add; the consecutive-period PSI is a read-time
    projection over the dimension-sized count table), so the stream is
    a STATELESS row-local projection emitting ``(period, bucket)`` in
    APPEND mode — no watermark, no state store, every row exactly
    once.

    Batch inputs delegate to the batch operator — what
    ``q_stream_psi_timeline`` gates against the shared oracle."""
    from ..operators.profile import psi_timeline
    from ..operators.timeseries import histogram_bucket_expr

    if not df.isStreaming:
        return psi_timeline(
            df, value_col, lo, hi, nbuckets, period_ns, ts_col=ts_col
        )
    if nbuckets < 1:
        raise ValueError(f"nbuckets must be >= 1, got {nbuckets}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if period_ns <= 0:
        raise ValueError(f"period_ns must be positive, got {period_ns}")
    t = f"CAST({ts_col} AS BIGINT)"
    period = f"(({t} - pmod({t}, {period_ns})) DIV {period_ns})"
    bucket = histogram_bucket_expr(value_col, lo, hi, nbuckets)
    return df.select(
        F.expr(period).alias("period"), F.expr(bucket).alias("bucket")
    )


def stream_benford(df: DataFrame, col: str) -> DataFrame:
    """Streaming Benford audit feed — the twin of
    :func:`~..operators.profile.benford_digits`: per-digit counts are
    the mergeable sink state, the expected/chi-square columns are a
    read-time projection, so the stream is a stateless row-local digit
    extraction in APPEND mode (rows with integer part < 1 drop, same
    as batch).

    Batch inputs delegate to the batch operator — what
    ``q_stream_benford`` gates against the shared oracle."""
    from ..operators.profile import benford_digits

    if not df.isStreaming:
        return benford_digits(df, col)
    iv = F.floor(F.abs(F.col(col))).cast("long")
    return (
        df.select(iv.alias("__iv"))
        .filter(F.col("__iv") >= 1)
        .select(
            F.substring(F.col("__iv").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
    )


def stream_interarrival(
    df: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("ts", "event_id"),
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming inter-arrival feed — the STATEFUL twin of
    :func:`~..operators.timeseries.interarrival_histogram`: per-key
    state is the last event timestamp, carried across micro-batches
    (``applyInPandasWithState``), so the gap that SPANS a batch
    boundary is emitted exactly once — a stateless projection cannot
    produce it.  Each batch's rows sort by ``order_cols`` inside the
    key before differencing (cross-batch arrival order is the stream's
    contract: a row older than the carried state yields a non-positive
    gap, which the decade bucketing sends to -1, same as an exact tie
    in batch).

    The sink accumulates mergeable per-decade counts; the decade is a
    row-local read-time projection of the emitted ``gap`` (the same
    integer string-length rule as batch).  Batch inputs delegate to
    the batch operator — what ``q_stream_interarrival`` gates against
    the shared oracle.

    State: ONE bigint per distinct key, partitioned by the key —
    shuffles like a groupBy, horizontally scalable.
    """
    from ..operators.timeseries import interarrival_histogram

    if not df.isStreaming:
        return interarrival_histogram(
            df, by=by, ts_col=ts_col, order_cols=order_cols
        )
    order = list(order_cols)
    out_schema = T.StructType([T.StructField("gap", T.LongType())])
    state_schema = T.StructType([T.StructField("last_ts", T.LongType())])

    def gaps(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order, kind="mergesort")
            for ts in pdf[ts_col].astype("int64"):
                if last is not None:
                    out.append(int(ts) - int(last))
                last = int(ts)
        if last is not None:
            state.update((last,))
        if out:
            yield pd.DataFrame({"gap": pd.Series(out, dtype="int64")})

    cols = list(dict.fromkeys([by, *order, ts_col]))
    return (
        df.select(*cols)
        .groupBy(by)
        .applyInPandasWithState(
            gaps, out_schema, state_schema, "append", timeout
        )
    )


def stream_markov_pairs(
    df: DataFrame,
    by: str = "user_id",
    type_col: str = "event_type",
    order_cols: Sequence[str] = ("ts", "event_id"),
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming transition feed — the STATEFUL twin of
    :func:`~..operators.asof_join.markov_transitions`: per-key state is
    the last event type, carried across micro-batches, so the
    transition that spans a batch boundary is emitted exactly once.
    Rows sort by ``order_cols`` inside the key per batch; NULL types
    break the chain exactly as in batch (the NULL is still consumed
    into state, so neither ``x -> NULL`` nor ``NULL -> y`` emits).

    The sink accumulates mergeable ``(from_type, to_type)`` counts;
    the per-from totals and ppm probabilities are a read-time
    projection over the |types|^2-bounded count table.  Batch inputs
    delegate — what ``q_stream_markov`` gates against the shared
    oracle.  State: ONE string per distinct key.
    """
    from ..operators.asof_join import markov_transitions

    if not df.isStreaming:
        return markov_transitions(
            df, by=by, type_col=type_col, order_cols=order_cols
        )
    order = list(order_cols)
    out_schema = T.StructType(
        [
            T.StructField("from_type", T.StringType()),
            T.StructField("to_type", T.StringType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("has_last", T.BooleanType()),
            T.StructField("last_type", T.StringType()),
        ]
    )

    def pairs(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            _has, last = state.get
        else:
            _has, last = False, None
        out_f, out_t = [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order, kind="mergesort")
            for t in pdf[type_col]:
                t = None if pd.isna(t) else str(t)
                if _has and last is not None and t is not None:
                    out_f.append(last)
                    out_t.append(t)
                _has, last = True, t
        state.update((_has, last))
        if out_f:
            yield pd.DataFrame({"from_type": out_f, "to_type": out_t})

    cols = list(dict.fromkeys([by, *order, type_col]))
    return (
        df.select(*cols)
        .groupBy(by)
        .applyInPandasWithState(
            pairs, out_schema, state_schema, "append", timeout
        )
    )


def stream_drawdown(
    df: DataFrame,
    value_col: str,
    by: str = "user_id",
    order_cols: Sequence[str] = ("ts", "event_id"),
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming drawdown feed — the STATEFUL twin of
    :func:`~..operators.timeseries.max_drawdown`: per-key state is the
    running peak (``applyInPandasWithState``), carried across
    micro-batches so a decline measured against a PREVIOUS batch's
    peak is attributed correctly.  Each batch emits ONE row per active
    key — the batch-local maxima of (peak, drawdown, relative
    drawdown) given the carried peak — and because every emitted
    statistic is a running MAX, the sink merge is ``max()`` per key:
    mergeable state, exactly like the count-based twins.

    NULL values drop (batch parity).  Batch inputs delegate — what
    ``q_stream_drawdown`` gates against the shared oracle.  State:
    one double per distinct key.
    """
    from ..operators.timeseries import max_drawdown

    if not df.isStreaming:
        return max_drawdown(
            df, value_col, by=by, order_cols=order_cols
        )
    order = list(order_cols)
    # the key column keeps the ``by`` name; bigint keys only (the
    # engine's id convention) — a string-keyed variant would carry the
    # key dtype through here
    out_schema = T.StructType(
        [
            T.StructField(by, T.LongType()),
            T.StructField("peak", T.DoubleType()),
            T.StructField("max_drawdown", T.DoubleType()),
            T.StructField("max_drawdown_rel", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("peak", T.DoubleType())]
    )

    def dd(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        peak = state.get[0] if state.exists else None
        best_dd, best_rel = None, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order, kind="mergesort")
            vals = pdf[value_col]
            for v in vals:
                if pd.isna(v):
                    continue
                v = float(v)
                if peak is None or v > peak:
                    peak = v
                d = peak - v
                if best_dd is None or d > best_dd:
                    best_dd = d
                if peak > 0:
                    r = d / peak
                    if best_rel is None or r > best_rel:
                        best_rel = r
        if peak is None:
            return  # batch carried only NULLs for this key
        state.update((peak,))
        yield pd.DataFrame(
            {
                by: pd.Series([key[0]], dtype="int64"),
                "peak": [peak],
                "max_drawdown": [best_dd],
                "max_drawdown_rel": [
                    best_rel if best_rel is not None else None
                ],
            }
        )

    cols = list(dict.fromkeys([by, *order, value_col]))
    return (
        df.select(*cols)
        .groupBy(by)
        .applyInPandasWithState(
            dd, out_schema, state_schema, "append", timeout
        )
    )


def stream_event_paths(
    df: DataFrame,
    by: str = "user_id",
    type_col: str = "event_type",
    order_cols: Sequence[str] = ("ts", "event_id"),
    depth: int = 3,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming path-mining feed — the STATEFUL twin of
    :func:`~..operators.asof_join.event_path_counts`: per-key state is
    the last ``depth-1`` event types, so every run that STRADDLES a
    micro-batch boundary is emitted exactly once.  NULL types break
    the chain (the NULL enters the carried window, so no run crosses
    it), matching batch.  The sink accumulates mergeable path counts;
    ``min_count`` filtering is read-time.  Batch inputs delegate
    (with ``min_count=1`` — the unfiltered feed) — what
    ``q_stream_event_paths`` gates against its oracle.

    State: ``depth-1`` strings per distinct key (plus how many are
    held, so a carried NULL is distinguishable from "nothing yet").
    """
    from ..operators.asof_join import event_path_counts

    if depth < 2:
        raise ValueError(f"depth must be >= 2, got {depth}")
    if not df.isStreaming:
        return event_path_counts(
            df, by=by, type_col=type_col, order_cols=order_cols,
            depth=depth, min_count=1,
        )
    order = list(order_cols)
    names = [f"step_{i + 1}" for i in range(depth)]
    out_schema = T.StructType(
        [T.StructField(n, T.StringType()) for n in names]
    )
    state_schema = T.StructType(
        [
            T.StructField(f"h{i}", T.StringType())
            for i in range(depth - 1)
        ]
        + [T.StructField("n_held", T.IntegerType())]
    )

    def paths(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            held = list(st[: depth - 1])[: int(st[-1])]
        else:
            held = []
        rows = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order, kind="mergesort")
            for t in pdf[type_col]:
                t = None if pd.isna(t) else str(t)
                if len(held) == depth - 1 and all(
                    h is not None for h in held
                ) and t is not None:
                    rows.append((*held, t))
                held.append(t)
                if len(held) > depth - 1:
                    held = held[-(depth - 1):]
        pad = held + [None] * (depth - 1 - len(held))
        state.update((*pad, len(held)))
        if rows:
            yield pd.DataFrame(rows, columns=names)

    cols = list(dict.fromkeys([by, *order, type_col]))
    return (
        df.select(*cols)
        .groupBy(by)
        .applyInPandasWithState(
            paths, out_schema, state_schema, "append", timeout
        )
    )
