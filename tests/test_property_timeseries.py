"""Property-based tests (hypothesis) for the time-series / windowing /
decontamination operators against brute-force Python references."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataframeintervals_jl_spark.operators.timeseries import (
    sliding_window_agg,
    validity_intervals,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


events = st.lists(
    st.tuples(st.integers(0, 300), st.integers(0, 3)),  # (ts, key)
    min_size=1,
    max_size=60,
)


@given(ev=events, slide=st.integers(1, 25), k=st.integers(1, 4))
@settings(**_SETTINGS)
def test_sliding_window_counts_match_brute_force(spark, ev, slide, k):
    length = slide * k
    df = spark.createDataFrame(
        [(t, f"g{g}") for t, g in ev], "ts long, g string"
    )
    out = sliding_window_agg(
        df,
        aggs=[F.count(F.lit(1)).alias("n")],
        on="ts",
        length=length,
        slide=slide,
        by="g",
    )
    got = {(r["g"], r["w_start"]): r["n"] for r in out.collect()}
    expect: dict = {}
    for t, g in ev:
        base = t - t % slide
        for i in range(k):
            ws = base - i * slide
            key = (f"g{g}", ws)
            expect[key] = expect.get(key, 0) + 1
    assert got == expect


changes = st.lists(
    st.tuples(
        st.integers(0, 2),  # key
        st.integers(0, 100),  # ts
        st.sampled_from(["a", "b", None]),  # attr
    ),
    min_size=1,
    max_size=40,
)


@given(rows=changes)
@settings(**_SETTINGS)
def test_validity_intervals_match_brute_force(spark, rows):
    # unique (key, ts) pairs; tie-break not needed
    seen = {}
    for k, t, a in rows:
        seen[(k, t)] = a
    data = [(k, t, a) for (k, t), a in seen.items()]
    df = spark.createDataFrame(data, "k long, ts long, attr string")
    out = validity_intervals(df, attrs=["attr"], on="ts", by="k")
    got = {
        (r["k"], r["valid_from"]): (r["attr"], r["valid_to"])
        for r in out.collect()
    }
    expect = {}
    by_key: dict = {}
    for k, t, a in data:
        by_key.setdefault(k, []).append((t, a))
    for k, seq in by_key.items():
        seq.sort()
        runs = []
        for t, a in seq:
            if not runs or runs[-1][1] != a:
                runs.append((t, a))
        for i, (t, a) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            expect[(k, t)] = (a, nxt)
    assert got == expect


docs_pair = st.tuples(
    st.lists(  # corpus: (id, token list)
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=8),
        min_size=1,
        max_size=10,
    ),
    st.lists(  # eval set
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8),
        min_size=1,
        max_size=3,
    ),
)


@given(dp=docs_pair, k=st.integers(1, 3), mo=st.integers(1, 3))
@settings(**_SETTINGS)
def test_decontaminate_matches_brute_force(spark, dp, k, mo):
    from dataframeintervals_jl_spark.operators.dedup import decontaminate

    corpus_toks, eval_toks = dp

    def shingles_of(toks):
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    corpus = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(corpus_toks)],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100 + i, " ".join(t)) for i, t in enumerate(eval_toks)],
        "doc_id long, text string",
    )
    out = decontaminate(corpus, eval_df, shingle_k=k, min_overlap=mo)
    got = {r["doc_id"]: (r["n_overlap"], r["contaminated"]) for r in out.collect()}
    ev_sh = set().union(*[shingles_of(t) for t in eval_toks])
    # empty-token docs produce the "" whole-text shingle, same as Spark
    for i, t in enumerate(corpus_toks):
        n = len(shingles_of(t) & ev_sh)
        assert got[i] == (n, n >= mo), (i, t)


# --- round-8 continuation: line dedup + multi-resolution rollup -----------

lines_corpus = st.lists(
    st.lists(st.integers(0, 5), min_size=0, max_size=6),  # docs as line-ids
    min_size=1,
    max_size=10,
)


@given(corpus=lines_corpus, min_df=st.integers(1, 4))
@settings(**_SETTINGS)
def test_dedup_lines_matches_brute_force(spark, corpus, min_df):
    """Line-id corpora (small alphabet so cross-doc collisions are
    dense): removal set, survivor order, and counts all match the
    python reference for every min_df."""
    from dataframeintervals_jl_spark.operators.dedup import dedup_lines

    docs = [(i, "\n".join(f"line{v}" for v in ls)) for i, ls in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in dedup_lines(df, min_df=min_df).collect()
    }
    # brute force
    from collections import Counter

    dfreq = Counter()
    for _, t in docs:
        for l in set(t.split("\n")):
            dfreq[l] += 1
    hot = {l for l, c in dfreq.items() if c >= min_df}
    want = {}
    for i, t in docs:
        ls = t.split("\n")
        kept = [l for l in ls if l not in hot]
        want[i] = ("\n".join(kept), len(ls) - len(kept))
    assert got == want


mr_events = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 2), st.integers(-5, 5)),
    min_size=1,
    max_size=50,
)


@given(ev=mr_events, r1=st.integers(2, 40), r2=st.integers(2, 40))
@settings(**_SETTINGS)
def test_multi_resolution_rollup_matches_brute_force(spark, ev, r1, r2):
    """Both resolutions' buckets match a per-resolution python groupBy
    (counts and sums), for arbitrary (possibly equal) widths."""
    from dataframeintervals_jl_spark.operators.timeseries import (
        multi_resolution_rollup,
    )

    df = spark.createDataFrame(
        [(t, f"k{g}", v) for t, g, v in ev], "ts long, k string, v long"
    )
    out = multi_resolution_rollup(
        df,
        "ts",
        {"a": r1, "b": r2},
        by="k",
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
    )
    got = {
        (r["k"], r["resolution"], r["bucket_start"]): (r["n"], r["s"])
        for r in out.collect()
    }
    want = {}
    for lab, res in (("a", r1), ("b", r2)):
        for t, g, v in ev:
            key = (f"k{g}", lab, t - t % res)
            n, s = want.get(key, (0, 0))
            want[key] = (n + 1, s + v)
    assert got == want


samples_series = st.lists(
    st.tuples(
        st.integers(0, 400),      # ts
        st.integers(-50, 50),     # value
        st.integers(0, 2),        # key
    ),
    min_size=1,
    max_size=40,
)


@given(sv=samples_series, nwin=st.integers(1, 5))
@settings(**_SETTINGS)
def test_counter_and_gauge_windows_match_brute_force(spark, sv, nwin):
    """Random series + random tiling windows: per-(key, window)
    counter deltas (reset rule) and gauge deltas (signed) match a
    brute-force Python replay, and both tile back to the series
    totals."""
    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.timeseries import (
        counter_windows,
        gauge_windows,
    )

    rows = [
        (f"k{g}", t, v, i) for i, (t, v, g) in enumerate(sv)
    ]
    df = spark.createDataFrame(rows, "k string, ts long, v long, eid long")
    width = 401 // nwin + 1
    windows = spark.createDataFrame(
        [(i * width, (i + 1) * width, i + 1) for i in range(nwin)],
        "lo long, hi long, widx int",
    ).select(make_span(F.col("lo"), F.col("hi")).alias("span"), "widx")

    # brute force
    per = {}
    for k in {r[0] for r in rows}:
        series = sorted(
            [r for r in rows if r[0] == k], key=lambda r: (r[1], r[3])
        )
        for (pk, pt, pv, _), (ck, ct, cv, _) in zip(series, series[1:]):
            w = ct // width + 1
            d = cv - pv
            cstep = cv if d < 0 else d
            key = (k, w)
            c, g = per.get(key, (0, 0))
            per[key] = (c + cstep, g + d)

    got_c = {
        (r["k"], r["widx"]): r["delta"]
        for r in counter_windows(
            df, windows, "v", ts_col="ts", by="k", order=["eid"]
        ).collect()
    }
    got_g = {
        (r["k"], r["widx"]): r["delta"]
        for r in gauge_windows(
            df, windows, "v", ts_col="ts", by="k", order=["eid"]
        ).collect()
    }
    assert got_c == {k: c for k, (c, _) in per.items()}
    assert got_g == {k: g for k, (_, g) in per.items()}


span_sets = st.lists(
    st.tuples(
        st.integers(0, 2),          # key
        st.integers(-10, 110),      # start (may poke out of domain)
        st.integers(1, 40),         # width
        st.booleans(),              # side: True -> A, False -> B
    ),
    min_size=1,
    max_size=24,
)


@given(spans=span_sets)
@settings(**_SETTINGS)
def test_interval_agreement_matches_instant_sweep(spark, spans):
    """interval_agreement's exact quadrant durations equal a per-instant
    brute-force sweep over the integer domain [0, 100), for every key
    with at least one in-domain span on either side; the quadrants
    always tile the domain."""
    from dataframeintervals_jl_spark.functions.spans import make_span
    from dataframeintervals_jl_spark.operators.coalesce import (
        interval_agreement,
    )

    T = 100
    rows_a = [(f"k{k}", s, s + w) for k, s, w, side in spans if side]
    rows_b = [(f"k{k}", s, s + w) for k, s, w, side in spans if not side]

    def df(rows):
        base = rows or [("__none__", 0, 1)]
        return spark.createDataFrame(
            base, "k string, s long, e long"
        ).select("k", make_span(F.col("s"), F.col("e")).alias("span"))

    out = {
        r["k"]: (r["t11"], r["t10"], r["t01"], r["t00"])
        for r in interval_agreement(
            df(rows_a), df(rows_b), 0, T, by="k"
        ).collect()
        if r["k"] != "__none__"
    }

    # brute force: per key, per instant in [0, 100), membership bits
    keys = {k for k, *_ in [(f"k{k}", s, w) for k, s, w, _ in spans]}
    expect = {}
    for key in keys:
        cov_a = [False] * T
        cov_b = [False] * T
        any_in = False
        for k, s, w, side in spans:
            if f"k{k}" != key:
                continue
            for t in range(max(s, 0), min(s + w, T)):
                (cov_a if side else cov_b)[t] = True
                any_in = True
        if not any_in:
            continue
        t11 = sum(1 for t in range(T) if cov_a[t] and cov_b[t])
        t10 = sum(1 for t in range(T) if cov_a[t] and not cov_b[t])
        t01 = sum(1 for t in range(T) if cov_b[t] and not cov_a[t])
        expect[key] = (t11, t10, t01, T - t11 - t10 - t01)

    assert out == expect
    for t11, t10, t01, t00 in out.values():
        assert t11 + t10 + t01 + t00 == T
        assert min(t11, t10, t01, t00) >= 0
