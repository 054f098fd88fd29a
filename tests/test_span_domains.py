"""Generic endpoint domains: date / timestamp / timestamp_ntz span
structs adapted to exact integer ordinals inside the join and restored
on output (reference parity: arbitrary ordered T, src:31-46)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataframeintervals_jl_spark import interval_join, interval_join_by
from dataframeintervals_jl_spark.functions.spans import (
    span_endpoint_domain,
    span_from_ordinal,
    span_to_ordinal,
)

D = dt.date


def _date_spans(spark, rows, tag):
    return spark.createDataFrame(
        [({"start": s, "stop": e}, i) for i, (s, e) in enumerate(rows)],
        f"span struct<start: date, stop: date>, {tag} long",
    )


@pytest.fixture(scope="module")
def date_tables(spark):
    L = [
        (D(2024, 1, 1), D(2024, 1, 10)),
        (D(2024, 1, 8), D(2024, 2, 1)),
        (D(2024, 3, 1), D(2024, 3, 2)),
    ]
    R = [
        (D(2024, 1, 5), D(2024, 1, 9)),
        (D(2024, 2, 15), D(2024, 3, 15)),
        (D(2025, 1, 1), D(2025, 1, 2)),  # matches nothing
    ]
    return L, R, _date_spans(spark, L, "li"), _date_spans(spark, R, "ri")


def _pairs(j):
    return sorted(
        ((r["li"], r["ri"]) for r in j.collect()), key=repr
    )


def _brute(L, R, how="inner"):
    pairs = [
        (i, j)
        for i, (a, b) in enumerate(L)
        for j, (s, e) in enumerate(R)
        if max(a, s) < min(b, e)
    ]
    res = list(pairs)
    if how in ("left", "full"):
        m = {p[0] for p in pairs}
        res += [(i, None) for i in range(len(L)) if i not in m]
    if how in ("right", "full"):
        m = {p[1] for p in pairs}
        res += [(None, j) for j in range(len(R)) if j not in m]
    return sorted(res, key=repr)


def test_date_join_matches_brute_force_and_restores_dates(
    spark, date_tables
):
    L, R, ldf, rdf = date_tables
    j = interval_join(ldf, rdf, validate="skip", strategy="broadcast_right")
    assert _pairs(j) == _brute(L, R)
    # output endpoint types restored to DATE, intersection clipped
    for c in ("span_left", "span_right", "span"):
        ep = j.schema[c].dataType.fields[0].dataType
        assert isinstance(ep, T.DateType), c
    row = j.filter(F.col("li") == 0).first()
    assert row["span"]["start"] == D(2024, 1, 5)
    assert row["span"]["stop"] == D(2024, 1, 9)


@pytest.mark.parametrize("strategy", ["broadcast_right", "binned"])
def test_date_join_strategy_parity(spark, date_tables, strategy):
    L, R, ldf, rdf = date_tables
    j = interval_join(
        ldf, rdf, validate="skip", strategy=strategy,
        **({"bin_width": 7} if strategy == "binned" else {}),
    )
    assert _pairs(j) == _brute(L, R)


def test_date_join_outer_null_spans_restore(spark, date_tables):
    L, R, ldf, rdf = date_tables
    j = interval_join(
        ldf, rdf, keepleft=True, keepright=True, validate="skip",
        strategy="broadcast_right",
    )
    assert _pairs(j) == _brute(L, R, "full")
    padded = j.filter(F.col("li").isNull() | F.col("ri").isNull())
    # padded rows keep NULL span structs (not structs of nulls)
    assert padded.count() == 1
    assert padded.filter(
        F.col("span").isNotNull() | F.col("span_left").isNotNull()
    ).count() == 0


def test_timestamp_and_ntz_endpoints(spark):
    ts = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(cast):
        return spark.createDataFrame(
            [
                (
                    {
                        "start": ts,
                        "stop": ts + dt.timedelta(hours=2),
                    },
                    0,
                )
            ],
            f"span struct<start: {cast}, stop: {cast}>, i long",
        )

    l, r = mk("timestamp"), mk("timestamp_ntz")
    j = interval_join(
        l, r, validate="skip", strategy="broadcast_right", renamecols=("", "_r")
    )
    assert j.count() == 1
    assert isinstance(
        j.schema["span_left"].dataType.fields[0].dataType, T.TimestampType
    )
    assert isinstance(
        j.schema["span_right"].dataType.fields[0].dataType,
        T.TimestampNTZType,
    )
    # intersection inherits the LEFT domain
    assert isinstance(
        j.schema["span"].dataType.fields[0].dataType, T.TimestampType
    )


def test_date_vs_timestamp_mix_rejected(spark, date_tables):
    _, _, ldf, _ = date_tables
    ts = dt.datetime(2024, 1, 1)
    rdf = spark.createDataFrame(
        [({"start": ts, "stop": ts + dt.timedelta(days=3)}, 0)],
        "span struct<start: timestamp, stop: timestamp>, ri long",
    )
    with pytest.raises(ValueError, match="no common ordinal unit"):
        interval_join(ldf, rdf, validate="skip")


def test_interval_join_by_date_spans(spark):
    rows_l = [
        (1, {"start": D(2024, 1, 1), "stop": D(2024, 1, 10)}, 0),
        (2, {"start": D(2024, 1, 1), "stop": D(2024, 1, 10)}, 1),
    ]
    rows_r = [
        (1, {"start": D(2024, 1, 5), "stop": D(2024, 1, 6)}, 0),
        (3, {"start": D(2024, 1, 5), "stop": D(2024, 1, 6)}, 1),
    ]
    ddl = "k long, span struct<start: date, stop: date>, {} long"
    ldf = spark.createDataFrame(rows_l, ddl.format("li"))
    rdf = spark.createDataFrame(rows_r, ddl.format("ri"))
    j = interval_join_by(ldf, rdf, by="k", validate="skip")
    got = [(r["k"], r["li"], r["ri"]) for r in j.collect()]
    assert got == [(1, 0, 0)]
    assert isinstance(
        j.schema["span"].dataType.fields[0].dataType, T.DateType
    )


def test_semi_anti_date_spans(spark, date_tables):
    from dataframeintervals_jl_spark import (
        interval_anti_join,
        interval_semi_join,
    )

    L, R, ldf, rdf = date_tables
    matched = {i for i, _ in _brute(L, R)}
    semi = interval_semi_join(ldf, rdf, strategy="broadcast_right")
    anti = interval_anti_join(ldf, rdf, strategy="broadcast_right")
    assert {r["li"] for r in semi.collect()} == matched
    assert {r["li"] for r in anti.collect()} == set(range(len(L))) - matched
    # output = left unchanged, including the DATE endpoint domain
    assert semi.columns == ldf.columns
    assert isinstance(
        semi.schema["span"].dataType.fields[0].dataType, T.DateType
    )
    row = semi.filter(F.col("li") == 0).first()
    assert row["span"]["start"] == D(2024, 1, 1)


def test_decimal_endpoint_spans(spark):
    """decimal(38,0) endpoints ride the numeric path directly (no
    adapter): exact integral semantics, scale-0 decimals count as
    integral for the binned math."""
    from dataframeintervals_jl_spark.functions.spans import (
        span_endpoints_integral,
    )

    from decimal import Decimal as Dec

    rows_l = [
        ({"start": Dec(0), "stop": Dec(10)}, 0),
        ({"start": Dec(20), "stop": Dec(25)}, 1),
    ]
    rows_r = [
        ({"start": Dec(8), "stop": Dec(9)}, 0),
        ({"start": Dec(11), "stop": Dec(12)}, 1),
    ]
    ddl = "span struct<start: decimal(38,0), stop: decimal(38,0)>, {} long"
    ldf = spark.createDataFrame(rows_l, ddl.format("li"))
    rdf = spark.createDataFrame(rows_r, ddl.format("ri"))
    assert span_endpoints_integral(ldf.schema["span"].dataType)
    j = interval_join(
        ldf, rdf, validate="skip", strategy="broadcast_right"
    )
    assert [(r["li"], r["ri"]) for r in j.collect()] == [(0, 0)]
    assert isinstance(
        j.schema["span"].dataType.fields[0].dataType, T.DecimalType
    )


def test_point_in_span_join_date_domain(spark):
    """Date-stabbing: each (key, date) point picks the SCD2-style date
    interval containing it; containment is [start, stop)."""
    from dataframeintervals_jl_spark.operators.interval_join import (
        point_in_span_join,
    )

    spans = spark.createDataFrame(
        [
            ({"start": D(2024, 1, 1), "stop": D(2024, 2, 1)}, "jan"),
            ({"start": D(2024, 2, 1), "stop": D(2024, 3, 1)}, "feb"),
        ],
        "span struct<start: date, stop: date>, label string",
    )
    points = spark.createDataFrame(
        [(D(2024, 1, 31), 0), (D(2024, 2, 1), 1), (D(2024, 3, 1), 2)],
        "ts date, pid long",
    )
    j = point_in_span_join(
        points, spans, keep_unmatched=True, validate="skip",
        strategy="broadcast_right",
    )
    got = {r["pid"]: r["label"] for r in j.collect()}
    assert got == {0: "jan", 1: "feb", 2: None}
    assert isinstance(
        j.schema["span_right"].dataType.fields[0].dataType, T.DateType
    )
    # mismatched pairing still rejected
    with pytest.raises(ValueError, match="endpoint domain"):
        point_in_span_join(
            points.select(F.col("ts").cast("timestamp").alias("ts"), "pid"),
            spans,
            validate="skip",
        )


def test_quantile_windows_and_dfspan_date_domain(spark, date_tables):
    """dfspan returns (date, date); quantile_windows tiles the covering
    date span with contiguous DATE windows that join back against the
    source rows (generic-T parity end-to-end)."""
    from dataframeintervals_jl_spark import dfspan, quantile_windows

    L, _, ldf, _ = date_tables
    lo, hi = dfspan(ldf)
    assert (lo, hi) == (D(2024, 1, 1), D(2024, 3, 2))
    w = quantile_windows(spark, 4, ldf, label="qtr")
    rows = sorted(
        ((r["span"]["start"], r["span"]["stop"]) for r in w.collect())
    )
    # contiguous tiling of [lo, hi) in the date domain
    assert rows[0][0] == lo and rows[-1][1] == hi
    for (s1, e1), (s2, e2) in zip(rows, rows[1:]):
        assert e1 == s2
    assert isinstance(
        w.schema["span"].dataType.fields[0].dataType, T.DateType
    )
    j = interval_join(ldf, w, validate="skip", strategy="broadcast_right")
    assert j.count() >= len(L)
    # tuple input with python dates
    w2 = quantile_windows(spark, 2, (D(2024, 1, 1), D(2024, 1, 5)))
    got = sorted(
        (r["span"]["start"], r["span"]["stop"]) for r in w2.collect()
    )
    assert got == [
        (D(2024, 1, 1), D(2024, 1, 3)),
        (D(2024, 1, 3), D(2024, 1, 5)),
    ]


def test_set_algebra_date_domain(spark):
    """merge/gaps/complement/difference/coverage/profile over DATE
    spans: computed on day ordinals, returned in the date domain."""
    from dataframeintervals_jl_spark import (
        merge_spans,
        overlap_profile,
        span_complement,
        span_coverage,
        span_difference,
        span_gaps,
    )

    rows = [
        (D(2024, 1, 1), D(2024, 1, 5)),
        (D(2024, 1, 4), D(2024, 1, 8)),   # overlaps → one island
        (D(2024, 1, 20), D(2024, 1, 25)),
    ]
    df = spark.createDataFrame(
        [({"start": s, "stop": e},) for s, e in rows],
        "span struct<start: date, stop: date>",
    )
    islands = sorted(
        (r["span"]["start"], r["span"]["stop"], r["n_spans"])
        for r in merge_spans(df).collect()
    )
    assert islands == [
        (D(2024, 1, 1), D(2024, 1, 8), 2),
        (D(2024, 1, 20), D(2024, 1, 25), 1),
    ]
    gaps = [
        (r["span"]["start"], r["span"]["stop"])
        for r in span_gaps(df).collect()
    ]
    assert gaps == [(D(2024, 1, 8), D(2024, 1, 20))]
    comp = sorted(
        (r["span"]["start"], r["span"]["stop"])
        for r in span_complement(
            df, D(2023, 12, 30), D(2024, 2, 1)
        ).collect()
    )
    assert comp == [
        (D(2023, 12, 30), D(2024, 1, 1)),
        (D(2024, 1, 8), D(2024, 1, 20)),
        (D(2024, 1, 25), D(2024, 2, 1)),
    ]
    cov = span_coverage(df).first()
    assert (cov["covered"], cov["n_islands"]) == (12, 2)  # days
    prof = sorted(
        (r["span"]["start"], r["span"]["stop"], r["depth"])
        for r in overlap_profile(df).collect()
    )
    assert (D(2024, 1, 4), D(2024, 1, 5), 2) in prof
    left = spark.createDataFrame(
        [({"start": D(2024, 1, 1), "stop": D(2024, 1, 31)}, 7)],
        "span struct<start: date, stop: date>, lid long",
    )
    frags = sorted(
        (r["span"]["start"], r["span"]["stop"])
        for r in span_difference(left, df).collect()
    )
    assert frags == [
        (D(2024, 1, 8), D(2024, 1, 20)),
        (D(2024, 1, 25), D(2024, 1, 31)),
    ]


def test_date_join_null_validation_fires(spark, date_tables):
    """validate='error' still rejects null spans through the domain
    adapter (the fused check wraps the CONVERTED column)."""
    _, _, ldf, rdf = date_tables
    withnull = ldf.unionByName(
        spark.createDataFrame(
            [(None, 99)], "span struct<start: date, stop: date>, li long"
        )
    )
    j = interval_join(withnull, rdf, strategy="broadcast_right")
    with pytest.raises(Exception, match="missing values"):
        j.collect()


def test_groupby_interval_join_date_spans(spark, date_tables):
    """groupby_interval_join composes with the domain adapter: grouping
    the date-span join output by the window id works end-to-end."""
    from dataframeintervals_jl_spark import (
        groupby_interval_join,
        quantile_windows,
    )

    L, _, ldf, _ = date_tables
    w = quantile_windows(spark, 2, ldf, label="half")
    g = groupby_interval_join(
        ldf, w, groups=["half"], validate="skip",
        strategy="broadcast_right",
    )
    counts = {r["half"]: r["n"] for r in g.agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) >= len(L)
    assert set(counts) <= {1, 2}


def test_date_join_auto_strategy_and_stats_validation(spark, date_tables):
    """strategy='auto' + validate='error' drive the stats path over the
    CONVERTED ordinals (null counting, broadcast decision) — the full
    default-arguments flow, not just the explicit-strategy fast lane."""
    L, R, ldf, rdf = date_tables
    j = interval_join(ldf, rdf)  # defaults: auto + error-validate
    assert _pairs(j) == _brute(L, R)
    assert isinstance(
        j.schema["span"].dataType.fields[0].dataType, T.DateType
    )


def test_date_join_on_name_pair(spark):
    """(left_name, right_name) `on` pairs resolve through the adapter."""
    l = spark.createDataFrame(
        [({"start": D(2024, 1, 1), "stop": D(2024, 1, 9)}, 0)],
        "lspan struct<start: date, stop: date>, li long",
    )
    r = spark.createDataFrame(
        [({"start": D(2024, 1, 5), "stop": D(2024, 1, 6)}, 0)],
        "rspan struct<start: date, stop: date>, ri long",
    )
    j = interval_join(l, r, on=("lspan", "rspan"), validate="skip")
    row = j.first()
    assert row["li"] == 0 and row["ri"] == 0
    assert row["lspan"]["start"] == D(2024, 1, 5)  # intersection col
    assert isinstance(
        j.schema["lspan_left"].dataType.fields[0].dataType, T.DateType
    )


def test_review_fixes_domain_edges(spark):
    """Round-5 self-review regressions: (a) tz-aware datetime bounds
    convert via UTC; (b) datetime bounds accepted for NTZ span columns;
    (c) numeric×domain span_difference rejected; (d) date-domain
    timedelta tolerance must be whole days; (e) empty-embedding
    projection is the zero vector."""
    import datetime as dt

    from dataframeintervals_jl_spark import asof_join, span_difference
    from dataframeintervals_jl_spark.functions.spans import (
        py_endpoint_to_ordinal,
    )
    from dataframeintervals_jl_spark.operators.coalesce import (
        span_complement,
    )
    from dataframeintervals_jl_spark.operators.similarity import (
        random_projection,
    )

    # (a) tz-aware == its UTC naive equivalent
    aware = dt.datetime(2024, 1, 1, 5, 0, tzinfo=dt.timezone(
        dt.timedelta(hours=5)
    ))
    naive_utc = dt.datetime(2024, 1, 1, 0, 0)
    assert py_endpoint_to_ordinal(aware) == py_endpoint_to_ordinal(
        naive_utc
    )

    # (b) NTZ span column + datetime bounds
    ts0 = dt.datetime(2024, 1, 1)
    ntz = spark.createDataFrame(
        [({"start": ts0 + dt.timedelta(days=2),
           "stop": ts0 + dt.timedelta(days=3)},)],
        "span struct<start: timestamp_ntz, stop: timestamp_ntz>",
    )
    comp = span_complement(ntz, ts0, ts0 + dt.timedelta(days=5))
    assert comp.count() == 2  # head + tail gaps

    # (c) numeric left x date right subtraction rejected
    num = spark.createDataFrame(
        [({"start": 0, "stop": 10}, 1)],
        "span struct<start: long, stop: long>, lid long",
    )
    datespans = spark.createDataFrame(
        [({"start": D(2024, 1, 1), "stop": D(2024, 1, 2)},)],
        "span struct<start: date, stop: date>",
    )
    with pytest.raises(ValueError, match="ordinal unit"):
        span_difference(num, datespans)

    # (d) sub-day timedelta tolerance on date domain raises
    l = spark.createDataFrame([(D(2024, 1, 2), 0)], "ts date, lid long")
    r = spark.createDataFrame([(D(2024, 1, 1), "a")], "ts date, tag string")
    with pytest.raises(ValueError, match="whole number of days"):
        asof_join(l, r, on="ts", tolerance=dt.timedelta(hours=12))

    # (e) empty embedding projects to the zero vector, null stays null
    emb = spark.createDataFrame(
        [(0, []), (1, None)], "vec_id long, embedding array<double>"
    )
    got = {r["vec_id"]: r["proj"]
           for r in random_projection(emb, out_dims=3).collect()}
    assert got[0] == [0, 0, 0]
    assert got[1] == [None, None, None]


def test_ordinal_round_trip_expressions(spark):
    df = spark.createDataFrame(
        [({"start": D(2024, 2, 29), "stop": D(2024, 3, 1)},), (None,)],
        "span struct<start: date, stop: date>",
    )
    assert span_endpoint_domain(df.schema["span"].dataType) == "date"
    back = df.select(
        span_from_ordinal(
            span_to_ordinal(F.col("span"), "date"), "date"
        ).alias("span")
    )
    got = [r["span"] for r in back.collect()]
    assert got[0]["start"] == D(2024, 2, 29) and got[0]["stop"] == D(2024, 3, 1)
    assert got[1] is None  # null-preserving both ways


def test_numeric_vs_domain_mix_rejected(spark, date_tables):
    """A plain numeric span side joined against a date/timestamp span
    side would silently reinterpret epoch-ns as day/µs ordinals — every
    public join path must reject the mix (same policy as
    span_difference and asof_join)."""
    from dataframeintervals_jl_spark.operators.interval_join import (
        interval_anti_join,
        interval_join_by,
        interval_semi_join,
        point_in_span_join,
    )

    _, _, ldf_date, _ = date_tables
    num = spark.createDataFrame(
        [({"start": 0, "stop": 10**12}, 0, "k")],
        "span struct<start: long, stop: long>, ri long, k string",
    )
    with pytest.raises(ValueError, match="numeric"):
        interval_join(ldf_date.withColumn("k", F.lit("k")), num, validate="skip")
    with pytest.raises(ValueError, match="numeric"):
        interval_join(num, ldf_date.withColumn("k", F.lit("k")), validate="skip")
    for fn in (interval_semi_join, interval_anti_join):
        with pytest.raises(ValueError, match="numeric"):
            fn(ldf_date.withColumn("k", F.lit("k")), num)
        with pytest.raises(ValueError, match="numeric"):
            fn(num, ldf_date.withColumn("k", F.lit("k")))
    with pytest.raises(ValueError, match="numeric"):
        interval_join_by(
            ldf_date.withColumn("k", F.lit("k")), num, by="k", validate="skip"
        )
    # integral epoch-ns points over date spans: unit garbage, rejected
    pts = spark.createDataFrame([(1_700_000_000_000_000_000, 0)], "ts long, pid long")
    with pytest.raises(ValueError, match="same endpoint domain"):
        point_in_span_join(pts, ldf_date, validate="skip")


# ---------------------------------------------------------------------------
# string-endpoint spans (round 7): ordered but not arithmetic
# ---------------------------------------------------------------------------


def _str_spans(spark, rows, tag):
    return spark.createDataFrame(
        [({"start": s, "stop": e}, i) for i, (s, e) in enumerate(rows)],
        f"span struct<start: string, stop: string>, {tag} long",
    )


@pytest.fixture(scope="module")
def str_tables(spark):
    L = [("alice", "carol"), ("bob", "frank"), ("zed", "zz")]
    R = [("carl", "dave"), ("aa", "alicf"), ("yy", "zzz")]
    return L, R, _str_spans(spark, L, "li"), _str_spans(spark, R, "ri")


def test_string_span_join_matches_brute_force(spark, str_tables):
    """String-endpoint spans (reference: Interval{T} over any ordered T,
    src:31-46): overlap is lexicographic, intersection is a string span,
    both broadcast strategies agree with the python brute force."""
    L, R, ldf, rdf = str_tables
    for strategy in ("broadcast_right", "broadcast_left", "auto"):
        j = interval_join(ldf, rdf, validate="skip", strategy=strategy)
        assert _pairs(j) == _brute(L, R)
    j = interval_join(ldf, rdf, validate="skip")
    row = {
        (r["li"], r["ri"]): (r["span"]["start"], r["span"]["stop"])
        for r in j.collect()
    }
    # intersection of [bob,frank) x [carl,dave) = [carl,dave)
    assert row[(1, 0)] == ("carl", "dave")
    # [alice,carol) x [aa,alicf) = [alice,alicf)
    assert row[(0, 1)] == ("alice", "alicf")


def test_string_span_outer_and_bounds(spark, str_tables):
    L, R, ldf, rdf = str_tables
    j = interval_join(
        ldf, rdf, keepleft=True, keepright=True, validate="skip",
        strategy="broadcast_right",
    )
    assert _pairs(j) == _brute(L, R, "full")
    # closed bounds: touching spans [a,b] x [b,c] now overlap
    t1 = _str_spans(spark, [("aa", "bb")], "li")
    t2 = _str_spans(spark, [("bb", "cc")], "ri")
    assert (
        interval_join(t1, t2, validate="skip", bounds="[]").count() == 1
    )
    assert interval_join(t1, t2, validate="skip").count() == 0


def test_string_span_binned_and_mixed_rejected(spark, str_tables):
    _, _, ldf, rdf = str_tables
    with pytest.raises(ValueError, match="binned"):
        interval_join(ldf, rdf, validate="skip", strategy="binned")
    num = spark.createDataFrame(
        [({"start": 0, "stop": 10}, 0)],
        "span struct<start: long, stop: long>, ri long",
    )
    with pytest.raises(ValueError, match="lexicographic"):
        interval_join(ldf, num, validate="skip")


def test_make_span_string_and_groupby(spark, str_tables):
    """make_span_string constructor + groupby_interval_join over string
    spans (the grouped operator inherits the string support)."""
    from dataframeintervals_jl_spark import make_span_string
    from dataframeintervals_jl_spark.operators.groupby_interval_join import (
        groupby_interval_join,
    )

    L, R, ldf, rdf = str_tables
    built = spark.createDataFrame(
        [("alice", "carol", 0)], "lo string, hi string, li long"
    ).select(make_span_string("lo", "hi").alias("span"), "li")
    j = interval_join(built, rdf, validate="skip", strategy="broadcast_right")
    # [alice,carol) overlaps [carl,dave) ('carl' < 'carol') and [aa,alicf)
    assert sorted(r["ri"] for r in j.collect()) == [0, 1]

    g = groupby_interval_join(
        ldf, rdf, "ri", validate="skip"
    ).agg(F.count(F.lit(1)).alias("n"))
    got = {r["ri"]: r["n"] for r in g.collect()}
    # [carl,dave) catches both [alice,carol) and [bob,frank)
    assert got == {0: 2, 1: 1, 2: 1}


def test_string_span_semi_anti_and_by(spark, str_tables):
    """Semi/anti joins and the keyed join support string spans through
    the broadcast path; binned and string-vs-numeric mixes are
    typed-rejected."""
    from dataframeintervals_jl_spark.operators.interval_join import (
        interval_anti_join,
        interval_join_by,
        interval_semi_join,
    )

    L, R, ldf, rdf = str_tables
    brute = {i for i, j in _brute(L, R)}
    semi = {r["li"] for r in interval_semi_join(ldf, rdf).collect()}
    anti = {r["li"] for r in interval_anti_join(ldf, rdf).collect()}
    assert semi == brute
    assert anti == set(range(len(L))) - brute
    with pytest.raises(ValueError, match="binned"):
        interval_semi_join(ldf, rdf, strategy="binned")
    num = spark.createDataFrame(
        [({"start": 0, "stop": 9}, 0)],
        "span struct<start: long, stop: long>, ri long",
    )
    with pytest.raises(ValueError, match="lexicographic"):
        interval_anti_join(ldf, num)
    # keyed join: same-key string spans overlap per key
    lk = ldf.withColumn("k", F.lit("g"))
    rk = rdf.withColumn("k", F.lit("g"))
    j = interval_join_by(lk, rk, by="k", validate="skip")
    assert {(r["li"], r["ri"]) for r in j.collect()} == set(_brute(L, R))


def test_string_span_keyed_binned_and_mix_guards(spark, str_tables):
    _, _, ldf, rdf = str_tables
    lk = ldf.withColumn("k", F.lit("g"))
    rk = rdf.withColumn("k", F.lit("g"))
    with pytest.raises(ValueError, match="binned"):
        interval_join_by(lk, rk, by="k", validate="skip", strategy="binned")
    num = spark.createDataFrame(
        [({"start": 0, "stop": 9}, 0, "g")],
        "span struct<start: long, stop: long>, ri long, k string",
    )
    with pytest.raises(ValueError, match="lexicographic"):
        interval_join_by(lk, num, by="k", validate="skip")


def test_reversed_field_order_spans_accepted(spark):
    """Reference parity (src:38): span structs are accepted with the
    fields in EITHER order.  A struct<stop, start> input — e.g. a
    parquet table written with the fields swapped — must normalize to
    canonical (start, stop) at every entry point and produce the same
    result as the canonical input, with canonical-order output; nulls
    stay null through the normalization."""
    from dataframeintervals_jl_spark import (
        interval_join,
        merge_spans,
        normalize_span_field_order,
        quantile_windows,
    )
    from dataframeintervals_jl_spark.operators.quantile_windows import dfspan

    rows = [(i, {"start": 10 * i, "stop": 10 * i + 15}) for i in range(8)]
    canon = spark.createDataFrame(
        rows, "li long, span struct<start: long, stop: long>"
    )
    # the same data with the struct fields physically reversed
    rev = canon.select(
        "li",
        F.struct(
            F.col("span.stop").alias("stop"),
            F.col("span.start").alias("start"),
        ).alias("span"),
    )
    assert [f.name for f in rev.schema["span"].dataType.fields] == [
        "stop", "start",
    ]

    # normalization helper: field order flips, values by NAME unchanged
    norm = normalize_span_field_order(rev, "span")
    assert [f.name for f in norm.schema["span"].dataType.fields] == [
        "start", "stop",
    ]
    assert sorted(map(tuple, norm.collect())) == sorted(map(tuple, canon.collect()))

    # interval_join accepts the reversed side on BOTH sides + strategies
    w = quantile_windows(spark, 4, canon, label="q")
    ref = sorted(
        map(tuple, interval_join(canon, w, strategy="broadcast_right").collect())
    )
    for strat in ("broadcast_right", "binned"):
        got = interval_join(rev, w, strategy=strat)
        assert [f.name for f in got.schema["span"].dataType.fields] == [
            "start", "stop",
        ]
        assert sorted(map(tuple, got.collect())) == ref

    # windows built FROM a reversed-order table match
    w_rev = quantile_windows(spark, 4, rev, label="q")
    assert sorted(map(tuple, w_rev.collect())) == sorted(map(tuple, w.collect()))
    assert dfspan(rev) == dfspan(canon)

    # set algebra entry (merge_spans via _to_ordinal)
    m_ref = sorted(map(tuple, merge_spans(canon, "span").collect()))
    assert sorted(map(tuple, merge_spans(rev, "span").collect())) == m_ref

    # nulls survive normalization as nulls
    withnull = spark.createDataFrame(
        [(0, {"stop": 5, "start": 1}), (1, None)],
        "li long, span struct<stop: long, start: long>",
    )
    out = normalize_span_field_order(withnull, "span").collect()
    assert {r["li"]: r["span"] for r in out}[1] is None
