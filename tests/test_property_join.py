"""Property-based check: interval_join against a brute-force Python
oracle on randomized span tables (hypothesis drives the shapes; each
example is a full Spark round-trip, so examples are few and small).

Covers what the fixed fixtures cannot: adversarial span layouts
(nested, touching, duplicated, zero-width, far-apart) across both
physical strategies and all four outer modes.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataframeintervals_jl_spark.operators.interval_join import interval_join
from tests.conftest import make_span_df

EPOCH = 1_700_000_000_000_000_000

span_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=0, max_value=25),
    ).map(lambda p: (EPOCH + p[0] * 1_000, EPOCH + (p[0] + p[1]) * 1_000)),
    min_size=0,
    max_size=12,
)


def brute_force(left, right, keepleft, keepright):
    pairs = set()
    lmatched, rmatched = set(), set()
    for i, (ls, le) in enumerate(left):
        for j, (rs, re) in enumerate(right):
            if max(ls, rs) < min(le, re):
                pairs.add((i, j))
                lmatched.add(i)
                rmatched.add(j)
    if keepleft:
        pairs |= {(i, None) for i in range(len(left)) if i not in lmatched}
    if keepright:
        pairs |= {(None, j) for j in range(len(right)) if j not in rmatched}
    return pairs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=span_lists, right=span_lists, keep=st.sampled_from([(False, False), (True, False), (False, True), (True, True)]))
def test_interval_join_matches_brute_force(spark, left, right, keep):
    keepleft, keepright = keep
    from pyspark.sql import types as T

    ldf = make_span_df(
        spark,
        [(s, e, i) for i, (s, e) in enumerate(left)],
        extra=[("lid", T.LongType())],
    )
    rdf = make_span_df(
        spark,
        [(s, e, j) for j, (s, e) in enumerate(right)],
        extra=[("rid", T.LongType())],
    )
    expected = brute_force(left, right, keepleft, keepright)
    for strategy in ("broadcast_right", "binned"):
        j = interval_join(
            ldf,
            rdf,
            keepleft=keepleft,
            keepright=keepright,
            validate="skip",
            strategy=strategy,
            bin_width=7_000,
        )
        got = {(r["lid"], r["rid"]) for r in j.select("lid", "rid").collect()}
        assert got == expected, f"strategy={strategy}"


def brute_force_bounds(left, right, bounds):
    strict = bounds != "[]"
    pairs = set()
    for i, (ls, le) in enumerate(left):
        for j, (rs, re) in enumerate(right):
            lo, hi = max(ls, rs), min(le, re)
            if lo < hi or (not strict and lo == hi):
                pairs.add((i, j))
    return pairs


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=span_lists,
    right=span_lists,
    bounds=st.sampled_from(["[)", "(]", "[]", "()"]),
)
def test_bounds_property_both_strategies(spark, left, right, bounds):
    from pyspark.sql import types as T

    ldf = make_span_df(
        spark,
        [(s, e, i) for i, (s, e) in enumerate(left)],
        extra=[("lid", T.LongType())],
    )
    rdf = make_span_df(
        spark,
        [(s, e, j) for j, (s, e) in enumerate(right)],
        extra=[("rid", T.LongType())],
    )
    expected = brute_force_bounds(left, right, bounds)
    for strategy in ("broadcast_right", "binned"):
        j = interval_join(
            ldf, rdf, bounds=bounds, validate="skip",
            strategy=strategy, bin_width=7_000,
        )
        got = {(r["lid"], r["rid"]) for r in j.select("lid", "rid").collect()}
        assert got == expected, f"strategy={strategy} bounds={bounds}"


float_span_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=0, max_value=30),
    ).map(lambda p: (p[0] * 0.125, (p[0] + p[1]) * 0.125)),
    min_size=0,
    max_size=10,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=float_span_lists, right=float_span_lists)
def test_double_span_property_both_strategies(spark, left, right):
    """Double-endpoint spans: binned (IEEE float binning) must agree
    with broadcast and brute force, incl. exact bin-multiple endpoints
    (all endpoints are multiples of 0.125 = the dyadic worst case)."""
    ldf = spark.createDataFrame(
        [({"start": s, "stop": e}, i) for i, (s, e) in enumerate(left)],
        "span struct<start: double, stop: double>, lid long",
    )
    rdf = spark.createDataFrame(
        [({"start": s, "stop": e}, j) for j, (s, e) in enumerate(right)],
        "span struct<start: double, stop: double>, rid long",
    )
    expected = {
        (i, j)
        for i, (ls, le) in enumerate(left)
        for j, (rs, re) in enumerate(right)
        if max(ls, rs) < min(le, re)
    }
    for strategy, width in (("broadcast_right", None), ("binned", 0.5)):
        j = interval_join(
            ldf, rdf, validate="skip", strategy=strategy, bin_width=width
        )
        got = {(r["lid"], r["rid"]) for r in j.select("lid", "rid").collect()}
        assert got == expected, f"strategy={strategy}"
