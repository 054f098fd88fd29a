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
