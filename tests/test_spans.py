"""Expression-level semantics of the canonical span type.

Covers the contract details from SURVEY.md §2.A: strict-overlap under
closed-open bounds (touching windows / zero-width spans match nothing),
closed-closed variant, null propagation of the intersection
(reference intersect_, src:13-17), and duration arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframeintervals_jl_spark.functions.spans import (
    make_span,
    span_contains,
    span_duration,
    span_intersect,
    spans_overlap,
)

from .conftest import make_span_df


def _eval_pair(spark, a, b, expr_fn):
    """Evaluate expr_fn(span_a, span_b) over a single literal row."""
    la = make_span(F.lit(a[0]), F.lit(a[1])) if a else F.lit(None).cast(
        "struct<start: bigint, stop: bigint>"
    )
    lb = make_span(F.lit(b[0]), F.lit(b[1])) if b else F.lit(None).cast(
        "struct<start: bigint, stop: bigint>"
    )
    return spark.range(1).select(expr_fn(la, lb).alias("v")).first()["v"]


OVERLAP_CASES = [
    # (left, right, expect_half_open, expect_closed)
    ((0, 10), (5, 15), True, True),  # plain overlap
    ((0, 10), (10, 20), False, True),  # touching: only closed matches
    ((0, 10), (20, 30), False, False),  # disjoint
    ((5, 5), (0, 10), False, True),  # zero-width inside: empty set vs point
    ((5, 5), (5, 5), False, True),
    ((0, 10), (0, 10), True, True),  # identical
    ((2, 4), (0, 10), True, True),  # containment
]


@pytest.mark.parametrize("a,b,half_open,closed", OVERLAP_CASES)
def test_overlap_predicate(spark, a, b, half_open, closed):
    assert _eval_pair(spark, a, b, lambda x, y: spans_overlap(x, y)) is half_open
    assert _eval_pair(spark, b, a, lambda x, y: spans_overlap(x, y)) is half_open
    assert (
        _eval_pair(spark, a, b, lambda x, y: spans_overlap(x, y, bounds="[]"))
        is closed
    )
    # any flavor with an open side has identical nonempty-intersection
    # semantics: touching endpoints never overlap, zero-width is empty
    for b_open in ("(]", "()"):
        assert (
            _eval_pair(spark, a, b, lambda x, y: spans_overlap(x, y, bounds=b_open))
            is half_open
        ), (a, b, b_open)


def test_overlap_rejects_unknown_bounds():
    with pytest.raises(ValueError, match="bounds"):
        spans_overlap(F.lit(1), F.lit(2), bounds="])")


def test_intersection_values(spark):
    v = _eval_pair(spark, (0, 10), (5, 15), span_intersect)
    assert (v["start"], v["stop"]) == (5, 10)


def test_intersection_null_propagates(spark):
    assert _eval_pair(spark, None, (5, 15), span_intersect) is None
    assert _eval_pair(spark, (0, 10), None, span_intersect) is None


def test_duration_and_contains(spark):
    df = make_span_df(spark, [(100, 250)])
    row = df.select(
        span_duration("span").alias("d"),
        span_contains("span", F.lit(100)).alias("at_start"),
        span_contains("span", F.lit(249)).alias("inside"),
        span_contains("span", F.lit(250)).alias("at_stop"),
    ).first()
    assert row["d"] == 150
    assert row["at_start"] is True and row["inside"] is True
    assert row["at_stop"] is False  # half-open: stop excluded


def test_make_span_casts_to_long(spark):
    df = spark.range(1).select(make_span(F.lit(1.0), F.lit(2.0)).alias("s"))
    assert df.schema["s"].dataType.simpleString() == "struct<start:bigint,stop:bigint>"


ALLEN_CASES = [
    # exhaustive 13-relation matrix (Allen 1983), left vs right
    ((0, 5), (10, 20), "precedes"),
    ((0, 10), (10, 20), "meets"),
    ((0, 12), (10, 20), "overlaps"),
    ((0, 20), (10, 20), "finished_by"),
    ((0, 25), (10, 20), "contains"),
    ((10, 15), (10, 20), "starts"),
    ((10, 20), (10, 20), "equals"),
    ((10, 25), (10, 20), "started_by"),
    ((12, 18), (10, 20), "during"),
    ((15, 20), (10, 20), "finishes"),
    ((15, 25), (10, 20), "overlapped_by"),
    ((20, 30), (10, 20), "met_by"),
    ((25, 30), (10, 20), "preceded_by"),
]


@pytest.mark.parametrize("a,b,expect", ALLEN_CASES)
def test_allen_relation_matrix(spark, a, b, expect):
    from dataframeintervals_jl_spark.functions.spans import allen_relation

    assert _eval_pair(spark, a, b, allen_relation) == expect


def test_allen_relation_null_propagates(spark):
    from dataframeintervals_jl_spark.functions.spans import allen_relation

    assert _eval_pair(spark, None, (0, 10), allen_relation) is None


def test_allen_relations_exhaustive_and_symmetric(spark):
    """Every case maps to a distinct relation; swapping sides maps each
    relation to its converse."""
    from dataframeintervals_jl_spark.functions.spans import (
        ALLEN_RELATIONS,
        allen_relation,
    )

    got = [_eval_pair(spark, a, b, allen_relation) for a, b, _ in ALLEN_CASES]
    assert sorted(got) == sorted(ALLEN_RELATIONS)
    conv = {
        "precedes": "preceded_by", "meets": "met_by",
        "overlaps": "overlapped_by", "finished_by": "finishes",
        "contains": "during", "starts": "started_by", "equals": "equals",
    }
    conv.update({v: k for k, v in conv.items()})
    for a, b, expect in ALLEN_CASES:
        assert _eval_pair(spark, b, a, allen_relation) == conv[expect]


def test_span_iou(spark):
    from dataframeintervals_jl_spark.functions.spans import span_iou

    assert _eval_pair(spark, (0, 10), (5, 15), span_iou) == 0.333333
    assert _eval_pair(spark, (0, 10), (0, 10), span_iou) == 1.0
    assert _eval_pair(spark, (0, 10), (20, 30), span_iou) == 0.0
    assert _eval_pair(spark, None, (0, 10), span_iou) is None
    # zero-measure union -> null, not division error
    assert _eval_pair(spark, (5, 5), (5, 5), span_iou) is None


def test_span_accessors_and_timestamp_adapter(spark):
    """Direct contracts for the thin exported helpers: SPAN_DDL parses,
    accessors invert make_span, and the timestamp adapter widens µs
    timestamps to epoch-ns spans."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from dataframeintervals_jl_spark import (
        SPAN_DDL,
        make_span,
        span_from_timestamps,
        span_start,
        span_stop,
    )

    schema = StructType.fromDDL(f"span {SPAN_DDL}")
    assert [f.name for f in schema["span"].dataType.fields] == ["start", "stop"]

    row = (
        spark.range(1)
        .select(make_span(F.lit(7), F.lit(11)).alias("span"))
        .select(
            span_start(F.col("span")).alias("a"),
            span_stop(F.col("span")).alias("b"),
        )
        .first()
    )
    assert (row["a"], row["b"]) == (7, 11)

    ts = spark.createDataFrame(
        [("2026-01-02 00:00:00.000001", "2026-01-02 00:00:01")],
        "t0 string, t1 string",
    ).selectExpr(
        "CAST(t0 AS TIMESTAMP_NTZ) AS t0", "CAST(t1 AS TIMESTAMP_NTZ) AS t1"
    )
    (sp,) = ts.select(span_from_timestamps("t0", "t1").alias("s")).collect()
    assert sp["s"]["stop"] - sp["s"]["start"] == 999_999_000  # 1s - 1µs, in ns
    assert sp["s"]["start"] % 1000 == 0  # µs-precision widened to ns
