"""groupby_interval_join: equivalence with groupby-after-join
(reference test:83-93), selector resolution + error semantics
(test:102-121), applyInPandas and iteration surfaces."""

from __future__ import annotations

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataframeintervals_jl_spark import (
    groupby_interval_join,
    interval_join,
    quantile_windows,
)
from dataframeintervals_jl_spark.functions.selectors import all_, cols, not_

from .conftest import collect_sorted


@pytest.fixture(scope="module")
def windows(spark, spans_df):
    return quantile_windows(spark, 4, spans_df, label="quarter").cache()


def test_agg_equals_groupby_after_join(spark, spans_df, windows):
    """The reference's own dominant oracle (test:83-87)."""
    g = groupby_interval_join(spans_df, windows, groups=["quarter", "label"])
    a = g.agg(F.avg("x").alias("mean_x"), F.count(F.lit(1)).alias("n"))
    b = (
        interval_join(spans_df, windows)
        .groupBy("quarter", "label")
        .agg(F.avg("x").alias("mean_x"), F.count(F.lit(1)).alias("n"))
    )
    assert a.columns == b.columns
    assert collect_sorted(a) == collect_sorted(b)


def test_group_by_right_only_and_regex(spark, spans_df, windows):
    g = groupby_interval_join(spans_df, windows, groups="quarter")
    assert g.group_cols == ["quarter"]
    g2 = groupby_interval_join(spans_df, windows, groups=re.compile("^quart"))
    assert g2.group_cols == ["quarter"]
    # regex matching both sides' payload columns
    g3 = groupby_interval_join(
        spans_df, windows, groups=re.compile("^(label|quarter)$")
    )
    assert sorted(g3.group_cols) == ["label", "quarter"]


def test_group_selector_not(spark, spans_df, windows):
    # not_('span') on each side -> every payload column
    g = groupby_interval_join(spans_df, windows, groups=not_("span"))
    assert sorted(g.group_cols) == ["label", "quarter", "x"]


def test_groupcols_order_right_then_left(spark, spans_df, windows):
    """Output grouping order: right group cols then left group cols
    (reference src:320-329)."""
    g = groupby_interval_join(spans_df, windows, groups=["label", "quarter"])
    assert g.group_cols == ["quarter", "label"]
    out = g.agg(F.count(F.lit(1)).alias("n"))
    assert out.columns == ["quarter", "label", "n"]


def test_grouping_by_on_column_errors(spark, spans_df, windows):
    with pytest.raises(ValueError, match="cannot be used for grouping"):
        groupby_interval_join(spans_df, windows, groups=["span", "label"])
    with pytest.raises(ValueError, match="cannot be used for grouping"):
        groupby_interval_join(spans_df, windows, groups=all_())
    with pytest.raises(ValueError, match="cannot be used for grouping"):
        groupby_interval_join(spans_df, windows, groups=cols(lambda c: True))


def test_unknown_and_index_selectors_error(spark, spans_df, windows):
    with pytest.raises(ValueError, match="Columns do not exist: nope"):
        groupby_interval_join(spans_df, windows, groups=["nope", "label"])
    with pytest.raises(ValueError, match="do not exist: a and b"):
        groupby_interval_join(spans_df, windows, groups=["a", "b"])
    with pytest.raises(ValueError, match="index or boolean"):
        groupby_interval_join(spans_df, windows, groups=1)


def test_renamecols_maps_group_names(spark, spans_df, windows):
    g = groupby_interval_join(
        spans_df, windows, groups=["label", "quarter"], renamecols=("_a", "_b")
    )
    assert g.group_cols == ["quarter_b", "label_a"]
    assert g.agg(F.count(F.lit(1)).alias("n")).columns == ["quarter_b", "label_a", "n"]


def test_apply_in_pandas(spark, spans_df, windows):
    g = groupby_interval_join(spans_df, windows, groups="quarter")

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"quarter": [pdf["quarter"].iloc[0]], "n": [len(pdf)]}
        )

    out = g.apply_in_pandas(summarize, "quarter long, n long")
    expect = (
        interval_join(spans_df, windows)
        .groupBy("quarter")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert collect_sorted(out) == collect_sorted(expect)


def test_iteration_yields_all_groups(spark, spans_df, windows):
    g = groupby_interval_join(spans_df, windows, groups="quarter")
    seen = {}
    for key, pdf in g:
        seen[key["quarter"]] = len(pdf)
    assert set(seen) == {1, 2, 3, 4}
    assert sum(seen.values()) == g.df.count()


def test_iteration_right_group_major_natural_order(spark, spans_df, windows):
    """Iteration order = natural value order of (right group cols, left
    group cols) — right-group-major like the reference's iterate
    (src:293-310), with NUMERIC ordering (a repr-based sort would put
    quarter 10 before 2)."""
    w16 = quantile_windows(spark, 16, spans_df, label="quarter").cache()
    g = groupby_interval_join(spans_df, w16, groups=["label", "quarter"])
    keys = [(k["quarter"], k["label"]) for k, _ in g]
    assert keys == sorted(keys)
    assert any(q >= 10 for q, _ in keys)  # exercises numeric vs repr order
    # frames carry all joined columns and cover every row exactly once
    g2 = groupby_interval_join(spans_df, w16, groups=["label", "quarter"])
    total = sum(len(pdf) for _, pdf in g2)
    assert total == g2.df.count()
