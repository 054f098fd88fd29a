"""Pure-Python selector resolution (reference find_valid,
src:195-237, error cases test:102-121). No Spark involved."""

from __future__ import annotations

import re

import pytest

from dataframeintervals_jl_spark.functions.selectors import (
    Invalid,
    all_,
    between,
    cols,
    find_valid,
    not_,
)

COLS = ["a", "b", "span", "c"]


def test_string_present_and_absent():
    assert find_valid("span", COLS, "a") == ["a"]
    assert find_valid("span", COLS, "zz") == [Invalid("zz")]


def test_list_mixes_valid_invalid():
    assert find_valid("span", COLS, ["a", "zz"]) == ["a", Invalid("zz")]


def test_regex():
    assert find_valid("span", COLS, re.compile("^[ab]$")) == ["a", "b"]
    assert find_valid("nope", COLS, re.compile("nomatch")) == []


def test_not():
    assert find_valid("span", COLS, not_("span")) == ["a", "b", "c"]
    assert find_valid("x", COLS, not_(["a", "c"])) == ["b", "span"]
    # selecting the on-column through a not_ still errors
    with pytest.raises(ValueError, match="split_into_combine"):
        find_valid("span", COLS, not_(["a", "c"]))
    # skipping an absent column keeps everything
    got = find_valid("x", COLS, not_("zz"))
    assert got == COLS


def test_between():
    assert find_valid("x", COLS, between("b", "c")) == ["b", "span", "c"]
    assert find_valid("x", COLS, between("c", "b")) == ["b", "span", "c"]
    assert find_valid("x", COLS, between("b", "zz")) == [Invalid("zz")]


def test_cols_union_dedupes():
    got = find_valid("x", COLS, cols("a", re.compile("^[ab]$")))
    assert got == ["a", "b"]


def test_callable_predicate():
    assert find_valid("x", COLS, lambda c: c != "span") == ["a", "b", "c"]


def test_on_column_selection_errors():
    with pytest.raises(ValueError, match="split_into_combine"):
        find_valid("span", COLS, "span")
    with pytest.raises(ValueError, match="split_into_combine"):
        find_valid("span", COLS, re.compile("span"))
    with pytest.raises(ValueError, match="split_into_combine"):
        find_valid("span", COLS, all_())
    with pytest.raises(ValueError, match="split_into_combine"):
        find_valid("span", COLS, ...)


def test_integer_boolean_selectors_error():
    with pytest.raises(ValueError, match="index or boolean"):
        find_valid("span", COLS, 1)
    with pytest.raises(ValueError, match="index or boolean"):
        find_valid("span", COLS, True)
    with pytest.raises(ValueError, match="index or boolean"):
        find_valid("span", COLS, not_([1]))
