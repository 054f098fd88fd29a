"""Column-selector language for grouping specs.

Parity target: ``find_valid`` and its error semantics
(/root/reference/src/DataFrameIntervals.jl:183-237).  The reference
resolves DataFrames.jl selectors (Symbol/String, ``Not``, ``Cols``,
``Between``, ``Regex``) against EACH side of a join, tracking columns
not present on a side as "invalid"; a column present on neither side is
an error, grouping by the ``on`` column is an error, ``All()``/``Colon``
are errors, and integer/boolean indices are errors.

Python surface: ``str`` | ``re.Pattern`` | ``not_(...)`` |
``between(a, b)`` | ``cols(...)`` | ``all_()`` | list/tuple of these |
a callable name-predicate (≅ ``Cols(fn)``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Sequence


@dataclass(frozen=True)
class Invalid:
    """A selector-requested column not present in this table
    (reference ``Invalid``, src:183-186)."""

    name: str


@dataclass(frozen=True)
class not_:  # noqa: N801 - mirrors DataFrames.Not
    skip: object


@dataclass(frozen=True)
class between:  # noqa: N801 - mirrors DataFrames.Between
    first: str
    last: str


class cols:  # noqa: N801 - mirrors DataFrames.Cols
    def __init__(self, *selectors):
        self.selectors = selectors


class all_:  # noqa: N801 - mirrors DataFrames.All
    pass


def _oncol_error(on: str):
    # message parity incl. the reference's stale internal name
    # (src:187-189; exercised at test/runtests.jl:102)
    raise ValueError(
        f"Column {on} cannot be used for grouping during a call to "
        f"`split_into_combine`."
    )


def _check_oncol(on: str, names: list):
    if str(on) in [n for n in names if isinstance(n, str)]:
        _oncol_error(on)
    return names


def find_valid(on: str, columns: Sequence[str], selector) -> list:
    """Resolve ``selector`` against ``columns`` → list of str (present)
    and :class:`Invalid` (requested but absent) entries."""
    columns = list(columns)

    if isinstance(selector, bool) or isinstance(selector, int):
        raise ValueError(
            "Cannot use index or boolean as grouping variable when using "
            "`split_into_combine`"
        )
    if isinstance(selector, str):
        if selector in columns:
            return _check_oncol(on, [selector])
        return [Invalid(selector)]
    if isinstance(selector, re.Pattern):
        return _check_oncol(on, [c for c in columns if selector.search(c)])
    if isinstance(selector, all_) or selector is Ellipsis:
        _oncol_error(on)
    if isinstance(selector, not_):
        skip = selector.skip
        if isinstance(skip, str):
            if skip in columns:
                return _check_oncol(on, [c for c in columns if c != skip])
            return _check_oncol(on, columns)
        skips = [s for s in (skip if isinstance(skip, (list, tuple)) else [skip])]
        for s in skips:
            if isinstance(s, (bool, int)):
                raise ValueError(
                    "Cannot use index or boolean as grouping variable when "
                    "using `split_into_combine`"
                )
        present = {s for s in skips if s in columns}
        return _check_oncol(on, [c for c in columns if c not in present])
    if isinstance(selector, between):
        firsts = find_valid(on, columns, selector.first)
        lasts = find_valid(on, columns, selector.last)
        invalid = [x for x in firsts + lasts if isinstance(x, Invalid)]
        if invalid:
            return invalid
        i, j = columns.index(selector.first), columns.index(selector.last)
        if i > j:
            i, j = j, i
        return _check_oncol(on, columns[i : j + 1])
    if isinstance(selector, cols):
        out: list = []
        for s in selector.selectors:
            for item in find_valid(on, columns, s):
                if item not in out:
                    out.append(item)
        return _check_oncol(on, out)
    if callable(selector):
        return _check_oncol(on, [c for c in columns if selector(c)])
    if isinstance(selector, (list, tuple)):
        out = []
        for s in selector:
            out.extend(find_valid(on, columns, s))
        return out
    raise ValueError(f"Unsupported column selector: {selector!r}")
