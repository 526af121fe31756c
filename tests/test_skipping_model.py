"""Property test: manifest data skipping is SOUND -- a file whose rows
contain any match for the predicate set is never pruned. (Completeness
-- skipping as much as possible -- is a performance property; soundness
is correctness and must hold for every stats/predicate combination.)"""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
    _PRUNE_OPS,
    _entry_may_match,
)

_OPS = {
    "=": lambda a, b: a == b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}

_values = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)


@given(
    rows=st.lists(_values, min_size=1, max_size=20),
    preds=st.lists(
        st.tuples(st.sampled_from(sorted(_PRUNE_OPS)), _values),
        min_size=1,
        max_size=4,
    ),
)
def test_pruning_is_sound(rows, preds):
    # keep the row type homogeneous like a real column
    rows = [type(rows[0])(v) for v in rows]
    entry = {"stats": {"c": [min(rows), max(rows)]}}
    predicates = [("c", op, v) for op, v in preds]
    any_match = any(
        all(_OPS[op](row, v) for _c, op, v in predicates) for row in rows
    )
    may = _entry_may_match(entry, predicates)
    if any_match:
        assert may, f"sound pruning violated: {rows} {predicates}"


def test_missing_stats_never_prune():
    assert _entry_may_match({"stats": {}}, [("c", "=", 5)])
    assert _entry_may_match({}, [("c", ">", 5)])
    assert _entry_may_match({"stats": {"c": [1, 2]}}, [("c", "=", None)])
