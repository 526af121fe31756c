"""Property test of the sequence-packing kernel (operators/pipeline.py):
next-fit invariants over arbitrary token-count sequences. Pure-pandas --
the Spark/Arrow integration and the recursive-CTE oracle equivalence are
covered by the registry gate; this guards the sequential recurrence
itself (the part a plan diff can't see)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given
from hypothesis import strategies as st

from sample_for_transactional_datalake_using_s3tables_spark.operators.pipeline import (
    PACK_CAPACITY,
    _pack_group,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2 * PACK_CAPACITY), max_size=60)
)
def test_next_fit_invariants(tokens):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(tokens)),
            "source": ["s"] * len(tokens),
            "n_tokens": pd.Series(tokens, dtype="int64"),
        }
    )
    out = _pack_group(pdf)
    assert list(out["doc_id"]) == list(range(len(tokens)))  # order preserved
    if not len(tokens):
        return
    packs = out.groupby("pack_id")["n_tokens"].agg(["sum", "count"])
    # pack ids are contiguous from 0 and nondecreasing in doc order
    assert list(packs.index) == list(range(len(packs)))
    assert (out["pack_id"].diff().fillna(0) >= 0).all()
    # a pack exceeds capacity only as a single oversized doc
    over = packs[packs["sum"] > PACK_CAPACITY]
    assert (over["count"] == 1).all()
    # next-fit tightness: consecutive packs can't merge
    sums = list(packs["sum"])
    firsts = out.groupby("pack_id")["n_tokens"].first()
    for i in range(1, len(sums)):
        assert sums[i - 1] + firsts[i] > PACK_CAPACITY
