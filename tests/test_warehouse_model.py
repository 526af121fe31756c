"""Model-based test: random insert/upsert/delete/compact sequences against
an in-memory dict model of keyed-MERGE semantics (latest state per key,
partition follows the latest row). Catches interaction bugs single-shot
tests miss -- e.g. the round-1 partition-migration and null-partition
defects would both have failed here.
"""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
    Warehouse,
)

from .test_warehouse import SCHEMA, _df

KEYS = ("a", "b", "c")
PARTS = ("d1", "d2", None)

_row = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(PARTS),
    st.integers(min_value=0, max_value=99),
)

_op = st.one_of(
    st.tuples(st.just("upsert"), st.lists(_row, min_size=1, max_size=3)),
    st.tuples(st.just("delete"), st.lists(st.sampled_from(KEYS), min_size=1, max_size=2)),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("expire"), st.integers(min_value=1, max_value=2)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=4))
def test_merge_sequences_match_model(spark, ops):
    model: dict[str, tuple[str | None, int]] = {}
    with tempfile.TemporaryDirectory() as root:
        wh = Warehouse(spark, root)
        wh.create_namespace("m")
        wh.create_table("m", "t", SCHEMA, key="id", partition_by="day")
        for kind, arg in ops:
            if kind == "upsert":
                # latest occurrence of a key within the batch wins (order_col=v
                # would reorder; rely on batch order via monotonic id tiebreak)
                wh.merge_upsert("m", "t", _df(spark, arg))
                for k, p, v in arg:
                    model[k] = (p, v)
            elif kind == "delete":
                rows = [(k, None, 0) for k in arg]
                batch = _df(spark, rows).withColumn("_delete", F.lit(True))
                wh.merge_upsert("m", "t", batch, delete_col="_delete")
                for k in arg:
                    model.pop(k, None)
            elif kind == "compact":
                wh.compact("m", "t")
            else:
                # maintenance must never change the current state
                wh.expire_snapshots("m", "t", keep_last=arg)
        got = {(r.id, r.day, r.v) for r in wh.read("m", "t").collect()}
        want = {(k, p, v) for k, (p, v) in model.items()}
        assert got == want, f"ops={ops}"
