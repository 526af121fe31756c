"""Stream-stream joins: watermarked interval (attribution) joins.

Extension surface (SURVEY 2.6) -- the reference has no stream-stream
semantics (its single Firehose pipe lands one table,
stack/pipeline.py:33-58). The join expressions here run identically in
batch (certified against the DuckDB oracle via the
``stream_attribution_join`` registry query) and under ``readStream``
(tests/test_streaming_joins.py: inner join equivalence to the batch
result, and left-outer null emission once the watermark passes).

Scale notes: a stream-stream join keys state by the equi-join key, and
the time-range condition bounds how long each side's rows are retained
(Spark derives the state-eviction horizon from watermark + interval), so
state is O(key-cardinality x horizon window), not unbounded. In batch
mode the same plan is a shuffled equi-join on ``user_id`` with the range
predicate applied post-match -- no cross product.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    lateness: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each purchase to the same user's views in the preceding
    ``horizon``: ``v.user_id = p.user_id AND p.ts in [v.ts, v.ts +
    horizon)``. Works on batch DataFrames (watermarks are no-ops) and on
    streaming ones (watermarks bound join state; left-outer emits
    unmatched views once the watermark passes their horizon)."""
    v = (
        views.select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", lateness)
        .alias("v")
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", lateness)
        .alias("p")
    )
    cond = (
        (F.col("v.user_id") == F.col("p.p_user_id"))
        & (F.col("p.purchase_ts") >= F.col("v.view_ts"))
        & (F.col("p.purchase_ts") < F.col("v.view_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    joined = v.join(p, cond, how)
    return joined.select(
        "v.user_id", "view_id", "view_ts", "purchase_id", "purchase_ts"
    )


def enrich_events(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment join: attach customer dimension columns
    to the event stream via a broadcast hash join on the user key.

    The static side is re-broadcast per micro-batch by Spark (picking up
    dimension updates between batches); no state is kept because the
    static side is available in full at every trigger. Identical
    expression in batch -- the ``stream_static_enrich`` registry query
    certifies the join + aggregate semantics against DuckDB, and
    tests/test_streaming_joins.py drives this under ``readStream``."""
    dim = customers.select(
        F.col("c_custkey"), F.col("c_mktsegment"), F.col("c_nationkey")
    )
    return events.join(
        F.broadcast(dim), events["user_id"] == dim["c_custkey"]
    ).drop("c_custkey")
