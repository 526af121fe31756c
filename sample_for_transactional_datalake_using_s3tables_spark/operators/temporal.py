"""Temporal join operators Spark lacks natively: as-of join, range join.

Both are built as compositions of existing DataFrame ops (the preferred
strategy for custom operators): the as-of join is a union + carry-forward
window, the range join is a bucket-equi-join + residual filter. Neither
needs a Python UDF, and both keep shuffle volume proportional to the
match-candidate space rather than the cross product.

DuckDB has *native* ASOF JOIN, which makes a strong oracle: our
composition must reproduce the dedicated operator's semantics exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.testdata import load_table

RANGE_SECONDS = 300  # range-join window width


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every event, that user's most recent purchase at
    or before the event time.

    Spark composition: tag purchases, then a carry-forward window
    (``last(..., ignorenulls)`` over rows-unbounded-preceding) per user
    in event-time order -- one shuffle on user_id, no self-join, state
    linear in partition size. This is the standard streaming-friendly
    as-of shape; DuckDB's native ASOF JOIN is the oracle.

    Tie rule: at equal ts, purchase rows sort before other events so a
    same-timestamp purchase is visible to them -- matching the oracle's
    inclusive ``e.ts >= p.ts`` regardless of event_id order."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            "ts",
            (F.col("event_type") != "purchase").cast("int"),
            "event_id",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.last(purchase_ts, ignorenulls=True).over(w).alias("last_purchase_ts"),
    ).filter(F.col("last_purchase_ts").isNotNull())


ASOF_JOIN_SQL = f"""
SELECT e.event_id, e.user_id, e.ts, p.ts AS last_purchase_ts
FROM events e
ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) self-join: pairs of same-user events within 300s
    of each other, later-after-earlier.

    Naive range joins plan as nested loops; the scale path is a
    bucket-equi-join: bucket ts by the window width, join each left row
    to its own and the next bucket (explode of 2 keys), then apply the
    exact range predicate as a residual filter. Shuffle volume is
    O(rows x 2), candidates are only same-bucket neighbors. Each right
    row's bucket matches exactly one of a left row's two keys, so no
    dedup is needed."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", F.unix_micros("ts").alias("us")
    )
    bucket = (F.col("us") / F.lit(RANGE_SECONDS * 1_000_000)).cast("long")
    left = events.withColumn(
        "bucket", F.explode(F.array(bucket, bucket + 1))
    )
    right = events.withColumn("bucket", bucket)
    a, b = left.alias("a"), right.alias("b")
    dt = F.col("b.us") - F.col("a.us")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.us") > F.col("a.us"))
            & (F.col("b.us") - F.col("a.us") <= RANGE_SECONDS * 1_000_000),
        )
        .select(
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            F.col("a.user_id").alias("user_id"),
            (dt / 1_000_000.0).alias("gap_seconds"),
        )
    )


RANGE_JOIN_SQL = f"""
SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
       (epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0 AS gap_seconds
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) > epoch_us(a.ts)
 AND epoch_us(b.ts) - epoch_us(a.ts) <= {RANGE_SECONDS * 1_000_000}
"""


QUERIES = {
    "asof_join": asof_join,
    "range_join": range_join,
}

ORACLES = {
    "asof_join": ASOF_JOIN_SQL,
    "range_join": RANGE_JOIN_SQL,
}
