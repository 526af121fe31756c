"""Event-time window operators, batch-checked (SURVEY 2.6).

The window expressions live in ``streaming/windows.py`` and run
identically under batch and streaming; here they are applied to the
``events`` table in batch mode so the DuckDB oracle can certify the
window assignment/merging semantics. The genuinely-streaming behaviors
(watermark late-data drop, stateful dedup) are covered by
tests/test_streaming_windows.py.

Oracle notes: Spark's tumbling windows are epoch-aligned and DuckDB's
``time_bucket`` buckets are 2000-01-01-aligned -- identical boundaries
for divisor-of-a-day widths. Session windows are replicated with the
classic gap-and-islands SQL (new session when ts - lag(ts) >= gap;
session end = max(ts) + gap, matching ``session_window`` semantics).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.testdata import load_table, spread
from ..streaming.stateful import USER_STATS_SQL, user_stats_batch
from ..streaming.windows import session_counts, sliding_counts, tumbling_counts


def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"))


WINDOW_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
FROM events
GROUP BY 1, 2
"""


def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load_table(spark, sf_dir, "events"))


# Each event belongs to exactly two 1h/30m hopping windows: the ones
# starting at floor_30(ts) and floor_30(ts) - 30m.
WINDOW_SLIDING_SQL = """
WITH starts AS (
  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
           AS window_start
  FROM events
)
SELECT window_start, COUNT(*) AS n_events FROM starts GROUP BY 1
"""


def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_counts(load_table(spark, sf_dir, "events"))


WINDOW_SESSION_SQL = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL '10 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '10 minutes' AS session_end,
       user_id,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful-operator surface (streaming/stateful.py): the
    applyInPandasWithState accumulator run in its batch twin so the
    oracle certifies the arithmetic; the cross-micro-batch state carry
    is covered by tests/test_streaming_windows.py."""
    return user_stats_batch(spread(load_table(spark, sf_dir, "events"), "user_id"))


def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join surface (streaming/joins.py) in its
    batch twin: every (view, purchase) pair of one user with the
    purchase inside [view_ts, view_ts + 1h), aggregated per user. The
    identical expression runs under readStream with watermarks bounding
    join state (tests/test_streaming_joins.py proves inner-join
    equivalence to this batch result and left-outer null emission)."""
    from ..streaming.joins import attribution_join

    events = load_table(spark, sf_dir, "events")
    pairs = attribution_join(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "purchase"),
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("purchase_id").alias("n_purchases"),
        F.countDistinct("view_id").alias("n_views"),
    )


STREAM_ATTRIBUTION_JOIN_SQL = """
SELECT v.user_id,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT p.event_id) AS n_purchases,
       COUNT(DISTINCT v.event_id) AS n_views
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts
 AND p.ts < v.ts + INTERVAL '1 hour'
GROUP BY v.user_id
"""


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (streaming/joins.enrich_events)
    in its batch twin: events joined to the customer dimension and
    rolled up per (market segment, event type). Under readStream the
    identical expression re-broadcasts the dimension each micro-batch
    (tests/test_streaming_joins.py); value sums stay exact decimal
    inside the plan."""
    from ..streaming.joins import enrich_events

    events = load_table(spark, sf_dir, "events")
    customers = load_table(spark, sf_dir, "customer")
    return (
        enrich_events(events, customers)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total_value"),
        )
    )


STREAM_STATIC_ENRICH_SQL = """
SELECT c.c_mktsegment, e.event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
"""


QUERIES = {
    "window_tumbling": window_tumbling,
    "window_sliding": window_sliding,
    "window_session": window_session,
    "stateful_user_stats": stateful_user_stats,
    "stream_attribution_join": stream_attribution_join,
    "stream_static_enrich": stream_static_enrich,
}

ORACLES = {
    "window_tumbling": WINDOW_TUMBLING_SQL,
    "window_sliding": WINDOW_SLIDING_SQL,
    "window_session": WINDOW_SESSION_SQL,
    "stateful_user_stats": USER_STATS_SQL,
    "stream_attribution_join": STREAM_ATTRIBUTION_JOIN_SQL,
    "stream_static_enrich": STREAM_STATIC_ENRICH_SQL,
}
