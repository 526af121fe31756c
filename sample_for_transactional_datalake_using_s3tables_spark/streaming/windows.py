"""Event-time windowing: tumbling/sliding/session windows + watermarks.

The reference has NO event-time semantics -- its Firehose buffering is
wall-clock (reference stack/firehose.py:92-94), so this is extension
surface (SURVEY 2.6). The same window expressions run identically in
batch (checked against the DuckDB oracle) and under ``readStream`` with
``withWatermark`` (checked by the streaming tests, including late-data
drop and ``dropDuplicatesWithinWatermark``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEC = "decimal(18,2)"


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window aggregation (batch or streaming)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast(DEC).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding (hopping) window: each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def watermarked_tumbling(events: DataFrame, width: str = "1 hour", lateness: str = "30 minutes") -> DataFrame:
    """Streaming variant: watermark bounds state and drops late data."""
    return tumbling_counts(events.withWatermark("ts", lateness), width)


def deduped_stream(events: DataFrame, lateness: str = "30 minutes") -> DataFrame:
    """Stateful streaming dedup on event_id within the watermark horizon
    (the streaming analog of the keyed upsert, SURVEY 2.6)."""
    return events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
