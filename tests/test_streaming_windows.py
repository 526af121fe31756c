"""Genuinely-streaming behaviors: watermark late-data drop, stateful dedup.

Batch-equivalence of the window expressions is covered by the oracle
tests (test_oracle_extensions); here we run real StreamingQueries with
file sources processed file-by-file so the watermark advances between
micro-batches.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.streaming.stateful import (
    user_stats_stream,
)
from sample_for_transactional_datalake_using_s3tables_spark.streaming.windows import (
    deduped_stream,
    watermarked_tumbling,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_file(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _stream(spark, src):
    return (
        spark.readStream.format("json")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )


def _run_until(q, predicate, timeout=60):
    t0 = time.time()
    while time.time() - t0 < timeout:
        q.processAllAvailable()
        if predicate():
            return True
        time.sleep(0.5)
    return False


@pytest.mark.parametrize("mode", ["update"])
def test_watermark_drops_late_data(spark, mode):
    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt:
        # batch 1: events at 10:05 and 12:59 -> watermark advances to
        # 12:59 - 30min = 12:29, sealing the 10:00 window.
        _write_file(src, "b1.json", [
            {"event_id": 1, "ts": "2024-01-01 10:05:00", "user_id": 1,
             "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 12:59:00", "user_id": 1,
             "event_type": "click", "value": 1.0},
        ])
        agg = watermarked_tumbling(_stream(spark, src), "1 hour", "30 minutes")
        q = (
            agg.writeStream.format("memory")
            .queryName("wm_test")
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            assert _run_until(
                q, lambda: spark.table("wm_test").count() >= 2
            ), "initial windows never materialized"
            # batch 2: a LATE event for the sealed 10:00 window + one fresh
            _write_file(src, "b2.json", [
                {"event_id": 3, "ts": "2024-01-01 10:10:00", "user_id": 1,
                 "event_type": "click", "value": 100.0},   # late -> dropped
                {"event_id": 4, "ts": "2024-01-01 13:01:00", "user_id": 1,
                 "event_type": "click", "value": 1.0},
            ])
            q.processAllAvailable()
            rows = {
                (str(r.window_start), r.n_events)
                for r in spark.table("wm_test").collect()
            }
            # the 10:00 window still counts exactly 1 event: the late
            # event was discarded by the watermark
            assert ("2024-01-01 10:00:00", 1) in rows
            assert not any(
                w == "2024-01-01 10:00:00" and n > 1 for (w, n) in rows
            ), f"late event leaked into sealed window: {rows}"
            assert ("2024-01-01 13:00:00", 1) in rows
        finally:
            q.stop()


def test_drop_duplicates_within_watermark(spark):
    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt:
        _write_file(src, "b1.json", [
            {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 1,
             "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 10:01:00", "user_id": 1,
             "event_type": "view", "value": 2.0},
        ])
        dedup = deduped_stream(_stream(spark, src), "30 minutes")
        q = (
            dedup.writeStream.format("memory")
            .queryName("dedup_test")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            assert _run_until(q, lambda: spark.table("dedup_test").count() >= 2)
            # redeliver event 1 (same id, within watermark) + a new event
            _write_file(src, "b2.json", [
                {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 1,
                 "event_type": "click", "value": 1.0},      # duplicate
                {"event_id": 3, "ts": "2024-01-01 10:02:00", "user_id": 1,
                 "event_type": "click", "value": 3.0},
            ])
            assert _run_until(q, lambda: spark.table("dedup_test").count() >= 3)
            ids = sorted(r.event_id for r in spark.table("dedup_test").collect())
            assert ids == [1, 2, 3], f"duplicate leaked: {ids}"
        finally:
            q.stop()


def test_apply_in_pandas_with_state_carries_across_batches(spark):
    """GroupState persists per-user totals across micro-batches: after a
    second batch touches user 1 again, the freshest emitted row reflects
    batch-1 + batch-2 (not batch 2 alone)."""
    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt:
        _write_file(src, "b1.json", [
            {"event_id": 1, "ts": "2024-01-01 10:00:00", "user_id": 1,
             "event_type": "click", "value": 1.25},
            {"event_id": 2, "ts": "2024-01-01 10:01:00", "user_id": 1,
             "event_type": "view", "value": 2.50},
            {"event_id": 3, "ts": "2024-01-01 10:02:00", "user_id": 2,
             "event_type": "click", "value": 10.00},
        ])
        stats = user_stats_stream(_stream(spark, src))
        q = (
            stats.writeStream.format("memory")
            .queryName("stateful_test")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            assert _run_until(q, lambda: spark.table("stateful_test").count() >= 2)
            _write_file(src, "b2.json", [
                {"event_id": 4, "ts": "2024-01-01 11:00:00", "user_id": 1,
                 "event_type": "click", "value": 4.00},
            ])
            # user 1's state must now cover 3 events across both batches
            assert _run_until(
                q,
                lambda: any(
                    r.user_id == 1 and r.n_events == 3
                    for r in spark.table("stateful_test").collect()
                ),
            ), f"state lost: {spark.table('stateful_test').collect()}"
            latest = max(
                (r for r in spark.table("stateful_test").collect() if r.user_id == 1),
                key=lambda r: r.n_events,
            )
            assert latest.total_value_q == int((1.25 + 2.50 + 4.00) * 1_000_000)
            assert str(latest.last_ts) == "2024-01-01 11:00:00"
            # user 2 untouched by batch 2: single-batch state intact
            u2 = [r for r in spark.table("stateful_test").collect() if r.user_id == 2]
            assert u2 and u2[-1].n_events == 1
        finally:
            q.stop()
