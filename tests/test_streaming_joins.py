"""Stream-stream interval join: inner equivalence to batch, left-outer
null emission once the watermark seals a view's horizon.

The batch-mode semantics of the same expression are oracle-certified by
the ``stream_attribution_join`` registry query; here real
StreamingQueries run with two file sources processed file-by-file so the
watermark advances between micro-batches.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from sample_for_transactional_datalake_using_s3tables_spark.streaming.joins import (
    attribution_join,
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


def _batch(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "event_id long, ts string, user_id long, event_type string, value double",
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def _ev(eid, ts, uid, etype):
    return {"event_id": eid, "ts": ts, "user_id": uid,
            "event_type": etype, "value": 1.0}


VIEWS = [
    _ev(1, "2024-01-01 10:00:00", 1, "view"),
    _ev(2, "2024-01-01 10:30:00", 1, "view"),
    _ev(3, "2024-01-01 10:00:00", 2, "view"),  # user 2 never purchases
]
PURCHASES = [
    _ev(10, "2024-01-01 10:45:00", 1, "purchase"),  # joins views 1 and 2
    _ev(11, "2024-01-01 11:15:00", 1, "purchase"),  # joins view 2 only (>=1h after view 1)
    _ev(12, "2024-01-01 09:00:00", 1, "purchase"),  # before both views: no join
]


def _collect(spark, rows_v, rows_p, how):
    """Run the streaming join over file sources and collect the sink."""
    with tempfile.TemporaryDirectory() as dv, \
            tempfile.TemporaryDirectory() as dp, \
            tempfile.TemporaryDirectory() as ckpt:
        _write_file(dv, "b1.json", rows_v)
        _write_file(dp, "b1.json", rows_p)
        if how == "left_outer":
            # a much-later row on BOTH sides advances the watermark far
            # past every view's horizon, forcing the unmatched views out
            _write_file(dv, "b2.json", [_ev(99, "2024-01-02 10:00:00", 99, "view")])
            _write_file(dp, "b2.json", [_ev(98, "2024-01-02 10:00:00", 98, "purchase")])
        joined = attribution_join(_stream(spark, dv), _stream(spark, dp), how=how)
        q = (
            joined.writeStream.format("memory")
            .queryName(f"att_{how}")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            t0 = time.time()
            while time.time() - t0 < 60:
                q.processAllAvailable()
                time.sleep(0.2)
                if not q.status["isDataAvailable"]:
                    break
        finally:
            q.stop()
        return spark.sql(f"SELECT * FROM att_{how}").collect()


def test_stream_inner_join_matches_batch(spark):
    got = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in _collect(spark, VIEWS, PURCHASES, "inner")
    }
    assert got == {(1, 1, 10), (1, 2, 10), (1, 2, 11)}
    # identical expression in batch mode
    batch = attribution_join(_batch(spark, VIEWS), _batch(spark, PURCHASES))
    assert {(r.user_id, r.view_id, r.purchase_id) for r in batch.collect()} == got


def test_stream_static_enrich_broadcasts_dim(spark):
    """Stream-static join: each micro-batch joins against the full
    static dimension; output matches the batch twin row-for-row."""
    from sample_for_transactional_datalake_using_s3tables_spark.streaming.joins import (
        enrich_events,
    )

    dim = spark.createDataFrame(
        [(1, "BUILDING", 7), (2, "MACHINERY", 3)],
        "c_custkey long, c_mktsegment string, c_nationkey int",
    )
    rows = VIEWS + PURCHASES
    with tempfile.TemporaryDirectory() as d, tempfile.TemporaryDirectory() as ckpt:
        _write_file(d, "b1.json", rows[:3])
        _write_file(d, "b2.json", rows[3:])
        enriched = enrich_events(_stream(spark, d), dim)
        q = (
            enriched.writeStream.format("memory")
            .queryName("enrich")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r.event_id, r.c_mktsegment, r.c_nationkey)
            for r in spark.sql("SELECT * FROM enrich").collect()
        }
    batch = enrich_events(_batch(spark, rows), dim)
    want = {
        (r.event_id, r.c_mktsegment, r.c_nationkey) for r in batch.collect()
    }
    assert got == want and len(got) == len(rows)  # every user_id 1/2 row enriched


def test_stream_left_outer_emits_unmatched_after_watermark(spark):
    rows = _collect(spark, VIEWS, PURCHASES, "left_outer")
    matched = {(r.view_id, r.purchase_id) for r in rows if r.purchase_id is not None}
    assert {(1, 10), (2, 10), (2, 11)} <= matched
    # view 3 (user 2) has no purchase: emitted with nulls only after the
    # watermark passed 10:00 + 1h horizon + 30m lateness
    unmatched = {r.view_id for r in rows if r.purchase_id is None}
    assert 3 in unmatched
