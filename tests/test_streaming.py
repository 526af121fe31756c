"""CDC ingest path: parse/transform, quarantine, streaming MERGE, replay.

Covers the FIXTURES.md F2 cases: INSERT batch; MODIFY upserts in place;
INSERT+MODIFY same key in one micro-batch (latest processing_timestamp
wins); REMOVE dropped; malformed records dead-lettered; duplicate
redelivery idempotent.
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
    Warehouse,
)
from sample_for_transactional_datalake_using_s3tables_spark.streaming import (
    create_transactions_table,
    good_rows,
    merge_cdc_batch,
    parse_cdc,
    quarantine_rows,
    stream_cdc_to_table,
)


def envelope(event, txn_id, ts_ms, amount, status="APPROVED", proc_offset=100):
    """Build a DynamoDB-Streams-shaped CDC JSON line (FIXTURES.md F2)."""
    img = {
        "transaction_id": {"S": txn_id},
        "timestamp": {"N": str(ts_ms)},
        "customer_id": {"S": "CUST_0001"},
        "transaction_type": {"S": "PURCHASE"},
        "amount": {"N": str(amount)},
        "currency": {"S": "USD"},
        "merchant_category": {"S": "RETAIL"},
        "payment_method": {"S": "CREDIT_CARD"},
        "region": {"S": "US_EAST"},
        "risk_score": {"S": "LOW"},
        "status": {"S": status},
        "processing_timestamp": {"N": str(ts_ms + proc_offset)},
        "device_type": {"S": "MOBILE"},
        "authentication_method": {"S": "2FA"},
        "merchant_id": {"S": "MERCH_0001"},
        "velocity_check": {"S": "PASS"},
        "amount_threshold": {"S": "NORMAL"},
        "location_risk": {"S": "LOW"},
        "pattern_match": {"S": "NORMAL"},
    }
    return json.dumps({"eventName": event, "dynamodb": {"NewImage": img}})


TS = 1718300000123  # 2024-06-13 17:33:20.123 UTC


def _raw(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_parse_transform_derivation(spark):
    """T1/T2/T3/T6: unwrap, type, derive date/hour/minute (UTC)."""
    parsed = parse_cdc(_raw(spark, [envelope("INSERT", "TXN_1", TS, "412.57")]))
    row = good_rows(parsed).collect()[0]
    assert row.transaction_id == "TXN_1"
    assert row.timestamp == TS
    assert str(row.amount) == "412.57"
    assert str(row.date) == "2024-06-13"
    assert (row.hour, row.minute) == (17, 33)


def test_remove_dropped_and_malformed_quarantined(spark):
    lines = [
        envelope("INSERT", "TXN_1", TS, "1.00"),
        envelope("REMOVE", "TXN_1", TS, "1.00"),   # T1: dropped silently
        "this is not json {{{",                     # S7: dead-letter
        json.dumps({"eventName": "INSERT", "dynamodb": {"NewImage": {}}}),  # no key
    ]
    parsed = parse_cdc(_raw(spark, lines))
    assert good_rows(parsed).count() == 1
    bad = [r.raw_record for r in quarantine_rows(parsed).collect()]
    assert len(bad) == 2
    assert "not json" in bad[0] or "not json" in bad[1]


@pytest.fixture()
def wh(spark):
    with tempfile.TemporaryDirectory() as d:
        w = Warehouse(spark, d)
        create_transactions_table(w)
        yield w


def test_batch_merge_upsert_and_within_batch_dedup(spark, wh):
    # batch 1: two inserts
    merge_cdc_batch(
        wh,
        _raw(
            spark,
            [
                envelope("INSERT", "TXN_1", TS, "10.00"),
                envelope("INSERT", "TXN_2", TS, "20.00"),
            ],
        ),
    )
    # batch 2: MODIFY TXN_1, and INSERT+MODIFY TXN_3 in ONE batch --
    # the later processing_timestamp must win (Firehose unique_keys).
    merge_cdc_batch(
        wh,
        _raw(
            spark,
            [
                envelope("MODIFY", "TXN_1", TS, "11.00"),
                envelope("INSERT", "TXN_3", TS, "30.00", proc_offset=100),
                envelope("MODIFY", "TXN_3", TS, "33.00", proc_offset=900),
            ],
        ),
    )
    got = {(r.transaction_id, str(r.amount)) for r in wh.read("analytics", "transactions").collect()}
    assert got == {("TXN_1", "11.00"), ("TXN_2", "20.00"), ("TXN_3", "33.00")}


def test_replay_idempotence(spark, wh):
    """Redelivering an identical batch leaves the table unchanged
    (at-least-once + keyed MERGE == effectively-once)."""
    batch = _raw(spark, [envelope("INSERT", "TXN_1", TS, "10.00")])
    merge_cdc_batch(wh, batch)
    merge_cdc_batch(wh, batch)  # replay
    rows = wh.read("analytics", "transactions").collect()
    assert len(rows) == 1 and str(rows[0].amount) == "10.00"


def test_streaming_end_to_end(spark, wh):
    """File-source stream -> availableNow -> foreachBatch MERGE."""
    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt:
        with open(os.path.join(src, "b1.jsonl"), "w") as f:
            f.write(envelope("INSERT", "TXN_1", TS, "10.00") + "\n")
            f.write(envelope("INSERT", "TXN_2", TS, "20.00") + "\n")
        q = stream_cdc_to_table(spark, src, wh, ckpt)
        q.awaitTermination(120)
        # second file arrives: MODIFY + a REMOVE (ignored)
        with open(os.path.join(src, "b2.jsonl"), "w") as f:
            f.write(envelope("MODIFY", "TXN_2", TS, "22.00") + "\n")
            f.write(envelope("REMOVE", "TXN_1", TS, "10.00") + "\n")
        q2 = stream_cdc_to_table(spark, src, wh, ckpt)
        q2.awaitTermination(120)
        got = {
            (r.transaction_id, str(r.amount))
            for r in wh.read("analytics", "transactions").collect()
        }
        assert got == {("TXN_1", "10.00"), ("TXN_2", "22.00")}
        # checkpoint means b1 was NOT re-processed: history shows
        # exactly one merge commit per processed batch
        assert wh.current_version("analytics", "transactions") >= 2


def test_base64_kinesis_path(spark):
    """S3: the Kinesis-source records arrive base64-wrapped
    (reference lambda/transform/index.py:22-23)."""
    import base64

    line = envelope("INSERT", "TXN_B64", TS, "99.99")
    b64 = base64.b64encode(line.encode()).decode()
    parsed = parse_cdc(_raw(spark, [b64]), base64_encoded=True)
    row = good_rows(parsed).collect()[0]
    assert row.transaction_id == "TXN_B64" and str(row.amount) == "99.99"


def test_streaming_quarantine_end_to_end(spark, wh):
    """S6/S7 under readStream: malformed and keyless records flow
    through the FILE STREAM into the dead-letter table (original bytes
    preserved) in the same trigger that merges the good rows -- the
    errors/ prefix analog end-to-end, not just the batch twin."""
    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt:
        keyless = json.dumps(
            {"eventName": "INSERT", "dynamodb": {"NewImage": {"amount": {"N": "5"}}}}
        )
        with open(os.path.join(src, "b1.jsonl"), "w") as f:
            f.write(envelope("INSERT", "TXN_1", TS, "10.00") + "\n")
            f.write("garbage {{{ not json\n")
            f.write(keyless + "\n")
        q = stream_cdc_to_table(spark, src, wh, ckpt)
        q.awaitTermination(120)
        good = wh.read("analytics", "transactions").collect()
        assert {r.transaction_id for r in good} == {"TXN_1"}
        bad = sorted(
            r.raw_record
            for r in wh.read("analytics", "transactions_errors").collect()
        )
        assert bad == sorted(["garbage {{{ not json", keyless])


def test_streaming_mor_end_to_end(spark, wh):
    """strategy="mor": every trigger's MERGE is a merge-on-read append
    (zero rewrites per commit); reads stay latest-wins across triggers
    and auto_maintain folds the delete backlog afterwards."""
    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt:
        with open(os.path.join(src, "b1.jsonl"), "w") as f:
            f.write(envelope("INSERT", "TXN_1", TS, "10.00") + "\n")
            f.write(envelope("INSERT", "TXN_2", TS, "20.00") + "\n")
        q = stream_cdc_to_table(spark, src, wh, ckpt, strategy="mor")
        q.awaitTermination(120)
        with open(os.path.join(src, "b2.jsonl"), "w") as f:
            f.write(envelope("MODIFY", "TXN_2", TS, "22.00") + "\n")
        q2 = stream_cdc_to_table(spark, src, wh, ckpt, strategy="mor")
        q2.awaitTermination(120)
        assert wh.last_merge_stats["mode"] == "mor"
        assert wh.last_merge_stats["rewritten_files"] == 0
        got = {
            (r.transaction_id, str(r.amount))
            for r in wh.read("analytics", "transactions").collect()
        }
        assert got == {("TXN_1", "10.00"), ("TXN_2", "22.00")}
        # backlog visible, then folded by one maintenance call
        assert wh.deletes_df("analytics", "transactions").count() >= 1
        wh.auto_maintain("analytics", "transactions", orphan_horizon_seconds=3600)
        assert wh.deletes_df("analytics", "transactions").count() == 0
        got2 = {
            (r.transaction_id, str(r.amount))
            for r in wh.read("analytics", "transactions").collect()
        }
        assert got2 == got


def test_null_tagged_attribute_unwraps_to_sql_null(spark):
    """{"NULL": true} attributes must land as SQL NULL, not the string
    "true" (from_json stringifies the JSON boolean; code-review r8).
    A NULL-tagged REQUIRED key quarantines instead of sneaking in."""
    import json

    from sample_for_transactional_datalake_using_s3tables_spark.streaming.cdc import parse_cdc

    good = json.dumps({"eventName": "INSERT", "dynamodb": {"NewImage": {
        "transaction_id": {"S": "T1"}, "timestamp": {"N": "1000"},
        "status": {"NULL": "true"}}}})
    keyless = json.dumps({"eventName": "INSERT", "dynamodb": {"NewImage": {
        "transaction_id": {"NULL": "true"}, "timestamp": {"N": "2000"}}}})
    df = spark.createDataFrame([(good,), (keyless,)], "value string")
    rows = parse_cdc(df).select(
        "transaction_id", "status", "_keep", "_corrupt"
    ).collect()
    by_keep = {bool(r._keep): r for r in rows}
    assert by_keep[True].status is None
    assert by_keep[False].transaction_id is None
    assert by_keep[False]._corrupt is not None  # quarantined, not kept


def test_time_derivation_pinned_to_utc(spark):
    """date/hour/minute derive in UTC even under a non-UTC session
    (partition placement must not depend on session timezone)."""
    import json

    from sample_for_transactional_datalake_using_s3tables_spark.streaming.cdc import parse_cdc

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        rec = json.dumps({"eventName": "INSERT", "dynamodb": {"NewImage": {
            "transaction_id": {"S": "T1"},
            "timestamp": {"N": "1755216600000"}}}})  # 2025-08-15T00:10Z
        df = spark.createDataFrame([(rec,)], "value string")
        row = parse_cdc(df).select("date", "hour").first()
        assert str(row.date) == "2025-08-15" and row.hour == 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_quarantine_replay_is_idempotent(spark, wh):
    """A replayed micro-batch (same txn stamp) must not duplicate
    dead-letter rows: the quarantine append is keyless, so its replay
    protection is the txn=(app_id, epoch) manifest stamp."""
    from sample_for_transactional_datalake_using_s3tables_spark.streaming.cdc import (
        create_transactions_table,
        merge_cdc_batch,
    )

    create_transactions_table(wh)
    batch = spark.createDataFrame([("NOTJSON|1",), ("NOTJSON|2",)], "value string")
    merge_cdc_batch(wh, batch, txn=("cdcq-test", 7))
    merge_cdc_batch(wh, batch, txn=("cdcq-test", 7))  # crash-replay
    assert wh.read("analytics", "transactions_errors").count() == 2
    merge_cdc_batch(wh, batch, txn=("cdcq-test", 8))  # a NEW epoch lands
    assert wh.read("analytics", "transactions_errors").count() == 4


def test_base64_quarantine_preserves_original_record(spark):
    """On the Kinesis (base64) path, quarantined rows hold the ORIGINAL
    base64 record so they replay through the same ingest path verbatim
    (pre-fix: the decoded text, which would double-decode to garbage)."""
    import base64

    from sample_for_transactional_datalake_using_s3tables_spark.streaming.cdc import (
        parse_cdc,
        quarantine_rows,
    )

    original = base64.b64encode(b"NOTJSON garbage").decode()
    df = spark.createDataFrame([(original,)], "value string")
    parsed = parse_cdc(df, base64_encoded=True)
    q = quarantine_rows(parsed).collect()
    assert [r.raw_record for r in q] == [original]
    # and the preserved record replays through the same path unchanged
    replay = parse_cdc(
        spark.createDataFrame([(q[0].raw_record,)], "value string"),
        base64_encoded=True,
    )
    assert quarantine_rows(replay).collect()[0].raw_record == original
