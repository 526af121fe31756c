"""Streaming rung of the falsification ladder (VERDICT r11 #7).

The queries ladder runs sf1-sf100 and batch DML runs sf1-sf100, but
streaming exactly-once was certified only at driver scale (sf0.01
oracle rows). This rung kills and restarts the two continuous sinks at
sweep scale and falsifies their exactly-once claims with survivor SETS
against DuckDB, duplicate-key counts, and a forced txn-stamp replay:

1. ``stream_table_to_table`` (append mode, keyless exactly-once): the
   source backlog lands as many commits; the stream drains it in paced
   micro-batches (``max_versions_per_trigger``) and is STOPPED mid-run
   (proven: rows at stop < total), the source advances while the query
   is down, a fresh query on the same checkpoint drains the rest.
   Asserts: zero duplicate keys, destination set == DuckDB transform
   of the full source, and a manually re-fired committed epoch (the
   foreachBatch replay Spark's contract allows) is a version-stamped
   NO-OP.
2. ``stream_copy_into`` (continuous COPY, file-discovery checkpoint):
   stopped mid-drain (maxFilesPerTrigger pacing), MORE files land
   while the query is down, restart drains everything. Same
   falsifiers, plus the batch-ledger invariant: re-running finds
   nothing new.
3. ``stream_table_to_table`` (merge mode, keyed destination): kill +
   restart across a replayed keyed batch -- idempotent by latest-wins;
   set-compared against the deduped source.

Usage: python scripts/stream_sweep.py [sf_dir] [--record OUT.json]
Prints one JSON line; exit 0 iff every assertion held.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _wait_batches(q, n: int, timeout: float = 300.0) -> int:
    """Block until the query has COMMITTED at least n batches (or it
    terminates); returns the last seen batchId."""
    t0 = time.time()
    last = -1
    while time.time() - t0 < timeout:
        p = q.lastProgress
        if p is not None:
            last = max(last, int(p["batchId"]))
            if last >= n - 1:
                return last
        if not q.isActive:
            return last
        time.sleep(0.2)
    return last


def _drain(q, timeout: float = 420.0) -> None:
    """Run a CONTINUOUS (processingTime) query until it idles -- a
    committed trigger with ZERO input rows -- then stop it. One zero
    suffices: the sweep's sources are static by drain time, so a
    trigger that planned no new offsets means the backlog is gone
    (Spark does not advance batchId on no-data triggers, so counting
    consecutive idle BATCHES would wait forever). The paced reader
    needs a continuous trigger: availableNow captures the paced
    next-offset once and would stop after one pacing step."""
    t0 = time.time()
    while time.time() - t0 < timeout and q.isActive:
        p = q.lastProgress
        if p is not None and int(p["numInputRows"]) == 0:
            break
        time.sleep(0.2)
    _stop(q)


def _stop(q) -> None:
    """Stop a streaming query, tolerating the socket teardown a
    Python-data-source runner goes through on interrupt."""
    try:
        q.stop()
    except Exception as e:  # noqa: BLE001
        print(f"# stop: {e}", file=sys.stderr)
    try:
        q.awaitTermination(120)
    except Exception as e:  # noqa: BLE001
        print(f"# awaitTermination after stop: {e}", file=sys.stderr)


def main() -> int:
    import duckdb
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from sample_for_transactional_datalake_using_s3tables_spark.plans import configure
    from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
        Warehouse,
    )
    from sample_for_transactional_datalake_using_s3tables_spark.streaming.tables import (
        stream_copy_into,
        stream_table_to_table,
    )

    args = [a for a in sys.argv[1:]]
    record_path = None
    if "--record" in args:
        i = args.index("--record")
        record_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1",
    )
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.sql.streaming.stopTimeout", "30000")
        .appName("stream_sweep")
        .getOrCreate()
    )
    configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    root = tempfile.mkdtemp(prefix="stream_sweep_")
    results: list[dict] = []
    ok_all = True

    def record(step: str, **kv) -> None:
        nonlocal ok_all
        rec = {"step": step, **kv}
        ok = all(v for k, v in kv.items() if k.endswith("_ok"))
        rec["ok"] = ok
        ok_all = ok_all and ok
        results.append(rec)
        print(f"# {json.dumps(rec)}", file=sys.stderr)

    def snap_except(df, oracle_sql: str) -> tuple[int, int]:
        """(missing, extra) of df vs a DuckDB oracle query, via an
        exported snapshot -- the same set comparison dml_sweep uses."""
        snap = os.path.join(root, "_snap")
        df.write.mode("overwrite").parquet(snap)
        missing = con.sql(
            f"SELECT COUNT(*) FROM (({oracle_sql}) EXCEPT "
            f"SELECT * FROM '{snap}/*.parquet')"
        ).fetchone()[0]
        extra = con.sql(
            f"SELECT COUNT(*) FROM (SELECT * FROM '{snap}/*.parquet' "
            f"EXCEPT ({oracle_sql}))"
        ).fetchone()[0]
        return missing, extra

    try:
        wh = Warehouse(spark, root)
        wh.create_namespace("s")
        events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "event_type",
            F.col("value").cast("decimal(12,2)").alias("value"),
        )
        n_commits = 16

        # ---- scenario 1: table-to-table, append mode, kill mid-run
        wh.create_table("s", "src", events.schema, key="event_id")
        for i in range(n_commits // 2):
            wh.insert(
                "s", "src", events.filter(F.col("event_id") % n_commits == i)
            )
        wh.create_table("s", "dst", events.schema)  # keyless
        ckpt = os.path.join(root, "ckpt_t2t")
        t0 = time.perf_counter()

        def transform(b):
            return b.filter(F.col("event_type") != "click")

        def start():
            return stream_table_to_table(
                spark, wh, ("s", "src"), ("s", "dst"), ckpt,
                transform=transform, mode="append",
                max_versions_per_trigger=1,
                trigger={"processingTime": "1 second"},
            )

        q = start()
        _wait_batches(q, 3)
        _stop(q)
        print("# s1: stopped mid-run", file=sys.stderr)
        rows_at_stop = wh.read("s", "dst").count()
        # the source advances while the query is DOWN
        for i in range(n_commits // 2, n_commits):
            wh.insert(
                "s", "src", events.filter(F.col("event_id") % n_commits == i)
            )
        _drain(start())
        total = wh.read("s", "dst").count()
        dups = (
            wh.read("s", "dst").groupBy("event_id").count()
            .filter(F.col("count") > 1).count()
        )
        missing, extra = snap_except(
            wh.read("s", "dst").select("event_id", "event_type", "value"),
            "SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) "
            f"FROM '{sf_dir}/events.parquet' WHERE event_type != 'click'",
        )
        # forced epoch replay: re-fire the LAST committed epoch by hand
        # (Spark's foreachBatch contract allows re-fires) -- the
        # txn=(app_id, epoch) stamp must make it a provable no-op
        import hashlib

        app_id = "stream-" + hashlib.md5(ckpt.encode()).hexdigest()[:12]
        last_epoch = wh.last_txn_version("s", "dst", app_id)
        v_before = wh.current_version("s", "dst")
        wh.insert(
            "s", "dst",
            transform(events.limit(100)),
            txn=(app_id, last_epoch),
        )
        replay_noop = (
            wh.current_version("s", "dst") == v_before
            and wh.read("s", "dst").count() == total
        )
        record(
            "t2t_append_kill_restart",
            wall_sec=round(time.perf_counter() - t0, 2),
            rows_at_stop=rows_at_stop,
            rows_total=total,
            killed_midrun_ok=0 < rows_at_stop < total,
            dup_keys=dups,
            no_dups_ok=dups == 0,
            set_missing=missing,
            set_extra=extra,
            set_ok=missing == 0 and extra == 0,
            last_epoch=last_epoch,
            replay_noop_ok=bool(replay_noop),
        )

        # ---- scenario 2: stream COPY INTO, kill mid-drain
        landing = os.path.join(root, "landing")
        evens = events.filter(F.col("event_id") % 2 == 0)
        odds = events.filter(F.col("event_id") % 2 != 0)
        evens.repartition(12).write.mode("overwrite").parquet(landing)
        wh.create_table("s", "copied", events.schema)
        ckpt2 = os.path.join(root, "ckpt_copy")
        t0 = time.perf_counter()

        def start_copy():
            return stream_copy_into(
                spark, wh, landing, ("s", "copied"), ckpt2,
                max_files_per_trigger=2,
            )

        q = start_copy()
        _wait_batches(q, 3)
        _stop(q)
        print("# s2: stopped mid-drain", file=sys.stderr)
        rows_at_stop = wh.read("s", "copied").count()
        # MORE files land while the query is down (mid-drain advance);
        # append, never overwrite -- the checkpoint's seen-file log
        # must treat the old files as consumed
        odds.repartition(4).write.mode("append").parquet(landing)
        q = start_copy()
        q.awaitTermination(600)
        total = wh.read("s", "copied").count()
        dups = (
            wh.read("s", "copied").groupBy("event_id").count()
            .filter(F.col("count") > 1).count()
        )
        missing, extra = snap_except(
            wh.read("s", "copied").select(
                "event_id", "event_type", "value"
            ),
            "SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) "
            f"FROM '{sf_dir}/events.parquet'",
        )
        app_id = "copy-" + hashlib.md5(ckpt2.encode()).hexdigest()[:12]
        last_epoch = wh.last_txn_version("s", "copied", app_id)
        v_before = wh.current_version("s", "copied")
        wh.insert(
            "s", "copied", events.limit(50), txn=(app_id, last_epoch)
        )
        replay_noop = (
            wh.current_version("s", "copied") == v_before
            and wh.read("s", "copied").count() == total
        )
        record(
            "stream_copy_kill_middrain",
            wall_sec=round(time.perf_counter() - t0, 2),
            rows_at_stop=rows_at_stop,
            rows_total=total,
            killed_midrun_ok=0 < rows_at_stop < total,
            dup_keys=dups,
            no_dups_ok=dups == 0,
            set_missing=missing,
            set_extra=extra,
            set_ok=missing == 0 and extra == 0,
            last_epoch=last_epoch,
            replay_noop_ok=bool(replay_noop),
        )

        # ---- scenario 3: table-to-table MERGE mode, keyed dest
        wh.create_table("s", "dst_keyed", events.schema, key="event_id")
        ckpt3 = os.path.join(root, "ckpt_merge")
        t0 = time.perf_counter()

        def start_merge():
            return stream_table_to_table(
                spark, wh, ("s", "src"), ("s", "dst_keyed"), ckpt3,
                mode="merge", strategy="mor",
                max_versions_per_trigger=2,
                trigger={"processingTime": "1 second"},
            )

        q = start_merge()
        _wait_batches(q, 2)
        _stop(q)
        print("# s3: stopped mid-run", file=sys.stderr)
        rows_at_stop = wh.read("s", "dst_keyed").count()
        _drain(start_merge())
        total = wh.read("s", "dst_keyed").count()
        dups = (
            wh.read("s", "dst_keyed").groupBy("event_id").count()
            .filter(F.col("count") > 1).count()
        )
        missing, extra = snap_except(
            wh.read("s", "dst_keyed").select(
                "event_id", "event_type", "value"
            ),
            "SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) "
            f"FROM '{sf_dir}/events.parquet'",
        )
        record(
            "t2t_merge_kill_restart",
            wall_sec=round(time.perf_counter() - t0, 2),
            rows_at_stop=rows_at_stop,
            rows_total=total,
            killed_midrun_ok=0 < rows_at_stop <= total,
            dup_keys=dups,
            no_dups_ok=dups == 0,
            set_missing=missing,
            set_extra=extra,
            set_ok=missing == 0 and extra == 0,
        )

        out = {
            "metric": "stream_sweep",
            "sf_dir": sf_dir,
            "ok": ok_all,
            "steps": results,
        }
        print(json.dumps(out))
        if record_path:
            with open(record_path, "w") as f:
                json.dump(out, f, indent=1)
        return 0 if ok_all else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
