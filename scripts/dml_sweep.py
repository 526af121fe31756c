"""DML rung of the falsification ladder (VERDICT r10 #3).

Large MoR DELETE / MERGE / compact interleavings at scale,
oracle-compared against DuckDB survivor sets after EVERY step -- the
class of wrong-answer bug the round-10 ``_read_entries`` regression
lived in (multi-file equality-delete commits silently collapsed to one
file per commit; only small, AQE-coalesced single-file commits were
ever oracle-certified).

Every MoR commit here is forced MULTI-FILE (AQE partition coalescing
pinned off), batches run far past ``_MERGE_COLLECT_KEYS_MAX``, and the
comparison is the full survivor SET (anti-join both directions via
DuckDB over the exported snapshot), not just counts -- plus the
metadata-COUNT == scan-count invariant at every step.

Round-11 rung (VERDICT r10 #7): the table runs with stored Change Data
Feed ON, so the CoW UPDATE step writes change files and the changelog
mixes stored + derived commits. At every full-set step the ENTIRE
changelog (version 0 -> tip) is REPLAYED -- per key, the change with
the highest commit version wins, insert beating delete at a tie (an
update is delete(pre)+insert(post) at one version) -- and the replayed
survivor set must exceptAll-match the direct read in both directions.
That certifies the stored-CDF path and the MoR-aware derived diff at
the sweep's scale, against the same interleavings that broke the
round-10 read path.

Round-12 rungs (VERDICT r11 #5): POSITIONAL deletes -- mor-pos DELETE
and mor-pos UPDATE, plus an equality MoR delete stacked over the
positional backlog (the mixed-kind read path) -- and a branch/WAP
interleave: an audit branch takes a MoR merge (updates + delete-marks)
while main must stay oracle-identical, then ``fast_forward`` promotes
the branch and the survivor set + whole-history CDF replay must hold
across the replayed commits.

Usage: python scripts/dml_sweep.py [sf_dir]   (default .localdata/sf1)
Prints one JSON line; exit 0 iff every step matched.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from sample_for_transactional_datalake_using_s3tables_spark.plans import configure
    from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
        Warehouse,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
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
        .appName("dml_sweep")
        .getOrCreate()
    )
    configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    # every distinct-key shuffle keeps its partitioning: all MoR
    # commits in this sweep write as many delete files as the key set
    # spans partitions -- the 100 TB steady state
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE shadow AS SELECT event_id, event_type, "
        f"CAST(value AS DECIMAL(12,2)) AS value FROM '{sf_dir}/events.parquet'"
    )

    root = tempfile.mkdtemp(prefix="dml_sweep_")
    results: list[dict] = []
    ok_all = True
    try:
        wh = Warehouse(spark, root)
        wh.create_namespace("s")
        events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "event_type",
            F.col("value").cast("decimal(12,2)").alias("value"),
        )
        wh.create_table(
            "s", "t", events.schema, key="event_id",
            partition_by="event_type",
        )
        wh.set_change_feed("s", "t", True)
        wh.insert("s", "t", events)

        def cdf_replay(rec: dict) -> None:
            """Replay changelog(0 -> tip) into a survivor set and
            compare it to the direct read, both directions."""
            from pyspark.sql import Window as W

            t0 = time.perf_counter()
            tip = wh.current_version("s", "t")
            ch = wh.changelog("s", "t", 0, tip)
            w = W.partitionBy("event_id").orderBy(
                F.col("_commit_version").desc(),
                F.when(F.col("_change_type") == "insert", 1)
                .otherwise(0).desc(),
            )
            replayed = (
                ch.withColumn("_rn", F.row_number().over(w))
                .filter(
                    (F.col("_rn") == 1)
                    & (F.col("_change_type") == "insert")
                )
                .select("event_id", "event_type", "value")
            )
            live = wh.read("s", "t").select(
                "event_id", "event_type", "value"
            )
            rec["cdf_replay_missing"] = live.exceptAll(replayed).count()
            rec["cdf_replay_extra"] = replayed.exceptAll(live).count()
            rec["cdf_replay_match"] = (
                rec["cdf_replay_missing"] == 0
                and rec["cdf_replay_extra"] == 0
            )
            rec["cdf_replay_sec"] = round(time.perf_counter() - t0, 2)

        def check(step: str, full_set: bool = False) -> None:
            nonlocal ok_all
            t0 = time.perf_counter()
            n_meta = wh.count_rows("s", "t")
            n_scan = wh.read("s", "t").count()
            n_shadow = con.sql("SELECT COUNT(*) FROM shadow").fetchone()[0]
            dels = wh.deletes_df("s", "t").collect()
            by_seq: dict[int, int] = {}
            for d in dels:
                by_seq[d.seq] = by_seq.get(d.seq, 0) + 1
            rec = {
                "step": step,
                "rows": n_scan,
                "count_invariant": n_meta == n_scan,
                "count_vs_oracle": n_scan == n_shadow,
                "delete_files_by_seq": by_seq,
                "multifile_commits": sum(
                    1 for n in by_seq.values() if n >= 2
                ),
            }
            if full_set:
                snap = os.path.join(root, "_snap")
                wh.read("s", "t").write.mode("overwrite").parquet(snap)
                missing = con.sql(
                    "SELECT COUNT(*) FROM (SELECT event_id, event_type, value "
                    "FROM shadow EXCEPT SELECT event_id, event_type, "
                    f"CAST(value AS DECIMAL(12,2)) FROM '{snap}/*.parquet')"
                ).fetchone()[0]
                extra = con.sql(
                    "SELECT COUNT(*) FROM (SELECT event_id, event_type, "
                    f"CAST(value AS DECIMAL(12,2)) FROM '{snap}/*.parquet' "
                    "EXCEPT SELECT event_id, event_type, value FROM shadow)"
                ).fetchone()[0]
                rec["set_missing"] = missing
                rec["set_extra"] = extra
                rec["set_match"] = missing == 0 and extra == 0
                cdf_replay(rec)
            rec["check_sec"] = round(time.perf_counter() - t0, 2)
            step_ok = (
                rec["count_invariant"]
                and rec["count_vs_oracle"]
                and rec.get("set_match", True)
                and rec.get("cdf_replay_match", True)
            )
            rec["ok"] = step_ok
            ok_all = ok_all and step_ok
            results.append(rec)
            print(f"# {json.dumps(rec)}", file=sys.stderr)

        check("insert", full_set=True)

        # 1. large MoR MERGE: ~2/3 of all keys (>> 5000), multi-file
        t0 = time.perf_counter()
        batch = events.filter(F.col("event_id") % 3 != 0).withColumn(
            "value", (F.col("value") * 3).cast("decimal(12,2)")
        )
        wh.merge_upsert("s", "t", batch, strategy="mor")
        con.execute(
            "UPDATE shadow SET value = CAST(value * 3 AS DECIMAL(12,2)) "
            "WHERE event_id % 3 != 0"
        )
        merge_wall = round(time.perf_counter() - t0, 2)
        check("mor_merge_large")

        # 2. large MoR predicate DELETE (~25% of rows), multi-file
        t0 = time.perf_counter()
        wh.delete_where("s", "t", F.col("event_id") % 4 == 0, strategy="mor")
        con.execute("DELETE FROM shadow WHERE event_id % 4 = 0")
        del1_wall = round(time.perf_counter() - t0, 2)
        check("mor_delete_where_1")

        # 3. second large MERGE stacked on the ghost backlog: re-insert
        # half the just-deleted keys at a newer seq (they must SURVIVE
        # the older delete) + delete-mark a slice of survivors
        t0 = time.perf_counter()
        revive = events.filter(
            (F.col("event_id") % 4 == 0) & (F.col("event_id") % 8 == 0)
        ).withColumn(
            "value", (F.col("value") + 1).cast("decimal(12,2)")
        ).withColumn("_del", F.lit(False))
        marks = events.filter(F.col("event_id") % 9 == 0).withColumn(
            "_del", F.lit(True)
        )
        wh.merge_upsert(
            "s", "t", revive.unionByName(marks), delete_col="_del",
            strategy="mor",
        )
        # oracle replay: delete-marks win over revives for overlapping
        # keys (%72); revive = upsert (insert-or-update)
        con.execute("DELETE FROM shadow WHERE event_id % 9 = 0")
        con.execute(
            "DELETE FROM shadow WHERE event_id % 8 = 0 AND event_id % 9 != 0"
        )
        con.execute(
            # revive rows carry ORIGINAL value + 1 (the batch was built
            # from the source parquet, not the merged table)
            "INSERT INTO shadow SELECT event_id, event_type, "
            "CAST(CAST(value AS DECIMAL(12,2)) + 1 AS DECIMAL(12,2)) "
            f"FROM '{sf_dir}/events.parquet' "
            "WHERE event_id % 8 = 0 AND event_id % 9 != 0"
        )
        merge2_wall = round(time.perf_counter() - t0, 2)
        check("mor_merge_revive_and_mark", full_set=True)

        # 4. compact: folds the whole multi-file backlog in
        t0 = time.perf_counter()
        wh.compact("s", "t", min_files_per_partition=1)
        compact_wall = round(time.perf_counter() - t0, 2)
        check("compact_1", full_set=True)
        if wh.deletes_df("s", "t").count() != 0:
            ok_all = False
            print("# backlog not empty after compact", file=sys.stderr)

        # 5. post-compact: another multi-file DELETE + CoW update
        # interleave, then final compact
        t0 = time.perf_counter()
        wh.delete_where("s", "t", F.col("event_id") % 5 == 1, strategy="mor")
        con.execute("DELETE FROM shadow WHERE event_id % 5 = 1")
        check("mor_delete_where_2")
        wh.update_where(
            "s", "t", {"value": (F.col("value") * 2).cast("decimal(12,2)")},
            [("event_id", "<", 1000)],
        )
        con.execute(
            "UPDATE shadow SET value = CAST(value * 2 AS DECIMAL(12,2)) "
            "WHERE event_id < 1000"
        )
        check("cow_update_over_ghosts")
        wh.compact("s", "t", min_files_per_partition=1)
        interleave_wall = round(time.perf_counter() - t0, 2)
        check("compact_2", full_set=True)

        # 6. POSITIONAL deletes (round 12, VERDICT r11 #5): row-
        # granular keyless addressing -- mor-pos DELETE, mor-pos
        # UPDATE, then an EQUALITY MoR delete stacked over the
        # positional backlog (the mixed-kind read path), then compact
        t0 = time.perf_counter()
        wh.delete_where(
            "s", "t", F.col("event_id") % 7 == 2, strategy="mor-pos"
        )
        con.execute("DELETE FROM shadow WHERE event_id % 7 = 2")
        check("mor_pos_delete")
        wh.update_where(
            "s", "t",
            {"value": (F.col("value") + 5).cast("decimal(12,2)")},
            [("event_id", "<", 2000)],
            strategy="mor-pos",
        )
        con.execute(
            "UPDATE shadow SET value = CAST(value + 5 AS DECIMAL(12,2)) "
            "WHERE event_id < 2000"
        )
        check("mor_pos_update", full_set=True)
        wh.delete_where(
            "s", "t", F.col("event_id") % 11 == 3, strategy="mor"
        )
        con.execute("DELETE FROM shadow WHERE event_id % 11 = 3")
        check("mor_eq_over_pos_backlog", full_set=True)
        wh.compact("s", "t", min_files_per_partition=1)
        pos_wall = round(time.perf_counter() - t0, 2)
        check("compact_3", full_set=True)

        # 7. branch/WAP (write-audit-publish): MoR merge-update +
        # delete-marks land on an AUDIT BRANCH; main must stay
        # byte-identical to the oracle while the branch diverges;
        # fast_forward publishes the branch commits onto main (original
        # timestamps preserved) and the full survivor set + the whole-
        # history CDF replay must hold ACROSS the promoted commits
        t0 = time.perf_counter()
        wh.create_branch("s", "t", "audit")
        upd = events.filter(F.col("event_id") % 17 == 4).withColumn(
            "value", (F.col("value") + 7).cast("decimal(12,2)")
        ).withColumn("_del", F.lit(False))
        marks = events.filter(
            (F.col("event_id") % 17 != 4) & (F.col("event_id") % 19 == 5)
        ).withColumn("_del", F.lit(True))
        wh.merge_upsert(
            "s", "t", upd.unionByName(marks), delete_col="_del",
            strategy="mor", branch="audit",
        )
        # main untouched while the branch diverges: the PRE-branch
        # oracle state must still match main exactly
        check("wap_branch_diverged", full_set=True)
        wh.fast_forward("s", "t", "audit")
        # oracle replay of the branch batch: upsert = replace-or-insert
        # of %17==4 keys at source value + 7; delete-marks remove the
        # (disjoint) %19==5 slice
        con.execute("DELETE FROM shadow WHERE event_id % 17 = 4")
        con.execute(
            "INSERT INTO shadow SELECT event_id, event_type, "
            "CAST(CAST(value AS DECIMAL(12,2)) + 7 AS DECIMAL(12,2)) "
            f"FROM '{sf_dir}/events.parquet' WHERE event_id % 17 = 4"
        )
        con.execute(
            "DELETE FROM shadow WHERE event_id % 17 != 4 "
            "AND event_id % 19 = 5"
        )
        check("wap_fast_forward", full_set=True)
        wh.compact("s", "t", min_files_per_partition=1)
        wap_wall = round(time.perf_counter() - t0, 2)
        check("compact_4", full_set=True)

        # prove the STORED-CDF path was exercised (not just derived
        # diffs): the CoW UPDATE above must have persisted change files
        tdir = wh._table_dir("s", "t")
        stored_cdf = sum(
            1 for v in wh._versions(tdir)
            if wh._manifest_doc(tdir, v).get("change_files")
        )
        if stored_cdf < 1:
            ok_all = False
            print("# no stored-CDF commit in history", file=sys.stderr)

        out = {
            "metric": "dml_sweep",
            "sf_dir": sf_dir,
            "stored_cdf_commits": stored_cdf,
            "ok": ok_all,
            "steps": results,
            "walls_sec": {
                "mor_merge_large": merge_wall,
                "mor_delete_1": del1_wall,
                "mor_merge_revive": merge2_wall,
                "compact_1": compact_wall,
                "delete2_update_compact2": interleave_wall,
                "pos_delete_update_compact3": pos_wall,
                "wap_branch_ff_compact4": wap_wall,
            },
        }
        print(json.dumps(out))
        return 0 if ok_all else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
