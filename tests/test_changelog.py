"""Commit-granular incremental reads + changelog (Iceberg incremental
append scan / table_changes analog) and the Structured-Streaming source
over warehouse tables (sources/streamsource.py)."""

from __future__ import annotations

import tempfile

import pytest
import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import Warehouse

S = StructType(
    [
        StructField("id", StringType(), False),
        StructField("day", StringType()),
        StructField("v", LongType()),
    ]
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, S)


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path))
    w.create_namespace("ns")
    w.create_table("ns", "t", S, key="id", partition_by="day")
    return w


def _changes(df):
    return {
        (r.id, r.v, r._change_type, r._commit_version) for r in df.collect()
    }


def test_commit_ops_are_stamped(wh, spark):
    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1)]))
    wh.update_where("ns", "t", {"v": F.lit(9)}, F.col("id") == "k1")
    wh.delete_where("ns", "t", F.col("id") == "k1")
    wh.insert("ns", "t", _rows(spark, [("k2", "d0", 2), ("k3", "d0", 3)]))
    wh.compact("ns", "t", min_files_per_partition=1)
    tdir = wh._table_dir("ns", "t")
    ops = [wh._manifest_doc(tdir, v).get("op") for v in wh._versions(tdir)]
    assert ops == ["create", "append", "update", "delete", "append", "replace"]


def test_read_incremental_appends_only(wh, spark):
    v1 = wh.insert("ns", "t", _rows(spark, [(f"k{i}", "d0", i) for i in range(4)]))
    v2 = wh.insert("ns", "t", _rows(spark, [("k4", "d1", 4), ("k5", "d1", 5)]))
    v3 = wh.insert("ns", "t", _rows(spark, [("k6", "d0", 6)]))
    got = {r.id for r in wh.read_incremental("ns", "t", v1, v3).collect()}
    assert got == {"k4", "k5", "k6"}
    assert wh.read_incremental("ns", "t", 0, v1).count() == 4
    # a replace commit inside the range is skipped by stamp
    wh.compact("ns", "t", min_files_per_partition=1)
    v4 = wh.current_version("ns", "t")
    assert wh.read_incremental("ns", "t", v3, v4).count() == 0
    assert {r.id for r in wh.read_incremental("ns", "t", v2, v4).collect()} == {"k6"}
    with pytest.raises(ValueError, match="replace"):
        wh.read_incremental("ns", "t", v3, v4, skip_replace=False)


def test_read_incremental_raises_on_row_level_dml(wh, spark):
    v1 = wh.insert("ns", "t", _rows(spark, [(f"k{i}", "d0", i) for i in range(4)]))
    wh.delete_where("ns", "t", F.col("id") == "k1")
    v2 = wh.current_version("ns", "t")
    with pytest.raises(ValueError, match="changelog"):
        wh.read_incremental("ns", "t", v1, v2)
    # merge-on-read commits add equality deletes -> also not appendable
    wh.merge_upsert(
        "ns", "t", _rows(spark, [("k2", "d0", 99)]), strategy="mor"
    )
    with pytest.raises(ValueError, match="changelog"):
        wh.read_incremental("ns", "t", v2)


def test_read_incremental_expired_range_raises(wh, spark):
    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1)]))
    wh.insert("ns", "t", _rows(spark, [("k2", "d0", 2)]))
    v3 = wh.insert("ns", "t", _rows(spark, [("k3", "d0", 3)]))
    wh.expire_snapshots("ns", "t", keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        wh.read_incremental("ns", "t", 1, v3)


def test_changelog_cow_update_nets_carried_rows(wh, spark):
    wh.insert(
        "ns", "t",
        _rows(spark, [(f"k{i}", "d0", i) for i in range(6)]).coalesce(1),
    )
    r = wh.update_where("ns", "t", {"v": F.col("v") + 100}, F.col("id") == "k3")
    v = r["version"]
    got = _changes(wh.changelog("ns", "t", v - 1, v))
    # one file rewritten, but only k3 is a logical change
    assert got == {("k3", 3, "delete", v), ("k3", 103, "insert", v)}


def test_changelog_mor_merge_preimages(wh, spark):
    v1 = wh.insert(
        "ns", "t", _rows(spark, [("k1", "d0", 1), ("k2", "d1", 2)]).coalesce(1)
    )
    src = _rows(spark, [("k1", "d0", 10), ("k9", "d0", 90), ("k2", "d1", 2)])
    src = src.withColumn("_del", F.col("id") == "k2")
    v2 = wh.merge_upsert("ns", "t", src, delete_col="_del", strategy="mor")
    got = _changes(wh.changelog("ns", "t", v1, v2))
    assert got == {
        ("k1", 1, "delete", v2),   # pre-image of the upsert
        ("k1", 10, "insert", v2),  # post-image
        ("k9", 90, "insert", v2),  # pure insert
        ("k2", 2, "delete", v2),   # equality delete
    }


def test_changelog_is_ghost_aware(wh, spark):
    """Rows already equality-deleted must not be re-reported as deleted
    when a later CoW rewrite removes the file that still carries them."""
    wh.insert(
        "ns", "t",
        _rows(spark, [("k1", "d0", 1), ("k2", "d0", 2), ("k3", "d0", 3)]).coalesce(1),
    )
    wh.delete_where("ns", "t", F.col("id") == "k2", strategy="mor")
    r = wh.delete_where("ns", "t", F.col("id") == "k3")  # CoW rewrite
    v = r["version"]
    got = _changes(wh.changelog("ns", "t", v - 1, v))
    assert got == {("k3", 3, "delete", v)}  # k2 was already gone


def test_changelog_skips_replace_and_schema_commits(wh, spark):
    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1), ("k2", "d1", 2)]))
    v1 = wh.current_version("ns", "t")
    wh.add_column("ns", "t", StructField("extra", LongType()))
    wh.compact("ns", "t", min_files_per_partition=1)
    v3 = wh.current_version("ns", "t")
    assert v3 == v1 + 2
    assert wh.changelog("ns", "t", v1, v3).count() == 0


def test_changelog_rollback_surfaces_restored_rows(wh, spark):
    v1 = wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1), ("k2", "d0", 2)]))
    wh.delete_where("ns", "t", F.col("id") == "k2")
    v3 = wh.rollback_to("ns", "t", v1)
    got = _changes(wh.changelog("ns", "t", v3 - 1, v3))
    assert got == {("k2", 2, "insert", v3)}


def test_changelog_empty_range_schema(wh, spark):
    v1 = wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1)]))
    wh.compact("ns", "t", min_files_per_partition=1)
    df = wh.changelog("ns", "t", v1)
    assert df.count() == 0
    assert df.columns == ["id", "day", "v", "_change_type", "_commit_version"]


def test_changelog_net_false_reports_file_level_rows(wh, spark):
    wh.insert(
        "ns", "t",
        _rows(spark, [("k1", "d0", 1), ("k2", "d0", 2)]).coalesce(1),
    )
    r = wh.update_where("ns", "t", {"v": F.lit(99)}, F.col("id") == "k1")
    v = r["version"]
    raw = _changes(wh.changelog("ns", "t", v - 1, v, net=False))
    # carried-over k2 appears on both sides without netting
    assert ("k2", 2, "delete", v) in raw and ("k2", 2, "insert", v) in raw


# -- streaming source --


def _drain(spark, stream, ckpt, out):
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.exception() is not None:
        raise RuntimeError(str(q.exception()))


@pytest.fixture()
def registered(spark):
    from sample_for_transactional_datalake_using_s3tables_spark.sources.streamsource import (
        WarehouseAppendsDataSource,
    )

    spark.dataSource.register(WarehouseAppendsDataSource)
    return spark


def _stream(spark, root, **opts):
    r = (
        spark.readStream.format("warehouse_appends")
        .option("root", root)
        .option("ns", "ns")
        .option("table", "t")
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


@pytest.mark.slow
def test_stream_appends_exactly_once_across_restarts(registered, wh, spark):
    root = wh.root
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp() + "/out"
    wh.insert("ns", "t", _rows(spark, [(f"k{i}", "d0", i) for i in range(3)]))
    stream = _stream(spark, root)
    _drain(spark, stream, ckpt, out)
    assert {r.id for r in spark.read.parquet(out).collect()} == {"k0", "k1", "k2"}
    # new append + compaction; restart resumes from the checkpoint and
    # sees ONLY the new rows (replace commit invisible)
    wh.insert("ns", "t", _rows(spark, [("k3", "d1", 3)]))
    wh.compact("ns", "t", min_files_per_partition=1)
    _drain(spark, stream, ckpt, out)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == ["k0", "k1", "k2", "k3"]


@pytest.mark.slow
def test_stream_raises_on_row_level_dml(registered, wh, spark):
    root = wh.root
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp() + "/out"
    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1), ("k2", "d0", 2)]))
    stream = _stream(spark, root)
    _drain(spark, stream, ckpt, out)
    wh.delete_where("ns", "t", F.col("id") == "k1")
    # surfaces either as q.exception() (-> RuntimeError) or directly as
    # a StreamingQueryException from awaitTermination
    with pytest.raises(Exception, match="(?i)delete"):
        _drain(spark, stream, ckpt, out)
    # on_delete=skip streams past the non-append snapshot
    skipper = _stream(spark, root, on_delete="skip")
    ckpt2, out2 = tempfile.mkdtemp(), tempfile.mkdtemp() + "/out"
    _drain(spark, skipper, ckpt2, out2)
    wh.insert("ns", "t", _rows(spark, [("k9", "d0", 9)]))
    _drain(spark, skipper, ckpt2, out2)
    got = sorted(r.id for r in spark.read.parquet(out2).collect())
    assert got == ["k1", "k2", "k9"]  # initial snapshot + later append


def test_stream_from_version_and_column_mapping(registered, wh, spark):
    root = wh.root
    v1 = wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1)]))
    wh.rename_column("ns", "t", "v", "val")
    wh.insert(
        "ns", "t",
        spark.createDataFrame([("k2", "d1", 2)], "id string, day string, val long"),
    )
    stream = _stream(spark, root, from_version=str(v1))
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp() + "/out"
    _drain(spark, stream, ckpt, out)
    rows = spark.read.parquet(out)
    assert rows.columns == ["id", "day", "val"]
    assert [(r.id, r.val) for r in rows.collect()] == [("k2", 2)]


@pytest.mark.slow
def test_stream_table_to_table_medallion_hop(registered, wh, spark):
    """Bronze -> silver: tail one table's appends, transform, MERGE
    into another -- exactly-once across restarts, zero duplicate keys."""
    import tempfile as _tf

    import pyspark.sql.functions as F

    from sample_for_transactional_datalake_using_s3tables_spark.streaming.tables import (
        stream_table_to_table,
    )

    wh.create_table("ns", "silver", S, key="id")
    ckpt = _tf.mkdtemp()

    def hop():
        q = stream_table_to_table(
            spark, wh, ("ns", "t"), ("ns", "silver"), ckpt,
            transform=lambda df: df.withColumn("v", F.col("v") * 10),
        )
        q.awaitTermination(180)
        assert q.exception() is None, q.exception()

    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1), ("k2", "d1", 2)]))
    hop()
    got = {(r.id, r.v) for r in wh.read("ns", "silver").collect()}
    assert got == {("k1", 10), ("k2", 20)}
    # upsert in bronze (same key re-appended) + a new key; replay-safe
    wh.insert("ns", "t", _rows(spark, [("k2", "d1", 5), ("k3", "d0", 3)]))
    hop()
    got = {(r.id, r.v) for r in wh.read("ns", "silver").collect()}
    assert got == {("k1", 10), ("k2", 50), ("k3", 30)}
    # restart with nothing new: no effect, no new snapshot churn from
    # empty batches (merge_upsert no-ops on empty)
    v = wh.current_version("ns", "silver")
    hop()
    assert wh.current_version("ns", "silver") == v
    assert {(r.id, r.v) for r in wh.read("ns", "silver").collect()} == got


def test_stream_across_add_column_evolution(registered, wh, spark):
    """Files appended BEFORE an ADD COLUMN lack the new physical
    column; the stream read null-fills them to the range-end schema
    (same projection as the batch path) instead of raising."""
    from pyspark.sql.types import DoubleType, StructField

    root = wh.root
    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1)]))
    wh.add_column("ns", "t", StructField("score", DoubleType()))
    wh.insert(
        "ns", "t",
        spark.createDataFrame(
            [("k2", "d1", 2, 0.5)],
            "id string, day string, v long, score double",
        ),
    )
    stream = _stream(spark, root)
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp() + "/out"
    _drain(spark, stream, ckpt, out)
    rows = spark.read.parquet(out)
    assert set(rows.columns) == {"id", "day", "v", "score"}
    got = {(r.id, r.v, r.score) for r in rows.collect()}
    assert got == {("k1", 1, None), ("k2", 2, 0.5)}


def test_changelog_append_only_range_plans_one_scan(wh, spark):
    """A long append-only commit range folds into ONE parquet scan
    (file->version broadcast map), not one union branch per commit,
    and plans no exceptAll netting."""
    for i in range(8):
        wh.insert("ns", "t", _rows(spark, [(f"k{i}", "d0", i)]))
    df = wh.changelog("ns", "t", 0)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_scans = plan.count("parquet")
    assert n_scans == 1, f"expected 1 parquet relation, plan:\n{plan}"
    assert "Except" not in plan
    got = {(r.id, r._change_type, r._commit_version) for r in df.collect()}
    assert got == {(f"k{i}", "insert", i + 1) for i in range(8)}


def test_changelog_mixed_range_segments(wh, spark):
    """Append runs fold; a DML commit in the middle stays per-commit
    with correct pre/post images on both sides."""
    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1)]))
    wh.insert("ns", "t", _rows(spark, [("k2", "d0", 2)]))
    wh.update_where("ns", "t", {"v": F.lit(99)}, F.col("id") == "k1")
    wh.insert("ns", "t", _rows(spark, [("k3", "d1", 3)]))
    v = wh.current_version("ns", "t")
    got = _changes(wh.changelog("ns", "t", 0, v))
    assert got == {
        ("k1", 1, "insert", 1),
        ("k2", 2, "insert", 2),
        ("k1", 1, "delete", 3),
        ("k1", 99, "insert", 3),
        ("k3", 3, "insert", 4),
    }


@pytest.mark.slow
def test_stream_rate_limit_max_versions_per_trigger(registered, wh, spark):
    """max_versions_per_trigger bounds each catch-up batch to N commits
    (Iceberg's streaming read limit): a backlog of 6 single-row commits
    drains in ceil(commits/N) availableNow runs, restarts resuming from
    the checkpoint, no rows lost or duplicated."""
    root = wh.root
    for i in range(6):
        wh.insert("ns", "t", _rows(spark, [(f"k{i}", "d0", i)]).coalesce(1))
    stream = _stream(spark, root, max_versions_per_trigger="3")
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp() + "/out"
    counts = []
    for _ in range(5):
        _drain(spark, stream, ckpt, out)
        counts.append(spark.read.parquet(out).count())
        if counts[-1] == 6:
            break
    # bounded progress per run, full drain, exactly-once
    assert counts[-1] == 6
    assert len(counts) >= 2  # the limit actually split the backlog
    assert all(b - a <= 3 for a, b in zip(counts, counts[1:]))
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == [f"k{i}" for i in range(6)]


def test_stream_across_type_widening(registered, wh, spark):
    """Files written before an int->long widening carry the narrow
    physical type; the stream read up-casts them to the range-end
    schema (same as the batch path)."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
        Warehouse,
    )

    S2 = StructType(
        [StructField("id", StringType(), False), StructField("n", IntegerType())]
    )
    root = tempfile.mkdtemp()
    w = Warehouse(spark, root)
    w.create_namespace("ns")
    w.create_table("ns", "t", S2, key="id")
    w.insert("ns", "t", spark.createDataFrame([("k1", 7)], S2).coalesce(1))
    w.widen_column("ns", "t", "n", "bigint")
    w.insert(
        "ns", "t",
        spark.createDataFrame(
            [("k2", 5_000_000_000)], "id string, n bigint"
        ).coalesce(1),
    )
    stream = (
        spark.readStream.format("warehouse_appends")
        .option("root", root).option("ns", "ns").option("table", "t").load()
    )
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp() + "/out"
    _drain(spark, stream, ckpt, out)
    got = sorted((r.id, r.n) for r in spark.read.parquet(out).collect())
    assert got == [("k1", 7), ("k2", 5_000_000_000)]


@pytest.mark.slow
def test_stream_cursor_never_regresses(registered, wh, spark):
    """Offset safety must not depend on Spark's engine call order after
    a restart: whatever call arrives first (latestOffset, partitions
    replay, or commit), the reader never issues an offset below any
    position it has already seen."""
    from sample_for_transactional_datalake_using_s3tables_spark.sources.streamsource import (
        WarehouseAppendsStreamReader,
    )

    root = wh.root
    for i in range(6):
        wh.insert("ns", "t", _rows(spark, [(f"k{i}", "d0", i)]).coalesce(1))
    schema = wh.read("ns", "t").schema
    opts = {
        "root": root, "ns": "ns", "table": "t",
        "max_versions_per_trigger": "2",
    }

    # restart where the FIRST engine call is latestOffset (last batch
    # fully committed at checkpoint offset 4): the paced offset (2) is
    # below the checkpoint; partitions(4, 2) must plan nothing, and the
    # next latestOffset must resume >= 4 -- no replayed rows
    r = WarehouseAppendsStreamReader(schema, dict(opts))
    first = int(r.latestOffset()["version"])
    assert first <= 2
    assert r.partitions({"version": 4}, {"version": first}) == []
    nxt = int(r.latestOffset()["version"])
    assert nxt >= 4
    assert nxt == 6  # paced max(cursor, hwm=4) + 2

    # restart where the FIRST engine call is commit(end) for the
    # already-committed batch: the cursor adopts it and re-paces from
    # there, not from version 0
    r2 = WarehouseAppendsStreamReader(schema, dict(opts))
    r2.commit({"version": 4})
    assert int(r2.latestOffset()["version"]) == 6

    # normal pacing is unchanged: 0 -> 2 -> 4 -> 6
    r3 = WarehouseAppendsStreamReader(schema, dict(opts))
    seen = [int(r3.latestOffset()["version"]) for _ in range(3)]
    assert seen == [2, 4, 6]


@pytest.mark.slow
def test_changelog_append_run_opens_constant_manifests(wh, spark, monkeypatch):
    """Driver-side metadata cost: a range of N append commits must
    classify from the _commits.idx sidecar and resolve its added files
    from the RUN-END manifest alone -- a constant number of manifest
    JSON parses, not O(N)."""
    import sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse as whmod

    n = 12
    for i in range(n):
        wh.insert("ns", "t", _rows(spark, [(f"k{i}", "d0", i)]).coalesce(1))

    calls = {"n": 0}
    orig = whmod.Warehouse._manifest_doc

    def counting(self, tdir, version, branch=None):
        calls["n"] += 1
        return orig(self, tdir, version, branch)

    monkeypatch.setattr(whmod.Warehouse, "_manifest_doc", counting)
    df = wh.changelog("ns", "t", 0)
    got = {(r.id, r._change_type, r._commit_version) for r in df.collect()}
    assert got == {(f"k{i}", "insert", i + 1) for i in range(n)}
    # end_doc + run-end resolve (+ nothing per-commit)
    assert calls["n"] <= 3, f"changelog parsed {calls['n']} manifests for {n} appends"


@pytest.mark.slow
def test_fast_forward_links_manifests_without_parsing(wh, spark, monkeypatch):
    """Happy-path fast-forward (main still at the fork) replays the
    branch by HARD-LINKING its manifest JSONs -- zero manifest parses
    however long the branch -- and extends main's commit index from
    the branch's rows so timestamp travel stays O(1) afterwards."""
    import sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse as whmod

    wh.insert("ns", "t", _rows(spark, [("k0", "d0", 0)]).coalesce(1))
    wh.create_branch("ns", "t", "audit")
    for i in range(1, 6):
        wh.insert(
            "ns", "t", _rows(spark, [(f"b{i}", "d0", i)]).coalesce(1),
            branch="audit",
        )
    branch_ts = {
        r["version"]: r["ts"]
        for r in wh._commit_index(wh._table_dir("ns", "t"), "audit")
    }

    calls = {"n": 0}
    orig = whmod.Warehouse._manifest_doc

    def counting(self, tdir, version, branch=None):
        calls["n"] += 1
        return orig(self, tdir, version, branch)

    monkeypatch.setattr(whmod.Warehouse, "_manifest_doc", counting)
    tip = wh.fast_forward("ns", "t", "audit")
    assert calls["n"] == 0, f"fast_forward parsed {calls['n']} manifests"
    monkeypatch.undo()
    # replay is verbatim: rows, per-commit history, and original commit
    # wall clocks all carried over; index stayed gap-free (no rebuild)
    assert {r.id for r in wh.read("ns", "t").collect()} == {
        "k0", "b1", "b2", "b3", "b4", "b5"
    }
    idx = wh._commit_index(wh._table_dir("ns", "t"))
    assert [r["version"] for r in idx] == list(range(tip + 1))
    for v, ts in branch_ts.items():
        assert idx[v]["ts"] == ts


def test_idempotent_txn_insert(wh, spark):
    """Delta txnAppId/txnVersion analog: a replayed (app, epoch) insert
    is a no-op; higher epochs commit; apps are independent; the stamp
    survives an index rebuild (it rides the manifest)."""
    import os as _os

    v1 = wh.insert(
        "ns", "t", _rows(spark, [("a", "d0", 1)]).coalesce(1),
        txn=("etl", 0),
    )
    assert wh.last_txn_version("ns", "t", "etl") == 0
    # replay of epoch 0: provable no-op
    assert wh.insert(
        "ns", "t", _rows(spark, [("a", "d0", 1)]).coalesce(1),
        txn=("etl", 0),
    ) == v1
    assert wh.count_rows("ns", "t") == 1
    # stale epoch also skips; next epoch commits
    assert wh.insert(
        "ns", "t", _rows(spark, [("x", "d0", 9)]).coalesce(1),
        txn=("etl", -1),
    ) == v1
    v2 = wh.insert(
        "ns", "t", _rows(spark, [("b", "d0", 2)]).coalesce(1),
        txn=("etl", 1),
    )
    assert v2 == v1 + 1 and wh.count_rows("ns", "t") == 2
    # a different app is independent
    wh.insert(
        "ns", "t", _rows(spark, [("c", "d0", 3)]).coalesce(1),
        txn=("other", 0),
    )
    assert wh.count_rows("ns", "t") == 3
    assert wh.last_txn_version("ns", "t", "etl") == 1
    assert wh.last_txn_version("ns", "t", "other") == 0
    assert wh.last_txn_version("ns", "t", "nope") is None
    # ledger == manifest chain: delete the sidecar, force a rebuild,
    # and the txn stamps come back from the manifests
    tdir = wh._table_dir("ns", "t")
    _os.remove(_os.path.join(wh._vdir(tdir), "_commits.idx"))
    assert wh.last_txn_version("ns", "t", "etl") == 1
    # replay check still holds after the rebuild
    wh.insert(
        "ns", "t", _rows(spark, [("b", "d0", 2)]).coalesce(1),
        txn=("etl", 1),
    )
    assert wh.count_rows("ns", "t") == 3


@pytest.mark.slow
def test_stream_append_mode_keyless_exactly_once(registered, wh, spark):
    """mode="append": a KEYLESS destination stays exactly-once via the
    txn stamp riding each micro-batch commit -- restarts with nothing
    new write nothing, replayed epochs are provable no-ops, new source
    data lands once."""
    import tempfile as _tf

    from pyspark.sql.types import LongType, StringType, StructField, StructType
    from sample_for_transactional_datalake_using_s3tables_spark.streaming.tables import (
        stream_table_to_table,
    )

    sink_schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("day", StringType()),
            StructField("v", LongType()),
        ]
    )
    wh.create_table("ns", "log", sink_schema)  # keyless
    ckpt = _tf.mkdtemp()

    def hop():
        q = stream_table_to_table(
            spark, wh, ("ns", "t"), ("ns", "log"), ckpt,
            mode="append", app_id="hop1",
        )
        q.awaitTermination(180)
        assert q.exception() is None, q.exception()

    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1), ("k2", "d1", 2)]))
    hop()
    assert wh.count_rows("ns", "log") == 2
    assert wh.last_txn_version("ns", "log", "hop1") is not None
    # restart, nothing new: no batches, no growth
    hop()
    assert wh.count_rows("ns", "log") == 2
    # new bronze data: lands exactly once (duplicate ROWS allowed by
    # a keyless log, so count proves no replay duplication)
    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 7)]))
    hop()
    assert wh.count_rows("ns", "log") == 3
    # a crash-replayed epoch: re-insert with an already-used stamp
    used = wh.last_txn_version("ns", "log", "hop1")
    wh.insert(
        "ns", "log", _rows(spark, [("dup", "d0", 0)]).coalesce(1),
        txn=("hop1", used),
    )
    assert wh.count_rows("ns", "log") == 3


def test_stream_branch_starts_and_reads(registered, wh, spark):
    """Streaming a BRANCH (code-review r8 findings): the version dir
    carries _fork.json (must not parse as a version) and starts at the
    fork point (a hard-coded initial version 0 made every branch
    stream unstartable)."""
    root = wh.root
    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1)]))
    wh.create_branch("ns", "t", "audit")
    wh.insert("ns", "t", _rows(spark, [("b1", "d0", 10)]), branch="audit")
    wh.insert("ns", "t", _rows(spark, [("b2", "d1", 11)]), branch="audit")
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp() + "/out"
    stream = _stream(spark, root, branch="audit")
    _drain(spark, stream, ckpt, out)
    got = {r.id for r in spark.read.parquet(out).collect()}
    # fork-point contents are the baseline state; branch appends stream
    assert got == {"b1", "b2"}


def test_stream_starts_after_expire_snapshots(registered, wh, spark):
    """expire_snapshots removing version 0 must not make a fresh
    stream unstartable: the default baseline is the oldest LIVE
    snapshot (its contents are initial state, not replayed)."""
    root = wh.root
    wh.insert("ns", "t", _rows(spark, [("old", "d0", 1)]))
    wh.insert("ns", "t", _rows(spark, [("mid", "d0", 2)]))
    wh.expire_snapshots("ns", "t", keep_last=1)
    wh.insert("ns", "t", _rows(spark, [("new", "d0", 3)]))
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp() + "/out"
    stream = _stream(spark, root)
    _drain(spark, stream, ckpt, out)
    got = {r.id for r in spark.read.parquet(out).collect()}
    assert got == {"new"}  # baseline = oldest live snapshot's state


def test_stream_mid_stream_rename_uses_adding_snapshots_mapping(
    registered, wh, spark
):
    """Files are projected with the ADDING snapshot's column mapping:
    a pre-stream rename plus a MID-stream rename must keep values
    flowing (the range-end map would null-fill them)."""
    root = wh.root
    wh.rename_column("ns", "t", "v", "val")       # phys map {'val': 'v'}
    wh.insert(
        "ns", "t",
        spark.createDataFrame([("a", "d0", 1)], "id string, day string, val long"),
    )
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp() + "/out"
    stream = _stream(spark, root)
    _drain(spark, stream, ckpt, out)
    wh.insert(
        "ns", "t",
        spark.createDataFrame([("b", "d0", 2)], "id string, day string, val long"),
    )
    wh.rename_column("ns", "t", "val", "val2")    # mid-stream rename
    wh.insert(
        "ns", "t",
        spark.createDataFrame([("c", "d0", 3)], "id string, day string, val2 long"),
    )
    _drain(spark, stream, ckpt, out)
    rows = {r.id: r.val for r in spark.read.parquet(out).collect()}
    # 'b' was added while the logical name was still 'val': its value
    # must survive the later rename (pre-fix: NULL); 'c' was added
    # under 'val2', which the fixed stream schema (val) null-fills
    assert rows["a"] == 1 and rows["b"] == 2


@pytest.mark.slow
def test_stream_table_to_table_keeps_mv_continuously_fresh(
    registered, wh, spark
):
    """Streaming MV maintenance: a keyless (append-mode) medallion hop
    with ``refresh_mvs`` keeps a GROUP BY rollup fresh after every
    micro-batch -- and every refresh after the first materialization
    takes the O(batch + groups) aggregate-merge path (observed via
    on_refresh), never a table rescan."""
    import tempfile as _tf

    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import (
        WarehouseSQL,
    )
    from sample_for_transactional_datalake_using_s3tables_spark.streaming.tables import (
        stream_table_to_table,
    )

    wh.create_table("ns", "silver", S)  # keyless: append-mode sink
    sql = WarehouseSQL(wh)
    sql.execute(
        "CREATE MATERIALIZED VIEW ns.rollup AS "
        "SELECT day, COUNT(*) AS n, SUM(v) AS total "
        "FROM ns.silver GROUP BY day"
    )
    ckpt = _tf.mkdtemp()
    seen: list[tuple[str, bool, str | None]] = []

    def hop():
        q = stream_table_to_table(
            spark, wh, ("ns", "t"), ("ns", "silver"), ckpt,
            mode="append",
            refresh_mvs=["ns.rollup"],
            on_refresh=lambda ref, st: seen.append(
                (ref, st["incremental"], st.get("incremental_mode"))
            ),
        )
        q.awaitTermination(180)
        assert q.exception() is None, q.exception()

    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1), ("k2", "d1", 2)]))
    hop()
    assert wh.mv_status("ns", "rollup")["fresh"]
    got = {
        (r.day, r.n, r.total)
        for r in sql.execute("SELECT * FROM ns.rollup").collect()
    }
    assert got == {("d0", 1, 1), ("d1", 1, 2)}

    wh.insert("ns", "t", _rows(spark, [("k3", "d0", 30), ("k4", "d2", 4)]))
    hop()
    assert wh.mv_status("ns", "rollup")["fresh"]
    got = {
        (r.day, r.n, r.total)
        for r in sql.execute("SELECT * FROM ns.rollup").collect()
    }
    assert got == {("d0", 2, 31), ("d1", 1, 2), ("d2", 1, 4)}
    # first refresh materializes (full); every later one merges
    assert seen[0][1] is False
    assert all(
        inc is True and mode == "aggregate-merge"
        for _, inc, mode in seen[1:]
    ), seen
    assert len(seen) >= 2


@pytest.mark.slow
def test_stream_merge_keeps_cdf_mv_incrementally_fresh(
    registered, wh, spark
):
    """Round 12 (VERDICT r11 #3 end-to-end): a MERGE-mode medallion hop
    into a change-feed destination keeps a SUM/COUNT/AVG rollup fresh
    through the DELETE-FOLDING merge path -- every per-batch refresh
    after the first materialization reports aggregate-merge-cdf, never
    a table rescan, even though MERGE commits are not appends. This is
    the reference's CDC-upsert-then-rollup flow, incremental end to
    end."""
    import tempfile as _tf

    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import (
        WarehouseSQL,
    )
    from sample_for_transactional_datalake_using_s3tables_spark.streaming.tables import (
        stream_table_to_table,
    )

    wh.create_table("ns", "gold", S, key="id")
    wh.set_change_feed("ns", "gold", True)
    sql = WarehouseSQL(wh)
    sql.execute(
        "CREATE MATERIALIZED VIEW ns.cdfroll AS "
        "SELECT day, COUNT(*) AS n, SUM(v) AS total, AVG(v) AS m "
        "FROM ns.gold GROUP BY day"
    )
    ckpt = _tf.mkdtemp()
    seen: list[tuple[bool, str | None]] = []

    def hop():
        q = stream_table_to_table(
            spark, wh, ("ns", "t"), ("ns", "gold"), ckpt,
            mode="merge", strategy="mor",
            refresh_mvs=["ns.cdfroll"],
            on_refresh=lambda ref, st: seen.append(
                (st["incremental"], st.get("incremental_mode"))
            ),
        )
        q.awaitTermination(180)
        assert q.exception() is None, q.exception()

    def rollup():
        return {
            (r.day, r.n, r.total, r.m)
            for r in sql.execute("SELECT * FROM ns.cdfroll").collect()
        }

    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1), ("k2", "d1", 2)]))
    hop()
    assert wh.mv_status("ns", "cdfroll")["fresh"]
    assert rollup() == {("d0", 1, 1, 1.0), ("d1", 1, 2, 2.0)}

    # upsert batch: k1 MOVES from d0 to d1 (a MERGE update is
    # delete(pre)+insert(post) in the changelog -- the d0 group must
    # VANISH, exactly what the liveness partial certifies) + a new key
    wh.insert("ns", "t", _rows(spark, [("k1", "d1", 10), ("k3", "d2", 3)]))
    hop()
    assert wh.mv_status("ns", "cdfroll")["fresh"]
    assert rollup() == {("d1", 2, 12, 6.0), ("d2", 1, 3, 3.0)}

    # first refresh materializes (full); every later one is the
    # delete-folding merge, NEVER a full recompute
    assert seen[0][0] is False
    assert all(
        inc is True and mode == "aggregate-merge-cdf"
        for inc, mode in seen[1:]
    ), seen
    assert len(seen) >= 2
