"""Warehouse DDL + MERGE + time-travel + compaction (SURVEY 2.4, S5)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
    CommitConflictError,
    TableNotFoundError,
    Warehouse,
)

SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("day", StringType()),
        StructField("v", LongType()),
    ]
)


@pytest.fixture()
def wh(spark):
    with tempfile.TemporaryDirectory() as d:
        yield Warehouse(spark, d)


def _df(spark, rows):
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_ddl_lifecycle(wh):
    wh.create_namespace("analytics")
    assert wh.list_namespaces() == ["analytics"]
    wh.create_table("analytics", "t", SCHEMA, key="id", partition_by="day")
    assert wh.list_tables("analytics") == ["t"]
    # idempotent create (reference ResourceAlreadyExistsException skip)
    wh.create_table("analytics", "t", SCHEMA, key="id", partition_by="day")
    with pytest.raises(FileExistsError):
        wh.create_table("analytics", "t", SCHEMA, key="id", if_not_exists=False)
    wh.drop_table("analytics", "t")
    wh.drop_table("analytics", "t")  # tolerant, like ResourceNotFoundException
    wh.drop_namespace("analytics")
    with pytest.raises(TableNotFoundError):
        wh.read("analytics", "t")


def test_insert_and_read(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2)]))
    got = {(r.id, r.day, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", "d1", 1), ("b", "d2", 2)}


def test_merge_upsert_semantics(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d1", 2)]))
    # update a, insert c; within-batch dup for c -> latest v wins
    batch = _df(spark, [("a", "d1", 10), ("c", "d2", 1), ("c", "d2", 99)])
    wh.merge_upsert("ns", "t", batch, order_col="v")
    got = {(r.id, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 10), ("b", 2), ("c", 99)}


def test_merge_partition_cow(spark, wh):
    """Only touched partitions are rewritten (file-level check)."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2)]))
    v1_files = {e["path"] for e in wh._manifest(wh._table_dir("ns", "t"), 1)}
    wh.merge_upsert("ns", "t", _df(spark, [("a", "d1", 5)]))
    v2_files = {e["path"] for e in wh._manifest(wh._table_dir("ns", "t"), 2)}
    # d2's file must be carried over untouched
    d2_files = {p for p in v1_files if "_p=d2" in p}
    assert d2_files and d2_files <= v2_files
    # d1 was rewritten
    assert not any(p in v2_files for p in v1_files - d2_files)
    got = {(r.id, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 5), ("b", 2)}


def test_merge_delete(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2)]))
    batch = spark.createDataFrame(
        [("b", "d2", 0, True), ("c", "d3", 3, False)],
        schema="id string, day string, v long, _delete boolean",
    )
    wh.merge_upsert("ns", "t", batch, delete_col="_delete")
    got = {(r.id, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 1), ("c", 3)}


def test_merge_delete_is_partition_confined(spark, wh):
    """A merge whose deletes all live in one partition rewrites ONLY that
    partition: every other partition's manifest file entries carry over
    byte-identical (round 2 conservatively rewrote the whole table on any
    delete -- at 100 TB with CDC REMOVEs that is the difference between
    rewriting ~1 partition and rewriting the table)."""
    import json

    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert(
        "ns",
        "t",
        _df(spark, [("a", "d1", 1), ("b", "d2", 2), ("c", "d3", 3), ("d", "d3", 4)]),
    )
    tdir = wh._table_dir("ns", "t")
    v1 = {e["path"]: e for e in wh._manifest(tdir, 1)}
    # delete-only batch, both keys in d3
    batch = spark.createDataFrame(
        [("c", "d3", 0, True), ("d", "d3", 0, True)],
        schema="id string, day string, v long, _delete boolean",
    )
    wh.merge_upsert("ns", "t", batch, delete_col="_delete")
    v2 = {e["path"]: e for e in wh._manifest(tdir, 2)}
    for path, entry in v1.items():
        if "_p=d3" in path:
            assert path not in v2  # the touched partition was rewritten
        else:
            # untouched partitions: same file, byte-identical entry
            assert json.dumps(v2[path], sort_keys=True) == json.dumps(
                entry, sort_keys=True
            )
    got = {(r.id, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 1), ("b", 2)}


def test_merge_delete_missing_key_touches_nothing(spark, wh):
    """A delete for an absent key must not rewrite any partition."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2)]))
    tdir = wh._table_dir("ns", "t")
    v1 = {e["path"] for e in wh._manifest(tdir, 1)}
    batch = spark.createDataFrame(
        [("zzz", "d9", 0, True)],
        schema="id string, day string, v long, _delete boolean",
    )
    wh.merge_upsert("ns", "t", batch, delete_col="_delete")
    v2 = {e["path"] for e in wh._manifest(tdir, 2)}
    assert v1 == v2


def test_time_travel_and_history(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    wh.merge_upsert("ns", "t", _df(spark, [("a", "d1", 2)]))
    assert wh.read("ns", "t", version=1).collect()[0].v == 1
    assert wh.read("ns", "t", version=2).collect()[0].v == 2
    assert [h["version"] for h in wh.history("ns", "t")] == [0, 1, 2]


def test_partition_pruned_read(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2), ("c", "d2", 3)]))
    got = {r.id for r in wh.read("ns", "t", partition_filter=["d2"]).collect()}
    assert got == {"b", "c"}


def test_required_not_null_enforced(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", required=("id",))
    df = spark.createDataFrame(
        [(None, "d1", 1), ("a", "d1", 2)], schema="id string, day string, v long"
    )
    wh.insert("ns", "t", df)
    assert [r.id for r in wh.read("ns", "t").collect()] == ["a"]


def test_commit_conflict(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    tdir = wh._table_dir("ns", "t")
    with pytest.raises(CommitConflictError):
        wh._publish(tdir, 0, [])  # version 0 already exists


def _inject_concurrent(wh, before_publish):
    """Make ``wh``'s next publish lose the version race: run
    ``before_publish()`` (a competing committer) right before the first
    publish attempt, then restore the real publish."""
    real = wh._publish
    state = {"fired": False}

    def racing(tdir, version, files, **kwargs):
        if not state["fired"]:
            state["fired"] = True
            before_publish()
        return real(tdir, version, files, **kwargs)

    wh._publish = racing
    return state


def test_append_rebase_on_concurrent_commit(spark, wh):
    """Two racing appends both land: the loser rebases onto the tip
    (Iceberg fast-append retry) instead of surfacing a conflict."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    other = Warehouse(spark, wh.root)
    state = _inject_concurrent(
        wh, lambda: other.insert("ns", "t", _df(spark, [("x", "d9", 9)]))
    )
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    assert state["fired"]
    got = {(r.id, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("x", 9), ("a", 1)}  # neither append was lost


def test_rewrite_rebases_over_disjoint_partitions(spark, wh):
    """A merge racing an append into a DIFFERENT partition rebases:
    both effects present, no conflict surfaced."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2)]))
    other = Warehouse(spark, wh.root)
    _inject_concurrent(
        wh, lambda: other.insert("ns", "t", _df(spark, [("x", "d9", 9)]))
    )
    wh.merge_upsert("ns", "t", _df(spark, [("a", "d1", 10)]))
    got = {(r.id, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 10), ("b", 2), ("x", 9)}


def test_rewrite_conflict_on_same_partition_raises(spark, wh):
    """A merge racing a commit that changed ITS OWN touched partition
    must raise (retrying would silently drop the concurrent rows --
    serializable-conflict semantics)."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2)]))
    other = Warehouse(spark, wh.root)
    _inject_concurrent(
        wh, lambda: other.insert("ns", "t", _df(spark, [("a2", "d1", 7)]))
    )
    with pytest.raises(CommitConflictError):
        wh.merge_upsert("ns", "t", _df(spark, [("a", "d1", 10)]))
    # the concurrent commit's data is intact; ours was not applied
    got = {(r.id, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 1), ("b", 2), ("a2", 7)}


def test_compaction(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    for i in range(3):  # three commits -> three files in d1
        wh.insert("ns", "t", _df(spark, [(f"k{i}", "d1", i)]))
    before = wh.history("ns", "t")[-1]["n_files"]
    v = wh.compact("ns", "t")
    after = wh.history("ns", "t")[-1]["n_files"]
    assert after < before
    assert {r.id for r in wh.read("ns", "t").collect()} == {"k0", "k1", "k2"}
    assert wh.read("ns", "t", version=v - 1).count() == 3  # snapshots intact


def test_merge_partition_migration(spark, wh):
    """An update that moves a key into a different partition rewrites the
    old partition too (no stale duplicate left behind -- Iceberg MERGE
    parity for partition-migrating keys)."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2)]))
    wh.merge_upsert("ns", "t", _df(spark, [("a", "d3", 10)]))
    got = {(r.id, r.day, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", "d3", 10), ("b", "d2", 2)}


def test_merge_null_partition(spark, wh):
    """NULL partition values use one canonical sentinel: a merge updates
    the existing null-partition row in place instead of writing a second
    copy, and the null partition stays addressable by filter."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", None, 1), ("b", "d1", 2)]))
    wh.merge_upsert("ns", "t", _df(spark, [("a", None, 5)]))
    got = {(r.id, r.day, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", None, 5), ("b", "d1", 2)}
    nulls = {(r.id, r.v) for r in wh.read("ns", "t", partition_filter=[None]).collect()}
    assert nulls == {("a", 5)}


def test_resource_link_namespace(spark, wh):
    """D9 federation: a linked namespace resolves the same table -- reads
    see target data, writes through the link land in the target, and
    dropping the link never touches the target."""
    wh.create_namespace("producer")
    wh.create_table("producer", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("producer", "t", _df(spark, [("a", "d1", 1)]))
    wh.link_namespace("consumer", "producer")
    assert wh.list_tables("consumer") == ["t"]
    got = {(r.id, r.v) for r in wh.read("consumer", "t").collect()}
    assert got == {("a", 1)}
    wh.merge_upsert("consumer", "t", _df(spark, [("b", "d2", 2)]))
    got = {(r.id, r.v) for r in wh.read("producer", "t").collect()}
    assert got == {("a", 1), ("b", 2)}
    wh.drop_namespace("consumer")
    assert wh.list_tables("producer") == ["t"]


def test_add_column_schema_evolution(spark, wh):
    """Metadata-swap schema evolution: existing files read the new column
    as NULL; new writes carry it (reference update_metadata.py parity)."""
    from pyspark.sql.types import LongType, StructField

    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    pre_evolution = wh.current_version("ns", "t")
    wh.add_column("ns", "t", StructField("score", LongType()))
    got = {(r.id, r.v, r.score) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 1, None)}
    # schema binds to snapshot: time travel predates the column
    old_df = wh.read("ns", "t", version=pre_evolution)
    assert "score" not in old_df.columns
    evolved = spark.createDataFrame([("b", "d1", 2, 7)], schema=wh.schema("ns", "t"))
    wh.merge_upsert("ns", "t", evolved)
    got = {(r.id, r.v, r.score) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 1, None), ("b", 2, 7)}
    with pytest.raises(ValueError):
        wh.add_column("ns", "t", StructField("score", LongType()))


def test_rename_column_metadata_only(spark, wh):
    """RENAME COLUMN is O(1): no data files rewritten (column mapping --
    files keep the immutable physical name), values preserved, time
    travel shows the historical name, and writes after the rename use
    the new logical name."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2)]))
    tdir = wh._table_dir("ns", "t")
    files_before = {e["path"] for e in wh._manifest(tdir, 1)}
    pre = wh.current_version("ns", "t")
    wh.rename_column("ns", "t", "v", "amount")
    # metadata-only: the new snapshot references exactly the same files
    files_after = {e["path"] for e in wh._manifest(tdir, wh.current_version("ns", "t"))}
    assert files_after == files_before
    got = {(r.id, r.amount) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 1), ("b", 2)}
    # time travel: pre-rename snapshot still shows (and reads) "v"
    old = wh.read("ns", "t", version=pre)
    assert "v" in old.columns and "amount" not in old.columns
    assert {(r.id, r.v) for r in old.collect()} == {("a", 1), ("b", 2)}
    # post-rename writes merge correctly with pre-rename files
    evolved = spark.createDataFrame([("c", "d1", 3)], schema=wh.schema("ns", "t"))
    wh.merge_upsert("ns", "t", evolved)
    got = {(r.id, r.amount) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 1), ("b", 2), ("c", 3)}
    with pytest.raises(ValueError):
        wh.rename_column("ns", "t", "nope", "x")
    with pytest.raises(ValueError):
        wh.rename_column("ns", "t", "amount", "id")


def test_rename_key_and_partition_source(spark, wh):
    """Renaming the key or partition-source column keeps MERGE and
    partition pruning working (references follow the rename)."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    wh.rename_column("ns", "t", "id", "pk")
    wh.rename_column("ns", "t", "day", "bucket_day")
    assert wh.table_meta("ns", "t")["key"] == "pk"
    assert wh.table_meta("ns", "t")["partition_by"] == "bucket_day"
    evolved = spark.createDataFrame([("a", "d1", 10)], schema=wh.schema("ns", "t"))
    wh.merge_upsert("ns", "t", evolved)
    got = {(r.pk, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 10)}
    pruned = wh.read("ns", "t", partition_filter=["d1"])
    assert pruned.count() == 1


def test_drop_column_and_no_resurrection(spark, wh):
    """DROP COLUMN is metadata-only; re-adding the same name yields a
    fresh (all-NULL) column, never the dropped bytes (field-id parity)."""
    from pyspark.sql.types import LongType, StructField

    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    pre = wh.current_version("ns", "t")
    wh.drop_column("ns", "t", "v")
    assert wh.schema("ns", "t").fieldNames() == ["id", "day"]
    assert wh.read("ns", "t").columns == ["id", "day"]
    # time travel still sees the dropped column's data
    assert {(r.id, r.v) for r in wh.read("ns", "t", version=pre).collect()} == {
        ("a", 1)
    }
    # re-add same name: old bytes must NOT resurrect
    wh.add_column("ns", "t", StructField("v", LongType()))
    assert {(r.id, r.v) for r in wh.read("ns", "t").collect()} == {("a", None)}
    # protected columns
    with pytest.raises(ValueError):
        wh.drop_column("ns", "t", "id")
    with pytest.raises(ValueError):
        wh.drop_column("ns", "t", "day")


def test_compaction_keeps_partition_layout(spark, wh):
    """Compaction merges small files per partition without a global
    single-task funnel (one output file per partition value)."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    for i in range(3):
        wh.insert("ns", "t", _df(spark, [(f"a{i}", "d1", i), (f"b{i}", "d2", i)]))
    v = wh.compact("ns", "t")
    files = wh._manifest(wh._table_dir("ns", "t"), v)
    by_part = {}
    for e in files:
        by_part.setdefault(e["partition"], []).append(e)
    assert set(by_part) == {"d1", "d2"}
    assert all(len(es) == 1 for es in by_part.values())
    assert wh.read("ns", "t").count() == 6


def test_link_to_link_rejected(spark, wh):
    wh.create_namespace("prod")
    wh.link_namespace("mid", "prod")
    with pytest.raises(ValueError):
        wh.link_namespace("outer", "mid")


def test_expire_snapshots(spark, wh):
    import os

    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    wh.merge_upsert("ns", "t", _df(spark, [("a", "d1", 2)]))
    wh.merge_upsert("ns", "t", _df(spark, [("b", "d1", 3)]))
    tdir = wh._table_dir("ns", "t")
    n_files_before = sum(
        len(files) for _, _, files in os.walk(os.path.join(tdir, "data"))
    )
    res = wh.expire_snapshots("ns", "t", keep_last=1)
    assert res["expired_versions"] == [0, 1, 2]
    assert res["removed_files"] > 0
    # current read is untouched
    rows = {(r.id, r.v) for r in wh.read("ns", "t").collect()}
    assert rows == {("a", 2), ("b", 3)}
    # expired snapshots are gone, cleanly
    with pytest.raises(ValueError, match="unknown or expired"):
        wh.read("ns", "t", version=1)
    assert [h["version"] for h in wh.history("ns", "t")] == [3]
    # only live files remain on disk
    n_files_after = sum(
        len(files) for _, _, files in os.walk(os.path.join(tdir, "data"))
    )
    assert n_files_after < n_files_before
    # kept set still fully readable after another write cycle
    wh.merge_upsert("ns", "t", _df(spark, [("c", "d2", 4)]))
    assert wh.read("ns", "t").count() == 3


def test_expire_snapshots_noop_and_validation(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    with pytest.raises(ValueError):
        wh.expire_snapshots("ns", "t", keep_last=0)
    res = wh.expire_snapshots("ns", "t", keep_last=5)
    assert res == {"expired_versions": [], "removed_files": 0}
    assert wh.read("ns", "t").count() == 1


def test_delete_where_cow(spark, wh):
    """Row-level DELETE rewrites only partitions containing matches;
    the deleted-row count comes from the manifest record delta."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d1", 5), ("c", "d2", 7)]))
    before = {
        e["path"]: e["partition"]
        for e in wh._manifest(wh._table_dir("ns", "t"), wh.current_version("ns", "t"))
    }
    res = wh.delete_where("ns", "t", F.col("v") >= 5)
    assert res["deleted_rows"] == 2
    got = {(r.id, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 1)}
    # d2 had a match -> rewritten; d1 had a match -> rewritten. Delete
    # only from d2 next: d1's file must carry over by reference.
    wh.insert("ns", "t", _df(spark, [("d", "d2", 9)]))
    after_ins = {
        e["path"]
        for e in wh._manifest(wh._table_dir("ns", "t"), wh.current_version("ns", "t"))
        if e["partition"] == "d1"
    }
    res2 = wh.delete_where("ns", "t", F.col("day") == "d2")
    assert res2["deleted_rows"] == 1
    final = {
        e["path"]
        for e in wh._manifest(wh._table_dir("ns", "t"), wh.current_version("ns", "t"))
        if e["partition"] == "d1"
    }
    assert final == after_ins  # untouched partition carried by reference
    assert before  # (sanity: table had files)


def test_delete_where_no_match_is_noop(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    v = wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    res = wh.delete_where("ns", "t", F.col("v") > 100)
    assert (res["version"], res["deleted_rows"]) == (v, 0)
    assert wh.current_version("ns", "t") == v  # no empty commit published


def test_update_where_semantics(spark, wh):
    """UPDATE SET v = v*10 WHERE v >= 2; NULL predicate rows keep."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert(
        "ns", "t", _df(spark, [("a", "d1", 1), ("b", "d1", 2), ("c", "d2", None)])
    )
    res = wh.update_where("ns", "t", {"v": F.col("v") * 10}, F.col("v") >= 2)
    assert res["updated_rows"] == 1
    got = {(r.id, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {("a", 1), ("b", 20), ("c", None)}


def test_update_where_partition_migration(spark, wh):
    """An UPDATE that changes the partition value moves the row to its
    new partition (write path derives partitions from data)."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2)]))
    wh.update_where("ns", "t", {"day": F.lit("d9")}, F.col("id") == "a")
    assert [r.day for r in wh.read("ns", "t", partition_filter=["d9"]).collect()] == ["d9"]
    assert wh.read("ns", "t", partition_filter=["d1"]).count() == 0
    assert {(r.id, r.day) for r in wh.read("ns", "t").collect()} == {
        ("a", "d9"),
        ("b", "d2"),
    }


def test_update_where_unknown_column_rejected(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    with pytest.raises(ValueError, match="unknown columns"):
        wh.update_where("ns", "t", {"nope": F.lit(1)}, F.lit(True))


def test_metadata_tables_and_count(spark, wh):
    """snapshots_df/files_df/count_rows answer from manifests only."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2)]))
    wh.insert("ns", "t", _df(spark, [("c", "d2", 3)]))
    snaps = {r.version: (r.records, r.n_partitions) for r in wh.snapshots_df("ns", "t").collect()}
    assert snaps[0] == (0, 0)
    assert snaps[1] == (2, 2)
    assert snaps[2] == (3, 2)
    files = wh.files_df("ns", "t").collect()
    assert sum(r.records for r in files) == 3
    assert {r.partition for r in files} == {"d1", "d2"}
    assert wh.count_rows("ns", "t") == 3
    assert wh.count_rows("ns", "t", version=1) == 2
    assert wh.count_rows("ns", "t", partition_filter=["d2"]) == 2
    # DELETE keeps counts exact
    wh.delete_where("ns", "t", F.col("id") == "b")
    assert wh.count_rows("ns", "t") == 2


def test_hidden_partitioning_bucket(spark, wh):
    """bucket(4, id): engine-portable md5 bucketing, pruned reads, and
    MERGE copy-on-write keyed on the derived value."""
    import hashlib

    def bucket(val: str, n: int = 4) -> str:
        return str(int(hashlib.md5(val.encode()).hexdigest()[:15], 16) % n)

    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="bucket(4, id)")
    rows = [(f"k{i}", "d", i) for i in range(20)]
    wh.insert("ns", "t", _df(spark, rows))
    # every row lands in the bucket its portable hash says
    for e in wh._manifest(wh._table_dir("ns", "t"), wh.current_version("ns", "t")):
        assert e["partition"] in {"0", "1", "2", "3"}
    want = {r[0] for r in rows if bucket(r[0]) == "2"}
    got = {r.id for r in wh.read("ns", "t", partition_filter=["2"]).collect()}
    assert got == want
    # MERGE touches only the buckets of its source keys
    v_before = wh.current_version("ns", "t")
    manifest_before = {
        e["path"]
        for e in wh._manifest(wh._table_dir("ns", "t"), v_before)
        if e["partition"] != bucket("k3")
    }
    wh.merge_upsert("ns", "t", _df(spark, [("k3", "d", 999)]))
    manifest_after = {
        e["path"]
        for e in wh._manifest(wh._table_dir("ns", "t"), wh.current_version("ns", "t"))
        if e["partition"] != bucket("k3")
    }
    assert manifest_before == manifest_after
    assert {r.v for r in wh.read("ns", "t").collect() if r.id == "k3"} == {999}


def test_hidden_partitioning_days_and_truncate(spark, wh):
    """days(ts) on a timestamp column; truncate on strings and ints."""
    from pyspark.sql.types import TimestampType

    sch = StructType(
        [
            StructField("id", StringType(), False),
            StructField("ts", TimestampType()),
            StructField("v", LongType()),
        ]
    )
    wh.create_namespace("ns")
    wh.create_table("ns", "e", sch, key="id", partition_by="days(ts)")
    import datetime

    rows = [
        ("a", datetime.datetime(2024, 1, 1, 5, 0), 1),
        ("b", datetime.datetime(2024, 1, 1, 23, 59), 2),
        ("c", datetime.datetime(2024, 1, 2, 0, 0), 3),
    ]
    wh.insert("ns", "e", spark.createDataFrame(rows, sch))
    parts = {
        e["partition"]
        for e in wh._manifest(wh._table_dir("ns", "e"), wh.current_version("ns", "e"))
    }
    assert parts == {"2024-01-01", "2024-01-02"}
    assert wh.read("ns", "e", partition_filter=["2024-01-01"]).count() == 2

    wh.create_table("ns", "s", SCHEMA, key="id", partition_by="truncate(2, day)")
    wh.insert("ns", "s", _df(spark, [("a", "dayX", 1), ("b", "daYZ", 2), ("c", "xx", 3)]))
    parts = {
        e["partition"]
        for e in wh._manifest(wh._table_dir("ns", "s"), wh.current_version("ns", "s"))
    }
    assert parts == {"da", "xx"}

    wh.create_table("ns", "i", SCHEMA, key="id", partition_by="truncate(10, v)")
    wh.insert("ns", "i", _df(spark, [("a", "d", 7), ("b", "d", 15), ("c", "d", 23)]))
    parts = {
        e["partition"]
        for e in wh._manifest(wh._table_dir("ns", "i"), wh.current_version("ns", "i"))
    }
    assert parts == {"0", "10", "20"}


def test_bad_partition_spec_fails_fast(spark, wh):
    wh.create_namespace("ns")
    with pytest.raises(ValueError, match="not in schema"):
        wh.create_table("ns", "t", SCHEMA, partition_by="nope")
    with pytest.raises(ValueError, match="not in schema"):
        wh.create_table("ns", "t", SCHEMA, partition_by="bucket(4, nope)")
    assert wh.list_tables("ns") == []


def test_rollback_to_snapshot(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    wh.merge_upsert("ns", "t", _df(spark, [("a", "d1", 2), ("b", "d1", 3)]))
    # revert to the pre-merge snapshot: new commit, old file set
    new_v = wh.rollback_to("ns", "t", 1)
    assert new_v == 3
    assert {(r.id, r.v) for r in wh.read("ns", "t").collect()} == {("a", 1)}
    # history preserved: the rolled-back state is still readable
    assert {(r.id, r.v) for r in wh.read("ns", "t", version=2).collect()} == {
        ("a", 2),
        ("b", 3),
    }
    # roll-forward of the rollback works too
    wh.rollback_to("ns", "t", 2)
    assert {(r.id, r.v) for r in wh.read("ns", "t").collect()} == {("a", 2), ("b", 3)}
    # writes continue on top
    wh.merge_upsert("ns", "t", _df(spark, [("c", "d2", 4)]))
    assert wh.read("ns", "t").count() == 3


def test_rollback_validation(spark, wh):
    import pytest as _pytest

    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    with _pytest.raises(ValueError, match="not available"):
        wh.rollback_to("ns", "t", 99)


def test_data_skipping_prunes_files(spark, wh):
    """Manifest min/max stats skip files a predicate can't match, and
    the returned rows are exactly the filtered set."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    # three commits -> three files with disjoint v ranges
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d1", 5)]))
    wh.insert("ns", "t", _df(spark, [("c", "d1", 10), ("d", "d1", 15)]))
    wh.insert("ns", "t", _df(spark, [("e", "d1", 20), ("f", "d1", 25)]))
    all_files, _ = wh.plan_files("ns", "t")
    n_all = len(all_files)
    assert all(e["records"] > 0 for e in all_files)  # no empty part files
    assert all("v" in (e.get("stats") or {}) for e in all_files)
    # v > 17 can only live in files holding v in {20, 25}
    pruned, _ = wh.plan_files("ns", "t", predicates=[("v", ">", 17)])
    assert sum(e["records"] for e in pruned) == 2 and len(pruned) < n_all
    got = {(r.id, r.v) for r in wh.read("ns", "t", predicates=[("v", ">", 17)]).collect()}
    assert got == {("e", 20), ("f", 25)}
    # equality inside the middle range
    pruned, _ = wh.plan_files("ns", "t", predicates=[("v", "=", 10)])
    assert sum(e["records"] for e in pruned) == 1
    # string stats prune too
    pruned, _ = wh.plan_files("ns", "t", predicates=[("id", "<=", "b")])
    assert sum(e["records"] for e in pruned) == 2
    # unpruneable predicate keeps everything (no stats for that column)
    pruned, _ = wh.plan_files("ns", "t", predicates=[("nope", "=", 1)])
    assert len(pruned) == n_all


def test_data_skipping_conservative_on_nulls(spark, wh):
    """All-null files carry no stats and are never skipped; the row
    filter still applies."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    wh.insert(
        "ns",
        "t",
        spark.createDataFrame([("a", "d1", None), ("b", "d1", None)], schema=SCHEMA),
    )
    wh.insert("ns", "t", _df(spark, [("c", "d1", 7)]))
    all_files, _ = wh.plan_files("ns", "t")
    null_files = [e for e in all_files if "v" not in (e.get("stats") or {})]
    assert null_files, "all-null column should carry no v stats"
    pruned, _ = wh.plan_files("ns", "t", predicates=[("v", ">=", 5)])
    assert len(pruned) == len(all_files)  # null-stats files conservatively kept
    got = {r.id for r in wh.read("ns", "t", predicates=[("v", ">=", 5)]).collect()}
    assert got == {"c"}


def test_compact_sort_order_tightens_skipping(spark, wh):
    """After interleaved-range commits, a sort-clustered compaction
    restores effective data skipping."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    # interleaved ranges: every file spans nearly the whole domain
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d1", 100)]).coalesce(1))
    wh.insert("ns", "t", _df(spark, [("c", "d1", 2), ("d", "d1", 99)]).coalesce(1))
    before, _ = wh.plan_files("ns", "t", predicates=[("v", ">", 50)])
    assert len(before) == 2  # wide-range files: no skipping possible
    wh.compact("ns", "t", min_files_per_partition=2, sort_by="v")
    after_all, _ = wh.plan_files("ns", "t")
    got = {(r.id, r.v) for r in wh.read("ns", "t", predicates=[("v", ">", 50)]).collect()}
    assert got == {("b", 100), ("d", 99)}
    # compacted file carries stats; an out-of-range predicate now skips
    # the whole table at the manifest level
    assert all("v" in e["stats"] for e in after_all)
    none, _ = wh.plan_files("ns", "t", predicates=[("v", ">", 200)])
    assert none == []


def test_zorder_compaction_skips_on_both_columns(spark, wh):
    """Z-order compaction (sort_by=[x, y] + target_files) yields files
    with tight ranges on BOTH columns: a selective predicate on either
    one prunes files at the manifest level, where a lexicographic sort
    would only serve its leading column."""
    schema2 = StructType(
        [
            StructField("id", StringType(), False),
            StructField("x", LongType()),
            StructField("y", LongType()),
        ]
    )
    wh.create_namespace("ns")
    wh.create_table("ns", "t", schema2, key="id")
    # 20x20 grid inserted in two interleaved halves: every file spans
    # nearly the full range of both columns -> no skipping possible
    rows = [(f"r{x}_{y}", x * 5, y * 5) for x in range(20) for y in range(20)]
    df = spark.createDataFrame(rows, schema=schema2)
    wh.insert("ns", "t", df.filter("x % 10 = 0").coalesce(1))
    wh.insert("ns", "t", df.filter("x % 10 != 0").coalesce(1))
    for col in ("x", "y"):
        planned, _ = wh.plan_files("ns", "t", predicates=[(col, "<", 20)])
        assert len(planned) == 2  # wide-range files: nothing prunes
    wh.compact("ns", "t", min_files_per_partition=2, sort_by=["x", "y"], target_files=4)
    all_files, _ = wh.plan_files("ns", "t")
    assert len(all_files) >= 3  # range-split along the curve
    for col in ("x", "y"):
        planned, _ = wh.plan_files("ns", "t", predicates=[(col, "<", 20)])
        assert len(planned) < len(all_files), f"no skipping on {col}"
        got = {
            (r.x, r.y)
            for r in wh.read("ns", "t", predicates=[(col, "<", 20)]).collect()
        }
        expect = {(x, y) for (_i, x, y) in rows if (x if col == "x" else y) < 20}
        assert got == expect  # pruning never drops matching rows


def test_bloom_filter_point_lookup_skipping(spark, wh):
    """Key ranges overlap across files (min/max can't prune), but the
    per-file key bloom skips files for point lookups."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    # interleaved key sets -> overlapping [min,max] string ranges
    wh.insert("ns", "t", _df(spark, [("a1", "d1", 1), ("z1", "d1", 2)]).coalesce(1))
    wh.insert("ns", "t", _df(spark, [("a2", "d1", 3), ("z2", "d1", 4)]).coalesce(1))
    all_files, _ = wh.plan_files("ns", "t")
    assert len(all_files) == 2
    assert all("id" in (e.get("blooms") or {}) for e in all_files)
    # range stats alone cannot prune this lookup; the bloom can
    pruned, _ = wh.plan_files("ns", "t", predicates=[("id", "=", "z2")])
    assert len(pruned) == 1
    got = {(r.id, r.v) for r in wh.read("ns", "t", predicates=[("id", "=", "z2")]).collect()}
    assert got == {("z2", 4)}
    # absent key: bloom may false-positive but never false-negative;
    # the row filter guarantees the empty result either way
    assert wh.read("ns", "t", predicates=[("id", "=", "nope")]).count() == 0


@pytest.mark.slow
class TestShallowClone:
    """SHALLOW CLONE (Delta CLONE semantics): zero-copy snapshot
    reference, full independence afterwards."""

    def _mk(self, spark, tmp_path):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        S = StructType(
            [
                StructField("id", StringType(), False),
                StructField("day", StringType()),
                StructField("v", LongType()),
            ]
        )
        wh = Warehouse(spark, str(tmp_path))
        wh.create_namespace("n")
        wh.create_table("n", "src", S, key="id", partition_by="day")
        rows = [(f"k{i}", f"d{i % 2}", i) for i in range(10)]
        wh.insert("n", "src", spark.createDataFrame(rows, S).coalesce(2))
        return wh, S

    def test_clone_reads_and_is_zero_copy(self, spark, tmp_path):
        import os

        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        assert {r.id for r in wh.read("n", "dev").collect()} == {
            f"k{i}" for i in range(10)
        }
        # zero data files under the clone's own dir
        ddir = os.path.join(wh._table_dir("n", "dev"), "data")
        n_files = sum(
            len(fs) for _, _, fs in os.walk(ddir)
        ) if os.path.isdir(ddir) else 0
        assert n_files == 0
        meta = wh.table_meta("n", "dev")
        assert meta["key"] == "id" and meta["partition_by"] == "day"
        assert meta["properties"]["clone_source"].startswith("n.src@")

    def test_clone_dml_isolated_from_source(self, spark, tmp_path):
        import pyspark.sql.functions as F

        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        wh.delete_where("n", "dev", F.expr("v >= 5"))
        wh.insert(
            "n", "dev",
            spark.createDataFrame([("zz", "d0", 99)], S),
        )
        assert wh.read("n", "src").count() == 10  # source untouched
        got = {r.id: r.v for r in wh.read("n", "dev").collect()}
        assert got["zz"] == 99 and len(got) == 6
        # new clone data landed in the clone's OWN dir (no ../ writes)
        import os

        ddir = os.path.join(wh._table_dir("n", "dev"), "data")
        assert any(f.endswith(".parquet") for _, _, fs in os.walk(ddir) for f in fs)
        # source DML doesn't reach the clone either
        wh.truncate("n", "src")
        assert wh.read("n", "dev").count() == 6

    def test_time_travel_clone_and_mor_deletes_carry(self, spark, tmp_path):
        import pyspark.sql.functions as F

        wh, S = self._mk(spark, tmp_path)
        v1 = wh.current_version("n", "src")
        wh.delete_where("n", "src", F.expr("v = 0"), strategy="mor")
        wh.insert("n", "src", spark.createDataFrame([("new", "d0", 50)], S))
        # historical clone: pre-MoR-delete snapshot
        wh.clone_table("n", "src", "n", "past", version=v1)
        assert wh.read("n", "past").count() == 10
        # tip clone: MoR delete files carry by reference
        wh.clone_table("n", "src", "n", "tip")
        got = {r.id for r in wh.read("n", "tip").collect()}
        assert "k0" not in got and "new" in got and len(got) == 10

    def test_clone_orphan_removal_cannot_touch_source(self, spark, tmp_path):
        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        wh.remove_orphan_files("n", "dev", older_than_seconds=0)
        assert wh.read("n", "dev").count() == 10
        assert wh.read("n", "src").count() == 10

    def test_clone_refuses_clobber(self, spark, tmp_path):
        import pytest as _pytest

        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        with _pytest.raises(FileExistsError):
            wh.clone_table("n", "src", "n", "dev")

    def test_sql_shallow_clone_route(self, spark, tmp_path):
        from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import WarehouseSQL

        wh, S = self._mk(spark, tmp_path)
        sql = WarehouseSQL(wh)
        v1 = wh.current_version("n", "src")
        sql.execute("DELETE FROM n.src WHERE v >= 8")
        sql.execute("CREATE TABLE n.dev SHALLOW CLONE n.src")
        assert sql.execute(
            "SELECT COUNT(*) AS c FROM n.dev"
        ).collect()[0].c == 8
        sql.execute(
            f"CREATE TABLE n.past SHALLOW CLONE n.src VERSION AS OF {v1}"
        )
        assert sql.execute(
            "SELECT COUNT(*) AS c FROM n.past"
        ).collect()[0].c == 10


class TestInsertOverwrite:
    """INSERT OVERWRITE: dynamic partition overwrite (Spark
    partitionOverwriteMode=dynamic) and Delta replaceWhere, each one
    atomic commit."""

    def _mk(self, spark, tmp_path):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        S = StructType(
            [
                StructField("id", StringType(), False),
                StructField("day", StringType()),
                StructField("v", LongType()),
            ]
        )
        wh = Warehouse(spark, str(tmp_path))
        wh.create_namespace("n")
        wh.create_table("n", "t", S, key="id", partition_by="day")
        rows = [(f"k{i}", f"d{i % 3}", i) for i in range(12)]
        wh.insert("n", "t", spark.createDataFrame(rows, S).coalesce(2))
        return wh, S

    def test_dynamic_overwrite_replaces_only_incoming_partitions(
        self, spark, tmp_path
    ):
        wh, S = self._mk(spark, tmp_path)
        batch = [("x1", "d0", 100), ("x2", "d0", 101), ("x3", "d2", 102)]
        res = wh.insert_overwrite(
            "n", "t", spark.createDataFrame(batch, S)
        )
        assert res["mode"] == "dynamic"
        assert res["replaced_partitions"] == ["d0", "d2"]
        got = {(r.id, r.day) for r in wh.read("n", "t").collect()}
        # d1 rows survive untouched; d0/d2 fully replaced
        assert {d for _, d in got} == {"d0", "d1", "d2"}
        assert {i for i, d in got if d == "d0"} == {"x1", "x2"}
        assert {i for i, d in got if d == "d2"} == {"x3"}
        assert {i for i, d in got if d == "d1"} == {"k1", "k4", "k7", "k10"}
        # re-running the same load is idempotent (the daily-reload shape)
        wh.insert_overwrite("n", "t", spark.createDataFrame(batch, S))
        assert wh.read("n", "t").count() == 3 + 4
        # pre-overwrite snapshot still time-travels
        assert len(wh.read("n", "t", version=1).collect()) == 12

    def test_static_overwrite_and_unpartitioned_fallback(
        self, spark, tmp_path
    ):
        wh, S = self._mk(spark, tmp_path)
        res = wh.insert_overwrite(
            "n", "t",
            spark.createDataFrame([("z", "d9", 1)], S),
            dynamic=False,
        )
        assert res["mode"] == "static"
        assert [r.id for r in wh.read("n", "t").collect()] == ["z"]

    def test_replace_where(self, spark, tmp_path):
        import pyspark.sql.functions as F

        wh, S = self._mk(spark, tmp_path)
        batch = spark.createDataFrame(
            [("r1", "d0", 1000), ("r2", "d0", 1001)], S
        )
        res = wh.insert_overwrite(
            "n", "t", batch, replace_where="day = 'd0'"
        )
        assert res["replaced_files"] >= 1
        got = {r.id for r in wh.read("n", "t").collect()}
        assert {"r1", "r2"} <= got
        assert not any(
            r.day == "d0" and r.id.startswith("k")
            for r in wh.read("n", "t").collect()
        )
        assert wh.read("n", "t").count() == 2 + 8  # d1+d2 intact
        # Delta contract: batch rows outside the predicate raise
        import pytest as _pytest

        with _pytest.raises(ValueError, match="replaceWhere violation"):
            wh.insert_overwrite(
                "n", "t",
                spark.createDataFrame([("bad", "d1", 1)], S),
                replace_where="day = 'd0'",
            )

    def test_replace_where_row_granular(self, spark, tmp_path):
        """A predicate narrower than a partition rewrites surviving
        rows into new files instead of dropping the whole partition."""
        wh, S = self._mk(spark, tmp_path)
        batch = spark.createDataFrame([("big", "d0", 500)], S)
        wh.insert_overwrite(
            "n", "t", batch, replace_where="day = 'd0' AND v >= 500"
        )
        got = {r.id for r in wh.read("n", "t").filter("day = 'd0'").collect()}
        # original d0 rows (v in 0,3,6,9 < 500) all survive + the new row
        assert got == {"k0", "k3", "k6", "k9", "big"}

    def test_identity_table_refuses(self, spark, tmp_path):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )
        import pytest as _pytest

        S2 = StructType(
            [
                StructField("rid", LongType()),
                StructField("id", StringType(), False),
            ]
        )
        wh = Warehouse(spark, str(tmp_path))
        wh.create_namespace("n")
        wh.create_table("n", "ident", S2)
        wh.set_column_identity("n", "ident", "rid", start=1, step=1)
        with _pytest.raises(ValueError, match="identity"):
            wh.insert_overwrite(
                "n", "ident",
                spark.createDataFrame([("a",)], "id string"),
            )

    def test_sql_replace_where_route(self, spark, tmp_path):
        from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import WarehouseSQL

        wh, S = self._mk(spark, tmp_path)
        sql = WarehouseSQL(wh)
        sql.execute(
            "INSERT INTO n.t REPLACE WHERE day = 'd1' "
            "VALUES ('n1', 'd1', 7), ('n2', 'd1', 8)"
        )
        got = {r.id for r in wh.read("n", "t").filter("day = 'd1'").collect()}
        assert got == {"n1", "n2"}
        assert wh.read("n", "t").count() == 2 + 8
        import pytest as _pytest

        with _pytest.raises(ValueError, match="REPLACE WHERE"):
            sql.execute(
                "INSERT OVERWRITE n.t REPLACE WHERE day = 'd1' "
                "VALUES ('x', 'd1', 1)"
            )


class TestCloneAwareMaintenance:
    """Shallow-clone back-refs (round 8): source maintenance must never
    delete files a registered clone still reads (closes Delta's
    documented VACUUM footgun — VERDICT r7), and rename/drop of either
    side stays safe."""

    def _mk(self, spark, tmp_path):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        S = StructType(
            [
                StructField("id", StringType(), False),
                StructField("day", StringType()),
                StructField("v", LongType()),
            ]
        )
        wh = Warehouse(spark, str(tmp_path))
        wh.create_namespace("n")
        wh.create_namespace("m")
        wh.create_table("n", "src", S, key="id", partition_by="day")
        rows = [(f"k{i}", f"d{i % 2}", i) for i in range(10)]
        wh.insert("n", "src", spark.createDataFrame(rows, S).coalesce(2))
        return wh, S

    def test_source_maintenance_keeps_clone_alive(self, spark, tmp_path):
        """truncate + expire + orphan-clean the SOURCE: the clone still
        reads every row it could before (this corrupted the clone
        before round 8)."""
        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        wh.truncate("n", "src")  # source drops all file refs
        wh.expire_snapshots("n", "src", keep_last=1)
        wh.remove_orphan_files("n", "src", older_than_seconds=0)
        assert wh.read("n", "dev").count() == 10
        assert wh.read("n", "src").count() == 0

    def test_source_maintenance_bundle_keeps_clone_alive(self, spark, tmp_path):
        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "m", "dev")
        wh.delete_where("n", "src", F.expr("v < 8"))  # CoW rewrite
        wh.auto_maintain(
            "n", "src", keep_last=1, orphan_horizon_seconds=0.0
        )
        assert wh.read("m", "dev").count() == 10

    def test_dropped_clone_backref_prunes_lazily(self, spark, tmp_path):
        """Dropping the clone releases the pin: the next source
        maintenance reclaims the now-unreferenced files."""
        import os

        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        wh.truncate("n", "src")
        wh.drop_table("n", "dev")
        wh.expire_snapshots("n", "src", keep_last=1)
        got = wh.remove_orphan_files("n", "src", older_than_seconds=0)
        ddir = os.path.join(wh._table_dir("n", "src"), "data")
        left = [
            f for _, _, fs in os.walk(ddir) for f in fs
            if f.endswith(".parquet")
        ]
        assert left == [] and got["removed_files"] + 0 >= 0
        assert wh._registered_clones(wh._table_dir("n", "src")) == []

    def test_rename_of_clone_source_refused(self, spark, tmp_path):
        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        with pytest.raises(ValueError, match="shallow clone"):
            wh.rename_table("n", "src", "m", "src2")
        wh.drop_table("n", "dev")
        wh.rename_table("n", "src", "m", "src2")  # clone gone: fine
        assert wh.read("m", "src2").count() == 10

    def test_drop_of_clone_source_refused(self, spark, tmp_path):
        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        with pytest.raises(ValueError, match="shallow clone"):
            wh.drop_table("n", "src")
        wh.drop_table("n", "dev")
        wh.drop_table("n", "src")

    def test_rename_clone_rewrites_relative_refs(self, spark, tmp_path):
        """Moving a clone across namespaces rewrites its ..-relative
        manifest entries; reads and time travel keep working and the
        source's back-ref follows the move."""
        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        wh.insert(
            "n", "dev", spark.createDataFrame([("zz", "d0", 99)], S)
        )
        v_clone = wh.current_version("n", "dev")
        wh.rename_table("n", "dev", "m", "dev2")
        assert wh.read("m", "dev2").count() == 11
        assert wh.read("m", "dev2", version=v_clone).count() == 11
        # the moved clone still pins the source: maintenance is safe
        wh.truncate("n", "src")
        wh.expire_snapshots("n", "src", keep_last=1)
        wh.remove_orphan_files("n", "src", older_than_seconds=0)
        assert wh.read("m", "dev2").count() == 11

    def test_clone_of_clone_pins_ultimate_source(self, spark, tmp_path):
        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "c1")
        wh.clone_table("n", "c1", "m", "c2")
        wh.truncate("n", "src")
        wh.expire_snapshots("n", "src", keep_last=1)
        wh.remove_orphan_files("n", "src", older_than_seconds=0)
        assert wh.read("n", "c1").count() == 10
        assert wh.read("m", "c2").count() == 10


class TestCloneExpireSafety:
    def test_expire_on_clone_never_deletes_source_files(self, spark, tmp_path):
        """The REVERSE vacuum footgun (round 8): a clone whose own DML
        stops referencing some borrowed ../src files, then
        expire_snapshots(keep_last=1) on the CLONE -- borrowed files
        are never the clone's to delete; the source stays fully
        readable at every version."""
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        S = StructType(
            [
                StructField("id", StringType(), False),
                StructField("day", StringType()),
                StructField("v", LongType()),
            ]
        )
        wh = Warehouse(spark, str(tmp_path))
        wh.create_namespace("n")
        wh.create_table("n", "src", S, key="id", partition_by="day")
        rows = [(f"k{i}", f"d{i % 2}", i) for i in range(10)]
        wh.insert("n", "src", spark.createDataFrame(rows, S).coalesce(2))
        v_src = wh.current_version("n", "src")
        wh.clone_table("n", "src", "n", "dev")
        # CoW delete on the clone rewrites the touched partition into
        # the clone's OWN dir; the borrowed d1 files leave its tip
        wh.delete_where("n", "dev", F.expr("day = 'd1'"))
        wh.insert("n", "dev", spark.createDataFrame([("zz", "d0", 99)], S))
        wh.expire_snapshots("n", "dev", keep_last=1)
        wh.remove_orphan_files("n", "dev", older_than_seconds=0)
        # source intact: current read AND time travel
        assert wh.read("n", "src").count() == 10
        assert wh.read("n", "src", version=v_src).count() == 10
        got = {r.id for r in wh.read("n", "dev").collect()}
        assert "zz" in got and not any(
            r.day == "d1" for r in wh.read("n", "dev").collect()
        )


class TestCloneBackrefHygiene:
    def test_new_table_at_dropped_clone_path_does_not_wedge_source(
        self, spark, tmp_path
    ):
        """A dropped clone's back-ref must not resurrect when an
        unrelated table is created at the same path -- drop/rename of
        the source would otherwise be wedged forever (code-review r8
        finding)."""
        from pyspark.sql.types import StringType, StructField, StructType

        S = StructType([StructField("id", StringType(), False)])
        wh = Warehouse(spark, str(tmp_path))
        wh.create_namespace("n")
        wh.create_table("n", "src", S, key="id")
        wh.insert("n", "src", spark.createDataFrame([("a",), ("b",)], S))
        wh.clone_table("n", "src", "n", "dev")
        wh.drop_table("n", "dev")
        # unrelated table reuses the old clone path
        wh.create_table("n", "dev", S, key="id")
        wh.insert("n", "dev", spark.createDataFrame([("x",)], S))
        # the source is free: no phantom clone blocks drop/rename
        wh.rename_table("n", "src", "n", "src2")
        assert wh.read("n", "src2").count() == 2
        wh.drop_table("n", "src2")
        assert wh.read("n", "dev").count() == 1


@pytest.mark.slow
class TestCloneMaintenanceCost:
    """VERDICT r8 'what's wrong' #2 + ADVICE r9 #2/#4: clone-aware
    maintenance must be O(changed) on clone manifests, back-refs must
    exist before the clone's first manifest publishes, and a clone
    rename's manifest rebase must stage-then-swap."""

    def _mk(self, spark, tmp_path):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        S = StructType(
            [
                StructField("id", StringType(), False),
                StructField("day", StringType()),
                StructField("v", LongType()),
            ]
        )
        wh = Warehouse(spark, str(tmp_path))
        wh.create_namespace("n")
        wh.create_table("n", "src", S, key="id", partition_by="day")
        rows = [(f"k{i}", f"d{i % 2}", i) for i in range(8)]
        wh.insert("n", "src", spark.createDataFrame(rows, S).coalesce(2))
        return wh, S

    def test_maintenance_serves_clone_refs_from_cache(
        self, spark, tmp_path, monkeypatch
    ):
        """Repeated source maintenance against an UNCHANGED clone must
        not re-parse the clone's manifest chain: after one warm-up,
        expire+orphan do ZERO _all_entry_paths walks; a clone commit
        invalidates the fingerprint and costs exactly one recompute."""
        import sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse as whmod

        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        for i in range(5):  # long-ish clone history
            wh.insert(
                "n",
                "dev",
                spark.createDataFrame([(f"c{i}", "d0", 100 + i)], S).coalesce(1),
            )
        wh.expire_snapshots("n", "src", keep_last=1)  # warms _refs.idx

        calls = {"n": 0}
        orig = whmod.Warehouse._all_entry_paths

        def counting(self, tdir):
            calls["n"] += 1
            return orig(self, tdir)

        monkeypatch.setattr(whmod.Warehouse, "_all_entry_paths", counting)
        wh.expire_snapshots("n", "src", keep_last=1)
        wh.remove_orphan_files("n", "src", older_than_seconds=0)
        assert calls["n"] == 0, (
            f"unchanged clone re-walked {calls['n']} manifest chains"
        )
        # a clone commit invalidates exactly once
        wh.insert(
            "n", "dev", spark.createDataFrame([("zz", "d0", 999)], S).coalesce(1)
        )
        wh.expire_snapshots("n", "src", keep_last=1)
        wh.remove_orphan_files("n", "src", older_than_seconds=0)
        assert calls["n"] == 1, f"expected 1 recompute, saw {calls['n']}"
        # and the pin still holds: the clone reads all 14 rows
        assert wh.read("n", "dev").count() == 14

    def test_backref_registered_before_clone_publish(
        self, spark, tmp_path, monkeypatch
    ):
        """Crash between back-ref registration and the clone's first
        manifest commit must leave the SOURCE protected-or-clean, never
        a live clone without a back-ref (ADVICE r9 #2). Simulated by
        failing _publish: the premature back-ref must already exist at
        that point, and prune lazily afterwards."""
        import sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse as whmod

        wh, S = self._mk(spark, tmp_path)
        src_dir = wh._table_dir("n", "src")
        seen = {}
        orig = whmod.Warehouse._publish

        def failing(self, tdir, version, files, **kw):
            if kw.get("op") == "clone":
                seen["refs_at_publish"] = wh._clones_path(src_dir)
                import os as _os

                seen["registered"] = _os.path.exists(
                    wh._clones_path(src_dir)
                )
                raise RuntimeError("crash before clone manifest commit")
            return orig(self, tdir, version, files, **kw)

        monkeypatch.setattr(whmod.Warehouse, "_publish", failing)
        with pytest.raises(RuntimeError, match="crash before"):
            wh.clone_table("n", "src", "n", "dev")
        monkeypatch.undo()
        assert seen["registered"], "back-ref missing at publish time"
        # the failed create cleaned up its half-clone dir itself, so
        # the premature back-ref prunes lazily and nothing is wedged
        import os as _os

        assert not _os.path.exists(
            _os.path.join(_os.path.dirname(src_dir), "dev")
        ), "failed clone left its half-created dir behind"
        assert wh._registered_clones(src_dir) == []
        wh.rename_table("n", "src", "n", "src2")  # not wedged
        assert wh.read("n", "src2").count() == 8

    def test_halfway_created_clone_backref_not_pruned(self, spark, tmp_path):
        """While a clone dir carries the _clone_pending marker (the
        in-flight creation window, or a hard mid-clone crash), its
        back-ref must survive a concurrent _registered_clones prune
        pass -- but pin no files. Without the marker, an empty dir at
        the path prunes as before."""
        import json
        import os

        wh, S = self._mk(spark, tmp_path)
        src_dir = wh._table_dir("n", "src")
        dev_dir = os.path.join(os.path.dirname(src_dir), "dev")
        os.makedirs(os.path.join(dev_dir, "_v"))
        with open(os.path.join(dev_dir, "_clone_pending"), "w"):
            pass
        with open(os.path.join(src_dir, "_table.json")) as f:
            schema_doc = json.load(f)
        with open(os.path.join(dev_dir, "_table.json"), "w") as f:
            json.dump(schema_doc, f)
        wh._register_clone(src_dir, dev_dir)
        assert wh._registered_clones(src_dir) == [
            os.path.abspath(dev_dir)
        ], "in-flight clone back-ref was pruned"
        # but it pins nothing (no published entries)
        assert wh._clone_referenced_files(src_dir) == set()
        # without the marker (no in-flight create), the same dir prunes
        os.remove(os.path.join(dev_dir, "_clone_pending"))
        assert wh._registered_clones(src_dir) == []

    def test_rebase_stages_all_manifests_before_swapping(
        self, spark, tmp_path, monkeypatch
    ):
        """A crash mid-rebase (rename of a clone) must leave every live
        manifest either fully old-relative or fully rewritten -- never
        a half-written file (ADVICE r9 #4). Failing the LAST staged
        write must leave all manifests still resolving from the OLD
        rebase base (pure-stage failure = no swap happened)."""
        import sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse as whmod

        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        for i in range(3):
            wh.insert(
                "n",
                "dev",
                spark.createDataFrame([(f"c{i}", "d0", i)], S).coalesce(1),
            )
        # fail inside the stage loop: os.replace of staged temps only
        # happens in the swap pass, so NO manifest may change
        import os as _os

        dev_dir = wh._table_dir("n", "dev")
        mdir = _os.path.join(dev_dir, "_v")
        before = {
            fn: open(_os.path.join(mdir, fn)).read()
            for fn in _os.listdir(mdir)
            if fn.endswith(".json")
        }
        calls = {"n": 0}
        orig_dump = whmod.json.dump

        def failing_dump(obj, fh, **kw):
            if isinstance(obj, dict) and "files" in obj:
                calls["n"] += 1
                if calls["n"] >= 2:
                    raise OSError("disk full mid-stage")
            return orig_dump(obj, fh, **kw)

        monkeypatch.setattr(whmod.json, "dump", failing_dump)
        with pytest.raises(OSError, match="disk full"):
            wh.rename_table("n", "dev", "n", "dev2")
        monkeypatch.undo()
        mdir2 = _os.path.join(wh._table_dir("n", "dev2"), "_v")
        after = {
            fn: open(_os.path.join(mdir2, fn)).read()
            for fn in _os.listdir(mdir2)
            if fn.endswith(".json")
        }
        assert before == after, "manifests mutated during failed stage pass"
        # recovery: re-running the rebase from the new location heals
        wh._rebase_relative_entries(dev_dir, wh._table_dir("n", "dev2"))
        assert wh.read("n", "dev2").count() == 11

    def test_rebase_mid_swap_leaves_marker_and_rerun_heals(
        self, spark, tmp_path, monkeypatch
    ):
        """A crash DURING the swap pass (ADVICE r10 #3) leaves the
        _rebase_pending marker in place and drops un-swapped temps; a
        re-run completes the rebase and removes the marker."""
        import os as _os

        import sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse as whmod

        wh, S = self._mk(spark, tmp_path)
        wh.clone_table("n", "src", "n", "dev")
        for i in range(3):
            wh.insert(
                "n",
                "dev",
                spark.createDataFrame([(f"c{i}", "d0", i)], S).coalesce(1),
            )
        calls = {"n": 0}
        orig_replace = _os.replace

        def failing_replace(a, b):
            # fail the SECOND manifest swap (first one lands)
            if "_v" in b and b.endswith(".json"):
                calls["n"] += 1
                if calls["n"] >= 2:
                    raise OSError("disk full mid-swap")
            return orig_replace(a, b)

        monkeypatch.setattr(whmod.os, "replace", failing_replace)
        with pytest.raises(OSError, match="disk full"):
            wh.rename_table("n", "dev", "n", "dev2")
        monkeypatch.undo()
        dev2_dir = wh._table_dir("n", "dev2")
        marker = _os.path.join(dev2_dir, "_rebase_pending")
        assert _os.path.exists(marker), "crashed swap must leave the marker"
        # no staged temps leak
        mdirs = [_os.path.join(dev2_dir, "_v")]
        assert not [
            fn
            for d in mdirs
            for fn in _os.listdir(d)
            if ".tmp-" in fn
        ], "un-swapped temps leaked"
        # re-run heals the mixed old/new-relative manifest set
        wh._rebase_relative_entries(
            wh._table_dir("n", "dev"), dev2_dir
        )
        assert not _os.path.exists(marker)
        assert wh.read("n", "dev2").count() == 11

    def test_clone_survives_marker_removal_failure(
        self, spark, tmp_path, monkeypatch
    ):
        """An OSError removing _clone_pending AFTER a successful publish
        must not delete the published clone (ADVICE r10 #4)."""
        import os as _os

        import sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse as whmod

        wh, S = self._mk(spark, tmp_path)
        orig_remove = _os.remove

        def failing_remove(p):
            if p.endswith("_clone_pending"):
                raise OSError("flaky fs")
            return orig_remove(p)

        monkeypatch.setattr(whmod.os, "remove", failing_remove)
        wh.clone_table("n", "src", "n", "dev")  # must NOT raise
        monkeypatch.undo()
        assert wh.read("n", "dev").count() == 8
        # marker stays (pins source maintenance -- the safe direction)
        assert _os.path.exists(
            _os.path.join(wh._table_dir("n", "dev"), "_clone_pending")
        )
