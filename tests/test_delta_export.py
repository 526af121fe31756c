"""Delta-protocol log export: replaying the JSON commit sequence must
reconstruct exactly the native manifest's live state at every point of
a realistic insert -> merge -> delete -> compact history."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sample_for_transactional_datalake_using_s3tables_spark.sources.delta_export import (
    export_delta_log,
    replay_delta_log,
)
from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import Warehouse

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


def _history(spark, wh, partitioned=True):
    wh.create_namespace("ns")
    wh.create_table(
        "ns", "t", SCHEMA, key="id",
        partition_by="day" if partitioned else None,
    )
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1), ("b", "d2", 2)]))
    wh.insert("ns", "t", _df(spark, [("c", "d1", 3)]))
    wh.merge_upsert("ns", "t", _df(spark, [("a", "d1", 10), ("d", "d3", 4)]))
    wh.delete_where("ns", "t", F.col("id") == "b")
    wh.compact("ns", "t", min_files_per_partition=2)


def test_replay_matches_manifest_tip(spark, wh):
    _history(spark, wh)
    log_dir = export_delta_log(wh, "ns", "t")
    state = replay_delta_log(log_dir)
    tdir = wh._table_dir("ns", "t")
    versions = wh._versions(tdir)
    assert state["n_commits"] == len(versions)
    tip = {e["path"]: e for e in wh._manifest(tdir, versions[-1])}
    assert state["files"].keys() == tip.keys()
    for p, add in state["files"].items():
        assert add["size"] == tip[p]["bytes"]
        assert json.loads(add["stats"])["numRecords"] == tip[p]["records"]
        assert add["partitionValues"] == {"_p": tip[p]["partition"]}
        assert os.path.exists(os.path.join(tdir, p))
    # protocol + metaData present and well-formed
    assert state["protocol"]["minReaderVersion"] == 1
    schema = StructType.fromJson(json.loads(state["metaData"]["schemaString"]))
    assert schema.fieldNames() == ["id", "day", "v", "_p"]
    assert state["metaData"]["partitionColumns"] == ["_p"]


def test_replay_row_totals_every_commit(spark, wh):
    """Delta numRecords totals must track the native snapshot row counts
    commit by commit (replaying prefixes of the log == time travel)."""
    _history(spark, wh)
    log_dir = export_delta_log(wh, "ns", "t")
    tdir = wh._table_dir("ns", "t")
    versions = wh._versions(tdir)
    commits = sorted(f for f in os.listdir(log_dir) if f.endswith(".json"))
    import shutil

    with tempfile.TemporaryDirectory() as d:
        for i, c in enumerate(commits):
            shutil.copy(os.path.join(log_dir, c), os.path.join(d, c))
            state = replay_delta_log(d)
            n = sum(
                json.loads(a["stats"])["numRecords"]
                for a in state["files"].values()
            )
            native = sum(
                e.get("records", 0)
                for e in wh._manifest(tdir, versions[i])
            )
            assert n == native, f"commit {i}"


def test_unpartitioned_export(spark, wh):
    _history(spark, wh, partitioned=False)
    state = replay_delta_log(export_delta_log(wh, "ns", "t"))
    assert state["metaData"]["partitionColumns"] == []
    schema = StructType.fromJson(json.loads(state["metaData"]["schemaString"]))
    assert schema.fieldNames() == ["id", "day", "v"]
    for add in state["files"].values():
        assert add["partitionValues"] == {}


def test_column_mapping_refused(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    wh.insert("ns", "t", _df(spark, [("a", "d1", 1)]))
    wh.rename_column("ns", "t", "v", "val")
    with pytest.raises(NotImplementedError):
        export_delta_log(wh, "ns", "t")


def test_import_roundtrip(spark, wh):
    """export table A -> import into a fresh warehouse -> identical
    content, working key-bloom/min-max skipping on the imported table."""
    from sample_for_transactional_datalake_using_s3tables_spark.sources.delta_export import (
        import_delta_table,
    )

    _history(spark, wh)
    export_delta_log(wh, "ns", "t")
    src_dir = wh._table_dir("ns", "t")
    with tempfile.TemporaryDirectory() as d2:
        wh2 = Warehouse(spark, d2)
        n = import_delta_table(wh2, "imp", "t", src_dir, key="id")
        assert n >= 1
        a = {(r.id, r.day, r.v) for r in wh.read("ns", "t").collect()}
        b = {(r.id, r.day, r.v) for r in wh2.read("imp", "t").collect()}
        assert a == b
        # footer stats + key blooms were rebuilt at import: a point
        # predicate on the key prunes (or at least plans) via manifests
        all_f, _ = wh2.plan_files("imp", "t")
        some_key = next(iter(a))[0]
        pf, _ = wh2.plan_files("imp", "t", predicates=[("id", "=", some_key)])
        assert 0 < len(pf) <= len(all_f)
        assert all(e.get("stats") for e in all_f)
        # metadata-only count matches
        assert wh2.count_rows("imp", "t") == len(b)


def test_import_foreign_partition_refused(spark, wh):
    from sample_for_transactional_datalake_using_s3tables_spark.sources.delta_export import (
        import_delta_table,
    )

    _history(spark, wh, partitioned=False)
    log_dir = export_delta_log(wh, "ns", "t")
    # forge a foreign-partitioned metaData
    import glob

    first = sorted(glob.glob(os.path.join(log_dir, "*.json")))[0]
    lines = open(first).read().splitlines()
    doc = [json.loads(l) for l in lines if l.strip()]
    for a in doc:
        if "metaData" in a:
            a["metaData"]["partitionColumns"] = ["day"]
    with open(first, "w") as f:
        f.write("\n".join(json.dumps(a) for a in doc) + "\n")
    src_dir = wh._table_dir("ns", "t")
    with tempfile.TemporaryDirectory() as d2:
        wh2 = Warehouse(spark, d2)
        with pytest.raises(NotImplementedError):
            import_delta_table(wh2, "imp", "t", src_dir)
