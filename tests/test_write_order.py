"""Table write order (Iceberg WRITE ORDERED BY + write.distribution-
mode=range): range-distributed writes give files DISJOINT ranges on the
order columns from the FIRST insert, so manifest min/max pruning works
without compaction; plus schema-evolution bookkeeping and MoR reads
across a key rename (delete files pin physical names).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
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


def _df(spark, rows, parts=4):
    return spark.createDataFrame(rows, schema=SCHEMA).repartition(parts)


ROWS = [(f"k{i}", "d0", i % 100) for i in range(400)]


def test_range_write_order_prunes_from_first_insert(spark, wh):
    """Same data, two tables: the range-ordered one prunes a selective
    v-predicate from the manifest alone; the unordered one (random rows
    in every task) cannot."""
    wh.create_namespace("ns")
    wh.create_table("ns", "plain", SCHEMA, key="id")
    wh.create_table(
        "ns", "ordered", SCHEMA, key="id",
        write_order=["v"], write_distribution="range",
    )
    wh.insert("ns", "plain", _df(spark, ROWS))
    wh.insert("ns", "ordered", _df(spark, ROWS))
    pred = [("v", "=", 7)]
    plain_files, _ = wh.plan_files("ns", "plain", predicates=pred)
    ordered_files, _ = wh.plan_files("ns", "ordered", predicates=pred)
    total = len(wh.plan_files("ns", "ordered")[0])
    assert total > 1
    assert len(ordered_files) < total
    assert len(ordered_files) < len(plain_files)
    # correctness unaffected
    got = {r.id for r in wh.read("ns", "ordered", predicates=pred).collect()}
    assert got == {f"k{i}" for i in range(400) if i % 100 == 7}


def test_task_local_write_order_tightens_stats(spark, wh):
    """Even without range distribution, files are internally sorted:
    every file's (min, max) on the order column is a contiguous run of
    its own rows (spot-check: stats present and min <= max)."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", write_order=["v"])
    wh.insert("ns", "t", _df(spark, ROWS))
    entries, _ = wh.plan_files("ns", "t")
    assert all("v" in (e.get("stats") or {}) for e in entries)
    got = {(r.id, r.v) for r in wh.read("ns", "t").collect()}
    assert got == {(i0, v0) for i0, _d, v0 in ROWS}


def test_write_order_survives_merge_and_compact_default(spark, wh):
    """CoW MERGE rewrites honor the write order, and compact() defaults
    its sort to the table's declared order."""
    wh.create_namespace("ns")
    wh.create_table(
        "ns", "t", SCHEMA, key="id",
        write_order=["v"], write_distribution="range",
    )
    wh.insert("ns", "t", _df(spark, ROWS))
    batch = spark.createDataFrame([("k7", "d0", 7)], schema=SCHEMA)
    wh.merge_upsert("ns", "t", batch)
    wh.compact("ns", "t", min_files_per_partition=1, target_files=4)
    entries, _ = wh.plan_files("ns", "t", predicates=[("v", "=", 7)])
    assert len(entries) < len(wh.plan_files("ns", "t")[0])
    got = {r.id for r in wh.read("ns", "t", predicates=[("v", "=", 7)]).collect()}
    assert got == {f"k{i}" for i in range(400) if i % 100 == 7}


def test_set_write_order_alter_and_validation(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id")
    with pytest.raises(ValueError, match="not in schema"):
        wh.set_write_order("ns", "t", ["nope"])
    with pytest.raises(ValueError, match="write_distribution"):
        wh.set_write_order("ns", "t", ["v"], write_distribution="hash")
    wh.set_write_order("ns", "t", ["v"], write_distribution="range")
    assert wh.table_meta("ns", "t")["write_order"] == ["v"]
    wh.set_write_order("ns", "t", None)
    assert "write_order" not in wh.table_meta("ns", "t")


def test_write_order_follows_rename_and_drop(spark, wh):
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", write_order=["v", "day"])
    wh.rename_column("ns", "t", "v", "val")
    assert wh.table_meta("ns", "t")["write_order"] == ["val", "day"]
    wh.drop_column("ns", "t", "day")
    assert wh.table_meta("ns", "t")["write_order"] == ["val"]
    # writes still work after the evolution
    df = spark.createDataFrame([("a", 1)], "id string, val long")
    wh.insert("ns", "t", df)
    assert [r.val for r in wh.read("ns", "t").collect()] == [1]


def test_mor_deletes_survive_key_rename(spark, wh):
    """Equality-delete files store the key's PHYSICAL name: renaming
    the key column after MoR commits stays metadata-only and reads keep
    applying the deletes; new MoR merges under the new name compose."""
    wh.create_namespace("ns")
    wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
    rows = [(f"k{i}", f"d{i % 2}", i) for i in range(10)]
    wh.insert("ns", "t", spark.createDataFrame(rows, schema=SCHEMA).coalesce(1))
    gone = spark.createDataFrame(
        [("k3", "d1", 0)], schema=SCHEMA
    ).withColumn("_del", F.lit(True))
    wh.merge_upsert("ns", "t", gone, delete_col="_del", strategy="mor")
    wh.rename_column("ns", "t", "id", "rid")
    got = {r.rid for r in wh.read("ns", "t").collect()}
    assert got == {f"k{i}" for i in range(10) if i != 3}
    # MoR merge under the NEW logical name
    batch = spark.createDataFrame(
        [("k4", "d0", 400)], "rid string, day string, v long"
    )
    wh.merge_upsert("ns", "t", batch, strategy="mor")
    state = {(r.rid, r.v) for r in wh.read("ns", "t").collect()}
    assert ("k4", 400) in state and ("k4", 4) not in state
    # compaction folds everything under the mapping
    wh.compact("ns", "t", min_files_per_partition=1)
    assert wh.deletes_df("ns", "t").collect() == []
    assert {(r.rid, r.v) for r in wh.read("ns", "t").collect()} == state
