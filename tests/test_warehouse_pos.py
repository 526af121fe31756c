"""Merge-on-read DELETE via POSITION delete files (Iceberg v2
positional deletes): row-granular, keyless, zero rewrites; readers
anti-join on (file path, row ordinal); compaction folds them in.
Producer: ``delete_where(..., strategy="mor-pos")``.
"""

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


@pytest.fixture()
def wh(spark):
    with tempfile.TemporaryDirectory() as d:
        w = Warehouse(spark, d)
        w.create_namespace("ns")
        yield w


def _rows(spark, rows):
    return spark.createDataFrame(rows, S)


def _state(wh, **kw):
    return {(r.id, r.day, r.v) for r in wh.read("ns", "t", **kw).collect()}


def test_mor_pos_delete_row_granular_keyless(wh, spark):
    """Position deletes remove ONLY the matched rows -- duplicate-key
    copies the predicate missed survive (unlike equality deletes) --
    and need no table key."""
    wh.create_table("ns", "t", S)  # keyless
    wh.insert(
        "ns", "t",
        _rows(spark, [("k1", "d0", 1), ("k1", "d0", 99), ("k2", "d1", 2)])
        .coalesce(1),
    )
    r = wh.delete_where("ns", "t", F.col("v") == 99, strategy="mor-pos")
    assert r["deleted_rows"] == 1
    assert r["rewritten_files"] == 0
    assert r["delete_files"] >= 1
    # the other k1 copy survives: row-granular semantics
    assert _state(wh) == {("k1", "d0", 1), ("k2", "d1", 2)}
    # manifest entry shape: kind=pos with explicit targets
    tdir = wh._table_dir("ns", "t")
    doc = wh._manifest_doc(tdir, r["version"])
    dels = doc.get("deletes") or []
    assert dels and all(d["kind"] == "pos" for d in dels)
    assert all(d.get("targets") for d in dels)


def test_mor_pos_delete_time_travel_and_noop(wh, spark):
    wh.create_table("ns", "t", S, key="id", partition_by="day")
    v1 = wh.insert(
        "ns", "t", _rows(spark, [(f"k{i}", f"d{i % 2}", i) for i in range(8)])
    )
    r = wh.delete_where("ns", "t", F.col("v") >= 6, strategy="mor-pos")
    assert r["deleted_rows"] == 2
    assert _state(wh) == {(f"k{i}", f"d{i % 2}", i) for i in range(6)}
    # pre-delete snapshot unaffected
    assert len(_state(wh, version=v1)) == 8
    # no matches -> no commit
    r2 = wh.delete_where("ns", "t", F.col("v") > 100, strategy="mor-pos")
    assert r2["deleted_rows"] == 0
    assert r2["version"] == r["version"]


def test_mor_pos_delete_prunes_by_manifest(wh, spark):
    """Tuple predicates prune candidate files before the probe."""
    wh.create_table("ns", "t", S, key="id", partition_by="day")
    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1)]).coalesce(1))
    wh.insert("ns", "t", _rows(spark, [("k2", "d1", 200)]).coalesce(1))
    r = wh.delete_where(
        "ns", "t", [("v", ">=", 100)], strategy="mor-pos"
    )
    assert r["deleted_rows"] == 1
    assert r["probed_files"] < r["manifest_files"]


def test_mor_pos_delete_compaction_folds(wh, spark):
    wh.create_table("ns", "t", S, key="id", partition_by="day")
    wh.insert("ns", "t", _rows(spark, [(f"k{i}", "d0", i) for i in range(6)]))
    wh.delete_where("ns", "t", F.col("v") % 2 == 0, strategy="mor-pos")
    want = {(f"k{i}", "d0", i) for i in range(6) if i % 2}
    assert _state(wh) == want
    wh.compact("ns", "t", min_files_per_partition=1)
    tdir = wh._table_dir("ns", "t")
    doc = wh._manifest_doc(tdir, wh.current_version("ns", "t"))
    assert not (doc.get("deletes") or []), "compaction must fold pos deletes"
    assert _state(wh) == want


def test_mor_pos_stacked_with_equality_deletes(wh, spark):
    """Position and equality deletes coexist on the same snapshot."""
    wh.create_table("ns", "t", S, key="id", partition_by="day")
    wh.insert("ns", "t", _rows(spark, [(f"k{i}", "d0", i) for i in range(6)]))
    wh.delete_where("ns", "t", F.col("v") == 1, strategy="mor")
    wh.delete_where("ns", "t", F.col("v") == 2, strategy="mor-pos")
    assert _state(wh) == {(f"k{i}", "d0", i) for i in (0, 3, 4, 5)}
    tdir = wh._table_dir("ns", "t")
    doc = wh._manifest_doc(tdir, wh.current_version("ns", "t"))
    kinds = {d.get("kind", "eq") for d in doc.get("deletes") or []}
    assert kinds == {"eq", "pos"}


def test_changelog_pos_delete_preimages(wh, spark):
    wh.create_table("ns", "t", S, key="id", partition_by="day")
    v1 = wh.insert(
        "ns", "t", _rows(spark, [("k1", "d0", 1), ("k2", "d0", 2)]).coalesce(1)
    )
    r = wh.delete_where("ns", "t", F.col("v") == 2, strategy="mor-pos")
    v2 = r["version"]
    got = {
        (x.id, x.v, x._change_type, x._commit_version)
        for x in wh.changelog("ns", "t", v1, v2).collect()
    }
    assert got == {("k2", 2, "delete", v2)}


def test_mor_pos_ghost_rows_not_redeleted(wh, spark):
    """Rows already equality-deleted are ghosts: a later pos-delete
    probe never addresses them, and the changelog never re-reports
    them."""
    wh.create_table("ns", "t", S, key="id", partition_by="day")
    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 5), ("k2", "d0", 5)]).coalesce(1))
    wh.delete_where("ns", "t", F.col("id") == "k1", strategy="mor")
    r = wh.delete_where("ns", "t", F.col("v") == 5, strategy="mor-pos")
    assert r["deleted_rows"] == 1  # k1 was already a ghost
    assert _state(wh) == set()


def test_mor_pos_update_keyless_row_granular(wh, spark):
    """Position-delete UPDATE supersedes exactly the matched rows on a
    KEYLESS table -- duplicate rows the predicate missed survive."""
    wh.create_table("ns", "t", S)
    wh.insert(
        "ns", "t",
        _rows(spark, [("k1", "d0", 1), ("k1", "d0", 1), ("k2", "d1", 9)])
        .coalesce(1),
    )
    r = wh.update_where(
        "ns", "t", {"v": F.col("v") + 100}, F.col("v") == 9,
        strategy="mor-pos",
    )
    assert r["updated_rows"] == 1 and r["rewritten_files"] == 0
    assert _state(wh) == {("k1", "d0", 1), ("k2", "d1", 109)}
    # both duplicate rows update when matched (row-granular, not keyed)
    wh.update_where(
        "ns", "t", {"v": F.lit(7)}, F.col("id") == "k1", strategy="mor-pos"
    )
    got = [tuple(x) for x in wh.read("ns", "t").collect()]
    assert sorted(got) == [("k1", "d0", 7), ("k1", "d0", 7), ("k2", "d1", 109)]


def test_mor_pos_update_can_reassign_key(wh, spark):
    """The equality path forbids key reassignment; the positional path
    allows it (the delete binds to addresses, not key values)."""
    wh.create_table("ns", "t", S, key="id", partition_by="day")
    wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1), ("k2", "d0", 2)]))
    with pytest.raises(ValueError, match="reassign"):
        wh.update_where(
            "ns", "t", {"id": F.lit("z9")}, F.col("v") == 2, strategy="mor",
        )
    r = wh.update_where(
        "ns", "t", {"id": F.lit("z9")}, F.col("v") == 2, strategy="mor-pos",
    )
    assert r["updated_rows"] == 1
    assert _state(wh) == {("k1", "d0", 1), ("z9", "d0", 2)}


def test_mor_pos_update_partition_migration_and_travel(wh, spark):
    wh.create_table("ns", "t", S, key="id", partition_by="day")
    v1 = wh.insert("ns", "t", _rows(spark, [("k1", "d0", 1), ("k2", "d0", 2)]))
    wh.update_where(
        "ns", "t", {"day": F.lit("d9")}, F.col("id") == "k2",
        strategy="mor-pos",
    )
    assert _state(wh) == {("k1", "d0", 1), ("k2", "d9", 2)}
    assert _state(wh, version=v1) == {("k1", "d0", 1), ("k2", "d0", 2)}
    # compaction folds the delete and keeps the migrated partition
    wh.compact("ns", "t", min_files_per_partition=1)
    assert _state(wh) == {("k1", "d0", 1), ("k2", "d9", 2)}


def test_widen_column_metadata_only(wh, spark):
    """Iceberg type promotion: int->long (and decimal precision) is a
    metadata-only evolution -- old files keep their narrow physical
    type and read up-cast; narrowing and re-interpretation reject."""
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    S2 = StructType(
        [
            StructField("id", StringType(), False),
            StructField("n", IntegerType()),
        ]
    )
    wh.create_table("ns", "t", S2, key="id")
    wh.insert(
        "ns", "t",
        spark.createDataFrame([("k1", 7)], S2).coalesce(1),
    )
    v_before = wh.current_version("ns", "t")
    files_before = {
        e["path"]
        for e in wh._manifest(wh._table_dir("ns", "t"), v_before)
    }
    wh.widen_column("ns", "t", "n", "bigint")
    tdir = wh._table_dir("ns", "t")
    v_after = wh.current_version("ns", "t")
    assert v_after == v_before + 1  # schema commit published
    assert {
        e["path"] for e in wh._manifest(tdir, v_after)
    } == files_before  # nothing rewritten
    df = wh.read("ns", "t")
    assert dict(df.dtypes)["n"] == "bigint"
    # old files read up-cast; new 64-bit values land fine
    wh.insert(
        "ns", "t",
        spark.createDataFrame(
            [("k2", 5_000_000_000)], "id string, n bigint"
        ).coalesce(1),
    )
    got = {(r.id, r.n) for r in wh.read("ns", "t").collect()}
    assert got == {("k1", 7), ("k2", 5_000_000_000)}
    # time travel sees the historical (int) type
    old = wh.read("ns", "t", version=v_before)
    assert dict(old.dtypes)["n"] == "int"
    # narrowing / re-interpretation rejected
    import pytest as _pt

    with _pt.raises(ValueError, match="promotion"):
        wh.widen_column("ns", "t", "n", "int")
    with _pt.raises(ValueError, match="promotion"):
        wh.widen_column("ns", "t", "id", "bigint")


def test_widen_column_via_sql_router(wh, spark):
    from pyspark.sql.types import (
        DecimalType, StringType, StructField, StructType,
    )

    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import (
        WarehouseSQL,
    )

    S3 = StructType(
        [
            StructField("id", StringType(), False),
            StructField("amt", DecimalType(10, 2)),
        ]
    )
    wh.create_table("ns", "t", S3, key="id")
    from decimal import Decimal

    wh.insert(
        "ns", "t",
        spark.createDataFrame([("k1", Decimal("12.34"))], S3).coalesce(1),
    )
    sql = WarehouseSQL(wh)
    sql.execute("ALTER TABLE ns.t ALTER COLUMN amt TYPE DECIMAL(20, 2)")
    df = sql.execute("SELECT * FROM ns.t")
    assert dict(df.dtypes)["amt"] == "decimal(20,2)"
    assert df.collect()[0].amt == Decimal("12.34")
    with pytest.raises(ValueError, match="promotion"):
        sql.execute("ALTER TABLE ns.t ALTER COLUMN amt TYPE DECIMAL(20, 4)")


def test_add_struct_field_nested_evolution(wh, spark):
    """Iceberg-style nested evolution: a field added INSIDE a struct
    column is metadata-only; pre-evolution files read the subfield as
    NULL, post-evolution writes carry it, time travel keeps the old
    shape."""
    from pyspark.sql.types import (
        DoubleType, IntegerType, StringType, StructField, StructType,
    )

    S2 = StructType(
        [
            StructField("id", StringType(), False),
            StructField(
                "geo",
                StructType(
                    [
                        StructField("lat", DoubleType()),
                        StructField("lon", DoubleType()),
                    ]
                ),
            ),
        ]
    )
    wh.create_table("ns", "t", S2, key="id")
    wh.insert(
        "ns", "t",
        spark.createDataFrame([("k1", (1.0, 2.0))], S2).coalesce(1),
    )
    v1 = wh.current_version("ns", "t")
    wh.add_struct_field("ns", "t", "geo.alt", StructField("alt", IntegerType()))
    df = wh.read("ns", "t")
    assert df.schema["geo"].dataType.fieldNames() == ["lat", "lon", "alt"]
    r = df.collect()[0]
    assert (r.geo.lat, r.geo.lon, r.geo.alt) == (1.0, 2.0, None)
    # post-evolution insert carries the new subfield
    wh.insert(
        "ns", "t",
        spark.createDataFrame(
            [("k2", (3.0, 4.0, 9))],
            "id string, geo struct<lat:double, lon:double, alt:int>",
        ).coalesce(1),
    )
    got = {x.id: x.geo.alt for x in wh.read("ns", "t").collect()}
    assert got == {"k1": None, "k2": 9}
    # time travel keeps the historical shape
    old = wh.read("ns", "t", version=v1)
    assert old.schema["geo"].dataType.fieldNames() == ["lat", "lon"]
    # guards
    with pytest.raises(ValueError, match="already exists"):
        wh.add_struct_field(
            "ns", "t", "geo.alt", StructField("alt", IntegerType())
        )
    with pytest.raises(ValueError, match="not a struct"):
        wh.add_struct_field(
            "ns", "t", "id.x", StructField("x", IntegerType())
        )
    with pytest.raises(ValueError, match="top-level"):
        wh.add_struct_field("ns", "t", "geo", StructField("geo", IntegerType()))


@pytest.mark.slow
def test_uri_escapable_warehouse_root(spark):
    """A warehouse root containing a SPACE and a ``%`` -- characters
    Spark URI-encodes in ``_metadata.file_path`` / ``input_file_name``
    -- must not break positional-delete addressing or MoR updates.
    Addresses bind to file BASENAMES (never URI-encoded), so the raw
    os.path form and the encoded scan form can't diverge."""
    import os
    import tempfile

    base = tempfile.mkdtemp()
    root = os.path.join(base, "ware house %41")  # space + percent
    os.makedirs(root)
    wh = Warehouse(spark, root)
    wh.create_namespace("ns")
    wh.create_table("ns", "t", S, key="id", partition_by="day")
    wh.insert(
        "ns", "t", _rows(spark, [(f"k{i}", f"d{i % 2}", i) for i in range(8)])
    )
    # mor-pos delete: rows must actually disappear (a silent join miss
    # would leave them live)
    r = wh.delete_where("ns", "t", F.col("v") >= 6, strategy="mor-pos")
    assert r["deleted_rows"] == 2 and r["rewritten_files"] == 0
    got = {(x.id, x.day, x.v) for x in wh.read("ns", "t").collect()}
    assert got == {(f"k{i}", f"d{i % 2}", i) for i in range(6)}
    # mor-pos update through the same addressing
    r2 = wh.update_where(
        "ns", "t", {"v": F.lit(100)}, F.col("id") == "k0", strategy="mor-pos"
    )
    assert r2["updated_rows"] == 1
    got = {(x.id, x.v) for x in wh.read("ns", "t").collect()}
    assert ("k0", 100) in got and len(got) == 6
    # collapsed append-segment changelog: the basename join must stamp
    # every insert row (the abs-path join silently dropped them all)
    wh2 = Warehouse(spark, root)
    wh2.create_table("ns", "t2", S, key="id")
    for i in range(3):
        wh2.insert("ns", "t2", _rows(spark, [(f"a{i}", "d0", i)]).coalesce(1))
    ch = {
        (x.id, x._change_type, x._commit_version)
        for x in wh2.changelog("ns", "t2", 0).collect()
    }
    assert ch == {(f"a{i}", "insert", i + 1) for i in range(3)}
