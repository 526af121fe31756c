"""Partition spec evolution (Iceberg ALTER TABLE ... SET PARTITION
SPEC): metadata-only layout changes, mixed-spec planning, DML scope
safety, and compaction-driven migration."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
    Warehouse,
    _scope_key,
)

S = StructType(
    [
        StructField("id", StringType(), False),
        StructField("day", StringType()),
        StructField("region", StringType()),
        StructField("v", LongType()),
    ]
)

ROWS1 = [(f"k{i}", f"d{i % 2}", f"r{i % 3}", i) for i in range(10)]
ROWS2 = [(f"k{i}", f"d{i % 2}", f"r{i % 3}", i) for i in range(10, 20)]


def _mk(spark, rows):
    return spark.createDataFrame(rows, S)


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path))
    w.create_namespace("ns")
    w.create_table("ns", "t", S, key="id", partition_by="day")
    w.insert("ns", "t", _mk(spark, ROWS1))
    return w


def _state(wh):
    return {(r.id, r.day, r.region, r.v) for r in wh.read("ns", "t").collect()}


def test_evolve_is_metadata_only_and_stamps_new_files(wh, spark):
    tdir = wh._table_dir("ns", "t")
    before = {e["path"] for e in wh._manifest(tdir, wh.current_version("ns", "t"))}
    sid = wh.evolve_partition_spec("ns", "t", "region")
    assert sid == 1
    after = {e["path"] for e in wh._manifest(tdir, wh.current_version("ns", "t"))}
    assert before == after  # nothing rewritten
    wh.insert("ns", "t", _mk(spark, ROWS2))
    entries = wh._manifest(tdir, wh.current_version("ns", "t"))
    specs = {e.get("spec", 0) for e in entries}
    assert specs == {0, 1}
    new = [e for e in entries if e.get("spec", 0) == 1]
    assert {e["partition"] for e in new} <= {"r0", "r1", "r2"}
    assert _state(wh) == set(ROWS1) | set(ROWS2)


def test_partition_filter_prunes_only_current_spec(wh, spark):
    wh.evolve_partition_spec("ns", "t", "region")
    wh.insert("ns", "t", _mk(spark, ROWS2))
    entries, _ = wh.plan_files("ns", "t", partition_filter=["r0"])
    # every old-spec file is conservatively kept; new-spec files prune
    old = [e for e in entries if e.get("spec", 0) == 0]
    new = [e for e in entries if e.get("spec", 0) == 1]
    assert old and new
    assert {e["partition"] for e in new} == {"r0"}
    all_entries, _ = wh.plan_files("ns", "t")
    assert len(entries) < len(all_entries)
    # correctness: a filtered read still returns every matching row
    got = {
        r.id
        for r in wh.read("ns", "t", partition_filter=["r0"])
        .filter(F.col("region") == "r0")
        .collect()
    }
    assert got == {f"k{i}" for i in range(20) if i % 3 == 0}


def test_dml_across_mixed_specs(wh, spark):
    wh.evolve_partition_spec("ns", "t", "region")
    wh.insert("ns", "t", _mk(spark, ROWS2))
    # UPDATE hits rows in both specs
    wh.update_where("ns", "t", {"v": F.col("v") + 100}, F.col("id").isin("k1", "k11"))
    # predicate DELETE likewise
    wh.delete_where("ns", "t", F.col("v") >= F.lit(115))
    expect = {
        (i_, d, r_, v + 100 if i_ in ("k1", "k11") else v)
        for (i_, d, r_, v) in set(ROWS1) | set(ROWS2)
    }
    expect = {t for t in expect if t[3] < 115}
    assert _state(wh) == expect


def test_mor_merge_over_mixed_specs(wh, spark):
    wh.evolve_partition_spec("ns", "t", "region")
    wh.insert("ns", "t", _mk(spark, ROWS2))
    src = _mk(spark, [("k1", "d1", "r1", 999), ("k11", "d1", "r2", 888)])
    wh.merge_upsert("ns", "t", src, strategy="mor")
    state = _state(wh)
    assert ("k1", "d1", "r1", 999) in state and ("k11", "d1", "r2", 888) in state
    assert len(state) == 20
    wh.compact("ns", "t", min_files_per_partition=1)
    assert _state(wh) == state


def test_compact_migrates_into_current_spec(wh, spark):
    wh.evolve_partition_spec("ns", "t", "region")
    wh.insert("ns", "t", _mk(spark, ROWS2))
    state = _state(wh)
    wh.compact("ns", "t", min_files_per_partition=1)
    tdir = wh._table_dir("ns", "t")
    entries = wh._manifest(tdir, wh.current_version("ns", "t"))
    assert {e.get("spec", 0) for e in entries} == {1}
    assert {e["partition"] for e in entries} == {"r0", "r1", "r2"}
    assert _state(wh) == state
    # with a fully-migrated layout, partition_filter prunes everything else
    entries, _ = wh.plan_files("ns", "t", partition_filter=["r1"])
    assert {e["partition"] for e in entries} == {"r1"}


def test_evolve_to_unpartitioned_and_back(wh, spark):
    wh.evolve_partition_spec("ns", "t", None)
    wh.insert("ns", "t", _mk(spark, ROWS2[:5]))
    assert len(_state(wh)) == 15
    sid = wh.evolve_partition_spec("ns", "t", "day")
    assert sid == 2
    wh.insert("ns", "t", _mk(spark, ROWS2[5:]))
    assert len(_state(wh)) == 20


def test_evolve_validates_transform(wh):
    with pytest.raises(ValueError, match="not in schema"):
        wh.evolve_partition_spec("ns", "t", "nope")
    with pytest.raises(ValueError, match="not in schema"):
        wh.evolve_partition_spec("ns", "t", "bucket(4, nope)")
    # no-op evolution keeps the current id
    assert wh.evolve_partition_spec("ns", "t", "day") == 0


def test_scope_keys_disambiguate_specs():
    a = {"partition": "x", "spec": 0}
    b = {"partition": "x", "spec": 1}
    assert _scope_key(a) != _scope_key(b)
    assert _scope_key({"partition": "x"}) == _scope_key(a)
