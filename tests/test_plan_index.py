"""Partition-grouped planning index (VERDICT r9 #3).

Predicate planning must cost O(candidate partitions), not O(manifest):
the _plan.idx/_plan-*.dat sidecar pair groups manifest entries by
partition value with merged min/max stats per group, so a selective
plan parses ONLY surviving partitions' entries. These tests pin:

- result parity: idx-served plans == full-parse plans (paths + schema)
- the counting invariant: entries parsed == surviving partitions'
  entries, and zero full-manifest loads on a warm index
- staleness: a new commit invalidates the fingerprint and rebuilds
- historical versions fall back to the full parse (idx serves tips)
- conservative stats merge: a group with ANY stats-less entry never
  prunes on that column
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
    _PLAN_IDX_FILE,
    Warehouse,
)

N_PARTS = 8
FILES_PER_PART = 50


def _entries(n_parts=N_PARTS, files_per_part=FILES_PER_PART, stats=True):
    out = []
    i = 0
    for p in range(n_parts):
        for j in range(files_per_part):
            e = {
                "path": f"data/day=d{p}/f{i:05d}.parquet",
                "partition": f"d{p}",
                "spec": 0,
                "bytes": 1 << 20,
                "records": 100,
            }
            if stats:
                # id ranges are partition-disjoint: partition p's file j
                # holds ids [p*100000 + j*10, p*100000 + j*10 + 9]
                e["stats"] = {
                    "id": [p * 100_000 + j * 10, p * 100_000 + j * 10 + 9],
                    "v": [i, i + 5],
                }
            out.append(e)
            i += 1
    return out


@pytest.fixture()
def wh(spark):
    with tempfile.TemporaryDirectory() as root:
        w = Warehouse(spark, root)
        w.create_namespace("ns")
        schema = StructType(
            [
                StructField("id", LongType(), False),
                StructField("day", StringType()),
                StructField("v", LongType()),
            ]
        )
        w.create_table("ns", "t", schema, key="id", partition_by="day")
        tdir = w._table_dir("ns", "t")
        meta = w.table_meta("ns", "t")
        w._publish(tdir, 1, _entries(), schema=meta["schema"], op="append")
        yield w


def _paths(entries):
    return sorted(e["path"] for e in entries)


def test_idx_plan_matches_full_parse(wh):
    tdir = wh._table_dir("ns", "t")
    vdir = wh._vdir(tdir)
    for preds in (
        [("id", "=", 300_005)],          # one partition
        [("id", "<", 150_000)],          # two partitions
        [("v", ">=", 0)],                # keeps everything
        [("id", ">", 10**9)],            # keeps nothing
        [("nope", "=", 1)],              # unknown column -> keep all
    ):
        got, schema = wh.plan_files("ns", "t", predicates=preds)
        assert os.path.exists(os.path.join(vdir, _PLAN_IDX_FILE))
        # ground truth: the entry-level filter over the full manifest
        doc = wh._manifest_doc(tdir, 1)
        from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
            _entry_may_match,
        )

        want = [e for e in doc["files"] if _entry_may_match(e, preds)]
        assert _paths(got) == _paths(want), preds
        assert schema is not None


def test_idx_plan_partition_filter_matches(wh):
    got, _ = wh.plan_files("ns", "t", partition_filter=["d3", "d5"])
    assert len(got) == 2 * FILES_PER_PART
    assert {e["partition"] for e in got} == {"d3", "d5"}


def test_counting_invariant_entries_parsed(wh, monkeypatch):
    """Warm-index selective plan: entries parsed == surviving
    partitions' entries; ZERO full-manifest loads."""
    # warm the index
    wh.plan_files("ns", "t", predicates=[("id", "=", 1)])
    calls = {"n": 0}
    orig = Warehouse._manifest_doc

    def counting(self, tdir, version, branch=None):
        calls["n"] += 1
        return orig(self, tdir, version, branch)

    monkeypatch.setattr(Warehouse, "_manifest_doc", counting)
    wh._plan_idx_counters.update(
        groups_loaded=0, entries_loaded=0, idx_plans=0
    )
    # partition-disjoint id ranges: this predicate survives exactly one
    # partition group
    got, _ = wh.plan_files("ns", "t", predicates=[("id", "=", 300_005)])
    assert calls["n"] == 0, "warm idx plan must not reload the manifest"
    assert wh._plan_idx_counters["idx_plans"] == 1
    assert wh._plan_idx_counters["groups_loaded"] == 1
    assert wh._plan_idx_counters["entries_loaded"] == FILES_PER_PART
    assert len(got) >= 1
    assert all(e["partition"] == "d3" for e in got)


def test_idx_rebuilds_after_commit(wh):
    tdir = wh._table_dir("ns", "t")
    meta = wh.table_meta("ns", "t")
    wh.plan_files("ns", "t", predicates=[("id", "=", 1)])
    vdir = wh._vdir(tdir)
    import json

    with open(os.path.join(vdir, _PLAN_IDX_FILE)) as f:
        fp1 = json.load(f)["fingerprint"]
    # new commit: one more partition
    extra = [
        {
            "path": "data/day=d9/fx.parquet",
            "partition": "d9",
            "spec": 0,
            "bytes": 1,
            "records": 1,
            "stats": {"id": [10**7, 10**7], "v": [0, 0]},
        }
    ]
    doc = wh._manifest_doc(tdir, 1)
    wh._publish(
        tdir, 2, doc["files"] + extra, schema=meta["schema"], op="append"
    )
    got, _ = wh.plan_files("ns", "t", predicates=[("id", "=", 10**7)])
    assert _paths(got) == ["data/day=d9/fx.parquet"]
    with open(os.path.join(vdir, _PLAN_IDX_FILE)) as f:
        fp2 = json.load(f)["fingerprint"]
    assert fp1 != fp2


def test_historical_version_falls_back(wh):
    tdir = wh._table_dir("ns", "t")
    meta = wh.table_meta("ns", "t")
    doc = wh._manifest_doc(tdir, 1)
    wh._publish(
        tdir, 2, doc["files"][: FILES_PER_PART], schema=meta["schema"],
        op="overwrite",
    )
    # time-traveled selective plan: correct, no idx requirement
    got, _ = wh.plan_files(
        "ns", "t", version=1, predicates=[("id", "=", 300_005)]
    )
    assert all(e["partition"] == "d3" for e in got)
    got2, _ = wh.plan_files("ns", "t", version=2, predicates=[("v", ">=", 0)])
    assert len(got2) == FILES_PER_PART


def test_statsless_entry_keeps_group_column(spark):
    """One stats-less entry in a partition poisons that column's group
    bound: the group must be KEPT for any predicate on it."""
    with tempfile.TemporaryDirectory() as root:
        w = Warehouse(spark, root)
        w.create_namespace("ns")
        schema = StructType([StructField("id", LongType(), False)])
        w.create_table("ns", "t", schema, key="id")
        tdir = w._table_dir("ns", "t")
        meta = w.table_meta("ns", "t")
        entries = [
            {"path": "a.parquet", "partition": "p", "spec": 0,
             "stats": {"id": [0, 9]}},
            {"path": "b.parquet", "partition": "p", "spec": 0},  # no stats
        ]
        w._publish(tdir, 1, entries, schema=meta["schema"], op="append")
        got, _ = w.plan_files("ns", "t", predicates=[("id", "=", 10**6)])
        # group survives (unprovable bound); entry-level filter then
        # keeps only the stats-less file
        assert _paths(got) == ["b.parquet"]


def test_merge_group_stats_rules():
    m = Warehouse._merge_group_stats
    assert m([{"stats": {"a": [1, 5]}}, {"stats": {"a": [3, 9]}}]) == {
        "a": [1, 9]
    }
    # column missing from one entry -> dropped
    assert m([{"stats": {"a": [1, 5], "b": [0, 1]}}, {"stats": {"a": [2, 3]}}]) == {
        "a": [1, 5]
    }
    # column appearing only later -> dropped
    assert m([{"stats": {"a": [1, 5]}}, {"stats": {"a": [2, 3], "b": [0, 1]}}]) == {
        "a": [1, 5]
    }
    # mixed incomparable types -> dropped
    assert m([{"stats": {"a": [1, 5]}}, {"stats": {"a": ["x", "y"]}}]) == {}
    # stats-less entry drops everything
    assert m([{"stats": {"a": [1, 5]}}, {}]) == {}


def test_dat_deleted_mid_plan_falls_back(wh, monkeypatch):
    """Fail-open contract under concurrent rebuilds (VERDICT r10 #4):
    if the dat vanishes between the header read and the seek-read (a
    concurrent rebuild GC'd it), planning must fall back to the full
    manifest parse -- same result, counter recorded -- never raise and
    never return a partial plan."""
    preds = [("id", "<", 150_000)]
    want, _ = wh.plan_files("ns", "t", predicates=preds)  # builds idx
    vdir = wh._vdir(wh._table_dir("ns", "t"))

    real = Warehouse._plan_load_groups

    def sabotage(self, vdir_, idx, groups):
        # simulate the rebuild race: header named a dat that is gone
        # by the time we open it
        os.remove(os.path.join(vdir_, idx["dat"]))
        return real(self, vdir_, idx, groups)

    monkeypatch.setattr(Warehouse, "_plan_load_groups", sabotage)
    before = wh._plan_idx_counters["idx_fallbacks"]
    got, schema = wh.plan_files("ns", "t", predicates=preds)
    assert _paths(got) == _paths(want)
    assert schema is not None
    assert wh._plan_idx_counters["idx_fallbacks"] == before + 1
    # next plan rebuilds the sidecar and serves from the index again
    monkeypatch.setattr(Warehouse, "_plan_load_groups", real)
    again, _ = wh.plan_files("ns", "t", predicates=preds)
    assert _paths(again) == _paths(want)


def test_torn_dat_read_falls_back(wh, monkeypatch):
    """A torn/garbage byte range (ValueError from json) also fails open
    to the full parse instead of failing the plan."""
    preds = [("id", "=", 300_005)]
    want, _ = wh.plan_files("ns", "t", predicates=preds)

    def garbage(self, vdir_, idx, groups):
        raise ValueError("torn read")

    monkeypatch.setattr(Warehouse, "_plan_load_groups", garbage)
    before = wh._plan_idx_counters["idx_fallbacks"]
    got, _ = wh.plan_files("ns", "t", predicates=preds)
    assert _paths(got) == _paths(want)
    assert wh._plan_idx_counters["idx_fallbacks"] == before + 1
