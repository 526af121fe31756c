"""Access-control grants (SURVEY D8): the reference's LakeFormation
permission model (stack/lakeformation.py:186-243 -- ALL to the pipeline
role on the table, DESCRIBE on the resource link, SELECT to consumers)
re-expressed as engine-enforced catalog metadata.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
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
        w = Warehouse(spark, d)
        w.create_namespace("ns")
        w.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
        w.insert(
            "ns",
            "t",
            spark.createDataFrame(
                [("a", "d1", 1), ("b", "d1", 2), ("c", "d2", 3)], schema=SCHEMA
            ),
        )
        yield w


def test_no_grant_no_read(wh):
    with pytest.raises(PermissionError):
        wh.read_as("nobody", "ns", "t")


def test_select_grant_reads_all(spark, wh):
    wh.grant("analyst", "ns", "t", permissions=("SELECT",))
    got = {(r.id, r.v) for r in wh.read_as("analyst", "ns", "t").collect()}
    assert got == {("a", 1), ("b", 2), ("c", 3)}
    # SELECT does not imply INSERT/ALL
    with pytest.raises(PermissionError):
        wh.insert_as("analyst", "ns", "t", spark.createDataFrame([("z", "d9", 9)], SCHEMA))
    with pytest.raises(PermissionError):
        wh.merge_upsert_as(
            "analyst", "ns", "t", spark.createDataFrame([("z", "d9", 9)], SCHEMA)
        )


def test_column_grant_projects(wh):
    """Column-restricted SELECT: the read returns ONLY granted columns
    (LakeFormation column-level permission)."""
    wh.grant("narrow", "ns", "t", permissions=("SELECT",), columns=["id", "day"])
    df = wh.read_as("narrow", "ns", "t")
    assert df.columns == ["id", "day"]


def test_row_filter_grant(wh):
    """Row filter = data-cell filter: the principal sees only matching
    rows, composed as a real predicate (works with partition pruning)."""
    wh.grant("d1_only", "ns", "t", permissions=("SELECT",), row_filter="day = 'd1'")
    got = {r.id for r in wh.read_as("d1_only", "ns", "t").collect()}
    assert got == {"a", "b"}


def test_row_filter_and_columns_compose_with_time_travel(spark, wh):
    wh.merge_upsert("ns", "t", spark.createDataFrame([("a", "d1", 99)], SCHEMA))
    wh.grant(
        "aud", "ns", "t", permissions=("SELECT",), columns=["id", "v"],
        row_filter="id = 'a'",
    )
    v1 = wh.read_as("aud", "ns", "t", version=1).collect()
    v2 = wh.read_as("aud", "ns", "t", version=2).collect()
    assert [(r.id, r.v) for r in v1] == [("a", 1)]
    assert [(r.id, r.v) for r in v2] == [("a", 99)]


def test_all_implies_everything(spark, wh):
    wh.grant("pipeline", "ns", "t", permissions=("ALL",))
    wh.insert_as("pipeline", "ns", "t", spark.createDataFrame([("z", "d9", 9)], SCHEMA))
    wh.merge_upsert_as(
        "pipeline", "ns", "t", spark.createDataFrame([("z", "d9", 10)], SCHEMA)
    )
    got = {(r.id, r.v) for r in wh.read_as("pipeline", "ns", "t").collect()}
    assert ("z", 10) in got


def test_namespace_grant_covers_tables_and_listing(spark, wh):
    """A namespace-level grant (resource-link DESCRIBE pattern) covers
    every table under it; listing is permission-filtered."""
    wh.create_table("ns", "t2", SCHEMA, key="id")
    assert wh.list_tables_as("stranger", "ns") == []
    wh.grant("consumer", "ns", permissions=("SELECT",))
    assert wh.list_tables_as("consumer", "ns") == ["t", "t2"]
    assert wh.read_as("consumer", "ns", "t2").count() == 0


def test_revoke_and_regrant_replace(wh):
    wh.grant("temp", "ns", "t", permissions=("SELECT",))
    assert wh.check("temp", "ns", "t", "SELECT")
    wh.revoke("temp", "ns", "t")
    assert not wh.check("temp", "ns", "t", "SELECT")
    with pytest.raises(PermissionError):
        wh.read_as("temp", "ns", "t")
    # re-grant replaces, not merges
    wh.grant("temp", "ns", "t", permissions=("SELECT",), columns=["id"])
    assert wh.read_as("temp", "ns", "t").columns == ["id"]


def test_grants_df_metadata_table(wh):
    wh.grant("a1", "ns", "t", permissions=("SELECT",), columns=["id"])
    wh.grant("a2", "ns", "t", permissions=("ALL",))
    rows = {r.principal: r for r in wh.grants_df("ns", "t").collect()}
    assert rows["a1"].columns == "id"
    assert rows["a2"].permissions == "ALL"


def test_grant_validation(wh):
    with pytest.raises(ValueError):
        wh.grant("x", "ns", "t", permissions=("FLY",))
    with pytest.raises(ValueError):
        wh.grant("x", "ns", "t", columns=["nope"])


def test_column_grant_prunes_scan(spark, wh):
    """The granted projection reaches the parquet scan (enforcement
    composes with column pruning, not a post-projection of a full read)."""
    wh.grant("narrow", "ns", "t", permissions=("SELECT",), columns=["id"])
    df = wh.read_as("narrow", "ns", "t")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "id" in read_schema and "v" not in read_schema
