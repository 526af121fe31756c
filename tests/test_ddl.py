"""Spark SQL DDL lifecycle (D1-D5, D7 collapse) on the session catalog."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DateType,
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sample_for_transactional_datalake_using_s3tables_spark.sources import ddl

SCHEMA = StructType(
    [
        StructField("transaction_id", StringType(), False),
        StructField("amount", DecimalType(12, 2)),
        StructField("ts_millis", LongType()),
        StructField("date", DateType()),
    ]
)


@pytest.fixture()
def ns(spark):
    name = "ddl_test_ns"
    ddl.create_namespace(spark, name)
    yield name
    ddl.drop_namespace(spark, name, cascade=True)


def test_ddl_lifecycle_sql(spark, ns):
    t = f"{ns}.transactions"
    ddl.create_table(spark, t, SCHEMA, partition_by="date")
    ddl.create_table(spark, t, SCHEMA, partition_by="date")  # idempotent
    assert ddl.show_tables(spark, ns) == ["transactions"]

    df = spark.createDataFrame(
        [("TXN_1", "10.50", 1718300000123, "2024-06-13")],
        "transaction_id string, amount string, ts_millis long, date string",
    ).select(
        "transaction_id",
        F.col("amount").cast("decimal(12,2)"),
        "ts_millis",
        F.col("date").cast("date"),
    )
    ddl.insert_into(spark, t, df)
    got = spark.table(t).collect()
    assert len(got) == 1 and str(got[0].amount) == "10.50"

    # D7 collapse: schema evolution is a plain ALTER TABLE
    ddl.add_column(spark, t, "risk_score", "string")
    cols = dict(ddl.describe(spark, t))
    assert cols["risk_score"] == "string"
    assert spark.table(t).filter(F.col("risk_score").isNull()).count() == 1

    ddl.drop_table(spark, t)
    assert ddl.show_tables(spark, ns) == []
