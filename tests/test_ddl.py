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


def test_nested_struct_ddl(spark, ns):
    """D6: the reference's nested table shape -- transaction_metadata /
    fraud_indicators STRUCTs (scripts/update_metadata.py:99-113) and the
    orders items array<struct> (scripts/create_sample_orders.py:29-53)."""
    t = f"{ns}.transactions_nested"
    nested = StructType(
        [
            StructField("transaction_id", StringType(), False),
            StructField(
                "transaction_metadata",
                StructType(
                    [
                        StructField("device_type", StringType()),
                        StructField("authentication_method", StringType()),
                        StructField("merchant_id", StringType()),
                    ]
                ),
            ),
            StructField(
                "items",
                __import__("pyspark.sql.types", fromlist=["ArrayType"]).ArrayType(
                    StructType(
                        [
                            StructField("productId", StringType()),
                            StructField("price", DecimalType(10, 2)),
                        ]
                    )
                ),
            ),
        ]
    )
    ddl.create_table(spark, t, nested)
    df = spark.createDataFrame(
        [("TXN_1", ("MOBILE", "2FA", "MERCH_1"), [("P1", "9.99"), ("P2", "1.50")])],
        "transaction_id string, "
        "transaction_metadata struct<device_type:string,authentication_method:string,merchant_id:string>, "
        "items array<struct<productId:string,price:string>>",
    ).selectExpr(
        "transaction_id",
        "transaction_metadata",
        "transform(items, x -> struct(x.productId as productId, "
        "cast(x.price as decimal(10,2)) as price)) as items",
    )
    ddl.insert_into(spark, t, df)
    row = spark.table(t).selectExpr(
        "transaction_metadata.device_type as device_type",
        "items[1].price as price",
        "size(items) as n_items",
    ).collect()[0]
    assert row.device_type == "MOBILE"
    assert str(row.price) == "1.50"
    assert row.n_items == 2


def test_resource_link_views(spark):
    """D9: session-catalog resource link -- the same table resolves under
    two namespace names (reference stack/lakeformation.py:172-183)."""
    from sample_for_transactional_datalake_using_s3tables_spark.sources import ddl
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([StructField("k", StringType()), StructField("v", LongType())])
    ddl.create_namespace(spark, "src_db")
    try:
        ddl.create_table(spark, "src_db.t", schema)
        spark.createDataFrame([("x", 1), ("y", 2)], schema).write.insertInto("src_db.t")
        ddl.create_resource_link(spark, "lnk_db", "src_db")
        a = {tuple(r) for r in spark.table("src_db.t").collect()}
        b = {tuple(r) for r in spark.table("lnk_db.t").collect()}
        assert a == b == {("x", 1), ("y", 2)}
    finally:
        spark.sql("DROP VIEW IF EXISTS lnk_db.t")
        ddl.drop_namespace(spark, "lnk_db", cascade=True)
        ddl.drop_table(spark, "src_db.t")
        ddl.drop_namespace(spark, "src_db", cascade=True)
