"""Bucketed co-located join: the shuffle-elimination path for repeated
big-big joins (SURVEY 2.6 / scale design).

At 100 TB, orders |><| lineitem on the order key is the recurring
expensive join; persisting both sides bucketed by that key lets every
subsequent join run with ZERO exchanges. This test proves the engine
configuration actually achieves that: same join, bucketed tables ->
no ShuffleExchange in the executed plan.
"""

from __future__ import annotations

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.sources.testdata import (
    load_table,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed(spark):
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bkt")
    load_table(spark, SF_SMALL, "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("bkt.orders_b")
    load_table(spark, SF_SMALL, "lineitem").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("bkt.lineitem_b")
    yield
    spark.sql("DROP TABLE IF EXISTS bkt.orders_b")
    spark.sql("DROP TABLE IF EXISTS bkt.lineitem_b")
    spark.sql("DROP NAMESPACE IF EXISTS bkt")


def _exchanges(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        o = spark.table("bkt.orders_b")
        l = spark.table("bkt.lineitem_b")
        joined = l.join(o, l.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        assert _exchanges(joined) == 0, "bucketed join still shuffles"
        assert joined.count() == load_table(spark, SF_SMALL, "lineitem").count()

        # control: the same join on unbucketed sources DOES shuffle
        o2 = load_table(spark, SF_SMALL, "orders")
        l2 = load_table(spark, SF_SMALL, "lineitem")
        joined2 = l2.join(o2, l2.l_orderkey == o2.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        assert _exchanges(joined2) >= 2, "control join should shuffle both sides"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
