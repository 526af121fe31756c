"""Loader normalization contract (sources/testdata.py).

Pins the one type-normalization the whole engine depends on: however the
runtime surfaces parquet TIMESTAMP(NANOS) (epoch-nanos LongType on old
PySpark, TIMESTAMP_NTZ on 4.1+), ``load_table`` must hand every operator
a session-zoned ``TimestampType`` ``events.ts``. Round 2 regressed when
a PySpark upgrade silently flipped the raw read type; this catches the
next environment bump in tests instead of in the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import TimestampType

from sample_for_transactional_datalake_using_s3tables_spark.sources.testdata import (
    load_table,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_events_ts_is_timestamp(spark):
    df = load_table(spark, SF_SMALL, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), df.schema["ts"]


def test_events_ts_values_match_duckdb_epoch(spark):
    """The normalized values agree with the DuckDB oracle's read of the
    same file at microsecond precision (UTC session, so NTZ-vs-TZ cast
    must be value-preserving)."""
    import duckdb

    spark_us = [
        r[0]
        for r in load_table(spark, SF_SMALL, "events")
        .select(F.unix_micros("ts"))
        .orderBy("event_id")
        .limit(100)
        .collect()
    ]
    duck_us = [
        r[0]
        for r in duckdb.sql(
            f"SELECT epoch_us(ts) FROM '{SF_SMALL}/events.parquet' "
            "ORDER BY event_id LIMIT 100"
        ).fetchall()
    ]
    assert spark_us == duck_us


def test_unix_micros_callsites_resolve(spark):
    """The two historical DATATYPE_MISMATCH sites plan without error."""
    from sample_for_transactional_datalake_using_s3tables_spark.operators import (
        temporal,
    )

    # .schema forces analysis (where the round-2 failure surfaced)
    assert "gap_seconds" in temporal.range_join(spark, SF_SMALL).schema.names


def test_money_columns_are_cents():
    """Pin the exact-2-decimal money domain the r13 integer-sum
    formulation relies on (relational._money_atom): for every money
    column at every SF, x*100 is within 0.01 of an integer, so
    round(x*100) == CAST(x AS DECIMAL(12,2)) * 100 exactly and no
    half-way ties exist. If a future generator ever emits >2 decimals,
    this fails before any oracle mismatch could."""
    import numpy as np
    import pyarrow.parquet as pq

    cols = {
        "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "orders": ["o_totalprice"],
        "events": ["value"],
    }
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for table, names in cols.items():
            t = pq.read_table(f"/root/testdata/{sf}/{table}.parquet", columns=names)
            for c in names:
                x = t[c].to_numpy(zero_copy_only=False) * 100.0
                frac = np.abs(x - np.rint(x)).max()
                assert frac < 0.01, (sf, table, c, frac)
