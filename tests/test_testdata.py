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
