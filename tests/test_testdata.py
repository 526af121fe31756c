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
    column at EVERY SF present in the testdata dir (ADVICE r13: derive
    the list instead of hand-typing three, so a bench/verify run at a
    larger SF never rests on an unpinned assumption), x*100 is within
    0.01 of an integer, so round(x*100) == CAST(x AS DECIMAL(12,2))*100
    exactly and no half-way ties exist. Also asserts the physical
    parquet type is float64: a float32 column at another SF would break
    round(x*100) exactness long before the 2-decimal check could see
    it. If a future generator ever emits >2 decimals, this fails before
    any oracle mismatch could."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    cols = {
        "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "orders": ["o_totalprice"],
        "events": ["value"],
    }
    sfs = sorted(
        d for d in os.listdir("/root/testdata")
        if d.startswith("sf")
        and os.path.isdir(os.path.join("/root/testdata", d))
    )
    assert sfs, "no sf* dirs under /root/testdata"
    for sf in sfs:
        for table, names in cols.items():
            t = pq.read_table(f"/root/testdata/{sf}/{table}.parquet", columns=names)
            for c in names:
                assert str(t.schema.field(c).type) == "double", (
                    sf, table, c, t.schema.field(c).type,
                )
                x = t[c].to_numpy(zero_copy_only=False) * 100.0
                frac = np.abs(x - np.rint(x)).max()
                assert frac < 0.01, (sf, table, c, frac)


def test_money_atom_guard_and_fallback(spark):
    """The int64 atom path is gated on the documented exact-2-decimal
    contract (VERDICT r13 #6): a column OUTSIDE the contract must (a)
    raise loudly from the strict _money_atom, and (b) route money_sum
    to the decimal fallback -- exercised here with an injected
    3-decimal row on which the atom formulation would silently diverge
    from the declared decimal semantics."""
    import pyspark.sql.functions as F
    import pytest

    from sample_for_transactional_datalake_using_s3tables_spark.operators import (
        relational as R,
    )

    with pytest.raises(ValueError, match="exact-2-decimal contract"):
        R._money_atom(F.col("x"), ("not_a_table", "x"))

    # injected 3-decimal rows: 1.005 is the canonical divergence --
    # round(1.005*100) = 100 (the float product is 100.499...) while
    # CAST(1.005 AS DECIMAL(18,2)) = 1.01 (shortest-repr HALF_UP)
    df = spark.createDataFrame([(1.005,), (2.0,), (0.335,)], "x double")
    fallback = df.agg(
        R.money_sum(F.col("x"), ("injected", "x")).alias("s")
    ).first()["s"]
    atom_sum = df.agg(
        R._int_to_dec(
            F.sum(F.round(F.col("x") * 100).cast("bigint")), 2
        ).alias("s")
    ).first()["s"]
    decimal_ref = df.agg(
        F.sum(F.col("x").cast("decimal(18,2)")).alias("s")
    ).first()["s"]
    assert fallback == decimal_ref  # fallback == declared semantics
    assert atom_sum != fallback  # the guard matters on this domain

    # contract columns keep the EXACT r13 atom expression (bench plans
    # unchanged): money_sum compiles to the same _int_to_dec(sum(atom))
    a = R.money_sum(F.col("value"), ("events", "value"))
    b = R._int_to_dec(
        F.sum(F.round(F.col("value") * 100).cast("bigint")), 2
    )
    assert str(a) == str(b)
