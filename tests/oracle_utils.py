"""Local replica of the driver's DuckDB-oracle comparison.

Stricter than the driver: exact value equality (no rounding slack), so
anything that passes here should hash-match in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, float):
        return ("f", math.nan if math.isnan(v) else v)
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat())
    if isinstance(v, datetime.date):
        return ("D", v.isoformat())
    if isinstance(v, list):
        return ("l", tuple(_norm(x) for x in v))
    return (type(v).__name__, v)


def compare(spark_df, con, sql: str, name: str = "query") -> None:
    """Assert spark result == duckdb result (order-insensitive)."""
    cols = sorted(spark_df.columns)
    spark_rows = [tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()]

    res = con.sql(sql)
    dcols = list(res.columns)
    assert sorted(dcols) == cols, (
        f"{name}: column mismatch spark={cols} duckdb={sorted(dcols)}"
    )
    idx = [dcols.index(c) for c in cols]
    duck_rows = [tuple(_norm(row[i]) for i in idx) for row in res.fetchall()]

    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    ss, dd = sorted(spark_rows), sorted(duck_rows)
    for i, (a, b) in enumerate(zip(ss, dd)):
        assert a == b, f"{name}: row {i} differs\n  spark : {a}\n  duckdb: {b}"
