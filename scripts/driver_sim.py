"""Local replica of the driver's correctness gate.

Unlike tests/oracle_utils.py (which compares Spark Rows against DuckDB
``fetchall`` values, keeping Decimal as Decimal), this mimics the actual
driver: Spark ``toPandas()`` vs DuckDB ``.df()`` -- the path where
DECIMAL becomes float64 on the DuckDB side and where array-typed cells
crash pandas sorting. A query green here should hash-match in
CORRECTNESS_r{N}.json.

Usage: python scripts/driver_sim.py [first_n] [name ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("null",)
        return ("f", f)
    if isinstance(v, decimal.Decimal):
        return ("DECIMAL-LEAK", str(v))  # should never appear post-finalize
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if pd.isna(v):
            return ("null",)
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, datetime.date):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, np.datetime64):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, bytes):
        return ("b", v)
    if isinstance(v, (list, np.ndarray)):
        return ("ARRAY-LEAK", tuple(_norm(x) for x in v))
    try:
        if pd.isna(v):
            return ("null",)
    except (TypeError, ValueError):
        pass
    return (type(v).__name__, v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    # per-column extraction: iterrows() would upcast whole mixed rows to
    # float64 and mask int-vs-float type leaks the driver would catch
    cols = sorted(df.columns)
    data = [df[c].tolist() for c in cols]
    rows = [tuple(_norm(col[i]) for col in data) for i in range(len(df))]
    return sorted(rows)


def main() -> int:
    from pyspark.sql import SparkSession

    from sample_for_transactional_datalake_using_s3tables_spark.operators import (
        all_oracles,
        all_queries,
    )
    from sample_for_transactional_datalake_using_s3tables_spark.plans import configure

    args = sys.argv[1:]
    first_n = 50
    names: list[str] | None = None
    rows_only = False
    if "--rows-only" in args:
        # scale sweeps past the oracle's single-node feasibility (e.g.
        # dedup_semantic at sf100 is O(N^1.5 * dim) on BOTH sides): run
        # the Spark query alone and report row count + wall time -- the
        # weaker rows-only check the driver records for non-SQL ops
        rows_only = True
        args = [a for a in args if a != "--rows-only"]
    if args and args[0].isdigit():
        first_n = int(args[0])
        args = args[1:]
    if args:
        names = args

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .appName("driver_sim")
        .getOrCreate()
    )
    configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = all_queries()
    oracles = all_oracles()
    if names:
        unknown = [n for n in names if n not in queries]
        if unknown:
            print(f"FAIL unknown query names: {unknown}")
            return 1
        window = names
    else:
        window = list(queries)[:first_n]

    n_pass = n_fail = 0
    for name in window:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if rows_only:
            print(
                f"ok   {name}: {len(sdf)} rows in {time.time() - t0:.1f}s "
                "(rows-only)"
            )
            n_pass += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(sdf)} rows)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(
                f"FAIL {name}: columns spark={sorted(sdf.columns)} "
                f"duck={sorted(ddf.columns)}"
            )
            n_fail += 1
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            n_fail += 1
            continue
        try:
            srows, drows = canon_rows(sdf), canon_rows(ddf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: canon crash: {e}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(srows, drows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first:")
            print(f"   spark: {bad[0][0]}")
            print(f"   duck : {bad[0][1]}")
            n_fail += 1
        else:
            # scan every cell: a leak may hide behind NULL-first sort order
            leak = any("LEAK" in cell[0] for row in srows for cell in row)
            if leak:
                print(f"FAIL {name}: harness-hostile output type (Decimal/array)")
                n_fail += 1
            else:
                print(f"ok   {name}: {len(srows)} rows in {dt:.1f}s")
                n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed of {len(window)} checked")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
