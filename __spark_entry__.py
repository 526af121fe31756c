"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``sample_for_transactional_datalake_using_s3tables_spark``;
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sample_for_transactional_datalake_using_s3tables_spark.operators import (
    all_oracles,
    all_queries,
)
from sample_for_transactional_datalake_using_s3tables_spark.operators.relational import (
    risk_analysis,
)
from sample_for_transactional_datalake_using_s3tables_spark.plans import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's "Risk
    Analysis" aggregate (reference README.md:169-185) re-expressed on the
    events table -- date-window filter, multi-key groupBy, COUNT/SUM(CAST)/
    conditional counts/COUNT DISTINCT, HAVING, ORDER BY DESC."""
    configure(spark)
    return risk_analysis(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin for each query (omitted => rows-only check)."""
    return all_oracles()
