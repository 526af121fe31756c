"""Native Spark SQL DDL lifecycle (SURVEY 2.4, D1-D5 + D7).

The reference manages its catalog through the S3 Tables control plane
(create_table_bucket / create_namespace / create_table with an inline
Iceberg schema, reference lambda/custom_resource/index.py:63-176) and
works around Athena's DDL limits with a metadata-pointer swap
(scripts/update_metadata.py:62-148) -- noting itself that "DDLs for S3
tables are supported only from Apache Spark clients". This engine IS a
Spark client, so the whole lifecycle collapses to plain Spark SQL DDL
against the session catalog; schema evolution is a real ALTER TABLE.

(The transactional MERGE/time-travel layer lives in warehouse.py; this
module is the SQL-DDL face for catalog-managed tables.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _q(ident: str) -> str:
    return ".".join(f"`{p}`" for p in ident.split("."))


def create_namespace(spark: SparkSession, ns: str, if_not_exists: bool = True) -> None:
    ine = "IF NOT EXISTS " if if_not_exists else ""
    spark.sql(f"CREATE NAMESPACE {ine}{_q(ns)}")


def drop_namespace(spark: SparkSession, ns: str, cascade: bool = False) -> None:
    spark.sql(f"DROP NAMESPACE IF EXISTS {_q(ns)}" + (" CASCADE" if cascade else ""))


def create_table(
    spark: SparkSession,
    name: str,
    schema: StructType,
    partition_by: str | None = None,
    comment: str | None = None,
    if_not_exists: bool = True,
) -> None:
    """CREATE TABLE with an explicit schema (D3), optional partitioning
    (reference PARTITIONED BY (date), scripts/update_metadata.py:114)."""
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    )
    ine = "IF NOT EXISTS " if if_not_exists else ""
    stmt = f"CREATE TABLE {ine}{_q(name)} ({cols}) USING parquet"
    if partition_by:
        stmt += f" PARTITIONED BY (`{partition_by}`)"
    if comment:
        # escape backslashes then quotes: the comment is data, not SQL
        # (Spark's default parser processes backslash escapes in literals)
        esc = comment.replace("\\", "\\\\").replace("'", "''")
        stmt += f" COMMENT '{esc}'"
    spark.sql(stmt)


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {_q(name)}")


def add_column(spark: SparkSession, name: str, col: str, dtype: str) -> None:
    """Schema evolution: replaces the reference's metadata-pointer-swap
    workaround (D7) with a first-class ALTER TABLE."""
    spark.sql(f"ALTER TABLE {_q(name)} ADD COLUMNS (`{col}` {dtype})")


def insert_into(spark: SparkSession, name: str, df: DataFrame, overwrite: bool = False) -> None:
    df.write.insertInto(_q(name).replace("`", ""), overwrite=overwrite)


def create_resource_link(spark: SparkSession, link_ns: str, target_ns: str) -> None:
    """D9: LakeFormation/Glue resource-link analog (reference
    stack/lakeformation.py:172-183) for session-catalog tables -- a
    namespace whose tables resolve to another namespace's tables under a
    second name. Local Spark ships a single catalog implementation, so
    the link materializes as zero-copy views (metadata pointers); the
    manifest warehouse's ``Warehouse.link_namespace`` provides the same
    federation for transactional tables."""
    create_namespace(spark, link_ns)
    for t in show_tables(spark, target_ns):
        spark.sql(
            f"CREATE OR REPLACE VIEW {_q(f'{link_ns}.{t}')} "
            f"AS SELECT * FROM {_q(f'{target_ns}.{t}')}"
        )


def show_tables(spark: SparkSession, ns: str) -> list[str]:
    # SHOW TABLES includes session-global TEMP views (isTemporary) --
    # the SQL router's internal __wh_* rewrite views among them; a
    # catalog listing reports only the namespace's persistent tables
    return sorted(
        r.tableName
        for r in spark.sql(f"SHOW TABLES IN {_q(ns)}").collect()
        if not r.isTemporary
    )


def describe(spark: SparkSession, name: str) -> list[tuple[str, str]]:
    return [
        (r.col_name, r.data_type)
        for r in spark.sql(f"DESCRIBE TABLE {_q(name)}").collect()
        if r.col_name and not r.col_name.startswith("#")
    ]
