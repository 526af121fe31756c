"""PySpark-native analytics engine with the capabilities of
aws-samples/sample-for-transactional-datalake-using-s3tables.

The reference wires a transactional data lake on AWS (DynamoDB CDC ->
Kinesis/Firehose -> S3 Tables/Iceberg -> Athena SQL). This package
re-expresses that capability surface Spark-first:

- ``plans.session``    -- SparkSession factory + engine configuration
- ``sources.testdata`` -- deterministic parquet table loaders (driver data)
- ``sources.warehouse``-- ACID-ish table catalog (namespace/table DDL, MERGE
                          upsert, snapshots) over parquet
- ``operators``        -- the relational query inventory (SURVEY.md section 2)
                          plus LLM-data-pipeline operators (dedup, similarity,
                          text analysis, multimodal)
- ``streaming``        -- CDC envelope ingest: Structured Streaming +
                          foreachBatch keyed upsert
"""

__version__ = "0.1.0"
