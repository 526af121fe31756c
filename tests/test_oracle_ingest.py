"""Ingest-path queries (CDC pipeline, warehouse MERGE) vs DuckDB."""

from __future__ import annotations

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.operators import ingest

from .conftest import SF_DIR
from .oracle_utils import compare, duckdb_connection


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ingest.QUERIES))
def test_ingest_oracle(spark, sf_dir, con, name):
    compare(ingest.QUERIES[name](spark, sf_dir), con, ingest.ORACLES[name], name)
