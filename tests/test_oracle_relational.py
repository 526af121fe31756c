"""Every relational operator vs its DuckDB oracle at the driver's sf."""

from __future__ import annotations

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.operators import relational

from .conftest import SF_DIR
from .oracle_utils import compare, duckdb_connection


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_oracle(spark, sf_dir, con, name):
    assert name in relational.ORACLES, f"{name} missing oracle"
    df = relational.QUERIES[name](spark, sf_dir)
    compare(df, con, relational.ORACLES[name], name)
