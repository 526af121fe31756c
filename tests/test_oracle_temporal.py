"""As-of join and range join vs DuckDB (incl. native ASOF JOIN oracle)."""

from __future__ import annotations

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.operators import temporal

from .conftest import SF_DIR
from .oracle_utils import compare, duckdb_connection

# Long-tail battery: excluded from the default gate (VERDICT r13 #4
# -- the full suite outgrew the driver's verification budget). Run
# everything with:  python -m pytest tests/ -q -m "slow or not slow"
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(temporal.QUERIES))
def test_temporal_oracle(spark, sf_dir, con, name):
    compare(temporal.QUERIES[name](spark, sf_dir), con, temporal.ORACLES[name], name)
