"""Event-time windows + UDF-surface operators vs DuckDB."""

from __future__ import annotations

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.operators import (
    analytics,
    sampling,
    streamwin,
    udfs,
)

from .conftest import SF_DIR
from .oracle_utils import compare, duckdb_connection

MODULES = {
    "streamwin": streamwin,
    "udfs": udfs,
    "sampling": sampling,
    "analytics": analytics,
}
CASES = [(m, q) for m, mod in MODULES.items() for q in sorted(mod.QUERIES)]


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("mod_name,name", CASES)
def test_extension_oracle(spark, sf_dir, con, mod_name, name):
    m = MODULES[mod_name]
    compare(m.QUERIES[name](spark, sf_dir), con, m.ORACLES[name], name)
