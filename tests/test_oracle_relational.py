"""Every relational operator vs its DuckDB oracle at the driver's sf."""

from __future__ import annotations

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.operators import relational

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


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_oracle(spark, sf_dir, con, name):
    df = relational.QUERIES[name](spark, sf_dir)
    if name not in relational.ORACLES:  # approximate ops: rows-only check
        rows = df.collect()
        assert rows, f"{name}: empty result"
        if "within_bounds" in df.columns:
            assert all(r.within_bounds for r in rows)
        return
    compare(df, con, relational.ORACLES[name], name)
