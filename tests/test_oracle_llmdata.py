"""LLM-data operators (text / dedup / similarity / multimodal) vs DuckDB."""

from __future__ import annotations

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.operators import (
    dedup,
    multimodal,
    pipeline,
    similarity,
    text,
)

from .conftest import SF_DIR
from .oracle_utils import compare, duckdb_connection

MODULES = {
    "text": text,
    "dedup": dedup,
    "similarity": similarity,
    "multimodal": multimodal,
    "pipeline": pipeline,
}
CASES = [
    (mod_name, q)
    for mod_name, m in MODULES.items()
    for q in sorted(m.QUERIES)
    if q in m.ORACLES
]
ROWS_ONLY = [
    (mod_name, q)
    for mod_name, m in MODULES.items()
    for q in sorted(m.QUERIES)
    if q not in m.ORACLES
]


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("mod_name,name", CASES)
def test_llmdata_oracle(spark, sf_dir, con, mod_name, name):
    m = MODULES[mod_name]
    compare(m.QUERIES[name](spark, sf_dir), con, m.ORACLES[name], name)


@pytest.mark.parametrize("mod_name,name", ROWS_ONLY)
def test_llmdata_rows_only(spark, sf_dir, mod_name, name):
    """No SQL oracle: check the query runs and has a stable, nonempty shape."""
    df = MODULES[mod_name].QUERIES[name](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0
