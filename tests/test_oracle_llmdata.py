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


def test_llmdata_every_query_is_oracle_certified():
    """Since round 7 every llm-data query carries a DuckDB oracle
    (text_bpe_train_encode was the last rows-only holdout); a new query
    landing without one should trip this, not silently weaken the gate."""
    assert ROWS_ONLY == []
