"""Registry-contract invariants (driver-facing guarantees).

The external harness checks only the first 50 registry entries, compares
at the pandas level (Decimal reprs mismatch, array cells crash its
canonicalizer), and needs an oracle per query. These tests pin those
contracts so a future operator can't silently regress them.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

from sample_for_transactional_datalake_using_s3tables_spark.operators import (
    _MODULES,
    _PRIORITY,
    all_oracles,
    all_queries,
)

from .conftest import SF_DIR_SMALL


def test_every_query_has_an_oracle():
    qs, os_ = all_queries(), all_oracles()
    assert set(qs) == set(os_)


def test_priority_window_covers_every_module():
    qs = all_queries()
    window = set(list(qs)[:50])
    assert window == set(_PRIORITY)
    for m in _MODULES:
        assert m.QUERIES.keys() & window, f"{m.__name__} has no driver-checked query"


def test_output_schemas_are_canonicalizable(spark):
    """No DecimalType / array / map / struct in any final projection --
    the exact types that broke the round-1 harness comparison."""
    qs = all_queries()
    for name, fn in qs.items():
        schema = fn(spark, SF_DIR_SMALL).schema
        for f in schema.fields:
            assert not isinstance(
                f.dataType, (DecimalType, ArrayType, MapType, StructType)
            ), f"{name}.{f.name} outputs {f.dataType} (harness-hostile type)"
