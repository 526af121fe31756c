"""Portable vector primitives for similarity/dedup over embeddings.

Cross-engine exactness strategy: float components are quantized to
int64 (``floor(x * 1e6)``, identical IEEE double ops in both engines),
dot products and squared norms are exact int64 sums (64-dim, |q| <= 1e6
=> |dot| <= 6.4e13, exactly representable), and cosine is assembled
from those exact ints with correctly-rounded double sqrt/div -- so the
resulting doubles are **bitwise identical** in Spark and DuckDB.

DuckDB's ``list_cosine_similarity`` accumulates in float32 and is NOT
parity-safe; the SQL twins below are used instead.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column

SCALE = 1_000_000


def quantize(col: Column | str) -> Column:
    """array<float> -> array<bigint> fixed-point at 1e-6 resolution.

    A column-name string builds the identical plan via one JVM-parsed
    expression (py4j lambda construction costs ~100 ms per lambda --
    optimization r13, see textfns.token_hashes)."""
    if isinstance(col, str):
        return F.expr(
            f"transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE})"
            " AS BIGINT))"
        )
    return F.transform(col, lambda x: F.floor(x.cast("double") * SCALE).cast("bigint"))


QUANTIZE_SQL = (
    "list_transform({v}, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
)


def dot_int(a: Column | str, b: Column | str) -> Column:
    """Exact int64 dot product of two quantized vectors. String inputs
    (column names or SQL fragments) build via one JVM-parsed expression
    -- the Column-lambda form costs two py4j lambda constructions per
    call (see quantize)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def dot_int_sql(a: str, b: str, dim: int = 64) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> ({a})[i] * ({b})[i])) AS BIGINT)"
    )


def cosine_from_ints(dot: Column, na2: Column, nb2: Column) -> Column:
    """Cosine as double from exact int dot/norms (bitwise portable)."""
    return dot.cast("double") / (
        F.sqrt(na2.cast("double")) * F.sqrt(nb2.cast("double"))
    )


def cosine_from_ints_sql(dot: str, na2: str, nb2: str) -> str:
    return (
        f"CAST({dot} AS DOUBLE) / "
        f"(sqrt(CAST({na2} AS DOUBLE)) * sqrt(CAST({nb2} AS DOUBLE)))"
    )


def hyperplanes(n_tables: int, n_bits: int, dim: int = 64) -> list[list[list[int]]]:
    """Deterministic random hyperplanes for sign-LSH, derived from md5 so
    the DuckDB oracle can embed the *same* planes as literals.

    ``H[t][b][d] = (md5int(f"{t}:{b}:{d}") % 2001) - 1000``
    """
    out = []
    for t in range(n_tables):
        planes = []
        for b in range(n_bits):
            planes.append(
                [
                    (int(hashlib.md5(f"{t}:{b}:{d}".encode()).hexdigest()[:15], 16) % 2001)
                    - 1000
                    for d in range(dim)
                ]
            )
        out.append(planes)
    return out
