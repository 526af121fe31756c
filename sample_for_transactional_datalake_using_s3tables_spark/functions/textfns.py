"""Portable text/hash primitives shared by the LLM-data operators.

Everything here must produce *bitwise-identical* results in Spark and in
the DuckDB oracle, so the correctness harness can hash-match:

- Hashing goes through md5 (both engines implement the same md5) and a
  15-hex-digit prefix parsed as int64 (< 2^60, no sign issues). Spark's
  ``hash()``/``xxhash64`` and DuckDB's ``hash()`` are different
  algorithms, so they are never used in checked outputs.
- Ratios are computed as exact-int divisions in double (single IEEE op,
  identical on both sides). Sums of doubles are never compared.

The Spark side is pure Column expressions (JVM, codegen) -- no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Basic English stopword list used by the quality/langid heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


def md5_int(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint (portable hash)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_int_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_int`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text (keeps duplicates)."""
    return F.split(F.lower(col), " ")


TOKENS_SQL = "string_split(lower({col}), ' ')"


def shingles(tok: Column, n: int = 3) -> Column:
    """n-gram (word) shingles as strings; empty array if < n tokens."""
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tok, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(tok_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (1-based inclusive list slicing)."""
    return (
        f"CASE WHEN len({tok_expr}) >= {n} THEN "
        f"list_transform(range(1, len({tok_expr}) - {n - 2}), "
        f"i -> array_to_string(({tok_expr})[i : i + {n - 1}], ' ')) "
        f"ELSE [] END"
    )
