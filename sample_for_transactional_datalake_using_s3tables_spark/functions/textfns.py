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

# Spark-SQL twin of :func:`tokens` for expr-string builders (a single
# space is a literal under both engines' split semantics).
TOKENS_SPARK_SQL = "split(lower({col}), ' ')"


def shingles(tok: Column | str, n: int = 3) -> Column:
    """n-gram (word) shingles as strings; empty array if < n tokens.

    String input builds the identical plan via one JVM-parsed
    expression (see token_hashes: py4j lambda construction cost)."""
    if isinstance(tok, str):
        return F.expr(
            f"CASE WHEN size({tok}) >= {n} THEN"
            f" transform(sequence(1, size({tok}) - {n - 1}),"
            f" i -> concat_ws(' ', slice({tok}, i, {n})))"
            " ELSE CAST(array() AS array<string>) END"
        )
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


# Integer shingle hashing: instead of building each n-gram as a STRING
# and md5-ing it (allocation-heavy -- it dominated the whole MinHash
# pipeline), hash each TOKEN once (30-bit md5 prefix) and combine n
# consecutive token hashes with a rolling polynomial mod a Mersenne
# prime. All arithmetic stays exact in int64 on both engines:
# h < 2^31, SHINGLE_A < 2^20 => every intermediate product < 2^51.
# Two distinct shingles collide with probability ~2^-31 -- immaterial
# for candidate generation and Jaccard estimation, and both engines
# compute the identical value so oracle hash-matching is unaffected.
SHINGLE_P = 2147483647  # 2^31 - 1
SHINGLE_A = 1000003  # prime multiplier

_H30_MASK = (1 << 30) - 1


def token_hashes(tok: Column | str) -> Column:
    """30-bit md5-derived hash per token (the only string hashing the
    shingle pipeline performs -- one md5 per token, not per shingle).

    Pass a column NAME (or SQL fragment) to build via one JVM-parsed
    expression string: constructing higher-order lambdas through py4j
    costs ~100 ms PER LAMBDA in driver round trips (optimization r13 --
    the minhash pipeline's Column-built lambdas alone were 1.4+ s of
    every call's wall; the expr-string build is ~0.07 s). The Column
    form is kept for composed callers; both yield the same plan."""
    if isinstance(tok, str):
        return F.expr(
            f"transform({tok}, t -> CAST(conv(substring(md5(t), 1, 15),"
            f" 16, 10) AS BIGINT) & {_H30_MASK})"
        )
    return F.transform(
        tok,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
        .cast("bigint")
        .bitwiseAND(F.lit(_H30_MASK)),
    )


TOKEN_HASHES_SQL = (
    "list_transform({tok}, t -> "
    f"CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) & {_H30_MASK})"
)


def hashed_shingles(ht: Column | str, n: int = 3) -> Column:
    """n-gram shingle hashes from a token-hash array: rolling polynomial
    ``((h1*A + h2) % P * A + h3) % P`` over ``zip_with`` of shifted
    slices. Each slice references ``ht`` once PER ROW (an indexed
    ``transform(sequence(...), i -> ht[i])`` formulation would re-evaluate
    the token-hash expression per ELEMENT when Catalyst collapses
    projections -- measured 25x slower). Empty array if < n tokens.

    String input builds the identical plan via one JVM-parsed
    expression (see token_hashes: py4j lambda construction cost)."""
    if isinstance(ht, str):
        m = f"greatest(size({ht}) - {n - 1}, 0)"
        acc = f"slice({ht}, 1, {m})"
        for j in range(2, n + 1):
            acc = (
                f"zip_with({acc}, slice({ht}, {j}, {m}),"
                f" (a, b) -> (a * {SHINGLE_A} + b) % {SHINGLE_P})"
            )
        return F.expr(
            f"CASE WHEN size({ht}) >= {n} THEN {acc}"
            " ELSE CAST(array() AS array<bigint>) END"
        )
    sz = F.size(ht)
    m = F.greatest(sz - (n - 1), F.lit(0))
    acc = F.slice(ht, 1, m)
    for j in range(2, n + 1):
        acc = F.zip_with(
            acc,
            F.slice(ht, j, m),
            lambda a, b: (a * F.lit(SHINGLE_A) + b) % F.lit(SHINGLE_P),
        )
    return F.when(sz >= n, acc).otherwise(F.array().cast("array<bigint>"))


def hashed_shingles_sql(ht_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`hashed_shingles` (1-based list indexing;
    DuckDB evaluates each CTE column once per row, so the indexed form
    is safe there)."""
    poly = f"({ht_expr})[i]"
    for j in range(1, n):
        poly = f"({poly} * {SHINGLE_A} + ({ht_expr})[i + {j}]) % {SHINGLE_P}"
    return (
        f"CASE WHEN len({ht_expr}) >= {n} THEN "
        f"list_transform(range(1, len({ht_expr}) - {n - 2}), i -> {poly}) "
        f"ELSE [] END"
    )
