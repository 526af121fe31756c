"""End-to-end training-data curation pipeline as one composed query.

The individual stages exist as standalone operators (text.quality_score,
dedup.dedup_exact, sampling.sample_bernoulli, text.chunk); this module
chains them the way a production corpus build does --

    quality filter -> exact dedup (keep min doc_id per content hash)
    -> deterministic ~50% sample -> context-window chunking
    -> per-(lang, source) corpus stats

-- demonstrating that the engine's operators compose into a single lazy
plan Catalyst optimizes end-to-end (the quality filter prunes before the
dedup shuffle; chunking explodes only sampled survivors). Stage order is
part of the semantics: dedup runs on quality survivors, sampling on
dedup survivors. The stage expressions and thresholds are IMPORTED from
the standalone operators (text.quality_stat_cols / QUALITY_* /
chunk_starts), so a change there changes this pipeline identically.

Scale: one shuffle for the content-hash window, one for the final
aggregate; the chunk explode multiplies only the sampled subset. All
decisions key off portable md5-derived values (functions/textfns), so
the DuckDB oracle replays the identical pipeline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.textfns import (
    TOKENS_SPARK_SQL,
    TOKENS_SQL,
    md5_int,
    md5_int_sql,
)
from ..sources.testdata import load_table, spread
from .text import (
    _STOP_LIST_SQL,
    CHUNK_SIZE,
    CHUNK_STRIDE,
    QUALITY_MAX_STOP_RATIO,
    QUALITY_MIN_DISTINCT_RATIO,
    QUALITY_MIN_TOKENS,
    chunk_starts,
    quality_stat_cols,
)

_SAMPLE_PCT = 50


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    d = docs.select(
        "doc_id", "lang", "source", "text",
        *quality_stat_cols(TOKENS_SPARK_SQL.format(col="text")),
    )
    ok = d.where(
        (F.col("n_tokens") >= QUALITY_MIN_TOKENS)
        & (F.col("n_distinct") / F.col("n_tokens") >= QUALITY_MIN_DISTINCT_RATIO)
        & (F.col("n_stop") / F.col("n_tokens") <= QUALITY_MAX_STOP_RATIO)
    )
    w = Window.partitionBy(F.md5("text"))
    kept = ok.withColumn("_min_id", F.min("doc_id").over(w)).where(
        F.col("doc_id") == F.col("_min_id")
    )
    sampled = kept.where(
        md5_int(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 100
        < _SAMPLE_PCT
    )
    chunks = sampled.select(
        "doc_id", "lang", "source", "text", F.explode(chunk_starts()).alias("cs")
    ).select(
        "doc_id",
        "lang",
        "source",
        F.substring(F.col("text"), F.col("cs"), F.lit(CHUNK_SIZE)).alias("chunk_text"),
    )
    return chunks.groupBy("lang", "source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_chunks"),
        F.sum(F.size(F.split(F.col("chunk_text"), " "))).cast("bigint").alias(
            "total_chunk_tokens"
        ),
    )


def _curation_sql() -> str:
    t = TOKENS_SQL.format(col="text")
    skey = md5_int_sql("'sample:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH d AS (
  SELECT doc_id, lang, source, text,
         CAST(len({t}) AS INTEGER) AS n_tokens,
         CAST(len(list_distinct({t})) AS INTEGER) AS n_distinct,
         CAST(len(list_filter({t}, x -> list_contains({_STOP_LIST_SQL}, x)))
              AS INTEGER) AS n_stop
  FROM documents
),
ok AS (
  SELECT * FROM d
  WHERE n_tokens >= {QUALITY_MIN_TOKENS}
    AND n_distinct / n_tokens >= {QUALITY_MIN_DISTINCT_RATIO}
    AND n_stop / n_tokens <= {QUALITY_MAX_STOP_RATIO}
),
kept AS (
  SELECT * FROM ok
  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
),
sampled AS (
  SELECT * FROM kept WHERE {skey} % 100 < {_SAMPLE_PCT}
),
chunks AS (
  SELECT doc_id, lang, source,
         substr(text, CAST(cs AS INTEGER), {CHUNK_SIZE}) AS chunk_text
  FROM sampled,
       unnest(generate_series(1, greatest(1, CAST(length(text) AS BIGINT)),
                              {CHUNK_STRIDE})) AS u(cs)
)
SELECT lang, source,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_chunks,
       CAST(SUM(len(string_split(chunk_text, ' '))) AS BIGINT)
         AS total_chunk_tokens
FROM chunks
GROUP BY lang, source
"""


PACK_CAPACITY = 512  # context-window token budget per pack


def _pack_group(pdf):
    """Sequential next-fit over one source's docs (doc_id order): a doc
    joins the current pack if it fits, else opens the next pack. Runs
    on a single Arrow batch; state is two ints."""
    import pandas as pd

    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    pack_ids = []
    pack_id, fill = 0, 0
    first = True
    for tok in pdf["n_tokens"]:
        if first:
            fill = tok
            first = False
        elif fill + tok <= PACK_CAPACITY:
            fill += tok
        else:
            pack_id += 1
            fill = tok
        pack_ids.append(pack_id)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "source": pdf["source"],
            "n_tokens": pdf["n_tokens"],
            "pack_id": pd.Series(pack_ids, dtype="int64"),
        }
    )


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: greedy next-fit assignment of documents into
    fixed 512-token context windows, per source, in doc_id order -- the
    standard LLM-pretraining batch-packing step (oversized docs get a
    pack of their own; packing never reorders, so data ordering
    contracts survive).

    Next-fit is inherently sequential per group, so this is the
    documented applyInPandas seam: token counts are computed JVM-side
    (column-pruned, codegen); only (doc_id, source, n_tokens) crosses
    into Arrow, and the Python loop carries two ints of state. At 100 TB
    the group key becomes (source, shard) with shard = a stable hash of
    doc_id ranges, bounding every Arrow batch while keeping the per-shard
    ordering contract; the assignment semantics are unchanged.

    The DuckDB oracle replays the identical recurrence as a recursive
    CTE -- a genuinely sequential spec, so the oracle is the semantics,
    not a re-implementation shortcut."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id",
        "source",
        F.expr(
            f"CAST(size({TOKENS_SPARK_SQL.format(col='text')}) AS BIGINT)"
            " AS n_tokens"
        ),
    )
    return toks.groupBy("source").applyInPandas(
        _pack_group, "doc_id long, source string, n_tokens long, pack_id long"
    )


def _sequence_pack_sql() -> str:
    t = TOKENS_SQL.format(col="text")
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id, source, CAST(len({t}) AS BIGINT) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
p AS (
  SELECT doc_id, source, n_tokens, rn,
         CAST(0 AS BIGINT) AS pack_id, n_tokens AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.doc_id, t.source, t.n_tokens, t.rn,
         CASE WHEN p.fill + t.n_tokens <= {PACK_CAPACITY}
              THEN p.pack_id ELSE p.pack_id + 1 END,
         CASE WHEN p.fill + t.n_tokens <= {PACK_CAPACITY}
              THEN p.fill + t.n_tokens ELSE t.n_tokens END
  FROM p JOIN t ON t.source = p.source AND t.rn = p.rn + 1
)
SELECT doc_id, source, n_tokens, pack_id FROM p
"""


QUERIES = {
    "curation_pipeline": curation_pipeline,
    "sequence_pack": sequence_pack,
}
ORACLES = {
    "curation_pipeline": _curation_sql(),
    "sequence_pack": _sequence_pack_sql(),
}
