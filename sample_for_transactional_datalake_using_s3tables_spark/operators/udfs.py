"""User-defined function surface: pandas UDF, applyInPandas, Python UDTF.

The reference keeps all custom logic OUTSIDE its query engine (Python
lambdas around Athena, SURVEY 2.6); our engine exposes Spark's in-engine
UDF surface instead, with the container's guidance baked in: Arrow-
batched pandas UDFs only, never row-at-a-time Python UDFs in a hot path.

Portability notes for the oracles: per-group min/max of doubles are
exact, and the min-max scaling divides two identically-computed doubles
(single IEEE ops -> bitwise identical cross-engine). The vector-norm
UDF works on exact quantized int64 (arbitrary-precision Python ints ==
the engines' int64 sums).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.vectors import QUANTIZE_SQL, quantize
from ..sources.testdata import load_table, spread


def _minmax_scale_group(pdf):
    import pandas as pd

    lo, hi = pdf["value"].min(), pdf["value"].max()
    scaled = (
        (pdf["value"] - lo) / (hi - lo)
        if hi > lo
        else pd.Series([0.0] * len(pdf), index=pdf.index)
    )
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "value": pdf["value"],
            "value_scaled": scaled.astype("float64"),
        }
    )


def udf_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped-map pandas UDF): min-max scale values
    within each event_type group. The groupBy shuffles once; each group
    arrives as one Arrow batch."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return events.groupBy("event_type").applyInPandas(
        _minmax_scale_group,
        "event_id long, event_type string, value double, value_scaled double",
    )


UDF_MINMAX_SCALE_SQL = """
SELECT event_id, event_type, value,
       CASE WHEN MAX(value) OVER w > MIN(value) OVER w
            THEN (value - MIN(value) OVER w) / (MAX(value) OVER w - MIN(value) OVER w)
            ELSE 0.0 END AS value_scaled
FROM events
WINDOW w AS (PARTITION BY event_type)
"""


def _norm_batches(it: "Iterator[pd.Series]") -> "Iterator[pd.Series]":
    """Scalar-iterator pandas UDF body: exact int64 norm² via Python
    arbitrary-precision ints (matches the engines' exact int sums)."""
    for qv in it:
        yield pd.Series([sum(int(x) * int(x) for x in v) for v in qv], dtype="int64")


def udf_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas_udf (scalar iterator) over quantized embedding vectors."""
    norm2 = F.pandas_udf(_norm_batches, "long")
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    q = emb.select("vec_id", quantize("embedding").alias("qv"))
    return q.select(
        "vec_id",
        norm2(F.col("qv")).alias("norm2"),
        F.sqrt(norm2(F.col("qv")).cast("double")).alias("norm"),
    )


UDF_VECTOR_NORM_SQL = f"""
WITH q AS (SELECT vec_id, {QUANTIZE_SQL.format(v='embedding')} AS qv FROM embeddings)
SELECT vec_id,
       CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS norm2,
       sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) AS norm
FROM q
"""


def udf_tokenize_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one row per (position, token) of each document.
    (Lateral table functions -- the UDTF API surface; the set-returning
    logic itself is trivial.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):  # noqa: ARG002
            for i, w in enumerate(text.lower().split(" "), start=1):
                yield i, w

    spark.udtf.register("tokenize_words", Tokenize)
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.word
        FROM _udtf_docs d, LATERAL tokenize_words(d.doc_id, d.text) t
        """
    )


UDF_TOKENIZE_SQL = """
WITH u AS (
  SELECT doc_id,
         unnest(list_transform(string_split(lower(text), ' '),
                               (x, i) -> {'pos': i, 'word': x})) AS t
  FROM documents
)
SELECT doc_id, CAST(t['pos'] AS INTEGER) AS pos, t['word'] AS word FROM u
"""


QUERIES = {
    "udf_minmax_scale": udf_minmax_scale,
    "udf_vector_norm": udf_vector_norm,
    "udf_tokenize_udtf": udf_tokenize_udtf,
}

ORACLES = {
    "udf_minmax_scale": UDF_MINMAX_SCALE_SQL,
    "udf_vector_norm": UDF_VECTOR_NORM_SQL,
    "udf_tokenize_udtf": UDF_TOKENIZE_SQL,
}


def _sum_ids(v: pd.Series) -> int:
    """Grouped-agg pandas UDF (UDAF) body: exact int64 sum (portable)."""
    return int(v.sum())


def _count_rows(v: pd.Series) -> int:
    return len(v)


def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas_udf as a UDAF inside groupBy().agg() -- Arrow-batched
    custom aggregation alongside built-ins. (The udfs are wrapped lazily:
    the decorator needs an active session; Series -> scalar type hints
    select the grouped-agg flavor.)"""
    sum_ids = F.pandas_udf(_sum_ids, "long")
    count_rows = F.pandas_udf(_count_rows, "long")
    events = load_table(spark, sf_dir, "events")
    # NB: grouped-agg pandas UDFs cannot mix with built-in aggregates in
    # one agg() -- both aggregates here are pandas UDAFs.
    return events.groupBy("event_type").agg(
        sum_ids(F.col("user_id")).alias("sum_user_ids"),
        count_rows(F.col("user_id")).alias("n_events"),
    )


UDF_GROUPED_AGG_SQL = """
SELECT event_type, CAST(SUM(user_id) AS BIGINT) AS sum_user_ids, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""

QUERIES["udf_grouped_agg"] = udf_grouped_agg
ORACLES["udf_grouped_agg"] = UDF_GROUPED_AGG_SQL
