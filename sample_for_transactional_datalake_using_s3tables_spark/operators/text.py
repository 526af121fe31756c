"""Text-analysis operators for LLM training-data pipelines.

Not present in the reference (its only text handling is JSON field
shuffling in the ingest lambdas, reference lambda/transform/index.py:20-47);
these are the north-star extensions (BASELINE.json) -- language ID,
quality scoring, token counting, document fingerprinting -- expressed as
pure Column expressions (JVM codegen, no Python UDFs) over ``documents``.

Scale: every operator is embarrassingly parallel over rows (no shuffle
except final aggregates); at 100 TB the scans stay pruned to the
``text`` column and whole-stage codegen keeps it JVM-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.textfns import STOPWORDS, TOKENS_SQL, shingles, shingles_sql, tokens
from ..sources.testdata import load_table, spread

_STOP_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

# language -> marker words (tiny stopword-profile language ID heuristic).
MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "et", "un", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "y", "que", "es"),
}


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, char length,
    plus a BPE-ish subword proxy (ceil of chars/4 per token)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toked = docs.select(
        "doc_id", F.length("text").alias("_len"), tokens(F.col("text")).alias("tok")
    )
    tok = F.col("tok")
    return toked.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_distinct_tokens"),
        F.col("_len").alias("n_chars_text"),
        F.aggregate(
            tok,
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("bigint"),
        ).alias("n_subwords"),
    )


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       CAST(len({TOKENS_SQL.format(col='text')}) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct({TOKENS_SQL.format(col='text')})) AS INTEGER) AS n_distinct_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_text,
       COALESCE(CAST(list_sum(list_transform({TOKENS_SQL.format(col='text')},
                               t -> CAST(ceil(length(t) / 4) AS BIGINT))) AS BIGINT),
                0) AS n_subwords
FROM documents
"""


# Quality thresholds shared with the composed curation pipeline
# (operators/pipeline.py): "ok" <=> none of the three conditions trips.
QUALITY_MIN_TOKENS = 5
QUALITY_MIN_DISTINCT_RATIO = 0.3
QUALITY_MAX_STOP_RATIO = 0.5


def quality_stat_cols(tok) -> list:
    """The three per-document counters the quality grade derives from.

    A SQL-fragment string builds the identical plan via JVM-parsed
    expressions instead of a py4j ``filter`` lambda (~100 ms of driver
    wall per lambda -- optimization r13/r14 pattern, see
    textfns.shingles)."""
    if isinstance(tok, str):
        stop = ", ".join(f"'{w}'" for w in STOPWORDS)
        return [
            F.expr(f"size({tok})").alias("n_tokens"),
            F.expr(f"size(array_distinct({tok}))").alias("n_distinct"),
            F.expr(f"size(filter({tok}, t -> t IN ({stop})))").alias(
                "n_stop"
            ),
        ]
    return [
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_distinct"),
        F.size(F.filter(tok, lambda t: t.isin(*STOPWORDS))).alias("n_stop"),
    ]


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: distinct-token ratio and stopword ratio
    (exact-int divisions -> portable doubles), bucketed into a grade."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    d = toked.select("doc_id", *quality_stat_cols("tok"))
    distinct_ratio = F.col("n_distinct") / F.col("n_tokens")
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    return d.select(
        "doc_id",
        "n_tokens",
        distinct_ratio.alias("distinct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        F.when(F.col("n_tokens") < QUALITY_MIN_TOKENS, "too_short")
        .when(distinct_ratio < QUALITY_MIN_DISTINCT_RATIO, "repetitive")
        .when(stop_ratio > QUALITY_MAX_STOP_RATIO, "boilerplate")
        .otherwise("ok")
        .alias("quality_grade"),
    )


QUALITY_SCORE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len({TOKENS_SQL.format(col='text')}) AS INTEGER) AS n_tokens,
         CAST(len(list_distinct({TOKENS_SQL.format(col='text')})) AS INTEGER) AS n_distinct,
         CAST(len(list_filter({TOKENS_SQL.format(col='text')},
                              t -> list_contains({_STOP_LIST_SQL}, t))) AS INTEGER) AS n_stop
  FROM documents
)
SELECT doc_id, n_tokens,
       n_distinct / n_tokens AS distinct_ratio,
       n_stop / n_tokens AS stopword_ratio,
       CASE WHEN n_tokens < 5 THEN 'too_short'
            WHEN n_distinct / n_tokens < 0.3 THEN 'repetitive'
            WHEN n_stop / n_tokens > 0.5 THEN 'boilerplate'
            ELSE 'ok' END AS quality_grade
FROM d
"""


def _marker_hit(ws: tuple[str, ...]):
    # single-arg lambda (a two-param lambda would receive (element, index))
    return lambda t: t.isin(*ws)


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: count per-language marker hits, argmax
    with deterministic tie-break (marker order en > fr > de > es)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toked = docs.select("doc_id", "lang", tokens(F.col("text")).alias("tok"))
    tok = F.col("tok")
    d = toked.select(
        "doc_id",
        "lang",
        *[
            F.size(F.filter(tok, _marker_hit(ws))).alias(f"hits_{lg}")
            for lg, ws in MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in MARKERS])
    pred = F.when(best == 0, "und")
    for lg in MARKERS:  # first language reaching the max wins (stable)
        pred = pred.when(F.col(f"hits_{lg}") == best, lg)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.alias("marker_hits"),
    )


def _lang_id_sql() -> str:
    hit_cols = ",\n         ".join(
        f"CAST(len(list_filter({TOKENS_SQL.format(col='text')}, "
        f"t -> list_contains([{', '.join(repr(w) for w in ws)}], t))) AS INTEGER) AS hits_{lg}"
        for lg, ws in MARKERS.items()
    )
    best = "GREATEST(" + ", ".join(f"hits_{lg}" for lg in MARKERS) + ")"
    chain = " ".join(f"WHEN hits_{lg} = {best} THEN '{lg}'" for lg in MARKERS)
    return f"""
WITH d AS (
  SELECT doc_id, lang,
         {hit_cols}
  FROM documents
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN {best} = 0 THEN 'und' {chain} END AS predicted_lang,
       {best} AS marker_hits
FROM d
"""


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-collision document fingerprint: md5 over the sorted distinct
    token set. Grouping by it clusters bag-of-words-identical docs."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    fp = F.md5(F.array_join(F.sort_array(F.array_distinct(tokens(F.col("text")))), " "))
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("representative_doc"))
    )


FINGERPRINT_SQL = f"""
SELECT md5(array_to_string(list_sort(list_distinct({TOKENS_SQL.format(col='text')})), ' ')) AS fingerprint,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS representative_doc
FROM documents
GROUP BY 1
"""


# Polynomial rolling hash: base/modulus sized so every intermediate fits
# int64 on both engines (acc < P < 2^31, acc*B + h30 < 2^38).
ROLL_B = 131
ROLL_P = 2147483647


def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    the token *sequence* (complements ``text_fingerprint``'s order-free
    bag-of-words md5). Same left fold on both engines:
    ``acc -> (acc*B + h30(token)) mod P``; grouping clusters documents
    with identical token sequences. Pure Column expressions, no shuffle
    beyond the final aggregate."""
    from ..functions.textfns import md5_int

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    h30 = F.transform(
        F.col("tok"), lambda t: md5_int(t).bitwiseAND(F.lit((1 << 30) - 1))
    )
    roll = F.aggregate(
        h30,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * F.lit(ROLL_B) + h) % F.lit(ROLL_P),
    )
    return (
        toked.select("doc_id", roll.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("representative_doc"))
    )


def _rolling_fingerprint_sql() -> str:
    from ..functions.textfns import md5_int_sql

    tok = TOKENS_SQL.format(col="text")
    h30 = f"list_transform({tok}, t -> {md5_int_sql('t')} & {(1 << 30) - 1})"
    roll = (
        f"CASE WHEN len({tok}) = 0 THEN 0 ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {h30}), "
        f"(acc, h) -> (acc * {ROLL_B} + h) % {ROLL_P}) END"
    )
    return f"""
SELECT {roll} AS fingerprint,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS representative_doc
FROM documents
GROUP BY 1
"""


# Context-window chunking: 200-char chunks, 150-char stride (50 overlap).
CHUNK_SIZE = 200
CHUNK_STRIDE = 150


def chunk_starts():
    """1-based chunk start offsets for the ``text`` column (every doc
    yields at least one start, so empty docs still produce one row)."""
    return F.sequence(
        F.lit(1), F.greatest(F.lit(1), F.length("text")), F.lit(CHUNK_STRIDE)
    )


def chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks (the
    standard pre-tokenization step for context-window-bounded training).

    Chunk starts are a ``sequence`` (JVM codegen) + ``posexplode`` --
    embarrassingly parallel, no shuffle, output rows ~ len/stride per
    doc. chunk_id comes from the start offset arithmetic so both engines
    derive it identically without ordinality functions.
    """
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    exploded = docs.select(
        "doc_id", "text", F.explode(chunk_starts()).alias("chunk_start")
    )
    return exploded.select(
        "doc_id",
        ((F.col("chunk_start") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_id"),
        "chunk_start",
        F.substring(F.col("text"), F.col("chunk_start"), F.lit(CHUNK_SIZE)).alias(
            "chunk_text"
        ),
        F.length(
            F.substring(F.col("text"), F.col("chunk_start"), F.lit(CHUNK_SIZE))
        ).alias("n_chars"),
    )


CHUNK_SQL = f"""
WITH s AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(1, CAST(length(text) AS BIGINT)),
                                {CHUNK_STRIDE})) AS chunk_start
  FROM documents
)
SELECT doc_id,
       CAST((chunk_start - 1) / {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
       CAST(chunk_start AS INTEGER) AS chunk_start,
       substr(text, CAST(chunk_start AS INTEGER), {CHUNK_SIZE}) AS chunk_text,
       CAST(length(substr(text, CAST(chunk_start AS INTEGER), {CHUNK_SIZE}))
            AS INTEGER) AS n_chars
FROM s
"""

_NGRAM_MIN_DF = 5


def ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram statistics: document frequency + total occurrences
    of word bigrams appearing in >= 5 documents (the df table behind
    IDF weighting / contamination checks). Shuffles once on the ngram;
    at 100 TB the HAVING keeps the hot tail out of the result and the
    partial aggregation combines map-side."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    from ..functions.textfns import shingles

    ng = toked.select("doc_id", F.explode(shingles("tok", 2)).alias("ngram"))
    return (
        ng.groupBy("ngram")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.count("*").alias("total_count"),
        )
        .where(F.col("doc_freq") >= _NGRAM_MIN_DF)
    )


def _ngram_freq_sql() -> str:
    from ..functions.textfns import shingles_sql

    sh = shingles_sql(TOKENS_SQL.format(col="text"), 2)
    return f"""
WITH u AS (
  SELECT doc_id, unnest({sh}) AS ngram FROM documents
)
SELECT ngram, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS total_count
FROM u GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= {_NGRAM_MIN_DF}
"""


_DECONTAM_RATIO = 0.5


def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage scan: for every test-split document, the fraction of
    its distinct 3-gram shingles that also occur anywhere in the train
    split; ratio >= 0.5 flags the document as contaminated (it -- or a
    near-copy -- leaked across the split boundary).

    The split assignment is the SAME hash partitioning as
    ``dataset_split`` (sampling.split_col), so the scan certifies the
    actual split a pipeline would train on. Scale shape: the train side
    reduces to a distinct shingle set (shuffle of 16-byte-ish strings,
    map-side combine), the test side left-joins it on the shingle --
    both linear; no document pair is ever materialized, unlike pairwise
    dedup. The left join keeps shingle-free/overlap-free test docs with
    n_overlap = 0.
    """
    from .sampling import split_col

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toked = docs.select(
        "doc_id", split_col().alias("split"), tokens(F.col("text")).alias("tok")
    )
    sh = toked.select(
        "doc_id", "split", F.array_distinct(shingles("tok")).alias("sh")
    )
    train_sh = (
        sh.filter(F.col("split") == "train")
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    test_sh = sh.filter(F.col("split") == "test").select(
        "doc_id", F.size("sh").alias("n_shingles"), F.explode_outer("sh").alias("shingle")
    )
    matched = test_sh.join(
        train_sh.withColumn("_hit", F.lit(1)), "shingle", "left"
    )
    per_doc = matched.groupBy("doc_id", "n_shingles").agg(
        F.count("_hit").alias("n_overlap")
    )
    ratio = F.when(
        F.col("n_shingles") > 0, F.col("n_overlap") / F.col("n_shingles")
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        ratio.alias("overlap_ratio"),
        (ratio >= _DECONTAM_RATIO).alias("contaminated"),
    )


def _decontamination_sql() -> str:
    from .sampling import split_case_sql

    sh = f"list_distinct({shingles_sql(TOKENS_SQL.format(col='text'))})"
    return f"""
WITH d AS (
  SELECT doc_id, {split_case_sql()} AS split, {sh} AS sh FROM documents
),
train_sh AS (
  SELECT DISTINCT unnest(sh) AS shingle FROM d WHERE split = 'train'
),
test_sh AS (
  SELECT doc_id, CAST(len(sh) AS INTEGER) AS n_shingles,
         unnest(CASE WHEN len(sh) = 0 THEN [NULL] ELSE sh END) AS shingle
  FROM d WHERE split = 'test'
),
per_doc AS (
  SELECT t.doc_id, t.n_shingles,
         COUNT(tr.shingle) AS n_overlap
  FROM test_sh t LEFT JOIN train_sh tr USING (shingle)
  GROUP BY t.doc_id, t.n_shingles
)
SELECT doc_id, n_shingles, n_overlap,
       CASE WHEN n_shingles > 0 THEN n_overlap / n_shingles ELSE 0.0 END
         AS overlap_ratio,
       (CASE WHEN n_shingles > 0 THEN n_overlap / n_shingles ELSE 0.0 END)
         >= {_DECONTAM_RATIO} AS contaminated
FROM per_doc
"""


def distinctive_terms(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Per-document distinctive-term extraction (exact-integer TF-IDF):
    rank each document's terms by (term_freq DESC, doc_freq ASC, term
    ASC) and keep the top ``k``. The classic tf*log(N/df) score induces
    exactly this order for fixed tf, and keeping the comparison on exact
    int64 (tf, df) instead of a float score makes the result
    engine-reproducible (floats would hash-differ at ties).

    Scale shape: one (doc_id, term) shuffle for tf, one (term) shuffle
    for df, a term-keyed join of tf against the much smaller df
    aggregate (AQE handles hot stopword-term skew), and a per-doc
    window over <= |doc| rows. No Python, no collect."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    pairs = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = pairs.groupBy("doc_id", "term").agg(F.count("*").alias("term_freq"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("term_freq").desc(), F.col("doc_freq").asc(), F.col("term").asc()
    )
    return (
        tf.join(df_, "term")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "term_freq", "doc_freq", "rnk")
    )


DISTINCTIVE_TERMS_SQL = f"""
WITH pairs AS (
  SELECT doc_id, unnest({TOKENS_SQL.format(col='text')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS term_freq FROM pairs GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term
),
r AS (
  SELECT tf.doc_id, tf.term, tf.term_freq, df.doc_freq,
         CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
              ORDER BY tf.term_freq DESC, df.doc_freq ASC, tf.term ASC)
              AS INTEGER) AS rnk
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, term_freq, doc_freq, rnk FROM r WHERE rnk <= 3
"""


REPETITION_N = 3          # shingle width for the duplicate-n-gram ratio
REPETITION_MAX_DUP = 0.2  # Gopher-style rejection threshold


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter: the fraction of word 3-grams
    that are duplicates of an earlier 3-gram in the same document (the
    Gopher/MassiveText "repetition" signal for boilerplate and looping
    generations). dup_ratio = (n_shingles - n_distinct) / n_shingles,
    an exact-int division; docs above REPETITION_MAX_DUP are flagged.

    Scale shape: pure per-row Column expressions over the pruned
    ``text`` column -- no shuffle, no Python; whole-stage codegen keeps
    the shingle arrays inside the JVM and they never hit the output."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = shingles(tokens(F.col("text")), REPETITION_N)
    d = docs.select(
        "doc_id",
        F.size(sh).alias("n_shingles"),
        F.size(F.array_distinct(sh)).alias("n_distinct_shingles"),
    )
    dup = F.col("n_shingles") - F.col("n_distinct_shingles")
    ratio = F.when(
        F.col("n_shingles") > 0, dup / F.col("n_shingles")
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        "n_shingles",
        "n_distinct_shingles",
        ratio.alias("dup_ratio"),
        (ratio > REPETITION_MAX_DUP).alias("is_repetitive"),
    )


def _repetition_stats_sql() -> str:
    sh = shingles_sql(TOKENS_SQL.format(col="text"), REPETITION_N)
    return f"""
WITH d AS (
  SELECT doc_id,
         CAST(len({sh}) AS INTEGER) AS n_shingles,
         CAST(len(list_distinct({sh})) AS INTEGER) AS n_distinct_shingles
  FROM documents
)
SELECT doc_id, n_shingles, n_distinct_shingles,
       CASE WHEN n_shingles > 0
            THEN (n_shingles - n_distinct_shingles) / n_shingles
            ELSE 0.0 END AS dup_ratio,
       CASE WHEN n_shingles > 0
            THEN (n_shingles - n_distinct_shingles) / n_shingles > {REPETITION_MAX_DUP}
            ELSE FALSE END AS is_repetitive
FROM d
"""


# PII scrubbing patterns (RE2-safe: no lookaround, portable \\b \\d).
# The synthetic corpus contains no real PII, so the denylist terms give
# the operator observable effect while the email/phone/IPv4 patterns
# exercise the exact production seam (swap patterns, same plan).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
DENYLIST_TERMS = ("customer", "spark")
_DENY_RE = r"\b(" + "|".join(DENYLIST_TERMS) + r")\b"


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction: count pattern hits (email / phone / IPv4 /
    denylist terms) per document and emit the scrubbed text's md5 so the
    oracle certifies the exact replacement output without shipping full
    text. Redaction order is fixed (email, phone, ipv4, denylist) so
    overlapping patterns resolve deterministically.

    Scale shape: per-row regexp expressions (JVM codegen, no Python),
    column-pruned scan; at 100 TB this is a map-only pass."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    scrubbed = F.col("text")
    for name, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    scrubbed = F.regexp_replace(scrubbed, _DENY_RE, "<TERM>")
    counts = [
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    return docs.select(
        "doc_id",
        *counts,
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_DENY_RE), 0)).alias(
            "n_denylist"
        ),
        F.md5(scrubbed).alias("scrubbed_md5"),
        (F.md5(scrubbed) != F.md5(F.col("text"))).alias("was_redacted"),
    )


def _pii_redaction_sql() -> str:
    scrub = "text"
    for name, pat in PII_PATTERNS.items():
        scrub = f"regexp_replace({scrub}, '{pat}', '<{name.upper()}>', 'g')"
    scrub = f"regexp_replace({scrub}, '{_DENY_RE}', '<TERM>', 'g')"
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INTEGER) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    return f"""
SELECT doc_id,
       {counts},
       CAST(len(regexp_extract_all(text, '{_DENY_RE}')) AS INTEGER) AS n_denylist,
       md5({scrub}) AS scrubbed_md5,
       md5({scrub}) != md5(text) AS was_redacted
FROM documents
"""


BPE_TOP_PAIRS = 20


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE vocabulary-training kernel: count adjacent character
    pairs across every word occurrence in the corpus and keep the top
    merge candidates (count DESC, pair ASC -- the deterministic order a
    reproducible tokenizer build needs). One iteration of the classic
    merge loop; the full loop re-runs this aggregate on re-segmented
    words.

    Scale shape: explode word occurrences, per-word pair arrays built
    with sequence+substr (row-local, codegen), one (pair) shuffle with
    map-side partial counts, TakeOrdered for the top slice."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    words = docs.select(F.explode(tokens(F.col("text"))).alias("word")).where(
        F.length("word") >= 2
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.substring(F.col("word"), i, F.lit(2)),
            )
        ).alias("pair")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n_occurrences"))
        .withColumn("merge_rank", F.row_number().over(w))
        .where(F.col("merge_rank") <= BPE_TOP_PAIRS)
    )


def _bpe_pair_counts_sql() -> str:
    t = TOKENS_SQL.format(col="text")
    return f"""
WITH words AS (
  SELECT unnest({t}) AS word FROM documents
),
pairs AS (
  SELECT unnest(list_transform(range(1, length(word)),
                               i -> substr(word, CAST(i AS INTEGER), 2))) AS pair
  FROM words WHERE length(word) >= 2
),
counted AS (
  SELECT pair, COUNT(*) AS n_occurrences FROM pairs GROUP BY pair
)
SELECT pair, n_occurrences,
       CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair ASC) AS INTEGER)
         AS merge_rank
FROM counted
QUALIFY merge_rank <= {BPE_TOP_PAIRS}
"""


VOCAB_SIZE = 30


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage analysis: build the top-30 word vocabulary
    from the corpus (count DESC, term ASC cutoff -- deterministic), then
    compute each document's out-of-vocabulary token rate, the signal
    that drives vocab-size choices and flags domain-shifted documents.

    Scale shape: one (term) shuffle for the global counts, a TakeOrdered
    vocabulary slice broadcast back against the token stream (left
    join), and one (doc_id) aggregate. The corpus is shuffled on its
    natural keys only."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("n"))
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= VOCAB_SIZE)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce("in_vocab", F.lit(0))).cast("bigint").alias("n_in_vocab"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_in_vocab",
            (
                (F.col("n_tokens") - F.col("n_in_vocab")) / F.col("n_tokens")
            ).alias("oov_rate"),
        )
    )


def _vocab_coverage_sql() -> str:
    t = TOKENS_SQL.format(col="text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({t}) AS term FROM documents
),
vocab AS (
  SELECT term, 1 AS in_vocab
  FROM (SELECT term, COUNT(*) AS n FROM toks GROUP BY term)
  QUALIFY ROW_NUMBER() OVER (ORDER BY n DESC, term ASC) <= {VOCAB_SIZE}
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(COALESCE(in_vocab, 0)) AS BIGINT) AS n_in_vocab,
       (COUNT(*) - CAST(SUM(COALESCE(in_vocab, 0)) AS BIGINT)) / COUNT(*)
         AS oov_rate
FROM toks LEFT JOIN vocab USING (term)
GROUP BY doc_id
"""


# -- full BPE tokenizer training + corpus encoding --

BPE_MERGES = 40
BPE_WORD_CAP = 50_000  # driver-side word-frequency table bound


def _bpe_learn(
    wordfreq: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The classic BPE merge loop over a word-frequency table
    (Sennrich et al. 2016; HF tokenizers train from word counts the
    same way): each step merges the most frequent adjacent symbol pair
    (ties broken lexicographically for a reproducible vocabulary).
    Driver-side and bounded: cost is O(n_merges x vocab), independent
    of corpus size."""
    seqs: dict[str, tuple] = {w: tuple(w) for w, _ in wordfreq}
    freqs = dict(wordfreq)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, syms in seqs.items():
            if a not in syms:
                continue
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def _bpe_apply(word: str, merges: list[tuple[str, str]]) -> int:
    """Token count of ``word`` under the learned merge list (applied
    in training order, the standard encoder)."""
    syms = list(word)
    for a, b in merges:
        if a not in syms:
            continue
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def bpe_train_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE tokenizer training + corpus encoding (the step up from
    ``text_bpe_pairs``' single iteration): distributed word counts ->
    bounded driver-side merge loop (the industry-standard
    train-from-word-counts shape; the word-frequency table is capped,
    never the corpus) -> distributed encode where the Python work runs
    over the DISTINCT-WORD dictionary only and per-document token
    counts come from a dictionary join against the exploded corpus
    (broadcast only when the dictionary is provably small -- see
    below). Emits per-doc word/char/token counts -- the tokens-per-doc
    accounting a training-data pipeline budgets by. Oracle-certified:
    DuckDB replays the whole train+encode loop as recursive CTEs over
    the same capped word-frequency table (BPE_TRAIN_ENCODE_SQL); the
    merge loop is additionally pinned against an independent reference
    implementation in tests/test_bpe_train.py."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    )
    wordfreq = [
        (r.word, r.n)
        for r in words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(BPE_WORD_CAP)
        .collect()
    ]
    merges = _bpe_learn(wordfreq, BPE_MERGES)
    # the frequency table came back BELOW its cap => it holds every
    # distinct word, so the encode dictionary is provably <= CAP rows
    # and safe to broadcast. At web-corpus scale (10^8+ distinct
    # tokens: typos, URLs, code) the cap binds and the dictionary join
    # falls back to a shuffle join -- same size-guard shape as the
    # warehouse's _DELETE_BROADCAST_RECORDS.
    vocab_is_small = len(wordfreq) < BPE_WORD_CAP

    def encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_tokens": [
                        _bpe_apply(w, merges) for w in pdf["word"]
                    ],
                }
            )

    vocab = words.select("word").distinct()
    encoded = vocab.mapInPandas(encode_batches, "word string, n_tokens int")
    if vocab_is_small:
        encoded = F.broadcast(encoded)
    return (
        words.join(encoded, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("word")).alias("n_chars"),
            F.sum("n_tokens").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id", "n_words",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
    )


_BPE_D = "\x1f"  # unit separator: wraps each symbol in the SQL replay


def _bpe_train_encode_sql() -> str:
    """DuckDB replay of the FULL BPE train+encode loop as recursive
    CTEs -- the independent oracle for ``bpe_train_encode``. Each
    word's segmentation is a string of ``\\x1f``-wrapped symbols
    (``<d>a<d><d>b<d>`` for [a, b]); merging pair (a, b) is then one
    SQL ``replace`` of ``<d>a<d><d>b<d>`` with ``<d>ab<d>``, whose
    left-to-right non-overlapping semantics equal the greedy BPE
    rewrite exactly (each symbol owns BOTH its delimiters, so adjacent
    matches never share a boundary character). The training CTE
    carries the per-iteration best pair (ties broken lexicographically
    like ``_bpe_learn``); a second recursion applies the learned merge
    list in order to EVERY distinct corpus word."""
    d = _BPE_D
    return f"""
WITH RECURSIVE
words AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
  FROM documents
),
wf AS (
  SELECT word, COUNT(*) AS freq FROM words GROUP BY word
  ORDER BY freq DESC, word ASC LIMIT {BPE_WORD_CAP}
),
state(iter, word, freq, s, ma, mb) AS (
  SELECT 0, word, freq,
         '{d}' || array_to_string(regexp_split_to_array(word, ''), '{d}{d}') || '{d}',
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
  FROM wf
  UNION ALL
  SELECT st.iter + 1, st.word, st.freq,
         replace(st.s, '{d}' || best.a || '{d}{d}' || best.b || '{d}',
                 '{d}' || best.a || best.b || '{d}'),
         best.a, best.b
  FROM state st,
       (SELECT a, b FROM (
          SELECT sl[i] AS a, sl[i + 1] AS b, SUM(freq) AS cnt
          FROM (SELECT freq, str_split(trim(s, '{d}'), '{d}{d}') AS sl
                FROM state) x,
               UNNEST(range(1, len(sl))) AS t(i)
          GROUP BY 1, 2
          ORDER BY cnt DESC, a ASC, b ASC
          LIMIT 1
        )) best
  WHERE st.iter < {BPE_MERGES}
),
merges AS (
  SELECT DISTINCT iter, ma AS a, mb AS b FROM state WHERE iter >= 1
),
enc(step, word, s) AS (
  SELECT 0, word,
         '{d}' || array_to_string(regexp_split_to_array(word, ''), '{d}{d}') || '{d}'
  FROM (SELECT DISTINCT word FROM words)
  UNION ALL
  SELECT e.step + 1, e.word,
         replace(e.s, '{d}' || m.a || '{d}{d}' || m.b || '{d}',
                 '{d}' || m.a || m.b || '{d}')
  FROM enc e JOIN merges m ON m.iter = e.step + 1
  WHERE e.step < {BPE_MERGES}
),
encoded AS (
  SELECT word,
         CASE WHEN word = '' THEN 0
              ELSE len(str_split(trim(s, '{d}'), '{d}{d}')) END AS n_tokens
  FROM enc
  QUALIFY row_number() OVER (PARTITION BY word ORDER BY step DESC) = 1
)
SELECT w.doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(length(w.word)) AS BIGINT) AS n_chars,
       CAST(SUM(e.n_tokens) AS BIGINT) AS n_bpe_tokens
FROM words w JOIN encoded e USING (word)
GROUP BY w.doc_id
"""


# Hashed-feature linear quality classifier: bucket count and the
# deterministic weight surrogate. A production pipeline loads TRAINED
# weights (fastText / logistic-regression quality filters, the
# CCNet/GPT-3 curation shape) into the same bucket space; the
# congruential surrogate keeps the oracle exact while the plumbing --
# md5 feature hashing, weight lookup as pure int arithmetic, map-only
# JVM-side scoring with NO shuffle and NO Python -- is the production
# shape. Weights: w(b) = (b * 2654435761) % 1009 - 504, in [-504, 504].
_CLF_BUCKETS = 16384
_CLF_MULT = 2654435761
_CLF_MOD = 1009
_CLF_SHIFT = 504


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier INFERENCE over every document: hash
    each whitespace token into one of 16384 feature buckets (md5 --
    portable), sum the bucket weights (exact int64), and score =
    weight_sum / (n_tokens * 504) with keep = score > 0. One map-only
    pass: at 100 TB this is the classic embarrassingly-parallel
    model-inference shape -- no shuffle, no UDF, whole-stage codegen
    end to end; swapping in real trained weights is a lookup-table
    seam, not a plan change."""
    from ..functions.textfns import md5_int

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = tokens(F.col("text"))
    w = (
        lambda t: (md5_int(t) % _CLF_BUCKETS) * _CLF_MULT % _CLF_MOD
        - _CLF_SHIFT
    )
    weight_sum = F.aggregate(
        tok, F.lit(0).cast("bigint"), lambda acc, t: acc + w(t)
    )
    d = docs.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        weight_sum.alias("weight_sum"),
    )
    score = F.when(
        F.col("n_tokens") > 0,
        F.col("weight_sum").cast("double")
        / (F.col("n_tokens") * _CLF_SHIFT),
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id", "n_tokens", "weight_sum",
        score.alias("score"),
        (score > 0).alias("keep"),
    )


def _quality_classifier_sql() -> str:
    from ..functions.textfns import md5_int_sql

    tok = TOKENS_SQL.format(col="text")
    wexpr = (
        f"({md5_int_sql('t')} % {_CLF_BUCKETS}) * {_CLF_MULT} "
        f"% {_CLF_MOD} - {_CLF_SHIFT}"
    )
    return f"""
WITH d AS (
  SELECT doc_id,
         CAST(len({tok}) AS INTEGER) AS n_tokens,
         COALESCE(CAST(list_sum(list_transform({tok}, t -> {wexpr}))
                  AS BIGINT), 0) AS weight_sum
  FROM documents
)
SELECT doc_id, n_tokens, weight_sum,
       CASE WHEN n_tokens > 0
            THEN CAST(weight_sum AS DOUBLE) / (n_tokens * {_CLF_SHIFT})
            ELSE 0.0 END AS score,
       (CASE WHEN n_tokens > 0
             THEN CAST(weight_sum AS DOUBLE) / (n_tokens * {_CLF_SHIFT})
             ELSE 0.0 END) > 0 AS keep
FROM d
"""


_SEG_WORDS = 10  # span width for segment-level dedup


def segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact deduplication (the C4 / "Deduplicating Training
    Data Makes Language Models Better" shape, Lee et al. 2022): split
    every document into fixed 10-word segments, keep only the FIRST
    corpus-wide occurrence of each segment (ordered by doc_id, then
    position), and rebuild each document from its surviving segments.
    Catches copy-paste boilerplate that document-level minhash misses
    because the surrounding text differs.

    Scale shape: one map-side explode (no pairwise comparison), then
    keep-first computed as ``min(struct(doc_id, pos))`` PER SEGMENT --
    a hash aggregate with map-side combine, so a boilerplate segment
    occurring 10^9 times collapses to one row per map task instead of
    flooding one reducer (a row_number window over the segment would
    have exactly that hot-partition problem, and windows get no AQE
    skew mitigation; the equi-join back on the segment does). One more
    shuffle on doc_id reassembles. Linear in corpus size. At 100 TB
    the segment column would be hashed (xxhash64) before the shuffle
    to shrink bytes; kept verbatim here so the rebuilt text certifies
    end-to-end.
    """
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    w = _SEG_WORDS
    segs = docs.select(
        "doc_id",
        F.expr(
            f"posexplode(transform("
            f"  sequence(0, int(ceil(size(split(text, ' ')) / {w}.0)) - 1),"
            f"  i -> concat_ws(' ', slice(split(text, ' '), i * {w} + 1, {w}))"
            f"))"
        ).alias("pos", "seg"),
    )
    firsts = segs.groupBy("seg").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    ranked = segs.join(firsts, "seg").select(
        "doc_id", "pos", "seg",
        F.when(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("pos") == F.col("first.pos")),
            1,
        ).otherwise(2).alias("rn"),
    )
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("pos"), F.col("seg"))
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["seg"],
                ),
            ).alias("dedup_text"),
        )
        .select("doc_id", "n_segments", "n_kept", "dedup_text")
    )


def _segment_dedup_sql() -> str:
    w = _SEG_WORDS
    return f"""
WITH segs AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         array_to_string(
           string_split(text, ' ')[(i * {w} + 1):(i * {w} + {w})], ' '
         ) AS seg
  FROM documents,
       UNNEST(range(CAST(ceil(len(string_split(text, ' ')) / {w}.0)
                    AS BIGINT))) AS t(i)
),
ranked AS (
  SELECT doc_id, pos, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
  FROM segs
)
SELECT doc_id,
       COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       COALESCE(
         string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos), ''
       ) AS dedup_text
FROM ranked
GROUP BY doc_id
"""


def warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC web-corpus ingestion end-to-end (sources/warc.py -- the
    Common Crawl ``.warc.gz`` shape, THE bulk source of web-scale
    training data): synthesize genuine per-doc archives (warcinfo +
    request + response records, each its own gzip member, the HTML
    body carrying the doc text wrapped in title/nav/script/style/
    footer boilerplate), then run the real extraction on executors --
    multi-member gunzip, WARC record grammar, HTTP envelope parse,
    boilerplate-dropping HTML -> text. ``text_md5`` must equal the md5
    of the ORIGINAL document text, so a hash match certifies that the
    whole container + extraction pipeline is exactly invertible (and
    that the boilerplate was dropped, not leaked into the corpus)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")

    def synth(batches):
        import pandas as pd

        from ..sources.warc import (
            encode_warc_gz,
            http_response,
            write_warc_record,
        )

        for pdf in batches:
            warcs = []
            for d, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                html = (
                    f"<html><head><title>Doc {d}</title>"
                    "<script>var boiler = 'PLATE';</script>"
                    "<style>.x{color:red}</style></head>"
                    "<body><nav>Home | About | Contact</nav>"
                    f"<article><p>{text}</p></article>"
                    "<footer>copyright corp</footer></body></html>"
                )
                records = [
                    write_warc_record(
                        "warcinfo", b"software: spark-graft\r\n",
                        record_id=f"<urn:uuid:{d}-info>",
                    ),
                    write_warc_record(
                        "request", b"GET / HTTP/1.1\r\n\r\n",
                        record_id=f"<urn:uuid:{d}-req>",
                    ),
                    write_warc_record(
                        "response", http_response(html.encode()),
                        headers={
                            "WARC-Target-URI": f"http://ex.com/{d}"
                        },
                        record_id=f"<urn:uuid:{d}-resp>",
                    ),
                ]
                warcs.append(encode_warc_gz(records))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "warc": warcs}
            )

    def extract(batches):
        import hashlib

        import pandas as pd

        from ..sources.warc import decode_warc, extract_text_records

        for pdf in batches:
            rows = []
            for d, w in zip(pdf["doc_id"], pdf["warc"]):
                w = bytes(w)
                n_records = len(decode_warc(w))
                rec = extract_text_records(w)[0]
                rows.append(
                    (
                        int(d), n_records, rec["title"],
                        hashlib.md5(rec["text"].encode()).hexdigest(),
                        len(rec["text"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_records", "title", "text_md5", "text_len",
                ],
            )

    warcs = docs.select("doc_id", "text").mapInPandas(
        synth, "doc_id long, warc binary"
    )
    return warcs.mapInPandas(
        extract,
        "doc_id long, n_records int, title string, text_md5 string, "
        "text_len int",
    )


WARC_EXTRACT_SQL = """
SELECT doc_id, 3 AS n_records, 'Doc ' || doc_id AS title,
       md5(text) AS text_md5,
       CAST(length(text) AS INTEGER) AS text_len
FROM documents
"""


def pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF document ingestion end-to-end (sources/pdf.py -- the other
    big document-corpus container next to WARC): write each doc as a
    genuine two-page PDF (Flate-compressed content streams, page tree,
    xref) splitting the text mid-word-list, then run the real
    extraction on executors -- object walk, page-tree /Contents
    resolution, inflate, Tj/' text operators with PDF escapes.
    ``text_md5`` must equal md5 of the ORIGINAL text, so a hash match
    certifies exact invertibility of the whole container chain."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")

    def synth(batches):
        import pandas as pd

        from ..sources.pdf import encode_pdf

        for pdf_ in batches:
            blobs = []
            for text in pdf_["text"]:
                words = str(text).split(" ")
                k = len(words) // 2
                blobs.append(
                    encode_pdf(
                        [" ".join(words[:k]), " ".join(words[k:])]
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf_["doc_id"].astype("int64"), "pdf": blobs}
            )

    def extract(batches):
        import hashlib

        import pandas as pd

        from ..sources.pdf import decode_pdf_text

        for pdf_ in batches:
            rows = []
            for d, blob in zip(pdf_["doc_id"], pdf_["pdf"]):
                pages = decode_pdf_text(bytes(blob))
                text = " ".join(p for p in pages if p)
                rows.append(
                    (
                        int(d), len(pages),
                        hashlib.md5(text.encode()).hexdigest(),
                        len(text),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_pages", "text_md5", "text_len"],
            )

    pdfs = docs.select("doc_id", "text").mapInPandas(
        synth, "doc_id long, pdf binary"
    )
    return pdfs.mapInPandas(
        extract, "doc_id long, n_pages int, text_md5 string, text_len int"
    )


PDF_EXTRACT_SQL = """
SELECT doc_id, 2 AS n_pages, md5(text) AS text_md5,
       CAST(length(text) AS INTEGER) AS text_len
FROM documents
"""


LM_SCALE = 1_000_000


def lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality filtering (the CCNet / FineWeb pattern: score
    each document by how predictable it is under an n-gram language
    model trained on the corpus itself, then filter the tail). A bigram
    model with add-one smoothing is trained IN the engine -- context
    counts c(a) and bigram counts c(a, b) are two map-side-combined
    aggregations over an exploded bigram stream -- and each document is
    scored by its mean integer SURPRISAL

        surp(a, b) = ((c(a) + V) * 1e6) div (c(a, b) + 1),

    the scaled reciprocal of the smoothed conditional probability
    P(b | a). This is the engine-reproducible surrogate for
    -log P: it orders bigrams identically (reciprocal is monotone in
    1/P, as log is) while staying in exact int64 the whole way --
    a float log would hash-diverge across engines at the last ulp
    (Math.log vs libm are both 1-ulp functions with different
    tables), the same reason distinctive_terms ranks on exact (tf, df)
    instead of tf*idf. The doubles in the output are single divisions
    of exact ints: bitwise identical everywhere.

    Scale shape: bigram explosion is map-only (arrays_zip of two
    slices); the two LM aggregations and the per-doc rollup are
    combiner-friendly shuffles; scoring joins the doc bigram stream to
    the (a, b)-keyed model co-partitioned, then to the much smaller
    (a)-keyed context counts (AQE handles stopword-context skew); the
    vocabulary size is one broadcast scalar. At 100 TB this is exactly
    CCNet's layout: the model tables shard by key, no vector of
    per-word floats ever reaches the driver. Documents with fewer than
    two tokens have no bigrams and are excluded (a real pipeline
    length-filters them first).

    Reference scope: §2.6 text-extension capability (the reference's
    transforms stop at AttributeValue unwrapping)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("ws"))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ws"), 1, F.size("ws") - 1).alias("a"),
                F.slice(F.col("ws"), 2, F.size("ws") - 1).alias("b"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    cab = bg.groupBy("a", "b").agg(F.count("*").alias("cab"))
    ca = cab.groupBy("a").agg(F.sum("cab").alias("ca"))
    vocab = toks.select(F.explode("ws").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    scored = (
        bg.join(cab, ["a", "b"])
        .join(ca, "a")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "surp",
            F.expr(f"((ca + v) * {LM_SCALE}L) div (cab + 1)"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("surp").alias("total_surprisal"),
        (F.sum("surp").cast("double") / F.count("*")).alias("avg_surprisal"),
        F.max("surp").alias("max_surprisal"),
    )


LM_PERPLEXITY_SQL = f"""
WITH toks AS (
  SELECT doc_id, {TOKENS_SQL.format(col='text')} AS ws FROM documents
),
bg AS (
  SELECT doc_id, ws[i] AS a, ws[i + 1] AS b
  FROM toks, unnest(range(1, len(ws))) AS t(i)
),
cab AS (SELECT a, b, COUNT(*) AS cab FROM bg GROUP BY a, b),
ca AS (SELECT a, CAST(SUM(cab) AS BIGINT) AS ca FROM cab GROUP BY a),
vocab AS (SELECT COUNT(DISTINCT w) AS v
          FROM (SELECT unnest(ws) AS w FROM toks)),
scored AS (
  SELECT bg.doc_id, ((ca.ca + vocab.v) * {LM_SCALE}) // (cab.cab + 1) AS surp
  FROM bg JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN vocab
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(surp) AS BIGINT) AS total_surprisal,
       CAST(SUM(surp) AS DOUBLE) / COUNT(*) AS avg_surprisal,
       MAX(surp) AS max_surprisal
FROM scored GROUP BY doc_id
"""


QUERIES = {
    "text_lm_perplexity": lm_perplexity,
    "text_pdf_extract": pdf_extract,
    "text_warc_extract": warc_extract,
    "text_bpe_train_encode": bpe_train_encode,
    "text_token_stats": token_stats,
    "text_quality_score": quality_score,
    "text_lang_id": lang_id,
    "text_fingerprint": fingerprint,
    "text_rolling_fingerprint": rolling_fingerprint,
    "text_chunk": chunk,
    "text_ngram_freq": ngram_freq,
    "text_decontamination": decontamination,
    "text_segment_dedup": segment_dedup,
    "text_quality_classifier": quality_classifier,
    "text_distinctive_terms": distinctive_terms,
    "text_repetition": repetition_stats,
    "text_pii_redaction": pii_redaction,
    "text_bpe_pairs": bpe_pair_counts,
    "text_vocab_coverage": vocab_coverage,
}

ORACLES = {
    "text_lm_perplexity": LM_PERPLEXITY_SQL,
    "text_pdf_extract": PDF_EXTRACT_SQL,
    "text_warc_extract": WARC_EXTRACT_SQL,
    "text_bpe_train_encode": _bpe_train_encode_sql(),
    "text_token_stats": TOKEN_STATS_SQL,
    "text_quality_score": QUALITY_SCORE_SQL,
    "text_lang_id": _lang_id_sql(),
    "text_fingerprint": FINGERPRINT_SQL,
    "text_rolling_fingerprint": _rolling_fingerprint_sql(),
    "text_chunk": CHUNK_SQL,
    "text_ngram_freq": _ngram_freq_sql(),
    "text_decontamination": _decontamination_sql(),
    "text_segment_dedup": _segment_dedup_sql(),
    "text_quality_classifier": _quality_classifier_sql(),
    "text_distinctive_terms": DISTINCTIVE_TERMS_SQL,
    "text_repetition": _repetition_stats_sql(),
    "text_pii_redaction": _pii_redaction_sql(),
    "text_bpe_pairs": _bpe_pair_counts_sql(),
    "text_vocab_coverage": _vocab_coverage_sql(),
}
