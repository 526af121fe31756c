"""Deterministic sampling + quantile operators for pipeline curation.

The reference has no sampling surface (its queries are full scans,
SURVEY 2.6); these are north-star extensions every large-scale
training-data pipeline needs: reproducible subsetting (Bernoulli and
stratified) and distribution profiling (exact + sketch quantiles).

Portability: sampling decisions key off the shared md5-derived bigint
(functions/textfns.md5_int), never Spark's ``rand()``/``TABLESAMPLE`` or
engine hashes -- the same rows are selected in Spark and in the DuckDB
oracle, bit-for-bit. Quantiles are *discrete* (an existing data value is
selected, no interpolation arithmetic), so double outputs pass through
untouched from the parquet scan.

Scale: Bernoulli sampling is a pushed-down filter (no shuffle).
Stratified sampling and exact quantiles shuffle once on the stratum key;
per-stratum state is a single window pass. The approx-quantile path is
the 100 TB story: ``approx_percentile`` (KLL-style mergeable sketch)
aggregates map-side and never materializes per-group sorted data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.textfns import md5_int, md5_int_sql
from ..sources.testdata import load_table

# Sampling hash domain: salt the key so the sample is independent of any
# other md5-keyed decision in the engine.
_SALT = "sample:"


def _sample_key(col):
    return md5_int(F.concat(F.lit(_SALT), col.cast("string")))


def _sample_key_sql(expr: str) -> str:
    return md5_int_sql(f"'{_SALT}' || CAST({expr} AS VARCHAR)")


def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic Bernoulli sample of events.

    The predicate is a pure Column expression on the key, so Catalyst
    keeps it next to the scan (no shuffle, no state); re-running on a
    grown table keeps previously-selected rows selected (append-stable).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.where(_sample_key(F.col("event_id")) % 100 < 10).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


SAMPLE_BERNOULLI_SQL = f"""
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE {_sample_key_sql('event_id')} % 100 < 10
"""

_STRATUM_K = 50


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sample (k=50 per event_type).

    Rank rows inside each stratum by the portable sample hash (event_id
    as the total-order tie-break) and keep the first k -- a reproducible
    stratified sample with hard per-stratum quotas. One shuffle on the
    stratum key; rank state is O(1) per row. For heavily skewed strata
    at 100 TB, swap the global window for a per-partition pre-rank
    (keep k per partition, then re-rank the <= k * n_partitions
    survivors) -- same output, bounded memory.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        _sample_key(F.col("event_id")).asc(), F.col("event_id").asc()
    )
    return (
        ev.select(
            "event_type",
            "event_id",
            "user_id",
            "value",
            F.row_number().over(w).alias("sample_rank"),
        )
        .where(F.col("sample_rank") <= _STRATUM_K)
    )


SAMPLE_STRATIFIED_SQL = f"""
WITH r AS (
  SELECT event_type, event_id, user_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY {_sample_key_sql('event_id')} ASC, event_id ASC)
           AS sample_rank
  FROM events
)
SELECT * FROM r WHERE sample_rank <= {_STRATUM_K}
"""

# Target domain mixture for mixture_resample: upweight the five "high
# quality" sources to 10% each, split the rest uniformly. Shares are
# embedded as identical double literals in both engines.
_MIX_HOT = ("src0", "src1", "src2", "src3", "src4")
_MIX_HOT_SHARE = 0.10
_MIX_OTHER_SHARE = (1.0 - len(_MIX_HOT) * _MIX_HOT_SHARE) / 15


def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing (downsample-only importance sampling):
    given target shares per ``source``, keep each row with probability
    p_s = (target_s / empirical_s) / max_r(target_r / empirical_r), so
    the kept corpus approaches the target mixture without upsampling.

    Two passes, both portable: (1) count rows per source and derive an
    exact per-mille acceptance threshold (double ratios of int counts,
    identical IEEE ops in both engines, floored to int); (2) accept rows
    whose salted md5 falls under the threshold. Output is the per-source
    audit (incoming vs kept vs target) a pipeline would log.

    Scale shape: pass 1 is a map-side-combined count (tiny result,
    broadcast back); pass 2 is a scan + broadcast-join + filter -- no
    wide shuffle of the corpus at any point."""
    docs = load_table(spark, sf_dir, "documents")
    target = F.when(
        F.col("source").isin(*_MIX_HOT), F.lit(_MIX_HOT_SHARE)
    ).otherwise(F.lit(_MIX_OTHER_SHARE))
    counts = docs.groupBy("source").agg(F.count("*").alias("n_in"))
    wall = Window.partitionBy()
    ratios = counts.select(
        "source",
        "n_in",
        target.alias("target_share"),
        (target * F.sum("n_in").over(wall) / F.col("n_in")).alias("ratio"),
    )
    plan = ratios.select(
        "source",
        "n_in",
        "target_share",
        F.floor(F.col("ratio") / F.max("ratio").over(wall) * 1_000_000)
        .cast("bigint")
        .alias("accept_permicro"),
    )
    kept = (
        docs.join(F.broadcast(plan), "source")
        .where(_sample_key(F.col("doc_id")) % 1_000_000 < F.col("accept_permicro"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        plan.join(kept, "source", "left")
        .select(
            "source",
            "n_in",
            "target_share",
            "accept_permicro",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def _mixture_resample_sql() -> str:
    hot = ", ".join(f"'{s}'" for s in _MIX_HOT)
    # CAST the share literals: a bare 0.0333... literal is DECIMAL in
    # DuckDB, and the ratio arithmetic must run in double as Spark does.
    target = (
        f"CASE WHEN source IN ({hot}) THEN CAST({_MIX_HOT_SHARE!r} AS DOUBLE) "
        f"ELSE CAST({_MIX_OTHER_SHARE!r} AS DOUBLE) END"
    )
    return f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_in FROM documents GROUP BY source
),
ratios AS (
  SELECT source, n_in,
         {target} AS target_share,
         {target} * SUM(n_in) OVER () / n_in AS ratio
  FROM counts
),
plan AS (
  SELECT source, n_in, target_share,
         CAST(floor(ratio / MAX(ratio) OVER () * 1000000) AS BIGINT)
           AS accept_permicro
  FROM ratios
),
kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN plan p USING (source)
  WHERE {_sample_key_sql('d.doc_id')} % 1000000 < p.accept_permicro
  GROUP BY d.source
)
SELECT p.source, p.n_in, p.target_share, p.accept_permicro,
       COALESCE(k.n_kept, 0) AS n_kept
FROM plan p LEFT JOIN kept k USING (source)
"""


_QS = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))


def _ranked(ev: DataFrame) -> DataFrame:
    """Events ranked inside their event_type by (value, event_id) -- the
    ONE total-order definition both quantile operators derive ranks
    from (the tie-break decides which value IS the discrete quantile,
    so exact and approx-bounds must share it)."""
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )


def quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group discrete quantiles (p50/p90/p99 of event value).

    Discrete ("lower" rule): the quantile is the existing value at rank
    ``ceil(q * n)`` in (value, event_id) order -- no interpolation, so
    the doubles flow straight from the parquet scan to the output and
    match any engine bit-for-bit. One shuffle on the group key, one
    window pass, then a tiny aggregate.
    """
    ranked = _ranked(load_table(spark, sf_dir, "events"))
    aggs = [F.count("*").alias("n_events")]
    for name, q in _QS:
        at = F.ceil(F.lit(q) * F.col("n")).cast("int")
        aggs.append(F.max(F.when(F.col("rn") == at, F.col("value"))).alias(name))
    # count("*") over the ranked rows == group size; rn==at hits exactly once.
    return ranked.groupBy("event_type").agg(*aggs)


QUANTILES_EXACT_SQL = """
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS INTEGER) THEN value END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS INTEGER) THEN value END) AS p90,
       MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS INTEGER) THEN value END) AS p99
FROM r
GROUP BY event_type
"""

_APPROX_ACC = 1000  # approx_percentile accuracy: rank error <= n / accuracy


def quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch quantiles with a checked error bound (the 100 TB path).

    ``approx_percentile(value, q, acc)`` guarantees the returned value's
    rank is within ``n/acc`` of ``q*n``. Like ``approx_distinct``, the
    raw estimate is engine-specific, so the *checked output* is the
    engine-independent verdict: does the estimate fall between the exact
    values at the guaranteed rank bounds? (Constant-TRUE oracle.) The
    sketch is mergeable -- map-side partials, no per-group sort -- which
    is what replaces ``quantiles_exact``'s window at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    ranked = _ranked(ev)
    bound_aggs = [F.count("*").alias("n_events")]
    for name, q in _QS:
        lo_at = F.greatest(
            F.lit(1), F.floor(F.lit(q) * F.col("n") - F.col("n") / _APPROX_ACC).cast("int")
        )
        hi_at = F.least(
            F.col("n").cast("int"),
            F.ceil(F.lit(q) * F.col("n") + F.col("n") / _APPROX_ACC).cast("int"),
        )
        bound_aggs.append(
            F.max(F.when(F.col("rn") == lo_at, F.col("value"))).alias(f"{name}_lo")
        )
        bound_aggs.append(
            F.max(F.when(F.col("rn") == hi_at, F.col("value"))).alias(f"{name}_hi")
        )
    bounds = ranked.groupBy("event_type").agg(*bound_aggs)
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx(
            F.col("value"), F.array(*[F.lit(q) for _, q in _QS]), F.lit(_APPROX_ACC)
        ).alias("est")
    )
    ok = F.lit(True)
    for i, (name, _) in enumerate(_QS):
        est = F.col("est")[i]
        ok = ok & (est >= F.col(f"{name}_lo")) & (est <= F.col(f"{name}_hi"))
    return (
        bounds.join(F.broadcast(approx), "event_type")
        .select("event_type", "n_events", ok.alias("within_bounds"))
    )


QUANTILES_APPROX_SQL = """
SELECT event_type, COUNT(*) AS n_events, TRUE AS within_bounds
FROM events GROUP BY event_type
"""


# (column, kind) pairs profiled by profile_columns; kinds pick which
# typed min/max slots are populated (cross-type string casts are not
# portable across engines, so each kind keeps its own typed columns).
_PROFILE_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiling of ``orders`` in ONE pass: per
    column, null count, exact distinct count, and typed min/max.

    Shape: a single aggregate row (Catalyst plans the multi-distinct via
    Expand -- one shuffle, map-side partials) unpivoted with ``stack``
    into one row per column. Numeric min/max surface as double (exact:
    bigint magnitudes << 2^53), timestamps and strings keep their own
    slots -- engine-portable, unlike cross-type casts to string. At
    100 TB this is the profiling scan you run once per partition batch;
    for distincts over ultra-high-cardinality columns swap in
    approx_count_distinct (the approx_distinct operator's path).
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c, kind in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
        # only "num" aggregates differently (cast to double); ts/str
        # keep their native type and differ only in output-slot routing
        cast = (lambda col: col.cast("double")) if kind == "num" else (lambda col: col)
        aggs.append(cast(F.min(c)).alias(f"{c}__mn"))
        aggs.append(cast(F.max(c)).alias(f"{c}__mx"))
    one = orders.agg(*aggs)
    # Null slots must match the populated slots' exact Spark type (the
    # parquet timestamps read as TIMESTAMP_NTZ, not TIMESTAMP).
    ts_type = next(
        (
            one.schema[f"{c}__mn"].dataType.simpleString()
            for c, kind in _PROFILE_COLS
            if kind == "ts"
        ),
        "timestamp",
    )
    rows = []
    for c, kind in _PROFILE_COLS:
        mn_num = f"{c}__mn" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mx_num = f"{c}__mx" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mn_ts = f"{c}__mn" if kind == "ts" else f"CAST(NULL AS {ts_type})"
        mx_ts = f"{c}__mx" if kind == "ts" else f"CAST(NULL AS {ts_type})"
        mn_str = f"{c}__mn" if kind == "str" else "CAST(NULL AS STRING)"
        mx_str = f"{c}__mx" if kind == "str" else "CAST(NULL AS STRING)"
        rows.append(
            f"'{c}', {c}__nn, {c}__nd, {mn_num}, {mx_num}, "
            f"{mn_ts}, {mx_ts}, {mn_str}, {mx_str}"
        )
    stack = (
        f"stack({len(_PROFILE_COLS)}, {', '.join(rows)}) AS "
        "(column_name, n_nulls, n_distinct, min_num, max_num, "
        "min_ts, max_ts, min_str, max_str)"
    )
    return one.select(F.expr(stack))


def _profile_columns_sql() -> str:
    selects = []
    for c, kind in _PROFILE_COLS:
        mn_num = f"CAST(MIN({c}) AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mx_num = f"CAST(MAX({c}) AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
        mn_ts = f"MIN({c})" if kind == "ts" else "CAST(NULL AS TIMESTAMP)"
        mx_ts = f"MAX({c})" if kind == "ts" else "CAST(NULL AS TIMESTAMP)"
        mn_str = f"MIN({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"
        mx_str = f"MAX({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"
        selects.append(
            f"SELECT '{c}' AS column_name,\n"
            f"       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,\n"
            f"       COUNT(DISTINCT {c}) AS n_distinct,\n"
            f"       {mn_num} AS min_num, {mx_num} AS max_num,\n"
            f"       {mn_ts} AS min_ts, {mx_ts} AS max_ts,\n"
            f"       {mn_str} AS min_str, {mx_str} AS max_str\n"
            f"FROM orders"
        )
    return "\nUNION ALL\n".join(selects)


# Train/val/test split boundaries on the 0..99 hash bucket.
_SPLITS = (("train", 0, 80), ("val", 80, 90), ("test", 90, 100))


def split_col():
    """The document's split assignment as a Column (shared with the
    decontamination scan so both see the identical partitioning)."""
    bucket = md5_int(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    ) % 100
    return (
        F.when(bucket < _SPLITS[0][2], _SPLITS[0][0])
        .when(bucket < _SPLITS[1][2], _SPLITS[1][0])
        .otherwise(_SPLITS[2][0])
    )


def split_case_sql() -> str:
    """DuckDB twin of :func:`split_col`."""
    b = md5_int_sql("'split:' || CAST(doc_id AS VARCHAR)") + " % 100"
    return (
        f"CASE WHEN {b} < {_SPLITS[0][2]} THEN '{_SPLITS[0][0]}' "
        f"WHEN {b} < {_SPLITS[1][2]} THEN '{_SPLITS[1][0]}' "
        f"ELSE '{_SPLITS[2][0]}' END"
    )


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment for documents.

    Each doc hashes into a 0..99 bucket (portable md5 key, salted
    independently of the sampling operators); bucket ranges define the
    splits. Assignment is append-stable (new docs never reshuffle old
    ones) and leakage-free (a doc_id always lands in the same split on
    any engine or rerun). Output is the per-(split, lang) composition --
    the check a pipeline runs to confirm split balance before training.
    No shuffle before the final aggregate; the hash is a scan-adjacent
    Column expression.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(split_col().alias("split"), "lang", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def _dataset_split_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, lang, {split_case_sql()} AS split
  FROM documents
)
SELECT split, lang, COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM d GROUP BY split, lang
"""


QUERIES = {
    "sample_bernoulli": sample_bernoulli,
    "sample_stratified": sample_stratified,
    "quantiles_exact": quantiles_exact,
    "quantiles_approx": quantiles_approx,
    "profile_columns": profile_columns,
    "dataset_split": dataset_split,
    "mixture_resample": mixture_resample,
}

ORACLES = {
    "sample_bernoulli": SAMPLE_BERNOULLI_SQL,
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "quantiles_exact": QUANTILES_EXACT_SQL,
    "quantiles_approx": QUANTILES_APPROX_SQL,
    "profile_columns": _profile_columns_sql(),
    "dataset_split": _dataset_split_sql(),
    "mixture_resample": _mixture_resample_sql(),
}
