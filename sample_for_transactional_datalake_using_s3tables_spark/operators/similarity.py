"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

North-star extension (BASELINE.json): brute-force cosine top-k as the
exact baseline, and a sign-random-hyperplane LSH variant as the scale
path. Cosines use the exact quantized-int scheme (functions/vectors.py)
so Spark and the DuckDB oracle produce bitwise-identical doubles.

Scale design:
- Brute force: the query set is tiny and broadcast; the corpus scan is
  embarrassingly parallel; per-query top-k via window row_number (at
  extreme scale: partial top-k per partition then merge -- Spark's
  TakeOrdered does this shape automatically for global top-k).
- LSH: bucket signatures are per-row expressions against *literal*
  hyperplane arrays (broadcast-free constants in the plan); candidate
  generation is an equi-join on (table_id, bucket), the classic
  multi-table LSH probe. 100 TB corpus => bucket join shuffles only
  (vec_id, T x small ints).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.vectors import (
    QUANTIZE_SQL,
    SCALE,
    cosine_from_ints,
    cosine_from_ints_sql,
    dot_int,
    dot_int_sql,
    hyperplanes,
    quantize,
)
from ..sources.testdata import load_table, spread

N_QUERIES = 10   # vec_id < 10 are the query vectors
TOP_K = 5
LSH_TABLES = 4
LSH_BITS = 4

_HYPERPLANES = hyperplanes(LSH_TABLES, LSH_BITS)


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    q = emb.select("vec_id", "label", quantize("embedding").alias("qv"))
    return q.withColumn("n2", dot_int("qv", "qv"))


def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: brute-force scan per query vector."""
    base = _quantized(spark, sf_dir)
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("n2").alias("q_n2"),
    )
    cos = cosine_from_ints(
        dot_int("q_qv", "qv"), F.col("q_n2"), F.col("n2")
    )
    scored = (
        base.join(F.broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


SIMILARITY_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id, {QUANTIZE_SQL.format(v='embedding')} AS qv,
         {dot_int_sql(QUANTIZE_SQL.format(v='embedding'), QUANTIZE_SQL.format(v='embedding'))} AS n2
  FROM embeddings
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {cosine_from_ints_sql(dot_int_sql('a.qv', 'b.qv'), 'a.n2', 'b.n2')} AS cosine
  FROM q a JOIN q b ON a.vec_id < {N_QUERIES} AND b.vec_id != a.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def bucket_expr(table_id: int, col: str = "qv"):
    """Spark Column: LSH bucket id for table ``table_id`` (sum of sign bits
    against literal hyperplanes -- constants folded into codegen). Shared
    with dedup_embedding's candidate prefilter. Built as one JVM-parsed
    expression string: the Column formulation was 64 literal arrays +
    2 py4j lambdas per bit (~0.3 s of driver time per table set, r13)."""
    bits = []
    for b in range(LSH_BITS):
        lit = "array(" + ", ".join(str(c) for c in _HYPERPLANES[table_id][b]) + ")"
        d = (
            f"aggregate(zip_with({col}, {lit}, (x, y) -> x * y),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        bits.append(f"(CASE WHEN {d} > 0 THEN {1 << b} ELSE 0 END)")
    return F.expr("0 + " + " + ".join(bits))


_bucket_expr = bucket_expr


def bucket_sql(table_id: int, col: str = "qv") -> str:
    """DuckDB twin of :func:`bucket_expr` (verbatim hyperplane literals)."""
    bits = []
    for b in range(LSH_BITS):
        lit = "[" + ", ".join(str(c) for c in _HYPERPLANES[table_id][b]) + "]"
        bits.append(
            f"CASE WHEN {dot_int_sql(col, lit)} > 0 THEN {1 << b} ELSE 0 END"
        )
    return " + ".join(bits)


_LSH_ARROW_SCHEMA = (
    "vec_id bigint, qv array<bigint>, n2 bigint, "
    + ", ".join(f"b{t} int" for t in range(LSH_TABLES))
)


def _bucketize_arrow(it):
    """mapInArrow batch kernel: quantize + norms + all LSH-table buckets
    in one vectorized pass (guide section 4.2 -- batch numpy matmuls
    instead of 16 interpreted higher-order dot products per row, and a
    ~100x smaller plan than the literal-hyperplane expression tree,
    whose Catalyst analysis alone cost ~1.3 s per call). Exactness:
    floor(float64 * 1e6) and int64 matmuls are the same IEEE/integer
    ops as the Column formulation, bitwise-identical results."""
    import numpy as np
    import pyarrow as pa

    mats = [np.array(p, dtype=np.int64).T for p in _HYPERPLANES]
    bitvals = np.array([1 << b for b in range(LSH_BITS)], dtype=np.int64)
    for batch in it:
        emb = batch.column("embedding")
        n = len(emb)
        if n == 0:
            continue
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(flat.reshape(n, -1) * SCALE).astype(np.int64)
        cols = {
            "vec_id": batch.column("vec_id"),
            "qv": pa.ListArray.from_arrays(
                pa.array(range(0, (n + 1) * q.shape[1], q.shape[1]), pa.int32()),
                pa.array(q.ravel(), pa.int64()),
            ),
            "n2": pa.array((q * q).sum(axis=1), pa.int64()),
        }
        for t, mat in enumerate(mats):
            bucket = ((q @ mat > 0) * bitvals).sum(axis=1).astype(np.int32)
            cols[f"b{t}"] = pa.array(bucket, pa.int32())
        yield pa.RecordBatch.from_pydict(cols)


def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH candidate generation, then
    exact cosine re-rank among candidates only.

    Bucket signatures come from one Arrow batch kernel (see
    :func:`_bucketize_arrow`); candidate generation and re-rank stay
    relational (equi-join on (table_id, bucket), exact int cosine)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.mapInArrow(_bucketize_arrow, _LSH_ARROW_SCHEMA)
    tb = (
        "explode(array("
        + ", ".join(
            f"struct({t} as table_id, b{t} as bucket)" for t in range(LSH_TABLES)
        )
        + ")) as tb"
    )
    buckets = base.selectExpr("vec_id", "qv", "n2", tb).select(
        "vec_id", "qv", "n2", "tb.table_id", "tb.bucket"
    )
    qb = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("q_qv"),
        F.col("n2").alias("q_n2"),
        "table_id",
        "bucket",
    )
    cand = (
        buckets.join(
            F.broadcast(qb),
            (buckets.table_id == qb.table_id)
            & (buckets.bucket == qb.bucket)
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", "q_qv", "q_n2", "vec_id", "qv", "n2")
        .dropDuplicates(["query_id", "vec_id"])
    )
    cos = cosine_from_ints(
        dot_int("q_qv", "qv"), F.col("q_n2"), F.col("n2")
    )
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def _lsh_sql() -> str:
    bucket_rows = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, qv, n2, {t} AS table_id, {bucket_sql(t)} AS bucket FROM q"
        for t in range(LSH_TABLES)
    )
    return f"""
WITH q AS (
  SELECT vec_id, {QUANTIZE_SQL.format(v='embedding')} AS qv,
         {dot_int_sql(QUANTIZE_SQL.format(v='embedding'), QUANTIZE_SQL.format(v='embedding'))} AS n2
  FROM embeddings
),
buckets AS (
{bucket_rows}
),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, c.vec_id AS neighbor_id,
         qb.qv AS q_qv, qb.n2 AS q_n2, c.qv AS qv, c.n2 AS n2
  FROM buckets c JOIN buckets qb
    ON qb.vec_id < {N_QUERIES} AND c.table_id = qb.table_id
   AND c.bucket = qb.bucket AND c.vec_id != qb.vec_id
),
scored AS (
  SELECT query_id, neighbor_id,
         {cosine_from_ints_sql(dot_int_sql('q_qv', 'qv'), 'q_n2', 'n2')} AS cosine
  FROM cand
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def similarity_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label similarity profile: pair counts and extremal cosines
    (min/max of identical doubles -- no float summation, portable).

    All-pairs by semantics (it profiles the pair population itself, so
    no candidate prefilter applies); at 100 TB this runs on a per-label
    sample rather than the full corpus."""
    q = _quantized(spark, sf_dir)
    a, b = q.alias("a"), q.alias("b")
    cos = cosine_from_ints(
        dot_int("a.qv", "b.qv"), F.col("a.n2"), F.col("b.n2")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.label").alias("label"), cos.alias("cosine"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_pairs"),
            F.count(F.when(F.col("cosine") > 0.2, 1)).alias("pairs_over_02"),
            F.min("cosine").alias("min_cosine"),
            F.max("cosine").alias("max_cosine"),
        )
    )


SIMILARITY_LABEL_STATS_SQL = f"""
WITH q AS (
  SELECT vec_id, label, {QUANTIZE_SQL.format(v='embedding')} AS qv,
         {dot_int_sql(QUANTIZE_SQL.format(v='embedding'), QUANTIZE_SQL.format(v='embedding'))} AS n2
  FROM embeddings
),
pairs AS (
  SELECT a.label AS label,
         {cosine_from_ints_sql(dot_int_sql('a.qv', 'b.qv'), 'a.n2', 'b.n2')} AS cosine
  FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT label, COUNT(*) AS n_pairs,
       COUNT(CASE WHEN cosine > 0.2 THEN 1 END) AS pairs_over_02,
       MIN(cosine) AS min_cosine, MAX(cosine) AS max_cosine
FROM pairs GROUP BY label
"""


IVF_K = 16       # coarse-quantizer cell count
IVF_NPROBE = 4   # cells probed per query


def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization:
    assign every vector to its nearest centroid cell, probe only the
    query's IVF_NPROBE nearest cells, exact-cosine re-rank inside them.

    Centroids here are the first IVF_K corpus vectors -- a deterministic
    stand-in that keeps the query oracle-checkable; a production
    deployment trains k-means offline and broadcasts the centroid table,
    leaving this query shape (broadcast assign -> cluster-key probe join
    -> re-rank) unchanged. Scale: assignment is a map-side broadcast
    cross join against K centroids; the probe join shuffles on
    cluster_id only -- the classic IVF-flat plan."""
    base = _quantized(spark, sf_dir)
    cent = base.filter(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("cent_id"),
        F.col("qv").alias("c_qv"),
        F.col("n2").alias("c_n2"),
    )
    c_cos = cosine_from_ints(
        dot_int("qv", "c_qv"), F.col("n2"), F.col("c_n2")
    )
    scored = base.crossJoin(F.broadcast(cent)).select(
        "vec_id", "qv", "n2", "cent_id", c_cos.alias("c_cos")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), "cent_id")
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w_assign))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "qv", "n2", F.col("cent_id").alias("cluster_id"))
    )
    probes = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("_rn", F.row_number().over(w_assign))
        .filter(F.col("_rn") <= IVF_NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qv").alias("q_qv"),
            F.col("n2").alias("q_n2"),
            F.col("cent_id").alias("cluster_id"),
        )
    )
    cos = cosine_from_ints(
        dot_int("q_qv", "qv"), F.col("q_n2"), F.col("n2")
    )
    cand = assigned.join(F.broadcast(probes), "cluster_id").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored2 = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored2.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def _ivf_sql() -> str:
    c_cos = cosine_from_ints_sql(dot_int_sql("b.qv", "c.qv"), "b.n2", "c.n2")
    cos = cosine_from_ints_sql(dot_int_sql("p.q_qv", "a.qv"), "p.q_n2", "a.n2")
    return f"""
WITH q AS (
  SELECT vec_id, {QUANTIZE_SQL.format(v='embedding')} AS qv,
         {dot_int_sql(QUANTIZE_SQL.format(v='embedding'), QUANTIZE_SQL.format(v='embedding'))} AS n2
  FROM embeddings
),
scored AS (
  SELECT b.vec_id, b.qv, b.n2, c.vec_id AS cent_id, {c_cos} AS c_cos,
         ROW_NUMBER() OVER (PARTITION BY b.vec_id
                            ORDER BY {c_cos} DESC, c.vec_id) AS rn
  FROM q b JOIN q c ON c.vec_id < {IVF_K}
),
assigned AS (
  SELECT vec_id, qv, n2, cent_id AS cluster_id FROM scored WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, qv AS q_qv, n2 AS q_n2, cent_id AS cluster_id
  FROM scored WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {cos} AS cosine
  FROM assigned a JOIN probes p ON a.cluster_id = p.cluster_id
  WHERE p.query_id != a.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM cand
) WHERE rank <= {TOP_K}
"""


_DIM = 64


def similarity_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid statistics -- the aggregation at the core of
    IVF/k-means training -- with cross-engine-exact arithmetic: each
    dimension's component sum is an exact int64 (posexplode -> groupBy),
    the centroid's squared norm accumulates products of those sums in
    decimal(38,0) (|s| <= n_vecs * 1e6 => s^2 < 2.5e19; 64-dim total
    < 1.6e21, far under 38 digits), and only the final norm/mean-norm
    touch doubles (sqrt + divide: two correctly-rounded IEEE ops).

    Scale: the explode shuffles (label, dim, component) ints -- 64 rows
    per vector, map-side partial sums; the per-label rollup is tiny. No
    vector ever moves whole through a shuffle."""
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    q = emb.select("vec_id", "label", quantize("embedding").alias("qv"))
    dims = q.select("label", F.posexplode("qv").alias("dim", "v"))
    per_dim = dims.groupBy("label", "dim").agg(F.sum("v").alias("s"))
    sdec = F.col("s").cast("decimal(19,0)")
    norm2 = per_dim.groupBy("label").agg(F.sum(sdec * sdec).alias("norm2"))
    counts = q.groupBy("label").agg(F.count("*").alias("n_vecs"))
    return counts.join(F.broadcast(norm2), "label").select(
        "label",
        "n_vecs",
        F.col("norm2").cast("double").alias("centroid_norm2"),
        (F.sqrt(F.col("norm2").cast("double")) / F.col("n_vecs")).alias(
            "mean_vector_norm"
        ),
    )


SIMILARITY_CENTROIDS_SQL = f"""
WITH q AS (
  SELECT vec_id, label, {QUANTIZE_SQL.format(v='embedding')} AS qv FROM embeddings
),
dims AS (
  SELECT label, i AS dim, qv[i] AS v FROM q, unnest(range(1, {_DIM + 1})) AS t(i)
),
per_dim AS (
  SELECT label, dim, CAST(SUM(v) AS BIGINT) AS s FROM dims GROUP BY 1, 2
),
norm2 AS (
  SELECT label, SUM(CAST(s AS HUGEINT) * s) AS n2 FROM per_dim GROUP BY 1
),
counts AS (SELECT label, COUNT(*) AS n_vecs FROM q GROUP BY 1)
SELECT c.label, c.n_vecs,
       CAST(n2 AS DOUBLE) AS centroid_norm2,
       sqrt(CAST(n2 AS DOUBLE)) / c.n_vecs AS mean_vector_norm
FROM counts c JOIN norm2 USING (label)
"""


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar quantization (faiss-SQ8 style) of the embedding column to
    int8 codes: per vector, scale by max |component| and map each
    component to sign(v) * (|v| * 127 / maxabs). The whole computation
    runs on the exact fixed-point ints of functions/vectors.quantize
    with INTEGER division (Spark ``div`` == DuckDB ``//`` on
    non-negatives), so codes are bit-identical across engines -- float
    scaling would hash-diverge at rounding boundaries.

    Output is the per-vector code profile (scale, code sum, L1 mass,
    saturated-component count): the compressed representation a 100 TB
    ANN index would store (4x smaller than f32; dot products on int8
    SIMD). Pure per-row expressions -- no shuffle, no Python."""
    q = _quantized(spark, sf_dir).select(
        "vec_id",
        "label",
        "qv",
        F.expr("array_max(transform(qv, x -> abs(x)))").alias("maxabs_q"),
    )
    codes = q.withColumn(
        "codes",
        F.expr(
            "transform(qv, v -> CASE WHEN maxabs_q = 0 THEN 0L"
            " WHEN v < 0 THEN -((abs(v) * 127) div maxabs_q)"
            " ELSE (abs(v) * 127) div maxabs_q END)"
        ),
    )
    # expr-string aggregates (optimization r14): same plan, no py4j
    # lambda construction (~100 ms each, see functions/vectors.py)
    return codes.select(
        "vec_id",
        "label",
        "maxabs_q",
        F.expr(
            "aggregate(codes, CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("code_sum"),
        F.expr(
            "aggregate(codes, CAST(0 AS BIGINT), (a, x) -> a + abs(x))"
        ).alias("code_l1"),
        F.expr("size(filter(codes, x -> abs(x) = 127))").alias(
            "n_saturated"
        ),
    )


_Q = QUANTIZE_SQL.format(v="embedding")
EMBEDDING_QUANTIZE_SQL = f"""
WITH q AS (
  SELECT vec_id, label, {_Q} AS qv,
         list_max(list_transform({_Q}, x -> abs(x))) AS maxabs_q
  FROM embeddings
),
c AS (
  SELECT vec_id, label, maxabs_q,
         list_transform(qv, v -> CASE WHEN maxabs_q = 0 THEN 0
                                      WHEN v < 0 THEN -((abs(v) * 127) // maxabs_q)
                                      ELSE (abs(v) * 127) // maxabs_q END) AS codes
  FROM q
)
SELECT vec_id, label, maxabs_q,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       CAST(list_sum(list_transform(codes, x -> abs(x))) AS BIGINT) AS code_l1,
       CAST(len(list_filter(codes, x -> abs(x) = 127)) AS INTEGER) AS n_saturated
FROM c
"""


DIM = 64


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance matrix of the embedding columns (upper triangle, 2080
    pairs at dim 64) -- the PCA/whitening prep step of an embedding
    pipeline, computed in exact integer arithmetic: components are the
    fixed-point int64 of functions/vectors.quantize, cov numerator is
    n*sum(xy) - sum(x)*sum(y) (exact bigint), and only the single final
    division produces a double (identical in both engines). A float
    accumulation would hash-diverge on summation order.

    Scale shape: one posexplode (row-local), a self-equi-join on vec_id
    (co-partitioned shuffle, no cross product), a (i, j)-keyed aggregate
    of dim^2/2 groups with map-side partial sums, and two broadcast
    joins against the 64-row marginals. At extreme corpus sizes the
    bigint numerator would overflow around 1e9 rows at this fixed-point
    scale; the production knob is the int8 code path
    (embedding_quantize_int8), which bounds products at 127^2."""
    comps = (
        _quantized(spark, sf_dir)
        .select("vec_id", F.posexplode("qv").alias("i", "q"))
        .select("vec_id", (F.col("i") + 1).cast("int").alias("i"), "q")
    )
    sums = comps.groupBy("i").agg(F.sum("q").alias("s"))
    a, b = comps.alias("a"), comps.alias("b")
    pairs = (
        a.join(b, (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.i") <= F.col("b.i")))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("a.q") * F.col("b.q")).alias("s_xy"),
        )
    )
    sa = sums.select(F.col("i").alias("_i"), F.col("s").alias("s_i"))
    sb = sums.select(F.col("i").alias("_j"), F.col("s").alias("s_j"))
    # final combine in DOUBLE: the all-bigint numerator n*s_xy - s_i*s_j
    # overflows int64 at sf1 corpus sizes (s_xy ~ n * SCALE^2; the sf1
    # sweep caught it). The exact int64 partials convert to double with
    # one correctly-rounded IEEE conversion each, and the expression
    # tree below is written IDENTICALLY in the DuckDB oracle, so both
    # engines produce bit-equal doubles at any scale.
    nd = F.col("n").cast("double")
    num = (
        F.col("s_xy").cast("double") / nd
        - (F.col("s_i").cast("double") * F.col("s_j").cast("double"))
        / (nd * nd)
    )
    return (
        pairs.join(F.broadcast(sa), F.col("i") == F.col("_i"))
        .join(F.broadcast(sb), F.col("j") == F.col("_j"))
        .select(
            "i",
            "j",
            "n",
            (num / F.lit(float(SCALE) * float(SCALE))).alias("cov"),
        )
    )


def _covariance_sql() -> str:
    q = QUANTIZE_SQL.format(v="embedding")
    return f"""
WITH comps AS (
  SELECT vec_id, CAST(i AS INTEGER) AS i, qv[i] AS q
  FROM (SELECT vec_id, {q} AS qv FROM embeddings),
       unnest(range(1, {DIM + 1})) AS u(i)
),
sums AS (
  SELECT i, CAST(SUM(q) AS BIGINT) AS s FROM comps GROUP BY i
),
pairs AS (
  SELECT a.i AS i, b.i AS j, COUNT(*) AS n,
         CAST(SUM(a.q * b.q) AS BIGINT) AS s_xy
  FROM comps a JOIN comps b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
)
SELECT p.i, p.j, p.n,
       (CAST(p.s_xy AS DOUBLE) / CAST(p.n AS DOUBLE)
        - (CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE))
          / (CAST(p.n AS DOUBLE) * CAST(p.n AS DOUBLE)))
       / ({SCALE}.0 * {SCALE}.0) AS cov
FROM pairs p
JOIN sums sa ON p.i = sa.i
JOIN sums sb ON p.j = sb.i
"""


K_CLUSTERS = 8
KMEANS_ITERS = 3

# Assignment-strategy crossover, in k*dim units. Literal-centroid
# assignment evaluates k zip_with/aggregate lambda bodies PER ROW --
# interpreted HOF steps, not codegen arithmetic -- so its per-vector
# cost is ~k*dim lambda evaluations. The Arrow matmul path pays a
# fixed per-batch serialization cost and then ~k*dim*0.3ns of BLAS per
# vector, two orders of magnitude less per step. Measured at sf10
# (N=200k, k=447, the round-10 sweep): the literal path's four
# assignment passes dominated dedup_semantic at ~4 min; the matmul
# path runs them in seconds. Below the crossover (k <= 64 at dim 64:
# the k=8 certified queries) the literal path stays -- zero Python,
# no worker startup, sub-second anyway. Results are bit-identical on
# both sides of the line (pinned by
# test_broadcast_assign_bit_identical_to_literal), so the switch is
# invisible to every oracle. This is what lets SemDeDup's k = isqrt(N)
# run UNCAPPED: at a billion vectors k ~ 31623 is 16 MB of broadcast
# centroids, keeping the within-cluster pair stage at O(N^1.5 * dim)
# instead of re-opening the quadratic tail a fixed cluster ceiling
# would cause.
CENTROID_LITERAL_BUDGET = 4096


def _kmeans_floor_div(s: int, n: int) -> int:
    """Python // is floor division; the SQL twin spells it explicitly as
    (s - pmod(s, n)) / n so both engines round negatives identically."""
    return s // n


def _kmeans_assign(
    q: DataFrame,
    cents: list[list[int]],
    bc_holder: list | None = None,
) -> DataFrame:
    """Lloyd's assignment: (vec_id, qv, dist2, cluster_id) for every row
    of ``q``. Two physically different but bit-identical strategies,
    chosen by the crossover budget:

    - k*dim <= CENTROID_LITERAL_BUDGET: centroids ride the plan as
      LITERALS (the broadcast-free analog of MLlib's broadcast centroid
      array) -- map-only, zero shuffle, zero Python.
    - past the budget: centroids ship once per executor as an
      sc.broadcast numpy array and assignment is an Arrow-batched
      exact-int64 matmul (see _kmeans_assign_broadcast) -- still
      map-only, zero shuffle.

    Both compute exact int64 squared distances and break ties to the
    lowest cluster id, so which path ran is invisible to results."""
    if cents and len(cents) * len(cents[0]) > CENTROID_LITERAL_BUDGET:
        return _kmeans_assign_broadcast(q, cents, bc_holder)
    # one JVM-parsed expression instead of 3 nested py4j lambdas per
    # Lloyd iteration (optimization r14; identical plan -- centroids
    # are int literals either way, see functions/vectors.py)
    carr_sql = "array({})".format(
        ", ".join(
            "array({})".format(", ".join(str(int(c)) for c in cent))
            for cent in cents
        )
    )
    dists = F.expr(
        f"transform({carr_sql}, c -> aggregate("
        "zip_with(qv, c, (a, b) -> (a - b) * (a - b)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x))"
    )
    return q.select(
        "vec_id",
        "qv",
        F.array_min(dists).alias("dist2"),
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cluster_id"),
    )


def _kmeans_assign_broadcast(
    q: DataFrame,
    cents: list[list[int]],
    bc_holder: list | None = None,
) -> DataFrame:
    """Assignment via broadcast centroids + Arrow-batched numpy matmul,
    for k past the literal budget. This is the sanctioned vectorized-UDF
    seam: per-row HOF expressions cost O(k*dim) interpreted lambda steps
    per vector, and the round-10 sf100 sweep measured the previous
    BroadcastNestedLoopJoin fan-out at ~50 min PER assignment pass at
    N=2M, k=1414 on 32 cores (4 passes per SemDeDup run) -- dense
    linear algebra belongs in a BLAS matmul, not an expression tree.

    Shape: centroids ship ONCE per executor as an sc.broadcast numpy
    array (k*dim int64s; isqrt(1e9)*64 ~ 16 MB at a billion vectors),
    each Arrow batch computes all B*k distances as
    ``|q|^2 + |c|^2 - 2 Q @ C.T`` in exact int64 (numpy integer matmul
    is exact; the decomposition equals the literal path's
    sum-of-(a-b)^2 integer for every pair), and ``argmin`` takes the
    first occurrence of the minimum = the lowest cluster id -- the same
    tie-break as the literal path's array_position(array_min). Results
    are therefore bit-identical to the literal path (pinned by
    test_broadcast_assign_bit_identical_to_literal); which path ran is
    invisible to the oracle. Map-only: zero shuffle, qv rides the batch
    through (no re-attach join)."""
    import numpy as np

    spark = q.sparkSession
    carr = np.asarray(cents, dtype=np.int64)
    cn2 = np.einsum("ij,ij->i", carr, carr)  # |c|^2, exact int64
    bc = spark.sparkContext.broadcast((carr, cn2))
    if bc_holder is not None:
        # callers that consume the returned frame eagerly (the train
        # loop collects every iteration) unpersist via the holder --
        # otherwise k*dim*8 bytes leak per assignment pass on a
        # long-lived driver
        bc_holder.append(bc)

    def assign(batches):
        import numpy as _np
        import pandas as _pd

        ct = bc.value[0].T.copy()  # dim x k, contiguous for the matmul
        ccn2 = bc.value[1]
        for pdf in batches:
            if not len(pdf):
                continue
            qm = _np.array(list(pdf["qv"]), dtype=_np.int64)
            qn2 = _np.einsum("ij,ij->i", qm, qm)
            d2 = qn2[:, None] + ccn2[None, :] - 2 * (qm @ ct)
            cid = d2.argmin(axis=1)  # first min = lowest cluster id
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "qv": pdf["qv"],
                    "dist2": d2[_np.arange(len(pdf)), cid],
                    "cluster_id": cid.astype(_np.int32),
                }
            )

    return q.select("vec_id", "qv").mapInPandas(
        assign,
        schema="vec_id bigint, qv array<bigint>, dist2 bigint, "
        "cluster_id int",
    )


def _kmeans_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means working frame: (vec_id, qv) fixed-point int64.
    localCheckpoint: the qv array feeds k lambda bodies per iteration;
    CollapseProject would inline quantize's transform into each (the
    HOF re-evaluation trap, see dedup.py) and re-quantize k times per
    row. Pinning also lets every iteration re-read one materialization.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    return emb.select(
        "vec_id", quantize("embedding").alias("qv")
    ).localCheckpoint()


def _kmeans_train(q: DataFrame, k: int = K_CLUSTERS) -> list[list[int]]:
    """KMEANS_ITERS Lloyd's iterations; returns the final centroids
    (k x dim exact ints). Each iteration: map-only assignment, one
    combiner-friendly (cluster, dim) aggregation, a bounded k*dim
    driver collect.

    Seeding: the k SMALLEST vec_ids (one bounded TakeOrdered collect of
    k rows), cluster_id = rank of the seed's vec_id. With dense ids from
    0 this is identical to the historical ``vec_id < k`` seeding, but it
    does not ASSUME density -- offset or sparse id spaces (a sharded
    corpus whose ids start at 10^6, post-filter gaps) seed correctly
    instead of raising. The oracle CTE derives the same seed set via
    ROW_NUMBER() OVER (ORDER BY vec_id) <= k."""
    seed_rows = sorted(
        q.select("vec_id", "qv").orderBy("vec_id").limit(k).collect(),
        key=lambda r: r.vec_id,
    )
    if len(seed_rows) < k:
        raise ValueError(
            f"k-means needs k={k} distinct rows to seed; corpus has "
            f"only {len(seed_rows)}"
        )
    cents = [list(r.qv) for r in seed_rows]
    for _ in range(KMEANS_ITERS):
        bc_holder: list = []
        sums = (
            _kmeans_assign(q, cents, bc_holder)
            .select("cluster_id", F.posexplode("qv").alias("dim", "v"))
            .groupBy("cluster_id", "dim")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()  # bounded: at most k * DIM rows
        )
        for bc in bc_holder:  # collect() consumed the pass: free it
            bc.unpersist(False)
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cluster.setdefault(r.cluster_id, {})[r.dim] = (r.s, r.n)
        cents = [
            [
                _kmeans_floor_div(*by_cluster[c][d])
                for d in range(len(cents[c]))
            ]
            if c in by_cluster
            else cents[c]  # empty cluster keeps its centroid
            for c in range(k)
        ]
    return cents


def similarity_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (Lloyd's): the clustering pass an embedding
    curation pipeline runs before semantic dedup / mixture balancing
    (SemDeDup, DoReMi-style domain discovery). MLlib's exact execution
    shape, re-derived: per iteration, (1) assignment is a map-only pass
    against k centroid LITERALS -- no shuffle, no Python, cost O(k*dim)
    per row; (2) the update is posexplode -> groupBy(cluster, dim) with
    map-side partial sums, shuffling at most k*dim*partitions cells; (3)
    the driver collects exactly k*dim (sum, count) ints -- the same
    bounded driver loop MLlib uses (collectAsMap on k centers).

    Cross-engine exactness: components are fixed-point int64
    (functions/vectors.quantize), distances exact int64 sums, and the
    centroid update is FLOOR division (Python ``//`` == the SQL pmod
    spelling), so every iteration -- and therefore the final assignment
    -- is bit-identical in the DuckDB recursive-CTE replay. Ties break
    to the lowest cluster id in both engines. Seeds are the k lowest
    vec_ids (deterministic; k-means|| would be the production seeding,
    but seeding is orthogonal to the engine shape under test).

    At 100 TB: assignment stays map-only (centroids are kilobytes at
    any k*dim that fits a literal; beyond that, a broadcast join keyed
    on a constant), the update shuffle carries k*dim cells per map
    partition regardless of row count, and the driver holds k*dim ints
    -- nothing scales with the corpus but the scan itself.

    Reference scope: clustering is a §2.6 no-reference-implementation
    capability (SURVEY.md §2.6); the reference's analytics stop at SQL
    aggregates (query_data.py)."""
    q = _kmeans_quantized(spark, sf_dir)
    cents = _kmeans_train(q)
    final = _kmeans_assign(q, cents)
    cent_norm2 = {
        k: sum(c * c for c in cents[k]) for k in range(K_CLUSTERS)
    }
    norms = spark.createDataFrame(
        [(k, float(v)) for k, v in cent_norm2.items()],
        "cluster_id INT, centroid_norm2 DOUBLE",
    )
    return (
        final.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_vecs"),
            # exact int64 accumulation; double only at the boundary
            F.sum("dist2").cast("double").alias("inertia"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .join(F.broadcast(norms), "cluster_id")
        .select(
            "cluster_id", "n_vecs", "inertia", "min_vec_id",
            "centroid_norm2",
        )
        .orderBy("cluster_id")
    )


# (s - pmod(s, n)) is exactly divisible by n, so truncating integer
# division (//) equals floor division here -- and stays BIGINT (bare /
# would promote to DOUBLE in DuckDB)
_KMEANS_FDIV = "((s - (((s % n) + n) % n)) // n)"

# the shared k-means replay (recursive CTE) -- consumers append either
# a final SELECT or further CTEs (dedup.dedup_semantic reuses it).
# ``k_expr`` is a SQL expression for the cluster count: a literal for
# the fixed-k consumers, a COUNT-derived scalar subquery for the
# sqrt(N)-scaled SemDeDup path (its seeding is the only place k
# appears -- cluster ids then flow from the seeds).
def _kmeans_cte_sql(k_expr: str) -> str:
    return f"""
WITH RECURSIVE
q AS (
  SELECT vec_id, {QUANTIZE_SQL.format(v='embedding')} AS qv FROM embeddings
),
dims AS (
  SELECT vec_id, i - 1 AS dim, qv[i] AS v
  FROM q, unnest(range(1, {DIM + 1})) AS t(i)
),
seeds AS (
  SELECT vec_id, CAST(rk - 1 AS INTEGER) AS cluster_id
  FROM (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) AS rk FROM q)
  WHERE rk <= {k_expr}
),
cent(iter, cluster_id, dim, c) AS (
  SELECT 0, s.cluster_id, d.dim, d.v
  FROM seeds s JOIN dims d ON d.vec_id = s.vec_id
  UNION ALL
  SELECT prev.iter + 1, prev.cluster_id, prev.dim,
         CASE WHEN upd.n IS NULL THEN prev.c
              ELSE {_KMEANS_FDIV} END
  FROM cent prev
  LEFT JOIN (
    SELECT a.cluster_id, d2.dim,
           CAST(SUM(d2.v) AS BIGINT) AS s, COUNT(*) AS n
    FROM (
      SELECT vec_id, cluster_id FROM (
        SELECT d.vec_id, ct.cluster_id,
               ROW_NUMBER() OVER (
                 PARTITION BY d.vec_id
                 ORDER BY SUM((d.v - ct.c) * (d.v - ct.c)) ASC,
                          ct.cluster_id ASC
               ) AS rn
        FROM dims d JOIN cent ct ON d.dim = ct.dim
        GROUP BY d.vec_id, ct.cluster_id
      ) WHERE rn = 1
    ) a JOIN dims d2 USING (vec_id)
    GROUP BY 1, 2
  ) upd ON upd.cluster_id = prev.cluster_id AND upd.dim = prev.dim
  WHERE prev.iter < {KMEANS_ITERS}
),
final_cent AS (
  SELECT cluster_id, dim, c FROM cent WHERE iter = {KMEANS_ITERS}
),
asg AS (
  SELECT vec_id, cluster_id, dist2 FROM (
    SELECT d.vec_id, ct.cluster_id,
           CAST(SUM((d.v - ct.c) * (d.v - ct.c)) AS BIGINT) AS dist2,
           ROW_NUMBER() OVER (
             PARTITION BY d.vec_id
             ORDER BY SUM((d.v - ct.c) * (d.v - ct.c)) ASC,
                      ct.cluster_id ASC
           ) AS rn
    FROM dims d JOIN final_cent ct ON d.dim = ct.dim
    GROUP BY d.vec_id, ct.cluster_id
  ) WHERE rn = 1
)
"""


_KMEANS_CTE_SQL = _kmeans_cte_sql(str(K_CLUSTERS))

SIMILARITY_KMEANS_SQL = _KMEANS_CTE_SQL + """
SELECT a.cluster_id,
       COUNT(*) AS n_vecs,
       CAST(SUM(a.dist2) AS DOUBLE) AS inertia,
       MIN(a.vec_id) AS min_vec_id,
       cn.centroid_norm2
FROM asg a
JOIN (
  SELECT cluster_id,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS centroid_norm2
  FROM final_cent GROUP BY 1
) cn USING (cluster_id)
GROUP BY a.cluster_id, cn.centroid_norm2
ORDER BY a.cluster_id
"""


QUERIES = {
    "similarity_topk_bruteforce": similarity_topk_bruteforce,
    "similarity_topk_lsh": similarity_topk_lsh,
    "similarity_label_stats": similarity_label_stats,
    "similarity_topk_ivf": similarity_topk_ivf,
    "similarity_centroids": similarity_centroids,
    "similarity_kmeans": similarity_kmeans,
    "embedding_quantize_int8": embedding_quantize_int8,
    "embedding_covariance": embedding_covariance,
}

ORACLES = {
    "similarity_kmeans": SIMILARITY_KMEANS_SQL,
    "similarity_topk_bruteforce": SIMILARITY_TOPK_SQL,
    "similarity_topk_lsh": _lsh_sql(),
    "similarity_label_stats": SIMILARITY_LABEL_STATS_SQL,
    "similarity_topk_ivf": _ivf_sql(),
    "similarity_centroids": SIMILARITY_CENTROIDS_SQL,
    "embedding_quantize_int8": EMBEDDING_QUANTIZE_SQL,
    "embedding_covariance": _covariance_sql(),
}
