"""Round-10 k-means scale hardening (VERDICT r9 #1 and #5).

Two failure classes the fixed-k / dense-id implementation had:

1. The 1024-cluster literal cap re-opened SemDeDup's quadratic
   pair-join tail past ~1M vectors.  Now ``_kmeans_assign`` switches to
   an Arrow-batched broadcast-centroid matmul past
   ``CENTROID_LITERAL_BUDGET`` and k is uncapped; these tests force the
   broadcast path (budget monkeypatch) and pin both bit-identical
   results and the map-only MapInPandas plan shape.  The sf100 sweep
   then showed the pair stage itself (cluster_id equi-join + HOF dot
   per pair row) projecting to hours at N=2M, so pairs are now a
   grouped exact-int64 gram matmul -- test_semantic_pair_stage_matches_
   reference_join pins it against the old join formulation.

2. Seeding assumed vec_ids are dense from 0 (``seed_rows[i] for i in
   range(k)`` raised KeyError on any gap).  Seeding is now the k
   smallest vec_ids; the hostile fixture here uses ids starting at 10^6
   with gaps, checked against the DuckDB oracle end-to-end.
"""

from __future__ import annotations

import os
import tempfile

import duckdb
import pyspark.sql.functions as F
import pytest

from sample_for_transactional_datalake_using_s3tables_spark.operators import dedup, similarity

from .oracle_utils import compare

# Long-tail battery: excluded from the default gate (VERDICT r13 #4
# -- the full suite outgrew the driver's verification budget). Run
# everything with:  python -m pytest tests/ -q -m "slow or not slow"
pytestmark = pytest.mark.slow


DIM = 64


def _write_embeddings(spark, d: str, ids: list[int]) -> None:
    """Deterministic 4-cluster corpus over arbitrary vec_ids."""
    rows = []
    for n, i in enumerate(ids):
        center = n % 4
        vec = [
            float(center) + ((i * 31 + j * 17) % 97) / 97.0
            for j in range(DIM)
        ]
        rows.append((i, vec, center))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))


def _embeddings_con(d: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Spark writes a part-file directory under the .parquet name
    path = os.path.join(d, "embeddings.parquet", "*.parquet")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')"
    )
    return con


# ids start at 10^6 with irregular gaps -- the shape a sharded or
# post-filter corpus actually has
SPARSE_IDS = [10**6 + 13 * i + (i % 5) for i in range(80)]


@pytest.fixture(scope="module")
def sparse_dir(spark):
    with tempfile.TemporaryDirectory() as d:
        _write_embeddings(spark, d, SPARSE_IDS)
        yield d


def test_kmeans_sparse_offset_ids_match_oracle(spark, sparse_dir):
    out = similarity.similarity_kmeans(spark, sparse_dir)
    con = _embeddings_con(sparse_dir)
    compare(out, con, similarity.SIMILARITY_KMEANS_SQL, "kmeans_sparse")


def test_dedup_semantic_sparse_offset_ids_match_oracle(spark, sparse_dir):
    out = dedup.dedup_semantic(spark, sparse_dir)
    con = _embeddings_con(sparse_dir)
    compare(
        out, con, dedup.ORACLES["dedup_semantic"], "semantic_sparse"
    )


def test_kmeans_train_refuses_undersized_corpus(spark):
    with tempfile.TemporaryDirectory() as d:
        _write_embeddings(spark, d, [5, 9, 11])
        q = similarity._kmeans_quantized(spark, d)
        with pytest.raises(ValueError, match="k=8"):
            similarity._kmeans_train(q, k=8)


def test_broadcast_assign_bit_identical_to_literal(spark, sf_dir_small):
    """The two assignment strategies are result-indistinguishable."""
    q = similarity._kmeans_quantized(spark, sf_dir_small)
    cents = similarity._kmeans_train(q, k=16)
    lit = similarity._kmeans_assign(q, cents)
    bc = similarity._kmeans_assign_broadcast(q, cents)
    assert lit.columns == bc.columns
    key = lambda r: r.vec_id  # noqa: E731
    lrows = sorted(lit.collect(), key=key)
    brows = sorted(bc.collect(), key=key)
    assert [
        (r.vec_id, list(r.qv), r.dist2, r.cluster_id) for r in lrows
    ] == [(r.vec_id, list(r.qv), r.dist2, r.cluster_id) for r in brows]


def test_broadcast_assign_plan_shape(spark, sf_dir_small):
    """Past the literal budget: assignment is a map-only Arrow batch
    pass (MapInPandas; centroids ride an sc.broadcast, never the plan)
    with NO shuffle and NO k*dim literal array."""
    q = similarity._kmeans_quantized(spark, sf_dir_small)
    cents = similarity._kmeans_train(q, k=16)
    plan = similarity._kmeans_assign_broadcast(q, cents)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # map-only: zero shuffle
    # the literal path would embed every centroid component; the
    # broadcast path must not
    assert str(cents[0][0]) + ", " + str(cents[0][1]) not in plan


def test_semantic_dedup_forced_broadcast_path(
    spark, sf_dir_small, monkeypatch
):
    """dedup_semantic with the literal budget forced to 0: every
    assignment runs the broadcast path, and the result still
    hash-matches the DuckDB oracle (the oracle has no notion of which
    physical strategy ran -- which is the point)."""
    monkeypatch.setattr(similarity, "CENTROID_LITERAL_BUDGET", 0)
    out = dedup.dedup_semantic(spark, sf_dir_small)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    con = duckdb.connect()
    path = os.path.join(sf_dir_small, "embeddings.parquet")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')"
    )  # testdata is a single file, no glob needed
    compare(
        out, con, dedup.ORACLES["dedup_semantic"], "semantic_broadcast"
    )


def test_semantic_pair_stage_matches_reference_join(spark, sparse_dir):
    """The grouped gram-matmul pair stage returns exactly what the
    round-9 cluster_id equi-join + cosine_from_ints formulation did --
    same exact-int dots, same ieee754 double cosine, same >= decision,
    row for row (run on the hostile sparse-id fixture for good
    measure)."""
    import pyspark.sql.functions as F

    from sample_for_transactional_datalake_using_s3tables_spark.functions.vectors import (
        cosine_from_ints,
        dot_int,
    )

    new = {
        r.cluster_id: (r.n_vecs, r.n_dup_pairs, r.n_removed, r.n_kept)
        for r in dedup.dedup_semantic(spark, sparse_dir).collect()
    }

    # reference: the pre-vectorization join formulation, verbatim
    q = similarity._kmeans_quantized(spark, sparse_dir)
    k = max(similarity.K_CLUSTERS, 8)  # isqrt(80) = 8
    cents = similarity._kmeans_train(q, k=k)
    asg = (
        similarity._kmeans_assign(q, cents)
        .select("vec_id", "cluster_id", "qv")
        .withColumn("n2", dot_int(F.col("qv"), F.col("qv")))
    )
    cos = cosine_from_ints(
        dot_int(F.col("a.qv"), F.col("b.qv")),
        F.col("a.n2"),
        F.col("b.n2"),
    )
    dup_pairs = (
        asg.alias("a")
        .join(
            asg.alias("b"),
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("cos", cos)
        .filter(F.col("cos") >= dedup.SEMDEDUP_COS)
        .select(
            F.col("a.cluster_id").alias("cluster_id"),
            F.col("b.vec_id").alias("removed"),
        )
    )
    removed = dup_pairs.groupBy("cluster_id").agg(
        F.count("*").alias("n_dup_pairs"),
        F.countDistinct("removed").alias("n_removed"),
    )
    ref_rows = (
        asg.groupBy("cluster_id")
        .agg(F.count("*").alias("n_vecs"))
        .join(removed, "cluster_id", "left")
        .collect()
    )
    ref = {
        r.cluster_id: (
            r.n_vecs,
            r.n_dup_pairs or 0,
            r.n_removed or 0,
            r.n_vecs - (r.n_removed or 0),
        )
        for r in ref_rows
    }
    assert new == ref
    # the fixture must actually exercise the dup path
    assert any(v[1] > 0 for v in new.values())


def test_uncapped_k_formula():
    """k = max(8, isqrt(N)) with no ceiling: spot the decades."""
    import math

    for n, want in [(100, 10), (500, 22), (4_000_000, 2000),
                    (10**9, 31622)]:
        assert max(8, math.isqrt(n)) == want
    assert "LEAST" not in dedup.ORACLES["dedup_semantic"]
