"""Plan-shape regression tests: the physical properties that make the
queries 100 TB-viable, asserted on executed plans so they can't silently
regress (SURVEY scale notes; VERDICT round-1 plan audit).

- filters and column pruning reach the parquet scan (forecast_revenue)
- dimension joins broadcast, never sort-merge (revenue_by_region)
- top-k plans as TakeOrderedAndProject, not a global sort (topk)
- the dedup candidate joins key on LSH buckets, not bare blocks
"""

from __future__ import annotations

from sample_for_transactional_datalake_using_s3tables_spark.operators import (
    dedup,
    pipeline,
    relational,
    sampling,
    text,
)

SF_SMALL = "/root/testdata/sf0.001"


def _executed(df) -> str:
    # execute THIS Dataset (a write would run a separate QueryExecution),
    # so AQE finalizes the plan we assert on
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=false" not in plan
    return plan


def test_filter_and_column_pushdown(spark):
    plan = _executed(relational.forecast_revenue(spark, SF_SMALL))
    assert "PushedFilters: [" in plan
    # the three selective predicates reach the parquet reader
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in plan or f"GreaterThan({col}" in plan or (
            f"{col}" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
        ), f"filter on {col} not pushed"
    # column pruning: the scan reads only the 4 referenced columns
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_extendedprice" in read_schema and "l_comment" not in read_schema


def test_dimension_joins_broadcast(spark):
    plan = _executed(relational.revenue_by_region(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dimension join fell back to SMJ"


def test_topk_is_take_ordered(spark):
    plan = _executed(relational.topk(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, "top-k planned as a global sort"


def test_bernoulli_sample_is_shuffle_free(spark):
    plan = _executed(sampling.sample_bernoulli(spark, SF_SMALL))
    assert "Exchange" not in plan, "hash-sample filter introduced a shuffle"
    # column pruning holds: only the 5 output columns are read
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "props" not in read_schema


def test_curation_pipeline_shuffle_budget(spark):
    """The composed chain keeps its two semantic shuffles (content-hash
    window, final aggregate) plus the explicit spread() repartition --
    regression guard against a stage accidentally adding exchanges."""
    plan = _executed(pipeline.curation_pipeline(spark, SF_SMALL))
    # AQE's toString appends the pre-adaptive "Initial Plan" subtree --
    # count exchanges only in the final plan section above it.
    final_section = plan.split("Initial Plan")[0]
    n_exchanges = sum(
        1
        for l in final_section.splitlines()
        if "Exchange" in l and "Reused" not in l
    )
    assert n_exchanges <= 4, f"curation pipeline grew to {n_exchanges} exchanges"
    assert "Generate explode" in plan  # chunking stays a generator, not a join


def test_salted_join_keys_on_salt(spark):
    plan = _executed(relational.join_salted_skew(spark, SF_SMALL))
    joins = [l for l in plan.splitlines() if "SortMergeJoin" in l]
    assert joins, "salted join was not planned as a shuffle join"
    assert any("_salt" in l for l in joins), "join keys lost the salt column"
    assert "BroadcastHashJoin" not in plan


def test_bucketed_join_has_no_exchange(spark):
    """The co-located join runs shuffle-free end to end: both bucketed
    scans report the same HashPartitioning, so neither the SortMergeJoin
    nor the bucket-keyed aggregation plans an Exchange."""
    plan = _executed(relational.join_bucketed_colocated(spark, SF_SMALL))
    final_section = plan.split("Initial Plan")[0]
    assert "SortMergeJoin" in final_section
    assert not any(
        "Exchange" in l and "Reused" not in l
        for l in final_section.splitlines()
    ), "bucketed co-located join introduced a shuffle"
    assert "Bucketed: true" in plan, "scan did not use the bucketed layout"


def test_dedup_candidates_join_on_buckets(spark):
    plan = _executed(dedup.dedup_ngram_jaccard(spark, SF_SMALL))
    joins = [l for l in plan.splitlines() if "HashJoin" in l or "SortMergeJoin" in l]
    assert any(
        "band_key" in l and "band_id" in l and "lang" in l for l in joins
    ), "ngram candidate join lost its MinHash band keys"

    plan = _executed(dedup.dedup_embedding(spark, SF_SMALL))
    joins = [l for l in plan.splitlines() if "HashJoin" in l or "SortMergeJoin" in l]
    assert any(
        "bucket" in l and "table_id" in l and "label" in l for l in joins
    ), "embedding candidate join lost its sign-LSH bucket keys"


def test_distinctive_terms_no_cartesian(spark):
    """tf-vs-df join keys on term; no broadcast-nested-loop blowup."""
    from sample_for_transactional_datalake_using_s3tables_spark.operators import text

    plan = _executed(text.distinctive_terms(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    joins = [l for l in plan.splitlines() if "HashJoin" in l or "SortMergeJoin" in l]
    assert any("term" in l for l in joins), "tf/df join lost the term key"


def test_quantize_int8_stays_rowlocal(spark):
    """SQ8 encoding is per-row: no join, no aggregate exchange, no Python."""
    from sample_for_transactional_datalake_using_s3tables_spark.operators import (
        similarity,
    )

    plan = _executed(similarity.embedding_quantize_int8(spark, SF_SMALL))
    assert "Join" not in plan
    assert "EvalPython" not in plan and "FlatMapsInPandas" not in plan
    # the only exchange is the explicit spread() repartition
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    assert all("REPARTITION" in l for l in exchanges), exchanges


def test_attribution_join_is_equi_join(spark):
    """Stream-stream join's batch twin: equi-join on user_id with the
    range condition post-filtered -- never a nested-loop cross."""
    from sample_for_transactional_datalake_using_s3tables_spark.operators import (
        streamwin,
    )

    plan = _executed(streamwin.stream_attribution_join(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    joins = [l for l in plan.splitlines() if "HashJoin" in l or "SortMergeJoin" in l]
    assert any("user_id" in l for l in joins), "attribution join lost user_id key"


def test_text_scans_stay_map_only(spark):
    """Repetition + PII are per-row passes: no shuffle beyond spread(),
    no Python, and the scan prunes to the referenced columns."""
    from sample_for_transactional_datalake_using_s3tables_spark.operators import text

    for fn in (text.repetition_stats, text.pii_redaction):
        plan = _executed(fn(spark, SF_SMALL))
        assert "EvalPython" not in plan and "InPandas" not in plan
        exchanges = [l for l in plan.splitlines() if "Exchange" in l]
        assert all("REPARTITION" in l for l in exchanges), (fn.__name__, exchanges)
        read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
        assert "text" in read_schema and "lang" not in read_schema


def test_mixture_resample_broadcasts_plan(spark):
    """Pass-2 joins the corpus against the tiny per-source plan via
    broadcast -- the corpus is never shuffled on source."""
    plan = _executed(sampling.mixture_resample(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_pack_prunes_before_arrow(spark):
    """Only (doc_id, source, n_tokens) crosses the Arrow boundary; the
    token counting happens JVM-side before the groupBy shuffle."""
    plan = _executed(pipeline.sequence_pack(spark, SF_SMALL))
    assert "FlatMapGroupsInPandas" in plan
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "text" in read_schema and "lang" not in read_schema
    # the Arrow exchange hashes on the group key only
    assert "hashpartitioning(source" in plan


def test_covariance_joins_are_keyed(spark):
    """Self-join on vec_id (no cross product); marginals broadcast."""
    from sample_for_transactional_datalake_using_s3tables_spark.operators import (
        similarity,
    )

    plan = _executed(similarity.embedding_covariance(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    joins = [l for l in plan.splitlines() if "Join" in l]
    assert any("vec_id" in l for l in joins), "pair join lost vec_id key"
    assert "BroadcastHashJoin" in plan, "marginal joins should broadcast"


def test_stream_enrich_is_broadcast(spark):
    from sample_for_transactional_datalake_using_s3tables_spark.operators import (
        streamwin,
    )

    plan = _executed(streamwin.stream_static_enrich(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_segment_dedup_shuffle_budget(spark):
    """Span-level dedup is linear: one explode (map-side generate),
    keep-first as a combiner-friendly hash aggregate (partial_min in
    the map stage -- the skew armor: a 10^9-copy boilerplate segment
    collapses per map task) joined back on the segment, one shuffle on
    doc_id to reassemble -- never a pairwise or cartesian join."""
    plan = _executed(text.segment_dedup(spark, SF_SMALL))
    final_section = plan.split("Initial Plan")[0]
    n_exchanges = sum(
        1
        for l in final_section.splitlines()
        if "Exchange" in l and "Reused" not in l
    )
    assert n_exchanges <= 4, f"segment dedup grew to {n_exchanges} exchanges"
    assert "Generate posexplode" in plan
    assert "partial_min" in plan, "keep-first lost its map-side combine"
    assert "CartesianProduct" not in plan


def test_segment_dedup_keeps_first_occurrence(spark):
    """Hand corpus: a span shared by two docs (and repeated within one)
    survives only at its first (doc_id, pos) occurrence."""
    import os
    import tempfile

    boiler = " ".join(f"b{i}" for i in range(10))  # one full 10-word span
    u1 = " ".join(f"x{i}" for i in range(10))
    u2 = " ".join(f"y{i}" for i in range(10))
    rows = [
        (0, f"{boiler} {u1}", "en", "s", 0),
        (1, f"{u2} {boiler}", "en", "s", 0),  # dup span at pos 1
        (2, boiler, "en", "s", 0),            # doc entirely boilerplate
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r.doc_id: (r.n_segments, r.n_kept, r.dedup_text)
            for r in text.segment_dedup(spark, d).collect()
        }
    assert got[0] == (2, 2, f"{boiler} {u1}")
    assert got[1] == (2, 1, u2)
    assert got[2] == (1, 0, "")


def test_semantic_dedup_pairs_grouped_on_cluster(spark):
    """SemDeDup's pair generation never leaves a cluster_id group: the
    plan is a cluster_id-keyed Arrow group stage (one shuffle of ~N
    rows), with no cartesian/BNLJ blowup and no pair-row join at all
    (the paper's whole scaling point, plus the round-10 vectorization:
    the gram matmul happens inside the group, so sum(n_c^2) pair rows
    never materialize in the plan)."""
    plan = _executed(dedup.dedup_semantic(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan
    grouped = [
        l for l in plan.splitlines()
        if "FlatMapGroupsInPandas" in l or "hashpartitioning" in l
    ]
    assert any("cluster_id" in l for l in grouped), (
        "semantic-dedup pair stage lost its cluster key"
    )


def test_lm_perplexity_model_joins_are_keyed(spark):
    """The bigram-LM scoring joins key on (a, b) / (a); the only
    nested-loop is the broadcast of the 1-row vocab scalar."""
    plan = _executed(text.lm_perplexity(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    joins = [
        l for l in plan.splitlines()
        if "HashJoin" in l or "SortMergeJoin" in l
    ]
    assert any("a#" in l and "b#" in l for l in joins), (
        "bigram model join lost its (a, b) keys"
    )


def test_kmeans_assignment_is_map_only(spark):
    """Lloyd's assignment against literal centroids plans with NO join
    and NO exchange before the final aggregation -- the broadcast-free
    map-only shape that makes the iteration scan-bound at 100 TB."""
    from sample_for_transactional_datalake_using_s3tables_spark.operators import similarity

    q = similarity._kmeans_quantized(spark, SF_SMALL)
    cents = similarity._kmeans_train(q)
    assigned = similarity._kmeans_assign(q, cents)
    plan = _executed(assigned)
    assert "Join" not in plan
    assert "Exchange" not in plan
