"""Expression-tree MV routing (VERDICT r12 #1).

The matcher classifies the ANALYZED plan (mvmatch.plan_shape), so
view-wrapped aggregates, alias renames -- including adversarial
alias CAPTURE, where a view swaps two column names -- reordered
commutative operands, expression group keys and HAVING-hoisted hidden
aggregates all route; every routed result is bit-compared against the
direct (routing-off) run: same schema, same rows. Unsound shapes
(non-key filters, compound aggregates, HAVING inside the definition,
time-varying predicates, stale MVs) must fall through to the source
scan and still return correct results.

Reference analog: the Athena presentation-layer views at
scripts/update_metadata.py:78-117 (dashboards query VIEWS, not base
tables -- the shape the text classifier could never route).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import WarehouseSQL
from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import Warehouse

# Long-tail battery: excluded from the default gate (VERDICT r13 #4).
# Run everything with:  python -m pytest tests/ -q -m "slow or not slow"
pytestmark = pytest.mark.slow


S = StructType(
    [
        StructField("k", StringType(), False),
        StructField("g", StringType()),
        StructField("v", LongType()),
        StructField("w", LongType()),
    ]
)


@pytest.fixture(scope="module")
def env(spark):
    with tempfile.TemporaryDirectory() as d:
        wh = Warehouse(spark, d)
        wh.create_namespace("ns")
        wh.create_table("ns", "t", S)
        wh.insert(
            "ns", "t",
            spark.createDataFrame(
                [(f"k{i}", f"g{i % 3}", i, i * i) for i in range(30)], S
            ).coalesce(2),
        )
        sql = WarehouseSQL(wh)
        sql.execute(
            "CREATE MATERIALIZED VIEW ns.mv AS "
            "SELECT g, SUM(v) AS total, COUNT(*) AS n, AVG(w) AS mw, "
            "SUM(v + w) AS tvw, COUNT(DISTINCT k) AS dk "
            "FROM ns.t GROUP BY g"
        )
        sql.execute("REFRESH MATERIALIZED VIEW ns.mv")
        sql.execute(
            "CREATE VIEW ns.vw AS "
            "SELECT g, SUM(v) AS total FROM ns.t GROUP BY g"
        )
        sql.execute(
            "CREATE VIEW ns.proj AS SELECT k, g AS grp, v, w FROM ns.t"
        )
        yield wh, sql, spark


def _run(sql, stmt, expect_route):
    """Execute routed and direct; assert bit-equality and the expected
    routing decision. Returns the routed rows."""
    before = sql.mv_route_count
    routed_df = sql.execute(stmt)
    routed_rows = sorted(tuple(r) for r in routed_df.collect())
    did_route = sql.mv_route_count > before
    sql.mv_routing = False
    try:
        direct_df = sql.execute(stmt)
        direct_rows = sorted(tuple(r) for r in direct_df.collect())
    finally:
        sql.mv_routing = True
    # names + types must match exactly; nullability is advisory in
    # Spark (a storage read is nullable where a COUNT literal is not)
    assert [
        (f.name, f.dataType) for f in routed_df.schema.fields
    ] == [(f.name, f.dataType) for f in direct_df.schema.fields], stmt
    assert routed_rows == direct_rows, stmt
    assert did_route == expect_route, (
        f"{stmt}: routed={did_route}, expected {expect_route}"
    )
    return routed_rows


# -- view-wrapped routing (the headline) --

def test_view_wrapping_aggregate_routes(env):
    _, sql, _ = env
    _run(sql, "SELECT * FROM ns.vw", True)


def test_view_where_on_key_conjoins_as_refinement(env):
    _, sql, _ = env
    _run(sql, "SELECT * FROM ns.vw WHERE g = 'g1'", True)
    _run(sql, "SELECT * FROM ns.vw WHERE g IN ('g0', 'g2')", True)
    _run(sql, "SELECT * FROM ns.vw WHERE total > 100", True)


def test_group_by_over_projection_view_routes(env):
    _, sql, _ = env
    _run(sql, "SELECT grp, SUM(v) AS total FROM ns.proj GROUP BY grp", True)
    _run(
        sql,
        "SELECT grp, AVG(w) AS mw FROM ns.proj GROUP BY grp",
        True,
    )


def test_nested_view_with_renames_routes(env):
    _, sql, _ = env
    sql.execute(
        "CREATE VIEW ns.vr AS SELECT g AS grp, total AS t2 FROM ns.vw"
    )
    _run(sql, "SELECT * FROM ns.vr", True)
    _run(sql, "SELECT grp, t2 FROM ns.vr WHERE t2 > 100", True)


def test_alias_capture_swapped_names(env):
    """A view that SWAPS two column names: ``v`` in the query means
    base ``g`` and vice versa. Text matching would serve the wrong
    columns; the tree resolves through the rename."""
    _, sql, _ = env
    sql.execute(
        "CREATE VIEW ns.swap AS SELECT g AS v, v AS g, w FROM ns.t"
    )
    rows = _run(sql, "SELECT v, SUM(g) AS s FROM ns.swap GROUP BY v", True)
    # v (= base g) has 3 groups; SUM(g) is the sum of base v
    assert len(rows) == 3


def test_having_with_hidden_aggregate_over_view(env):
    _, sql, _ = env
    _run(
        sql,
        "SELECT grp, SUM(v) AS total FROM ns.proj GROUP BY grp "
        "HAVING COUNT(*) > 5 AND AVG(w) > 100",
        True,
    )


def test_expression_group_key_refinement(env):
    """Refinement conjuncts over EXPRESSION keys (year(ts)-style):
    only the tree path can substitute the whole key subtree."""
    _, sql, _ = env
    sql.execute(
        "CREATE MATERIALIZED VIEW ns.bucketmv AS "
        "SELECT v % 3 AS bucket, SUM(w) AS tw FROM ns.t GROUP BY v % 3"
    )
    sql.execute("REFRESH MATERIALIZED VIEW ns.bucketmv")
    _run(
        sql,
        "SELECT v % 3 AS bucket, SUM(w) AS tw FROM ns.t "
        "WHERE v % 3 = 1 GROUP BY v % 3",
        True,
    )


def test_commutative_operand_reorder_matches(env):
    _, sql, _ = env
    _run(sql, "SELECT g, SUM(w + v) AS tvw FROM ns.t GROUP BY g", True)


def test_coarser_grain_and_global_through_view(env):
    _, sql, _ = env
    _run(sql, "SELECT SUM(v) AS total FROM ns.proj", True)
    _run(sql, "SELECT AVG(w) AS mw FROM ns.proj", True)  # hidden partials
    _run(sql, "SELECT COUNT(*) AS n FROM ns.proj", True)


def test_distinct_keys_through_view(env):
    _, sql, _ = env
    _run(sql, "SELECT DISTINCT grp FROM ns.proj", True)


def test_count_distinct_equal_grain_only(env):
    _, sql, _ = env
    _run(sql, "SELECT g, COUNT(DISTINCT k) AS dk FROM ns.t GROUP BY g", True)
    # coarser grain: distinct counts don't re-aggregate
    _run(sql, "SELECT COUNT(DISTINCT k) AS dk FROM ns.t", False)


def test_order_by_limit_tail_over_view_route(env):
    _, sql, _ = env
    _run(
        sql,
        "SELECT * FROM ns.vw WHERE total > 10 ORDER BY total DESC LIMIT 2",
        True,
    )


# -- adversarial no-route cases (must stay correct via direct scan) --

def test_non_key_view_filter_refuses(env):
    _, sql, _ = env
    sql.execute(
        "CREATE VIEW ns.vf AS SELECT g, v FROM ns.t WHERE w > 100"
    )
    _run(sql, "SELECT g, SUM(v) AS total FROM ns.vf GROUP BY g", False)


def test_compound_aggregate_refuses(env):
    _, sql, _ = env
    _run(
        sql,
        "SELECT g, SUM(v) / SUM(w) AS ratio FROM ns.t GROUP BY g",
        False,
    )


def test_unknown_aggregate_refuses(env):
    _, sql, _ = env
    _run(
        sql,
        "SELECT grp, percentile_approx(v, 0.5) AS p50 FROM ns.proj "
        "GROUP BY grp",
        False,
    )


def test_mv_def_with_having_never_serves_undiltered_query(env):
    _, sql, _ = env
    sql.execute(
        "CREATE MATERIALIZED VIEW ns.hmv AS "
        "SELECT g, SUM(v) AS total FROM ns.t GROUP BY g "
        "HAVING SUM(v) > 10000"
    )
    sql.execute("REFRESH MATERIALIZED VIEW ns.hmv")
    # the same text minus HAVING must NOT serve from hmv's storage
    # (its groups are a filtered subset); ns.mv still serves it
    rows = _run(sql, "SELECT g, SUM(v) AS total FROM ns.t GROUP BY g", True)
    assert len(rows) == 3
    assert sql._last_mv_route != "ns.hmv"
    sql.execute("DROP MATERIALIZED VIEW ns.hmv")


def test_time_varying_predicate_never_routes(env):
    _, sql, _ = env
    sql.execute(
        "CREATE MATERIALIZED VIEW ns.tvmv AS "
        "SELECT g, SUM(v) AS total FROM ns.t "
        "WHERE v >= 0 AND k < CONCAT('z', CAST(CURRENT_DATE AS STRING)) "
        "GROUP BY g"
    )
    sql.execute("REFRESH MATERIALIZED VIEW ns.tvmv")
    _run(
        sql,
        "SELECT g, SUM(v) AS total FROM ns.t "
        "WHERE v >= 0 AND k < CONCAT('z', CAST(CURRENT_DATE AS STRING)) "
        "GROUP BY g",
        False,
    )
    sql.execute("DROP MATERIALIZED VIEW ns.tvmv")


def test_stale_mv_never_routes_through_view(env):
    wh, sql, spark = env
    wh.insert("ns", "t", spark.createDataFrame([("k99", "g0", 7, 9)], S))
    try:
        _run(sql, "SELECT * FROM ns.vw", False)
    finally:
        sql.execute("REFRESH MATERIALIZED VIEW ns.mv")
        sql.execute("REFRESH MATERIALIZED VIEW ns.bucketmv")
    _run(sql, "SELECT * FROM ns.vw", True)


def test_join_and_subquery_refuse(env):
    _, sql, _ = env
    _run(
        sql,
        "SELECT a.g, SUM(a.v) AS total FROM ns.t a "
        "JOIN ns.t b ON a.k = b.k GROUP BY a.g",
        False,
    )
    _run(
        sql,
        "SELECT g, SUM(v) AS total FROM ns.t "
        "WHERE k IN (SELECT k FROM ns.t WHERE w > 100) GROUP BY g",
        False,
    )


def test_view_with_order_limit_inside_refuses(env):
    _, sql, _ = env
    sql.execute(
        "CREATE VIEW ns.vtop AS "
        "SELECT g, v FROM ns.t ORDER BY v DESC LIMIT 10"
    )
    _run(sql, "SELECT g, SUM(v) AS total FROM ns.vtop GROUP BY g", False)


def test_governed_session_never_tree_routes(env):
    wh, sql, spark = env
    wh.grant("alice", "ns", "t", permissions=("SELECT",))
    gov = WarehouseSQL(wh, principal="alice")
    before_routes = sql.mv_route_count
    df = gov.execute("SELECT * FROM ns.vw")
    assert sorted(tuple(r) for r in df.collect())
    assert gov.mv_route_count == 0
    assert sql.mv_route_count == before_routes
