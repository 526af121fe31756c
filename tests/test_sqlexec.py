"""SQL-text DML router (sources/sqlexec.py): the Athena-on-Iceberg
statement surface (SELECT / INSERT / DELETE / UPDATE / MERGE INTO) routed
onto the transactional warehouse, with predicate pushdown for simple
WHERE conjunctions and conservative rejection of unsupported shapes.
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

SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("day", StringType()),
        StructField("v", LongType()),
    ]
)


@pytest.fixture()
def sql(spark):
    with tempfile.TemporaryDirectory() as d:
        wh = Warehouse(spark, d)
        wh.create_namespace("ns")
        wh.create_table("ns", "t", SCHEMA, key="id", partition_by="day")
        rows = [(f"k{i}", f"d{i % 2}", i) for i in range(20)]
        wh.insert("ns", "t", spark.createDataFrame(rows, SCHEMA).coalesce(1))
        yield WarehouseSQL(wh)


def _state(sql):
    return {
        (r.id, r.day, r.v)
        for r in sql.execute("SELECT * FROM ns.t").collect()
    }


def test_select_reads_snapshot(sql):
    got = sql.execute("SELECT id, v FROM ns.t WHERE v < 3 ORDER BY id")
    assert [(r.id, r.v) for r in got.collect()] == [("k0", 0), ("k1", 1), ("k2", 2)]


def test_select_join_and_agg(sql):
    # arbitrary Spark SQL over the rewritten view, including self-joins
    got = sql.execute(
        "SELECT a.day, COUNT(*) AS n FROM ns.t a JOIN ns.t b ON a.id = b.id "
        "GROUP BY a.day ORDER BY a.day"
    ).collect()
    assert [(r.day, r.n) for r in got] == [("d0", 10), ("d1", 10)]


def test_delete_simple_predicate_is_pruned(sql):
    res = sql.execute("DELETE FROM ns.t WHERE v >= 15")
    assert res["deleted_rows"] == 5
    # tuple-predicate path: manifest skipping engaged (observable stats)
    assert res["probed_files"] <= res["manifest_files"]
    assert {r[0] for r in _state(sql)} == {f"k{i}" for i in range(15)}


def test_delete_complex_predicate_column_path(sql):
    res = sql.execute("DELETE FROM ns.t WHERE v % 2 = 1 AND day = 'd1'")
    assert res["deleted_rows"] == 10
    assert {r[0] for r in _state(sql)} == {f"k{i}" for i in range(0, 20, 2)}


def test_update_with_expression(sql):
    res = sql.execute(
        "UPDATE ns.t SET v = v * 10, day = upper(day) WHERE v < 2"
    )
    assert res["updated_rows"] == 2
    s = dict((r[0], (r[1], r[2])) for r in _state(sql))
    assert s["k0"] == ("D0", 0) and s["k1"] == ("D1", 10)
    assert s["k2"] == ("d0", 2)


def test_insert_select_and_values(sql, spark):
    spark.createDataFrame([("x1", "d9", 100)], SCHEMA).createOrReplaceTempView(
        "extra"
    )
    sql.execute("INSERT INTO ns.t SELECT * FROM extra")
    sql.execute("INSERT INTO ns.t VALUES ('x2', 'd9', 101)")
    s = {r[0]: r[2] for r in _state(sql)}
    assert s["x1"] == 100 and s["x2"] == 101


def test_merge_upsert_and_delete_flag(sql, spark):
    batch = [("k1", "d1", 1000, False), ("kNEW", "d0", 7, False), ("k2", "d0", 0, True)]
    spark.createDataFrame(
        batch, "id string, day string, v long, _del boolean"
    ).createOrReplaceTempView("batch")
    sql.execute(
        "MERGE INTO ns.t AS t USING batch AS s ON t.id = s.id "
        "WHEN MATCHED AND s._del THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    s = {r[0]: r[2] for r in _state(sql)}
    assert s["k1"] == 1000 and s["kNEW"] == 7 and "k2" not in s


def test_merge_subquery_source_and_mor_strategy(sql):
    sql.execute(
        "MERGE INTO ns.t t USING "
        "(SELECT id, day, v * 2 AS v FROM ns.t WHERE v >= 18) s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        strategy="mor",
    )
    assert sql.wh.last_merge_stats["mode"] == "mor"
    assert sql.wh.last_merge_stats["rewritten_files"] == 0
    s = {r[0]: r[2] for r in _state(sql)}
    assert s["k18"] == 36 and s["k19"] == 38 and s["k17"] == 17


def test_unsupported_shapes_raise(sql):
    with pytest.raises(ValueError, match="unsupported"):
        sql.execute("DELETE FROM ns.t")  # no WHERE
    with pytest.raises(ValueError, match="unsupported"):
        sql.execute("TRUNCATE ns.t")  # TABLE keyword required
    with pytest.raises(ValueError, match="ON must equate"):
        sql.execute(
            "MERGE INTO ns.t t USING ns.t s ON t.v = s.v "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
    with pytest.raises(ValueError, match="WHEN"):
        sql.execute(
            "MERGE INTO ns.t t USING ns.t s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET t.v = s.v"
        )


def test_principal_enforcement(sql):
    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import WarehouseSQL

    wh = sql.wh
    wh.grant("ana", "ns", "t", permissions=("SELECT",), columns=["id", "v"])
    gov = WarehouseSQL(wh, principal="ana")
    # SELECT sees only the granted columns
    got = gov.execute("SELECT * FROM ns.t WHERE v = 3").collect()
    assert [tuple(sorted(r.asDict())) for r in got] == [("id", "v")]
    # DML requires ALL / INSERT
    with pytest.raises(PermissionError):
        gov.execute("DELETE FROM ns.t WHERE v >= 0")
    with pytest.raises(PermissionError):
        gov.execute("INSERT INTO ns.t VALUES ('z', 'd0', 1)")
    wh.grant("etl", "ns", "t", permissions=("ALL",))
    etl = WarehouseSQL(wh, principal="etl")
    assert etl.execute("DELETE FROM ns.t WHERE v >= 19")["deleted_rows"] == 1


def test_principal_row_filter_applies_in_select(sql):
    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import WarehouseSQL

    wh = sql.wh
    wh.grant("d1only", "ns", "t", permissions=("SELECT",), row_filter="day = 'd1'")
    gov = WarehouseSQL(wh, principal="d1only")
    got = gov.execute("SELECT id, day FROM ns.t").collect()
    assert got and all(r.day == "d1" for r in got)


def test_metadata_table_syntax(sql):
    got = sql.execute(
        "SELECT version, records FROM ns.t$snapshots ORDER BY version"
    ).collect()
    assert got[-1].records == 20
    files = sql.execute("SELECT COUNT(*) AS n FROM ns.t$files").collect()
    assert files[0].n >= 1
    parts = sql.execute(
        "SELECT partition, records FROM ns.t$partitions ORDER BY partition"
    ).collect()
    assert [(r.partition, r.records) for r in parts] == [("d0", 10), ("d1", 10)]
    assert sql.execute("SELECT * FROM ns.t$deletes").collect() == []
    hist = sql.execute("SELECT MAX(version) AS v FROM ns.t$history").collect()
    assert hist[0].v == sql.wh.current_version("ns", "t")
    # joins between data and metadata tables work in one statement
    j = sql.execute(
        "SELECT s.records, COUNT(*) AS n FROM ns.t d "
        "CROSS JOIN (SELECT MAX(records) AS records FROM ns.t$snapshots) s "
        "GROUP BY s.records"
    ).collect()
    assert j[0].n == 20


def test_metadata_table_requires_describe(sql):
    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import WarehouseSQL

    gov = WarehouseSQL(sql.wh, principal="nobody")
    with pytest.raises(PermissionError, match="DESCRIBE"):
        gov.execute("SELECT * FROM ns.t$snapshots")


def test_ddl_statements(sql, spark):
    sql.execute("CREATE NAMESPACE IF NOT EXISTS raw")
    sql.execute(
        "CREATE TABLE raw.ev (id STRING, d STRING, amt DECIMAL(10,2)) "
        "PARTITIONED BY (d) TBLPROPERTIES ('primary-key' = 'id')"
    )
    assert sql.wh.table_meta("raw", "ev")["key"] == "id"
    assert sql.wh.table_meta("raw", "ev")["partition_by"] == "d"
    sql.execute("INSERT INTO raw.ev VALUES ('a', 'x', 1.50)")
    got = sql.execute("SELECT id, CAST(amt AS DOUBLE) AS amt FROM raw.ev").collect()
    assert [(r.id, r.amt) for r in got] == [("a", 1.5)]
    sql.execute("DROP TABLE raw.ev")
    assert sql.wh.list_tables("raw") == []
    sql.execute("DROP NAMESPACE raw")


def test_time_travel_syntax(sql):
    v1 = sql.wh.current_version("ns", "t")
    sql.execute("DELETE FROM ns.t WHERE v >= 10")
    now = sql.execute("SELECT COUNT(*) AS n FROM ns.t").collect()[0].n
    then = sql.execute(
        f"SELECT COUNT(*) AS n FROM ns.t FOR VERSION AS OF {v1}"
    ).collect()[0].n
    assert (now, then) == (10, 20)
    sql.wh.create_tag("ns", "t", "pre_delete", version=v1)
    tagged = sql.execute(
        "SELECT COUNT(*) AS n FROM ns.t FOR VERSION AS OF 'pre_delete'"
    ).collect()[0].n
    assert tagged == 20
    # both snapshots joinable in one statement
    j = sql.execute(
        f"SELECT (SELECT COUNT(*) FROM ns.t) AS now, "
        f"(SELECT COUNT(*) FROM ns.t FOR VERSION AS OF {v1}) AS then"
    ).collect()[0]
    assert (j.now, j.then) == (10, 20)


def test_optimize_and_vacuum(sql, spark):
    # fragment the table, then OPTIMIZE ZORDER and VACUUM via SQL
    for i in range(3):
        sql.execute(f"INSERT INTO ns.t VALUES ('z{i}', 'd0', {100 + i})")
    sql.execute("OPTIMIZE ns.t ZORDER BY (v)")
    files, _ = sql.wh.plan_files("ns", "t", predicates=[("v", "=", 100)])
    assert len(files) < len(sql.wh.plan_files("ns", "t")[0]) or len(files) == 1
    res = sql.execute("VACUUM ns.t RETAIN 0 HOURS")
    assert res["removed_files"] == 0  # nothing unreferenced
    got = {r.id for r in sql.execute("SELECT id FROM ns.t").collect()}
    assert {"z0", "z1", "z2"} <= got


def test_time_travel_is_governed(sql):
    """FOR VERSION AS OF must apply the SAME column grants and row
    filters as the live read -- time travel is not a governance
    bypass."""
    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import WarehouseSQL

    wh = sql.wh
    v1 = wh.current_version("ns", "t")
    wh.grant(
        "ana", "ns", "t", permissions=("SELECT",),
        columns=["id", "day"], row_filter="day = 'd1'",
    )
    gov = WarehouseSQL(wh, principal="ana")
    got = gov.execute(
        f"SELECT * FROM ns.t FOR VERSION AS OF {v1}"
    ).collect()
    assert got and all(r.day == "d1" for r in got)
    assert sorted(got[0].asDict()) == ["day", "id"]
    with pytest.raises(PermissionError):
        WarehouseSQL(wh, principal="nobody").execute(
            f"SELECT * FROM ns.t FOR VERSION AS OF {v1}"
        )


def test_string_literals_never_rewritten(sql):
    got = sql.execute(
        "SELECT COUNT(*) AS n FROM ns.t WHERE day = 'ns.t'"
    ).collect()
    assert got[0].n == 0  # literal 'ns.t' compared verbatim, not a view name
    got2 = sql.execute(
        "SELECT 'ns.t$snapshots' AS s FROM ns.t LIMIT 1"
    ).collect()
    assert got2[0].s == "ns.t$snapshots"


def test_drop_namespace_dotted_is_rejected(sql):
    with pytest.raises(ValueError, match="unsupported DROP"):
        sql.execute("DROP NAMESPACE ns.t")
    assert sql.wh.list_tables("ns") == ["t"]


def test_update_mor_strategy_routes_to_equality_deletes(sql):
    r = sql.execute("UPDATE ns.t SET v = v + 100 WHERE v < 5", strategy="mor")
    assert r["rewritten_files"] == 0 and r["updated_rows"] == 5
    assert sql.wh.deletes_df("ns", "t").count() == 1
    got = {(row.id, row.v) for row in sql.execute("SELECT id, v FROM ns.t").collect()}
    assert got == {(f"k{i}", i + 100 if i < 5 else i) for i in range(20)}


def test_dml_regexes_are_literal_aware(sql):
    # an UPDATE whose SET literal contains " WHERE " must split at the
    # REAL WHERE, not the one inside the string (ADVICE r4)
    sql.execute("UPDATE ns.t SET day = 'a WHERE b' WHERE id = 'k1'")
    state = {(r.id, r.day) for r in sql.execute("SELECT id, day FROM ns.t").collect()}
    assert ("k1", "a WHERE b") in state
    assert sum(1 for _, d in state if d == "a WHERE b") == 1
    # DELETE with a literal containing WHERE after the real predicate
    sql.execute("DELETE FROM ns.t WHERE day = 'a WHERE b'")
    assert sql.execute("SELECT COUNT(*) AS n FROM ns.t").collect()[0].n == 19


def test_merge_on_when_split_is_literal_aware(sql, spark):
    # the USING subquery carries a literal containing " ON " and
    # " WHEN MATCHED " -- the MERGE shape regex must not split there
    sql.execute(
        "MERGE INTO ns.t t USING (SELECT 'k2' AS id, "
        "'x ON t.id = s.id WHEN MATCHED THEN y' AS day, 99 AS v) s "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    row = sql.execute("SELECT day, v FROM ns.t WHERE id = 'k2'").collect()
    assert [(r.day, r.v) for r in row] == [
        ("x ON t.id = s.id WHEN MATCHED THEN y", 99)
    ]


def test_alias_qualified_column_not_rewritten_as_table(sql, spark):
    # a table literally named q.state exists, AND the query aliases
    # another table as q -- q.state in the SELECT list is the alias's
    # COLUMN, not the table (ADVICE r4)
    wh = sql.wh
    wh.create_namespace("q")
    state_schema = StructType(
        [StructField("id", StringType(), False), StructField("x", LongType())]
    )
    wh.create_table("q", "state", state_schema, key="id")
    wh.insert("q", "state", spark.createDataFrame([("z", 1)], state_schema))
    src = spark.createDataFrame([("k1", "ny")], "id string, state string")
    src.createOrReplaceTempView("src_addr")
    got = sql.execute(
        "SELECT q.state AS st FROM src_addr q ORDER BY q.state"
    ).collect()
    assert [r.st for r in got] == ["ny"]
    # while a genuine FROM-position ref to q.state still resolves,
    # even when the statement elsewhere declares an alias named q
    got2 = sql.execute(
        "SELECT COUNT(*) AS n FROM q.state"
    ).collect()
    assert got2[0].n == 1
    # self-shadowing alias: FROM q.state q is a table position
    got3 = sql.execute(
        "SELECT q.x AS x FROM q.state q"
    ).collect()
    assert [r.x for r in got3] == [1]


def test_alter_table_statements(sql, spark):
    from pyspark.sql.types import LongType as _Long

    sql.execute("ALTER TABLE ns.t ADD COLUMN score decimal(10,2)")
    assert "score" in [f.name for f in sql.wh.schema("ns", "t").fields]
    sql.execute("ALTER TABLE ns.t RENAME COLUMN score TO rating")
    names = [f.name for f in sql.wh.schema("ns", "t").fields]
    assert "rating" in names and "score" not in names
    sql.execute("ALTER TABLE ns.t DROP COLUMN rating")
    assert "rating" not in [f.name for f in sql.wh.schema("ns", "t").fields]
    # partition evolution through SQL text (metadata-only)
    sid = sql.execute("ALTER TABLE ns.t SET PARTITION SPEC (v)")
    assert sid == 1
    assert sql.wh.table_meta("ns", "t")["partition_by"] == "v"
    # write order
    sql.execute("ALTER TABLE ns.t WRITE ORDERED BY (v) DISTRIBUTED BY RANGE")
    meta = sql.wh.table_meta("ns", "t")
    assert meta["write_order"] == ["v"] and meta["write_distribution"] == "range"
    sql.execute("ALTER TABLE ns.t WRITE UNORDERED")
    assert "write_order" not in sql.wh.table_meta("ns", "t")
    with pytest.raises(ValueError, match="unsupported ALTER"):
        sql.execute("ALTER TABLE ns.t FROBNICATE")


def test_grant_revoke_statements(sql, spark):
    sql.execute(
        "GRANT SELECT (id, v) ON ns.t TO ana WHERE v < 5"
    )
    governed = WarehouseSQL(sql.wh, principal="ana")
    got = governed.execute("SELECT * FROM ns.t")
    assert sorted(got.columns) == ["id", "v"]
    assert got.count() == 5  # v in 0..4
    with pytest.raises(PermissionError):
        governed.execute("DELETE FROM ns.t WHERE v = 1")
    # a governed session must not be able to self-escalate
    with pytest.raises(PermissionError, match="admin"):
        governed.execute("GRANT ALL ON ns.t TO ana")
    sql.execute("REVOKE ALL ON ns.t FROM ana")
    with pytest.raises(PermissionError):
        governed.execute("SELECT * FROM ns.t").collect()


def test_call_procedures(sql, spark):
    v1 = sql.wh.current_version("ns", "t")
    sql.execute("DELETE FROM ns.t WHERE v < 5")
    assert sql.execute("SELECT COUNT(*) AS n FROM ns.t").collect()[0].n == 15
    sql.execute(f"CALL system.rollback_to_snapshot('ns.t', {v1})")
    assert sql.execute("SELECT COUNT(*) AS n FROM ns.t").collect()[0].n == 20
    sql.execute("CALL system.create_tag('ns.t', 'audited')")
    assert "audited" in sql.wh.refs("ns", "t")
    sql.execute("CALL system.rewrite_data_files('ns.t')")
    sql.execute("CALL system.expire_snapshots('ns.t', 1)")
    sql.execute("CALL system.remove_orphan_files('ns.t')")
    assert sql.execute("SELECT COUNT(*) AS n FROM ns.t").collect()[0].n == 20
    # tagged snapshot survived expiration and still reads
    assert (
        sql.execute(
            "SELECT COUNT(*) AS n FROM ns.t FOR VERSION AS OF 'audited'"
        ).collect()[0].n == 20
    )
    with pytest.raises(ValueError, match="unknown procedure"):
        sql.execute("CALL system.nope('ns.t')")


def test_call_branch_lifecycle(sql, spark):
    sql.execute("CALL system.create_branch('ns.t', 'audit')")
    assert sql.wh.list_branches("ns", "t") == ["audit"]
    sql.wh.insert(
        "ns", "t",
        spark.createDataFrame([("b1", "d0", 99)], SCHEMA),
        branch="audit",
    )
    sql.execute("CALL system.fast_forward('ns.t', 'audit')")
    assert sql.execute(
        "SELECT COUNT(*) AS n FROM ns.t WHERE id = 'b1'"
    ).collect()[0].n == 1


def test_timestamp_time_travel(sql, spark):
    import time as _time

    wh = sql.wh
    tdir = wh._table_dir("ns", "t")
    v1 = wh.current_version("ns", "t")
    t_between = _time.time()
    _time.sleep(0.02)
    sql.execute("DELETE FROM ns.t WHERE v < 10")
    v2 = wh.current_version("ns", "t")
    # programmatic resolution
    assert wh.snapshot_as_of("ns", "t", t_between) == v1
    assert wh.snapshot_as_of("ns", "t", _time.time()) == v2
    with pytest.raises(ValueError, match="at or before"):
        wh.snapshot_as_of("ns", "t", 1.0)
    # SQL FOR TIMESTAMP AS OF resolves through the stamped wall clocks
    import datetime as _dt

    iso = _dt.datetime.fromtimestamp(
        t_between, tz=_dt.timezone.utc
    ).isoformat()
    n = sql.execute(
        f"SELECT COUNT(*) AS n FROM ns.t FOR TIMESTAMP AS OF '{iso}'"
    ).collect()[0].n
    assert n == 20
    n2 = sql.execute("SELECT COUNT(*) AS n FROM ns.t").collect()[0].n
    assert n2 == 10
    # snapshots metadata table carries op + committed_at
    snaps = {r.version: r for r in wh.snapshots_df("ns", "t").collect()}
    assert snaps[v2].op == "delete"
    assert snaps[v1].committed_at is not None
    assert snaps[v1].committed_at <= snaps[v2].committed_at


def test_table_changes_tvf(sql, spark):
    """SELECT ... FROM table_changes('ns.tbl', v1[, v2]) routes to
    Warehouse.changelog (Delta CDF TVF / Iceberg .changes)."""
    sql.execute("UPDATE ns.t SET v = 99 WHERE id = 'k1'")
    v = sql.wh.current_version("ns", "t")
    got = sql.execute(
        f"SELECT id, v, _change_type, _commit_version "
        f"FROM table_changes('ns.t', {v - 1}, {v}) ORDER BY _change_type"
    ).collect()
    assert [(r.id, r.v, r._change_type, r._commit_version) for r in got] == [
        ("k1", 1, "delete", v),
        ("k1", 99, "insert", v),
    ]
    # open-ended range (v1 only) reaches the tip
    n = sql.execute(
        "SELECT COUNT(*) AS n FROM table_changes('ns.t', 0)"
    ).collect()[0].n
    assert n == 22  # 20 initial inserts + delete/insert pair
    # $changes suffix = full history
    n2 = sql.execute(
        "SELECT COUNT(*) AS n FROM ns.t$changes"
    ).collect()[0].n
    assert n2 == 22


def test_table_changes_is_governed(sql, spark):
    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import (
        WarehouseSQL,
    )

    sql.wh.grant("spy", "ns", "t", ["DESCRIBE"])
    gov = WarehouseSQL(sql.wh, principal="spy")
    with pytest.raises(PermissionError, match="SELECT"):
        gov.execute("SELECT * FROM table_changes('ns.t', 0)")
    with pytest.raises(PermissionError, match="SELECT"):
        gov.execute("SELECT * FROM ns.t$changes")


def test_comma_from_list_ref_rewrites_despite_alias(sql, spark):
    """A genuine table ref in a comma-separated FROM list rewrites even
    when a declared alias shares its namespace name."""
    sql.wh.create_namespace("q")
    sql.wh.create_table("q", "state", SCHEMA, key="id")
    sql.wh.insert(
        "q", "state",
        spark.createDataFrame([("z1", "d0", 7)], SCHEMA).coalesce(1),
    )
    got = sql.execute(
        "SELECT q.id AS a, s.id AS b FROM ns.t q, q.state s "
        "WHERE q.id = 'k1'"
    ).collect()
    assert [(r.a, r.b) for r in got] == [("k1", "z1")]


def test_create_table_as_select(sql, spark):
    """CTAS (Athena CREATE TABLE AS SELECT): schema from the query,
    first commit holds the result; PARTITIONED BY and primary-key
    TBLPROPERTIES apply; IF NOT EXISTS keeps an existing table."""
    sql.execute(
        "CREATE TABLE ns.evens PARTITIONED BY (day) "
        "TBLPROPERTIES ('primary-key' = 'id') "
        "AS SELECT id, day, v * 10 AS v FROM ns.t WHERE v % 2 = 0"
    )
    got = {(r.id, r.v) for r in sql.execute("SELECT * FROM ns.evens").collect()}
    assert got == {(f"k{i}", i * 10) for i in range(0, 20, 2)}
    assert sql.wh.table_meta("ns", "evens").get("key") == "id"
    assert sql.wh.table_meta("ns", "evens").get("partition_by") == "day"
    # MERGE works against the CTAS table (key applied)
    sql.execute(
        "MERGE INTO ns.evens AS t USING "
        "(SELECT 'k0' AS id, 'd0' AS day, CAST(999 AS BIGINT) AS v) AS s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert sql.execute(
        "SELECT v FROM ns.evens WHERE id = 'k0'"
    ).collect()[0].v == 999
    # IF NOT EXISTS: no-op on an existing table
    sql.execute(
        "CREATE TABLE IF NOT EXISTS ns.evens AS SELECT * FROM ns.t"
    )
    assert sql.execute(
        "SELECT COUNT(*) AS n FROM ns.evens"
    ).collect()[0].n == 10
    # plain CTAS on an existing table raises
    with pytest.raises(ValueError, match="already exists"):
        sql.execute("CREATE TABLE ns.evens AS SELECT * FROM ns.t")


def test_update_mor_pos_strategy_keyless(sql, spark):
    """UPDATE routed with strategy='mor-pos' commits position deletes
    (zero rewrites) through the SQL text path."""
    r = sql.execute(
        "UPDATE ns.t SET v = v + 1000 WHERE v >= 18", strategy="mor-pos"
    )
    assert r["updated_rows"] == 2 and r["rewritten_files"] == 0
    got = {x.v for x in sql.execute("SELECT v FROM ns.t WHERE v >= 18").collect()}
    assert got == {1018, 1019}


def test_create_view_and_select(sql, spark):
    """Persisted views (Iceberg View analog): versioned SQL in the
    catalog, expanded at query time; views compose (view-on-view) and
    CREATE OR REPLACE appends a new version."""
    sql.execute("CREATE VIEW ns.highs AS SELECT id, v FROM ns.t WHERE v >= 15")
    got = {(r.id, r.v) for r in sql.execute("SELECT * FROM ns.highs").collect()}
    assert got == {(f"k{i}", i) for i in range(15, 20)}
    # view-on-view
    sql.execute("CREATE VIEW ns.highest AS SELECT * FROM ns.highs WHERE v >= 18")
    assert sql.execute("SELECT COUNT(*) AS n FROM ns.highest").collect()[0].n == 2
    # joins between views and tables work
    n = sql.execute(
        "SELECT COUNT(*) AS n FROM ns.highs h JOIN ns.t t ON h.id = t.id"
    ).collect()[0].n
    assert n == 5
    # CREATE without OR REPLACE on an existing view raises
    with pytest.raises(ValueError, match="already exists"):
        sql.execute("CREATE VIEW ns.highs AS SELECT * FROM ns.t")
    # OR REPLACE appends a version; old definition stays auditable
    sql.execute("CREATE OR REPLACE VIEW ns.highs AS SELECT id FROM ns.t WHERE v < 2")
    assert sql.execute("SELECT COUNT(*) AS n FROM ns.highs").collect()[0].n == 2
    assert "v >= 15" in sql.wh.view_definition("ns", "highs", version=0)
    assert sql.wh.list_views("ns") == ["highest", "highs"]
    sql.execute("DROP VIEW ns.highest")
    assert sql.wh.list_views("ns") == ["highs"]
    # a view definition that doesn't analyze is rejected up front
    with pytest.raises(Exception):
        sql.execute("CREATE VIEW ns.bad AS SELECT nope FROM ns.t")
    assert "bad" not in sql.wh.list_views("ns")


def test_view_runs_with_invoker_rights(sql, spark):
    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import (
        WarehouseSQL,
    )

    sql.execute("CREATE VIEW ns.allrows AS SELECT id, day, v FROM ns.t")
    wh = sql.wh
    wh.grant("d1", "ns", "t", permissions=("SELECT",), row_filter="day = 'd1'")
    gov = WarehouseSQL(wh, principal="d1")
    got = gov.execute("SELECT day FROM ns.allrows").collect()
    assert got and all(r.day == "d1" for r in got)
    # no grant at all -> the view cannot be used to bypass the table
    nobody = WarehouseSQL(wh, principal="nobody")
    with pytest.raises(PermissionError):
        nobody.execute("SELECT * FROM ns.allrows")


def test_view_cycle_detection(sql, spark):
    sql.execute("CREATE VIEW ns.loopy AS SELECT * FROM ns.t")
    sql.execute("CREATE OR REPLACE VIEW ns.loopy AS SELECT * FROM ns.loopy")
    with pytest.raises(ValueError, match="depth"):
        sql.execute("SELECT * FROM ns.loopy")


def test_show_and_describe_statements(sql, spark):
    assert [r.namespace for r in sql.execute("SHOW NAMESPACES").collect()] == ["ns"]
    assert [(r.namespace, r.table) for r in sql.execute("SHOW TABLES IN ns").collect()] == [
        ("ns", "t")
    ]
    sql.execute("CREATE VIEW ns.v1 AS SELECT id FROM ns.t")
    assert [r.view for r in sql.execute("SHOW VIEWS IN ns").collect()] == ["v1"]
    d = {r.col_name: r.data_type for r in sql.execute("DESCRIBE ns.t").collect()}
    assert d["id"] == "string" and d["v"] == "bigint"
    assert d["# key"] == "id" and d["# partition_by"] == "day"
    # DESCRIBE is governance-gated
    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import WarehouseSQL

    with pytest.raises(PermissionError, match="DESCRIBE"):
        WarehouseSQL(sql.wh, principal="nobody").execute("DESC ns.t")


def test_alter_add_nested_column(sql, spark):
    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType,
    )

    S2 = StructType(
        [
            StructField("id", StringType(), False),
            StructField(
                "geo", StructType([StructField("lat", DoubleType())])
            ),
        ]
    )
    sql.wh.create_table("ns", "geo_t", S2, key="id")
    sql.wh.insert(
        "ns", "geo_t",
        spark.createDataFrame([("k1", (1.5,))], S2).coalesce(1),
    )
    sql.execute("ALTER TABLE ns.geo_t ADD COLUMN geo.alt DOUBLE")
    r = sql.execute("SELECT geo.alt AS alt FROM ns.geo_t").collect()
    assert [x.alt for x in r] == [None]


def test_refs_metadata_table_and_explain(sql, spark):
    sql.wh.create_tag("ns", "t", "v1tag")
    sql.wh.create_branch("ns", "t", "audit")
    got = [
        (r.name, r.type, r.version)
        for r in sql.execute(
            "SELECT * FROM ns.t$refs ORDER BY type, name"
        ).collect()
    ]
    v = sql.wh.current_version("ns", "t")
    assert got == [("audit", "BRANCH", v), ("v1tag", "TAG", v)]
    # EXPLAIN routes through the rewrite and returns the plan text
    plan = sql.execute("EXPLAIN SELECT COUNT(*) FROM ns.t").collect()
    assert plan and "Aggregate" in plan[0].plan
    # refs is DESCRIBE-gated like the other metadata tables
    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import (
        WarehouseSQL,
    )

    with pytest.raises(PermissionError, match="DESCRIBE"):
        WarehouseSQL(sql.wh, principal="nobody").execute(
            "SELECT * FROM ns.t$refs"
        )


def test_drop_missing_object_raises_without_if_exists(sql):
    """ANSI semantics: a bare DROP of a missing object is an error;
    IF EXISTS makes it a no-op. (Previously both silently no-opped.)"""
    from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
        TableNotFoundError,
    )

    with pytest.raises(TableNotFoundError):
        sql.execute("DROP TABLE ns.missing")
    with pytest.raises(ValueError, match="unknown view"):
        sql.execute("DROP VIEW ns.missing")
    with pytest.raises(FileNotFoundError):
        sql.execute("DROP NAMESPACE nowhere")
    # IF EXISTS: all three no-op
    sql.execute("DROP TABLE IF EXISTS ns.missing")
    sql.execute("DROP VIEW IF EXISTS ns.missing")
    sql.execute("DROP NAMESPACE IF EXISTS nowhere")
    # dropping real objects still works bare
    sql.execute("CREATE VIEW ns.tmpv AS SELECT id FROM ns.t")
    sql.execute("DROP VIEW ns.tmpv")
    sql.execute("DROP TABLE ns.t")


def test_dml_subquery_predicates(sql, spark):
    """Athena DML shapes with subquery predicates: IN (SELECT ...),
    correlated EXISTS, NOT IN null semantics. Catalyst plans the
    subquery as a semi/anti join against the probe scan -- works at any
    subquery cardinality, no collected key list -- while simple sibling
    conjuncts still feed manifest pruning."""
    wh = sql.wh
    wh.create_table(
        "ns", "src",
        StructType([StructField("sid", StringType(), False)]),
        key="sid",
    )
    wh.insert(
        "ns", "src",
        spark.createDataFrame([("k1",), ("k3",), ("k5",)], "sid string"),
    )
    # correlated EXISTS drives UPDATE (outer column referenced bare --
    # the inner FROM uses a different name, so correlation is real)
    r = sql.execute(
        "UPDATE ns.t SET v = v + 100 "
        "WHERE EXISTS (SELECT 1 FROM ns.src s WHERE s.sid = id)"
    )
    assert r["updated_rows"] == 3
    got = {(x.id, x.v) for x in sql.execute("SELECT id, v FROM ns.t").collect()}
    assert {("k1", 101), ("k3", 103), ("k5", 105)} <= got
    # pruning hint: the simple conjunct still skips files (day partition)
    r = sql.execute(
        "DELETE FROM ns.t WHERE day = 'd1' AND id IN (SELECT sid FROM ns.src)"
    )
    assert r["deleted_rows"] == 3
    assert r["probed_files"] < r["manifest_files"]  # d0 files skipped
    ids = {x.id for x in sql.execute("SELECT id FROM ns.t").collect()}
    assert ids == {f"k{i}" for i in range(20)} - {"k1", "k3", "k5"}
    # NOT IN with a NULL in the subquery deletes NOTHING (SQL tri-state)
    wh.create_table(
        "ns", "src_null",
        StructType([StructField("id", StringType(), True)]),
    )
    wh.insert(
        "ns", "src_null",
        spark.createDataFrame([("k0",), (None,)], "id string"),
    )
    r = sql.execute(
        "DELETE FROM ns.t WHERE id NOT IN (SELECT id FROM ns.src_null)"
    )
    assert r["deleted_rows"] == 0
    # without the NULL, NOT IN deletes the complement
    r = sql.execute(
        "DELETE FROM ns.t WHERE id NOT IN "
        "(SELECT id FROM ns.src_null WHERE id IS NOT NULL)"
    )
    assert r["deleted_rows"] == 16  # all but k0 (k1/k3/k5 already gone)
    assert {x.id for x in sql.execute("SELECT id FROM ns.t").collect()} == {"k0"}


def test_dml_subquery_self_reference_and_mor(sql, spark):
    """The subquery may read the TARGET table itself (pre-image
    snapshot) and the predicate composes with merge-on-read
    strategies."""
    # delete rows whose v is above the table's own average: self-ref
    r = sql.execute(
        "DELETE FROM ns.t WHERE v > (SELECT AVG(v) FROM ns.t)"
    )
    assert r["deleted_rows"] == 10  # v in 0..19, avg 9.5 -> 10..19 go
    assert {x.v for x in sql.execute("SELECT v FROM ns.t").collect()} == set(
        range(10)
    )
    # mor equality-delete path with an IN subquery
    wh = sql.wh
    wh.create_table(
        "ns", "pick",
        StructType([StructField("id", StringType(), False)]),
        key="id",
    )
    wh.insert(
        "ns", "pick", spark.createDataFrame([("k2",), ("k4",)], "id string")
    )
    r = sql.execute(
        "DELETE FROM ns.t WHERE id IN (SELECT id FROM ns.pick)",
        strategy="mor",
    )
    assert r["deleted_rows"] == 2 and r["rewritten_files"] == 0
    assert {x.id for x in sql.execute("SELECT id FROM ns.t").collect()} == {
        f"k{i}" for i in range(10)
    } - {"k2", "k4"}


def test_merge_not_matched_by_source_delete(sql, spark):
    """The Delta / Spark 4 full-snapshot sync clause: target rows whose
    key is absent from the source are deleted; result == deduped
    source. Works with the delete-flag clause in the same statement."""
    spark.createDataFrame(
        [("k1", "d1", 1000, False), ("kNEW", "d0", 7, False),
         ("k2", "d0", 0, True)],
        "id string, day string, v long, _del boolean",
    ).createOrReplaceTempView("snap")
    sql.execute(
        "MERGE INTO ns.t AS t USING snap AS s ON t.id = s.id "
        "WHEN MATCHED AND s._del THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    s = {r[0]: r[2] for r in _state(sql)}
    assert s == {"k1": 1000, "kNEW": 7}
    # mor keeps the sync rewrite-free
    spark.createDataFrame(
        [("k1", "d1", 1)], "id string, day string, v long"
    ).createOrReplaceTempView("snap2")
    sql.execute(
        "MERGE INTO ns.t AS t USING snap2 AS s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
        strategy="mor",
    )
    assert sql.wh.last_merge_stats["rewritten_files"] == 0
    assert {r[0]: r[2] for r in _state(sql)} == {"k1": 1}


def test_alter_add_drop_constraint(sql, spark):
    """Delta-syntax CHECK constraints from SQL text: a violating batch
    fails every write path while the constraint stands; DROP lifts it."""
    sql.execute("ALTER TABLE ns.t ADD CONSTRAINT v_small CHECK (v < 1000)")
    bad = spark.createDataFrame([("zz", "d0", 5000)], SCHEMA)
    with pytest.raises(ValueError, match="v_small"):
        sql.wh.insert("ns", "t", bad)
    with pytest.raises(ValueError, match="v_small"):
        sql.execute("UPDATE ns.t SET v = v + 10000 WHERE id = 'k1'")
    sql.execute("ALTER TABLE ns.t DROP CONSTRAINT v_small")
    sql.wh.insert("ns", "t", bad)  # lifted
    assert ("zz", "d0", 5000) in _state(sql)


def test_truncate_table(sql):
    """TRUNCATE TABLE: metadata-only empty snapshot -- zero rows after,
    the pre-truncate snapshot still time-travels, and the table accepts
    new writes."""
    v = sql.wh.current_version("ns", "t")
    sql.execute("TRUNCATE TABLE ns.t")
    assert sql.execute("SELECT COUNT(*) AS n FROM ns.t").collect()[0].n == 0
    assert len(sql.wh.read("ns", "t", version=v).collect()) == 20
    sql.execute("INSERT INTO ns.t VALUES ('post', 'd0', 1)")
    assert _state(sql) == {("post", "d0", 1)}


def test_insert_partial_column_list(sql, spark):
    """ANSI partial-column INSERT: named columns bind by position,
    unnamed nullable columns get NULL; omitting a NOT NULL / required
    column raises instead of silently dropping rows."""
    sql.execute("INSERT INTO ns.t (id, v) VALUES ('p1', 7)")
    sql.execute(
        "INSERT INTO ns.t (v, id) SELECT 8 AS a, 'p2' AS b"
    )
    s = {r[0]: (r[1], r[2]) for r in _state(sql)}
    assert s["p1"] == (None, 7) and s["p2"] == (None, 8)
    with pytest.raises(ValueError, match="required|NOT NULL|id"):
        sql.execute("INSERT INTO ns.t (day, v) VALUES ('d9', 1)")
    with pytest.raises(ValueError, match="unknown columns"):
        sql.execute("INSERT INTO ns.t (nope) VALUES (1)")


def test_show_create_table(sql):
    sql.execute("ALTER TABLE ns.t ADD CONSTRAINT v_pos CHECK (v >= 0)")
    ddl = sql.execute("SHOW CREATE TABLE ns.t").collect()[0].createtab_stmt
    assert "CREATE TABLE ns.t" in ddl
    assert "id STRING NOT NULL" in ddl
    assert "PARTITIONED BY (day)" in ddl
    assert "'unique_keys'='id'" in ddl
    assert "'constraint.v_pos'='v >= 0'" in ddl


def test_restore_table(sql, spark):
    """RESTORE TABLE ... TO VERSION/TIMESTAMP AS OF (Delta RESTORE):
    routes to Warehouse.rollback_to, rewinding the current snapshot
    while preserving history (the undone snapshot still time-travels)."""
    import datetime as _dt
    import time as _time

    v1 = sql.wh.current_version("ns", "t")
    t_between = _time.time()
    _time.sleep(0.02)
    sql.execute("DELETE FROM ns.t WHERE v < 10")
    assert sql.execute("SELECT COUNT(*) AS n FROM ns.t").collect()[0].n == 10
    sql.execute(f"RESTORE TABLE ns.t TO VERSION AS OF {v1}")
    assert sql.execute("SELECT COUNT(*) AS n FROM ns.t").collect()[0].n == 20
    # timestamp form resolves through snapshot_as_of
    sql.execute("DELETE FROM ns.t WHERE v >= 15")
    iso = _dt.datetime.fromtimestamp(
        t_between, tz=_dt.timezone.utc
    ).isoformat()
    sql.execute(f"RESTORE TABLE ns.t TO TIMESTAMP AS OF '{iso}'")
    assert sql.execute("SELECT COUNT(*) AS n FROM ns.t").collect()[0].n == 20
    with pytest.raises(ValueError, match="unsupported RESTORE"):
        sql.execute("RESTORE TABLE ns.t TO THE MOON")
    # governed principals without ALL cannot rewind history
    sql.wh.grant("spy", "ns", "t", ["SELECT"])
    gov = WarehouseSQL(sql.wh, principal="spy")
    with pytest.raises(PermissionError):
        gov.execute(f"RESTORE TABLE ns.t TO VERSION AS OF {v1}")


def test_table_changes_timestamp_bounds(sql, spark):
    """table_changes('ns.t', '<ts>' [, '<ts>']) -- Delta's timestamp
    form: bounds resolve through snapshot_as_of, mixing with bare
    version ints."""
    import datetime as _dt
    import time as _time

    def iso(t):
        return _dt.datetime.fromtimestamp(
            t, tz=_dt.timezone.utc
        ).isoformat()

    t0 = _time.time()
    _time.sleep(0.02)
    sql.execute("UPDATE ns.t SET v = 99 WHERE id = 'k1'")
    v = sql.wh.current_version("ns", "t")
    _time.sleep(0.02)
    t1 = _time.time()
    got = sql.execute(
        f"SELECT id, v, _change_type FROM "
        f"table_changes('ns.t', '{iso(t0)}', '{iso(t1)}') "
        f"ORDER BY _change_type"
    ).collect()
    assert [(r.id, r.v, r._change_type) for r in got] == [
        ("k1", 1, "delete"),
        ("k1", 99, "insert"),
    ]
    # mixed: int lower bound (exclusive, as in the int-int form),
    # timestamp upper bound
    n = sql.execute(
        f"SELECT COUNT(*) AS n "
        f"FROM table_changes('ns.t', {v - 1}, '{iso(t1)}')"
    ).collect()[0].n
    assert n == 2


def test_alter_table_rename_to(sql, spark):
    """ALTER TABLE ns.t RENAME TO [ns2.]t2 (Athena/Delta): metadata-only
    directory move; data, snapshots and time travel survive."""
    v = sql.wh.current_version("ns", "t")
    sql.execute("ALTER TABLE ns.t RENAME TO t_renamed")
    assert sql.wh.list_tables("ns") == ["t_renamed"]
    assert sql.execute(
        "SELECT COUNT(*) AS n FROM ns.t_renamed"
    ).collect()[0].n == 20
    assert sql.wh.current_version("ns", "t_renamed") == v
    with pytest.raises(Exception):
        sql.execute("SELECT * FROM ns.t").collect()
    # cross-namespace move + clobber refusal
    sql.wh.create_namespace("other")
    sql.execute("ALTER TABLE ns.t_renamed RENAME TO other.t2")
    assert sql.execute(
        "SELECT COUNT(*) AS n FROM other.t2"
    ).collect()[0].n == 20
    sql.execute("CREATE TABLE ns.blocker (a BIGINT)")
    with pytest.raises(FileExistsError):
        sql.execute("ALTER TABLE other.t2 RENAME TO ns.blocker")


class TestTokenizerClauseBoundaries:
    """VERDICT r8 #7: clause boundaries come from the depth-tracked
    token stream, so boundary keywords inside parenthesized subqueries
    or string literals can no longer split a statement in the wrong
    place (the hole class the old non-greedy shape regexes harbored)."""

    def test_update_set_subquery_containing_where(self, sql, spark):
        # the inner WHERE previously split SET/WHERE at the subquery
        spark.createDataFrame([(41,), (99,)], "x long").createOrReplaceTempView(
            "bounds_v"
        )
        sql.execute(
            "UPDATE ns.t SET v = (SELECT MAX(x) FROM bounds_v WHERE x < 50)"
            " WHERE id = 'k1'"
        )
        got = {r.id: r.v for r in sql.execute("SELECT id, v FROM ns.t").collect()}
        assert got["k1"] == 41
        assert got["k3"] == 3  # others untouched

    def test_update_set_literal_containing_where_and_set(self, sql):
        sql.execute(
            "UPDATE ns.t SET day = 'x WHERE y SET z' WHERE id = 'k2'"
        )
        got = {r.id: r.day for r in sql.execute("SELECT id, day FROM ns.t").collect()}
        assert got["k2"] == "x WHERE y SET z"
        assert got["k4"] == "d0"

    def test_delete_where_subquery(self, sql):
        sql.execute(
            "DELETE FROM ns.t WHERE v IN (SELECT v FROM ns.t WHERE v < 2)"
        )
        assert {r.v for r in sql.execute("SELECT v FROM ns.t").collect()} == set(
            range(2, 20)
        )

    def test_merge_using_subquery_with_on_when_words(self, sql, spark):
        # the USING subquery contains top-level-looking ON/WHEN text in
        # literals plus a real CASE WHEN at subquery depth
        spark.createDataFrame(
            [("k1", "d9", 100), ("zz", "d9", 200)], SCHEMA
        ).createOrReplaceTempView("src_v")
        sql.execute(
            "MERGE INTO ns.t AS t USING ("
            "SELECT id, CASE WHEN day = 'ON WHEN MATCHED' THEN 'n' "
            "ELSE day END AS day, v FROM src_v"
            ") AS s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        got = {r.id: (r.day, r.v) for r in sql.execute("SELECT * FROM ns.t").collect()}
        assert got["k1"] == ("d9", 100) and got["zz"] == ("d9", 200)

    def test_merge_on_case_when_rejected_with_right_boundary(self, sql, spark):
        spark.createDataFrame([("k1", "d9", 1)], SCHEMA).createOrReplaceTempView(
            "src_v2"
        )
        with pytest.raises(ValueError, match="ON"):
            sql.execute(
                "MERGE INTO ns.t AS t USING src_v2 AS s "
                "ON t.id = CASE WHEN s.v > 0 THEN s.id ELSE s.id END "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )

    def test_insert_replace_where_literal_containing_select(self, sql):
        # ' SELECT ' inside the REPLACE WHERE literal previously split
        # the statement at the wrong source boundary (unmasked regex)
        sql.execute(
            "INSERT INTO ns.t REPLACE WHERE day = 'no SELECT here' "
            "SELECT 'q1' AS id, 'no SELECT here' AS day, "
            "CAST(50 AS BIGINT) AS v"
        )
        got = {
            r.id
            for r in sql.execute(
                "SELECT id FROM ns.t WHERE day = 'no SELECT here'"
            ).collect()
        }
        assert got == {"q1"}

    def test_insert_values_subselect_in_scalar(self, sql):
        sql.execute(
            "INSERT INTO ns.t SELECT 'agg' AS id, 'd8' AS day, "
            "(SELECT COUNT(*) FROM ns.t) AS v"
        )
        got = [r.v for r in sql.execute("SELECT v FROM ns.t WHERE id = 'agg'").collect()]
        assert got == [20]
