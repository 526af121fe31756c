"""Hypothesis fuzz over the SQL router's DDL heads (VERDICT r7 #6).

Same strategy as test_sqlexec_fuzz.py: statements are generated from a
structured AST, RENDERED to SQL text, and checked differentially
against the Python warehouse API evaluating the same AST -- so the
router's regex/classification layer is what's under test, never the
engine semantics (those have their own suites). Covered heads:

- CREATE TABLE with explicit columns + per-column feature clauses
  (NOT NULL, DEFAULT <adversarial literal>, GENERATED ALWAYS AS
  (expr), GENERATED ALWAYS AS IDENTITY (START WITH n INCREMENT BY m)),
  PARTITIONED BY, TBLPROPERTIES primary-key
- CREATE TABLE ... LIKE (full shape copy, zero rows)
- CREATE TABLE ... SHALLOW CLONE [VERSION AS OF v] and
  RESTORE TABLE ... TO VERSION AS OF v against a randomly grown
  history (prefix-state oracle kept in Python)
- COPY INTO (load-set oracle, idempotent re-run, PATTERN subsetting)
- INSERT INTO ... REPLACE WHERE (partition-replacement oracle; the
  Delta batch-inside-predicate contract must raise on violation)
- ALTER TABLE ... RENAME TO
- parse-or-raise: corrupted statements raise ValueError and leave
  catalog state untouched (never mis-route into a different head)
"""

from __future__ import annotations

import itertools
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import (
    WarehouseSQL,
)
from sample_for_transactional_datalake_using_s3tables_spark.sources.warehouse import (
    Warehouse,
)

# Long-tail battery: excluded from the default gate (VERDICT r13 #4
# -- the full suite outgrew the driver's verification budget). Run
# everything with:  python -m pytest tests/ -q -m "slow or not slow"
pytestmark = pytest.mark.slow


_uniq = itertools.count()

# adversarial default-literal payloads: keywords that would break a
# naive SET/WHERE/clause split if the masking layer leaked
PAYLOADS = [
    "plain",
    "a WHERE b",
    "it's",
    "DEFAULT",
    "GENERATED ALWAYS AS IDENTITY",
    "PARTITIONED BY (x)",
    "0) OR (1=1",
    "SHALLOW CLONE ns.t",
]


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@pytest.fixture(scope="module")
def env(spark):
    with tempfile.TemporaryDirectory() as d:
        wh = Warehouse(spark, d)
        wh.create_namespace("ns")
        yield WarehouseSQL(wh), wh, spark


FUZZ = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# -- CREATE TABLE column AST -------------------------------------------
# (name, type, feature) where feature is one of
#   ("plain",), ("notnull",), ("default", payload), ("identity", start,
#   step), ("generated",)  -- generated renders v * 2 + 1 over the
#   guaranteed BIGINT column v
col_names = st.sampled_from(["a", "b", "c", "wherever", "defaulted"])
plain_col = st.tuples(
    col_names,
    st.sampled_from(["STRING", "BIGINT", "INT", "DOUBLE"]),
    st.just(("plain",)),
)
notnull_col = st.tuples(
    col_names, st.sampled_from(["STRING", "BIGINT"]), st.just(("notnull",))
)
default_col = st.tuples(
    col_names, st.just("STRING"),
    st.tuples(st.just("default"), st.sampled_from(PAYLOADS)),
)
identity_col = st.tuples(
    st.just("seq"), st.just("BIGINT"),
    st.tuples(
        st.just("identity"),
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=-3, max_value=3).filter(lambda x: x != 0),
    ),
)
generated_col = st.tuples(
    st.just("gen"), st.just("BIGINT"), st.just(("generated",))
)


@st.composite
def create_ast(draw):
    cols = draw(
        st.lists(
            st.one_of(plain_col, notnull_col, default_col),
            min_size=1, max_size=3, unique_by=lambda c: c[0],
        )
    )
    cols = [("id", "STRING", ("notnull",)), ("v", "BIGINT", ("plain",))] + [
        c for c in cols if c[0] not in ("id", "v")
    ]
    if draw(st.booleans()):
        cols.append(draw(identity_col))
    if draw(st.booleans()):
        cols.append(draw(generated_col))
    partition = draw(st.booleans())
    keyed = draw(st.booleans())
    return cols, partition, keyed


def _render_create(name: str, ast) -> str:
    cols, partition, keyed = ast
    defs = []
    for cname, ctype, feat in cols:
        d = f"{cname} {ctype}"
        if feat[0] == "notnull":
            d += " NOT NULL"
        elif feat[0] == "default":
            d += f" DEFAULT {_lit(feat[1])}"
        elif feat[0] == "identity":
            d += (
                f" GENERATED ALWAYS AS IDENTITY (START WITH {feat[1]} "
                f"INCREMENT BY {feat[2]})"
            )
        elif feat[0] == "generated":
            d += " GENERATED ALWAYS AS (v * 2 + 1)"
        defs.append(d)
    txt = f"CREATE TABLE ns.{name} ({', '.join(defs)})"
    if partition:
        txt += " PARTITIONED BY (id)"
    if keyed:
        txt += " TBLPROPERTIES ('primary-key' = 'id')"
    return txt


@given(ast=create_ast())
@FUZZ
def test_create_table_matches_ast(env, ast):
    """The routed CREATE TABLE produces exactly the AST's schema, key,
    partition spec, defaults, identity and generated specs -- and an
    INSERT omitting the feature columns fills every one of them."""
    sql, wh, spark = env
    cols, partition, keyed = ast
    name = f"ct{next(_uniq)}"
    sql.execute(_render_create(name, ast))
    meta = wh.table_meta("ns", name)
    schema = StructType.fromJson(meta["schema"])
    assert [f.name for f in schema.fields] == [c[0] for c in cols]
    want_types = {
        "STRING": "string", "BIGINT": "bigint", "INT": "int",
        "DOUBLE": "double",
    }
    for cname, ctype, _f in cols:
        assert schema[cname].dataType.simpleString() == want_types[ctype]
    assert meta.get("partition_by") == ("id" if partition else None)
    assert meta.get("key") == ("id" if keyed else None)
    want_defaults = {
        c[0]: c[2][1] for c in cols if c[2][0] == "default"
    }
    got_defaults = {
        k: v.strip("'").replace("''", "'")
        for k, v in (meta.get("defaults") or {}).items()
    }
    assert got_defaults == want_defaults
    want_identity = {
        c[0]: {"start": c[2][1], "step": c[2][2]}
        for c in cols if c[2][0] == "identity"
    }
    assert (meta.get("identity") or {}) == want_identity
    assert set(meta.get("generated") or {}) == {
        c[0] for c in cols if c[2][0] == "generated"
    }
    # one routed INSERT naming every plain/NOT NULL column (feature
    # columns omitted: the write path must fill default/identity/
    # generated); the values battery keeps NOT NULL satisfied
    ins_cols, ins_vals = [], []
    for cname, ctype, feat in cols:
        if feat[0] in ("default", "identity", "generated"):
            continue
        ins_cols.append(cname)
        if cname == "id":
            ins_vals.append("'r1'")
        elif cname == "v":
            ins_vals.append("10")
        else:
            ins_vals.append("'x'" if ctype == "STRING" else "7")
    sql.execute(
        f"INSERT INTO ns.{name} ({', '.join(ins_cols)}) "
        f"VALUES ({', '.join(ins_vals)})"
    )
    row = wh.read("ns", name).collect()[0]
    assert row.id == "r1" and row.v == 10
    for cname, _t, feat in cols:
        if feat[0] == "default":
            assert getattr(row, cname) == feat[1]
        elif feat[0] == "identity":
            assert getattr(row, cname) == feat[1]  # first value = START
        elif feat[0] == "generated":
            assert getattr(row, cname) == 21  # v * 2 + 1
    wh.drop_table("ns", name)


@given(ast=create_ast())
@FUZZ
def test_create_table_like_copies_shape(env, ast):
    """LIKE copies the full shape -- schema, key, partition, defaults,
    generated, identity -- with zero rows, for ANY fuzzed base."""
    sql, wh, spark = env
    base, like = f"cb{next(_uniq)}", f"cl{next(_uniq)}"
    sql.execute(_render_create(base, ast))
    sql.execute(f"CREATE TABLE ns.{like} LIKE ns.{base}")
    m1, m2 = wh.table_meta("ns", base), wh.table_meta("ns", like)
    for k in ("schema", "key", "partition_by", "defaults", "generated",
              "identity", "required"):
        assert m1.get(k) == m2.get(k), k
    assert wh.read("ns", like).count() == 0
    wh.drop_table("ns", like)
    wh.drop_table("ns", base)


@given(
    n_commits=st.integers(min_value=1, max_value=4),
    pick=st.integers(min_value=0, max_value=3),
)
@FUZZ
def test_clone_and_restore_hit_prefix_state(env, n_commits, pick):
    """Grow a table by n random commits; SHALLOW CLONE VERSION AS OF v
    and RESTORE TO VERSION AS OF v must both reproduce the recorded
    prefix state for any v."""
    sql, wh, spark = env
    name = f"cr{next(_uniq)}"
    S = StructType(
        [
            StructField("id", StringType(), False),
            StructField("v", LongType()),
        ]
    )
    wh.create_table("ns", name, S, key="id")
    states = {wh.current_version("ns", name): set()}
    acc: set = set()
    for i in range(n_commits):
        batch = {(f"k{i}_{j}", i * 10 + j) for j in range(2)}
        acc |= batch
        wh.insert(
            "ns", name, spark.createDataFrame(sorted(batch), S).coalesce(1)
        )
        states[wh.current_version("ns", name)] = set(acc)
    v = sorted(states)[pick % len(states)]
    clone = f"cc{next(_uniq)}"
    sql.execute(
        f"CREATE TABLE ns.{clone} SHALLOW CLONE ns.{name} "
        f"VERSION AS OF {v}"
    )
    got = {(r.id, r.v) for r in wh.read("ns", clone).collect()}
    assert got == states[v]
    sql.execute(f"RESTORE TABLE ns.{name} TO VERSION AS OF {v}")
    got = {(r.id, r.v) for r in wh.read("ns", name).collect()}
    assert got == states[v]
    wh.drop_table("ns", clone)
    wh.drop_table("ns", name)


@given(
    n_files=st.integers(min_value=1, max_value=3),
    use_pattern=st.booleans(),
)
@FUZZ
def test_copy_into_load_set_oracle(env, n_files, use_pattern):
    """COPY INTO loads exactly the (pattern-matched) file set once;
    an identical re-run is a no-op (the idempotence ledger)."""
    import os

    sql, wh, spark = env
    name = f"cp{next(_uniq)}"
    S = StructType(
        [
            StructField("id", StringType(), False),
            StructField("v", LongType()),
        ]
    )
    wh.create_table("ns", name, S)
    with tempfile.TemporaryDirectory() as d:
        want: set = set()
        for i in range(n_files):
            rows = [(f"f{i}_{j}", i * 100 + j) for j in range(3)]
            sub = os.path.join(d, f"part{i}")
            spark.createDataFrame(rows, S).coalesce(1).write.parquet(sub)
            if not use_pattern or i == 0:
                want |= set(rows)
        # Spark writes each batch as a directory of part files; the
        # default '*.parquet' glob is non-recursive, so a pattern is
        # always needed -- the fuzz toggles subsetting, not presence
        pat = (
            " PATTERN = 'part0/*.parquet'" if use_pattern
            else " PATTERN = 'part*/*.parquet'"
        )
        sql.execute(
            f"COPY INTO ns.{name} FROM '{d}' FILEFORMAT = PARQUET{pat}"
        )
        got = {(r.id, r.v) for r in wh.read("ns", name).collect()}
        assert got == want
        before = wh.current_version("ns", name)
        sql.execute(
            f"COPY INTO ns.{name} FROM '{d}' FILEFORMAT = PARQUET{pat}"
        )
        assert wh.read("ns", name).count() == len(want)  # no double-load
        assert wh.current_version("ns", name) == before
    wh.drop_table("ns", name)


@given(
    target=st.sampled_from(PAYLOADS),
    other=st.sampled_from(PAYLOADS),
    n_new=st.integers(min_value=1, max_value=3),
)
@FUZZ
def test_replace_where_matches_python_oracle(env, target, other, n_new):
    """INSERT INTO ... REPLACE WHERE category = '<adversarial>' swaps
    exactly that category's rows (Python set oracle); a batch row
    outside the predicate raises per the Delta contract."""
    if target == other:
        other = other + "_x"
    sql, wh, spark = env
    name = f"rw{next(_uniq)}"
    S = StructType(
        [
            StructField("id", StringType(), False),
            StructField("category", StringType()),
            StructField("v", LongType()),
        ]
    )
    wh.create_table("ns", name, S, partition_by="category")
    base = [("o1", other, 1), ("o2", other, 2), ("t1", target, 3)]
    wh.insert("ns", name, spark.createDataFrame(base, S).coalesce(1))
    new_rows = [(f"n{j}", target, 100 + j) for j in range(n_new)]
    values = ", ".join(
        f"({_lit(i)}, {_lit(c)}, {v})" for i, c, v in new_rows
    )
    sql.execute(
        f"INSERT INTO ns.{name} REPLACE WHERE category = {_lit(target)} "
        f"VALUES {values}"
    )
    got = {(r.id, r.category, r.v) for r in wh.read("ns", name).collect()}
    want = {r for r in base if r[1] != target} | set(new_rows)
    assert got == want
    with pytest.raises(ValueError, match="replaceWhere"):
        sql.execute(
            f"INSERT INTO ns.{name} REPLACE WHERE category = {_lit(target)} "
            f"VALUES ('x', {_lit(other)}, 1)"
        )
    wh.drop_table("ns", name)


@given(new_name=st.sampled_from(["renamed", "wherever", "selector", "tt"]))
@FUZZ
def test_alter_rename_to_roundtrip(env, new_name):
    sql, wh, spark = env
    name = f"rn{next(_uniq)}"
    new_name = f"{new_name}{next(_uniq)}"
    S = StructType([StructField("id", StringType(), False)])
    wh.create_table("ns", name, S)
    wh.insert("ns", name, spark.createDataFrame([("a",), ("b",)], S))
    sql.execute(f"ALTER TABLE ns.{name} RENAME TO ns.{new_name}")
    assert wh.read("ns", new_name).count() == 2
    assert name not in wh.list_tables("ns")
    wh.drop_table("ns", new_name)


# -- parse-or-raise: corrupted DDL must raise, never mis-route ---------
BAD_DDL = [
    "CREATE TABLE ns.x SHALLOW CLONE ns.y WHERE v > 1",
    "CREATE TABLE ns.x LIKE ns.y PARTITIONED BY (id)",
    "CREATE TABLE ns.x (id STRING,)",
    "CREATE TABLE ns.x",
    "CREATE TABLE ns.x (id STRING) PARTITIONED BY ()",
    "COPY INTO ns.x FROM /nopath FILEFORMAT = PARQUET",
    "COPY INTO ns.x FROM '/p' FORMAT = PARQUET",
    "RESTORE TABLE ns.x VERSION AS OF 1",
    "RESTORE TABLE ns.x TO VERSION AS OF",
    "ALTER TABLE ns.x RENAME ns.y",
    "ALTER TABLE ns.x RENAME TO ns.y.z",
    "INSERT INTO ns.x REPLACE WHERE VALUES (1)",
    "CREATE SHALLOW TABLE ns.x CLONE ns.y",
    "TRUNCATE ns.x",
]


@pytest.mark.parametrize("stmt", BAD_DDL)
def test_malformed_ddl_raises_and_mutates_nothing(env, stmt):
    sql, wh, spark = env
    before = set(wh.list_tables("ns"))
    with pytest.raises((ValueError, Exception)):
        sql.execute(stmt)
    assert set(wh.list_tables("ns")) == before
