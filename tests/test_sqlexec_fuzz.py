"""Hypothesis fuzz over the SQL router's documented grammar
(sources/sqlexec.py module docstring, "Accepted grammar").

Strategy: statements are generated from a structured AST first, then
RENDERED to SQL text -- so every example carries its own independent
oracle (the AST evaluated in pure Python for DML, or the same text
re-rendered against plain temp views for SELECT) and the router's
regex/masking layer is what's actually under test. Literal payloads
and aliases are drawn adversarially: SQL keywords inside strings
(``WHERE``/``AND``/``THEN DELETE``), doubled quotes, parens, commas,
``$files`` and ``ns.t`` lookalikes, mask-placeholder lookalikes,
aliases that shadow the namespace name or contain keywords as
substrings. The split layer must never let any of these change the
statement shape.
"""

from __future__ import annotations

import itertools
import operator
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType,
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


SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("category", StringType()),
        StructField("qty", LongType()),
        StructField("price", DoubleType()),
    ]
)

# eight fixed rows; categories include payload-bait values so literal
# equality predicates can match (payloads below reuse these strings)
ROWS = [
    (1, "plain", 5, 1.5),
    (2, "a WHERE b", 10, 2.5),
    (3, "it's", 15, 3.5),
    (4, "x AND y", 20, 4.5),
    (5, "(SELECT", 25, 5.5),
    (6, "ns.t", 30, 6.5),
    (7, "WHEN MATCHED THEN DELETE", 35, 7.5),
    (8, "plain", 40, 8.5),
]
U_ROWS = [(1, 3), (2, 6), (3, 9), (4, 12)]  # (id, uval)

# adversarial string payloads: keywords, doubled quotes, parens,
# commas, metadata-table and placeholder lookalikes. Stored-value form;
# rendered with '' doubling.
PAYLOADS = [
    "plain",
    "a WHERE b",
    "it's",
    "x AND y",
    "(SELECT",
    "ns.t",
    "WHEN MATCHED THEN DELETE",
    "a, FROM b",
    "LIT0",
    "0) OR (1=1",
    "$files",
    "FOR VERSION AS OF 1",
]
# aliases that shadow the namespace / contain keywords as substrings
ALIASES = ["anded", "wherever", "selector", "fromage", "ns", "q", "tt"]
OPS = {
    "<": operator.lt,
    "<=": operator.le,
    ">": operator.gt,
    ">=": operator.ge,
    "=": operator.eq,
    "!=": operator.ne,
}

_uniq = itertools.count()


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# -- predicate AST: list of conjuncts ---------------------------------
num_cmp = st.tuples(
    st.just("cmp"),
    st.sampled_from(["qty", "id"]),
    st.sampled_from(sorted(OPS)),
    st.integers(min_value=0, max_value=45),
)
str_eq = st.tuples(
    st.just("streq"), st.just("category"), st.sampled_from(PAYLOADS)
)
in_sub = st.tuples(
    st.just("insub"),
    st.sampled_from(["IN", "NOT IN"]),
    st.integers(min_value=0, max_value=12),  # uval threshold
)
conjuncts = st.lists(
    st.one_of(num_cmp, str_eq, in_sub), min_size=1, max_size=3
)


def _render_pred(conj: list[tuple], u_name: str) -> str:
    parts = []
    for c in conj:
        if c[0] == "cmp":
            parts.append(f"{c[1]} {c[2]} {c[3]}")
        elif c[0] == "streq":
            parts.append(f"category = {_lit(c[2])}")
        else:
            parts.append(
                f"id {c[1]} (SELECT id FROM {u_name} WHERE uval <= {c[2]})"
            )
    return " AND ".join(parts)


def _eval_pred(conj: list[tuple], row: tuple) -> bool:
    rid, cat, qty, _price = row
    for c in conj:
        if c[0] == "cmp":
            v = qty if c[1] == "qty" else rid
            if not OPS[c[2]](v, c[3]):
                return False
        elif c[0] == "streq":
            if cat != c[2]:
                return False
        else:
            keys = {i for i, uv in U_ROWS if uv <= c[2]}
            hit = rid in keys
            if (c[1] == "IN") != hit:
                return False
    return True


@pytest.fixture(scope="module")
def fuzz_env(spark):
    """One warehouse with ns.t / ns.u, plus plain temp views of the
    SAME data (direct_t / direct_u) for differential SELECT checks."""
    with tempfile.TemporaryDirectory() as d:
        wh = Warehouse(spark, d)
        wh.create_namespace("ns")
        wh.create_table("ns", "t", SCHEMA, key="id")
        wh.insert("ns", "t", spark.createDataFrame(ROWS, SCHEMA).coalesce(1))
        u_schema = "id BIGINT, uval BIGINT"
        wh.create_table(
            "ns", "u",
            StructType(
                [
                    StructField("id", LongType(), False),
                    StructField("uval", LongType()),
                ]
            ),
            key="id",
        )
        wh.insert(
            "ns", "u", spark.createDataFrame(U_ROWS, u_schema).coalesce(1)
        )
        spark.createDataFrame(ROWS, SCHEMA).createOrReplaceTempView(
            "direct_t"
        )
        spark.createDataFrame(U_ROWS, u_schema).createOrReplaceTempView(
            "direct_u"
        )
        yield WarehouseSQL(wh), wh, spark


FUZZ = settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
# DML examples pay a table create + insert each; fewer, still adversarial
FUZZ_DML = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    conj=conjuncts,
    alias=st.sampled_from(ALIASES),
    use_alias=st.booleans(),
    order=st.booleans(),
    bait=st.sampled_from(PAYLOADS),
)
@FUZZ
def test_select_matches_direct_spark(fuzz_env, conj, alias, use_alias, order, bait):
    """Router SELECT == the same AST rendered against plain temp views.
    The projection carries an adversarial literal column so unmasking
    must restore it verbatim; the table ref may carry an alias that
    shadows the namespace name."""
    sql, _wh, spark = fuzz_env
    q = alias if use_alias else None
    col = f"{q}.qty" if q else "qty"

    def render(t_name: str, u_name: str) -> str:
        txt = (
            f"SELECT {col} AS qv, category, {_lit(bait)} AS tag "
            f"FROM {t_name}{' ' + q if q else ''} "
            f"WHERE {_render_pred(conj, u_name)}"
        )
        if order:
            txt += " ORDER BY qv"
        return txt

    got = sql.execute(render("ns.t", "ns.u")).collect()
    want = spark.sql(render("direct_t", "direct_u")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # independent oracle: the AST evaluated in Python
    assert sorted(r.qv for r in got) == sorted(
        r[2] for r in ROWS if _eval_pred(conj, r)
    )


@given(conj=conjuncts, strategy=st.sampled_from(["cow", "mor"]))
@FUZZ_DML
def test_delete_matches_python_oracle(fuzz_env, conj, strategy):
    """DELETE WHERE <generated predicate> leaves exactly the rows the
    pure-Python evaluation of the same AST keeps."""
    _sql, wh, spark = fuzz_env
    name = f"fz{next(_uniq)}"
    wh.create_table("ns", name, SCHEMA, key="id")
    wh.insert("ns", name, spark.createDataFrame(ROWS, SCHEMA).coalesce(1))
    sql = WarehouseSQL(wh)
    sql.execute(
        f"DELETE FROM ns.{name} WHERE {_render_pred(conj, 'ns.u')}",
        strategy=strategy,
    )
    got = {r.id for r in wh.read("ns", name).collect()}
    want = {r[0] for r in ROWS if not _eval_pred(conj, r)}
    assert got == want
    wh.drop_table("ns", name)


@given(
    conj=conjuncts,
    payload=st.sampled_from(PAYLOADS),
    strategy=st.sampled_from(["cow", "mor"]),
)
@FUZZ_DML
def test_update_matches_python_oracle(fuzz_env, conj, payload, strategy):
    """UPDATE SET category = '<adversarial>' WHERE <generated>: the SET
    split must not break on keywords inside the literal, and exactly
    the AST-matched rows change."""
    _sql, wh, spark = fuzz_env
    name = f"fz{next(_uniq)}"
    wh.create_table("ns", name, SCHEMA, key="id")
    wh.insert("ns", name, spark.createDataFrame(ROWS, SCHEMA).coalesce(1))
    sql = WarehouseSQL(wh)
    sql.execute(
        f"UPDATE ns.{name} SET category = {_lit(payload)}, qty = qty + 1 "
        f"WHERE {_render_pred(conj, 'ns.u')}",
        strategy=strategy,
    )
    got = {(r.id, r.category, r.qty) for r in wh.read("ns", name).collect()}
    want = {
        (r[0], payload, r[2] + 1) if _eval_pred(conj, r) else (r[0], r[1], r[2])
        for r in ROWS
    }
    assert got == want
    wh.drop_table("ns", name)


@given(
    talias=st.sampled_from(ALIASES),
    salias=st.sampled_from([a for a in ALIASES if a != "ns"]),
    payload=st.sampled_from(PAYLOADS),
    n_src=st.integers(min_value=1, max_value=4),
)
@FUZZ_DML
def test_merge_matches_python_oracle(fuzz_env, talias, salias, payload, n_src):
    """Canonical MERGE with adversarial aliases and literal payloads in
    a parenthesized source subquery (its own SELECT/WHERE must not
    confuse the ON/WHEN split)."""
    _sql, wh, spark = fuzz_env
    if talias == salias:
        salias = salias + "2"
    name = f"fz{next(_uniq)}"
    wh.create_table("ns", name, SCHEMA, key="id")
    wh.insert("ns", name, spark.createDataFrame(ROWS, SCHEMA).coalesce(1))
    sql = WarehouseSQL(wh)
    # source: ids 6..6+n_src-1 (mix of matched + new), payload category
    src = (
        f"(SELECT id + 5 AS id, {_lit(payload)} AS category, "
        f"CAST(100 AS BIGINT) AS qty, 9.5 AS price "
        f"FROM direct_u WHERE id <= {n_src})"
    )
    sql.execute(
        f"MERGE INTO ns.{name} AS {talias} USING {src} AS {salias} "
        f"ON {talias}.id = {salias}.id "
        f"WHEN MATCHED THEN UPDATE SET * "
        f"WHEN NOT MATCHED THEN INSERT *"
    )
    got = {(r.id, r.category, r.qty) for r in wh.read("ns", name).collect()}
    upserts = {i + 5 for i in range(1, n_src + 1)}
    want = {
        (r[0], r[1], r[2]) for r in ROWS if r[0] not in upserts
    } | {(i, payload, 100) for i in upserts}
    assert got == want
    wh.drop_table("ns", name)


def test_nul_byte_rejected(fuzz_env):
    sql, _wh, _spark = fuzz_env
    with pytest.raises(ValueError, match="NUL"):
        sql.execute("SELECT * FROM ns.t WHERE category = '\x00LIT0\x00'")


def test_doubled_quote_literal_roundtrips(fuzz_env):
    """ANSI ''-doubling is the documented escape: a WHERE keyword and a
    doubled quote in one literal must come back verbatim."""
    sql, _wh, _spark = fuzz_env
    rows = sql.execute(
        "SELECT category FROM ns.t WHERE category = 'it''s'"
    ).collect()
    assert [r.category for r in rows] == ["it's"]


def test_unsupported_head_raises(fuzz_env):
    sql, _wh, _spark = fuzz_env
    with pytest.raises(ValueError, match="unsupported statement"):
        sql.execute("FROBNICATE ns.t")


# -- INSERT VALUES fuzz: partial column lists + DEFAULT cells ----------
ins_cell = st.one_of(
    st.just("DEFAULT"),
    st.sampled_from(PAYLOADS),
)


@given(
    cells=st.lists(ins_cell, min_size=1, max_size=3),
    partial=st.booleans(),
    with_default=st.booleans(),
)
@FUZZ_DML
def test_insert_values_matches_python_oracle(
    fuzz_env, cells, partial, with_default
):
    """INSERT VALUES rows mixing adversarial string literals with the
    DEFAULT keyword, against full and partial column lists: each cell
    must land as data (keywords inside literals inert), each DEFAULT
    must resolve to the declared default (or NULL), and omitted
    columns of a partial list must fill like DEFAULT."""
    _sql, wh, spark = fuzz_env
    name = f"fz{next(_uniq)}"
    wh.create_table("ns", name, SCHEMA, key="id")
    sql = WarehouseSQL(wh)
    default = "d WHERE d" if with_default else None
    if default is not None:
        sql.execute(
            f"ALTER TABLE ns.{name} ALTER COLUMN category "
            f"SET DEFAULT {_lit(default)}"
        )
    rows_sql, want = [], set()
    for i, cell in enumerate(cells):
        cat = "DEFAULT" if cell == "DEFAULT" else _lit(cell)
        if partial:
            rows_sql.append(f"({i}, {cat})")
        else:
            rows_sql.append(f"({i}, {cat}, {10 * i}, DEFAULT)")
        expect_cat = default if cell == "DEFAULT" else cell
        want.add((i, expect_cat, 10 * i if not partial else None, None))
    cols = "(id, category)" if partial else ""
    sql.execute(
        f"INSERT INTO ns.{name} {cols} VALUES {', '.join(rows_sql)}"
    )
    got = {
        (r.id, r.category, r.qty, r.price)
        for r in wh.read("ns", name).collect()
    }
    assert got == want
    wh.drop_table("ns", name)


# -- MV shape classifier invariants (pure text, no Spark) --------------------


_SHAPE_KEYS = st.sampled_from(["a", "b", "x % 4", "UPPER(c)"])
_SHAPE_FNS = st.sampled_from(["SUM", "COUNT", "MIN", "MAX"])


@st.composite
def _shape_query(draw):
    keys = draw(st.lists(_SHAPE_KEYS, min_size=1, max_size=3, unique=True))
    fns = draw(st.lists(_SHAPE_FNS, min_size=1, max_size=3))
    where = draw(st.sampled_from(
        [None, "v >= 1", "name = 'a WHERE b''s'", "v >= 1 AND a != 'X'"]
    ))
    items = []
    for i, k in enumerate(keys):
        items.append(k if k.isidentifier() else f"{k} AS k{i}")
    for i, fn in enumerate(fns):
        items.append(f"{fn}(v) AS agg{i}")
    q = f"SELECT {', '.join(items)} FROM ns.t"
    if where:
        q += f" WHERE {where}"
    q += " GROUP BY " + ", ".join(keys)
    return q


@given(q=_shape_query(), seed=st.integers(0, 2**16))
@settings(max_examples=300, deadline=None)
def test_mv_shape_classifier_is_layout_insensitive(q, seed):
    """The classifier must (a) accept every query from the accepted
    grammar, (b) never crash on whitespace/case mutations, and (c)
    classify a mutated-but-equivalent layout IDENTICALLY -- the
    property transparent routing's query-vs-definition matching rests
    on. Mutations never touch string literals (masked before any
    folding)."""
    import random

    base = WarehouseSQL._mv_select_shape(q, require_group_by=True)
    assert base is not None, q
    # mutate layout outside literals: random case on keywords, extra
    # whitespace at token boundaries
    from sample_for_transactional_datalake_using_s3tables_spark.sources.sqlexec import (
        _mask_literals,
        _unmask,
    )

    masked, lits = _mask_literals(q)
    rng = random.Random(seed)
    out = []
    import re as _re
    # mutate only OUTSIDE placeholder spans (corrupting a placeholder
    # is not a layout mutation, it is different text)
    for part in _re.split(r"(\x00LIT\d+\x00)", masked):
        if part.startswith("\x00"):
            out.append(part)
            continue
        for ch in part:
            if ch == " ":
                out.append(" " * rng.randint(1, 3))
            elif ch.isalpha() and rng.random() < 0.5:
                out.append(ch.swapcase())
            else:
                out.append(ch)
    mutated = _unmask("".join(out), lits)
    got = WarehouseSQL._mv_select_shape(mutated, require_group_by=True)
    assert got is not None, (q, mutated)

    def canon(shape):
        # aliases are OUTPUT names and legitimately case-preserving --
        # compare everything the ROUTER's match depends on
        return (
            shape["src"], shape["where"],
            sorted(e for e, _ in shape["keys"]),
            sorted((fn, inner) for fn, inner, _ in shape["aggs"]),
            [a.lower() for _, a in shape["keys"]],
            [a.lower() for _, _, a in shape["aggs"]],
        )

    assert canon(got) == canon(base), (q, mutated)


@given(junk=st.text(min_size=0, max_size=120), seed=st.integers(0, 99))
@settings(max_examples=300, deadline=None)
def test_mv_shape_classifier_never_crashes(junk, seed):
    """Arbitrary text (including NULs, quotes, parens) must classify to
    a dict or None -- never raise. The router runs this on every SELECT
    a user types."""
    for prefix in ("", "SELECT ", "SELECT a, SUM(v) AS s FROM "):
        got = WarehouseSQL._mv_select_shape(
            prefix + junk, require_group_by=(seed % 2 == 0)
        )
        assert got is None or isinstance(got, dict)
