"""Relational operator inventory (SURVEY.md sections 2.3 and 2.6).

The reference declares its query surface in Athena SQL -- its whole corpus
is three queries (reference README.md:143-205): a smoke scan+LIMIT, "Risk
Analysis by Region and Merchant Category" (README.md:169-185), and "Hourly
Transaction Pattern Analysis" (README.md:189-205). Those exercise
scan/limit, projection, date-window filters, multi-key hash aggregation,
COUNT(*)/SUM(CAST)/conditional CASE counts/COUNT(DISTINCT), HAVING,
ORDER BY. Everything else (joins, windows, rollup/cube, set ops,
subqueries, scalar functions) is capability the reference delegates to
Athena-over-Iceberg; we implement the full surface Spark-first.

Mapping of reference fixtures onto driver testdata (FIXTURES.md F4): the
``events`` table plays the transactions-fact role; the TPC-H-ish star
covers joins and the analytic surface.

Determinism rules shared with the DuckDB oracles:

- LIMIT/top-k queries always carry a total ORDER BY with a unique
  tiebreak column -- otherwise the row *set* is engine-dependent.
- Aggregates over floating columns cast to DECIMAL per row *before*
  SUM, so addition is exact and shuffle-order-independent. Per-row
  double arithmetic (identical IEEE expression shape on both sides)
  stays in double.
- Averages are computed as exact-decimal-sum cast to double divided by
  COUNT, avoiding engine-specific decimal-division scale rules.

Scale notes: every query here is a declarative DataFrame plan --
Catalyst pushes filters/projections into the parquet scan, dimension
joins broadcast (region/nation/customer at TPC-H proportions stay tiny
relative to fact tables), and the only shuffles are the groupBy/join
keys themselves. AQE handles skew and partition coalescing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.testdata import load_table

DEC = "decimal(18,2)"
DEC4 = "decimal(18,4)"


def _with_week_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events rows from the trailing 7 days (relative to max ts -- the
    data is fixed, so CURRENT_DATE from the reference queries
    (README.md:181) is re-anchored to the dataset's own "now")."""
    events = load_table(spark, sf_dir, "events")
    mx = events.agg(F.max("ts").alias("_mx"))
    return (
        events.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("_mx") - F.expr("INTERVAL 7 DAYS"))
        .drop("_mx")
    )


# --------------------------------------------------------------------------
# Q1/Q2: scan + LIMIT, projection  (reference README.md:144)
# --------------------------------------------------------------------------

def scan_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * ... LIMIT 100 smoke scan (README.md:144), made
    deterministic with a unique-key ORDER BY."""
    return load_table(spark, sf_dir, "events").orderBy("event_id").limit(100)


def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit column list projection (README.md:171-179); Catalyst
    prunes the parquet scan to exactly these columns."""
    return load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )


# --------------------------------------------------------------------------
# Q3/Q4: date-window filters (README.md:181, README.md:202) -- the
# partition-pruning predicates at scale.
# --------------------------------------------------------------------------

def filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE ts >= <dataset now> - INTERVAL 7 DAY (README.md:181)."""
    return _with_week_window(spark, sf_dir).select(
        "event_id", F.col("ts").cast("date").alias("event_date"), "event_type", "value"
    )


def filter_date_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE date = <dataset today> (README.md:202)."""
    events = load_table(spark, sf_dir, "events")
    mx = events.agg(F.max(F.col("ts").cast("date")).alias("_mxd"))
    return (
        events.crossJoin(F.broadcast(mx))
        .filter(F.col("ts").cast("date") == F.col("_mxd"))
        .select("event_id", "user_id", "event_type", "value")
    )


# --------------------------------------------------------------------------
# Flagship: Risk Analysis (README.md:169-185) re-expressed on events.
# Exercises Q5 multi-key groupBy, Q6 COUNT(*), Q7 SUM(CAST), Q8
# conditional counts, Q10 HAVING, Q11 ORDER BY DESC, Q13-Q17 scalars.
# --------------------------------------------------------------------------

def risk_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _with_week_window(spark, sf_dir)
        .groupBy(
            F.expr("CAST(ts AS DATE) AS event_date"),
            F.col("event_type"),
        )
        .agg(
            # expr-string aggregates (optimization r14): identical
            # expressions, one JVM parse per column instead of dozens
            # of py4j round trips (see _money_atom_sql)
            F.expr("COUNT(*) AS total_events"),
            # exact int64 cents sum (see _money_atom): value atoms are
            # ~5e4, so one int64 sum holds ~1.6e14 rows per group
            F.expr(
                f"CAST({money_sum_sql('value', ('events', 'value'))}"
                f" AS {DEC}) AS total_value"
            ),
            F.expr(
                "COUNT(CASE WHEN value > 100 THEN 1 END)"
                " AS high_value_events"
            ),
            F.expr(
                "COUNT(CASE WHEN value > 300 THEN 1 END)"
                " AS very_high_value_events"
            ),
            F.expr("COUNT(DISTINCT user_id) AS unique_users"),
        )
        .filter(F.col("high_value_events") > 0)
        .orderBy(F.col("high_value_events").desc(), "event_date", "event_type")
    )


RISK_ANALYSIS_SQL = """
SELECT CAST(ts AS DATE) AS event_date,
       event_type,
       COUNT(*) AS total_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value,
       COUNT(CASE WHEN value > 100 THEN 1 END) AS high_value_events,
       COUNT(CASE WHEN value > 300 THEN 1 END) AS very_high_value_events,
       COUNT(DISTINCT user_id) AS unique_users
FROM events
WHERE ts >= (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
GROUP BY 1, 2
HAVING COUNT(CASE WHEN value > 100 THEN 1 END) > 0
ORDER BY high_value_events DESC, event_date, event_type
"""


def hourly_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly Transaction Pattern Analysis (README.md:189-205): 4-key
    groupBy + COUNT DISTINCT + conditional counts on the dataset's
    last day, ORDER BY hour, total DESC (README.md:202-204)."""
    events = load_table(spark, sf_dir, "events")
    mx = events.agg(F.max(F.col("ts").cast("date")).alias("_mxd"))
    return (
        events.crossJoin(F.broadcast(mx))
        .filter(F.col("ts").cast("date") == F.col("_mxd"))
        .groupBy(
            F.expr("CAST(ts AS DATE) AS event_date"),
            F.expr("hour(ts) AS event_hour"),
            "event_type",
        )
        .agg(
            F.expr("COUNT(*) AS total_events"),
            F.expr("COUNT(DISTINCT user_id) AS unique_users"),
            F.expr(
                f"CAST({money_sum_sql('value', ('events', 'value'))}"
                f" AS {DEC}) AS total_value"
            ),
            F.expr(
                "COUNT(CASE WHEN value > 200 THEN 1 END) AS large_events"
            ),
        )
        .orderBy("event_hour", F.col("total_value").desc(), "event_type")
    )


HOURLY_PATTERN_SQL = """
SELECT CAST(ts AS DATE) AS event_date,
       CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS event_hour,
       event_type,
       COUNT(*) AS total_events,
       COUNT(DISTINCT user_id) AS unique_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value,
       COUNT(CASE WHEN value > 200 THEN 1 END) AS large_events
FROM events
WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
GROUP BY 1, 2, 3
ORDER BY event_hour, total_value DESC, event_type
"""


def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-filtered aggregate battery (README.md:177-179 pattern)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("total_events"),
            F.count(F.when(F.col("value") > 50, 1)).alias("over_50"),
            F.count(F.when(F.col("value") > 150, 1)).alias("over_150"),
            F.sum(F.when(F.col("value") > 150, F.col("value").cast(DEC)).otherwise(F.lit(0).cast(DEC)))
            .cast(DEC)
            .alias("value_over_150"),
        )
    )


CONDITIONAL_AGG_SQL = """
SELECT event_type,
       COUNT(*) AS total_events,
       COUNT(CASE WHEN value > 50 THEN 1 END) AS over_50,
       COUNT(CASE WHEN value > 150 THEN 1 END) AS over_150,
       CAST(SUM(CASE WHEN value > 150 THEN CAST(value AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS value_over_150
FROM events
GROUP BY event_type
"""


def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) (README.md:198). The scalable variant is
    ``approx_count_distinct`` (HLL) -- exact is what the oracle checks."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("unique_users"),
            F.count("*").alias("total_events"),
        )
    )


COUNT_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS unique_users, COUNT(*) AS total_events
FROM events GROUP BY event_type
"""


def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING on an aggregate (README.md:183)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") > 10)
    )


HAVING_FILTER_SQL = """
SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id HAVING COUNT(*) > 10
"""


def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k = ORDER BY ... LIMIT k; Spark plans TakeOrderedAndProject
    (no full sort, no single-node shuffle of the whole table)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                f"CAST({money_sum_sql('value', ('events', 'value'))}"
                f" AS {DEC}) AS total_value"
            )
        )
        .orderBy(F.col("total_value").desc(), "user_id")
        .limit(10)
    )


TOPK_SQL = """
SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
FROM events GROUP BY user_id ORDER BY total_value DESC, user_id LIMIT 10
"""


# --------------------------------------------------------------------------
# TPC-H-style analytics on the star schema (SURVEY 2.6 extension surface).
# --------------------------------------------------------------------------

_MONEY_SPLIT = 1_000_000

# The documented exact-2-decimal money domain (TESTDATA.md; pinned
# per-SF by tests/test_testdata.py::test_money_columns_are_cents).
# _money_atom's round(x*100) trick is ONLY exact on such domains: a
# 3-decimal value (or one near a .5-cent tie) silently diverges from
# the declared decimal semantics. Membership here is the authorization
# to take the int64 atom path; anything else must use decimal sums
# (``money_sum`` routes automatically). Affine transforms of a contract
# column with small exact-decimal literals (1 - l_discount, 1 + l_tax)
# stay exact-2-decimal, so they inherit the source column's domain.
_MONEY_2DP_COLUMNS = frozenset(
    {
        ("events", "value"),
        ("lineitem", "l_quantity"),
        ("lineitem", "l_extendedprice"),
        ("lineitem", "l_discount"),
        ("lineitem", "l_tax"),
        ("orders", "o_totalprice"),
        ("part", "p_retailprice"),
        ("supplier", "s_acctbal"),
        ("customer", "c_acctbal"),
    }
)


def _money_atom(
    col: F.Column, domain: tuple[str, str], strict: bool = True
) -> F.Column | None:
    """Money column (exact 2-decimal double, see TESTDATA.md) -> integer
    cents as int64. round(x*100) == cast(x as decimal(12,2))*100 on this
    domain (pinned by tests/test_testdata.py::test_money_columns_are_cents):
    2-decimal values are at most ~1e-9 off an integer after *100, far
    inside round()'s half-unit tolerance, and no exact .5 ties exist.

    ``domain`` names the (table, column) whose membership in
    ``_MONEY_2DP_COLUMNS`` authorizes the atom path (optimization r14
    guard): outside the contract the rewrite is NOT exact, so strict
    callers fail loudly at plan-build time and ``money_sum`` falls back
    to decimal sums instead."""
    if domain not in _MONEY_2DP_COLUMNS:
        if strict:
            raise ValueError(
                f"money column {domain!r} is outside the documented "
                "exact-2-decimal contract; use decimal sums "
                "(money_sum falls back automatically)"
            )
        return None
    return F.round(col * 100).cast("bigint")


def money_sum(col: F.Column, domain: tuple[str, str]) -> F.Column:
    """SUM of a money column: exact int64 cent atoms when ``domain`` is
    inside the documented exact-2-decimal contract (the fast path every
    testdata money column takes -- identical expression to the r13
    formulation, so plans are unchanged), exact decimal(18,2) sums
    otherwise (correct on any numeric domain, ~20x more per-row work)."""
    atom = _money_atom(col, domain, strict=False)
    if atom is None:
        return F.sum(col.cast("decimal(18,2)")).cast("decimal(38,2)")
    return _int_to_dec(F.sum(atom), 2)


def _split_sum(atom: F.Column, tag: str) -> list[F.Column]:
    """Overflow-safe exact int64 sum of ``atom`` (optimization r13,
    guide section 1.2 "per-task work"): sum lo = atom mod 1e6 and
    hi = atom div 1e6 as two codegen int64 sums and recombine in
    decimal(38) AFTER aggregation. Per-group bounds: lo < 1e6 and
    hi <= ~1.2e5 (charge atoms <= 1.26e11), so int64 holds ~9e12 rows
    per group -- above a 100 TB table's total row count -- while the
    per-row work stays pure long arithmetic (the previous per-row
    BigDecimal sums were ~20x slower and dominated the scan stage).

    hi divides (atom - atom % SPLIT), an exact multiple of SPLIT: the
    float64 division of two exactly-representable operands whose true
    quotient is an integer < 2^53 is exact (correctly-rounded IEEE
    division returns representable results exactly). A bare
    ``atom / SPLIT`` would round the double quotient and could cross an
    integer boundary before the truncating cast."""
    lo = atom % _MONEY_SPLIT
    return [
        F.sum(lo).alias(f"{tag}_lo"),
        F.sum(((atom - lo) / F.lit(_MONEY_SPLIT)).cast("bigint")).alias(
            f"{tag}_hi"
        ),
    ]


def _combine_split(tag: str) -> F.Column:
    d38 = "decimal(38,0)"
    return (
        F.col(f"{tag}_hi").cast(d38) * _MONEY_SPLIT + F.col(f"{tag}_lo").cast(d38)
    )


# ---- Spark-SQL fragment twins of the money helpers (optimization r14,
# guide §1.1 driver-side wall): each bench money query built its
# aggregate list from dozens of composed Column operations, and every
# Column operation is one or more py4j round trips (~0.4 ms each;
# risk_analysis alone was 622 round trips, ~0.3 s of pure driver wall
# per build). These fragments spell out the IDENTICAL expressions --
# same functions, same literal types, same casts, so the analyzed plan
# is unchanged -- and each output column costs ONE JVM parse. Contract
# enforcement is unchanged: callers obtain atoms via _money_atom_sql,
# which applies the same _MONEY_2DP_COLUMNS gate.


def _money_atom_sql(frag: str, domain: tuple[str, str]) -> str:
    """SQL twin of :func:`_money_atom` (same contract gate)."""
    if domain not in _MONEY_2DP_COLUMNS:
        raise ValueError(
            f"money column {domain!r} is outside the documented "
            "exact-2-decimal contract; use decimal sums"
        )
    return f"CAST(ROUND(({frag}) * 100) AS BIGINT)"


def _split_sum_sql(atom: str, tag: str) -> list[str]:
    """SQL twin of :func:`_split_sum` (same lo/hi exactness argument)."""
    lo = f"(({atom}) % {_MONEY_SPLIT})"
    return [
        f"SUM({lo}) AS {tag}_lo",
        f"SUM(CAST((({atom}) - {lo}) / {_MONEY_SPLIT} AS BIGINT))"
        f" AS {tag}_hi",
    ]


def _int_to_dec_sql(frag: str, scale_pow: int) -> str:
    """SQL twin of :func:`_int_to_dec`."""
    return (
        f"CAST(CAST(({frag}) AS DECIMAL(38,0)) / {10 ** scale_pow}"
        f" AS DECIMAL(38,{scale_pow}))"
    )


def _combine_split_sql(tag: str) -> str:
    """SQL twin of :func:`_combine_split`."""
    return (
        f"(CAST({tag}_hi AS DECIMAL(38,0)) * {_MONEY_SPLIT}"
        f" + CAST({tag}_lo AS DECIMAL(38,0)))"
    )


def money_sum_sql(frag: str, domain: tuple[str, str]) -> str:
    """SQL twin of :func:`money_sum` (same contract routing)."""
    if domain not in _MONEY_2DP_COLUMNS:
        return f"CAST(SUM(CAST(({frag}) AS DECIMAL(18,2))) AS DECIMAL(38,2))"
    return _int_to_dec_sql(f"SUM({_money_atom_sql(frag, domain)})", 2)


def _int_to_dec(col: F.Column, scale_pow: int) -> F.Column:
    """Exact bigint/decimal(38,0) at fixed point 10^-scale_pow ->
    decimal(38,scale_pow). The division is exact (result scale >= true
    scale), so no rounding occurs."""
    return (col.cast("decimal(38,0)") / F.lit(10**scale_pow)).cast(
        f"decimal(38,{scale_pow})"
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem -- the headline
    scan-heavy aggregate.

    Exact-integer formulation (optimization r13): money columns are
    exact 2-decimal values, so every measure is an int64 "cents" atom
    (disc_price at scale 1e4, charge at scale 1e6 -- integer products
    are exact and identical to the decimal products) summed with
    codegen long arithmetic; the output decimals are reassembled from
    the exact integer totals AFTER aggregation. Values are bitwise
    identical to the previous per-row decimal formulation (the oracle
    SQL is unchanged), but the scan stage does no per-row BigDecimal
    work -- measured ~2x on the single-split local scan and the same
    CPU saving per task at scale. Decimal semantics preserved at the
    boundary: ROUND not cast (Spark casts round HALF_UP, DuckDB's
    truncate; round() is half-away-from-zero in both)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_i = _money_atom_sql("l_quantity", ("lineitem", "l_quantity"))
    ep_i = _money_atom_sql(
        "l_extendedprice", ("lineitem", "l_extendedprice")
    )
    d_i = _money_atom_sql("1 - l_discount", ("lineitem", "l_discount"))
    # "l_tax + 1", not "1 + l_tax": the Column form 1 + F.col went
    # through __radd__ and planned (l_tax + 1.0); spelling it the same
    # keeps the plan text byte-stable (addition is commutative, so this
    # is cosmetic either way)
    t_i = _money_atom_sql("l_tax + 1", ("lineitem", "l_tax"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        # qty atoms <= 5000: a single int64 sum holds ~1.8e15 rows/group
        F.expr(f"SUM({qty_i}) AS qty_s"),
        *[F.expr(e) for e in _split_sum_sql(ep_i, "ep")],
        *[F.expr(e) for e in _split_sum_sql(f"({ep_i} * {d_i})", "disc")],
        *[
            F.expr(e)
            for e in _split_sum_sql(f"({ep_i} * {d_i} * {t_i})", "charge")
        ],
        F.expr("COUNT(*) AS count_order"),
    )
    sum_qty = f"CAST({_int_to_dec_sql('qty_s', 2)} AS {DEC})"
    sum_base = f"CAST({_int_to_dec_sql(_combine_split_sql('ep'), 2)} AS {DEC})"
    sum_disc = (
        f"CAST(ROUND({_int_to_dec_sql(_combine_split_sql('disc'), 4)}, 2)"
        f" AS {DEC})"
    )
    sum_charge = (
        f"CAST(ROUND({_int_to_dec_sql(_combine_split_sql('charge'), 6)}, 2)"
        f" AS {DEC})"
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.expr(f"{sum_qty} AS sum_qty"),
        F.expr(f"{sum_base} AS sum_base_price"),
        F.expr(f"{sum_disc} AS sum_disc_price"),
        F.expr(f"{sum_charge} AS sum_charge"),
        F.expr(f"CAST({sum_qty} AS DOUBLE) / count_order AS avg_qty"),
        F.col("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DECIMAL(18,2)) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))), 2) AS DECIMAL(18,2)) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join fact-to-dims: orders |><| customer |><| nation |><|
    region, revenue per region/nation. Dimension sides are broadcast --
    at 100 TB the fact shuffle disappears entirely and the join is a
    map-side hash probe."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    agg = (
        orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.expr("COUNT(*) AS n_orders"),
            # o_totalprice atoms ~5.6e7: split-sum keeps the per-group
            # int64 bound above any 100 TB row count (see _split_sum)
            *[
                F.expr(e)
                for e in _split_sum_sql(
                    _money_atom_sql(
                        "o_totalprice", ("orders", "o_totalprice")
                    ),
                    "rev",
                )
            ],
        )
    )
    return agg.select(
        "r_name",
        "n_name",
        "n_orders",
        F.expr(
            f"CAST({_int_to_dec_sql(_combine_split_sql('rev'), 2)}"
            f" AS {DEC}) AS revenue"
        ),
    ).orderBy("r_name", "n_name")


REVENUE_BY_REGION_SQL = """
SELECT r_name, n_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.expr("COUNT(o_orderkey) AS n_orders"),
            # per-customer groups: one int64 cents sum is exact and far
            # under any per-group bound; SUM over the all-null group of
            # a no-order customer stays NULL -> COALESCE as before
            F.expr(
                "CAST(COALESCE("
                + money_sum_sql("o_totalprice", ("orders", "o_totalprice"))
                + f", CAST(0 AS DECIMAL(38,2))) AS {DEC}) AS total_spent"
            ),
        )
    )


JOIN_LEFT_SQL = """
SELECT c_custkey, c_mktsegment,
       COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DECIMAL(18,2)) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one open ('O') order."""
    customer = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return customer.join(
        open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""

_SALTS = 8


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient shuffle join via key salting.

    The hot-key cure when one join key dominates (AQE's skewedJoin
    handles moderate skew at runtime; salting is the explicit fix for
    pathological keys): the fact side gets a per-row salt
    ``pmod(xxhash64(event_id), S)``, the build side is replicated S
    times with an exploded salt, and the join keys on (key, salt) -- so
    one hot user's rows spread over S reducer partitions instead of one
    straggler. The engine-internal hash never reaches the output: the
    result is identical to the unsalted join, which is what the oracle
    checks. ``hint("merge")`` pins the shuffle join the pattern targets
    (an auto-broadcast would erase the demonstration at this test scale).

    The quantized int64 value total follows the engine's exact-sum rule
    (floor(v * 1e6); doubles are never summed in checked outputs).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("value_q"),
    )
    fact = ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALTS)))
    dim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(_SALTS - 1))))
    )
    joined = fact.hint("merge").join(
        dim,
        (fact.user_id == dim.c_custkey) & (fact._salt == dim._salt),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum("value_q").alias("total_value_q"),
    )


_COLOC_BUCKETS = 8


def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join over Spark-bucketed tables.

    THE join strategy for two big fact tables repeatedly joined on the
    same key (SURVEY section 6's 100 TB north star; the prompt-level
    "bucketing for co-located joins"): pay ONE bucketed write per table
    (``bucketBy(N, key) + sortBy(key)``), then every subsequent join is
    a zero-exchange SortMergeJoin -- both scans report the same
    ``HashPartitioning(key, N)``, so Catalyst plans NO Exchange on
    either side, and because the aggregation also keys on the bucket
    key the whole plan runs shuffle-free end to end (pinned by
    tests/test_plans.py::test_bucketed_join_has_no_exchange).

    At 100 TB this converts every repeat join from a full-corpus
    shuffle (the cluster-wide network bottleneck) into node-local merge
    reads; the one-time bucketed write is amortized across every
    downstream join, which is why warehouse fact tables ship bucketed
    in production lakes. ``hint("merge")`` pins SMJ so a small-scale
    auto-broadcast cannot erase the demonstration.
    """
    import tempfile

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    # External tables in a fresh temp dir: bucketing metadata lives in
    # the session catalog, the data path is unique per call, so re-runs
    # (and stale dirs from earlier sessions) can never collide.
    tmp = tempfile.mkdtemp(prefix="coloc_")
    spark.sql("DROP TABLE IF EXISTS coloc_orders")
    spark.sql("DROP TABLE IF EXISTS coloc_lineitem")
    (
        orders.write.mode("overwrite")
        .option("path", f"{tmp}/orders")
        .bucketBy(_COLOC_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("coloc_orders")
    )
    (
        li.write.mode("overwrite")
        .option("path", f"{tmp}/lineitem")
        .bucketBy(_COLOC_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("coloc_lineitem")
    )
    bo = spark.table("coloc_orders")
    bl = spark.table("coloc_lineitem")
    joined = bo.hint("merge").join(bl, bo.o_orderkey == bl.l_orderkey)
    return (
        joined.groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast(DEC).alias("revenue"),
        )
    )


JOIN_BUCKETED_SQL = """
SELECT o_orderkey, o_orderstatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderstatus
"""


JOIN_SALTED_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_q
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective fact-fact join (orders |><| lineitem)
    with dimension semi-filter, aggregate, top-10. The customer filter
    broadcasts; the orders-lineitem join co-shuffles on the order key."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = "1998-06-30"
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")).join(
        F.broadcast(building), orders.o_custkey == building.c_custkey, "left_semi"
    )
    l = li.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp"))
    # int64 revenue atoms at scale 1e4 (exact == the decimal product);
    # groups are single orders (<= 7 lineitems), so one int64 sum is
    # exact with astronomical headroom
    rev_i = "({} * {})".format(
        _money_atom_sql("l_extendedprice", ("lineitem", "l_extendedprice")),
        _money_atom_sql("1 - l_discount", ("lineitem", "l_discount")),
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.expr("CAST(o_orderdate AS DATE) AS order_date"),
            "o_orderpriority",
        )
        .agg(
            F.expr(
                f"CAST({_int_to_dec_sql(f'SUM({rev_i})', 4)} AS {DEC4})"
                " AS revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  AND o_orderdate < TIMESTAMP '1998-06-30'
  AND l_shipdate > TIMESTAMP '1998-06-30'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate -- the predicate-
    pushdown showcase (all three filters reach the parquet reader)."""
    li = load_table(spark, sf_dir, "lineitem")
    # single global group: split-sum keeps the int64 partials exact at
    # any table size (rev atoms <= ~7.4e8 at scale 1e4)
    rev_i = "({} * {})".format(
        _money_atom_sql("l_extendedprice", ("lineitem", "l_extendedprice")),
        _money_atom_sql("l_discount", ("lineitem", "l_discount")),
    )
    agg = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        *[F.expr(e) for e in _split_sum_sql(rev_i, "rev")],
        F.expr("COUNT(*) AS n_items"),
    )
    return agg.select(
        F.expr(
            f"CAST({_int_to_dec_sql(_combine_split_sql('rev'), 4)}"
            f" AS {DEC4}) AS revenue"
        ),
        "n_items",
    )


FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join, all dimensions broadcast, one
    fact co-shuffle (lineitem |><| orders on the order key)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    sup = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "n_name", "r_name")
    )
    # 25 (region, nation) groups can hold ~1/25 of the table each, so
    # the int64 revenue sum is split (lo/hi) -- exact at any scale
    rev_i = "({} * {})".format(
        _money_atom_sql("l_extendedprice", ("lineitem", "l_extendedprice")),
        _money_atom_sql("1 - l_discount", ("lineitem", "l_discount")),
    )
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_orderstatus") == "F")
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("r_name", "n_name")
        .agg(
            *[F.expr(e) for e in _split_sum_sql(rev_i, "rev")],
            F.expr("COUNT(*) AS n_items"),
        )
    )
    return agg.select(
        "r_name",
        "n_name",
        F.expr(
            f"CAST({_int_to_dec_sql(_combine_split_sql('rev'), 4)}"
            f" AS {DEC4}) AS revenue"
        ),
        "n_items",
    )


SUPPLIER_VOLUME_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(1 - l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'F'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Window functions (SURVEY 2.6).
# --------------------------------------------------------------------------

def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number per customer over order recency; keep top 3."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_totalprice").cast(DEC).alias("total_price"),
            "rn",
        )
    )


WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(o_totalprice AS DECIMAL(18,2)) AS total_price, rn
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer (unbounded-preceding frame), exact
    decimal accumulation so the result is frame-order-deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast(DEC).alias("running_spent"),
    )


WINDOW_RUNNING_SUM_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2))
         AS running_spent
FROM orders
"""


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (NTILE / PERCENT_RANK / CUME_DIST)
    per order priority -- the quantile-bucketing shape feature stores
    use for per-group score normalization. The window orders on
    (o_totalprice, o_orderkey): the key tie-break makes NTILE (which is
    position-, not value-based) deterministic across engines; the two
    rank ratios are exact rationals -> identical doubles. One shuffle
    on the partition key, sort within."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


WINDOW_DISTRIBUTION_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(NTILE(4) OVER w AS INTEGER) AS price_quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (ANSI UNPIVOT, Spark ``DataFrame.unpivot``):
    wide part attributes to long (metric, value) rows -- the shape
    feature pipelines use before per-metric aggregation. Map-only
    (each input row fans out to k output rows inside the scan
    projection, no shuffle); the per-metric rollup shuffles k x
    #groups cells."""
    part = load_table(spark, sf_dir, "part")
    long = part.select(
        "p_partkey",
        "p_brand",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot(
        ["p_partkey", "p_brand"],
        ["p_size", "p_retailprice"],
        "metric",
        "value",
    )
    return (
        long.groupBy("p_brand", "metric")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total"),
        )
        .orderBy("p_brand", "metric")
    )


UNPIVOT_MELT_SQL = """
WITH long AS (
  SELECT p_partkey, p_brand, 'p_size' AS metric,
         CAST(p_size AS DOUBLE) AS value FROM part
  UNION ALL
  SELECT p_partkey, p_brand, 'p_retailprice',
         CAST(p_retailprice AS DOUBLE) FROM part
)
SELECT p_brand, metric, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
FROM long
GROUP BY p_brand, metric
ORDER BY p_brand, metric
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead across each user's event sequence."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT user_id, event_id,
       LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
"""


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube; set operations; DISTINCT.
# --------------------------------------------------------------------------

def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count("*").alias("n_customers"))


ROLLUP_AGG_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast(DEC).alias("revenue"),
    )


CUBE_AGG_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (spark.sql)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of user populations from two event classes."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select("user_id")
    b = events.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


SET_UNION_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select("user_id")
    b = events.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


SET_INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) == DataFrame.subtract: customers with a
    partially-shipped order but no open order."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.subtract(b)


SET_EXCEPT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT == dropDuplicates (exact dedup primitive)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


DISTINCT_ROWS_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# --------------------------------------------------------------------------
# Scalar function surface: strings, dates, JSON, CASE (SURVEY 2.6).
# --------------------------------------------------------------------------

def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_type").contains("BRASS"), F.lit("brass"))
        .otherwise(F.lit("other"))
        .alias("material"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
    )


STRING_FUNCS_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       CAST(LENGTH(p_name) AS INTEGER) AS name_len,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       CASE WHEN p_type LIKE '%BRASS%' THEN 'brass' ELSE 'other' END AS material,
       REPLACE(p_name, ' ', '_') AS name_snake
FROM part
"""


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


DATE_FUNCS_SQL = """
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
       CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS order_day,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(o_orderdate AS DATE) + 30 AS due_date
FROM orders
"""


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props string column."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_id", k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.min("k").alias("min_k"), F.max("k").alias("max_k"))
    )


JSON_EXTRACT_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       COUNT(*) AS n,
       MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events
GROUP BY 1
"""


def case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 10, "small")
        .when(F.col("value") < 100, "medium")
        .when(F.col("value") < 250, "large")
        .otherwise("huge")
    )
    return (
        events.groupBy(bucket.alias("value_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.col("value").cast(DEC)).cast(DEC).alias("min_value"),
            F.max(F.col("value").cast(DEC)).cast(DEC).alias("max_value"),
        )
    )


CASE_BUCKETING_SQL = """
SELECT CASE WHEN value < 10 THEN 'small'
            WHEN value < 100 THEN 'medium'
            WHEN value < 250 THEN 'large'
            ELSE 'huge' END AS value_bucket,
       COUNT(*) AS n_events,
       CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS min_value,
       CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS max_value
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Subqueries.
# --------------------------------------------------------------------------

def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (uncorrelated subquery) -- planned as a (broadcast) semi join."""
    orders = load_table(spark, sf_dir, "orders")
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return orders.join(
        F.broadcast(building), orders.o_custkey == building.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey", F.col("o_totalprice").cast(DEC).alias("total_price"))


IN_SUBQUERY_SQL = """
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS total_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-aggregate subquery: orders above 2x the global mean price
    (mean computed as exact decimal sum / count; see module docstring)."""
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        (F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / F.count("*")).alias("_avg")
    )
    return (
        orders.crossJoin(F.broadcast(stats))
        .filter(F.col("o_totalprice") > 2 * F.col("_avg"))
        .select("o_orderkey", F.col("o_totalprice").cast(DEC).alias("total_price"))
    )


SCALAR_SUBQUERY_SQL = """
SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS total_price
FROM orders
WHERE o_totalprice > 2 * (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders
)
"""


def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an extra predicate, via the SQL surface so
    Catalyst's subquery decorrelation is exercised."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_ce_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_ce_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM _ce_customer
        WHERE EXISTS (
          SELECT 1 FROM _ce_orders
          WHERE o_custkey = c_custkey AND o_totalprice > 400000
        )
        """
    )


CORRELATED_EXISTS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: per (order year, region),
    the share of line-item revenue supplied by one nation. A 5-way
    star join -- the lineitem fact streams once; orders co-shuffles on
    the order key (the one genuinely large-large join); supplier,
    nation and region are broadcast hash probes, so no dimension ever
    shuffles the fact. The share is a single double division of two
    exact decimal sums (conditional numerator via CASE inside SUM --
    one pass, no self-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(4,2)")
    sdim = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "n_name", "r_name")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sdim), li.l_suppkey == sdim.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            "r_name",
            "n_name",
            rev.alias("rev"),
        )
    )
    total = F.sum("rev").cast(DEC4)
    national = F.sum(
        F.when(F.col("n_name") == "NATION_0", F.col("rev")).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )
    ).cast(DEC4)
    return (
        joined.groupBy("o_year", "r_name")
        .agg(
            total.alias("total_revenue"),
            national.alias("nation_revenue"),
            (national.cast("double") / total.cast("double")).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year", "r_name")
    )


MARKET_SHARE_SQL = """
WITH joined AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year, r_name, n_name,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(1 - l_discount AS DECIMAL(4,2)) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
)
SELECT o_year, r_name,
       CAST(SUM(rev) AS DECIMAL(18,4)) AS total_revenue,
       CAST(SUM(CASE WHEN n_name = 'NATION_0' THEN rev
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(18,4))
         AS nation_revenue,
       CAST(SUM(CASE WHEN n_name = 'NATION_0' THEN rev
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM(rev) AS DOUBLE) AS mkt_share
FROM joined
GROUP BY o_year, r_name
ORDER BY o_year, r_name
"""


def customer_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report: top 20 customers by revenue
    lost to returns in one quarter. The returnflag + date filters reach
    the lineitem/orders scans (predicate pushdown prunes before the
    join); customer x nation broadcasts; global top-20 is a
    TakeOrdered, not a full sort."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(4,2)")
    cdim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(cdim), orders.o_custkey == cdim.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast(DEC4).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


CUSTOMER_RETURNS_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))
         AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# Registry.
# --------------------------------------------------------------------------

QUERIES = {
    "market_share": market_share,
    "customer_returns": customer_returns,
    "scan_limit": scan_limit,
    "projection": projection,
    "filter_date_range": filter_date_range,
    "filter_date_eq": filter_date_eq,
    "risk_analysis": risk_analysis,
    "hourly_pattern": hourly_pattern,
    "conditional_agg": conditional_agg,
    "count_distinct": count_distinct,
    "having_filter": having_filter,
    "topk": topk,
    "pricing_summary": pricing_summary,
    "revenue_by_region": revenue_by_region,
    "shipping_priority": shipping_priority,
    "forecast_revenue": forecast_revenue,
    "supplier_volume": supplier_volume,
    "join_left": join_left,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_salted_skew": join_salted_skew,
    "join_bucketed_colocated": join_bucketed_colocated,
    "window_rank": window_rank,
    "window_distribution": window_distribution,
    "unpivot_melt": unpivot_melt,
    "window_running_sum": window_running_sum,
    "window_lag_lead": window_lag_lead,
    "rollup_agg": rollup_agg,
    "cube_agg": cube_agg,
    "grouping_sets": grouping_sets,
    "set_union": set_union,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "distinct_rows": distinct_rows,
    "string_funcs": string_funcs,
    "date_funcs": date_funcs,
    "json_extract": json_extract,
    "case_bucketing": case_bucketing,
    "in_subquery": in_subquery,
    "scalar_subquery": scalar_subquery,
    "correlated_exists": correlated_exists,
}

ORACLES = {
    "window_distribution": WINDOW_DISTRIBUTION_SQL,
    "unpivot_melt": UNPIVOT_MELT_SQL,
    "market_share": MARKET_SHARE_SQL,
    "customer_returns": CUSTOMER_RETURNS_SQL,
    "scan_limit": "SELECT * FROM events ORDER BY event_id LIMIT 100",
    "projection": "SELECT event_id, event_type, user_id, value FROM events",
    "filter_date_range": """
        SELECT event_id, CAST(ts AS DATE) AS event_date, event_type, value
        FROM events WHERE ts >= (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
    """,
    "filter_date_eq": """
        SELECT event_id, user_id, event_type, value FROM events
        WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
    """,
    "risk_analysis": RISK_ANALYSIS_SQL,
    "hourly_pattern": HOURLY_PATTERN_SQL,
    "conditional_agg": CONDITIONAL_AGG_SQL,
    "count_distinct": COUNT_DISTINCT_SQL,
    "having_filter": HAVING_FILTER_SQL,
    "topk": TOPK_SQL,
    "pricing_summary": PRICING_SUMMARY_SQL,
    "revenue_by_region": REVENUE_BY_REGION_SQL,
    "shipping_priority": SHIPPING_PRIORITY_SQL,
    "forecast_revenue": FORECAST_REVENUE_SQL,
    "supplier_volume": SUPPLIER_VOLUME_SQL,
    "join_left": JOIN_LEFT_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "join_salted_skew": JOIN_SALTED_SQL,
    "join_bucketed_colocated": JOIN_BUCKETED_SQL,
    "window_rank": WINDOW_RANK_SQL,
    "window_running_sum": WINDOW_RUNNING_SUM_SQL,
    "window_lag_lead": WINDOW_LAG_LEAD_SQL,
    "rollup_agg": ROLLUP_AGG_SQL,
    "cube_agg": CUBE_AGG_SQL,
    "grouping_sets": GROUPING_SETS_SQL,
    "set_union": SET_UNION_SQL,
    "set_intersect": SET_INTERSECT_SQL,
    "set_except": SET_EXCEPT_SQL,
    "distinct_rows": DISTINCT_ROWS_SQL,
    "string_funcs": STRING_FUNCS_SQL,
    "date_funcs": DATE_FUNCS_SQL,
    "json_extract": JSON_EXTRACT_SQL,
    "case_bucketing": CASE_BUCKETING_SQL,
    "in_subquery": IN_SUBQUERY_SQL,
    "scalar_subquery": SCALAR_SUBQUERY_SQL,
    "correlated_exists": CORRELATED_EXISTS_SQL,
}


# --------------------------------------------------------------------------
# Breadth batch 2: pivot, regexp, null handling, array agg, SQL-text entry.
# --------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide conditional aggregation) with explicit value
    list -- at scale always pass the value list to avoid the extra
    distinct-values job."""
    events = load_table(spark, sf_dir, "events")
    pv = (
        events.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return pv.select(
        "user_bucket",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    )


PIVOT_AGG_SQL = """
SELECT user_id % 10 AS user_bucket,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
FROM events GROUP BY 1
"""


def regexp_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-expression scalar functions (extract/replace/match)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_consonants"),
        F.col("p_brand").rlike("Brand#[12]").alias("is_brand_1x_2x"),
    )


REGEXP_OPS_SQL = r"""
SELECT p_partkey,
       regexp_extract(p_type, '^(\w+)', 1) AS type_head,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_consonants,
       regexp_matches(p_brand, 'Brand#[12]') AS is_brand_1x_2x
FROM part
"""


def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalars over an outer join's null-extended side."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 450000
    )
    j = customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
    return j.select(
        "c_custkey",
        "o_orderkey",
        F.col("o_orderkey").isNull().alias("no_big_order"),
        F.coalesce(F.col("o_totalprice").cast(DEC), F.lit(0).cast(DEC))
        .cast(DEC)
        .alias("big_order_price"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment_or_null"),
    )


NULL_HANDLING_SQL = """
SELECT c_custkey, o_orderkey,
       o_orderkey IS NULL AS no_big_order,
       CAST(COALESCE(CAST(o_totalprice AS DECIMAL(18,2)), 0) AS DECIMAL(18,2)) AS big_order_price,
       NULLIF(c_mktsegment, 'BUILDING') AS segment_or_null
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
  ON c_custkey = o_custkey
"""


def array_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregation: per-user sorted distinct event-type sets
    (sorted so the list value is deterministic cross-engine). The list is
    emitted joined to a scalar string: array-typed output cells crash the
    harness's pandas canonicalizer (unhashable ndarray), and the joined
    form certifies the same collect/dedup/sort chain."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias(
            "event_types"
        ),
        F.size(F.collect_set("event_type")).alias("n_types"),
    )


ARRAY_AGG_SQL = """
SELECT user_id,
       array_to_string(list_sort(list_distinct(list(event_type))), ',') AS event_types,
       CAST(len(list_distinct(list(event_type))) AS INTEGER) AS n_types
FROM events GROUP BY user_id
"""


def sql_text_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 parity: the SQL-string entry point (reference submits query
    text to Athena, README.md:143-148); here spark.sql over registered
    views -- same Catalyst plan as the DataFrame variant."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_sql_events")
    return spark.sql(
        """
        SELECT event_type,
               COUNT(*) AS total_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
        FROM _sql_events
        WHERE value > 50
        GROUP BY event_type
        """
    )


SQL_TEXT_SQL = """
SELECT event_type, COUNT(*) AS total_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
FROM events WHERE value > 50 GROUP BY event_type
"""


QUERIES.update(
    {
        "pivot_agg": pivot_agg,
        "regexp_ops": regexp_ops,
        "null_handling": null_handling,
        "array_agg_battery": array_agg_battery,
        "sql_text_entry": sql_text_entry,
    }
)

ORACLES.update(
    {
        "pivot_agg": PIVOT_AGG_SQL,
        "regexp_ops": REGEXP_OPS_SQL,
        "null_handling": NULL_HANDLING_SQL,
        "array_agg_battery": ARRAY_AGG_SQL,
        "sql_text_entry": SQL_TEXT_SQL,
    }
)


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for COUNT(DISTINCT): HyperLogLog++ sketch. The raw
    sketch estimate is engine-specific, so the output keeps only
    engine-independent columns: the exact count and a ``within_bounds``
    flag asserting the sketch landed within a loose error envelope of
    the exact count computed in the same query -- which gives the
    sketch a real (constant-TRUE) oracle instead of a rows-only check."""
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.05).alias("approx_users"),
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users")
    return d.select(
        "event_type", "exact_users", (err <= 0.15).alias("within_bounds")
    )


APPROX_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS within_bounds
FROM events GROUP BY event_type
"""

QUERIES["approx_distinct"] = approx_distinct
ORACLES["approx_distinct"] = APPROX_DISTINCT_SQL


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: supplier and customer nation populations."""
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    s = supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_suppliers")
    )
    c = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_customers")
    )
    return s.join(c, "nationkey", "full").select(
        "nationkey",
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
    )


JOIN_FULL_OUTER_SQL = """
SELECT COALESCE(s.nationkey, c.nationkey) AS nationkey,
       COALESCE(n_suppliers, 0) AS n_suppliers,
       COALESCE(n_customers, 0) AS n_customers
FROM (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
FULL JOIN (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
  USING (nationkey)
"""


def nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type round-trip (the reference's second data shape --
    orders with items array<struct>, scripts/create_sample_orders.py:29-53,
    and the STRUCT columns of scripts/update_metadata.py:99-113): build
    array-of-struct per order from lineitem, then navigate back out
    (explode + field access). The oracle is the flat projection, so a
    hash match certifies construction AND navigation."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct("l_linenumber", "l_partkey", F.col("l_quantity").cast(DEC).alias("qty"))
        ).alias("items")
    )
    ex = nested.select("l_orderkey", F.explode("items").alias("item"))
    return ex.select(
        "l_orderkey",
        F.col("item.l_linenumber").alias("linenumber"),
        F.col("item.l_partkey").alias("partkey"),
        F.col("item.qty").alias("qty"),
    )


NESTED_ROUNDTRIP_SQL = """
SELECT l_orderkey, l_linenumber AS linenumber, l_partkey AS partkey,
       CAST(l_quantity AS DECIMAL(18,2)) AS qty
FROM lineitem
"""


QUERIES.update(
    {"join_full_outer": join_full_outer, "nested_roundtrip": nested_roundtrip}
)
ORACLES.update(
    {"join_full_outer": JOIN_FULL_OUTER_SQL, "nested_roundtrip": NESTED_ROUNDTRIP_SQL}
)
