"""Behavioral-analytics operators: ordered funnels and cohort retention.

The reference's analytics surface stops at flat aggregates over the
transactions table (its Athena console queries, reference
README.md:169-205); funnels and retention matrices are the next queries
any event-log owner runs, so the engine ships them as first-class
checked operators over ``events``.

Scale: every stage is a keyed aggregate or a user-keyed equi-join --
shuffles on user_id only, partial aggregation map-side, no windows over
unbounded partitions. Timestamps flow through untouched (no arithmetic
beyond date_trunc/datediff, identical in the DuckDB oracle).
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.testdata import load_table

# Ordered funnel definition: each stage must happen strictly after the
# user's previous-stage entry time.
_FUNNEL = ("signup", "view", "click", "purchase")


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel: per user, stage k counts only if some
    stage-k event happened after that user's first qualifying stage-k-1
    event. Output is one row per stage with the surviving user count."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    stages: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, etype in enumerate(_FUNNEL):
        step = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            step = step.join(prev, "user_id").where(F.col("ts") > F.col("t_prev"))
        cur = step.groupBy("user_id").agg(F.min("ts").alias("t_prev"))
        stages.append(
            cur.agg(F.count("*").alias("n_users")).select(
                F.lit(f"{i + 1}_{etype}").alias("stage"), "n_users"
            )
        )
        prev = cur
    return reduce(lambda a, b: a.unionByName(b), stages)


def _funnel_sql() -> str:
    ctes, prev = [], None
    for i, etype in enumerate(_FUNNEL):
        name = f"s{i + 1}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT user_id, MIN(ts) AS t_prev FROM events "
                f"WHERE event_type = '{etype}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"{name} AS (SELECT e.user_id, MIN(e.ts) AS t_prev FROM events e "
                f"JOIN {prev} USING (user_id) "
                f"WHERE e.event_type = '{etype}' AND e.ts > t_prev "
                f"GROUP BY e.user_id)"
            )
        prev = name
    unions = "\nUNION ALL\n".join(
        f"SELECT '{i + 1}_{etype}' AS stage, COUNT(*) AS n_users FROM s{i + 1}"
        for i, etype in enumerate(_FUNNEL)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by the week of
    their first event; each (cohort_week, week_number) cell counts the
    cohort's users active that week. Two shuffles (first-seen aggregate,
    matrix aggregate) on user_id / the matrix key."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    # DuckDB's date_trunc('week') yields DATE; match it (week starts are
    # midnight-aligned, so the cast drops nothing).
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        activity.join(first, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            "cohort_week",
            F.expr(
                "CAST(datediff(CAST(week AS DATE), cohort_week) div 7 AS INTEGER)"
            ).alias("week_number"),
            "n_users",
        )
    )


RETENTION_SQL = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT cohort_week,
       CAST(datediff('day', CAST(cohort_week AS DATE), CAST(week AS DATE)) // 7
            AS INTEGER) AS week_number,
       COUNT(DISTINCT a.user_id) AS n_users
FROM activity a JOIN first USING (user_id)
GROUP BY cohort_week, week
"""


QUERIES = {
    "funnel_stages": funnel_stages,
    "retention_cohorts": retention_cohorts,
}

ORACLES = {
    "funnel_stages": _funnel_sql(),
    "retention_cohorts": RETENTION_SQL,
}
