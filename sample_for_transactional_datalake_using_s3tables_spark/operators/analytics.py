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


def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly time-bucket gap-fill with LOCF and linear interpolation
    (the TimescaleDB ``time_bucket_gapfill`` + ``locf`` +
    ``interpolate`` shape): aggregate events into per-type hourly
    buckets, generate the COMPLETE bucket spine per series, left-join,
    and fill each gap two ways -- last observation carried forward and
    a linear interpolation between the neighboring observations.

    LOCF/neighbors use the portable COUNTING-GROUPS formulation
    (``grp = COUNT(value) OVER (ORDER BY bucket)``: each non-null
    observation starts a group, so the group's MAX is that observation
    -- no IGNORE NULLS dependence, identical semantics on any engine).
    The average is ``CAST(SUM(decimal) AS DOUBLE) / COUNT(*)``: one
    exact decimal sum, one correctly-rounded cast, one IEEE division
    -- bit-identical across engines, so interpolation arithmetic
    hashes cleanly.

    Scale: the spine is metadata-sized (buckets x series, never rows);
    the two window passes run over the spine, not the raw events --
    at 100 TB the only row-scale work is the initial bucket aggregate
    (map-side combine)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        F.col("value").cast("decimal(12,2)").alias("val"),
    )
    agg = e.groupBy("event_type", "bucket").agg(
        (F.sum("val").cast("double") / F.count("*")).alias("avg_value"),
        F.count("*").alias("n_events"),
    )
    spine = agg.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    ).select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    j = spine.join(agg, ["event_type", "bucket"], "left")
    asc = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    desc = (
        Window.partitionBy("event_type")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = j.withColumn("grp", F.count("avg_value").over(asc)).withColumn(
        "grp2", F.count("avg_value").over(desc)
    )
    obs_bucket = F.when(F.col("avg_value").isNotNull(), F.col("bucket"))
    wg = Window.partitionBy("event_type", "grp")
    wg2 = Window.partitionBy("event_type", "grp2")
    j = (
        j.withColumn("prev_val", F.max("avg_value").over(wg))
        .withColumn("prev_ts", F.max(obs_bucket).over(wg))
        .withColumn("next_val", F.max("avg_value").over(wg2))
        .withColumn("next_ts", F.max(obs_bucket).over(wg2))
    )
    ratio = (
        F.unix_timestamp("bucket") - F.unix_timestamp("prev_ts")
    ) / (F.unix_timestamp("next_ts") - F.unix_timestamp("prev_ts"))
    interp = F.when(
        F.col("avg_value").isNotNull(), F.col("avg_value")
    ).when(
        F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(),
        F.col("prev_val")
        + (F.col("next_val") - F.col("prev_val")) * ratio,
    )
    return j.select(
        "event_type",
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        "avg_value",
        F.col("prev_val").alias("locf_value"),
        interp.alias("interp_value"),
    )


GAPFILL_SQL = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_value,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT event_type,
         unnest(generate_series(MIN(bucket), MAX(bucket),
                                INTERVAL 1 HOUR)) AS bucket
  FROM agg GROUP BY event_type
),
j AS (
  SELECT s.event_type, s.bucket, a.avg_value, a.n_events
  FROM spine s LEFT JOIN agg a USING (event_type, bucket)
),
g AS (
  SELECT *,
         COUNT(avg_value) OVER
           (PARTITION BY event_type ORDER BY bucket) AS grp,
         COUNT(avg_value) OVER
           (PARTITION BY event_type ORDER BY bucket DESC) AS grp2
  FROM j
),
f AS (
  SELECT *,
         MAX(avg_value) OVER (PARTITION BY event_type, grp) AS prev_val,
         MAX(CASE WHEN avg_value IS NOT NULL THEN bucket END)
           OVER (PARTITION BY event_type, grp) AS prev_ts,
         MAX(avg_value) OVER (PARTITION BY event_type, grp2) AS next_val,
         MAX(CASE WHEN avg_value IS NOT NULL THEN bucket END)
           OVER (PARTITION BY event_type, grp2) AS next_ts
  FROM g
)
SELECT event_type, bucket,
       COALESCE(n_events, 0) AS n_events,
       avg_value,
       prev_val AS locf_value,
       CASE WHEN avg_value IS NOT NULL THEN avg_value
            WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
              prev_val + (next_val - prev_val) *
                ((epoch(bucket) - epoch(prev_ts))
                 / (epoch(next_ts) - epoch(prev_ts)))
       END AS interp_value
FROM f
"""


QUERIES = {
    "funnel_stages": funnel_stages,
    "retention_cohorts": retention_cohorts,
    "timeseries_gapfill": timeseries_gapfill,
}

ORACLES = {
    "funnel_stages": _funnel_sql(),
    "retention_cohorts": RETENTION_SQL,
    "timeseries_gapfill": GAPFILL_SQL,
}
