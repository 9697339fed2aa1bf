"""Event-log product analytics, batch 2: ordered funnel conversion and
cohort retention — the two classic event-sequence OLAP shapes the events
table supports that the engine had not yet declared. (The reference's
workload is telemetry analytics; these are the same shapes its alert
lifecycle implies — signup→click→purchase is structurally the reference's
detect→escalate→mitigate sequence over per-key event streams.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import Tables
from .registry import query


@query(
    "event_funnel_conversion",
    survey="ext-analytic,D1",
    oracle="""
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
    WHERE e.event_type = 'click' GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT stage, n_users,
       ROUND(CAST(n_users AS DOUBLE) / NULLIF(prev_users, 0), 6) AS conversion
FROM (
    SELECT 1 AS stage, (SELECT COUNT(*) FROM s1) AS n_users,
           (SELECT COUNT(*) FROM s1) AS prev_users
    UNION ALL
    SELECT 2, (SELECT COUNT(*) FROM s2), (SELECT COUNT(*) FROM s1)
    UNION ALL
    SELECT 3, (SELECT COUNT(*) FROM s3), (SELECT COUNT(*) FROM s2)
)
""",
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel signup → click → purchase: a user counts at
    stage k only if stage k's event occurs AT OR AFTER their stage-(k-1)
    entry time (min-ts semantics per stage). Output: (stage, n_users,
    conversion) with conversion = n_k / n_{k-1}.

    100 TB shape: three aggregations all keyed on user_id — one
    repartition by user_id serves every stage (AQE reuses the exchange);
    each stage join is user_id-equi with the prior stage's (small per-user)
    entry times; final counts are 1-row aggregates unioned driver-free.
    """
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_type", "ts")
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count("*").alias("n1"))
    c2 = s2.agg(F.count("*").alias("n2"))
    c3 = s3.agg(F.count("*").alias("n3"))
    counts = c1.crossJoin(c2).crossJoin(c3)
    # one execution: explode the 3 stage rows out of the single 1-row
    # counts frame (a unionAll of three selects would re-run every
    # aggregation once per branch)
    stages = F.array(
        *[
            F.struct(
                F.lit(k).alias("stage"),
                F.col(n).cast("long").alias("n_users"),
                F.round(
                    F.col(n).cast("double") / F.nullif(F.col(p), F.lit(0)), 6
                ).alias("conversion"),
            )
            for k, n, p in ((1, "n1", "n1"), (2, "n2", "n1"), (3, "n3", "n2"))
        ]
    )
    return counts.select(F.explode(stages).alias("s")).select(
        "s.stage", "s.n_users", "s.conversion"
    )


@query(
    "cohort_retention",
    survey="ext-analytic,D11",
    oracle="""
WITH first_seen AS (
    SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_date FROM events
    GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id, first_seen.cohort_date,
           CAST(DATEDIFF('day', first_seen.cohort_date, CAST(e.ts AS DATE)) // 7
                AS BIGINT) AS week_offset
    FROM events e JOIN first_seen USING (user_id)
)
SELECT cohort_date, week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM activity GROUP BY cohort_date, week_offset
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-event date, counted once
    per (cohort, weeks-since-first) cell — the classic retention triangle.
    Week offsets are pure day-diff integer division (no date_trunc — week
    start conventions differ across engines; arithmetic does not).

    100 TB shape: first-seen is a user_id groupBy whose exchange the
    activity join reuses; the distinct collapses (user, cohort, offset)
    before the final (cohort, offset) count, keeping the wide shuffle on
    already-reduced rows.
    """
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_date")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.expr("datediff(cast(ts as date), cohort_date) DIV 7")
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_date", "week_offset").agg(
        F.count("*").alias("n_active_users")
    )
