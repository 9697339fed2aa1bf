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


# ---------------------------------------------------------------------------
# Time-series similarity search: sliding-window correlation top-k over the
# per-type hourly event-count series (the distributed subsequence-matching
# shape of EDBT'19 "Time Series Similarity Search for Streaming Data").
# ---------------------------------------------------------------------------

_TS_W = 24  # window length (hours)
_TS_K = 10


@query(
    "ts_window_correlation_topk",
    survey="ext-analytic,D8",
    oracle=f"""
WITH sec AS (
    SELECT event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS h
    FROM events
), cnts AS (
    SELECT event_type, h, COUNT(*) AS c FROM sec GROUP BY event_type, h
), bounds AS (
    SELECT MIN(h) AS h0, MAX(h) AS h1 FROM sec
), grid AS (
    SELECT t.event_type, g.h
    FROM (SELECT DISTINCT event_type FROM sec) t
    CROSS JOIN (SELECT UNNEST(RANGE(h0, h1 + 1)) AS h FROM bounds) g
), series AS (
    SELECT grid.event_type,
           LIST(COALESCE(cnts.c, 0) ORDER BY grid.h) AS arr
    FROM grid LEFT JOIN cnts
      ON grid.event_type = cnts.event_type AND grid.h = cnts.h
    GROUP BY grid.event_type
), q AS (
    SELECT arr[1:{_TS_W}] AS qa FROM series WHERE event_type = 'error'
), wins0 AS (
    SELECT s.event_type, q.qa,
           UNNEST(RANGE(1, LEN(s.arr) - {_TS_W} + 2)) AS win_start,
           s.arr
    FROM series s CROSS JOIN q
), wins AS MATERIALIZED (
    -- MATERIALIZED: DuckDB 1.0's optimizer hits an internal binder error
    -- ("Failed to bind column reference win_start") when it fuses the
    -- UNNEST-derived slice bound through the lambda projections below;
    -- the materialization boundary sidesteps the bug without changing
    -- semantics.
    SELECT event_type, win_start, qa,
           arr[win_start : win_start + {_TS_W} - 1] AS ya
    FROM wins0
), scored AS (
    SELECT event_type, win_start,
           CAST(LIST_SUM(qa) AS BIGINT) AS sx,
           CAST(LIST_SUM(ya) AS BIGINT) AS sy,
           CAST(LIST_SUM(LIST_TRANSFORM(qa, v -> v * v)) AS BIGINT) AS sxx,
           CAST(LIST_SUM(LIST_TRANSFORM(ya, v -> v * v)) AS BIGINT) AS syy,
           CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, {_TS_W} + 1),
                i -> qa[i] * ya[i])) AS BIGINT) AS sxy
    FROM wins
), terms AS (
    SELECT event_type, win_start,
           {_TS_W} * sxy - sx * sy AS num,
           {_TS_W} * sxx - sx * sx AS vx,
           {_TS_W} * syy - sy * sy AS vy
    FROM scored
)
SELECT event_type, CAST(win_start AS BIGINT) AS win_start,
       ROUND(num / SQRT(CAST(vx AS DOUBLE) * vy), 6) AS corr
FROM terms WHERE vx > 0 AND vy > 0
ORDER BY corr DESC, event_type, win_start
LIMIT {_TS_K}
""",
)
def ts_window_correlation_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsequence similarity search over event telemetry: slide a
    {_TS_W}-hour window over every event type's dense hourly-count series
    and rank Pearson correlation against the query pattern (the 'error'
    series' first day). Top-{_TS_K} with (corr, type, start) ordering —
    the self-match (corr = 1) certifies the pipeline end-to-end.

    Numeric determinism: every sum is INTEGER (counts), so numerator and
    variance terms are exact in both engines; the single double division
    + sqrt are IEEE-exactly-rounded — corr is bit-identical, and round-6
    ordering with explicit tie-breaks keeps the LIMIT stable.

    100 TB shape: the heavy reduction (events → per-type hourly counts)
    is one map-side-combined groupBy; series arrays are bounded by the
    TIME RANGE (720 entries/month at hourly grain), not corpus size, so
    collect_list stays small however many raw events fold into each
    bucket; window scoring is per-key HOF work; the final top-k is a
    TakeOrderedAndProject over |keys|×|hours| candidate rows.
    """
    t = Tables(spark, sf_dir)
    sec = t.events.select(
        "event_type",
        F.expr("unix_seconds(cast(ts as timestamp)) DIV 3600").alias("h"),
    )
    cnts = sec.groupBy("event_type", "h").agg(F.count("*").alias("c"))
    bounds = sec.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        sec.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.expr("sequence(h0, h1)")).alias("h"))
    )
    series = (
        grid.join(cnts, ["event_type", "h"], "left")
        .select("event_type", "h", F.coalesce("c", F.lit(0)).alias("c"))
        .groupBy("event_type")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(h, c))), s -> s.c)").alias(
                "arr"
            )
        )
    )
    q = series.where(F.col("event_type") == "error").select(
        F.expr(f"slice(arr, 1, {_TS_W})").alias("qa")
    )
    # CASE guard: Spark's sequence(1, 0) is DESCENDING, not empty — a
    # sub-{_TS_W}-hour event span would explode garbage starts and crash
    # slice() instead of yielding zero windows like the oracle's RANGE.
    starts = F.expr(
        f"CASE WHEN size(arr) >= {_TS_W} "
        f"THEN sequence(1, size(arr) - {_TS_W} + 1) ELSE array() END"
    )
    wins = (
        series.crossJoin(F.broadcast(q))
        .select(
            "event_type",
            "qa",
            "arr",
            F.explode(starts).alias("win_start"),
        )
        .select(
            "event_type",
            "win_start",
            "qa",
            F.expr(f"slice(arr, win_start, {_TS_W})").alias("ya"),
        )
    )
    isum = lambda e: F.expr(f"aggregate({e}, 0L, (a, x) -> a + x)")  # noqa: E731
    scored = wins.select(
        "event_type",
        F.col("win_start").cast("long").alias("win_start"),
        isum("qa").alias("sx"),
        isum("ya").alias("sy"),
        isum("transform(qa, v -> v * v)").alias("sxx"),
        isum("transform(ya, v -> v * v)").alias("syy"),
        isum("zip_with(qa, ya, (a, b) -> a * b)").alias("sxy"),
    )
    w = _TS_W
    vx = w * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = w * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.round(
        (w * F.col("sxy") - F.col("sx") * F.col("sy"))
        / F.sqrt((vx * vy).cast("double")),
        6,
    )
    return (
        scored.where((vx > 0) & (vy > 0))
        .select("event_type", "win_start", corr.alias("corr"))
        .orderBy(F.desc("corr"), "event_type", "win_start")
        .limit(_TS_K)
    )


_DYN_GAPS = {"click": 600, "view": 1800}  # seconds; every other type 900
_DYN_DEFAULT = 900

_DYN_GAP_SQL = (
    "CASE WHEN event_type = 'click' THEN 600 "
    "WHEN event_type = 'view' THEN 1800 ELSE 900 END"
)


@query(
    "session_windows_dynamic_gap",
    survey="I16,ext-analytic",
    oracle=f"""
WITH ev AS (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           epoch_us(CAST(ts AS TIMESTAMP)) + ({_DYN_GAP_SQL}) * 1000000 AS end_us
    FROM events
), seq AS (
    SELECT user_id, event_id, ts, us, end_us,
           CASE WHEN us > MAX(end_us) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(end_us) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM ev
), sess AS (
    SELECT user_id, event_id, ts, end_us,
           CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
    FROM seq
)
SELECT user_id, MIN(ts) AS session_start,
       MAKE_TIMESTAMP(MAX(end_us)) AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_id
""",
)
def session_windows_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization where each event extends the session by its OWN
    type-dependent gap (clicks 10 min, views 30 min, everything else
    15 min) — Spark's native `session_window` with a dynamic
    CalendarInterval gap expression, the shape real engagement analytics
    uses (a long-form content view should hold a session open longer
    than a click).

    The oracle rebuilds the semantics from first principles as
    gaps-and-islands: an event opens a new session iff its start exceeds
    the running MAX of prior (ts + gap) ends — Spark merges on
    start ≤ session-end (inclusive; probed empirically: an event landing
    exactly on the end still merges), session end = MAX(ts + gap), all
    in exact µs integer arithmetic. Value equality certifies the native
    operator's merge rule against the portable definition.

    100 TB shape: one shuffle on user_id either way; the native form's
    state is merged per group by the session-window iterator, the
    oracle-shaped island form is two windows over the same sort — both
    scale; the native one is also the streaming-ready spelling.
    """
    t = Tables(spark, sf_dir)
    gap = F.expr(
        "CASE WHEN event_type = 'click' THEN make_interval(0,0,0,0,0,0,600) "
        "WHEN event_type = 'view' THEN make_interval(0,0,0,0,0,0,1800) "
        "ELSE make_interval(0,0,0,0,0,0,900) END"
    )
    return (
        t.events.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
