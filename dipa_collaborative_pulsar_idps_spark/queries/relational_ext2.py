"""Relational API surface, extension 2: PIVOT, UNPIVOT (melt), and
fixed-width histogram binning — the reshaping trio every analytics user
reaches for, certified against manual-SQL oracles (the oracle never uses
engine-specific PIVOT syntax, so the check is genuinely cross-engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import Tables
from .registry import query

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_user_event_matrix",
    survey="D1,ext-analytic",
    oracle="""
SELECT user_id,
"""
    + ",\n".join(
        f"       CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS {t}"
        for t in _EVENT_TYPES
    )
    + """
FROM events GROUP BY user_id
""",
)
def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's `pivot` relational operator: per-user total value spread
    into one column per event type. Pivot values are EXPLICIT (the 5 known
    types) — never inferred, which would add a driver-blocking distinct
    scan and make the output schema data-dependent (the 100 TB trap).
    Sums are decimal-quantized (double addition order is engine-dependent)
    then surfaced as double; a user with no events of a type gets NULL in
    both engines (CASE sum over zero rows ≡ pivot's empty cell).
    """
    t = Tables(spark, sf_dir)
    return (
        t.events.select(
            "user_id", "event_type", F.col("value").cast("decimal(28,6)").alias("v")
        )
        .groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.sum("v").cast("double"))
    )


@query(
    "unpivot_nation_metrics",
    survey="ext-analytic",
    oracle="""
WITH wide AS (
    SELECT n.n_name,
           CAST(COUNT(*) AS DOUBLE) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
)
SELECT n_name, 'n_customers' AS metric, n_customers AS metric_value FROM wide
UNION ALL
SELECT n_name, 'total_acctbal', total_acctbal FROM wide
""",
)
def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's `unpivot` (melt): a wide per-nation stats row becomes one
    (nation, metric, value) row per measure — the long form feeds generic
    downstream consumers (charting, metric stores) without per-metric
    code. The oracle is a plain UNION ALL, so equality certifies the melt
    semantics themselves. Narrow post-aggregation op: the unpivot runs on
    25 rows however large the fact side is."""
    t = Tables(spark, sf_dir)
    wide = (
        t.customer.join(
            t.nation, t.customer.c_nationkey == t.nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("double").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )
    return wide.unpivot(
        ["n_name"], ["n_customers", "total_acctbal"], "metric", "metric_value"
    )


@query(
    "value_histogram",
    survey="D1,ext-analytic",
    oracle="""
SELECT event_type,
       CAST(FLOOR(value / 50) AS BIGINT) * 50 AS bin_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(value) AS DOUBLE) AS bin_min,
       CAST(MAX(value) AS DOUBLE) AS bin_max
FROM events GROUP BY event_type, CAST(FLOOR(value / 50) AS BIGINT) * 50
""",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (width 50) of event values per type — the
    binning aggregation behind every distribution dashboard. The bin id
    is floor of an IEEE-exact division by a power-of-two-free constant:
    identical doubles in, identical bins out, both engines. One
    map-side-combined shuffle on (type, bin)."""
    t = Tables(spark, sf_dir)
    bin_start = (F.floor(F.col("value") / 50) * 50).cast("long")
    return t.events.groupBy(
        "event_type", bin_start.alias("bin_start")
    ).agg(
        F.count("*").alias("n"),
        F.min("value").cast("double").alias("bin_min"),
        F.max("value").cast("double").alias("bin_max"),
    )


@query(
    "heavy_hitter_tokens",
    survey="D4-scale,ext-text",
    oracle="""
WITH tok AS (
    SELECT UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS token
    FROM documents
), counted AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token
)
SELECT token, n FROM counted ORDER BY n DESC, token LIMIT 10
""",
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent tokens via the bounded-memory SpaceSaving
    two-phase operator (`operators/heavyhitters.py`): per-partition
    candidates (≤128 counters/task, cardinality-independent), broadcast
    semi-join, exact count of candidates only. The oracle runs the plain
    full-cardinality groupBy — equality certifies the pigeonhole
    guarantee end-to-end (exact whenever the 10th frequency > N/128,
    which any real heavy-hitter workload satisfies by definition)."""
    from ..operators.heavyhitters import heavy_hitters_exact

    t = Tables(spark, sf_dir)
    toks = t.documents.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("token")
    )
    return heavy_hitters_exact(toks, "token", k=10, m=128)
