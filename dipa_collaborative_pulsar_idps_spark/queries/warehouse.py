"""Warehouse-maintenance operators: CDC snapshot diff and SCD2 history
build — the two change-tracking shapes every lake/warehouse pipeline
runs, certified against window/join-only oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import Tables
from .registry import query


@query(
    "cdc_snapshot_diff",
    survey="F1,ext-analytic",
    oracle="""
WITH b_mod AS (
    -- snapshot B, derived deterministically from A (orders): every 97th
    -- key deleted, every 89th repriced, every 101st cloned as an insert
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 89 = 0
                THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 1000000000, o_totalprice
    FROM orders WHERE o_orderkey % 101 = 0
), diff AS (
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'D'
                WHEN a.o_orderkey IS NULL THEN 'I'
                WHEN a.o_totalprice <> b.o_totalprice THEN 'U'
           END AS change
    FROM orders a FULL OUTER JOIN b_mod b ON a.o_orderkey = b.o_orderkey
)
SELECT change, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
FROM diff WHERE change IS NOT NULL GROUP BY change
""",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots: full-outer join on
    the key classifies every row as Insert / Update / Delete (unchanged
    rows drop out). Snapshot B is derived deterministically from A so the
    planted change set is known; output is per-class counts plus a key
    checksum so the oracle certifies WHICH rows changed, not just how
    many.

    100 TB shape: one co-partitioned full-outer join on the snapshot key
    — the canonical diff; with both snapshots bucketed/sorted by key on
    disk (storage.py layouts) it degrades to a zipper merge. The U-class
    comparison touches only the columns under CDC, so column pruning
    keeps the scan narrow.
    """
    t = Tables(spark, sf_dir)
    a = t.orders.select("o_orderkey", "o_totalprice")
    b = a.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    ).unionByName(
        a.where(F.col("o_orderkey") % 101 == 0).select(
            (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
            "o_totalprice",
        )
    )
    joined = a.alias("a").join(
        b.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    change = (
        F.when(F.col("b.o_orderkey").isNull(), "D")
        .when(F.col("a.o_orderkey").isNull(), "I")
        .when(F.col("a.o_totalprice") != F.col("b.o_totalprice"), "U")
    )
    return (
        joined.select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
                "o_orderkey"
            ),
            change.alias("change"),
        )
        .where(F.col("change").isNotNull())
        .groupBy("change")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_checksum"),
        )
    )


@query(
    "scd2_user_event_history",
    survey="H1,ext-analytic",
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
), starts AS (
    SELECT user_id, event_type, ts AS valid_from, event_id
    FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type
), versioned AS (
    -- event_id tie-break: two runs CAN start at the same timestamp (two
    -- event types sharing a ts), and valid_from alone would leave the
    -- version/valid_to assignment engine-dependent
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_id) AS version
    FROM starts
)
SELECT user_id, event_type, valid_from, valid_to,
       CAST(version AS BIGINT) AS version,
       valid_to IS NULL AS is_current
FROM versioned
""",
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built from the event log: each
    run of consecutive identical event types per user becomes one
    versioned validity interval [valid_from, valid_to), the latest row
    open-ended (is_current). The lag-compress → lead-close → version
    pattern is the standard SCD2 derivation; tie-break by event_id makes
    same-timestamp ordering deterministic cross-engine.

    100 TB shape: all three windows share one (user_id) partitioning —
    one shuffle, three frame passes, no self-join; the 'starts'
    compression shrinks the frame before the lead/version windows run.
    """
    t = Tables(spark, sf_dir)
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = t.events.select(
        "user_id", "event_type", "ts", "event_id"
    ).withColumn("prev_type", F.lag("event_type").over(w_ord))
    starts = ordered.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    # event_id tie-break: same-ts run starts would otherwise get
    # engine-dependent version/valid_to assignment
    w_v = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return starts.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_v).alias("valid_to"),
        F.row_number().over(w_v).cast("long").alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())


#: (column, oracle repr template) — the DuckDB side of the per-column
#: portable representation: min/max run on the NATIVE type (lexicographic
#: string extremes would be wrong for numerics: '9999' > '60000'), and
#: only the aggregated RESULT is cast — longs and strings as-is, the
#: double through DECIMAL(18,2), the timestamp through DATE. {v} is the
#: aggregate. The Spark side infers the same casts from the schema
#: (operators/profile._repr_cast); oracle equality certifies the match.
_PROFILE_COLS = (
    ("o_orderkey", "CAST({v} AS VARCHAR)"),
    ("o_custkey", "CAST({v} AS VARCHAR)"),
    ("o_orderstatus", "{v}"),
    ("o_orderpriority", "{v}"),
    ("o_totalprice", "CAST(CAST({v} AS DECIMAL(18,2)) AS VARCHAR)"),
    ("o_orderdate", "CAST(CAST({v} AS DATE) AS VARCHAR)"),
)


@query(
    "table_profile_orders",
    survey="D4,ext-analytic",
    oracle="SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {dk.format(v=f"MIN({c})")} AS min_repr,
       {dk.format(v=f"MAX({c})")} AS max_repr
FROM orders"""
        for c, dk in _PROFILE_COLS
    )
    + "\n)",
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary (the Deequ/dbt-test shape): per column of
    `orders` — null count, exact distinct count, and NATIVE-type min/max
    whose aggregated result is then cast to an engine-portable
    representation (doubles through DECIMAL(18,2), timestamps through
    DATE; aggregate-then-cast, because min over a string cast would be
    lexicographic — '9999' > '60000' — and raw double/timestamp
    stringification is engine-dependent), exploded to one row per column
    (the oracle's UNION ALL is the semantic spec; Spark computes it
    without re-scanning per column).

    Physical-plan note: the distinct counts and the min/max/null counts
    are computed in SEPARATE 1-row aggregations cross-joined at the end.
    Folding them into one `agg` makes Catalyst's multi-distinct Expand
    rewrite carry the string-buffered MIN/MAX aggregates, and a
    string-typed aggregation buffer disqualifies HashAggregate — the
    whole 6×-expanded row set falls back to SortAggregate on 7 keys
    (measured 3.3 s vs 0.7 s at sf0.1). Split, the Expand branch is
    all-HashAggregate (count buffers only; string GROUPING keys are
    fine) and the min/max branch is a trivial keyless partial+final
    pass. At 100 TB the exact distinct counts are the dial to swap for
    approx_count_distinct (`approx_distinct_users` pattern) — exactness
    here keeps the oracle bit-checkable.

    Delegates to the generic `operators/profile.profile_table` (any
    DataFrame, repr casts inferred from the schema); the oracle's
    explicit per-column casts certify that inference."""
    from ..operators.profile import profile_table

    return profile_table(
        Tables(spark, sf_dir).orders, [c for c, _ in _PROFILE_COLS]
    )


@query(
    "incremental_priority_revenue",
    survey="ext-warehouse,D1",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_price,
       MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS min_price,
       MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS max_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(o_totalprice) AS avg_price
FROM orders
GROUP BY o_orderpriority
""",
)
def incremental_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view refresh certified against full recompute: the
    orders table is split at 1997-07-01 into a 'stored' base slice and a
    'newly arrived' delta slice; each side is reduced to its mergeable
    partial summary (`operators/incremental.py`) and the MERGE of the two
    must equal the oracle's single-pass aggregate over everything — the
    invariant that lets a 100 TB warehouse absorb a new partition by
    rescanning only the partials (summary-sized shuffle), never the base
    table. Prices go through DECIMAL(18,2) so partial sums merge
    bit-exactly (float addition is order-dependent; decimal isn't); the
    derived avg divides the exact decimal sum as a double."""
    from ..operators.incremental import (
        finalize_summary,
        merge_summaries,
        partial_summary,
    )

    orders = Tables(spark, sf_dir).orders.select(
        "o_orderpriority",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    split = F.lit("1997-07-01").cast("timestamp_ntz")
    # NULL order dates satisfy neither `< split` nor `>= split`; route them
    # into the base slice explicitly so no row vanishes from both partials
    # (the oracle aggregates the FULL table).
    base = partial_summary(
        orders.where(
            (F.col("o_orderdate") < split) | F.col("o_orderdate").isNull()
        ),
        ["o_orderpriority"],
        "price",
    )
    delta = partial_summary(
        orders.where(F.col("o_orderdate") >= split), ["o_orderpriority"], "price"
    )
    return finalize_summary(merge_summaries(base, delta)).select(
        "o_orderpriority",
        F.col("n_rows").alias("n_orders"),
        F.col("m_sum").alias("total_price"),
        F.col("m_min").alias("min_price"),
        F.col("m_max").alias("max_price"),
        F.col("m_avg").alias("avg_price"),
    )


@query(
    "key_skew_report",
    survey="ext-warehouse,D4",
    oracle="""
WITH f AS (SELECT user_id, COUNT(*) AS freq FROM events GROUP BY user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(freq) AS BIGINT) AS n_rows,
       CAST(MAX(freq) AS BIGINT) AS max_freq,
       ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY freq), 4) AS p50_freq,
       ROUND(PERCENTILE_CONT(0.99) WITHIN GROUP (ORDER BY freq), 4) AS p99_freq,
       ROUND(AVG(freq), 4) AS avg_freq,
       ROUND(MAX(freq) * COUNT(*) / CAST(SUM(freq) AS DOUBLE), 4) AS skew_ratio
FROM f
""",
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the frequency distribution of a prospective
    shuffle key (events.user_id) reduced to the numbers that decide a join
    strategy — max/p99/median frequency and skew_ratio (hottest key vs
    mean; >> 1 says salt it / let AQE split it). Costs exactly the shuffle
    the join itself would pay (groupBy key) plus a key-count-sized reduce,
    so it's the cheap scouting pass before committing a 100 TB join plan.
    Frequency percentiles run through distributed selection
    (`operators/selection.exact_quantiles`) — not the single-buffer
    `percentile` aggregate, which would reduce EVERY per-key frequency
    into one task (n_keys rows: exactly the blow-up this report exists
    to detect). The one-row summary is assembled from the driver-side
    aggregate values."""
    from ..operators.selection import exact_quantiles

    t = Tables(spark, sf_dir)
    # persisted for the builder's OWN two eager consumers (the base
    # aggregate and the quantile machinery) so the events scan + the
    # user_id shuffle run once, not twice (r13 opt, guide §5: the
    # docstring's "costs exactly the shuffle the join itself would pay"
    # was paying it twice); released before returning — the returned
    # frame is built from the collected scalars and holds no reference.
    freqs = (
        t.events.groupBy("user_id").agg(F.count(F.lit(1)).alias("freq")).persist()
    )
    try:
        base = freqs.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("freq").alias("n_rows"),
            F.max("freq").alias("max_freq"),
            F.avg("freq").alias("avg_freq"),
        ).first()
        p50, p99 = exact_quantiles(freqs, "freq", [0.5, 0.99], n_parts=32)
    finally:
        freqs.unpersist()
    from ..localdf import local_rows_df

    raw = local_rows_df(
        spark,
        [(base.n_keys, base.n_rows, base.max_freq, p50, p99, base.avg_freq)],
        "n_keys bigint, n_rows bigint, max_freq bigint, "
        "p50_raw double, p99_raw double, avg_raw double",
    )
    return raw.select(
        "n_keys",
        "n_rows",
        "max_freq",
        F.round("p50_raw", 4).alias("p50_freq"),
        F.round("p99_raw", 4).alias("p99_freq"),
        F.round("avg_raw", 4).alias("avg_freq"),
        F.round(
            F.col("max_freq") * F.col("n_keys") / F.col("n_rows").cast("double"), 4
        ).alias("skew_ratio"),
    )


@query(
    "profile_drift_orders",
    survey="ext-warehouse,D4",
    oracle="""
WITH b AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 89 = 0
                THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 1000000000, o_totalprice
    FROM orders WHERE o_orderkey % 101 = 0
),
pa AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd,
           ROUND(AVG(o_totalprice), 4) AS mean_price FROM orders
),
pb AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd,
           ROUND(AVG(o_totalprice), 4) AS mean_price FROM b
)
SELECT 'n_rows' AS metric, pa.n AS val_a, pb.n AS val_b, pb.n - pa.n AS drift
FROM pa, pb
UNION ALL
SELECT 'n_distinct_keys', pa.nd, pb.nd, pb.nd - pa.nd FROM pa, pb
UNION ALL
SELECT 'mean_price_x10000',
       CAST(ROUND(pa.mean_price * 10000) AS BIGINT),
       CAST(ROUND(pb.mean_price * 10000) AS BIGINT),
       CAST(ROUND(pb.mean_price * 10000) AS BIGINT)
           - CAST(ROUND(pa.mean_price * 10000) AS BIGINT)
FROM pa, pb
""",
)
def profile_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot profile drift — the data-quality monitor that
    catches schema-preserving corruption (dropped partitions, duplicate
    loads, value shifts) BEFORE downstream jobs consume a snapshot: the
    same derived snapshot B as `cdc_snapshot_diff`, profiled beside A,
    one row per drifted metric (fixed-point mean so the drift column
    stays integer-typed cross-engine). Each profile is one keyless
    aggregate pass over its snapshot; the comparison is a 1-row×1-row
    cross join — at 100 TB you keep yesterday's 1-row profile and pay
    ONE pass, not two (the stored-partials pattern of
    `operators/incremental.py`)."""
    t = Tables(spark, sf_dir)
    a = t.orders.select("o_orderkey", "o_totalprice")
    b = a.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    ).unionByName(
        a.where(F.col("o_orderkey") % 101 == 0).select(
            (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
            "o_totalprice",
        )
    )

    def prof(df, tag):
        return df.agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.countDistinct("o_orderkey").alias(f"nd_{tag}"),
            (F.round(F.round(F.avg("o_totalprice"), 4) * 10000)).cast("long").alias(
                f"mp_{tag}"
            ),
        )

    both = prof(a, "a").crossJoin(prof(b, "b"))
    rows = F.array(
        F.struct(
            F.lit("n_rows").alias("metric"),
            F.col("n_a").alias("val_a"),
            F.col("n_b").alias("val_b"),
            (F.col("n_b") - F.col("n_a")).alias("drift"),
        ),
        F.struct(
            F.lit("n_distinct_keys").alias("metric"),
            F.col("nd_a").alias("val_a"),
            F.col("nd_b").alias("val_b"),
            (F.col("nd_b") - F.col("nd_a")).alias("drift"),
        ),
        F.struct(
            F.lit("mean_price_x10000").alias("metric"),
            F.col("mp_a").alias("val_a"),
            F.col("mp_b").alias("val_b"),
            (F.col("mp_b") - F.col("mp_a")).alias("drift"),
        ),
    )
    return both.select(F.explode(rows).alias("r")).select(
        "r.metric", "r.val_a", "r.val_b", "r.drift"
    )


@query(
    "referential_integrity_report",
    survey="ext-warehouse,F1,E-large",
    oracle="""
SELECT 'orders.o_custkey->customer' AS fk,
       CAST((SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS n_orphans,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE l.l_orderkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST((SELECT COUNT(*) FROM customer c
             WHERE c.c_nationkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT),
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
""",
)
def referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan detection across the star schema — the third
    leg of the data-quality family (profile, drift, and now RI): one row
    per declared FK with its orphan count, so a bad load (parent
    partition missing, fact loaded before dim) is caught before joins
    silently drop rows. Each check is a left-anti join: dims broadcast
    (customer/nation side), the fact-fact check (lineitem→orders)
    shuffles on the key exactly like the production join it protects —
    AQE turns it into a broadcast when the parent's filtered side is
    small. NULL FKs are not orphans (SQL semantics: a null FK is
    'unknown', flagged by the profile's null counts instead)."""
    t = Tables(spark, sf_dir)

    def check(fact: DataFrame, fk: str, dim: DataFrame, pk: str, label: str):
        orphans = (
            fact.where(F.col(fk).isNotNull())
            .join(dim.select(F.col(pk).alias(fk)), fk, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        total = fact.agg(F.count(F.lit(1)).alias("n_rows"))
        return orphans.crossJoin(total).select(
            F.lit(label).alias("fk"), "n_orphans", "n_rows"
        )

    a = check(t.orders, "o_custkey", t.customer, "c_custkey", "orders.o_custkey->customer")
    b = check(t.lineitem, "l_orderkey", t.orders, "o_orderkey", "lineitem.l_orderkey->orders")
    c = check(t.customer, "c_nationkey", t.nation, "n_nationkey", "customer.c_nationkey->nation")
    return a.unionByName(b).unionByName(c)


@query(
    "constraint_checks_report",
    survey="ext-warehouse,D4,B14",
    oracle="""
SELECT 'pk_orders_o_orderkey' AS chk,
       CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS n_violations
FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey) WHERE cnt > 1
UNION ALL
SELECT 'pk_events_event_id',
       CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
FROM (SELECT COUNT(*) AS cnt FROM events GROUP BY event_id) WHERE cnt > 1
UNION ALL
SELECT 'accepted_orders_o_orderstatus',
       CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F', 'O', 'P')
                                OR o_orderstatus IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 'accepted_events_event_type',
       CAST(COUNT(*) FILTER (WHERE event_type NOT IN
                ('click', 'error', 'purchase', 'signup', 'view')
                OR event_type IS NULL) AS BIGINT)
FROM events
UNION ALL
SELECT 'not_null_documents_text',
       CAST(COUNT(*) - COUNT(text) AS BIGINT)
FROM documents
""",
)
def constraint_checks_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt-test quartet as one report (unique / accepted_values /
    not_null here; relationships in `referential_integrity_report`): a
    violation count per declared constraint, all-zero on healthy data —
    the assertion layer a warehouse runs after every load. Uniqueness
    counts EXTRA rows per duplicated key (sum of cnt-1, so one dupe pair
    = 1 violation); accepted-values and not-null are map-side conditional
    counts folded into each table's single pass. Scale: the PK checks
    shuffle on the key (the same shuffle a MERGE would need); value
    checks are free riders on the scan."""
    t = Tables(spark, sf_dir)

    def pk(df, key, label):
        dup = (
            df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") > 1)
            .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("n_violations"))
        )
        return dup.select(F.lit(label).alias("chk"), "n_violations")

    def accepted(df, col, allowed, label):
        bad = (~F.col(col).isin(list(allowed))) | F.col(col).isNull()
        return df.agg(
            F.sum(bad.cast("long")).alias("n_violations")
        ).select(F.lit(label).alias("chk"), "n_violations")

    nn_docs = t.documents.agg(
        (F.count(F.lit(1)) - F.count("text")).alias("n_violations")
    ).select(F.lit("not_null_documents_text").alias("chk"), "n_violations")

    return (
        pk(t.orders, "o_orderkey", "pk_orders_o_orderkey")
        .unionByName(pk(t.events, "event_id", "pk_events_event_id"))
        .unionByName(
            accepted(t.orders, "o_orderstatus", ("F", "O", "P"),
                     "accepted_orders_o_orderstatus")
        )
        .unionByName(
            accepted(t.events, "event_type",
                     ("click", "error", "purchase", "signup", "view"),
                     "accepted_events_event_type")
        )
        .unionByName(nn_docs)
    )
