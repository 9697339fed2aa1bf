"""Distributed order statistics: exact interpolated quantiles without a
single-task value buffer.

Spark's exact ``percentile`` aggregate is a TypedImperativeAggregate —
every value lands in ONE final aggregation buffer, which at 100 TB is an
executor-OOM, not a slow path. This operator computes the SAME
PERCENTILE_CONT values (verified to 1e-9 against ``F.percentile`` in
tests) with only scalable pieces: a bounded boundary sketch, per-range
counts, broadcast prefix offsets, and a lookup of the ≤ 2·|qs| rows
sitting at the target sorted positions — the distributed-selection form
of the engine's prefix-sum family (`token_shard_assignment_scalable`,
`global_row_ids_scalable`).

Correctness does NOT depend on physical partitioning: the range id
(``pid``) is a pure *function of the value* — the count of explicit
boundary values below it — so the count branch and the selection branch
agree by construction no matter how Catalyst lays out the exchanges
(earlier drafts leaned on ``spark.sql.exchange.reuse`` to keep two
``repartitionByRange`` branches consistent; that was a silent-wrong-
answer hazard with reuse disabled). Boundaries come from a bounded
value-hash sample and only need to be *balanced*, not exact — exactness
comes from the counts and the final index lookup. Ties are safe:
row_number breaks them arbitrarily but the VALUE at any global sorted
index is unique by definition.

Interpolation uses ``lo + frac·(hi − lo)`` with ``frac`` exactly
representable (it is ((n−1)·q) − floor(·)), the same formula Spark's
``Percentile`` and DuckDB's PERCENTILE_CONT evaluate, so results agree
bit-for-bit with the oracle wherever the engines themselves agree.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _range_ids(df: DataFrame, col: str, n_parts: int, seed: int = 42):
    """Attach a ``pid`` column: how many explicit boundary values sit
    strictly below ``col``. Monotone non-decreasing in the value, so a
    sort by (pid, value) IS the global sort — independent of physical
    partitioning. Returns (tagged_df, n_ranges).

    Boundaries come from a value-hash TakeOrdered sample (~64 points per
    boundary, one cheap heap job — no count needed, layout-independent,
    and far cheaper than a full Greenwald–Khanna sketch pass); they only
    need to BALANCE the ranges, exactness comes from the downstream
    counts + index lookup. The pid expression is a balanced BINARY-SEARCH
    WHEN tree over the sorted boundaries: O(log n_parts) codegen'd
    comparisons per row and an O(n_parts)-node expression — NOT a
    higher-order array filter (HOFs are CodegenFallback: interpreted per
    element, the dominant cost in an earlier draft) and NOT a linear
    comparison chain (O(n_parts) per row, codegen-hostile past a few
    hundred boundaries)."""
    cap = 64 * n_parts
    s = sorted(
        r[0]
        for r in df.select(col)
        .orderBy(F.xxhash64(F.col(col), F.lit(seed)))
        .limit(cap)
        .collect()  # bounded-collect: ≤ cap sample values (TakeOrdered heap)
    )
    bounds = sorted({s[len(s) * i // n_parts] for i in range(1, n_parts)}) if s else []
    if not bounds:
        return df.withColumn("pid", F.lit(0)), 1

    def search(lo: int, hi: int):
        # pid candidates in [lo, hi]; pid(v) = #{j: bounds[j] < v}
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            F.col(col) > F.lit(float(bounds[mid])), search(mid + 1, hi)
        ).otherwise(search(lo, mid))

    return df.withColumn("pid", search(0, len(bounds))), len(bounds) + 1


def _interp(rs: list[float], at: dict[int, float]) -> list[float]:
    out = []
    for r in rs:
        lo, hi = math.floor(r), math.ceil(r)
        out.append(at[lo] + (r - lo) * (at[hi] - at[lo]))
    return out


def exact_quantiles(
    df: DataFrame, col: str, qs: list[float], n_parts: int = 64
) -> list[float]:
    """PERCENTILE_CONT(q) for each q in ``qs`` over ``df[col]``
    (non-null values), returned as driver-side floats (|qs| numbers —
    this is an aggregate result, not a dataset)."""
    from pyspark import StorageLevel

    vals = df.select(F.col(col).alias("p")).where(F.col("p").isNotNull())
    # The (value, pid) frame is persisted so (a) the count and selection
    # passes share ONE materialization of the pid expression — its
    # n_parts-term comparison chain is cheap evaluated once per row but
    # poisonous re-derived inside join keys / window partitions — and
    # (b) the source is scanned twice total (boundary sample + cache
    # fill), never per pass. One projected column + an int: a sliver of
    # the table; MEMORY_AND_DISK spills rather than fails at scale.
    d, _ = _range_ids(vals, "p", n_parts)
    d = d.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        counts = sorted(
            (r.pid, r.c)
            for r in d.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()
        )  # bounded-collect: ≤ n_parts rows
        n = sum(c for _, c in counts)
        if n == 0:
            return [float("nan")] * len(qs)
        offs, acc = {}, 0
        for pid, c in counts:
            offs[pid] = acc
            acc += c
        rs = [(n - 1) * q for q in qs]
        need = sorted({i for r in rs for i in (math.floor(r), math.ceil(r))})
        # only ranges that CONTAIN a needed sorted position pay the sort:
        # ≤ 2·|qs| of the n_parts ranges survive this filter, so the
        # selection pass sorts ~|need|/n_parts of the rows, not all.
        hit = [
            pid
            for pid, c in counts
            if any(offs[pid] <= i < offs[pid] + c for i in need)
        ]
        off_map = F.create_map(*[F.lit(x) for p_ in hit for x in (p_, offs[p_])])
        wl = Window.partitionBy("pid").orderBy("p")
        sel = (
            d.where(F.col("pid").isin(hit))
            .withColumn("off", off_map[F.col("pid")])
            .withColumn("gidx", F.col("off") + F.row_number().over(wl) - 1)
            .where(F.col("gidx").isin([int(x) for x in need]))
            .select("gidx", "p")
        )
        at = {int(r.gidx): float(r.p) for r in sel.collect()}  # bounded-collect: ≤ 2·|qs| rows
    finally:
        d.unpersist()
    return _interp(rs, at)


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    qs: list[float],
    n_parts: int = 64,
    max_count_rows: int = 65_536,
) -> dict[tuple, list[float]]:
    """Per-group PERCENTILE_CONT via the same distributed-selection
    machinery: global boundary ranges (pid stays monotone in the value
    within every group), per-(group, pid) counts, per-group prefix
    offsets, one index-lookup pass. Driver traffic is bounded by
    |groups|·n_parts count rows + 2·|qs|·|groups| value rows — the
    grouped-percentile *report* shape (low-cardinality reporting groups),
    NOT a per-key analytic; ``max_count_rows`` enforces that contract
    LOUDLY (a high-cardinality key would otherwise flood the driver —
    reach for percentile_approx per key instead).
    Returns {group_tuple: [quantiles]}."""
    from pyspark import StorageLevel

    vals = df.select(*group_cols, F.col(col).alias("p")).where(
        F.col("p").isNotNull()
    )
    d, _ = _range_ids(vals, "p", n_parts)
    d = d.persist(StorageLevel.MEMORY_AND_DISK)  # pid materialized once (see exact_quantiles)
    counts = (
        d.groupBy(*group_cols, "pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .limit(max_count_rows + 1)
        .collect()
    )  # bounded-collect: ≤ max_count_rows + 1, enforced below
    if len(counts) > max_count_rows:
        d.unpersist()
        raise ValueError(
            f"grouped_exact_quantiles saw > {max_count_rows} (group, range) "
            "count rows — this operator is for low-cardinality reporting "
            "groups; use percentile_approx for per-key quantiles"
        )
    per_group: dict[tuple, list] = {}
    for r in counts:
        g = tuple(r[c] for c in group_cols)
        per_group.setdefault(g, []).append((r.pid, r.c))
    spark = df.sparkSession
    need_rows, meta = [], {}
    for g, pcs in per_group.items():
        pcs.sort()
        n_g = sum(c for _, c in pcs)
        offs, acc = {}, 0
        for pid, c in pcs:
            offs[pid] = acc
            acc += c
        rs = [(n_g - 1) * q for q in qs]
        need = sorted({i for r in rs for i in (math.floor(r), math.ceil(r))})
        meta[g] = rs
        for pid, c in pcs:
            lo, hi = offs[pid], offs[pid] + c
            wanted = [i for i in need if lo <= i < hi]
            if wanted:
                need_rows.append((*g, int(pid), int(lo), wanted))
    schema_cols = d.select(*group_cols).schema
    need_df = spark.createDataFrame(
        need_rows,
        schema=(
            ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema_cols)
            + ", pid int, off bigint, want array<bigint>"
        ),
    )
    wl = Window.partitionBy(*group_cols, "pid").orderBy("p")
    sel = (
        d.join(F.broadcast(need_df), [*group_cols, "pid"])
        .withColumn("gidx", F.col("off") + F.row_number().over(wl) - 1)
        .where(F.array_contains("want", F.col("gidx")))
        .select(*group_cols, "gidx", "p")
    )
    at: dict[tuple, dict[int, float]] = {}
    for r in sel.collect():  # bounded-collect: ≤ 2·|qs|·|groups| rows
        g = tuple(r[c] for c in group_cols)
        at.setdefault(g, {})[int(r.gidx)] = float(r.p)
    d.unpersist()
    return {g: _interp(meta[g], at[g]) for g in per_group}
