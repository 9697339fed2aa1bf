"""Scale-strategy tests: salted aggregation equivalence, bucketed co-located
joins (no shuffle), approximate distinct-count sanity, and a stateful-operator
volume stress — the 100 TB tactics exercised at test scale."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dipa_collaborative_pulsar_idps_spark.operators.skew import (
    explode_salt_dim,
    salted_count,
    salted_sum,
)
from dipa_collaborative_pulsar_idps_spark.plans.explain import plan_text
from dipa_collaborative_pulsar_idps_spark.tables import load_table


def test_salted_sum_equals_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        r.l_returnflag: r.s
        for r in li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).collect()
    }
    salted = {
        r.l_returnflag: r.sum_l_quantity
        for r in salted_sum(li, ["l_returnflag"], "l_quantity").collect()
    }
    assert direct.keys() == salted.keys()
    for k in direct:
        assert abs(direct[k] - salted[k]) < 1e-6


def test_salted_count_and_join_dim(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {r.l_suppkey: r["count"] for r in li.groupBy("l_suppkey").count().collect()}
    salted = {r.l_suppkey: r.n for r in salted_count(li, ["l_suppkey"]).collect()}
    assert direct == salted
    dim = spark.createDataFrame([(1, "a")], ["k", "v"])
    assert explode_salt_dim(dim, 4).count() == 4  # replicated per salt


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Bucketing both sides on the join key co-locates partitions: the join
    plan must contain no Exchange — the 100 TB repeated-join strategy."""
    wh = tempfile.mkdtemp(prefix="dipa_wh_")
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .option("path", f"{wh}/b_orders").mode("overwrite").saveAsTable("b_orders"))
        (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .option("path", f"{wh}/b_lineitem").mode("overwrite").saveAsTable("b_lineitem"))
        j = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("q"))
        )
        txt = plan_text(j)
        join_section = txt.split("HashAggregate")[0]
        assert "Exchange" not in join_section, f"bucketed join still shuffles:\n{txt}"
        assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        shutil.rmtree(wh, ignore_errors=True)


def test_approx_count_distinct_tracks_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).collect()[0].n
    approx = ev.select(F.approx_count_distinct("user_id", 0.02).alias("n")).collect()[0].n
    assert abs(approx - exact) / exact < 0.1


def test_rocksdb_state_store_runs(spark):
    """The sharded delta operator runs on the RocksDB state store (the
    100 TB state path) and produces the same results as the default store."""
    import datetime as dt

    from dipa_collaborative_pulsar_idps_spark.session import enable_rocksdb_state
    from dipa_collaborative_pulsar_idps_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )
    from dipa_collaborative_pulsar_idps_spark.streaming.state import counter_delta_stream

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    d = tempfile.mkdtemp(prefix="dipa_rdb_")
    try:
        enable_rocksdb_state(spark)
        rows = [
            (dt.datetime(2024, 1, 1, 0, 0, 2 * i), f"f{j}", 100 * (i + 1))
            for i in range(5)
            for j in range(10)
        ]
        spark.createDataFrame(rows, ["poll_ts", "src", "packet_count"]).coalesce(
            1
        ).write.mode("append").parquet(d)
        out = counter_delta_stream(
            replay_stream(spark, d, "poll_ts timestamp, src string, packet_count long"),
            ["src"],
            "packet_count",
            "poll_ts",
        )
        run_to_memory(out, "rdb_out")
        got = spark.sql(
            "SELECT count(*) AS n, min(delta) AS mn, max(delta) AS mx FROM rdb_out"
        ).collect()[0]
        assert (got.n, got.mn, got.mx) == (50, 100, 100)
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_stateful_delta_volume(spark):
    """Volume sanity: 200k rows / 10k keys through the streaming counter
    delta — state store handles it and every delta is non-negative."""
    import datetime as dt

    from dipa_collaborative_pulsar_idps_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )
    from dipa_collaborative_pulsar_idps_spark.streaming.state import counter_delta_stream

    d = tempfile.mkdtemp(prefix="dipa_vol_")
    try:
        base = spark.range(200_000).select(
            (F.col("id") % 10_000).cast("string").alias("src"),
            F.timestamp_micros(
                (F.lit(1704067200000000) + (F.col("id") / 10_000).cast("long") * 2_000_000)
            ).alias("poll_ts"),
            ((F.col("id") / 10_000).cast("long") * 50).alias("packet_count"),
        )
        base.coalesce(2).write.mode("append").parquet(d)
        stream = replay_stream(
            spark, d, "src string, poll_ts timestamp, packet_count long"
        )
        out = counter_delta_stream(stream, ["src"], "packet_count", "poll_ts")
        run_to_memory(out, "vol_out")
        stats = spark.sql(
            "SELECT count(*) AS n, min(delta) AS mn FROM vol_out"
        ).collect()[0]
        assert stats.n == 200_000
        assert stats.mn >= 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_partitioned_telemetry_layout_prunes(spark, tmp_path):
    """(event_date, dpid) hive layout: a one-day/one-switch query must plan
    PartitionFilters and scan only that directory's files."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dipa_collaborative_pulsar_idps_spark.plans.explain import plan_text
    from dipa_collaborative_pulsar_idps_spark.storage import (
        read_telemetry,
        write_telemetry,
    )

    rows = [
        (d, s, dt.datetime(2024, 1, 1 + d, 8, 0, i), 100 * i)
        for d in range(3)
        for s in (1, 2)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "day int, dpid int, poll_ts timestamp_ntz, packet_count long"
    ).drop("day")
    path = str(tmp_path / "telemetry")
    write_telemetry(df, path)

    pruned = read_telemetry(spark, path, date="2024-01-02", dpid=1)
    assert pruned.count() == 10
    txt = plan_text(pruned)
    pf = [ln for ln in txt.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_date" in " ".join(pf) and "dpid" in " ".join(pf), txt
    # directory really pruned: only one (date,dpid) leaf feeds the scan
    files = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    assert all("event_date=2024-01-02" in f and "dpid=1" in f for f in files), files


def test_streaming_ingestion_lands_partitioned(spark, tmp_path):
    """Replayed flow-stats stream → foreachBatch → hive-partitioned lake;
    reading one switch back prunes to its directories only."""
    from pyspark.sql import functions as F

    from dipa_collaborative_pulsar_idps_spark.schemas import FLOW_STATS
    from dipa_collaborative_pulsar_idps_spark.storage import (
        read_telemetry,
        telemetry_lake_sink,
    )
    from dipa_collaborative_pulsar_idps_spark.streaming.fixtures import flow_stats_attack
    from dipa_collaborative_pulsar_idps_spark.streaming.replay import (
        replay_stream,
        write_replay_chunks,
    )

    fixture = flow_stats_attack(spark)
    rdir = str(tmp_path / "replay")
    write_replay_chunks(fixture, rdir, n_chunks=3, order_col="poll_ts")
    lake = str(tmp_path / "lake")
    q = telemetry_lake_sink(
        replay_stream(spark, rdir, FLOW_STATS), lake, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    dpid = fixture.select("dpid").first().dpid
    back = read_telemetry(spark, lake, dpid=dpid)
    want = fixture.where(F.col("dpid") == dpid).count()
    assert back.count() == want > 0
    files = {r[0] for r in back.select(F.input_file_name()).distinct().collect()}
    assert all(f"dpid={dpid}" in f for f in files)


def test_compact_partition_reduces_files_keeps_rows(spark, tmp_path):
    """Many per-batch appends → one file after compaction; other leaves
    untouched; row content identical."""
    import datetime as dt
    import time

    from pyspark.sql import functions as F

    from dipa_collaborative_pulsar_idps_spark.storage import (
        compact_partition,
        read_telemetry,
        write_telemetry,
    )

    lake = str(tmp_path / "lake")
    for i in range(5):  # 5 appends → ≥5 files per leaf
        rows = [(s, dt.datetime(2024, 1, 1, 8, i, j), 10 * i + j)
                for s in (1, 2) for j in range(4)]
        write_telemetry(
            spark.createDataFrame(
                rows, "dpid int, poll_ts timestamp_ntz, packet_count long"
            ),
            lake,
        )
        time.sleep(0.02)

    def files_of(dpid):
        return {
            r[0]
            for r in read_telemetry(spark, lake, dpid=dpid)
            .select(F.input_file_name())
            .distinct()
            .collect()
        }

    before = read_telemetry(spark, lake, date="2024-01-01", dpid=1)
    before_rows = {(r.poll_ts, r.packet_count) for r in before.collect()}
    other_files = files_of(2)
    assert len(files_of(1)) >= 5

    n = compact_partition(spark, lake, "2024-01-01", 1)
    assert n == len(before_rows) == 20
    assert len(files_of(1)) == 1
    after_rows = {
        (r.poll_ts, r.packet_count)
        for r in read_telemetry(spark, lake, date="2024-01-01", dpid=1).collect()
    }
    assert after_rows == before_rows
    assert files_of(2) == other_files  # untouched leaf


def test_curated_corpus_layout_prunes(spark, tmp_path):
    """Corpus layout (lang dirs + in-file doc_id sort): a one-lang read
    plans PartitionFilters and touches only that directory; a doc_id range
    read pushes min/max filters to the scan for row-group pruning."""
    from pyspark.sql import functions as F

    from dipa_collaborative_pulsar_idps_spark.plans.explain import plan_text
    from dipa_collaborative_pulsar_idps_spark.storage import (
        read_corpus,
        write_corpus,
    )

    rows = [(lang_i * 1000 + i, lang, f"text {i}") for lang_i, lang in
            enumerate(("en", "de", "zh")) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    path = str(tmp_path / "corpus")
    # n_tasks=1: this test pins the single-run layout/pruning contract;
    # task spreading has its own test below
    write_corpus(df, path, target_file_rows=10, n_tasks=1)

    one_lang = read_corpus(spark, path, lang="de")
    assert one_lang.count() == 50
    txt = plan_text(one_lang)
    pf = [ln for ln in txt.splitlines() if "PartitionFilters" in ln]
    assert pf and "lang" in " ".join(pf), txt
    files = {r[0] for r in one_lang.select(F.input_file_name()).distinct().collect()}
    assert files and all("lang=de" in f for f in files), files
    # file-count hygiene: one sorted run per lang, split only by
    # maxRecordsPerFile — not one file per input task
    assert len(files) == 5, files

    ranged = read_corpus(spark, path, doc_id_range=(1000, 1010))
    assert ranged.count() == 10
    pushed = [ln for ln in plan_text(ranged).splitlines() if "PushedFilters" in ln]
    assert pushed and "doc_id" in " ".join(pushed), "doc_id range not pushed to scan"


def test_salted_join_equals_direct_join(spark, sf_dir):
    """The salted skewed join must return exactly the unsalted join's
    aggregate — and its plan must join on (key, salt), not key alone."""
    from dipa_collaborative_pulsar_idps_spark.queries import REGISTRY
    from dipa_collaborative_pulsar_idps_spark.queries.registry import _load_all
    from dipa_collaborative_pulsar_idps_spark.tables import Tables

    _load_all()
    salted = REGISTRY["salted_skew_join_totals"].fn(spark, sf_dir)
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "event_type", F.col("value").cast("decimal(28,6)").alias("value")
    )
    dim = ev.select("event_type").distinct().withColumn(
        "weight", F.length("event_type")
    )
    direct = (
        ev.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.col("value") * F.col("weight")).cast("double").alias("wv"),
            F.count("*").alias("n"),
        )
    )
    got = {r.event_type: (r.weighted_value, r.n_events) for r in salted.collect()}
    want = {r.event_type: (r.wv, r.n) for r in direct.collect()}
    assert got == want and got
    txt = plan_text(salted)
    assert "__salt" in txt, "join should be keyed on (event_type, __salt)"


def test_exact_k_sample_is_partition_invariant(spark, sf_dir):
    """The hash-ranked per-group sample must be identical however the
    input arrives — the property rand()-seeded sampling lacks."""
    from dipa_collaborative_pulsar_idps_spark.queries import REGISTRY
    from dipa_collaborative_pulsar_idps_spark.queries.registry import _load_all
    from dipa_collaborative_pulsar_idps_spark.tables import Tables
    from pyspark.sql.window import Window

    _load_all()
    base = {
        (r.lang, r.doc_id, r.sample_rank)
        for r in REGISTRY["exact_k_per_group_sample"].fn(spark, sf_dir).collect()
    }
    docs = Tables(spark, sf_dir).documents.select("lang", "doc_id").repartition(13)
    hash_key = F.col("doc_id").bitwiseAND(F.lit(2147483647)) * F.lit(2654435761)
    w = Window.partitionBy("lang").orderBy(hash_key, F.col("doc_id"))
    re_run = {
        (r.lang, r.doc_id, r.sample_rank)
        for r in docs.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= 20)
        .collect()
    }
    assert base == re_run and len({(l, r) for l, _, r in base}) == len(base)


def test_upsert_rewrites_only_touched_leaves(spark, tmp_path):
    """Keyed lake upsert: replaced keys get the new values, new keys
    append, untouched (date, dpid) leaves keep their ORIGINAL files on
    disk (mtime-stable — proof the rewrite was partition-scoped)."""
    import datetime as dt
    import os

    from dipa_collaborative_pulsar_idps_spark.storage import (
        upsert_telemetry,
        write_telemetry,
    )

    path = str(tmp_path / "lake")
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (t0, 1, "f1", 100),
        (t0, 1, "f2", 200),
        (t0, 2, "f1", 300),                        # other switch → other leaf
        (t0 + dt.timedelta(days=1), 1, "f1", 400),  # other day → other leaf
    ]
    df = spark.createDataFrame(rows, "poll_ts timestamp, dpid int, flow_key string, packet_count long")
    write_telemetry(df, path)

    def leaf_files(d, s):
        leaf = os.path.join(path, f"event_date={d}", f"dpid={s}")
        return {
            f: os.path.getmtime(os.path.join(leaf, f))
            for f in os.listdir(leaf)
            if f.endswith(".parquet")
        }

    before_d2 = leaf_files("2024-01-02", 1)
    before_s2 = leaf_files("2024-01-01", 2)

    updates = spark.createDataFrame(
        [(t0, 1, "f1", 999),                       # replaces (1, f1, t0)
         (t0, 1, "f9", 50)],                       # brand-new key, same leaf
        "poll_ts timestamp, dpid int, flow_key string, packet_count long",
    )
    applied = upsert_telemetry(spark, path, updates)
    assert applied == 2

    got = {
        (r.dpid, r.flow_key, r.poll_ts): r.packet_count
        for r in spark.read.parquet(path).collect()
    }
    assert got[(1, "f1", t0)] == 999               # replaced
    assert got[(1, "f9", t0)] == 50                # inserted
    assert got[(1, "f2", t0)] == 200               # sibling row survived
    assert got[(2, "f1", t0)] == 300
    assert got[(1, "f1", t0 + dt.timedelta(days=1))] == 400
    assert len(got) == 5
    # untouched leaves: identical file sets with identical mtimes
    assert leaf_files("2024-01-02", 1) == before_d2
    assert leaf_files("2024-01-01", 2) == before_s2


def test_upsert_into_empty_lake_is_insert(spark, tmp_path):
    """MERGE into a not-yet-created target is a pure insert — the first
    upsert creates the lake instead of crashing on the missing path."""
    import datetime as dt

    from dipa_collaborative_pulsar_idps_spark.storage import upsert_telemetry

    path = str(tmp_path / "fresh_lake")
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    updates = spark.createDataFrame(
        [(t0, 1, "f1", 7)],
        "poll_ts timestamp, dpid int, flow_key string, packet_count long",
    )
    assert upsert_telemetry(spark, path, updates) == 1
    got = spark.read.parquet(path).collect()
    assert len(got) == 1 and got[0].packet_count == 7


def test_write_corpus_spreads_one_lang_across_range_tasks(spark, tmp_path):
    """The doc_id-range secondary write key: a single-language corpus must
    land as multiple per-range sorted files (not one task owning the whole
    language), and each file must cover a contiguous doc_id run so range
    pruning still works."""
    from dipa_collaborative_pulsar_idps_spark.storage import read_corpus, write_corpus

    rows = [(i, "en", f"text {i}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    path = str(tmp_path / "corpus")
    write_corpus(df, path, n_tasks=4)  # 4 range tasks over one language

    files = {
        r[0]
        for r in read_corpus(spark, path, lang="en")
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert len(files) == 4, files
    # contiguity: each file's ids form one unbroken run
    per_file = (
        read_corpus(spark, path, lang="en")
        .select(F.input_file_name().alias("f"), "doc_id")
        .groupBy("f")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    for r in per_file:
        assert r.hi - r.lo + 1 == r.n, (r.lo, r.hi, r.n)


def test_zorder_key_golden():
    """Morton interleave golden: known bit patterns land at known positions."""
    from pyspark.sql import SparkSession

    from dipa_collaborative_pulsar_idps_spark.storage import zorder_key

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long").select(
        zorder_key(["x", "y"], bits=3).alias("z")
    )
    # x bits (c=0) at 0,2,4; y bits (c=1) at 1,3,5:
    # x=101 -> z bits 4,0 set; y=011 -> z bits 3,1 set => 0b011011 = 27
    assert df.first().z == 0b011011 == 27


def test_zorder_layout_prunes_on_every_dimension(spark, tmp_path):
    """Per-file parquet min/max boxes: a linear sort prunes only its lead
    column; the Morton layout gives tight boxes on BOTH columns, so a
    selective predicate on the non-lead column skips most files.

    Deterministic by construction: write_zordered raises the range-exchange
    boundary sample above the per-partition row count, so file boundaries
    are exact __zkey quantiles independent of the sampling seed (which
    varies with session RDD-id history — the source of a former 9-vs-8
    flake under the shared suite session). Expected hits at this dataset:
    y-band 4/16, x-band 5/16."""
    import pyarrow.parquet as pq

    from dipa_collaborative_pulsar_idps_spark.storage import write_zordered

    n, files = 64_000, 16
    df = spark.range(n).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(1000))).alias("x"),
        (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1000))).alias("y"),
    )
    lin, zor = str(tmp_path / "linear"), str(tmp_path / "zorder")
    df.repartitionByRange(files, "x").sortWithinPartitions("x").write.parquet(lin)
    write_zordered(df, zor, ["x", "y"], n_files=files)

    def boxes(path):
        out = []
        for f in (tmp_path / path).glob("*.parquet"):
            md = pq.read_metadata(f)
            lo = {c: None for c in ("x", "y")}
            hi = {c: None for c in ("x", "y")}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        s = col.statistics
                        lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                        hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
            out.append((lo, hi))
        return out

    def hit(path, col, a, b):
        return sum(
            1 for lo, hi in boxes(path) if not (hi[col] < a or lo[col] > b)
        )

    # y-band query (10% of the domain): linear-by-x layout cannot skip —
    # every file spans ~the full y range; z-order skips most files.
    lin_hits = hit("linear", "y", 100, 199)
    z_hits = hit("zorder", "y", 100, 199)
    assert lin_hits == files
    assert z_hits <= files // 2, f"z-order should skip, hit {z_hits}/{files}"
    # and the lead dimension still prunes under z-order
    assert hit("zorder", "x", 100, 199) <= files // 2
    # layout preserves content exactly
    assert (
        spark.read.parquet(zor).select(F.sum("x"), F.sum("y"), F.count("*")).first()
        == df.select(F.sum("x"), F.sum("y"), F.count("*")).first()
    )
    # engine-level: the same band predicate reads fewer rows from the
    # z-ordered files (row-group pruning visible as scan output rows)
    z_cnt = spark.read.parquet(zor).where(F.col("y").between(100, 199)).count()
    l_cnt = spark.read.parquet(lin).where(F.col("y").between(100, 199)).count()
    assert z_cnt == l_cnt  # same answer, different I/O


def test_observed_write_metrics_free_pass(spark, tmp_path):
    """df.observe metrics accumulate inside the write job itself — row
    accounting with NO second scan; values match an independent compute."""
    from dipa_collaborative_pulsar_idps_spark.plans.observe import observed
    from dipa_collaborative_pulsar_idps_spark.tables import Tables

    docs = Tables(spark, "/root/testdata/sf0.001").documents
    metered, obs = observed(
        docs,
        n_rows=F.count(F.lit(1)),
        n_null_text=F.sum(F.col("text").isNull().cast("long")),
        total_chars=F.sum("n_chars"),
    )
    metered.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    want = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
        F.sum("n_chars").alias("total_chars"),
    ).first()
    assert got["n_rows"] == want["n_rows"] > 0
    assert got["n_null_text"] == want["n_null_text"]
    assert got["total_chars"] == want["total_chars"]


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The engine's skew story is not only manual salting: with AQE on
    (session default), a hot join key is detected from runtime shuffle
    stats and split across tasks — certified by the skew markers in the
    FINAL adaptive plan. Thresholds are lowered so test-scale data
    qualifies; production uses the defaults."""
    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        left = spark.range(400_000).select(
            F.when(F.col("id") % 2 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 64), "id").alias("pad"),
        )
        right = spark.range(50_000).select(F.col("id").alias("k"), F.lit("d").alias("d"))
        q = left.join(right, "k").groupBy().count()
        # the action must run THROUGH this frame: a .write goes via a
        # separate QueryExecution and this plan would never finalize
        assert q.collect()[0][0] == 225_000  # 200k hot-key + 25k tail matches
        plan = q._jdf.queryExecution().executedPlan().treeString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_rocksdb_soak_alert_lifecycle_state_stays_bounded(spark):
    """SOAK: the I16 keyed alert lifecycle on the RocksDB state store
    across 50 micro-batches and 108k cumulative keys with event-time TTL.
    Contracts: (a) every key with >= sustained_count consecutive hot
    polls ALERTs exactly once (100k ALERTs), (b) tracked state is
    EVICTED, not monotone — the per-batch state-size probe peaks at the
    active-window size (~22k keys: 10k live + <=6 poll-intervals of TTL
    lag), a fraction of the 108k cumulative key space."""
    import datetime as dt
    import shutil
    import tempfile
    import time

    from dipa_collaborative_pulsar_idps_spark.session import enable_rocksdb_state
    from dipa_collaborative_pulsar_idps_spark.streaming.replay import (
        replay_stream,
        run_to_memory,
    )
    from dipa_collaborative_pulsar_idps_spark.streaming.state import alert_state_machine

    n_batches, window, step = 50, 10_000, 2_000
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    d = tempfile.mkdtemp(prefix="dipa_soak_")
    try:
        enable_rocksdb_state(spark)
        t0 = dt.datetime(2024, 1, 1)
        for b in range(n_batches):
            (
                spark.range(b * step, b * step + window)
                .select(
                    F.lit(t0 + dt.timedelta(seconds=2 * b)).alias("poll_ts"),
                    F.concat(F.lit("k"), F.col("id")).alias("src"),
                    F.lit(True).alias("hot"),
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(d)
            )
            time.sleep(0.03)  # distinct mtimes -> deterministic replay order
        stream = replay_stream(
            spark, d, "poll_ts timestamp, src string, hot boolean"
        )
        out = alert_state_machine(
            stream,
            idle_timeout_ms=12_000,  # 6 poll intervals
            emit_state_size=True,
        )
        q = run_to_memory(out, "soak_alerts")
        n_micro = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        rows = spark.table("soak_alerts").collect()
        alerts = [r for r in rows if r.event == "ALERT"]
        sizes = [r for r in rows if r.event == "STATE_SIZE"]
        # (a) correctness at soak scale: keys 8000..99999 get exactly
        # sustained_count=5 consecutive hot polls -> exactly one ALERT
        # each (edge keys <8000 / >=100000 see <=4 polls: soak start/end)
        assert len(alerts) == 92_000
        assert len({r.src for r in alerts}) == 92_000
        assert all(r.streak == 5 for r in alerts[:1000])
        # (b) bounded state: sum probe sizes per batch timestamp
        per_batch = {}
        for r in sizes:
            per_batch[r.event_ts] = per_batch.get(r.event_ts, 0) + r.streak
        assert len(per_batch) >= 50, f"only {len(per_batch)} probed batches ({n_micro} micro-batches)"
        series = [v for _, v in sorted(per_batch.items())]
        assert max(series) <= 30_000, f"state not bounded: peak {max(series)}"
        # eviction actually happened: by the end 108k distinct keys have
        # entered the operator but <= 30k remain tracked — >= 78k TTL
        # evictions; without the TTL the series would climb to 108k.
        assert 108_000 - series[-1] >= 78_000
        # steady state is a PLATEAU (arrivals == evictions per batch),
        # not growth: the back half of the soak stays flat within noise
        mid = len(series) // 2
        assert max(series[mid:]) <= min(series[mid:]) + step, series[mid:]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        shutil.rmtree(d, ignore_errors=True)


def test_zorder_three_column_golden_and_pruning(spark, tmp_path):
    """The Morton interleave is generic in k: golden bit positions for
    k=3 (bit j of column c at position j*3+c), and a 3-dim layout gives
    every file a tight box on ALL THREE columns — a 10% band predicate
    on the 2nd or 3rd dimension skips most files where the linear
    lead-column sort skips none."""
    import pyarrow.parquet as pq

    from dipa_collaborative_pulsar_idps_spark.storage import write_zordered, zorder_key

    g = spark.createDataFrame([(0b10, 0b01, 0b11)], "x long, y long, z long").select(
        zorder_key(["x", "y", "z"], bits=2).alias("m")
    )
    # x=10 -> bits {3}, y=01 -> bits {1}, z=11 -> bits {2,5} => 0b101110 = 46
    assert g.first().m == 0b101110 == 46

    n, files = 64_000, 64
    df = spark.range(n).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(1000))).alias("x"),
        (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1000))).alias("y"),
        (F.pmod(F.xxhash64(F.col("id") + 13), F.lit(1000))).alias("z"),
    )
    lin, zor = str(tmp_path / "linear3"), str(tmp_path / "zorder3")
    df.repartitionByRange(files, "x").sortWithinPartitions("x").write.parquet(lin)
    write_zordered(df, zor, ["x", "y", "z"], n_files=files)

    def hits(path, col, a, b):
        out = 0
        for f in (tmp_path / path).glob("*.parquet"):
            md = pq.read_metadata(f)
            lo = hi = None
            for rg in range(md.num_row_groups):
                grp = md.row_group(rg)
                for ci in range(grp.num_columns):
                    c = grp.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if not (hi < a or lo > b):
                out += 1
        return out

    for band_col in ("y", "z"):
        assert hits("linear3", band_col, 100, 199) == files  # lead sort: no skip
        assert hits("zorder3", band_col, 100, 199) <= files // 2, band_col
    # the lead column still prunes well under z-order too
    assert hits("zorder3", "x", 100, 199) <= files // 2


def test_delete_docs_rewrites_only_touched_partitions(spark, tmp_path):
    """GDPR-style targeted delete: ids disappear, UNTOUCHED lang dirs keep
    their exact files (byte-level: same names, sizes, mtimes), a lang
    whose every row is deleted has its directory removed (dynamic
    overwrite alone cannot clear it), and the in-file doc_id sort
    survives the rewrite."""
    import os

    from dipa_collaborative_pulsar_idps_spark.storage import (
        delete_docs,
        read_corpus,
        write_corpus,
    )

    rows = [(i, f"text {i}", ["en", "de", "zh"][i % 3], "s0", 10) for i in range(90)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "corpus")
    write_corpus(df, path, n_tasks=2)

    def snapshot(lang):
        d = f"{path}/lang={lang}"
        return {
            f: (os.path.getsize(f"{d}/{f}"), os.path.getmtime(f"{d}/{f}"))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    en_before = snapshot("en")
    # delete two de docs + EVERY zh doc; en untouched
    zh_ids = [i for i in range(90) if i % 3 == 2]
    n = delete_docs(spark, path, [1, 4] + zh_ids)
    assert n == 2 + len(zh_ids)

    got = {r.doc_id for r in read_corpus(spark, path).collect()}
    assert got == {i for i in range(90) if i % 3 != 2} - {1, 4}
    assert snapshot("en") == en_before          # untouched partition: same bytes
    assert not os.path.exists(f"{path}/lang=zh")  # emptied dir cleared
    # idempotent / no-op on absent ids
    assert delete_docs(spark, path, [1, 4]) == 0
    # in-file sort preserved in the rewritten partition
    de = [r.doc_id for r in spark.read.parquet(f"{path}/lang=de").collect()]
    files = sorted(
        f for f in os.listdir(f"{path}/lang=de") if f.endswith(".parquet")
    )
    for f in files:
        ids = [r.doc_id for r in spark.read.parquet(f"{path}/lang=de/{f}").collect()]
        assert ids == sorted(ids)
    assert set(de) == {i for i in range(90) if i % 3 == 1} - {1, 4}
