"""IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
scale path beside hyperplane LSH (functions/similarity.py).

Build (the FAISS-style recipe): train k-means centroids on a BOUNDED
sample (≤ ``sample_per_list``·n_list rows — driver memory is O(k·d)
regardless of corpus size, the standard coarse-quantizer training move),
then assign the FULL corpus distributed: centroid matrix closed over the
Arrow UDF, one argmin matmul per batch. Search: score a query only against
the vectors in its ``n_probe`` nearest lists — scanned fraction ≈
n_probe / n_list.

At 100 TB: the centroid table is tiny (broadcast); assignment is one pass;
the probe join shuffles only on list ids. Lists should be written
partitioned by list_id so a probe prunes partitions at scan time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_cols, topk

#: Pointer file naming the ACTIVE generation directory under an index
#: root — written by :func:`ivf_retrain` (and the PQ sibling). An index
#: that has never been retrained has no pointer and serves from the flat
#: root layout `save_ivf_index` writes, so pre-retrain indexes load
#: unchanged.
_POINTER = "_CURRENT"

#: Completeness marker written as the LAST step of `_write_ivf_tree` /
#: `_write_ivfpq_tree` (r11 advisor): a generation directory EXISTS as soon
#: as its first list file lands, so pointer-loss recovery must not trust
#: bare existence — only a marked tree (lists + centroids + base stats all
#: committed) is eligible to serve.
_COMMIT_MARK = "_COMMITTED"


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path) for *path* through Hadoop's FS API — works on
    HDFS/S3/local alike (same move as _read_delta_dir)."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def _delete_tree(spark, path: str) -> None:
    """Recursive delete, no-op when absent."""
    fs, jpath = _hadoop_fs(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def _write_pointer(spark, path: str, gen: str) -> None:
    """Atomically point ``{path}/_CURRENT`` at generation dir *gen*:
    write ``_CURRENT.tmp`` then OVERWRITING rename over the live pointer
    (FileContext Rename.OVERWRITE — atomic on HDFS and posix-local, no
    delete/rename window). On stores whose FileContext can't overwrite-
    rename, fall back to delete-then-rename: a crash between those two
    steps loses the pointer, which the completeness-CHECKED recovery rule
    in :func:`_resolve_root` (latest ``_COMMITTED`` generation, else the
    flat root) makes safely recoverable (r11 advisor)."""
    fs, cur = _hadoop_fs(spark, f"{path}/{_POINTER}")
    _, tmp = _hadoop_fs(spark, f"{path}/{_POINTER}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(gen.encode("utf-8")))
    finally:
        out.close()
    sc = spark.sparkContext
    try:
        jvm = sc._jvm
        qual_cur = fs.makeQualified(cur)
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            qual_cur.toUri(), sc._jsc.hadoopConfiguration()
        )
        rename_opt = jvm.org.apache.hadoop.fs.Options.Rename
        opts = sc._gateway.new_array(rename_opt, 1)
        opts[0] = rename_opt.OVERWRITE
        fc.rename(fs.makeQualified(tmp), qual_cur, opts)
    except Exception:  # no overwrite-rename on this store — fall back
        if fs.exists(cur):
            fs.delete(cur, False)
        fs.rename(tmp, cur)


def _read_pointer(spark, path: str) -> str | None:
    fs, cur = _hadoop_fs(spark, f"{path}/{_POINTER}")
    if not fs.exists(cur):
        return None
    stream = fs.open(cur)
    try:
        # commons-io ships with Spark; py4j can't read into a Python-side
        # byte buffer (arrays pass by value), so let the JVM drain it
        jvm = spark.sparkContext._jvm
        text = jvm.org.apache.commons.io.IOUtils.toString(
            stream, jvm.java.nio.charset.StandardCharsets.UTF_8
        )
        return text.strip() or None
    finally:
        stream.close()


def _list_generations(spark, path: str) -> list[str]:
    """Existing ``gen-NNNNN`` directory names under *path*, sorted (zero-
    padded → lexicographic == numeric)."""
    fs, root = _hadoop_fs(spark, path)
    if not fs.exists(root):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(root)
        if st.isDirectory() and st.getPath().getName().startswith("gen-")
    )


def _mark_committed(spark, root: str) -> None:
    """Write the empty ``_COMMITTED`` marker — the LAST step of a tree
    write, so marker-presence ⇒ the whole tree landed."""
    fs, mark = _hadoop_fs(spark, f"{root}/{_COMMIT_MARK}")
    fs.create(mark, True).close()


def _is_complete(spark, root: str) -> bool:
    fs, mark = _hadoop_fs(spark, f"{root}/{_COMMIT_MARK}")
    return bool(fs.exists(mark))


def _resolve_root(spark, path: str) -> str:
    """The directory actually holding the index trees: the pointer target
    when a retrain has promoted a generation; else the latest COMPLETE
    gen dir — one whose ``_COMMITTED`` marker landed, i.e. the staged
    tree finished before the (crashed) pointer swap — else the flat
    *path* itself (the `save_ivf_index` layout). The completeness gate
    (r11 advisor) is what makes a lost pointer always safely recoverable:
    a gen dir exists as soon as its first list file is written, so a
    retrain that crashed MID-STAGE must never shadow the intact previous
    root. Generation trees written BEFORE the marker existed (pre-r12
    layouts) carry no ``_COMMITTED``; for those the structural equivalent
    is the ``stats/batch_id=base`` row — the LAST component the legacy
    write order produced — so a pointer-less index from an older release
    still recovers to its intact latest generation instead of the pruned
    flat root (r12 advisor)."""
    gen = _read_pointer(spark, path)
    if gen is not None:
        return f"{path}/{gen}"
    gens = _list_generations(spark, path)
    for g in reversed(gens):
        if _is_complete(spark, f"{path}/{g}"):
            return f"{path}/{g}"
    fs, _ = _hadoop_fs(spark, path)
    for g in reversed(gens):  # legacy (unmarked) trees: stats row was last
        _, base = _hadoop_fs(spark, f"{path}/{g}/stats/batch_id=base")
        if fs.exists(base):
            return f"{path}/{g}"
    return path


def _lloyd(x: np.ndarray, k: int, seed: int, iters: int = 25) -> np.ndarray:
    """Seeded k-means++ init + Lloyd until convergence — pure numpy on the
    (bounded) training sample. Empty clusters are re-seeded to the point
    farthest from its centroid, so exactly k non-degenerate lists emerge."""
    rng = np.random.default_rng(seed)
    n = len(x)
    cents = np.empty((k, x.shape[1]))
    cents[0] = x[rng.integers(n)]
    d2 = ((x - cents[0]) ** 2).sum(1)
    for j in range(1, k):  # k-means++: sample ∝ squared distance
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        cents[j] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((x - cents[j]) ** 2).sum(1))
    for _ in range(iters):
        dist = (x**2).sum(1)[:, None] - 2 * x @ cents.T + (cents**2).sum(1)[None, :]
        labels = dist.argmin(1)
        new = np.empty_like(cents)
        for j in range(k):
            members = x[labels == j]
            if len(members):
                new[j] = members.mean(0)
            else:
                new[j] = x[dist.min(1).argmax()]
        if np.allclose(new, cents):
            break
        cents = new
    return cents


def build_ivf_index(
    corpus: DataFrame,
    dim: int,
    n_list: int = 16,
    seed: int = 42,
    sample_per_list: int = 256,
) -> tuple[DataFrame, DataFrame]:
    """Returns (assigned_corpus, centroids).

    assigned_corpus: (vec_id, e, list_id) — corpus with inverted-list id.
    centroids: (list_id, centroid array<double>) — tiny, broadcastable.

    Training collects at most ``sample_per_list * n_list`` vectors chosen
    by a deterministic id-hash — bounded driver traffic by construction
    (NOT a corpus collect; at 1 B rows this is still ≤ 4096 rows for the
    default n_list=16). Assignment streams the corpus through one Arrow
    pass with the centroid matrix in the UDF closure."""
    from .sampling import bounded_sample

    x = bounded_sample(corpus, sample_per_list * n_list, seed)
    cents = _lloyd(x, n_list, seed)
    assigned = _assign_to_centroids(corpus, cents)
    spark = corpus.sparkSession
    from ..localdf import local_rows_df

    centroids = local_rows_df(
        spark,
        [(i, [float(v) for v in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>",
    )
    return assigned, centroids


def _assign_to_centroids(corpus: DataFrame, cents: np.ndarray) -> DataFrame:
    """(vec_id, e) → (vec_id, e, list_id): nearest-centroid assignment in
    one Arrow pass, the centroid matrix closed over the UDF (tiny —
    O(k·d) — so every executor gets it with the task, no join)."""

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="int32")
        mat = np.array(v.tolist(), dtype=np.float64)
        dist = -2 * mat @ cents.T + (cents**2).sum(1)[None, :]  # ‖v‖² constant per row
        return pd.Series(dist.argmin(1).astype("int32"))

    return corpus.select("vec_id", "e", assign(F.col("e")).alias("list_id"))


def probe_lists(centroids: DataFrame, queries: DataFrame, n_probe: int) -> DataFrame:
    """(list_id, query_id, qe): the ``n_probe`` nearest inverted lists per
    query by centroid cosine — the coarse-probe relation every IVF-family
    search (raw :func:`ivf_search`, IVF-PQ's ADC scan, IVF+SQ8) starts
    from. Both sides broadcast (queries are the bounded serving batch,
    centroids are n_list rows); ties broken by ascending list_id so the
    probe set is deterministic."""
    from pyspark.sql.window import Window

    q_cent = (
        F.broadcast(queries)
        .join(F.broadcast(centroids))
        .select(
            "query_id",
            "qe",
            "list_id",
            cosine_cols(F.col("qe"), F.col("centroid")).alias("c_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("list_id"))
    return (
        q_cent.withColumn("pr", F.row_number().over(w))
        .where(F.col("pr") <= n_probe)
        .select("list_id", "query_id", "qe")
    )


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k by cosine, scanning only the n_probe nearest inverted lists.

    queries: (query_id, qe array<double>). Output: like similarity.topk.

    r14 serving shape (guide §2.4): the bounded probe relation
    (n_queries × n_probe rows) is collected and rides the scan kernel's
    closure — the inverted lists are scanned IN PLACE (partition-pruned
    by the list filter on a loaded index) instead of cogroup-Exchanged
    on list_id per probe; scoring arithmetic is grouped_topk_scores'
    verbatim, so results are unchanged (the exhaustive twin's value
    oracle re-proves it)."""
    from .similarity import collect_probe_map, probed_scan_topk, raw_topk_scorer

    probe_map = collect_probe_map(probe_lists(centroids, queries, n_probe))
    return probed_scan_topk(
        assigned.select("list_id", "vec_id", "e"),
        probe_map,
        k,
        key="list_id",
        scorer=raw_topk_scorer(k),
    )


def _write_ivf_tree(
    assigned: DataFrame, centroids: DataFrame, root: str
) -> tuple[float, int]:
    """The index trees themselves (lists hive-partitioned by list_id +
    centroids + the stats/batch_id=base baseline) into *root* — shared by
    :func:`save_ivf_index` (root = the index path) and
    :func:`ivf_retrain` (root = a fresh generation dir). Returns the
    baseline ``(mean_sq_err, n_vectors)`` it stamped.

    The baseline is measured on the READ-BACK of the just-written lists —
    the same measure-what-serving-scans contract as the append path (r11
    advisor there), and one full pass cheaper: measuring the in-memory
    ``assigned`` frame re-ran its whole lazy subtree (corpus scan + the
    assignment Arrow pass) a second time (r13 opt, guide §1.2)."""
    assigned.repartition("list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(f"{root}/lists")
    centroids.write.mode("overwrite").parquet(f"{root}/centroids")
    spark = centroids.sparkSession
    # Empty-corpus guard (r14, advisor): a partitioned write of an empty
    # frame lands only _SUCCESS — no list_id=* directories — and reading
    # that back raises AnalysisException (no schema to infer). Stamp the
    # (0.0, 0) baseline directly; there is nothing serving could scan.
    fs, lists_path = _hadoop_fs(spark, f"{root}/lists")
    has_lists = any(
        st.isDirectory() and st.getPath().getName().startswith("list_id=")
        for st in fs.listStatus(lists_path)
    )
    if has_lists:
        committed = spark.read.schema(assigned.schema).parquet(
            f"{root}/lists"
        ).select("vec_id", "e", "list_id")
        err, n = quantization_error(committed, centroids)
    else:
        err, n = 0.0, 0
    _write_stats_row(spark, root, "base", n, err, seq=0)
    _mark_committed(spark, root)  # LAST: marker-presence ⇒ complete tree
    return err, n


def save_ivf_index(assigned: DataFrame, centroids: DataFrame, path: str) -> None:
    """Persist the index: inverted lists hive-partitioned by ``list_id`` —
    the layout that makes a probe a PARTITION-PRUNED scan (only the
    n_probe list directories are read; asserted in tests) — plus the tiny
    centroid table and the build-time quantization-error baseline
    (``stats/batch_id=base``) that :func:`ivf_append_batch` measures
    assignment drift against. Build once, serve many: the k-means pass is
    amortized across every subsequent query batch.

    (Re)INITIALIZES the path: any appended ``deltas/``, stale ``stats/``
    batch rows, retrain generations, and the generation pointer are
    deleted first, so saving a rebuilt index over an appended one can
    never serve duplicate vec_ids or count dead batch mass (r10 advisor).
    For retrain-under-serving use :func:`ivf_retrain` — it stages the new
    index in a fresh generation dir and promotes it with an atomic
    pointer swap instead of rewriting trees in place."""
    spark = centroids.sparkSession
    for sub in ("deltas", "stats", "lists", "centroids"):
        _delete_tree(spark, f"{path}/{sub}")
    for gen in _list_generations(spark, path):
        _delete_tree(spark, f"{path}/{gen}")
    _delete_tree(spark, f"{path}/{_POINTER}")
    _delete_tree(spark, f"{path}/{_COMMIT_MARK}")  # stale marker from a prior save
    _write_ivf_tree(assigned, centroids, path)


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a persisted index: (assigned, centroids), search-ready. Reads
    from the ACTIVE generation (the ``_CURRENT`` pointer target after an
    :func:`ivf_retrain`; the flat path before one). The serving relation
    is the base lists UNION any appended delta batches
    (``deltas/batch_id=*/list_id=*``) — both sides are hive-partitioned on
    list_id, so a probe's list filter still prunes to only the probed
    directories across base AND deltas."""
    root = _resolve_root(spark, path)
    assigned = spark.read.parquet(f"{root}/lists").select("vec_id", "e", "list_id")
    deltas = _read_deltas(spark, root)
    if deltas is not None:
        assigned = assigned.unionByName(deltas)
    centroids = spark.read.parquet(f"{root}/centroids")
    return assigned, centroids


def _read_deltas(spark, root: str) -> DataFrame | None:
    return _read_delta_dir(spark, f"{root}/deltas", ("vec_id", "e", "list_id"))


def _read_delta_dir(spark, root: str, cols: tuple[str, ...]) -> DataFrame | None:
    """The appended delta batches under *root*, or None when no batch was
    ever appended. Existence is checked through Hadoop's FileSystem API
    (not os.path), so the layout works unchanged on HDFS/S3 at cluster
    scale. Shared by the IVF (raw-vector) and IVF-PQ (code) layouts."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    return spark.read.parquet(root).select(*cols)


#: The stats-row schema every `_write_stats_row` since the commit_seq
#: format stamps (batch_id is the hive partition column). Reading with
#: this EXPLICIT schema skips the mergeSchema footer-merge pass (one
#: extra job per read — r13 opt, guide §5 driver round-trips) while
#: keeping the same legacy tolerance: parquet files written before the
#: ``commit_seq`` column simply read it as NULL, exactly what mergeSchema
#: produced for them.
_STATS_SCHEMA = "n_vectors long, mean_sq_err double, commit_seq long, batch_id string"


def _stats_rows(spark, path: str) -> list:
    """Every committed ``stats/batch_id=*`` row (empty list when no stats
    tree exists). Read with the explicit stats schema so rows written
    before the ``commit_seq`` column coexist with new ones (they read a
    NULL commit_seq) without paying mergeSchema's footer-merge job."""
    fs, stats_path = _hadoop_fs(spark, f"{path}/stats")
    if not fs.exists(stats_path):
        return []
    return spark.read.schema(_STATS_SCHEMA).parquet(f"{path}/stats").collect()  # bounded-collect: one row per committed batch


def _base_and_appended(rows: list, path: str) -> tuple[dict, int]:
    """(base stats dict, total appended row count) from collected stats
    rows. Raises a descriptive ValueError when the build baseline is
    missing (index written by a pre-baseline save format, or a partially-
    written stats tree) instead of a bare StopIteration (r10 advisor);
    append paths validate this BEFORE committing a delta."""
    if not rows:
        raise ValueError(
            f"no stats tree at {path}/stats — index predates the baseline "
            "format; re-run save_*_index (or *_retrain) to write the "
            "stats/batch_id=base row before appending"
        )
    base = next((r for r in rows if r["batch_id"] == "base"), None)
    if base is None:
        raise ValueError(
            f"stats tree at {path}/stats has no batch_id=base baseline row "
            "(partially-written index?); re-run save_*_index (or *_retrain) "
            "to restore it before appending"
        )
    appended_n = sum(r["n_vectors"] for r in rows if r["batch_id"] != "base")
    return (
        {"n_vectors": base["n_vectors"], "mean_sq_err": base["mean_sq_err"]},
        appended_n,
    )


def read_index_stats(spark, path: str) -> tuple[dict, int]:
    """(base stats row as a dict, total appended row count) from the
    ``stats/batch_id=*`` commits — the inputs to the retrain triggers."""
    return _base_and_appended(_stats_rows(spark, path), path)


def _post_append_stats(stats_before: list, batch_id: str, batch_n: int) -> int:
    """Total appended row count AFTER committing ``batch_id`` with
    ``batch_n`` rows, derived from the pre-commit stats rows — identical
    by construction to re-reading the stats tree (the tree after the
    commit is exactly ``stats_before`` with this batch's row added or, on
    a replay, overwritten), without the extra read+collect round trip the
    append paths used to pay per commit (r13 opt, guide §5)."""
    prior_n = sum(
        int(r["n_vectors"]) for r in stats_before if r["batch_id"] == batch_id
    )
    appended_before = sum(
        int(r["n_vectors"]) for r in stats_before if r["batch_id"] != "base"
    )
    return appended_before - prior_n + batch_n


def _commit_seq_for(rows: list, batch_id: str) -> int:
    """The commit sequence number for *batch_id*'s stats row: a REPLAYED
    commit (its row already exists) keeps its original slot — the ledger
    order is the order commits first happened, replay-stable — and a new
    commit takes max+1. This is what `index_health`'s cumulative
    appended_frac orders by (r11 advisor: lexicographic batch_id misorders
    non-zero-padded ids, b10 before b2)."""
    seqs = {r["batch_id"]: r.asDict().get("commit_seq") for r in rows}
    prior = seqs.get(batch_id)
    if prior is not None:
        return int(prior)
    known = [int(s) for s in seqs.values() if s is not None]
    return (max(known) + 1) if known else len(rows)


def _drift_ratio(batch_err: float, base_err: float) -> float:
    """batch/base quantization-error ratio. A zero baseline (every trained
    vector sat exactly on its centroid — e.g. n_list ≥ corpus rows) makes
    ANY nonzero batch error infinite drift, not ratio-1.0 business as
    usual (r10 advisor: the trigger was silently disabled there)."""
    if base_err > 0:
        return batch_err / base_err
    return float("inf") if batch_err > 0 else 1.0


def _round_ratio(x: float) -> float:
    import math

    return round(x, 4) if math.isfinite(x) else x


def quantization_error(assigned: DataFrame, centroids: DataFrame) -> tuple[float, int]:
    """(mean squared L2 distance to the assigned centroid, row count) —
    one broadcast join + one aggregate, all JVM-side built-ins. This is
    the FAISS-style index-health number: it rises when incoming data
    drifts away from the trained centroids."""
    sq = F.aggregate(
        F.zip_with("e", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    row = (
        assigned.join(F.broadcast(centroids), "list_id")
        .agg(F.avg(sq).alias("err"), F.count("*").alias("n"))
        .collect()[0]  # bounded-collect: one scalar row
    )
    return (float(row["err"] or 0.0), int(row["n"]))


def _write_stats_row(
    spark, path: str, batch_id: str, n: int, err: float, seq: int
) -> None:
    """One (n, mean_sq_err, commit_seq) row at ``stats/batch_id=<id>`` —
    overwrite into the batch's own directory, so a replayed commit rewrites
    the same stamp (including its original ``commit_seq`` slot, via
    :func:`_commit_seq_for`) instead of appending a duplicate (the
    exactly-once shape). ``commit_seq`` records commit ORDER — base is 0 —
    so the health ledger never depends on batch_id lexicographics."""
    from ..localdf import local_rows_df

    local_rows_df(
        spark,
        [(int(n), float(err), int(seq))],
        "n_vectors long, mean_sq_err double, commit_seq long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats/batch_id={batch_id}")


def ivf_append_batch(
    spark,
    path: str,
    batch: DataFrame,
    batch_id: str,
    retrain_drift: float = 1.5,
    retrain_mass: float = 0.5,
) -> dict:
    """Append new vectors to a PERSISTED IVF index without retraining —
    the incremental-ingest path the text indexes (MinHash bands, TF-IDF
    postings) already have.

    ``batch``: (vec_id, e array<double>). Work is O(batch): assign against
    the SAVED centroids (one Arrow pass, centroid matrix in the UDF
    closure), write to ``deltas/batch_id=<id>/list_id=*/`` with mode
    overwrite — the batch's own directory is the idempotent commit stamp
    (a crashed or replayed batch rewrites the same directory, never
    double-appends; same exactly-once shape as the streaming dedup/TF-IDF
    sinks) — and record the batch's quantization error beside the build
    baseline.

    Returns drift stats including ``needs_retrain``, which trips when
    (a) the batch's mean squared quantization error exceeds
    ``retrain_drift`` × the build baseline (the data moved away from the
    trained centroids), or (b) appended mass exceeds ``retrain_mass`` ×
    the trained corpus (enough new data that k-means would place
    centroids differently). Acting on the trigger is one call:
    :func:`ivf_retrain` folds base + deltas into a fresh generation and
    promotes it atomically."""
    if batch_id == "base":
        # "base" is the build baseline's reserved stats slot: an append
        # stamped with it would overwrite the baseline and corrupt every
        # derived drift/mass number (r14, advisor)
        raise ValueError(
            'batch_id "base" is reserved for the build baseline stats row'
        )
    root = _resolve_root(spark, path)
    # validate the baseline BEFORE committing the delta: a missing base
    # stats row used to surface only AFTER the delta landed, leaving a
    # served-but-unaccounted batch (r10 advisor)
    stats_before = _stats_rows(spark, root)
    base, appended_before = _base_and_appended(stats_before, root)
    if batch.isEmpty():
        # nothing to commit: writing an empty hive dir would break schema
        # inference for EVERY later delta read (r10 advisor) — report
        # against the existing stats instead
        appended_frac = (
            appended_before / base["n_vectors"] if base["n_vectors"] else 0.0
        )
        return {
            "batch_id": batch_id,
            "n_vectors": 0,
            "mean_sq_err": 0.0,
            "base_mean_sq_err": base["mean_sq_err"],
            "drift_ratio": 1.0,
            "appended_frac": _round_ratio(appended_frac),
            "needs_retrain": appended_frac > retrain_mass,
        }
    # one centroids read serves both the assignment collect and the
    # error-measure join; the sort is driver-side — n_list rows — so the
    # collect skips orderBy's range-partitioning sample job (r14, guide §5)
    centroids = spark.read.parquet(f"{root}/centroids")
    cent_rows = sorted(centroids.collect(), key=lambda r: r["list_id"])  # bounded-collect: n_list rows
    cents = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    assigned = _assign_to_centroids(batch.select("vec_id", "e"), cents)
    assigned.repartition("list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(f"{root}/deltas/batch_id={batch_id}")
    # measure the COMMITTED batch (read-back, not the in-memory frame), so
    # the stat reflects exactly what serving will scan; the explicit
    # schema (the frame just written) skips the footer-inference job
    committed = spark.read.schema(assigned.schema).parquet(
        f"{root}/deltas/batch_id={batch_id}"
    ).select("vec_id", "e", "list_id")
    batch_err, batch_n = quantization_error(committed, centroids)
    _write_stats_row(
        spark, root, batch_id, batch_n, batch_err,
        seq=_commit_seq_for(stats_before, batch_id),
    )
    # post-commit ledger state derived from the pre-commit rows + the row
    # just stamped (identical to a re-read by construction; r13 opt —
    # this was a second stats read+collect per append)
    appended_n = _post_append_stats(stats_before, batch_id, batch_n)
    drift = _drift_ratio(batch_err, base["mean_sq_err"])
    appended_frac = appended_n / base["n_vectors"] if base["n_vectors"] else 0.0
    return {
        "batch_id": batch_id,
        "n_vectors": batch_n,
        "mean_sq_err": batch_err,
        "base_mean_sq_err": base["mean_sq_err"],
        "drift_ratio": _round_ratio(drift),
        "appended_frac": _round_ratio(appended_frac),
        "needs_retrain": drift > retrain_drift or appended_frac > retrain_mass,
    }


def _next_generation(spark, path: str) -> str:
    gens = _list_generations(spark, path)
    nxt = (int(gens[-1].split("-")[1]) + 1) if gens else 1
    return f"gen-{nxt:05d}"


def ivf_retrain(
    spark,
    path: str,
    n_list: int | None = None,
    seed: int = 42,
    sample_per_list: int = 256,
    prune_old: bool = True,
) -> dict:
    """One-call retrain/compaction: fold the persisted base + every
    appended delta into a FRESH index (new k-means over the full current
    corpus), staged in a new ``gen-NNNNN`` directory and promoted with an
    atomic ``_CURRENT`` pointer swap — the response to a tripped
    ``needs_retrain`` (pre-r11 the trigger existed but the action was
    caller-owned prose). Exactly-once shape: the staged tree is complete
    (lists + centroids + fresh base stats, NO deltas) before the swap; a
    crash before the swap leaves the old generation serving; a replayed
    retrain stages another generation and swaps again. Readers that
    resolved the old root keep a consistent view — its trees are pruned
    only AFTER the swap, and only when ``prune_old``.

    Mirrors storage.upsert_telemetry's leaf-scoped discipline: write into
    fresh directories, never mutate a tree a reader may hold.

    ``n_list`` defaults to the current centroid count. Returns
    {generation, n_vectors, mean_sq_err, n_list}."""
    old_root = _resolve_root(spark, path)
    loaded, old_centroids = load_ivf_index(spark, path)
    corpus = loaded.select("vec_id", "e")
    # reuse the loaded centroids frame instead of a second read (r14)
    cent_rows = old_centroids.collect()  # bounded-collect: n_list rows
    if n_list is None:
        n_list = len(cent_rows)
    assigned, centroids = build_ivf_index(
        corpus,
        dim=len(cent_rows[0]["centroid"]),
        n_list=n_list,
        seed=seed,
        sample_per_list=sample_per_list,
    )
    gen = _next_generation(spark, path)
    err, n = _write_ivf_tree(assigned, centroids, f"{path}/{gen}")
    _write_pointer(spark, path, gen)
    if prune_old:
        if old_root == path:  # flat pre-generation layout
            for sub in ("lists", "centroids", "stats", "deltas"):
                _delete_tree(spark, f"{path}/{sub}")
        else:
            _delete_tree(spark, old_root)
    # the staged tree's baseline is the stamp _write_ivf_tree just wrote —
    # no need to read the stats tree back (r13 opt, guide §5)
    return {
        "generation": gen,
        "n_vectors": n,
        "mean_sq_err": err,
        "n_list": n_list,
    }


def index_health(spark, path: str) -> DataFrame:
    """The index-health ledger of a persisted IVF / IVF-PQ index: one row
    per committed batch (``base`` + every append) with its size and
    quantization/reconstruction error, plus the two derived numbers the
    retrain triggers read — ``drift_ratio`` (batch error / build
    baseline; null when the baseline is 0, where any nonzero batch error
    is infinite drift) and cumulative ``appended_frac`` (appended mass /
    trained corpus, running in COMMIT order — the ``commit_seq`` column
    each stats write stamps, base = 0, so non-zero-padded batch ids like
    b10/b2 can't misorder the running sum; r11 advisor).

    Resolves the ACTIVE generation, so after an :func:`ivf_retrain` the
    ledger restarts at the fresh baseline — exactly what a serving
    monitor should see. All JVM-side: a broadcast 1-row join against the
    base row + a running-sum window over the (tiny) batch set."""
    from pyspark.sql.window import Window

    root = _resolve_root(spark, path)
    # tiny: one row per batch; the explicit schema tolerates
    # pre-commit_seq rows (they read commit_seq NULL) without
    # mergeSchema's footer-merge job (r13 opt)
    stats = spark.read.schema(_STATS_SCHEMA).parquet(f"{root}/stats")
    base = stats.where(F.col("batch_id") == "base").select(
        F.col("n_vectors").alias("base_n"), F.col("mean_sq_err").alias("base_err")
    )
    is_append = (F.col("batch_id") != "base").cast("int")
    # commit order: the commit_seq stamp (base = 0) when present; rows
    # written by the pre-seq format fall back to base-first + batch_id
    if "commit_seq" in stats.columns:
        ord_key = F.coalesce(
            F.col("commit_seq"),
            F.when(F.col("batch_id") == "base", F.lit(0)).otherwise(F.lit(2**62)),
        )
    else:
        ord_key = is_append
    w = (
        Window.orderBy(ord_key, is_append, F.col("batch_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    appended = F.sum(is_append * F.col("n_vectors")).over(w)
    return (
        stats.join(F.broadcast(base))
        .select(
            "batch_id",
            "n_vectors",
            "mean_sq_err",
            F.when(F.col("base_err") > 0, F.col("mean_sq_err") / F.col("base_err"))
            .alias("drift_ratio"),
            (appended / F.col("base_n")).alias("appended_frac"),
        )
        .orderBy(ord_key, is_append, "batch_id")
    )
