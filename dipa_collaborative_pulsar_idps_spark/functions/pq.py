"""Product quantization (PQ) — the ANN memory-compression path beside
IVF (functions/ivf.py) and hyperplane LSH (functions/similarity.py).

The FAISS ``IndexPQ`` recipe: split each d-dim vector into ``m`` subspaces
of d/m dims, k-means each subspace to ``ksub`` codewords on a BOUNDED
training sample, then encode the FULL corpus distributed — each vector
becomes ``m`` small integers (m bytes at ksub ≤ 256) instead of d floats,
a 32× compression at d=64/m=8/float32. Search is the ADC (asymmetric
distance computation) scan: per query, a tiny (m × ksub) lookup table of
query-subvector · codeword partial dot products; a vector's approximate
inner product is then m table gathers — no float decode of the corpus.

At 100 TB: the codebooks are tiny (m·ksub·dsub doubles — broadcast in the
UDF closure); training collects ≤ ``sample_cap`` rows regardless of corpus
size (same bounded-collect move as IVF, ivf.py:80); encoding is one Arrow
map pass; the ADC scan reads only the code column (m bytes/row — the point
of PQ) and ships just per-partition top-k up the merge. Compose with IVF
(write codes partitioned by list_id) for the standard IVF-PQ layout — the
probe then prunes partitions AND scans compressed codes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import _lloyd
from .similarity import topk

#: Hard bound on the driver-side query batch for the ADC scan — queries are
#: the small serving-side input by construction (same bound as IVF training).
_MAX_QUERY_BATCH = 4096


def train_pq(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    sample_cap: int = 4096,
) -> np.ndarray:
    """Train per-subspace codebooks on a bounded, deterministically-sampled
    subset. Returns ``(m, ksub, dim//m)`` float64 codebooks.

    The sample filter is the same id-hash thinning as IVF training: driver
    traffic is ≤ sample_cap rows whether the corpus is 500 rows or 1 B.
    """
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    dsub = dim // m
    from .sampling import bounded_sample

    x = bounded_sample(corpus, sample_cap, seed)
    if ksub == len(x):
        # Degenerate certifier config (the exhaustive twins): with one
        # codeword per training point, k-means++ + Lloyd provably fixes
        # every distinct point as its own centroid — skip straight there.
        # Codeword ORDER differs from what Lloyd's random init would pick,
        # which is irrelevant: encode is an argmin over the same set.
        return np.stack([x[:, j * dsub : (j + 1) * dsub] for j in range(m)])
    return np.stack(
        [_lloyd(x[:, j * dsub : (j + 1) * dsub], ksub, seed + j) for j in range(m)]
    )


def pq_encode(
    corpus: DataFrame, codebooks: np.ndarray, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Encode (vec_id, e) → (vec_id, *keep, codes array<int>), one Arrow
    map pass with the codebooks in the UDF closure. Map-only: no shuffle —
    pass-through columns ride the same projection (``keep``) instead of a
    join-back."""
    m, ksub, dsub = codebooks.shape

    @F.pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        mat = np.array(v.tolist(), dtype=np.float64)  # (B, d)
        codes = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            cb = codebooks[j]  # (ksub, dsub)
            dist = -2 * sub @ cb.T + (cb**2).sum(1)[None, :]
            codes[:, j] = dist.argmin(1)
        return pd.Series(list(codes))

    return corpus.select("vec_id", *keep, enc(F.col("e")).alias("codes"))


def save_pq(spark, codebooks: np.ndarray, path: str) -> None:
    """Persist trained codebooks so a serving restart reloads the SAME
    quantization instead of retraining (at 100 TB a retrain means a new,
    slightly different encoding of the whole corpus — every stored code
    column would need rebuilding). Same build-once/serve-many contract as
    ``ivf.save_ivf_index`` and the BPE merge tables: written through
    Spark so the path can be any cluster filesystem, not driver-local
    disk. The table is tiny — m·ksub rows of dsub doubles — and parquet
    doubles round-trip bit-exactly."""
    m, ksub, dsub = codebooks.shape
    rows = [
        (int(j), int(c), [float(x) for x in codebooks[j, c]])
        for j in range(m)
        for c in range(ksub)
    ]
    spark.createDataFrame(rows, "j int, c int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_pq(spark, path: str) -> np.ndarray:
    """Load codebooks persisted by :func:`save_pq` — returns the exact
    ``(m, ksub, dsub)`` float64 array ``train_pq`` produced (disk ≡
    memory, pinned in tests), directly usable by ``pq_encode`` /
    ``pq_search_adc`` / ``ivfpq_search``."""
    rows = spark.read.parquet(path).collect()  # bounded-collect: m·ksub codebook rows
    m = max(r.j for r in rows) + 1
    ksub = max(r.c for r in rows) + 1
    cb = np.empty((m, ksub, len(rows[0].centroid)), dtype=np.float64)
    for r in rows:
        cb[r.j, r.c] = r.centroid
    return cb


def pq_reconstruct(codebooks: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Decode code rows back to approximate vectors (test/debug helper)."""
    m, ksub, dsub = codebooks.shape
    out = np.empty((len(codes), m * dsub))
    for j in range(m):
        out[:, j * dsub : (j + 1) * dsub] = codebooks[j][codes[:, j]]
    return out


def pq_search_adc(
    encoded: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """ADC top-k scan: approximate cosine between each query and every
    encoded vector, computed entirely from code gathers.

    cos(q, v̂) = (Σ_j LUT_ip[j, code_j]) / (‖q‖ · sqrt(Σ_j n2[j, code_j]))
    where v̂ is the reconstruction — exact cosine against the DEQUANTIZED
    vector, never materializing it (the identity is pinned by
    tests/test_dedup.py::test_pq_adc_equals_reconstructed_cosine).

    queries: (query_id, qe). Collected to the driver under a hard
    ``_MAX_QUERY_BATCH`` bound (the serving batch is the small side by
    construction); each corpus partition emits only its per-partition
    top-k per query, then ``topk`` merges globally.
    """
    m, ksub, dsub = codebooks.shape
    q_rows = queries.limit(_MAX_QUERY_BATCH + 1).collect()  # bounded-collect: serving batch ≤ _MAX_QUERY_BATCH, enforced below
    if len(q_rows) > _MAX_QUERY_BATCH:
        raise ValueError(
            f"query batch exceeds {_MAX_QUERY_BATCH}; chunk the serving batch"
        )
    if not q_rows:  # empty serving batch (e.g. chunked_search on an empty set)
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rk int"
        )
    q_ids = np.array([r.query_id for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.qe for r in q_rows], dtype=np.float64)  # (Q, d)
    q_norm = np.sqrt((q_mat**2).sum(1))
    # (Q, m, ksub) inner-product LUT + (m, ksub) codeword squared norms
    lut = np.stack(
        [q_mat[:, j * dsub : (j + 1) * dsub] @ codebooks[j].T for j in range(m)],
        axis=1,
    )
    n2 = (codebooks**2).sum(2)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (B, m)
            ip = np.zeros((len(q_ids), len(codes)))
            vn2 = np.zeros(len(codes))
            for j in range(m):
                ip += lut[:, j, :][:, codes[:, j]]
                vn2 += n2[j][codes[:, j]]
            denom = np.maximum(q_norm[:, None] * np.sqrt(vn2)[None, :], 1e-12)
            cos = ip / denom
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            out_q, out_n, out_c = [], [], []
            # self-excluded, tie-broken by ascending id — the same order the
            # global topk window applies, so the per-partition cut is exact.
            for row, q in enumerate(q_ids):
                keep = vec_ids != q
                s, ids = cos[row, keep], vec_ids[keep]
                part = np.lexsort((ids, -s))[:k]
                out_q.append(np.full(len(part), q))
                out_n.append(ids[part])
                out_c.append(s[part])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    return topk(
        encoded.mapInPandas(
            scan, "query_id long, neighbor_id long, cosine double"
        ),
        k,
    )


def pq_search_adc_chunked(
    encoded: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 5,
    chunk_size: int = _MAX_QUERY_BATCH,
) -> DataFrame:
    """ADC serving for query sets LARGER than ``_MAX_QUERY_BATCH``: the
    chunking driver around :func:`pq_search_adc` (bounded batches through
    ``similarity.chunked_search``, per-chunk top-k unioned — exact because
    chunk query sets are disjoint). Each chunk rescans the code column
    (m bytes/row); persist ``encoded`` before calling when serving many
    chunks so the scan is a cache read."""
    from .similarity import chunked_search

    chunk_size = min(chunk_size, _MAX_QUERY_BATCH)
    return chunked_search(
        queries, lambda q: pq_search_adc(encoded, codebooks, q, k), chunk_size
    )


def ivfpq_search(
    assigned: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-PQ: probe the ``n_probe`` nearest inverted lists (coarse
    quantizer) and ADC-score only their *codes* (product quantizer) — the
    standard billion-scale serving layout (FAISS ``IVFPQ``): scanned
    fraction ≈ n_probe/n_list AND every scanned row is m bytes, not d
    floats.

    assigned: (vec_id, e, list_id) from ivf.build_ivf_index — encoded
    here (one extra Arrow pass). Serving many batches? Build the code
    column ONCE with :func:`save_ivfpq_index` and search the loaded
    index through :func:`ivfpq_search_encoded` instead — re-encoding
    the corpus per query batch is the build step leaking into serving.
    """
    enc = pq_encode(assigned, codebooks, keep=("list_id",))
    return ivfpq_search_encoded(enc, centroids, codebooks, queries, k, n_probe)


def save_ivfpq_index(
    assigned: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    path: str,
) -> None:
    """Persist the full IVF-PQ serving layout: codes (m small ints per
    vector — the 32× compression is ON DISK too) hive-partitioned by
    ``list_id`` so a probe is a partition-pruned scan, plus the tiny
    centroid table, the PQ codebooks, and the build-time reconstruction-
    error baseline (``stats/batch_id=base``) that
    :func:`ivfpq_append_batch` measures codebook drift against.
    Encode-once/serve-many: the corpus never needs its raw vectors again
    at serving time."""
    from .ivf import _write_stats_row

    enc = pq_encode(assigned, codebooks, keep=("list_id",))
    enc.repartition("list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(f"{path}/codes")
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    spark = centroids.sparkSession
    save_pq(spark, codebooks, f"{path}/pq")
    err, n = pq_reconstruction_error(assigned.select("vec_id", "e"), codebooks)
    _write_stats_row(spark, path, "base", n, err)


def load_ivfpq_index(spark, path: str) -> tuple[DataFrame, DataFrame, np.ndarray]:
    """Load a persisted IVF-PQ index → (encoded, centroids, codebooks),
    ready for :func:`ivfpq_search_encoded`. The code relation is the base
    codes UNION any appended delta batches
    (``codes_deltas/batch_id=*/list_id=*`` — :func:`ivfpq_append_batch`);
    both sides stay hive-partitioned on list_id, so a probe still prunes
    to the probed list directories across base AND deltas."""
    from .ivf import _read_delta_dir

    enc = spark.read.parquet(f"{path}/codes").select("vec_id", "codes", "list_id")
    deltas = _read_delta_dir(
        spark, f"{path}/codes_deltas", ("vec_id", "codes", "list_id")
    )
    if deltas is not None:
        enc = enc.unionByName(deltas)
    centroids = spark.read.parquet(f"{path}/centroids")
    return enc, centroids, load_pq(spark, f"{path}/pq")


def pq_reconstruction_error(corpus: DataFrame, codebooks: np.ndarray) -> tuple[float, int]:
    """(mean squared PQ reconstruction residual ‖v − decode(encode(v))‖²,
    row count) over (vec_id, e) — one Arrow pass with the codebooks in
    the closure. The PQ index-health number: it rises when incoming
    vectors drift away from the subspace codebooks' training
    distribution, the signal :func:`ivfpq_append_batch` uses to demand a
    retrain."""
    m, ksub, dsub = codebooks.shape

    @F.pandas_udf("double")
    def resid(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="float64")
        mat = np.array(v.tolist(), dtype=np.float64)
        sq = np.zeros(len(mat))
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            cb = codebooks[j]
            dist = sub @ (-2 * cb.T) + (cb**2).sum(1)[None, :]
            code = dist.argmin(1)
            sq += ((sub - cb[code]) ** 2).sum(1)
        return pd.Series(sq)

    row = (
        corpus.select(resid(F.col("e")).alias("sq"))
        .agg(F.avg("sq").alias("err"), F.count("*").alias("n"))
        .collect()[0]  # bounded-collect: one scalar row
    )
    return (float(row["err"] or 0.0), int(row["n"]))


def ivfpq_append_batch(
    spark,
    path: str,
    batch: DataFrame,
    batch_id: str,
    retrain_drift: float = 1.5,
    retrain_mass: float = 0.5,
) -> dict:
    """Append new vectors to a PERSISTED IVF-PQ index without retraining
    either quantizer — the compressed-serving sibling of
    ``ivf.ivf_append_batch`` (same batch-stamped exactly-once layout).

    ``batch``: (vec_id, e array<double>). O(batch) work: coarse-assign
    against the SAVED centroids, PQ-encode with the SAVED codebooks (one
    fused Arrow pipeline), commit to ``codes_deltas/batch_id=<id>/
    list_id=*/`` with mode overwrite (idempotent replay), and record the
    batch's PQ reconstruction error beside the build baseline.

    ``needs_retrain`` trips on (a) reconstruction error >
    ``retrain_drift`` × baseline (the codebooks no longer fit the data —
    a PQ retrain means RE-ENCODING the whole corpus, which is exactly why
    the trigger is a tracked number and not a per-batch habit), or
    (b) appended mass > ``retrain_mass`` × the trained corpus."""
    from .ivf import _assign_to_centroids, _write_stats_row, read_index_stats

    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("list_id").collect()  # bounded-collect: n_list rows
    cents = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    codebooks = load_pq(spark, f"{path}/pq")
    assigned = _assign_to_centroids(batch.select("vec_id", "e"), cents)
    enc = pq_encode(assigned, codebooks, keep=("list_id",))
    enc.repartition("list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(f"{path}/codes_deltas/batch_id={batch_id}")
    batch_err, batch_n = pq_reconstruction_error(batch.select("vec_id", "e"), codebooks)
    _write_stats_row(spark, path, batch_id, batch_n, batch_err)
    base, appended_n = read_index_stats(spark, path)
    drift = batch_err / base["mean_sq_err"] if base["mean_sq_err"] > 0 else 1.0
    appended_frac = appended_n / base["n_vectors"] if base["n_vectors"] else 0.0
    return {
        "batch_id": batch_id,
        "n_vectors": batch_n,
        "mean_sq_err": batch_err,
        "base_mean_sq_err": base["mean_sq_err"],
        "drift_ratio": round(drift, 4),
        "appended_frac": round(appended_frac, 4),
        "needs_retrain": drift > retrain_drift or appended_frac > retrain_mass,
    }


def ivfpq_search_encoded(
    enc: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-PQ ADC scan over a PRE-encoded corpus (vec_id, codes, list_id)
    — the serving half of the index: no raw-vector column anywhere, no
    per-batch encode pass. Cogroups on list_id like ivf_search, but the
    kernel gathers from the per-query PQ lookup table instead of
    BLAS-ing raw vectors."""
    m, ksub, dsub = codebooks.shape

    from pyspark.sql.window import Window

    from .similarity import cosine_cols

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
    probes = (
        q_cent.withColumn("pr", F.row_number().over(w))
        .where(F.col("pr") <= n_probe)
        .select("list_id", "query_id", "qe")
    )

    n2 = (codebooks**2).sum(2)

    def fn(probes_pdf: pd.DataFrame, codes_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        if not len(probes_pdf) or not len(codes_pdf):
            return empty
        qid = probes_pdf["query_id"].to_numpy(dtype=np.int64)
        qm = np.array(probes_pdf["qe"].tolist(), dtype=np.float64)
        qn = np.sqrt((qm**2).sum(1))
        codes = np.array(codes_pdf["codes"].tolist(), dtype=np.int64)
        nid = codes_pdf["vec_id"].to_numpy(dtype=np.int64)
        lut = np.stack(
            [qm[:, j * dsub : (j + 1) * dsub] @ codebooks[j].T for j in range(m)],
            axis=1,
        )
        ip = np.zeros((len(qid), len(codes)))
        vn2 = np.zeros(len(codes))
        for j in range(m):
            ip += lut[:, j, :][:, codes[:, j]]
            vn2 += n2[j][codes[:, j]]
        cos = ip / np.maximum(qn[:, None] * np.sqrt(vn2)[None, :], 1e-12)
        out_q, out_n, out_c = [], [], []
        for row, q in enumerate(qid):
            keep = nid != q
            s, ids = cos[row, keep], nid[keep]
            part = np.lexsort((ids, -s))[:k]
            out_q.append(np.full(len(part), q))
            out_n.append(ids[part])
            out_c.append(s[part])
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "cosine": np.concatenate(out_c),
            }
        )

    scored = (
        enc.select("list_id", "vec_id", "codes")
        .groupBy("list_id")
        .cogroup(probes.groupBy("list_id"))
        .applyInPandas(
            lambda codes_pdf, probes_pdf: fn(probes_pdf, codes_pdf),
            "query_id long, neighbor_id long, cosine double",
        )
    )
    return topk(scored, k)
