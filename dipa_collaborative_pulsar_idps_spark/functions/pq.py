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

The IVF-PQ composite is RESIDUAL-encoded (FAISS ``IVFADC``, r11): the PQ
quantizes ``v − centroid[list_id]``, not the raw vector — the coarse
quantizer absorbs the between-list spread, so the product quantizer's
full dynamic range covers only the within-list residual, the standard
recall lever at fixed m/ksub. Train the composite's codebooks with
:func:`train_pq_residual`; ADC scoring adds the centroid back per
(query, list) inside the cogrouped kernel. The flat-PQ path
(:func:`pq_search_adc`) stays raw-vector — there is no coarse quantizer
to take a residual against.
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


def _residuals(assigned: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, e, list_id) × (list_id, centroid) → (vec_id, e=v−c,
    list_id): the IVFADC residual relation — one broadcast join + a
    zip_with, all JVM-side (no Python boundary for the subtraction)."""
    return assigned.join(F.broadcast(centroids), "list_id").select(
        "vec_id",
        F.zip_with("e", "centroid", lambda a, b: a - b).alias("e"),
        "list_id",
    )


def train_pq_residual(
    assigned: DataFrame,
    centroids: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    sample_cap: int = 4096,
) -> np.ndarray:
    """Train the IVF-PQ composite's codebooks on coarse RESIDUALS
    (v − centroid[list_id]) — the FAISS IVFADC recipe. Same bounded
    deterministic sampling as :func:`train_pq`; the residual subtraction
    happens distributed before the sample collect, so driver traffic is
    unchanged (≤ sample_cap rows). The residual relation is persisted
    across the sampler's count+collect pair (two jobs that would
    otherwise each replay the assignment UDF + broadcast join)."""
    res = _residuals(assigned, centroids).persist()
    try:
        return train_pq(res, dim, m, ksub, seed, sample_cap)
    finally:
        res.unpersist()


def random_rotation(dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic random orthogonal matrix (QR of a seeded Gaussian,
    sign-fixed so the factorization is unique) — the data-independent
    rotation the OPQ exhaustive certifier uses to exercise the rotated
    serving path under a full value oracle."""
    rng = np.random.default_rng(seed)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return q * np.sign(np.diag(r))


def rotate_vectors(df: DataFrame, rotation: np.ndarray, vec_col: str = "e") -> DataFrame:
    """Replace ``vec_col`` with ``vec @ R`` — one Arrow matmul pass, the
    rotation riding the UDF closure (d² doubles — tiny). All other columns
    pass through the same projection."""
    rot = np.asarray(rotation, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def rr(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        return pd.Series(list(np.array(v.tolist(), dtype=np.float64) @ rot))

    others = [c for c in df.columns if c != vec_col]
    return df.select(*others, rr(F.col(vec_col)).alias(vec_col))


def _opq_pca_init(x: np.ndarray, m: int, dsub: int) -> np.ndarray:
    """PCA-permuted OPQ initialization (Ge et al. CVPR'13 §4): eigh of
    the sample covariance (deterministic; sign-fixed so each axis's
    largest-|component| is positive), principal axes sorted by
    eigenvalue and greedily dealt to the m subspace buckets balancing
    each bucket's log-eigenvalue SUM (= eigenvalue product — the
    independence-assumption distortion bound each subspace carries).
    Returns the orthogonal (dim, dim) matrix used as ``x @ R``."""
    xc = x - x.mean(0)
    w, v = np.linalg.eigh(xc.T @ xc / max(len(x), 1))
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    flip = np.abs(v).argmax(0)  # sign-fix each eigenvector
    v = v * np.sign(v[flip, np.arange(v.shape[1])])[None, :]
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = np.zeros(m)
    for i in range(v.shape[1]):
        free = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(free, key=lambda c: logs[c])
        buckets[b].append(i)
        logs[b] += float(np.log(max(w[i], 1e-12)))
    perm = [i for b in buckets for i in b]
    return v[:, perm]


def train_opq(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    sample_cap: int = 4096,
    n_iter: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
    """OPQ (Ge et al., "Optimized Product Quantization", CVPR 2013; FAISS
    ``OPQMatrix``): learn an orthogonal rotation R that redistributes
    variance across the m subspaces before PQ, alternating (1) per-subspace
    k-means on the rotated sample and (2) the orthogonal-Procrustes update
    R = UVᵀ from SVD(Xᵀ·Ŷ) against the quantized reconstruction Ŷ — each
    step is non-increasing in ‖XR − Ŷ‖², the PQ distortion after rotation.

    Returns ``(R (dim,dim), codebooks (m, ksub, dim//m))`` — both tiny,
    broadcast in UDF closures. Because R is ORTHOGONAL, cosine in rotated
    space equals raw cosine, so the unchanged ADC machinery serves OPQ:
    ``pq_encode(rotate_vectors(corpus, R), cb)`` +
    ``pq_search_adc(enc, cb, rotate_vectors(queries, R, "qe"), k)``.

    Training is driver-side numpy on the same bounded deterministic sample
    as :func:`train_pq` (≤ sample_cap rows at ANY corpus size); the ksub ==
    sample-size certifier config degenerates to R = I + one-codeword-per-
    point (reconstruction is exact, so rotation changes nothing).

    r13: the rotation starts from the PCA-permuted initialization of
    Ge et al. §4 (OPQ-P / FAISS OPQMatrix's pca_white-free init) instead
    of identity — principal axes allocated to subspaces balancing each
    bucket's eigenvalue PRODUCT (greedy on log-eigenvalues), so the
    alternating refinement descends from an already variance-balanced
    rotation rather than spending its iterations discovering one. Lifts
    the clustered near-tie fixture recall past plain PQ's (the r11
    documented caveat) without regressing the corpus axis."""
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    dsub = dim // m
    from .sampling import bounded_sample

    x = bounded_sample(corpus, sample_cap, seed)
    if ksub == len(x):
        return np.eye(dim), np.stack(
            [x[:, j * dsub : (j + 1) * dsub] for j in range(m)]
        )
    rot = _opq_pca_init(x, m, dsub)
    cbs = None
    for _ in range(n_iter):
        y = x @ rot
        cbs = np.stack(
            [_lloyd(y[:, j * dsub : (j + 1) * dsub], ksub, seed + j) for j in range(m)]
        )
        yhat = np.empty_like(y)
        for j in range(m):
            sub = y[:, j * dsub : (j + 1) * dsub]
            cb = cbs[j]
            codes = (-2 * sub @ cb.T + (cb**2).sum(1)[None, :]).argmin(1)
            yhat[:, j * dsub : (j + 1) * dsub] = cb[codes]
        u, _, vt = np.linalg.svd(x.T @ yhat)
        rot = u @ vt
    # codebooks for the FINAL rotation (the loop trains them one R behind)
    y = x @ rot
    cbs = np.stack(
        [_lloyd(y[:, j * dsub : (j + 1) * dsub], ksub, seed + j) for j in range(m)]
    )
    return rot, cbs


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
    from ..localdf import local_rows_df

    rows = [
        (int(j), int(c), [float(x) for x in codebooks[j, c]])
        for j in range(m)
        for c in range(ksub)
    ]
    local_rows_df(spark, rows, "j int, c int, centroid array<double>").coalesce(
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


def save_opq(spark, rotation: np.ndarray, codebooks: np.ndarray, path: str) -> None:
    """Persist an OPQ transform: the rotation (d rows of d doubles —
    tiny) beside the codebooks in :func:`save_pq`'s layout. Same
    train-once/serve-many contract: re-training OPQ yields a different R
    and every stored code column would need rebuilding."""
    from ..localdf import local_rows_df

    save_pq(spark, codebooks, f"{path}/pq")
    rows = [(int(i), [float(x) for x in rotation[i]]) for i in range(len(rotation))]
    local_rows_df(spark, rows, "i int, vals array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/rotation")


def load_opq(spark, path: str) -> tuple[np.ndarray, np.ndarray]:
    """Load ``(rotation, codebooks)`` persisted by :func:`save_opq` —
    bit-exact round-trip (parquet doubles), directly usable by
    :func:`rotate_vectors` + :func:`pq_encode` / :func:`pq_search_adc`."""
    rows = spark.read.parquet(f"{path}/rotation").collect()  # bounded-collect: d rotation rows
    d = max(r.i for r in rows) + 1
    rot = np.empty((d, len(rows[0].vals)), dtype=np.float64)
    for r in rows:
        rot[r.i] = r.vals
    return rot, load_pq(spark, f"{path}/pq")


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
    rotate: np.ndarray | None = None,
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

    ``rotate`` (r13 opt): an optional (d, d) rotation applied to the
    collected query matrix on the driver — ``q_mat @ R``, the exact
    numpy product :func:`rotate_vectors` computes inside its Arrow UDF,
    so results are bit-identical. The serving batch is bounded and
    collected here anyway; rotating it through a distributed Python-UDF
    pass cost a whole extra worker round-trip per probe (guide §4 — the
    boundary crossing, not the matmul, was the cost).
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
    if rotate is not None:
        q_mat = q_mat @ np.asarray(rotate, dtype=np.float64)
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
    floats. RESIDUAL-encoded (IVFADC): ``codebooks`` must come from
    :func:`train_pq_residual` over the same (assigned, centroids).

    assigned: (vec_id, e, list_id) from ivf.build_ivf_index — encoded
    here (one extra Arrow pass). Serving many batches? Build the code
    column ONCE with :func:`save_ivfpq_index` and search the loaded
    index through :func:`ivfpq_search_encoded` instead — re-encoding
    the corpus per query batch is the build step leaking into serving.
    """
    enc = pq_encode(_residuals(assigned, centroids), codebooks, keep=("list_id",))
    return ivfpq_search_encoded(enc, centroids, codebooks, queries, k, n_probe)


def save_ivfpq_index(
    assigned: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    path: str,
) -> None:
    """Persist the full IVF-PQ serving layout: RESIDUAL codes (m small
    ints per vector — the 32× compression is ON DISK too) hive-partitioned
    by ``list_id`` so a probe is a partition-pruned scan, plus the tiny
    centroid table, the PQ codebooks (residual-trained —
    :func:`train_pq_residual`), and the build-time residual-
    reconstruction-error baseline (``stats/batch_id=base``) that
    :func:`ivfpq_append_batch` measures codebook drift against.
    Encode-once/serve-many: the corpus never needs its raw vectors again
    at serving time.

    (Re)INITIALIZES the path — stale ``codes_deltas/``, ``stats/`` rows,
    retrain generations, and the generation pointer are deleted first
    (r10 advisor: saving a rebuilt index over an appended one must not
    serve stale deltas decoded with NEW codebooks). For retrain-under-
    serving use :func:`ivfpq_retrain`."""
    from .ivf import _COMMIT_MARK, _POINTER, _delete_tree, _list_generations

    spark = centroids.sparkSession
    for sub in ("codes_deltas", "stats", "codes", "centroids", "pq"):
        _delete_tree(spark, f"{path}/{sub}")
    for gen in _list_generations(spark, path):
        _delete_tree(spark, f"{path}/{gen}")
    _delete_tree(spark, f"{path}/{_POINTER}")
    _delete_tree(spark, f"{path}/{_COMMIT_MARK}")  # stale marker from a prior save
    _write_ivfpq_tree(assigned, centroids, codebooks, path)


def _write_ivfpq_tree(
    assigned: DataFrame, centroids: DataFrame, codebooks: np.ndarray, root: str
) -> tuple[float, int]:
    """The IVF-PQ trees (residual codes + centroids + codebooks + base
    stats) into *root*, ``_COMMITTED`` marker last — shared by
    :func:`save_ivfpq_index` and :func:`ivfpq_retrain`. Returns the
    baseline ``(mean_sq_err, n_vectors)`` it stamped."""
    from .ivf import _mark_committed, _write_stats_row

    res = _residuals(assigned, centroids)
    enc = pq_encode(res, codebooks, keep=("list_id",))
    enc.repartition("list_id").write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(f"{root}/codes")
    centroids.write.mode("overwrite").parquet(f"{root}/centroids")
    spark = centroids.sparkSession
    save_pq(spark, codebooks, f"{root}/pq")
    err, n = pq_reconstruction_error(res.select("vec_id", "e"), codebooks)
    _write_stats_row(spark, root, "base", n, err, seq=0)
    _mark_committed(spark, root)  # LAST: marker-presence ⇒ complete tree
    return err, n


def load_ivfpq_index(spark, path: str) -> tuple[DataFrame, DataFrame, np.ndarray]:
    """Load a persisted IVF-PQ index → (encoded, centroids, codebooks),
    ready for :func:`ivfpq_search_encoded`. Reads from the ACTIVE
    generation (pointer target after an :func:`ivfpq_retrain`; flat path
    before one). The code relation is the base codes UNION any appended
    delta batches (``codes_deltas/batch_id=*/list_id=*`` —
    :func:`ivfpq_append_batch`); both sides stay hive-partitioned on
    list_id, so a probe still prunes to the probed list directories
    across base AND deltas."""
    from .ivf import _read_delta_dir, _resolve_root

    root = _resolve_root(spark, path)
    enc = spark.read.parquet(f"{root}/codes").select("vec_id", "codes", "list_id")
    deltas = _read_delta_dir(
        spark, f"{root}/codes_deltas", ("vec_id", "codes", "list_id")
    )
    if deltas is not None:
        enc = enc.unionByName(deltas)
    centroids = spark.read.parquet(f"{root}/centroids")
    return enc, centroids, load_pq(spark, f"{root}/pq")


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


def pq_code_error(
    residuals: DataFrame, committed: DataFrame, codebooks: np.ndarray
) -> tuple[float, int]:
    """(mean squared reconstruction error ‖r − decode(code)‖², row count)
    of COMMITTED codes: the read-back (vec_id, codes) relation joined to
    the batch residuals (vec_id, e) by vec_id, decoded through the
    codebook gathers in one Arrow pass. This is the stat contract
    :func:`ivfpq_append_batch` shares with ``ivf_append_batch`` (r11
    advisor): the number reflects exactly the code bytes serving will
    scan — a truncated or partial delta commit shows up as a wrong count
    or error, not a silently-healthy in-memory measurement."""
    m, ksub, dsub = codebooks.shape

    @F.pandas_udf("double")
    def sqerr(e: pd.Series, codes: pd.Series) -> pd.Series:
        if not len(e):
            return pd.Series([], dtype="float64")
        mat = np.array(e.tolist(), dtype=np.float64)
        cds = np.array(codes.tolist(), dtype=np.int64)
        sq = np.zeros(len(mat))
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            sq += ((sub - codebooks[j][cds[:, j]]) ** 2).sum(1)
        return pd.Series(sq)

    row = (
        residuals.select("vec_id", "e")
        .join(committed.select("vec_id", "codes"), "vec_id")
        .select(sqerr(F.col("e"), F.col("codes")).alias("sq"))
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
    against the SAVED centroids, residualize, PQ-encode with the SAVED
    codebooks (one fused Arrow pipeline), commit to
    ``codes_deltas/batch_id=<id>/list_id=*/`` with mode overwrite
    (idempotent replay), and record the batch's residual reconstruction
    error beside the build baseline.

    ``needs_retrain`` trips on (a) reconstruction error >
    ``retrain_drift`` × baseline (the codebooks no longer fit the data —
    a PQ retrain means RE-ENCODING the whole corpus, which is exactly why
    the trigger is a tracked number and not a per-batch habit), or
    (b) appended mass > ``retrain_mass`` × the trained corpus. Acting on
    the trigger is one call: :func:`ivfpq_retrain`."""
    from .ivf import (
        _assign_to_centroids,
        _base_and_appended,
        _commit_seq_for,
        _drift_ratio,
        _post_append_stats,
        _resolve_root,
        _round_ratio,
        _stats_rows,
        _write_stats_row,
    )

    if batch_id == "base":
        # reserved for the build baseline stats row (r14, advisor) — an
        # append stamped "base" would clobber the drift baseline
        raise ValueError(
            'batch_id "base" is reserved for the build baseline stats row'
        )
    root = _resolve_root(spark, path)
    # validate the baseline BEFORE committing the delta (r10 advisor)
    stats_before = _stats_rows(spark, root)
    base, appended_before = _base_and_appended(stats_before, root)
    if batch.isEmpty():
        # an empty hive delta dir would break schema inference for every
        # later delta read (r10 advisor) — skip the commit entirely
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
    # residual join; driver-side sort skips orderBy's range-partitioning
    # sample job (r14, guide §5)
    centroids = spark.read.parquet(f"{root}/centroids")
    cent_rows = sorted(centroids.collect(), key=lambda r: r["list_id"])  # bounded-collect: n_list rows
    cents = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    codebooks = load_pq(spark, f"{root}/pq")
    assigned = _assign_to_centroids(batch.select("vec_id", "e"), cents)
    # persisted: the residual relation feeds BOTH the delta write and the
    # committed-code rescore below (two jobs; one assignment/join pass)
    res = _residuals(assigned, centroids).persist()
    try:
        enc = pq_encode(res, codebooks, keep=("list_id",))
        enc.repartition("list_id").write.mode("overwrite").partitionBy(
            "list_id"
        ).parquet(f"{root}/codes_deltas/batch_id={batch_id}")
        # measure the COMMITTED batch (read back the delta's code rows and
        # rescore them against the batch residuals), mirroring
        # ivf_append_batch's contract: the stat reflects exactly what
        # serving will scan (r11 advisor); explicit schema (the frame just
        # written) skips the footer-inference job
        committed = spark.read.schema(enc.schema).parquet(
            f"{root}/codes_deltas/batch_id={batch_id}"
        ).select("vec_id", "codes")
        batch_err, batch_n = pq_code_error(res, committed, codebooks)
    finally:
        res.unpersist()
    _write_stats_row(
        spark, root, batch_id, batch_n, batch_err,
        seq=_commit_seq_for(stats_before, batch_id),
    )
    # post-commit ledger state from the pre-commit rows + the stamped row
    # (identical to a re-read by construction; r13 opt — was a second
    # stats read+collect per append)
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


def ivfpq_retrain(
    spark,
    path: str,
    corpus: DataFrame,
    n_list: int | None = None,
    m: int | None = None,
    ksub: int | None = None,
    seed: int = 42,
    sample_cap: int = 4096,
    prune_old: bool = True,
) -> dict:
    """One-call IVF-PQ retrain/compaction: rebuild BOTH quantizers (fresh
    k-means centroids + fresh residual codebooks) and re-encode, staged in
    a new ``gen-NNNNN`` directory and promoted with an atomic ``_CURRENT``
    pointer swap — the compressed sibling of :func:`ivf.ivf_retrain` and
    the response to a tripped ``needs_retrain``.

    ``corpus``: the full raw (vec_id, e) relation to index. The
    compressed index stores only m-byte codes — the raw vectors are NOT
    recoverable from it (that's the 32× point), so a PQ retrain reads
    them from the caller's source of truth (the embeddings table /
    upstream lake) rather than decoding lossy codes into lossier ones.
    ``n_list``/``m``/``ksub`` default to the current index's geometry.

    Same exactly-once shape as ivf_retrain: complete staged tree (codes +
    centroids + pq + fresh base stats, NO deltas) before the swap; old
    generation pruned only after, and only when ``prune_old``."""
    from .ivf import (
        _delete_tree,
        _next_generation,
        _resolve_root,
        _write_pointer,
        build_ivf_index,
    )

    old_root = _resolve_root(spark, path)
    old_cb = load_pq(spark, f"{old_root}/pq")
    if m is None:
        m = old_cb.shape[0]
    if ksub is None:
        ksub = old_cb.shape[1]
    if n_list is None:
        n_list = spark.read.parquet(f"{old_root}/centroids").count()
    dim = old_cb.shape[0] * old_cb.shape[2]
    assigned, centroids = build_ivf_index(corpus, dim=dim, n_list=n_list, seed=seed)
    codebooks = train_pq_residual(
        assigned, centroids, dim, m=m, ksub=ksub, seed=seed, sample_cap=sample_cap
    )
    gen = _next_generation(spark, path)
    err, n = _write_ivfpq_tree(assigned, centroids, codebooks, f"{path}/{gen}")
    _write_pointer(spark, path, gen)
    if prune_old:
        if old_root == path:  # flat pre-generation layout
            for sub in ("codes", "centroids", "pq", "stats", "codes_deltas"):
                _delete_tree(spark, f"{path}/{sub}")
        else:
            _delete_tree(spark, old_root)
    # the staged tree's baseline is the stamp _write_ivfpq_tree just
    # wrote — no need to read the stats tree back (r13 opt, guide §5)
    return {
        "generation": gen,
        "n_vectors": n,
        "mean_sq_err": err,
        "n_list": n_list,
        "m": m,
        "ksub": ksub,
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
    per-batch encode pass. Scans the probed lists in place like
    ivf_search (probe map in the kernel closure), but the kernel gathers
    from the per-query PQ lookup table instead of BLAS-ing raw vectors.

    IVFADC (r11): codes are RESIDUAL codes, so the reconstruction is
    v̂ = c + r̂ with c = centroid[list_id]. Per (query, list) the kernel
    adds the q·c term and the per-list codeword cross table
    cl[j, code] = c_subⱼ · codewordⱼ back into the LUT algebra:

        q·v̂   = q·c + Σⱼ lut[j, codeⱼ]
        ‖v̂‖² = ‖c‖² + 2·Σⱼ cl[j, codeⱼ] + Σⱼ n2[j, codeⱼ]

    The centroid matrix rides the kernel closure (n_list·d doubles —
    bounded by construction), so the per-list terms cost one small matmul
    per Arrow group, not a join."""
    m, ksub, dsub = codebooks.shape

    from .ivf import probe_lists
    from .similarity import collect_probe_map, probed_scan_topk

    cent_rows = sorted(centroids.collect(), key=lambda r: r["list_id"])  # bounded-collect: n_list rows
    n_lists = max(r["list_id"] for r in cent_rows) + 1
    cents = np.zeros((n_lists, len(cent_rows[0]["centroid"])), dtype=np.float64)
    for r in cent_rows:
        cents[r["list_id"]] = r["centroid"]

    # r14 serving shape (guide §2.4): the bounded probe relation rides the
    # ADC kernel's closure — the code relation is scanned in place
    # (partition-pruned by the list filter on a loaded index) instead of
    # cogroup-Exchanged on list_id per probe. Per-(list, query) algebra is
    # unchanged (and fully elementwise after the tiny LUT matmuls, so
    # scores are chunking-independent); the exhaustive twin's brute-force
    # value oracle re-proves the equality.
    probe_map = collect_probe_map(probe_lists(centroids, queries, n_probe))

    n2 = (codebooks**2).sum(2)

    def scorer(qid: np.ndarray, qm: np.ndarray, lid: int, codes_pdf: pd.DataFrame):
        c = cents[lid]  # (d,)
        qn = np.sqrt((qm**2).sum(1))
        codes = np.array(codes_pdf["codes"].tolist(), dtype=np.int64)
        nid = codes_pdf["vec_id"].to_numpy(dtype=np.int64)
        lut = np.stack(
            [qm[:, j * dsub : (j + 1) * dsub] @ codebooks[j].T for j in range(m)],
            axis=1,
        )
        # per-list constants: q·c per probing query, c·codeword cross LUT,
        # and ‖c‖² — the residual-decomposition terms
        qc = qm @ c  # (Q,)
        cl = np.stack(
            [c[j * dsub : (j + 1) * dsub] @ codebooks[j].T for j in range(m)]
        )  # (m, ksub)
        c2 = float(c @ c)
        ip = np.repeat(qc[:, None], len(codes), axis=1)
        vn2 = np.full(len(codes), c2)
        for j in range(m):
            ip += lut[:, j, :][:, codes[:, j]]
            vn2 += 2.0 * cl[j][codes[:, j]] + n2[j][codes[:, j]]
        cos = ip / np.maximum(qn[:, None] * np.sqrt(np.maximum(vn2, 0.0))[None, :], 1e-12)
        out_q, out_n, out_c = [], [], []
        for row, q in enumerate(qid):
            keep = nid != q
            s, ids = cos[row, keep], nid[keep]
            part = np.lexsort((ids, -s))[:k]
            out_q.append(np.full(len(part), q))
            out_n.append(ids[part])
            out_c.append(s[part])
        if not out_q:
            return None
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "cosine": np.concatenate(out_c),
            }
        )

    return probed_scan_topk(
        enc.select("list_id", "vec_id", "codes"),
        probe_map,
        k,
        key="list_id",
        scorer=scorer,
    )


def ivfpq_search_encoded_refined(
    enc: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    refine_factor: int = 4,
) -> DataFrame:
    """IVFADC + exact re-ranking (FAISS ``IndexRefineFlat``): the ADC scan
    over-fetches ``k · refine_factor`` candidates per query, then that
    bounded candidate set (n_queries · k · refine_factor id rows) is
    exactly rescored against the RAW vectors and cut back to top-k.

    Why this is the production serving shape: PQ scores are lossy — at
    fixed (m, ksub) the quantization error reorders near-tied true
    neighbors inside the probed lists, which is exactly the loss refine
    recovers (coarse-probe misses it cannot: a true neighbor in an
    unprobed list never reaches the candidate set — raise ``n_probe``
    for that). The refine cost is independent of corpus size: one
    broadcast-hash join of the tiny candidate set against the corpus
    scan (no shuffle of the big side) + an exact cosine per candidate
    row, all JVM-side whole-stage codegen.

    ``corpus``: (vec_id, e) — the raw vectors, which the (lossy) index
    cannot reconstruct; in a lake deployment this is the embeddings
    table the index was built from, partition-prunable by vec_id.
    Pattern source: FAISS ``IndexRefineFlat`` (public), re-expressed as
    broadcast-hash join + codegen cosine + window top-k."""
    from .similarity import cosine_cols

    cand = ivfpq_search_encoded(
        enc, centroids, codebooks, queries, k=k * refine_factor, n_probe=n_probe
    ).select("query_id", "neighbor_id")
    fetched = corpus.join(
        F.broadcast(cand), corpus["vec_id"] == cand["neighbor_id"]
    ).select("query_id", "neighbor_id", "e")
    rescored = fetched.join(F.broadcast(queries), "query_id").select(
        "query_id",
        "neighbor_id",
        cosine_cols(F.col("qe"), F.col("e")).alias("cosine"),
    )
    return topk(rescored, k)


def ivfpq_search_refined(
    assigned: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    refine_factor: int = 4,
) -> DataFrame:
    """Build-path convenience for :func:`ivfpq_search_encoded_refined`:
    ``assigned`` (vec_id, e, list_id) still carries the raw vectors, so it
    is both the encode input and the refine corpus. Serving many batches?
    Persist the index with :func:`save_ivfpq_index` and call the encoded
    variant with the lake's raw-embeddings relation instead."""
    enc = pq_encode(_residuals(assigned, centroids), codebooks, keep=("list_id",))
    return ivfpq_search_encoded_refined(
        enc,
        centroids,
        codebooks,
        assigned.select("vec_id", "e"),
        queries,
        k=k,
        n_probe=n_probe,
        refine_factor=refine_factor,
    )
