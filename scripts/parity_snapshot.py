"""Full-surface driver-style correctness gate → PARITY_r{N}.json.

Runs EVERY declared query on a VANILLA SparkSession (the driver's
environment — no engine conf factory) against the DuckDB oracle at sf0.01,
with the same canonicalization the driver uses (row count + column set +
order-insensitive value hash via testing.compare_query), and records the
machine-readable result at the repo root. Queries without an oracle get a
rows-only check (runs, returns a count).

This is the release gate that protects the ~100 queries the driver's
50-row CORRECTNESS sample never draws.

Usage:  python scripts/parity_snapshot.py <round-number> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Production ANN query → its oracle-checked exhaustive twin.
ANN_EXHAUSTIVE_TWINS = {
    "ann_topk_lsh_neighbors": "ann_topk_lsh_exhaustive",
    "ann_topk_ivf_neighbors": "ann_topk_ivf_exhaustive",
    "ann_topk_pq_neighbors": "ann_topk_pq_exhaustive",
    # r11: OPQ — learned orthogonal rotation before flat PQ; its own
    # exhaustive twin certifies the ROTATED serving path (seeded
    # data-independent rotation + ksub=n) under the full value oracle
    "ann_topk_opq_neighbors": "ann_topk_opq_exhaustive",
    "ann_topk_ivfpq_neighbors": "ann_topk_ivfpq_exhaustive",
    # r11: ADC over-fetch + exact re-rank (FAISS IndexRefineFlat) — same
    # index, the refine join recovers the PQ fine-ranking loss
    "ann_topk_ivfpq_refined": "ann_topk_ivfpq_exhaustive",
    # r10: the incremental paths (built on half, half appended through
    # ivf_append_batch / ivfpq_append_batch) — their recall-AFTER-APPENDS
    # rides the same gate
    "ann_topk_ivf_incremental": "ann_topk_ivf_exhaustive",
    "ann_topk_ivfpq_incremental": "ann_topk_ivfpq_exhaustive",
    # r12: IVF+SQ8 composite — the sub-linear near-exact point; its
    # exhaustive twin (all lists probed ≡ flat SQ8) carries the FULL
    # value oracle, so recall-vs-twin here isolates coarse-probe loss
    "ann_topk_ivfsq_neighbors": "ann_topk_ivfsq_exhaustive",
    # r13: the appended (base + code-delta) IVF+SQ8 serving path — its
    # recall-after-appends rides the same gate as the ivf/ivfpq siblings
    "ann_topk_ivfsq_incremental": "ann_topk_ivfsq_exhaustive",
}

#: recall@5 floors ON THIS CORPUS. Two distinct contracts:
#: - Index QUALITY is asserted in tests/test_dedup.py on a CLUSTERED
#:   fixture (LSH ≥0.8 / IVF ≥0.85 / PQ ≥0.65 / IVF-PQ ≥0.6) — data with
#:   neighbor structure, where recall measures the index.
#: - The testdata embeddings are isotropic synthetic vectors (measured:
#:   exhaustive rank-1 avg cosine 0.37 vs rank-5 0.29 — near-tied
#:   neighbors, ANN's structural worst case), so corpus recall is
#:   inherently lower and NOT a quality signal; it IS a deterministic
#:   regression signal (seeded indexes → same number every run: measured
#:   LSH 0.264/0.352, IVF 0.604/0.608, PQ 0.328/0.192, IVF-PQ
#:   0.296/0.208 at sf0.01/sf0.1). Floors sit under the min of both
#:   scales with margin for numeric drift — a drop below means a code
#:   change altered search behavior, not a noisy corpus.
ANN_RECALL_FLOORS = {
    "ann_topk_lsh_neighbors": 0.2,
    "ann_topk_ivf_neighbors": 0.5,
    "ann_topk_pq_neighbors": 0.15,
    # OPQ: r11 measured 0.384/0.236 (sf0.01/sf0.1) vs plain PQ's
    # 0.328/0.192 at the same m=8/ksub=32; r13 PCA-init reads 0.372 at
    # sf0.01 — still above plain PQ, floor unchanged
    "ann_topk_opq_neighbors": 0.18,
    # r11 IVFADC raised the measured corpus numbers (sf0.01/sf0.1):
    # ivfpq_neighbors 0.492/0.412 (raw r10: 0.296/0.208), ivfpq
    # incremental 0.42/0.376, ivf incremental (now post-retrain)
    # 0.572/0.596 ≈ the full-build 0.604/0.608. Floors raised to sit
    # under the min of both scales with margin — a drop back to
    # raw-vector encoding (0.208 at sf0.1) now trips the corpus floor
    # too, not just the clustered one.
    "ann_topk_ivfpq_neighbors": 0.3,
    # r11 refine: measured 0.604/0.592 (sf0.01/sf0.1) — refine recovers the
    # full PQ fine-ranking loss, landing exactly on raw IVF's corpus
    # number at the same n_probe (the residual gap is coarse-probe misses)
    "ann_topk_ivfpq_refined": 0.5,
    "ann_topk_ivf_incremental": 0.5,
    "ann_topk_ivfpq_incremental": 0.25,
    # r12: IVF+SQ8 — SQ scoring is near-exact, so recall vs its (flat-SQ-
    # oracle-checked) exhaustive twin ≈ raw IVF's coarse-probe recall at
    # the same n_probe (measured 0.612/0.600 at sf0.01/sf0.1 vs IVF raw
    # 0.604/0.608)
    "ann_topk_ivfsq_neighbors": 0.5,
    # r13: append-only base+delta composite — near-exact scoring means
    # the append loss is coarse-probe only (bounds/centroids trained on
    # the even half); measured 0.556/0.572 at sf0.01/sf0.1 (clustered 0.97)
    "ann_topk_ivfsq_incremental": 0.45,
}

#: Clustered-fixture recall floors — the MEANINGFUL quality numbers (same
#: deterministic 20×10 seeded-centroid corpus and method configs as the
#: pytest contracts in tests/test_dedup.py), recorded beside the
#: regression-floor corpus numbers so the artifact carries both.
CLUSTERED_RECALL_FLOORS = {
    "ann_topk_lsh_neighbors": 0.8,
    "ann_topk_ivf_neighbors": 0.85,
    "ann_topk_pq_neighbors": 0.65,
    # r13 OPQ with PCA-permuted init (Ge et al. OPQ-P): measured 0.78 —
    # now above plain PQ's 0.71, closing the r11 near-tie caveat (the
    # identity-initialized rotation read 0.67 on this fixture)
    "ann_topk_opq_neighbors": 0.7,
    # r11 IVFADC: residual encoding alone moved this 0.68–0.71 → 0.74 at
    # the old m=8/ksub=32 geometry; the m=16/ksub=64 serving split
    # (SCALE.ivfpq_*) carries it to 0.88 measured — floor 0.6 → 0.85
    "ann_topk_ivfpq_neighbors": 0.85,
    # r11 refine: exact re-rank of the ADC top-20 — expect IVF's 1.0
    # (every clustered true neighbor lands in the probed lists and the
    # candidate set; the exact rescore then orders them perfectly)
    "ann_topk_ivfpq_refined": 0.95,
    # r11: the fixture now ACTS on the mass trigger (ivf_retrain folds
    # base+deltas into a fresh generation) — post-retrain measured 1.0;
    # floor raised 0.8 → 0.9
    "ann_topk_ivf_incremental": 0.9,
    # append-only residual path at the drift-estimation geometry
    # (m=8/ksub=8, cap=64 — see tests): measured 0.61
    "ann_topk_ivfpq_incremental": 0.55,
    # r12 IVF+SQ8: near-exact scoring inside probed lists — clustered
    # loss is coarse-probe misses only (the r11 punch-item floor)
    "ann_topk_ivfsq_neighbors": 0.95,
    # r13 appended composite: half-trained coarse quantizer + SQ deltas;
    # clustered loss is still coarse-probe only (measured 1.0)
    "ann_topk_ivfsq_incremental": 0.9,
}


def clustered_ann_recalls(spark) -> dict[str, float]:
    """recall@5 of each production ANN method on the deterministic
    clustered fixture (20 clusters × 10 members, seed 11 — identical to
    tests/test_dedup.py::clustered_vectors), exactly the configurations
    the pytest contracts pin. Isotropic-corpus recall (above) is a
    regression floor; THIS is the quality measurement."""
    import random

    from pyspark.sql import functions as F

    from dipa_collaborative_pulsar_idps_spark.functions.ivf import (
        build_ivf_index,
        ivf_search,
    )
    from dipa_collaborative_pulsar_idps_spark.functions.pq import (
        ivfpq_search,
        ivfpq_search_refined,
        rotate_vectors,
        train_opq,
        pq_encode,
        pq_search_adc,
        train_pq,
    )
    from dipa_collaborative_pulsar_idps_spark.functions.similarity import (
        ann_topk_lsh,
        cosine_scores,
        recall_at_k,
        topk,
    )

    rng = random.Random(11)
    rows, vid = [], 0
    for _ in range(20):
        c = [rng.gauss(0, 1) for _ in range(64)]
        for _ in range(10):
            rows.append((vid, [x + rng.gauss(0, 0.15) for x in c]))
            vid += 1
    corpus = spark.createDataFrame(rows, ["vec_id", "e"])
    queries = corpus.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    exact = topk(cosine_scores(corpus, queries), 5)
    assigned, centroids = build_ivf_index(corpus, dim=64, n_list=16)
    # r12: IVF+SQ8 composite at the same coarse geometry / n_probe
    from dipa_collaborative_pulsar_idps_spark.functions.sq import (
        ivf_sq_search,
        sq_encode,
        train_sq,
    )

    sq_bounds = train_sq(corpus, dim=64)
    sq_enc = sq_encode(assigned, sq_bounds, keep=("list_id",))
    cb = train_pq(corpus, dim=64, m=8, ksub=32)
    # IVF-PQ is residual-encoded (IVFADC) at the r11 serving geometry
    # (SCALE.ivfpq_m/ivfpq_ksub) — same config the pytest contract pins
    from dipa_collaborative_pulsar_idps_spark.config import SCALE
    from dipa_collaborative_pulsar_idps_spark.functions.pq import train_pq_residual

    cb_ivfpq = train_pq_residual(
        assigned, centroids, dim=64, m=SCALE.ivfpq_m, ksub=SCALE.ivfpq_ksub
    )
    opq_rot, opq_cb = train_opq(corpus, dim=64, m=8, ksub=32)

    # recall-AFTER-APPENDS (r10): build on the even half, append the odd
    # half through the persisted batch-stamped delta path, serve from the
    # base+delta union — the same recipe tests/test_dedup.py pins ≥ 0.8
    import shutil
    import tempfile

    from dipa_collaborative_pulsar_idps_spark.functions.ivf import (
        ivf_append_batch,
        ivf_retrain,
        load_ivf_index,
        save_ivf_index,
    )

    from dipa_collaborative_pulsar_idps_spark.functions.pq import (
        ivfpq_append_batch,
        ivfpq_search_encoded,
        load_ivfpq_index,
        save_ivfpq_index,
    )

    half = corpus.where(F.col("vec_id") % 2 == 0)
    odd = corpus.where(F.col("vec_id") % 2 == 1)
    inc_path = tempfile.mkdtemp(prefix="parity_ivf_inc_")
    pq_path = tempfile.mkdtemp(prefix="parity_ivfpq_inc_")
    sq_path = tempfile.mkdtemp(prefix="parity_ivfsq_inc_")
    try:
        half_a, half_c = build_ivf_index(half, dim=64, n_list=16)
        save_ivf_index(half_a, half_c, inc_path)
        ivf_append_batch(spark, inc_path, odd.where(F.col("vec_id") % 4 == 1), "b1")
        st = ivf_append_batch(spark, inc_path, odd.where(F.col("vec_id") % 4 == 3), "b2")
        # mirror the declared query (r11): the second append's MASS
        # trigger fires and the fixture ACTS on it — recall measured on
        # the post-retrain generation (trigger→retrain→serve loop)
        if st["needs_retrain"]:
            ivf_retrain(spark, inc_path)
        l_assigned, l_centroids = load_ivf_index(spark, inc_path)
        inc_recall = recall_at_k(
            ivf_search(l_assigned, l_centroids, queries, k=5, n_probe=4), exact, 5
        )
        # compressed sibling: residual-trained (IVFADC), sample_cap <
        # |half| + ksub=8 so the drift baseline is held-out-representative
        # without training-set memorization (see tests/test_dedup.py);
        # stays append-only so delta serving is on the measured surface
        cbh = train_pq_residual(half_a, half_c, dim=64, m=8, ksub=8, sample_cap=64)
        save_ivfpq_index(half_a, half_c, cbh, pq_path)
        ivfpq_append_batch(spark, pq_path, odd.where(F.col("vec_id") % 4 == 1), "b1")
        ivfpq_append_batch(spark, pq_path, odd.where(F.col("vec_id") % 4 == 3), "b2")
        enc_l, cent_l, cb_l = load_ivfpq_index(spark, pq_path)
        pq_inc_recall = recall_at_k(
            ivfpq_search_encoded(enc_l, cent_l, cb_l, queries, k=5, n_probe=4),
            exact,
            5,
        )
        # r13: the SQ8 composite sibling — same append-only recipe, raw
        # vectors SQ-encoded against the HALF-trained global bounds
        from dipa_collaborative_pulsar_idps_spark.functions.sq import (
            ivfsq_append_batch,
            load_ivfsq_index,
            save_ivfsq_index,
        )

        sq_b = train_sq(half, dim=64)
        save_ivfsq_index(half_a, half_c, sq_b, sq_path)
        ivfsq_append_batch(spark, sq_path, odd.where(F.col("vec_id") % 4 == 1), "b1")
        ivfsq_append_batch(spark, sq_path, odd.where(F.col("vec_id") % 4 == 3), "b2")
        enc_s, cent_s, bounds_s = load_ivfsq_index(spark, sq_path)
        sq_inc_recall = recall_at_k(
            ivf_sq_search(enc_s, cent_s, bounds_s, queries, k=5, n_probe=4),
            exact,
            5,
        )
    finally:
        shutil.rmtree(inc_path, ignore_errors=True)
        shutil.rmtree(pq_path, ignore_errors=True)
        shutil.rmtree(sq_path, ignore_errors=True)

    return {
        "ann_topk_ivf_incremental": inc_recall,
        "ann_topk_ivfpq_incremental": pq_inc_recall,
        "ann_topk_ivfsq_incremental": sq_inc_recall,
        "ann_topk_lsh_neighbors": recall_at_k(
            ann_topk_lsh(corpus, queries, dim=64, k=5, n_planes=8, probe_radius=2),
            exact,
            5,
        ),
        "ann_topk_ivf_neighbors": recall_at_k(
            ivf_search(assigned, centroids, queries, k=5, n_probe=4), exact, 5
        ),
        "ann_topk_ivfsq_neighbors": recall_at_k(
            ivf_sq_search(sq_enc, centroids, sq_bounds, queries, k=5, n_probe=4),
            exact,
            5,
        ),
        "ann_topk_pq_neighbors": recall_at_k(
            pq_search_adc(pq_encode(corpus, cb), cb, queries, k=5), exact, 5
        ),
        "ann_topk_opq_neighbors": recall_at_k(
            pq_search_adc(
                pq_encode(rotate_vectors(corpus, opq_rot), opq_cb),
                opq_cb,
                rotate_vectors(queries, opq_rot, "qe"),
                k=5,
            ),
            exact,
            5,
        ),
        "ann_topk_ivfpq_neighbors": recall_at_k(
            ivfpq_search(assigned, centroids, cb_ivfpq, queries, k=5, n_probe=4),
            exact,
            5,
        ),
        "ann_topk_ivfpq_refined": recall_at_k(
            ivfpq_search_refined(
                assigned, centroids, cb_ivfpq, queries, k=5, n_probe=4,
                refine_factor=4,
            ),
            exact,
            5,
        ),
    }


#: The two banded rows-only pair dials (round-9 judge punch #5): record
#: recall vs their exact twin AND the candidate-mass fraction of the
#: quadratic pair space in the artifact, so every approximate query
#: carries its quality numbers in one place. Floors/ceilings are
#: CORPUS regression bounds (deterministic seeded hashing → same number
#: every run); the planted-truth quality contracts live in
#: tests/test_dedup.py / tests/test_scale_stress.py. Measured at r9:
#: ngram recall 1.0 / frac 0.0002 (sf0.01); cosine recall 0.4576 /
#: frac 0.1532 (isotropic embeddings — ANN's structural worst case, same
#: caveat as the ANN corpus floors above; clustered planted recall ≥0.9).
BANDED_DIALS = {
    "ngram_jaccard_banded": {
        "exact_twin": "ngram_jaccard_pairs",
        "pair_cols": ("doc_a", "doc_b"),
        "recall_floor": 0.8,
        "candidate_frac_ceiling": 0.05,
    },
    "cosine_near_dup_pairs_lsh": {
        "exact_twin": "cosine_near_dup_pairs",
        "pair_cols": ("keep_id", "dup_id"),
        "recall_floor": 0.3,
        "candidate_frac_ceiling": 0.25,
    },
    # r13 SemDeDup: k-means cluster-then-prune — candidate mass ~1/n_list
    # of the quadratic pair space (measured 0.288/0.270 recall (sf0.01/sf0.1) at ~0.07 mass on
    # the isotropic corpus, the same structural-worst-case caveat as the
    # LSH dial; planted near-dup recall >=0.95 is the quality contract in
    # tests/test_dedup.py). Floor sits under both scales with margin.
    "semantic_dedup_pairs": {
        "exact_twin": "cosine_near_dup_pairs",
        "pair_cols": ("keep_id", "dup_id"),
        "recall_floor": 0.15,
        "candidate_frac_ceiling": 0.2,
    },
}


def banded_dial_quality(spark, sf_dir: str, dial_dfs: dict) -> dict[str, dict]:
    """{dial query → {recall, candidate_frac}} for BANDED_DIALS. Recall
    compares the dial's emitted pair set against its exact twin's pairs
    AT THE DIAL'S OWN THRESHOLD (both sides exact-verify, so the dial's
    pairs are a subset by construction — recall is the only loss).
    candidate_frac counts the pairs the dial's blocker actually examines
    over n·(n-1)/2 — the sub-quadratic claim as a number."""
    from pyspark.sql import functions as F

    from dipa_collaborative_pulsar_idps_spark.config import SCALE
    from dipa_collaborative_pulsar_idps_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from dipa_collaborative_pulsar_idps_spark.functions.similarity import (
        _probe_masks,
        as_double,
        hyperplane_signature,
    )
    from dipa_collaborative_pulsar_idps_spark.queries.datapipe2 import _shingles
    from dipa_collaborative_pulsar_idps_spark.tables import Tables

    def pair_recall(name: str) -> float | None:
        cfg = BANDED_DIALS[name]
        a, b = cfg["pair_cols"]
        exact_df = dial_dfs[cfg["exact_twin"]]
        if name == "ngram_jaccard_banded":
            # exact twin runs at J≥0.2; the dial's contract is J≥0.8
            exact_df = exact_df.where(
                F.col("jaccard") >= SCALE.ngram_near_dup_threshold
            )
        exact = {(r[a], r[b]) for r in exact_df.select(a, b).collect()}
        got = {(r[a], r[b]) for r in dial_dfs[name].select(a, b).collect()}
        return round(len(exact & got) / len(exact), 4) if exact else None

    # ngram candidate mass: the MinHash band blocker's emitted pairs
    sh = _shingles(spark, sf_dir)
    sigs = minhash_signatures(sh, num_perm=SCALE.ngram_num_perm)
    n = sigs.count()
    ngram_cand = lsh_candidate_pairs(
        sigs, bands=SCALE.ngram_bands, rows_per_band=SCALE.ngram_rows_per_band
    ).count()
    # cosine candidate mass: pairs whose buckets fall within probe radius
    # (the exact pair population the verify stage scores)
    v = Tables(spark, sf_dir).embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    sig = hyperplane_signature(v, "e", 64, SCALE.pair_lsh_n_planes).select(
        "vec_id", "bucket"
    )
    masks = _probe_masks(SCALE.pair_lsh_n_planes, SCALE.pair_lsh_probe_radius)
    probed = sig.select(
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("bucket"),
        F.col("vec_id").alias("id_a"),
    )
    other = sig.select("bucket", F.col("vec_id").alias("id_b"))
    nv = sig.count()
    cos_cand = probed.join(other, "bucket").where("id_a < id_b").count()
    # semantic candidate mass: sum of within-cluster pair counts over the
    # shared serving build's cluster sizes
    from dipa_collaborative_pulsar_idps_spark.queries.datapipe3 import _ivfpq_build

    # r13: _ivfpq_build returns (assigned, centroids, cb, encoded) — the
    # encode-once serving memo added a 4th element
    assigned = _ivfpq_build(spark, sf_dir)[0]
    sizes = [r["c"] for r in assigned.groupBy("list_id").agg(
        F.count("*").alias("c")).collect()]
    sem_cand = sum(c * (c - 1) // 2 for c in sizes)
    return {
        "ngram_jaccard_banded": {
            "recall": pair_recall("ngram_jaccard_banded"),
            "candidate_frac": round(ngram_cand / (n * (n - 1) / 2), 6),
        },
        "cosine_near_dup_pairs_lsh": {
            "recall": pair_recall("cosine_near_dup_pairs_lsh"),
            "candidate_frac": round(cos_cand / (nv * (nv - 1) / 2), 6),
        },
        "semantic_dedup_pairs": {
            "recall": pair_recall("semantic_dedup_pairs"),
            "candidate_frac": round(sem_cand / (nv * (nv - 1) / 2), 6),
        },
    }


#: The last two approximate dials whose quality lived only in pytest
#: (round-10 judge punch #2): record the OBSERVED max relative error in
#: the artifact beside the banded/ANN entries, so one file carries every
#: approximate query's measured quality. Ceilings mirror the pytest
#: contracts: percentile_approx(accuracy=10_000) ≤1% of the exact
#: interpolated percentile (tests/test_coverage_extras.py);
#: approx_count_distinct(rsd=0.02) within 3·rsd = 6% of exact (the same
#: bound the query's own within_tolerance attestation asserts).
APPROX_DIALS = {
    "approx_price_percentiles": {"exact_twin": "exact_price_percentiles",
                                 "rel_err_ceiling": 0.01},
    # the HLL dial has no declared exact twin (its own output is the
    # within-tolerance attestation); rel_err is measured against
    # countDistinct(user_id) recomputed per event_type below — label the
    # truth source honestly (r10 advisor: it used to claim itself)
    "approx_distinct_users": {"exact_twin": "countDistinct(user_id) recomputed",
                              "rel_err_ceiling": 0.06},
}


def approx_dial_quality(spark, sf_dir: str, dfs: dict) -> dict[str, dict]:
    """{dial query → {rel_err}} for APPROX_DIALS — the observed maximum
    relative error of the sketch against its exact value, over every
    group × statistic, at this sf_dir."""
    from pyspark.sql import functions as F

    from dipa_collaborative_pulsar_idps_spark.tables import Tables

    # percentile_approx vs exact interpolated percentiles, per return flag
    ap = {r["l_returnflag"]: r for r in dfs["approx_price_percentiles"].collect()}
    ex = {r["l_returnflag"]: r for r in dfs["exact_price_percentiles"].collect()}
    pct_err = max(
        abs(ap[k][f"p{q}_approx"] - ex[k][f"p{q}"]) / ex[k][f"p{q}"]
        for k in ex
        for q in (50, 95, 99)
    )
    # approx_count_distinct vs exact distinct, per event type (the declared
    # query's output carries only the attestation boolean, so the raw
    # sketch value is recomputed here with the same rsd)
    hll = (
        Tables(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("a"),
            F.countDistinct("user_id").alias("e"),
        )
        .collect()
    )
    hll_err = max(abs(r["a"] - r["e"]) / r["e"] for r in hll)
    return {
        "approx_price_percentiles": {"rel_err": round(pct_err, 6)},
        "approx_distinct_users": {"rel_err": round(hll_err, 6)},
    }


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .getOrCreate()
    )  # vanilla, like the driver
    from dipa_collaborative_pulsar_idps_spark.queries import REGISTRY
    from dipa_collaborative_pulsar_idps_spark.queries.registry import _load_all
    from dipa_collaborative_pulsar_idps_spark.testing import (
        compare_query,
        duckdb_connection,
    )

    _load_all()
    con = duckdb_connection(sf_dir)
    out, n_ok, n_fail = {}, 0, 0
    ann_dfs: dict[str, object] = {}
    dial_dfs: dict[str, object] = {}
    t0 = time.time()
    for name, spec in sorted(REGISTRY.items()):
        try:
            df = spec.fn(spark, sf_dir)
            if name in ANN_RECALL_FLOORS or name in ANN_EXHAUSTIVE_TWINS.values():
                ann_dfs[name] = df
            if name in BANDED_DIALS or any(
                name == c["exact_twin"] for c in BANDED_DIALS.values()
            ):
                dial_dfs[name] = df
            if name in ("approx_price_percentiles", "exact_price_percentiles"):
                dial_dfs[name] = df
            if spec.oracle is None:
                out[name] = {"status": "rows_only", "rows": df.count()}
                n_ok += 1
            else:
                r = compare_query(name, df, con, spec.oracle)
                out[name] = {"status": "ok" if r.ok else "FAIL", "detail": r.detail}
                n_ok += r.ok
                n_fail += not r.ok
        except Exception as e:  # noqa: BLE001 - gate reports, not raises
            out[name] = {"status": "FAIL", "detail": f"EXCEPTION: {e}"}
            n_fail += 1
        print(name, out[name]["status"], flush=True)

    # ANN recall (round 6): the 4 production *_neighbors queries ride the
    # rows-only lane in every driver sample — their recall guarantee lived
    # only in pytest. Record recall@5 vs the *_exhaustive twin (itself
    # oracle-checked above) right in the parity artifact, asserted against
    # the same floors the pytest contracts use.
    from dipa_collaborative_pulsar_idps_spark.functions.similarity import (
        recall_at_k,
    )

    for name, floor in sorted(ANN_RECALL_FLOORS.items()):
        twin = ANN_EXHAUSTIVE_TWINS[name]
        if name not in ann_dfs or twin not in ann_dfs:
            continue  # a FAIL above already covers the missing side
        # A query stored in ann_dfs may still have FAILed afterwards (its
        # count()/compare threw) — it's already in n_fail, so demoting it
        # again would double-count and drive n_ok negative. Only queries
        # that passed above can move from the ok to the fail tally here.
        if out[name]["status"] == "FAIL" or out[twin]["status"] == "FAIL":
            continue
        try:
            r = round(recall_at_k(ann_dfs[name], ann_dfs[twin], 5), 4)
            out[name]["recall_at_5"] = r
            out[name]["recall_floor"] = floor
            out[name]["recall_vs"] = twin
            if r < floor:
                out[name]["status"] = "FAIL"
                n_ok -= 1
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            out[name]["status"] = "FAIL"
            out[name]["detail"] = f"RECALL EXCEPTION: {e}"
            n_ok -= 1
            n_fail += 1
        print(f"{name} recall@5={out[name].get('recall_at_5')} "
              f"floor={floor}", flush=True)

    # Clustered-fixture recall (round 8): the artifact's corpus recall is a
    # regression floor on isotropic testdata embeddings; record the
    # QUALITY number from the deterministic clustered fixture beside it.
    try:
        clustered = clustered_ann_recalls(spark)
        for name, r in sorted(clustered.items()):
            if name not in out:
                continue
            floor = CLUSTERED_RECALL_FLOORS[name]
            out[name]["recall_clustered"] = round(r, 4)
            out[name]["recall_clustered_floor"] = floor
            if r < floor and out[name]["status"] != "FAIL":
                out[name]["status"] = "FAIL"
                n_ok -= 1
                n_fail += 1
            print(f"{name} recall_clustered={round(r, 4)} floor={floor}",
                  flush=True)
    except Exception as e:  # noqa: BLE001 - gate reports, not raises
        out["__clustered_recall__"] = {"status": "FAIL", "detail": f"EXCEPTION: {e}"}
        n_fail += 1

    # IVF+SQ8 scan fraction (r12): the composite's sub-linear claim as a
    # measured number (rows in probed lists / (queries × corpus)) beside
    # its recall entries — the banded-dial convention for the ANN family.
    try:
        name = "ann_topk_ivfsq_neighbors"
        if out.get(name, {}).get("status") not in (None, "FAIL"):
            from pyspark.sql import functions as F

            from dipa_collaborative_pulsar_idps_spark.config import SCALE
            from dipa_collaborative_pulsar_idps_spark.functions.sq import (
                ivfsq_scan_fraction,
            )
            from dipa_collaborative_pulsar_idps_spark.queries.datapipe3 import (
                _corpus,
                _ivfsq_build,
            )

            enc, cents, _bounds = _ivfsq_build(spark, sf_dir)
            emb = _corpus(spark, sf_dir)
            q = emb.where(F.col("vec_id") < 50).select(
                F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
            )
            frac = round(ivfsq_scan_fraction(enc, cents, q, SCALE.ivf_n_probe), 6)
            ceiling = 0.35  # n_probe/n_list = 0.25 + list-size skew margin
            out[name]["candidate_frac"] = frac
            out[name]["candidate_frac_ceiling"] = ceiling
            if frac > ceiling and out[name]["status"] != "FAIL":
                out[name]["status"] = "FAIL"
                n_ok -= 1
                n_fail += 1
            print(f"{name} candidate_frac={frac} ceiling={ceiling}", flush=True)
        # r13: the APPENDED index must stay sub-linear too — base+delta
        # union is hive-partitioned on list_id on both sides, so the
        # probe prunes across deltas; a regression here (e.g. a delta
        # layout that defeats pruning) shows up as frac → 1
        name = "ann_topk_ivfsq_incremental"
        if out.get(name, {}).get("status") not in (None, "FAIL"):
            from dipa_collaborative_pulsar_idps_spark.functions.sq import (
                load_ivfsq_index,
            )
            from dipa_collaborative_pulsar_idps_spark.queries.datapipe3 import (
                _incremental_ivfsq_index,
            )

            inc_path = _incremental_ivfsq_index(spark, sf_dir)
            enc_i, cents_i, _b = load_ivfsq_index(spark, inc_path)
            frac = round(ivfsq_scan_fraction(enc_i, cents_i, q, SCALE.ivf_n_probe), 6)
            out[name]["candidate_frac"] = frac
            out[name]["candidate_frac_ceiling"] = ceiling
            if frac > ceiling and out[name]["status"] != "FAIL":
                out[name]["status"] = "FAIL"
                n_ok -= 1
                n_fail += 1
            print(f"{name} candidate_frac={frac} ceiling={ceiling}", flush=True)
    except Exception as e:  # noqa: BLE001 - gate reports, not raises
        out["__ivfsq_scan_fraction__"] = {"status": "FAIL", "detail": f"EXCEPTION: {e}"}
        n_fail += 1

    # Exact-PCA variance accounting (r12): embedding_pca_project stays
    # rows-only (eigh isn't SQL), so record its measured k=16
    # reconstruction error AND the exactness attestation — recon MSE must
    # equal total_variance × (1 − Σ explained ratios) to float precision,
    # an identity that only holds when the Gram moments, eigh, projection,
    # and reconstruction are all mutually exact.
    try:
        name = "embedding_pca_project"
        if out.get(name, {}).get("status") not in (None, "FAIL"):
            import numpy as np
            from pyspark.sql import functions as F

            from dipa_collaborative_pulsar_idps_spark.functions.projection import (
                gram_moments,
                pca_project,
                pca_reconstruct,
                train_pca_exact,
            )
            from dipa_collaborative_pulsar_idps_spark.queries.datapipe3 import _corpus

            emb = _corpus(spark, sf_dir)
            mean, comp, ratio = train_pca_exact(emb, dim=64, k=16)
            recon = pca_reconstruct(pca_project(emb, mean, comp), mean, comp)
            sq = F.aggregate(
                F.zip_with("e", "recon", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            mse = float(
                emb.join(recon, "vec_id").agg(F.avg(sq)).collect()[0][0]
            )
            n, s, g = gram_moments(emb, 64)
            total_var = float(np.trace(g) / n - (s / n) @ (s / n))
            acct = abs(mse - total_var * (1.0 - float(ratio.sum()))) / total_var
            out[name]["recon_mse"] = round(mse, 8)
            out[name]["explained_ratio_sum"] = round(float(ratio.sum()), 6)
            out[name]["var_accounting_rel_err"] = round(acct, 12)
            if acct > 1e-6 and out[name]["status"] != "FAIL":
                out[name]["status"] = "FAIL"
                n_ok -= 1
                n_fail += 1
            print(
                f"{name} recon_mse={round(mse, 6)} "
                f"explained={round(float(ratio.sum()), 4)} "
                f"acct_err={acct:.2e}",
                flush=True,
            )
    except Exception as e:  # noqa: BLE001 - gate reports, not raises
        out["__pca_quality__"] = {"status": "FAIL", "detail": f"EXCEPTION: {e}"}
        n_fail += 1

    # Banded-dial quality (round 9): the two remaining rows-only pair
    # dials get their recall + candidate-mass fraction recorded beside the
    # ANN entries, gated on corpus regression bounds.
    try:
        needed = set(BANDED_DIALS) | {c["exact_twin"] for c in BANDED_DIALS.values()}
        if needed <= set(dial_dfs) and all(
            out.get(q, {}).get("status") != "FAIL" for q in needed
        ):
            quality = banded_dial_quality(spark, sf_dir, dial_dfs)
            for name, q in sorted(quality.items()):
                cfg = BANDED_DIALS[name]
                out[name]["recall"] = q["recall"]
                out[name]["recall_floor"] = cfg["recall_floor"]
                out[name]["recall_vs"] = cfg["exact_twin"]
                out[name]["candidate_frac"] = q["candidate_frac"]
                out[name]["candidate_frac_ceiling"] = cfg["candidate_frac_ceiling"]
                bad = (
                    q["recall"] is not None and q["recall"] < cfg["recall_floor"]
                ) or q["candidate_frac"] > cfg["candidate_frac_ceiling"]
                if bad and out[name]["status"] != "FAIL":
                    out[name]["status"] = "FAIL"
                    n_ok -= 1
                    n_fail += 1
                print(
                    f"{name} recall={q['recall']} floor={cfg['recall_floor']} "
                    f"candidate_frac={q['candidate_frac']} "
                    f"ceiling={cfg['candidate_frac_ceiling']}",
                    flush=True,
                )
    except Exception as e:  # noqa: BLE001 - gate reports, not raises
        out["__banded_dial_quality__"] = {"status": "FAIL", "detail": f"EXCEPTION: {e}"}
        n_fail += 1

    # Approx-dial quality (round 10): percentile_approx and
    # approx_count_distinct get their observed max relative error recorded
    # beside the banded/ANN entries, gated on the pytest-contract ceilings.
    try:
        needed = {"approx_price_percentiles", "exact_price_percentiles",
                  "approx_distinct_users"}
        if {"approx_price_percentiles", "exact_price_percentiles"} <= set(
            dial_dfs
        ) and all(out.get(q, {}).get("status") != "FAIL" for q in needed):
            quality = approx_dial_quality(spark, sf_dir, dial_dfs)
            for name, q in sorted(quality.items()):
                cfg = APPROX_DIALS[name]
                out[name]["rel_err"] = q["rel_err"]
                out[name]["rel_err_ceiling"] = cfg["rel_err_ceiling"]
                out[name]["rel_err_vs"] = cfg["exact_twin"]
                if q["rel_err"] > cfg["rel_err_ceiling"]:
                    out[name]["status"] = "FAIL"
                    n_ok -= 1
                    n_fail += 1
                print(
                    f"{name} rel_err={q['rel_err']} "
                    f"ceiling={cfg['rel_err_ceiling']}",
                    flush=True,
                )
    except Exception as e:  # noqa: BLE001 - gate reports, not raises
        out["__approx_dial_quality__"] = {"status": "FAIL", "detail": f"EXCEPTION: {e}"}
        n_fail += 1

    artifact = {
        "round": rnd,
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "n_oracles": sum(1 for s in REGISTRY.values() if s.oracle is not None),
        "n_pass": n_ok,
        "n_fail": n_fail,
        "elapsed_sec": round(time.time() - t0, 1),
        "results": out,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"PARITY_r{rnd}.json",
    )
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"\n{n_ok}/{len(out)} pass, {n_fail} fail -> {path}")
    from dipa_collaborative_pulsar_idps_spark.queries import clear_all_caches

    clear_all_caches()  # release memoized persisted frames for this sf_dir
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
