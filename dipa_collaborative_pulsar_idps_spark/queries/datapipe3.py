"""Training-data-pipeline operators, batch 3: approximate dedup/similarity
(MinHash-LSH, SimHash, LSH-ANN). MinHash-LSH carries the exact brute-force
oracle (candidates are exact-verified; recall at threshold 0.8 is
1-(1-0.8²)^16 ≈ 1-3e-8 per pair — and deterministic hashes mean a local
sf0.01 match implies a driver match). SimHash/ANN are genuinely
non-SQL-expressible (xxhash64/hyperplane families) → rows-only checks +
property tests in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup import minhash_near_dup_pairs, simhash64
from ..functions.similarity import ann_topk_lsh, as_double
from ..tables import Tables
from .registry import query


@query(
    "minhash_lsh_near_dups",
    survey="ext-dedup",
    oracle="""
WITH sh AS (
    SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(tokens) - 1, 1)),
        i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2])) AS shingles
    FROM (SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS tokens
          FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(LEN(LIST_INTERSECT(a.shingles, b.shingles)) AS DOUBLE)
           / (LEN(a.shingles) + LEN(b.shingles) - LEN(LIST_INTERSECT(a.shingles, b.shingles)))
           AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE LEN(a.shingles) > 0 AND LEN(b.shingles) > 0
  AND CAST(LEN(LIST_INTERSECT(a.shingles, b.shingles)) AS DOUBLE)
      / (LEN(a.shingles) + LEN(b.shingles) - LEN(LIST_INTERSECT(a.shingles, b.shingles))) >= 0.8
""",
)
def minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms) → LSH(16 bands × 2 rows) → exact-Jaccard ≥ 0.8.
    The oracle is the brute-force all-pairs scan; LSH replaces the O(n²)
    join with a bucket join + verification at scale."""
    t = Tables(spark, sf_dir)
    return minhash_near_dup_pairs(t.documents, threshold=0.8)


@query("approx_distinct_users", survey="D4-scale")
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) beside the exact D4 — the
    100 TB cardinality path. No SQL oracle: DuckDB's sketch differs by
    design; tests assert it tracks the exact count within rsd bounds."""
    t = Tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@query("simhash_fingerprints", survey="ext-dedup")
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (no SQL oracle: xxhash64 family).
    Property-tested in tests/test_dedup.py: planted near-dups have small
    Hamming distance, unrelated docs large."""
    t = Tables(spark, sf_dir)
    return simhash64(t.documents).select(F.col("id").alias("doc_id"), "simhash")


@query("ann_topk_ivf_neighbors", survey="ext-sim")
def ann_topk_ivf_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means inverted lists, seeded/deterministic) top-5 neighbors
    for the first 50 query vectors, probing 4 of 16 lists (~25% scan).
    No SQL oracle (approximate + iterative k-means); recall vs the exact
    baseline asserted in tests/test_dedup.py."""
    from ..functions.ivf import build_ivf_index, ivf_search

    t = Tables(spark, sf_dir)
    n_part = spark.sparkContext.defaultParallelism
    emb = t.embeddings.repartition(n_part, "vec_id").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    q = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    assigned, centroids = build_ivf_index(emb, dim=64, n_list=16)
    return ivf_search(assigned, centroids, q, k=5, n_probe=4).select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rk"
    )


@query("ann_topk_lsh_neighbors", survey="ext-sim")
def ann_topk_lsh_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 cosine neighbors for the first 50 query vectors via
    8 random hyperplanes + multi-probe radius 2. No SQL oracle (approximate
    by design); recall vs the exact baseline is asserted in tests."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", as_double(F.col("embedding")).alias("e"))
    q = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    return ann_topk_lsh(emb, q, dim=64, k=5, n_planes=8, probe_radius=2).select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rk"
    )
