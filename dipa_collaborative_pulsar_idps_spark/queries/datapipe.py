"""Training-data-pipeline operators over documents/embeddings (SURVEY.md §7
Phase 6): dedup, text analysis, similarity search. Batch 1 — exact/portable
operators with DuckDB oracles; LSH/MinHash variants live in
``functions/dedup.py`` and are registered with weaker checks where the
candidate set is approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import SCALE
from ..tables import Tables
from .registry import query

# ---------------------------------------------------------------------------
# Text analysis: token counting + quality scoring (built-ins only — stays in
# whole-stage codegen, no Python in the hot path).
# ---------------------------------------------------------------------------


@query(
    "text_token_stats",
    survey="J10,J11,ext-text",
    oracle="""
SELECT doc_id,
       LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS n_tokens,
       LENGTH(text) AS n_chars_computed,
       n_chars
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    return t.documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_computed"),
        "n_chars",
    )


@query(
    "text_quality_score",
    survey="ext-text",
    oracle="""
WITH tok AS (
    SELECT doc_id, lang, n_chars,
           LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS tokens
    FROM documents
)
SELECT doc_id, lang,
       LEN(tokens) AS n_tokens,
       CAST(n_chars AS DOUBLE) / LEN(tokens) AS avg_token_len,
       LEN(LIST_FILTER(tokens, x -> x IN ('the', 'a', 'of', 'and', 'to')))
           * 1.0 / LEN(tokens) AS stopword_ratio
FROM tok
WHERE LEN(tokens) > 0
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword-ratio quality signals (all JVM-side built-ins)."""
    t = Tables(spark, sf_dir)
    stop = ("the", "a", "of", "and", "to")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = t.documents.select("doc_id", "lang", "n_chars", toks.alias("tokens")).where(
        F.size("tokens") > 0
    )
    stop_arr = F.array(*[F.lit(s) for s in stop])
    return d.select(
        "doc_id",
        "lang",
        F.size("tokens").alias("n_tokens"),
        (F.col("n_chars").cast("double") / F.size("tokens")).alias("avg_token_len"),
        (
            F.size(F.filter(F.col("tokens"), lambda x: F.array_contains(stop_arr, x)))
            * F.lit(1.0)
            / F.size("tokens")
        ).alias("stopword_ratio"),
    )


# ---------------------------------------------------------------------------
# Exact deduplication: content-hash groupBy (the 100 TB-scale baseline —
# one shuffle on md5(text)).
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_groups",
    survey="ext-dedup",
    oracle="""
SELECT MD5(text) AS content_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY MD5(text)
""",
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.documents.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


# ---------------------------------------------------------------------------
# Embedding norms (sanity surface for similarity search; full cosine top-k in
# batch 2 once DuckDB list-function parity is pinned).
# ---------------------------------------------------------------------------


@query(
    "text_repetition_score",
    survey="ext-text",
    oracle="""
WITH tok AS (
    SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS tokens
    FROM documents
), gr AS (
    SELECT doc_id, tokens,
           LIST_TRANSFORM(RANGE(1, GREATEST(LEN(tokens) - 1, 1)),
               i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2]) AS grams
    FROM tok WHERE LEN(tokens) >= 3
)
SELECT doc_id,
       LEN(grams) AS n_grams,
       ROUND(1.0 - CAST(LEN(LIST_DISTINCT(grams)) AS DOUBLE) / LEN(grams), 6)
           AS dup_gram_ratio,
       ROUND(CAST(LEN(tokens) - LEN(LIST_DISTINCT(tokens)) AS DOUBLE) / LEN(tokens), 6)
           AS dup_token_ratio
FROM gr
""",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals — the standard boilerplate/spam gates a
    curation pipeline runs beside length/stopword checks: fraction of
    duplicated 3-grams and duplicated tokens per document. Pure
    higher-order-function codegen over the scan (no shuffle, no Python);
    at 100 TB this is a map-only pass that composes into `curation_funnel`
    as one more pushable predicate."""
    t = Tables(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = t.documents.select("doc_id", toks.alias("tokens")).where(F.size("tokens") >= 3)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("tokens") - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.element_at("tokens", i),
            F.element_at("tokens", i + F.lit(1)),
            F.element_at("tokens", i + F.lit(2)),
        ),
    )
    g = d.select("doc_id", "tokens", grams.alias("grams"))
    return g.select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("grams")).cast("double") / F.size("grams"), 6
        ).alias("dup_gram_ratio"),
        F.round(
            (F.size("tokens") - F.size(F.array_distinct("tokens"))).cast("double")
            / F.size("tokens"),
            6,
        ).alias("dup_token_ratio"),
    )


def funnel_core(d: DataFrame) -> DataFrame:
    """Shared funnel tail over a pre-gated (doc_id, text, n_chars) frame:
    quality gates → exact content dedup (min doc_id per md5) → Knuth-hash
    split rollup. ONE definition for the plain and decontaminated funnels
    — a gate-threshold or split-hash change lands in both (and their
    oracles share `funnel_oracle` the same way)."""
    from pyspark.sql.window import Window

    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = d.select("doc_id", "text", "n_chars", toks.alias("tokens"))
    stop_arr = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to")])
    stop_hits = F.size(F.filter(F.col("tokens"), lambda x: F.array_contains(stop_arr, x)))
    quality = d.where(
        (F.size("tokens") >= 20)
        & (F.col("n_chars").cast("double") / F.size("tokens") <= 15.0)
        & (stop_hits * F.lit(1.0) / F.size("tokens") >= 0.01)
    )
    keep = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    deduped = quality.withColumn("keep_id", keep).where(F.col("doc_id") == F.col("keep_id"))
    bucket = F.pmod(F.col("doc_id").bitwiseAND(F.lit(2147483647)) * F.lit(2654435761), F.lit(100))
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    return (
        deduped.select(split.alias("split"), F.size("tokens").alias("n_tokens"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def funnel_oracle(tok_where: str, prefix_ctes: str = "") -> str:
    """The funnel tail's oracle SQL, parameterized by the gate WHERE (and
    optional prefix CTEs) — the SQL twin of :func:`funnel_core`."""
    return f"""
WITH {prefix_ctes}tok AS (
    SELECT doc_id, text, n_chars,
           LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS tokens
    FROM documents
    WHERE {tok_where}
), quality AS (
    SELECT * FROM tok
    WHERE LEN(tokens) >= 20
      AND CAST(n_chars AS DOUBLE) / LEN(tokens) <= 15.0
      AND LEN(LIST_FILTER(tokens, x -> x IN ('the','a','of','and','to')))
          * 1.0 / LEN(tokens) >= 0.01
), deduped AS (
    SELECT * FROM (
        SELECT doc_id, n_chars, tokens,
               MIN(doc_id) OVER (PARTITION BY MD5(text)) AS keep_id
        FROM quality
    ) WHERE doc_id = keep_id
)
SELECT CASE WHEN ((doc_id & 2147483647) * 2654435761) % 100 < 80 THEN 'train'
            WHEN ((doc_id & 2147483647) * 2654435761) % 100 < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEN(tokens)) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM deduped
GROUP BY split
"""


@query(
    "curation_funnel",
    survey="ext-text,ext-dedup,ext-curation",
    oracle=funnel_oracle("lang = 'en'"),
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data curation pipeline as ONE declarative query:
    language gate (the lang column an upstream langid pass materialized)
    → quality gate (length, avg-token-len, stopword-density) → exact dedup
    (keep the min doc_id per content hash) → deterministic Knuth-hash
    split stats.

    100 TB shape: the language + quality gates are map-side codegen over
    the scan (lang is a plain pushable predicate — with a lang-partitioned
    lake layout it prunes whole directories), dedup is the funnel's ONE
    wide shuffle — on md5(text), AFTER the gates have already discarded
    non-target rows, so the shuffle carries only survivors — and the split
    rollup is a 3-group partial aggregate. Filter-before-shuffle ordering
    is the whole game at scale; Catalyst keeps it because the gates are
    plain predicates."""
    t = Tables(spark, sf_dir)
    return funnel_core(t.documents.where(F.col("lang") == "en"))


@query(
    "stratified_sample_by_lang",
    survey="ext-curation",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE ((doc_id & 2147483647) * 2654435761) % 1000 < 200
GROUP BY lang
""",
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% per-language sample via the same engine-portable
    Knuth multiplicative hash as `deterministic_split` — the curation
    sampling primitive: reproducible across runs/engines/partitionings
    (unlike rand()-based `df.sample`), stratification is free because the
    hash is independent of lang. Map-side filter + tiny grouped count —
    the filter is a pushable arithmetic predicate at any scale."""
    t = Tables(spark, sf_dir)
    keep = F.pmod(F.col("doc_id").bitwiseAND(F.lit(2147483647)) * F.lit(2654435761), F.lit(1000)) < 200
    return (
        t.documents.where(keep)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
    )


#: Oracle for BOTH shard-packing queries (global-window form; interpolates
#: the shard-size dial so engine and oracle can't drift apart).
_SHARD_ORACLE = f"""
WITH tok AS (
    SELECT doc_id,
           LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS n_tokens
    FROM documents
), packed AS (
    SELECT doc_id, n_tokens,
           -- // (floor div): DuckDB CAST(x AS BIGINT) ROUNDS, Spark's cast
           -- truncates — integer division matches Spark exactly
           CAST((SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens) // {SCALE.shard_tokens} AS BIGINT)
               AS shard_id
    FROM tok
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
FROM packed GROUP BY shard_id
"""


@query(
    "token_shard_assignment",
    survey="ext-curation",
    oracle=_SHARD_ORACLE,
)
def token_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing: documents in deterministic doc_id order are
    packed greedily into ~4096-token shards (shard = floor of the
    EXCLUSIVE running token total / target), then summarized per shard.

    Scale note: an unpartitioned window is a SINGLE-PARTITION operator in
    Spark — the whole table flows through one task for the running total
    (Spark logs a WARN for exactly this). Fine at test SFs; a wall at
    100 TB. This query stays as the exact-global-semantics certifier;
    `token_shard_assignment_scalable` below computes the IDENTICAL result
    with two narrow passes (per-range partial sums + broadcast prefix
    offsets) and is the production path."""
    t = Tables(spark, sf_dir)
    from pyspark.sql.window import Window

    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = t.documents.select("doc_id", F.size(toks).alias("n_tokens"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    packed = d.withColumn(
        "shard_id",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(SCALE.shard_tokens))
        .cast("long"),
    )
    return packed.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("shard_tokens")
    )


@query(
    "token_shard_assignment_scalable",
    survey="ext-curation",
    oracle=_SHARD_ORACLE,
)
def token_shard_assignment_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of `token_shard_assignment`: the SAME global greedy
    packing (oracle is the global-window form — value equality certifies
    the decomposition is exact), computed WITHOUT a single-partition
    window over the corpus.

    Classic distributed prefix sum:
      1. bucket docs into doc_id-contiguous ranges (`doc_id DIV range`) —
         contiguity makes per-range running totals composable;
      2. per-range token totals (tiny: one row per range);
      3. exclusive prefix-sum the totals — a window over #ranges rows
         only (the one residual serial step, corpus-size/range in size,
         and itself recursively decomposable if ranges ever outgrow a
         task);
      4. broadcast-join the offsets back and offset each range's LOCAL
         running total (window partitioned by range — parallel).

    The big table is touched by exactly one partitioned window + one
    broadcast join: no corpus-wide single-partition exchange anywhere.
    `DIV` keeps shard arithmetic in exact integer space (double division
    loses exactness once running totals pass 2^53 — real at 100 TB).
    """
    t = Tables(spark, sf_dir)
    from pyspark.sql.window import Window

    range_width = SCALE.pack_range_width  # docs per contiguous range
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = t.documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.expr(f"doc_id DIV {range_width}").alias("range_id"),
    )
    totals = d.groupBy("range_id").agg(F.sum("n_tokens").alias("range_tokens"))
    w_pfx = (
        Window.orderBy("range_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "range_id",
        F.coalesce(F.sum("range_tokens").over(w_pfx), F.lit(0)).alias("range_offset"),
    )
    w_local = (
        Window.partitionBy("range_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = (
        d.join(F.broadcast(offsets), "range_id")
        .withColumn("excl_total", F.col("range_offset") + F.sum("n_tokens").over(w_local) - F.col("n_tokens"))
        .withColumn("shard_id", F.expr(f"excl_total DIV {SCALE.shard_tokens}"))
    )
    return packed.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("shard_tokens")
    )


@query(
    "embedding_norms",
    survey="ext-sim",
    oracle="""
SELECT vec_id, label,
       SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm,
       LEN(embedding) AS dim
FROM embeddings
""",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    sq = F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double"))
    return t.embeddings.select(
        "vec_id",
        "label",
        F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )
