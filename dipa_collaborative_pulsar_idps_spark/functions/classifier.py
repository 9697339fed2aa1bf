"""Hashing-trick linear classifier inference — the fasttext-shaped quality
filter every large curation pipeline runs over its documents (CCNet/RefinedWeb
style: score = w · φ(text) with φ the hashed bag-of-tokens, keep/drop by
sign).

Design for 100 TB:
- featurization is one explode + md5 bucket per token, all JVM codegen
  (md5/conv/pmod) — no Python in the hot path, no vocabulary shuffle;
- the weight vector joins in as a BROADCAST table (2^16 buckets ≈ 1 MB):
  scoring is one shuffle on doc_id, exactly the word-count shape;
- the sandbox has no trained model, so the default weight per bucket is
  DERIVED from the bucket id itself ((bucket % 1001) - 500, i.e. a fixed
  pseudo-random projection) — deterministic, engine-portable (md5 is
  bit-identical everywhere), and summed as INTEGERS so the oracle compare
  is exact (one float division at the very end). `derived_weight_table`
  materializes the same weights as a real (bucket, weight) table so tests
  certify the broadcast-join production path against the fused form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: 2^16 hash buckets — fasttext's default bucket count is 2M; 65536 keeps the
#: derived-weight table broadcast-tiny while exercising the same plumbing.
N_BUCKETS = 65536

#: Integer weight scale: weight = ((bucket % W_MOD) - W_SHIFT) / W_SCALE.
W_MOD, W_SHIFT, W_SCALE = 1001, 500, 1000


def token_buckets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, bucket int): one row per token, bucket = first 16 bits of
    md5(token). Empty-token filtering matches the whitespace tokenizer used
    across the text-analysis family; docs with no tokens produce no rows
    (and therefore no score — the keep/drop gate upstream already drops
    empty docs)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    return docs.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("tok")
    ).select(
        "id",
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int").alias("bucket"),
    )


def derived_weight_table(spark: SparkSession) -> DataFrame:
    """The default weight vector as a real (bucket, weight) table —
    what a trained model would supply. weight = ((bucket % 1001) - 500)/1000,
    a fixed pseudo-random projection in [-0.5, 0.5]."""
    return spark.range(N_BUCKETS).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.pmod(F.col("id"), F.lit(W_MOD)) - W_SHIFT) / W_SCALE).alias("weight"),
    )


def hashed_linear_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: DataFrame | None = None,
) -> DataFrame:
    """(id, n_tokens, score_raw, quality_score, quality_label): mean hashed
    token weight per document, keep/drop by sign.

    With ``weights`` (a (bucket, weight double) table): broadcast-join the
    vector into the token stream — the production path for a trained model;
    unknown buckets score 0. Without: the derived integer weights are fused
    into the expression (no join at all) and summed EXACTLY as BIGINT, so
    the result is bit-stable and ANSI-SQL-expressible; `score_raw` is that
    integer sum (NULL on the float path, where no exact integer exists).
    Either way: one shuffle, on the document key."""
    tb = token_buckets(docs, id_col, text_col)
    if weights is not None:
        scored = tb.join(F.broadcast(weights), "bucket", "left").select(
            "id", F.coalesce(F.col("weight"), F.lit(0.0)).alias("w")
        )
        agg = scored.groupBy("id").agg(
            F.count("*").alias("n_tokens"), F.sum("w").alias("wsum")
        )
        return agg.select(
            F.col("id"),
            "n_tokens",
            F.lit(None).cast("bigint").alias("score_raw"),
            (F.col("wsum") / F.col("n_tokens")).alias("quality_score"),
            F.when(F.col("wsum") > 0, "keep").otherwise("drop").alias("quality_label"),
        )
    w = (F.pmod(F.col("bucket"), F.lit(W_MOD)) - W_SHIFT).cast("bigint")
    agg = tb.select("id", w.alias("w")).groupBy("id").agg(
        F.count("*").alias("n_tokens"), F.sum("w").alias("score_raw")
    )
    return agg.select(
        "id",
        "n_tokens",
        "score_raw",
        # No ROUND: the single division of exact integers is bit-identical
        # in every IEEE engine, while ROUND at a tie is not (Spark HALF_UP
        # vs DuckDB half-even disagreed on 5225/80000 at sf0.001).
        (F.col("score_raw") / (F.col("n_tokens") * float(W_SCALE))).alias(
            "quality_score"
        ),
        F.when(F.col("score_raw") > 0, "keep").otherwise("drop").alias("quality_label"),
    )


def hashed_linear_score_expr(text_col: str):
    """The scorer as a single stateless Column (NULL for token-less docs):
    an `aggregate` HOF accumulates the same EXACT integer weights the
    fused batch path sums, then one division — bit-identical to
    `hashed_linear_score(...)`'s quality_score (pytest-pinned).

    This is the STREAMING/map-only form: no explode, no groupBy, no state
    — it drops into `where`/`withColumn` on an unbounded stream or inside
    another aggregation. The HOF lambda is interpreted per token
    (CodegenFallback), so for corpus-scale BATCH scoring prefer the
    explode + shuffle form; per-document streaming gates are exactly
    where the interpreted cost is irrelevant and statelessness is the
    point."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")

    def w(tok):
        bucket = F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("bigint")
        return F.pmod(bucket, F.lit(W_MOD)) - W_SHIFT

    total = F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + w(t))
    n = F.size(toks)
    return F.when(n > 0, total / (n * float(W_SCALE)))
