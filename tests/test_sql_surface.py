"""The spark.sql() surface: the engine's tables register as views and the
headline semantics are expressible as plain Spark SQL, agreeing exactly
with the DataFrame forms (same expressions → same Catalyst plans → same
results, bit-for-bit). A reference user who prefers SQL strings over the
DataFrame API gets the same engine.
"""

from __future__ import annotations

from dipa_collaborative_pulsar_idps_spark.queries import REGISTRY
from dipa_collaborative_pulsar_idps_spark.queries.registry import _load_all
from dipa_collaborative_pulsar_idps_spark.tables import register_views

_load_all()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_twin_tpch_q1(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               SUM(l_extendedprice) AS sum_base_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df = REGISTRY["tpch_q1_pricing_summary"].fn(spark, sf_dir).select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "count_order"
    )
    assert _rows(sql.select(df.columns)) == _rows(df)


def test_sql_twin_revenue_by_nation_region(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT r_name AS region, n_name AS nation,
               SUM(o_totalprice) AS revenue, COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        """
    )
    df = REGISTRY["revenue_by_nation_region"].fn(spark, sf_dir)
    assert _rows(sql.select(df.columns)) == _rows(df)


def test_sql_twin_exact_dedup(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT MD5(text) AS content_hash, MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY MD5(text)
        """
    )
    df = REGISTRY["dedup_exact_groups"].fn(spark, sf_dir)
    assert _rows(sql.select(df.columns)) == _rows(df)


def test_sql_twin_vocab_top_terms(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        WITH ex AS (
            SELECT doc_id,
                   EXPLODE(FILTER(SPLIT(text, ' '), x -> x != '')) AS term
            FROM documents
        ), stats AS (
            SELECT term, COUNT(*) AS collection_freq,
                   COUNT(DISTINCT doc_id) AS doc_freq
            FROM ex GROUP BY term
        )
        SELECT term, collection_freq, doc_freq,
               ROUND(LN(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                        / doc_freq), 6) AS idf
        FROM stats
        ORDER BY collection_freq DESC, term
        LIMIT 50
        """
    )
    df = REGISTRY["vocab_top_terms"].fn(spark, sf_dir)
    assert _rows(sql.select(df.columns)) == _rows(df)


def test_sql_twin_embedding_quantize(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        WITH v AS (
            SELECT vec_id, label,
                   TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e,
                   ARRAY_MAX(TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE))))
                       AS full_max
            FROM embeddings
        )
        SELECT vec_id, label, ROUND(full_max, 6) AS max_abs,
               AGGREGATE(TRANSFORM(e, x -> FLOOR(x * 127.0D / full_max + 0.5D)),
                         0L, (acc, x) -> acc + x) AS q_sum,
               ARRAY_MAX(TRANSFORM(e,
                         x -> ABS(FLOOR(x * 127.0D / full_max + 0.5D)))) AS q_max_abs
        FROM v
        """
    )
    df = REGISTRY["embedding_quantize_int8"].fn(spark, sf_dir)
    assert _rows(sql.select(df.columns)) == _rows(df)


def test_sql_twin_gopher_rules(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        WITH tok AS (
            SELECT doc_id, filter(split(text, ' '), x -> x != '') AS tokens
            FROM documents
        ), m AS (
            SELECT doc_id,
                   size(tokens) AS n_words,
                   aggregate(tokens, 0L, (a, x) -> a + length(x)) AS n_word_chars,
                   size(filter(tokens, x -> x rlike '[a-z]')) AS n_alpha_words,
                   size(filter(tokens,
                        x -> array_contains(array('the','be','to','of','and','that','have','with'), x)))
                       AS n_stopwords
            FROM tok
        )
        SELECT doc_id, n_words, n_stopwords,
               CAST(n_word_chars AS DOUBLE) / n_words AS mean_word_len,
               CAST(n_alpha_words AS DOUBLE) / n_words AS frac_alpha_words,
               (n_words BETWEEN 50 AND 100000
                AND CAST(n_word_chars AS DOUBLE) / n_words BETWEEN 3 AND 10
                AND CAST(n_alpha_words AS DOUBLE) / n_words >= 0.8
                AND n_stopwords >= 2) AS passes_gopher
        FROM m
        """
    )
    df = REGISTRY["gopher_quality_rules"].fn(spark, sf_dir)
    assert _rows(sql.select(df.columns)) == _rows(df)


def test_sql_twin_bm25(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        WITH dlen AS (
            SELECT doc_id, filter(split(text, ' '), x -> x != '') AS tokens
            FROM documents
        ), d2 AS (
            SELECT doc_id, size(tokens) AS dl, tokens FROM dlen
        ), stats AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
            FROM d2
        ), tf AS (
            SELECT doc_id, dl, t, COUNT(*) AS tf
            FROM (SELECT doc_id, dl, explode(tokens) AS t FROM d2)
            WHERE t IN ('join', 'vector', 'slow')
            GROUP BY doc_id, dl, t
        ), dft AS (
            SELECT t, COUNT(*) AS df FROM tf GROUP BY t
        )
        SELECT tf.doc_id,
               COUNT(*) AS n_terms_matched,
               ROUND(SUM(
                   LN(1 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))
               ), 6) AS bm25
        FROM tf JOIN dft USING (t) CROSS JOIN stats
        GROUP BY tf.doc_id
        """
    )
    df = REGISTRY["bm25_retrieval"].fn(spark, sf_dir)
    assert _rows(sql.select(df.columns)) == _rows(df)


def test_sql_twin_weighted_doc_sample(spark, sf_dir):
    """The weighted Poisson subsample is plain Spark SQL too (md5/conv/
    least are SQL functions) — and the IEEE-exact predicate means the SQL
    string matches the DataFrame form row-for-row, not just statistically."""
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        WITH w AS (SELECT CAST(SUM(n_chars) AS DOUBLE) AS tot FROM documents)
        SELECT doc_id, n_chars,
               ROUND(LEAST(1.0D, 200 * CAST(n_chars AS DOUBLE) / w.tot), 9)
                   AS incl_p
        FROM documents, w
        WHERE CAST(CONV(SUBSTRING(MD5(CAST(doc_id AS STRING)), 1, 15), 16, 10)
                   AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE)
              < LEAST(1.0D, 200 * CAST(n_chars AS DOUBLE) / w.tot)
        """
    )
    df = REGISTRY["weighted_doc_sample"].fn(spark, sf_dir)
    assert _rows(sql.select(df.columns)) == _rows(df)


def test_sql_twin_per_key_quantiles(spark, sf_dir):
    """The window-strategy per-key exact quantiles are plain Spark SQL —
    the same one-keyed-window plan, written as a query: row_number +
    per-key count, pick the bracketing rows, interpolate. Twin must match
    the declared per_customer_spend_quantiles row-for-row."""
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        WITH ranked AS (
            SELECT o_custkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice) - 1 AS rn,
                   COUNT(*) OVER (PARTITION BY o_custkey) AS n_g
            FROM orders
        ), picked AS (
            SELECT o_custkey, q, r,
                   MAX(CASE WHEN rn = FLOOR(r) THEN o_totalprice END) AS lo,
                   MAX(CASE WHEN rn = CEIL(r)  THEN o_totalprice END) AS hi
            FROM (
                SELECT *, (n_g - 1) * q AS r
                FROM ranked LATERAL VIEW EXPLODE(ARRAY(0.5D, 0.9D)) AS q
            )
            WHERE rn = FLOOR(r) OR rn = CEIL(r)
            GROUP BY o_custkey, q, r
        ), wide AS (
            SELECT o_custkey,
                   ROUND(MAX(CASE WHEN q = 0.5 THEN lo + (r - FLOOR(r)) * (hi - lo) END), 6)
                       AS p50_spend,
                   ROUND(MAX(CASE WHEN q = 0.9 THEN lo + (r - FLOOR(r)) * (hi - lo) END), 6)
                       AS p90_spend
            FROM picked GROUP BY o_custkey
        )
        SELECT c.o_custkey, c.n_orders, w.p50_spend, w.p90_spend
        FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) c
        JOIN wide w USING (o_custkey)
        """
    )
    df = REGISTRY["per_customer_spend_quantiles"].fn(spark, sf_dir)
    assert _rows(sql.select(df.columns)) == _rows(df)
