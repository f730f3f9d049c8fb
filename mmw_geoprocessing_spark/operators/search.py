"""Corpus keyword search: BM25-ranked top-k documents per query.

The retrieval step every corpus-curation / eval pipeline needs ("find
the documents about X in the crawl"): score documents against a small
set of keyword queries with BM25 (Robertson et al., Okapi) and return
the top-k per query.

Cross-engine exactness: BM25's two non-integer ingredients are handled
the same way the rest of this engine handles transcendental /
float-fold hazards (see ``text_analysis.unigram_surprisal_scores``):

- **idf in exact integer bits.** ``idf = log2((N - df + .5)/(df + .5))``
  is replaced by ``bitlen(2N - 2df + 1) - bitlen(2df + 1)`` — the
  binary-digit-count difference, an integer within +-1 bit of the true
  log2, identical in both engines (float ``ln`` differs by ulps between
  libm and DuckDB and cannot be value-hashed).
- **tf-saturation as one exact integer division.** With k1 = 6/5 and
  b = 3/4, ``(k1+1)*tf / (tf + k1*(1 - b + b*dl/avgdl))`` multiplied
  through by ``20*T`` (T = total corpus tokens, avgdl = T/N) becomes
  ``44*tf*T / (20*T*tf + 6*T + 18*dl*N)`` — all-BIGINT numerator and
  denominator, scaled by 1000 and floor-divided (Spark ``DIV`` ==
  DuckDB ``//`` on non-negative BIGINT). Per-term scores are exact
  integers, so the per-document SUM is order-free and hash-exact.
  (Headroom: 44e3 * tf * T < 2^63 holds through the 100x replica's
  T ~ 5e7; a production deployment at larger T swaps the scaled
  integer division for a DOUBLE one — same plan, same ranking to
  within the scale quantum.)

100 TB shape: the corpus is scanned for (a) the query-term postings —
explode filtered by ``term IN (...)`` before any shuffle, with the
per-doc length riding along as a carried constant so no corpus-sized
doc-length join exists — and (b) a zero-shuffle 1-row totals aggregate
(N, total tokens), the corpus statistic a deployment persists at
ingest alongside the other PlanCache indexes. df reduces to one row
per query term and broadcasts back; the final top-k is a per-query
window over only the matched docs (WindowGroupLimit prunes to k per
partition before the shuffle). No all-pairs, no global sort, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# (query_id, [terms]) — fixed registered query set over the synthetic
# corpus vocabulary. Terms are lowercase single words by construction.
QUERIES: list[tuple[str, list[str]]] = [
    ("q_hash_join", ["hash", "join"]),
    ("q_sort_merge", ["sort", "merge", "join"]),
    ("q_window_scan", ["window", "filter", "scan"]),
    ("q_vector_batch", ["vector", "batch", "column"]),
    # 'dup' is the fixture corpus's one rare word (df 25/500) — the one
    # query with a strongly positive idf. The others exercise the true
    # Robertson negative-idf regime (df > N/2): scores go negative but
    # rank identically in both engines; a deployment wanting Lucene's
    # non-negative variant swaps the idf expression for
    # bitlen(2N+2) - bitlen(2df+1), same plan.
    ("q_dup_key", ["dup", "key"]),
]

SCALE = 1000
TOP_K = 10


def _query_terms_df(spark: SparkSession):
    rows = [(qid, t) for qid, terms in QUERIES for t in terms]
    return spark.createDataFrame(rows, "query_id string, term string")


def bm25_topk(
    spark: SparkSession, documents: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Top-``k`` documents per registered query, BM25-ranked.

    Output: ``(query_id, doc_id, rank, score_scaled, n_terms_matched)``
    where ``score_scaled`` is the exact-integer BM25 score (idf-bits *
    1000*tf-part, summed over matched terms) and ``rank`` orders by
    (score desc, doc_id) within each query.
    """
    qterms = _query_terms_df(spark)
    all_terms = sorted({t for _, terms in QUERIES for t in terms})

    toks = documents.select(
        F.col("doc_id"),
        F.split(F.lower(F.col("text")), " ").alias("w"),
    )
    # corpus totals: zero-shuffle 1-row aggregate, broadcast back
    totals = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("w")).alias("t_tokens"),
    )

    # postings restricted to query terms BEFORE any shuffle; the doc
    # length rides along through the explode (max() of a per-doc
    # constant) so no corpus-sized doc-length join is ever needed
    tf = (
        toks.select(
            "doc_id", F.size("w").alias("dl"), F.explode("w").alias("term")
        )
        .filter(F.col("term").isin(all_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(totals))
    )
    idf_bits = F.length(
        F.bin(2 * F.col("n_docs") - 2 * F.col("df") + 1)
    ) - F.length(F.bin(2 * F.col("df") + 1))
    num = F.lit(44 * SCALE) * F.col("tf") * F.col("t_tokens")
    den = (
        F.lit(20) * F.col("t_tokens") * F.col("tf")
        + F.lit(6) * F.col("t_tokens")
        + F.lit(18) * F.col("dl") * F.col("n_docs")
    )
    doc_scores = (
        scored.withColumn("idf_bits", idf_bits.cast("bigint"))
        .withColumn("num", num)
        .withColumn("den", den)
        # DIV = exact 64-bit integer division (matches DuckDB // on the
        # non-negative operands here)
        .withColumn("term_score", F.expr("idf_bits * (num DIV den)"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("term_score").alias("score_scaled"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_scaled").desc(), F.col("doc_id").asc()
    )
    return (
        doc_scores.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score_scaled", "n_terms_matched")
    )


def bm25_topk_sql(k: int = TOP_K, table: str = "documents") -> str:
    """DuckDB twin: identical tokenization, integer-bits idf, scaled
    integer tf-part, per-query ROW_NUMBER top-k."""
    qvals = ", ".join(
        f"('{qid}', '{t}')" for qid, terms in QUERIES for t in terms
    )
    all_terms = sorted({t for _, terms in QUERIES for t in terms})
    inlist = ", ".join(f"'{t}'" for t in all_terms)
    return f"""
    WITH q(query_id, term) AS (VALUES {qvals}),
    dw AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM {table}),
    dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM dw),
    totals AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS t_tokens
        FROM dl
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(w) AS term FROM dw)
        WHERE term IN ({inlist})
        GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               (length(bin(2 * n_docs - 2 * df.df + 1))
                - length(bin(2 * df.df + 1)))
               * ((44 * {SCALE} * tf.tf * t_tokens)
                  // (20 * t_tokens * tf.tf + 6 * t_tokens
                      + 18 * dl.dl * n_docs)) AS term_score
        FROM tf
        JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
        CROSS JOIN totals
    ),
    doc_scores AS (
        SELECT query_id, doc_id,
               CAST(SUM(term_score) AS BIGINT) AS score_scaled,
               CAST(COUNT(*) AS BIGINT) AS n_terms_matched
        FROM scored GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rank, score_scaled, n_terms_matched
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score_scaled DESC, doc_id
        ) AS BIGINT) AS rank
        FROM doc_scores
    )
    WHERE rank <= {k}
    """
