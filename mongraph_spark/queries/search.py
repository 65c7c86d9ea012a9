"""Full-text relevance search over the ``documents`` table: BM25 top-k.

The classic inverted-index scorer re-expressed as two scan-level passes —
no inverted index is materialized because at corpus scale the index IS a
(term, doc) shuffle, and for a bounded query-term set the tf counts are
computable map-side per document:

1. ``tf`` projection: one narrow map-only pass computing per-doc term
   frequencies for the fixed query terms (``F.filter`` over the token
   array — no explode, so no (term, doc) shuffle exists anywhere).
2. corpus stats: ONE single-row aggregate (N, total tokens, per-term
   document frequencies) from that projection, broadcast back with a 1×1
   cross join.
3. scoring: map-only BM25 over the same projection + broadcast stats;
   global top-k via orderBy+limit, which Spark executes as
   TakeOrderedAndProject (per-partition heaps merged on the driver — never
   a global sort).

The narrow tf projection is eagerly localCheckpoint'd so passes 2 and 3
share one corpus scan instead of re-reading the text column twice — the
same narrow-table checkpoint trade the simhash/fingerprint suites measure
in COVERAGE.md; the checkpointed table is (k+2) integers per doc, ~1e-4 of
corpus bytes.

Determinism note: IDF uses the Robertson–Sparck-Jones *rational* form
without the log — ``(N - df + 0.5) / (df + 0.5)`` — because both engines'
IEEE double add/mul/div are bit-deterministic while libm ``ln`` is not
guaranteed correctly rounded; the ranking is order-equivalent for a fixed
query (log is monotone) and the value hash stays engine-stable.  Per-term
contributions are summed in fixed query-term order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongraph_spark.sparkutil import read_table, scale_out

QUERY_TERMS = ["scan", "merge", "window", "shuffle"]
BM25_K1 = 1.2
BM25_B = 0.75
TOP_K = 25


def _tf_projection(docs: DataFrame) -> DataFrame:
    # SQL lambdas with unique variable names, NOT sibling Python lambdas:
    # PySpark 4.1 resolves same-arity Python lambdas in one projection to a
    # single body (see tests/test_spark_pitfalls.py)
    cols = [
        F.col("doc_id"),
        F.size(F.col("words")).cast("long").alias("dl"),
    ]
    for i, term in enumerate(QUERY_TERMS):
        cols.append(
            F.expr(
                f"cast(size(filter(words, w{i} -> w{i} = '{term}')) as long)"
            ).alias(f"tf_{i}")
        )
    return docs.withColumn(
        "words", F.split(F.lower(F.col("text")), r"\s+")
    ).select(*cols)


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scale_out(read_table(spark, sf_dir, "documents"))
    tf = _tf_projection(docs).localCheckpoint(eager=True)
    stats_aggs = [
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
    ]
    for i in range(len(QUERY_TERMS)):
        stats_aggs.append(
            F.sum((F.col(f"tf_{i}") > 0).cast("int")).cast("double").alias(f"df_{i}")
        )
    stats = tf.agg(*stats_aggs)
    scored = tf.crossJoin(F.broadcast(stats))
    # fixed-order sum of per-term BM25 contributions (rational IDF, see module doc)
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / (F.col("sum_dl") / F.col("n_docs"))
    )
    score = F.lit(0.0)
    for i in range(len(QUERY_TERMS)):
        idf = (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        tf_i = F.col(f"tf_{i}").cast("double")
        score = score + idf * (tf_i * (BM25_K1 + 1.0)) / (tf_i + norm)
    return (
        scored.select(
            "doc_id",
            F.floor(F.lit(10000.0) * score).cast("long").alias("score_bp"),
        )
        .orderBy(F.desc("score_bp"), F.asc("doc_id"))
        .limit(TOP_K)
    )


def _oracle_bm25() -> str:
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(words, w -> w = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(QUERY_TERMS)
    )
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(QUERY_TERMS))
    )
    score_terms = " + ".join(
        f"((n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * {BM25_K1 + 1.0})"
        f" / (CAST(tf_{i} AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl / (sum_dl / n_docs)))"
        for i in range(len(QUERY_TERMS))
    )
    return f"""
WITH tf AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS words FROM documents)
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) AS sum_dl,
         {df_cols}
  FROM tf
)
SELECT doc_id,
       CAST(floor(10000.0 * (0.0 + {score_terms})) AS BIGINT) AS score_bp
FROM tf CROSS JOIN stats
ORDER BY score_bp DESC, doc_id ASC
LIMIT {TOP_K}
"""


ORACLE_BM25 = _oracle_bm25()


# -- TF-IDF top terms: the inverted-index shuffle, bounded per doc ----------------

TFIDF_TOP = 3


def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by TF-IDF — the full inverted-index pattern
    (BM25 above deliberately avoids it for a FIXED query-term set; this is
    the open-vocabulary case where the (term, doc) shuffle is the point).

    Distributed shape: explode tokens → ONE (doc, term) combiner-friendly
    count → per-term document frequencies (vocabulary-sized, broadcast here;
    at 100 TB vocabulary outgrows broadcast and this becomes a term-keyed
    sort-merge join — same plan minus the hint) → per-doc top-3 via one
    window keyed on doc_id.  IDF is the Robertson rational form
    (N − df + 0.5)/(df + 0.5): add/mul/div are IEEE-deterministic where
    libm ``ln`` is not, and the ranking is order-equivalent."""
    docs = scale_out(read_table(spark, sf_dir, "documents"))
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
    )
    tf = tokens.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.floor(
                F.lit(10000.0)
                * F.col("tf").cast("double")
                * (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            )
            .cast("long")
            .alias("score_bp"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_bp"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP)
        .select("doc_id", F.col("rk").cast("long"), "term", "tf", "score_bp")
    )


ORACLE_TFIDF = f"""
WITH tokens AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
), scored AS (
  SELECT doc_id, term, tf,
         CAST(floor(10000.0 * CAST(tf AS DOUBLE)
                    * ((SELECT CAST(count(*) AS DOUBLE) FROM documents) - df + 0.5)
                    / (df + 0.5)) AS BIGINT) AS score_bp
  FROM tf JOIN dfreq USING (term)
)
SELECT doc_id, rk, term, tf, score_bp FROM (
  SELECT doc_id, term, tf, score_bp,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score_bp DESC, term ASC) AS BIGINT) AS rk
  FROM scored
) WHERE rk <= {TFIDF_TOP}
"""


QUERIES = {
    "text_bm25_topk": text_bm25_topk,
    "text_tfidf_topterms": text_tfidf_topterms,
}

ORACLES = {
    "text_bm25_topk": ORACLE_BM25,
    "text_tfidf_topterms": ORACLE_TFIDF,
}
