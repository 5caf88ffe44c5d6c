"""Lexical relevance ranking — BM25 and TF-IDF — the scale path for the
reference's lexical retrieval.

The reference's CHUNKS_LEXICAL retriever scores chunks by token-set Jaccard
against the query (lexical_retriever.py:34-117, jaccard_retrival.py:45-60),
which treats every shared token equally.  At corpus scale the standard
ranking function is BM25 (Robertson/Spärck Jones; the Lucene-style variant
implemented here) — same inputs (tokens), strictly better ranking, and the
same Spark plan shape as Jaccard scoring.

Scale design (query-at-a-time):
- the query's terms are known up front, so the term filter lands BEFORE the
  tf groupBy — the plan never materializes a full inverted index, it scans
  the corpus once and aggregates only matching (doc, term) pairs;
- corpus-level constants (N, avgdl) are one tiny aggregate; per-term document
  frequencies come from the already-filtered tf table;
- the idf map is a handful of rows — broadcast onto the tf table;
- top-k is TakeOrderedAndProject (no global sort).

For a standing corpus the tf/dl/df tables are one-time builds (see
``build_lexical_index``) that incremental loads can MERGE into; the scoring
join is then index-only and never rescans text.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.functions.text import tokenize


def build_lexical_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(tf, dl): term frequencies per (doc, term) and token length per doc —
    the persistent halves of a lexical index.  One tokenize pass, two
    aggregations; both partial-aggregate map-side before their shuffle."""
    toks = df.select(F.col(id_col).alias("doc_id"), F.explode(tokenize(F.col(text_col))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return tf, dl


def _query_terms(query_text: str) -> list[str]:
    """Distinct lowercase query terms under the shared tokenizer contract
    (functions/text.py:tokenize) — BM25 ignores query-side term repetition."""
    import re

    return sorted({t for t in re.split(r"[^a-z0-9]+", query_text.lower()) if t})


def bm25_topk(
    df: DataFrame,
    query_text: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25(query): (doc_id, bm25) descending.

    score(d) = Σ_t idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))   (Lucene BM25 idf).
    Deterministic: per-term contributions are summed in term order via a
    sorted-array aggregate on the oracle side; here round(…, 6) absorbs the
    sub-ulp float-association drift of groupBy sums.
    """
    terms = _query_terms(query_text)
    if not terms:
        raise ValueError("query has no tokens")
    tf_all, dl = build_lexical_index(df, text_col, id_col)
    tf = tf_all.filter(F.col("term").isin(terms))  # pushed below the groupBy by Catalyst

    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")).first()
    n_docs, avgdl = stats["n_docs"], float(stats["avgdl"])

    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    idf = dft.select(
        "term",
        F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_batch(
    df: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch BM25: [(query_id, query_text)] → (query_id, doc_id, bm25), top-k
    per query.  One corpus scan for ALL queries: the (query_id, term) pairs
    join onto the shared tf table, and ranking is a per-query window (W5) —
    the same gather shape as batch k-NN."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    pairs = [(qid, t) for qid, qt in queries for t in _query_terms(qt)]
    if not pairs:
        raise ValueError("no query tokens")
    qterms = spark.createDataFrame(pairs, ["query_id", "term"]).distinct()

    tf_all, dl = build_lexical_index(df, text_col, id_col)
    tf = tf_all.join(F.broadcast(qterms.select("term").distinct()), "term")

    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")).first()
    n_docs, avgdl = stats["n_docs"], float(stats["avgdl"])
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    idf = dft.select(
        "term",
        F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", "bm25")
    )


def tfidf_topk(
    df: DataFrame,
    query_text: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k by cosine-free TF-IDF sum: Σ_t (1 + ln tf) · ln(N/df_t) — the
    classic log-tf · idf weighting, same plan shape as :func:`bm25_topk`."""
    terms = _query_terms(query_text)
    if not terms:
        raise ValueError("query has no tokens")
    tf_all, dl = build_lexical_index(df, text_col, id_col)
    tf = tf_all.filter(F.col("term").isin(terms))
    n_docs = dl.count()
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    idf = dft.select("term", F.log(F.lit(float(n_docs)) / F.col("df_t")).alias("idf"))
    return (
        tf.join(F.broadcast(idf), "term")
        .withColumn("contrib", (1.0 + F.log(F.col("tf"))) * F.col("idf"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("tfidf"))
        .orderBy(F.desc("tfidf"), F.asc("doc_id"))
        .limit(k)
    )
