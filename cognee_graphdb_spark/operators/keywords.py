"""Corpus keyword extraction — TextRank (Mihalcea & Tarau 2004) as a pure
composition of two operators the engine already ships: the windowed term
co-occurrence graph (``text_analysis.term_cooccurrence`` — stopword-filtered,
position-banded, hot-term-capped) ranked by WEIGHTED PageRank
(``graph_metrics.pagerank(weight_col=...)`` — transition probability
proportional to co-occurrence count, the paper's weighted variant).

This is the keyword/keyphrase stage a training-data pipeline runs for
corpus summarization, topic labeling, and quality auditing — and it shows
the operator algebra composing: no new iteration loop, no new float
discipline; the co-occurrence counts are exact integers, and the PageRank
oracle pattern (ppm-quantized ranks) carries over unchanged.

Scale shape: inherited entirely from the two parents — the pair stage fans
out ≤ window per token with a ``max_df`` cap, and each PageRank round is
one co-partitioned equi-join + partial-agg sum over the term graph (vocab-
sized, far smaller than the corpus)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.graph_metrics import pagerank
from cognee_graphdb_spark.operators.text_analysis import term_cooccurrence


def textrank_keywords(
    docs: DataFrame,
    window: int = 4,
    min_pair_count: int = 2,
    max_df: int | None = None,
    damping: float = 0.85,
    n_iter: int = 10,
    top_k: int | None = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, rank): the corpus's ``top_k`` TextRank keywords, ordered by
    (rank desc, term) — ``top_k=None`` returns every term unranked-cut (for
    callers that quantize before cutting; a huge top_k would make the
    TakeOrdered heap driver-sized, None keeps it a plain frame).  The
    co-occurrence graph is undirected (each unordered pair contributes both
    transition directions at its count), so rank mass flows symmetrically
    like the paper's undirected recommendation."""
    co = term_cooccurrence(
        docs,
        window=window,
        min_pair_count=min_pair_count,
        max_df=max_df,
        text_col=text_col,
        id_col=id_col,
    ).select("t1", "t2", "n_pairs")
    edges = co.select(
        F.col("t1").alias("src"), F.col("t2").alias("dst"), F.col("n_pairs").alias("w")
    ).unionByName(
        co.select(
            F.col("t2").alias("src"), F.col("t1").alias("dst"), F.col("n_pairs").alias("w")
        )
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    ranks = pagerank(
        nodes,
        edges,
        damping=damping,
        n_iter=n_iter,
        ids_distinct=True,
        edges_within_nodes=True,
        weight_col="w",
    )
    out = ranks.select(F.col("id").alias("term"), "rank")
    if top_k is None:
        return out
    return out.orderBy(F.col("rank").desc(), "term").limit(top_k)
