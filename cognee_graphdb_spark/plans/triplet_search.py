"""Brute-force triplet search — the engine's core composite query plan
(SURVEY.md §2.4 J5; reference: modules/retrieval/utils/brute_force_triplet_search.py:90-185).

Reference semantics, re-expressed as one Spark plan:
1. embed the query text (V5 — deterministic hash embedder here),
2. score EVERY row of each relevant collection (limit=None full scan —
   brute_force_triplet_search.py:143),
3. min-max normalize distances per collection (V3, vector/utils.py:4-35),
4. map scores onto edge endpoints + relationship type, score each edge
   coalesce(src,1)+coalesce(dst,1)+coalesce(rel,1)  (CogneeGraph.py:141-190),
5. take the k smallest (W1 — TakeOrderedAndProject, no global sort),
6. render triplets to text (F11, resolve_edges_to_text.py:62-71).

Where the reference projects the whole graph into Python dicts per query
(CogneeGraph.py:88, O(N+E) on one core), this plan is three broadcast joins +
a top-k: the score maps are per-query small, so the big edges table never
shuffles at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.functions.vectors import cosine_distance, minmax_normalize
from cognee_graphdb_spark.llm.embedder import HashEmbedder
from cognee_graphdb_spark.operators.graph_joins import triplet_score_join

DEFAULT_COLLECTIONS = ("Entity_name", "EntityType_name", "DocumentChunk_text", "TextSummary_text")


def collection_scores(
    embeddings: DataFrame,
    query_vector: list[float],
    collections=DEFAULT_COLLECTIONS,
) -> DataFrame:
    """(collection, id, score) for every row of the selected collections; score
    is the min-max-normalized cosine distance within its collection."""
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    scored = embeddings.filter(F.col("collection").isin(list(collections))).select(
        "collection", "id", cosine_distance(F.col("vector"), qv).alias("distance")
    )
    return scored.select(
        "collection", "id", minmax_normalize("distance", partition_by=["collection"]).alias("score")
    )


def brute_force_triplet_search(
    nodes: DataFrame,
    edges: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    k: int = 5,
    collections=DEFAULT_COLLECTIONS,
    embed_dim: int = 64,
) -> DataFrame:
    """Top-k scored triplets (src, dst, relationship_name, triplet_score) with
    endpoint names attached for rendering."""
    query_vector = HashEmbedder(embed_dim).embed(query_text)
    scores = collection_scores(embeddings, query_vector, collections)
    # per-node best (min) score across collections — a node indexed by several
    # collections contributes its closest match, as in the reference's
    # per-collection score maps applied in sequence (CogneeGraph.py:141-181)
    node_scores = scores.groupBy("id").agg(F.min("score").alias("score"))
    top = triplet_score_join(edges, node_scores, edge_type_scores=None, k=k)

    n_src = nodes.select(F.col("id").alias("src"), F.col("name").alias("src_name"))
    n_dst = nodes.select(F.col("id").alias("dst"), F.col("name").alias("dst_name"))
    return (
        top.join(F.broadcast(n_src), "src", "left")
        .join(F.broadcast(n_dst), "dst", "left")
        .select("src", "src_name", "relationship_name", "dst", "dst_name", "triplet_score")
        .orderBy(F.col("triplet_score").asc(), F.col("src").asc(), F.col("dst").asc())
    )


def render_triplets(triplets: DataFrame) -> str:
    """F11 — 'A --[rel]--> B' rendering (resolve_edges_to_text.py:62-71)."""
    rows = triplets.collect()
    return "\n".join(f"{r['src_name']} --[{r['relationship_name']}]--> {r['dst_name']}" for r in rows)
