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

# The reference ALWAYS maps edge-type vector distances onto edges, even when
# EdgeType_relationship_name is not among the requested node collections
# (CogneeGraph.map_vector_distances_to_graph_edges).
EDGE_TYPE_COLLECTION = "EdgeType_relationship_name"


def collection_scores(
    embeddings: DataFrame,
    query_vector: list[float],
    collections=DEFAULT_COLLECTIONS,
) -> DataFrame:
    """(collection, id, score) for every row of the selected collections; score
    is the min-max-normalized cosine distance within its collection.

    Scale shape (r13): the old ``Window.partitionBy("collection")`` min/max
    funneled EVERY scored row through ≤|collections| reducer tasks — a
    worst-case skew shuffle (guide §2.5: a handful of giant partitions) that
    also re-executed per downstream consumer.  Now the (collection, id,
    distance) proxy is localCheckpointed ONCE (narrow rows — the §8
    "decide with small rows" discipline; the full embedding vectors never
    leave their scan), the per-collection min/max is a partial-aggregated
    ≤|collections|-row frame, and the rescale is a map-only broadcast join.
    Values are bit-identical: F.min/F.max aggregate and window forms compute
    the same IEEE doubles (same Min/Max expressions, same NaN/null handling)
    and the rescale expression is unchanged."""
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    scored = embeddings.filter(F.col("collection").isin(list(collections))).select(
        "collection", "id", cosine_distance(F.col("vector"), qv).alias("distance")
    ).localCheckpoint(eager=True)
    mm = scored.groupBy("collection").agg(
        F.min("distance").alias("__lo"), F.max("distance").alias("__hi")
    )
    return scored.join(F.broadcast(mm), "collection").select(
        "collection",
        "id",
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0.0))
        .otherwise(
            (F.col("distance") - F.col("__lo")) / (F.col("__hi") - F.col("__lo"))
        )
        .alias("score"),
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
    scores = collection_scores(embeddings, query_vector, tuple(collections) + (EDGE_TYPE_COLLECTION,))
    # per-node best (min) score across collections — a node indexed by several
    # collections contributes its closest match, as in the reference's
    # per-collection score maps applied in sequence (CogneeGraph.py:141-181)
    node_scores = scores.filter(F.col("collection") != EDGE_TYPE_COLLECTION).groupBy("id").agg(
        F.min("score").alias("score")
    )
    # edge-type scores: the EdgeType_relationship_name collection's text IS the
    # relationship name (index_graph_edges.py:52-55) — resolve id -> name, then
    # the relationship term of the triplet score is coalesce(rel_score, 1)
    ets = (
        scores.filter(F.col("collection") == EDGE_TYPE_COLLECTION)
        .join(
            embeddings.filter(F.col("collection") == EDGE_TYPE_COLLECTION).select(
                "id", F.col("text").alias("relationship_name")
            ),
            "id",
        )
        .select("relationship_name", "score")
    )
    top = triplet_score_join(edges, node_scores, edge_type_scores=ets, k=k)

    # The top-k result is bounded by k (tiny by contract — the reference's heap
    # top-k is likewise driver-side, CogneeGraph.py:183-190).  Materialize it
    # once, then resolve endpoint names/texts as point lookups with a pushed-
    # down IN filter: the big nodes/embeddings tables are never broadcast or
    # shuffled — only the ≤2k matching rows are, and broadcasting THOSE is safe
    # at any scale.
    top_rows = top.collect()
    spark = nodes.sparkSession
    top = spark.createDataFrame(top_rows, top.schema) if top_rows else top
    ids = sorted({r["src"] for r in top_rows} | {r["dst"] for r in top_rows})

    # materialize each ≤2k-row lookup ONCE: n_hit feeds two broadcast builds
    # and texts feeds two more — un-checkpointed, each build re-ran its full
    # nodes/embeddings scan (4 table scans after the top-k; now 2)
    n_hit = (
        nodes.filter(F.col("id").isin(ids))
        .select("id", "name")
        .localCheckpoint(eager=True)
    )
    n_src = n_hit.select(F.col("id").alias("src"), F.col("name").alias("src_name"))
    n_dst = n_hit.select(F.col("id").alias("dst"), F.col("name").alias("dst_name"))
    texts = (
        embeddings.filter(F.col("collection").isin(list(collections)))
        .filter(F.col("id").isin(ids))
        .select("id", "text")
        .dropDuplicates(["id"])
        .localCheckpoint(eager=True)
    )
    return (
        top.join(F.broadcast(n_src), "src", "left")
        .join(F.broadcast(n_dst), "dst", "left")
        .join(F.broadcast(texts.withColumnRenamed("id", "src").withColumnRenamed("text", "src_text")), "src", "left")
        .join(F.broadcast(texts.withColumnRenamed("id", "dst").withColumnRenamed("text", "dst_text")), "dst", "left")
        .select("src", "src_name", "src_text", "relationship_name", "dst", "dst_name", "dst_text", "triplet_score")
        .orderBy(F.col("triplet_score").asc(), F.col("src").asc(), F.col("dst").asc())
    )


def _py_title(text: str, first_n: int = 7) -> str:
    """Driver-side mirror of functions.text.title_with_top_words (k rows only)."""
    import string
    from collections import Counter

    from cognee_graphdb_spark.functions.text import STOP_WORDS

    first = " ".join(text.split()[:first_n])
    words = [w.lower().strip(string.punctuation) for w in text.split()]
    words = [w for w in words if w and w not in set(STOP_WORDS)]
    top = ", ".join(w for w, _ in Counter(words).most_common(first_n))
    return f"{first}... [{top}]"


def render_triplets(triplets: DataFrame) -> str:
    """F11 — the reference's exact rendering (resolve_edges_to_text.py:46-71):

    a ``Nodes:`` section (title + __node_content_start__ block per distinct
    node, first-seen order) followed by a ``Connections:`` section of
    ``A --[rel]--> B`` lines.  Nodes with a text payload get a synthesized
    title (F10); others use their name.  Driver-side: input is the top-k rows.
    """
    rows = triplets.collect()
    nodes: dict[str, tuple[str, str]] = {}  # id -> (title, content)
    for r in rows:
        for side in ("src", "dst"):
            nid = r[side]
            if nid in nodes:
                continue
            text = r[f"{side}_text"]
            name = r[f"{side}_name"] or "Unnamed Node"
            if text:
                nodes[nid] = (_py_title(text), text)
            else:
                nodes[nid] = (name, name)
    node_section = "\n".join(
        f"Node: {title}\n__node_content_start__\n{content}\n__node_content_end__\n"
        for title, content in nodes.values()
    )
    connection_section = "\n".join(
        f"{nodes[r['src']][0]} --[{r['relationship_name']}]--> {nodes[r['dst']][0]}" for r in rows
    )
    return f"Nodes:\n{node_section}\n\nConnections:\n{connection_section}"
