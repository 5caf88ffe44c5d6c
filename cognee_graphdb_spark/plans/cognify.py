"""The build path — ``cognee.cognify`` as one linear DataFrame DAG
(SURVEY.md §3.2).

Reference pipeline (api/v1/cognify/cognify.py:259-278): classify_documents →
extract_chunks_from_documents → extract_graph_from_data → summarize_text →
add_data_points, pipelined in micro-batches of 10.  In Spark the micro-batching
vanishes (vectorized stages); each task is a transformation:

documents ──chunk_documents──► chunks ──gateway.extract_graph──► entities/edges
        └──────────────────────────────┴──gateway.extract_summary──► summaries
nodes  = documents ∪ chunks ∪ entities ∪ entity-types ∪ summaries
edges  = is_part_of ∪ contains ∪ is_a ∪ made_from      (A8-deduped)
embeddings = one collection per (Type, index_field) — §1.3 index_fields:
   DocumentChunk_text, Entity_name, EntityType_name, TextSummary_text
   (index_data_points.py:23 naming).

The only Python stages are the chunker and the (mock) LLM extraction —
both Arrow-batched mapInPandas; everything else is Catalyst expressions.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cognee_graphdb_spark.ids import content_id, normalize_name
from cognee_graphdb_spark.llm.embedder import embed_column
from cognee_graphdb_spark.llm.gateway import MockLLMGateway
from cognee_graphdb_spark.operators.chunking import chunk_documents

_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # node | edge | summary
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("src_name", T.StringType()),
        T.StructField("dst_name", T.StringType()),
        T.StructField("relationship_name", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


@dataclass
class CognifyResult:
    chunks: DataFrame
    nodes: DataFrame
    edges: DataFrame
    embeddings: DataFrame
    # the cached intermediate all three outputs read; exposed so callers can
    # force it ONCE before materializing outputs concurrently (see
    # materialize()) instead of racing its first computation
    extracted: DataFrame | None = None


def materialize(result: CognifyResult, cache: bool = True) -> dict[str, int]:
    """Materialize the build outputs as CONCURRENT Spark jobs.

    nodes / edges / embeddings are independent sinks of the same two cached
    upstreams (chunks, extracted).  Sequential ``.count()`` calls serialize
    three small-stage jobs behind one driver; submitting them from a thread
    pool lets the scheduler overlap their stages — the same pattern as a
    cluster pipeline writing independent outputs concurrently (the reference
    pipelines its add_data_points writes the same way,
    api/v1/cognify/cognify.py:259-278).  The shared upstream is forced first
    so concurrent first-touch doesn't duplicate the Python extract stage.
    """
    from concurrent.futures import ThreadPoolExecutor

    if result.extracted is not None:
        result.extracted.count()  # forces chunks cache too (its only parent)
    else:
        result.chunks.count()

    def _go(df: DataFrame) -> int:
        return (df.cache() if cache else df).count()

    with ThreadPoolExecutor(max_workers=3) as pool:
        counts = list(pool.map(_go, (result.nodes, result.edges, result.embeddings)))
    return {"nodes": counts[0], "edges": counts[1], "embeddings": counts[2]}


def _extract_stage(chunks: DataFrame, gateway: MockLLMGateway) -> DataFrame:
    """chunk rows -> extracted graph fragments + summaries (U1/U2), Arrow-batched."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _EXTRACT_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for chunk_id, text in zip(pdf["chunk_id"], pdf["text"]):
                nodes, edges = gateway.extract_graph(text or "")
                for nd in nodes:
                    rows.append((chunk_id, "node", nd["name"], nd["type"], None, None, None, None))
                for e in edges:
                    rows.append(
                        (chunk_id, "edge", None, None, e["src_name"], e["dst_name"], e["relationship_name"], None)
                    )
                rows.append((chunk_id, "summary", None, None, None, None, None, gateway.extract_summary(text or "")))
            yield pd.DataFrame(rows, columns=cols)

    from cognee_graphdb_spark.session import ship_package

    ship_package(chunks.sparkSession)
    # no fan_out here: chunks always comes from chunk_documents, which already
    # widened the lineage to cluster parallelism (mapInPandas preserves
    # partitioning), and probing .rdd.getNumPartitions() on the mapInPandas
    # plan costs ~2.5s of driver-side physical planning for a guaranteed no-op
    return chunks.select("chunk_id", "text").mapInPandas(run, _EXTRACT_SCHEMA)


def cognify_documents(
    docs: DataFrame,
    gateway: MockLLMGateway | None = None,
    max_chunk_size: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    embed_dim: int = 64,
) -> CognifyResult:
    gateway = gateway or MockLLMGateway()
    docs = docs.select(F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text"))

    chunks = chunk_documents(docs, max_chunk_size=max_chunk_size).cache()
    extracted = _extract_stage(chunks, gateway).cache()

    # node properties mirror the DataPoint payloads (SURVEY §1.3): chunks keep
    # text + packing metadata, entities a description, summaries their text —
    # all content-derived, never wall-clock, so re-runs stay id-stable
    ent = extracted.filter(F.col("kind") == "node").select(
        normalize_name("name").alias("name"), F.col("type").alias("type")
    )
    # entity ids are content-hashes of the name, so dropDuplicates(name) is
    # dropDuplicates(id) on a 1-column frame — map-side partial aggregation
    # shrinks the shuffle to distinct names, vs. shuffling every full mention
    # row.  type_nodes distincts ALL mention types (a name can be typed
    # differently across chunks, and every is_a edge target must exist).
    entity_nodes = ent.select("name").dropDuplicates(["name"]).select(
        content_id(F.lit("Entity"), "name").alias("id"),
        "name",
        F.lit("Entity").alias("type"),
        F.map_from_arrays(F.array(F.lit("description")), F.array(F.col("name"))).alias("properties"),
    )
    type_nodes = ent.select("type").distinct().select(
        content_id(F.lit("EntityType"), "type").alias("id"),
        F.col("type").alias("name"),
        F.lit("EntityType").alias("type"),
        F.create_map().cast("map<string,string>").alias("properties"),
    )

    doc_nodes = docs.select(
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("id"),
        F.col("doc_id").alias("name"),
        F.lit("TextDocument").alias("type"),
        F.create_map().cast("map<string,string>").alias("properties"),
    )
    # dropDuplicates is load-bearing: chunk ids are CONTENT-addressed, so a
    # duplicated document yields the same chunk node (F5 semantics)
    chunk_nodes = chunks.select(
        F.col("chunk_id").alias("id"),
        F.col("chunk_id").alias("name"),
        F.lit("DocumentChunk").alias("type"),
        F.map_from_arrays(
            F.array(F.lit("text"), F.lit("chunk_index"), F.lit("chunk_size"), F.lit("cut_type")),
            F.array(
                F.col("text"),
                F.col("chunk_index").cast("string"),
                F.col("chunk_size").cast("string"),
                F.col("cut_type"),
            ),
        ).alias("properties"),
    ).dropDuplicates(["id"])

    summaries = extracted.filter(F.col("kind") == "summary").select(
        content_id(F.lit("TextSummary"), "chunk_id").alias("id"),
        F.col("text").alias("name"),
        F.lit("TextSummary").alias("type"),
        F.col("chunk_id"),
        F.col("text"),
    ).dropDuplicates(["id"])

    nodes = (
        doc_nodes.unionByName(chunk_nodes)
        .unionByName(entity_nodes)
        .unionByName(type_nodes)
        .unionByName(
            summaries.select(
                "id",
                "name",
                "type",
                F.map_from_arrays(F.array(F.lit("text")), F.array(F.col("text"))).alias("properties"),
            )
        )
    )

    e_part = chunks.select(
        F.col("chunk_id").alias("src"),
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("dst"),
        F.lit("is_part_of").alias("relationship_name"),
    )
    ents_by_chunk = extracted.filter(F.col("kind") == "node").select(
        "chunk_id", normalize_name("name").alias("name"), "type"
    )
    e_contains = ents_by_chunk.select(
        F.col("chunk_id").alias("src"),
        content_id(F.lit("Entity"), "name").alias("dst"),
        F.lit("contains").alias("relationship_name"),
    )
    e_is_a = ents_by_chunk.select(
        content_id(F.lit("Entity"), "name").alias("src"),
        content_id(F.lit("EntityType"), "type").alias("dst"),
        F.lit("is_a").alias("relationship_name"),
    )
    e_made_from = summaries.select(
        F.col("id").alias("src"), F.col("chunk_id").alias("dst"), F.lit("made_from").alias("relationship_name")
    )
    e_extracted = extracted.filter(F.col("kind") == "edge").select(
        content_id(F.lit("Entity"), normalize_name("src_name")).alias("src"),
        content_id(F.lit("Entity"), normalize_name("dst_name")).alias("dst"),
        F.col("relationship_name"),
    )
    edges_raw = (
        e_part.unionByName(e_contains)
        .unionByName(e_is_a)
        .unionByName(e_made_from)
        .unionByName(e_extracted)
    )
    edges = edges_raw.dropDuplicates(["src", "relationship_name", "dst"])

    # vector collections per (Type, index_field) — index_data_points.py:23 naming
    emb_chunks = chunks.select(
        F.lit("DocumentChunk_text").alias("collection"), F.col("chunk_id").alias("id"), F.col("text")
    )
    emb_entities = entity_nodes.select(
        F.lit("Entity_name").alias("collection"), F.col("id"), F.col("name").alias("text")
    )
    emb_types = type_nodes.select(
        F.lit("EntityType_name").alias("collection"), F.col("id"), F.col("name").alias("text")
    )
    emb_summaries = summaries.select(
        F.lit("TextSummary_text").alias("collection"), F.col("id"), F.col("text")
    )
    # EdgeType_relationship_name: one row per distinct relationship name, as
    # the reference's index_graph_edges builds after every graph write — the
    # triplet search's relationship term depends on this collection existing.
    # Distinct over the PRE-dedup union: same name set, but the 1-column
    # map-side-combined distinct skips the full (src,rel,dst) dedup shuffle —
    # and keeps this branch independent of whether callers cached `edges`.
    emb_edge_types = edges_raw.select(F.col("relationship_name").alias("text")).distinct().select(
        F.lit("EdgeType_relationship_name").alias("collection"),
        content_id(F.lit("EdgeType"), "text").alias("id"),
        "text",
    )
    embeddings = (
        emb_chunks.unionByName(emb_entities)
        .unionByName(emb_types)
        .unionByName(emb_summaries)
        .unionByName(emb_edge_types)
        .withColumn("vector", embed_column("text", dim=embed_dim))
    )

    return CognifyResult(
        chunks=chunks, nodes=nodes, edges=edges, embeddings=embeddings, extracted=extracted
    )
