"""Chunk classification — the reference's chunk_naive_llm_classifier task
(tasks/chunk_naive_llm_classifier/chunk_naive_llm_classifier.py:14-118)
re-expressed as one Spark plan.

Reference behavior: every DocumentChunk is classified by an LLM into a
label.type with label.subclass values; the graph gains ClassificationType /
ClassificationSubtype nodes plus three edge kinds (``is_media_type``
chunk->type, ``is_subtype_of`` subtype->type, ``is_classified_as``
chunk->subtype), and a ``classification`` vector collection indexes the
label texts (py:27-37's documented structure).

Spark shape: ONE Arrow-batched mapInPandas stage runs the (gateway)
classifier per chunk — the reference's asyncio.gather over chunks becomes
executor parallelism — and everything downstream (node/edge derivation,
dedup, embedding) is Catalyst expressions, the same discipline as
plans/cognify.py.  Classification nodes and edges are content-addressed, so
re-runs and duplicated chunks deduplicate exactly like the rest of the
graph (the reference's uuid5(NAMESPACE_OID, label) ids, py:52-57).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cognee_graphdb_spark.ids import content_id
from cognee_graphdb_spark.llm.embedder import embed_column
from cognee_graphdb_spark.llm.gateway import MockLLMGateway

_CLASSIFY_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("label_type", T.StringType()),
        T.StructField("subclass", T.StringType()),  # NULL on the type row
    ]
)


@dataclass
class ClassificationResult:
    labels: DataFrame  # (chunk_id, doc_id, label_type, subclass)
    nodes: DataFrame
    edges: DataFrame
    embeddings: DataFrame


def classify_chunks(
    chunks: DataFrame, gateway: MockLLMGateway | None = None, embed_dim: int = 64
) -> ClassificationResult:
    """chunks (chunk_id, doc_id, text) -> classification graph + vectors."""
    import pandas as pd

    from cognee_graphdb_spark.session import ship_package

    gateway = gateway or MockLLMGateway()
    ship_package(chunks.sparkSession)

    def run(batches):
        cols = [f.name for f in _CLASSIFY_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for chunk_id, doc_id, text in zip(pdf["chunk_id"], pdf["doc_id"], pdf["text"]):
                label = gateway.classify_chunk(text or "")
                rows.append((chunk_id, str(doc_id), label["type"], None))
                for sub in label["subclasses"]:
                    rows.append((chunk_id, str(doc_id), label["type"], sub))
            yield pd.DataFrame(rows, columns=cols)

    labels = chunks.select("chunk_id", "doc_id", "text").mapInPandas(run, _CLASSIFY_SCHEMA)

    types_ = labels.select(F.col("label_type").alias("name")).distinct()
    subs = labels.filter(F.col("subclass").isNotNull())
    sub_names = subs.select(F.col("subclass").alias("name"), F.col("label_type")).distinct()

    empty_props = F.create_map().cast("map<string,string>").alias("properties")
    type_nodes = types_.select(
        content_id(F.lit("ClassificationType"), "name").alias("id"),
        "name",
        F.lit("ClassificationType").alias("type"),
        empty_props,
    )
    sub_nodes = sub_names.select(
        content_id(F.lit("ClassificationSubtype"), "name").alias("id"),
        "name",
        F.lit("ClassificationSubtype").alias("type"),
        empty_props,
    ).dropDuplicates(["id"])
    nodes = type_nodes.unionByName(sub_nodes)

    e_media = labels.select(
        F.col("chunk_id").alias("src"),
        content_id(F.lit("ClassificationType"), "label_type").alias("dst"),
        F.lit("is_media_type").alias("relationship_name"),
    ).dropDuplicates()
    e_subtype_of = sub_names.select(
        content_id(F.lit("ClassificationSubtype"), "name").alias("src"),
        content_id(F.lit("ClassificationType"), "label_type").alias("dst"),
        F.lit("is_subtype_of").alias("relationship_name"),
    ).dropDuplicates()
    e_classified = subs.select(
        F.col("chunk_id").alias("src"),
        content_id(F.lit("ClassificationSubtype"), "subclass").alias("dst"),
        F.lit("is_classified_as").alias("relationship_name"),
    ).dropDuplicates()
    edges = e_media.unionByName(e_subtype_of).unionByName(e_classified)

    # the reference's `classification` collection payload carries
    # uuid/text/chunk_id/document_id (py:27-33); text is the indexed field
    embeddings = (
        subs.select(
            F.lit("classification").alias("collection"),
            content_id(F.lit("classification"), "chunk_id", "subclass").alias("id"),
            F.col("subclass").alias("text"),
            F.col("chunk_id"),
            F.col("doc_id").alias("document_id"),
        )
        .dropDuplicates(["id"])
        .withColumn("vector", embed_column("text", embed_dim))
    )
    return ClassificationResult(labels=labels, nodes=nodes, edges=edges, embeddings=embeddings)
