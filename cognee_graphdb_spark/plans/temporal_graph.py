"""U3 — the temporal cognify variant: documents -> Events + Timestamps +
Intervals -> graph, feeding the TEMPORAL search type (J9/J6/W3).

Reference: cognee/tasks/temporal_graph/ swapped into the pipeline by
api/v1/cognify/cognify.py:307-316; Event/Timestamp/Interval models in
cognee/modules/engine/models/ (Timestamp.time_at is an int epoch encoding).

The extraction itself is an [LLM] op behind the gateway (deterministic mock
here: ISO dates in the text become events).  Everything downstream is
expressions: Timestamp nodes carry properties['time_at'], events link with
``at`` (point) or ``during`` (interval) edges, and Event_name becomes a vector
collection so temporal retrieval can score events.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cognee_graphdb_spark.ids import content_id
from cognee_graphdb_spark.llm.embedder import embed_column
from cognee_graphdb_spark.llm.gateway import MockLLMGateway

_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts_from", T.LongType()),
        T.StructField("ts_to", T.LongType()),
    ]
)


@dataclass
class TemporalGraph:
    nodes: DataFrame
    edges: DataFrame
    embeddings: DataFrame


def extract_events(docs: DataFrame, gateway: MockLLMGateway | None = None, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched U3 extraction: one row per event found in each document."""
    import pandas as pd

    gateway = gateway or MockLLMGateway()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for ev in gateway.extract_events(text or ""):
                    rows.append((str(doc_id), ev["name"], ev["ts_from"], ev.get("ts_to")))
            yield pd.DataFrame(rows, columns=["doc_id", "name", "ts_from", "ts_to"])

    from cognee_graphdb_spark.session import fan_out, ship_package

    ship_package(docs.sparkSession)
    return fan_out(docs.select(id_col, text_col)).mapInPandas(run, _EVENT_SCHEMA)


def cognify_temporal(docs: DataFrame, gateway: MockLLMGateway | None = None, embed_dim: int = 64) -> TemporalGraph:
    """Build the temporal graph: Event nodes, Timestamp nodes (properties
    carry the int time_at encoding), Interval edges, Event_name collection."""
    events = extract_events(docs, gateway).cache()

    ev = events.select(
        content_id(F.lit("Event"), "doc_id", "name", "ts_from").alias("id"),
        F.col("name"),
        "doc_id",
        "ts_from",
        "ts_to",
    ).dropDuplicates(["id"])

    event_nodes = ev.select(
        "id", "name", F.lit("Event").alias("type"), F.create_map().cast("map<string,string>").alias("properties")
    )
    ts_points = ev.select(F.col("ts_from").alias("t")).unionByName(
        ev.filter(F.col("ts_to").isNotNull()).select(F.col("ts_to").alias("t"))
    ).distinct()
    ts_nodes = ts_points.select(
        content_id(F.lit("Timestamp"), "t").alias("id"),
        F.col("t").cast("string").alias("name"),
        F.lit("Timestamp").alias("type"),
        F.map_from_arrays(F.array(F.lit("time_at")), F.array(F.col("t").cast("string"))).alias("properties"),
    )
    doc_nodes = docs.select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("id"),
        F.col("doc_id").cast("string").alias("name"),
        F.lit("TextDocument").alias("type"),
        F.create_map().cast("map<string,string>").alias("properties"),
    )

    e_at = ev.select(
        F.col("id").alias("src"),
        content_id(F.lit("Timestamp"), "ts_from").alias("dst"),
        F.lit("at").alias("relationship_name"),
    )
    e_during = ev.filter(F.col("ts_to").isNotNull()).select(
        F.col("id").alias("src"),
        content_id(F.lit("Timestamp"), "ts_to").alias("dst"),
        F.lit("during").alias("relationship_name"),
    )
    e_doc = ev.select(
        F.col("id").alias("src"),
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("dst"),
        F.lit("extracted_from").alias("relationship_name"),
    )
    edges = e_at.unionByName(e_during).unionByName(e_doc).dropDuplicates(["src", "dst", "relationship_name"])

    embeddings = ev.select(
        F.lit("Event_name").alias("collection"), F.col("id"), F.col("name").alias("text")
    ).withColumn("vector", embed_column("text", dim=embed_dim))

    nodes = event_nodes.unionByName(ts_nodes).unionByName(doc_nodes)
    return TemporalGraph(nodes=nodes, edges=edges, embeddings=embeddings)
