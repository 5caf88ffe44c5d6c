"""ST1 — the reference's generator micro-batch pipeline as Structured
Streaming.

Reference: every cognify Task yields batches of ``next_task_batch_size`` that
flow through the downstream tasks before the next batch is produced
(modules/pipelines/tasks/task.py:52-97, operations/run_tasks_base.py:66-83,
batch_size=10 at api/v1/cognify/cognify.py:271-278).

Spark-first: a file-source stream of documents; each micro-batch runs the FULL
cognify DAG (chunk -> extract -> graph + collections) and MERGEs into the
GraphStore via foreachBatch.  Content-addressed ids make re-delivery
idempotent — exactly the reference's upsert-based reconciliation, so
at-least-once delivery is safe.  Late data needs no watermark because there is
no event-time aggregation in the build path (upserts by deterministic id are
the only reconciliation, SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from cognee_graphdb_spark.llm.gateway import MockLLMGateway
from cognee_graphdb_spark.sources.sinks import GraphStore

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def cognify_stream(
    spark: SparkSession,
    source_dir: str,
    store: GraphStore,
    checkpoint_dir: str,
    gateway: MockLLMGateway | None = None,
    max_chunk_size: int = 256,
):
    """Start the streaming cognify pipeline over a JSON-lines document
    directory.  Returns the StreamingQuery (caller awaits/stops)."""
    from cognee_graphdb_spark.plans.cognify import cognify_documents

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)  # micro-batch pacing, ST1's batch_size analogue
        .json(source_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = cognify_documents(batch_df, gateway=gateway, max_chunk_size=max_chunk_size)
        store.upsert_nodes(res.nodes, created_by=f"stream_batch_{batch_id}")
        store.upsert_edges(res.edges, created_by=f"stream_batch_{batch_id}")
        store.upsert_embeddings(res.embeddings, created_by=f"stream_batch_{batch_id}")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
