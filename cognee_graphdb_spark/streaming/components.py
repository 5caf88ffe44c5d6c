"""Streaming connected-components maintenance.

A continuously-ingested edge stream (relationship ledger, entity links) needs
an always-current component assignment without re-running CC over history
every micro-batch.  ``components_batch`` is the ``foreachBatch`` body: it
feeds each batch's edges through
:func:`cognee_graphdb_spark.operators.graph_metrics.incremental_components`
against the PERSISTED assignment table and replaces it — per-batch COMPUTE is
proportional to the new edges and the components they touch, never to stream
history, and state lives in parquet, not streaming operator memory (the same
state discipline as streaming/dedup.py's near-dup registry).  The state
PERSIST, by contrast, is a full O(|V|) snapshot rewrite each batch — parquet
has no in-place update; route the assignment through the GraphStore MERGE
backend instead when the node universe is large relative to batch size.

Exactness: the assignment after N batches equals ``connected_components``
over the union of all N batches' edges, label-for-label (canonical min-hash
labels compose under contraction — pytest-pinned on the batch operator).
A REDELIVERED micro-batch is a no-op: its edges contract to self-loops and
intra-component edges, which change no label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cognee_graphdb_spark.operators.graph_metrics import incremental_components
from cognee_graphdb_spark.streaming.state import read_state, swap_write


def components_batch(batch: DataFrame, assign_path: str) -> DataFrame:
    """Apply one micro-batch of edges to the persisted assignment table at
    ``assign_path`` and return the updated assignment frame.

    State lives behind :mod:`cognee_graphdb_spark.streaming.state`'s
    two-rename parquet swap (crash matrix documented there).  The
    idempotency contract the swap's recovery relies on holds here: a
    re-applied batch's edges contract to self-loops and intra-component
    edges, which change no label, so recovery is exact.
    """
    spark = batch.sparkSession
    edges = batch.select("src", "dst")
    prev = read_state(spark, assign_path)
    updated = incremental_components(prev, edges)
    swap_write(updated, assign_path, tmp_prefix=".components_")
    return spark.read.parquet(assign_path)
