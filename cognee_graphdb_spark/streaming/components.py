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

import os
import tempfile

from pyspark.sql import DataFrame

from cognee_graphdb_spark.operators.graph_metrics import incremental_components


def components_batch(batch: DataFrame, assign_path: str) -> DataFrame:
    """Apply one micro-batch of edges to the persisted assignment table at
    ``assign_path`` and return the updated assignment frame.

    The write goes to a sibling temp dir first, then a two-rename swap
    retires the old version — in-flight readers keep their already-opened
    files (POSIX rename leaves open inodes valid) and the previous version
    survives at ``<path>.old``; a brand-new reader landing exactly between
    the two renames must retry.  foreachBatch runs batches serially per
    query, so there is exactly one writer.  (The GraphStore's MVCC
    pointer-flip backend is the production-grade version of this swap; this
    module stays dependency-free for ledger-style side tables.)
    """
    spark = batch.sparkSession
    edges = batch.select("src", "dst")
    prev = None
    retired = assign_path.rstrip("/") + ".old"
    if os.path.isdir(assign_path):
        prev = spark.read.parquet(assign_path)
    elif os.path.isdir(retired):
        # crash landed between the two renames of a previous swap: the
        # current pointer is gone but the retired copy IS the last committed
        # state — resume from it.  The batch that crashed mid-swap gets
        # re-applied by the streaming engine, and re-applying a batch is a
        # no-op on labels (its edges contract to intra-component edges), so
        # recovery is exact.
        prev = spark.read.parquet(retired)
    updated = incremental_components(prev, edges)
    # a crash after the tmp write but before the renames leaks a
    # snapshot-sized .components_* dir; repeated crashes accumulate one full
    # O(|V|) copy each.  Single-writer means any stale sibling is dead —
    # sweep them before creating this batch's tmp.
    parent = os.path.dirname(assign_path.rstrip("/")) or "."
    for stale in os.listdir(parent):
        if stale.startswith(".components_"):
            import shutil

            shutil.rmtree(os.path.join(parent, stale), ignore_errors=True)
    tmp = tempfile.mkdtemp(prefix=".components_", dir=parent)
    updated.write.mode("overwrite").parquet(tmp)
    # rename into place: POSIX rename replaces atomically only for empty
    # targets, so swap via a retired name (single-writer makes this safe)
    if os.path.isdir(assign_path):
        retired = assign_path.rstrip("/") + ".old"
        if os.path.isdir(retired):
            import shutil

            shutil.rmtree(retired)
        os.rename(assign_path, retired)
    os.rename(tmp, assign_path)
    return spark.read.parquet(assign_path)
