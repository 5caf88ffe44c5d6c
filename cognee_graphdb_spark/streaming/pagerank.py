"""Streaming PageRank maintenance.

A continuously-ingested edge stream (relationship ledger, entity links)
wants an always-current importance ranking without paying a cold-start
power iteration per micro-batch.  ``pagerank_batch`` is the ``foreachBatch``
body: it folds each batch's edges into the persisted edge ledger, then
re-solves PageRank WARM-STARTED from the previous snapshot's ranks
(``operators/graph_metrics.py:pagerank(warm_start=...)``) — power iteration
converges to the same fixpoint from any positive start, and a start near
the fixpoint makes the per-batch round count track the SIZE OF THE CHANGE,
not the graph's mixing time.  Both state tables (edge ledger, rank
snapshot) live in parquet behind :mod:`cognee_graphdb_spark.streaming
.state`'s two-rename swap, not in streaming operator memory — the same
state discipline as streaming/components.py.

The swap's crash-recovery contract needs batch replay to be idempotent:
it is — re-unioning an already-ledgered batch is absorbed by the distinct,
so the re-run solves the identical graph from the committed ranks and
converges to the identical fixpoint (within ``tol``).

Exactness: after N batches the ranks equal ``pagerank`` over the union of
all N batches' edges to within the solver tolerance (pytest-pinned).
Unlike incremental connected components (whose labels compose under
contraction), PageRank's fixpoint depends on EVERY edge, so the ledger
persist is O(|E|) per batch; route the ledger through a bucketed GraphStore
MERGE when |E| dwarfs batch size — the warm-start seam only needs
(id, rank) back.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.graph_metrics import pagerank
from cognee_graphdb_spark.streaming.state import read_state, swap_write


def pagerank_batch(
    batch: DataFrame,
    state_path: str,
    damping: float = 0.85,
    n_iter: int = 50,
    tol: float = 1e-9,
    checkpoint_every: int = 3,
    weight_col: str | None = None,
) -> DataFrame:
    """Apply one micro-batch of (src, dst[, weight]) edges to the PageRank
    state rooted at ``state_path`` (subdirs ``edges`` and ``ranks``) and
    return the refreshed (id, rank) frame.

    ``n_iter`` is a CAP, not a cost: with ``tol`` set, the warm-started
    solve stops at the first checkpoint whose L1 delta clears it — a small
    batch against a settled graph converges in one or two checkpoint spans.
    """
    spark = batch.sparkSession
    edges_path = os.path.join(state_path, "edges")
    ranks_path = os.path.join(state_path, "ranks")

    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    e = batch.select(*cols)
    prior_edges = read_state(spark, edges_path)
    if prior_edges is not None:
        e = prior_edges.unionByName(e)
    # the ledger stores distinct rows — what makes batch REPLAY a no-op on
    # the solved graph.  Weighted: a re-sent edge with a CHANGED weight is a
    # new distinct triple and pagerank SUMS parallel weights, so weighted
    # streams must send stable per-edge weights (or pre-aggregate upstream)
    e = e.distinct().localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    ranks = pagerank(
        nodes,
        e,
        damping=damping,
        n_iter=n_iter,
        tol=tol,
        checkpoint_every=checkpoint_every,
        ids_distinct=True,
        edges_within_nodes=True,
        weight_col=weight_col,
        warm_start=read_state(spark, ranks_path),
    )
    swap_write(e, edges_path, tmp_prefix=".pr_edges_")
    swap_write(ranks, ranks_path, tmp_prefix=".pr_ranks_")
    return spark.read.parquet(ranks_path)
