"""Weighted shortest paths (single-source / multi-source).

The reference exposes path analytics through its GDS metric surface
(cognee/infrastructure/databases/graph/neo4j_driver/neo4j_metrics_utils.py
calls the gds.* family; gds.shortestPath.dijkstra /
gds.allShortestPaths.stream are the weighted members).  A Spark cluster has
no priority queue, so Dijkstra's sequential relaxation order is replaced by
hop-synchronous Bellman-Ford relaxation with a FRONTIER optimization — the
standard distributed SSSP layout (Pregel's canonical example):

- round state is (source, node, dist), keyed by node — per round ONE
  co-partitioned equi-join (frontier ⋈ edges on node = src) + one
  partial-aggregated min;
- only nodes IMPROVED in the previous round relax forward (the frontier),
  so settled regions of the graph stop costing anything — on a
  small-diameter graph total work approaches Dijkstra's O(E) per source
  despite the missing queue;
- after round i the state is EXACTLY "cheapest path using at most i edges"
  (the frontier restriction preserves this invariant: any path that
  improves at round i extends a prefix improved at round i-1), which is
  what makes the operator restatable round-for-round in SQL for the
  correctness oracle.

Scale shape: state size is bounded by |sources| x reachable nodes; both the
frontier and the edge view shuffle on the same 8-byte-hashable key every
round (AQE reuses the exchange); rounds are bounded by ``max_hops`` (the
gds maxIterations analogue) or by frontier exhaustion, whichever first.
Negative weights are rejected up front — with hop-bounded semantics they
would silently change meaning, and no GDS weighted-path mode accepts them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_sssp(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str = "weight",
    max_hops: int = 10,
    directed: bool = True,
    return_pred: bool = False,
    on_truncation: str = "ignore",
) -> DataFrame:
    """(source, node, dist): cheapest path cost from each id in ``sources``
    to every node reachable within ``max_hops`` edges, following
    ``weight_col`` (non-negative; parallel edges keep their cheapest copy).

    ``dist`` preserves the weight column's type family: integer weights
    stay exact integers (the oracle hashes them bit-for-bit), doubles
    accumulate as left-to-right per-path sums — identical across engines
    because each path's cost is folded in hop order, never reassociated.

    ``directed=False`` relaxes across both orientations (the GDS
    UNDIRECTED relationship projection).

    ``on_truncation="raise"`` raises RuntimeError when ``max_hops`` rounds
    complete with the frontier still improving — i.e. when the hop bound
    actually cut distances off.  The default ``"ignore"`` keeps the
    documented hop-bounded semantics (gds maxIterations); callers promising
    EXACT results (the CALL gds.allShortestPaths / closeness surface) pass
    ``"raise"`` so a long-diameter graph fails loudly instead of returning
    silently short distances.

    ``return_pred=True`` adds a ``pred`` column (null at sources): the
    neighbor the cheapest path arrives from, tie-broken by (dist, pred) —
    deterministic, and (because only strictly-improving candidates can set
    it, and any strict improvement is offered by a node improved exactly
    one round earlier) identical whether rounds relax from the frontier or
    from the full settled set, which is what lets the SQL oracle restate
    it.  Feed the result to :func:`sssp_paths` for rendered paths — the
    gds.shortestPath STREAM shape.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    if on_truncation not in ("ignore", "raise"):
        raise ValueError("on_truncation must be 'ignore' or 'raise'")
    e = edges.select("src", "dst", F.col(weight_col).alias("w"))
    if directed is False:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    bad = e.filter((F.col("w") < 0) | F.col("w").isNull()).limit(1).count()
    if bad:
        # nulls would otherwise propagate as null path costs that win no
        # min() yet stay in the frontier forever — reject up front like
        # negatives rather than silently dropping the edge
        raise ValueError("weighted_sssp requires non-negative, non-null weights")
    # parallel edges: cheapest copy only — fewer candidate rows per round
    e = e.groupBy("src", "dst").agg(F.min("w").alias("w")).localCheckpoint(eager=True)

    dist = (
        sources.select(F.col("id").alias("source"), F.col("id").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast(dict(e.dtypes)["w"]))
        .withColumn("pred", F.lit(None).cast("string"))
        .localCheckpoint(eager=True)
    )
    frontier = dist

    for _ in range(max_hops):
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(
                "source",
                F.col("dst").alias("node"),
                F.struct(
                    (F.col("dist") + F.col("w")).alias("nd"),
                    F.col("src").cast("string").alias("pred"),
                ).alias("c"),
            )
            .groupBy("source", "node")
            .agg(F.min("c").alias("c"))
            .select("source", "node", F.col("c.nd").alias("nd"), F.col("c.pred").alias("npred"))
        )
        better = F.col("dist").isNull() | (F.col("nd") < F.col("dist"))
        # the improved-row count rides the checkpoint job as an Observation
        # metric instead of a separate limit(1).count() job per round
        from pyspark.sql import Observation

        obs = Observation()
        merged = (
            dist.join(cand, ["source", "node"], "full")
            .select(
                "source",
                "node",
                F.when(better, F.col("nd")).otherwise(F.col("dist")).alias("dist"),
                F.when(better, F.col("npred")).otherwise(F.col("pred")).alias("pred"),
                better.alias("improved"),
            )
            .observe(
                obs, F.sum(F.when(F.col("improved"), 1).otherwise(0)).alias("imp")
            )
        ).localCheckpoint(eager=True)
        n_improved = obs.get["imp"] or 0
        frontier = merged.filter("improved").select("source", "node", "dist", "pred")
        dist = merged.select("source", "node", "dist", "pred")
        if n_improved == 0:
            break
    else:
        if on_truncation == "raise" and n_improved != 0:
            raise RuntimeError(
                f"weighted_sssp still improving after max_hops={max_hops} "
                "rounds; raise max_hops or accept hop-bounded semantics"
            )
    return dist if return_pred else dist.drop("pred")


def sssp_paths(pred_frame: DataFrame, max_hops: int = 10) -> DataFrame:
    """(source, node, dist, path, truncated): render each
    ``weighted_sssp(return_pred=True)`` row's cheapest path as
    "source->...->node" by walking predecessor pointers — ``max_hops``
    chained equi-joins, each prepending one hop, all rows in parallel (never
    a per-path driver loop).  ``truncated`` marks rows whose chain did not
    terminate within ``max_hops`` (only possible via zero-weight cycles —
    with strictly positive weights every chain strictly descends in dist)."""
    p = pred_frame.select(
        "source",
        "node",
        "dist",
        F.array(F.col("node")).alias("rp"),
        F.col("pred").alias("cur"),
    )
    hop = pred_frame.select(
        "source", F.col("node").alias("cur"), F.col("pred").alias("nxt")
    )
    for _ in range(max_hops):
        if p.filter(F.col("cur").isNotNull()).limit(1).count() == 0:
            break
        walking = F.col("cur").isNotNull()
        p = (
            p.join(hop, ["source", "cur"], "left")
            .select(
                "source",
                "node",
                "dist",
                F.when(walking, F.concat(F.array(F.col("cur")), F.col("rp")))
                .otherwise(F.col("rp"))
                .alias("rp"),
                F.when(walking, F.col("nxt")).otherwise(F.lit(None)).alias("cur"),
            )
            .localCheckpoint(eager=True)
        )
    return p.select(
        "source",
        "node",
        "dist",
        F.concat_ws("->", "rp").alias("path"),
        F.col("cur").isNotNull().alias("truncated"),
    )
