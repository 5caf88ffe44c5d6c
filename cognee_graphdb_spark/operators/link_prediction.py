"""Link prediction scores — the GDS alpha.linkprediction family.

The reference reaches graph analytics through the GDS surface
(cognee/infrastructure/databases/graph/neo4j_driver/neo4j_metrics_utils.py);
gds.alpha.linkprediction.{adamicAdar, commonNeighbors, resourceAllocation,
preferentialAttachment} are the standard missing-edge scorers a graph memory
layer uses to propose new relationships between entities that share
neighbors but were never extracted together.

Spark-first layout: candidate pairs are WEDGES — one self-equi-join of the
adjacency on the center node — scored with partial-aggregated folds, then
existing edges are removed with one anti-join.  The wedge join is the only
super-linear stage: its fan-out is Σ_z deg(z)², so a single celebrity hub
dominates cost and (for Adamic-Adar) contributes almost nothing to any
pair's score (1/ln(deg) → 0).  ``max_degree`` caps it — the same
hot-key-cap discipline as dedup's ``max_df`` — with the documented recall
trade: pairs whose ONLY common neighbors are capped hubs are not emitted.

Float discipline: Adamic-Adar / resource-allocation sums fold over the
pair's common neighbors in SORTED neighbor order (array_sort +
F.aggregate — the betweenness discipline), so scores are bit-stable across
partitionings and engines and the oracle can restate them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_METRICS = (
    "adamic_adar",
    "common_neighbors",
    "resource_allocation",
    "preferential_attachment",
)


def link_prediction(
    edges: DataFrame,
    metric: str = "adamic_adar",
    max_degree: int | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """(u, v, score) for every non-adjacent pair with ≥1 common neighbor on
    the UNDIRECTED simple graph (u < v canonical; self-loops dropped;
    existing edges excluded — they are not "links to predict").

    - ``adamic_adar``: Σ_z 1/ln(deg(z)) over common neighbors z (wedge
      centers always have deg ≥ 2, so the log is never 0);
    - ``common_neighbors``: |Γ(u) ∩ Γ(v)| (exact integer);
    - ``resource_allocation``: Σ_z 1/deg(z);
    - ``preferential_attachment``: deg(u) · deg(v) (exact integer) — scored
      over the same candidate set, keeping one pair generator for all four.

    ``max_degree`` excludes wedge CENTERS above the cap (hub cost cap, see
    module docstring); ``top_k`` returns the best pairs by
    (score desc, u, v) via a single TakeOrdered."""
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}")
    sym = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    adj = sym.join(deg, "src").select(
        F.col("src").alias("z"), F.col("dst").alias("n"), F.col("deg").alias("dz")
    )
    if max_degree is not None:
        adj = adj.filter(F.col("dz") <= max_degree)
    a = adj.select("z", "dz", F.col("n").alias("u"))
    b = adj.select("z", F.col("n").alias("v"))
    wedges = a.join(b, "z").where(F.col("u") < F.col("v"))
    pairs = wedges.join(
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    if metric == "common_neighbors":
        scored = pairs.groupBy("u", "v").agg(
            F.count(F.lit(1)).cast("long").alias("score")
        )
    elif metric == "preferential_attachment":
        du = deg.select(F.col("src").alias("u"), F.col("deg").alias("du"))
        dv = deg.select(F.col("src").alias("v"), F.col("deg").alias("dv"))
        scored = (
            pairs.select("u", "v")
            .distinct()
            .join(du, "u")
            .join(dv, "v")
            .select("u", "v", (F.col("du") * F.col("dv")).cast("long").alias("score"))
        )
    else:
        # fold common-neighbor terms in sorted z order: bit-stable across
        # partitionings AND engines (list(... ORDER BY z) + list_reduce on
        # the oracle side)
        scored = (
            pairs.groupBy("u", "v")
            .agg(F.array_sort(F.collect_list(F.struct("z", "dz"))).alias("zs"))
            .select(
                "u",
                "v",
                F.round(
                    F.aggregate(
                        "zs", F.lit(0.0), lambda acc, s: acc + _term(s, metric)
                    ),
                    6,
                ).alias("score"),
            )
        )
    if top_k is not None:
        scored = scored.orderBy(F.col("score").desc(), "u", "v").limit(top_k)
    return scored


def _term(s, metric: str):
    dz = s["dz"].cast("double")
    return (F.lit(1.0) / F.log(dz)) if metric == "adamic_adar" else (F.lit(1.0) / dz)
