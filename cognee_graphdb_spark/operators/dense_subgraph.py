"""Dense-subgraph mining: k-truss.

The k-truss (Cohen 2008, "Trusses: cohesive subgraphs for social network
analysis") is the edge analogue of the k-core the engine already ships
(graph_metrics.k_core/coreness — the GDS kcore family): the maximal
subgraph in which every EDGE participates in at least k-2 triangles.  It is
the standard cohesion filter a near-duplicate or entity-link pair graph
gets before cluster collapse — a truss edge is corroborated by mutual
neighbors, a non-truss edge is a lone (often spurious) link.

Spark-first layout, hub-safe like triangle_clustering: each peel round
re-counts per-edge triangle support via the DEGREE-ORDERED ORIENTATION
(Latapy 2008) — every undirected edge oriented low→high rank, wedges
enumerated only among oriented out-neighbors (out-degree O(sqrt(E))
regardless of real degree), each triangle found exactly once and credited
to its three edges — then drops edges below support k-2 and repeats until
a fixpoint.  Rounds are bounded by the peel depth, not |V|; each round is
two co-partitioned equi-joins + one partial-agg count.

Convergence contract (the k_core/coreness advisor lesson): when the loop
exhausts ``max_rounds`` WITHOUT observing an empty removal set, one extra
verification pass re-checks — only a genuinely unconverged graph raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    return (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )


def _support(canon: DataFrame) -> DataFrame:
    """(u, v, support) for every canonical edge: its triangle count under
    the current edge set, via degree-ordered oriented wedge enumeration."""
    sym = canon.unionByName(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranked = (
        sym.join(deg.withColumnRenamed("u", "u_"), sym["u"] == F.col("u_"))
        .drop("u_")
        .withColumnRenamed("deg", "du")
        .join(deg.withColumnRenamed("u", "v_"), F.col("v") == F.col("v_"))
        .drop("v_")
        .withColumnRenamed("deg", "dv")
    )
    oriented = ranked.filter(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    ).select(F.col("u").alias("c"), F.col("v").alias("n"), F.col("dv").alias("dn"))
    w1 = oriented.select(F.col("c"), F.col("n").alias("a"), F.col("dn").alias("da"))
    w2 = oriented.select(F.col("c"), F.col("n").alias("b"), F.col("dn").alias("db"))
    wedges = w1.join(w2, "c").filter(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    )
    tri = wedges.join(
        oriented.select(F.col("c").alias("a"), F.col("n").alias("b")),
        ["a", "b"],
        "leftsemi",
    ).select("c", "a", "b")
    # credit the triangle {c, a, b} to its three canonical edges
    credits = (
        tri.select(F.least("c", "a").alias("u"), F.greatest("c", "a").alias("v"))
        .unionAll(tri.select(F.least("c", "b").alias("u"), F.greatest("c", "b").alias("v")))
        .unionAll(tri.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")))
    )
    sup = credits.groupBy("u", "v").agg(F.count(F.lit(1)).alias("support"))
    return canon.join(sup, ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def k_truss(edges: DataFrame, k: int, max_rounds: int = 50) -> DataFrame:
    """(u, v, support): the k-truss of the undirected simple graph — the
    surviving canonical edges with their FINAL support (≥ k-2 each).  k=2
    returns every triangle-or-not edge (support ≥ 0), k=3 keeps edges in at
    least one triangle, etc."""
    if k < 2:
        raise ValueError("k must be >= 2")
    cur = _canonical(edges).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        scored = _support(cur).localCheckpoint(eager=True)
        kept = scored.filter(F.col("support") >= k - 2)
        if kept.count() == cur.count():
            return kept
        cur = kept.select("u", "v").localCheckpoint(eager=True)
        if cur.limit(1).count() == 0:
            return kept
    # loop exhausted exactly at the fixpoint boundary: one verification pass
    # (the k_core/coreness lesson — convergence is only observable one round
    # after it happens)
    scored = _support(cur)
    kept = scored.filter(F.col("support") >= k - 2)
    if kept.count() == cur.count():
        return kept
    raise RuntimeError(f"k_truss did not converge within {max_rounds} rounds")