"""Density-based clustering over embedding columns — DBSCAN re-expressed
Spark-first (Ester et al. 1996; the GDS family's gds.kmeans/gds.dbscan
sit on the same metric surface the reference exposes, cognee reference
neo4j_driver/neo4j_metrics_utils.py:8-190, and a training-data pipeline
wants exactly this: topic islands, outlier/noise detection, and
cluster-balanced sampling over document embeddings).

DBSCAN decomposes into three operators this engine already scales:

1. the ε-neighbor graph — cosine similarity ≥ ``threshold`` pairs from
   :func:`~cognee_graphdb_spark.operators.dedup.embedding_near_duplicates`
   (random-hyperplane LSH buckets at scale, exact within-bucket math;
   the candidate generator is bucketed, never all-pairs);
2. core points — one partial-agg neighbor count;
3. clusters — alternating-star connected components over the CORE-CORE
   subgraph (the DBSCAN theorem: density-reachability restricted to core
   points is an equivalence, so plain CC on that subgraph IS the
   clustering), then border points attach to the smallest neighboring
   core cluster and everything else is noise.

Every step is a join/agg on the pair list — no per-point iteration, no
driver loop; the LSH recall knob is the same one the dedup family
documents (recall < 1 by design at lsh_bits > 0; 0 = exact for small or
pre-sampled data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.dedup import (
    _spherical_kmeans,
    _unit_rows,
    embedding_near_duplicates,
)
from cognee_graphdb_spark.operators.graph_metrics import connected_components


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    hasher: str = "xxhash64",
    seed: int = 41,
) -> DataFrame:
    """(id, cluster, sim): deterministic spherical k-means over an embedding
    column — gds.kmeans on the GDS surface the reference exposes (cognee
    reference neo4j_driver/neo4j_metrics_utils.py:8-190), computed by
    SemDeDup's clustering core extracted as a first-class operator
    (operators/dedup.py:_spherical_kmeans; Abbas et al. 2023): seeds are
    the ``k`` smallest (seeded hash(id), id) rows, assignment maximizes
    the unit-vector dot product against the k·d centroid literals (tie ->
    lowest cluster index), recentering renormalizes the elementwise mean.
    ``sim`` is the final cosine similarity to the assigned centroid
    (1 - sim = the cosine distanceFromCentroid gds.kmeans streams).

    End-to-end deterministic (no RNG), so two runs — and the SemDeDup
    internal — agree exactly; parity is pytest-pinned."""
    if k < 1:
        raise ValueError("k must be >= 1")
    unit = _unit_rows(embeddings, id_col, vector_col)
    final = _spherical_kmeans(unit, k=k, n_iter=n_iter, hasher=hasher, seed=seed)
    return final.select("id", "cluster", "sim")


def dbscan(
    embeddings: DataFrame,
    threshold: float = 0.8,
    min_pts: int = 4,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    lsh_bits: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """(id, kind, cluster): DBSCAN over cosine similarity — ε-neighbors are
    pairs with cos_sim ≥ ``threshold`` (similarity form of the ε-ball), a
    CORE point has ≥ ``min_pts`` points in its neighborhood INCLUDING
    itself (the classic |N_ε(p)| ≥ minPts with p ∈ N_ε(p)), clusters are
    connected components of the core-core subgraph labeled by their
    smallest core id, BORDER points attach to the smallest cluster label
    among their core neighbors, and everything else is ``noise`` with a
    NULL cluster.  All output columns are strings — float-hash-safe for
    the correctness oracle."""
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    # pair generation orders ids under their ORIGINAL type; labels below
    # compare as STRINGS (lexicographic min — the SQL-restatable order), so
    # the cast happens here, after generation and before any label math
    pairs = (
        embedding_near_duplicates(
            embeddings,
            threshold=threshold,
            id_col=id_col,
            vector_col=vector_col,
            lsh_bits=lsh_bits,
            dim=dim,
        )
        .select(
            F.col("id_a").cast("string").alias("id_a"),
            F.col("id_b").cast("string").alias("id_b"),
        )
        .localCheckpoint(eager=True)
    )
    ids = embeddings.select(F.col(id_col).cast("string").alias("id")).distinct()
    sym = pairs.select(F.col("id_a").alias("id"), F.col("id_b").alias("nb")).unionByName(
        pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nb"))
    )
    deg = sym.groupBy("id").agg(F.count(F.lit(1)).alias("n_other"))
    # |N(p)| >= min_pts with p in N(p)  <=>  n_other >= min_pts - 1; the
    # left join keeps ISOLATED points in play (n_other = 0), which matters
    # exactly at min_pts = 1 where every point is its own core
    core = (
        ids.join(deg, "id", "left")
        .filter(F.coalesce("n_other", F.lit(0)) >= min_pts - 1)
        .select("id")
        .localCheckpoint(eager=True)
    )
    core_edges = (
        pairs.join(core.withColumnRenamed("id", "id_a"), "id_a", "left_semi")
        .join(core.withColumnRenamed("id", "id_b"), "id_b", "left_semi")
        .select(
            F.col("id_a").alias("src"),
            F.col("id_b").alias("dst"),
            F.lit("eps").alias("relationship_name"),
        )
    )
    # hash_ids=False: the component label is the lexicographically smallest
    # member id — exactly restatable in SQL (min over a recursive closure),
    # unlike a min-xxhash64 label
    clusters = connected_components(core, core_edges, hash_ids=False).select(
        "id", F.col("component").alias("cluster")
    )
    border = (
        sym.join(core.withColumnRenamed("id", "nb"), "nb", "left_semi")
        .join(core, "id", "left_anti")
        .join(clusters.withColumnRenamed("id", "nb"), "nb")
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )
    labeled = clusters.select("id", F.lit("core").alias("kind"), "cluster").unionByName(
        border.select("id", F.lit("border").alias("kind"), "cluster")
    )
    # materialize the (node-sized) labeling: dbscan is already eager (pairs /
    # core / the CC rounds all checkpoint), but the TAIL — the CC label
    # mapping, the border attachment joins, and this union — stayed lazy, so
    # a consumer that reads the result more than once (cluster_balanced_sample
    # scans its input five times: noise split, degree, prefilter, fallback,
    # window) re-executed the whole tail per scan: the composed
    # dbscan→sample plan measured 358 Exchanges / 797 operators at sf0.1.
    # One checkpoint collapses every rescan to an in-memory read.
    return (
        ids.join(labeled, "id", "left")
        .select(
            "id",
            F.coalesce("kind", F.lit("noise")).alias("kind"),
            F.col("cluster").cast("string").alias("cluster"),
        )
        .localCheckpoint(eager=True)
    )
