"""Bucketed storage layout — shuffle-free co-located graph joins (SCALE.md
§Storage layout).

At 100 TB the hot graph joins are endpoint resolution (edges ⋈ nodes on
src/dst) and frontier expansion.  Hash-bucketing both tables on the join key
with the SAME bucket count makes those joins shuffle-free: Spark's bucketed
SortMergeJoin pairs up matching buckets directly — no Exchange on either
side, verified by ``tests/test_plan_quality.py`` asserting the physical plan
contains no Exchange operator.

This is the local parquet stand-in for ``CLUSTERED BY`` on a real table
format (Delta/Iceberg/Hive); the reference's kuzu storage gets the same
effect from its primary-key index (adapter.py node-table lookups).  Writes go
through ``saveAsTable`` because bucket metadata lives in the session catalog
— a path-based ``.parquet()`` write silently drops it.

Layout written by :func:`write_bucketed_graph`:

- ``<db>.nodes``          bucketed+sorted by ``id``
- ``<db>.edges_by_src``   bucketed+sorted by ``src``
- ``<db>.edges_by_dst``   the same rows bucketed+sorted by ``dst`` — the
  classic both-directions mirror: storage is doubled so that BOTH endpoint
  resolutions are co-located scans (the same trade every graph engine makes
  for adjacency in both directions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_graph(
    nodes: DataFrame,
    edges: DataFrame,
    database: str = "graph_bucketed",
    buckets: int = 16,
    location: str | None = None,
) -> None:
    """Write (nodes, edges) as bucketed catalog tables.

    ``buckets`` should be sized so one bucket of the largest table fits an
    executor's scan budget (at 100 TB: hundreds-to-thousands, a power of two
    so repartitioning to a divisor stays aligned).
    """
    spark = nodes.sparkSession
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")
    (
        nodes.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "id")
        .sortBy("id")
        .saveAsTable(f"{database}.nodes")
    )
    (
        edges.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "src")
        .sortBy("src")
        .saveAsTable(f"{database}.edges_by_src")
    )
    (
        edges.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "dst")
        .sortBy("dst")
        .saveAsTable(f"{database}.edges_by_dst")
    )


def resolve_src(spark: SparkSession, database: str = "graph_bucketed") -> DataFrame:
    """Edges with their source node resolved — a co-located join: both scans
    are bucketed on the join key, so the SortMergeJoin has NO Exchange."""
    nodes = spark.table(f"{database}.nodes")
    edges = spark.table(f"{database}.edges_by_src")
    return edges.join(
        nodes.select(F.col("id").alias("src"), F.col("name").alias("src_name"), F.col("type").alias("src_type")),
        "src",
    )


def resolve_dst(spark: SparkSession, database: str = "graph_bucketed") -> DataFrame:
    """Same for the destination side, against the dst-bucketed mirror."""
    nodes = spark.table(f"{database}.nodes")
    edges = spark.table(f"{database}.edges_by_dst")
    return edges.join(
        nodes.select(F.col("id").alias("dst"), F.col("name").alias("dst_name"), F.col("type").alias("dst_type")),
        "dst",
    )


def resolve_triples(spark: SparkSession, database: str = "graph_bucketed") -> DataFrame:
    """Full (src node)-[rel]->(dst node) resolution.

    The src join is bucket-co-located (no Exchange); the dst join then needs
    ONE Exchange of the intermediate stream (it is partitioned by src at that
    point) while the nodes side still reads bucketed — half the shuffle of
    the unbucketed plan, and the only unavoidable data movement.
    """
    out = resolve_src(spark, database)
    nodes = spark.table(f"{database}.nodes")
    return out.join(
        nodes.select(F.col("id").alias("dst"), F.col("name").alias("dst_name"), F.col("type").alias("dst_type")),
        "dst",
    )
