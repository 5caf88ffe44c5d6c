"""Cross-procedure GDS chaining over cataloged projections.

The mutate mode is generic over any (nodeId, value) stream, so the r12c
procedures compose with the r12b catalog without new plumbing — these tests
pin the two workflows the new routes exist for: feature-prep -> clustering
(scaleProperties.mutate -> kmeans.stream) and community-quality scoring over
a mutated labeling (wcc.mutate -> modularity.stats).
"""

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.plans.cypher import run_cypher


@pytest.fixture()
def feature_graph(spark):
    # two well-separated value clusters in (price, size) feature space
    rows = [(f"lo{i}", 10.0 + i, 1.0 + i) for i in range(5)] + [
        (f"hi{i}", 900.0 + i, 90.0 + i) for i in range(5)
    ]
    nodes = spark.createDataFrame(rows, "id string, price double, size double")
    edges = spark.createDataFrame(
        [], "src string, dst string, relationship_name string"
    )
    return nodes, edges


def test_scale_mutate_then_kmeans_stream(spark, feature_graph):
    """gds.scaleProperties.mutate writes the scaled vector into the cached
    projection; gds.kmeans.stream clusters it via the nodeProperty config —
    the GDS feature-preparation workflow end to end.  The two value blobs
    are separated by ~0.9 in every MinMax dimension, so k=2 must put lo*
    and hi* in different clusters."""
    nodes, edges = feature_graph
    name = "scale_kmeans_chain"
    run_cypher(spark, nodes, edges, f"CALL gds.graph.drop('{name}', false)").collect()
    run_cypher(spark, nodes, edges, f"CALL gds.graph.project('{name}', '*', '*')").collect()
    try:
        [st] = run_cypher(
            spark, nodes, edges,
            f"CALL gds.scaleProperties.mutate('{name}', "
            "{mutateProperty: 'scaled', nodeProperties: ['price', 'size'], "
            "scaler: 'MinMax'}) "
            "YIELD nodePropertiesWritten, mutateProperty "
            "RETURN nodePropertiesWritten, mutateProperty;",
        ).collect()
        assert st["nodePropertiesWritten"] == 10
        assert st["mutateProperty"] == "scaled"
        got = run_cypher(
            spark, nodes, edges,
            f"CALL gds.kmeans.stream('{name}', "
            "{k: 2, maxIterations: 5, nodeProperty: 'scaled'}) "
            "YIELD nodeId, communityId RETURN nodeId, communityId;",
        ).collect()
        clusters = {r["nodeId"]: r["communityId"] for r in got}
        assert len(clusters) == 10
        lo = {clusters[k] for k in clusters if k.startswith("lo")}
        hi = {clusters[k] for k in clusters if k.startswith("hi")}
        assert len(lo) == 1 and len(hi) == 1 and lo != hi
    finally:
        run_cypher(spark, nodes, edges, f"CALL gds.graph.drop('{name}')").collect()


def test_wcc_mutate_then_modularity_stats(spark):
    """Components ARE a maximal-internal clustering: over two disjoint
    triangles, Q of the wcc labeling is 2 * (12*6 - 36)/144 = 0.5 — the
    whole-clustering scalar through the mutate -> stats chain."""
    nodes = spark.createDataFrame(
        [(i, i, "E") for i in "abcxyz"], "id string, name string, type string"
    )
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("a", "c", "r"),
         ("x", "y", "r"), ("y", "z", "r"), ("x", "z", "r")],
        "src string, dst string, relationship_name string",
    )
    name = "wcc_modularity_chain"
    run_cypher(spark, nodes, edges, f"CALL gds.graph.drop('{name}', false)").collect()
    run_cypher(spark, nodes, edges, f"CALL gds.graph.project('{name}', '*', '*')").collect()
    try:
        run_cypher(
            spark, nodes, edges,
            f"CALL gds.wcc.mutate('{name}', {{mutateProperty: 'community'}}) "
            "YIELD nodePropertiesWritten RETURN nodePropertiesWritten;",
        ).collect()
        [tot] = run_cypher(
            spark, nodes, edges,
            f"CALL gds.modularity.stats('{name}', "
            "{communityProperty: 'community'}) "
            "YIELD communityCount, modularity RETURN communityCount, modularity;",
        ).collect()
        assert tot["communityCount"] == 2
        assert round(tot["modularity"], 9) == 0.5
    finally:
        run_cypher(spark, nodes, edges, f"CALL gds.graph.drop('{name}')").collect()
