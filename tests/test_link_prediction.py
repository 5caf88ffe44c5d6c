import math

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.link_prediction import link_prediction


def _graph(spark):
    # z1 connects a,b,c; z2 connects a,b; a-b is ALSO a real edge
    edges = [
        ("z1", "a"), ("z1", "b"), ("z1", "c"),
        ("z2", "a"), ("z2", "b"),
        ("a", "b"),
    ]
    return spark.createDataFrame(edges, ["src", "dst"])


def _scores(spark, metric, **kw):
    out = link_prediction(_graph(spark), metric=metric, **kw)
    return {(r["u"], r["v"]): r["score"] for r in out.collect()}


def test_common_neighbors_and_existing_edges_excluded(spark):
    got = _scores(spark, "common_neighbors")
    # a-b is an existing edge -> never predicted, despite 2 common neighbors
    assert ("a", "b") not in got
    assert got[("a", "c")] == 1 and got[("b", "c")] == 1  # via z1
    assert got[("z1", "z2")] == 2  # via a and b
    # z1-c is a real edge; c's only neighbor is z1 -> no (c, z2) wedge? c and
    # z2 share a? a neighbors: z1, z2, b. c neighbors: z1. no common -> absent
    assert ("c", "z2") not in got


def test_adamic_adar_exact_values(spark):
    # deg: z1=3, z2=2, a=3, b=3, c=1
    got = _scores(spark, "adamic_adar")
    assert got[("a", "c")] == round(1 / math.log(3), 6)
    assert got[("z1", "z2")] == round(1 / math.log(3) + 1 / math.log(3), 6)


def test_resource_allocation_and_preferential_attachment(spark):
    ra = _scores(spark, "resource_allocation")
    assert ra[("a", "c")] == round(1 / 3, 6)
    pa = _scores(spark, "preferential_attachment")
    assert pa[("a", "c")] == 3 * 1
    assert pa[("z1", "z2")] == 3 * 2


def test_max_degree_caps_wedge_centers(spark):
    # cap 2: z1 (deg 3) and a/b (deg 3) excluded as centers; only z2 (deg 2)
    # generates wedges -> the single surviving pair is (z1? no: z2's
    # neighbors a,b) -> (a, b) is an existing edge -> empty via z2...
    got = _scores(spark, "common_neighbors", max_degree=2)
    assert got == {}


def test_top_k_and_validation(spark):
    got = link_prediction(_graph(spark), metric="adamic_adar", top_k=1).collect()
    assert len(got) == 1 and (got[0]["u"], got[0]["v"]) == ("z1", "z2")
    with pytest.raises(ValueError, match="metric"):
        link_prediction(_graph(spark), metric="nope")


def test_undirected_and_duplicate_edges_collapse(spark):
    # same graph given with reversed + duplicated edges scores identically
    e = _graph(spark)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    noisy = e.unionByName(rev).unionByName(e)
    a = {(r["u"], r["v"]): r["score"] for r in link_prediction(noisy, "adamic_adar").collect()}
    b = _scores(spark, "adamic_adar")
    assert a == b
