import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.graph_sampling import neighbor_sample


def _blocks(spark, edges, roots, fanouts, **kw):
    e = spark.createDataFrame(edges, ["src", "dst"])
    r = spark.createDataFrame([(i,) for i in roots], ["id"])
    out = neighbor_sample(e, r, fanouts, **kw)
    return {(x["root"], x["layer"], x["src"], x["dst"]) for x in out.collect()}


def test_fanout_bounds_per_node(spark):
    edges = [("a", f"b{i}") for i in range(10)] + [(f"b{i}", f"c{j}") for i in range(10) for j in range(5)]
    got = _blocks(spark, edges, ["a"], [3, 2])
    l1 = {t for t in got if t[1] == 1}
    l2 = {t for t in got if t[1] == 2}
    assert len(l1) == 3 and all(t[2] == "a" for t in l1)
    # each sampled layer-1 neighbor contributes at most 2 layer-2 edges
    per_src = {}
    for t in l2:
        per_src.setdefault(t[2], set()).add(t[3])
    assert set(per_src) == {t[3] for t in l1}
    assert all(len(v) == 2 for v in per_src.values())


def test_deterministic_and_seed_sensitive(spark):
    edges = [("a", f"b{i}") for i in range(10)]
    one = _blocks(spark, edges, ["a"], [4])
    two = _blocks(spark, edges, ["a"], [4])
    assert one == two
    other = _blocks(spark, edges, ["a"], [4], seed=99)
    assert {t[3] for t in other} != {t[3] for t in one}


def test_shared_node_sees_same_neighbors_for_all_roots(spark):
    # hub h has many out-neighbors; both roots reach h at layer 1 and must
    # sample the SAME layer-2 block (rank is root-independent)
    edges = [("r1", "h"), ("r2", "h")] + [("h", f"x{i}") for i in range(8)]
    got = _blocks(spark, edges, ["r1", "r2"], [1, 3])
    b1 = {t[3] for t in got if t[0] == "r1" and t[1] == 2}
    b2 = {t[3] for t in got if t[0] == "r2" and t[1] == 2}
    assert b1 == b2 and len(b1) == 3


def test_undirected_and_validation(spark):
    got = _blocks(spark, [("a", "b")], ["b"], [2], directed=False)
    assert got == {("b", 1, "b", "a")}
    with pytest.raises(ValueError, match="fanouts"):
        _blocks(spark, [("a", "b")], ["a"], [])
    with pytest.raises(ValueError, match="fanouts"):
        _blocks(spark, [("a", "b")], ["a"], [2, 0])


def test_self_loops_excluded_and_dedup(spark):
    got = _blocks(spark, [("a", "a"), ("a", "b"), ("a", "b")], ["a"], [5])
    assert got == {("a", 1, "a", "b")}


def test_hub_cap_prefilter_matches_full_ranking(spark):
    """The hub-cap prefilter (r9 watch item) must be invisible in the
    output: on a 2000-degree hub (degree >> margin·K, so the quantile
    prefilter actually engages) the sampled block equals the top-K of the
    FULL (hash, dst) ranking computed independently here."""
    from pyspark.sql.window import Window

    from cognee_graphdb_spark.operators.dedup import _hash64

    k = 2  # margin·K = 16 << 2000 — the prefilter drops ~99% of the hub's list
    edges = [("hub", f"n{i:04d}") for i in range(2000)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    expected_rank = e.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("src").orderBy(
                _hash64(F.concat_ws("|", "src", "dst"), 11, "xxhash64"), F.col("dst")
            )
        ),
    ).filter(F.col("rnk") <= k)
    expected = {r["dst"] for r in expected_rank.collect()}
    got = _blocks(spark, edges, ["hub"], [k])
    assert {t[3] for t in got} == expected
    assert len(got) == k


def test_hub_cap_handles_narrow_range_hashers(spark):
    """md5_64 hashes land in [0, 2^60) — NOT the full signed-int64 range a
    naive quantile would assume (the r10 bug: a fixed-codomain cut kept
    ZERO rows per key and the keys silently vanished).  The observed-range
    normalization + zero-kept fallback must keep md5_64 output identical to
    the full ranking, and every frontier key must survive layer 2."""
    from pyspark.sql.window import Window

    from cognee_graphdb_spark.operators.dedup import _hash64

    k = 2
    edges = [("hub", f"n{i:04d}") for i in range(500)] + [
        (f"n{i:04d}", f"m{i}_{j}") for i in range(500) for j in range(60)
    ]
    e = spark.createDataFrame(edges, ["src", "dst"])
    expected_rank = e.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("src").orderBy(
                _hash64(F.concat_ws("|", "src", "dst"), 11, "md5_64"), F.col("dst")
            )
        ),
    ).filter(F.col("rnk") <= k)
    exp_l1 = {r["dst"] for r in expected_rank.filter(F.col("src") == "hub").collect()}
    got = _blocks(spark, edges, ["hub"], [k, k], hasher="md5_64")
    assert {t[3] for t in got if t[1] == 1} == exp_l1
    # every sampled layer-1 neighbor (degree 60 each, above the margin*K
    # cut) contributes exactly k layer-2 edges — none vanish
    l2_srcs = {t[2] for t in got if t[1] == 2}
    assert l2_srcs == exp_l1
    exp_l2 = {
        (r["src"], r["dst"])
        for r in expected_rank.filter(F.col("src").isin(list(exp_l1))).collect()
    }
    assert {(t[2], t[3]) for t in got if t[1] == 2} == exp_l2


def test_empty_edges_yield_empty_blocks(spark):
    e = spark.createDataFrame([], "src string, dst string")
    r = spark.createDataFrame([("a",)], ["id"])
    assert neighbor_sample(e, r, [2]).count() == 0
