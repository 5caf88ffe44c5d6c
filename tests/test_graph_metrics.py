"""Graph-metrics ground truth ported from the reference
(cognee/tests/tasks/descriptive_metrics/ground_truth_metrics.json +
metrics_test_utils.py:36-60 fixture graphs)."""

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.graph_metrics import connected_components, graph_metrics


def _connected_graph(spark):
    # doc - chunk(part_of) - contains Alice/Alice2 - is_type EntityType + 1 self-loop
    nodes = spark.createDataFrame(
        [(n, n, "t") for n in ["doc", "chunk", "alice", "alice2", "etype"]], ["id", "name", "type"]
    )
    edges = spark.createDataFrame(
        [
            ("chunk", "doc", "part_of"),
            ("chunk", "alice", "contains"),
            ("chunk", "alice2", "contains"),
            ("alice", "etype", "is_type"),
            ("alice2", "etype", "is_type"),
            ("alice", "alice", "self_loop"),
        ],
        ["src", "dst", "relationship_name"],
    )
    return nodes, edges


def _disconnected_graph(spark):
    nodes = spark.createDataFrame(
        [(n, n, "t") for n in ["doc", "chunk", "alice", "alice2", "etype", "doc2", "chunk2", "bob", "etype2"]],
        ["id", "name", "type"],
    )
    edges = spark.createDataFrame(
        [
            ("chunk", "doc", "part_of"),
            ("chunk", "alice", "contains"),
            ("chunk", "alice2", "contains"),
            ("alice", "etype", "is_type"),
            ("alice2", "etype", "is_type"),
            ("chunk2", "doc2", "part_of"),
            ("chunk2", "bob", "contains"),
            ("bob", "etype2", "is_type"),
        ],
        ["src", "dst", "relationship_name"],
    )
    return nodes, edges


def test_connected_graph_metrics(spark):
    nodes, edges = _connected_graph(spark)
    m = graph_metrics(nodes, edges, include_paths=True)
    assert m["num_nodes"] == 5
    assert m["num_edges"] == 6
    assert m["mean_degree"] == pytest.approx(2.4)
    assert m["edge_density"] == pytest.approx(0.3)
    assert m["num_connected_components"] == 1
    assert m["sizes_of_connected_components"] == [5]
    assert m["num_selfloops"] == 1
    assert m["diameter"] == 3
    assert m["avg_shortest_path_length"] == pytest.approx(1.6)
    assert m["avg_clustering"] == pytest.approx(0.0)


def test_disconnected_graph_metrics(spark):
    nodes, edges = _disconnected_graph(spark)
    m = graph_metrics(nodes, edges)
    assert m["num_nodes"] == 9
    assert m["num_edges"] == 8
    assert m["mean_degree"] == pytest.approx(16 / 9)
    assert m["edge_density"] == pytest.approx(8 / 72)
    assert m["num_connected_components"] == 2
    assert m["sizes_of_connected_components"] == [5, 4]
    assert m["num_selfloops"] == 0


def test_components_on_long_chain(spark):
    # a 40-node chain — O(diameter) label propagation would need 40 rounds;
    # large-star/small-star must converge well under max_iter=50 AND the
    # result must still be exactly one component
    n = 40
    nodes = spark.createDataFrame([(f"n{i:02d}",) for i in range(n)], ["id"])
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}", "r") for i in range(n - 1)], ["src", "dst", "relationship_name"]
    )
    comp = connected_components(nodes, edges, max_iter=12).collect()
    assert len({r["component"] for r in comp}) == 1
    assert len(comp) == n


@pytest.mark.parametrize("skew_safe", [False, True])
@pytest.mark.parametrize("hash_ids", [False, True])
def test_components_multi_parent_round_not_a_fixpoint(spark, skew_safe, hash_ids):
    # Regression: edges 3-8, 5-8, 5-9, 4-9 reach a depth-1 state where node 5
    # still points at two roots (3 and 4) while no target is a source; the
    # star-test early break must not fire there — the result must be ONE
    # component with exactly one row per node.
    ids = ["3", "4", "5", "8", "9"]
    nodes = spark.createDataFrame([(i,) for i in ids], ["id"])
    edges = spark.createDataFrame(
        [("3", "8", "r"), ("5", "8", "r"), ("5", "9", "r"), ("4", "9", "r")],
        ["src", "dst", "relationship_name"],
    )
    comp = connected_components(
        nodes, edges, skew_safe=skew_safe, hash_ids=hash_ids
    ).collect()
    assert len(comp) == len(ids)
    assert sorted(r["id"] for r in comp) == ids
    assert len({r["component"] for r in comp}) == 1


def test_components_determinism(spark):
    nodes, edges = _disconnected_graph(spark)
    a = sorted(map(tuple, connected_components(nodes, edges).collect()))
    b = sorted(map(tuple, connected_components(nodes, edges).collect()))
    assert a == b


def test_approx_path_metrics_bounds_and_exact_limit(spark):
    from cognee_graphdb_spark.operators.graph_metrics import _path_metrics, approx_path_metrics

    nodes, edges = _connected_graph(spark)
    exact = _path_metrics(nodes, edges)
    # with n_sources >= |V| the sampled BFS IS the exact computation
    full = approx_path_metrics(nodes, edges, n_sources=10)
    assert full == exact
    # with fewer sources the diameter estimate is a valid lower bound
    approx = approx_path_metrics(nodes, edges, n_sources=2, seed=1)
    assert approx["diameter"] <= exact["diameter"]
    assert approx["avg_shortest_path_length"] > 0.0
    # deterministic for a fixed seed
    assert approx == approx_path_metrics(nodes, edges, n_sources=2, seed=1)


def test_triangle_clustering_ground_truth(spark):
    """Exact local clustering coefficients on known graphs — the
    degree-ordered (compact-forward) enumeration must match the naive
    per-node definition."""
    from cognee_graphdb_spark.operators.graph_metrics import triangle_clustering

    # K4: every node in 3 triangles, coefficient 1.0
    ids = ["a", "b", "c", "d"]
    nodes = spark.createDataFrame([(i,) for i in ids], ["id"])
    k4 = spark.createDataFrame(
        [(x, y, "r") for x in ids for y in ids if x < y], ["src", "dst", "relationship_name"]
    )
    out = {r["id"]: r["clustering"] for r in triangle_clustering(nodes, k4).collect()}
    assert out == {i: 1.0 for i in ids}

    # diamond (square + one diagonal a-c): a,c in 2 triangles of 3 possible
    # pairs; b,d in their only pair's triangle
    diamond = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("c", "d", "r"), ("d", "a", "r"), ("a", "c", "r")],
        ["src", "dst", "relationship_name"],
    )
    out = {r["id"]: r["clustering"] for r in triangle_clustering(nodes, diamond).collect()}
    assert out["a"] == pytest.approx(2 / 3) and out["c"] == pytest.approx(2 / 3)
    assert out["b"] == 1.0 and out["d"] == 1.0


def test_triangle_clustering_hub_safe_star(spark):
    """A celebrity hub with 2000 leaves plus one closed triangle: the
    degree-ordered orientation gives the hub out-degree ~0 (all leaf edges
    orient leaf->hub), so the wedge stage emits O(E) pairs, not deg^2 —
    and the counts stay exact."""
    from pyspark.sql import functions as F

    from cognee_graphdb_spark.operators.graph_metrics import triangle_clustering

    n_leaves = 2000
    rows = [("hub", f"leaf{i}", "r") for i in range(n_leaves)]
    rows += [("hub", "x", "r"), ("hub", "y", "r"), ("x", "y", "r")]
    edges = spark.createDataFrame(rows, ["src", "dst", "relationship_name"])
    nodes = edges.select(F.col("src").alias("id")).union(edges.select("dst")).distinct()
    out = {r["id"]: r["clustering"] for r in triangle_clustering(nodes, edges).collect()}
    deg_hub = n_leaves + 2
    assert out["hub"] == pytest.approx(2 * 1 / (deg_hub * (deg_hub - 1)))
    assert out["x"] == 1.0 and out["y"] == 1.0
    assert out["leaf0"] == 0.0


def test_pagerank_cycle_with_dangling(spark):
    """3-cycle plus a dangling feeder: ranks sum to 1, the cycle nodes beat
    the feeder, and the node receiving the feeder's edge ranks highest."""
    from pyspark.sql import functions as F

    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("c", "a", "r"), ("d", "c", "r")],
        ["src", "dst", "relationship_name"],
    )
    nodes = edges.select(F.col("src").alias("id")).union(edges.select("dst")).distinct()
    out = {r["id"]: r["rank"] for r in pagerank(nodes, edges, n_iter=10).collect()}
    assert sum(out.values()) == pytest.approx(1.0)
    assert out["c"] == max(out.values())  # gets the cycle AND the feeder
    assert out["d"] == min(out.values())  # no in-edges: (1-d)/n + dangling share
    assert all(v > 0 for v in out.values())


def test_pagerank_matches_numpy_power_iteration(spark):
    """Same formula as the dense-matrix power iteration on a small random
    digraph (parallel edges collapsed, dangling mass uniform)."""
    import numpy as np
    from pyspark.sql import functions as F

    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    rng = [(f"n{(7 * i) % 23}", f"n{(11 * i + 3) % 23}") for i in range(60)]
    pairs = sorted({(s, d) for s, d in rng})
    edges = spark.createDataFrame(
        [(s, d, "r") for s, d in pairs], ["src", "dst", "relationship_name"]
    )
    nodes = edges.select(F.col("src").alias("id")).union(edges.select("dst")).distinct()
    ids = sorted(r["id"] for r in nodes.collect())
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out_deg = {}
    for s, d in pairs:
        out_deg[s] = out_deg.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    damping = 0.85
    for _ in range(10):
        contrib = np.zeros(n)
        for s, d in pairs:
            contrib[idx[d]] += r[idx[s]] / out_deg[s]
        dangling = sum(r[idx[v]] for v in ids if v not in out_deg)
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    got = {row["id"]: row["rank"] for row in pagerank(nodes, edges, n_iter=10).collect()}
    for v in ids:
        assert got[v] == pytest.approx(r[idx[v]], rel=1e-12)


def test_pagerank_edges_to_unknown_ids_conserve_mass(spark):
    """Edges whose src/dst is NOT in the node frame are ignored (induced
    subgraph): ranks still sum to 1 and equal the run without those edges —
    previously the unknown-dst contribution silently leaked rank mass."""
    from pyspark.sql import functions as F

    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], ["id"])
    clean = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("c", "a", "r")],
        ["src", "dst", "relationship_name"],
    )
    noisy = clean.union(
        spark.createDataFrame(
            [("a", "ghost", "r"), ("ghost", "b", "r")],
            ["src", "dst", "relationship_name"],
        )
    )
    want = {r["id"]: r["rank"] for r in pagerank(nodes, clean, n_iter=8).collect()}
    got = {r["id"]: r["rank"] for r in pagerank(nodes, noisy, n_iter=8).collect()}
    assert got == want
    assert sum(got.values()) == pytest.approx(1.0)


def test_pagerank_tolerance_stops_early(spark):
    """tol checks the L1 delta between consecutive checkpoints: a loose
    tolerance stops at the first checkpoint, a strict one runs all rounds,
    and the converged ranks match the long-run fixpoint."""
    from pyspark.sql import functions as F

    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("c", "a", "r")],
        ["src", "dst", "relationship_name"],
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    # symmetric 3-cycle: already at the fixpoint after round 1, so the first
    # checkpointed delta is 0 < any tol
    _, done = pagerank(nodes, edges, n_iter=30, checkpoint_every=3, tol=1e-9, return_iterations=True)
    assert done == 3  # uniform start IS the fixpoint: first checkpointed delta is 0
    _, done_full = pagerank(nodes, edges, n_iter=9, checkpoint_every=3, return_iterations=True)
    assert done_full == 9


def test_pagerank_personalized_matches_numpy(spark):
    """Personalized PageRank: reset vector AND dangling mass over the seed
    set only — checked against the dense formulation."""
    import numpy as np
    from pyspark.sql import functions as F

    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    pairs = sorted({(f"n{(3 * i) % 11}", f"n{(5 * i + 2) % 11}") for i in range(25)})
    edges = spark.createDataFrame([(s, d, "r") for s, d in pairs], ["src", "dst", "relationship_name"])
    nodes = edges.select(F.col("src").alias("id")).union(edges.select("dst")).distinct()
    seeds = ["n1", "n4"]
    got_df = pagerank(nodes, edges, n_iter=12, personalized=spark.createDataFrame([(s,) for s in seeds], ["id"]))
    got = {r["id"]: r["rank"] for r in got_df.collect()}

    ids = sorted(r["id"] for r in nodes.collect())
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    p = np.zeros(n)
    for s in seeds:
        p[idx[s]] = 1.0 / len(seeds)
    out_deg: dict[str, int] = {}
    for s, d in pairs:
        out_deg[s] = out_deg.get(s, 0) + 1
    r = p.copy()
    d_ = 0.85
    for _ in range(12):
        contrib = np.zeros(n)
        for s, d in pairs:
            contrib[idx[d]] += r[idx[s]] / out_deg[s]
        dm = sum(r[idx[v]] for v in ids if v not in out_deg)
        r = (1 - d_) * p + d_ * (contrib + dm * p)
    for v in ids:
        assert got[v] == pytest.approx(r[idx[v]], rel=1e-9, abs=1e-15)
    # non-seed-reachable mass: ranks still sum to 1
    assert sum(got.values()) == pytest.approx(1.0)


def test_pagerank_personalized_empty_seeds_rejected(spark):
    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    edges = spark.createDataFrame([("a", "b", "r")], ["src", "dst", "relationship_name"])
    nodes = spark.createDataFrame([("a",), ("b",)], ["id"])
    with pytest.raises(ValueError, match="seed"):
        pagerank(nodes, edges, personalized=spark.createDataFrame([], "id string"))


def test_pagerank_personalized_unknown_seeds_renormalized(spark):
    """Seeds absent from `nodes` must not leak teleport mass: the matched
    seeds carry the full distribution (ranks sum to 1), and an all-unknown
    seed set raises instead of silently returning all-zero ranks."""
    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    edges = spark.createDataFrame([("a", "b", "r"), ("b", "a", "r")], ["src", "dst", "relationship_name"])
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], ["id"])
    seeds = spark.createDataFrame([("a",), ("ghost",)], ["id"])
    got = {r["id"]: r["rank"] for r in pagerank(nodes, edges, n_iter=8, personalized=seeds).collect()}
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    only_a = {r["id"]: r["rank"] for r in pagerank(
        nodes, edges, n_iter=8, personalized=spark.createDataFrame([("a",)], ["id"])
    ).collect()}
    for k in got:
        assert got[k] == pytest.approx(only_a[k], rel=1e-12)
    with pytest.raises(ValueError, match="seed"):
        pagerank(nodes, edges, personalized=spark.createDataFrame([("ghost",)], ["id"]))


def test_pagerank_empty_graph(spark):
    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    nodes = spark.createDataFrame([], "id string")
    edges = spark.createDataFrame([], "src string, dst string, relationship_name string")
    assert pagerank(nodes, edges).count() == 0


# --- k-core (gds.kcore family; graph_metrics.py:k_core) ----------------------


def _edges_df(spark, pairs):
    return spark.createDataFrame([(a, b, "r") for a, b in pairs], ["src", "dst", "relationship_name"])


def _nodes_df(spark, ids):
    return spark.createDataFrame([(i, i, "t") for i in ids], ["id", "name", "type"])


def _directed_edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, "r") for a, b in pairs],
        "src string, dst string, relationship_name string",
    )


def test_kcore_clique_with_cascade(spark):
    """K4 plus q→{x,y,p1} and pendant p1: p1 peels in round 1 (deg 1), which
    drops q to deg 2 so it peels in round 2 — a genuine multi-round cascade.
    The 3-core is exactly the K4 with in-core degree 3 each."""
    from cognee_graphdb_spark.operators.graph_metrics import k_core

    clique = [("w", "x"), ("w", "y"), ("w", "z"), ("x", "y"), ("x", "z"), ("y", "z")]
    extra = [("q", "x"), ("q", "y"), ("q", "p1")]
    nodes = _nodes_df(spark, ["w", "x", "y", "z", "q", "p1"])
    out, rounds = k_core(nodes, _edges_df(spark, clique + extra), k=3, return_rounds=True)
    got = {r["id"]: r["core_degree"] for r in out.collect()}
    assert got == {"w": 3, "x": 3, "y": 3, "z": 3}
    assert rounds >= 2


def test_kcore_triangle_empty_for_k3(spark):
    from cognee_graphdb_spark.operators.graph_metrics import k_core

    nodes = _nodes_df(spark, ["a", "b", "c"])
    out = k_core(nodes, _edges_df(spark, [("a", "b"), ("b", "c"), ("c", "a")]), k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "core_degree"]


def test_kcore_cycle_sheds_chain_one_round_per_link(spark):
    """Cycle of 4 with a 3-link tail, k=2: the tail peels one node per round
    (t3 then t2 then t1) while the cycle survives with degree 2."""
    from cognee_graphdb_spark.operators.graph_metrics import k_core

    cyc = [("c1", "c2"), ("c2", "c3"), ("c3", "c4"), ("c4", "c1")]
    tail = [("c1", "t1"), ("t1", "t2"), ("t2", "t3")]
    nodes = _nodes_df(spark, ["c1", "c2", "c3", "c4", "t1", "t2", "t3"])
    out, rounds = k_core(nodes, _edges_df(spark, cyc + tail), k=2, return_rounds=True)
    got = {r["id"]: r["core_degree"] for r in out.collect()}
    assert got == {"c1": 2, "c2": 2, "c3": 2, "c4": 2}
    assert rounds >= 3
    with pytest.raises(RuntimeError, match="converge"):
        k_core(nodes, _edges_df(spark, cyc + tail), k=2, max_rounds=2)


def test_kcore_simple_graph_view(spark):
    """Duplicate edges, reverse duplicates, self-loops, and edges to ids
    outside `nodes` all collapse out of the undirected simple-graph view."""
    from cognee_graphdb_spark.operators.graph_metrics import k_core

    pairs = [
        ("a", "b"), ("b", "a"), ("a", "b"),   # one undirected edge
        ("a", "a"),                            # self-loop: dropped
        ("a", "ghost"), ("ghost2", "b"),      # phantom endpoints: dropped
        ("a", "c"), ("b", "c"),
    ]
    nodes = _nodes_df(spark, ["a", "b", "c"])
    out = k_core(nodes, _edges_df(spark, pairs), k=2)
    got = {r["id"]: r["core_degree"] for r in out.collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_k_validation(spark):
    from cognee_graphdb_spark.operators.graph_metrics import k_core

    nodes = _nodes_df(spark, ["a"])
    with pytest.raises(ValueError, match="k >= 1"):
        k_core(nodes, _edges_df(spark, [("a", "a")]), k=0)


# --- node similarity (gds.nodeSimilarity) ------------------------------------


def test_node_similarity_jaccard_values(spark):
    from cognee_graphdb_spark.operators.graph_metrics import node_similarity

    pairs = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("b", "z"), ("c", "z")]
    nodes = _nodes_df(spark, ["a", "b", "c", "x", "y", "z"])
    out = {
        (r["id_a"], r["id_b"]): (r["intersection"], r["union_size"], r["jaccard"])
        for r in node_similarity(nodes, _edges_df(spark, pairs), top_k=10).collect()
    }
    assert out[("a", "b")] == (2, 3, pytest.approx(2 / 3))
    assert out[("b", "a")] == (2, 3, pytest.approx(2 / 3))
    assert out[("x", "y")] == (2, 2, pytest.approx(1.0))
    assert out[("b", "c")] == (1, 3, pytest.approx(1 / 3))
    assert ("a", "c") not in out  # no shared neighbor


def test_node_similarity_topk_and_ties(spark):
    from cognee_graphdb_spark.operators.graph_metrics import node_similarity

    pairs = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("b", "z"), ("c", "z")]
    nodes = _nodes_df(spark, ["a", "b", "c", "x", "y", "z"])
    top1 = {
        r["id_a"]: r["id_b"]
        for r in node_similarity(nodes, _edges_df(spark, pairs), top_k=1).collect()
    }
    assert top1["x"] == "y"  # J=1 beats J(x,z)=1/3
    assert top1["z"] == "x"  # J(z,x)=J(z,y)=1/3 tie -> smallest partner id


def test_node_similarity_degree_cutoff_excludes_node(spark):
    from cognee_graphdb_spark.operators.graph_metrics import node_similarity

    pairs = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("b", "z"), ("c", "z")]
    nodes = _nodes_df(spark, ["a", "b", "c", "x", "y", "z"])
    out = node_similarity(nodes, _edges_df(spark, pairs), degree_cutoff=2).collect()
    ids = {r["id_a"] for r in out} | {r["id_b"] for r in out}
    assert "c" not in ids  # deg(c)=1 < cutoff: excluded from the computation


def test_node_similarity_hub_cap_drops_hub_mediated_pairs(spark):
    from cognee_graphdb_spark.operators.graph_metrics import node_similarity

    hub = [(f"n{i}", "hub") for i in range(6)]
    pairs = hub + [("n0", "w"), ("n1", "w")]
    nodes = _nodes_df(spark, [f"n{i}" for i in range(6)] + ["hub", "w"])
    capped = {
        (r["id_a"], r["id_b"])
        for r in node_similarity(
            nodes, _edges_df(spark, pairs), max_neighbor_degree=3
        ).collect()
    }
    # pairs sharing only the degree-6 hub vanish; the w-mediated pair stays
    assert ("n0", "n1") in capped
    assert ("n2", "n3") not in capped


# --- label propagation (gds.labelPropagation) --------------------------------


def test_label_propagation_two_triangles_stay_separate(spark):
    from cognee_graphdb_spark.operators.graph_metrics import label_propagation

    t1 = [("a", "b"), ("b", "c"), ("c", "a")]
    t2 = [("p", "q"), ("q", "r"), ("r", "p")]
    nodes = _nodes_df(spark, ["a", "b", "c", "p", "q", "r"])
    out = {r["id"]: r["label"] for r in label_propagation(nodes, _edges_df(spark, t1 + t2), n_rounds=4).collect()}
    assert len({out["a"], out["b"], out["c"]}) == 1  # triangle converges
    assert len({out["p"], out["q"], out["r"]}) == 1
    assert out["a"] != out["p"]  # communities never bleed across components


def test_label_propagation_isolated_node_keeps_label(spark):
    from cognee_graphdb_spark.operators.graph_metrics import label_propagation

    nodes = _nodes_df(spark, ["a", "b", "lone"])
    out = {r["id"]: r["label"] for r in label_propagation(nodes, _edges_df(spark, [("a", "b")]), n_rounds=3).collect()}
    assert len(out) == 3
    assert out["lone"] not in (out["a"], out["b"])


def test_label_propagation_hashers_agree_on_partition(spark):
    """md5_64 (oracle) and xxhash64 (production) give different label VALUES
    but the same community co-membership structure."""
    from cognee_graphdb_spark.operators.graph_metrics import label_propagation

    t1 = [("a", "b"), ("b", "c"), ("c", "a"), ("p", "q"), ("q", "r"), ("r", "p")]
    nodes = _nodes_df(spark, ["a", "b", "c", "p", "q", "r"])
    def parts(hasher):
        out = {r["id"]: r["label"] for r in label_propagation(
            nodes, _edges_df(spark, t1), n_rounds=4, hasher=hasher).collect()}
        groups = {}
        for nid, lab in out.items():
            groups.setdefault(lab, set()).add(nid)
        return {frozenset(g) for g in groups.values()}
    assert parts("md5_64") == parts("xxhash64")


def test_kcore_exact_boundary_convergence(spark):
    """A graph whose peel takes EXACTLY max_rounds prune rounds has converged
    — the fixpoint is only observable one iteration later, so the else-branch
    must verify instead of raising (r7 ADVICE finding)."""
    from cognee_graphdb_spark.operators.graph_metrics import k_core

    cyc = [("c1", "c2"), ("c2", "c3"), ("c3", "c4"), ("c4", "c1")]
    tail = [("c1", "t1"), ("t1", "t2"), ("t2", "t3")]
    nodes = _nodes_df(spark, ["c1", "c2", "c3", "c4", "t1", "t2", "t3"])
    # peel drops t3, t2, t1 over exactly 3 rounds
    out = k_core(nodes, _edges_df(spark, cyc + tail), k=2, max_rounds=3)
    got = {r["id"]: r["core_degree"] for r in out.collect()}
    assert got == {"c1": 2, "c2": 2, "c3": 2, "c4": 2}


def test_coreness_clique_tail_and_isolate(spark):
    """K4 (coreness 3) + pendant chain q–p1 (q touches the clique twice →
    coreness 2, p1 → 1) + an isolated node (0) — the full decomposition in
    one call, vs k_core's single-k membership."""
    from cognee_graphdb_spark.operators.graph_metrics import coreness

    clique = [("w", "x"), ("w", "y"), ("w", "z"), ("x", "y"), ("x", "z"), ("y", "z")]
    extra = [("q", "x"), ("q", "y"), ("q", "p1")]
    nodes = _nodes_df(spark, ["w", "x", "y", "z", "q", "p1", "lonely"])
    out = coreness(nodes, _edges_df(spark, clique + extra))
    got = {r["id"]: r["coreness"] for r in out.collect()}
    assert got == {"w": 3, "x": 3, "y": 3, "z": 3, "q": 2, "p1": 1, "lonely": 0}


def test_coreness_agrees_with_kcore_membership(spark):
    """coreness(v) >= k  <=>  v in k_core(k) — checked for every k on a mixed
    graph (cycle + tail + clique bridge)."""
    from cognee_graphdb_spark.operators.graph_metrics import coreness, k_core

    pairs = [
        ("c1", "c2"), ("c2", "c3"), ("c3", "c4"), ("c4", "c1"),
        ("c1", "t1"), ("t1", "t2"),
        ("c2", "w"), ("w", "x"), ("w", "y"), ("x", "y"), ("w", "z"), ("x", "z"), ("y", "z"),
    ]
    ids = sorted({a for p in pairs for a in p})
    nodes = _nodes_df(spark, ids)
    edges = _edges_df(spark, pairs)
    core_num = {r["id"]: r["coreness"] for r in coreness(nodes, edges).collect()}
    for k in (1, 2, 3):
        members = {r["id"] for r in k_core(nodes, edges, k=k).collect()}
        assert members == {i for i, c in core_num.items() if c >= k}, f"k={k}"


def test_coreness_simple_graph_view_and_rounds(spark):
    """Duplicates/self-loops/phantom endpoints collapse; h-index converges
    and reports its round count."""
    from cognee_graphdb_spark.operators.graph_metrics import coreness

    pairs = [("a", "b"), ("b", "a"), ("a", "a"), ("a", "ghost"), ("a", "c"), ("b", "c")]
    nodes = _nodes_df(spark, ["a", "b", "c"])
    out, rounds = coreness(nodes, _edges_df(spark, pairs), return_rounds=True)
    got = {r["id"]: r["coreness"] for r in out.collect()}
    assert got == {"a": 2, "b": 2, "c": 2}
    assert 1 <= rounds <= 3


def test_hyperanf_path_cumulative_and_monotone(spark):
    """On a 5-path, N(t) grows monotonically and saturates at the diameter
    (4 hops); the t_max estimate approximates all 25 reachable pairs within
    the documented raw-HLL error, and effective_diameter lands in [1, 4]."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        approx_neighborhood_function,
        effective_diameter,
    )

    ids = ["p1", "p2", "p3", "p4", "p5"]
    pairs = [("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("p4", "p5")]
    nf = approx_neighborhood_function(
        _nodes_df(spark, ids), _edges_df(spark, pairs), n_rounds=6, m=64
    )
    got = {r["round"]: r["nf_est"] for r in nf.collect()}
    assert sorted(got) == list(range(7))
    vals = [got[t] for t in range(7)]
    assert all(a <= b for a, b in zip(vals, vals[1:]))  # monotone
    assert vals[4] == vals[5] == vals[6]  # saturated at the diameter
    assert vals[0] < vals[4]
    # 25 true pairs; m=64 raw HLL ~13% per-node stddev -> generous band
    assert 12 <= vals[6] <= 50
    assert 1 <= effective_diameter(nf) <= 4


def test_hyperanf_validates_m(spark):
    import pytest as _p

    from cognee_graphdb_spark.operators.graph_metrics import approx_neighborhood_function

    with _p.raises(ValueError, match="power of two"):
        approx_neighborhood_function(
            _nodes_df(spark, ["a"]), _edges_df(spark, [("a", "a")]), m=12
        )


def test_random_walks_edges_real_and_deterministic(spark):
    """Every consecutive (node, next) pair in a walk must be a real edge of
    the undirected view, every start emits num_walks x (walk_length+1) rows
    on a sink-free graph, and two invocations agree bit-for-bit."""
    from cognee_graphdb_spark.operators.graph_metrics import random_walks

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("b", "d")]
    edges = _edges_df(spark, pairs)
    out = random_walks(edges, walk_length=4, num_walks=2, seed=7).collect()
    und = {(u, v) for u, v in pairs} | {(v, u) for u, v in pairs}
    by_walk = {}
    for r in out:
        by_walk.setdefault((r["start"], r["walk"]), {})[r["step"]] = r["node"]
    assert len(by_walk) == 4 * 2  # 4 nodes x 2 walks
    for (start, _), path in by_walk.items():
        assert sorted(path) == [0, 1, 2, 3, 4]  # undirected 4-cycle+chord: no sinks
        assert path[0] == start
        for t in range(4):
            assert (path[t], path[t + 1]) in und
    again = random_walks(edges, walk_length=4, num_walks=2, seed=7).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a different seed must change at least one trajectory on this graph
    other = random_walks(edges, walk_length=4, num_walks=2, seed=8).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_random_walks_directed_sink_truncates(spark):
    """symmetric=False: walks follow edge direction and truncate at sinks —
    a->b->c stops at c (step <= 2), walks from c emit only step 0."""
    from cognee_graphdb_spark.operators.graph_metrics import random_walks

    edges = _edges_df(spark, [("a", "b"), ("b", "c")])
    out = random_walks(edges, walk_length=5, num_walks=1, symmetric=False).collect()
    by_start = {}
    for r in out:
        by_start.setdefault(r["start"], {})[r["step"]] = r["node"]
    assert by_start["a"] == {0: "a", 1: "b", 2: "c"}
    assert by_start["b"] == {0: "b", 1: "c"}
    assert by_start["c"] == {0: "c"}


def test_random_walks_hashers_both_run(spark):
    """md5_64 (oracle mirror) and xxhash64 (production) both produce full
    valid walks; trajectories may differ but shape must match."""
    from cognee_graphdb_spark.operators.graph_metrics import random_walks

    edges = _edges_df(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    for hasher in ("xxhash64", "md5_64"):
        rows = random_walks(edges, walk_length=3, num_walks=1, hasher=hasher).collect()
        assert len(rows) == 3 * 4  # 3 starts x steps 0..3


def test_random_walks_validates_params(spark):
    import pytest as _p

    from cognee_graphdb_spark.operators.graph_metrics import random_walks

    with _p.raises(ValueError, match=">= 1"):
        random_walks(_edges_df(spark, [("a", "b")]), walk_length=0)


def test_walk_skipgram_pairs_counts(spark):
    """Hand-checkable: one fixed 3-step trajectory (built directly, not via
    random_walks) a->b->c->d with window=1 gives exactly the 6 adjacent
    ordered pairs once each; window=2 adds the 4 distance-2 pairs."""
    from cognee_graphdb_spark.operators.graph_metrics import walk_skipgram_pairs

    rows = [("a", 0, t, n) for t, n in enumerate(["a", "b", "c", "d"])]
    walks = spark.createDataFrame(rows, ["start", "walk", "step", "node"])
    w1 = {(r["center"], r["context"]): r["n_pairs"] for r in walk_skipgram_pairs(walks, 1).collect()}
    assert w1 == {
        ("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1,
        ("c", "b"): 1, ("c", "d"): 1, ("d", "c"): 1,
    }
    w2 = walk_skipgram_pairs(walks, 2).collect()
    assert sum(r["n_pairs"] for r in w2) == 6 + 4
    # revisits aggregate: a->b->a with window=1 -> (a,b) twice, (b,a) twice
    loop = spark.createDataFrame(
        [("a", 0, 0, "a"), ("a", 0, 1, "b"), ("a", 0, 2, "a")],
        ["start", "walk", "step", "node"],
    )
    wl = {(r["center"], r["context"]): r["n_pairs"] for r in walk_skipgram_pairs(loop, 1).collect()}
    assert wl == {("a", "b"): 2, ("b", "a"): 2}
    import pytest as _p

    with _p.raises(ValueError, match=">= 1"):
        walk_skipgram_pairs(walks, 0)


def test_harmonic_closeness_star_center_wins(spark):
    """6-leaf star: center H = 6 (all at distance 1), each leaf
    H = 1 + 5/2 = 3.5 at 2 hops — the corrected estimator must rank the
    center strictly above every leaf and be deterministic."""
    from cognee_graphdb_spark.operators.graph_metrics import approx_harmonic_closeness

    ids = ["hub"] + [f"l{i}" for i in range(6)]
    pairs = [("hub", f"l{i}") for i in range(6)]
    out = approx_harmonic_closeness(
        _nodes_df(spark, ids), _edges_df(spark, pairs), n_rounds=2, m=64
    )
    got = {r["id"]: r["closeness"] for r in out.collect()}
    assert set(got) == set(ids)
    assert all(got["hub"] > got[f"l{i}"] for i in range(6)), got
    # ballpark accuracy: center ~6, leaves ~3.5 (HLL m=64 noise band)
    assert 4.0 <= got["hub"] <= 8.5
    assert all(2.0 <= got[f"l{i}"] <= 5.5 for i in range(6)), got
    again = {
        r["id"]: r["closeness"]
        for r in approx_harmonic_closeness(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_rounds=2, m=64
        ).collect()
    }
    assert got == again


def test_harmonic_closeness_raw_mode_and_scaling(spark):
    """raw mode returns integer h_scaled with closeness = h_scaled / lcm;
    deltas are non-negative (register-wise max is monotone)."""
    from cognee_graphdb_spark.operators.graph_metrics import approx_harmonic_closeness

    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    rows = approx_harmonic_closeness(
        _nodes_df(spark, ["a", "b", "c", "d"]),
        _edges_df(spark, pairs),
        n_rounds=3,
        m=16,
        output="raw",
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["h_scaled"] >= 0
        assert r["closeness"] == pytest.approx(r["h_scaled"] / 6.0)  # lcm(1,2,3)


def test_harmonic_closeness_validates_params(spark):
    from cognee_graphdb_spark.operators.graph_metrics import approx_harmonic_closeness

    n, e = _nodes_df(spark, ["a"]), _edges_df(spark, [("a", "a")])
    with pytest.raises(ValueError, match="power of two"):
        approx_harmonic_closeness(n, e, m=12)
    with pytest.raises(ValueError, match="n_rounds"):
        approx_harmonic_closeness(n, e, n_rounds=0)
    with pytest.raises(ValueError, match="output"):
        approx_harmonic_closeness(n, e, output="nope")


def test_shortest_path_counts_diamond(spark):
    """Diamond a-{b,c}-d plus tail d-e: sigma(a,d) = 2 (two 2-hop paths),
    sigma(a,e) = 2 at dist 3; b and c at dist 1 with sigma 1."""
    from cognee_graphdb_spark.operators.graph_metrics import shortest_path_counts

    pairs = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    srcs = spark.createDataFrame([("a",)], ["id"])
    got = {
        (r["source"], r["node"]): (r["dist"], r["sigma"])
        for r in shortest_path_counts(_edges_df(spark, pairs), srcs, max_hops=5).collect()
    }
    assert got == {
        ("a", "a"): (0, 1),
        ("a", "b"): (1, 1),
        ("a", "c"): (1, 1),
        ("a", "d"): (2, 2),
        ("a", "e"): (3, 2),
    }


def test_shortest_path_counts_multi_source_and_cap(spark):
    """Two sources on a path a-b-c-d: each settles its own ball; max_hops=1
    truncates; directed mode respects orientation."""
    from cognee_graphdb_spark.operators.graph_metrics import shortest_path_counts

    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = _edges_df(spark, pairs)
    srcs = spark.createDataFrame([("a",), ("d",)], ["id"])
    got = {
        (r["source"], r["node"]): r["dist"]
        for r in shortest_path_counts(edges, srcs, max_hops=1).collect()
    }
    assert got == {("a", "a"): 0, ("a", "b"): 1, ("d", "d"): 0, ("d", "c"): 1}
    directed = {
        (r["source"], r["node"]): r["dist"]
        for r in shortest_path_counts(
            edges, srcs, max_hops=5, symmetric=False
        ).collect()
    }
    assert directed == {
        ("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 2, ("a", "d"): 3,
        ("d", "d"): 0,
    }
    import pytest as _p

    with _p.raises(ValueError, match=">= 1"):
        shortest_path_counts(edges, srcs, max_hops=0)


def test_betweenness_diamond_hand_computed(spark):
    """Diamond a-{b,c}-d with tail d-e, single source a: Brandes deltas are
    delta(d) = 1 (from e), delta(b) = delta(c) = (1/2)*(1+1) = 1 — so
    betweenness {b: 1, c: 1, d: 1, e: 0}; e and the source itself
    accumulate nothing (e has no successors, a is excluded)."""
    from cognee_graphdb_spark.operators.graph_metrics import betweenness_sampled

    pairs = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    srcs = spark.createDataFrame([("a",)], ["id"])
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_sampled(_edges_df(spark, pairs), srcs, max_hops=5).collect()
    }
    assert got == pytest.approx({"b": 1.0, "c": 1.0, "d": 1.0})


def test_betweenness_path_center(spark):
    """Path a-b-c, sources {a, c}: b lies on the single a-c shortest path,
    seen from both endpoints -> betweenness(b) = 2 (the classic /2-per-pair
    convention is the caller's when sampling all nodes).  a and c are BFS
    leaves of each other's trees — no successors, no delta row, absent from
    the output (implicit zero)."""
    from cognee_graphdb_spark.operators.graph_metrics import betweenness_sampled

    pairs = [("a", "b"), ("b", "c")]
    srcs = spark.createDataFrame([("a",), ("c",)], ["id"])
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_sampled(_edges_df(spark, pairs), srcs, max_hops=4).collect()
    }
    assert got == pytest.approx({"b": 2.0})


def test_betweenness_deterministic_bits(spark):
    """Two invocations produce bit-identical doubles (the ordered-reduction
    contract that makes the driver oracle possible)."""
    from cognee_graphdb_spark.operators.graph_metrics import betweenness_sampled

    pairs = [(f"n{i}", f"n{(i * 3 + 1) % 11}") for i in range(11)] + [
        ("n0", "n5"),
        ("n2", "n7"),
    ]
    srcs = spark.createDataFrame([("n0",), ("n1",), ("n2",)], ["id"])
    e = _edges_df(spark, pairs)
    a = sorted(map(tuple, betweenness_sampled(e, srcs, max_hops=6).collect()))
    b = sorted(map(tuple, betweenness_sampled(e, srcs, max_hops=6).collect()))
    assert a == b  # exact float equality, not approx


def _py_bfs_sigma(und, src, max_hops):
    """Reference BFS with path counting (dict-based Brandes forward pass)."""
    from collections import defaultdict, deque

    dist, sigma = {src: 0}, defaultdict(int)
    sigma[src] = 1
    q = deque([src])
    order = [src]
    while q:
        v = q.popleft()
        if dist[v] >= max_hops:
            continue
        for w in sorted(und.get(v, ())):
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
                order.append(w)
            if dist[w] == dist[v] + 1:
                sigma[w] += sigma[v]
    return dist, dict(sigma), order


def test_shortest_path_and_betweenness_vs_python_brandes(spark):
    """Adversarial parity: on 3 seeded random graphs, shortest_path_counts
    must equal a dict-based BFS/sigma reimplementation, and
    betweenness_sampled must equal textbook Brandes dependency accumulation
    from the same sources (float tolerance only — summation order differs
    by design in the reference implementation)."""
    import random as _r

    from cognee_graphdb_spark.operators.graph_metrics import (
        betweenness_sampled,
        shortest_path_counts,
    )

    for seed in (11, 23, 47):
        rng = _r.Random(seed)
        n = rng.randint(9, 13)
        ids = [f"v{i}" for i in range(n)]
        pairs = sorted(
            {
                tuple(sorted(rng.sample(ids, 2)))
                for _ in range(rng.randint(n, 2 * n))
            }
        )
        und = {}
        for a, b in pairs:
            und.setdefault(a, set()).add(b)
            und.setdefault(b, set()).add(a)
        sources = sorted(rng.sample(ids, 3))
        max_hops = 5
        edges = _edges_df(spark, pairs)
        srcs = spark.createDataFrame([(s,) for s in sources], ["id"])
        got_sp = {
            (r["source"], r["node"]): (r["dist"], r["sigma"])
            for r in shortest_path_counts(edges, srcs, max_hops=max_hops).collect()
        }
        exp_sp, exp_delta = {}, {}
        for s in sources:
            dist, sigma, order = _py_bfs_sigma(und, s, max_hops)
            for v, d in dist.items():
                exp_sp[(s, v)] = (d, sigma[v])
            # Brandes backward pass, truncated to the same hop cap
            delta = {v: 0.0 for v in dist}
            for w in reversed(order):
                for v in und.get(w, ()):
                    if dist.get(v) == dist[w] - 1:
                        delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            for v, dv in delta.items():
                if v != s and dv > 0:
                    exp_delta[v] = exp_delta.get(v, 0.0) + dv
        assert got_sp == exp_sp, (seed, got_sp, exp_sp)
        got_b = {
            r["node"]: r["betweenness"]
            for r in betweenness_sampled(edges, srcs, max_hops=max_hops).collect()
        }
        assert set(got_b) == set(exp_delta), (seed, got_b, exp_delta)
        for v, dv in exp_delta.items():
            assert got_b[v] == pytest.approx(dv), (seed, v)


def test_betweenness_isolated_sources_empty(spark):
    """All-isolated source set (deepest ball = the sources themselves) must
    return an empty frame, not crash — and a source absent from the graph is
    silently dropped."""
    from cognee_graphdb_spark.operators.graph_metrics import betweenness_sampled

    edges = _edges_df(spark, [("x", "y")])
    srcs = spark.createDataFrame([("ghost",)], ["id"])  # not in the graph
    out = betweenness_sampled(edges, srcs, max_hops=3)
    assert out.count() == 0
    assert out.columns == ["node", "betweenness"]


def _py_md5_64(x, seed):
    import hashlib

    return int(hashlib.md5(f"{seed}|{x}".encode()).hexdigest()[:15], 16)


def test_node2vec_matches_python_mirror(spark):
    """Exact-trajectory parity with a from-scratch Python reimplementation of
    the sampler (same md5 hashing, same integer-prefix-count cumulative
    weights, same last-candidate fallback) on a seeded random graph — this
    pins every detail an SQL oracle needs."""
    import random as _r

    from cognee_graphdb_spark.operators.graph_metrics import node2vec_walks

    rng = _r.Random(5)
    ids = [f"v{i}" for i in range(9)]
    pairs = sorted({tuple(sorted(rng.sample(ids, 2))) for _ in range(16)})
    seed, p, q, L = 3, 2.0, 0.5, 4
    got = {}
    rows = node2vec_walks(
        _edges_df(spark, pairs), walk_length=L, num_walks=2, p=p, q=q,
        seed=seed, hasher="md5_64",
    ).collect()
    for r in rows:
        got.setdefault((r["start"], r["walk"]), {})[r["step"]] = r["node"]

    # --- python mirror ---
    h = {i: _py_md5_64(i, 0) for i in ids}
    und = {}
    for a, b in pairs:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    adj = {n: sorted(und[n], key=lambda x: h[x]) for n in und}
    inv_p, inv_q = 1.0 / p, 1.0 / q
    exp = {}
    for s in ids:
        if s not in adj:
            continue
        for w in range(2):
            path = {0: s}
            cur = s
            nbrs = adj[cur]
            idx = _py_md5_64(f"{h[s]}|{w}|1|{h[cur]}", seed) % len(nbrs)
            prev, cur = cur, nbrs[idx]
            path[1] = cur
            for t in range(2, L + 1):
                cands = adj[cur]
                cls = [
                    0 if x == prev else (1 if x in und[prev] else 2) for x in cands
                ]
                wts = {0: inv_p, 1: 1.0, 2: inv_q}
                a_c = b_c = c_c = 0
                cums = []
                for k in cls:
                    a_c += k == 0
                    b_c += k == 1
                    c_c += k == 2
                    cums.append((a_c * inv_p + b_c) + c_c * inv_q)
                W = cums[-1]
                r01 = (_py_md5_64(f"{h[s]}|{w}|{t}|{h[prev]}|{h[cur]}", seed) % (1 << 52)) / float(1 << 52)
                thr = r01 * W
                pick = len(cands) - 1  # last-candidate fallback
                for i, cm in enumerate(cums):
                    prev_cm = cums[i - 1] if i else 0.0
                    if prev_cm <= thr < cm:
                        pick = i
                        break
                prev, cur = cur, cands[pick]
                path[t] = cur
            exp[(s, w)] = path
    assert got == exp


def test_node2vec_high_p_avoids_backtrack(spark):
    """Triangle abc + pendant c-d, huge p: from d the walk goes to c and then
    must NOT return to d (return weight ~0 while a/b have weight 1/q)."""
    from cognee_graphdb_spark.operators.graph_metrics import node2vec_walks

    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    rows = node2vec_walks(
        _edges_df(spark, pairs), walk_length=3, num_walks=2, p=1e9, q=1.0, seed=1
    ).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault((r["start"], r["walk"]), {})[r["step"]] = r["node"]
    for (s, w), path in by_walk.items():
        if path[0] == "d":
            assert path[1] == "c"
            assert path[2] in ("a", "b"), path  # never back to d
    import pytest as _p

    with _p.raises(ValueError, match="> 0"):
        node2vec_walks(_edges_df(spark, pairs), p=0.0)


def test_modularity_two_triangles_bridge(spark):
    """Two triangles joined by one bridge edge, true communities: the
    textbook value — m = 7, each community: L_c = 3, d_c = 7, so
    Q = 2*(3/7 - (7/14)^2) = 5/14."""
    from cognee_graphdb_spark.operators.graph_metrics import modularity, modularity_score

    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    labels = spark.createDataFrame(
        [(n, 1) for n in "abc"] + [(n, 2) for n in "xyz"], ["id", "label"]
    )
    per = modularity(_edges_df(spark, pairs), labels)
    rows = {r["label"]: r for r in per.collect()}
    assert rows[1]["n_nodes"] == 3 and rows[2]["n_nodes"] == 3
    assert rows[1]["sym_within"] == 6 and rows[2]["sym_within"] == 6  # 2*L_c
    assert rows[1]["total_degree"] == 7 and rows[2]["total_degree"] == 7
    assert rows[1]["s_total"] == 14
    assert rows[1]["contrib_scaled"] == 14 * 6 - 49 == 35
    assert modularity_score(per) == pytest.approx(5 / 14)
    # everything in one community: Q = 1 - 1 = 0
    one = spark.createDataFrame([(n, 9) for n in "abcxyz"], ["id", "label"])
    assert modularity_score(modularity(_edges_df(spark, pairs), one)) == pytest.approx(0.0)
    # isolated-community row: a label with no edges gets zeros
    labels_iso = labels.union(spark.createDataFrame([("ghost", 3)], ["id", "label"]))
    per_iso = {r["label"]: r for r in modularity(_edges_df(spark, pairs), labels_iso).collect()}
    assert per_iso[3]["sym_within"] == 0 and per_iso[3]["total_degree"] == 0
    assert per_iso[3]["contrib_scaled"] == 0


def test_conductance_two_triangles_bridge(spark):
    """Same textbook fixture as modularity: each triangle community has
    internal = 6 ordered pairs, one bridge endpoint -> boundary = 1,
    volume = 7, phi = 1/7 -> 142857 ppm."""
    from cognee_graphdb_spark.operators.graph_metrics import conductance

    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    labels = spark.createDataFrame(
        [(n, 1) for n in "abc"] + [(n, 2) for n in "xyz"], ["id", "label"]
    )
    rows = {r["label"]: r for r in conductance(_edges_df(spark, pairs), labels).collect()}
    for lbl in (1, 2):
        assert rows[lbl]["n_nodes"] == 3
        assert rows[lbl]["internal"] == 6
        assert rows[lbl]["boundary"] == 1
        assert rows[lbl]["volume"] == 7
        assert rows[lbl]["s_total"] == 14
        assert rows[lbl]["conductance_ppm"] == 142857
    # everything in one community: no boundary, phi = 0
    one = spark.createDataFrame([(n, 9) for n in "abcxyz"], ["id", "label"])
    only = conductance(_edges_df(spark, pairs), one).collect()[0]
    assert only["boundary"] == 0 and only["conductance_ppm"] == 0
    # an edgeless community gets a zero row, not a divide-by-zero
    labels_iso = labels.union(spark.createDataFrame([("ghost", 3)], ["id", "label"]))
    iso = {r["label"]: r for r in conductance(_edges_df(spark, pairs), labels_iso).collect()}
    assert iso[3]["volume"] == 0 and iso[3]["conductance_ppm"] == 0
    # partial labeling scopes to the labeled subgraph (modularity's rule):
    # dropping the x-triangle's labels removes those rows AND shrinks s_total
    part = spark.createDataFrame([(n, 1) for n in "abc"], ["id", "label"])
    scoped = {r["label"]: r for r in conductance(_edges_df(spark, pairs), part).collect()}
    assert scoped[1]["internal"] == 6 and scoped[1]["boundary"] == 0
    assert scoped[1]["s_total"] == 6


def test_conductance_louvain_communities_beat_random_split(spark):
    """On the ring-of-cliques fixture, louvain's communities have strictly
    lower total conductance than an arbitrary even split — the metric
    orders partitions the way Q does, from the boundary side."""
    from cognee_graphdb_spark.operators.graph_metrics import conductance, louvain

    pairs = []
    cliques = [list(range(i * 4, i * 4 + 4)) for i in range(4)]
    for cl in cliques:
        pairs += [(str(a), str(b)) for a in cl for b in cl if a < b]
    for i in range(4):
        pairs.append((str(cliques[i][0]), str(cliques[(i + 1) % 4][0])))
    edges = _edges_df(spark, pairs)
    ids = _nodes_df(spark, [str(i) for i in range(16)])
    lv = louvain(ids, edges, n_levels=2, n_rounds=3)
    split = ids.select("id", (F.col("id").cast("int") % 2).alias("label"))

    def total_phi(labels):
        rows = conductance(edges, labels).collect()
        return sum(r["conductance_ppm"] for r in rows)

    assert total_phi(lv) < total_phi(split)


def _tarjan(V, E):
    """Dependency-free Tarjan for parity checks: returns frozenset of
    frozensets (the SCC partition)."""
    adj = {v: [] for v in V}
    for a, b in E:
        adj[a].append(b)
    index, low, on, stack, out = {}, {}, set(), [], []
    counter = [0]

    def strong(v):
        work = [(v, 0)]
        while work:
            x, i = work.pop()
            if i == 0:
                index[x] = low[x] = counter[0]
                counter[0] += 1
                stack.append(x)
                on.add(x)
            recurse = False
            for j in range(i, len(adj[x])):
                w = adj[x][j]
                if w not in index:
                    work.append((x, j + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on:
                    low[x] = min(low[x], index[w])
            if not recurse:
                if low[x] == index[x]:
                    comp = set()
                    while True:
                        w = stack.pop()
                        on.discard(w)
                        comp.add(w)
                        if w == x:
                            break
                    out.append(frozenset(comp))
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[x])

    for v in V:
        if v not in index:
            strong(v)
    return frozenset(out)


def test_scc_textbook_shapes(spark):
    """Two 3-cycles joined by one directed bridge: two SCCs (the bridge
    doesn't merge them); a pure DAG: all singletons; label = the component's
    max hash so both engines agree."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        strongly_connected_components,
    )

    cyc = [("a", "b"), ("b", "c"), ("c", "a"),
           ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")]
    ids = _nodes_df(spark, list("abcxyz"))
    out = {r["id"]: r["label"] for r in
           strongly_connected_components(ids, _directed_edges_df(spark, cyc)).collect()}
    assert out["a"] == out["b"] == out["c"]
    assert out["x"] == out["y"] == out["z"]
    assert out["a"] != out["x"]
    dag = [("a", "b"), ("b", "c"), ("a", "c")]
    sout = strongly_connected_components(
        _nodes_df(spark, list("abc")), _directed_edges_df(spark, dag)
    ).collect()
    assert len({r["label"] for r in sout}) == 3
    # empty graph: empty result, stable schema
    empty = strongly_connected_components(
        spark.createDataFrame([], "id string, name string, type string"),
        _directed_edges_df(spark, []),
    )
    assert empty.count() == 0 and set(empty.columns) == {"id", "label"}


def test_scc_matches_tarjan_on_mixed_digraph(spark):
    """Partition parity with Tarjan on a mixed digraph: a 4-cycle, a 2-cycle
    hanging off it, a tail, and an isolated node."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        strongly_connected_components,
    )

    E = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),   # 4-cycle
         ("c", "p"), ("p", "q"), ("q", "p"),               # 2-cycle off it
         ("q", "t1"), ("t1", "t2"),                        # tail
         ("t2", "a")]                                      # back-edge: merges ALL of a..t2
    V = sorted({u for u, v in E} | {v for u, v in E} | {"iso"})
    got = {}
    for r in strongly_connected_components(
        _nodes_df(spark, V), _directed_edges_df(spark, E)
    ).collect():
        got.setdefault(r["label"], set()).add(r["id"])
    assert frozenset(frozenset(s) for s in got.values()) == _tarjan(V, E)
    # and a version without the merging back-edge: three non-trivial SCCs
    E2 = E[:-1]
    got2 = {}
    for r in strongly_connected_components(
        _nodes_df(spark, V), _directed_edges_df(spark, E2)
    ).collect():
        got2.setdefault(r["label"], set()).add(r["id"])
    assert frozenset(frozenset(s) for s in got2.values()) == _tarjan(V, E2)


def test_scc_matches_tarjan_on_random_digraphs(spark):
    """Seeded random digraphs of mixed density: the Orzan coloring partition
    equals Tarjan's exactly, every trial."""
    import random

    from cognee_graphdb_spark.operators.graph_metrics import (
        strongly_connected_components,
    )

    rng = random.Random(7)
    for _trial in range(4):
        n = rng.randint(5, 14)
        V = [f"v{i}" for i in range(n)]
        E = sorted(
            {(rng.choice(V), rng.choice(V)) for _ in range(rng.randint(n, 3 * n))}
        )
        E = [(a, b) for a, b in E if a != b]
        got = {}
        for r in strongly_connected_components(
            _nodes_df(spark, V), _directed_edges_df(spark, E)
        ).collect():
            got.setdefault(r["label"], set()).add(r["id"])
        assert frozenset(frozenset(s) for s in got.values()) == _tarjan(V, E), (V, E)


def test_scc_validates_and_raises_on_cap(spark):
    from cognee_graphdb_spark.operators.graph_metrics import (
        strongly_connected_components,
    )

    ids = _nodes_df(spark, list("abc"))
    edges = _directed_edges_df(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    with pytest.raises(ValueError):
        strongly_connected_components(ids, edges, max_outer=0)
    with pytest.raises(RuntimeError):
        # a 3-cycle needs >1 forward round; cap of 1 must raise, not lie
        strongly_connected_components(ids, edges, max_rounds=1)


def test_leiden_refinement_splits_disconnected_community(spark):
    """The mechanism Leiden adds over Louvain, tested directly: a hand-built
    coarse labeling that strands two disconnected triangles in ONE community
    gets split by min-label refinement; the connected community is kept
    whole."""
    from cognee_graphdb_spark.operators.graph_metrics import _min_label_components

    within = spark.createDataFrame(
        [(u, v) for a, b in [(1, 2), (2, 3), (1, 3), (11, 12), (12, 13), (11, 13)]
         for u, v in [(a, b), (b, a)]],
        "u long, v long",
    )
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 11, 12, 13)], "u long")
    refs = {r["u"]: r["ref"] for r in _min_label_components(ids, within, 8).collect()}
    assert refs[1] == refs[2] == refs[3] == 1
    assert refs[11] == refs[12] == refs[13] == 11
    assert refs[1] != refs[11]


def test_leiden_finds_cliques_and_matches_or_beats_louvain_q(spark):
    """Ring of 4 K4s: leiden recovers the cliques exactly (4 communities of
    4) with Q >= louvain's on the same graph, runs deterministically, and
    every final community is internally connected on this fixture."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        leiden,
        louvain,
        modularity,
        modularity_score,
    )

    pairs = []
    cliques = [list(range(i * 4, i * 4 + 4)) for i in range(4)]
    for cl in cliques:
        pairs += [(str(a), str(b)) for a in cl for b in cl if a < b]
    for i in range(4):
        pairs.append((str(cliques[i][0]), str(cliques[(i + 1) % 4][0])))
    edges = _edges_df(spark, pairs)
    ids = _nodes_df(spark, [str(i) for i in range(16)])

    le = leiden(ids, edges, n_levels=2, n_rounds=3)
    rows = le.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], set()).add(r["id"])
    assert sorted(sorted(int(i) // 4 for i in m) for m in by_label.values()) == [
        [0] * 4, [1] * 4, [2] * 4, [3] * 4,
    ]
    q_leiden = modularity_score(modularity(edges, le))
    q_louvain = modularity_score(modularity(edges, louvain(ids, edges, n_levels=2, n_rounds=3)))
    assert q_leiden >= q_louvain
    # the final connectivity split is a strict-or-equal Q improvement over
    # the raw coarse partition (splitting loses no within edges, shrinks
    # the degree-squared penalty)
    raw = leiden(ids, edges, n_levels=2, n_rounds=3, final_refine=False)
    assert q_leiden >= modularity_score(modularity(edges, raw))
    # determinism: an identical second run returns the identical partition
    again = {(r["id"], r["label"]) for r in leiden(ids, edges, n_levels=2, n_rounds=3).collect()}
    assert again == {(r["id"], r["label"]) for r in rows}
    # every community is internally connected (the Leiden guarantee)
    und = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    for members in by_label.values():
        seen, todo = set(), [next(iter(members))]
        while todo:
            x = todo.pop()
            if x in seen:
                continue
            seen.add(x)
            todo += [b for a, b in und if a == x and b in members and b not in seen]
        assert seen == members


def test_leiden_communities_always_connected_on_random_graphs(spark):
    """The final_refine guarantee, swept: on seeded random graphs every
    returned leiden community is internally connected."""
    import random

    from cognee_graphdb_spark.operators.graph_metrics import leiden

    rng = random.Random(11)
    for _trial in range(3):
        n = rng.randint(8, 16)
        V = [str(i) for i in range(n)]
        E = sorted({tuple(sorted(rng.sample(V, 2))) for _ in range(rng.randint(n, 2 * n))})
        by_label = {}
        for r in leiden(
            _nodes_df(spark, V), _edges_df(spark, E), n_levels=2, n_rounds=2
        ).collect():
            by_label.setdefault(r["label"], set()).add(r["id"])
        und = {(a, b) for a, b in E} | {(b, a) for a, b in E}
        for members in by_label.values():
            seen, todo = set(), [next(iter(members))]
            while todo:
                x = todo.pop()
                if x in seen:
                    continue
                seen.add(x)
                todo += [b for a, b in und if a == x and b in members and b not in seen]
            assert seen == members, (E, by_label)


def test_leiden_validates_parameters(spark):
    from cognee_graphdb_spark.operators.graph_metrics import leiden

    ids = _nodes_df(spark, ["a"])
    edges = _directed_edges_df(spark, [])
    for kw in ({"n_levels": 0}, {"n_rounds": 0}, {"refine_rounds": 0}):
        with pytest.raises(ValueError):
            leiden(ids, edges, **kw)
    # single isolated node: one singleton community, no crash
    out = leiden(ids, _directed_edges_df(spark, []), n_levels=2, n_rounds=2).collect()
    assert len(out) == 1


def test_hits_roles_on_path_and_star(spark):
    """Directed path a->b->c reaches its fixpoint in two rounds: hubs
    {a, b} at 0.5 each, authorities {b, c} at 0.5 each, zeros elsewhere.
    On a 2-hub star, the doubly-cited authority dominates."""
    from cognee_graphdb_spark.operators.graph_metrics import hits

    ids = _nodes_df(spark, list("abc"))
    edges = _directed_edges_df(spark, [("a", "b"), ("b", "c")])
    out = {r["id"]: r for r in hits(ids, edges, n_iter=10).collect()}
    assert out["a"]["hub"] == pytest.approx(0.5)
    assert out["b"]["hub"] == pytest.approx(0.5)
    assert out["c"]["hub"] == 0.0
    assert out["a"]["authority"] == 0.0
    assert out["b"]["authority"] == pytest.approx(0.5)
    assert out["c"]["authority"] == pytest.approx(0.5)
    # a->x, b->x, a->y: x is cited by both hubs, y by one
    star = hits(
        _nodes_df(spark, list("abxy")),
        _directed_edges_df(spark, [("a", "x"), ("b", "x"), ("a", "y")]),
        n_iter=10,
    )
    srow = {r["id"]: r for r in star.collect()}
    assert srow["x"]["authority"] > srow["y"]["authority"]
    assert srow["a"]["hub"] > srow["b"]["hub"]  # a cites both authorities
    # edgeless graph: the total-zero guard yields all zeros, no div-by-zero
    none = hits(_nodes_df(spark, list("ab")), _directed_edges_df(spark, []), n_iter=3)
    assert all(r["hub"] == 0.0 and r["authority"] == 0.0 for r in none.collect())


def test_hits_matches_plain_python_power_iteration(spark):
    """Cell-exact-ish parity with a dependency-free reference loop using the
    same L1 half-step normalization on a small deterministic digraph."""
    from cognee_graphdb_spark.operators.graph_metrics import hits

    E = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("b", "d")]
    V = sorted({u for u, _ in E} | {v for _, v in E})
    h = {v: 1.0 / len(V) for v in V}
    a = {v: 0.0 for v in V}
    for _ in range(10):
        a = {v: sum(h[u] for u, w in E if w == v) for v in V}
        ta = sum(a.values())
        a = {v: (x / ta if ta else 0.0) for v, x in a.items()}
        h = {u: sum(a[w] for x, w in E if x == u) for u in V}
        th = sum(h.values())
        h = {u: (x / th if th else 0.0) for u, x in h.items()}
    got = {r["id"]: r for r in hits(_nodes_df(spark, V), _directed_edges_df(spark, E), n_iter=10).collect()}
    for v in V:
        assert got[v]["hub"] == pytest.approx(h[v], abs=1e-12)
        assert got[v]["authority"] == pytest.approx(a[v], abs=1e-12)


def test_eigenvector_concentrates_on_dominant_component(spark):
    """Eigenvector centrality: on a directed 2-cycle plus a pendant source
    (d->a, a<->b), mass concentrates on the cycle {a, b} (the dominant
    eigenvector's support) and the source d decays toward 0; on a star
    u1..u3 -> x the center holds ALL the mass after round 1, and one more
    round decays the whole DAG to exact zeros (nilpotent adjacency — the
    honest spectral semantics for acyclic graphs).  Edgeless graph: the
    total-zero guard yields all zeros."""
    from cognee_graphdb_spark.operators.graph_metrics import eigenvector

    out = {
        r["id"]: r["score"]
        for r in eigenvector(
            _nodes_df(spark, list("abd")),
            _directed_edges_df(spark, [("a", "b"), ("b", "a"), ("d", "a")]),
            n_iter=10,
        ).collect()
    }
    assert out["a"] > 0.3 and out["b"] > 0.3
    assert out["d"] == 0.0  # no in-edges at all
    star_ids = _nodes_df(spark, ["u1", "u2", "u3", "x"])
    star_edges = _directed_edges_df(spark, [("u1", "x"), ("u2", "x"), ("u3", "x")])
    star = {
        r["id"]: r["score"]
        for r in eigenvector(star_ids, star_edges, n_iter=1).collect()
    }
    assert star["x"] == pytest.approx(1.0)
    assert star["u1"] == 0.0
    decayed = eigenvector(star_ids, star_edges, n_iter=2)
    assert all(r["score"] == 0.0 for r in decayed.collect())
    none = eigenvector(_nodes_df(spark, list("ab")), _directed_edges_df(spark, []), n_iter=2)
    assert all(r["score"] == 0.0 for r in none.collect())


def test_eigenvector_matches_plain_python_power_iteration(spark):
    """Parity with a dependency-free reference loop using the same L1
    per-round normalization on a small deterministic digraph."""
    from cognee_graphdb_spark.operators.graph_metrics import eigenvector

    E = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("b", "d")]
    V = sorted({u for u, _ in E} | {v for _, v in E})
    x = {v: 1.0 / len(V) for v in V}
    for _ in range(10):
        nx = {v: sum(x[u] for u, w in E if w == v) for v in V}
        t = sum(nx.values())
        x = {v: (s / t if t else 0.0) for v, s in nx.items()}
    got = {
        r["id"]: r["score"]
        for r in eigenvector(
            _nodes_df(spark, V), _directed_edges_df(spark, E), n_iter=10
        ).collect()
    }
    for v in V:
        assert got[v] == pytest.approx(x[v], abs=1e-12)


def test_articlerank_dampens_low_outdegree_citations(spark):
    """ArticleRank vs PageRank on the defining fixture: x is cited once
    from a SHORT list (s -> x only) and y once from a LONG list
    (l -> y, l -> z1, l -> z2).  PageRank scores x strictly above y
    (1/1 vs 1/3 of the citer's rank); ArticleRank narrows exactly that gap
    (x/y rank ratio strictly smaller), which is the algorithm's purpose.
    Also: matches a dependency-free loop of the GDS recurrence, and sinks
    contribute nothing (no dangling redistribution, ranks need not sum
    to 1)."""
    from cognee_graphdb_spark.operators.graph_metrics import articlerank, pagerank

    V = ["s", "l", "x", "y", "z1", "z2"]
    E = [("s", "x"), ("l", "y"), ("l", "z1"), ("l", "z2")]
    ids, edges = _nodes_df(spark, V), _directed_edges_df(spark, E)
    pr = {r["id"]: r["rank"] for r in pagerank(ids, edges, n_iter=10).collect()}
    ar = {r["id"]: r["rank"] for r in articlerank(ids, edges, n_iter=10).collect()}
    assert pr["x"] > pr["y"]
    assert ar["x"] > ar["y"]  # still favored, but less so
    assert ar["x"] / ar["y"] < pr["x"] / pr["y"]

    # dependency-free reference loop: r = (1-d)/N + d * sum r_u/(deg_u+avg)
    n, d = len(V), 0.85
    deg = {v: sum(1 for u, _ in E if u == v) for v in V}
    avg = len(E) / n
    r = {v: 1.0 / n for v in V}
    for _ in range(10):
        r = {
            v: (1 - d) / n + d * sum(r[u] / (deg[u] + avg) for u, w in E if w == v)
            for v in V
        }
    got = {x["id"]: x["rank"] for x in articlerank(ids, edges, n_iter=10).collect()}
    for v in V:
        assert got[v] == pytest.approx(r[v], abs=1e-12)


def test_wl_refinement_distinguishes_roles(spark):
    """Path a-b-c-d-e after 2 rounds: ends {a,e} share a label, their
    neighbors {b,d} share another, the center c is distinct from both —
    WL color classes equal the structural orbits of the path."""
    from cognee_graphdb_spark.operators.graph_metrics import wl_refinement

    ids = list("abcde")
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    out = {
        r["id"]: r["wl_label"]
        for r in wl_refinement(_nodes_df(spark, ids), _edges_df(spark, pairs), 2).collect()
    }
    assert out["a"] == out["e"]
    assert out["b"] == out["d"]
    assert len({out["a"], out["b"], out["c"]}) == 3
    # a 5-cycle is vertex-transitive: every node same label at any depth
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a")]
    got = {
        r["wl_label"]
        for r in wl_refinement(_nodes_df(spark, ids), _edges_df(spark, cyc), 3).collect()
    }
    assert len(got) == 1
    # typed seeds split otherwise-symmetric nodes
    typed = spark.createDataFrame(
        [("a", "a", "T1"), ("e", "e", "T2")]
        + [(i, i, "T0") for i in "bcd"],
        ["id", "name", "type"],
    )
    out_t = {
        r["id"]: r["wl_label"]
        for r in wl_refinement(typed, _edges_df(spark, pairs), 2, label_col="type").collect()
    }
    assert out_t["a"] != out_t["e"]
    import pytest as _p

    with _p.raises(ValueError, match=">= 1"):
        wl_refinement(_nodes_df(spark, ids), _edges_df(spark, pairs), 0)


def test_incremental_components_equals_full_recompute(spark):
    """Label-for-label: ingesting a seeded random edge set in 3 batches
    through incremental_components equals connected_components over the full
    set — including a batch that MERGES two previously-separate components
    and a batch of edges entirely inside one old component."""
    import random as _r

    from cognee_graphdb_spark.operators.graph_metrics import (
        connected_components,
        incremental_components,
    )

    rng = _r.Random(13)
    ids = [f"n{i}" for i in range(30)]
    pairs = sorted({tuple(sorted(rng.sample(ids, 2))) for _ in range(45)})
    batches = [pairs[0::3], pairs[1::3], pairs[2::3]]
    assign = None
    for b in batches:
        assign = incremental_components(assign, _edges_df(spark, b))
    full_nodes = spark.createDataFrame(
        [(x,) for x in sorted({n for p in pairs for n in p})], ["id"]
    )
    full = connected_components(full_nodes, _edges_df(spark, pairs))
    got = sorted(map(tuple, assign.collect()))
    exp = sorted(map(tuple, full.collect()))
    assert got == exp
    # explicit merge case: two chains, then one bridging edge
    a1 = incremental_components(None, _edges_df(spark, [("a", "b"), ("x", "y")]))
    a2 = incremental_components(a1, _edges_df(spark, [("b", "x")]))
    comp = {r["id"]: r["component"] for r in a2.collect()}
    assert len(set(comp.values())) == 1
    assert set(comp) == {"a", "b", "x", "y"}
    # intra-component batch is a no-op on the partition
    a3 = incremental_components(a2, _edges_df(spark, [("a", "y")]))
    assert {r["component"] for r in a3.collect()} == set(comp.values())


def test_weighted_pagerank_vs_numpy(spark):
    """Weighted transitions vs a numpy power iteration with the same
    damping/dangling rules on a 4-node weighted digraph (parallel edges
    summed, zero-weight edge dropped, c a weighted sink)."""
    import numpy as np

    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    rows = [
        ("a", "b", 3.0), ("a", "c", 1.0),
        ("b", "c", 2.0), ("b", "c", 2.0),   # parallel: sums to 4
        ("b", "d", 1.0), ("d", "a", 5.0),
        ("a", "d", 0.0),                     # zero weight: dropped
    ]
    edges = spark.createDataFrame(rows, ["src", "dst", "wt"])
    nodes = spark.createDataFrame([(i,) for i in "abcd"], ["id"])
    got = {
        r["id"]: r["rank"]
        for r in pagerank(nodes, edges, n_iter=10, weight_col="wt").collect()
    }
    idx = {k: i for i, k in enumerate("abcd")}
    w = np.zeros((4, 4))
    w[idx["a"], idx["b"]] = 3.0
    w[idx["a"], idx["c"]] = 1.0
    w[idx["b"], idx["c"]] = 4.0
    w[idx["b"], idx["d"]] = 1.0
    w[idx["d"], idx["a"]] = 5.0
    out = w.sum(axis=1)
    r = np.full(4, 0.25)
    for _ in range(10):
        contrib = np.zeros(4)
        for i in range(4):
            if out[i] > 0:
                contrib += r[i] * w[i] / out[i]
        dm = sum(r[i] for i in range(4) if out[i] == 0)
        r = 0.15 / 4 + 0.85 * (contrib + dm / 4)
    for k, i in idx.items():
        assert got[k] == pytest.approx(r[i], rel=1e-9), k
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_wl_refinement_null_typed_seed_not_poisonous(spark):
    """A NULL in label_col must not produce NULL wl_labels or erase the node
    from neighbors' multisets: path a-b with b.type NULL — a's round-1 label
    must differ from an isolated a's (b is visible), and no label is NULL."""
    from cognee_graphdb_spark.operators.graph_metrics import wl_refinement

    typed = spark.createDataFrame(
        [("a", "a", "T1"), ("b", "b", None)], ["id", "name", "type"]
    )
    out = {
        r["id"]: r["wl_label"]
        for r in wl_refinement(typed, _edges_df(spark, [("a", "b")]), 1, label_col="type").collect()
    }
    assert None not in out.values() and set(out) == {"a", "b"}
    lone = spark.createDataFrame([("a", "a", "T1")], ["id", "name", "type"])
    lone_edges = spark.createDataFrame([], "src string, dst string, relationship_name string")
    alone = {
        r["id"]: r["wl_label"]
        for r in wl_refinement(lone, lone_edges, 1, label_col="type").collect()
    }
    assert out["a"] != alone["a"]


def test_harmonic_corrected_deltas_clamped(spark):
    """Corrected-mode h_scaled is never negative even where the estimator
    switches branches between rounds (raw mode is monotone by construction)."""
    import random as _r

    from cognee_graphdb_spark.operators.graph_metrics import approx_harmonic_closeness

    rng = _r.Random(3)
    ids = [f"n{i}" for i in range(40)]
    pairs = sorted({tuple(sorted(rng.sample(ids, 2))) for _ in range(80)})
    for mode in ("corrected", "raw"):
        rows = approx_harmonic_closeness(
            _nodes_df(spark, ids), _edges_df(spark, pairs), n_rounds=4, m=16, output=mode
        ).collect()
        assert all(r["h_scaled"] >= 0 for r in rows), mode


def test_modularity_partial_labels_scope_is_labeled_subgraph(spark):
    """Labels covering only one triangle of the two-triangle bridge graph:
    S counts only the label-covered edges (6 sym pairs), so the single
    community has contrib 6*6 - 6^2 = 0 and Q = 0 — Newman Q of the LABELED
    subgraph, not a mixed-denominator artifact."""
    from cognee_graphdb_spark.operators.graph_metrics import modularity, modularity_score

    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    labels = spark.createDataFrame([(n, 1) for n in "abc"], ["id", "label"])
    per = modularity(_edges_df(spark, pairs), labels)
    row = per.collect()[0]
    assert row["s_total"] == 6 and row["sym_within"] == 6 and row["total_degree"] == 6
    assert row["contrib_scaled"] == 0
    assert modularity_score(per) == 0.0


def test_coreness_boundary_convergence_at_max_rounds(spark):
    """The h-index fixpoint reached in EXACTLY max_rounds update rounds must
    not raise: convergence is only observable one round later, so the
    verification pass (the k_core boundary fix mirrored) must accept it.
    Path a-b-c-d-e-f: two update rounds (b,e then c,d drop 2 -> 1), observed
    converged on round 3 — so max_rounds=2 exercises the boundary and
    max_rounds=1 is genuinely unconverged."""
    from cognee_graphdb_spark.operators.graph_metrics import coreness

    ids = list("abcdef")
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    _, rounds = coreness(
        _nodes_df(spark, ids), _edges_df(spark, pairs), return_rounds=True
    )
    assert rounds == 3  # 2 update rounds + 1 observing round
    out = {
        r["id"]: r["coreness"]
        for r in coreness(_nodes_df(spark, ids), _edges_df(spark, pairs), max_rounds=2).collect()
    }
    assert out == {i: 1 for i in ids}
    # a genuinely unconverged run still raises
    with pytest.raises(RuntimeError, match="did not converge"):
        coreness(_nodes_df(spark, ids), _edges_df(spark, pairs), max_rounds=1).collect()


def test_wl_refinement_duplicate_typed_ids_collapse(spark):
    """A node id appearing with TWO distinct label values must collapse to
    one deterministic seed row, not survive as duplicate (id, wl_label) rows
    double-counted in neighbors' multisets."""
    from cognee_graphdb_spark.operators.graph_metrics import wl_refinement

    dup = spark.createDataFrame(
        [("a", "a", "T1"), ("a", "a", "T2"), ("b", "b", "T0")],
        ["id", "name", "type"],
    )
    out = wl_refinement(dup, _edges_df(spark, [("a", "b")]), 2, label_col="type")
    rows = out.collect()
    assert len(rows) == 2 and len({r["id"] for r in rows}) == 2
    # order of the duplicate label rows is irrelevant (sorted-set seed)
    dup2 = spark.createDataFrame(
        [("a", "a", "T2"), ("a", "a", "T1"), ("b", "b", "T0")],
        ["id", "name", "type"],
    )
    out2 = wl_refinement(dup2, _edges_df(spark, [("a", "b")]), 2, label_col="type")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2.collect()))
    # single-label nodes hash exactly as before the collapse (singleton
    # concat_ws is the bare string): seed must equal md5(label)
    single = spark.createDataFrame([("s", "s", "T9")], ["id", "name", "type"])
    no_edges = spark.createDataFrame([], "src string, dst string, relationship_name string")
    got = wl_refinement(single, no_edges, 1, label_col="type").collect()[0]["wl_label"]
    import hashlib

    seed = hashlib.md5(b"T9").hexdigest()
    assert got == hashlib.md5(f"{seed}#".encode()).hexdigest()


def test_effective_diameter_empty_frame_is_zero(spark):
    from cognee_graphdb_spark.operators.graph_metrics import effective_diameter

    empty = spark.createDataFrame([], "round int, nf_est double")
    assert effective_diameter(empty) == 0


def test_modularity_contrib_is_decimal_exact(spark):
    """contrib_scaled rides in decimal(38,0): S*S_c reaches S^2 which wraps
    BIGINT silently past ~1.5e9 edges — the type itself is the guard."""
    from pyspark.sql.types import DecimalType

    from cognee_graphdb_spark.operators.graph_metrics import modularity

    pairs = [("a", "b"), ("b", "c"), ("a", "c")]
    labels = spark.createDataFrame([(n, 1) for n in "abc"], ["id", "label"])
    per = modularity(_edges_df(spark, pairs), labels)
    assert per.schema["contrib_scaled"].dataType == DecimalType(38, 0)
    assert per.collect()[0]["contrib_scaled"] == 0  # 6*6 - 36


def test_graph_metrics_bounds_size_list(spark):
    """Many-component graph with max_sizes smaller than the component count:
    the sizes list truncates largest-first, the count and log2 histogram stay
    exact, and nothing collects the full list."""
    pairs = [(f"p{i}a", f"p{i}b") for i in range(4)]  # 4 components of size 2
    ids = [x for p in pairs for x in p] + [f"s{i}" for i in range(5)]  # + 5 singletons
    m = graph_metrics(_nodes_df(spark, ids), _edges_df(spark, pairs), max_sizes=3)
    assert m["num_connected_components"] == 9
    assert m["sizes_of_connected_components"] == [2, 2, 2]
    assert m["component_sizes_truncated"] is True
    assert m["component_size_log2_histogram"] == {0: 5, 1: 4}
    # untruncated path unchanged
    m2 = graph_metrics(_nodes_df(spark, ids), _edges_df(spark, pairs))
    assert m2["sizes_of_connected_components"] == [2, 2, 2, 2, 1, 1, 1, 1, 1]
    assert m2["component_sizes_truncated"] is False
    assert "component_size_log2_histogram" not in m2


# --- louvain (gds.louvain) ----------------------------------------------------


def test_louvain_two_triangles_bridge_finds_cliques(spark):
    """Two triangles joined by a bridge: louvain recovers the textbook
    optimum (each triangle one community, Q = 5/14) and beats/equals LPA's
    partition on the same fixture — the Q(louvain) >= Q(LPA) pin."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        label_propagation,
        louvain,
        modularity,
        modularity_score,
    )

    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    nodes = _nodes_df(spark, ["a", "b", "c", "x", "y", "z"])
    edges = _edges_df(spark, pairs)
    out = {r["id"]: r["label"] for r in louvain(nodes, edges, n_levels=2, n_rounds=3).collect()}
    assert len({out["a"], out["b"], out["c"]}) == 1
    assert len({out["x"], out["y"], out["z"]}) == 1
    assert out["a"] != out["x"]
    lv = spark.createDataFrame(list(out.items()), ["id", "label"])
    q_louvain = modularity_score(modularity(edges, lv))
    assert q_louvain == pytest.approx(5 / 14)
    lpa = label_propagation(nodes, edges, n_rounds=3)
    q_lpa = modularity_score(modularity(edges, lpa))
    assert q_louvain >= q_lpa


def test_louvain_warm_start_stable_and_quality_preserving(spark):
    """r11 VERDICT #8 mechanism pin: init_labels warm-starts level 0.  On
    the two-triangle fixture a warm start FROM the cold optimum returns
    the same partition structure at the same modularity (a settled
    partition stays settled), a warm start on a grown graph still finds a
    partition at least as good as LPA's, and init_labels=None stays
    byte-identical to the cold path (the a2_louvain oracle's contract)."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        label_propagation,
        louvain,
        modularity,
        modularity_score,
    )

    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    nodes = _nodes_df(spark, ["a", "b", "c", "x", "y", "z"])
    edges = _edges_df(spark, pairs)
    cold = louvain(nodes, edges, n_levels=2, n_rounds=3)
    q_cold = modularity_score(modularity(edges, cold))
    warm = louvain(nodes, edges, n_levels=2, n_rounds=3, init_labels=cold)
    wmap = {r["id"]: r["label"] for r in warm.collect()}
    assert len({wmap["a"], wmap["b"], wmap["c"]}) == 1
    assert len({wmap["x"], wmap["y"], wmap["z"]}) == 1
    assert wmap["a"] != wmap["x"]
    assert modularity_score(modularity(edges, warm)) == pytest.approx(q_cold)
    # grow the graph by a third triangle hanging off z, warm-start from
    # the old labels: the new nodes enter as singletons and cluster
    grown_pairs = pairs + [("z", "p"), ("p", "q"), ("q", "r"), ("p", "r"), ("q", "r")]
    g_nodes = _nodes_df(spark, ["a", "b", "c", "x", "y", "z", "p", "q", "r"])
    g_edges = _edges_df(spark, grown_pairs)
    g_warm = louvain(g_nodes, g_edges, n_levels=2, n_rounds=3, init_labels=cold)
    q_warm = modularity_score(modularity(g_edges, g_warm))
    q_lpa = modularity_score(
        modularity(g_edges, label_propagation(g_nodes, g_edges, n_rounds=3))
    )
    assert q_warm >= q_lpa
    gmap = {r["id"]: r["label"] for r in g_warm.collect()}
    assert len({gmap["p"], gmap["q"], gmap["r"]}) == 1


def test_louvain_beats_lpa_on_ring_of_cliques(spark):
    """Ring of four 4-cliques joined by single edges — the classic Louvain
    fixture.  Louvain must recover the four cliques exactly; its Q must be
    >= LPA's on the same graph (the brief's pin)."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        label_propagation,
        louvain,
        modularity,
        modularity_score,
    )

    cliques = []
    ids = []
    pairs = []
    for ci in range(4):
        members = [f"c{ci}n{j}" for j in range(4)]
        ids += members
        cliques.append(members)
        for i in range(4):
            for j in range(i + 1, 4):
                pairs.append((members[i], members[j]))
    for ci in range(4):  # ring bridges
        pairs.append((cliques[ci][0], cliques[(ci + 1) % 4][1]))
    nodes = _nodes_df(spark, ids)
    edges = _edges_df(spark, pairs)
    out = {r["id"]: r["label"] for r in louvain(nodes, edges, n_levels=2, n_rounds=3).collect()}
    for members in cliques:
        assert len({out[m] for m in members}) == 1, members
    assert len({out[m[0]] for m in cliques}) == 4  # cliques stay separate
    lv = spark.createDataFrame(list(out.items()), ["id", "label"])
    q_louvain = modularity_score(modularity(edges, lv))
    lpa = label_propagation(nodes, edges, n_rounds=3)
    q_lpa = modularity_score(modularity(edges, lpa))
    assert q_louvain >= q_lpa


def test_louvain_isolated_node_keeps_own_label(spark):
    from cognee_graphdb_spark.operators.graph_metrics import louvain

    nodes = _nodes_df(spark, ["a", "b", "lone"])
    out = {r["id"]: r["label"] for r in louvain(nodes, _edges_df(spark, [("a", "b")]), n_levels=2, n_rounds=2).collect()}
    assert len(out) == 3
    assert out["lone"] not in (out["a"], out["b"])


def test_louvain_hashers_agree_on_partition(spark):
    """md5_64 (oracle mirror) and xxhash64 (production) give different label
    VALUES but identical community co-membership."""
    from cognee_graphdb_spark.operators.graph_metrics import louvain

    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    nodes = _nodes_df(spark, ["a", "b", "c", "x", "y", "z"])

    def parts(hasher):
        out = {r["id"]: r["label"] for r in louvain(
            nodes, _edges_df(spark, pairs), n_levels=2, n_rounds=3, hasher=hasher).collect()}
        groups = {}
        for nid, lab in out.items():
            groups.setdefault(lab, set()).add(nid)
        return {frozenset(g) for g in groups.values()}

    assert parts("md5_64") == parts("xxhash64")


def test_louvain_contraction_preserves_q_and_is_deterministic(spark):
    """Level-2 never degrades the level-1 partition's Q on the ring fixture
    (every super-node can stay put — contraction preserves modularity), and
    repeated runs are bit-identical."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        louvain,
        modularity,
        modularity_score,
    )

    pairs = []
    cliques = []
    ids = []
    for ci in range(3):
        members = [f"k{ci}n{j}" for j in range(3)]
        ids += members
        cliques.append(members)
        pairs += [(members[0], members[1]), (members[1], members[2]), (members[0], members[2])]
    pairs += [(cliques[0][0], cliques[1][0]), (cliques[1][1], cliques[2][0])]
    nodes = _nodes_df(spark, ids)
    edges = _edges_df(spark, pairs)

    def q_of(n_levels):
        lv = louvain(nodes, edges, n_levels=n_levels, n_rounds=3)
        return modularity_score(modularity(edges, lv))

    assert q_of(2) >= q_of(1) - 1e-12
    a = sorted(map(tuple, louvain(nodes, edges, n_levels=2, n_rounds=3).collect()))
    b = sorted(map(tuple, louvain(nodes, edges, n_levels=2, n_rounds=3).collect()))
    assert a == b


def test_louvain_validates_rounds_and_levels(spark):
    from cognee_graphdb_spark.operators.graph_metrics import louvain

    nodes = _nodes_df(spark, ["a", "b"])
    edges = _edges_df(spark, [("a", "b")])
    with pytest.raises(ValueError, match="n_levels"):
        louvain(nodes, edges, n_levels=0)
    with pytest.raises(ValueError, match="n_rounds"):
        louvain(nodes, edges, n_rounds=0)
