"""Borůvka minimum spanning forest (operators/spanning.py — the
gds.spanningTree family computed for every component at once; reference
metric surface neo4j_driver/neo4j_metrics_utils.py)."""

from __future__ import annotations

import pytest

from cognee_graphdb_spark.operators.spanning import minimum_spanning_forest


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight double")


def _kruskal(vertices, edge_rows):
    """Dependency-free reference MSF: Kruskal under the same total order."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for s, d, w in sorted(edge_rows, key=lambda r: (r[2], r[0], r[1])):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            out.append((s, d, w))
    return out


def test_ring_msf_drops_exactly_the_heaviest_edge(spark):
    """On a cycle every edge but the heaviest is in the MSF (cycle
    property): n nodes, n edges in, n-1 out, the max-weight edge gone."""
    n = 12
    rows = [(f"v{i}", f"v{(i + 1) % n}", float((7 * i) % n) + 1.0) for i in range(n)]
    heaviest = max(rows, key=lambda r: r[2])
    out = minimum_spanning_forest(_edges(spark, rows)).collect()
    got = {(r["src"], r["dst"]) for r in out}
    assert len(out) == n - 1
    assert (heaviest[0], heaviest[1]) not in got
    assert sum(r["weight"] for r in out) == pytest.approx(
        sum(r[2] for r in rows) - heaviest[2]
    )


def test_msf_matches_kruskal_and_spans_each_component(spark):
    """Random-ish two-component weighted graph: total weight and edge count
    match a dependency-free Kruskal under the same tie order; exactly one
    tree per component (|V1|-1 + |V2|-1 edges)."""
    rows = [
        ("a", "b", 4.0), ("b", "c", 1.0), ("c", "a", 3.0), ("c", "d", 2.0),
        ("d", "a", 5.0), ("b", "d", 6.0),
        ("x", "y", 2.5), ("y", "z", 0.5), ("z", "x", 1.5),
    ]
    verts = {s for s, _, _ in rows} | {d for _, d, _ in rows}
    ref = _kruskal(verts, rows)
    out = minimum_spanning_forest(_edges(spark, rows)).collect()
    assert len(out) == len(ref) == len(verts) - 2
    assert sum(r["weight"] for r in out) == pytest.approx(sum(r[2] for r in ref))


def test_msf_parallel_edges_self_loops_and_determinism(spark):
    """Parallel edges keep their minimum, self-loops are dropped, and two
    runs over an all-equal-weight clique return the IDENTICAL forest (the
    (weight, hash, hash) tie order makes Borůvka deterministic)."""
    rows = [
        ("a", "b", 9.0), ("b", "a", 2.0),  # parallel, reversed orientation
        ("a", "a", 0.1),                    # self-loop
        ("b", "c", 3.0),
    ]
    out = minimum_spanning_forest(_edges(spark, rows)).collect()
    assert sorted((r["src"], r["dst"], r["weight"]) for r in out) == [
        ("b", "a", 2.0), ("b", "c", 3.0),
    ]
    clique = [
        (u, v, 1.0)
        for i, u in enumerate("abcd")
        for v in "abcd"[i + 1:]
    ]
    one = sorted(
        (r["src"], r["dst"]) for r in minimum_spanning_forest(_edges(spark, clique)).collect()
    )
    two = sorted(
        (r["src"], r["dst"]) for r in minimum_spanning_forest(_edges(spark, clique)).collect()
    )
    assert one == two and len(one) == 3


def test_k_spanning_clusters_single_linkage_cut(spark):
    """gds.kSpanningTree on a weighted path a-b-c-d-e (weights 1,9,2,8):
    k=3 cuts the two heaviest MSF edges (9 then 8) -> clusters {a,b},
    {c,d}, {e}; k=1 = plain components; k > n -> all singletons."""
    from cognee_graphdb_spark.operators.spanning import k_spanning_clusters

    rows = [("a", "b", 1.0), ("b", "c", 9.0), ("c", "d", 2.0), ("d", "e", 8.0)]
    got = {r["id"]: r["cluster"] for r in k_spanning_clusters(
        _edges(spark, rows), k=3
    ).collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c", "e": "e"}
    one = {r["cluster"] for r in k_spanning_clusters(_edges(spark, rows), k=1).collect()}
    assert one == {"a"}
    allk = {r["id"]: r["cluster"] for r in k_spanning_clusters(
        _edges(spark, rows), k=99
    ).collect()}
    assert allk == {v: v for v in "abcde"}
    with pytest.raises(ValueError, match="k must be"):
        k_spanning_clusters(_edges(spark, rows), k=0)


def test_msf_converges_in_exactly_max_rounds(spark):
    """r11 ADVICE off-by-one: convergence in EXACTLY max_rounds is success,
    not failure.  P4 with weights 1,5,2 needs exactly two Borůvka rounds
    (round 1 pairs {a,b} and {c,d}; round 2 merges across bc) — the budget
    of 2 must return the full 3-edge tree instead of spuriously raising."""
    rows = [("a", "b", 1.0), ("b", "c", 5.0), ("c", "d", 2.0)]
    out = minimum_spanning_forest(_edges(spark, rows), max_rounds=2).collect()
    assert sorted((r["src"], r["dst"], r["weight"]) for r in out) == [
        ("a", "b", 1.0), ("b", "c", 5.0), ("c", "d", 2.0)
    ]


def test_k_spanning_clusters_disconnected_components(spark):
    """r11 ADVICE: with c components the cut removes max(0, k-c) edges, so
    k >= c yields exactly k clusters (not c+k-1) and k < c yields c.  Two
    disjoint triangles: c=2; k=2 cuts nothing, k=3 cuts one forest edge,
    k=1 still gives the 2 components, huge k gives all singletons."""
    from cognee_graphdb_spark.operators.spanning import k_spanning_clusters

    rows = [
        ("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 3.0),
        ("x", "y", 1.0), ("y", "z", 2.0), ("z", "x", 3.0),
    ]
    for k, want in [(1, 2), (2, 2), (3, 3), (4, 4), (99, 6)]:
        got = k_spanning_clusters(_edges(spark, rows), k=k)
        assert got.select("cluster").distinct().count() == want, k
        assert got.count() == 6, k


def test_msf_empty_and_nonconvergence_guard(spark):
    """No spanning edges -> empty typed frame; an impossible round budget
    raises instead of returning a partial forest (fail-loudly)."""
    empty = minimum_spanning_forest(_edges(spark, [("a", "a", 1.0)]))
    assert empty.count() == 0
    assert set(empty.columns) == {"src", "dst", "weight"}
    # alternating valley weights: round 1 only pairs neighbors around each
    # light edge (the heavy edges are nobody's minimum), so one round is
    # provably not enough to span the chain
    chain = [(f"n{i}", f"n{i+1}", 1.0 if i % 2 == 0 else 9.0) for i in range(8)]
    with pytest.raises(RuntimeError, match="did not converge"):
        minimum_spanning_forest(_edges(spark, chain), max_rounds=1)
