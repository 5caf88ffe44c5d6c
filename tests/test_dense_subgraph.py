import pytest

from cognee_graphdb_spark.operators.dense_subgraph import k_truss


def _truss(spark, edges, k, **kw):
    e = spark.createDataFrame(edges, ["src", "dst"])
    return {
        (r["u"], r["v"]): r["support"] for r in k_truss(e, k, **kw).collect()
    }


K4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]


def test_k4_survives_4_truss_with_support_2(spark):
    got = _truss(spark, K4, 4)
    assert set(got) == {("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")}
    assert all(s == 2 for s in got.values())


def test_pendant_and_lone_triangle_peel(spark):
    edges = K4 + [("d", "x"), ("x", "y"), ("y", "z"), ("z", "x")]
    # k=3: pendant d-x (support 0) peels; the x-y-z triangle (support 1) stays
    got3 = _truss(spark, edges, 3)
    assert ("d", "x") not in got3
    assert got3[("x", "y")] == 1 and got3[("x", "z")] == 1 and got3[("y", "z")] == 1
    # k=4: the lone triangle peels too, only K4 survives
    got4 = _truss(spark, edges, 4)
    assert set(got4) == set(_truss(spark, K4, 4))


def test_peeling_cascades(spark):
    # two triangles sharing edge a-b: ab has support 2, the rest 1; k=4
    # removes the rest, which strands ab at support 0 -> empty after cascade
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]
    assert _truss(spark, edges, 4) == {}
    got3 = _truss(spark, edges, 3)
    assert set(got3) == {("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")}
    assert got3[("a", "b")] == 2


def test_max_rounds_boundary_verification_pass(spark):
    # K4 converges in round 1; max_rounds=1 exhausts the loop exactly at the
    # fixpoint — the verification pass must return, not raise
    got = _truss(spark, K4, 4, max_rounds=1)
    assert len(got) == 6
    # cascade graph genuinely needs 2 removal rounds: max_rounds=1 raises
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]
    with pytest.raises(RuntimeError, match="converge"):
        _truss(spark, edges, 4, max_rounds=1)


def test_k_validation_and_duplicate_edges(spark):
    with pytest.raises(ValueError, match="k must be"):
        _truss(spark, K4, 1)
    noisy = K4 + [("b", "a"), ("a", "b")] + [("a", "a")]
    assert _truss(spark, noisy, 4) == _truss(spark, K4, 4)
