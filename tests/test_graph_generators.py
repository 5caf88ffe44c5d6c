"""R-MAT generator (operators/graph_generators.py): shape, determinism,
skew direction, and exact parity with a pure-Python mirror of the md5
quadrant recursion."""

import hashlib

import pytest

from cognee_graphdb_spark.operators.graph_generators import rmat_edges


def _py_rmat(scale, edge_factor, a, b, c, seed):
    t1, t2, t3 = a, a + b, a + b + c
    out = []
    for i in range(edge_factor * (1 << scale)):
        src = dst = 0
        for l in range(scale):
            h = int(hashlib.md5(f"{seed}|{i}|{l}".encode()).hexdigest()[:15], 16)
            u = h / float(1 << 60)
            row = 1 if u >= t2 else 0
            col = 1 if (t1 <= u < t2) or u >= t3 else 0
            src = src * 2 + row
            dst = dst * 2 + col
        out.append((i, src, dst))
    return out


def test_rmat_shape_determinism_and_skew(spark):
    g = rmat_edges(spark, scale=5, edge_factor=4, seed=3)
    rows = sorted(tuple(r) for r in g.collect())
    assert len(rows) == 4 * 32
    assert all(0 <= s < 32 and 0 <= t < 32 for _, s, t in rows)
    again = sorted(tuple(r) for r in rmat_edges(spark, scale=5, edge_factor=4, seed=3).collect())
    assert rows == again
    # Graph500 defaults put a+b = 0.76 of mass in the top half of the matrix
    top = sum(1 for _, s, _t in rows if s < 16)
    assert top > len(rows) * 0.6
    # a different seed yields a different graph
    other = sorted(tuple(r) for r in rmat_edges(spark, scale=5, edge_factor=4, seed=4).collect())
    assert rows != other


def test_rmat_matches_python_mirror_md5(spark):
    got = sorted(
        tuple(r)
        for r in rmat_edges(
            spark, scale=4, edge_factor=2, seed=7, hasher="md5_64"
        ).collect()
    )
    assert got == sorted(_py_rmat(4, 2, 0.57, 0.19, 0.19, 7))


def test_rmat_dedup_and_validation(spark):
    raw = rmat_edges(spark, scale=4, edge_factor=8, seed=1)
    ded = rmat_edges(spark, scale=4, edge_factor=8, seed=1, dedup=True)
    pairs = [(r["src"], r["dst"]) for r in ded.collect()]
    assert len(pairs) == len(set(pairs)) < raw.count()
    for kw in (
        {"scale": 0},
        {"scale": 63},
        {"scale": 4, "edge_factor": 0},
        {"scale": 4, "a": 0.9, "b": 0.2, "c": 0.2},
    ):
        with pytest.raises(ValueError):
            rmat_edges(spark, **kw)


def test_uniform_edges_shape_determinism_and_balance(spark):
    from cognee_graphdb_spark.operators.graph_generators import uniform_edges

    g = uniform_edges(spark, n_nodes=32, n_edges=256, seed=2)
    rows = sorted(tuple(r) for r in g.collect())
    assert len(rows) == 256
    assert all(0 <= s < 32 and 0 <= t < 32 for _, s, t in rows)
    assert rows == sorted(tuple(r) for r in uniform_edges(spark, 32, 256, seed=2).collect())
    # uniform: no half of the id space dominates the way R-MAT's top does
    top = sum(1 for _, s, _t in rows if s < 16)
    assert 0.35 * len(rows) < top < 0.65 * len(rows)
    # python mirror of the md5 path, exact
    import hashlib

    def end(i, side, seed, n):
        h = int(hashlib.md5(f"{seed}|{i}|{side}".encode()).hexdigest()[:15], 16)
        return h % n

    got = sorted(
        tuple(r) for r in uniform_edges(spark, 16, 64, seed=9, hasher="md5_64").collect()
    )
    assert got == sorted((i, end(i, "s", 9, 16), end(i, "d", 9, 16)) for i in range(64))
    with pytest.raises(ValueError):
        uniform_edges(spark, 0, 10)


def test_watts_strogatz_lattice_rewiring_and_mirror(spark):
    from cognee_graphdb_spark.operators.graph_generators import watts_strogatz_edges

    # p=0: the pure ring lattice — every node has exactly k/2 out-edges to
    # its next neighbors
    g0 = {(r["src"], r["dst"]) for r in
          watts_strogatz_edges(spark, n_nodes=10, k=4, p=0.0, seed=1).collect()}
    expect = {(i, (i + j) % 10) for i in range(10) for j in (1, 2)}
    assert g0 == expect
    # p=1: every edge rewires (unless self-loop collision); graph differs
    g1 = {(r["src"], r["dst"]) for r in
          watts_strogatz_edges(spark, n_nodes=10, k=4, p=1.0, seed=1).collect()}
    assert g1 != g0
    assert all(s != d or True for s, d in g1)  # structure check below
    assert not any(s == d for s, d in g1)      # no self-loops ever
    # exact python mirror of the md5 path
    import hashlib

    def mirror(n, k, p, seed):
        half = k // 2
        out = []
        for idx in range(n * half):
            i, j = idx // half, 1 + idx % half
            ring = (i + j) % n
            hr = int(hashlib.md5(f"{seed}|{idx}|r".encode()).hexdigest()[:15], 16)
            u = hr / float(1 << 60)
            t = int(hashlib.md5(f"{seed}|{idx}|t".encode()).hexdigest()[:15], 16) % n
            dst = t if (u < p and t != i) else ring
            out.append((idx, i, dst))
        return sorted(out)

    got = sorted(tuple(r) for r in watts_strogatz_edges(
        spark, n_nodes=12, k=4, p=0.3, seed=5, hasher="md5_64").collect())
    assert got == mirror(12, 4, 0.3, 5)
    for kw in ({"n_nodes": 2, "k": 2}, {"n_nodes": 10, "k": 3},
               {"n_nodes": 10, "k": 10}, {"n_nodes": 10, "k": 4, "p": 1.5}):
        with pytest.raises(ValueError):
            watts_strogatz_edges(spark, **kw)
