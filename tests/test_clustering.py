"""DBSCAN over embedding columns (operators/clustering.py — ε-graph via
the dedup family's LSH/exact pair generator, cores by neighbor count,
clusters = CC of the core-core subgraph)."""

from __future__ import annotations

import math

import pytest

from cognee_graphdb_spark.operators.clustering import dbscan


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id string, embedding array<double>")


def _at(deg):
    r = math.radians(deg)
    return [math.cos(r), math.sin(r)]


def test_dbscan_core_border_noise_on_angle_fixture(spark):
    """threshold 0.95 ≈ an 18.2° ε-ball on the unit circle.  Two 4-point
    arcs (4° apart pairwise-connected) are two clusters of cores; zb sits
    17° off a1 only (one core neighbor -> border, attached to a1's
    cluster); nn is orthogonal -> noise."""
    rows = (
        [(f"a{i+1}", _at(4.0 * i)) for i in range(4)]
        + [(f"h{i+1}", _at(180.0 + 4.0 * i)) for i in range(4)]
        + [("zb", _at(-17.0)), ("nn", _at(90.0))]
    )
    out = {r["id"]: (r["kind"], r["cluster"]) for r in dbscan(
        _emb(spark, rows), threshold=0.95, min_pts=4
    ).collect()}
    assert out["nn"] == ("noise", None)
    assert out["zb"] == ("border", "a1")
    for i in range(1, 5):
        assert out[f"a{i}"] == ("core", "a1")
        assert out[f"h{i}"] == ("core", "h1")


def test_dbscan_min_pts_one_makes_singleton_clusters(spark):
    """min_pts=1: every point is a core (itself is its neighborhood), so
    isolated points become singleton clusters, never noise."""
    rows = [("p", _at(0.0)), ("q", _at(90.0))]
    out = {r["id"]: (r["kind"], r["cluster"]) for r in dbscan(
        _emb(spark, rows), threshold=0.95, min_pts=1
    ).collect()}
    assert out == {"p": ("core", "p"), "q": ("core", "q")}
    with pytest.raises(ValueError, match="min_pts"):
        dbscan(_emb(spark, rows), min_pts=0)


def test_dbscan_lsh_mode_and_empty(spark):
    """lsh_bits > 0 routes pair generation through the hyperplane buckets
    (documented recall < 1); identical vectors always share a bucket, so a
    tight clump still clusters.  Empty input -> typed empty."""
    rows = [(f"c{i}", [1.0, 0.0, 0.0, 0.0]) for i in range(5)] + [
        ("far", [0.0, 0.0, 0.0, 1.0])
    ]
    out = {r["id"]: (r["kind"], r["cluster"]) for r in dbscan(
        _emb(spark, rows), threshold=0.99, min_pts=4, lsh_bits=4, dim=4
    ).collect()}
    assert all(out[f"c{i}"] == ("core", "c0") for i in range(5))
    assert out["far"][0] == "noise"
    empty = dbscan(_emb(spark, []), threshold=0.9, min_pts=2)
    assert empty.count() == 0 and set(empty.columns) == {"id", "kind", "cluster"}


def test_kmeans_matches_semdedup_internal_and_is_deterministic(spark):
    """r11 VERDICT #5 parity pin: the public kmeans operator and SemDeDup's
    internal clustering stage are ONE implementation — identical id ->
    cluster maps at identical parameters — and two runs agree exactly
    (hash seeding, no RNG).  sim is the cosine to the assigned centroid,
    so it lives in [-1, 1] and equals 1 for a vector sitting on its
    centroid."""
    from cognee_graphdb_spark.operators.clustering import kmeans
    from cognee_graphdb_spark.operators.dedup import semdedup

    rows = [
        (f"v{i}", [float((i * 3) % 7), float((i * 5) % 11), 1.0]) for i in range(40)
    ]
    emb = _emb3(spark, rows)
    km = {r["id"]: r["cluster"] for r in kmeans(emb, k=5, n_iter=2).collect()}
    sd = {r["id"]: r["cluster"] for r in semdedup(emb, k=5, threshold=0.999, n_iter=2).collect()}
    assert km == sd
    again = kmeans(emb, k=5, n_iter=2).collect()
    assert km == {r["id"]: r["cluster"] for r in again}
    assert all(-1.0 - 1e-9 <= r["sim"] <= 1.0 + 1e-9 for r in again)
    with __import__("pytest").raises(ValueError, match="k must be"):
        kmeans(emb, k=0)


def _emb3(spark, rows):
    return spark.createDataFrame(rows, "vec_id string, embedding array<double>")
