"""Top-level API lifecycle: add -> cognify -> every search type -> delete ->
prune, the reference's canonical E2E flow (tests/test_library.py shape)."""

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.api import SEARCH_TYPES, CogneeSpark

ITEMS = [
    ("spark.txt", "Apache Spark processes large datasets. Spark uses distributed executors."),
    ("duck.txt", "DuckDB is an embedded analytical database. DuckDB executes vectorized queries."),
    ("events.txt", "The launch happened on 2024-03-05. A summit ran from 2024-03-10 to 2024-03-12."),
]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    e = CogneeSpark(spark, str(tmp_path_factory.mktemp("api_store")))
    e.add(ITEMS)
    assert e.cognify() == 3
    return e


def test_incremental_cognify_skips(engine):
    assert engine.cognify() == 0  # ST2: nothing new
    engine.add([("new.txt", "Fresh content arrives later with novel entities.")])
    assert engine.cognify() == 1  # only the new document


def test_all_search_types_run(engine):
    results = {}
    for qt in SEARCH_TYPES:
        if qt == "CYPHER":
            q = "SELECT id, name, type FROM nodes WHERE type = 'Entity' ORDER BY id LIMIT 5"
        elif qt == "NATURAL_LANGUAGE":
            q = "show me every Entity node"
        elif qt == "TEMPORAL":
            q = "what happened between 2024-03-01 and 2024-03-31?"
        elif qt == "FEEDBACK":
            q = "that was a great helpful answer"
        else:
            q = "what uses distributed executors?"
        results[qt] = engine.search(qt, q)
    for qt, out in results.items():
        if isinstance(out, DataFrame):
            out.collect()  # must execute cleanly
        elif isinstance(out, str):
            assert out.startswith("MOCK_COMPLETION"), qt
    assert isinstance(results["FEEDBACK"], dict)
    chosen, _ = results["FEELING_LUCKY"]
    assert chosen in SEARCH_TYPES


def test_only_context_returns_triplets(engine):
    ctx = engine.search("GRAPH_COMPLETION", "spark executors", only_context=True)
    assert "triplet_score" in ctx.columns
    assert 0 < len(ctx.collect()) <= 5


def test_save_interaction_then_feedback(engine):
    engine.search("GRAPH_COMPLETION", "what uses executors?", save_interaction=True)
    inter = engine.store.load("nodes").filter(F.col("type") == "CogneeUserInteraction")
    assert inter.count() >= 1
    out = engine.search("FEEDBACK", "excellent correct useful answer")
    assert out["score"] > 0 and out["interactions"]


def test_query_logging_and_metrics(engine):
    before = engine.query_log().count() if engine.query_log() is not None else 0
    engine.search("CHUNKS", "logged query text")
    log = engine.query_log()
    assert log.count() == before + 1
    row = log.orderBy(F.col("at").desc()).first()
    assert row["query_type"] == "CHUNKS" and row["query_text"] == "logged query text"
    m = engine.metrics()
    assert m["num_nodes"] > 0 and m["num_edges"] > 0 and m["num_connected_components"] >= 1


def test_node_set_tagging(spark, tmp_path):
    e = CogneeSpark(spark, str(tmp_path / "ns"))
    e.add([("rule1.txt", "Always run pytest before committing changes.")], node_set="coding_agent_rules")
    e.add([("other.txt", "Unrelated plain document without a set.")])
    e.cognify()
    nodes = e.store.load("nodes")
    assert nodes.filter(F.col("type") == "NodeSet").count() == 1
    edges = e.store.load("edges")
    tagged = edges.filter(F.col("relationship_name") == "belongs_to")
    assert tagged.count() == 1


def test_temporal_variant_and_delete_prune(spark, tmp_path):
    e = CogneeSpark(spark, str(tmp_path / "t"))
    e.add(ITEMS)
    assert e.cognify(temporal=True) == 3
    ev = e.store.load("nodes").filter(F.col("type") == "Event")
    assert ev.count() >= 2
    out = e.search("TEMPORAL", "what happened between 2024-03-01 and 2024-03-31?")
    assert out.count() >= 2

    e2 = CogneeSpark(spark, str(tmp_path / "d"))
    e2.add(ITEMS[:2])
    e2.cognify()
    doc_id = e2.store.load("nodes").filter(F.col("type") == "TextDocument").first()["id"]
    assert e2.delete(doc_id) > 0
    e2.prune()
    with pytest.raises(RuntimeError):
        e2.search("CHUNKS", "anything")


def test_delete_by_name_then_readd_reprocesses(spark, tmp_path):
    """delete() resolves the name passed to add (ingest content-addresses the
    row id, so the name is the user-visible handle) and clears the processed
    hash: re-adding the same content re-cognifies instead of the ST2 skip."""
    e = CogneeSpark(spark, str(tmp_path / "dn"))
    e.add(ITEMS[:2])
    assert e.cognify() == 2
    assert e.delete("spark.txt") > 0
    names = {r["name"] for r in e.store.load("data").select("name").collect()}
    assert names == {"duck.txt"}
    # graph subtree gone
    assert e.store.load("nodes").filter(F.col("type") == "TextDocument").count() == 1
    # same content re-processes after delete
    e.add(ITEMS[:1])
    assert e.cognify() == 1


def test_update_replaces_document_content(spark, tmp_path):
    """api/v1/update: delete + re-add + re-cognify under the same name."""
    e = CogneeSpark(spark, str(tmp_path / "up"))
    e.add(ITEMS[:2])
    assert e.cognify() == 2
    assert e.update("spark.txt", "Apache Flink also processes streams. Flink snapshots state.") == 1
    data = e.store.load("data")
    assert data.count() == 2  # still two documents
    texts = {r["text"] for r in data.select("text").collect()}
    assert any("Flink" in t for t in texts) and not any("executors" in t for t in texts)
    # the old document's chunks are gone from the graph
    chunks = e.store.load("nodes").filter(F.col("type") == "DocumentChunk")
    assert not any("executors" in (r["properties"] or {}).get("text", "") for r in chunks.collect())


def test_soft_delete_keeps_shared_leaves_and_tombstones_ledger(spark, tmp_path):
    """mode='soft' (default) cascades the document subtree but leaves
    graph-wide degree-one Entity/EntityType nodes alone (delete.py: only hard
    mode runs the degree-one sweep), and the ledger view shows deleted_at on
    rows touching deleted nodes (delete.py:152-166)."""
    e = CogneeSpark(spark, str(tmp_path / "sd"))
    e.add(ITEMS[:2])
    e.cognify()
    from cognee_graphdb_spark.operators.aggregations import degree_one_nodes

    doomed_doc = e.store.load("data").filter(F.col("name") == "spark.txt").first()["id"]
    before = {r["id"] for r in e.store.load("nodes").select("id").collect()}
    assert e.delete("spark.txt", mode="soft") > 0
    nodes, edges = e.store.load("nodes"), e.store.load("edges")
    after = {r["id"] for r in nodes.select("id").collect()}
    # soft = the J7 cascade only: no degree-one sweep ran (no delete_hard
    # ledger op), and the other document's subtree is fully intact
    led_ops = {r["op"] for r in e.store.ledger().select("op").distinct().collect()}
    assert any(op.startswith("delete_nodes") for op in led_ops)  # the cascade applied...
    deleted_ops = {
        r["created_by"]
        for r in e.store.ledger().filter(F.col("op").startswith("delete_nodes")).select("created_by").collect()
    }
    assert deleted_ops == {"delete_document"}  # ...but never the hard sweep
    assert nodes.filter(F.col("type") == "TextDocument").count() == 1
    # every removed node belonged to the deleted doc's cascade, which keeps
    # shared/degree>=1 leaves of other docs by construction
    assert after < before
    # ledger tombstones: the deleted doc node's creation rows (keys are
    # |-delimited, incl. dataset_id) get deleted_at; the survivor's do not
    led = e.store.ledger_with_deletions()
    doc_rows = led.filter(F.col("id").startswith(f"doc:{doomed_doc}"))
    assert doc_rows.count() > 0
    assert doc_rows.filter(F.col("deleted_at").isNotNull()).count() == doc_rows.count()
    survivor = nodes.filter(F.col("type") == "TextDocument").first()["id"]
    srows = led.filter(F.col("id").startswith(survivor))
    assert srows.count() > 0
    assert srows.filter(F.col("deleted_at").isNotNull()).count() == 0
    # hard mode on the remaining doc DOES run the degree-one sweep — the
    # whole graph empties (reference test_delete_hard.py's end state)
    e.delete("duck.txt", mode="hard")
    nodes2, edges2 = e.store.load("nodes"), e.store.load("edges")
    if nodes2 is not None and edges2 is not None:
        assert degree_one_nodes(nodes2, edges2, "Entity").count() == 0


def test_hard_delete_removes_degree_one_leaves(spark, tmp_path):
    """mode='hard' also removes graph-wide degree-one Entity/EntityType nodes
    after the cascade (delete.py:248-263)."""
    e = CogneeSpark(spark, str(tmp_path / "hd"))
    e.add(ITEMS[:2])
    e.cognify()
    from cognee_graphdb_spark.operators.aggregations import degree_one_nodes

    n = e.delete("spark.txt", mode="hard")
    assert n > 0
    nodes, edges = e.store.load("nodes"), e.store.load("edges")
    assert degree_one_nodes(nodes, edges, "Entity").count() == 0
    assert degree_one_nodes(nodes, edges, "EntityType").count() == 0
    with pytest.raises(ValueError):
        e.delete("duck.txt", mode="nuclear")


def test_visualize_renders_bounded_html(spark, tmp_path):
    e = CogneeSpark(spark, str(tmp_path / "vz"))
    e.add(ITEMS[:2])
    e.cognify()
    out = str(tmp_path / "graph.html")
    html = e.visualize(destination_file_path=out, max_nodes=10)
    assert html.startswith("<!DOCTYPE html>")
    import json, re

    payload = json.loads(re.search(r"const nodes = (\[.*?\]);", html).group(1))
    assert 0 < len(payload) <= 10
    assert {"id", "name", "type", "degree"} <= set(payload[0])
    with open(out) as f:
        assert f.read() == html


def test_sync_between_stores(spark, tmp_path):
    """Reference cloud-sync parity (api/v1/sync/sync.py) store-to-store:
    content-hash diff, push/pull via MERGE upserts, cognify of pulled data,
    idempotent re-sync, and run-log records on both sides."""
    from cognee_graphdb_spark.api import CogneeSpark

    a = CogneeSpark(spark, str(tmp_path / "a"))
    b = CogneeSpark(spark, f"file://{tmp_path / 'b'}")  # scheme-generic remote
    a.add([("x.txt", "Alpha document about spark engines and shuffles.")])
    a.cognify()
    b.add([("y.txt", "Beta document about graphs and vector search.")])

    rep = a.sync(f"file://{tmp_path / 'b'}")
    assert rep["pushed"] == 1 and rep["pulled"] == 1
    assert rep["cognified"] == 1  # the pulled doc built locally

    # both stores now hold both content hashes
    assert a.store.load("data").select("content_hash").distinct().count() == 2
    assert b.store.load("data").select("content_hash").distinct().count() == 2

    # idempotent: nothing moves on re-sync
    rep2 = a.sync(f"file://{tmp_path / 'b'}")
    assert (rep2["pushed"], rep2["pulled"], rep2["cognified"]) == (0, 0, 0)

    # push-only from an empty third store is a no-op pull-side
    c = CogneeSpark(spark, str(tmp_path / "c"))
    rep3 = c.sync(str(tmp_path / "a"), direction="push")
    assert (rep3["pushed"], rep3["pulled"]) == (0, 0)
    rep4 = c.sync(str(tmp_path / "a"), direction="pull", run_cognify=False)
    assert rep4["pulled"] == 2 and rep4["cognified"] == 0

    # the sync operation is recorded in both run logs
    assert not a.runs.should_run(a.dataset_id, "sync")
    assert not b.runs.should_run(b.dataset_id, "sync")

    # ACL: a user without write cannot sync
    import pytest as _pytest

    with _pytest.raises(PermissionError):
        a.sync(str(tmp_path / "b"), user_id="nobody")


def test_shortest_paths_api_surface(engine):
    """Weighted SSSP + path rendering reachable through the user API (r9
    verdict item 7): hop-cost paths from a real stored node, rendered
    "src->...->node" strings, plus the weight_property variant over the
    FEEDBACK-mutated edge properties and the raw (unrendered) dist frame."""
    nodes = engine.store.load("nodes")
    src = nodes.filter(F.col("type") == "Entity").orderBy("id").first()["id"]

    rendered = engine.shortest_paths([src], max_hops=4)
    rows = rendered.collect()
    assert {"source", "node", "dist", "path", "truncated"} <= set(rendered.columns)
    assert rows, "source should reach at least itself"
    by_node = {r["node"]: r for r in rows}
    assert by_node[src]["dist"] == 0.0
    assert by_node[src]["path"] == src
    # every rendered path starts at the source and ends at the node
    for r in rows:
        assert r["path"].startswith(src) and r["path"].endswith(r["node"])
        assert not r["truncated"]
    # unit weights: dist == hop count == path length - 1
    for r in rows:
        assert r["dist"] == float(len(r["path"].split("->")) - 1)

    raw = engine.shortest_paths([src], max_hops=4, render=False)
    assert {"source", "node", "dist"} <= set(raw.columns)
    assert raw.count() == len(rows)

    # weight_property path: edges missing the property cost 1, so the frame
    # is well-defined over the whole stored graph
    wp = engine.shortest_paths([src], weight_property="feedback_weight", max_hops=3)
    assert wp.count() > 0

    # directed=True never reaches MORE nodes than undirected
    directed = engine.shortest_paths([src], max_hops=4, directed=True, render=False)
    assert directed.count() <= len(rows)


def test_graph_embedding_lifecycle(spark, tmp_path):
    """Stretch loop closed (r9 verdict item 8): cognify -> embed_graph
    (walks -> skip-grams -> SPPMI-SVD persisted as the Entity_graph
    collection via the S7 upsert) -> similar_nodes serves the graph vectors
    through V6 fan-out.  Re-embedding an unchanged graph is idempotent."""
    e = CogneeSpark(spark, str(tmp_path / "embed_store"))
    e.add(ITEMS)
    assert e.cognify() == 3

    n = e.embed_graph(dim=8, n_iter=2)
    assert n > 0
    emb = e.store.load("embeddings")
    graph_rows = emb.filter(F.col("collection") == "Entity_graph")
    assert graph_rows.count() == n
    # vectors have the GRAPH dimension, not the text embedder's
    dims = graph_rows.select(F.size("vector").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [8]
    # every embedded id is a stored graph node
    nodes = e.store.load("nodes").select("id")
    assert graph_rows.join(nodes, "id", "left_anti").count() == 0

    # search serves the graph vectors (V6 fan-out over Entity_graph)
    src = graph_rows.orderBy("id").first()["id"]
    hits = e.similar_nodes(src, k=3)
    rows = hits.collect()
    assert 0 < len(rows) <= 3
    assert all(r["id"] != src for r in rows)
    assert all(r["collection"] == "Entity_graph" for r in rows)

    # unknown node -> actionable error
    with pytest.raises(ValueError, match="embed_graph"):
        e.similar_nodes("no-such-node")

    # idempotent upsert: same graph, same rows (merge by collection+id)
    n2 = e.embed_graph(dim=8, n_iter=2)
    assert n2 == n
    assert e.store.load("embeddings").filter(
        F.col("collection") == "Entity_graph"
    ).count() == n


def test_communities_api_surface(engine):
    """gds.louvain / gds.leiden / gds.labelPropagation reachable through the
    user API: every algorithm partitions every stored node; unknown
    algorithm names the valid choices."""
    for algo in ("louvain", "leiden", "lpa"):
        labels = engine.communities(algorithm=algo)
        assert set(labels.columns) == {"id", "label"}
        n_nodes = engine.store.load("nodes").select("id").distinct().count()
        assert labels.select("id").distinct().count() == n_nodes
        assert labels.select("label").distinct().count() >= 2
    with pytest.raises(ValueError, match="louvain, leiden, lpa"):
        engine.communities(algorithm="nope")


def test_strongly_connected_api_surface(engine):
    """gds.scc reachable through the user API: every stored node gets a
    component label; the KG built by cognify is a DAG-ish extraction graph,
    so labels are fine-grained (>= the community count)."""
    labels = engine.strongly_connected()
    assert set(labels.columns) == {"id", "label"}
    n_nodes = engine.store.load("nodes").select("id").distinct().count()
    assert labels.select("id").distinct().count() == n_nodes


def test_centrality_api_surface(engine):
    """The GDS centrality family reachable through the user API: pagerank,
    hits (previously CALL-only — the r10 review item), sampled harmonic
    closeness, and source-sampled betweenness; unknown algorithm names the
    valid choices."""
    n_nodes = engine.store.load("nodes").select("id").distinct().count()
    pr = engine.centrality()  # default pagerank
    assert set(pr.columns) == {"id", "rank"}
    assert pr.count() == n_nodes
    ha = engine.centrality("hits")
    assert set(ha.columns) == {"id", "hub", "authority"}
    assert ha.count() == n_nodes
    ev = engine.centrality("eigenvector", n_iter=3)
    assert set(ev.columns) == {"id", "score"}
    assert ev.count() == n_nodes
    ar = engine.centrality("articlerank", n_iter=3)
    assert set(ar.columns) == {"id", "rank"}
    assert ar.count() == n_nodes
    harm = engine.centrality("harmonic", n_rounds=2)
    assert {"id", "closeness"} <= set(harm.columns)
    bt = engine.centrality("betweenness", n_sources=4, max_hops=3)
    assert set(bt.columns) == {"node", "betweenness"}
    with pytest.raises(ValueError, match="pagerank, eigenvector, articlerank"):
        engine.centrality("nope")


def test_spanning_forest_api_surface(engine):
    """Unit-weight MSF over the stored graph = its deterministic skeleton:
    per connected component exactly |V|-1 edges, every node covered, two
    calls identical (hash tie-break)."""
    from cognee_graphdb_spark.operators.graph_metrics import connected_components

    nodes = engine.store.load("nodes")
    edges = engine.store.load("edges")
    n_components = (
        connected_components(nodes.select("id"), edges)
        .select("component")
        .distinct()
        .count()
    )
    covered = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    # isolated nodes (no edges) form singleton components with 0 MSF edges
    iso = nodes.select("id").distinct().count() - covered
    sk = engine.spanning_forest()
    assert set(sk.columns) == {"src", "dst", "weight"}
    assert sk.count() == covered - (n_components - iso)
    again = engine.spanning_forest()
    assert sorted(map(tuple, sk.collect())) == sorted(map(tuple, again.collect()))


def test_cluster_embeddings_api_surface(engine):
    """DBSCAN over a stored vector collection: one row per collection
    member, kinds within the DBSCAN vocabulary, clusters named by member
    ids; unknown collection -> empty, store intact."""
    n = (
        engine.store.load("embeddings")
        .filter(F.col("collection") == "Entity_name")
        .count()
    )
    out = engine.cluster_embeddings("Entity_name", threshold=0.99, min_pts=2)
    rows = out.collect()
    assert len(rows) == n
    assert {r["kind"] for r in rows} <= {"core", "border", "noise"}
    assert engine.cluster_embeddings("NoSuchCollection").count() == 0
    # algorithm="kmeans" (r12): exactly-k spherical topics, one row per
    # member, at most k distinct clusters, no guard needed (k-row broadcast)
    km = engine.cluster_embeddings("Entity_name", algorithm="kmeans", k=3, n_iter=2)
    krows = km.collect()
    assert len(krows) == n and set(km.columns) == {"id", "cluster", "sim"}
    assert len({r["cluster"] for r in krows}) <= 3
    with pytest.raises(ValueError, match="dbscan, kmeans"):
        engine.cluster_embeddings("Entity_name", algorithm="nope")


def test_cluster_embeddings_exact_guard(engine, monkeypatch):
    """r11 VERDICT #3: lsh_bits=0 is the exact ε-pair path — a blocked
    cross join, the same scale class as the guarded all-pairs CALL
    procedures — so above the row budget the verb refuses naming lsh_bits
    as the scale path; the opt-in conf and the bucketed path both pass."""
    import cognee_graphdb_spark.api as api_mod
    from cognee_graphdb_spark.plans.cypher import GdsScaleGuard

    monkeypatch.setattr(api_mod, "_EXACT_PAIRS_ROW_BUDGET", 1)
    with pytest.raises(GdsScaleGuard, match="lsh_bits"):
        engine.cluster_embeddings("Entity_name", threshold=0.99, min_pts=2)
    # explicit opt-in runs the exact path anyway
    engine.spark.conf.set("spark.cognee.cluster.allowExactPairs", "true")
    try:
        out = engine.cluster_embeddings("Entity_name", threshold=0.99, min_pts=2)
        assert out.count() > 0
    finally:
        engine.spark.conf.unset("spark.cognee.cluster.allowExactPairs")
    # the bucketed scale path needs no opt-in at any size
    bucketed = engine.cluster_embeddings(
        "Entity_name", threshold=0.99, min_pts=2, lsh_bits=4
    )
    assert {r["kind"] for r in bucketed.collect()} <= {"core", "border", "noise"}


def test_centrality_betweenness_unbiased_scaling(engine):
    """r11 ADVICE: the sampled betweenness verb returns V/|sources|-
    unbiased, undirected-halved values — with the sample covering every
    node it must equal the CALL route's exact convention (raw Brandes
    accumulation / 2), and repeated calls at a fixed sample are
    deterministic."""
    from cognee_graphdb_spark.operators.graph_metrics import betweenness_sampled

    nodes = engine.store.load("nodes")
    edges = engine.store.load("edges")
    ids = nodes.select("id").distinct()
    n = ids.count()
    exact = {
        r["node"]: r["betweenness"] / 2.0
        for r in betweenness_sampled(edges, ids, max_hops=8).collect()
    }
    api_all = {
        r["node"]: r["betweenness"]
        for r in engine.centrality("betweenness", n_sources=n, max_hops=8).collect()
    }
    assert set(api_all) == set(exact)
    assert all(abs(api_all[k] - exact[k]) < 1e-9 for k in exact)
    a = sorted(map(tuple, engine.centrality("betweenness", n_sources=4, max_hops=3).collect()))
    b = sorted(map(tuple, engine.centrality("betweenness", n_sources=4, max_hops=3).collect()))
    assert a == b


def test_refresh_pagerank_pin_newer_than_ledger(spark, tmp_path):
    """r11 ADVICE (medium): a snapshot pin taken AFTER edges entered the
    store but BEFORE they entered the maintenance ledger must not hide
    those edges from the batch — the delta diffs against ledger ∩ pin, so
    ledger-unknown edges always fold in and the warm result matches a cold
    solve (the docstring's never-silently-stale claim, now true for a
    newer-than-ledger pin)."""
    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    e = CogneeSpark(spark, str(tmp_path / "prpin"))
    e.add(ITEMS[:1])
    e.cognify()
    e.refresh_pagerank()  # ledger now knows the first batch only
    e.add(ITEMS[1:2])
    e.cognify()
    pin = e.snapshot()  # pin taken AFTER the new edges — newer than ledger
    warm = {r["id"]: r["rank"] for r in e.refresh_pagerank(since=pin).collect()}
    edges = e.store.load("edges").select("src", "dst").distinct()
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    ref = {
        r["id"]: r["rank"]
        for r in pagerank(
            nodes, edges, n_iter=50, tol=1e-9,
            ids_distinct=True, edges_within_nodes=True,
        ).collect()
    }
    assert set(warm) == set(ref)
    assert all(abs(warm[k] - ref[k]) < 1e-6 for k in ref)


def test_community_quality_api_surface(engine):
    """Modularity contributions and conductance, joined per community, for
    any clustering of the stored graph."""
    out = engine.community_quality(algorithm="louvain")
    rows = out.collect()
    assert rows and set(out.columns) == {
        "label", "n_nodes", "sym_within", "total_degree", "contrib_scaled",
        "internal", "boundary", "conductance_ppm",
    }
    # internal counts within-community ordered pairs = sym_within
    assert all(r["internal"] == r["sym_within"] for r in rows)
    assert all(0 <= r["conductance_ppm"] <= 1_000_000 for r in rows)


def test_refresh_pagerank_incremental_lifecycle(spark, tmp_path):
    """The r10 stretch composition: snapshot/diff_since's evolution pointer
    drives streaming-PageRank warm starts.  upsert -> refresh (cold) ->
    cognify more -> refresh(since=pin) folds only the edge delta and matches
    a cold solve within tol; a delete triggers the automatic cold rebuild
    and still matches."""
    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    e = CogneeSpark(spark, str(tmp_path / "prmaint"))
    e.add(ITEMS[:1])
    e.cognify()
    r1 = e.refresh_pagerank()
    assert set(r1.columns) == {"id", "rank"}

    def cold(engine):
        edges = engine.store.load("edges").select("src", "dst").distinct()
        nodes = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        return pagerank(
            nodes, edges, n_iter=50, tol=1e-9,
            ids_distinct=True, edges_within_nodes=True,
        )

    pin = e.snapshot()
    e.add(ITEMS[1:2])
    e.cognify()
    assert e.diff_since(pin)["edges"]["added"] > 0  # the pointer moved
    warm = {r["id"]: r["rank"] for r in e.refresh_pagerank(since=pin).collect()}
    ref = {r["id"]: r["rank"] for r in cold(e).collect()}
    assert set(warm) == set(ref)
    assert all(abs(warm[k] - ref[k]) < 1e-6 for k in ref)

    # deletion -> union ledger can't express it -> automatic cold rebuild
    e.delete("spark.txt", mode="hard")
    rebuilt = {r["id"]: r["rank"] for r in e.refresh_pagerank().collect()}
    ref2 = {r["id"]: r["rank"] for r in cold(e).collect()}
    assert set(rebuilt) == set(ref2)
    assert all(abs(rebuilt[k] - ref2[k]) < 1e-6 for k in ref2)


def test_refresh_communities_incremental_lifecycle(spark, tmp_path):
    """r11 VERDICT #8: refresh_pagerank's pattern extended to louvain —
    communities(refresh=True) folds only the edge delta, warm-starts the
    solve from the previous labels, and matches a cold solve's QUALITY
    (modularity band; warm labels are a valid partition but not byte-equal
    to cold in general).  First call = cold exactly; a delete triggers the
    automatic cold rebuild and matches cold exactly again."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        louvain,
        modularity,
        modularity_score,
    )

    e = CogneeSpark(spark, str(tmp_path / "cmmaint"))
    e.add(ITEMS[:1])
    e.cognify()

    def cold(engine):
        edges = engine.store.load("edges").select("src", "dst").distinct()
        nodes = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        return louvain(
            nodes,
            edges.withColumn("relationship_name", F.lit("stream")),
            n_levels=2,
            n_rounds=3,
        )

    l1 = {r["id"]: r["label"] for r in e.communities(refresh=True).collect()}
    c1 = {r["id"]: r["label"] for r in cold(e).collect()}
    assert l1 == c1  # no prior state -> the warm path IS the cold path

    e.add(ITEMS[1:2])
    e.cognify()
    warm = e.communities(refresh=True)
    wmap = {r["id"]: r["label"] for r in warm.collect()}
    cmap = {r["id"]: r["label"] for r in cold(e).collect()}
    assert set(wmap) == set(cmap)  # full coverage of the grown graph
    edges_now = (
        e.store.load("edges")
        .select("src", "dst")
        .distinct()
        .withColumn("relationship_name", F.lit("stream"))
    )
    qw = modularity_score(modularity(edges_now, warm))
    qc = modularity_score(
        modularity(edges_now, cold(e))
    )
    # warm quality tracks cold: within 10% of the cold modularity (both
    # are valid partitions; the warm one starts from the settled labels)
    assert qw >= qc - 0.1 * abs(qc), (qw, qc)

    # deletion -> ledger can't express it -> automatic cold rebuild
    e.delete("spark.txt", mode="hard")
    rebuilt = {r["id"]: r["label"] for r in e.communities(refresh=True).collect()}
    cref = {r["id"]: r["label"] for r in cold(e).collect()}
    assert rebuilt == cref
    with pytest.raises(ValueError, match="louvain"):
        e.communities(algorithm="lpa", refresh=True)

    # isolated store nodes: the maintenance ledger only knows edge
    # endpoints, but toggling refresh must never change the id SET — an
    # isolated node stays a singleton (cold louvain's xxhash64 convention)
    iso = e.spark.createDataFrame(
        [("lonely-node", "lonely", "Entity")], "id string, name string, type string"
    ).select(
        "id", "name", "type",
        F.lit(None).cast("timestamp").alias("created_at"),
        F.lit(None).cast("timestamp").alias("updated_at"),
        F.create_map().cast("map<string,string>").alias("properties"),
        F.lit(e.dataset_id).alias("dataset_id"),
    )
    e.store.upsert_nodes(iso, created_by="test")
    warm_ids = {r["id"]: r["label"] for r in e.communities(refresh=True).collect()}
    cold_ids = {r["id"] for r in e.communities().collect()}
    assert "lonely-node" in warm_ids and set(warm_ids) == cold_ids
    import pyspark.sql.functions as SF
    [h] = e.spark.createDataFrame([("lonely-node",)], "id string").select(
        SF.xxhash64("id")
    ).collect()
    assert warm_ids["lonely-node"] == h[0]


def test_snapshot_diff_tracks_graph_evolution(spark, tmp_path):
    """snapshot() pins versions; diff_since() shows what a later cognify
    added and what a delete removed — key-based, updates count in neither."""
    e = CogneeSpark(spark, str(tmp_path / "snap"))
    e.add(ITEMS[:1])
    e.cognify()
    pin = e.snapshot()
    base = e.diff_since(pin)
    assert all(v == {"added": 0, "removed": 0} for v in base.values())
    e.add(ITEMS[1:2])
    e.cognify()
    grown = e.diff_since(pin)
    assert grown["data"]["added"] == 1 and grown["data"]["removed"] == 0
    assert grown["nodes"]["added"] > 0 and grown["nodes"]["removed"] == 0
    pin2 = e.snapshot()
    e.delete("duck.txt")
    shrunk = e.diff_since(pin2)
    assert shrunk["data"]["removed"] == 1
    assert shrunk["nodes"]["removed"] > 0


def test_snapshot_of_emptied_table_diffs_clean(spark, tmp_path):
    """Review fix pinned: a pin taken while a table is a 0-row snapshot
    (no parquet footers) reads as absent, not an AnalysisException."""
    e = CogneeSpark(spark, str(tmp_path / "snap0"))
    e.add(ITEMS[:1])
    e.cognify()
    e.delete(ITEMS[0][0], mode="hard")
    pin = e.snapshot()
    e.add(ITEMS[1:2])
    e.cognify()
    diff = e.diff_since(pin)
    assert diff["data"]["added"] == 1 and diff["data"]["removed"] == 0


def test_graph_embedding_fastrp_method(spark, tmp_path):
    """embed_graph(method='fastrp') — the walk-free gds.fastRP producer on
    the same S7 lifecycle: same Entity_graph collection, graph dimension,
    idempotent upsert, served by similar_nodes; an unknown method names
    the choices."""
    e = CogneeSpark(spark, str(tmp_path / "frp_store"))
    e.add(ITEMS)
    assert e.cognify() == 3

    n = e.embed_graph(dim=8, method="fastrp")
    assert n > 0
    graph_rows = e.store.load("embeddings").filter(
        F.col("collection") == "Entity_graph"
    )
    assert graph_rows.count() == n
    dims = graph_rows.select(F.size("vector").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [8]
    assert graph_rows.first()["payload"]["source"] == "fastrp"
    # served through the same V6 fan-out
    src = graph_rows.orderBy("id").first()["id"]
    hits = e.similar_nodes(src, k=3).collect()
    assert 0 < len(hits) <= 3 and all(r["id"] != src for r in hits)
    # idempotent: re-embedding the unchanged graph upserts the same rows
    assert e.embed_graph(dim=8, method="fastrp") == n
    with pytest.raises(ValueError, match="sppmi, fastrp"):
        e.embed_graph(method="nope")


def test_refresh_embeddings_incremental_matches_cold(spark, tmp_path):
    """refresh_embeddings: the refresh_pagerank pattern on embeddings.
    First call = full embed; unchanged graph = 0 work; after graph changes
    the K-hop-ball recompute matches a COLD ENGINE's full embed row for
    row (ids are content-addressed, so an independent store over the same
    documents is a true cold reference — and it can't invalidate the warm
    engine's refresh ledger the way an in-place re-embed would); a node
    that loses every edge gets its row DROPPED; a dim change forces a full
    re-embed; a full embed_graph invalidates the ledger so a later refresh
    re-seeds instead of warm-patching over it (producer-mixing guard)."""
    e = CogneeSpark(spark, str(tmp_path / "refresh_emb_store"))
    e.add(ITEMS)
    assert e.cognify() == 3

    n0 = e.refresh_embeddings(dim=8)
    assert n0 > 0
    assert e.refresh_embeddings(dim=8) == 0  # unchanged graph

    DELTA = ("delta.txt", "Databricks tunes Spark clusters for analytics.")

    def snapshot(eng):
        return {
            r["id"]: list(r["vector"])
            for r in eng.store.load("embeddings")
            .filter(F.col("collection") == "Entity_graph")
            .collect()
        }

    def assert_matches_cold(eng, docs, store_name):
        cold_eng = CogneeSpark(spark, str(tmp_path / store_name))
        cold_eng.add(docs)
        cold_eng.cognify()
        cold_eng.embed_graph(dim=8, method="fastrp")
        warm, cold = snapshot(eng), snapshot(cold_eng)
        assert set(warm) == set(cold)
        for node_id, vec in cold.items():
            assert warm[node_id] == pytest.approx(vec, abs=1e-5), node_id

    # grow the graph, refresh incrementally, compare against a cold engine
    e.add([DELTA])
    assert e.cognify() == 1
    assert e.refresh_embeddings(dim=8) > 0
    assert_matches_cold(e, ITEMS + [DELTA], "cold_grown")

    # deletion: nodes/edges cascade away -> the warm ball recompute still
    # matches cold (no cold-rebuild branch needed for removals)
    e.delete("delta.txt")
    assert e.refresh_embeddings(dim=8) >= 0
    assert_matches_cold(e, ITEMS, "cold_shrunk")

    # a node still in the graph but with no edges left must LOSE its row
    edges = e.store.load("edges")
    leaf = edges.groupBy("dst").count().filter("count = 1").first()
    if leaf is not None:
        victim = leaf["dst"]
        kept = edges.filter((F.col("src") != victim) & (F.col("dst") != victim))
        e.store._swap_write("edges", kept)
        e.refresh_embeddings(dim=8)
        assert victim not in snapshot(e)

    # parameter change = full re-embed (ledgered params)
    n_dim = e.refresh_embeddings(dim=4)
    assert n_dim == len(snapshot(e))
    assert {len(v) for v in snapshot(e).values()} == {4}

    # producer-mixing guard: a full sppmi embed invalidates the refresh
    # ledger, so the next refresh re-seeds with a FULL fastrp embed (every
    # row overwritten) instead of warm-patching a mixed collection
    e.embed_graph(dim=4, method="sppmi")
    n_reseed = e.refresh_embeddings(dim=4)
    assert n_reseed == len(snapshot(e))  # full, not 0
