"""HTTP serving surface (server.py): the reference's /api/v1/* route shapes
(api/client.py:225-291) over CogneeSpark, stdlib-only, exercised through a
real socket."""

import json
import urllib.error
import urllib.request

import pytest

from cognee_graphdb_spark.api import CogneeSpark
from cognee_graphdb_spark.server import serve


@pytest.fixture(scope="module")
def srv(spark, tmp_path_factory):
    engine = CogneeSpark(spark, str(tmp_path_factory.mktemp("http_store")))
    server = serve(engine)
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()


def call(base, method, path, payload=None):
    req = urllib.request.Request(
        base + path,
        method=method,
        data=None if payload is None else json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        ct = resp.headers.get("Content-Type", "")
        body = resp.read().decode()
        return resp.status, json.loads(body) if "json" in ct else body


def test_health(srv):
    status, body = call(srv, "GET", "/health")
    assert status == 200 and body == {"status": "ok"}


def test_add_cognify_search_lifecycle(srv):
    status, body = call(srv, "POST", "/api/v1/add", {
        "data": [
            {"name": "a.txt", "text": "Apache Spark processes large datasets with executors."},
            {"name": "b.txt", "text": "DuckDB runs analytical queries embedded in-process."},
        ],
    })
    assert status == 200 and body == {"added": 2}
    status, body = call(srv, "POST", "/api/v1/cognify", {})
    assert status == 200 and body == {"documents_processed": 2}
    # camelCase payload keys are accepted like the reference's DTO aliasing
    status, rows = call(srv, "POST", "/api/v1/search", {
        "searchType": "CHUNKS", "query": "Spark executors", "topK": 3,
    })
    assert status == 200 and isinstance(rows, list) and rows
    assert any("text" in r for r in rows)
    status, completion = call(srv, "POST", "/api/v1/search", {
        "search_type": "GRAPH_COMPLETION", "query": "What processes datasets?",
    })
    assert status == 200 and isinstance(completion, str)
    # GET /api/v1/search = query history (both searches above logged)
    status, hist = call(srv, "GET", "/api/v1/search")
    assert status == 200 and len(hist) >= 2
    status, ds = call(srv, "GET", "/api/v1/datasets")
    assert status == 200 and isinstance(ds, list) and ds
    status, html = call(srv, "GET", "/api/v1/visualize")
    assert status == 200 and "<html" in html.lower()


def test_centrality_and_scc_routes(srv):
    """gds.hits and gds.scc reachable over HTTP (runs after the lifecycle
    test so the module-scoped store has a graph; before the prune test)."""
    status, rows = call(srv, "POST", "/api/v1/centrality", {"algorithm": "hits"})
    assert status == 200 and rows
    assert {"id", "hub", "authority"} <= set(rows[0])
    status, rows = call(srv, "POST", "/api/v1/centrality", {})
    assert status == 200 and rows and "rank" in rows[0]
    status, rows = call(srv, "GET", "/api/v1/scc")
    assert status == 200 and rows and {"id", "label"} <= set(rows[0])
    # unknown algorithm -> 400 naming the choices (ValueError mapping)
    req = urllib.request.Request(
        srv + "/api/v1/centrality", method="POST",
        data=json.dumps({"algorithm": "nope"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_spanning_cluster_topology_routes(srv):
    """The r11 operators reach HTTP (r11 VERDICT #7): spanning_forest
    returns the store graph's skeleton, cluster_embeddings DBSCANs a
    stored collection (the scale guard sits inside the verb), and
    /topology answers layers on a DAG store or a 400 naming the cycle —
    fail-loudly either way, never a 500."""
    status, rows = call(srv, "POST", "/api/v1/spanning_forest", {})
    assert status == 200 and rows and {"src", "dst", "weight"} <= set(rows[0])
    status, rows = call(srv, "POST", "/api/v1/cluster_embeddings", {
        "collection": "Entity_name", "threshold": 0.99, "min_pts": 2,
    })
    assert status == 200 and rows
    assert {"id", "kind", "cluster"} <= set(rows[0])
    assert {r["kind"] for r in rows} <= {"core", "border", "noise"}
    status, rows = call(srv, "POST", "/api/v1/cluster_embeddings", {
        "collection": "Entity_name", "algorithm": "kmeans", "k": 3, "n_iter": 2,
    })
    assert status == 200 and rows and {"id", "cluster", "sim"} <= set(rows[0])
    req = urllib.request.Request(srv + "/api/v1/topology", method="GET")
    try:
        with urllib.request.urlopen(req) as resp:
            body = json.loads(resp.read().decode())
            assert resp.status == 200
            assert body and {"id", "layer"} <= set(body[0])
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "cycle" in json.loads(e.read().decode())["error"]


def test_update_delete_prune_and_errors(srv):
    status, body = call(srv, "POST", "/api/v1/update", {
        "name": "b.txt", "text": "DuckDB also reads parquet files directly.",
    })
    assert status == 200 and body == {"updated": 1}
    status, body = call(srv, "POST", "/api/v1/delete", {"name": "b.txt"})
    assert status == 200 and body["deleted"] > 0

    with pytest.raises(urllib.error.HTTPError) as e:
        call(srv, "POST", "/api/v1/add", {"data": []})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        call(srv, "POST", "/api/v1/search", {"search_type": "NOPE", "query": "x"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        call(srv, "GET", "/api/v1/nope")
    assert e.value.code == 404

    status, body = call(srv, "POST", "/api/v1/prune", {})
    assert status == 200 and body == {"status": "pruned"}
    # searching a pruned store surfaces the engine's RuntimeError as 409
    with pytest.raises(urllib.error.HTTPError) as e:
        call(srv, "POST", "/api/v1/search", {"search_type": "CHUNKS", "query": "x"})
    assert e.value.code == 409


def test_embed_graph_and_similar_nodes_routes(srv):
    """The graph-embedding lifecycle reaches HTTP: embed_graph persists the
    Entity_graph collection (fastrp method = the walk-free scale path),
    similar_nodes serves it; a missing node_id is a 400, not a 500.
    Self-sufficient: the prune test empties the module store, re-add."""
    status, body = call(srv, "POST", "/api/v1/add", {
        "data": [{"name": "g.txt", "text": "Executors shuffle partitions across a Spark cluster."}],
    })
    assert status == 200
    status, body = call(srv, "POST", "/api/v1/cognify", {})
    assert status == 200
    status, body = call(srv, "POST", "/api/v1/embed_graph", {
        "dim": 8, "method": "fastrp",
    })
    assert status == 200 and body["embedded"] > 0
    # incremental maintenance: first refresh seeds the edge ledger (full
    # embed), the second sees an unchanged graph -> 0 rows recomputed
    status, body = call(srv, "POST", "/api/v1/embed_graph", {
        "dim": 8, "refresh": True,
    })
    assert status == 200 and body["refreshed"] and body["embedded"] > 0
    status, body = call(srv, "POST", "/api/v1/embed_graph", {
        "dim": 8, "refresh": True,
    })
    assert status == 200 and body == {"embedded": 0, "refreshed": True}
    # refresh maintains fastrp only: an explicit other method is a 400,
    # never a silent producer mix
    req = urllib.request.Request(
        srv + "/api/v1/embed_graph", method="POST",
        data=json.dumps({"method": "sppmi", "refresh": True}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    # maintained analytics reach HTTP too
    status, rows = call(srv, "POST", "/api/v1/communities", {"algorithm": "louvain"})
    assert status == 200 and rows and {"id", "label"} <= set(rows[0])
    status, rows = call(srv, "POST", "/api/v1/refresh_pagerank", {})
    assert status == 200 and rows and {"id", "rank"} <= set(rows[0])
    status, rows = call(srv, "GET", "/api/v1/scc")
    some_id = rows[0]["id"]
    status, rows = call(srv, "POST", "/api/v1/similar_nodes", {
        "node_id": some_id, "k": 3,
    })
    assert status == 200 and isinstance(rows, list)
    req = urllib.request.Request(
        srv + "/api/v1/similar_nodes", method="POST",
        data=json.dumps({}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    # unknown embedding method -> 400 naming the choices
    req = urllib.request.Request(
        srv + "/api/v1/embed_graph", method="POST",
        data=json.dumps({"method": "nope"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
