"""MCP serving surface (mcp_server.py): the reference cognee-mcp tool set
(cognee-mcp/src/server.py) over newline-delimited JSON-RPC stdio."""

import io
import json

import pytest

from cognee_graphdb_spark.api import CogneeSpark
from cognee_graphdb_spark.mcp_server import McpServer


@pytest.fixture(scope="module")
def mcp(spark, tmp_path_factory):
    engine = CogneeSpark(spark, str(tmp_path_factory.mktemp("mcp_store")))
    return McpServer(engine)


def rpc(mcp, method, params=None, msg_id=1):
    resp = mcp.handle({"jsonrpc": "2.0", "id": msg_id, "method": method,
                       "params": params or {}})
    assert resp["jsonrpc"] == "2.0" and resp["id"] == msg_id
    return resp


def tool(mcp, name, arguments=None):
    resp = rpc(mcp, "tools/call", {"name": name, "arguments": arguments or {}})
    result = resp["result"]
    assert not result.get("isError"), result
    return result["content"][0]["text"]


def test_initialize_and_tool_listing(mcp):
    init = rpc(mcp, "initialize")["result"]
    assert init["serverInfo"]["name"] == "cognee-spark-mcp"
    assert "tools" in init["capabilities"]
    # notifications get no response
    assert mcp.handle({"jsonrpc": "2.0", "method": "notifications/initialized"}) is None
    names = {t["name"] for t in rpc(mcp, "tools/list")["result"]["tools"]}
    assert names == {"cognify", "codify", "search", "save_interaction",
                     "get_developer_rules", "list_data", "delete", "prune",
                     "cognify_status", "centrality", "strongly_connected",
                     "spanning_forest", "cluster_embeddings",
                     "topological_sort", "embed_graph", "similar_nodes",
                     "communities", "refresh_pagerank"}
    err = rpc(mcp, "nope/method")
    assert err["error"]["code"] == -32601


def test_cognify_search_status_lifecycle(mcp):
    out = tool(mcp, "cognify", {
        "data": "Apache Spark distributes work across executors in a cluster."
    })
    assert "cognified 1" in out
    rows = json.loads(tool(mcp, "search", {
        "search_query": "executors", "search_type": "CHUNKS",
    }))
    assert rows and any("text" in r for r in rows)
    completion = tool(mcp, "search", {
        "search_query": "What distributes work?", "search_type": "GRAPH_COMPLETION",
    })
    assert isinstance(completion, str) and completion
    status = json.loads(tool(mcp, "cognify_status"))
    assert status  # the pipeline-run ledger has entries
    listed = json.loads(tool(mcp, "list_data"))
    assert len(listed) >= 1


def test_centrality_and_scc_tools(mcp):
    """gds.hits and gds.scc reachable as MCP tools (the r10 review asked for
    the serving route, not just the CALL dialect)."""
    hits_text = tool(mcp, "centrality", {"algorithm": "hits"})
    assert "hub" in hits_text and "authority" in hits_text
    pr_text = tool(mcp, "centrality")  # default algorithm = pagerank
    assert "rank" in pr_text
    scc_text = tool(mcp, "strongly_connected")
    assert "label" in scc_text


def test_spanning_cluster_topology_tools(mcp):
    """The r11 operators reach MCP (r11 VERDICT #7): spanning_forest's
    skeleton, cluster_embeddings' DBSCAN labels, and topological_sort —
    which on a cyclic memory graph answers the stuck-count error as an
    isError result, not a protocol crash."""
    sk_text = tool(mcp, "spanning_forest")
    assert "src" in sk_text and "dst" in sk_text
    cl_text = tool(mcp, "cluster_embeddings", {
        "collection": "Entity_name", "threshold": 0.99, "min_pts": 2,
    })
    assert "kind" in cl_text and "cluster" in cl_text
    km_text = tool(mcp, "cluster_embeddings", {
        "collection": "Entity_name", "algorithm": "kmeans", "k": 3,
    })
    assert "cluster" in km_text and "sim" in km_text
    resp = rpc(mcp, "tools/call", {"name": "topological_sort", "arguments": {}})
    text = resp["result"]["content"][0]["text"]
    assert ("layer" in text) or (resp["result"].get("isError") and "cycle" in text)


def test_codify_then_code_search(mcp, tmp_path):
    (tmp_path / "pkg").mkdir()
    (tmp_path / "pkg" / "engine.py").write_text(
        "import os\n\nclass Engine:\n    def run(self):\n        return 1\n"
    )
    out = tool(mcp, "codify", {"repo_path": str(tmp_path)})
    assert "codified 1" in out
    rows = json.loads(tool(mcp, "search", {
        "search_query": "engine run", "search_type": "CODE",
    }))
    assert rows


def test_save_interaction_rules_delete_prune(mcp):
    out = tool(mcp, "save_interaction", {
        "data": "User asked to always run pytest before committing changes."
    })
    assert "saved interaction" in out
    rules = json.loads(tool(mcp, "get_developer_rules"))
    assert isinstance(rules, list)
    # tool errors surface as isError results, not protocol crashes
    resp = rpc(mcp, "tools/call", {"name": "delete", "arguments": {"data_id": "missing"}})
    assert resp["result"]["isError"] or "deleted" in resp["result"]["content"][0]["text"]
    assert tool(mcp, "prune") == "pruned"


def test_stdio_transport_loop(mcp):
    lines = "\n".join([
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"}),
        json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
        "this is not json",
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "ping"}),
    ]) + "\n"
    out = io.StringIO()
    mcp.serve_stdio(stdin=io.StringIO(lines), stdout=out)
    resps = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(resps) == 3  # init + parse error + ping; notification silent
    assert resps[0]["result"]["protocolVersion"]
    assert resps[1]["error"]["code"] == -32700
    assert resps[2]["result"] == {}


def test_embed_graph_and_similar_nodes_tools(mcp):
    """The graph-embedding lifecycle reaches MCP: embed_graph (fastrp = the
    walk-free scale path) persists Entity_graph, similar_nodes queries it.
    Self-sufficient: the module's prune test empties the shared store, so
    re-cognify first."""
    out = tool(mcp, "cognify", {
        "data": "Spark executors shuffle partitions across the cluster."
    })
    assert "cognified 1" in out
    out = tool(mcp, "embed_graph", {"dim": 8, "method": "fastrp"})
    assert "embedded" in out and "Entity_graph" in out
    # pick any embedded node via the store's scc stream
    scc_text = tool(mcp, "strongly_connected")
    some_id = json.loads(scc_text)[0]["id"]
    sim_text = tool(mcp, "similar_nodes", {"node_id": some_id, "k": 3})
    assert isinstance(sim_text, str)


def test_communities_and_refresh_pagerank_tools(mcp):
    """The maintained-analytics verbs reach MCP: communities (louvain
    default, refresh warm-start flag) and refresh_pagerank (edge-delta
    incremental solve)."""
    out = tool(mcp, "communities")
    assert "label" in out
    out = tool(mcp, "communities", {"algorithm": "lpa"})
    assert "label" in out
    pr = tool(mcp, "refresh_pagerank")
    assert "rank" in pr
    # second refresh folds an empty delta, same surface
    pr2 = tool(mcp, "refresh_pagerank")
    assert "rank" in pr2
