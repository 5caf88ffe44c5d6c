"""Model Context Protocol (MCP) server over :class:`CogneeSpark`.

The reference ships an MCP server (cognee reference cognee-mcp/src/server.py)
whose tools let coding agents drive the memory engine: cognify, codify,
search, save_interaction, get_developer_rules, list_data, delete, prune,
cognify_status.  This module serves the same tool set over MCP's stdio
transport — newline-delimited JSON-RPC 2.0 — with only the standard library,
so an agent can point its MCP client at the Spark driver process.

Intentionally NOT mirrored: `cognee_add_developer_rules` (ingests a fixed
list of dotfiles from a developer machine — environment plumbing, not query
semantics; `save_interaction` + `memify` cover the rule-derivation path) and
the SSE/HTTP transports (the stdlib HTTP facade in :mod:`server` covers
network serving; MCP clients default to stdio).

Sync-vs-async: the reference backgrounds cognify/codify and exposes
`cognify_status` polling.  Spark jobs already report progress through the
Spark UI, so tools here run synchronously and return the final counts —
`cognify_status` still answers with the pipeline-run ledger for parity.
"""

from __future__ import annotations

import hashlib
import json
import sys

from pyspark.sql import DataFrame

_PROTOCOL = "2024-11-05"


def _text_result(text: str, is_error: bool = False) -> dict:
    return {"content": [{"type": "text", "text": text}], "isError": is_error}


def _df_text(df: DataFrame, limit: int = 200) -> str:
    rows = [r.asDict(recursive=True) for r in df.limit(limit).collect()]
    return json.dumps(rows, default=str)


_TOOLS: list[dict] = [
    {
        "name": "cognify",
        "description": "Add text to the memory engine and build its "
        "knowledge graph (reference cognee-mcp cognify: add + cognify).",
        "inputSchema": {
            "type": "object",
            "properties": {"data": {"type": "string"}},
            "required": ["data"],
        },
    },
    {
        "name": "codify",
        "description": "Build a code graph from a repository path "
        "(reference cognee-mcp codify).",
        "inputSchema": {
            "type": "object",
            "properties": {"repo_path": {"type": "string"}},
            "required": ["repo_path"],
        },
    },
    {
        "name": "search",
        "description": "Search the memory engine; search_type is one of the "
        "16 engine search types (GRAPH_COMPLETION, CHUNKS, CODE, ...).",
        "inputSchema": {
            "type": "object",
            "properties": {
                "search_query": {"type": "string"},
                "search_type": {"type": "string"},
            },
            "required": ["search_query", "search_type"],
        },
    },
    {
        "name": "save_interaction",
        "description": "Store a user-agent interaction and derive coding "
        "rules from it (reference cognee-mcp save_interaction; memify).",
        "inputSchema": {
            "type": "object",
            "properties": {"data": {"type": "string"}},
            "required": ["data"],
        },
    },
    {
        "name": "get_developer_rules",
        "description": "List the coding rules derived so far "
        "(reference cognee-mcp get_developer_rules).",
        "inputSchema": {"type": "object", "properties": {}},
    },
    {
        "name": "list_data",
        "description": "List ingested documents, optionally for one dataset.",
        "inputSchema": {
            "type": "object",
            "properties": {"dataset_id": {"type": "string"}},
        },
    },
    {
        "name": "delete",
        "description": "Delete a document by id or name (soft/hard cascade).",
        "inputSchema": {
            "type": "object",
            "properties": {
                "data_id": {"type": "string"},
                "mode": {"type": "string"},
            },
            "required": ["data_id"],
        },
    },
    {
        "name": "prune",
        "description": "Reset the memory store (reference cognee-mcp prune).",
        "inputSchema": {"type": "object", "properties": {}},
    },
    {
        "name": "cognify_status",
        "description": "Pipeline-run ledger for the current dataset "
        "(reference cognee-mcp cognify_status).",
        "inputSchema": {"type": "object", "properties": {}},
    },
    {
        "name": "centrality",
        "description": "Centrality scores over the memory graph: pagerank, "
        "hits (hub/authority), harmonic (sampled closeness) or betweenness "
        "(the GDS centrality family the reference reaches through its "
        "metric surface).",
        "inputSchema": {
            "type": "object",
            "properties": {"algorithm": {"type": "string"}},
        },
    },
    {
        "name": "strongly_connected",
        "description": "Strongly connected components of the directed "
        "memory graph (gds.scc).",
        "inputSchema": {"type": "object", "properties": {}},
    },
    {
        "name": "spanning_forest",
        "description": "Minimum spanning forest of the memory graph "
        "(gds.spanningTree for every component at once, distributed "
        "Borůvka); without a weight column the result is the graph's "
        "deterministic skeleton.",
        "inputSchema": {
            "type": "object",
            "properties": {"weight": {"type": "string"}},
        },
    },
    {
        "name": "cluster_embeddings",
        "description": "Clustering over a stored vector collection: "
        "algorithm 'dbscan' (default — core/border/noise topic islands; "
        "lsh_bits>0 is the bucketed scale path, the exact default is "
        "scale-guarded above a row budget) or 'kmeans' (gds.kmeans — "
        "exactly k spherical topics with centroid similarity).",
        "inputSchema": {
            "type": "object",
            "properties": {
                "collection": {"type": "string"},
                "threshold": {"type": "number"},
                "min_pts": {"type": "integer"},
                "lsh_bits": {"type": "integer"},
                "algorithm": {"type": "string"},
                "k": {"type": "integer"},
                "n_iter": {"type": "integer"},
            },
        },
    },
    {
        "name": "communities",
        "description": "Community detection over the memory graph "
        "(gds.louvain default; 'leiden' or 'lpa'); refresh=true "
        "warm-starts louvain from the previous labels on the edge delta.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "algorithm": {"type": "string"},
                "refresh": {"type": "boolean"},
            },
        },
    },
    {
        "name": "refresh_pagerank",
        "description": "Always-current PageRank maintained incrementally "
        "from the store's evolution pointer: only the edge delta since "
        "the last refresh enters the warm-started solve.",
        "inputSchema": {"type": "object", "properties": {}},
    },
    {
        "name": "embed_graph",
        "description": "Compute structural node embeddings of the memory "
        "graph into the Entity_graph vector collection: method 'sppmi' "
        "(default — walks -> skip-grams -> SPPMI-SVD) or 'fastrp' "
        "(gds.fastRP — straight off the edge list, the cheaper path at "
        "scale).  refresh=true maintains fastrp embeddings incrementally "
        "(only the changed K-hop ball recomputes).  Query them with "
        "similar_nodes.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "dim": {"type": "integer"},
                "method": {"type": "string"},
                "seed": {"type": "integer"},
                "refresh": {"type": "boolean"},
            },
        },
    },
    {
        "name": "similar_nodes",
        "description": "Structurally similar nodes from the Entity_graph "
        "embedding collection (run embed_graph first).",
        "inputSchema": {
            "type": "object",
            "properties": {
                "node_id": {"type": "string"},
                "k": {"type": "integer"},
            },
            "required": ["node_id"],
        },
    },
    {
        "name": "topological_sort",
        "description": "Dependency layering of the directed memory graph "
        "(gds.dag.topologicalSort / longestPath: layer = longest source "
        "path); a cyclic graph answers with the stuck-node count error.",
        "inputSchema": {"type": "object", "properties": {}},
    },
]


class McpServer:
    """One engine, one protocol session.  ``handle`` maps a single JSON-RPC
    message to its response dict (or None for notifications); ``serve_stdio``
    is the newline-delimited transport loop."""

    def __init__(self, engine):
        self.engine = engine

    # ------------------------------------------------------------- protocol
    def handle(self, msg: dict) -> dict | None:
        method = msg.get("method", "")
        msg_id = msg.get("id")
        if msg_id is None:  # notification (e.g. notifications/initialized)
            return None
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": _PROTOCOL,
                    "capabilities": {"tools": {}},
                    "serverInfo": {"name": "cognee-spark-mcp", "version": "1.0"},
                }
            elif method == "ping":
                result = {}
            elif method == "tools/list":
                result = {"tools": _TOOLS}
            elif method == "tools/call":
                params = msg.get("params") or {}
                result = self._call_tool(
                    params.get("name", ""), params.get("arguments") or {}
                )
            else:
                return {
                    "jsonrpc": "2.0",
                    "id": msg_id,
                    "error": {"code": -32601, "message": f"unknown method {method}"},
                }
            return {"jsonrpc": "2.0", "id": msg_id, "result": result}
        except Exception as e:  # tool-level failures -> MCP isError result
            return {
                "jsonrpc": "2.0",
                "id": msg_id,
                "result": _text_result(f"{type(e).__name__}: {e}", is_error=True),
            }

    # ---------------------------------------------------------------- tools
    def _call_tool(self, name: str, args: dict) -> dict:
        eng = self.engine
        if name == "cognify":
            data = args["data"]
            # content digest, NOT hash(): Python's hash is process-salted,
            # and the name is the user-visible delete/update handle — it
            # must be stable across sessions
            digest = hashlib.md5(data.encode()).hexdigest()[:12]
            eng.add([(f"mcp_input_{digest}.txt", data)])
            n = eng.cognify()
            return _text_result(f"cognified {n} document(s)")
        if name == "codify":
            n = eng.codify(args["repo_path"])
            return _text_result(f"codified {n} file(s)")
        if name == "search":
            out = eng.search(args["search_type"], args["search_query"])
            if isinstance(out, DataFrame):
                return _text_result(_df_text(out))
            if isinstance(out, tuple):
                chosen, res = out
                body = _df_text(res) if isinstance(res, DataFrame) else str(res)
                return _text_result(json.dumps({"search_type": chosen, "result": body}))
            return _text_result(out if isinstance(out, str) else json.dumps(out, default=str))
        if name == "save_interaction":
            data = args["data"]
            digest = hashlib.md5(data.encode()).hexdigest()[:12]
            eng.add(
                [(f"interaction_{digest}.txt", data)],
                node_set="coding_agent_rules",
            )
            eng.cognify()
            n = eng.memify()
            return _text_result(f"saved interaction; {n} rule(s) derived")
        if name == "get_developer_rules":
            return _text_result(_df_text(eng.search("CODING_RULES", "")))
        if name == "list_data":
            df = eng.list_data(args.get("dataset_id"))
            return _text_result("[]" if df is None else _df_text(df))
        if name == "delete":
            n = eng.delete(args["data_id"], mode=args.get("mode", "soft"))
            return _text_result(f"deleted {n} node(s)")
        if name == "prune":
            eng.prune()
            return _text_result("pruned")
        if name == "cognify_status":
            status = eng.dataset_status()
            return _text_result(json.dumps(status, default=str))
        if name == "centrality":
            return _text_result(
                _df_text(eng.centrality(args.get("algorithm", "pagerank")))
            )
        if name == "strongly_connected":
            return _text_result(_df_text(eng.strongly_connected()))
        if name == "spanning_forest":
            return _text_result(_df_text(eng.spanning_forest(args.get("weight"))))
        if name == "cluster_embeddings":
            return _text_result(
                _df_text(
                    eng.cluster_embeddings(
                        args.get("collection", "DocumentChunk_text"),
                        threshold=float(args.get("threshold", 0.8)),
                        min_pts=int(args.get("min_pts", 4)),
                        lsh_bits=int(args.get("lsh_bits", 0)),
                        algorithm=args.get("algorithm", "dbscan"),
                        k=int(args.get("k", 8)),
                        n_iter=int(args.get("n_iter", 5)),
                    )
                )
            )
        if name == "topological_sort":
            return _text_result(_df_text(eng.topological_layers()))
        if name == "communities":
            return _text_result(
                _df_text(
                    eng.communities(
                        algorithm=args.get("algorithm", "louvain"),
                        refresh=bool(args.get("refresh", False)),
                    )
                )
            )
        if name == "refresh_pagerank":
            return _text_result(_df_text(eng.refresh_pagerank()))
        if name == "embed_graph":
            if args.get("refresh"):
                if args.get("method", "fastrp") != "fastrp":
                    raise ValueError(
                        "refresh maintains fastrp embeddings; "
                        f"method {args['method']!r} is not refreshable"
                    )
                n = eng.refresh_embeddings(
                    dim=int(args.get("dim", 16)), seed=int(args.get("seed", 3))
                )
                return _text_result(f"refreshed {n} nodes in Entity_graph")
            n = eng.embed_graph(
                dim=int(args.get("dim", 16)),
                method=args.get("method", "sppmi"),
                seed=int(args.get("seed", 3)),
            )
            return _text_result(f"embedded {n} nodes into Entity_graph")
        if name == "similar_nodes":
            return _text_result(
                _df_text(
                    eng.similar_nodes(args["node_id"], k=int(args.get("k", 5)))
                )
            )
        raise ValueError(f"unknown tool {name!r}")

    # ------------------------------------------------------------ transport
    def serve_stdio(self, stdin=None, stdout=None) -> None:
        """Newline-delimited JSON-RPC loop (the MCP stdio transport); returns
        at EOF.  Malformed lines answer with a -32700 parse error instead of
        killing the session."""
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError as e:
                resp = {
                    "jsonrpc": "2.0",
                    "id": None,
                    "error": {"code": -32700, "message": f"parse error: {e}"},
                }
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()
                continue
            resp = self.handle(msg)
            if resp is not None:
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()
