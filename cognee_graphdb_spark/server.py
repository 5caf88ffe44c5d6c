"""Dependency-free HTTP serving surface over :class:`CogneeSpark`.

The reference serves its engine through a FastAPI app whose routes are
mounted under ``/api/v1/*`` (cognee reference api/client.py:225-291: add,
cognify, memify, search, datasets, delete, update, prune, visualize, ...).
This module provides the same user-visible route shapes with ONLY the
standard library (`http.server`), so the Spark driver can expose the engine
without adding a web framework to the image:

    POST /api/v1/add        {"data": [{"name": ..., "text": ...}],
                             "node_set"?}               -> {"added": n}
    POST /api/v1/cognify    {"temporal"?}               -> {"documents_processed": n}
    POST /api/v1/search     {"search_type", "query", "top_k"?,
                             "only_context"?}           -> rows | completion | dict
    GET  /api/v1/search                                 -> query history rows
    POST /api/v1/memify     {}                          -> {"rules_added": n}
    GET  /api/v1/datasets                               -> dataset rows
    POST /api/v1/delete     {"name"}                    -> {"deleted": n}
    POST /api/v1/update     {"name", "text"}            -> {"updated": n}
    POST /api/v1/prune      {}                          -> {"status": "pruned"}
    GET  /api/v1/visualize                              -> text/html
    POST /api/v1/centrality {"algorithm"?, ...params}   -> rows (pagerank |
                             hits | harmonic | betweenness; CogneeSpark
                             .centrality — gds.hits reachable as a product)
    GET  /api/v1/scc                                    -> rows (id, label)
    POST /api/v1/communities {"algorithm"?, "refresh"?} -> rows (id, label)
    POST /api/v1/refresh_pagerank {}                    -> rows (id, rank;
                             incremental — only the edge delta enters)
    POST /api/v1/embed_graph {"dim"?, "method"? (sppmi|fastrp),
                             "refresh"? (incremental ball recompute),
                             walk knobs}
                                                        -> {"embedded": n}
    POST /api/v1/similar_nodes {"node_id", "k"?}        -> rows (structural
                             neighbors from the Entity_graph collection)
    GET  /health                                        -> {"status": "ok"}

Payload keys are accepted in snake_case or camelCase (the reference's DTO
layer does the same aliasing).  Auth / permissions / notebooks routes are
NOT mirrored — they configure the reference's multi-user SaaS shell, not
query semantics (SURVEY §2 scope note).

Scale/threading: requests serialize through one lock.  A SparkSession
driver is a single orchestrator by design — concurrency belongs INSIDE a
query plan (executors), not across driver threads; the reference's asyncio
concurrency multiplexes I/O to external DBs, which Spark replaced.  For
multi-client serving, run N engine replicas behind an ordinary HTTP
balancer — the store is MVCC-snapshot parquet, so readers scale out.
"""

from __future__ import annotations

import json
import re
import threading
from datetime import date, datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame


def _jsonable(v):
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def _rows(df: DataFrame, limit: int = 1000) -> list[dict]:
    return [
        {k: _jsonable(v) for k, v in r.asDict(recursive=True).items()}
        for r in df.limit(limit).collect()
    ]


def _norm_keys(payload: dict) -> dict:
    """snake_case view of a payload that may arrive camelCased."""
    out = {}
    for k, v in payload.items():
        out[re.sub(r"(?<!^)(?=[A-Z])", "_", k).lower()] = v
    return out


class _Handler(BaseHTTPRequestHandler):
    engine = None
    lock: threading.Lock = None

    # ------------------------------------------------------------------ util
    def _send(self, code: int, body, content_type="application/json"):
        # strings are raw payloads only for non-JSON content types (HTML);
        # a JSON string result (e.g. a completion) must arrive quoted
        data = (
            body.encode()
            if isinstance(body, str) and "json" not in content_type
            else json.dumps(body).encode()
        )
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _payload(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if not n:
            return {}
        return _norm_keys(json.loads(self.rfile.read(n) or b"{}"))

    def log_message(self, *a):  # quiet test output; stdlib default is stderr spam
        pass

    def _route(self, method: str):
        path = self.path.split("?", 1)[0].rstrip("/")
        try:
            with self.lock:
                return self._dispatch(method, path)
        except ValueError as e:
            self._send(400, {"error": str(e)})
        except RuntimeError as e:
            self._send(409, {"error": str(e)})
        except Exception as e:  # pragma: no cover - defensive 500
            self._send(500, {"error": f"{type(e).__name__}: {e}"})

    # -------------------------------------------------------------- dispatch
    def _dispatch(self, method: str, path: str):
        eng = self.engine
        if method == "GET" and path in ("", "/health"):
            return self._send(200, {"status": "ok"})
        if method == "POST" and path == "/api/v1/add":
            p = self._payload()
            try:
                items = [(d["name"], d["text"]) for d in p.get("data", [])]
            except (TypeError, KeyError) as e:
                # malformed client input is a 400, not a 500
                raise ValueError(
                    "add needs data: [{name, text}, ...]"
                ) from e
            if not items:
                raise ValueError("add needs data: [{name, text}, ...]")
            eng.add(items, node_set=p.get("node_set"))
            return self._send(200, {"added": len(items)})
        if method == "POST" and path == "/api/v1/cognify":
            p = self._payload()
            n = eng.cognify(temporal=bool(p.get("temporal", False)))
            return self._send(200, {"documents_processed": n})
        if method == "POST" and path == "/api/v1/memify":
            return self._send(200, {"rules_added": eng.memify()})
        if method == "POST" and path == "/api/v1/search":
            p = self._payload()
            qt = p.get("search_type", "GRAPH_COMPLETION")
            kwargs = {}
            if p.get("top_k") is not None:
                kwargs["top_k"] = int(p["top_k"])
            if p.get("only_context"):
                kwargs["only_context"] = True
            out = eng.search(qt, p.get("query", ""), **kwargs)
            if isinstance(out, DataFrame):
                return self._send(200, _rows(out))
            if isinstance(out, tuple):  # FEELING_LUCKY: (chosen_type, result)
                chosen, res = out
                res = _rows(res) if isinstance(res, DataFrame) else _jsonable(res)
                return self._send(200, {"search_type": chosen, "result": res})
            return self._send(200, _jsonable(out))
        if method == "GET" and path == "/api/v1/search":
            log = eng.query_log()
            return self._send(200, [] if log is None else _rows(log))
        if method == "GET" and path == "/api/v1/datasets":
            return self._send(200, eng.list_datasets())
        if method == "POST" and path == "/api/v1/delete":
            p = self._payload()
            if not p.get("name"):
                raise ValueError("delete needs a document name or id")
            return self._send(
                200, {"deleted": eng.delete(p["name"], mode=p.get("mode", "soft"))}
            )
        if method == "POST" and path == "/api/v1/update":
            p = self._payload()
            if not p.get("name") or p.get("text") is None:
                raise ValueError("update needs name and text")
            return self._send(200, {"updated": eng.update(p["name"], p["text"])})
        if method == "POST" and path == "/api/v1/prune":
            eng.prune()
            return self._send(200, {"status": "pruned"})
        if method == "GET" and path == "/api/v1/visualize":
            return self._send(200, eng.visualize(None), content_type="text/html")
        if method == "POST" and path == "/api/v1/centrality":
            p = self._payload()
            algo = p.pop("algorithm", "pagerank")
            return self._send(200, _rows(eng.centrality(algo, **p)))
        if method == "GET" and path == "/api/v1/scc":
            return self._send(200, _rows(eng.strongly_connected()))
        if method == "POST" and path == "/api/v1/spanning_forest":
            p = self._payload()
            return self._send(200, _rows(eng.spanning_forest(p.get("weight"))))
        if method == "POST" and path == "/api/v1/cluster_embeddings":
            # the exact lsh_bits=0 default is scale-guarded in the verb
            # (GdsScaleGuard -> RuntimeError -> 409): serving can't launch
            # the all-pairs path on an oversized collection by accident
            p = self._payload()
            return self._send(
                200,
                _rows(
                    eng.cluster_embeddings(
                        p.get("collection", "DocumentChunk_text"),
                        threshold=float(p.get("threshold", 0.8)),
                        min_pts=int(p.get("min_pts", 4)),
                        lsh_bits=int(p.get("lsh_bits", 0)),
                        algorithm=p.get("algorithm", "dbscan"),
                        k=int(p.get("k", 8)),
                        n_iter=int(p.get("n_iter", 5)),
                    )
                ),
            )
        if method == "GET" and path == "/api/v1/topology":
            # cycles raise ValueError -> 400 with the stuck-node count (the
            # fail-loudly answer for non-DAG memory graphs)
            return self._send(200, _rows(eng.topological_layers()))
        if method == "POST" and path == "/api/v1/communities":
            p = self._payload()
            return self._send(
                200,
                _rows(
                    eng.communities(
                        algorithm=p.get("algorithm", "louvain"),
                        n_levels=int(p.get("n_levels", 2)),
                        n_rounds=int(p.get("n_rounds", 3)),
                        refresh=bool(p.get("refresh", False)),
                    )
                ),
            )
        if method == "POST" and path == "/api/v1/refresh_pagerank":
            # incremental maintenance: only the edge delta enters the solve
            return self._send(200, _rows(eng.refresh_pagerank()))
        if method == "POST" and path == "/api/v1/embed_graph":
            p = self._payload()
            if p.get("refresh"):
                # incremental maintenance: only the changed K-hop ball
                # recomputes (CogneeSpark.refresh_embeddings — fastrp only;
                # a silently dropped method would mix producers)
                if p.get("method", "fastrp") != "fastrp":
                    raise ValueError(
                        "refresh maintains fastrp embeddings; "
                        f"method {p['method']!r} is not refreshable"
                    )
                n = eng.refresh_embeddings(
                    dim=int(p.get("dim", 16)), seed=int(p.get("seed", 3))
                )
                return self._send(200, {"embedded": n, "refreshed": True})
            n = eng.embed_graph(
                dim=int(p.get("dim", 16)),
                walk_length=int(p.get("walk_length", 4)),
                num_walks=int(p.get("num_walks", 4)),
                window=int(p.get("window", 2)),
                seed=int(p.get("seed", 3)),
                n_iter=int(p.get("n_iter", 8)),
                method=p.get("method", "sppmi"),
            )
            return self._send(200, {"embedded": n})
        if method == "POST" and path == "/api/v1/similar_nodes":
            p = self._payload()
            if not p.get("node_id"):
                raise ValueError("similar_nodes needs node_id")
            return self._send(
                200,
                _rows(eng.similar_nodes(p["node_id"], k=int(p.get("k", 5)))),
            )
        return self._send(404, {"error": f"no route {method} {path}"})

    def do_GET(self):
        self._route("GET")

    def do_POST(self):
        self._route("POST")


def serve(engine, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Start the HTTP facade on a background thread and return the server
    (``server.server_address`` carries the bound port; ``shutdown()`` stops
    it).  One engine, one lock — see the module docstring for the scale
    story."""
    handler = type(
        "BoundHandler", (_Handler,), {"engine": engine, "lock": threading.Lock()}
    )
    srv = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
