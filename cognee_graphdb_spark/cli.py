"""Command-line interface (reference: cognee/cli/_cognee.py + cli/commands/
{add,cognify,search,delete,config}_command.py — same verb set, argparse-based,
no extra dependencies).

``python -m cognee_graphdb_spark --store /path <verb> ...`` drives the same
:class:`CogneeSpark` lifecycle the library exposes; results print as text
(completions) or JSON lines (rows), exit code 0/1 like the reference's
CliCommandException handling.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

CLI_DESCRIPTION = "spark-graphrag: add -> cognify -> search over a persistent graph store"


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="cognee_graphdb_spark", description=CLI_DESCRIPTION)
    p.add_argument("--store", default=os.environ.get("SPARK_GRAFT_STORE", ".cognee_spark_store"),
                   help="graph store root (local path or s3a:// URI)")
    p.add_argument("--dataset", default="main_dataset")
    sub = p.add_subparsers(dest="command", required=True)

    p_add = sub.add_parser("add", help="ingest text or files into the dataset")
    p_add.add_argument("items", nargs="*", help="file paths to ingest")
    p_add.add_argument("--text", help="inline text to ingest")
    p_add.add_argument("--name", default="cli_text", help="document name for --text")
    p_add.add_argument("--node-set", default=None)

    sub.add_parser("cognify", help="build the knowledge graph from pending data")

    p_search = sub.add_parser("search", help="query the graph")
    p_search.add_argument("query")
    p_search.add_argument("--type", dest="search_type", default="GRAPH_COMPLETION",
                          help="one of the 16 SearchTypes")
    p_search.add_argument("--top-k", type=int, default=10)

    p_del = sub.add_parser("delete", help="delete a document (cascade)")
    p_del.add_argument("document")

    sub.add_parser("prune", help="drop all stored data")

    p_m = sub.add_parser("maintain", help="compact snapshot files + vacuum old versions")
    p_m.add_argument("--target-file-mb", type=int, default=128,
                     help="target data-file size for compaction (MiB)")

    p_srv = sub.add_parser("serve", help="run the HTTP facade (/api/v1/* routes)")
    p_srv.add_argument("--host", default="127.0.0.1")
    p_srv.add_argument("--port", type=int, default=8000)

    sub.add_parser("mcp", help="run the MCP stdio server (JSON-RPC tools)")

    p_cfg = sub.add_parser("config", help="show effective configuration")
    p_cfg.add_argument("--json", action="store_true")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = _build_parser().parse_args(argv)

    if args.command == "config":
        cfg = {
            "store": args.store,
            "dataset": args.dataset,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "search_types": None,  # filled below without a SparkSession
        }
        from cognee_graphdb_spark.api import SEARCH_TYPES

        cfg["search_types"] = list(SEARCH_TYPES)
        print(json.dumps(cfg) if args.json else "\n".join(f"{k}={v}" for k, v in cfg.items()))
        return 0

    from cognee_graphdb_spark.api import CogneeSpark
    from cognee_graphdb_spark.session import get_spark

    spark = spark or get_spark("cognee-cli")
    engine = CogneeSpark(spark, args.store, dataset_id=args.dataset)
    try:
        if args.command == "add":
            items: list[tuple[str, str]] = []
            if args.text is not None:
                items.append((args.name, args.text))
            for path in args.items:
                with open(path, "r", encoding="utf-8", errors="replace") as f:
                    items.append((os.path.basename(path), f.read()))
            if not items:
                print("nothing to add (pass files or --text)", file=sys.stderr)
                return 1
            engine.add(items, node_set=args.node_set)
            print(f"added {len(items)} item(s)")
        elif args.command == "cognify":
            n = engine.cognify()
            print(f"cognified {n} document(s)")
        elif args.command == "search":
            out = engine.search(args.search_type, args.query, top_k=args.top_k)
            if isinstance(out, str):
                print(out)
            else:
                for row in out.collect():
                    print(json.dumps(row.asDict(), default=str))
        elif args.command == "delete":
            engine.delete(args.document)
            print(f"deleted {args.document}")
        elif args.command == "prune":
            engine.prune()
            print("pruned")
        elif args.command == "serve":
            from cognee_graphdb_spark.server import serve

            import threading

            srv = serve(engine, host=args.host, port=args.port)
            host, port = srv.server_address
            print(f"serving /api/v1/* on http://{host}:{port}", flush=True)
            try:
                # serve() accepts on its own thread; park the main thread
                threading.Event().wait()
            except KeyboardInterrupt:
                srv.shutdown()
        elif args.command == "mcp":
            from cognee_graphdb_spark.mcp_server import McpServer

            McpServer(engine).serve_stdio()
        elif args.command == "maintain":
            rep = engine.maintain(target_file_bytes=args.target_file_mb * 1024 * 1024)
            for table, st in sorted(rep["after"].items()):
                before = rep["before"].get(table, {})
                print(
                    f"{table}: files {before.get('files', 0)} -> {st['files']}, "
                    f"versions {before.get('versions', 0)} -> {st['versions']}, "
                    f"{st['bytes']} bytes"
                )
    except (ValueError, RuntimeError) as exc:
        # the reference CLI maps domain errors to exit code 1 with a message
        print(f"error: {exc}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
