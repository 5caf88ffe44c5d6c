"""CLI lifecycle (reference cli_tests): add → cognify → search → delete →
prune driven through cli.main with an injected SparkSession."""

import json

from cognee_graphdb_spark.cli import main


def test_cli_full_lifecycle(spark, tmp_path, capsys):
    store = str(tmp_path / "store")
    doc = tmp_path / "notes.txt"
    doc.write_text("Alice works at Acme. Acme builds rockets in Berlin.")

    assert main(["--store", store, "add", str(doc)], spark=spark) == 0
    assert main(["--store", store, "add", "--text", "Bob knows Alice.", "--name", "bob.txt"], spark=spark) == 0
    assert main(["--store", store, "cognify"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "cognified 2 document(s)" in out

    assert main(["--store", store, "search", "who works at Acme?", "--type", "CHUNKS"], spark=spark) == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert rows and any("Alice" in (r.get("text") or "") for r in rows)

    assert main(["--store", store, "search", "who works at Acme?"], spark=spark) == 0
    assert capsys.readouterr().out.strip()  # completion text

    assert main(["--store", store, "delete", "bob.txt"], spark=spark) == 0
    assert main(["--store", store, "prune"], spark=spark) == 0


def test_cli_errors_and_config(spark, tmp_path, capsys):
    store = str(tmp_path / "empty_store")
    # search on an empty store -> exit 1 with the reference's message
    assert main(["--store", store, "search", "q"], spark=spark) == 1
    assert "No data found" in capsys.readouterr().err
    # unknown search type -> exit 1 naming it (CliCommandException shape)
    main(["--store", store, "add", "--text", "hello world", "--name", "h.txt"], spark=spark)
    main(["--store", store, "cognify"], spark=spark)
    capsys.readouterr()
    assert main(["--store", store, "search", "q", "--type", "NOPE"], spark=spark) == 1
    assert "NOPE" in capsys.readouterr().err
    # add with nothing -> exit 1
    assert main(["--store", store, "add"], spark=spark) == 1
    capsys.readouterr()
    # config lists all 16 search types without needing a session
    assert main(["config", "--json"], spark=spark) == 0
    cfg = json.loads(capsys.readouterr().out)
    assert len(cfg["search_types"]) == 16


def test_cli_maintain(spark, tmp_path, capsys):
    store = str(tmp_path / "m_store")
    assert main(["--store", store, "add", "--text", "alpha beta gamma delta.", "--name", "a.txt"], spark=spark) == 0
    assert main(["--store", store, "cognify"], spark=spark) == 0
    capsys.readouterr()
    assert main(["--store", store, "maintain"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "nodes: files" in out and "versions" in out
    # post-maintenance store still answers queries
    assert main(["--store", store, "search", "alpha", "--type", "CHUNKS"], spark=spark) == 0


def test_cli_mcp_verb_speaks_jsonrpc(spark, tmp_path, capsys, monkeypatch):
    """`mcp` wires stdin/stdout to the MCP stdio loop."""
    import io
    import json as _json

    from cognee_graphdb_spark.cli import main

    monkeypatch.setattr(
        "sys.stdin",
        io.StringIO(_json.dumps({"jsonrpc": "2.0", "id": 1, "method": "ping"}) + "\n"),
    )
    assert main(["--store", str(tmp_path / "m"), "mcp"], spark=spark) == 0
    out = capsys.readouterr().out
    assert _json.loads(out.splitlines()[-1])["result"] == {}


def test_cli_serve_verb_listens(spark, tmp_path, capsys):
    """`serve` binds the HTTP facade; drive /health over a real socket.
    Run main() on a thread (it parks forever), then shut the server down."""
    import re
    import threading
    import urllib.request

    from cognee_graphdb_spark.cli import main

    t = threading.Thread(
        target=main,
        args=(["--store", str(tmp_path / "s"), "serve", "--port", "0"],),
        kwargs={"spark": spark},
        daemon=True,
    )
    t.start()
    for _ in range(100):
        out = capsys.readouterr().out
        m = re.search(r"http://([\d.]+):(\d+)", out)
        if m:
            break
        import time

        time.sleep(0.1)
    assert m, "serve never printed its address"
    with urllib.request.urlopen(f"http://{m.group(1)}:{m.group(2)}/health") as r:
        assert r.status == 200
