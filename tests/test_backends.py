"""TableBackend seam: the GraphStore runs unchanged over any backend —
proven with an in-memory fake; the DeltaLakeBackend import gate and the
default-merge contract are pinned."""

from __future__ import annotations

import pytest

from cognee_graphdb_spark.sources.backends import (
    DeltaLakeBackend,
    ParquetSnapshotBackend,
    TableBackend,
)
from cognee_graphdb_spark.sources.sinks import GraphStore


class InMemoryBackend(TableBackend):
    """Minimal conforming backend: a dict of materialized DataFrames.
    Provides only the abstract storage methods — merge() comes from the
    TableBackend default, which is exactly what proves the seam."""

    def __init__(self):
        self.tables = {}
        self.merge_calls = []

    def load(self, table):
        return self.tables.get(table)

    def write_snapshot(self, table, df):
        self.tables[table] = df.localCheckpoint(eager=True)

    def merge(self, table, incoming, key):
        self.merge_calls.append((table, tuple(key)))
        super().merge(table, incoming, key)

    def vacuum(self, tables):
        pass

    def stats(self, table):
        df = self.tables.get(table)
        return {"files": 1 if df is not None else 0, "bytes": 0, "versions": 1}

    def compact(self, table, target_file_bytes):
        return None if table not in self.tables else 1


def test_graphstore_runs_on_a_custom_backend(spark, tmp_path):
    """upsert (insert + update), delete cascade inputs, and stats all flow
    through the backend interface; only the ledger touches the filesystem."""
    be = InMemoryBackend()
    store = GraphStore(spark, str(tmp_path / "store"), backend=be)

    nodes = spark.createDataFrame(
        [("n1", "alice", "Person"), ("n2", "bob", "Person")], ["id", "name", "type"]
    )
    store.upsert_nodes(nodes)
    assert {r["id"] for r in be.tables["nodes"].collect()} == {"n1", "n2"}
    assert be.merge_calls[0] == ("nodes", ("id",))

    # MERGE semantics through the default implementation: matched row
    # updates, unmatched existing row survives
    store.upsert_nodes(spark.createDataFrame([("n1", "alicia", "Person")], ["id", "name", "type"]))
    got = {r["id"]: r["name"] for r in store.load("nodes").collect()}
    assert got == {"n1": "alicia", "n2": "bob"}

    edges = spark.createDataFrame([("n1", "n2", "knows")], ["src", "dst", "relationship_name"])
    store.upsert_edges(edges)
    assert store.load("edges").count() == 1

    # delete goes through load + write_snapshot on the same backend
    store.delete_nodes(spark.createDataFrame([("n2",)], ["id"]))
    assert {r["id"] for r in store.load("nodes").collect()} == {"n1"}
    assert store.load("edges").count() == 0

    stats = store.table_stats()
    assert stats["nodes"]["files"] == 1 and "ledger" in stats
    # the audit ledger recorded every mutation regardless of backend
    ops = {r["op"] for r in store.ledger().collect()}
    assert {"upsert_nodes", "upsert_edges", "delete_nodes"} <= ops


def test_parquet_backend_matches_store_contract(spark, tmp_path):
    """The default backend standalone: merge == anti-join+union, snapshots
    version + flip, vacuum drops superseded versions."""
    be = ParquetSnapshotBackend(spark, str(tmp_path / "t"))
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], ["id", "v"])
    be.merge("nodes", df1, ["id"])
    be.merge("nodes", spark.createDataFrame([("b", 9), ("c", 3)], ["id", "v"]), ["id"])
    got = {r["id"]: r["v"] for r in be.load("nodes").collect()}
    assert got == {"a": 1, "b": 9, "c": 3}
    assert be.stats("nodes")["versions"] == 2
    be.vacuum(["nodes"])
    assert be.stats("nodes")["versions"] == 1
    assert {r["id"] for r in be.load("nodes").collect()} == {"a", "b", "c"}


def test_delta_backend_is_import_gated(spark, tmp_path):
    try:
        import delta  # noqa: F401

        pytest.skip("delta-spark installed; gate test not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="delta-spark"):
        DeltaLakeBackend(spark, str(tmp_path / "d"))


def test_delta_backend_executes_via_stub(spark, tmp_path, monkeypatch):
    """Every DeltaLakeBackend method body runs against the in-process
    delta-spark double (tests/delta_stub.py): the MERGE condition string is
    genuinely evaluated, empty-table normalization sees numFiles==0, and
    stats/compact/vacuum execute.  Reference semantics matched: kuzu
    adapter.py:382-449 upsert, LanceDBAdapter.py:147-202 merge_insert."""
    import delta_stub

    delta_stub.install(monkeypatch, spark)
    be = DeltaLakeBackend(spark, str(tmp_path / "d"))

    # absent table -> load None; merge falls back to first snapshot
    assert be.load("nodes") is None
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], ["id", "v"])
    be.merge("nodes", df1, ["id"])
    assert {r["id"]: r["v"] for r in be.load("nodes").collect()} == {"a": 1, "b": 2}

    # native MERGE: matched row updated, unmatched kept, new row inserted
    be.merge("nodes", spark.createDataFrame([("b", 9), ("c", 3)], ["id", "v"]), ["id"])
    assert {r["id"]: r["v"] for r in be.load("nodes").collect()} == {"a": 1, "b": 9, "c": 3}

    # composite key with nulls: <=> must null-safe-match (the edge table key)
    edges = spark.createDataFrame(
        [("s1", "d1", None, 1.0)], "src STRING, dst STRING, relationship_name STRING, w DOUBLE"
    )
    be.merge("edges", edges, ["src", "dst", "relationship_name"])
    be.merge(
        "edges",
        spark.createDataFrame(
            [("s1", "d1", None, 7.0)], "src STRING, dst STRING, relationship_name STRING, w DOUBLE"
        ),
        ["src", "dst", "relationship_name"],
    )
    rows = be.load("edges").collect()
    assert len(rows) == 1 and rows[0]["w"] == 7.0  # null key matched, not duplicated

    # stats + compact + vacuum bodies
    st = be.stats("nodes")
    assert st["files"] >= 1 and st["bytes"] > 0 and st["versions"] >= 1
    assert be.stats("absent") == {"files": 0, "bytes": 0, "versions": 0}
    assert be.compact("nodes", target_file_bytes=1 << 30) == 1
    assert be.compact("absent", target_file_bytes=1) is None
    be.vacuum(["nodes", "absent"])
    assert [c[1] for c in delta_stub.DeltaTable.vacuum_calls] == [0]

    # empty-table normalization: overwrite to empty -> load None
    be.write_snapshot("nodes", df1.limit(0))
    assert be.load("nodes") is None

    # dataset_id partitioning path in write_snapshot
    part = spark.createDataFrame([("x", "ds1"), ("y", "ds2")], ["id", "dataset_id"])
    be.write_snapshot("parted", part)
    assert {r["dataset_id"] for r in be.load("parted").collect()} == {"ds1", "ds2"}


def test_graphstore_runs_on_delta_backend_stub(spark, tmp_path, monkeypatch):
    """The GraphStore lifecycle (upsert insert+update) over DeltaLakeBackend,
    end to end through the stub."""
    import delta_stub

    delta_stub.install(monkeypatch, spark)
    be = DeltaLakeBackend(spark, str(tmp_path / "store"))
    store = GraphStore(spark, str(tmp_path / "store"), backend=be)
    nodes = spark.createDataFrame(
        [("n1", "alice", "Person"), ("n2", "bob", "Person")], ["id", "name", "type"]
    )
    store.upsert_nodes(nodes)
    store.upsert_nodes(
        spark.createDataFrame([("n2", "bobby", "Person"), ("n3", "eve", "Person")],
                              ["id", "name", "type"])
    )
    got = {r["id"]: r["name"] for r in store.load("nodes").collect()}
    assert got == {"n1": "alice", "n2": "bobby", "n3": "eve"}
