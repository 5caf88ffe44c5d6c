"""Cross-process write-lease semantics on the snapshot store.

Two engine processes writing the same table used to race on the ``_CURRENT``
pointer (both load v1, both flip — last PUT wins, one merge silently lost).
The store now serializes each table's read-merge-flip cycle behind a
``_LOCK`` lease file taken with create-no-overwrite (the reference serializes
writers through its embedded DB's file lock, kuzu/adapter.py:45,211-236).

The foreign writer here is a REAL second OS process: the store root is a
local path, so Hadoop's ``file://`` lease file is visible to plain Python
file ops in the subprocess — no second JVM needed to prove mutual exclusion.
"""

import os
import subprocess
import sys
import time

import pytest

from cognee_graphdb_spark.sources.sinks import GraphStore


@pytest.fixture()
def store(spark, tmp_path):
    return GraphStore(spark, str(tmp_path / "lk"))


def _nodes_df(spark, *ids):
    return spark.createDataFrame(
        [(i, i.upper(), "T", None) for i in ids],
        "id string, name string, type string, properties map<string,string>",
    )


def test_upsert_blocks_on_foreign_process_lease(store, spark):
    """A second OS process holding the lease delays this process's upsert
    until release — serialized pointer flips, nothing lost."""
    store.upsert_nodes(_nodes_df(spark, "a"))
    lock = os.path.join(store._path("nodes"), "_LOCK")
    hold = 2.0
    proc = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import sys, time, os\n"
            "lock, hold = sys.argv[1], float(sys.argv[2])\n"
            "f = open(lock, 'x')\n"  # create-no-overwrite, like the engine
            f"f.write(str(time.time()) + '|foreign'); f.close()\n"
            "time.sleep(hold)\n"
            "os.remove(lock)\n",
            lock,
            str(hold),
        ]
    )
    try:
        deadline = time.time() + 10
        while not os.path.exists(lock):
            assert time.time() < deadline, "subprocess never took the lease"
            time.sleep(0.02)
        t0 = time.time()
        store.upsert_nodes(_nodes_df(spark, "b"))
        waited = time.time() - t0
    finally:
        proc.wait(timeout=30)
    assert waited >= hold * 0.5, f"upsert did not wait for the foreign lease ({waited:.2f}s)"
    assert {r["id"] for r in store.load("nodes").collect()} == {"a", "b"}
    assert not os.path.exists(lock)  # released after the flip


def test_fresh_foreign_lease_times_out(store):
    lock = os.path.join(store._path("nodes"), "_LOCK")
    os.makedirs(store._path("nodes"), exist_ok=True)
    with open(lock, "x") as f:
        f.write(f"{time.time()}|foreign")
    try:
        with pytest.raises(TimeoutError, match="nodes"):
            with store._table_lock("nodes", timeout=0.6):
                pass
    finally:
        os.remove(lock)


def test_stale_lease_is_broken(store, spark):
    """A lease whose timestamp is older than the TTL belongs to a dead
    writer: the next writer breaks it and proceeds."""
    lock = os.path.join(store._path("nodes"), "_LOCK")
    os.makedirs(store._path("nodes"), exist_ok=True)
    with open(lock, "x") as f:
        f.write("1.0|dead-writer")  # epoch-old timestamp
    store.upsert_nodes(_nodes_df(spark, "a"))  # must not block or raise
    assert [r["id"] for r in store.load("nodes").collect()] == ["a"]
    assert not os.path.exists(lock)


def test_flip_pointer_local_roundtrip(store, spark):
    """flip_pointer replaces an existing pointer in place; repeated flips
    always leave a readable current version."""
    store.upsert_nodes(_nodes_df(spark, "a"))
    store.upsert_nodes(_nodes_df(spark, "b"))
    pointer = os.path.join(store._path("nodes"), "_CURRENT")
    assert os.path.exists(pointer)
    assert store.load("nodes").count() == 2
    # no tmp droppings left behind
    leftovers = [f for f in os.listdir(store._path("nodes")) if ".tmp-" in f]
    assert leftovers == []
