import json
import os
import shutil

import pytest


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def _close(a, b, atol=1e-5):
    assert a.keys() == b.keys(), (set(a) ^ set(b))
    return all(abs(a[k] - b[k]) <= atol for k in a)


def test_streaming_pagerank_matches_from_scratch(spark, tmp_path):
    """foreachBatch PageRank maintenance over a file edge stream: after each
    micro-batch the persisted ranks equal a from-scratch pagerank over the
    union of all edges so far (both solved to the same tol), and a
    redelivered batch is a no-op on the solved graph."""
    from cognee_graphdb_spark.operators.graph_metrics import pagerank
    from cognee_graphdb_spark.streaming.pagerank import pagerank_batch

    src = tmp_path / "edges"
    src.mkdir()
    state = str(tmp_path / "pr")
    solver = dict(n_iter=200, tol=1e-7, checkpoint_every=5)

    def sink(batch, batch_id):
        pagerank_batch(batch, state, **solver)

    def run():
        q = (
            spark.readStream.schema("src string, dst string").json(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    b1 = [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y")]
    with open(src / "b1.json", "w") as f:
        for s, d in b1:
            f.write(json.dumps({"src": s, "dst": d}) + "\n")
    run()
    got1 = _ranks(spark.read.parquet(os.path.join(state, "ranks")))
    nodes1 = spark.createDataFrame([(i,) for i in "abcxy"], ["id"])
    e1 = spark.createDataFrame(b1, ["src", "dst"])
    exp1 = _ranks(pagerank(nodes1, e1, **solver))
    assert _close(got1, exp1), (got1, exp1)

    # batch 2 adds a bridge and a new node
    b2 = [("y", "a"), ("c", "z")]
    with open(src / "b2.json", "w") as f:
        for s, d in b2:
            f.write(json.dumps({"src": s, "dst": d}) + "\n")
    run()
    got2 = _ranks(spark.read.parquet(os.path.join(state, "ranks")))
    nodes2 = spark.createDataFrame([(i,) for i in "abcxyz"], ["id"])
    e2 = spark.createDataFrame(b1 + b2, ["src", "dst"])
    exp2 = _ranks(pagerank(nodes2, e2, **solver))
    assert _close(got2, exp2), (got2, exp2)
    assert os.path.isdir(os.path.join(state, "ranks") + ".old")

    # redelivery: re-applying batch 2 directly changes nothing material
    replay = spark.createDataFrame(b2, ["src", "dst"])
    after = _ranks(pagerank_batch(replay, state, **solver))
    assert _close(after, got2, atol=1e-6)


def test_streaming_pagerank_crash_recovery_from_retired(spark, tmp_path):
    """Crash between the two swap renames leaves only <path>.old for BOTH
    state tables: the next batch resumes from the retired copies instead of
    silently cold-starting an empty ledger."""
    from cognee_graphdb_spark.operators.graph_metrics import pagerank
    from cognee_graphdb_spark.streaming.pagerank import pagerank_batch

    state = str(tmp_path / "pr")
    solver = dict(n_iter=200, tol=1e-7, checkpoint_every=5)
    b1 = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    pagerank_batch(b1, state, **solver)
    for sub in ("edges", "ranks"):
        p = os.path.join(state, sub)
        shutil.rmtree(p + ".old", ignore_errors=True)
        os.rename(p, p + ".old")
    b2 = spark.createDataFrame([("c", "a")], ["src", "dst"])
    got = _ranks(pagerank_batch(b2, state, **solver))
    nodes = spark.createDataFrame([(i,) for i in "abc"], ["id"])
    e = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    exp = _ranks(pagerank(nodes, e, **solver))
    assert _close(got, exp), (got, exp)


def test_warm_start_converges_faster_and_to_same_fixpoint(spark):
    """The warm-start seam itself: starting from the previous graph's solved
    ranks reaches tol in fewer rounds than the uniform cold start, and lands
    on the same fixpoint."""
    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    base = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a"), ("b", "e")]
    nodes = spark.createDataFrame([(i,) for i in "abcde"], ["id"])
    e1 = spark.createDataFrame(base, ["src", "dst"])
    r1 = pagerank(nodes, e1, n_iter=200, tol=1e-6, checkpoint_every=1)

    e2 = spark.createDataFrame(base + [("c", "e")], ["src", "dst"])
    cold, it_cold = pagerank(
        nodes, e2, n_iter=200, tol=1e-6, checkpoint_every=1, return_iterations=True
    )
    warm, it_warm = pagerank(
        nodes,
        e2,
        n_iter=200,
        tol=1e-6,
        checkpoint_every=1,
        return_iterations=True,
        warm_start=r1,
    )
    assert it_warm < it_cold, (it_warm, it_cold)
    assert _close(_ranks(warm), _ranks(cold), atol=1e-5)


def test_warm_start_validation(spark):
    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    nodes = spark.createDataFrame([("a",), ("b",)], ["id"])
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    bad = spark.createDataFrame([("a", 0.0), ("b", 0.0)], ["id", "rank"])
    with pytest.raises(ValueError, match="positive sum"):
        pagerank(nodes, e, warm_start=bad)
