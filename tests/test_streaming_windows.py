"""Watermarked windowed aggregation + stateful sessionization."""

import json

from pyspark.sql import functions as F


def test_windowed_event_counts_static(spark):
    from cognee_graphdb_spark.streaming.windows import windowed_event_counts

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:01:00", 1, "click", 1.0),
            (2, "2024-01-01 00:02:00", 1, "click", 2.0),
            (3, "2024-01-01 00:07:00", 2, "view", 5.0),
        ],
        ["event_id", "ts_s", "user_id", "event_type", "value"],
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = {(r["event_type"], str(r["window_start"])): (r["n"], r["total"]) for r in windowed_event_counts(events).collect()}
    assert out[("click", "2024-01-01 00:00:00")] == (2, 3.0)
    assert out[("view", "2024-01-01 00:05:00")] == (1, 5.0)


def test_windowed_counts_streaming_with_watermark(spark, tmp_path):
    from cognee_graphdb_spark.streaming.windows import EVENT_STREAM_SCHEMA, windowed_event_counts

    src = tmp_path / "ev"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for i, (ts, et) in enumerate(
            [("2024-01-01T00:01:00", "click"), ("2024-01-01T00:02:00", "click"), ("2024-01-01T00:21:00", "view")]
        ):
            f.write(json.dumps({"event_id": i, "ts": ts, "user_id": 1, "event_type": et, "value": 1.0}) + "\n")
    stream = spark.readStream.schema(EVENT_STREAM_SCHEMA).json(str(src))
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has CLOSED: the 00:00-00:05
    # click window closes once max event time (00:21) passes end+watermark
    rows = {(r["event_type"], str(r["window_start"])): r["n"] for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert rows == {("click", "2024-01-01 00:00:00"): 2}


def test_sessionize_stateful_across_batches(spark, tmp_path):
    from pyspark.sql import types as T

    from cognee_graphdb_spark.streaming.windows import sessionize

    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("ts_epoch", T.LongType())]
    )
    src = tmp_path / "sess"
    src.mkdir()
    # batch 1: user 1 events at t=0,60; user 2 at t=0
    with open(src / "b1.json", "w") as f:
        for u, t in [(1, 0), (1, 60), (2, 0)]:
            f.write(json.dumps({"user_id": u, "ts_epoch": t}) + "\n")
    # batch 2 (arrives later): user 1 at t=10000 -> closes user 1's first session
    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"user_id": 1, "ts_epoch": 10000}) + "\n")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = [tuple(r) for r in spark.sql("SELECT * FROM sessions ORDER BY user_id, session_start").collect()]
    # user 1's first session (0..60, 2 events) closed by the t=10000 event;
    # the open sessions (user1 @10000, user2 @0) remain in state, not emitted
    assert rows == [(1, 0, 60, 2)]


def test_dedup_stream_drops_in_horizon_duplicates(spark, tmp_path):
    from pyspark.sql import types as T

    from cognee_graphdb_spark.streaming.dedup import dedup_stream

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src = tmp_path / "docs"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for doc_id, ts, text in [
            (1, "2024-01-01T00:00:00", "same content"),
            (2, "2024-01-01T00:01:00", "same content"),  # in-horizon dup of 1
            (3, "2024-01-01T00:02:00", "other content"),
        ]:
            f.write(json.dumps({"doc_id": doc_id, "ts": ts, "text": text}) + "\n")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        dedup_stream(stream, delay="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, content_hash FROM dedup_out").collect()
    kept = sorted(r["doc_id"] for r in rows)
    assert kept == [1, 3]  # first arrival per content hash survives
    assert len({r["content_hash"] for r in rows}) == 2


def test_quality_filters_compose_with_streams(spark, tmp_path):
    """gopher_quality_filter / c4_line_filter are stateless projections, so
    they run unchanged on a readStream — the streaming ingest path can filter
    documents in-flight with the same operators the batch path uses."""
    import json as _json

    from pyspark.sql import types as T

    from cognee_graphdb_spark.operators.training_data import gopher_quality_filter

    src = tmp_path / "docs"
    src.mkdir()
    good = "the quick brown fox jumps over the lazy dog and then some " * 10
    with open(src / "b1.json", "w") as f:
        f.write(_json.dumps({"doc_id": 1, "text": good}) + "\n")
        f.write(_json.dumps({"doc_id": 2, "text": "too short"}) + "\n")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        gopher_quality_filter(stream)
        .writeStream.format("memory")
        .queryName("stream_quality")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_q"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["doc_id"]: r["keep"] for r in spark.sql("SELECT * FROM stream_quality").collect()}
    assert rows == {"1": True, "2": False}

    from cognee_graphdb_spark.operators.training_data import c4_line_filter

    q2 = (
        c4_line_filter(stream)
        .writeStream.format("memory")
        .queryName("stream_c4")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_c4"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.sql("SELECT * FROM stream_c4").count() == 2


def test_near_dedup_stream_against_registry(spark, tmp_path):
    """foreachBatch near-dedup over a file stream: batch 2's near-dup of a
    batch-1 survivor is dropped via the REGISTRY (not operator state), and
    only survivors accumulate in the index."""
    from cognee_graphdb_spark.operators.dedup import minhash_index_build
    from cognee_graphdb_spark.streaming.dedup import near_dedup_batch

    base = "the quick brown fox jumps over the lazy dog again and again today"
    idx = str(tmp_path / "idx")
    seed = spark.createDataFrame([(1, base)], "doc_id long, text string")
    minhash_index_build(seed, idx, num_hashes=16, bands=8)

    src = tmp_path / "src"
    src.mkdir()
    out: list = []

    def sink(batch, batch_id):
        kept = near_dedup_batch(batch, idx, threshold=0.3)
        out.extend(r["doc_id"] for r in kept.collect())

    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({"doc_id": 10, "text": base + " extra"}) + "\n")       # near-dup of 1
        f.write(json.dumps({"doc_id": 11, "text": "totally different spark shuffle words here"}) + "\n")
        f.write(json.dumps({"doc_id": 12, "text": "totally different spark shuffle words here friend"}) + "\n")  # in-batch near-dup of 11

    stream = (
        spark.readStream.schema("doc_id long, text string").json(str(src))
    )
    q = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    assert sorted(out) == [11]  # 10 dropped vs registry, 12 dropped in-batch

    # a later batch near-duplicating survivor 11 is dropped via the registry
    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"doc_id": 20, "text": "totally different spark shuffle words here pal"}) + "\n")
        f.write(json.dumps({"doc_id": 21, "text": "yet another unrelated corpus document entirely"}) + "\n")
    out.clear()
    q = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert sorted(out) == [21]


def test_near_dedup_redelivery_is_noop(spark, tmp_path):
    """A replayed micro-batch (foreachBatch at-least-once) is a no-op: its
    survivors' ids are already registered, so the replay emits nothing and
    appends nothing (registry row counts unchanged)."""
    from cognee_graphdb_spark.operators.dedup import minhash_index_build
    from cognee_graphdb_spark.streaming.dedup import near_dedup_batch

    idx = str(tmp_path / "idx")
    minhash_index_build(
        spark.createDataFrame([(1, "seed document about nothing in particular")], "doc_id long, text string"),
        idx, num_hashes=16, bands=8,
    )
    batch = spark.createDataFrame(
        [(10, "totally different spark shuffle words here")], "doc_id long, text string"
    )
    first = near_dedup_batch(batch, idx, threshold=0.3)
    assert [r["doc_id"] for r in first.collect()] == [10]
    sig_rows = spark.read.parquet(f"{idx}/signatures").count()

    replay = near_dedup_batch(batch, idx, threshold=0.3)
    assert replay.isEmpty()
    assert spark.read.parquet(f"{idx}/signatures").count() == sig_rows


def test_streaming_components_maintenance(spark, tmp_path):
    """foreachBatch incremental components over a file edge stream: after two
    micro-batches the persisted assignment equals a from-scratch CC over all
    edges (label-for-label), a redelivered batch is a no-op, and the
    previous version survives at <path>.old."""
    import os

    from cognee_graphdb_spark.operators.graph_metrics import connected_components
    from cognee_graphdb_spark.streaming.components import components_batch

    src = tmp_path / "edges"
    src.mkdir()
    assign = str(tmp_path / "assign")

    def sink(batch, batch_id):
        components_batch(batch, assign)

    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({"src": "a", "dst": "b"}) + "\n")
        f.write(json.dumps({"src": "x", "dst": "y"}) + "\n")

    def run():
        q = (
            spark.readStream.schema("src string, dst string").json(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got1 = {r["id"]: r["component"] for r in spark.read.parquet(assign).collect()}
    assert len(set(got1.values())) == 2
    # batch 2 bridges the two components
    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"src": "b", "dst": "x"}) + "\n")
    run()
    got2 = {r["id"]: r["component"] for r in spark.read.parquet(assign).collect()}
    assert set(got2) == {"a", "b", "x", "y"} and len(set(got2.values())) == 1
    assert os.path.isdir(assign + ".old")
    # parity with from-scratch over all edges
    all_edges = spark.createDataFrame(
        [("a", "b", "r"), ("x", "y", "r"), ("b", "x", "r")],
        ["src", "dst", "relationship_name"],
    )
    nodes = spark.createDataFrame([(i,) for i in "abxy"], ["id"])
    full = {r["id"]: r["component"] for r in connected_components(nodes, all_edges).collect()}
    assert got2 == full
    # redelivery: re-apply batch 2's edge directly — labels unchanged
    replay = spark.createDataFrame([("b", "x")], ["src", "dst"])
    after = {r["id"]: r["component"] for r in components_batch(replay, assign).collect()}
    assert after == got2


def test_streaming_components_crash_recovery_from_retired(spark, tmp_path):
    """Crash between the two swap renames leaves only <path>.old: the next
    batch must resume from the retired copy (and re-applying the lost batch
    is a label no-op), not silently restart from scratch."""
    import os
    import shutil

    from cognee_graphdb_spark.streaming.components import components_batch

    assign = str(tmp_path / "assign")
    b1 = spark.createDataFrame([("a", "b"), ("x", "y")], ["src", "dst"])
    components_batch(b1, assign)
    # simulate the mid-swap crash: pointer gone, retired copy present
    shutil.rmtree(assign + ".old", ignore_errors=True)
    os.rename(assign, assign + ".old")
    b2 = spark.createDataFrame([("b", "x")], ["src", "dst"])
    got = {r["id"]: r["component"] for r in components_batch(b2, assign).collect()}
    assert set(got) == {"a", "b", "x", "y"} and len(set(got.values())) == 1


def test_streaming_components_sweeps_stale_tmp(spark, tmp_path):
    """A crash after the tmp parquet write but before the renames must not
    leak .components_* snapshots forever: the next batch sweeps stale
    siblings before writing its own."""
    import os

    from cognee_graphdb_spark.streaming.components import components_batch

    assign = str(tmp_path / "assign")
    stale = tmp_path / ".components_stale_leftover"
    stale.mkdir()
    (stale / "part-0.parquet").write_bytes(b"junk")
    batch = spark.createDataFrame([("a", "b")], ["src", "dst"])
    got = {r["id"]: r["component"] for r in components_batch(batch, assign).collect()}
    assert set(got) == {"a", "b"} and len(set(got.values())) == 1
    leftovers = [d for d in os.listdir(tmp_path) if d.startswith(".components_")]
    assert leftovers == []
