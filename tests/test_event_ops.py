"""As-of join + batch sessionization (operators/event_ops.py), including
batch-vs-streaming sessionize parity."""

import json

from pyspark.sql import functions as F


def _events(spark, rows):
    df = spark.createDataFrame(rows, ["event_id", "ts_s", "user_id", "event_type", "value"])
    return df.withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


def test_asof_join_picks_latest_at_or_before(spark):
    from cognee_graphdb_spark.operators.event_ops import asof_join

    left = _events(
        spark,
        [
            (1, "2024-01-01 00:10:00", 1, "click", 1.0),
            (2, "2024-01-01 00:20:00", 1, "click", 2.0),
            (3, "2024-01-01 00:05:00", 2, "click", 3.0),
        ],
    )
    right = _events(
        spark,
        [
            (100, "2024-01-01 00:08:00", 1, "error", 0.0),
            (101, "2024-01-01 00:15:00", 1, "error", 0.0),
            (102, "2024-01-01 00:20:00", 1, "error", 0.0),  # same-ts: inclusive
            (103, "2024-01-01 00:06:00", 2, "error", 0.0),  # after left -> no match
        ],
    ).select("user_id", "ts", F.col("event_id").alias("err_id"))
    out = {r["event_id"]: r["r_err_id"] for r in asof_join(left, right, on="user_id").collect()}
    assert out == {1: 100, 2: 102, 3: None}


def test_asof_join_tolerance_voids_stale_matches(spark):
    from cognee_graphdb_spark.operators.event_ops import asof_join

    left = _events(spark, [(1, "2024-01-01 01:00:00", 1, "click", 1.0)])
    right = _events(spark, [(100, "2024-01-01 00:00:00", 1, "error", 0.0)]).select(
        "user_id", "ts", F.col("event_id").alias("err_id")
    )
    hit = asof_join(left, right, on="user_id", tolerance_seconds=7200).collect()[0]
    assert hit["r_err_id"] == 100
    miss = asof_join(left, right, on="user_id", tolerance_seconds=600).collect()[0]
    assert miss["r_err_id"] is None


def test_asof_join_keeps_all_left_columns(spark):
    from cognee_graphdb_spark.operators.event_ops import asof_join

    left = _events(spark, [(1, "2024-01-01 00:10:00", 1, "click", 7.5)])
    right = _events(spark, [(9, "2024-01-01 00:01:00", 1, "error", 0.25)]).select(
        "user_id", "ts", "value"
    )
    row = asof_join(left, right, on="user_id").collect()[0]
    assert (row["event_id"], row["event_type"], row["value"]) == (1, "click", 7.5)
    assert row["r_value"] == 0.25
    assert str(row["r_ts"]) == "2024-01-01 00:01:00"


def test_sessionize_batch_gap_splits(spark):
    from cognee_graphdb_spark.operators.event_ops import sessionize_batch

    events = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "a", 0.0),
            (2, "2024-01-01 00:10:00", 1, "a", 0.0),
            (3, "2024-01-01 02:00:00", 1, "a", 0.0),  # > 30 min gap: new session
            (4, "2024-01-01 00:00:00", 2, "a", 0.0),
        ],
    )
    rows = sorted(
        tuple(r) for r in sessionize_batch(events, gap_seconds=1800).collect()
    )
    t0 = rows[0][1]
    assert [(u, s - t0, e - t0, n) for u, s, e, n in rows] == [
        (1, 0, 600, 2),
        (1, 7200, 7200, 1),
        (2, 0, 0, 1),
    ]


def test_sessionize_batch_matches_streaming_operator(spark, tmp_path):
    """Backfill/live parity: the declarative batch sessionizer and the
    applyInPandasWithState streaming one produce the same CLOSED sessions
    (the stream holds its per-user open tail in state, so compare after
    appending a far-future closer event per user)."""
    from pyspark.sql import types as T

    from cognee_graphdb_spark.operators.event_ops import sessionize_batch
    from cognee_graphdb_spark.streaming.windows import sessionize

    raw = [(1, 0), (1, 60), (1, 5000), (1, 5100), (2, 0), (2, 2000), (2, 2100)]
    closer = [(1, 10**7), (2, 10**7)]

    src = tmp_path / "sess_par"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for u, t in raw + closer:
            f.write(json.dumps({"user_id": u, "ts_epoch": t}) + "\n")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("ts_epoch", T.LongType())]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_par"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM sess_parity").collect()
    )

    batch_df = spark.createDataFrame(raw, ["user_id", "ts_epoch"]).withColumn(
        "ts", F.col("ts_epoch").cast("timestamp")
    )
    batch = sorted(
        tuple(r) for r in sessionize_batch(batch_df, gap_seconds=1800).collect()
    )
    assert batch == streamed


def test_asof_join_validates_degenerate_right(spark):
    """right_ts == on and payload-less right frames fail fast with a clear
    message instead of an opaque struct error (r7 ADVICE finding)."""
    import pytest

    from cognee_graphdb_spark.operators.event_ops import asof_join

    left = spark.createDataFrame([("k1", 5)], ["k", "ts"])
    with pytest.raises(ValueError, match="right_ts"):
        asof_join(left, spark.createDataFrame([("k1", 1)], ["k", "v"]),
                  on="k", left_ts="ts", right_ts="k")
    with pytest.raises(ValueError, match="payload"):
        asof_join(left, spark.createDataFrame([("k1",)], ["k"]),
                  on="k", left_ts="ts", right_ts="k")
