"""Event-time streaming: watermarked windowed aggregation + a custom stateful
operator (applyInPandasWithState).

The reference has no event-time engine (SURVEY §2.9) — these are the
operations a large-scale streaming ingest needs on top of it:

- ``windowed_event_counts``: tumbling-window counts per event type with a
  watermark, so late events beyond the bound are dropped and state is
  reclaimed — the canonical Structured Streaming aggregation.
- ``sessionize``: gap-based user sessions via ``applyInPandasWithState`` —
  the custom-stateful-operator escape hatch for semantics window functions
  can't express (session windows with per-key state carried across
  micro-batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def windowed_event_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window count+sum per event_type with late-data bound.

    Works on both static and streaming frames (same plan); on a stream the
    watermark lets Spark drop state for closed windows — without it, 100 TB of
    history accumulates in the state store.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessions per user: a session CLOSES (and is emitted) when the
    next event arrives more than ``gap_seconds`` after the previous one.
    State = (start, last, n) per user, carried across micro-batches; the open
    session stays in state until a later batch closes it.

    Input needs an epoch-seconds ``ts_epoch`` column grouped by ``user_id``.

    A user who stops sending events must not hold their last session in state
    forever: each update arms a processing-time timeout of ``gap_seconds``, and
    on timeout the open session is emitted and its state dropped.
    """
    import pandas as pd

    from cognee_graphdb_spark.session import ship_package

    ship_package(events.sparkSession)
    cols = ["user_id", "session_start", "session_end", "n_events"]

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start, last, n)], columns=cols)
            return
        rows = []
        ts_sorted = []
        for pdf in pdfs:
            ts_sorted.extend(int(t) for t in pdf["ts_epoch"])
        ts_sorted.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        for t in ts_sorted:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_seconds:
                rows.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            state.update((start, last, n))
            state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(rows, columns=cols)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
