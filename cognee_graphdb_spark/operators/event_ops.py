"""Event-table relational operators: as-of join and batch sessionization.

The reference's temporal surface is interval filtering + joins
(kuzu adapter.py:1802-1881, temporal_retriever.py:98-138 — covered by
operators/graph_joins.py:temporal_range_join); these are the two further
shapes a large-scale event pipeline needs and that Spark lacks as
built-ins:

- ``asof_join``: each left row picks the latest right row at-or-before its
  timestamp per key (the time-series "most recent state" join).  A naive
  formulation is a range join that Catalyst executes as a per-key cross
  product; this one is a single union + one sort-window pass.
- ``sessionize_batch``: gap-based session ids, fully declarative (lag +
  running sum) — the batch twin of streaming/windows.py:sessionize, same
  (user_id, session_start, session_end, n_events) contract so backfill and
  live paths agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the columns of the most
    recent ``right`` row of the same ``on`` key with ``right_ts <= left_ts``
    (inclusive, like DuckDB/pandas ASOF); unmatched rows keep nulls.
    ``tolerance_seconds`` voids matches older than the bound.

    Physical shape — ONE shuffle, no range-join cross product: both sides
    union into a single frame tagged by origin, partitioned by key and
    sorted by (ts, origin) so a right row at the exact same timestamp sorts
    before the left row that may claim it; ``last(ignorenulls)`` over the
    running frame carries the latest right payload forward; left rows are
    then filtered back out.  Cost is sort-shuffle of |L|+|R| rows — vs the
    naive join's per-key |L|·|R|.

    Skew: one key's rows sort within one task (same caveat and mitigation
    as connected_components' window strategy — for a pathological hot key,
    pre-split by coarse time bucket and asof-join per bucket with the
    previous bucket's tail broadcast).
    """
    if right_ts == on:
        raise ValueError(
            "asof_join: right_ts must differ from the join key `on` — the "
            "timestamp is carried in the match payload keyed by name"
        )
    rcols = [c for c in right.columns if c != on]
    if not rcols:
        raise ValueError(
            "asof_join: right frame has no payload columns besides the join "
            "key; nothing to join (an empty struct is not constructible)"
        )
    payload = F.struct(*[F.col(c).alias(c) for c in rcols])
    l = left.select(
        F.col(on), F.col(left_ts).alias("_ts"), F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c).alias(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(right.select(payload).schema[0].dataType).alias("_r"),
    )
    r = right.select(
        F.col(on), F.col(right_ts).alias("_ts"), F.lit(0).alias("_is_left"),
        F.lit(None).cast(l.schema["_l"].dataType).alias("_l"),
        payload.alias("_r"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    if tolerance_seconds is not None:
        in_tol = (
            F.col("_ts").cast("double") - F.col(f"_m.{right_ts}").cast("double")
            <= F.lit(float(tolerance_seconds))
        )
        matched = matched.withColumn("_m", F.when(in_tol, F.col("_m")))
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in rcols
    ]
    return matched.select(*out_cols)


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """(user_id, session_start, session_end, n_events): gap-based sessions —
    a new session starts when an event arrives more than ``gap_seconds``
    after the user's previous one.  Epoch-second longs, matching the
    streaming operator's output contract exactly (tested for parity) so a
    parquet backfill and the live applyInPandasWithState path produce
    interchangeable tables.

    Declarative: lag + a running sum of session-break flags assigns session
    ids, then one groupBy folds each session — two window passes over the
    SAME (user, ts) sort order, so Spark plans a single sort-shuffle.
    ``order_col`` breaks equal-timestamp ties deterministically.
    """
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    ep = F.col(ts_col).cast("double")
    prev = F.lag(ts_col).over(w).cast("double")
    is_break = F.when(prev.isNull() | (ep - prev > gap_seconds), 1).otherwise(0)
    return (
        events.withColumn("_brk", is_break)
        .withColumn("_sess", F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(F.col(user_col).alias("user_id"), F.col("_sess"))
        .agg(
            F.min(ep).cast("long").alias("session_start"),
            F.max(ep).cast("long").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sess")
    )
