"""Skew diagnostics — find the hot keys before they find your shuffle.

Every join/groupBy in this engine shuffles on some key; a handful of hot keys
(the celebrity node, the empty-string name, the default timestamp) turn one
task into the job's straggler.  ``skew_report`` quantifies key skew so a
pipeline can decide to salt, broadcast, or AQE-split BEFORE running the big
join — the same pre-flight the session config's skew-join handling does at
runtime, but visible and loggable at plan time.

One aggregation pass (map-side partial counts), top-k via
TakeOrderedAndProject — safe to run on a 100 TB key column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """Top-k hottest keys: (key, cnt, share, x_mean).

    ``share`` = key's fraction of all rows; ``x_mean`` = how many times the
    mean key frequency this key holds (the salting factor you'd need).  A
    key with share > ~1/shuffle_partitions is guaranteed to straggle one
    reducer; x_mean >> 1 flags it even when the absolute share looks small.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
            F.round(F.col("cnt") * F.col("n_keys") / F.col("total"), 6).alias("x_mean"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top_k)
    )
