"""Streaming content dedup with bounded state.

The batch ingest path dedups by content hash (S1 — ingest_data.py:93-96);
a continuous ingest stream needs the same guarantee WITHOUT accumulating
every hash ever seen in operator state.  ``dropDuplicatesWithinWatermark``
keeps only the hashes inside the watermark horizon — at 100 TB/day of
documents, unbounded ``dropDuplicates`` state is a slow OOM, while a
horizon-bounded dedup holds hours, not history.

Re-deliveries OUTSIDE the horizon are caught downstream by the sink's
content-addressed MERGE (sinks.py upserts by deterministic id — idempotent),
so the two layers compose into exactly-once-per-content end to end:
in-horizon dupes never reach the sink; out-of-horizon dupes MERGE into
no-ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "10 minutes",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Drop in-horizon duplicate documents from a stream by content hash.

    Adds ``hash_col`` = md5(text) (the S1 identity — same hash the batch
    ingest and the sinks use), watermarks on ``ts_col``, and keeps the first
    arrival of each hash within ``delay``.  State size is O(distinct hashes
    per horizon), not O(stream history).
    """
    hashed = stream.withColumn(hash_col, F.md5(F.col(text_col)))
    return hashed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark([hash_col])
