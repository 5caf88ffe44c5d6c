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


def near_dedup_batch(
    batch: DataFrame,
    index_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One micro-batch of STREAMING NEAR-dedup against the persisted MinHash
    registry: drop documents near-duplicating anything the registry has ever
    seen OR an earlier document of the same batch, then append only the
    SURVIVORS to the registry.  Thin ``writeStream.foreachBatch`` wrapper
    over :func:`cognee_graphdb_spark.operators.dedup.minhash_index_ingest`
    — one minhash pass per batch; state lives in the registry parquet, not
    in streaming operator state, so this is unbounded-history near-dedup
    with bounded executor memory (the exact-dup layer, :func:`dedup_stream`,
    stays watermark-bounded upstream).  A REDELIVERED micro-batch is a
    no-op: its survivors' ids are already registered, so they drop on the
    replay and nothing re-appends."""
    from cognee_graphdb_spark.operators.dedup import minhash_index_ingest

    return minhash_index_ingest(
        batch, index_path, threshold, text_col=text_col, id_col=id_col
    )
