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
    registry (operators/dedup.py): drop documents near-duplicating anything
    the registry has ever seen OR an earlier document of the same batch,
    then append only the SURVIVORS to the registry.

    Designed for ``writeStream.foreachBatch`` — state lives in the registry
    parquet, not in streaming operator state, so it is unbounded-history
    near-dedup with bounded executor memory (the exact-dup layer,
    :func:`dedup_stream`, stays watermark-bounded upstream).  A redelivered
    micro-batch re-appends its survivors' rows — duplicate REGISTRY rows are
    benign (candidates dedup before verification), the survivors themselves
    are still dropped as near-dups of their first delivery's append."""
    from cognee_graphdb_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_dedup,
        minhash_lsh_pairs,
    )

    spark = batch.sparkSession
    meta = spark.read.parquet(f"{index_path}/meta").first()

    vs_registry = minhash_index_dedup(
        batch, index_path, threshold, update=False, text_col=text_col, id_col=id_col
    ).select(F.col("id_new").alias("drop_id"))
    in_batch = minhash_lsh_pairs(
        batch,
        num_hashes=meta["num_hashes"],
        bands=meta["bands"],
        shingle_k=meta["shingle_k"],
        threshold=threshold,
        text_col=text_col,
        id_col=id_col,
        hasher=meta["hasher"],
    ).select(F.greatest("id_a", "id_b").alias("drop_id"))  # keep the first-id of each pair

    drops = vs_registry.unionByName(in_batch).distinct()
    survivors = batch.join(
        drops, batch[id_col] == drops["drop_id"], "left_anti"
    ).localCheckpoint(eager=True)
    if survivors.count() > 0:
        minhash_index_append(survivors, index_path, text_col=text_col, id_col=id_col)
    return survivors
