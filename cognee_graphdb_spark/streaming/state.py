"""Parquet-swap state for foreachBatch-maintained side tables.

The streaming operators that maintain an always-current derived table
(connected components, PageRank) keep their state in plain parquet, not
streaming operator memory, and replace it per batch with a two-rename swap:
write to a hidden sibling temp dir, retire the live dir to ``<path>.old``,
rename the temp into place.  In-flight readers keep their already-opened
files (POSIX rename leaves open inodes valid); a brand-new reader landing
exactly between the two renames must retry.  foreachBatch runs batches
serially per query, so there is exactly ONE writer — which is what makes
both the stale-temp sweep and the rename dance safe.  (The GraphStore's
MVCC pointer-flip backend is the production-grade version of this swap;
this module stays dependency-free for ledger-style side tables.)

Crash matrix (single writer, batch replay idempotent):
- crash after temp write, before renames → temp leaks; swept on next entry;
- crash between the renames → live dir missing, ``.old`` IS the last
  committed state; :func:`read_state` resumes from it and the streaming
  engine re-applies the batch that crashed;
- crash after both renames → clean; replayed batch is a no-op by the
  caller's idempotency contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def read_state(spark, path: str) -> DataFrame | None:
    """The last committed state at ``path``, or None before the first swap.
    Falls back to ``<path>.old`` when a crash landed between the two renames
    of a previous swap — that copy is the last committed version, and the
    interrupted batch gets re-applied by the streaming engine."""
    if os.path.isdir(path):
        return spark.read.parquet(path)
    retired = path.rstrip("/") + ".old"
    if os.path.isdir(retired):
        return spark.read.parquet(retired)
    return None


def swap_write(df: DataFrame, path: str, tmp_prefix: str) -> None:
    """Materialize ``df`` to parquet at ``path`` via the two-rename swap.
    ``tmp_prefix`` namespaces the hidden temp dirs (e.g. ``.components_``)
    so concurrent state tables under one parent never sweep each other."""
    parent = os.path.dirname(path.rstrip("/")) or "."
    os.makedirs(parent, exist_ok=True)
    # a crash after the temp write but before the renames leaks one
    # snapshot-sized dir per crash — single-writer means any stale sibling
    # with our prefix is dead; sweep before creating this batch's temp
    for stale in os.listdir(parent):
        if stale.startswith(tmp_prefix):
            shutil.rmtree(os.path.join(parent, stale), ignore_errors=True)
    tmp = tempfile.mkdtemp(prefix=tmp_prefix, dir=parent)
    df.write.mode("overwrite").parquet(tmp)
    # POSIX rename replaces atomically only for empty targets, so swap via a
    # retired name (single-writer makes this safe)
    if os.path.isdir(path):
        retired = path.rstrip("/") + ".old"
        if os.path.isdir(retired):
            shutil.rmtree(retired)
        os.rename(path, retired)
    os.rename(tmp, path)
