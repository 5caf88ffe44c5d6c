"""Table-format backends for the GraphStore (S8).

The store's write/load/merge discipline is a storage concern, not a plan
concern: an upsert IS ``MERGE INTO ... ON <key> WHEN MATCHED UPDATE ALL WHEN
NOT MATCHED INSERT ALL`` (the reference's Kuzu/LanceDB merge shapes,
adapter.py:382-449, LanceDBAdapter.py:147-202), and SCALE.md names
Delta/Iceberg as the production writer.  This module makes that swappable:

- :class:`TableBackend` — the seam: load / write_snapshot / merge / vacuum /
  compact / stats.  ``merge`` has a default anti-join + union implementation
  over load+write_snapshot, so a minimal backend only provides storage.
- :class:`ParquetSnapshotBackend` — the default: immutable ``v-<uuid>``
  parquet snapshot directories with an atomically flipped ``_CURRENT``
  pointer (MVCC, Delta's versioned-files model in miniature), any Hadoop
  FileSystem scheme.
- :class:`DeltaLakeBackend` — the lakehouse writer: native ``MERGE INTO`` /
  ``OPTIMIZE``-style compaction / ``VACUUM`` via delta-spark.  The library
  (and its jars) are not in this container, so construction is
  import-gated with a precise error; the implementation is complete and
  drops in wherever the jars exist.

Locking, the audit ledger, multi-tenancy key augmentation, and cascade
semantics stay in :class:`~cognee_graphdb_spark.sources.sinks.GraphStore` —
they are store semantics, identical across backends.
"""

from __future__ import annotations

import os
import uuid
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# merge keys per logical table — the ON condition of the MERGE
NODE_KEY = ["id"]
EDGE_KEY = ["src", "dst", "relationship_name"]
EMBEDDING_KEY = ["collection", "id"]
TABLE_KEYS = {"nodes": NODE_KEY, "edges": EDGE_KEY, "embeddings": EMBEDDING_KEY, "data": ["id"]}


class TableBackend(ABC):
    """Storage primitives behind the GraphStore.  Callers hold the store's
    per-table lease around every mutating call; backends only guarantee that
    a concurrent reader never observes a half-written table."""

    @abstractmethod
    def load(self, table: str) -> DataFrame | None:
        """Current contents, or None for an absent/empty table."""

    @abstractmethod
    def write_snapshot(self, table: str, df: DataFrame) -> None:
        """Replace the table with ``df`` atomically."""

    def merge(self, table: str, incoming: DataFrame, key: list[str]) -> None:
        """MERGE INTO on ``key``: matched rows take the incoming version,
        unmatched existing rows are kept.  Default: anti-join + union over
        load/write_snapshot; native-MERGE backends override."""
        existing = self.load(table)
        if existing is None:
            merged = incoming
        else:
            kept = existing.join(incoming.select(*key), key, "left_anti")
            merged = kept.unionByName(incoming, allowMissingColumns=True)
        self.write_snapshot(table, merged)

    @abstractmethod
    def vacuum(self, tables: list[str]) -> None:
        """Reclaim superseded storage (old versions / deleted files)."""

    @abstractmethod
    def stats(self, table: str) -> dict:
        """{files, bytes, versions} of the current table state."""

    @abstractmethod
    def compact(self, table: str, target_file_bytes: int) -> int | None:
        """Rewrite toward ``target_file_bytes``-sized files; returns the
        file count after, or None if the table is absent."""


class ParquetSnapshotBackend(TableBackend):
    """Immutable parquet snapshot versions + atomic ``_CURRENT`` pointer.

    Each write lands a new ``v-<uuid>`` directory sorted within partitions
    by the merge key (disjoint row-group min/max stats — the data-skipping
    half of a primary index), partitioned by ``dataset_id`` when present
    (multi-tenancy becomes partition pruning), then flips the pointer:
    rename(2) locally, one overwrite PUT on object stores.  Lazy plans that
    captured an old version keep reading files that never move."""

    def __init__(self, spark: SparkSession, root: str, fs=None):
        from cognee_graphdb_spark.sources.fs import Fs

        self.spark = spark
        self.root = root
        self.fs = fs or Fs(spark, root)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def current_version(self, table: str) -> str | None:
        import time

        pointer = os.path.join(self._path(table), "_CURRENT")
        if not self.fs.exists(pointer):
            return None
        # an in-place pointer overwrite (HDFS path of Fs.flip_pointer) has a
        # truncate-to-visible window where the file exists but is EMPTY —
        # transient by construction, so retry briefly before giving up
        for _ in range(5):
            version = self.fs.read_text(pointer).strip()
            if version:
                return os.path.join(self._path(table), version)
            time.sleep(0.05)
        return None

    def load(self, table: str) -> DataFrame | None:
        p = self.current_version(table)
        if p is None or not self.fs.exists(p):
            return None
        try:
            return self.spark.read.parquet(p)
        except Exception:
            # a snapshot of an emptied table has no parquet footers (a
            # partitioned write of 0 rows emits only _SUCCESS) — an empty
            # table and a missing one behave identically downstream
            return None

    def write_snapshot(self, table: str, df: DataFrame) -> None:
        base = self._path(table)
        self.fs.mkdirs(base)
        version = f"v-{uuid.uuid4().hex[:12]}"
        key = [c for c in TABLE_KEYS.get(table, []) if c in df.columns]
        if key:
            df = df.sortWithinPartitions(*key)
        writer = df.write.mode("overwrite")
        if "dataset_id" in df.columns:
            writer = writer.partitionBy("dataset_id")
        writer.parquet(os.path.join(base, version))
        self.fs.flip_pointer(os.path.join(base, "_CURRENT"), version)

    def vacuum(self, tables: list[str]) -> None:
        for table in tables:
            base = self._path(table)
            current = self.current_version(table)
            if not self.fs.is_dir(base):
                continue
            for entry in self.fs.listdir(base):
                full = os.path.join(base, entry)
                if entry.startswith("v-") and full != current:
                    self.fs.delete(full)

    def stats(self, table: str) -> dict:
        base = self._path(table)
        current = self.current_version(table)
        files, nbytes = self.fs.file_stats(current) if current else (0, 0)
        versions = sum(1 for e in self.fs.listdir(base) if e.startswith("v-"))
        return {"files": files, "bytes": nbytes, "versions": versions}

    def compact(self, table: str, target_file_bytes: int) -> int | None:
        current = self.current_version(table)
        if current is None:
            return None
        files, nbytes = self.fs.file_stats(current)
        n = max(1, -(-nbytes // target_file_bytes))  # ceil
        if files <= n:
            return files
        df = self.load(table)
        if df is None:
            return None
        # coalesce is narrow (no shuffle): fine for merging small files;
        # partitionBy tables re-split per dataset on write
        self.write_snapshot(table, df.coalesce(int(n)))
        return self.fs.file_stats(self.current_version(table))[0]


class DeltaLakeBackend(TableBackend):
    """Delta Lake writer: the GraphStore's merge condition executed as a
    native ``MERGE INTO``, plus Delta's own OPTIMIZE-shaped compaction and
    VACUUM.  Requires the ``delta-spark`` package and its jars on the
    session (not present in this container — construction says so rather
    than failing later mid-write)."""

    def __init__(self, spark: SparkSession, root: str):
        try:
            from delta.tables import DeltaTable  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "DeltaLakeBackend needs the delta-spark package and its jars "
                "(spark.jars.packages=io.delta:delta-spark_2.13:<ver>, plus the "
                "DeltaCatalog/DeltaSparkSessionExtension session configs); "
                "fall back to ParquetSnapshotBackend without them"
            ) from e
        self.spark = spark
        self.root = root

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _delta(self, table: str):
        from delta.tables import DeltaTable

        p = self._path(table)
        return DeltaTable.forPath(self.spark, p) if DeltaTable.isDeltaTable(self.spark, p) else None

    def load(self, table: str) -> DataFrame | None:
        dt = self._delta(table)
        if dt is None:
            return None
        # empty-table normalization via transaction-log metadata (numFiles
        # after an overwrite-to-empty is 0) — df.head(1) here would run a
        # full scan job on EVERY load, and load fronts every upsert
        if dt.detail().select("numFiles").first()["numFiles"] == 0:
            return None
        return self.spark.read.format("delta").load(self._path(table))

    def write_snapshot(self, table: str, df: DataFrame) -> None:
        writer = df.write.format("delta").mode("overwrite").option("overwriteSchema", "true")
        if "dataset_id" in df.columns:
            writer = writer.partitionBy("dataset_id")
        writer.save(self._path(table))

    def merge(self, table: str, incoming: DataFrame, key: list[str]) -> None:
        dt = self._delta(table)
        if dt is None:
            self.write_snapshot(table, incoming)
            return
        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in key)
        (
            dt.alias("t")
            .merge(incoming.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def vacuum(self, tables: list[str]) -> None:
        for table in tables:
            dt = self._delta(table)
            if dt is not None:
                dt.vacuum(0)

    def stats(self, table: str) -> dict:
        dt = self._delta(table)
        if dt is None:
            return {"files": 0, "bytes": 0, "versions": 0}
        detail = dt.detail().select("numFiles", "sizeInBytes").first()
        versions = dt.history().count()
        return {"files": int(detail["numFiles"]), "bytes": int(detail["sizeInBytes"]), "versions": int(versions)}

    def compact(self, table: str, target_file_bytes: int) -> int | None:
        dt = self._delta(table)
        if dt is None:
            return None
        dt.optimize().executeCompaction()
        return int(dt.detail().select("numFiles").first()["numFiles"])


__all__ = [
    "TableBackend",
    "ParquetSnapshotBackend",
    "DeltaLakeBackend",
    "TABLE_KEYS",
    "NODE_KEY",
    "EDGE_KEY",
    "EMBEDDING_KEY",
]
