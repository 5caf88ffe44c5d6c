"""An in-process stand-in for delta-spark: just enough of the
``delta.tables.DeltaTable`` surface to EXECUTE every DeltaLakeBackend method
body (sources/backends.py) without the jars — the MERGE-condition string is
genuinely evaluated (``F.expr`` over aliased frames), the empty-table
normalization branch sees Delta's numFiles==0 semantics, and stats/compact
run against real file listings.  Storage is plain parquet; ``install``
also maps ``format("delta")`` to parquet on the session's reader/writer so
the backend's own read/write calls work unchanged.

This is a test double, not a Delta implementation: history() reports a
single version and vacuum() only records the call (parquet overwrite already
removed superseded files).
"""

from __future__ import annotations

import os
import sys
import types

from pyspark.sql import functions as F


def _part_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


class _MergeBuilder:
    def __init__(self, dt: "DeltaTable", source, cond: str):
        self._dt, self._src, self._cond = dt, source, cond
        self._matched = self._not_matched = False

    def whenMatchedUpdateAll(self):
        self._matched = True
        return self

    def whenNotMatchedInsertAll(self):
        self._not_matched = True
        return self

    def execute(self):
        t = self._dt._read().alias(self._dt._alias_name or "t")
        s = self._src
        cond = F.expr(self._cond)  # a typo in the condition string fails HERE
        parts = []
        if self._matched:
            parts.append(s.join(t, cond, "left_semi"))  # matched -> source version
        else:
            parts.append(t.join(s, cond, "left_semi"))  # matched rows kept as-is
        parts.append(t.join(s, cond, "left_anti"))  # unmatched existing
        if self._not_matched:
            parts.append(s.join(t, cond, "left_anti"))  # unmatched incoming
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out = out.localCheckpoint(eager=True)  # break lineage off the files we overwrite
        out.write.mode("overwrite").parquet(self._dt._path)


class _Optimizer:
    def __init__(self, dt: "DeltaTable"):
        self._dt = dt

    def executeCompaction(self):
        df = self._dt._read().localCheckpoint(eager=True)
        df.coalesce(1).write.mode("overwrite").parquet(self._dt._path)


class DeltaTable:
    vacuum_calls: list[tuple[str, float]] = []

    def __init__(self, spark, path: str):
        self._spark, self._path = spark, path
        self._alias_name: str | None = None

    # -- classmethods the backend dispatches through --------------------------
    @classmethod
    def forPath(cls, spark, path: str) -> "DeltaTable":
        return cls(spark, path)

    @classmethod
    def isDeltaTable(cls, spark, path: str) -> bool:
        return os.path.isdir(path) and bool(_part_files(path))

    # -- instance surface ------------------------------------------------------
    def _read(self):
        return self._spark.read.parquet(self._path)

    def alias(self, name: str) -> "DeltaTable":
        self._alias_name = name
        return self

    def merge(self, source, condition: str) -> _MergeBuilder:
        return _MergeBuilder(self, source, condition)

    def toDF(self):
        return self._read()

    def detail(self):
        files = _part_files(self._path)
        # Delta reports numFiles==0 after an overwrite-to-empty; parquet
        # still writes schema-only part files, so mirror Delta's semantics
        # by the row count the transaction log would carry
        n_rows = self._read().count()
        num_files = len(files) if n_rows else 0
        size = sum(os.path.getsize(f) for f in files)
        return self._spark.createDataFrame(
            [(num_files, size)], "numFiles LONG, sizeInBytes LONG"
        )

    def history(self):
        return self._spark.range(1)

    def vacuum(self, retention_hours: float):
        DeltaTable.vacuum_calls.append((self._path, retention_hours))

    def optimize(self) -> _Optimizer:
        return _Optimizer(self)


def install(monkeypatch, spark):
    """Register the fake ``delta`` package and map format('delta') to parquet
    for the duration of a test."""
    tables_mod = types.ModuleType("delta.tables")
    tables_mod.DeltaTable = DeltaTable
    delta_mod = types.ModuleType("delta")
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)

    from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter

    orig_r, orig_w = DataFrameReader.format, DataFrameWriter.format
    monkeypatch.setattr(
        DataFrameReader, "format",
        lambda self, fmt: orig_r(self, "parquet" if fmt == "delta" else fmt),
    )
    monkeypatch.setattr(
        DataFrameWriter, "format",
        lambda self, fmt: orig_w(self, "parquet" if fmt == "delta" else fmt),
    )
    DeltaTable.vacuum_calls = []
