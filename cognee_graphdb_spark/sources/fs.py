"""Scheme-generic filesystem operations via the JVM Hadoop ``FileSystem`` API.

The store layout (GraphStore snapshots + ``_CURRENT`` pointers, pipeline-run
state, permission grants) must behave identically on a bare local path and on
any Hadoop-supported URI — ``file://``, ``s3a://``, ``hdfs://``, ``abfs://`` —
because the reference pushes/pulls its graph files to S3
(cognee/infrastructure/databases/graph/kuzu/adapter.py:167-187).  Python's
``os``/``shutil`` only speak local paths, so every metadata operation here
routes through the SAME FileSystem implementations Spark's own readers and
writers use (and therefore inherits their credentials and configuration).

These are driver-side py4j calls: O(1) metadata RPCs (exists / rename /
mkdirs / tiny pointer reads), never data movement — the data path stays
``df.write.parquet(uri)`` exactly as before.

Atomicity notes (why the pointer protocol is safe per scheme):
- local/HDFS: ``rename`` is atomic; the delete-then-rename replace window is
  two metadata ops.
- S3A: object PUT is atomic (readers see the old or the new pointer object,
  never a partial one), so ``write_text`` with overwrite=true — a single PUT
  on close — is used directly for pointer replacement; the versioned snapshot
  directories themselves are immutable-once-written, which is exactly the
  layout object stores want (no rename of big data, ever).
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession


class Fs:
    """Thin wrapper over ``org.apache.hadoop.fs.FileSystem`` for one root URI.

    All methods take full path strings (plain local paths work unchanged —
    Hadoop resolves them against the default FS, which Spark configures as
    the local FS in local mode).
    """

    def __init__(self, spark: SparkSession, root: str):
        self._jvm = spark._jvm
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(spark._jsc.hadoopConfiguration())

    def _p(self, path: str):
        return self._Path(path)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(self._fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        """Child names (not full paths); [] for a missing directory."""
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def delete(self, path: str) -> None:
        """Recursive delete; missing path is a no-op (shutil.rmtree
        ignore_errors semantics)."""
        self._fs.delete(self._p(path), True)

    def file_stats(self, path: str) -> tuple[int, int]:
        """(data_file_count, total_bytes) under a path, recursive — the
        input to compaction decisions.  Marker/hidden files (_SUCCESS,
        _started_*, dot-files — Spark's own convention for non-data files)
        are excluded, so the count compares directly against a target
        partition count.  Metadata-only: one listing RPC stream (a single
        LIST per 1000 keys on S3A), no data reads."""
        p = self._p(path)
        if not self._fs.exists(p):
            return (0, 0)
        it = self._fs.listFiles(p, True)
        n = total = 0
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            n += 1
            total += st.getLen()
        return (n, total)

    def rename(self, src: str, dst: str) -> bool:
        return bool(self._fs.rename(self._p(src), self._p(dst)))

    def replace(self, src: str, dst: str) -> None:
        """Move src over dst (os.replace semantics).

        An existing DIRECTORY target must be deleted first — Hadoop's rename
        moves src INSIDE an existing directory instead of replacing it.  For a
        FILE target, rename is tried first: on the local FS Java's renameTo
        maps to rename(2), which replaces the file atomically — the
        pointer-flip hot path.  Stores whose rename refuses existing file
        targets (HDFS, S3A) fall back to delete-then-rename, leaving only a
        tiny pointer-absent window while the (immutable) snapshot directories
        stay fully readable."""
        p_src, p_dst = self._p(src), self._p(dst)
        if self._fs.exists(p_dst):
            if self._fs.getFileStatus(p_dst).isDirectory():
                self._fs.delete(p_dst, True)
            elif bool(self._fs.rename(p_src, p_dst)):
                return
            else:
                self._fs.delete(p_dst, True)
        if not self._fs.rename(p_src, p_dst):
            raise IOError(f"rename failed: {src} -> {dst}")

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        return bytes(data).decode("utf-8")

    def write_text(self, path: str, text: str) -> None:
        """Create-or-overwrite with the content; on object stores this is one
        atomic PUT at close."""
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def create_exclusive(self, path: str, text: str) -> bool:
        """Atomic exists-check-and-create — the primitive behind the store's
        cross-process write lease.  Returns False when the path exists.

        Per scheme: the LOCAL path uses ``os.open(O_CREAT|O_EXCL)`` — a real
        kernel-level exclusive create — because Hadoop's RawLocalFileSystem
        ``create(overwrite=false)`` is a non-atomic exists()-then-open (two
        racing processes can both pass the check).  HDFS keeps the Hadoop
        call (create is atomic at the NameNode).  On plain S3A the
        check-then-create is two requests unless the store supports
        conditional PUT — mutual exclusion there is best-effort; the
        production upgrade is a table format's log-based commit, SCALE.md."""
        if self.scheme() in ("file", ""):
            import os as _os

            local = path[len("file://"):] if path.startswith("file://") else path
            try:
                fd = _os.open(local, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
            except FileExistsError:
                return False
            with _os.fdopen(fd, "wb") as f:
                f.write(text.encode("utf-8"))
            return True
        try:
            out = self._fs.create(self._p(path), False)
        except Exception:
            return False
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        return True

    def scheme(self) -> str:
        return str(self._fs.getScheme())

    def flip_pointer(self, path: str, text: str) -> None:
        """Replace a small pointer file with NO pointer-absent window, per
        scheme: on the local FS a tmp-file + rename(2) replaces the existing
        target atomically; stores whose rename refuses an existing file
        target (HDFS, S3A) instead write the pointer in place — one atomic
        overwrite PUT on object stores.  On HDFS an in-place overwrite
        truncates at create and becomes visible at close, so a reader in
        that window can observe an EMPTY (not missing) pointer — readers
        must treat empty content as transient and retry
        (GraphStore._current_version does)."""
        if self.scheme() in ("file", ""):
            tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
            self.write_text(tmp, text)
            self.replace(tmp, path)
        else:
            self.write_text(path, text)
