"""Sinks: graph/vector upsert (S6/S7), relationship ledger (S9), storage
layout (S8).

The reference MERGEs nodes/edges in batches into Kuzu (adapter.py:382-449,
679-732) and merge-inserts vectors into LanceDB (LanceDBAdapter.py:147-202),
with an audit ledger per mutation (graph_db_interface.py:22-134).

Spark-first: tables live as parquet snapshot directories; an upsert is an
anti-join + union rewritten atomically (write-new-snapshot, swap).  On a real
lakehouse the same plans run as ``MERGE INTO`` on Delta/Iceberg — the logic
below IS the merge condition (match on id / (src,dst,relationship_name)), so
swapping the writer is a storage concern, not a plan change.  The root may be
any Hadoop-supported URI (S8: ``s3a://``, ``hdfs://``, ``abfs://``, ``file://``
or a bare local path) — every metadata operation routes through the Hadoop
``FileSystem`` API (sources/fs.py), the same code path for all schemes, and
snapshot versions are immutable once written so object stores never pay a
data rename.
"""

from __future__ import annotations

import contextlib
import os
import random
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cognee_graphdb_spark.sources.backends import (
    EDGE_KEY,
    EMBEDDING_KEY,
    NODE_KEY,
    TABLE_KEYS,
    ParquetSnapshotBackend,
    TableBackend,
)
from cognee_graphdb_spark.sources.fs import Fs

_KEYS = TABLE_KEYS

# a writer that dies holding a table lease is assumed dead after this many
# seconds and its lock is broken (bound it ABOVE the slowest expected merge
# job — a live long-running writer whose lease gets broken reintroduces the
# lost-update race this lock exists to prevent)
_LOCK_TTL = float(os.environ.get("SPARK_GRAFT_LOCK_TTL", "300"))


class GraphStore:
    """Persistent nodes/edges/embeddings with MERGE-upsert + audit ledger.

    Storage is a :class:`~cognee_graphdb_spark.sources.backends.TableBackend`
    (default: MVCC parquet snapshots; ``DeltaLakeBackend`` drops in where
    the jars exist).  Locking, the ledger, multi-tenancy key augmentation,
    and cascade semantics live HERE — identical across backends."""

    def __init__(self, spark: SparkSession, root: str, backend: TableBackend | None = None):
        self.spark = spark
        self.root = root
        self.fs = Fs(spark, root)
        self.fs.mkdirs(root)
        self.backend = backend or ParquetSnapshotBackend(spark, root, self.fs)
        # ledger appends share ONE output dir, and concurrent Spark append
        # jobs share its _temporary staging — serialize them so table upserts
        # may run from a thread pool (api.cognify) while the audit trail
        # stays consistent
        self._ledger_lock = threading.Lock()

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    @contextlib.contextmanager
    def _table_lock(self, table: str, timeout: float = _LOCK_TTL + 60.0):
        """Cross-process write lease for one table's read-merge-flip cycle.

        Two engine processes upserting the same table used to race on the
        ``_CURRENT`` pointer (both load v1, both write, last flip wins — one
        merge silently lost; the reference serializes writers through its
        embedded DB's file lock, kuzu/adapter.py:45).  The lease is a
        ``_LOCK`` file taken with ``create(path, overwrite=false)`` — atomic
        on local FS and HDFS — and held across load -> merge -> pointer flip,
        so read-modify-writes serialize.  A lease older than
        ``SPARK_GRAFT_LOCK_TTL`` seconds is treated as a dead writer's and
        broken via rename (only one breaker can win the rename).  Locks are
        PER TABLE, so concurrent writers of different tables (e.g. cognify's
        parallel nodes/edges/embeddings writes) never contend, and no code
        path holds two locks at once — no ordering, no deadlock."""
        self.fs.mkdirs(self._path(table))
        lock = os.path.join(self._path(table), "_LOCK")
        token = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
        deadline = time.time() + timeout
        while not self.fs.create_exclusive(lock, f"{time.time()}|{token}"):
            if time.time() > deadline:
                raise TimeoutError(f"could not acquire write lease on {table!r} within {timeout:.0f}s")
            try:
                payload = self.fs.read_text(lock)
                age = time.time() - float(payload.split("|", 1)[0])
            except Exception:
                continue  # holder released between attempts — retry create
            if age > _LOCK_TTL:
                # break the stale lease: re-read right before renaming so a
                # fresh lease taken in the meantime survives, and rename so
                # only ONE breaker wins even if several saw it stale
                try:
                    if self.fs.read_text(lock) == payload:
                        broken = f"{lock}.broken-{uuid.uuid4().hex[:8]}"
                        if self.fs.rename(lock, broken):
                            self.fs.delete(broken)
                except Exception:
                    pass
                continue
            time.sleep(0.05 + random.random() * 0.1)
        try:
            yield
        finally:
            self.fs.delete(lock)

    def load(self, table: str) -> DataFrame | None:
        return self.backend.load(table)

    def _swap_write(self, table: str, df: DataFrame) -> None:
        """Atomic full-table replace via the backend (MVCC snapshot flip on
        the parquet default, ``overwrite`` on Delta)."""
        self.backend.write_snapshot(table, df)

    def snapshot(self) -> dict[str, str | None]:
        """Pin the CURRENT version of every table: {table: version_path}.
        MVCC makes this free — snapshot versions are immutable directories,
        so a pinned path stays readable until :meth:`vacuum` (Delta's time
        travel is the lakehouse equivalent; the parquet backend exposes the
        pointer directly)."""
        if not hasattr(self.backend, "current_version"):
            raise NotImplementedError(
                "snapshot() needs a version-pointer backend "
                "(use Delta time travel on lakehouse backends)"
            )
        return {t: self.backend.current_version(t) for t in _KEYS}

    def load_snapshot(self, table: str, version_path: str | None) -> DataFrame | None:
        """Read a pinned snapshot version of ``table`` (None pin = the table
        did not exist when the snapshot was taken; an emptied table's
        snapshot has no parquet footers — same guard as the backend's
        ``load``, empty and missing behave identically downstream)."""
        if version_path is None:
            return None
        try:
            return self.spark.read.parquet(version_path)
        except Exception:
            return None

    def vacuum(self) -> None:
        """Reclaim superseded storage (callers guarantee no reader still
        holds a plan over it — Delta's VACUUM contract)."""
        self.backend.vacuum(list(_KEYS))

    def table_stats(self) -> dict[str, dict]:
        """Per-table maintenance stats of the CURRENT table states (plus the
        append-only ledger): {table: {files, bytes, versions}}.  Metadata
        RPCs only — this is what an operator (or a scheduled maintenance
        job) reads to decide when to :meth:`compact` / :meth:`vacuum`."""
        out: dict[str, dict] = {table: self.backend.stats(table) for table in _KEYS}
        lfiles, lbytes = self.fs.file_stats(os.path.join(self.root, "ledger"))
        out["ledger"] = {"files": lfiles, "bytes": lbytes, "versions": 1}
        return out

    def compact(self, target_file_bytes: int = 128 * 1024 * 1024) -> dict[str, int]:
        """Rewrite each table's current snapshot (and the ledger) with
        file sizes near ``target_file_bytes`` — the small-files maintenance
        every snapshot store needs: N incremental upserts each add a
        shuffle.partitions-wide version, and at 100 TB a scan's task count
        (and S3 LIST cost) is bounded by file count, not data size.

        Same MVCC discipline as every write: the compacted copy is a NEW
        version under the table lock, the pointer flips atomically, old
        versions remain for in-flight readers until :meth:`vacuum`.  The
        ledger (plain append-only, no versions) compacts in place via a
        staging directory + rename, under both ledger locks.  Returns
        {table: files_after}."""
        out: dict[str, int] = {}
        for table in list(_KEYS):
            with self._table_lock(table):
                n = self.backend.compact(table, target_file_bytes)
                if n is not None:
                    out[table] = n
        ledger_path = os.path.join(self.root, "ledger")
        with self._ledger_lock, self._table_lock("ledger"):
            self._ledger_recover(ledger_path)
            files, nbytes = self.fs.file_stats(ledger_path)
            n = max(1, -(-nbytes // target_file_bytes))
            if self.fs.exists(ledger_path) and files > n:
                df = self.ledger()
                if df is not None:
                    staged = ledger_path + ".compacting"
                    df.coalesce(int(n)).write.mode("overwrite").parquet(staged)
                    self._ledger_swap(ledger_path, staged)
                    out["ledger"] = self.fs.file_stats(ledger_path)[0]
        return out

    def _ledger_data_files(self, path: str) -> list[str]:
        return [e for e in self.fs.listdir(path) if not e.startswith(("_", "."))]

    def _ledger_swap(self, ledger_path: str, staged: str) -> None:
        """Replace the ledger's data files with the staged compacted copy
        WITHOUT deleting/renaming the directory itself — the held ``_LOCK``
        lease lives inside it (deleting the dir would destroy mutual
        exclusion mid-critical-section), and a rename onto an existing dir
        nests instead of replacing.  The staged snapshot holds the FULL
        history, so an interruption at any point is recoverable from it
        (:meth:`_ledger_recover`)."""
        for e in self._ledger_data_files(ledger_path):
            self.fs.delete(os.path.join(ledger_path, e))
        for e in self._ledger_data_files(staged):
            self.fs.rename(os.path.join(staged, e), os.path.join(ledger_path, e))
        self.fs.delete(staged)

    def _ledger_recover(self, ledger_path: str) -> None:
        """Crash recovery for an interrupted ledger compaction, run under
        the ledger locks: a staged dir WITH ``_SUCCESS`` is a complete
        snapshot of the full history — finish the swap; without it the
        write never completed — discard the staging."""
        staged = ledger_path + ".compacting"
        if not self.fs.exists(staged):
            return
        if self.fs.exists(os.path.join(staged, "_SUCCESS")):
            self._ledger_swap(ledger_path, staged)
        else:
            self.fs.delete(staged)

    def _upsert(self, table: str, incoming: DataFrame, created_by: str) -> None:
        with self._table_lock(table):
            key = _KEYS[table]
            existing = self.load(table)
            # Multi-tenancy: ids are content-addressed, so the SAME entity ingested
            # into two datasets yields the same id — each dataset must keep its own
            # row (the reference gives each dataset its own graph DB; search.py:322).
            # dataset_id therefore joins the merge key whenever both sides carry it.
            if "dataset_id" in incoming.columns and (existing is None or "dataset_id" in existing.columns):
                key = key + ["dataset_id"]
            incoming = incoming.dropDuplicates(key)
            # MERGE: matched rows take the incoming version (update), the rest
            # of the existing table is kept (the NOT MATCHED ... INSERT half) —
            # anti-join + union on the parquet backend, native MERGE INTO on a
            # lakehouse backend
            self.backend.merge(table, incoming, key)
        self.append_ledger(f"upsert_{table}", incoming.select(F.concat_ws("|", *key).alias("id")), created_by)

    def upsert_nodes(self, nodes: DataFrame, created_by: str = "add_data_points") -> None:
        """S6 — MERGE on node id (kuzu adapter.py:382-449)."""
        self._upsert("nodes", nodes, created_by)

    def upsert_edges(self, edges: DataFrame, created_by: str = "add_data_points") -> None:
        """S6 — MERGE on (src, dst, relationship_name) (kuzu adapter.py:679-732)."""
        self._upsert("edges", edges, created_by)

    def upsert_embeddings(self, embeddings: DataFrame, created_by: str = "index_data_points") -> None:
        """S7 — merge_insert by (collection, id) (LanceDBAdapter.py:147-202)."""
        self._upsert("embeddings", embeddings, created_by)

    def upsert_data(self, data: DataFrame, created_by: str = "ingest") -> None:
        """Data-table MERGE by content-derived id (ingest_data.py:93-96)."""
        self._upsert("data", data, created_by)

    def delete_embeddings(
        self, ids: DataFrame, collection: str, created_by: str = "delete"
    ) -> None:
        """Remove one collection's vector rows for the given node ids — the
        targeted counterpart of :meth:`delete_nodes`' embeddings cascade
        (LanceDBAdapter.py's delete-by-key), used by incremental embedding
        maintenance when a node is still in the graph but no longer embeds
        (e.g. it lost every edge, so the embedding producer has no row for
        it and keeping the old vector would be silently stale)."""
        ids = ids.select("id").distinct()
        with self._table_lock("embeddings"):
            emb = self.load("embeddings")
            if emb is not None:
                hit = emb.filter(F.col("collection") == collection)
                rest = emb.filter(F.col("collection") != collection)
                kept = hit.join(ids, "id", "left_anti")
                self._swap_write("embeddings", kept.unionByName(rest))
        self.append_ledger(
            "delete_embeddings",
            ids.select(F.concat("id", F.lit(f"|{collection}")).alias("id")),
            created_by,
        )

    # -- S9: append-only relationship ledger ---------------------------------

    def append_ledger(self, op: str, ids: DataFrame, created_by: str) -> None:
        """Audit row per mutation (graph_db_interface.py:22-134).

        Serialized twice: the thread lock keeps THIS process's concurrent
        upserts (cognify's parallel table writes) from sharing one append
        job's ``_temporary`` staging, and the cross-process lease extends the
        same guarantee to other engine processes on the same store."""
        rows = ids.select(
            F.lit(op).alias("op"),
            F.col("id").cast("string").alias("id"),
            F.lit(created_by).alias("created_by"),
            F.lit(int(time.time())).alias("at"),
        )
        with self._ledger_lock, self._table_lock("ledger"):
            rows.write.mode("append").parquet(os.path.join(self.root, "ledger"))

    def ledger(self) -> DataFrame | None:
        p = os.path.join(self.root, "ledger")
        if not self.fs.exists(p):
            return None
        try:
            return self.spark.read.parquet(p)
        except Exception:
            # the lease's mkdirs can precede the first append: an empty
            # ledger directory is the same as no ledger
            return None

    def ledger_with_deletions(self) -> DataFrame | None:
        """The ledger with a ``deleted_at`` column, reference-parity with
        delete.py:152-166 (UPDATE graph_relationship_ledger SET deleted_at
        WHERE the row touches a deleted node).

        The parquet ledger is append-only (events, not mutable rows), so
        deletion is itself an event: ``deleted_at`` for a creation row is the
        earliest later ``delete_*`` event naming an id the row references —
        computed here as a view instead of rewriting history.  Edge rows'
        ids are ``src|dst|relationship_name``, so a deleted node tombstones
        them by substring containment on the delimited key."""
        led = self.ledger()
        if led is None:
            return None
        # scoped delete events ("delete_*_scoped") carry "nodeid|dataset" ids:
        # split the dataset back out so a delete in ds_b never tombstones the
        # SAME content-addressed id's creation rows in ds_a
        raw = led.filter(F.col("op").startswith("delete"))
        scoped = F.col("op").endswith("_scoped")
        deletes = raw.select(
            F.when(scoped, F.regexp_extract("id", r"^(.*)\|([^|]*)$", 1))
            .otherwise(F.col("id"))
            .alias("del_id"),
            F.when(scoped, F.regexp_extract("id", r"^(.*)\|([^|]*)$", 2)).alias("del_ds"),
            F.col("at").alias("del_at"),
        )
        creations = led.filter(~F.col("op").startswith("delete"))
        # the delete set is bounded per event (ids of one cascade), and the
        # match is id-containment on the | -delimited key; a broadcast
        # theta-join keeps the big creation side shuffle-free
        hit = creations.join(
            F.broadcast(deletes),
            (
                (F.col("id") == F.col("del_id"))
                | F.col("id").startswith(F.concat(F.col("del_id"), F.lit("|")))
                | F.col("id").endswith(F.concat(F.lit("|"), F.col("del_id")))
                | F.col("id").contains(F.concat(F.lit("|"), F.col("del_id"), F.lit("|")))
            )
            & (
                F.col("del_ds").isNull()
                | F.col("id").endswith(F.concat(F.lit("|"), F.col("del_ds")))
            )
            & (F.col("del_at") >= F.col("at")),
            "left",
        )
        return hit.groupBy(*creations.columns).agg(F.min("del_at").alias("deleted_at"))

    # -- delete / prune (the reference's api/v1/delete + api/v1/prune) -------

    def delete_nodes(self, ids: DataFrame, created_by: str = "delete", dataset_id: str | None = None) -> None:
        """Remove the given node ids, their incident edges, and their vector
        rows — the apply step of a J7 cascade set (api/v1/delete/delete.py).

        ``dataset_id`` scopes the removal to that dataset's rows: ids are
        content-addressed, so another dataset may legitimately hold the SAME
        id (the reference isolates datasets as separate graph DBs —
        search.py:322) and must keep its copy.  The scope split is a
        partition-pruned filter, so the out-of-scope partitions pass through
        untouched while only the scoped slice pays the anti-join."""
        ids = ids.select("id").distinct()

        def split(df: DataFrame):
            """(in_scope, out_of_scope) under the dataset filter."""
            if dataset_id is None or "dataset_id" not in df.columns:
                return df, None
            in_scope = df.filter(F.col("dataset_id").eqNullSafe(dataset_id))
            out = df.filter(~F.col("dataset_id").eqNullSafe(dataset_id))
            return in_scope, out

        with self._table_lock("nodes"):
            nodes = self.load("nodes")
            if nodes is not None:
                hit, rest = split(nodes)
                kept = hit.join(ids, "id", "left_anti")
                self._swap_write("nodes", kept if rest is None else kept.unionByName(rest))
        with self._table_lock("edges"):
            edges = self.load("edges")
            if edges is not None:
                hit, rest = split(edges)
                kept = (
                    hit.join(ids.withColumnRenamed("id", "src"), "src", "left_anti")
                    .join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
                    .select(*edges.columns)
                )
                self._swap_write("edges", kept if rest is None else kept.unionByName(rest))
        with self._table_lock("embeddings"):
            emb = self.load("embeddings")
            if emb is not None:
                hit, rest = split(emb)
                kept = hit.join(ids, "id", "left_anti")
                self._swap_write("embeddings", kept if rest is None else kept.unionByName(rest))
        if dataset_id is None:
            self.append_ledger("delete_nodes", ids, created_by)
        else:
            # dataset-scoped event: the audit view must not tombstone another
            # dataset's rows for the same content-addressed id
            self.append_ledger(
                "delete_nodes_scoped",
                ids.select(F.concat("id", F.lit(f"|{dataset_id}")).alias("id")),
                created_by,
            )

    def delete_data(self, data_ids: list[str], created_by: str = "delete", dataset_id: str | None = None) -> list[str]:
        """Remove Data rows by id; returns their content hashes so the caller
        can clear incremental-processing state (delete.py also drops the data
        record, not just the graph).  ``dataset_id`` removes only that
        dataset's membership rows — the reference deletes the dataset link
        and keeps the Data record while other datasets still reference it
        (delete.py:188-201)."""
        with self._table_lock("data"):
            data = self.load("data")
            if data is None or not data_ids:
                return []
            doomed = F.col("id").isin(data_ids)
            if dataset_id is not None and "dataset_id" in data.columns:
                doomed = doomed & F.col("dataset_id").eqNullSafe(dataset_id)
            hits = data.filter(doomed)
            hashes = [r["content_hash"] for r in hits.select("content_hash").distinct().collect()]
            self._swap_write("data", data.filter(~doomed))
        self.append_ledger("delete_data", hits.select("id"), created_by)
        return hashes

    def delete_document(self, document_id: str, dataset_id: str | None = None) -> int:
        """Cascade delete: J7 delete-set over the stored graph, then apply.
        Shared entities survive (operators/graph_joins.py:cascade_delete_set).
        ``dataset_id`` computes the cascade over that dataset's subgraph only
        and scopes the apply step the same way.  Returns the number of
        deleted nodes."""
        from cognee_graphdb_spark.operators.graph_joins import cascade_delete_set

        nodes, edges = self.load("nodes"), self.load("edges")
        if nodes is None or edges is None:
            return 0
        if dataset_id is not None:
            if "dataset_id" in nodes.columns:
                nodes = nodes.filter(F.col("dataset_id").eqNullSafe(dataset_id))
            if "dataset_id" in edges.columns:
                edges = edges.filter(F.col("dataset_id").eqNullSafe(dataset_id))
        delete_set = cascade_delete_set(nodes, edges, document_id).localCheckpoint(eager=True)
        n = delete_set.count()
        if n:
            self.delete_nodes(delete_set, created_by="delete_document", dataset_id=dataset_id)
        return n

    def delete_dataset(self, dataset_id: str) -> dict[str, int]:
        """Remove every row of one dataset across nodes/edges/embeddings/data
        (api/v1/datasets delete_dataset) — a partition-pruned anti-filter per
        table, other tenants' partitions pass through untouched.  Returns
        per-table removed-row counts."""
        removed: dict[str, int] = {}
        for table in ("nodes", "edges", "embeddings", "data"):
            with self._table_lock(table):
                df = self.load(table)
                if df is None or "dataset_id" not in df.columns:
                    removed[table] = 0
                    continue
                doomed = F.col("dataset_id").eqNullSafe(dataset_id)
                n = df.filter(doomed).count()
                removed[table] = n
                if n:
                    self._swap_write(table, df.filter(~doomed))
        self.append_ledger(
            "delete_dataset",
            self.spark.createDataFrame([(dataset_id,)], ["id"]),
            "delete_dataset",
        )
        return removed

    def prune(self) -> None:
        """Full reset (api/v1/prune): drop every table including the ledger
        and ingest/run state."""
        for t in ("nodes", "edges", "embeddings", "ledger", "data", "pipeline_runs", "processed_hashes"):
            self.fs.delete(self._path(t))

    # -- FEEDBACK weight mutation --------------------------------------------

    def apply_feedback_weight(self, node_ids: list[str], weight: int) -> None:
        """Add ``weight`` to the feedback_weight property of every
        used_graph_element_to_answer edge pointing at ``node_ids``
        (kuzu adapter.py:1724-1760)."""
        with self._table_lock("edges"):
            edges = self.load("edges")
            if edges is None:
                return
            if "properties" not in edges.columns:
                edges = edges.withColumn("properties", F.create_map().cast("map<string,string>"))
            target = (F.col("relationship_name") == "used_graph_element_to_answer") & F.col("dst").isin(node_ids)
            props = F.coalesce(F.col("properties"), F.create_map().cast("map<string,string>"))
            current = F.coalesce(F.element_at(props, "feedback_weight").cast("double"), F.lit(0.0))
            updated_props = F.map_concat(
                F.map_filter(props, lambda k, _: k != F.lit("feedback_weight")),
                F.create_map(F.lit("feedback_weight"), (current + weight).cast("string")),
            )
            out = edges.withColumn("properties", F.when(target, updated_props).otherwise(F.col("properties")))
            self._swap_write("edges", out)
        self.append_ledger(
            "apply_feedback_weight",
            self.spark.createDataFrame([(i,) for i in node_ids], ["id"]),
            "user_qa_feedback",
        )


def flatten_edge_weights(edges: DataFrame) -> DataFrame:
    """Edge weight model: scalar ``weight`` + named multi-weights become
    ``weight_<name>`` properties (Edge.py:5-26 flattened at
    expand_with_nodes_and_edges.py:53-74).  Input may carry ``weight`` double
    and/or ``weights`` map<string,double>; output folds both into the
    string-typed properties map."""
    empty = F.create_map().cast("map<string,string>")
    props = F.coalesce(F.col("properties"), empty) if "properties" in edges.columns else empty
    drop = []
    if "weight" in edges.columns:
        props = F.when(
            F.col("weight").isNotNull(),
            F.map_concat(props, F.create_map(F.lit("weight"), F.col("weight").cast("string"))),
        ).otherwise(props)
        drop.append("weight")
    if "weights" in edges.columns:
        named = F.transform_values(
            F.coalesce(F.col("weights"), F.create_map().cast("map<string,double>")), lambda _, v: v.cast("string")
        )
        named = F.transform_keys(named, lambda k, _: F.concat(F.lit("weight_"), k))
        props = F.map_concat(props, named)
        drop.append("weights")
    return edges.withColumn("properties", props).drop(*drop)
