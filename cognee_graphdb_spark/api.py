"""Top-level API mirroring the reference's entry points (SURVEY.md §3):
``add`` → ``cognify`` → ``search(SearchType, ...)`` plus ``delete``/``prune``.

A user of the reference drives it as::

    await cognee.add(texts); await cognee.cognify()
    await cognee.search(query_type=SearchType.GRAPH_COMPLETION, query_text=q)

Here the same lifecycle is synchronous Spark jobs over a persistent
:class:`GraphStore`::

    engine = CogneeSpark(spark, "/data/store")
    engine.add([("a.txt", "....")])
    engine.cognify()
    engine.search("GRAPH_COMPLETION", "what relates to spark?")

Every search type routes through plans/search_types.py; ``only_context=True``
returns the retrieval half without the completion, exactly as the reference's
``get_context`` tools (search.py:339-340).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cognee_graphdb_spark.llm.gateway import MockLLMGateway
from cognee_graphdb_spark.sources.ingest import PipelineRuns, ingest_texts
from cognee_graphdb_spark.sources.sinks import GraphStore

# cluster_embeddings' exact ε-pair path (lsh_bits=0) is a blocked cross
# join — the same scale class as the exact all-pairs CALL procedures
# (plans/cypher.py:_guard_exact_all_pairs), and this verb is HTTP/MCP-
# adjacent, so the guard is structural: refuse above the row budget,
# naming lsh_bits as the scale path and the opt-in conf.
_EXACT_PAIRS_ROW_BUDGET = 50_000
_EXACT_PAIRS_OPT_IN = "spark.cognee.cluster.allowExactPairs"

SEARCH_TYPES = (
    "CHUNKS", "SUMMARIES", "RAG_COMPLETION", "GRAPH_COMPLETION",
    "GRAPH_SUMMARY_COMPLETION", "GRAPH_COMPLETION_COT",
    "GRAPH_COMPLETION_CONTEXT_EXTENSION", "INSIGHTS", "TEMPORAL",
    "CHUNKS_LEXICAL", "CYPHER", "NATURAL_LANGUAGE", "CODE", "FEEDBACK",
    "FEELING_LUCKY", "CODING_RULES",
)


class CogneeSpark:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        dataset_id: str = "main_dataset",
        gateway: MockLLMGateway | None = None,
        embed_dim: int = 64,
    ):
        self.spark = spark
        from cognee_graphdb_spark.session import ship_package

        ship_package(spark)  # embed/chunk stages must import this package on executors
        self.store = GraphStore(spark, root)
        self.runs = PipelineRuns(spark, root)
        self.dataset_id = dataset_id
        self.gateway = gateway or MockLLMGateway()
        self.embed_dim = embed_dim
        from cognee_graphdb_spark.sources.permissions import PermissionStore

        self.permissions = PermissionStore(spark, root)

    # -- lifecycle -----------------------------------------------------------

    def add(
        self, items: list[tuple[str, str]], node_set: str | None = None, user_id: str | None = None
    ) -> DataFrame:
        """S1 — ingest (name, text) items; returns the Data rows (deduped by
        content hash, so re-adding is a no-op).  ``node_set`` tags the items
        for NodeSet-scoped retrieval (ingest_data.py:117-118): cognify links
        their document nodes ``belongs_to`` the set.  ``user_id`` enforces the
        ACL: ingest requires ``write`` on the dataset, deny by default
        (check_permission_on_dataset; the reference gates its pipelines the
        same way, cognify.py:259-278)."""
        if user_id is not None:
            self.permissions.check_permission(user_id, self.dataset_id, "write")
        data = ingest_texts(self.spark, items, dataset_id=self.dataset_id)
        # cast: lit(None) alone is a NullType (void) column — rejected by other
        # engines' parquet readers and unstable under later schema unions
        data = data.withColumn("node_set", F.lit(node_set).cast("string"))
        self.store.upsert_data(data)
        return data

    def cognify(
        self, incremental: bool = True, temporal: bool = False, user_id: str | None = None
    ) -> int:
        """Build the graph from unprocessed Data rows.  Returns the number of
        documents processed (0 when incremental skip applies — ST2).
        ``user_id`` requires ``write`` on the dataset
        (check_permissions_on_dataset in the reference's cognify task list)."""
        if user_id is not None:
            self.permissions.check_permission(user_id, self.dataset_id, "write")
        pipeline = "cognify_temporal" if temporal else "cognify"
        data = self.store.load("data")
        if data is None:
            return 0
        if "dataset_id" in data.columns:
            # only THIS dataset's rows: with several engines over one store,
            # another dataset's backlog must not leak into this graph
            data = data.filter(F.col("dataset_id").eqNullSafe(self.dataset_id))
        fresh = self.runs.unprocessed(data) if incremental else data
        n = fresh.count()
        if n == 0:
            return 0
        self.runs.log(self.dataset_id, pipeline, "STARTED")
        docs = fresh.select(F.col("id").alias("doc_id"), "text")
        if temporal:
            from cognee_graphdb_spark.plans.temporal_graph import cognify_temporal

            tg = cognify_temporal(docs, gateway=self.gateway, embed_dim=self.embed_dim)
            nodes, edges, embeddings = tg.nodes, tg.edges, tg.embeddings
            shared_upstream = getattr(tg, "extracted", None)
        else:
            from cognee_graphdb_spark.plans.cognify import cognify_documents

            res = cognify_documents(docs, gateway=self.gateway, embed_dim=self.embed_dim)
            nodes, edges, embeddings = res.nodes, res.edges, res.embeddings
            shared_upstream = res.extracted
        # NodeSet tagging: doc nodes belongs_to their set (node_set.py model)
        if "node_set" in fresh.columns:
            from cognee_graphdb_spark.ids import content_id

            tagged = fresh.filter(F.col("node_set").isNotNull())
            set_nodes = tagged.select(F.col("node_set").alias("name")).distinct().select(
                content_id(F.lit("NodeSet"), "name").alias("id"), "name", F.lit("NodeSet").alias("type")
            )
            set_edges = tagged.select(
                F.concat(F.lit("doc:"), F.col("id")).alias("src"),
                content_id(F.lit("NodeSet"), "node_set").alias("dst"),
                F.lit("belongs_to").alias("relationship_name"),
            )
            nodes = nodes.unionByName(set_nodes, allowMissingColumns=True)
            edges = edges.unionByName(set_edges, allowMissingColumns=True)
        # dataset_id on every row: multi-tenancy as partition pruning, not
        # DB-per-dataset context switching (search.py:322)
        nodes = nodes.withColumn("dataset_id", F.lit(self.dataset_id))
        edges = edges.withColumn("dataset_id", F.lit(self.dataset_id))
        embeddings = embeddings.withColumn("dataset_id", F.lit(self.dataset_id))
        # the three tables are independent snapshot writes (per-table dirs +
        # pointers; ledger appends serialized by GraphStore's lock), so run
        # them as concurrent Spark jobs — the reference pipelines its
        # add_data_points / index_data_points writes the same way
        # (cognify.py:259-278).  Force the shared cached extract stage first
        # so concurrent first-touch can't run the Python stage three times.
        from concurrent.futures import ThreadPoolExecutor

        if shared_upstream is not None:
            shared_upstream.count()
        with ThreadPoolExecutor(max_workers=3) as pool:
            futures = [
                pool.submit(self.store.upsert_nodes, nodes, pipeline),
                pool.submit(self.store.upsert_edges, edges, pipeline),
                pool.submit(self.store.upsert_embeddings, embeddings, pipeline),
            ]
            for f in futures:
                f.result()
        self.runs.mark_processed(fresh)
        self.runs.log(self.dataset_id, pipeline, "COMPLETED")
        return n

    def delete(self, document_id: str, mode: str = "soft", user_id: str | None = None) -> int:
        """Cascade-delete a document (api/v1/delete/delete.py:95-244): removes
        its graph subtree (J7), the Data row, and its processed-hash entry so
        re-adding the same content re-processes.

        Accepts the name passed to ``add``, the content-derived Data row id,
        or the ``doc:<id>`` node id (ingest content-addresses ids, so the
        user-visible handle is the name).

        ``mode="hard"`` additionally removes graph-wide degree-one Entity and
        EntityType nodes after the cascade (delete.py:248-263) — the leftover
        leaves the soft cascade keeps for other documents' sake.

        ``user_id`` enforces the ACL: requires ``delete`` on the dataset,
        deny by default."""
        if mode not in ("soft", "hard"):
            raise ValueError(f"unsupported delete mode {mode!r}")
        if user_id is not None:
            self.permissions.check_permission(user_id, self.dataset_id, "delete")
        data = self.store.load("data")
        data_ids: list[str] = []
        if data is not None:
            bare = document_id.removeprefix("doc:")
            hits = data.filter((F.col("name") == bare) | (F.col("id") == bare))
            if "dataset_id" in data.columns:
                hits = hits.filter(F.col("dataset_id").eqNullSafe(self.dataset_id))
            data_ids = [r["id"] for r in hits.select("id").collect()]
        node_ids = [f"doc:{i}" for i in data_ids] or [
            document_id if document_id.startswith("doc:") else f"doc:{document_id}"
        ]
        deleted = sum(self.store.delete_document(nid, dataset_id=self.dataset_id) for nid in node_ids)
        hashes = self.store.delete_data(data_ids, created_by="delete", dataset_id=self.dataset_id)
        # processed marks are per dataset (PipelineRuns.mark_processed):
        # forgetting THIS dataset's marks never touches another dataset that
        # holds the same content.  For LEGACY hash-only marks, rows whose
        # content another dataset still holds survive (the remaining data
        # rows after the scoped delete ARE exactly those references).
        keep = None
        data_after = self.store.load("data")
        if data_after is not None and hashes:
            keep = data_after.filter(F.col("content_hash").isin(hashes)).select("content_hash")
        self.runs.unmark_processed(hashes, dataset_id=self.dataset_id, keep_legacy_for=keep)
        if mode == "hard":
            from cognee_graphdb_spark.operators.aggregations import degree_one_nodes

            nodes, edges = self.store.load("nodes"), self.store.load("edges")
            if nodes is not None and edges is not None:
                if "dataset_id" in nodes.columns:
                    nodes = nodes.filter(F.col("dataset_id").eqNullSafe(self.dataset_id))
                if "dataset_id" in edges.columns:
                    edges = edges.filter(F.col("dataset_id").eqNullSafe(self.dataset_id))
                leaves = (
                    degree_one_nodes(nodes, edges, "Entity")
                    .unionByName(degree_one_nodes(nodes, edges, "EntityType"))
                    .select("id")
                    .localCheckpoint(eager=True)
                )
                n_leaves = leaves.count()
                if n_leaves:
                    self.store.delete_nodes(leaves, created_by="delete_hard", dataset_id=self.dataset_id)
                deleted += n_leaves
        return deleted

    def prune(self) -> None:
        self.store.prune()

    def sync(
        self,
        remote_root: str,
        direction: str = "both",
        run_cognify: bool = True,
        user_id: str | None = None,
    ) -> dict:
        """Sync THIS dataset's raw data with another store root — the
        reference's cloud sync (api/v1/sync/sync.py: diff local vs remote
        files by content hash, upload the missing ones, download the new
        ones, then cognify what arrived), re-expressed store-to-store: the
        remote root is any Hadoop URI (s3a://, hdfs://, file://), the hash
        diff is two anti-joins, and transfer is a distributed MERGE upsert
        into the other store — no driver-side file loop.

        ``direction``: ``push`` / ``pull`` / ``both``.  ``run_cognify=True``
        builds the graph for pulled data locally (incremental marks make it
        a no-op when nothing arrived), mirroring sync.py's post-download
        cognify.  Progress lands in the pipeline-run log on both sides
        (operation ``sync``, the reference's sync_operation record).
        Returns {"run_id", "pushed", "pulled", "cognified"}."""
        import uuid as _uuid

        if direction not in ("push", "pull", "both"):
            raise ValueError("direction must be push, pull, or both")
        if user_id is not None:
            self.permissions.check_permission(user_id, self.dataset_id, "write")
        run_id = f"sync-{_uuid.uuid4().hex[:12]}"
        remote = CogneeSpark(
            self.spark, remote_root, dataset_id=self.dataset_id,
            gateway=self.gateway, embed_dim=self.embed_dim,
        )
        self.runs.log(self.dataset_id, "sync", "STARTED")

        def _dataset_rows(engine: "CogneeSpark") -> DataFrame | None:
            data = engine.store.load("data")
            if data is None:
                return None
            if "dataset_id" in data.columns:
                data = data.filter(F.col("dataset_id") == self.dataset_id)
            return data

        pushed = pulled = cognified = 0
        local = _dataset_rows(self)
        rmt = _dataset_rows(remote)
        if direction in ("push", "both") and local is not None:
            to_push = (
                local.join(rmt.select("content_hash"), "content_hash", "left_anti")
                if rmt is not None
                else local
            ).localCheckpoint(eager=True)
            pushed = to_push.count()
            if pushed:
                remote.store.upsert_data(to_push, created_by=run_id)
            rmt = _dataset_rows(remote)
        if direction in ("pull", "both") and rmt is not None:
            to_pull = (
                rmt.join(local.select("content_hash"), "content_hash", "left_anti")
                if local is not None
                else rmt
            ).localCheckpoint(eager=True)
            pulled = to_pull.count()
            if pulled:
                self.store.upsert_data(to_pull, created_by=run_id)
                if run_cognify:
                    cognified = self.cognify()
        self.runs.log(self.dataset_id, "sync", "COMPLETED")
        remote.runs.log(self.dataset_id, "sync", "COMPLETED")
        return {"run_id": run_id, "pushed": pushed, "pulled": pulled, "cognified": cognified}

    def maintain(self, target_file_bytes: int = 128 * 1024 * 1024) -> dict:
        """Store maintenance in one call: compact small snapshot files
        toward ``target_file_bytes``, reclaim superseded versions, and
        return before/after :meth:`GraphStore.table_stats`.  The reference's
        embedded DBs compact internally; a parquet snapshot store must do it
        as an explicit (schedulable) job — at corpus scale, file count
        bounds scan task count and object-store LIST cost."""
        before = self.store.table_stats()
        compacted = self.store.compact(target_file_bytes)
        self.store.vacuum()
        return {"before": before, "compacted": compacted, "after": self.store.table_stats()}

    # -- dataset management (api/v1/datasets/datasets.py) ---------------------

    def list_datasets(self, user_id: str | None = None) -> list[str]:
        """Dataset ids present in the store (list_datasets); with ``user_id``,
        only those the user may read — the authorized_search resolution.

        Ids are the UNION of the data and nodes tables plus live run-logged
        datasets: a dataset populated only through cypher_write/upsert_nodes
        (graph rows, no Data rows) is visible here exactly as search and
        delete_dataset see it."""
        ids: set[str] = set()
        for table in ("data", "nodes"):
            df = self.store.load(table)
            if df is not None and "dataset_id" in df.columns:
                ids.update(
                    r["dataset_id"]
                    for r in df.select("dataset_id").distinct().collect()
                    if r["dataset_id"] is not None
                )
        # run-logged datasets (tombstoned ones already filtered by statuses)
        ids.update(self.runs.statuses(None).keys())
        found = sorted(ids)
        if user_id is not None:
            allowed = set(self.permissions.authorized_datasets(user_id, "read"))
            found = [d for d in found if d in allowed]
        return found

    def list_data(self, dataset_id: str | None = None) -> DataFrame | None:
        """The Data rows of one dataset (list_data); defaults to this
        engine's dataset."""
        data = self.store.load("data")
        if data is None:
            return None
        ds = self.dataset_id if dataset_id is None else dataset_id
        if "dataset_id" not in data.columns:
            # legacy table without dataset tags: we cannot scope, and
            # returning every tenant's rows for a named dataset would leak —
            # empty, like list_datasets' [] for the same case
            return data.limit(0)
        return data.filter(F.col("dataset_id").eqNullSafe(ds))

    def dataset_status(
        self, dataset_ids: list[str] | None = None, user_id: str | None = None
    ) -> dict[str, str]:
        """Latest cognify pipeline status per dataset (get_status) — both
        the plain and temporal cognify pipelines count as processed.

        With ``user_id``, the result covers only datasets the user may read
        (the reference's authorized get_status) — without the gate, any
        caller could enumerate the existence and pipeline state of every
        tenant's datasets that list_datasets(user_id) would hide."""
        statuses = self.runs.statuses(dataset_ids)
        if user_id is not None:
            allowed = set(self.permissions.authorized_datasets(user_id, "read"))
            statuses = {d: s for d, s in statuses.items() if d in allowed}
        return statuses

    def delete_dataset(self, dataset_id: str, user_id: str | None = None) -> dict[str, int]:
        """Remove a whole dataset across every table (delete_dataset), plus
        its run-log rows, its processed marks (scoped — other datasets'
        marks for the same content survive), and its permission grants (a
        future dataset reusing the name must not inherit the old ACL).
        ``user_id`` requires ``delete`` on that dataset."""
        if user_id is not None:
            self.permissions.check_permission(user_id, dataset_id, "delete")
        data = self.store.load("data")
        if data is not None and "dataset_id" in data.columns:
            # the whole hash SET stays a DataFrame — never collected, the
            # forget is a distributed join (a dataset can hold 10^8 docs);
            # other datasets' references protect legacy hash-only marks
            mine = data.filter(F.col("dataset_id").eqNullSafe(dataset_id))
            others = data.filter(~F.col("dataset_id").eqNullSafe(dataset_id))
            self.runs.unmark_processed(
                mine.select("content_hash").distinct(),
                dataset_id=dataset_id,
                keep_legacy_for=others.select("content_hash"),
            )
        removed = self.store.delete_dataset(dataset_id)
        self.runs.forget_dataset(dataset_id)
        self.permissions.revoke_dataset(dataset_id)
        return removed

    def share_dataset(
        self,
        granter_id: str,
        grantee_id: str,
        dataset_id: str | None = None,
        permission: str = "read",
    ) -> None:
        """A ``share``-holder grants ``grantee_id`` (a user or role principal)
        access to the dataset — deny by default for granters without
        ``share`` (the reference's share flow,
        cognee/modules/users/permissions/methods/).  Defaults to this
        engine's dataset."""
        self.permissions.share_dataset(
            granter_id,
            grantee_id,
            self.dataset_id if dataset_id is None else dataset_id,
            permission,
        )

    def cypher_write(self, query: str, params: dict | None = None, user_id: str | None = None) -> dict:
        """Execute a write-Cypher statement against the store — the three
        shapes the reference's adapters issue internally (batch node MERGE,
        endpoint-matched edge MERGE, DETACH DELETE; kuzu/adapter.py:428-442,
        711-725, 737-755).  The CYPHER *search type* stays read-only, matching
        cypher_search_retriever.py.  ``user_id`` enforces the ACL: DETACH
        DELETE needs ``delete``, everything else ``write``."""
        from cognee_graphdb_spark.plans.cypher_write import classify_cypher_write, run_cypher_write

        if user_id is not None:
            # classification runs on the TOKEN stream (comments stripped), so
            # it cannot diverge from what the parser executes
            self.permissions.check_permission(user_id, self.dataset_id, classify_cypher_write(query))
        return run_cypher_write(self.store, query, params, dataset_id=self.dataset_id)

    def visualize(self, destination_file_path: str | None = None, max_nodes: int = 200) -> str:
        """api/v1/visualize: render the stored graph (degree-ranked sample) to
        self-contained HTML; writes the file when a path is given."""
        from cognee_graphdb_spark.plans.visualize import visualize_graph

        nodes, edges = self.store.load("nodes"), self.store.load("edges")
        if nodes is None or edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        return visualize_graph(nodes, edges, destination_file_path, max_nodes)

    def update(self, document_id: str, new_text: str, node_set: str | None = None) -> int:
        """api/v1/update/update.py: replace a document's content — cascade
        delete of the old subtree, re-add under the same name, re-cognify.
        Returns the number of documents re-processed (1 on success)."""
        data = self.store.load("data")
        name = document_id
        if data is not None:
            bare = document_id.removeprefix("doc:")
            hit = data.filter((F.col("name") == bare) | (F.col("id") == bare)).select("name").first()
            if hit is not None:
                name = hit["name"]
        self.delete(document_id)
        self.add([(name, new_text)], node_set=node_set)
        return self.cognify()

    def memify(
        self,
        node_type: str | None = None,
        node_names: list[str] | None = None,
        rules_nodeset_name: str = "coding_agent_rules",
    ) -> int:
        """Enrich the already-built graph (modules/memify/memify.py:28-120):
        extract the (optionally node_type/node_names-scoped) subgraph's chunk
        texts, derive developer rules through the gateway, and MERGE the new
        CodingRule nodes + belongs_to/rule_associated_from edges into the
        store.  Content-addressed rule ids make re-runs no-ops (the
        existing-rules dedup of coding_rule_associations.py:35-50 becomes an
        anti-join).  Returns the number of NEW rules added."""
        from cognee_graphdb_spark.plans.memify import (
            extract_rules_stage,
            extract_subgraph_chunks,
            rule_graph,
        )

        nodes, edges = self.store.load("nodes"), self.store.load("edges")
        if nodes is None or edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        chunks = extract_subgraph_chunks(nodes, edges, node_type, node_names)
        rules = extract_rules_stage(chunks, self.gateway).localCheckpoint(eager=True)
        r_nodes, r_edges = rule_graph(rules, rules_nodeset_name)
        new_rules = r_nodes.filter(F.col("type") == "CodingRule").join(
            nodes.select("id"), "id", "left_anti"
        )
        n_new = new_rules.count()
        self.runs.log(self.dataset_id, "memify_pipeline", "STARTED")
        from cognee_graphdb_spark.llm.embedder import embed_column

        r_nodes = r_nodes.withColumn("dataset_id", F.lit(self.dataset_id))
        r_edges = r_edges.withColumn("dataset_id", F.lit(self.dataset_id))
        self.store.upsert_nodes(r_nodes, created_by="memify_pipeline")
        self.store.upsert_edges(r_edges, created_by="memify_pipeline")
        rule_emb = (
            r_nodes.filter(F.col("type") == "CodingRule")
            .select(
                F.lit("CodingRule_text").alias("collection"),
                "id",
                F.col("name").alias("text"),
            )
            .withColumn("vector", embed_column("text", dim=self.embed_dim))
            .withColumn("dataset_id", F.lit(self.dataset_id))
        )
        self.store.upsert_embeddings(rule_emb, created_by="memify_pipeline")
        self.runs.log(self.dataset_id, "memify_pipeline", "COMPLETED")
        return n_new

    def metrics(self, include_paths: bool = False) -> dict:
        """A2 — descriptive graph metrics over the stored graph
        (the reference's get_graph_metrics endpoint)."""
        from cognee_graphdb_spark.operators.graph_metrics import graph_metrics

        nodes, edges = self.store.load("nodes"), self.store.load("edges")
        if nodes is None or edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        return graph_metrics(nodes, edges, include_paths=include_paths)

    def snapshot(self) -> dict:
        """Pin the store's current table versions (MVCC — free; the pins
        stay readable until ``maintain``'s vacuum).  Feed to
        :meth:`diff_since` to see how the memory graph evolved."""
        return self.store.snapshot()

    def diff_since(self, snap: dict) -> dict:
        """{table: {added, removed}} row deltas between a :meth:`snapshot`
        pin and the CURRENT store — the memory-evolution view (what did the
        last cognify/memify/delete actually change?).  Key-based anti-joins
        per table (the same MERGE keys the upsert seam uses), so a row
        UPDATED in place counts in neither column."""
        from cognee_graphdb_spark.sources.backends import TABLE_KEYS

        out: dict = {}
        for table, key in TABLE_KEYS.items():
            cur = self.store.load(table)
            old = self.store.load_snapshot(table, snap.get(table))
            if cur is None and old is None:
                out[table] = {"added": 0, "removed": 0}
                continue
            if cur is None or old is None:
                present = cur if cur is not None else old
                n = present.select(*key).distinct().count()
                out[table] = {
                    "added": n if cur is not None else 0,
                    "removed": n if old is not None else 0,
                }
                continue
            k_cur = cur.select(*key).distinct()
            k_old = old.select(*key).distinct()
            out[table] = {
                "added": k_cur.join(k_old, key, "left_anti").count(),
                "removed": k_old.join(k_cur, key, "left_anti").count(),
            }
        return out

    def refresh_pagerank(
        self,
        since: dict | None = None,
        damping: float = 0.85,
        n_iter: int = 50,
        tol: float = 1e-9,
    ) -> DataFrame:
        """(id, rank): always-current PageRank over the stored graph,
        maintained INCREMENTALLY from the store's own evolution pointer —
        the composition of :meth:`snapshot`/:meth:`diff_since` with
        ``streaming/pagerank.py``'s warm-started maintenance: only the edge
        DELTA since the last refresh enters the batch, and the solve
        warm-starts from the previous ranks, so the per-refresh round count
        tracks the size of the change, not the graph's mixing time.

        ``since`` optionally names a :meth:`snapshot` pin to diff against
        (the MVCC evolution pointer); the delta is always computed against
        the maintenance state's own edge ledger INTERSECTED with the pin —
        the pin can narrow what counts as "already folded" but never widen
        it, so an edge the ledger has never seen (added between the last
        refresh and the pin) still enters the batch.  Edge REMOVALS (delete/prune) can't fold
        into a union ledger, so they trigger an automatic cold rebuild
        (detected by an anti-join probe, state reset, full re-solve) —
        fail-safe, never silently stale."""
        import shutil

        from cognee_graphdb_spark.streaming.pagerank import pagerank_batch
        from cognee_graphdb_spark.streaming.state import read_state

        edges = self.store.load("edges")
        if edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        cur = edges.select("src", "dst").distinct()
        state_path = os.path.join(self.store.root, "_streaming", "pagerank")
        ledger = read_state(self.spark, os.path.join(state_path, "edges"))
        batch = cur
        if ledger is not None:
            removed = ledger.join(cur, ["src", "dst"], "left_anti")
            if removed.limit(1).count() > 0:
                shutil.rmtree(state_path, ignore_errors=True)  # cold rebuild
            else:
                # The pin can only NARROW the ledger, never replace it: the
                # maintenance state may be older than the pin, and an edge
                # in the pin but not the ledger has never entered the
                # solve — diffing against the raw pin would exclude it
                # forever (silently stale ranks).  Anti-joining against
                # ledger ∩ pin keeps every ledger-unknown edge in the
                # batch.
                base = ledger
                if since is not None:
                    old = self.store.load_snapshot("edges", since.get("edges"))
                    if old is not None:
                        base = ledger.join(
                            old.select("src", "dst").distinct(),
                            ["src", "dst"],
                            "left_semi",
                        )
                batch = cur.join(base, ["src", "dst"], "left_anti")
        return pagerank_batch(
            batch, state_path, damping=damping, n_iter=n_iter, tol=tol
        )

    def refresh_embeddings(self, dim: int = 16, seed: int = 3) -> int:
        """Always-current FastRP graph embeddings (the ``Entity_graph``
        collection), maintained INCREMENTALLY — the :meth:`refresh_pagerank`
        pattern applied to embeddings, with a stronger property: a FastRP
        embedding depends ONLY on the node's K-hop neighborhood (K = the
        producer's three averaging rounds; no global term like pagerank's
        dangling mass), so an edge change — add OR remove, no cold-rebuild
        case — can only move embeddings inside the K-hop ball around the
        changed edges' endpoints.  Precisely: with A = the endpoints whose
        neighbor SET changed, a value change propagates one new-graph hop
        per averaging round, so embeddings move exactly on ball_{K-1}(A);
        and x_k restricted to a subgraph is exact on nodes whose k-hop
        ball lies inside it, so recomputing on ball_{2K-1}(A) with edges
        restricted to it is exact on the whole moved set.  The refresh
        diffs the stored edge set against its own ledger, recomputes that
        ball, upserts exactly ball_{K-1}(A)'s rows, and DROPS rows for
        nodes that no longer embed (lost every edge) — never silently
        stale.  Work per refresh tracks the change's neighborhood size,
        never |V|.  A dim/seed change forces a full re-embed (parameter
        state is ledgered too).  Returns the number of rows re-embedded
        (0 = no change)."""
        import shutil

        from cognee_graphdb_spark.operators.graph_joins import k_hop
        from cognee_graphdb_spark.operators.node_embeddings import fastrp_embeddings
        from cognee_graphdb_spark.streaming.state import read_state, swap_write

        K = 3  # fastrp_embeddings' default (0, 1, 1) weights = 3 rounds
        edges = self.store.load("edges")
        if edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        cur = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
        state_dir = os.path.join(self.store.root, "_streaming", "fastrp")
        edge_state = os.path.join(state_dir, "edges")
        param_state = os.path.join(state_dir, "params")

        def _commit_state() -> None:
            swap_write(cur, edge_state, ".fastrp_edges_")
            swap_write(
                self.spark.createDataFrame([(dim, seed)], "dim int, seed int"),
                param_state, ".fastrp_params_",
            )

        ledger = read_state(self.spark, edge_state)
        params = read_state(self.spark, param_state)
        stale_params = params is None or [
            (r["dim"], r["seed"]) for r in params.collect()
        ] != [(dim, seed)]
        if ledger is None or stale_params:
            if ledger is not None:
                shutil.rmtree(state_dir, ignore_errors=True)
            n = self.embed_graph(dim=dim, seed=seed, method="fastrp")
            _commit_state()
            return n
        added = cur.join(ledger, ["src", "dst"], "left_anti")
        removed = ledger.join(cur, ["src", "dst"], "left_anti")
        delta = added.unionByName(removed)
        nodes_now = self.store.load("nodes").select("id").distinct()
        changed = (
            delta.select(F.col("src").alias("id"))
            .unionByName(delta.select(F.col("dst").alias("id")))
            .distinct()
            # nodes deleted outright had their vector rows cascaded away by
            # delete_nodes already; only still-present nodes need new values
            .join(nodes_now, "id", "left_semi")
            .localCheckpoint(eager=True)
        )
        if changed.limit(1).count() == 0:
            _commit_state()
            return 0
        und = cur.withColumn("relationship_name", F.lit("_"))
        # every node whose value can move: one new-graph hop of propagation
        # per averaging round beyond the changed-neighbor-set nodes
        moved = k_hop(und, changed, K - 1, direction="both")
        # exact recomputation needs each moved node's full K-hop ball
        ball = k_hop(und, moved, K, direction="both")
        sub = cur.join(
            ball.withColumnRenamed("id", "src"), "src", "left_semi"
        ).join(ball.withColumnRenamed("id", "dst"), "dst", "left_semi")
        emb = fastrp_embeddings(ball, sub, dim=dim, seed=seed).join(
            moved, "id", "left_semi"
        )
        endpoints = (
            cur.select(F.col("src").alias("id"))
            .unionByName(cur.select(F.col("dst").alias("id")))
            .distinct()
        )
        up = emb.join(endpoints, "id", "left_semi").localCheckpoint(eager=True)
        gone = moved.join(endpoints, "id", "left_anti")
        rows = up.select(
            F.lit("Entity_graph").alias("collection"),
            F.col("id").cast("string").alias("id"),
            F.lit(None).cast("string").alias("text"),
            F.col("embedding").cast("array<float>").alias("vector"),
            F.create_map(F.lit("source"), F.lit("fastrp")).alias("payload"),
            F.lit(self.dataset_id).alias("dataset_id"),
        )
        self.store.upsert_embeddings(rows, created_by="refresh_embeddings")
        if gone.limit(1).count() > 0:
            self.store.delete_embeddings(
                gone, "Entity_graph", created_by="refresh_embeddings"
            )
        _commit_state()
        self.runs.log(self.dataset_id, "refresh_embeddings", "COMPLETED")
        return up.count()

    def community_quality(
        self, labels: DataFrame | None = None, algorithm: str = "louvain"
    ) -> DataFrame:
        """Per-community quality of a clustering of the stored graph — the
        gds community-metrics pair side by side: exact-integer Newman
        modularity contributions (graph_metrics.py:modularity) joined with
        boundary/volume conductance (:func:`conductance`).  ``labels`` is
        any (id, label) frame; when omitted, :meth:`communities` runs
        ``algorithm`` first."""
        from cognee_graphdb_spark.operators.graph_metrics import (
            conductance,
            modularity,
        )

        edges = self.store.load("edges")
        if edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        if labels is None:
            labels = self.communities(algorithm=algorithm)
        q = modularity(edges, labels).select(
            "label", "n_nodes", "sym_within", "total_degree", "contrib_scaled"
        )
        phi = conductance(edges, labels).select(
            "label", "internal", "boundary", "conductance_ppm"
        )
        return q.join(phi, "label")

    def strongly_connected(self) -> DataFrame:
        """(id, label): strongly connected components of the stored DIRECTED
        graph — gds.scc next to the wcc inside :meth:`metrics`
        (operators/graph_metrics.py:strongly_connected_components); label is
        the component's max node hash (deterministic, peel-order-invariant).
        """
        from cognee_graphdb_spark.operators.graph_metrics import (
            strongly_connected_components,
        )

        nodes, edges = self.store.load("nodes"), self.store.load("edges")
        if nodes is None or edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        return strongly_connected_components(nodes, edges)

    def centrality(self, algorithm: str = "pagerank", **params) -> DataFrame:
        """Centrality family over the stored graph — the GDS centralities
        the reference reaches through its metric surface (cognee reference
        neo4j_driver/neo4j_metrics_utils.py), as a verb next to
        :meth:`communities` / :meth:`strongly_connected`:

        - ``"pagerank"`` → (id, rank) (gds.pageRank,
          operators/graph_metrics.py:pagerank)
        - ``"eigenvector"`` → (id, score) (gds.eigenvector,
          :func:`eigenvector` — pure influence-sum centrality, no damping)
        - ``"articlerank"`` → (id, rank) (gds.articleRank,
          :func:`articlerank` — PageRank dampened by the average out-degree
          so short reference lists stop dominating)
        - ``"hits"`` → (id, hub, authority) (gds.hits, :func:`hits` —
          previously CALL-only; the hub/authority split the memory graph's
          curated-hub vs pointed-at-entity roles need)
        - ``"harmonic"`` → (id, h_scaled, closeness) (sampled HyperANF
          harmonic closeness, :func:`approx_harmonic_closeness` — the
          100 TB-honest closeness; the exact all-pairs variant lives only
          behind the CALL surface's scale guard)
        - ``"betweenness"`` → (node, betweenness) (source-sampled Brandes,
          :func:`betweenness_sampled`; ``n_sources`` picks the
          deterministic lowest-hash sample, default 16).  The accumulated
          deltas are unbiased by V/|sources| and halved for the undirected
          convention, so values are comparable to ``gds.betweenness``
          (the CALL route's exact variant) and stable in expectation as
          ``n_sources`` changes

        Extra ``params`` forward to the operator (``n_iter``, ``damping``,
        ``n_rounds``, ``max_hops``, ...)."""
        from cognee_graphdb_spark.operators.graph_metrics import (
            approx_harmonic_closeness,
            articlerank,
            betweenness_sampled,
            eigenvector,
            hits,
            pagerank,
        )

        nodes, edges = self.store.load("nodes"), self.store.load("edges")
        if nodes is None or edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        algo = algorithm.lower()
        if algo == "pagerank":
            return pagerank(nodes.select("id"), edges, **params)
        if algo == "eigenvector":
            return eigenvector(nodes, edges, **params)
        if algo == "articlerank":
            return articlerank(nodes, edges, **params)
        if algo == "hits":
            return hits(nodes, edges, **params)
        if algo == "harmonic":
            return approx_harmonic_closeness(nodes, edges, **params)
        if algo == "betweenness":
            n_sources = int(params.pop("n_sources", 16))
            ids = nodes.select("id").distinct()
            # bounded probe: one count over the node ids, needed for the
            # V/|S| unbiasing factor (estimator comparability — r11 ADVICE)
            n_total = ids.count()
            n_eff = min(n_sources, n_total)
            sources = ids.orderBy(F.xxhash64("id"), "id").limit(n_sources)
            bt = betweenness_sampled(edges, sources, **params)
            scale = (float(n_total) / float(max(n_eff, 1))) / 2.0
            return bt.select(
                "node", (F.col("betweenness") * F.lit(scale)).alias("betweenness")
            )
        raise ValueError(
            f"unsupported centrality algorithm {algorithm!r} "
            "(pagerank, eigenvector, articlerank, hits, harmonic, betweenness)"
        )

    def cluster_embeddings(
        self,
        collection: str = "DocumentChunk_text",
        threshold: float = 0.8,
        min_pts: int = 4,
        lsh_bits: int = 0,
        algorithm: str = "dbscan",
        k: int = 8,
        n_iter: int = 5,
    ) -> DataFrame:
        """Clustering over one of the store's vector collections.

        ``algorithm="dbscan"`` (default) → (id, kind, cluster): density
        topic islands (operators/clustering.py:dbscan) — which chunks pile
        into dense near-duplicate topics (``core`` / ``border`` with a
        cluster label) and which are unique (``noise``).
        ``algorithm="kmeans"`` → (id, cluster, sim): deterministic
        spherical k-means partition into exactly ``k`` topics
        (operators/clustering.py:kmeans — gds.kmeans, SemDeDup's core;
        ``sim`` is the cosine to the assigned centroid).  k-means is a
        k-row broadcast assignment — never all-pairs — so it needs no
        scale guard.

        ``lsh_bits=0`` is the EXACT ε-pair path — a blocked cross join by
        design, the same shape as the exact all-pairs CALL procedures —
        so it is scale-guarded exactly like them (r11 VERDICT #3): above
        ``_EXACT_PAIRS_ROW_BUDGET`` rows in the selected collection the
        verb refuses, naming ``lsh_bits`` as the bucketed scale path and
        the explicit opt-in conf
        (``spark.cognee.cluster.allowExactPairs``).  Fine at memory-store
        sizes; set ``lsh_bits`` for a 100× collection."""
        from cognee_graphdb_spark.operators.clustering import dbscan, kmeans
        from cognee_graphdb_spark.plans.cypher import GdsScaleGuard

        algo = algorithm.lower()
        if algo not in ("dbscan", "kmeans"):
            raise ValueError(
                f"unsupported clustering algorithm {algorithm!r} (dbscan, kmeans)"
            )
        embeddings = self.store.load("embeddings")
        if embeddings is None:
            raise RuntimeError("No data found in the system, please add data first.")
        sel = embeddings.filter(F.col("collection") == collection)
        if algo == "kmeans":
            return kmeans(
                sel, k=k, n_iter=n_iter, id_col="id", vector_col="vector"
            )
        if lsh_bits <= 0:
            opt_in = str(
                self.spark.conf.get(_EXACT_PAIRS_OPT_IN, "false")
            ).lower()
            if opt_in != "true":
                n = sel.count()
                if n > _EXACT_PAIRS_ROW_BUDGET:
                    raise GdsScaleGuard(
                        f"cluster_embeddings(lsh_bits=0) is the exact "
                        f"ε-pair path (O(n²/blocks) candidate pairs) and "
                        f"collection {collection!r} has {n} rows > budget "
                        f"{_EXACT_PAIRS_ROW_BUDGET}.  Pass lsh_bits>0 for "
                        f"the bucketed scale path, or opt in explicitly "
                        f"with spark.conf.set('{_EXACT_PAIRS_OPT_IN}', "
                        f"'true')."
                    )
        return dbscan(
            sel,
            threshold=threshold,
            min_pts=min_pts,
            id_col="id",
            vector_col="vector",
            lsh_bits=lsh_bits,
            dim=self.embed_dim if lsh_bits > 0 else None,
        )

    def spanning_forest(self, weight: str | None = None) -> DataFrame:
        """(src, dst, weight): minimum spanning forest of the stored graph —
        distributed Borůvka (operators/spanning.py, the gds.spanningTree
        family computed for every component at once).  ``weight`` names an
        edge column; without one every edge weighs 1.0 and the result is
        the graph's deterministic SKELETON (ties broken by hashed edge
        identity): the minimal edge set that keeps every connected node
        pair connected — what a visualization or a diameter-ish probe
        wants instead of the full edge soup."""
        from cognee_graphdb_spark.operators.spanning import minimum_spanning_forest

        edges = self.store.load("edges")
        if edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        if weight is None:
            edges = edges.select("src", "dst", F.lit(1.0).alias("weight"))
            weight = "weight"
        return minimum_spanning_forest(edges, weight_col=weight)

    def topological_layers(self, max_rounds: int = 200) -> DataFrame:
        """(id, layer): dependency layering of the stored DIRECTED graph —
        gds.dag.topologicalSort / gds.dag.longestPath in one result
        (operators/dag.py:topological_layers; layer = longest source->node
        path, (layer, id) is a topological order).  Raises ``ValueError``
        naming the stuck-node count when the stored graph has a cycle
        (extraction graphs with co_occurs backlinks will — the error is
        the answer, not a crash)."""
        from cognee_graphdb_spark.operators.dag import topological_layers

        nodes, edges = self.store.load("nodes"), self.store.load("edges")
        if nodes is None or edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        return topological_layers(nodes, edges, max_rounds=max_rounds)

    def communities(
        self,
        algorithm: str = "louvain",
        n_levels: int = 2,
        n_rounds: int = 3,
        refresh: bool = False,
    ) -> DataFrame:
        """(id, label): community detection over the stored graph — the GDS
        community family the reference reaches through its metric surface
        (gds.louvain / gds.leiden / gds.labelPropagation).  ``algorithm``
        picks ``"louvain"`` (modularity local moves + contraction,
        operators/graph_metrics.py:louvain), ``"leiden"`` (louvain plus the
        connectivity-refinement phase that keeps aggregated communities
        internally connected, :func:`leiden`), or ``"lpa"``
        (most-frequent-neighbor label rounds, :func:`label_propagation`);
        round/level counts are parameters of the result (deterministic
        contract).

        ``refresh=True`` (louvain only) maintains the labels INCREMENTALLY
        — the :meth:`refresh_pagerank` pattern (r11 VERDICT #8): only the
        edge delta since the last refresh enters the batch (diffed against
        the maintenance state's own ledger), the solve warm-starts from
        the previous labels, and edge REMOVALS trigger an automatic cold
        rebuild — fail-safe, never silently stale.  The warm result is a
        valid partition of the current graph whose quality tracks the cold
        one (modularity parity pytest-pinned); it is not byte-equal to a
        cold run in general."""
        from cognee_graphdb_spark.operators.graph_metrics import (
            label_propagation,
            leiden,
            louvain,
        )

        nodes, edges = self.store.load("nodes"), self.store.load("edges")
        if nodes is None or edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        algo = algorithm.lower()
        if refresh:
            import shutil

            from cognee_graphdb_spark.streaming.communities import louvain_batch
            from cognee_graphdb_spark.streaming.state import read_state

            if algo != "louvain":
                raise ValueError(
                    "communities(refresh=True) maintains louvain labels only "
                    "(the warm-start seam is the louvain local-move init)"
                )
            cur = edges.select("src", "dst").distinct()
            state_path = os.path.join(self.store.root, "_streaming", "communities")
            ledger = read_state(self.spark, os.path.join(state_path, "edges"))
            batch = cur
            if ledger is not None:
                removed = ledger.join(cur, ["src", "dst"], "left_anti")
                if removed.limit(1).count() > 0:
                    shutil.rmtree(state_path, ignore_errors=True)  # cold rebuild
                else:
                    batch = cur.join(ledger, ["src", "dst"], "left_anti")
            warm = louvain_batch(
                batch, state_path, n_levels=n_levels, n_rounds=n_rounds
            )
            # the maintenance state only knows edge-endpoint nodes; a cold
            # louvain labels EVERY stored node (isolated ones as their own
            # singleton) — keep the warm result's coverage identical so
            # toggling refresh never changes the id set, only the labels
            isolated = nodes.select("id").distinct().join(warm, "id", "left_anti")
            return warm.unionByName(
                # the cold operator's singleton convention: an isolated node
                # is its own community, labeled by its xxhash64
                isolated.withColumn("label", F.xxhash64("id"))
            )
        if algo == "louvain":
            return louvain(nodes, edges, n_levels=n_levels, n_rounds=n_rounds)
        if algo == "leiden":
            return leiden(nodes, edges, n_levels=n_levels, n_rounds=n_rounds)
        if algo == "lpa":
            return label_propagation(nodes, edges, n_rounds=n_rounds)
        raise ValueError(
            f"unsupported community algorithm {algorithm!r} (louvain, leiden, lpa)"
        )

    def shortest_paths(
        self,
        sources: list[str],
        weight_property: str | None = None,
        max_hops: int = 10,
        directed: bool = False,
        render: bool = True,
    ) -> DataFrame:
        """gds.shortestPath.dijkstra analogue over the stored graph (the
        reference reaches weighted paths through its GDS metric surface,
        neo4j_driver/neo4j_metrics_utils.py): weighted SSSP from the given
        source node ids, rendered as "source->...->node" strings when
        ``render`` (operators/paths.py:weighted_sssp + sssp_paths).

        ``weight_property`` names an edge ``properties`` entry to use as the
        cost (e.g. ``"feedback_weight"`` after FEEDBACK mutations); edges
        missing the property cost 1.  With no property every edge costs 1 —
        hop counts, the unweighted k-hop's weighted twin.  ``directed=False``
        is the GDS UNDIRECTED projection (the stored graph's default read
        shape everywhere else in the metric surface)."""
        from cognee_graphdb_spark.operators.paths import sssp_paths, weighted_sssp

        edges = self.store.load("edges")
        if edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        if weight_property is not None and "properties" in edges.columns:
            props = F.coalesce(
                F.col("properties"), F.create_map().cast("map<string,string>")
            )
            w = F.coalesce(
                F.element_at(props, weight_property).cast("double"), F.lit(1.0)
            )
        else:
            # no properties column yet (no FEEDBACK mutation has run) —
            # every edge costs 1, same as the missing-property default
            w = F.lit(1.0)
        weighted = edges.select("src", "dst", w.alias("weight"))
        src_df = self.spark.createDataFrame([(s,) for s in sources], ["id"])
        dists = weighted_sssp(
            weighted,
            src_df,
            max_hops=max_hops,
            directed=directed,
            return_pred=render,
        )
        if not render:
            return dists
        return sssp_paths(dists, max_hops=max_hops)

    def codify(self, repo_path: str) -> int:
        """The reference's MCP ``codify`` tool (cognee-mcp/src/server.py:
        393-452: run the code-graph pipeline over a repository path): read
        the repo's Python files distributed (recursive lookup + glob filter
        — partition-parallel, never a driver walk), build the code graph
        (U11 family, plans/code_graph.py:cognify_code) and persist
        nodes/edges/embeddings through the same S6/S7 MERGE seams cognify
        uses, so CODE search serves the result.  Returns the number of
        files processed; content-addressed ids make re-runs idempotent."""
        from cognee_graphdb_spark.plans.code_graph import cognify_code

        files = (
            self.spark.read.option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.py")
            .text(repo_path, wholetext=True)
            .select(F.input_file_name().alias("path"), F.col("value").alias("source"))
            # materialize once: cognify_code consumes the source in several
            # branches (file nodes, definitions, embeddings) and the count
            # below must not pay a second whole-repo read
            .localCheckpoint(eager=True)
        )
        n_files = files.count()
        if n_files == 0:
            raise ValueError(f"no Python files under {repo_path!r}")
        cg = cognify_code(files)
        nodes = cg.nodes.select(
            "id",
            "name",
            "type",
            F.create_map().cast("map<string,string>").alias("properties"),
            F.lit(self.dataset_id).alias("dataset_id"),
        )
        edges = cg.edges.withColumn("dataset_id", F.lit(self.dataset_id))
        emb = cg.embeddings.select(
            "collection",
            "id",
            "text",
            F.col("vector").cast("array<float>").alias("vector"),
            F.create_map(F.lit("source"), F.lit("codify")).alias("payload"),
            F.lit(self.dataset_id).alias("dataset_id"),
        )
        self.store.upsert_nodes(nodes, created_by="codify_pipeline")
        self.store.upsert_edges(edges, created_by="codify_pipeline")
        self.store.upsert_embeddings(emb, created_by="codify_pipeline")
        self.runs.log(self.dataset_id, "codify_pipeline", "COMPLETED")
        return n_files

    def embed_graph(
        self,
        dim: int = 16,
        walk_length: int = 4,
        num_walks: int = 4,
        window: int = 2,
        seed: int = 3,
        n_iter: int = 8,
        method: str = "sppmi",
    ) -> int:
        """Structural node embeddings from the STORED graph, persisted into
        the embeddings table as the ``Entity_graph`` collection through the
        S7 upsert seam, so graph vectors live next to text vectors and are
        served by the same V4/V6 operators.  They stay in their OWN
        collection: their dimension is ``dim``, not the text embedder's, so
        text-query scoring never mixes them in — :meth:`similar_nodes` (and
        any V6 fan-out naming the collection) is their query surface.

        ``method`` picks the producer (both deterministic, both on the GDS
        embedding surface the reference ecosystem ships as plugins):

        - ``"sppmi"`` (default): DeepWalk-family lifecycle — random walks ->
          skip-gram pairs -> SPPMI-SVD (operators/node_embeddings.py;
          gds.node2vec's matrix-factorization analogue).  ``walk_length``,
          ``num_walks``, ``window``, ``seed``, ``n_iter`` apply.
        - ``"fastrp"``: gds.fastRP (Chen et al. 2019) straight off the edge
          list — no walk corpus, so at scale it is the cheaper path: K
          equi-join averaging rounds instead of a walk + skip-gram shuffle
          chain.  ``seed`` applies; the walk knobs don't.

        Returns the number of nodes embedded; re-running upserts by
        (collection, id) — idempotent for an unchanged graph."""
        edges = self.store.load("edges")
        if edges is None:
            raise RuntimeError("No data found in the system, please add data first.")
        if method == "sppmi":
            from cognee_graphdb_spark.operators.graph_metrics import (
                random_walks,
                walk_skipgram_pairs,
            )
            from cognee_graphdb_spark.operators.node_embeddings import (
                sppmi_node_embeddings,
            )

            walks = random_walks(
                edges, walk_length=walk_length, num_walks=num_walks, seed=seed
            )
            vecs = sppmi_node_embeddings(
                walk_skipgram_pairs(walks, window=window), dim=dim, n_iter=n_iter
            ).localCheckpoint(eager=True)
        elif method == "fastrp":
            from cognee_graphdb_spark.operators.node_embeddings import (
                fastrp_embeddings,
            )

            ids = (
                edges.select(F.col("src").alias("id"))
                .unionByName(edges.select(F.col("dst").alias("id")))
                .distinct()
            )
            vecs = fastrp_embeddings(
                ids, edges, dim=dim, seed=seed
            ).localCheckpoint(eager=True)
        else:
            raise ValueError(
                f"unsupported embedding method {method!r} (sppmi, fastrp)"
            )
        rows = vecs.select(
            F.lit("Entity_graph").alias("collection"),
            F.col("id").cast("string").alias("id"),
            F.lit(None).cast("string").alias("text"),
            F.col("embedding").cast("array<float>").alias("vector"),
            F.create_map(
                F.lit("source"),
                F.lit("sppmi_walks" if method == "sppmi" else "fastrp"),
            ).alias("payload"),
            F.lit(self.dataset_id).alias("dataset_id"),
        )
        self.store.upsert_embeddings(rows, created_by="embed_graph")
        # a full embed (either producer) supersedes the incremental-refresh
        # ledger: leaving it would let a later refresh_embeddings warm-patch
        # fastrp vectors over an sppmi collection (silent producer mixing)
        # or diff against an edge set the collection no longer reflects.
        # Invalidating forces the next refresh to re-seed with a full
        # fastrp embed — conservative, never mixed.  (refresh_embeddings'
        # own full-embed path re-commits fresh state right after this.)
        import shutil

        shutil.rmtree(
            os.path.join(self.store.root, "_streaming", "fastrp"),
            ignore_errors=True,
        )
        self.runs.log(self.dataset_id, "embed_graph", "COMPLETED")
        return vecs.count()

    def similar_nodes(
        self, node_id: str, k: int = 5, collections: list[str] | None = None
    ) -> DataFrame:
        """Structurally similar entities: V4 point lookup of ``node_id``'s
        graph vector + V6 multi-collection fan-out over the graph-embedding
        collections :meth:`embed_graph` maintains — "which nodes play the
        same role in the graph", answered from the stored embeddings table
        (the walks -> vectors -> search loop, closed)."""
        from cognee_graphdb_spark.operators.vector_search import multi_collection_knn

        emb = self.store.load("embeddings")
        if emb is None:
            raise RuntimeError("No data found in the system, please add data first.")
        cols = collections or ["Entity_graph"]
        row = (
            emb.filter((F.col("collection") == cols[0]) & (F.col("id") == node_id))
            .select("vector")
            .first()
        )
        if row is None:
            raise ValueError(
                f"no graph embedding for node {node_id!r} — run embed_graph() first"
            )
        qv = [float(x) for x in row["vector"]]
        hits = multi_collection_knn(emb, qv, cols, k=k + 1)  # +1: the node itself
        return hits.filter(F.col("id") != node_id)

    def _log_query(self, query_type: str, query_text: str) -> str:
        """Query log row (search.py:61, modules/search/models/Query.py)."""
        import time

        from cognee_graphdb_spark.ids import py_content_id

        qid = py_content_id("query", query_type, query_text, time.time_ns())
        self.spark.createDataFrame(
            [(qid, query_type, query_text, int(time.time()))],
            ["id", "query_type", "query_text", "at"],
        ).write.mode("append").parquet(os.path.join(self.store.root, "queries"))
        return qid

    def _log_result(self, query_id: str, result_summary: str) -> None:
        """Result log row (search.py:99-113)."""
        import time

        self.spark.createDataFrame(
            [(query_id, result_summary[:500], int(time.time()))], ["query_id", "summary", "at"]
        ).write.mode("append").parquet(os.path.join(self.store.root, "results"))

    def query_log(self) -> DataFrame | None:
        p = os.path.join(self.store.root, "queries")
        return self.spark.read.parquet(p) if self.store.fs.exists(p) else None

    # -- search --------------------------------------------------------------

    def _ctx(self, dataset_ids: list[str] | None = None):
        from cognee_graphdb_spark.plans.search_types import GraphContext

        nodes = self.store.load("nodes")
        edges = self.store.load("edges")
        embeddings = self.store.load("embeddings")
        if nodes is None:
            raise RuntimeError("No data found in the system, please add data first.")
        # a graph written through cypher_write / upsert_nodes alone may have
        # no edges or vector index yet: graph-only search types (CYPHER,
        # INSIGHTS by exact node, NL) must still work; vector types see an
        # empty collection and return no hits
        if edges is None:
            edges = self.spark.createDataFrame(
                [], "src string, dst string, relationship_name string, dataset_id string"
            )
        if embeddings is None:
            embeddings = self.spark.createDataFrame(
                [], "collection string, id string, text string, vector array<float>, dataset_id string"
            )
        if dataset_ids is not None:
            # partition-pruned scan: dataset_id is the store's partition column
            nodes = nodes.filter(F.col("dataset_id").isin(dataset_ids))
            edges = edges.filter(F.col("dataset_id").isin(dataset_ids))
            embeddings = embeddings.filter(F.col("dataset_id").isin(dataset_ids))
        return GraphContext(
            nodes=nodes,
            edges=edges,
            embeddings=embeddings,
            gateway=self.gateway,
            embed_dim=self.embed_dim,
        )

    def search(
        self,
        query_type: str,
        query_text: str,
        top_k: int = 5,
        only_context: bool = False,
        save_interaction: bool = False,
        dataset_ids: list[str] | None = None,
        user_id: str | None = None,
        use_combined_context: bool = False,
        params: dict | None = None,
    ):
        """Dispatch to the search-type plans (get_search_type_tools.py:42-165).
        ``params`` carries CYPHER query parameters ($name placeholders).

        Completion types return str (or DataFrame context when
        ``only_context``); retrieval types return DataFrames.
        ``dataset_ids`` scopes retrieval to those datasets (the reference's
        authorized per-dataset fan-out becomes ONE partition-pruned plan).
        ``user_id`` resolves datasets from the ACL instead — deny by default,
        intersected with any explicit ``dataset_ids`` (authorized_search,
        search.py:184-285).

        ``use_combined_context=True`` mirrors search.py:211-268: retrieve
        top-k context PER permitted dataset (each retrieval is its own
        partition-pruned distributed plan; contexts are k-row/str small),
        concatenate the contexts, and generate ONE completion from the merged
        context.  Every call is logged (search.py:61,99)."""
        if user_id is not None:
            allowed = self.permissions.authorized_datasets(user_id, "read")
            if dataset_ids is not None:
                allowed = sorted(set(allowed) & set(dataset_ids))
            if not allowed:
                raise PermissionError(f"user {user_id!r} has no read permission on any requested dataset")
            dataset_ids = allowed
        qid = self._log_query(query_type, query_text)
        if use_combined_context:
            out = self._search_combined(
                query_type, query_text, top_k, only_context, dataset_ids, save_interaction
            )
        else:
            out = self._dispatch(
                query_type, query_text, top_k, only_context, save_interaction, dataset_ids, params
            )
        self._log_result(qid, out if isinstance(out, str) else f"<{type(out).__name__}>")
        return out

    def _search_combined(
        self,
        query_type: str,
        query_text: str,
        top_k: int,
        only_context: bool,
        dataset_ids: list[str] | None,
        save_interaction: bool = False,
    ):
        """Per-dataset context fan-out + combined-context completion
        (search.py:211-268, prepare_combined_context at :251-264).

        The reference iterates its permitted datasets because each lives in a
        separate graph DB; here each iteration is the same single plan pruned
        to one dataset partition, and the per-dataset contexts (k rows each,
        bounded) merge driver-side exactly as the reference joins its context
        strings."""
        qt = query_type.upper()
        if qt not in SEARCH_TYPES:
            raise ValueError(f"unsupported search type {query_type!r}")
        if dataset_ids is None:
            # no scoping requested: every dataset present in the store
            nodes = self.store.load("nodes")
            if nodes is None:
                raise RuntimeError("No data found in the system, please add data first.")
            if "dataset_id" in nodes.columns:
                dataset_ids = sorted(
                    r["dataset_id"] for r in nodes.select("dataset_id").distinct().collect() if r["dataset_id"]
                )
            else:
                dataset_ids = [self.dataset_id]
        if not dataset_ids:
            # explicit empty scoping, or a store whose rows carry no dataset
            # tags: nothing to search — same contract as an empty store
            raise RuntimeError("No data found in the system, please add data first.")
        if qt in ("GRAPH_COMPLETION", "GRAPH_SUMMARY_COMPLETION"):
            from cognee_graphdb_spark.plans import search_types as st
            from cognee_graphdb_spark.plans.triplet_search import render_triplets

            per_ds = [
                st.graph_completion_context(self._ctx([ds]), query_text, top_k) for ds in dataset_ids
            ]
            if only_context:
                out = per_ds[0]
                for extra in per_ds[1:]:
                    out = out.unionByName(extra)
                return out.dropDuplicates(["src", "dst", "relationship_name"])
            combined = "\n".join(render_triplets(t) for t in per_ds)
            if qt == "GRAPH_SUMMARY_COMPLETION":
                combined = self.gateway.extract_summary(combined)
            answer = self.gateway.complete(f"Answer {query_text!r} using:\n{combined}")
            if save_interaction:
                # the FEEDBACK loop must see combined-path answers too
                # (_dispatch saves the non-combined path the same way)
                from cognee_graphdb_spark.plans.feedback import save_interaction as _save

                used = per_ds[0]
                for extra in per_ds[1:]:
                    used = used.unionByName(extra)
                _save(self.store, self.spark, query_text, answer, used)
            return answer
        if qt in ("RAG_COMPLETION", "CHUNKS", "SUMMARIES", "CHUNKS_LEXICAL", "INSIGHTS"):
            from cognee_graphdb_spark.plans import search_types as st

            fetch = {
                "RAG_COMPLETION": lambda c: st.search_chunks(c, query_text, top_k),
                "CHUNKS": lambda c: st.search_chunks(c, query_text, top_k),
                "SUMMARIES": lambda c: st.search_summaries(c, query_text, top_k),
                "CHUNKS_LEXICAL": lambda c: st.lexical_chunks(c, query_text, top_k),
                "INSIGHTS": lambda c: st.insights(c, query_text, top_k),
            }[qt]
            per_ds = [fetch(self._ctx([ds])) for ds in dataset_ids]
            out = per_ds[0]
            for extra in per_ds[1:]:
                out = out.unionByName(extra, allowMissingColumns=True)
            if qt == "RAG_COMPLETION" and not only_context:
                context = "\n".join(r["text"] or "" for r in out.collect())
                return self.gateway.complete(f"Answer {query_text!r} using:\n{context}")
            return out
        raise ValueError(
            f"use_combined_context is not defined for search type {query_type!r} "
            "(reference combined-context covers the completion/retrieval family)"
        )

    def _dispatch(
        self,
        query_type: str,
        query_text: str,
        top_k: int,
        only_context: bool,
        save_interaction: bool,
        dataset_ids: list[str] | None,
        params: dict | None = None,
    ):
        from cognee_graphdb_spark.plans import search_types as st

        ctx = self._ctx(dataset_ids)
        qt = query_type.upper()
        if qt not in SEARCH_TYPES:
            raise ValueError(f"unsupported search type {query_type!r}")
        if qt == "CHUNKS":
            return st.search_chunks(ctx, query_text, top_k)
        if qt == "SUMMARIES":
            return st.search_summaries(ctx, query_text, top_k)
        if qt == "RAG_COMPLETION":
            if only_context:
                return st.search_chunks(ctx, query_text, top_k)
            return st.rag_completion(ctx, query_text)
        if qt == "GRAPH_COMPLETION":
            if only_context:
                return st.graph_completion_context(ctx, query_text, top_k)
            triplets = st.graph_completion_context(ctx, query_text, top_k)
            from cognee_graphdb_spark.plans.triplet_search import render_triplets

            answer = ctx.gateway.complete(f"Answer {query_text!r} using:\n{render_triplets(triplets)}")
            if save_interaction:
                from cognee_graphdb_spark.plans.feedback import save_interaction as _save

                _save(self.store, self.spark, query_text, answer, triplets)
            return answer
        if qt == "GRAPH_SUMMARY_COMPLETION":
            return st.graph_summary_completion(ctx, query_text, top_k)
        if qt == "GRAPH_COMPLETION_COT":
            answer, triplets = st.graph_completion_cot(ctx, query_text, top_k)
            return triplets if only_context else answer
        if qt == "GRAPH_COMPLETION_CONTEXT_EXTENSION":
            answer, triplets = st.graph_completion_context_extension(ctx, query_text, top_k)
            return triplets if only_context else answer
        if qt == "INSIGHTS":
            return st.insights(ctx, query_text, top_k)
        if qt == "TEMPORAL":
            return st.temporal_context(ctx, query_text, top_k)
        if qt == "CHUNKS_LEXICAL":
            return st.lexical_chunks(ctx, query_text, top_k)
        if qt == "CYPHER":
            return st.cypher_search(self.spark, ctx, query_text, params)
        if qt == "NATURAL_LANGUAGE":
            return st.natural_language_search(self.spark, ctx, query_text)
        if qt == "CODE":
            return st.code_search(ctx, query_text, top_k)
        if qt == "FEEDBACK":
            from cognee_graphdb_spark.plans.feedback import add_feedback

            return add_feedback(self.store, self.spark, query_text, gateway=self.gateway)
        if qt == "FEELING_LUCKY":
            return st.feeling_lucky(self.spark, ctx, query_text)
        if qt == "CODING_RULES":
            return st.coding_rules(ctx)
        raise AssertionError("unreachable")
