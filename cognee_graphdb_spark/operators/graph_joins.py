"""Graph traversal = joins on the edges table (SURVEY.md §2.4 J1-J9).

The reference delegates these to Cypher on Kuzu/Neo4j; here every traversal is
an equi-join Catalyst can plan (broadcast for id-lookups, sort-merge for bulk).

Scale notes:
- Point traversals (J1/J2) filter edges by a literal id first — with edges
  bucketed/partitioned by src this is partition-pruned, and the node-resolution
  join broadcasts the (tiny) frontier, never the nodes table.
- k-hop (J6) is an iterated self-join with a dedup per round — the frontier is
  what shuffles, not the full edge set.  For unbounded reachability use
  ``connected_components`` in graph_metrics.py (alternating large-star/small-star,
  the Pregel-equivalent).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def undirected(edges: DataFrame) -> DataFrame:
    """Both directions of each edge: (src,dst) ∪ (dst,src). Map-only.

    Deliberately a union of two narrow selects, not an explode: the union
    scans the input twice but stays fully inside whole-stage codegen; the
    explode variant (one scan, array+struct allocation per row) measured
    ~20% SLOWER at sf0.1 and broke the components round codegen span."""
    fwd = edges.select("src", "dst", "relationship_name")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "relationship_name")
    return fwd.unionByName(rev)


def neighbors(edges: DataFrame, node: str) -> DataFrame:
    """J1 — distinct 1-hop neighbor ids of ``node``, either direction.

    Reference: graph_db_interface.py:357; kuzu adapter.py:784-804.
    """
    out = edges.filter(F.col("src") == node).select(F.col("dst").alias("neighbor_id"))
    inc = edges.filter(F.col("dst") == node).select(F.col("src").alias("neighbor_id"))
    return out.unionByName(inc).distinct()


def connections(edges: DataFrame, nodes: DataFrame, node: str) -> DataFrame:
    """J2 — (src_name, relationship_name, dst_name) triples incident to ``node``.

    Reference: graph_db_interface.py:384-395 / kuzu adapter.py:997-1062, used by
    the INSIGHTS retriever (insights_retriever.py:60-85).  3-way equi-join;
    the incident-edge frontier is tiny ⇒ broadcast it against nodes.
    """
    incident = edges.filter((F.col("src") == node) | (F.col("dst") == node)).select(
        "src", "dst", "relationship_name"
    )
    n_src = nodes.select(F.col("id").alias("src"), F.col("name").alias("src_name"))
    n_dst = nodes.select(F.col("id").alias("dst"), F.col("name").alias("dst_name"))
    return (
        F.broadcast(incident)
        .join(n_src, "src")
        .join(n_dst, "dst")
        .select("src", "src_name", "relationship_name", "dst", "dst_name")
    )


def attribute_filter(nodes: DataFrame, edges: DataFrame, attr_filters: dict[str, list]) -> tuple[DataFrame, DataFrame]:
    """P2 — nodes where every ``attr IN values`` holds (AND across filters);
    edges where BOTH endpoints pass (double semi-join).

    Reference: kuzu get_filtered_graph_data adapter.py:1275-1352.
    """
    cond = F.lit(True)
    for attr, values in attr_filters.items():
        cond = cond & F.col(attr).isin(list(values))
    fnodes = nodes.filter(cond)
    ids = fnodes.select("id")
    fedges = (
        edges.join(ids.withColumnRenamed("id", "src"), "src", "leftsemi")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "leftsemi")
        .select(*edges.columns)
    )
    return fnodes, fedges


def valid_edges(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """P5 — drop edges whose endpoints are missing from the nodes table.

    Reference: extract_graph_from_data.py:120-127 discards dangling edges
    before persisting.  Two leftsemi joins on id.
    """
    ids = nodes.select("id")
    return (
        edges.join(ids.withColumnRenamed("id", "src"), "src", "leftsemi")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "leftsemi")
        .select(*edges.columns)
    )


def has_edges(edges: DataFrame, candidates: DataFrame) -> DataFrame:
    """J3 — which of the candidate (src,dst,relationship_name) triples exist.

    Reference: kuzu adapter.py:559-644.  leftsemi join on the composite key.
    """
    return edges.join(
        F.broadcast(candidates), ["src", "dst", "relationship_name"], "leftsemi"
    ).select("src", "dst", "relationship_name").distinct()


def induced_edges(edges: DataFrame, node_ids: DataFrame) -> DataFrame:
    """SO3 — edges whose BOTH endpoints lie in ``node_ids`` (column ``id``).

    Reference: kuzu adapter.py:1253-1262.  Double leftsemi.
    """
    ids = node_ids.select("id")
    return (
        edges.join(F.broadcast(ids.withColumnRenamed("id", "src")), "src", "leftsemi")
        .join(F.broadcast(ids.withColumnRenamed("id", "dst")), "dst", "leftsemi")
        .select("src", "dst", "relationship_name")
    )


def nodeset_subgraph(nodes: DataFrame, edges: DataFrame, node_type: str, names: list[str]) -> tuple[DataFrame, DataFrame]:
    """J4 — seed by (type, name IN names), expand 1 hop, return induced subgraph.

    Reference: kuzu get_nodeset_subgraph adapter.py:1196-1274.
    """
    seed = nodes.filter((F.col("type") == node_type) & F.col("name").isin(names)).select("id")
    frontier = (
        edges.join(F.broadcast(seed.withColumnRenamed("id", "src")), "src", "leftsemi")
        .select(F.col("dst").alias("id"))
        .unionByName(
            edges.join(F.broadcast(seed.withColumnRenamed("id", "dst")), "dst", "leftsemi").select(
                F.col("src").alias("id")
            )
        )
    )
    members = seed.unionByName(frontier).distinct()
    sub_nodes = nodes.join(members, "id", "leftsemi")
    return sub_nodes, induced_edges(edges, members)


def k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    direction: str = "both",
    checkpoint_frontier: bool = True,
) -> DataFrame:
    """J6 — node ids within ≤k hops of the seed set (column ``id``), seeds included.

    Reference: variable-length Cypher paths [*1..2]/[*1..3]
    (kuzu adapter.py:1762-1800, 1426-1451).  Iterated self-join: only the
    frontier shuffles each round; dedup per round keeps it minimal.

    ``checkpoint_frontier=True`` (default) trades two laziness contracts for
    a k× reduction in edge scans: (1) calling k_hop triggers Spark jobs at
    plan-construction time (eager per-round ``localCheckpoint``), so callers
    that build but never execute the plan still pay the traversal; (2)
    localCheckpoint blocks live unreplicated on executors, so on executor
    loss the traversal fails and must be rerun rather than recomputed from
    lineage.  Pass ``False`` for a fully lazy, lineage-recoverable plan —
    correct but O(k²) edge scans, since Spark re-executes the shared frontier
    subplan once per remaining round.  At cluster scale prefer the default
    and rely on job retry; the checkpoint blocks are frontier-sized (small),
    the rerun cost is one traversal.
    """
    e = undirected(edges) if direction == "both" else edges
    e = e.select("src", "dst")
    # each round broadcast-joins the frontier against a full scan of e, and e
    # appears once per round in the final DAG — cap its partition count so k
    # rounds aren't k * (union-of-branches) tiny task launches
    cap = 2 * e.sparkSession.sparkContext.defaultParallelism
    if e.rdd.getNumPartitions() > cap:
        e = e.coalesce(cap)
    visited = seeds.select("id").distinct()
    frontier = visited
    for _ in range(k):
        nxt = (
            e.join(F.broadcast(frontier.withColumnRenamed("id", "src")), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
        )
        if checkpoint_frontier:
            # materialize the (small) frontier: round r's output feeds BOTH
            # the visited union and round r+1's join, and Spark re-executes
            # shared subplans per consumer — without this, round 1's edge
            # join runs once per remaining round (k× total edge scans).
            # The emptiness probe rides the checkpoint job as an Observation
            # row count — an exhausted component must not pay the remaining
            # rounds' edge joins, and the probe must not pay its own job.
            from pyspark.sql import Observation

            obs = Observation()
            nxt = nxt.observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint(
                eager=True
            )
            if obs.get["n"] == 0:
                break
        # nxt is distinct AND anti-joined against visited, so the union is
        # disjoint by construction — no distinct (= no shuffle of the whole
        # visited set) per round
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def triplet_score_join(
    edges: DataFrame,
    node_scores: DataFrame,
    edge_type_scores: DataFrame | None = None,
    k: int = 5,
) -> DataFrame:
    """J5 — THE core composite query: score every edge by
    coalesce(src_score,1) + coalesce(dst_score,1) + coalesce(rel_score,1),
    return the k smallest.

    Reference: CogneeGraph.py:141-190 maps per-collection vector distances onto
    node/edge attributes then heap-selects; orchestrated by
    brute_force_triplet_search.py:90-185.  Here: two left joins onto the score
    map, one onto edge-type scores, then TakeOrderedAndProject for the top-k
    (no global sort).

    The score map is NOT force-broadcast: with limit=None semantics it is the
    full indexed-node set (O(N) — a forced broadcast OOMs the driver at scale).
    Catalyst/AQE broadcasts it automatically when runtime stats say it fits
    (spark.sql.autoBroadcastJoinThreshold); otherwise it shuffle-joins on
    src/dst, which stays co-located when edges are bucketed by src/dst.
    edge_type_scores IS broadcast — distinct relationship names are genuinely
    small.

    node_scores: (id, score); edge_type_scores: (relationship_name, score).
    """
    s1 = node_scores.select(F.col("id").alias("src"), F.col("score").alias("src_score"))
    s2 = node_scores.select(F.col("id").alias("dst"), F.col("score").alias("dst_score"))
    out = edges.join(s1, "src", "left").join(s2, "dst", "left")
    if edge_type_scores is not None:
        es = edge_type_scores.select("relationship_name", F.col("score").alias("rel_score"))
        out = out.join(F.broadcast(es), "relationship_name", "left")
    else:
        out = out.withColumn("rel_score", F.lit(None).cast("double"))
    out = out.withColumn(
        "triplet_score",
        F.coalesce(F.col("src_score"), F.lit(1.0))
        + F.coalesce(F.col("dst_score"), F.lit(1.0))
        + F.coalesce(F.col("rel_score"), F.lit(1.0)),
    )
    return out.select("src", "dst", "relationship_name", "triplet_score").orderBy(
        F.col("triplet_score").asc(), F.col("src").asc(), F.col("dst").asc(), F.col("relationship_name").asc()
    ).limit(k)


def cascade_delete_set(nodes: DataFrame, edges: DataFrame, document_id: str) -> DataFrame:
    """J7 — the delete-set of a document: its chunks, their orphan entities
    (not contained by any other document's chunks), summaries of its chunks,
    and orphan entity-types.  Shared entities survive.

    Reference: kuzu adapter.py:1598-1668; driver api/v1/delete/delete.py:95-244.
    Chain of joins + left_anti "NOT EXISTS" anti-joins.
    Edge conventions (§1.3): chunk -is_part_of-> doc, chunk -contains-> entity,
    summary -made_from-> chunk, entity -is_a-> entity_type.
    """
    doc = nodes.filter(F.col("id") == document_id).select("id")

    chunks = edges.filter(
        (F.col("relationship_name") == "is_part_of") & (F.col("dst") == document_id)
    ).select(F.col("src").alias("id")).distinct()

    summaries = (
        edges.filter(F.col("relationship_name") == "made_from")
        .join(F.broadcast(chunks.withColumnRenamed("id", "dst")), "dst", "leftsemi")
        .select(F.col("src").alias("id"))
        .distinct()
    )

    # entities contained in this doc's chunks
    ents = (
        edges.filter(F.col("relationship_name") == "contains")
        .join(F.broadcast(chunks.withColumnRenamed("id", "src")), "src", "leftsemi")
        .select(F.col("dst").alias("id"))
        .distinct()
    )
    # ... minus entities contained by chunks of OTHER documents (NOT EXISTS)
    other_chunks = (
        edges.filter(F.col("relationship_name") == "is_part_of")
        .filter(F.col("dst") != document_id)
        .select(F.col("src").alias("id"))
        .distinct()
    )
    ents_elsewhere = (
        edges.filter(F.col("relationship_name") == "contains")
        .join(other_chunks.withColumnRenamed("id", "src"), "src", "leftsemi")
        .select(F.col("dst").alias("id"))
        .distinct()
    )
    orphan_ents = ents.join(ents_elsewhere, "id", "left_anti")

    # entity types whose every member entity is being deleted
    et_edges = edges.filter(F.col("relationship_name") == "is_a").select(
        F.col("src").alias("ent"), F.col("dst").alias("id")
    )
    types_of_deleted = et_edges.join(
        F.broadcast(orphan_ents.withColumnRenamed("id", "ent")), "ent", "leftsemi"
    ).select("id").distinct()
    types_with_survivors = et_edges.join(
        orphan_ents.withColumnRenamed("id", "ent"), "ent", "left_anti"
    ).select("id").distinct()
    orphan_types = types_of_deleted.join(types_with_survivors, "id", "left_anti")

    return reduce(
        lambda a, b: a.unionByName(b),
        [doc, chunks, summaries, orphan_ents, orphan_types],
    ).distinct()


def temporal_range_join(
    timestamps: DataFrame,
    events_edges: DataFrame,
    time_from: int,
    time_to: int,
) -> DataFrame:
    """J9 — timestamp nodes with time_at BETWEEN from AND to, joined to events.

    Reference: kuzu collect_time_ids adapter.py:1802-1881 + 2-hop event
    collection adapter.py:1762-1800 (temporal_retriever.py:98-138).
    timestamps: (id, time_at bigint); events_edges: event -at-> timestamp.
    """
    hits = timestamps.filter(F.col("time_at").between(time_from, time_to)).select("id")
    return (
        events_edges.filter(F.col("relationship_name") == "at")
        .join(F.broadcast(hits.withColumnRenamed("id", "dst")), "dst", "leftsemi")
        .select(F.col("src").alias("event_id"))
        .distinct()
    )
