"""Whole-graph descriptive metrics (SURVEY.md §2.5 A2).

Reference: kuzu adapter.py:1353-1484 and the Neo4j GDS variants
(neo4j_metrics_utils.py:8-190 — gds.wcc, gds.allShortestPaths,
gds.localClusteringCoefficient).  Spark-first replacements:

- counts / mean degree / density / self-loops: single agg pass.
- connected components: alternating large-star/small-star (Kiveris et al.,
  "Connected Components in MapReduce and Beyond") — the Pregel-equivalent as
  pure DataFrame self-joins, converging in O(log^2 n) rounds; localCheckpoint
  per round truncates the plan lineage so 100 iterations don't blow up Catalyst.
- clustering coefficient: triangle counting by joining each node's neighbor
  pairs against the edge set.
- diameter / avg shortest path: exact multi-source BFS is O(V·E); exposed with
  a sampled-sources option because the reference's own Cypher version bounds
  paths at *1..3 hops anyway (adapter.py:1426-1451).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.graph_joins import undirected


def _sym_edges(edges: DataFrame) -> DataFrame:
    """Distinct undirected (src,dst) pairs, self-loops removed."""
    return undirected(edges).select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 50, skew_safe: bool = False,
    hash_ids: bool = True,
) -> DataFrame:
    """(id, component): component = the reachable node with the smallest
    xxhash64(id) — an arbitrary but deterministic canonical representative.

    Alternating large-star/small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond") — converges in O(log^2 n) ROUNDS regardless of graph
    diameter (plain min-label propagation needs O(diameter) rounds, hundreds on
    chain-y graphs).  localCheckpoint truncates lineage per round, and
    convergence is one count+hash aggregate per round.

    Two physical strategies for the per-star "attach min(N(u) ∪ {u}) to every
    neighbor row" step:

    - default (``skew_safe=False``): a single sort-based window per star
      (``partitionBy(u).orderBy(v)`` — first row IS the min, row_number
      dedups the per-u emission).  ONE shuffle per star instead of the
      groupBy+join's two; measured 15.9s vs 25.7s at sf0.1/local[32].
    - ``skew_safe=True``: groupBy (map-side partial min, skew-immune) + join
      back (AQE skew-join splits hot keys).  Sort-windows place ALL rows of
      one key in ONE task, and after round 0 the star graph concentrates a
      component's full membership under its root key — on a billion-node
      component that single sort task is the job's straggler/OOM.  Flip this
      on for cluster runs against graphs whose largest component is huge;
      the plans are otherwise identical.

    Scale choices: node ids are relabeled to xxhash64 longs ONCE up front, so
    every per-round shuffle compares/hashes 8-byte keys instead of strings
    (~3x faster on wide graphs); intermediate star outputs are deduped only at
    the (small) end-of-round edge set — duplicate (u,v) rows never change a
    min, so the doubled round-0 input skips its own distinct shuffle entirely.

    large-star: every neighbor v > u links to min(N(u) ∪ {u});
    small-star: every neighbor v <= u links to min(N(u) ∪ {u}).
    At the fixpoint every node points directly at its component root.
    """
    from pyspark.sql.window import Window

    if hash_ids:
        # A 64-bit collision would silently merge unrelated components
        # (~n^2/2^65 — non-negligible at billions of nodes), so probe first:
        # any collision among node ids ⇒ fall back to string labels.  Below
        # 50M nodes the collision probability is < 7e-5, and the probe's
        # double count_distinct (an Expand over every node) costs more than
        # the risk it retires — probe only at the scale where it matters.
        n_nodes = nodes.count()
        if n_nodes >= 50_000_000:
            probe = nodes.agg(
                (F.count_distinct("id") - F.count_distinct(F.xxhash64("id"))).alias("c")
            ).first()
            if probe["c"] != 0:
                hash_ids = False
    if hash_ids:
        # hash up front: every per-round shuffle then works on 8-byte longs
        e = (
            undirected(edges)
            .select(F.xxhash64("src").alias("u"), F.xxhash64("dst").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
    else:
        e = (
            undirected(edges)
            .select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
    if skew_safe:
        # the join path consumes nbr twice (agg + probe); materialize once
        e = e.distinct().localCheckpoint(eager=True)
    else:
        # the round-0 input inherits the union-of-8-branches partitioning
        # (~960 tiny map tasks at sf0.1) and the first window repartitions to
        # shuffle.partitions anyway — cap the map side so round 0 isn't
        # task-launch-bound (13.9s -> 5.3s measured).  coalesce is narrow: no
        # extra shuffle.
        cap = 2 * e.sparkSession.sparkContext.defaultParallelism
        if e.rdd.getNumPartitions() > cap:
            e = e.coalesce(cap)
    prev_stats = None
    symmetric = True  # the initial set carries both directions already
    for _ in range(max_iter):
        # round 0's input is symmetric by construction — re-symmetrizing would
        # double every row for nothing; star outputs are directed big -> small
        nbr = e if symmetric else e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        symmetric = False
        if skew_safe:
            mins = nbr.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
            large = (
                nbr.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
            )
            mins2 = large.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
            small = (
                large.join(mins2, "u")
                .select(F.col("v").alias("n"), F.col("m"))
                .unionByName(mins2.select(F.col("u").alias("n"), F.col("m")))
            )
        else:
            w = Window.partitionBy("u").orderBy("v")
            # default frame (unboundedPreceding..currentRow): first(v) == min(v)
            lg = nbr.withColumn("m", F.least(F.first("v").over(w), F.col("u")))
            large = (
                lg.filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
            )
            sm = (
                large.withColumn("m", F.least(F.first("v").over(w), F.col("u")))
                .withColumn("rn", F.row_number().over(w))
            )
            # ONE pass: a union of two selects over sm would execute the whole
            # two-window chain twice (Spark does not share non-exchange
            # subplans across union branches — measured 2x round-0 cost);
            # explode emits the per-u self row (rn==1) alongside each (v, m)
            pair = F.when(
                F.col("rn") == 1,
                F.array(
                    F.struct(F.col("v").alias("n"), F.col("m").alias("m")),
                    F.struct(F.col("u").alias("n"), F.col("m").alias("m")),
                ),
            ).otherwise(F.array(F.struct(F.col("v").alias("n"), F.col("m").alias("m"))))
            small = sm.select(F.explode(pair).alias("p")).select("p.n", "p.m")
        small = (
            small.filter(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # convergence stats ride the checkpoint job via observe() — a
        # separate .agg().first() would re-scan the (checkpointed) round
        # output as one extra job per round
        from pyspark.sql import Observation

        obs = Observation()
        small = small.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).localCheckpoint(eager=True)
        row = obs.get
        stats = (row["n"], row["h"])
        e = small
        if stats == prev_stats:
            break
        # star test: if no target is still a source AND no source has two
        # parents, every node points at exactly one root — the fixpoint,
        # detected WITHOUT the 1-2 extra confirmation rounds the stats
        # comparison needs (each a full double-window pass; these are two
        # cheap jobs over the checkpointed, in-memory round output).  The
        # single-parenthood check is load-bearing: a round can produce a
        # depth-1 graph where some node still points at TWO roots (e.g.
        # edges 3-8, 5-8, 5-9, 4-9 leave 5 -> {3,4} after one round) —
        # breaking there would split one component in two.  It runs only
        # once the cheaper depth test passes, i.e. at the final round(s).
        # GATE: probe only when the round left the row count unchanged — a
        # mid-convergence round (count still shrinking) virtually never
        # passes the depth test, so its probe is a wasted self-join job
        # (~0.9s/round at sf0.1); a fixpoint the gate misses still breaks
        # one round later via the stats comparison, output-identically.
        count_stable = prev_stats is not None and stats[0] == prev_stats[0]
        prev_stats = stats
        if count_stable and small.select("v").join(
            small.select(F.col("u").alias("v")), "v", "leftsemi"
        ).isEmpty():
            if (
                small.groupBy("u")
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") > 1)
                .isEmpty()
            ):
                break
    if not hash_ids:
        # labels ARE the ids — no reverse mapping needed
        return (
            nodes.select("id", F.col("id").alias("u"))
            .join(e, "u", "left")
            .select("id", F.coalesce("v", "u").alias("component"))
        )
    # fixpoint: e maps every non-root hash to its root hash; map back to ids.
    # The root set is one row per (non-singleton) component — usually tiny,
    # so joining it instead of the full nodes table replaces the second
    # full-width shuffle join.  NOT force-broadcast: a forest-shaped graph
    # (dedup clusters) legitimately has O(n) components, and AQE's runtime
    # stats over the checkpointed e make the broadcast-vs-shuffle call safely.
    nh = nodes.select("id", F.xxhash64("id").alias("u"))
    roots = e.select(F.col("v").alias("u")).distinct()
    root_map = (
        nh.join(roots, "u", "leftsemi")
        .select(F.col("u").alias("rh"), F.col("id").alias("component"))
    )
    return (
        nh.join(e, "u", "left")
        .select("id", F.coalesce("v", "u").alias("rh"))
        .join(root_map, "rh", "left")
        # singletons and roots resolve to themselves
        .select("id", F.coalesce("component", "id").alias("component"))
    )


def incremental_components(
    assignments: DataFrame | None,
    new_edges: DataFrame,
    **cc_kwargs,
) -> DataFrame:
    """(id, component): connected components maintained INCREMENTALLY — feed
    each ingest batch's edges and the previous assignment frame, get the
    assignment over everything seen so far, without re-running CC on the
    full accumulated edge set (ST2's incremental discipline applied to graph
    maintenance; the per-batch cost is proportional to the NEW edges and the
    components they touch, not to history).

    Exactness guarantee (pytest-pinned): the result equals
    :func:`connected_components` over the union of every edge ever ingested,
    label-for-label.  Why it composes: labels are canonical — the member id
    with the smallest xxhash64 — and a min over a union is the min of the
    parts' minima, so contracting each old component to its representative
    and re-running CC over (representatives ∪ new endpoints, contracted new
    edges) yields the same winner as the from-scratch run.  Components
    untouched by the batch never enter the contracted graph and carry over
    verbatim.

    Scale: the contracted graph has one node per TOUCHED component plus the
    batch's unseen endpoints, and one edge per new edge — typically orders
    of magnitude smaller than history; the remap is one label-sized join
    back over the previous assignments.  Use ``hash_ids=False`` in
    ``cc_kwargs`` only if the from-scratch runs do too (labels must use one
    canonical rule across batches).
    """
    # (src, dst) is the only required shape — ledger/stream batches often
    # carry no relationship_name, which the underlying CC view selects
    ne = new_edges.select("src", "dst", F.lit("ingested").alias("relationship_name"))
    ends = (
        ne.select(F.col("src").alias("id"))
        .unionByName(ne.select(F.col("dst").alias("id")))
        .distinct()
    )
    if assignments is None:
        return connected_components(ends, ne, **cc_kwargs)
    m = assignments.select("id", "component").localCheckpoint(eager=True)
    csrc = m.select(F.col("id").alias("src"), F.col("component").alias("rep_src"))
    cdst = m.select(F.col("id").alias("dst"), F.col("component").alias("rep_dst"))
    contracted = (
        ne.select("src", "dst")
        .join(csrc, "src", "left")
        .join(cdst, "dst", "left")
        .select(
            F.coalesce("rep_src", "src").alias("src"),
            F.coalesce("rep_dst", "dst").alias("dst"),
            F.lit("merged").alias("relationship_name"),
        )
    )
    cnodes = (
        contracted.select(F.col("src").alias("id"))
        .unionByName(contracted.select(F.col("dst").alias("id")))
        .distinct()
    )
    cc2 = connected_components(cnodes, contracted, **cc_kwargs).localCheckpoint(eager=True)
    # old assignments: remap components that were touched, keep the rest
    remap = cc2.select(F.col("id").alias("component"), F.col("component").alias("merged"))
    updated = m.join(remap, "component", "left").select(
        "id", F.coalesce("merged", "component").alias("component")
    )
    # endpoints unseen before this batch take their contracted-run label
    fresh = ends.join(m.select("id"), "id", "left_anti").join(cc2, "id")
    return updated.unionByName(fresh.select("id", "component"))


def triangle_counts(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(id, deg, triangles): exact per-node triangle counts and undirected
    simple-graph degree — the gds.triangleCount.stream shape, and the shared
    counting stage :func:`triangle_clustering` derives coefficients from.

    Hub-safe by construction (compact-forward / degree-ordered orientation,
    Latapy "Main-memory triangle computations", 2008): every undirected edge
    is oriented from its lower-(degree, id) endpoint to the higher one, and
    wedges are enumerated only among each node's oriented OUT-neighbors.
    Under this orientation a node's out-degree is O(sqrt(E)) regardless of
    its real degree, so a 10M-neighbor celebrity node emits at most
    O(E)-bounded pairs instead of 10^13 — total work is bounded by the
    graph's arboricity, not by Σ deg².  Each triangle {u,v,w} (ranks
    u<v<w) is found exactly once as the wedge (v,w) at center u closed by
    the oriented edge v→w, then credited to all three corners, so the
    per-node counts are EXACT — same results as the naive enumeration,
    never a sampled approximation.
    """
    sym = _sym_edges(edges)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).withColumnRenamed("src", "id")
    dsrc = deg.select(F.col("id").alias("src"), F.col("deg").alias("deg_src"))
    ddst = deg.select(F.col("id").alias("dst"), F.col("deg").alias("deg_dst"))
    ranked = sym.join(dsrc, "src").join(ddst, "dst")
    oriented = ranked.filter(
        (F.col("deg_src") < F.col("deg_dst"))
        | ((F.col("deg_src") == F.col("deg_dst")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst", "deg_dst")
    # wedge (a,b) at each center, canonically ordered by the SAME rank so it
    # joins against the oriented closing edge a→b
    n1 = oriented.select(F.col("src").alias("center"), F.col("dst").alias("a"), F.col("deg_dst").alias("da"))
    n2 = oriented.select(F.col("src").alias("center"), F.col("dst").alias("b"), F.col("deg_dst").alias("db"))
    wedges = n1.join(n2, "center").filter(
        (F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    )
    closed = wedges.join(
        oriented.select(F.col("src").alias("a"), F.col("dst").alias("b")), ["a", "b"], "leftsemi"
    )
    corners = (
        closed.select(F.col("center").alias("id"))
        .unionAll(closed.select(F.col("a").alias("id")))
        .unionAll(closed.select(F.col("b").alias("id")))
    )
    tri = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        nodes.select("id")
        .join(deg, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
        )
    )


def triangle_clustering(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient over :func:`triangle_counts`:
    coefficient = 2*tri / (deg*(deg-1)); deg<2 ⇒ 0.0 (same output as
    before the counting stage was extracted — the oracle pins it)."""
    tc = triangle_counts(nodes, edges)
    return tc.select(
        "id",
        F.when(
            F.col("deg") >= 2,
            2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    checkpoint_every: int = 3,
    ids_distinct: bool = False,
    personalized: DataFrame | None = None,
    tol: float | None = None,
    return_iterations: bool = False,
    edges_within_nodes: bool = False,
    weight_col: str | None = None,
    warm_start: DataFrame | None = None,
) -> DataFrame:
    """(id, rank): PageRank by power iteration over the directed simple graph
    (distinct (src, dst) pairs; self-loops kept as ordinary edges).

    The reference exposes whole-graph analytics through its GDS metric surface
    (neo4j_metrics_utils.py's gds.* calls are the same family: wcc, paths,
    clustering); PageRank is the canonical importance score a graph memory
    layer ranks entities with, implemented Spark-first:

    - one shuffle per iteration: edges ⋈ ranks on src (ranks is the smaller,
      repartition-stable side), then a groupBy(dst) partial-aggregated sum —
      map-side combine keeps the shuffle at O(distinct dst per partition).
    - dangling mass (rank parked on sinks) is a 1-row aggregate crossJoined
      back (broadcast by construction), NOT a per-iteration driver collect —
      each iteration is one job, triggered by the per-round localCheckpoint
      that also truncates the lineage (per-round materialization keeps the
      dangling broadcast subquery reading an in-memory frame instead of
      re-executing the rank chain; ``checkpoint_every`` is the tol-check
      cadence).
    - out-degrees are computed once and reused across iterations (checkpointed
      so the 10 rounds don't rescan the source).

    At 1000 executors this is the textbook layout: ranks and edges shuffle on
    the same key every round, so AQE reuses the exchange; a billion-edge graph
    iterates at the cost of one co-partitioned join + partial agg per round.
    Convergence-wise 10 rounds bounds the error by damping^10 ≈ 0.2 of the
    initial residual; ``tol`` adds in-loop tolerance stopping — the L1 delta
    between consecutive CHECKPOINTS (so the check costs one aggregate per
    ``checkpoint_every`` rounds, not per round), stop when below ``tol``.

    ``personalized`` (a node-id frame) switches to personalized PageRank
    (the GDS variant a memory layer ranks entities AROUND a query's seed
    set with): the reset vector becomes uniform over the SEED SET instead
    of all nodes — p_i = 1/|S| for seeds else 0 — and dangling mass
    likewise returns to the seeds: rank = (1-d)·p + d·(contrib + dm·p).
    ``return_iterations`` returns (ranks, iterations_run) instead of ranks.

    ``weight_col`` switches to weighted transitions (GDS's
    relationshipWeightProperty): parallel (src, dst) edges sum their
    weights, p(u→v) = w(u,v) / W(u), and the per-edge fraction is
    precomputed ONCE so iterations stay one join + one multiply-sum;
    non-positive aggregate weights are dropped (a zero-weight edge is no
    edge), and nodes with no positive-weight out-edge are dangling exactly
    like unweighted sinks.  The unweighted path's float arithmetic is
    untouched (its oracles mirror ``rank / deg`` operand-for-operand).

    ``warm_start`` (an (id, rank) frame, e.g. the previous snapshot's output)
    replaces the uniform initial vector: known nodes start at their prior
    rank, new nodes at 1/n, and the whole vector is renormalized to sum 1 —
    power iteration converges to the SAME damping-t fixpoint from any
    positive start, but a start near the fixpoint (small edge delta between
    snapshots) cuts the rounds to reach ``tol`` to a handful.  This is what
    makes streaming/pagerank.py's per-batch maintenance cheap: the cost of a
    batch tracks the size of the CHANGE, not of the graph's diameter-scale
    mixing time.  The init renormalization costs one extra aggregate.
    """
    # everything static is hoisted out of the loop and iterates on 8-byte
    # keys: per round only ONE join (pre-weighted edges ⋈ ranks), one
    # partial-agg sum, and one left join against the static node frame —
    # the per-round deg join and dangling anti-join a naive layout pays are
    # precomputed as an edge weight and an is_sink flag.  Each static frame
    # is checkpointed exactly once and every later step reads the
    # materialized copy, so setup is 4 shuffles total regardless of rounds.
    ids = nodes.select("id")
    if not ids_distinct:  # pass True when the caller guarantees uniqueness
        ids = ids.distinct()
    nh = ids.select("id", F.xxhash64("id").alias("h")).localCheckpoint(eager=True)
    n = nh.count()
    if n == 0:
        empty = nodes.select("id", F.lit(0.0).alias("rank"))
        return (empty, 0) if return_iterations else empty
    if n >= 50_000_000:
        # same collision-probe rationale as connected_components: a 64-bit
        # collision would silently merge two nodes' mass
        probe = nh.agg((F.count_distinct("id") - F.count_distinct("h")).alias("c")).first()
        if probe["c"] != 0:
            raise ValueError("xxhash64 collision among node ids; pagerank needs distinct keys")
    # edges referencing ids absent from `nodes` would otherwise leak rank
    # mass (their contrib rows fall out of the base_frame left join below),
    # so ranks would no longer sum to 1 — restrict to the induced subgraph.
    # Two one-time semi-joins; at scale AQE broadcasts nh when it fits, but a
    # caller GUARANTEEING edges ⊆ nodes×nodes (e.g. nodes derived from the
    # edge list) passes edges_within_nodes=True and skips both shuffles.
    if weight_col is None:
        e = edges.select(
            F.xxhash64("src").alias("hs"), F.xxhash64("dst").alias("hd")
        ).distinct()
    else:
        e = (
            edges.select(
                F.xxhash64("src").alias("hs"),
                F.xxhash64("dst").alias("hd"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .groupBy("hs", "hd")
            .agg(F.sum("w").alias("w"))
            .filter(F.col("w") > 0)
        )
    if not edges_within_nodes:
        e = (
            e.join(nh.select(F.col("h").alias("hs")), "hs", "left_semi")
            .join(nh.select(F.col("h").alias("hd")), "hd", "left_semi")
        )
    e = e.localCheckpoint(eager=True)
    if weight_col is None:
        # deg rides on the NODE frame, not the edge list (guide §2.3: shuffle
        # fewer bytes): base_frame carries (h, is_sink, deg) and each round
        # computes rank/deg per NODE before the join — 1 division per node
        # instead of 1 per edge, bit-identical IEEE values — so the per-round
        # join ships the bare 16-byte (hs, hd) edge list instead of a 24-byte
        # (hs, hd, deg) copy, and setup drops the edge-sized `ew` checkpoint
        # plus the deg checkpoint (2 fewer eager jobs over edge-sized data).
        deg = e.groupBy("hs").agg(F.count(F.lit(1)).alias("deg"))
        ew = e  # rounds join the bare, already-checkpointed edge list
        base_frame = (
            nh.select("h")
            .join(deg.select(F.col("hs").alias("h"), "deg"), "h", "left")
            .select("h", F.col("deg").isNull().alias("is_sink"), "deg")
        )
    else:
        deg = e.groupBy("hs").agg(F.sum("w").alias("deg")).localCheckpoint(eager=True)
        # deg is node-sized; AQE broadcast-joins it when it fits, else
        # shuffles — either way this runs ONCE, not once per round.  The
        # weighted fraction is genuinely per-EDGE (w / W(u)), so the weighted
        # path keeps the precomputed frac copy.
        ew = (
            e.join(deg, "hs")
            .select("hs", "hd", (F.col("w") / F.col("deg")).alias("frac"))
            .localCheckpoint(eager=True)
        )
        base_frame = (
            nh.select("h")
            .join(deg.select(F.col("hs").alias("h"), F.lit(False).alias("is_sink")), "h", "left")
            .select("h", F.coalesce("is_sink", F.lit(True)).alias("is_sink"))
        )
    statics = ["is_sink"] + (["deg"] if weight_col is None else [])
    if personalized is not None:
        # seeds outside `nodes` would fall out of the base_frame left join
        # below, shrinking the teleport vector's sum below 1 and biasing every
        # rank low with no signal — the same mass-leak class the edge
        # semi-joins above guard against.  Restrict to known nodes and
        # renormalize over the survivors; all-unknown seeds raise.
        seeds = personalized.select("id").distinct().join(ids, "id", "left_semi")
        ns = seeds.count()
        if ns == 0:
            raise ValueError(
                "personalized pagerank needs a non-empty seed set drawn from `nodes`"
            )
        sh = seeds.select(F.xxhash64("id").alias("h"), F.lit(1.0 / ns).alias("p"))
        base_frame = (
            base_frame.join(sh, "h", "left")
            .select("h", *statics, F.coalesce("p", F.lit(0.0)).alias("p"))
        )
        statics = statics + ["p"]
    base_frame = base_frame.localCheckpoint(eager=True)
    # (1.0 - damping) / n mirrors the oracle's CAST(... AS DOUBLE) arithmetic
    # bit-for-bit: same operand order, all doubles.
    base = (1.0 - damping) / n
    if warm_start is not None:
        ws = warm_start.select(
            F.xxhash64("id").alias("h"), F.col("rank").cast("double").alias("r0")
        )
        carry = ["h", *statics]
        init = base_frame.join(ws, "h", "left").select(
            *carry, F.coalesce("r0", F.lit(1.0 / n)).alias("r0")
        )
        total = init.agg(F.sum("r0").alias("s")).first()["s"]
        if not total or total <= 0:
            raise ValueError("warm_start ranks must have a positive sum")
        ranks = init.select(
            *carry, (F.col("r0") / F.lit(float(total))).alias("rank")
        ).localCheckpoint(eager=True)
    elif personalized is None:
        ranks = base_frame.select("h", *statics, F.lit(1.0 / n).alias("rank"))
    else:
        ranks = base_frame.select("h", *statics, F.col("p").alias("rank"))
    prev_ck = ranks
    done = 0
    for it in range(n_iter):
        if weight_col is not None:
            contrib = (
                ew.join(ranks.select(F.col("h").alias("hs"), "rank"), "hs")
                .select(F.col("hd").alias("h"), (F.col("rank") * F.col("frac")).alias("t"))
                .groupBy("h")
                .agg(F.sum("t").alias("c"))
            )
        else:
            # rank/deg is constant per SOURCE node — computing it on the
            # node-sized side before the join (same operands, same IEEE
            # result per edge) keeps the edge side at its bare 16 bytes/row
            contrib = (
                ew.join(
                    ranks.select(
                        F.col("h").alias("hs"),
                        (F.col("rank") / F.col("deg")).alias("t"),
                    ),
                    "hs",
                )
                .select(F.col("hd").alias("h"), "t")
                .groupBy("h")
                .agg(F.sum("t").alias("c"))
            )
        # sinks have no ew rows, so the contrib join skips them naturally;
        # their parked mass is this 1-row broadcast aggregate
        dangling = ranks.filter("is_sink").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        joined = base_frame.join(contrib, "h", "left").crossJoin(F.broadcast(dangling))
        if personalized is None:
            new_rank = (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / F.lit(float(n)))
            )
            ranks = joined.select("h", *statics, new_rank.alias("rank"))
        else:
            # rank = (1-d)·p + d·(contrib + dm·p): teleport AND dangling mass
            # return to the seed distribution (same operand order as the
            # personalized oracle)
            new_rank = (
                (F.lit(1.0) - F.lit(damping)) * F.col("p")
                + F.lit(damping)
                * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") * F.col("p"))
            )
            ranks = joined.select("h", *statics, new_rank.alias("rank"))
        done = it + 1
        # materialize EVERY round: a multi-round lazy block re-executes the
        # rank chain once per nested dangling-mass broadcast subquery (the
        # 1-row aggregate depends on the previous round's un-materialized
        # ranks), and ReuseExchange only partly dedupes it — measured at
        # sf0.1/local[32]: 5 iters 13.5s (block of 3) vs 10.2s (per-round);
        # 10 iters 149s (block of 10) vs 16s (per-round).  ``checkpoint_every``
        # now governs only the tol-CHECK cadence, so tol callers see the
        # exact same delta comparisons (and stopping points) as before.
        ranks = ranks.localCheckpoint(eager=True)
        if (it + 1) % checkpoint_every == 0 or it == n_iter - 1:
            if tol is not None:
                delta = (
                    ranks.select("h", "rank")
                    .join(prev_ck.select("h", F.col("rank").alias("prev")), "h")
                    .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("d"))
                    .first()["d"]
                )
                if delta is not None and delta < tol:
                    break
            prev_ck = ranks
    out = nh.join(ranks.select("h", "rank"), "h").select("id", "rank")
    return (out, done) if return_iterations else out


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    ids_distinct: bool = False,
    edges_within_nodes: bool = False,
) -> DataFrame:
    """(id, hub, authority): HITS hubs-and-authorities by power iteration
    over the directed simple graph (distinct (src, dst) pairs) — the GDS
    centrality next to :func:`pagerank` (gds.hits; the reference's metric
    surface is the GDS family, cognee reference
    neo4j_driver/neo4j_metrics_utils.py:8-190).  On a graph memory layer it
    separates the two roles PageRank conflates: authorities are the entities
    many curated hubs point AT (the FK graph's nation/region side), hubs the
    entities that point at many good authorities (the customer/supplier
    side).

    Kleinberg's mutual recursion with L1 normalization each half-step
    (the normalization is a PARAMETER of the per-iteration values — L1 keeps
    every intermediate a plain sum-then-divide, so a SQL oracle can unroll
    rounds with identical operand order; the ranking is norm-invariant):

        a_t(v) = Σ_{u→v} h_{t-1}(u) / Σ a_t      (authority half-step)
        h_t(u) = Σ_{u→v} a_t(v)   / Σ h_t        (hub half-step)

    from h_0 = 1/n.  Nodes with no in-edges have authority 0, no out-edges
    hub 0; an edgeless graph yields all zeros (the CASE total = 0 guard, not
    a divide-by-zero).

    Scale (same layout as :func:`pagerank`): per half-step ONE equi-join of
    the static hashed edge list against the node-sized score frame + one
    partial-agg sum + a 1-row broadcast total — two shuffles per round on
    the same keys every round (AQE reuses the exchange); lineage truncated
    every half-step (each normalization total is a 1-row broadcast subquery
    that would re-execute an un-materialized score chain — the pagerank
    finding).  A billion-edge graph iterates at 2× the pagerank round cost,
    nothing super-linear.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    ids = nodes.select("id")
    if not ids_distinct:
        ids = ids.distinct()
    nh = ids.select("id", F.xxhash64("id").alias("h")).localCheckpoint(eager=True)
    n = nh.count()
    if n == 0:
        return nodes.select(
            "id", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )
    e = edges.select(
        F.xxhash64("src").alias("hs"), F.xxhash64("dst").alias("hd")
    ).distinct()
    if not edges_within_nodes:
        e = e.join(nh.select(F.col("h").alias("hs")), "hs", "left_semi").join(
            nh.select(F.col("h").alias("hd")), "hd", "left_semi"
        )
    e = e.localCheckpoint(eager=True)
    base = nh.select("h").localCheckpoint(eager=True)

    def _normalize(raw, key):
        # raw: (key, c) partial sums over the scoring join; total is a 1-row
        # broadcast; all-node frame restores zero rows.  CASE total = 0
        # guard mirrors the oracle verbatim (edgeless graph => all zeros).
        total = raw.agg(F.coalesce(F.sum("c"), F.lit(0.0)).alias("t"))
        return (
            base.join(raw.withColumnRenamed(key, "h"), "h", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "h",
                F.when(F.col("t") == 0.0, F.lit(0.0))
                .otherwise(F.coalesce(F.col("c"), F.lit(0.0)) / F.col("t"))
                .alias("score"),
            )
        )

    hubs = base.select("h", F.lit(1.0 / n).alias("score"))
    auths = base.select("h", F.lit(0.0).alias("score"))
    for it in range(n_iter):
        araw = (
            e.join(hubs.select(F.col("h").alias("hs"), "score"), "hs")
            .groupBy(F.col("hd"))
            .agg(F.sum("score").alias("c"))
        )
        # per-HALF-STEP materialization (the pagerank finding): each
        # _normalize carries a 1-row broadcast total whose subquery would
        # otherwise re-execute the un-materialized score chain below it —
        # checkpointing auths BEFORE the hub half-step consumes it keeps
        # every broadcast subquery reading an in-memory frame
        auths = _normalize(araw, "hd").localCheckpoint(eager=True)
        hraw = (
            e.join(auths.select(F.col("h").alias("hd"), "score"), "hd")
            .groupBy(F.col("hs"))
            .agg(F.sum("score").alias("c"))
        )
        hubs = _normalize(hraw, "hs").localCheckpoint(eager=True)
    return (
        nh.join(hubs.withColumnRenamed("score", "hub"), "h")
        .join(auths.withColumnRenamed("score", "authority"), "h")
        .select("id", "hub", "authority")
    )


def eigenvector(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    ids_distinct: bool = False,
    edges_within_nodes: bool = False,
) -> DataFrame:
    """(id, score): eigenvector centrality by power iteration over the
    directed simple graph (distinct (src, dst) pairs) — the GDS centrality
    between :func:`pagerank` and :func:`hits` (gds.eigenvector; the
    reference's metric surface is the GDS family, cognee reference
    neo4j_driver/neo4j_metrics_utils.py:8-190).  Unlike PageRank there is no
    damping and no out-degree division: a node is central in proportion to
    the plain SUM of its in-neighbours' centrality, so mass concentrates on
    the dominant eigenvector's support (nodes outside it decay to 0 —
    exactly the property that makes it the "quality times quantity"
    centrality).

        x_t(v) = Σ_{u→v} x_{t-1}(u) / Σ x_t        from x_0 = 1/n

    This is :func:`hits`'s authority half-step without the hub alternation;
    normalization is L1 per round (a PARAMETER of the per-iteration values —
    GDS normalizes L2; the ranking is norm-invariant, and L1 keeps every
    intermediate a plain sum-then-divide so a SQL oracle can unroll rounds
    with identical operand order).  Nodes with no in-edges score 0; an
    edgeless graph yields all zeros (CASE total = 0 guard).

    Scale (the :func:`pagerank` layout): per round ONE equi-join of the
    static hashed edge list against the node-sized score frame + one
    partial-agg sum + a 1-row broadcast total; lineage truncated every
    round (the broadcast total re-executes an un-materialized score chain —
    the pagerank finding).  Half the per-round cost of hits.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    ids = nodes.select("id")
    if not ids_distinct:
        ids = ids.distinct()
    nh = ids.select("id", F.xxhash64("id").alias("h")).localCheckpoint(eager=True)
    n = nh.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("score"))
    e = edges.select(
        F.xxhash64("src").alias("hs"), F.xxhash64("dst").alias("hd")
    ).distinct()
    if not edges_within_nodes:
        e = e.join(nh.select(F.col("h").alias("hs")), "hs", "left_semi").join(
            nh.select(F.col("h").alias("hd")), "hd", "left_semi"
        )
    e = e.localCheckpoint(eager=True)
    base = nh.select("h").localCheckpoint(eager=True)
    x = base.select("h", F.lit(1.0 / n).alias("score"))
    for it in range(n_iter):
        raw = (
            e.join(x.select(F.col("h").alias("hs"), "score"), "hs")
            .groupBy(F.col("hd"))
            .agg(F.sum("score").alias("c"))
        )
        total = raw.agg(F.coalesce(F.sum("c"), F.lit(0.0)).alias("t"))
        x = (
            base.join(raw.withColumnRenamed("hd", "h"), "h", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "h",
                F.when(F.col("t") == 0.0, F.lit(0.0))
                .otherwise(F.coalesce(F.col("c"), F.lit(0.0)) / F.col("t"))
                .alias("score"),
            )
        )
        # per-round materialization (the pagerank finding): the L1-total
        # broadcast subquery otherwise re-executes the un-materialized score
        # chain once per nested round inside a checkpoint block
        x = x.localCheckpoint(eager=True)
    return nh.join(x, "h").select("id", "score")


def articlerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    checkpoint_every: int = 3,
    ids_distinct: bool = False,
    edges_within_nodes: bool = False,
) -> DataFrame:
    """(id, rank): ArticleRank — the PageRank variant that dampens the
    influence of low-out-degree nodes (gds.articleRank; the reference's
    metric surface is the GDS family, cognee reference
    neo4j_driver/neo4j_metrics_utils.py:8-190).  Where PageRank divides a
    node's rank by its own out-degree, ArticleRank divides by out-degree
    PLUS the graph's average out-degree, so a citation from a short
    reference list is no longer worth categorically more than one from a
    long list:

        r_t(v) = (1-d)/N + d · Σ_{u→v} r_{t-1}(u) / (deg⁺(u) + avgDeg)
        avgDeg = |E| / N   (distinct directed edges over all nodes)

    from r_0 = 1/N.  Per the GDS definition there is NO dangling-mass
    redistribution (sinks simply contribute nothing, ranks need not sum
    to 1), which makes each round STRICTLY cheaper than pagerank's: the
    per-edge transition factor 1/(deg⁺+avgDeg) is static, so it is
    precomputed once and the loop is one equi-join + one partial-agg sum +
    one left join against the static node frame — no dangling aggregate,
    no 1-row broadcast per round.  Lineage truncated every
    ``checkpoint_every`` rounds; same 8-byte-key discipline as
    :func:`pagerank`, the plan you'd want at a billion edges.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    ids = nodes.select("id")
    if not ids_distinct:
        ids = ids.distinct()
    nh = ids.select("id", F.xxhash64("id").alias("h")).localCheckpoint(eager=True)
    n = nh.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))
    e = edges.select(
        F.xxhash64("src").alias("hs"), F.xxhash64("dst").alias("hd")
    ).distinct()
    if not edges_within_nodes:
        e = e.join(nh.select(F.col("h").alias("hs")), "hs", "left_semi").join(
            nh.select(F.col("h").alias("hd")), "hd", "left_semi"
        )
    e = e.localCheckpoint(eager=True)
    m = e.count()
    # static per-edge transition factor: 1 / (deg+(u) + |E|/N) — double
    # arithmetic in exactly this operand order (the oracle mirrors it)
    avg_deg = float(m) / float(n)
    deg = e.groupBy("hs").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    ew = (
        e.join(deg, "hs")
        .select("hs", "hd", (F.lit(1.0) / (F.col("deg") + F.lit(avg_deg))).alias("w"))
        .localCheckpoint(eager=True)
    )
    base = nh.select("h").localCheckpoint(eager=True)
    teleport = (1.0 - damping) / n
    r = base.select("h", F.lit(1.0 / n).alias("rank"))
    for it in range(n_iter):
        contrib = (
            ew.join(r.select(F.col("h").alias("hs"), "rank"), "hs")
            .groupBy(F.col("hd"))
            .agg(F.sum(F.col("w") * F.col("rank")).alias("c"))
        )
        r = base.join(contrib.withColumnRenamed("hd", "h"), "h", "left").select(
            "h",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("rank"),
        )
        if (it + 1) % checkpoint_every == 0 or it == n_iter - 1:
            r = r.localCheckpoint(eager=True)
    return nh.join(r, "h").select("id", "rank")


def k_core(
    nodes: DataFrame,
    edges: DataFrame,
    k: int,
    max_rounds: int = 100,
    return_rounds: bool = False,
) -> DataFrame:
    """(id, core_degree): the k-core — the maximal subgraph in which every
    node has degree >= k under the undirected simple-graph view — with each
    member's degree inside that core.  GDS-family companion to
    :func:`pagerank` / :func:`connected_components` (gds.kcore; the reference
    exposes the Neo4j GDS metric family via neo4j_metrics_utils.py:8-190).

    Synchronous Matula–Beck peel: each round drops EVERY node whose current
    degree is below k at once, then restricts the edge set to survivors;
    fixpoint when a round removes nothing.  Round count is the graph's "peel
    depth", typically a handful on real graphs (each round is one groupBy
    shuffle + two semi-joins on 8-byte hashed keys, lineage truncated per
    round) — but chain-shaped graphs degrade to O(n) rounds, which is what
    ``max_rounds`` guards (RuntimeError, not a silent partial core).

    Scale notes: ids are relabeled to xxhash64 longs once up front (same
    rationale and collision maths as connected_components); survivors stay
    partitioned by node key across rounds so consecutive groupBys reuse the
    exchange; isolated nodes carry no degree rows and fall out in round one.
    """
    if k < 1:
        raise ValueError("k_core needs k >= 1")
    nh = nodes.select("id", F.xxhash64("id").alias("h")).distinct().localCheckpoint(eager=True)
    und = (
        _sym_edges(edges)
        .select(F.xxhash64("src").alias("u"), F.xxhash64("dst").alias("v"))
        # edges referencing ids outside `nodes` would otherwise anchor phantom
        # degree mass (same guard class as pagerank's induced-subgraph filter)
        .join(nh.select(F.col("h").alias("u")), "u", "left_semi")
        .join(nh.select(F.col("h").alias("v")), "v", "left_semi")
        .localCheckpoint(eager=True)
    )
    prev_n = None
    rounds = 0
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("core_degree"))
    for _ in range(max_rounds):
        keep = deg.filter(F.col("core_degree") >= k).select("u")
        n_keep = keep.count()
        if n_keep == 0:
            out = nh.select("id").limit(0).withColumn("core_degree", F.lit(0).cast("long"))
            return (out, rounds) if return_rounds else out
        if n_keep == prev_n:
            break
        prev_n = n_keep
        rounds += 1
        und = (
            und.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("core_degree"))
    else:
        # one extra verification pass beyond max_rounds: a graph that
        # converges in EXACTLY max_rounds prune rounds is converged, not
        # stuck — the fixpoint is only observable on the round after the
        # last prune (r7 ADVICE boundary finding)
        keep = deg.filter(F.col("core_degree") >= k).select("u")
        n_keep = keep.count()
        if n_keep == 0:
            out = nh.select("id").limit(0).withColumn("core_degree", F.lit(0).cast("long"))
            return (out, rounds) if return_rounds else out
        if n_keep != prev_n:
            raise RuntimeError(
                f"k_core did not converge in {max_rounds} rounds (deep peel chain); "
                "raise max_rounds"
            )
    out = nh.join(deg.filter(F.col("core_degree") >= k), nh.h == F.col("u")).select(
        "id", "core_degree"
    )
    return (out, rounds) if return_rounds else out


def coreness(
    nodes: DataFrame,
    edges: DataFrame,
    max_rounds: int = 100,
    return_rounds: bool = False,
) -> DataFrame:
    """(id, coreness): every node's core NUMBER — the largest k for which the
    node belongs to the k-core — under the same undirected simple-graph view
    as :func:`k_core`.  This is the full decomposition the GDS call returns
    (gds.kcore gives per-node coreValue; the reference exposes the GDS family
    via neo4j_metrics_utils.py:8-190) where :func:`k_core` answers only
    membership at a single k.

    Algorithm: distributed h-index iteration (Lü et al., "The H-index of a
    network node"; Montresor et al., "Distributed k-core decomposition") —
    start every node at its degree, then repeatedly set
    ``c(v) = H({c(u) : u ~ v})``, the largest h such that at least h
    neighbors currently have value >= h.  The sequence is monotone
    non-increasing (H of a list never exceeds its length) and its fixpoint
    is exactly the coreness, so extra rounds past convergence are no-ops —
    which is what makes the DuckDB oracle a fixed unroll of the same update.
    Isolated nodes have coreness 0.

    Per round: one join (neighbor value lookup), one window (descending rank
    within each node's neighbor list), one partial-agg max of
    ``least(rank, value)`` — all on 8-byte hashed keys, lineage truncated per
    round.  Rounds needed is the graph's "h-index depth", empirically a
    handful on real graphs (vs one full peel PER k for the naive
    k_core-sweep formulation, which at 100 TB would rescan the edge set
    k_max times).
    """
    from pyspark.sql.window import Window

    nh = nodes.select("id", F.xxhash64("id").alias("h")).distinct().localCheckpoint(eager=True)
    und = (
        _sym_edges(edges)
        .select(F.xxhash64("src").alias("u"), F.xxhash64("dst").alias("v"))
        .join(nh.select(F.col("h").alias("u")), "u", "left_semi")
        .join(nh.select(F.col("h").alias("v")), "v", "left_semi")
        .localCheckpoint(eager=True)
    )
    c = und.groupBy("u").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=True)
    w = Window.partitionBy("u").orderBy(F.col("cv").desc())
    rounds = 0
    # delta iteration: a node's h-index can only change when a NEIGHBOR's
    # value changed last round, so after round 1 only the frontier of such
    # nodes recomputes — on long-tailed peel chains the late rounds touch a
    # tiny fraction of the graph instead of re-sorting every posting list
    affected = None  # None = all nodes (first round)
    for _ in range(max_rounds):
        rounds += 1
        scope = und if affected is None else und.join(affected, "u", "left_semi")
        nbr = scope.join(c.select(F.col("u").alias("v"), F.col("c").alias("cv")), "v").select(
            "u", "cv"
        )
        upd = (
            nbr.withColumn("rn", F.row_number().over(w))
            .groupBy("u")
            .agg(F.max(F.least(F.col("rn"), F.col("cv"))).alias("nc"))
            .join(c, "u")
            .filter(F.col("nc") != F.col("c"))
            .select("u", F.col("nc").alias("c"))
            .localCheckpoint(eager=True)
        )
        if upd.limit(1).count() == 0:
            break
        # lineage: upd is checkpointed above (it is also counted), so c's
        # plan only deepens by one cheap anti-join+union per round —
        # consolidate with a checkpoint every 3rd round instead of paying a
        # full-frame materialization per round (the pagerank cadence)
        c = c.join(upd.select("u"), "u", "left_anti").unionByName(upd)
        if rounds % 3 == 0:
            c = c.localCheckpoint(eager=True)
        affected = (
            und.join(upd.select(F.col("u").alias("v")), "v", "left_semi")
            .select("u")
            .distinct()
        )
    else:
        # Boundary: the fixpoint may be REACHED on exactly the max_rounds-th
        # update — convergence is only observable one round later.  Run one
        # verification recompute before declaring failure (same off-by-one
        # class as k_core's boundary-convergence pass).
        scope = und if affected is None else und.join(affected, "u", "left_semi")
        nbr = scope.join(
            c.select(F.col("u").alias("v"), F.col("c").alias("cv")), "v"
        ).select("u", "cv")
        upd = (
            nbr.withColumn("rn", F.row_number().over(w))
            .groupBy("u")
            .agg(F.max(F.least(F.col("rn"), F.col("cv"))).alias("nc"))
            .join(c, "u")
            .filter(F.col("nc") != F.col("c"))
        )
        if upd.limit(1).count() != 0:
            raise RuntimeError(
                f"coreness did not converge in {max_rounds} rounds; raise max_rounds"
            )
    out = (
        nh.join(c, nh.h == c.u, "left")
        .select("id", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("coreness"))
    )
    return (out, rounds) if return_rounds else out


def node_similarity(
    nodes: DataFrame,
    edges: DataFrame,
    top_k: int = 10,
    similarity_cutoff: float = 0.0,
    degree_cutoff: int = 1,
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """(id_a, id_b, intersection, union_size, jaccard): neighborhood Jaccard
    similarity between every node pair sharing >= 1 neighbor, top_k most
    similar partners per node.  GDS-family metric (gds.nodeSimilarity; the
    reference exposes the GDS family via neo4j_metrics_utils.py:8-190) over
    the same undirected simple-graph view as :func:`k_core` — GDS defaults to
    OUT-neighbors, but every traversal in this engine is bidirectional
    (graph_joins.py:undirected), so the undirected view is the consistent one.

    Shape: postings self-join on the shared neighbor (the same
    inverted-index trick as dedup.py:jaccard_pairs — pair candidates are
    generated per shared neighbor, never all-pairs), partial-agg count for
    the intersection, degrees joined back for |A ∪ B| = |A| + |B| - |A ∩ B|.

    Skew: a hub neighbor with degree d fans out d² candidate rows.
    ``max_neighbor_degree`` drops postings THROUGH such hubs (the max_df
    analog — at web scale a "shares the homepage" neighbor carries no
    similarity signal anyway); documented approximation, default exact.
    ``degree_cutoff`` is GDS's own knob: nodes with fewer neighbors than
    this produce no output rows.  Ties at equal jaccard break by partner id
    (ascending) so top_k is deterministic.
    """
    nh = nodes.select("id", F.xxhash64("id").alias("h")).distinct().localCheckpoint(eager=True)
    und = (
        _sym_edges(edges)
        .select(F.xxhash64("src").alias("u"), F.xxhash64("dst").alias("v"))
        .join(nh.select(F.col("h").alias("u")), "u", "left_semi")
        .join(nh.select(F.col("h").alias("v")), "v", "left_semi")
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    post = und.join(deg.filter(F.col("deg") >= degree_cutoff).select("u"), "u", "left_semi")
    if max_neighbor_degree is not None:
        # no explicit broadcast hint: the threshold VALUE says nothing about
        # how many nodes fall under it (most nodes on a power-law graph do),
        # so `thin` can be node-sized — let AQE pick the join strategy from
        # the actual runtime size (r7 ADVICE finding)
        thin = deg.filter(F.col("deg") <= max_neighbor_degree).select(F.col("u").alias("v"))
        post = post.join(thin, "v", "left_semi")
    a = post.select(F.col("u").alias("ua"), "v")
    b = post.select(F.col("u").alias("ub"), "v")
    inter = (
        a.join(b, "v")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    sized = (
        inter.join(deg.select(F.col("u").alias("ua"), F.col("deg").alias("da")), "ua")
        .join(deg.select(F.col("u").alias("ub"), F.col("deg").alias("db")), "ub")
        .select(
            "ua", "ub", "intersection",
            (F.col("da") + F.col("db") - F.col("intersection")).alias("union_size"),
        )
        .withColumn("jaccard", F.col("intersection") / F.col("union_size"))
        .filter(F.col("jaccard") >= similarity_cutoff)
    )
    # emit both directions (GDS does), map hashes back to ids, then top_k per
    # source — the window ranks only the cutoff survivors
    both = sized.unionByName(
        sized.select(
            F.col("ub").alias("ua"), F.col("ua").alias("ub"),
            "intersection", "union_size", "jaccard",
        )
    )
    named = (
        both.join(nh.select(F.col("h").alias("ua"), F.col("id").alias("id_a")), "ua")
        .join(nh.select(F.col("h").alias("ub"), F.col("id").alias("id_b")), "ub")
        .select("id_a", "id_b", "intersection", "union_size", "jaccard")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id_a").orderBy(F.col("jaccard").desc(), F.col("id_b"))
    return (
        named.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .drop("rn")
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    n_rounds: int = 5,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(id, label): synchronous label propagation community detection for a
    FIXED number of rounds — GDS-family (gds.labelPropagation) companion to
    :func:`connected_components` (which finds connectivity, not density
    communities).

    Each round every node adopts the most frequent label among its neighbors
    (undirected simple-graph view), ties broken by smallest label value;
    isolated nodes keep their own label.  Synchronous LPA can oscillate on
    bipartite structures, so the round count is a PARAMETER of the result,
    not a convergence heuristic — fixed rounds is also what makes the output
    deterministic enough to oracle-check (the DuckDB restatement unrolls the
    same rounds over the same seeded labels).

    Labels start as seeded 64-bit hashes of the node id (``hasher`` as in
    operators/dedup.py:_hash64 — ``md5_64`` has a bit-identical DuckDB
    mirror; ``xxhash64`` is the faster production default).  Per round: one
    join (neighbor label lookup), one partial-agg count, one min_by pick —
    all on 8-byte keys, lineage truncated per round.
    """
    from cognee_graphdb_spark.operators.dedup import _hash64

    nh = (
        nodes.select("id", _hash64(F.col("id"), 0, hasher).alias("h"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    und = (
        _sym_edges(edges)
        .select(
            _hash64(F.col("src"), 0, hasher).alias("u"),
            _hash64(F.col("dst"), 0, hasher).alias("v"),
        )
        .join(nh.select(F.col("h").alias("u")), "u", "left_semi")
        .join(nh.select(F.col("h").alias("v")), "v", "left_semi")
        .localCheckpoint(eager=True)
    )
    labels = nh.select(F.col("h").alias("u"), F.col("h").alias("label"))
    for _ in range(n_rounds):
        nbr = und.join(labels.select(F.col("u").alias("v"), "label"), "v").select("u", "label")
        cnt = nbr.groupBy("u", "label").agg(F.count(F.lit(1)).alias("c"))
        # most frequent neighbor label, tie -> smallest label value
        pick = cnt.groupBy("u").agg(
            F.min_by("label", F.struct((-F.col("c")).alias("nc"), F.col("label"))).alias("nl")
        )
        labels = (
            labels.join(pick, "u", "left")
            .select("u", F.coalesce("nl", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return nh.join(labels, nh.h == labels.u).select("id", "label")


def _hashed_edge_view(edges: DataFrame, symmetric: bool, hasher: str):
    """(eh, names): the hashed distinct simple-graph edge view and the
    id<->hash map over every endpoint — ONE definition for the walk samplers
    and :func:`shortest_path_counts`, or their edge semantics desync from
    the driver oracles.  ``names`` doubles as the final hash->id join frame."""
    from cognee_graphdb_spark.operators.dedup import _hash64

    base = edges.select("src", "dst")
    if symmetric:
        pairs = base.unionByName(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:
        pairs = base
    eh = (
        pairs.filter(F.col("src") != F.col("dst"))
        .select(
            _hash64(F.col("src"), 0, hasher).alias("u"),
            _hash64(F.col("dst"), 0, hasher).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    names = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", _hash64(F.col("id"), 0, hasher).alias("h"))
        .localCheckpoint(eager=True)
    )
    return eh, names


def _walk_graph(edges: DataFrame, symmetric: bool, hasher: str):
    """Shared walk-sampler state on top of :func:`_hashed_edge_view`:
    (edge view, rank-ordered adjacency with degree, per-node degree frame,
    id<->hash map) — ONE definition for :func:`random_walks` and
    :func:`node2vec_walks`, or their neighbor order desyncs from the driver
    oracles."""
    from pyspark.sql.window import Window

    eh, names = _hashed_edge_view(edges, symmetric, hasher)
    pw = Window.partitionBy("u")
    adj = eh.select(
        "u",
        "v",
        (F.row_number().over(pw.orderBy("v")) - F.lit(1)).alias("rank"),
        F.count(F.lit(1)).over(pw).alias("degree"),
    ).localCheckpoint(eager=True)
    deg = adj.select("u", "degree").groupBy("u").agg(F.first("degree").alias("degree"))
    return eh, adj, deg, names


def _uniform_pick(frontier: DataFrame, deg: DataFrame, adj: DataFrame, t: int, seed: int, hasher: str):
    """One hash-mod-degree neighbor pick: frontier (start, walk, cur) ->
    (start, walk, prev, cur) — the uniform step rule shared by
    :func:`random_walks` (every step) and :func:`node2vec_walks` (step 1)."""
    from cognee_graphdb_spark.operators.dedup import _hash64

    pick = frontier.join(deg, frontier.cur == deg.u).select(
        "start",
        "walk",
        "cur",
        F.pmod(
            _hash64(
                F.concat_ws("|", F.col("start"), F.col("walk"), F.lit(t), F.col("cur")),
                seed,
                hasher,
            ),
            F.col("degree"),
        ).alias("idx"),
    )
    return pick.join(adj, (pick.cur == adj.u) & (pick.idx == adj.rank)).select(
        "start", "walk", F.col("cur").alias("prev"), F.col("v").alias("cur")
    )


def wl_refinement(
    nodes: DataFrame,
    edges: DataFrame,
    n_rounds: int = 3,
    label_col: str | None = None,
) -> DataFrame:
    """(id, wl_label): Weisfeiler–Lehman color refinement — each round every
    node's label becomes md5(own label | sorted neighbor labels) over the
    undirected simple-graph view.  After t rounds two nodes share a label
    only if their t-hop rooted neighborhoods are (WL-)indistinguishable —
    the classic structural-role fingerprint (WL graph kernels,
    Shervashidze et al., JMLR'11) and a structural dedup key: hash the
    sorted multiset of final labels and two graphs with different hashes are
    guaranteed non-isomorphic.

    Seeds from ``label_col`` (e.g. a type column) or the constant "·" for
    pure structure.  Deterministic by construction — the neighbor multiset
    is sorted before hashing, so the result is independent of partitioning
    and restatable in SQL (md5 + list(... ORDER BY ...) + string concat).

    Scale: per round one label-lookup equi-join + one grouped sorted-list
    aggregation; rows are (8-byte-joinable id, 32-char label).  The
    collect_list is per-node neighbor-sized — the same max-degree memory
    bound node_similarity carries; lineage checkpoint-truncated per round.
    """
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    # a NULL typed seed must not poison the node (md5(NULL)=NULL propagates
    # through every round and collect_list drops NULLs from neighbors'
    # multisets, silently breaking the non-isomorphism guarantee) — map it
    # to a sentinel no real label collides with
    seed = (
        F.coalesce(F.col(label_col).cast("string"), F.lit("\x00null"))
        if label_col
        else F.lit("·")
    )
    # collapse to ONE seed per id: an id carrying two distinct label values
    # would otherwise survive .distinct() as duplicate (id, wl_label) rows
    # that persist through every round and double-count the node in its
    # neighbors' multisets.  md5 over the sorted distinct label set is
    # deterministic and, for the common single-label case, identical to
    # md5(label) (concat_ws of a singleton is the bare string).
    labels = (
        nodes.select("id", seed.alias("s0"))
        .groupBy("id")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_set("s0")))).alias("wl_label"))
    )
    sym = _sym_edges(edges).localCheckpoint(eager=True)
    for _ in range(n_rounds):
        nbr = sym.join(
            labels.select(F.col("id").alias("dst"), F.col("wl_label").alias("nl")), "dst"
        ).select(F.col("src").alias("id"), "nl")
        combined = (
            nbr.groupBy("id")
            .agg(F.concat_ws("|", F.array_sort(F.collect_list("nl"))).alias("ns"))
        )
        labels = (
            labels.join(combined, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat(F.col("wl_label"), F.lit("#"), F.coalesce("ns", F.lit("")))
                ).alias("wl_label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(label, n_nodes, sym_within, total_degree, contrib_scaled): Newman
    modularity contributions per community, in EXACT integer arithmetic —
    the quality score that tells you whether :func:`label_propagation` (or
    any clustering) found real structure (gds community metrics family).

    Over the DISTINCT undirected simple-graph view with S = 2m directed
    pairs: Q = sum_c [ S_c/S - (d_c/S)^2 ] where S_c counts within-community
    pairs (both directions) and d_c the community's total degree.  Rather
    than summing per-community FLOATS (order-dependent), this returns
    contrib_scaled = S*S_c - d_c^2 per community, so
    Q = sum(contrib_scaled) / S^2 with ONE division at the very end —
    bit-exact in any engine, any partitioning.  ``s_total`` rides along on
    every row for that final division.  Communities with no internal edges
    (or no edges at all) still get a row with zeros via the label frame.

    ``labels`` is an (id, label) frame, e.g. :func:`label_propagation`
    output.  Scale: two label-lookup equi-joins on the edge view + three
    partial aggregations — one pass over edges, label-sized results; S joins
    back as a 1-row broadcast.
    """
    sym = _sym_edges(edges)
    lab = labels.select(F.col("id").alias("u"), "label").distinct()
    lu = lab.select("u", F.col("label").alias("lu"))
    lv = lab.select(F.col("u").alias("v"), F.col("label").alias("lv"))
    tagged = sym.join(lu, sym.src == lu.u).join(lv, sym.dst == lv.v)
    within = (
        tagged.filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count(F.lit(1)).alias("sym_within"))
    )
    degree = tagged.groupBy(F.col("lu").alias("label")).agg(
        F.count(F.lit(1)).alias("total_degree")
    )
    sizes = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_nodes"))
    # S counts the LABEL-COVERED edge view (both endpoints labeled) — the
    # same view S_c and d_c count, so Q is Newman Q of the labeled subgraph
    # even when ``labels`` covers only part of the graph (mixing denominators
    # would mis-scale Q for partial clusterings)
    s_total = tagged.agg(F.count(F.lit(1)).alias("s_total"))
    out = (
        sizes.join(within, "label", "left")
        .join(degree, "label", "left")
        .crossJoin(F.broadcast(s_total))
        .select(
            "label",
            "n_nodes",
            F.coalesce("sym_within", F.lit(0)).alias("sym_within"),
            F.coalesce("total_degree", F.lit(0)).alias("total_degree"),
            "s_total",
        )
    )
    # exact arithmetic in decimal(38,0): S*S_c and d_c^2 reach S^2, which
    # wraps BIGINT silently (non-ANSI Spark) once S = 2m exceeds ~3.0e9
    # (m > ~1.5e9 edges) — exactly the 100 TB regime.  decimal(19,0) inputs
    # multiply to decimal(38,0); values stay far below 10^38.
    d = lambda c: F.col(c).cast("decimal(19,0)")
    contrib = d("s_total") * d("sym_within") - d("total_degree") * d("total_degree")
    return out.select(
        "label",
        "n_nodes",
        "sym_within",
        "total_degree",
        "s_total",
        contrib.cast("decimal(38,0)").alias("contrib_scaled"),
    )


def modularity_score(per_community: DataFrame) -> float:
    """Scalar Q from :func:`modularity` output — sum the exact integer
    contributions, divide once (bounded collect: one row)."""
    row = per_community.agg(
        F.sum("contrib_scaled").alias("num"), F.first("s_total").alias("s")
    ).collect()[0]
    if not row["s"]:
        return 0.0
    return float(row["num"]) / float(row["s"] * row["s"])


def conductance(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(label, n_nodes, internal, boundary, volume, s_total,
    conductance_ppm): per-community conductance — the GDS community-quality
    metric next to :func:`modularity` (gds.conductance; the reference's
    metric surface is the GDS family, cognee reference
    neo4j_driver/neo4j_metrics_utils.py:8-190 — same family, per-community
    quality of any clustering such as :func:`louvain` output).

    Over the DISTINCT undirected simple-graph view restricted to edges with
    BOTH endpoints labeled (the same scoping rule as :func:`modularity`):
    for community C, ``internal`` counts ordered pairs staying inside C,
    ``boundary`` counts ordered pairs leaving C, ``volume`` = internal +
    boundary = the community's total degree, and conductance is the GDS
    definition boundary / volume (0 for an isolated or edgeless community).
    All components are exact BIGINT counts; the ratio is quantized to ppm
    with one ROUND so it hashes identically in any engine —
    ``conductance_ppm = round(1e6 * boundary / volume)``.

    Scale: two label-lookup equi-joins on the edge view + one label-sized
    partial aggregation — one pass over edges, label-sized result; same
    shuffle shape as :func:`modularity` (the two share the tagged view's
    plan; label skew lands in a count-only partial agg, no row carry).
    """
    sym = _sym_edges(edges)
    lab = labels.select(F.col("id").alias("u"), "label").distinct()
    lu = lab.select("u", F.col("label").alias("lu"))
    lv = lab.select(F.col("u").alias("v"), F.col("label").alias("lv"))
    tagged = sym.join(lu, sym.src == lu.u).join(lv, sym.dst == lv.v)
    per = tagged.groupBy(F.col("lu").alias("label")).agg(
        F.sum(F.when(F.col("lu") == F.col("lv"), 1).otherwise(0)).alias("internal"),
        F.sum(F.when(F.col("lu") != F.col("lv"), 1).otherwise(0)).alias("boundary"),
    )
    sizes = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_nodes"))
    s_total = tagged.agg(F.count(F.lit(1)).alias("s_total"))
    out = (
        sizes.join(per, "label", "left")
        .crossJoin(F.broadcast(s_total))
        .select(
            "label",
            "n_nodes",
            F.coalesce("internal", F.lit(0)).cast("long").alias("internal"),
            F.coalesce("boundary", F.lit(0)).cast("long").alias("boundary"),
            "s_total",
        )
    )
    vol = F.col("internal") + F.col("boundary")
    return out.select(
        "label",
        "n_nodes",
        "internal",
        "boundary",
        vol.alias("volume"),
        "s_total",
        F.when(vol == 0, F.lit(0))
        .otherwise(
            F.round(F.lit(1000000.0) * F.col("boundary") / vol).cast("long")
        )
        .alias("conductance_ppm"),
    )


def _louvain_local_moves(
    adj: DataFrame,
    deg: DataFrame,
    t_row: DataFrame,
    labels: DataFrame,
    n_rounds: int,
) -> DataFrame:
    """The synchronous local-move rounds shared by :func:`louvain` and
    :func:`leiden`: each node adopts the candidate community maximizing the
    exact-integer gain score T·k_ic − k_i·(K_c − [c=own]·k_i), with the
    Lu et al. singleton-swap guard and (gain desc, label asc) tie-break.
    ``labels`` is the initial (u, label) partition — singletons for louvain;
    leiden's aggregate levels seed it with the previous coarse partition.
    Extracted verbatim from louvain's loop: the a2_louvain oracle unrolls
    exactly these rounds."""
    from pyspark.sql import Observation

    d = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    nonself = adj.filter(F.col("u") != F.col("v"))
    for _ in range(n_rounds):
        # ONE label-sized shuffle for both community aggregates: deg and
        # labels are 1-row-per-u frames, so count(*) of the joined frame IS
        # the community size — kc and sz used to be two separate groupBys
        # (two exchanges) over the same key
        kcsz = (
            deg.join(labels, "u")
            .groupBy("label")
            .agg(F.sum("k").alias("kc"), F.count(F.lit(1)).alias("sz"))
        )
        sz = kcsz.select("label", "sz")
        kic = (
            nonself.join(
                labels.select(F.col("u").alias("v"), F.col("label").alias("c")), "v"
            )
            .groupBy("u", "c")
            .agg(F.sum("w").alias("kic"))
        )
        # the own community is always a candidate (isolated nodes stay
        # put); summing the zero row in keeps neighbor-derived k_{i,own}
        own0 = labels.select(
            "u", F.col("label").alias("c"), F.lit(0).cast("long").alias("kic")
        )
        cand = (
            kic.unionByName(own0).groupBy("u", "c").agg(F.sum("kic").alias("kic"))
        )
        sc = (
            cand.join(deg, "u")
            .join(
                kcsz.select(F.col("label").alias("c"), "kc", F.col("sz").alias("c_sz")),
                "c",
            )
            .join(labels.select("u", F.col("label").alias("own")), "u")
            .join(sz.select(F.col("label").alias("own"), F.col("sz").alias("own_sz")), "own")
            .crossJoin(F.broadcast(t_row))
        )
        # singleton-swap guard (Lu et al. 2015): drop singleton->larger-
        # label-singleton candidates; own stays a candidate always
        sc = sc.filter(
            (F.col("c") == F.col("own"))
            | ~(
                (F.col("own_sz") == 1)
                & (F.col("c_sz") == 1)
                & (F.col("c") > F.col("own"))
            )
        )
        score = d("t") * d("kic") - d("k") * (
            F.col("kc")
            - F.when(F.col("c") == F.col("own"), F.col("k")).otherwise(F.lit(0))
        ).cast("decimal(19,0)")
        # fixpoint early exit: if no label moved, every later round picks
        # the same argmax again (scores are a function of labels alone),
        # so skipping the rest is OUTPUT-IDENTICAL to unrolling n_rounds
        # — the oracle's fixed unroll stays exact — and a converged level
        # stops paying for its remaining rounds.  The moved count rides the
        # checkpoint job as an Observation metric (`own` is constant per u,
        # so first() is deterministic) instead of a separate join+count job
        # per round.
        obs = Observation()
        new_labels = (
            sc.select("u", "c", "own", score.alias("score"))
            .groupBy("u")
            .agg(
                F.min_by(
                    "c", F.struct((-F.col("score")).alias("ns"), F.col("c").alias("c"))
                ).alias("label"),
                F.first("own").alias("__own"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("label") != F.col("__own"), 1).otherwise(0)
                ).alias("moved"),
            )
            .select("u", "label")
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        # sum() over an empty frame observes None — coalesce explicitly
        # (an empty node set IS converged) rather than rely on None being
        # falsy (the weighted_sssp discipline)
        if not (obs.get["moved"] or 0):
            break
    return labels


def louvain(
    nodes: DataFrame,
    edges: DataFrame,
    n_levels: int = 2,
    n_rounds: int = 3,
    hasher: str = "xxhash64",
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """(id, label): Louvain community detection — the flagship GDS community
    algorithm (gds.louvain; the reference's metric surface is the GDS family,
    cognee reference neo4j_driver/neo4j_metrics_utils.py) — synchronous
    local-move rounds + graph contraction between levels, deterministic and
    exact-integer end to end.

    Per LEVEL, every node starts in its own community and runs ``n_rounds``
    synchronous local-move rounds: it adopts the candidate community c (its
    neighbors' communities or its own) maximizing the exact-integer
    modularity gain surrogate

        score(i, c) = T·k_{i,c} − k_i·(K_c − [i ∈ c]·k_i)

    where T = Σ k_u is the total ordered-pair weight (the same S = 2m
    :func:`modularity` divides by — constant across levels because
    contraction preserves degrees), k_{i,c} the weight from i to c, and K_c
    the community's total degree.  score differences equal ΔQ·T²/2, so the
    argmax is the max-modularity-gain move; ties break by (gain desc, label
    asc) — the same determinism contract as :func:`label_propagation`'s
    fixed synchronous rounds (round/level counts are PARAMETERS of the
    result, which is what lets a DuckDB oracle unroll them exactly).

    Synchronous moves between two adjacent SINGLETON communities oscillate
    (u adopts w while w adopts u, forever); the standard parallel-Louvain
    remedy (Lu, Halappanavar & Kalyanaraman 2015, §4 "vertex swap" heuristic)
    applies: a singleton may move into another singleton community only when
    the target label is SMALLER — the pair then collapses onto the smaller
    label in one round instead of swapping.  Non-singleton moves are
    unrestricted.

    Between levels the graph CONTRACTS (the :func:`incremental_components`
    contract-and-remap discipline): communities become super-nodes, ordered-
    pair weights sum, within-community weight becomes a self-row that rides
    into the super-node's degree — Q of any partition of the contracted
    graph equals Q of the corresponding partition of the original (pytest-
    pinned), which is the invariant that makes multi-level Louvain correct.

    Scores use decimal(38,0): T·k_{i,c} reaches S², past BIGINT once
    S = 2m > ~3.0e9 (the 100 TB regime) — same overflow guard as
    :func:`modularity`; the OUTPUT (id, label) stays integer-hashed.
    Scale per round: one label-lookup equi-join on the (contracted) edge
    view + two label-sized partial aggs; T rides as a 1-row broadcast;
    lineage truncated per round; each level's graph is no larger — usually
    orders smaller — than the last.

    ``init_labels`` (an (id, label) frame, e.g. a previous run's output)
    WARM-STARTS level 0: known nodes begin in their previous community,
    unseen nodes as singletons — the streaming-maintenance seam
    (streaming/communities.py, the refresh_pagerank pattern).  Near a
    settled partition the local-move fixpoint early exit fires after the
    few rounds the CHANGE needs, not the rounds the graph needs; the warm
    result is a valid louvain partition of the current graph but not
    byte-equal to the cold one in general (quality parity is
    pytest-pinned).
    """
    from cognee_graphdb_spark.operators.dedup import _hash64

    if n_levels < 1 or n_rounds < 1:
        raise ValueError("n_levels and n_rounds must be >= 1")
    nh = (
        nodes.select("id", _hash64(F.col("id"), 0, hasher).alias("h"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    und = (
        _sym_edges(edges)
        .select(
            _hash64(F.col("src"), 0, hasher).alias("u"),
            _hash64(F.col("dst"), 0, hasher).alias("v"),
        )
        .join(nh.select(F.col("h").alias("u")), "u", "left_semi")
        .join(nh.select(F.col("h").alias("v")), "v", "left_semi")
        .localCheckpoint(eager=True)
    )
    # ordered-pair weighted adjacency; self rows appear after contraction
    # and carry the within-community ordered weight (both directions)
    adj = und.select("u", "v", F.lit(1).cast("long").alias("w"))
    node_ids = nh.select(F.col("h").alias("u"))
    mapping = nh.select("id", F.col("h").alias("cur"))

    for level in range(n_levels):
        deg = adj.groupBy("u").agg(F.sum("w").alias("k"))
        deg = (
            node_ids.join(deg, "u", "left")
            .select("u", F.coalesce("k", F.lit(0).cast("long")).alias("k"))
            .localCheckpoint(eager=True)
        )
        t_row = deg.agg(F.coalesce(F.sum("k"), F.lit(0)).alias("t"))
        labels = node_ids.select("u", F.col("u").alias("label"))
        if level == 0 and init_labels is not None:
            # warm start: adopt the previous partition where known; nodes
            # the previous run never saw stay singletons (their own hash —
            # 64-bit space, collision with a prior label is negligible)
            prev = nh.join(
                init_labels.select("id", F.col("label").cast("long").alias("pl")),
                "id",
            ).select(F.col("h").alias("u"), "pl")
            labels = (
                labels.join(prev, "u", "left")
                .select("u", F.coalesce("pl", F.col("label")).alias("label"))
                .localCheckpoint(eager=True)
            )
        labels = _louvain_local_moves(adj, deg, t_row, labels, n_rounds)
        mapping = (
            mapping.join(labels.select(F.col("u").alias("cur"), "label"), "cur")
            .select("id", F.col("label").alias("cur"))
            .localCheckpoint(eager=True)
        )
        if level < n_levels - 1:
            la = labels.select("u", F.col("label").alias("lu"))
            lb = labels.select(F.col("u").alias("v"), F.col("label").alias("lv"))
            adj = (
                adj.join(la, "u")
                .join(lb, "v")
                .groupBy(F.col("lu").alias("u"), F.col("lv").alias("v"))
                .agg(F.sum("w").alias("w"))
                .localCheckpoint(eager=True)
            )
            node_ids = labels.select(F.col("label").alias("u")).distinct()
    return mapping.select("id", F.col("cur").alias("label"))


def strongly_connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_outer: int = 32,
    max_rounds: int = 128,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(id, label): strongly connected components of the DIRECTED graph —
    the directed-graph complement to :func:`connected_components` in the GDS
    family (gds.scc; the reference's metric surface is the GDS family,
    cognee reference neo4j_driver/neo4j_metrics_utils.py, whose wcc is the
    undirected half).  ``label`` is the maximum node hash within the
    component, so two nodes share a label iff each reaches the other.

    Orzan-style coloring, the standard Pregel/label-propagation SCC:
    per outer round over the still-unassigned subgraph,

    1. FORWARD: color(v) = max hash of any unassigned node that reaches v —
       synchronous max-propagation along edges to a fixpoint.  Every color
       class has its root (the node whose own hash is the color) inside it.
    2. BACKWARD: within each color class, spread from the root along
       REVERSED edges — the nodes that both are reached by the root (same
       color) and reach the root (backward-marked) are exactly SCC(root).
    3. PEEL: assign those nodes label = color (= the component's max hash,
       peel-order-invariant, which is what makes a structural oracle
       possible), drop them, restrict edges to survivors, repeat.

    Determinism: pure max/propagation arithmetic, no randomness; the output
    is independent of partitioning and of peel order.  Fixpoint early exits
    everywhere; ``max_rounds`` bounds each propagation (component diameter
    rounds) and ``max_outer`` the peeling (SCC-DAG chain length along
    decreasing hashes) — exceeded caps RAISE rather than return a silently
    wrong partial answer.

    Scale: each propagation round is ONE equi-join of the (shrinking) edge
    list against the node-sized color frame + a max partial agg — the
    :func:`pagerank` round shape; backward rounds touch only the frontier's
    in-edges.  Peeling shrinks both frames monotonically; lineage truncated
    per round.  Like every label-propagation SCC (GraphFrames included),
    worst-case rounds scale with diameter — long path-shaped components pay
    the worst case, web/KG-shaped graphs peel in a handful of rounds.
    """
    from pyspark.sql import Observation

    from cognee_graphdb_spark.operators.dedup import _hash64

    if max_outer < 1 or max_rounds < 1:
        raise ValueError("max_outer and max_rounds must be >= 1")
    nh = (
        nodes.select("id", _hash64(F.col("id"), 0, hasher).alias("h"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e_all = (
        edges.select(
            _hash64(F.col("src"), 0, hasher).alias("u"),
            _hash64(F.col("dst"), 0, hasher).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .join(nh.select(F.col("h").alias("u")), "u", "left_semi")
        .join(nh.select(F.col("h").alias("v")), "v", "left_semi")
        .localCheckpoint(eager=True)
    )
    remaining = nh.select("h").localCheckpoint(eager=True)
    rem_edges = e_all
    assigned = None
    rem_n = None  # row count of `remaining`, observed at each peel
    for _outer in range(max_outer):
        if (rem_n if rem_n is not None else remaining.limit(1).count()) == 0:
            break
        # 1. forward max-color propagation to fixpoint
        colors = remaining.select("h", F.col("h").alias("color"))
        for _r in range(max_rounds):
            upd = (
                rem_edges.join(
                    colors.select(F.col("h").alias("u"), F.col("color").alias("cu")),
                    "u",
                )
                .groupBy(F.col("v").alias("h"))
                .agg(F.max("cu").alias("nc"))
            )
            # moved count rides the checkpoint job as an Observation metric
            # instead of a separate join+count job per round
            obs = Observation()
            new_colors = (
                colors.join(upd, "h", "left")
                .select(
                    "h",
                    F.col("color").alias("__prev"),
                    F.greatest("color", F.coalesce("nc", "color")).alias("color"),
                )
                .observe(
                    obs,
                    F.sum(
                        F.when(F.col("color") != F.col("__prev"), 1).otherwise(0)
                    ).alias("moved"),
                )
                .select("h", "color")
                .localCheckpoint(eager=True)
            )
            colors = new_colors
            if not obs.get["moved"]:
                break
        else:
            raise RuntimeError(
                f"scc forward propagation did not converge in {max_rounds} rounds"
            )
        # 2. backward spread from roots within each color class — frontier-
        # optimized (the weighted_sssp discipline): a node joins when any
        # out-neighbor enters, and neighbors enter exactly once, so only the
        # LAST round's additions need their in-edges scanned; total backward
        # work is one pass over the touched edges, not rounds × |within|
        in_scc = colors.filter(F.col("h") == F.col("color")).localCheckpoint(eager=True)
        tagged = rem_edges.join(
            colors.select(F.col("h").alias("u"), F.col("color").alias("cu")), "u"
        ).join(colors.select(F.col("h").alias("v"), F.col("color").alias("cv")), "v")
        within = (
            tagged.filter(F.col("cu") == F.col("cv"))
            .select("u", "v", F.col("cu").alias("color"))
            .localCheckpoint(eager=True)
        )
        frontier = in_scc
        for _r in range(max_rounds):
            # frontier emptiness rides the checkpoint job as a row count
            # instead of a separate limit(1).count() job per round
            obs = Observation()
            new = (
                within.join(frontier.select(F.col("h").alias("v")), "v", "left_semi")
                .select(F.col("u").alias("h"), "color")
                .distinct()
                .join(in_scc.select("h"), "h", "left_anti")
                .observe(obs, F.count(F.lit(1)).alias("n"))
                .localCheckpoint(eager=True)
            )
            if obs.get["n"] == 0:
                break
            in_scc = in_scc.unionByName(new).localCheckpoint(eager=True)
            frontier = new
        else:
            raise RuntimeError(
                f"scc backward propagation did not converge in {max_rounds} rounds"
            )
        # 3. peel: assign label = color, restrict to survivors
        batch = in_scc.select("h", F.col("color").alias("label"))
        assigned = batch if assigned is None else assigned.unionByName(batch)
        assigned = assigned.localCheckpoint(eager=True)
        rem_obs = Observation()
        remaining = (
            remaining.join(batch.select("h"), "h", "left_anti")
            .observe(rem_obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        rem_n = rem_obs.get["n"]
        rem_edges = (
            rem_edges.join(remaining.select(F.col("h").alias("u")), "u", "left_semi")
            .join(remaining.select(F.col("h").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    if (rem_n if rem_n is not None else remaining.limit(1).count()) != 0:
        raise RuntimeError(f"scc peeling did not finish in {max_outer} outer rounds")
    if assigned is None:
        return nodes.select("id").limit(0).select(
            "id", F.lit(0).cast("long").alias("label")
        )
    return nh.join(assigned, "h").select("id", "label")


def _min_label_components(
    node_ids: DataFrame, within: DataFrame, max_rounds: int
) -> DataFrame:
    """(u, ref): synchronous min-label spreading over ``within`` (a symmetric
    (u, v) edge frame) from ref_0 = u, with a fixpoint early exit — each
    node's final ref is the minimum node key in its connected component.
    Output-identical to any >= convergence unroll, which is what lets a SQL
    oracle restate it with a fixed round count.  ``max_rounds`` bounds the
    worst case (component diameter rounds); leiden's refinement graphs are
    the INSIDES of local-move communities — dense, small-diameter by
    construction — so the bound is a guard rail, not the expected path."""
    from pyspark.sql import Observation

    def _round(nbr: DataFrame, prev: DataFrame):
        # the moved count rides the checkpoint job as an Observation metric
        # (old ref vs new ref, both present pre-projection) instead of a
        # separate join+count job per round; __prev stays IN the checkpoint
        # so the next round's changed-set is a free filter over it
        obs = Observation()
        ck = (
            prev.join(nbr, "u", "left")
            .select(
                "u",
                F.col("ref").alias("__prev"),
                F.least("ref", F.coalesce("nref", "ref")).alias("ref"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("ref") != F.col("__prev"), 1).otherwise(0)
                ).alias("moved"),
            )
            .localCheckpoint(eager=True)
        )
        return ck, (obs.get["moved"] or 0)

    # round 1 fused (r13): ref_0 = u makes the neighbor-ref lookup the
    # identity, so min(ref of v) IS min(v) — the full `within ⋈ refs`
    # shuffle join the generic round paid carried no information
    nbr = within.groupBy("u").agg(F.min("v").alias("nref"))
    ck, moved = _round(nbr, node_ids.select("u", F.col("u").alias("ref")))
    # rounds 2+: DELTA propagation — only refs that CHANGED last round are
    # delivered.  Output-identical per round: an unchanged neighbor's ref
    # was delivered the round after it last changed and min() is idempotent,
    # so re-delivering it can never lower a running minimum again.  The
    # changed set shrinks geometrically, so the per-round join touches a
    # vanishing fraction of `within` instead of all of it.
    for _ in range(max_rounds - 1):
        if not moved:
            break
        changed = ck.filter(F.col("ref") != F.col("__prev")).select(
            F.col("u").alias("v"), F.col("ref")
        )
        nbr = (
            within.join(changed, "v")
            .groupBy("u")
            .agg(F.min("ref").alias("nref"))
        )
        ck, moved = _round(nbr, ck.select("u", "ref"))
    return ck.select("u", "ref")


def leiden(
    nodes: DataFrame,
    edges: DataFrame,
    n_levels: int = 2,
    n_rounds: int = 2,
    refine_rounds: int = 8,
    hasher: str = "xxhash64",
    final_refine: bool = True,
) -> DataFrame:
    """(id, label): Leiden community detection (gds.leiden — the successor
    to :func:`louvain` in the GDS community family; Traag, Waltman &
    van Eck 2019): the same exact-integer synchronous local-move rounds,
    plus a REFINEMENT phase between local moves and contraction that
    guarantees what Louvain famously violates — every aggregated community
    is internally CONNECTED (Traag et al.'s central defect report: Louvain
    can strand a community's members with no internal path once a bridge
    node moves out).

    Per level:
    1. local moves — :func:`_louvain_local_moves`, the shared exact-integer
       gain argmax (level 0 from singletons; aggregate levels SEEDED with
       the previous coarse partition, which is how Leiden carries the
       partition across levels instead of restarting).
    2. refinement — the deterministic connectivity core of Traag et al.'s
       randomized merge phase: split every coarse community into its
       connected components (min-label spreading over within-community
       edges; a community that is internally connected is kept whole).
    3. contraction on the REFINED partition (communities -> super-nodes,
       ordered-pair weights summed, within-weight as self rows), with the
       aggregate's initial labels = each refined super-node's COARSE label
       — so the next level's local moves can re-merge or re-split refined
       pieces across coarse boundaries, exactly the freedom that lets
       Leiden escape Louvain's local optima.

    The final partition is the last level's coarse labels with one more
    connectivity refinement applied (``final_refine``, default on): the
    last local-move phase can — exactly like any single Louvain pass —
    strand a just-vacated community internally disconnected, so the output
    is split into its connected components too.  This is a STRICT
    modularity improvement, never a trade: splitting a disconnected
    community loses no within-community edges while the degree-squared
    penalty sum drops (d_c² > d_c1² + d_c2²), so Q(final) >= Q(coarse) —
    pinned by pytest.  With it, EVERY returned community is internally
    connected, unconditionally.  Deterministic end to end: integer gain
    scores, (gain desc, label asc) tie-breaks, min-label component
    representatives — a fixed-round SQL unroll reproduces it exactly (the
    fixpoint early exits are output-identical to full unrolls).

    Scale: louvain's per-round cost (one label-lookup equi-join + two
    label-sized partial aggs) plus, per level, refine rounds of ONE
    equi-join + min partial agg on the within-community edge subset —
    strictly lighter rows than the local-move joins.  Contraction and
    lineage discipline identical to louvain.
    """
    from cognee_graphdb_spark.operators.dedup import _hash64

    if n_levels < 1 or n_rounds < 1 or refine_rounds < 1:
        raise ValueError("n_levels, n_rounds and refine_rounds must be >= 1")
    nh = (
        nodes.select("id", _hash64(F.col("id"), 0, hasher).alias("h"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    und = (
        _sym_edges(edges)
        .select(
            _hash64(F.col("src"), 0, hasher).alias("u"),
            _hash64(F.col("dst"), 0, hasher).alias("v"),
        )
        .join(nh.select(F.col("h").alias("u")), "u", "left_semi")
        .join(nh.select(F.col("h").alias("v")), "v", "left_semi")
        .localCheckpoint(eager=True)
    )
    adj = und.select("u", "v", F.lit(1).cast("long").alias("w"))
    node_ids = nh.select(F.col("h").alias("u"))
    mapping = nh.select("id", F.col("h").alias("cur"))
    init = node_ids.select("u", F.col("u").alias("label"))

    coarse = init
    for level in range(n_levels):
        deg = adj.groupBy("u").agg(F.sum("w").alias("k"))
        deg = (
            node_ids.join(deg, "u", "left")
            .select("u", F.coalesce("k", F.lit(0).cast("long")).alias("k"))
            .localCheckpoint(eager=True)
        )
        t_row = deg.agg(F.coalesce(F.sum("k"), F.lit(0)).alias("t"))
        coarse = _louvain_local_moves(adj, deg, t_row, init, n_rounds)
        if level == n_levels - 1:
            break
        # refinement: connected components WITHIN each coarse community.
        # Communities share no within-edges, so one global min-label pass
        # over the filtered edge set is per-community CC.
        la = coarse.select("u", F.col("label").alias("lu"))
        lb = coarse.select(F.col("u").alias("v"), F.col("label").alias("lv"))
        within = (
            adj.filter(F.col("u") != F.col("v"))
            .join(la, "u")
            .join(lb, "v")
            .filter(F.col("lu") == F.col("lv"))
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        refined = _min_label_components(node_ids, within, refine_rounds)
        # contract on the refined partition; the aggregate's initial labels
        # are the coarse labels (all members of a refined piece share one
        # coarse label by construction — refinement only splits)
        mapping = (
            mapping.join(refined.select(F.col("u").alias("cur"), "ref"), "cur")
            .select("id", F.col("ref").alias("cur"))
            .localCheckpoint(eager=True)
        )
        ra = refined.select("u", "ref")
        rb = refined.select(F.col("u").alias("v"), F.col("ref").alias("ref_v"))
        adj = (
            adj.join(ra, "u")
            .join(rb, "v")
            .groupBy(F.col("ref").alias("u"), F.col("ref_v").alias("v"))
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
        init = (
            refined.join(coarse, "u")
            .select(F.col("ref").alias("u"), "label")
            .distinct()
            .localCheckpoint(eager=True)
        )
        node_ids = init.select("u")
    if final_refine:
        # split the output partition into its connected components — the
        # guarantee-completing pass (strict Q improvement, see docstring)
        la = coarse.select("u", F.col("label").alias("lu"))
        lb = coarse.select(F.col("u").alias("v"), F.col("label").alias("lv"))
        within = (
            adj.filter(F.col("u") != F.col("v"))
            .join(la, "u")
            .join(lb, "v")
            .filter(F.col("lu") == F.col("lv"))
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        coarse = _min_label_components(node_ids, within, refine_rounds).select(
            "u", F.col("ref").alias("label")
        )
    final = mapping.join(
        coarse.select(F.col("u").alias("cur"), "label"), "cur"
    ).select("id", "label")
    return final


def random_walks(
    edges: DataFrame,
    walk_length: int = 4,
    num_walks: int = 1,
    seed: int = 0,
    hasher: str = "xxhash64",
    symmetric: bool = True,
) -> DataFrame:
    """(walk, start, step, node): DeepWalk-style deterministic random walks —
    GDS-family companion (gds.randomWalk / gds.node2vec's sampling stage) and
    the corpus generator a graph-embedding training pipeline feeds off.

    ``num_walks`` walks begin at EVERY endpoint node of the (optionally
    undirected) simple-graph view and take up to ``walk_length`` steps; a walk
    that reaches a node with no out-neighbors truncates (only possible with
    ``symmetric=False`` — sinks).  Step 0 is the start node itself, so every
    walk contributes at least one row.

    The "random" neighbor choice is a seeded 64-bit hash of
    ``start|walk|step|current`` taken mod the current node's degree, selecting
    the rank-th neighbor in neighbor-hash order (operators/dedup.py:_hash64;
    ``md5_64`` has a bit-identical DuckDB mirror, ``xxhash64`` is the faster
    production default).  A hash is a uniform choice that is REPRODUCIBLE —
    the property an exactly-restartable 100 TB corpus build needs and
    ``rand()`` cannot give — and because the choice at step t depends on the
    whole (start, walk, t, node) tuple, revisiting a node mid-walk re-rolls
    rather than looping deterministically.

    Scale: node ids are dictionary-hashed to 8 bytes once; the adjacency gets
    (rank, degree) via two window functions over ONE hash-partition of the
    edge set; each step is two co-partitioned equi-joins on bigint keys
    (frontier x degree on node, then (node, idx) x (node, rank)) — no
    crossJoin, no RNG, no driver loop over rows, and the frontier never
    exceeds |nodes| x num_walks rows.  Lineage is checkpoint-truncated every
    3 steps.  Reference family: neo4j gds procedures the adapter projects
    graphs for (neo4j_driver/adapter.py:1155-1196).
    """
    if walk_length < 1 or num_walks < 1:
        raise ValueError("walk_length and num_walks must be >= 1")

    eh, adj, deg, names = _walk_graph(edges, symmetric, hasher)
    frontier = names.select(
        F.col("h").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(num_walks - 1))).alias("walk"),
        F.col("h").alias("cur"),
    )
    steps = [frontier.select("start", "walk", F.lit(0).alias("step"), F.col("cur").alias("node"))]
    for t in range(1, walk_length + 1):
        frontier = _uniform_pick(frontier, deg, adj, t, seed, hasher).select(
            "start", "walk", "cur"
        )
        if t % 3 == 0 and t < walk_length:
            frontier = frontier.localCheckpoint(eager=True)
        steps.append(
            frontier.select("start", "walk", F.lit(t).alias("step"), F.col("cur").alias("node"))
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return (
        out.join(names.select(F.col("h").alias("start"), F.col("id").alias("start_id")), "start")
        .join(names.select(F.col("h").alias("node"), F.col("id").alias("node_id")), "node")
        .select(
            "walk",
            F.col("start_id").alias("start"),
            "step",
            F.col("node_id").alias("node"),
        )
    )


def shortest_path_counts(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
    symmetric: bool = True,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(source, node, dist, sigma): BFS hop distance AND number of distinct
    shortest paths from every source node — gds.allShortestPaths.stream's
    per-pair distances (neo4j_metrics_utils.py:140-168) extended with the
    path-count forward pass of Brandes' betweenness algorithm.  All integers,
    so the result crosses a SQL oracle exactly.

    ``sources`` is an (id) frame; distances are truncated at ``max_hops``
    (unreached pairs are absent, the reference's bounded-path convention —
    its own Cypher caps paths at 1..3 hops, kuzu adapter.py:1426-1451).
    sigma(s, v) = number of distinct shortest s→v paths; sigma(s, s) = 1.

    Scale: node ids dictionary-hashed to 8 bytes; per hop ONE frontier × adj
    equi-join, one (source, node) anti-join against the settled set, one
    partial-agg sum — frontier-sized shuffles, never edge-set-sized state.
    The settled set grows to the reached ball and is checkpoint-truncated
    per hop.  Cost is O(hops · frontier · avg_degree) per source — run with
    a sampled source set at 100 TB (the standard Brandes-sampling layout),
    exactly how gds.betweenness's samplingSize works.
    """
    from cognee_graphdb_spark.operators.dedup import _hash64

    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    eh, names = _hashed_edge_view(edges, symmetric, hasher)
    src_h = (
        sources.select(_hash64(F.col("id"), 0, hasher).alias("s"))
        .distinct()
        .join(names.select(F.col("h").alias("s")), "s", "left_semi")
    )
    frontier = src_h.select(
        "s", F.col("s").alias("n"), F.lit(1).cast("long").alias("sigma")
    ).localCheckpoint(eager=True)
    settled = frontier.select("s", "n", F.lit(0).alias("dist"), "sigma")
    out = [settled]
    for t in range(1, max_hops + 1):
        nxt = (
            frontier.join(eh, frontier.n == eh.u)
            .select("s", F.col("v").alias("n"), "sigma")
            .join(settled.select("s", "n"), ["s", "n"], "left_anti")
            .groupBy("s", "n")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        step = nxt.select("s", "n", F.lit(t).alias("dist"), "sigma")
        out.append(step)
        settled = settled.unionByName(step).localCheckpoint(eager=True)
        frontier = nxt
    res = out[0]
    for s in out[1:]:
        res = res.unionByName(s)
    return (
        res.join(names.select(F.col("h").alias("s"), F.col("id").alias("source")), "s")
        .join(names.select(F.col("h").alias("n"), F.col("id").alias("node")), "n")
        .select("source", "node", F.col("dist").cast("int").alias("dist"), "sigma")
    )


def betweenness_sampled(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
    symmetric: bool = True,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(node, betweenness): Brandes betweenness centrality accumulated from a
    SAMPLED source set — gds.betweenness with samplingSize, the 100 TB-honest
    layout (exact betweenness is all-sources Brandes, O(V·E); sampling gives
    an unbiased estimate scaled by V/|sources|, Brandes & Pich 2007).

    Forward pass: :func:`shortest_path_counts` (hop distance + path counts
    sigma per source).  Backward pass, per level t from the deepest frontier
    down: delta(s,v) = sum over DAG successors w (dist t+1) of
    sigma(s,v)/sigma(s,w) * (1 + delta(s,w)); betweenness(v) =
    sum over sources s != v of delta(s,v).  Unreached/leaf nodes contribute
    implicit zeros.  For undirected graphs each unordered pair is seen from
    both endpoints when both are sampled — divide by 2 for the classic
    normalization if the source set is all nodes.

    Determinism contract (what makes a float result oracle-checkable): both
    inner sums are STRICTLY ORDERED sequential reductions — successor
    contributions sorted by successor id, per-node source deltas sorted by
    source id — via array_sort + F.aggregate, never a shuffle-order groupBy
    sum, so the IEEE addition order is a pure function of the data and a SQL
    oracle (list(... ORDER BY ...) + sequential reduce) reproduces the exact
    bits.  The memory bound is one successor array per (source, node) —
    max-DAG-out-degree elements, the same bound node_similarity carries.

    Scale: each level is two co-partitioned equi-joins (settled level t x
    edge view x settled level t+1) + one grouped ordered reduction; levels
    are bounded by max_hops; state is frontier-sized per source.  Join keys
    are the string node ids shortest_path_counts emits — dictionary-encode
    upstream at extreme scale.
    """
    sp = shortest_path_counts(
        edges, sources, max_hops=max_hops, symmetric=symmetric, hasher=hasher
    ).localCheckpoint(eager=True)
    base = edges.select("src", "dst")
    if symmetric:
        pairs = base.unionByName(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:
        pairs = base
    ev = pairs.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint(eager=True)
    deepest = sp.agg(F.max("dist")).collect()[0][0]  # bounded: one scalar
    if deepest is None or int(deepest) < 1:
        # no sources in the graph, or every source isolated: no intermediate
        # nodes exist, so betweenness is empty (implicit zeros)
        return sp.select(
            F.col("node"), F.lit(0.0).alias("betweenness")
        ).limit(0)
    levels = []  # (source, node, delta) frames, deepest level first
    prev = None  # delta frame at level t+1
    for t in range(int(deepest) - 1, -1, -1):
        cur = sp.filter(F.col("dist") == t).select(
            "source", F.col("node").alias("v"), F.col("sigma").alias("sv")
        )
        nxt = sp.filter(F.col("dist") == t + 1).select(
            "source", F.col("node").alias("w"), F.col("sigma").alias("sw")
        )
        if prev is not None:
            nxt = nxt.join(
                prev.select("source", F.col("node").alias("w"), "delta"),
                ["source", "w"],
                "left",
            ).select("source", "w", "sw", F.coalesce("delta", F.lit(0.0)).alias("dw"))
        else:
            nxt = nxt.select("source", "w", "sw", F.lit(0.0).alias("dw"))
        contrib = (
            cur.join(ev, cur.v == ev.src)
            .join(nxt, (F.col("dst") == nxt.w) & (cur.source == nxt.source))
            .select(
                cur.source.alias("source"),
                "v",
                "w",
                (
                    (F.col("sv").cast("double") / F.col("sw").cast("double"))
                    * (F.lit(1.0) + F.col("dw"))
                ).alias("c"),
            )
        )
        dt = (
            contrib.groupBy("source", F.col("v").alias("node"))
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("w", "c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("delta")
            )
            .localCheckpoint(eager=True)
        )
        levels.append(dt)
        prev = dt
    acc_levels = levels[0]
    for frame in levels[1:]:
        acc_levels = acc_levels.unionByName(frame)
    return (
        acc_levels.filter(F.col("node") != F.col("source"))
        .groupBy("node")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("source", "delta"))),
                F.lit(0.0),
                lambda acc, x: acc + x["delta"],
            ).alias("betweenness")
        )
    )


def node2vec_walks(
    edges: DataFrame,
    walk_length: int = 4,
    num_walks: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 0,
    hasher: str = "xxhash64",
    symmetric: bool = True,
) -> DataFrame:
    """(walk, start, step, node): node2vec second-order biased walks (Grover
    & Leskovec, KDD'16; gds.node2vec's sampling stage) — the return
    parameter ``p`` and in-out parameter ``q`` bias each step toward
    backtracking (weight 1/p), staying in the triangle neighborhood
    (weight 1 for candidates adjacent to the PREVIOUS node), or exploring
    outward (weight 1/q).  ``p = q = 1`` degenerates to uniform
    (:func:`random_walks` is the cheaper first-order sampler for that case —
    it needs no per-candidate weighting joins).

    Determinism & cross-engine exactness: the weighted pick draws
    r = hash(start|walk|step|prev|cur) / 2^52 in [0, 1) and selects the
    candidate whose cumulative-weight interval contains r·W.  Cumulative
    weights are NOT float running sums (window float aggregation is
    implementation-ordered — DuckDB evaluates frames as segment trees):
    they are three INTEGER prefix-counts (how many prior candidates were
    return/triangle/outward) combined as (a·(1/p) + b) + c·(1/q) with fixed
    parenthesization — integer window sums are exact under any evaluation
    order, so both engines compute identical doubles.  The last candidate
    absorbs the r·W == W rounding edge.

    Step 1 has no previous node and uses :func:`random_walks`' uniform
    hash-mod-degree rule.  Scale per step: one frontier×adjacency equi-join
    (fan-out = degree), one (prev, candidate) equi-join against the edge set
    for the triangle flag, one window pass over candidates keyed by the walk
    — all co-partitioned on 8-byte hashes; frontier never exceeds
    |nodes| × num_walks.  The honest cost of EXACT second-order bias is the
    per-step candidate fan-out: walks parked on a hub materialize
    (walks-on-hub × hub-degree) candidate rows through a spillable WindowExec
    sort (GDS pays the equivalent as O(E) alias tables).  On hub-heavy
    graphs where that row count is prohibitive, :func:`random_walks` is the
    first-order sampler whose picks never materialize candidates.
    """
    from pyspark.sql.window import Window

    from cognee_graphdb_spark.operators.dedup import _hash64

    if walk_length < 1 or num_walks < 1:
        raise ValueError("walk_length and num_walks must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be > 0")
    inv_p, inv_q = 1.0 / p, 1.0 / q
    eh, adj, deg, names = _walk_graph(edges, symmetric, hasher)
    w0 = names.select(
        F.col("h").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(num_walks - 1))).alias("walk"),
        F.col("h").alias("cur"),
    )
    steps = [w0.select("start", "walk", F.lit(0).alias("step"), F.col("cur").alias("node"))]
    # step 1: uniform, no previous node (random_walks' rule, t=1)
    frontier = _uniform_pick(w0, deg, adj, 1, seed, hasher).localCheckpoint(eager=True)
    steps.append(
        frontier.select("start", "walk", F.lit(1).alias("step"), F.col("cur").alias("node"))
    )
    tri = eh.select(F.col("u").alias("pu"), F.col("v").alias("pv"), F.lit(1).alias("tri"))
    two52 = 1 << 52
    for t in range(2, walk_length + 1):
        cands = (
            frontier.join(adj, frontier.cur == adj.u)
            .select("start", "walk", "prev", "cur", "v", "rank", "degree")
            .join(tri, (F.col("prev") == F.col("pu")) & (F.col("v") == F.col("pv")), "left")
        )
        cls = (
            F.when(F.col("v") == F.col("prev"), F.lit(0))
            .when(F.col("tri").isNotNull(), F.lit(1))
            .otherwise(F.lit(2))
        )
        win = Window.partitionBy("start", "walk").orderBy("v")
        run = win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        full = win.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        a = F.sum(F.when(cls == 0, 1).otherwise(0)).over(run)
        b = F.sum(F.when(cls == 1, 1).otherwise(0)).over(run)
        c = F.sum(F.when(cls == 2, 1).otherwise(0)).over(run)
        at = F.sum(F.when(cls == 0, 1).otherwise(0)).over(full)
        bt = F.sum(F.when(cls == 1, 1).otherwise(0)).over(full)
        ct = F.sum(F.when(cls == 2, 1).otherwise(0)).over(full)

        def _cum(x, y, z):
            return (
                x.cast("double") * F.lit(inv_p) + y.cast("double")
            ) + z.cast("double") * F.lit(inv_q)

        ind0 = F.when(cls == 0, 1).otherwise(0)
        ind1 = F.when(cls == 1, 1).otherwise(0)
        ind2 = F.when(cls == 2, 1).otherwise(0)
        thr = (
            F.pmod(
                _hash64(
                    F.concat_ws(
                        "|",
                        F.col("start"),
                        F.col("walk"),
                        F.lit(t),
                        F.col("prev"),
                        F.col("cur"),
                    ),
                    seed,
                    hasher,
                ),
                F.lit(two52),
            ).cast("double")
            / F.lit(float(two52))
        ) * _cum(at, bt, ct)
        scored = cands.select(
            "start",
            "walk",
            "cur",
            "v",
            "rank",
            "degree",
            _cum(a, b, c).alias("cum"),
            _cum(a - ind0, b - ind1, c - ind2).alias("cum_prev"),
            thr.alias("thr"),
        )
        frontier = (
            scored.filter(
                (F.col("cum_prev") <= F.col("thr"))
                & ((F.col("thr") < F.col("cum")) | (F.col("rank") == F.col("degree") - 1))
            )
            .select("start", "walk", F.col("cur").alias("prev"), F.col("v").alias("cur"))
            .localCheckpoint(eager=True)
        )
        steps.append(
            frontier.select(
                "start", "walk", F.lit(t).alias("step"), F.col("cur").alias("node")
            )
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return (
        out.join(names.select(F.col("h").alias("start"), F.col("id").alias("start_id")), "start")
        .join(names.select(F.col("h").alias("node"), F.col("id").alias("node_id")), "node")
        .select("walk", F.col("start_id").alias("start"), "step", F.col("node_id").alias("node"))
    )


def walk_skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context, n_pairs): skip-gram co-occurrence pairs from
    :func:`random_walks` output — the corpus stage of DeepWalk/node2vec (the
    walks ARE the sentences; pairs within ``window`` steps are the training
    examples a graph-embedding job consumes).

    Directional and position-free like word2vec's window: every ordered
    (center, context) with 1 <= |step_center - step_context| <= window inside
    the same (start, walk) trajectory, aggregated to counts (the multiplicity
    IS the training weight — emitting counts instead of raw pairs shrinks the
    corpus by the average multiplicity with no information loss for the
    sampled-softmax objectives that consume it).

    Scale: one self-equi-join on (start, walk) — co-partitioned, and each
    trajectory is at most walk_length+1 rows, so the join fans out by at most
    2*window per row, never quadratic in graph size — then one partial-agg
    count.  Negative sampling is left to the trainer: it needs the trainer's
    vocabulary distribution, not the graph's.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    a = walks.select("start", "walk", "step", F.col("node").alias("center"))
    b = walks.select(
        "start", "walk", F.col("step").alias("step2"), F.col("node").alias("context")
    )
    return (
        a.join(b, ["start", "walk"])
        .filter(
            (F.abs(F.col("step") - F.col("step2")) <= window)
            & (F.col("step") != F.col("step2"))
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def _hll_seed_sketches(nodes: DataFrame, edges: DataFrame, m: int, hasher: str):
    """Shared HyperANF state builder: (nh id<->hash map, undirected hashed
    edge view, seeded per-node m-register HLL sketches) — ONE definition for
    :func:`approx_neighborhood_function` and
    :func:`approx_harmonic_closeness`, or their register semantics desync
    from the driver oracles.  Register index = low-log2(m) bits of the seeded
    hash; rank = 1 + trailing zeros of the remaining bits, capped at 56."""
    from cognee_graphdb_spark.operators.dedup import _hash64

    nh = (
        nodes.select("id", _hash64(F.col("id"), 0, hasher).alias("h"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    und = (
        _sym_edges(edges)
        .select(
            _hash64(F.col("src"), 0, hasher).alias("u"),
            _hash64(F.col("dst"), 0, hasher).alias("v"),
        )
        .join(nh.select(F.col("h").alias("u")), "u", "left_semi")
        .join(nh.select(F.col("h").alias("v")), "v", "left_semi")
        .localCheckpoint(eager=True)
    )
    bits = m.bit_length() - 1
    hpos = F.abs(F.col("h"))
    idx = hpos.bitwiseAND(F.lit(m - 1))
    suf = F.shiftright(hpos, bits)
    lowbit = suf.bitwiseAND(-suf)
    rho = (
        F.when(suf == 0, F.lit(56))
        .otherwise(F.least(F.lit(56), (F.log2(lowbit.cast("double")) + 1).cast("long")))
        .cast("int")
    )
    sk = nh.select(
        F.col("h").alias("u"),
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda i: F.when(i == idx, rho).otherwise(F.lit(0)).cast("int"),
        ).alias("sk"),
    ).localCheckpoint(eager=True)
    return nh, und, sk


def _hll_round(und: DataFrame, sk: DataFrame) -> DataFrame:
    """One HyperANF round: every sketch becomes the register-wise max of
    itself and its neighbors' sketches (the other half of the shared
    definition; see :func:`_hll_seed_sketches`)."""
    nbr = und.join(sk.select(F.col("u").alias("v"), "sk"), "v").select("u", "sk")
    ex = sk.unionByName(nbr).select("u", F.posexplode("sk").alias("idx", "val"))
    mx = ex.groupBy("u", "idx").agg(F.max("val").alias("val"))
    return (
        mx.groupBy("u")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "val"))), lambda s: s.val
            ).alias("sk")
        )
        .localCheckpoint(eager=True)
    )


def approx_neighborhood_function(
    nodes: DataFrame,
    edges: DataFrame,
    n_rounds: int = 8,
    m: int = 16,
    hasher: str = "xxhash64",
    output: str = "estimate",
) -> DataFrame:
    """(round, nf_est): HyperANF (Boldi, Rosa & Vigna, "HyperANF:
    approximating the neighbourhood function of very large graphs on a
    budget", WWW'11) — the neighborhood function N(t) = |{(u,v): d(u,v)<=t}|
    estimated with per-node HyperLogLog sketches, the 100 TB-honest variant
    of A2's diameter / average-path metrics (exact BFS is O(V·E),
    :func:`_bfs_path_stats`; this is O(t·E·m) with m tiny).

    Per node: an m-register HLL sketch seeded with the node's own hashed id;
    per round every sketch becomes the register-wise max of itself and its
    neighbors' sketches (undirected simple-graph view), so after t rounds a
    node's sketch summarizes its t-ball.  N(t) is the sum of per-node raw
    HLL estimates.  Effective diameter at q: the smallest t with
    N(t) >= q * N(t_max).

    Determinism & oracle parity: register index = low-log2(m) bits of the
    seeded hash, rank = 1 + trailing zeros of the remaining bits (capped at
    56; exact via ``x & -x`` + log2 of a power of two — both engines IEEE),
    per-register mass 2^(56-r) summed as EXACT integers, and the raw
    estimate alpha·m²·2^56 / S rounded to a BIGINT per node BEFORE the final
    sum — so the output is integer-exact and the DuckDB oracle unrolls the
    same rounds.  Error bounds: raw HLL with m=16 has ~1.04/sqrt(16) = 26%
    relative stddev per node (better after summing over nodes); this is the
    documented approximation, not a bug — raise m for tighter bounds.

    Scale notes: each round is one join + one posexplode + two partial-agg
    shuffles on (8-byte key, tinyint register) rows — E·m explode width, the
    standard HyperANF layout; lineage truncated per round.  ``m`` must be a
    power of two (register index via bit mask, exact at any hash width).

    ``output="stats"`` returns (hop, raw_est_sum, zero_regs) instead — the
    integer-exact evolution of the RAW estimator (per-node round before sum;
    only one correctly-rounded division from the register state) plus total
    empty registers, which is what the driver oracle hash-checks: the
    user-facing estimate crosses ln(), which libm does not correctly round,
    so cross-engine equality is only guaranteed for the raw path.  The
    estimate path carries the standard linear-counting small-range
    correction (est <= 2.5m and empty registers -> m·ln(m/zeros)).
    """
    if m & (m - 1) or m < 2:
        raise ValueError("m must be a power of two >= 2")

    # alpha_m * m^2 * 2^56 with the constant folded in Python once; the
    # oracle embeds repr() of the same double so both sides divide the same C
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    c_num = alpha * m * m * float(1 << 56)

    nh, und, sk = _hll_seed_sketches(nodes, edges, m, hasher)

    def nf_of(frame: DataFrame, t: int) -> DataFrame:
        # 2^(56-r) via pow: doubles hold powers of two <= 2^56 exactly, and
        # the cast back to long is exact, so S stays an exact integer
        s = F.aggregate(
            F.col("sk"),
            F.lit(0).cast("long"),
            lambda acc, r: acc + F.pow(F.lit(2.0), (F.lit(56) - r).cast("double")).cast("long"),
        )
        zeros = F.aggregate(
            F.col("sk"),
            F.lit(0).cast("long"),
            lambda acc, r: acc + F.when(r == 0, 1).otherwise(0),
        )
        raw = F.lit(c_num) / s
        if output == "stats":
            # oracle mode, exact by construction: the RAW estimator only
            # crosses one IEEE-correctly-rounded division (ln() in the
            # linear-counting branch below is libm, NOT correctly rounded,
            # so the corrected estimate can differ across engines by 1 after
            # rounding); per-node round-to-long before the sum keeps the
            # output integer-exact
            return frame.select(
                F.round(raw).cast("long").alias("re"), zeros.alias("z")
            ).agg(
                F.lit(t).cast("int").alias("hop"),
                F.sum("re").alias("raw_est_sum"),
                F.sum("z").alias("zero_regs"),
            )
        # HLL small-range correction (Flajolet et al. §4): linear counting
        # when the raw estimate is <= 2.5m and empty registers remain
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
        ).otherwise(raw)
        return frame.select(F.round(est).cast("long").alias("est")).agg(
            F.lit(t).cast("int").alias("round"), F.sum("est").alias("nf_est")
        )

    out = nf_of(sk, 0)
    for t in range(1, n_rounds + 1):
        sk = _hll_round(und, sk)
        out = out.unionByName(nf_of(sk, t))
    return out


def approx_harmonic_closeness(
    nodes: DataFrame,
    edges: DataFrame,
    n_rounds: int = 3,
    m: int = 16,
    hasher: str = "xxhash64",
    output: str = "corrected",
) -> DataFrame:
    """(id, h_scaled, closeness): approximate harmonic closeness centrality
    (gds.closeness.harmonic family) from the same HyperANF per-node sketches
    as :func:`approx_neighborhood_function` — the 100 TB-honest centrality:
    exact closeness is all-pairs BFS, O(V·E); this is O(t·E·m).

    Harmonic closeness H(v) = sum over u != v of 1/d(v,u), truncated at
    ``n_rounds`` hops (Boldi & Vigna, "Axioms for centrality": harmonic
    handles disconnected graphs where classic closeness degenerates).
    Estimated per node as sum_t (|ball(v,t)| - |ball(v,t-1)|) / t with ball
    sizes read off the node's HLL sketch each round.  In ``raw`` mode
    register-wise max is monotone, so the per-node estimates never decrease
    and every delta is >= 0 by construction; in ``corrected`` mode the
    estimator can SWITCH branches between rounds (linear counting -> raw as
    the ball grows past 2.5m), which can dip the rounded estimate, so
    corrected deltas are clamped at 0 to keep h_scaled a truncated harmonic
    sum rather than letting a branch switch subtract mass.

    Exactness contract: ``h_scaled`` = sum_t delta_t * (L/t) with
    L = lcm(1..n_rounds) — ALL integer arithmetic once each per-round
    estimate is rounded to a BIGINT, so an oracle can restate it;
    ``closeness`` = h_scaled / L (one correctly-rounded IEEE division).
    ``output="raw"`` uses the raw HLL estimator per round (integer-exact
    cross-engine, what the driver oracle hashes); ``output="corrected"``
    (default) applies linear-counting small-range correction per node —
    far more accurate at the tiny ball sizes early hops see (a 1-element
    ball reads ~0.7m raw but ~1 corrected), at the cost of crossing libm
    ln(), which is not correctly rounded across engines.

    Scale: the sketch rounds are the HyperANF layout (one join + E·m-wide
    posexplode + two partial-agg shuffles per round, lineage truncated);
    the per-round estimate frames then chain-join on the 8-byte node hash —
    n_rounds+1 co-partitioned equi-joins on node-sized frames.
    """
    import math

    if m & (m - 1) or m < 2:
        raise ValueError("m must be a power of two >= 2")
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    if output not in ("corrected", "raw"):
        raise ValueError("output must be 'corrected' or 'raw'")
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    c_num = alpha * m * m * float(1 << 56)

    def est_col():
        s = F.aggregate(
            F.col("sk"),
            F.lit(0).cast("long"),
            lambda acc, r: acc + F.pow(F.lit(2.0), (F.lit(56) - r).cast("double")).cast("long"),
        )
        raw = F.lit(c_num) / s
        if output == "raw":
            return F.round(raw).cast("long")
        zeros = F.aggregate(
            F.col("sk"),
            F.lit(0).cast("long"),
            lambda acc, r: acc + F.when(r == 0, 1).otherwise(0),
        )
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
        ).otherwise(raw)
        return F.round(est).cast("long")

    nh, und, sk = _hll_seed_sketches(nodes, edges, m, hasher)
    cur = sk.select("u", est_col().alias("e0"))
    for t in range(1, n_rounds + 1):
        sk = _hll_round(und, sk)
        cur = cur.join(sk.select("u", est_col().alias(f"e{t}")), "u")
    big_l = math.lcm(*range(1, n_rounds + 1))

    def _delta(t):
        d = F.col(f"e{t}") - F.col(f"e{t - 1}")
        # raw mode is monotone by construction (register-wise max only grows
        # HLL mass) and its exact arithmetic is what the oracle restates;
        # corrected mode can dip when the estimator switches branches
        return d if output == "raw" else F.greatest(d, F.lit(0).cast("long"))

    h_scaled = sum(_delta(t) * F.lit(big_l // t) for t in range(1, n_rounds + 1))
    return cur.join(nh, cur.u == nh.h).select(
        "id",
        h_scaled.cast("long").alias("h_scaled"),
        (h_scaled.cast("double") / F.lit(float(big_l))).alias("closeness"),
    )


def effective_diameter(nf: DataFrame, q: float = 0.9) -> int:
    """Smallest round t with N(t) >= q * N(t_max), from
    :func:`approx_neighborhood_function` output."""
    rows = sorted(nf.collect(), key=lambda r: r["round"])
    if not rows:
        # empty neighborhood-function frame (e.g. ANF over an empty node
        # set): the diameter of nothing is 0, not an IndexError
        return 0
    target = q * rows[-1]["nf_est"]
    for r in rows:
        if r["nf_est"] >= target:
            return int(r["round"])
    return int(rows[-1]["round"])


def graph_metrics(
    nodes: DataFrame,
    edges: DataFrame,
    include_paths: bool = False,
    max_sizes: int = 1_000_000,
) -> dict:
    """The A2 metric dict (shape of ground_truth_metrics.json / adapter.py:1353-1424).

    ``sizes_of_connected_components`` is a DRIVER-side list; a 100 TB graph
    has tens of millions of (mostly singleton) components and collecting them
    all is a driver OOM.  The list is therefore bounded at ``max_sizes``
    entries (largest-first, TakeOrderedAndProject — no global sort
    materialization).  When truncation kicks in, ``component_sizes_truncated``
    flips to True and ``component_size_log2_histogram`` carries the full
    distribution as {floor(log2(size)): n_components} — component count and
    the histogram stay exact at any scale.  At test scale (component count
    <= max_sizes) the output is byte-identical to the unbounded form.
    """
    num_nodes = nodes.count()
    num_edges = edges.count()
    mean_degree = (2.0 * num_edges / num_nodes) if num_nodes else 0.0
    density = (num_edges / (num_nodes * (num_nodes - 1))) if num_nodes > 1 else 0.0
    num_selfloops = edges.filter(F.col("src") == F.col("dst")).count()

    comp = connected_components(nodes, edges)
    csizes = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_components = csizes.count()
    truncated = n_components > max_sizes
    # .limit after orderBy compiles to TakeOrderedAndProject: each partition
    # keeps a max_sizes-bounded heap, the driver merges heaps — never the
    # full size list
    sizes = [r["n"] for r in csizes.orderBy(F.desc("n")).limit(max_sizes).collect()]

    out = {
        "num_nodes": num_nodes,
        "num_edges": num_edges,
        "mean_degree": mean_degree,
        "edge_density": density,
        "num_connected_components": n_components,
        "sizes_of_connected_components": sizes,
        "component_sizes_truncated": truncated,
        "num_selfloops": num_selfloops,
    }
    if truncated:
        out["component_size_log2_histogram"] = {
            int(r["b"]): r["cnt"]
            for r in csizes.groupBy(F.floor(F.log2("n")).alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
    if include_paths:
        out.update(_path_metrics(nodes, edges))
        avg_c = triangle_clustering(nodes, edges).agg(F.avg("clustering")).collect()[0][0]
        out["avg_clustering"] = float(avg_c or 0.0)
    else:
        out["diameter"] = None
        out["avg_shortest_path_length"] = None
        out["avg_clustering"] = None
    return out


def _bfs_path_stats(sources: DataFrame, edges: DataFrame, max_hops: int = 32) -> dict:
    """Multi-source BFS over the undirected graph: max and mean shortest-path
    length from the given source set.  One frontier-expansion join per hop;
    every round localCheckpoints so lineage stays flat."""
    sym = _sym_edges(edges).localCheckpoint(eager=False)
    dist = sources.select(F.col("id").alias("s"), F.col("id").alias("d"), F.lit(0).alias("dist"))
    frontier = dist
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym.withColumnRenamed("src", "d").withColumnRenamed("dst", "d2"), "d")
            .select("s", F.col("d2").alias("d"), F.lit(hop).alias("dist"))
            .distinct()
            .join(dist.select("s", "d"), ["s", "d"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    reachable = dist.filter(F.col("s") != F.col("d"))
    row = reachable.agg(F.max("dist").alias("diam"), F.avg("dist").alias("aspl")).collect()[0]
    return {"diameter": int(row["diam"]) if row["diam"] is not None else 0,
            "avg_shortest_path_length": float(row["aspl"]) if row["aspl"] is not None else 0.0}


def _path_metrics(nodes: DataFrame, edges: DataFrame, max_hops: int = 32) -> dict:
    """Exact all-pairs shortest paths (BFS from EVERY node) — O(V·E) rows;
    test-scale only, exactly like the reference's whole-graph GDS jobs.
    100 TB graphs use :func:`approx_path_metrics`."""
    return _bfs_path_stats(nodes.select("id"), edges, max_hops)


def approx_path_metrics(
    nodes: DataFrame, edges: DataFrame, n_sources: int = 32, max_hops: int = 32, seed: int = 0
) -> dict:
    """Sampled-source path metrics — the A2 scale path.

    BFS from ``n_sources`` deterministically sampled nodes (smallest
    xxhash64(id, seed) — a uniform sample selected by TakeOrderedAndProject,
    no full shuffle).  Returns a diameter LOWER BOUND (max eccentricity seen
    is ≤ true diameter) and an unbiased avg-shortest-path estimate; the
    frontier cost is O(n_sources · E) instead of exact's O(V · E).  With
    ``n_sources >= |V|`` this IS the exact computation.
    """
    src = (
        nodes.select("id")
        .orderBy(F.xxhash64("id", F.lit(seed)).asc(), F.col("id").asc())
        .limit(n_sources)
    )
    return _bfs_path_stats(src, edges, max_hops)
