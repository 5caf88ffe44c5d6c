"""Minimum spanning forest by distributed Borůvka — the gds.spanningTree
family re-expressed Spark-first (the reference exposes whole-graph
analytics through its Neo4j GDS metric surface, cognee reference
neo4j_driver/neo4j_metrics_utils.py:8-190; GDS's spanningTree/kSpanningTree
are Prim from a source node — single-frontier, inherently sequential —
while Borůvka computes the SAME minimum-weight forest for every component
at once and is the textbook distributed formulation).

Borůvka round (components at least HALVE per round, so ≤ ⌈log2 n⌉ rounds):

1. every edge whose endpoints sit in different components is a candidate
   for BOTH endpoint components;
2. each component picks its minimum candidate under the total order
   (weight, hashed-src, hashed-dst) — the deterministic tie-break makes
   the forest unique and Borůvka correct even with equal weights (it
   simulates globally distinct weights);
3. the picked edges join the forest; the pseudo-forest they induce over
   component labels (each component has exactly ONE out-pointer — its pick)
   is collapsed by pointer jumping: mutual pick pairs root at their smaller
   label, then p := p(p) doubling (the only cycles a strict edge total
   order allows are 2-cycles, so the pointer graph is a forest after
   rooting);
4. component labels update through one equi-join.

Scale: endpoints are relabeled to xxhash64 longs once; per round the
dataflow is two label-lookup equi-joins on 8-byte keys + one map-side
min_by partial aggregation (skew-safe: a hot component aggregates, never
sorts) + the pointer-jump collapse over the (tiny, geometrically
shrinking) component-label frame; lineage is truncated per round via
localCheckpoint, and termination rides the pick checkpoint as an
Observation row count.  At a billion edges each round is the
pagerank-join shape; the edge set itself is never rewritten — only the
(node → component) frame evolves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.graph_metrics import connected_components


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 40,
) -> DataFrame:
    """(src, dst, weight): the minimum-weight spanning forest of the
    undirected weighted graph — one tree per connected component, ties
    broken by (weight, xxhash64(src), xxhash64(dst)) so the result is
    deterministic.  Parallel edges keep their minimum weight; self-loops
    never span and are dropped.  Edges are returned in their canonical
    orientation (the input row whose (src, dst) won the parallel-edge
    reduction).

    ``max_rounds`` is a fail-loudly bound (Borůvka needs ≤ log2 n): hitting
    it raises rather than returning a partial forest.
    """
    spark = edges.sparkSession
    w = F.col(weight_col).cast("double")
    # canonical undirected edge id: hashed endpoints ordered, keep the
    # original string endpoints for the output; parallel edges (either
    # orientation) reduce to their min-weight representative
    base = (
        edges.select(
            F.xxhash64("src").alias("ha"),
            F.xxhash64("dst").alias("hb"),
            w.alias("w"),
            F.col("src").alias("esrc"),
            F.col("dst").alias("edst"),
        )
        .filter(F.col("ha") != F.col("hb"))
        .select(
            F.least("ha", "hb").alias("hu"),
            F.greatest("ha", "hb").alias("hv"),
            "w",
            "esrc",
            "edst",
        )
        .groupBy("hu", "hv")
        .agg(F.min(F.struct("w", "esrc", "edst")).alias("m"))
        .select("hu", "hv", "m.w", "m.esrc", "m.edst")
        .localCheckpoint(eager=True)
    )
    # components start as singletons over the edge-incident nodes
    comp = (
        base.select(F.col("hu").alias("h"))
        .unionByName(base.select(F.col("hv").alias("h")))
        .distinct()
        .select("h", F.col("h").alias("c"))
        .localCheckpoint(eager=True)
    )
    def _cross_component(c: DataFrame) -> DataFrame:
        return (
            base.join(c.select(F.col("h").alias("hu"), F.col("c").alias("cu")), "hu")
            .join(c.select(F.col("h").alias("hv"), F.col("c").alias("cv")), "hv")
            .filter(F.col("cu") != F.col("cv"))
        )

    picks: list[DataFrame] = []
    for _ in range(max_rounds):
        t = _cross_component(comp)
        # per-component minimum candidate: min_by over the deterministic
        # total order (w, hu, hv) — one map-side-combined aggregation, no
        # per-component sort (a hot component partial-aggs, never windows).
        # Convergence rides the SAME job: per_c is empty iff no cross-
        # component edge remains (a per-component min exists whenever t has
        # a row), so the separate t.limit(1).count() probe — a full double
        # join per round — is folded into per_c's checkpoint as an
        # Observation row count.
        cand = t.select(F.col("cu").alias("c"), "w", "hu", "hv", "cu", "cv").unionByName(
            t.select(F.col("cv").alias("c"), "w", "hu", "hv", "cu", "cv")
        )
        obs = Observation()
        per_c = (
            cand.groupBy("c")
            .agg(F.min(F.struct("w", "hu", "hv", "cu", "cv")).alias("m"))
            .select("c", "m.w", "m.hu", "m.hv", "m.cu", "m.cv")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if obs.get["n"] == 0:
            break
        # the forest is assembled ONCE at the end from the (already
        # checkpointed) per-round per_c frames; duplicates (both endpoint
        # components picking the same edge) are deduped once on the
        # assembled union below — cross-round duplicates are impossible
        # (a picked edge's endpoints merge, so it is intra-component and
        # filtered by cu != cv in every later round), so one global
        # dropDuplicates equals the per-round form with one Exchange
        # instead of one per round
        picks.append(per_c.select("hu", "hv"))
        # Collapse the label pseudo-forest by POINTER JUMPING instead of the
        # general alternating-star CC (r12 VERDICT #1): each component's pick
        # defines parent(c) = the other endpoint of its min edge — a
        # FUNCTIONAL graph.  Under the strict (w, hu, hv) total order every
        # pointer cycle has length exactly 2 (on any longer cycle the
        # strictly-minimum edge would be the pick of BOTH its endpoints,
        # collapsing the cycle — the classic Borůvka hooking argument), so
        # rooting the mutual pairs at their smaller label turns the pointer
        # graph into a forest, and p := p(p) doubling reaches every root in
        # ⌈log2 depth⌉ one-join rounds.  The grouping (weakly connected
        # pointer trees) is identical to CC over the picked edges, and the
        # forest output never reads the label VALUES — only the grouping —
        # so the result is unchanged while each Borůvka round drops from
        # the alternating-star machinery (~4 jobs × several shuffles each)
        # to one setup join + 1-2 tiny doubling joins.
        par = per_c.select(
            "c",
            F.when(F.col("c") == F.col("cv"), F.col("cu")).otherwise(F.col("cv")).alias("p"),
        )
        gp = par.select(F.col("c").alias("p"), F.col("p").alias("gp"))
        par = (
            par.join(gp, "p")
            .select(
                "c",
                F.when(
                    (F.col("gp") == F.col("c")) & (F.col("c") < F.col("p")), F.col("c")
                )
                .otherwise(F.col("p"))
                .alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        for _jump in range(64):
            stepped = par.join(
                par.select(F.col("c").alias("p"), F.col("p").alias("gp")), "p"
            )
            jobs = Observation()
            par = (
                stepped.observe(
                    jobs,
                    F.sum(
                        F.when(F.col("gp") != F.col("p"), 1).otherwise(0)
                    ).alias("mv"),
                )
                .select("c", F.col("gp").alias("p"))
                .localCheckpoint(eager=True)
            )
            if not (jobs.get["mv"] or 0):
                break
        else:  # pragma: no cover — depth > 2^64 is impossible
            raise RuntimeError("pointer jumping did not converge")
        # relabel: components without a cross edge (absent from par) keep
        # their label
        comp = (
            comp.join(par, "c", "left")
            .select("h", F.coalesce("p", "c").alias("c"))
            .localCheckpoint(eager=True)
        )
    else:
        # the convergence probe only runs at the TOP of an iteration, so a
        # graph that merges to one component per tree in EXACTLY max_rounds
        # lands here converged — re-probe before declaring failure (r11
        # ADVICE off-by-one, same shape as topological_layers)
        if _cross_component(comp).limit(1).count() > 0:
            raise RuntimeError(
                f"minimum_spanning_forest did not converge in {max_rounds} "
                "rounds (Borůvka needs <= log2(n); raise max_rounds only if "
                "the graph really has that many nodes)"
            )
    if not picks:
        return spark.createDataFrame([], "src string, dst string, weight double")
    forest = picks[0]
    for p in picks[1:]:
        forest = forest.unionByName(p)
    forest = forest.dropDuplicates(["hu", "hv"])
    return (
        forest.join(base, ["hu", "hv"])
        .select(
            F.col("esrc").alias("src"), F.col("edst").alias("dst"), F.col("w").alias("weight")
        )
    )


def k_spanning_clusters(
    edges: DataFrame,
    k: int,
    weight_col: str = "weight",
    max_rounds: int = 40,
) -> DataFrame:
    """(id, cluster): gds.kSpanningTree — single-linkage clustering by
    minimum spanning forest: compute the MSF, CUT its max(0, k-c) heaviest
    edges for a graph with c connected components (ties broken by (weight
    desc, hashed-src, hashed-dst), mirroring the forest's own total order),
    and label each resulting tree by its smallest member id.  The output
    has exactly min(k, |V|) clusters when k >= c and exactly c when k < c
    (you cannot cut a forest into fewer pieces than it has trees); c is
    derived from the forest itself — c = |edge-incident nodes| - |MSF
    edges|, a forest identity, so no extra components pass runs (r11
    ADVICE: the previous unconditional k-1 cut produced c+k-1 clusters on
    disconnected graphs).  This IS single-linkage hierarchical clustering
    cut at level k, computed bottom-up in Borůvka's ≤ log2 n rounds
    instead of n sequential merges.

    Scale: the forest has |V|-c edges but the CUT selection is a top-(k-1)
    ``orderBy().limit()`` — TakeOrderedAndProject, per-partition heaps, no
    global sort — and the final labeling is one alternating-star CC over
    the forest-minus-cuts edge list (tree-sparse by construction)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    msf = minimum_spanning_forest(edges, weight_col=weight_col, max_rounds=max_rounds)
    msf = msf.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
        "weight",
    ).localCheckpoint(eager=True)
    ids = (
        edges.select(F.col("src").cast("string").alias("id"))
        .unionByName(edges.select(F.col("dst").cast("string").alias("id")))
        .filter(F.col("id").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    # forest identity: components = vertices - tree edges (self-loop-only
    # nodes contribute a vertex and no edge — their singleton component
    # counts correctly); two bounded probes over checkpointed frames
    n_components = ids.count() - msf.count()
    cuts = (
        msf.orderBy(
            F.desc("weight"), F.xxhash64("src"), F.xxhash64("dst")
        )
        .limit(max(0, k - n_components))
        .select("src", "dst")
    )
    kept = msf.join(cuts, ["src", "dst"], "left_anti").select(
        "src", "dst", F.lit("mst").alias("relationship_name")
    )
    return connected_components(ids, kept, hash_ids=False).select(
        "id", F.col("component").alias("cluster")
    )
