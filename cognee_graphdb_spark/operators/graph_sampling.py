"""Layered neighbor sampling — the GNN mini-batch corpus stage.

A graph-embedding / GNN training pipeline over a 100 TB graph does not feed
full neighborhoods: it samples a bounded fan-out per node per layer
(GraphSAGE, Hamilton et al. 2017; the sampler DGL/PyG run on the data side).
This is a TRAINING-DATA operator like walks/skip-grams: the output is a
reproducible edge-block table a trainer consumes, so determinism matters
more than randomness quality — neighbors are picked by SEEDED-HASH RANKING
(the random_walks discipline), which makes every sample restartable and
SQL-oracle-checkable where ``rand()`` is not.

Scale shape: layer l joins the layer-(l-1) frontier against the ranked
adjacency on the node key (co-partitioned equi-join), keeps ranks below the
fan-out with a FILTER (the per-neighbor rank is precomputed ONCE on the
adjacency, not re-windowed per layer), and frontiers grow as
|roots|·Πfanouts — bounded by construction, never by graph degree (a
10M-degree hub contributes exactly ``fanout`` rows per appearance).

Hub cap (the r9 watch item): the rank window itself would sort a hub's whole
neighbor list in one task, so a PREFILTER bounds it — only ranks up to
max(fanouts) are ever read, and the rank order is (hash, dst), so keeping
each key's lowest-hash prefix (expected ~margin·K rows via the uniform-hash
quantile of the key's degree) provably preserves the true top-K whenever the
prefix holds at least K rows; the (astronomically rare, Chernoff margin 8)
undershoot keys fall back to their full lists, keeping the output EXACTLY
equal to the unfiltered ranking — pytest-pinned on a hub fixture.  Window
sort memory per key drops from O(degree) to O(margin·K).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def neighbor_sample(
    edges: DataFrame,
    roots: DataFrame,
    fanouts: list[int],
    seed: int = 11,
    hasher: str = "xxhash64",
    directed: bool = True,
) -> DataFrame:
    """(root, layer, src, dst): for each id in ``roots``, a deterministic
    sampled neighborhood block — layer 1 samples ``fanouts[0]`` out-edges of
    the root, layer 2 samples ``fanouts[1]`` out-edges of each layer-1
    neighbor, and so on (GraphSAGE's layered fan-out; ``directed=False``
    samples the undirected adjacency).

    The per-node neighbor order is a seeded hash of (node, neighbor): stable
    across runs, partitionings and engines, and INDEPENDENT of the layer or
    root — so the ranked adjacency is computed once, and two roots sampling
    the same node see the same neighbors (cacheable blocks, the reusable-
    neighborhood property samplers exploit).  Duplicate sampled edges within
    one (root, layer) are collapsed (a node reached twice contributes one
    block), keeping the output a set like the reference trainers expect.
    """
    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError("fanouts must be a non-empty list of positive ints")
    from cognee_graphdb_spark.operators.dedup import _hash64

    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    if directed is False:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    eh = e.withColumn("__h", _hash64(F.concat_ws("|", "src", "dst"), seed, hasher))

    # hub cap: bound the per-key window sort WITHOUT changing the result.
    # The rank order is (__h, dst) and only ranks <= K matter, so a key's
    # lowest-__h prefix contains its true top-K whenever the prefix holds
    # >= K rows (any excluded row hashes strictly above every kept row).
    # Keep the expected margin·K lowest hashes per key via the uniform-hash
    # quantile of the key's degree; keys whose prefix came up short (only
    # possible when something WAS filtered) retry with their full lists.
    k_max = max(fanouts)
    margin = 8
    deg = eh.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # hash range is HASHER-SPECIFIC (md5_64 is 60-bit non-negative, xxhash64
    # full signed int64), so the quantile cut normalizes by the OBSERVED
    # global range — two scalars, one map-side-combined agg — instead of
    # assuming a codomain; uniformity within the true range is all the
    # prefilter needs, and the fallback below catches any undershoot anyway
    bounds = eh.agg(
        F.min("__h").alias("lo"), F.max("__h").alias("hi")
    ).collect()[0]
    lo = float(bounds["lo"]) if bounds["lo"] is not None else 0.0  # empty edges
    hi = float(bounds["hi"]) if bounds["hi"] is not None else 0.0
    span = max(hi - lo, 1.0)
    frac = (F.col("__h").cast("double") - F.lit(lo)) / F.lit(span)  # ~U[0,1]
    cand = eh.join(deg, "src").filter(
        (F.col("__deg") <= margin * k_max)
        | (frac <= F.lit(float(margin * k_max)) / F.col("__deg"))
    )
    kept_cnt = cand.groupBy("src").agg(F.count(F.lit(1)).alias("__kept"))
    # completeness check from DEG's side: a key whose prefix kept fewer than
    # k_max rows — including ZERO rows, which has no kept_cnt row at all —
    # falls back to its full list
    short = (
        deg.join(kept_cnt, "src", "left")
        .withColumn("__kept", F.coalesce("__kept", F.lit(0)))
        .filter((F.col("__kept") < k_max) & (F.col("__kept") < F.col("__deg")))
        .select("src")
    )
    bounded = cand.join(short, "src", "left_anti").select("src", "dst", "__h")
    fallback = eh.join(short, "src", "left_semi").select("src", "dst", "__h")
    adj = (
        bounded.unionByName(fallback)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("src").orderBy(F.col("__h"), F.col("dst"))
            ),
        )
        .filter(F.col("rnk") <= k_max)
        .drop("__h")
        .localCheckpoint(eager=True)
    )

    frontier = roots.select(F.col("id").alias("root"), F.col("id").alias("node")).distinct()
    blocks = None
    for layer, fan in enumerate(fanouts, start=1):
        sampled = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .filter(F.col("rnk") <= fan)
            .select("root", F.lit(layer).alias("layer"), "src", "dst")
            .distinct()
        )
        blocks = sampled if blocks is None else blocks.unionByName(sampled)
        frontier = sampled.select("root", F.col("dst").alias("node")).distinct()
    return blocks
