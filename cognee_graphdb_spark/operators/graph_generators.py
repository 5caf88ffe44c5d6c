"""Deterministic distributed graph generators.

The GDS family ships benchmark-graph generation (gds.graph.generate) because
a graph engine must be testable at sizes real data doesn't ship at; this
module provides the standard R-MAT / Kronecker recursive-matrix generator
(Chakrabarti, Zhan & Faloutsos 2004 — the Graph500 reference generator)
Spark-first:

- every edge sample is INDEPENDENT: one `spark.range(n_edges)` and per-level
  hash-derived quadrant choices — embarrassingly parallel, no shared RNG
  state, no driver loop; a trillion-edge graph generates at scan speed on
  however many executors exist.
- determinism is the point: the quadrant choice at (edge i, level l) is a
  pure function of (seed, i, l) through the engine's seeded hash, so the
  same call yields the same graph on any cluster, any partitioning — and
  the md5_64 hasher makes the whole recursion restatable in SQL for the
  correctness oracle (the same discipline as random_walks/node2vec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.dedup import _hash64

# md5_64 yields 60 bits; xxhash64 is folded into the same range via pmod so
# both hashers drive the identical threshold logic
_FRACTION_BITS = 52


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 0,
    hasher: str = "xxhash64",
    dedup: bool = False,
) -> DataFrame:
    """(edge_id, src, dst): R-MAT graph over 2^scale nodes with
    edge_factor·2^scale edge samples (Graph500 defaults a/b/c/d =
    .57/.19/.19/.05 — d is implied).  Node ids are LONG indexes in
    [0, 2^scale); self-loops and duplicate samples are kept unless
    ``dedup`` (the Graph500 convention keeps them; dedup adds one shuffle).

    Per level l the sample's 2^scale × 2^scale adjacency matrix quadrant is
    chosen by one uniform u(i, l) = hash(seed, i, l)/2^bits: row bit 1 iff
    u ≥ a+b, column bit 1 iff u lands in the b or d quadrant — src/dst
    accumulate one bit per level (most-significant first).  ``scale``
    levels of pure column expressions: the whole generator is ONE
    whole-stage-codegen projection over a range scan, no shuffle at all
    until an optional dedup.
    """
    if scale < 1 or scale > 62:
        raise ValueError("scale must be in [1, 62]")
    if edge_factor < 1:
        raise ValueError("edge_factor must be >= 1")
    d = 1.0 - a - b - c
    if min(a, b, c, d) < 0 or max(a, b, c, d) > 1:
        raise ValueError("quadrant probabilities must be a valid distribution")
    t1, t2, t3 = a, a + b, a + b + c
    n_edges = edge_factor * (1 << scale)
    df = spark.range(n_edges).select(F.col("id").alias("edge_id"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        key = F.concat(
            F.col("edge_id").cast("string"), F.lit("|"), F.lit(str(level))
        )
        h = _hash64(key, seed, hasher)
        if hasher == "md5_64":
            # 60-bit non-negative: fraction straight off the top bits
            u = (h / F.lit(float(1 << 60))).cast("double")
        else:
            u = (
                F.pmod(h, F.lit(1 << _FRACTION_BITS))
                / F.lit(float(1 << _FRACTION_BITS))
            ).cast("double")
        row_bit = F.when(u >= F.lit(t2), F.lit(1)).otherwise(F.lit(0)).cast("long")
        col_bit = (
            F.when((u >= F.lit(t1)) & (u < F.lit(t2)), F.lit(1))
            .when(u >= F.lit(t3), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        src = src * F.lit(2).cast("long") + row_bit
        dst = dst * F.lit(2).cast("long") + col_bit
    out = df.select("edge_id", src.alias("src"), dst.alias("dst"))
    if dedup:
        out = (
            out.groupBy("src", "dst")
            .agg(F.min("edge_id").alias("edge_id"))
            .select("edge_id", "src", "dst")
        )
    return out


def watts_strogatz_edges(
    spark: SparkSession,
    n_nodes: int,
    k: int,
    p: float = 0.1,
    seed: int = 0,
    hasher: str = "xxhash64",
    dedup: bool = False,
) -> DataFrame:
    """(edge_id, src, dst): Watts–Strogatz small-world graph — the third
    benchmark topology next to :func:`rmat_edges` (skewed) and
    :func:`uniform_edges` (flat): high clustering + short paths, the shape
    that stresses triangle counting and community detection.

    Ring lattice of ``n_nodes`` with ``k/2`` forward neighbors per node
    (``k`` even); lattice edge j of node i rewires with probability ``p``
    to hash(seed, idx, 't') mod n — the rewire DECISION is
    hash(seed, idx, 'r')/2^bits < p.  A rewire that would self-loop keeps
    its lattice target (the WS convention of forbidding self-loops, made
    deterministic).  One shuffle-free projection over range(n·k/2), every
    choice a pure hash function — SQL-restatable like its siblings.
    """
    if n_nodes < 3 or k < 2 or k % 2 or k >= n_nodes:
        raise ValueError("need n_nodes >= 3 and even k in [2, n_nodes)")
    if not 0.0 <= p <= 1.0:
        raise ValueError("p must be a probability")
    half = k // 2
    df = spark.range(n_nodes * half).select(F.col("id").alias("edge_id"))
    i = F.expr(f"edge_id DIV {half}")  # exact integer division, no float hop
    j = F.pmod(F.col("edge_id"), F.lit(half)) + F.lit(1)
    ring_dst = F.pmod(i + j, F.lit(n_nodes))
    rk = F.concat(F.col("edge_id").cast("string"), F.lit("|r"))
    tk = F.concat(F.col("edge_id").cast("string"), F.lit("|t"))
    hr = _hash64(rk, seed, hasher)
    if hasher == "md5_64":
        u = (hr / F.lit(float(1 << 60))).cast("double")
    else:
        u = (
            F.pmod(hr, F.lit(1 << _FRACTION_BITS))
            / F.lit(float(1 << _FRACTION_BITS))
        ).cast("double")
    t = F.pmod(_hash64(tk, seed, hasher), F.lit(n_nodes)).cast("long")
    dst = F.when(
        (u < F.lit(p)) & (t != i), t
    ).otherwise(ring_dst.cast("long"))
    out = df.select("edge_id", i.alias("src"), dst.alias("dst"))
    if dedup:
        out = (
            out.groupBy("src", "dst")
            .agg(F.min("edge_id").alias("edge_id"))
            .select("edge_id", "src", "dst")
        )
    return out


def uniform_edges(
    spark: SparkSession,
    n_nodes: int,
    n_edges: int,
    seed: int = 0,
    hasher: str = "xxhash64",
    dedup: bool = False,
) -> DataFrame:
    """(edge_id, src, dst): uniform random multigraph — the G(n, m)
    Erdős–Rényi counterpart to :func:`rmat_edges` (gds.graph.generate's
    UNIFORM distribution); the skew-free control group for benchmarking
    skew-sensitive operators.  Endpoint k of edge i is
    hash(seed, i, k) mod n — the same embarrassingly-parallel,
    shuffle-free, SQL-restatable construction as R-MAT."""
    if n_nodes < 1 or n_edges < 1:
        raise ValueError("n_nodes and n_edges must be >= 1")
    df = spark.range(n_edges).select(F.col("id").alias("edge_id"))
    ends = []
    for side in ("s", "d"):
        key = F.concat(F.col("edge_id").cast("string"), F.lit("|"), F.lit(side))
        ends.append(F.pmod(_hash64(key, seed, hasher), F.lit(n_nodes)).cast("long"))
    out = df.select("edge_id", ends[0].alias("src"), ends[1].alias("dst"))
    if dedup:
        out = (
            out.groupBy("src", "dst")
            .agg(F.min("edge_id").alias("edge_id"))
            .select("edge_id", "src", "dst")
        )
    return out
