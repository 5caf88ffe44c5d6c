"""SPPMI-SVD node embeddings (Levy & Goldberg 2014, "Neural Word Embedding
as Implicit Matrix Factorization", NeurIPS).

Skip-gram with negative sampling implicitly factorizes the shifted positive
PMI matrix of its (center, context) corpus — so the deterministic walk /
skip-gram stages (``graph_metrics.random_walks`` →
``graph_metrics.walk_skipgram_pairs``) compose with an explicit SPPMI build
plus a truncated symmetric factorization into end-to-end node embeddings
with NO sampled-gradient training loop: the node2vec analogue the reference
ecosystem ships as a graph-DB plugin (neo4j GDS ``gds.node2vec``; the
reference itself consumes precomputed embeddings through its vector
adapters, e.g. cognee/infrastructure/databases/vector/lancedb/
LanceDBAdapter.py — this module is the stage that PRODUCES such vectors
from the graph).

Two stages, graded separately:

- :func:`sppmi_matrix` — exact integer co-occurrence counts + ONE log per
  cell (the ``term_cooccurrence`` discipline), restatable in ANSI SQL for
  the correctness oracle;
- :func:`sppmi_node_embeddings` — distributed block power iteration with
  CholeskyQR re-orthonormalization: per round ONE co-partitioned equi-join
  (nnz(M) rows against the |V| x d factor) + a partial-aggregated
  elementwise sum, plus a d x d Gram collected to the driver (d is 8-64 —
  constant-size driver state).  Float-tolerance-pinned by pytest against a
  dense eigensolver, not by the oracle (distributed double summation is
  order-dependent by design).

Scale shape at 100 TB: nnz(M) is bounded by the skip-gram corpus (walks x
window fan-out — see walk_skipgram_pairs), NOT |V|^2; every round shuffles
nnz(M) + |V| x d rows on hashed keys, the Gram/rotation matrices are d^2
driver scalars, and the factor frame is localCheckpoint'd per round so
lineage stays flat.  No driver materialization is proportional to |V|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sppmi_matrix(pairs: DataFrame, shift: int = 1) -> DataFrame:
    """Shifted positive PMI matrix from a skip-gram pair-count corpus.

    ``pairs`` is ``walk_skipgram_pairs`` output: (center, context, n_pairs).
    Returns one row per observed pair with EXACT integer marginals and the
    one-log SPPMI value:

      (center, context, n_pairs, center_total, context_total, total, sppmi)

      sppmi = max(0, round(ln((n_pairs * total) /
                              (center_total * context_total * shift)), 6))

    Numerics contract (what makes the oracle exact): all four counts are
    integers; the products and the division happen on exactly-representable
    integer-valued doubles; the single ``ln`` is the only transcendental and
    is rounded to 6 dp on both engines — the td_dsir/term_cooccurrence
    discipline.  ``shift`` is SGNS's negative-sample count k (PMI - ln k).

    Exactness bound: the BIGINT products stay exact while
    n_pairs * total < 2^53 (the double mantissa) — at a trillion-pair corpus
    compute the ratio as ln(n)+ln(D)-ln(nc)-ln(nw*k) instead; at this repo's
    scales the single-division form is used because one log of one exact
    ratio is restatable bit-for-bit in DuckDB.

    Scale: two partial-aggregated groupBys (marginals) + one 1-row total
    broadcast join — no shuffle beyond the corpus's own key distribution.
    """
    if shift < 1:
        raise ValueError("shift must be >= 1")
    p = pairs.select("center", "context", F.col("n_pairs").cast("long").alias("n_pairs"))
    ct = p.groupBy("center").agg(F.sum("n_pairs").alias("center_total"))
    xt = p.groupBy("context").agg(F.sum("n_pairs").alias("context_total"))
    # total = sum of the center marginal (exact: BIGINT addition is
    # associative) — re-aggregating ct's few rows instead of scanning the
    # full corpus a third time
    tot = ct.agg(F.sum("center_total").alias("total"))
    ratio = (F.col("n_pairs").cast("double") * F.col("total").cast("double")) / (
        F.col("center_total").cast("double")
        * (F.col("context_total") * F.lit(shift)).cast("double")
    )
    return (
        p.join(ct, "center")
        .join(xt, "context")
        .crossJoin(F.broadcast(tot))
        .select(
            "center",
            "context",
            "n_pairs",
            "center_total",
            "context_total",
            "total",
            F.greatest(F.lit(0.0), F.round(F.log(ratio), 6)).alias("sppmi"),
        )
    )


def _matmul(entries: DataFrame, q: DataFrame, dim: int) -> DataFrame:
    """Z = M @ Q for sparse M (i, j, v) and dense Q (id, q array<double>):
    one equi-join on the contraction key + one partial-aggregated elementwise
    sum — the only |V|-proportional work per power-iteration round."""
    joined = entries.join(q.select(F.col("id").alias("j"), "q"), "j")
    return joined.groupBy("i").agg(
        F.array(
            *[F.sum(F.col("v") * F.col("q")[c]).alias(f"z{c}") for c in range(dim)]
        ).alias("z")
    )


def sppmi_node_embeddings(
    pairs: DataFrame,
    dim: int = 8,
    n_iter: int = 8,
    shift: int = 1,
    seed: int = 7,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(id, embedding array<double> of length ``dim``): top-``dim`` symmetric
    factorization of the SPPMI matrix, scaled Levy-Goldberg style
    (U * sqrt(|lambda|)), via block power iteration:

    - M = symmetrized SPPMI ((M + M^T) / 2 — walk corpora are near- but not
      exactly symmetric in counts);
    - Q0 = deterministic pseudo-random block: q0[c] = hash(id|c) mapped to
      [-0.5, 0.5) — no RNG, restartable;
    - repeat ``n_iter`` times: Z = M @ Q, then CholeskyQR re-orthonormalize
      (G = Z^T Z is d x d — collected to the driver, Cholesky'd in numpy,
      and Q = Z R^{-1} applied as a literal d x d rotation);
    - finish with a Rayleigh-Ritz rotation: T = Q^T (M Q) (d x d),
      eigendecompose on the driver, rotate Q into the Ritz basis and scale
      column c by sqrt(|lambda_c|), columns ordered by |lambda| descending.

    Convergence is the standard subspace-iteration rate (|lambda_{d+1}| /
    |lambda_d|)^n_iter; the pytest pins reconstruction error against a dense
    eigensolver at small scale.  Output doubles are tolerance-stable, not
    bit-stable (distributed sums) — downstream exact oracles should consume
    :func:`sppmi_matrix`, not this frame.
    """
    import numpy as np

    from cognee_graphdb_spark.operators.dedup import _hash64

    if dim < 1 or n_iter < 1:
        raise ValueError("dim and n_iter must be >= 1")
    # materialize the pair corpus ONCE: sppmi_matrix consumes its input
    # three times (two marginals + the join spine) — ReuseExchange dedupes
    # only part of it, so a lazy `pairs` (typically the walk_skipgram_pairs
    # aggregation) re-executes its lineage several times while `sym`
    # materializes (measured 6.4s -> 4.5s for the sym build at sf0.1).
    # The checkpoint holds (center, context, n_pairs) rows — corpus-bounded.
    pairs = pairs.localCheckpoint(eager=True)
    m = sppmi_matrix(pairs, shift=shift).filter(F.col("sppmi") > 0)
    # symmetrize in ONE pass: a union of two selects over m would execute
    # the whole marginal-join chain twice (Spark shares no non-exchange
    # subplan across union branches — the same 2x the CC star step paid);
    # explode emits both orientations of each cell from a single scan
    sym = (
        m.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("center").alias("i"),
                        F.col("context").alias("j"),
                        F.col("sppmi").alias("v"),
                    ),
                    F.struct(
                        F.col("context").alias("i"),
                        F.col("center").alias("j"),
                        F.col("sppmi").alias("v"),
                    ),
                )
            ).alias("p")
        )
        .select("p.i", "p.j", "p.v")
        .groupBy("i", "j")
        .agg((F.sum("v") * F.lit(0.5)).alias("v"))
        .localCheckpoint(eager=True)
    )
    ids = sym.select(F.col("i").alias("id")).distinct()

    denom = float(1 << 20)
    q = ids.select(
        "id",
        F.array(
            *[
                (
                    F.pmod(
                        _hash64(F.concat(F.col("id"), F.lit(f"|{c}")), seed, hasher),
                        F.lit(1 << 20),
                    ).cast("double")
                    / F.lit(denom)
                    - F.lit(0.5)
                ).alias(f"q{c}")
                for c in range(dim)
            ]
        ).alias("q"),
    ).localCheckpoint(eager=True)

    def _rotate(z: DataFrame, r: "np.ndarray") -> DataFrame:
        # q_new[c] = sum_k z[k] * r[k][c], r shipped as literals (d x d)
        cols = []
        for c in range(dim):
            term = None
            for k in range(dim):
                t = F.col("z")[k] * F.lit(float(r[k, c]))
                term = t if term is None else term + t
            cols.append(term.alias(f"q{c}"))
        return z.select(F.col("i").alias("id"), F.array(*cols).alias("q"))

    for _ in range(n_iter):
        # NOTE: Z is deliberately NOT checkpointed even though the Gram and
        # the rotation both consume it (the matmul runs twice per round):
        # materializing Z pins it into many partitions whose partial-sum
        # combine order varies run to run, wobbling the Gram in the last
        # ulps and cascading through the Cholesky — measured as a
        # run-to-run determinism regression, for a sub-second saving.
        z = _matmul(sym, q, dim)
        gram_row = z.agg(
            *[
                F.sum(F.col("z")[a] * F.col("z")[b]).alias(f"g_{a}_{b}")
                for a in range(dim)
                for b in range(a, dim)
            ]
        ).first()
        g = np.zeros((dim, dim))
        for a in range(dim):
            for b in range(a, dim):
                g[a, b] = g[b, a] = float(gram_row[f"g_{a}_{b}"] or 0.0)
        # G = R^T R with R = L^T; Q = Z R^{-1}.  The eps ridge keeps the
        # Cholesky defined when a block column collapses (rank-deficient
        # subspace on tiny graphs).
        ridge = 1e-12 * max(float(np.trace(g)), 1.0)
        l = np.linalg.cholesky(g + ridge * np.eye(dim))
        rinv = np.linalg.inv(l.T)
        q = _rotate(z, rinv).localCheckpoint(eager=True)

    y = _matmul(sym, q, dim)
    t_row = (
        q.select(F.col("id").alias("i"), "q")
        .join(y, "i")
        .agg(
            *[
                F.sum(F.col("q")[a] * F.col("z")[b]).alias(f"t_{a}_{b}")
                for a in range(dim)
                for b in range(dim)
            ]
        )
        .first()
    )
    t = np.zeros((dim, dim))
    for a in range(dim):
        for b in range(dim):
            t[a, b] = float(t_row[f"t_{a}_{b}"] or 0.0)
    t = (t + t.T) / 2.0
    w, v = np.linalg.eigh(t)
    order = np.argsort(-np.abs(w))
    v = v[:, order]
    # LAPACK leaves each eigenvector's sign arbitrary — it is decided by
    # the last ulps of t, which wobble with partial-agg combine order, so
    # an entire embedding dimension can flip sign between two calls in the
    # SAME session (observed as a +0.618... -> -0.618... flip).  The
    # Cholesky path above is already ulp-pinned (see the no-checkpoint
    # NOTE); canonicalize the remaining sign freedom here: flip each
    # column so its maximum-|entry| coordinate (first such row on ties —
    # argmax order) is positive.  Driver-side d x d, zero cost.
    for c in range(v.shape[1]):
        j = int(np.argmax(np.abs(v[:, c])))
        if v[j, c] < 0:
            v[:, c] = -v[:, c]
    rot = v * np.sqrt(np.abs(w[order]))[None, :]
    out = _rotate(q.select(F.col("id").alias("i"), F.col("q").alias("z")), rot)
    return out.select("id", F.col("q").alias("embedding"))


def fastrp_embeddings(
    nodes: DataFrame,
    edges: DataFrame,
    dim: int = 8,
    iteration_weights: tuple[float, ...] = (0.0, 1.0, 1.0),
    sparsity: int = 3,
    seed: int = 42,
    hasher: str = "xxhash64",
    symmetric: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """(id, embedding): FastRP structural node embeddings (Chen, Sultan,
    Tyagi & Skiena 2019, "Fast and Accurate Network Embeddings via Very
    Sparse Random Projection", arXiv:1908.11512) — neo4j GDS's default
    embedding procedure (``gds.fastRP``), the iteration-free counterpart to
    :func:`sppmi_node_embeddings` on the same surface the reference
    ecosystem ships as graph-DB plugins.

    Algorithm, re-expressed as Spark dataflow:

    1. **Very sparse random projection** (Achlioptas/Li): each node's
       initial vector has entries in {-1, 0, +1} with P(non-zero) =
       1/``sparsity`` — NO RNG state, entry (i, j) is a pure seeded-hash
       function of the node id and dimension (the dedup family's
       ``_hash64`` discipline, so ``hasher='md5_64'`` is bit-reproducible
       in ANSI SQL for the correctness oracle).  The paper's sqrt(s)
       magnitude is dropped: every iteration L2-normalizes per node, and a
       scalar common to all entries cancels there.
    2. **K averaging rounds**: X_k = rownorm(D^-1 A X_{k-1}) — each node
       averages its (symmetrized, deduped) neighbors' vectors, then
       L2-normalizes.  One equi-join (|E| rows against the |V| x d
       factor) + ONE map-side-combined partial aggregation of d means per
       round — the pagerank shuffle shape, d-wide instead of 1-wide.
    3. **Weighted sum**: embedding = sum_k iteration_weights[k] * X_k
       (GDS's iterationWeights, default [0.0, 1.0, 1.0]: three rounds,
       first unweighted — pure first-order structure is noise, second and
       third order carry the signal).

    Scale shape at 100 TB: no driver state beyond the d weights, no
    collect, no RNG broadcast; the init is map-only hash math; isolated
    nodes embed as the zero vector (the GDS convention).  Lineage is
    truncated every round like the other iterative operators — the weighted
    accumulator references every round's x, so a lazy chain re-executes
    once per accumulator join (pass ``checkpoint=False`` for a fully lazy
    plan, e.g. to inspect the composed logical plan).

    Numerics: norms accumulate with a sequential left fold
    (``F.aggregate``), matching DuckDB's ``list_dot_product`` operand
    order; round-1 values are exact rationals (integer sums / counts), and
    later rounds' partial-agg sum-order wobble is absorbed by the contract
    entry's ppm quantization (the a2_eigenvector/a2_hits discipline).
    """
    from cognee_graphdb_spark.operators.dedup import _hash64

    if dim < 1 or sparsity < 1 or not iteration_weights:
        raise ValueError("fastrp needs dim >= 1, sparsity >= 1 and >= 1 weight")
    ids = nodes.select("id").distinct()
    pairs = edges.select("src", "dst")
    if symmetric:
        pairs = pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    pairs = pairs.filter(F.col("src") != F.col("dst")).distinct()
    if checkpoint:
        # the pair list feeds EVERY round's join: materialize the
        # symmetrize+distinct shuffle once (executor memory+disk) instead of
        # re-deriving it from lineage K times — measured 16s -> ~11s on the
        # XL probe graph
        pairs = pairs.localCheckpoint(eager=True)

    def _init_entry(j: int):
        m = F.pmod(
            _hash64(F.concat(F.col("id"), F.lit(f"|{j}")), seed, hasher),
            F.lit(2 * sparsity),
        )
        return (
            F.when(m == 0, F.lit(1.0)).when(m == 1, F.lit(-1.0)).otherwise(F.lit(0.0))
        )

    def _rownorm(df: DataFrame) -> DataFrame:
        norm2 = F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)
        return df.select(
            "id",
            F.when(
                norm2 > 0.0,
                F.transform("v", lambda x: x / F.sqrt(norm2)),
            )
            .otherwise(F.array(*[F.lit(0.0)] * dim))
            .alias("v"),
        )

    x = _rownorm(ids.select("id", F.array(*[_init_entry(j) for j in range(dim)]).alias("v")))
    acc = None
    for k, w in enumerate(iteration_weights):
        msgs = (
            pairs.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(*[F.avg(F.col("v")[j]).alias(f"c{j}") for j in range(dim)])
        )
        x = _rownorm(
            ids.join(msgs, "id", "left").select(
                "id",
                F.array(
                    *[F.coalesce(F.col(f"c{j}"), F.lit(0.0)) for j in range(dim)]
                ).alias("v"),
            )
        )
        if checkpoint:
            # materialize EVERY round (the pagerank finding): the weighted
            # accumulator below references each round's x, so a lazy round
            # chain is re-executed once per accumulator join when the final
            # frame evaluates — measured 5.4s -> 3.3s at sf0.1 d=8 and
            # 10.2s -> 4.6s on the XL probe (d=16, 955k edges)
            x = x.localCheckpoint(eager=True)
        if w == 0.0:
            continue
        term = x.select("id", F.transform("v", lambda e: e * F.lit(float(w))).alias("t"))
        if acc is None:
            acc = term.withColumnRenamed("t", "e")
        else:
            acc = (
                acc.join(term, "id")
                .select("id", F.zip_with("e", "t", lambda a, b: a + b).alias("e"))
            )
    if acc is None:  # all weights zero — a valid (if useless) request
        acc = ids.select("id", F.array(*[F.lit(0.0)] * dim).alias("e"))
    return acc.select("id", F.col("e").alias("embedding"))
