"""Approximate-nearest-neighbor search over embedding columns.

Baseline: exact brute-force cosine top-k (vector_search.knn) — one scan,
TakeOrderedAndProject, no shuffle.  Scale path: random-hyperplane LSH — a
deterministic, seed-fixed set of hyperplanes maps each vector to a sign-bit
bucket; queries probe only their own bucket (optionally neighbors at Hamming
distance 1).  Bucketing is a pure expression, so the bucketed table can be
written partitioned-by-bucket and a probe becomes a partition-pruned scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.functions.vectors import cosine_distance

_SEED = 20240613


def _hyperplanes(bits: int, dim: int) -> list[list[float]]:
    rng = np.random.RandomState(_SEED)
    return rng.standard_normal((bits, dim)).tolist()


def hyperplane_bucket(vec: Column, bits: int, dim: int) -> Column:
    """Sign-bit bucket id of a vector under fixed random hyperplanes.

    ``dim`` MUST equal the vector length: zip_with null-pads a length mismatch,
    making every dot product NULL and every row hash to bucket 0 (i.e. the LSH
    silently degenerates into a full cross-join).  Callers infer dim from the
    data when unknown (see dedup.embedding_near_duplicates).
    """
    planes = _hyperplanes(bits, dim)
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(F.zip_with(vec.cast("array<double>"), p, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        bucket = bucket + F.when(d > 0, F.lit(2**i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return bucket


def ivf_index(
    embeddings: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    seed: int = _SEED,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF (inverted-file) index: seeded KMeans centroids + per-row list
    assignment.  The scale path for ANN when hyperplane-LSH recall is not
    enough: write the assigned table partitioned by ``list_id`` and a probe
    becomes an ``nprobe``-partition scan.

    Returns (assigned DataFrame with ``list_id``, centroids).  Training runs
    on a bounded sample — centroid quality needs no full pass at 100 TB.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = embeddings.select(array_to_vector(F.col(vector_col).cast("array<double>")).alias("features"))
    frac = min(1.0, 100_000 / max(train.count(), 1))
    if frac < 1.0:
        train = train.sample(fraction=frac, seed=seed)
    model = KMeans(k=n_lists, seed=seed, initMode="k-means||").fit(train)
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]

    # assignment as a pure expression (argmin over centroid distances) so the
    # bucketed table is reproducible without shipping the model
    dists = []
    for i, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = _l2(F.col(vector_col).cast("array<double>"), lit)
        dists.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
    assigned = embeddings.withColumn("list_id", F.array_min(F.array(*dists))["i"])
    return assigned, centroids


def _probe_lists(centroids: list[list[float]], query_vector: list[float], nprobe: int) -> list[int]:
    """The nprobe list ids whose centroids are L2-closest to the query — the
    ONE definition of probe selection, shared by every IVF variant.

    Distances accumulate as a LEFT FOLD over dimensions in float64 and ties
    break by list id — bit-identical to the SQL ``aggregate(zip_with(...))``
    + ``ORDER BY dist, list_id`` that :func:`ivf_batch_topk` plans, so the
    single-query and batch paths can never pick different probe sets on a
    near-tie (numpy's pairwise summation could)."""
    dists = [
        sum((float(ci) - float(qi)) ** 2 for ci, qi in zip(c, query_vector))
        for c in centroids
    ]
    order = sorted(range(len(centroids)), key=lambda i: (dists[i], i))
    return order[:nprobe]


def _centroids_df(spark, centroids: list[list[float]]):
    """(list_id, centroid) frame — the one construction shared by index
    persistence and batch probe selection."""
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "list_id int, centroid array<double>",
    )


def _l2(a: Column, b: Column) -> Column:
    """Squared L2 distance between two array<double> columns, accumulated as
    a left fold over dimensions (see :func:`_probe_lists` on why the fold
    order is load-bearing)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def save_ivf_index(
    assigned: DataFrame, centroids: list[list[float]], path: str
) -> None:
    """Persist an IVF index: the assigned rows land PARTITIONED BY list_id
    (so a probe is an nprobe-partition scan — Spark prunes the other
    directories at planning time) and the centroids land as a tiny parquet.
    Build once, query many — rebuilding KMeans per query is the anti-pattern
    this removes at corpus scale."""
    spark = assigned.sparkSession
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(f"{path}/lists")
    _centroids_df(spark, centroids).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )


def load_ivf_index(spark, path: str) -> tuple[DataFrame, list[list[float]]]:
    """(assigned, centroids) back from :func:`save_ivf_index`.  The
    centroids table is n_lists rows — driver-side by construction."""
    assigned = spark.read.parquet(f"{path}/lists")
    rows = spark.read.parquet(f"{path}/centroids").collect()
    centroids = [list(r["centroid"]) for r in sorted(rows, key=lambda r: r["list_id"])]
    return assigned, centroids


def ivf_topk(
    embeddings: DataFrame | None,
    query_vector: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    index: tuple[DataFrame, list[list[float]]] | None = None,
) -> DataFrame:
    """IVF ANN: scan only the ``nprobe`` lists whose centroids are closest to
    the query; exact cosine re-rank within them.  recall < 1 by design; raise
    nprobe toward n_lists for exactness.

    Pass ``index`` (from :func:`ivf_index` or :func:`load_ivf_index`) to
    reuse a built index across queries — with a persisted index the filter
    below becomes partition pruning, so each query reads only its nprobe
    list directories."""
    if index is not None:
        assigned, centroids = index
    else:
        assigned, centroids = ivf_index(embeddings, n_lists, id_col, vector_col)
    probe = _probe_lists(centroids, query_vector, nprobe)
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    return (
        assigned.filter(F.col("list_id").isin(probe))
        .select(id_col, cosine_distance(F.col(vector_col), qv).alias("distance"))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_batch_topk(
    queries: DataFrame,
    index: tuple[DataFrame, list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """MANY queries against one (persisted) IVF index, fully declarative:
    probe selection is a broadcast join against the tiny centroids table
    (rank L2 per query, keep nprobe), candidate generation an equi-join on
    list_id, and the per-query top-k a ranking window — no driver-side loop
    over queries, so a million-query batch plans like any other join tree.
    Output: (query_id, vec_id, distance), k rows per query."""
    from pyspark.sql.window import Window

    assigned, centroids = index
    spark = queries.sparkSession
    cent = _centroids_df(spark, centroids)
    probes = (
        queries.join(F.broadcast(cent))
        .withColumn("_cd", _l2(F.col(query_vec_col).cast("array<double>"), F.col("centroid")))
        .withColumn("_rn", F.row_number().over(Window.partitionBy(query_id_col).orderBy(F.col("_cd").asc(), F.col("list_id").asc())))
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, query_vec_col, "list_id")
    )
    scored = probes.join(assigned, "list_id").select(
        query_id_col,
        id_col,
        cosine_distance(F.col(vector_col), F.col(query_vec_col)).alias("distance"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("distance").asc(), F.col(id_col).asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: score only vectors in the query's bucket.

    Exactness is traded for a ~2^bits reduction in scanned rows; the bucket
    column is precomputable + partitionable for 100 TB corpora.
    """
    dim = len(query_vector)
    bucketed = embeddings.withColumn("bucket", hyperplane_bucket(F.col(vector_col), bits, dim))
    qb_vals = _hyperplanes(bits, dim)
    qbucket = sum((2**i) for i, p in enumerate(qb_vals) if float(np.dot(p, query_vector)) > 0)
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    return (
        bucketed.filter(F.col("bucket") == qbucket)
        .select(id_col, cosine_distance(F.col(vector_col), qv).alias("distance"))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization — 4x smaller vectors for shuffle/storage-bound ANN
# ---------------------------------------------------------------------------


def quantization_params(
    embeddings: DataFrame, vector_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (mins, maxs) over the collection — the affine int8
    quantization grid.  One posexplode + per-dim aggregate (dim rows — tiny);
    collected to the driver so quantize/dequantize stay pure codegen
    expressions with literal grids."""
    rows = (
        embeddings.select(F.posexplode(F.col(vector_col).cast("array<double>")).alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("i")
        .collect()
    )
    return [r["mn"] for r in rows], [r["mx"] for r in rows]


def quantize_int8(
    embeddings: DataFrame,
    mins: list[float],
    maxs: list[float],
    vector_col: str = "embedding",
    out_col: str = "q_vector",
) -> DataFrame:
    """Affine per-dim quantization to int8: q = round((x−mn)·254/(mx−mn)) − 127,
    constant dims quantize to 0.  array<int> output is 4x smaller than
    float32 on the wire — at 100 TB the ANN candidate shuffle is usually
    bandwidth-bound, and re-ranking the top candidates against the
    full-precision vectors restores exactness."""
    mn = F.array(*[F.lit(float(v)) for v in mins])
    sc = F.array(*[F.lit(float(b) - float(a)) for a, b in zip(mins, maxs)])
    diffs = F.zip_with(F.col(vector_col).cast("array<double>"), mn, lambda x, m: x - m)
    q = F.zip_with(
        diffs,
        sc,
        lambda d, s: F.when(s == 0.0, F.lit(0)).otherwise(
            (F.round((d * 254.0) / s) - 127).cast("int")
        ),
    )
    return embeddings.withColumn(out_col, q)


def dequantize_expr(qcol, mins: list[float], maxs: list[float]):
    """x̂ = mn + (q+127)·(mx−mn)/254 as a codegen expression (array<double>)."""
    mn = F.array(*[F.lit(float(v)) for v in mins])
    sc = F.array(*[F.lit(float(b) - float(a)) for a, b in zip(mins, maxs)])
    scaled = F.zip_with(qcol, sc, lambda q, s: ((q + 127.0) * s) / 254.0)
    return F.zip_with(scaled, mn, lambda d, m: d + m)


def knn_quantized(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    params: tuple[list[float], list[float]] | None = None,
) -> DataFrame:
    """Exact top-k over the QUANTIZED collection: (id, qdist) by cosine of the
    dequantized vectors against the full-precision query.  Bounds the ranking
    error of an int8-stored corpus; compose with LSH/IVF pruning for the full
    scale path (quantized candidate scan → full-precision re-rank)."""
    mins, maxs = params if params is not None else quantization_params(embeddings, vector_col)
    qd = quantize_int8(embeddings, mins, maxs, vector_col)
    xhat = dequantize_expr(F.col("q_vector"), mins, maxs)
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    return (
        qd.select(id_col, cosine_distance(xhat, qv).alias("qdist"))
        .withColumn("qdist", F.round("qdist", 6))
        .orderBy(F.col("qdist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_quantized_topk(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 2,
    rerank: int = 100,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """The full ANN scale path in one plan: IVF list pruning → int8 quantized
    candidate scoring → full-precision re-rank of the top ``rerank``.

    The three stages each attack a different bottleneck: nprobe/n_lists of
    the data is READ (partition pruning on a list_id-partitioned table);
    candidates are scored on 4x-smaller int8 vectors (the scan/shuffle is
    bandwidth-bound at 100 TB); only ``rerank`` survivors touch their
    full-precision vectors for exact cosine.  Recall vs exact kNN is bounded
    by (nprobe coverage) x (rerank depth); both knobs trade cost for recall
    monotonically.
    """
    assigned, centroids = ivf_index(embeddings, n_lists, id_col, vector_col)
    cand = assigned.filter(F.col("list_id").isin(_probe_lists(centroids, query_vector, nprobe)))

    mins, maxs = quantization_params(cand, vector_col)
    qd = quantize_int8(cand, mins, maxs, vector_col)
    xhat = dequantize_expr(F.col("q_vector"), mins, maxs)
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    shortlist = (
        qd.select(id_col, vector_col, cosine_distance(xhat, qv).alias("qdist"))
        .orderBy(F.col("qdist").asc(), F.col(id_col).asc())
        .limit(rerank)
    )
    return (
        shortlist.select(id_col, cosine_distance(F.col(vector_col), qv).alias("distance"))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF_PQ) — memory-bound ANN at 100 TB
# ---------------------------------------------------------------------------
# Reference family: LanceDB's default IVF_PQ index (LanceDBAdapter.py
# create-index path).  A D-dim vector is split into m_sub subvectors; each
# subspace gets a k_codes-entry codebook (deterministic k-means — the
# semdedup discipline: hash-seeded, mean-recentered, tie -> lowest code), and
# a vector is stored as m_sub small integers.  Query-time ADC (asymmetric
# distance computation) scores candidates from a per-subspace lookup table of
# query-to-centroid distances — no full-precision vector is touched until the
# final re-rank.  At 8 bits/code a 64-dim float32 vector compresses 32x,
# which is what makes the candidate scan memory- (not bandwidth-) bound.


def _pq_view(vec, normalize: bool):
    """array<double> view of a vector column, unit-normalized when asked
    (zero vectors pass through) — the semdedup _sd_unit discipline, shared by
    training and encoding so their geometry can never diverge."""
    v = vec.cast("array<double>")
    if not normalize:
        return v
    nrm = F.sqrt(
        F.aggregate(F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    )
    return F.when(nrm == 0, v).otherwise(F.transform(v, lambda x: x / nrm))


def _fold_dot(a, b) -> float:
    """Sequential left-fold dot product — bit-identical to the codegen
    ``aggregate(zip_with(...))`` fold AND DuckDB's list_dot_product, so
    driver-side LUT literals, executor-side encode expressions, and the SQL
    oracle can never disagree on a near-tie."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _unit(vec: list[float]) -> list[float]:
    """Driver-side mirror of :func:`_pq_view` (same left-fold norm order)."""
    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    n = acc ** 0.5
    return [float(x) for x in vec] if n == 0 else [float(x) / n for x in vec]


def pq_codebooks(
    embeddings: DataFrame,
    m_sub: int = 8,
    k_codes: int = 16,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    hasher: str = "xxhash64",
    seed: int = 41,
    normalize: bool = True,
) -> list[list[list[float]]]:
    """Train per-subspace PQ codebooks: ``codebooks[m][j]`` is the j-th
    centroid of subspace m.  Deterministic end to end (no RNG, no MLlib):

    - seeds = the ``k_codes`` rows with the smallest (seeded hash(id), id),
      sliced per subspace — the semdedup seed rule;
    - each round: assign every subvector to the L2-closest centroid of its
      subspace (tie -> lowest code), then recenter at the elementwise mean
      (an emptied code keeps its previous centroid).  The argmin metric is
      computed as ||c||^2 - 2*x.c (equivalent to squared L2 at fixed x) so
      every comparison is built from sequential-fold dot products — the one
      float primitive DuckDB's list_dot_product restates bit-identically;

    so the training unrolls to SQL and the oracle can restate the integer
    code assignment exactly.  L2 accumulates as a LEFT FOLD over dimensions
    (the :func:`_l2` order contract).  One crossJoin against an
    (m_sub * k_codes)-row broadcast per round — centroid count is tiny by
    construction, so training is a few scans of a bounded sample at any
    corpus size.

    Vectors are UNIT-NORMALIZED first (``normalize=True``): the search-side
    metric is cosine, and on the unit sphere squared L2 = 2 - 2cos is
    monotone in it — training PQ on raw norms would rank the ADC shortlist
    by magnitude, not direction (LanceDB does the same for cosine-metric
    IVF_PQ indexes).
    """
    from pyspark.sql.window import Window

    from cognee_graphdb_spark.operators.dedup import _hash64

    dim = len(embeddings.select(vector_col).first()[0])
    if dim % m_sub != 0:
        raise ValueError(f"m_sub={m_sub} must divide dim={dim}")
    d_sub = dim // m_sub

    e = embeddings.select(
        F.col(id_col).cast("string").alias("id"),
        _pq_view(F.col(vector_col), normalize).alias("v"),
    )
    slices = F.array(*[F.slice(F.col("v"), m * d_sub + 1, d_sub) for m in range(m_sub)])
    sv = e.select("id", F.posexplode(slices).alias("sub", "sv")).localCheckpoint(eager=True)

    h = _hash64(F.col("id"), seed, hasher)
    seeds = e.withColumn("h", h).orderBy("h", "id").limit(k_codes)
    cent = (
        seeds.withColumn("rn", F.row_number().over(Window.orderBy("h", "id")))
        .select((F.col("rn") - 1).alias("code"), F.posexplode(slices).alias("sub", "c"))
        .localCheckpoint(eager=True)
    )

    for _ in range(n_iter):
        cc = F.aggregate(
            F.zip_with("c", "c", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        xc = F.aggregate(
            F.zip_with("sv", "c", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        assigned = (
            sv.join(F.broadcast(cent), "sub")
            .select("id", "sub", "sv", F.struct((cc - F.lit(2.0) * xc).alias("d"), F.col("code").alias("code")).alias("dc"))
            .groupBy("id", "sub", "sv")
            .agg(F.min("dc").alias("best"))
            .select("id", "sub", "sv", F.col("best.code").alias("code"))
        )
        mean = (
            assigned.select("sub", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("sub", "code", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("newc")
            )
        )
        cent = (
            cent.join(mean, ["sub", "code"], "left")
            .select("sub", "code", F.coalesce("newc", "c").alias("c"))
            .localCheckpoint(eager=True)
        )

    rows = cent.collect()  # m_sub * k_codes rows — driver-side by construction
    books: list[list[list[float]]] = [
        [None] * k_codes for _ in range(m_sub)  # type: ignore[list-item]
    ]
    for r in rows:
        books[r["sub"]][r["code"]] = [float(x) for x in r["c"]]
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    out_col: str = "pq_codes",
    normalize: bool = True,
) -> DataFrame:
    """Attach ``out_col``: array<int> of length m_sub — each vector's
    per-subspace nearest-codebook-entry index (L2, tie -> lowest code).
    Pure JVM-side expressions (literal codebooks, argmin via array_min over
    (d, j) structs), so the encoded table is reproducible without shipping a
    model and writes partitioned/bucketed like any other column.

    Expression-tree discipline: the norm and the unit view are STAGED as
    intermediate projections referenced many times — Catalyst's
    CollapseProject keeps a non-cheap multi-referenced alias in its own
    Project, so the O(dim) norm fold runs once per row, not once per
    (subspace x code) candidate (inlining it re-evaluates the norm 64x per
    row — measured 17s vs 0.4s on a 5k x 64-dim scan).  The candidate
    distances themselves are UNROLLED scalar arithmetic (element_at + the
    same left-to-right add chain the fold produced, so every double is
    bit-identical) built as ONE SQL string: higher-order-function folds are
    interpreted per row per candidate — measured 84s vs 9s for the encode
    of 1M 64-dim rows — and building ~4k Column objects through py4j costs
    seconds of driver time per call where one expr() parse is ~100ms."""
    m_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    v = F.col(vector_col).cast("array<double>")
    if normalize:
        nrm = F.sqrt(
            F.aggregate(F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        )
        staged = embeddings.withColumn("__pq_nrm", nrm).withColumn(
            "__pq_u",
            F.when(F.col("__pq_nrm") == 0, v).otherwise(
                F.transform(v, lambda x: x / F.col("__pq_nrm"))
            ),
        )
        drop_cols = ["__pq_nrm", "__pq_u"]
    else:
        staged = embeddings.withColumn("__pq_u", v)
        drop_cols = ["__pq_u"]

    def dlit(x: float) -> str:
        # repr() round-trips doubles exactly; the string-cast parse yields
        # the identical IEEE value the old F.lit literal carried
        return f"CAST('{repr(float(x))}' AS DOUBLE)"

    code_exprs = []
    for m, book in enumerate(codebooks):
        cands = []
        for j, cb in enumerate(book):
            terms = "0.0D"
            for d in range(d_sub):
                terms = (
                    f"({terms} + (element_at(__pq_u, {m * d_sub + d + 1})"
                    f" * {dlit(cb[d])}))"
                )
            dist = f"({dlit(_fold_dot(cb, cb))} - (2.0D * {terms}))"
            cands.append(f"struct({dist} AS d, {j} AS j)")
        code_exprs.append(f"array_min(array({', '.join(cands)})).j")
    out = staged.withColumn(out_col, F.expr(f"array({', '.join(code_exprs)})"))
    return out.drop(*drop_cols)


def _pq_lut(
    codebooks: list[list[list[float]]],
    query_vector: list[float],
    normalize: bool = True,
) -> list[list[float]]:
    """ADC lookup table: lut[m][j] = ||c_mj||^2 - 2*q_m.c_mj — squared L2
    between the query's m-th subvector and codebook entry j, up to the
    per-m constant ||q_m||^2 (which shifts every ADC score equally and so
    never changes an ordering).  Built from :func:`_fold_dot` folds, the
    same op order as the executor-side encode and the SQL oracle."""
    m_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    qv = _unit(query_vector) if normalize else [float(x) for x in query_vector]
    lut = []
    for m, book in enumerate(codebooks):
        q = qv[m * d_sub : (m + 1) * d_sub]
        row = []
        for cb in book:
            row.append(_fold_dot(cb, cb) - 2.0 * _fold_dot(q, cb))
        lut.append(row)
    return lut


def pq_adc_expr(codes_col, lut: list[list[float]]):
    """sum_m lut[m][codes[m]] as a codegen expression (left-to-right add)."""
    acc = None
    for m, row in enumerate(lut):
        term = F.element_at(
            F.array(*[F.lit(float(x)) for x in row]),
            F.element_at(codes_col, m + 1) + 1,
        )
        acc = term if acc is None else acc + term
    return acc


def pq_topk(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    m_sub: int = 8,
    k_codes: int = 16,
    rerank: int = 100,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    hasher: str = "xxhash64",
) -> DataFrame:
    """PQ ANN: ADC shortlist over the compressed codes, exact cosine re-rank
    of the top ``rerank`` against their full-precision vectors.  The ADC scan
    touches only m_sub ints + an (m_sub x k_codes) literal LUT per row — the
    32x-compressed scan LanceDB's IVF_PQ runs per probed partition.  Recall
    is bounded by quantization coarseness x rerank depth; both knobs trade
    cost for recall monotonically.  Pass ``codebooks`` to reuse training
    across queries (build once, query many)."""
    if codebooks is None:
        codebooks = pq_codebooks(
            embeddings, m_sub, k_codes, id_col=id_col, vector_col=vector_col, hasher=hasher
        )
    encoded = pq_encode(embeddings, codebooks, id_col, vector_col)
    lut = _pq_lut(codebooks, query_vector)
    adc = pq_adc_expr(F.col("pq_codes"), lut)
    # codes-only shortlist: the ADC scan projects (id, adc) — NOT the
    # full-precision vector — so the TakeOrderedAndProject heap holds
    # m_sub ints + a double per row and, on a persisted index, parquet
    # column pruning skips the vector column entirely.  Only the ``rerank``
    # survivors fetch vectors, via a broadcast join back on the id.
    shortlist = (
        encoded.select(id_col, adc.alias("adc"))
        .orderBy(F.col("adc").asc(), F.col(id_col).asc())
        .limit(rerank)
    )
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    rerank_vecs = F.broadcast(shortlist).join(
        embeddings.select(id_col, vector_col), id_col
    )
    return (
        rerank_vecs.select(id_col, cosine_distance(F.col(vector_col), qv).alias("distance"))
        .withColumn("distance", F.round("distance", 6))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 2,
    m_sub: int = 8,
    k_codes: int = 16,
    rerank: int = 100,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    index: tuple[DataFrame, list[list[float]]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """LanceDB's default index family end to end: IVF list pruning -> PQ ADC
    scan of the probed lists -> full-precision re-rank.  Each stage attacks a
    different bottleneck: nprobe/n_lists of the data is READ (partition
    pruning on a list_id-partitioned table), candidates are scored on
    m_sub-byte codes (memory-bound, 32x smaller than float32), and only
    ``rerank`` survivors touch full-precision vectors.  Train codebooks on
    the full collection (pass ``codebooks``) to share them across queries;
    untrained calls train on the probed candidates, which biases the
    codebooks toward the query's region (fine for one-shot use)."""
    if index is not None:
        assigned, centroids = index
    else:
        assigned, centroids = ivf_index(embeddings, n_lists, id_col, vector_col)
    cand = assigned.filter(F.col("list_id").isin(_probe_lists(centroids, query_vector, nprobe)))
    if codebooks is None:
        codebooks = pq_codebooks(cand, m_sub, k_codes, id_col=id_col, vector_col=vector_col)
    return pq_topk(
        cand,
        query_vector,
        k=k,
        m_sub=m_sub,
        k_codes=k_codes,
        rerank=rerank,
        id_col=id_col,
        vector_col=vector_col,
        codebooks=codebooks,
    )


def save_pq_index(
    encoded: DataFrame, codebooks: list[list[list[float]]], path: str
) -> None:
    """Persist a PQ index: the encoded rows (ids + full-precision vectors +
    pq_codes) as parquet, the codebooks as a tiny (sub, code, centroid)
    parquet — same build-once/query-many seam as :func:`save_ivf_index`.
    Re-encoding the corpus per query is the anti-pattern this removes; the
    codes column is what a 100 TB ADC scan reads instead of the vectors."""
    spark = encoded.sparkSession
    encoded.write.mode("overwrite").parquet(f"{path}/encoded")
    rows = [
        (m, j, [float(x) for x in cb])
        for m, book in enumerate(codebooks)
        for j, cb in enumerate(book)
    ]
    spark.createDataFrame(
        rows, "sub int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def load_pq_index(spark, path: str) -> tuple[DataFrame, list[list[list[float]]]]:
    """(encoded, codebooks) back from :func:`save_pq_index`.  The codebook
    table is m_sub * k_codes rows — driver-side by construction."""
    encoded = spark.read.parquet(f"{path}/encoded")
    rows = spark.read.parquet(f"{path}/codebooks").collect()
    m_sub = 1 + max(r["sub"] for r in rows)
    k_codes = 1 + max(r["code"] for r in rows)
    books: list[list[list[float]]] = [[None] * k_codes for _ in range(m_sub)]  # type: ignore[list-item]
    for r in rows:
        books[r["sub"]][r["code"]] = [float(x) for x in r["centroid"]]
    return encoded, books


def _batch_adc_luts(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    query_id_col: str,
    query_vec_col: str,
    normalize: bool,
) -> DataFrame:
    """(query_id, __pq_lut): one flattened ADC lookup array per query,
    computed AS COLUMNS from the broadcast codebook table (no driver loop
    over queries).  lut term per (query, sub, code) = ||c||^2 - 2*q_m.c —
    the same operand order as :func:`_pq_lut`; flattened indexed
    sub*k_codes + code.  Shared by the flat and IVF batch PQ paths."""
    spark = queries.sparkSession
    k_codes = len(codebooks[0])
    d_sub = len(codebooks[0][0])
    cb_rows = [
        (m, j, [float(x) for x in cb], _fold_dot(cb, cb))
        for m, book in enumerate(codebooks)
        for j, cb in enumerate(book)
    ]
    cb = spark.createDataFrame(
        cb_rows, "sub int, code int, centroid array<double>, cc double"
    )
    qv = _pq_view(F.col(query_vec_col), normalize)
    q = queries.select(query_id_col, qv.alias("__pq_qu"))
    qsub = F.slice(F.col("__pq_qu"), F.col("sub") * d_sub + 1, F.lit(d_sub))
    terms = q.join(F.broadcast(cb)).select(
        query_id_col,
        (F.col("sub") * k_codes + F.col("code")).alias("flat"),
        (
            F.col("cc")
            - F.lit(2.0)
            * F.aggregate(
                F.zip_with(qsub, F.col("centroid"), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("term"),
    )
    return terms.groupBy(query_id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("flat", "term"))), lambda s: s["term"]
        ).alias("__pq_lut")
    )


def _batch_adc_expr(m_sub: int, k_codes: int):
    """ADC per (query, candidate): left-to-right fold over the m_sub codes —
    the :func:`pq_adc_expr` accumulation order, against the per-query
    ``__pq_lut`` array column."""
    return F.aggregate(
        F.zip_with(
            F.col("pq_codes"),
            F.sequence(F.lit(0), F.lit(m_sub - 1)),
            lambda c, m: F.element_at(F.col("__pq_lut"), m * k_codes + c + 1),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def pq_batch_topk(
    queries: DataFrame,
    index: tuple[DataFrame, list[list[list[float]]]],
    k: int = 10,
    rerank: int = 100,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    normalize: bool = True,
) -> DataFrame:
    """MANY queries against one (persisted) PQ index, fully declarative — the
    ivf_batch_topk discipline applied to the compressed scan.  Per-query ADC
    LUTs are computed AS COLUMNS from the broadcast codebook table (no
    driver loop over queries), the candidate scan is one broadcast join of
    the flat (query, lut) frame against the encoded table reading only the
    codes column, the per-query shortlist a ranking window over ADC, and
    only ``rerank`` survivors per query touch full-precision vectors.
    Output: (query_id, vec_id, distance), k rows per query."""
    from pyspark.sql.window import Window

    encoded, codebooks = index
    m_sub = len(codebooks)
    k_codes = len(codebooks[0])
    luts = _batch_adc_luts(queries, codebooks, query_id_col, query_vec_col, normalize)
    adc = _batch_adc_expr(m_sub, k_codes)
    # codes-only ADC scan: project (id, codes) ONLY — every candidate row
    # crossing the per-query ranking-window shuffle carries m_sub ints, not
    # the float32[d] vector, and on a persisted index parquet column pruning
    # never reads the vector column for the scan.  (The r9 plan shipped the
    # vector through this window — the 100 TB defect this projection fixes.)
    scored = encoded.select(id_col, "pq_codes").join(F.broadcast(luts))
    w = Window.partitionBy(query_id_col).orderBy(F.col("adc").asc(), F.col(id_col).asc())
    shortlist = (
        scored.select(query_id_col, id_col, adc.alias("adc"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= rerank)
        .drop("_rn", "adc")
    )
    # only the n_queries x rerank survivors fetch full-precision vectors:
    # broadcast the (tiny) shortlist against the encoded table's (id, vector)
    # projection — a second, vectors-only column-pruned scan
    rerank_vecs = F.broadcast(shortlist).join(
        encoded.select(id_col, vector_col), id_col
    )
    qvs = queries.select(query_id_col, F.col(query_vec_col).alias("__pq_qv"))
    rw = Window.partitionBy(query_id_col).orderBy(F.col("distance").asc(), F.col(id_col).asc())
    return (
        rerank_vecs.join(F.broadcast(qvs), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(cosine_distance(F.col(vector_col), F.col("__pq_qv")), 6).alias(
                "distance"
            ),
        )
        .withColumn("_rn", F.row_number().over(rw))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def save_ivf_pq_index(
    assigned_encoded: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    path: str,
) -> None:
    """Persist the full LanceDB-shaped IVF_PQ index: rows (ids +
    full-precision vectors + list_id + pq_codes) land PARTITIONED BY
    list_id — a probe is an nprobe-partition scan AND the ADC read inside
    each partition is column-pruned to the codes — plus the tiny centroid
    and codebook tables.  Build once, query many."""
    spark = assigned_encoded.sparkSession
    assigned_encoded.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/lists"
    )
    _centroids_df(spark, centroids).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )
    rows = [
        (m, j, [float(x) for x in cb])
        for m, book in enumerate(codebooks)
        for j, cb in enumerate(book)
    ]
    spark.createDataFrame(
        rows, "sub int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def load_ivf_pq_index(
    spark, path: str
) -> tuple[DataFrame, list[list[float]], list[list[list[float]]]]:
    """(assigned_encoded, centroids, codebooks) back from
    :func:`save_ivf_pq_index`.  Both small tables are bounded by
    construction (n_lists / m_sub*k_codes rows)."""
    assigned = spark.read.parquet(f"{path}/lists")
    crows = spark.read.parquet(f"{path}/centroids").collect()
    centroids = [list(r["centroid"]) for r in sorted(crows, key=lambda r: r["list_id"])]
    brows = spark.read.parquet(f"{path}/codebooks").collect()
    m_sub = 1 + max(r["sub"] for r in brows)
    k_codes = 1 + max(r["code"] for r in brows)
    books: list[list[list[float]]] = [[None] * k_codes for _ in range(m_sub)]  # type: ignore[list-item]
    for r in brows:
        books[r["sub"]][r["code"]] = [float(x) for x in r["centroid"]]
    return assigned, centroids, books


def ivf_pq_batch_topk(
    queries: DataFrame,
    index: tuple[DataFrame, list[list[float]], list[list[list[float]]]],
    k: int = 10,
    nprobe: int = 2,
    rerank: int = 100,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    normalize: bool = True,
) -> DataFrame:
    """MANY queries against one persisted IVF_PQ index — the complete 100 TB
    ANN deployment path, fully declarative: per-query probe selection is a
    broadcast join against the tiny centroid table (rank L2, keep nprobe —
    the same (dist, list_id) order as the single-query :func:`_probe_lists`
    fold, so the two paths can never pick different probe sets), candidate
    generation an equi-join of the probe frame against the list_id-
    partitioned codes (dynamic partition pruning skips unprobed lists at
    100 TB), ADC scoring reads ONLY (id, list_id, pq_codes), and just
    ``rerank`` survivors per query join back for full-precision vectors.
    Output: (query_id, vec_id, distance), k rows per query."""
    from pyspark.sql.window import Window

    assigned, centroids, codebooks = index
    spark = queries.sparkSession
    m_sub = len(codebooks)
    k_codes = len(codebooks[0])

    cent = _centroids_df(spark, centroids)
    probes = (
        queries.join(F.broadcast(cent))
        .withColumn(
            "_cd", _l2(F.col(query_vec_col).cast("array<double>"), F.col("centroid"))
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.col("_cd").asc(), F.col("list_id").asc()
                )
            ),
        )
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, "list_id")
    )
    luts = _batch_adc_luts(queries, codebooks, query_id_col, query_vec_col, normalize)
    adc = _batch_adc_expr(m_sub, k_codes)
    # probed, codes-only candidate scan: (query_id, list_id) ⋈ codes on
    # list_id, then the per-query LUT joins in by query id — never a vector
    cand = (
        F.broadcast(probes)
        .join(assigned.select("list_id", id_col, "pq_codes"), "list_id")
        .join(F.broadcast(luts), query_id_col)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("adc").asc(), F.col(id_col).asc())
    shortlist = (
        cand.select(query_id_col, id_col, adc.alias("adc"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= rerank)
        .drop("_rn", "adc")
    )
    rerank_vecs = F.broadcast(shortlist).join(
        assigned.select(id_col, vector_col), id_col
    )
    qvs = queries.select(query_id_col, F.col(query_vec_col).alias("__pq_qv"))
    rw = Window.partitionBy(query_id_col).orderBy(F.col("distance").asc(), F.col(id_col).asc())
    return (
        rerank_vecs.join(F.broadcast(qvs), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(cosine_distance(F.col(vector_col), F.col("__pq_qv")), 6).alias(
                "distance"
            ),
        )
        .withColumn("_rn", F.row_number().over(rw))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
