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
    rerank: int = 50,
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
