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
