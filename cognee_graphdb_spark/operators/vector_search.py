"""Vector / similarity search operators (SURVEY.md §2.3).

The reference's "index scan": embed a query, scan one or more collections,
rank by distance (vector_db_interface.py:80-127; LanceDBAdapter.py:224-283;
brute_force_triplet_search.py:124-164 fans out over collections).

Spark-first design notes (100 TB):
- Exact brute-force top-k compiles to TakeOrderedAndProject — a map-side
  partial top-k per partition + a tiny driver merge.  NO full shuffle, NO full
  sort: cost is one scan regardless of k.
- Batch k-NN is ONE crossJoin (queries side broadcast — it is k queries, bytes)
  + a per-query window.  The window shuffles only (query_id, candidate) pairs
  that survive nothing — at scale, prefer the aggregated form
  ``batch_knn_agg`` which does a map-side partial top-k per query via
  groupBy(query).agg(collect of top-k) and avoids materializing the full
  cross product through a window sort.
- ``limit=None`` (score every row) is preserved as an option because the
  triplet-scoring join consumes ALL scores (brute_force_triplet_search.py:143).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cognee_graphdb_spark.functions.vectors import cosine_distance, minmax_normalize


def knn(
    embeddings: DataFrame,
    query_vector: list[float] | Column,
    k: int | None = 10,
    vector_col: str = "vector",
    id_cols: tuple[str, ...] = ("id",),
    normalize: bool = False,
) -> DataFrame:
    """V1 — single-query exact k-NN by cosine distance.

    k=None ⇒ full scan with scores for every row (reference semantics at
    brute_force_triplet_search.py:143).  Ties broken by id for determinism.
    """
    qv = F.array(*[F.lit(float(x)) for x in query_vector]) if isinstance(query_vector, list) else query_vector
    scored = embeddings.select(*id_cols, cosine_distance(F.col(vector_col), qv).alias("distance"))
    if normalize:
        scored = scored.withColumn("distance", minmax_normalize("distance"))
    if k is None:
        return scored
    return scored.orderBy(F.col("distance").asc(), *[F.col(c).asc() for c in id_cols]).limit(k)


def batch_knn(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vector_col: str = "vector",
    query_vector_col: str = "query_vector",
    query_id_col: str = "query_id",
    id_cols: tuple[str, ...] = ("id",),
) -> DataFrame:
    """V2/W5 — N queries at once: broadcast queries × embeddings, rank per query.

    One scan of the big side; per-query ranking via row_number window
    (LanceDBAdapter.py:264-283 gathers per-query results the slow way).
    """
    joined = embeddings.crossJoin(F.broadcast(queries)).select(
        query_id_col,
        *id_cols,
        cosine_distance(F.col(vector_col), F.col(query_vector_col)).alias("distance"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("distance").asc(), *[F.col(c).asc() for c in id_cols])
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def batch_knn_agg(
    embeddings: DataFrame,
    queries: list[tuple],
    k: int = 10,
    vector_col: str = "vector",
    id_col: str = "id",
) -> DataFrame:
    """V2 at scale — map-side per-query top-k, NO cross-product shuffle.

    ``queries`` is a small in-memory list of (query_id, vector) — the reference
    batch search is a handful of query texts (LanceDBAdapter.py:264-283), so
    shipping them in the task closure is the broadcast.  Each partition computes
    distances for ALL queries at once with one numpy matmul (Arrow-batched) and
    keeps only its local top-k per query; the global reduce then sees at most
    ``num_partitions * len(queries) * k`` rows instead of ``N * len(queries)``.
    This is the aggregated form ``batch_knn`` should fall back to when
    k ≪ collection size.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from cognee_graphdb_spark.session import ship_package

    ship_package(embeddings.sparkSession)
    qids = [q[0] for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)  # (Q, dim)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0.0] = 1.0

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.StringType()),
            T.StructField(id_col, T.StringType()),
            T.StructField("distance", T.DoubleType()),
        ]
    )

    def local_topk(batches):
        # accumulate per-partition top-k per query across Arrow batches
        best: dict[str, list[tuple[float, str]]] = {str(q): [] for q in qids}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vector_col]])
            enorm = np.linalg.norm(emat, axis=1)
            enorm[enorm == 0.0] = 1.0
            dist = 1.0 - (emat @ qmat.T) / np.outer(enorm, qnorm)  # (rows, Q)
            ids_ = pdf[id_col].astype(str).to_numpy()
            for qi, qid in enumerate(qids):
                col = dist[:, qi]
                take = min(k, len(col))
                idx = np.argpartition(col, take - 1)[:take]
                cur = best[str(qid)]
                cur.extend((float(col[i]), ids_[i]) for i in idx)
                cur.sort()
                del cur[k:]
        rows = [(str(qid), i, d) for qid, lst in best.items() for d, i in lst]
        yield pd.DataFrame(rows, columns=["query_id", id_col, "distance"])

    partial = embeddings.select(id_col, vector_col).mapInPandas(local_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col(id_col).asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def point_lookup(embeddings: DataFrame, ids: list, id_col: str = "id") -> DataFrame:
    """V4 — payload retrieval by id list (vector_db_interface.py:64-76)."""
    return embeddings.filter(F.col(id_col).isin(ids))


def multi_collection_knn(
    embeddings: DataFrame,
    query_vector: list[float] | Column,
    collections: list,
    k: int = 5,
    collection_col: str = "collection",
    vector_col: str = "vector",
    id_cols: tuple[str, ...] = ("id",),
) -> DataFrame:
    """V6 — same query over several collections in ONE scan, top-k per collection.

    The reference fans out one async search per collection
    (brute_force_triplet_search.py:124-164); here it is a single pass with a
    per-collection ranking window — missing collections simply yield no rows.
    """
    qv = F.array(*[F.lit(float(x)) for x in query_vector]) if isinstance(query_vector, list) else query_vector
    scored = embeddings.filter(F.col(collection_col).isin(collections)).select(
        collection_col,
        *id_cols,
        cosine_distance(F.col(vector_col), qv).alias("distance"),
    )
    w = Window.partitionBy(collection_col).orderBy(F.col("distance").asc(), *[F.col(c).asc() for c in id_cols])
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k).drop("rank")
