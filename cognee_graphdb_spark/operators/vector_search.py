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
