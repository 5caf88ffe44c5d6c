"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship composed plan (cognify -> brute-force
triplet search, the reference's GRAPH_COMPLETION context path) on sf0.001.
``queries()`` exposes one callable per implemented operator from SURVEY.md §2;
``oracle_sql()`` restates each deterministic one in DuckDB SQL over the same
parquet tables.  Column names and value rounding are aligned on both sides so
the driver's order-insensitive value-hash matches.

Conventions:
- floats are rounded to 6 decimals (4 for sums of rounded terms) on BOTH sides;
- ids are strings built with the same concatenation in Spark and SQL;
- hashes shared with the oracle use md5 (Spark ``md5`` == DuckDB ``md5``); the
  64-bit variant is the first 15 hex chars parsed as a bigint on both sides;
- timestamps are compared as epoch seconds (bigint) and calendar fields are
  extracted under an explicit UTC session timezone.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make the repo importable no matter where the driver process started from
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cognee_graphdb_spark.sources.migration import TPCH_FK_SPECS, TPCH_PKS
from cognee_graphdb_spark.sources.migration import tpch_graph as _tpch_graph_raw

from cognee_graphdb_spark.session import fan_out as _fan_out
from cognee_graphdb_spark.session import ship_package as _ship_package

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _qvec(spark: SparkSession, sf_dir: str, vec_id: int) -> list[float]:
    row = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == vec_id).select("embedding").first()
    return [float(x) for x in row["embedding"]]



def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS).  Older Spark honors
    ``spark.sql.legacy.parquet.nanosAsLong`` (read as long, truncate to
    micros); Spark 4.1+ ignores that conf and reads TIMESTAMP_NTZ natively,
    truncating to micros itself (verified bit-equal to DuckDB's
    nanos->TIMESTAMP coercion over all of sf0.1).  Normalize both paths to a
    UTC-interpreted TIMESTAMP column so downstream unix_timestamp/date_format
    match the DuckDB oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    dt = dict(df.dtypes)["ts"]
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    _utc(spark)  # NTZ->LTZ cast interprets wall clock in the session TZ
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


# --- shared-input memoization ------------------------------------------------
# The driver runs every queries() entry in ONE session against ONE sf_dir.
# ~22 of them consume the migrated TPC-H graph and 5 the cognify output;
# rebuilding those per query multiplies the dedup/extraction shuffles ~20x and
# blew the round-2 correctness budget after 48 of 70 queries.  Materialize each
# shared input once (localCheckpoint: lineage-free, memory+disk, survives
# cache eviction) and hand every query the same DataFrames.

_GRAPH_MEMO: dict = {}
_COG_MEMO: dict = {}


def tpch_graph(spark: SparkSession, sf_dir: str):
    key = (id(spark.sparkContext), sf_dir)
    if key not in _GRAPH_MEMO:
        nodes, edges = _tpch_graph_raw(spark, sf_dir)
        _GRAPH_MEMO[key] = (
            nodes.localCheckpoint(eager=True),
            edges.localCheckpoint(eager=True),
        )
    return _GRAPH_MEMO[key]


def _cognify_memo(spark: SparkSession, sf_dir: str, limit: int | None):
    from cognee_graphdb_spark.plans.cognify import cognify_documents

    key = (id(spark.sparkContext), sf_dir, limit)
    if key not in _COG_MEMO:
        _ship_package(spark)
        docs = _t(spark, sf_dir, "documents")
        if limit is not None:
            docs = docs.limit(limit)
        res = cognify_documents(docs)
        res.nodes = res.nodes.localCheckpoint(eager=True)
        res.edges = res.edges.localCheckpoint(eager=True)
        res.embeddings = res.embeddings.localCheckpoint(eager=True)
        _COG_MEMO[key] = res
    return _COG_MEMO[key]


# --- SQL fragments -----------------------------------------------------------

# tokenize: identical contract in Spark (functions/text.py:tokenize) and DuckDB
_TOK = "list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9]+'), x -> x != '')"


def _cosd(a: str, b: str) -> str:
    """1 - cos similarity over two DOUBLE[] SQL expressions (same formula and
    accumulation order as functions/vectors.py:cosine_distance)."""
    return (
        f"(1.0 - list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )


def _md5_64(x: str, seed: int) -> str:
    """DuckDB mirror of operators/dedup.py:_hash64(..., hasher='md5_64')."""
    return f"CAST(concat('0x', substr(md5(concat('{seed}|', {x})), 1, 15)) AS BIGINT)"


def _pk_id_sql(table: str) -> str:
    parts = " || ':' || ".join(f"CAST({c} AS VARCHAR)" for c in TPCH_PKS[table])
    return f"'{table}:' || {parts}"


def _graph_cte() -> str:
    """WITH-clause body reproducing sources/migration.py:migrate_tables in SQL."""
    tables = sorted({s[0] for s in TPCH_FK_SPECS} | {s[2] for s in TPCH_FK_SPECS})
    type_nodes = "\n    UNION ALL ".join(
        f"SELECT 'table:{t}' AS id, '{t}' AS name, 'TableType' AS type" for t in tables
    )
    row_nodes = "\n    UNION ALL ".join(
        f"SELECT DISTINCT {_pk_id_sql(t)} AS id, '{t}' AS name, 'TableRow' AS type FROM {t}" for t in tables
    )
    fk = "\n      UNION ALL ".join(
        f"SELECT {_pk_id_sql(child)} AS src, '{parent}:' || CAST({fkcol} AS VARCHAR) AS dst, "
        f"'{fkcol}' AS relationship_name FROM {child}"
        for child, fkcol, parent, _ in TPCH_FK_SPECS
    )
    member = "\n      UNION ALL ".join(
        f"SELECT {_pk_id_sql(t)} AS src, 'table:{t}' AS dst, 'is_part_of' AS relationship_name FROM {t}"
        for t in tables
    )
    return f"""nodes AS (
    {type_nodes}
    UNION ALL {row_nodes}
), edges AS (
    SELECT DISTINCT src, dst, relationship_name FROM (
      {fk}
      UNION ALL {member}
    ) u
)"""


# J7 synthetic doc graph: deterministic construction shared by Spark and SQL.
# d = doc_id, s in {0,1}, k = d*2+s:
#   chunk:<d>:<s> -is_part_of-> doc:<d>
#   chunk -contains-> (k%10==4 ? shared:4 : ent:<k>)
#   sum:<d>:<s> -made_from-> chunk
#   ent -is_a-> (k%2==1 ? typesolo:<k> : typeshared:<k%5>)
_J7_SQL_EDGES = """
j7_base AS (
    SELECT doc_id AS d, s, doc_id * 2 + s AS k,
           'doc:' || CAST(doc_id AS VARCHAR) AS doc,
           'chunk:' || CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR) AS chunk,
           'sum:' || CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR) AS summ,
           CASE WHEN (doc_id * 2 + s) % 10 = 4 THEN 'shared:4'
                ELSE 'ent:' || CAST(doc_id * 2 + s AS VARCHAR) END AS ent,
           CASE WHEN (doc_id * 2 + s) % 2 = 1 THEN 'typesolo:' || CAST(doc_id * 2 + s AS VARCHAR)
                ELSE 'typeshared:' || CAST((doc_id * 2 + s) % 5 AS VARCHAR) END AS etype
    FROM documents, (SELECT 0 AS s UNION ALL SELECT 1) ss
), j7_edges AS (
    SELECT DISTINCT src, dst, relationship_name FROM (
      SELECT chunk AS src, doc AS dst, 'is_part_of' AS relationship_name FROM j7_base
      UNION ALL SELECT chunk, ent, 'contains' FROM j7_base
      UNION ALL SELECT summ, chunk, 'made_from' FROM j7_base
      UNION ALL SELECT ent, etype, 'is_a' FROM j7_base
    ) u
)"""


def _j7_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    s = spark.range(2).select(F.col("id").cast("int").alias("s"))
    base = docs.crossJoin(s).select(
        F.col("doc_id").alias("d"),
        "s",
        (F.col("doc_id") * 2 + F.col("s")).alias("k"),
    )
    base = base.select(
        F.concat(F.lit("doc:"), F.col("d").cast("string")).alias("doc"),
        F.concat_ws(":", F.lit("chunk"), F.col("d").cast("string"), F.col("s").cast("string")).alias("chunk"),
        F.concat_ws(":", F.lit("sum"), F.col("d").cast("string"), F.col("s").cast("string")).alias("summ"),
        F.when(F.col("k") % 10 == 4, F.lit("shared:4"))
        .otherwise(F.concat(F.lit("ent:"), F.col("k").cast("string")))
        .alias("ent"),
        F.when(F.col("k") % 2 == 1, F.concat(F.lit("typesolo:"), F.col("k").cast("string")))
        .otherwise(F.concat(F.lit("typeshared:"), (F.col("k") % 5).cast("string")))
        .alias("etype"),
    )
    e = (
        base.select(F.col("chunk").alias("src"), F.col("doc").alias("dst"), F.lit("is_part_of").alias("relationship_name"))
        .unionByName(base.select(F.col("chunk").alias("src"), F.col("ent").alias("dst"), F.lit("contains").alias("relationship_name")))
        .unionByName(base.select(F.col("summ").alias("src"), F.col("chunk").alias("dst"), F.lit("made_from").alias("relationship_name")))
        .unionByName(base.select(F.col("ent").alias("src"), F.col("etype").alias("dst"), F.lit("is_a").alias("relationship_name")))
        .dropDuplicates(["src", "dst", "relationship_name"])
    )
    ids = (
        base.select(F.col("doc").alias("id"))
        .unionByName(base.select(F.col("chunk").alias("id")))
        .unionByName(base.select(F.col("summ").alias("id")))
        .unionByName(base.select(F.col("ent").alias("id")))
        .unionByName(base.select(F.col("etype").alias("id")))
        .distinct()
    )
    nodes = ids.select("id", F.col("id").alias("name"), F.lit("n").alias("type"))
    return nodes, e


# ---------------------------------------------------------------------------
# entry — flagship composed plan
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cognify sf0.001 documents (chunk -> mock-extract -> graph +
    vector collections), then GRAPH_COMPLETION-style brute-force triplet
    search.  The driver checks rows >= 0 and a stable schema."""
    from cognee_graphdb_spark.plans.cognify import cognify_documents
    from cognee_graphdb_spark.plans.triplet_search import brute_force_triplet_search

    _ship_package(spark)
    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    res = cognify_documents(docs)
    return brute_force_triplet_search(
        res.nodes, res.edges, res.embeddings, "fast table scan merge join", k=10
    )


# ---------------------------------------------------------------------------
# queries — Spark implementations
# ---------------------------------------------------------------------------


def _q_s4_node_counts(spark, sf_dir):
    nodes, _ = tpch_graph(spark, sf_dir)
    return nodes.groupBy("type").agg(F.count(F.lit(1)).alias("n"))


def _q_a1_edge_type_frequency(spark, sf_dir):
    from cognee_graphdb_spark.operators.aggregations import edge_type_frequency

    _, edges = tpch_graph(spark, sf_dir)
    return edge_type_frequency(edges)


def _q_a3_node_degrees(spark, sf_dir):
    from cognee_graphdb_spark.operators.aggregations import node_degrees

    _, edges = tpch_graph(spark, sf_dir)
    return node_degrees(edges)


def _q_a3_degree_one(spark, sf_dir):
    from cognee_graphdb_spark.operators.aggregations import degree_one_nodes

    # restrict to the c_nationkey FK subgraph so the result is non-empty
    # (customers have exactly one nation edge; nations have many)
    nodes, edges = tpch_graph(spark, sf_dir)
    return degree_one_nodes(nodes, edges.filter(F.col("relationship_name") == "c_nationkey"))


def _q_a4_disconnected(spark, sf_dir):
    from cognee_graphdb_spark.operators.aggregations import disconnected_nodes

    nodes, edges = tpch_graph(spark, sf_dir)
    return disconnected_nodes(nodes, edges.filter(F.col("relationship_name") != "is_part_of"))


def _q_a6_distinct_schema(spark, sf_dir):
    from cognee_graphdb_spark.operators.aggregations import distinct_schema

    nodes, edges = tpch_graph(spark, sf_dir)
    return distinct_schema(nodes, edges)


def _q_p2_attribute_filter(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_joins import attribute_filter

    nodes, edges = tpch_graph(spark, sf_dir)
    fnodes, fedges = attribute_filter(nodes, edges, {"type": ["TableRow"], "name": ["nation", "region"]})
    return fnodes.join(
        fedges.groupBy("src").agg(F.count(F.lit(1)).alias("out_edges")).withColumnRenamed("src", "id"),
        "id",
        "left",
    ).select("id", "name", F.coalesce("out_edges", F.lit(0)).alias("out_edges"))


def _q_p5_valid_edges(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_joins import valid_edges

    nodes, edges = tpch_graph(spark, sf_dir)
    pruned = nodes.filter(F.col("name") != "part")  # drop part nodes -> lineitem->part edges dangle
    return valid_edges(pruned, edges).groupBy("relationship_name").agg(F.count(F.lit(1)).alias("n"))


def _q_j1_neighbors(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_joins import neighbors

    _, edges = tpch_graph(spark, sf_dir)
    return neighbors(edges, "customer:1")


def _q_j2_connections(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_joins import connections

    nodes, edges = tpch_graph(spark, sf_dir)
    return connections(edges, nodes, "nation:7")


def _q_j3_has_edges(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_joins import has_edges

    _, edges = tpch_graph(spark, sf_dir)
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 20)
    cands = orders.select(
        F.concat(F.lit("orders:"), F.col("o_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("customer:"), F.col("o_custkey").cast("string")).alias("dst"),
        F.lit("o_custkey").alias("relationship_name"),
    ).unionByName(
        spark.createDataFrame([("orders:1", "nation:0", "bogus")], ["src", "dst", "relationship_name"])
    )
    return has_edges(edges, cands)


def _q_j4_nodeset_subgraph(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_joins import nodeset_subgraph

    nodes, edges = tpch_graph(spark, sf_dir)
    _, sub_edges = nodeset_subgraph(nodes, edges, "TableRow", ["region"])
    return sub_edges


def _q_j6_k_hop(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_joins import k_hop

    _, edges = tpch_graph(spark, sf_dir)
    seeds = spark.createDataFrame([("region:0",), ("region:1",)], ["id"])
    return k_hop(edges, seeds, k=2)


def _q_so3_induced_edges(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_joins import induced_edges

    nodes, edges = tpch_graph(spark, sf_dir)
    ids = nodes.filter(F.col("name").isin(["nation", "region"]) & (F.col("type") == "TableRow")).select("id")
    return induced_edges(edges, ids)


def _q_j5_triplet_scores(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_joins import triplet_score_join

    _, edges = tpch_graph(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    qv = F.array(*[F.lit(x) for x in _qvec(spark, sf_dir, 0)])
    from cognee_graphdb_spark.functions.vectors import cosine_distance

    node_scores = emb.select(
        F.concat(F.lit("customer:"), F.col("vec_id").cast("string")).alias("id"),
        F.round(cosine_distance(F.col("embedding"), qv), 6).alias("score"),
    )
    ets = edges.select("relationship_name").distinct().select(
        "relationship_name", F.round(F.length("relationship_name") / 20.0, 6).alias("score")
    )
    return triplet_score_join(edges, node_scores, edge_type_scores=ets, k=50).withColumn(
        "triplet_score", F.round("triplet_score", 4)
    )


def _q_j7_cascade(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_joins import cascade_delete_set

    nodes, edges = _j7_graph(spark, sf_dir)
    return cascade_delete_set(nodes, edges, "doc:7")


def _q_j9_temporal_range(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_joins import temporal_range_join
    from cognee_graphdb_spark.functions.temporal import date_to_int

    _utc(spark)
    ev = _events(spark, sf_dir)
    timestamps = ev.select(
        F.concat(F.lit("ts:"), F.col("event_id").cast("string")).alias("id"),
        date_to_int("ts").alias("time_at"),
    )
    ev_edges = ev.select(
        F.concat(F.lit("ev:"), F.col("event_id").cast("string")).alias("src"),
        F.concat(F.lit("ts:"), F.col("event_id").cast("string")).alias("dst"),
        F.lit("at").alias("relationship_name"),
    )
    return temporal_range_join(timestamps, ev_edges, 1704844800, 1705708800)  # 2024-01-10..2024-01-20


def _q_v1_knn(spark, sf_dir):
    from cognee_graphdb_spark.operators.vector_search import knn

    emb = _t(spark, sf_dir, "embeddings")
    out = knn(emb, _qvec(spark, sf_dir, 7), k=10, vector_col="embedding", id_cols=("vec_id",))
    return out.withColumn("distance", F.round("distance", 6))


def _q_v2_batch_knn(spark, sf_dir):
    from cognee_graphdb_spark.operators.vector_search import batch_knn

    emb = _t(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id").isin([1, 3, 5, 7, 9]))
        .select(F.col("vec_id").cast("string").alias("query_id"), F.col("embedding").alias("query_vector"))
    )
    out = batch_knn(emb, queries, k=3, vector_col="embedding", id_cols=("vec_id",))
    return out.withColumn("distance", F.round("distance", 6))


def _q_v2_batch_knn_agg(spark, sf_dir):
    from cognee_graphdb_spark.operators.vector_search import batch_knn_agg

    emb = _t(spark, sf_dir, "embeddings")
    qs = [(str(i), _qvec(spark, sf_dir, i)) for i in (1, 3, 5, 7, 9)]
    out = batch_knn_agg(emb.withColumn("vec_id", F.col("vec_id").cast("string")), qs, k=3, vector_col="embedding", id_col="vec_id")
    return out.withColumn("distance", F.round("distance", 6))


def _q_v3_minmax(spark, sf_dir):
    from cognee_graphdb_spark.operators.vector_search import knn

    emb = _t(spark, sf_dir, "embeddings")
    out = knn(emb, _qvec(spark, sf_dir, 7), k=None, vector_col="embedding", id_cols=("vec_id",), normalize=True)
    return out.withColumn("distance", F.round("distance", 6))


def _q_p4_score_threshold(spark, sf_dir):
    return _q_v3_minmax(spark, sf_dir).filter(F.col("distance") < 0.5)


def _q_v4_point_lookup(spark, sf_dir):
    from cognee_graphdb_spark.operators.vector_search import point_lookup

    emb = _t(spark, sf_dir, "embeddings")
    return point_lookup(emb, [5, 105, 205], id_col="vec_id").select("vec_id", "label")


def _q_v6_multi_collection(spark, sf_dir):
    from cognee_graphdb_spark.operators.vector_search import multi_collection_knn

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "collection", F.concat(F.lit("c"), (F.col("label") % 3).cast("string"))
    )
    out = multi_collection_knn(
        emb, _qvec(spark, sf_dir, 7), ["c0", "c1", "c2"], k=5, vector_col="embedding", id_cols=("vec_id",)
    )
    return out.withColumn("distance", F.round("distance", 6))


def _q_so1_union_dedup(spark, sf_dir):
    from cognee_graphdb_spark.operators.vector_search import knn

    emb = _t(spark, sf_dir, "embeddings")
    a = knn(emb, _qvec(spark, sf_dir, 7), k=10, vector_col="embedding", id_cols=("vec_id",))
    b = knn(emb, _qvec(spark, sf_dir, 11), k=10, vector_col="embedding", id_cols=("vec_id",))
    return (
        a.unionByName(b)
        .groupBy("vec_id")
        .agg(F.round(F.min("distance"), 6).alias("distance"))
    )


def _q_ann_lsh(spark, sf_dir):
    from cognee_graphdb_spark.operators.similarity import ann_lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = ann_lsh_topk(emb, _qvec(spark, sf_dir, 7), k=10, bits=6)
    return out.withColumn("distance", F.round("distance", 6))


def _q_dedup_exact(spark, sf_dir):
    from cognee_graphdb_spark.operators.dedup import exact_duplicates

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") < 50).select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return exact_duplicates(docs.unionByName(clones))


def _q_dedup_jaccard(spark, sf_dir):
    from cognee_graphdb_spark.operators.dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return jaccard_pairs(docs, threshold=0.95)


def _q_dedup_clusters(spark, sf_dir):
    from cognee_graphdb_spark.operators.dedup import dedup_clusters, jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.95)
    return dedup_clusters(docs, pairs)


def _q_dedup_minhash(spark, sf_dir):
    from cognee_graphdb_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, num_hashes=16, bands=8, threshold=0.5, hasher="md5_64")


def _q_dedup_incremental_index(spark, sf_dir):
    """The persisted near-dup registry (operators/dedup.py:
    minhash_index_build/minhash_index_dedup): even doc_ids build the index,
    odd doc_ids arrive as the 'new batch' and dedup against it.  Sharing a
    band bucket is pairwise, so the cross-batch pairs equal a full-corpus
    run's pairs restricted to opposite parity — which is exactly how the
    DuckDB oracle restates it."""
    import hashlib
    import tempfile

    from cognee_graphdb_spark.operators.dedup import (
        minhash_index_build,
        minhash_index_dedup,
    )

    docs = _t(spark, sf_dir, "documents")
    # fixed per-sf_dir path, rebuilt (overwritten) each invocation — a fresh
    # mkdtemp per call would leak an abandoned index dir every run
    path = os.path.join(
        tempfile.gettempdir(), f"mhidx_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    )
    minhash_index_build(
        docs.filter(F.col("doc_id") % 2 == 0), path, num_hashes=16, bands=8, hasher="md5_64"
    )
    return minhash_index_dedup(
        docs.filter(F.col("doc_id") % 2 == 1), path, threshold=0.5, update=False
    )


def _q_dedup_simhash(spark, sf_dir):
    from cognee_graphdb_spark.operators.dedup import simhash

    docs = _t(spark, sf_dir, "documents")
    return simhash(docs, bits=16, hasher="md5_64")


def _q_dedup_embedding(spark, sf_dir):
    from cognee_graphdb_spark.operators.dedup import embedding_near_duplicates

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(emb, threshold=0.4)


def _q_dedup_embedding_lsh(spark, sf_dir):
    from cognee_graphdb_spark.operators.dedup import embedding_near_duplicates

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(emb, threshold=0.4, lsh_bits=4, dim=64)


def _q_quality_features(spark, sf_dir):
    from cognee_graphdb_spark.operators.text_analysis import quality_features

    return quality_features(_t(spark, sf_dir, "documents"))


def _q_language_id(spark, sf_dir):
    from cognee_graphdb_spark.operators.text_analysis import language_id

    return language_id(_t(spark, sf_dir, "documents"))


def _q_fingerprint(spark, sf_dir):
    from cognee_graphdb_spark.operators.text_analysis import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents"))


def _q_dedup_fuzzy_names(spark, sf_dir):
    """Entity name near-duplicates (dedup.py:fuzzy_name_matches): 3-gram
    postings blocking + Levenshtein <= 2 over part names, aggregated to
    distinct (name_a, name_b, distance) pairs with multiplicities.  ASCII
    data by construction, so DuckDB's byte-level levenshtein == Spark's
    character-level one (documented divergence on multibyte UTF-8)."""
    from cognee_graphdb_spark.operators.dedup import fuzzy_name_matches

    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("name")
    )
    m = fuzzy_name_matches(part, max_distance=2, qgram=3, hasher="md5_64")
    return m.groupBy("name_a", "name_b", "distance").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def _q_dedup_entity_resolution(spark, sf_dir):
    """End-to-end entity resolution (dedup.py:fuzzy_name_matches ∘
    dedup_clusters): blocked Levenshtein<=1 name matches collapsed by
    transitive closure to a canonical min-id keeper per entity cluster —
    the full ER pipeline a relational migration runs before keying graph
    nodes.  Oracle: the same blocking+distance pairs fed to a recursive
    reachability CTE with the same string-min keeper election."""
    from cognee_graphdb_spark.operators.dedup import dedup_clusters, fuzzy_name_matches

    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("name")
    )
    m = fuzzy_name_matches(part, max_distance=1, qgram=3, hasher="md5_64")
    return dedup_clusters(
        part.select(F.col("id").alias("doc_id")),
        m.select("id_a", "id_b"),
        id_col="doc_id",
    )


def _q_term_cooccurrence(spark, sf_dir):
    """Windowed PMI co-occurrence (text_analysis.py:term_cooccurrence — the
    word2vec/GloVe corpus statistic): stopword-filtered positions, window 3,
    max_df 400 hot-term cap, pairs seen >= 3 times.  Hashes n_pairs plus
    lift ppm-quantized (lift = c*N/(m1*m2) is integer products + ONE IEEE
    division, bit-identical across engines; pmi = ln(lift) is not)."""
    from cognee_graphdb_spark.operators.text_analysis import term_cooccurrence

    out = term_cooccurrence(
        _t(spark, sf_dir, "documents"), window=3, min_pair_count=3, max_df=400
    )
    return out.select(
        "t1",
        "t2",
        "n_pairs",
        F.round(F.col("lift") * F.lit(1000000.0)).cast("long").alias("lift_ppm"),
    )


def _q_token_counts(spark, sf_dir):
    from cognee_graphdb_spark.operators.text_analysis import token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens"))


def _q_a5_top_words(spark, sf_dir):
    from cognee_graphdb_spark.operators.aggregations import top_n_words

    return top_n_words(_t(spark, sf_dir, "documents"), n=20)


def _q_a7_token_f1(spark, sf_dir):
    from cognee_graphdb_spark.operators.aggregations import token_overlap_f1
    from cognee_graphdb_spark.functions.text import tokenize

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("gold_text"))
    pairs = docs.join(nxt, "doc_id").select(
        "doc_id", tokenize(F.col("text")).alias("pred"), tokenize(F.col("gold_text")).alias("gold")
    )
    p, r, f1 = token_overlap_f1(F.col("pred"), F.col("gold"))
    return pairs.select(
        "doc_id",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def _q_f4_unicode_tokens(spark, sf_dir):
    from cognee_graphdb_spark.functions.text import tokenize, tokenize_unicode

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(tokenize(F.col("text"))).cast("bigint").alias("ascii_tokens"),
        F.size(tokenize_unicode(F.col("text"))).cast("bigint").alias("unicode_tokens"),
    )


def _q_f5_content_id(spark, sf_dir):
    from cognee_graphdb_spark.ids import content_id

    cust = _t(spark, sf_dir, "customer")
    return cust.select("c_custkey", content_id("c_name", "c_custkey").alias("data_id"))


def _q_f6_normalize(spark, sf_dir):
    from cognee_graphdb_spark.ids import normalize_name

    part = _t(spark, sf_dir, "part")
    return part.select("p_partkey", normalize_name("p_name").alias("norm_name"))


def _q_f10_title(spark, sf_dir):
    from cognee_graphdb_spark.functions.text import title_with_top_words

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", title_with_top_words(F.col("text")).alias("title"))


def _q_f7_calendar(spark, sf_dir):
    from cognee_graphdb_spark.functions.temporal import calendar_fields, date_to_int

    _utc(spark)
    ev = _events(spark, sf_dir)
    cal = calendar_fields("ts")
    return ev.select(
        "event_id",
        date_to_int("ts").alias("time_at"),
        *[c.cast("bigint").alias(k) for k, c in cal.items()],
    )


def _q_p6_json_extract(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.select("event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k"))


def _q_w4_last_k(spark, sf_dir):
    from cognee_graphdb_spark.functions.temporal import date_to_int

    _utc(spark)
    ev = _events(spark, sf_dir)
    return (
        ev.select("event_id", date_to_int("ts").alias("time_at"))
        .orderBy(F.col("time_at").desc(), F.col("event_id").desc())
        .limit(10)
    )


def _q_w1_topk_smallest(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(20)
    )


def _q_w3_null_inf_sort(spark, sf_dir):
    ev = _events(spark, sf_dir)
    score = F.when(F.col("event_type") == "click", F.col("value"))
    return (
        ev.select("event_id", F.round(score, 6).alias("score"))
        .orderBy(F.coalesce(F.col("score"), F.lit(float("inf"))).asc(), F.col("event_id").asc())
        .limit(20)
    )


# --- non-SQL-expressible (rows-only checks) ---------------------------------


def _q_chunking(spark, sf_dir):
    """F1-F3 exact-reconstruction guarantee (reference TextChunker.py:11-78,
    chunk_by_paragraph.py:7-96) as an ORACLE-CHECKABLE invariant: per doc,
    the chunk texts concatenated in chunk_index order must rebuild the
    original byte-for-byte — emitted as md5 + char count, which DuckDB
    computes directly from ``documents``."""
    from cognee_graphdb_spark.operators.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, max_chunk_size=32)
    ordered = F.array_sort(F.collect_list(F.struct("chunk_index", "text")))
    return chunks.groupBy("doc_id").agg(
        F.md5(F.concat_ws("", F.transform(ordered, lambda s: s["text"]))).alias(
            "reassembled_md5"
        ),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
    )


def _q_cognify_counts(spark, sf_dir):
    res = _cognify_memo(spark, sf_dir, 100)
    return res.nodes.groupBy("type").agg(F.count(F.lit(1)).alias("n"))


def _q_chunk_classification(spark, sf_dir):
    """The chunk_naive_llm_classifier task (plans/chunk_classify.py): the
    mock classifier labels every chunk (type TextContent + first-2 distinct
    words len>=6 as subclasses), and the content-addressed
    ``is_classified_as`` edges count distinct chunks per subclass — DuckDB
    restates chunking + first-2 extraction + dedup analytically."""
    from cognee_graphdb_spark.plans.chunk_classify import classify_chunks

    res = _cognify_memo(spark, sf_dir, 100)
    cr = classify_chunks(res.chunks)
    subs = cr.nodes.filter(F.col("type") == "ClassificationSubtype").select(
        F.col("id").alias("dst"), F.col("name").alias("subclass")
    )
    return (
        cr.edges.filter(F.col("relationship_name") == "is_classified_as")
        .join(subs, "dst")
        .groupBy("subclass")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
    )


def _q_mm_llm_media_text(spark, sf_dir):
    """S2 [LLM] media loader path, oracle-checked: WAV/BMP blobs synthesize
    from doc ids, decode for REAL (PCM rms / pixel means), and the mock
    gateway turns the feature envelope into deterministic transcript /
    description text — the reference's audio_loader.py:18 /
    image_loader.py:15 -> LLMGateway.create_transcript / transcribe_image
    shape, where media is stored as text for downstream chunk/embed.  DuckDB
    restates the decoded features analytically from the synthesis formulas
    (integer-exact sums, bit-identical sqrt/div doubles, truncating ppm)."""
    import pandas as pd

    from cognee_graphdb_spark.llm.gateway import MockLLMGateway
    from cognee_graphdb_spark.sources.ingest import decode_documents

    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))
    _ship_package(spark)

    def synth(batches):
        from cognee_graphdb_spark.sources.media import synth_bmp_for_id, synth_wav_for_id

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                rows.append((f"a:{d}", "AudioDocument", synth_wav_for_id(d)))
                rows.append((f"i:{d}", "ImageDocument", synth_bmp_for_id(d)))
            yield pd.DataFrame(rows, columns=["id", "document_type", "content"])

    media = _fan_out(docs).mapInPandas(synth, "id string, document_type string, content binary")
    return decode_documents(media, gateway=MockLLMGateway())


def _q_mm_llm_media_av(spark, sf_dir):
    """S2 [LLM] media path for COMPRESSED audio/video (the r7 gap): MP3/MP4
    blobs synthesize from doc ids, the container layer parses for REAL
    (MPEG frame-header walk / ISO BMFF box tree, sources/container.py), and
    the gateway turns the container-feature envelope into transcript text —
    the reference sends compressed media to transcription WITHOUT local
    sample decode (core/audio_loader.py:18), so no MDCT decoder is needed
    for parity.  DuckDB restates duration/bitrate from the synthesis
    formulas with the same integer arithmetic."""
    import pandas as pd

    from cognee_graphdb_spark.llm.gateway import MockLLMGateway
    from cognee_graphdb_spark.sources.ingest import decode_documents

    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))
    _ship_package(spark)

    def synth(batches):
        from cognee_graphdb_spark.sources.container import synth_mp3_for_id, synth_mp4_for_id

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                rows.append((f"m3:{d}", "AudioDocument", synth_mp3_for_id(d)))
                rows.append((f"m4:{d}", "VideoDocument", synth_mp4_for_id(d)))
            yield pd.DataFrame(rows, columns=["id", "document_type", "content"])

    media = _fan_out(docs).mapInPandas(synth, "id string, document_type string, content binary")
    return decode_documents(media, gateway=MockLLMGateway())


def _q_graph_completion_context(spark, sf_dir):
    """GRAPH_COMPLETION's retrieval half, oracle-checked end to end (promoted
    from rows-only in r7): cognify 100 docs -> hash-embed every collection ->
    cosine distances -> per-collection min-max normalize -> triplet score ->
    top-10.  The a9_pagerank technique makes the floats checkable: the DuckDB
    oracle rebuilds the SAME float32 vectors (CAST(c/n AS FLOAT) per element,
    dense 64-lists so list_dot_product folds in the same index order as
    functions/vectors.py:dot) and both sides quantize the score to ppm."""
    from cognee_graphdb_spark.plans.triplet_search import brute_force_triplet_search

    res = _cognify_memo(spark, sf_dir, 100)
    top = brute_force_triplet_search(res.nodes, res.edges, res.embeddings, "fast table scan merge join", k=10)
    return top.select(
        "src", "src_name", "relationship_name", "dst", "dst_name",
        F.round(F.col("triplet_score") * 1e6).cast("bigint").alias("score_ppm"),
    )


def _q_graph_completion_e2e(spark, sf_dir):
    """Flagship SURVEY §7 Phase 0 composite, end to end: ingest -> cognify
    (U1/U2 extraction, embeddings) -> embed query (V5) -> brute-force triplet
    scoring (J5/W1) -> F11 render -> completion (U6).  Oracle-checked as of
    r7 (formerly the one rows-only entry): every output row is a literal
    string — the context lines are the reference's exact render format
    (resolve_edges_to_text.py:46-71) rebuilt in SQL with first-seen node
    ordering and ordered-string_agg titles, and the completion row is the
    mock gateway's prompt-length echo."""
    from cognee_graphdb_spark.plans.search_types import GraphContext, graph_completion_context
    from cognee_graphdb_spark.plans.triplet_search import render_triplets

    res = _cognify_memo(spark, sf_dir, 100)
    ctx = GraphContext(nodes=res.nodes, edges=res.edges, embeddings=res.embeddings)
    triplets = graph_completion_context(ctx, "fast table scan merge join", k=10)
    context = render_triplets(triplets)
    completion = ctx.gateway.complete(f"Answer 'fast table scan merge join' using:\n{context}")
    rows = [("context", i, ln) for i, ln in enumerate(context.splitlines())]
    rows.append(("completion", 0, completion))
    return spark.createDataFrame(rows, "kind STRING, line_no INT, line STRING")


def _q_a2_components(spark, sf_dir):
    """A2 connected components, promoted from rows-only to oracle-checked:
    (a) the region tree (region <- nation <- customer/supplier edges) needs
    REAL multi-hop label propagation — leaves sit 2 hops from the region hub,
    one level deeper than a2_component_sizes' 1-hop stars — and its
    component-size multiset is restated by DuckDB with plain joins; (b) the
    full graph must collapse to exactly ONE component of exactly count(nodes)
    rows (every row node reaches its table hub, and FK edges chain the hubs)
    — the invariant that catches any component-SPLIT bug (the r5 star-test
    fix class) at full graph scale.  Representatives are engine-internal
    (min xxhash64), so sizes, not ids, are compared."""
    from cognee_graphdb_spark.operators.graph_metrics import connected_components

    nodes, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("n_regionkey", "c_nationkey", "s_nationkey")
    )
    members = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )

    def size_hist(comp, scope):
        return (
            comp.groupBy("component")
            .agg(F.count(F.lit(1)).alias("component_size"))
            .groupBy("component_size")
            .agg(F.count(F.lit(1)).alias("n_components"))
            .select(F.lit(scope).alias("scope"), "component_size", "n_components")
        )

    sub = size_hist(connected_components(members, fk), "region_tree")
    full = size_hist(connected_components(nodes, edges), "full")
    return sub.unionByName(full)


def _q_a9_pagerank(spark, sf_dir):
    """PageRank (graph_metrics.py:pagerank) over the region-tree FK subgraph
    (customer/supplier -> nation -> region): 10 power iterations, damping
    0.85, dangling mass from the region sinks redistributed uniformly.  The
    oracle unrolls the same 10 iterations as chained CTEs with identical
    double arithmetic (same operand order per edge term), and both sides
    quantize to ppm BIGINTs and select the top-100 by (rank_ppm, id), so the
    comparison is float-hash-safe while still pinning every hub's mass."""
    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    pr = pagerank(ids, fk, damping=0.85, n_iter=10, edges_within_nodes=True)
    return (
        pr.select(
            "id", F.round(F.col("rank") * F.lit(1000000.0)).cast("long").alias("rank_ppm")
        )
        .orderBy(F.desc("rank_ppm"), "id")
        .limit(100)
    )


def _q_a9_pagerank_personalized(spark, sf_dir):
    """Personalized PageRank (graph_metrics.py:pagerank(personalized=...)):
    the reset vector AND the dangling mass return to the seed set (the
    nation hub rows) instead of all nodes — the GDS variant a memory layer
    ranks entities around a query's seeds with.  Oracle: the same 10
    iterations unrolled with p-weighted arithmetic in the same operand
    order, ppm-quantized."""
    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    seeds = ids.filter(F.col("id").startswith("nation:"))
    pr = pagerank(ids, fk, damping=0.85, n_iter=10, personalized=seeds, edges_within_nodes=True)
    return (
        pr.select(
            "id", F.round(F.col("rank") * F.lit(1000000.0)).cast("long").alias("rank_ppm")
        )
        .orderBy(F.desc("rank_ppm"), "id")
        .limit(100)
    )


def _q_a9_pagerank_weighted(spark, sf_dir):
    """Weighted PageRank (graph_metrics.py:pagerank(weight_col=...), GDS
    relationshipWeightProperty) over the supplier→part shipment graph —
    edge weight = lineitem multiplicity, so transitions follow shipment
    volume, not mere adjacency.  Oracle: 10 unrolled iterations with the
    precomputed w/W fractions in the same operand order, ppm-quantized
    top-100."""
    from cognee_graphdb_spark.operators.graph_metrics import pagerank

    li = _t(spark, sf_dir, "lineitem")
    we = (
        li.groupBy(
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("p:"), F.col("l_partkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("wt"))
    )
    ids = (
        we.select(F.col("src").alias("id"))
        .unionByName(we.select(F.col("dst").alias("id")))
        .distinct()
    )
    pr = pagerank(
        ids, we, damping=0.85, n_iter=10, weight_col="wt", edges_within_nodes=True
    )
    return (
        pr.select(
            "id", F.round(F.col("rank") * F.lit(1000000.0)).cast("long").alias("rank_ppm")
        )
        .orderBy(F.desc("rank_ppm"), "id")
        .limit(100)
    )


def _q_a2_kcore(spark, sf_dir):
    """k-core decomposition (graph_metrics.py:k_core, gds.kcore family): the
    3-core of the FK row graph, summarized per table as (member count, total
    within-core degree).  k=3 forces a REAL multi-round cascade on this data
    (4 peel rounds at sf0.01: orders with <2 lineitem rows drop, their
    lineitems follow, parts/suppliers lose degree next) — a depth-1 peel
    would only pin the initial degree filter.  The oracle unrolls 8 peel
    rounds as chained CTEs (monotone: rounds past the fixpoint are no-ops)
    over the same DISTINCT undirected simple-graph view."""
    from cognee_graphdb_spark.operators.graph_metrics import k_core

    nodes, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(F.col("relationship_name") != "is_part_of")
    core = k_core(nodes, fk, k=3)
    return (
        core.join(nodes.select("id", "name"), "id")
        .groupBy("name")
        .agg(
            F.count(F.lit(1)).alias("n_core_nodes"),
            F.sum("core_degree").alias("total_core_degree"),
        )
    )


def _q_a2_coreness(spark, sf_dir):
    """Full k-core decomposition (graph_metrics.py:coreness, gds.kcore's
    per-node coreValue): every FK-graph node's core number via distributed
    h-index iteration, summarized per (table, coreness) — the decomposition
    spans coreness 0 (type nodes, no FK edges) through 4 (lineitem spine) at
    sf0.01.  The oracle unrolls 16 h-index rounds as chained CTEs (the
    update is monotone non-increasing, so rounds past the fixpoint — 14 at
    sf0.01 — are no-ops) from the same degree initialization."""
    from cognee_graphdb_spark.operators.graph_metrics import coreness

    nodes, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(F.col("relationship_name") != "is_part_of")
    core = coreness(nodes, fk, max_rounds=64)
    return (
        core.join(nodes.select("id", "name"), "id")
        .groupBy("name", "coreness")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def _q_a2_label_propagation(spark, sf_dir):
    """Label propagation communities (graph_metrics.py:label_propagation,
    gds.labelPropagation) over the nation-family FK subgraph: 3 synchronous
    rounds from md5-seeded labels, full (id, label) rows.  Fixed rounds make
    the result a pure function of the seeds, so the oracle unrolls the same
    3 rounds (most-frequent neighbor label, ties to the smallest value) over
    the same DISTINCT undirected view."""
    from cognee_graphdb_spark.operators.graph_metrics import label_propagation

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    return label_propagation(ids, fk, n_rounds=3, hasher="md5_64")


def _q_a2_random_walks(spark, sf_dir):
    """Deterministic random walks (graph_metrics.py:random_walks,
    gds.randomWalk / node2vec sampling family) over the nation-family FK
    subgraph: 2 walks of length 4 from every node, neighbor choice =
    md5_64(start|walk|step|cur) mod degree — a pure function of the seed, so
    the oracle unrolls the same 4 steps over the same ranked adjacency and
    the full trajectory hash-matches as a path string per (start, walk)."""
    from cognee_graphdb_spark.operators.graph_metrics import random_walks

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    walks = random_walks(fk, walk_length=4, num_walks=2, seed=3, hasher="md5_64")
    return walks.groupBy("start", F.col("walk").cast("long").alias("walk")).agg(
        F.concat_ws(
            "->",
            F.transform(
                F.sort_array(F.collect_list(F.struct("step", "node"))),
                lambda s: s["node"],
            ),
        ).alias("path"),
        F.max("step").cast("long").alias("n_steps"),
    )


def _q_a2_harmonic_closeness(spark, sf_dir):
    """Approximate harmonic closeness (graph_metrics.py:
    approx_harmonic_closeness, gds.closeness.harmonic family) over the
    nation-family FK subgraph: raw-estimator mode, 3 hops, m=16 —
    h_scaled = sum_t (ball_t - ball_{t-1}) * lcm(1..3)/t is integer-exact,
    so the oracle re-derives the same sketch rounds and per-node deltas."""
    from cognee_graphdb_spark.operators.graph_metrics import approx_harmonic_closeness

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    out = approx_harmonic_closeness(
        ids, fk, n_rounds=3, m=16, hasher="md5_64", output="raw"
    )
    return out.select("id", "h_scaled")


def _q_a2_shortest_path_counts(spark, sf_dir):
    """BFS distances + shortest-path counts from the 5 region nodes
    (graph_metrics.py:shortest_path_counts, gds.allShortestPaths.stream +
    Brandes' forward pass) over the nation-family FK subgraph, 4-hop cap.
    All-integer output; the oracle unrolls the same hops with a settled-set
    anti-join per round."""
    from cognee_graphdb_spark.operators.graph_metrics import shortest_path_counts

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    srcs = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
        .filter(F.col("id").startswith("region:"))
    )
    return shortest_path_counts(fk, srcs, max_hops=4, hasher="md5_64")


def _q_a2_betweenness(spark, sf_dir):
    """Sampled Brandes betweenness (graph_metrics.py:betweenness_sampled,
    gds.betweenness with samplingSize) from the 5 region nodes over the
    region→nation→supplier→lineitem→part FK subgraph — the lineitem diamond
    layer gives real sigma multiplicities (a part is reached through every
    lineitem of a region's suppliers), so the backward pass divides genuine
    path counts.  The doubles hash-match because BOTH engines reduce the
    same sorted contribution lists sequentially (F.aggregate vs list_reduce
    over list(... ORDER BY ...)) — IEEE addition order is a pure function of
    the data.  Top-500: doubles are bit-identical, so the (betweenness DESC,
    node) order is too."""
    from cognee_graphdb_spark.operators.graph_metrics import betweenness_sampled

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin(
            "n_regionkey", "s_nationkey", "l_suppkey", "l_partkey"
        )
    )
    srcs = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
        .filter(F.col("id").startswith("region:"))
    )
    bt = betweenness_sampled(fk, srcs, max_hops=4, hasher="md5_64")
    return bt.orderBy(F.desc("betweenness"), "node").limit(500)


def _q_a2_node2vec_walks(spark, sf_dir):
    """node2vec biased walks (graph_metrics.py:node2vec_walks, gds.node2vec
    sampling; p=2 discourages backtracking, q=0.5 favors outward hops) over
    the nation-family FK subgraph, full trajectories as path strings.  The
    cumulative pick weights are integer prefix-counts × {0.5, 1, 2}, so the
    oracle's window sums are exact under any evaluation order and the same
    candidate wins in both engines."""
    from cognee_graphdb_spark.operators.graph_metrics import node2vec_walks

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    walks = node2vec_walks(
        fk, walk_length=3, num_walks=2, p=2.0, q=0.5, seed=3, hasher="md5_64"
    )
    return walks.groupBy("start", F.col("walk").cast("long").alias("walk")).agg(
        F.concat_ws(
            "->",
            F.transform(
                F.sort_array(F.collect_list(F.struct("step", "node"))),
                lambda s: s["node"],
            ),
        ).alias("path"),
        F.max("step").cast("long").alias("n_steps"),
    )


def _q_a2_walk_skipgrams(spark, sf_dir):
    """Skip-gram corpus from the same deterministic walks
    (graph_metrics.py:walk_skipgram_pairs — DeepWalk/node2vec's training-pair
    stage): ordered (center, context) pairs within 2 steps of each
    trajectory, aggregated to counts.  The oracle re-derives the walks and
    restates the windowed self-join in SQL."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        random_walks,
        walk_skipgram_pairs,
    )

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    walks = random_walks(fk, walk_length=4, num_walks=2, seed=3, hasher="md5_64")
    return walk_skipgram_pairs(walks, window=2)


def _q_a2_wl_refinement(spark, sf_dir):
    """Weisfeiler–Lehman color refinement (graph_metrics.py:wl_refinement,
    WL kernel family / structural dedup key): 2 rounds of
    md5(own | sorted neighbor labels) over the nation-family FK subgraph
    from the structural seed.  Pure string hashing over sorted multisets —
    the oracle restates it with list(... ORDER BY) + array_to_string + md5."""
    from cognee_graphdb_spark.operators.graph_metrics import wl_refinement

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    return wl_refinement(ids, fk, n_rounds=2)


def _q_a2_incremental_components(spark, sf_dir):
    """Incrementally-maintained connected components
    (graph_metrics.py:incremental_components): the nation-family subgraph
    ingested as two md5-parity edge batches — contract + rerun-on-touched +
    remap — must produce the SAME partition structure as one full run (the
    final assignment is batch-split-invariant; label-for-label equality with
    the from-scratch run is pytest-pinned since representatives are
    engine-internal min-xxhash64 ids).  Oracle: the region-tree size
    histogram computed with plain joins."""
    from cognee_graphdb_spark.operators.dedup import _hash64
    from cognee_graphdb_spark.operators.graph_metrics import incremental_components

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("n_regionkey", "c_nationkey", "s_nationkey")
    )
    par = F.pmod(
        _hash64(F.concat_ws("|", F.col("src"), F.col("dst")), 0, "md5_64"), F.lit(2)
    )
    assign = incremental_components(None, fk.filter(par == 0))
    assign = incremental_components(assign, fk.filter(par == 1))
    return (
        assign.groupBy("component")
        .agg(F.count(F.lit(1)).alias("component_size"))
        .groupBy("component_size")
        .agg(F.count(F.lit(1)).alias("n_components"))
    )


def _q_a2_modularity(spark, sf_dir):
    """Newman modularity of the 3-round LPA communities
    (graph_metrics.py:modularity ∘ label_propagation — the gds community
    metrics family): per-community exact-integer contributions
    contrib_scaled = S*S_c - d_c², so Q = Σ/S² needs one division AFTER the
    hash.  Composes two oracle-checked pieces; the oracle restates both.

    Contract note: modularity() emits contrib_scaled as decimal(38,0) — the
    correct 100 TB overflow guard (BIGINT wraps silently past S ≈ 3.0e9) —
    but DECIMAL serializations differ between Spark BigDecimal and DuckDB
    decimal128 in the driver's type-sensitive value hash (the r9 red row:
    values exactly equal, hash mismatched).  The CONTRACT projection is
    therefore decimal-free: cast to BIGINT here (max sf0.1 value
    ≈ S·S_c ≈ 1.4e10, eight orders of margin inside int64) and mirror in
    the oracle.  Rule: never put a DECIMAL column in a hashed projection."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        label_propagation,
        modularity,
    )

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = label_propagation(ids, fk, n_rounds=3, hasher="md5_64")
    q = modularity(fk, labels)
    return q.withColumn(
        "contrib_scaled", F.col("contrib_scaled").cast("bigint")
    )


def _q_a2_hits(spark, sf_dir):
    """HITS hubs-and-authorities (graph_metrics.py:hits — gds.hits, the GDS
    centrality next to pagerank; reference metric surface
    neo4j_driver/neo4j_metrics_utils.py) over the region-tree FK subgraph:
    10 power iterations with L1 half-step normalization.  The oracle unrolls
    the same 10 rounds as chained CTEs with identical double arithmetic
    (COALESCE-then-divide in the same operand order), and both sides
    quantize to ppm BIGINTs and take the top-100 by
    (authority_ppm, hub_ppm, id) — the a9_pagerank float-hash discipline."""
    from cognee_graphdb_spark.operators.graph_metrics import hits

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    out = hits(ids, fk, n_iter=10, edges_within_nodes=True)
    return (
        out.select(
            "id",
            F.round(F.col("hub") * F.lit(1000000.0)).cast("long").alias("hub_ppm"),
            F.round(F.col("authority") * F.lit(1000000.0))
            .cast("long")
            .alias("authority_ppm"),
        )
        .orderBy(F.desc("authority_ppm"), F.desc("hub_ppm"), "id")
        .limit(100)
    )


def _q_a2_eigenvector(spark, sf_dir):
    """Eigenvector centrality (graph_metrics.py:eigenvector — gds.eigenvector,
    the GDS centrality between pagerank and hits; reference metric surface
    neo4j_driver/neo4j_metrics_utils.py) over the SYMMETRIZED region-tree FK
    subgraph: the directed FK tree is a DAG (nilpotent adjacency, centrality
    identically zero — pinned in pytest), so the entry scores the undirected
    view, where mass concentrates on the nation/region hub spine.  10 power
    iterations with L1 per-round normalization; the oracle unrolls the same
    10 rounds as chained CTEs with identical double arithmetic
    (COALESCE-then-divide in the same operand order — the a2_hits
    discipline), and both sides quantize to ppm BIGINTs and take the
    top-100 by (score_ppm, id)."""
    from cognee_graphdb_spark.operators.graph_metrics import eigenvector

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    sym = fk.select("src", "dst").unionByName(
        fk.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ids = sym.select(F.col("src").alias("id")).distinct()
    ev = eigenvector(ids, sym, n_iter=10, ids_distinct=True, edges_within_nodes=True)
    return (
        ev.select(
            "id",
            F.round(F.col("score") * F.lit(1000000.0)).cast("long").alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), "id")
        .limit(100)
    )


def _q_a2_articlerank(spark, sf_dir):
    """ArticleRank (graph_metrics.py:articlerank — gds.articleRank, the
    PageRank variant dividing by out-degree PLUS average out-degree so short
    reference lists stop dominating; reference metric surface
    neo4j_driver/neo4j_metrics_utils.py) over the directed region-tree FK
    subgraph: 10 iterations, damping 0.85, NO dangling redistribution (the
    GDS definition — region sinks simply absorb nothing).  The oracle
    unrolls the same 10 rounds as chained CTEs over the same statically
    pre-weighted edge list (w = 1/(deg+ + m/n), identical operand order),
    and both sides quantize to ppm BIGINTs and take the top-100 by
    (rank_ppm, id) — the a9_pagerank float-hash discipline."""
    from cognee_graphdb_spark.operators.graph_metrics import articlerank

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    ar = articlerank(ids, fk, damping=0.85, n_iter=10, edges_within_nodes=True)
    return (
        ar.select(
            "id",
            F.round(F.col("rank") * F.lit(1000000.0)).cast("long").alias("rank_ppm"),
        )
        .orderBy(F.desc("rank_ppm"), "id")
        .limit(100)
    )


def _q_a2_spanning_forest(spark, sf_dir):
    """Minimum spanning forest by distributed Borůvka
    (operators/spanning.py:minimum_spanning_forest — the gds.spanningTree
    family computed for every component at once; reference metric surface
    neo4j_driver/neo4j_metrics_utils.py) on a generated ring-plus-chords
    graph whose MSF is ANALYTICALLY known (the a2_scc structural-fixture
    discipline): a 128-cycle with distinct md5-derived weights in [0,1)
    plus stride-7 chords in [10,11).  By the cycle property every chord is
    the unique maximum of its chord+ring-path cycle and the globally
    heaviest ring edge is the unique maximum of the full-ring cycle, so
    MSF = ring minus that one edge — 127 rows the oracle derives in closed
    form while the operator runs real log-round Borůvka (pick-min /
    collapse / relabel) to find them.  Weights follow the gen_* convention
    (md5_64(seed|key) / 2^60 doubles, ppm-quantized across the hash)."""
    from cognee_graphdb_spark.operators.dedup import _hash64
    from cognee_graphdb_spark.operators.spanning import minimum_spanning_forest

    K = 128
    base = spark.range(K)
    ring = base.select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % K).alias("dst"),
        (
            _hash64(F.concat(F.lit("ring:"), F.col("id").cast("string")), 7, "md5_64")
            / F.lit(float(2**60))
        ).alias("weight"),
    )
    chords = base.select(
        F.col("id").alias("src"),
        ((F.col("id") * 7 + 3) % K).alias("dst"),
        (
            F.lit(10.0)
            + _hash64(F.concat(F.lit("chord:"), F.col("id").cast("string")), 7, "md5_64")
            / F.lit(float(2**60))
        ).alias("weight"),
    )
    msf = minimum_spanning_forest(ring.unionByName(chords))
    return msf.select(
        "src",
        "dst",
        F.round(F.col("weight") * F.lit(1000000.0)).cast("long").alias("weight_ppm"),
    ).orderBy("src", "dst")


def _q_a2_topo_layers(spark, sf_dir):
    """Topological layering (operators/dag.py:topological_layers —
    gds.dag.topologicalSort / gds.dag.longestPath in one result; reference
    metric surface neo4j_driver/neo4j_metrics_utils.py) of the FK DAG
    orders -> customer -> nation -> region (+ supplier -> nation): layer =
    longest source path, so order-less customers and all orders/suppliers
    sit at 0, ordered customers at 1, nations at 2, regions at 3.  The
    oracle unrolls the same Kahn peel (peel zero-in-degree, drop their
    out-edges) for 6 rounds; the projection is per-(layer, node_type)
    counts — integers only, no floats anywhere in this contract."""
    from cognee_graphdb_spark.operators.dag import topological_layers

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin(
            "o_custkey", "c_nationkey", "s_nationkey", "n_regionkey"
        )
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    tl = topological_layers(ids, fk)
    return (
        tl.select(
            "layer", F.split_part(F.col("id"), F.lit(":"), F.lit(1)).alias("node_type")
        )
        .groupBy("layer", "node_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("layer", "node_type")
    )


def _q_dbscan_clusters(spark, sf_dir):
    """DBSCAN over the embeddings table (operators/clustering.py:dbscan —
    Ester et al. 1996, the density clustering a training-data pipeline uses
    for topic islands / outlier detection / cluster-balanced sampling):
    ε-graph = cosine ≥ 0.25 pairs through the SAME 4-bit hyperplane LSH
    buckets the dedup_embedding_lsh entry mirrors in SQL, cores have ≥ 4
    points in their neighborhood (self included), clusters = connected
    components of the core-core subgraph labeled by smallest member id
    (the oracle restates that closure with a recursive CTE — min over
    reach, no engine-specific hash anywhere), borders attach to the
    smallest neighboring core cluster, the rest is noise.  All columns
    strings — float-hash-safe."""
    from cognee_graphdb_spark.operators.clustering import dbscan

    emb = _t(spark, sf_dir, "embeddings")
    return dbscan(emb, threshold=0.25, min_pts=4, lsh_bits=4, dim=64).orderBy("id")


def _q_a2_k_spanning(spark, sf_dir):
    """gds.kSpanningTree (operators/spanning.py:k_spanning_clusters —
    single-linkage clustering cut at level k, computed bottom-up via the
    Borůvka MSF): on the same ring+chords fixture as a2_spanning_forest
    with k=4, cutting the 3 heaviest MSF edges equals removing the 4
    heaviest RING edges overall (the heaviest never entered the MSF, the
    chords at 10+ never could), so the clusters are the 4 ring arcs
    between removed positions, each labeled by its lexicographically
    smallest member id — all closed-form for the oracle while the operator
    runs MSF + top-(k-1) cut + CC for real."""
    from cognee_graphdb_spark.operators.dedup import _hash64
    from cognee_graphdb_spark.operators.spanning import k_spanning_clusters

    K = 128
    base = spark.range(K)
    ring = base.select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % K).alias("dst"),
        (
            _hash64(F.concat(F.lit("ring:"), F.col("id").cast("string")), 7, "md5_64")
            / F.lit(float(2**60))
        ).alias("weight"),
    )
    chords = base.select(
        F.col("id").alias("src"),
        ((F.col("id") * 7 + 3) % K).alias("dst"),
        (
            F.lit(10.0)
            + _hash64(F.concat(F.lit("chord:"), F.col("id").cast("string")), 7, "md5_64")
            / F.lit(float(2**60))
        ).alias("weight"),
    )
    return k_spanning_clusters(ring.unionByName(chords), k=4).orderBy("id")


def _q_td_cluster_sample(spark, sf_dir):
    """Cluster-balanced diversity sampling (training_data.py:
    cluster_balanced_sample ∘ clustering.py:dbscan): cap every DBSCAN
    topic island at 3 documents picked by smallest (md5 hash, id), keep
    ALL noise rows (the corpus's unique documents ARE the diversity the
    cap protects).  The oracle reuses the dbscan chain verbatim and adds
    one window — same hash, same tie order."""
    from cognee_graphdb_spark.operators.clustering import dbscan
    from cognee_graphdb_spark.operators.training_data import cluster_balanced_sample

    emb = _t(spark, sf_dir, "embeddings")
    labeled = dbscan(emb, threshold=0.25, min_pts=4, lsh_bits=4, dim=64)
    return cluster_balanced_sample(
        labeled, cap=3, label_col="cluster", id_col="id", hasher="md5_64"
    ).orderBy("id")


def _q_cypher_gds_knn(spark, sf_dir):
    """CALL gds.knn.stream (plans/cypher.py — the GDS property-similarity
    procedure, r12): per-node top-10 cosine neighbors over a projection
    carrying the embeddings table as its 'embedding' property (500 nodes,
    under the all-pairs budget; GDS's own knn is approximate NN-descent —
    this surface is the exact semantics behind the same scale guard as
    the other exact procedures).  Ranking is on the raw sequential-fold
    cosine (bit-identical to DuckDB's list_dot_product composition — the
    v1/v2 knn discipline); similarity crosses the hash ppm-quantized."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    emb = _t(spark, sf_dir, "embeddings")
    nodes = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    edges = spark.createDataFrame([], "src string, dst string, relationship_name string")
    out = run_cypher(
        spark, nodes, edges,
        "CALL gds.knn.stream('g') YIELD node1, node2, similarity "
        "RETURN node1, node2, similarity;",
    )
    return out.select(
        "node1", "node2",
        F.round(F.col("similarity") * 1000000.0).cast("long").alias("sim_ppm"),
    )


def _q_cypher_gds_conductance(spark, sf_dir):
    """CALL gds.conductance.stream (plans/cypher.py, r12): per-community
    boundary/volume over a node-carried 'community' property (the GDS
    communityProperty convention — config maps are refused on this
    surface).  Projection: the nation->region star forest with community
    = key % 3, a SQL-restatable labeling, so the oracle recomputes the
    exact BIGINT ordered-pair counts and the single ppm-rounded division
    (the a2_conductance arithmetic, reached through the CALL surface)."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    nodes, edges = _nation_region_graph(spark, sf_dir)
    labeled = nodes.select(
        "id",
        (F.split(F.col("id"), ":").getItem(1).cast("long") % 3).alias("community"),
    )
    out = run_cypher(
        spark, labeled, edges,
        "CALL gds.conductance.stream('g') YIELD community, conductance "
        "RETURN community, conductance;",
    )
    return out.select(
        "community",
        F.round(F.col("conductance") * 1000000.0).cast("long").alias("conductance_ppm"),
    )


def _q_cypher_gds_dijkstra(spark, sf_dir):
    """CALL gds.shortestPath.dijkstra.stream (plans/cypher.py, r12: the
    typed config map carries sourceNode + relationshipWeightProperty — the
    GDS path procedure the reference reaches through its metric surface)
    from region:0 over the UNDIRECTED nation-family FK subgraph, weights =
    the a2_weighted_sssp hash discipline ((md5_64(src|dst, 0) pmod 5) + 1)
    carried as an edge properties-map entry, read back through
    element_at(properties, 'w').  The FK forest is one tree per region, so
    the stream is exactly region:0's subtree; the oracle unrolls the same
    relax-and-min rounds (cheapest path using <= i edges) — all-integer
    costs hash bit-for-bit."""
    from cognee_graphdb_spark.operators.dedup import _hash64
    from cognee_graphdb_spark.plans.cypher import run_cypher

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ed = fk.select(
        "src",
        "dst",
        F.lit("fk").alias("relationship_name"),
        F.create_map(
            F.lit("w"),
            (
                F.pmod(_hash64(F.concat_ws("|", "src", "dst"), 0, "md5_64"), F.lit(5))
                + 1
            ).cast("string"),
        ).alias("properties"),
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    out = run_cypher(
        spark, ids, ed,
        "CALL gds.shortestPath.dijkstra.stream('g', {sourceNode: 'region:0', "
        "relationshipWeightProperty: 'w'}) "
        "YIELD sourceNode, targetNode, totalCost "
        "RETURN targetNode, totalCost;",
    )
    return out.select(
        "targetNode", F.col("totalCost").cast("long").alias("cost")
    )


def _q_cypher_gds_catalog(spark, sf_dir):
    """The reference's projection-management flow end-to-end through the
    CALL surface (neo4j_driver/adapter.py:1100-1198, plans/cypher.py
    _run_mgmt_call, r12): gds.graph.project of the nation-family FK
    subgraph under a name — the FULL edge frame goes in, the nested
    orientation map (the project_entire_graph config shape verbatim)
    selects the three FK relationship types, endpoint restriction trims to
    the passed node set, both frames persist MEMORY_AND_DISK with counts
    materialized once — then gds.wcc.stream AGAINST THE NAME (the cached
    projection; the passed frames carry every relationship type, so only
    the catalog resolution yields the 5 region trees) -> gds.graph.drop.
    Idempotent: exists-check + drop first, so one driver session can
    re-run the entry.  The oracle is the cypher_gds_wcc_sizes structural
    restatement (component = region subtree)."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    nodes, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    name = "gds_cat_entry"
    [r] = run_cypher(spark, ids, edges, f"CALL gds.graph.exists('{name}')").collect()
    if r["exists"]:
        run_cypher(spark, ids, edges, f"CALL gds.graph.drop('{name}')").collect()
    run_cypher(
        spark, ids, edges,
        f"CALL gds.graph.project('{name}', '*', "
        "{c_nationkey: {orientation: 'UNDIRECTED'}, "
        "s_nationkey: {orientation: 'UNDIRECTED'}, "
        "n_regionkey: {orientation: 'UNDIRECTED'}}) YIELD graphName;",
    ).collect()
    out = run_cypher(
        spark, ids, edges,
        f"CALL gds.wcc.stream('{name}') YIELD componentId "
        "RETURN componentId, count(*) AS size ORDER BY size DESC;",
    ).localCheckpoint(eager=True)
    run_cypher(spark, ids, edges, f"CALL gds.graph.drop('{name}')").collect()
    # component ids are engine-internal representatives; the contract hashes
    # the SIZE multiset (the reference's num_connected_components shape)
    return out.select("size")


def _q_cypher_gds_mutate_chain(spark, sf_dir):
    """The GDS chaining workflow under the driver gate (plans/cypher.py
    mutate mode, r12): project the FK forest -> gds.wcc.mutate writes each
    node's componentId back into the cached projection as its 'community'
    property -> gds.conductance.stream reads it off the cached frames.
    Closed-form oracle: connected components have zero boundary BY
    DEFINITION, so the chain is correct iff every streamed conductance is
    exactly 0 — one row per region tree.  (The community ids themselves
    are engine-internal min-hash representatives, so the contract hashes
    the conductance values and row count, the same discipline as
    cypher_gds_wcc_sizes.)  Idempotent: exists-check + drop first."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    nodes, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    name = "gds_mutate_entry"
    run_cypher(spark, ids, fk, f"CALL gds.graph.drop('{name}', false)").collect()
    run_cypher(
        spark, ids, fk, f"CALL gds.graph.project('{name}', '*', '*')"
    ).collect()
    run_cypher(
        spark, ids, fk,
        f"CALL gds.wcc.mutate('{name}', {{mutateProperty: 'community'}}) "
        "YIELD nodePropertiesWritten RETURN nodePropertiesWritten;",
    ).collect()
    out = run_cypher(
        spark, ids, fk,
        f"CALL gds.conductance.stream('{name}') YIELD community, conductance "
        "RETURN community, conductance;",
    ).localCheckpoint(eager=True)
    run_cypher(spark, ids, fk, f"CALL gds.graph.drop('{name}')").collect()
    return out.select(
        F.round(F.col("conductance") * 1000000.0).cast("long").alias("conductance_ppm")
    )


def _q_cypher_gds_scale_properties(spark, sf_dir):
    """CALL gds.scaleProperties.stream (plans/cypher.py route over
    operators/scaling.py, r12: the GDS feature-preparation step ahead of
    kmeans/knn/fastRP — reference family neo4j_driver/adapter.py:1100-1197's
    projected-graph ML surface): MinMax-normalize two part properties into
    one vector through the CALL surface.  ONE aggregate pass collapses to a
    1-row broadcast — the node table never shuffles.  The oracle restates
    (x - min) / (max - min) with DuckDB MIN/MAX (order-free statistics, so
    no float reassociation crosses the hash); both sides ppm-quantize per
    (id, j)."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    part = _t(spark, sf_dir, "part")
    nodes = part.select(
        F.concat(F.lit("part:"), F.col("p_partkey").cast("string")).alias("id"),
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("double").alias("size"),
    )
    no_edges = spark.createDataFrame(
        [], "src string, dst string, relationship_name string"
    )
    out = run_cypher(
        spark, nodes, no_edges,
        "CALL gds.scaleProperties.stream('g', "
        "{nodeProperties: ['price', 'size'], scaler: 'MinMax'}) "
        "YIELD nodeId, scaledProperty RETURN nodeId, scaledProperty;",
    )
    return out.select(
        F.col("nodeId").alias("id"),
        F.posexplode("scaledProperty").alias("j", "v"),
    ).select(
        "id", "j", F.round(F.col("v") * 1000000.0).cast("long").alias("scaled_ppm")
    )


def _q_cypher_gds_modularity(spark, sf_dir):
    """CALL gds.modularity.stream (plans/cypher.py route, r12): per-community
    Newman modularity for a node-carried 'community' property — the quality
    metric beside gds.conductance on the reference's GDS metric family
    (neo4j_metrics_utils.py), composable with mutate mode.  Same
    key-%-3 labeling as cypher_gds_conductance, so the oracle recomputes the
    exact BIGINT ordered-pair counts and the operator's single double
    division (S·S_c − d_c²) / S² — one division, ppm-rounded."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    nodes, edges = _nation_region_graph(spark, sf_dir)
    labeled = nodes.select(
        "id",
        (F.split(F.col("id"), ":").getItem(1).cast("long") % 3).alias("community"),
    )
    out = run_cypher(
        spark, labeled, edges,
        "CALL gds.modularity.stream('g', {communityProperty: 'community'}) "
        "YIELD communityId, modularity RETURN communityId, modularity;",
    )
    return out.select(
        F.col("communityId").alias("community"),
        F.round(F.col("modularity") * 1000000.0).cast("long").alias("modularity_ppm"),
    )


def _q_cypher_gds_spanning(spark, sf_dir):
    """CALL gds.spanningTree.stream (plans/cypher.py route, r12: Borůvka MSF
    restricted to the source's component + ONE unit-weight BFS to root it —
    operators/spanning.py:minimum_spanning_forest ∘ paths.py:weighted_sssp)
    from region:0 over the UNDIRECTED nation-family FK forest with GDS's
    unweighted default.  The FK subgraph IS a forest, so the MST is the
    region-0 tree itself and every parent is structurally forced: nations
    parent to region:0, customers/suppliers to their nation — closed-form
    for the oracle while the route runs MSF + rooted BFS for real.  Unit
    weights stay exact integers across the hash."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    out = run_cypher(
        spark, ids, fk,
        "CALL gds.spanningTree.stream('g', {sourceNode: 'region:0'}) "
        "YIELD nodeId, parentId, weight RETURN nodeId, parentId, weight;",
    )
    return out.select(
        "nodeId", "parentId", F.col("weight").cast("long").alias("weight")
    )


def _q_td_bpe_pairs(spark, sf_dir):
    """BPE vocabulary training's argmax stream (operators/bpe.py:
    pair_candidates — Sennrich et al. 2016 subword tokenization; the
    training-data pipeline's learned-tokenizer stage beside the BPE-ish
    counter of text_analysis.py): top-20 first-round merge candidates over
    the documents corpus.  Training never iterates the corpus — ONE pass to
    the distinct-word frequency table, then pair counts over the vocab
    only; everything here is exact integer counting under the deterministic
    (cnt desc, left, right) total order, so the oracle restates it with
    DuckDB's regexp/string_split/list_zip verbatim."""
    from cognee_graphdb_spark.operators.bpe import pair_candidates

    return pair_candidates(_t(spark, sf_dir, "documents"), top_k=20)


def _q_td_curate_clustered(spark, sf_dir):
    """Composed curation with topic-island balancing (r11 VERDICT #9
    stretch — the r9 td_curate_corpus discipline applied to the r11
    clustering family): gopher quality filter -> DBSCAN topic islands
    over the document embeddings (bucketed LSH path) -> cluster-balanced
    diversity sampling capping each island at 3 QUALITY-SURVIVING docs
    (noise uncapped).  Clustering runs on the FULL embedding set — topic
    islands are a corpus property, not a survivor property — and the cap
    ranks only survivors; the oracle restates exactly that wiring from
    the three standalone-proven fragments."""
    from cognee_graphdb_spark.operators.clustering import dbscan
    from cognee_graphdb_spark.operators.training_data import (
        cluster_balanced_sample,
        gopher_quality_filter,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    kept = gopher_quality_filter(docs).filter(F.col("keep")).select(
        F.col("doc_id").cast("string").alias("id")
    )
    labeled = dbscan(emb, threshold=0.25, min_pts=4, lsh_bits=4, dim=64)
    survivors = labeled.join(kept, "id")
    return cluster_balanced_sample(
        survivors, cap=3, label_col="cluster", id_col="id", hasher="md5_64"
    ).orderBy("id")


def _q_a2_conductance(spark, sf_dir):
    """Per-community conductance of the 3-round LPA communities
    (graph_metrics.py:conductance ∘ label_propagation — gds.conductance,
    the GDS community-quality metric next to modularity; reference metric
    surface neo4j_driver/neo4j_metrics_utils.py): internal/boundary/volume
    are exact BIGINT ordered-pair counts over the same undirected
    simple-graph view a2_modularity scores, and the ratio crosses the hash
    ppm-quantized only (round(1e6·boundary/volume), same operand order both
    engines) — the decimal-free contract rule."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        conductance,
        label_propagation,
    )

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = label_propagation(ids, fk, n_rounds=3, hasher="md5_64")
    return conductance(fk, labels)


def _q_a2_louvain(spark, sf_dir):
    """Louvain communities (graph_metrics.py:louvain — gds.louvain, the
    flagship GDS community algorithm; reference metric surface
    neo4j_driver/neo4j_metrics_utils.py): 2 levels x 2 synchronous
    local-move rounds over the nation-family FK subgraph.  Exact-integer
    gain argmax (T·k_ic − k_i·K_c, HUGEINT/decimal(38,0)) with the
    Lu et al. singleton-swap guard; tie-break (gain desc, label asc).
    The oracle unrolls BOTH levels including the between-level graph
    contraction (communities → super-nodes, ordered-pair weights summed,
    within-weight as self rows).  Output (id, label) — integer-hashed
    labels only, no decimals cross the hash."""
    from cognee_graphdb_spark.operators.graph_metrics import louvain

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    return louvain(ids, fk, n_levels=2, n_rounds=2, hasher="md5_64")


def _nation_region_graph(spark, sf_dir, siblings: bool = False):
    """Nodes/edges frames for the nation->region star forest; with
    ``siblings`` adds a per-region chain between consecutive nations, which
    closes triangles at the region hubs (used by the gds clustering entry)."""
    from pyspark.sql.window import Window

    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nid = F.concat(F.lit("nation:"), F.col("n_nationkey").cast("string"))
    rid = F.concat(F.lit("region:"), F.col("n_regionkey").cast("string"))
    edges = nat.select(
        nid.alias("src"), rid.alias("dst"), F.lit("in_region").alias("relationship_name")
    )
    if siblings:
        w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
        sib = (
            nat.withColumn("nxt", F.lead("n_nationkey").over(w))
            .filter(F.col("nxt").isNotNull())
            .select(
                nid.alias("src"),
                F.concat(F.lit("nation:"), F.col("nxt").cast("string")).alias("dst"),
                F.lit("sibling").alias("relationship_name"),
            )
        )
        edges = edges.unionByName(sib)
    nodes = (
        nat.select(nid.alias("id"))
        .unionByName(nat.select(rid.alias("id")))
        .distinct()
        .select("id", F.col("id").alias("name"), F.lit("Entity").alias("type"))
    )
    return nodes, edges


def _q_cypher_gds_wcc_sizes(spark, sf_dir):
    """The reference's component-size query VERBATIM through the CALL gds.*
    Cypher surface (neo4j_metrics_utils.py:92-95; plans/cypher.py:
    _run_gds_call -> connected_components): componentId is a min-xxhash64
    representative (not restatable in SQL), so the contract projects the
    size column its consumer actually reads — the oracle states the sizes
    structurally (component = region subtree)."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    nodes, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    out = run_cypher(
        spark,
        ids,
        fk,
        """
    CALL gds.wcc.stream('memory_graph')
    YIELD componentId
    RETURN componentId, count(*) AS size
    ORDER BY size DESC;
    """,
    )
    return out.select("size")


def _q_cypher_gds_wcc_stats(spark, sf_dir):
    """The reference's component-count query VERBATIM through CALL gds.*
    (neo4j_metrics_utils.py:60-62): componentCount over the nation-family
    FK graph = the number of region subtrees."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    nodes, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    return run_cypher(
        spark,
        ids,
        fk,
        """
    CALL gds.wcc.stats('memory_graph')
    YIELD componentCount
    RETURN componentCount AS num_connected_components;
    """,
    )


def _q_cypher_gds_apsp(spark, sf_dir):
    """The reference's all-shortest-paths query VERBATIM through CALL gds.*
    (neo4j_metrics_utils.py:152-154; multi-source unit-weight BFS =
    operators/paths.py:weighted_sssp) over the nation->region star forest:
    nation<->region pairs at distance 1, same-region nation pairs at 2,
    cross-region unreachable (omitted) — the oracle states exactly that."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    nodes, edges = _nation_region_graph(spark, sf_dir)
    return run_cypher(
        spark,
        nodes,
        edges,
        """
    CALL gds.allShortestPaths.stream('memory_graph')
    YIELD distance
    RETURN distance;
    """,
    )


def _q_cypher_gds_clustering(spark, sf_dir):
    """The reference's average-clustering query VERBATIM through CALL gds.*
    (neo4j_metrics_utils.py:184-186; graph_metrics.py:triangle_clustering)
    over the sibling-augmented nation/region graph — consecutive nations
    chain within each region, closing triangles at the region hub.  The
    oracle recomputes per-node coefficients with a generic 3-way SQL
    triangle join; the float average crosses the hash ppm-quantized."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    nodes, edges = _nation_region_graph(spark, sf_dir, siblings=True)
    out = run_cypher(
        spark,
        nodes,
        edges,
        """
    CALL gds.localClusteringCoefficient.stats('memory_graph')
    YIELD averageClusteringCoefficient
    RETURN averageClusteringCoefficient AS avg_clustering;
    """,
    )
    return out.select(
        F.round(F.col("avg_clustering") * F.lit(1000000.0))
        .cast("long")
        .alias("avg_clustering_ppm")
    )


def _q_gen_rmat_graph(spark, sf_dir):
    """R-MAT benchmark-graph generation (graph_generators.py:rmat_edges —
    gds.graph.generate family / the Graph500 reference generator): 2^7
    nodes × 8 samples each, Graph500 quadrant probabilities, md5-seeded so
    the oracle restates the whole 7-level quadrant recursion in SQL over a
    bare range() — no input tables, pure determinism.  Whole-stage-codegen
    projection over a range scan: the 100 TB story is 'a trillion edges at
    scan speed', and this row pins the recursion bit-for-bit."""
    from cognee_graphdb_spark.operators.graph_generators import rmat_edges

    return rmat_edges(spark, scale=7, edge_factor=8, seed=5, hasher="md5_64")


def _q_gen_ws_graph(spark, sf_dir):
    """Watts–Strogatz small-world generation (graph_generators.py:
    watts_strogatz_edges — the clustered third benchmark topology): ring
    lattice with hash-decided rewiring, the whole construction restated in
    SQL over a bare range()."""
    from cognee_graphdb_spark.operators.graph_generators import watts_strogatz_edges

    return watts_strogatz_edges(
        spark, n_nodes=60, k=6, p=0.2, seed=8, hasher="md5_64"
    )


def _q_gen_uniform_graph(spark, sf_dir):
    """Uniform G(n, m) generation (graph_generators.py:uniform_edges —
    gds.graph.generate UNIFORM, the skew-free control next to R-MAT):
    endpoint = md5(seed|i|side) mod n, restated verbatim in SQL."""
    from cognee_graphdb_spark.operators.graph_generators import uniform_edges

    return uniform_edges(spark, n_nodes=100, n_edges=800, seed=6, hasher="md5_64")


def _q_cypher_gds_closeness(spark, sf_dir):
    """gds.closeness.stream through the CALL surface (exact closeness from
    the all-pairs BFS; plans/cypher.py) over the nation->region star
    forest: a nation reaches its k-1 siblings at 2 and its region at 1
    (score = k/(2k-1)); a region reaches its k nations at 1 (score = 1) —
    the oracle states exactly that, ppm-quantized."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    nodes, edges = _nation_region_graph(spark, sf_dir)
    out = run_cypher(
        spark,
        nodes,
        edges,
        "CALL gds.closeness.stream('memory_graph') YIELD nodeId, score "
        "RETURN nodeId, score",
    )
    return out.select(
        F.col("nodeId").alias("id"),
        F.round(F.col("score") * F.lit(1000000.0)).cast("long").alias("score_ppm"),
    )


def _q_cypher_gds_pagerank(spark, sf_dir):
    """gds.pageRank.stream through the CALL surface (plans/cypher.py:
    _gds_procedure -> graph_metrics.py:pagerank with GDS defaults — the
    same 10 iterations / 0.85 damping a9_pagerank pins), ppm-quantized
    top-100: the oracle IS the a9_pagerank unroll, so this row proves the
    CALL plumbing changes nothing about the float discipline."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("name"), F.lit("Entity").alias("type"))
    )
    out = run_cypher(
        spark,
        ids,
        fk,
        "CALL gds.pageRank.stream('memory_graph') YIELD nodeId, score "
        "RETURN nodeId, score",
    )
    return (
        out.select(
            F.col("nodeId").alias("id"),
            F.round(F.col("score") * F.lit(1000000.0)).cast("long").alias("rank_ppm"),
        )
        .orderBy(F.desc("rank_ppm"), "id")
        .limit(100)
    )


def _q_a2_scc(spark, sf_dir):
    """Strongly connected components (graph_metrics.py:
    strongly_connected_components — gds.scc, the directed complement to the
    reference's gds.wcc surface, neo4j_driver/neo4j_metrics_utils.py:60-92)
    over a deterministically CYCLIC digraph built from the TPC-H tables:
    every customer exchanges edges with its nation's hub (the min-custkey
    customer), hubs point on to their nation and nations to their region —
    so each nation's customers form one SCC (diameter 2 through the hub)
    and every nation/region node is a singleton.  The operator runs the
    general Orzan coloring algorithm; the ORACLE states the answer
    structurally (label = the component's max md5_64 hash: a per-nation
    window max for customers, own hash for the DAG tail) — exactly the
    peel-order-invariant label contract the operator guarantees."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        strongly_connected_components,
    )

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = _t(spark, sf_dir, "region").select("r_regionkey")
    cid = F.concat(F.lit("customer:"), F.col("c_custkey").cast("string"))
    hub = cust.groupBy("c_nationkey").agg(F.min("c_custkey").alias("hk"))
    hid = F.concat(F.lit("customer:"), F.col("hk").cast("string"))
    ch = cust.join(hub, "c_nationkey")
    e_out = ch.select(cid.alias("src"), hid.alias("dst"))
    e_back = ch.select(hid.alias("src"), cid.alias("dst"))
    e_nat = hub.select(
        hid.alias("src"),
        F.concat(F.lit("nation:"), F.col("c_nationkey").cast("string")).alias("dst"),
    )
    e_reg = nat.select(
        F.concat(F.lit("nation:"), F.col("n_nationkey").cast("string")).alias("src"),
        F.concat(F.lit("region:"), F.col("n_regionkey").cast("string")).alias("dst"),
    )
    edges = e_out.unionByName(e_back).unionByName(e_nat).unionByName(e_reg)
    nodes = (
        cust.select(cid.alias("id"))
        .unionByName(
            nat.select(
                F.concat(F.lit("nation:"), F.col("n_nationkey").cast("string")).alias("id")
            )
        )
        .unionByName(
            reg.select(
                F.concat(F.lit("region:"), F.col("r_regionkey").cast("string")).alias("id")
            )
        )
    )
    return strongly_connected_components(nodes, edges, hasher="md5_64")


def _q_a2_leiden(spark, sf_dir):
    """Leiden communities (graph_metrics.py:leiden — gds.leiden, Louvain's
    successor in the GDS community family; Traag et al. 2019): the same
    exact-integer local-move rounds as a2_louvain plus the deterministic
    connectivity-refinement phase — coarse communities split into their
    connected components (8 min-label rounds, fixpoint-early-exited =
    output-identical to the oracle's fixed unroll) before contraction, the
    aggregate level starts SEEDED with the coarse partition, and the OUTPUT
    partition gets one more connectivity split (final_refine — the
    guarantee-completing pass, a strict Q improvement).  The oracle unrolls
    all of it: 2 local-move rounds, 8 refine rounds, the contraction,
    2 seeded local-move rounds, and 8 final refine rounds.  Output
    (id, label) — integer-hashed labels only."""
    from cognee_graphdb_spark.operators.graph_metrics import leiden

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    return leiden(ids, fk, n_levels=2, n_rounds=2, refine_rounds=8, hasher="md5_64")


def _q_a2_node_similarity(spark, sf_dir):
    """Neighborhood Jaccard similarity (graph_metrics.py:node_similarity,
    gds.nodeSimilarity) over the nation-family FK subgraph, top-5 partners
    per node; jaccard emitted ppm-quantized so the only doubles cross the
    hash as integers (the rank itself compares IEEE-identical i/u ratios).
    """
    from cognee_graphdb_spark.operators.graph_metrics import node_similarity

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    sim = node_similarity(ids, fk, top_k=5)
    return sim.select(
        "id_a", "id_b", "intersection", "union_size",
        F.round(F.col("jaccard") * F.lit(1000000.0)).cast("long").alias("jaccard_ppm"),
    )


def _q_a2_hyperanf(spark, sf_dir):
    """HyperANF neighborhood function (graph_metrics.py:
    approx_neighborhood_function, Boldi–Rosa–Vigna WWW'11): 5 sketch-merge
    rounds over the nation-family FK subgraph, m=16 registers, md5 seeding —
    the scale-honest estimator behind A2's diameter/avg-path metrics.
    Oracle mode pins the integer-exact raw-estimator sums and empty-register
    counts per hop; the DuckDB restatement unrolls the same register-wise
    max rounds over the same list sketches."""
    from cognee_graphdb_spark.operators.graph_metrics import approx_neighborhood_function

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    return approx_neighborhood_function(
        ids, fk, n_rounds=5, m=16, hasher="md5_64", output="stats"
    )


def _q_a2_kmeans(spark, sf_dir):
    """gds.kmeans (operators/clustering.py:kmeans — SemDeDup's spherical
    k-means core extracted as a first-class operator + CALL route, r11
    VERDICT #5; one implementation, parity-pinned in pytest).  Same
    parameters as the dedup_semdedup entry (k=8, one recenter round, md5
    seeding) so the oracle SHARES that entry's proven CTE chain verbatim.
    The contract hashes only (id, cluster): every assignment is an argmax
    branch decision with the margins the semdedup entry already proves;
    centroid-similarity floats stay out of the hash (cluster means are
    not operand-order-pinned across engines)."""
    from cognee_graphdb_spark.operators.clustering import kmeans

    emb = _t(spark, sf_dir, "embeddings")
    out = kmeans(emb, k=8, n_iter=1, hasher="md5_64")
    return out.select("id", F.col("cluster").cast("long").alias("cluster"))


def _q_a2_fastrp(spark, sf_dir):
    """gds.fastRP (operators/node_embeddings.py:fastrp_embeddings — Chen et
    al. 2019 very-sparse random projection, GDS's default embedding
    procedure, CALL-routed with {embeddingDimension, iterationWeights,
    randomSeed}) over the symmetrized region-tree FK subgraph.  dim=4,
    GDS-default weights (0, 1, 1) = three averaging rounds with the first
    unweighted; hasher='md5_64' so the ±1/0 init is bit-identical in the
    oracle.  The oracle restates all three rounds as chained CTEs with the
    operator's exact operand order: messages are SUM(val)/COUNT(*) (Spark
    avg's partial-agg shape), norms the sequential left fold
    ((((0+v0²)+v1²)+v2²)+v3²) matching F.aggregate, and the weighted sum
    (v·1.0)+(v·1.0); both sides quantize per (id, dim) to ppm BIGINTs —
    round-1 values are exact rationals, later rounds' sum-order wobble is
    absorbed (the a2_eigenvector discipline)."""
    from cognee_graphdb_spark.operators.node_embeddings import fastrp_embeddings

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    ids = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
    )
    emb = fastrp_embeddings(
        ids, fk, dim=4, iteration_weights=(0.0, 1.0, 1.0), seed=42, hasher="md5_64"
    )
    return emb.select(
        "id", F.posexplode("embedding").alias("j", "val")
    ).select(
        "id",
        "j",
        F.round(F.col("val") * F.lit(1000000.0)).cast("long").alias("val_ppm"),
    )


def _q_dedup_semdedup(spark, sf_dir):
    """SemDeDup (dedup.py:semdedup): deterministic spherical k-means (seeded
    md5 hash picks the k seeds) + within-cluster cosine pruning.  The 0.35
    threshold is tuned to this synthetic corpus (max pairwise cos ~0.51) so
    the drop branch actually fires; the result carries only id/cluster/keep,
    no floats, so every branch decision is pinned by the hash."""
    from cognee_graphdb_spark.operators.dedup import semdedup

    emb = _t(spark, sf_dir, "embeddings")
    out = semdedup(emb, k=8, threshold=0.35, n_iter=1, hasher="md5_64")
    return out.select("id", F.col("cluster").cast("long").alias("cluster"), "keep")


def _q_td_dsir_resample(spark, sf_dir):
    """DSIR (training_data.py:dsir_resample): hashed-ngram importance weights
    of the non-English docs against the English target distribution, then
    deterministic Gumbel top-50.  Weights and scores are rounded to 6 dp on
    both sides so engine-side summation order can't skew the hash."""
    from cognee_graphdb_spark.operators.training_data import dsir_resample

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    raw = docs.filter(F.col("lang") != "en")
    return dsir_resample(raw, target, k=50, buckets=1024, seed=17, hasher="md5_64")



def _q_a2_graph_metrics(spark, sf_dir):
    """A2 scalar metric row (graph_metrics.py:graph_metrics, the
    ground_truth_metrics.json shape) as ONE Spark plan: two single-pass
    aggregates cross-joined, no driver-side arithmetic."""
    nodes, edges = tpch_graph(spark, sf_dir)
    n = nodes.agg(F.count(F.lit(1)).alias("num_nodes"))
    e = edges.agg(
        F.count(F.lit(1)).alias("num_edges"),
        F.coalesce(
            F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0)), F.lit(0)
        ).alias("num_selfloops"),
    )
    # ratio metrics as SCALED BIGINTs (ppm / ppb), not doubles: equal double
    # VALUES can still hash differently under the driver's DuckDB when its
    # decimal-literal propagation yields DECIMAL instead of DOUBLE — integers
    # are hash-stable by construction.  Both sides compute the same pure-DOUBLE
    # expression in the same operation order, so the pre-round doubles are
    # bit-identical (IEEE 754 ops are exactly specified).
    return n.crossJoin(e).select(
        "num_nodes",
        "num_edges",
        F.round(2.0 * F.col("num_edges").cast("double") / F.col("num_nodes") * 1e6)
        .cast("long")
        .alias("mean_degree_ppm"),
        F.round(
            F.col("num_edges").cast("double")
            / (F.col("num_nodes") * (F.col("num_nodes") - 1))
            * 1e9
        )
        .cast("long")
        .alias("edge_density_ppb"),
        "num_selfloops",
    )


def _q_a2_triangle_clustering(spark, sf_dir):
    """A2 avg-clustering sub-operator (graph_metrics.py:triangle_clustering,
    reference gds.localClusteringCoefficient neo4j_metrics_utils.py:152-190)
    oracle-checked on a graph that actually HAS triangles: the Jaccard
    near-dup pair graph (near-dup clusters are near-cliques).  The Spark side
    runs the hub-safe degree-ordered orientation; DuckDB recomputes
    per-node triangle counts naively — equal EXACT counts prove the
    orientation enumeration is lossless.  Histogram output (coefficient ->
    node count) checks every node with no top-k tie-break sensitivity."""
    from cognee_graphdb_spark.operators.dedup import jaccard_pairs
    from cognee_graphdb_spark.operators.graph_metrics import triangle_clustering

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.9)
    edges = pairs.select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
        F.lit("near_dup").alias("relationship_name"),
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    cl = triangle_clustering(nodes, edges)
    return (
        cl.groupBy(F.round("clustering", 6).alias("clustering"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("clustering")
    )


def _q_w2_lexical_chunks(spark, sf_dir):
    from cognee_graphdb_spark.plans.search_types import GraphContext, lexical_chunks

    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("string").alias("chunk_id"), "text")
    ctx = GraphContext(nodes=docs.limit(0), edges=docs.limit(0), embeddings=docs.limit(0), chunks=docs)
    out = lexical_chunks(ctx, "the fast table scan merge join spark", k=10)
    return out.select("chunk_id", F.round("score", 6).alias("score"))


def _q_cypher_passthrough(spark, sf_dir):
    from cognee_graphdb_spark.plans.search_types import GraphContext, cypher_search

    nodes, edges = tpch_graph(spark, sf_dir)
    ctx = GraphContext(nodes=nodes, edges=edges, embeddings=nodes.limit(0))
    return cypher_search(
        spark,
        ctx,
        "SELECT n.name AS src_table, e.relationship_name, count(*) AS n "
        "FROM edges e JOIN nodes n ON e.src = n.id GROUP BY n.name, e.relationship_name",
    )


def _q_cypher_translated(spark, sf_dir):
    """Real Cypher dialect (plans/cypher.py): typed hop + labels + implicit
    GROUP BY, translated to one Spark SQL join tree over the migrated graph
    (reference shape: kuzu/adapter.py:150's MATCH (n)-[r]->(m) counts)."""
    from cognee_graphdb_spark.plans.search_types import GraphContext, cypher_search

    nodes, edges = tpch_graph(spark, sf_dir)
    ctx = GraphContext(nodes=nodes, edges=edges, embeddings=nodes.limit(0))
    return cypher_search(
        spark,
        ctx,
        "MATCH (r:TableRow)-[e:is_part_of]->(t:TableType) "
        "RETURN t.name AS table_name, count(r) AS n ORDER BY table_name",
    )


def _q_cypher_case(spark, sf_dir):
    """CASE expressions in the read dialect (plans/cypher.py:_case_expr) —
    both openCypher forms in one query: a generic CASE inside an aggregate
    (conditional counting, the most common NL->Cypher emission) and a simple
    CASE bucketing a property value."""
    from cognee_graphdb_spark.plans.search_types import GraphContext, cypher_search

    nodes, edges = tpch_graph(spark, sf_dir)
    ctx = GraphContext(nodes=nodes, edges=edges, embeddings=nodes.limit(0))
    return cypher_search(
        spark,
        ctx,
        "MATCH (n:TableRow) RETURN "
        "CASE n.name WHEN 'nation' THEN 'geo' WHEN 'region' THEN 'geo' ELSE 'data' END AS bucket, "
        "count(n) AS n_rows, "
        "sum(CASE WHEN n.name = 'orders' THEN 1 ELSE 0 END) AS n_orders "
        "ORDER BY bucket",
    )


def _q_cypher_undirected(spark, sf_dir):
    """Undirected ``-[r]-`` pattern (plans/cypher.py:_edges_source): the
    TableType side of is_part_of edges has only INCOMING edges, so reaching
    rows from it requires matching either orientation — the translated union
    of both directions, per-type counts."""
    from cognee_graphdb_spark.plans.search_types import GraphContext, cypher_search

    nodes, edges = tpch_graph(spark, sf_dir)
    ctx = GraphContext(nodes=nodes, edges=edges, embeddings=nodes.limit(0))
    return cypher_search(
        spark,
        ctx,
        "MATCH (t:TableType)-[e:is_part_of]-(r:TableRow) "
        "RETURN t.name AS table_name, count(r) AS n ORDER BY table_name",
    )


def _q_cypher_union_having(spark, sf_dir):
    """Round-6 dialect extensions in one query (plans/cypher.py): a WITH
    ... WHERE post-aggregation filter (SQL HAVING), an anchored ``=~`` regex
    predicate, and UNION (distinct) across two full query branches — the
    'nation' row qualifies under BOTH branches, so the dedup is observable."""
    from cognee_graphdb_spark.plans.search_types import GraphContext, cypher_search

    nodes, edges = tpch_graph(spark, sf_dir)
    ctx = GraphContext(nodes=nodes, edges=edges, embeddings=nodes.limit(0))
    return cypher_search(
        spark,
        ctx,
        "MATCH (r:TableRow)-[e:is_part_of]->(t:TableType) "
        "WITH t.name AS table_name, count(r) AS n WHERE n >= 25 "
        "RETURN table_name, n "
        "UNION "
        "MATCH (r2:TableRow)-[e2:is_part_of]->(t2:TableType) WHERE t2.name =~ 'nat.*' "
        "RETURN t2.name AS table_name, count(r2) AS n",
    ).orderBy("table_name")


def _q_cypher_list_ops(spark, sf_dir):
    """The list/lambda dialect family in one query (plans/cypher.py): UNWIND
    over range(), a list comprehension nested inside reduce() (Spark SQL
    filter/aggregate higher-order functions — whole-stage codegen, no UDF),
    0-based substring(), and an all() list predicate.  even_sum is the sum
    of even numbers <= month, which DuckDB restates in closed form."""
    from cognee_graphdb_spark.plans.search_types import GraphContext, cypher_search

    nodes, edges = tpch_graph(spark, sf_dir)
    ctx = GraphContext(nodes=nodes, edges=edges, embeddings=nodes.limit(0))
    return cypher_search(
        spark,
        ctx,
        "UNWIND range(1, 12) AS m "
        "RETURN toInteger(m) AS month, "
        "toInteger(reduce(acc = 0, x IN [y IN range(1, m) WHERE y % 2 = 0] | acc + x)) AS even_sum, "
        "substring('abcdefghijkl', 0, m) AS prefix, "
        "all(x IN [m, 6] WHERE x >= 6) AS ge6 "
        "ORDER BY month",
    )


def _q_v5_embed_knn(spark, sf_dir):
    """V5 end-to-end, oracle-checked: the hash embedder (llm/embedder.py —
    feature-hashing bag of words, Arrow-batched pandas UDF) embeds every
    document, then V1 knn ranks them against an embedded query string.
    DuckDB restates the ENTIRE path in SQL: bucket = first-4-bytes-of-md5
    via CAST(concat('0x', substr(md5(tok),1,8)) AS UBIGINT) % dim, counts,
    L2 normalization, cosine distance — so the embedding operator itself is
    value-checked, not just the search on precomputed vectors.  Scores are
    rounded to 3 decimals (doc vectors are float32 at rest; the oracle
    computes in double)."""
    from cognee_graphdb_spark.llm.embedder import HashEmbedder, embed_column
    from cognee_graphdb_spark.operators.vector_search import knn
    from cognee_graphdb_spark.session import ship_package

    ship_package(spark)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = docs.select("doc_id", embed_column("text", 64).alias("vector"))
    qv = HashEmbedder(64).embed("fast vector scan of a big table")
    out = knn(emb, qv, k=10, id_cols=("doc_id",))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round(F.col("distance").cast("double"), 3).alias("dist_r"),
    )


def _q_cypher_pipeline(spark, sf_dir):
    """UNWIND -> MATCH/WHERE -> WITH aggregation pipeline (the
    product_recommendation.py:126-145 shape) translated to nested subqueries
    over the migrated graph."""
    from cognee_graphdb_spark.plans.search_types import GraphContext, cypher_search

    nodes, edges = tpch_graph(spark, sf_dir)
    ctx = GraphContext(nodes=nodes, edges=edges, embeddings=nodes.limit(0))
    return cypher_search(
        spark,
        ctx,
        "UNWIND $tables AS tn "
        "MATCH (r:TableRow)-[e:is_part_of]->(t:TableType) WHERE t.name = tn "
        "WITH tn, count(r) AS n "
        "RETURN tn AS table_name, n ORDER BY table_name",
        params={"tables": ["nation", "region", "customer"]},
    )


def _q_cypher_optional_match(spark, sf_dir):
    """OPTIONAL MATCH translation (derived-table LEFT JOIN): parts with their
    lineitem reference counts, zero-reference parts kept as NULL pattern
    (product_recommendation.py:159-160 shape)."""
    from cognee_graphdb_spark.plans.search_types import GraphContext, cypher_search

    nodes, edges = tpch_graph(spark, sf_dir)
    ctx = GraphContext(nodes=nodes, edges=edges, embeddings=nodes.limit(0))
    return cypher_search(
        spark,
        ctx,
        "MATCH (n:TableRow {name: 'part'}) "
        "OPTIONAL MATCH (l:TableRow)-[e:l_partkey]->(n) "
        "RETURN n.id AS part_id, count(e) AS refs ORDER BY part_id",
    )


def _q_natural_language(spark, sf_dir):
    from cognee_graphdb_spark.plans.search_types import GraphContext, natural_language_search

    nodes, edges = tpch_graph(spark, sf_dir)
    ctx = GraphContext(nodes=nodes, edges=edges, embeddings=nodes.limit(0))
    return natural_language_search(spark, ctx, "show me every TableType node")


def _q_insights_exact(spark, sf_dir):
    from cognee_graphdb_spark.plans.search_types import GraphContext, insights

    nodes, edges = tpch_graph(spark, sf_dir)
    ctx = GraphContext(nodes=nodes, edges=edges, embeddings=nodes.limit(0))
    return insights(ctx, "nation:7")


def _temporal_docs(spark, sf_dir):
    # bounded to 2000 events: the plan shape is what matters, and the oracle
    # runs this at sf0.01 where the full 10k-doc extraction dominates runtime
    ev = _events(spark, sf_dir).filter(F.col("event_id") % 5 == 0)
    return ev.select(
        F.col("event_id").cast("string").alias("doc_id"),
        F.concat(
            F.lit("user "), F.col("user_id").cast("string"),
            F.lit(" did "), F.col("event_type"),
            F.lit(" on "), F.date_format("ts", "yyyy-MM-dd"),
        ).alias("text"),
    )


def _q_temporal_search(spark, sf_dir):
    from cognee_graphdb_spark.plans.search_types import GraphContext
    from cognee_graphdb_spark.plans.search_types import temporal_context
    from cognee_graphdb_spark.plans.temporal_graph import cognify_temporal

    _utc(spark)
    tg = cognify_temporal(_temporal_docs(spark, sf_dir))
    # temporal_context's k-hop loop scans edges ~5x; without materialization
    # each scan re-runs the whole extraction lineage (measured 48s -> ~8s)
    ctx = GraphContext(
        nodes=tg.nodes.localCheckpoint(eager=True),
        edges=tg.edges.localCheckpoint(eager=True),
        embeddings=tg.embeddings.localCheckpoint(eager=True),
    )
    out = temporal_context(ctx, "what happened between 2024-01-10 and 2024-01-20?", k=1000000)
    return out.select("id", "name")


def _q_s1_ingest(spark, sf_dir):
    from cognee_graphdb_spark.sources.ingest import ingest_dataframe

    docs = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("name"), "text"
    )
    return ingest_dataframe(docs).select("id", "name", "document_type", "content_hash")


# corpus-matching custom config (the reference extractor takes a custom
# config_path, RegexEntityExtractor.__init__): the synthetic documents are
# lowercase word salad, so the default EMAIL/URL/DATE types match nothing here
_REGEX_Q_CONFIG = (
    ("SYSTEM", r"spark|vector", "System: {}"),
    ("TPCH_ENTITY", r"customer|supplier|order", "TPC-H entity: {}"),
)


def _q_regex_entities(spark, sf_dir):
    from cognee_graphdb_spark.operators.entity_extraction import regex_entities

    docs = _t(spark, sf_dir, "documents")
    return regex_entities(docs, config=_REGEX_Q_CONFIG)


def _q_s3_classify(spark, sf_dir):
    from cognee_graphdb_spark.sources.ingest import classify_documents

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("f"),
            F.col("doc_id").cast("string"),
            F.element_at(F.array(F.lit(".txt"), F.lit(".pdf"), F.lit(".mp3"), F.lit(".png"), F.lit("")), (F.col("doc_id") % 5 + 1).cast("int")),
        ).alias("name"),
    )
    return classify_documents(docs).select("doc_id", "document_type")


def _q_edge_weights_flatten(spark, sf_dir):
    from cognee_graphdb_spark.sources.sinks import flatten_edge_weights

    li = _t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data — take
    # min() per key so both engines agree on the surviving weight values
    edges = (
        li.select(
            F.concat(F.lit("li:"), F.col("l_orderkey").cast("string"), F.lit(":"), F.col("l_linenumber").cast("string")).alias("src"),
            F.concat(F.lit("part:"), F.col("l_partkey").cast("string")).alias("dst"),
            "l_discount",
            "l_quantity",
        )
        .groupBy("src", "dst")
        .agg(F.min("l_discount").alias("weight_v"), F.min("l_quantity").alias("qty_v"))
        .select(
            "src",
            "dst",
            F.lit("l_partkey").alias("relationship_name"),
            F.col("weight_v").alias("weight"),
            F.map_from_arrays(F.array(F.lit("qty")), F.array(F.col("qty_v"))).alias("weights"),
        )
    )
    out = flatten_edge_weights(edges)
    return out.select(
        "src",
        "dst",
        F.col("properties")["weight"].alias("weight"),
        F.col("properties")["weight_qty"].alias("weight_qty"),
    )


def _q_frame_sample(spark, sf_dir):
    from cognee_graphdb_spark.operators.multimodal import frame_sample_plan

    ev = _events(spark, sf_dir)
    media = ev.select(
        F.concat(F.lit("m"), F.col("event_id").cast("string")).alias("media_id"),
        F.lit("video").alias("kind"),
        (F.col("value") * 100).cast("long").alias("duration_ms"),
    ).filter(F.col("event_id") < 200)
    return frame_sample_plan(media, every_ms=1000)


def _q_resize_plan(spark, sf_dir):
    from cognee_graphdb_spark.operators.multimodal import resize_plan

    part = _t(spark, sf_dir, "part")
    media = part.select(
        F.concat(F.lit("img"), F.col("p_partkey").cast("string")).alias("media_id"),
        F.lit("image").alias("kind"),
        (F.col("p_size") * 40).cast("int").alias("width"),
        (F.col("p_size") * 25).cast("int").alias("height"),
    )
    return resize_plan(media, max_side=512)


def _q_mm_wav_decode(spark, sf_dir):
    """REAL WAV decode, oracle-checked: each doc synthesizes an 8-bit PCM WAV
    (sample i = (doc_id*7 + i*3) % 256, 1000 Hz, 200 + doc_id%100 samples) via
    sources/media.wav_bytes, then audio_frame_sample decodes the RIFF
    container and samples actual amplitudes every 50 ms.  At 1000 Hz the
    sample index equals the ms offset, so DuckDB restates the expected
    amplitudes analytically — the round-trip proves header parse + PCM frame
    addressing, not just plumbing."""
    import pandas as pd

    from cognee_graphdb_spark.operators.multimodal import audio_frame_sample
    from cognee_graphdb_spark.session import ship_package

    ship_package(spark)
    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))

    def synth(batches):
        from cognee_graphdb_spark.sources.media import synth_wav_for_id

        for pdf in batches:
            rows = [(str(int(d)), synth_wav_for_id(int(d))) for d in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = _fan_out(docs).mapInPandas(synth, "media_id string, content binary")
    return audio_frame_sample(media, every_ms=50)


def _q_mm_bmp_resize(spark, sf_dir):
    """REAL BMP decode + nearest-neighbor resize, oracle-checked: each doc
    synthesizes a 24-bpp BMP ((16 + doc_id%8) x 12, red(x,y) = (doc_id + 3x +
    7y) % 256 — widths not divisible by 4 exercise row padding), then
    image_resize decodes the pixel rows and resamples to 4x3 with the
    integer-exact floor mapping sx = tx*w//tw, which DuckDB restates."""
    import pandas as pd

    from cognee_graphdb_spark.operators.multimodal import image_resize
    from cognee_graphdb_spark.session import ship_package

    ship_package(spark)
    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))

    def synth(batches):
        from cognee_graphdb_spark.sources.media import synth_bmp_for_id

        for pdf in batches:
            rows = [(str(int(d)), synth_bmp_for_id(int(d))) for d in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = _fan_out(docs).mapInPandas(synth, "media_id string, content binary")
    return image_resize(media, target_width=4, target_height=3)


def _q_mm_png_resize(spark, sf_dir):
    """REAL PNG decode + nearest-neighbor resize, oracle-checked: each doc
    synthesizes an 8-bit truecolor PNG ((12 + doc_id%5) x 10, red(x,y) =
    (doc_id + 5x + 11y) % 256) via sources/media.png_bytes (zlib IDAT), then
    image_resize runs the full IDAT inflate + filter undo + floor-mapping
    resample to 4x3, which DuckDB restates analytically."""
    import pandas as pd

    from cognee_graphdb_spark.operators.multimodal import image_resize
    from cognee_graphdb_spark.session import ship_package

    ship_package(spark)
    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))

    def synth(batches):
        from cognee_graphdb_spark.sources.media import synth_png_for_id

        for pdf in batches:
            rows = [(str(int(d)), synth_png_for_id(int(d))) for d in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = _fan_out(docs).mapInPandas(synth, "media_id string, content binary")
    return image_resize(media, target_width=4, target_height=3)


def _q_mm_gif_resize(spark, sf_dir):
    """REAL GIF decode + nearest-neighbor resize, oracle-checked: each doc
    synthesizes a single-frame GIF ((14 + doc_id%6) x 9, red(x,y) =
    (doc_id + 7x + 13y) % 256) via sources/media.gif_bytes (palette + LZW),
    then image_resize runs the full LZW decode + palette lookup +
    floor-mapping resample to 4x3, which DuckDB restates analytically."""
    import pandas as pd

    from cognee_graphdb_spark.operators.multimodal import image_resize
    from cognee_graphdb_spark.session import ship_package

    ship_package(spark)
    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))

    def synth(batches):
        from cognee_graphdb_spark.sources.media import synth_gif_for_id

        for pdf in batches:
            rows = [(str(int(d)), synth_gif_for_id(int(d))) for d in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = _fan_out(docs).mapInPandas(synth, "media_id string, content binary")
    return image_resize(media, target_width=4, target_height=3)


def _q_mm_jpeg_resize(spark, sf_dir):
    """REAL baseline-JPEG decode + nearest-neighbor resize, oracle-checked:
    each doc synthesizes a grayscale JPEG ((24 + 8*(doc_id%3)) x 16,
    block-constant gray = 2*((doc_id*5 + 3*bx + 7*by) % 128)) via
    sources/jpeg.jpeg_bytes (Annex K tables), then image_resize runs the
    full Huffman + dequant + IDCT decode and floor-mapping resample to 4x3.
    DC-only blocks with even luma decode bit-exactly (see synth_jpeg_for_id),
    so DuckDB restates the lossy codec's output analytically."""
    import pandas as pd

    from cognee_graphdb_spark.operators.multimodal import image_resize
    from cognee_graphdb_spark.session import ship_package

    ship_package(spark)
    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))

    def synth(batches):
        from cognee_graphdb_spark.sources.media import synth_jpeg_for_id

        for pdf in batches:
            rows = [(str(int(d)), synth_jpeg_for_id(int(d))) for d in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = _fan_out(docs).mapInPandas(synth, "media_id string, content binary")
    return image_resize(media, target_width=4, target_height=3)


def _q_mm_jpeg_progressive(spark, sf_dir):
    """REAL progressive-JPEG (SOF2) decode + resize, oracle-checked: the
    synth_jpeg_for_id pixel formula encoded via the r7 progressive encoder
    (spectral-selection bands, successive approximation Al=1 -> refinement,
    EOB runs — sources/jpeg.py:jpeg_progressive_bytes), decoded through the
    multi-scan coefficient accumulator.  Progressive is a lossless re-coding
    of the same quantized coefficients, so the oracle is literally the
    baseline restatement (same SQL as mm_jpeg_resize)."""
    import pandas as pd

    from cognee_graphdb_spark.operators.multimodal import image_resize
    from cognee_graphdb_spark.session import ship_package

    ship_package(spark)
    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))

    def synth(batches):
        from cognee_graphdb_spark.sources.media import synth_jpeg_progressive_for_id

        for pdf in batches:
            rows = [(str(int(d)), synth_jpeg_progressive_for_id(int(d))) for d in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = _fan_out(docs).mapInPandas(synth, "media_id string, content binary")
    return image_resize(media, target_width=4, target_height=3)


def _q_mm_image_variants(spark, sf_dir):
    """The image-format variants real web corpora actually carry, decoded
    for REAL and oracle-checked per variant: grayscale PNG at depth 4
    (sub-byte unpack + 255/(2^d-1) sample scaling), palette PNG at depth 4
    (PLTE lookup), Adam7-INTERLACED truecolor PNG (7-pass scatter), and an
    interlaced GIF (4-pass row reorder).  Each decodes + resizes through
    the same image_resize operator; DuckDB restates every pixel from the
    synthesis formulas."""
    import pandas as pd

    from cognee_graphdb_spark.operators.multimodal import image_resize
    from cognee_graphdb_spark.session import ship_package

    ship_package(spark)
    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))

    def synth(batches):
        from cognee_graphdb_spark.sources.media import (
            gif_bytes,
            png_bytes,
            png_gray_bytes,
            png_palette_bytes,
        )

        pal = [(17 * i, 0, 0) for i in range(16)]
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                rows.append((f"g:{d}", png_gray_bytes(10 + d % 4, 7, lambda x, y, d=d: (d + 2 * x + 3 * y) % 16, depth=4)))
                rows.append((f"p:{d}", png_palette_bytes(12 + d % 3, 6, lambda x, y, d=d: (d + x + 2 * y) % 16, pal, depth=4)))
                rows.append((f"i:{d}", png_bytes(12 + d % 5, 10, lambda x, y, d=d: ((d + 5 * x + 11 * y) % 256, 0, 0), interlace=True)))
                rows.append((f"gi:{d}", gif_bytes(14 + d % 6, 9, lambda x, y, d=d: ((d + 7 * x + 13 * y) % 256, 0, 0), interlace=True)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = _fan_out(docs).mapInPandas(synth, "media_id string, content binary")
    return image_resize(media, target_width=4, target_height=3)


def _q_s2_office_text(spark, sf_dir):
    """S2 office/HTML/email loaders (the reference's optional
    unstructured_loader surface), decoded for REAL through the mixed-type
    dispatch: per doc a DOCX (WordprocessingML paragraphs), an XLSX
    (sharedStrings + sheet cells), an HTML page (tag-strip with script
    dropped), and an EML (subject + text/plain body) synthesize from the
    document text, and DuckDB restates every extracted string."""
    import pandas as pd

    from cognee_graphdb_spark.sources.ingest import decode_documents

    _ship_package(spark)
    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"), "text")

    def synth(batches):
        from email.message import EmailMessage

        from cognee_graphdb_spark.sources.office import docx_bytes, xlsx_bytes

        for pdf in batches:
            rows = []
            for d, txt in zip(pdf["doc_id"], pdf["text"]):
                d, txt = int(d), str(txt)
                rows.append((f"docx:{d}", "OfficeDocument", docx_bytes([txt[:30], txt[30:60]])))
                rows.append(
                    (f"xlsx:{d}", "OfficeDocument", xlsx_bytes([[f"a{d}", txt[:10]], [txt[10:20], "z"]]))
                )
                html = (
                    "<html><head><title>T</title><script>var x=1;</script></head>"
                    f"<body><p>{txt[:20]}</p> <p>{txt[20:40]}</p></body></html>"
                ).encode()
                rows.append((f"html:{d}", "HtmlDocument", html))
                msg = EmailMessage()
                msg["Subject"] = f"Doc {d}"
                msg.set_content(txt[:40])
                rows.append((f"eml:{d}", "EmailDocument", bytes(msg)))
            yield pd.DataFrame(rows, columns=["id", "document_type", "content"])

    media = _fan_out(docs).mapInPandas(synth, "id string, document_type string, content binary")
    return decode_documents(media)


def _q_mm_media_info(spark, sf_dir):
    """REAL container-metadata sniff (operators/multimodal.media_info):
    each doc synthesizes one MP3 (frame-header walk gives the exact
    duration) and one MP4 (ISO BMFF box tree gives duration/dims/codec) via
    sources/container.py, and the typed-metadata rows restate analytically
    from the fixture formulas (synth_mp3_for_id / synth_mp4_for_id)."""
    import pandas as pd

    from cognee_graphdb_spark.operators.multimodal import media_info
    from cognee_graphdb_spark.session import ship_package

    ship_package(spark)
    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))

    def synth(batches):
        from cognee_graphdb_spark.sources.container import (
            synth_mp3_for_id,
            synth_mp4_for_id,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                did = int(d)
                rows.append((f"{did}:a", synth_mp3_for_id(did)))
                rows.append((f"{did}:v", synth_mp4_for_id(did)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = _fan_out(docs).mapInPandas(synth, "media_id string, content binary")
    return media_info(media)


_ONTO_INDIVIDUALS = {"building": "Structure", "auto": "Vehicle", "machine": "Equipment", "house": "Structure"}


def _q_ontology_resolve(spark, sf_dir):
    """U12 through the real FILE-PARSE path (r9): a deterministic .owl
    fixture is written and parsed by OntologyResolver.from_rdf_xml (stdlib
    RDF/XML walk mirroring RDFLibOntologyResolver.build_lookup), then the
    parsed individuals resolve customer segments.  Class keys come out
    lowercased per the reference's _uri_to_key, which the oracle restates."""
    import os
    import tempfile

    from cognee_graphdb_spark.sources.ontology import OntologyResolver

    onto_xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:ex="http://example.org/onto#">
  <owl:Class rdf:about="http://example.org/onto#Structure"/>
  <owl:Class rdf:about="http://example.org/onto#Vehicle"/>
  <owl:Class rdf:about="http://example.org/onto#Equipment"/>
  <owl:NamedIndividual rdf:about="http://example.org/onto#building">
    <rdf:type rdf:resource="http://example.org/onto#Structure"/>
  </owl:NamedIndividual>
  <owl:NamedIndividual rdf:about="http://example.org/onto#house">
    <rdf:type rdf:resource="http://example.org/onto#Structure"/>
  </owl:NamedIndividual>
  <ex:Vehicle rdf:about="http://example.org/onto#auto"/>
  <owl:NamedIndividual rdf:about="http://example.org/onto#machine">
    <rdf:type rdf:resource="http://example.org/onto#Equipment"/>
  </owl:NamedIndividual>
</rdf:RDF>
"""
    fd, path = tempfile.mkstemp(suffix=".owl")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(onto_xml)
        r = OntologyResolver.from_rdf_xml(path)
    finally:
        os.unlink(path)
    assert r.individuals == {k: v.lower() for k, v in _ONTO_INDIVIDUALS.items()}
    ents = _t(spark, sf_dir, "customer").select("c_custkey", F.col("c_mktsegment").alias("name"))
    out = r.resolve_entities(ents)
    return out.select("c_custkey", "name", "ontology_class", "ontology_valid")



def _q_s4_column_values(spark, sf_dir):
    from cognee_graphdb_spark.schemas import load_testdata
    from cognee_graphdb_spark.sources.migration import column_value_graph

    tables = load_testdata(spark, sf_dir, tables=("customer", "orders"))
    nodes, edges = column_value_graph(
        tables, {"customer": ("c_mktsegment",), "orders": ("o_orderstatus", "o_orderpriority")}
    )
    return edges.groupBy("relationship_name", "dst").agg(F.count(F.lit(1)).alias("n"))


def _q_u7_cot_triplets(spark, sf_dir):
    """U7 CoT loop, oracle-checked (promoted from rows-only in r7): the mock
    follow-up question depends only on the query (gateway.py:
    followup_question -> 'what else relates to scan?'), so the 2-iteration
    loop's triplet set is exactly dedup(top5(query) ∪ top5(followup)) — the
    DuckDB oracle runs both searches and unions the keys.  The per-key score
    is dropped: dropDuplicates keeps an arbitrary survivor when the same
    triplet ranks under both queries, so the SET is the deterministic part
    (reference: graph_completion_cot_retriever.py:57-142)."""
    from cognee_graphdb_spark.plans.search_types import GraphContext, graph_completion_cot

    res = _cognify_memo(spark, sf_dir, 60)
    ctx = GraphContext(nodes=res.nodes, edges=res.edges, embeddings=res.embeddings)
    _, triplets = graph_completion_cot(ctx, "fast table scan merge", k=5, max_iter=2)
    return triplets.select("src", "src_name", "relationship_name", "dst", "dst_name")


def _q_u8_context_extension_triplets(spark, sf_dir):
    """U8 context extension, oracle-checked (promoted in r7 — the last
    LLM-loop composite): the mock completion echoes the prompt LENGTH, so
    the feedback query of each round is 'MOCK_COMPLETION[n]' with n fully
    determined by the rendered context of the current triplet set.  The
    DuckDB oracle restates render_triplets' length char-exactly (per-node
    titles via the Counter.most_common tie rule), hash-embeds the dynamic
    query, and reproduces the break-on-fixpoint branch (reference:
    graph_completion_context_extension_retriever.py:46-131).  Keys + names
    only: dropDuplicates keeps an arbitrary score survivor (same rationale
    as u7)."""
    from cognee_graphdb_spark.plans.search_types import GraphContext, graph_completion_context_extension

    res = _cognify_memo(spark, sf_dir, 60)
    ctx = GraphContext(nodes=res.nodes, edges=res.edges, embeddings=res.embeddings)
    _, triplets = graph_completion_context_extension(ctx, "fast table scan merge", k=5, max_iter=2)
    return triplets.select("src", "src_name", "relationship_name", "dst", "dst_name")


def _q_code_graph(spark, sf_dir):
    from cognee_graphdb_spark.plans.code_graph import cognify_code

    # deterministic synthetic sources derived from the documents table
    files = _t(spark, sf_dir, "documents").limit(40).select(
        F.concat(F.lit("mod_"), F.col("doc_id").cast("string"), F.lit(".py")).alias("path"),
        F.concat(
            F.lit("def handler_"), F.col("doc_id").cast("string"),
            F.lit("():\n    return "), F.lit('"'), F.substring("text", 1, 20), F.lit('"'), F.lit("\n\n"),
            F.lit("class Worker_"), F.col("doc_id").cast("string"), F.lit(":\n    pass\n"),
        ).alias("source"),
    )
    cg = cognify_code(files)
    return cg.nodes.groupBy("type").agg(F.count(F.lit(1)).alias("n"))



def _q_s5_schema_only(spark, sf_dir):
    from cognee_graphdb_spark.sources.migration import migrate_schema_only

    nodes, edges = migrate_schema_only(spark)
    n = nodes.select("id", "name", F.lit(None).cast("string").alias("dst"), F.lit("node").alias("kind"))
    e = edges.select(F.col("src").alias("id"), F.col("relationship_name").alias("name"), "dst", F.lit("edge").alias("kind"))
    return n.unionByName(e)



def _q_bpe_token_counts(spark, sf_dir):
    from cognee_graphdb_spark.operators.text_analysis import bpe_ish_token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", bpe_ish_token_count("text").cast("bigint").alias("n_pieces"))



def _q_a2_component_sizes(spark, sf_dir):
    from cognee_graphdb_spark.operators.graph_metrics import connected_components

    # n_regionkey-only subgraph: one component per region (its nations) —
    # the size MULTISET is oracle-derivable even though the representative
    # (min xxhash id) is engine-internal
    nodes, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(F.col("relationship_name") == "n_regionkey")
    members = fk.select(F.col("src").alias("id")).unionByName(fk.select(F.col("dst").alias("id"))).distinct()
    comp = connected_components(members, fk)
    return comp.groupBy("component").agg(F.count(F.lit(1)).alias("size")).groupBy("size").agg(
        F.count(F.lit(1)).alias("n_components")
    )


def _with_shipping(fn):
    def wrapped(spark, sf_dir, _fn=fn):
        _ship_package(spark)
        return _fn(spark, sf_dir)

    return wrapped


def _q_memify_rules(spark, sf_dir):
    """memify enrichment: chunk documents, gateway-extract developer rules
    (plans/memify.py:extract_rules_stage), count per distinct rule.  Rows-only:
    the sentence split uses a lookbehind RE2/DuckDB can't restate."""
    from cognee_graphdb_spark.llm.gateway import MockLLMGateway
    from cognee_graphdb_spark.operators.chunking import chunk_documents
    from cognee_graphdb_spark.plans.memify import extract_rules_stage

    # deterministic imperative sentences derived from the documents table (the
    # synthetic corpus vocabulary has no modal verbs of its own)
    docs = _t(spark, sf_dir, "documents").limit(200).select(
        "doc_id",
        F.concat(
            F.lit("You should "), F.substring("text", 1, 40),
            F.lit(". Plain filler statement here. Never "), F.substring("text", 41, 40), F.lit("."),
        ).alias("text"),
    )
    chunks = chunk_documents(docs, max_chunk_size=128)
    rules = extract_rules_stage(chunks, MockLLMGateway())
    return rules.groupBy("rule_text").agg(F.count(F.lit(1)).alias("n"))


def _q_td_hash_sample(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, 0.1, seed=7, hasher="md5_64").select("doc_id", "lang", "source")


def _q_td_stratified_sample(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", {"en": 0.6, "zh": 0.2}, default_fraction=0.05, seed=11, hasher="md5_64"
    ).select("doc_id", "lang")


def _q_td_decontaminate(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import ngram_decontaminate

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    return ngram_decontaminate(train, ev, n=5, hasher="md5_64")


def _pii_text_col():
    return F.concat(
        F.lit("reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 555-000-1234 at 10.0.0."),
        F.pmod(F.col("doc_id"), F.lit(255)).cast("string"),
        F.lit(" ssn 123-45-6789 :: "),
        F.col("text"),
    )


def _q_td_pii_redact(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import redact_pii

    docs = _t(spark, sf_dir, "documents").select("doc_id", _pii_text_col().alias("text"))
    return redact_pii(docs)


def _q_td_corpus_stats(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import corpus_stats

    return corpus_stats(_t(spark, sf_dir, "documents"))


def _q_td_repetition(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import repetition_features

    return repetition_features(_t(spark, sf_dir, "documents"), hasher="md5_64")


def _q_td_gopher_filter(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import gopher_quality_filter

    out = gopher_quality_filter(_t(spark, sf_dir, "documents"))
    # arrays hash differently across engines — compare the joined string
    return out.select("doc_id", "keep", F.array_join("fail_reasons", ",").alias("fail_reasons"))


def _q_td_unigram_logprob(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import unigram_lm, unigram_logprob

    docs = _t(spark, sf_dir, "documents")
    # truncated vocab so the OOV floor path is exercised against the oracle
    return unigram_logprob(docs, unigram_lm(docs, vocab_size=100))


def _q_td_weighted_sample(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    from cognee_graphdb_spark.functions.text import tokenize

    # weight = min(1, n_words/100): longer docs more likely kept
    weighted = docs.withColumn(
        "w", F.least(F.lit(1.0), F.size(tokenize(F.col("text"))).cast("double") / F.lit(100.0))
    )
    return weighted_sample(weighted, "w", seed=5, hasher="md5_64").select(
        "doc_id", "lang", "source"
    )


def _q_td_shuffle_shards(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import deterministic_shuffle

    docs = _t(spark, sf_dir, "documents")
    return deterministic_shuffle(docs, n_shards=16, seed=3, hasher="md5_64").select(
        "doc_id", "shard", "pos"
    )


_QUALITY_W = {
    "log_n_words": 0.8,
    "mean_word_len": -0.5,
    "stopword_ratio": 3.0,
    "alpha_word_frac": 1.5,
    "symbol_ratio": -4.0,
    "dup_word_frac": -2.0,
    "__intercept__": -1.0,
}


def _q_td_quality_score(spark, sf_dir):
    from cognee_graphdb_spark.operators.quality_model import score_quality

    out = score_quality(_t(spark, sf_dir, "documents"), _QUALITY_W)
    return out.withColumn("quality_score", F.round("quality_score", 6))


def _q_td_c4_line_filter(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import c4_line_filter

    return c4_line_filter(_t(spark, sf_dir, "documents"))


def _q_td_duplicate_spans(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    return duplicate_spans(docs, window=12, stride=4, hasher="md5_64")


def _q_td_source_report(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import source_quality_report

    return source_quality_report(_t(spark, sf_dir, "documents"))


def _q_td_mixture_plan(spark, sf_dir):
    from cognee_graphdb_spark.operators.training_data import mixture_plan

    docs = _t(spark, sf_dir, "documents")
    return mixture_plan(docs, {"src0": 2.0, "src1": 1.0, "src2": 1.0}, total_tokens=100_000)


def _q_td_curate_corpus(spark, sf_dir):
    """End-to-end curation chain, ORACLE-CHECKED as one composed SQL block:
    gopher filter -> exact dedup (min-id keeper) -> MinHash near-dedup with
    connected-component keeper election -> 5-gram decontamination ->
    learned-quality weighted resample -> deterministic shards.  Every stage
    reuses the fragment its standalone oracle already proved; the composition
    pins the ORDER and the keep/drop wiring between stages.  hasher=md5_64 so
    DuckDB can restate the hash-keyed stages bit-identically."""
    from cognee_graphdb_spark.operators.curation import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 101 == 0)
    train = docs.filter(F.col("doc_id") % 101 != 0)
    res = curate_corpus(
        train,
        eval_df=ev,
        use_c4=False,  # driver docs have no line structure
        minhash_num_hashes=16,
        minhash_bands=8,
        quality_weights=_QUALITY_W,
        n_shards=8,
        seed=3,
        hasher="md5_64",
    )
    return res.corpus.select("doc_id", "shard", "pos")


def _q_td_pack_sequences(spark, sf_dir):
    """Sequence-packing invariants as one oracle-checkable row: packing keeps
    every doc exactly once with its token count conserved (n_docs /
    total_tokens match the raw corpus), and produces zero overfull multi-doc
    sequences and zero seq_pos gaps — the oracle states the invariant side
    as literal zeros.  (seq_id assignment itself is hash-partition-dependent,
    so the raw rows stay covered by pytest, not the SQL oracle.)"""
    from cognee_graphdb_spark.operators.training_data import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    packed = pack_sequences(docs, budget=256, partitions=8)
    seq = packed.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.count(F.lit(1)).alias("n_in_seq"),
        (F.max("seq_pos") + 1).alias("max_pos1"),
    )
    totals = packed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("doc_id").cast("bigint").alias("n_distinct_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    invariants = seq.agg(
        F.sum(
            F.when((F.col("fill") > 256) & (F.col("n_in_seq") > 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("overfull_multidoc_seqs"),
        F.sum(F.when(F.col("max_pos1") != F.col("n_in_seq"), 1).otherwise(0))
        .cast("bigint")
        .alias("position_gap_seqs"),
    )
    return totals.crossJoin(invariants)


def _q_bm25_topk(spark, sf_dir):
    from cognee_graphdb_spark.operators.ranking import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), "fast table scan merge", k=20)


def _q_tfidf_topk(spark, sf_dir):
    from cognee_graphdb_spark.operators.ranking import tfidf_topk

    return tfidf_topk(_t(spark, sf_dir, "documents"), "window vector batch", k=20)


def _q_knn_quantized(spark, sf_dir):
    from cognee_graphdb_spark.operators.similarity import knn_quantized

    emb = _t(spark, sf_dir, "embeddings")
    return knn_quantized(emb, _qvec(spark, sf_dir, 7), k=10)


def _q_skew_report(spark, sf_dir):
    from cognee_graphdb_spark.operators.diagnostics import skew_report

    return skew_report(_t(spark, sf_dir, "orders"), "o_custkey", top_k=20)


def _q_pq_codes(spark, sf_dir):
    """PQ codebook training + encoding over the embeddings table
    (operators/similarity.py:pq_codebooks/pq_encode; reference family:
    LanceDB's default IVF_PQ index — cognee/infrastructure/databases/vector/
    lancedb/LanceDBAdapter.py create-index path).  Deterministic hash-seeded
    k-means (1 recenter round, 8 subspaces x 8 codes, md5_64 seeds) so the
    oracle restates seed pick, argmin assignment, mean recenter, and the
    final integer codes; output is the all-integer code string per vector."""
    from cognee_graphdb_spark.operators.similarity import pq_codebooks, pq_encode

    emb = _t(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, m_sub=8, k_codes=8, hasher="md5_64")
    enc = pq_encode(emb, books)
    return enc.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.concat_ws(",", F.transform("pq_codes", lambda c: c.cast("string"))).alias(
            "codes"
        ),
    )


def _q_pq_topk(spark, sf_dir):
    """The IVF_PQ query path minus the IVF prune (operators/similarity.py:
    pq_topk): ADC shortlist over the compressed codes, exact-cosine re-rank
    of the survivors.  rerank=100 >> k=10 leaves the shortlist cutoff far
    from the top-10 boundary, so last-ulp ADC summation-order noise cannot
    change the answer; re-ranked distances round to 6 dp (v1_knn
    discipline)."""
    from cognee_graphdb_spark.operators.similarity import pq_codebooks, pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, m_sub=8, k_codes=8, hasher="md5_64")
    return pq_topk(
        emb,
        _qvec(spark, sf_dir, 7),
        k=10,
        m_sub=8,
        k_codes=8,
        rerank=100,
        codebooks=books,
    )


def _q_a2_weighted_sssp(spark, sf_dir):
    """Weighted shortest paths from the 5 region nodes
    (operators/paths.py:weighted_sssp — the gds.shortestPath.dijkstra /
    gds.allShortestPaths.stream family the reference reaches through
    neo4j_metrics_utils.py's GDS surface) over the UNDIRECTED nation-family
    FK subgraph with deterministic integer weights 1..5 (seeded hash of the
    edge), 4-hop bound.  After round i the state is exactly "cheapest path
    using <= i edges", so the oracle unrolls the same 4 relax-and-min
    rounds; all-integer costs hash bit-for-bit."""
    from cognee_graphdb_spark.operators.dedup import _hash64
    from cognee_graphdb_spark.operators.paths import weighted_sssp

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    w = fk.select(
        "src",
        "dst",
        (F.pmod(_hash64(F.concat_ws("|", "src", "dst"), 0, "md5_64"), F.lit(5)) + 1).alias(
            "weight"
        ),
    )
    srcs = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
        .filter(F.col("id").startswith("region:"))
    )
    out = weighted_sssp(w, srcs, max_hops=4, directed=False)
    return out.select("source", "node", F.col("dist").cast("long").alias("dist"))


def _q_a2_neighbor_sample(spark, sf_dir):
    """GraphSAGE-style layered neighbor sampling (operators/graph_sampling
    .py:neighbor_sample; Hamilton et al. 2017 — the GNN mini-batch corpus
    stage, a training-data op like walks/skip-grams) from the 5 region
    nodes over the undirected nation-family FK subgraph, fanouts [3, 2].
    Neighbor order is a seeded hash of (node, neighbor) over the ranked
    adjacency, so the oracle restates the same row_number ranking and the
    sampled edge blocks match row-for-row."""
    from cognee_graphdb_spark.operators.graph_sampling import neighbor_sample

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    roots = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
        .filter(F.col("id").startswith("region:"))
    )
    return neighbor_sample(
        fk, roots, fanouts=[3, 2], seed=11, hasher="md5_64", directed=False
    )


def _q_a2_link_prediction(spark, sf_dir):
    """Adamic-Adar link prediction (operators/link_prediction.py — the
    gds.alpha.linkprediction family the reference reaches through its GDS
    metric surface) over the undirected nation-family FK subgraph, top-500
    by (score desc, u, v).  Scores fold 1/ln(deg) over SORTED common
    neighbors (the betweenness float discipline), so the oracle's
    list(... ORDER BY z) + list_reduce restates them bit-for-bit."""
    from cognee_graphdb_spark.operators.link_prediction import link_prediction

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    return link_prediction(fk, metric="adamic_adar", top_k=500)


def _q_a2_sssp_paths(spark, sf_dir):
    """Cheapest paths RENDERED (operators/paths.py:weighted_sssp(return_pred)
    + sssp_paths — the gds.shortestPath.dijkstra STREAM shape, path strings
    included) from the 5 region nodes, undirected nation-family subgraph,
    hash-derived integer weights 1..5, 3-hop bound.  Predecessors tie-break
    by (dist, pred) over exact integer costs, so the oracle re-derives the
    same pointers round-for-round and walks them with 3 chained joins."""
    from cognee_graphdb_spark.operators.dedup import _hash64
    from cognee_graphdb_spark.operators.paths import sssp_paths, weighted_sssp

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    w = fk.select(
        "src",
        "dst",
        (F.pmod(_hash64(F.concat_ws("|", "src", "dst"), 0, "md5_64"), F.lit(5)) + 1).alias(
            "weight"
        ),
    )
    srcs = (
        fk.select(F.col("src").alias("id"))
        .unionByName(fk.select(F.col("dst").alias("id")))
        .distinct()
        .filter(F.col("id").startswith("region:"))
    )
    dp = weighted_sssp(w, srcs, max_hops=3, directed=False, return_pred=True)
    out = sssp_paths(dp, max_hops=3)
    return out.select(
        "source", "node", F.col("dist").cast("long").alias("dist"), "path", "truncated"
    )


def _q_a2_ktruss(spark, sf_dir):
    """3-truss of the Jaccard near-dup pair graph (operators/dense_subgraph
    .py:k_truss — the edge analogue of the GDS kcore family the engine
    already ships; Cohen 2008): every surviving edge sits in ≥1 triangle,
    i.e. every near-dup link corroborated by a mutual neighbor.  The Spark
    side peels with hub-safe oriented triangle counting; the oracle unrolls
    5 naive peel rounds (idempotent past the fixpoint) and recounts final
    support with a plain wedge join — equal integer supports prove the
    orientation enumeration lossless under iteration, like the
    a2_triangle_clustering pin proves it for one pass."""
    from cognee_graphdb_spark.operators.dedup import jaccard_pairs
    from cognee_graphdb_spark.operators.dense_subgraph import k_truss

    docs = _t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, threshold=0.9)
    edges = pairs.select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
    )
    return k_truss(edges, k=3)


def _q_textrank_keywords(spark, sf_dir):
    """TextRank corpus keywords (operators/keywords.py — Mihalcea & Tarau
    2004, composed from term_cooccurrence + weighted pagerank with NO new
    iteration machinery): window 3, max_df 400, pairs >= 3, 10 weighted
    power iterations, top-100 by rank.  Ranks ppm-quantized like the a9
    pagerank oracles; the co-occurrence weights are exact integers, so the
    transition fractions are one IEEE division on both engines."""
    from cognee_graphdb_spark.operators.keywords import textrank_keywords

    # top_k=None: the 100-cut happens on the QUANTIZED ranks below — a
    # raw-double cut at position 100/101 could flip on engine last-ulp
    # differences, ppm-integer ties cannot
    out = textrank_keywords(
        _t(spark, sf_dir, "documents"),
        window=3,
        min_pair_count=3,
        max_df=400,
        n_iter=10,
        top_k=None,
    )
    return (
        out.select(
            "term", F.round(F.col("rank") * 1000000.0).cast("long").alias("rank_ppm")
        )
        .orderBy(F.desc("rank_ppm"), "term")
        .limit(100)
    )


def _q_a2_node_embeddings(spark, sf_dir):
    """SPPMI corpus stage of SPPMI-SVD node embeddings
    (operators/node_embeddings.py:sppmi_matrix over the deterministic
    random_walks → walk_skipgram_pairs corpus; Levy & Goldberg 2014 — the
    matrix skip-gram-with-negative-sampling implicitly factorizes, i.e. the
    gds.node2vec analogue).  Integer marginals + ONE rounded log per cell
    (shift=2 exercises the negative-sampling shift), so the oracle extends
    the a2_walk_skipgrams chain with three integer aggregates and the log.
    The factorization stage is float-tolerance work and is pinned by
    tests/test_node_embeddings.py, not the oracle."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        random_walks,
        walk_skipgram_pairs,
    )
    from cognee_graphdb_spark.operators.node_embeddings import sppmi_matrix

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    walks = random_walks(fk, walk_length=4, num_walks=2, seed=3, hasher="md5_64")
    return sppmi_matrix(walk_skipgram_pairs(walks, window=2), shift=2)


def _q_v6_graph_vectors(spark, sf_dir):
    """The graph-embedding lifecycle's serve shape (api.py:embed_graph →
    Entity_graph collection → api.py:similar_nodes via V6 fan-out,
    operators/vector_search.py:multi_collection_knn): walks → skip-grams →
    SPPMI-SVD vectors shaped as S7 embedding rows.  The contract hashes the
    SHAPE — one vector per covered node (positive shift-2 SPPMI cells after
    symmetrization), all of the graph dimension — because the float vector
    VALUES are power-iteration outputs (tolerance-stable, not bit-stable;
    node_embeddings.py docstring) pinned by pytest
    (test_api.py:test_graph_embedding_lifecycle end-to-end through the
    store, test_node_embeddings.py against a dense eigensolver).  The
    oracle restates coverage from the same unrolled SPPMI cell chain the
    a2_node_embeddings entry proves cell-exactly."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        random_walks,
        walk_skipgram_pairs,
    )
    from cognee_graphdb_spark.operators.node_embeddings import sppmi_node_embeddings

    _, edges = tpch_graph(spark, sf_dir)
    fk = edges.filter(
        F.col("relationship_name").isin("c_nationkey", "s_nationkey", "n_regionkey")
    )
    walks = random_walks(fk, walk_length=4, num_walks=2, seed=3, hasher="md5_64")
    vecs = sppmi_node_embeddings(
        walk_skipgram_pairs(walks, window=2), dim=8, n_iter=1, shift=2, hasher="md5_64"
    )
    rows = vecs.select(
        F.lit("Entity_graph").alias("collection"),
        F.col("id").cast("string").alias("id"),
        F.col("embedding").cast("array<float>").alias("vector"),
    )
    return rows.groupBy("collection").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.count_distinct("id").alias("n_ids"),
        F.min(F.size("vector")).alias("dim_min"),
        F.max(F.size("vector")).alias("dim_max"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver validates the first ~50 keys of this dict
    # (CORRECTNESS_r02..r10 each covered exactly the first 50).  Round 11
    # window = the r10 VERDICT's prescription verbatim: the seven r7 rows
    # deferred by name from r10, the 13 r10-new entries (community family,
    # CALL gds.* dialect, generator trio) getting their first driver proof,
    # then 30 of the 45 r8-vintage rows — §2-named rows and touched-module
    # rows first.  The REGISTRY CAPACITY POLICY the r10 verdict asked for
    # is stated in full at the window-boundary comment inside the dict:
    # rows in diff-untouched modules with a fresh same-module sibling may
    # age to at most 4 rounds, and rows at that cap unconditionally lead
    # the next window.  The fifteen rule-2 deferrals this round are named
    # there with their per-row sibling justification.
    raw = {
        # -- round-12 window (first 50) ---------------------------------------
        # Composition, exactly as pre-committed at the r11 boundary and
        # prescribed by the r11 VERDICT (#1): (a) the fifteen rule-3 capped
        # r8 rows (age 4 — unconditional by policy rule 3), (b) the seven
        # r11-new rows getting their first driver proof, (c) the five
        # plans/cypher.py dialect rows (rule 1(i): the module was
        # diff-touched in r11 — appended CALL routes only, but the rule is
        # the rule), (d) rule-1(i) rows for the modules r12 ITSELF touches
        # (node_embeddings.py sign pin -> a2_node_embeddings +
        # v6_graph_vectors; dedup.py k-means extraction -> dedup_semdedup +
        # dedup_incremental_index), then (e) oldest-first r9 rows.
        #
        # (a) the fifteen rule-3 capped rows (r8 proofs, age 4)
        "dedup_exact": _q_dedup_exact,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_embedding_exact": _q_dedup_embedding,
        "dedup_fuzzy_names": _q_dedup_fuzzy_names,
        "dedup_entity_resolution": _q_dedup_entity_resolution,
        "token_counts": _q_token_counts,
        "term_cooccurrence": _q_term_cooccurrence,
        "td_pack_sequences": _q_td_pack_sequences,
        "mm_wav_decode": _q_mm_wav_decode,
        "mm_bmp_resize": _q_mm_bmp_resize,
        "mm_png_resize": _q_mm_png_resize,
        "mm_gif_resize": _q_mm_gif_resize,
        "mm_jpeg_resize": _q_mm_jpeg_resize,
        "mm_media_info": _q_mm_media_info,
        "mm_llm_media_av": _q_mm_llm_media_av,
        # (b) the seven r11-new rows, sweep-green on r11 code, first
        # driver proof (eigenvector/articlerank centralities, Borůvka
        # MSF, Kahn topo layers, DBSCAN, kSpanningTree, cluster-balanced
        # diversity sampling)
        "a2_eigenvector": _q_a2_eigenvector,
        "a2_articlerank": _q_a2_articlerank,
        "a2_spanning_forest": _q_a2_spanning_forest,
        "a2_topo_layers": _q_a2_topo_layers,
        "dbscan_clusters": _q_dbscan_clusters,
        "a2_k_spanning": _q_a2_k_spanning,
        "td_cluster_sample": _q_td_cluster_sample,
        # (c) plans/cypher.py proof-after-change rows (touched r11+r12)
        "cypher_passthrough": _q_cypher_passthrough,
        "cypher_translated": _q_cypher_translated,
        "cypher_pipeline": _q_cypher_pipeline,
        "cypher_optional_match": _q_cypher_optional_match,
        "cypher_list_ops": _q_cypher_list_ops,
        # (d) proof-after-change rows for modules r12 touches:
        # node_embeddings.py (eigenvector-sign canonicalization) and
        # dedup.py (spherical k-means core extracted for gds.kmeans)
        "a2_node_embeddings": _q_a2_node_embeddings,
        "v6_graph_vectors": _q_v6_graph_vectors,
        "dedup_semdedup": _q_dedup_semdedup,
        "dedup_incremental_index": _q_dedup_incremental_index,
        # (e) oldest-first r9 rows filling the window to 50
        "pq_codes": _q_pq_codes,
        "a2_weighted_sssp": _q_a2_weighted_sssp,
        "a9_pagerank_personalized": _q_a9_pagerank_personalized,
        "a9_pagerank_weighted": _q_a9_pagerank_weighted,
        "a2_kcore": _q_a2_kcore,
        "a2_coreness": _q_a2_coreness,
        "a2_wl_refinement": _q_a2_wl_refinement,
        "a2_graph_metrics": _q_a2_graph_metrics,
        "cypher_case": _q_cypher_case,
        "cypher_undirected": _q_cypher_undirected,
        "cypher_union_having": _q_cypher_union_having,
        "v5_embed_knn": _q_v5_embed_knn,
        "td_curate_corpus": _q_td_curate_corpus,
        "a2_connected_components": _q_a2_components,
        "cognify_node_counts": _q_cognify_counts,
        "chunk_classification": _q_chunk_classification,
        "memify_rules": _q_memify_rules,
        "code_graph_counts": _q_code_graph,
        "a9_pagerank": _q_a9_pagerank,
        # -- window boundary (50): below here, rows stay green cumulatively --
        #
        # REGISTRY CAPACITY POLICY (adopted r11 per the r10 VERDICT #1; the
        # policy is permanent):
        #   1. Window priority each round: (i) red rows and proof-after-
        #      change rows (any row whose implementing module was diff-
        #      touched since its last green proof), (ii) never-driver-proved
        #      new rows, (iii) oldest rows, §2-mapped before diagnostics-
        #      shaped at equal age.
        #   2. Extended staleness cap: a row may age to AT MOST 4 rounds
        #      since its last green driver proof PROVIDED (a) its
        #      implementing module is diff-untouched since that proof
        #      (verified against the round diffs) AND (b) a same-module
        #      sibling row is green in a window no older than the previous
        #      round.  Rows failing either condition stay on the <=2-round
        #      schedule and must enter the next window.
        #   3. Rows at the 4-round cap unconditionally lead the next window
        #      (no further deferral, whatever their module diff status).
        #
        # r13 WINDOW PRE-COMMITMENT (rules 1+3):
        #   (a) the twenty-one r9-proved rows below that reach age 4 after
        #       r12 (rule 3): td_dsir_resample, s1_ingest_identify,
        #       s3_classify_documents, s4_column_values, s5_schema_only,
        #       u12_ontology_resolve, u_regex_entities,
        #       edge_weights_flatten, mm_frame_sample, mm_resize_plan,
        #       a2_component_sizes, insights_exact_node, temporal_search_e2e,
        #       natural_language_search, td_hash_sample, td_stratified_sample,
        #       td_decontaminate, td_pii_redact, td_corpus_stats,
        #       td_repetition, td_gopher_filter.
        #   (b) rule-1(i) proof-after-change rows for modules r12 diff-
        #       touched whose rows are NOT in the r12 window:
        #       training_data.py (margin prefilter in cluster_balanced_sample
        #       — output-identical and parity-pinned, but the rule is the
        #       rule) -> the six r10 td_* rows; dedup.py -> dedup_minhash_lsh
        #       (r10) and the three r11 dedup rows; plans/cypher.py (kmeans
        #       route appended) -> the six r11 cypher_gds_* rows.
        #   (c) the twelve r12-new rows at the END of this dict (a2_kmeans,
        #       td_curate_clustered, cypher_gds_knn, cypher_gds_conductance,
        #       a2_fastrp, cypher_gds_dijkstra, cypher_gds_catalog,
        #       cypher_gds_mutate_chain, the r12c CALL-surface rows
        #       cypher_gds_scale_properties, cypher_gds_modularity,
        #       cypher_gds_spanning, and td_bpe_pairs), then oldest-first.
        #   Exact count: 21 (a) + 16 (b: six r10 td_*, dedup_minhash_lsh +
        #   three r11 dedup rows, six r11 cypher_gds_*) + 12 (c) = 49 —
        #   fits one 50-slot window with 1 oldest-first filler; the
        #   arithmetic closes.
        "skew_report": _q_skew_report,
        "td_mixture_plan": _q_td_mixture_plan,
        "td_source_report": _q_td_source_report,
        "mm_image_variants": _q_mm_image_variants,
        "mm_llm_media_text": _q_mm_llm_media_text,
        "tfidf_topk": _q_tfidf_topk,
        "a3_degree_one_nodes": _q_a3_degree_one,
        "a2_conductance": _q_a2_conductance,
        "a2_hits": _q_a2_hits,
        "a2_leiden": _q_a2_leiden,
        "a2_scc": _q_a2_scc,
        "cypher_gds_wcc_sizes": _q_cypher_gds_wcc_sizes,
        "cypher_gds_wcc_stats": _q_cypher_gds_wcc_stats,
        "cypher_gds_apsp": _q_cypher_gds_apsp,
        "cypher_gds_clustering": _q_cypher_gds_clustering,
        "cypher_gds_pagerank": _q_cypher_gds_pagerank,
        "cypher_gds_closeness": _q_cypher_gds_closeness,
        "gen_rmat_graph": _q_gen_rmat_graph,
        "gen_uniform_graph": _q_gen_uniform_graph,
        "gen_ws_graph": _q_gen_ws_graph,
        "a5_top_words": _q_a5_top_words,
        "a7_token_f1": _q_a7_token_f1,
        "w1_topk_smallest": _q_w1_topk_smallest,
        "w3_null_inf_sort": _q_w3_null_inf_sort,
        "w4_last_k_interactions": _q_w4_last_k,
        "f1_f4_chunking": _q_chunking,
        "f4_unicode_tokens": _q_f4_unicode_tokens,
        "f5_content_id": _q_f5_content_id,
        "f6_normalize_name": _q_f6_normalize,
        "f7_calendar_fields": _q_f7_calendar,
        "f10_title_synthesis": _q_f10_title,
        "p6_json_extract": _q_p6_json_extract,
        "a2_triangle_clustering": _q_a2_triangle_clustering,
        "a2_random_walks": _q_a2_random_walks,
        "a2_walk_skipgrams": _q_a2_walk_skipgrams,
        "a2_harmonic_closeness": _q_a2_harmonic_closeness,
        "a2_shortest_path_counts": _q_a2_shortest_path_counts,
        "a2_betweenness": _q_a2_betweenness,
        "a2_node2vec_walks": _q_a2_node2vec_walks,
        "a2_incremental_components": _q_a2_incremental_components,
        "a2_label_propagation": _q_a2_label_propagation,
        "a2_node_similarity": _q_a2_node_similarity,
        "a2_hyperanf": _q_a2_hyperanf,
        "dedup_jaccard_pairs": _q_dedup_jaccard,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding_lsh": _q_dedup_embedding_lsh,
        "quality_features": _q_quality_features,
        "language_id": _q_language_id,
        "doc_fingerprint": _q_fingerprint,
        "bpe_token_counts": _q_bpe_token_counts,
        "td_dsir_resample": _q_td_dsir_resample,
        "s1_ingest_identify": _q_s1_ingest,
        "s3_classify_documents": _q_s3_classify,
        "s4_column_values": _q_s4_column_values,
        "s5_schema_only": _q_s5_schema_only,
        "u12_ontology_resolve": _q_ontology_resolve,
        "u_regex_entities": _q_regex_entities,
        "edge_weights_flatten": _q_edge_weights_flatten,
        "mm_frame_sample": _q_frame_sample,
        "mm_resize_plan": _q_resize_plan,
        "a2_component_sizes": _q_a2_component_sizes,
        "insights_exact_node": _q_insights_exact,
        "temporal_search_e2e": _q_temporal_search,
        "natural_language_search": _q_natural_language,
        "td_hash_sample": _q_td_hash_sample,
        "td_stratified_sample": _q_td_stratified_sample,
        "td_decontaminate": _q_td_decontaminate,
        "td_pii_redact": _q_td_pii_redact,
        "td_corpus_stats": _q_td_corpus_stats,
        "td_repetition": _q_td_repetition,
        "td_gopher_filter": _q_td_gopher_filter,
        "a2_modularity": _q_a2_modularity,
        "a2_sssp_paths": _q_a2_sssp_paths,
        "a2_ktruss": _q_a2_ktruss,
        "a2_neighbor_sample": _q_a2_neighbor_sample,
        "a2_link_prediction": _q_a2_link_prediction,
        "textrank_keywords": _q_textrank_keywords,
        "a2_louvain": _q_a2_louvain,
        "pq_topk": _q_pq_topk,
        "knn_quantized": _q_knn_quantized,
        "mm_jpeg_progressive": _q_mm_jpeg_progressive,
        "s2_office_text": _q_s2_office_text,
        "graph_completion_context": _q_graph_completion_context,
        "u7_cot_triplets": _q_u7_cot_triplets,
        "u8_context_extension_triplets": _q_u8_context_extension_triplets,
        "graph_completion_e2e": _q_graph_completion_e2e,
        "td_unigram_logprob": _q_td_unigram_logprob,
        "td_weighted_sample": _q_td_weighted_sample,
        "td_shuffle_shards": _q_td_shuffle_shards,
        "td_duplicate_spans": _q_td_duplicate_spans,
        "td_c4_line_filter": _q_td_c4_line_filter,
        "td_quality_score": _q_td_quality_score,
        "bm25_topk": _q_bm25_topk,
        "s4_node_counts": _q_s4_node_counts,
        "a3_node_degrees": _q_a3_node_degrees,
        "j6_k_hop": _q_j6_k_hop,
        "j5_triplet_scores": _q_j5_triplet_scores,
        "v1_knn": _q_v1_knn,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "w2_lexical_chunks": _q_w2_lexical_chunks,
        "a1_edge_type_frequency": _q_a1_edge_type_frequency,
        "a4_disconnected_nodes": _q_a4_disconnected,
        "a6_distinct_schema": _q_a6_distinct_schema,
        "p2_attribute_filter": _q_p2_attribute_filter,
        "p5_valid_edges": _q_p5_valid_edges,
        "j1_neighbors": _q_j1_neighbors,
        "j2_connections": _q_j2_connections,
        "j3_has_edges": _q_j3_has_edges,
        "j4_nodeset_subgraph": _q_j4_nodeset_subgraph,
        "so3_induced_edges": _q_so3_induced_edges,
        "j7_cascade_delete_set": _q_j7_cascade,
        "j9_temporal_range_join": _q_j9_temporal_range,
        "v2_batch_knn": _q_v2_batch_knn,
        "v2_batch_knn_agg": _q_v2_batch_knn_agg,
        "v3_minmax_normalize": _q_v3_minmax,
        "p4_score_threshold": _q_p4_score_threshold,
        "v4_point_lookup": _q_v4_point_lookup,
        "v6_multi_collection_knn": _q_v6_multi_collection,
        "so1_union_dedup": _q_so1_union_dedup,
        "ann_lsh_topk": _q_ann_lsh,
        # -- r12-new entries (first driver proof leads the r13 window) -------
        # gds.kmeans: SemDeDup's spherical k-means core extracted as the
        # public clustering operator + the CALL gds.kmeans.stream route
        "a2_kmeans": _q_a2_kmeans,
        # composed curation: gopher quality -> DBSCAN topic islands ->
        # cluster-balanced cap, one oracle over the three proven fragments
        "td_curate_clustered": _q_td_curate_clustered,
        # gds.knn + gds.conductance through the CALL surface (property-
        # carrying projections, guarded exact semantics)
        "cypher_gds_knn": _q_cypher_gds_knn,
        "cypher_gds_conductance": _q_cypher_gds_conductance,
        # gds.fastRP: very-sparse random projection embeddings (Chen et al.
        # 2019), GDS's default embedding procedure, CALL-routed with the
        # typed config map ({embeddingDimension, iterationWeights,
        # randomSeed})
        "a2_fastrp": _q_a2_fastrp,
        # gds.shortestPath.dijkstra through the CALL surface (typed config:
        # sourceNode + relationshipWeightProperty off the edge properties
        # map)
        "cypher_gds_dijkstra": _q_cypher_gds_dijkstra,
        # the gds.graph.* projection catalog end-to-end (project with the
        # reference's nested orientation map -> metric against the cached
        # name -> drop)
        "cypher_gds_catalog": _q_cypher_gds_catalog,
        # mutate mode: wcc.mutate writes componentId back into the cached
        # projection, conductance.stream reads it — closed-form all-zero
        # oracle (components have no boundary)
        "cypher_gds_mutate_chain": _q_cypher_gds_mutate_chain,
        # r12c CALL-surface additions (routes + operator proven in one row
        # each): gds.scaleProperties (operators/scaling.py — MinMax through
        # the CALL surface, order-free MIN/MAX statistics), gds.modularity
        # (the a2_modularity integer arithmetic reached through CALL), and
        # gds.spanningTree (Borůvka MSF + rooted BFS; FK forest makes every
        # parent structurally forced)
        "cypher_gds_scale_properties": _q_cypher_gds_scale_properties,
        "cypher_gds_modularity": _q_cypher_gds_modularity,
        "cypher_gds_spanning": _q_cypher_gds_spanning,
        # BPE vocabulary training (operators/bpe.py): the first-round merge
        # argmax stream, exact integer counts
        "td_bpe_pairs": _q_td_bpe_pairs,
    }
    return {name: _with_shipping(fn) for name, fn in raw.items()}


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------


def _minhash_ctes(num_hashes: int, bands: int, source: str = "documents") -> tuple[str, str]:
    """(cte_chain, est_jaccard_expr): the MinHash+LSH pipeline as prefixed
    CTEs over ``source`` — reused by the standalone oracle AND the composed
    curation-chain oracle.  mh_cands carries both signatures so the estimate
    is computed once in the consumer."""
    rows = num_hashes // bands
    h_exprs = ",\n      ".join(
        f"min({_md5_64('shingle', i)}) AS h{i}" for i in range(num_hashes)
    )
    band_selects = "\n      UNION ALL ".join(
        "SELECT id, {hcols}, {bucket} AS bucket, {b} AS band FROM mh_sig".format(
            hcols=", ".join(f"h{i}" for i in range(num_hashes)),
            bucket=_md5_64(
                "concat_ws(',', "
                + ", ".join(f"CAST(h{b * rows + r} AS VARCHAR)" for r in range(rows))
                + ")",
                b,
            ),
            b=b,
        )
        for b in range(bands)
    )
    matches = " + ".join(f"(CASE WHEN ah{i} = bh{i} THEN 1 ELSE 0 END)" for i in range(num_hashes))
    toks = _TOK.format(c="text")
    ctes = f"""mh_toks AS (SELECT doc_id AS id, {toks} AS t FROM {source}),
mh_sh AS (
  SELECT id, unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                   i -> array_to_string(t[i:i+2], ' '))) AS shingle
  FROM mh_toks
),
mh_sig AS (SELECT id, {h_exprs} FROM mh_sh GROUP BY id),
mh_bands AS ({band_selects}),
mh_cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         {", ".join(f"a.h{i} AS ah{i}, b.h{i} AS bh{i}" for i in range(num_hashes))}
  FROM mh_bands a JOIN mh_bands b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
)"""
    est = f"round(({matches}) / {num_hashes}.0, 6)"
    return ctes, est


def _minhash_sql(num_hashes: int, bands: int, threshold: float) -> str:
    ctes, est = _minhash_ctes(num_hashes, bands)
    return f"""
WITH {ctes}
SELECT id_a, id_b, {est} AS est_jaccard
FROM mh_cands
WHERE {est} >= {threshold}
"""


def _simhash_sql(bits: int) -> str:
    toks = _TOK.format(c="text")
    bitsums = ", ".join(
        f"sum(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(bits)
    )
    total = " + ".join(f"(CASE WHEN b{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(bits))
    return f"""
WITH toks AS (SELECT doc_id AS id, unnest({toks}) AS token FROM documents),
hashed AS (SELECT id, {_md5_64('token', 0)} AS h FROM toks),
bitsums AS (SELECT id, {bitsums} FROM hashed GROUP BY id)
SELECT id, CAST({total} AS BIGINT) AS simhash FROM bitsums
"""


def _cognify_graph_sql(limit: int) -> str:
    """CTE chain restating the FULL cognify build (plans/cognify.py) over the
    first ``limit`` documents: chunks (exact 256-word blocks — the corpus has
    no sentence enders), the mock extraction (first 8 distinct words len>=5
    per chunk, typed by first letter, consecutive-pair co_occurs edges),
    content-addressed ids (md5 over chr(31)-joined parts, ids.py:content_id),
    summaries (first 200 chars of the stripped chunk text), the deduped edge
    set, the (id, name) node lookup, and the five embedding collections as
    DENSE 64-element hash vectors with float32-cast elements — dense so
    DuckDB's list_dot_product folds in the same index order as
    functions/vectors.py:dot, making every downstream double bit-identical."""
    return f"""cg_d AS (SELECT doc_id, text FROM documents LIMIT {limit}),
cg_w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS nw
  FROM cg_d
),
cg_ch AS (
  SELECT doc_id, k,
         ws[k * 256 + 1 : least((k + 1) * 256, nw)] AS cws,
         (k + 1) * 256 >= nw AS is_last
  FROM cg_w, unnest(range(0, CAST(ceil(nw / 256.0) AS BIGINT))) AS ks(k)
),
cg_chunk AS MATERIALIZED (
  SELECT doc_id, k, cws,
         array_to_string(cws, ' ') || CASE WHEN is_last THEN '' ELSE ' ' END AS ctext,
         md5(array_to_string(cws, ' ') || CASE WHEN is_last THEN '' ELSE ' ' END) AS chunk_id
  FROM cg_ch
),
cg_tok AS MATERIALIZED (
  SELECT chunk_id, cws[i] AS tok, i
  FROM (SELECT DISTINCT chunk_id, cws FROM cg_chunk) c, unnest(range(1, len(cws) + 1)) AS u(i)
  WHERE length(cws[i]) >= 5
),
cg_first AS (SELECT chunk_id, tok, min(i) AS fi FROM cg_tok GROUP BY chunk_id, tok),
cg_ent8 AS MATERIALIZED (
  SELECT chunk_id, tok, rn
  FROM (SELECT *, row_number() OVER (PARTITION BY chunk_id ORDER BY fi) AS rn FROM cg_first)
  WHERE rn <= 8
),
cg_cooc AS MATERIALIZED (
  SELECT a.chunk_id, a.tok AS sname, b.tok AS dname
  FROM cg_ent8 a JOIN cg_ent8 b ON a.chunk_id = b.chunk_id AND b.rn = a.rn + 1
),
cg_edges AS MATERIALIZED (
  SELECT DISTINCT src, dst, relationship_name FROM (
    SELECT chunk_id AS src, 'doc:' || CAST(doc_id AS VARCHAR) AS dst, 'is_part_of' AS relationship_name FROM cg_chunk
    UNION ALL SELECT chunk_id, md5('Entity' || chr(31) || tok), 'contains' FROM cg_ent8
    UNION ALL SELECT md5('Entity' || chr(31) || tok), md5('EntityType' || chr(31) || 'Type_' || substr(tok, 1, 1)), 'is_a' FROM cg_ent8
    UNION ALL SELECT md5('TextSummary' || chr(31) || chunk_id), chunk_id, 'made_from' FROM (SELECT DISTINCT chunk_id FROM cg_chunk)
    UNION ALL SELECT md5('Entity' || chr(31) || sname), md5('Entity' || chr(31) || dname), 'co_occurs' FROM cg_cooc
  ) u
),
cg_nodes AS MATERIALIZED (
  SELECT DISTINCT id, name FROM (
    SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS id, CAST(doc_id AS VARCHAR) AS name FROM cg_d
    UNION ALL SELECT DISTINCT chunk_id, chunk_id FROM cg_chunk
    UNION ALL SELECT DISTINCT md5('Entity' || chr(31) || tok), tok FROM cg_ent8
    UNION ALL SELECT DISTINCT md5('EntityType' || chr(31) || 'Type_' || substr(tok, 1, 1)), 'Type_' || substr(tok, 1, 1) FROM cg_ent8
    UNION ALL SELECT DISTINCT md5('TextSummary' || chr(31) || chunk_id), substr(trim(ctext), 1, 200) FROM cg_chunk
  ) u
),
cg_embrows AS MATERIALIZED (
  SELECT 'DocumentChunk_text' AS collection, chunk_id AS id, ctext AS txt FROM (SELECT DISTINCT chunk_id, ctext FROM cg_chunk)
  UNION ALL SELECT 'Entity_name', md5('Entity' || chr(31) || tok), tok FROM (SELECT DISTINCT tok FROM cg_ent8)
  UNION ALL SELECT 'EntityType_name', md5('EntityType' || chr(31) || tname), tname FROM (SELECT DISTINCT 'Type_' || substr(tok, 1, 1) AS tname FROM cg_ent8)
  UNION ALL SELECT 'TextSummary_text', md5('TextSummary' || chr(31) || chunk_id), substr(trim(ctext), 1, 200) FROM (SELECT DISTINCT chunk_id, ctext FROM cg_chunk)
  UNION ALL SELECT 'EdgeType_relationship_name', md5('EdgeType' || chr(31) || relationship_name), relationship_name FROM (SELECT DISTINCT relationship_name FROM cg_edges)
),
cg_vb AS (
  SELECT collection, id,
         CAST(concat('0x', substr(md5(tok), 1, 8)) AS UBIGINT) % 64 AS b, count(*) AS c
  FROM (SELECT collection, id, unnest(list_filter(regexp_split_to_array(lower(txt), '[^a-z0-9]+'), x -> x != '')) AS tok FROM cg_embrows) t
  GROUP BY collection, id, b
),
cg_vec AS MATERIALIZED (
  SELECT collection, id,
         list_transform(range(0, 64), i -> CAST(CAST(CAST(coalesce(mp[i][1], 0) AS DOUBLE) / n AS FLOAT) AS DOUBLE)) AS v
  FROM (SELECT collection, id, map(list(b), list(c)) AS mp, sqrt(sum(c * c)) AS n FROM cg_vb GROUP BY collection, id)
)"""


def _triplet_search_sql(prefix: str, query_text: str | None, k: int, qv_from: str | None = None) -> str:
    """Per-query CTEs over the _cognify_graph_sql frames: query vector
    (HashEmbedder doubles inlined as literals — the Spark side embeds the
    query driver-side in Python, so the literal IS the same doubles; or,
    with ``qv_from``, taken from a previously computed CTE for
    data-dependent queries like U8's completion feedback), cosine
    distances, per-collection min-max normalize (vector/utils.py semantics:
    all-equal -> 0.0), per-node min across collections, edge-type scores, and
    the top-k by (raw score, src, dst, relationship_name) — the
    triplet_score_join total order."""
    from cognee_graphdb_spark.llm.embedder import HashEmbedder

    if qv_from is not None:
        q_cte = f"{prefix}q AS (SELECT qv FROM {qv_from})"
    else:
        qv = HashEmbedder(64).embed(query_text)
        lit = "[" + ", ".join(repr(float(x)) for x in qv) + "]::DOUBLE[]"
        q_cte = f"{prefix}q AS (SELECT {lit} AS qv)"
    return f"""{q_cte},
{prefix}dist AS (
  SELECT collection, id,
         1.0 - list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS d
  FROM cg_vec, {prefix}q
),
{prefix}norm AS (
  SELECT collection, id,
         CASE WHEN maxd = mind THEN 0.0 ELSE (d - mind) / (maxd - mind) END AS score
  FROM (SELECT *, min(d) OVER (PARTITION BY collection) AS mind,
               max(d) OVER (PARTITION BY collection) AS maxd FROM {prefix}dist)
),
{prefix}ns AS (
  SELECT id, min(score) AS score FROM {prefix}norm
  WHERE collection <> 'EdgeType_relationship_name' GROUP BY id
),
{prefix}ets AS (
  SELECT e.txt AS relationship_name, n.score
  FROM {prefix}norm n JOIN cg_embrows e ON n.collection = e.collection AND n.id = e.id
  WHERE n.collection = 'EdgeType_relationship_name'
),
{prefix}top AS (
  SELECT e.src, e.dst, e.relationship_name,
         coalesce(s1.score, 1.0) + coalesce(s2.score, 1.0) + coalesce(t.score, 1.0) AS raw
  FROM cg_edges e
  LEFT JOIN {prefix}ns s1 ON e.src = s1.id
  LEFT JOIN {prefix}ns s2 ON e.dst = s2.id
  LEFT JOIN {prefix}ets t ON e.relationship_name = t.relationship_name
  ORDER BY raw, e.src, e.dst, e.relationship_name LIMIT {k}
)"""


def _u8_title_ctes() -> str:
    """Per-node rendered-title/content LENGTHS for render_triplets
    (plans/triplet_search.py:render_triplets + _py_title): text nodes get
    title = first-7-words + '... [' + top-7 non-stopword tokens by
    (count desc, first occurrence) + ']' (Counter.most_common tie order) and
    content = the text; doc nodes (no embedding text) use their name for
    both.  Only LENGTHS are needed (the mock completion echoes the prompt
    length), so node order inside the render never matters."""
    from cognee_graphdb_spark.functions.text import STOP_WORDS

    sw = ", ".join(f"'{w}'" for w in STOP_WORDS)
    return f"""u8_node_text AS (
  SELECT 'doc:' || CAST(doc_id AS VARCHAR) AS id, CAST(doc_id AS VARCHAR) AS name, NULL AS txt FROM cg_d
  UNION ALL SELECT chunk_id, chunk_id, ctext FROM (SELECT DISTINCT chunk_id, ctext FROM cg_chunk)
  UNION ALL SELECT md5('Entity' || chr(31) || tok), tok, tok FROM (SELECT DISTINCT tok FROM cg_ent8)
  UNION ALL SELECT md5('EntityType' || chr(31) || tname), tname, tname FROM (SELECT DISTINCT 'Type_' || substr(tok, 1, 1) AS tname FROM cg_ent8)
  UNION ALL SELECT md5('TextSummary' || chr(31) || chunk_id), substr(trim(ctext), 1, 200), substr(trim(ctext), 1, 200) FROM (SELECT DISTINCT chunk_id, ctext FROM cg_chunk)
),
u8_toks AS (
  SELECT id, list_filter(string_split(txt, ' '), x -> x != '') AS toks
  FROM u8_node_text WHERE txt IS NOT NULL
),
u8_first AS (SELECT id, length(array_to_string(toks[1:7], ' ')) AS first_len FROM u8_toks),
u8_tw AS (
  SELECT id, lower(toks[i]) AS w, i
  FROM u8_toks, unnest(range(1, len(toks) + 1)) AS u(i)
  WHERE lower(toks[i]) NOT IN ({sw})
),
u8_wc AS (SELECT id, w, count(*) AS cnt, min(i) AS fi FROM u8_tw GROUP BY id, w),
u8_top AS (
  SELECT id, SUM(length(w)) + 2 * (count(*) - 1) AS top_len
  FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY cnt DESC, fi ASC) AS rn FROM u8_wc)
  WHERE rn <= 7 GROUP BY id
),
u8_title AS MATERIALIZED (
  SELECT nt.id,
         CASE WHEN nt.txt IS NULL THEN length(nt.name)
              ELSE f.first_len + 5 + coalesce(tp.top_len, 0) + 1 END AS title_len,
         CASE WHEN nt.txt IS NULL THEN length(nt.name) ELSE length(nt.txt) END AS content_len
  FROM u8_node_text nt
  LEFT JOIN u8_first f ON nt.id = f.id
  LEFT JOIN u8_top tp ON nt.id = tp.id
)"""


def _u8_prompt_len_cte(name: str, keys_cte: str) -> str:
    """``{name}`` = one row (n) with the mock-completion prompt length for
    the triplet set ``keys_cte``: 38 (the 'Answer 'q' using:\\n' prefix for
    U8's query) + len(render_triplets(...)) — Nodes section (52 fixed chars
    + title + content per distinct node, newline-joined) + the fixed
    'Nodes:'/'Connections:' scaffolding (7 + 15) + one connection line per
    triplet row (9 fixed chars + titles + relationship name)."""
    return f"""{name}_nodes AS (
  SELECT DISTINCT id FROM (SELECT src AS id FROM {keys_cte} UNION ALL SELECT dst FROM {keys_cte}) u
),
{name} AS (
  SELECT CAST(38 + 7
       + (SELECT SUM(52 + t.title_len + t.content_len) + COUNT(*) - 1
          FROM u8_title t JOIN {name}_nodes n ON t.id = n.id)
       + 15
       + (SELECT SUM(9 + ts.title_len + length(e.relationship_name) + td.title_len) + COUNT(*) - 1
          FROM {keys_cte} e
          JOIN u8_title ts ON e.src = ts.id
          JOIN u8_title td ON e.dst = td.id) AS BIGINT) AS n
)"""


def _u8_dyn_qv_ctes(prefix: str, n_from: str) -> str:
    """Hash-embed the data-dependent query 'MOCK_COMPLETION[n]' (lowercased
    tokens: mock, completion, str(n)) as a dense 64-vector — exact-integer
    counts and norms, so the doubles match the Spark driver's HashEmbedder
    bit-for-bit."""
    return f"""{prefix}tok AS (
  SELECT unnest(['mock', 'completion', CAST((SELECT n FROM {n_from}) AS VARCHAR)]) AS tok
),
{prefix}b AS (
  SELECT CAST(concat('0x', substr(md5(tok), 1, 8)) AS UBIGINT) % 64 AS b, count(*) AS c
  FROM {prefix}tok GROUP BY b
),
{prefix}qv AS (
  SELECT list_transform(range(0, 64), i -> CAST(coalesce(mp[i][1], 0) AS DOUBLE) / n) AS qv
  FROM (SELECT map(list(b), list(c)) AS mp, sqrt(sum(c * c)) AS n FROM {prefix}b)
)"""


def _hyperplane_bucket_sql(vec_expr: str, bits: int, dim: int) -> str:
    from cognee_graphdb_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(bits, dim)
    terms = []
    for i, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]::DOUBLE[]"
        terms.append(f"(CASE WHEN list_dot_product({vec_expr}, {lit}) > 0 THEN {2**i} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def oracle_sql() -> dict[str, str]:
    g = _graph_cte()
    cosd_q = _cosd("e.v", "q.qv")
    tok = _TOK.format(c="text")
    emb_d = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
    from cognee_graphdb_spark.operators.text_analysis import LANG_MARKERS

    lang_counts = {
        lang: f"len(list_filter(t, x -> x IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = "greatest(" + ", ".join(f"c_{k}" for k in lang_counts) + ")"
    lang_case = " ".join(f"WHEN c_{k} = best THEN '{k}'" for k in lang_counts)
    from cognee_graphdb_spark.functions.text import STOP_WORDS

    stop_in = ", ".join(repr(w) for w in STOP_WORDS)
    punct = "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]"
    punct = punct.replace("'", "''")  # escape for the SQL string literal

    sql: dict[str, str] = {}

    sql["s4_node_counts"] = f"WITH {g} SELECT type, count(*) AS n FROM nodes GROUP BY type"

    sql["a1_edge_type_frequency"] = (
        f"WITH {g} SELECT relationship_name, count(*) AS number_of_edges FROM edges GROUP BY relationship_name"
    )

    sql["a3_node_degrees"] = f"""WITH {g},
ends AS (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)
SELECT id, count(*) AS degree FROM ends GROUP BY id"""

    sql["a3_degree_one_nodes"] = f"""WITH {g},
fk AS (SELECT * FROM edges WHERE relationship_name = 'c_nationkey'),
ends AS (SELECT src AS id FROM fk UNION ALL SELECT dst FROM fk),
deg AS (SELECT id, count(*) AS degree FROM ends GROUP BY id HAVING count(*) = 1)
SELECT n.id, n.name, n.type FROM nodes n JOIN deg USING (id)"""

    sql["a4_disconnected_nodes"] = f"""WITH {g},
fk AS (SELECT * FROM edges WHERE relationship_name != 'is_part_of'),
ends AS (SELECT DISTINCT src AS id FROM fk UNION SELECT DISTINCT dst FROM fk)
SELECT id, name, type FROM nodes WHERE id NOT IN (SELECT id FROM ends)"""

    sql["a6_distinct_schema"] = f"""WITH {g}
SELECT DISTINCT 'node_type' AS kind, type AS value FROM nodes
UNION SELECT DISTINCT 'relationship', relationship_name FROM edges"""

    sql["p2_attribute_filter"] = f"""WITH {g},
fnodes AS (SELECT * FROM nodes WHERE type IN ('TableRow') AND name IN ('nation', 'region')),
fedges AS (
  SELECT e.* FROM edges e
  WHERE e.src IN (SELECT id FROM fnodes) AND e.dst IN (SELECT id FROM fnodes)
),
outdeg AS (SELECT src AS id, count(*) AS out_edges FROM fedges GROUP BY src)
SELECT f.id, f.name, coalesce(o.out_edges, 0) AS out_edges FROM fnodes f LEFT JOIN outdeg o USING (id)"""

    sql["p5_valid_edges"] = f"""WITH {g},
pruned AS (SELECT id FROM nodes WHERE name != 'part'),
ve AS (SELECT e.* FROM edges e WHERE e.src IN (SELECT id FROM pruned) AND e.dst IN (SELECT id FROM pruned))
SELECT relationship_name, count(*) AS n FROM ve GROUP BY relationship_name"""

    sql["j1_neighbors"] = f"""WITH {g}
SELECT DISTINCT neighbor_id FROM (
  SELECT dst AS neighbor_id FROM edges WHERE src = 'customer:1'
  UNION ALL SELECT src FROM edges WHERE dst = 'customer:1'
) u"""

    sql["j2_connections"] = f"""WITH {g},
incident AS (SELECT src, dst, relationship_name FROM edges WHERE src = 'nation:7' OR dst = 'nation:7')
SELECT i.src, ns.name AS src_name, i.relationship_name, i.dst, nd.name AS dst_name
FROM incident i JOIN nodes ns ON i.src = ns.id JOIN nodes nd ON i.dst = nd.id"""

    sql["j3_has_edges"] = f"""WITH {g},
cands AS (
  SELECT 'orders:' || CAST(o_orderkey AS VARCHAR) AS src,
         'customer:' || CAST(o_custkey AS VARCHAR) AS dst,
         'o_custkey' AS relationship_name
  FROM orders WHERE o_orderkey <= 20
  UNION ALL SELECT 'orders:1', 'nation:0', 'bogus'
)
SELECT DISTINCT e.src, e.dst, e.relationship_name
FROM edges e JOIN cands c USING (src, dst, relationship_name)"""

    sql["j4_nodeset_subgraph"] = f"""WITH {g},
seed AS (SELECT id FROM nodes WHERE type = 'TableRow' AND name IN ('region')),
frontier AS (
  SELECT dst AS id FROM edges WHERE src IN (SELECT id FROM seed)
  UNION ALL SELECT src FROM edges WHERE dst IN (SELECT id FROM seed)
),
members AS (SELECT DISTINCT id FROM (SELECT id FROM seed UNION ALL SELECT id FROM frontier) u)
SELECT src, dst, relationship_name FROM edges
WHERE src IN (SELECT id FROM members) AND dst IN (SELECT id FROM members)"""

    sql["j6_k_hop"] = f"""WITH {g},
sym AS (SELECT src AS u, dst AS v FROM edges UNION ALL SELECT dst, src FROM edges),
seeds AS (SELECT 'region:0' AS id UNION ALL SELECT 'region:1'),
v1 AS (SELECT id FROM seeds UNION SELECT v FROM sym WHERE u IN (SELECT id FROM seeds)),
v2 AS (SELECT id FROM v1 UNION SELECT v FROM sym WHERE u IN (SELECT id FROM v1))
SELECT id FROM v2"""

    sql["so3_induced_edges"] = f"""WITH {g},
ids AS (SELECT id FROM nodes WHERE type = 'TableRow' AND name IN ('nation', 'region'))
SELECT src, dst, relationship_name FROM edges
WHERE src IN (SELECT id FROM ids) AND dst IN (SELECT id FROM ids)"""

    sql["j5_triplet_scores"] = f"""WITH {g},
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scores AS (
  SELECT 'customer:' || CAST(e.vec_id AS VARCHAR) AS id, round({_cosd('(e.embedding::DOUBLE[])', 'q.qv')}, 6) AS score
  FROM embeddings e, q
),
ets AS (
  SELECT relationship_name, round(length(relationship_name) / 20.0, 6) AS score
  FROM (SELECT DISTINCT relationship_name FROM edges) r
),
scored AS (
  SELECT e.src, e.dst, e.relationship_name,
         coalesce(s1.score, 1.0) + coalesce(s2.score, 1.0) + coalesce(t.score, 1.0) AS raw
  FROM edges e
  LEFT JOIN scores s1 ON e.src = s1.id
  LEFT JOIN scores s2 ON e.dst = s2.id
  LEFT JOIN ets t ON e.relationship_name = t.relationship_name
)
SELECT src, dst, relationship_name, round(raw, 4) AS triplet_score
FROM scored ORDER BY raw, src, dst, relationship_name LIMIT 50"""

    sql["j7_cascade_delete_set"] = f"""WITH {_J7_SQL_EDGES},
doc AS (SELECT 'doc:7' AS id),
chunks AS (SELECT DISTINCT src AS id FROM j7_edges WHERE relationship_name = 'is_part_of' AND dst = 'doc:7'),
summaries AS (
  SELECT DISTINCT src AS id FROM j7_edges
  WHERE relationship_name = 'made_from' AND dst IN (SELECT id FROM chunks)
),
ents AS (
  SELECT DISTINCT dst AS id FROM j7_edges
  WHERE relationship_name = 'contains' AND src IN (SELECT id FROM chunks)
),
other_chunks AS (
  SELECT DISTINCT src AS id FROM j7_edges WHERE relationship_name = 'is_part_of' AND dst != 'doc:7'
),
ents_elsewhere AS (
  SELECT DISTINCT dst AS id FROM j7_edges
  WHERE relationship_name = 'contains' AND src IN (SELECT id FROM other_chunks)
),
orphan_ents AS (SELECT id FROM ents WHERE id NOT IN (SELECT id FROM ents_elsewhere)),
types_of_deleted AS (
  SELECT DISTINCT dst AS id FROM j7_edges
  WHERE relationship_name = 'is_a' AND src IN (SELECT id FROM orphan_ents)
),
types_with_survivors AS (
  SELECT DISTINCT dst AS id FROM j7_edges
  WHERE relationship_name = 'is_a' AND src NOT IN (SELECT id FROM orphan_ents)
),
orphan_types AS (SELECT id FROM types_of_deleted WHERE id NOT IN (SELECT id FROM types_with_survivors))
SELECT DISTINCT id FROM (
  SELECT id FROM doc UNION ALL SELECT id FROM chunks UNION ALL SELECT id FROM summaries
  UNION ALL SELECT id FROM orphan_ents UNION ALL SELECT id FROM orphan_types
) u"""

    sql["j9_temporal_range_join"] = """
WITH ts AS (SELECT 'ts:' || CAST(event_id AS VARCHAR) AS id, CAST(floor(epoch(ts)) AS BIGINT) AS time_at FROM events),
ee AS (SELECT 'ev:' || CAST(event_id AS VARCHAR) AS src, 'ts:' || CAST(event_id AS VARCHAR) AS dst, 'at' AS relationship_name FROM events),
hits AS (SELECT id FROM ts WHERE time_at BETWEEN 1704844800 AND 1705708800)
SELECT DISTINCT src AS event_id FROM ee WHERE relationship_name = 'at' AND dst IN (SELECT id FROM hits)"""

    sql["v1_knn"] = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
e AS ({emb_d})
SELECT vec_id, round({cosd_q}, 6) AS distance FROM e, q
ORDER BY {cosd_q}, vec_id LIMIT 10"""

    batch_sql = f"""
WITH qs AS (SELECT CAST(vec_id AS VARCHAR) AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id IN (1, 3, 5, 7, 9)),
e AS ({emb_d}),
scored AS (
  SELECT qs.query_id, e.vec_id, {_cosd('e.v', 'qs.qv')} AS d,
         row_number() OVER (PARTITION BY qs.query_id ORDER BY {_cosd('e.v', 'qs.qv')}, e.vec_id) AS rk
  FROM e, qs
)
SELECT query_id, vec_id, round(d, 6) AS distance FROM scored WHERE rk <= 3"""
    sql["v2_batch_knn"] = batch_sql
    sql["v2_batch_knn_agg"] = f"""
WITH qs AS (SELECT CAST(vec_id AS VARCHAR) AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id IN (1, 3, 5, 7, 9)),
e AS (SELECT CAST(vec_id AS VARCHAR) AS vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT qs.query_id, e.vec_id, {_cosd('e.v', 'qs.qv')} AS d,
         row_number() OVER (PARTITION BY qs.query_id ORDER BY {_cosd('e.v', 'qs.qv')}, e.vec_id) AS rk
  FROM e, qs
)
SELECT query_id, vec_id, round(d, 6) AS distance FROM scored WHERE rk <= 3"""

    sql["v3_minmax_normalize"] = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
e AS ({emb_d}),
scored AS (SELECT vec_id, {cosd_q} AS d FROM e, q),
mm AS (SELECT vec_id, d, min(d) OVER () AS lo, max(d) OVER () AS hi FROM scored)
SELECT vec_id, round(CASE WHEN hi = lo THEN 0.0 ELSE (d - lo) / (hi - lo) END, 6) AS distance FROM mm"""

    sql["p4_score_threshold"] = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
e AS ({emb_d}),
scored AS (SELECT vec_id, {cosd_q} AS d FROM e, q),
mm AS (SELECT vec_id, d, min(d) OVER () AS lo, max(d) OVER () AS hi FROM scored),
norm AS (SELECT vec_id, round(CASE WHEN hi = lo THEN 0.0 ELSE (d - lo) / (hi - lo) END, 6) AS distance FROM mm)
SELECT vec_id, distance FROM norm WHERE distance < 0.5"""

    sql["v4_point_lookup"] = "SELECT vec_id, label FROM embeddings WHERE vec_id IN (5, 105, 205)"

    sql["v6_multi_collection_knn"] = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
e AS (SELECT 'c' || CAST(label % 3 AS VARCHAR) AS collection, vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT collection, vec_id, {cosd_q} AS d,
         row_number() OVER (PARTITION BY collection ORDER BY {cosd_q}, vec_id) AS rk
  FROM e, q
  WHERE collection IN ('c0', 'c1', 'c2')
)
SELECT collection, vec_id, round(d, 6) AS distance FROM scored WHERE rk <= 5"""

    sql["so1_union_dedup"] = f"""
WITH e AS ({emb_d}),
q7 AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
q11 AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 11),
a AS (SELECT vec_id, {_cosd('e.v', 'q7.qv')} AS d FROM e, q7 ORDER BY d, vec_id LIMIT 10),
b AS (SELECT vec_id, {_cosd('e.v', 'q11.qv')} AS d FROM e, q11 ORDER BY d, vec_id LIMIT 10)
SELECT vec_id, round(min(d), 6) AS distance FROM (SELECT * FROM a UNION ALL SELECT * FROM b) u GROUP BY vec_id"""

    sql["dedup_exact"] = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50
),
h AS (SELECT doc_id, md5(text) AS content_hash FROM docs2)
SELECT content_hash, count(*) AS dup_count, min(doc_id) AS keeper_id
FROM h GROUP BY content_hash HAVING count(*) > 1"""

    sql["dedup_jaccard_pairs"] = f"""
WITH toks AS (SELECT doc_id AS id, {tok} AS t FROM documents),
ts AS (SELECT DISTINCT id, unnest(t) AS token FROM toks),
sizes AS (SELECT id, count(*) AS sz FROM ts GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM ts a JOIN ts b USING (token) WHERE a.id < b.id GROUP BY 1, 2
),
j AS (
  SELECT id_a, id_b, round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
  FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.95"""

    # triangle clustering on the near-dup pair graph: DuckDB counts each
    # node's closed neighbor pairs naively (n1.dst < n2.dst => once per
    # unordered pair); the Spark side's degree-ordered orientation must
    # produce the SAME exact counts
    sql["a2_triangle_clustering"] = f"""
WITH toks AS (SELECT doc_id AS id, {tok} AS t FROM documents),
ts AS (SELECT DISTINCT id, unnest(t) AS token FROM toks),
sizes AS (SELECT id, count(*) AS sz FROM ts GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM ts a JOIN ts b USING (token) WHERE a.id < b.id GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
  WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.9
),
sym AS (
  SELECT CAST(id_a AS VARCHAR) AS src, CAST(id_b AS VARCHAR) AS dst FROM pairs
  UNION SELECT CAST(id_b AS VARCHAR), CAST(id_a AS VARCHAR) FROM pairs
),
deg AS (SELECT src AS id, count(*) AS deg FROM sym GROUP BY src),
tri AS (
  SELECT n1.src AS id, count(*) AS t
  FROM sym n1
  JOIN sym n2 ON n1.src = n2.src AND n1.dst < n2.dst
  JOIN sym e ON e.src = n1.dst AND e.dst = n2.dst
  GROUP BY n1.src
),
cl AS (
  SELECT d.id,
         CASE WHEN d.deg >= 2
              THEN round(2.0 * CAST(coalesce(t.t, 0) AS DOUBLE) / (d.deg * (d.deg - 1)), 6)
              ELSE 0.0 END AS clustering
  FROM deg d LEFT JOIN tri t USING (id)
)
SELECT clustering, CAST(count(*) AS BIGINT) AS n
FROM cl GROUP BY clustering ORDER BY clustering"""

    # k-truss of the same near-dup pair graph: 5 unrolled naive peel rounds
    # (support = plain wedge-join common-neighbor count; idempotent once the
    # fixpoint is reached, so unrolling past convergence is safe), then the
    # final support recount (operators/dense_subgraph.py:k_truss, k=3)
    _kt_pairs = """kt_toks AS (SELECT doc_id AS id, {tok} AS t FROM documents),
kt_ts AS (SELECT DISTINCT id, unnest(t) AS token FROM kt_toks),
kt_sizes AS (SELECT id, count(*) AS sz FROM kt_ts GROUP BY id),
kt_inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM kt_ts a JOIN kt_ts b USING (token) WHERE a.id < b.id GROUP BY 1, 2
),
kt0 AS MATERIALIZED (
  SELECT DISTINCT least(CAST(id_a AS VARCHAR), CAST(id_b AS VARCHAR)) AS u,
                  greatest(CAST(id_a AS VARCHAR), CAST(id_b AS VARCHAR)) AS v
  FROM kt_inter JOIN kt_sizes sa ON id_a = sa.id JOIN kt_sizes sb ON id_b = sb.id
  WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.9
)""".format(tok=tok)
    _kt_rounds = []
    for _i in range(1, 6):
        _kt_rounds.append(f"""ktu{_i - 1} AS (
  SELECT u AS x, v AS y FROM kt{_i - 1} UNION ALL SELECT v, u FROM kt{_i - 1}
), kts{_i} AS MATERIALIZED (
  SELECT a.x AS u, b.x AS v, count(*) AS c
  FROM ktu{_i - 1} a JOIN ktu{_i - 1} b ON a.y = b.y AND a.x < b.x
  GROUP BY 1, 2
), kt{_i} AS MATERIALIZED (
  SELECT e.u, e.v FROM kt{_i - 1} e
  LEFT JOIN kts{_i} s ON s.u = e.u AND s.v = e.v
  WHERE COALESCE(s.c, 0) >= 1
)""")
    sql["a2_ktruss"] = f"""WITH {_kt_pairs},
{", ".join(_kt_rounds)},
ktuf AS (SELECT u AS x, v AS y FROM kt5 UNION ALL SELECT v, u FROM kt5),
ktsf AS (
  SELECT a.x AS u, b.x AS v, count(*) AS c
  FROM ktuf a JOIN ktuf b ON a.y = b.y AND a.x < b.x
  GROUP BY 1, 2
)
SELECT e.u, e.v, CAST(COALESCE(s.c, 0) AS BIGINT) AS support
FROM kt5 e LEFT JOIN ktsf s ON s.u = e.u AND s.v = e.v"""

    sql["dedup_clusters"] = f"""
WITH RECURSIVE toks AS (SELECT doc_id AS id, {tok} AS t FROM documents),
ts AS (SELECT DISTINCT id, unnest(t) AS token FROM toks),
sizes AS (SELECT id, count(*) AS sz FROM ts GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM ts a JOIN ts b USING (token) WHERE a.id < b.id GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
  WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.95
),
ids AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS id FROM documents),
sym AS (
  SELECT CAST(id_a AS VARCHAR) AS a, CAST(id_b AS VARCHAR) AS b FROM pairs
  UNION SELECT CAST(id_b AS VARCHAR), CAST(id_a AS VARCHAR) FROM pairs
),
reach(a, b) AS (
  SELECT id, id FROM ids
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
)
SELECT a AS id, min(b) AS keeper_id FROM reach GROUP BY a"""

    sql["dedup_minhash_lsh"] = _minhash_sql(16, 8, 0.5)
    sql["dedup_simhash"] = _simhash_sql(16)

    # incremental registry: cross-batch pairs == full-run pairs of opposite
    # parity (band-bucket sharing is pairwise), normalized old-first
    sql["dedup_incremental_index"] = f"""
WITH fp AS ({_minhash_sql(16, 8, 0.5)})
SELECT CASE WHEN id_a % 2 = 0 THEN id_a ELSE id_b END AS id_old,
       CASE WHEN id_a % 2 = 0 THEN id_b ELSE id_a END AS id_new,
       est_jaccard
FROM fp WHERE (id_a % 2) <> (id_b % 2)"""

    coss = "(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))))"
    sql["dedup_embedding_exact"] = f"""
WITH e AS ({emb_d})
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({coss}, 6) AS cos_sim
FROM e a, e b
WHERE a.vec_id < b.vec_id AND round({coss}, 6) >= 0.4"""

    bucket = _hyperplane_bucket_sql("v", 4, 64)
    sql["dedup_embedding_lsh"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({coss}, 6) AS cos_sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({coss}, 6) >= 0.4"""

    sql["quality_features"] = f"""
WITH t AS (SELECT doc_id, text, {tok} AS toks FROM documents)
SELECT doc_id,
       length(text) AS n_chars,
       len(toks) AS n_words,
       round(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) * 1.0 / greatest(len(toks), 1), 4) AS mean_word_len,
       round((length(text) - (length(text) - length(regexp_replace(lower(text), '[a-z0-9]', '', 'g')))) * 1.0 / greatest(length(text), 1), 4) AS non_alnum_ratio,
       round(len(list_filter(toks, x -> x IN ({stop_in}))) * 1.0 / greatest(len(toks), 1), 4) AS stopword_ratio
FROM t"""

    sql["language_id"] = f"""
WITH t AS (SELECT doc_id, {tok} AS t FROM documents),
c AS (SELECT doc_id, {", ".join(f"{expr} AS c_{k}" for k, expr in lang_counts.items())} FROM t),
b AS (SELECT doc_id, {best} AS best, {", ".join(f"c_{k}" for k in lang_counts)} FROM c)
SELECT doc_id, CASE WHEN best = 0 THEN 'und' {lang_case} END AS pred_lang FROM b"""

    sql["doc_fingerprint"] = f"""
SELECT doc_id, md5(array_to_string({tok}, ' ')) AS fingerprint FROM documents"""

    # entity name near-duplicates (dedup.py:fuzzy_name_matches): same 3-gram
    # md5_64 postings blocking, same candidate dedup, byte==char levenshtein
    # on the ASCII part names, aggregated to distinct name pairs
    sql["dedup_fuzzy_names"] = f"""
WITH nmz AS (
  SELECT p_partkey AS id, lower(trim(p_name)) AS nm FROM part
  WHERE p_name IS NOT NULL AND length(trim(p_name)) > 0
),
gr AS (
  SELECT DISTINCT id, nm, {_md5_64("g", 0)} AS gh FROM (
    SELECT id, nm, unnest(CASE WHEN length(nm) >= 3
        THEN list_transform(range(1, length(nm) - 1), i -> substr(nm, CAST(i AS INTEGER), 3))
        ELSE [nm] END) AS g
    FROM nmz) z
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.nm AS name_a, b.nm AS name_b
  FROM gr a JOIN gr b ON a.gh = b.gh AND a.id < b.id
)
SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS INTEGER) AS distance,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM cand WHERE levenshtein(name_a, name_b) <= 2
GROUP BY name_a, name_b, distance"""

    # end-to-end entity resolution: the SAME blocking + levenshtein<=1 pairs,
    # transitively closed by a recursive reachability CTE, min-string keeper
    # (dedup.py:fuzzy_name_matches -> dedup_clusters)
    sql["dedup_entity_resolution"] = f"""
WITH RECURSIVE nmz AS (
  SELECT p_partkey AS id, lower(trim(p_name)) AS nm FROM part
  WHERE p_name IS NOT NULL AND length(trim(p_name)) > 0
),
gr AS (
  SELECT DISTINCT id, nm, {_md5_64("g", 0)} AS gh FROM (
    SELECT id, nm, unnest(CASE WHEN length(nm) >= 3
        THEN list_transform(range(1, length(nm) - 1), i -> substr(nm, CAST(i AS INTEGER), 3))
        ELSE [nm] END) AS g
    FROM nmz) z
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM gr a JOIN gr b ON a.gh = b.gh AND a.id < b.id
  WHERE levenshtein(a.nm, b.nm) <= 1
),
ids AS (SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS id FROM part),
sym AS (
  SELECT CAST(id_a AS VARCHAR) AS a, CAST(id_b AS VARCHAR) AS b FROM cand
  UNION SELECT CAST(id_b AS VARCHAR), CAST(id_a AS VARCHAR) FROM cand
),
reach(a, b) AS (
  SELECT id, id FROM ids
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
)
SELECT a AS id, min(b) AS keeper_id FROM reach GROUP BY a"""

    # windowed PMI co-occurrence (text_analysis.py:term_cooccurrence):
    # stopword-filtered re-indexed positions, banded self-join, marginals and
    # N from the FULL pair multiset, min-count filter only on output; lift
    # restated with the identical operand order so the ppm hash crosses
    sql["term_cooccurrence"] = f"""
WITH tf AS (SELECT doc_id, list_filter({tok}, x -> x NOT IN ({stop_in})) AS toks FROM documents),
tt AS (SELECT doc_id, unnest(toks) AS term, unnest(range(len(toks))) AS pos FROM tf),
keep AS (SELECT term FROM (SELECT term, count(DISTINCT doc_id) AS df FROM tt GROUP BY term) WHERE df <= 400),
tk AS (SELECT tt.* FROM tt JOIN keep USING (term)),
pr AS MATERIALIZED (
  SELECT least(a.term, b.term) AS t1, greatest(a.term, b.term) AS t2, count(*) AS c
  FROM tk a JOIN tk b ON a.doc_id = b.doc_id
   AND b.pos - a.pos BETWEEN 1 AND 3 AND a.term != b.term
  GROUP BY 1, 2
),
nt AS (SELECT sum(c) AS n FROM pr),
mg AS (SELECT term, sum(c) AS m FROM (SELECT t1 AS term, c FROM pr UNION ALL SELECT t2, c FROM pr) GROUP BY term)
SELECT p.t1, p.t2, CAST(p.c AS BIGINT) AS n_pairs,
       CAST(ROUND(((CAST(p.c AS DOUBLE) * CAST(nt.n AS DOUBLE))
                   / (CAST(m1.m AS DOUBLE) * CAST(m2.m AS DOUBLE))) * 1000000.0) AS BIGINT) AS lift_ppm
FROM pr p CROSS JOIN nt
JOIN mg m1 ON p.t1 = m1.term JOIN mg m2 ON p.t2 = m2.term
WHERE p.c >= 3"""

    sql["token_counts"] = f"SELECT doc_id, CAST(len({tok}) AS BIGINT) AS n_tokens FROM documents"

    # TextRank keywords (operators/keywords.py): the term_cooccurrence CTE
    # chain (same window/max_df/min_pair_count as its own oracle) feeding 10
    # unrolled WEIGHTED power iterations (the a9_pagerank_weighted pattern),
    # ppm-quantized top-100
    _trd = "CAST(0.85 AS DOUBLE)"
    _tr_iters = []
    _prev_r = "tr0"
    for _i in range(1, 11):
        _tr_iters.append(f"""trc{_i} AS MATERIALIZED (
  SELECT f.dst AS id, SUM(r.rank * f.frac) AS c
  FROM trfr f JOIN {_prev_r} r ON f.src = r.id
  GROUP BY f.dst
), trd{_i} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) AS dm
  FROM {_prev_r} r LEFT JOIN trws s ON s.src = r.id WHERE s.src IS NULL
), tr{_i} AS MATERIALIZED (
  SELECT a.id,
         (CAST(1.0 AS DOUBLE) - {_trd}) / trn.n
         + {_trd} * (COALESCE(c.c, CAST(0 AS DOUBLE)) + (SELECT dm FROM trd{_i}) / trn.n) AS rank
  FROM trnodes a CROSS JOIN trn LEFT JOIN trc{_i} c ON a.id = c.id
)""")
        _prev_r = f"tr{_i}"
    sql["textrank_keywords"] = f"""
WITH tf AS (SELECT doc_id, list_filter({tok}, x -> x NOT IN ({stop_in})) AS toks FROM documents),
tt AS (SELECT doc_id, unnest(toks) AS term, unnest(range(len(toks))) AS pos FROM tf),
keep AS (SELECT term FROM (SELECT term, count(DISTINCT doc_id) AS df FROM tt GROUP BY term) WHERE df <= 400),
tk AS (SELECT tt.* FROM tt JOIN keep USING (term)),
trp AS MATERIALIZED (
  SELECT least(a.term, b.term) AS t1, greatest(a.term, b.term) AS t2, count(*) AS c
  FROM tk a JOIN tk b ON a.doc_id = b.doc_id
   AND b.pos - a.pos BETWEEN 1 AND 3 AND a.term != b.term
  GROUP BY 1, 2 HAVING count(*) >= 3
),
tre AS MATERIALIZED (
  SELECT t1 AS src, t2 AS dst, CAST(c AS DOUBLE) AS w FROM trp
  UNION ALL SELECT t2, t1, CAST(c AS DOUBLE) FROM trp
),
trws AS MATERIALIZED (SELECT src, SUM(w) AS ws FROM tre GROUP BY src),
trfr AS MATERIALIZED (SELECT e.src, e.dst, e.w / s.ws AS frac FROM tre e JOIN trws s ON e.src = s.src),
trnodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM tre),
trn AS MATERIALIZED (SELECT count(*) AS n FROM trnodes),
tr0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) / trn.n AS rank FROM trnodes CROSS JOIN trn),
{", ".join(_tr_iters)}
SELECT id AS term, CAST(ROUND(rank * 1000000.0) AS BIGINT) AS rank_ppm
FROM tr10 ORDER BY rank_ppm DESC, term LIMIT 100"""

    # real WAV decode: amplitude at ms offset == the synthesized PCM formula
    # (1000 Hz => sample index == offset; duration 200 + doc_id%100 ms)
    sql["mm_wav_decode"] = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(off AS BIGINT) AS frame_offset_ms,
       CAST((doc_id * 7 + off * 3) % 256 AS BIGINT) AS amplitude
FROM (SELECT doc_id, unnest(generate_series(0, 200 + doc_id % 100 - 1, 50)) AS off
      FROM documents)"""

    # real BMP decode + nearest resize: red_sum restated via the integer
    # floor mapping sx = tx*w//4, sy = ty*12//3 over the 4x3 target grid
    sql["mm_bmp_resize"] = """
WITH g AS (SELECT doc_id, 16 + doc_id % 8 AS w FROM documents),
cells AS (
  SELECT doc_id, w, tx, ty
  FROM g
  CROSS JOIN (SELECT unnest(range(4)) AS tx)
  CROSS JOIN (SELECT unnest(range(3)) AS ty)
)
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(12 AS INTEGER) AS height,
       CAST(4 AS INTEGER) AS target_width,
       CAST(3 AS INTEGER) AS target_height,
       CAST(SUM((doc_id + 3 * ((tx * w) // 4) + 7 * ((ty * 12) // 3)) % 256) AS BIGINT) AS red_sum
FROM cells
GROUP BY doc_id, w"""

    # real PNG decode (zlib inflate + filter undo) + nearest resize: red_sum
    # restated via sx = tx*w//4, sy = ty*10//3 over the 4x3 target grid
    sql["mm_png_resize"] = """
WITH g AS (SELECT doc_id, 12 + doc_id % 5 AS w FROM documents),
cells AS (
  SELECT doc_id, w, tx, ty
  FROM g
  CROSS JOIN (SELECT unnest(range(4)) AS tx)
  CROSS JOIN (SELECT unnest(range(3)) AS ty)
)
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(10 AS INTEGER) AS height,
       CAST(4 AS INTEGER) AS target_width,
       CAST(3 AS INTEGER) AS target_height,
       CAST(SUM((doc_id + 5 * ((tx * w) // 4) + 11 * ((ty * 10) // 3)) % 256) AS BIGINT) AS red_sum
FROM cells
GROUP BY doc_id, w"""

    sql["mm_gif_resize"] = """
WITH g AS (SELECT doc_id, 14 + doc_id % 6 AS w FROM documents),
cells AS (
  SELECT doc_id, w, tx, ty
  FROM g
  CROSS JOIN (SELECT unnest(range(4)) AS tx)
  CROSS JOIN (SELECT unnest(range(3)) AS ty)
)
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(9 AS INTEGER) AS height,
       CAST(4 AS INTEGER) AS target_width,
       CAST(3 AS INTEGER) AS target_height,
       CAST(SUM((doc_id + 7 * ((tx * w) // 4) + 13 * ((ty * 9) // 3)) % 256) AS BIGINT) AS red_sum
FROM cells
GROUP BY doc_id, w"""

    # real baseline-JPEG decode (Huffman + dequant + IDCT) + nearest resize:
    # the synth image is block-constant with even luma, so the lossy codec is
    # bit-exact (DC-only blocks, Annex K DC quantizer divides 8*(gray-128))
    # and red_sum restates via the block coordinates of the floor mapping
    sql["mm_jpeg_resize"] = """
WITH g AS (SELECT doc_id, 24 + 8 * (doc_id % 3) AS w FROM documents),
cells AS (
  SELECT doc_id, w, tx, ty
  FROM g
  CROSS JOIN (SELECT unnest(range(4)) AS tx)
  CROSS JOIN (SELECT unnest(range(3)) AS ty)
)
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST(4 AS INTEGER) AS target_width,
       CAST(3 AS INTEGER) AS target_height,
       CAST(SUM(2 * ((doc_id * 5 + 3 * (((tx * w) // 4) // 8) + 7 * (((ty * 16) // 3) // 8)) % 128)) AS BIGINT) AS red_sum
FROM cells
GROUP BY doc_id, w"""

    # progressive JPEG re-encodes the SAME quantized coefficients losslessly,
    # so its decode is pinned by the identical baseline restatement
    sql["mm_jpeg_progressive"] = sql["mm_jpeg_resize"]

    # image-format variants: gray@4 scales samples by 255/15, palette@4
    # looks up red = 17*index, interlaced PNG/GIF must equal their
    # sequential layouts — all four restated via the floor resize mapping
    sql["mm_image_variants"] = """
WITH cells AS (
  SELECT doc_id, tx, ty FROM documents
  CROSS JOIN (SELECT unnest(range(4)) AS tx)
  CROSS JOIN (SELECT unnest(range(3)) AS ty)
)
SELECT 'g:' || CAST(doc_id AS VARCHAR) AS media_id,
       CAST(10 + doc_id % 4 AS INTEGER) AS width, CAST(7 AS INTEGER) AS height,
       CAST(4 AS INTEGER) AS target_width, CAST(3 AS INTEGER) AS target_height,
       CAST(SUM(((doc_id + 2 * ((tx * (10 + doc_id % 4)) // 4) + 3 * ((ty * 7) // 3)) % 16) * 255 // 15) AS BIGINT) AS red_sum
FROM cells GROUP BY doc_id
UNION ALL
SELECT 'p:' || CAST(doc_id AS VARCHAR),
       CAST(12 + doc_id % 3 AS INTEGER), CAST(6 AS INTEGER),
       CAST(4 AS INTEGER), CAST(3 AS INTEGER),
       CAST(SUM(17 * ((doc_id + ((tx * (12 + doc_id % 3)) // 4) + 2 * ((ty * 6) // 3)) % 16)) AS BIGINT)
FROM cells GROUP BY doc_id
UNION ALL
SELECT 'i:' || CAST(doc_id AS VARCHAR),
       CAST(12 + doc_id % 5 AS INTEGER), CAST(10 AS INTEGER),
       CAST(4 AS INTEGER), CAST(3 AS INTEGER),
       CAST(SUM((doc_id + 5 * ((tx * (12 + doc_id % 5)) // 4) + 11 * ((ty * 10) // 3)) % 256) AS BIGINT)
FROM cells GROUP BY doc_id
UNION ALL
SELECT 'gi:' || CAST(doc_id AS VARCHAR),
       CAST(14 + doc_id % 6 AS INTEGER), CAST(9 AS INTEGER),
       CAST(4 AS INTEGER), CAST(3 AS INTEGER),
       CAST(SUM((doc_id + 7 * ((tx * (14 + doc_id % 6)) // 4) + 13 * ((ty * 9) // 3)) % 256) AS BIGINT)
FROM cells GROUP BY doc_id"""

    # real container-metadata sniff: MP3 frame-header walk (duration =
    # frames*1152/44100) and MP4 box-tree walk (mvhd/tkhd/stsd), restated
    # from the synth_mp3_for_id / synth_mp4_for_id fixture formulas
    sql["mm_media_info"] = """
SELECT CAST(doc_id AS VARCHAR) || ':a' AS media_id,
       'audio' AS kind,
       CAST((5 + doc_id % 7) * 1152 * 1000 // 44100 AS BIGINT) AS duration_ms,
       CAST(44100 AS INTEGER) AS sample_rate,
       CAST(1 + doc_id % 2 AS INTEGER) AS channels,
       CAST(NULL AS INTEGER) AS width,
       CAST(NULL AS INTEGER) AS height,
       'mp3' AS codec
FROM documents
UNION ALL
SELECT CAST(doc_id AS VARCHAR) || ':v' AS media_id,
       'video' AS kind,
       CAST(1000 + (doc_id * 37) % 5000 AS BIGINT) AS duration_ms,
       CAST(NULL AS INTEGER) AS sample_rate,
       CAST(NULL AS INTEGER) AS channels,
       CAST(16 * (1 + doc_id % 10) AS INTEGER) AS width,
       CAST(9 * (1 + doc_id % 10) AS INTEGER) AS height,
       'avc1' AS codec
FROM documents"""

    # F1-F3 exact reconstruction: reassembled chunks == the original document
    sql["f1_f4_chunking"] = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       md5(text) AS reassembled_md5,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents WHERE text IS NOT NULL AND text <> ''"""

    # packing conservation: every doc once, token counts conserved; the
    # invariant columns (overfull / gapped sequences) are zero by contract
    sql["td_pack_sequences"] = f"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_docs,
       CAST(coalesce(sum(len({tok})), 0) AS BIGINT) AS total_tokens,
       CAST(0 AS BIGINT) AS overfull_multidoc_seqs,
       CAST(0 AS BIGINT) AS position_gap_seqs
FROM documents"""

    sql["a5_top_words"] = f"""
WITH w AS (SELECT unnest({tok}) AS word FROM documents)
SELECT word, count(*) AS cnt FROM w
WHERE word NOT IN ({stop_in})
GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 20"""

    sql["a7_token_f1"] = f"""
WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
pairs AS (
  SELECT a.doc_id, a.toks AS pred, b.toks AS gold
  FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
),
m AS (
  SELECT doc_id, pred, gold,
         coalesce(list_sum(list_transform(list_distinct(pred),
           tkn -> least(len(list_filter(pred, x -> x = tkn)), len(list_filter(gold, x -> x = tkn))))), 0) * 1.0 AS tp
  FROM pairs
),
pr AS (
  SELECT doc_id,
         CASE WHEN len(pred) > 0 THEN tp / len(pred) ELSE 0.0 END AS p,
         CASE WHEN len(gold) > 0 THEN tp / len(gold) ELSE 0.0 END AS r,
         len(pred) AS np, len(gold) AS ng
  FROM m
)
SELECT doc_id, round(p, 6) AS precision, round(r, 6) AS recall,
       round(CASE WHEN np = 0 AND ng = 0 THEN 1.0
                  WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END, 6) AS f1
FROM pr"""

    sql["f5_content_id"] = (
        "SELECT c_custkey, md5(concat_ws(chr(31), c_name, CAST(c_custkey AS VARCHAR))) AS data_id FROM customer"
    )

    sql["f6_normalize_name"] = (
        "SELECT p_partkey, regexp_replace(trim(lower(p_name)), '[^a-z0-9]+', '_', 'g') AS norm_name FROM part"
    )

    sql["f10_title_synthesis"] = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') AS raw,
         list_filter(
           list_transform(regexp_split_to_array(trim(text), '\\s+'),
                          x -> regexp_replace(lower(x), '^{punct}+|{punct}+$', '', 'g')),
           x -> x != '' AND x NOT IN ({stop_in})
         ) AS toks
  FROM documents
),
stats AS (
  SELECT doc_id, raw,
         list_sort(list_transform(list_distinct(toks),
           tkn -> {{'negcnt': -len(list_filter(toks, x -> x = tkn)),
                    'pos': list_position(toks, tkn), 'tok': tkn}})) AS s
  FROM w
)
SELECT doc_id,
       array_to_string(raw[1:7], ' ') || '... [' ||
       array_to_string(list_transform(s[1:7], x -> x.tok), ', ') || ']' AS title
FROM stats"""

    sql["f7_calendar_fields"] = """
SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS time_at,
       CAST(year(ts) AS BIGINT) AS year, CAST(month(ts) AS BIGINT) AS month,
       CAST(day(ts) AS BIGINT) AS day, CAST(hour(ts) AS BIGINT) AS hour,
       CAST(minute(ts) AS BIGINT) AS minute, CAST(second(ts) AS BIGINT) AS second
FROM events"""

    sql["p6_json_extract"] = (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events"
    )

    sql["w4_last_k_interactions"] = """
SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS time_at FROM events
ORDER BY time_at DESC, event_id DESC LIMIT 10"""

    sql["w1_topk_smallest"] = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC LIMIT 20"""

    sql["w3_null_inf_sort"] = """
SELECT event_id, round(CASE WHEN event_type = 'click' THEN value END, 6) AS score
FROM events
ORDER BY coalesce(round(CASE WHEN event_type = 'click' THEN value END, 6), 'infinity'::DOUBLE) ASC, event_id ASC
LIMIT 20"""

    qb = _hyperplane_bucket_sql("(embedding::DOUBLE[])", 6, 64)
    sql["ann_lsh_topk"] = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {qb} AS bucket FROM embeddings),
qb AS (SELECT {qb.replace('(embedding::DOUBLE[])', 'qv')} AS b FROM q)
SELECT e.vec_id, round({cosd_q.replace('e.v', 'e.v')}, 6) AS distance
FROM e, q, qb WHERE e.bucket = qb.b
ORDER BY {cosd_q}, e.vec_id LIMIT 10"""


    sql["w2_lexical_chunks"] = """
WITH c AS (
  SELECT CAST(doc_id AS VARCHAR) AS chunk_id, text,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '[^0-9a-zA-Z_]+'), x -> x != '')) AS toks
  FROM documents
),
q AS (SELECT ['the', 'fast', 'table', 'scan', 'merge', 'join', 'spark'] AS qt),
scored AS (
  SELECT chunk_id,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE len(list_filter(toks, x -> list_contains(q.qt, x))) * 1.0 /
                   (len(toks) + 7 - len(list_filter(toks, x -> list_contains(q.qt, x))))
         END AS s
  FROM c, q
)
SELECT chunk_id, round(s, 6) AS score FROM scored ORDER BY s DESC, chunk_id ASC LIMIT 10"""

    sql["cypher_passthrough"] = f"""WITH {g}
SELECT n.name AS src_table, e.relationship_name, count(*) AS n
FROM edges e JOIN nodes n ON e.src = n.id GROUP BY n.name, e.relationship_name"""

    sql["cypher_translated"] = f"""WITH {g}
SELECT t.name AS table_name, count(r.id) AS n
FROM edges e JOIN nodes r ON e.src = r.id JOIN nodes t ON e.dst = t.id
WHERE e.relationship_name = 'is_part_of' AND r.type = 'TableRow' AND t.type = 'TableType'
GROUP BY t.name ORDER BY table_name"""

    # undirected: union of both orientations (self-loops excluded from the
    # flip); is_part_of only ever points row->type, so the flipped copy is
    # what actually matches
    sql["cypher_case"] = f"""WITH {g}
SELECT CASE name WHEN 'nation' THEN 'geo' WHEN 'region' THEN 'geo' ELSE 'data' END AS bucket,
       count(*) AS n_rows,
       CAST(SUM(CASE WHEN name = 'orders' THEN 1 ELSE 0 END) AS BIGINT) AS n_orders
FROM nodes WHERE type = 'TableRow'
GROUP BY bucket ORDER BY bucket"""

    sql["cypher_undirected"] = f"""WITH {g},
sym AS (
  SELECT src, dst, relationship_name FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst, relationship_name FROM edges WHERE src <> dst
)
SELECT t.name AS table_name, count(r.id) AS n
FROM sym e JOIN nodes t ON e.src = t.id JOIN nodes r ON e.dst = r.id
WHERE e.relationship_name = 'is_part_of' AND t.type = 'TableType' AND r.type = 'TableRow'
GROUP BY t.name ORDER BY table_name"""

    sql["cypher_union_having"] = f"""WITH {g},
counts AS (
  SELECT t.name AS table_name, count(r.id) AS n
  FROM edges e JOIN nodes r ON e.src = r.id JOIN nodes t ON e.dst = t.id
  WHERE e.relationship_name = 'is_part_of' AND r.type = 'TableRow' AND t.type = 'TableType'
  GROUP BY t.name
)
SELECT table_name, n FROM counts WHERE n >= 25
UNION
SELECT table_name, n FROM counts WHERE regexp_full_match(table_name, 'nat.*')
ORDER BY table_name"""

    # list/lambda family: closed-form restatement of the comprehension-in-
    # reduce (sum of evens <= m is k*(k+1) with k = m//2), 1-based substring,
    # and the all() predicate collapsing to m >= 6
    sql["cypher_list_ops"] = """
SELECT CAST(m AS BIGINT) AS month,
       CAST((m // 2) * (m // 2 + 1) AS BIGINT) AS even_sum,
       substring('abcdefghijkl', 1, CAST(m AS INTEGER)) AS prefix,
       m >= 6 AS ge6
FROM (SELECT unnest(range(1, 13)) AS m)
ORDER BY month"""

    # the FULL V5 embedding path restated: feature-hash buckets (first 4
    # bytes of md5, big-endian — CAST of the '0x'-prefixed hex prefix),
    # per-bucket counts, L2 norms, cosine distance, top-10
    sql["v5_embed_knn"] = """
WITH dt AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
db AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 8)) AS UBIGINT) % 64 AS b,
         count(*) AS c
  FROM dt GROUP BY doc_id, b
),
dn AS (SELECT doc_id, sqrt(sum(c * c)) AS n FROM db GROUP BY doc_id),
qt AS (
  SELECT unnest(regexp_extract_all(lower('fast vector scan of a big table'), '[a-z0-9]+')) AS tok
),
qb AS (
  SELECT CAST(concat('0x', substr(md5(tok), 1, 8)) AS UBIGINT) % 64 AS b, count(*) AS c
  FROM qt GROUP BY b
),
qn AS (SELECT sqrt(sum(c * c)) AS n FROM qb),
dots AS (
  SELECT db.doc_id, sum(db.c * qb.c) AS d FROM db JOIN qb ON db.b = qb.b GROUP BY db.doc_id
),
scored AS (
  SELECT dn.doc_id,
         1.0 - coalesce(dots.d, 0) / (dn.n * (SELECT n FROM qn)) AS dist
  FROM dn LEFT JOIN dots ON dots.doc_id = dn.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, round(dist, 3) AS dist_r
FROM scored ORDER BY dist ASC, doc_id ASC LIMIT 10"""

    # the cognify build restated: the test corpus has no sentence enders, so
    # the F1-F3 chunker degenerates to exact 256-word blocks (sentences()
    # flushes at max_size; packing emits one chunk per flushed run), and the
    # mock extraction (gateway.extract_graph: first 8 distinct words with
    # len>=5 per chunk, typed by first letter) + per-type node dedup are
    # plain SQL.  Promotes the flagship build's node counts from rows-only.
    sql["cognify_node_counts"] = """
WITH d AS (SELECT doc_id, text FROM documents LIMIT 100),
w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS nw
  FROM d
),
ch AS (
  SELECT doc_id, k,
         ws[k * 256 + 1 : least((k + 1) * 256, nw)] AS cws,
         (k + 1) * 256 >= nw AS is_last
  FROM w, unnest(range(0, CAST(ceil(nw / 256.0) AS BIGINT))) AS ks(k)
),
chunk_texts AS (
  SELECT doc_id, k, cws,
         array_to_string(cws, ' ') || CASE WHEN is_last THEN '' ELSE ' ' END AS ctext
  FROM ch
),
tok AS (
  SELECT doc_id, k, cws[i] AS tok, i
  FROM chunk_texts, unnest(range(1, len(cws) + 1)) AS u(i)
  WHERE length(cws[i]) >= 5
),
firsts AS (
  SELECT doc_id, k, tok, min(i) AS first_i FROM tok GROUP BY doc_id, k, tok
),
ents AS (
  SELECT doc_id, k, tok
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, k ORDER BY first_i) AS rn FROM firsts)
  WHERE rn <= 8
)
SELECT 'TextDocument' AS type, (SELECT count(*) FROM d) AS n
UNION ALL
SELECT 'DocumentChunk', (SELECT count(DISTINCT ctext) FROM chunk_texts)
UNION ALL
SELECT 'TextSummary', (SELECT count(DISTINCT ctext) FROM chunk_texts)
UNION ALL
SELECT 'Entity', (SELECT count(DISTINCT tok) FROM ents)
UNION ALL
SELECT 'EntityType', (SELECT count(DISTINCT 'Type_' || tok[1]) FROM ents)"""

    # office/HTML/email extraction: every string restated from the document
    # text (docx paragraph join, xlsx tab/newline layout, html tag-strip with
    # empty-chunk drop via concat_ws+nullif, eml subject + set_content's
    # trailing newline)
    sql["s2_office_text"] = """
SELECT 'docx:' || CAST(doc_id AS VARCHAR) AS id,
       substr(text, 1, 30) || chr(10) || substr(text, 31, 30) AS text FROM documents
UNION ALL
SELECT 'xlsx:' || CAST(doc_id AS VARCHAR),
       'a' || CAST(doc_id AS VARCHAR) || chr(9) || substr(text, 1, 10) || chr(10)
         || substr(text, 11, 10) || chr(9) || 'z' FROM documents
UNION ALL
SELECT 'html:' || CAST(doc_id AS VARCHAR),
       concat_ws(' ', 'T', nullif(trim(substr(text, 1, 20)), ''), nullif(trim(substr(text, 21, 20)), ''))
FROM documents
UNION ALL
SELECT 'eml:' || CAST(doc_id AS VARCHAR),
       'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || substr(text, 1, 40) || chr(10)
FROM documents"""

    # [LLM] media loaders: transcript/description strings rebuilt from the
    # synthesis formulas — rms via integer-exact sums then bit-identical
    # sqrt/div, mean red via integer floor division, ppm truncation (int()
    # toward zero == floor for positives)
    sql["mm_llm_media_text"] = """
WITH arms AS (
  SELECT doc_id, n, sqrt(SUM(CAST(sq AS DOUBLE)) / n) / 255.0 AS rms
  FROM (
    SELECT doc_id, n, ((doc_id * 7 + i * 3) % 256 - 128) * ((doc_id * 7 + i * 3) % 256 - 128) AS sq
    FROM (SELECT doc_id, 200 + doc_id % 100 AS n, unnest(range(0, 200 + doc_id % 100)) AS i FROM documents) t
  ) s
  GROUP BY doc_id, n
),
img AS (
  SELECT doc_id, w, CAST(SUM((doc_id + 3 * x + 7 * y) % 256) // (w * 12) AS BIGINT) AS mr
  FROM (SELECT doc_id, 16 + doc_id % 8 AS w, unnest(range(0, 16 + doc_id % 8)) AS x FROM documents) gx,
       (SELECT unnest(range(0, 12)) AS y)
  GROUP BY doc_id, w
)
SELECT 'a:' || CAST(doc_id AS VARCHAR) AS id,
       'audio transcript: 1 channel 1000 hz ' || CAST(n AS VARCHAR)
         || ' ms rms_ppm ' || CAST(CAST(floor(rms * 1000000) AS BIGINT) AS VARCHAR) AS text
FROM arms
UNION ALL
SELECT 'i:' || CAST(doc_id AS VARCHAR),
       'image description: ' || CAST(w AS VARCHAR) || 'x12 pixels mean rgb '
         || CAST(mr AS VARCHAR) || ' 0 0'
FROM img"""

    # [LLM] media path for compressed av: the mock transcript restated from
    # the synth_mp3_for_id / synth_mp4_for_id formulas (container.py:285-295)
    # with the same integer arithmetic parse_mp3 folds per frame —
    # per-frame bits = 128000*1152//44100 = 3343, duration = samples*1000//sr
    sql["mm_llm_media_av"] = """
WITH mp3 AS (
  SELECT doc_id, 1 + doc_id % 2 AS ch, 5 + doc_id % 7 AS frames,
         (5 + doc_id % 7) * 1152 * 1000 // 44100 AS dur
  FROM documents
),
mp4 AS (
  SELECT doc_id, 16 * (1 + doc_id % 10) AS w, 9 * (1 + doc_id % 10) AS h,
         1000 + (doc_id * 37) % 5000 AS dur
  FROM documents
)
SELECT 'm3:' || CAST(doc_id AS VARCHAR) AS id,
       'audio transcript: ' || CAST(ch AS VARCHAR) || ' channel 44100 hz '
         || CAST(dur AS VARCHAR) || ' ms '
         || CAST(frames * 3343 // greatest(1, dur) AS VARCHAR) || ' kbps '
         || CAST(frames AS VARCHAR) || ' frames' AS text
FROM mp3
UNION ALL
SELECT 'm4:' || CAST(doc_id AS VARCHAR),
       'video transcript: ' || CAST(w AS VARCHAR) || 'x' || CAST(h AS VARCHAR)
         || ' pixels ' || CAST(dur AS VARCHAR) || ' ms codecs avc1+mp4a'
FROM mp4"""

    # GRAPH_COMPLETION retrieval promoted to oracle-checked: the whole
    # cognify + embed + normalize + triplet-score chain restated (dense
    # float32 vectors, same fold order), score quantized to ppm
    sql["graph_completion_context"] = f"""
WITH {_cognify_graph_sql(100)},
{_triplet_search_sql('gc_', 'fast table scan merge join', 10)}
SELECT t.src, ns.name AS src_name, t.relationship_name, t.dst, nd.name AS dst_name,
       CAST(round(t.raw * 1e6) AS BIGINT) AS score_ppm
FROM gc_top t
LEFT JOIN cg_nodes ns ON t.src = ns.id
LEFT JOIN cg_nodes nd ON t.dst = nd.id"""

    # U7 CoT promoted: the mock follow-up depends only on the query text
    # ('what else relates to scan?'), so the loop's triplet set is exactly
    # dedup(top5(query) ∪ top5(followup))
    sql["u7_cot_triplets"] = f"""
WITH {_cognify_graph_sql(60)},
{_triplet_search_sql('u7a_', 'fast table scan merge', 5)},
{_triplet_search_sql('u7b_', 'what else relates to scan?', 5)},
u7_keys AS (
  SELECT DISTINCT src, dst, relationship_name FROM (
    SELECT src, dst, relationship_name FROM u7a_top
    UNION ALL SELECT src, dst, relationship_name FROM u7b_top
  ) u
)
SELECT k.src, ns.name AS src_name, k.relationship_name, k.dst, nd.name AS dst_name
FROM u7_keys k
LEFT JOIN cg_nodes ns ON k.src = ns.id
LEFT JOIN cg_nodes nd ON k.dst = nd.id"""

    # THE FLAGSHIP, promoted to oracle-checked (r7): every output row is a
    # literal string DuckDB can rebuild — the context lines are
    # render_triplets' exact render (node first-seen order = (2*row_idx +
    # side) over the deterministic top-10 ordering; titles via ordered
    # string_agg of the Counter.most_common rank) and the completion row is
    # the mock's prompt-length echo.  Nothing in the contract is rows-only
    # any more.
    _fl_q = "fast table scan merge join"
    _fl_prefix = len(f"Answer {_fl_q!r} using:\n")
    sql["graph_completion_e2e"] = f"""
WITH {_cognify_graph_sql(100)},
{_triplet_search_sql('fl_', _fl_q, 10)},
{_u8_title_ctes()},
fl_rows AS MATERIALIZED (
  SELECT src, dst, relationship_name,
         row_number() OVER (ORDER BY raw, src, dst, relationship_name) AS idx
  FROM fl_top
),
fl_tops AS (
  SELECT id, string_agg(w, ', ' ORDER BY cnt DESC, fi) AS top
  FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY cnt DESC, fi ASC) AS rn FROM u8_wc)
  WHERE rn <= 7 GROUP BY id
),
fl_titles AS MATERIALIZED (
  SELECT nt.id,
         CASE WHEN nt.txt IS NULL THEN nt.name
              ELSE f7.first || '... [' || coalesce(tp.top, '') || ']' END AS title,
         CASE WHEN nt.txt IS NULL THEN nt.name ELSE nt.txt END AS content
  FROM u8_node_text nt
  LEFT JOIN (SELECT id, array_to_string(toks[1:7], ' ') AS first FROM u8_toks) f7 ON nt.id = f7.id
  LEFT JOIN fl_tops tp ON nt.id = tp.id
),
fl_node_order AS (
  SELECT id, min(pos) AS pos FROM (
    SELECT src AS id, idx * 2 AS pos FROM fl_rows
    UNION ALL SELECT dst, idx * 2 + 1 FROM fl_rows
  ) u GROUP BY id
),
fl_nodesec AS (
  SELECT string_agg(
           'Node: ' || t.title || chr(10) || '__node_content_start__' || chr(10)
             || t.content || chr(10) || '__node_content_end__' || chr(10),
           chr(10) ORDER BY o.pos) AS s
  FROM fl_node_order o JOIN fl_titles t ON o.id = t.id
),
fl_conn AS (
  SELECT string_agg(ts.title || ' --[' || r.relationship_name || ']--> ' || td.title,
                    chr(10) ORDER BY r.idx) AS s
  FROM fl_rows r JOIN fl_titles ts ON r.src = ts.id JOIN fl_titles td ON r.dst = td.id
),
fl_ctx AS MATERIALIZED (
  SELECT 'Nodes:' || chr(10) || (SELECT s FROM fl_nodesec) || chr(10) || chr(10)
         || 'Connections:' || chr(10) || (SELECT s FROM fl_conn) AS ctx
)
SELECT 'context' AS kind, CAST(i - 1 AS INTEGER) AS line_no, parts[i] AS line
FROM (SELECT string_split(ctx, chr(10)) AS parts FROM fl_ctx),
     unnest(range(1, len(parts) + 1)) AS u(i)
UNION ALL
SELECT 'completion', CAST(0 AS INTEGER),
       'MOCK_COMPLETION[' || CAST({_fl_prefix} + length(ctx) AS VARCHAR) || ']'
FROM fl_ctx"""

    # U8 context extension promoted to oracle-checked (the last LLM-loop
    # composite): the mock completion is 'MOCK_COMPLETION[len(prompt)]', so
    # each feedback round's query is fully determined by the RENDERED
    # CONTEXT LENGTH of the current triplet set — restated via the per-node
    # title/content length CTEs (validated char-exact against
    # render_triplets), a data-dependent hash-embedded query vector, and a
    # conditional third round (the loop breaks when round 2 adds nothing)
    sql["u8_context_extension_triplets"] = f"""
WITH {_cognify_graph_sql(60)},
{_triplet_search_sql('u8a_', 'fast table scan merge', 5)},
{_u8_title_ctes()},
u8a_keys AS (SELECT src, dst, relationship_name FROM u8a_top),
{_u8_prompt_len_cte('u8_n0', 'u8a_keys')},
{_u8_dyn_qv_ctes('u8q2', 'u8_n0')},
{_triplet_search_sql('u8b_', None, 5, qv_from='u8q2qv')},
u8_t1 AS (
  SELECT DISTINCT src, dst, relationship_name FROM (
    SELECT src, dst, relationship_name FROM u8a_keys
    UNION ALL SELECT src, dst, relationship_name FROM u8b_top
  ) u
),
u8_c1 AS (SELECT count(*) AS n FROM u8_t1),
{_u8_prompt_len_cte('u8_n1', 'u8_t1')},
{_u8_dyn_qv_ctes('u8q3', 'u8_n1')},
{_triplet_search_sql('u8c_', None, 5, qv_from='u8q3qv')},
u8_t2 AS (
  SELECT DISTINCT src, dst, relationship_name FROM (
    SELECT src, dst, relationship_name FROM u8_t1
    UNION ALL SELECT src, dst, relationship_name FROM u8c_top
  ) u
),
u8_final AS (
  SELECT * FROM u8_t1 WHERE (SELECT n FROM u8_c1) = (SELECT count(*) FROM u8a_keys)
  UNION ALL
  SELECT * FROM u8_t2 WHERE (SELECT n FROM u8_c1) <> (SELECT count(*) FROM u8a_keys)
)
SELECT k.src, ns.name AS src_name, k.relationship_name, k.dst, nd.name AS dst_name
FROM u8_final k
LEFT JOIN cg_nodes ns ON k.src = ns.id
LEFT JOIN cg_nodes nd ON k.dst = nd.id"""

    # chunk classification: same 256-word-block chunk restatement, first-2
    # distinct words len>=6 per DISTINCT chunk text (content-addressed edge
    # dedup), counted per subclass
    sql["chunk_classification"] = """
WITH d AS (SELECT doc_id, text FROM documents LIMIT 100),
w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS nw
  FROM d
),
ch AS (
  SELECT doc_id, k,
         ws[k * 256 + 1 : least((k + 1) * 256, nw)] AS cws,
         (k + 1) * 256 >= nw AS is_last
  FROM w, unnest(range(0, CAST(ceil(nw / 256.0) AS BIGINT))) AS ks(k)
),
chunk_texts AS (
  SELECT DISTINCT array_to_string(cws, ' ') || CASE WHEN is_last THEN '' ELSE ' ' END AS ctext,
         cws
  FROM ch
),
tok6 AS (
  SELECT ctext, cws[i] AS tok, i
  FROM chunk_texts, unnest(range(1, len(cws) + 1)) AS u(i)
  WHERE length(cws[i]) >= 6
),
firsts AS (SELECT ctext, tok, min(i) AS fi FROM tok6 GROUP BY ctext, tok),
subs AS (
  SELECT ctext, tok
  FROM (SELECT *, row_number() OVER (PARTITION BY ctext ORDER BY fi) AS rn FROM firsts)
  WHERE rn <= 2
)
SELECT tok AS subclass, count(*) AS n_chunks FROM subs GROUP BY tok"""

    # memify rules: the synthetic imperative texts are single-sentence-per-
    # marker by construction, so the mock's sentence-split + whitespace-
    # normalize + rstrip('.;!?') collapses to closed string forms ('Never '
    # absorbs B's leading space via ltrim; a trailing space in A/B survives
    # the strip, which the concat reproduces)
    sql["memify_rules"] = """
WITH d AS (SELECT doc_id, text FROM documents LIMIT 200),
r AS (
  SELECT 'You should ' || substr(text, 1, 40) AS rule_text FROM d
  UNION ALL
  SELECT 'Never ' || ltrim(substr(text, 41, 40)) AS rule_text FROM d
)
SELECT rule_text, count(*) AS n FROM r GROUP BY rule_text"""

    # code graph: each synthetic module is exactly one handler function and
    # one Worker class, so the ast-extraction node counts are closed-form —
    # the oracle pins that extract_definitions finds exactly those
    sql["code_graph_counts"] = """
WITH d AS (SELECT count(*) AS c FROM (SELECT 1 FROM documents LIMIT 40))
SELECT 'CodeFile' AS type, c AS n FROM d
UNION ALL SELECT 'FunctionDefinition', c FROM d
UNION ALL SELECT 'ClassDefinition', c FROM d"""

    sql["cypher_pipeline"] = f"""WITH {g},
wanted AS (SELECT * FROM (VALUES ('nation'), ('region'), ('customer')) AS t(tn))
SELECT w.tn AS table_name, count(r.id) AS n
FROM wanted w
JOIN nodes t ON t.type = 'TableType' AND t.name = w.tn
JOIN edges e ON e.dst = t.id AND e.relationship_name = 'is_part_of'
JOIN nodes r ON e.src = r.id AND r.type = 'TableRow'
GROUP BY w.tn ORDER BY table_name"""

    sql["cypher_optional_match"] = f"""WITH {g}
SELECT n.id AS part_id, count(e.src) AS refs
FROM nodes n
LEFT JOIN edges e ON e.dst = n.id AND e.relationship_name = 'l_partkey'
WHERE n.type = 'TableRow' AND n.name = 'part'
GROUP BY n.id ORDER BY part_id"""

    sql["a2_graph_metrics"] = f"""WITH {g},
n AS (SELECT count(*) AS num_nodes FROM nodes),
e AS (SELECT count(*) AS num_edges,
             CAST(COALESCE(SUM(CASE WHEN src = dst THEN 1 ELSE 0 END), 0) AS BIGINT) AS num_selfloops
      FROM edges)
SELECT num_nodes, num_edges,
       CAST(round(2.0 * CAST(num_edges AS DOUBLE) / num_nodes * 1e6) AS BIGINT) AS mean_degree_ppm,
       CAST(round(CAST(num_edges AS DOUBLE) / (num_nodes * (num_nodes - 1)) * 1e9) AS BIGINT) AS edge_density_ppb,
       num_selfloops
FROM n, e"""

    sql["natural_language_search"] = f"""WITH {g}
SELECT id, name, type FROM nodes WHERE type = 'TableType' ORDER BY id LIMIT 20"""

    sql["insights_exact_node"] = f"""WITH {g},
incident AS (
  SELECT src, dst, relationship_name FROM edges WHERE src = 'nation:7'
  UNION ALL SELECT src, dst, relationship_name FROM edges WHERE dst = 'nation:7'
)
SELECT DISTINCT i.src, ns.name AS src_name, i.relationship_name, i.dst, nd.name AS dst_name
FROM incident i JOIN nodes ns ON i.src = ns.id JOIN nodes nd ON i.dst = nd.id"""

    sql["temporal_search_e2e"] = """
WITH ev AS (
  SELECT CAST(event_id AS VARCHAR) AS doc_id,
         'user ' || CAST(user_id AS VARCHAR) || ' did ' || event_type || ' on' AS name,
         CAST(floor(epoch(CAST(date_trunc('day', ts) AS TIMESTAMP))) AS BIGINT) AS ts_from
  FROM events WHERE event_id % 5 = 0
),
named AS (
  SELECT md5(concat_ws(chr(31), 'Event', doc_id, name, CAST(ts_from AS VARCHAR))) AS id, name, ts_from
  FROM ev
)
SELECT DISTINCT id, name FROM named WHERE ts_from BETWEEN 1704844800 AND 1705708800"""

    sql["s1_ingest_identify"] = """
WITH d AS (
  SELECT 'doc' || CAST(doc_id AS VARCHAR) || '.txt' AS name, text, md5(text) AS content_hash
  FROM documents
),
idd AS (
  SELECT md5(concat_ws(chr(31), content_hash, 'default_user')) AS id, name, 'TextDocument' AS document_type, content_hash,
         row_number() OVER (PARTITION BY md5(concat_ws(chr(31), content_hash, 'default_user')) ORDER BY name) AS rk
  FROM d
)
SELECT id, name, document_type, content_hash FROM idd WHERE rk = 1"""

    sql["s3_classify_documents"] = """
SELECT doc_id,
       CASE doc_id % 5
            WHEN 0 THEN 'TextDocument'
            WHEN 1 THEN 'PdfDocument'
            WHEN 2 THEN 'AudioDocument'
            WHEN 3 THEN 'ImageDocument'
            ELSE 'TextDocument'
       END AS document_type
FROM documents"""

    sql["u_regex_entities"] = """
SELECT doc_id, 'SYSTEM' AS entity_type, name, 'System: ' || name AS description
FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             unnest(regexp_extract_all(text, 'spark|vector')) AS name
      FROM documents)
UNION ALL
SELECT doc_id, 'TPCH_ENTITY' AS entity_type, name, 'TPC-H entity: ' || name AS description
FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             unnest(regexp_extract_all(text, 'customer|supplier|order')) AS name
      FROM documents)"""

    sql["edge_weights_flatten"] = """
WITH e AS (
  SELECT 'li:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) AS src,
         'part:' || CAST(l_partkey AS VARCHAR) AS dst,
         min(l_discount) AS w, min(l_quantity) AS q
  FROM lineitem GROUP BY 1, 2
)
SELECT src, dst, CAST(w AS VARCHAR) AS weight, CAST(q AS VARCHAR) AS weight_qty FROM e"""

    sql["mm_frame_sample"] = """
WITH m AS (
  SELECT 'm' || CAST(event_id AS VARCHAR) AS media_id, CAST(floor(value * 100) AS BIGINT) AS duration_ms
  FROM events WHERE event_id < 200
)
SELECT media_id, unnest(range(0, greatest(duration_ms - 1, 0) + 1, 1000)) AS frame_offset_ms FROM m"""

    sql["mm_resize_plan"] = """
WITH m AS (
  SELECT 'img' || CAST(p_partkey AS VARCHAR) AS media_id, 'image' AS kind,
         CAST(p_size * 40 AS INTEGER) AS width, CAST(p_size * 25 AS INTEGER) AS height
  FROM part
)
SELECT media_id, kind,
       CAST(floor(width * (CASE WHEN greatest(width, height) > 512 THEN 512 / CAST(greatest(width, height) AS DOUBLE) ELSE 1.0 END)) AS INTEGER) AS target_width,
       CAST(floor(height * (CASE WHEN greatest(width, height) > 512 THEN 512 / CAST(greatest(width, height) AS DOUBLE) ELSE 1.0 END)) AS INTEGER) AS target_height
FROM m"""

    sql["u12_ontology_resolve"] = """
WITH e AS (
  SELECT c_custkey, c_mktsegment AS name,
         regexp_replace(trim(lower(c_mktsegment)), '[^a-z0-9]+', '_', 'g') AS norm
  FROM customer
),
resolved AS (
  SELECT c_custkey, name,
         CASE
              WHEN norm = 'building' THEN 'structure'\n              WHEN norm = 'house' THEN 'structure'\n              WHEN norm = 'machine' THEN 'equipment'\n              WHEN norm = 'auto' THEN 'vehicle'\n              ELSE NULL
         END AS exact_cls,
         CASE
              WHEN norm LIKE 'building%' THEN 'structure'\n              WHEN norm LIKE 'machine%' THEN 'equipment'\n              WHEN norm LIKE 'house%' THEN 'structure'\n              WHEN norm LIKE 'auto%' THEN 'vehicle'\n              ELSE NULL
         END AS prefix_cls
  FROM e
)
SELECT c_custkey, name, coalesce(exact_cls, prefix_cls) AS ontology_class,
       coalesce(exact_cls, prefix_cls) IS NOT NULL AS ontology_valid
FROM resolved"""


    sql["s4_column_values"] = """
WITH e AS (
  SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS src,
         'colval:customer.c_mktsegment:' || c_mktsegment AS dst,
         'has_c_mktsegment' AS relationship_name
  FROM customer
  UNION ALL
  SELECT 'orders:' || CAST(o_orderkey AS VARCHAR),
         'colval:orders.o_orderstatus:' || o_orderstatus, 'has_o_orderstatus'
  FROM orders
  UNION ALL
  SELECT 'orders:' || CAST(o_orderkey AS VARCHAR),
         'colval:orders.o_orderpriority:' || o_orderpriority, 'has_o_orderpriority'
  FROM orders
)
SELECT relationship_name, dst, count(*) AS n FROM (SELECT DISTINCT * FROM e) d
GROUP BY relationship_name, dst"""


    tabs = sorted({s[0] for s in TPCH_FK_SPECS} | {s[2] for s in TPCH_FK_SPECS})
    node_rows = "\n  UNION ALL ".join(
        f"SELECT 'table:{t}' AS id, '{t}' AS name, CAST(NULL AS VARCHAR) AS dst, 'node' AS kind" for t in tabs
    )
    edge_rows = "\n  UNION ALL ".join(
        f"SELECT 'table:{c}', '{fk}', 'table:{p}', 'edge'" for c, fk, p, _ in TPCH_FK_SPECS
    )
    sql["s5_schema_only"] = f"{node_rows}\n  UNION ALL {edge_rows}"


    from cognee_graphdb_spark.operators.text_analysis import _BPE_ISH_PATTERN

    bpe = _BPE_ISH_PATTERN.replace("'", "''")  # DuckDB '...' literals are raw
    sql["bpe_token_counts"] = (
        f"SELECT doc_id, CAST(len(regexp_extract_all(text, '{bpe}')) AS BIGINT) AS n_pieces FROM documents"
    )


    sql["a2_component_sizes"] = """
WITH sizes AS (
  SELECT n_regionkey, count(*) + 1 AS size FROM nation GROUP BY n_regionkey
)
SELECT size, count(*) AS n_components FROM sizes GROUP BY size"""

    # a2_connected_components: region-tree component sizes restated by joins
    # (component(region r) = r + its nations + their customers + their
    # suppliers), plus the full-graph single-component invariant
    sql["a2_connected_components"] = f"""WITH {g},
per_region AS (SELECT n_regionkey AS region, count(*) AS nations FROM nation GROUP BY n_regionkey),
cust AS (SELECT n.n_regionkey AS region, count(*) AS c
         FROM customer cu JOIN nation n ON cu.c_nationkey = n.n_nationkey GROUP BY n.n_regionkey),
supp AS (SELECT n.n_regionkey AS region, count(*) AS s
         FROM supplier sp JOIN nation n ON sp.s_nationkey = n.n_nationkey GROUP BY n.n_regionkey),
sizes AS (
  SELECT p.region, 1 + p.nations + coalesce(cust.c, 0) + coalesce(supp.s, 0) AS component_size
  FROM per_region p LEFT JOIN cust ON cust.region = p.region LEFT JOIN supp ON supp.region = p.region
)
SELECT 'region_tree' AS scope, CAST(component_size AS BIGINT) AS component_size,
       CAST(count(*) AS BIGINT) AS n_components
FROM sizes GROUP BY component_size
UNION ALL
SELECT 'full', CAST((SELECT count(*) FROM nodes) AS BIGINT), CAST(1 AS BIGINT)"""

    # --- a9 PageRank: 10 unrolled power iterations, same double arithmetic ---
    # (operand order mirrored from graph_metrics.py:pagerank so the ppm
    # quantization can't straddle a rounding boundary)
    _d = "CAST(0.85 AS DOUBLE)"
    _pr_iters = []
    _prev_r = "r0"
    for _i in range(1, 11):
        _pr_iters.append(f"""c{_i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(r.rank / deg.deg) AS c
  FROM fk e JOIN {_prev_r} r ON e.src = r.id JOIN deg ON deg.src = e.src
  GROUP BY e.dst
), d{_i} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) AS dm
  FROM {_prev_r} r LEFT JOIN deg ON deg.src = r.id WHERE deg.src IS NULL
), r{_i} AS MATERIALIZED (
  SELECT a.id,
         (CAST(1.0 AS DOUBLE) - {_d}) / nn.n
         + {_d} * (COALESCE(c.c, CAST(0 AS DOUBLE)) + (SELECT dm FROM d{_i}) / nn.n) AS rank
  FROM allnodes a CROSS JOIN nn LEFT JOIN c{_i} c ON a.id = c.id
)""")
        _prev_r = f"r{_i}"
    sql["a9_pagerank"] = f"""WITH {g},
fk AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
       WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
allnodes AS MATERIALIZED (SELECT src AS id FROM fk UNION SELECT dst FROM fk),
nn AS MATERIALIZED (SELECT count(*) AS n FROM allnodes),
deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM fk GROUP BY src),
r0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM allnodes CROSS JOIN nn),
{", ".join(_pr_iters)}
SELECT id, CAST(ROUND(rank * 1000000.0) AS BIGINT) AS rank_ppm
FROM r10 ORDER BY rank_ppm DESC, id LIMIT 100"""

    # weighted variant (graph_metrics.py:pagerank(weight_col=...)): the
    # supplier->part shipment graph, edge weight = lineitem multiplicity,
    # frac = w / W precomputed once, spread = rank * frac — same operand
    # order as the operator's weighted branch
    _pw_iters = []
    _prev_r = "r0"
    for _i in range(1, 11):
        _pw_iters.append(f"""c{_i} AS MATERIALIZED (
  SELECT f.dst AS id, SUM(r.rank * f.frac) AS c
  FROM fr f JOIN {_prev_r} r ON f.src = r.id
  GROUP BY f.dst
), d{_i} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) AS dm
  FROM {_prev_r} r LEFT JOIN wsum s ON s.src = r.id WHERE s.src IS NULL
), r{_i} AS MATERIALIZED (
  SELECT a.id,
         (CAST(1.0 AS DOUBLE) - {_d}) / nn.n
         + {_d} * (COALESCE(c.c, CAST(0 AS DOUBLE)) + (SELECT dm FROM d{_i}) / nn.n) AS rank
  FROM allnodes a CROSS JOIN nn LEFT JOIN c{_i} c ON a.id = c.id
)""")
        _prev_r = f"r{_i}"
    sql["a9_pagerank_weighted"] = f"""WITH
we AS MATERIALIZED (
  SELECT 's:' || l_suppkey AS src, 'p:' || l_partkey AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM lineitem GROUP BY 1, 2
),
wsum AS MATERIALIZED (SELECT src, SUM(w) AS ws FROM we GROUP BY src),
fr AS MATERIALIZED (SELECT e.src, e.dst, e.w / s.ws AS frac FROM we e JOIN wsum s ON e.src = s.src),
allnodes AS MATERIALIZED (SELECT src AS id FROM we UNION SELECT dst FROM we),
nn AS MATERIALIZED (SELECT count(*) AS n FROM allnodes),
r0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM allnodes CROSS JOIN nn),
{", ".join(_pw_iters)}
SELECT id, CAST(ROUND(rank * 1000000.0) AS BIGINT) AS rank_ppm
FROM r10 ORDER BY rank_ppm DESC, id LIMIT 100"""

    # personalized variant: reset vector + dangling mass over the nation
    # seeds; rank = (1-d)·p + d·(contrib + dm·p), same operand order as
    # graph_metrics.py:pagerank(personalized=...)
    _pp_iters = []
    _prev_r = "r0"
    for _i in range(1, 11):
        _pp_iters.append(f"""c{_i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(r.rank / deg.deg) AS c
  FROM fk e JOIN {_prev_r} r ON e.src = r.id JOIN deg ON deg.src = e.src
  GROUP BY e.dst
), d{_i} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) AS dm
  FROM {_prev_r} r LEFT JOIN deg ON deg.src = r.id WHERE deg.src IS NULL
), r{_i} AS MATERIALIZED (
  SELECT pv.id,
         (CAST(1.0 AS DOUBLE) - {_d}) * pv.p
         + {_d} * (COALESCE(c.c, CAST(0 AS DOUBLE)) + (SELECT dm FROM d{_i}) * pv.p) AS rank
  FROM pvec pv LEFT JOIN c{_i} c ON pv.id = c.id
)""")
        _prev_r = f"r{_i}"
    sql["a9_pagerank_personalized"] = f"""WITH {g},
fk AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
       WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
allnodes AS MATERIALIZED (SELECT src AS id FROM fk UNION SELECT dst FROM fk),
deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM fk GROUP BY src),
ns AS MATERIALIZED (SELECT count(*) AS n FROM allnodes WHERE id LIKE 'nation:%'),
pvec AS MATERIALIZED (
  SELECT id, CASE WHEN id LIKE 'nation:%' THEN CAST(1.0 AS DOUBLE) / ns.n
                  ELSE CAST(0 AS DOUBLE) END AS p
  FROM allnodes CROSS JOIN ns
),
r0 AS MATERIALIZED (SELECT id, p AS rank FROM pvec),
{", ".join(_pp_iters)}
SELECT id, CAST(ROUND(rank * 1000000.0) AS BIGINT) AS rank_ppm
FROM r10 ORDER BY rank_ppm DESC, id LIMIT 100"""
    # the CALL-surface row reuses the identical unroll: same graph, same
    # defaults, same ppm projection — the procedure routing must be a no-op
    sql["cypher_gds_pagerank"] = sql["a9_pagerank"]

    # --- a2 HITS: 10 unrolled hub/authority half-steps with L1 normalization
    # (graph_metrics.py:hits): auth = COALESCE(sum_in(hub), 0) / total,
    # hub = COALESCE(sum_out(auth), 0) / total — same operand order as the
    # operator's _normalize; ppm-quantized top-100 ---------------------------
    _hits_iters = []
    _prev_h = "h0"
    for _i in range(1, 11):
        _hits_iters.append(f"""ar{_i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(h.score) AS c
  FROM fk e JOIN {_prev_h} h ON e.src = h.id GROUP BY e.dst
), at{_i} AS MATERIALIZED (SELECT COALESCE(SUM(c), CAST(0 AS DOUBLE)) AS t FROM ar{_i}),
a{_i} AS MATERIALIZED (
  SELECT n.id, CASE WHEN t.t = 0 THEN CAST(0 AS DOUBLE)
                    ELSE COALESCE(r.c, CAST(0 AS DOUBLE)) / t.t END AS score
  FROM allnodes n CROSS JOIN at{_i} t LEFT JOIN ar{_i} r ON n.id = r.id
), hr{_i} AS MATERIALIZED (
  SELECT e.src AS id, SUM(a.score) AS c
  FROM fk e JOIN a{_i} a ON e.dst = a.id GROUP BY e.src
), ht{_i} AS MATERIALIZED (SELECT COALESCE(SUM(c), CAST(0 AS DOUBLE)) AS t FROM hr{_i}),
h{_i} AS MATERIALIZED (
  SELECT n.id, CASE WHEN t.t = 0 THEN CAST(0 AS DOUBLE)
                    ELSE COALESCE(r.c, CAST(0 AS DOUBLE)) / t.t END AS score
  FROM allnodes n CROSS JOIN ht{_i} t LEFT JOIN hr{_i} r ON n.id = r.id
)""")
        _prev_h = f"h{_i}"
    sql["a2_hits"] = f"""WITH {g},
fk AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
       WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
allnodes AS MATERIALIZED (SELECT src AS id FROM fk UNION SELECT dst FROM fk),
nn AS MATERIALIZED (SELECT count(*) AS n FROM allnodes),
h0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS score FROM allnodes CROSS JOIN nn),
{", ".join(_hits_iters)}
SELECT h.id, CAST(ROUND(h.score * 1000000.0) AS BIGINT) AS hub_ppm,
       CAST(ROUND(a.score * 1000000.0) AS BIGINT) AS authority_ppm
FROM h10 h JOIN a10 a ON h.id = a.id
ORDER BY authority_ppm DESC, hub_ppm DESC, h.id LIMIT 100"""

    # --- a2 k-core: 8 unrolled Matula–Beck peel rounds (fixpoint at sf0.01
    # is round 4; later rounds are monotone no-ops) over the same DISTINCT
    # undirected simple-graph view graph_metrics.py:k_core peels -------------
    _kc_rounds = []
    _prev_e = "e0"
    for _i in range(1, 9):
        _kc_rounds.append(f"""k{_i} AS MATERIALIZED (
  SELECT u FROM {_prev_e} GROUP BY u HAVING count(*) >= 3
), e{_i} AS MATERIALIZED (
  SELECT e.u, e.v FROM {_prev_e} e JOIN k{_i} a ON e.u = a.u JOIN k{_i} b ON e.v = b.u
)""")
        _prev_e = f"e{_i}"
    sql["a2_kcore"] = f"""WITH {g},
fk AS MATERIALIZED (SELECT src, dst FROM edges WHERE relationship_name != 'is_part_of'),
e0 AS MATERIALIZED (
  SELECT u, v FROM (SELECT src AS u, dst AS v FROM fk UNION SELECT dst, src FROM fk) s
  WHERE u != v
),
{", ".join(_kc_rounds)},
core AS (SELECT u, count(*) AS deg FROM e8 GROUP BY u HAVING count(*) >= 3)
SELECT n.name, CAST(count(*) AS BIGINT) AS n_core_nodes,
       CAST(sum(core.deg) AS BIGINT) AS total_core_degree
FROM core JOIN nodes n ON core.u = n.id GROUP BY n.name"""

    # --- a2 coreness: 16 unrolled h-index rounds (Lü et al.; fixpoint at
    # sf0.01 is round 14, later rounds are monotone no-ops) from the same
    # degree initialization graph_metrics.py:coreness starts at --------------
    _cn_rounds = []
    _prev_c = "c0"
    for _i in range(1, 17):
        _cn_rounds.append(f"""h{_i} AS MATERIALIZED (
  SELECT u, max(least(rn, cv)) AS h FROM (
    SELECT e.u, c.c AS cv,
           row_number() OVER (PARTITION BY e.u ORDER BY c.c DESC) AS rn
    FROM e0 e JOIN {_prev_c} c ON e.v = c.u) s
  GROUP BY u
), c{_i} AS MATERIALIZED (SELECT u, h AS c FROM h{_i})""")
        _prev_c = f"c{_i}"
    sql["a2_coreness"] = f"""WITH {g},
fk AS MATERIALIZED (SELECT src, dst FROM edges WHERE relationship_name != 'is_part_of'),
e0 AS MATERIALIZED (
  SELECT u, v FROM (SELECT src AS u, dst AS v FROM fk UNION SELECT dst, src FROM fk) s
  WHERE u != v
),
c0 AS MATERIALIZED (SELECT u, count(*) AS c FROM e0 GROUP BY u),
{", ".join(_cn_rounds)}
SELECT n.name, CAST(COALESCE(c.c, 0) AS BIGINT) AS coreness,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM nodes n LEFT JOIN c16 c ON n.id = c.u
GROUP BY n.name, coreness"""

    # --- a2 label propagation: 3 unrolled synchronous rounds over md5-seeded
    # labels (graph_metrics.py:label_propagation; most-frequent neighbor
    # label, ties to the smallest value) ------------------------------------
    _lp_rounds = []
    _prev_l = "l0"
    for _i in range(1, 4):
        _lp_rounds.append(f"""ct{_i} AS MATERIALIZED (
  SELECT e.u, l.label, count(*) AS c
  FROM nfe e JOIN {_prev_l} l ON e.v = l.u GROUP BY e.u, l.label
), pk{_i} AS MATERIALIZED (
  SELECT u, label AS nl FROM (
    SELECT u, label, row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rn
    FROM ct{_i}) s
  WHERE rn = 1
), l{_i} AS MATERIALIZED (
  SELECT l.u, COALESCE(p.nl, l.label) AS label
  FROM {_prev_l} l LEFT JOIN pk{_i} p ON l.u = p.u
)""")
        _prev_l = f"l{_i}"
    _lp_core = f"""nf AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
nfn AS MATERIALIZED (SELECT src AS id FROM nf UNION SELECT dst FROM nf),
nfe AS MATERIALIZED (
  SELECT u, v FROM (SELECT src AS u, dst AS v FROM nf UNION SELECT dst, src FROM nf) s
  WHERE u != v
),
l0 AS MATERIALIZED (SELECT id AS u, {_md5_64("id", 0)} AS label FROM nfn),
{", ".join(_lp_rounds)}"""
    sql["a2_label_propagation"] = f"""WITH {g},
{_lp_core}
SELECT u AS id, label FROM l3"""

    # --- a2 incremental components: the final partition is batch-split-
    # invariant, so the oracle is the SAME region-tree size histogram the
    # full-run entry uses (graph_metrics.py:incremental_components) ----------
    sql["a2_incremental_components"] = f"""WITH {g},
per_region AS (SELECT n_regionkey AS region, count(*) AS nations FROM nation GROUP BY n_regionkey),
cust AS (SELECT n.n_regionkey AS region, count(*) AS c
         FROM customer cu JOIN nation n ON cu.c_nationkey = n.n_nationkey GROUP BY n.n_regionkey),
supp AS (SELECT n.n_regionkey AS region, count(*) AS s
         FROM supplier sp JOIN nation n ON sp.s_nationkey = n.n_nationkey GROUP BY n.n_regionkey),
sizes AS (
  SELECT p.region, 1 + p.nations + coalesce(cust.c, 0) + coalesce(supp.s, 0) AS component_size
  FROM per_region p LEFT JOIN cust ON cust.region = p.region LEFT JOIN supp ON supp.region = p.region
)
SELECT CAST(component_size AS BIGINT) AS component_size,
       CAST(count(*) AS BIGINT) AS n_components
FROM sizes GROUP BY component_size"""

    # --- a2 WL refinement: 2 unrolled color-refinement rounds,
    # md5(own '#' sorted-joined neighbor labels), structural seed md5('·')
    # (graph_metrics.py:wl_refinement) ---------------------------------------
    _wl_rounds = []
    for _i in (1, 2):
        _wl_rounds.append(f"""wc{_i} AS MATERIALIZED (
  SELECT e.u AS id, array_to_string(list(l.wl ORDER BY l.wl), '|') AS ns
  FROM nfe e JOIN w{_i - 1} l ON e.v = l.u GROUP BY e.u
), w{_i} AS MATERIALIZED (
  SELECT w.u, md5(concat(w.wl, '#', COALESCE(c.ns, ''))) AS wl
  FROM w{_i - 1} w LEFT JOIN wc{_i} c ON w.u = c.id
)""")
    sql["a2_wl_refinement"] = f"""WITH {g},
nf AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
nfn AS MATERIALIZED (SELECT src AS id FROM nf UNION SELECT dst FROM nf),
nfe AS MATERIALIZED (
  SELECT u, v FROM (SELECT src AS u, dst AS v FROM nf UNION SELECT dst, src FROM nf) s
  WHERE u != v
),
w0 AS MATERIALIZED (SELECT id AS u, md5('·') AS wl FROM nfn),
{", ".join(_wl_rounds)}
SELECT u AS id, wl AS wl_label FROM w2"""

    # --- a2 modularity: Newman Q contributions of the 3-round LPA
    # communities over the SAME undirected simple-graph view, exact integers:
    # contrib_scaled = S*S_c - d_c^2 with S = |sym pairs|
    # (graph_metrics.py:modularity over label_propagation output) ------------
    sql["a2_modularity"] = f"""WITH {g},
{_lp_core},
tg AS MATERIALIZED (
  SELECT a.label AS lu, b.label AS lv
  FROM nfe e JOIN l3 a ON e.u = a.u JOIN l3 b ON e.v = b.u
),
stot AS (SELECT count(*) AS s_total FROM tg),
win AS (SELECT lu AS label, count(*) AS sym_within FROM tg WHERE lu = lv GROUP BY lu),
dgr AS (SELECT lu AS label, count(*) AS total_degree FROM tg GROUP BY lu),
siz AS (SELECT label, count(*) AS n_nodes FROM l3 GROUP BY label)
SELECT siz.label, CAST(siz.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(win.sym_within, 0) AS BIGINT) AS sym_within,
       CAST(COALESCE(dgr.total_degree, 0) AS BIGINT) AS total_degree,
       CAST(stot.s_total AS BIGINT) AS s_total,
       CAST(CAST(stot.s_total AS HUGEINT) * COALESCE(win.sym_within, 0)
            - CAST(COALESCE(dgr.total_degree, 0) AS HUGEINT)
              * COALESCE(dgr.total_degree, 0) AS BIGINT)
         AS contrib_scaled
FROM siz LEFT JOIN win ON siz.label = win.label
LEFT JOIN dgr ON siz.label = dgr.label
CROSS JOIN stot"""

    # --- a2 conductance: per-community boundary/volume of the SAME 3-round
    # LPA communities over the SAME undirected simple-graph view, exact
    # BIGINT counts; the ratio crosses the hash as round(1e6·b/v) only
    # (graph_metrics.py:conductance over label_propagation output) ----------
    sql["a2_conductance"] = f"""WITH {g},
{_lp_core},
tg AS MATERIALIZED (
  SELECT a.label AS lu, b.label AS lv
  FROM nfe e JOIN l3 a ON e.u = a.u JOIN l3 b ON e.v = b.u
),
stot AS (SELECT count(*) AS s_total FROM tg),
per AS (
  SELECT lu AS label,
         CAST(SUM(CASE WHEN lu = lv THEN 1 ELSE 0 END) AS BIGINT) AS internal,
         CAST(SUM(CASE WHEN lu != lv THEN 1 ELSE 0 END) AS BIGINT) AS boundary
  FROM tg GROUP BY lu
),
siz AS (SELECT label, count(*) AS n_nodes FROM l3 GROUP BY label)
SELECT siz.label, CAST(siz.n_nodes AS BIGINT) AS n_nodes,
       COALESCE(per.internal, 0) AS internal,
       COALESCE(per.boundary, 0) AS boundary,
       COALESCE(per.internal, 0) + COALESCE(per.boundary, 0) AS volume,
       CAST(stot.s_total AS BIGINT) AS s_total,
       CASE WHEN COALESCE(per.internal, 0) + COALESCE(per.boundary, 0) = 0 THEN 0
            ELSE CAST(ROUND(1000000.0 * COALESCE(per.boundary, 0)
                            / (COALESCE(per.internal, 0) + COALESCE(per.boundary, 0)))
                      AS BIGINT)
       END AS conductance_ppm
FROM siz LEFT JOIN per ON siz.label = per.label
CROSS JOIN stot"""

    # --- a2 louvain: 2 levels x 2 synchronous local-move rounds, unrolled,
    # INCLUDING the between-level contraction (graph_metrics.py:louvain).
    # score(i,c) = T*k_ic - k_i*(K_c - [c=own]*k_i) in HUGEINT (Spark twin:
    # decimal(38,0)); singleton -> larger-label-singleton candidates dropped
    # (the Lu et al. swap guard); pick = row_number over (score DESC, c) —
    # the exact mirror of Spark's min_by(struct(-score, c)) -----------------
    def _louvain_round(X, prev, dg, aj):
        return f"""kc{X} AS MATERIALIZED (
  SELECT l.label, sum(d.k) AS kc FROM {prev} l JOIN {dg} d ON l.u = d.u GROUP BY l.label
), sz{X} AS MATERIALIZED (SELECT label, count(*) AS sz FROM {prev} GROUP BY label),
kic{X} AS MATERIALIZED (
  SELECT a.u, lb.label AS c, sum(a.w) AS kic
  FROM {aj} a JOIN {prev} lb ON a.v = lb.u WHERE a.u != a.v GROUP BY a.u, lb.label
), cand{X} AS MATERIALIZED (
  SELECT u, c, sum(kic) AS kic FROM (
    SELECT u, c, kic FROM kic{X}
    UNION ALL SELECT u, label AS c, CAST(0 AS BIGINT) AS kic FROM {prev}) s
  GROUP BY u, c
), sc{X} AS MATERIALIZED (
  SELECT cd.u, cd.c,
         CAST(t.t AS HUGEINT) * cd.kic
           - CAST(d.k AS HUGEINT) * (kc.kc - CASE WHEN cd.c = l.label THEN d.k ELSE 0 END) AS score
  FROM cand{X} cd
  JOIN {dg} d ON cd.u = d.u
  JOIN kc{X} kc ON cd.c = kc.label
  JOIN {prev} l ON cd.u = l.u
  JOIN sz{X} so ON l.label = so.label
  JOIN sz{X} st ON cd.c = st.label
  CROSS JOIN lvt t
  WHERE cd.c = l.label OR NOT (so.sz = 1 AND st.sz = 1 AND cd.c > l.label)
), L{X} AS MATERIALIZED (
  SELECT u, c AS label FROM (
    SELECT u, c, row_number() OVER (PARTITION BY u ORDER BY score DESC, c) AS rn
    FROM sc{X}) s WHERE rn = 1
)"""

    _lv_contract = """adj1 AS MATERIALIZED (
  SELECT la.label AS u, lb.label AS v, sum(a.w) AS w
  FROM adj0 a JOIN L0_2 la ON a.u = la.u JOIN L0_2 lb ON a.v = lb.u
  GROUP BY la.label, lb.label
), nid1 AS MATERIALIZED (SELECT DISTINCT label AS u FROM L0_2),
deg1 AS MATERIALIZED (
  SELECT n.u, COALESCE(s.k, 0) AS k FROM nid1 n
  LEFT JOIN (SELECT u, sum(w) AS k FROM adj1 GROUP BY u) s ON n.u = s.u
), L1_0 AS MATERIALIZED (SELECT u, u AS label FROM nid1)"""
    sql["a2_louvain"] = f"""WITH {g},
nf AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
nfn AS MATERIALIZED (SELECT src AS id FROM nf UNION SELECT dst FROM nf),
nfe AS MATERIALIZED (
  SELECT u, v FROM (SELECT src AS u, dst AS v FROM nf UNION SELECT dst, src FROM nf) s
  WHERE u != v
),
hn AS MATERIALIZED (SELECT id, {_md5_64("id", 0)} AS h FROM nfn),
adj0 AS MATERIALIZED (
  SELECT a.h AS u, b.h AS v, CAST(1 AS BIGINT) AS w
  FROM nfe e JOIN hn a ON e.u = a.id JOIN hn b ON e.v = b.id
),
nid0 AS MATERIALIZED (SELECT DISTINCT h AS u FROM hn),
deg0 AS MATERIALIZED (
  SELECT n.u, COALESCE(s.k, 0) AS k FROM nid0 n
  LEFT JOIN (SELECT u, sum(w) AS k FROM adj0 GROUP BY u) s ON n.u = s.u
),
lvt AS (SELECT COALESCE(sum(k), 0) AS t FROM deg0),
L0_0 AS MATERIALIZED (SELECT u, u AS label FROM nid0),
{_louvain_round("0_1", "L0_0", "deg0", "adj0")},
{_louvain_round("0_2", "L0_1", "deg0", "adj0")},
{_lv_contract},
{_louvain_round("1_1", "L1_0", "deg1", "adj1")},
{_louvain_round("1_2", "L1_1", "deg1", "adj1")}
SELECT hn.id, l2.label
FROM hn JOIN L0_2 m1 ON hn.h = m1.u JOIN L1_2 l2 ON m1.label = l2.u"""

    # --- a2 leiden: louvain's unrolled local-move rounds PLUS the
    # connectivity-refinement phase (graph_metrics.py:leiden): 8 min-label
    # rounds split coarse communities into connected components, contraction
    # runs on the REFINED partition, and level 1's local moves start SEEDED
    # with the coarse labels instead of singletons ---------------------------
    def _ld_refine_rounds(prefix, edge_cte):
        out = []
        prev = f"{prefix}0"
        for _i in range(1, 9):
            out.append(f"""{prefix}{_i} AS MATERIALIZED (
  SELECT r.u, LEAST(r.ref, COALESCE(m.nref, r.ref)) AS ref
  FROM {prev} r LEFT JOIN (
    SELECT w.u, MIN(p.ref) AS nref FROM {edge_cte} w JOIN {prev} p ON w.v = p.u GROUP BY w.u
  ) m ON r.u = m.u
)""")
            prev = f"{prefix}{_i}"
        return out

    _ld_refine = _ld_refine_rounds("rf", "rw")
    _ld_refine2 = _ld_refine_rounds("rg", "rw2")
    sql["a2_leiden"] = f"""WITH {g},
nf AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
nfn AS MATERIALIZED (SELECT src AS id FROM nf UNION SELECT dst FROM nf),
nfe AS MATERIALIZED (
  SELECT u, v FROM (SELECT src AS u, dst AS v FROM nf UNION SELECT dst, src FROM nf) s
  WHERE u != v
),
hn AS MATERIALIZED (SELECT id, {_md5_64("id", 0)} AS h FROM nfn),
adj0 AS MATERIALIZED (
  SELECT a.h AS u, b.h AS v, CAST(1 AS BIGINT) AS w
  FROM nfe e JOIN hn a ON e.u = a.id JOIN hn b ON e.v = b.id
),
nid0 AS MATERIALIZED (SELECT DISTINCT h AS u FROM hn),
deg0 AS MATERIALIZED (
  SELECT n.u, COALESCE(s.k, 0) AS k FROM nid0 n
  LEFT JOIN (SELECT u, sum(w) AS k FROM adj0 GROUP BY u) s ON n.u = s.u
),
lvt AS (SELECT COALESCE(sum(k), 0) AS t FROM deg0),
L0_0 AS MATERIALIZED (SELECT u, u AS label FROM nid0),
{_louvain_round("0_1", "L0_0", "deg0", "adj0")},
{_louvain_round("0_2", "L0_1", "deg0", "adj0")},
rw AS MATERIALIZED (
  SELECT a.u, a.v FROM adj0 a
  JOIN L0_2 la ON a.u = la.u JOIN L0_2 lb ON a.v = lb.u
  WHERE a.u != a.v AND la.label = lb.label
),
rf0 AS MATERIALIZED (SELECT u, u AS ref FROM nid0),
{", ".join(_ld_refine)},
adjr AS MATERIALIZED (
  SELECT ra.ref AS u, rb.ref AS v, sum(a.w) AS w
  FROM adj0 a JOIN rf8 ra ON a.u = ra.u JOIN rf8 rb ON a.v = rb.u
  GROUP BY ra.ref, rb.ref
),
init1 AS MATERIALIZED (
  SELECT DISTINCT rf.ref AS u, lc.label FROM rf8 rf JOIN L0_2 lc ON rf.u = lc.u
),
nid1 AS MATERIALIZED (SELECT u FROM init1),
deg1 AS MATERIALIZED (
  SELECT n.u, COALESCE(s.k, 0) AS k FROM nid1 n
  LEFT JOIN (SELECT u, sum(w) AS k FROM adjr GROUP BY u) s ON n.u = s.u
),
{_louvain_round("1_1", "init1", "deg1", "adjr")},
{_louvain_round("1_2", "L1_1", "deg1", "adjr")},
rw2 AS MATERIALIZED (
  SELECT a.u, a.v FROM adjr a
  JOIN L1_2 la ON a.u = la.u JOIN L1_2 lb ON a.v = lb.u
  WHERE a.u != a.v AND la.label = lb.label
),
rg0 AS MATERIALIZED (SELECT u, u AS ref FROM nid1),
{", ".join(_ld_refine2)}
SELECT hn.id, r2.ref AS label
FROM hn JOIN rf8 m1 ON hn.h = m1.u JOIN rg8 r2 ON m1.ref = r2.u"""

    # --- cypher gds.* CALL surface: the reference's four metric queries
    # (neo4j_metrics_utils.py) routed through plans/cypher.py:_run_gds_call.
    # wcc sizes/count: component = region subtree of the nation-family FK
    # graph (1 region + its nations + their customers + suppliers) ----------
    sql["cypher_gds_wcc_sizes"] = """
WITH per_region AS (SELECT n_regionkey AS region, count(*) AS nations FROM nation GROUP BY n_regionkey),
cust AS (SELECT n.n_regionkey AS region, count(*) AS c
         FROM customer cu JOIN nation n ON cu.c_nationkey = n.n_nationkey GROUP BY n.n_regionkey),
supp AS (SELECT n.n_regionkey AS region, count(*) AS s
         FROM supplier sp JOIN nation n ON sp.s_nationkey = n.n_nationkey GROUP BY n.n_regionkey)
SELECT CAST(1 + p.nations + coalesce(cust.c, 0) + coalesce(supp.s, 0) AS BIGINT) AS size
FROM per_region p LEFT JOIN cust ON cust.region = p.region
LEFT JOIN supp ON supp.region = p.region"""

    sql["cypher_gds_wcc_stats"] = """
SELECT CAST(count(DISTINCT n_regionkey) AS BIGINT) AS num_connected_components FROM nation"""

    # the mutate chain (wcc.mutate -> conductance.stream on the cached
    # projection): components have zero boundary by definition — one
    # all-zero conductance row per region tree
    sql["cypher_gds_mutate_chain"] = """
SELECT CAST(0 AS BIGINT) AS conductance_ppm FROM nation GROUP BY n_regionkey"""

    # the catalog flow (project -> wcc against the name -> drop) lands on the
    # same projected FK forest, so its sizes are the wcc_sizes restatement
    sql["cypher_gds_catalog"] = """
WITH per_region AS (SELECT n_regionkey AS region, count(*) AS nations FROM nation GROUP BY n_regionkey),
cust AS (SELECT n.n_regionkey AS region, count(*) AS c
         FROM customer cu JOIN nation n ON cu.c_nationkey = n.n_nationkey GROUP BY n.n_regionkey),
supp AS (SELECT n.n_regionkey AS region, count(*) AS s
         FROM supplier sp JOIN nation n ON sp.s_nationkey = n.n_nationkey GROUP BY n.n_regionkey)
SELECT CAST(1 + p.nations + coalesce(cust.c, 0) + coalesce(supp.s, 0) AS BIGINT) AS size
FROM per_region p LEFT JOIN cust ON cust.region = p.region
LEFT JOIN supp ON supp.region = p.region"""

    # apsp over the nation->region star forest: nation<->region ordered pairs
    # at distance 1, same-region nation pairs at distance 2 ------------------
    sql["cypher_gds_apsp"] = """
WITH nr AS (SELECT 'nation:' || n_nationkey AS n, 'region:' || n_regionkey AS r FROM nation)
SELECT CAST(1 AS BIGINT) AS distance FROM nr
UNION ALL SELECT CAST(1 AS BIGINT) FROM nr
UNION ALL
SELECT CAST(2 AS BIGINT) FROM nr a JOIN nr b ON a.r = b.r AND a.n != b.n"""

    # avg clustering of the sibling-augmented nation/region graph: generic
    # 3-way SQL triangle join mirroring graph_metrics.py:triangle_clustering
    # (2*tri/(d*(d-1)), deg<2 => 0), ppm-quantized --------------------------
    sql["cypher_gds_clustering"] = """
WITH nr AS (SELECT 'nation:' || n_nationkey AS n, 'region:' || n_regionkey AS r FROM nation),
sib AS (
  SELECT 'nation:' || n_nationkey AS a,
         'nation:' || LEAD(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS b
  FROM nation
),
ed AS (
  SELECT n AS u, r AS v FROM nr
  UNION SELECT a, b FROM sib WHERE b IS NOT NULL
),
und AS (SELECT u, v FROM ed UNION SELECT v, u FROM ed),
dg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
tri AS (
  SELECT e1.u AS v, count(*) AS t
  FROM und e1 JOIN und e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
  GROUP BY e1.u
),
uni AS (SELECT n AS id FROM nr UNION SELECT r FROM nr),
coef AS (
  SELECT uni.id,
         CASE WHEN COALESCE(dg.d, 0) >= 2
              THEN 2.0 * COALESCE(tri.t, 0) / (dg.d * (dg.d - 1))
              ELSE CAST(0 AS DOUBLE) END AS c
  FROM uni LEFT JOIN dg ON uni.id = dg.u LEFT JOIN tri ON uni.id = tri.v
)
SELECT CAST(ROUND(AVG(c) * 1000000.0) AS BIGINT) AS avg_clustering_ppm FROM coef"""

    # --- gen rmat: the full 7-level quadrant recursion over range(1024),
    # same md5 fraction, same float thresholds (repr-embedded so both
    # engines parse the identical doubles), bits summed MSB-first
    # (graph_generators.py:rmat_edges) ---------------------------------------
    _rm_scale, _rm_seed = 7, 5
    _rm_t1, _rm_t2, _rm_t3 = 0.57, 0.57 + 0.19, 0.57 + 0.19 + 0.19
    _rm_keys = [
        "CAST(i AS VARCHAR) || '|' || '" + str(_l) + "'" for _l in range(_rm_scale)
    ]
    _rm_us = ", ".join(
        f"CAST({_md5_64(_rm_keys[_l], _rm_seed)} AS DOUBLE)"
        f" / 1152921504606846976.0 AS u{_l}"
        for _l in range(_rm_scale)
    )
    _rm_src = " + ".join(
        f"(CASE WHEN u{_l} >= {_rm_t2!r} THEN 1 ELSE 0 END) * {1 << (_rm_scale - 1 - _l)}"
        for _l in range(_rm_scale)
    )
    _rm_dst = " + ".join(
        f"(CASE WHEN (u{_l} >= {_rm_t1!r} AND u{_l} < {_rm_t2!r})"
        f" OR u{_l} >= {_rm_t3!r} THEN 1 ELSE 0 END) * {1 << (_rm_scale - 1 - _l)}"
        for _l in range(_rm_scale)
    )
    sql["gen_rmat_graph"] = f"""
WITH base AS (SELECT i FROM range({8 * (1 << _rm_scale)}) t(i)),
us AS (SELECT i, {_rm_us} FROM base)
SELECT CAST(i AS BIGINT) AS edge_id,
       CAST({_rm_src} AS BIGINT) AS src,
       CAST({_rm_dst} AS BIGINT) AS dst
FROM us"""

    # --- gen uniform: endpoint = md5(seed|i|side) mod n over range(800)
    # (graph_generators.py:uniform_edges) ------------------------------------
    _gu_s = _md5_64("CAST(i AS VARCHAR) || '|' || 's'", 6)
    _gu_d = _md5_64("CAST(i AS VARCHAR) || '|' || 'd'", 6)
    sql["gen_uniform_graph"] = f"""
SELECT CAST(i AS BIGINT) AS edge_id,
       CAST({_gu_s} % 100 AS BIGINT) AS src,
       CAST({_gu_d} % 100 AS BIGINT) AS dst
FROM range(800) t(i)"""

    # --- gen watts-strogatz: ring lattice (n=60, k=6) with p=0.2 rewiring,
    # decision u = md5(seed|idx|r)/2^60, target md5(seed|idx|t) mod n,
    # self-loop rewires keep the lattice edge
    # (graph_generators.py:watts_strogatz_edges) ------------------------------
    _ws_rk = "CAST(i AS VARCHAR) || '|r'"
    _ws_tk = "CAST(i AS VARCHAR) || '|t'"
    _ws_u = f"CAST({_md5_64(_ws_rk, 8)} AS DOUBLE) / 1152921504606846976.0"
    _ws_t = f"{_md5_64(_ws_tk, 8)} % 60"
    sql["gen_ws_graph"] = f"""
WITH base AS (
  SELECT i, i // 3 AS node, 1 + (i % 3) AS j, {_ws_u} AS u, {_ws_t} AS t
  FROM range(180) r(i)
)
SELECT CAST(i AS BIGINT) AS edge_id,
       CAST(node AS BIGINT) AS src,
       CAST(CASE WHEN u < 0.2 AND t != node THEN t
                 ELSE (node + j) % 60 END AS BIGINT) AS dst
FROM base"""

    # --- cypher gds closeness: structural answer over the star forest
    # (nation: reach k over total 2k-1; region: 1.0), operand order
    # mirroring _gds_procedure's CAST(reach AS DOUBLE) / total ---------------
    sql["cypher_gds_closeness"] = """
WITH per AS (SELECT n_regionkey AS r, count(*) AS k FROM nation GROUP BY n_regionkey)
SELECT 'nation:' || n.n_nationkey AS id,
       CAST(ROUND((CAST(p.k AS DOUBLE) / (2 * p.k - 1)) * 1000000.0) AS BIGINT) AS score_ppm
FROM nation n JOIN per p ON n.n_regionkey = p.r
UNION ALL
SELECT 'region:' || p.r AS id,
       CAST(ROUND((CAST(p.k AS DOUBLE) / p.k) * 1000000.0) AS BIGINT) AS score_ppm
FROM per p"""

    # --- CALL gds.knn.stream (r12): exact per-node top-10 cosine over the
    # embeddings-as-property projection; raw sequential-fold cosine ranks
    # (bit-identical cross-engine), ppm-quantized similarity in the hash --
    _knn_s = (
        "list_dot_product(e2.v, q.v) / "
        "(sqrt(list_dot_product(e2.v, e2.v)) * sqrt(list_dot_product(q.v, q.v)))"
    )
    sql["cypher_gds_knn"] = f"""
WITH e AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.id AS node1, e2.id AS node2, {_knn_s} AS s,
         row_number() OVER (PARTITION BY q.id ORDER BY {_knn_s} DESC, e2.id) AS rk
  FROM e q JOIN e e2 ON e2.id != q.id
)
SELECT node1, node2, CAST(round(s * 1000000.0) AS BIGINT) AS sim_ppm
FROM scored WHERE rk <= 10"""

    # --- CALL gds.conductance.stream (r12): nation->region star forest
    # with community = key % 3; exact BIGINT ordered-pair counts + the one
    # ppm-rounded division (the a2_conductance arithmetic via CALL) --------
    sql["cypher_gds_conductance"] = """
WITH nat AS (SELECT n_nationkey AS k, n_regionkey AS r FROM nation),
nodes AS (
  SELECT 'nation:' || CAST(k AS VARCHAR) AS id, k % 3 AS community FROM nat
  UNION
  SELECT DISTINCT 'region:' || CAST(r AS VARCHAR), r % 3 FROM nat
),
pairs AS (SELECT 'nation:' || CAST(k AS VARCHAR) AS a, 'region:' || CAST(r AS VARCHAR) AS b FROM nat),
sym AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
tagged AS (
  SELECT na.community AS ca, nb.community AS cb
  FROM sym s JOIN nodes na ON s.a = na.id JOIN nodes nb ON s.b = nb.id
),
per AS (
  SELECT ca AS community,
         CAST(SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT) AS internal,
         CAST(SUM(CASE WHEN ca != cb THEN 1 ELSE 0 END) AS BIGINT) AS boundary
  FROM tagged GROUP BY ca
)
SELECT community,
       CAST(round((CAST(boundary AS DOUBLE)
                   / greatest(CAST(internal + boundary AS DOUBLE), 1.0)) * 1000000.0)
            AS BIGINT) AS conductance_ppm
FROM per"""

    # --- cypher gds.modularity.stream: same key-%-3 labeling as the
    # conductance oracle; exact BIGINT/HUGEINT pair counts, the operator's
    # single double division (S*S_c - d_c^2)/S^2, ppm-rounded ---------------
    sql["cypher_gds_modularity"] = """
WITH nat AS (SELECT n_nationkey AS k, n_regionkey AS r FROM nation),
nodes AS (
  SELECT 'nation:' || CAST(k AS VARCHAR) AS id, k % 3 AS community FROM nat
  UNION
  SELECT DISTINCT 'region:' || CAST(r AS VARCHAR), r % 3 FROM nat
),
pairs AS (SELECT 'nation:' || CAST(k AS VARCHAR) AS a, 'region:' || CAST(r AS VARCHAR) AS b FROM nat),
sym AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
tagged AS (
  SELECT na.community AS ca, nb.community AS cb
  FROM sym s JOIN nodes na ON s.a = na.id JOIN nodes nb ON s.b = nb.id
),
tot AS (SELECT COUNT(*) AS s FROM tagged),
per AS (
  SELECT ca AS community,
         SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS w,
         COUNT(*) AS d
  FROM tagged GROUP BY ca
),
allc AS (SELECT DISTINCT community FROM nodes)
SELECT a.community,
       CAST(round((CAST(t.s * COALESCE(p.w, 0) - COALESCE(p.d, 0) * COALESCE(p.d, 0) AS DOUBLE)
                   / (CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE))) * 1000000.0)
            AS BIGINT) AS modularity_ppm
FROM allc a LEFT JOIN per p ON a.community = p.community CROSS JOIN tot t"""

    # --- cypher gds.scaleProperties.stream: MinMax over two part columns;
    # MIN/MAX are order-free statistics, the per-row arithmetic is the
    # operator's exact operand order (x - min) / (max - min), ppm-rounded --
    sql["cypher_gds_scale_properties"] = """
WITH p AS (
  SELECT 'part:' || CAST(p_partkey AS VARCHAR) AS id,
         CAST(p_retailprice AS DOUBLE) AS price,
         CAST(p_size AS DOUBLE) AS size
  FROM part
),
s AS (SELECT MIN(price) AS mnp, MAX(price) AS mxp,
             MIN(size) AS mns, MAX(size) AS mxs FROM p)
SELECT id, j, CAST(round(v * 1000000.0) AS BIGINT) AS scaled_ppm FROM (
  SELECT id, 0 AS j,
         CASE WHEN mxp - mnp = 0 THEN 0.0 ELSE (price - mnp) / (mxp - mnp) END AS v
  FROM p CROSS JOIN s
  UNION ALL
  SELECT id, 1,
         CASE WHEN mxs - mns = 0 THEN 0.0 ELSE (size - mns) / (mxs - mns) END
  FROM p CROSS JOIN s
) q"""

    # --- cypher gds.spanningTree.stream: the FK subgraph is a forest, so
    # region:0's MST is its tree and every parent is structurally forced —
    # nations parent to region:0, customers/suppliers to their nation ------
    sql["cypher_gds_spanning"] = """
WITH nat0 AS (SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 0)
SELECT 'region:0' AS nodeId, 'region:0' AS parentId, CAST(0 AS BIGINT) AS weight
UNION ALL
SELECT 'nation:' || CAST(k AS VARCHAR), 'region:0', CAST(1 AS BIGINT) FROM nat0
UNION ALL
SELECT 'customer:' || CAST(c_custkey AS VARCHAR),
       'nation:' || CAST(c_nationkey AS VARCHAR), CAST(1 AS BIGINT)
FROM customer WHERE c_nationkey IN (SELECT k FROM nat0)
UNION ALL
SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR),
       'nation:' || CAST(s_nationkey AS VARCHAR), CAST(1 AS BIGINT)
FROM supplier WHERE s_nationkey IN (SELECT k FROM nat0)"""

    # --- td bpe pairs: first-round merge candidates (operators/bpe.py) —
    # word frequencies under the BPE-ish pre-tokenizer, chars + '</w>'
    # symbols, adjacent-pair counts weighted by word count, top-20 under
    # the deterministic (cnt desc, left, right) order ---------------------
    from cognee_graphdb_spark.operators.text_analysis import _BPE_ISH_PATTERN

    _bpe_pat = _BPE_ISH_PATTERN.replace("'", "''")
    sql["td_bpe_pairs"] = f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(text, '{_bpe_pat}', 0)) AS word
  FROM documents
),
wf AS (SELECT word, COUNT(*) AS n FROM words GROUP BY word),
sym AS (
  SELECT list_append(list_filter(string_split(word, ''), x -> x != ''), '</w>') AS s, n
  FROM wf
),
pz AS (SELECT unnest(list_zip(s, s[2:])) AS p, n FROM sym),
pc AS (
  SELECT p[1] AS "left", p[2] AS "right", CAST(SUM(n) AS BIGINT) AS cnt
  FROM pz WHERE p[2] IS NOT NULL GROUP BY 1, 2
)
SELECT "left", "right", cnt FROM pc
ORDER BY cnt DESC, "left", "right" LIMIT 20"""

    # --- a2 scc: the structural answer to the hub-star construction
    # (graph_metrics.py:strongly_connected_components runs the general
    # Orzan coloring; here the SCC partition is known by construction:
    # customers of a nation = one SCC through the hub, label = the nation's
    # max customer hash; nation/region nodes = singletons, label = own hash)
    sql["a2_scc"] = f"""
SELECT id, label FROM (
  SELECT 'customer:' || c_custkey AS id,
         MAX({_md5_64("'customer:' || c_custkey", 0)})
           OVER (PARTITION BY c_nationkey) AS label
  FROM customer
  UNION ALL
  SELECT 'nation:' || n_nationkey AS id,
         {_md5_64("'nation:' || n_nationkey", 0)} AS label
  FROM nation
  UNION ALL
  SELECT 'region:' || r_regionkey AS id,
         {_md5_64("'region:' || r_regionkey", 0)} AS label
  FROM region
) s"""

    # --- a2 random walks: 4 unrolled hash-guided steps (graph_metrics.py:
    # random_walks; neighbor = md5_64(start|walk|step|cur, seed 3) mod degree
    # over the rank-ordered DISTINCT undirected adjacency) -------------------
    _rw_steps = []
    for _i in range(1, 5):
        _rw_hash = _md5_64(
            f"concat(f.start, '|', f.walk, '|', {_i}, '|', f.cur)", 3
        )
        _rw_steps.append(f"""f{_i} AS MATERIALIZED (
  SELECT f.start, f.walk, a.v AS cur
  FROM f{_i - 1} f JOIN rwadj a
    ON a.u = f.cur AND a.rnk = {_rw_hash} % a.degree
)""")
    _rw_graph = f"""rwnf AS MATERIALIZED (SELECT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
rwnn AS MATERIALIZED (
  SELECT id, {_md5_64("id", 0)} AS h
  FROM (SELECT src AS id FROM rwnf UNION SELECT dst FROM rwnf)
),
rwe AS MATERIALIZED (
  SELECT DISTINCT a.h AS u, b.h AS v
  FROM (SELECT src, dst FROM rwnf UNION ALL SELECT dst AS src, src AS dst FROM rwnf) s
  JOIN rwnn a ON s.src = a.id JOIN rwnn b ON s.dst = b.id
  WHERE s.src != s.dst
)"""
    _rw_adj = f"""{_rw_graph},
rwadj AS MATERIALIZED (
  SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS rnk,
         count(*) OVER (PARTITION BY u) AS degree
  FROM rwe
)"""
    _rw_core = f"""{_rw_adj},
f0 AS MATERIALIZED (
  SELECT h AS start, w.walk, h AS cur
  FROM rwnn CROSS JOIN (SELECT UNNEST([0, 1]) AS walk) w
),
{", ".join(_rw_steps)},
rwres AS (
  SELECT start, walk, 0 AS step, cur AS node FROM f0
  UNION ALL SELECT start, walk, 1, cur FROM f1
  UNION ALL SELECT start, walk, 2, cur FROM f2
  UNION ALL SELECT start, walk, 3, cur FROM f3
  UNION ALL SELECT start, walk, 4, cur FROM f4
)"""
    sql["a2_random_walks"] = f"""WITH {g},
{_rw_core}
SELECT n1.id AS start, CAST(r.walk AS BIGINT) AS walk,
       string_agg(n2.id, '->' ORDER BY r.step) AS path,
       CAST(max(r.step) AS BIGINT) AS n_steps
FROM rwres r JOIN rwnn n1 ON r.start = n1.h JOIN rwnn n2 ON r.node = n2.h
GROUP BY n1.id, r.walk"""

    # --- a2 shortest-path counts: 4 unrolled BFS hops from the region nodes
    # with per-hop settled-set anti-join and sigma accumulation
    # (graph_metrics.py:shortest_path_counts) --------------------------------
    _sp_hops = []
    for _i in range(1, 5):
        _sp_hops.append(f"""d{_i} AS MATERIALIZED (
  SELECT f.s, e.v AS n, CAST(sum(f.sigma) AS BIGINT) AS sigma
  FROM d{_i - 1} f JOIN rwe e ON f.n = e.u
  WHERE NOT EXISTS (SELECT 1 FROM st{_i - 1} x WHERE x.s = f.s AND x.n = e.v)
  GROUP BY f.s, e.v
), st{_i} AS MATERIALIZED (
  SELECT * FROM st{_i - 1} UNION ALL SELECT s, n, {_i} AS dist, sigma FROM d{_i}
)""")
    sql["a2_shortest_path_counts"] = f"""WITH {g},
{_rw_graph},
d0 AS MATERIALIZED (
  SELECT h AS s, h AS n, CAST(1 AS BIGINT) AS sigma FROM rwnn WHERE id LIKE 'region:%'
),
st0 AS MATERIALIZED (SELECT s, n, 0 AS dist, sigma FROM d0),
{", ".join(_sp_hops)}
SELECT n1.id AS source, n2.id AS node, CAST(st.dist AS INTEGER) AS dist, st.sigma
FROM st4 st JOIN rwnn n1 ON st.s = n1.h JOIN rwnn n2 ON st.n = n2.h"""

    # --- a2 betweenness: Brandes forward (4 unrolled BFS hops with sigma)
    # then backward (3 unrolled dependency levels) from the region nodes over
    # the region-nation-supplier-partsupp-part subgraph; every float sum is a
    # list_reduce over an ORDER BY list — the exact sequential IEEE order
    # graph_metrics.py:betweenness_sampled uses --------------------------------
    _bt_hops = []
    for _i in range(1, 5):
        _bt_hops.append(f"""bd{_i} AS MATERIALIZED (
  SELECT f.s, e.v AS n, CAST(sum(f.sigma) AS BIGINT) AS sigma
  FROM bd{_i - 1} f JOIN bte e ON f.n = e.u
  WHERE NOT EXISTS (SELECT 1 FROM bst{_i - 1} x WHERE x.s = f.s AND x.n = e.v)
  GROUP BY f.s, e.v
), bst{_i} AS MATERIALIZED (
  SELECT * FROM bst{_i - 1} UNION ALL SELECT s, n, {_i} AS dist, sigma FROM bd{_i}
)""")
    _bt_lvls = []
    for _t in range(3, -1, -1):
        _prev_dl = (
            f"LEFT JOIN dl{_t + 1} d ON d.s = nx.s AND d.n = nx.n"
            if _t < 3
            else "LEFT JOIN (SELECT NULL AS s, NULL AS n, NULL AS delta WHERE 1=0) d ON d.s = nx.s AND d.n = nx.n"
        )
        _bt_lvls.append(f"""dl{_t} AS MATERIALIZED (
  SELECT c.s, c.n, list_reduce(list(c.c ORDER BY c.wid), (a, b) -> a + b) AS delta
  FROM (
    SELECT cur.s, cur.n, wn.id AS wid,
           (CAST(cur.sigma AS DOUBLE) / CAST(nx.sigma AS DOUBLE))
             * (CAST(1.0 AS DOUBLE) + COALESCE(d.delta, CAST(0.0 AS DOUBLE))) AS c
    FROM bst4 cur
    JOIN bte e ON cur.n = e.u
    JOIN bst4 nx ON nx.s = cur.s AND nx.n = e.v AND nx.dist = {_t + 1}
    {_prev_dl}
    JOIN btnn wn ON e.v = wn.h
    WHERE cur.dist = {_t}
  ) c GROUP BY c.s, c.n
)""")
    sql["a2_betweenness"] = f"""WITH {g},
btnf AS MATERIALIZED (SELECT src, dst FROM edges
      WHERE relationship_name IN ('n_regionkey', 's_nationkey', 'l_suppkey', 'l_partkey')),
btnn AS MATERIALIZED (
  SELECT id, {_md5_64("id", 0)} AS h
  FROM (SELECT src AS id FROM btnf UNION SELECT dst FROM btnf)
),
bte AS MATERIALIZED (
  SELECT DISTINCT a.h AS u, b.h AS v
  FROM (SELECT src, dst FROM btnf UNION ALL SELECT dst AS src, src AS dst FROM btnf) s
  JOIN btnn a ON s.src = a.id JOIN btnn b ON s.dst = b.id
  WHERE s.src != s.dst
),
bd0 AS MATERIALIZED (
  SELECT h AS s, h AS n, CAST(1 AS BIGINT) AS sigma FROM btnn WHERE id LIKE 'region:%'
),
bst0 AS MATERIALIZED (SELECT s, n, 0 AS dist, sigma FROM bd0),
{", ".join(_bt_hops)},
{", ".join(_bt_lvls)},
alld AS (
  SELECT d.s, d.n, d.delta, sn.id AS source_id
  FROM (SELECT * FROM dl0 UNION ALL SELECT * FROM dl1
        UNION ALL SELECT * FROM dl2 UNION ALL SELECT * FROM dl3) d
  JOIN btnn sn ON d.s = sn.h
  WHERE d.n != d.s
)
SELECT nn.id AS node,
       list_reduce(list(a.delta ORDER BY a.source_id), (x, y) -> x + y) AS betweenness
FROM alld a JOIN btnn nn ON a.n = nn.h
GROUP BY nn.id
ORDER BY betweenness DESC, node LIMIT 500"""

    # --- a2 node2vec walks: step 1 uniform (hash mod degree), steps 2..3
    # second-order biased — integer prefix-count cumulative weights x
    # {1/p=0.5, 1, 1/q=2}, last-candidate fallback for the r*W==W edge
    # (graph_metrics.py:node2vec_walks, p=2 q=0.5 seed=3) ---------------------
    _n2_steps = []
    for _t in (2, 3):
        _n2_thr_h = _md5_64(
            f"concat(s.start, '|', s.walk, '|', {_t}, '|', s.prev, '|', s.cur)", 3
        )
        _n2_steps.append(f"""c{_t} AS MATERIALIZED (
  SELECT f.start, f.walk, f.prev, f.cur, a.v, a.rnk, a.degree,
         CASE WHEN a.v = f.prev THEN 0
              WHEN EXISTS (SELECT 1 FROM rwe pe WHERE pe.u = f.prev AND pe.v = a.v) THEN 1
              ELSE 2 END AS cls
  FROM n2f{_t - 1} f JOIN rwadj a ON f.cur = a.u
), s{_t}w AS MATERIALIZED (
  SELECT *,
    SUM(CASE WHEN cls = 0 THEN 1 ELSE 0 END) OVER (PARTITION BY start, walk ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
    SUM(CASE WHEN cls = 1 THEN 1 ELSE 0 END) OVER (PARTITION BY start, walk ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
    SUM(CASE WHEN cls = 2 THEN 1 ELSE 0 END) OVER (PARTITION BY start, walk ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
    SUM(CASE WHEN cls = 0 THEN 1 ELSE 0 END) OVER (PARTITION BY start, walk) AS ta,
    SUM(CASE WHEN cls = 1 THEN 1 ELSE 0 END) OVER (PARTITION BY start, walk) AS tb,
    SUM(CASE WHEN cls = 2 THEN 1 ELSE 0 END) OVER (PARTITION BY start, walk) AS tc
  FROM c{_t}
), n2f{_t} AS MATERIALIZED (
  SELECT start, walk, cur AS prev, v AS cur FROM (
    SELECT s.*,
      ((CAST(s.ca - CASE WHEN s.cls = 0 THEN 1 ELSE 0 END AS DOUBLE) * 0.5
        + CAST(s.cb - CASE WHEN s.cls = 1 THEN 1 ELSE 0 END AS DOUBLE))
        + CAST(s.cc - CASE WHEN s.cls = 2 THEN 1 ELSE 0 END AS DOUBLE) * 2.0) AS cum_prev,
      ((CAST(s.ca AS DOUBLE) * 0.5 + CAST(s.cb AS DOUBLE)) + CAST(s.cc AS DOUBLE) * 2.0) AS cum,
      (CAST({_n2_thr_h} % 4503599627370496 AS DOUBLE) / 4503599627370496.0)
        * ((CAST(s.ta AS DOUBLE) * 0.5 + CAST(s.tb AS DOUBLE)) + CAST(s.tc AS DOUBLE) * 2.0) AS thr
    FROM s{_t}w s) z
  WHERE z.cum_prev <= z.thr AND (z.thr < z.cum OR z.rnk = z.degree - 1)
)""")
    _n2_h1 = _md5_64("concat(f.start, '|', f.walk, '|', 1, '|', f.cur)", 3)
    sql["a2_node2vec_walks"] = f"""WITH {g},
{_rw_adj},
n2f0 AS MATERIALIZED (
  SELECT h AS start, w.walk, h AS prev, h AS cur
  FROM rwnn CROSS JOIN (SELECT UNNEST([0, 1]) AS walk) w
),
n2f1 AS MATERIALIZED (
  SELECT f.start, f.walk, f.cur AS prev, a.v AS cur
  FROM n2f0 f JOIN rwadj a
    ON a.u = f.cur AND a.rnk = {_n2_h1} % a.degree
),
{", ".join(_n2_steps)},
n2res AS (
  SELECT start, walk, 0 AS step, cur AS node FROM n2f0
  UNION ALL SELECT start, walk, 1, cur FROM n2f1
  UNION ALL SELECT start, walk, 2, cur FROM n2f2
  UNION ALL SELECT start, walk, 3, cur FROM n2f3
)
SELECT n1.id AS start, CAST(r.walk AS BIGINT) AS walk,
       string_agg(n2.id, '->' ORDER BY r.step) AS path,
       CAST(max(r.step) AS BIGINT) AS n_steps
FROM n2res r JOIN rwnn n1 ON r.start = n1.h JOIN rwnn n2 ON r.node = n2.h
GROUP BY n1.id, r.walk"""

    # --- a2 walk skip-grams: the DeepWalk corpus stage (graph_metrics.py:
    # walk_skipgram_pairs over the same walks): ordered pairs within window 2
    # of the same trajectory, aggregated to counts -----------------------------
    sql["a2_walk_skipgrams"] = f"""WITH {g},
{_rw_core},
sgn AS MATERIALIZED (
  SELECT r.start, r.walk, r.step, n.id AS node
  FROM rwres r JOIN rwnn n ON r.node = n.h
)
SELECT a.node AS center, b.node AS context, CAST(count(*) AS BIGINT) AS n_pairs
FROM sgn a JOIN sgn b ON a.start = b.start AND a.walk = b.walk
WHERE abs(a.step - b.step) <= 2 AND a.step != b.step
GROUP BY center, context"""

    # --- a2 HyperANF: 5 unrolled register-wise-max rounds over m=16 HLL
    # sketches seeded from md5_64(id); raw-estimator sums are one correctly-
    # rounded division from exact-integer register masses (2^(56-r)), so the
    # per-hop totals hash-match.  c_num repr()s the Python-folded
    # alpha*m^2*2^56 double graph_metrics.py:approx_neighborhood_function
    # divides by. ------------------------------------------------------------
    _ha_c = "1.241465876160653e+19"
    _ha_est = (
        "CAST(SUM(CAST(ROUND({c} / CAST(list_sum(list_transform(sk, "
        "r -> CAST(1 AS BIGINT) << (56 - r))) AS BIGINT)) AS BIGINT)) AS BIGINT)"
    ).format(c=_ha_c)
    _ha_zero = (
        "CAST(SUM(CAST(list_sum(list_transform(sk, "
        "r -> CASE WHEN r = 0 THEN 1 ELSE 0 END)) AS BIGINT)) AS BIGINT)"
    )
    _ha_rounds = []
    _prev_s = "s0"
    for _i in range(1, 6):
        _ha_rounds.append(f"""x{_i} AS MATERIALIZED (
  SELECT u, idx, max(val) AS val FROM (
    SELECT u, unnest(range(0, 16)) AS idx, unnest(sk) AS val FROM (
      SELECT u, sk FROM {_prev_s}
      UNION ALL
      SELECT e.u, s.sk FROM nfe e JOIN {_prev_s} s ON e.v = s.u) a
  ) z GROUP BY u, idx
), s{_i} AS MATERIALIZED (SELECT u, list(val ORDER BY idx) AS sk FROM x{_i} GROUP BY u)""")
        _prev_s = f"s{_i}"
    _ha_h = _md5_64("id", 0)
    _ha_prefix = f"""nf AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
nfn AS MATERIALIZED (SELECT src AS id FROM nf UNION SELECT dst FROM nf),
nfh AS MATERIALIZED (SELECT {_ha_h} AS u FROM nfn),
nfe AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT {_md5_64("src", 0)} AS u, {_md5_64("dst", 0)} AS v FROM nf
    UNION SELECT {_md5_64("dst", 0)}, {_md5_64("src", 0)} FROM nf) s
  WHERE u != v
),
seed AS MATERIALIZED (
  SELECT u, u & 15 AS idx,
         CASE WHEN (u >> 4) = 0 THEN 56
              ELSE least(56, CAST(log2(CAST(((u >> 4) & -(u >> 4)) AS DOUBLE)) AS BIGINT) + 1)
         END AS rho
  FROM nfh
),
s0 AS MATERIALIZED (
  SELECT u, list_transform(range(0, 16),
         i -> CAST(CASE WHEN i = idx THEN rho ELSE 0 END AS INTEGER)) AS sk
  FROM seed
)"""
    sql["a2_hyperanf"] = f"""WITH {g},
{_ha_prefix},
{", ".join(_ha_rounds)}
{" UNION ALL ".join(
    f'SELECT CAST({_t} AS INTEGER) AS hop, {_ha_est} AS raw_est_sum, {_ha_zero} AS zero_regs FROM s{_t}'
    for _t in range(6)
)}"""

    # --- a2 harmonic closeness: per-node raw-estimator deltas over the SAME
    # sketch rounds (graph_metrics.py:approx_harmonic_closeness, raw mode);
    # h_scaled = sum_t delta_t * lcm(1..3)/t — integer once each per-round
    # estimate is rounded to BIGINT -------------------------------------------
    _hc_e = (
        "CAST(ROUND({c} / CAST(list_sum(list_transform(sk, "
        "r -> CAST(1 AS BIGINT) << (56 - r))) AS BIGINT)) AS BIGINT)"
    ).format(c=_ha_c)
    sql["a2_harmonic_closeness"] = f"""WITH {g},
{_ha_prefix},
{", ".join(_ha_rounds[:3])},
{", ".join(f"est{_t} AS MATERIALIZED (SELECT u, {_hc_e} AS e FROM s{_t})" for _t in range(4))},
idm AS (SELECT id, {_ha_h} AS u FROM nfn)
SELECT idm.id,
       CAST((e1.e - e0.e) * 6 + (e2.e - e1.e) * 3 + (e3.e - e2.e) * 2 AS BIGINT) AS h_scaled
FROM est0 e0 JOIN est1 e1 USING (u) JOIN est2 e2 USING (u) JOIN est3 e3 USING (u)
JOIN idm USING (u)"""

    # --- a2 node similarity: Jaccard over neighbor sets, top-5 per node;
    # pair candidates per shared neighbor, both directions emitted, rank by
    # IEEE-identical i/u ratio then partner id --------------------------------
    sql["a2_node_similarity"] = f"""WITH {g},
nf AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
nfe AS MATERIALIZED (
  SELECT u, v FROM (SELECT src AS u, dst AS v FROM nf UNION SELECT dst, src FROM nf) s
  WHERE u != v
),
deg AS MATERIALIZED (SELECT u, count(*) AS deg FROM nfe GROUP BY u),
inter AS MATERIALIZED (
  SELECT a.u AS ua, b.u AS ub, count(*) AS i
  FROM nfe a JOIN nfe b ON a.v = b.v AND a.u < b.u
  GROUP BY a.u, b.u
),
sized AS MATERIALIZED (
  SELECT ua, ub, i, da.deg + db.deg - i AS un
  FROM inter JOIN deg da ON inter.ua = da.u JOIN deg db ON inter.ub = db.u
),
bidir AS (
  SELECT ua, ub, i, un FROM sized
  UNION ALL SELECT ub, ua, i, un FROM sized
)
SELECT ua AS id_a, ub AS id_b, CAST(i AS BIGINT) AS intersection,
       CAST(un AS BIGINT) AS union_size,
       CAST(ROUND((CAST(i AS DOUBLE) / un) * 1000000.0) AS BIGINT) AS jaccard_ppm
FROM (
  SELECT ua, ub, i, un,
         row_number() OVER (PARTITION BY ua
                            ORDER BY (CAST(i AS DOUBLE) / un) DESC, ub) AS rn
  FROM bidir) s
WHERE rn <= 5"""

    # --- SemDeDup: seeded spherical k-means + within-cluster prune -----------
    # mirrors dedup.py:semdedup(k=8, threshold=0.35, n_iter=1, hasher=md5_64);
    # unit vectors and pairwise dots are bit-identical (sequential folds), so
    # only the centroid means carry engine-side fp noise — far below every
    # branch margin
    _sd_h = _md5_64("id", 41)
    _sd_unit = (
        "CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v "
        "ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v))) END"
    )
    _sd_renorm = (
        "CASE WHEN sqrt(list_dot_product(r.raw, r.raw)) = 0 THEN r.raw "
        "ELSE list_transform(r.raw, x -> x / sqrt(list_dot_product(r.raw, r.raw))) END"
    )
    # the kmeans chain (seeds -> one recenter round -> final assignment) is
    # shared VERBATIM by dedup_semdedup and a2_kmeans — the operator side is
    # literally one implementation too (dedup.py:_spherical_kmeans,
    # extracted r12 per VERDICT #5)
    _sd_kmeans_ctes = f"""base AS (
  SELECT CAST(vec_id AS VARCHAR) AS id, embedding::DOUBLE[] AS v FROM embeddings
),
unitv AS (SELECT id, {_sd_unit} AS u FROM base),
seeds AS (
  SELECT id, u, rn - 1 AS cluster FROM (
    SELECT id, u, row_number() OVER (ORDER BY {_sd_h}, id) AS rn FROM unitv) s
  WHERE rn <= 8
),
c0 AS (SELECT cluster, u AS c FROM seeds),
asg0 AS (
  SELECT id, u, cluster, sim FROM (
    SELECT t.id, t.u, c.cluster, list_dot_product(t.u, c.c) AS sim,
           row_number() OVER (PARTITION BY t.id
                              ORDER BY list_dot_product(t.u, c.c) DESC, c.cluster) AS rn
    FROM unitv t CROSS JOIN c0 c) s
  WHERE rn = 1
),
m1 AS (
  SELECT cluster, pos, avg(x) AS m FROM (
    SELECT cluster, unnest(u) AS x, unnest(range(1, len(u) + 1)) AS pos FROM asg0) z
  GROUP BY cluster, pos
),
raw1 AS (SELECT cluster, list(m ORDER BY pos) AS raw FROM m1 GROUP BY cluster),
c1 AS (
  SELECT c0.cluster, COALESCE({_sd_renorm}, c0.c) AS c
  FROM c0 LEFT JOIN raw1 r ON c0.cluster = r.cluster
),
final AS (
  SELECT id, u, cluster, sim FROM (
    SELECT t.id, t.u, c.cluster, list_dot_product(t.u, c.c) AS sim,
           row_number() OVER (PARTITION BY t.id
                              ORDER BY list_dot_product(t.u, c.c) DESC, c.cluster) AS rn
    FROM unitv t CROSS JOIN c1 c) s
  WHERE rn = 1
)"""
    sql["a2_kmeans"] = f"""WITH {_sd_kmeans_ctes}
SELECT id, CAST(cluster AS BIGINT) AS cluster FROM final"""
    sql["dedup_semdedup"] = f"""WITH {_sd_kmeans_ctes},
dropped AS (
  SELECT DISTINCT a.id
  FROM final a JOIN final b ON a.cluster = b.cluster AND a.id != b.id
  WHERE list_dot_product(a.u, b.u) > 0.35
    AND (b.sim < a.sim OR (b.sim = a.sim AND b.id < a.id))
)
SELECT f.id, CAST(f.cluster AS BIGINT) AS cluster, (d.id IS NULL) AS keep
FROM final f LEFT JOIN dropped d ON f.id = d.id"""

    # --- fastRP (node_embeddings.py:fastrp_embeddings; gds.fastRP) ----------
    # three unrolled averaging rounds over the symmetrized FK graph with the
    # operator's exact operand order: init = md5-hash pmod 6 -> {+1,-1,0},
    # messages = SUM/COUNT (Spark avg's partial-agg shape), row norms the
    # sequential left fold ((((0+c0^2)+c1^2)+c2^2)+c3^2) matching
    # F.aggregate, final = (round2*1.0) + (round3*1.0); ppm-quantized
    _frp_norm = "((((0.0 + c0*c0) + c1*c1) + c2*c2) + c3*c3)"
    _frp_whens = "WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 WHEN 3 THEN c3"
    _frp_wide = ", ".join(
        f"COALESCE(MAX(CASE WHEN m.j = {j} THEN m.c END), CAST(0 AS DOUBLE)) AS c{j}"
        for j in range(4)
    )
    _frp_h = _md5_64("n.id || '|' || CAST(d.j AS VARCHAR)", 42)
    _frp_iters = []
    _frp_prev = "fr0"
    for _i in (1, 2, 3):
        _frp_iters.append(f"""fm{_i} AS MATERIALIZED (
  SELECT p.v AS id, r.j, SUM(r.val) / COUNT(*) AS c
  FROM frp_pairs p JOIN {_frp_prev} r ON p.u = r.id GROUP BY p.v, r.j
), fw{_i} AS MATERIALIZED (
  SELECT n.id, {_frp_wide}
  FROM frp_nodes n LEFT JOIN fm{_i} m ON n.id = m.id GROUP BY n.id
), fr{_i} AS MATERIALIZED (
  SELECT w.id, d.j,
         CASE WHEN w.nrm > 0 THEN (CASE d.j {_frp_whens} END) / sqrt(w.nrm)
              ELSE CAST(0 AS DOUBLE) END AS val
  FROM (SELECT id, c0, c1, c2, c3, {_frp_norm} AS nrm FROM fw{_i}) w
  CROSS JOIN frp_dims d
)""")
        _frp_prev = f"fr{_i}"
    sql["a2_fastrp"] = f"""WITH {g},
frp_fk AS MATERIALIZED (SELECT src, dst FROM edges
  WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
frp_pairs AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT src AS u, dst AS v FROM frp_fk UNION ALL SELECT dst, src FROM frp_fk)
  WHERE u <> v),
frp_nodes AS MATERIALIZED (SELECT DISTINCT u AS id FROM frp_pairs),
frp_dims AS MATERIALIZED (SELECT unnest([0, 1, 2, 3]) AS j),
fr0raw AS MATERIALIZED (
  SELECT n.id, d.j,
         CASE ((({_frp_h}) % 6) + 6) % 6
              WHEN 0 THEN CAST(1 AS DOUBLE) WHEN 1 THEN CAST(-1 AS DOUBLE)
              ELSE CAST(0 AS DOUBLE) END AS val
  FROM frp_nodes n CROSS JOIN frp_dims d),
fw0 AS MATERIALIZED (
  SELECT id, {", ".join(f"MAX(CASE WHEN j = {j} THEN val END) AS c{j}" for j in range(4))}
  FROM fr0raw GROUP BY id),
fr0 AS MATERIALIZED (
  SELECT w.id, d.j,
         CASE WHEN w.nrm > 0 THEN (CASE d.j {_frp_whens} END) / sqrt(w.nrm)
              ELSE CAST(0 AS DOUBLE) END AS val
  FROM (SELECT id, c0, c1, c2, c3, {_frp_norm} AS nrm FROM fw0) w
  CROSS JOIN frp_dims d),
{", ".join(_frp_iters)}
SELECT a.id, a.j,
       CAST(ROUND(((a.val * 1.0) + (b.val * 1.0)) * 1000000.0) AS BIGINT) AS val_ppm
FROM fr2 a JOIN fr3 b ON a.id = b.id AND a.j = b.j"""

    # --- DSIR importance resampling (training_data.py:dsir_resample) ---------
    # every literal is CAST to DOUBLE so DuckDB's DECIMAL literal arithmetic
    # can't diverge from Spark's double math; log-weights and scores round to
    # 6 dp on both sides (summation-order-safe)
    _ds_h = _md5_64("gram", 0)
    _ds_u = (
        f"(({_md5_64('CAST(id AS VARCHAR)', 17)} % 1048576) + CAST(0.5 AS DOUBLE))"
        " / CAST(1048576 AS DOUBLE)"
    )
    sql["td_dsir_resample"] = f"""WITH toks AS (
  SELECT doc_id, lang, {tok} AS t FROM documents
),
grams AS (
  SELECT doc_id, lang, gram FROM (
    SELECT doc_id, lang, unnest(t) AS gram FROM toks
    UNION ALL
    SELECT doc_id, lang, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS gram
    FROM toks
  ) u
),
bucketed AS (SELECT doc_id, lang, {_ds_h} % 1024 AS bucket FROM grams),
ct AS (SELECT bucket, count(*) AS ct FROM bucketed WHERE lang = 'en' GROUP BY bucket),
cr AS (SELECT bucket, count(*) AS cr FROM bucketed WHERE lang != 'en' GROUP BY bucket),
allb AS (SELECT unnest(range(1024)) AS bucket),
j AS (
  SELECT a.bucket, COALESCE(ct.ct, 0) AS ct, COALESCE(cr.cr, 0) AS cr
  FROM allb a LEFT JOIN ct ON a.bucket = ct.bucket LEFT JOIN cr ON a.bucket = cr.bucket
),
tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM j),
ratio AS (
  SELECT bucket,
         ln((ct + CAST(0.5 AS DOUBLE)) / (tt + CAST(512.0 AS DOUBLE)))
         - ln((cr + CAST(0.5 AS DOUBLE)) / (tr + CAST(512.0 AS DOUBLE))) AS logratio
  FROM j CROSS JOIN tot
),
w AS (
  SELECT doc_id, round(SUM(logratio), 6) AS log_weight
  FROM bucketed b JOIN ratio r ON b.bucket = r.bucket
  WHERE b.lang != 'en' GROUP BY doc_id
),
wall AS (
  SELECT d.doc_id AS id, COALESCE(w.log_weight, CAST(0 AS DOUBLE)) AS log_weight
  FROM (SELECT doc_id FROM documents WHERE lang != 'en') d LEFT JOIN w ON d.doc_id = w.doc_id
)
SELECT id, log_weight, round(log_weight - ln(-ln({_ds_u})), 6) AS score
FROM wall ORDER BY score DESC, id LIMIT 50"""

    # --- training-data ops (operators/training_data.py) ----------------------

    _bucket7 = _md5_64("CAST(doc_id AS VARCHAR)", 7)
    sql["td_hash_sample"] = (
        f"SELECT doc_id, lang, source FROM documents WHERE {_bucket7} % 1000000 < 100000"
    )

    _bucket11 = _md5_64("CAST(doc_id AS VARCHAR)", 11)
    sql["td_stratified_sample"] = f"""
SELECT doc_id, lang FROM documents
WHERE {_bucket11} % 1000000 <
      (CASE WHEN lang = 'en' THEN 600000 WHEN lang = 'zh' THEN 200000 ELSE 50000 END)"""

    # 5-gram shingles: mirror of functions/text.py:word_shingles(k=5) — DuckDB
    # slices are inclusive, so t[i:i+4] is 5 tokens
    _grams5 = (
        "unnest(list_transform(range(1, greatest(len(t) - 4, 0) + 1), "
        "i -> array_to_string(t[i:i+4], ' ')))"
    )
    sql["td_decontaminate"] = f"""
WITH toks AS (SELECT doc_id, {tok} AS t FROM documents),
tr AS (
  SELECT DISTINCT doc_id, {_md5_64('ngram', 0)} AS g
  FROM (SELECT doc_id, {_grams5} AS ngram FROM toks WHERE doc_id % 97 != 0)
),
ev AS (
  SELECT DISTINCT {_md5_64('ngram', 0)} AS g
  FROM (SELECT {_grams5} AS ngram FROM toks WHERE doc_id % 97 = 0)
)
SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS shared_ngrams
FROM tr JOIN ev ON tr.g = ev.g GROUP BY tr.doc_id"""

    from cognee_graphdb_spark.operators.training_data import PII_PATTERNS

    _pii_src = (
        "'reach user' || CAST(doc_id AS VARCHAR) || '@example.com or +1 555-000-1234 at 10.0.0.' "
        "|| CAST(doc_id % 255 AS VARCHAR) || ' ssn 123-45-6789 :: ' || text"
    )
    _pii_ctes, _prev = [f"s0 AS (SELECT doc_id, {_pii_src} AS t0 FROM documents)"], "t0"
    for _i, (_, _pat, _repl) in enumerate(PII_PATTERNS, start=1):
        _carry = "".join(f"c{j}, " for j in range(1, _i))
        _pii_ctes.append(
            f"s{_i} AS (SELECT doc_id, {_carry}"
            f"len(regexp_extract_all({_prev}, '{_pat}', 0)) AS c{_i}, "
            f"regexp_replace({_prev}, '{_pat}', '{_repl}', 'g') AS t{_i} FROM s{_i - 1})"
        )
        _prev = f"t{_i}"
    _n = len(PII_PATTERNS)
    sql["td_pii_redact"] = (
        "WITH "
        + ",\n".join(_pii_ctes)
        + f"\nSELECT doc_id, t{_n} AS redacted_text, "
        + f"CAST({' + '.join(f'c{j}' for j in range(1, _n + 1))} AS BIGINT) AS n_redactions FROM s{_n}"
    )

    sql["td_corpus_stats"] = f"""
WITH t AS (SELECT len({tok}) AS n FROM documents),
d AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n) AS BIGINT) AS total_tokens,
         round(avg(n), 6) AS avg_doc_tokens,
         CAST(min(n) AS BIGINT) AS min_doc_tokens,
         CAST(max(n) AS BIGINT) AS max_doc_tokens
  FROM t
),
v AS (
  SELECT CAST(count(DISTINCT token) AS BIGINT) AS vocab_size
  FROM (SELECT unnest({tok}) AS token FROM documents)
)
SELECT * FROM d, v"""

    # Gopher repetition features (operators/training_data.py:repetition_features)
    _gram_ctes, _gram_joins, _gram_cols = [], [], []
    for _n in (2, 3, 4):
        _gram_ctes.append(f"""g{_n} AS (
  SELECT doc_id, ngram, count(*) AS c FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - {_n - 1}, 0) + 1),
                                         i -> array_to_string(t[i:i+{_n - 1}], ' '))) AS ngram
    FROM toks
  ) GROUP BY doc_id, ngram
),
t{_n} AS (SELECT doc_id, max(c * (length(ngram) - {_n - 1})) AS topc FROM g{_n} GROUP BY doc_id)""")
        _gram_joins.append(f"LEFT JOIN t{_n} USING (doc_id)")
        _gram_cols.append(
            f"round(coalesce(t{_n}.topc, 0)::DOUBLE / greatest(tc.tok_chars, 1), 6)"
            f" AS top{_n}gram_char_frac"
        )
    sql["td_repetition"] = f"""
WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents),
lines AS (
  SELECT doc_id, trim(l) AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM base)
  WHERE trim(l) != ''
),
lc AS (SELECT doc_id, line, count(*) AS c, max(length(line)) AS len FROM lines GROUP BY doc_id, line),
line_stats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
         round(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)::DOUBLE / sum(c), 6) AS dup_line_frac,
         round(sum(CASE WHEN c > 1 THEN (c - 1) * len ELSE 0 END)::DOUBLE / sum(c * len), 6) AS dup_line_char_frac
  FROM lc GROUP BY doc_id
),
toks AS (SELECT doc_id, {tok} AS t FROM base),
tc AS (SELECT doc_id, coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS tok_chars FROM toks),
{",".join(_gram_ctes)}
SELECT ls.doc_id, ls.n_lines, ls.dup_line_frac, ls.dup_line_char_frac,
       {", ".join(_gram_cols)}
FROM line_stats ls JOIN tc USING (doc_id) {" ".join(_gram_joins)}"""

    # Gopher quality rules (operators/training_data.py:gopher_quality_filter)
    # the gopher CTE chain is shared VERBATIM by td_gopher_filter and the
    # composed td_curate_clustered entry (quality -> dbscan -> cluster cap)
    _gopher_ctes = f"""t AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, {tok} AS toks FROM documents),
f AS (
  SELECT doc_id, len(toks) AS n_words,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::DOUBLE
           / greatest(len(toks), 1) AS mean_wl,
         (len(regexp_extract_all(text, '#', 0)) + len(regexp_extract_all(text, '\\.\\.\\.', 0)))::DOUBLE
           / greatest(len(toks), 1) AS sym_ratio,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
           / greatest(len(toks), 1) AS alpha_frac,
         len(list_filter(list_distinct(toks), x -> x IN ({stop_in}))) AS stop_hits
  FROM t
),
r AS (
  SELECT doc_id, list_filter([
      CASE WHEN n_words < 50 THEN 'too_few_words' END,
      CASE WHEN n_words > 100000 THEN 'too_many_words' END,
      CASE WHEN mean_wl < 3.0 OR mean_wl > 10.0 THEN 'mean_word_len_out_of_band' END,
      CASE WHEN sym_ratio > 0.1 THEN 'symbol_word_ratio' END,
      CASE WHEN alpha_frac < 0.8 THEN 'low_alpha_word_frac' END,
      CASE WHEN stop_hits < 2 THEN 'too_few_stopwords' END
    ], x -> x IS NOT NULL) AS reasons
  FROM f
)"""
    sql["td_gopher_filter"] = f"""
WITH {_gopher_ctes}
SELECT doc_id, len(reasons) = 0 AS keep,
       coalesce(array_to_string(reasons, ','), '') AS fail_reasons FROM r"""

    # CCNet-style unigram-LM scoring (training_data.py:unigram_lm/unigram_logprob):
    # vocab truncated to top-100 (count desc, token asc) so OOV hits the
    # ln(1/total) floor; total counts ALL instances, pre-truncation.
    sql["td_unigram_logprob"] = f"""
WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents),
tk AS (SELECT doc_id, unnest({tok}) AS token FROM base),
cnt AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
tot AS (SELECT sum(c)::DOUBLE AS total FROM cnt),
lm AS (
  SELECT token, ln(c / total) AS logp
  FROM cnt, tot ORDER BY c DESC, token LIMIT 100
),
dt AS (SELECT doc_id, token, count(*) AS dc FROM tk GROUP BY doc_id, token)
SELECT doc_id, sum(dc)::BIGINT AS n_tokens,
       round(sum(CASE WHEN logp IS NULL THEN dc ELSE 0 END)::DOUBLE / sum(dc), 6) AS oov_frac,
       round(sum(dc * coalesce(logp, ln(1.0 / total))) / sum(dc), 6) AS mean_logprob
FROM dt LEFT JOIN lm USING (token), tot
GROUP BY doc_id"""

    # weighted (per-row-probability) sampling: weight = min(1, n_words/100)
    sql["td_weighted_sample"] = f"""
SELECT doc_id, lang, source FROM (
  SELECT *, least(1.0, len({tok})::DOUBLE / 100.0) AS w FROM documents
) WHERE ({_md5_64("CAST(doc_id AS VARCHAR)", 5)} % 1000000) < w * 1000000.0"""

    # per-source curation audit (training_data.py:source_quality_report) —
    # macro-averaged per-doc ratios; gopher keep restated from its oracle
    sql["td_source_report"] = f"""
WITH t AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, source, text, {tok} AS toks FROM documents),
f AS (
  SELECT doc_id, source, len(toks) AS n_tokens,
         len(list_filter(toks, x -> x IN ({stop_in})))::DOUBLE
           / greatest(len(toks), 1) AS stop_ratio,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
           / greatest(len(toks), 1) AS alpha_frac,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::DOUBLE
           / greatest(len(toks), 1) AS mean_wl,
         (len(regexp_extract_all(text, '#', 0)) + len(regexp_extract_all(text, '\\.\\.\\.', 0)))::DOUBLE
           / greatest(len(toks), 1) AS sym_ratio,
         len(list_filter(list_distinct(toks), x -> x IN ({stop_in}))) AS stop_hits
  FROM t
),
k AS (
  SELECT *, CASE WHEN n_tokens >= 50 AND n_tokens <= 100000
                  AND mean_wl >= 3.0 AND mean_wl <= 10.0
                  AND sym_ratio <= 0.1 AND alpha_frac >= 0.8
                  AND stop_hits >= 2 THEN 1 ELSE 0 END AS keep
  FROM f
)
SELECT source, count(*)::BIGINT AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 6) AS mean_tokens,
       round(avg(keep), 6) AS gopher_keep_rate,
       round(avg(stop_ratio), 6) AS mean_stopword_ratio,
       round(avg(alpha_frac), 6) AS mean_alpha_frac
FROM k GROUP BY source"""

    # mixture planning (training_data.py:mixture_plan): weights {src0:2,
    # src1:1, src2:1} normalize to .5/.25/.25; unlisted sources weight 0
    sql["td_mixture_plan"] = f"""
WITH avail AS (
  SELECT source, CAST(sum(len({tok})) AS BIGINT) AS available_tokens
  FROM documents GROUP BY source
),
wtd AS (
  SELECT source, available_tokens,
         CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
                          WHEN 'src2' THEN 0.25 ELSE 0.0 END AS DOUBLE) AS w
  FROM avail
),
tg AS (
  SELECT source, available_tokens, round(w, 6) AS weight,
         CAST(round(w * 100000.0) AS BIGINT) AS target_tokens
  FROM wtd
)
SELECT source, available_tokens, weight, target_tokens,
       round(target_tokens::DOUBLE / greatest(available_tokens, 1), 6) AS fraction,
       CAST(ceil(round(target_tokens::DOUBLE / greatest(available_tokens, 1), 6)) AS BIGINT) AS epochs
FROM tg"""

    # ASCII vs Unicode tokenization (functions/text.py:tokenize[_unicode]) —
    # \p{L}\p{N} parse identically in Java regex and RE2
    sql["f4_unicode_tokens"] = f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       len({tok})::BIGINT AS ascii_tokens,
       len(list_filter(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}]+'),
                       x -> x != ''))::BIGINT AS unicode_tokens
FROM documents"""

    # learned quality score with FIXED literal weights (quality_model.py:
    # score_quality) — training is ML (pytest-proven); inference is the pure
    # sigmoid(w·x + b) projection, restated here feature-by-feature
    _qw = _QUALITY_W
    sql["td_quality_score"] = f"""
WITH t AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, {tok} AS toks FROM documents),
f AS (
  SELECT doc_id,
         ln(1.0 + len(toks)) AS log_n_words,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::DOUBLE
           / greatest(len(toks), 1) AS mean_word_len,
         len(list_filter(toks, x -> x IN ({stop_in})))::DOUBLE
           / greatest(len(toks), 1) AS stopword_ratio,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
           / greatest(len(toks), 1) AS alpha_word_frac,
         (len(regexp_extract_all(text, '#', 0)) + len(regexp_extract_all(text, '\\.\\.\\.', 0)))::DOUBLE
           / greatest(len(toks), 1) AS symbol_ratio,
         (len(toks) - len(list_distinct(toks)))::DOUBLE
           / greatest(len(toks), 1) AS dup_word_frac
  FROM t
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-({_qw["__intercept__"]}
         + {_qw["log_n_words"]} * log_n_words
         + {_qw["mean_word_len"]} * mean_word_len
         + {_qw["stopword_ratio"]} * stopword_ratio
         + {_qw["alpha_word_frac"]} * alpha_word_frac
         + {_qw["symbol_ratio"]} * symbol_ratio
         + {_qw["dup_word_frac"]} * dup_word_frac))), 6) AS quality_score
FROM f"""

    # C4 line-level cleaning (training_data.py:c4_line_filter)
    sql["td_c4_line_filter"] = """
WITH split AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
         list_filter(list_transform(string_split_regex(text, '\\r?\\n'), l -> trim(l)),
                     l -> l != '') AS nonempty
  FROM documents
),
f AS (
  SELECT doc_id, text, nonempty,
         list_filter(nonempty, l ->
           regexp_matches(l, '[.!?"'']$')
           AND len(list_filter(string_split_regex(l, '\\s+'), w -> w != '')) >= 5
           AND NOT contains(lower(l), 'javascript')
           AND NOT contains(lower(l), 'cookie')) AS kept
  FROM split
)
SELECT doc_id,
       (len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(lower(text), '{')) AS keep_doc,
       coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
       len(kept)::BIGINT AS n_lines_kept,
       (len(nonempty) - len(kept))::BIGINT AS n_lines_dropped
FROM f"""

    # cross-doc duplicate spans (training_data.py:duplicate_spans):
    # content-defined anchors = positions whose token hashes to 0 mod 4
    # (seed 1), 12-token windows, doc-frequency >= 2 flags the window
    _anchor = _md5_64("t[i]", 1)
    sql["td_duplicate_spans"] = f"""
WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, {tok} AS t FROM documents),
w AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+11], ' ') AS w
  FROM (
    SELECT doc_id, t, unnest(range(1, greatest(len(t) - 11, 1) + 1)) AS i
    FROM base WHERE len(t) >= 12
  )
  WHERE ({_anchor} % 4) = 0
),
dfq AS (SELECT w, count(*) AS ndocs FROM w GROUP BY w)
SELECT doc_id, count(*)::BIGINT AS n_windows,
       sum((ndocs >= 2)::INT)::BIGINT AS dup_windows,
       round(sum((ndocs >= 2)::INT)::DOUBLE / count(*), 6) AS dup_frac
FROM w JOIN dfq USING (w)
GROUP BY doc_id"""

    # deterministic shuffle: shard = hash mod 16, pos = rank by hash in shard
    _sh = _md5_64("CAST(doc_id AS VARCHAR)", 3)
    sql["td_shuffle_shards"] = f"""
SELECT doc_id, CAST({_sh} % 16 AS INT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY {_sh} % 16
         ORDER BY {_sh}, CAST(doc_id AS VARCHAR)) AS INT) AS pos
FROM documents"""

    # --- composed curation chain (operators/curation.py:curate_corpus) -------
    # every stage reuses the fragment of its standalone oracle; the value
    # added here is pinning the inter-stage wiring: each stage's keep-set is
    # the next stage's input, keepers elected over the SURVIVOR corpus only
    _mh_ctes, _mh_est = _minhash_ctes(16, 8, source="c_exact")
    _sh3 = _md5_64("CAST(doc_id AS VARCHAR)", 3)
    sql["td_curate_corpus"] = f"""
WITH RECURSIVE
c_input AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents WHERE doc_id % 101 != 0),
c_eval AS (SELECT text FROM documents WHERE doc_id % 101 = 0),
-- gopher rule filter (same feature expressions as td_gopher_filter)
c_gf AS (
  SELECT doc_id, text, len(toks) AS n_words,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::DOUBLE
           / greatest(len(toks), 1) AS mean_wl,
         (len(regexp_extract_all(text, '#', 0)) + len(regexp_extract_all(text, '\\.\\.\\.', 0)))::DOUBLE
           / greatest(len(toks), 1) AS sym_ratio,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
           / greatest(len(toks), 1) AS alpha_frac,
         len(list_filter(list_distinct(toks), x -> x IN ({stop_in}))) AS stop_hits
  FROM (SELECT doc_id, text, {tok} AS toks FROM c_input)
),
c_gopher AS (
  SELECT doc_id, text FROM c_gf
  WHERE n_words >= 50 AND n_words <= 100000
    AND mean_wl >= 3.0 AND mean_wl <= 10.0
    AND sym_ratio <= 0.1 AND alpha_frac >= 0.8 AND stop_hits >= 2
),
-- exact dedup: keeper = min doc_id (string order) per content hash
c_eh AS (SELECT doc_id, text, md5(text) AS ch FROM c_gopher),
c_ek AS (SELECT ch, min(doc_id) AS keeper FROM c_eh GROUP BY ch),
c_exact AS (SELECT e.doc_id, e.text FROM c_eh e JOIN c_ek k ON e.ch = k.ch AND e.doc_id = k.keeper),
-- minhash near-dup pairs over the exact-dedup survivors
{_mh_ctes},
mh_pairs AS (SELECT id_a, id_b FROM mh_cands WHERE {_mh_est} >= 0.5),
mh_ids AS (SELECT id_a AS id FROM mh_pairs UNION SELECT id_b FROM mh_pairs),
mh_sym AS (SELECT id_a AS a, id_b AS b FROM mh_pairs UNION SELECT id_b, id_a FROM mh_pairs),
reach(a, b) AS (
  SELECT id, id FROM mh_ids
  UNION
  SELECT r.a, s.b FROM reach r JOIN mh_sym s ON r.b = s.a
),
mh_keep AS (SELECT a AS doc_id, min(b) AS keeper FROM reach GROUP BY a),
c_near AS (
  SELECT c.doc_id, c.text FROM c_exact c LEFT JOIN mh_keep k USING (doc_id)
  WHERE k.keeper IS NULL OR k.keeper = c.doc_id
),
-- 5-gram decontamination against the eval split
c_tr5 AS (
  SELECT DISTINCT doc_id, {_md5_64('ngram', 0)} AS g
  FROM (SELECT doc_id, {_grams5} AS ngram FROM (SELECT doc_id, {tok} AS t FROM c_near))
),
c_ev5 AS (
  SELECT DISTINCT {_md5_64('ngram', 0)} AS g
  FROM (SELECT {_grams5} AS ngram FROM (SELECT {tok} AS t FROM c_eval))
),
c_contaminated AS (SELECT DISTINCT doc_id FROM c_tr5 JOIN c_ev5 USING (g)),
c_clean AS (SELECT * FROM c_near WHERE doc_id NOT IN (SELECT doc_id FROM c_contaminated)),
-- learned-quality sigmoid weight (same features as td_quality_score) ->
-- per-row-probability sample, hash seed 3
c_qf AS (
  SELECT doc_id,
         ln(1.0 + len(toks)) AS log_n_words,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::DOUBLE
           / greatest(len(toks), 1) AS mean_word_len,
         len(list_filter(toks, x -> x IN ({stop_in})))::DOUBLE
           / greatest(len(toks), 1) AS stopword_ratio,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
           / greatest(len(toks), 1) AS alpha_word_frac,
         (len(regexp_extract_all(text, '#', 0)) + len(regexp_extract_all(text, '\\.\\.\\.', 0)))::DOUBLE
           / greatest(len(toks), 1) AS symbol_ratio,
         (len(toks) - len(list_distinct(toks)))::DOUBLE
           / greatest(len(toks), 1) AS dup_word_frac
  FROM (SELECT doc_id, text, {tok} AS toks FROM c_clean)
),
c_qs AS (
  SELECT doc_id, 1.0 / (1.0 + exp(-({_qw["__intercept__"]}
    + {_qw["log_n_words"]} * log_n_words
    + {_qw["mean_word_len"]} * mean_word_len
    + {_qw["stopword_ratio"]} * stopword_ratio
    + {_qw["alpha_word_frac"]} * alpha_word_frac
    + {_qw["symbol_ratio"]} * symbol_ratio
    + {_qw["dup_word_frac"]} * dup_word_frac))) AS w
  FROM c_qf
),
c_sampled AS (
  SELECT c.doc_id FROM c_clean c JOIN c_qs q USING (doc_id)
  WHERE ({_sh3} % 1000000) < q.w * 1000000.0
)
-- deterministic shards: shard = hash(seed 3) mod 8, pos = rank by hash
SELECT doc_id,
       CAST({_sh3} % 8 AS INT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY {_sh3} % 8
         ORDER BY {_sh3}, doc_id) AS INT) AS pos
FROM c_sampled"""

    # --- lexical ranking (operators/ranking.py) ------------------------------

    def _bm25_sql(terms: list[str], k: int) -> str:
        in_list = ", ".join(f"'{t}'" for t in terms)
        return f"""
WITH toks AS (SELECT doc_id, unnest({tok}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term IN ({in_list}) GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
idf AS (SELECT term, ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5)) AS idf FROM dft, st),
sc AS (
  SELECT tf.doc_id,
         sum(idf * tf / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), st
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 6) AS bm25 FROM sc ORDER BY bm25 DESC, doc_id ASC LIMIT {k}"""

    sql["bm25_topk"] = _bm25_sql(["fast", "merge", "scan", "table"], 20)

    sql["tfidf_topk"] = f"""
WITH toks AS (SELECT doc_id, unnest({tok}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN ('batch', 'vector', 'window') GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
st AS (SELECT count(*) AS n_docs FROM dl),
dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
idf AS (SELECT term, ln(n_docs / df_t) AS idf FROM dft, st),
sc AS (
  SELECT doc_id, sum((1.0 + ln(tf)) * idf) AS s
  FROM tf JOIN idf USING (term) GROUP BY doc_id
)
SELECT doc_id, round(s, 6) AS tfidf FROM sc ORDER BY tfidf DESC, doc_id ASC LIMIT 20"""

    # --- int8 quantized kNN (operators/similarity.py) ------------------------

    sql["knn_quantized"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
x AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e),
dims AS (SELECT i, min(x) AS mn, max(x) AS mx FROM x GROUP BY i),
dq AS (
  SELECT vec_id, i,
         mn + ((CASE WHEN mx = mn THEN 0
                     ELSE CAST(round((x - mn) * 254.0 / (mx - mn)) AS INT) - 127 END)
               + 127.0) * (mx - mn) / 254.0 AS xhat
  FROM x JOIN dims USING (i)
),
qv AS (SELECT i, x AS qx FROM x WHERE vec_id = 7),
s AS (
  SELECT dq.vec_id,
         sum(xhat * qx) AS dot, sum(xhat * xhat) AS na, sum(qx * qx) AS nb
  FROM dq JOIN qv USING (i) GROUP BY dq.vec_id
)
SELECT vec_id, round(1.0 - dot / (sqrt(na) * sqrt(nb)), 6) AS qdist
FROM s ORDER BY qdist ASC, vec_id ASC LIMIT 10"""

    # --- skew diagnostics (operators/diagnostics.py) -------------------------

    sql["skew_report"] = """
WITH c AS (SELECT CAST(o_custkey AS VARCHAR) AS key, count(*) AS cnt FROM orders GROUP BY 1),
t AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM c)
SELECT key, cnt, round(cnt / total, 6) AS share, round(cnt * n_keys / total, 6) AS x_mean
FROM c, t ORDER BY cnt DESC, key ASC LIMIT 20"""

    # --- PQ codebooks / encode / ADC top-k (operators/similarity.py) ---------
    # Full restatement of the deterministic PQ training: md5_64-seeded pick,
    # one assign+recenter round (argmin metric ||c||^2 - 2 x.c — every term a
    # sequential-fold dot, bit-identical to list_dot_product), then the final
    # integer code assignment.  Like dedup_semdedup, only the centroid MEANS
    # carry engine-side summation-order noise, far below the branch margins.
    _pq_h = _md5_64("id", 41)
    _pq_unit = (
        "CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v "
        "ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v))) END"
    )
    _pq_train = f"""pq_base AS MATERIALIZED (
  SELECT CAST(vec_id AS VARCHAR) AS id, vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
),
pq_unit AS MATERIALIZED (SELECT id, vid, {_pq_unit} AS u FROM pq_base),
pq_subs AS (SELECT unnest(range(0, 8)) AS sub),
pq_sv AS MATERIALIZED (
  SELECT t.id, t.vid, m.sub, t.u[m.sub * 8 + 1 : m.sub * 8 + 8] AS sv
  FROM pq_unit t CROSS JOIN pq_subs m
),
pq_seeds AS (
  SELECT id, u, rn - 1 AS code FROM (
    SELECT id, u, row_number() OVER (ORDER BY {_pq_h}, id) AS rn FROM pq_unit) s
  WHERE rn <= 8
),
pq_c0 AS MATERIALIZED (
  SELECT m.sub, s.code, s.u[m.sub * 8 + 1 : m.sub * 8 + 8] AS c
  FROM pq_seeds s CROSS JOIN pq_subs m
),
pq_asg AS MATERIALIZED (
  SELECT id, sub, sv, code FROM (
    SELECT t.id, t.sub, t.sv, c.code,
           row_number() OVER (PARTITION BY t.id, t.sub
             ORDER BY list_dot_product(c.c, c.c) - 2 * list_dot_product(t.sv, c.c), c.code) AS rn
    FROM pq_sv t JOIN pq_c0 c ON t.sub = c.sub) z
  WHERE rn = 1
),
pq_m1 AS (
  SELECT sub, code, pos, avg(x) AS m FROM (
    SELECT sub, code, unnest(sv) AS x, unnest(range(1, len(sv) + 1)) AS pos FROM pq_asg) z
  GROUP BY sub, code, pos
),
pq_raw1 AS (SELECT sub, code, list(m ORDER BY pos) AS newc FROM pq_m1 GROUP BY sub, code),
pq_c1 AS MATERIALIZED (
  SELECT c0.sub, c0.code, COALESCE(r.newc, c0.c) AS c
  FROM pq_c0 c0 LEFT JOIN pq_raw1 r ON c0.sub = r.sub AND c0.code = r.code
),
pq_enc AS MATERIALIZED (
  SELECT id, vid, sub, code FROM (
    SELECT t.id, t.vid, t.sub, c.code,
           row_number() OVER (PARTITION BY t.id, t.sub
             ORDER BY list_dot_product(c.c, c.c) - 2 * list_dot_product(t.sv, c.c), c.code) AS rn
    FROM pq_sv t JOIN pq_c1 c ON t.sub = c.sub) z
  WHERE rn = 1
)"""

    sql["pq_codes"] = f"""WITH {_pq_train}
SELECT vid AS vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY sub) AS codes
FROM pq_enc GROUP BY vid"""

    sql["pq_topk"] = f"""WITH {_pq_train},
pq_q AS (SELECT v AS qv, {_pq_unit} AS qu FROM pq_base WHERE vid = 7),
pq_lut AS (
  SELECT c.sub, c.code,
         list_dot_product(c.c, c.c)
           - 2 * list_dot_product(q.qu[c.sub * 8 + 1 : c.sub * 8 + 8], c.c) AS term
  FROM pq_c1 c CROSS JOIN pq_q q
),
pq_adc AS (
  SELECT cd.vid, SUM(l.term) AS adc
  FROM pq_enc cd JOIN pq_lut l ON cd.sub = l.sub AND cd.code = l.code
  GROUP BY cd.vid
),
pq_short AS (SELECT vid FROM pq_adc ORDER BY adc, vid LIMIT 100)
SELECT b.vid AS vec_id, round({_cosd("b.v", "q.qv")}, 6) AS distance
FROM pq_base b JOIN pq_short s ON b.vid = s.vid CROSS JOIN pq_q q
ORDER BY distance, vec_id LIMIT 10"""

    # --- weighted SSSP (operators/paths.py:weighted_sssp): 4 unrolled
    # relax-and-min rounds over the undirected nation-family subgraph with
    # hash-derived integer weights; after round i the state is exactly
    # "cheapest path using <= i edges", which is the loop invariant the
    # frontier-optimized Spark version preserves ---------------------------
    _ws_h = _md5_64("concat(src, '|', dst)", 0)
    _ws_w = f"({_ws_h} % 5) + 1"
    _ws_rounds = []
    for _i in range(1, 5):
        _ws_rounds.append(f"""wsr{_i} AS MATERIALIZED (
  SELECT source, node, min(dist) AS dist FROM (
    SELECT source, node, dist FROM wsr{_i - 1}
    UNION ALL
    SELECT f.source, e.dst AS node, f.dist + e.w AS dist
    FROM wsr{_i - 1} f JOIN wsu e ON f.node = e.src
  ) z GROUP BY source, node
)""")
    sql["a2_weighted_sssp"] = f"""WITH {g},
wsf AS MATERIALIZED (SELECT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
wsd AS (SELECT src, dst, {_ws_w} AS w FROM wsf),
wsu AS MATERIALIZED (
  SELECT src, dst, min(w) AS w FROM (
    SELECT src, dst, w FROM wsd
    UNION ALL SELECT dst AS src, src AS dst, w FROM wsd
  ) z GROUP BY src, dst
),
wsr0 AS MATERIALIZED (
  SELECT id AS source, id AS node, CAST(0 AS BIGINT) AS dist FROM (
    SELECT src AS id FROM wsf UNION SELECT dst FROM wsf
  ) n WHERE id LIKE 'region:%'
),
{", ".join(_ws_rounds)}
SELECT source, node, CAST(dist AS BIGINT) AS dist FROM wsr4"""

    # --- CALL gds.shortestPath.dijkstra.stream (plans/cypher.py): single
    # source region:0, weights read back from the edge properties map — the
    # same hash weights as a2_weighted_sssp, totalCost accumulates as DOUBLE
    # on the Spark side (element_at cast), integer-valued so the BIGINT cast
    # is exact.  The FK forest is one tree per region (2-hop radius); 6
    # relax rounds are fixpoint with margin. ---------------------------------
    _dj_rounds = []
    for _i in range(1, 7):
        _dj_rounds.append(f"""djr{_i} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM djr{_i - 1}
    UNION ALL
    SELECT e.dst AS node, f.dist + e.w AS dist
    FROM djr{_i - 1} f JOIN wsu e ON f.node = e.src
  ) z GROUP BY node
)""")
    sql["cypher_gds_dijkstra"] = f"""WITH {g},
wsf AS MATERIALIZED (SELECT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
wsd AS (SELECT src, dst, {_ws_w} AS w FROM wsf),
wsu AS MATERIALIZED (
  SELECT src, dst, min(w) AS w FROM (
    SELECT src, dst, w FROM wsd
    UNION ALL SELECT dst AS src, src AS dst, w FROM wsd
  ) z GROUP BY src, dst
),
djr0 AS MATERIALIZED (SELECT 'region:0' AS node, CAST(0 AS BIGINT) AS dist),
{", ".join(_dj_rounds)}
SELECT node AS targetNode, CAST(dist AS BIGINT) AS cost FROM djr6"""

    # --- layered neighbor sampling (operators/graph_sampling.py): seeded
    # hash-ranked adjacency + per-layer fanout filters, undirected, [3, 2]
    _ns_h = _md5_64("concat(src, '|', dst)", 11)
    sql["a2_neighbor_sample"] = f"""WITH {g},
nsf AS MATERIALIZED (SELECT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
nse AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM nsf UNION ALL SELECT dst AS src, src AS dst FROM nsf
  ) z WHERE src != dst
),
nsadj AS MATERIALIZED (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY {_ns_h}, dst) AS rnk
  FROM nse
),
nsl0 AS (
  SELECT id AS root, id AS node FROM (
    SELECT src AS id FROM nsf UNION SELECT dst FROM nsf
  ) n WHERE id LIKE 'region:%'
),
nss1 AS MATERIALIZED (
  SELECT DISTINCT f.root, a.src, a.dst
  FROM nsl0 f JOIN nsadj a ON f.node = a.src WHERE a.rnk <= 3
),
nsf1 AS (SELECT DISTINCT root, dst AS node FROM nss1),
nss2 AS MATERIALIZED (
  SELECT DISTINCT f.root, a.src, a.dst
  FROM nsf1 f JOIN nsadj a ON f.node = a.src WHERE a.rnk <= 2
)
SELECT root, CAST(1 AS INT) AS layer, src, dst FROM nss1
UNION ALL
SELECT root, CAST(2 AS INT) AS layer, src, dst FROM nss2"""

    # --- SSSP with predecessor tracking + rendered paths (operators/
    # paths.py:weighted_sssp(return_pred=True) + sssp_paths): 3 frontier
    # relax rounds with (dist, pred) argmin — strict improvements are only
    # ever offered by last-round-improved nodes, so relaxing from the
    # improved set matches the Spark frontier exactly — then 3 chained
    # pointer-walk joins render "source->...->node" strings ----------------
    _pp_rounds = []
    for _i in range(1, 4):
        _pp_rounds.append(f"""ppc{_i} AS MATERIALIZED (
  SELECT source, node, nd, npred FROM (
    SELECT f.source, e.dst AS node, f.dist + e.w AS nd, e.src AS npred,
           row_number() OVER (PARTITION BY f.source, e.dst
                              ORDER BY f.dist + e.w, e.src) AS rn
    FROM pp{_i - 1} f JOIN wsu e ON f.node = e.src
    WHERE f.improved
  ) z WHERE rn = 1
), pp{_i} AS MATERIALIZED (
  SELECT COALESCE(d.source, c.source) AS source,
         COALESCE(d.node, c.node) AS node,
         CASE WHEN d.dist IS NULL OR c.nd < d.dist THEN c.nd ELSE d.dist END AS dist,
         CASE WHEN d.dist IS NULL OR c.nd < d.dist THEN c.npred ELSE d.pred END AS pred,
         (d.dist IS NULL OR (c.nd IS NOT NULL AND c.nd < d.dist)) AS improved
  FROM pp{_i - 1} d FULL JOIN ppc{_i} c ON d.source = c.source AND d.node = c.node
)""")
    _pp_walk = []
    for _j in range(1, 4):
        _pp_walk.append(f"""ppr{_j} AS MATERIALIZED (
  SELECT r.source, r.node, r.dist,
         CASE WHEN r.cur IS NULL THEN NULL ELSE t.pred END AS cur,
         CASE WHEN r.cur IS NULL THEN r.path ELSE r.cur || '->' || r.path END AS path
  FROM ppr{_j - 1} r LEFT JOIN pp3 t ON r.source = t.source AND r.cur = t.node
)""")
    sql["a2_sssp_paths"] = f"""WITH {g},
wsf AS MATERIALIZED (SELECT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
wsd AS (SELECT src, dst, {_ws_w} AS w FROM wsf),
wsu AS MATERIALIZED (
  SELECT src, dst, min(w) AS w FROM (
    SELECT src, dst, w FROM wsd
    UNION ALL SELECT dst AS src, src AS dst, w FROM wsd
  ) z GROUP BY src, dst
),
pp0 AS MATERIALIZED (
  SELECT id AS source, id AS node, CAST(0 AS BIGINT) AS dist,
         CAST(NULL AS VARCHAR) AS pred, true AS improved
  FROM (SELECT src AS id FROM wsf UNION SELECT dst FROM wsf) n
  WHERE id LIKE 'region:%'
),
{", ".join(_pp_rounds)},
ppr0 AS (SELECT source, node, dist, pred AS cur, CAST(node AS VARCHAR) AS path FROM pp3),
{", ".join(_pp_walk)}
SELECT source, node, CAST(dist AS BIGINT) AS dist, path, (cur IS NOT NULL) AS truncated
FROM ppr3"""

    # --- Adamic-Adar link prediction (operators/link_prediction.py): wedge
    # self-join on the center, anti-join out existing edges, per-pair fold
    # of 1/ln(deg) over SORTED common neighbors (list_reduce seeds from the
    # first element; 0.0 + t1 == t1 in IEEE, so the fold orders agree) ------
    sql["a2_link_prediction"] = f"""WITH {g},
lpf AS MATERIALIZED (SELECT src, dst FROM edges
      WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
lpsym AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM lpf UNION ALL SELECT dst AS src, src AS dst FROM lpf
  ) z WHERE src != dst
),
lpdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM lpsym GROUP BY src),
lpadj AS MATERIALIZED (
  SELECT s.src AS z, s.dst AS n, d.deg AS dz
  FROM lpsym s JOIN lpdeg d ON s.src = d.src
),
lpw AS MATERIALIZED (
  SELECT a.z, a.dz, a.n AS u, b.n AS v
  FROM lpadj a JOIN lpadj b ON a.z = b.z AND a.n < b.n
),
lpp AS MATERIALIZED (
  SELECT w.u, w.v, w.z, w.dz FROM lpw w
  WHERE NOT EXISTS (SELECT 1 FROM lpsym e WHERE e.src = w.u AND e.dst = w.v)
)
SELECT u, v,
       round(list_reduce(list(1.0 / ln(CAST(dz AS DOUBLE)) ORDER BY z),
                         (a, b) -> a + b), 6) AS score
FROM lpp GROUP BY u, v
ORDER BY score DESC, u, v LIMIT 500"""

    # --- SPPMI matrix over the walk skip-gram corpus
    # (operators/node_embeddings.py:sppmi_matrix, shift=2): the
    # a2_walk_skipgrams chain + exact integer marginals + one rounded log ----
    _sppmi_chain = f"""{_rw_core},
sgn AS MATERIALIZED (
  SELECT r.start, r.walk, r.step, n.id AS node
  FROM rwres r JOIN rwnn n ON r.node = n.h
),
sp AS MATERIALIZED (
  SELECT a.node AS center, b.node AS context, CAST(count(*) AS BIGINT) AS n_pairs
  FROM sgn a JOIN sgn b ON a.start = b.start AND a.walk = b.walk
  WHERE abs(a.step - b.step) <= 2 AND a.step != b.step
  GROUP BY center, context
),
ct AS (SELECT center, CAST(SUM(n_pairs) AS BIGINT) AS center_total FROM sp GROUP BY center),
xt AS (SELECT context, CAST(SUM(n_pairs) AS BIGINT) AS context_total FROM sp GROUP BY context),
tt AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS total FROM sp),
sppmi_cells AS MATERIALIZED (
  SELECT sp.center, sp.context, sp.n_pairs,
         ct.center_total, xt.context_total, tt.total,
         greatest(CAST(0.0 AS DOUBLE),
                  round(ln((CAST(sp.n_pairs AS DOUBLE) * CAST(tt.total AS DOUBLE))
                           / (CAST(ct.center_total AS DOUBLE)
                              * CAST(xt.context_total * 2 AS DOUBLE))), 6)) AS sppmi
  FROM sp JOIN ct ON sp.center = ct.center
  JOIN xt ON sp.context = xt.context
  CROSS JOIN tt
)"""
    sql["a2_node_embeddings"] = f"""WITH {g},
{_sppmi_chain}
SELECT center, context, n_pairs, center_total, context_total, total, sppmi
FROM sppmi_cells"""

    # --- v6 graph vectors: the embed_graph -> Entity_graph -> V6 lifecycle's
    # serve shape (api.py:embed_graph; operators/node_embeddings.py:
    # sppmi_node_embeddings coverage = nodes of positive shift-2 SPPMI cells
    # after symmetrization — centers UNION contexts).  One vector per covered
    # node, all of the graph dimension ---------------------------------------
    sql["v6_graph_vectors"] = f"""WITH {g},
{_sppmi_chain},
cov AS (SELECT center AS id FROM sppmi_cells WHERE sppmi > 0
        UNION SELECT context FROM sppmi_cells WHERE sppmi > 0)
SELECT 'Entity_graph' AS collection, CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(count(*) AS BIGINT) AS n_ids, 8 AS dim_min, 8 AS dim_max FROM cov"""

    # --- a2 eigenvector: 10 unrolled L1-normalized power-iteration rounds
    # over the SYMMETRIZED region-tree FK subgraph (the directed tree is a
    # DAG => identically zero; graph_metrics.py:eigenvector — hits's
    # authority half-step without the alternation, same CASE total = 0
    # guard and operand order) -----------------------------------------------
    _ev_iters = []
    _prev_x = "x0"
    for _i in range(1, 11):
        _ev_iters.append(f"""xr{_i} AS MATERIALIZED (
  SELECT e.v AS id, SUM(x.score) AS c
  FROM und e JOIN {_prev_x} x ON e.u = x.id GROUP BY e.v
), xt{_i} AS MATERIALIZED (SELECT COALESCE(SUM(c), CAST(0 AS DOUBLE)) AS t FROM xr{_i}),
x{_i} AS MATERIALIZED (
  SELECT n.id, CASE WHEN t.t = 0 THEN CAST(0 AS DOUBLE)
                    ELSE COALESCE(r.c, CAST(0 AS DOUBLE)) / t.t END AS score
  FROM allnodes n CROSS JOIN xt{_i} t LEFT JOIN xr{_i} r ON n.id = r.id
)""")
        _prev_x = f"x{_i}"
    sql["a2_eigenvector"] = f"""WITH {g},
fk AS MATERIALIZED (SELECT src, dst FROM edges
       WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
und AS MATERIALIZED (SELECT src AS u, dst AS v FROM fk UNION SELECT dst, src FROM fk),
allnodes AS MATERIALIZED (SELECT DISTINCT u AS id FROM und),
nn AS MATERIALIZED (SELECT count(*) AS n FROM allnodes),
x0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS score FROM allnodes CROSS JOIN nn),
{", ".join(_ev_iters)}
SELECT id, CAST(ROUND(score * 1000000.0) AS BIGINT) AS score_ppm
FROM x10 ORDER BY score_ppm DESC, id LIMIT 100"""

    # --- a2 articlerank: 10 unrolled rounds of the GDS recurrence
    # r = (1-d)/N + d * SUM r_u * w(u), over a statically pre-weighted edge
    # list w = 1/(deg+ + m/n) (graph_metrics.py:articlerank — identical
    # operand order: count-cast-double degree, double m/n average, no
    # dangling redistribution) -----------------------------------------------
    _ar_iters = []
    _prev_r = "r0"
    for _i in range(1, 11):
        _ar_iters.append(f"""rc{_i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(e.w * r.rank) AS c
  FROM ew e JOIN {_prev_r} r ON e.src = r.id GROUP BY e.dst
), r{_i} AS MATERIALIZED (
  SELECT n.id,
         ((1.0 - 0.85) / nn.n) + 0.85 * COALESCE(c.c, CAST(0 AS DOUBLE)) AS rank
  FROM allnodes n CROSS JOIN nn LEFT JOIN rc{_i} c ON n.id = c.id
)""")
        _prev_r = f"r{_i}"
    sql["a2_articlerank"] = f"""WITH {g},
fk AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
       WHERE relationship_name IN ('c_nationkey', 's_nationkey', 'n_regionkey')),
allnodes AS MATERIALIZED (SELECT src AS id FROM fk UNION SELECT dst FROM fk),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM allnodes),
mm AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS m FROM fk),
degs AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM fk GROUP BY src),
ew AS MATERIALIZED (
  SELECT f.src, f.dst, 1.0 / (d.deg + (mm.m / nn.n)) AS w
  FROM fk f JOIN degs d ON f.src = d.src CROSS JOIN mm CROSS JOIN nn),
r0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM allnodes CROSS JOIN nn),
{", ".join(_ar_iters)}
SELECT id, CAST(ROUND(rank * 1000000.0) AS BIGINT) AS rank_ppm
FROM r10 ORDER BY rank_ppm DESC, id LIMIT 100"""

    # --- a2 spanning forest: closed-form MSF of the generated ring+chords
    # graph (operators/spanning.py Borůvka; cycle property: every chord and
    # the heaviest ring edge are each the unique max of a cycle => MSF =
    # ring minus its heaviest edge).  Weights mirror the entry bit-for-bit:
    # md5_64('7|ring:' || i) / 2^60 ------------------------------------------
    _msf_w = _md5_64("concat('ring:', CAST(i AS VARCHAR))", 7)
    sql["a2_spanning_forest"] = f"""WITH ring AS (
  SELECT i AS src, (i + 1) % 128 AS dst,
         CAST({_msf_w} AS DOUBLE) / 1152921504606846976.0 AS w
  FROM range(128) t(i)
),
mx AS (SELECT max(w) AS mw FROM ring)
SELECT src, dst, CAST(ROUND(w * 1000000.0) AS BIGINT) AS weight_ppm
FROM ring CROSS JOIN mx WHERE w <> mw ORDER BY src, dst"""

    # --- a2 topological layers: 6 unrolled Kahn-peel rounds over the FK DAG
    # (operators/dag.py:topological_layers — peel zero-in-degree nodes, drop
    # their out-edges; layer = longest source path).  Integer-only contract:
    # per-(layer, node_type) counts --------------------------------------------
    _tp_rounds = []
    _prev_rem, _prev_e = "rem0", "te0"
    for _i in range(6):
        _tp_rounds.append(f"""tl{_i} AS MATERIALIZED (
  SELECT id FROM {_prev_rem} r
  WHERE NOT EXISTS (SELECT 1 FROM {_prev_e} e WHERE e.dst = r.id)
), rem{_i + 1} AS MATERIALIZED (
  SELECT id FROM {_prev_rem} WHERE id NOT IN (SELECT id FROM tl{_i})
), te{_i + 1} AS MATERIALIZED (
  SELECT src, dst FROM {_prev_e} WHERE src NOT IN (SELECT id FROM tl{_i})
)""")
        _prev_rem, _prev_e = f"rem{_i + 1}", f"te{_i + 1}"
    sql["a2_topo_layers"] = f"""WITH {g},
tfk AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
       WHERE relationship_name IN ('o_custkey', 'c_nationkey', 's_nationkey', 'n_regionkey')),
rem0 AS MATERIALIZED (SELECT src AS id FROM tfk UNION SELECT dst FROM tfk),
te0 AS MATERIALIZED (SELECT src, dst FROM tfk),
{", ".join(_tp_rounds)},
layered AS ({" UNION ALL ".join(f"SELECT id, CAST({_i} AS BIGINT) AS layer FROM tl{_i}" for _i in range(6))})
SELECT layer, split_part(id, ':', 1) AS node_type, CAST(count(*) AS BIGINT) AS n_nodes
FROM layered GROUP BY layer, node_type ORDER BY layer, node_type"""

    # --- dbscan: ε-graph through the SAME hyperplane buckets as
    # dedup_embedding_lsh, cores by neighbor count, clusters = min-id over
    # the recursive core-core closure, borders by min neighboring cluster
    # (operators/clustering.py:dbscan; threshold 0.25, min_pts 4) ------------
    _db_bucket = _hyperplane_bucket_sql("v", 4, 64)
    _db_cos = (
        "(list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))))"
    )
    _db_chain = f"""e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v, {_db_bucket} AS bucket FROM embeddings),
prs AS MATERIALIZED (
  SELECT CAST(a.vec_id AS VARCHAR) AS id_a, CAST(b.vec_id AS VARCHAR) AS id_b
  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round({_db_cos}, 6) >= 0.25
),
symn AS MATERIALIZED (SELECT id_a AS id, id_b AS nb FROM prs UNION ALL SELECT id_b, id_a FROM prs),
degs AS MATERIALIZED (SELECT id, count(*) AS n_other FROM symn GROUP BY id),
allv AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS id FROM e),
core AS MATERIALIZED (
  SELECT a.id FROM allv a LEFT JOIN degs d ON a.id = d.id
  WHERE COALESCE(d.n_other, 0) >= 3
),
ce AS MATERIALIZED (
  SELECT s.id AS a, s.nb AS b FROM symn s
  JOIN core c1 ON s.id = c1.id JOIN core c2 ON s.nb = c2.id
),
reach(id, seed) AS (
  SELECT id, id FROM core
  UNION
  SELECT ce.b, r.seed FROM reach r JOIN ce ON ce.a = r.id
),
clus AS (SELECT id, min(seed) AS cluster FROM reach GROUP BY id),
bord AS (
  SELECT s.id, min(cl.cluster) AS cluster
  FROM symn s
  JOIN core c ON s.nb = c.id
  JOIN clus cl ON s.nb = cl.id
  LEFT JOIN core own ON s.id = own.id
  WHERE own.id IS NULL
  GROUP BY s.id
)"""
    _db_final = """SELECT a.id,
       CASE WHEN c.id IS NOT NULL THEN 'core'
            WHEN b.id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS kind,
       COALESCE(cl.cluster, b.cluster) AS cluster
FROM allv a
LEFT JOIN core c ON a.id = c.id
LEFT JOIN clus cl ON a.id = cl.id
LEFT JOIN bord b ON a.id = b.id"""
    sql["dbscan_clusters"] = f"""WITH RECURSIVE
{_db_chain}
{_db_final}
ORDER BY a.id"""

    # --- td cluster-balanced sample: cap each DBSCAN cluster at 3 rows
    # picked by smallest (md5_64 hash, id); noise (NULL cluster) uncapped
    # (operators/training_data.py:cluster_balanced_sample ∘ clustering.py:
    # dbscan — diversity sampling over topic islands) ------------------------
    sql["td_cluster_sample"] = f"""WITH RECURSIVE
{_db_chain},
fin AS ({_db_final}),
rnr AS (
  SELECT id, kind, cluster,
         row_number() OVER (PARTITION BY cluster ORDER BY {_md5_64("id", 0)}, id) AS rn
  FROM fin
)
SELECT id, kind, cluster FROM rnr WHERE cluster IS NULL OR rn <= 3 ORDER BY id"""

    # --- composed curation with topic-island balancing (r11 VERDICT #9
    # stretch): gopher quality filter -> DBSCAN topic islands on the FULL
    # embedding set -> cluster-balanced cap over the quality survivors.
    # Every fragment is shared verbatim with its standalone proven entry
    # (td_gopher_filter, dbscan_clusters, td_cluster_sample); the
    # composition pins the order and the join wiring ------------------------
    sql["td_curate_clustered"] = f"""WITH RECURSIVE
{_db_chain},
fin AS ({_db_final}),
{_gopher_ctes},
keptq AS (SELECT doc_id FROM r WHERE len(reasons) = 0),
jq AS (
  SELECT f2.id, f2.kind, f2.cluster
  FROM fin f2 JOIN keptq k ON f2.id = k.doc_id
),
rnq AS (
  SELECT id, kind, cluster,
         row_number() OVER (PARTITION BY cluster ORDER BY {_md5_64("id", 0)}, id) AS rn
  FROM jq
)
SELECT id, kind, cluster FROM rnq WHERE cluster IS NULL OR rn <= 3 ORDER BY id"""

    # --- a2 k-spanning clusters: closed-form single-linkage cut on the ring
    # fixture (operators/spanning.py:k_spanning_clusters, k=4): cutting the
    # 3 heaviest MSF edges of a ring == removing the 4 heaviest ring edges,
    # so each node's cluster is the lexicographic min VARCHAR id of its arc
    # (arc = run of positions after the nearest removed edge, circularly) ----
    sql["a2_k_spanning"] = f"""WITH ringw AS (
  SELECT i AS src, CAST({_msf_w} AS DOUBLE) / 1152921504606846976.0 AS w
  FROM range(128) t(i)
),
rem AS (SELECT src FROM ringw ORDER BY w DESC LIMIT 4),
arc AS (
  SELECT n.i AS v,
         (SELECT (r.src + 1) % 128 FROM rem r
          ORDER BY ((n.i - (r.src + 1)) % 128 + 128) % 128 LIMIT 1) AS a
  FROM range(128) n(i)
),
clus AS (SELECT a, min(CAST(v AS VARCHAR)) AS cluster FROM arc GROUP BY a)
SELECT CAST(x.v AS VARCHAR) AS id, c.cluster
FROM arc x JOIN clus c ON x.a = c.a ORDER BY id"""

    return sql
