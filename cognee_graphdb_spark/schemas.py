"""Canonical table schemas (SURVEY.md §1, FIXTURES.md §1).

The reference persists a deliberately minimal row-oriented graph schema
(kuzu adapter.py:143-161): fixed columns + a JSON ``properties`` blob.  The
Spark mapping uses a real ``map<string,string>`` for properties so Catalyst can
prune/push instead of re-parsing JSON per row; ``from_json``/``get_json_object``
appear only at ingest boundaries.

Partitioning intent at scale (100 TB):
- ``nodes``/``edges``/``embeddings`` partitioned by ``dataset_id`` (the reference's
  DB-per-dataset multi-tenancy becomes partition pruning — search.py:322),
  then bucketed by ``id`` / ``src`` so node-resolution joins co-locate.
- ``embeddings`` additionally partitioned by ``collection`` so a single-collection
  scan (V1) touches one partition subtree.
"""

from __future__ import annotations

from pyspark.sql import types as T

NODES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("dataset_id", T.StringType(), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("relationship_name", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("dataset_id", T.StringType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("collection", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("vector", T.ArrayType(T.FloatType()), True),
        T.StructField("payload", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("dataset_id", T.StringType(), True),
    ]
)

DATASETS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("owner_id", T.StringType(), True),
    ]
)

DATA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),  # md5(content_hash + owner) — ingest_data.py:93-96
        T.StructField("name", T.StringType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("dataset_id", T.StringType(), True),
    ]
)

PIPELINE_RUNS_SCHEMA = T.StructType(
    [
        T.StructField("dataset_id", T.StringType(), False),
        T.StructField("pipeline_name", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # STARTED | COMPLETED | ERRORED
    ]
)

# Append-only audit of graph mutations (reference: graph_db_interface.py:22-134).
EDGE_LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),  # add_node | add_edge | delete_node | ...
        T.StructField("id", T.StringType(), False),
        T.StructField("created_by", T.StringType(), True),
        T.StructField("at", T.TimestampType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_testdata(spark, sf_dir: str, tables=TESTDATA_TABLES):
    """Load the driver's synthetic parquet tables as a dict of DataFrames.

    Reads are submitted from a thread pool: each ``spark.read.parquet``
    serially pays file listing + footer schema inference (~0.3s/table on
    cold metadata), and the per-table reads are independent driver work."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, len(tables))) as pool:
        futures = {t: pool.submit(spark.read.parquet, f"{sf_dir}/{t}.parquet") for t in tables}
        return {t: f.result() for t, f in futures.items()}
