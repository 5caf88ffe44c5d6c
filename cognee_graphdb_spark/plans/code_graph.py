"""CODE pipeline: source files -> code graph + code vector collections.

Reference: the codegraph pipeline builds CodeFile / ClassDefinition /
FunctionDefinition datapoints whose collections the CODE retriever searches
(code_retriever.py:61-214; collections CodeFile_name,
ClassDefinition_source_code, FunctionDefinition_source_code).

Spark-first: parsing is an Arrow-batched mapInPandas stage using the stdlib
``ast`` module (public, deterministic — no external parser); everything
downstream (nodes, contains edges, collections) is expressions.  Files that
fail to parse are kept as bare CodeFile nodes (the reference skips unparsable
sources the same way).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cognee_graphdb_spark.ids import content_id
from cognee_graphdb_spark.llm.embedder import embed_column

_DEF_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("kind", T.StringType()),  # class | function
        T.StructField("name", T.StringType()),
        T.StructField("source_code", T.StringType()),
    ]
)


@dataclass
class CodeGraph:
    nodes: DataFrame
    edges: DataFrame
    embeddings: DataFrame


def extract_definitions(files: DataFrame, path_col: str = "path", source_col: str = "source") -> DataFrame:
    """(path, kind, name, source_code) per top-level class/function."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import ast

        for pdf in batches:
            rows = []
            for path, source in zip(pdf[path_col], pdf[source_col]):
                try:
                    tree = ast.parse(source or "")
                except SyntaxError:
                    continue
                for node in tree.body:
                    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                        rows.append((path, "function", node.name, ast.get_source_segment(source, node) or ""))
                    elif isinstance(node, ast.ClassDef):
                        rows.append((path, "class", node.name, ast.get_source_segment(source, node) or ""))
            yield pd.DataFrame(rows, columns=["path", "kind", "name", "source_code"])

    from cognee_graphdb_spark.session import fan_out, ship_package

    ship_package(files.sparkSession)
    return fan_out(files.select(path_col, source_col)).mapInPandas(run, _DEF_SCHEMA)


def cognify_code(files: DataFrame, embed_dim: int = 64) -> CodeGraph:
    """files(path, source) -> CodeFile/ClassDefinition/FunctionDefinition
    nodes, contains edges, and the three code collections."""
    defs = extract_definitions(files).cache()

    file_nodes = files.select(
        content_id(F.lit("CodeFile"), "path").alias("id"),
        F.col("path").alias("name"),
        F.lit("CodeFile").alias("type"),
    ).dropDuplicates(["id"])

    def_nodes = defs.select(
        content_id(F.lit("CodeDef"), "path", "kind", "name").alias("id"),
        "name",
        F.when(F.col("kind") == "class", F.lit("ClassDefinition")).otherwise(F.lit("FunctionDefinition")).alias("type"),
    ).dropDuplicates(["id"])

    edges = defs.select(
        content_id(F.lit("CodeFile"), "path").alias("src"),
        content_id(F.lit("CodeDef"), "path", "kind", "name").alias("dst"),
        F.lit("contains").alias("relationship_name"),
    ).dropDuplicates(["src", "dst", "relationship_name"])

    emb_files = files.select(
        F.lit("CodeFile_name").alias("collection"),
        content_id(F.lit("CodeFile"), "path").alias("id"),
        F.col("path").alias("text"),
    )
    emb_defs = defs.select(
        F.when(F.col("kind") == "class", F.lit("ClassDefinition_source_code"))
        .otherwise(F.lit("FunctionDefinition_source_code"))
        .alias("collection"),
        content_id(F.lit("CodeDef"), "path", "kind", "name").alias("id"),
        F.col("source_code").alias("text"),
    )
    embeddings = (
        emb_files.unionByName(emb_defs)
        .dropDuplicates(["collection", "id"])
        .withColumn("vector", embed_column("text", dim=embed_dim))
    )
    return CodeGraph(nodes=file_nodes.unionByName(def_nodes), edges=edges, embeddings=embeddings)
