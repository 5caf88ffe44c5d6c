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
        T.StructField("kind", T.StringType()),  # class | function | import
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
                pkg_parts = path.rsplit("/", 1)[0].split("/") if "/" in path else []
                for node in tree.body:
                    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                        rows.append((path, "function", node.name, ast.get_source_segment(source, node) or ""))
                    elif isinstance(node, ast.ClassDef):
                        rows.append((path, "class", node.name, ast.get_source_segment(source, node) or ""))
                    # import statements feed the repo dependency graph
                    # (reference get_local_dependencies.py:279-293 emits
                    # ImportStatement datapoints; :203 links depends_on)
                    elif isinstance(node, ast.Import):
                        for alias in node.names:
                            rows.append((path, "import", alias.name, ""))
                    elif isinstance(node, ast.ImportFrom):
                        if node.level == 0:
                            base = []
                            mod = node.module or ""
                        else:
                            # relative import: resolve against the file's package
                            base = pkg_parts[: len(pkg_parts) - (node.level - 1)] if node.level > 1 else pkg_parts
                            mod = ".".join([*base, node.module]) if node.module else ""
                        if mod:
                            rows.append((path, "import", mod, ""))
                        elif node.level > 0:
                            # ``from . import c`` — each name is a submodule
                            for alias in node.names:
                                rows.append((path, "import", ".".join([*base, alias.name]), ""))
            yield pd.DataFrame(rows, columns=["path", "kind", "name", "source_code"])

    from cognee_graphdb_spark.session import fan_out, ship_package

    ship_package(files.sparkSession)
    return fan_out(files.select(path_col, source_col)).mapInPandas(run, _DEF_SCHEMA)


def local_dependency_edges(files: DataFrame, imports: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Resolve import statements to repo-local files: the reference's
    get_repo_file_dependencies graph (CodeFile.depends_on,
    get_local_dependencies.py:203) as an equi-join.

    A module ``a.b.c`` is local iff a file ``a/b/c.py`` or ``a/b/c/__init__.py``
    exists — each import explodes to its two candidate paths and joins the
    (small, broadcastable) file-path list.  Resolved imports become
    CodeFile -depends_on-> CodeFile edges; unresolved ones become
    ImportStatement nodes with an ``imports`` edge, as the reference keeps
    external imports as datapoints.

    Returns (import_nodes, edges).
    """
    cand = imports.select(
        "path",
        F.col("name").alias("module"),
        F.explode(
            F.array(
                F.concat(F.regexp_replace("name", r"\.", "/"), F.lit(".py")),
                F.concat(F.regexp_replace("name", r"\.", "/"), F.lit("/__init__.py")),
            )
        ).alias("target_path"),
    )
    paths = files.select(F.col("path").alias("target_path")).dropDuplicates()
    resolved = cand.join(paths, "target_path", "leftsemi")
    dep_edges = resolved.select(
        content_id(F.lit("CodeFile"), "path").alias("src"),
        content_id(F.lit("CodeFile"), "target_path").alias("dst"),
        F.lit("depends_on").alias("relationship_name"),
    ).dropDuplicates(["src", "dst", "relationship_name"])

    unresolved = (
        imports.select("path", F.col("name").alias("module"))
        .join(resolved.select("path", "module").dropDuplicates(), ["path", "module"], "left_anti")
    )
    import_nodes = unresolved.select(
        content_id(F.lit("ImportStatement"), "module").alias("id"),
        F.col("module").alias("name"),
        F.lit("ImportStatement").alias("type"),
    ).dropDuplicates(["id"])
    import_edges = unresolved.select(
        content_id(F.lit("CodeFile"), "path").alias("src"),
        content_id(F.lit("ImportStatement"), "module").alias("dst"),
        F.lit("imports").alias("relationship_name"),
    ).dropDuplicates(["src", "dst", "relationship_name"])
    return import_nodes, dep_edges.unionByName(import_edges)


def cognify_code(files: DataFrame, embed_dim: int = 64) -> CodeGraph:
    """files(path, source) -> CodeFile/ClassDefinition/FunctionDefinition/
    ImportStatement nodes, contains/depends_on/imports edges, and the three
    code collections."""
    extracted = extract_definitions(files).cache()
    defs = extracted.filter(F.col("kind") != "import")
    imports = extracted.filter(F.col("kind") == "import")

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

    contains = defs.select(
        content_id(F.lit("CodeFile"), "path").alias("src"),
        content_id(F.lit("CodeDef"), "path", "kind", "name").alias("dst"),
        F.lit("contains").alias("relationship_name"),
    ).dropDuplicates(["src", "dst", "relationship_name"])
    import_nodes, dep_edges = local_dependency_edges(files, imports)
    edges = contains.unionByName(dep_edges)

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
    return CodeGraph(
        nodes=file_nodes.unionByName(def_nodes).unionByName(import_nodes),
        edges=edges,
        embeddings=embeddings,
    )
