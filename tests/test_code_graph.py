"""CODE pipeline: parse real python sources into the code graph and search it."""

from pyspark.sql import functions as F

from cognee_graphdb_spark.plans.code_graph import cognify_code
from cognee_graphdb_spark.plans.search_types import GraphContext, code_search

SOURCES = [
    (
        "engine.py",
        "def scan_table(rows):\n    return [r for r in rows]\n\n"
        "class QueryEngine:\n    def run(self):\n        return scan_table([])\n",
    ),
    ("util.py", "def helper():\n    return 42\n"),
    ("broken.py", "def oops(:\n"),  # unparsable -> bare CodeFile node
]


def test_cognify_code_shapes(spark):
    files = spark.createDataFrame(SOURCES, ["path", "source"])
    cg = cognify_code(files)
    types = {r["type"]: r["n"] for r in cg.nodes.groupBy("type").agg(F.count("*").alias("n")).collect()}
    assert types == {"CodeFile": 3, "FunctionDefinition": 2, "ClassDefinition": 1}
    colls = {r["collection"] for r in cg.embeddings.select("collection").distinct().collect()}
    assert colls == {"CodeFile_name", "FunctionDefinition_source_code", "ClassDefinition_source_code"}
    # contains edges resolve file -> definition
    assert cg.edges.count() == 3
    # source payloads carry the real code
    fn = cg.embeddings.filter(F.col("collection") == "FunctionDefinition_source_code").collect()
    assert any("scan_table" in r["text"] for r in fn)


def test_code_search_over_code_graph(spark):
    files = spark.createDataFrame(SOURCES, ["path", "source"])
    cg = cognify_code(files)
    ctx = GraphContext(nodes=cg.nodes, edges=cg.edges, embeddings=cg.embeddings)
    out = code_search(ctx, "engine.py scan table rows", k=2).collect()
    texts = " ".join(r["text"] or "" for r in out)
    assert "engine.py" in texts
    assert "scan_table" in texts
