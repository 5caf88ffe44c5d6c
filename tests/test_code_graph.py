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


def test_repo_dependency_graph(spark):
    # pkg/a.py imports pkg.b (local, resolved) and os (external); pkg/b.py
    # relative-imports .c (resolved); pkg/c/__init__.py closes the chain
    files = spark.createDataFrame(
        [
            ("pkg/a.py", "import os\nimport pkg.b\n\ndef fa():\n    pass\n"),
            ("pkg/b.py", "from . import c\n\ndef fb():\n    pass\n"),
            ("pkg/c/__init__.py", "def fc():\n    pass\n"),
        ],
        ["path", "source"],
    )
    cg = cognify_code(files)
    names = {r["id"]: r["name"] for r in cg.nodes.collect()}
    dep = [
        (names[r["src"]], names[r["dst"]])
        for r in cg.edges.filter(F.col("relationship_name") == "depends_on").collect()
    ]
    assert ("pkg/a.py", "pkg/b.py") in dep
    assert ("pkg/b.py", "pkg/c/__init__.py") in dep
    # external import kept as an ImportStatement datapoint, not dropped
    ext = cg.nodes.filter(F.col("type") == "ImportStatement").collect()
    assert {r["name"] for r in ext} == {"os"}
    imp = [
        (names[r["src"]], names[r["dst"]])
        for r in cg.edges.filter(F.col("relationship_name") == "imports").collect()
    ]
    assert imp == [("pkg/a.py", "os")]


def test_code_search_over_code_graph(spark):
    files = spark.createDataFrame(SOURCES, ["path", "source"])
    cg = cognify_code(files)
    ctx = GraphContext(nodes=cg.nodes, edges=cg.edges, embeddings=cg.embeddings)
    out = code_search(ctx, "engine.py scan table rows", k=2).collect()
    texts = " ".join(r["text"] or "" for r in out)
    assert "engine.py" in texts
    assert "scan_table" in texts
