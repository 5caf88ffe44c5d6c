"""End-to-end pipeline invariants: cognify graph shape, idempotent re-run
(the reference's test_deduplication.py invariant), triplet search + render."""

from pyspark.sql import functions as F

from cognee_graphdb_spark.plans.cognify import cognify_documents
from cognee_graphdb_spark.plans.triplet_search import brute_force_triplet_search, render_triplets

DOCS = [
    (1, "Apache Spark processes large datasets. Spark uses distributed executors."),
    (2, "DuckDB is an embedded analytical database. DuckDB executes vectorized queries."),
    (3, "Apache Spark processes large datasets. Spark uses distributed executors."),
]


def test_cognify_shapes(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    res = cognify_documents(docs)
    types = {r["type"]: r["n"] for r in res.nodes.groupBy("type").agg(F.count("*").alias("n")).collect()}
    assert types["TextDocument"] == 3
    assert types["DocumentChunk"] == 2  # doc 3 duplicates doc 1 -> same content-addressed chunk
    assert types["Entity"] > 0 and types["EntityType"] > 0 and types["TextSummary"] > 0
    colls = {r["collection"] for r in res.embeddings.select("collection").distinct().collect()}
    assert colls == {
        "DocumentChunk_text",
        "Entity_name",
        "EntityType_name",
        "TextSummary_text",
        "EdgeType_relationship_name",
    }
    # every edge endpoint resolves (P5 invariant at build time)
    ids = res.nodes.select("id")
    dangling = (
        res.edges.join(ids.withColumnRenamed("id", "src"), "src", "left_anti").count()
        + res.edges.join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti").count()
    )
    assert dangling == 0


def test_cognify_idempotent_ids(spark):
    """Content-addressed ids: cognifying the same text twice yields the same
    node set — the reference's dedup-by-content invariant
    (tests/test_deduplication.py:13-106)."""
    docs = spark.createDataFrame(DOCS[:1], ["doc_id", "text"])
    a = {tuple(r) for r in cognify_documents(docs).nodes.select("id", "type").collect()}
    b = {tuple(r) for r in cognify_documents(docs).nodes.select("id", "type").collect()}
    assert a == b


def test_triplet_search_and_render(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    res = cognify_documents(docs)
    top = brute_force_triplet_search(res.nodes, res.edges, res.embeddings, "spark distributed executors", k=5)
    rows = top.collect()
    assert 0 < len(rows) <= 5
    assert rows == sorted(rows, key=lambda r: (r["triplet_score"], r["src"], r["dst"]))
    text = render_triplets(top)
    assert text.startswith("Nodes:\n")
    assert "__node_content_start__" in text
    assert "\nConnections:\n" in text
    assert "--[" in text and "]-->" in text
