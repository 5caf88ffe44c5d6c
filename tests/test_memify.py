"""memify — graph enrichment over an already-cognified store (reference
modules/memify/memify.py + tasks/codingagents/coding_rule_associations.py)."""

from pyspark.sql import functions as F

from cognee_graphdb_spark.api import CogneeSpark

ITEMS = [
    ("style.md", "You should always run the linter. Spark jobs never block the driver."),
    ("perf.md", "Prefer broadcast joins for small tables. The cluster has many nodes."),
    ("plain.md", "This document contains no imperatives at all. Just facts here."),
]


def test_memify_adds_rules_and_is_idempotent(spark, tmp_path):
    e = CogneeSpark(spark, str(tmp_path / "m"))
    e.add(ITEMS)
    assert e.cognify() == 3

    n = e.memify()
    assert n >= 3  # should-, never-, prefer- sentences all yield rules

    nodes = e.store.load("nodes")
    rules = nodes.filter(F.col("type") == "CodingRule")
    assert rules.count() == n
    # every rule belongs to the default ruleset and links to its origin chunk
    edges = e.store.load("edges")
    assert edges.filter(
        (F.col("relationship_name") == "belongs_to")
        & F.col("src").isin([r["id"] for r in rules.select("id").collect()])
    ).count() == n
    origins = edges.filter(F.col("relationship_name") == "rule_associated_from")
    assert origins.count() >= n
    chunk_ids = {r["id"] for r in nodes.filter(F.col("type") == "DocumentChunk").select("id").collect()}
    assert {r["dst"] for r in origins.collect()} <= chunk_ids

    # rules are indexed for vector search
    emb = e.store.load("embeddings")
    assert emb.filter(F.col("collection") == "CodingRule_text").count() == n

    # content-addressed ids => re-running adds nothing
    assert e.memify() == 0
    assert e.store.load("nodes").filter(F.col("type") == "CodingRule").count() == n

    # CODING_RULES search returns the memified rules
    out = e.search("CODING_RULES", "what are the rules?")
    assert out.count() == n


def test_memify_nodeset_scoping(spark, tmp_path):
    """node_type/node_names scoping: only chunks inside the J4 subgraph feed
    the enrichment (get_memory_fragment scoping, memify.py:95-97)."""
    e = CogneeSpark(spark, str(tmp_path / "ms"))
    e.add(ITEMS[:1], node_set="styleset")
    e.cognify()
    e.add(ITEMS[1:2], node_set="perfset")
    e.cognify()

    # scope to the styleset document's neighborhood: only style.md rules land
    n = e.memify(node_type="NodeSet", node_names=["styleset"])
    rules = e.store.load("nodes").filter(F.col("type") == "CodingRule")
    assert rules.count() == n > 0
    texts = " ".join(r["name"] for r in rules.collect()).lower()
    assert "linter" in texts and "broadcast" not in texts
