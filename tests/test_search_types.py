"""Search-type plan tests over a cognified fixture corpus."""

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.plans.cognify import cognify_documents
from cognee_graphdb_spark.plans.search_types import (
    GraphContext,
    code_search,
    coding_rules,
    cypher_search,
    feeling_lucky,
    graph_completion,
    graph_completion_cot,
    graph_completion_context_extension,
    graph_summary_completion,
    insights,
    lexical_chunks,
    natural_language_search,
    rag_completion,
    search_chunks,
    search_summaries,
    temporal_context,
)

DOCS = [
    (1, "Apache Spark processes large datasets. Spark uses distributed executors and partitions."),
    (2, "DuckDB is an embedded analytical database. DuckDB executes vectorized queries quickly."),
    (3, "Graph databases store entities and relationships. Traversal queries follow edges between nodes."),
]


@pytest.fixture(scope="module")
def ctx(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    res = cognify_documents(docs)
    chunks = res.chunks.select("chunk_id", "text")
    return GraphContext(
        nodes=res.nodes.cache(),
        edges=res.edges.cache(),
        embeddings=res.embeddings.cache(),
        chunks=chunks.cache(),
    )


def test_chunks_and_summaries(ctx):
    out = search_chunks(ctx, "distributed spark executors", k=2).collect()
    assert len(out) == 2
    assert "Spark" in out[0]["text"]
    assert len(search_summaries(ctx, "vectorized database", k=2).collect()) == 2


def test_rag_and_graph_completions(ctx):
    assert rag_completion(ctx, "what uses executors?").startswith("MOCK_COMPLETION")
    assert graph_completion(ctx, "what uses executors?").startswith("MOCK_COMPLETION")
    assert graph_summary_completion(ctx, "what uses executors?").startswith("MOCK_COMPLETION")


def test_cot_and_context_extension_loops(ctx):
    answer, triplets = graph_completion_cot(ctx, "what relates to spark?", k=3, max_iter=2)
    assert answer.startswith("MOCK_COMPLETION")
    assert triplets.count() >= 3  # union across rounds can only grow
    answer2, triplets2 = graph_completion_context_extension(ctx, "what relates to spark?", k=3, max_iter=2)
    assert answer2.startswith("MOCK_COMPLETION")
    assert triplets2.count() >= 3


def test_graph_completion_nodeset_scope(ctx):
    from cognee_graphdb_spark.plans.search_types import graph_completion_context

    name = ctx.nodes.filter(F.col("type") == "Entity").orderBy("id").first()["name"]
    rows = graph_completion_context(ctx, "anything", k=50, node_type="Entity", node_names=[name]).collect()
    assert rows, "scoped search returned nothing"
    full = graph_completion_context(ctx, "anything", k=50).collect()
    assert len(rows) < len(full)  # genuinely restricted


def test_insights_vector_path(ctx):
    out = insights(ctx, "distributed executors", k=3).collect()
    assert len(out) > 0
    keys = [(r["src"], r["relationship_name"], r["dst"]) for r in out]
    assert len(keys) == len(set(keys))  # SO1 dedup by (src, rel, dst)


def test_insights_exact_node_path(ctx):
    some_id = ctx.nodes.filter(F.col("type") == "Entity").first()["id"]
    out = insights(ctx, some_id).collect()
    assert len(out) > 0
    assert all(r["src"] == some_id or r["dst"] == some_id for r in out)


def test_lexical_chunks_set_and_multiset(ctx):
    out = lexical_chunks(ctx, "spark distributed executors", k=2).collect()
    assert len(out) == 2
    assert out[0]["score"] >= out[1]["score"]
    assert "Spark" in out[0]["text"]
    m = lexical_chunks(ctx, "spark spark executors", k=2, multiset=True).collect()
    assert len(m) == 2 and 0 < m[0]["score"] <= 1.0


def test_cypher_passthrough(spark, ctx):
    out = cypher_search(
        spark, ctx, "SELECT relationship_name, count(*) AS n FROM edges GROUP BY relationship_name"
    ).collect()
    assert {r["relationship_name"] for r in out} >= {"is_part_of", "contains", "is_a"}


def test_natural_language_search(spark, ctx):
    out = natural_language_search(spark, ctx, "show me every Entity node")
    rows = out.collect()
    assert 0 < len(rows) <= 20
    assert all(r["type"] == "Entity" for r in rows)


def test_feeling_lucky_dispatch(spark, ctx):
    chosen, result = feeling_lucky(spark, ctx, "please summarize the data")
    assert chosen == "SUMMARIES"
    chosen2, result2 = feeling_lucky(spark, ctx, "tell me about spark")
    assert chosen2 == "RAG_COMPLETION" and result2.startswith("MOCK_COMPLETION")


def test_code_search_and_coding_rules(spark, ctx):
    from cognee_graphdb_spark.llm.embedder import embed_column

    code_emb = spark.createDataFrame(
        [
            ("CodeFile_name", "f1", "engine.py"),
            ("FunctionDefinition_source_code", "fn1", "def scan_table(): return rows"),
            ("FunctionDefinition_source_code", "fn2", "def unrelated(): pass"),
        ],
        ["collection", "id", "text"],
    ).withColumn("vector", embed_column("text"))
    cctx = GraphContext(nodes=ctx.nodes, edges=ctx.edges, embeddings=code_emb)
    out = code_search(cctx, "engine.py scan table rows", k=1).collect()
    ids = {r["id"] for r in out}
    assert "f1" in ids and "fn1" in ids

    rules_nodes = spark.createDataFrame(
        [
            ("r1", "always use pytest", "CodingRule"),
            ("r2", "never shell out", "CodingRule"),
            ("ns", "coding_agent_rules", "NodeSet"),
            ("x", "unrelated", "Entity"),
        ],
        ["id", "name", "type"],
    )
    rules_edges = spark.createDataFrame(
        [("r1", "ns", "belongs_to"), ("x", "ns", "belongs_to")], ["src", "dst", "relationship_name"]
    )
    rctx = GraphContext(nodes=rules_nodes, edges=rules_edges, embeddings=ctx.embeddings)
    got = {r["id"] for r in coding_rules(rctx).collect()}
    assert got == {"r1"}


def test_temporal_context_via_extraction(spark):
    from cognee_graphdb_spark.plans.temporal_graph import cognify_temporal

    docs = spark.createDataFrame(
        [
            (1, "The launch happened on 2024-03-05 in Berlin."),
            (2, "A conference ran from 2024-03-10 to 2024-03-12."),
            (3, "An old meeting took place on 2020-01-01."),
        ],
        ["doc_id", "text"],
    )
    tg = cognify_temporal(docs)
    ctx = GraphContext(nodes=tg.nodes, edges=tg.edges, embeddings=tg.embeddings)
    out = temporal_context(ctx, "what happened between 2024-03-01 and 2024-03-31?", k=5).collect()
    names = {r["name"] for r in out}
    assert any("launch" in n for n in names)
    assert any("conference" in n for n in names)
    assert not any("meeting" in n for n in names)  # outside the interval
    # fallback path: no interval in the query -> triplet search shape
    fb = temporal_context(ctx, "tell me about the launch")
    assert "triplet_score" in fb.columns


def test_chunk_classification_graph(spark):
    """chunk_naive_llm_classifier parity (plans/chunk_classify.py): the three
    reference edge kinds, content-addressed dedup, and the `classification`
    vector collection (chunk_naive_llm_classifier.py:27-37)."""
    from cognee_graphdb_spark.plans.chunk_classify import classify_chunks

    chunks = spark.createDataFrame(
        [
            ("c1", "d1", "massive dataset pipeline runs smooth"),
            ("c2", "d1", "tiny rows only"),
            ("c3", "d2", "massive dataset pipeline runs smooth"),  # dup text of c1? no: distinct id
        ],
        "chunk_id string, doc_id string, text string",
    )
    res = classify_chunks(chunks)

    nodes = {(r["name"], r["type"]) for r in res.nodes.collect()}
    assert ("TextContent", "ClassificationType") in nodes
    assert ("massive", "ClassificationSubtype") in nodes
    assert ("dataset", "ClassificationSubtype") in nodes  # first-2 cap: 'pipeline' excluded
    assert ("pipeline", "ClassificationSubtype") not in nodes

    rels = {r["relationship_name"] for r in res.edges.collect()}
    assert rels == {"is_media_type", "is_subtype_of", "is_classified_as"}
    # every chunk points at its type; only chunks with subclasses classify
    media = res.edges.filter("relationship_name = 'is_media_type'").count()
    assert media == 3
    classified = res.edges.filter("relationship_name = 'is_classified_as'").count()
    assert classified == 4  # c1, c3 x {massive, dataset}; c2 has no len>=6 word

    emb = res.embeddings.collect()
    assert all(r["collection"] == "classification" for r in emb)
    assert {r["text"] for r in emb} == {"massive", "dataset"}
    assert all(len(r["vector"]) == 64 and r["document_id"] for r in emb)
