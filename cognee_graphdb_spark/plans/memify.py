"""``memify`` — enrichment over an ALREADY-BUILT graph (SURVEY.md §3; reference
cognee/modules/memify/memify.py:28-120).

The reference shape: an extraction stage pulls a memory fragment out of the
stored graph (default ``extract_subgraph_chunks`` — the chunk texts of the
node_type/node_names-scoped subgraph), an enrichment stage derives new
DataPoints from it (default ``add_rule_associations``,
tasks/codingagents/coding_rule_associations.py: LLM-extract developer rules,
dedup against the existing ruleset, link each rule to its origin chunk and to
the ``coding_agent_rules`` NodeSet).

Spark-first: extraction is a J4 subgraph projection + property select (no
graph walk — chunk text lives on the DocumentChunk nodes), rule extraction is
an Arrow-batched ``mapInPandas`` over chunk texts, and the merge into the
stored graph is the same S6 MERGE-upsert every other writer uses.  Dedup
against existing rules is an id anti-join (rule ids are content-addressed, so
"same rule text" == "same id" — the reference's uuid5(NAMESPACE_OID, text)
trick, ids.py:content_id).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cognee_graphdb_spark.ids import content_id
from cognee_graphdb_spark.llm.gateway import MockLLMGateway

_RULES_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType()),
        T.StructField("rule_text", T.StringType()),
    ]
)


def extract_subgraph_chunks(
    nodes: DataFrame,
    edges: DataFrame,
    node_type: str | None = None,
    node_names: list[str] | None = None,
) -> DataFrame:
    """(chunk_id, text) of every DocumentChunk in the graph, optionally scoped
    to the 1-hop closure of (node_type, node_names) seeds — the default memify
    extraction task (tasks/memify/extract_subgraph_chunks.py; scoping per
    memify.py:95-97 get_memory_fragment)."""
    if node_type is not None or node_names is not None:
        from cognee_graphdb_spark.operators.graph_joins import nodeset_subgraph

        scoped, _ = nodeset_subgraph(nodes, edges, node_type, node_names or [])
        # chunks hang one hop BELOW documents (chunk -is_part_of-> doc), so a
        # fragment that reached a document implicitly owns its chunks — pull
        # them in through the membership edge (the closure itself is 1-hop)
        doc_chunks = (
            edges.filter(F.col("relationship_name") == "is_part_of")
            .join(F.broadcast(scoped.select(F.col("id").alias("dst"))), "dst", "leftsemi")
            .select(F.col("src").alias("id"))
        )
        member_ids = scoped.select("id").unionByName(doc_chunks).distinct()
        nodes = nodes.join(member_ids, "id", "leftsemi")
    return nodes.filter(F.col("type") == "DocumentChunk").select(
        F.col("id").alias("chunk_id"), F.col("properties")["text"].alias("text")
    )


def extract_rules_stage(chunks: DataFrame, gateway: MockLLMGateway) -> DataFrame:
    """(chunk_id, rule_text) via the gateway, Arrow-batched (the Rule/RuleSet
    LLM call in coding_rule_associations.py:94-118)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for chunk_id, text in zip(pdf["chunk_id"], pdf["text"]):
                for rule in gateway.extract_rules(text or ""):
                    rows.append((chunk_id, rule))
            yield pd.DataFrame(rows, columns=["chunk_id", "rule_text"])

    from cognee_graphdb_spark.session import fan_out, ship_package

    ship_package(chunks.sparkSession)
    return fan_out(chunks.select("chunk_id", "text")).mapInPandas(run, _RULES_SCHEMA)


def rule_graph(rules: DataFrame, nodeset_name: str) -> tuple[DataFrame, DataFrame]:
    """Rules -> (nodes, edges): CodingRule nodes + the NodeSet node, with
    ``belongs_to`` (rule -> set) and ``rule_associated_from`` (rule -> origin
    chunk) edges (get_origin_edges, coding_rule_associations.py:53-90).

    The origin link needs no vector search here: rules are extracted FROM the
    chunk rows, so the origin chunk id rides along instead of being recovered
    by a nearest-neighbor lookup (the reference re-finds it because its task
    only receives bare text)."""
    rule_id = content_id(F.lit("CodingRule"), "rule_text")
    rule_nodes = rules.select(
        rule_id.alias("id"),
        F.col("rule_text").alias("name"),
        F.lit("CodingRule").alias("type"),
        F.map_from_arrays(F.array(F.lit("text")), F.array(F.col("rule_text"))).alias("properties"),
    ).dropDuplicates(["id"])
    spark = rules.sparkSession
    set_node = spark.createDataFrame([(nodeset_name,)], ["name"]).select(
        content_id(F.lit("NodeSet"), "name").alias("id"),
        "name",
        F.lit("NodeSet").alias("type"),
        F.create_map().cast("map<string,string>").alias("properties"),
    )
    e_belongs = rule_nodes.select(
        F.col("id").alias("src"),
        content_id(F.lit("NodeSet"), F.lit(nodeset_name)).alias("dst"),
        F.lit("belongs_to").alias("relationship_name"),
    )
    e_origin = rules.select(
        rule_id.alias("src"),
        F.col("chunk_id").alias("dst"),
        F.lit("rule_associated_from").alias("relationship_name"),
    ).dropDuplicates(["src", "dst", "relationship_name"])
    return rule_nodes.unionByName(set_node), e_belongs.unionByName(e_origin)
