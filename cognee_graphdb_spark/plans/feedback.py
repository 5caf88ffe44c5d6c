"""FEEDBACK search type (SURVEY.md §2.11): store Q&A interactions, attach user
feedback with sentiment, and mutate feedback weights on the graph elements that
produced the answer.

Reference: graph_completion_retriever.py:183-237 (save_interaction),
user_qa_feedback.py:28-83 (add_feedback), kuzu adapter.py:1701-1760
(last-k interactions + weight write).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cognee_graphdb_spark.ids import py_content_id
from cognee_graphdb_spark.llm.gateway import MockLLMGateway
from cognee_graphdb_spark.sources.sinks import GraphStore

INTERACTION_TYPE = "CogneeUserInteraction"
FEEDBACK_TYPE = "CogneeUserFeedback"
FEEDBACK_NODESET = "UserQAFeedbacks"


def save_interaction(
    store: GraphStore,
    spark: SparkSession,
    question: str,
    answer: str,
    triplets: DataFrame,
    created_at: int | None = None,
) -> str:
    """Persist a Q&A interaction node + used_graph_element_to_answer edges to
    every node of the answering triplets.  Returns the interaction id."""
    created_at = int(time.time()) if created_at is None else created_at
    iid = py_content_id("interaction", question, answer)
    node = spark.createDataFrame(
        [(iid, question[:80], INTERACTION_TYPE, {"question": question, "answer": answer, "created_at": str(created_at)})],
        "id string, name string, type string, properties map<string,string>",
    )
    store.upsert_nodes(node, created_by="save_interaction")
    used = (
        triplets.select(F.col("src").alias("dst"))
        .unionByName(triplets.select(F.col("dst").alias("dst")))
        .distinct()
        .select(
            F.lit(iid).alias("src"),
            "dst",
            F.lit("used_graph_element_to_answer").alias("relationship_name"),
            F.create_map().cast("map<string,string>").alias("properties"),
        )
    )
    store.upsert_edges(used, created_by="save_interaction")
    return iid


def last_k_interactions(store: GraphStore, k: int) -> DataFrame:
    """W4 — ORDER BY created_at DESC LIMIT k (kuzu adapter.py:1701-1723)."""
    nodes = store.load("nodes")
    return (
        nodes.filter(F.col("type") == INTERACTION_TYPE)
        .select("id", F.col("properties")["created_at"].cast("bigint").alias("created_at"))
        .orderBy(F.col("created_at").desc(), F.col("id").desc())
        .limit(k)
    )


def add_feedback(
    store: GraphStore,
    spark: SparkSession,
    feedback_text: str,
    gateway: MockLLMGateway | None = None,
    last_k: int = 1,
) -> dict:
    """U10 sentiment -> feedback node (in the UserQAFeedbacks node set) ->
    gives_feedback_to edges to the last-k interactions -> feedback_weight
    mutation on the graph elements those interactions used."""
    gateway = gateway or MockLLMGateway()
    score = gateway.sentiment(feedback_text)
    fid = py_content_id("feedback", feedback_text)
    ns_id = py_content_id("NodeSet", FEEDBACK_NODESET)

    nodes = spark.createDataFrame(
        [
            (fid, feedback_text[:80], FEEDBACK_TYPE, {"feedback": feedback_text, "score": str(score)}),
            (ns_id, FEEDBACK_NODESET, "NodeSet", {}),
        ],
        "id string, name string, type string, properties map<string,string>",
    )
    store.upsert_nodes(nodes, created_by="user_qa_feedback")

    interactions = [r["id"] for r in last_k_interactions(store, last_k).collect()]
    empty_props = F.create_map().cast("map<string,string>")
    edges = spark.createDataFrame([(fid, i) for i in interactions] + [(fid, ns_id)], ["src", "dst"]).select(
        "src",
        "dst",
        F.when(F.col("dst") == ns_id, F.lit("belongs_to")).otherwise(F.lit("gives_feedback_to")).alias(
            "relationship_name"
        ),
        empty_props.alias("properties"),
    )
    store.upsert_edges(edges, created_by="user_qa_feedback")

    # weight mutation targets: the graph elements the interactions used
    stored_edges = store.load("edges")
    used = (
        stored_edges.filter(
            (F.col("relationship_name") == "used_graph_element_to_answer") & F.col("src").isin(interactions)
        )
        .select("dst")
        .distinct()
        .collect()
    )
    element_ids = [r["dst"] for r in used]
    # mutate the used_graph_element_to_answer edges pointing AT those elements
    if element_ids:
        store.apply_feedback_weight(element_ids, score)
    return {"feedback_id": fid, "score": score, "interactions": interactions, "elements": element_ids}
