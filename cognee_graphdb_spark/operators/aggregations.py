"""Aggregation operators (SURVEY.md §2.5 A1-A8).

All are single groupBy/agg plans — Catalyst produces partial (map-side)
aggregation automatically, so these scale linearly with no special handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.functions.text import STOP_WORDS, tokenize


def edge_type_frequency(edges: DataFrame) -> DataFrame:
    """A1 — relationship_name -> count, the EdgeType index.

    Reference: index_graph_edges.py:43-55 (Counter over all edges).
    """
    return edges.groupBy("relationship_name").agg(F.count(F.lit(1)).alias("number_of_edges"))


def node_degrees(edges: DataFrame) -> DataFrame:
    """A3 — per-node undirected degree (self-loops count twice, standard)."""
    ends = edges.select(F.col("src").alias("id")).unionByName(edges.select(F.col("dst").alias("id")))
    # the union doubles the input's partition count; cap the map side so the
    # partial agg isn't task-launch-bound on many-branch cached inputs
    cap = 2 * edges.sparkSession.sparkContext.defaultParallelism
    if ends.rdd.getNumPartitions() > cap:
        ends = ends.coalesce(cap)
    return ends.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))


def degree_one_nodes(nodes: DataFrame, edges: DataFrame, node_type: str | None = None) -> DataFrame:
    """A3 — nodes of a type with degree exactly 1 (kuzu adapter.py:1670-1700)."""
    deg = node_degrees(edges).filter(F.col("degree") == 1)
    out = nodes.join(deg, "id", "leftsemi")
    if node_type is not None:
        out = out.filter(F.col("type") == node_type)
    return out.select("id", "name", "type")


def disconnected_nodes(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A4 — nodes with no incident edge (kuzu adapter.py:1485-1506). left_anti."""
    ends = edges.select(F.col("src").alias("id")).unionByName(edges.select(F.col("dst").alias("id"))).distinct()
    return nodes.join(ends, "id", "left_anti").select("id", "name", "type")


def top_n_words(df: DataFrame, text_col: str = "text", n: int = 10) -> DataFrame:
    """A5 — most frequent non-stopword tokens across a corpus.

    Reference: resolve_edges_to_text.py:22-45 (Counter.most_common over node
    titles, minus retrieval/utils/stop_words.py).
    explode → filter → groupBy.count → top-n (TakeOrderedAndProject).
    """
    toks = df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
    return (
        toks.filter(~F.col("word").isin(list(STOP_WORDS)))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(n)
    )


def distinct_schema(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A6 — model-independent schema: distinct node types + distinct rel names.

    Reference: kuzu get_model_independent_graph_data adapter.py:1508-1528;
    natural_language_retriever.py:33-49 uses it to prompt NL->query.
    """
    t = nodes.select(F.lit("node_type").alias("kind"), F.col("type").alias("value")).distinct()
    r = edges.select(F.lit("relationship").alias("kind"), F.col("relationship_name").alias("value")).distinct()
    return t.unionByName(r)


def dedup_nodes(nodes: DataFrame) -> DataFrame:
    """A8 — first-wins dedup by node id (deduplicate_nodes_and_edges.py:4-20)."""
    return nodes.dropDuplicates(["id"])


def dedup_edges(edges: DataFrame) -> DataFrame:
    """A8 — dedup by (src, relationship_name, dst)."""
    return edges.dropDuplicates(["src", "relationship_name", "dst"])


def multiset_intersect_size(a, b):
    """|A ∩ B| as MULTISETS: sum over distinct tokens of least(count_a, count_b).

    Pure expression (stays in codegen): for QA-length token arrays the O(d·n)
    scan per row beats an explode+groupBy shuffle.  DuckDB restates it with
    list_transform/list_filter/list_sum.
    """
    return F.aggregate(
        F.array_distinct(a),
        F.lit(0),
        lambda acc, t: acc
        + F.least(
            F.size(F.filter(a, lambda x: x == t)),
            F.size(F.filter(b, lambda x: x == t)),
        ),
    )


def token_overlap_f1(pred_tokens, gold_tokens):
    """A7 — QA token-F1 as expressions over two token-array columns.

    Reference: eval_framework/evaluation/metrics/f1.py:12-46 — Counter
    min-overlap tp (MULTISET: repeated tokens count), precision = tp/|pred|,
    recall = tp/|gold|.  Both-empty ⇒ F1 = 1.0 (f1.py:28-31).
    Returns (precision, recall, f1) columns given token arrays.
    """
    inter = multiset_intersect_size(pred_tokens, gold_tokens).cast("double")
    p = F.when(F.size(pred_tokens) > 0, inter / F.size(pred_tokens)).otherwise(F.lit(0.0))
    r = F.when(F.size(gold_tokens) > 0, inter / F.size(gold_tokens)).otherwise(F.lit(0.0))
    f1 = F.when(
        (F.size(pred_tokens) == 0) & (F.size(gold_tokens) == 0), F.lit(1.0)
    ).otherwise(F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0)))
    return p, r, f1
