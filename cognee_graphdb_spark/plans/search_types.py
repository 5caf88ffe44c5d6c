"""The 16 search types (SURVEY.md §2.11) as composed Spark plans.

Reference dispatch: cognee/modules/search/methods/get_search_type_tools.py:42-165
and modules/retrieval/*.py — each retriever exposes get_context (retrieval only)
and get_completion (retrieval + LLM).  Here every retrieval is a DataFrame plan
over a :class:`GraphContext`; LLM steps go through the pluggable gateway.

Scale notes:
- every vector path is one scan of the unified ``embeddings`` DF with a
  collection filter (partition-prunable) + TakeOrderedAndProject top-k;
- INSIGHTS expands the (tiny, <= top_k) hit frontier against edges — the hit
  set broadcasts, edges never fully shuffle;
- CHUNKS_LEXICAL scores every chunk with a pure-expression Jaccard against the
  broadcast query-token array — no UDF, no driver loop;
- the CoT / context-extension loops are driver-side control flow where each
  round is ONE Spark job, mirroring the reference's bounded (<= 4) rounds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cognee_graphdb_spark.functions.vectors import cosine_distance, minmax_normalize
from cognee_graphdb_spark.llm.embedder import HashEmbedder
from cognee_graphdb_spark.llm.gateway import MockLLMGateway
from cognee_graphdb_spark.operators.graph_joins import k_hop, temporal_range_join
from cognee_graphdb_spark.plans.triplet_search import brute_force_triplet_search, render_triplets


@dataclass
class GraphContext:
    """Everything the search side needs; produced by cognify / migration /
    ingestion.  ``interactions`` backs the FEEDBACK loop (W4)."""

    nodes: DataFrame
    edges: DataFrame
    embeddings: DataFrame
    chunks: DataFrame | None = None
    interactions: DataFrame | None = None
    embed_dim: int = 64
    gateway: MockLLMGateway = field(default_factory=MockLLMGateway)

    def query_vector(self, text: str) -> list[float]:
        return HashEmbedder(self.embed_dim).embed(text)


# ---------------------------------------------------------------------------
# payload retrievers (CHUNKS / SUMMARIES / RAG_COMPLETION)
# ---------------------------------------------------------------------------


def _collection_topk(ctx: GraphContext, collection: str, query: str, k: int) -> DataFrame:
    qv = F.array(*[F.lit(float(x)) for x in ctx.query_vector(query)])
    scored = ctx.embeddings.filter(F.col("collection") == collection).select(
        "id", "text", cosine_distance(F.col("vector"), qv).alias("distance")
    )
    return scored.orderBy(F.col("distance").asc(), F.col("id").asc()).limit(k)


def search_chunks(ctx: GraphContext, query: str, k: int = 5) -> DataFrame:
    """CHUNKS — V1 over DocumentChunk_text, payloads back
    (chunks_retriever.py:30-62)."""
    return _collection_topk(ctx, "DocumentChunk_text", query, k)


def search_summaries(ctx: GraphContext, query: str, k: int = 5) -> DataFrame:
    """SUMMARIES — V1 over TextSummary_text (summaries_retriever.py:29-63)."""
    return _collection_topk(ctx, "TextSummary_text", query, k)


def rag_completion(ctx: GraphContext, query: str, k: int = 1) -> str:
    """RAG_COMPLETION — top-k chunk texts -> prompt -> completion
    (completion_retriever.py:35-99; default k=1)."""
    rows = search_chunks(ctx, query, k).collect()
    context = "\n".join(r["text"] or "" for r in rows)
    return ctx.gateway.complete(f"Answer {query!r} using:\n{context}")


# ---------------------------------------------------------------------------
# graph completion family
# ---------------------------------------------------------------------------


def graph_completion_context(
    ctx: GraphContext,
    query: str,
    k: int = 5,
    node_type: str | None = None,
    node_names: list[str] | None = None,
) -> DataFrame:
    """GRAPH_COMPLETION's retrieval half: scored triplets (J5/W1).

    ``node_type``/``node_names`` restrict scoring to the J4 nodeset subgraph
    first — the reference's subgraph projection strategy
    (CogneeGraph.project_graph_from_db:78-98, graph_completion_retriever
    node_type/node_name parameters)."""
    nodes, edges = ctx.nodes, ctx.edges
    if node_type is not None and node_names:
        from cognee_graphdb_spark.operators.graph_joins import nodeset_subgraph

        nodes, edges = nodeset_subgraph(nodes, edges, node_type, node_names)
    return brute_force_triplet_search(nodes, edges, ctx.embeddings, query, k=k, embed_dim=ctx.embed_dim)


def graph_completion(ctx: GraphContext, query: str, k: int = 5) -> str:
    """GRAPH_COMPLETION — triplets -> rendered context -> completion
    (graph_completion_retriever.py:131-171)."""
    context = render_triplets(graph_completion_context(ctx, query, k))
    return ctx.gateway.complete(f"Answer {query!r} using:\n{context}")


def graph_summary_completion(ctx: GraphContext, query: str, k: int = 5) -> str:
    """GRAPH_SUMMARY_COMPLETION — context is summarized before completing
    (graph_summary_completion_retriever.py:42-62)."""
    context = render_triplets(graph_completion_context(ctx, query, k))
    summary = ctx.gateway.extract_summary(context)
    return ctx.gateway.complete(f"Answer {query!r} using:\n{summary}")


def graph_completion_cot(ctx: GraphContext, query: str, k: int = 5, max_iter: int = 4) -> tuple[str, DataFrame]:
    """GRAPH_COMPLETION_COT (U7) — bounded refine loop: each round unions the
    follow-up question's triplets into the context
    (graph_completion_cot_retriever.py:57-142).  Returns (answer, triplets)."""
    triplets = graph_completion_context(ctx, query, k)
    followup = ""
    completion = ""
    for round_idx in range(max_iter + 1):
        if round_idx > 0:
            extra = graph_completion_context(ctx, followup, k)
            triplets = triplets.unionByName(extra).dropDuplicates(["src", "dst", "relationship_name"])
        context = render_triplets(triplets)
        completion = ctx.gateway.complete(f"Answer {query!r} using:\n{context}")
        if round_idx < max_iter:
            followup = ctx.gateway.followup_question(query, completion, context)
    return completion, triplets


def graph_completion_context_extension(
    ctx: GraphContext, query: str, k: int = 5, max_iter: int = 4
) -> tuple[str, DataFrame]:
    """GRAPH_COMPLETION_CONTEXT_EXTENSION (U8) — re-retrieve with the generated
    completion until the triplet set stops growing
    (graph_completion_context_extension_retriever.py:46-131)."""
    triplets = graph_completion_context(ctx, query, k)
    completion = ""
    prev_count = -1
    for _ in range(max_iter):
        count = triplets.count()
        context = render_triplets(triplets)
        completion = ctx.gateway.complete(f"Answer {query!r} using:\n{context}")
        if count == prev_count:
            break  # triplet fixpoint
        prev_count = count
        extra = graph_completion_context(ctx, completion, k)
        triplets = triplets.unionByName(extra).dropDuplicates(["src", "dst", "relationship_name"])
    return completion, triplets


# ---------------------------------------------------------------------------
# INSIGHTS
# ---------------------------------------------------------------------------


def insights(ctx: GraphContext, query: str, k: int = 5) -> DataFrame:
    """INSIGHTS — exact node match else Entity/EntityType vector hits with
    normalized score < 0.5, then connection triples per hit, deduped by
    (src, relationship, dst) (insights_retriever.py:33-110)."""
    exact = ctx.nodes.filter(F.col("id") == query).select("id")
    if exact.first() is not None:
        hits = exact
    else:
        qv = F.array(*[F.lit(float(x)) for x in ctx.query_vector(query)])
        scored = (
            ctx.embeddings.filter(F.col("collection").isin(["Entity_name", "EntityType_name"]))
            .select(
                "collection",
                "id",
                cosine_distance(F.col("vector"), qv).alias("distance"),
            )
            .withColumn("score", minmax_normalize("distance", partition_by=["collection"]))
        )
        hits = (
            scored.filter(F.col("score") < 0.5)
            .orderBy(F.col("score").asc(), F.col("id").asc())
            .limit(k)
            .select("id")
        )
    incident = ctx.edges.join(
        F.broadcast(hits.withColumnRenamed("id", "src")), "src", "leftsemi"
    ).unionByName(
        ctx.edges.join(F.broadcast(hits.withColumnRenamed("id", "dst")), "dst", "leftsemi")
    )
    n_src = ctx.nodes.select(F.col("id").alias("src"), F.col("name").alias("src_name"))
    n_dst = ctx.nodes.select(F.col("id").alias("dst"), F.col("name").alias("dst_name"))
    return (
        incident.join(n_src, "src")
        .join(n_dst, "dst")
        .select("src", "src_name", "relationship_name", "dst", "dst_name")
        .dropDuplicates(["src", "relationship_name", "dst"])
    )


# ---------------------------------------------------------------------------
# TEMPORAL
# ---------------------------------------------------------------------------


def temporal_context(ctx: GraphContext, query: str, k: int = 10) -> DataFrame:
    """TEMPORAL — U4 interval from the query -> J9 timestamp range join ->
    2-hop event expansion (J6) -> Event_name full-scan scores -> W3 sort with
    missing-score = +inf -> top-k (temporal_retriever.py:98-138).

    Timestamp nodes carry ``properties['time_at']``; events link via ``at`` /
    ``during`` edges.  Falls back to triplet search when no interval parses."""
    interval = ctx.gateway.extract_interval(query)
    # no interval parsed, or a graph without Timestamp properties at all ->
    # the reference's fallback: plain triplet search (temporal_retriever.py:108-128)
    if interval is None or "properties" not in ctx.nodes.columns:
        return graph_completion_context(ctx, query, k)
    time_from, time_to = interval
    timestamps = ctx.nodes.filter(F.col("type") == "Timestamp").select(
        "id", F.col("properties")["time_at"].cast("bigint").alias("time_at")
    )
    ts_edges = ctx.edges.filter(F.col("relationship_name").isin(["at", "during"]))
    event_ids = temporal_range_join(timestamps, ts_edges.withColumn("relationship_name", F.lit("at")), time_from, time_to)
    # 2-hop expansion, then keep Event nodes only (collect_events semantics)
    nearby = k_hop(ctx.edges, event_ids.select(F.col("event_id").alias("id")), k=2)
    events = ctx.nodes.filter(F.col("type") == "Event").join(nearby, "id", "leftsemi")
    qv = F.array(*[F.lit(float(x)) for x in ctx.query_vector(query)])
    scores = ctx.embeddings.filter(F.col("collection") == "Event_name").select(
        "id", cosine_distance(F.col("vector"), qv).alias("score")
    )
    return (
        events.join(scores, "id", "left")
        .select("id", "name", F.coalesce(F.col("score"), F.lit(float("inf"))).alias("score"))
        .orderBy(F.col("score").asc(), F.col("id").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# CHUNKS_LEXICAL
# ---------------------------------------------------------------------------


def lexical_chunks(
    ctx: GraphContext,
    query: str,
    k: int = 10,
    multiset: bool = False,
    text_col: str = "text",
    id_col: str = "chunk_id",
) -> DataFrame:
    """CHUNKS_LEXICAL — Jaccard(query tokens, chunk tokens), top-k largest
    (lexical_retriever.py:34-117 + jaccard_retrival.py:45-60).

    Tokenizer contract: ``\\w+`` on the lowercased text (no stopword filter by
    default, as the reference).  Set vs multiset Jaccard both supported; the
    query token array is a broadcast literal, scoring is pure expressions."""
    import re as _re

    chunks = ctx.chunks if ctx.chunks is not None else ctx.embeddings.filter(
        F.col("collection") == "DocumentChunk_text"
    ).select(F.col("id").alias(id_col), F.col("text"))
    q_tokens = _re.findall(r"\w+", query.lower())
    if not q_tokens:
        return chunks.select(id_col, text_col).limit(0).withColumn("score", F.lit(0.0))
    toks = F.split(F.lower(F.col(text_col)), r"[^0-9a-zA-Z_]+")
    toks = F.filter(toks, lambda t: t != "")
    if multiset:
        q = F.array(*[F.lit(t) for t in q_tokens])
        both = F.array_distinct(F.concat(F.array_distinct(toks), F.array_distinct(q)))
        inter = F.aggregate(
            both,
            F.lit(0),
            lambda acc, t: acc
            + F.least(F.size(F.filter(q, lambda x: x == t)), F.size(F.filter(toks, lambda x: x == t))),
        )
        union = F.aggregate(
            both,
            F.lit(0),
            lambda acc, t: acc
            + F.greatest(F.size(F.filter(q, lambda x: x == t)), F.size(F.filter(toks, lambda x: x == t))),
        )
        score = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    else:
        q_set = F.array(*[F.lit(t) for t in sorted(set(q_tokens))])
        tok_set = F.array_distinct(toks)
        inter = F.size(F.array_intersect(tok_set, q_set))
        union = F.size(F.array_union(tok_set, q_set))
        score = F.when(
            (F.size(tok_set) == 0) | (F.size(q_set) == 0), F.lit(0.0)
        ).otherwise(inter.cast("double") / union)
    return (
        chunks.select(id_col, text_col, score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# CYPHER / NATURAL_LANGUAGE (Spark SQL passthrough)
# ---------------------------------------------------------------------------


def cypher_search(
    spark: SparkSession, ctx: GraphContext, raw_query: str, params: dict | None = None
) -> DataFrame:
    """CYPHER — graph-query surface (cypher_search_retriever.py:29-51).

    Real Cypher strings in the reference's supported shape (MATCH /
    OPTIONAL MATCH / WHERE / RETURN / ORDER BY / LIMIT, see plans/cypher.py)
    are translated to one Spark SQL statement over the ``nodes``/``edges``
    views; ``CALL gds.*`` / ``CALL db.*`` procedure queries — the
    reference's metric and projection-management surface
    (neo4j_metrics_utils.py, neo4j_driver/adapter.py:1100-1198) — dispatch
    to the engine's native operators through run_cypher; anything else —
    including full Spark SQL, our native dialect — runs as-is.  A MATCH
    query that trips the translator's subset limits raises, mirroring the
    reference's CypherSearchError on bad queries."""
    from cognee_graphdb_spark.plans.cypher import looks_like_cypher, run_cypher

    if looks_like_cypher(raw_query):
        return run_cypher(spark, ctx.nodes, ctx.edges, raw_query, params)
    ctx.nodes.createOrReplaceTempView("nodes")
    edges = ctx.edges
    if "properties" not in edges.columns:
        # edge property reads (r.weight) compile to properties['key']
        edges = edges.withColumn("properties", F.create_map().cast("map<string,string>"))
    edges.createOrReplaceTempView("edges")
    return spark.sql(raw_query)


def natural_language_search(spark: SparkSession, ctx: GraphContext, question: str, max_attempts: int = 3) -> DataFrame:
    """NATURAL_LANGUAGE — A6 schema introspection -> U5 NL->SQL -> execute,
    retrying with accumulated error feedback <= 3 times
    (natural_language_retriever.py:25-126)."""
    from cognee_graphdb_spark.operators.aggregations import distinct_schema

    schema = [(r["kind"], r["value"]) for r in distinct_schema(ctx.nodes, ctx.edges).collect()]
    previous = ""
    last_error: Exception | None = None
    for _ in range(max_attempts):
        sql = ctx.gateway.nl_to_sql(question, schema, previous)
        try:
            out = cypher_search(spark, ctx, sql)
            if out.first() is not None:
                return out
            previous += f"Query: {sql} -> Result: None\n"
        except Exception as e:  # noqa: BLE001 — feed the error back, as the reference does
            previous += f"Query: {sql} -> Executed with error: {e}\n"
            last_error = e
    if last_error is not None:
        raise last_error
    return cypher_search(spark, ctx, "SELECT id, name, type FROM nodes LIMIT 0")


# ---------------------------------------------------------------------------
# CODE / CODING_RULES / FEELING_LUCKY
# ---------------------------------------------------------------------------


def code_search(ctx: GraphContext, query: str, k: int = 5) -> DataFrame:
    """CODE — U11 parse into filenames + content terms, then vector search over
    the code collections (code_retriever.py:39-214)."""
    files, terms = ctx.gateway.parse_code_query(query)
    by_name = ctx.embeddings.filter(
        (F.col("collection") == "CodeFile_name") & F.col("text").isin(files)
    ).select("id", "text", F.lit(0.0).alias("distance"))
    term_query = " ".join(terms) if terms else query
    qv = F.array(*[F.lit(float(x)) for x in ctx.query_vector(term_query)])
    by_content = (
        ctx.embeddings.filter(
            F.col("collection").isin(["FunctionDefinition_source_code", "ClassDefinition_source_code"])
        )
        .select("id", "text", cosine_distance(F.col("vector"), qv).alias("distance"))
        .orderBy(F.col("distance").asc(), F.col("id").asc())
        .limit(k)
    )
    return by_name.unionByName(by_content).dropDuplicates(["id"])


def coding_rules(ctx: GraphContext, nodeset_name: str = "coding_agent_rules") -> DataFrame:
    """CODING_RULES — rules scoped to a NodeSet (coding_rules_retriever.py):
    CodingRule nodes joined through belongs_to -> NodeSet(name)."""
    sets = ctx.nodes.filter((F.col("type") == "NodeSet") & (F.col("name") == nodeset_name)).select("id")
    members = (
        ctx.edges.filter(F.col("relationship_name") == "belongs_to")
        .join(F.broadcast(sets.withColumnRenamed("id", "dst")), "dst", "leftsemi")
        .select(F.col("src").alias("id"))
    )
    return ctx.nodes.filter(F.col("type") == "CodingRule").join(members, "id", "leftsemi").select("id", "name")


def feeling_lucky(spark: SparkSession, ctx: GraphContext, query: str):
    """FEELING_LUCKY — U9 picks the search type, then dispatches
    (select_search_type.py:9-42; default RAG_COMPLETION)."""
    chosen = ctx.gateway.select_search_type(query)
    dispatch = {
        "TEMPORAL": lambda: temporal_context(ctx, query),
        "SUMMARIES": lambda: search_summaries(ctx, query),
        "INSIGHTS": lambda: insights(ctx, query),
        "RAG_COMPLETION": lambda: rag_completion(ctx, query),
    }
    return chosen, dispatch[chosen]()
