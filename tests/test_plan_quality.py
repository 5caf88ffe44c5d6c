"""Physical-plan regression tests — the scale claims in SCALE.md, pinned.

These assert on ``explain`` output, not timings: the properties that make the
engine survive 100 TB (bucketed joins shuffle-free, dataset partition pruning,
single-pass top-k, filter pushdown) are visible in the plan at ANY data size,
so they are testable at test scale without flakiness.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.sources.bucketed import (
    resolve_src,
    resolve_triples,
    write_bucketed_graph,
)
from cognee_graphdb_spark.sources.sinks import GraphStore


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@contextlib.contextmanager
def sql_conf(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


@pytest.fixture(scope="module")
def toy_graph(spark):
    nodes = spark.createDataFrame(
        [(f"n{i}", f"name{i}", "Entity") for i in range(100)], ["id", "name", "type"]
    )
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7) % 100}", "rel") for i in range(100)],
        ["src", "dst", "relationship_name"],
    )
    return nodes, edges


def test_bucketed_src_join_has_no_exchange(spark, toy_graph, tmp_path_factory):
    """Both sides bucketed on the join key => SortMergeJoin without ANY
    Exchange (the co-location claim in SCALE.md / sources/bucketed.py)."""
    nodes, edges = toy_graph
    loc = str(tmp_path_factory.mktemp("bucketed_db"))
    write_bucketed_graph(nodes, edges, database="pq_test", buckets=4, location=loc)
    # force SMJ: tiny tables would otherwise broadcast (which also avoids a
    # shuffle, but then the test would not be exercising bucket co-location)
    with sql_conf(spark, spark__sql__autoBroadcastJoinThreshold="-1"):
        plan = plan_of(resolve_src(spark, "pq_test"))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert resolve_src(spark, "pq_test").count() == 100

        # full triple resolution: exactly ONE Exchange (the src-joined stream
        # re-keyed by dst); the bucketed nodes side still reads in place
        plan3 = plan_of(resolve_triples(spark, "pq_test"))
        # formatted mode lists each operator twice (tree + detail); count the
        # tree lines only
        assert plan3.count("+- Exchange") == 1, plan3
        assert resolve_triples(spark, "pq_test").count() == 100


def test_store_scan_prunes_dataset_partitions(spark, toy_graph, tmp_path):
    """GraphStore partitions by dataset_id; a dataset-scoped read must show a
    partition filter (multi-tenant scoping = pruning, not post-filter)."""
    nodes, _ = toy_graph
    store = GraphStore(spark, str(tmp_path / "store"))
    two = nodes.withColumn(
        "dataset_id", F.when(F.col("id") < "n5", "ds_a").otherwise("ds_b")
    )
    store.upsert_nodes(two)
    scan = store.load("nodes").filter(F.col("dataset_id") == "ds_a")
    plan = plan_of(scan)
    assert "PartitionFilters" in plan
    # the dataset predicate must appear in the partition filters, not (only)
    # as a post-scan Filter
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("dataset_id" in ln for ln in pf), plan


def test_knn_topk_is_take_ordered_not_global_sort(spark):
    """V1 k-NN must plan as TakeOrderedAndProject (per-partition partial
    top-k + driver merge), never a full Sort + Limit."""
    from cognee_graphdb_spark.operators.vector_search import knn

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(50)], ["vec_id", "embedding"]
    )
    df = knn(emb, [1.0, 0.0, 0.0], k=5, vector_col="embedding", id_cols=("vec_id",))
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_stored_point_lookup_pushes_filter_to_scan(spark, toy_graph, tmp_path):
    """P-family point filters must reach the parquet reader (PushedFilters),
    not run as a residual filter over a full scan."""
    nodes, _ = toy_graph
    store = GraphStore(spark, str(tmp_path / "store2"))
    store.upsert_nodes(nodes)
    scan = store.load("nodes").filter(F.col("id") == "n7")
    plan = plan_of(scan)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("id" in ln and "n7" in ln for ln in pushed), plan


def test_triplet_search_has_no_cartesian_product(spark, toy_graph):
    """J5 scoring joins must never degenerate into a cross join."""
    from cognee_graphdb_spark.operators.graph_joins import triplet_score_join

    _, edges = toy_graph
    scores = spark.createDataFrame(
        [(f"n{i}", float(i) / 100) for i in range(100)], ["id", "score"]
    )
    plan = plan_of(triplet_score_join(edges, scores, k=5))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_regex_entities_stays_jvm_side(spark):
    """The regex entity scan must compile to pure Catalyst expressions —
    no Python worker (BatchEvalPython / MapInPandas) in the plan."""
    from cognee_graphdb_spark.operators.entity_extraction import regex_entities

    docs = spark.createDataFrame([(1, "mail me at a@b.co")], ["doc_id", "text"])
    plan = plan_of(regex_entities(docs))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_fan_out_is_conditional(spark):
    """fan_out widens narrow inputs to cluster parallelism and must be a
    no-op (no added Exchange) when the input is already wide."""
    from cognee_graphdb_spark.session import fan_out

    par = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame([(i,) for i in range(10)], ["x"]).coalesce(1)
    assert fan_out(narrow).rdd.getNumPartitions() == par
    wide = spark.range(1000).repartition(par * 2)
    assert fan_out(wide) is wide


def test_decontaminate_filters_before_any_train_shuffle(spark):
    """The eval n-gram set joins the train stream BEFORE any train-side
    aggregation: the broadcast-join filter must appear BELOW the (doc_id)
    aggregate exchange, so the only shuffled rows are contaminated pairs."""
    from cognee_graphdb_spark.operators.training_data import ngram_decontaminate

    train = spark.createDataFrame(
        [(i, "some words here repeated for shingles " * 3) for i in range(50)],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(1, "benchmark eval text sample")], ["doc_id", "text"])
    plan = plan_of(ngram_decontaminate(train, ev, n=5), mode="simple")
    # the train side must never shuffle for the join itself
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan
    # hash-partition exchanges: the tiny eval-side distinct, plus the
    # count_distinct's two phases over the already-filtered survivor rows —
    # a dedup of the full train n-gram stream below the join would add a 4th,
    # and the train side reaches the join straight from its scan
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    left = plan.split("BroadcastHashJoin")[1].split("BroadcastExchange")[0]
    assert "Exchange" not in left, plan  # train side: scan -> explode -> join


def test_unigram_scoring_aggregates_tokens_before_the_join(spark):
    """The doc-token stream is count-aggregated (map-side partial) BEFORE
    joining the LM — the join never sees raw token instances — and no
    cartesian sneaks in.  (The LM side's broadcast is AQE's runtime call:
    an untruncated vocab can be legitimately large, so the code does not
    static-hint it.)"""
    from cognee_graphdb_spark.operators.training_data import unigram_lm, unigram_logprob

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(50)], ["doc_id", "text"]
    )
    plan = plan_of(unigram_logprob(docs, unigram_lm(docs)))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # map-side combine on (doc_id, token)


def test_gopher_filter_is_single_stage_projection(spark):
    """The quality-rules filter is pure whole-stage-codegen projection:
    zero exchanges, zero Python evals — scan speed at any corpus size."""
    from cognee_graphdb_spark.operators.training_data import gopher_quality_filter

    docs = spark.createDataFrame([(1, "text " * 60)], ["doc_id", "text"])
    plan = plan_of(gopher_quality_filter(docs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weighted_sample_is_map_only(spark):
    """Per-row-probability sampling is a filter in the scan stage — no
    shuffle, no RNG state."""
    from cognee_graphdb_spark.operators.training_data import weighted_sample

    docs = spark.createDataFrame([(1, 0.5)], ["doc_id", "w"])
    plan = plan_of(weighted_sample(docs, "w"))
    assert "Exchange" not in plan


def test_deterministic_shuffle_single_exchange(spark):
    """Shard+order assignment costs exactly one hash-partition exchange (the
    window's), which doubles as the sharded writer's layout."""
    from cognee_graphdb_spark.operators.training_data import deterministic_shuffle

    docs = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
    plan = plan_of(deterministic_shuffle(docs, n_shards=8), mode="simple")
    assert plan.count("Exchange") == 1, plan


def test_c4_line_filter_is_single_stage_projection(spark):
    """Line cleaning is higher-order-function expressions in one codegen
    stage — zero exchanges, zero Python evals."""
    from cognee_graphdb_spark.operators.training_data import c4_line_filter

    docs = spark.createDataFrame([(1, "A sentence that is long enough here.")], ["doc_id", "text"])
    plan = plan_of(c4_line_filter(docs), mode="simple")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_cypher_translation_plans_equi_joins_with_pushdown(spark, toy_graph, tmp_path):
    """Translated MATCH patterns emit declarative cross-join + equality
    predicates; Catalyst must turn them into equi-joins (no
    CartesianProduct) and push the label filter into the parquet scan."""
    nodes, edges = toy_graph
    nd = str(tmp_path / "nodes")
    ed = str(tmp_path / "edges")
    nodes.write.parquet(nd)
    edges.write.parquet(ed)
    from cognee_graphdb_spark.plans.cypher import run_cypher

    out = run_cypher(
        spark,
        spark.read.parquet(nd),
        spark.read.parquet(ed),
        "MATCH (a:Entity)-[r:rel]->(b) RETURN a.id AS src_id, b.id AS dst_id",
    )
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [IsNotNull(type), EqualTo(type,Entity)" in plan or "EqualTo(type,Entity)" in plan


def test_cypher_varlength_is_union_of_joins(spark, toy_graph):
    """[*1..2] must plan as a UNION of equi-join chains, not a cartesian."""
    nodes, edges = toy_graph
    from cognee_graphdb_spark.plans.cypher import run_cypher

    out = run_cypher(
        spark, nodes, edges, "MATCH (a)-[*1..2]->(b) RETURN a.id AS s, b.id AS t"
    )
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "Union" in plan


def test_media_info_is_single_stage_map_only(spark):
    """media_info is one Arrow-batched mapInPandas projection: no Exchange,
    no join — at 100 TB the sniff pass costs exactly one scan."""
    from cognee_graphdb_spark.operators.multimodal import media_info

    media = spark.createDataFrame([("a", b"\x00")], "media_id string, content binary")
    plan = plan_of(media_info(media))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_embed_knn_is_scan_udf_take_ordered(spark):
    """The V5+V1 chain (embed every row, top-k by cosine) compiles to scan ->
    pandas UDF -> TakeOrderedAndProject: one pass, no global sort, no join."""
    from cognee_graphdb_spark.llm.embedder import HashEmbedder, embed_column
    from cognee_graphdb_spark.operators.vector_search import knn

    docs = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    emb = docs.select("doc_id", embed_column("text", 16).alias("vector"))
    plan = plan_of(knn(emb, HashEmbedder(16).embed("alpha"), k=5, id_cols=("doc_id",)))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", ""), plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_random_walks_steps_are_equi_joins(spark, toy_graph):
    """Every walk step must plan as hash equi-joins on the 8-byte node
    hash — no cartesian/nested-loop fallback — and the neighbor-pick hash
    must stay JVM-side (no Python worker)."""
    from cognee_graphdb_spark.operators.graph_metrics import random_walks

    _, edges = toy_graph
    plan = plan_of(random_walks(edges, walk_length=3, num_walks=2))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_term_cooccurrence_pair_join_is_banded_equi_join(spark):
    """The pair stage must join on doc_id (equi) with the window as a band
    FILTER, never a cross join; all expressions stay JVM-side."""
    from cognee_graphdb_spark.operators.text_analysis import term_cooccurrence

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(50)], ["doc_id", "text"]
    )
    plan = plan_of(term_cooccurrence(docs, window=3, min_pair_count=1))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_shortest_path_and_betweenness_plans_stay_jvm_side(spark, toy_graph):
    """BFS hops and Brandes levels must plan as hash equi-joins with no
    cartesian fallback and no Python worker; the ordered reductions are
    higher-order Catalyst expressions, not UDFs."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        betweenness_sampled,
        shortest_path_counts,
    )

    _, edges = toy_graph
    srcs = spark.createDataFrame([("n0",), ("n1",)], ["id"])
    for df in (
        shortest_path_counts(edges, srcs, max_hops=3),
        betweenness_sampled(edges, srcs, max_hops=3),
    ):
        plan = plan_of(df)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_node2vec_steps_are_equi_joins(spark, toy_graph):
    """The biased steps add a (prev, candidate) triangle-flag join and a
    window pass — still hash equi-joins, no cartesian, no Python worker."""
    from cognee_graphdb_spark.operators.graph_metrics import node2vec_walks

    _, edges = toy_graph
    plan = plan_of(node2vec_walks(edges, walk_length=3, num_walks=1, p=2.0, q=0.5))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_pq_encode_is_map_only_single_scan(spark):
    """PQ encoding must plan as ONE scan + projections: zero exchanges, no
    Python worker — the property that lets a 100 TB corpus encode as a
    map-only pass and write partitioned like any other column.  The staged
    unit-view/slice projections must survive (CollapseProject would
    re-evaluate the norm fold per candidate — the 40x regression this pins)."""
    from cognee_graphdb_spark.operators.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_codebooks(emb, m_sub=8, k_codes=4)
    plan = plan_of(pq_encode(emb, books))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_pq_topk_is_take_ordered_not_global_sort(spark):
    """Both the ADC shortlist and the final top-k must plan as
    TakeOrderedAndProject (per-partition heaps + driver merge), never a
    global Sort."""
    from cognee_graphdb_spark.operators.similarity import pq_codebooks, pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_codebooks(emb, m_sub=8, k_codes=4)
    plan = plan_of(pq_topk(emb, [0.1] * 64, k=5, rerank=20, codebooks=books))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", ""), plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_pq_topk_shortlist_excludes_vectors(spark):
    """The ADC shortlist heap must carry (id, adc) only — the full-precision
    vector joins back AFTER the rerank cut.  Pinned on the
    TakeOrderedAndProject output list: if the vector column reappears there,
    every scanned row ships float32[d] through the shortlist again."""
    import re

    from cognee_graphdb_spark.operators.similarity import pq_codebooks, pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_codebooks(emb, m_sub=8, k_codes=4)
    plan = plan_of(pq_topk(emb, [0.1] * 64, k=5, rerank=20, codebooks=books))
    # the first (shortlist) TakeOrderedAndProject orders by adc; its detail
    # block must not project the embedding column
    blocks = re.findall(r"\(\d+\) TakeOrderedAndProject[^(]*", plan)
    adc_blocks = [b for b in blocks if "adc" in b]
    assert adc_blocks, plan
    assert all("embedding" not in b for b in adc_blocks), plan


def test_pq_batch_topk_persisted_scan_is_codes_only(spark, tmp_path):
    """On a persisted PQ index the batch ADC scan must be column-pruned to
    (id, pq_codes): the parquet ReadSchema that includes pq_codes must NOT
    include the vector column — that is the whole point of materializing
    codes next to vectors (save_pq_index); only the rerank join-back scan
    reads vectors.  This pins the r9 defect (full vectors shipped through
    the per-query ranking window) closed."""
    import re

    from cognee_graphdb_spark.operators.similarity import (
        load_pq_index,
        pq_batch_topk,
        pq_codebooks,
        pq_encode,
        save_pq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_codebooks(emb, m_sub=8, k_codes=4)
    save_pq_index(pq_encode(emb, books), books, str(tmp_path / "pq"))
    idx = load_pq_index(spark, str(tmp_path / "pq"))
    queries = emb.limit(2).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    plan = plan_of(pq_batch_topk(queries, idx, k=3, rerank=10))
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    codes_scans = [s for s in schemas if "pq_codes" in s]
    assert codes_scans, plan  # the ADC side reads the persisted codes
    assert all("embedding" not in s for s in codes_scans), plan
    # and the vector side is a separate, codes-free pruned scan
    assert any("embedding" in s and "pq_codes" not in s for s in schemas), plan


def test_weighted_sssp_rounds_are_equi_joins(spark, toy_graph):
    """Each relaxation round must plan as a hash equi-join (frontier ⋈ edges
    on the node key) + partial-agg min — no cartesian, no Python worker."""
    from cognee_graphdb_spark.operators.paths import weighted_sssp

    _, edges = toy_graph
    e = edges.withColumn("weight", F.lit(1))
    srcs = spark.createDataFrame([("n0",)], ["id"])
    plan = plan_of(weighted_sssp(e, srcs, max_hops=2))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_sppmi_matmul_is_equi_join_with_broadcast_total(spark):
    """The SPPMI matrix must plan with the corpus total as a 1-row BROADCAST
    (never a shuffle join against it) and the power-iteration matmul as a
    hash equi-join on the contraction key; everything JVM-side."""
    from cognee_graphdb_spark.operators.node_embeddings import sppmi_matrix

    pairs = spark.createDataFrame(
        [("a", "b", 2), ("b", "a", 2), ("b", "c", 1)],
        "center string, context string, n_pairs long",
    )
    plan = plan_of(sppmi_matrix(pairs))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_ivf_pq_batch_probed_scan_is_codes_only(spark, tmp_path):
    """The batch IVF_PQ candidate scan must read (list_id, id, pq_codes)
    and never the vector column — same codes-only discipline as
    pq_batch_topk, applied under list pruning."""
    import re

    from cognee_graphdb_spark.operators.similarity import (
        ivf_index,
        ivf_pq_batch_topk,
        load_ivf_pq_index,
        pq_codebooks,
        pq_encode,
        save_ivf_pq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, centroids = ivf_index(emb, n_lists=4)
    books = pq_codebooks(emb, m_sub=8, k_codes=4)
    save_ivf_pq_index(pq_encode(assigned, books), centroids, books, str(tmp_path / "ivfpq"))
    idx = load_ivf_pq_index(spark, str(tmp_path / "ivfpq"))
    queries = emb.limit(2).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    plan = plan_of(ivf_pq_batch_topk(queries, idx, k=3, nprobe=2, rerank=10))
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    codes_scans = [s for s in schemas if "pq_codes" in s]
    assert codes_scans, plan
    assert all("embedding" not in s for s in codes_scans), plan
    assert any("embedding" in s and "pq_codes" not in s for s in schemas), plan


def test_louvain_rounds_are_equi_joins(spark, toy_graph):
    """Every louvain local-move round must plan as hash equi-joins (label
    lookups on the node key) + partial aggs, with T as a broadcast — no
    cartesian product, no Python worker, across both levels including the
    contraction."""
    from cognee_graphdb_spark.operators.graph_metrics import louvain

    nodes, edges = toy_graph
    plan = plan_of(louvain(nodes, edges, n_levels=2, n_rounds=2))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_leiden_rounds_and_refinement_are_equi_joins(spark, toy_graph):
    """Leiden's local moves, min-label refinement rounds, seeded aggregate
    level and contraction must all plan as hash equi-joins + partial aggs —
    no cartesian product, no Python worker (graph_metrics.py:leiden)."""
    from cognee_graphdb_spark.operators.graph_metrics import leiden

    nodes, edges = toy_graph
    plan = plan_of(leiden(nodes, edges, n_levels=2, n_rounds=2, refine_rounds=3))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_hits_half_steps_are_equi_joins(spark, toy_graph):
    """Each HITS half-step is one edge-vs-scores equi-join + a partial-agg
    sum, the L1 total a broadcast 1-row join — no cartesian product, no
    Python worker (graph_metrics.py:hits; the per-round totals live behind
    the periodic localCheckpoint, so the pin reads the output-side plan)."""
    from cognee_graphdb_spark.operators.graph_metrics import hits

    nodes, edges = toy_graph
    plan = plan_of(hits(nodes, edges, n_iter=2))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_eigenvector_and_articlerank_rounds_are_equi_joins(spark, toy_graph):
    """Eigenvector's round is one edge-vs-scores equi-join + a partial-agg
    sum with a 1-row broadcast L1 total (hits's authority half-step);
    articleRank's is one PRE-WEIGHTED-edge equi-join + partial agg with no
    per-round total at all — no cartesian product, no Python worker in
    either (graph_metrics.py:eigenvector/articlerank)."""
    from cognee_graphdb_spark.operators.graph_metrics import articlerank, eigenvector

    nodes, edges = toy_graph
    for out in (
        eigenvector(nodes, edges, n_iter=2),
        articlerank(nodes, edges, n_iter=2),
    ):
        plan = plan_of(out)
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_spanning_forest_rounds_are_joins_and_partial_aggs(spark, toy_graph):
    """Each Borůvka round is two label-lookup equi-joins + one map-side
    min_by partial aggregation + the alternating-star collapse — no
    cartesian product, no Python worker, no per-component sort window
    (operators/spanning.py:minimum_spanning_forest)."""
    from cognee_graphdb_spark.operators.spanning import minimum_spanning_forest

    _, edges = toy_graph
    out = minimum_spanning_forest(
        edges.select("src", "dst", F.lit(1.0).alias("weight"))
    )
    plan = plan_of(out)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_topological_layers_rounds_are_anti_joins(spark, toy_graph):
    """Each Kahn-peel round is one left_anti join (survivors minus edge
    targets) + one left_anti edge restriction on 8-byte keys — no cartesian
    product, no Python worker (operators/dag.py:topological_layers; the toy
    graph is cyclic, so the pin peels a generated DAG instead)."""
    from cognee_graphdb_spark.operators.dag import topological_layers

    nodes = spark.range(16).selectExpr("cast(id as string) AS id")
    edges = spark.range(15).selectExpr(
        "cast(id as string) AS src",
        "cast(id + 1 as string) AS dst",
        "'r' AS relationship_name",
    ).filter("id % 4 != 3")  # four 4-chains: depth 3, four peel rounds
    plan = plan_of(topological_layers(nodes, edges))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_dbscan_bucketed_mode_has_no_cartesian(spark):
    """At lsh_bits > 0 the ε-pair generation is a bucket equi-join (the
    documented scale path); cores/clusters/borders are joins + partial aggs
    — no cartesian product, no Python worker anywhere
    (operators/clustering.py:dbscan; lsh_bits = 0 is the documented exact
    small-data mode and IS a blocked cross join by design)."""
    from cognee_graphdb_spark.operators.clustering import dbscan

    emb = spark.range(64).selectExpr(
        "cast(id as string) AS vec_id",
        "array(cast(id % 7 as double), cast(id % 5 as double), 1.0d, 0.5d) AS embedding",
    )
    plan = plan_of(dbscan(emb, threshold=0.9, min_pts=3, lsh_bits=4, dim=4))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_cluster_balanced_sample_window_is_prefiltered(spark):
    """The diversity sampler's per-cluster window may only ever see the
    margin-bounded candidate union, never the raw frame, and noise rows
    bypass the window entirely (training_data.py:cluster_balanced_sample,
    r11 VERDICT #4): exactly ONE Window over the filtered+union branch, no
    cartesian product, no Python worker."""
    from cognee_graphdb_spark.operators.training_data import cluster_balanced_sample

    df = spark.createDataFrame(
        [(f"d{i}", "c") for i in range(8)] + [("n0", None)],
        "doc_id string, cluster string",
    )
    plan = plan_of(cluster_balanced_sample(df, cap=2), mode="simple")
    # exactly one Window node ("+- Window [" — Spark 4 also plans a
    # WindowGroupLimit, the rank-limit pushdown that bounds the sort)
    assert plan.count("+- Window [") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan
    # the window's input is the candidate union: both the quantile-cut
    # branch and the short-label fallback feed it, so the plan carries a
    # Union below the Window
    assert "Union" in plan, plan


def test_kmeans_assignment_is_map_only(spark):
    """The spherical k-means assignment plans as a MAP-ONLY projection
    against the k·d centroid literals (r13 — the centroids are driver
    state, the way the PQ codebooks are): no join of ANY kind, no
    exchange, no Python worker
    (operators/clustering.py:kmeans / dedup.py:_spherical_kmeans)."""
    from cognee_graphdb_spark.operators.clustering import kmeans

    emb = spark.range(32).selectExpr(
        "cast(id as string) AS vec_id",
        "array(cast(id % 7 as double), cast(id % 5 as double), 1.0d) AS embedding",
    )
    plan = plan_of(kmeans(emb, k=4, n_iter=1), mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan
    assert "Join" not in plan and "Exchange" not in plan, plan


def test_conductance_is_two_label_joins_one_agg(spark, toy_graph):
    """Conductance shares modularity's tagged-view layout: label-lookup
    equi-joins + label-sized partial aggs, s_total as a broadcast — no
    cartesian product, no Python worker (graph_metrics.py:conductance)."""
    from cognee_graphdb_spark.operators.graph_metrics import conductance
    from pyspark.sql import functions as F

    nodes, edges = toy_graph
    labels = nodes.select("id", F.lit(1).alias("label"))
    plan = plan_of(conductance(edges, labels))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_scc_rounds_are_equi_joins(spark, toy_graph):
    """Every SCC forward/backward propagation round and the peel anti-joins
    must plan as hash equi-joins + partial aggs — no cartesian product, no
    Python worker (graph_metrics.py:strongly_connected_components)."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        strongly_connected_components,
    )

    nodes, edges = toy_graph
    plan = plan_of(strongly_connected_components(nodes, edges))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_rmat_generation_is_one_shuffle_free_projection(spark):
    """The generator must plan as a whole-stage-codegen projection over a
    range scan — zero Exchange (graph_generators.py:rmat_edges); only the
    optional dedup may shuffle."""
    from cognee_graphdb_spark.operators.graph_generators import rmat_edges

    plan = plan_of(rmat_edges(spark, scale=8, edge_factor=4))
    assert "Exchange" not in plan, plan
    # formatted mode marks codegen stages with '*' and a codegen id
    assert "* Project" in plan and "codegen id" in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_fastrp_rounds_are_equi_joins_jvm_side(spark, toy_graph):
    """FastRP (node_embeddings.py:fastrp_embeddings): the hash init is
    map-only expression math, each averaging round ONE equi-join + one
    partial-aggregated d-wide mean, norms/weighted sums higher-order
    Catalyst expressions — no cartesian, no Python worker, no RNG
    broadcast."""
    from cognee_graphdb_spark.operators.node_embeddings import fastrp_embeddings

    nodes, edges = toy_graph
    plan = plan_of(
        fastrp_embeddings(
            nodes.select("id"), edges, dim=4, checkpoint=False
        )
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan
