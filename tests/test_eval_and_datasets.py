"""QA eval harness metrics + multi-dataset scoping."""

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.api import CogneeSpark
from cognee_graphdb_spark.plans.eval_qa import score_answers


def test_score_answers_em_f1(spark):
    df = spark.createDataFrame(
        [
            ("q1", "Paris", "Paris"),  # exact
            ("q2", "It is Paris, France!", "paris france"),  # partial, punctuation stripped
            ("q3", "London", "Paris"),  # wrong
        ],
        ["question", "answer", "gold"],
    )
    out = {r["question"]: r for r in score_answers(df).collect()}
    assert out["q1"]["em"] == 1.0 and out["q1"]["f1"] == 1.0
    assert out["q2"]["em"] == 0.0
    assert out["q2"]["recall"] == pytest.approx(1.0)  # gold fully covered
    assert out["q2"]["precision"] == pytest.approx(2 / 4)
    assert out["q3"]["f1"] == 0.0


def test_evaluate_qa_end_to_end(spark, tmp_path):
    from cognee_graphdb_spark.plans.eval_qa import evaluate_qa

    e = CogneeSpark(spark, str(tmp_path / "ev"))
    e.add([("a.txt", "Apache Spark processes large datasets with executors.")])
    e.cognify()
    res = evaluate_qa(e, [("what processes datasets?", "mock answer")], search_type="RAG_COMPLETION")
    assert res["n"] == 1 and 0.0 <= res["f1"] <= 1.0
    assert set(res["per_question"].columns) >= {"question", "answer", "gold", "em", "f1"}


def test_evaluate_qa_llm_judge(spark, tmp_path):
    from cognee_graphdb_spark.plans.eval_qa import evaluate_qa

    e = CogneeSpark(spark, str(tmp_path / "evj"))
    e.add([("a.txt", "Apache Spark processes large datasets with executors.")])
    e.cognify()
    # gold 'mock completion': the RAG answer is MOCK_COMPLETION[...], so the
    # deterministic judge gives full marks; an unrelated gold gives zero
    res = evaluate_qa(e, [("q1", "mock completion"), ("q2", "zebra xylophone")], llm_judge=True)
    assert res["judge"] == pytest.approx(0.5)
    per = {r["question"]: r["judge_score"] for r in res["per_question"].collect()}
    assert per["q1"] == pytest.approx(1.0) and per["q2"] == pytest.approx(0.0)
    # direct judge sanity: partial overlap scores fractionally
    assert e.gateway.judge_correctness("q", "spark is fast", "fast spark engine") == pytest.approx(2 / 3)
    # duplicate question texts must not fan out the judge join (keyed by qid)
    res2 = evaluate_qa(e, [("q", "mock completion"), ("q", "zebra")], llm_judge=True)
    assert res2["per_question"].count() == 2
    assert res2["judge"] == pytest.approx(0.5)


def test_permissions_deny_by_default(spark, tmp_path):
    root = str(tmp_path / "perm")
    a = CogneeSpark(spark, root, dataset_id="ds_a")
    a.add([("a.txt", "Alpha dataset describes apache spark executors.")])
    a.cognify()
    b = CogneeSpark(spark, root, dataset_id="ds_b")
    b.add([("b.txt", "Beta dataset describes duckdb vectorized scans.")])
    b.cognify()

    import pytest as _pytest

    with _pytest.raises(PermissionError):
        a.search("CHUNKS", "anything", user_id="alice")  # no grants yet

    a.permissions.give_permission("alice", "ds_a", "read")
    out = a.search("CHUNKS", "dataset", top_k=10, user_id="alice")
    assert all("Alpha" in r["text"] for r in out.collect())
    assert a.permissions.has_permission("alice", "ds_a", "read")
    assert not a.permissions.has_permission("alice", "ds_b", "read")
    # explicit request outside the grant set is refused, not silently widened
    with _pytest.raises(PermissionError):
        a.search("CHUNKS", "anything", user_id="alice", dataset_ids=["ds_b"])
    a.permissions.revoke_permission("alice", "ds_a", "read")
    with _pytest.raises(PermissionError):
        a.search("CHUNKS", "anything", user_id="alice")


def test_write_delete_permissions_deny_by_default(spark, tmp_path):
    """Mutations are ACL-gated like reads: add/cognify need 'write', delete
    needs 'delete' (reference: check_permissions_on_dataset in the cognify
    task list; permission types read/write/delete/share)."""
    root = str(tmp_path / "wperm")
    a = CogneeSpark(spark, root, dataset_id="ds_a")
    items = [("a.txt", "Alpha dataset describes apache spark executors.")]

    with pytest.raises(PermissionError, match="'write'"):
        a.add(items, user_id="alice")
    a.permissions.give_permission("alice", "ds_a", "write")
    a.add(items, user_id="alice")
    assert a.cognify(user_id="alice") == 1

    # write does not imply delete
    with pytest.raises(PermissionError, match="'delete'"):
        a.delete("a.txt", user_id="alice")
    a.permissions.give_permission("alice", "ds_a", "delete")
    assert a.delete("a.txt", user_id="alice") > 0


def test_role_grants_flow_to_members(spark, tmp_path):
    """Grants to a ROLE principal authorize its member users (Role.py +
    UserRole membership; get_specific_user_permission_datasets resolves
    through roles)."""
    root = str(tmp_path / "roles")
    a = CogneeSpark(spark, root, dataset_id="ds_a")
    a.add([("a.txt", "Alpha dataset describes apache spark executors.")])
    a.cognify()

    a.permissions.give_permission("analysts", "ds_a", "read")
    with pytest.raises(PermissionError):
        a.search("CHUNKS", "anything", user_id="bob")  # not a member yet
    a.permissions.add_user_to_role("bob", "analysts", tenant_id="acme")
    assert a.permissions.has_permission("bob", "ds_a", "read")
    assert a.permissions.authorized_datasets("bob", "read") == ["ds_a"]
    out = a.search("CHUNKS", "dataset", top_k=5, user_id="bob")
    assert out.count() >= 1
    # membership confers exactly the role's grants, nothing more
    assert not a.permissions.has_permission("bob", "ds_a", "write")


def test_dataset_management_api(spark, tmp_path):
    """api/v1/datasets parity: list/list_data/status/delete_dataset."""
    root = str(tmp_path / "dsmgmt")
    a = CogneeSpark(spark, root, dataset_id="ds_a")
    a.add([("a.txt", "Alpha dataset describes apache spark executors.")])
    a.cognify()
    b = CogneeSpark(spark, root, dataset_id="ds_b")
    b.add([("b.txt", "Beta dataset describes duckdb vectorized scans.")])

    assert a.list_datasets() == ["ds_a", "ds_b"]
    assert a.list_data().count() == 1 and a.list_data("ds_b").count() == 1
    st = a.dataset_status()
    assert st.get("ds_a") == "COMPLETED" and "ds_b" not in st  # b never cognified
    b.cognify()
    assert a.dataset_status().get("ds_b") == "COMPLETED"
    # ACL-scoped listing
    a.permissions.give_permission("carol", "ds_b", "read")
    assert a.list_datasets(user_id="carol") == ["ds_b"]

    a.permissions.give_permission("mallory", "ds_a", "delete")
    removed = a.delete_dataset("ds_a")
    assert removed["data"] == 1 and removed["nodes"] > 0
    assert a.list_datasets() == ["ds_b"]
    # the graph kept ds_b intact
    nodes = a.store.load("nodes")
    assert {r["dataset_id"] for r in nodes.select("dataset_id").distinct().collect()} == {"ds_b"}
    # the deleted dataset leaves no ghost status row and no stale ACL
    assert "ds_a" not in a.dataset_status()
    assert not a.permissions.has_permission("mallory", "ds_a", "delete")
    # deleted content re-processes on re-add (processed hash forgotten)
    a2 = CogneeSpark(spark, root, dataset_id="ds_a")
    a2.add([("a.txt", "Alpha dataset describes apache spark executors.")])
    assert a2.cognify() == 1


def test_shared_content_across_datasets(spark, tmp_path):
    """Processed marks are PER DATASET: content cognified in ds_a must still
    build ds_b's own graph rows, and deleting ds_a must not orphan ds_b."""
    root = str(tmp_path / "shared")
    text = "Shared corpus describes apache spark executors and shuffle."
    a = CogneeSpark(spark, root, dataset_id="ds_a")
    a.add([("x.txt", text)])
    assert a.cognify() == 1
    b = CogneeSpark(spark, root, dataset_id="ds_b")
    b.add([("x.txt", text)])
    # ds_a's mark must NOT skip ds_b's build (per-dataset graphs)
    assert b.cognify() == 1
    assert b.search("CHUNKS", "executors", dataset_ids=["ds_b"]).count() >= 1
    # deleting ds_a leaves ds_b's graph AND its processed mark intact
    a.delete_dataset("ds_a")
    assert b.search("CHUNKS", "executors", dataset_ids=["ds_b"]).count() >= 1
    assert b.cognify() == 0  # still marked processed for ds_b


def test_legacy_global_marks_respect_cross_references(spark, tmp_path):
    """Stores whose processed marks predate dataset tagging: a scoped delete
    must not forget a hash another dataset still references (the pre-scoping
    guard), but hashes nobody else holds are forgotten."""
    from cognee_graphdb_spark.sources.ingest import PipelineRuns, ingest_texts

    root = str(tmp_path / "legacy")
    pr = PipelineRuns(spark, root)
    shared = ingest_texts(spark, [("x.txt", "shared alpha")], dataset_id="ds_a")
    only_a = ingest_texts(spark, [("y.txt", "solo beta")], dataset_id="ds_a")
    # legacy table: hash-only marks (no dataset column)
    pr.mark_processed(shared.drop("dataset_id"))
    pr.mark_processed(only_a.drop("dataset_id"))
    h_shared = shared.select("content_hash").first()[0]
    h_solo = only_a.select("content_hash").first()[0]
    # ds_b still references the shared content
    refs = spark.createDataFrame([(h_shared,)], "content_hash string")
    pr.unmark_processed([h_shared, h_solo], dataset_id="ds_a", keep_legacy_for=refs)
    seen = spark.read.parquet(pr.processed_path)
    left = {r["content_hash"] for r in seen.collect()}
    assert h_shared in left and h_solo not in left


def test_deleted_dataset_tombstone_and_recreation(spark, tmp_path):
    """forget_dataset is an append-only tombstone: the dataset vanishes from
    statuses(), concurrent appends are never lost to a rewrite, and a
    re-created dataset's newer runs outrank the tombstone."""
    from cognee_graphdb_spark.sources.ingest import PipelineRuns

    pr = PipelineRuns(spark, str(tmp_path / "tomb"))
    pr.log("ds_a", "cognify", "COMPLETED")
    assert pr.statuses() == {"ds_a": "COMPLETED"}
    pr.forget_dataset("ds_a")
    assert pr.statuses() == {}
    assert pr.status("ds_a", "cognify") is None
    assert pr.should_run("ds_a", "cognify")
    # recreation: a newer run row wins over the tombstone
    pr.log("ds_a", "cognify", "STARTED")
    assert pr.statuses() == {"ds_a": "STARTED"}


def test_dataset_scoped_search(spark, tmp_path):
    root = str(tmp_path / "multi")
    a = CogneeSpark(spark, root, dataset_id="ds_a")
    a.add([("a.txt", "Alpha dataset describes apache spark executors.")])
    a.cognify()
    b = CogneeSpark(spark, root, dataset_id="ds_b")
    b.add([("b.txt", "Beta dataset describes duckdb vectorized scans.")])
    b.cognify()

    nodes = a.store.load("nodes")
    assert {r["dataset_id"] for r in nodes.select("dataset_id").distinct().collect()} == {"ds_a", "ds_b"}

    only_a = a.search("CHUNKS", "apache spark executors", top_k=10, dataset_ids=["ds_a"])
    texts = [r["text"] for r in only_a.collect()]
    assert texts and all("Alpha" in t for t in texts)
    both = a.search("CHUNKS", "dataset", top_k=10)
    assert len(both.collect()) > len(texts) - 1  # unscoped sees both datasets


def test_same_content_in_two_datasets_keeps_both_rows(spark, tmp_path):
    """ids are content-addressed, so identical content in two datasets
    collides on id — each dataset must keep its own row (the reference
    isolates datasets as separate graph DBs)."""
    root = str(tmp_path / "collide")
    text = "Gamma dataset describes the identical shared sentence."
    a = CogneeSpark(spark, root, dataset_id="ds_a")
    a.add([("same.txt", text)])
    a.cognify()
    b = CogneeSpark(spark, root, dataset_id="ds_b")
    b.add([("same.txt", text)])
    b.cognify(incremental=False)  # same content hash: force reprocessing into ds_b

    nodes = a.store.load("nodes")
    per_ds = {
        r["dataset_id"]: r["n"]
        for r in nodes.groupBy("dataset_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(per_ds) == {"ds_a", "ds_b"}
    assert per_ds["ds_a"] == per_ds["ds_b"]  # ds_b's upsert did not steal ds_a's rows
    # deleting from ds_b leaves ds_a's graph and Data row intact
    assert b.delete("same.txt") > 0
    nodes_after = a.store.load("nodes")
    assert {r["dataset_id"] for r in nodes_after.select("dataset_id").distinct().collect()} == {"ds_a"}
    data_after = a.store.load("data")
    assert data_after.count() == 1 and data_after.first()["dataset_id"] == "ds_a"
    # content hash stays marked processed (ds_a still references it):
    # re-adding into ds_a stays incremental no-op
    a.add([("same.txt", text)])
    assert a.cognify() == 0
    # ds_a's retrieval still works end to end
    out = a.search("CHUNKS", "identical shared sentence", top_k=5, dataset_ids=["ds_a"])
    assert out.count() > 0


def test_combined_context_multi_dataset_search(spark, tmp_path):
    """use_combined_context: per-dataset top-k contexts merged, one
    completion (search.py:211-268); merged context covers both datasets and
    each per-dataset half matches the single-dataset run."""
    root = str(tmp_path / "combined")
    a = CogneeSpark(spark, root, dataset_id="ds_a")
    a.add([("a.txt", "Alpha dataset describes apache spark executors.")])
    a.cognify()
    b = CogneeSpark(spark, root, dataset_id="ds_b")
    b.add([("b.txt", "Beta dataset describes duckdb vectorized scans.")])
    b.cognify()
    a.permissions.give_permission("alice", "ds_a", "read")
    a.permissions.give_permission("alice", "ds_b", "read")

    merged = a.search(
        "GRAPH_COMPLETION", "what describes spark?", top_k=5,
        user_id="alice", use_combined_context=True, only_context=True,
    )
    single_a = a.search("GRAPH_COMPLETION", "what describes spark?", top_k=5,
                        dataset_ids=["ds_a"], only_context=True)
    single_b = a.search("GRAPH_COMPLETION", "what describes spark?", top_k=5,
                        dataset_ids=["ds_b"], only_context=True)
    merged_keys = {(r["src"], r["dst"], r["relationship_name"]) for r in merged.collect()}
    keys_a = {(r["src"], r["dst"], r["relationship_name"]) for r in single_a.collect()}
    keys_b = {(r["src"], r["dst"], r["relationship_name"]) for r in single_b.collect()}
    assert keys_a and keys_b
    assert merged_keys == keys_a | keys_b

    # the completion path returns one string built from the combined context
    answer = a.search(
        "GRAPH_COMPLETION", "what describes spark?", top_k=5,
        user_id="alice", use_combined_context=True,
    )
    assert isinstance(answer, str) and answer
    # deny-by-default still applies under combined context
    with pytest.raises(PermissionError):
        a.search("GRAPH_COMPLETION", "q", user_id="mallory", use_combined_context=True)
    # retrieval family merges per-dataset rows
    chunks = a.search("CHUNKS", "dataset", top_k=10, user_id="alice", use_combined_context=True)
    texts = [r["text"] for r in chunks.collect()]
    assert any("Alpha" in t for t in texts) and any("Beta" in t for t in texts)

def test_share_dataset_deny_by_default(spark, tmp_path):
    """Only a 'share'-holder can grant others access (the reference's share
    flow); a plain read/write-holder cannot — deny by default."""
    root = str(tmp_path / "share")
    a = CogneeSpark(spark, root, dataset_id="ds_a")
    a.add([("a.txt", "Alpha dataset describes apache spark executors.")])
    a.cognify()

    # granter without 'share' — even one holding read+write — cannot grant
    a.permissions.give_permission("mallory", "ds_a", "read")
    a.permissions.give_permission("mallory", "ds_a", "write")
    with pytest.raises(PermissionError, match="'share'"):
        a.share_dataset("mallory", "eve")
    assert not a.permissions.has_permission("eve", "ds_a", "read")

    # a share-holder's grant lands on the grantee principal
    a.permissions.give_permission("owner", "ds_a", "share")
    a.share_dataset("owner", "eve")
    assert a.permissions.has_permission("eve", "ds_a", "read")
    assert a.permissions.authorized_datasets("eve", "read") == ["ds_a"]
    # and the grantee can actually search now
    assert a.search("CHUNKS", "dataset", top_k=5, user_id="eve").count() >= 1
    # share grants only what was asked — read does not imply write
    assert not a.permissions.has_permission("eve", "ds_a", "write")

    # share can grant to a ROLE principal too
    a.share_dataset("owner", "analysts", permission="read")
    a.permissions.add_user_to_role("carol", "analysts")
    assert a.permissions.has_permission("carol", "ds_a", "read")


def test_dataset_status_acl_gate(spark, tmp_path):
    """dataset_status(user_id=...) hides other tenants' datasets — without
    the gate any caller could enumerate every dataset's pipeline state."""
    root = str(tmp_path / "statgate")
    a = CogneeSpark(spark, root, dataset_id="ds_a")
    a.add([("a.txt", "Alpha dataset describes apache spark executors.")])
    a.cognify()
    b = CogneeSpark(spark, root, dataset_id="ds_b")
    b.add([("b.txt", "Beta dataset describes duckdb vectorized scans.")])
    b.cognify()

    both = a.dataset_status()
    assert set(both) == {"ds_a", "ds_b"}  # ungated call still sees all
    assert a.dataset_status(user_id="alice") == {}  # no grants -> nothing
    a.permissions.give_permission("alice", "ds_a", "read")
    gated = a.dataset_status(user_id="alice")
    assert set(gated) == {"ds_a"}
    assert gated["ds_a"] == both["ds_a"]


def test_list_datasets_sees_graph_only_dataset(spark, tmp_path):
    """A dataset populated ONLY via cypher_write (graph rows, no Data rows)
    must appear in list_datasets, matching what search/delete can see."""
    root = str(tmp_path / "graphonly")
    a = CogneeSpark(spark, root, dataset_id="ds_a")
    a.add([("a.txt", "Alpha dataset describes apache spark executors.")])
    a.cognify()
    g = CogneeSpark(spark, root, dataset_id="ds_graph")
    g.cypher_write("CREATE (n:Thing {id: 'x1', name: 'X'})")

    assert a.list_datasets() == ["ds_a", "ds_graph"]


def _hotpot_fixture(tmp_path):
    import json

    items = [
        {
            "_id": "h1",
            "question": "Which engine processes large datasets?",
            "answer": "Apache Spark",
            "level": "easy",
            "context": [
                ["Spark", ["Apache Spark processes large datasets.", "It uses executors."]],
                ["DuckDB", ["DuckDB is an embedded analytical database."]],
            ],
            "supporting_facts": [["Spark", 0], ["Spark", 5], ["Missing", 0]],
        },
        {
            "_id": "h2",
            "question": "What is DuckDB?",
            "answer": "An Embedded Database",
            "level": "medium",
            "context": [["DuckDB", ["DuckDB is an embedded analytical database."]]],
            "supporting_facts": [["DuckDB", 0]],
        },
        {
            "_id": "h3",
            "question": "What do executors do?",
            "answer": "run tasks",
            "level": "hard",
            "context": [["Executors", ["Executors run tasks for Spark jobs."]]],
            "supporting_facts": [["Executors", 0]],
        },
    ]
    p = tmp_path / "hotpot_fixture.json"
    p.write_text(json.dumps(items))
    return str(p)


def test_hotpot_adapter_field_mapping(spark, tmp_path):
    """load_qa_corpus mirrors hotpot_qa_adapter.py: corpus entries join each
    context's sentences, answers lowercase, 'level' metadata carried, golden
    context keeps only VALID supporting facts."""
    from cognee_graphdb_spark.plans.eval_corpus import eval_pairs, load_qa_corpus

    path = _hotpot_fixture(tmp_path)
    corpus, pairs = load_qa_corpus(path, fmt="hotpot", load_golden_context=True)
    assert len(corpus) == 4  # 2 + 1 + 1 context entries
    assert corpus[0] == "Apache Spark processes large datasets. It uses executors."
    assert pairs[0]["answer"] == "apache spark"  # lowercased like the reference
    assert pairs[0]["level"] == "easy"
    # invalid supporting facts (index 5, unknown title) are skipped
    assert pairs[0]["golden_context"] == "Spark: Apache Spark processes large datasets."
    assert eval_pairs(pairs)[2] == ("What do executors do?", "run tasks")

    # instance filtering by string id and by index, like _filter_instances
    _, by_id = load_qa_corpus(path, fmt="hotpot", instance_filter=["h2"])
    assert [p["question"] for p in by_id] == ["What is DuckDB?"]
    _, by_idx = load_qa_corpus(path, fmt="hotpot", instance_filter=[0, 2])
    assert [p["level"] for p in by_idx] == ["easy", "hard"]
    # deterministic seeded sampling under limit
    _, s1 = load_qa_corpus(path, fmt="hotpot", limit=2, seed=7)
    _, s2 = load_qa_corpus(path, fmt="hotpot", limit=2, seed=7)
    assert [p["question"] for p in s1] == [p["question"] for p in s2]


def test_hotpot_corpus_runs_full_eval_protocol(spark, tmp_path):
    """The reference protocol end-to-end: load corpus file -> add corpus ->
    cognify -> evaluate_qa(llm_judge=True) with the mock gateway."""
    from cognee_graphdb_spark.plans.eval_corpus import eval_pairs, load_qa_corpus
    from cognee_graphdb_spark.plans.eval_qa import evaluate_qa

    corpus, pairs = load_qa_corpus(_hotpot_fixture(tmp_path), fmt="hotpot")
    e = CogneeSpark(spark, str(tmp_path / "hotpot_ev"))
    e.add([(f"doc{i}.txt", text) for i, text in enumerate(corpus)])
    assert e.cognify() > 0
    res = evaluate_qa(e, eval_pairs(pairs), llm_judge=True)
    assert res["n"] == 3
    assert 0.0 <= res["em"] <= 1.0 and 0.0 <= res["f1"] <= 1.0
    assert 0.0 <= res["judge"] <= 1.0
    assert res["per_question"].count() == 3


def test_musique_adapter_jsonl(tmp_path):
    import json

    items = [
        {
            "id": "m1",
            "question": "Where is the lab?",
            "answer": "Berlin",
            "paragraphs": [
                {"title": "Lab", "paragraph_text": "The lab is in Berlin."},
                {"title": "Other", "paragraph_text": "Unrelated text."},
            ],
            "question_decomposition": [
                {"question": "Which lab?", "answer": "the lab", "paragraph_support_idx": 0},
                {"question": "Where?", "answer": "Berlin", "paragraph_support_idx": 9},
            ],
        }
    ]
    p = tmp_path / "musique.jsonl"
    p.write_text("\n".join(json.dumps(i) for i in items))

    from cognee_graphdb_spark.plans.eval_corpus import load_qa_corpus

    corpus, pairs = load_qa_corpus(str(p), fmt="musique", load_golden_context=True)
    assert corpus == ["The lab is in Berlin.", "Unrelated text."]
    assert pairs[0]["answer"] == "berlin" and pairs[0]["id"] == "m1"
    gc = pairs[0]["golden_context"]
    assert "Lab: The lab is in Berlin." in gc and "Q: Which lab?" in gc
    assert "paragraph_support_idx" not in gc  # out-of-range idx 9 skipped


def test_twowiki_adapter_evidences(tmp_path):
    import json

    items = [
        {
            "_id": "w1",
            "question": "q",
            "answer": "A",
            "type": "comparison",
            "context": [["T", ["s0"]]],
            "supporting_facts": [["T", 0]],
            "evidences": [["spark", "is", "fast"]],
        }
    ]
    p = tmp_path / "2wiki.json"
    p.write_text(json.dumps(items))

    from cognee_graphdb_spark.plans.eval_corpus import load_qa_corpus

    _, pairs = load_qa_corpus(str(p), fmt="2wikimultihop", load_golden_context=True)
    assert pairs[0]["type"] == "comparison"
    assert "Evidence fact triplets:" in pairs[0]["golden_context"]
    assert "spark - is - fast" in pairs[0]["golden_context"]


def test_context_coverage_metric(spark, tmp_path):
    """The reference's fourth eval metric (ContextCoverageMetric,
    context_coverage.py:9-32): retrieved context judged against the golden
    context, per-row coverage_score + a coverage mean in [0, 1]."""
    from cognee_graphdb_spark.plans.eval_corpus import (
        eval_pairs,
        golden_contexts,
        load_qa_corpus,
    )
    from cognee_graphdb_spark.plans.eval_qa import evaluate_qa

    corpus, pairs = load_qa_corpus(
        _hotpot_fixture(tmp_path), fmt="hotpot", load_golden_context=True
    )
    e = CogneeSpark(spark, str(tmp_path / "hotpot_cov"))
    e.add([(f"doc{i}.txt", text) for i, text in enumerate(corpus)])
    assert e.cognify() > 0
    res = evaluate_qa(
        e, eval_pairs(pairs), llm_judge=True, golden_contexts=golden_contexts(pairs)
    )
    assert 0.0 <= res["coverage"] <= 1.0
    rows = {r["qid"]: r for r in res["per_question"].collect()}
    assert len(rows) == 3 and all(r["coverage_score"] is not None for r in rows.values())

    # mock judge math: full containment scores 1.0, disjoint scores 0.0
    g = e.gateway
    assert g.judge_context_coverage("alpha beta", "ALPHA beta gamma") == 1.0
    assert g.judge_context_coverage("alpha beta", "gamma delta") == 0.0
    assert g.judge_context_coverage("", "anything") == 1.0

    # one golden context per pair is required
    import pytest as _pytest

    with _pytest.raises(ValueError, match="one entry per QA pair"):
        evaluate_qa(e, eval_pairs(pairs), golden_contexts=["only-one"])
    with _pytest.raises(ValueError, match="golden_context"):
        golden_contexts([{"question": "q", "answer": "a"}])


def test_bootstrap_ci_seeded_and_sane(spark):
    from cognee_graphdb_spark.plans.eval_qa import bootstrap_ci, metrics_statistics

    scores = [1.0, 0.0, 1.0, 1.0, 0.5, 0.0, 1.0, 0.75]
    mean, lo, hi = bootstrap_ci(scores, num_samples=2000)
    assert abs(mean - sum(scores) / len(scores)) < 1e-12
    assert lo <= mean <= hi and 0.0 <= lo and hi <= 1.0
    # seeded: bit-identical across calls; a different seed moves the band
    assert bootstrap_ci(scores, num_samples=2000) == (mean, lo, hi)
    assert bootstrap_ci(scores, num_samples=2000, seed=99) != (mean, lo, hi)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bootstrap_ci([])

    df = spark.createDataFrame(
        [(1.0, 0.5, None), (0.0, 1.0, 0.25)], ["em", "f1", "judge_score"]
    )
    stats = metrics_statistics(df, metrics=("em", "f1", "judge_score", "absent"))
    assert set(stats) == {"em", "f1", "judge_score"}
    assert stats["judge_score"][0] == 0.25  # null skipped like the reference


def test_eval_dashboard_renders_all_sections(tmp_path):
    from cognee_graphdb_spark.plans.eval_dashboard import create_dashboard

    html = create_dashboard(
        per_metric_scores={"f1": [0.0, 0.5, 1.0, 1.0]},
        ci={"f1": (0.625, 0.25, 1.0)},
        details=[
            {"question": "q<1>?", "answer": "a&b", "golden_answer": "g", "score": 1.0}
        ],
        output_file=str(tmp_path / "dash.html"),
    )
    assert (tmp_path / "dash.html").read_text() == html
    assert "<svg" in html and "confidence intervals" in html
    assert "f1 distribution" in html
    # user strings are escaped, never raw
    assert "q&lt;1&gt;?" in html and "a&amp;b" in html
    # artifact-shape input: ci95 blocks become CI rows
    art = {"graph_completion": {"em": 0.75, "ci95": {"em": [0.75, 0.5, 0.95]}}}
    html2 = create_dashboard(eval_artifact=art)
    assert "graph_completion/em" in html2 and "0.750 [0.500, 0.950]" in html2
