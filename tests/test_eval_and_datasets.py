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