"""Learned quality filter: train on weak labels, score as pure projection."""

import pytest


@pytest.fixture(scope="module")
def weak_labeled(spark):
    good = [
        (i, "the quick brown fox jumps over the lazy dog and then walks home again " * 4, 1.0)
        for i in range(60)
    ]
    junk = [
        (1000 + i, ("### " * 10 + f"x{i} " * 30 + "... " * 8), 0.0)
        for i in range(60)
    ]
    return spark.createDataFrame(good + junk, ["doc_id", "text", "label"]).cache()


def test_train_then_score_separates_classes(spark, weak_labeled):
    from cognee_graphdb_spark.operators.quality_model import (
        score_quality,
        train_quality_model,
    )

    w = train_quality_model(weak_labeled)
    assert "__intercept__" in w and len(w) == 7
    scores = {r["doc_id"]: r["quality_score"] for r in score_quality(weak_labeled, w).collect()}
    good_scores = [scores[str(i)] for i in range(60)]
    junk_scores = [scores[str(1000 + i)] for i in range(60)]
    assert min(good_scores) > max(junk_scores)  # separable by construction
    assert all(0.0 <= s <= 1.0 for s in scores.values())


def test_score_is_zero_shuffle_projection(spark, weak_labeled):
    import contextlib, io

    from cognee_graphdb_spark.operators.quality_model import score_quality

    w = {"log_n_words": 0.5, "stopword_ratio": 2.0, "__intercept__": -1.0}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        score_quality(weak_labeled, w).explain(mode="simple")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_score_composes_with_weighted_sample(spark, weak_labeled):
    from cognee_graphdb_spark.operators.quality_model import (
        score_quality,
        train_quality_model,
    )
    from cognee_graphdb_spark.operators.training_data import weighted_sample

    from pyspark.sql import functions as F

    w = train_quality_model(weak_labeled)
    s = score_quality(weak_labeled, w).withColumnRenamed("doc_id", "sid")
    scored = weak_labeled.withColumn("sid", F.col("doc_id").cast("string")).join(s, "sid")
    # DCLM-style soft filter: keep probability = model score
    kept = weighted_sample(
        scored.withColumnRenamed("quality_score", "w_keep"), "w_keep", id_col="sid", seed=1
    )
    assert 0 < kept.count() < scored.count()
