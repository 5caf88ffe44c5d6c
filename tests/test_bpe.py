"""operators/bpe.py — distributed BPE vocabulary training + tokenization.

Ground truth is Sennrich et al. 2016's worked example (low/lower/newest/
widest): the merge sequence is hand-derivable, so training is pinned
value-for-value, and encoding must reproduce training's final symbol
sequences on the training corpus (the property that makes token counts
consistent between the learner and the pipeline that uses it).
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_train,
    bpe_vocabulary,
    pair_candidates,
    word_frequencies,
)

CORPUS = (
    "low low low low low lower lower "
    "newest newest newest newest newest newest widest widest widest"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([("d1", CORPUS)], "doc_id string, text string")


def test_sennrich_merge_sequence(spark, docs):
    """The classic worked example: es(9) -> est(9) -> est</w>(9) -> lo(7)
    -> low(7) -> ew(6) -> ... with ties broken (count desc, left, right)."""
    merges = bpe_train(docs, n_merges=6)
    assert merges == [
        ("e", "s", 9), ("es", "t", 9), ("est", END, 9),
        ("l", "o", 7), ("lo", "w", 7), ("e", "w", 6),
    ]
    again = bpe_train(docs, n_merges=6)
    assert again == merges  # byte-identical retrain


def test_encode_reproduces_training_and_handles_unseen(spark, docs):
    merges = bpe_train(docs, n_merges=10)
    out = bpe_encode(
        docs.select("doc_id", F.lit("lowest newest low windy").alias("text")),
        merges,
    )
    [row] = out.collect()
    # 'lowest': low + est</w> (composes two learned subwords across source
    # words); 'newest'/'low' reproduce their trained single/merged forms;
    # 'windy' is unseen past 'd' -> learned prefix chars + raw tail
    toks = row["tokens"]
    assert toks[:2] == ["low", "est" + END]
    assert toks[2] == "newest" + END
    assert toks[3] == "low" + END
    assert row["n_tokens"] == len(toks)
    tail = toks[4:]
    assert "".join(tail) == "windy" + END  # lossless: concat restores the word


def test_zero_merges_and_early_stop(spark, docs):
    assert bpe_train(docs, n_merges=0) == []
    # min_pair_count above every pair frequency => no merges learned
    assert bpe_train(docs, n_merges=5, min_pair_count=100) == []
    enc = bpe_encode(docs, [])
    [row] = enc.collect()
    # no merges: pure characters + end markers; count = chars + words
    n_words = sum(r["n"] for r in word_frequencies(docs).collect())
    n_chars = len(CORPUS.replace(" ", ""))
    assert row["n_tokens"] == n_chars + n_words


def test_vocabulary_frame_and_candidates(spark, docs):
    merges = bpe_train(docs, n_merges=4)
    vocab = bpe_vocabulary(spark, merges)
    rows = vocab.orderBy("rank").collect()
    assert [(r["left"], r["right"], r["merged"]) for r in rows][:2] == [
        ("e", "s", "es"), ("es", "t", "est"),
    ]
    top = pair_candidates(docs, top_k=3).collect()
    assert [(r["left"], r["right"], r["cnt"]) for r in top] == [
        ("e", "s", 9), ("s", "t", 9), ("t", END, 9),
    ]


def test_training_plan_stays_jvm_side(spark, docs):
    """The per-round aggregate is partial (map-side combine) and contains
    no Python stage and no cartesian — the vocab-table round is pure JVM."""
    df = pair_candidates(docs, top_k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "partial_" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "mapInPandas" not in plan.lower()


def test_encode_tokenizes_unicode_whitespace_like_training(spark):
    """Java regex \\s (training) is ASCII-only, so a NBSP is a TOKEN the
    corpus statistics count — encode's Python regex must agree (re.ASCII,
    r12c review fix) or token counts silently diverge on real web text."""
    nbsp_doc = spark.createDataFrame(
        [("d1", "a b")], "doc_id string, text string"
    )
    freqs = {r["word"]: r["n"] for r in word_frequencies(nbsp_doc).collect()}
    assert freqs == {"a": 1, " ": 1, "b": 1}
    [row] = bpe_encode(nbsp_doc, []).collect()
    # 3 words x (chars + end marker) = 6 tokens; the NBSP symbol survives
    assert row["n_tokens"] == 6
    assert "\u00a0" in row["tokens"]
