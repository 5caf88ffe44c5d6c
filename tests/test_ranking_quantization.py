"""BM25/TF-IDF ranking (operators/ranking.py), int8 quantization
(operators/similarity.py), and skew diagnostics (operators/diagnostics.py)."""

import math

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.diagnostics import skew_report
from cognee_graphdb_spark.operators.ranking import bm25_topk, bm25_topk_batch, tfidf_topk
from cognee_graphdb_spark.operators.similarity import (
    dequantize_expr,
    knn_quantized,
    quantization_params,
    quantize_int8,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark shuffles data between stages"),
        (2, "spark spark spark broadcast joins avoid shuffles"),
        (3, "a document about gardening and flowers"),
        (4, "broadcast variables ship read only data"),
        (5, "stages pipeline into whole stage codegen"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def _bm25_ref(corpus_rows, query_terms, k1=1.2, b=0.75):
    """Driver-side reference implementation for cross-checking."""
    docs = {i: t.split() for i, t in corpus_rows}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    scores = {}
    for d, toks in docs.items():
        s = 0.0
        for t in query_terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            dft = sum(1 for v in docs.values() if t in v)
            idf = math.log(1 + (n - dft + 0.5) / (dft + 0.5))
            s += idf * tf / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            scores[d] = round(s, 6)
    return scores


def test_bm25_matches_reference_formula(spark, corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    expected = _bm25_ref(rows, ["spark", "shuffles"])
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(corpus, "spark shuffles", k=10).collect()}
    assert got == pytest.approx(expected)
    # repeated query terms don't change the score (query tf ignored)
    again = {r["doc_id"]: r["bm25"] for r in bm25_topk(corpus, "spark spark shuffles", k=10).collect()}
    assert again == got


def test_bm25_rare_term_outranks_common(spark, corpus):
    # "gardening" appears once in the corpus; doc 3 must rank first for it
    top = bm25_topk(corpus, "gardening", k=3).collect()
    assert top[0]["doc_id"] == 3


def test_bm25_batch_agrees_with_single(spark, corpus):
    queries = [("q1", "spark shuffles"), ("q2", "broadcast data")]
    batch = bm25_topk_batch(corpus, queries, k=10).collect()
    for qid, qt in queries:
        single = {(r["doc_id"], r["bm25"]) for r in bm25_topk(corpus, qt, k=10).collect()}
        got = {(r["doc_id"], r["bm25"]) for r in batch if r["query_id"] == qid}
        assert got == single


def test_tfidf_ranks_exclusive_term_higher(spark, corpus):
    top = tfidf_topk(corpus, "gardening flowers", k=2).collect()
    assert top[0]["doc_id"] == 3


def test_quantization_roundtrip_error_bounded(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    mins, maxs = quantization_params(df)
    assert len(mins) == 16 and all(a <= b for a, b in zip(mins, maxs))
    qd = quantize_int8(df, mins, maxs)
    back = qd.select("vec_id", dequantize_expr(F.col("q_vector"), mins, maxs).alias("xhat"))
    orig = {r["vec_id"]: r["embedding"] for r in df.collect()}
    for r in back.collect():
        for x, xh, mn, mx in zip(orig[r["vec_id"]], r["xhat"], mins, maxs):
            step = (mx - mn) / 254 if mx > mn else 0.0
            assert abs(x - xh) <= step / 2 + 1e-12  # within half a quantization step


def test_quantized_knn_recall_vs_exact(spark):
    from cognee_graphdb_spark.operators.vector_search import knn

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    exact = [r["vec_id"] for r in knn(emb, q, k=10, vector_col="embedding", id_cols=("vec_id",)).collect()]
    quant = [r["vec_id"] for r in knn_quantized(emb, q, k=10).collect()]
    overlap = len(set(exact) & set(quant)) / 10
    assert overlap >= 0.8  # int8 grid keeps the neighborhood


def test_quantized_constant_dim_is_stable(spark):
    rows = [(1, [1.0, 0.5]), (2, [1.0, -0.5]), (3, [1.0, 0.1])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    mins, maxs = quantization_params(df)
    assert mins[0] == maxs[0] == 1.0
    back = (
        quantize_int8(df, mins, maxs)
        .select("vec_id", dequantize_expr(F.col("q_vector"), mins, maxs).alias("xhat"))
        .collect()
    )
    for r in back:
        assert r["xhat"][0] == 1.0  # constant dim reconstructs exactly


def test_skew_report_flags_hot_key(spark):
    rows = [(i, "hot" if i % 10 else "cold") for i in range(1000)]
    df = spark.createDataFrame(rows, ["i", "k"])
    rep = {r["key"]: r for r in skew_report(df, "k", top_k=5).collect()}
    assert rep["hot"]["cnt"] == 900
    assert rep["hot"]["share"] == 0.9
    assert rep["hot"]["x_mean"] == 1.8  # 900 / (1000/2 keys)
    assert rep["cold"]["cnt"] == 100


def test_ivf_quantized_topk_recall_against_exact(spark):
    from cognee_graphdb_spark.operators.similarity import ivf_quantized_topk
    from cognee_graphdb_spark.operators.vector_search import knn

    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((400, 16)).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(400)], ["vec_id", "embedding"]
    )
    qv = [float(x) for x in vecs[3]]
    exact = [r["vec_id"] for r in knn(df, qv, k=10, vector_col="embedding", id_cols=("vec_id",)).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_quantized_topk(df, qv, k=10, n_lists=8, nprobe=4, rerank=50).collect()
    ]
    # nprobe=half the lists + deep re-rank: expect strong overlap, and the
    # query's own vector must be the top hit
    assert approx[0] == 3
    assert len(set(exact) & set(approx)) >= 6
