"""Operator unit tests: vector search, graph joins, aggregations, text
functions, temporal — small fixtures with hand-computed expectations."""

import math

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.functions.text import tokenize
from cognee_graphdb_spark.operators.aggregations import token_overlap_f1
from cognee_graphdb_spark.operators.graph_joins import (
    cascade_delete_set,
    has_edges,
    k_hop,
    neighbors,
    triplet_score_join,
    valid_edges,
)
from cognee_graphdb_spark.operators.vector_search import batch_knn, batch_knn_agg, knn


def _edges(spark, rows):
    return spark.createDataFrame(rows, ["src", "dst", "relationship_name"])


# --- vector search ----------------------------------------------------------


def test_knn_matches_manual_cosine(spark):
    rows = [(i, [float(i), 1.0, 0.0]) for i in range(1, 6)]
    df = spark.createDataFrame(rows, ["id", "vector"])
    q = [1.0, 1.0, 0.0]
    out = knn(df, q, k=3).collect()

    def cos(v):
        d = sum(a * b for a, b in zip(v, q))
        return 1 - d / (math.sqrt(sum(a * a for a in v)) * math.sqrt(2))

    expected = sorted(rows, key=lambda r: (cos(r[1]), r[0]))[:3]
    assert [r["id"] for r in out] == [e[0] for e in expected]


def test_batch_knn_and_agg_agree(spark):
    import random

    rng = random.Random(7)
    rows = [(str(i), [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, ["id", "vector"])
    queries = spark.createDataFrame(rows[:3], ["query_id", "query_vector"])
    w = {
        (r["query_id"], r["id"]): round(r["distance"], 9)
        for r in batch_knn(df, queries, k=5).collect()
    }
    a = {
        (r["query_id"], r["id"]): round(r["distance"], 9)
        for r in batch_knn_agg(df, [(q, v) for q, v in rows[:3]], k=5).collect()
    }
    assert set(w) == set(a)
    for key in w:
        assert w[key] == pytest.approx(a[key], abs=1e-9)


# --- graph joins ------------------------------------------------------------


def test_neighbors_and_has_edges(spark):
    e = _edges(spark, [("a", "b", "r"), ("c", "a", "s"), ("b", "c", "r")])
    assert {r["neighbor_id"] for r in neighbors(e, "a").collect()} == {"b", "c"}
    cands = _edges(spark, [("a", "b", "r"), ("a", "b", "nope")])
    assert [tuple(r) for r in has_edges(e, cands).collect()] == [("a", "b", "r")]


def test_k_hop_frontier(spark):
    e = _edges(spark, [(f"n{i}", f"n{i+1}", "r") for i in range(6)])
    seeds = spark.createDataFrame([("n0",)], ["id"])
    assert {r["id"] for r in k_hop(e, seeds, k=2).collect()} == {"n0", "n1", "n2"}
    assert {r["id"] for r in k_hop(e, seeds, k=2, direction="out").collect()} == {"n0", "n1", "n2"}
    # fully-lazy variant (no per-round localCheckpoint): same answer, and the
    # call itself must not trigger Spark jobs
    lazy = k_hop(e, seeds, k=3, checkpoint_frontier=False)
    assert {r["id"] for r in lazy.collect()} == {"n0", "n1", "n2", "n3"}


def test_valid_edges_drops_dangling(spark):
    nodes = spark.createDataFrame([("a",), ("b",)], ["id"])
    e = _edges(spark, [("a", "b", "r"), ("a", "ghost", "r"), ("ghost", "b", "r")])
    assert [tuple(r) for r in valid_edges(nodes, e).collect()] == [("a", "b", "r")]


def test_triplet_score_join_coalesce_and_topk(spark):
    e = _edges(spark, [("a", "b", "r1"), ("b", "c", "r2"), ("c", "d", "r3")])
    scores = spark.createDataFrame([("a", 0.1), ("b", 0.2)], ["id", "score"])
    ets = spark.createDataFrame([("r2", 0.5)], ["relationship_name", "score"])
    out = triplet_score_join(e, scores, edge_type_scores=ets, k=2).collect()
    # a-b: 0.1+0.2+1 = 1.3 ; b-c: 0.2+1+0.5 = 1.7 ; c-d: 3.0
    assert [(r["src"], r["dst"], round(r["triplet_score"], 4)) for r in out] == [
        ("a", "b", 1.3),
        ("b", "c", 1.7),
    ]


def test_cascade_delete_shares_survive(spark):
    e = _edges(
        spark,
        [
            ("chunk:d1", "doc:1", "is_part_of"),
            ("chunk:d2", "doc:2", "is_part_of"),
            ("chunk:d1", "ent:only1", "contains"),
            ("chunk:d1", "ent:shared", "contains"),
            ("chunk:d2", "ent:shared", "contains"),
            ("sum:d1", "chunk:d1", "made_from"),
            ("ent:only1", "type:solo", "is_a"),
            ("ent:shared", "type:common", "is_a"),
        ],
    )
    nodes = spark.createDataFrame(
        [(n,) for n in ["doc:1", "doc:2", "chunk:d1", "chunk:d2", "ent:only1", "ent:shared", "sum:d1", "type:solo", "type:common"]],
        ["id"],
    )
    out = {r["id"] for r in cascade_delete_set(nodes, e, "doc:1").collect()}
    assert out == {"doc:1", "chunk:d1", "sum:d1", "ent:only1", "type:solo"}


# --- aggregations / text ----------------------------------------------------


def test_token_f1_multiset(spark):
    # pred has 'a' twice; multiset tp = min(2,1) + min(1,1) = 2 (set-based
    # would count 'a' once on each side and report p=1.0)
    df = spark.createDataFrame([("a a b", "a b c")], ["pred", "gold"])
    p, r, f1 = token_overlap_f1(tokenize(F.col("pred")), tokenize(F.col("gold")))
    row = df.select(p.alias("p"), r.alias("r"), f1.alias("f1")).collect()[0]
    assert row["p"] == pytest.approx(2 / 3)
    assert row["r"] == pytest.approx(2 / 3)
    assert row["f1"] == pytest.approx(2 / 3)


def test_token_f1_both_empty_is_one(spark):
    df = spark.createDataFrame([("", "")], ["pred", "gold"])
    _, _, f1 = token_overlap_f1(tokenize(F.col("pred")), tokenize(F.col("gold")))
    assert df.select(f1.alias("f1")).collect()[0]["f1"] == 1.0


def test_title_matches_reference_semantics(spark):
    from cognee_graphdb_spark.functions.text import title_with_top_words
    from cognee_graphdb_spark.plans.triplet_search import _py_title

    text = "The quick brown fox jumps over the lazy dog. The fox is quick, very quick!"
    df = spark.createDataFrame([(text,)], ["text"])
    got = df.select(title_with_top_words(F.col("text")).alias("t")).collect()[0]["t"]
    assert got == _py_title(text)
    assert got.startswith("The quick brown fox jumps over the... [")
    # 'quick' (3 occurrences) must lead the top-words
    assert got.split("[")[1].startswith("quick")


def test_stopwords_match_reference_list():
    from cognee_graphdb_spark.functions.text import STOP_WORDS

    assert len(set(STOP_WORDS)) == 66  # the reference's DEFAULT_STOP_WORDS size
    assert {"whose", "might", "about", "these"} <= set(STOP_WORDS)


# --- temporal ---------------------------------------------------------------


def test_temporal_range_join(spark):
    ts = spark.createDataFrame([("t1", 100), ("t2", 200), ("t3", 300)], ["id", "time_at"])
    ee = _edges(spark, [("e1", "t1", "at"), ("e2", "t2", "at"), ("e3", "t3", "at"), ("e4", "t2", "other")])
    from cognee_graphdb_spark.operators.graph_joins import temporal_range_join

    out = {r["event_id"] for r in temporal_range_join(ts, ee, 150, 250).collect()}
    assert out == {"e2"}


def test_tokenize_unicode_keeps_nonlatin_scripts(spark):
    from pyspark.sql import functions as F

    from cognee_graphdb_spark.functions.text import tokenize, tokenize_unicode

    df = spark.createDataFrame([(1, "Héllo wörld 你好 世界 naïve café 123")], ["id", "t"])
    row = df.select(
        tokenize(F.col("t")).alias("ascii"), tokenize_unicode(F.col("t")).alias("uni")
    ).collect()[0]
    assert row["uni"] == ["héllo", "wörld", "你好", "世界", "naïve", "café", "123"]
    # the ASCII tokenizer shreds the accents/CJK — documenting why the
    # multilingual variant exists
    assert "你好" not in row["ascii"]
