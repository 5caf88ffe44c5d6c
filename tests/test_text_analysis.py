"""term_cooccurrence ground truth (the other text_analysis ops are covered by
their oracle-checked contract entries; PMI's marginal arithmetic deserves a
hand-computed fixture)."""

import math

import pytest


def test_term_cooccurrence_hand_computed(spark):
    """doc1 'alpha beta the gamma alpha beta' (stopword 'the' removed, so the
    filtered stream is [alpha beta gamma alpha beta]) + doc2
    'alpha beta delta', window=2: pair counts 4/2/2/1/1, N=10, marginals
    alpha=7 beta=7 gamma=4 delta=2, lift(alpha,beta)=4*10/49."""
    from cognee_graphdb_spark.operators.text_analysis import term_cooccurrence

    df = spark.createDataFrame(
        [(1, "alpha beta the gamma alpha beta"), (2, "alpha beta delta")],
        ["doc_id", "text"],
    )
    rows = {
        (r["t1"], r["t2"]): r
        for r in term_cooccurrence(df, window=2, min_pair_count=1).collect()
    }
    assert {(t1, t2): r["n_pairs"] for (t1, t2), r in rows.items()} == {
        ("alpha", "beta"): 4,
        ("alpha", "gamma"): 2,
        ("beta", "gamma"): 2,
        ("alpha", "delta"): 1,
        ("beta", "delta"): 1,
    }
    ab = rows[("alpha", "beta")]
    assert ab["lift"] == pytest.approx(40 / 49)
    assert ab["pmi"] == pytest.approx(math.log(40 / 49))
    # min_pair_count filters output but NOT the marginals/N
    kept = term_cooccurrence(df, window=2, min_pair_count=2).collect()
    assert {(r["t1"], r["t2"]) for r in kept} == {
        ("alpha", "beta"),
        ("alpha", "gamma"),
        ("beta", "gamma"),
    }
    assert {r["lift"] for r in kept if r["t1"] == "alpha" and r["t2"] == "beta"} == {
        ab["lift"]
    }


def test_term_cooccurrence_max_df_drops_hot_terms(spark):
    """A term in every doc is dropped by max_df before pairing — counts and
    marginals change as if it never existed."""
    from cognee_graphdb_spark.operators.text_analysis import term_cooccurrence

    df = spark.createDataFrame(
        [(1, "hot alpha beta"), (2, "hot alpha beta"), (3, "hot gamma")],
        ["doc_id", "text"],
    )
    out = {
        (r["t1"], r["t2"]): r["n_pairs"]
        for r in term_cooccurrence(df, window=2, min_pair_count=1, max_df=2).collect()
    }
    assert out == {("alpha", "beta"): 2}  # hot (df=3) gone, gamma now pairless


def test_term_cooccurrence_validates_window(spark):
    from cognee_graphdb_spark.operators.text_analysis import term_cooccurrence

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match=">= 1"):
        term_cooccurrence(df, window=0)
