"""Property-based tests (hypothesis) over the pure deterministic cores.

The reference pins golden vectors (SURVEY §5.1); these add the invariants the
vectors can't enumerate: the chunker reconstructs ANY input byte-for-byte, ids
are total deterministic functions, normalization is idempotent, and the
multiset token overlap matches a Counter-based reimplementation of the
reference metric on arbitrary repeated-token lists.  The pure-Python cores run
without a Spark session, so hypothesis can hammer hundreds of examples
cheaply; the one Spark comparison batches all its cases into a single action.
"""

import random
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cognee_graphdb_spark.ids import py_content_id, py_normalize_name
from cognee_graphdb_spark.operators.chunking import chunk_text, scan_words, sentences

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any unicode, no surrogates
    max_size=400,
)


@settings(max_examples=300, deadline=None)
@given(text_strategy, st.integers(min_value=1, max_value=64))
def test_chunker_reconstructs_any_input(text, max_size):
    """F3's contract: concatenating chunk texts reproduces the input exactly,
    whatever the whitespace/unicode shape and however small the budget."""
    chunks = chunk_text(text, max_chunk_size=max_size)
    assert "".join(c["text"] for c in chunks) == text
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
    assert all(c["chunk_size"] >= 1 for c in chunks if c["text"].strip())


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_word_scan_preserves_every_character(text):
    """F1: the word scanner partitions the input (no char lost or added)."""
    assert "".join(w for w, _ in scan_words(text)) == text


@settings(max_examples=300, deadline=None)
@given(text_strategy, st.one_of(st.none(), st.integers(min_value=1, max_value=16)))
def test_sentences_partition_the_text(text, max_size):
    assert "".join(s for s, _, _ in sentences(text, max_size=max_size)) == text


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=100), st.text(max_size=100))
def test_content_id_deterministic_fixed_width(a, b):
    """F5: same parts => same id; 32-hex; separator prevents boundary
    collisions ("ab"+"c" vs "a"+"bc")."""
    cid = py_content_id(a, b)
    assert cid == py_content_id(a, b)
    assert len(cid) == 32 and all(c in "0123456789abcdef" for c in cid)
    assert py_content_id(a + "x", b) != py_content_id(a, "x" + b) or a + "x" + "\x1f" + b == a + "\x1f" + "x" + b


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_normalize_name_idempotent(s):
    """F6: normalization is idempotent — the property that keeps
    content-addressed entity ids stable across repeated ingestion."""
    once = py_normalize_name(s)
    assert py_normalize_name(once) == once
    if s.isascii():  # 'ß'.upper() == 'SS' breaks round-tripping outside ASCII
        assert py_normalize_name(s.upper()) == once  # case-insensitive


def test_multiset_overlap_matches_counter_reference(spark):
    """A7: the codegen multiset intersection agrees with the reference's
    Counter min-overlap (f1.py:12-46) on 200 random repeated-token pairs,
    compared in ONE Spark action."""
    from cognee_graphdb_spark.operators.aggregations import multiset_intersect_size

    rng = random.Random(42)
    vocab = ["a", "b", "c", "dd", "ee"]
    cases = [
        (
            [rng.choice(vocab) for _ in range(rng.randint(1, 12))],
            [rng.choice(vocab) for _ in range(rng.randint(1, 12))],
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, p, g) for i, (p, g) in enumerate(cases)], ["i", "pred", "gold"]
    ).select("i", multiset_intersect_size(F.col("pred"), F.col("gold")).alias("ov"))
    got = {r["i"]: r["ov"] for r in df.collect()}
    for i, (p, g) in enumerate(cases):
        assert got[i] == sum((Counter(p) & Counter(g)).values()), (p, g)


def test_corpus_op_invariants_batched(spark):
    """Corpus-wide invariants of the curation ops, checked over one seeded
    random corpus in a handful of Spark actions (the hypothesis-per-example
    pattern would pay a job per case)."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(50)] + ["the", "and", "of", "to", "a"]
    rows = []
    for i in range(300):
        n = rng.randint(0, 120)
        words = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
        # sprinkle structure: newlines, punctuation, repeats
        text = " ".join(words)
        if i % 3 == 0:
            text = text.replace(" ", ".\n", 3)
        if i % 7 == 0:
            text += " " + text[: len(text) // 2]
        rows.append((i, text))
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).cache()

    from cognee_graphdb_spark.operators.training_data import (
        c4_line_filter,
        deterministic_shuffle,
        duplicate_spans,
        unigram_lm,
        unigram_logprob,
        weighted_sample,
    )

    # c4: kept + dropped == non-empty lines, and keep_doc implies >= 3 kept
    c4 = c4_line_filter(docs)
    bad = c4.filter(
        (F.col("n_lines_kept") < 0)
        | (F.col("n_lines_dropped") < 0)
        | (F.col("keep_doc") & (F.col("n_lines_kept") < 3))
    ).count()
    assert bad == 0
    assert c4.count() == 300  # projection: one row per doc, always

    # duplicate_spans: dup_windows <= n_windows, dup_frac in [0,1]
    ds = duplicate_spans(docs, window=6, stride=2)
    assert (
        ds.filter(
            (F.col("dup_windows") > F.col("n_windows"))
            | (F.col("dup_frac") < 0)
            | (F.col("dup_frac") > 1)
        ).count()
        == 0
    )

    # unigram scoring: mean_logprob <= 0, oov_frac == 0 on own corpus
    lm = unigram_lm(docs)
    sc = unigram_logprob(docs, lm)
    assert sc.filter((F.col("mean_logprob") > 0) | (F.col("oov_frac") != 0.0)).count() == 0

    # weighted_sample: kept set is a subset and monotone in weight
    w_lo = docs.withColumn("w", F.lit(0.3))
    w_hi = docs.withColumn("w", F.lit(0.8))
    kept_lo = {r["doc_id"] for r in weighted_sample(w_lo, "w", seed=9).select("doc_id").collect()}
    kept_hi = {r["doc_id"] for r in weighted_sample(w_hi, "w", seed=9).select("doc_id").collect()}
    assert kept_lo <= kept_hi  # same hash, higher threshold keeps superset

    # deterministic_shuffle: a permutation (every doc exactly once)
    sh = deterministic_shuffle(docs, n_shards=8, seed=5)
    assert sh.count() == 300
    assert sh.select("doc_id").distinct().count() == 300
