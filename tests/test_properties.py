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
