"""Property tests for the BPE core + a dict-based trainer cross-check.

`encode_word` is pure Python, so hypothesis hammers it without a Spark
session (the test_properties.py discipline); the trainer cross-check
reimplements BPE training over a plain word-frequency dict — independent
code, same deterministic tie-break — and asserts the distributed trainer
matches it merge-for-merge on seeded random corpora (the Brandes-style
reimplementation discipline of test_graph_metrics).
"""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from cognee_graphdb_spark.operators.bpe import END, bpe_train, encode_word

words = st.text(
    alphabet=st.sampled_from("abcdef"), min_size=1, max_size=12
)


def _pure_train(freqs: dict[str, int], n_merges: int, min_pair_count: int = 2):
    """Reference BPE trainer over a word-frequency dict."""
    vocab = [(list(w) + [END], n) for w, n in freqs.items()]
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((l, r, c))
        nxt = []
        for syms, n in vocab:
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            nxt.append((out, n))
        vocab = nxt
    return merges, vocab


@given(
    word=words,
    corpus=st.lists(words, min_size=1, max_size=20),
    n_merges=st.integers(min_value=0, max_value=12),
)
@settings(max_examples=300, deadline=None)
def test_encode_is_lossless_under_any_learned_merges(word, corpus, n_merges):
    """concat(tokens) == word + END for ANY merge list — merging only ever
    concatenates adjacent symbols, and encode must preserve that."""
    merges, _ = _pure_train({w: 1 + (i % 3) for i, w in enumerate(corpus)}, n_merges, 1)
    toks = encode_word(word, merges)
    assert "".join(toks) == word + END
    assert all(toks)  # no empty symbols


@given(corpus=st.lists(words, min_size=1, max_size=15), n_merges=st.integers(0, 10))
@settings(max_examples=200, deadline=None)
def test_encode_reproduces_training_fixpoint(corpus, n_merges):
    """Rank-priority encoding of a training word equals the trained vocab's
    final symbol sequence for that word — the learner and the tokenizer
    agree on the corpus they were trained on."""
    freqs = {w: 1 + (i % 4) for i, w in enumerate(corpus)}
    merges, vocab = _pure_train(freqs, n_merges, 1)
    trained = {"".join(s).removesuffix(END): s for s, _ in vocab}
    for w in freqs:
        assert encode_word(w, merges) == trained[w]


def test_distributed_trainer_matches_dict_reimplementation(spark):
    """bpe_train == the dict-based reference trainer, merge-for-merge, on
    seeded random corpora (whitespace-joined so the pre-tokenizer splits
    back to exactly the generated words)."""
    rng = random.Random(11)
    for trial in range(4):
        corpus_words = [
            "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(3, 25))
        ]
        text = " ".join(corpus_words)
        freqs: dict[str, int] = {}
        for w in corpus_words:
            freqs[w] = freqs.get(w, 0) + 1
        expect, _ = _pure_train(freqs, 8)
        docs = spark.createDataFrame([("d", text)], "doc_id string, text string")
        got = bpe_train(docs, n_merges=8)
        assert got == expect, f"trial {trial}: {got} != {expect}"
