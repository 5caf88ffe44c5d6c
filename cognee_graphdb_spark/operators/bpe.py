"""Distributed byte-pair-encoding: vocabulary training + tokenization.

The corpus pipeline counts tokens with a BPE-ish pre-tokenizer
(`text_analysis.py:bpe_ish_token_count` — a lower bound, since no merges
exist); this module learns the merges, making token counts and sequence
packing reflect an ACTUAL subword vocabulary (Sennrich, Haddow & Birch 2016,
arXiv:1508.07909 — the tokenizer family GPT-2/LLaMA-style training corpora
are measured in).

Spark-first scale layout — the property that makes this 100 TB-able:
training never iterates over the corpus.  ONE pass aggregates the corpus to
the DISTINCT-word frequency table (millions of rows at any corpus size —
word frequency follows Zipf, the vocabulary grows ~O(corpus^0.5)); every
merge round then works on that vocab table only: explode adjacent symbol
pairs weighted by word count (map-side partial agg), pick the argmax pair
(driver receives ONE row), apply the merge to the symbol arrays with an
`F.aggregate` left fold (JVM expression — greedy left-to-right application,
exactly Sennrich's algorithm, no Python in the loop).  The driver holds only
the learned merge list.  Encoding is embarrassingly parallel: an
Arrow-batched pandas UDF with the classic rank-priority merge loop and a
per-batch word cache (Zipf again: a batch's distinct words are far fewer
than its words).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.text_analysis import _BPE_ISH_PATTERN

# Sennrich's end-of-word marker: appended as its OWN symbol so the learner
# distinguishes word-final subwords ("er</w>" vs mid-word "er")
END = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", pattern: str = _BPE_ISH_PATTERN
) -> DataFrame:
    """(word, n): corpus word-frequency table under the BPE pre-tokenizer —
    the ONE corpus-sized pass of BPE training.  Case is preserved (subword
    vocabularies are case-sensitive)."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _chars_plus_end(word: Column) -> Column:
    """Initial symbol sequence: characters, then the end-of-word marker."""
    chars = F.filter(F.split(word, ""), lambda x: x != "")
    return F.concat(chars, F.array(F.lit(END)))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent-symbol pair frequencies over the vocab
    table, weighted by word count — map-side partial aggregation; the
    shuffle carries one row per distinct pair per task."""
    pairs = vocab.select(
        "n",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("symbols"), 1, F.size("symbols") - 1).alias("left"),
                F.slice(F.col("symbols"), 2, F.size("symbols") - 1).alias("right"),
            )
        ).alias("p"),
    )
    return (
        pairs.select("n", F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .groupBy("left", "right")
        .agg(F.sum("n").alias("cnt"))
    )


def _apply_merge(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of ONE merge to a symbol array, as a
    JVM-side left fold: if the accumulator's last symbol is ``left`` and the
    incoming one is ``right``, replace the last with the merged symbol, else
    append.  (Occurrences of a single (left, right) pair can only overlap
    when left == right, and the fold resolves exactly that case the way
    Sennrich's scan does: 'aaa' -> ['aa', 'a'].)"""
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def pair_candidates(
    docs: DataFrame, top_k: int = 20, text_col: str = "text"
) -> DataFrame:
    """(left, right, cnt): the top-``top_k`` first-round merge candidates —
    the exact argmax stream :func:`bpe_train` consumes, exposed for corpus
    diagnostics (and the oracle gate).  Total order (cnt desc, left, right)
    makes the cut deterministic; top-k compiles to TakeOrderedAndProject."""
    vocab = word_frequencies(docs, text_col).select(
        _chars_plus_end(F.col("word")).alias("symbols"), "n"
    )
    return (
        _pair_counts(vocab)
        .orderBy(F.col("cnt").desc(), F.col("left"), F.col("right"))
        .limit(top_k)
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list [(left, right, count), ...] — rank = list position, the
    entire trained state (the driver never holds corpus- or vocab-sized
    data).  Training stops early when no pair reaches ``min_pair_count``
    (merging hapax pairs memorizes the corpus instead of compressing it).

    Ties are broken (count desc, left asc, right asc) — deterministic in
    any engine, so equal corpora give byte-identical vocabularies (the
    restartable-build discipline of the dedup/walk family).

    Each round costs one pair-count aggregate + one fold projection over
    the VOCAB table (never the corpus); lineage is checkpoint-truncated
    every ``checkpoint_every`` rounds like the other iterative operators.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    vocab = (
        word_frequencies(docs, text_col)
        .select(_chars_plus_end(F.col("word")).alias("symbols"), "n")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for r in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((left, right, cnt))
        vocab = vocab.select(
            _apply_merge(F.col("symbols"), left, right).alias("symbols"), "n"
        )
        if (r + 1) % checkpoint_every == 0 and r + 1 < n_merges:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_vocabulary(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """(rank, left, right, merged, count): the merge list as a DataFrame —
    the persistable artifact ``bpe_encode`` consumes."""
    rows = [(i, l, r, l + r, c) for i, (l, r, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, count bigint"
    )


def encode_word(
    word: str, merges: list[tuple[str, str, int]], ranks: dict | None = None
) -> list[str]:
    """Tokenize ONE word with a learned merge list — the classic
    rank-priority loop (repeatedly merge every occurrence of the
    lowest-rank pair present).  Because a merge at rank k can only create
    symbols that later-learned merges consume, rank-priority application is
    equivalent to replaying training's rounds in order, so re-encoding a
    training word reproduces training's final symbol sequence.  Pure
    Python: the worker-side core of :func:`bpe_encode`, exposed for
    property tests."""
    if ranks is None:
        ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    syms = list(word) + [END]
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best is None or rk < best):
                best = rk
        if best is None:
            break
        l, r = merges[best][0], merges[best][1]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = _BPE_ISH_PATTERN,
) -> DataFrame:
    """(id, tokens array<string>, n_tokens): tokenize with a learned merge
    list — the classic rank-priority loop (repeatedly merge the
    lowest-rank pair present; identical to training's greedy application,
    so re-encoding the training corpus reproduces training's final symbol
    sequences).  Arrow-batched ``mapInPandas`` with a per-batch word cache;
    the merge ranks ride in the closure (n_merges entries — broadcast-sized
    by construction)."""
    import re as _re

    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    rx = pattern
    schema = f"{id_col} string, tokens array<string>, n_tokens long"
    src = docs.select(F.col(id_col).cast("string"), F.col(text_col))

    def run(batches):
        import pandas as pd

        # re.ASCII: Java regex \s (training, Spark-side) is ASCII-only,
        # Python's is Unicode — without the flag a NBSP-separated token that
        # training counted would silently vanish here, breaking the
        # encode-reproduces-training contract on real web text
        creg = _re.compile(rx, _re.ASCII)
        cache: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                got = cache[word] = encode_word(word, merges, ranks)
            return got

        for pdf in batches:
            toks = [
                [t for w in creg.findall(txt or "") for t in enc(w)]
                for txt in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return src.mapInPandas(run, schema)
