"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's operator set: language-ID, quality scoring, token
counting, document fingerprinting — each a pure-expression plan over the
``documents`` table (no Python in the hot path), designed so a DuckDB oracle
can restate it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cognee_graphdb_spark.functions.text import STOP_WORDS, tokenize

# tiny marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "los", "que", "es"),
}


def token_count(text: Column | str) -> Column:
    """Whitespace-ish token count (reference fallback: 1 token per word,
    chunk_by_sentence.py:7-29)."""
    return F.size(tokenize(text))


# BPE-ish pre-tokenizer: the GPT-2 style split pattern family — contractions,
# letter runs, digit runs, punctuation runs, whitespace runs.  A cheap LLM
# token-count proxy that needs no vocab file; counts pieces, each of which a
# real BPE would then merge-split further (so this lower-bounds token count
# with a stable, oracle-reproducible rule).
_BPE_ISH_PATTERN = "'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"


def bpe_ish_token_count(text: Column | str) -> Column:
    """Count BPE-ish pieces via regexp extraction — pure expression
    (regexp_extract_all stays in codegen; no Python tokenizer in the hot path)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_ISH_PATTERN), 0))


def word_char_count(toks):
    """Total characters across tokens — shared by quality_features and the
    learned quality model's features (ONE definition, or they desync)."""
    return F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))


def stopword_count(toks, stop_words=STOP_WORDS):
    """Stopword INSTANCES (multiset) in the token stream — shared likewise."""
    sw = F.array(*[F.lit(w) for w in sorted(stop_words)])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality scoring features: length, word count, mean word length,
    punctuation ratio, stopword ratio — the standard cheap quality signals."""
    toks = tokenize(F.col(text_col))
    n_words = F.size(toks)
    n_chars = F.length(F.col(text_col))
    word_chars = word_char_count(toks)
    n_stop = stopword_count(toks)
    non_alnum = n_chars - F.length(F.regexp_replace(F.lower(F.col(text_col)), "[a-z0-9]", ""))
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(word_chars.cast("double") / F.greatest(n_words, F.lit(1)), 4).alias("mean_word_len"),
        F.round((n_chars - non_alnum).cast("double") / F.greatest(n_chars, F.lit(1)), 4).alias("non_alnum_ratio"),
        F.round(n_stop.cast("double") / F.greatest(n_words, F.lit(1)), 4).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-stopword language heuristic: pick the language whose marker words
    occur most often.  Zero-evidence texts get 'und' (undetermined); ties
    resolve to the alphabetically-first language (deterministic, so the DuckDB
    oracle can restate it)."""
    toks = tokenize(F.col(text_col))
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        m = F.array(*[F.lit(w) for w in markers])
        scores.append((lang, F.size(F.filter(toks, lambda t: F.array_contains(m, t)))))
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # reverse order so earlier (alphabetical) languages win ties
    for lang, s in reversed(scores):
        pred = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(pred)
    return df.select(id_col, pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of the normalized token stream — whitespace/
    punctuation-insensitive content identity (cheap near-exact dedup key)."""
    fp = F.md5(F.concat_ws(" ", tokenize(F.col(text_col))))
    return df.select(id_col, fp.alias("fingerprint"))


def term_cooccurrence(
    df: DataFrame,
    window: int = 4,
    min_pair_count: int = 2,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(t1, t2, n_pairs, lift, pmi): windowed term co-occurrence with PMI —
    the statistic embedding-training pipelines (word2vec/GloVe-style) and
    collocation mining consume.

    Terms are :func:`~cognee_graphdb_spark.functions.text.tokenize` tokens
    with stopwords removed, positions re-indexed on the FILTERED stream (so
    "the big red dog" pairs big-red at distance 1).  An unordered pair is
    counted once per co-occurrence within ``window`` positions; self-pairs
    (repeated term) are excluded.  ``lift`` = c(a,b) * N / (m(a) * m(b)) over
    pair-multiset marginals — pure integer products and ONE correctly-rounded
    IEEE division, so it crosses engines bit-identically (ppm-quantizable by
    an oracle); ``pmi`` = ln(lift) for human use (ln is not guaranteed
    correctly rounded across engines, so oracles should hash lift, not pmi).

    Scale: positions explode linearly (one row per kept token); the pair
    stage is a self-equi-join on doc_id with a band predicate that fans out
    at most ``window`` per token — never quadratic in document length.
    ``max_df`` drops terms present in more than that many documents BEFORE
    pairing (the hot-token cap: corpus-wide terms otherwise dominate the
    shuffle exactly like the jaccard max_df cap in dedup.py).  N and the
    marginals are one partial-agg pass each; N joins back as a 1-row
    broadcast.
    """
    from cognee_graphdb_spark.functions.text import filter_stopwords

    if window < 1:
        raise ValueError("window must be >= 1")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(filter_stopwords(tokenize(F.col(text_col)))).alias("pos", "term"),
    )
    if max_df is not None:
        keep = (
            toks.groupBy("term")
            .agg(F.count_distinct("doc_id").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("term")
        )
        toks = toks.join(keep, "term", "left_semi")
    a = toks.select("doc_id", F.col("pos").alias("pa"), F.col("term").alias("ta"))
    b = toks.select("doc_id", F.col("pos").alias("pb"), F.col("term").alias("tb"))
    pairs = (
        a.join(b, "doc_id")
        .filter(
            (F.col("pb") - F.col("pa") >= 1)
            & (F.col("pb") - F.col("pa") <= window)
            & (F.col("ta") != F.col("tb"))
        )
        .groupBy(
            F.least("ta", "tb").alias("t1"), F.greatest("ta", "tb").alias("t2")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    total = pairs.agg(F.sum("n_pairs").alias("n_total"))
    marg = (
        pairs.select(F.col("t1").alias("term"), "n_pairs")
        .unionByName(pairs.select(F.col("t2").alias("term"), "n_pairs"))
        .groupBy("term")
        .agg(F.sum("n_pairs").alias("m"))
    )
    lift = (
        F.col("n_pairs").cast("double") * F.col("n_total").cast("double")
    ) / (F.col("m1").cast("double") * F.col("m2").cast("double"))
    return (
        pairs.filter(F.col("n_pairs") >= min_pair_count)
        .crossJoin(F.broadcast(total))
        .join(marg.select(F.col("term").alias("t1"), F.col("m").alias("m1")), "t1")
        .join(marg.select(F.col("term").alias("t2"), F.col("m").alias("m2")), "t2")
        .select(
            "t1",
            "t2",
            "n_pairs",
            lift.alias("lift"),
            F.log(lift).alias("pmi"),
        )
    )
