"""Text expressions: tokenization, stopwords, n-grams, fingerprints.

Tokenization contract (shared with every DuckDB oracle): lowercase, split on
runs of non-alphanumerics, drop empty tokens.  This mirrors the reference's
``\\w+``-style lexical tokenization (jaccard_retrival.py:38-44) while staying
expressible identically in Spark (`split`) and DuckDB (`regexp_split_to_array`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's full English stopword list, ported verbatim (a standard
# public list — cognee/modules/retrieval/utils/stop_words.py DEFAULT_STOP_WORDS).
# Top-words (A5) and lexical retrieval filter against exactly this set so their
# answers match the reference's.
STOP_WORDS: tuple[str, ...] = (
    "a", "an", "the", "and", "or", "but", "is", "are", "was", "were", "in",
    "on", "at", "to", "for", "with", "by", "about", "of", "from", "as",
    "that", "this", "these", "those", "it", "its", "them", "they", "their",
    "he", "she", "his", "her", "him", "we", "our", "you", "your", "not",
    "be", "been", "being", "have", "has", "had", "do", "does", "did", "can",
    "could", "will", "would", "shall", "should", "may", "might", "must",
    "when", "where", "which", "who", "whom", "whose", "why", "how",
)

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Unicode letters/digits — the multilingual variant.  \p{L}\p{N} parse
# identically in Java regex (Spark) and RE2 (DuckDB oracle), verified on
# CJK + accented text.
UNICODE_TOKEN_SPLIT_RE = r"[^\p{L}\p{N}]+"


def tokenize(c: Column | str) -> Column:
    """lower → split on non-alphanumerics → drop empties. array<string>.

    ASCII-only by design (matches the reference's [a-zA-Z0-9] word regex,
    chunk_by_word.py) — CJK/accented text becomes separators.  Corpus ops on
    multilingual data should use :func:`tokenize_unicode`."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


def tokenize_unicode(c: Column | str) -> Column:
    """lower → split on non-(letter|digit) under Unicode classes → drop
    empties.  The multilingual tokenizer for corpus stats/dedup: keeps CJK,
    accents, any script with letter category."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(F.lower(col), UNICODE_TOKEN_SPLIT_RE), lambda t: t != "")


def filter_stopwords(tokens: Column) -> Column:
    """Remove stopwords, preserving duplicates and order (multiset-safe —
    array_except would dedup, which breaks multiset Jaccard / top-n counts)."""
    sw = F.array(*[F.lit(w) for w in STOP_WORDS])
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def char_ngrams(c: Column | str, n: int) -> Column:
    """Character n-grams of the lowercased string (for n-gram Jaccard dedup)."""
    col = F.lower(F.col(c) if isinstance(c, str) else c)
    # guard: sequence(1, 0) would produce a DESCENDING sequence, not empty
    return F.when(F.length(col) < n, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.length(col) - (n - 1)), lambda i: col.substr(i, F.lit(n)))
    )


def word_shingles(tokens: Column, k: int) -> Column:
    """k-word shingles joined by space (MinHash input)."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
    return F.when(n < k, F.array()).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)))
    )


def first_n_words_title(text: Column | str, n: int = 7) -> Column:
    """First n whitespace words re-joined (the title's prefix half).

    Reference: resolve_edges_to_text.py:20-45.
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.concat_ws(" ", F.slice(F.filter(F.split(F.trim(col), "\\s+"), lambda w: w != ""), 1, n))


# string.punctuation, escaped for a regex char class (valid in both Java regex
# and RE2, so Spark and the DuckDB oracle strip identically)
_PUNCT_CLASS = "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]"


def title_words(text: Column | str) -> Column:
    """The word stream _top_n_words counts: whitespace-split, lowercased,
    punctuation stripped from both ends, empties and stopwords dropped
    (resolve_edges_to_text.py:22-39)."""
    col = F.col(text) if isinstance(text, str) else text
    words = F.transform(
        F.split(F.trim(col), "\\s+"),
        lambda w: F.regexp_replace(F.lower(w), f"^{_PUNCT_CLASS}+|{_PUNCT_CLASS}+$", ""),
    )
    sw = F.array(*[F.lit(w) for w in STOP_WORDS])
    return F.filter(words, lambda w: (w != "") & ~F.array_contains(sw, w))


def top_n_words_expr(text: Column | str, n: int) -> Column:
    """Counter.most_common(n) over title_words, joined by ', '.

    Most-common tie-break = first occurrence order (Counter semantics).
    Implemented as a pure expression: sort structs (-count, first_pos, token) —
    default struct ordering reproduces count-desc then insertion order, and
    DuckDB's list_sort orders structs the same way.
    """
    toks = title_words(text)
    stats = F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            (-F.size(F.filter(toks, lambda x: x == t))).alias("negcnt"),
            F.array_position(toks, t).alias("pos"),
            t.alias("tok"),
        ),
    )
    return F.concat_ws(", ", F.transform(F.slice(F.array_sort(stats), 1, n), lambda s: s["tok"]))


def title_with_top_words(text: Column | str, first_n: int = 7) -> Column:
    """F10 — '<first 7 words>... [<top words>]' title synthesis.

    Reference: resolve_edges_to_text.py:41-45; note the reference passes
    top_n=first_n_words (7), not 3 — reproduced faithfully.
    """
    return F.concat(
        first_n_words_title(text, first_n),
        F.lit("... ["),
        top_n_words_expr(text, first_n),
        F.lit("]"),
    )
