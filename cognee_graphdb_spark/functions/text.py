"""Text expressions: tokenization, stopwords, n-grams, fingerprints.

Tokenization contract (shared with every DuckDB oracle): lowercase, split on
runs of non-alphanumerics, drop empty tokens.  This mirrors the reference's
``\\w+``-style lexical tokenization (jaccard_retrival.py:38-44) while staying
expressible identically in Spark (`split`) and DuckDB (`regexp_split_to_array`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Compact English stopword list (standard public list; role mirrors
# cognee/modules/retrieval/utils/stop_words.py which the lexical/top-words
# operators filter against).  Kept short so oracle SQL can inline it.
STOP_WORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "has", "have", "he", "in", "is", "it", "its", "of", "on", "or", "that",
    "the", "this", "to", "was", "were", "will", "with",
)

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(c: Column | str) -> Column:
    """lower → split on non-alphanumerics → drop empties. array<string>."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


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
    """Title synthesis: first n whitespace words re-joined.

    Reference: resolve_edges_to_text.py:20-45 (first-7-words title).
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.concat_ws(" ", F.slice(F.split(F.trim(col), "\\s+"), 1, n))
