"""Deterministic hash embedder — the mock for V5 (LiteLLMEmbeddingEngine).

Feature-hashing bag of words: vec[h(token) % dim] += 1, L2-normalized.  Same
text ⇒ same vector on every engine and every run, so vector-search results are
oracle-checkable.  The Spark-side version is an Arrow-batched pandas UDF
(mapInPandas-compatible), never row-at-a-time.
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# token -> md5 bucket base, memoized: corpus tokens are Zipf-distributed, so
# the md5 of a frequent token would otherwise be recomputed once per
# occurrence per row.  Keyed pre-modulo so every dim shares one cache.
_BUCKET_CACHE: dict[str, int] = {}


def _bucket(token: str, dim: int) -> int:
    base = _BUCKET_CACHE.get(token)
    if base is None:
        if len(_BUCKET_CACHE) > 1_000_000:  # bound worker memory on huge vocabs
            # evict HALF instead of clearing: a vocabulary just over the
            # bound no longer causes periodic full-cache cold restarts —
            # Zipf-head tokens that do get evicted re-enter on their next
            # occurrence (one md5 each) while the surviving half stays warm
            for tok in list(_BUCKET_CACHE.keys())[: len(_BUCKET_CACHE) // 2]:
                del _BUCKET_CACHE[tok]
        base = _BUCKET_CACHE[token] = int.from_bytes(
            hashlib.md5(token.encode()).digest()[:4], "big"
        )
    return base % dim


@dataclass
class HashEmbedder:
    dim: int = 64

    def embed(self, text: str) -> list[float]:
        v = [0.0] * self.dim
        for tok in _TOKEN_RE.findall(text.lower()):
            v[_bucket(tok, self.dim)] += 1.0
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else v

    def embed_batch(self, texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: self.embed(t or ""))


def embed_column(text_col: Column | str, dim: int = 64, embedder=None) -> Column:
    """Arrow-batched pandas UDF producing array<float> embeddings.

    ``embedder`` is any picklable object with ``embed_batch(pd.Series) ->
    pd.Series[list[float]]`` — the deterministic :class:`HashEmbedder` by
    default, or :class:`~cognee_graphdb_spark.llm.http_gateway.HttpEmbedder`
    for a real endpoint (which coalesces each Arrow batch into
    ``batch_size``-sized HTTP requests worker-side)."""
    embedder = embedder or HashEmbedder(dim)

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return embedder.embed_batch(texts)

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _embed(c)
