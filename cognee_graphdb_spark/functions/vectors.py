"""Vector math as Catalyst expressions.

The reference's vector search delegates distance to LanceDB/pgvector/Chroma
(vector_db_interface.py:80-105).  Here cosine distance is an expression over
``array<float>`` columns: ``zip_with`` + ``aggregate`` stay inside codegen and
vectorize per-row with no Python boundary — this is the exact-brute-force
"index scan" path the reference semantics require
(brute_force_triplet_search.py:143 scans with limit=None).

DuckDB oracle equivalence: ``list_cosine_similarity(a, b)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double_array(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise product + left-fold sum (same accumulation order as DuckDB)."""
    return F.aggregate(
        F.zip_with(_as_double_array(a), _as_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


def minmax_normalize(score: Column | str, partition_by: list[str] | None = None) -> Column:
    """Rescale a score column to [0,1] within its result set (window min/max).

    Reference: cognee/infrastructure/databases/vector/utils.py:4-35 —
    normalize_distances; the all-equal degenerate case maps to 0.0
    (utils.py:27-29).
    """
    c = F.col(score) if isinstance(score, str) else score
    w = Window.partitionBy(*(partition_by or []))
    lo, hi = F.min(c).over(w), F.max(c).over(w)
    return F.when(hi == lo, F.lit(0.0)).otherwise((c - lo) / (hi - lo))
