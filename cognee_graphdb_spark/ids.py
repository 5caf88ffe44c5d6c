"""Deterministic, content-addressed identifiers.

The reference derives every id from content so re-runs upsert instead of
duplicating:

- chunk ids:   ``uuid5(NAMESPACE_OID, chunk_text)``
  (reference: cognee/tasks/chunks/chunk_by_paragraph.py:45)
- summary ids: ``uuid5(chunk_id, "TextSummary")``
  (reference: cognee/tasks/summarization/summarize_text.py:58)
- data ids:    content hash + owner
  (reference: cognee/tasks/ingestion/ingest_data.py:93-96)
- node id/name normalization: lowercase + underscores
  (reference: cognee/modules/engine/utils/generate_node_id.py)

We use md5 instead of uuid5 so the DuckDB oracle can reproduce ids with its own
``md5()`` — the *determinism contract* is what matters, not the uuid5 bit layout.
Both Column-expression and plain-Python versions are provided; they agree.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Column expressions (JVM-side, codegen friendly)
# ---------------------------------------------------------------------------


def content_id(*parts: Column | str) -> Column:
    """md5 over '\\x1f'-joined parts — deterministic id for any record.

    Mirrors uuid5-style content addressing (chunk_by_paragraph.py:45) in a form
    both Spark (`md5`) and DuckDB (`md5`) compute identically.
    """
    cols = [c if isinstance(c, Column) else F.col(c) for c in parts]
    return F.md5(F.concat_ws("\x1f", *[c.cast("string") for c in cols]))


def node_id(table: Column | str, *keys: Column | str) -> Column:
    """Readable deterministic node id ``<table>:<k1>[:<k2>...]`` for migration
    nodes (composite primary keys supported, e.g. lineitem (orderkey, linenumber)).

    Reference builds row-node ids from table+pk (migrate_relational_database.py:18-74);
    a readable composite keeps the DuckDB oracle a plain string concat.
    """
    t = F.lit(table) if isinstance(table, str) else table
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return F.concat_ws(":", t.cast("string"), *[c.cast("string") for c in cols])


def normalize_name(col: Column | str) -> Column:
    """Lowercase, trim, collapse non-alphanumerics to '_'.

    Reference: generate_node_id/generate_node_name (lowercase + underscores),
    applied at expand_with_nodes_and_edges.py:101-104.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), "[^a-z0-9]+", "_")


# ---------------------------------------------------------------------------
# Python-side equivalents (for fixtures / golden tests)
# ---------------------------------------------------------------------------


def py_content_id(*parts: object) -> str:
    return hashlib.md5("\x1f".join(str(p) for p in parts).encode("utf-8")).hexdigest()


def py_node_id(table: str, *keys: object) -> str:
    return ":".join([table, *[str(k) for k in keys]])


def py_normalize_name(s: str) -> str:
    """Python twin of :func:`normalize_name` (same regex semantics; strips
    ASCII spaces only, matching Spark's ``trim``)."""
    import re

    return re.sub(r"[^a-z0-9]+", "_", s.lower().strip(" "))
