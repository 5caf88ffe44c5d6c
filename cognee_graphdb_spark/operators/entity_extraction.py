"""Deterministic regex entity extraction (reference: tasks/entity_completion/
entity_extractors/regex_entity_extractor.py:36-60 + regex_entity_config.json).

The reference walks each configured entity type and runs ``pattern.finditer``
over the text in Python, one document at a time.  Spark-first this is a pure
Catalyst plan: ``regexp_extract_all`` (JVM, codegen) per entity type, exploded
to one row per match — no Python boundary at all, and the regex scan
parallelizes with the document scan.  Patterns are RE2-compatible so the
DuckDB oracle can replay them with its own ``regexp_extract_all``.

Output mirrors the reference Entity payload: (doc_id, entity_type, name,
description) with the reference's description templates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Entity types ported from the reference's public regex_entity_config.json —
# kept to the dialect-stable subset (no lookaround) so Spark (Java regex) and
# DuckDB (RE2) agree match-for-match.
REGEX_ENTITY_CONFIG: tuple[tuple[str, str, str], ...] = (
    ("EMAIL", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "Email address: {}"),
    ("URL", r"https?://(www\.)?[a-zA-Z0-9-]+(\.[a-zA-Z]{2,})+(/\S*)?", "URL: {}"),
    ("DATE", r"(\d{4}[-/]\d{2}[-/]\d{2})|(\d{2}[-/]\d{2}[-/]\d{4})", "Date: {}"),
    ("TIME", r"(1[0-2]|0?[1-9]):[0-5][0-9](\s?[APap][Mm])?|([01]?[0-9]|2[0-3]):[0-5][0-9]", "Time: {}"),
    ("MONEY", r"\$\d{1,3}(,\d{3})*(\.[0-9]{2})?", "Monetary amount: {}"),
)


def regex_entities(
    df: DataFrame,
    types: tuple[str, ...] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    config: tuple[tuple[str, str, str], ...] = REGEX_ENTITY_CONFIG,
) -> DataFrame:
    """One row per (document, entity type, match): the reference's
    ``_extract_entities_by_type`` loop as a union of codegen regex scans.

    Matches keep the reference's semantics: all non-overlapping matches per
    type in document order, duplicates preserved (finditer yields every
    occurrence).  ``config`` mirrors the reference's custom ``config_path``
    (RegexEntityExtractor.__init__): (entity_name, regex, description_template)
    triples.
    """
    chosen = [c for c in config if types is None or c[0] in types]
    parts = []
    for name, pattern, template in chosen:
        prefix, suffix = template.split("{}")
        parts.append(
            df.select(
                F.col(id_col).cast("string").alias("doc_id"),
                F.lit(name).alias("entity_type"),
                F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)).alias("name"),
            ).select(
                "doc_id",
                "entity_type",
                "name",
                F.concat(F.lit(prefix), F.col("name"), F.lit(suffix)).alias("description"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def entity_completion_graph(
    df: DataFrame,
    types: tuple[str, ...] | None = None,
    config: tuple[tuple[str, str, str], ...] = REGEX_ENTITY_CONFIG,
) -> tuple[DataFrame, DataFrame]:
    """Entity / EntityType nodes + is_a edges from regex extraction — the
    entity_completion task's graph shape (reference Entity model:
    modules/engine/models; extractor `_create_entity`)."""
    from cognee_graphdb_spark.ids import content_id, normalize_name

    ents = regex_entities(df, types=types, config=config)
    entity_nodes = ents.select(
        content_id(F.lit("Entity"), normalize_name("name")).alias("id"),
        normalize_name("name").alias("name"),
        F.lit("Entity").alias("type"),
    ).dropDuplicates(["id"])
    type_nodes = ents.select(
        content_id(F.lit("EntityType"), "entity_type").alias("id"),
        F.col("entity_type").alias("name"),
        F.lit("EntityType").alias("type"),
    ).dropDuplicates(["id"])
    edges = ents.select(
        content_id(F.lit("Entity"), normalize_name("name")).alias("src"),
        content_id(F.lit("EntityType"), "entity_type").alias("dst"),
        F.lit("is_a").alias("relationship_name"),
    ).dropDuplicates(["src", "dst", "relationship_name"])
    return entity_nodes.unionByName(type_nodes), edges
