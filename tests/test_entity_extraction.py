"""Regex entity extraction (reference regex_entity_extractor.py) — match
semantics against Python re.finditer, the reference's own engine."""

import re

from cognee_graphdb_spark.operators.entity_extraction import (
    REGEX_ENTITY_CONFIG,
    entity_completion_graph,
    regex_entities,
)

TEXTS = [
    (1, "Contact bob@example.com or visit https://spark.apache.org/docs at 10:30 AM."),
    (2, "Paid $1,234.56 on 2024-01-15; follow-up 02/03/2024 via alice@test.io."),
    (3, "no entities here, just plain words"),
]


def _docs(spark):
    return spark.createDataFrame(TEXTS, ["doc_id", "text"])


def test_matches_python_finditer(spark):
    out = regex_entities(_docs(spark)).collect()
    got = {(r["doc_id"], r["entity_type"], r["name"]) for r in out}
    expected = set()
    for doc_id, text in TEXTS:
        for name, pattern, _tmpl in REGEX_ENTITY_CONFIG:
            for m in re.finditer(pattern, text):
                expected.add((str(doc_id), name, m.group(0)))
    assert got == expected
    assert any(t == "EMAIL" for _, t, _n in got)
    assert any(t == "MONEY" for _, t, _n in got)


def test_description_template(spark):
    out = regex_entities(_docs(spark), types=("EMAIL",)).collect()
    assert {r["description"] for r in out} == {
        "Email address: bob@example.com",
        "Email address: alice@test.io",
    }


def test_entity_completion_graph_shape(spark):
    nodes, edges = entity_completion_graph(_docs(spark))
    n = nodes.collect()
    types = {r["type"] for r in n}
    assert types == {"Entity", "EntityType"}
    # every edge is Entity -is_a-> EntityType and endpoints exist
    ids = {r["id"] for r in n}
    for e in edges.collect():
        assert e["relationship_name"] == "is_a"
        assert e["src"] in ids and e["dst"] in ids
    # dedup: the same email in two docs collapses to one Entity node
    more = _docs(spark).union(_docs(spark).limit(1))
    nodes2, _ = entity_completion_graph(more)
    assert nodes2.count() == nodes.count()
