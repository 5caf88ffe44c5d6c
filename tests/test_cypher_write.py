"""Write-Cypher subset executor (plans/cypher_write.py) — the three shapes
the reference's adapters issue internally (kuzu/adapter.py:428-442 node
MERGE, :711-725 edge MERGE, :737-755 DETACH DELETE), run verbatim against a
GraphStore."""

import pytest

from cognee_graphdb_spark.plans.cypher import CypherUnsupported
from cognee_graphdb_spark.plans.cypher_write import run_cypher_write
from cognee_graphdb_spark.sources.sinks import GraphStore

# the reference's batch node-merge query, verbatim (kuzu/adapter.py:428-442)
NODE_MERGE = """
UNWIND $nodes AS node
MERGE (n:Node {id: node.id})
ON CREATE SET
    n.name = node.name,
    n.type = node.type,
    n.properties = node.properties,
    n.created_at = timestamp(node.created_at),
    n.updated_at = timestamp(node.updated_at)
ON MATCH SET
    n.name = node.name,
    n.type = node.type,
    n.properties = node.properties,
    n.updated_at = timestamp(node.updated_at)
"""

# the reference's batch edge-merge query, verbatim (kuzu/adapter.py:711-725)
EDGE_MERGE = """
UNWIND $edges AS edge
MATCH (from:Node), (to:Node)
WHERE from.id = edge.from_id AND to.id = edge.to_id
MERGE (from)-[r:EDGE {
    relationship_name: edge.relationship_name
}]->(to)
ON CREATE SET
    r.created_at = timestamp(edge.created_at),
    r.updated_at = timestamp(edge.updated_at),
    r.properties = edge.properties
ON MATCH SET
    r.updated_at = timestamp(edge.updated_at),
    r.properties = edge.properties
"""


def _node(i, name, type_, **props):
    import json

    return {"id": i, "name": name, "type": type_, "properties": json.dumps(props),
            "created_at": "2024-01-01", "updated_at": "2024-01-01"}


@pytest.fixture()
def store(spark, tmp_path):
    return GraphStore(spark, str(tmp_path / "cw"))


def test_reference_node_merge_batch(store):
    out = run_cypher_write(
        store, NODE_MERGE,
        {"nodes": [_node("a", "Alice", "Person", city="berlin"), _node("b", "Bob", "Person")]},
    )
    assert out == {"nodes_upserted": 2}
    got = {r["id"]: r for r in store.load("nodes").collect()}
    assert got["a"]["name"] == "Alice" and got["a"]["properties"]["city"] == "berlin"
    # ON MATCH path: re-merge updates in place, no duplicate rows
    run_cypher_write(store, NODE_MERGE, {"nodes": [_node("a", "Alicia", "Person")]})
    nodes = store.load("nodes")
    assert nodes.count() == 2
    assert {r["name"] for r in nodes.collect()} == {"Alicia", "Bob"}


def test_reference_edge_merge_matches_endpoints_only(store):
    run_cypher_write(
        store, NODE_MERGE, {"nodes": [_node("a", "A", "T"), _node("b", "B", "T")]}
    )
    edges = [
        {"from_id": "a", "to_id": "b", "relationship_name": "likes",
         "properties": "{}", "created_at": "x", "updated_at": "x"},
        # missing endpoint: MATCH semantics drop it, exactly like the reference query
        {"from_id": "a", "to_id": "ghost", "relationship_name": "likes",
         "properties": "{}", "created_at": "x", "updated_at": "x"},
    ]
    out = run_cypher_write(store, EDGE_MERGE, {"edges": edges})
    assert out == {"edges_upserted": 1}
    [e] = store.load("edges").collect()
    assert (e["src"], e["dst"], e["relationship_name"]) == ("a", "b", "likes")
    # idempotent re-merge: still one edge
    run_cypher_write(store, EDGE_MERGE, {"edges": edges})
    assert store.load("edges").count() == 1


def test_reference_detach_delete(store):
    run_cypher_write(
        store, NODE_MERGE, {"nodes": [_node("a", "A", "T"), _node("b", "B", "T"), _node("c", "C", "T")]}
    )
    run_cypher_write(store, EDGE_MERGE, {"edges": [
        {"from_id": "a", "to_id": "b", "relationship_name": "r", "properties": "{}",
         "created_at": "x", "updated_at": "x"}]})
    # single delete (adapter.py:737)
    out = run_cypher_write(store, "MATCH (n:Node) WHERE n.id = $id DETACH DELETE n", {"id": "b"})
    assert out == {"nodes_deleted": 1}
    assert {r["id"] for r in store.load("nodes").collect()} == {"a", "c"}
    assert store.load("edges").count() == 0  # DETACH removed the incident edge
    # batch delete (adapter.py:755)
    out = run_cypher_write(store, "MATCH (n:Node) WHERE n.id IN $ids DETACH DELETE n", {"ids": ["a", "c"]})
    assert out == {"nodes_deleted": 2}
    assert store.load("nodes").count() == 0


def test_plain_create_and_typed_edge(store):
    run_cypher_write(store, "CREATE (n:City {id: 'x', name: 'Xi'})")
    run_cypher_write(store, "MERGE (n:City {id: 'y', name: 'Ypsilon'})")
    got = {r["id"]: (r["name"], r["type"]) for r in store.load("nodes").collect()}
    assert got == {"x": ("Xi", "City"), "y": ("Ypsilon", "City")}
    # typed relationship pattern names the edge when no property map does
    out = run_cypher_write(
        store,
        "MATCH (a:City), (b:City) WHERE a.id = $s AND b.id = $t MERGE (a)-[r:near]->(b)",
        {"s": "x", "t": "y"},
    )
    assert out == {"edges_upserted": 1}
    [e] = store.load("edges").collect()
    assert e["relationship_name"] == "near"


def test_unsupported_write_shapes_raise(store):
    for bad in (
        "MATCH (n) RETURN n",  # not a write
        "UNWIND $xs AS x CREATE (n {name: x.name})",  # no id
        "MATCH (n) SET n.name = 'y'",  # bare SET statement is not in the subset
        "CREATE (n:T {id: 'a'}) CREATE (m:T {id: 'b'})",  # trailing clause: no silent truncation
        "CREATE (n:T {id: 'a'}) RETURN n",  # trailing RETURN
    ):
        with pytest.raises(CypherUnsupported):
            run_cypher_write(store, bad, {"xs": [{"name": "a"}]})


def test_empty_batches_and_accurate_counts(store):
    # empty UNWIND / empty id list: zero counts, no schema-inference crash
    assert run_cypher_write(store, NODE_MERGE, {"nodes": []}) == {"nodes_upserted": 0}
    out = run_cypher_write(store, "MATCH (n:Node) WHERE n.id IN $ids DETACH DELETE n", {"ids": []})
    assert out == {"nodes_deleted": 0}
    # deleting ids that do not exist reports 0, not the requested-list size
    run_cypher_write(store, "CREATE (n:T {id: 'real'})")
    out = run_cypher_write(
        store, "MATCH (n:Node) WHERE n.id IN $ids DETACH DELETE n", {"ids": ["nope1", "nope2"]}
    )
    assert out == {"nodes_deleted": 0}
    assert store.load("nodes").count() == 1


def test_keyword_colliding_relationship_name_roundtrip(store):
    # 'contains' tokenizes as a keyword; the write parser must preserve the
    # raw spelling so a read query matches what was written
    run_cypher_write(store, "CREATE (n:T {id: 'a'})")
    run_cypher_write(store, "CREATE (n:T {id: 'b'})")
    run_cypher_write(
        store,
        "MATCH (a), (b) WHERE a.id = $s AND b.id = $t MERGE (a)-[r:contains]->(b)",
        {"s": "a", "t": "b"},
    )
    [e] = store.load("edges").collect()
    assert e["relationship_name"] == "contains"


def test_dataset_scoped_write_and_delete(spark, tmp_path):
    # same content-addressed id in two datasets: a write/delete through one
    # engine must not clobber the other tenant's row (sinks merge key adds
    # dataset_id; delete is dataset-scoped)
    from cognee_graphdb_spark.api import CogneeSpark

    root = str(tmp_path / "dsw")
    d1 = CogneeSpark(spark, root, dataset_id="d1")
    d2 = CogneeSpark(spark, root, dataset_id="d2")
    d1.cypher_write("CREATE (n:T {id: 'x', name: 'from-d1'})")
    d2.cypher_write("CREATE (n:T {id: 'x', name: 'from-d2'})")
    nodes = d1.store.load("nodes")
    assert nodes.count() == 2  # one row per dataset
    d1.cypher_write("MATCH (n) WHERE n.id = $id DETACH DELETE n", {"id": "x"})
    remaining = d1.store.load("nodes").collect()
    assert [(r["name"], r["dataset_id"]) for r in remaining] == [("from-d2", "d2")]


def test_permission_class_survives_comments(spark, tmp_path):
    # a line comment between DETACH and DELETE must not downgrade the
    # required permission (classification uses the token stream)
    from cognee_graphdb_spark.api import CogneeSpark

    e = CogneeSpark(spark, str(tmp_path / "pcc"))
    e.permissions.give_permission("eve", "main_dataset", "write")
    e.cypher_write("CREATE (n:T {id: 'a'})", user_id="eve")
    with pytest.raises(PermissionError, match="'delete'"):
        e.cypher_write("MATCH (n) WHERE n.id = $id DETACH // x\nDELETE n", {"id": "a"}, user_id="eve")


def test_write_then_read_roundtrip(spark, tmp_path):
    # a store populated ONLY through cypher_write is readable via the CYPHER
    # search type (no vector index exists yet; graph-only reads must work)
    from cognee_graphdb_spark.api import CogneeSpark

    e = CogneeSpark(spark, str(tmp_path / "cwrt"))
    e.cypher_write(NODE_MERGE, {"nodes": [_node("a", "A", "T"), _node("b", "B", "T")]})
    e.cypher_write(EDGE_MERGE, {"edges": [
        {"from_id": "a", "to_id": "b", "relationship_name": "likes", "properties": "{}",
         "created_at": "x", "updated_at": "x"}]})
    [row] = e.search("CYPHER", "MATCH (a)-[r:likes]->(b) RETURN a.name AS a, b.name AS b").collect()
    assert (row["a"], row["b"]) == ("A", "B")
    # vector search over the index-less store returns empty, not an error
    assert e.search("CHUNKS", "anything").count() == 0


def test_api_cypher_write_permission_gated(spark, tmp_path):
    from cognee_graphdb_spark.api import CogneeSpark

    e = CogneeSpark(spark, str(tmp_path / "cwapi"))
    with pytest.raises(PermissionError, match="'write'"):
        e.cypher_write("CREATE (n:T {id: 'a', name: 'A'})", user_id="eve")
    e.permissions.give_permission("eve", "main_dataset", "write")
    assert e.cypher_write("CREATE (n:T {id: 'a', name: 'A'})", user_id="eve") == {"nodes_upserted": 1}
    with pytest.raises(PermissionError, match="'delete'"):
        e.cypher_write("MATCH (n) WHERE n.id = $id DETACH DELETE n", {"id": "a"}, user_id="eve")
    e.permissions.give_permission("eve", "main_dataset", "delete")
    out = e.cypher_write("MATCH (n) WHERE n.id = $id DETACH DELETE n", {"id": "a"}, user_id="eve")
    assert out == {"nodes_deleted": 1}


def test_bare_merge_on_existing_node_is_non_destructive(store):
    # openCypher MERGE-match must not overwrite fields it doesn't assign:
    # a bare MERGE on an existing id keeps name/type/properties intact
    run_cypher_write(store, NODE_MERGE, {"nodes": [_node("a", "Alice", "Person", city="berlin")]})
    out = run_cypher_write(store, "MERGE (n:Node {id: 'a'})")
    assert out == {"nodes_upserted": 1}
    [row] = store.load("nodes").collect()
    assert row["name"] == "Alice" and row["type"] == "Person"
    assert row["properties"]["city"] == "berlin"


def test_set_outside_schema_folds_into_properties(store):
    run_cypher_write(store, "CREATE (n:Person {id: 'a', name: 'A'})")
    # unknown SET field -> properties map, not silently discarded
    run_cypher_write(store, "MERGE (n:Node {id: 'a'}) SET n.score = 5")
    [row] = store.load("nodes").collect()
    assert row["properties"]["score"] == "5"
    assert row["name"] == "A"  # untouched fields preserved
    # SET n.x = NULL removes the key (openCypher remove-via-null)
    run_cypher_write(store, "MERGE (n:Node {id: 'a'}) SET n.score = NULL, n.lang = 'de'")
    [row] = store.load("nodes").collect()
    assert "score" not in row["properties"] and row["properties"]["lang"] == "de"


def test_reference_created_at_lands_in_properties(store):
    # the reference's own merge shape SETs created_at/updated_at — they must
    # survive as properties, not vanish while counts report success
    run_cypher_write(store, NODE_MERGE, {"nodes": [_node("a", "Alice", "Person")]})
    [row] = store.load("nodes").collect()
    assert row["properties"]["created_at"] == "2024-01-01"
    assert row["properties"]["updated_at"] == "2024-01-01"


def test_edge_rel_map_extras_and_preservation(store):
    run_cypher_write(store, "CREATE (n:T {id: 'a'})")
    run_cypher_write(store, "CREATE (n:T {id: 'b'})")
    # rel-pattern keys beyond relationship_name fold into edge properties
    out = run_cypher_write(
        store,
        "MATCH (a:Node), (b:Node) WHERE a.id = 'a' AND b.id = 'b' "
        "MERGE (a)-[r:EDGE {relationship_name: 'likes', weight: 1}]->(b)",
    )
    assert out == {"edges_upserted": 1}
    [e] = store.load("edges").collect()
    assert e["properties"]["weight"] == "1"
    # matched edge MERGE without a properties assignment preserves stored
    # props and overlays only the extra SET field
    run_cypher_write(
        store,
        "MATCH (a:Node), (b:Node) WHERE a.id = 'a' AND b.id = 'b' "
        "MERGE (a)-[r:likes]->(b) SET r.confirmed = TRUE",
    )
    [e] = store.load("edges").collect()
    assert e["properties"]["weight"] == "1"
    assert e["properties"]["confirmed"] == "True"


def test_unwind_replays_sequentially_per_field(store):
    # two UNWIND elements hitting the same id: the second matches the row the
    # first wrote, so fields accumulate per-field instead of replacing rows
    run_cypher_write(
        store,
        "UNWIND $nodes AS node MERGE (n:Node {id: node.id}) SET n.k = node.k",
        {"nodes": [{"id": "a", "k": "v1"}, {"id": "a", "k": "v2"}]},
    )
    [row] = store.load("nodes").collect()
    assert row["properties"]["k"] == "v2"
