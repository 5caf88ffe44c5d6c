"""Cypher-subset translator tests (plans/cypher.py).

Query shapes mirror the reference's own Cypher usage:
kuzu/adapter.py:146,150,322,478 (counts, id filters),
examples/low_level/product_recommendation.py:129-160 (typed hops, inline
property maps, OPTIONAL MATCH).
"""

import pytest

from cognee_graphdb_spark.plans.cypher import (
    CypherUnsupported,
    cypher_to_sql,
    looks_like_cypher,
    run_cypher,
)


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("c1", "alice", "Customer", {"city": "berlin"}),
            ("c2", "bob", "Customer", {"city": "paris"}),
            ("p1", "boots", "Product", {}),
            ("p2", "sandals", "Product", {}),
            ("pref1", "ShoeSize", "Preference", {"value": "42"}),
        ],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("c1", "p1", "purchased"),
            ("c1", "p2", "purchased"),
            ("c2", "p1", "purchased"),
            ("c1", "pref1", "has_preference"),
        ],
        "src string, dst string, relationship_name string",
    )
    return nodes, edges


def rows(spark, graph, q, params=None):
    nodes, edges = graph
    return run_cypher(spark, nodes, edges, q, params).collect()


def test_count_all_nodes(spark, graph):
    [r] = rows(spark, graph, "MATCH (n) RETURN count(n) AS c")
    assert r["c"] == 5


def test_node_table_label_is_noop(spark, graph):
    # :Node is the reference's physical Kuzu table label (kuzu/adapter.py:146)
    [r] = rows(spark, graph, "MATCH (n:Node) RETURN count(n) as c")
    assert r["c"] == 5


def test_count_edges_typed(spark, graph):
    [r] = rows(spark, graph, "MATCH (n:Node)-[r:EDGE]->(m:Node) RETURN count(r) as c")
    assert r["c"] == 4


def test_label_filter(spark, graph):
    got = rows(spark, graph, "MATCH (n:Customer) RETURN n.name AS name ORDER BY name")
    assert [r["name"] for r in got] == ["alice", "bob"]


def test_exists_shape(spark, graph):
    # kuzu/adapter.py:322 — MATCH (n:Node) WHERE n.id = $id RETURN COUNT(n) > 0
    [r] = rows(
        spark, graph, "MATCH (n:Node) WHERE n.id = $id RETURN COUNT(n) > 0 AS present", {"id": "c1"}
    )
    assert r["present"] is True
    [r] = rows(
        spark, graph, "MATCH (n:Node) WHERE n.id = $id RETURN COUNT(n) > 0 AS present", {"id": "zz"}
    )
    assert r["present"] is False


def test_in_param_list(spark, graph):
    got = rows(
        spark,
        graph,
        "MATCH (n) WHERE n.id IN $ids RETURN n.id AS id ORDER BY id",
        {"ids": ["c1", "p2", "nope"]},
    )
    assert [r["id"] for r in got] == ["c1", "p2"]


def test_typed_hop_with_names(spark, graph):
    got = rows(
        spark,
        graph,
        "MATCH (c:Customer)-[:purchased]->(p:Product) "
        "RETURN c.name AS customer, p.name AS product ORDER BY customer, product",
    )
    assert [(r["customer"], r["product"]) for r in got] == [
        ("alice", "boots"),
        ("alice", "sandals"),
        ("bob", "boots"),
    ]


def test_inline_property_map(spark, graph):
    # product_recommendation.py:159 — MATCH (customer:Customer {id: $customer_id})
    got = rows(
        spark,
        graph,
        "MATCH (customer:Customer {id: $customer_id}) RETURN customer.name AS name",
        {"customer_id": "c2"},
    )
    assert [r["name"] for r in got] == ["bob"]


def test_map_property_access(spark, graph):
    got = rows(
        spark,
        graph,
        "MATCH (n:Customer) WHERE n.city = 'berlin' RETURN n.id AS id",
    )
    assert [r["id"] for r in got] == ["c1"]


def test_reverse_arrow(spark, graph):
    got = rows(
        spark,
        graph,
        "MATCH (p:Product)<-[:purchased]-(c:Customer {id: 'c2'}) RETURN p.name AS name",
    )
    assert [r["name"] for r in got] == ["boots"]


def test_two_hop_chain(spark, graph):
    # customers who purchased something that alice also purchased
    got = rows(
        spark,
        graph,
        "MATCH (a:Customer {name: 'alice'})-[:purchased]->(p)<-[:purchased]-(other:Customer) "
        "WHERE other.id <> a.id RETURN DISTINCT other.name AS name",
    )
    assert [r["name"] for r in got] == ["bob"]


def test_optional_match_present_and_absent(spark, graph):
    # product_recommendation.py:159-160 shape
    got = rows(
        spark,
        graph,
        "MATCH (c:Customer) "
        "OPTIONAL MATCH (c)-[:has_preference]->(pref:Preference {name: 'ShoeSize'}) "
        "RETURN c.name AS name, pref.name AS pref ORDER BY name",
    )
    assert [(r["name"], r["pref"]) for r in got] == [("alice", "ShoeSize"), ("bob", None)]


def test_optional_match_label_mismatch_nulls_whole_pattern(spark, graph):
    # edge exists but far-node label fails -> whole optional pattern is null,
    # and multiplicity stays 1 (NOT one row per non-matching edge)
    got = rows(
        spark,
        graph,
        "MATCH (c:Customer {id: 'c1'}) "
        "OPTIONAL MATCH (c)-[r:purchased]->(x:Preference) "
        "RETURN c.name AS name, r.relationship_name AS rel",
    )
    assert [(r["name"], r["rel"]) for r in got] == [("alice", None)]


def test_optional_match_multiplicity(spark, graph):
    got = rows(
        spark,
        graph,
        "MATCH (c:Customer {id: 'c1'}) "
        "OPTIONAL MATCH (c)-[:purchased]->(p:Product) "
        "RETURN p.name AS product ORDER BY product",
    )
    assert [r["product"] for r in got] == ["boots", "sandals"]


def test_optional_match_where_scopes_to_pattern(spark, graph):
    # WHERE after OPTIONAL MATCH filters the pattern, not the result rows
    got = rows(
        spark,
        graph,
        "MATCH (c:Customer) "
        "OPTIONAL MATCH (c)-[:purchased]->(p:Product) WHERE p.name = 'sandals' "
        "RETURN c.name AS name, p.name AS product ORDER BY name",
    )
    assert [(r["name"], r["product"]) for r in got] == [("alice", "sandals"), ("bob", None)]


def test_return_node_expands_to_struct(spark, graph):
    [r] = rows(spark, graph, "MATCH (n) WHERE n.id = 'p1' RETURN n")
    assert r["n"].asDict() == {"id": "p1", "name": "boots", "type": "Product"}


def test_implicit_group_by(spark, graph):
    got = rows(
        spark,
        graph,
        "MATCH (c:Customer)-[r:purchased]->(p) "
        "RETURN c.name AS name, count(p) AS n ORDER BY n DESC, name",
    )
    assert [(r["name"], r["n"]) for r in got] == [("alice", 2), ("bob", 1)]


def test_string_predicates_and_bool_ops(spark, graph):
    got = rows(
        spark,
        graph,
        "MATCH (n) WHERE (n.name STARTS WITH 'b' OR n.name CONTAINS 'dal') "
        "AND NOT n.type = 'Customer' RETURN n.name AS name ORDER BY name",
    )
    assert [r["name"] for r in got] == ["boots", "sandals"]


def test_skip_limit(spark, graph):
    got = rows(spark, graph, "MATCH (n) RETURN n.id AS id ORDER BY id SKIP 1 LIMIT 2")
    assert [r["id"] for r in got] == ["c2", "p1"]


def test_count_distinct(spark, graph):
    [r] = rows(
        spark,
        graph,
        "MATCH (c)-[r:purchased]->(p) RETURN count(DISTINCT p.id) AS n",
    )
    assert r["n"] == 2


@pytest.fixture(scope="module")
def chain_graph(spark):
    # a -> b -> c -> d, plus shortcut a -> c
    nodes = spark.createDataFrame(
        [(x, x, "N", {}) for x in "abcd"],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [("a", "b", "next"), ("b", "c", "next"), ("c", "d", "next"), ("a", "c", "skip")],
        "src string, dst string, relationship_name string",
    )
    return nodes, edges


def test_varlength_bounds(spark, chain_graph):
    # paths of length 1..2 from a: a->b, a->c(skip), a->b->c, a->c->d  (per-PATH rows)
    got = rows(
        spark,
        chain_graph,
        "MATCH (a {id: 'a'})-[*1..2]->(b) RETURN b.id AS id ORDER BY id",
    )
    assert [r["id"] for r in got] == ["b", "c", "c", "d"]


def test_varlength_exact(spark, chain_graph):
    got = rows(
        spark,
        chain_graph,
        "MATCH (a {id: 'a'})-[*3]->(b) RETURN b.id AS id",
    )
    assert [r["id"] for r in got] == ["d"]  # a->b->c->d only


def test_varlength_typed(spark, chain_graph):
    # restricting to :next removes the skip edge from every hop
    got = rows(
        spark,
        chain_graph,
        "MATCH (a {id: 'a'})-[:next*1..3]->(b) RETURN b.id AS id ORDER BY id",
    )
    assert [r["id"] for r in got] == ["b", "c", "d"]


def test_varlength_reverse_arrow(spark, chain_graph):
    got = rows(
        spark,
        chain_graph,
        "MATCH (x)<-[:next*2..2]-(y) RETURN x.id AS x, y.id AS y ORDER BY x",
    )
    assert [(r["x"], r["y"]) for r in got] == [("c", "a"), ("d", "b")]


def test_varlength_edge_uniqueness(spark):
    # a 2-cycle: without per-path edge uniqueness, *2 would return a->b->a
    nodes = spark.createDataFrame(
        [("a", "a", "N", {}), ("b", "b", "N", {})],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [("a", "b", "next"), ("b", "a", "next")],
        "src string, dst string, relationship_name string",
    )
    got = rows(spark, (nodes, edges), "MATCH (s {id: 'a'})-[*2]->(e) RETURN e.id AS id")
    assert [r["id"] for r in got] == ["a"]  # a->b then b->a uses two DISTINCT edges: allowed
    # but a->b->a->b (reusing a->b) must not appear at *3
    got3 = rows(spark, (nodes, edges), "MATCH (s {id: 'a'})-[*3]->(e) RETURN e.id AS id")
    assert got3 == []


@pytest.fixture(scope="module")
def shop_graph(spark):
    # the product_recommendation.py example shape: customers, preferences, products
    nodes = spark.createDataFrame(
        [
            ("c1", "ana", "Customer", {}),
            ("c2", "bob", "Customer", {}),
            ("c3", "cyn", "Customer", {}),
            ("pr1", "Color", "Preference", {"value": "White"}),
            ("pr2", "Color", "Preference", {"value": "Navy Blue"}),
            ("pr3", "Style", "Preference", {"value": "Regular Sneakers"}),
            ("p1", "runner", "Product", {}),
            ("p2", "loafer", "Product", {}),
            ("p3", "boot", "Product", {}),
        ],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("c1", "pr1", "has_preference"),
            ("c1", "pr2", "has_preference"),
            ("c2", "pr1", "has_preference"),
            ("c3", "pr3", "has_preference"),
            ("c1", "p1", "purchased"),
            ("c1", "p2", "purchased"),
            ("c2", "p1", "purchased"),
            ("c3", "p3", "purchased"),
        ],
        "src string, dst string, relationship_name string",
    )
    return nodes, edges


def test_reference_product_recommendation_query(spark, shop_graph):
    """The reference's own example query (product_recommendation.py:126-145),
    comments and all: UNWIND -> MATCH/WHERE -> WITH agg + ORDER BY + LIMIT ->
    second MATCH -> RETURN map-projected aggregation."""
    got = rows(
        spark,
        shop_graph,
        """
        // Step 1: Use new customers's preferences from input
        UNWIND $preferences AS pref_input

        // Step 2: Find other customers who have these preferences
        MATCH (other_customer:Customer)-[:has_preference]->(preference:Preference)
          WHERE preference.value = pref_input

        WITH other_customer, count(preference) AS similarity_score

        // Step 3: Limit to the top-N most similar customers
        ORDER BY similarity_score DESC
          LIMIT 5

        // Step 4: Get products that these similar customers have purchased
        MATCH (other_customer)-[:purchased]->(product:Product)

        // Step 5: Rank products based on frequency
        RETURN product, count(*) AS recommendation_score
          ORDER BY recommendation_score DESC
          LIMIT 10
        """,
        {"preferences": ["White", "Navy Blue", "Regular Sneakers"]},
    )
    # c1 matches 2 prefs, c2 and c3 one each; products by purchase frequency
    # among them: p1 bought by c1+c2, p2 by c1, p3 by c3
    ranked = [(r["product"]["id"], r["recommendation_score"]) for r in got]
    assert ranked[0] == ("p1", 2)
    assert sorted(ranked[1:]) == [("p2", 1), ("p3", 1)]


def test_map_projection_return(spark, graph):
    # kuzu adapter.py:500-510 — RETURN { id: n.id, name: n.name, type: n.type }
    [r] = rows(
        spark,
        graph,
        "MATCH (n) WHERE n.id = $id RETURN { id: n.id, name: n.name, type: n.type } AS node",
        {"id": "p1"},
    )
    assert r["node"].asDict() == {"id": "p1", "name": "boots", "type": "Product"}


def test_with_scalar_passthrough(spark, graph):
    got = rows(
        spark,
        graph,
        "MATCH (c:Customer) WITH c.name AS cname "
        "MATCH (p:Product) RETURN cname, p.name AS pname ORDER BY cname, pname LIMIT 2",
    )
    assert [(r["cname"], r["pname"]) for r in got] == [("alice", "boots"), ("alice", "sandals")]


def test_unwind_literal_param(spark, graph):
    got = rows(
        spark,
        graph,
        "UNWIND $names AS nm MATCH (n) WHERE n.name = nm RETURN n.id AS id ORDER BY id",
        {"names": ["boots", "alice"]},
    )
    assert [r["id"] for r in got] == ["c1", "p1"]


def test_with_where_after_is_global(spark, graph):
    # WHERE after a plain MATCH following WITH filters normally
    got = rows(
        spark,
        graph,
        "MATCH (c:Customer) WITH c.id AS cid "
        "MATCH (n) WHERE n.id = cid RETURN n.name AS name ORDER BY name",
    )
    assert [r["name"] for r in got] == ["alice", "bob"]


def test_builtin_accessors(spark, graph):
    # neo4j adapter.py:916,1069 — RETURN ID(n) AS id, labels(n) AS labels,
    # properties(n) AS properties; type(r) for relationships
    got = rows(
        spark,
        graph,
        "MATCH (n:Customer)-[r]->(m) WHERE ID(n) = 'c1' "
        "RETURN labels(m) AS ls, type(r) AS rel, properties(n) AS props "
        "ORDER BY rel, ls",
    )
    assert [(r["ls"], r["rel"]) for r in got] == [
        (["Preference"], "has_preference"),
        (["Product"], "purchased"),
        (["Product"], "purchased"),
    ]
    assert got[0]["props"]["city"] == "berlin"


def test_keyword_collision_identifiers(spark):
    # the engine's own graph uses 'contains' edges — a Cypher keyword; labels,
    # rel types, and property keys must accept keyword spellings
    nodes = spark.createDataFrame(
        [("a", "a", "Chunk", {"in": "x"}), ("b", "b", "Entity", {})],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [("a", "b", "contains")], "src string, dst string, relationship_name string"
    )
    got = rows(
        spark,
        (nodes, edges),
        "MATCH (c:Chunk)-[:contains]->(e) WHERE c.in = 'x' RETURN e.id AS id",
    )
    assert [r["id"] for r in got] == ["b"]


def test_varlength_unbounded_raises():
    with pytest.raises(CypherUnsupported):
        cypher_to_sql("MATCH (a)-[*]->(b) RETURN a")
    with pytest.raises(CypherUnsupported):
        cypher_to_sql("MATCH (a)-[*1..99]->(b) RETURN a")


def test_unsupported_raises(spark, graph):
    for bad in [
        "CREATE (n:Thing) RETURN n",  # write clause (targeted error)
        "MATCH (n) RETURN n.id UNION MATCH (m) RETURN m.id",  # UNION
        "MATCH (a)-[r*1..3]->(b) RETURN a",  # vlp cannot bind a variable
        "MATCH (a)-[*1..2]-(b) RETURN a",  # undirected variable-length
    ]:
        with pytest.raises(CypherUnsupported):
            cypher_to_sql(bad)


def test_looks_like_cypher():
    assert looks_like_cypher("  MATCH (n) RETURN n")
    assert looks_like_cypher("match (n) return count(n)")
    assert not looks_like_cypher("SELECT * FROM nodes")
    # UNWIND-led and comment-led Cypher must route to the translator too
    assert looks_like_cypher("UNWIND $xs AS x MATCH (n) RETURN n")
    assert looks_like_cypher("// find things\nMATCH (n) RETURN n")
    assert not looks_like_cypher("-- sql comment\nSELECT 1")


def test_empty_in_list_matches_nothing(spark, graph):
    # Cypher: x IN [] is false, never a SQL syntax error (kuzu adapter.py:478 shape)
    got = rows(spark, graph, "MATCH (n) WHERE n.id IN $ids RETURN n.id AS id", {"ids": []})
    assert got == []
    got = rows(spark, graph, "MATCH (n) WHERE n.id IN [] RETURN n.id AS id")
    assert got == []


def test_optional_where_then_with(spark, graph):
    # the deferred OPTIONAL-WHERE skipper must stop at WITH/UNWIND, and must
    # NOT stop inside a STARTS WITH predicate
    got = rows(
        spark,
        graph,
        "MATCH (c:Customer) "
        "OPTIONAL MATCH (c)-[r:purchased]->(p:Product) WHERE p.name STARTS WITH 'boo' "
        "WITH c, count(r) AS n_boots "
        "RETURN c.name AS name, n_boots ORDER BY name",
    )
    assert [(r["name"], r["n_boots"]) for r in got] == [("alice", 1), ("bob", 1)]


def test_injection_is_quoted(spark, graph):
    # parameter values are rendered as escaped literals, never spliced raw
    got = rows(
        spark,
        graph,
        "MATCH (n) WHERE n.name = $v RETURN n.id AS id",
        {"v": "x' OR '1'='1"},
    )
    assert got == []


def test_injection_backslash_quote(spark, graph):
    # Spark SQL parses \' as an escaped quote: a value ending in a backslash
    # before the closing quote must not escape the literal and inject SQL
    got = rows(
        spark,
        graph,
        "MATCH (n) WHERE n.name = $v RETURN n.id AS id",
        {"v": "z\\' OR TRUE --"},
    )
    assert got == []


def test_backslash_value_roundtrip(spark, graph):
    # a parameter whose value contains backslashes compares literally
    got = rows(
        spark,
        graph,
        "MATCH (n) WHERE n.name <> $v RETURN count(n) AS c",
        {"v": "a\\b\\"},
    )
    assert got[0]["c"] == 5


def test_write_clauses_targeted_error(spark, graph):
    # the reference's adapters issue MERGE/SET/DELETE internally, but the
    # CYPHER search type is read-only: write clauses must raise a clear
    # pointer to the GraphStore API, not an opaque SQL parse error
    from cognee_graphdb_spark.plans.cypher import CypherWriteUnsupported, looks_like_cypher

    for q in (
        "CREATE (n:Person {name: 'x'})",
        "MERGE (n:Person {name: 'x'})",
        "MATCH (n) DELETE n",
        "MATCH (n) DETACH DELETE n",
        "MATCH (n) SET n.name = 'y'",
        "MATCH (n) REMOVE n.name",
    ):
        if looks_like_cypher(q):
            with pytest.raises(CypherWriteUnsupported, match="GraphStore API"):
                cypher_to_sql(q)
        else:
            pytest.fail(f"write statement not routed to the translator: {q}")


def test_write_keywords_as_identifiers_are_reads(spark, graph):
    # CREATE/SET/DELETE/... are legal Cypher identifiers; queries USING them
    # as variable names must stay translatable reads (Neo4j accepts these)
    [r] = rows(spark, graph, "MATCH (set:Customer) RETURN count(set) AS c")
    assert r["c"] == 2
    got = rows(spark, graph, "MATCH (delete:Product) RETURN delete.name AS n ORDER BY n")
    assert [x["n"] for x in got] == ["boots", "sandals"]
    [r] = rows(spark, graph, "MATCH (n:Product) RETURN {merge: n.name} AS m ORDER BY n.name LIMIT 1")
    assert r["m"]["merge"] == "boots"


def test_undirected_single_hop(spark, graph):
    # '-[r]-' matches either orientation: c1 purchased p1 (outgoing only),
    # so the undirected pattern from p1 must still reach c1
    got = rows(
        spark,
        graph,
        "MATCH (p:Product {name: 'boots'})-[r:purchased]-(c:Customer) "
        "RETURN c.name AS name ORDER BY name",
    )
    assert [r["name"] for r in got] == ["alice", "bob"]


def test_undirected_free_endpoints_multiplicity(spark, graph):
    # openCypher: with both endpoints free, each edge matches once per
    # binding orientation — 4 directed edges -> 8 rows
    [r] = rows(spark, graph, "MATCH (a)-[r]-(b) RETURN count(r) AS c")
    assert r["c"] == 8


def test_undirected_optional_match(spark, graph):
    # undirected inside OPTIONAL MATCH: preference hangs off c1 only
    got = rows(
        spark,
        graph,
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:has_preference]-(p:Preference) "
        "RETURN c.name AS name, p.name AS pref ORDER BY name",
    )
    assert [(r["name"], r["pref"]) for r in got] == [("alice", "ShoeSize"), ("bob", None)]


def test_undirected_varlength_raises():
    with pytest.raises(CypherUnsupported, match="undirected variable-length"):
        cypher_to_sql("MATCH (a)-[*1..2]-(b) RETURN count(*) AS c")


def test_scalar_functions(spark, graph):
    got = rows(
        spark, graph,
        "MATCH (n:Customer) WHERE toUpper(n.name) = 'ALICE' "
        "RETURN toLower(n.id) AS id, size(n.name) AS sz, "
        "coalesce(n.city, 'unknown') AS city, toString(size(n.name)) AS s",
    )
    assert [(r["id"], r["sz"], r["city"], r["s"]) for r in got] == [("c1", 5, "berlin", "5")]
    # round with two args; replace; coalesce over a missing property
    [r] = rows(spark, graph, "MATCH (n:Customer {id: 'c1'}) "
               "RETURN coalesce(n.nonexistent, 'fallback') AS f, "
               "replace(n.name, 'a', 'o') AS rep")
    assert (r["f"], r["rep"]) == ("fallback", "olice")
    # a VARIABLE named like a function still resolves as a variable
    got = rows(spark, graph, "MATCH (size:Product) RETURN size.name AS n ORDER BY n")
    assert [x["n"] for x in got] == ["boots", "sandals"]


def test_sql_literal_roundtrip_fuzz(spark):
    # every rendered string literal must parse back to the exact value under
    # Spark SQL's escape rules — one batched action over an adversarial corpus
    # plus seeded-random strings (the injection fixes live or die here)
    import random

    from cognee_graphdb_spark.plans.cypher import _Parser

    nasty = [
        "", "'", "''", "\\", "\\\\", "\\'", "'\\", "a\\b\\", "z\\' OR TRUE --",
        "x' OR '1'='1", '"double"', "back`tick", "new\nline", "tab\tchar",
        "\r\n", "100% LIKE _", "nul\\0", "\\n literal", "日本語 'quoted' \\ text",
        "-- comment", "/* block */", "$param", "{brace}", "semi;colon",
    ]
    rng = random.Random(7)
    alphabet = "ab'\\\"\n\t%_$;`-/*"
    nasty += ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12))) for _ in range(40)]
    p = _Parser("MATCH (n) RETURN n", {}, "nodes", "edges")
    select = ", ".join(f"{p._sql_literal(v)} AS c{i}" for i, v in enumerate(nasty))
    row = spark.sql(f"SELECT {select}").first()
    for i, v in enumerate(nasty):
        assert row[f"c{i}"] == v, f"literal round-trip failed for {v!r}"


def test_literal_group_by_ordinal(spark, graph):
    # a literal non-aggregate item next to an aggregate must group by the
    # select-list position, not emit GROUP BY <literal> (ordinal collision)
    [r] = rows(spark, graph, "MATCH (n) RETURN count(n) AS c, 1 AS x")
    assert (r["c"], r["x"]) == (5, 1)


# -- CASE expressions ---------------------------------------------------------


def test_case_generic_form(spark, graph):
    out = rows(
        spark,
        graph,
        "MATCH (n:Customer) RETURN n.name AS name, "
        "CASE WHEN n.city = 'berlin' THEN 'de' WHEN n.city = 'paris' THEN 'fr' "
        "ELSE 'other' END AS country ORDER BY name",
    )
    assert [(r["name"], r["country"]) for r in out] == [("alice", "de"), ("bob", "fr")]


def test_case_simple_form_and_no_else(spark, graph):
    out = rows(
        spark,
        graph,
        "MATCH (n) RETURN n.id AS id, CASE n.type WHEN 'Customer' THEN 1 "
        "WHEN 'Product' THEN 2 END AS kind ORDER BY id",
    )
    kinds = {r["id"]: r["kind"] for r in out}
    assert kinds["c1"] == 1 and kinds["p1"] == 2
    assert kinds["pref1"] is None  # no ELSE -> NULL, openCypher semantics


def test_case_in_where_and_aggregate(spark, graph):
    [r] = rows(
        spark,
        graph,
        "MATCH (n:Customer) WHERE CASE WHEN n.city = 'berlin' THEN TRUE ELSE FALSE END "
        "RETURN count(n) AS c",
    )
    assert r["c"] == 1
    [r] = rows(
        spark,
        graph,
        "MATCH (n) RETURN sum(CASE WHEN n.type = 'Product' THEN 1 ELSE 0 END) AS products",
    )
    assert r["products"] == 2


def test_case_errors(spark, graph):
    with pytest.raises(CypherUnsupported, match="THEN"):
        rows(spark, graph, "MATCH (n) RETURN CASE WHEN n.id = 'c1' END AS x")
    with pytest.raises(CypherUnsupported, match="END"):
        rows(spark, graph, "MATCH (n) RETURN CASE WHEN n.id = 'c1' THEN 1 AS x")
    with pytest.raises(CypherUnsupported, match="WHEN"):
        rows(spark, graph, "MATCH (n) RETURN CASE n.id END AS x")


# -- shortestPath -------------------------------------------------------------


@pytest.fixture(scope="module")
def chain_graph(spark):
    # a -> b -> c -> d, plus a direct a -> c shortcut
    nodes = spark.createDataFrame(
        [(i, i.upper(), "T", None) for i in "abcd"],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [("a", "b", "next"), ("b", "c", "next"), ("c", "d", "next"), ("a", "c", "skip")],
        "src string, dst string, relationship_name string",
    )
    return nodes, edges


def test_shortest_path_min_length(spark, chain_graph):
    # a->c: the 1-hop skip beats the 2-hop chain
    [r] = rows(
        spark,
        chain_graph,
        "MATCH p = shortestPath((a {id: 'a'})-[*..4]->(b {id: 'c'})) RETURN length(p) AS l",
    )
    assert r["l"] == 1
    # a->d: skip + next = 2 hops, beats next*3
    [r] = rows(
        spark,
        chain_graph,
        "MATCH p = shortestPath((a {id: 'a'})-[*..4]->(b {id: 'd'})) RETURN length(p) AS l",
    )
    assert r["l"] == 2
    # typed pattern restricts to 'next' edges only -> 3 hops
    [r] = rows(
        spark,
        chain_graph,
        "MATCH p = shortestPath((a {id: 'a'})-[:next*..5]->(b {id: 'd'})) RETURN length(p) AS l",
    )
    assert r["l"] == 3


def test_shortest_path_per_pair_and_no_path(spark, chain_graph):
    # free endpoints: one row per reachable ordered pair, each with min length
    out = rows(
        spark,
        chain_graph,
        "MATCH p = shortestPath((a)-[*..4]->(b)) RETURN a.id AS s, b.id AS t, length(p) AS l",
    )
    got = {(r["s"], r["t"]): r["l"] for r in out}
    assert got[("a", "d")] == 2 and got[("b", "d")] == 2 and got[("a", "b")] == 1
    assert ("d", "a") not in got  # unreachable pair -> no row, like Cypher
    # unreachable bound pair: zero rows, not an error
    assert (
        rows(
            spark,
            chain_graph,
            "MATCH p = shortestPath((a {id: 'd'})-[*..4]->(b {id: 'a'})) RETURN length(p) AS l",
        )
        == []
    )


def test_shortest_path_errors(spark, chain_graph):
    with pytest.raises(CypherUnsupported, match="length"):
        rows(spark, chain_graph, "MATCH p = shortestPath((a)-[*..3]->(b)) RETURN p")
    with pytest.raises(CypherUnsupported, match="upper bound|explicit"):
        rows(spark, chain_graph, "MATCH p = shortestPath((a)-[*]->(b)) RETURN length(p) AS l")
    with pytest.raises(CypherUnsupported, match="shortestPath|direct"):
        rows(spark, chain_graph, "MATCH p = shortestPath((a)-[*..3]-(b)) RETURN length(p) AS l")
    with pytest.raises(CypherUnsupported, match="shortestPath"):
        rows(
            spark,
            chain_graph,
            "MATCH p = shortestPath((a)-[*..2]->(b)-[*..2]->(c)) RETURN length(p) AS l",
        )


# -- arithmetic ---------------------------------------------------------------


def test_arithmetic_in_return_and_where(spark, graph):
    [r] = rows(
        spark,
        graph,
        "MATCH (n {id: 'pref1'}) RETURN toInteger(n.value) * 2 + 1 AS x, "
        "toInteger(n.value) % 5 AS m, -toInteger(n.value) AS neg",
    )
    assert (r["x"], r["m"], r["neg"]) == (85, 2, -42)
    # precedence: * binds tighter than +
    [r] = rows(spark, graph, "MATCH (n {id: 'c1'}) RETURN 2 + 3 * 4 AS v, (2 + 3) * 4 AS w")
    assert (r["v"], r["w"]) == (14, 20)
    # arithmetic over aggregates and in WHERE
    [r] = rows(
        spark,
        graph,
        "MATCH (c:Customer)-[r:purchased]->(p) WHERE toInteger('1') + 1 = 2 "
        "RETURN count(r) * 10 AS c10",
    )
    assert r["c10"] == 30
    # negative literals compare correctly
    [r] = rows(spark, graph, "MATCH (n) WHERE 1 - 2 < 0 RETURN count(n) AS c")
    assert r["c"] == 5


# -- pattern-existence predicates --------------------------------------------


def test_pattern_predicate_positive_and_negative(spark, graph):
    # customers who purchased something
    out = rows(
        spark,
        graph,
        "MATCH (c:Customer) WHERE (c)-[:purchased]->() RETURN c.name AS n ORDER BY n",
    )
    assert [r["n"] for r in out] == ["alice", "bob"]
    # NOT pattern: customers without a preference
    out = rows(
        spark,
        graph,
        "MATCH (c:Customer) WHERE NOT (c)-[:has_preference]->() RETURN c.name AS n",
    )
    assert [r["n"] for r in out] == ["bob"]
    # labeled inner endpoint constrains the subquery without binding a var
    out = rows(
        spark,
        graph,
        "MATCH (c:Customer) WHERE (c)-[:purchased]->(:Product {name: 'sandals'}) "
        "RETURN c.name AS n",
    )
    assert [r["n"] for r in out] == ["alice"]
    # incoming orientation: products someone purchased
    out = rows(
        spark,
        graph,
        "MATCH (p:Product) WHERE (p)<-[:purchased]-(:Customer) RETURN p.name AS n ORDER BY n",
    )
    assert [r["n"] for r in out] == ["boots", "sandals"]


def test_pattern_predicate_chain_and_exists_fn(spark, graph):
    # two-hop chain through a free intermediate node (no bindings introduced)
    out = rows(
        spark,
        graph,
        "MATCH (a:Customer) WHERE (a)-[:purchased]->()<-[:purchased]-(b:Customer) "
        "AND a.name = 'alice' RETURN a.name AS n",
    )
    assert [r["n"] for r in out] == ["alice"]  # shares p1 with bob
    # exists() function forms
    out = rows(
        spark,
        graph,
        "MATCH (c:Customer) WHERE exists((c)-[:has_preference]->()) RETURN c.name AS n",
    )
    assert [r["n"] for r in out] == ["alice"]
    out = rows(
        spark,
        graph,
        "MATCH (n:Customer) WHERE exists(n.city) RETURN count(n) AS c",
    )
    assert out[0]["c"] == 2
    # pattern predicates introduce NO bindings: inner anonymous labels are
    # not visible afterwards, and binding a rel var inside is an error
    with pytest.raises(CypherUnsupported, match="bind"):
        rows(spark, graph, "MATCH (c) WHERE (c)-[r:purchased]->() RETURN count(r) AS x")


# -- round-6 dialect extensions ---------------------------------------------


@pytest.fixture(scope="module")
def weighted_graph(spark):
    """Edges WITH a properties map (feedback_weight / flattened Edge weights,
    expand_with_nodes_and_edges.py:53-74, kuzu adapter.py:1724-1760)."""
    nodes = spark.createDataFrame(
        [
            ("n1", "alice", "Person", {"age": "30"}),
            ("n2", "bob", "Person", {"age": "25"}),
            ("n3", "acme", "Company", {}),
        ],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("n1", "n3", "works_at", {"weight": "0.9", "feedback_weight": "2"}),
            ("n2", "n3", "works_at", {"weight": "0.5"}),
            ("n1", "n2", "knows", None),
        ],
        "src string, dst string, relationship_name string, properties map<string,string>",
    )
    return nodes, edges


def test_edge_property_read(spark, weighted_graph):
    out = rows(
        spark, weighted_graph,
        "MATCH (a)-[r:works_at]->(b) RETURN a.name AS n, r.weight AS w ORDER BY w DESC",
    )
    assert [(r["n"], r["w"]) for r in out] == [("alice", "0.9"), ("bob", "0.5")]


def test_edge_property_in_where_and_properties_fn(spark, weighted_graph):
    out = rows(
        spark, weighted_graph,
        "MATCH (a)-[r]->(b) WHERE r.feedback_weight IS NOT NULL RETURN a.name AS n",
    )
    assert [r["n"] for r in out] == ["alice"]
    [r] = rows(
        spark, weighted_graph,
        "MATCH (a)-[r:knows]->(b) RETURN properties(r) AS p",
    )
    assert r["p"] is None  # stored NULL map passes through


def test_edge_property_undirected_hop(spark, weighted_graph):
    out = rows(
        spark, weighted_graph,
        "MATCH (a)-[r]-(b) WHERE r.weight = '0.9' RETURN a.name AS n ORDER BY n",
    )
    # both binding orientations of the one matching edge
    assert [r["n"] for r in out] == ["acme", "alice"]


def test_edge_property_through_with_and_optional(spark, weighted_graph):
    out = rows(
        spark, weighted_graph,
        "MATCH (a)-[r]->(b) WITH r, count(*) AS c RETURN r.weight AS w, c ORDER BY w",
    )
    assert [r["w"] for r in out] == [None, "0.5", "0.9"]
    out = rows(
        spark, weighted_graph,
        "MATCH (a) OPTIONAL MATCH (a)-[r:works_at]->(b)"
        " RETURN a.name AS n, r.weight AS w ORDER BY n",
    )
    assert [(r["n"], r["w"]) for r in out] == [
        ("acme", None), ("alice", "0.9"), ("bob", "0.5")]


def test_edge_property_on_propertyless_view(spark, graph):
    # run_cypher normalizes a missing edge properties column to an empty map
    out = rows(
        spark, graph,
        "MATCH (a)-[r:purchased]->(b) RETURN a.name AS n, r.weight AS w ORDER BY n LIMIT 1",
    )
    assert [(r["n"], r["w"]) for r in out] == [("alice", None)]


def test_with_where_filters_aggregate(spark, graph):
    # HAVING shape: only customers with >= 2 purchases survive
    out = rows(
        spark, graph,
        "MATCH (c:Customer)-[:purchased]->(p) WITH c.name AS n, count(*) AS c"
        " WHERE c >= 2 RETURN n, c",
    )
    assert [(r["n"], r["c"]) for r in out] == [("alice", 2)]


def test_with_where_applies_after_order_limit(spark, graph):
    # openCypher: ORDER BY/LIMIT run inside the WITH stage, WHERE filters after
    out = rows(
        spark, graph,
        "MATCH (c:Customer) WITH c ORDER BY c.name LIMIT 1"
        " WHERE c.name <> 'alice' RETURN c.name AS n",
    )
    assert out == []  # LIMIT 1 keeps alice; WHERE then drops her


def test_regex_match_is_anchored(spark, graph):
    out = rows(spark, graph, "MATCH (a) WHERE a.name =~ 'b.*s' RETURN a.name AS n ORDER BY n")
    assert [r["n"] for r in out] == ["boots"]
    # substring without full match does NOT hit (Cypher =~ anchors)
    assert rows(spark, graph, "MATCH (a) WHERE a.name =~ 'oot' RETURN a.name AS n") == []


def test_regex_from_param(spark, graph):
    out = rows(
        spark, graph,
        "MATCH (a) WHERE a.name =~ $pat RETURN a.name AS n ORDER BY n",
        {"pat": "s.*s"},
    )
    assert [r["n"] for r in out] == ["sandals"]


def test_union_distinct_and_all(spark, graph):
    out = rows(
        spark, graph,
        "MATCH (n:Customer) RETURN n.type AS t UNION MATCH (m:Customer) RETURN m.type AS t",
    )
    assert [r["t"] for r in out] == ["Customer"]
    out = rows(
        spark, graph,
        "MATCH (n:Customer) RETURN n.type AS t UNION ALL MATCH (m:Customer) RETURN m.type AS t",
    )
    assert [r["t"] for r in out] == ["Customer"] * 4


def test_union_combines_labels(spark, graph):
    out = rows(
        spark, graph,
        "MATCH (n:Product) RETURN n.name AS name"
        " UNION MATCH (m:Preference) RETURN m.name AS name",
    )
    assert sorted(r["name"] for r in out) == ["ShoeSize", "boots", "sandals"]


def test_union_branch_limit_binds_to_branch(spark, graph):
    out = rows(
        spark, graph,
        "MATCH (n:Product) RETURN n.name AS name ORDER BY n.name LIMIT 1"
        " UNION ALL MATCH (m:Customer) RETURN m.name AS name",
    )
    assert sorted(r["name"] for r in out) == ["alice", "bob", "boots"]


def test_union_errors(spark, graph):
    with pytest.raises(CypherUnsupported, match="same column names"):
        cypher_to_sql("MATCH (n) RETURN n.name AS x UNION MATCH (m) RETURN m.type AS y")
    with pytest.raises(CypherUnsupported, match="mix UNION"):
        cypher_to_sql(
            "MATCH (n) RETURN n.name AS x UNION MATCH (m) RETURN m.name AS x"
            " UNION ALL MATCH (o) RETURN o.name AS x"
        )


def test_unwind_scalar_as_inline_property(spark, graph):
    out = rows(
        spark, graph,
        "UNWIND $ids AS x MATCH (n {id: x}) RETURN n.name AS nm ORDER BY nm",
        {"ids": ["c1", "p2"]},
    )
    assert [r["nm"] for r in out] == ["alice", "sandals"]


def test_variable_map_projection(spark, weighted_graph):
    [r] = rows(
        spark, weighted_graph,
        "MATCH (a:Person) RETURN a { .name, .age, up: toUpper(a.name) } AS m"
        " ORDER BY a.name LIMIT 1",
    )
    assert r["m"].asDict() == {"name": "alice", "age": "30", "up": "ALICE"}


# -- round-6 dialect extensions: lists, lambdas, subqueries, containers -----


def test_standalone_return(spark, graph):
    [r] = rows(spark, graph, "RETURN 1 + 1 AS two, toUpper('ab') AS s")
    assert (r["two"], r["s"]) == (2, "AB")


def test_list_literal_and_index(spark, graph):
    # Cypher list indexing is 0-based, matching Spark SQL's [] on arrays
    [r] = rows(spark, graph, "RETURN [10, 20, 30][1] AS v, head([7]) AS h, last([7, 8]) AS l, tail([1, 2, 3]) AS t")
    assert (r["v"], r["h"], r["l"]) == (20, 7, 8)
    assert list(r["t"]) == [2, 3]
    [r] = rows(spark, graph, "RETURN head([]) AS h, isEmpty([]) AS e")
    assert r["h"] is None and r["e"] is True


def test_list_comprehension_and_reduce(spark, graph):
    [r] = rows(spark, graph, "RETURN [x IN range(1, 4) WHERE x % 2 = 0 | x * 10] AS xs")
    assert list(r["xs"]) == [20, 40]
    [r] = rows(spark, graph, "RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS s")
    assert r["s"] == 6
    # the binder shadows and restores an outer variable of the same name
    [r] = rows(spark, graph, "MATCH (n {id: 'c1'}) RETURN [n IN [1, 2] | n * 2] AS xs, n.name AS name")
    assert list(r["xs"]) == [2, 4] and r["name"] == "alice"


def test_list_predicates(spark, graph):
    [r] = rows(
        spark, graph,
        "RETURN all(x IN [1, 2] WHERE x > 0) AS a, any(x IN [1, 2] WHERE x > 1) AS b, "
        "none(x IN [1] WHERE x > 5) AS c, single(x IN [1, 2] WHERE x = 1) AS d",
    )
    assert (r["a"], r["b"], r["c"], r["d"]) == (True, True, True, True)


def test_unwind_literal_and_range(spark, graph):
    got = [r["x"] for r in rows(spark, graph, "UNWIND range(1, 5, 2) AS x RETURN x ORDER BY x")]
    assert got == [1, 3, 5]
    got = [r["x"] for r in rows(spark, graph, "UNWIND ['a', 'b'] AS x RETURN x ORDER BY x")]
    assert got == ["a", "b"]
    with pytest.raises(CypherUnsupported, match="UNWIND supports"):
        cypher_to_sql("MATCH (n) UNWIND keys(n) AS k RETURN k")


def test_exists_subquery(spark, graph):
    # EXISTS { MATCH ... WHERE ... }: inner names visible to the inner WHERE
    got = sorted(
        r["name"]
        for r in rows(
            spark, graph,
            "MATCH (c:Customer) WHERE EXISTS { MATCH (c)-[:purchased]->(p:Product) "
            "WHERE p.name = 'sandals' } RETURN c.name AS name",
        )
    )
    assert got == ["alice"]
    got = sorted(
        r["name"]
        for r in rows(
            spark, graph,
            "MATCH (c:Customer) WHERE EXISTS { (c)-[:has_preference]->() } RETURN c.name AS name",
        )
    )
    assert got == ["alice"]


def test_string_and_math_functions(spark, graph):
    # Cypher substring is 0-based; SQL's is 1-based — the translator shifts
    [r] = rows(spark, graph, "MATCH (n {id: 'c1'}) RETURN substring(n.name, 0, 3) AS s3, substring(n.name, 2) AS s2")
    assert (r["s3"], r["s2"]) == ("ali", "ice")
    [r] = rows(spark, graph, "MATCH (n {id: 'c1'}) RETURN split(n.name, 'l')[0] AS p")
    assert r["p"] == "a"
    [r] = rows(spark, graph, "RETURN sqrt(4.0) AS q, floor(1.7) AS f, ceil(1.2) AS c, toBoolean('true') AS b, round(e(), 3) AS ee")
    assert (r["q"], r["f"], r["c"], r["b"], r["ee"]) == (2.0, 1, 2, True, 2.718)


def test_entity_accessors_and_stats(spark, graph):
    [r] = rows(spark, graph, "MATCH (a {id: 'c1'})-[r:has_preference]->(b) RETURN startNode(r).id AS s, endNode(r).id AS e")
    assert (r["s"], r["e"]) == ("c1", "pref1")
    with pytest.raises(CypherUnsupported, match="relationship"):
        cypher_to_sql("MATCH (n) RETURN startNode(n) AS x")
    [r] = rows(spark, graph, "MATCH (n {id: 'c1'}) RETURN keys(n) AS k")
    assert list(r["k"]) == ["id", "name", "type", "city"]
    [r] = rows(spark, graph, "MATCH (p:Preference) RETURN percentileCont(toInteger(p.value), 0.5) AS m")
    assert r["m"] == 42.0
    [r] = rows(spark, graph, "MATCH (c:Customer) RETURN round(stDev(size(c.name)), 3) AS sd")
    assert r["sd"] == 1.414  # sample stddev over name lengths {5, 3}


def test_percentile_disc_is_exact_nearest_rank(spark, graph):
    """percentileDisc follows Neo4j's nearest-rank rule (value at rank
    ceil(p*n), min 1) EXACTLY — not percentile_approx's sketch: over the
    name-length multiset the answer must be an element of the set, picked
    by rank, for every p including the boundaries."""
    # UNWIND gives a controlled multiset: [1, 2, 3, 4] -> p=0.5 ⇒ rank 2 ⇒ 2
    q = "UNWIND [1, 2, 3, 4] AS x RETURN percentileDisc(x, {p}) AS v"
    for p, want in ((0.25, 1), (0.5, 2), (0.51, 3), (0.75, 3), (1.0, 4), (0.0, 1)):
        [r] = rows(spark, graph, q.format(p=p))
        assert r["v"] == want, (p, r["v"])
    # odd count: [10, 20, 30] -> median is the middle element, no interpolation
    [r] = rows(spark, graph, "UNWIND [10, 20, 30] AS x RETURN percentileDisc(x, 0.5) AS v")
    assert r["v"] == 20


def test_percentile_disc_empty_match_returns_null(spark, graph):
    """Zero-row aggregate: Neo4j returns null; under Spark ANSI mode a bare
    element_at([], 1) would raise INVALID_ARRAY_INDEX_IN_ELEMENT_AT."""
    [r] = rows(
        spark, graph,
        "MATCH (x:NoSuchLabel) RETURN percentileDisc(size(x.name), 0.5) AS v",
    )
    assert r["v"] is None


# --- CALL gds.* procedure surface: the reference's metric queries VERBATIM
# (neo4j_driver/neo4j_metrics_utils.py:60,92,152,184) -------------------------


@pytest.fixture(scope="module")
def gds_graph(spark):
    """Two components: a triangle a-b-c and an edge x-y."""
    nodes = spark.createDataFrame(
        [(i, i, "Entity", {}) for i in ["a", "b", "c", "x", "y"]],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("a", "c", "r"), ("x", "y", "r")],
        "src string, dst string, relationship_name string",
    )
    return nodes, edges


def test_gds_wcc_stats_verbatim(spark, gds_graph):
    q = """
    CALL gds.wcc.stats('memory_graph')
    YIELD componentCount
    RETURN componentCount AS num_connected_components;
    """
    [r] = rows(spark, gds_graph, q)
    assert r["num_connected_components"] == 2


def test_gds_wcc_stream_sizes_verbatim(spark, gds_graph):
    q = """
    CALL gds.wcc.stream('memory_graph')
    YIELD componentId
    RETURN componentId, count(*) AS size
    ORDER BY size DESC;
    """
    got = rows(spark, gds_graph, q)
    assert [r["size"] for r in got] == [3, 2]


def test_gds_all_shortest_paths_verbatim(spark, gds_graph):
    q = """
    CALL gds.allShortestPaths.stream('memory_graph')
    YIELD distance
    RETURN distance;
    """
    got = sorted(r["distance"] for r in rows(spark, gds_graph, q))
    # triangle: 6 ordered pairs at distance 1; x-y: 2 pairs at distance 1
    assert got == [1] * 8


def test_gds_clustering_stats_verbatim(spark, gds_graph):
    q = """
    CALL gds.localClusteringCoefficient.stats('memory_graph')
    YIELD averageClusteringCoefficient
    RETURN averageClusteringCoefficient AS avg_clustering;
    """
    [r] = rows(spark, gds_graph, q)
    # triangle corners: 1.0 each; x, y: degree 1 -> 0.0; avg = 3/5
    assert r["avg_clustering"] == pytest.approx(0.6)


def test_gds_call_rejects_unknown_procedure_and_columns(spark, gds_graph):
    with pytest.raises(CypherUnsupported, match="unsupported gds procedure"):
        rows(spark, gds_graph, "CALL gds.nope.stream('g') YIELD score RETURN score")
    with pytest.raises(CypherUnsupported, match="un-YIELDed"):
        rows(
            spark, gds_graph,
            "CALL gds.wcc.stream('g') YIELD componentId RETURN nodeId",
        )


def test_gds_streams_match_native_operators(spark, gds_graph):
    """Every stream procedure routes to its native operator: CALL output ==
    direct call output (same rows, renamed columns)."""
    from cognee_graphdb_spark.operators.graph_metrics import (
        coreness,
        label_propagation,
        leiden,
        louvain,
        pagerank,
        strongly_connected_components,
        triangle_counts,
    )
    from cognee_graphdb_spark.operators.graph_metrics import hits as hits_op

    nodes, edges = gds_graph

    def as_set(df):
        return {tuple(r) for r in df.collect()}

    cases = [
        ("pageRank", "nodeId, score",
         pagerank(nodes.select("id"), edges).select("id", "rank")),
        ("louvain", "nodeId, communityId",
         louvain(nodes, edges).select("id", "label")),
        ("leiden", "nodeId, communityId",
         leiden(nodes, edges).select("id", "label")),
        ("labelPropagation", "nodeId, communityId",
         label_propagation(nodes, edges).select("id", "label")),
        ("scc", "nodeId, componentId",
         strongly_connected_components(nodes, edges).select("id", "label")),
        ("hits", "nodeId, hub, auth",
         hits_op(nodes, edges).select("id", "hub", "authority")),
        ("kcore", "nodeId, coreValue",
         coreness(nodes, edges).select("id", "coreness")),
        ("triangleCount", "nodeId, triangleCount",
         triangle_counts(nodes, edges).select("id", "triangles")),
    ]
    for proc, yields, direct in cases:
        got = rows(
            spark, gds_graph,
            f"CALL gds.{proc}.stream('g') YIELD {yields} RETURN {yields}",
        )
        assert {tuple(r) for r in got} == as_set(direct), proc


def test_gds_degree_stream(spark, gds_graph):
    got = {r["nodeId"]: r["score"] for r in rows(
        spark, gds_graph,
        "CALL gds.degree.stream('g') YIELD nodeId, score RETURN nodeId, score",
    )}
    assert got == {"a": 2, "b": 1, "c": 0, "x": 1, "y": 0}


def test_gds_triangle_counts_values(spark, gds_graph):
    got = {r["nodeId"]: r["triangleCount"] for r in rows(
        spark, gds_graph,
        "CALL gds.triangleCount.stream('g') YIELD nodeId, triangleCount "
        "RETURN nodeId, triangleCount",
    )}
    assert got == {"a": 1, "b": 1, "c": 1, "x": 0, "y": 0}


def test_gds_node_similarity_stream(spark, gds_graph):
    got = rows(
        spark, gds_graph,
        "CALL gds.nodeSimilarity.stream('g') YIELD node1, node2, similarity "
        "RETURN node1, node2, similarity",
    )
    pairs = {(r["node1"], r["node2"]): r["similarity"] for r in got}
    # triangle corners a,b share neighbor set overlap: N(a)={b,c}, N(b)={a,c}
    # intersection {c} = 1, union 3 -> 1/3
    assert pairs[("a", "b")] == pytest.approx(1 / 3)


def test_gds_closeness_stream(spark, gds_graph):
    got = {r["nodeId"]: r["score"] for r in rows(
        spark, gds_graph,
        "CALL gds.closeness.stream('g') YIELD nodeId, score RETURN nodeId, score",
    )}
    # triangle corners reach 2 nodes at distance 1 each: 2/2 = 1.0
    for v in ("a", "b", "c"):
        assert got[v] == pytest.approx(1.0)
    # x reaches y at 1: 1/1 = 1.0; both components are cliques here, so add
    # an isolated-node check through a bigger fixture
    assert got["x"] == pytest.approx(1.0)
    iso = {r["nodeId"]: r["score"] for r in run_cypher(
        spark,
        spark.createDataFrame([("i", "i", "Entity", {})],
            "id string, name string, type string, properties map<string,string>"),
        spark.createDataFrame([],
            "src string, dst string, relationship_name string"),
        "CALL gds.closeness.stream('g') YIELD nodeId, score RETURN nodeId, score",
    ).collect()}
    assert iso["i"] == 0.0


def test_gds_call_config_map_and_yield_only_shapes_are_named_errors(spark, gds_graph):
    """Review fixes pinned, updated for the r12 typed-config surface: a
    config key the procedure doesn't parameterize refuses instead of
    silently running with defaults (supported keys like pageRank's
    maxIterations now apply — test_gds_config_* pins those); a CALL
    without RETURN gets the CALL limitation named on the stream surface,
    not a MATCH-translator parse error."""
    with pytest.raises(CypherUnsupported, match="unsupported config key"):
        rows(
            spark, gds_graph,
            "CALL gds.pageRank.stream('g', {tolerance: 0.1}) "
            "YIELD nodeId, score RETURN nodeId, score",
        )
    with pytest.raises(CypherUnsupported, match="takes no config map"):
        rows(
            spark, gds_graph,
            "CALL gds.wcc.stream('g', {seedProperty: 'x'}) "
            "YIELD nodeId, componentId RETURN componentId",
        )
    with pytest.raises(CypherUnsupported, match="YIELD cols RETURN"):
        rows(spark, gds_graph, "CALL gds.wcc.stream('g') YIELD nodeId, componentId")


def test_gds_eigenvector_and_articlerank_stream(spark, gds_graph):
    """gds.eigenvector.stream / gds.articleRank.stream route to the native
    power-iteration operators.  The fixture digraph is a DAG (a->b->c,
    a->c, x->y): its adjacency is nilpotent, so eigenvector centrality is
    exactly zero everywhere once the iteration outlives the longest path —
    the honest spectral semantics, distinct from articleRank, which keeps a
    teleport term and ranks the cited y above the never-cited x."""
    ev = rows(spark, gds_graph, """
    CALL gds.eigenvector.stream('memory_graph')
    YIELD nodeId, score
    RETURN nodeId, score ORDER BY score DESC;
    """)
    scores = {r["nodeId"]: r["score"] for r in ev}
    assert len(scores) == 5 and all(s == 0.0 for s in scores.values())
    ar = rows(spark, gds_graph, """
    CALL gds.articleRank.stream('memory_graph')
    YIELD nodeId, score
    RETURN nodeId, score;
    """)
    ranks = {r["nodeId"]: r["score"] for r in ar}
    assert ranks["y"] > ranks["x"]
    assert len(ranks) == 5


def test_gds_dag_topological_sort_stream(spark, gds_graph):
    """gds.dag.topologicalSort.stream yields the Kahn-peel layer as
    maxDistanceFromSource (the longest source path — a->b->c puts c at 2,
    above the a->c shortcut's 1)."""
    got = rows(spark, gds_graph, """
    CALL gds.dag.topologicalSort.stream('memory_graph')
    YIELD nodeId, maxDistanceFromSource
    RETURN nodeId, maxDistanceFromSource ORDER BY maxDistanceFromSource, nodeId;
    """)
    layers = {r["nodeId"]: r["maxDistanceFromSource"] for r in got}
    assert layers == {"a": 0, "x": 0, "b": 1, "y": 1, "c": 2}


def test_gds_kmeans_stream(spark):
    """gds.kmeans.stream clusters the projection's node 'embedding'
    property with the extracted SemDeDup core (r11 VERDICT #5): two
    orthogonal vector groups land in two communities (more points than
    the route's fixed k=10, so clustering actually merges), the CALL
    output matches clustering.kmeans at the GDS defaults (k=10,
    n_iter=10), and a projection without the embedding column names the
    requirement."""
    from cognee_graphdb_spark.operators.clustering import kmeans
    from cognee_graphdb_spark.plans.cypher import CypherUnsupported

    # 24 points in two tight orthogonal clumps: k=10 seeds split them into
    # at most 10 cells, but no cell ever spans the two clumps
    pts = [(f"a{i:02d}", [1.0, 0.01 * i]) for i in range(12)] + [
        (f"b{i:02d}", [0.01 * i, 1.0]) for i in range(12)
    ]
    nodes = spark.createDataFrame(pts, "id string, embedding array<double>")
    edges = spark.createDataFrame(
        [("a00", "b00", "r")], "src string, dst string, relationship_name string"
    )
    got = rows(spark, (nodes, edges), """
    CALL gds.kmeans.stream('g') YIELD nodeId, communityId, distanceFromCentroid
    RETURN nodeId, communityId, distanceFromCentroid ORDER BY nodeId;
    """)
    by_id = {r["nodeId"]: r for r in got}
    assert set(by_id) == {p[0] for p in pts}
    a_comms = {r["communityId"] for k, r in by_id.items() if k.startswith("a")}
    b_comms = {r["communityId"] for k, r in by_id.items() if k.startswith("b")}
    assert a_comms.isdisjoint(b_comms)
    assert all(0.0 <= r["distanceFromCentroid"] <= 1.0 for r in got)
    ref = {
        r["id"]: r["cluster"]
        for r in kmeans(nodes, k=10, n_iter=10, id_col="id", vector_col="embedding").collect()
    }
    assert {k: r["communityId"] for k, r in by_id.items()} == ref
    bare = spark.createDataFrame([("a1",)], "id string")
    with pytest.raises(CypherUnsupported, match="embedding"):
        rows(spark, (bare, edges), """
        CALL gds.kmeans.stream('g') YIELD nodeId, communityId
        RETURN nodeId, communityId;
        """)


def test_gds_knn_stream(spark):
    """gds.knn.stream: per-node top-k most-similar nodes by the 'embedding'
    property (exact brute-force semantics behind the all-pairs guard).
    Orthogonal clumps rank in-clump neighbors first; self-pairs excluded;
    missing property names the requirement; the guard fires above the
    budget and the opt-in conf unlocks it."""
    from cognee_graphdb_spark.plans import cypher as cy
    from cognee_graphdb_spark.plans.cypher import CypherUnsupported, GdsScaleGuard

    nodes = spark.createDataFrame(
        [
            ("a1", [1.0, 0.0]), ("a2", [0.9, 0.1]),
            ("b1", [0.0, 1.0]), ("b2", [0.1, 0.9]),
        ],
        "id string, embedding array<double>",
    )
    edges = spark.createDataFrame(
        [("a1", "b1", "r")], "src string, dst string, relationship_name string"
    )
    q = """
    CALL gds.knn.stream('g') YIELD node1, node2, similarity
    RETURN node1, node2, similarity ORDER BY node1, similarity DESC;
    """
    got = rows(spark, (nodes, edges), q)
    assert all(r["node1"] != r["node2"] for r in got)
    nearest = {}
    for r in got:
        nearest.setdefault(r["node1"], r["node2"])  # first = highest sim
    assert nearest == {"a1": "a2", "a2": "a1", "b1": "b2", "b2": "b1"}
    bare = spark.createDataFrame([("a1",)], "id string")
    with pytest.raises(CypherUnsupported, match="embedding"):
        rows(spark, (bare, edges), q)
    orig = cy._EXACT_ALL_PAIRS_NODE_BUDGET
    cy._EXACT_ALL_PAIRS_NODE_BUDGET = 1
    try:
        with pytest.raises(GdsScaleGuard, match="knn"):
            rows(spark, (nodes, edges), q)
        spark.conf.set("spark.cognee.gds.allowExactAllPairs", "true")
        assert rows(spark, (nodes, edges), q)
    finally:
        cy._EXACT_ALL_PAIRS_NODE_BUDGET = orig
        spark.conf.unset("spark.cognee.gds.allowExactAllPairs")


def test_gds_conductance_stream(spark):
    """gds.conductance.stream over a node-carried 'community' property:
    the two-triangles-bridge fixture gives each triangle conductance 1/7
    (1 boundary pair / 7 volume pairs); a projection without the property
    names the requirement."""
    from cognee_graphdb_spark.plans.cypher import CypherUnsupported

    nodes = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("x", 2), ("y", 2), ("z", 2)],
        "id string, community long",
    )
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("a", "c", "r"),
         ("x", "y", "r"), ("y", "z", "r"), ("x", "z", "r"), ("c", "x", "r")],
        "src string, dst string, relationship_name string",
    )
    got = rows(spark, (nodes, edges), """
    CALL gds.conductance.stream('g') YIELD community, conductance
    RETURN community, conductance ORDER BY community;
    """)
    assert [(r["community"], round(r["conductance"], 6)) for r in got] == [
        (1, round(1 / 7, 6)), (2, round(1 / 7, 6)),
    ]
    bare = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(CypherUnsupported, match="community"):
        rows(spark, (bare, edges), """
        CALL gds.conductance.stream('g') YIELD community, conductance
        RETURN community, conductance;
        """)


def test_gds_betweenness_and_harmonic_closeness_stream(spark):
    """gds.betweenness.stream (exact all-sources Brandes, halved for the
    undirected convention) and gds.closeness.harmonic.stream (sum of 1/d
    over n-1) on the path p1-p2-p3: only the middle node carries
    betweenness (exactly 1), and harmonic centrality is 1.0 for the middle
    vs 0.75 for the ends."""
    nodes = spark.createDataFrame(
        [(i, i, "Entity", {}) for i in ["p1", "p2", "p3"]],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [("p1", "p2", "r"), ("p2", "p3", "r")],
        "src string, dst string, relationship_name string",
    )
    bt = rows(spark, (nodes, edges), """
    CALL gds.betweenness.stream('g') YIELD nodeId, score
    RETURN nodeId, score;
    """)
    scores = {r["nodeId"]: r["score"] for r in bt}
    assert scores == {"p1": 0.0, "p2": pytest.approx(1.0), "p3": 0.0}
    hc = rows(spark, (nodes, edges), """
    CALL gds.closeness.harmonic.stream('g') YIELD nodeId, centrality
    RETURN nodeId, centrality;
    """)
    cent = {r["nodeId"]: r["centrality"] for r in hc}
    assert cent == {
        "p1": pytest.approx(0.75),
        "p2": pytest.approx(1.0),
        "p3": pytest.approx(0.75),
    }


def test_gds_exact_all_pairs_scale_guard_refuses_and_opts_in(spark):
    """allShortestPaths/closeness are exact all-pairs (O(n*reachable) state);
    above the node budget the CALL must refuse with the sampled alternative
    named, and the documented conf opt-in must restore the exact path — the
    structural guard the r10 review asked for (these procedures are
    user-reachable through HTTP/MCP, so a doc note alone is not a guard)."""
    from cognee_graphdb_spark.plans.cypher import (
        _EXACT_ALL_PAIRS_NODE_BUDGET,
        _EXACT_ALL_PAIRS_OPT_IN,
        GdsScaleGuard,
    )

    big_nodes = spark.range(_EXACT_ALL_PAIRS_NODE_BUDGET + 1).selectExpr(
        "cast(id as string) AS id",
        "cast(id as string) AS name",
        "'Entity' AS type",
        "cast(map() as map<string,string>) AS properties",
    )
    no_edges = spark.createDataFrame(
        [], "src string, dst string, relationship_name string"
    )
    for proc, approx in [
        ("allShortestPaths", "approx_path_metrics"),
        ("closeness", "approx_harmonic_closeness"),
    ]:
        with pytest.raises(GdsScaleGuard, match=approx):
            run_cypher(
                spark, big_nodes, no_edges,
                f"CALL gds.{proc}.stream('g') YIELD nodeId, score "
                "RETURN nodeId, score"
                if proc == "closeness"
                else f"CALL gds.{proc}.stream('g') YIELD distance RETURN distance",
            ).collect()
    # the error names the opt-in conf; setting it restores the exact path
    spark.conf.set(_EXACT_ALL_PAIRS_OPT_IN, "true")
    try:
        out = run_cypher(
            spark, big_nodes, no_edges,
            "CALL gds.closeness.stream('g') YIELD nodeId, score "
            "RETURN nodeId, score",
        )
        assert out.filter("score != 0.0").count() == 0  # all isolated
        assert out.count() == _EXACT_ALL_PAIRS_NODE_BUDGET + 1
    finally:
        spark.conf.unset(_EXACT_ALL_PAIRS_OPT_IN)


# --- gds.graph.* projection catalog + db.* introspection: the reference's
# projection-management flow VERBATIM (neo4j_driver/adapter.py:1100-1198:
# graph_exists via gds.graph.list, project_entire_graph via db.labels() +
# db.relationshipTypes() + gds.graph.project, drop_graph via gds.graph.drop)


@pytest.fixture()
def catalog_graph(spark):
    """Typed graph: 4 Person nodes (two knows-pairs), 1 Company, works_at
    edges from a and c into the company.  Function-scoped: the catalog is
    session-level state and each test starts clean."""
    from cognee_graphdb_spark.plans.cypher import _GRAPH_CATALOG

    _GRAPH_CATALOG.pop(spark, None)
    nodes = spark.createDataFrame(
        [
            ("a", "a", "Person", {}),
            ("b", "b", "Person", {}),
            ("x", "x", "Person", {}),
            ("y", "y", "Person", {}),
            ("co", "acme", "Company", {}),
        ],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", "knows"),
            ("x", "y", "knows"),
            ("a", "co", "works_at"),
            ("x", "co", "works_at"),
        ],
        "src string, dst string, relationship_name string",
    )
    return nodes, edges


def test_db_labels_and_relationship_types(spark, catalog_graph):
    # CALL db.labels() — adapter.py:1121-1133 reads record['label']
    got = rows(spark, catalog_graph, "CALL db.labels()")
    assert [r["label"] for r in got] == ["Company", "Person"]
    # adapter.py:1135-1158 collects relationship types into one row
    [r] = rows(
        spark, catalog_graph,
        "CALL db.relationshipTypes() YIELD relationshipType "
        "RETURN collect(relationshipType) AS relationships;",
    )
    assert sorted(r["relationships"]) == ["knows", "works_at"]


def test_project_entire_graph_flow_verbatim(spark, catalog_graph):
    """The full adapter.py:1160-1198 lifecycle, query text formatted exactly
    as project_entire_graph formats it from db.labels/db.relationshipTypes."""
    nodes, edges = catalog_graph
    labels = [r["label"] for r in rows(spark, catalog_graph, "CALL db.labels()")]
    [rr] = rows(
        spark, catalog_graph,
        "CALL db.relationshipTypes() YIELD relationshipType "
        "RETURN collect(relationshipType) AS relationships;",
    )
    rel_str = (
        "{" + ", ".join(f"{rel}: {{orientation: 'UNDIRECTED'}}" for rel in rr["relationships"]) + "}"
    )
    q = f"""
    CALL gds.graph.project(
        'myGraph',
        ['{"', '".join(labels)}'],
        {rel_str}
    ) YIELD graphName;
    """
    got = rows(spark, catalog_graph, q)
    assert len(got) == 1 and got[0].asDict() == {"graphName": "myGraph"}
    # graph_exists (adapter.py:1100-1118): list + collect + membership
    [r] = rows(
        spark, catalog_graph,
        "CALL gds.graph.list() YIELD graphName "
        "RETURN collect(graphName) AS graphNames;",
    )
    assert "myGraph" in r["graphNames"]
    # a metric query against the projected name (neo4j_metrics_utils.py:60)
    [r] = rows(
        spark, catalog_graph,
        "CALL gds.wcc.stats('myGraph') YIELD componentCount "
        "RETURN componentCount AS num_connected_components;",
    )
    assert r["num_connected_components"] == 1  # works_at bridges everything
    # drop_graph (adapter.py:1185-1198), then the name is gone
    rows(spark, catalog_graph, "CALL gds.graph.drop('myGraph');")
    [r] = rows(
        spark, catalog_graph,
        "CALL gds.graph.list() YIELD graphName "
        "RETURN collect(graphName) AS graphNames;",
    )
    assert r["graphNames"] is None or "myGraph" not in r["graphNames"]


def test_project_filters_labels_and_reltypes_and_persists(spark, catalog_graph):
    nodes, edges = catalog_graph
    [r] = rows(
        spark, catalog_graph,
        "CALL gds.graph.project('persons', ['Person'], ['knows']) "
        "YIELD graphName, nodeCount, relationshipCount",
    )
    assert (r["nodeCount"], r["relationshipCount"]) == (4, 2)
    # the metric call consumes the CACHED subgraph: Person-only knows graph
    # has 2 components, the full graph 1 — proves the name resolves to the
    # projection, not the passed frames
    [r] = rows(
        spark, catalog_graph,
        "CALL gds.wcc.stats('persons') YIELD componentCount "
        "RETURN componentCount AS c;",
    )
    assert r["c"] == 2
    [r] = rows(
        spark, catalog_graph,
        "CALL gds.wcc.stats('unprojected') YIELD componentCount "
        "RETURN componentCount AS c;",
    )
    assert r["c"] == 1
    # the projection is persisted (GDS's in-memory graph, Spark-style) and
    # unpersisted on drop
    from cognee_graphdb_spark.plans.cypher import _GRAPH_CATALOG

    entry = _GRAPH_CATALOG[spark]["persons"]
    assert entry["nodes"].storageLevel.useMemory
    assert entry["edges"].storageLevel.useMemory
    rows(spark, catalog_graph, "CALL gds.graph.drop('persons')")
    assert not entry["nodes"].storageLevel.useMemory


def test_project_endpoint_restriction_and_exists(spark, catalog_graph):
    # company-only projection keeps no edges: works_at endpoints leave the set
    [r] = rows(
        spark, catalog_graph,
        "CALL gds.graph.project('co', ['Company'], '*') "
        "YIELD nodeCount, relationshipCount",
    )
    assert (r["nodeCount"], r["relationshipCount"]) == (1, 0)
    [r] = rows(spark, catalog_graph, "CALL gds.graph.exists('co')")
    assert (r["graphName"], r["exists"]) == ("co", True)
    [r] = rows(spark, catalog_graph, "CALL gds.graph.exists('nope')")
    assert r["exists"] is False
    rows(spark, catalog_graph, "CALL gds.graph.drop('co')")


def test_project_reverse_orientation_flips_edges(spark, catalog_graph):
    rows(
        spark, catalog_graph,
        "CALL gds.graph.project('rev', '*', {works_at: {orientation: 'REVERSE'}})",
    )
    got = rows(
        spark, catalog_graph,
        "CALL gds.degree.stream('rev') YIELD nodeId, score "
        "RETURN nodeId, score ORDER BY nodeId;",
    )
    # reversed works_at: only the company has out-edges now
    assert {(r["nodeId"], r["score"]) for r in got} == {
        ("a", 0), ("b", 0), ("x", 0), ("y", 0), ("co", 2),
    }
    rows(spark, catalog_graph, "CALL gds.graph.drop('rev')")


def test_project_catalog_errors(spark, catalog_graph):
    rows(spark, catalog_graph, "CALL gds.graph.project('dup', '*', '*')")
    try:
        with pytest.raises(CypherUnsupported, match="already exists"):
            rows(spark, catalog_graph, "CALL gds.graph.project('dup', '*', '*')")
    finally:
        rows(spark, catalog_graph, "CALL gds.graph.drop('dup')")
    with pytest.raises(CypherUnsupported, match="not in this session's catalog"):
        rows(spark, catalog_graph, "CALL gds.graph.drop('dup')")
    with pytest.raises(CypherUnsupported, match="orientation"):
        rows(
            spark, catalog_graph,
            "CALL gds.graph.project('bad', '*', {knows: {orientation: 'SIDEWAYS'}})",
        )
    with pytest.raises(CypherUnsupported, match="unknown column"):
        rows(spark, catalog_graph, "CALL gds.graph.list() YIELD nope RETURN nope")


def test_cypher_search_routes_gds_calls(spark, catalog_graph):
    """api.search(CYPHER) runs the reference's metric queries end-to-end:
    cypher_search delegates CALL gds.*/db.* to run_cypher's dispatcher
    (the reference executes them through the same .query() surface its
    MATCH statements use)."""
    from cognee_graphdb_spark.plans.search_types import GraphContext, cypher_search

    nodes, edges = catalog_graph
    ctx = GraphContext(nodes=nodes, edges=edges, chunks=None, embeddings=None, gateway=None)
    [r] = cypher_search(
        spark, ctx,
        "CALL gds.wcc.stats('memory_graph') YIELD componentCount "
        "RETURN componentCount AS num_connected_components;",
    ).collect()
    assert r["num_connected_components"] == 1
    got = cypher_search(spark, ctx, "CALL db.labels()").collect()
    assert [r["label"] for r in got] == ["Company", "Person"]


# --- typed config maps on the CALL surface (the GDS config subset each
# procedure actually parameterizes; unknown keys refuse loudly) --------------


def test_gds_config_pagerank_damping_changes_result(spark):
    nodes = spark.createDataFrame(
        [(str(i), str(i), "E", {}) for i in range(5)],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [("0", "1", "r"), ("2", "1", "r"), ("3", "1", "r"), ("1", "4", "r")],
        "src string, dst string, relationship_name string",
    )
    g = (nodes, edges)
    a = {
        r["nodeId"]: r["score"]
        for r in rows(
            spark, g,
            "CALL gds.pageRank.stream('g', {dampingFactor: 0.5, maxIterations: 20}) "
            "YIELD nodeId, score RETURN nodeId, score;",
        )
    }
    b = {
        r["nodeId"]: r["score"]
        for r in rows(
            spark, g,
            "CALL gds.pageRank.stream('g') YIELD nodeId, score RETURN nodeId, score;",
        )
    }
    assert a != b and set(a) == set(b)
    # config keys are validated, not silently dropped
    with pytest.raises(CypherUnsupported, match="unsupported config key"):
        rows(
            spark, g,
            "CALL gds.pageRank.stream('g', {nope: 1}) YIELD nodeId, score "
            "RETURN nodeId, score;",
        )
    with pytest.raises(CypherUnsupported, match="must be int"):
        rows(
            spark, g,
            "CALL gds.pageRank.stream('g', {maxIterations: 'ten'}) "
            "YIELD nodeId, score RETURN nodeId, score;",
        )
    # procedures without a config surface refuse any map
    with pytest.raises(CypherUnsupported, match="takes no config map"):
        rows(
            spark, g,
            "CALL gds.wcc.stream('g', {x: 1}) YIELD nodeId, componentId "
            "RETURN componentId;",
        )


def test_gds_config_knn_topk_and_kmeans_k(spark):
    nodes = spark.createDataFrame(
        [(str(i), str(i), "E", [float(i), 1.0]) for i in range(5)],
        "id string, name string, type string, embedding array<double>",
    )
    edges = spark.createDataFrame([], "src string, dst string, relationship_name string")
    g = (nodes, edges)
    got = rows(
        spark, g,
        "CALL gds.knn.stream('g', {topK: 1}) YIELD node1, node2, similarity "
        "RETURN node1, node2, similarity;",
    )
    assert len(got) == 5  # exactly one neighbor per node
    km = rows(
        spark, g,
        "CALL gds.kmeans.stream('g', {k: 2, maxIterations: 3}) "
        "YIELD nodeId, communityId RETURN nodeId, communityId;",
    )
    assert len(km) == 5 and len({r["communityId"] for r in km}) <= 2


def test_gds_config_betweenness_sampling_size_is_the_scale_path(spark):
    """samplingSize is GDS's own scale knob: with it set, the exact
    all-pairs guard does not apply (state is O(|S|*E) by construction) and
    the estimator is V/|S|-unbiased, matching api.centrality."""
    from cognee_graphdb_spark.plans.cypher import _EXACT_ALL_PAIRS_NODE_BUDGET

    big_nodes = spark.range(_EXACT_ALL_PAIRS_NODE_BUDGET + 1).selectExpr(
        "cast(id as string) AS id", "cast(id as string) AS name",
        "'E' AS type", "cast(map() as map<string,string>) AS properties",
    )
    no_edges = spark.createDataFrame(
        [], "src string, dst string, relationship_name string"
    )
    out = run_cypher(
        spark, big_nodes, no_edges,
        "CALL gds.betweenness.stream('g', {samplingSize: 4}) "
        "YIELD nodeId, score RETURN nodeId, score;",
    )
    assert out.filter("score != 0.0").count() == 0  # no edges -> all zero


def test_gds_fastrp_stream(spark):
    nodes = spark.createDataFrame(
        [(str(i), str(i), "E", {}) for i in range(6)],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [(str(i), str((i + 1) % 6), "r") for i in range(6)],
        "src string, dst string, relationship_name string",
    )
    g = (nodes, edges)
    q = (
        "CALL gds.fastRP.stream('g', {embeddingDimension: 4}) "
        "YIELD nodeId, embedding RETURN nodeId, embedding;"
    )
    got = rows(spark, g, q)
    assert len(got) == 6 and all(len(r["embedding"]) == 4 for r in got)
    # deterministic: the init is a seeded hash, not RNG state
    assert rows(spark, g, q) == got
    # GDS requires embeddingDimension
    with pytest.raises(CypherUnsupported, match="embeddingDimension"):
        rows(
            spark, g,
            "CALL gds.fastRP.stream('g', {randomSeed: 1}) "
            "YIELD nodeId, embedding RETURN nodeId, embedding;",
        )


def test_gds_dijkstra_stream_weighted_paths(spark):
    """gds.shortestPath.dijkstra.stream: sourceNode + optional targetNode +
    relationshipWeightProperty from the edge properties map; undirected like
    the other path procedures; named errors for a missing/unknown source
    and a relationship without the weight property."""
    nodes = spark.createDataFrame(
        [(x, x, "E", {}) for x in "abcd"],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", "r", {"w": "1.0"}),
            ("b", "c", "r", {"w": "2.0"}),
            ("a", "c", "r", {"w": "10.0"}),
            ("c", "d", "r", {"w": "1.0"}),
        ],
        "src string, dst string, relationship_name string, properties map<string,string>",
    )
    g = (nodes, edges)
    got = {
        r["targetNode"]: (r["totalCost"], r["path"])
        for r in rows(
            spark, g,
            "CALL gds.shortestPath.dijkstra.stream('g', {sourceNode: 'a', "
            "relationshipWeightProperty: 'w'}) "
            "YIELD sourceNode, targetNode, totalCost, path "
            "RETURN sourceNode, targetNode, totalCost, path;",
        )
    }
    # cheapest a->c goes through b (3.0), not the direct 10.0 edge
    assert got["c"] == (3.0, "a->b->c") and got["d"] == (4.0, "a->b->c->d")
    # unweighted default = hop counts; targetNode filters the stream
    [r] = rows(
        spark, g,
        "CALL gds.shortestPath.dijkstra.stream('g', {sourceNode: 'a', "
        "targetNode: 'd'}) YIELD targetNode, totalCost RETURN totalCost;",
    )
    assert r["totalCost"] == 2.0
    with pytest.raises(CypherUnsupported, match="requires the sourceNode"):
        rows(spark, g, "CALL gds.shortestPath.dijkstra.stream('g') YIELD totalCost RETURN totalCost;")
    with pytest.raises(CypherUnsupported, match="not in the projection"):
        rows(
            spark, g,
            "CALL gds.shortestPath.dijkstra.stream('g', {sourceNode: 'zz'}) "
            "YIELD totalCost RETURN totalCost;",
        )
    bad = spark.createDataFrame(
        [("a", "b", "r", {})],
        "src string, dst string, relationship_name string, properties map<string,string>",
    )
    with pytest.raises(CypherUnsupported, match="needs a numeric"):
        rows(
            spark, (nodes, bad),
            "CALL gds.shortestPath.dijkstra.stream('g', {sourceNode: 'a', "
            "relationshipWeightProperty: 'w'}) YIELD totalCost RETURN totalCost;",
        )


def test_gds_config_community_and_similarity_knobs(spark, gds_graph):
    """louvain/leiden {maxLevels, maxIterations} and nodeSimilarity
    {topK, similarityCutoff} flow to the native operators."""
    got = rows(
        spark, gds_graph,
        "CALL gds.louvain.stream('g', {maxLevels: 1, maxIterations: 1}) "
        "YIELD nodeId, communityId RETURN nodeId, communityId;",
    )
    assert len(got) == 5
    got = rows(
        spark, gds_graph,
        "CALL gds.leiden.stream('g', {maxLevels: 1, maxIterations: 1}) "
        "YIELD nodeId, communityId RETURN nodeId, communityId;",
    )
    assert len(got) == 5
    # cutoff 1.01 excludes every pair; topK caps partners per node
    none = rows(
        spark, gds_graph,
        "CALL gds.nodeSimilarity.stream('g', {similarityCutoff: 1.01}) "
        "YIELD node1, node2, similarity RETURN node1;",
    )
    assert none == []
    one = rows(
        spark, gds_graph,
        "CALL gds.nodeSimilarity.stream('g', {topK: 1}) "
        "YIELD node1, node2, similarity RETURN node1, node2;",
    )
    assert len(one) == len({r["node1"] for r in one})


def test_gds_all_shortest_paths_dijkstra_alias(spark):
    """gds.allShortestPaths.dijkstra.stream is GDS's single-source
    all-targets spelling of shortestPath.dijkstra — one handler."""
    nodes = spark.createDataFrame(
        [(x, x, "E", {}) for x in "abc"],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r")],
        "src string, dst string, relationship_name string",
    )
    got = {
        r["targetNode"]: r["totalCost"]
        for r in rows(
            spark, (nodes, edges),
            "CALL gds.allShortestPaths.dijkstra.stream('g', {sourceNode: 'a'}) "
            "YIELD sourceNode, targetNode, totalCost "
            "RETURN sourceNode, targetNode, totalCost;",
        )
    }
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0}


def test_gds_config_weighted_pagerank_and_degree_orientation(spark):
    """pageRank {relationshipWeightProperty} reads edge weights from the
    properties map (pagerank's weight_col path); degree {orientation}
    serves NATURAL/REVERSE/UNDIRECTED counts."""
    nodes = spark.createDataFrame(
        [(x, x, "E", {}) for x in "abc"],
        "id string, name string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", "r", {"w": "1.0"}),
            ("a", "c", "r", {"w": "9.0"}),
        ],
        "src string, dst string, relationship_name string, properties map<string,string>",
    )
    g = (nodes, edges)
    w = {
        r["nodeId"]: r["score"]
        for r in rows(
            spark, g,
            "CALL gds.pageRank.stream('g', {relationshipWeightProperty: 'w'}) "
            "YIELD nodeId, score RETURN nodeId, score;",
        )
    }
    u = {
        r["nodeId"]: r["score"]
        for r in rows(
            spark, g,
            "CALL gds.pageRank.stream('g') YIELD nodeId, score "
            "RETURN nodeId, score;",
        )
    }
    # unweighted splits a's rank evenly; the 9:1 weights concentrate it on c
    assert u["b"] == pytest.approx(u["c"])
    assert w["c"] > w["b"]
    bad = spark.createDataFrame(
        [("a", "b", "r", {})],
        "src string, dst string, relationship_name string, properties map<string,string>",
    )
    with pytest.raises(CypherUnsupported, match="needs a numeric"):
        rows(
            spark, (nodes, bad),
            "CALL gds.pageRank.stream('g', {relationshipWeightProperty: 'w'}) "
            "YIELD nodeId, score RETURN nodeId, score;",
        )
    for orient, want in (
        ("NATURAL", {"a": 2, "b": 0, "c": 0}),
        ("REVERSE", {"a": 0, "b": 1, "c": 1}),
        ("UNDIRECTED", {"a": 2, "b": 1, "c": 1}),
    ):
        got = {
            r["nodeId"]: r["score"]
            for r in rows(
                spark, g,
                f"CALL gds.degree.stream('g', {{orientation: '{orient}'}}) "
                "YIELD nodeId, score RETURN nodeId, score;",
            )
        }
        assert got == want, orient


def test_catalog_drop_fail_if_missing_and_strict_args(spark, catalog_graph):
    """gds.graph.drop('name', false) answers empty instead of raising (the
    GDS failIfMissing signature); the no-argument procedures refuse args."""
    got = rows(spark, catalog_graph, "CALL gds.graph.drop('absent', false)")
    assert got == []
    with pytest.raises(CypherUnsupported, match="not in this session"):
        rows(spark, catalog_graph, "CALL gds.graph.drop('absent', true)")
    with pytest.raises(CypherUnsupported, match="takes no arguments"):
        rows(spark, catalog_graph, "CALL db.labels('x')")
    with pytest.raises(CypherUnsupported, match="takes no arguments"):
        rows(spark, catalog_graph, "CALL gds.graph.list('x')")


def test_gds_mutate_chains_on_catalog_projection(spark, catalog_graph):
    """The GDS chaining workflow: mutate writes a procedure's per-node
    result back into the cataloged projection as a node property, and the
    next CALL reads it off the cached frames — louvain.mutate ->
    conductance.stream, and fastRP.mutate -> kmeans.stream."""
    rows(spark, catalog_graph, "CALL gds.graph.project('mut', '*', '*')")
    try:
        [r] = rows(
            spark, catalog_graph,
            "CALL gds.louvain.mutate('mut', {mutateProperty: 'community'}) "
            "YIELD nodePropertiesWritten, mutateProperty "
            "RETURN nodePropertiesWritten, mutateProperty;",
        )
        assert r["nodePropertiesWritten"] == 5 and r["mutateProperty"] == "community"
        cond = rows(
            spark, catalog_graph,
            "CALL gds.conductance.stream('mut') YIELD community, conductance "
            "RETURN community, conductance;",
        )
        assert cond and all(0.0 <= c["conductance"] <= 1.0 for c in cond)
        [r] = rows(
            spark, catalog_graph,
            "CALL gds.fastRP.mutate('mut', {embeddingDimension: 4, "
            "mutateProperty: 'embedding'}) "
            "YIELD nodePropertiesWritten RETURN nodePropertiesWritten;",
        )
        assert r["nodePropertiesWritten"] == 5
        km = rows(
            spark, catalog_graph,
            "CALL gds.kmeans.stream('mut', {k: 2}) YIELD nodeId, communityId "
            "RETURN nodeId, communityId;",
        )
        assert len(km) == 5 and len({r["communityId"] for r in km}) <= 2
        # error shapes: un-cataloged name, multi-column stream, duplicate prop
        with pytest.raises(CypherUnsupported, match="cataloged projection"):
            rows(
                spark, catalog_graph,
                "CALL gds.pageRank.mutate('ghost', {mutateProperty: 'pr'}) "
                "YIELD nodePropertiesWritten RETURN nodePropertiesWritten;",
            )
        with pytest.raises(CypherUnsupported, match="nodeId, value"):
            rows(
                spark, catalog_graph,
                "CALL gds.hits.mutate('mut', {mutateProperty: 'h'}) "
                "YIELD nodePropertiesWritten RETURN nodePropertiesWritten;",
            )
        with pytest.raises(CypherUnsupported, match="already carries"):
            rows(
                spark, catalog_graph,
                "CALL gds.louvain.mutate('mut', {mutateProperty: 'community'}) "
                "YIELD nodePropertiesWritten RETURN nodePropertiesWritten;",
            )
        with pytest.raises(CypherUnsupported, match="mutateProperty"):
            rows(
                spark, catalog_graph,
                "CALL gds.pageRank.mutate('mut') "
                "YIELD nodePropertiesWritten RETURN nodePropertiesWritten;",
            )
    finally:
        rows(spark, catalog_graph, "CALL gds.graph.drop('mut')")


def test_gds_review_fixes_guard_bypass_and_project_strictness(spark):
    """Review fixes pinned: (1) betweenness samplingSize above the node
    budget re-enters the all-pairs guard instead of bypassing it; (2) a
    non-map relationship-projection value refuses instead of silently
    projecting NATURAL; (3) knn's guard bounds broadcast cells (n*d), not
    just rows."""
    from cognee_graphdb_spark.plans.cypher import (
        _EXACT_ALL_PAIRS_NODE_BUDGET,
        GdsScaleGuard,
    )

    big_nodes = spark.range(_EXACT_ALL_PAIRS_NODE_BUDGET + 1).selectExpr(
        "cast(id as string) AS id", "cast(id as string) AS name",
        "'E' AS type", "cast(map() as map<string,string>) AS properties",
    )
    no_edges = spark.createDataFrame(
        [], "src string, dst string, relationship_name string"
    )
    with pytest.raises(GdsScaleGuard, match="samplingSize"):
        run_cypher(
            spark, big_nodes, no_edges,
            "CALL gds.betweenness.stream('g', "
            f"{{samplingSize: {_EXACT_ALL_PAIRS_NODE_BUDGET * 2}}}) "
            "YIELD nodeId, score RETURN nodeId, score;",
        ).collect()
    small = spark.createDataFrame(
        [("a", "a", "E", {})],
        "id string, name string, type string, properties map<string,string>",
    )
    with pytest.raises(CypherUnsupported, match="must be a"):
        run_cypher(
            spark, small, no_edges,
            "CALL gds.graph.project('bad', '*', {KNOWS: 'UNDIRECTED'})",
        )
    # 30k nodes x 2048 dims > 50M cells: refused inside the node budget
    wide = spark.range(30_000).selectExpr(
        "cast(id as string) AS id", "cast(id as string) AS name",
        "'E' AS type", "array_repeat(cast(1.0 as double), 2048) AS embedding",
    )
    with pytest.raises(GdsScaleGuard, match="cells"):
        run_cypher(
            spark, wide, no_edges,
            "CALL gds.knn.stream('g') YIELD node1, node2, similarity "
            "RETURN node1, node2, similarity;",
        ).collect()


def test_gds_scale_properties_stream(spark):
    """gds.scaleProperties.stream (operators/scaling.py): MinMax and
    StdScore over two numeric node properties, concatenated in config
    order; unknown scaler / missing property / missing config key refuse
    loudly naming the requirement."""
    from cognee_graphdb_spark.plans.cypher import CypherUnsupported

    nodes = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 5.0, 20.0), ("c", 10.0, 30.0)],
        "id string, score double, size double",
    )
    no_edges = spark.createDataFrame(
        [], "src string, dst string, relationship_name string"
    )
    got = rows(spark, (nodes, no_edges), """
    CALL gds.scaleProperties.stream('g', {nodeProperties: ['score', 'size'],
        scaler: 'MinMax'})
    YIELD nodeId, scaledProperty RETURN nodeId, scaledProperty;
    """)
    assert sorted((r["nodeId"], tuple(r["scaledProperty"])) for r in got) == [
        ("a", (0.0, 0.0)), ("b", (0.5, 0.5)), ("c", (1.0, 1.0)),
    ]
    # stdScore: population stddev of (0, 5, 10) around mean 5
    sd = (50.0 / 3.0) ** 0.5
    got = rows(spark, (nodes, no_edges), """
    CALL gds.scaleProperties.stream('g', {nodeProperties: ['score'],
        scaler: 'StdScore'})
    YIELD nodeId, scaledProperty RETURN nodeId, scaledProperty;
    """)
    assert sorted(
        (r["nodeId"], round(r["scaledProperty"][0], 9)) for r in got
    ) == [("a", round(-5.0 / sd, 9)), ("b", 0.0), ("c", round(5.0 / sd, 9))]
    with pytest.raises(CypherUnsupported, match="unknown scaler"):
        rows(spark, (nodes, no_edges), """
        CALL gds.scaleProperties.stream('g', {nodeProperties: ['score'],
            scaler: 'Bogus'})
        YIELD nodeId, scaledProperty RETURN nodeId, scaledProperty;
        """)
    with pytest.raises(CypherUnsupported, match="lack property"):
        rows(spark, (nodes, no_edges), """
        CALL gds.scaleProperties.stream('g', {nodeProperties: ['missing']})
        YIELD nodeId, scaledProperty RETURN nodeId, scaledProperty;
        """)
    with pytest.raises(CypherUnsupported, match="nodeProperties"):
        rows(spark, (nodes, no_edges), """
        CALL gds.scaleProperties.stream('g') YIELD nodeId, scaledProperty
        RETURN nodeId, scaledProperty;
        """)


def test_gds_modularity_stream(spark):
    """gds.modularity.stream over a node-carried community property: the
    two-triangles-bridge fixture has Q contribution 35/196 per triangle
    (S = 14 ordered pairs, 6 within each, degree 7 each: 14*6 - 49 = 35);
    values match the exact-integer operator divided once."""
    from cognee_graphdb_spark.plans.cypher import CypherUnsupported

    nodes = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("x", 2), ("y", 2), ("z", 2)],
        "id string, community long",
    )
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("a", "c", "r"),
         ("x", "y", "r"), ("y", "z", "r"), ("x", "z", "r"), ("c", "x", "r")],
        "src string, dst string, relationship_name string",
    )
    got = rows(spark, (nodes, edges), """
    CALL gds.modularity.stream('g', {communityProperty: 'community'})
    YIELD communityId, modularity
    RETURN communityId, modularity ORDER BY communityId;
    """)
    assert [(r["communityId"], round(r["modularity"], 9)) for r in got] == [
        (1, round(35 / 196, 9)), (2, round(35 / 196, 9)),
    ]
    with pytest.raises(CypherUnsupported, match="communityProperty"):
        rows(spark, (nodes, edges), """
        CALL gds.modularity.stream('g') YIELD communityId, modularity
        RETURN communityId, modularity;
        """)
    bare = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(CypherUnsupported, match="carry a 'community'"):
        rows(spark, (bare, edges), """
        CALL gds.modularity.stream('g', {communityProperty: 'community'})
        YIELD communityId, modularity RETURN communityId, modularity;
        """)


def test_gds_spanning_tree_stream(spark):
    """gds.spanningTree.stream: the MST of the SOURCE's component, rooted at
    sourceNode (nodeId, parentId, weight) — the heavier a-c edge is skipped,
    the disconnected e-f component never streams, the source roots itself at
    0.0, and a missing sourceNode refuses."""
    from cognee_graphdb_spark.plans.cypher import CypherUnsupported

    nodes = spark.createDataFrame(
        [(i,) for i in "abcdef"], "id string"
    )
    edges = spark.createDataFrame(
        [("a", "b", "1"), ("a", "c", "5"), ("b", "c", "2"), ("c", "d", "1"),
         ("e", "f", "1")],
        "src string, dst string, w string",
    ).selectExpr(
        "src", "dst", "'r' AS relationship_name", "map('w', w) AS properties"
    )
    got = rows(spark, (nodes, edges), """
    CALL gds.spanningTree.stream('g', {sourceNode: 'a',
        relationshipWeightProperty: 'w'})
    YIELD nodeId, parentId, weight
    RETURN nodeId, parentId, weight ORDER BY nodeId;
    """)
    assert [(r["nodeId"], r["parentId"], r["weight"]) for r in got] == [
        ("a", "a", 0.0), ("b", "a", 1.0), ("c", "b", 2.0), ("d", "c", 1.0),
    ]
    with pytest.raises(CypherUnsupported, match="sourceNode"):
        rows(spark, (nodes, edges), """
        CALL gds.spanningTree.stream('g') YIELD nodeId, parentId, weight
        RETURN nodeId, parentId, weight;
        """)
    with pytest.raises(CypherUnsupported, match="not in the projection"):
        rows(spark, (nodes, edges), """
        CALL gds.spanningTree.stream('g', {sourceNode: 'zz'})
        YIELD nodeId, parentId, weight RETURN nodeId, parentId, weight;
        """)


def test_gds_k_spanning_tree_stream(spark):
    """gds.kSpanningTree.stream: cutting the heaviest MSF edge of the
    weighted path a-b(1), b-c(10), c-d(1) at k=2 leaves single-linkage
    clusters {a,b} and {c,d}, labeled by smallest member; k is required."""
    from cognee_graphdb_spark.plans.cypher import CypherUnsupported

    nodes = spark.createDataFrame([(i,) for i in "abcd"], "id string")
    edges = spark.createDataFrame(
        [("a", "b", "1"), ("b", "c", "10"), ("c", "d", "1")],
        "src string, dst string, w string",
    ).selectExpr(
        "src", "dst", "'r' AS relationship_name", "map('w', w) AS properties"
    )
    got = rows(spark, (nodes, edges), """
    CALL gds.kSpanningTree.stream('g', {k: 2, relationshipWeightProperty: 'w'})
    YIELD nodeId, communityId RETURN nodeId, communityId ORDER BY nodeId;
    """)
    assert [(r["nodeId"], r["communityId"]) for r in got] == [
        ("a", "a"), ("b", "a"), ("c", "c"), ("d", "c"),
    ]
    with pytest.raises(CypherUnsupported, match="k config key"):
        rows(spark, (nodes, edges), """
        CALL gds.kSpanningTree.stream('g') YIELD nodeId, communityId
        RETURN nodeId, communityId;
        """)


def test_gds_random_walk_stream(spark):
    """gds.randomWalk.stream: walkLength counts NODES (GDS convention —
    operator steps + 1), every walk matches the random_walks operator's
    step-ordered trace under the same seed, and equal seeds reproduce
    bit-identically (the restartable-corpus property)."""
    from cognee_graphdb_spark.operators.graph_metrics import random_walks

    nodes = spark.createDataFrame([(i,) for i in "abcd"], "id string")
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("c", "d", "r"), ("d", "a", "r")],
        "src string, dst string, relationship_name string",
    )
    q = """
    CALL gds.randomWalk.stream('g', {walkLength: 4, walksPerNode: 2,
        randomSeed: 11})
    YIELD nodeIds RETURN nodeIds;
    """
    got = sorted(tuple(r["nodeIds"]) for r in rows(spark, (nodes, edges), q))
    assert len(got) == 8 and all(len(w) == 4 for w in got)
    again = sorted(tuple(r["nodeIds"]) for r in rows(spark, (nodes, edges), q))
    assert got == again
    w = random_walks(edges, walk_length=3, num_walks=2, seed=11)
    expect = sorted(
        tuple(n for _, n in sorted((r["step"], r["node"]) for r in grp))
        for grp in _group_walks(w.collect())
    )
    assert got == expect


def _group_walks(rows_):
    by_key = {}
    for r in rows_:
        by_key.setdefault((r["start"], r["walk"]), []).append(r)
    return by_key.values()


def test_gds_modularity_stats_and_mutate_composition(spark):
    """The GDS chaining workflow ending in a quality score: project ->
    louvain.mutate writes 'community' into the cached projection ->
    modularity.stream reads it per-community and modularity.stats sums the
    exact contributions once.  On two triangles + bridge, louvain finds the
    triangles, so Q = 2 * 35/196 total (test_gds_modularity_stream's
    arithmetic)."""
    from cognee_graphdb_spark.plans.cypher import run_cypher

    nodes = spark.createDataFrame(
        [(i, i, "E") for i in "abcxyz"], "id string, name string, type string"
    )
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("a", "c", "r"),
         ("x", "y", "r"), ("y", "z", "r"), ("x", "z", "r"), ("c", "x", "r")],
        "src string, dst string, relationship_name string",
    )
    name = "mod_chain_test"
    run_cypher(spark, nodes, edges, f"CALL gds.graph.drop('{name}', false)").collect()
    run_cypher(spark, nodes, edges, f"CALL gds.graph.project('{name}', '*', '*')").collect()
    try:
        run_cypher(
            spark, nodes, edges,
            f"CALL gds.louvain.mutate('{name}', {{mutateProperty: 'community'}}) "
            "YIELD nodePropertiesWritten RETURN nodePropertiesWritten;",
        ).collect()
        per = run_cypher(
            spark, nodes, edges,
            f"CALL gds.modularity.stream('{name}', "
            "{communityProperty: 'community'}) "
            "YIELD communityId, modularity RETURN communityId, modularity;",
        ).collect()
        assert sorted(round(r["modularity"], 9) for r in per) == [
            round(35 / 196, 9)] * 2
        [tot] = run_cypher(
            spark, nodes, edges,
            f"CALL gds.modularity.stats('{name}', "
            "{communityProperty: 'community'}) "
            "YIELD communityCount, modularity RETURN communityCount, modularity;",
        ).collect()
        assert tot["communityCount"] == 2
        assert round(tot["modularity"], 9) == round(70 / 196, 9)
    finally:
        run_cypher(spark, nodes, edges, f"CALL gds.graph.drop('{name}')").collect()


def test_gds_node2vec_stream(spark):
    """gds.node2vec.stream: biased walks -> skip-gram pairs -> SPPMI-SVD
    (the deterministic SGNS factorization, shift = negativeSamplingRate).
    Shape and seed-reproducibility are the contract here (factor values are
    float-tolerance work pinned in test_node_embeddings); an
    embeddingDimension above the node count refuses naming the bound."""
    import pytest as _pytest

    from cognee_graphdb_spark.plans.cypher import CypherUnsupported

    nodes = spark.createDataFrame([(i,) for i in "abcdef"], "id string")
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("c", "d", "r"), ("d", "e", "r"),
         ("e", "f", "r"), ("f", "a", "r"), ("a", "c", "r")],
        "src string, dst string, relationship_name string",
    )
    q = """
    CALL gds.node2vec.stream('g', {embeddingDimension: 2, walkLength: 4,
        walksPerNode: 2, returnFactor: 2.0, inOutFactor: 0.5, windowSize: 2,
        negativeSamplingRate: 1, randomSeed: 5})
    YIELD nodeId, embedding RETURN nodeId, embedding;
    """
    got = {r["nodeId"]: tuple(r["embedding"]) for r in rows(spark, (nodes, edges), q)}
    assert set(got) == set("abcdef")
    assert all(len(v) == 2 for v in got.values())
    again = {r["nodeId"]: tuple(r["embedding"]) for r in rows(spark, (nodes, edges), q)}
    assert {k: tuple(round(x, 7) for x in v) for k, v in got.items()} == {
        k: tuple(round(x, 7) for x in v) for k, v in again.items()
    }
    with _pytest.raises(CypherUnsupported, match="exceeds the projection's"):
        rows(spark, (nodes, edges), """
        CALL gds.node2vec.stream('g', {embeddingDimension: 64})
        YIELD nodeId, embedding RETURN nodeId, embedding;
        """)


def test_gds_modularity_refuses_null_communities(spark):
    """A NULL community value would be grouped as a real community (spurious
    negative contribution, inflated communityCount) — both modularity modes
    refuse loudly instead (r12c review fix)."""
    from cognee_graphdb_spark.plans.cypher import CypherUnsupported

    nodes = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", None)], "id string, community long"
    )
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r")],
        "src string, dst string, relationship_name string",
    )
    for mode in ("stream", "stats"):
        with pytest.raises(CypherUnsupported, match="NULL 'community'"):
            rows(spark, (nodes, edges), f"""
            CALL gds.modularity.{mode}('g', {{communityProperty: 'community'}})
            YIELD {'communityId, modularity' if mode == 'stream' else 'communityCount, modularity'}
            RETURN modularity;
            """)


def test_gds_k_spanning_tree_counts_isolated_nodes(spark):
    """Edge-less projected nodes are singleton clusters that count toward k
    (r12c review fix): with e isolated and k=2, the correct answer keeps the
    a-b-c-d chain WHOLE ({a..d} + {e}) instead of cutting c-d and dropping e."""
    nodes = spark.createDataFrame([(i,) for i in "abcde"], "id string")
    edges = spark.createDataFrame(
        [("a", "b", "1"), ("b", "c", "2"), ("c", "d", "3")],
        "src string, dst string, w string",
    ).selectExpr(
        "src", "dst", "'r' AS relationship_name", "map('w', w) AS properties"
    )
    got = rows(spark, (nodes, edges), """
    CALL gds.kSpanningTree.stream('g', {k: 2, relationshipWeightProperty: 'w'})
    YIELD nodeId, communityId RETURN nodeId, communityId ORDER BY nodeId;
    """)
    assert [(r["nodeId"], r["communityId"]) for r in got] == [
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"), ("e", "e"),
    ]
    # k=3: one singleton + a cut of the heaviest chain edge (c-d)
    got = rows(spark, (nodes, edges), """
    CALL gds.kSpanningTree.stream('g', {k: 3, relationshipWeightProperty: 'w'})
    YIELD nodeId, communityId RETURN nodeId, communityId ORDER BY nodeId;
    """)
    assert [(r["nodeId"], r["communityId"]) for r in got] == [
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "e"),
    ]


def test_gds_spanning_tree_max_depth_config(spark):
    """A spanning tree deeper than maxDepth refuses naming the config key
    (CypherUnsupported, not a raw RuntimeError); raising maxDepth streams
    the full tree (r12c review fix — MST depth can exceed graph diameter)."""
    from cognee_graphdb_spark.plans.cypher import CypherUnsupported

    nodes = spark.createDataFrame([(f"n{i}",) for i in range(6)], "id string")
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}", "r") for i in range(5)],
        "src string, dst string, relationship_name string",
    )
    with pytest.raises(CypherUnsupported, match="maxDepth"):
        rows(spark, (nodes, edges), """
        CALL gds.spanningTree.stream('g', {sourceNode: 'n0', maxDepth: 2})
        YIELD nodeId, parentId, weight RETURN nodeId, parentId, weight;
        """)
    got = rows(spark, (nodes, edges), """
    CALL gds.spanningTree.stream('g', {sourceNode: 'n0', maxDepth: 16})
    YIELD nodeId, parentId, weight RETURN nodeId, parentId, weight ORDER BY nodeId;
    """)
    assert [(r["nodeId"], r["parentId"]) for r in got] == [
        ("n0", "n0"), ("n1", "n0"), ("n2", "n1"), ("n3", "n2"),
        ("n4", "n3"), ("n5", "n4"),
    ]


def test_gds_node2vec_config_refusals(spark):
    """Every node2vec knob validates at the CALL surface naming the GDS
    config key, never an operator-internal parameter (r12c review fix)."""
    from cognee_graphdb_spark.plans.cypher import CypherUnsupported

    nodes = spark.createDataFrame([(i,) for i in "abc"], "id string")
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r")],
        "src string, dst string, relationship_name string",
    )
    for bad in ("walksPerNode: 0", "windowSize: 0", "negativeSamplingRate: 0"):
        with pytest.raises(CypherUnsupported, match="walksPerNode, windowSize"):
            rows(spark, (nodes, edges), f"""
            CALL gds.node2vec.stream('g', {{embeddingDimension: 2, {bad}}})
            YIELD nodeId, embedding RETURN nodeId, embedding;
            """)
