"""Cypher WRITE subset -> GraphStore execution.

The reference's graph adapters issue three write-Cypher shapes internally
(kuzu/adapter.py):

1. batch node upsert (adapter.py:428-442)::

    UNWIND $nodes AS node
    MERGE (n:Node {id: node.id})
    ON CREATE SET n.name = node.name, n.type = node.type, ...
    ON MATCH SET n.name = node.name, ...

2. batch edge upsert (adapter.py:711-725)::

    UNWIND $edges AS edge
    MATCH (from:Node), (to:Node)
    WHERE from.id = edge.from_id AND to.id = edge.to_id
    MERGE (from)-[r:EDGE {relationship_name: edge.relationship_name}]->(to)
    ON CREATE SET r.properties = edge.properties, ...

3. node delete (adapter.py:737-755)::

    MATCH (n:Node) WHERE n.id = $id DETACH DELETE n
    MATCH (n:Node) WHERE n.id IN $ids DETACH DELETE n

This module parses exactly that subset (plus plain ``CREATE/MERGE (n:Label
{...})`` without UNWIND) and executes it against a
:class:`~cognee_graphdb_spark.sources.sinks.GraphStore`: MERGE-on-id becomes
``upsert_nodes`` (the store's merge key IS the id), the edge MERGE becomes an
endpoint-existence semi-join + ``upsert_edges`` (MATCH semantics: an edge
whose endpoint is absent is NOT created, exactly like the reference query),
and DETACH DELETE becomes ``delete_nodes`` (incident edges + vector rows go
with it, matching DETACH).

Divergences, documented: ON CREATE SET and ON MATCH SET collapse — the
store's upsert replaces a matched row with the incoming version, so the union
of both SET lists is applied unconditionally (the reference's lists differ
only in ``created_at`` preservation).  ``timestamp(expr)`` evaluates to its
argument.  A ``properties`` assignment whose value is a JSON object string is
parsed into the engine's ``map<string,string>`` properties column.

The READ dialect stays in plans/cypher.py; the CYPHER search type remains
read-only (cypher_search_retriever.py forwards reads) — writes come through
``CogneeSpark.cypher_write`` or this function, permission-gated like the rest
of the mutation API.
"""

from __future__ import annotations

import json
from typing import Any

from cognee_graphdb_spark.plans.cypher import CypherUnsupported, _tokenize

_NODE_COLS = ("id", "name", "type")


class _WriteParser:
    def __init__(self, query: str, params: dict | None):
        self.toks, self.raws = _tokenize(query)
        self.i = 0
        self.params = params or {}

    # -- token helpers (names are case-insensitive clause words here) --------
    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_word(self, *words: str) -> bool:
        t = self.peek()
        return t[0] in ("name", "kw") and t[1].upper() in words

    def eat_word(self, *words: str) -> str:
        if not self.at_word(*words):
            raise CypherUnsupported(f"expected {'/'.join(words)}, got {self.peek()!r}")
        return self.next()[1].upper()

    def accept_op(self, op: str) -> bool:
        if self.peek() == ("op", op):
            self.i += 1
            return True
        return False

    def expect_op(self, op: str) -> None:
        if not self.accept_op(op):
            raise CypherUnsupported(f"expected {op!r}, got {self.peek()!r}")

    def name(self) -> str:
        t = self.next()
        if t[0] not in ("name", "kw"):
            raise CypherUnsupported(f"expected a name, got {t!r}")
        return t[1]

    # -- expressions over one UNWIND binding ---------------------------------
    def expr(self):
        """-> callable(binding_dict) -> value."""
        t = self.next()
        if t[0] == "param":
            key = t[1][1:]
            if key not in self.params:
                raise CypherUnsupported(f"missing parameter ${key}")
            val = self.params[key]
            return lambda b, v=val: v
        if t[0] == "str":
            from cognee_graphdb_spark.plans.cypher import _unescape

            s = _unescape(t[1][1:-1])
            return lambda b, v=s: v
        if t[0] == "num":
            v = float(t[1]) if "." in t[1] else int(t[1])
            return lambda b, v=v: v
        if t == ("kw", "NULL"):
            return lambda b: None
        if t == ("kw", "TRUE"):
            return lambda b: True
        if t == ("kw", "FALSE"):
            return lambda b: False
        if t[0] in ("name", "kw"):
            word = t[1]
            if self.peek() == ("op", "("):  # timestamp(expr) and friends: identity
                self.next()
                inner = self.expr()
                self.expect_op(")")
                return inner
            if self.accept_op("."):
                field = self.name()
                return lambda b, u=word, f=field: _field(b, u, f)
            raise CypherUnsupported(f"bare identifier {word!r} is not a value")
        raise CypherUnsupported(f"unsupported value token {t!r}")

    def prop_map(self) -> dict[str, Any]:
        """'{' k ':' expr, ... '}' -> {key: thunk}."""
        out = {}
        self.expect_op("{")
        while True:
            key = self.name()
            self.expect_op(":")
            out[key] = self.expr()
            if not self.accept_op(","):
                break
        self.expect_op("}")
        return out

    def on_set_clauses(self, var: str) -> dict[str, Any]:
        """(ON CREATE SET ... | ON MATCH SET ... | SET ...)* -> merged
        {field: thunk} for assignments on ``var`` (both branches union)."""
        sets: dict[str, Any] = {}
        while True:
            if self.at_word("ON"):
                self.next()
                self.eat_word("CREATE", "MATCH")
                self.eat_word("SET")
            elif self.at_word("SET"):
                self.next()
            else:
                return sets
            while True:
                target = self.name()
                self.expect_op(".")
                field = self.name()
                self.expect_op("=")
                thunk = self.expr()
                if target == var:
                    sets[field] = thunk
                if not self.accept_op(","):
                    break


def _field(binding: dict, var: str, field: str):
    if var not in binding:
        raise CypherUnsupported(f"unbound variable {var!r} in value expression")
    item = binding[var]
    if isinstance(item, dict):
        return item.get(field)
    raise CypherUnsupported(f"{var}.{field}: UNWIND elements must be maps")


def _coerce_props(value) -> dict[str, str] | None:
    """A JSON-object string (the reference stores properties as JSON text)
    becomes the engine's map<string,string>; dicts pass through."""
    if value is None:
        return None
    if isinstance(value, dict):
        return {str(k): str(v) for k, v in value.items()}
    if isinstance(value, str) and value.lstrip().startswith("{"):
        try:
            parsed = json.loads(value)
            if isinstance(parsed, dict):
                return {str(k): str(v) for k, v in parsed.items()}
        except ValueError:
            pass
    return {"value": str(value)}


def run_cypher_write(store, query: str, params: dict | None = None) -> dict[str, int]:
    """Parse + execute one write statement against ``store`` (a GraphStore).

    Returns counts: {"nodes_upserted": n} / {"edges_upserted": n} /
    {"nodes_deleted": n}.  Raises CypherUnsupported outside the subset.
    """
    p = _WriteParser(query, params)
    bindings: list[dict] = [{}]
    uvar = None
    if p.peek() == ("kw", "UNWIND"):
        p.next()
        t = p.next()
        if t[0] != "param":
            raise CypherUnsupported("UNWIND in write statements takes a $param list")
        items = p.params.get(t[1][1:])
        if not isinstance(items, (list, tuple)):
            raise CypherUnsupported("UNWIND parameter must be a list")
        if p.next() != ("kw", "AS"):
            raise CypherUnsupported("UNWIND needs AS")
        uvar = p.name()
        bindings = [{uvar: item} for item in items]

    if p.at_word("CREATE", "MERGE"):
        return _node_upsert(p, store, bindings)
    if p.peek() == ("kw", "MATCH"):
        return _match_statement(p, store, bindings)
    raise CypherUnsupported("write statements start with UNWIND/CREATE/MERGE/MATCH")


def _node_upsert(p: _WriteParser, store, bindings: list[dict]) -> dict[str, int]:
    """(CREATE|MERGE) (n[:Label] {k: v, ...}) [ON ... SET ...]*"""
    p.next()  # CREATE | MERGE
    p.expect_op("(")
    var = p.name()
    label = None
    if p.accept_op(":"):
        label = p.name()
    pattern = p.prop_map() if p.peek() == ("op", "{") else {}
    p.expect_op(")")
    sets = p.on_set_clauses(var)

    rows = []
    for b in bindings:
        fields: dict[str, Any] = {k: thunk(b) for k, thunk in pattern.items()}
        for k, thunk in sets.items():
            fields[k] = thunk(b)
        if label and label != "Node" and "type" not in fields:
            fields["type"] = label
        if "id" not in fields or fields["id"] is None:
            raise CypherUnsupported("node MERGE/CREATE needs an id")
        rows.append(
            (
                str(fields["id"]),
                None if fields.get("name") is None else str(fields["name"]),
                None if fields.get("type") is None else str(fields["type"]),
                _coerce_props(fields.get("properties")),
            )
        )
    df = store.spark.createDataFrame(
        rows, "id string, name string, type string, properties map<string,string>"
    )
    store.upsert_nodes(df, created_by="cypher_write")
    return {"nodes_upserted": len(rows)}


def _match_statement(p: _WriteParser, store, bindings: list[dict]) -> dict[str, int]:
    """MATCH (a[:L]) [, (b[:L])] [WHERE conds] (DETACH DELETE a | MERGE edge)"""
    p.next()  # MATCH
    node_vars: list[str] = []
    while True:
        p.expect_op("(")
        node_vars.append(p.name())
        if p.accept_op(":"):
            p.name()  # label — :Node matches all in this engine
        p.expect_op(")")
        if not p.accept_op(","):
            break
    # WHERE: conjunction of var.id = expr | var.id IN expr
    conds: dict[str, Any] = {}
    if p.peek() == ("kw", "WHERE"):
        p.next()
        while True:
            var = p.name()
            p.expect_op(".")
            field = p.name()
            if field != "id":
                raise CypherUnsupported("write MATCH filters bind on id only")
            if p.peek() == ("kw", "IN"):
                p.next()
                thunk = p.expr()
                conds[var] = ("in", thunk)
            else:
                p.expect_op("=")
                thunk = p.expr()
                conds[var] = ("eq", thunk)
            if p.peek() != ("kw", "AND"):
                break
            p.next()

    if p.at_word("DETACH"):
        p.next()
        p.eat_word("DELETE")
        target = p.name()
        if target not in node_vars or target not in conds:
            raise CypherUnsupported("DETACH DELETE needs an id-bound matched variable")
        kind, thunk = conds[target]
        ids: list[str] = []
        for b in bindings:
            v = thunk(b)
            ids.extend(str(x) for x in v) if kind == "in" else ids.append(str(v))
        ids_df = store.spark.createDataFrame([(i,) for i in sorted(set(ids))], ["id"])
        store.delete_nodes(ids_df, created_by="cypher_write")
        return {"nodes_deleted": len(set(ids))}

    if p.at_word("MERGE"):
        return _edge_upsert(p, store, bindings, node_vars, conds)
    raise CypherUnsupported("MATCH in a write statement must end in DETACH DELETE or MERGE")


def _edge_upsert(p, store, bindings, node_vars, conds) -> dict[str, int]:
    """MERGE (a)-[r:TYPE {k: v}]->(b) [ON ... SET ...]*"""
    from pyspark.sql import functions as F

    p.next()  # MERGE
    p.expect_op("(")
    src_var = p.name()
    p.expect_op(")")
    p.expect_op("-")
    p.expect_op("[")
    rel_var = None
    if p.peek()[0] == "name" and p.peek(1) == ("op", ":"):
        rel_var = p.name()
    p.expect_op(":")
    rtype = p.name()
    rel_map = p.prop_map() if p.peek() == ("op", "{") else {}
    p.expect_op("]")
    if p.next() != ("op", "->"):
        raise CypherUnsupported("edge MERGE must be directed ->")
    p.expect_op("(")
    dst_var = p.name()
    p.expect_op(")")
    sets = p.on_set_clauses(rel_var) if rel_var else {}
    for v in (src_var, dst_var):
        if v not in node_vars or v not in conds:
            raise CypherUnsupported(f"edge endpoint {v!r} must be a matched, id-bound variable")

    rows = []
    for b in bindings:
        kind_s, src_thunk = conds[src_var]
        kind_d, dst_thunk = conds[dst_var]
        if kind_s != "eq" or kind_d != "eq":
            raise CypherUnsupported("edge endpoints bind with = (one edge per UNWIND element)")
        rel_name = None
        if "relationship_name" in rel_map:
            rel_name = rel_map["relationship_name"](b)
        if rel_name is None and rtype != "EDGE":
            rel_name = rtype  # typed pattern [:likes] names the relationship
        if rel_name is None:
            raise CypherUnsupported("edge MERGE needs a relationship_name")
        props = _coerce_props(sets["properties"](b)) if "properties" in sets else None
        rows.append((str(src_thunk(b)), str(dst_thunk(b)), str(rel_name), props))
    incoming = store.spark.createDataFrame(
        rows, "src string, dst string, relationship_name string, properties map<string,string>"
    )
    nodes = store.load("nodes")
    if nodes is None:
        return {"edges_upserted": 0}
    # MATCH semantics: an edge whose endpoint is missing is NOT created —
    # two semi-joins against the stored node ids (broadcast: the incoming
    # batch is the small side)
    ids = nodes.select("id")
    matched = (
        incoming.join(ids.withColumnRenamed("id", "src"), "src", "leftsemi")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "leftsemi")
        .select("src", "dst", "relationship_name", "properties")
    )
    matched = matched.localCheckpoint(eager=True)
    n = matched.count()
    if n:
        store.upsert_edges(matched, created_by="cypher_write")
    return {"edges_upserted": n}
