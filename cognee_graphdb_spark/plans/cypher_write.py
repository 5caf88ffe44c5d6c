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

Multi-tenancy: pass ``dataset_id`` (``CogneeSpark.cypher_write`` passes its
own) and the written rows carry it, upserts merge per-dataset, endpoint
matching sees only that dataset's nodes, and deletes are scoped — the same
isolation every other mutation path has (the reference runs one graph DB per
dataset; search.py:322).

Statements parse COMPLETELY before any mutation runs (trailing tokens are an
error, not silent truncation), and the returned counts reflect rows actually
written/deleted.

Divergences, documented: ON CREATE SET and ON MATCH SET collapse — the union
of both SET lists is applied unconditionally (the reference's lists differ
only in ``created_at`` preservation).  ``timestamp(expr)`` evaluates to its
argument.  A ``properties`` assignment whose value is a JSON object string is
parsed into the engine's ``map<string,string>`` properties column.  MERGE is
otherwise non-destructive, per openCypher: fields a statement does not assign
keep the matched row's stored values, and assignments outside the engine's
node/edge schema (``SET n.score = 5``, a rel-pattern ``{weight: 1}``, the
reference's own created_at/updated_at) fold into the properties map rather
than being dropped — assigning NULL removes the key.

The READ dialect stays in plans/cypher.py; the CYPHER search type remains
read-only (cypher_search_retriever.py forwards reads) — writes come through
``CogneeSpark.cypher_write`` or this function, permission-gated like the rest
of the mutation API.
"""

from __future__ import annotations

import json
from typing import Any

from cognee_graphdb_spark.plans.cypher import CypherUnsupported, _TokenCursor, _tokenize, _unescape


def classify_cypher_write(query: str) -> str:
    """'delete' for DETACH DELETE statements, 'write' otherwise — decided on
    the TOKEN stream (comments already stripped by the tokenizer), so the
    permission class can never diverge from what the parser executes."""
    toks, _ = _tokenize(query)
    for j in range(len(toks) - 1):
        if (
            toks[j][0] in ("name", "kw")
            and toks[j][1].upper() == "DETACH"
            and toks[j + 1][0] in ("name", "kw")
            and toks[j + 1][1].upper() == "DELETE"
        ):
            return "delete"
    return "write"


class _WriteParser(_TokenCursor):
    def __init__(self, query: str, params: dict | None):
        self.toks, self.raws = _tokenize(query)
        self.i = 0
        self.params = params or {}

    # -- clause words (ON/SET/MERGE/... tokenize as names; case-insensitive) --
    def at_word(self, *words: str) -> bool:
        t = self.peek()
        return t[0] in ("name", "kw") and t[1].upper() in words

    def eat_word(self, *words: str) -> str:
        if not self.at_word(*words):
            raise CypherUnsupported(f"expected {'/'.join(words)}, got {self.peek()!r}")
        return self.next()[1].upper()

    def accept_op(self, op: str) -> bool:
        return self.accept("op", op)

    def expect_op(self, op: str) -> None:
        if not self.accept_op(op):
            raise CypherUnsupported(f"expected {op!r}, got {self.peek()!r}")

    def expect_end(self) -> None:
        """The whole statement must have been consumed — trailing clauses
        would otherwise be silently dropped (partial execution)."""
        if self.peek()[0] != "end":
            raise CypherUnsupported(f"trailing tokens near {self.peek()[1]!r}")

    # -- expressions over one UNWIND binding ---------------------------------
    def expr(self):
        """-> callable(binding_dict) -> value."""
        t = self.peek()
        if t[0] == "param":
            self.next()
            key = t[1][1:]
            if key not in self.params:
                raise CypherUnsupported(f"missing parameter ${key}")
            val = self.params[key]
            return lambda b, v=val: v
        if t[0] == "str":
            self.next()
            s = _unescape(t[1][1:-1])
            return lambda b, v=s: v
        if t[0] == "num":
            self.next()
            v = float(t[1]) if "." in t[1] else int(t[1])
            return lambda b, v=v: v
        if t == ("kw", "NULL"):
            self.next()
            return lambda b: None
        if t == ("kw", "TRUE"):
            self.next()
            return lambda b: True
        if t == ("kw", "FALSE"):
            self.next()
            return lambda b: False
        if t[0] in ("name", "kw"):
            word = self._ident()  # raw spelling, keyword-colliding names intact
            if self.peek() == ("op", "("):  # timestamp(expr) and friends: identity
                self.next()
                inner = self.expr()
                self.expect_op(")")
                return inner
            if self.accept_op("."):
                field = self._ident()
                return lambda b, u=word, f=field: _field(b, u, f)
            raise CypherUnsupported(f"bare identifier {word!r} is not a value")
        raise CypherUnsupported(f"unsupported value token {t!r}")

    def prop_map(self) -> dict[str, Any]:
        """'{' k ':' expr, ... '}' -> {key: thunk}."""
        out = {}
        self.expect_op("{")
        while True:
            key = self._ident()
            self.expect_op(":")
            out[key] = self.expr()
            if not self.accept_op(","):
                break
        self.expect_op("}")
        return out

    def on_set_clauses(self, var: str | None) -> dict[str, Any]:
        """(ON CREATE SET ... | ON MATCH SET ... | SET ...)* -> merged
        {field: thunk} for assignments on ``var`` (both branches union).
        Assignments to any OTHER variable are an error — silently ignoring
        them would be partial execution."""
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
                target = self._ident()
                self.expect_op(".")
                field = self._ident()
                self.expect_op("=")
                thunk = self.expr()
                if var is None or target != var:
                    raise CypherUnsupported(
                        f"SET on {target!r} is outside this statement's merge target"
                    )
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


def run_cypher_write(
    store, query: str, params: dict | None = None, dataset_id: str | None = None
) -> dict[str, int]:
    """Parse + execute one write statement against ``store`` (a GraphStore).

    Returns counts of rows actually written/deleted: {"nodes_upserted": n} /
    {"edges_upserted": n} / {"nodes_deleted": n}.  Raises CypherUnsupported
    outside the subset.  ``dataset_id`` scopes every row and match (see
    module docstring).
    """
    p = _WriteParser(query, params)
    bindings: list[dict] = [{}]
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
        uvar = p._ident()
        bindings = [{uvar: item} for item in items]

    if p.at_word("CREATE", "MERGE"):
        return _node_upsert(p, store, bindings, dataset_id)
    if p.peek() == ("kw", "MATCH"):
        return _match_statement(p, store, bindings, dataset_id)
    raise CypherUnsupported("write statements start with UNWIND/CREATE/MERGE/MATCH")


def _with_dataset(df, dataset_id: str | None):
    if dataset_id is None:
        return df
    from pyspark.sql import functions as F

    return df.withColumn("dataset_id", F.lit(dataset_id))


_NODE_FIELDS = {"id", "name", "type", "properties"}


def _fold_extras(props: dict[str, str] | None, extras: dict[str, Any]) -> dict[str, str] | None:
    """SET n.x = v outside the engine's node/edge schema lands in the
    properties map (SET n.x = NULL removes the key, openCypher REMOVE-via-null
    semantics) — nothing is silently dropped."""
    if not extras:
        return props
    out = dict(props or {})
    for k, v in extras.items():
        if v is None:
            out.pop(k, None)
        else:
            out[k] = str(v)
    return out


def _node_upsert(p: _WriteParser, store, bindings: list[dict], dataset_id: str | None) -> dict[str, int]:
    """(CREATE|MERGE) (n[:Label] {k: v, ...}) [ON ... SET ...]*

    openCypher MERGE-on-match is non-destructive: fields NOT assigned by the
    pattern or a SET keep the matched node's existing values (a bare
    ``MERGE (n:Node {id:'x'})`` on an existing node is a no-op update), and
    assignments outside the engine's node schema (id/name/type/properties)
    fold into the properties map.  Bindings replay in UNWIND order: a later
    element matching the same id overlays per FIELD, because it matches the
    row the earlier element just wrote."""
    p.next()  # CREATE | MERGE
    p.expect_op("(")
    var = p._ident()
    label = None
    if p.accept_op(":"):
        label = p._ident()
    pattern = p.prop_map() if p.peek() == ("op", "{") else {}
    p.expect_op(")")
    sets = p.on_set_clauses(var)
    p.expect_end()  # parse completes BEFORE any mutation

    entries: list[tuple[str, dict[str, Any]]] = []
    for b in bindings:
        assigned: dict[str, Any] = {k: thunk(b) for k, thunk in pattern.items()}
        for k, thunk in sets.items():
            assigned[k] = thunk(b)
        if label and label != "Node" and "type" not in assigned:
            assigned["type"] = label
        if "id" not in assigned or assigned["id"] is None:
            raise CypherUnsupported("node MERGE/CREATE needs an id")
        entries.append((str(assigned["id"]), assigned))
    if not entries:
        return {"nodes_upserted": 0}

    state = _existing_nodes(store, dataset_id, sorted({nid for nid, _ in entries}))
    for nid, assigned in entries:
        cur = state.get(nid) or {"name": None, "type": None, "properties": None}
        cur = dict(cur)
        if "name" in assigned:
            cur["name"] = assigned["name"]
        if "type" in assigned:
            cur["type"] = assigned["type"]
        if "properties" in assigned:
            cur["properties"] = _coerce_props(assigned["properties"])
        cur["properties"] = _fold_extras(
            cur["properties"], {k: v for k, v in assigned.items() if k not in _NODE_FIELDS}
        )
        state[nid] = cur

    touched = dict.fromkeys(nid for nid, _ in entries)  # batch order, deduped
    rows = [
        (
            nid,
            None if state[nid]["name"] is None else str(state[nid]["name"]),
            None if state[nid]["type"] is None else str(state[nid]["type"]),
            state[nid]["properties"],
        )
        for nid in touched
    ]
    df = store.spark.createDataFrame(
        rows, "id string, name string, type string, properties map<string,string>"
    )
    store.upsert_nodes(_with_dataset(df, dataset_id), created_by="cypher_write")
    return {"nodes_upserted": len(rows)}


def _existing_nodes(store, dataset_id: str | None, ids: list[str]) -> dict[str, dict]:
    """Current scoped field values for the incoming id batch.  The batch is
    driver-built and small by contract (the reference MERGEs 10 at a time,
    kuzu/adapter.py:428), so the collect here is bounded; the store write
    itself stays distributed."""
    from pyspark.sql import functions as F

    nodes = _scoped_nodes(store, dataset_id)
    if nodes is None:
        return {}
    ids_df = store.spark.createDataFrame([(i,) for i in ids], "id string")
    rows = (
        nodes.select("id", "name", "type", "properties")
        .join(F.broadcast(ids_df), "id", "leftsemi")
        .collect()
    )
    return {
        r["id"]: {
            "name": r["name"],
            "type": r["type"],
            "properties": dict(r["properties"]) if r["properties"] is not None else None,
        }
        for r in rows
    }


def _scoped_nodes(store, dataset_id: str | None):
    from pyspark.sql import functions as F

    nodes = store.load("nodes")
    if nodes is not None and dataset_id is not None and "dataset_id" in nodes.columns:
        nodes = nodes.filter(F.col("dataset_id").eqNullSafe(dataset_id))
    return nodes


def _match_statement(p: _WriteParser, store, bindings: list[dict], dataset_id: str | None) -> dict[str, int]:
    """MATCH (a[:L]) [, (b[:L])] [WHERE conds] (DETACH DELETE a | MERGE edge)"""
    p.next()  # MATCH
    node_vars: list[str] = []
    while True:
        p.expect_op("(")
        node_vars.append(p._ident())
        if p.accept_op(":"):
            p._ident()  # label — :Node matches all in this engine
        p.expect_op(")")
        if not p.accept_op(","):
            break
    # WHERE: conjunction of var.id = expr | var.id IN expr
    conds: dict[str, Any] = {}
    if p.peek() == ("kw", "WHERE"):
        p.next()
        while True:
            var = p._ident()
            p.expect_op(".")
            field = p._ident()
            if field != "id":
                raise CypherUnsupported("write MATCH filters bind on id only")
            if p.peek() == ("kw", "IN"):
                p.next()
                conds[var] = ("in", p.expr())
            else:
                p.expect_op("=")
                conds[var] = ("eq", p.expr())
            if p.peek() != ("kw", "AND"):
                break
            p.next()

    if p.at_word("DETACH"):
        p.next()
        p.eat_word("DELETE")
        target = p._ident()
        p.expect_end()
        if target not in node_vars or target not in conds:
            raise CypherUnsupported("DETACH DELETE needs an id-bound matched variable")
        kind, thunk = conds[target]
        ids: set[str] = set()
        for b in bindings:
            v = thunk(b)
            if kind == "in":
                ids.update(str(x) for x in v)
            else:
                ids.add(str(v))
        if not ids:
            return {"nodes_deleted": 0}
        ids_df = store.spark.createDataFrame([(i,) for i in sorted(ids)], "id string")
        nodes = _scoped_nodes(store, dataset_id)
        # count what actually exists in scope — Cypher reports real deletions,
        # not the size of the requested id list
        n = 0 if nodes is None else nodes.join(ids_df, "id", "leftsemi").count()
        if n:
            store.delete_nodes(ids_df, created_by="cypher_write", dataset_id=dataset_id)
        return {"nodes_deleted": n}

    if p.at_word("MERGE"):
        return _edge_upsert(p, store, bindings, node_vars, conds, dataset_id)
    raise CypherUnsupported("MATCH in a write statement must end in DETACH DELETE or MERGE")


def _edge_upsert(p, store, bindings, node_vars, conds, dataset_id) -> dict[str, int]:
    """MERGE (a)-[r:TYPE {k: v}]->(b) [ON ... SET ...]*

    Same non-destructive rules as the node path: rel-pattern map keys beyond
    the merge key (``relationship_name``) and SET fields beyond ``properties``
    fold into the edge's properties map, and a matched edge keeps its stored
    properties where the statement doesn't assign them.  Bindings replay in
    UNWIND order (a later element matching the same (src, dst,
    relationship_name) overlays the earlier one's result)."""
    p.next()  # MERGE
    p.expect_op("(")
    src_var = p._ident()
    p.expect_op(")")
    p.expect_op("-")
    p.expect_op("[")
    rel_var = None
    if p.peek()[0] in ("name", "kw") and p.peek(1) == ("op", ":"):
        rel_var = p._ident()
    p.expect_op(":")
    rtype = p._ident()
    rel_map = p.prop_map() if p.peek() == ("op", "{") else {}
    p.expect_op("]")
    if p.next() != ("op", "->"):
        raise CypherUnsupported("edge MERGE must be directed ->")
    p.expect_op("(")
    dst_var = p._ident()
    p.expect_op(")")
    sets = p.on_set_clauses(rel_var)
    p.expect_end()
    for v in (src_var, dst_var):
        if v not in node_vars or v not in conds:
            raise CypherUnsupported(f"edge endpoint {v!r} must be a matched, id-bound variable")

    entries: list[tuple[tuple, dict[str, Any], dict[str, Any]]] = []
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
        assigned: dict[str, Any] = {}
        if "properties" in sets:
            assigned["properties"] = sets["properties"](b)
        extras: dict[str, Any] = {
            k: thunk(b) for k, thunk in rel_map.items() if k != "relationship_name"
        }
        for k, thunk in sets.items():
            if k != "properties":
                extras[k] = thunk(b)
        key = (str(src_thunk(b)), str(dst_thunk(b)), str(rel_name))
        entries.append((key, assigned, extras))
    if not entries:
        return {"edges_upserted": 0}

    state = _existing_edge_props(store, dataset_id, sorted({k for k, _, _ in entries}))
    for key, assigned, extras in entries:
        props = (
            _coerce_props(assigned["properties"]) if "properties" in assigned else state.get(key)
        )
        state[key] = _fold_extras(props, extras)

    touched = dict.fromkeys(k for k, _, _ in entries)  # batch order, deduped
    incoming = store.spark.createDataFrame(
        [(*k, state[k]) for k in touched],
        "src string, dst string, relationship_name string, properties map<string,string>",
    )
    nodes = _scoped_nodes(store, dataset_id)
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
        store.upsert_edges(_with_dataset(matched, dataset_id), created_by="cypher_write")
    return {"edges_upserted": n}


def _existing_edge_props(store, dataset_id: str | None, keys: list[tuple]) -> dict[tuple, dict | None]:
    """Stored properties for the incoming (src, dst, relationship_name) batch,
    dataset-scoped — bounded collect, same contract as :func:`_existing_nodes`."""
    from pyspark.sql import functions as F

    edges = store.load("edges")
    if edges is None or "properties" not in edges.columns:
        return {}
    if dataset_id is not None and "dataset_id" in edges.columns:
        edges = edges.filter(F.col("dataset_id").eqNullSafe(dataset_id))
    keys_df = store.spark.createDataFrame(
        list(keys), "src string, dst string, relationship_name string"
    )
    rows = (
        edges.select("src", "dst", "relationship_name", "properties")
        .join(F.broadcast(keys_df), ["src", "dst", "relationship_name"], "leftsemi")
        .collect()
    )
    return {
        (r["src"], r["dst"], r["relationship_name"]): (
            dict(r["properties"]) if r["properties"] is not None else None
        )
        for r in rows
    }
