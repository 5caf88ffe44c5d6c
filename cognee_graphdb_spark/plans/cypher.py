"""Cypher subset -> Spark SQL translator (CYPHER search type, real dialect).

The reference executes raw Cypher through whichever graph DB is configured
(cypher_search_retriever.py:29-51 just forwards the string to
``graph_engine.query``).  Its own code and tests exercise a small, very
regular Cypher subset — e.g.::

    MATCH (n:Node) RETURN count(n) as c                    # kuzu/adapter.py:146
    MATCH (n:Node)-[r:EDGE]->(m:Node) RETURN count(r) as c # kuzu/adapter.py:150
    MATCH (n:Node) WHERE n.id = $id RETURN COUNT(n) > 0    # kuzu/adapter.py:322
    MATCH (n:Node) WHERE n.id IN $ids RETURN n.id          # kuzu/adapter.py:478
    MATCH (c:Customer {id: $cid})
    OPTIONAL MATCH (c)-[:has_preference]->(p:Preference {name: 'ShoeSize'})
    RETURN c.id, p.name                    # examples/low_level/product_recommendation.py:159-160

This module translates that subset onto the engine's native graph views
(``nodes(id, name, type, properties)`` / ``edges(src, dst,
relationship_name)``) as ONE Spark SQL string, so Catalyst plans the whole
thing — a k-hop MATCH chain becomes an ordinary multi-way equi-join that AQE
can broadcast / skew-split like any other.  Queries outside the subset raise
:class:`CypherUnsupported` and the caller falls back to Spark-SQL passthrough.

Translation strategy (scale rationale):

- Every **MATCH** path element adds a table to the FROM list and its linking /
  label / property constraints to WHERE.  Catalyst's join planning converts
  cross-join + equality predicates into equi-joins and reorders them, so we
  deliberately emit the *declarative* form instead of hand-ordering JOIN ... ON
  chains — at 100 TB the optimizer's cost-based order beats the query author's
  textual order.
- Every **OPTIONAL MATCH** path becomes a derived-table LEFT JOIN anchored on
  its already-bound variable(s).  Chained ``LEFT JOIN edges ... LEFT JOIN
  nodes ...`` would be wrong: when the edge matches but the far node's label
  filter fails, Cypher drops the whole optional pattern, and row multiplicity
  must count full pattern matches — only a pre-joined derived table preserves
  both.  A ``WHERE`` following an OPTIONAL MATCH belongs to that pattern
  (openCypher scoping) and lands in the LEFT JOIN's ON clause, which is
  semantically the same place.

Supported grammar (clauses compose in any order before RETURN)::

    UNWIND $param AS x                              -- literal list -> VALUES
    MATCH <path> (',' <path>)* [WHERE <expr>]       -- repeatable; later
    OPTIONAL MATCH <path> [WHERE <expr>]               clauses may re-use vars
    WITH [DISTINCT] item (',' item)*                -- pipeline stage: collapses
         [ORDER BY ...] [SKIP n] [LIMIT n]             to a subquery, implicit
         [WHERE <expr>]                                GROUP BY around aggs;
                                                       WHERE filters the stage
    RETURN [DISTINCT] item (',' item)*              -- implicit GROUP BY;
    [ORDER BY expr [ASC|DESC] (',' ...)*] [SKIP n] [LIMIT n]
    [UNION [ALL] <query>]*                          -- same column names per branch
    -- '//' line comments allowed; { k: expr, ... } map projections in RETURN,
       plus variable map projections n { .name, k: expr }.
    -- The reference's product_recommendation.py example query (UNWIND ->
       MATCH/WHERE -> WITH agg ORDER BY LIMIT -> MATCH -> RETURN) runs as-is.

    path: '(' [var][':'Label][{k: lit, ...}] ')'
          ( ('-'|'<-') '[' [var][':'TYPE]['*'[lo]['..'hi]] ']' ('->'|'-') node )*
          -- variable-length hops need an explicit upper bound ([*1..3]) and
             cannot bind a variable; one row per path, edges unique per path
    expr: = <> < <= > >=, AND/OR/NOT, IN <list|$param>, IS [NOT] NULL,
          CONTAINS / STARTS WITH / ENDS WITH, =~ (anchored regex),
          count/min/max/sum/avg/collect, $params, literals,
          scalar fns: toLower/toUpper/trim/ltrim/rtrim/size/coalesce/abs/
          round/replace/reverse/left/right/toString/toInteger/toFloat.

Mapping rules:

- node label ``:X`` -> ``type = 'X'``; ``:Node`` is the reference's physical
  Kuzu table label and matches everything, so it is a no-op.  Edge type
  ``[:X]`` -> ``relationship_name = 'X'`` (``:EDGE`` likewise no-op).
- ``v.id/name/type`` (nodes) and ``v.src/dst/relationship_name`` (edges) are
  direct columns; any other node property reads ``properties['key']``.
- ``RETURN v`` expands to a ``named_struct`` of the element's key columns,
  mirroring the dict rows the reference adapters return.
- Undirected ``-[r]-`` matches either orientation (a UNION ALL of the edge
  set with its flipped copy; self-loops match once).  Undirected
  variable-length paths are rejected.
- Write clauses (CREATE / MERGE / SET / DELETE / REMOVE) raise
  :class:`CypherWriteUnsupported` — the CYPHER search type is the
  reference's read surface (cypher_search_retriever.py:29-51).  The write
  shapes the reference's adapters issue internally execute through
  :mod:`cognee_graphdb_spark.plans.cypher_write` instead.
"""

from __future__ import annotations

import re
import uuid
import weakref
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class CypherUnsupported(ValueError):
    """Query is outside the translated subset."""


class CypherWriteUnsupported(CypherUnsupported):
    """Write clause on the read-only CYPHER search surface.

    The reference's adapters issue MERGE/SET/DELETE Cypher internally
    (kuzu/adapter.py:382-449,679-732), but the CYPHER *search type* only
    forwards reads (cypher_search_retriever.py:29-51) — writes go through
    the engine's GraphStore API instead."""


_WRITE_CLAUSES = {"CREATE", "MERGE", "SET", "DELETE", "DETACH", "REMOVE"}
_WRITE_HINT = (
    "Cypher write clauses (CREATE / MERGE / SET / DELETE / REMOVE) are not "
    "supported by the read-only CYPHER search type; use engine.cypher_write "
    "(plans/cypher_write.py executes the reference adapters' write shapes) "
    "or the GraphStore API (upsert_nodes / upsert_edges / delete_nodes)."
)


_NODE_COLS = ("id", "name", "type", "properties")
_EDGE_COLS = ("src", "dst", "relationship_name")
_KEYWORDS = {
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "ORDER", "BY", "LIMIT", "SKIP",
    "DISTINCT", "AS", "AND", "OR", "NOT", "IN", "IS", "NULL", "TRUE", "FALSE",
    "CONTAINS", "STARTS", "ENDS", "WITH", "ASC", "DESC", "UNWIND", "UNION",
}
_AGGS = {"COUNT": "count", "MIN": "min", "MAX": "max", "SUM": "sum", "AVG": "avg", "COLLECT": "collect_list"}
# multi-arg / renamed aggregates (neo4j statistics family)
_AGGS_EXTRA = {
    "PERCENTILECONT": "percentile",
    "PERCENTILEDISC": "percentile_approx",
    "STDEV": "stddev_samp",
    "STDEVP": "stddev_pop",
}
# scalar functions: Cypher name -> Spark SQL function (same arity, args pass
# through).  size() maps to length() — this dialect's property values are
# strings (the one array case, labels(n), is a fixed one-element construct).
_SCALAR_FNS = {
    "TOLOWER": "lower", "TOUPPER": "upper", "TRIM": "trim", "LTRIM": "ltrim",
    "RTRIM": "rtrim", "SIZE": "length", "COALESCE": "coalesce", "ABS": "abs",
    "ROUND": "round", "REPLACE": "replace", "REVERSE": "reverse",
    "LEFT": "left", "RIGHT": "right", "SPLIT": "split", "SQRT": "sqrt",
    "FLOOR": "floor", "CEIL": "ceiling", "SIGN": "sign", "EXP": "exp",
    "LOG": "ln", "LOG10": "log10", "SIN": "sin", "COS": "cos", "TAN": "tan",
    "ASIN": "asin", "ACOS": "acos", "ATAN": "atan", "ATAN2": "atan2",
    "PI": "pi", "RAND": "rand",
}
# Cypher fns whose SQL shape differs (handled case-by-case in _scalar_fn)
_SPECIAL_FNS = {"SUBSTRING", "HEAD", "LAST", "TAIL", "ISEMPTY", "E"}
# type-conversion functions -> CAST targets
_CAST_FNS = {"TOSTRING": "STRING", "TOINTEGER": "BIGINT", "TOFLOAT": "DOUBLE", "TOBOOLEAN": "BOOLEAN"}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+(?:\.\d+)?)
      | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
      | (?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op><>|<=|>=|=~|<-|->|[()\[\]{}:,.\-=<>*+/%|])
    )""",
    re.VERBOSE,
)


def _unescape(body: str) -> str:
    """Decode the escapes inside a Cypher string token body: ``\\\\`` ``\\'``
    ``\\"`` ``\\n`` ``\\t`` ``\\r``; any other ``\\x`` yields ``x``."""
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            n = body[i + 1]
            out.append({"n": "\n", "t": "\t", "r": "\r"}.get(n, n))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _tokenize(q: str) -> tuple[list[tuple[str, str]], list[str]]:
    """-> (tokens, raws): raws[i] keeps a keyword's original spelling, so
    identifiers that collide with keywords ('contains', 'in', ...) can still
    name labels / relationship types / properties."""
    q = re.sub(r"//[^\n]*", "", q)  # line comments, as in the reference's examples
    toks: list[tuple[str, str]] = []
    raws: list[str] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            rest = q[pos:].strip()
            if not rest:
                break
            raise CypherUnsupported(f"cannot tokenize near: {rest[:30]!r}")
        pos = m.end()
        if m.lastgroup == "name":
            word = m.group("name")
            if word.startswith("`"):
                toks.append(("name", word[1:-1]))
                raws.append(word[1:-1])
            elif word.upper() in _KEYWORDS:
                toks.append(("kw", word.upper()))
                raws.append(word)
            else:
                toks.append(("name", word))
                raws.append(word)
        elif m.lastgroup is not None:
            toks.append((m.lastgroup, m.group(m.lastgroup)))
            raws.append(m.group(m.lastgroup))
    toks.append(("end", ""))
    raws.append("")
    return toks, raws


@dataclass
class _Var:
    kind: str  # "node" | "edge" | "scalar" | "path" | "lambda"
    alias: str  # SQL table alias (inner table, or the derived table for optional/WITH vars)
    prefix: str = ""  # column prefix inside a derived table; for scalar, THE column name

    def col(self, name: str) -> str:
        if self.kind == "lambda":
            # a comprehension/reduce binder: bare SQL lambda argument, no table
            return self.prefix
        if self.kind in ("scalar", "path"):
            return f"{self.alias}.{self.prefix}"
        return f"{self.alias}.{self.prefix}{name}"


@dataclass
class _NodePat:
    var: str | None
    label: str | None
    props: list[tuple[str, str]]  # (key, sql_literal)


@dataclass
class _RelPat:
    var: str | None
    rtype: str | None
    arrow_in: bool  # True for '<-[r]-' (edge points INTO the left node)
    lo: int | None = None  # variable-length bounds ([*lo..hi]); None = one hop
    hi: int | None = None
    undirected: bool = False  # '-[r]-': match either orientation


@dataclass
class _Sql:
    from_tables: list[str] = field(default_factory=list)  # "view AS alias"
    left_joins: list[str] = field(default_factory=list)  # full "LEFT JOIN (...) AS x ON ..." fragments
    where: list[str] = field(default_factory=list)


class _TokenCursor:
    """Shared token-stream cursor for the read and write parsers; subclasses
    set ``self.toks`` / ``self.raws`` / ``self.i`` from :func:`_tokenize`."""

    toks: list[tuple[str, str]]
    raws: list[str]
    i: int

    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, val: str | None = None) -> bool:
        t = self.peek()
        if t[0] == kind and (val is None or t[1] == val):
            self.i += 1
            return True
        return False

    def expect(self, kind: str, val: str | None = None) -> str:
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise CypherUnsupported(f"expected {val or kind}, got {t[1]!r}")
        return t[1]

    def _ident(self) -> str:
        """An identifier position: plain names, or keywords used as names
        ('contains', 'in', ... are legitimate relationship/property names) —
        raw spelling preserved (the tokenizer uppercases keyword matches)."""
        t = self.toks[self.i]
        if t[0] in ("name", "kw"):
            raw = self.raws[self.i]
            self.i += 1
            return raw
        raise CypherUnsupported(f"expected identifier, got {t[1]!r}")


class _Parser(_TokenCursor):
    def __init__(self, query: str, params: dict | None, nodes_view: str, edges_view: str):
        self.toks, self.raws = _tokenize(query)
        self.i = 0
        self.params = params or {}
        self.nodes_view = nodes_view
        self.edges_view = edges_view
        self.sql = _Sql()
        self.vars: dict[str, _Var] = {}
        self._anon = 0
        self._saw_agg = False
        # pre-scan "<var>.<key>" references so derived tables only export the
        # properties map when some key outside the fixed columns is read —
        # graph views without a properties column (e.g. the relational
        # migration's nodes) stay queryable
        self._prop_refs: dict[str, set[str]] = {}
        for j in range(len(self.toks) - 2):
            if (
                self.toks[j][0] == "name"
                and self.toks[j + 1] == ("op", ".")
                and self.toks[j + 2][0] in ("name", "kw")
            ):
                self._prop_refs.setdefault(self.toks[j][1], set()).add(self.raws[j + 2])
            # properties(x) / keys(x) read the whole map without a dotted
            # reference
            if (
                self.toks[j][0] == "name"
                and self.toks[j][1].upper() in ("PROPERTIES", "KEYS")
                and self.toks[j + 1] == ("op", "(")
                and self.toks[j + 2][0] == "name"
            ):
                self._prop_refs.setdefault(self.toks[j + 2][1], set()).add("properties")
        # write-clause scan: a CREATE/MERGE/SET/DELETE/... token in CLAUSE
        # position gets a TARGETED error up front instead of an opaque parse
        # failure deeper in, pointing the user at the GraphStore API (the
        # reference's own write path).  Detection keys on the NEXT token —
        # these words are legal identifiers in Cypher (MATCH (set:Thing)
        # RETURN set.name is a pure read), and in valid read syntax an
        # identifier is never followed by '(' (CREATE/MERGE open a pattern)
        # or by another bare name (SET n..., DELETE n, DETACH DELETE).
        for j, (kind, word) in enumerate(self.toks):
            if kind != "name":
                continue
            up = word.upper()
            if up not in _WRITE_CLAUSES:
                continue
            nxt = self.toks[j + 1] if j + 1 < len(self.toks) else ("end", "")
            if up in ("CREATE", "MERGE") and nxt == ("op", "("):
                raise CypherWriteUnsupported(_WRITE_HINT)
            if up in ("SET", "DELETE", "REMOVE", "DETACH") and nxt[0] == "name":
                raise CypherWriteUnsupported(_WRITE_HINT)

    def _export_cols(self, var_kind: str, name: str) -> list[str]:
        """Columns a derived table must export for a carried node/edge var;
        nodes include the properties map only when the query reads a key
        outside the fixed columns (views without one stay queryable)."""
        refs = self._prop_refs.get(name, set())
        if var_kind == "edge":
            cols = list(_EDGE_COLS)
        else:
            cols = ["id", "name", "type"]
        if "properties" in refs or any(k not in cols for k in refs):
            cols.append("properties")
        return cols

    def _fresh(self, prefix: str) -> str:
        self._anon += 1
        return f"_{prefix}{self._anon}"

    # -- literals & params --------------------------------------------------
    def _sql_literal(self, value) -> str:
        if value is None:
            return "NULL"
        if isinstance(value, bool):
            return "TRUE" if value else "FALSE"
        if isinstance(value, (int, float)):
            return repr(value)
        if isinstance(value, str):
            # Spark SQL treats backslash as an escape inside string literals,
            # so a value ending in a backslash followed by a doubled quote
            # would re-open the literal (injection) — escape backslashes FIRST.
            return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"
        if isinstance(value, (list, tuple)):
            return "(" + ", ".join(self._sql_literal(v) for v in value) + ")"
        raise CypherUnsupported(f"unsupported parameter type: {type(value).__name__}")

    def _param(self, name: str) -> str:
        key = name[1:]
        if key not in self.params:
            raise CypherUnsupported(f"missing parameter ${key}")
        return self._sql_literal(self.params[key])

    def _value(self) -> str:
        """A literal/param value (inline property maps)."""
        t = self.next()
        if t[0] == "num":
            return t[1]
        if t[0] == "str":
            return self._sql_literal(_unescape(t[1][1:-1]))
        if t[0] == "param":
            return self._param(t[1])
        if t == ("kw", "TRUE"):
            return "TRUE"
        if t == ("kw", "FALSE"):
            return "FALSE"
        if t == ("kw", "NULL"):
            return "NULL"
        if t[0] == "name":
            var = self.vars.get(t[1])
            if var is not None and var.kind == "scalar":
                # a bound UNWIND/WITH scalar: (n {id: x}) joins on the value
                return var.col("")
        raise CypherUnsupported(f"inline property values must be literals, got {t[1]!r}")

    # -- top level ----------------------------------------------------------
    def parse(self) -> str:
        sql, aliases = self._single_query()
        parts = [sql]
        mode: str | None = None  # Cypher forbids mixing UNION and UNION ALL
        while self.accept("kw", "UNION"):
            this = "UNION"
            if self.peek()[0] == "name" and self.peek()[1].upper() == "ALL":
                self.next()
                this = "UNION ALL"
            if mode is not None and this != mode:
                raise CypherUnsupported("cannot mix UNION and UNION ALL")
            mode = this
            # each branch is an independent query over fresh bindings
            self.sql = _Sql()
            self.vars = {}
            self._saw_agg = False
            branch_sql, branch_aliases = self._single_query()
            if branch_aliases != aliases:
                raise CypherUnsupported(
                    "all UNION branches must return the same column names"
                )
            parts.append(branch_sql)
        if self.peek()[0] != "end":
            raise CypherUnsupported(f"trailing tokens near {self.peek()[1]!r}")
        if len(parts) == 1:
            return parts[0]
        # parenthesize branches: a per-branch LIMIT must bind to its branch,
        # not to the union (Spark SQL reads a bare trailing LIMIT as global)
        return f"\n{mode}\n".join(f"({p})" for p in parts)

    def _single_query(self) -> tuple[str, list[str]]:
        while True:
            if self.accept("kw", "MATCH"):
                self._match_clause()
            elif self.peek() == ("kw", "OPTIONAL"):
                if not self.sql.from_tables:
                    raise CypherUnsupported("OPTIONAL MATCH cannot be the first clause")
                self.next()
                self.expect("kw", "MATCH")
                self._optional_clause()
            elif self.accept("kw", "UNWIND"):
                self._unwind_clause()
            elif self.accept("kw", "WITH"):
                if not self.sql.from_tables:
                    raise CypherUnsupported("WITH cannot be the first clause")
                self._with_clause()
            else:
                break
        if not self.sql.from_tables and self.peek() != ("kw", "RETURN"):
            raise CypherUnsupported("query must contain MATCH or UNWIND before RETURN")
        # a standalone RETURN (no MATCH/UNWIND) is a FROM-less SELECT —
        # the openCypher expression-evaluation query (RETURN 1 + 1)
        self.expect("kw", "RETURN")
        distinct = self.accept("kw", "DISTINCT")
        items = [self._return_item()]
        while self.accept("op", ","):
            items.append(self._return_item())
        order, limit, skip = [], None, None
        if self.accept("kw", "ORDER"):
            self.expect("kw", "BY")
            aliases = {a for _, a, _ in items}
            order.append(self._order_item(aliases))
            while self.accept("op", ","):
                order.append(self._order_item(aliases))
        if self.accept("kw", "SKIP"):
            skip = int(self.expect("num"))
        if self.accept("kw", "LIMIT"):
            limit = int(self.expect("num"))
        return self._emit(items, distinct, order, limit, skip), [a for _, a, _ in items]

    # -- MATCH --------------------------------------------------------------
    def _match_clause(self) -> None:
        self._match_part()
        while self.accept("op", ","):
            self._match_part()
        if self.accept("kw", "WHERE"):
            self.sql.where.append(self._expr())

    def _match_part(self) -> None:
        t, t1, t2 = self.peek(), self.peek(1), self.peek(2)
        if (
            t[0] == "name"
            and t1 == ("op", "=")
            and t2[0] == "name"
            and t2[1].upper() == "SHORTESTPATH"
        ):
            pvar = self._check_name(self.next()[1])
            self.next()  # =
            self.next()  # shortestPath
            self._shortest_path(pvar)
            return
        self._inner_path(*self._parse_path())

    def _shortest_path(self, pvar: str) -> None:
        """``MATCH p = shortestPath((a)-[:T*..k]->(b))``: the bounded
        variable-length branches carry their hop count, and MIN(len) per
        endpoint pair IS the shortest path length — the aggregate joins the
        endpoints like one widened edge, so Catalyst sees a plain equi-join
        plus a groupBy (the engine's k_hop operator is the same shape at
        scale).  ``length(p)`` reads the aggregate; Neo4j's shortestPath
        yields one PATH value, and its length is the attribute queries
        consume — RETURN p itself stays unsupported rather than silently
        returning a number."""
        self.expect("op", "(")
        nodes, rels = self._parse_path()
        self.expect("op", ")")
        if len(nodes) != 2 or len(rels) != 1:
            raise CypherUnsupported("shortestPath takes a single (a)-[*..k]->(b) pattern")
        rp = rels[0]
        if rp.undirected:
            raise CypherUnsupported("shortestPath needs a directed pattern")
        if rp.var is not None:
            raise CypherUnsupported("the relationship inside shortestPath cannot bind a variable")
        if rp.lo is None:
            rp.lo = rp.hi = 1  # single-hop pattern: *1..1
        if pvar in self.vars:
            raise CypherUnsupported(f"variable {pvar!r} reused")
        node_vars: list[_Var] = []
        for pat in nodes:
            if pat.var and pat.var in self.vars:
                v = self.vars[pat.var]
                if v.kind != "node":
                    raise CypherUnsupported(f"variable {pat.var!r} used as both node and edge")
            else:
                alias = self._check_name(pat.var) if pat.var else self._fresh("n")
                v = _Var("node", alias)
                self.vars[alias] = v
                self.sql.from_tables.append(f"{self.nodes_view} AS {alias}")
            node_vars.append(v)
            self.sql.where.extend(self._node_conds(v, pat))
        left, right = node_vars
        src, dst = (right, left) if rp.arrow_in else (left, right)
        alias = self._fresh("sp")
        body = self._vlp_body(rp, with_len=True)
        self.sql.from_tables.append(
            f"(SELECT s, t, MIN(len) AS plen FROM ({body}) GROUP BY s, t) AS {alias}"
        )
        self.sql.where.append(f"{alias}.s = {src.col('id')}")
        self.sql.where.append(f"{alias}.t = {dst.col('id')}")
        self.vars[pvar] = _Var("path", alias, "plen")

    def _optional_clause(self) -> None:
        nodes, rels = self._parse_path()
        deferred_where = False
        if self.accept("kw", "WHERE"):
            # openCypher scopes this WHERE to the optional pattern; the LEFT
            # JOIN's ON clause is the semantically equivalent home.  The
            # expression is parsed AFTER the pattern's vars are bound, so var
            # references resolve to the derived table's exported columns.
            deferred_where = True
            where_start = self.i
            self._skip_expr_tokens()
            where_end = self.i
        self._emit_optional(nodes, rels)
        if deferred_where:
            save = self.i
            self.i = where_start
            cond = self._expr()
            if self.i != where_end:
                raise CypherUnsupported("could not parse OPTIONAL MATCH WHERE")
            self.i = save
            frag = self.sql.left_joins[-1]
            self.sql.left_joins[-1] = f"{frag} AND {cond}"

    # -- UNWIND / WITH ------------------------------------------------------
    def _unwind_clause(self) -> None:
        """UNWIND over a constant list — ``$param`` (the reference's
        product_recommendation.py:126 shape, an inline VALUES table), a
        literal ``[...]``, or ``range(a, b[, step])`` — cross-joined like any
        other pattern element.  Unwinding an expression over bound variables
        (``UNWIND keys(n) AS k``) would need a correlated lateral join and
        stays a targeted unsupported."""
        if self.peek()[0] == "param":
            vals = self.params.get(self.next()[1][1:])
            if not isinstance(vals, (list, tuple)) or not vals:
                raise CypherUnsupported("UNWIND parameter must be a non-empty list")
            self.expect("kw", "AS")
            name = self._check_name(self.expect("name"))
            alias = self._fresh("unw")
            rows = ", ".join(f"({self._sql_literal(v)})" for v in vals)
            self.sql.from_tables.append(f"(VALUES {rows}) AS {alias}({name})")
            self.vars[name] = _Var("scalar", alias, name)
            return
        # constant expression: parse with no variables in scope, so a bound
        # reference raises the targeted error instead of mistranslating
        saved_vars = self.vars
        self.vars = {}
        try:
            src = self._comparison()
        except CypherUnsupported as exc:
            raise CypherUnsupported(
                "UNWIND supports $param lists, literal lists, and range(); "
                f"({exc})"
            ) from None
        finally:
            self.vars = saved_vars
        self.expect("kw", "AS")
        name = self._check_name(self.expect("name"))
        alias = self._fresh("unw")
        self.sql.from_tables.append(f"(SELECT explode({src}) AS {name}) AS {alias}")
        self.vars[name] = _Var("scalar", alias, name)

    def _from_sql(self) -> str:
        if not self.sql.from_tables:
            return ""  # standalone RETURN: FROM-less SELECT
        sql = "FROM " + "\nCROSS JOIN ".join(self.sql.from_tables)
        for lj in self.sql.left_joins:
            sql += "\n" + lj
        if self.sql.where:
            sql += "\nWHERE " + " AND ".join(self.sql.where)
        return sql

    def _with_clause(self) -> None:
        """WITH item, ... [ORDER BY ...] [SKIP n] [LIMIT n] — the openCypher
        pipeline stage (product_recommendation.py:133-137): everything so far
        collapses into ONE derived subquery (implicit GROUP BY around
        aggregates, ORDER/LIMIT applied inside), and only the listed items
        stay bound for the following clauses.  Bare node/edge variables pass
        through as prefixed column exports, exactly like OPTIONAL MATCH's
        derived tables, so later MATCH clauses can hop from them."""
        distinct = self.accept("kw", "DISTINCT")
        selects: list[str] = []
        groups: list[str] = []
        rebind: dict[str, tuple[str, str]] = {}  # name -> (kind, column prefix)
        any_agg = False
        while True:
            t = self.peek()
            if (
                t[0] == "name"
                and t[1] in self.vars
                and self.vars[t[1]].kind != "scalar"
                and self.peek(1) != ("op", ".")
                and self.peek(1) != ("op", "{")  # map projection -> expression branch
            ):
                var = self.vars[self.next()[1]]
                name = t[1]
                if self.accept("kw", "AS"):
                    name = self._check_name(self.expect("name"))
                for c in self._export_cols(var.kind, name):
                    selects.append(f"{var.col(c)} AS {name}__{c}")
                    # group by select-list ordinal: a raw literal expression
                    # here (e.g. 1 AS x) would itself parse as an ordinal
                    groups.append(str(len(selects)))
                rebind[name] = (var.kind, f"{name}__")
            else:
                self._saw_agg = False
                start = self.i
                expr = self._comparison()
                is_agg = self._saw_agg
                any_agg = any_agg or is_agg
                bare_scalar = (
                    self.i == start + 1
                    and t[0] == "name"
                    and t[1] in self.vars
                    and self.vars[t[1]].kind == "scalar"
                )
                if self.accept("kw", "AS"):
                    alias = self._check_name(self.expect("name"))
                elif bare_scalar:
                    alias = t[1]  # scalar passthrough keeps its name
                else:
                    raise CypherUnsupported("WITH expressions need AS aliases")
                selects.append(f"{expr} AS {alias}")
                if not is_agg:
                    groups.append(str(len(selects)))
                rebind[alias] = ("scalar", alias)
            if not self.accept("op", ","):
                break
        order, limit, skip = [], None, None
        if self.accept("kw", "ORDER"):
            self.expect("kw", "BY")
            aliases = set(rebind)
            order.append(self._order_item(aliases))
            while self.accept("op", ","):
                order.append(self._order_item(aliases))
        if self.accept("kw", "SKIP"):
            skip = int(self.expect("num"))
        if self.accept("kw", "LIMIT"):
            limit = int(self.expect("num"))
        body = "SELECT " + ("DISTINCT " if distinct else "") + ", ".join(selects)
        body += "\n" + self._from_sql()
        if any_agg and groups:
            body += "\nGROUP BY " + ", ".join(groups)
        if order:
            body += "\nORDER BY " + ", ".join(order)
        if limit is not None:
            body += f"\nLIMIT {limit}"
        if skip is not None:
            body += f"\nOFFSET {skip}"
        w = self._fresh("with")
        self.sql = _Sql(from_tables=[f"({body}) AS {w}"])
        self.vars = {name: _Var(kind, w, prefix) for name, (kind, prefix) in rebind.items()}
        if self.accept("kw", "WHERE"):
            # openCypher: a WHERE trailing WITH filters the projected rows
            # (post-aggregation — SQL's HAVING) AFTER any ORDER BY/SKIP/LIMIT
            # inside the stage; predicates see only the WITH bindings, which
            # is exactly the derived table just built
            self.sql.where.append(self._expr())

    def _skip_expr_tokens(self) -> None:
        """Advance past one expression without evaluating (vars not yet bound)."""
        depth = 0
        while True:
            t = self.peek()
            if t[0] == "end":
                return
            prev = self.toks[self.i - 1] if self.i > 0 else ("", "")
            starts_ends_with = t[1] == "WITH" and prev[1] in ("STARTS", "ENDS")
            if (
                t[0] == "kw"
                and depth == 0
                and not starts_ends_with
                and t[1] in ("RETURN", "MATCH", "OPTIONAL", "WHERE", "WITH", "UNWIND")
            ):
                return
            if t == ("op", "(") or t == ("op", "["):
                depth += 1
            elif t == ("op", ")") or t == ("op", "]"):
                depth -= 1
            self.next()

    def _parse_path(self) -> tuple[list[_NodePat], list[_RelPat]]:
        nodes = [self._node_pat()]
        rels: list[_RelPat] = []
        while self.peek()[1] in ("-", "<-") and self.peek()[0] == "op":
            rels.append(self._rel_pat())
            nodes.append(self._node_pat())
        return nodes, rels

    def _node_pat(self) -> _NodePat:
        self.expect("op", "(")
        var = None
        if self.peek()[0] == "name":
            var = self.next()[1]
        label = None
        if self.accept("op", ":"):
            label = self._ident()
        props: list[tuple[str, str]] = []
        if self.accept("op", "{"):
            while True:
                key = self._ident()
                self.expect("op", ":")
                props.append((key, self._value()))
                if not self.accept("op", ","):
                    break
            self.expect("op", "}")
        self.expect("op", ")")
        return _NodePat(var, label, props)

    _VLP_MAX = 8  # hop-count ceiling: each extra hop is another self-join

    def _rel_pat(self) -> _RelPat:
        arrow_in = self.next()[1] == "<-"
        self.expect("op", "[")
        var = None
        if self.peek()[0] == "name":
            var = self.next()[1]
        rtype = None
        if self.accept("op", ":"):
            rtype = self._ident()
        lo = hi = None
        if self.accept("op", "*"):
            # [*], [*n], [*lo..hi], [*..hi] — an unbounded upper end would be
            # an unbounded self-join chain, so it must be stated
            lo = 1
            if self.peek()[0] == "num":
                lo = int(self.expect("num"))
                hi = lo
            if self.peek() == ("op", ".") and self.peek(1) == ("op", "."):
                self.next(), self.next()
                hi = int(self.expect("num"))
            if hi is None:
                raise CypherUnsupported(
                    "variable-length paths need an explicit upper bound, e.g. [*1..3]"
                )
            if lo < 1 or hi < lo:
                raise CypherUnsupported(f"bad variable-length bounds *{lo}..{hi}")
            if hi > self._VLP_MAX:
                raise CypherUnsupported(f"variable-length upper bound capped at {self._VLP_MAX}")
            if var is not None:
                raise CypherUnsupported(
                    "variable-length relationships cannot bind a variable (list values unsupported)"
                )
        self.expect("op", "]")
        tail = self.next()
        undirected = False
        if arrow_in:
            if tail != ("op", "-"):
                raise CypherUnsupported("bad relationship arrow")
        elif tail == ("op", "-"):
            undirected = True  # '-[r]-': either orientation (union of both)
        elif tail != ("op", "->"):
            raise CypherUnsupported("bad relationship arrow")
        if undirected and lo is not None:
            raise CypherUnsupported(
                "undirected variable-length paths are not supported; "
                "state a direction or use the k_hop operator"
            )
        return _RelPat(var, rtype, arrow_in, lo, hi, undirected)

    # -- inner pattern: tables + WHERE conjuncts ----------------------------
    def _check_name(self, name: str) -> str:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise CypherUnsupported(f"bad variable name {name!r}")
        return name

    def _node_conds(self, var: _Var, pat: _NodePat) -> list[str]:
        conds = []
        if pat.label and pat.label != "Node":  # :Node = physical table label, matches all
            conds.append(f"{var.col('type')} = {self._sql_literal(pat.label)}")
        for key, val in pat.props:
            conds.append(f"{self._prop(var, 'node', key)} = {val}")
        return conds

    def _inner_path(self, nodes: list[_NodePat], rels: list[_RelPat]) -> None:
        node_vars: list[_Var] = []
        for pat in nodes:
            if pat.var and pat.var in self.vars:
                v = self.vars[pat.var]
                if v.kind != "node":
                    raise CypherUnsupported(f"variable {pat.var!r} used as both node and edge")
            else:
                alias = self._check_name(pat.var) if pat.var else self._fresh("n")
                v = _Var("node", alias)
                self.vars[alias] = v
                self.sql.from_tables.append(f"{self.nodes_view} AS {alias}")
            node_vars.append(v)
            self.sql.where.extend(self._node_conds(v, pat))
        for idx, rp in enumerate(rels):
            left, right = node_vars[idx], node_vars[idx + 1]
            src, dst = (right, left) if rp.arrow_in else (left, right)
            if rp.lo is not None:
                alias = self._fresh("vlp")
                self.sql.from_tables.append(f"({self._vlp_body(rp)}) AS {alias}")
                self.sql.where.append(f"{alias}.s = {src.col('id')}")
                self.sql.where.append(f"{alias}.t = {dst.col('id')}")
                continue
            if rp.var and rp.var in self.vars:
                raise CypherUnsupported(f"relationship variable {rp.var!r} reused")
            alias = self._check_name(rp.var) if rp.var else self._fresh("r")
            rv = _Var("edge", alias)
            self.vars[alias] = rv
            self.sql.from_tables.append(f"{self._edges_source(rp)} AS {alias}")
            self.sql.where.append(f"{alias}.src = {src.col('id')}")
            self.sql.where.append(f"{alias}.dst = {dst.col('id')}")
            if rp.rtype and rp.rtype != "EDGE":
                self.sql.where.append(f"{alias}.relationship_name = {self._sql_literal(rp.rtype)}")

    def _edges_source(self, rp: _RelPat) -> str:
        """Table expression for one hop.  Undirected ``-[r]-`` matches either
        orientation: a UNION ALL of the edge set with its flipped copy
        (self-loops excluded from the flip so they match once, openCypher
        multiplicity — a free-endpoint undirected match yields each edge
        twice, once per binding orientation, exactly as Neo4j does).  Catalyst
        plans the union as two scans of the same source under one join, and
        the edge var's src/dst read back in traversal orientation."""
        if not rp.undirected:
            return self.edges_view
        # export the properties map only when this hop's variable reads a
        # non-fixed key, so edges views without the column stay queryable
        refs = self._prop_refs.get(rp.var, set()) if rp.var else set()
        props = (
            ", properties"
            if "properties" in refs or any(k not in _EDGE_COLS for k in refs)
            else ""
        )
        return (
            f"(SELECT src, dst, relationship_name{props} FROM {self.edges_view}"
            f" UNION ALL SELECT dst AS src, src AS dst, relationship_name{props}"
            f" FROM {self.edges_view} WHERE src <> dst)"
        )

    def _vlp_body(self, rp: _RelPat, with_len: bool = False) -> str:
        """Variable-length path as UNION ALL of fixed-length edge chains.

        One output row per PATH (Cypher multiplicity), endpoints only; each
        chain enforces openCypher relationship-uniqueness (no edge reused
        within one path) via pairwise inequality.  The derived table joins
        like a single widened edge, so Catalyst still gets a plain equi-join
        tree — the length-L branch is L-1 self-joins, which AQE shuffles or
        broadcasts like any other.  (The engine's native k-hop operator,
        graph_joins.k_hop, is the scale path for REACHABILITY — it dedups
        per round; this preserves per-path rows, which is what RETURN counts.)
        """
        tcond = (
            f".relationship_name = {self._sql_literal(rp.rtype)}"
            if rp.rtype and rp.rtype != "EDGE"
            else None
        )
        branches = []
        for length in range(rp.lo, rp.hi + 1):
            es = [self._fresh("ve") for _ in range(length)]
            conds = []
            for k in range(1, length):
                conds.append(f"{es[k]}.src = {es[k - 1]}.dst")
            for a in range(length):
                if tcond:
                    conds.append(f"{es[a]}{tcond}")
                for b in range(a + 1, length):
                    conds.append(
                        f"NOT ({es[a]}.src = {es[b]}.src AND {es[a]}.dst = {es[b]}.dst"
                        f" AND {es[a]}.relationship_name = {es[b]}.relationship_name)"
                    )
            frm = " CROSS JOIN ".join(f"{self.edges_view} AS {e}" for e in es)
            cols = f"{es[0]}.src AS s, {es[-1]}.dst AS t"
            if with_len:
                cols += f", CAST({length} AS BIGINT) AS len"
            sql = f"SELECT {cols} FROM {frm}"
            if conds:
                sql += " WHERE " + " AND ".join(conds)
            branches.append(sql)
        return " UNION ALL ".join(branches)

    # -- optional pattern: derived-table LEFT JOIN --------------------------
    def _emit_optional(self, nodes: list[_NodePat], rels: list[_RelPat]) -> None:
        if not rels:
            raise CypherUnsupported("OPTIONAL MATCH must contain a relationship")
        bound = [i for i, p in enumerate(nodes) if p.var and p.var in self.vars]
        if not bound:
            raise CypherUnsupported("OPTIONAL MATCH must re-use a bound variable")
        derived = self._fresh("opt")
        inner_alias: dict[int, str] = {}  # node index -> inner alias (non-anchors)
        exports: list[str] = []
        conds: list[str] = []
        on: list[str] = []
        tables: list[str] = []

        anchor_conds: list[str] = []
        for i, pat in enumerate(nodes):
            if i in bound:
                # anchors join from outside via the adjacent edge column; any
                # RE-stated label/props on the bound var belong to the optional
                # pattern, so they go in the ON clause (ON false -> nulls)
                anchor_conds.extend(self._node_conds(self.vars[pat.var], pat))
                continue
            alias = self._fresh("inn")
            inner_alias[i] = alias
            tables.append(f"{self.nodes_view} AS {alias}")
            av = _Var("node", alias)
            conds.extend(self._node_conds(av, pat))
            if pat.var:
                name = self._check_name(pat.var)
                for c in self._export_cols("node", name):
                    exports.append(f"{alias}.{c} AS {name}__{c}")
                self.vars[name] = _Var("node", derived, f"{name}__")

        for idx, rp in enumerate(rels):
            if rp.lo is not None:
                raise CypherUnsupported("variable-length paths inside OPTIONAL MATCH are not supported")
            alias = self._fresh("inr")
            tables.append(f"{self._edges_source(rp)} AS {alias}")
            li, ri = idx, idx + 1
            src_i, dst_i = (ri, li) if rp.arrow_in else (li, ri)
            for endpoint_i, col in ((src_i, "src"), (dst_i, "dst")):
                if endpoint_i in inner_alias:
                    conds.append(f"{alias}.{col} = {inner_alias[endpoint_i]}.id")
                else:  # anchor endpoint: export the edge column, equate outside
                    anchor_var = self.vars[nodes[endpoint_i].var]
                    export = f"__a{len(on)}"
                    exports.append(f"{alias}.{col} AS {export}")
                    on.append(f"{derived}.{export} = {anchor_var.col('id')}")
            if rp.rtype and rp.rtype != "EDGE":
                conds.append(f"{alias}.relationship_name = {self._sql_literal(rp.rtype)}")
            if rp.var:
                name = self._check_name(rp.var)
                for c in self._export_cols("edge", name):
                    exports.append(f"{alias}.{c} AS {name}__{c}")
                self.vars[name] = _Var("edge", derived, f"{name}__")

        if not on:
            raise CypherUnsupported("OPTIONAL MATCH pattern is not connected to a bound variable")
        on.extend(anchor_conds)
        if not exports:
            exports.append("1 AS __one")
        body = f"SELECT {', '.join(exports)} FROM {' CROSS JOIN '.join(tables)}"
        if conds:
            body += " WHERE " + " AND ".join(conds)
        self.sql.left_joins.append(f"LEFT JOIN ({body}) AS {derived} ON {' AND '.join(on)}")

    # -- property access ----------------------------------------------------
    def _prop(self, var: _Var, kind: str, key: str) -> str:
        if kind == "scalar":
            raise CypherUnsupported(f"scalar {var.prefix!r} has no properties")
        if kind == "node":
            if key in _NODE_COLS:
                return var.col(key)
            return f"{var.col('properties')}['{key}']"
        if key in _EDGE_COLS:
            return var.col(key)
        # edges carry a properties map too (the reference stores e.g.
        # feedback_weight / flattened Edge weights on relationships —
        # expand_with_nodes_and_edges.py:53-74, kuzu adapter.py:1724-1760)
        return f"{var.col('properties')}['{key}']"

    # -- expressions --------------------------------------------------------
    def _expr(self) -> str:
        left = self._and_expr()
        while self.accept("kw", "OR"):
            left = f"({left} OR {self._and_expr()})"
        return left

    def _and_expr(self) -> str:
        left = self._not_expr()
        while self.accept("kw", "AND"):
            left = f"({left} AND {self._not_expr()})"
        return left

    def _not_expr(self) -> str:
        if self.accept("kw", "NOT"):
            return f"(NOT {self._not_expr()})"
        if self.peek() == ("op", "("):
            # pattern-existence predicate: WHERE (a)-[:T]->(b).  Attempt the
            # path grammar with backtracking — a parenthesized EXPRESSION
            # fails _node_pat immediately (or parses as a lone node with no
            # relationship) and falls through untouched.
            save = self.i
            try:
                nodes, rels = self._parse_path()
            except CypherUnsupported:
                self.i = save
            else:
                if rels:
                    return self._pattern_predicate(nodes, rels)
                self.i = save
        return self._comparison()

    def _pattern_predicate(
        self, nodes: list[_NodePat], rels: list[_RelPat], bind_inner: bool = False
    ) -> str:
        """``(a)-[:T]->(b)`` as a boolean -> correlated EXISTS subquery.

        Bound node variables correlate to their OUTER alias; unbound ones
        live only inside the subquery (openCypher pattern-predicate scoping —
        they introduce no bindings).  A free unlabeled endpoint needs no
        nodes table at all: its identity IS the edge column, and chained
        hops equate adjacent edge columns directly.  Catalyst rewrites the
        EXISTS to a semi-join (anti-join under NOT), so the predicate costs
        one join against the edge set, not a subplan per row."""
        tables: list[str] = []
        where: list[str] = []
        exprs: list[str | None] = []
        inner_binds: dict[str, _Var] = {}
        for pat in nodes:
            if pat.var and pat.var in self.vars:
                v = self.vars[pat.var]
                if v.kind != "node":
                    raise CypherUnsupported(f"variable {pat.var!r} used as both node and edge")
                exprs.append(v.col("id"))
                where.extend(self._node_conds(v, pat))
            elif pat.label or pat.props or (bind_inner and pat.var):
                # EXISTS { } can reference inner names in its WHERE, so every
                # NAMED endpoint gets a nodes table under bind_inner (a free
                # anonymous one still rides its edge column)
                alias = self._fresh("exn")
                tables.append(f"{self.nodes_view} AS {alias}")
                v = _Var("node", alias)
                where.extend(self._node_conds(v, pat))
                exprs.append(v.col("id"))
                if bind_inner and pat.var:
                    inner_binds[pat.var] = v
            else:
                exprs.append(None)  # free endpoint: defined by its first edge
        for idx, rp in enumerate(rels):
            if rp.var is not None:
                raise CypherUnsupported(
                    "pattern predicates cannot bind variables (openCypher scoping)"
                )
            alias = self._fresh("exr")
            if rp.lo is not None:
                tables.append(f"({self._vlp_body(rp)}) AS {alias}")
                src_col, dst_col = "s", "t"
            else:
                tables.append(f"{self._edges_source(rp)} AS {alias}")
                src_col, dst_col = "src", "dst"
                if rp.rtype and rp.rtype != "EDGE":
                    where.append(
                        f"{alias}.relationship_name = {self._sql_literal(rp.rtype)}"
                    )
            li, ri = idx, idx + 1
            si, di = (ri, li) if rp.arrow_in else (li, ri)
            for node_i, col in ((si, src_col), (di, dst_col)):
                colexpr = f"{alias}.{col}"
                if exprs[node_i] is None:
                    exprs[node_i] = colexpr
                else:
                    where.append(f"{colexpr} = {exprs[node_i]}")
        if bind_inner and self.accept("kw", "WHERE"):
            # inner names resolve to the subquery aliases; outer bindings
            # shadowed by an inner name are restored after the parse
            saved = {k: self.vars.get(k) for k in inner_binds}
            self.vars.update(inner_binds)
            try:
                where.append(self._expr())
            finally:
                for k, old in saved.items():
                    if old is None:
                        del self.vars[k]
                    else:
                        self.vars[k] = old
        body = f"SELECT 1 FROM {' CROSS JOIN '.join(tables)}"
        if where:
            body += f" WHERE {' AND '.join(where)}"
        return f"EXISTS ({body})"

    def _comparison(self) -> str:
        left = self._additive()
        t = self.peek()
        if t[0] == "op" and t[1] in ("=", "<>", "<", "<=", ">", ">="):
            op = self.next()[1]
            return f"{left} {op} {self._additive()}"
        if t == ("op", "=~"):
            # Cypher regex match is ANCHORED (whole-string); RLIKE is a
            # substring search, so wrap the pattern in ^(?:...)$ — built with
            # concat so $param / expression patterns work; Catalyst
            # constant-folds the literal case
            self.next()
            return f"({left} RLIKE concat('^(?:', {self._additive()}, ')$'))"
        if t == ("kw", "IN"):
            self.next()
            if self.peek()[0] == "param":
                key = self.next()[1]
                value = self.params.get(key[1:])
                if isinstance(value, (list, tuple)) and not value:
                    return "FALSE"  # Cypher: x IN [] matches nothing
                return f"{left} IN {self._param(key)}"
            self.expect("op", "[")
            vals = []
            if self.peek() != ("op", "]"):
                vals.append(self._primary())
                while self.accept("op", ","):
                    vals.append(self._primary())
            self.expect("op", "]")
            if not vals:
                return "FALSE"  # Cypher: x IN [] matches nothing
            return f"{left} IN ({', '.join(vals)})"
        if t == ("kw", "IS"):
            self.next()
            neg = self.accept("kw", "NOT")
            self.expect("kw", "NULL")
            return f"{left} IS {'NOT ' if neg else ''}NULL"
        if t == ("kw", "CONTAINS"):
            self.next()
            return f"contains({left}, {self._additive()})"
        if t == ("kw", "STARTS"):
            self.next()
            self.expect("kw", "WITH")
            return f"startswith({left}, {self._additive()})"
        if t == ("kw", "ENDS"):
            self.next()
            self.expect("kw", "WITH")
            return f"endswith({left}, {self._additive()})"
        return left

    def _additive(self) -> str:
        """``+ -`` over ``* / %`` over unary minus — Cypher's arithmetic
        precedence, reassembled verbatim (Spark SQL operators are identical;
        ``+`` also concatenates strings in Cypher, which Spark spells
        concat — numeric arithmetic is what NL->Cypher models emit)."""
        left = self._mult()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            left = f"({left} {op} {self._mult()})"
        return left

    def _mult(self) -> str:
        left = self._unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            left = f"({left} {op} {self._unary()})"
        return left

    def _unary(self) -> str:
        if self.peek() == ("op", "-"):
            self.next()
            return f"(- {self._unary()})"
        return self._primary()

    def _primary(self) -> str:
        """A primary expression plus postfix accessors: ``expr[idx]`` map or
        list indexing (n.properties['age'], split(s, ' ')[0]) and — after a
        function/struct-producing form — ``.field`` (startNode(r).id)."""
        expr = self._primary_inner()
        while True:
            if self.peek() == ("op", "[") and self.peek(1) != ("op", "]"):
                self.next()
                idx = self._comparison()
                self.expect("op", "]")
                expr = f"{expr}[{idx}]"
            elif (
                self.peek() == ("op", ".")
                and self.peek(1)[0] in ("name", "kw")
                and expr.endswith(")")
            ):
                self.next()
                key = self._ident()
                expr = f"{expr}.{key}"
            else:
                break
        return expr

    def _primary_inner(self) -> str:
        t = self.next()
        if t[0] == "num":
            return t[1]
        if t[0] == "str":
            return self._sql_literal(_unescape(t[1][1:-1]))
        if t[0] == "param":
            return self._param(t[1])
        if t == ("kw", "TRUE"):
            return "TRUE"
        if t == ("kw", "FALSE"):
            return "FALSE"
        if t == ("kw", "NULL"):
            return "NULL"
        if t == ("op", "("):
            inner = self._expr()
            self.expect("op", ")")
            return f"({inner})"
        if t == ("op", "["):
            # list literal [a, b, ...] or comprehension [x IN list WHERE p | e]
            if self.peek()[0] == "name" and self.peek(1) == ("kw", "IN"):
                return self._list_comprehension()
            if self.accept("op", "]"):
                return "array()"
            items = [self._comparison()]
            while self.accept("op", ","):
                items.append(self._comparison())
            self.expect("op", "]")
            return f"array({', '.join(items)})"
        if t == ("op", "{"):
            # map projection (kuzu adapter.py:500-510: RETURN { id: n.id, ... })
            pairs = []
            while True:
                key = self._ident()
                self.expect("op", ":")
                pairs.append((key, self._comparison()))
                if not self.accept("op", ","):
                    break
            self.expect("op", "}")
            inner = ", ".join(f"'{k}', {v}" for k, v in pairs)
            return f"named_struct({inner})"
        if t[0] == "name":
            name = t[1]
            if name.upper() == "CASE" and name not in self.vars:
                return self._case_expr()
            if name.upper() in _AGGS and self.peek() == ("op", "("):
                return self._aggregate(name.upper())
            if name.upper() == "EXISTS" and name not in self.vars and self.peek() == ("op", "{"):
                # EXISTS { [MATCH] pattern [WHERE ...] } — the openCypher
                # existential subquery; same correlated-EXISTS translation as
                # exists(pattern), with inner names visible to the inner WHERE
                self.next()
                self.accept("kw", "MATCH")
                pnodes, prels = self._parse_path()
                if not prels:
                    raise CypherUnsupported("EXISTS { } needs a relationship pattern")
                out = self._pattern_predicate(pnodes, prels, bind_inner=True)
                self.expect("op", "}")
                return out
            if name.upper() == "EXISTS" and name not in self.vars and self.peek() == ("op", "("):
                # exists((a)-[:T]->(b)) -> the pattern predicate;
                # exists(n.prop) -> IS NOT NULL (the legacy property form)
                self.next()
                save = self.i
                try:
                    pnodes, prels = self._parse_path()
                except CypherUnsupported:
                    self.i = save
                    inner = self._comparison()
                    self.expect("op", ")")
                    return f"({inner} IS NOT NULL)"
                if not prels:
                    raise CypherUnsupported("exists() takes a pattern or a property")
                out = self._pattern_predicate(pnodes, prels)
                self.expect("op", ")")
                return out
            if name.upper() == "LENGTH" and name not in self.vars and self.peek() == ("op", "("):
                # length(p) on a shortestPath variable -> the MIN-hop aggregate
                # (Cypher's length() is the PATH length; string length is size())
                self.next()
                vn = self.expect("name")
                var = self.vars.get(vn)
                self.expect("op", ")")
                if var is None or var.kind != "path":
                    raise CypherUnsupported("length() takes a shortestPath variable; use size() for strings")
                return var.col("")
            if (
                name.upper() in ("ALL", "ANY", "NONE", "SINGLE")
                and name not in self.vars
                and self.peek() == ("op", "(")
            ):
                return self._list_predicate(name.upper())
            if name.upper() == "REDUCE" and name not in self.vars and self.peek() == ("op", "("):
                return self._reduce_expr()
            if name.upper() in _AGGS_EXTRA and name not in self.vars and self.peek() == ("op", "("):
                return self._aggregate(name.upper())
            if (
                (name.upper() in _SCALAR_FNS or name.upper() in _CAST_FNS or name.upper() in _SPECIAL_FNS)
                and name not in self.vars
                and self.peek() == ("op", "(")
            ):
                return self._scalar_fn(name.upper())
            if (
                name.upper() in ("ID", "TYPE", "LABELS", "PROPERTIES", "STARTNODE", "ENDNODE", "KEYS")
                and name not in self.vars
                and self.peek() == ("op", "(")
            ):
                return self._builtin(name.upper())
            if name.upper() == "RANGE" and name not in self.vars and self.peek() == ("op", "("):
                # range(a, b[, step]) is INCLUSIVE of b, same as Spark sequence()
                self.next()
                args = [self._comparison()]
                while self.accept("op", ","):
                    args.append(self._comparison())
                self.expect("op", ")")
                if len(args) not in (2, 3):
                    raise CypherUnsupported("range() takes (start, end[, step])")
                return f"sequence({', '.join(args)})"
            var = self.vars.get(name)
            if var is None:
                raise CypherUnsupported(f"unbound variable {name!r}")
            if var.kind == "path":
                raise CypherUnsupported(
                    f"path variable {name!r} has no value form here; RETURN length({name})"
                )
            if self.accept("op", "."):
                key = self._ident()
                return self._prop(var, var.kind, key)
            if var.kind in ("node", "edge") and self.peek() == ("op", "{"):
                # map projection: a { .name, .type, k: expr } -> named_struct
                self.next()
                pairs: list[tuple[str, str]] = []
                while True:
                    if self.accept("op", "."):
                        key = self._ident()
                        pairs.append((key, self._prop(var, var.kind, key)))
                    else:
                        key = self._ident()
                        self.expect("op", ":")
                        pairs.append((key, self._comparison()))
                    if not self.accept("op", ","):
                        break
                self.expect("op", "}")
                inner = ", ".join(f"'{k}', {v}" for k, v in pairs)
                return f"named_struct({inner})"
            if var.kind in ("scalar", "lambda"):
                return var.col("")
            if var.kind == "node":
                return (
                    f"named_struct('id', {var.col('id')}, 'name', {var.col('name')},"
                    f" 'type', {var.col('type')})"
                )
            return (
                f"named_struct('src', {var.col('src')},"
                f" 'relationship_name', {var.col('relationship_name')},"
                f" 'dst', {var.col('dst')})"
            )
        raise CypherUnsupported(f"unexpected token {t[1]!r}")

    def _at_case_word(self, *words: str) -> bool:
        t = self.peek()
        return t[0] == "name" and t[1].upper() in words and t[1] not in self.vars

    def _case_expr(self) -> str:
        """CASE expressions, both openCypher forms — generic
        (``CASE WHEN cond THEN v ... [ELSE v] END``) and simple
        (``CASE subject WHEN match THEN v ... [ELSE v] END``).  Spark SQL's
        CASE has identical syntax and semantics, so the pieces translate
        recursively and reassemble verbatim (WHEN/THEN/ELSE/END are plain
        name tokens in this dialect, matched case-insensitively)."""
        parts = ["CASE"]
        if not self._at_case_word("WHEN"):
            parts.append(self._comparison())  # simple form's subject
        saw_when = False
        while self._at_case_word("WHEN"):
            saw_when = True
            self.next()
            parts.append(f"WHEN {self._expr()}")
            if not self._at_case_word("THEN"):
                raise CypherUnsupported("CASE WHEN needs THEN")
            self.next()
            parts.append(f"THEN {self._comparison()}")
        if not saw_when:
            raise CypherUnsupported("CASE needs at least one WHEN branch")
        if self._at_case_word("ELSE"):
            self.next()
            parts.append(f"ELSE {self._comparison()}")
        if not self._at_case_word("END"):
            raise CypherUnsupported("CASE needs END")
        self.next()
        parts.append("END")
        return f"({' '.join(parts)})"

    def _bind_lambda(self, name: str) -> _Var | None:
        """Bind a comprehension/reduce variable for the lambda body; returns
        the shadowed binding (restored by :meth:`_unbind_lambda`)."""
        self._check_name(name)
        old = self.vars.get(name)
        self.vars[name] = _Var("lambda", "", name)
        return old

    def _unbind_lambda(self, name: str, old: _Var | None) -> None:
        if old is None:
            del self.vars[name]
        else:
            self.vars[name] = old

    def _list_comprehension(self) -> str:
        """``[x IN list WHERE p | e]`` -> Spark SQL higher-order functions:
        filter() for the predicate, transform() for the projection — both
        run inside whole-stage codegen, no UDF."""
        lam = self.expect("name")
        self.expect("kw", "IN")
        src = self._comparison()
        old = self._bind_lambda(lam)
        try:
            out = src
            if self.accept("kw", "WHERE"):
                out = f"filter({out}, {lam} -> {self._expr()})"
            if self.accept("op", "|"):
                out = f"transform({out}, {lam} -> {self._comparison()})"
        finally:
            self._unbind_lambda(lam, old)
        self.expect("op", "]")
        return out

    def _list_predicate(self, fname: str) -> str:
        """``all/any/none/single(x IN list WHERE p)`` -> forall / exists /
        NOT exists / size(filter(...)) = 1."""
        self.expect("op", "(")
        lam = self.expect("name")
        self.expect("kw", "IN")
        src = self._comparison()
        self.expect("kw", "WHERE")
        old = self._bind_lambda(lam)
        try:
            pred = self._expr()
        finally:
            self._unbind_lambda(lam, old)
        self.expect("op", ")")
        if fname == "ALL":
            return f"forall({src}, {lam} -> {pred})"
        if fname == "ANY":
            return f"exists({src}, {lam} -> {pred})"
        if fname == "NONE":
            return f"(NOT exists({src}, {lam} -> {pred}))"
        return f"(size(filter({src}, {lam} -> {pred})) = 1)"

    def _reduce_expr(self) -> str:
        """``reduce(acc = init, x IN list | expr)`` -> aggregate(list, init,
        (acc, x) -> expr)."""
        self.expect("op", "(")
        acc = self.expect("name")
        self.expect("op", "=")
        init = self._comparison()
        self.expect("op", ",")
        lam = self.expect("name")
        self.expect("kw", "IN")
        src = self._comparison()
        self.expect("op", "|")
        old_acc = self._bind_lambda(acc)
        old_lam = self._bind_lambda(lam)
        try:
            body = self._comparison()
        finally:
            self._unbind_lambda(lam, old_lam)
            self._unbind_lambda(acc, old_acc)
        self.expect("op", ")")
        return f"aggregate({src}, {init}, ({acc}, {lam}) -> {body})"

    def _scalar_fn(self, fname: str) -> str:
        """Common Cypher scalar functions (toLower/size/coalesce/round/...):
        arguments translate recursively and pass straight through to the
        same-arity Spark SQL function; toString/toInteger/toFloat/toBoolean
        become CASTs; the list/offset functions whose SQL shape differs
        (substring's 0-base, head/last/tail, isEmpty) are rewritten here."""
        self.expect("op", "(")
        args: list[str] = []
        if not self.accept("op", ")"):
            args.append(self._comparison())
            while self.accept("op", ","):
                args.append(self._comparison())
            self.expect("op", ")")
        if fname in _CAST_FNS:
            if len(args) != 1:
                raise CypherUnsupported(f"{fname.lower()}() takes one argument")
            return f"CAST({args[0]} AS {_CAST_FNS[fname]})"
        if fname == "SUBSTRING":
            # Cypher offsets are 0-based, SQL's substring is 1-based
            if len(args) not in (2, 3):
                raise CypherUnsupported("substring() takes (string, start[, length])")
            start = f"({args[1]}) + 1"
            if len(args) == 3:
                return f"substring({args[0]}, {start}, {args[2]})"
            return f"substring({args[0]}, {start})"
        if fname in ("HEAD", "LAST", "TAIL", "ISEMPTY"):
            if len(args) != 1:
                raise CypherUnsupported(f"{fname.lower()}() takes one list argument")
            a = args[0]
            if fname == "HEAD":
                return f"get({a}, 0)"  # NULL on empty, matching Cypher
            if fname == "LAST":
                return f"get({a}, size({a}) - 1)"
            if fname == "TAIL":
                return f"slice({a}, 2, greatest(size({a}) - 1, 0))"
            return f"(size({a}) = 0)"  # isEmpty; size() of NULL stays NULL-safe below
        if fname == "E":
            if args:
                raise CypherUnsupported("e() takes no arguments")
            return "exp(1)"
        if fname in ("PI", "RAND") and args:
            raise CypherUnsupported(f"{fname.lower()}() takes no arguments")
        return f"{_SCALAR_FNS[fname]}({', '.join(args)})"

    def _builtin(self, fname: str) -> str:
        """Cypher element accessors the reference adapters use
        (neo4j adapter.py:916,1069: ID(n)/labels(n)/properties(n)/type(r)).
        labels(n) yields a one-element array: this engine's nodes carry one
        type, matching the reference's single :Node physical label."""
        self.expect("op", "(")
        vn = self.expect("name")
        var = self.vars.get(vn)
        if var is None:
            raise CypherUnsupported(f"unbound variable {vn!r}")
        self.expect("op", ")")
        if fname == "ID":
            return var.col("id" if var.kind == "node" else "src")
        if fname == "KEYS":
            # property names: the fixed entity columns plus the map's keys
            fixed = "'id', 'name', 'type'" if var.kind == "node" else "'src', 'dst', 'relationship_name'"
            return (
                f"array_union(array({fixed}),"
                f" map_keys(coalesce({var.col('properties')}, map())))"
            )
        if fname in ("STARTNODE", "ENDNODE"):
            if var.kind != "edge":
                raise CypherUnsupported(f"{fname.lower()}() takes a relationship")
            end = "src" if fname == "STARTNODE" else "dst"
            # the endpoint as an id-only entity; bind the node in the MATCH
            # pattern to read its other properties
            return f"named_struct('id', {var.col(end)})"
        if var.kind == "node":
            if fname == "LABELS":
                return f"array({var.col('type')})"
            if fname == "PROPERTIES":
                return var.col("properties")
            raise CypherUnsupported("type() takes a relationship")
        if fname == "TYPE":
            return var.col("relationship_name")
        if fname == "PROPERTIES":
            return var.col("properties")
        raise CypherUnsupported(f"{fname.lower()}() takes a node")

    def _aggregate(self, fname: str) -> str:
        self.expect("op", "(")
        distinct = self.accept("kw", "DISTINCT")
        if fname == "COUNT" and self.accept("op", "*"):
            self.expect("op", ")")
            self._saw_agg = True
            return "count(*)"
        # count(n) counts pattern matches where n is non-null — the element's
        # key column stands in for the struct (same null-ness, no struct build)
        t = self.peek()
        if t[0] == "name" and self.vars.get(t[1]) is not None and self.peek(1) != ("op", "."):
            var = self.vars[self.next()[1]]
            arg = var.col("id" if var.kind == "node" else "src")
        else:
            arg = self._expr()
        if fname in _AGGS_EXTRA:
            # percentileCont/percentileDisc carry the percentile as a second
            # argument; stdev/stdevP are single-arg renames.  DISTINCT passes
            # through (Spark's percentile/stddev accept it on the value arg)
            args = [arg]
            while self.accept("op", ","):
                args.append(self._comparison())
            self.expect("op", ")")
            self._saw_agg = True
            if fname == "PERCENTILEDISC" and len(args) == 2:
                # exact discrete percentile (Neo4j's nearest-rank rule:
                # the value at rank ceil(p*n), minimum 1) — Spark's
                # percentile_approx is an approximate sketch and can return
                # a neighboring value on moderate data.  collect_list sorts
                # the group in memory, which exact-disc inherently requires.
                d = "DISTINCT " if distinct else ""
                val, p = args
                # try_element_at: over zero rows the list is empty and ANSI
                # element_at would raise; Neo4j returns null there.
                return (
                    f"try_element_at(array_sort(collect_list({d}{val})), "
                    f"greatest(1, CAST(ceil(({p}) * count({d}{val})) AS INT)))"
                )
            return f"{_AGGS_EXTRA[fname]}({'DISTINCT ' if distinct else ''}{', '.join(args)})"
        self.expect("op", ")")
        self._saw_agg = True
        return f"{_AGGS[fname]}({'DISTINCT ' if distinct else ''}{arg})"

    # -- RETURN / ORDER BY --------------------------------------------------
    def _return_item(self) -> tuple[str, str, bool]:
        """-> (sql_expr, alias, is_aggregate)"""
        self._saw_agg = False
        start = self.i
        expr = self._comparison()  # allows e.g. RETURN COUNT(n) > 0
        raw = " ".join(tok[1] for tok in self.toks[start : self.i])
        is_agg = self._saw_agg
        if self.accept("kw", "AS"):
            alias = self._check_name(self.expect("name"))
        else:
            alias = re.sub(r"[^A-Za-z0-9_]+", "_", raw).strip("_").lower() or self._fresh("c")
        return expr, alias, is_agg

    def _order_item(self, aliases: set[str]) -> str:
        """One ORDER BY term: an output alias, or an expression over the
        currently-bound variables (inside a WITH subquery the old bindings
        are exactly what's in scope)."""
        t = self.peek()
        if t[0] == "name" and t[1] in aliases and self.peek(1)[1] != ".":
            expr = self.next()[1]
        else:
            expr = self._comparison()
        if self.accept("kw", "DESC"):
            return f"{expr} DESC"
        self.accept("kw", "ASC")
        return f"{expr} ASC"

    # -- emit ---------------------------------------------------------------
    def _emit(
        self,
        items: list[tuple[str, str, bool]],
        distinct: bool,
        order: list[str],
        limit: int | None,
        skip: int | None,
    ) -> str:
        select = ", ".join(f"{e} AS {a}" for e, a, _ in items)
        sql = "SELECT " + ("DISTINCT " if distinct else "") + select
        sql += "\n" + self._from_sql()
        if any(agg for _, _, agg in items):
            # group by select-list ordinals, not raw expressions: a literal
            # item (RETURN count(n) AS c, 1 AS x) emitted as GROUP BY 1 would
            # be resolved as an ordinal pointing at the aggregate and rejected
            keys = [str(i + 1) for i, (_, _, agg) in enumerate(items) if not agg]
            if keys:
                sql += "\nGROUP BY " + ", ".join(keys)
        if order:
            sql += "\nORDER BY " + ", ".join(order)
        if limit is not None:
            sql += f"\nLIMIT {limit}"
        if skip is not None:
            sql += f"\nOFFSET {skip}"
        return sql


def cypher_to_sql(
    query: str,
    params: dict | None = None,
    nodes_view: str = "nodes",
    edges_view: str = "edges",
) -> str:
    """Translate a Cypher-subset query to one Spark SQL string.

    Raises :class:`CypherUnsupported` for anything outside the subset, so the
    caller can fall back to Spark-SQL passthrough.
    """
    return _Parser(query, params, nodes_view, edges_view).parse()


def looks_like_cypher(query: str) -> bool:
    # strip the '//' line comments the reference's examples carry before
    # testing the leading clause — UNWIND-led pipelines are Cypher too.
    # CREATE/MERGE followed by a node pattern are Cypher WRITE statements
    # (SQL's CREATE TABLE / MERGE INTO never parenthesize there): route them
    # to the translator so the user gets the targeted write-clause error
    # instead of Spark SQL's opaque parse failure.
    head = re.sub(r"//[^\n]*", "", query).lstrip().upper()
    if head.startswith(("MATCH", "OPTIONAL MATCH", "UNWIND")):
        return True
    if head.startswith("CALL GDS.") or head.startswith("CALL DB."):
        return True  # the gds.*/db.* procedure surface (reference metric queries)
    return re.match(r"(CREATE|MERGE)\s*\(", head) is not None


_GDS_CALL_RE = re.compile(
    r"^\s*CALL\s+gds\.([A-Za-z0-9_.]+)\.(stream|stats|mutate)\(\s*'(?P<gname>[^']*)'"
    r"(?:\s*,\s*\{(?P<config>[^}]*)\})?\s*\)\s*"
    r"YIELD\s+(?P<yield>[\w\s,]+?)\s+"
    r"RETURN\s+(?P<ret>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# graph-catalog / db-introspection procedures: the reference's Neo4j adapter
# manages NAMED projections around its metric queries
# (neo4j_driver/adapter.py:1100-1197 — graph_exists via gds.graph.list,
# project_entire_graph via db.labels() + db.relationshipTypes() +
# gds.graph.project, drop_graph via gds.graph.drop).  These calls have a
# different shape from the stream/stats surface: list/map arguments, YIELD
# without RETURN, or no YIELD at all.
_MGMT_CALL_RE = re.compile(
    r"^\s*CALL\s+(?P<proc>gds\.graph\.(?:project|drop|list|exists)"
    r"|db\.labels|db\.relationshipTypes)\s*"
    r"\((?P<args>[^()]*)\)\s*"
    r"(?:YIELD\s+(?P<yield>[\w\s,]+?))?\s*"
    r"(?:\bRETURN\s+(?P<ret>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

# the gds.* procedures the reference's metric surface actually calls
# (neo4j_driver/neo4j_metrics_utils.py:60,92,152,184), mapped to the
# engine's native operators.  The graph-name argument resolves against the
# session's projection catalog (gds.graph.project below); an unknown name
# keeps the pre-catalog behavior — the projection IS the (nodes, edges)
# pair run_cypher was given.
_GDS_AGG_FNS = ("count", "sum", "avg", "min", "max", "collect")

# --- gds.graph.* projection catalog ------------------------------------------
# Named projections, per SparkSession (weak: dropping the session drops its
# catalog).  Spark-first reading of GDS's in-memory graph: project filters
# the passed (nodes, edges) to the named labels/relationship types, persists
# both frames MEMORY_AND_DISK (spill-safe — an executor that can't hold its
# partitions degrades to disk instead of OOM), and materializes the counts
# ONCE; every later CALL gds.<proc>.stream('<name>') on the same session
# reuses the cached frames.  At 100 TB that is the difference between one
# store scan and one scan per metric query — exactly why the reference
# projects before running its four metric queries
# (neo4j_driver/adapter.py:1160-1198, neo4j_metrics_utils.py:56-200).
_GRAPH_CATALOG: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _session_catalog(spark: SparkSession) -> dict:
    cat = _GRAPH_CATALOG.get(spark)
    if cat is None:
        cat = {}
        _GRAPH_CATALOG[spark] = cat
    return cat


def _parse_call_args(s: str) -> list:
    """Parse a CALL argument list into Python values: 'string', number,
    true/false, [lists], and {maps} (nested — gds.graph.project's
    relationship config is ``{REL: {orientation: 'UNDIRECTED'}}``).  Map
    keys may be bare identifiers or quoted strings, per Cypher."""
    pos = 0

    def err(msg: str):
        return CypherUnsupported(f"CALL argument parse error at {pos}: {msg} in {s!r}")

    def skip_ws():
        nonlocal pos
        while pos < len(s) and s[pos].isspace():
            pos += 1

    def value():
        nonlocal pos
        skip_ws()
        if pos >= len(s):
            raise err("unexpected end of arguments")
        ch = s[pos]
        if ch == "'":
            end = s.find("'", pos + 1)
            if end < 0:
                raise err("unterminated string")
            v = s[pos + 1 : end]
            pos = end + 1
            return v
        if ch == "[":
            pos += 1
            items = []
            skip_ws()
            if pos < len(s) and s[pos] == "]":
                pos += 1
                return items
            while True:
                items.append(value())
                skip_ws()
                if pos < len(s) and s[pos] == ",":
                    pos += 1
                    continue
                if pos < len(s) and s[pos] == "]":
                    pos += 1
                    return items
                raise err("expected ',' or ']' in list")
        if ch == "{":
            pos += 1
            out = {}
            skip_ws()
            if pos < len(s) and s[pos] == "}":
                pos += 1
                return out
            while True:
                skip_ws()
                if pos < len(s) and s[pos] == "'":
                    key = value()
                else:
                    m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", s[pos:])
                    if not m:
                        raise err("expected map key")
                    key = m.group(0)
                    pos += len(key)
                skip_ws()
                if pos >= len(s) or s[pos] != ":":
                    raise err("expected ':' after map key")
                pos += 1
                out[key] = value()
                skip_ws()
                if pos < len(s) and s[pos] == ",":
                    pos += 1
                    continue
                if pos < len(s) and s[pos] == "}":
                    pos += 1
                    return out
                raise err("expected ',' or '}' in map")
        m = re.match(r"-?\d+(\.\d+)?", s[pos:])
        if m:
            pos += len(m.group(0))
            return float(m.group(0)) if "." in m.group(0) else int(m.group(0))
        m = re.match(r"(true|false)\b", s[pos:], re.IGNORECASE)
        if m:
            pos += len(m.group(0))
            return m.group(0).lower() == "true"
        raise err("unsupported literal")

    skip_ws()
    if pos >= len(s):
        return []
    args = [value()]
    skip_ws()
    while pos < len(s):
        if s[pos] != ",":
            raise err("expected ',' between arguments")
        pos += 1
        args.append(value())
        skip_ws()
    return args


def _run_mgmt_call(spark: SparkSession, nodes: DataFrame, edges: DataFrame, m) -> DataFrame:
    """gds.graph.{project,list,drop,exists} and db.{labels,relationshipTypes}
    — the reference's projection-management flow verbatim
    (neo4j_driver/adapter.py:1100-1198)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    proc = m.group("proc").lower()
    args = _parse_call_args(m.group("args") or "")
    cat = _session_catalog(spark)

    if proc in ("db.labels", "db.relationshiptypes", "gds.graph.list") and args:
        raise CypherUnsupported(f"{m.group('proc')} takes no arguments")
    if proc == "db.labels":
        # CALL db.labels() -> one row per distinct node label
        # (adapter.py:1121-1133 reads record['label'])
        out = (
            nodes.select(F.col("type").alias("label"))
            .filter(F.col("label").isNotNull())
            .distinct()
            .orderBy("label")
        )
    elif proc == "db.relationshiptypes":
        # adapter.py:1135-1158 collects these into the project config map
        out = (
            edges.select(F.col("relationship_name").alias("relationshipType"))
            .filter(F.col("relationshipType").isNotNull())
            .distinct()
            .orderBy("relationshipType")
        )
    elif proc == "gds.graph.list":
        rows = [
            (name, e["node_count"], e["rel_count"]) for name, e in sorted(cat.items())
        ]
        out = spark.createDataFrame(
            rows, "graphName string, nodeCount long, relationshipCount long"
        )
    elif proc == "gds.graph.exists":
        if len(args) != 1 or not isinstance(args[0], str):
            raise CypherUnsupported("gds.graph.exists takes one graph-name string")
        out = spark.createDataFrame(
            [(args[0], args[0] in cat)], "graphName string, exists boolean"
        )
    elif proc == "gds.graph.drop":
        # GDS signature: drop(name, failIfMissing=true)
        if (
            len(args) < 1
            or len(args) > 2
            or not isinstance(args[0], str)
            or (len(args) == 2 and not isinstance(args[1], bool))
        ):
            raise CypherUnsupported(
                "gds.graph.drop takes a graph-name string and an optional "
                "failIfMissing boolean"
            )
        name = args[0]
        if name not in cat:
            if len(args) == 2 and args[1] is False:
                out = spark.createDataFrame([], "graphName string")
                return _apply_yield_return(
                    spark, out, m.group("yield"), m.group("ret")
                )
            raise CypherUnsupported(
                f"gds.graph.drop: graph '{name}' is not in this session's "
                "catalog (gds.graph.list streams the projected names)"
            )
        entry = cat.pop(name)
        entry["nodes"].unpersist()
        entry["edges"].unpersist()
        out = spark.createDataFrame([(name,)], "graphName string")
    elif proc == "gds.graph.project":
        if len(args) != 3 or not isinstance(args[0], str):
            raise CypherUnsupported(
                "gds.graph.project takes (graphName, nodeProjection, "
                "relationshipProjection) — the adapter.py:1176-1182 shape"
            )
        name, label_arg, rel_arg = args
        if name in cat:
            raise CypherUnsupported(
                f"gds.graph.project: graph '{name}' already exists in this "
                "session's catalog; gds.graph.drop it first"
            )
        pn = nodes
        if label_arg != "*":
            labels = [label_arg] if isinstance(label_arg, str) else list(label_arg)
            if not all(isinstance(x, str) for x in labels):
                raise CypherUnsupported("node projection must be '*' or label strings")
            pn = pn.filter(F.col("type").isin(labels))
        pe = edges
        if rel_arg != "*":
            if isinstance(rel_arg, str):
                rel_names, reversed_names = [rel_arg], []
            elif isinstance(rel_arg, list):
                rel_names, reversed_names = list(rel_arg), []
            elif isinstance(rel_arg, dict):
                rel_names, reversed_names = [], []
                for rel, conf in rel_arg.items():
                    if not isinstance(conf, dict):
                        # a non-map value would silently project NATURAL —
                        # refuse, same never-silently-dropped discipline as
                        # the config keys
                        raise CypherUnsupported(
                            f"relationship projection for {rel!r} must be a "
                            "config map (e.g. {orientation: 'UNDIRECTED'})"
                        )
                    bad = set(conf) - {"orientation"}
                    if bad:
                        raise CypherUnsupported(
                            f"unsupported relationship projection keys {sorted(bad)} "
                            "(only orientation is supported)"
                        )
                    orient = str(conf.get("orientation", "NATURAL")).upper()
                    if orient not in ("NATURAL", "UNDIRECTED", "REVERSE"):
                        raise CypherUnsupported(f"unknown orientation {orient!r}")
                    (reversed_names if orient == "REVERSE" else rel_names).append(rel)
            else:
                raise CypherUnsupported("relationship projection must be '*', a list, or a map")
            parts = []
            if rel_names:
                parts.append(pe.filter(F.col("relationship_name").isin(rel_names)))
            if reversed_names:
                # REVERSE flips the stored orientation at projection time;
                # NATURAL/UNDIRECTED keep it — undirectedness is each
                # procedure's own convention on this surface, same as the
                # un-cataloged path
                rev = pe.filter(F.col("relationship_name").isin(reversed_names))
                parts.append(
                    rev.withColumn("__s", F.col("dst"))
                    .withColumn("dst", F.col("src"))
                    .withColumn("src", F.col("__s"))
                    .drop("__s")
                )
            if not parts:
                raise CypherUnsupported("relationship projection selected no types")
            pe = parts[0]
            for p in parts[1:]:
                pe = pe.unionByName(p)
        # GDS projections only keep relationships between projected nodes
        ids = pn.select("id").distinct()
        pe = pe.join(ids.withColumnRenamed("id", "src"), "src", "left_semi").join(
            ids.withColumnRenamed("id", "dst"), "dst", "left_semi"
        )
        pn = pn.persist(StorageLevel.MEMORY_AND_DISK)
        pe = pe.persist(StorageLevel.MEMORY_AND_DISK)
        nc, rc = pn.count(), pe.count()  # materializes the cache once
        cat[name] = {"nodes": pn, "edges": pe, "node_count": nc, "rel_count": rc}
        out = spark.createDataFrame(
            [(name, nc, rc)],
            "graphName string, nodeCount long, relationshipCount long",
        )
    else:  # pragma: no cover — the regex admits only the branches above
        raise CypherUnsupported(f"unsupported management procedure {proc}")
    return _apply_yield_return(spark, out, m.group("yield"), m.group("ret"))

# gds.allShortestPaths.stream and gds.closeness.stream are EXACT all-pairs:
# O(n * reachable) distance state by definition, fine on KG-sized graphs but
# a runaway job on a 100x one — and the CALL surface is user-facing through
# HTTP/MCP, so the guard must be structural, not documentary (same
# fail-loudly discipline as weighted_sssp's on_truncation="raise").  Above
# the node budget the CALL refuses, naming the sampled alternative and the
# explicit opt-in conf.
_EXACT_ALL_PAIRS_NODE_BUDGET = 50_000
_EXACT_ALL_PAIRS_OPT_IN = "spark.cognee.gds.allowExactAllPairs"


class GdsScaleGuard(RuntimeError):
    """An exact all-pairs CALL procedure refused above the node budget."""


def _guard_exact_all_pairs(spark, nodes: DataFrame, proc: str, approx: str) -> None:
    opt_in = str(spark.conf.get(_EXACT_ALL_PAIRS_OPT_IN, "false")).lower()
    if opt_in == "true":
        return
    n = nodes.select("id").distinct().count()
    if n > _EXACT_ALL_PAIRS_NODE_BUDGET:
        raise GdsScaleGuard(
            f"CALL gds.{proc} is exact all-pairs (O(n*reachable) state) and "
            f"the projection has {n} nodes > budget "
            f"{_EXACT_ALL_PAIRS_NODE_BUDGET}.  Use the sampled scale path "
            f"({approx}) or opt in explicitly with "
            f"spark.conf.set('{_EXACT_ALL_PAIRS_OPT_IN}', 'true')."
        )


# procedures that accept a (typed, whitelisted) config map; every other
# procedure refuses a non-empty config — a silently dropped key would change
# the asked-for semantics
_CONFIGURABLE_PROCS = {
    "pagerank.stream",
    "eigenvector.stream",
    "articlerank.stream",
    "labelpropagation.stream",
    "kmeans.stream",
    "knn.stream",
    "conductance.stream",
    "betweenness.stream",
    "fastrp.stream",
    "shortestpath.dijkstra.stream",
    "allshortestpaths.dijkstra.stream",
    "louvain.stream",
    "leiden.stream",
    "nodesimilarity.stream",
    "degree.stream",
    "modularity.stream",
    "modularity.stats",
    "node2vec.stream",
    "scaleproperties.stream",
    "spanningtree.stream",
    "kspanningtree.stream",
    "randomwalk.stream",
}


def _conf(config: dict, proc: str, **allowed):
    """Validate and extract a procedure's config-map keys.  ``allowed`` maps
    key -> (accepted types, default).  Unknown keys refuse loudly, naming
    the supported set (the GDS config surface is large; this dialect
    implements the subset each procedure actually parameterizes)."""
    bad = set(config) - set(allowed)
    if bad:
        raise CypherUnsupported(
            f"gds.{proc}: unsupported config key(s) {sorted(bad)}; "
            f"supported: {sorted(allowed)}"
        )
    out = {}
    for k, (types, default) in allowed.items():
        v = config.get(k, default)
        if v is not None and (not isinstance(v, types) or isinstance(v, bool)):
            names = ", ".join(t.__name__ for t in types)
            raise CypherUnsupported(f"gds.{proc}: config {k} must be {names}")
        out[k] = v
    return out


def _weighted_edge_view(edges: DataFrame, prop: str | None, proc: str) -> DataFrame:
    """(src, dst, weight) for a procedure's relationshipWeightProperty config:
    the named numeric edge property when given (refusing loudly when any
    relationship lacks it — a silently unit-weighted edge would change the
    asked-for semantics), else GDS's unweighted default (unit LONG weights,
    so hop distances stay exact integers for the contract hash)."""
    from pyspark.sql import functions as F

    if prop is None:
        return edges.select("src", "dst", F.lit(1).cast("long").alias("weight"))
    if "properties" not in edges.columns:
        raise CypherUnsupported(
            "relationshipWeightProperty needs the projection's edges "
            "to carry a properties map"
        )
    e = edges.select(
        "src", "dst",
        F.element_at("properties", F.lit(prop)).cast("double").alias("weight"),
    )
    if e.filter(F.col("weight").isNull()).limit(1).count() > 0:
        raise CypherUnsupported(
            f"gds.{proc}: every relationship needs a numeric {prop!r} property"
        )
    return e


def _refuse_null_communities(nodes: DataFrame, prop: str, proc: str) -> None:
    """A NULL community value would be GROUPED as a real community by the
    quality metrics (a spurious negative-contribution row, an inflated
    communityCount) — refuse loudly like the NULL-weight probe, naming the
    fix (bounded probe: one matching row suffices)."""
    from pyspark.sql import functions as F

    if nodes.filter(F.col(prop).isNull()).limit(1).count() > 0:
        raise CypherUnsupported(
            f"gds.{proc}: some nodes carry a NULL {prop!r} community — a "
            "partial labeling mis-scores Q; complete the labeling (e.g. "
            "mutate from a full-coverage procedure) or filter the "
            "projection first"
        )


def _gds_procedure(
    spark, nodes: DataFrame, edges: DataFrame, proc: str, config: dict | None = None
) -> DataFrame:
    from pyspark.sql import functions as F

    key = proc.lower()
    config = config or {}
    if config and key not in _CONFIGURABLE_PROCS:
        raise CypherUnsupported(
            f"gds.{proc} takes no config map on this surface; call the "
            "native operator directly for non-default parameters"
        )
    if key == "wcc.stream":
        from cognee_graphdb_spark.operators.graph_metrics import connected_components

        cc = connected_components(nodes, edges)
        return cc.select(
            F.col("id").alias("nodeId"), F.col("component").alias("componentId")
        )
    if key == "wcc.stats":
        from cognee_graphdb_spark.operators.graph_metrics import connected_components

        cc = connected_components(nodes, edges)
        return cc.agg(F.count_distinct("component").alias("componentCount"))
    if key == "allshortestpaths.stream":
        from cognee_graphdb_spark.operators.paths import weighted_sssp

        # gds.allShortestPaths streams hop distances of the UNDIRECTED
        # unweighted projection: multi-source hop-synchronous BFS = the
        # oracle-proven weighted_sssp with unit weights from every node.
        # Exact all-pairs is O(n·reachable) state by definition — the
        # sampled scale path is graph_metrics.approx_path_metrics; this
        # surface exists for reference parity on KG-sized graphs.
        # unit weights as LONG so distances serialize as int64 — the
        # contract hash is type-sensitive, and the oracle emits BIGINT
        _guard_exact_all_pairs(
            spark, nodes, "allShortestPaths.stream",
            "graph_metrics.approx_path_metrics",
        )
        unit = edges.select("src", "dst", F.lit(1).cast("long").alias("weight"))
        d = weighted_sssp(
            unit, nodes.select("id"), max_hops=64, directed=False,
            on_truncation="raise",
        )
        return d.filter(F.col("source") != F.col("node")).select(
            F.col("source").alias("sourceNodeId"),
            F.col("node").alias("targetNodeId"),
            F.col("dist").alias("distance"),
        )
    if key == "localclusteringcoefficient.stats":
        from cognee_graphdb_spark.operators.graph_metrics import triangle_clustering

        tc = triangle_clustering(nodes, edges)
        return tc.agg(F.avg("clustering").alias("averageClusteringCoefficient"))
    if key == "localclusteringcoefficient.stream":
        from cognee_graphdb_spark.operators.graph_metrics import triangle_clustering

        tc = triangle_clustering(nodes, edges)
        return tc.select(
            F.col("id").alias("nodeId"),
            F.col("clustering").alias("localClusteringCoefficient"),
        )
    if key == "pagerank.stream":
        from cognee_graphdb_spark.operators.graph_metrics import pagerank

        c = _conf(
            config, "pageRank.stream",
            maxIterations=((int,), 10), dampingFactor=((int, float), 0.85),
            relationshipWeightProperty=((str,), None),
        )
        prop = c["relationshipWeightProperty"]
        weight_col = None
        if prop is not None:
            # weighted pageRank: the edge property scales each edge's share
            # of the source's rank (pagerank's weight_col normalizes per
            # source internally)
            if "properties" not in edges.columns:
                raise CypherUnsupported(
                    "relationshipWeightProperty needs the projection's edges "
                    "to carry a properties map"
                )
            edges = edges.select(
                "src", "dst",
                F.element_at("properties", F.lit(prop)).cast("double").alias("__w"),
            )
            if edges.filter(F.col("__w").isNull()).limit(1).count() > 0:
                raise CypherUnsupported(
                    f"gds.pageRank.stream: every relationship needs a "
                    f"numeric {prop!r} property"
                )
            weight_col = "__w"
        pr = pagerank(
            nodes.select("id"), edges,
            damping=float(c["dampingFactor"]), n_iter=c["maxIterations"],
            weight_col=weight_col,
        )
        return pr.select(F.col("id").alias("nodeId"), F.col("rank").alias("score"))
    if key == "louvain.stream":
        from cognee_graphdb_spark.operators.graph_metrics import louvain

        c = _conf(
            config, "louvain.stream",
            maxLevels=((int,), 2), maxIterations=((int,), 3),
        )
        lv = louvain(nodes, edges, n_levels=c["maxLevels"], n_rounds=c["maxIterations"])
        return lv.select(
            F.col("id").alias("nodeId"), F.col("label").alias("communityId")
        )
    if key == "leiden.stream":
        from cognee_graphdb_spark.operators.graph_metrics import leiden

        c = _conf(
            config, "leiden.stream",
            maxLevels=((int,), 2), maxIterations=((int,), 2),
        )
        ld = leiden(nodes, edges, n_levels=c["maxLevels"], n_rounds=c["maxIterations"])
        return ld.select(
            F.col("id").alias("nodeId"), F.col("label").alias("communityId")
        )
    if key == "labelpropagation.stream":
        from cognee_graphdb_spark.operators.graph_metrics import label_propagation

        c = _conf(config, "labelPropagation.stream", maxIterations=((int,), 5))
        lp = label_propagation(nodes, edges, n_rounds=c["maxIterations"])
        return lp.select(
            F.col("id").alias("nodeId"), F.col("label").alias("communityId")
        )
    if key == "scc.stream":
        from cognee_graphdb_spark.operators.graph_metrics import (
            strongly_connected_components,
        )

        sc = strongly_connected_components(nodes, edges)
        return sc.select(
            F.col("id").alias("nodeId"), F.col("label").alias("componentId")
        )
    if key == "hits.stream":
        from cognee_graphdb_spark.operators.graph_metrics import hits as _hits

        hv = _hits(nodes, edges)
        return hv.select(
            F.col("id").alias("nodeId"),
            F.col("hub").alias("hub"),
            F.col("authority").alias("auth"),
        )
    if key == "dag.topologicalsort.stream":
        from cognee_graphdb_spark.operators.dag import topological_layers

        tl = topological_layers(nodes.select("id"), edges)
        # GDS yields maxDistanceFromSource with computeMaxDistanceFromSource;
        # our Kahn-peel layer IS that longest source-distance, so the stream
        # serves both the order (sort by it) and the distance
        return tl.select(
            F.col("id").alias("nodeId"),
            F.col("layer").alias("maxDistanceFromSource"),
        )
    if key == "eigenvector.stream":
        from cognee_graphdb_spark.operators.graph_metrics import eigenvector

        c = _conf(config, "eigenvector.stream", maxIterations=((int,), 10))
        ev = eigenvector(nodes, edges, n_iter=c["maxIterations"])
        return ev.select(F.col("id").alias("nodeId"), F.col("score").alias("score"))
    if key == "articlerank.stream":
        from cognee_graphdb_spark.operators.graph_metrics import articlerank

        c = _conf(
            config, "articleRank.stream",
            maxIterations=((int,), 10), dampingFactor=((int, float), 0.85),
        )
        ar = articlerank(
            nodes, edges, damping=float(c["dampingFactor"]), n_iter=c["maxIterations"]
        )
        return ar.select(F.col("id").alias("nodeId"), F.col("rank").alias("score"))
    if key == "degree.stream":
        # gds.degree: out-degree of the natural orientation by default; the
        # orientation config flips (REVERSE = in-degree) or doubles
        # (UNDIRECTED = degree of the symmetrized view, GDS's convention)
        c = _conf(config, "degree.stream", orientation=((str,), "NATURAL"))
        orient = c["orientation"].upper()
        if orient not in ("NATURAL", "REVERSE", "UNDIRECTED"):
            raise CypherUnsupported(
                f"gds.degree.stream: unknown orientation {orient!r}"
            )
        e = edges.select("src", "dst")
        if orient == "REVERSE":
            e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        elif orient == "UNDIRECTED":
            e = e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        deg = (
            nodes.select("id")
            .distinct()
            .join(
                e.groupBy(F.col("src").alias("id")).agg(
                    F.count(F.lit(1)).alias("score")
                ),
                "id",
                "left",
            )
            .select(
                F.col("id").alias("nodeId"),
                F.coalesce("score", F.lit(0)).cast("long").alias("score"),
            )
        )
        return deg
    if key == "kcore.stream":
        from cognee_graphdb_spark.operators.graph_metrics import coreness

        co = coreness(nodes, edges)
        return co.select(
            F.col("id").alias("nodeId"), F.col("coreness").alias("coreValue")
        )
    if key == "closeness.stream":
        from cognee_graphdb_spark.operators.paths import weighted_sssp

        # exact closeness from the same all-pairs BFS allShortestPaths uses:
        # score(v) = (reachable-1) / sum(d) — 0 for isolated nodes (the GDS
        # convention).  Exact all-pairs by definition; the sampled scale
        # path is approx_harmonic_closeness.
        _guard_exact_all_pairs(
            spark, nodes, "closeness.stream",
            "graph_metrics.approx_harmonic_closeness",
        )
        unit = edges.select("src", "dst", F.lit(1).cast("long").alias("weight"))
        d = weighted_sssp(
            unit, nodes.select("id"), max_hops=64, directed=False,
            on_truncation="raise",
        )
        per = (
            d.filter(F.col("source") != F.col("node"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("reach"),
                F.sum("dist").alias("total"),
            )
        )
        return (
            nodes.select("id")
            .distinct()
            .join(per.withColumnRenamed("source", "id"), "id", "left")
            .select(
                F.col("id").alias("nodeId"),
                F.when(
                    F.coalesce("total", F.lit(0)) > 0,
                    F.col("reach").cast("double") / F.col("total"),
                )
                .otherwise(F.lit(0.0))
                .alias("score"),
            )
        )
    if key == "betweenness.stream":
        from cognee_graphdb_spark.operators.graph_metrics import betweenness_sampled

        # GDS's default is EXACT betweenness = all-sources Brandes, O(V·E)
        # state — same scale class as allShortestPaths, same structural
        # guard.  GDS's own scale knob is the config map's samplingSize
        # (Brandes & Pich 2007): when set, the estimator runs from that
        # many hash-picked sources, unbiased by the V/|S| factor (the
        # api.centrality discipline), and the all-pairs guard does not
        # apply — the state is O(|S|·E) by construction.
        c = _conf(config, "betweenness.stream", samplingSize=((int,), None))
        ids = nodes.select("id").distinct()
        if c["samplingSize"] is not None:
            if c["samplingSize"] < 1:
                raise CypherUnsupported("gds.betweenness.stream: samplingSize must be >= 1")
            if c["samplingSize"] > _EXACT_ALL_PAIRS_NODE_BUDGET:
                # a samplingSize at or beyond the budget IS the exact job
                # the guard exists to refuse — the knob must not be a
                # guard bypass (opt-in conf still applies)
                _guard_exact_all_pairs(
                    spark, nodes, "betweenness.stream",
                    f"samplingSize <= {_EXACT_ALL_PAIRS_NODE_BUDGET}",
                )
            n_total = ids.count()
            n_eff = min(c["samplingSize"], n_total)
            sources = ids.orderBy(F.xxhash64("id"), "id").limit(c["samplingSize"])
            scale = (float(n_total) / float(max(n_eff, 1))) / 2.0
        else:
            _guard_exact_all_pairs(
                spark, nodes, "betweenness.stream",
                "samplingSize config (Brandes-Pich sampled estimator)",
            )
            sources, scale = ids, 0.5
        bt = betweenness_sampled(edges, sources, max_hops=64)
        # undirected convention: every unordered pair is seen from both
        # endpoints when both are sampled — halve (GDS divides by 2 for
        # undirected projections); the sampled path folds the V/|S|
        # unbiasing factor into the same scale constant
        return (
            ids.join(bt.withColumnRenamed("node", "id"), "id", "left")
            .select(
                F.col("id").alias("nodeId"),
                (F.coalesce("betweenness", F.lit(0.0)) * F.lit(scale)).alias("score"),
            )
        )
    if key == "closeness.harmonic.stream":
        from cognee_graphdb_spark.operators.paths import weighted_sssp

        # exact harmonic closeness: sum over reachable of 1/d, normalized by
        # n-1 (the GDS convention); all-pairs by definition — guarded, with
        # the HyperANF sketch as the scale path
        _guard_exact_all_pairs(
            spark, nodes, "closeness.harmonic.stream",
            "graph_metrics.approx_harmonic_closeness",
        )
        n_total = nodes.select("id").distinct().count()
        unit = edges.select("src", "dst", F.lit(1).cast("long").alias("weight"))
        d = weighted_sssp(
            unit, nodes.select("id"), max_hops=64, directed=False,
            on_truncation="raise",
        )
        per = (
            d.filter(F.col("source") != F.col("node"))
            .groupBy("source")
            .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("h"))
        )
        denom = float(n_total - 1) if n_total > 1 else 1.0
        return (
            nodes.select("id")
            .distinct()
            .join(per.withColumnRenamed("source", "id"), "id", "left")
            .select(
                F.col("id").alias("nodeId"),
                (F.coalesce("h", F.lit(0.0)) / F.lit(denom)).alias("centrality"),
            )
        )
    if key == "nodesimilarity.stream":
        from cognee_graphdb_spark.operators.graph_metrics import node_similarity

        c = _conf(
            config, "nodeSimilarity.stream",
            topK=((int,), 10), similarityCutoff=((int, float), 0.0),
        )
        ns = node_similarity(
            nodes, edges,
            top_k=c["topK"], similarity_cutoff=float(c["similarityCutoff"]),
        )
        return ns.select(
            F.col("id_a").alias("node1"),
            F.col("id_b").alias("node2"),
            F.col("jaccard").alias("similarity"),
        )
    if key == "knn.stream":
        from pyspark.sql.window import Window

        from cognee_graphdb_spark.functions.vectors import cosine_similarity

        # gds.knn streams each node's topK most-similar nodes by a vector
        # property (default cosine) — same property convention as kmeans:
        # the projection's nodes must carry the named array column
        # ('embedding' by default, GDS's nodeProperties config).
        # GDS's implementation is approximate NN-descent; this surface is
        # the exact brute-force semantics (broadcast all-queries × scan),
        # which is the all-pairs scale class — guarded like the other
        # exact procedures, with the LSH/IVF ANN family as the scale path.
        c = _conf(
            config, "knn.stream",
            topK=((int,), 10), nodeProperties=((str,), "embedding"),
        )
        prop = c["nodeProperties"]
        if prop not in nodes.columns:
            raise CypherUnsupported(
                f"gds.knn.stream needs the projection's nodes to carry an "
                f"{prop!r} array column (the GDS nodeProperties); join "
                "one on — e.g. embed_graph's vectors — or use the "
                "operators.similarity ANN family for custom columns"
            )
        _guard_exact_all_pairs(
            spark, nodes, "knn.stream",
            "operators.similarity (LSH/IVF approximate neighbors)",
        )
        emb = nodes.select(
            F.col("id"), F.col(prop).cast("array<double>").alias("v")
        )
        # the node-count guard was sized for O(n*distance-state) procedures;
        # this one BROADCASTS n*d doubles, so wide embeddings blow the
        # broadcast well under the node budget — bound the cells too
        # (50M doubles ~ 400 MB).  Bounded probes: one first() for d, one
        # count for n.
        first = emb.select(F.size("v").alias("d")).first()
        dim = int(first["d"]) if first is not None else 0
        n_rows = emb.count()
        if n_rows * max(dim, 1) > 50_000_000:
            raise GdsScaleGuard(
                f"gds.knn.stream broadcasts every vector ({n_rows} rows x "
                f"{dim} dims > 50M cells); use the operators.similarity "
                "ANN family (LSH/IVF) for collections this wide"
            )
        q = emb.select(
            F.col("id").alias("qid"), F.col("v").alias("qv")
        )
        joined = (
            emb.crossJoin(F.broadcast(q))
            .filter(F.col("id") != F.col("qid"))  # GDS excludes self-pairs
            .select(
                "qid", "id", cosine_similarity(F.col("v"), F.col("qv")).alias("sim")
            )
        )
        w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("id"))
        return (
            joined.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= c["topK"])  # GDS default topK=10
            .select(
                F.col("qid").alias("node1"),
                F.col("id").alias("node2"),
                F.col("sim").alias("similarity"),
            )
        )
    if key == "kmeans.stream":
        from cognee_graphdb_spark.operators.clustering import kmeans

        # gds.kmeans clusters a node-carried vector property (the config
        # map's nodeProperty, default 'embedding' — e.g. api.embed_graph's
        # Entity_graph vectors joined onto the projection).  GDS defaults:
        # k=10, maxIterations=10; distanceFromCentroid is the cosine
        # distance 1 - sim.
        c = _conf(
            config, "kmeans.stream",
            k=((int,), 10), maxIterations=((int,), 10),
            nodeProperty=((str,), "embedding"),
        )
        prop = c["nodeProperty"]
        if prop not in nodes.columns:
            raise CypherUnsupported(
                f"gds.kmeans.stream needs the projection's nodes to carry an "
                f"{prop!r} array column (the GDS nodeProperty); join one "
                "on — e.g. embed_graph's vectors — or call "
                "operators.clustering.kmeans directly for custom columns"
            )
        km = kmeans(
            nodes, k=c["k"], n_iter=c["maxIterations"], id_col="id", vector_col=prop
        )
        return km.select(
            F.col("id").alias("nodeId"),
            F.col("cluster").cast("long").alias("communityId"),
            (F.lit(1.0) - F.col("sim")).alias("distanceFromCentroid"),
        )
    if key == "conductance.stream":
        from cognee_graphdb_spark.operators.graph_metrics import conductance

        # gds.conductance streams per-community boundary/volume for a
        # node-carried community assignment (the config map's
        # communityProperty, default 'community' — e.g. a louvain/leiden/
        # lpa result joined onto the projection).
        c = _conf(
            config, "conductance.stream", communityProperty=((str,), "community")
        )
        prop = c["communityProperty"]
        if prop not in nodes.columns:
            raise CypherUnsupported(
                f"gds.conductance.stream needs the projection's nodes to "
                f"carry a {prop!r} column (the GDS communityProperty); "
                "join a communities() result on, or call "
                "operators.graph_metrics.conductance directly"
            )
        labels = nodes.select("id", F.col(prop).alias("label"))
        out = conductance(edges, labels)
        return out.select(
            F.col("label").alias("community"),
            (
                F.col("boundary").cast("double")
                / F.greatest(
                    (F.col("internal") + F.col("boundary")).cast("double"),
                    F.lit(1.0),
                )
            ).alias("conductance"),
        )
    if key == "trianglecount.stream":
        from cognee_graphdb_spark.operators.graph_metrics import triangle_counts

        tc = triangle_counts(nodes, edges)
        return tc.select(
            F.col("id").alias("nodeId"), F.col("triangles").alias("triangleCount")
        )
    if key in ("shortestpath.dijkstra.stream", "allshortestpaths.dijkstra.stream"):
        # gds.allShortestPaths.dijkstra is GDS's single-source all-targets
        # spelling of the same procedure — one handler, targetNode optional
        from cognee_graphdb_spark.operators.paths import sssp_paths, weighted_sssp

        # gds.shortestPath.dijkstra from a sourceNode (required config, a
        # node id), optionally to one targetNode, following
        # relationshipWeightProperty from the edge properties map (unit/hop
        # weights when absent — GDS's unweighted default).  UNDIRECTED like
        # the other path procedures on this surface (the reference projects
        # every relationship UNDIRECTED, adapter.py:1152-1157); the stream
        # yields the rendered path string (sssp_paths) instead of GDS's
        # internal nodeId arrays.  Single-source: O(E) state per round, no
        # all-pairs guard needed; the hop bound fails loudly on truncation.
        c = _conf(
            config, "shortestPath.dijkstra.stream",
            sourceNode=((str,), None),
            targetNode=((str,), None),
            relationshipWeightProperty=((str,), None),
        )
        if c["sourceNode"] is None:
            raise CypherUnsupported(
                "gds.shortestPath.dijkstra.stream requires the sourceNode "
                "config key (a node id string)"
            )
        src = nodes.select("id").filter(F.col("id") == c["sourceNode"]).distinct()
        if src.limit(1).count() == 0:  # bounded probe — GDS errors too
            raise CypherUnsupported(
                f"gds.shortestPath.dijkstra.stream: sourceNode "
                f"{c['sourceNode']!r} is not in the projection"
            )
        e = _weighted_edge_view(
            edges, c["relationshipWeightProperty"], "shortestPath.dijkstra.stream"
        )
        d = weighted_sssp(
            e, src, max_hops=64, directed=False, return_pred=True,
            on_truncation="raise",
        )
        out = sssp_paths(d, max_hops=64).select(
            F.col("source").alias("sourceNode"),
            F.col("node").alias("targetNode"),
            F.col("dist").cast("double").alias("totalCost"),
            "path",
        )
        if c["targetNode"] is not None:
            out = out.filter(F.col("targetNode") == c["targetNode"])
        return out
    if key == "fastrp.stream":
        from cognee_graphdb_spark.operators.node_embeddings import fastrp_embeddings

        # gds.fastRP — GDS's default embedding procedure (Chen et al. 2019).
        # embeddingDimension is required by GDS; iterationWeights defaults
        # to GDS's [0.0, 1.0, 1.0].  randomSeed follows the deterministic
        # seeded-hash init (operators/node_embeddings.py:fastrp_embeddings
        # — no RNG state, so equal seeds are bit-reproducible).
        c = _conf(
            config, "fastRP.stream",
            embeddingDimension=((int,), None),
            iterationWeights=((list,), None),
            randomSeed=((int,), 42),
        )
        if c["embeddingDimension"] is None:
            raise CypherUnsupported(
                "gds.fastRP.stream requires the embeddingDimension config key"
            )
        weights = c["iterationWeights"]
        if weights is not None and not all(
            isinstance(w, (int, float)) for w in weights
        ):
            raise CypherUnsupported("gds.fastRP.stream: iterationWeights must be numbers")
        fe = fastrp_embeddings(
            nodes, edges,
            dim=c["embeddingDimension"],
            iteration_weights=tuple(float(w) for w in weights)
            if weights is not None
            else (0.0, 1.0, 1.0),
            seed=c["randomSeed"],
        )
        return fe.select(F.col("id").alias("nodeId"), F.col("embedding"))
    if key == "modularity.stream":
        from cognee_graphdb_spark.operators.graph_metrics import modularity

        # gds.modularity streams per-community Newman modularity for a
        # node-carried community assignment (the required communityProperty
        # config key — GDS requires it too).  Composes with mutate mode:
        # gds.louvain.mutate(...{mutateProperty:'community'}) then
        # gds.modularity.stream reads the written column.  The exact
        # decimal(38,0) contributions (graph_metrics.modularity) divide
        # ONCE per row here, so the floats are reassociation-free.
        c = _conf(config, "modularity.stream", communityProperty=((str,), None))
        prop = c["communityProperty"]
        if prop is None:
            raise CypherUnsupported(
                "gds.modularity.stream requires the communityProperty "
                "config key (GDS requires it as well)"
            )
        if prop not in nodes.columns:
            raise CypherUnsupported(
                f"gds.modularity.stream needs the projection's nodes to "
                f"carry a {prop!r} column (the GDS communityProperty); "
                "join a communities() result on, mutate one in, or call "
                "operators.graph_metrics.modularity directly"
            )
        _refuse_null_communities(nodes, prop, "modularity.stream")
        labels = nodes.select("id", F.col(prop).alias("label"))
        out = modularity(edges, labels)
        s2 = F.col("s_total").cast("double") * F.col("s_total").cast("double")
        return out.select(
            F.col("label").alias("communityId"),
            F.when(F.col("s_total") == 0, F.lit(0.0))
            .otherwise(F.col("contrib_scaled").cast("double") / s2)
            .alias("modularity"),
        )
    if key == "modularity.stats":
        from cognee_graphdb_spark.operators.graph_metrics import modularity

        # the whole-clustering scalar: sum the exact integer contributions
        # across communities, divide ONCE (gds.modularity's stats mode —
        # the number a quality gate compares two clusterings with)
        c = _conf(config, "modularity.stats", communityProperty=((str,), None))
        prop = c["communityProperty"]
        if prop is None or prop not in nodes.columns:
            raise CypherUnsupported(
                "gds.modularity.stats requires the communityProperty config "
                "key naming a column the projection's nodes carry"
            )
        _refuse_null_communities(nodes, prop, "modularity.stats")
        out = modularity(edges, nodes.select("id", F.col(prop).alias("label")))
        stats = out.agg(
            F.count(F.lit(1)).alias("communityCount"),
            F.sum("contrib_scaled").alias("num"),
            F.first("s_total").alias("s"),
        )
        return stats.select(
            "communityCount",
            F.when(
                F.col("s").isNull() | (F.col("s") == 0), F.lit(0.0)
            ).otherwise(
                F.col("num").cast("double")
                / (F.col("s").cast("double") * F.col("s").cast("double"))
            ).alias("modularity"),
        )
    if key == "node2vec.stream":
        from cognee_graphdb_spark.operators.graph_metrics import (
            node2vec_walks,
            walk_skipgram_pairs,
        )
        from cognee_graphdb_spark.operators.node_embeddings import (
            sppmi_node_embeddings,
        )

        # gds.node2vec (Grover & Leskovec KDD'16), Spark-first: biased walks
        # -> skip-gram pairs -> SPPMI-SVD factorization.  Levy & Goldberg
        # 2014 prove skip-gram-with-negative-sampling implicitly factorizes
        # the PMI matrix shifted by log(#negatives), so the closed-form
        # factorization with shift = negativeSamplingRate IS the
        # deterministic equivalent of GDS's SGD training — reproducible
        # under randomSeed, which GDS's concurrent SGD explicitly is not.
        # GDS config names map 1:1: returnFactor = p, inOutFactor = q.
        c = _conf(
            config, "node2vec.stream",
            embeddingDimension=((int,), 128),
            walkLength=((int,), 80),
            walksPerNode=((int,), 10),
            returnFactor=((int, float), 1.0),
            inOutFactor=((int, float), 1.0),
            windowSize=((int,), 10),
            negativeSamplingRate=((int,), 5),
            randomSeed=((int,), 0),
        )
        if c["embeddingDimension"] < 1 or c["walkLength"] < 2:
            raise CypherUnsupported(
                "gds.node2vec.stream: embeddingDimension must be >= 1 and "
                "walkLength >= 2 nodes"
            )
        if c["walksPerNode"] < 1 or c["windowSize"] < 1 or c["negativeSamplingRate"] < 1:
            # validate every knob HERE so a bad value names the GDS config
            # key, not an operator-internal parameter
            raise CypherUnsupported(
                "gds.node2vec.stream: walksPerNode, windowSize, and "
                "negativeSamplingRate must all be >= 1"
            )
        dim = c["embeddingDimension"]
        # bounded probe: touch at most dim+1 distinct ids, not the table
        if nodes.select("id").distinct().limit(dim).count() < dim:
            raise CypherUnsupported(
                f"gds.node2vec.stream: embeddingDimension {dim} exceeds "
                "the projection's node count (the factorization rank "
                "cannot); pass a smaller embeddingDimension"
            )
        walks = node2vec_walks(
            edges,
            walk_length=c["walkLength"] - 1,  # GDS counts nodes, ours steps
            num_walks=c["walksPerNode"],
            p=float(c["returnFactor"]),
            q=float(c["inOutFactor"]),
            seed=c["randomSeed"],
        )
        emb = sppmi_node_embeddings(
            walk_skipgram_pairs(walks, window=c["windowSize"]),
            dim=c["embeddingDimension"],
            shift=c["negativeSamplingRate"],
            seed=c["randomSeed"],
        )
        if emb.limit(1).count() == 0:
            # SPPMI = max(0, PMI - log k): on a small/diffuse corpus the
            # default k = 5 can zero EVERY cell, leaving nothing to
            # factorize — name the knob instead of streaming zero rows
            raise CypherUnsupported(
                "gds.node2vec.stream: the SPPMI matrix is empty at "
                f"negativeSamplingRate {c['negativeSamplingRate']} (no "
                "co-occurrence clears the log-k shift on this corpus); "
                "lower negativeSamplingRate or raise walksPerNode/walkLength"
            )
        return emb.select(F.col("id").alias("nodeId"), F.col("embedding"))
    if key == "scaleproperties.stream":
        from cognee_graphdb_spark.operators.scaling import SCALERS, scale_properties

        # gds.scaleProperties — normalize node properties into one vector
        # (the GDS feature-preparation step ahead of kmeans/knn/fastRP).
        # nodeProperties is required (a list of property names, scaled in
        # order); scaler defaults to GDS's MinMax; offset mirrors the log
        # scaler's config.  One aggregate pass + a 1-row broadcast — the
        # node table itself never shuffles (operators/scaling.py).
        c = _conf(
            config, "scaleProperties.stream",
            nodeProperties=((list,), None),
            scaler=((str,), "MinMax"),
            offset=((int, float), 0.0),
        )
        props = c["nodeProperties"]
        if not props or not all(isinstance(p, str) for p in props):
            raise CypherUnsupported(
                "gds.scaleProperties.stream requires the nodeProperties "
                "config key (a non-empty list of node property names)"
            )
        missing = [p for p in props if p not in nodes.columns]
        if missing:
            raise CypherUnsupported(
                f"gds.scaleProperties.stream: the projection's nodes lack "
                f"property column(s) {missing}"
            )
        scaler = c["scaler"].lower()
        if scaler not in SCALERS:
            raise CypherUnsupported(
                f"gds.scaleProperties.stream: unknown scaler {c['scaler']!r}; "
                f"supported: {sorted(SCALERS)}"
            )
        sp = scale_properties(
            nodes, props, scaler=scaler, log_offset=float(c["offset"])
        )
        return sp.select(
            F.col("id").alias("nodeId"), F.col("scaled").alias("scaledProperty")
        )
    if key == "spanningtree.stream":
        from cognee_graphdb_spark.operators.paths import weighted_sssp
        from cognee_graphdb_spark.operators.spanning import minimum_spanning_forest

        # gds.spanningTree from a sourceNode: the minimum-weight spanning
        # tree of the source's connected component, streamed rooted (nodeId,
        # parentId, weight — the GDS yield).  Computed Spark-first: the
        # whole graph's Borůvka MSF (its restriction to any component IS
        # that component's MST), then ONE unit-weight BFS over the |V|-c
        # forest edges from the source assigns parents (forest ⇒ the
        # predecessor is unique — no tie-break enters the result).  The
        # source roots itself at weight 0.0, GDS's convention.
        c = _conf(
            config, "spanningTree.stream",
            sourceNode=((str,), None),
            relationshipWeightProperty=((str,), None),
            maxDepth=((int,), 1024),
        )
        if c["sourceNode"] is None:
            raise CypherUnsupported(
                "gds.spanningTree.stream requires the sourceNode config key "
                "(a node id string)"
            )
        src = nodes.select("id").filter(F.col("id") == c["sourceNode"]).distinct()
        if src.limit(1).count() == 0:  # bounded probe — GDS errors too
            raise CypherUnsupported(
                f"gds.spanningTree.stream: sourceNode {c['sourceNode']!r} "
                "is not in the projection"
            )
        e = _weighted_edge_view(
            edges, c["relationshipWeightProperty"], "spanningTree.stream"
        )
        forest = minimum_spanning_forest(e)
        try:
            # the rooting BFS early-exits when the frontier empties, so the
            # generous default costs nothing on shallow trees; MST depth can
            # exceed graph diameter, hence a config knob rather than the
            # dijkstra route's fixed bound
            d = weighted_sssp(
                forest.select("src", "dst", F.lit(1).cast("long").alias("weight")),
                src, max_hops=c["maxDepth"], directed=False, return_pred=True,
                on_truncation="raise",
            )
            d = d.localCheckpoint(eager=True)
        except RuntimeError as exc:
            raise CypherUnsupported(
                f"gds.spanningTree.stream: the spanning tree is deeper than "
                f"maxDepth {c['maxDepth']} hops from the source; raise the "
                "maxDepth config key"
            ) from exc
        fw = forest.select(
            F.col("src").alias("pred"), F.col("dst").alias("node"), "weight"
        ).unionByName(
            forest.select(
                F.col("dst").alias("pred"), F.col("src").alias("node"), "weight"
            )
        )
        rooted = (
            d.filter(F.col("pred").isNotNull())
            .join(fw, ["pred", "node"])
            .select(
                F.col("node").alias("nodeId"),
                F.col("pred").alias("parentId"),
                F.col("weight").cast("double").alias("weight"),
            )
        )
        root = d.filter(F.col("pred").isNull()).select(
            F.col("node").alias("nodeId"),
            F.col("node").alias("parentId"),
            F.lit(0.0).alias("weight"),
        )
        return rooted.unionByName(root)
    if key == "kspanningtree.stream":
        from cognee_graphdb_spark.operators.spanning import k_spanning_clusters

        # gds.kSpanningTree — single-linkage clustering: cut the MSF's
        # max(0, k-c) heaviest edges (operators/spanning.py).  communityId
        # is each tree's smallest member id, the same representative
        # convention as the wcc/scc streams on this surface.
        c = _conf(
            config, "kSpanningTree.stream",
            k=((int,), None),
            relationshipWeightProperty=((str,), None),
        )
        if c["k"] is None or c["k"] < 1:
            raise CypherUnsupported(
                "gds.kSpanningTree.stream requires the k config key "
                "(a positive integer cluster count)"
            )
        e = _weighted_edge_view(
            edges, c["relationshipWeightProperty"], "kSpanningTree.stream"
        )
        # edge-less projected nodes are their own single-linkage clusters
        # and count toward k: cut the edge part at k - |isolated| (floored
        # at 1 — you cannot cut below the edge part's own component count)
        # and union the singletons back, each labeled by itself (= its
        # smallest member, the shared convention).  Self-loop-only nodes
        # stay with the edge part — k_spanning_clusters already emits them
        # as singletons and counts their components.
        ends = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        iso = nodes.select("id").distinct().join(ends, "id", "left_anti")
        n_iso = iso.count()
        ks = k_spanning_clusters(e, k=max(1, c["k"] - n_iso))
        return ks.select(
            F.col("id").alias("nodeId"), F.col("cluster").alias("communityId")
        ).unionByName(
            iso.select(
                F.col("id").alias("nodeId"), F.col("id").alias("communityId")
            )
        )
    if key == "randomwalk.stream":
        from cognee_graphdb_spark.operators.graph_metrics import random_walks

        # gds.randomWalk — node2vec's sampling stage as its own procedure.
        # GDS defaults: walkLength 80 (nodes per walk), walksPerNode 10.
        # The "random" choice is the seeded-hash pick of
        # graph_metrics.random_walks — reproducible under randomSeed, the
        # property an exactly-restartable corpus build needs and GDS's RNG
        # cannot give.  Yields nodeIds (the walk's nodes in step order),
        # GDS's yield column; walks start at every relationship-incident
        # node (an isolated node has no step to take).
        c = _conf(
            config, "randomWalk.stream",
            walkLength=((int,), 80),
            walksPerNode=((int,), 10),
            randomSeed=((int,), 0),
        )
        if c["walkLength"] < 2 or c["walksPerNode"] < 1:
            raise CypherUnsupported(
                "gds.randomWalk.stream: walkLength must be >= 2 nodes and "
                "walksPerNode >= 1"
            )
        w = random_walks(
            edges,
            walk_length=c["walkLength"] - 1,  # GDS counts nodes, ours steps
            num_walks=c["walksPerNode"],
            seed=c["randomSeed"],
        )
        return (
            w.groupBy("start", "walk")
            .agg(F.array_sort(F.collect_list(F.struct("step", "node"))).alias("s"))
            .select(F.transform("s", lambda x: x["node"]).alias("nodeIds"))
        )
    raise CypherUnsupported(
        f"unsupported gds procedure gds.{proc} "
        "(wcc, allShortestPaths, localClusteringCoefficient, pageRank, "
        "eigenvector, articleRank, louvain, leiden, labelPropagation, scc, "
        "hits, degree, kcore, triangleCount, nodeSimilarity, closeness, "
        "closeness.harmonic, betweenness, kmeans, knn, conductance, "
        "dag.topologicalSort, fastRP, shortestPath.dijkstra, modularity, "
        "scaleProperties, spanningTree, kSpanningTree, randomWalk, node2vec)"
    )


def _apply_yield_return(
    spark, out: DataFrame, yield_str: str | None, ret_str: str | None
) -> DataFrame:
    """Apply a procedure call's ``YIELD cols [RETURN exprs]`` tail: project
    to the yielded columns, then (when RETURN is present) materialize them
    as a view and run the RETURN tail as SQL over it — Cypher's implicit
    grouping (non-aggregate return items become grouping keys when any
    aggregate is present) and trailing ORDER BY are preserved."""
    if yield_str:
        have = {c.lower(): c for c in out.columns}
        want = [w.strip() for w in yield_str.split(",") if w.strip()]
        missing = [w for w in want if w.lower() not in have]
        if missing:
            raise CypherUnsupported(
                f"YIELD names unknown column(s) {missing}; the procedure "
                f"streams {out.columns}"
            )
        out = out.select([have[w.lower()] for w in want])
    if not ret_str:
        return out
    # per-call view name: a fixed name races concurrent run_cypher calls on
    # one shared SparkSession
    view = f"__gds_yield_{uuid.uuid4().hex[:12]}"
    out.createOrReplaceTempView(view)
    ret = ret_str.strip()
    order_sql = ""
    om = re.search(r"\bORDER\s+BY\b", ret, re.IGNORECASE)
    if om:
        order_sql = " " + ret[om.start():].strip()
        ret = ret[: om.start()].strip()
    # paren-aware split: commas inside function calls don't separate items
    items, depth, cur = [], 0, []
    for ch in ret:
        depth += ch == "("
        depth -= ch == ")"
        if ch == "," and depth == 0:
            items.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        items.append("".join(cur).strip())
    yielded = {c.lower() for c in out.columns}
    for item in items:
        base = re.split(r"\s+AS\s+", item, flags=re.IGNORECASE)[0].strip()
        fn = re.match(r"([A-Za-z_][A-Za-z0-9_]*)\s*\(", base)
        if fn and fn.group(1).lower() not in _GDS_AGG_FNS:
            raise CypherUnsupported(f"unsupported function in gds RETURN: {base}")
        if not fn and base != "*" and base.lower() not in yielded:
            raise CypherUnsupported(f"gds RETURN references un-YIELDed column: {base}")
    has_agg = any(
        re.match(rf"({'|'.join(_GDS_AGG_FNS)})\s*\(", i, re.IGNORECASE) for i in items
    )
    group_sql = ""
    if has_agg:
        keys = [
            re.split(r"\s+AS\s+", i, flags=re.IGNORECASE)[0].strip()
            for i in items
            if not re.match(rf"({'|'.join(_GDS_AGG_FNS)})\s*\(", i, re.IGNORECASE)
        ]
        if keys:
            group_sql = " GROUP BY " + ", ".join(keys)
    # Cypher's collect() is Spark's collect_list() (adapter.py:1115's
    # gds.graph.list tail collects graph names); rewrite after validation so
    # the aggregate classification above still sees the Cypher spelling
    ret = re.sub(r"\bcollect\s*\(", "collect_list(", ret, flags=re.IGNORECASE)
    try:
        return spark.sql(f"SELECT {ret} FROM {view}{group_sql}{order_sql}")
    finally:
        spark.catalog.dropTempView(view)


def _run_gds_call(spark, nodes: DataFrame, edges: DataFrame, m) -> DataFrame:
    """Execute a ``CALL gds.*(...) YIELD ... RETURN ...`` query against the
    named catalog projection when one exists (gds.graph.project), else the
    passed (nodes, edges) pair.

    ``mutate`` mode writes a procedure's per-node result back INTO the
    catalog projection as a node property (the GDS chaining workflow:
    ``gds.louvain.mutate('g', {mutateProperty: 'community'})`` then
    ``gds.conductance.stream('g')``, or ``gds.fastRP.mutate`` then
    ``gds.kmeans.stream`` — each stage reads the previous stage's column
    off the cached frames, no store round-trip)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    conf_src = (m.group("config") or "").strip()
    config = _parse_call_args("{" + conf_src + "}")[0] if conf_src else {}
    mode = m.group(2).lower()
    cat = _session_catalog(spark)
    entry = cat.get(m.group("gname"))
    if entry is not None:
        nodes, edges = entry["nodes"], entry["edges"]
    if mode != "mutate":
        out = _gds_procedure(
            spark, nodes, edges, m.group(1) + "." + mode, config
        )
        return _apply_yield_return(spark, out, m.group("yield"), m.group("ret"))
    if entry is None:
        raise CypherUnsupported(
            f"gds.{m.group(1)}.mutate needs a cataloged projection "
            f"('{m.group('gname')}' is not in this session's catalog; "
            "gds.graph.project it first)"
        )
    prop = config.pop("mutateProperty", None)
    if not isinstance(prop, str) or not prop:
        raise CypherUnsupported(
            f"gds.{m.group(1)}.mutate requires the mutateProperty config key"
        )
    if prop in nodes.columns:
        raise CypherUnsupported(
            f"gds.{m.group(1)}.mutate: the projection already carries a "
            f"{prop!r} property; pick another mutateProperty or re-project"
        )
    out = _gds_procedure(spark, nodes, edges, m.group(1) + ".stream", config)
    value_cols = [c for c in out.columns if c != "nodeId"]
    if "nodeId" not in out.columns or len(value_cols) != 1:
        raise CypherUnsupported(
            f"gds.{m.group(1)}.mutate needs a (nodeId, value) stream; "
            f"this procedure streams {out.columns}"
        )
    mutated = nodes.join(
        out.select(F.col("nodeId").alias("id"), F.col(value_cols[0]).alias(prop)),
        "id",
        "left",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    written = mutated.filter(F.col(prop).isNotNull()).count()  # materializes
    entry["nodes"].unpersist()
    entry["nodes"] = mutated
    stats = spark.createDataFrame(
        [(written, prop)], "nodePropertiesWritten long, mutateProperty string"
    )
    return _apply_yield_return(spark, stats, m.group("yield"), m.group("ret"))


def run_cypher(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    query: str,
    params: dict | None = None,
) -> DataFrame:
    """Register the graph views and execute a translated Cypher query."""
    from pyspark.sql import functions as F

    gds = _GDS_CALL_RE.match(query)
    if gds:
        return _run_gds_call(spark, nodes, edges, gds)
    mgmt = _MGMT_CALL_RE.match(query)
    if mgmt:
        return _run_mgmt_call(spark, nodes, edges, mgmt)
    if re.match(r"\s*CALL\s+(gds|db)\.", query, re.IGNORECASE):
        # a CALL the full regex rejects (no RETURN tail, YIELD aliases, ...)
        # must name the actual limitation, not fall into the MATCH translator
        # and fail with an unrelated parse error
        raise CypherUnsupported(
            "CALL gds.*/db.* requires the CALL ...(...) YIELD cols RETURN "
            "exprs shape (plain YIELD column names; RETURN optional only on "
            "the gds.graph.* / db.* management surface)"
        )
    nodes.createOrReplaceTempView("nodes")
    if "properties" not in edges.columns:
        # edge property reads (r.weight) compile to properties['weight'];
        # give property-less edge sets an empty map so they stay queryable
        edges = edges.withColumn("properties", F.create_map().cast("map<string,string>"))
    edges.createOrReplaceTempView("edges")
    return spark.sql(cypher_to_sql(query, params))
