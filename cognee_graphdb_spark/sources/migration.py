"""Relational -> property-graph migration (SURVEY.md §2.1 S4/S5).

Reference semantics (cognee/tasks/ingestion/migrate_relational_database.py:18-74):
- one ``TableType`` node per table,
- one ``TableRow`` node per row (id derived from table + primary key),
- edge ``is_part_of`` row -> table,
- one edge per FK pair (relationship named after the FK column),
- duplicate-edge elimination by (src, dst, relationship_name)
  (migrate_relational_database.py:40-59).

Spark design: the migration is a union of narrow per-table projections plus FK
equi-joins — no shuffle at all for node construction (map-only), and the FK
"join" needs no join either: the FK *value* already names the target row id, so
an edge is a pure projection of the child table.  At 100 TB this means edge
construction is embarrassingly parallel; only downstream dedup shuffles, and on
the natural key (src, dst, relationship_name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cognee_graphdb_spark.ids import node_id

# (child_table, fk_column, parent_table, parent_key)
# These are the FK pairs of the driver's TPC-H-ish schema (FIXTURES.md §5).
TPCH_FK_SPECS: tuple[tuple[str, str, str, str], ...] = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)

# primary key columns per table (tuples: composite keys supported — lineitem
# row nodes are keyed (l_orderkey, l_linenumber), one node per physical row)
TPCH_PKS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
}


def row_nodes(df: DataFrame, table: str, pk: tuple[str, ...]) -> DataFrame:
    """TableRow nodes: id = '<table>:<pk...>', type = 'TableRow', name = table."""
    return df.select(
        node_id(table, *pk).alias("id"),
        F.lit(table).alias("name"),
        F.lit("TableRow").alias("type"),
    )


def fk_edges(
    tables: dict[str, DataFrame], specs=TPCH_FK_SPECS, declared_unique: frozenset[str] = frozenset()
) -> DataFrame:
    """FK edges as pure projections (no join: the FK value IS the parent id).

    Edge = (src='<child>:<childpk...>', dst='<parent>:<fkval>', relationship_name=fk_col).
    Duplicate edges are eliminated by (src, dst, relationship_name), matching
    the reference's duplicate-edge elimination.
    """
    parts = []
    for child, fk, parent, _pkey in specs:
        df = tables[child]
        # duplicate-edge elimination by (src, dst, relationship_name)
        # (migrate_relational_database.py:40-59) — performed per branch on the
        # NARROW natural key before the id strings exist: within a branch
        # (src, dst) is an injective function of (pk..., fk), and distinct
        # branches carry distinct relationship_name literals, so per-branch
        # numeric dedup ≡ global string dedup while shuffling int keys instead
        # of ~60-byte concatenated ids (the single biggest shuffle of S4).
        key_cols = list(dict.fromkeys([*TPCH_PKS[child], fk]))
        narrow = df.select(*key_cols)
        if child not in declared_unique:
            narrow = narrow.dropDuplicates()
        parts.append(
            narrow.select(
                node_id(child, *TPCH_PKS[child]).alias("src"),
                node_id(parent, F.col(fk)).alias("dst"),
                F.lit(fk).alias("relationship_name"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if len({(c, f, p) for c, f, p, _ in specs}) != len(specs):
        # duplicate spec rows could produce cross-branch duplicates — fall
        # back to the global key dedup in that (never-default) case
        out = out.dropDuplicates(["src", "dst", "relationship_name"])
    return out


def migrate_tables(
    tables: dict[str, DataFrame], specs=TPCH_FK_SPECS, declared_unique: frozenset[str] = frozenset()
) -> tuple[DataFrame, DataFrame]:
    """Full S4 migration: (nodes, edges).

    nodes = TableType per table + TableRow per row (+ is_part_of edges in edges).

    ``declared_unique``: tables whose PRIMARY KEY the source DECLARES unique
    (a real relational source does — the reference migrates FROM a SQL
    database whose schema it introspects, migrate_relational_database.py:18-39).
    Trusting the declaration elides that table's PK-uniqueness shuffle and its
    FK-edge dedup shuffles, exactly like a warehouse RELY constraint.  Results
    are identical whenever the declaration is true; declare nothing for
    untrusted input.  (The driver's lineitem violates its own composite PK —
    600k rows, 457k distinct (l_orderkey, l_linenumber) at sf0.1 — so a
    blanket "trust everything" is observably wrong on this very dataset; the
    per-table form exists because constraint elision MUST be opt-in per
    declared constraint, never a global assumption.)
    """
    spark = next(iter(tables.values())).sparkSession
    table_names = sorted({s[0] for s in specs} | {s[2] for s in specs})

    type_nodes = spark.createDataFrame(
        [(f"table:{t}", t, "TableType") for t in table_names], ["id", "name", "type"]
    )

    # One shuffle per non-declared child table, not one per FK branch: group
    # by the PK once and collect the distinct FK values of EVERY outgoing FK
    # as sets in the same aggregation.  distinct(pk, fk) == explode of
    # collect_set(fk) per pk, so each branch is a map-only explode of the
    # shared grouped frame (same Exchange reused across branches within a
    # job); the PK set for row nodes is the grouped keys themselves.  For
    # lineitem this turns 4 shuffles of the 600k-row key set (pk dedup + 3
    # FK-pair dedups) into 1.
    fks_by_child: dict[str, list[tuple[str, str]]] = {}
    for child, fk, parent, _pkey in specs:
        fks_by_child.setdefault(child, []).append((fk, parent))

    grouped: dict[str, DataFrame] = {}
    for t in table_names:
        if t in declared_unique or t not in fks_by_child:
            continue
        pk = TPCH_PKS[t]
        nonpk = sorted({fk for fk, _ in fks_by_child[t] if fk not in pk})
        # deferred checkpoint: the grouped frame feeds BOTH the nodes output
        # (pk set) and every FK-edge branch, and those materialize in separate
        # jobs — without it the child-table shuffle re-runs per job.  The
        # checkpoint holds one row per pk with small FK sets (≪ the table),
        # and write-once-read-twice beats scan+shuffle-twice at any scale.
        grouped[t] = (
            tables[t]
            .groupBy(*pk)
            .agg(*[F.collect_set(fk).alias(f"__set_{fk}") for fk in nonpk])
            .localCheckpoint(eager=False)
        )

    # project to the PK columns BEFORE the uniqueness shuffle: dropDuplicates
    # on the full-width table would shuffle every column of every row just to
    # discard them; the narrow form moves only the key bytes
    pk_sets = {}
    for t in table_names:
        if t in grouped:
            pk_sets[t] = grouped[t].select(*TPCH_PKS[t])
        elif t in declared_unique:
            pk_sets[t] = tables[t].select(*TPCH_PKS[t])
        else:
            pk_sets[t] = tables[t].select(*TPCH_PKS[t]).dropDuplicates()
    rn = [row_nodes(pk_sets[t], t, TPCH_PKS[t]) for t in table_names]
    nodes = type_nodes
    for r in rn:
        nodes = nodes.unionByName(r)

    # membership edges are a pure projection of the row nodes (the node id IS
    # the edge src, the table name names the dst) — deriving them from `nodes`
    # instead of pk_sets means the per-table PK dedup shuffles run ONCE in the
    # nodes lineage (which callers cache), not again for the edges side
    membership = nodes.filter(F.col("type") == "TableRow").select(
        F.col("id").alias("src"),
        F.concat(F.lit("table:"), F.col("name")).alias("dst"),
        F.lit("is_part_of").alias("relationship_name"),
    )

    edge_parts = []
    for child, fk, parent, _pkey in specs:
        pk = TPCH_PKS[child]
        if child in grouped:
            g = grouped[child]
            if fk in pk:
                # the FK is part of the PK — the grouped keys already carry it
                src_df = g
            else:
                src_df = g.select(*pk, F.explode(f"__set_{fk}").alias(fk))
        else:
            narrow = tables[child].select(*list(dict.fromkeys([*pk, fk])))
            src_df = narrow if child in declared_unique else narrow.dropDuplicates()
        edge_parts.append(
            src_df.select(
                node_id(child, *pk).alias("src"),
                node_id(parent, F.col(fk)).alias("dst"),
                F.lit(fk).alias("relationship_name"),
            )
        )
    edges = edge_parts[0]
    for p in edge_parts[1:]:
        edges = edges.unionByName(p)
    edges = edges.unionByName(membership)
    return nodes, edges


def migrate_schema_only(spark: SparkSession, specs=TPCH_FK_SPECS) -> tuple[DataFrame, DataFrame]:
    """S5 — schema-only ingestion: one TableType node per table and one edge
    per FK RELATIONSHIP between tables (no row nodes).

    Reference: migrate_relational_database.py:77-139 /
    tasks/schema/ingest_database_schema.py — the schema graph alone supports
    "what references what" queries before any data lands.
    """
    tables = sorted({s[0] for s in specs} | {s[2] for s in specs})
    nodes = spark.createDataFrame(
        [(f"table:{t}", t, "TableType") for t in tables], ["id", "name", "type"]
    )
    edges = spark.createDataFrame(
        [(f"table:{child}", f"table:{parent}", fk) for child, fk, parent, _ in specs],
        ["src", "dst", "relationship_name"],
    ).dropDuplicates(["src", "dst", "relationship_name"])
    return nodes, edges


def column_value_graph(
    tables: dict[str, DataFrame], columns: dict[str, tuple[str, ...]]
) -> tuple[DataFrame, DataFrame]:
    """Optional S4 detail: ``ColumnValue`` nodes per distinct (table, column,
    value) plus ``has_value`` edges from each row node.

    Reference: migrate_relational_database.py full ingestion creates
    ColumnValue nodes so categorical values become first-class graph citizens.
    Pure projections again — the value itself names the target node, no join.
    """
    nodes_parts, edges_parts = [], []
    for table, cols in sorted(columns.items()):
        df = tables[table]
        for col in cols:
            cv_id = F.concat_ws(":", F.lit(f"colval:{table}.{col}"), F.col(col).cast("string"))
            nodes_parts.append(
                df.select(
                    cv_id.alias("id"),
                    F.col(col).cast("string").alias("name"),
                    F.lit("ColumnValue").alias("type"),
                ).dropDuplicates(["id"])
            )
            edges_parts.append(
                df.select(
                    node_id(table, *TPCH_PKS[table]).alias("src"),
                    cv_id.alias("dst"),
                    F.lit(f"has_{col}").alias("relationship_name"),
                ).dropDuplicates(["src", "dst", "relationship_name"])
            )
    nodes = nodes_parts[0]
    for p in nodes_parts[1:]:
        nodes = nodes.unionByName(p)
    edges = edges_parts[0]
    for p in edges_parts[1:]:
        edges = edges.unionByName(p)
    return nodes, edges


def tpch_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Convenience: read the driver tables and migrate to (nodes, edges).

    Single-column PKs in the driver's parquet are genuinely unique (verified:
    orders/customer/part/supplier/nation/region), so those tables skip the
    uniqueness shuffle; lineitem's composite (l_orderkey, l_linenumber) is NOT
    unique in this data and keeps its dedup.
    """
    from cognee_graphdb_spark.schemas import load_testdata

    tables = load_testdata(
        spark, sf_dir, tables=("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    )
    return migrate_tables(
        tables,
        declared_unique=frozenset({"region", "nation", "customer", "supplier", "part", "orders"}),
    )
