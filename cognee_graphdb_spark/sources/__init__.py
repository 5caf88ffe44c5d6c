from cognee_graphdb_spark.sources.migration import (  # noqa: F401
    TPCH_FK_SPECS,
    fk_edges,
    migrate_tables,
    tpch_graph,
)
