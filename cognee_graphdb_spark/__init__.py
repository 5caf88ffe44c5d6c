"""cognee_graphdb_spark — a PySpark-native re-implementation of the query and
data-processing semantics of the reference GraphRAG engine (Aleksis99/cognee_graphdb).

The reference is an ECL (Extract -> Cognify -> Load) pipeline that turns documents
into a typed property graph + vector collections, queried by ~16 "search types"
(see /root/reference/cognee/modules/search/types/SearchType.py). This package
re-expresses every deterministic operator in that engine as declarative Spark
DataFrame plans (Catalyst-optimized, whole-stage-codegen friendly), and isolates
every LLM/embedding call behind a pluggable, mockable gateway exactly as the
reference isolates them in LLMGateway.

Layout
------
- ``session``    SparkSession factory tuned for the scale target.
- ``ids``        deterministic content-addressed ids (reference: uuid5; here md5/sha2
                 so DuckDB oracles can reproduce them bit-for-bit).
- ``schemas``    canonical nodes/edges/embeddings/... schemas (SURVEY.md §1).
- ``functions``  scalar expression library (vector math, text, temporal).
- ``operators``  the operator inventory of SURVEY.md §2 (scans, filters, vector
                 search, graph joins, aggregations, windows, set ops, dedup,
                 text analysis, similarity search, multimodal plumbing).
- ``sources``    ingest / classification / relational->graph migration / sinks.
- ``llm``        LLMGateway protocol + deterministic mock, hash embedder.
- ``plans``      composed query plans: the 16 search types, triplet search.
- ``streaming``  Structured Streaming ingest + incremental-load semantics.
"""

__version__ = "0.1.0"

__all__ = ["__version__"]
