from cognee_graphdb_spark.llm.gateway import LLMGateway, MockLLMGateway  # noqa: F401
from cognee_graphdb_spark.llm.embedder import HashEmbedder, embed_column  # noqa: F401
