from cognee_graphdb_spark.plans.cognify import cognify_documents  # noqa: F401
from cognee_graphdb_spark.plans.triplet_search import brute_force_triplet_search  # noqa: F401
