"""Scalar expression library — every function here is a Catalyst Column
expression (JVM-side, whole-stage-codegen), never a Python UDF."""

from cognee_graphdb_spark.functions.vectors import (  # noqa: F401
    cosine_distance,
    cosine_similarity,
    dot,
    l2_norm,
    minmax_normalize,
)
from cognee_graphdb_spark.functions.text import (  # noqa: F401
    STOP_WORDS,
    filter_stopwords,
    tokenize,
)
from cognee_graphdb_spark.functions.temporal import date_to_int  # noqa: F401
