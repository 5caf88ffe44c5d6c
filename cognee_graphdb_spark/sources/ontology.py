"""U12 — ontology resolution (deterministic, not LLM).

Reference: cognee/modules/ontology/rdf_xml/RDFLibOntologyResolver.py loads an
RDF/OWL ontology and fuzzy-matches extracted entity/class names onto ontology
individuals/classes; matches add canonical nodes + subclass edges during
cognify (expand_with_nodes_and_edges.py:30-120).

rdflib is not in this container, so the loader accepts a plain dict form
{"individuals": {name: class}, "subclasses": {cls: parent}} (an RDF/XML
parser can be plugged behind ``try: import rdflib``); the matching itself —
normalized-name exact match, then prefix fuzzy match — is the deterministic
semantics the reference implements, here as broadcast-join expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cognee_graphdb_spark.ids import content_id, normalize_name


def _norm(s: str) -> str:
    import re

    return re.sub(r"[^a-z0-9]+", "_", s.strip().lower())


@dataclass
class OntologyResolver:
    """individuals: name -> class; subclasses: class -> parent class."""

    individuals: dict[str, str] = field(default_factory=dict)
    subclasses: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_rdf_xml(cls, path: str) -> "OntologyResolver":
        try:
            import rdflib  # noqa: F401
        except ImportError as e:  # pragma: no cover - rdflib absent in this container
            raise NotImplementedError(
                "rdflib is unavailable here; construct OntologyResolver from the dict form"
            ) from e
        raise NotImplementedError

    def normalized(self) -> dict[str, str]:
        return {_norm(k): v for k, v in self.individuals.items()}

    def resolve_entities(self, entities: DataFrame, name_col: str = "name") -> DataFrame:
        """Attach ontology_class (nullable) + ontology_valid to entity rows.

        Exact match on the normalized name wins; otherwise a prefix match
        (the resolver's fuzzy fallback) against the individual list."""
        mapping = self.normalized()
        spark = entities.sparkSession
        if not mapping:
            return entities.withColumn("ontology_class", F.lit(None).cast("string")).withColumn(
                "ontology_valid", F.lit(False)
            )
        onto = spark.createDataFrame(list(mapping.items()), ["onto_name", "ontology_class"])
        # resolve DISTINCT normalized names first (the match table stays tiny at
        # any corpus size), then broadcast the name->class map back onto the rows
        norms = entities.select(normalize_name(F.col(name_col)).alias("_norm")).distinct()
        exact = norms.join(
            F.broadcast(onto.withColumnRenamed("onto_name", "_norm")), "_norm", "left"
        )
        unmatched = exact.filter(F.col("ontology_class").isNull()).select("_norm")
        # prefix fallback: longest individual that prefixes the name wins
        fuzzy = (
            unmatched.join(F.broadcast(onto), F.col("_norm").startswith(F.col("onto_name")), "left")
            .withColumn(
                "_rank",
                F.row_number().over(
                    Window.partitionBy("_norm").orderBy(
                        F.length(F.col("onto_name")).desc(), F.col("onto_name").asc()
                    )
                ),
            )
            .filter(F.col("_rank") == 1)
            .select("_norm", "ontology_class")
        )
        match_map = exact.filter(F.col("ontology_class").isNotNull()).unionByName(fuzzy)
        out = entities.withColumn("_norm", normalize_name(F.col(name_col))).join(
            F.broadcast(match_map), "_norm", "left"
        )
        return out.withColumn("ontology_valid", F.col("ontology_class").isNotNull()).drop("_norm")

    def class_edges(self, spark) -> tuple[DataFrame, DataFrame]:
        """Ontology class nodes + is_subclass_of edges, mergeable into the graph."""
        classes = sorted(set(self.individuals.values()) | set(self.subclasses) | set(self.subclasses.values()))
        nodes = spark.createDataFrame([(c,) for c in classes], ["name"]).select(
            content_id(F.lit("OntologyClass"), "name").alias("id"),
            "name",
            F.lit("OntologyClass").alias("type"),
        )
        pairs = list(self.subclasses.items())
        if pairs:
            edges = spark.createDataFrame(pairs, ["child", "parent"]).select(
                content_id(F.lit("OntologyClass"), "child").alias("src"),
                content_id(F.lit("OntologyClass"), "parent").alias("dst"),
                F.lit("is_subclass_of").alias("relationship_name"),
            )
        else:
            edges = nodes.select(
                F.col("id").alias("src"), F.col("id").alias("dst"), F.lit("x").alias("relationship_name")
            ).limit(0)
        return nodes, edges
