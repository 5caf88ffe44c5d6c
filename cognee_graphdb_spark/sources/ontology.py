"""U12 — ontology resolution (deterministic, not LLM).

Reference: cognee/modules/ontology/rdf_xml/RDFLibOntologyResolver.py loads an
RDF/OWL ontology and fuzzy-matches extracted entity/class names onto ontology
individuals/classes; matches add canonical nodes + subclass edges during
cognify (expand_with_nodes_and_edges.py:30-120).

The loader accepts a plain dict form
{"individuals": {name: class}, "subclasses": {cls: parent}} and parses real
RDF/XML (.owl) files via :meth:`OntologyResolver.from_rdf_xml` — rdflib when
installed (any serialization), else a stdlib ``xml.etree`` walk (RDF/XML is
plain XML).  The matching itself — normalized-name exact match, then prefix
fuzzy match — is the deterministic semantics the reference implements, here
as broadcast-join expressions.
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


def _uri_key(uri: str) -> str:
    """Reference ``_uri_to_key`` (RDFLibOntologyResolver.py:50-56): URI
    fragment after '#', else last path segment; lowercased, spaces -> _."""
    name = uri.split("#")[-1] if "#" in uri else uri.rstrip("/").split("/")[-1]
    return name.lower().replace(" ", "_").strip()


@dataclass
class OntologyResolver:
    """individuals: name -> class; subclasses: class -> parent class."""

    individuals: dict[str, str] = field(default_factory=dict)
    subclasses: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_rdf_xml(cls, path: str) -> "OntologyResolver":
        """Parse an RDF/XML (.owl) ontology file into the dict form.

        Mirrors RDFLibOntologyResolver.build_lookup (reference
        RDFLibOntologyResolver.py:59-92): classes are the subjects typed
        ``owl:Class``, individuals are any subject whose ``rdf:type`` points
        at a known class, and keys are the URI fragment (after ``#``, else
        the last path segment) lowercased with spaces as underscores
        (``_uri_to_key``, :50-56).  ``rdfs:subClassOf`` feeds the subclass
        map the same way (get_subgraph's is_a walk, :158-164).

        rdflib, when installed, is the fast path (it also handles non-XML
        serializations); RDF/XML itself is plain XML, so the portable path
        is a stdlib ``xml.etree`` walk that understands both attribute
        (``rdf:resource``) and typed-node / nested-element forms.  Where the
        RDF graph records several types or superclasses for one subject the
        dict form keeps the lexicographically first — deterministic at any
        parse order.
        """
        try:
            import rdflib
        except ImportError:
            return cls._from_rdf_xml_stdlib(path)

        g = rdflib.Graph()
        g.parse(path)
        OWL = rdflib.OWL
        RDF = rdflib.RDF
        RDFS = rdflib.RDFS
        key = _uri_key
        classes = {key(str(s)) for s in g.subjects(RDF.type, OWL.Class)}
        individuals: dict[str, str] = {}
        for s, o in g.subject_objects(RDF.type):
            ks, ko = key(str(s)), key(str(o))
            if ko in classes and (ks not in individuals or ko < individuals[ks]):
                individuals[ks] = ko
        subclasses: dict[str, str] = {}
        for s, o in g.subject_objects(RDFS.subClassOf):
            ks, ko = key(str(s)), key(str(o))
            if ks not in subclasses or ko < subclasses[ks]:
                subclasses[ks] = ko
        return cls(individuals=individuals, subclasses=subclasses)

    @classmethod
    def _from_rdf_xml_stdlib(cls, path: str) -> "OntologyResolver":
        """rdflib-free RDF/XML parse — see :meth:`from_rdf_xml`."""
        import xml.etree.ElementTree as ET

        RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
        RDFS = "{http://www.w3.org/2000/01/rdf-schema#}"
        OWL = "{http://www.w3.org/2002/07/owl#}"
        SYNTAX_TAGS = {
            RDF + "Description", RDF + "RDF",
            OWL + "Class", OWL + "NamedIndividual", OWL + "Thing",
            OWL + "Ontology", OWL + "ObjectProperty", OWL + "DatatypeProperty",
            OWL + "AnnotationProperty", RDFS + "Class",
        }

        def subject_uri(el):
            return el.get(RDF + "about") or (
                "#" + el.get(RDF + "ID") if el.get(RDF + "ID") else None
            )

        def object_uri(el):
            # <rdf:type rdf:resource="..."/> or nested <owl:Class rdf:about=...>
            res = el.get(RDF + "resource")
            if res is not None:
                return res
            for child in el:
                nested = subject_uri(child)
                if nested is not None:
                    return nested
            return None

        root = ET.parse(path).getroot()
        # pass 1: (subject, type-uri) and (subject, superclass-uri) assertions
        types: list[tuple[str, str]] = []
        subclass_pairs: list[tuple[str, str]] = []
        class_uris: set[str] = set()
        for el in root.iter():
            subj = subject_uri(el)
            if subj is None:
                continue
            if el.tag == OWL + "Class" or el.tag == RDFS + "Class":
                class_uris.add(subj)
            elif el.tag not in SYNTAX_TAGS:
                types.append((subj, el.tag.rsplit("}", 1)[-1]))  # typed-node form
            for child in el:
                obj = object_uri(child)
                if obj is None:
                    continue
                if child.tag == RDF + "type":
                    if obj.endswith("#Class"):
                        class_uris.add(subj)
                    else:
                        types.append((subj, obj))
                elif child.tag == RDFS + "subClassOf":
                    subclass_pairs.append((subj, obj))
        classes = {_uri_key(u) for u in class_uris}
        individuals: dict[str, str] = {}
        for s, t in sorted((_uri_key(s), _uri_key(t)) for s, t in types):
            if t in classes and s not in individuals:
                individuals[s] = t
        subclasses: dict[str, str] = {}
        for s, p in sorted((_uri_key(s), _uri_key(p)) for s, p in subclass_pairs):
            if s not in subclasses:
                subclasses[s] = p
        return cls(individuals=individuals, subclasses=subclasses)

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
