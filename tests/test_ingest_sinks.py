"""Ingest (S1-S3), sinks (S6/S7/S9), incremental (ST2), feedback, streaming
(ST1), ontology (U12), multimodal plumbing — lifecycle tests."""

import json
import os

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.sources.ingest import PipelineRuns, classify_documents, ingest_texts
from cognee_graphdb_spark.sources.sinks import GraphStore, flatten_edge_weights


def test_classify_documents(spark):
    df = spark.createDataFrame(
        [("a.txt",), ("b.pdf",), ("c.mp3",), ("d.png",), ("noext",)], ["name"]
    )
    out = {r["name"]: r["document_type"] for r in classify_documents(df).collect()}
    assert out == {
        "a.txt": "TextDocument",
        "b.pdf": "PdfDocument",
        "c.mp3": "AudioDocument",
        "d.png": "ImageDocument",
        "noext": "TextDocument",
    }


def test_ingest_dedup_by_content_hash(spark):
    items = [("a.txt", "same content"), ("b.txt", "same content"), ("c.txt", "other content")]
    out = ingest_texts(spark, items)
    assert out.count() == 2  # duplicate content collapses (ingest_data.py:93-96)
    again = ingest_texts(spark, items)
    assert {r["id"] for r in out.collect()} == {r["id"] for r in again.collect()}  # deterministic ids


def test_graph_store_upsert_and_ledger(spark, tmp_path):
    store = GraphStore(spark, str(tmp_path / "store"))
    n1 = spark.createDataFrame([("a", "A", "T"), ("b", "B", "T")], ["id", "name", "type"])
    store.upsert_nodes(n1)
    # update a + insert c — MERGE semantics
    n2 = spark.createDataFrame([("a", "A2", "T"), ("c", "C", "T")], ["id", "name", "type"])
    store.upsert_nodes(n2)
    got = {r["id"]: r["name"] for r in store.load("nodes").collect()}
    assert got == {"a": "A2", "b": "B", "c": "C"}
    ops = {r["op"] for r in store.ledger().collect()}
    assert ops == {"upsert_nodes"}
    assert store.ledger().count() == 4  # 2 + 2 audited rows


@pytest.mark.parametrize("scheme", ["bare", "file"])
def test_store_lifecycle_scheme_generic(spark, tmp_path, scheme):
    """S8: the whole store root works through the Hadoop FileSystem API — the
    file:// URI run proves the metadata path is scheme-generic (the same code
    path an s3a:// root takes; reference pushes graph files to S3,
    kuzu/adapter.py:167-187)."""
    from cognee_graphdb_spark.sources.permissions import PermissionStore

    local = str(tmp_path / "store")
    root = local if scheme == "bare" else f"file://{local}"
    store = GraphStore(spark, root)
    n1 = spark.createDataFrame([("a", "A", "T")], ["id", "name", "type"])
    store.upsert_nodes(n1)
    store.upsert_nodes(spark.createDataFrame([("a", "A2", "T"), ("b", "B", "T")], ["id", "name", "type"]))
    got = {r["id"]: r["name"] for r in store.load("nodes").collect()}
    assert got == {"a": "A2", "b": "B"}
    assert store.ledger().count() == 3
    store.vacuum()  # non-current snapshot reaped, current still readable
    assert store.load("nodes").count() == 2

    pr = PipelineRuns(spark, root)
    pr.log("ds1", "cognify", "COMPLETED")
    assert not pr.should_run("ds1", "cognify")
    data = ingest_texts(spark, [("a.txt", "alpha"), ("b.txt", "beta")])
    pr.mark_processed(data)
    assert pr.unprocessed(data).count() == 0
    hashes = [r["content_hash"] for r in data.collect()]
    pr.unmark_processed(hashes[:1])
    assert pr.unprocessed(data).count() == 1

    perms = PermissionStore(spark, root)
    perms.give_permission("u1", "ds1", "read")
    assert perms.has_permission("u1", "ds1", "read")
    perms.revoke_permission("u1", "ds1", "read")
    assert not perms.has_permission("u1", "ds1", "read")

    store.prune()
    assert store.load("nodes") is None


def test_add_cognify_search_roundtrip_no_duplicates(spark, tmp_path):
    """The reference's test_deduplication invariant: add -> cognify twice ->
    no duplicate nodes (content-addressed ids + MERGE upsert)."""
    from cognee_graphdb_spark.plans.cognify import cognify_documents

    store = GraphStore(spark, str(tmp_path / "store2"))
    docs = ingest_texts(spark, [("a.txt", "Apache Spark processes data. Spark scales out.")])
    for _ in range(2):
        res = cognify_documents(docs.select(F.col("id").alias("doc_id"), "text"))
        store.upsert_nodes(res.nodes)
        store.upsert_edges(res.edges)
        store.upsert_embeddings(res.embeddings)
    nodes = store.load("nodes")
    assert nodes.count() == nodes.select("id").distinct().count()
    edges = store.load("edges")
    assert edges.count() == edges.select("src", "dst", "relationship_name").distinct().count()
    # and the second run added nothing new
    assert store.load("embeddings").count() == store.load("embeddings").select("collection", "id").distinct().count()


def test_incremental_pipeline_runs(spark, tmp_path):
    pr = PipelineRuns(spark, str(tmp_path / "runs"))
    assert pr.should_run("ds1", "cognify")
    pr.log("ds1", "cognify", "STARTED")
    assert not pr.should_run("ds1", "cognify")
    pr.log("ds1", "cognify", "COMPLETED")
    assert not pr.should_run("ds1", "cognify")
    assert pr.should_run("ds1", "cognify", incremental=False)

    data = ingest_texts(spark, [("a.txt", "alpha"), ("b.txt", "beta")])
    pr.mark_processed(data)
    more = ingest_texts(spark, [("a.txt", "alpha"), ("c.txt", "gamma")])
    fresh = pr.unprocessed(more)
    assert [r["name"] for r in fresh.collect()] == ["c.txt"]


def test_feedback_roundtrip(spark, tmp_path):
    from cognee_graphdb_spark.plans.feedback import add_feedback, last_k_interactions, save_interaction

    store = GraphStore(spark, str(tmp_path / "fb"))
    t_old = spark.createDataFrame([("n1", "n2", "rel")], ["src", "dst", "relationship_name"])
    t_new = spark.createDataFrame([("n3", "n4", "rel")], ["src", "dst", "relationship_name"])
    iid = save_interaction(store, spark, "what is spark?", "an engine", t_old, created_at=100)
    save_interaction(store, spark, "newer question", "newer answer", t_new, created_at=200)
    last = [r["id"] for r in last_k_interactions(store, 1).collect()]
    assert len(last) == 1 and last[0] != iid  # newest first (W4)

    out = add_feedback(store, spark, "this was a great helpful correct answer", last_k=1)
    assert out["score"] == 3
    edges = store.load("edges")
    fb_edges = edges.filter(F.col("relationship_name") == "gives_feedback_to")
    assert fb_edges.count() == 1
    # only the NEWEST interaction's elements (n3, n4) get weighted — last_k=1
    weighted = edges.filter(F.col("properties")["feedback_weight"].isNotNull())
    assert {r["dst"] for r in weighted.collect()} == {"n3", "n4"}
    assert {float(r["properties"]["feedback_weight"]) for r in weighted.collect()} == {3.0}


def test_flatten_edge_weights(spark):
    df = spark.createDataFrame(
        [("a", "b", "r", 0.5, {"trust": 0.9})],
        "src string, dst string, relationship_name string, weight double, weights map<string,double>",
    )
    out = flatten_edge_weights(df).collect()[0]
    assert out["properties"]["weight"] == "0.5"
    assert out["properties"]["weight_trust"] == "0.9"


def test_streaming_cognify(spark, tmp_path):
    from cognee_graphdb_spark.streaming.pipeline import cognify_stream

    src = tmp_path / "stream_src"
    src.mkdir()
    store = GraphStore(spark, str(tmp_path / "stream_store"))
    with open(src / "batch1.json", "w") as f:
        f.write(json.dumps({"doc_id": "1", "text": "Spark streams data. Streams are incremental."}) + "\n")
        f.write(json.dumps({"doc_id": "2", "text": "DuckDB scans parquet files quickly."}) + "\n")
    q = cognify_stream(spark, str(src), store, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    nodes1 = store.load("nodes").count()
    assert nodes1 > 0
    # second file with one duplicate doc -> idempotent upsert, only new content adds nodes
    with open(src / "batch2.json", "w") as f:
        f.write(json.dumps({"doc_id": "1", "text": "Spark streams data. Streams are incremental."}) + "\n")
    q2 = cognify_stream(spark, str(src), store, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert store.load("nodes").count() == nodes1
    nodes = store.load("nodes")
    assert nodes.count() == nodes.select("id").distinct().count()


def test_ontology_resolution(spark):
    from cognee_graphdb_spark.sources.ontology import OntologyResolver

    r = OntologyResolver(
        individuals={"Apache Spark": "Engine", "DuckDB": "Database"},
        subclasses={"Engine": "Software", "Database": "Software"},
    )
    ents = spark.createDataFrame(
        [("apache_spark",), ("apache_spark_engine",), ("unknown_thing",)], ["name"]
    )
    out = {r2["name"]: (r2["ontology_class"], r2["ontology_valid"]) for r2 in r.resolve_entities(ents).collect()}
    assert out["apache_spark"] == ("Engine", True)  # exact normalized match
    assert out["apache_spark_engine"] == ("Engine", True)  # prefix fuzzy match
    assert out["unknown_thing"] == (None, False)
    nodes, edges = r.class_edges(spark)
    assert nodes.count() == 3
    assert edges.count() == 2


def test_multimodal_plumbing(spark):
    from cognee_graphdb_spark.operators.multimodal import extract_features, frame_sample_plan, resize_plan

    media = spark.createDataFrame(
        [
            ("m1", "image", bytearray(b"imgbytes"), "image/png", 1024, 768, None),
            ("m2", "video", bytearray(b"vidbytes"), "video/mp4", 1920, 1080, 3500),
        ],
        "media_id string, kind string, content binary, mime_type string, width int, height int, duration_ms long",
    )
    feats = {r["media_id"]: r["features"] for r in extract_features(media, dim=8).collect()}
    assert len(feats["m1"]) == 8
    again = {r["media_id"]: r["features"] for r in extract_features(media, dim=8).collect()}
    assert feats == again  # deterministic fake decode
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_offset_ms"] for r in frames] == [0, 1000, 2000, 3000]
    rs = {r["media_id"]: (r["target_width"], r["target_height"]) for r in resize_plan(media, 512).collect()}
    assert rs["m1"] == (512, 384)
    with pytest.raises(Exception):
        extract_features(media, dim=8, deterministic_fake=False).collect()


def test_compaction_and_table_stats(spark, tmp_path):
    """compact() rewrites many-small-file snapshots into few files with the
    same rows (MVCC: new version + pointer flip), table_stats() reports the
    maintenance inputs, and the append-only ledger compacts in place."""
    store = GraphStore(spark, str(tmp_path / "store"))
    # 5 incremental upserts, each a shuffle-wide version + a ledger append
    for i in range(5):
        nodes = spark.createDataFrame(
            [(f"n{i}-{j}", f"name{j}", "T", None) for j in range(20)],
            "id string, name string, type string, properties map<string,string>",
        ).repartition(8)
        store.upsert_nodes(nodes)

    # force a many-small-file current version (AQE coalesces the merge
    # output on tiny data, so build the fragmentation explicitly — exactly
    # what N wide incremental writes produce at real scale)
    store._swap_write("nodes", store.load("nodes").repartition(8))

    before = store.table_stats()
    assert before["nodes"]["files"] == 8
    assert before["nodes"]["versions"] == 6
    assert before["ledger"]["files"] >= 5
    rows_before = sorted(r["id"] for r in store.load("nodes").collect())
    ledger_before = store.ledger().count()

    result = store.compact()
    store.vacuum()
    after = store.table_stats()
    # one ~tiny table -> a single data file, one surviving version
    assert after["nodes"]["files"] == 1
    assert after["nodes"]["versions"] == 1
    assert after["ledger"]["files"] < before["ledger"]["files"]
    assert result["nodes"] <= 2

    # byte-identical content after the rewrite
    assert sorted(r["id"] for r in store.load("nodes").collect()) == rows_before
    assert store.ledger().count() == ledger_before

    # idempotent: a second compact is a no-op (already at target)
    again = store.compact()
    assert again.get("nodes", 0) == after["nodes"]["files"]


def test_engine_maintain(spark, tmp_path):
    from cognee_graphdb_spark.api import CogneeSpark

    e = CogneeSpark(spark, str(tmp_path / "m"))
    e.add([("a.txt", "alpha beta gamma. delta epsilon."), ("b.txt", "zeta eta theta.")])
    assert e.cognify() == 2
    chunks_before = e.search("CHUNKS", "alpha").count()
    rep = e.maintain()
    assert set(rep) == {"before", "compacted", "after"}
    for t, st in rep["after"].items():
        assert st["versions"] <= 1, t
    # search still works over the compacted store
    assert e.search("CHUNKS", "alpha").count() == chunks_before


def test_snapshot_files_are_key_sorted(spark, tmp_path):
    """_swap_write sorts by merge key within partitions, so every data file's
    row-group min/max stats are disjoint — the data-skipping property point
    lookups rely on (verified per-file via the parquet footers)."""
    import pyarrow.parquet as pq

    store = GraphStore(spark, str(tmp_path / "store"))
    nodes = spark.createDataFrame(
        [(f"n{i:04d}", f"name{i}", "T", None) for i in range(500)],
        "id string, name string, type string, properties map<string,string>",
    ).repartition(4)
    store.upsert_nodes(nodes)

    current = store.backend.current_version("nodes")
    files = [
        os.path.join(current, f)
        for f in os.listdir(current)
        if f.endswith(".parquet")
    ]
    assert files
    for f in files:
        ids = pq.read_table(f, columns=["id"]).column("id").to_pylist()
        assert ids == sorted(ids), f


def test_ledger_compaction_crash_recovery(spark, tmp_path):
    """The ledger swap never deletes the directory holding the _LOCK lease,
    and an interrupted swap recovers from the staged snapshot: completed
    staging (has _SUCCESS) finishes the swap, incomplete staging is
    discarded."""
    store = GraphStore(spark, str(tmp_path / "store"))
    for i in range(3):
        store.upsert_nodes(
            spark.createDataFrame([(f"n{i}", "N", "T")], ["id", "name", "type"])
        )
    total = store.ledger().count()
    ledger_path = os.path.join(str(tmp_path / "store"), "ledger")
    staged = ledger_path + ".compacting"

    # simulate a crash AFTER staging completed and old files were deleted
    store.ledger().coalesce(1).write.mode("overwrite").parquet(staged)
    for f in os.listdir(ledger_path):
        if not f.startswith(("_", ".")):
            os.remove(os.path.join(ledger_path, f))
    assert store.ledger() is None or store.ledger().count() == 0
    store.compact()
    assert store.ledger().count() == total
    assert not os.path.exists(staged)

    # incomplete staging (no _SUCCESS) is discarded, ledger untouched
    os.makedirs(staged)
    with open(os.path.join(staged, "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    store.compact()
    assert not os.path.exists(staged)
    assert store.ledger().count() == total

    # the lease file's directory survived every swap: appends still serialize
    store.upsert_nodes(spark.createDataFrame([("n9", "N", "T")], ["id", "name", "type"]))
    assert store.ledger().count() == total + 1


def test_ontology_from_rdf_xml(tmp_path):
    """Real .owl file-parse path (U12, reference RDFLibOntologyResolver
    build_lookup): owl:Class + rdf:type attribute form, typed-node form,
    rdf:ID form, nested subClassOf element form, and multiple-type /
    multiple-parent determinism (lexicographically first wins)."""
    from cognee_graphdb_spark.sources.ontology import OntologyResolver

    owl = tmp_path / "onto.owl"
    owl.write_text("""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:ex="http://example.org/zoo#">
  <owl:Class rdf:about="http://example.org/zoo#Animal"/>
  <owl:Class rdf:ID="Mammal">
    <rdfs:subClassOf rdf:resource="http://example.org/zoo#Animal"/>
  </owl:Class>
  <owl:Class rdf:about="http://example.org/zoo#Pet">
    <rdfs:subClassOf>
      <owl:Class rdf:about="http://example.org/zoo#Animal"/>
    </rdfs:subClassOf>
  </owl:Class>
  <owl:NamedIndividual rdf:about="http://example.org/zoo#Rex">
    <rdf:type rdf:resource="http://example.org/zoo#Pet"/>
    <rdf:type rdf:resource="http://example.org/zoo#Mammal"/>
  </owl:NamedIndividual>
  <ex:Mammal rdf:about="http://example.org/zoo#Whale Shark"/>
  <owl:NamedIndividual rdf:about="http://example.org/zoo#Ghost">
    <rdf:type rdf:resource="http://example.org/zoo#NotAClass"/>
  </owl:NamedIndividual>
</rdf:RDF>
""")
    r = OntologyResolver.from_rdf_xml(str(owl))
    # Rex has two types -> lexicographically first class key wins
    assert r.individuals == {"rex": "mammal", "whale_shark": "mammal"}
    assert r.subclasses == {"mammal": "animal", "pet": "animal"}
    # empty ontology parses to empty dicts
    empty = tmp_path / "empty.owl"
    empty.write_text("""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"/>
""")
    e = OntologyResolver.from_rdf_xml(str(empty))
    assert e.individuals == {} and e.subclasses == {}
