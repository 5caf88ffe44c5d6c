"""End-to-end corpus curation: each planted defect is removed by its stage."""

import pytest


@pytest.fixture(scope="module")
def planted_corpus(spark):
    body_a = "The quick brown fox jumps over the lazy dog every single day. " * 5
    body_b = (
        "Meanwhile the patient grey owl watches from a distant oak branch at dusk. " * 5
    )
    body_c = (
        "Sailors often describe the northern harbor lights as calm and steady beacons. " * 5
    )
    rows = [
        (0, body_a + "Document zero has its own unique closing sentence right here."),
        (1, body_b + "Document one differs in its own final unique sentence instead."),
        (2, body_a + "Document zero has its own unique closing sentence right here."),  # exact dup of 0
        (3, body_a + "Document zero has its own unique closing sentence right there."),  # near dup of 0
        (4, "tiny."),  # gopher: too few words
        (5, body_c + "This document leaks the secret benchmark answer phrase entirely."),  # contaminated
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_curate_corpus_each_stage_removes_its_plant(spark, planted_corpus):
    from cognee_graphdb_spark.operators.curation import curate_corpus

    ev = spark.createDataFrame(
        [(100, "leaks the secret benchmark answer phrase entirely")], ["doc_id", "text"]
    )
    res = curate_corpus(
        planted_corpus,
        eval_df=ev,
        use_c4=False,  # the corpus has no line structure
        minhash_threshold=0.5,
        n_shards=4,
    )
    kept = {r["doc_id"] for r in res.corpus.select("doc_id").collect()}
    assert "0" in kept and "1" in kept
    assert "2" not in kept  # exact dup dropped
    assert "3" not in kept  # near dup dropped
    assert "4" not in kept  # gopher
    assert "5" not in kept  # decontaminated
    # attrition report is monotone non-increasing
    counts = [n for _, n in res.report()]
    assert counts[0] == 6
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    # sharded output carries shard/pos
    assert {"shard", "pos"} <= set(res.corpus.columns)


def test_curate_corpus_stages_optional(spark, planted_corpus):
    from cognee_graphdb_spark.operators.curation import curate_corpus

    res = curate_corpus(planted_corpus, use_c4=False, use_gopher=False)
    names = [n for n, _ in res.stages]
    assert names == ["input", "exact_dedup", "minhash_dedup"]
    assert "shard" not in res.corpus.columns


def test_curate_corpus_c4_clean_text_feeds_downstream(spark):
    """C4 is line-LEVEL cleaning: downstream stages must see clean_text.
    Two docs that differ only by a blocklisted line become exact duplicates
    after cleaning — the dedup stage must catch them."""
    from cognee_graphdb_spark.operators.curation import curate_corpus

    good = (
        "The quick brown fox jumps over the lazy dog today.\n"
        "A second perfectly ordinary sentence sits right here now.\n"
        "The third sentence completes the minimum line requirement nicely."
    )
    rows = [
        (0, good + "\nPlease enable javascript and accept our cookie banner now."),
        (1, good),
    ]
    res = curate_corpus(
        spark.createDataFrame(rows, ["doc_id", "text"]), use_gopher=False
    )
    kept = res.corpus.collect()
    # exact dedup on the CLEANED text collapses the pair to the min doc_id,
    # and the surviving row carries the cleaned text (junk line gone)
    assert [r["doc_id"] for r in kept] == ["0"]
    assert "javascript" not in kept[0]["text"]
    assert kept[0]["text"] == good


def test_curate_corpus_neardup_keeps_one_per_cluster(spark, planted_corpus):
    """Near-dup removal elects one keeper per connected component
    (dedup_clusters), matching the engine's cluster-collapse semantics."""
    from cognee_graphdb_spark.operators.curation import curate_corpus
    from cognee_graphdb_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs

    res = curate_corpus(planted_corpus, use_c4=False, use_gopher=False, minhash_threshold=0.5)
    kept = {r["doc_id"] for r in res.corpus.collect()}

    # recompute the expected election from the post-exact-dedup corpus
    after_exact = dict(res.stages)["exact_dedup"]
    pairs = minhash_lsh_pairs(after_exact, threshold=0.5)
    clusters = {r["id"]: r["keeper_id"] for r in dedup_clusters(after_exact, pairs).collect()}
    survivors = {r["doc_id"] for r in after_exact.select("doc_id").collect()}
    expected = {d for d in survivors if clusters.get(d, d) == d}
    assert kept == expected
    # and the planted near-dup chain 0~3 kept exactly its min-id representative
    assert "0" in kept and "3" not in kept
