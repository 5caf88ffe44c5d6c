"""Dedup operator tests: exact, Jaccard, MinHash recall pin, SimHash,
embedding near-dup (incl. the dim-mismatch regression from round 1)."""

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(spark):
    df = _docs(spark, [(1, "same text"), (2, "same text"), (3, "other"), (4, "same text")])
    out = dedup.exact_duplicates(df).collect()
    assert len(out) == 1
    assert out[0]["dup_count"] == 3
    assert out[0]["keeper_id"] == 1


def test_jaccard_pairs(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")])
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.jaccard_pairs(df, threshold=0.5).collect()}
    assert out == {(1, 2): 0.6}  # |{a,b,c}| / |{a,b,c,d,e}|


def test_jaccard_max_df_caps_hot_tokens(spark):
    # 'common' occurs in every doc; with max_df=2 it is dropped from the index
    df = _docs(spark, [(1, "common a b"), (2, "common a b"), (3, "common x y"), (4, "common z w")])
    out = {(r["id_a"], r["id_b"]) for r in dedup.jaccard_pairs(df, threshold=0.9, max_df=2).collect()}
    assert out == {(1, 2)}


def test_minhash_recall_at_half_jaccard(spark):
    # two docs sharing ~half their shingles MUST be caught by the tuned
    # defaults (32 hashes x 16 bands: P[candidate] = 1-(1-J^2)^16 ~ 0.99)
    base = [f"w{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:20] + [f"v{i}" for i in range(20)])
    df = _docs(spark, [(1, a), (2, b), (3, " ".join(f"q{i}" for i in range(40)))])
    pairs = dedup.minhash_lsh_pairs(df, threshold=0.25).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found
    assert not any(3 in p for p in found)


def test_dedup_clusters_transitive_keeper(spark):
    # a~b, b~c (transitive cluster) + d~e + f alone
    docs = _docs(spark, [(i, f"t{i}") for i in [1, 2, 3, 4, 5, 6]])
    pairs = spark.createDataFrame(
        [("1", "2", 0.9), ("2", "3", 0.9), ("4", "5", 0.9)], ["id_a", "id_b", "jaccard"]
    )
    out = {r["id"]: r["keeper_id"] for r in dedup.dedup_clusters(docs, pairs).collect()}
    assert out == {"1": "1", "2": "1", "3": "1", "4": "4", "5": "4", "6": "6"}


def test_minhash_band_validation(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        dedup.minhash_lsh_pairs(df, num_hashes=32, bands=5)
    with pytest.raises(ValueError):
        dedup.minhash_lsh_pairs(df, num_hashes=4, bands=8)


def test_simhash_similar_texts_close(spark):
    df = _docs(
        spark,
        [
            (1, "spark query engine with fast joins and scans"),
            (2, "spark query engine with fast joins and scan"),
            (3, "completely different words entirely unrelated topic"),
        ],
    )
    out = {r["id"]: r["simhash"] for r in dedup.simhash(df).collect()}

    def hamming(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert hamming(out[1], out[2]) < hamming(out[1], out[3])


def test_embedding_near_duplicates_exact(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {(r["id_a"], r["id_b"]) for r in dedup.embedding_near_duplicates(df, threshold=0.95).collect()}
    assert out == {(1, 2)}


def test_embedding_lsh_dim_inferred(spark):
    # regression: round-1 bug silently hashed every non-64-dim vector to
    # bucket 0; with dim inference the 4-dim LSH path must still find the pair
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        (3, [-1.0, 0.02, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = dedup.embedding_near_duplicates(df, threshold=0.95, lsh_bits=2)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {(1, 2)}
    # and bucketing actually separates: opposite vectors land in distinct buckets
    from cognee_graphdb_spark.operators.similarity import hyperplane_bucket

    b = df.select(hyperplane_bucket(F.col("embedding"), 4, 4).alias("b")).collect()
    assert len({r["b"] for r in b}) > 1


def test_minhash_index_accumulates(spark, tmp_path):
    """The persisted registry grows with each update=True batch: batch 2
    matches docs from BOTH the initial build and batch 1 — the
    dedup-today-against-everything-seen workflow."""
    from cognee_graphdb_spark.operators.dedup import (
        minhash_index_build,
        minhash_index_dedup,
        minhash_lsh_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "idx")

    minhash_index_build(mk([(1, base), (2, "completely unrelated words about spark shuffles")]), path, num_hashes=16, bands=8)
    p1 = minhash_index_dedup(mk([(10, base + " extra")]), path, threshold=0.3)
    assert {(r["id_old"], r["id_new"]) for r in p1.collect()} == {(1, 10)}

    # batch 2 near-dups BATCH 1's doc (10), which only exists via the update
    p2 = minhash_index_dedup(mk([(20, base + " extra bit")]), path, threshold=0.3)
    olds = {r["id_old"] for r in p2.collect()}
    assert 10 in olds and 1 in olds

    # update=False leaves the registry unchanged
    p3 = minhash_index_dedup(mk([(30, base)]), path, threshold=0.3, update=False)
    assert {r["id_new"] for r in p3.collect()} == {30}
    p4 = minhash_index_dedup(mk([(40, base)]), path, threshold=0.3)
    assert 30 not in {r["id_old"] for r in p4.collect()}

    # parity with one big run: cross pairs equal the full-run pairs filtered
    # to (index side, batch side)
    docs = mk([(1, base), (2, "unrelated entirely different content here"), (11, base + " more")])
    full = minhash_lsh_pairs(docs, num_hashes=16, bands=8, threshold=0.3)
    idx2 = str(tmp_path / "idx2")
    minhash_index_build(docs.filter("doc_id < 10"), idx2, num_hashes=16, bands=8)
    inc = minhash_index_dedup(docs.filter("doc_id >= 10"), idx2, threshold=0.3, update=False)
    full_cross = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]), r["est_jaccard"])
        for r in full.collect()
        if (r["id_a"] < 10) != (r["id_b"] < 10)
    }
    inc_pairs = {(r["id_old"], r["id_new"], r["est_jaccard"]) for r in inc.collect()}
    assert inc_pairs == full_cross


def test_minhash_index_replayed_batch_does_not_grow_registry(spark, tmp_path):
    """At-least-once delivery: re-running the SAME update=True batch must
    leave the registry row counts unchanged (ids are registered at most
    once), and the pair output must stay identical across redeliveries."""
    from cognee_graphdb_spark.operators.dedup import minhash_index_build, minhash_index_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "idx")
    minhash_index_build(mk([(1, base)]), path, num_hashes=16, bands=8)

    batch = [(10, base + " extra"), (11, "totally unrelated shuffle partition text")]
    p1 = {(r["id_old"], r["id_new"]) for r in minhash_index_dedup(mk(batch), path, threshold=0.3).collect()}
    sig_n = spark.read.parquet(f"{path}/signatures").count()
    band_n = spark.read.parquet(f"{path}/bands").count()
    assert sig_n == 3  # 1 built + 2 appended, no duplicates

    # replay the identical batch: pairs re-reported, registry unchanged
    p2 = {(r["id_old"], r["id_new"]) for r in minhash_index_dedup(mk(batch), path, threshold=0.3).collect()}
    assert p1 == p2 == {(1, 10)}
    assert spark.read.parquet(f"{path}/signatures").count() == sig_n
    assert spark.read.parquet(f"{path}/bands").count() == band_n


def test_semdedup_drops_planted_near_duplicates(spark):
    """Three exact-duplicate groups planted among orthogonal-ish vectors:
    within each group exactly one survivor remains, and it is the lowest-id
    member (exact dups tie on centroid-sim, so the id breaks it); singleton
    vectors are all kept."""
    import numpy as np

    from cognee_graphdb_spark.operators.dedup import semdedup

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for g in range(3):  # duplicate groups of 3
        v = rng.randn(16).tolist()
        for _ in range(3):
            rows.append((vid, v))
            vid += 1
    for _ in range(20):  # background singletons
        rows.append((vid, rng.randn(16).tolist()))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["id"]: r for r in semdedup(emb, k=4, threshold=0.99, n_iter=2).collect()}
    for g in range(3):
        members = [str(3 * g), str(3 * g + 1), str(3 * g + 2)]
        kept = [m for m in members if out[m]["keep"]]
        assert kept == [members[0]]
        # exact duplicates always land in the same cluster
        assert len({out[m]["cluster"] for m in members}) == 1
    for i in range(9, vid):
        assert out[str(i)]["keep"]


def test_semdedup_deterministic_and_total(spark):
    """Same input twice -> identical (id, cluster, keep) rows; every input id
    appears exactly once."""
    from cognee_graphdb_spark.operators.dedup import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(map(tuple, semdedup(emb, k=4, threshold=0.35, n_iter=1).collect()))
    b = sorted(map(tuple, semdedup(emb, k=4, threshold=0.35, n_iter=1).collect()))
    assert a == b
    assert len(a) == emb.count()
    assert len({t[0] for t in a}) == len(a)


def test_fuzzy_name_matches_hand_computed(spark):
    """'red widget'~'red widgets' (1 edit), 'blue bolt'~'blue belt' (1),
    'red widget' vs 'blue bolt' never a candidate pair at distance 2;
    short names (< qgram) block on the whole string."""
    from pyspark.sql import functions as F

    from cognee_graphdb_spark.operators.dedup import fuzzy_name_matches

    df = spark.createDataFrame(
        [(1, "red widget"), (2, "red widgets"), (3, "blue bolt"),
         (4, "blue belt"), (5, "ab"), (6, "ab"), (7, "xy")],
        ["id", "name"],
    )
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in fuzzy_name_matches(df, max_distance=2, qgram=3).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(3, 4)] == 1
    assert got[(5, 6)] == 0  # short names match via whole-string block
    assert (1, 3) not in got and (5, 7) not in got
    # max_df drops a hot gram: with max_df=1 every shared gram is "hot",
    # so only pairs sharing a df<=1 gram survive — none do
    none = fuzzy_name_matches(df, max_distance=2, qgram=3, max_df=1).count()
    assert none == 0
    import pytest as _p

    with _p.raises(ValueError, match=">= 0"):
        fuzzy_name_matches(df, max_distance=-1)
