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
