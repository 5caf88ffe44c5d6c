"""Training-data pipeline operators: sampling, decontamination, PII
redaction, corpus stats, sequence packing (operators/training_data.py)."""

import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.training_data import (
    corpus_stats,
    hash_sample,
    ngram_decontaminate,
    pack_sequences,
    redact_pii,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc number {i} " + " ".join(f"w{(i * 7 + j) % 23}" for j in range(20)), ["en", "es", "zh"][i % 3])
        for i in range(200)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"]).cache()


def test_cluster_balanced_sample_caps_clusters_keeps_noise(spark):
    """At most cap rows per cluster, picked by smallest (hash, id) — stable
    across two runs; NULL-cluster (noise) rows are never capped."""
    from cognee_graphdb_spark.operators.training_data import cluster_balanced_sample

    rows = (
        [(f"a{i}", "big") for i in range(10)]
        + [(f"b{i}", "small") for i in range(2)]
        + [(f"n{i}", None) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id string, cluster string")
    out = cluster_balanced_sample(df, cap=3)
    got = {r["cluster"] if r["cluster"] else "noise" for r in out.collect()}
    counts = {k: 0 for k in got}
    for r in out.collect():
        counts[r["cluster"] if r["cluster"] else "noise"] += 1
    assert counts == {"big": 3, "small": 2, "noise": 5}
    again = sorted(r["doc_id"] for r in cluster_balanced_sample(df, cap=3).collect())
    assert again == sorted(r["doc_id"] for r in out.collect())
    with pytest.raises(ValueError, match="cap"):
        cluster_balanced_sample(df, cap=0)


def test_cluster_balanced_sample_margin_prefilter_parity(spark):
    """r11 VERDICT #4: the margin prefilter must be invisible in the
    output.  A 1500-row hot cluster (>> margin·cap, so the quantile cut
    drops ~97% of it before the window), a margin-undershoot-sized
    cluster, a sub-margin cluster and noise — the result equals the naive
    unfiltered per-cluster window pick row for row, and the schema keeps
    the input column order."""
    from pyspark.sql.window import Window

    from cognee_graphdb_spark.operators.dedup import _hash64
    from cognee_graphdb_spark.operators.training_data import cluster_balanced_sample

    rows = (
        [(f"hot{i:04d}", "hot", i) for i in range(1500)]
        + [(f"mid{i}", "mid", i) for i in range(40)]
        + [(f"tiny{i}", "tiny", i) for i in range(3)]
        + [(f"noise{i}", None, i) for i in range(25)]
    )
    df = spark.createDataFrame(rows, "doc_id string, cluster string, payload long")
    cap = 4
    got = sorted(map(tuple, cluster_balanced_sample(df, cap=cap).collect()))
    w = Window.partitionBy("cluster").orderBy(
        _hash64(F.col("doc_id").cast("string"), 0, "xxhash64"), "doc_id"
    )
    naive = sorted(
        map(
            tuple,
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("cluster").isNull() | (F.col("__rn") <= cap))
            .drop("__rn")
            .collect(),
        )
    )
    assert got == naive
    assert cluster_balanced_sample(df, cap=cap).columns == df.columns


def test_hash_sample_deterministic_and_sized(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=7).select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.3, seed=7).select("doc_id").collect()}
    assert a == b  # pure function of the key — no RNG state
    assert 0.15 < len(a) / 200 < 0.45
    # nested property: a smaller fraction with the same seed is a subset
    c = {r["doc_id"] for r in hash_sample(docs, 0.1, seed=7).select("doc_id").collect()}
    assert c <= a


def test_hash_sample_bounds(docs):
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == 200
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_stratified_sample_respects_per_stratum_fractions(docs):
    out = stratified_sample(docs, "lang", {"en": 1.0, "es": 0.0}, default_fraction=0.5, seed=3)
    by_lang = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    totals = {r["lang"]: r["cnt"] for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert by_lang["en"] == totals["en"]  # fraction 1.0 keeps everything
    assert "es" not in by_lang  # fraction 0.0 keeps nothing
    assert 0 < by_lang["zh"] < totals["zh"]  # default fraction in between


def test_ngram_decontaminate_flags_only_overlapping_docs(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "entirely different words appear in this one sample"),
            (3, "quick brown fox jumps over something else entirely"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(100, "a quick brown fox jumps across")], ["doc_id", "text"])
    hits = {r["doc_id"]: r["shared_ngrams"] for r in ngram_decontaminate(train, ev, n=4).collect()}
    # eval 4-grams: {a quick brown fox, quick brown fox jumps, brown fox jumps across}
    assert set(hits) == {1, 3}
    assert hits[1] == 1 and hits[3] == 1  # only "quick brown fox jumps" is shared
    clean = train.join(ngram_decontaminate(train, ev, n=4), "doc_id", "left_anti")
    assert {r["doc_id"] for r in clean.collect()} == {2}


def test_redact_pii_patterns_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "ssn 123-45-6789 ip 192.168.0.1 call +1 555-123-4567"),
            (3, "nothing sensitive here 12 34"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["redacted_text"] == "mail <EMAIL> now"
    assert out[1]["n_redactions"] == 1
    assert out[2]["redacted_text"] == "ssn <SSN> ip <IP> call +1 <PHONE>"
    assert out[2]["n_redactions"] == 3
    assert out[3]["redacted_text"] == "nothing sensitive here 12 34"
    assert out[3]["n_redactions"] == 0


def test_corpus_stats_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "d d d d")], ["doc_id", "text"]
    )
    row = corpus_stats(df).collect()[0]
    assert row["n_docs"] == 3
    assert row["total_tokens"] == 9
    assert row["min_doc_tokens"] == 2
    assert row["max_doc_tokens"] == 4
    assert row["avg_doc_tokens"] == 3.0
    assert row["vocab_size"] == 4  # {a, b, c, d}


def test_pack_sequences_invariants(docs):
    packed = pack_sequences(docs, budget=64, partitions=4)
    rows = packed.collect()
    # every doc appears exactly once
    assert sorted(r["doc_id"] for r in rows) == sorted(str(i) for i in range(200))
    # per-sequence budget holds unless a single doc overflows it alone
    by_seq: dict[str, list] = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for seq_rows in by_seq.values():
        total = sum(r["n_tokens"] for r in seq_rows)
        assert total <= 64 or len(seq_rows) == 1
        # positions are 0..n-1
        assert sorted(r["seq_pos"] for r in seq_rows) == list(range(len(seq_rows)))
    # deterministic for a fixed partition count
    again = {(r["doc_id"], r["seq_id"], r["seq_pos"]) for r in pack_sequences(docs, budget=64, partitions=4).collect()}
    assert again == {(r["doc_id"], r["seq_id"], r["seq_pos"]) for r in rows}


def test_pack_sequences_oversized_doc_gets_own_sequence(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 100)), (2, "a b"), (3, "c d")], ["doc_id", "text"]
    )
    rows = pack_sequences(df, budget=10, partitions=1).collect()
    seq_of = {r["doc_id"]: r["seq_id"] for r in rows}
    assert seq_of["1"] != seq_of["2"]  # the 100-token doc sits alone
    assert seq_of["2"] == seq_of["3"]  # the two small docs pack together


def test_repetition_features_exact(spark):
    from cognee_graphdb_spark.operators.training_data import repetition_features

    # 4 non-empty lines, "dup dup" twice (8 chars each, counted once as repeat);
    # tokens: dup x4, one x1, two x1, three x1 -> tok_chars = 4*3 + 3+3+5 = 23
    text = "dup dup\none two three\ndup dup\n\n  \ndup dup extra"
    out = repetition_features(
        spark.createDataFrame([(1, text)], ["doc_id", "text"])
    ).collect()[0]
    assert out["n_lines"] == 4
    assert out["dup_line_frac"] == round(1 / 4, 6)
    assert out["dup_line_char_frac"] == round(7 / (7 + 13 + 7 + 13), 6)
    # tokenization is text-wide (line breaks are just separators): the token
    # stream is dup dup one two three dup dup dup dup extra, so the bigram
    # "dup dup" occurs 4 times x 6 chars over 34 total token chars
    assert out["top2gram_char_frac"] == round(4 * 6 / 34, 6)


def test_repetition_features_no_ngram_doc_kept(spark):
    from cognee_graphdb_spark.operators.training_data import repetition_features

    # a single 1-token line has no 2/3/4-grams: fractions are 0, row kept
    out = repetition_features(
        spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    ).collect()
    assert len(out) == 1
    assert out[0]["top2gram_char_frac"] == 0.0
    assert out[0]["dup_line_frac"] == 0.0


def test_gopher_quality_filter_reasons(spark):
    from cognee_graphdb_spark.operators.training_data import gopher_quality_filter

    good = "the quick brown fox jumps over the lazy dog and then " * 10
    short = "tiny text here"
    symbols = "the code has " + "# " * 40 + " and more of the usual filler words"
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in gopher_quality_filter(df).collect()}
    assert rows["1"]["keep"] and rows["1"]["fail_reasons"] == []
    assert not rows["2"]["keep"]
    assert "too_few_words" in rows["2"]["fail_reasons"]
    assert not rows["3"]["keep"]
    assert "symbol_word_ratio" in rows["3"]["fail_reasons"]


def test_unigram_logprob_exact(spark):
    import math

    from cognee_graphdb_spark.operators.training_data import unigram_lm, unigram_logprob

    # corpus: a a a b  -> p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame([(1, "a a a"), (2, "b")], ["doc_id", "text"])
    lm = unigram_lm(df)
    rows = {r["doc_id"]: r for r in unigram_logprob(df, lm).collect()}
    assert rows["1"]["n_tokens"] == 3
    assert rows["1"]["oov_frac"] == 0.0
    assert rows["1"]["mean_logprob"] == round(math.log(3 / 4), 6)
    assert rows["2"]["mean_logprob"] == round(math.log(1 / 4), 6)


def test_unigram_logprob_oov_floor(spark):
    import math

    from cognee_graphdb_spark.operators.training_data import unigram_lm, unigram_logprob

    train = spark.createDataFrame([(1, "x x x y")], ["doc_id", "text"])
    lm = unigram_lm(train, vocab_size=1)  # keeps only "x"; total stays 4
    score = spark.createDataFrame([(9, "x y z")], ["doc_id", "text"])
    row = unigram_logprob(score, lm).collect()[0]
    # y and z are OOV (y truncated out of vocab, z unseen): floor = ln(1/4)
    assert row["oov_frac"] == round(2 / 3, 6)
    expect = (math.log(3 / 4) + 2 * math.log(1 / 4)) / 3
    assert row["mean_logprob"] == round(expect, 6)


def test_weighted_sample_extremes_and_determinism(docs):
    from cognee_graphdb_spark.operators.training_data import weighted_sample

    w1 = docs.withColumn("w", F.lit(1.0))
    assert weighted_sample(w1, "w").count() == docs.count()  # weight 1 keeps all
    w0 = docs.withColumn("w", F.lit(0.0))
    assert weighted_sample(w0, "w").count() == 0
    wj = docs.withColumn("w", (F.col("doc_id") % 10).cast("double") / 10.0)
    a = {r["doc_id"] for r in weighted_sample(wj, "w", seed=3).collect()}
    b = {r["doc_id"] for r in weighted_sample(wj, "w", seed=3).collect()}
    assert a == b
    # weight-0 rows can never survive
    assert all(i % 10 != 0 for i in a)


def test_deterministic_shuffle_is_a_permutation(docs):
    from cognee_graphdb_spark.operators.training_data import deterministic_shuffle

    out = deterministic_shuffle(docs, n_shards=8, seed=1)
    rows = out.select("doc_id", "shard", "pos").collect()
    assert len(rows) == docs.count()
    assert {r["shard"] for r in rows} <= set(range(8))
    # pos is 1..n_in_shard with no gaps within each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # same seed -> identical assignment; different seed -> different order
    again = deterministic_shuffle(docs, n_shards=8, seed=1).select("doc_id", "shard", "pos")
    assert {tuple(r) for r in again.collect()} == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    other = deterministic_shuffle(docs, n_shards=8, seed=2).select("doc_id", "shard", "pos")
    assert {tuple(r) for r in other.collect()} != {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_duplicate_spans_cross_doc_misaligned(spark):
    from cognee_graphdb_spark.operators.training_data import duplicate_spans

    # the same 40-token span embedded at DIFFERENT offsets in two docs —
    # content-defined anchors must still align inside the span
    span = " ".join(f"shared{i % 17} common{i % 13}" for i in range(20))
    a = "prefix one two three " + span + " suffix here"
    b = "a completely different and much longer leading context sentence " + span
    c = "unrelated filler words that never repeat anything interesting at all " * 3
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in duplicate_spans(df, window=8, stride=2).collect()}
    assert rows["1"]["dup_windows"] > 0
    assert rows["2"]["dup_windows"] > 0
    assert rows["3"]["dup_windows"] == 0
    assert rows["3"]["dup_frac"] == 0.0


def test_duplicate_spans_within_doc_repeat_not_cross_doc(spark):
    from cognee_graphdb_spark.operators.training_data import duplicate_spans

    # a span repeated INSIDE one doc must not count as a cross-doc duplicate
    span = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, span + " middle filler " + span), (2, "totally different content here " * 10)],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in duplicate_spans(df, window=8, stride=2).collect()}
    assert rows["1"]["dup_windows"] == 0


def test_c4_line_filter_rules(spark):
    from cognee_graphdb_spark.operators.training_data import c4_line_filter

    good = "\n".join(
        [
            "This is a perfectly fine sentence with enough words in it.",
            "Another complete sentence that also ends with proper punctuation!",
            "And a third one, because documents need at least three lines?",
            "short line.",  # < 5 words -> dropped
            "Enable javascript to view this page properly and completely.",  # blocklist
            "A line without terminal punctuation that keeps going",  # no punct
        ]
    )
    code = "Valid sentence number one right here with words.\nfunction f() { return 1; }\nMore valid sentence text right here with words.\nThird full sentence is also present in this doc."
    lorem = "Lorem Ipsum dolor sit amet is placeholder text for sure.\nSecond real sentence with plenty of words in it.\nThird real sentence with plenty of words in it."
    df = spark.createDataFrame([(1, good), (2, code), (3, lorem)], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert rows["1"]["keep_doc"]
    assert rows["1"]["n_lines_kept"] == 3 and rows["1"]["n_lines_dropped"] == 3
    assert rows["1"]["clean_text"].count("\n") == 2
    assert "javascript" not in rows["1"]["clean_text"]
    assert not rows["2"]["keep_doc"]  # '{' in doc
    assert not rows["3"]["keep_doc"]  # lorem ipsum


def test_c4_line_filter_handles_crlf(spark):
    from cognee_graphdb_spark.operators.training_data import c4_line_filter

    text = (
        "This is a perfectly fine sentence with enough words in it.\r\n"
        "Another complete sentence that also ends with proper punctuation!\r\n"
        "And a third one, because documents need at least three lines?\r\n"
    )
    row = c4_line_filter(spark.createDataFrame([(1, text)], ["doc_id", "text"])).collect()[0]
    assert row["keep_doc"] and row["n_lines_kept"] == 3
    assert "\r" not in row["clean_text"]


def test_mixture_plan_fractions_and_epochs(spark):
    from cognee_graphdb_spark.operators.training_data import mixture_plan

    rows = [(i, "word " * 100, "web") for i in range(10)] + [
        (100 + i, "word " * 100, "books") for i in range(2)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    # web: 1000 tokens available, books: 200
    plan = {r["source"]: r for r in mixture_plan(df, {"web": 1, "books": 1}, total_tokens=800).collect()}
    assert plan["web"]["available_tokens"] == 1000
    assert plan["web"]["target_tokens"] == 400 and plan["web"]["fraction"] == 0.4
    assert plan["web"]["epochs"] == 1
    # books needs 400 of 200 -> 2 epochs (up-sampling regime)
    assert plan["books"]["fraction"] == 2.0 and plan["books"]["epochs"] == 2
    # unlisted source gets weight 0
    plan2 = {r["source"]: r for r in mixture_plan(df, {"web": 1}, total_tokens=500).collect()}
    assert plan2["books"]["weight"] == 0.0 and plan2["books"]["target_tokens"] == 0


def test_mixture_plan_surfaces_absent_weighted_source(spark):
    """A weighted source with no rows must appear as an impossible plan row
    (available_tokens=0), not silently drop its share of the budget."""
    from cognee_graphdb_spark.operators.training_data import mixture_plan

    df = spark.createDataFrame([(0, "word " * 100, "web")], ["doc_id", "text", "source"])
    plan = {r["source"]: r for r in mixture_plan(df, {"web": 1, "bookz": 1}, total_tokens=200).collect()}
    assert set(plan) == {"web", "bookz"}
    assert plan["bookz"]["available_tokens"] == 0
    assert plan["bookz"]["weight"] == 0.5 and plan["bookz"]["target_tokens"] == 100
    # fraction/epochs computed against a 1-token floor: visibly impossible
    assert plan["bookz"]["fraction"] == 100.0 and plan["bookz"]["epochs"] == 100


def test_source_quality_report_keep_rates(spark):
    from cognee_graphdb_spark.operators.training_data import source_quality_report

    good = "the quick brown fox jumps over the lazy dog and then walks on " * 10
    rows = [(i, good, "clean") for i in range(4)] + [(10 + i, "x y.", "junk") for i in range(4)]
    out = {r["source"]: r for r in source_quality_report(
        spark.createDataFrame(rows, ["doc_id", "text", "source"])
    ).collect()}
    assert out["clean"]["gopher_keep_rate"] == 1.0
    assert out["junk"]["gopher_keep_rate"] == 0.0
    assert out["clean"]["n_docs"] == 4 and out["clean"]["total_tokens"] == 4 * 130


def test_dsir_weights_separate_target_like_docs(spark):
    """Raw docs written in the target's vocabulary must outweigh raw docs in
    a disjoint vocabulary, and an empty doc weighs exactly 0."""
    from cognee_graphdb_spark.operators.training_data import dsir_importance_weights

    target = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta") for i in range(10)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "beta alpha alpha"),
         (200, "zulu yankee xray"), (201, "quebec victor whiskey"),
         (300, "")],
        "doc_id long, text string",
    )
    w = {r["id"]: r["log_weight"] for r in dsir_importance_weights(raw, target, buckets=512).collect()}
    assert len(w) == 5
    assert min(w[100], w[101]) > max(w[200], w[201])
    assert w[300] == 0.0


def test_dsir_resample_deterministic_topk(spark):
    """Gumbel top-k is a deterministic function of (id, seed): same call
    twice -> identical selection; different seed -> same weights, different
    tie-broken ordering allowed; k bounds the output."""
    from cognee_graphdb_spark.operators.training_data import dsir_resample

    target = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(5)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, f"alpha beta token{i % 7} gamma") for i in range(100, 140)],
        "doc_id long, text string",
    )
    a = [tuple(r) for r in dsir_resample(raw, target, k=10, buckets=512, seed=17).collect()]
    b = [tuple(r) for r in dsir_resample(raw, target, k=10, buckets=512, seed=17).collect()]
    assert a == b and len(a) == 10
    ids = {t[0] for t in a}
    assert ids <= set(range(100, 140))
    c = {t[0] for t in dsir_resample(raw, target, k=10, buckets=512, seed=99).collect()}
    assert c <= set(range(100, 140)) and len(c) == 10
