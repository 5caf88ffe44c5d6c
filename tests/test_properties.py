"""Property-based tests (hypothesis) over the pure deterministic cores.

The reference pins golden vectors (SURVEY §5.1); these add the invariants the
vectors can't enumerate: the chunker reconstructs ANY input byte-for-byte, ids
are total deterministic functions, normalization is idempotent, and the
multiset token overlap matches a Counter-based reimplementation of the
reference metric on arbitrary repeated-token lists.  The pure-Python cores run
without a Spark session, so hypothesis can hammer hundreds of examples
cheaply; the one Spark comparison batches all its cases into a single action.
"""

import random
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cognee_graphdb_spark.ids import py_content_id, py_normalize_name
from cognee_graphdb_spark.operators.chunking import chunk_text, scan_words, sentences

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any unicode, no surrogates
    max_size=400,
)


@settings(max_examples=300, deadline=None)
@given(text_strategy, st.integers(min_value=1, max_value=64))
def test_chunker_reconstructs_any_input(text, max_size):
    """F3's contract: concatenating chunk texts reproduces the input exactly,
    whatever the whitespace/unicode shape and however small the budget."""
    chunks = chunk_text(text, max_chunk_size=max_size)
    assert "".join(c["text"] for c in chunks) == text
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
    assert all(c["chunk_size"] >= 1 for c in chunks if c["text"].strip())


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_word_scan_preserves_every_character(text):
    """F1: the word scanner partitions the input (no char lost or added)."""
    assert "".join(w for w, _ in scan_words(text)) == text


@settings(max_examples=300, deadline=None)
@given(text_strategy, st.one_of(st.none(), st.integers(min_value=1, max_value=16)))
def test_sentences_partition_the_text(text, max_size):
    assert "".join(s for s, _, _ in sentences(text, max_size=max_size)) == text


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=100), st.text(max_size=100))
def test_content_id_deterministic_fixed_width(a, b):
    """F5: same parts => same id; 32-hex; separator prevents boundary
    collisions ("ab"+"c" vs "a"+"bc")."""
    cid = py_content_id(a, b)
    assert cid == py_content_id(a, b)
    assert len(cid) == 32 and all(c in "0123456789abcdef" for c in cid)
    assert py_content_id(a + "x", b) != py_content_id(a, "x" + b) or a + "x" + "\x1f" + b == a + "\x1f" + "x" + b


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_normalize_name_idempotent(s):
    """F6: normalization is idempotent — the property that keeps
    content-addressed entity ids stable across repeated ingestion."""
    once = py_normalize_name(s)
    assert py_normalize_name(once) == once
    if s.isascii():  # 'ß'.upper() == 'SS' breaks round-tripping outside ASCII
        assert py_normalize_name(s.upper()) == once  # case-insensitive


def test_multiset_overlap_matches_counter_reference(spark):
    """A7: the codegen multiset intersection agrees with the reference's
    Counter min-overlap (f1.py:12-46) on 200 random repeated-token pairs,
    compared in ONE Spark action."""
    from cognee_graphdb_spark.operators.aggregations import multiset_intersect_size

    rng = random.Random(42)
    vocab = ["a", "b", "c", "dd", "ee"]
    cases = [
        (
            [rng.choice(vocab) for _ in range(rng.randint(1, 12))],
            [rng.choice(vocab) for _ in range(rng.randint(1, 12))],
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, p, g) for i, (p, g) in enumerate(cases)], ["i", "pred", "gold"]
    ).select("i", multiset_intersect_size(F.col("pred"), F.col("gold")).alias("ov"))
    got = {r["i"]: r["ov"] for r in df.collect()}
    for i, (p, g) in enumerate(cases):
        assert got[i] == sum((Counter(p) & Counter(g)).values()), (p, g)


def test_corpus_op_invariants_batched(spark):
    """Corpus-wide invariants of the curation ops, checked over one seeded
    random corpus in a handful of Spark actions (the hypothesis-per-example
    pattern would pay a job per case)."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(50)] + ["the", "and", "of", "to", "a"]
    rows = []
    for i in range(300):
        n = rng.randint(0, 120)
        words = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
        # sprinkle structure: newlines, punctuation, repeats
        text = " ".join(words)
        if i % 3 == 0:
            text = text.replace(" ", ".\n", 3)
        if i % 7 == 0:
            text += " " + text[: len(text) // 2]
        rows.append((i, text))
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).cache()

    from cognee_graphdb_spark.operators.training_data import (
        c4_line_filter,
        deterministic_shuffle,
        duplicate_spans,
        unigram_lm,
        unigram_logprob,
        weighted_sample,
    )

    # c4: kept + dropped == non-empty lines, and keep_doc implies >= 3 kept
    c4 = c4_line_filter(docs)
    bad = c4.filter(
        (F.col("n_lines_kept") < 0)
        | (F.col("n_lines_dropped") < 0)
        | (F.col("keep_doc") & (F.col("n_lines_kept") < 3))
    ).count()
    assert bad == 0
    assert c4.count() == 300  # projection: one row per doc, always

    # duplicate_spans: dup_windows <= n_windows, dup_frac in [0,1]
    ds = duplicate_spans(docs, window=6, stride=2)
    assert (
        ds.filter(
            (F.col("dup_windows") > F.col("n_windows"))
            | (F.col("dup_frac") < 0)
            | (F.col("dup_frac") > 1)
        ).count()
        == 0
    )

    # unigram scoring: mean_logprob <= 0, oov_frac == 0 on own corpus
    lm = unigram_lm(docs)
    sc = unigram_logprob(docs, lm)
    assert sc.filter((F.col("mean_logprob") > 0) | (F.col("oov_frac") != 0.0)).count() == 0

    # weighted_sample: kept set is a subset and monotone in weight
    w_lo = docs.withColumn("w", F.lit(0.3))
    w_hi = docs.withColumn("w", F.lit(0.8))
    kept_lo = {r["doc_id"] for r in weighted_sample(w_lo, "w", seed=9).select("doc_id").collect()}
    kept_hi = {r["doc_id"] for r in weighted_sample(w_hi, "w", seed=9).select("doc_id").collect()}
    assert kept_lo <= kept_hi  # same hash, higher threshold keeps superset

    # deterministic_shuffle: a permutation (every doc exactly once)
    sh = deterministic_shuffle(docs, n_shards=8, seed=5)
    assert sh.count() == 300
    assert sh.select("doc_id").distinct().count() == 300


# -- round-6 codec properties ------------------------------------------------

_dims = st.tuples(st.integers(min_value=1, max_value=40), st.integers(min_value=1, max_value=40))


@settings(max_examples=25, deadline=None)
@given(_dims, st.integers(min_value=0, max_value=2**31 - 1))
def test_jpeg_block_constant_roundtrip_exact(dims, seed):
    """Any block-constant grayscale image with even luma decodes bit-exactly
    through the full baseline JPEG path (the driver-oracle property)."""
    from cognee_graphdb_spark.sources.jpeg import jpeg_bytes, jpeg_pixels, parse_jpeg

    w, h = dims
    gray = lambda x, y: 2 * ((seed + 3 * (x // 8) + 7 * (y // 8)) % 128)
    data = jpeg_bytes(w, h, lambda x, y: (gray(x, y),) * 3, gray=True)
    assert parse_jpeg(data) == (w, h, 1)
    px = jpeg_pixels(data)
    assert len(px) == h and len(px[0]) == w
    assert all(px[y][x] == (gray(x, y),) * 3 for y in range(h) for x in range(w))


@settings(max_examples=15, deadline=None)
@given(_dims, st.integers(min_value=1, max_value=9), st.booleans())
def test_jpeg_gradient_roundtrip_bounded_error(dims, slope, subsample):
    """Lossy color round-trip stays within quantization error on smooth
    gradients — for 4:4:4 and 4:2:0, any dims (edge-block crop)."""
    from cognee_graphdb_spark.sources.jpeg import jpeg_bytes, jpeg_pixels

    w, h = dims
    # clamped ramps, not mod-256 wraps: a wrap is a ~255-value edge whose
    # ringing legitimately exceeds any smooth-gradient tolerance
    grad = lambda x, y: (min(x * slope, 255), min(y * slope, 255), min(x + y * slope, 255))
    px = jpeg_pixels(jpeg_bytes(w, h, grad, subsample=subsample))
    maxerr = max(
        abs(px[y][x][c] - grad(x, y)[c]) for y in range(h) for x in range(w) for c in range(3)
    )
    assert maxerr <= (60 if subsample else 25), maxerr


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.sampled_from([32000, 44100, 48000]),
    st.sampled_from([32, 64, 128, 320]),
    st.integers(min_value=1, max_value=2),
    st.binary(max_size=64),
)
def test_mp3_frame_walk_roundtrip(n_frames, rate, kbps, channels, id3):
    from cognee_graphdb_spark.sources.container import mp3_bytes, parse_mp3

    data = mp3_bytes(n_frames, sample_rate=rate, bitrate_kbps=kbps, channels=channels, id3_payload=id3)
    info = parse_mp3(data)
    assert info.frames == n_frames
    assert info.sample_rate == rate
    assert info.channels == channels
    assert info.duration_ms == n_frames * 1152 * 1000 // rate
    assert not info.vbr


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**7),
    st.integers(min_value=1, max_value=4096),
    st.integers(min_value=1, max_value=2160),
    st.sampled_from(["avc1", "hvc1", "vp09"]),
)
def test_mp4_box_walk_roundtrip(dur, w, h, codec):
    # 0-dim tracks are treated as undimensioned (audio-style), hence >= 1 here
    from cognee_graphdb_spark.sources.container import mp4_bytes, parse_mp4

    info = parse_mp4(mp4_bytes(dur, width=w, height=h, video_codec=codec))
    assert info.duration_ms == dur
    assert (info.width, info.height) == (w, h)
    assert info.codecs[0] == codec


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300))
def test_codec_parsers_never_crash_on_garbage(blob):
    """Malformed input raises ValueError (or decodes, for the rare blob that
    happens to be valid) — never an unhandled exception; the corpus-job
    contract that one bad blob cannot kill a 100 TB decode stage."""
    from cognee_graphdb_spark.sources import media as m
    from cognee_graphdb_spark.sources.container import parse_mp3, parse_mp4
    from cognee_graphdb_spark.sources.jpeg import jpeg_pixels, parse_jpeg

    for fn in (jpeg_pixels, parse_jpeg, parse_mp3, parse_mp4, m.decode_image):
        try:
            fn(blob)
        except ValueError:
            pass
