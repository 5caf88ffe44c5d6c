"""WAV/BMP/PPM deterministic codecs (sources/media.py) + the decoded
multimodal operators.  Mirrors test_pdf_ingest's pattern: public-spec
round-trips, then the Spark operators over real fixture bytes.

Reference dispatch parity: LoaderEngine.py:25-96 routes audio/image loaders;
the [LLM] transcript/description half stays behind the gateway — these tests
pin the BINARY half."""

import pytest

from cognee_graphdb_spark.sources import media as m


def test_wav_roundtrip_8bit():
    pcm = bytes(range(200))  # 8-bit unsigned PCM, 200 samples @ 1000 Hz
    data = m.wav_bytes(pcm, sample_rate=1000, channels=1, sample_width=1)
    info = m.parse_wav(data)
    assert (info.channels, info.sample_rate, info.sample_width, info.n_frames) == (1, 1000, 1, 200)
    assert info.duration_ms == 200
    assert m.wav_samples(data) == list(range(200))


def test_wav_roundtrip_16bit_stereo():
    import struct

    frames = b"".join(struct.pack("<hh", v, -v) for v in range(-100, 100))
    data = m.wav_bytes(frames, sample_rate=8000, channels=2, sample_width=2)
    info = m.parse_wav(data)
    assert (info.channels, info.sample_width, info.n_frames) == (2, 2, 200)
    assert m.wav_samples(data) == list(range(-100, 100))  # first channel only


def test_wav_sample_at_offsets():
    pcm = bytes((i * 3) % 256 for i in range(1000))  # 1s @ 1000 Hz
    data = m.wav_bytes(pcm, sample_rate=1000)
    got = m.wav_sample_at_offsets(data, every_ms=250)
    assert got == [(0, 0), (250, 750 % 256 * 0 + (250 * 3) % 256), (500, (500 * 3) % 256), (750, (750 * 3) % 256)]


def test_wav_rms_constant_signal():
    data = m.wav_bytes(bytes([128] * 100), sample_rate=1000)  # silence at center
    assert m.wav_rms(data) == pytest.approx(0.0)
    loud = m.wav_bytes(bytes([255] * 100), sample_rate=1000)
    assert m.wav_rms(loud) == pytest.approx(127 / 255)


def _pix(x, y):
    return ((x * 7 + y) % 256, (x + y * 5) % 256, (x * y) % 256)


def test_bmp_roundtrip_with_padding():
    # width 3 -> 9-byte rows padded to 12: exercises the 4-byte alignment
    data = m.bmp_bytes(3, 2, _pix)
    assert m.parse_bmp(data) == (3, 2, 24)
    px = m.bmp_pixels(data)
    assert px == [[_pix(x, y) for x in range(3)] for y in range(2)]


def test_ppm_roundtrip():
    data = m.ppm_bytes(4, 3, _pix)
    assert m.parse_ppm(data) == (4, 3)
    assert m.ppm_pixels(data) == [[_pix(x, y) for x in range(4)] for y in range(3)]


def test_ppm_width_255_and_comment():
    # regression: a dimension containing '255' (or a header comment) must not
    # confuse the pixel-data offset — the scan tracks position, never searches
    data = m.ppm_bytes(255, 2, _pix)
    assert m.parse_ppm(data) == (255, 2)
    px = m.ppm_pixels(data)
    assert px[0][0] == _pix(0, 0) and px[1][254] == _pix(254, 1)
    plain = m.ppm_bytes(4, 3, _pix)
    body = plain[len(b"P6\n4 3\n255\n") :]
    with_comment = b"P6\n# a comment\n4 3\n255\n" + body
    assert m.ppm_pixels(with_comment) == m.ppm_pixels(plain)


def test_decode_image_dispatch_and_errors():
    assert m.decode_image(m.bmp_bytes(2, 2, _pix)) == m.decode_image(m.ppm_bytes(2, 2, _pix))
    with pytest.raises(ValueError, match="unsupported image format"):
        m.decode_image(b"\x89PNG....")


def test_resize_nearest_floor_mapping():
    px = m.bmp_pixels(m.bmp_bytes(8, 6, _pix))
    small = m.resize_nearest(px, 4, 3)
    for ty in range(3):
        for tx in range(4):
            assert small[ty][tx] == _pix(tx * 8 // 4, ty * 6 // 3)


def test_audio_frame_sample_operator(spark):
    from cognee_graphdb_spark.operators.multimodal import audio_frame_sample

    pcm = bytes(i % 256 for i in range(500))
    wav = m.wav_bytes(pcm, sample_rate=1000)
    media = spark.createDataFrame(
        [("a1", "audio", wav)], "media_id string, kind string, content binary"
    )
    got = {(r["frame_offset_ms"], r["amplitude"]) for r in audio_frame_sample(media, every_ms=100).collect()}
    assert got == {(off, off % 256) for off in range(0, 500, 100)}


def test_image_resize_operator(spark):
    from cognee_graphdb_spark.operators.multimodal import image_resize

    bmp = m.bmp_bytes(8, 8, lambda x, y: (x * 10, 0, 0))
    media = spark.createDataFrame([("i1", "image", bmp)], "media_id string, kind string, content binary")
    [r] = image_resize(media, 4, 4).collect()
    assert (r["width"], r["height"], r["target_width"], r["target_height"]) == (8, 8, 4, 4)
    # red at (tx,*) = (tx*8//4)*10 = tx*20; summed over 4 rows
    assert r["red_sum"] == sum(tx * 20 for tx in range(4)) * 4


def test_operators_skip_malformed_blobs(spark):
    # a 100 TB corpus always contains broken blobs: decode failures skip the
    # row instead of failing the whole job
    from cognee_graphdb_spark.operators.multimodal import audio_frame_sample, image_resize

    good_wav = m.wav_bytes(bytes(range(100)), sample_rate=1000)
    good_bmp = m.bmp_bytes(4, 4, _pix)
    media = spark.createDataFrame(
        [("ok", "audio", good_wav), ("bad", "audio", b"\x00garbage")],
        "media_id string, kind string, content binary",
    )
    assert {r["media_id"] for r in audio_frame_sample(media, every_ms=50).collect()} == {"ok"}
    media2 = spark.createDataFrame(
        [("ok", "image", good_bmp), ("bad", "image", b"\x89PNGnope")],
        "media_id string, kind string, content binary",
    )
    assert {r["media_id"] for r in image_resize(media2, 2, 2).collect()} == {"ok"}


def test_extract_features_real_wav_and_bmp(spark):
    from cognee_graphdb_spark.operators.multimodal import extract_features

    silent = m.wav_bytes(bytes([128] * 64), sample_rate=1000)
    bright = m.bmp_bytes(4, 4, lambda x, y: (255, 255, 255))
    media = spark.createDataFrame(
        [("wav1", "audio", silent), ("img1", "image", bright)],
        "media_id string, kind string, content binary",
    )
    feats = {r["media_id"]: r["features"] for r in extract_features(media, dim=4).collect()}
    assert feats["wav1"] == pytest.approx([0.0, 0.0, 0.0, 0.0])  # silence -> zero RMS
    assert feats["img1"] == pytest.approx([1.0, 1.0, 1.0, 1.0])  # white -> full luminance


def test_extract_features_malformed_magic_falls_back(spark):
    # a RIFF-magic AVI or truncated BMP must take the deterministic stand-in
    # path (pre-existing behavior), never crash the job
    from cognee_graphdb_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [("avi", "video", b"RIFF....AVI LIST"), ("badbmp", "image", b"BM\x01\x02")],
        "media_id string, kind string, content binary",
    )
    feats = {r["media_id"]: r["features"] for r in extract_features(media, dim=4).collect()}
    assert len(feats) == 2 and all(len(v) == 4 for v in feats.values())


def test_ingest_envelope_real_metadata():
    from cognee_graphdb_spark.sources.ingest import decode_row

    wav = m.wav_bytes(bytes([128] * 250), sample_rate=1000)
    assert decode_row("audio_loader", wav) == "[audio 1ch 1000Hz 250ms rms=0.0000]"
    bmp = m.bmp_bytes(5, 4, lambda x, y: (10, 20, 30))
    assert decode_row("image_loader", bmp) == "[image 5x4 mean_rgb=(10, 20, 30)]"
    # unparseable binary falls back to the content-addressed stand-in
    assert decode_row("audio_loader", b"\xff\xfbmp3data").startswith("[audio_loader:")
