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


def test_llm_media_loader_path():
    """With a gateway, audio/image decode routes through create_transcript /
    transcribe_image (the reference's [LLM] loader shape) — fed by the REAL
    decoded features; undecodable formats keep the metadata envelope."""
    from cognee_graphdb_spark.llm.gateway import MockLLMGateway
    from cognee_graphdb_spark.sources.ingest import decode_row

    gw = MockLLMGateway()
    wav = m.wav_bytes(bytes([128] * 250), sample_rate=1000)
    assert decode_row("audio_loader", wav, gateway=gw) == (
        "audio transcript: 1 channel 1000 hz 250 ms rms_ppm 0"
    )
    bmp = m.bmp_bytes(5, 4, lambda x, y: (10, 20, 30))
    assert decode_row("image_loader", bmp, gateway=gw) == (
        "image description: 5x4 pixels mean rgb 10 20 30"
    )
    # text/pdf and undecodable media are untouched by the gateway flag
    assert decode_row("audio_loader", b"\xff\xfbmp3data", gateway=gw).startswith("[audio")
    assert decode_row("image_loader", b"junk", gateway=gw).startswith("[image_loader:")


def test_llm_media_gateway_transport_errors_propagate():
    """A gateway transport failure (e.g. 5xx after retries) must NOT be
    swallowed into the metadata envelope — that would silently make the
    stored corpus text nondeterministic across runs.  Only decode failures
    fall through."""
    import pytest as _pytest

    from cognee_graphdb_spark.sources.ingest import decode_row

    class DownGateway:
        def create_transcript(self, features):
            raise ConnectionError("gateway down")

        def transcribe_image(self, features):
            raise ConnectionError("gateway down")

    wav = m.wav_bytes(bytes([128] * 250), sample_rate=1000)
    bmp = m.bmp_bytes(5, 4, lambda x, y: (10, 20, 30))
    for loader, blob in (("audio_loader", wav), ("image_loader", bmp)):
        with _pytest.raises(ConnectionError):
            decode_row(loader, blob, gateway=DownGateway())
    # undecodable blob: gateway never called, envelope fallback intact
    assert decode_row("image_loader", b"junk", gateway=DownGateway()).startswith("[image_loader:")


def test_decode_documents_mixed_types_with_gateway(spark):
    from cognee_graphdb_spark.llm.gateway import MockLLMGateway
    from cognee_graphdb_spark.sources.ingest import decode_documents

    wav = m.wav_bytes(bytes([128] * 100), sample_rate=1000)
    bmp = m.bmp_bytes(2, 2, lambda x, y: (7, 0, 0))
    df = spark.createDataFrame(
        [("a1", "AudioDocument", bytearray(wav)), ("i1", "ImageDocument", bytearray(bmp))],
        "id string, document_type string, content binary",
    )
    got = {r["id"]: r["text"] for r in decode_documents(df, gateway=MockLLMGateway()).collect()}
    assert got == {
        "a1": "audio transcript: 1 channel 1000 hz 100 ms rms_ppm 0",
        "i1": "image description: 2x2 pixels mean rgb 7 0 0",
    }


def test_png_roundtrip_and_filter_undo():
    # encoder emits filter-0 rows; decode must reproduce the pixel formula
    data = m.png_bytes(7, 5, lambda x, y: ((x * 37 + y * 91) % 256, x % 256, y % 256))
    assert m.parse_png(data) == (7, 5, 3)
    px = m.png_pixels(data)
    assert px[2][3] == ((3 * 37 + 2 * 91) % 256, 3, 2)
    # every public filter type (Sub/Up/Average/Paeth) must un-filter exactly
    import struct
    import zlib

    W, H = 5, 5
    want = [[((x * 37 + y * 91) % 256, (x * 3) % 256, (y * 7) % 256) for x in range(W)] for y in range(H)]
    raw = bytearray()
    prior = bytes(W * 3)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        line = b"".join(bytes(p) for p in want[y])
        out = bytearray(line)
        if f == 1:
            for i in range(len(line) - 1, 2, -1):
                out[i] = (line[i] - line[i - 3]) & 255
        elif f == 2:
            for i in range(len(line)):
                out[i] = (line[i] - prior[i]) & 255
        elif f == 3:
            for i in range(len(line)):
                left = line[i - 3] if i >= 3 else 0
                out[i] = (line[i] - ((left + prior[i]) >> 1)) & 255
        elif f == 4:
            for i in range(len(line)):
                left = line[i - 3] if i >= 3 else 0
                ul = prior[i - 3] if i >= 3 else 0
                out[i] = (line[i] - m._paeth(left, prior[i], ul)) & 255
        raw.append(f)
        raw += out
        prior = line
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)
    multi = (
        m._PNG_SIG
        + m._png_chunk(b"IHDR", ihdr)
        + m._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + m._png_chunk(b"IEND", b"")
    )
    assert m.png_pixels(multi) == want


def test_png_rgba_and_errors():
    import struct
    import zlib

    # RGBA (colortype 6) decodes with alpha dropped
    raw = bytearray()
    for y in range(2):
        raw.append(0)
        for x in range(3):
            raw += bytes((x, y, x + y, 200))
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 6, 0, 0, 0)
    rgba = (
        m._PNG_SIG
        + m._png_chunk(b"IHDR", ihdr)
        + m._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + m._png_chunk(b"IEND", b"")
    )
    assert m.parse_png(rgba) == (3, 2, 4)
    assert m.png_pixels(rgba)[1][2] == (2, 1, 3)
    # honest errors: 16-bit samples, gray+alpha, corrupted CRC, truncation
    import pytest as _pytest

    for depth, color in ((16, 2), (8, 4)):
        ihdr16 = struct.pack(">IIBBBBB", 3, 2, depth, color, 0, 0, 0)
        bad16 = m._PNG_SIG + m._png_chunk(b"IHDR", ihdr16)
        with _pytest.raises(ValueError, match="colortype"):
            m.parse_png(bad16)
    # palette PNG without its PLTE is rejected, not mis-decoded
    pal_ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    import zlib as _zlib

    no_plte = (
        m._PNG_SIG
        + m._png_chunk(b"IHDR", pal_ihdr)
        + m._png_chunk(b"IDAT", _zlib.compress(b"\x00\x00\x00\x00\x00\x00\x00\x00"))
        + m._png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="PLTE"):
        m.png_pixels(no_plte)
    bad = bytearray(m.png_bytes(3, 2, lambda x, y: (1, 2, 3)))
    bad[20] ^= 0xFF  # corrupt IHDR body -> CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        m.parse_png(bytes(bad))
    with _pytest.raises(ValueError):
        m.png_pixels(m.png_bytes(3, 2, lambda x, y: (1, 2, 3))[:30])


def test_png_in_dispatch_and_envelope(spark):
    # decode_image dispatch + loader envelope + image_resize operator all
    # accept PNG now
    png = m.png_bytes(4, 4, lambda x, y: (100, 50, 25))
    assert m.is_image_magic(png)
    assert m.decode_image(png)[0][0] == (100, 50, 25)

    from cognee_graphdb_spark.sources.ingest import decode_row

    assert decode_row("image_loader", png) == "[image 4x4 mean_rgb=(100, 50, 25)]"

    from cognee_graphdb_spark.operators.multimodal import image_resize

    media = spark.createDataFrame(
        [("p1", m.synth_png_for_id(3))], "media_id string, content binary"
    )
    [row] = image_resize(media, target_width=2, target_height=2).collect()
    assert (row["width"], row["height"]) == (15, 10)
    # red_sum matches the synth formula under the floor mapping
    expect = sum(
        (3 + 5 * (tx * 15 // 2) + 11 * (ty * 10 // 2)) % 256 for tx in range(2) for ty in range(2)
    )
    assert row["red_sum"] == expect


# -- GIF (87a/89a 1-frame, stdlib LZW) ---------------------------------------


def test_gif_roundtrip_lzw():
    f = lambda x, y: ((5 + 5 * x + 11 * y) % 256, 0, 0)  # noqa: E731
    data = m.gif_bytes(13, 10, f)
    assert data[:6] == b"GIF89a"
    assert m.parse_gif(data) == (13, 10)
    assert m.gif_pixels(data) == [[f(x, y) for x in range(13)] for y in range(10)]


def test_gif_lzw_code_width_growth_and_table_reset():
    # enough distinct phrases to push the LZW table past successive width
    # bumps and through a 4096-entry reset
    import random

    rng = random.Random(7)
    vals = [[(rng.randrange(256), 0, 0) for _ in range(200)] for _ in range(120)]
    data = m.gif_bytes(200, 120, lambda x, y: vals[y][x])
    assert m.gif_pixels(data) == vals


def test_gif_extension_blocks_skipped():
    data = m.gif_bytes(3, 2, lambda x, y: (x * 10 + y, 0, 0))
    # splice a graphic-control extension between the GCT and the image
    head = 13 + 768
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    spliced = data[:head] + gce + data[head:]
    assert m.gif_pixels(spliced) == m.gif_pixels(data)


def test_gif_errors_are_honest():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a GIF"):
        m.gif_pixels(b"NOTGIF" + b"\x00" * 20)
    with _pytest.raises(ValueError, match="truncated"):
        m.parse_gif(b"GIF89a\x01")
    with _pytest.raises(ValueError, match="256 distinct"):
        m.gif_bytes(32, 32, lambda x, y: (x * 8, y * 8, 0))


def test_bmp_32bpp_bgra_decodes_alpha_dropped():
    import struct as _struct

    import numpy as np

    w, h = 3, 2
    row_size = w * 4  # already 4-byte aligned
    header = _struct.pack("<2sIHHI", b"BM", 14 + 40 + row_size * h, 0, 0, 14 + 40)
    info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, row_size * h, 2835, 2835, 0, 0)
    px = lambda x, y: (x * 10, y * 20, x + y, 200)  # (r, g, b, a)
    body = b"".join(
        bytes((px(x, y)[2], px(x, y)[1], px(x, y)[0], px(x, y)[3]))
        for y in range(h - 1, -1, -1)
        for x in range(w)
    )
    arr = m.bmp_pixels_np(header + info + body)
    assert arr.shape == (2, 3, 3)
    assert tuple(arr[1, 2]) == (20, 20, 3)  # (r, g, b) of (x=2, y=1), alpha gone


def test_wav_24bit_samples_and_rms():
    import struct as _struct

    vals = [0, 1, -1, 8388607, -8388608, 123456, -654321]
    pcm = b"".join(_struct.pack("<i", v)[:3] for v in vals)
    data = m.wav_bytes(pcm, sample_rate=1000, sample_width=3)
    assert m.wav_samples(data) == vals
    expect = (sum(v * v for v in vals) / len(vals)) ** 0.5 / 8388608.0
    assert m.wav_rms(data) == pytest.approx(expect, rel=1e-12)


def test_wav_rms_loud_24bit_no_overflow():
    """Regression: ~4.5s of loud 24-bit audio overflows an int64 sum of
    squares (200k samples at 8e6 amplitude wraps negative → complex sqrt)."""
    import struct as _struct

    vals = [8_000_000 if i % 2 == 0 else -8_000_000 for i in range(200_000)]
    pcm = b"".join(_struct.pack("<i", v)[:3] for v in vals)
    data = m.wav_bytes(pcm, sample_rate=44_100, sample_width=3)
    got = m.wav_rms(data)
    assert got == pytest.approx(8_000_000 / 8_388_608.0, rel=1e-9)


def test_bmp_bitfields_nonstandard_masks_rejected():
    """BI_BITFIELDS with RGBA-order masks must raise, not silently decode
    with red/blue swapped; BGRA-masked files decode normally."""
    import struct as _struct

    def v4_bmp(masks):
        w, h = 2, 1
        px = bytes((1, 2, 3, 255, 4, 5, 6, 255))  # two BGRA pixels
        header = _struct.pack("<2sIHHI", b"BM", 14 + 108 + len(px), 0, 0, 14 + 108)
        info = _struct.pack(
            "<IiiHHIIiiII", 108, w, h, 1, 32, 3, len(px), 2835, 2835, 0, 0
        ) + _struct.pack("<IIII", *masks, 0xFF000000) + b"\x00" * (108 - 40 - 16)
        return header + info + px

    ok = v4_bmp((0x00FF0000, 0x0000FF00, 0x000000FF))
    arr = m.bmp_pixels_np(ok)
    assert tuple(arr[0, 0]) == (3, 2, 1)
    with pytest.raises(ValueError, match="masks"):
        m.bmp_pixels_np(v4_bmp((0x000000FF, 0x0000FF00, 0x00FF0000)))


def test_gif_interlaced_roundtrip():
    """Interlaced frames store rows in the 4-pass order; decode must map
    them back so the pixels equal the non-interlaced encode."""
    for w, h in [(3, 2), (14, 9), (8, 16), (5, 1)]:
        fn = lambda x, y: ((x * 7 + y * 13) % 256, 0, 0)
        assert m.gif_pixels(m.gif_bytes(w, h, fn, interlace=True)) == m.gif_pixels(
            m.gif_bytes(w, h, fn)
        )


def test_png_adam7_interlaced_equals_sequential():
    import numpy as np

    def fn(x, y):
        return ((x * 7 + y * 3) % 256, (x * 5 + y * 11) % 256, (x + y) % 256)

    for w, h in [(1, 1), (3, 2), (8, 8), (13, 9), (17, 5)]:
        a = m.png_pixels_np(m.png_bytes(w, h, fn))
        b = m.png_pixels_np(m.png_bytes(w, h, fn, interlace=True))
        assert np.array_equal(a, b), (w, h)


def test_png_gray_all_depths():
    """Gray samples scale by 255/(2^depth - 1) per spec, all packed depths."""
    for depth in (1, 2, 4, 8):
        mx = (1 << depth) - 1
        fn = lambda x, y: (x * 3 + y) % (mx + 1)
        data = m.png_gray_bytes(11, 6, fn, depth=depth)
        assert m.parse_png(data) == (11, 6, 1)
        px = m.png_pixels(data)
        for y in range(6):
            for x in range(11):
                v = fn(x, y) * 255 // mx
                assert px[y][x] == (v, v, v), (depth, x, y)


def test_png_palette_all_depths():
    pal = [(10, 20, 30), (200, 0, 50), (0, 255, 1), (7, 7, 7)]
    for depth in (2, 4, 8):
        fn = lambda x, y: (x + 2 * y) % 4
        data = m.png_palette_bytes(9, 5, fn, pal, depth=depth)
        assert m.parse_png(data) == (9, 5, 1)
        px = m.png_pixels(data)
        for y in range(5):
            for x in range(9):
                assert px[y][x] == pal[fn(x, y)], (depth, x, y)
    # out-of-range index is rejected, not wrapped
    import pytest as _pytest

    with _pytest.raises(ValueError, match="palette index"):
        m.png_pixels(m.png_palette_bytes(2, 1, lambda x, y: 7, pal, depth=8))


def test_gif_in_dispatch_and_envelope(spark):
    gif = m.gif_bytes(4, 4, lambda x, y: (100, 50, 25))
    assert m.is_image_magic(gif)
    assert m.decode_image(gif)[0][0] == (100, 50, 25)

    from cognee_graphdb_spark.sources.ingest import EXTENSION_TYPES, decode_row

    assert EXTENSION_TYPES["gif"] == "ImageDocument"
    assert decode_row("image_loader", gif) == "[image 4x4 mean_rgb=(100, 50, 25)]"

    from cognee_graphdb_spark.operators.multimodal import image_resize

    media = spark.createDataFrame(
        [("g1", m.synth_gif_for_id(3))], "media_id string, content binary"
    )
    [row] = image_resize(media, target_width=2, target_height=2).collect()
    assert (row["width"], row["height"]) == (17, 9)
    expect = sum(
        (3 + 7 * (tx * 17 // 2) + 13 * (ty * 9 // 2)) % 256 for tx in range(2) for ty in range(2)
    )
    assert row["red_sum"] == expect


def test_jpeg_gray_block_constant_exact():
    """DC-only blocks with even luma decode bit-exactly through the full
    Huffman + dequant + IDCT path (the property the driver oracle relies
    on, sources/jpeg.py)."""
    from cognee_graphdb_spark.sources.jpeg import jpeg_bytes, jpeg_pixels, parse_jpeg

    for did in (0, 7, 42):
        w, h = 8 * (3 + did % 3), 16
        gray = lambda x, y: 2 * ((did * 5 + 3 * (x // 8) + 7 * (y // 8)) % 128)
        data = jpeg_bytes(w, h, lambda x, y: (gray(x, y),) * 3, gray=True)
        assert parse_jpeg(data) == (w, h, 1)
        px = jpeg_pixels(data)
        assert all(
            px[y][x] == (gray(x, y),) * 3 for y in range(h) for x in range(w)
        )


def test_jpeg_color_roundtrip_tolerance():
    """4:4:4 and 4:2:0 color with restart markers: lossy round-trip stays
    within quantization tolerance on a smooth gradient."""
    from cognee_graphdb_spark.sources.jpeg import jpeg_bytes, jpeg_pixels, parse_jpeg

    w, h = 37, 23  # non-multiple-of-8 dims exercise edge-block crop
    grad = lambda x, y: ((x * 6) % 256, (y * 9) % 256, (x * 3 + y * 4) % 256)
    for kw, tol in (
        ({}, 14),
        ({"subsample": True}, 40),
        ({"restart_interval": 2}, 14),
        ({"subsample": True, "restart_interval": 1}, 40),
    ):
        data = jpeg_bytes(w, h, grad, **kw)
        assert parse_jpeg(data) == (w, h, 3)
        px = jpeg_pixels(data)
        maxerr = max(
            abs(px[y][x][c] - grad(x, y)[c])
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        assert maxerr <= tol, (kw, maxerr)


def test_jpeg_errors_are_honest():
    import pytest as _pytest

    from cognee_graphdb_spark.sources import jpeg as j

    with _pytest.raises(ValueError, match="SOI"):
        j.jpeg_pixels(b"notajpeg")
    with _pytest.raises(ValueError, match="truncated"):
        j.parse_jpeg(b"\xff\xd8\xff\xe0\x00\x04ab")
    # a baseline stream mislabeled SOF2 is an INVALID progressive file (its
    # single scan is (0, 63), but progressive DC scans must have Se=0) —
    # rejected, not mis-decoded
    data = bytearray(j.jpeg_bytes(8, 8, lambda x, y: (4, 4, 4), gray=True))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with _pytest.raises(ValueError, match="DC-only"):
        j.jpeg_pixels(bytes(data))
    # SOF markers outside {C0, C1, C2} (lossless, arithmetic, hierarchical)
    # stay honestly rejected
    data[sof + 1] = 0xC3
    with _pytest.raises(ValueError, match="progressive"):
        j.jpeg_pixels(bytes(data))
    with _pytest.raises(ValueError, match="progressive"):
        j.parse_jpeg(bytes(data))
    # truncated entropy stream
    good = j.jpeg_bytes(24, 16, lambda x, y: (100, 3, 7))
    with _pytest.raises(ValueError):
        j.jpeg_pixels(good[:-20])


def test_jpeg_progressive_decode_equals_baseline():
    """Progressive (SOF2) re-encodes the SAME quantized coefficients
    losslessly, so its decode must equal the baseline decode of the same
    pixels bit-for-bit — a cross-check that the spectral-selection,
    successive-approximation, EOBRUN and correction-bit paths all land the
    exact coefficient array (T.81 G.1/G.2)."""
    import numpy as np

    from cognee_graphdb_spark.sources import jpeg as j

    def grad(x, y):
        return ((x * 17 + y * 3) % 256, (x * 5 + y * 29) % 256, (x * 11 + y * 7) % 256)

    for w, h, kw in [
        (24, 16, {}),
        (13, 9, {}),  # partial-edge blocks
        (20, 12, {"subsample": True}),  # 4:2:0: AC scans walk the ACTUAL grid
        (31, 17, {"gray": True}),
        (33, 18, {"subsample": True}),
    ]:
        base = j.jpeg_pixels_np(j.jpeg_bytes(w, h, grad, **kw))
        prog_bytes = j.jpeg_progressive_bytes(w, h, grad, **kw)
        assert j.parse_jpeg(prog_bytes) == (w, h, 1 if kw.get("gray") else 3)
        assert np.array_equal(base, j.jpeg_pixels_np(prog_bytes)), (w, h, kw)


def test_jpeg_progressive_sparse_blocks_exercise_eobrun():
    """Mostly-empty images produce long EOB runs (the EOBn > EOB0 symbols)
    plus refinement correction bits riding on them — decode must still be
    bit-identical to baseline."""
    import numpy as np

    from cognee_graphdb_spark.sources import jpeg as j

    def sparse(x, y):  # flat background, a few isolated features
        v = 200 if (x, y) in ((3, 3), (40, 10), (70, 20)) else 32
        return (v, v, v)

    base = j.jpeg_pixels_np(j.jpeg_bytes(80, 24, sparse, gray=True))
    prog = j.jpeg_pixels_np(j.jpeg_progressive_bytes(80, 24, sparse, gray=True))
    assert np.array_equal(base, prog)


def test_jpeg_progressive_truncated_is_honest():
    import pytest as _pytest

    from cognee_graphdb_spark.sources import jpeg as j

    good = j.jpeg_progressive_bytes(24, 16, lambda x, y: (100, 3, 7))
    with _pytest.raises(ValueError):
        j.jpeg_pixels(good[:40])


def test_jpeg_in_dispatch_and_envelope(spark):
    from cognee_graphdb_spark.sources.jpeg import jpeg_bytes

    blob = jpeg_bytes(8, 8, lambda x, y: (100, 100, 100), gray=True)
    assert m.is_image_magic(blob)
    assert m.decode_image(blob)[0][0] == (100, 100, 100)

    from cognee_graphdb_spark.sources.ingest import EXTENSION_TYPES, decode_row

    assert EXTENSION_TYPES["jpg"] == "ImageDocument"
    assert decode_row("image_loader", blob) == "[image 8x8 mean_rgb=(100, 100, 100)]"

    from cognee_graphdb_spark.operators.multimodal import image_resize

    media = spark.createDataFrame(
        [("j1", m.synth_jpeg_for_id(3))], "media_id string, content binary"
    )
    [row] = image_resize(media, target_width=4, target_height=3).collect()
    assert (row["width"], row["height"]) == (24, 16)
    expect = sum(
        2 * ((3 * 5 + 3 * ((tx * 24 // 4) // 8) + 7 * ((ty * 16 // 3) // 8)) % 128)
        for tx in range(4)
        for ty in range(3)
    )
    assert row["red_sum"] == expect


def test_jpeg_fill_bytes_between_segments():
    """T.81 B.1.1.2 allows 0xFF fill padding before any marker: parsing and
    decoding must skip consecutive 0xFFs in the segment walk, and the
    trailing skip must not stop on a fill byte (r7 ADVICE finding)."""
    from cognee_graphdb_spark.sources.jpeg import jpeg_bytes, jpeg_pixels, parse_jpeg

    plain = jpeg_bytes(16, 8, lambda x, y: (90, 40, 200))
    # fill bytes right after SOI, and before the trailing EOI
    assert plain[-2:] == b"\xff\xd9"
    padded = plain[:2] + b"\xff\xff\xff" + plain[2:-2] + b"\xff\xff" + plain[-2:]
    assert parse_jpeg(padded) == parse_jpeg(plain)
    assert jpeg_pixels(padded) == jpeg_pixels(plain)


def test_llm_media_loader_compressed_av():
    """MP3/MP4 route through create_transcript fed by the container-level
    features (sources/container.py) — the reference sends compressed media
    to transcription WITHOUT local decode (core/audio_loader.py:18), so the
    frame-walk/box-tree envelope is the decoded stand-in."""
    from cognee_graphdb_spark.llm.gateway import MockLLMGateway
    from cognee_graphdb_spark.sources.container import mp3_bytes, mp4_bytes

    from cognee_graphdb_spark.sources.ingest import decode_row

    gw = MockLLMGateway()
    mp3 = mp3_bytes(5, channels=2)  # 5 frames @44100, 128 kbps -> 130 ms
    assert decode_row("audio_loader", mp3, gateway=gw) == (
        "audio transcript: 2 channel 44100 hz 130 ms 128 kbps 5 frames"
    )
    mp4 = mp4_bytes(2000, width=32, height=18)
    assert decode_row("video_loader", mp4, gateway=gw) == (
        "video transcript: 32x18 pixels 2000 ms codecs avc1+mp4a"
    )
    # undecodable video keeps the content-addressed stand-in
    assert decode_row("video_loader", b"junk", gateway=gw).startswith("[video_loader:")
