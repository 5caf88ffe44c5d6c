"""MP3 frame-walk / MP4 box-walk metadata parsers (sources/container.py)
and the media_info sniffing operator (operators/multimodal.py)."""

import pytest

from cognee_graphdb_spark.sources.container import (
    Mp3Info,
    mp3_bytes,
    mp4_bytes,
    parse_mp3,
    parse_mp4,
    synth_mp3_for_id,
    synth_mp4_for_id,
)


def test_mp3_cbr_duration_exact():
    info = parse_mp3(mp3_bytes(10))
    assert info == Mp3Info(
        channels=2,
        sample_rate=44100,
        duration_ms=10 * 1152 * 1000 // 44100,
        frames=10,
        bitrate_kbps=128,
        vbr=False,
    )


def test_mp3_id3_tags_and_resync():
    # ID3v2 prefix is skipped via its syncsafe size
    info = parse_mp3(mp3_bytes(7, sample_rate=32000, bitrate_kbps=64, channels=1, id3_payload=b"x" * 300))
    assert (info.frames, info.channels, info.sample_rate) == (7, 1, 32000)
    # leading garbage: scan to the first sync word
    assert parse_mp3(b"\x00garbage" + mp3_bytes(3)).frames == 3
    # trailing ID3v1 "TAG" block is excluded from the walk
    assert parse_mp3(mp3_bytes(4) + b"TAG" + b"\x00" * 125).frames == 4


def test_mp3_vbr_average():
    data = mp3_bytes(5, bitrate_kbps=128) + mp3_bytes(5, bitrate_kbps=64)
    info = parse_mp3(data)
    assert info.frames == 10 and info.vbr
    assert 64 < info.bitrate_kbps < 128


def test_mp3_rejects_non_audio():
    with pytest.raises(ValueError, match="Layer III"):
        parse_mp3(b"definitely not audio")
    with pytest.raises(ValueError, match="Layer III"):
        parse_mp3(b"")


def test_mp4_roundtrip_and_errors():
    info = parse_mp4(mp4_bytes(5400, width=1920, height=1080))
    assert info.duration_ms == 5400
    assert (info.width, info.height) == (1920, 1080)
    assert info.handlers == ["vide", "soun"]
    assert info.codecs == ["avc1", "mp4a"]
    with pytest.raises(ValueError, match="ISO BMFF"):
        parse_mp4(b"RIFF1234WAVEdata")
    with pytest.raises(ValueError, match="out of bounds"):
        parse_mp4(mp4_bytes(100)[:40] + b"\xff\xff\xff\xffmoov")


def test_ingest_envelopes_mp3_mp4():
    from cognee_graphdb_spark.sources.ingest import decode_row

    env = decode_row("audio_loader", mp3_bytes(10))
    assert env == "[audio 2ch 44100Hz 261ms 128kbps mp3]"
    env = decode_row("video_loader", mp4_bytes(2500, width=640, height=360))
    assert env == "[video 640x360 2500ms avc1]"
    # malformed blobs keep the content-addressed stand-in
    assert decode_row("video_loader", b"junk").startswith("[video_loader:")
    assert decode_row("audio_loader", b"junk").startswith("[audio_loader:")


def test_media_info_operator(spark):
    from cognee_graphdb_spark.operators.multimodal import media_info
    from cognee_graphdb_spark.sources.media import synth_png_for_id, synth_wav_for_id

    rows = [
        ("a", synth_mp3_for_id(3)),
        ("v", synth_mp4_for_id(3)),
        ("w", synth_wav_for_id(3)),
        ("i", synth_png_for_id(3)),
        ("x", b"\x00\x01opaque blob"),
        ("m", b"\xff\xe0 mp3 magic but malformed"),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    out = {r["media_id"]: r for r in media_info(df).collect()}
    assert out["a"]["kind"] == "audio" and out["a"]["codec"] == "mp3"
    assert out["a"]["duration_ms"] == (5 + 3 % 7) * 1152 * 1000 // 44100
    assert out["a"]["channels"] == 1 + 3 % 2
    assert out["v"]["kind"] == "video" and out["v"]["codec"] == "avc1"
    assert (out["v"]["width"], out["v"]["height"]) == (64, 36)
    assert out["w"]["kind"] == "audio" and out["w"]["codec"] == "pcm"
    assert out["w"]["sample_rate"] == 1000
    assert out["i"]["kind"] == "image" and out["i"]["codec"] == "png"
    assert (out["i"]["width"], out["i"]["height"]) == (15, 10)
    assert out["x"]["kind"] == "opaque" and out["x"]["codec"] is None
    assert out["m"]["kind"] == "opaque"
