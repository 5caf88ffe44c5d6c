"""Compressed audio/video container metadata — MP3 frame walk, MP4 box walk.

The reference's loaders hand mp3/mp4 blobs straight to LLM transcription
(infrastructure/loaders/core/audio_loader.py:18) and never look inside the
container.  A corpus pipeline needs the TYPED METADATA — duration, sample
rate, channels, dimensions, codec — without decoding a single sample, and
both container formats are public specs parseable with struct alone:

- MP3 (ISO/IEC 11172-3 / 13818-3): walk the frame headers.  Every frame
  starts with an 11-bit sync word and encodes version/layer/bitrate/
  samplerate/padding; frame byte length and samples-per-frame follow from
  those, so summing frames gives the exact duration (VBR included) with no
  Huffman work.  ID3v2 (syncsafe-sized) and ID3v1 tags are skipped.
- MP4 (ISO/IEC 14496-12 ISO BMFF): walk the size/type box tree to mvhd
  (timescale + duration), tkhd (track dimensions, 16.16 fixed point),
  hdlr (vide/soun handlers) and stsd (sample-entry fourcc = codec).

The SAMPLE DATA stays honestly undecodable here (no ffmpeg in this
container) — these parsers power ingest envelopes and the media_info
operator, not playback.  Builders (`mp3_bytes`, `mp4_bytes`) exist so
tests and driver oracles can synthesize deterministic fixtures, same
pattern as png_bytes/gif_bytes in sources/media.py.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

# MPEG audio bitrate tables (kbps), Layer III; index 0 is "free" and 15 is
# invalid (ISO 11172-3 table B.2 / 13818-3).
_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_SAMPLE_RATES = {
    3: [44100, 48000, 32000],  # MPEG1
    2: [22050, 24000, 16000],  # MPEG2
    0: [11025, 12000, 8000],  # MPEG2.5
}


@dataclass
class Mp3Info:
    channels: int
    sample_rate: int
    duration_ms: int
    frames: int
    bitrate_kbps: int  # average over frames (integer), VBR-aware
    vbr: bool


@dataclass
class Mp4Info:
    duration_ms: int
    width: int
    height: int
    handlers: list[str]  # e.g. ["vide", "soun"]
    codecs: list[str]  # sample-entry fourccs, e.g. ["avc1", "mp4a"]


def _mp3_frame(data: bytes, pos: int) -> tuple[int, int, int, int, int] | None:
    """Parse one frame header at pos; (frame_len, samples, sample_rate,
    bitrate_kbps, channels) or None if not a valid Layer III header."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b1 >> 1) & 0x03  # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (b2 >> 1) & 0x01
    mode = (b3 >> 6) & 0x03
    sample_rate = _SAMPLE_RATES[version][sr_idx]
    bitrate = (_BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3)[br_idx]
    samples = 1152 if version == 3 else 576
    frame_len = samples // 8 * bitrate * 1000 // sample_rate + padding
    channels = 1 if mode == 3 else 2
    return frame_len, samples, sample_rate, bitrate, channels


def parse_mp3(data: bytes) -> Mp3Info:
    """Frame-header walk over the whole blob: exact duration (CBR and VBR),
    channels, sample rate, average bitrate.  ValueError when the blob has
    no parseable MPEG Layer III frame sequence."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = 0
        for b in data[6:10]:  # syncsafe 28-bit
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    end = len(data)
    if data[-128:-125] == b"TAG":
        end = len(data) - 128

    frames = 0
    total_samples = 0
    total_bits = 0
    sample_rate = channels = 0
    bitrates = set()
    while pos + 4 <= end:
        parsed = _mp3_frame(data, pos)
        if parsed is None:
            if frames == 0:
                pos += 1  # resync: scan for the first frame
                continue
            break  # trailing garbage after a valid run: stop
        frame_len, samples, sr, br, ch = parsed
        if frames == 0:
            sample_rate, channels = sr, ch
        elif sr != sample_rate:
            break  # sample-rate change = not a continuation of this stream
        frames += 1
        total_samples += samples
        total_bits += br * 1000 * samples // sr
        bitrates.add(br)
        pos += frame_len
    if frames == 0:
        raise ValueError("no MPEG Layer III frames found")
    duration_ms = total_samples * 1000 // sample_rate
    avg_kbps = total_bits // max(1, duration_ms)  # bits/ms == kbps
    return Mp3Info(channels, sample_rate, duration_ms, frames, avg_kbps, len(bitrates) > 1)


def mp3_bytes(
    n_frames: int,
    sample_rate: int = 44100,
    bitrate_kbps: int = 128,
    channels: int = 2,
    id3_payload: bytes = b"",
) -> bytes:
    """Build a syntactically valid MPEG1 Layer III stream: real headers,
    zeroed audio payload (the header walk never reads it).  Fixture-side
    counterpart of :func:`parse_mp3`."""
    sr_idx = _SAMPLE_RATES[3].index(sample_rate)
    br_idx = _BITRATES_V1_L3.index(bitrate_kbps)
    mode = 3 if channels == 1 else 0
    header = bytes(
        [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), mode << 6]  # MPEG1 L3, no padding
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = header + b"\x00" * (frame_len - 4)
    out = bytearray()
    if id3_payload:
        size = len(id3_payload)
        syncsafe = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + syncsafe + id3_payload
    out += frame * n_frames
    return bytes(out)


# --------------------------------------------------------------------------
# MP4 / ISO BMFF
# --------------------------------------------------------------------------


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the sibling boxes in a range."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("MP4 largesize box truncated")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("MP4 box size out of bounds")
        yield btype, body, pos + size
        pos += size


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def parse_mp4(data: bytes) -> Mp4Info:
    """Box-tree walk to mvhd/tkhd/hdlr/stsd.  ValueError when the blob is
    not an ISO BMFF file with a movie header."""
    if len(data) < 12 or data[4:8] not in (b"ftyp", b"moov", b"styp"):
        raise ValueError("not an ISO BMFF (MP4) file")
    duration_ms = -1
    width = height = 0
    handlers: list[str] = []
    codecs: list[str] = []

    def walk(start: int, end: int) -> None:
        nonlocal duration_ms, width, height
        for btype, s, e in _boxes(data, start, end):
            if btype in _CONTAINERS:
                walk(s, e)
            elif btype == b"mvhd":
                version = data[s]
                if version == 1:
                    timescale = struct.unpack(">I", data[s + 20 : s + 24])[0]
                    duration = struct.unpack(">Q", data[s + 24 : s + 32])[0]
                else:
                    timescale = struct.unpack(">I", data[s + 12 : s + 16])[0]
                    duration = struct.unpack(">I", data[s + 16 : s + 20])[0]
                if timescale:
                    duration_ms = duration * 1000 // timescale
            elif btype == b"tkhd":
                w = struct.unpack(">I", data[e - 8 : e - 4])[0] >> 16
                h = struct.unpack(">I", data[e - 4 : e])[0] >> 16
                if w and h:  # audio tracks carry 0x0
                    width, height = max(width, w), max(height, h)
            elif btype == b"hdlr":
                handlers.append(data[s + 8 : s + 12].decode("latin1"))
            elif btype == b"stsd":
                count = struct.unpack(">I", data[s + 4 : s + 8])[0]
                p = s + 8
                for _ in range(count):
                    if p + 8 > e:
                        break
                    entry_size = struct.unpack(">I", data[p : p + 4])[0]
                    codecs.append(data[p + 4 : p + 8].decode("latin1"))
                    p += max(8, entry_size)

    walk(0, len(data))
    if duration_ms < 0:
        raise ValueError("MP4 has no movie header (mvhd)")
    return Mp4Info(duration_ms, width, height, handlers, codecs)


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def mp4_bytes(
    duration_ms: int,
    width: int = 0,
    height: int = 0,
    video_codec: str = "avc1",
    audio_codec: str = "mp4a",
) -> bytes:
    """Build a minimal ISO BMFF tree (ftyp + moov with one video and one
    audio track + a stub mdat) carrying the given metadata — the payload is
    fake, the box structure is real."""
    timescale = 1000
    mvhd = b"\x00\x00\x00\x00" + struct.pack(
        ">IIII", 0, 0, timescale, duration_ms
    ) + b"\x00" * 80

    def _trak(handler: str, codec: str, w: int, h: int) -> bytes:
        tkhd = (
            b"\x00\x00\x00\x07"
            + struct.pack(">IIIII", 0, 0, 1, 0, duration_ms)
            + b"\x00" * 52
            + struct.pack(">II", w << 16, h << 16)
        )
        hdlr = b"\x00\x00\x00\x00" + b"\x00" * 4 + handler.encode() + b"\x00" * 13
        entry = struct.pack(">I", 16) + codec.encode("latin1") + b"\x00" * 8
        stsd = b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry
        stbl = _box(b"stsd", stsd)
        minf = _box(b"stbl", stbl)
        mdia = _box(b"hdlr", hdlr) + _box(b"minf", minf)
        return _box(b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia))

    moov = _box(b"mvhd", mvhd)
    moov += _trak("vide", video_codec, width, height)
    moov += _trak("soun", audio_codec, 0, 0)
    return (
        _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + _box(b"moov", moov)
        + _box(b"mdat", b"\x00" * 16)
    )


# ---------------------------------------------------------------------------
# Deterministic per-id fixtures, same discipline as synth_wav_for_id and
# friends in sources/media.py: ONE Python definition of the formulas the
# driver's DuckDB oracle (mm_media_info) restates analytically.
# ---------------------------------------------------------------------------


def synth_mp3_for_id(did: int) -> bytes:
    """MPEG1 Layer III, 5 + did%7 frames @44100 Hz 128 kbps,
    1 + did%2 channels -> duration_ms = (5 + did%7) * 1152 * 1000 // 44100."""
    return mp3_bytes(5 + did % 7, channels=1 + did % 2)


def synth_mp4_for_id(did: int) -> bytes:
    """ISO BMFF: duration 1000 + (did*37)%5000 ms, dims
    16*(1 + did%10) x 9*(1 + did%10), avc1 video + mp4a audio tracks."""
    side = 1 + did % 10
    return mp4_bytes(1000 + (did * 37) % 5000, width=16 * side, height=9 * side)
