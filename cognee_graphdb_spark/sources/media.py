"""Deterministic WAV / BMP / PPM / PNG codecs (public-spec parsers, stdlib only).

Mirrors the :mod:`cognee_graphdb_spark.sources.pdf` approach: the reference
routes audio/image through LLM loaders (transcript / description —
cognee/infrastructure/loaders/core/audio_loader.py:18, image_loader.py:15;
dispatch LoaderEngine.py:25-96), so the [LLM] half stays behind the gateway —
but the BINARY half (RIFF/WAVE chunks, BITMAPINFOHEADER pixel rows, PPM P6,
PNG IHDR/IDAT with zlib inflate + filter undo) is fully specified by public
formats and decodes deterministically here, feeding the multimodal operators
real bytes instead of md5 stand-ins.

Scale note: these run INSIDE Arrow-batched mapInPandas stages — pure
per-blob Python with no shared state, so they parallelize per partition
like any other decode UDF.  Synthesis helpers (``wav_bytes`` /
``bmp_bytes``) exist so tests and driver oracles can round-trip encode →
decode against an analytically predictable pixel/sample function.
"""

from __future__ import annotations

import io
import struct
import wave
from dataclasses import dataclass

import numpy as np


def _rows_from_np(arr) -> list[list[tuple[int, int, int]]]:
    """(h, w, 3) array -> the legacy list-of-tuple-rows API."""
    return [[tuple(int(v) for v in p) for p in row] for row in arr]

# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE PCM) — stdlib `wave`
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WavInfo:
    channels: int
    sample_rate: int
    sample_width: int  # bytes per sample
    n_frames: int

    @property
    def duration_ms(self) -> int:
        return int(self.n_frames * 1000 // self.sample_rate)


def wav_bytes(pcm: bytes, sample_rate: int = 1000, channels: int = 1, sample_width: int = 1) -> bytes:
    """Encode raw PCM frames as a WAV container (synthesis for fixtures)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate)
        w.writeframes(pcm)
    return buf.getvalue()


def parse_wav(data: bytes) -> WavInfo:
    """Header-only parse: channels / rate / width / frame count."""
    with wave.open(io.BytesIO(data), "rb") as w:
        return WavInfo(w.getnchannels(), w.getframerate(), w.getsampwidth(), w.getnframes())


def wav_samples_np(data: bytes) -> np.ndarray:
    """First-channel sample values as an int array: unsigned for 8-bit (WAV
    stores 8-bit PCM unsigned), signed little-endian for 16-bit."""
    with wave.open(io.BytesIO(data), "rb") as w:
        info = WavInfo(w.getnchannels(), w.getframerate(), w.getsampwidth(), w.getnframes())
        raw = w.readframes(info.n_frames)
    if info.sample_width == 1:
        arr = np.frombuffer(raw, dtype=np.uint8)
    elif info.sample_width == 2:
        arr = np.frombuffer(raw, dtype="<i2")
    else:
        raise ValueError(f"unsupported sample width {info.sample_width}")
    return arr[:: info.channels].astype(np.int64)


def wav_samples(data: bytes) -> list[int]:
    """List API over :func:`wav_samples_np`."""
    return wav_samples_np(data).tolist()


def wav_sample_at_offsets(data: bytes, every_ms: int) -> list[tuple[int, int]]:
    """(offset_ms, amplitude) at each every_ms step — the audio analogue of
    video frame sampling, on REAL decoded PCM."""
    info = parse_wav(data)
    samples = wav_samples_np(data)
    offs = np.arange(0, info.duration_ms, every_ms)
    idx = offs * info.sample_rate // 1000
    keep = idx < len(samples)
    return [(int(o), int(s)) for o, s in zip(offs[keep], samples[idx[keep]])]


def wav_rms(data: bytes) -> float:
    """Root-mean-square amplitude of the first channel, normalized to [0,1].

    Integer sums are exact (int64 accumulator), so the doubles that follow
    are bit-identical to the scalar formulation the oracles restate."""
    info = parse_wav(data)
    samples = wav_samples_np(data)
    if samples.size == 0:
        return 0.0
    full = 255.0 if info.sample_width == 1 else 32768.0
    centered = samples - 128 if info.sample_width == 1 else samples
    return float((int(np.dot(centered, centered)) / samples.size) ** 0.5 / full)


# ---------------------------------------------------------------------------
# BMP (24-bpp uncompressed, BITMAPINFOHEADER) + PPM (P6)
# ---------------------------------------------------------------------------


def bmp_bytes(width: int, height: int, pixel_fn) -> bytes:
    """Encode ``pixel_fn(x, y) -> (r, g, b)`` (y=0 is the TOP row) as a
    24-bpp bottom-up BMP with 4-byte row padding — the baseline layout every
    decoder must handle."""
    row_size = (width * 3 + 3) & ~3
    pixel_bytes = row_size * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            row += bytes((b & 255, g & 255, r & 255))  # BGR order
        row += b"\x00" * (row_size - len(row))
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def parse_bmp(data: bytes) -> tuple[int, int, int]:
    """(width, height, bits_per_pixel); raises ValueError for non-BMP."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    return width, abs(height), bpp


def bmp_pixels_np(data: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB, rows TOP-DOWN; 24-bpp uncompressed only (the
    baseline every writer emits), honoring negative-height top-down files.
    One frombuffer + reshape + channel flip — no per-pixel Python."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={compression}")
    top_down = height < 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    arr = np.frombuffer(data, dtype=np.uint8, count=row_size * height, offset=offset)
    arr = arr.reshape(height, row_size)[:, : width * 3].reshape(height, width, 3)[:, :, ::-1]
    return arr if top_down else arr[::-1]


def bmp_pixels(data: bytes) -> list[list[tuple[int, int, int]]]:
    """Legacy list-of-tuple-rows API over :func:`bmp_pixels_np`."""
    return _rows_from_np(bmp_pixels_np(data))


def ppm_bytes(width: int, height: int, pixel_fn) -> bytes:
    """PPM P6 (binary) encoder."""
    body = bytearray()
    for y in range(height):
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            body += bytes((r & 255, g & 255, b & 255))
    return f"P6\n{width} {height}\n255\n".encode() + bytes(body)


def _parse_ppm_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, pixel_data_offset) — tracks the scan position, so a
    dimension containing '255' or a header comment can't confuse the pixel
    offset (the spec: exactly ONE whitespace byte after maxval)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = []
    i = 2
    while len(parts) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment line
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        parts.append(int(data[i:j]))
        i = j
    return parts[0], parts[1], i + 1  # skip the single whitespace after maxval


def parse_ppm(data: bytes) -> tuple[int, int]:
    width, height, _ = _parse_ppm_header(data)
    return width, height


def ppm_pixels_np(data: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB — P6 stores RGB already, one frombuffer."""
    width, height, header_end = _parse_ppm_header(data)
    return np.frombuffer(
        data, dtype=np.uint8, count=width * height * 3, offset=header_end
    ).reshape(height, width, 3)


def ppm_pixels(data: bytes) -> list[list[tuple[int, int, int]]]:
    """Legacy list-of-tuple-rows API over :func:`ppm_pixels_np`."""
    return _rows_from_np(ppm_pixels_np(data))


# ---------------------------------------------------------------------------
# PNG (8-bit RGB/RGBA truecolor, non-interlaced) — public spec, stdlib zlib
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def png_bytes(width: int, height: int, pixel_fn) -> bytes:
    """Encode ``pixel_fn(x, y) -> (r, g, b)`` as an 8-bit truecolor PNG
    (filter 0 rows, one zlib IDAT) — synthesis for fixtures and oracles."""
    import zlib

    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            raw += bytes((r & 255, g & 255, b & 255))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _png_chunks(data: bytes):
    """(type, body) pairs with CRC verification."""
    import zlib

    i = len(_PNG_SIG)
    while i + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, i)
        ctype = data[i + 4 : i + 8]
        if i + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        body = data[i + 8 : i + 8 + length]
        (crc,) = struct.unpack_from(">I", data, i + 8 + length)
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        if ctype == b"IEND":
            return
        i += 12 + length
    raise ValueError("PNG missing IEND")


def parse_png(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels); raises ValueError for non-PNG or outside
    the 8-bit truecolor non-interlaced subset."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    for ctype, body in _png_chunks(data):
        if ctype != b"IHDR":
            raise ValueError("PNG must start with IHDR")
        width, height, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
        if depth != 8 or color not in (2, 6):
            raise ValueError(f"unsupported PNG: depth={depth} colortype={color} (8-bit RGB/RGBA only)")
        if comp != 0 or filt != 0:
            raise ValueError("unsupported PNG compression/filter method")
        if interlace != 0:
            raise ValueError("interlaced PNG not supported")
        return width, height, 3 if color == 2 else 4
    raise ValueError("PNG missing IHDR")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_pixels_np(data: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB — IDAT inflate + per-row filter undo (filters
    0-4: None/Sub/Up/Average/Paeth, the complete public set).  None/Up are
    pure elementwise adds; Sub is a per-lane cumulative sum (mod-256
    addition is linear, so cumsum%256 IS the sequential recurrence); the
    nonlinear Average/Paeth rows keep the scalar spec loop.  RGBA drops
    alpha; anything outside 8-bit truecolor raises ValueError."""
    import zlib

    width, height, channels = parse_png(data)
    idat = b"".join(body for ctype, body in _png_chunks(data) if ctype == b"IDAT")
    raw = zlib.decompress(idat)
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    scan = np.frombuffer(raw, dtype=np.uint8, count=height * (stride + 1)).reshape(
        height, stride + 1
    )
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        ftype = int(scan[r, 0])
        line = scan[r, 1:]
        if ftype == 0:
            recon = line.copy()
        elif ftype == 1:  # Sub: recon[i] = raw[i] + recon[i-ch] == lane cumsum
            recon = (
                np.cumsum(line.reshape(width, channels), axis=0, dtype=np.int64) % 256
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            recon = (line.astype(np.int16) + prior).astype(np.uint8)
        elif ftype in (3, 4):  # Average / Paeth: left-recon recurrence, scalar
            buf = bytearray(line.tobytes())
            pr = prior
            for i in range(stride):
                left = buf[i - channels] if i >= channels else 0
                if ftype == 3:
                    buf[i] = (buf[i] + ((left + int(pr[i])) >> 1)) & 255
                else:
                    up_left = int(pr[i - channels]) if i >= channels else 0
                    buf[i] = (buf[i] + _paeth(left, int(pr[i]), up_left)) & 255
            recon = np.frombuffer(bytes(buf), dtype=np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = recon
        prior = recon
    return out.reshape(height, width, channels)[:, :, :3]


def png_pixels(data: bytes) -> list[list[tuple[int, int, int]]]:
    """Legacy list-of-tuple-rows API over :func:`png_pixels_np`."""
    return _rows_from_np(png_pixels_np(data))


# ---------------------------------------------------------------------------
# GIF (87a/89a, single frame, non-interlaced) — public spec, pure-stdlib LZW
# ---------------------------------------------------------------------------


def _gif_lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW (LSB-first bit packing, CLEAR/END codes, 12-bit cap)."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 255)
            acc >>= 8
            nbits -= 8

    put(clear, width)  # leading CLEAR, per spec recommendation
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: reset, exactly as decoders expect
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        put(table[run], width)
    put(end, width)
    if nbits:
        out.append(acc & 255)
    return bytes(out)


def _gif_lzw_decompress(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated (no END code)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK special case
        else:
            raise ValueError(f"GIF LZW bad code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def gif_bytes(width: int, height: int, pixel_fn) -> bytes:
    """Encode ``pixel_fn(x, y) -> (r, g, b)`` as a single-frame GIF89a with a
    256-entry palette built from the image's distinct colors (<= 256 required)
    — synthesis for fixtures and oracles, same discipline as png_bytes."""
    pixels = [[pixel_fn(x, y) for x in range(width)] for y in range(height)]
    palette: dict[tuple[int, int, int], int] = {}
    for row in pixels:
        for px in row:
            if px not in palette:
                if len(palette) == 256:
                    raise ValueError("gif_bytes supports at most 256 distinct colors")
                palette[px] = len(palette)
    indices = bytes(palette[px] for row in pixels for px in row)
    table = bytearray()
    for (r, g, b), _ in sorted(palette.items(), key=lambda kv: kv[1]):
        table += bytes((r, g, b))
    table += b"\x00" * (768 - len(table))  # pad to 256 entries
    out = bytearray(b"GIF89a")
    # logical screen: global color table flag, 8-bit color, 256-entry table
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += table
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)  # image descriptor
    min_code = 8
    out.append(min_code)
    lzw = _gif_lzw_compress(indices, min_code)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def parse_gif(data: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor; raises ValueError
    for non-GIF input."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    width, height = struct.unpack_from("<HH", data, 6)
    return width, height


def gif_pixels(data: bytes) -> list[list[tuple[int, int, int]]]:
    """Pixel rows top-down as (r, g, b) for the FIRST frame: palette lookup
    over the LZW-decoded index stream.  Interlaced frames raise ValueError
    (honest subset boundary, same policy as the PNG decoder)."""
    width, height = parse_gif(data)
    flags = data[10]
    pos = 13
    gct: bytes | None = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if iflags & 0x40:
            raise ValueError("interlaced GIF not supported")
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = data[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        indices = _gif_lzw_decompress(bytes(lzw), min_code)
        if len(indices) < w * h:
            raise ValueError("GIF pixel data truncated")
        return [
            [
                tuple(pal[3 * indices[y * w + x] : 3 * indices[y * w + x] + 3])
                for x in range(w)
            ]
            for y in range(h)
        ]
    raise ValueError("GIF contains no image frame")


def is_image_magic(data: bytes) -> bool:
    """True when the blob starts like a format :func:`decode_image` handles —
    the ONE sniffing rule for loader dispatch and feature extraction."""
    return (
        data[:2] in (b"BM", b"P6")
        or data.startswith(_PNG_SIG)
        or data[:6] in (b"GIF87a", b"GIF89a")
        or data[:3] == b"\xff\xd8\xff"
    )


def decode_image_np(data: bytes) -> np.ndarray:
    """BMP, PPM, PNG, GIF, or baseline JPEG as an (h, w, 3) uint8 array —
    the vectorized decode path the hot operators consume; ValueError for
    anything else."""
    if data[:2] == b"BM":
        return bmp_pixels_np(data)
    if data[:2] == b"P6":
        return ppm_pixels_np(data)
    if data.startswith(_PNG_SIG):
        return png_pixels_np(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        # palette lookup after the (inherently sequential) LZW decode
        return np.asarray(gif_pixels(data), dtype=np.uint8)
    if data[:3] == b"\xff\xd8\xff":
        from cognee_graphdb_spark.sources.jpeg import jpeg_pixels_np

        return jpeg_pixels_np(data)
    raise ValueError(
        "unsupported image format (BMP 24bpp / PPM P6 / PNG truecolor / GIF / "
        "baseline JPEG supported)"
    )


def decode_image(data: bytes) -> list[list[tuple[int, int, int]]]:
    """Legacy list-of-tuple-rows API over :func:`decode_image_np`."""
    return _rows_from_np(decode_image_np(data))


def resize_nearest(
    pixels: list[list[tuple[int, int, int]]], tw: int, th: int
) -> list[list[tuple[int, int, int]]]:
    """Nearest-neighbor resample with the floor mapping
    ``sx = tx * w // tw`` — integer-exact, so oracles can restate it."""
    h, w = len(pixels), len(pixels[0])
    return [[pixels[ty * h // th][tx * w // tw] for tx in range(tw)] for ty in range(th)]


def resize_nearest_np(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """:func:`resize_nearest` over an (h, w, 3) array — two integer index
    maps, same floor mapping, no Python per pixel."""
    h, w = arr.shape[0], arr.shape[1]
    ys = np.arange(th) * h // th
    xs = np.arange(tw) * w // tw
    return arr[ys[:, None], xs[None, :]]


# ---------------------------------------------------------------------------
# Deterministic per-id fixtures — the ONE Python definition of the synth
# formulas that the driver's DuckDB oracles (mm_wav_decode / mm_bmp_resize)
# restate analytically; bench and the contract queries both call these, so
# the constants can't drift between call sites and oracle SQL.
# ---------------------------------------------------------------------------


def synth_wav_for_id(did: int) -> bytes:
    """8-bit PCM WAV @1000 Hz: sample i = (did*7 + i*3) % 256, with
    200 + did % 100 samples — at 1000 Hz the sample index equals the ms
    offset, which is what makes the oracle restatement exact."""
    n = 200 + did % 100
    return wav_bytes(bytes((did * 7 + i * 3) % 256 for i in range(n)), sample_rate=1000)


def synth_bmp_for_id(did: int) -> bytes:
    """24-bpp BMP (16 + did%8) x 12, red(x, y) = (did + 3x + 7y) % 256 —
    widths not divisible by 4 exercise row padding."""
    return bmp_bytes(16 + did % 8, 12, lambda x, y: ((did + 3 * x + 7 * y) % 256, 0, 0))


def synth_png_for_id(did: int) -> bytes:
    """PNG (12 + did%5) x 10, red(x, y) = (did + 5x + 11y) % 256 — same
    analytic-formula discipline as the BMP/WAV fixtures so the driver oracle
    can restate the decode + resize exactly."""
    return png_bytes(12 + did % 5, 10, lambda x, y: ((did + 5 * x + 11 * y) % 256, 0, 0))


def synth_gif_for_id(did: int) -> bytes:
    """GIF (14 + did%6) x 9, red(x, y) = (did + 7x + 13y) % 256 — same
    analytic-formula discipline; exercises the LZW decode path."""
    return gif_bytes(14 + did % 6, 9, lambda x, y: ((did + 7 * x + 13 * y) % 256, 0, 0))


def synth_jpeg_for_id(did: int) -> bytes:
    """Grayscale baseline JPEG, (24 + 8*(did%3)) x 16, block-constant luma
    gray(x, y) = 2*((did*5 + 3*(x//8) + 7*(y//8)) % 128).  JPEG is lossy in
    general, but an 8x8-constant block with an EVEN level is DC-only and the
    Annex K DC quantizer (16) divides 8*(gray-128) exactly, so the full
    Huffman + dequant + IDCT decode reproduces every pixel bit-exactly —
    which is what lets the driver's DuckDB oracle restate the decode +
    resize analytically despite the lossy format."""
    from cognee_graphdb_spark.sources.jpeg import jpeg_bytes

    return jpeg_bytes(
        24 + 8 * (did % 3),
        16,
        lambda x, y: (2 * ((did * 5 + 3 * (x // 8) + 7 * (y // 8)) % 128),) * 3,
        gray=True,
    )


def synth_jpeg_progressive_for_id(did: int) -> bytes:
    """The same pixel formula as :func:`synth_jpeg_for_id` encoded as a
    PROGRESSIVE (SOF2) JPEG — progressive re-encodes the identical quantized
    coefficients losslessly, so the decoded pixels (and therefore the DuckDB
    oracle restatement) are byte-for-byte those of the baseline fixture."""
    from cognee_graphdb_spark.sources.jpeg import jpeg_progressive_bytes

    return jpeg_progressive_bytes(
        24 + 8 * (did % 3),
        16,
        lambda x, y: (2 * ((did * 5 + 3 * (x // 8) + 7 * (y // 8)) % 128),) * 3,
        gray=True,
    )
