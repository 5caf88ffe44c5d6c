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
    stores 8-bit PCM unsigned), signed little-endian for 16- and 24-bit."""
    with wave.open(io.BytesIO(data), "rb") as w:
        info = WavInfo(w.getnchannels(), w.getframerate(), w.getsampwidth(), w.getnframes())
        raw = w.readframes(info.n_frames)
    if info.sample_width == 1:
        arr = np.frombuffer(raw, dtype=np.uint8)
    elif info.sample_width == 2:
        arr = np.frombuffer(raw, dtype="<i2")
    elif info.sample_width == 3:
        # 24-bit little-endian: widen each triple to int32 with sign extension
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        arr = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        arr = arr - ((arr & 0x800000) << 1)  # sign-extend bit 23
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

    The squared sum accumulates in float64 (Kahan-free but ordered identically
    to the scalar oracle restatement): an int64 dot product overflows for
    realistic 24-bit audio (~200k samples at 8e6 amplitude wraps negative)."""
    info = parse_wav(data)
    samples = wav_samples_np(data)
    if samples.size == 0:
        return 0.0
    full = {1: 255.0, 2: 32768.0, 3: 8388608.0}[info.sample_width]
    centered = samples - 128 if info.sample_width == 1 else samples
    centered = centered.astype(np.float64)
    return float((np.dot(centered, centered) / samples.size) ** 0.5 / full)


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
    """(h, w, 3) uint8 RGB, rows TOP-DOWN; 24-bpp and 32-bpp (BGRA, alpha
    dropped) uncompressed, honoring negative-height top-down files.  One
    frombuffer + reshape + channel flip — no per-pixel Python."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    ok = (bpp == 24 and compression == 0) or (bpp == 32 and compression in (0, 3))
    if not ok:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={compression}")
    if compression == 3:
        # BI_BITFIELDS masks exist precisely to declare a non-BGRA channel
        # order; decode only when they spell the standard BGRA/XRGB layout
        # (mask order in the file is R, G, B) rather than silently swapping
        # channels for an RGBA-masked file.
        # file offset 54 holds the R,G,B masks for BITMAPINFOHEADER (appended
        # after the 40-byte header) and V4/V5 (in-header fields) alike
        masks = struct.unpack_from("<III", data, 54)
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise ValueError(f"unsupported BMP bitfields masks: {[hex(m) for m in masks]}")
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    row_size = (width * nch + 3) & ~3
    arr = np.frombuffer(data, dtype=np.uint8, count=row_size * height, offset=offset)
    arr = arr.reshape(height, row_size)[:, : width * nch].reshape(height, width, nch)
    arr = arr[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
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
# PNG (RGB/RGBA@8, gray/palette@1/2/4/8, Adam7 interlace) — public spec, stdlib zlib
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


# Adam7 pass grid: (x_start, y_start, x_step, y_step), spec order
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_wrap(width: int, height: int, depth: int, color: int, interlace: int,
              raw: bytes, plte: bytes | None = None) -> bytes:
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, interlace)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


def _png_pack_row(samples: list[int], depth: int) -> bytes:
    """One scanline of single-channel samples packed at ``depth`` bits."""
    if depth == 8:
        return bytes(s & 255 for s in samples)
    row = bytearray()
    acc = nbits = 0
    for s in samples:
        acc = (acc << depth) | (s & ((1 << depth) - 1))
        nbits += depth
        while nbits >= 8:
            nbits -= 8
            row.append((acc >> nbits) & 255)
    if nbits:
        row.append((acc << (8 - nbits)) & 255)
    return bytes(row)


def _png_raw_pass(width: int, height: int, x0: int, y0: int, dx: int, dy: int,
                  sample_fn, depth: int, channels: int) -> bytes:
    """Filter-0 scanlines of one (sub)image over the given pixel lattice."""
    raw = bytearray()
    for y in range(y0, height, dy):
        line: list[int] = []
        for x in range(x0, width, dx):
            v = sample_fn(x, y)
            line.extend(v if channels > 1 else (v,))
        raw.append(0)
        raw += _png_pack_row(line, depth)
    return bytes(raw)


def png_bytes(width: int, height: int, pixel_fn, interlace: bool = False) -> bytes:
    """Encode ``pixel_fn(x, y) -> (r, g, b)`` as an 8-bit truecolor PNG
    (filter 0 rows, one zlib IDAT; optional Adam7 interlacing) — synthesis
    for fixtures and oracles."""
    fn = lambda x, y: tuple(v & 255 for v in pixel_fn(x, y))
    if not interlace:
        raw = _png_raw_pass(width, height, 0, 0, 1, 1, fn, 8, 3)
        return _png_wrap(width, height, 8, 2, 0, raw)
    raw = b"".join(
        _png_raw_pass(width, height, x0, y0, dx, dy, fn, 8, 3)
        for x0, y0, dx, dy in _ADAM7
        if x0 < width and y0 < height
    )
    return _png_wrap(width, height, 8, 2, 1, raw)


def png_gray_bytes(width: int, height: int, gray_fn, depth: int = 8) -> bytes:
    """Grayscale PNG (color type 0) at depth 1/2/4/8 — ``gray_fn`` returns a
    sample already in [0, 2^depth)."""
    if depth not in (1, 2, 4, 8):
        raise ValueError("gray depth must be 1/2/4/8")
    raw = _png_raw_pass(width, height, 0, 0, 1, 1, gray_fn, depth, 1)
    return _png_wrap(width, height, depth, 0, 0, raw)


def png_palette_bytes(width: int, height: int, index_fn, palette: list[tuple[int, int, int]], depth: int = 8) -> bytes:
    """Indexed-color PNG (color type 3, PLTE) at depth 1/2/4/8."""
    if depth not in (1, 2, 4, 8):
        raise ValueError("palette depth must be 1/2/4/8")
    if len(palette) > (1 << depth):
        raise ValueError("palette larger than depth allows")
    plte = b"".join(bytes((r & 255, g & 255, b & 255)) for r, g, b in palette)
    raw = _png_raw_pass(width, height, 0, 0, 1, 1, index_fn, depth, 1)
    return _png_wrap(width, height, depth, 3, 0, raw, plte=plte)


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


def _png_header(data: bytes) -> tuple[int, int, int, int, int]:
    """Validated (width, height, depth, color, interlace).  Supported
    subset: truecolor/RGBA at depth 8, grayscale and palette at depth
    1/2/4/8, interlace methods 0 (none) and 1 (Adam7) — the complete set of
    layouts common web PNGs actually use; 16-bit samples and gray+alpha
    raise honestly."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    for ctype, body in _png_chunks(data):
        if ctype != b"IHDR":
            raise ValueError("PNG must start with IHDR")
        width, height, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
        ok = (color in (2, 6) and depth == 8) or (color in (0, 3) and depth in (1, 2, 4, 8))
        if not ok:
            raise ValueError(
                f"unsupported PNG: depth={depth} colortype={color} "
                "(RGB/RGBA@8, gray/palette@1/2/4/8 supported)"
            )
        if comp != 0 or filt != 0:
            raise ValueError("unsupported PNG compression/filter method")
        if interlace not in (0, 1):
            raise ValueError(f"unknown PNG interlace method {interlace}")
        return width, height, depth, color, interlace
    raise ValueError("PNG missing IHDR")


def parse_png(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels); raises ValueError outside the supported
    subset (see :func:`_png_header`)."""
    width, height, _depth, color, _interlace = _png_header(data)
    return width, height, {0: 1, 2: 3, 3: 1, 6: 4}[color]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_undo_filters(raw: bytes, offset: int, nrows: int, stride: int, bpp: int) -> tuple[np.ndarray, int]:
    """Undo scanline filters for one (sub)image: (``nrows`` x ``stride``
    reconstructed bytes, bytes consumed).  Filters 0-4 (None/Sub/Up/Average/
    Paeth, the complete public set): None/Up are pure elementwise adds; Sub
    is a per-lane cumulative sum (mod-256 addition is linear, so cumsum%256
    IS the sequential recurrence); the nonlinear Average/Paeth rows keep the
    scalar spec loop.  ``bpp`` is the filter unit — whole bytes per pixel,
    min 1 (sub-byte depths filter at byte granularity, per spec)."""
    need = nrows * (stride + 1)
    if len(raw) - offset < need:
        raise ValueError("PNG pixel data truncated")
    scan = np.frombuffer(raw, dtype=np.uint8, count=need, offset=offset).reshape(
        nrows, stride + 1
    )
    out = np.zeros((nrows, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    lanes = stride // bpp
    for r in range(nrows):
        ftype = int(scan[r, 0])
        line = scan[r, 1:]
        if ftype == 0:
            recon = line.copy()
        elif ftype == 1:  # Sub
            if lanes * bpp == stride:
                recon = (
                    np.cumsum(line.reshape(lanes, bpp), axis=0, dtype=np.int64) % 256
                ).astype(np.uint8).reshape(stride)
            else:  # stride not a bpp multiple (never for the supported set)
                buf = bytearray(line.tobytes())
                for i in range(bpp, stride):
                    buf[i] = (buf[i] + buf[i - bpp]) & 255
                recon = np.frombuffer(bytes(buf), dtype=np.uint8)
        elif ftype == 2:  # Up
            recon = (line.astype(np.int16) + prior).astype(np.uint8)
        elif ftype in (3, 4):  # Average / Paeth: left-recon recurrence, scalar
            buf = bytearray(line.tobytes())
            pr = prior
            for i in range(stride):
                left = buf[i - bpp] if i >= bpp else 0
                if ftype == 3:
                    buf[i] = (buf[i] + ((left + int(pr[i])) >> 1)) & 255
                else:
                    up_left = int(pr[i - bpp]) if i >= bpp else 0
                    buf[i] = (buf[i] + _paeth(left, int(pr[i]), up_left)) & 255
            recon = np.frombuffer(bytes(buf), dtype=np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = recon
        prior = recon
    return out, need


def _png_unpack_samples(recon: np.ndarray, w: int, depth: int, channels: int) -> np.ndarray:
    """(nrows, stride) filtered bytes -> (nrows, w, channels) raw samples."""
    h = recon.shape[0]
    if depth == 8:
        return recon[:, : w * channels].reshape(h, w, channels)
    bits = np.unpackbits(recon, axis=1)[:, : w * depth].reshape(h, w, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    return (bits * weights).sum(axis=2).astype(np.uint8)[:, :, np.newaxis]


def png_pixels_np(data: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB for the full common-web subset: truecolor/RGBA
    at depth 8, grayscale and palette (PLTE) at depth 1/2/4/8, interlace
    none or Adam7.  RGBA drops alpha; sub-byte gray scales by
    255/(2^depth-1) per spec; palette indexes PLTE."""
    import zlib

    width, height, depth, color, interlace = _png_header(data)
    plte = None
    idat_parts = []
    for ctype, body in _png_chunks(data):
        if ctype == b"IDAT":
            idat_parts.append(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8)
            if len(plte) % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = plte.reshape(-1, 3)
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    channels = {0: 1, 2: 3, 3: 1, 6: 4}[color]
    bits_pp = depth * channels
    bpp = max(1, bits_pp // 8)
    raw = zlib.decompress(b"".join(idat_parts))

    if interlace == 0:
        stride = (width * bits_pp + 7) // 8
        recon, _ = _png_undo_filters(raw, 0, height, stride, bpp)
        samples = _png_unpack_samples(recon, width, depth, channels)
    else:  # Adam7: seven independently filtered subimages, scattered back
        samples = np.zeros((height, width, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * bits_pp + 7) // 8
            recon, used = _png_undo_filters(raw, pos, ph, stride, bpp)
            pos += used
            samples[y0::dy, x0::dx] = _png_unpack_samples(recon, pw, depth, channels)

    if color == 2:
        return samples
    if color == 6:
        return samples[:, :, :3]
    if color == 0:
        g = samples[:, :, 0]
        if depth < 8:
            g = (g.astype(np.int64) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return np.repeat(g[:, :, np.newaxis], 3, axis=2)
    # color == 3: palette lookup
    idx = samples[:, :, 0]
    if int(idx.max(initial=0)) >= len(plte):
        raise ValueError("palette index out of range")
    return plte[idx]


def png_pixels(data: bytes) -> list[list[tuple[int, int, int]]]:
    """Legacy list-of-tuple-rows API over :func:`png_pixels_np`."""
    return _rows_from_np(png_pixels_np(data))


# ---------------------------------------------------------------------------
# GIF (87a/89a, single frame, incl. interlaced) — public spec, pure-stdlib LZW
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


def _gif_interlace_order(height: int) -> list[int]:
    """Row order of an interlaced GIF's LZW stream (4 passes: every 8th row
    from 0, every 8th from 4, every 4th from 2, every 2nd from 1)."""
    return (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
    )


def gif_bytes(width: int, height: int, pixel_fn, interlace: bool = False) -> bytes:
    """Encode ``pixel_fn(x, y) -> (r, g, b)`` as a single-frame GIF89a with a
    256-entry palette built from the image's distinct colors (<= 256 required)
    — synthesis for fixtures and oracles, same discipline as png_bytes.
    ``interlace`` writes the 4-pass row order with the descriptor flag set."""
    pixels = [[pixel_fn(x, y) for x in range(width)] for y in range(height)]
    palette: dict[tuple[int, int, int], int] = {}
    for row in pixels:
        for px in row:
            if px not in palette:
                if len(palette) == 256:
                    raise ValueError("gif_bytes supports at most 256 distinct colors")
                palette[px] = len(palette)
    row_order = _gif_interlace_order(height) if interlace else range(height)
    indices = bytes(palette[px] for y in row_order for px in pixels[y])
    table = bytearray()
    for (r, g, b), _ in sorted(palette.items(), key=lambda kv: kv[1]):
        table += bytes((r, g, b))
    table += b"\x00" * (768 - len(table))  # pad to 256 entries
    out = bytearray(b"GIF89a")
    # logical screen: global color table flag, 8-bit color, 256-entry table
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += table
    iflags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, iflags)
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
        # interlaced frames store rows in 4-pass order; map stream row i to
        # its display row
        if iflags & 0x40:
            order = _gif_interlace_order(h)
            rows_by_display = [b""] * h
            for i, disp in enumerate(order):
                rows_by_display[disp] = indices[i * w : (i + 1) * w]
        else:
            rows_by_display = [indices[y * w : (y + 1) * w] for y in range(h)]
        return [
            [tuple(pal[3 * ix : 3 * ix + 3]) for ix in row]
            for row in rows_by_display
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
