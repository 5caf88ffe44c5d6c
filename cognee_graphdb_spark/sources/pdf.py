"""Deterministic PDF text extraction for the S2 pdf_loader.

Reference behavior (infrastructure/loaders/external/pypdf_loader.py:19-97):
page-by-page ``extract_text()``, skip blank pages, render each surviving page
as ``Page {n}:\\n{text}\\n`` and join the parts with ``\\n``.

This module reproduces that contract without requiring pypdf in the runtime
image: :func:`extract_pdf_text` uses pypdf when importable and otherwise
falls back to a minimal pure-Python parser built directly from the public
PDF spec (ISO 32000): scan ``stream``/``endstream`` objects, inflate
/FlateDecode bodies with zlib, and interpret the text-showing operators
(``Tj``, ``'``, ``\"``, ``TJ``) of each page content stream, with
``Td``/``TD``/``T*`` treated as line breaks.  No font CMap handling — glyphs
are decoded latin-1, which is exact for the WinAnsi/ASCII PDFs the simple
path targets; anything the parser can't make sense of extracts as empty
rather than raising, matching the reference's per-page warn-and-continue.

Everything here is driver-/executor-side plain Python over ``bytes`` —
the Spark plumbing that feeds it is in ``sources/ingest.py`` (Arrow-batched
mapInPandas, one dispatch pass for every binary document type).
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)

# text-block operator tokens inside a decoded content stream
_TOKEN_RE = re.compile(
    rb"""
    \((?:[^()\\]|\\.)*\)      # (string) literal, incl. escaped parens
  | <[0-9A-Fa-f\s]*>          # <hex> string
  | \[|\]
  | [A-Za-z'"*]+              # operators
  | [-+]?[0-9.]+              # numbers
    """,
    re.VERBOSE,
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_literal(raw: bytes) -> bytes:
    """PDF (string) literal body -> bytes (ISO 32000 §7.3.4.2)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt.isdigit():  # octal \d{1,3}
            j = i + 1
            while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        else:  # line continuation or unknown escape: drop the backslash
            i += 1
    return bytes(out)


def _stream_text(content: bytes) -> str:
    """Interpret one page content stream's text operators."""
    lines: list[list[str]] = [[]]
    pending: list[str] = []  # strings seen since the last operator token
    for tok in _TOKEN_RE.findall(content):
        if tok.startswith(b"("):
            pending.append(_unescape_literal(tok[1:-1]).decode("latin-1"))
        elif tok.startswith(b"<"):
            hexbody = re.sub(rb"\s", b"", tok[1:-1])
            if len(hexbody) % 2:
                hexbody += b"0"  # odd-length hex strings pad with 0
            pending.append(bytes.fromhex(hexbody.decode("ascii")).decode("latin-1"))
        elif tok in (b"Tj", b"TJ", b"'", b'"'):
            lines[-1].extend(pending)
            pending = []
            if tok in (b"'", b'"'):  # ' and " move to the next line first
                lines[-1], last = lines[-1][:-1], lines[-1][-1:]
                lines.append(list(last))
        elif tok in (b"Td", b"TD", b"T*"):
            pending = []
            if lines[-1]:
                lines.append([])
        elif tok.isalpha():
            pending = []  # any other operator consumes its operands
    text = "\n".join("".join(parts) for parts in lines if parts)
    return text


def _content_streams(data: bytes):
    """Yield decoded candidate page-content streams in file order."""
    for m in _STREAM_RE.finditer(data):
        params, start = m.group(1), m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        body = data[start:end].rstrip(b"\r\n")
        if b"FlateDecode" in params:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        if b"BT" in body and (b"Tj" in body or b"TJ" in body or b"'" in body):
            yield body


def _extract_pdf_text_minimal(data: bytes) -> str:
    parts = []
    page_num = 0
    for body in _content_streams(data):
        page_num += 1
        try:
            page_text = _stream_text(body)
        except Exception:
            continue  # warn-and-continue parity with the reference's per-page try
        if page_text.strip():
            parts.append(f"Page {page_num}:\n{page_text}\n")
    return "\n".join(parts)


def extract_pdf_text(data: bytes | None) -> str:
    """Bytes of a PDF file -> reference-format text (see module docstring)."""
    if not data:
        return ""
    try:
        from io import BytesIO

        from pypdf import PdfReader  # preferred when the image has it
    except ImportError:
        return _extract_pdf_text_minimal(data)
    try:
        reader = PdfReader(BytesIO(data))
        parts = []
        for page_num, page in enumerate(reader.pages, 1):
            try:
                page_text = page.extract_text()
            except Exception:
                continue
            if page_text.strip():
                parts.append(f"Page {page_num}:\n{page_text}\n")
        return "\n".join(parts)
    except Exception:
        return _extract_pdf_text_minimal(data)
