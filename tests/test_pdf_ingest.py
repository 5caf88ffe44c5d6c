"""S2 binary loading: real PDF text extraction + single-pass loader dispatch.

Mirrors the reference's pypdf loader contract
(infrastructure/loaders/external/pypdf_loader.py:19-97): page-by-page
extraction, blank pages skipped, ``Page {n}:`` framing, and the LoaderEngine
dispatch by extension (LoaderEngine.py:25-96).
"""

import zlib

import pytest


def _pdf_obj(num: int, body: bytes) -> bytes:
    return b"%d 0 obj\n%s\nendobj\n" % (num, body)


def _pdf_stream_obj(num: int, content: bytes, compress: bool) -> bytes:
    body = zlib.compress(content) if compress else content
    filt = b" /Filter /FlateDecode" if compress else b""
    return _pdf_obj(
        num, b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(body), filt, body)
    )


def make_pdf() -> bytes:
    """A structurally plausible 2-page PDF: page 1 Flate-compressed with
    escaped literals, page 2 raw with a TJ array, T* and a hex string."""
    page1 = (
        b"BT /F1 12 Tf 72 720 Td (Hello, PDF world!) Tj "
        b"0 -14 Td (Second line with \\(escapes\\) and backslash \\\\.) Tj ET"
    )
    page2 = (
        b"BT /F1 12 Tf 72 720 Td [(Kerned ) -120 (text) 3 ( array.)] TJ "
        b"T* <48657820626974> Tj ET"
    )
    objs = [
        _pdf_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        _pdf_obj(2, b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"),
        _pdf_obj(
            3,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 7 0 R >> >> >>",
        ),
        _pdf_stream_obj(4, page1, compress=True),
        _pdf_obj(
            5,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 6 0 R /Resources << /Font << /F1 7 0 R >> >> >>",
        ),
        _pdf_stream_obj(6, page2, compress=False),
        _pdf_obj(7, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    return b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n"


def test_extract_pdf_text_pages_and_operators():
    from cognee_graphdb_spark.sources.pdf import extract_pdf_text

    text = extract_pdf_text(make_pdf())
    assert "Page 1:\n" in text and "Page 2:\n" in text
    assert "Hello, PDF world!\nSecond line with (escapes) and backslash \\." in text
    assert "Kerned text array.\nHex bit" in text
    # reference framing: "\n".join("Page {n}:\n{text}\n" for non-empty pages)
    assert text == (
        "Page 1:\nHello, PDF world!\nSecond line with (escapes) and backslash \\.\n"
        "\nPage 2:\nKerned text array.\nHex bit\n"
    )


def test_extract_pdf_text_degenerate_inputs():
    from cognee_graphdb_spark.sources.pdf import extract_pdf_text

    assert extract_pdf_text(None) == ""
    assert extract_pdf_text(b"") == ""
    assert extract_pdf_text(b"not a pdf at all") == ""
    # a blank page (text ops but only whitespace) is skipped, like the
    # reference's "only add non-empty pages"
    blank = b"%PDF-1.4\n" + b"1 0 obj\n<< /Length 20 >>\nstream\nBT ( ) Tj ET\nendstream\nendobj\n"
    assert extract_pdf_text(blank) == ""


def test_ingest_files_dispatch_and_pdf_decode(spark, tmp_path):
    from cognee_graphdb_spark.sources.ingest import ingest_files

    (tmp_path / "hello.txt").write_text("plain text file contents here")
    (tmp_path / "doc.pdf").write_bytes(make_pdf())
    (tmp_path / "talk.mp3").write_bytes(b"\x00\x01fake-audio-bytes")

    out = {r["document_type"]: r for r in ingest_files(spark, str(tmp_path / "*")).collect()}
    assert set(out) == {"TextDocument", "PdfDocument", "AudioDocument"}
    assert out["TextDocument"]["text"] == "plain text file contents here"
    # the pdf decodes for REAL
    assert "Hello, PDF world!" in out["PdfDocument"]["text"]
    assert out["PdfDocument"]["text"].startswith("Page 1:")
    # audio stays a deterministic [LLM]-gated stub
    import hashlib

    digest = hashlib.md5(b"\x00\x01fake-audio-bytes").hexdigest()[:12]
    assert out["AudioDocument"]["text"] == f"[audio_loader:{digest}]"


def test_ingest_files_content_hash_dedup(spark, tmp_path):
    """Two PDFs with identical content -> one Data row (ingest_data.py:93-96)."""
    from cognee_graphdb_spark.sources.ingest import ingest_files

    (tmp_path / "a.pdf").write_bytes(make_pdf())
    (tmp_path / "b.pdf").write_bytes(make_pdf())
    rows = ingest_files(spark, str(tmp_path / "*.pdf")).collect()
    assert len(rows) == 1
    assert rows[0]["content_hash"] is not None
