"""Office / HTML / email extraction (sources/office.py — the reference's
optional unstructured_loader surface, decoded with pure stdlib)."""

from __future__ import annotations

import pytest

from cognee_graphdb_spark.sources import office as o


def test_docx_roundtrip():
    paras = ["first paragraph here", "second one with  double spaces", "third"]
    assert o.docx_text(o.docx_bytes(paras)) == "\n".join(paras)


def test_docx_escaped_characters():
    paras = ["a < b & c > d"]
    assert o.docx_text(o.docx_bytes(paras)) == "a < b & c > d"


def test_xlsx_roundtrip_shared_strings_dedup():
    rows = [["alpha", "beta"], ["beta", "gamma delta"]]
    data = o.xlsx_bytes(rows)
    assert o.xlsx_text(data) == "alpha\tbeta\nbeta\tgamma delta"


def test_pptx_roundtrip_slide_order():
    # 11 slides: numeric sort must win over lexicographic (slide10 < slide2)
    slides = [[f"slide {i} title", f"slide {i} body"] for i in range(1, 12)]
    text = o.pptx_text(o.pptx_bytes(slides))
    parts = text.split("\n\n")
    assert len(parts) == 11
    assert parts[0] == "slide 1 title\nslide 1 body"
    assert parts[9] == "slide 10 title\nslide 10 body"


def test_odt_roundtrip():
    paras = ["heading-ish line", "body text"]
    assert o.odt_text(o.odt_bytes(paras)) == "\n".join(paras)


def test_office_sniff_dispatches_by_layout():
    assert o.office_text(o.docx_bytes(["x"])) == "x"
    assert o.office_text(o.xlsx_bytes([["y"]])) == "y"
    assert o.office_text(o.pptx_bytes([["z"]])) == "z"
    assert o.office_text(o.odt_bytes(["w"])) == "w"
    with pytest.raises(ValueError, match="layout"):
        o.office_text(o._zip_bytes({"random.txt": "hi"}))


def test_html_text_strips_tags_and_scripts():
    html = (
        b"<html><head><title>T</title><style>p{color:red}</style>"
        b"<script>var x = '<p>not text</p>';</script></head>"
        b"<body><h1>Head</h1><p>one two</p> <p>three</p></body></html>"
    )
    assert o.html_text(html) == "T Head one two three"


def test_eml_subject_and_plain_body():
    from email.message import EmailMessage

    msg = EmailMessage()
    msg["Subject"] = "Weekly report"
    msg["From"] = "a@example.com"
    msg["To"] = "b@example.com"
    msg.set_content("numbers are up this week")
    out = o.eml_text(bytes(msg))
    assert out == "Weekly report\n\nnumbers are up this week\n"


def test_ingest_dispatch_routes_office_formats():
    from cognee_graphdb_spark.sources.ingest import EXTENSION_TYPES, decode_row, loader_for

    assert EXTENSION_TYPES["docx"] == "OfficeDocument"
    assert loader_for("OfficeDocument") == "office_loader"
    assert decode_row("office_loader", o.docx_bytes(["hello docx"])) == "hello docx"
    assert decode_row("office_loader", o.xlsx_bytes([["a", "b"]])) == "a\tb"
    assert decode_row("html_loader", b"<p>hi</p>") == "hi"
    # malformed container falls back to the content-addressed stand-in
    assert decode_row("office_loader", b"PK\x03\x04junk").startswith("[office_loader:")
    assert decode_row("office_loader", b"notazip").startswith("[office_loader:")


def test_xlsx_numeric_sheet_order():
    """sheet10.xml must come AFTER sheet2.xml (numeric sort, not lexicographic
    — the pptx slide rule; r7 ADVICE finding)."""
    from cognee_graphdb_spark.sources.office import _NS_SS, _zip_bytes

    def sheet_xml(text):
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_NS_SS}"><sheetData>'
            f'<row r="1"><c r="A1" t="inlineStr"><is><t>{text}</t></is></c></row>'
            "</sheetData></worksheet>"
        )

    files = {f"xl/worksheets/sheet{i}.xml": sheet_xml(f"s{i}") for i in range(1, 12)}
    text = o.xlsx_text(_zip_bytes(files))
    assert text.split("\n") == [f"s{i}" for i in range(1, 12)]
