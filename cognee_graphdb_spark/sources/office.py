"""Office / HTML / email text extraction — the reference's OPTIONAL
unstructured_loader coverage (loaders/external/unstructured_loader.py:19-45:
docx/xlsx/pptx/odt/html/eml and friends) re-expressed with pure stdlib, same
discipline as sources/pdf.py: DOCX/XLSX/PPTX/ODT are ZIP+XML containers
(zipfile + xml.etree), HTML strips tags via html.parser, EML parses with the
stdlib email package.  The reference shells out to the `unstructured`
library; here the extraction is deterministic and dependency-free, so the
driver oracles can restate the extracted text exactly.

Scale note: like every decoder in sources/, these run per blob inside
Arrow-batched mapInPandas stages — no shared state, parallel per partition.
Fixture encoders (docx_bytes / xlsx_bytes / pptx_bytes / odt_bytes) build
minimal REAL containers with the proper namespaces so round-trip tests and
oracles pin the parsers against analytic text.
"""

from __future__ import annotations

import io
import re
import zipfile
from html.parser import HTMLParser
from xml.etree import ElementTree

_NS_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_NS_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_NS_SS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_ODT_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_NS_ODT_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


# ---------------------------------------------------------------------------
# DOCX (WordprocessingML): word/document.xml, w:p paragraphs of w:t runs
# ---------------------------------------------------------------------------


def docx_text(data: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        return docx_text_zip(z)


def docx_text_zip(z: zipfile.ZipFile) -> str:
    root = ElementTree.fromstring(z.read("word/document.xml"))
    paras = []
    for p in root.iter():
        if _local(p.tag) == "p":
            paras.append("".join(t.text or "" for t in p.iter() if _local(t.tag) == "t"))
    return "\n".join(paras)


def docx_bytes(paragraphs: list[str]) -> bytes:
    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{_xml_escape(p)}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    doc = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_NS_W}"><w:body>{body}</w:body></w:document>'
    )
    return _zip_bytes(
        {
            "[Content_Types].xml": _CONTENT_TYPES_DOCX,
            "word/document.xml": doc,
        }
    )


# ---------------------------------------------------------------------------
# XLSX (SpreadsheetML): sharedStrings + sheetN cell values, tab/newline layout
# ---------------------------------------------------------------------------


def xlsx_text(data: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        return xlsx_text_zip(z)


def xlsx_text_zip(z: zipfile.ZipFile) -> str:
    names = z.namelist()
    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        sroot = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
        for si in sroot:
            shared.append("".join(t.text or "" for t in si.iter() if _local(t.tag) == "t"))
    lines = []
    # numeric sheet order — lexicographic would put sheet10 before sheet2
    # (same rule as pptx_text_zip's slide sort; r7 ADVICE finding)
    sheet_names = sorted(
        (n for n in names if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
    )
    for name in sheet_names:
        root = ElementTree.fromstring(z.read(name))
        for row in root.iter():
            if _local(row.tag) != "row":
                continue
            cells = []
            for c in row:
                if _local(c.tag) != "c":
                    continue
                kind = c.get("t")
                v = next((e.text or "" for e in c.iter() if _local(e.tag) == "v"), None)
                if kind == "s" and v is not None:
                    cells.append(shared[int(v)])
                elif kind == "inlineStr":
                    cells.append("".join(t.text or "" for t in c.iter() if _local(t.tag) == "t"))
                elif v is not None:
                    cells.append(v)
            lines.append("\t".join(cells))
    return "\n".join(lines)


def xlsx_bytes(rows: list[list[str]]) -> bytes:
    strings: list[str] = []
    seen: dict[str, int] = {}
    cells_xml = []
    for r, row in enumerate(rows, start=1):
        cell_parts = []
        for ci, val in enumerate(row):
            if val not in seen:
                seen[val] = len(strings)
                strings.append(val)
            col = chr(ord("A") + ci)
            cell_parts.append(f'<c r="{col}{r}" t="s"><v>{seen[val]}</v></c>')
        cells_xml.append(f'<row r="{r}">{"".join(cell_parts)}</row>')
    sheet = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS_SS}"><sheetData>{"".join(cells_xml)}</sheetData></worksheet>'
    )
    sst = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_NS_SS}" count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f"<si><t xml:space=\"preserve\">{_xml_escape(s)}</t></si>" for s in strings)
        + "</sst>"
    )
    return _zip_bytes(
        {
            "[Content_Types].xml": _CONTENT_TYPES_XLSX,
            "xl/worksheets/sheet1.xml": sheet,
            "xl/sharedStrings.xml": sst,
        }
    )


# ---------------------------------------------------------------------------
# PPTX (PresentationML): ppt/slides/slideN.xml a:t runs, numeric slide order
# ---------------------------------------------------------------------------


def pptx_text(data: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        return pptx_text_zip(z)


def pptx_text_zip(z: zipfile.ZipFile) -> str:
    slide_names = sorted(
        (n for n in z.namelist() if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
    )
    slides = []
    for name in slide_names:
        root = ElementTree.fromstring(z.read(name))
        slides.append("\n".join(t.text or "" for t in root.iter() if _local(t.tag) == "t"))
    return "\n\n".join(slides)


def pptx_bytes(slides: list[list[str]]) -> bytes:
    files = {"[Content_Types].xml": _CONTENT_TYPES_PPTX}
    for i, texts in enumerate(slides, start=1):
        runs = "".join(f"<a:t>{_xml_escape(t)}</a:t>" for t in texts)
        files[f"ppt/slides/slide{i}.xml"] = (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld xmlns:a="{_NS_A}" '
            f'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">{runs}</p:sld>'
        )
    return _zip_bytes(files)


# ---------------------------------------------------------------------------
# ODT (OpenDocument): content.xml text:p / text:h paragraphs
# ---------------------------------------------------------------------------


def odt_text(data: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        return odt_text_zip(z)


def odt_text_zip(z: zipfile.ZipFile) -> str:
    root = ElementTree.fromstring(z.read("content.xml"))
    paras = []
    for el in root.iter():
        if _local(el.tag) in ("p", "h"):
            paras.append("".join(el.itertext()))
    return "\n".join(paras)


def odt_bytes(paragraphs: list[str]) -> bytes:
    body = "".join(f"<text:p>{_xml_escape(p)}</text:p>" for p in paragraphs)
    content = (
        f'<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_NS_ODT_OFFICE}" xmlns:text="{_NS_ODT_TEXT}">'
        f"<office:body><office:text>{body}</office:text></office:body>"
        f"</office:document-content>"
    )
    return _zip_bytes({"mimetype": "application/vnd.oasis.opendocument.text", "content.xml": content})


# ---------------------------------------------------------------------------
# HTML: tag-stripping text extraction, script/style skipped
# ---------------------------------------------------------------------------


class _HtmlText(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.chunks: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip:
            s = data.strip()
            if s:
                self.chunks.append(s)


def html_text(data: bytes) -> str:
    """Visible text: stripped non-empty data chunks joined by single spaces
    (script/style dropped) — deterministic, so oracles can restate it."""
    p = _HtmlText()
    p.feed(data.decode("utf-8", "replace"))
    return " ".join(p.chunks)


# ---------------------------------------------------------------------------
# EML: stdlib email — subject + first text/plain body
# ---------------------------------------------------------------------------


def eml_text(data: bytes) -> str:
    import email
    import email.policy

    msg = email.message_from_bytes(data, policy=email.policy.default)
    subject = str(msg.get("Subject", "") or "")
    body = ""
    target = msg
    if msg.is_multipart():
        target = next((p for p in msg.walk() if p.get_content_type() == "text/plain"), None)
    if target is not None:
        payload = target.get_payload(decode=True)
        if payload is not None:
            body = payload.decode(target.get_content_charset() or "utf-8", "replace")
    return f"{subject}\n\n{body}"


# ---------------------------------------------------------------------------
# container sniff + shared helpers
# ---------------------------------------------------------------------------


def office_text(data: bytes) -> str:
    """Dispatch a ZIP office container by its member layout (the reliable
    sniff — extensions lie): docx / xlsx / pptx / odt."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = set(z.namelist())
        if "word/document.xml" in names:
            return docx_text_zip(z)
        if any(re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n) for n in names):
            return xlsx_text_zip(z)
        if any(re.fullmatch(r"ppt/slides/slide\d+\.xml", n) for n in names):
            return pptx_text_zip(z)
        if "content.xml" in names:
            return odt_text_zip(z)
    raise ValueError("unrecognized office container layout")


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _zip_bytes(files: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, content in files.items():
            z.writestr(name, content)
    return buf.getvalue()


_CONTENT_TYPES_DOCX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>'
)
_CONTENT_TYPES_XLSX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
)
_CONTENT_TYPES_PPTX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/></Types>'
)
