"""Deterministic text chunking (SURVEY.md §2.8 F1-F4).

Behavioral contract (reference: cognee/tasks/chunks/chunk_by_word.py,
chunk_by_sentence.py, chunk_by_paragraph.py — re-implemented, not copied):

- Word scan (F1): emit (token, kind) with trailing whitespace attached to the
  preceding token, so ``"".join(tokens)`` reproduces the input exactly.
  A sentence-ending char [.;!?…。！？] absorbs following spaces and is tagged
  ``paragraph_end`` if the next char is a newline, else ``sentence_end``.
- Sentence assembly (F2): accumulate words until a sentence/paragraph end or
  until ``max_size`` tokens would be exceeded (then flush mid-sentence).  A
  trailing unterminated sentence is tagged ``sentence_cut``.  Tokens counted
  1-per-word (the reference's no-tokenizer fallback, chunk_by_sentence.py:7-29).
- Chunk packing (F3): greedily pack whole sentences into chunks of at most
  ``max_chunk_size`` tokens; a chunk's ``cut_type`` is how its LAST sentence
  ended.  Concatenating chunk texts reconstructs the document byte-for-byte.
- Chunk id (F5): md5 of the chunk text (reference: uuid5(NAMESPACE_OID, text),
  chunk_by_paragraph.py:45) — content-addressed and engine-reproducible.

The Spark entry point ``chunk_documents`` is a mapInPandas stage: documents
stream through in Arrow batches and fan out to chunk rows; no driver collect,
no per-row Python overhead beyond the unavoidable string scan.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SENT_END = ".;!?…。！？"
_PARA_END = "\n\r"

# one token per match: a run of non-separator chars, closed by either a
# sentence-ender plus its absorbed spaces or a single space (the final token
# of a text may have neither).  Exactly the per-character scanner's tokens —
# the regex engine just walks the string in C instead of Python (the chunker
# is a per-row Python stage, so this scan IS its inner loop).  The pattern
# can only match empty at end-of-string (any other position starts with a
# char some branch consumes), so finditer's empty-match bump never skips.
_SCAN_RE = re.compile(r"[^ .;!?…。！？]*(?:[.;!?…。！？] *| )?")


def scan_words(text: str) -> Iterator[tuple[str, str]]:
    """Yield (token, kind) preserving all characters. kind ∈ {word,
    sentence_end, paragraph_end}."""
    n = len(text)
    for m in _SCAN_RE.finditer(text):
        tok = m.group(0)
        if not tok:
            continue
        stripped = tok.rstrip(" ") if tok[-1] == " " else tok
        if stripped and stripped[-1] in _SENT_END:
            j = m.end()
            kind = "paragraph_end" if j < n and text[j] in _PARA_END else "sentence_end"
            yield tok, kind
        else:
            yield tok, "word"


def sentences(text: str, max_size: int | None = None) -> Iterator[tuple[str, int, str]]:
    """Yield (sentence_text, token_count, end_kind); end_kind ∈ {word,
    sentence_end, paragraph_end, sentence_cut}."""
    cur: list[str] = []
    size = 0
    state: str | None = None
    for token, kind in scan_words(text):
        if kind != "word" or any(c.isalpha() for c in token):
            state = kind
        if max_size and size + 1 > max_size:
            yield "".join(cur), size, state or "word"
            cur, size = [token], 1
        elif kind in ("sentence_end", "paragraph_end"):
            cur.append(token)
            size += 1
            yield "".join(cur), size, state or kind
            cur, size = [], 0
        else:
            cur.append(token)
            size += 1
    if cur:
        yield "".join(cur), size, "sentence_cut" if state == "word" else (state or "sentence_cut")


def chunk_text(text: str, max_chunk_size: int = 1024) -> list[dict]:
    """Pack sentences into chunks; returns dicts with text/chunk_size/
    chunk_index/cut_type/chunk_id."""
    chunks: list[dict] = []
    cur: list[str] = []
    size = 0
    last_cut = "default"

    def flush(cut_type: str) -> None:
        nonlocal cur, size
        body = "".join(cur)
        chunks.append(
            {
                "text": body,
                "chunk_size": size,
                "chunk_index": len(chunks),
                "cut_type": cut_type,
                "chunk_id": hashlib.md5(body.encode("utf-8")).hexdigest(),
            }
        )
        cur, size = [], 0

    for sent, ssize, end_kind in sentences(text, max_size=max_chunk_size):
        if size > 0 and size + ssize > max_chunk_size:
            flush(last_cut)
        cur.append(sent)
        size += ssize
        last_cut = end_kind or "default"
    if cur:
        flush("sentence_cut" if last_cut == "word" else last_cut)
    return chunks


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("chunk_id", T.StringType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("chunk_size", T.IntegerType()),
        T.StructField("cut_type", T.StringType()),
    ]
)


def chunk_documents(
    docs: DataFrame, max_chunk_size: int = 256, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents -> chunk rows, as an Arrow-batched mapInPandas fan-out."""
    import pandas as pd

    from cognee_graphdb_spark.session import fan_out, ship_package

    ship_package(docs.sparkSession)
    docs = fan_out(docs)

    def fan_out(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for c in chunk_text(text or "", max_chunk_size):
                    rows.append(
                        (str(doc_id), c["chunk_id"], c["chunk_index"], c["text"], c["chunk_size"], c["cut_type"])
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in CHUNK_SCHEMA.fields])

    return docs.select(id_col, text_col).mapInPandas(fan_out, CHUNK_SCHEMA)
