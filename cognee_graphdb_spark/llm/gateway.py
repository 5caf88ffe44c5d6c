"""LLM gateway — the single boundary behind which every non-deterministic
operator lives (SURVEY.md §2.10 U1-U11).

The reference isolates all LLM calls in ``LLMGateway``
(cognee/infrastructure/llm/LLMGateway.py) and ships deterministic stand-ins for
tests (mock_summary.py, DummyEntityExtractor, the regex extractor at
tasks/entity_completion/entity_extractors/regex_entity_extractor.py:72).  We do
the same: the engine only ever sees this protocol; production would plug an
HTTP-backed implementation, tests plug :class:`MockLLMGateway`.

Inside Spark plans the gateway is invoked from ``mapInPandas`` stages so calls
are Arrow-batched per partition, mirroring the reference's gather-per-chunk
concurrency (extract_graph_from_data.py:112-117).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Protocol


class LLMGateway(Protocol):
    def complete(self, prompt: str) -> str: ...

    def extract_graph(self, text: str) -> tuple[list[dict], list[dict]]:
        """text -> (nodes, edges) knowledge-graph fragments (U1)."""
        ...

    def extract_summary(self, text: str) -> str: ...

    def extract_interval(self, question: str) -> tuple[int, int] | None:
        """question -> (time_from, time_to) epoch seconds (U4)."""
        ...

    def sentiment(self, text: str) -> int:
        """feedback text -> score in [-5, 5] (U10)."""
        ...


_WORD_RE = re.compile(r"[A-Za-z][a-z]+")
_SENT_SPLIT = re.compile(r"(?<=[.;!?])\s+")
_ISO_RANGE = re.compile(r"(\d{4}-\d{2}-\d{2})\D+(\d{4}-\d{2}-\d{2})")
_POS = {"good", "great", "helpful", "correct", "excellent", "useful"}
_NEG = {"bad", "wrong", "useless", "incorrect", "poor", "misleading"}


@dataclass
class MockLLMGateway:
    """Deterministic gateway: same input -> same output, no I/O.

    Entity extraction: distinct lowercase alphabetic tokens of length >= 5
    become Entity nodes typed by their first letter — arbitrary but stable, the
    shape (typed entities + 'contains' edges) matches what U1 produces.
    """

    max_entities_per_chunk: int = 8

    def complete(self, prompt: str) -> str:
        return f"MOCK_COMPLETION[{len(prompt)}]"

    def extract_summary(self, text: str) -> str:
        first = _SENT_SPLIT.split(text.strip(), maxsplit=1)[0]
        return first[:200]

    def extract_graph(self, text: str) -> tuple[list[dict], list[dict]]:
        seen: list[str] = []
        for w in _WORD_RE.findall(text.lower()):
            if len(w) >= 5 and w not in seen:
                seen.append(w)
            if len(seen) >= self.max_entities_per_chunk:
                break
        nodes = [{"name": w, "type": f"Type_{w[0]}"} for w in seen]
        edges = [
            {"src_name": a, "dst_name": b, "relationship_name": "co_occurs"}
            for a, b in zip(seen, seen[1:])
        ]
        return nodes, edges

    def extract_interval(self, question: str) -> tuple[int, int] | None:
        from datetime import datetime, timezone

        m = _ISO_RANGE.search(question)
        if not m:
            return None
        to_epoch = lambda s: int(datetime.strptime(s, "%Y-%m-%d").replace(tzinfo=timezone.utc).timestamp())
        return to_epoch(m.group(1)), to_epoch(m.group(2))

    def sentiment(self, text: str) -> int:
        toks = set(_WORD_RE.findall(text.lower()))
        return max(-5, min(5, len(toks & _POS) - len(toks & _NEG)))
