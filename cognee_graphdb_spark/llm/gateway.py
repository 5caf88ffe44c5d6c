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

    def nl_to_sql(self, question: str, schema: list[tuple[str, str]], previous_attempts: str = "") -> str:
        """NL question + graph schema -> executable SQL over nodes/edges views
        (U5; the reference generates Cypher, natural_language_retriever.py:51-103)."""
        ...

    def followup_question(self, query: str, answer: str, context: str) -> str:
        """CoT loop follow-up generation (U7, graph_completion_cot_retriever.py:57-142)."""
        ...

    def select_search_type(self, query: str) -> str:
        """FEELING_LUCKY search-type selection (U9, select_search_type.py:9-42)."""
        ...

    def parse_code_query(self, query: str) -> tuple[list[str], list[str]]:
        """code query -> (filenames, content terms) (U11, code_retriever.py:39-59)."""
        ...

    def extract_events(self, text: str) -> list[dict]:
        """U3 — temporal pipeline event extraction: text -> events with
        name/ts_from/ts_to epoch seconds (cognee/tasks/temporal_graph/)."""
        ...

    def extract_rules(self, text: str) -> list[str]:
        """memify's default enrichment: text -> developer rules
        (tasks/codingagents/coding_rule_associations.py Rule/RuleSet)."""
        ...

    def judge_correctness(self, question: str, answer: str, gold: str) -> float:
        """LLM-judged answer correctness in [0, 1] (the reference's
        DeepEval / direct-LLM eval metrics,
        eval_framework/evaluation/deep_eval_adapter.py)."""
        ...

    def judge_context_coverage(self, golden_context: str, retrieval_context: str) -> float:
        """LLM-judged coverage of the golden context by the retrieved
        context, in [0, 1] (the reference's ContextCoverageMetric maps
        input=golden context, actual_output=retrieval context over a
        summarization-coverage rubric,
        eval_framework/evaluation/metrics/context_coverage.py:9-32)."""
        ...

    def classify_chunk(self, text: str) -> dict:
        """Chunk classification: text -> {"type": label, "subclasses": [...]}
        (the reference's extract_categories call in
        tasks/chunk_naive_llm_classifier/chunk_naive_llm_classifier.py:43)."""
        ...

    def create_transcript(self, features: dict) -> str:
        """S2 [LLM] audio loader: decoded signal features -> transcript text
        (the reference sends the audio to the LLM and stores the transcript
        as a text document, loaders/core/audio_loader.py:18 ->
        LLMGateway.create_transcript).  Here the engine decodes REAL PCM
        first (sources/media.py) and the gateway turns the feature envelope
        into text — the mock deterministically, an HTTP gateway via a real
        model."""
        ...

    def transcribe_image(self, features: dict) -> str:
        """S2 [LLM] image loader: decoded pixel features -> description text
        (loaders/core/image_loader.py:15 -> LLMGateway.transcribe_image)."""
        ...


_WORD_RE = re.compile(r"[A-Za-z][a-z]+")
_SENT_SPLIT = re.compile(r"(?<=[.;!?])\s+")
_ISO_RANGE = re.compile(r"(\d{4}-\d{2}-\d{2})\D+(\d{4}-\d{2}-\d{2})")
_RULE_MARKER = re.compile(r"\b(should|must|always|never|avoid|prefer)\b", re.IGNORECASE)
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

    def nl_to_sql(self, question: str, schema: list[tuple[str, str]], previous_attempts: str = "") -> str:
        """Deterministic NL->SQL: look for a known node type or relationship in
        the question; fall back to a name LIKE filter on the longest token.
        Mirrors the retry-with-feedback shape of the reference (up to 3
        attempts receive ``previous_attempts``)."""
        q = question.lower()
        types = [v for k, v in schema if k == "node_type"]
        rels = [v for k, v in schema if k == "relationship"]
        for t in sorted(types):
            if t.lower() in q:
                return f"SELECT id, name, type FROM nodes WHERE type = '{t}' ORDER BY id LIMIT 20"
        for r in sorted(rels):
            if r.lower() in q:
                return (
                    "SELECT src, dst, relationship_name FROM edges "
                    f"WHERE relationship_name = '{r}' ORDER BY src, dst LIMIT 20"
                )
        words = sorted(_WORD_RE.findall(q), key=lambda w: (-len(w), w))
        needle = words[0] if words else ""
        return f"SELECT id, name, type FROM nodes WHERE name LIKE '%{needle}%' ORDER BY id LIMIT 20"

    def followup_question(self, query: str, answer: str, context: str) -> str:
        words = [w for w in _WORD_RE.findall(query.lower()) if len(w) >= 4]
        focus = words[len(words) // 2] if words else query
        return f"what else relates to {focus}?"

    def select_search_type(self, query: str) -> str:
        q = query.lower()
        if any(w in q for w in ("when", "before", "after", "during")):
            return "TEMPORAL"
        if any(w in q for w in ("summary", "summarize")):
            return "SUMMARIES"
        if "insight" in q or "related" in q:
            return "INSIGHTS"
        return "RAG_COMPLETION"  # the reference's default (select_search_type.py:42)

    def parse_code_query(self, query: str) -> tuple[list[str], list[str]]:
        toks = query.split()
        files = [t.strip(",;") for t in toks if "." in t and not t.strip(",;").replace(".", "").isdigit()]
        terms = [t.lower() for t in toks if t not in files and len(t) >= 3]
        return files, terms

    def extract_events(self, text: str) -> list[dict]:
        """U3 mock — one event per ISO date (or range) found in the text;
        name = the 6 words preceding the date."""
        from datetime import datetime, timezone

        def to_epoch(s: str) -> int:
            return int(datetime.strptime(s, "%Y-%m-%d").replace(tzinfo=timezone.utc).timestamp())

        events = []
        for m in re.finditer(r"(\d{4}-\d{2}-\d{2})(?:\D{1,10}(\d{4}-\d{2}-\d{2}))?", text):
            prefix = text[: m.start()].split()[-6:]
            name = " ".join(prefix) if prefix else f"event at {m.group(1)}"
            ts_from = to_epoch(m.group(1))
            ts_to = to_epoch(m.group(2)) if m.group(2) else None
            events.append({"name": name, "ts_from": ts_from, "ts_to": ts_to})
        return events

    def extract_rules(self, text: str) -> list[str]:
        """Mock rule extraction: imperative sentences (should/must/always/
        never/avoid/prefer) become rules, whitespace-normalized — a
        deterministic stand-in for the reference's RuleSet LLM call."""
        rules = []
        for sent in _SENT_SPLIT.split(text.strip()):
            if _RULE_MARKER.search(sent):
                rules.append(" ".join(sent.split()).rstrip(".;!?"))
        return rules[:5]

    def judge_correctness(self, question: str, answer: str, gold: str) -> float:
        """Mock LLM judge: fraction of the gold answer's distinct alnum
        tokens present in the generated answer — a deterministic proxy with
        the same signature and [0, 1] verdict range as the reference's
        DeepEval correctness metric."""
        split = re.compile(r"[a-z0-9]+")
        gold_toks = set(split.findall(gold.lower()))
        if not gold_toks:
            return 1.0 if not split.findall(answer.lower()) else 0.0
        ans_toks = set(split.findall(answer.lower()))
        return len(gold_toks & ans_toks) / len(gold_toks)

    def judge_context_coverage(self, golden_context: str, retrieval_context: str) -> float:
        """Mock coverage judge: fraction of the golden context's distinct
        alnum tokens present in the retrieved context — deterministic proxy
        with the reference metric's signature and [0, 1] range
        (ContextCoverageMetric, context_coverage.py:9-32)."""
        split = re.compile(r"[a-z0-9]+")
        gold_toks = set(split.findall(golden_context.lower()))
        if not gold_toks:
            return 1.0
        got_toks = set(split.findall(retrieval_context.lower()))
        return len(gold_toks & got_toks) / len(gold_toks)

    def create_transcript(self, features: dict) -> str:
        """Mock transcript: deterministic prose from the REAL decoded signal
        features (integer-quantized rms so the driver oracle can rebuild the
        exact string in SQL).  Same input -> same text, like every mock.

        Three envelope shapes, keyed by which features the loader could
        decode (the reference sends the raw file to transcription either way,
        loaders/core/audio_loader.py:18 — the envelope is this engine's
        decoded stand-in for the waveform):
        - PCM (WAV): full signal stats including rms.
        - compressed audio (MP3): container/frame-walk stats — no PCM decode,
          so frames + bitrate stand in for rms.
        - video (MP4): box-tree stats — dimensions, duration, codecs.
        """
        if "rms" in features:
            return (
                f"audio transcript: {features['channels']} channel "
                f"{features['sample_rate']} hz {features['duration_ms']} ms "
                f"rms_ppm {int(features['rms'] * 1e6)}"
            )
        if "codecs" in features:
            return (
                f"video transcript: {features['width']}x{features['height']} "
                f"pixels {features['duration_ms']} ms "
                f"codecs {'+'.join(features['codecs'])}"
            )
        return (
            f"audio transcript: {features['channels']} channel "
            f"{features['sample_rate']} hz {features['duration_ms']} ms "
            f"{features['bitrate_kbps']} kbps {features['frames']} frames"
        )

    def transcribe_image(self, features: dict) -> str:
        """Mock image description from REAL decoded pixel features."""
        r, g, b = features["mean_rgb"]
        return (
            f"image description: {features['width']}x{features['height']} "
            f"pixels mean rgb {r} {g} {b}"
        )

    def classify_chunk(self, text: str) -> dict:
        """Mock classifier: type 'TextContent', subclasses = the first two
        distinct words of length >= 6 in appearance order — deterministic,
        same first-N-distinct shape as extract_graph, and restatable in SQL
        for the driver oracle (chunk_naive_llm_classifier.py:43-53's
        label.type / label.subclass structure)."""
        subs: list[str] = []
        for w in _WORD_RE.findall((text or "").lower()):
            if len(w) >= 6 and w not in subs:
                subs.append(w)
            if len(subs) >= 2:
                break
        return {"type": "TextContent", "subclasses": subs}
