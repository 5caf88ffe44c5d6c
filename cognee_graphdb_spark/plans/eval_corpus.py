"""Benchmark corpus adapters: HotpotQA / 2WikiMultihop / Musique file formats
-> the (corpus, qa_pairs) shape :func:`evaluate_qa` consumes.

Reference: eval_framework/benchmark_adapters/ — hotpot_qa_adapter.py (JSON
array; ``context`` = [title, sentences] pairs, ``supporting_facts`` =
[title, sentence_idx], metadata field ``level``),
twowikimultihop_adapter.py (same layout, metadata ``type``, plus
``evidences`` triplets appended to the golden context), musique_adapter.py
(JSONL; ``paragraphs`` carry the corpus, ``question_decomposition`` the
golden context).  The reference adapters download their corpora; this engine
takes a local path — the field mapping, sampling (random.sample under a
seed), and instance filtering match the reference exactly so the same
protocol runs against the same files.
"""

from __future__ import annotations

import json
import os
import random
from typing import Any


def _filter_instances(instances, instance_filter, id_key: str = "id"):
    """IDs, indices, or a JSON file of either (base_benchmark_adapter.py)."""
    if isinstance(instance_filter, str):
        if not os.path.isfile(instance_filter):
            raise FileNotFoundError(f"Filter file not found: {instance_filter}")
        with open(instance_filter, "r", encoding="utf-8") as f:
            instance_filter = json.load(f)
    if all(isinstance(fid, str) for fid in instance_filter):
        return [inst for inst in instances if inst.get(id_key) in instance_filter]
    if all(isinstance(fid, int) for fid in instance_filter):
        return [instances[i] for i in instance_filter if 0 <= i < len(instances)]
    raise ValueError(
        "instance_filter must be a list of string ids, integer indices, or a JSON file path."
    )


def _hotpot_golden_context(item: dict[str, Any], evidences: bool = False) -> str:
    """'title: sentence' per valid supporting fact (hotpot_qa_adapter.py:26-39);
    with ``evidences`` also the 2wiki triplet lines."""
    context_dict = {title: sentences for title, sentences in item.get("context", [])}
    lines = []
    for title, sentence_idx in item.get("supporting_facts", []):
        sentences = context_dict.get(title, [])
        if sentences and isinstance(sentence_idx, int) and 0 <= sentence_idx < len(sentences):
            lines.append(f"{title}: {sentences[sentence_idx]}")
    golden = "\n".join(lines)
    if evidences and "evidences" in item:
        golden += "\nEvidence fact triplets:"
        for subject, relation, obj in item["evidences"]:
            golden += f"\n  • {subject} - {relation} - {obj}"
    return golden


def _load_hotpot_like(path: str, metadata_field: str, evidences: bool):
    with open(path, "r", encoding="utf-8") as f:
        raw = json.load(f)

    def corpus_entries(item):
        return [" ".join(sentences) for _title, sentences in item.get("context", [])]

    def qa_pair(item, load_golden_context):
        pair = {
            "question": item["question"],
            "answer": item["answer"].lower(),
            metadata_field: item.get(metadata_field),
        }
        if load_golden_context:
            pair["golden_context"] = _hotpot_golden_context(item, evidences=evidences)
        return pair

    return raw, corpus_entries, qa_pair, "_id"


def _load_musique(path: str):
    with open(path, "r", encoding="utf-8") as f:
        raw = [json.loads(line) for line in f if line.strip()]

    def corpus_entries(item):
        return [p["paragraph_text"] for p in item.get("paragraphs", [])]

    def qa_pair(item, load_golden_context):
        answer = item.get("answer", "")
        pair = {
            "id": item.get("id", ""),
            "question": item.get("question", ""),
            "answer": answer.lower() if isinstance(answer, str) else answer,
        }
        if load_golden_context:
            paragraphs = item.get("paragraphs", [])
            lines = []
            for step in item.get("question_decomposition", []):
                support_idx = step.get("paragraph_support_idx")
                if isinstance(support_idx, int) and 0 <= support_idx < len(paragraphs):
                    para = paragraphs[support_idx]
                    lines.append(f"{para['title']}: {para['paragraph_text']}")
                lines.append(f"Q: {step['question']}")
                lines.append(f"A: {step['answer']}")
                lines.append("")
            pair["golden_context"] = "\n".join(lines)
        return pair

    return raw, corpus_entries, qa_pair, "id"


_FORMATS = ("hotpot", "2wikimultihop", "musique")


def load_qa_corpus(
    path: str,
    fmt: str = "hotpot",
    limit: int | None = None,
    seed: int = 42,
    load_golden_context: bool = False,
    instance_filter=None,
) -> tuple[list[str], list[dict[str, Any]]]:
    """(corpus_list, question_answer_pairs) from a benchmark file on disk —
    the reference ``load_corpus`` contract, minus the network fetch."""
    if fmt == "hotpot":
        raw, corpus_entries, qa_pair, id_key = _load_hotpot_like(path, "level", evidences=False)
    elif fmt == "2wikimultihop":
        raw, corpus_entries, qa_pair, id_key = _load_hotpot_like(path, "type", evidences=True)
    elif fmt == "musique":
        raw, corpus_entries, qa_pair, id_key = _load_musique(path)
    else:
        raise ValueError(f"unknown benchmark format {fmt!r}; expected one of {_FORMATS}")

    if instance_filter is not None:
        raw = _filter_instances(raw, instance_filter, id_key=id_key)
    if limit is not None and 0 < limit < len(raw):
        random.seed(seed)
        raw = random.sample(raw, limit)

    corpus_list: list[str] = []
    qa_pairs: list[dict[str, Any]] = []
    for item in raw:
        corpus_list.extend(corpus_entries(item))
        qa_pairs.append(qa_pair(item, load_golden_context))
    return corpus_list, qa_pairs


def eval_pairs(qa_pairs: list[dict[str, Any]]) -> list[tuple[str, str]]:
    """The (question, gold) tuples :func:`evaluate_qa` takes."""
    return [(p["question"], p["answer"]) for p in qa_pairs]


def golden_contexts(qa_pairs: list[dict[str, Any]]) -> list[str]:
    """One golden-context string per pair, for ``evaluate_qa``'s context
    coverage metric — requires ``load_qa_corpus(load_golden_context=True)``."""
    try:
        return [p["golden_context"] for p in qa_pairs]
    except KeyError:
        raise ValueError(
            "pairs carry no golden_context; load the corpus with load_golden_context=True"
        ) from None
