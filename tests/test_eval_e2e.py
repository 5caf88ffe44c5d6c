"""The reference's eval protocol end to end THROUGH THE HTTP GATEWAY
(tools/eval_e2e.py): corpus -> cognify -> GRAPH_COMPLETION / COT -> EM/F1 +
LLM-judge, every [LLM] hop an actual HTTP round trip to the in-process
deterministic OpenAI-compatible double.  Pinned metric values: any break in
the gateway -> cognify -> search -> metrics wiring moves them."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")


def test_eval_protocol_through_http_gateway(spark, tmp_path):
    from eval_e2e import run_eval

    res = run_eval(spark, str(tmp_path / "ev"))
    assert res["n_documents"] == 3 and res["n_questions"] == 3
    gc = res["graph_completion"]
    assert gc["em"] == pytest.approx(1 / 3, abs=1e-6)
    assert gc["f1"] == pytest.approx(0.555556, abs=1e-4)
    assert gc["judge"] == pytest.approx(0.187879, abs=1e-4)
    cot = res["graph_completion_cot"]
    assert cot["em"] == pytest.approx(1 / 3, abs=1e-6)
    assert cot["f1"] == pytest.approx(1 / 3, abs=1e-4)
    assert cot["judge"] == pytest.approx(0.121212, abs=1e-4)
    # CONTEXT_EXTENSION (the reference protocol's third retriever config,
    # benchmark_summary_cognee.json entry 2): the extension loop converges to
    # the same triplet fixpoint here, so metrics match GRAPH_COMPLETION's
    ce = res["graph_completion_context_extension"]
    assert ce["em"] == pytest.approx(1 / 3, abs=1e-6)
    assert ce["f1"] == pytest.approx(0.555556, abs=1e-4)
    assert ce["judge"] == pytest.approx(0.187879, abs=1e-4)
    # every hop is HTTP: 3 docs x (graph+summary+classify) + 3 eval passes;
    # the extension pass completes up to 3x per question before the fixpoint
    assert res["n_http_requests"] == 55


def test_eval_protocol_24_questions(spark, tmp_path):
    """The reference-protocol sample size (24 questions, evals/README.md's
    HotpotQA subset): 18 answerable questions whose gold terms dominate
    their doc's retrieved subgraph, 6 out-of-corpus.  EM = 18/24 pins that
    the RETRIEVAL stack finds the right subgraph for every answerable
    question at 1024 hash buckets — any regression in embed -> normalize ->
    triplet-score -> render drops specific questions, not noise."""
    from eval_e2e import CORPUS24, PAIRS24, run_eval

    res = run_eval(spark, str(tmp_path / "ev24"), CORPUS24, PAIRS24, embed_dim=1024)
    assert res["n_documents"] == 24 and res["n_questions"] == 24
    for st in (
        "graph_completion",
        "graph_completion_cot",
        "graph_completion_context_extension",
    ):
        assert res[st]["em"] == pytest.approx(0.75, abs=1e-6), (st, res[st])
        assert res[st]["f1"] == pytest.approx(0.75, abs=1e-6), (st, res[st])
        assert res[st]["judge"] == pytest.approx(0.272727, abs=1e-4), (st, res[st])
    assert res["n_http_requests"] == 432
