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
    # the COT follow-up asks about the dominant NON-question context term
    # (a follow-up that parrots the question is a degenerate no-op), which
    # on this 3-doc corpus keeps the loop at the round-0 answers
    cot = res["graph_completion_cot"]
    assert cot["em"] == pytest.approx(1 / 3, abs=1e-6)
    assert cot["f1"] == pytest.approx(0.555556, abs=1e-4)
    assert cot["judge"] == pytest.approx(0.187879, abs=1e-4)
    # CONTEXT_EXTENSION (the reference protocol's third retriever config,
    # benchmark_summary_cognee.json entry 2) re-retrieves with its own
    # answers and drifts off q2's doc here — strictly below GC on this
    # corpus, so the three configs are pinned at DIFFERENT values
    ce = res["graph_completion_context_extension"]
    assert ce["em"] == pytest.approx(1 / 3, abs=1e-6)
    assert ce["f1"] == pytest.approx(1 / 3, abs=1e-4)
    assert ce["judge"] == pytest.approx(0.121212, abs=1e-4)
    # every hop is HTTP: 3 docs x (graph+summary+classify) + 3 eval passes;
    # the extension pass completes up to 3x per question before the fixpoint
    assert res["n_http_requests"] == 55


def test_eval_protocol_24_questions(spark, tmp_path):
    """The reference-protocol sample size (24 questions, evals/README.md's
    HotpotQA subset): 12 one-hop questions every config answers in round 0,
    6 two-hop bridge questions only a SECOND retrieval round can answer,
    and 6 out-of-corpus golds.  The three retriever configs therefore pin
    three pairwise-DIFFERENT numbers on every metric (as the reference's
    benchmark summary publishes), and each loop's mechanism is separately
    falsifiable:

    - GRAPH_COMPLETION answers all 12 one-hop, no two-hop: EM 12/24.  Any
      regression in embed -> normalize -> triplet-score -> render drops
      specific one-hop questions below that.
    - COT answers all 6 two-hop (its follow-up re-asks about the bridge
      term, pulling in the bridge doc): EM 18/24.  A broken follow-up loop
      falls back to 12/24.
    - CONTEXT_EXTENSION answers 5 of 6 two-hop (it re-retrieves with its
      own round-0 completion; topic 1's hook summary carries the bridge
      term and permanently occupies the top-5 slot the bridge doc's edge
      needs — see eval_e2e._TOPICS_2HOP): EM 17/24.  A broken extension
      loop falls back to 12/24; an extension that stops converging moves
      the airship topic first."""
    from eval_e2e import CORPUS24, PAIRS24, run_eval

    res = run_eval(spark, str(tmp_path / "ev24"), CORPUS24, PAIRS24, embed_dim=1024)
    assert res["n_documents"] == 30 and res["n_questions"] == 24
    gc, cot, ext = (
        res["graph_completion"],
        res["graph_completion_cot"],
        res["graph_completion_context_extension"],
    )
    assert gc["em"] == pytest.approx(12 / 24, abs=1e-6), gc
    assert gc["f1"] == pytest.approx(0.659722, abs=1e-4), gc
    assert gc["judge"] == pytest.approx(0.231060, abs=1e-4), gc
    assert cot["em"] == pytest.approx(18 / 24, abs=1e-6), cot
    assert cot["f1"] == pytest.approx(0.75, abs=1e-4), cot
    assert cot["judge"] == pytest.approx(0.272727, abs=1e-4), cot
    assert ext["em"] == pytest.approx(17 / 24, abs=1e-6), ext
    assert ext["f1"] == pytest.approx(0.729167, abs=1e-4), ext
    assert ext["judge"] == pytest.approx(0.265151, abs=1e-4), ext
    # the per-config deltas, pinned directionally: multi-round retrieval
    # strictly beats single-round, and COT's bridge-term follow-up strictly
    # beats completion-text re-retrieval on this corpus
    for m in ("em", "f1", "judge"):
        assert cot[m] > ext[m] > gc[m], (m, gc[m], ext[m], cot[m])
    assert res["n_http_requests"] == 448
