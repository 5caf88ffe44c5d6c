import pytest
from pyspark.sql import functions as F

from cognee_graphdb_spark.operators.keywords import textrank_keywords


def _docs(spark):
    # 'engine' co-occurs with everything, many times — the obvious keyword;
    # 'gasket' appears once in one doc
    rows = [
        (0, "engine torque engine piston torque engine"),
        (1, "engine piston cylinder engine torque piston"),
        (2, "cylinder engine torque gasket engine piston"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_textrank_ranks_hub_term_first(spark):
    top = textrank_keywords(_docs(spark), window=2, min_pair_count=1, top_k=4).collect()
    terms = [r["term"] for r in top]
    assert terms[0] == "engine"
    assert "gasket" not in terms[:3]
    ranks = [r["rank"] for r in top]
    assert ranks == sorted(ranks, reverse=True)


def test_textrank_deterministic_and_bounded(spark):
    a = [(r["term"], round(r["rank"], 9)) for r in textrank_keywords(_docs(spark), window=2, min_pair_count=1, top_k=10).collect()]
    b = [(r["term"], round(r["rank"], 9)) for r in textrank_keywords(_docs(spark), window=2, min_pair_count=1, top_k=10).collect()]
    assert a == b
    # ranks form a probability-ish vector: all positive, sum <= 1 + eps
    assert all(r > 0 for _, r in a)
    assert sum(r for _, r in a) <= 1.0 + 1e-9


def test_textrank_min_pair_count_prunes_rare_edges(spark):
    full = {r["term"] for r in textrank_keywords(_docs(spark), window=2, min_pair_count=1, top_k=10).collect()}
    pruned = {r["term"] for r in textrank_keywords(_docs(spark), window=2, min_pair_count=3, top_k=10).collect()}
    assert "gasket" in full and "gasket" not in pruned
    assert pruned <= full
