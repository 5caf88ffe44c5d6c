"""Topological layering (operators/dag.py — gds.dag.topologicalSort /
gds.dag.longestPath in one result; reference metric surface
neo4j_driver/neo4j_metrics_utils.py)."""

from __future__ import annotations

import pytest

from cognee_graphdb_spark.operators.dag import topological_layers


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d, "r") for s, d in pairs],
        "src string, dst string, relationship_name string",
    )


def test_diamond_layers_are_longest_path_lengths(spark):
    """Diamond a->b->d, a->c->d plus a shortcut a->d: layer is the LONGEST
    source path (d at 2, not 1), isolated node at 0."""
    out = {
        r["id"]: r["layer"]
        for r in topological_layers(
            _nodes(spark, list("abcdz")),
            _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")]),
        ).collect()
    }
    assert out == {"a": 0, "b": 1, "c": 1, "d": 2, "z": 0}


def test_cycles_and_budget_fail_loudly(spark):
    """A 3-cycle (and everything behind it) raises naming the stuck count;
    a self-loop is a cycle; an exhausted round budget raises RuntimeError
    instead of spinning."""
    with pytest.raises(ValueError, match="4 nodes sit on or behind a cycle"):
        topological_layers(
            _nodes(spark, list("abcd")),
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]),
        ).collect()
    with pytest.raises(ValueError, match="not a DAG"):
        topological_layers(
            _nodes(spark, ["x"]), _edges(spark, [("x", "x")])
        ).collect()
    chain = [(f"n{i}", f"n{i+1}") for i in range(5)]
    with pytest.raises(RuntimeError, match="did not finish in 2 rounds"):
        topological_layers(
            _nodes(spark, [f"n{i}" for i in range(6)]),
            _edges(spark, chain),
            max_rounds=2,
        )


def test_depth_exactly_max_rounds_finishes(spark):
    """r11 ADVICE off-by-one: a DAG whose depth equals max_rounds peels
    completely on the last iteration — that is success, not an exhausted
    budget.  A 3-node chain (3 peels) under max_rounds=3 must return its
    layers instead of raising."""
    got = {
        r["id"]: r["layer"]
        for r in topological_layers(
            _nodes(spark, ["a", "b", "c"]),
            _edges(spark, [("a", "b"), ("b", "c")]),
            max_rounds=3,
        ).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2}


def test_out_of_graph_edges_ignored_and_empty_ok(spark):
    """Edges touching unknown ids do not constrain the layering; an empty
    node set returns a typed empty frame."""
    out = {
        r["id"]: r["layer"]
        for r in topological_layers(
            _nodes(spark, ["a", "b"]),
            _edges(spark, [("ghost", "a"), ("a", "b")]),
        ).collect()
    }
    assert out == {"a": 0, "b": 1}
    empty = topological_layers(_nodes(spark, []), _edges(spark, []))
    assert empty.count() == 0 and set(empty.columns) == {"id", "layer"}
