"""Unit tests for the iterative connected-components operator — the
oracle differential (test_oracle.py::graph_components) checks the 1-NN
graph end-to-end; these check the algorithm on adversarial shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from pymapreduce_spark.operators.graph import connected_components


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components(edges).collect()
    return {r.node: r.component for r in rows}


def test_long_chain_converges_within_log_rounds(spark):
    """A 200-node path has diameter 199 — plain min-propagation needs
    ~200 rounds; pointer jumping must finish within the default 12."""
    labels = _cc(spark, [(i, i + 1) for i in range(199)])
    assert len(labels) == 200
    assert set(labels.values()) == {0}


def test_disjoint_components_and_cycle(spark):
    """Two components (a triangle cycle and a star), labels = min id."""
    tri = [(10, 11), (11, 12), (12, 10)]
    star = [(20, 21), (20, 22), (20, 23)]
    labels = _cc(spark, tri + star)
    assert {labels[n] for n in (10, 11, 12)} == {10}
    assert {labels[n] for n in (20, 21, 22, 23)} == {20}
