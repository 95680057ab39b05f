"""PageRank over the near-dup pair graph: oracle parity + PR invariants.

AUX query (the driver contract is at its 50-query cap), so the DuckDB
hash check the driver would run lives here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_grpc_spark import registry
from mapreduce_grpc_spark.operators.graph import DAMPING, pagerank_neardup
from tests.oracle import assert_oracle_match


def test_pagerank_oracle_parity(spark, sf_dir):
    df = pagerank_neardup(spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["pagerank_neardup"], sf_dir, "pagerank_neardup"
    )


def test_pagerank_invariants(spark, sf_dir):
    """Scores are positive, bounded below by the teleport floor, and sum
    to ~1 (mass conservation on a dangling-free symmetric graph up to the
    12 dp quantization); higher-degree nodes are never starved."""
    rows = pagerank_neardup(spark, sf_dir).collect()
    assert rows, "fixture has near-dup pairs"
    n = len(rows)
    floor = (1.0 - DAMPING) / n
    total = 0.0
    for r in rows:
        assert r.pr >= floor - 1e-9, r
        assert r.degree >= 1
        total += r.pr
    assert total == pytest.approx(1.0, abs=1e-6)


def test_pagerank_star_graph_centrality(spark, sf_dir, monkeypatch):
    """On a star (hub connected to k leaves) the hub must dominate: its
    PR exceeds every leaf's.  Exercised by monkeypatching the pair source
    so only the graph shape is under test."""
    from mapreduce_grpc_spark.operators import graph as G

    hub_pairs = [(0, i) for i in range(1, 6)]

    def fake_pairs(spark_, sf_dir_):
        return spark.createDataFrame(hub_pairs, "doc_a long, doc_b long")

    monkeypatch.setattr(G, "dedup_near", fake_pairs)
    rows = {r.doc_id: r for r in G.pagerank_neardup(spark, sf_dir).collect()}
    assert rows[0].degree == 5
    for leaf in range(1, 6):
        assert rows[0].pr > rows[leaf].pr
    leaf_scores = {rows[leaf].pr for leaf in range(1, 6)}
    assert len(leaf_scores) == 1, "symmetric leaves must score identically"
