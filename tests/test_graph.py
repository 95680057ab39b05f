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


def test_graph_triangles_oracle_parity(spark, sf_dir):
    from mapreduce_grpc_spark.operators.graph import graph_triangles

    df = graph_triangles(spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["graph_triangles"], sf_dir, "graph_triangles"
    )
    assert df.count() >= 3, "fixture graph carries at least one triangle"


def test_graph_triangles_planted_clique(spark, sf_dir, monkeypatch):
    """A 4-clique yields C(4,3)=4 triangles, each node in C(3,2)=3 of
    them; an attached dangling edge adds none.  Counted exactly once per
    triangle (the a<b<c ordered enumeration)."""
    from mapreduce_grpc_spark.operators import graph as G

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = clique + [(3, 9)]  # dangling edge off the clique

    def fake_pairs(spark_, sf_dir_):
        return spark.createDataFrame(edges, "doc_a long, doc_b long")

    monkeypatch.setattr(G, "dedup_near", fake_pairs)
    rows = {r.doc_id: r.n_triangles for r in G.graph_triangles(
        spark, sf_dir
    ).collect()}
    assert rows == {0: 3, 1: 3, 2: 3, 3: 3}
    assert sum(rows.values()) == 4 * 3  # 4 triangles x 3 members
