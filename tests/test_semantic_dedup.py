"""SemDeDup (semantic dedup through learned clusters): exact parity
with a pure-numpy reference implementation plus structural invariants.

The operator has no SQL oracle by nature (k-means fit + union-find);
this is its correctness pin, the same discipline as ``bpe_train``'s
reference-trainer parity."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import table
from mapreduce_grpc_spark.operators.similarity import (
    SEMANTIC_COS_THRESHOLD,
    _semantic_clusters,
    semantic_dedup,
)


def _reference_semdedup(ids, embs, clusters, dists, threshold):
    """Straight-line numpy SemDeDup: per cluster, full O(n^2) pairwise
    cosine, connected components, keep the max-centroid-distance member
    (vec_id tie-break)."""
    keep, gsize = {}, {}
    for c in sorted(set(clusters)):
        idx = sorted(
            (i for i in range(len(ids)) if clusters[i] == c),
            key=lambda i: ids[i],
        )
        E = np.stack([embs[i] for i in idx]).astype(np.float64)
        norms = np.linalg.norm(E, axis=1)
        norms[norms == 0.0] = 1.0
        E = E / norms[:, None]
        sims = E @ E.T
        n = len(idx)
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for a in range(n):
            for b in range(a + 1, n):
                if sims[a, b] >= threshold:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        groups = {}
        for i in range(n):
            groups.setdefault(find(i), []).append(i)
        for members in groups.values():
            best = max(
                members,
                key=lambda i: (dists[idx[i]], -ids[idx[i]]),
            )
            for i in members:
                keep[ids[idx[i]]] = i == best
                gsize[ids[idx[i]]] = len(members)
    return keep, gsize


def test_semantic_dedup_matches_reference(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    got = {
        r.vec_id: (r.cluster, r.keep, r.group_size)
        for r in semantic_dedup(spark, emb).collect()
    }
    # the same seeded sample-fit the operator ran (deterministic by
    # construction) gives the reference its clusters
    assign = _semantic_clusters(spark, emb, k=8, seed=42)
    rows = emb.join(assign, "vec_id").collect()
    ids = [r.vec_id for r in rows]
    embs = [list(r.embedding) for r in rows]
    clusters = [r.cluster for r in rows]
    dists = {r.vec_id: r.dist_sq for r in rows}
    keep, gsize = _reference_semdedup(
        ids, embs, clusters, [dists[i] for i in ids],
        SEMANTIC_COS_THRESHOLD,
    )
    assert set(got) == set(ids)
    for i in ids:
        assert got[i][1] == keep[i], f"keep mismatch for vec {i}"
        assert got[i][2] == gsize[i], f"group_size mismatch for vec {i}"


def test_semantic_dedup_invariants(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    res = semantic_dedup(spark, emb).persist()
    try:
        n = emb.count()
        assert res.count() == n  # a decision for every vector
        # at least one group is a real duplicate group at this
        # threshold, and every vector with group_size 1 is kept
        assert res.filter("group_size > 1").count() > 0
        assert res.filter("group_size = 1 AND NOT keep").count() == 0
        # kept representatives: dropping keeps exactly the group count
        kept = res.filter("keep").count()
        assert 0 < kept <= n
        # determinism across runs
        again = {
            (r.vec_id, r.keep)
            for r in semantic_dedup(spark, emb).collect()
        }
        assert {(r.vec_id, r.keep) for r in res.collect()} == again
    finally:
        res.unpersist()


def test_semantic_dedup_oversize_cluster_refused(spark):
    import mapreduce_grpc_spark.operators.similarity as sim

    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=3) for _ in range(4)]).alias("embedding"),
    )
    old = sim.MAX_SEMANTIC_CLUSTER_ROWS
    sim.MAX_SEMANTIC_CLUSTER_ROWS = 5
    try:
        with pytest.raises(Exception, match="MAX_SEMANTIC_CLUSTER_ROWS"):
            semantic_dedup(spark, emb, k=2).collect()
    finally:
        sim.MAX_SEMANTIC_CLUSTER_ROWS = old
