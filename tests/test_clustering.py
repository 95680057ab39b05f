"""K-means operator: oracle parity, Lloyd-improvement invariant, and a
planted well-separated-clusters check.

AUX query (the driver contract is at its 50-query cap), so the DuckDB
hash check the driver would run lives here.
"""

from __future__ import annotations

import os

import duckdb as _duck
import pytest
from pyspark.sql import functions as F

from mapreduce_grpc_spark import registry
from mapreduce_grpc_spark.catalog import TABLES, table
from mapreduce_grpc_spark.operators.clustering import (
    K,
    _assign,
    _update,
    kmeans_clusters,
    kmeans_pp_fit,
)
from tests.oracle import assert_oracle_match


def test_kmeans_oracle_parity(spark, sf_dir):
    df = kmeans_clusters(spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["kmeans_clusters"], sf_dir, "kmeans_clusters"
    )


def test_kmeans_partition_and_bounds(spark, sf_dir):
    """Every vector gets exactly one cluster in [0, K); distances >= 0."""
    emb = table(spark, sf_dir, "embeddings")
    df = kmeans_clusters(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == emb.count()
    assert len({r.vec_id for r in rows}) == len(rows)
    for r in rows:
        assert 0 <= r.cluster < K
        assert r.dist_sq >= 0.0


def test_kmeans_lloyd_monotone_improvement(spark, sf_dir):
    """The mean squared distance after the centroid update (pass 2) is <=
    after the init assignment (pass 1) — Lloyd's objective never worsens."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    expl = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent0 = emb.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("k"), F.col("embedding").alias("carr")
    )
    a1 = _assign(emb, cent0)
    a2 = _assign(emb, _update(expl, a1))
    sse1 = a1.agg(F.sum("dist_sq")).collect()[0][0]
    sse2 = a2.agg(F.sum("dist_sq")).collect()[0][0]
    assert sse2 <= sse1 + 1e-9


def test_kmeans_planted_separated_clusters(spark, tmp_path, sf_dir):
    """Vectors drawn from K tight, far-apart blobs must be grouped with
    their blob-mates regardless of which blob each init centroid hit."""
    fake_sf = tmp_path / "sf_fake"
    fake_sf.mkdir()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t != "embeddings" and os.path.exists(src):
            os.symlink(src, fake_sf / f"{t}.parquet")
    # K blobs at 100*b along axis b; members offset by 0.1 * (i+1).
    # vec_ids 0..K-1 are one member of each blob (deterministic init =
    # one centroid per blob), then 3 more members per blob.
    rows = []
    for b in range(K):
        for i in range(4):
            vec = [0.0] * 8
            vec[b] = 100.0 + 0.1 * i
            rows.append((b if i == 0 else K + b * 3 + (i - 1), b, vec))
    con = _duck.connect()
    con.execute("CREATE TABLE e (vec_id BIGINT, label INTEGER, embedding FLOAT[])")
    con.executemany(
        "INSERT INTO e VALUES (?, ?, ?)", [(v, b, vec) for v, b, vec in rows]
    )
    con.execute(
        "COPY (SELECT vec_id, embedding, label FROM e ORDER BY vec_id) TO "
        f"'{fake_sf}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.close()
    got = {r.vec_id: r.cluster for r in kmeans_clusters(spark, str(fake_sf)).collect()}
    blob = {v: b for v, b, _ in rows}
    # all members of a blob share a cluster, and distinct blobs differ
    by_blob = {}
    for v, c in got.items():
        by_blob.setdefault(blob[v], set()).add(c)
    assert all(len(cs) == 1 for cs in by_blob.values()), by_blob
    assert len({next(iter(cs)) for cs in by_blob.values()}) == K
    assert_oracle_match(
        kmeans_clusters(spark, str(fake_sf)),
        registry.AUX_ORACLES["kmeans_clusters"],
        str(fake_sf),
        "kmeans_clusters_synthetic",
    )


def _inertia(assign_df) -> float:
    return assign_df.agg(F.sum("dist_sq")).collect()[0][0]


def _adversarial_blobs(spark):
    """K tight blobs with vec_ids arranged so the smallest-id init is
    PATHOLOGICAL: ids 0..K-1 all live in blob 0, so naive init seeds all
    K centroids inside one blob."""
    rows = []
    vid = 0
    for i in range(K):  # blob 0 gets the first K ids
        vec = [0.0] * 8
        vec[0] = 100.0 + 0.1 * i
        rows.append((vid, vec))
        vid += 1
    for b in range(1, K):  # remaining blobs: 4 members each
        for i in range(4):
            vec = [0.0] * 8
            vec[b] = 100.0 + 0.1 * i
            rows.append((vid, vec))
            vid += 1
    return (
        spark.createDataFrame(
            [(v, [float(x) for x in vec]) for v, vec in rows],
            "vec_id bigint, embedding array<float>",
        ),
        {v: ([0] * K + [b for b in range(1, K) for _ in range(4)])[v]
         for v, _ in rows},
    )


def test_kmeans_pp_beats_smallest_id_init_on_adversarial_blobs(spark):
    """k-means++'s D²-biased seeding spreads centroids across blobs where
    the smallest-id init collapses them into one — strictly lower
    converged inertia, and every blob recovered exactly."""
    emb, blob_of = _adversarial_blobs(spark)

    assign_pp, rounds = kmeans_pp_fit(spark, emb)
    assert rounds >= 1

    # naive init twin: same Lloyd loop but seeded from the K smallest ids
    from pyspark.sql import Window

    seeds = emb.orderBy("vec_id").limit(K)
    cent0 = seeds.select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1)
        .cast("long")
        .alias("k"),
        F.col("embedding").alias("carr"),
    )
    naive1 = _assign(emb, cent0)

    assert _inertia(assign_pp) < _inertia(naive1)

    got = {r.vec_id: r.cluster for r in assign_pp.collect()}
    by_blob = {}
    for v, c in got.items():
        by_blob.setdefault(blob_of[v], set()).add(c)
    assert all(len(cs) == 1 for cs in by_blob.values()), by_blob
    assert len({next(iter(cs)) for cs in by_blob.values()}) == K


def test_kmeans_pp_fixpoint_and_determinism(spark):
    """On separated blobs the loop reaches a genuine fixpoint (a second
    fit from the converged state changes nothing) and reruns are
    bit-identical (no RNG object anywhere)."""
    emb, _ = _adversarial_blobs(spark)
    a1, r1 = kmeans_pp_fit(spark, emb)
    a2, r2 = kmeans_pp_fit(spark, emb)
    assert r1 == r2
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    # every vector assigned exactly once, clusters within range
    rows = a1.collect()
    assert len({r.vec_id for r in rows}) == len(rows) == emb.count()
    assert all(0 <= r.cluster < K for r in rows)


def test_kmeans_pp_on_fixture(spark, sf_dir):
    """Converges on the real embeddings table; converged inertia is no
    worse than the 2-round unrolled twin's (same K, more rounds)."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assign, rounds = kmeans_pp_fit(spark, emb)
    assert rounds >= 1
    assert assign.count() == emb.count()
    unrolled = kmeans_clusters(spark, sf_dir)
    assert _inertia(assign) <= _inertia(unrolled) * 1.05


def test_kmeans_fit_snapshot_roundtrip_and_refit_determinism(
    spark, sf_dir, tmp_path
):
    """fit -> persist -> predict round-trip: the persisted assignment
    equals a fresh predict from the persisted centroids; a re-fit on the
    same data commits a NEW version with identical centroids
    (deterministic), and the old model version stays readable."""
    from mapreduce_grpc_spark.operators.clustering import (
        kmeans_fit_snapshot,
        kmeans_predict_snapshot,
    )
    from mapreduce_grpc_spark.sources.snapshots import snap_read

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "model")
    info = kmeans_fit_snapshot(spark, emb, path)
    assert info["k"] >= 2 and info["centroids_version"] == 1

    persisted = {
        r.vec_id: r.cluster
        for r in snap_read(spark, path + "/assignment").collect()
    }
    predicted = {
        r.vec_id: r.cluster
        for r in kmeans_predict_snapshot(spark, path, emb).collect()
    }
    assert persisted == predicted

    def _cents(version=None):
        return sorted(
            (r.cluster, tuple(r.centroid))
            for r in snap_read(spark, path + "/centroids", version).collect()
        )

    c1 = _cents()
    info2 = kmeans_fit_snapshot(spark, emb, path)
    assert info2["centroids_version"] == 2
    assert _cents() == c1  # deterministic re-fit
    assert _cents(version=1) == c1  # model lineage time travel
