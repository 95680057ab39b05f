"""IVF vector index on the snapshot layer: build / search / insert,
manifest pruning of unprobed cells, bloom-proven no-rewrite inserts,
and recall against brute force."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import table
from mapreduce_grpc_spark.functions.vectors import cosine
from mapreduce_grpc_spark.sources.snapshots import (
    prune_manifest,
    read_manifest,
    snap_read,
)
from mapreduce_grpc_spark.sources.vector_index import (
    _postings_path,
    ivf_index_init,
    ivf_index_insert,
    ivf_search,
)


# every test in this module runs under BOTH commit-protocol FS
# backends (POSIX + object-store semantics) — see conftest.snapshot_fs
pytestmark = pytest.mark.usefixtures("snapshot_fs")


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    info = ivf_index_init(spark, emb, path, n_cells=8, seed=42)
    return path, emb, info


def test_build_and_search_recall_vs_brute_force(spark, index):
    path, emb, info = index
    assert info["postings_version"] == 1
    q = (
        emb.orderBy("vec_id")
        .limit(15)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    got = ivf_search(spark, path, q, nprobe=2, top_k=10)
    approx = {(r.q_id, r.neighbor_id) for r in got.collect()}

    brute = (
        q.crossJoin(emb)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("cos_sim"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rank") <= 10)
    )
    exact = {(r.q_id, r.neighbor_id) for r in brute.collect()}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"IVF nprobe=2 recall {recall:.2f} too low"
    # every query got a full result page, self-match at rank 1
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.q_id, []).append(r)
    for q_id, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert rows[0].neighbor_id == q_id and rows[0].cos_sim == pytest.approx(1.0)


def test_search_prunes_unprobed_cell_files(spark, index):
    path, emb, _info = index
    m = read_manifest(_postings_path(path))
    assert len(m["files"]) >= 2
    # a single-cell predicate must keep strictly fewer files than all
    kept, skipped = prune_manifest(m, [("cell", "in", [0])])
    assert skipped, "cell-clustered layout must let the manifest prune"
    # pruned scan result == unpruned filter (pruning is advisory)
    from mapreduce_grpc_spark.sources.snapshots import snap_scan

    a = sorted(
        r.vec_id
        for r in snap_scan(spark, _postings_path(path), [("cell", "=", 0)]).collect()
    )
    b = sorted(
        r.vec_id
        for r in snap_read(spark, _postings_path(path))
        .filter(F.col("cell") == 0)
        .collect()
    )
    assert a == b


def test_insert_fresh_ids_rewrites_nothing_and_is_searchable(
    spark, index, snapshot_fs
):
    path, emb, _info = index
    # a fresh vector placed exactly on an existing vector's embedding:
    # must land in that vector's cell and come back as its neighbor
    probe = emb.orderBy(F.desc("vec_id")).limit(1).collect()[0]
    # the index fixture is module-scoped and this test MUTATES it —
    # each FS-backend run needs its own genuinely-fresh id
    new_id = 10_000_001 + (0 if snapshot_fs.name == "local" else 1000)
    new = spark.createDataFrame(
        [(new_id, list(probe.embedding))],
        "vec_id long, embedding array<float>",
    )
    res = ivf_index_insert(spark, path, new)
    assert res["rewritten"] == 0, f"fresh id must be a pure insert: {res}"
    assert res["added"] >= 1

    q = spark.createDataFrame(
        [(probe.vec_id, list(probe.embedding))],
        "q_id long, q_emb array<float>",
    )
    got = ivf_search(spark, path, q, nprobe=1, top_k=3).collect()
    top_ids = {r.neighbor_id for r in got if r.cos_sim > 0.999999}
    assert new_id in top_ids

    # re-insert the SAME id with a different embedding: exactly one
    # posting row survives (CoW replace, no duplicates)
    other = emb.orderBy("vec_id").limit(1).collect()[0]
    upd = spark.createDataFrame(
        [(new_id, list(other.embedding))],
        "vec_id long, embedding array<float>",
    )
    res2 = ivf_index_insert(spark, path, upd)
    assert res2["rewritten"] >= 1
    rows = (
        snap_read(spark, _postings_path(path))
        .filter(F.col("vec_id") == new_id)
        .collect()
    )
    assert len(rows) == 1
    assert [float(x) for x in rows[0].embedding] == pytest.approx(
        [float(x) for x in other.embedding]
    )


def test_rebuild_is_deterministic(spark, sf_dir, tmp_path):
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ivf_index_init(spark, emb, a, n_cells=8, seed=42)
    ivf_index_init(spark, emb, b, n_cells=8, seed=42)
    pa = sorted(
        (r.vec_id, r.cell)
        for r in snap_read(spark, _postings_path(a)).collect()
    )
    pb = sorted(
        (r.vec_id, r.cell)
        for r in snap_read(spark, _postings_path(b)).collect()
    )
    assert pa == pb
