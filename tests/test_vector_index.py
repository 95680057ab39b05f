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


def _recall(spark, path, live_emb, n_q=12, nprobe=2, top_k=10, **kw):
    """IVF recall@top_k vs brute force over the LIVE embedding set."""
    from mapreduce_grpc_spark.sources.vector_index import ivf_search

    q = (
        live_emb.orderBy("vec_id")
        .limit(n_q)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    approx = {
        (r.q_id, r.neighbor_id)
        for r in ivf_search(
            spark, path, q, nprobe=nprobe, top_k=top_k, **kw
        ).collect()
    }
    brute = (
        q.crossJoin(live_emb)
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
        .filter(F.col("rank") <= top_k)
    )
    exact = {(r.q_id, r.neighbor_id) for r in brute.collect()}
    return len(approx & exact) / len(exact)


def test_delete_then_insert_churn_holds_recall(spark, sf_dir, tmp_path):
    """Insert+delete churn: deleted ids vanish from results immediately
    (MoR deletion vectors, no file rewritten), re-inserts resurface,
    and recall over the LIVE set stays at the fresh-build baseline."""
    from mapreduce_grpc_spark.sources.snapshots import read_manifest as _rm
    from mapreduce_grpc_spark.sources.vector_index import (
        ivf_index_delete,
        ivf_index_init,
        ivf_index_insert,
        ivf_search,
    )

    path = str(tmp_path / "idx")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ivf_index_init(spark, emb, path, n_cells=8, seed=42)
    base_recall = _recall(spark, path, emb)

    # delete a third of the ids
    all_ids = [r.vec_id for r in emb.select("vec_id").collect()]
    dead = sorted(all_ids)[:: 3]
    m_before = _rm(_postings_path(path))
    res = ivf_index_delete(spark, path, dead)
    assert res["deleted"] == len(dead)
    m_after = _rm(_postings_path(path))
    # MoR: same data files, just DV'd
    assert {e["name"] for e in m_after["files"]} == {
        e["name"] for e in m_before["files"]
    }

    live = emb.filter(~F.col("vec_id").isin(dead))
    got = ivf_search(
        spark,
        path,
        live.limit(5).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        ),
        nprobe=8,
        top_k=1000,
    )
    assert not {r.neighbor_id for r in got.collect()} & set(dead)
    assert _recall(spark, path, live) >= base_recall - 0.05

    # churn back: re-insert half the dead ids
    back = emb.filter(F.col("vec_id").isin(dead[: len(dead) // 2]))
    ivf_index_insert(spark, path, back)
    live2 = live.unionByName(back)
    assert _recall(spark, path, live2) >= base_recall - 0.05


def test_rebalance_splits_skewed_cell_and_rebounds_probe_cost(
    spark, sf_dir, tmp_path
):
    """A hostile layout — one cell holding most of the corpus — is
    re-bounded by the budgeted rebalance: the offender is split into
    sub-cells, per-cell max occupancy drops, a probe of that region
    reads fewer candidate rows, and recall does not regress."""
    from mapreduce_grpc_spark.sources.vector_index import (
        ivf_cell_stats,
        ivf_index_init,
        ivf_index_insert,
        ivf_rebalance,
    )

    path = str(tmp_path / "idx")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.limit(1).collect()[0].embedding)
    # base index over a tight cluster near +e0 plus scattered vectors
    ivf_index_init(spark, emb, path, n_cells=6, seed=42)

    # pile a tight blob of new vectors onto ONE region -> one fat cell
    blob = spark.range(200_000, 200_800).select(
        F.col("id").alias("vec_id"),
        F.array(
            *(
                [F.lit(10.0) + (F.col("id") % 7).cast("double") / 100.0]
                + [
                    (F.col("id") % (i + 3)).cast("double") / 50.0
                    for i in range(1, dim)
                ]
            )
        ).cast("array<float>").alias("embedding"),
    )
    ivf_index_insert(spark, path, blob)

    stats0 = {
        r.cell: r.n_vectors
        for r in ivf_cell_stats(spark, path).collect()
    }
    import statistics as _st

    assert max(stats0.values()) > 4.0 * _st.median(stats0.values()), stats0
    live = emb.unionByName(blob)
    recall_before = _recall(spark, path, live)

    res = ivf_rebalance(spark, path, skew_factor=4.0, max_splits=1, seed=7)
    assert len(res["split_cells"]) == 1 and len(res["new_cells"]) >= 1
    fat = res["split_cells"][0]
    stats1 = {
        r.cell: r.n_vectors
        for r in ivf_cell_stats(spark, path).collect()
    }
    assert fat not in stats1
    assert set(res["new_cells"]) <= set(stats1)
    # the offender's postings were genuinely split across the sub-cells
    assert max(stats1.get(c, 0) for c in res["new_cells"]) < stats0[fat]
    assert sum(stats1.get(c, 0) for c in res["new_cells"]) == stats0[fat]
    # probe cost in the hot region is re-bounded: a query in the blob
    # now reads the sub-cell, not the whole former fat cell
    from mapreduce_grpc_spark.sources.snapshots import snap_scan

    worst_new = max(
        res["new_cells"], key=lambda c: stats1.get(c, 0)
    )
    assert (
        snap_scan(
            spark, _postings_path(path), [("cell", "=", worst_new)]
        ).count()
        < stats0[fat]
    )
    # recall over everything does not regress
    assert _recall(spark, path, live) >= recall_before - 0.05


def test_ivf_repair_reattaches_orphan_cells(spark, sf_dir, tmp_path):
    """The rebalance crash window (postings moved, centroid swap never
    landed): orphan cells hide their vectors from every probe.
    ivf_repair recomputes the orphan's centroid from its postings and
    searches find the vectors again; a healthy index is a no-op."""
    from mapreduce_grpc_spark.sources.snapshots import (
        merge_upsert_cow,
        snap_scan,
    )
    from mapreduce_grpc_spark.sources.vector_index import (
        ivf_index_init,
        ivf_repair,
        ivf_search,
    )

    path = str(tmp_path / "idx")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ivf_index_init(spark, emb, path, n_cells=6, seed=42)

    moved = snap_scan(
        spark, _postings_path(path), [("cell", "=", 0)]
    ).select(
        "vec_id", F.lit(100).cast("int").alias("cell"), "embedding"
    )
    rows = moved.collect()
    assert rows, "fixture must populate cell 0"
    merge_upsert_cow(
        spark,
        _postings_path(path),
        spark.createDataFrame(rows, moved.schema),
        keys=["vec_id"],
    )

    probe = rows[0]
    q = spark.createDataFrame(
        [(probe.vec_id, list(probe.embedding))],
        "q_id long, q_emb array<float>",
    )
    # all 6 known cells probed -> the orphaned vector is invisible
    got = ivf_search(spark, path, q, nprobe=6, top_k=5)
    assert probe.vec_id not in {r.neighbor_id for r in got.collect()}

    res = ivf_repair(spark, path)
    assert res["repaired_cells"] == [100]
    got2 = ivf_search(spark, path, q, nprobe=7, top_k=5)
    top = sorted(got2.collect(), key=lambda r: r.rank)
    assert top[0].neighbor_id == probe.vec_id

    assert ivf_repair(spark, path)["repaired_cells"] == []


def test_merge_cells_folds_sparse_cells_recall_held(spark, sf_dir, tmp_path):
    """Churn leaves near-empty cells that waste probe slots; the
    budgeted merge folds each into its nearest sibling: centroid count
    drops, probing the old sparse region reads the merged REAL cell,
    and recall does not regress."""
    from mapreduce_grpc_spark.sources.vector_index import (
        ivf_cell_stats,
        ivf_index_delete,
        ivf_index_init,
        ivf_merge_cells,
        ivf_repair,
    )

    path = str(tmp_path / "idx")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ivf_index_init(spark, emb, path, n_cells=6, seed=42)
    stats0 = {
        r.cell: r.n_vectors for r in ivf_cell_stats(spark, path).collect()
    }
    # churn: delete ~90% of the two smallest cells' vectors
    import statistics as _st

    small = sorted(stats0, key=lambda c: stats0[c])[:2]
    victims = (
        snap_read(spark, _postings_path(path))
        .filter(F.col("cell").isin([int(c) for c in small]))
        .select("vec_id")
        .withColumn("r", F.col("vec_id") % 10)
        .filter(F.col("r") != 0)
        .select("vec_id")
    )
    ivf_index_delete(spark, path, victims)
    live = emb.join(victims, "vec_id", "left_anti")
    recall_before = _recall(spark, path, live)
    n_cents_before = snap_read(spark, path + "/centroids").count()

    res = ivf_merge_cells(spark, path, sparse_factor=0.25, max_merges=2)
    assert res["merged"], res
    sources = {s for s, _t in res["merged"]}
    targets = {t for _s, t in res["merged"]}
    stats1 = {
        r.cell: r.n_vectors for r in ivf_cell_stats(spark, path).collect()
    }
    # merged-away cells hold no postings and no centroid
    assert not (sources & set(stats1))
    cents_after = {
        r.cell
        for r in snap_read(spark, path + "/centroids").collect()
    }
    assert not (sources & cents_after)
    assert targets <= cents_after
    assert len(cents_after) == n_cents_before - len(res["merged"])
    # probe cost: every remaining probed cell is a REAL cell — the
    # index never spends a probe slot on a merged-away sparse cell
    assert ivf_repair(spark, path)["repaired_cells"] == []
    # recall over the live set does not regress
    assert _recall(spark, path, live) >= recall_before - 0.05


def test_merge_cells_removes_zero_posting_centroid(spark, sf_dir, tmp_path):
    """A cell whose every vector died is pure quantizer litter: the
    merge deletes its centroid without moving any postings."""
    from mapreduce_grpc_spark.sources.vector_index import (
        ivf_cell_stats,
        ivf_index_delete,
        ivf_index_init,
        ivf_merge_cells,
    )

    path = str(tmp_path / "idx")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ivf_index_init(spark, emb, path, n_cells=5, seed=42)
    stats0 = {
        r.cell: r.n_vectors for r in ivf_cell_stats(spark, path).collect()
    }
    dead = min(stats0, key=lambda c: stats0[c])
    ivf_index_delete(
        spark,
        path,
        snap_read(spark, _postings_path(path))
        .filter(F.col("cell") == int(dead))
        .select("vec_id"),
    )
    res = ivf_merge_cells(spark, path, sparse_factor=0.25, max_merges=1)
    assert any(s == dead for s, _t in res["merged"]), res
    cents = {
        r.cell for r in snap_read(spark, path + "/centroids").collect()
    }
    assert dead not in cents


def test_drift_trigger_and_refit(spark, tmp_path):
    """The quantizer is frozen between re-trains; a distribution shift
    in the inserts must surface as measurable drift, and the scheduled
    refit must restore assignment quality (ratio back to ~1) with the
    history time-travelable.  Controlled geometry: two tight clusters
    at fit time, a third far cluster inserted after."""
    from mapreduce_grpc_spark.sources.vector_index import (
        ivf_drift_stats,
        ivf_index_init,
        ivf_index_insert,
        ivf_refit,
    )

    path = str(tmp_path / "idx")

    def _cluster(lo, n, axis, dim=8):
        # tight blob along one axis with a small per-id wobble
        comps = [
            (
                F.lit(10.0) + (F.col("id") % 7).cast("double") / 100.0
                if i == axis
                else (F.col("id") % (i + 3)).cast("double") / 100.0
            )
            for i in range(dim)
        ]
        return spark.range(lo, lo + n).select(
            F.col("id").alias("vec_id"),
            F.array(*comps).cast("array<float>").alias("embedding"),
        )

    fit_set = _cluster(0, 300, axis=0).unionByName(
        _cluster(1000, 300, axis=1)
    )
    info = ivf_index_init(spark, fit_set, path, n_cells=2, seed=42)
    assert info["drift_baseline"] < 0.05  # tight clusters: good fit
    d0 = ivf_drift_stats(spark, path)
    assert d0["drift_ratio"] == pytest.approx(1.0, abs=1e-6)
    assert not d0["refit_recommended"]

    # a far third cluster the fit never saw
    blob = _cluster(2000, 300, axis=5)
    ivf_index_insert(spark, path, blob)
    d1 = ivf_drift_stats(spark, path, refit_threshold=1.25)
    assert d1["drift_ratio"] > 1.25, d1
    assert d1["refit_recommended"]

    res = ivf_refit(spark, path, n_cells=3, seed=7)
    assert res["cells"] == 3
    d2 = ivf_drift_stats(spark, path)
    assert d2["drift_ratio"] == pytest.approx(1.0, abs=1e-6)
    assert not d2["refit_recommended"]
    # refit quality: the new quantizer fits the shifted corpus better
    assert res["drift_baseline"] < d1["mean_dist_now"]
    # the live set is fully searchable post-refit
    live = fit_set.unionByName(blob)
    assert _recall(spark, path, live) >= 0.9
    # pre-refit postings remain time-travelable (overwrite, not wipe)
    from mapreduce_grpc_spark.sources.snapshots import current_version

    pv = current_version(_postings_path(path))
    assert (
        snap_read(spark, _postings_path(path), version=pv - 1).count()
        == snap_read(spark, _postings_path(path)).count()
    )


def test_repair_completes_interrupted_refit(spark, tmp_path):
    """ivf_refit's crash window (postings overwritten, centroids not)
    leaves NO orphan cell when n_cells is unchanged — the shared txn
    marker is what identifies it, and repair rebuilds every centroid
    from the committed new assignments."""
    from mapreduce_grpc_spark.sources.snapshots import (
        current_version,
        snap_overwrite,
    )
    from mapreduce_grpc_spark.sources.vector_index import (
        _centroids_path,
        ivf_drift_stats,
        ivf_index_init,
        ivf_repair,
    )

    path = str(tmp_path / "idx")

    def _cluster(lo, n, axis, dim=8):
        comps = [
            (
                F.lit(10.0) + (F.col("id") % 7).cast("double") / 100.0
                if i == axis
                else (F.col("id") % (i + 3)).cast("double") / 100.0
            )
            for i in range(dim)
        ]
        return spark.range(lo, lo + n).select(
            F.col("id").alias("vec_id"),
            F.array(*comps).cast("array<float>").alias("embedding"),
        )

    fit = _cluster(0, 200, 0).unionByName(_cluster(1000, 200, 1))
    ivf_index_init(spark, fit, path, n_cells=2, seed=42)

    # simulate the crashed refit: swap the two clusters' cell labels
    # and commit ONLY the postings (with the refit marker) — same cell
    # ids, so the orphan check alone cannot see anything wrong
    post = snap_read(spark, _postings_path(path))
    flipped = post.select(
        "vec_id",
        (F.lit(1) - F.col("cell")).cast("int").alias("cell"),
        "embedding",
    )
    marker = current_version(_postings_path(path)) + 1
    snap_overwrite(
        spark, _postings_path(path), flipped,
        txn_app="ivf_refit", txn_batch=marker,
    )
    # the quantizer is now WRONG (centroids belong to the old labels):
    # drift shows it, and repair detects the marker mismatch
    assert ivf_drift_stats(spark, path)["drift_ratio"] > 5
    res = ivf_repair(spark, path)
    assert res.get("refit_completed"), res
    # centroids rebuilt from the committed assignments: healthy again
    d = ivf_drift_stats(spark, path)
    assert d["mean_dist_now"] < 0.05
    # idempotent: a second repair is a plain no-op
    assert ivf_repair(spark, path) == {"repaired_cells": []}
    assert _recall(spark, path, fit) >= 0.9


# --- IVF-PQ (compressed postings + ADC search) ------------------------


@pytest.fixture(scope="module")
def pq_index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    info = ivf_index_init(
        spark, emb, path, n_cells=8, seed=42, pq_m=16, pq_k=32
    )
    return path, emb, info


def _pairs(rows):
    return {(r.q_id, r.neighbor_id) for r in rows}


def test_pq_index_schema_and_adc_agreement(spark, pq_index):
    path, emb, info = pq_index
    assert info["pq"] is True
    post = snap_read(spark, _postings_path(path))
    assert "pq_code" in post.columns
    assert post.filter(F.col("pq_code").isNull()).count() == 0
    q = (
        emb.orderBy("vec_id")
        .limit(10)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    exact = ivf_search(spark, path, q, nprobe=2, top_k=5).collect()
    adc = ivf_search(
        spark, path, q, nprobe=2, top_k=5, method="adc"
    ).collect()
    assert len(adc) == len(exact)
    # same probed cells, quantization only chooses candidates: high
    # overlap with the exact in-cell ranking (measured 0.96; floor 0.7)
    overlap = len(_pairs(adc) & _pairs(exact)) / len(_pairs(exact))
    assert overlap >= 0.7, overlap
    # emitted scores are EXACT cosine: every common pair agrees exactly
    ex_scores = {(r.q_id, r.neighbor_id): r.cos_sim for r in exact}
    for r in adc:
        if (r.q_id, r.neighbor_id) in ex_scores:
            assert abs(r.cos_sim - ex_scores[(r.q_id, r.neighbor_id)]) < 1e-12


def test_pq_code_survives_insert_and_refit(spark, pq_index):
    from mapreduce_grpc_spark.sources.vector_index import ivf_refit

    path, emb, _ = pq_index
    new = emb.limit(25).select(
        (F.col("vec_id") + 500_000).alias("vec_id"), "embedding"
    )
    ivf_index_insert(spark, path, new)
    post = snap_read(spark, _postings_path(path))
    assert post.filter(F.col("pq_code").isNull()).count() == 0, (
        "inserted vectors must be encoded with the persisted codebooks"
    )
    ivf_refit(spark, path, n_cells=8)
    post = snap_read(spark, _postings_path(path))
    assert "pq_code" in post.columns
    assert post.filter(F.col("pq_code").isNull()).count() == 0, (
        "refit moves postings between cells without losing codes"
    )
    q = emb.limit(5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    rows = ivf_search(
        spark, path, q, nprobe=2, top_k=5, method="adc"
    ).collect()
    assert len(rows) == 25


def test_opq_index_end_to_end(spark, sf_dir, tmp_path_factory):
    """IVF-PQ with the OPQ learned rotation (opq=True): the rotation
    persists as sub = -1 model rows and is orthogonal; ADC search
    still emits EXACT cosine and overlaps the exact in-cell ranking;
    inserts encode through the SAME rotation (codes for re-inserted
    vectors equal their original postings' codes)."""
    import numpy as np

    from mapreduce_grpc_spark.sources.vector_index import (
        _load_pq_model,
        _pq_books_path,
    )

    path = str(tmp_path_factory.mktemp("ivfopq") / "idx")
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    info = ivf_index_init(
        spark, emb, path, n_cells=8, seed=42, pq_m=16, pq_k=32, opq=True
    )
    assert info["opq"] is True
    books, rotation = _load_pq_model(spark, path, None)
    assert books is not None and rotation is not None
    R = np.asarray(rotation, dtype=np.float64)
    assert R.shape == (64, 64)
    assert float(np.abs(R @ R.T - np.eye(64)).max()) < 1e-10
    # persisted as sub = -1 rows in the one model table
    model = snap_read(spark, _pq_books_path(path))
    assert model.filter(F.col("sub") == -1).count() == 64
    # search: exact-cosine scores, bounded overlap with exact ranking
    q = (
        emb.orderBy("vec_id")
        .limit(10)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    exact = ivf_search(spark, path, q, nprobe=2, top_k=5).collect()
    adc = ivf_search(
        spark, path, q, nprobe=2, top_k=5, method="adc"
    ).collect()
    assert len(adc) == len(exact)
    overlap = len(_pairs(adc) & _pairs(exact)) / len(_pairs(exact))
    assert overlap >= 0.7, overlap
    ex_scores = {(r.q_id, r.neighbor_id): r.cos_sim for r in exact}
    for r in adc:
        if (r.q_id, r.neighbor_id) in ex_scores:
            assert abs(r.cos_sim - ex_scores[(r.q_id, r.neighbor_id)]) < 1e-12
    # insert path rotates too: re-insert existing vectors under fresh
    # ids; their codes must equal the original postings' codes
    sample_ids = [r.vec_id for r in emb.orderBy("vec_id").limit(20).collect()]
    new = emb.filter(F.col("vec_id").isin(sample_ids)).select(
        (F.col("vec_id") + 700_000).alias("vec_id"), "embedding"
    )
    ivf_index_insert(spark, path, new)
    post = snap_read(spark, _postings_path(path))
    orig_codes = {
        r.vec_id: tuple(r.pq_code)
        for r in post.filter(F.col("vec_id").isin(sample_ids)).collect()
    }
    ins_codes = {
        r.vec_id - 700_000: tuple(r.pq_code)
        for r in post.filter(F.col("vec_id") >= 700_000).collect()
    }
    assert ins_codes == orig_codes


def test_adc_on_flat_index_refused(spark, index):
    path, emb, _ = index
    q = emb.limit(1).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    with pytest.raises(ValueError, match="no PQ codebooks"):
        ivf_search(spark, path, q, method="adc").collect()


def test_adc_query_batch_sharded(spark, pq_index):
    """Batches past ADC_QUERY_MAX shard internally (2 x max + 1
    queries -> 3 slices here) and the union answers equal
    method='exact' when the candidate set is exhaustive: all cells
    probed + rerank_factor big enough that every scanned row is a
    candidate, so the exact re-rank sees exactly what exact sees."""
    from mapreduce_grpc_spark.sources import vector_index as vi

    path, emb, _ = pq_index
    n_q = 2 * 2 + 1
    q = emb.orderBy("vec_id").limit(n_q).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    orig = vi.ADC_QUERY_MAX
    vi.ADC_QUERY_MAX = 2
    try:
        adc = ivf_search(
            spark, path, q, nprobe=8, top_k=5, method="adc",
            rerank_factor=400,
        ).collect()
    finally:
        vi.ADC_QUERY_MAX = orig
    exact = ivf_search(spark, path, q, nprobe=8, top_k=5).collect()
    assert sorted(
        (r.q_id, r.neighbor_id, r.rank) for r in adc
    ) == sorted((r.q_id, r.neighbor_id, r.rank) for r in exact)
    ex_scores = {(r.q_id, r.neighbor_id): r.cos_sim for r in exact}
    for r in adc:
        assert r.cos_sim == ex_scores[(r.q_id, r.neighbor_id)]
    assert len({r.q_id for r in adc}) == n_q


def test_adc_query_batch_over_hard_cap_refused(spark, pq_index):
    """Batches past ADC_BATCH_HARD_MAX fail FAST (a bounded
    limit(n+1).count() probe, before any driver-side collect) with a
    pointer at method='exact' — the LUTs and candidate pairs are
    driver-held, so an unbounded batch must not be allowed to OOM the
    driver."""
    from mapreduce_grpc_spark.sources import vector_index as vi

    path, emb, _ = pq_index
    q = emb.orderBy("vec_id").limit(9).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    orig = vi.ADC_BATCH_HARD_MAX
    vi.ADC_BATCH_HARD_MAX = 8
    try:
        with pytest.raises(ValueError, match="method='exact'"):
            ivf_search(spark, path, q, nprobe=2, method="adc").collect()
        # exactly at the cap still runs
        ok = ivf_search(
            spark, path, q.limit(8), nprobe=2, top_k=3, method="adc"
        ).collect()
        assert len({r.q_id for r in ok}) == 8
    finally:
        vi.ADC_BATCH_HARD_MAX = orig


def test_filtered_search_prefilter_semantics(
    spark, sf_dir, tmp_path_factory
):
    """FILTERED vector search (payload_cols at init + where= at
    search): with nprobe == all cells the filtered exact search must
    equal the brute-force top-k over ONLY the matching rows — the
    pre-filter contract (a post-filter would come back short whenever
    the unfiltered top-k had few matching rows).  The ADC path holds
    the same contract with an exhaustive rerank; filters on unstored
    columns are refused; inserts must carry the payload."""
    import numpy as np

    path = str(tmp_path_factory.mktemp("ivfflt") / "idx")
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    ivf_index_init(
        spark, emb, path, n_cells=8, seed=42, pq_m=16, pq_k=32,
        payload_cols=["label"],
    )
    q = (
        emb.orderBy("vec_id")
        .limit(6)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    flt = [("label", "=", 3)]
    got = ivf_search(
        spark, path, q, nprobe=8, top_k=5, where=flt
    ).collect()
    # brute-force oracle over the label==3 subset
    all_rows = emb.collect()
    sub = [(r.vec_id, np.asarray(list(r.embedding))) for r in all_rows
           if r.label == 3]
    q_rows = [(r.vec_id, np.asarray(list(r.embedding)))
              for r in sorted(all_rows, key=lambda r: r.vec_id)[:6]]

    def _top5(qv):
        sims = sorted(
            (
                (float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), i)
                for i, v in sub
            ),
            key=lambda t: (-t[0], t[1]),
        )
        return [(i, s) for s, i in sims[:5]]

    want = {
        (qid, nid, rank + 1)
        for qid, qv in q_rows
        for rank, (nid, _s) in enumerate(_top5(qv))
    }
    assert {(r.q_id, r.neighbor_id, r.rank) for r in got} == want
    labels = {r.vec_id: r.label for r in all_rows}
    assert all(labels[r.neighbor_id] == 3 for r in got)
    # ADC path: exhaustive rerank over all cells == the exact answers
    adc = ivf_search(
        spark, path, q, nprobe=8, top_k=5, method="adc",
        rerank_factor=400, where=flt,
    ).collect()
    assert sorted((r.q_id, r.neighbor_id, r.rank) for r in adc) == sorted(
        (r.q_id, r.neighbor_id, r.rank) for r in got
    )
    # unstored filter column: refused with a pointer at payload_cols
    with pytest.raises(ValueError, match="payload_cols"):
        ivf_search(spark, path, q, where=[("source", "=", "x")]).collect()
    # inserts must carry the payload...
    fresh = emb.limit(4).select(
        (F.col("vec_id") + 900_000).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="missing"):
        ivf_index_insert(spark, path, fresh)
    # ...and carried payloads are immediately filterable
    ivf_index_insert(
        spark, path,
        emb.filter(F.col("label") == 3).limit(2).select(
            (F.col("vec_id") + 900_000).alias("vec_id"),
            "embedding", "label",
        ),
    )
    got2 = ivf_search(
        spark, path, q, nprobe=8, top_k=1000, where=flt
    ).collect()
    inserted = {r.neighbor_id for r in got2 if r.neighbor_id >= 900_000}
    assert len(inserted) == 2
