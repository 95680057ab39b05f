"""Distributed scan planning (checkpoint parts pruned in Spark tasks)
must be answer-identical to the driver planner — same surviving file
set, same rows — across deltas since the checkpoint, column mapping,
deletion vectors, and every fallback edge."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources import plan_distributed as PD
from mapreduce_grpc_spark.sources import snapshots as S
from mapreduce_grpc_spark.sources.snapshots import (
    current_version,
    delete_where_mor,
    merge_upsert_cow,
    prune_manifest,
    read_manifest,
    snap_append,
    snap_init,
    snap_scan,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


@pytest.fixture()
def small_shards(monkeypatch):
    """Force multi-part checkpoints on fixture-size tables."""
    monkeypatch.setattr(S, "CHECKPOINT_SHARD_ENTRIES", 8)
    monkeypatch.setattr(S, "CHECKPOINT_INTERVAL", 4)
    monkeypatch.setattr(PD, "AUTO_MIN_PARTS", 2)


def _add(spark, path, lo, hi, files=2):
    snap_append(
        spark,
        path,
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        .repartitionByRange(files, "k"),
    )


def _mk_checkpointed(spark, path):
    """A table whose head sits ABOVE a multi-part checkpoint with real
    post-checkpoint deltas: adds, a CoW rewrite (removes), MoR DVs."""
    snap_init(
        spark,
        spark.range(0, 100).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ).repartitionByRange(4, "k"),
        path,
        stats_cols=["k"],
    )
    for i in range(1, 8):
        _add(spark, path, 100 * (i + 1), 100 * (i + 1) + 50)
    # post-checkpoint deltas (interval=4 -> checkpoints exist below):
    merge_upsert_cow(
        spark,
        path,
        spark.createDataFrame(
            [(5, "UP5"), (2000, "NEW")], "k bigint, v string"
        ),
        keys=["k"],
    )
    delete_where_mor(spark, path, [("k", "between", 210, 219)])
    ckpt = S._find_checkpoint(S._fs(None), path, current_version(path))
    assert ckpt > 0
    assert PD._checkpoint_parts(S._fs(None), path, ckpt), (
        "fixture must produce a multi-part checkpoint"
    )
    return ckpt


PREDS = [
    [("k", "between", 200, 260)],
    [("k", "=", 5)],
    [("k", ">=", 750)],
    [("k", "=", 5), "or", ("k", "between", 400, 410)],
    [("k", "=", -1)],  # prunes everything
]


@pytest.mark.parametrize("preds", PREDS)
def test_distributed_equals_driver(spark, tmp_path, small_shards, preds):
    path = str(tmp_path / "t")
    _mk_checkpointed(spark, path)

    S._RECON_CACHE.clear()
    planned = PD.plan_scan_entries(spark, path, preds)
    assert planned is not None, "cold multi-part table must distribute"
    entries, raw = planned
    m = read_manifest(path)
    kept_driver, _ = prune_manifest(m, preds)
    assert sorted(e["name"] for e in entries) == sorted(
        e["name"] for e in kept_driver
    )
    # entry CONTENT matches too (dv info must survive the round-trip)
    assert {e["name"]: e for e in entries} == {
        e["name"]: e for e in kept_driver
    }

    S._RECON_CACHE.clear()
    got = sorted(
        (r.k, r.v)
        for r in snap_scan(spark, path, preds, planner="distributed")
        .collect()
    )
    want = sorted(
        (r.k, r.v)
        for r in snap_scan(spark, path, preds, planner="driver").collect()
    )
    assert got == want


def test_deleted_rows_stay_dead(spark, tmp_path, small_shards):
    path = str(tmp_path / "t")
    _mk_checkpointed(spark, path)
    S._RECON_CACHE.clear()
    got = snap_scan(
        spark, path, [("k", "between", 205, 225)], planner="distributed"
    ).collect()
    ks = sorted(r.k for r in got)
    assert ks == [205, 206, 207, 208, 209] + list(range(220, 226))


def test_time_travel_below_head(spark, tmp_path, small_shards):
    path = str(tmp_path / "t")
    _mk_checkpointed(spark, path)
    v = current_version(path) - 1  # before the MoR delete
    S._RECON_CACHE.clear()
    got = sorted(
        r.k
        for r in snap_scan(
            spark, path, [("k", "between", 210, 214)], version=v,
            planner="distributed",
        ).collect()
    )
    assert got == [210, 211, 212, 213, 214]


def test_column_mapping_translates(spark, tmp_path, small_shards):
    path = str(tmp_path / "t")
    _mk_checkpointed(spark, path)
    S.snap_rename_column(path, "k", "key")
    S._RECON_CACHE.clear()
    planned = PD.plan_scan_entries(spark, path, [("key", "=", 5)])
    assert planned is not None
    got = snap_scan(
        spark, path, [("key", "=", 5)], planner="distributed"
    ).collect()
    assert [(r.key, r.v) for r in got] == [(5, "UP5")]


def test_auto_dispatch(spark, tmp_path, small_shards):
    path = str(tmp_path / "t")
    _mk_checkpointed(spark, path)
    preds = [("k", "=", 5)]
    # cold: auto distributes
    S._RECON_CACHE.clear()
    assert PD.plan_scan_entries(spark, path, preds, planner="auto")
    # warm: a cached reconstruction makes the driver loop cheaper
    read_manifest(path)
    assert (
        PD.plan_scan_entries(spark, path, preds, planner="auto") is None
    )
    # forced: distributes even when warm
    assert PD.plan_scan_entries(
        spark, path, preds, planner="distributed"
    )
    with pytest.raises(ValueError, match="planner"):
        PD.plan_scan_entries(spark, path, preds, planner="gpu")


def test_fallback_without_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(
        spark,
        spark.range(10).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        ),
        path,
        stats_cols=["k"],
    )
    assert (
        PD.plan_scan_entries(
            spark, path, [("k", "=", 1)], planner="distributed"
        )
        is None
    )
    got = snap_scan(
        spark, path, [("k", "=", 1)], planner="distributed"
    ).collect()
    assert [(r.k, r.v) for r in got] == [(1, "x")]


def test_partition_pruning_in_distributed_planner(
    spark, tmp_path, small_shards
):
    """Hidden partitioning composes with distributed planning: the
    derived partition predicates prune inside the checkpoint-part
    tasks (shared _physical_branches), and distributed answers equal
    the driver planner's exactly."""
    import datetime

    from mapreduce_grpc_spark.sources.snapshots import snap_scan

    path = str(tmp_path / "t")
    n, days = 200, 20
    # fan each append into several files (AQE would fold a 200-row
    # batch into one, leaving the checkpoint single-part)
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")

    def ev(lo):
        return spark.range(lo, lo + n).selectExpr(
            "id AS k",
            f"timestamp_seconds(1704067200 + CAST((id % {n}) * "
            f"({days} * 86400.0 / {n}) AS BIGINT)) AS ts",
            "CAST(id % 11 AS BIGINT) AS u",
        )

    try:
        snap_init(
            spark, ev(0), path, stats_cols=["k"],
            partition_by=["days(ts)", "bucket(4, u)"],
        )
        for i in range(1, 8):
            snap_append(spark, path, ev(1000 * i))
    finally:
        spark.conf.set(key, prev)
    ckpt = S._find_checkpoint(S._fs(None), path, current_version(path))
    assert ckpt > 0 and PD._checkpoint_parts(S._fs(None), path, ckpt)

    lo = datetime.datetime(2024, 1, 3)
    hi = datetime.datetime(2024, 1, 5)
    for preds in (
        [("ts", "between", lo, hi)],
        [("u", "=", 7)],
        [("ts", ">=", lo), ("u", "in", [1, 2])],
    ):
        drv = sorted(
            map(tuple, snap_scan(
                spark, path, preds, planner="driver"
            ).collect())
        )
        dist = sorted(
            map(tuple, snap_scan(
                spark, path, preds, planner="distributed"
            ).collect())
        )
        assert drv == dist and drv, preds
    # and the derived predicates actually prune entries in the
    # distributed plan (not just keep-everything conservatism)
    planned = PD.plan_scan_entries(
        spark, path, [("ts", "between", lo, hi)], None, None,
        "distributed",
    )
    assert planned is not None
    entries, raw = planned
    total_files = len(
        S.read_manifest(path)["files"]
    )
    assert len(entries) < total_files, (
        f"distributed planner kept {len(entries)}/{total_files}"
    )
