"""Snapshot tables + file-level copy-on-write MERGE: version isolation,
time travel, footer-stats file pruning, and the untouched-files-are-
byte-identical guarantee the partition-level writer cannot give."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources.snapshots import (
    apply_cdc_cow,
    current_version,
    expire_snapshots,
    merge_upsert_cow,
    optimize_snapshot,
    read_manifest,
    snap_init,
    snap_read,
)


def _mk_table(spark, path, n=1000, n_files=4):
    """A snapshot table clustered on k (disjoint per-file key ranges) —
    the layout that makes envelope pruning effective."""
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        .repartitionByRange(n_files, "k")
        .sortWithinPartitions("k")
    )
    snap_init(spark, df, path, stats_cols=["k"])
    return df


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def test_init_read_roundtrip_and_manifest_stats(spark, tmp_path):
    path = str(tmp_path / "snap")
    df = _mk_table(spark, path)
    assert current_version(path) == 1
    assert _rows(snap_read(spark, path)) == _rows(df)
    m = read_manifest(path)
    assert len(m["files"]) == 4
    # footer envelopes present and disjoint-ish (clustered layout)
    envs = sorted(
        (f["stats"]["k"]["min"], f["stats"]["k"]["max"]) for f in m["files"]
    )
    for (lo1, hi1), (lo2, _hi2) in zip(envs, envs[1:]):
        assert lo1 <= hi1 < lo2
    assert sum(f["rows"] for f in m["files"]) == 1000


def test_cow_merge_rewrites_only_overlapping_files(spark, tmp_path):
    path = str(tmp_path / "snap")
    _mk_table(spark, path)
    before_m = read_manifest(path)
    mtimes = {
        f["name"]: os.path.getmtime(os.path.join(path, f["name"]))
        for f in before_m["files"]
    }

    # keys 10..19 live in the first file's range only
    updates = spark.createDataFrame(
        [(k, f"UPD{k}") for k in range(10, 20)], "k bigint, v string"
    )
    res = merge_upsert_cow(spark, path, updates, keys=["k"])
    assert res["version"] == 2
    assert res["rewritten"] == 1 and res["carried"] == 3

    # carried files are the SAME files — not rewritten, mtime unchanged
    after_m = read_manifest(path)
    carried_names = set(f["name"] for f in after_m["files"]) & set(mtimes)
    assert len(carried_names) == 3
    for name in carried_names:
        assert os.path.getmtime(os.path.join(path, name)) == mtimes[name]

    got = dict(_rows(snap_read(spark, path)))
    assert len(got) == 1000
    for k in range(10, 20):
        assert got[k] == f"UPD{k}"
    assert got[0] == "v0" and got[999] == "v999"


def test_cow_merge_inserts_new_keys_and_keeps_single_copy(spark, tmp_path):
    path = str(tmp_path / "snap")
    _mk_table(spark, path, n=100, n_files=2)
    updates = spark.createDataFrame(
        [(50, "UPD50"), (5000, "NEW")], "k bigint, v string"
    )
    merge_upsert_cow(spark, path, updates, keys=["k"])
    got = _rows(snap_read(spark, path))
    ks = [k for k, _ in got]
    assert len(ks) == len(set(ks)) == 101  # no duplicate key anywhere
    assert dict(got)[50] == "UPD50" and dict(got)[5000] == "NEW"


def test_cow_merge_rejects_duplicate_key_batch(spark, tmp_path):
    path = str(tmp_path / "snap")
    _mk_table(spark, path, n=10, n_files=1)
    dup = spark.createDataFrame(
        [(1, "x"), (1, "y")], "k bigint, v string"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_upsert_cow(spark, path, dup, keys=["k"])
    assert current_version(path) == 1  # nothing committed


def test_time_travel_and_reader_isolation(spark, tmp_path):
    path = str(tmp_path / "snap")
    df = _mk_table(spark, path)
    v1_rows = _rows(df)

    # a reader resolves v1 BEFORE the writer commits v2
    reader_plan = snap_read(spark, path)

    updates = spark.createDataFrame([(0, "UPD0")], "k bigint, v string")
    merge_upsert_cow(spark, path, updates, keys=["k"])
    assert current_version(path) == 2

    # the racing reader still sees a consistent v1 (no torn state)
    assert _rows(reader_plan) == v1_rows
    # explicit time travel
    assert _rows(snap_read(spark, path, version=1)) == v1_rows
    assert dict(_rows(snap_read(spark, path)))[0] == "UPD0"


def test_optimize_compacts_small_files_and_carries_big(spark, tmp_path):
    """OPTIMIZE bin-packs only sub-target files; a healthy file is
    carried by reference (byte-identical); rows survive exactly; the
    pre-optimize version stays time-travel readable."""
    path = str(tmp_path / "snap")
    # 8 tiny files
    df = (
        spark.range(400)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        .repartition(8)
    )
    snap_init(spark, df, path, stats_cols=["k"])
    m1 = read_manifest(path)
    assert len(m1["files"]) == 8
    big = max(
        os.path.getsize(os.path.join(path, f["name"])) for f in m1["files"]
    )

    # threshold chosen so every file is "small" -> all 8 bin-packed
    res = optimize_snapshot(spark, path, target_bytes=big * 8)
    assert res["rewritten"] == 8 and res["version"] == 2
    m2 = read_manifest(path)
    assert len(m2["files"]) < 8
    assert _rows(snap_read(spark, path)) == _rows(df)
    assert _rows(snap_read(spark, path, version=1)) == _rows(df)

    # a now-healthy file is carried on the next pass: nothing qualifies
    res2 = optimize_snapshot(spark, path, target_bytes=1)  # all are "big"
    assert res2["rewritten"] == 0 and res2["version"] == 2  # no new commit


def test_optimize_zorder_tightens_envelopes_for_cow_merge(spark, tmp_path):
    """Z-order OPTIMIZE rewrites the table clustered on the merge key, so
    a subsequent CoW merge overlaps strictly fewer files than before."""
    path = str(tmp_path / "snap")
    # layout hostile to key pruning: round-robin partitioning spreads
    # every key range across every file
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("x"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    snap_init(spark, df.repartition(8), path, stats_cols=["k"])

    updates = spark.createDataFrame(
        [(k, 0.0, f"U{k}") for k in range(100, 120)],
        "k bigint, x double, v string",
    )
    pre = merge_upsert_cow(spark, path, updates, keys=["k"])
    assert pre["carried"] == 0, "round-robin layout should overlap all files"

    # cluster on (k, x); small target so several files result
    fsize = sum(
        os.path.getsize(os.path.join(path, f["name"]))
        for f in read_manifest(path)["files"]
    )
    optimize_snapshot(
        spark, path, target_bytes=max(1, fsize // 8), zorder=("k", "x")
    )
    updates2 = spark.createDataFrame(
        [(k, 0.0, f"W{k}") for k in range(200, 220)],
        "k bigint, x double, v string",
    )
    post = merge_upsert_cow(spark, path, updates2, keys=["k"])
    assert post["carried"] > 0, "clustered layout must let CoW carry files"
    # data still exact after the whole dance
    got = dict((r.k, r.v) for r in snap_read(spark, path).collect())
    assert len(got) == 2000
    assert got[110] == "U110" and got[210] == "W210" and got[0] == "v0"


def test_apply_cdc_cow_upserts_and_deletes(spark, tmp_path):
    """One CDC batch: U replaces, I inserts, D removes — atomically, in
    one version; pruning still carries non-overlapping files."""
    path = str(tmp_path / "snap")
    _mk_table(spark, path)  # keys 0..999 clustered into 4 files

    # narrow batch (keys 10..20): envelope pruning must carry the three
    # files whose ranges don't overlap
    batch = spark.createDataFrame(
        [(10, "UPD10", "U"), (20, None, "D")],
        "k bigint, v string, _op string",
    )
    res = apply_cdc_cow(spark, path, batch, keys=["k"])
    assert res["version"] == 2
    assert res["upserted"] == 1 and res["deleted"] == 1
    assert res["carried"] == 3, "far-away files must be carried"

    got = dict(_rows(snap_read(spark, path)))
    assert got[10] == "UPD10"
    assert 20 not in got
    assert len(got) == 999

    # second batch: insert outside the key range (widens envelope, fine)
    res2 = apply_cdc_cow(
        spark,
        path,
        spark.createDataFrame(
            [(5000, "NEW", "I")], "k bigint, v string, _op string"
        ),
        keys=["k"],
    )
    assert res2["version"] == 3 and res2["upserted"] == 1
    got = dict(_rows(snap_read(spark, path)))
    assert got[5000] == "NEW" and len(got) == 1000
    # batch atomicity: v1 still shows the pre-batch world
    v1 = dict(_rows(snap_read(spark, path, version=1)))
    assert v1[10] == "v10" and 20 in v1 and 5000 not in v1


def test_apply_cdc_cow_rejects_conflicting_ops(spark, tmp_path):
    path = str(tmp_path / "snap")
    _mk_table(spark, path, n=10, n_files=1)
    bad = spark.createDataFrame(
        [(1, "x", "I"), (1, None, "D")], "k bigint, v string, _op string"
    )
    with pytest.raises(ValueError, match="multiple ops"):
        apply_cdc_cow(spark, path, bad, keys=["k"])
    unknown = spark.createDataFrame(
        [(1, "x", "Z")], "k bigint, v string, _op string"
    )
    with pytest.raises(ValueError, match="unknown op"):
        apply_cdc_cow(spark, path, unknown, keys=["k"])
    assert current_version(path) == 1


def test_streaming_cdc_replays_to_final_state(spark, tmp_path):
    """A 3-file CDC feed streamed one file per micro-batch: per-key
    collapse inside each batch (delete->reinsert nets to insert), one
    snapshot version per batch, final state equals the hand-applied
    fold, and every intermediate version is auditable."""
    from mapreduce_grpc_spark.streaming.cdc import run_streaming_cdc

    path = str(tmp_path / "snap")
    _mk_table(spark, path, n=100, n_files=2)

    cdc = tmp_path / "cdc"
    # batches touch DISJOINT key sets: the file source's micro-batch
    # order is a listing order, not append order, so the expected final
    # state must be order-independent (within-batch ordering is what
    # collapse_cdc_batch owns, via seq)
    batches = [
        # update 1, delete 2
        [(1, "U1a", "U", 1), (2, None, "D", 2)],
        # key 3 deleted then re-inserted (nets to insert); key 4
        # updated twice (last seq wins)
        [
            (3, None, "D", 10),
            (3, "R3", "I", 11),
            (4, "U4a", "U", 12),
            (4, "U4b", "U", 13),
        ],
        # insert a fresh key
        [(200, "N200", "I", 20)],
    ]
    for rows in batches:
        spark.createDataFrame(
            rows, "k bigint, v string, _op string, seq bigint"
        ).coalesce(1).write.parquet(str(cdc), mode="append")

    log = run_streaming_cdc(
        spark, str(cdc), path, keys=["k"], checkpoint_dir=str(tmp_path / "ck")
    )
    assert len(log) >= 1  # at least one non-empty batch applied
    assert sum(e["upserted"] for e in log) == 4  # U1a, R3, U4b, N200
    assert sum(e["deleted"] for e in log) == 1  # key 2 (key 3 netted out)

    got = dict(_rows(snap_read(spark, path)))
    assert got[1] == "U1a"
    assert 2 not in got
    assert got[3] == "R3"
    assert got[4] == "U4b"
    assert got[200] == "N200"
    assert len(got) == 100  # 100 - delete(2) + insert(200)
    # audit: version count advanced once per applied batch
    assert current_version(path) == 1 + len(log)


def test_verify_snapshot_fsck(spark, tmp_path):
    """Healthy table verifies clean; an out-of-band file deletion is
    reported as missing (the failure GC-past-a-pinned-reader causes)."""
    from mapreduce_grpc_spark.sources.snapshots import verify_snapshot

    path = str(tmp_path / "snap")
    _mk_table(spark, path)
    rep = verify_snapshot(path)
    assert rep["files"] == 4 and rep["rows"] == 1000
    assert rep["missing"] == [] and rep["mismatched"] == []

    victim = read_manifest(path)["files"][0]["name"]
    os.remove(os.path.join(path, victim))
    rep2 = verify_snapshot(path)
    assert rep2["missing"] == [victim]


def test_two_racing_writers_one_wins(spark, tmp_path):
    """Optimistic concurrency: two writers both resolving v1 cannot both
    claim v2 — the loser raises (FileExistsError from the 'x'-mode
    manifest claim) and its data files become expirable orphans, never a
    corrupted CURRENT."""
    from mapreduce_grpc_spark.sources.snapshots import (
        _commit,
        _write_data_files,
    )

    path = str(tmp_path / "snap")
    _mk_table(spark, path, n=100, n_files=1)

    # writer A prepares + commits v2
    dfa = spark.createDataFrame([(1000, "A")], "k bigint, v string")
    files_a = _write_data_files(spark, dfa, path, ["k"])
    assert _commit(path, files_a, ["k"]) == 2

    # writer B prepared against v1 concurrently; its claim of v2 loses
    dfb = spark.createDataFrame([(2000, "B")], "k bigint, v string")
    files_b = _write_data_files(spark, dfb, path, ["k"])
    import unittest.mock as mock

    with mock.patch(
        "mapreduce_grpc_spark.sources.snapshots.current_version",
        return_value=1,
    ):
        with pytest.raises(FileExistsError):
            _commit(path, files_b, ["k"])
    # table is healthy at A's version; B's files are orphans that GC
    assert current_version(path) == 2
    got = dict(_rows(snap_read(spark, path)))
    assert got.get(1000) == "A" and 2000 not in got
    deleted = expire_snapshots(path, keep_last=1)
    assert {f["name"] for f in files_b} <= set(deleted)


def test_cow_merge_rejects_schema_mismatch(spark, tmp_path):
    path = str(tmp_path / "snap")
    _mk_table(spark, path, n=10, n_files=1)
    extra = spark.createDataFrame(
        [(1, "x", 9.9)], "k bigint, v string, bogus double"
    )
    with pytest.raises(ValueError, match="batch columns"):
        merge_upsert_cow(spark, path, extra, keys=["k"])
    missing = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="batch columns"):
        merge_upsert_cow(spark, path, missing, keys=["k"])
    assert current_version(path) == 1


def test_expire_snapshots_gc(spark, tmp_path):
    path = str(tmp_path / "snap")
    _mk_table(spark, path)
    updates = spark.createDataFrame([(0, "UPD0")], "k bigint, v string")
    merge_upsert_cow(spark, path, updates, keys=["k"])

    # plant an orphan (crashed writer residue)
    orphan = os.path.join(path, "data-orphan-part-0.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"junk")

    v1_files = {f["name"] for f in read_manifest(path, 1)["files"]}
    v2_files = {f["name"] for f in read_manifest(path, 2)["files"]}
    deleted = set(expire_snapshots(path, keep_last=1))
    # v1-only files and the orphan are gone; v2's files survive
    assert (v1_files - v2_files) <= deleted
    assert "data-orphan-part-0.parquet" in deleted
    for name in v2_files:
        assert os.path.exists(os.path.join(path, name))
    # current still reads after GC; v1 manifest is gone
    assert len(_rows(snap_read(spark, path))) == 1000
    with pytest.raises(FileNotFoundError):
        read_manifest(path, 1)
