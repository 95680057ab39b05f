"""Delta commit records + compacted manifest checkpoints.

The manifest layer stores each commit as a DELTA (``adds``/``removes``)
and reconstructs full state by replaying from the nearest compacted
checkpoint (``checkpoint-v{N}.json`` + ``_last_checkpoint`` pointer) —
so read/commit driver cost is O(changed files + recent deltas), not
O(one JSON string listing every live file).  These tests pin:

- every version file is delta-format and the reconstruction equals a
  brute-force replay of the raw records from v1;
- checkpoints appear on the interval, the pointer tracks the latest,
  and cold reads (cache cleared) start from the checkpoint;
- time travel below the latest checkpoint still reconstructs;
- GC writes a checkpoint at the retention floor BEFORE deleting the
  delta chain under it, so every retained version stays readable;
- rewrite commits (MoR deletion vectors) record the rewritten file in
  BOTH lists, which is exactly what the streaming reader treats as a
  change commit.

Runs over both FS backends (``snapshot_fs``).
"""

from __future__ import annotations

import json
import os

import pytest

from mapreduce_grpc_spark.sources import snapshots as snap
from mapreduce_grpc_spark.sources.snapshots import (
    current_version,
    delete_where_mor,
    expire_snapshots,
    read_manifest,
    snap_append,
    snap_init,
    snap_read,
    snap_restore,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _df(spark, lo, n=10):
    # one file per batch: keeps the delta records small and makes the
    # MoR-delete test mask PART of a file (dv) instead of all of it
    return (
        spark.range(lo, lo + n)
        .selectExpr("id AS k", "CAST(id * 2 AS DOUBLE) AS v")
        .coalesce(1)
    )


def _raw(path, v):
    with open(os.path.join(path, "_manifests", f"v{v}.json")) as fh:
        return json.load(fh)


def _brute_force_files(path, version):
    """Replay every raw commit record from v1 — the reconstruction
    oracle, independent of checkpoints and the cache."""
    by_name: dict = {}
    for v in range(1, version + 1):
        raw = _raw(path, v)
        if "files" in raw:
            by_name = {e["name"]: e for e in raw["files"]}
            continue
        for n in raw.get("removes") or ():
            by_name.pop(n, None)
        for e in raw.get("adds") or ():
            by_name[e["name"]] = e
    return by_name


@pytest.fixture
def small_interval(monkeypatch):
    monkeypatch.setattr(snap, "CHECKPOINT_INTERVAL", 4)


def test_delta_records_match_brute_force(spark, tmp_path, small_interval):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    for i in range(1, 7):
        snap_append(spark, path, _df(spark, i * 100))
    cur = current_version(path)
    assert cur == 7
    for v in range(1, cur + 1):
        raw = _raw(path, v)
        assert "files" not in raw, f"v{v} is not delta-format"
        assert "adds" in raw and "removes" in raw
        m = read_manifest(path, v)
        got = {e["name"]: e for e in m["files"]}
        assert got == _brute_force_files(path, v)
    # appends never remove
    assert all(not _raw(path, v)["removes"] for v in range(1, cur + 1))
    # the data still round-trips
    assert snap_read(spark, path).count() == 70


def test_checkpoint_written_on_interval_and_used_cold(
    spark, tmp_path, small_interval
):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    for i in range(1, 9):
        snap_append(spark, path, _df(spark, i * 100))
    mdir = os.path.join(path, "_manifests")
    assert os.path.exists(os.path.join(mdir, "checkpoint-v4.json"))
    assert os.path.exists(os.path.join(mdir, "checkpoint-v8.json"))
    assert open(os.path.join(mdir, "_last_checkpoint")).read().strip() == "8"
    ckpt = json.loads(open(os.path.join(mdir, "checkpoint-v8.json")).read())
    assert {e["name"] for e in ckpt["files"]} == set(
        _brute_force_files(path, 8)
    )
    # cold read (no cache): v9 must come from checkpoint-v8 + one delta
    snap._RECON_CACHE.clear()
    m = read_manifest(path, 9)
    assert {e["name"] for e in m["files"]} == set(_brute_force_files(path, 9))
    assert snap_read(spark, path).count() == 90


def test_time_travel_below_latest_checkpoint(spark, tmp_path, small_interval):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    for i in range(1, 6):
        snap_append(spark, path, _df(spark, i * 100))
    snap._RECON_CACHE.clear()
    # v3 < checkpoint-v4: the pointer fast path does not apply; the
    # reconstruction must replay from v1 (or an older checkpoint)
    m3 = read_manifest(path, 3)
    assert {e["name"] for e in m3["files"]} == set(_brute_force_files(path, 3))
    assert snap_read(spark, path, version=3).count() == 30


def test_rewrite_commit_records_both_lists(spark, tmp_path, small_interval):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    delete_where_mor(spark, path, [("k", "<", 3)])
    raw = _raw(path, 2)
    # the masked file was rewritten in place: old name removed, new
    # entry (same name, dv attached) added
    assert raw["removes"], "MoR delete must record a remove"
    add_names = {e["name"] for e in raw["adds"]}
    assert set(raw["removes"]) <= add_names
    assert all(e.get("dv") for e in raw["adds"])
    assert snap_read(spark, path).count() == 7


def test_restore_is_pure_delta(spark, tmp_path, small_interval):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    snap_append(spark, path, _df(spark, 100))
    snap_restore(path, 1)
    raw = _raw(path, 3)
    # rolling back to v1 removes exactly v2's files, adds nothing
    assert not raw["adds"]
    assert set(raw["removes"]) == {
        e["name"] for e in _raw(path, 2)["adds"]
    }
    assert snap_read(spark, path).count() == 10


def test_expire_checkpoints_retention_floor(spark, tmp_path, small_interval):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    for i in range(1, 10):
        snap_append(spark, path, _df(spark, i * 100))
    cur = current_version(path)  # 10
    deleted = expire_snapshots(path, keep_last=3, orphan_grace_seconds=1e9)
    mdir = os.path.join(path, "_manifests")
    v_min = cur - 2  # 8
    # a checkpoint exists at the retention floor...
    assert os.path.exists(os.path.join(mdir, f"checkpoint-v{v_min}.json"))
    # ...expired delta records are gone...
    assert any(name == "v1.json" for name in deleted)
    assert not os.path.exists(os.path.join(mdir, "v1.json"))
    # ...obsolete checkpoints are gone (v4 < floor; v8 retained)
    assert not os.path.exists(os.path.join(mdir, "checkpoint-v4.json"))
    # ...and every retained version reconstructs COLD
    snap._RECON_CACHE.clear()
    for v in range(v_min, cur + 1):
        assert snap_read(spark, path, version=v).count() == v * 10
    # expired history is loudly unreadable
    with pytest.raises(FileNotFoundError):
        read_manifest(path, 2)


def test_stream_reader_uses_delta_records(spark, tmp_path, small_interval):
    """End-to-end: the streaming source plans batches from the delta
    records (adds/removes), including skipping a change commit."""
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    snap_append(spark, path, _df(spark, 100))
    delete_where_mor(spark, path, [("k", "<", 3)])  # change commit v3
    snap_append(spark, path, _df(spark, 200))

    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", path)
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.read.parquet(out)
    # v1 (10) + v2 (10) + v4 (10); the v3 dv-rewrite commit is skipped
    assert got.count() == 30


class _FailingCheckpointFS:
    """FS wrapper that fails every checkpoint write — the injected
    ENOSPC / broken-object-store failure mode."""

    def __init__(self, inner):
        self._inner = inner

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def create_exclusive(self, path, text):
        if os.path.basename(path).startswith("checkpoint-v"):
            raise OSError("injected checkpoint write failure")
        return self._inner.create_exclusive(path, text)


def test_gc_aborts_when_floor_checkpoint_write_fails(
    spark, tmp_path, small_interval, snapshot_fs
):
    """A failed retention-floor checkpoint must ABORT the GC with the
    table fully intact — deleting the delta chain without its
    reconstruction base would be permanent table loss."""
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    for i in range(1, 3):
        snap_append(spark, path, _df(spark, i * 100))
    cur = current_version(path)
    manifests_before = sorted(
        os.listdir(os.path.join(path, "_manifests"))
    )
    failing = _FailingCheckpointFS(snapshot_fs.fs)
    with pytest.raises(Exception):
        expire_snapshots(path, keep_last=1, fs=failing)
    # nothing deleted: every manifest survives and every version reads
    assert (
        sorted(os.listdir(os.path.join(path, "_manifests")))
        == manifests_before
    )
    snap._RECON_CACHE.clear()
    for v in range(1, cur + 1):
        assert snap_read(spark, path, version=v).count() == v * 10
    # with the failure gone the same GC succeeds
    deleted = expire_snapshots(path, keep_last=1)
    assert any(n.startswith("v") for n in deleted)
    assert snap_read(spark, path).count() == cur * 10


def test_interval_checkpoint_failure_warns_not_raises(
    tmp_path, snapshot_fs
):
    """Best-effort interval checkpoints stay best-effort, but failures
    are counted and warned — never silent (a persistently failing
    writer degrades every cold read to full replay)."""
    path = str(tmp_path / "t")
    os.makedirs(os.path.join(path, "_manifests"), exist_ok=True)
    failing = _FailingCheckpointFS(snapshot_fs.fs)
    snap._CKPT_FAILURES.pop(path, None)
    with pytest.warns(RuntimeWarning, match="checkpoint write failed"):
        ok = snap._maybe_checkpoint(
            failing, path, snap.CHECKPOINT_INTERVAL, []
        )
    assert ok is False
    assert snap._CKPT_FAILURES[path] == 1
    with pytest.warns(RuntimeWarning, match="2 consecutive"):
        snap._maybe_checkpoint(failing, path, snap.CHECKPOINT_INTERVAL, [])
    # a successful write clears the failure streak
    ok = snap._maybe_checkpoint(
        snapshot_fs.fs, path, snap.CHECKPOINT_INTERVAL, []
    )
    assert ok is True
    assert path not in snap._CKPT_FAILURES
    # and force=True PROPAGATES instead of warning
    with pytest.raises(OSError):
        snap._maybe_checkpoint(
            failing, path, snap.CHECKPOINT_INTERVAL + 1, [], force=True
        )


def test_recon_cache_keys_on_commit_uid(spark, tmp_path, snapshot_fs):
    """The reconstruction cache keys on the commit record's random uid,
    so a table dir deleted and re-created at the same path can never
    serve a stale file list (stat-pair keys could collide under coarse
    mtime granularity)."""
    import shutil

    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    raw1 = _raw(path, 1)
    assert raw1.get("uid")
    key = snap._recon_key(snapshot_fs.fs, path, 1, raw1)
    assert key == (path, 1, raw1["uid"])
    # poison the cache under the OLD stat-based key shape: the uid key
    # must never hit it
    mp = os.path.join(path, "_manifests", "v1.json")
    stale_key = (
        path, 1, snapshot_fs.fs.getmtime(mp), snapshot_fs.fs.getsize(mp)
    )
    snap._RECON_CACHE[stale_key] = [{"name": "data-STALE.parquet"}]
    names1 = {e["name"] for e in read_manifest(path, 1)["files"]}
    assert "data-STALE.parquet" not in names1
    # re-create the table at the same path: fresh uid, fresh listing
    shutil.rmtree(path)
    snap_init(spark, _df(spark, 500), path, stats_cols=["k"])
    raw1b = _raw(path, 1)
    assert raw1b["uid"] != raw1["uid"]
    names2 = {e["name"] for e in read_manifest(path, 1)["files"]}
    assert names2 == {e["name"] for e in raw1b["adds"]}
    assert names2.isdisjoint(names1)
    assert snap_read(spark, path).agg({"k": "min"}).collect()[0][0] == 500


def test_multipart_checkpoint_roundtrip_and_gc(
    spark, tmp_path, small_interval, monkeypatch, snapshot_fs
):
    """Past CHECKPOINT_SHARD_ENTRIES the checkpoint lands as bounded
    parts plus a pointer written LAST — cold reads load all parts, an
    interrupted writer leaves no half-visible checkpoint, GC prunes
    parts with their pointer, and a missing part fails LOUDLY."""
    monkeypatch.setattr(snap, "CHECKPOINT_SHARD_ENTRIES", 3)
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    for i in range(1, 9):
        snap_append(spark, path, _df(spark, i * 100))
    mdir = os.path.join(path, "_manifests")
    # v4 and v8 checkpoints (interval 4) hold 4 and 8 files: sharded
    ptr = json.loads(open(os.path.join(mdir, "checkpoint-v8.json")).read())
    assert "files" not in ptr and ptr["parts"] == 3
    parts = sorted(
        n for n in os.listdir(mdir) if ".part-" in n and "v8" in n
    )
    assert len(parts) == 3
    # cold reconstruction from the sharded checkpoint == brute force
    snap._RECON_CACHE.clear()
    got = {e["name"]: e for e in read_manifest(path)["files"]}
    assert got == _brute_force_files(path, current_version(path))
    assert snap_read(spark, path).count() == 90

    # interrupted writer: kill the pointer, keep the parts — the
    # checkpoint must stop existing (pointer is the commit point),
    # and the next checkpoint attempt completes it reusing the parts
    os.remove(os.path.join(mdir, "checkpoint-v8.json"))
    snap._RECON_CACHE.clear()
    assert snap_read(spark, path).count() == 90  # replays fine
    assert snap._maybe_checkpoint(
        snapshot_fs.fs, path, 8, read_manifest(path, 8)["files"],
        force=True,
    )
    snap._RECON_CACHE.clear()
    assert snap_read(spark, path, version=8).count() == 80

    # GC: the floor checkpoint (multi-part) is written and every part
    # below the floor is pruned with its pointer
    deleted = expire_snapshots(path, keep_last=2, orphan_grace_seconds=0)
    v_min = current_version(path) - 1
    assert os.path.exists(
        os.path.join(mdir, f"checkpoint-v{v_min}.json")
    )
    left = sorted(
        n for n in os.listdir(mdir) if n.startswith("checkpoint-v")
    )
    assert all(
        int(n[len("checkpoint-v"):].split(".", 1)[0]) >= v_min
        for n in left
    ), left
    assert any(".part-" in n for n in deleted) or all(
        ".part-" not in n for n in os.listdir(mdir)
        if int(n.split("-v")[1].split(".")[0]) < v_min
    )
    snap._RECON_CACHE.clear()
    assert snap_read(spark, path).count() == 90

    # a missing PART under an existing pointer is loud corruption
    part_files = sorted(
        n for n in os.listdir(mdir) if ".part-" in n
    )
    if part_files:
        os.remove(os.path.join(mdir, part_files[0]))
        snap._RECON_CACHE.clear()
        with pytest.raises(FileNotFoundError):
            read_manifest(path)
