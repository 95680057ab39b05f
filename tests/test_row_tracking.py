"""Row tracking (the Delta row-ID model): stable row identities as
table metadata — fresh files get ``row_id_base`` watermark slices at
commit, id-preserving rewrites (OPTIMIZE) materialize a physical
``_row_id`` column, ``snap_read(..., with_row_ids=True)`` surfaces the
id, and the change feed uses the proof to skip pure-rearrangement
commits instead of read-and-cancelling them.

Held invariants: ids are unique per table version, never reused
(watermark only grows), stable under append / MoR delete / OPTIMIZE /
RESTORE, and a legacy build refuses to write a tracked table
(``row_tracking`` writer feature).  Phase 2 (same round): keyed CoW
rewrites (merge/CDC/update_where/merge_into) PRESERVE identity —
updated rows keep their old row's id, inserts draw fresh watermark
ids in their own files.  Runs under BOTH commit-protocol FS
backends."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources.snapshots import (
    apply_cdc_cow,
    delete_where_mor,
    merge_upsert_cow,
    optimize_snapshot,
    read_manifest,
    snap_append,
    snap_clone,
    snap_enable_row_tracking,
    snap_init,
    snap_read,
    snap_restore,
    table_changes,
    table_features,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _mk(spark, path, n=100, n_files=4, tracking=True):
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        .repartitionByRange(n_files, "k")
    )
    snap_init(spark, df, path, stats_cols=["k"], row_tracking=tracking)


def _ids(spark, path, version=None):
    return {
        r.k: r._row_id
        for r in snap_read(
            spark, path, version=version, with_row_ids=True
        ).collect()
    }


def test_init_assigns_bases_and_flags_writer_feature(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    m = read_manifest(path)
    assert m["row_tracking"] is True
    assert m["next_row_id"] == 100
    bases = sorted(e["row_id_base"] for e in m["files"])
    # disjoint contiguous slices covering [0, 100)
    rows = {e["row_id_base"]: e["rows"] for e in m["files"]}
    covered = sorted(
        i for b in bases for i in range(b, b + rows[b])
    )
    assert covered == list(range(100))
    assert table_features(path)["writer"] == ["row_tracking"]

    ids = _ids(spark, path)
    assert sorted(ids.values()) == list(range(100))


def test_enable_on_existing_table_is_retroactive_and_idempotent(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    _mk(spark, path, tracking=False)
    assert "row_tracking" not in read_manifest(path)
    with pytest.raises(ValueError, match="row tracking"):
        snap_read(spark, path, with_row_ids=True).collect()
    v = snap_enable_row_tracking(path)
    assert v == 2
    assert snap_enable_row_tracking(path) == 2  # no-op
    ids = _ids(spark, path)
    assert sorted(ids.values()) == list(range(100))
    # rows themselves untouched (metadata-only)
    assert snap_read(spark, path).count() == 100


def test_ids_stable_under_append_and_mor_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    before = _ids(spark, path)
    snap_append(
        spark, path,
        spark.range(100, 130).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )
    after = _ids(spark, path)
    assert all(after[k] == before[k] for k in before)
    assert len(set(after.values())) == 130
    assert read_manifest(path)["next_row_id"] == 130

    delete_where_mor(spark, path, [("k", "<", 20)])
    surv = _ids(spark, path)
    assert set(surv) == set(range(20, 130))
    assert all(surv[k] == after[k] for k in surv)
    # a masked id is gone, never reassigned
    assert read_manifest(path)["next_row_id"] == 130


def test_optimize_preserves_ids_exactly(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    snap_append(
        spark, path,
        spark.range(100, 120).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )
    delete_where_mor(spark, path, [("k", "between", 40, 49)])
    before = _ids(spark, path)
    res = optimize_snapshot(spark, path, target_bytes=10**9)
    assert res["added"] >= 1
    m = read_manifest(path)
    assert all(e.get("row_id_col") for e in m["files"])
    after = _ids(spark, path)
    assert after == before, "OPTIMIZE must preserve every id"
    # appends after an id-materializing rewrite keep extending the
    # watermark with no collision
    snap_append(
        spark, path,
        spark.range(200, 210).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )
    final = _ids(spark, path)
    assert len(set(final.values())) == len(final)
    assert all(final[k] == before[k] for k in before)


def test_zorder_optimize_preserves_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    before = _ids(spark, path)
    optimize_snapshot(spark, path, zorder=("k", "v"), equidepth=True)
    assert _ids(spark, path) == before


def _mk_overlapping(spark, path, tag_batches=("a", "b", "c"), n=100):
    """Tracked table whose files all overlap on ``k``: every batch
    spans the full key range, so the incremental re-clusterer always
    finds a multi-file overlap group."""

    def batch(tag):
        return spark.range(n).select(
            F.col("id").alias("k"),
            F.concat(F.lit(tag), F.col("id")).alias("v"),
        ).repartitionByRange(2, "k")

    snap_init(
        spark, batch(tag_batches[0]), path,
        stats_cols=["k"], row_tracking=True,
    )
    for tag in tag_batches[1:]:
        snap_append(spark, path, batch(tag))


def _ids_by_v(spark, path):
    """k duplicates across overlapping batches — key identity by the
    unique v payload instead."""
    return {
        r.v: r._row_id
        for r in snap_read(spark, path, with_row_ids=True).collect()
    }


def test_optimize_incremental_preserves_ids(spark, tmp_path):
    """The budgeted re-clusterer is a pure rearrangement and must keep
    every row's id — reading without ids would let _commit fresh-assign
    new ones (the r13 ADVICE-high gap), renumbering rewritten rows and
    making the keys-less change feed see a mass delete+insert for a
    layout-only commit."""
    from mapreduce_grpc_spark.sources.snapshots import optimize_incremental

    path = str(tmp_path / "t")
    _mk_overlapping(spark, path)
    before = _ids_by_v(spark, path)
    assert len(set(before.values())) == 300
    res = optimize_incremental(
        spark, path, ["k"], target_bytes=10**9
    )
    assert res["rewritten"] >= 2 and res["added"] >= 1
    m = read_manifest(path)
    # every rewritten file materializes the id column; untouched
    # carried files keep their watermark slices
    assert sum(1 for e in m["files"] if e.get("row_id_col")) == res["added"]
    assert _ids_by_v(spark, path) == before

    # the identity change feed proves the commit is a rearrangement:
    # zero rows for the optimize span
    feed = table_changes(spark, path, from_version=res["version"] - 1)
    assert feed.count() == 0


def test_optimize_incremental_zorder_preserves_ids(spark, tmp_path):
    """Same invariant through the 2-column (Z-order) incremental
    path."""
    from mapreduce_grpc_spark.sources.snapshots import optimize_incremental

    path = str(tmp_path / "t")
    _mk_overlapping(spark, path)
    before = _ids_by_v(spark, path)
    res = optimize_incremental(
        spark, path, ["k", "v"], target_bytes=10**9
    )
    assert res["rewritten"] >= 2
    assert _ids_by_v(spark, path) == before


def test_auto_compact_cluster_by_preserves_ids(spark, tmp_path):
    """auto_compact(cluster_by=...) — the maintenance hook
    run_streaming_cdc recommends — reaches optimize_incremental when
    only clustering debt fires; ids must survive that path too."""
    from mapreduce_grpc_spark.sources.snapshots import auto_compact

    path = str(tmp_path / "t")
    _mk_overlapping(spark, path, tag_batches=("a", "b", "c", "d", "e"))
    before = _ids_by_v(spark, path)
    # max_files high so the file-count policy does NOT fire; the
    # overlap policy does (10 files all overlapping on k > 4)
    res = auto_compact(
        spark, path, max_files=100, cluster_by=["k"],
        max_overlap_group=4, target_bytes=10**9,
    )
    assert res is not None and res["rewritten"] >= 2
    assert _ids_by_v(spark, path) == before
    feed = table_changes(spark, path, from_version=res["version"] - 1)
    assert feed.count() == 0


def test_restore_keeps_historical_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)                      # v1
    ids_v1 = _ids(spark, path)
    snap_append(                          # v2
        spark, path,
        spark.range(100, 110).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )
    optimize_snapshot(spark, path, target_bytes=10**9)  # v3
    snap_restore(path, 1, spark=spark)    # v4 = v1's files
    assert _ids(spark, path) == ids_v1
    # watermark carried from CURRENT, not the restored version: new
    # rows never reuse the rolled-back slice
    m = read_manifest(path)
    assert m["next_row_id"] == 110
    snap_append(
        spark, path,
        spark.range(300, 305).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )
    final = _ids(spark, path)
    assert len(set(final.values())) == len(final)
    assert min(v for k, v in final.items() if k >= 300) >= 110


def test_merge_upsert_preserves_ids(spark, tmp_path):
    """Phase 2: a keyed CoW merge PRESERVES row identity — an updated
    row keeps the old row's id under its new values, survivors inside
    rewritten files keep theirs, true inserts draw fresh watermark
    ids."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=100, n_files=4)
    before = _ids(spark, path)
    merge_upsert_cow(
        spark, path,
        spark.range(5).select(
            F.col("id").alias("k"), F.lit("upd").alias("v")
        ).unionByName(
            spark.range(500, 503).select(
                F.col("id").alias("k"), F.lit("new").alias("v")
            )
        ),
        keys=["k"],
    )
    after = _ids(spark, path)
    assert len(set(after.values())) == 103
    assert all(after[k] == before[k] for k in before), (
        "updates and survivors must keep their ids"
    )
    fresh = [after[k] for k in (500, 501, 502)]
    assert all(i >= 100 for i in fresh)
    assert read_manifest(path)["next_row_id"] == 103
    # the updated values really landed
    vals = {
        r.k: r.v for r in snap_read(spark, path).collect() if r.k < 5
    }
    assert all(v == "upd" for v in vals.values())


def test_cdc_preserves_ids(spark, tmp_path):
    """apply_cdc_cow: U keeps the id, D retires it forever, I draws
    fresh — the identity semantics an incremental MV consumer needs."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=60, n_files=2)
    before = _ids(spark, path)
    apply_cdc_cow(
        spark, path,
        spark.createDataFrame(
            [(3, "u3", "U"), (7, None, "D"), (500, "i", "I")],
            "k bigint, v string, _op string",
        ),
        keys=["k"],
    )
    after = _ids(spark, path)
    assert set(after) == (set(range(60)) - {7}) | {500}
    assert all(after[k] == before[k] for k in after if k != 500)
    assert after[500] >= 60
    assert before[7] not in set(after.values()), "a deleted id is retired"


def test_merge_into_full_grammar_preserves_ids(spark, tmp_path):
    """merge_into: matched update keeps the id, matched delete retires
    it, not-matched insert draws fresh, not-matched-by-source update
    keeps — across both the broadcast and full-outer plans."""
    from mapreduce_grpc_spark.sources.snapshots import merge_into

    path = str(tmp_path / "t")
    _mk(spark, path, n=40, n_files=2)
    before = _ids(spark, path)
    src = spark.createDataFrame(
        [(1, "u"), (2, "d"), (900, "i")], "k bigint, s_v string"
    )
    merge_into(
        spark, path, src, keys=["k"],
        matched=[
            ("delete", "s.s_v = 'd'"),
            ("update", None, {"v": "s.s_v"}),
        ],
        not_matched=[("insert", None, {"k": "s.k", "v": "s.s_v"})],
        not_matched_by_source=[
            ("update", "t.k = 5", {"v": "'bysrc'"}),
        ],
    )
    after = _ids(spark, path)
    assert set(after) == (set(range(40)) - {2}) | {900}
    assert all(after[k] == before[k] for k in after if k != 900)
    assert after[900] >= 40
    rows = {r.k: r.v for r in snap_read(spark, path).collect()}
    assert rows[1] == "u" and rows[5] == "bysrc" and rows[900] == "i"


def test_update_where_preserves_ids(spark, tmp_path):
    from mapreduce_grpc_spark.sources.snapshots import update_where

    path = str(tmp_path / "t")
    _mk(spark, path, n=50, n_files=2)
    before = _ids(spark, path)
    update_where(
        spark, path, [("k", "<", 10)], {"v": "concat(v, '!')"}
    )
    assert _ids(spark, path) == before
    m = read_manifest(path)
    assert any(e.get("row_id_col") for e in m["files"])


def test_change_feed_skips_provable_rearrangement(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    snap_append(
        spark, path,
        spark.range(100, 110).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )  # v2
    optimize_snapshot(spark, path, target_bytes=10**9)  # v3: pure
    feed = table_changes(spark, path, keys=["k"], from_version=2)
    assert feed.count() == 0
    # the plan proves the skip: a pure-rearrangement span reads no
    # data files at all (metadata-only empty feed)
    assert "parquet" not in feed._jdf.queryExecution().executedPlan().toString().lower()

    # with DV debt the optimize DELETES rows' files and must NOT be
    # skipped blindly — the diff still runs (and still nets zero rows,
    # because the deletes surfaced at the DV commit itself)
    delete_where_mor(spark, path, [("k", "<", 5)])  # v4
    optimize_snapshot(spark, path, target_bytes=10**9)  # v5 pays debt
    feed2 = table_changes(spark, path, keys=["k"], from_version=3)
    got = [
        (r.k, r._change_type, r._commit_version) for r in feed2.collect()
    ]
    assert sorted(got) == [
        (k, "delete", 4) for k in range(5)
    ]


def test_streaming_cdf_skips_rearrangement_commit(spark, tmp_path):
    import os

    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, n=40, n_files=2)
    snap_append(
        spark, path,
        spark.range(40, 50).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )  # v2
    optimize_snapshot(spark, path, target_bytes=10**9)  # v3
    apply_cdc_cow(
        spark, path,
        spark.createDataFrame(
            [(1, "x", "U")], "k bigint, v string, _op string"
        ),
        keys=["k"],
    )  # v4
    spark.dataSource.register(SnapshotTableStreamSource)
    got: list[tuple] = []

    def sink(bdf, _bid):
        got.extend(tuple(r) for r in bdf.collect())

    q = (
        spark.readStream.format("snapshot_table")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("keys", "k")
        .option("startingVersion", "3")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # v3 (rearrangement) contributes nothing; v4's update pair arrives
    assert {t[3] for t in got} == {4}
    assert sorted(t[2] for t in got) == [
        "update_postimage", "update_preimage",
    ]


def test_clone_gets_fresh_ids_above_source_watermark(spark, tmp_path):
    path = str(tmp_path / "t")
    dst = str(tmp_path / "c")
    _mk(spark, path)
    optimize_snapshot(spark, path, target_bytes=10**9)  # materialize
    snap_append(
        spark, path,
        spark.range(100, 120).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )
    src_next = read_manifest(path)["next_row_id"]
    snap_clone(path, dst)
    mc = read_manifest(dst)
    assert mc["row_tracking"] is True
    clone_ids = _ids(spark, dst)
    assert len(set(clone_ids.values())) == 120
    # fresh (non-materialized) clone entries sit above the source
    # watermark so they can never collide with materialized ids
    fresh = [e for e in mc["files"] if not e.get("row_id_col")]
    assert all(e["row_id_base"] >= src_next for e in fresh)


def test_with_row_ids_guards(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(5).select(
        F.col("id").alias("k"), F.col("id").alias("_row_id")
    )
    snap_init(spark, df, path, stats_cols=["k"], row_tracking=True)
    with pytest.raises(ValueError, match="_row_id"):
        snap_read(spark, path, with_row_ids=True).collect()


def test_concurrent_appends_get_disjoint_id_ranges(spark, tmp_path):
    import threading

    path = str(tmp_path / "t")
    _mk(spark, path, n=10, n_files=1)
    errs: list[Exception] = []

    def add(lo):
        try:
            snap_append(
                spark, path,
                spark.range(lo, lo + 20).select(
                    F.col("id").alias("k"),
                    F.concat(F.lit("v"), F.col("id")).alias("v"),
                ),
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [
        threading.Thread(target=add, args=(lo,))
        for lo in (100, 200, 300)
    ]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    ids = _ids(spark, path)
    assert len(ids) == 70
    assert len(set(ids.values())) == 70, "racing appends must not collide"
    assert read_manifest(path)["next_row_id"] == 70


def test_snapshot_row_ids_oracle_parity(spark, sf_dir):
    """The query putting row-ID assignment + OPTIMIZE preservation
    under the DuckDB hash comparator (invariant form: distinct ids ==
    rows, zero ids changed across the rewrite).  Rotated INTO the
    50-query driver contract in round 14 (replacing the redundant
    minhash_signatures row)."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.QUERIES["snapshot_row_ids"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.ORACLES["snapshot_row_ids"],
        sf_dir,
        "snapshot_row_ids",
    )


def test_verify_snapshot_checks_row_id_invariants(spark, tmp_path):
    """fsck on a tracked table validates the id slices: clean after a
    real workload; a hand-corrupted overlapping base is reported."""
    import json as _json
    import os as _os

    from mapreduce_grpc_spark.sources import snapshots as S
    from mapreduce_grpc_spark.sources.snapshots import verify_snapshot

    path = str(tmp_path / "t")
    _mk(spark, path, n=40, n_files=2)
    snap_append(
        spark, path,
        spark.range(40, 50).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )
    rep = verify_snapshot(path)
    assert rep["missing"] == [] and rep["mismatched"] == []

    # corrupt: duplicate a base out-of-band (mutation outside the
    # commit protocol, exactly what fsck exists to catch)
    f = S._fs(None)
    v = S.current_version(path)
    raw = _json.loads(f.read_text(S._manifest_path(path, v)))
    raw["version"] = v + 1
    ent = [dict(e) for e in S.read_manifest(path)["files"]]
    ent[1]["row_id_base"] = ent[0]["row_id_base"]
    raw["adds"], raw["removes"] = ent, [e["name"] for e in ent]
    raw.pop("files", None)
    f.create_exclusive(
        S._manifest_path(path, v + 1), _json.dumps(raw)
    )
    f.replace_atomic(_os.path.join(path, "_manifests", "CURRENT"),
                     str(v + 1))
    bad = verify_snapshot(path)
    assert any("overlap" in m.get("error", "") for m in bad["mismatched"])


def test_verify_snapshot_deep_id_audit(spark, tmp_path):
    """check_ids=True: the slice invariants cannot see inside
    materialized-column (row_id_col) entries — duplicate ids BY CONTENT
    need the distributed audit.  Clean table: no findings; a forged
    manifest referencing the same id-bearing file twice: reported;
    without a SparkSession the deep check refuses loudly."""
    import json as _json
    import os as _os
    import shutil as _sh

    from mapreduce_grpc_spark.sources import snapshots as S
    from mapreduce_grpc_spark.sources.snapshots import verify_snapshot

    path = str(tmp_path / "t")
    _mk(spark, path, n=40, n_files=2)
    optimize_snapshot(spark, path, target_bytes=10**9)  # materialize ids
    rep = verify_snapshot(path, check_ids=True, spark=spark)
    assert rep["mismatched"] == []
    with pytest.raises(ValueError, match="SparkSession"):
        verify_snapshot(path, check_ids=True)

    # corrupt: duplicate a materialized entry under a new file name
    # (same ids by content — invisible to every footer/slice check)
    f = S._fs(None)
    v = S.current_version(path)
    ent = [dict(e) for e in S.read_manifest(path)["files"]]
    src = next(e for e in ent if e.get("row_id_col"))
    clone = dict(src)
    clone["name"] = "dup-" + src["name"]
    _sh.copyfile(
        _os.path.join(path, src["name"]),
        _os.path.join(path, clone["name"]),
    )
    raw = _json.loads(f.read_text(S._manifest_path(path, v)))
    raw["version"] = v + 1
    raw["adds"], raw["removes"] = ent + [clone], []
    raw.pop("files", None)
    f.create_exclusive(
        S._manifest_path(path, v + 1), _json.dumps(raw)
    )
    f.replace_atomic(
        _os.path.join(path, "_manifests", "CURRENT"), str(v + 1)
    )
    bad = verify_snapshot(path, check_ids=True, spark=spark)
    assert any(
        "duplicate live row ids" in m.get("error", "")
        for m in bad["mismatched"]
    )


def test_append_stream_survives_compaction_on_tracked_table(
    spark, tmp_path, snapshot_fs
):
    """The design note's headline payoff: an APPEND-mode stream (no
    skipChangeCommits) rides straight over an OPTIMIZE commit on a
    tracked table — row tracking proves the rearrangement, so the
    stream skips it silently instead of refusing, and no row is
    re-emitted or lost.  The same stream on an UNTRACKED table still
    refuses."""
    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)

    def stream(path, ck):
        r = (
            spark.readStream.format("snapshot_table")
            .option("path", path)
        )
        if snapshot_fs.spec:
            r = r.option("fsImpl", snapshot_fs.spec)
        got: list[tuple] = []

        def sink(bdf, _bid):
            got.extend((r.k, r.v) for r in bdf.collect())

        q = (
            r.load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got, q

    path = str(tmp_path / "t")
    _mk(spark, path, n=30, n_files=2)          # v1
    snap_append(                                # v2
        spark, path,
        spark.range(30, 40).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )
    optimize_snapshot(spark, path, target_bytes=10**9)  # v3: rearrange
    snap_append(                                # v4
        spark, path,
        spark.range(40, 45).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )
    got, _ = stream(path, str(tmp_path / "ck"))
    assert sorted(k for k, _v in got) == list(range(45)), (
        "exactly the appended rows, once each — the optimize commit "
        "contributes nothing"
    )

    # untracked control: same shape still refuses
    path2 = str(tmp_path / "u")
    _mk(spark, path2, n=10, n_files=2, tracking=False)
    snap_append(
        spark, path2,
        spark.range(10, 15).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )
    optimize_snapshot(spark, path2, target_bytes=10**9)
    with pytest.raises(Exception, match="append-only"):
        got2, q2 = stream(path2, str(tmp_path / "ck2"))
        raise RuntimeError(
            f"stream should have refused, emitted {len(got2)} rows"
        )


def test_keyless_identity_feed_matches_keyed(spark, tmp_path):
    """table_changes(keys=None) on a tracked table diffs by _row_id:
    same classification as the keyed feed (phase-2 preservation makes
    the two agree), plus the _row_id column for identity folds; an
    untracked table refuses with a pointer at enable."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=40, n_files=2)
    apply_cdc_cow(
        spark, path,
        spark.createDataFrame(
            [(3, "u", "U"), (7, None, "D"), (900, "i", "I")],
            "k bigint, v string, _op string",
        ),
        keys=["k"],
    )
    delete_where_mor(spark, path, [("k", "<", 2)])
    optimize_snapshot(spark, path, target_bytes=10**9)
    merge_upsert_cow(
        spark, path,
        spark.createDataFrame([(4, "m")], "k bigint, v string"),
        keys=["k"],
    )
    fid = table_changes(spark, path, from_version=1)
    assert "_row_id" in fid.columns
    a = sorted(
        (r.k, r.v, r._change_type, r._commit_version)
        for r in fid.collect()
    )
    b = sorted(
        (r.k, r.v, r._change_type, r._commit_version)
        for r in table_changes(
            spark, path, keys=["k"], from_version=1
        ).collect()
    )
    assert a == b
    # identity is coherent: every update pair shares one id
    pairs = {}
    for r in fid.collect():
        if r._change_type.startswith("update"):
            pairs.setdefault((r._commit_version, r.k), set()).add(
                r._row_id
            )
    assert pairs and all(len(ids) == 1 for ids in pairs.values())

    path2 = str(tmp_path / "u")
    _mk(spark, path2, n=10, n_files=1, tracking=False)
    snap_append(
        spark, path2,
        spark.range(10, 12).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
    )
    with pytest.raises(ValueError, match="row tracking"):
        table_changes(spark, path2, from_version=1).collect()


def test_streaming_identity_feed(spark, tmp_path, snapshot_fs):
    """readChangeFeed WITHOUT keys on a tracked table streams by
    identity: schema carries _row_id, rows match the batch id-feed,
    rearrangement commits skipped; an untracked table still demands
    keys."""
    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    path = str(tmp_path / "t")
    _mk(spark, path, n=30, n_files=2)
    apply_cdc_cow(
        spark, path,
        spark.createDataFrame(
            [(3, "u", "U"), (7, None, "D")],
            "k bigint, v string, _op string",
        ),
        keys=["k"],
    )
    optimize_snapshot(spark, path, target_bytes=10**9)

    def rs(p):
        r = (
            spark.readStream.format("snapshot_table")
            .option("path", p)
            .option("readChangeFeed", "true")
            .option("startingVersion", "2")
        )
        if snapshot_fs.spec:
            r = r.option("fsImpl", snapshot_fs.spec)
        return r.load()

    df = rs(path)
    assert df.columns == [
        "k", "v", "_row_id", "_change_type", "_commit_version",
    ]
    got: list[tuple] = []

    def sink(bdf, _bid):
        got.extend(tuple(r) for r in bdf.collect())

    q = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    exp = sorted(
        tuple(r)[:2] + (r._row_id, r._change_type, r._commit_version)
        for r in table_changes(spark, path, from_version=1).select(
            "k", "v", "_row_id", "_change_type", "_commit_version"
        ).collect()
    )
    assert sorted(got) == exp

    path2 = str(tmp_path / "u")
    _mk(spark, path2, n=5, n_files=1, tracking=False)
    with pytest.raises(Exception, match="keys"):
        (
            rs(path2)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .start()
            .awaitTermination(30)
        )


def test_batch_datasource_with_row_ids(spark, tmp_path, snapshot_fs):
    """spark.read.format("snapshot_table").option("withRowIds","true")
    surfaces _row_id through the Python DataSource: synthesized for
    fresh files, read from the materialized column after OPTIMIZE,
    DV-masked ids absent, equal to the library read; untracked tables
    and append-stream use are refused."""
    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    path = str(tmp_path / "t")
    _mk(spark, path, n=50, n_files=2)
    delete_where_mor(spark, path, [("k", "<", 5)])
    optimize_snapshot(
        spark, path, target_bytes=10**9, where=[("k", "<", 30)]
    )

    def rd(p, **opts):
        r = (
            spark.read.format("snapshot_table")
            .option("path", p)
            .option("withRowIds", "true")
        )
        if snapshot_fs.spec:
            r = r.option("fsImpl", snapshot_fs.spec)
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    got = {r.k: r._row_id for r in rd(path).collect()}
    lib = _ids(spark, path)
    assert got == lib
    # time travel composes: v1 ids == the enable-time assignment
    got_v1 = {
        r.k: r._row_id for r in rd(path, versionAsOf="1").collect()
    }
    assert got_v1 == _ids(spark, path, version=1)

    path2 = str(tmp_path / "u")
    _mk(spark, path2, n=5, n_files=1, tracking=False)
    with pytest.raises(Exception, match="row tracking"):
        rd(path2).collect()
    with pytest.raises(Exception, match="batch-read option"):
        (
            spark.readStream.format("snapshot_table")
            .option("path", path)
            .option("withRowIds", "true")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
            .awaitTermination(30)
        )


def test_randomized_identity_soak(spark, tmp_path):
    """Seeded random op soak (the composition-fuzz convention of
    test_snapshots): across appends, merges, CDC batches, MoR deletes,
    predicate updates, and OPTIMIZE in random order, the identity
    invariants hold at every step — untouched rows keep id AND value,
    updated rows keep id under the new value, deleted ids are retired
    forever, inserted ids are fresh (>= the pre-op watermark), ids
    stay globally unique, and fsck's slice checks stay clean."""
    import random

    from mapreduce_grpc_spark.sources.snapshots import (
        update_where,
        verify_snapshot,
    )

    rng = random.Random(0xB0B1D)
    path = str(tmp_path / "t")
    _mk(spark, path, n=80, n_files=3)
    next_key = 1000
    retired: set[int] = set()

    def snap():
        return {
            r.k: (r.v, r._row_id)
            for r in snap_read(
                spark, path, with_row_ids=True
            ).collect()
        }

    state = snap()
    for step in range(8):
        wm = read_manifest(path)["next_row_id"]
        op = rng.choice(["append", "merge", "cdc", "delmor", "update",
                         "optimize"])
        live = sorted(state)
        updated: set[int] = set()
        deleted: set[int] = set()
        inserted: set[int] = set()
        val = f"s{step}"
        if op == "append":
            ks = list(range(next_key, next_key + rng.randint(1, 5)))
            next_key += 5
            inserted = set(ks)
            snap_append(
                spark, path,
                spark.createDataFrame(
                    [(k, val) for k in ks], "k bigint, v string"
                ),
            )
        elif op == "merge":
            upd = rng.sample(live, min(4, len(live)))
            ins = [next_key]
            next_key += 1
            updated, inserted = set(upd), set(ins)
            merge_upsert_cow(
                spark, path,
                spark.createDataFrame(
                    [(k, val) for k in upd + ins],
                    "k bigint, v string",
                ),
                keys=["k"],
            )
        elif op == "cdc":
            upd = rng.sample(live, min(3, len(live)))
            dels = [
                k for k in rng.sample(live, min(2, len(live)))
                if k not in upd
            ]
            ins = [next_key]
            next_key += 1
            updated, deleted, inserted = set(upd), set(dels), set(ins)
            apply_cdc_cow(
                spark, path,
                spark.createDataFrame(
                    [(k, val, "U") for k in upd]
                    + [(k, None, "D") for k in dels]
                    + [(k, val, "I") for k in ins],
                    "k bigint, v string, _op string",
                ),
                keys=["k"],
            )
        elif op == "delmor":
            lo = rng.choice(live)
            deleted = {k for k in live if lo <= k <= lo + 3}
            delete_where_mor(
                spark, path, [("k", "between", lo, lo + 3)]
            )
        elif op == "update":
            lo = rng.choice(live)
            updated = {k for k in live if lo <= k <= lo + 5}
            update_where(
                spark, path,
                [("k", "between", lo, lo + 5)],
                {"v": f"'{val}'"},
            )
        else:
            optimize_snapshot(spark, path, target_bytes=10**9)

        post = snap()
        assert set(post) == (set(state) - deleted) | inserted, (
            step, op,
        )
        ids = [i for _v, i in post.values()]
        assert len(set(ids)) == len(ids), (step, op, "id collision")
        for k, (v, i) in post.items():
            if k in inserted:
                assert i >= wm, (step, op, k, "insert id not fresh")
                assert i not in retired, (step, op, k, "id reuse")
                assert v == val
            elif k in updated:
                assert i == state[k][1], (step, op, k, "update id")
                assert v == val
            else:
                assert (v, i) == state[k], (step, op, k, "untouched")
        retired |= {state[k][1] for k in deleted}
        assert not (set(ids) & retired), (step, op, "retired id back")
        rep = verify_snapshot(path)
        assert rep["missing"] == [] and rep["mismatched"] == [], (
            step, op, rep,
        )
        assert read_manifest(path)["next_row_id"] >= wm
        state = post
