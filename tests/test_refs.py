"""Named refs: tags, branches, zero-copy publish (write-audit-publish).

``sources/refs.py`` — the Iceberg ref model on this engine's commit
protocol: a tag pins a version against GC, a branch is an in-table
shallow clone every existing mutator works on, and publish folds the
branch back into main as ONE optimistic commit with no data movement
(fast-forward, or append-only rebase when main moved).  Runs under
BOTH commit-protocol FS backends.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources.refs import (
    PublishConflict,
    resolve_ref,
    snap_branch_path,
    snap_create_branch,
    snap_create_tag,
    snap_drop_branch,
    snap_drop_tag,
    snap_list_refs,
    snap_publish_branch,
)
from mapreduce_grpc_spark.sources.snapshots import (
    current_version,
    delete_where_mor,
    expire_snapshots,
    merge_upsert_cow,
    read_manifest,
    snap_add_column,
    snap_add_constraint,
    snap_append,
    snap_enable_row_tracking,
    snap_init,
    snap_read,
    snap_scan,
    table_changes,
    verify_snapshot,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _rng(spark, a, b):
    return spark.range(a, b).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )


def _mk(spark, path, n=200):
    snap_init(spark, _rng(spark, 0, n // 2), path, stats_cols=["k"])
    snap_append(spark, path, _rng(spark, n // 2, n))
    return path


# --------------------------------------------------------------------- tags


def test_tag_pins_resolves_and_drops(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v = snap_create_tag(t, "rel-1.0")
    assert v == current_version(t) == 2
    snap_append(spark, t, _rng(spark, 200, 300))
    assert snap_read(spark, t, ref="rel-1.0").count() == 200
    assert snap_read(spark, t).count() == 300
    assert resolve_ref(t, "rel-1.0") == ("tag", 2)
    # tags are immutable: re-creating the name is refused
    with pytest.raises(ValueError, match="immutable"):
        snap_create_tag(t, "rel-1.0")
    refs = snap_list_refs(t)
    assert refs == [{"name": "rel-1.0", "type": "tag", "version": 2}]
    snap_drop_tag(t, "rel-1.0")
    with pytest.raises(ValueError, match="unknown ref"):
        resolve_ref(t, "rel-1.0")
    with pytest.raises(ValueError, match="no tag"):
        snap_drop_tag(t, "rel-1.0")


def test_tag_names_validated_and_unambiguous(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    for bad in ("", "a/b", "-lead", "x" * 65, "a b"):
        with pytest.raises(ValueError, match="invalid"):
            snap_create_tag(t, bad)
    snap_create_branch(t, "dev")
    with pytest.raises(ValueError, match="names a branch"):
        snap_create_tag(t, "dev")
    snap_create_tag(t, "pin")
    with pytest.raises(ValueError, match="names a tag"):
        snap_create_branch(t, "pin")


def test_tag_survives_gc_and_release_reclaims(spark, tmp_path):
    """The retention contract: a tagged version stays readable through
    aggressive expire_snapshots (its manifest gets its own retention
    checkpoint once the delta chain below it is deleted); dropping the
    tag lets the NEXT GC reclaim the version and its files."""
    t = str(tmp_path / "t")
    snap_init(spark, _rng(spark, 0, 100), t, stats_cols=["k"])
    snap_append(spark, t, _rng(spark, 100, 200))
    snap_create_tag(t, "audit")
    tagged_files = {e["name"] for e in read_manifest(t, 2)["files"]}
    # every row rewritten twice -> tagged files leave ALL live versions
    merge_upsert_cow(
        spark, t,
        _rng(spark, 0, 200).withColumn("v", F.lit(99).cast("bigint")), keys=["k"],
    )
    snap_append(spark, t, _rng(spark, 200, 300))
    deleted = expire_snapshots(t, keep_last=1, orphan_grace_seconds=0)
    assert not (tagged_files & set(deleted)), (
        "GC deleted files the tag pins"
    )
    assert snap_read(spark, t, ref="audit").count() == 200
    # second pass: the tagged version must reconstruct from its own
    # checkpoint (the deltas below it are gone now)
    expire_snapshots(t, keep_last=1, orphan_grace_seconds=0)
    got = snap_read(spark, t, ref="audit")
    assert got.count() == 200
    assert got.filter("v = 99").count() == 0, "tag shows pre-rewrite rows"
    assert verify_snapshot(t, 2)["missing"] == []
    snap_drop_tag(t, "audit")
    deleted2 = expire_snapshots(t, keep_last=1, orphan_grace_seconds=0)
    assert tagged_files <= set(deleted2), (
        "dropped tag must stop pinning its files"
    )
    with pytest.raises(FileNotFoundError):
        read_manifest(t, 2)


# ----------------------------------------------------------------- branches


def test_branch_isolation_both_directions(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    bdir = snap_create_branch(t, "dev")
    assert bdir == snap_branch_path(t, "dev")
    assert resolve_ref(t, "dev") == ("branch", bdir)
    # zero-copy fork: no data files in the branch dir
    assert not [n for n in os.listdir(bdir) if n.startswith("data-")]
    snap_append(spark, bdir, _rng(spark, 1000, 1100))
    snap_append(spark, t, _rng(spark, 2000, 2050))
    assert snap_read(spark, t, ref="dev").count() == 300
    assert snap_read(spark, t).count() == 250
    # snap_scan through the ref prunes like any table
    assert (
        snap_scan(spark, t, [("k", ">=", 1000)], ref="dev").count()
        == 100
    )
    # duplicate branch refused
    with pytest.raises(ValueError, match="already exists"):
        snap_create_branch(t, "dev")
    refs = {r["name"]: r for r in snap_list_refs(t)}
    assert refs["dev"]["type"] == "branch"
    assert refs["dev"]["fork_version"] == 2


def test_parent_gc_protects_live_branch(spark, tmp_path):
    """Main rewrites everything after the fork; its GC must keep the
    files the branch still borrows (clone markers), and the branch's
    own GC never touches main's bytes."""
    t = _mk(spark, str(tmp_path / "t"))
    orig = {e["name"] for e in read_manifest(t)["files"]}
    bdir = snap_create_branch(t, "dev")
    merge_upsert_cow(
        spark, t,
        _rng(spark, 0, 200).withColumn("v", F.lit(42).cast("bigint")), keys=["k"],
    )
    deleted = expire_snapshots(t, keep_last=1, orphan_grace_seconds=0)
    assert not (orig & set(deleted))
    assert snap_read(spark, t, ref="dev").filter("v = 42").count() == 0
    expire_snapshots(bdir, keep_last=1, orphan_grace_seconds=0)
    assert snap_read(spark, t, ref="dev").count() == 200
    # dropping the unpublished branch removes its dir and, once the
    # marker retires, frees main's old bytes
    snap_drop_branch(t, "dev")
    assert not os.path.exists(bdir)
    deleted2 = expire_snapshots(t, keep_last=1, orphan_grace_seconds=0)
    assert orig <= set(deleted2)


# ------------------------------------------------------------------ publish


def test_publish_fast_forward_zero_copy(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    bdir = snap_create_branch(t, "wk33")
    snap_append(spark, bdir, _rng(spark, 500, 600))
    delete_where_mor(spark, bdir, [("k", "<", 10)])
    main_files_before = sorted(
        n for n in os.listdir(t) if n.startswith("data-")
    )
    cur = current_version(t)
    r = snap_publish_branch(t, "wk33")
    assert r["mode"] == "fast_forward" and r["version"] == cur + 1
    assert snap_read(spark, t).count() == 290
    # zero-copy: not one data file landed in main's dir
    assert main_files_before == sorted(
        n for n in os.listdir(t) if n.startswith("data-")
    )
    # branch-born entries resolve into the branch dir by reference
    m = read_manifest(t)
    borrowed = [
        e
        for e in m["files"]
        if e.get("base")
        and os.path.abspath(e["base"]) == os.path.abspath(bdir)
    ]
    assert borrowed, "published entries must reference the branch dir"
    # CDF sees the branch's NET change as one squash commit
    ch = table_changes(spark, t, ["k"], cur, cur + 1)
    agg = {
        row["_change_type"]: row["n"]
        for row in ch.groupBy("_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert agg == {"insert": 100, "delete": 10}
    # dropping the published branch keeps the adopted bytes readable
    snap_drop_branch(t, "wk33")
    assert snap_read(spark, t).count() == 290
    assert verify_snapshot(t)["missing"] == []


def test_publish_carries_branch_ddl(spark, tmp_path):
    """WAP for DDL: schema evolution and a new constraint staged on
    the branch publish with the data (fast-forward carries the branch
    head's metadata)."""
    t = _mk(spark, str(tmp_path / "t"))
    bdir = snap_create_branch(t, "ddl")
    snap_add_column(bdir, "score", "bigint", default=0)
    snap_add_constraint(
        spark, bdir, "score_nonneg", "score >= 0"
    )
    snap_append(
        spark, bdir,
        _rng(spark, 900, 910).withColumn("score", F.lit(5).cast("bigint")),
    )
    snap_publish_branch(t, "ddl")
    m = read_manifest(t)
    assert "score" in [
        f["name"]
        for f in __import__("json").loads(m["schema"])["fields"]
    ]
    assert "score_nonneg" in (m.get("constraints") or {})
    got = snap_read(spark, t)
    assert got.filter("score = 5").count() == 10
    assert got.filter("score IS NULL").count() == 200  # pre-DDL rows


def test_publish_rebase_append_only(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    snap_create_branch(t, "b")
    snap_append(
        spark, snap_branch_path(t, "b"), _rng(spark, 700, 750)
    )
    snap_append(spark, t, _rng(spark, 800, 860))  # main moves
    r = snap_publish_branch(t, "b")
    assert r["mode"] == "rebase"
    assert snap_read(spark, t).count() == 310
    assert snap_read(spark, t).filter("k >= 800").count() == 60, (
        "rebase must keep main's concurrent append"
    )


def test_publish_conflicts_are_loud(spark, tmp_path):
    # branch rewrote shared files + main moved -> conflict
    t = _mk(spark, str(tmp_path / "t"))
    snap_create_branch(t, "b1")
    delete_where_mor(
        spark, snap_branch_path(t, "b1"), [("k", "=", 5)]
    )
    snap_append(spark, t, _rng(spark, 800, 810))
    with pytest.raises(PublishConflict, match="diverged|rewrote"):
        snap_publish_branch(t, "b1")
    # main did DDL after the fork -> append-only rebase still refused
    snap_create_branch(t, "b2")
    snap_append(
        spark, snap_branch_path(t, "b2"), _rng(spark, 900, 910)
    )
    snap_add_column(t, "extra", "bigint", default=1)
    with pytest.raises(PublishConflict, match="metadata"):
        snap_publish_branch(t, "b2")
    # fork version expired -> publish explains itself
    snap_create_branch(t, "b3")
    snap_append(spark, t, _rng(spark, 950, 960))
    expire_snapshots(t, keep_last=1, orphan_grace_seconds=0)
    with pytest.raises(PublishConflict, match="expired"):
        snap_publish_branch(t, "b3")


def test_publish_row_tracked_keeps_main_ids(spark, tmp_path):
    """Row identity across publish: files main already owned keep
    main's ids verbatim; branch-born appends adopt the branch's
    (collision-free: the branch watermark started at main's).  A
    moved main refuses rebase on tracked tables."""
    t = str(tmp_path / "t")
    snap_init(spark, _rng(spark, 0, 100), t, stats_cols=["k"])
    snap_enable_row_tracking(t)
    snap_append(spark, t, _rng(spark, 100, 200))
    ids_before = {
        r["k"]: r["_row_id"]
        for r in snap_read(spark, t, with_row_ids=True).collect()
    }
    snap_create_branch(t, "b")
    snap_append(
        spark, snap_branch_path(t, "b"), _rng(spark, 200, 250)
    )
    snap_publish_branch(t, "b")
    after = {
        r["k"]: r["_row_id"]
        for r in snap_read(spark, t, with_row_ids=True).collect()
    }
    assert all(after[k] == i for k, i in ids_before.items()), (
        "publish renumbered rows main already owned"
    )
    new_ids = [i for k, i in after.items() if k >= 200]
    assert len(set(new_ids)) == 50
    assert not (set(new_ids) & set(ids_before.values())), (
        "branch-born ids collide with main's"
    )
    # identity CDF over the publish shows ONLY the branch's net adds
    ch = table_changes(
        spark, t, None, current_version(t) - 1, current_version(t)
    )
    assert ch.filter("_change_type <> 'insert'").count() == 0
    assert ch.count() == 50


def test_publish_row_tracked_rebase_remaps_ids(spark, tmp_path):
    """Tracked table + moved main: the rebase re-draws branch-born
    ``row_id_base`` slices under MAIN'S current watermark (metadata
    only — the r14 refusal lifted).  Main's rows keep their ids, the
    published rows get fresh non-colliding ids, the CDF shows the
    publish as pure inserts carrying the NEW ids, and the duplicate-
    live-row-id audit stays clean."""
    t = str(tmp_path / "t")
    snap_init(spark, _rng(spark, 0, 100), t, stats_cols=["k"])
    snap_enable_row_tracking(t)
    snap_create_branch(t, "b")
    snap_append(spark, snap_branch_path(t, "b"), _rng(spark, 300, 310))
    snap_append(spark, t, _rng(spark, 400, 410))  # main moves too
    pre = {
        r["k"]: r["_row_id"]
        for r in snap_read(spark, t, with_row_ids=True).collect()
    }
    res = snap_publish_branch(t, "b")
    assert res["mode"] == "rebase"
    after = {
        r["k"]: r["_row_id"]
        for r in snap_read(spark, t, with_row_ids=True).collect()
    }
    assert all(after[k] == i for k, i in pre.items()), (
        "rebase publish renumbered rows main already owned"
    )
    reb = [i for k, i in after.items() if 300 <= k < 310]
    assert len(set(reb)) == 10
    assert not (set(reb) & set(pre.values())), (
        "rebased branch-born ids collide with main's"
    )
    assert len(set(after.values())) == len(after)
    assert verify_snapshot(t)["missing"] == []
    # CDF parity over the publish: 10 inserts, each with its NEW id
    ch = table_changes(
        spark, t, None, current_version(t) - 1, current_version(t)
    )
    assert ch.filter("_change_type <> 'insert'").count() == 0
    assert sorted(
        r["_row_id"] for r in ch.select("_row_id").collect()
    ) == sorted(reb)
    # incremental re-publish after more branch staging: only the delta
    snap_append(spark, snap_branch_path(t, "b"), _rng(spark, 500, 505))
    res2 = snap_publish_branch(t, "b")
    assert res2["mode"] == "rebase" and res2["adds"] >= 1
    again = snap_read(spark, t, with_row_ids=True).collect()
    ids = [r["_row_id"] for r in again]
    assert len(set(ids)) == len(ids), "duplicate ids after re-publish"
    assert {r["k"] for r in again} == (
        set(range(100)) | set(range(300, 310))
        | set(range(400, 410)) | set(range(500, 505))
    )


def test_publish_row_tracked_rebase_refuses_materialized_ids(
    spark, tmp_path
):
    """A branch OPTIMIZE materializes pre-assigned ids as a PHYSICAL
    column (``row_id_col``) — those cannot be re-mapped at publish, so
    the rebase arm refuses them loudly (fast-forward still fine)."""
    from mapreduce_grpc_spark.sources.snapshots import optimize_snapshot

    t = str(tmp_path / "t")
    snap_init(spark, _rng(spark, 0, 50), t, stats_cols=["k"])
    snap_enable_row_tracking(t)
    bdir = snap_create_branch(t, "b")
    snap_append(spark, bdir, _rng(spark, 100, 150))
    snap_append(spark, bdir, _rng(spark, 150, 200))
    # compact ONLY branch-born files (touching shared files would
    # refuse earlier, as an unpublished rewrite)
    optimize_snapshot(spark, bdir, where=[("k", ">=", 100)])
    assert any(
        e.get("row_id_col") for e in read_manifest(bdir)["files"]
    ), "branch OPTIMIZE should have materialized ids physically"
    snap_append(spark, t, _rng(spark, 900, 910))  # main moves
    with pytest.raises(PublishConflict, match="materialized"):
        snap_publish_branch(t, "b")


def test_publish_identity_rebase(spark, tmp_path):
    """Identity tables rebase iff main's allocator advances since the
    fork all came from THIS branch's earlier publishes: physical
    surrogate keys cannot be re-mapped, so a FOREIGN allocation
    overlapping the branch's range refuses, while the branch's own
    incremental publish chain keeps landing (and main's high-water
    ends past every published value)."""
    from mapreduce_grpc_spark.sources.snapshots import snap_add_column

    t = str(tmp_path / "t")
    snap_init(spark, _rng(spark, 0, 20), t, stats_cols=["k"])
    snap_add_column(t, "sid", "bigint", identity=(1000, 3))
    snap_append(spark, t, _rng(spark, 20, 30))  # main consumes 10 slots
    bdir = snap_create_branch(t, "b")
    snap_append(spark, bdir, _rng(spark, 100, 120))  # branch: 20 slots
    # main moved WITHOUT consuming identity (MoR delete) -> rebase OK
    delete_where_mor(spark, t, [("k", "=", 3)])
    res = snap_publish_branch(t, "b")
    assert res["mode"] == "rebase"
    got = snap_read(spark, t).select("k", "sid").collect()
    # pre-identity rows read NULL sid; allocated values must be unique
    sids = [r["sid"] for r in got if r["sid"] is not None]
    assert len(sids) == 30, "10 main + 20 branch allocated rows"
    assert len(set(sids)) == len(sids), "surrogate keys collided"
    m = read_manifest(t)
    assert m["identity"]["sid"]["high"] == 30  # 10 main + 20 branch
    # incremental publish chain: branch stages more, publishes again —
    # main's advance came from publish #1 (own), so #2 still lands
    snap_append(spark, bdir, _rng(spark, 200, 205))
    res2 = snap_publish_branch(t, "b")
    assert res2["mode"] == "rebase"
    sids2 = [
        r["sid"]
        for r in snap_read(spark, t).select("sid").collect()
        if r["sid"] is not None
    ]
    assert len(sids2) == 35 and len(set(sids2)) == len(sids2)
    assert read_manifest(t)["identity"]["sid"]["high"] == 35
    # a FOREIGN identity append after the fork overlaps the branch's
    # unpublished range -> refuse
    snap_append(spark, bdir, _rng(spark, 300, 310))
    snap_append(spark, t, _rng(spark, 400, 410))
    with pytest.raises(PublishConflict, match="collide"):
        snap_publish_branch(t, "b")


def test_publish_identity_rebase_refuses_unprovable_history(
    spark, tmp_path
):
    """The identity walk must REFUSE when it cannot attribute main's
    allocator advances: a mid-range manifest between the (tagged,
    retained) fork and head was expired, so the interleaving is
    unprovable — publish says so instead of guessing."""
    from mapreduce_grpc_spark.sources.snapshots import snap_add_column

    t = str(tmp_path / "t")
    snap_init(spark, _rng(spark, 0, 20), t, stats_cols=["k"])
    snap_add_column(t, "sid", "bigint", identity=(1, 1))
    snap_create_tag(t, "fork-pin")  # keeps the fork readable past GC
    bdir = snap_create_branch(t, "b")
    snap_append(spark, bdir, _rng(spark, 100, 110))
    # main moves twice WITHOUT identity use, then GC drops the middle
    delete_where_mor(spark, t, [("k", "=", 1)])
    delete_where_mor(spark, t, [("k", "=", 2)])
    expire_snapshots(t, keep_last=1, orphan_grace_seconds=0)
    with pytest.raises(PublishConflict, match="attribute|expired"):
        snap_publish_branch(t, "b")


def test_dropped_published_branch_swept_incrementally(spark, tmp_path):
    """After publish + drop, the branch dir lingers only as long as
    main references its bytes: once main rewrites those rows and its
    retention lets go, main's OWN expire_snapshots reclaims the
    remnant dir."""
    t = _mk(spark, str(tmp_path / "t"))
    bdir = snap_create_branch(t, "b")
    snap_append(spark, bdir, _rng(spark, 500, 550))
    snap_publish_branch(t, "b")
    snap_drop_branch(t, "b")
    assert os.path.exists(bdir), (
        "published bytes must survive the drop"
    )
    assert snap_read(spark, t).count() == 250
    # main rewrites everything -> branch bytes leave main's manifests
    merge_upsert_cow(
        spark, t,
        _rng(spark, 0, 550).withColumn("v", F.lit(1).cast("bigint")), keys=["k"],
    )
    deleted = expire_snapshots(t, keep_last=1, orphan_grace_seconds=0)
    assert any(n.startswith("_branches/b/") for n in deleted), (
        "remnant sweep must reclaim the dropped branch's files"
    )
    assert not os.path.exists(bdir)
    assert snap_read(spark, t).count() == 550


# ------------------------------------------------------- reads via the ref


def test_ref_reads_and_datasource_option(spark, tmp_path, snapshot_fs):
    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    t = _mk(spark, str(tmp_path / "t"))
    snap_create_tag(t, "pin")
    snap_append(spark, t, _rng(spark, 200, 260))
    snap_create_branch(t, "dev")
    snap_append(
        spark, snap_branch_path(t, "dev"), _rng(spark, 300, 320)
    )
    # ref + version are mutually exclusive
    with pytest.raises(ValueError, match="not both"):
        snap_read(spark, t, version=1, ref="pin")
    assert snap_read(spark, t, ref="pin").count() == 200
    assert snap_read(spark, t, ref="dev").count() == 280
    def ds(**opts):
        # fresh reader per case: DataFrameReader.option ACCUMULATES
        r = (
            spark.read.format("snapshot_table")
            .option("path", t)
            .option("fsImpl", snapshot_fs.spec)
        )
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    assert ds(ref="pin").count() == 200
    assert ds(ref="dev").count() == 280
    # Iceberg-shaped kind-asserting aliases
    assert ds(tag="pin").count() == 200
    assert ds(branch="dev").count() == 280
    with pytest.raises(Exception, match="names a tag"):
        ds(branch="pin").count()
    with pytest.raises(Exception, match="names a branch"):
        ds(tag="dev").count()
    with pytest.raises(Exception, match="ONE of"):
        ds(ref="pin", branch="dev").count()
    with pytest.raises(Exception, match="pins a version"):
        ds(ref="pin", versionAsOf="1")
    # the tag keeps reading through aggressive GC via the DataSource
    expire_snapshots(t, keep_last=1, orphan_grace_seconds=0)
    assert ds(tag="pin").count() == 200
    # writes: branch ok, tag refused
    _rng(spark, 900, 903).write.format("snapshot_table").option(
        "path", t
    ).option("fsImpl", snapshot_fs.spec).option("ref", "dev").mode(
        "append"
    ).save()
    assert snap_read(spark, t, ref="dev").count() == 283
    assert snap_read(spark, t).count() == 260
    with pytest.raises(Exception, match="TAG ref"):
        _rng(spark, 0, 1).write.format("snapshot_table").option(
            "path", t
        ).option("fsImpl", snapshot_fs.spec).option(
            "ref", "pin"
        ).mode("append").save()


# ------------------------------------------------------------- WAP end-to-end


def test_write_audit_publish_gate(spark, tmp_path):
    """The pattern this module exists for: stage a batch on a branch,
    audit it there, publish only when the audit passes — main never
    sees the bad intermediate state."""
    t = _mk(spark, str(tmp_path / "t"))
    snap_add_constraint(spark, t, "v_small", "v < 7")
    bdir = snap_create_branch(t, "staging")
    # the bad batch fails the branch's own constraint (carried by the
    # fork) — exactly the audit that must NOT run against main
    from mapreduce_grpc_spark.sources.snapshots import (
        ConstraintViolation,
    )

    bad = spark.createDataFrame([(9999, 99)], "k bigint, v bigint")
    with pytest.raises(ConstraintViolation):
        snap_append(spark, bdir, bad)
    # audit query against the staged branch state
    snap_append(spark, bdir, _rng(spark, 1000, 1050))
    staged = snap_read(spark, t, ref="staging")
    assert staged.filter("v >= 7").count() == 0  # audit passes
    assert snap_read(spark, t).count() == 200  # main untouched so far
    snap_publish_branch(t, "staging")
    snap_drop_branch(t, "staging")
    assert snap_read(spark, t).count() == 250
    assert verify_snapshot(t)["missing"] == []


def test_declarative_audit_gate(spark, tmp_path):
    """``snap_publish_branch(audits=...)`` makes the AUDIT step part
    of the protocol: expectations run against the branch head (DV-
    aware, session-free), a failure raises with the violating rows and
    leaves main untouched, and the canonical flow — stage, MoR-delete
    the bad rows, re-audit, publish — goes green because masked rows
    are excluded before evaluation.  Column-mapped tables audit under
    LOGICAL names."""
    from mapreduce_grpc_spark.sources.refs import PublishAuditFailed
    from mapreduce_grpc_spark.sources.snapshots import (
        snap_rename_column,
    )

    t = _mk(spark, str(tmp_path / "t"))  # k 0..199, v = k%7
    snap_rename_column(t, "v", "val")  # audits see logical names
    v0 = current_version(t)
    bdir = snap_create_branch(t, "b")
    snap_append(
        spark,
        snap_branch_path(t, "b"),
        _rng(spark, 500, 520).withColumnRenamed("v", "val"),
    )
    with pytest.raises(PublishAuditFailed) as ei:
        snap_publish_branch(t, "b", audits={"small_keys": "k < 300"})
    assert "small_keys" in ei.value.violations
    assert len(ei.value.violations["small_keys"]) >= 1
    assert current_version(t) == v0, (
        "failed audit must leave main untouched"
    )
    # fix-up: MoR-delete the violating rows ON THE BRANCH, re-audit —
    # the gate must not see DV-masked rows
    delete_where_mor(spark, bdir, [("k", ">=", 510)])
    r = snap_publish_branch(
        t,
        "b",
        audits={
            "small_keys": "k < 510",
            "val_domain": "val BETWEEN 0 AND 6",
        },
    )
    assert r["mode"] == "fast_forward"
    assert snap_read(spark, t).count() == 210
    # list-form audits; an inscrutable expression fails LOUDLY
    snap_create_branch(t, "b2")
    with pytest.raises(PublishAuditFailed, match="evaluated"):
        snap_publish_branch(
            t, "b2", audits=["no_such_function_xyz(k)"]
        )
    snap_drop_branch(t, "b2")


def test_audit_gate_masks_inherited_dvs(spark, tmp_path):
    """A branch forked from a main that ALREADY had MoR deletes: the
    audit's DV masking must also exclude rows masked by the inherited
    (main-owned) sidecars — the dv record's own ``base`` resolves the
    sidecar in main's dir for borrowed entries."""
    from mapreduce_grpc_spark.sources.refs import PublishAuditFailed

    t = _mk(spark, str(tmp_path / "t"))  # k 0..199
    delete_where_mor(spark, t, [("k", "<", 50)])  # main masks 50 rows
    snap_create_branch(t, "b")
    snap_append(spark, snap_branch_path(t, "b"), _rng(spark, 500, 510))
    # the masked k<50 rows must be INVISIBLE to the audit: this audit
    # fails iff any k<50 row leaks through the inherited DV
    r = snap_publish_branch(
        t, "b",
        audits={"no_deleted_rows": "k >= 50"},
        agg_audits={"visible": "count(*) = 160"},
    )
    assert r["mode"] == "fast_forward"
    assert snap_read(spark, t).count() == 160
    # control: an audit over a value only masked rows had still fails
    # when the mask is NOT there — prove the gate isn't vacuous
    snap_create_branch(t, "b2")
    snap_append(spark, snap_branch_path(t, "b2"), _rng(spark, 20, 30))
    with pytest.raises(PublishAuditFailed):
        snap_publish_branch(t, "b2", audits={"no_low": "k >= 50"})


def test_aggregate_audits_and_dry_run(spark, tmp_path):
    """Whole-relation expectations (the Iceberg-WAP audit shape) and
    the zero-side-effect publish preview: ``agg_audits`` aggregate to
    one boolean each (FALSE or NULL fails, with the evaluated value in
    the violations); ``dry_run=True`` reports the exact
    fast-forward/rebase plan without landing a marker or a commit, and
    still raises the conflicts a real publish would."""
    from mapreduce_grpc_spark.sources.refs import PublishAuditFailed

    t = _mk(spark, str(tmp_path / "t"))  # k 0..199
    bdir = snap_create_branch(t, "b")
    snap_append(spark, snap_branch_path(t, "b"), _rng(spark, 500, 520))
    ok = {
        "grew": "count(*) >= 220",
        "keys_unique": "count(DISTINCT k) = count(*)",
        "v_mean_sane": "avg(v) BETWEEN 0 AND 6",
    }
    # dry run: plan reported, nothing happens
    v0 = current_version(t)
    plan = snap_publish_branch(t, "b", agg_audits=ok, dry_run=True)
    assert plan["mode"] == "fast_forward" and plan["dry_run"]
    assert plan["version"] is None and plan["adds"] >= 1
    assert current_version(t) == v0
    assert not os.path.exists(os.path.join(bdir, "_clones")), (
        "dry run must not land a clone marker"
    )
    # failing aggregate audit carries the evaluated value
    with pytest.raises(PublishAuditFailed) as ei:
        snap_publish_branch(
            t, "b", agg_audits={"huge": "count(*) >= 10000"}
        )
    assert ei.value.violations == {"huge": [(False,)]}
    assert current_version(t) == v0
    # a non-aggregating expression is rejected loudly
    with pytest.raises(PublishAuditFailed, match="must AGGREGATE"):
        snap_publish_branch(t, "b", agg_audits={"rowish": "k > 3"})
    # row + aggregate audits compose; then the real publish lands
    r = snap_publish_branch(
        t, "b", audits={"domain": "v BETWEEN 0 AND 6"}, agg_audits=ok
    )
    assert r["mode"] == "fast_forward" and r["version"] == v0 + 1
    assert snap_read(spark, t).count() == 220
    # rebase dry run after main moves: delta-only plan, still no commit
    snap_append(spark, snap_branch_path(t, "b"), _rng(spark, 600, 605))
    snap_append(spark, t, _rng(spark, 700, 710))
    v1 = current_version(t)
    plan2 = snap_publish_branch(t, "b", dry_run=True)
    assert plan2["mode"] == "rebase" and plan2["adds"] >= 1
    assert plan2["dry_run"] and current_version(t) == v1
    # dry run raises the same conflicts a real publish would
    delete_where_mor(
        spark, snap_branch_path(t, "b"), [("k", "=", 5)]
    )
    with pytest.raises(PublishConflict):
        snap_publish_branch(t, "b", dry_run=True)
    assert current_version(t) == v1


def test_snapshot_wap_oracle_parity(spark, sf_dir):
    """Branch-staged ingest + declaratively audited MoR fix-up +
    fast-forward publish == the fixture minus the audited-out keys,
    summed in exact integer cents.  Rotated INTO the driver contract
    in round 15 — same check, now from the contract dicts (the driver
    re-hashes it independently)."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.QUERIES["snapshot_wap"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.ORACLES["snapshot_wap"],
        sf_dir,
        "snapshot_wap",
    )


def test_pipeline_ingest_wap_oracle_parity(spark, sf_dir):
    """The composed production ingest gate under the driver's own
    comparator: row-tracked corpus -> branch-staged batch -> on-branch
    dedup-vs-corpus + quality MoR deletes -> concurrent corpus append
    -> audited REBASE publish (r15's re-drawn row-id slices) -> final
    per-source stats with ``count(DISTINCT _row_id)`` under the hash,
    vs a pure-SQL recompute of the final relation."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["pipeline_ingest_wap"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["pipeline_ingest_wap"],
        sf_dir,
        "pipeline_ingest_wap",
    )


def test_append_stream_across_publish(spark, tmp_path, snapshot_fs):
    """Downstream streaming semantics of publish: an append-only
    publish flows through a running append-mode stream like any
    append; a publish that carries branch fix-up deletes is a CHANGE
    commit and must refuse by default (skipChangeCommits opts out) —
    the Delta change-commit contract, unchanged by refs."""
    from pyspark.sql import functions as SF

    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    t = _mk(spark, str(tmp_path / "t"))

    def drain(qname, opts=None):
        r = (
            spark.readStream.format("snapshot_table")
            .option("path", t)
            .option("fsImpl", snapshot_fs.spec)
        )
        for k, v in (opts or {}).items():
            r = r.option(k, v)
        q = (
            r.load()
            .groupBy()
            .agg(SF.count(SF.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.exception() is not None:
            raise RuntimeError(str(q.exception()))
        return spark.sql(f"select n from {qname}").first().n

    # append-only branch publish: just more rows to a streaming reader
    snap_create_branch(t, "adds")
    snap_append(spark, snap_branch_path(t, "adds"), _rng(spark, 500, 560))
    snap_publish_branch(t, "adds")
    assert drain("s1") == 260
    # publish carrying a MoR fix-up delete = a change commit
    snap_create_branch(t, "fix")
    delete_where_mor(spark, snap_branch_path(t, "fix"), [("k", "<", 5)])
    snap_publish_branch(t, "fix")
    with pytest.raises(Exception, match="append-only|skipChangeCommits"):
        drain("s2")
    assert drain("s3", {"skipChangeCommits": "true"}) == 260


@pytest.mark.parametrize("tracked", [False, True], ids=["plain", "tracked"])
def test_concurrent_publishes_both_land(spark, tmp_path, tracked):
    """Two append-only branches published concurrently: the OCC loop
    lets the first fast-forward and rebases the second — neither
    writer's rows are lost (the commit-claim rule mutators already
    obey, exercised through publish).  On a ROW-TRACKED table the
    losing publish must also re-draw its branch ids against the
    winner's ADVANCED watermark mid-race — every live id stays
    unique."""
    import threading

    t = _mk(spark, str(tmp_path / "t"))
    if tracked:
        snap_enable_row_tracking(t)
    for name, lo in (("b1", 1000), ("b2", 2000)):
        snap_create_branch(t, name)
        snap_append(
            spark, snap_branch_path(t, name), _rng(spark, lo, lo + 50)
        )
    results: dict[str, dict] = {}
    errs: list[Exception] = []

    def pub(name):
        try:
            results[name] = snap_publish_branch(t, name)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    th = [threading.Thread(target=pub, args=(n,)) for n in ("b1", "b2")]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    modes = sorted(r["mode"] for r in results.values())
    assert modes in (["fast_forward", "rebase"], ["rebase", "rebase"])
    got = snap_read(spark, t)
    assert got.count() == 300
    assert got.filter("k >= 1000 and k < 1050").count() == 50
    assert got.filter("k >= 2000 and k < 2050").count() == 50
    if tracked:
        ids = [
            r["_row_id"]
            for r in snap_read(spark, t, with_row_ids=True).collect()
        ]
        assert len(set(ids)) == 300, (
            "racing tracked publishes produced colliding row ids"
        )


def test_publish_is_incremental_and_idempotent(spark, tmp_path):
    """The continued-staging lifecycle: publish, stage more on the
    SAME branch, publish again — the second publish lands only the
    delta (no double-added files), an unchanged re-publish is a
    version-free no-op, and a genuine divergence (main rewrites a
    published branch file) still conflicts."""
    t = _mk(spark, str(tmp_path / "t"))
    bdir = snap_create_branch(t, "staging")
    snap_append(spark, bdir, _rng(spark, 1000, 1050))
    r1 = snap_publish_branch(t, "staging")
    assert r1["mode"] == "fast_forward"
    assert snap_read(spark, t).count() == 250
    # unchanged branch re-publish: no-op, no version bump
    v = current_version(t)
    r2 = snap_publish_branch(t, "staging")
    assert r2 == {"version": v, "mode": "noop", "adds": 0, "removes": 0}
    assert current_version(t) == v
    # stage MORE on the same branch, publish again: only the delta
    snap_append(spark, bdir, _rng(spark, 2000, 2030))
    r3 = snap_publish_branch(t, "staging")
    assert r3["mode"] == "rebase"
    got = snap_read(spark, t)
    assert got.count() == 280, "double-published files would inflate this"
    assert got.filter("k >= 1000 and k < 1050").count() == 50
    assert got.filter("k >= 2000 and k < 2030").count() == 30
    # main rewrites rows of a published branch file -> next publish of
    # a branch change to that same region conflicts loudly
    delete_where_mor(spark, t, [("k", "between", 1000, 1010)])
    snap_append(spark, bdir, _rng(spark, 3000, 3010))
    with pytest.raises(PublishConflict, match="diverged|replay"):
        snap_publish_branch(t, "staging")


def test_restore_to_tag(spark, tmp_path):
    """The WAP failure arm completed: pin last-known-good with a tag,
    take bad commits, RESTORE to the tag by name (metadata-only), and
    the tag keeps protecting the files so even an aggressive GC
    between the bad commits and the restore cannot strand it.  Branch
    refs are refused."""
    t = _mk(spark, str(tmp_path / "t"))
    snap_create_tag(t, "last-good")
    good = sorted(_rows(spark, t))
    snap_append(spark, t, _rng(spark, 9000, 9100))  # the bad batch
    expire_snapshots(t, keep_last=1, orphan_grace_seconds=0)
    from mapreduce_grpc_spark.sources.snapshots import snap_restore

    v = snap_restore(t, ref="last-good")
    assert v == current_version(t)
    assert sorted(_rows(spark, t)) == good
    snap_create_branch(t, "b")
    with pytest.raises(ValueError, match="is a branch"):
        snap_restore(t, ref="b")
    with pytest.raises(ValueError, match="not both"):
        snap_restore(t, version=1, ref="last-good")


def _rows(spark, t):
    return [(r.k, r.v) for r in snap_read(spark, t).collect()]


@pytest.mark.parametrize("tracked", [False, True], ids=["plain", "tracked"])
def test_refs_randomized_soak(spark, tmp_path, tracked):
    """Model-checked soak: a seeded random interleaving of main
    appends, branch forks, branch appends, branch MoR deletes,
    publishes, drops, tags, restores, and aggressive GC — after every
    step main must match a pure-Python row model, every live ref must
    resolve, and fsck must find nothing missing.  Publish outcomes are
    folded into the model exactly as the API defines them (a conflict
    drops the branch and discards its unpublished delta).  The
    ``tracked`` arm runs the same interleaving on a ROW-TRACKED table
    (rebase publishes re-draw branch ids under main's watermark) and
    additionally asserts live row-ids stay unique at every step."""
    import random

    from mapreduce_grpc_spark.sources.snapshots import snap_restore

    rng = random.Random(0x14F5)
    t = str(tmp_path / "t")
    snap_init(spark, _rng(spark, 0, 100), t, stats_cols=["k"])
    if tracked:
        snap_enable_row_tracking(t)
    model: set[int] = set(range(100))          # keys on main
    branches: dict[str, set[int]] = {}         # unpublished delta keys
    branch_dirty: dict[str, bool] = {}         # did MoR-delete on branch
    tags: dict[str, set[int]] = {}
    next_key = 10_000
    bseq = 0

    def fresh_keys(n):
        nonlocal next_key
        ks = set(range(next_key, next_key + n))
        next_key += n
        return ks

    for step in range(60):
        ops = ["main_append", "gc"]
        if len(branches) < 2:
            ops.append("fork")
        if branches:
            ops += ["branch_append", "publish", "drop"]
            ops.append("branch_delete")
        if len(tags) < 2:
            ops.append("tag")
        if tags:
            ops.append("restore")
        op = rng.choice(ops)
        if op == "main_append":
            ks = fresh_keys(rng.randint(5, 40))
            snap_append(
                spark, t, _rng(spark, min(ks), max(ks) + 1)
            )
            model |= ks
        elif op == "fork":
            bseq += 1
            name = f"b{bseq}"
            snap_create_branch(t, name)
            branches[name] = set()
            branch_dirty[name] = False
        elif op == "branch_append":
            name = rng.choice(sorted(branches))
            ks = fresh_keys(rng.randint(5, 30))
            snap_append(
                spark,
                snap_branch_path(t, name),
                _rng(spark, min(ks), max(ks) + 1),
            )
            branches[name] |= ks
        elif op == "branch_delete":
            # MoR-delete the branch's OWN unpublished keys only, so
            # the branch stays rebase-publishable unless main moved
            name = rng.choice(sorted(branches))
            if branches[name]:
                kill = sorted(branches[name])[: rng.randint(1, 3)]
                delete_where_mor(
                    spark,
                    snap_branch_path(t, name),
                    [("k", "in", kill)],
                )
                branches[name] -= set(kill)
                branch_dirty[name] = True
        elif op == "publish":
            name = rng.choice(sorted(branches))
            try:
                snap_publish_branch(t, name)
                model |= branches[name]
                branches[name] = set()
                branch_dirty[name] = False
            except PublishConflict:
                # unpublishable divergence: the audit-gate failure arm
                snap_drop_branch(t, name)
                del branches[name], branch_dirty[name]
        elif op == "drop":
            name = rng.choice(sorted(branches))
            snap_drop_branch(t, name)
            del branches[name], branch_dirty[name]
        elif op == "tag":
            name = f"t{step}"
            snap_create_tag(t, name)
            tags[name] = set(model)
        elif op == "restore":
            name = rng.choice(sorted(tags))
            snap_restore(t, ref=name)
            model = set(tags[name])
        elif op == "gc":
            expire_snapshots(t, keep_last=1, orphan_grace_seconds=0)
        # ---- invariants, every step
        if tracked:
            live = snap_read(spark, t, with_row_ids=True).collect()
            ids = [r["_row_id"] for r in live]
            assert len(set(ids)) == len(ids), (
                f"step {step} op {op}: duplicate live row ids"
            )
            got = {r.k for r in live}
        else:
            got = {
                r.k for r in snap_read(spark, t).select("k").collect()
            }
        assert got == model, (
            f"step {step} op {op}: main diverged from the model "
            f"(missing={sorted(model - got)[:5]}, "
            f"extra={sorted(got - model)[:5]})"
        )
        assert verify_snapshot(t)["missing"] == []
        for name, delta in branches.items():
            assert snap_read(spark, t, ref=name).count() >= len(delta)
        for name, keys in tags.items():
            assert {
                r.k
                for r in snap_read(spark, t, ref=name)
                .select("k")
                .collect()
            } == keys, f"step {step}: tag {name} no longer pins its rows"


def test_table_changes_between_tags(spark, tmp_path):
    """Release-diff CDF: ``table_changes(from_ref=, to_ref=)`` resolves
    TAG names to the version range — the "what changed between corpus
    v1 and v2" query without manual version bookkeeping.  Branch refs
    refuse (different lineage; that's publish dry-run's job)."""
    t = str(tmp_path / "t")
    snap_init(spark, _rng(spark, 0, 100), t, stats_cols=["k"])
    snap_create_tag(t, "v1.0")
    snap_append(spark, t, _rng(spark, 100, 150))
    merge_upsert_cow(
        spark, t,
        _rng(spark, 0, 10).withColumn("v", F.lit(99).cast("bigint")),
        keys=["k"],
    )
    snap_create_tag(t, "v2.0")
    snap_append(spark, t, _rng(spark, 500, 510))  # past v2.0
    ch = table_changes(
        spark, t, ["k"], from_ref="v1.0", to_ref="v2.0"
    )
    by_type = {
        r["_change_type"]: r["count"]
        for r in ch.groupBy("_change_type").count().collect()
    }
    assert by_type == {
        "insert": 50,
        "update_preimage": 10,
        "update_postimage": 10,
    }, by_type
    # open-ended: from a tag to CURRENT
    assert (
        table_changes(spark, t, ["k"], from_ref="v2.0")
        .filter("_change_type = 'insert'")
        .count()
        == 10
    )
    snap_create_branch(t, "dev")
    with pytest.raises(ValueError, match="branch"):
        table_changes(spark, t, ["k"], from_ref="v1.0", to_ref="dev")
    with pytest.raises(ValueError, match="ONE of"):
        table_changes(
            spark, t, ["k"], from_version=1, from_ref="v1.0"
        )
    snap_drop_branch(t, "dev")


def test_expire_refs_ages_out_stale_branches(spark, tmp_path):
    """Branch retention (the Iceberg max-ref-age knob): a branch whose
    HEAD commit aged past the threshold is dropped; an actively-staged
    branch and every tag survive; dry_run reports without dropping."""
    import json as _json

    from mapreduce_grpc_spark.sources.refs import snap_expire_refs
    from mapreduce_grpc_spark.sources.snapshots import (
        _current_path,
        _manifest_path,
        current_version,
    )

    t = _mk(spark, str(tmp_path / "t"))
    snap_create_tag(t, "keepme")
    snap_create_branch(t, "stale")
    snap_append(spark, snap_branch_path(t, "stale"), _rng(spark, 500, 510))
    snap_create_branch(t, "active")
    snap_append(spark, snap_branch_path(t, "active"), _rng(spark, 600, 610))
    # age the stale branch's head by rewriting its committer stamp
    bdir = snap_branch_path(t, "stale")
    bv = current_version(bdir)
    mp = _manifest_path(bdir, bv)
    with open(mp) as f:
        raw = _json.loads(f.read())
    raw["ts"] = raw["ts"] - 10_000
    with open(mp, "w") as f:
        f.write(_json.dumps(raw))
    # dry run: reported, nothing dropped
    plan = snap_expire_refs(t, 3600, dry_run=True)
    assert [(r["name"], r["action"]) for r in plan] == [
        ("stale", "would_drop")
    ]
    assert {r["name"] for r in snap_list_refs(t)} == {
        "keepme", "stale", "active"
    }
    # real pass: only the aged branch goes; the tag is never aged
    acted = snap_expire_refs(t, 3600)
    assert [(r["name"], r["action"]) for r in acted] == [
        ("stale", "dropped")
    ]
    assert {r["name"] for r in snap_list_refs(t)} == {
        "keepme", "active",
    }
    assert snap_read(spark, t, ref="active").count() == 210
    assert snap_read(spark, t).count() == 200, "main untouched"


def test_stream_into_branch_then_audited_publish(
    spark, tmp_path, snapshot_fs
):
    """The streaming WAP composition: a Structured Streaming query
    writes INTO a staging branch through the native sink
    (``.option("branch", ...)``), main never sees the in-flight rows,
    and the audited publish lands the streamed batch as one commit."""
    from pyspark.sql import functions as SF

    from mapreduce_grpc_spark.sources.refs import snap_expire_refs
    from mapreduce_grpc_spark.sources.snapshots import snap_init
    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    t = _mk(spark, str(tmp_path / "t"))  # k 0..199
    src = str(tmp_path / "src")
    snap_init(spark, _rng(spark, 1000, 1100), src, stats_cols=["k"])
    snap_create_branch(t, "stage")
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", src)
        .option("fsImpl", snapshot_fs.spec)
        .load()
        .filter(SF.col("k") % 2 == 0)
        .writeStream.format("snapshot_table")
        .option("path", t)
        .option("branch", "stage")
        .option("txnAppId", "stream-into-branch-test")
        .option("fsImpl", snapshot_fs.spec)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()
    assert snap_read(spark, t).count() == 200, (
        "main saw in-flight streamed rows"
    )
    assert snap_read(spark, t, ref="stage").count() == 250
    r = snap_publish_branch(
        t,
        "stage",
        audits={"evens_only": "k < 1000 OR k % 2 = 0"},
        agg_audits={"landed": "count(*) = 250"},
    )
    assert r["mode"] == "fast_forward"
    assert snap_read(spark, t).count() == 250
    snap_expire_refs(t, -1)  # retire the drained staging branch
    assert all(x["type"] == "tag" for x in snap_list_refs(t))
    assert snap_read(spark, t).count() == 250


def test_branch_gc_cannot_reclaim_published_bytes(spark, tmp_path):
    """After publish, the LIVE branch keeps mutating and running its
    own aggressive GC — the publish-time marker makes the branch's
    expire_snapshots protect every file main adopted, even once the
    branch itself no longer references them."""
    t = _mk(spark, str(tmp_path / "t"))
    bdir = snap_create_branch(t, "b")
    snap_append(spark, bdir, _rng(spark, 1000, 1050))
    snap_publish_branch(t, "b")
    # the branch rewrites ITS OWN lineage completely: the published
    # files leave every branch version
    merge_upsert_cow(
        spark, bdir,
        _rng(spark, 0, 1050).withColumn("v", F.lit(7).cast("bigint")),
        keys=["k"],
    )
    expire_snapshots(bdir, keep_last=1, orphan_grace_seconds=0)
    got = snap_read(spark, t)
    assert got.count() == 250
    assert got.filter("v = 7").count() == 0, "branch rewrite leaked in"
    assert verify_snapshot(t)["missing"] == []
