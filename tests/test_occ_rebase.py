"""Logical conflict resolution (rebase instead of re-run) after a lost
commit race — the Delta conflict-detection protocol (Armbrust et al.,
VLDB 2020 §3.2) over this layer's delta commit records.

Conflicts are injected DETERMINISTICALLY: ``_commit`` is wrapped so the
mutator's first commit attempt is preceded by a real concurrent commit
(append / delete / constraint change), guaranteeing the attempt loses
the race.  Whether the mutator then REBASED (re-committed its already-
computed delta) or RE-RAN is observable in the winning commit record:
a rebased commit carries ``commit_info.rebased_over``; a re-run does
not.  Every test also checks the table's final rows — the protocol may
never trade correctness for the saved work."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources import snapshots as S
from mapreduce_grpc_spark.sources.snapshots import (
    current_version,
    delete_where_mor,
    merge_into,
    merge_upsert_cow,
    optimize_snapshot,
    read_manifest,
    snap_append,
    snap_init,
    snap_read,
    update_where,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _mk(spark, path, n=100, n_files=2):
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


def _kv(spark, path):
    return sorted((r.k, r.v) for r in snap_read(spark, path).collect())


def _inject_before_first_commit(monkeypatch, fn):
    """Arrange for ``fn()`` (a real concurrent commit) to run just
    before the NEXT ``_commit`` call, which therefore loses the race."""
    orig = S._commit
    state = {"armed": True}

    def wrapper(*a, **kw):
        if state["armed"]:
            state["armed"] = False
            fn()  # its own commits delegate straight to orig
        return orig(*a, **kw)

    monkeypatch.setattr(S, "_commit", wrapper)


def _info(path, version):
    return read_manifest(path, version).get("commit_info", {})


def _append(spark, path, lo, hi):
    snap_append(
        spark,
        path,
        spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.concat(F.lit("a"), F.col("id")).alias("v"),
        ),
    )


def test_optimize_rebases_over_concurrent_append(spark, tmp_path, monkeypatch):
    """Background compaction must not redo its rewrite because an
    append won the race: the commit is REBASED (rearrangements never
    conflict with adds) and the appended rows survive untouched."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=100, n_files=4)
    before = _kv(spark, path)

    writes = {"n": 0}
    orig_w = S._write_data_files

    def counting(*a, **kw):
        writes["n"] += 1
        return orig_w(*a, **kw)

    monkeypatch.setattr(S, "_write_data_files", counting)
    _inject_before_first_commit(
        monkeypatch, lambda: _append(spark, path, 1000, 1010)
    )
    res = optimize_snapshot(spark, path, target_bytes=1 << 30)
    assert res["rewritten"] == 4
    assert current_version(path) == 3  # init, injected append, optimize
    info = _info(path, 3)
    assert info["op"] == "optimize"
    assert info["rebased_over"] == 1
    # the rewrite ran ONCE: optimize's own write + the injected append's
    assert writes["n"] == 2
    appended = [(k, f"a{k}") for k in range(1000, 1010)]
    assert _kv(spark, path) == sorted(before + appended)


def test_delete_rebases_when_winner_adds_are_prunable(
    spark, tmp_path, monkeypatch
):
    """Serializable-safe rebase: the winner's appended file's key stats
    prove it cannot match the delete predicate, so even under strict
    serializable isolation the delete re-commits its deletion vector
    without re-scanning."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    _inject_before_first_commit(
        monkeypatch, lambda: _append(spark, path, 1000, 1005)
    )
    res = delete_where_mor(
        spark, path, [("k", "between", 10, 20)], isolation="serializable"
    )
    assert res["deleted"] == 11
    assert current_version(path) == 3
    assert _info(path, 3)["rebased_over"] == 1
    got = _kv(spark, path)
    assert [(k, f"a{k}") for k in range(1000, 1005)] == got[-5:]
    assert not any(10 <= k <= 20 for k, _ in got)


def test_delete_write_serializable_tolerates_matching_blind_append(
    spark, tmp_path, monkeypatch
):
    """Delta's default isolation: a blind append that WOULD match the
    predicate does not conflict — the delete serializes first, so the
    concurrently appended rows survive it."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    _inject_before_first_commit(
        monkeypatch, lambda: _append(spark, path, 12, 15)
    )
    res = delete_where_mor(spark, path, [("k", "between", 10, 20)])
    assert res["deleted"] == 11  # pre-existing matches only
    assert _info(path, current_version(path))["rebased_over"] == 1
    got = _kv(spark, path)
    # appended duplicates of k=12..14 survive under "delete ran first"
    assert sorted(v for k, v in got if 10 <= k <= 20) == [
        "a12", "a13", "a14"
    ]


def test_delete_serializable_reruns_on_matching_append(
    spark, tmp_path, monkeypatch
):
    """Strict serializable: the same matching blind append IS a read
    conflict — the delete re-runs against the new head and deletes the
    appended matches too."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    _inject_before_first_commit(
        monkeypatch, lambda: _append(spark, path, 12, 15)
    )
    res = delete_where_mor(
        spark, path, [("k", "between", 10, 20)], isolation="serializable"
    )
    assert res["deleted"] == 14  # 11 originals + 3 appended matches
    assert "rebased_over" not in _info(path, current_version(path))
    assert not any(10 <= k <= 20 for k, _ in _kv(spark, path))


def test_merge_upsert_rebases_over_disjoint_append(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    _mk(spark, path)
    upd = spark.createDataFrame(
        [(5, "U5"), (200, "U200")], "k bigint, v string"
    )
    _inject_before_first_commit(
        monkeypatch, lambda: _append(spark, path, 1000, 1003)
    )
    res = merge_upsert_cow(spark, path, upd, keys=["k"])
    assert current_version(path) == 3
    assert _info(path, 3)["rebased_over"] == 1
    assert res["rewritten"] >= 1
    got = dict(_kv(spark, path))
    assert got[5] == "U5" and got[200] == "U200"
    assert got[1000] == "a1000"
    assert len(got) == 100 + 1 + 3  # originals + inserted key + appended


def test_update_reruns_when_winner_touches_candidate_file(
    spark, tmp_path, monkeypatch
):
    """A winner that re-pointed one of the update's candidate files
    (concurrent DV delete on the same key range) is a REAL conflict:
    the update must re-run on the winner's head, and both operations'
    effects land."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    _inject_before_first_commit(
        monkeypatch,
        lambda: delete_where_mor(spark, path, [("k", "=", 11)]),
    )
    res = update_where(
        spark, path, [("k", "between", 10, 20)], {"v": "'UPD'"}
    )
    assert "rebased_over" not in _info(path, current_version(path))
    assert res["updated"] == 10  # k=11 was deleted by the winner
    got = dict(_kv(spark, path))
    assert 11 not in got
    assert all(got[k] == "UPD" for k in range(10, 21) if k != 11)


def test_rebase_refused_on_constraint_drift(spark, tmp_path, monkeypatch):
    """Table-metadata drift always conflicts: a constraint added
    concurrently forces the merge to re-run (and re-validate)."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    upd = spark.createDataFrame([(300, "U300")], "k bigint, v string")
    _inject_before_first_commit(
        monkeypatch,
        lambda: S.snap_add_constraint(spark, path, "k_pos", "k >= 0"),
    )
    merge_upsert_cow(spark, path, upd, keys=["k"])
    v = current_version(path)
    assert "rebased_over" not in _info(path, v)
    assert read_manifest(path).get("constraints", {}).get("k_pos")
    assert dict(_kv(spark, path))[300] == "U300"


def test_merge_by_source_write_serializable_append_survives(
    spark, tmp_path, monkeypatch
):
    """WHEN NOT MATCHED BY SOURCE reads the whole table, so appends are
    read conflicts under serializable — but under write-serializable
    the merge serializes first and the appended rows survive the
    by-source delete."""
    path = str(tmp_path / "t")
    _mk(spark, path, n=20, n_files=1)
    src = spark.createDataFrame(
        [(k,) for k in range(10)], "k bigint"
    ).withColumn("v", F.concat(F.lit("s"), F.col("k")))
    _inject_before_first_commit(
        monkeypatch, lambda: _append(spark, path, 500, 503)
    )
    merge_into(
        spark, path, src, keys=["k"],
        matched=[("update", None, {"v": "s.v"})],
        not_matched_by_source=[("delete", None)],
    )
    v = current_version(path)
    assert _info(path, v)["rebased_over"] == 1
    got = dict(_kv(spark, path))
    # target rows 10..19 deleted by-source; appended 500..502 survive
    assert sorted(got) == list(range(10)) + [500, 501, 502]
    assert got[3] == "s3"


def test_rebase_chain_two_consecutive_winners(spark, tmp_path, monkeypatch):
    """Two disjoint winners land before the delete's first attempt: the
    rebase validates EVERY intervening delta, then commits once."""
    path = str(tmp_path / "t")
    _mk(spark, path)

    def two_appends():
        _append(spark, path, 1000, 1002)
        _append(spark, path, 2000, 2002)

    _inject_before_first_commit(monkeypatch, two_appends)
    res = delete_where_mor(
        spark, path, [("k", "between", 0, 4)], isolation="serializable"
    )
    assert res["deleted"] == 5
    assert current_version(path) == 4
    assert _info(path, 4)["rebased_over"] == 2
    assert len(_kv(spark, path)) == 95 + 4


def test_threaded_optimize_races_appenders(spark, tmp_path):
    """Un-mocked stress: compaction racing three real appender threads.
    Whatever interleaving happens, no append is lost, optimize lands,
    and the rows are exactly right."""
    import threading

    path = str(tmp_path / "t")
    _mk(spark, path, n=200, n_files=8)
    errs = []

    def appender(i):
        try:
            _append(spark, path, 10_000 + i * 10, 10_000 + i * 10 + 5)
        except Exception as e:  # pragma: no cover
            errs.append(repr(e))

    threads = [
        threading.Thread(target=appender, args=(i,)) for i in range(3)
    ]
    for t in threads:
        t.start()
    res = optimize_snapshot(spark, path, target_bytes=1 << 30)
    for t in threads:
        t.join()
    assert errs == []
    assert res["rewritten"] >= 2
    got = dict(_kv(spark, path))
    assert len(got) == 200 + 15
    for i in range(3):
        for j in range(5):
            assert got[10_000 + i * 10 + j] == f"a{10_000 + i * 10 + j}"


def test_append_rebases_over_concurrent_append(spark, tmp_path, monkeypatch):
    """A lost append race must not re-execute the Spark write job: the
    already-written files re-commit on the new head (appends commute),
    and both appends' rows land exactly once."""
    path = str(tmp_path / "t")
    _mk(spark, path)

    writes = {"n": 0}
    orig_w = S._write_data_files

    def counting(*a, **kw):
        writes["n"] += 1
        return orig_w(*a, **kw)

    monkeypatch.setattr(S, "_write_data_files", counting)
    _inject_before_first_commit(
        monkeypatch, lambda: _append(spark, path, 2000, 2003)
    )
    _append(spark, path, 1000, 1003)
    assert current_version(path) == 3
    assert _info(path, 3)["rebased_over"] == 1
    # ONE write for the loser + one for the injected winner — no re-run
    assert writes["n"] == 2
    got = dict(_kv(spark, path))
    assert len(got) == 100 + 6
    assert got[1000] == "a1000" and got[2000] == "a2000"


def test_append_reruns_on_concurrent_schema_evolution(
    spark, tmp_path, monkeypatch
):
    """Metadata drift always re-runs — and the re-run applies the
    CURRENT schema's rules: after a winner adds a column, a batch that
    no longer supplies every table column is rejected LOUDLY (a rebase
    would have silently committed pre-evolution files past the
    column-completeness check) and nothing partial lands."""
    path = str(tmp_path / "t")
    _mk(spark, path)

    def evolve():
        snap_append(
            spark,
            path,
            spark.range(5000, 5002).select(
                F.col("id").alias("k"),
                F.lit("w").alias("v"),
                F.lit(1).cast("bigint").alias("extra"),
            ),
            allow_schema_evolution=True,
        )

    _inject_before_first_commit(monkeypatch, evolve)
    with pytest.raises(ValueError, match="missing \\['extra'\\]"):
        _append(spark, path, 1000, 1003)
    # only the winner's evolution landed; the loser committed nothing
    assert current_version(path) == 2
    df = snap_read(spark, path)
    assert "extra" in df.columns
    rows = {r.k: r.extra for r in df.collect()}
    assert len(rows) == 100 + 2
    assert rows[5000] == 1 and rows[0] is None
