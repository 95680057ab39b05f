"""Identity columns (``GENERATED ALWAYS AS IDENTITY``).

`snap_add_column(..., identity=(start, step))` declares an
allocator-assigned bigint surrogate key: `snap_append` reserves the
exact range from the manifest high-water mark and numbers rows
deterministically; writers may never supply the column; keyed
mutators / overwrite / the DataSource & streaming sinks refuse
identity tables loudly; deletes, UPDATE of other columns, OPTIMIZE,
RESTORE and CLONE carry assigned values untouched; racing appends
stay collision-free (a lost commit race re-runs against the new
high-water mark).  Runs under BOTH commit-protocol FS backends.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources import snapshots as S
from mapreduce_grpc_spark.sources.snapshots import (
    UnsupportedTableFeature,
    apply_cdc_cow,
    delete_where_mor,
    merge_upsert_cow,
    optimize_snapshot,
    read_manifest,
    snap_add_column,
    snap_append,
    snap_clone,
    snap_drop_column,
    snap_init,
    snap_overwrite,
    snap_read,
    snap_rename_column,
    snap_restore,
    update_where,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _mk(spark, path, n=20, identity=(1000, 3)):
    snap_init(
        spark,
        spark.range(n).selectExpr("id AS k", "id * 2 AS v"),
        path,
        stats_cols=["k"],
    )
    snap_add_column(path, "sid", "bigint", identity=identity)


def _batch(spark, lo, n):
    return spark.range(lo, lo + n).selectExpr("id AS k", "id * 2 AS v")


def _sids(spark, path):
    return {
        r.k: r.sid for r in snap_read(spark, path).collect()
    }


def test_declaration_and_assignment(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    m = read_manifest(path)
    assert m["identity"] == {"sid": {"start": 1000, "step": 3, "high": 0}}
    assert "identity_columns" in (m.get("writer_features") or [])
    # history reads NULL (no backfill)
    assert all(v is None for v in _sids(spark, path).values())

    snap_append(spark, path, _batch(spark, 100, 6).repartitionByRange(2, "k"))
    got = _sids(spark, path)
    assigned = sorted(v for v in got.values() if v is not None)
    assert assigned == [1000, 1003, 1006, 1009, 1012, 1015]
    assert read_manifest(path)["identity"]["sid"]["high"] == 6
    # second append continues above the watermark, never reuses
    snap_append(spark, path, _batch(spark, 200, 4))
    assigned = sorted(
        v for v in _sids(spark, path).values() if v is not None
    )
    assert assigned == [1000 + 3 * i for i in range(10)]
    assert len(set(assigned)) == 10


def test_declaration_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(
        spark, _batch(spark, 0, 5), path, stats_cols=["k"],
    )
    with pytest.raises(ValueError, match="bigint"):
        snap_add_column(path, "sid", "int", identity=True)
    with pytest.raises(ValueError, match="nonzero"):
        snap_add_column(path, "sid", "bigint", identity=(1, 0))
    with pytest.raises(ValueError, match="mutually exclusive"):
        snap_add_column(path, "sid", "bigint", identity=True, default=1)
    snap_add_column(path, "sid", "bigint", identity=True)  # (1, 1)
    snap_append(spark, path, _batch(spark, 10, 3))
    assert sorted(
        v for v in _sids(spark, path).values() if v is not None
    ) == [1, 2, 3]


def test_writers_may_never_supply_and_mutators_refuse(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    with pytest.raises(ValueError, match="IDENTITY"):
        snap_append(
            spark, path,
            spark.createDataFrame(
                [(99, 1, 7)], "k bigint, v bigint, sid bigint"
            ),
        )
    upd = spark.createDataFrame(
        [(1, 9, 999)], "k bigint, v bigint, sid bigint"
    )
    with pytest.raises(ValueError, match="IDENTITY"):
        merge_upsert_cow(spark, path, upd, keys=["k"])
    with pytest.raises(ValueError, match="IDENTITY"):
        apply_cdc_cow(
            spark, path, upd.withColumn("_op", F.lit("U")), keys=["k"]
        )
    with pytest.raises(ValueError, match="IDENTITY"):
        snap_overwrite(spark, path, upd)
    with pytest.raises(ValueError, match="IDENTITY"):
        update_where(
            spark, path, [("k", "<", 5)],
            {"sid": "cast(0 as bigint)"},
        )


def test_values_survive_maintenance_and_mutation(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=10)
    snap_append(spark, path, _batch(spark, 100, 8).repartitionByRange(2, "k"))
    before = _sids(spark, path)
    # UPDATE of another column keeps sids
    update_where(spark, path, [("k", ">=", 100)], {"v": "v + 1"})
    assert _sids(spark, path) == before
    # MoR delete retires, never reassigns
    delete_where_mor(spark, path, [("k", "between", 100, 101)])
    v_del = read_manifest(path)["version"]
    after_del = _sids(spark, path)
    assert set(after_del) == set(before) - {100, 101}
    # OPTIMIZE carries values
    optimize_snapshot(spark, path, target_bytes=10**9)
    assert _sids(spark, path) == after_del
    # appends after maintenance continue above the high-water mark
    snap_append(spark, path, _batch(spark, 300, 2))
    vals = [v for v in _sids(spark, path).values() if v is not None]
    assert len(set(vals)) == len(vals)
    # RESTORE re-publishes historical values; the allocator watermark
    # stays monotone (carried from CURRENT)
    snap_restore(path, v_del, spark=spark)
    assert _sids(spark, path) == after_del
    snap_append(spark, path, _batch(spark, 400, 1))
    vals = [v for v in _sids(spark, path).values() if v is not None]
    assert len(set(vals)) == len(vals)


def test_racing_appends_never_collide(spark, tmp_path):
    """Concurrent appenders: each loser re-runs against the winner's
    high-water mark, so assigned values stay globally unique."""
    import threading

    path = str(tmp_path / "t")
    _mk(spark, path, n=0 or 5)
    errs = []

    def writer(i):
        try:
            snap_append(spark, path, _batch(spark, 1000 * i, 10))
        except Exception as e:  # pragma: no cover
            errs.append((i, repr(e)))

    ts = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    vals = [
        r.sid
        for r in snap_read(spark, path).collect()
        if r.sid is not None
    ]
    assert len(vals) == 40
    assert len(set(vals)) == 40, "racing appends must not collide"
    assert read_manifest(path)["identity"]["sid"]["high"] == 40


def test_rename_drop_clone_interplay(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=5)
    snap_append(spark, path, _batch(spark, 100, 3))
    snap_rename_column(path, "sid", "surrogate")
    m = read_manifest(path)
    assert "surrogate" in m["identity"] and "sid" not in m["identity"]
    snap_append(spark, path, _batch(spark, 200, 2))
    vals = sorted(
        r.surrogate
        for r in snap_read(spark, path).collect()
        if r.surrogate is not None
    )
    assert vals == [1000, 1003, 1006, 1009, 1012]

    # clone: values shared, allocator continues above the source mark
    dst = str(tmp_path / "c")
    snap_clone(path, dst)
    m2 = read_manifest(dst)
    assert m2["identity"]["surrogate"]["high"] == 5
    snap_append(spark, dst, _batch(spark, 300, 1))
    dvals = sorted(
        r.surrogate
        for r in snap_read(spark, dst).collect()
        if r.surrogate is not None
    )
    assert dvals == [1000, 1003, 1006, 1009, 1012, 1015]

    # drop kills the declaration and the writer gate
    snap_drop_column(path, "surrogate")
    m3 = read_manifest(path)
    assert not m3.get("identity")
    assert "identity_columns" not in (m3.get("writer_features") or [])


def test_sink_and_batch_writer_refuse(spark, tmp_path, snapshot_fs):
    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    path = str(tmp_path / "t")
    _mk(spark, path, n=5)
    df = spark.createDataFrame(
        [(9, 1, 5)], "k bigint, v bigint, sid bigint"
    )
    w = (
        df.write.format("snapshot_table").option("path", path)
        .mode("append")
    )
    if snapshot_fs.spec:
        w = w.option("fsImpl", snapshot_fs.spec)
    with pytest.raises(Exception, match="IDENTITY"):
        w.save()
    assert snap_read(spark, path).count() == 5


def test_snapshot_identity_cols_oracle_parity(spark, sf_dir):
    """The AUX query's DuckDB hash: allocator assignment on a
    key-sorted append == ROW_NUMBER over the key, history NULL."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["snapshot_identity_cols"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["snapshot_identity_cols"],
        sf_dir,
        "snapshot_identity_cols",
    )


def test_legacy_writer_refuses_identity_table(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    _mk(spark, path, n=5)
    legacy = S.SUPPORTED_WRITER_FEATURES - {"identity_columns"}
    monkeypatch.setattr(S, "SUPPORTED_WRITER_FEATURES", legacy)
    with pytest.raises(UnsupportedTableFeature, match="identity_columns"):
        snap_append(spark, path, _batch(spark, 50, 1))
