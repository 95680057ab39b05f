"""Column rename/drop/re-add evolution (the Delta column-mapping
model) over snapshot tables.

Physical (storage) column names are frozen at first write; renames and
drops are METADATA-ONLY commits that edit the logical schema plus the
manifest's ``column_mapping`` — zero data bytes move at any table
size.  These tests pin the contract end to end:

- rename rewrites no file; reads surface the new name, time travel the
  old; values are byte-identical;
- pruning, CoW merge planning, UPDATE, MERGE INTO, MoR deletes,
  OPTIMIZE, and the change feed all translate logical predicate/key
  columns to the physical stats/bloom keys;
- drop retires the physical name; re-adding the same logical name gets
  a fresh physical one, so dropped values can never resurrect — and
  plain schema evolution into a colliding name is rejected;
- the batch DataSource and the streaming source/sink read and write
  mapped tables bit-identically to ``snap_read``/``snap_append``;
- RESTORE carries the restored version's own mapping.

Runs over both FS backends (``snapshot_fs``).
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import DoubleType

from mapreduce_grpc_spark.sources import snapshots as snap
from mapreduce_grpc_spark.sources.snapshots import (
    ConstraintViolation,
    apply_cdc_cow,
    current_version,
    delete_keys_mor,
    merge_into,
    merge_upsert_cow,
    optimize_incremental,
    optimize_snapshot,
    prune_manifest,
    read_manifest,
    snap_add_column,
    snap_add_constraint,
    snap_append,
    snap_drop_column,
    snap_init,
    snap_read,
    snap_rename_column,
    snap_restore,
    snap_scan,
    table_changes,
    update_where,
)
from mapreduce_grpc_spark.sources.stream_source import (
    SnapshotTableStreamSource,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _df(spark, lo, n=10):
    return (
        spark.range(lo, lo + n)
        .selectExpr("id AS k", "CAST(id * 2 AS DOUBLE) AS v")
        .coalesce(1)
    )


def _file_listing(path):
    return sorted(
        (n, os.path.getmtime(os.path.join(path, n)))
        for n in os.listdir(path)
        if n.startswith("data-") and n.endswith(".parquet")
    )


def _mapped_table(spark, tmp_path, n_files=3):
    """k/v table with v renamed to val and k renamed to id — every
    subsequent op must translate through the mapping."""
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    for i in range(1, n_files):
        snap_append(spark, path, _df(spark, i * 100))
    snap_rename_column(path, "v", "val")
    snap_rename_column(path, "k", "id")
    return path


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0, 50), path, stats_cols=["k"])
    before = _file_listing(path)
    v = snap_rename_column(path, "v", "val")
    assert _file_listing(path) == before  # zero bytes rewritten
    cur = snap_read(spark, path)
    assert cur.columns == ["k", "val"]
    old = snap_read(spark, path, v - 1)
    assert old.columns == ["k", "v"]
    assert sorted(r["val"] for r in cur.collect()) == sorted(
        r["v"] for r in old.collect()
    )
    # physical name in the files is unchanged
    data = [n for n, _ in before]
    cols = pq.read_schema(os.path.join(path, data[0])).names
    assert "v" in cols and "val" not in cols


def test_pruning_translates_renamed_predicate_columns(spark, tmp_path):
    path = _mapped_table(spark, tmp_path, n_files=3)
    m = read_manifest(path)
    kept, skipped = prune_manifest(m, [("id", "between", 100, 105)])
    assert len(kept) == 1 and len(skipped) == 2
    got = snap_scan(spark, path, [("id", "between", 100, 105)])
    assert sorted(r["id"] for r in got.collect()) == list(range(100, 106))


def test_cow_merge_on_renamed_key(spark, tmp_path):
    path = _mapped_table(spark, tmp_path, n_files=3)
    up = spark.range(100, 103).selectExpr(
        "id", "CAST(999 AS DOUBLE) AS val"
    )
    r = merge_upsert_cow(spark, path, up, keys=["id"])
    # pruning still works through the mapping: one file rewritten
    assert r["rewritten"] == 1 and r["carried"] == 2
    got = {row["id"]: row["val"] for row in snap_read(spark, path).collect()}
    assert got[100] == 999.0 and got[0] == 0.0 and got[205] == 410.0
    # new files store PHYSICAL names
    m = read_manifest(path)
    newest = max(m["files"], key=lambda e: e["name"])
    cols = pq.read_schema(os.path.join(path, newest["name"])).names
    assert set(cols) == {"k", "v"}
    # and their stats stay keyed by the physical name
    assert "k" in newest["stats"]


def test_update_delete_merge_into_on_mapped_table(spark, tmp_path):
    path = _mapped_table(spark, tmp_path, n_files=2)
    r = update_where(
        spark, path, [("id", "<", 3)], {"val": "val + CAST(1000 AS DOUBLE)"}
    )
    assert r["updated"] == 3 and r["rewritten"] == 1
    got = {row["id"]: row["val"] for row in snap_read(spark, path).collect()}
    assert got[0] == 1000.0 and got[2] == 1004.0 and got[5] == 10.0

    src = spark.range(5, 7).selectExpr("id", "CAST(-1 AS DOUBLE) AS val")
    r2 = merge_into(
        spark, path, src, keys=["id"],
        matched=[("update", None, {"val": "s.val"})],
        not_matched=[("insert", None, None)],
    )
    assert r2["updated"] == 2
    got = {row["id"]: row["val"] for row in snap_read(spark, path).collect()}
    assert got[5] == -1.0 and got[6] == -1.0

    dk = spark.range(0, 2).selectExpr("id")
    r3 = delete_keys_mor(spark, path, dk, keys=["id"])
    assert r3["deleted"] == 2
    ids = {row["id"] for row in snap_read(spark, path).collect()}
    assert 0 not in ids and 1 not in ids and 2 in ids


def test_cdc_and_optimize_on_mapped_table(spark, tmp_path):
    path = _mapped_table(spark, tmp_path, n_files=3)
    batch = spark.createDataFrame(
        [(0, 5.0, "U"), (300, 6.0, "I"), (101, None, "D")],
        "id bigint, val double, _op string",
    )
    r = apply_cdc_cow(spark, path, batch, keys=["id"])
    assert r["upserted"] == 2 and r["deleted"] == 1
    got = {row["id"]: row["val"] for row in snap_read(spark, path).collect()}
    assert got[0] == 5.0 and got[300] == 6.0 and 101 not in got

    r2 = optimize_snapshot(spark, path, target_bytes=1 << 30)
    assert r2["added"] >= 1
    assert snap_read(spark, path).count() == len(got)
    # incremental re-cluster accepts the LOGICAL cluster column
    r3 = optimize_incremental(spark, path, ["id"], target_bytes=1 << 30)
    assert snap_read(spark, path).count() == len(got)
    m = read_manifest(path)
    assert all("k" in e["stats"] for e in m["files"])


def test_drop_then_readd_never_resurrects(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    v_drop = snap_drop_column(path, "v")
    assert snap_read(spark, path).columns == ["k"]
    # time travel still shows the dropped column's values
    assert snap_read(spark, path, v_drop - 1).columns == ["k", "v"]
    snap_add_column(path, "v", DoubleType())
    vals = [r["v"] for r in snap_read(spark, path).collect()]
    assert vals and all(x is None for x in vals)
    # the re-added column got a FRESH physical name
    m = read_manifest(path)
    cmx = m["column_mapping"]
    assert cmx["retired"] == ["v"]
    assert cmx["map"]["v"] != "v"
    # writes land under it and read back
    snap_append(
        spark, path,
        spark.range(500, 502).selectExpr("id AS k", "CAST(7 AS DOUBLE) AS v"),
    )
    got = {r["k"]: r["v"] for r in snap_read(spark, path).collect()}
    assert got[500] == 7.0 and got[0] is None


def test_schema_evolution_into_retired_name_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    snap_drop_column(path, "v")
    evolved = spark.range(10, 12).selectExpr(
        "id AS k", "CAST(1 AS DOUBLE) AS v"
    )
    with pytest.raises(ValueError, match="snap_add_column"):
        snap_append(spark, path, evolved, allow_schema_evolution=True)
    # merge path guards identically
    with pytest.raises(ValueError, match="snap_add_column"):
        merge_upsert_cow(
            spark, path, evolved, keys=["k"], allow_schema_evolution=True
        )


def test_rename_drop_reject_constraint_references(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    snap_add_constraint(spark, path, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="v_nonneg"):
        snap_rename_column(path, "v", "val")
    with pytest.raises(ValueError, match="v_nonneg"):
        snap_drop_column(path, "v")
    # unrelated column still renames
    snap_rename_column(path, "k", "id")
    assert snap_read(spark, path).columns == ["id", "v"]


def test_restore_carries_each_versions_own_mapping(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    v1 = current_version(path)
    snap_rename_column(path, "v", "val")
    snap_append(spark, path, _df(spark, 100).selectExpr("k", "v AS val"))
    # roll back below the rename: logical names revert, data intact
    snap_restore(path, v1, spark=spark)
    assert snap_read(spark, path).columns == ["k", "v"]
    assert snap_read(spark, path).count() == 10
    assert not (read_manifest(path).get("column_mapping") or {}).get("map")
    # roll forward to the renamed+appended state
    snap_restore(path, v1 + 2, spark=spark)
    assert snap_read(spark, path).columns == ["k", "val"]
    assert snap_read(spark, path).count() == 20


def test_change_feed_across_rename(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    v1 = current_version(path)
    snap_rename_column(path, "v", "val")  # v2: no change rows
    snap_append(spark, path, _df(spark, 100).selectExpr("k", "v AS val"))
    ch = table_changes(spark, path, keys=["k"], from_version=v1)
    rows = ch.collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert {r["_commit_version"] for r in rows} == {v1 + 2}
    assert sorted(r["val"] for r in rows) == [
        float(i * 2) for i in range(100, 110)
    ]


def test_batch_source_reads_and_writes_mapped_table(
    spark, tmp_path, snapshot_fs
):
    path = _mapped_table(spark, tmp_path, n_files=2)
    spark.dataSource.register(SnapshotTableStreamSource)
    opts = {"fsImpl": snapshot_fs.spec}

    def _read(**extra):
        r = spark.read.format("snapshot_table").option("path", path)
        for k, v in {**opts, **extra}.items():
            r = r.option(k, str(v))
        return r.load()

    got = _read()
    lib = snap_read(spark, path)
    assert got.columns == lib.columns == ["id", "val"]
    assert sorted(got.collect()) == sorted(lib.collect())
    # filter pushdown prunes through the mapping AND stays exact
    flt = _read().filter("id between 100 and 102")
    assert sorted(r["id"] for r in flt.collect()) == [100, 101, 102]
    # versionAsOf below the renames reads the ORIGINAL names
    v_old = _read(versionAsOf=2)
    assert v_old.columns == ["k", "v"]
    # the writer lands bytes under the physical names
    batch = spark.range(900, 903).selectExpr(
        "id", "CAST(3 AS DOUBLE) AS val"
    )
    (
        batch.write.format("snapshot_table")
        .option("path", path)
        .option("fsImpl", snapshot_fs.spec)
        .mode("append")
        .save()
    )
    got2 = {r["id"]: r["val"] for r in snap_read(spark, path).collect()}
    assert got2[900] == 3.0
    m = read_manifest(path)
    newest = max(
        (e for e in m["files"]), key=lambda e: e["name"].startswith("data-sink")
    )
    cols = pq.read_schema(os.path.join(path, newest["name"])).names
    assert set(cols) == {"k", "v"}


def test_batch_writer_constraints_on_mapped_table(
    spark, tmp_path, snapshot_fs
):
    path = _mapped_table(spark, tmp_path, n_files=2)
    snap_add_constraint(spark, path, "val_nonneg", "val >= 0")
    spark.dataSource.register(SnapshotTableStreamSource)
    bad = spark.range(900, 901).selectExpr(
        "id", "CAST(-5 AS DOUBLE) AS val"
    )
    with pytest.raises(Exception, match="val_nonneg"):
        (
            bad.write.format("snapshot_table")
            .option("path", path)
            .option("fsImpl", snapshot_fs.spec)
            .mode("append")
            .save()
        )
    ok = spark.range(900, 901).selectExpr("id", "CAST(5 AS DOUBLE) AS val")
    (
        ok.write.format("snapshot_table")
        .option("path", path)
        .option("fsImpl", snapshot_fs.spec)
        .mode("append")
        .save()
    )
    assert {r["val"] for r in snap_scan(
        spark, path, [("id", "=", 900)]
    ).collect()} == {5.0}


def test_stream_source_and_sink_on_mapped_tables(
    spark, tmp_path, snapshot_fs
):
    src_path = _mapped_table(spark, tmp_path, n_files=2)
    sink_path = str(tmp_path / "sink")
    # the sink target is itself a MAPPED table
    snap_init(
        spark,
        _df(spark, 0, 1).selectExpr("k AS id", "v AS val").limit(0),
        sink_path,
        stats_cols=["id"],
    )
    snap_rename_column(sink_path, "val", "value")
    spark.dataSource.register(SnapshotTableStreamSource)
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", src_path)
        .option("fsImpl", snapshot_fs.spec)
        .load()
        .selectExpr("id", "val AS value")
        .writeStream.format("snapshot_table")
        .option("path", sink_path)
        .option("fsImpl", snapshot_fs.spec)
        .option("txnAppId", "cm-e2e")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = snap_read(spark, sink_path)
    assert got.columns == ["id", "value"]
    src = snap_read(spark, src_path)
    assert sorted(got.collect()) == sorted(
        src.selectExpr("id", "val AS value").collect()
    )
    # sink files carry the sink's PHYSICAL names (id, val)
    m = read_manifest(sink_path)
    sink_file = next(
        e["name"] for e in m["files"] if e["name"].startswith("data-sink")
    )
    cols = pq.read_schema(os.path.join(sink_path, sink_file)).names
    assert set(cols) == {"id", "val"}


def test_sink_rejects_mapping_drift_mid_query(spark, tmp_path, snapshot_fs):
    """A rename landing between query planning and a micro-batch commit
    must fail the batch loudly (the files were written under the old
    physical names), never publish mis-named columns."""
    from mapreduce_grpc_spark.sources.stream_source import (
        _SnapshotStreamWriter,
    )
    from mapreduce_grpc_spark.sources.batch_source import (
        write_arrow_parquet,
    )
    import pyarrow as pa

    path = str(tmp_path / "t")
    snap_init(spark, _df(spark, 0), path, stats_cols=["k"])
    schema = snap_read(spark, path).schema
    w = _SnapshotStreamWriter(
        path, schema, "drift-test", fs_spec=snapshot_fs.spec, cm={}
    )
    name = write_arrow_parquet(
        path,
        schema.json(),
        pa.Table.from_pandas(
            _df(spark, 50).toPandas(), preserve_index=False
        ).to_batches(),
        {},
    )
    snap_rename_column(path, "v", "val")  # the drift

    class _Msg:
        pass

    msg = _Msg()
    msg.name = name
    with pytest.raises(Exception, match="column mapping"):
        w.commit([msg], 0)
    # the never-visible file was cleaned up
    assert not os.path.exists(os.path.join(path, name))
    assert snap_read(spark, path).count() == 10


def test_snap_overwrite_on_mapped_table(spark, tmp_path):
    """Library-level overwrite: replaces the file set in one commit,
    honors the column mapping (physical names on disk), keeps history
    time-travelable, and rejects shape changes."""
    from mapreduce_grpc_spark.sources.snapshots import snap_overwrite

    path = _mapped_table(spark, tmp_path, n_files=2)
    v0 = current_version(path)
    fresh = spark.range(1000, 1005).selectExpr(
        "id", "CAST(id AS DOUBLE) AS val"
    )
    r = snap_overwrite(spark, path, fresh)
    assert r["removed"] >= 2 and r["carried"] == 0
    assert sorted(x["id"] for x in snap_read(spark, path).collect()) == [
        1000, 1001, 1002, 1003, 1004,
    ]
    # old version still reads in full
    assert snap_read(spark, path, v0).count() == 20
    m = read_manifest(path)
    cols = pq.read_schema(
        os.path.join(path, m["files"][0]["name"])
    ).names
    assert set(cols) == {"k", "v"}  # physical names
    with pytest.raises(ValueError, match="snap_overwrite"):
        snap_overwrite(
            spark, path, spark.range(3).selectExpr("id AS other")
        )


def test_snapshot_column_evolution_oracle_parity(spark, sf_dir):
    """The whole evolution pipeline (rename x2, drop, re-add, CoW
    merge through the mapping) under the driver's own hash comparator
    — rotated INTO the 50-query contract round 13 (the driver
    re-hashes it independently)."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    name = "snapshot_column_evolution"
    df = registry.QUERIES[name](spark, sf_dir)
    assert_oracle_match(df, registry.ORACLES[name], sf_dir, name)
