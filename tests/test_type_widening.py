"""Type widening (the Delta ``ALTER TABLE ... ALTER COLUMN ... TYPE``
shape) over snapshot tables: ``snap_widen_column`` changes a column to
a LOSSLESS wider type as a metadata-only commit — zero data bytes move
at any table size; old files keep their narrow physical types and every
read path upcasts under the manifest's declared schema.

Pinned here:
- the widening matrix (allowed losslessly / refused as lossy);
- widen rewrites no file; values exact through the narrow->wide read;
  time travel returns the narrow schema;
- stats pruning still prunes (and never wrongly prunes) across files
  whose footer stats predate the widening;
- strict mutation validation stays strict, with a snap_widen_column
  hint when every mismatch is a widening;
- the batch DataSource and streaming source read widened tables
  bit-identically (their per-column Arrow casts upcast);
- composition with column mapping (widen a renamed column) and CoW
  merge after widening.

Runs over both FS backends (``snapshot_fs``).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    ByteType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
)

from mapreduce_grpc_spark.sources.snapshots import (
    _is_widening,
    current_version,
    merge_upsert_cow,
    prune_manifest,
    read_manifest,
    snap_append,
    snap_init,
    snap_read,
    snap_rename_column,
    snap_scan,
    snap_widen_column,
)
from mapreduce_grpc_spark.sources.stream_source import (
    SnapshotTableStreamSource,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _narrow_df(spark, lo, n=10):
    return (
        spark.range(lo, lo + n)
        .selectExpr(
            "CAST(id AS INT) AS k",
            "CAST(id / 4 AS FLOAT) AS v",
            "CAST(id AS DECIMAL(5, 2)) AS d",
        )
        .coalesce(1)
    )


def _data_files(path):
    return sorted(
        n
        for n in os.listdir(path)
        if n.startswith("data-") and n.endswith(".parquet")
    )


def test_widening_matrix():
    ok = [
        (ByteType(), ShortType()),
        (ByteType(), LongType()),
        (ShortType(), IntegerType()),
        (IntegerType(), LongType()),
        (FloatType(), DoubleType()),
        (IntegerType(), DoubleType()),
        (ShortType(), DoubleType()),
        (DecimalType(5, 2), DecimalType(12, 4)),
        (DecimalType(5, 2), DecimalType(10, 2)),
        (IntegerType(), DecimalType(10, 0)),
        (IntegerType(), DecimalType(14, 4)),
        (LongType(), DecimalType(19, 0)),
    ]
    for old, new in ok:
        assert _is_widening(old, new), (old, new)
    lossy = [
        (LongType(), IntegerType()),       # narrowing
        (DoubleType(), FloatType()),       # narrowing
        (LongType(), DoubleType()),        # > 53-bit mantissa
        (IntegerType(), IntegerType()),    # not a change
        (DecimalType(12, 4), DecimalType(5, 2)),   # shrink both
        (DecimalType(5, 2), DecimalType(5, 3)),    # steals int digits
        (IntegerType(), DecimalType(9, 0)),        # int needs 10
        (LongType(), DecimalType(18, 0)),          # long needs 19
        (StringType(), LongType()),        # not numeric
        (IntegerType(), StringType()),     # type-class change
    ]
    for old, new in lossy:
        assert not _is_widening(old, new), (old, new)


def test_widen_is_metadata_only_and_time_travels(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(spark, _narrow_df(spark, 0), path, stats_cols=["k"])
    snap_append(spark, path, _narrow_df(spark, 100))
    files_before = _data_files(path)
    v_narrow = current_version(path)
    snap_widen_column(path, "k", "bigint")
    snap_widen_column(path, "v", "double")
    snap_widen_column(path, "d", DecimalType(12, 4))
    assert _data_files(path) == files_before, "widen must move no bytes"
    cur = snap_read(spark, path)
    got = {f.name: f.dataType for f in cur.schema.fields}
    assert got["k"] == LongType()
    assert got["v"] == DoubleType()
    assert got["d"] == DecimalType(12, 4)
    rows = {r.k: (r.v, r.d) for r in cur.collect()}
    assert len(rows) == 20
    for k in list(range(10)) + list(range(100, 110)):
        v, d = rows[k]
        assert v == pytest.approx(k / 4, abs=1e-6)
        assert float(d) == float(k)
    # time travel below the widening reads the NARROW types
    old = snap_read(spark, path, version=v_narrow)
    old_types = {f.name: f.dataType for f in old.schema.fields}
    assert old_types["k"] == IntegerType()
    assert old_types["v"] == FloatType()
    assert old_types["d"] == DecimalType(5, 2)


def test_widen_refuses_lossy_and_unknown(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(spark, _narrow_df(spark, 0), path, stats_cols=["k"])
    for col, to in [("k", "smallint"), ("v", "float"), ("d", "decimal(5,3)")]:
        with pytest.raises(ValueError, match="not a lossless widening"):
            snap_widen_column(path, col, to)
    with pytest.raises(ValueError, match="no column"):
        snap_widen_column(path, "nope", "bigint")


def test_append_after_widen_and_validator_hint(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(spark, _narrow_df(spark, 0), path, stats_cols=["k"])
    wide = spark.range(200, 210).selectExpr(
        "id AS k",
        "CAST(id / 4 AS DOUBLE) AS v",
        "CAST(id AS DECIMAL(12, 4)) AS d",
    )
    # before widening: strict rejection, but the error points at the DDL
    with pytest.raises(ValueError, match="snap_widen_column"):
        snap_append(spark, path, wide)
    snap_widen_column(path, "k", "bigint")
    snap_widen_column(path, "v", "double")
    snap_widen_column(path, "d", DecimalType(12, 4))
    snap_append(spark, path, wide)
    rows = {r.k: r.v for r in snap_read(spark, path).collect()}
    assert len(rows) == 20 and rows[205] == pytest.approx(51.25)


def test_stats_pruning_survives_widening(spark, tmp_path):
    """Old files' footer stats were collected at the narrow type; a
    post-widening predicate at the wide type must still prune them
    correctly — and never wrongly."""
    path = str(tmp_path / "t")
    snap_init(spark, _narrow_df(spark, 0), path, stats_cols=["k"])
    snap_append(spark, path, _narrow_df(spark, 100))
    snap_widen_column(path, "k", "bigint")
    snap_append(
        spark,
        path,
        spark.range(1_000, 1_010).selectExpr(
            "id AS k",
            "CAST(id / 4 AS FLOAT) AS v",
            "CAST(id % 100 AS DECIMAL(5, 2)) AS d",
        ).coalesce(1),
    )
    m = read_manifest(path)
    assert len(m["files"]) == 3
    kept, _ = prune_manifest(m, [("k", ">=", 1_000)])
    assert len(kept) == 1, "narrow-stats files must prune under a long pred"
    kept2, _ = prune_manifest(m, [("k", "between", 100, 109)])
    assert len(kept2) == 1
    rows = snap_scan(spark, path, [("k", ">=", 100)]).collect()
    assert sorted(r.k for r in rows) == list(range(100, 110)) + list(
        range(1_000, 1_010)
    )


def test_widen_composes_with_column_mapping_and_merge(spark, tmp_path):
    path = str(tmp_path / "t")
    snap_init(spark, _narrow_df(spark, 0), path, stats_cols=["k"])
    snap_rename_column(path, "k", "id")
    snap_widen_column(path, "id", "bigint")
    cur = snap_read(spark, path)
    assert dict(
        (f.name, f.dataType) for f in cur.schema.fields
    )["id"] == LongType()
    assert sorted(r.id for r in cur.collect()) == list(range(10))
    # CoW merge with a widened-typed batch rewrites correctly
    batch = spark.range(5, 8).selectExpr(
        "id",
        "CAST(99.5 AS FLOAT) AS v",
        "CAST(7 AS DECIMAL(5, 2)) AS d",
    )
    merge_upsert_cow(spark, path, batch, keys=["id"])
    rows = {r.id: r.v for r in snap_read(spark, path).collect()}
    assert len(rows) == 10
    assert rows[6] == pytest.approx(99.5)


def test_widened_table_through_batch_and_stream_sources(
    spark, tmp_path, snapshot_fs
):
    path = str(tmp_path / "t")
    snap_init(spark, _narrow_df(spark, 0), path, stats_cols=["k"])
    snap_append(spark, path, _narrow_df(spark, 100))
    snap_widen_column(path, "k", "bigint")
    snap_widen_column(path, "v", "double")
    lib = snap_read(spark, path)
    spark.dataSource.register(SnapshotTableStreamSource)
    got = (
        spark.read.format("snapshot_table")
        .option("path", path)
        .option("fsImpl", snapshot_fs.spec)
        .load()
    )
    # (name, type) equality — nullability legitimately differs: the
    # DataSource reports the manifest's declared nullability while a
    # parquet scan is all-nullable
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in lib.schema.fields
    ]
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, lib.collect())
    )
    sink = str(tmp_path / "sink")
    snap_init(spark, lib.limit(0), sink, stats_cols=["k"])
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", path)
        .option("fsImpl", snapshot_fs.spec)
        .load()
        .writeStream.format("snapshot_table")
        .option("path", sink)
        .option("fsImpl", snapshot_fs.spec)
        .option("txnAppId", "widen-e2e")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    streamed = snap_read(spark, sink)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, lib.collect())
    )


def test_change_feed_and_restore_across_widening(spark, tmp_path):
    """Compositions: a change feed spanning a widening commit surfaces
    rows at the WIDE head schema; RESTORE to a pre-widening version
    reverts the declared types (the schema rides the manifest)."""
    from mapreduce_grpc_spark.sources.snapshots import (
        current_version,
        snap_restore,
        table_changes,
    )

    path = str(tmp_path / "t")
    snap_init(spark, _narrow_df(spark, 0), path, stats_cols=["k"])
    v1 = current_version(path)
    snap_widen_column(path, "k", "bigint")
    snap_widen_column(path, "v", "double")
    snap_append(
        spark, path,
        spark.range(100, 105).selectExpr(
            "id AS k", "CAST(id / 4 AS DOUBLE) AS v",
            "CAST(id % 100 AS DECIMAL(5, 2)) AS d",
        ),
    )
    ch = table_changes(spark, path, keys=["k"], from_version=v1)
    rows = ch.collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert sorted(r["k"] for r in rows) == list(range(100, 105))
    types = {f.name: f.dataType for f in ch.schema.fields}
    assert types["k"] == LongType() and types["v"] == DoubleType()
    snap_restore(path, v1)
    old = snap_read(spark, path)
    old_types = {f.name: f.dataType for f in old.schema.fields}
    assert old_types["k"] == IntegerType()
    assert old_types["v"] == FloatType()
    assert old.count() == 10
