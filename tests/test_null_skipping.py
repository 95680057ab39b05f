"""Null-count data skipping: stats columns record per-file null
counts from the parquet footer (``_file_stats``), and ``isnull`` /
``notnull`` predicates prune files the counts PROVE empty — the
Delta ``numRecords``/``nullCount`` skipping shape.  ``IS NOT NULL`` is
pushed by Spark with almost every filter, so on a stats column an
all-null file (a common shape after schema evolution backfill) is
skipped for free.

Pinned here:
- ``_entry_may_match`` decisions on crafted entries, including the
  conservative keep when counts are unknown (legacy manifests);
- an all-null file prunes from ``notnull`` scans and a fully-populated
  file prunes from ``isnull`` scans, with exact answers either way;
- the batch DataSource pushes IsNull/IsNotNull down.

Runs over both FS backends (``snapshot_fs``).
"""

from __future__ import annotations

import os

import pytest

from mapreduce_grpc_spark.sources.batch_source import translate_filters
from mapreduce_grpc_spark.sources.snapshots import (
    _entry_may_match,
    prune_manifest,
    read_manifest,
    snap_append,
    snap_init,
    snap_scan,
)
from mapreduce_grpc_spark.sources.stream_source import (
    SnapshotTableStreamSource,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def test_entry_null_decisions():
    allnull = {"rows": 10, "nulls": {"v": 10}, "stats": {}}
    nonull = {"rows": 10, "nulls": {"v": 0}, "stats": {}}
    mixed = {"rows": 10, "nulls": {"v": 3}, "stats": {}}
    legacy = {"rows": 10, "stats": {}}  # pre-nulls manifest entry
    assert not _entry_may_match(allnull, ("v", "notnull"))
    assert _entry_may_match(allnull, ("v", "isnull"))
    assert _entry_may_match(nonull, ("v", "notnull"))
    assert not _entry_may_match(nonull, ("v", "isnull"))
    assert _entry_may_match(mixed, ("v", "notnull"))
    assert _entry_may_match(mixed, ("v", "isnull"))
    # unknown counts: conservative keep, both ways
    assert _entry_may_match(legacy, ("v", "notnull"))
    assert _entry_may_match(legacy, ("v", "isnull"))
    # zero-row file never matches
    assert not _entry_may_match(
        {"rows": 0, "nulls": {"v": 0}}, ("v", "isnull")
    )


def _null_table(spark, tmp_path):
    """Three files: all-null v / no-null v / mixed v."""
    path = os.path.join(str(tmp_path), "t")
    base = spark.range(10).selectExpr(
        "id AS k", "CAST(NULL AS DOUBLE) AS v"
    ).coalesce(1)
    snap_init(spark, base, path, stats_cols=["k", "v"])
    snap_append(
        spark, path,
        spark.range(100, 110).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1),
    )
    snap_append(
        spark, path,
        spark.range(200, 210).selectExpr(
            "id AS k",
            "CASE WHEN id % 2 = 0 THEN CAST(id AS DOUBLE) END AS v",
        ).coalesce(1),
    )
    return path


def test_null_scan_prunes_and_answers_exactly(spark, tmp_path):
    path = _null_table(spark, tmp_path)
    m = read_manifest(path)
    assert len(m["files"]) == 3
    for e in m["files"]:
        assert "v" in e.get("nulls", {}), "null counts must be recorded"
    kept, skipped = prune_manifest(m, [("v", "notnull")])
    assert len(kept) == 2 and len(skipped) == 1
    kept, skipped = prune_manifest(m, [("v", "isnull")])
    assert len(kept) == 2 and len(skipped) == 1
    got = sorted(
        r.k for r in snap_scan(spark, path, [("v", "notnull")]).collect()
    )
    assert got == list(range(100, 110)) + list(range(200, 210, 2))
    got = sorted(
        r.k for r in snap_scan(spark, path, [("v", "isnull")]).collect()
    )
    assert got == list(range(10)) + list(range(201, 210, 2))


def test_batch_source_null_pushdown(spark, tmp_path, snapshot_fs):
    from pyspark.sql.datasource import IsNotNull, IsNull

    assert translate_filters([IsNull(("v",))]) == [("v", "isnull")]
    assert translate_filters([IsNotNull(("v",))]) == [("v", "notnull")]
    path = _null_table(spark, tmp_path)
    spark.dataSource.register(SnapshotTableStreamSource)
    got = (
        spark.read.format("snapshot_table")
        .option("path", path)
        .option("fsImpl", snapshot_fs.spec)
        .load()
        .filter("v IS NOT NULL")
        .collect()
    )
    assert sorted(r.k for r in got) == list(range(100, 110)) + list(
        range(200, 210, 2)
    )
