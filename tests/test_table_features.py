"""Protocol feature flags (the Delta table-features model): a manifest
names the capabilities a client MUST implement to read
(``features``) or mutate (``writer_features``) the table correctly,
and a build that lacks one refuses LOUDLY instead of silently
returning wrong rows (ignored column mapping -> all-NULL renamed
columns; ignored deletion vectors -> resurrected rows; ignored
constraints -> violating commits)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources import snapshots as S
from mapreduce_grpc_spark.sources.snapshots import (
    UnsupportedTableFeature,
    current_version,
    delete_where_mor,
    read_manifest,
    snap_append,
    snap_init,
    snap_read,
    table_features,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _mk(spark, path, n=50):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    snap_init(spark, df, path, stats_cols=["k"])


def _inject_version(path, mutate):
    """Hand-commit a new version whose record is the current record
    with ``mutate(record)`` applied — simulating a FUTURE build's
    commit on this table."""
    f = S._fs(None)
    v = current_version(path)
    raw = json.loads(f.read_text(S._manifest_path(path, v)))
    raw["version"] = v + 1
    raw.setdefault("adds", [])
    raw.setdefault("removes", [])
    raw.pop("files", None)
    mutate(raw)
    f.create_exclusive(S._manifest_path(path, v + 1), json.dumps(raw))
    f.replace_atomic(S._current_path(path), str(v + 1))
    return v + 1


def test_flags_track_capabilities(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    assert table_features(path) == {"reader": [], "writer": []}

    S.snap_rename_column(path, "v", "val")
    assert table_features(path)["reader"] == ["column_mapping"]

    delete_where_mor(spark, path, [("k", "=", 3)])
    assert table_features(path)["reader"] == [
        "column_mapping", "deletion_vectors",
    ]

    S.snap_add_constraint(spark, path, "k_pos", "k >= 0")
    assert table_features(path)["writer"] == ["check_constraints"]

    # deletion_vectors is sticky; check_constraints is exact
    S.snap_drop_constraint(path, "k_pos")
    ft = table_features(path)
    assert ft["writer"] == []
    assert "deletion_vectors" in ft["reader"]

    # each version carries its own flags (time travel stays honest)
    assert table_features(path, version=1) == {"reader": [], "writer": []}


def test_unknown_reader_feature_blocks_reads_and_writes(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    _inject_version(
        path, lambda r: r.update(features=["vortex_encoding_v3"])
    )
    with pytest.raises(UnsupportedTableFeature, match="vortex_encoding_v3"):
        snap_read(spark, path).collect()
    with pytest.raises(UnsupportedTableFeature):
        snap_append(
            spark, path,
            spark.range(1).select(
                F.col("id").alias("k"), F.lit("x").alias("v")
            ),
        )
    # the inspection path never requires support: it names the gap
    assert table_features(path)["reader"] == ["vortex_encoding_v3"]
    # and the PRE-feature version still reads fine
    assert snap_read(spark, path, version=1).count() == 50


def test_unknown_writer_feature_keeps_table_readable(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    before = snap_read(spark, path).count()
    _inject_version(
        path, lambda r: r.update(writer_features=["row_tracking_v9"])
    )
    assert snap_read(spark, path).count() == before  # reads unaffected
    with pytest.raises(UnsupportedTableFeature, match="row_tracking_v9"):
        snap_append(
            spark, path,
            spark.range(1).select(
                F.col("id").alias("k"), F.lit("x").alias("v")
            ),
        )
    with pytest.raises(UnsupportedTableFeature):
        delete_where_mor(spark, path, [("k", "=", 1)])


def test_flags_survive_unrelated_commits(spark, tmp_path):
    """A plain append on a mapped+DV table must carry both flags
    forward (every commit records the protocol its version needs)."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    S.snap_rename_column(path, "v", "val")
    delete_where_mor(spark, path, [("k", "=", 3)])
    snap_append(
        spark, path,
        spark.range(100, 103).select(
            F.col("id").alias("k"),
            F.lit("a").alias("val"),
        ),
    )
    m = read_manifest(path)
    assert sorted(m["features"]) == ["column_mapping", "deletion_vectors"]
    assert snap_read(spark, path).count() == 52


def test_partition_spec_raises_writer_flag(spark, tmp_path):
    """A committed partition spec flags WRITERS: a pre-partitioning
    build's carry loop (constraints/column_mapping only) would
    silently strip the spec from the manifest, permanently
    unpartitioning the table — the flag makes it refuse loudly.
    Readers stay unflagged: unpruned scans are slower, never wrong."""
    from mapreduce_grpc_spark.sources.snapshots import (
        snap_set_partition_spec,
    )

    path = str(tmp_path / "t")
    df = spark.range(50).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    snap_init(
        spark, df, path, stats_cols=["k"], partition_by=["bucket(4, k)"]
    )
    ft = table_features(path)
    assert ft["writer"] == ["partition_spec"]
    assert ft["reader"] == []
    # carried forward by unrelated commits (exact, like constraints)
    snap_append(
        spark, path,
        spark.range(100, 103).select(
            F.col("id").alias("k"), F.lit("a").alias("v")
        ),
    )
    assert table_features(path)["writer"] == ["partition_spec"]
    # dropping the spec clears the flag: legacy writers are safe again
    snap_set_partition_spec(path, None)
    assert table_features(path)["writer"] == []
