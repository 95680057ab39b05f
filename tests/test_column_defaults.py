"""Column DEFAULT values (the Delta default-values shape):
``snap_add_column(..., default=...)`` records a default in the
manifest; subsequent ``snap_append`` batches may omit the column and
have it filled at WRITE time.  Existing rows still read NULL (defaults
never backfill history — exactly Delta), and keyed mutators keep
requiring explicit columns (an implicit fill inside a keyed rewrite
could silently corrupt it).  Renames carry the default; drops remove
it.  Runs over both FS backends."""

from __future__ import annotations

import pytest

from mapreduce_grpc_spark.sources.snapshots import (
    merge_upsert_cow,
    read_manifest,
    snap_add_column,
    snap_append,
    snap_drop_column,
    snap_init,
    snap_read,
    snap_rename_column,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _mk(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    snap_init(spark, df, path, stats_cols=["k"])
    return path


def test_append_fills_default_and_history_reads_null(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap_add_column(path, "quality", "string", default="unreviewed")
    assert read_manifest(path)["defaults"] == {"quality": "unreviewed"}
    # batch WITHOUT the column: filled at write
    snap_append(
        spark, path,
        spark.range(100, 103).selectExpr("id AS k", "CAST(1 AS DOUBLE) AS v"),
    )
    # batch WITH the column: explicit value wins
    snap_append(
        spark, path,
        spark.range(200, 202).selectExpr(
            "id AS k", "CAST(2 AS DOUBLE) AS v", "'gold' AS quality"
        ),
    )
    rows = {r.k: r.quality for r in snap_read(spark, path).collect()}
    assert all(rows[k] is None for k in range(5)), (
        "defaults must never backfill pre-evolution rows"
    )
    assert all(rows[k] == "unreviewed" for k in (100, 101, 102))
    assert all(rows[k] == "gold" for k in (200, 201))


def test_default_cast_to_column_type(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap_add_column(path, "score", "decimal(6,2)", default=5)
    snap_append(
        spark, path,
        spark.range(10, 12).selectExpr("id AS k", "CAST(0 AS DOUBLE) AS v"),
    )
    got = {
        r.k: r.score
        for r in snap_read(spark, path).collect()
        if r.k in (10, 11)
    }
    assert {float(v) for v in got.values()} == {5.0}


def test_keyed_mutators_still_require_explicit_columns(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap_add_column(path, "quality", "string", default="unreviewed")
    bad = spark.range(2, 4).selectExpr("id AS k", "CAST(9 AS DOUBLE) AS v")
    with pytest.raises(ValueError, match="missing"):
        merge_upsert_cow(spark, path, bad, keys=["k"])


def test_rename_carries_and_drop_removes_default(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap_add_column(path, "quality", "string", default="unreviewed")
    snap_rename_column(path, "quality", "grade")
    assert read_manifest(path)["defaults"] == {"grade": "unreviewed"}
    snap_append(
        spark, path,
        spark.range(50, 52).selectExpr("id AS k", "CAST(3 AS DOUBLE) AS v"),
    )
    rows = {r.k: r.grade for r in snap_read(spark, path).collect()}
    assert rows[50] == "unreviewed"
    snap_drop_column(path, "grade")
    assert "defaults" not in read_manifest(path)
    # a re-add without a default reverts to strict missing-column checks
    snap_add_column(path, "grade", "string")
    with pytest.raises(ValueError, match="missing"):
        snap_append(
            spark, path,
            spark.range(60, 61).selectExpr(
                "id AS k", "CAST(4 AS DOUBLE) AS v"
            ),
        )


def test_non_scalar_default_rejected(spark, tmp_path):
    path = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="JSON scalar"):
        snap_add_column(path, "tags", "string", default=["a", "b"])


def test_type_incompatible_default_rejected_at_ddl(spark, tmp_path):
    """default='oops' on an int column must fail at DECLARATION, not
    at the first omitting append (where it would be a runtime cast
    error under ANSI, or a silent NULL fill — divergent from the
    declared default — with ANSI off)."""
    path = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not a valid bigint"):
        snap_add_column(path, "n", "bigint", default="oops")
    with pytest.raises(ValueError, match="not a valid boolean"):
        snap_add_column(path, "flag", "boolean", default="yes")
    with pytest.raises(ValueError, match="not a valid date"):
        snap_add_column(path, "d", "date", default="not-a-date")
    with pytest.raises(ValueError, match="not a valid decimal"):
        snap_add_column(
            path, "amt", "decimal(10,2)", default=True,
        )
    with pytest.raises(ValueError, match="scalar column types"):
        snap_add_column(
            path, "tags", "array<string>", default="a",
        )
    # a failed declaration must not commit anything
    assert "defaults" not in read_manifest(path)

    # the compatible shapes all still declare fine
    snap_add_column(path, "n", "bigint", default=7)
    snap_add_column(path, "amt", "decimal(10,2)", default="19.99")
    snap_add_column(path, "d", "date", default="2026-01-01")
    snap_add_column(path, "flag", "boolean", default=False)
    snap_append(
        spark, path,
        spark.range(300, 301).selectExpr(
            "id AS k", "CAST(3 AS DOUBLE) AS v"
        ),
    )
    row = [r for r in snap_read(spark, path).collect() if r.k == 300][0]
    assert (row.n, str(row.amt), str(row.d), row.flag) == (
        7, "19.99", "2026-01-01", False,
    )


def test_defaults_flag_writer_feature(spark, tmp_path):
    """A declared default must flag ``column_defaults`` in
    writer_features: a build whose carry loop predates the "defaults"
    manifest key would otherwise silently strip the declaration on its
    next commit (the partition_spec hazard, same fix).  Dropping the
    defaulted column clears the flag."""
    from mapreduce_grpc_spark.sources.snapshots import table_features

    path = _mk(spark, tmp_path)
    assert table_features(path)["writer"] == []
    snap_add_column(path, "quality", "string", default="unreviewed")
    assert table_features(path)["writer"] == ["column_defaults"]
    # the flag survives unrelated commits (carry loop keeps it)
    snap_append(
        spark, path,
        spark.range(50, 52).selectExpr(
            "id AS k", "CAST(9 AS DOUBLE) AS v"
        ),
    )
    assert table_features(path)["writer"] == ["column_defaults"]
    # exact (not sticky): dropping the only defaulted column clears it
    snap_drop_column(path, "quality")
    assert table_features(path)["writer"] == []
    # history keeps its own flags
    assert table_features(path, version=2)["writer"] == [
        "column_defaults"
    ]
