"""Generated columns (``GENERATED ALWAYS AS expr``).

`snap_add_column(generated_as=...)` stores the expression in the
manifest (carried by every commit; writer-feature-gated as
``generated_columns``); appends that omit the column compute it at
write time, every write path that carries it validates supplied values
null-safely equal the expression (the synthetic IS-NOT-DISTINCT-FROM
checks ride the CHECK machinery, so the session-free sink/batch-writer
validators enforce it too), `update_where` recomputes it for changed
rows, and history keeps its legal NULLs.  Runs under BOTH
commit-protocol FS backends.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources import snapshots as S
from mapreduce_grpc_spark.sources.snapshots import (
    ConstraintViolation,
    UnsupportedTableFeature,
    merge_upsert_cow,
    read_manifest,
    snap_add_column,
    snap_append,
    snap_drop_column,
    snap_init,
    snap_read,
    snap_rename_column,
    snap_restore,
    update_where,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")

GEN = "CASE WHEN amount >= 100 THEN 'HIGH' ELSE 'LOW' END"


def _mk(spark, path, n=40):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).cast("double").alias("amount"),
    ).repartitionByRange(2, "k")
    snap_init(spark, df, path, stats_cols=["k"])


def _rows(spark, path):
    return {
        r.k: (r.amount, r.band)
        for r in snap_read(spark, path).collect()
    }


def test_declare_fill_validate_and_history_nulls(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    snap_add_column(path, "band", "string", generated_as=GEN, spark=spark)
    m = read_manifest(path)
    assert m["generated"] == {"band": GEN}
    assert "generated_columns" in (m.get("writer_features") or [])
    # history is never backfilled
    assert all(v[1] is None for v in _rows(spark, path).values())

    # append OMITTING the column: computed at write time
    snap_append(
        spark, path,
        spark.range(100, 104).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).cast("double").alias("amount"),
        ),
    )
    got = _rows(spark, path)
    assert got[100] == (1000.0, "HIGH") and got[103] == (1030.0, "HIGH")

    # append SUPPLYING correct values: accepted
    snap_append(
        spark, path,
        spark.createDataFrame(
            [(200, 5.0, "LOW")], "k bigint, amount double, band string"
        ),
    )
    assert _rows(spark, path)[200] == (5.0, "LOW")

    # append SUPPLYING divergent values: rejected before commit
    with pytest.raises(ConstraintViolation, match="__generated_band"):
        snap_append(
            spark, path,
            spark.createDataFrame(
                [(201, 5.0, "HIGH")],
                "k bigint, amount double, band string",
            ),
        )
    assert 201 not in _rows(spark, path)

    # the declaration survives unrelated commits (carry contract)
    assert read_manifest(path)["generated"] == {"band": GEN}


def test_declaration_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    with pytest.raises(ValueError, match="mutually exclusive"):
        snap_add_column(
            path, "b", "string", default="x", generated_as=GEN,
            spark=spark,
        )
    with pytest.raises(ValueError, match="needs spark"):
        snap_add_column(path, "b", "string", generated_as=GEN)
    with pytest.raises(ValueError, match="does not resolve"):
        snap_add_column(
            path, "b", "string", generated_as="no_such_col * 2",
            spark=spark,
        )


def test_merge_validates_supplied_values(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    snap_add_column(path, "band", "string", generated_as=GEN, spark=spark)
    ok = spark.createDataFrame(
        [(1, 500.0, "HIGH")], "k bigint, amount double, band string"
    )
    merge_upsert_cow(spark, path, ok, keys=["k"])
    assert _rows(spark, path)[1] == (500.0, "HIGH")
    bad = spark.createDataFrame(
        [(2, 500.0, "LOW")], "k bigint, amount double, band string"
    )
    with pytest.raises(ConstraintViolation, match="__generated_band"):
        merge_upsert_cow(spark, path, bad, keys=["k"])


def test_update_where_recomputes_generated(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    snap_add_column(path, "band", "string", generated_as=GEN, spark=spark)
    # fill via a keyed rewrite of half the table so some rows carry
    # real values and the rest stay historical NULL
    seed = spark.range(20).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).cast("double").alias("amount"),
        F.when(F.col("id") * 10 >= 100, "HIGH").otherwise("LOW")
        .alias("band"),
    )
    merge_upsert_cow(spark, path, seed, keys=["k"])

    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        update_where(spark, path, [("k", "<", 5)], {"band": "'HIGH'"})

    # bumping amount across the HIGH threshold recomputes band on the
    # changed rows only
    update_where(
        spark, path, [("k", "between", 3, 6)],
        {"amount": "cast(amount + 1000.0 as double)"},
    )
    got = _rows(spark, path)
    assert got[3] == (1030.0, "HIGH") and got[6] == (1060.0, "HIGH")
    # untouched filled row keeps its value; untouched HISTORY rows
    # (k >= 20, never rewritten) keep their legal NULL
    assert got[2] == (20.0, "LOW")
    assert got[25][1] is None


def test_rename_drop_interplay(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    snap_add_column(path, "band", "string", generated_as=GEN, spark=spark)
    # renaming the generated column itself: declaration follows
    snap_rename_column(path, "band", "tier")
    assert read_manifest(path)["generated"] == {"tier": GEN}
    snap_append(
        spark, path,
        spark.range(100, 102).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).cast("double").alias("amount"),
        ),
    )
    tiers = {
        r.k: r.tier for r in snap_read(spark, path).collect()
    }
    assert tiers[100] == "HIGH"
    # renaming/dropping a REFERENCED column is rejected
    with pytest.raises(ValueError, match="GENERATED column"):
        snap_rename_column(path, "amount", "amt")
    with pytest.raises(ValueError, match="GENERATED column"):
        snap_drop_column(path, "amount")
    # dropping the generated column kills the declaration + the gate
    snap_drop_column(path, "tier")
    m = read_manifest(path)
    assert not m.get("generated")
    assert "generated_columns" not in (m.get("writer_features") or [])


def test_restore_across_declaration(spark, tmp_path):
    """Rollback to a pre-declaration version must not trip the
    generated checks (that version has no such column at all)."""
    path = str(tmp_path / "t")
    _mk(spark, path)  # v1
    snap_add_column(path, "band", "string", generated_as=GEN, spark=spark)
    snap_append(
        spark, path,
        spark.range(100, 102).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).cast("double").alias("amount"),
        ),
    )  # v3, filled
    snap_restore(path, 1, spark=spark)
    assert snap_read(spark, path).count() == 40


def test_composes_with_hidden_partitioning(spark, tmp_path):
    """A generated column derived from the same source column that
    drives a partition transform: the append fills the generated value
    BEFORE the partition derivation/clustering, and pruning still
    works."""
    import datetime as _dt

    from mapreduce_grpc_spark.sources.snapshots import snap_scan

    path = str(tmp_path / "t")
    ev = spark.range(200).select(
        F.col("id").alias("event_id"),
        (
            F.lit(_dt.datetime(2024, 1, 1))
            + F.make_interval(hours=F.col("id").cast("int"))
        ).alias("ts"),
        (F.col("id") % 10).alias("user_id"),
    )
    snap_init(
        spark, ev.filter(F.col("event_id") < 100), path,
        stats_cols=["event_id"], partition_by=["days(ts)"],
    )
    snap_add_column(
        path, "ts_hour", "int", generated_as="hour(ts)", spark=spark
    )
    snap_append(spark, path, ev.filter(F.col("event_id") >= 100))
    out = snap_scan(
        spark, path,
        [
            (
                "ts", "between",
                _dt.datetime(2024, 1, 5), _dt.datetime(2024, 1, 6),
            )
        ],
    )
    rows = out.collect()
    assert rows and all(
        r.ts_hour == (r.ts.hour if r.ts_hour is not None else None)
        for r in rows
    )
    # appended (post-declaration) rows in the slice are filled
    assert any(
        r.ts_hour is not None for r in rows if r.event_id >= 100
    )


def test_batch_writer_validates_generated(spark, tmp_path, snapshot_fs):
    """The DataSource batch writer's session-free DuckDB validator
    enforces the synthetic generated checks too."""
    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    path = str(tmp_path / "t")
    _mk(spark, path)
    snap_add_column(path, "band", "string", generated_as=GEN, spark=spark)

    def write(df):
        w = (
            df.write.format("snapshot_table")
            .option("path", path).mode("append")
        )
        if snapshot_fs.spec:
            w = w.option("fsImpl", snapshot_fs.spec)
        w.save()

    ok = spark.createDataFrame(
        [(300, 40.0, "LOW")], "k bigint, amount double, band string"
    )
    write(ok)
    assert _rows(spark, path)[300] == (40.0, "LOW")
    bad = spark.createDataFrame(
        [(301, 40.0, "HIGH")], "k bigint, amount double, band string"
    )
    with pytest.raises(Exception, match="__generated_band"):
        write(bad)
    assert 301 not in _rows(spark, path)


def test_snapshot_generated_cols_oracle_parity(spark, sf_dir):
    """The AUX query's DuckDB hash: declaration -> fill-at-append ->
    no-backfill split, value-exact against the plain CASE oracle."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["snapshot_generated_cols"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["snapshot_generated_cols"],
        sf_dir,
        "snapshot_generated_cols",
    )


def test_clone_carries_generated_declaration(spark, tmp_path):
    """A shallow clone keeps GENERATED enforcement: writes to the
    clone fill omitted columns and reject divergent values — a clone
    silently dropping the declaration would be the carry-strip hazard
    with data corruption on top."""
    from mapreduce_grpc_spark.sources.snapshots import snap_clone

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk(spark, src)
    snap_add_column(src, "band", "string", generated_as=GEN, spark=spark)
    snap_clone(src, dst)
    m = read_manifest(dst)
    assert m["generated"] == {"band": GEN}
    assert "generated_columns" in (m.get("writer_features") or [])
    snap_append(
        spark, dst,
        spark.range(100, 102).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).cast("double").alias("amount"),
        ),
    )
    assert _rows(spark, dst)[100] == (1000.0, "HIGH")
    with pytest.raises(ConstraintViolation, match="__generated_band"):
        snap_append(
            spark, dst,
            spark.createDataFrame(
                [(200, 5.0, "HIGH")],
                "k bigint, amount double, band string",
            ),
        )
    # the source is untouched by the clone's writes
    assert snap_read(spark, src).count() == 40


def test_legacy_writer_refuses_generated_table(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    _mk(spark, path)
    snap_add_column(path, "band", "string", generated_as=GEN, spark=spark)
    legacy = S.SUPPORTED_WRITER_FEATURES - {"generated_columns"}
    monkeypatch.setattr(S, "SUPPORTED_WRITER_FEATURES", legacy)
    with pytest.raises(UnsupportedTableFeature, match="generated_columns"):
        snap_append(
            spark, path,
            spark.range(500, 501).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).cast("double").alias("amount"),
            ),
        )
    assert snap_read(spark, path).count() == 40
