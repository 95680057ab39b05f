"""Partition-overwrite mutations: MERGE upsert and incremental rollup
refresh.  The correctness bar is equivalence with the full recompute,
plus proof that untouched partitions are genuinely not rewritten."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import table
import pytest

from mapreduce_grpc_spark.sources.maintenance import (
    merge_upsert,
    rollup_build,
    rollup_init,
    rollup_read,
    rollup_refresh,
)


# every test in this module runs under BOTH commit-protocol FS
# backends (POSIX + object-store semantics) — see conftest.snapshot_fs
pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _partition_mtimes(path: str) -> dict[str, float]:
    out = {}
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if os.path.isdir(full) and "=" in entry:
            out[entry] = max(
                os.path.getmtime(os.path.join(full, f))
                for f in os.listdir(full)
            )
    return out


def test_merge_upsert_semantics_and_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [
            (1, "a", "2024-01-01"),
            (2, "b", "2024-01-01"),
            (3, "c", "2024-01-02"),
            (4, "d", "2024-01-03"),
        ],
        "k bigint, v string, d string",
    )
    base.write.partitionBy("d").parquet(path)
    before = _partition_mtimes(path)

    updates = spark.createDataFrame(
        [(2, "B", "2024-01-01"), (5, "e", "2024-01-02")],
        "k bigint, v string, d string",
    )
    n_parts = merge_upsert(spark, path, updates, keys=["k"], partition_col="d")
    assert n_parts == 2

    # partition values come back type-inferred (DateType) — compare as str
    got = {
        (r.k, r.v, str(r.d)) for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "a", "2024-01-01"),
        (2, "B", "2024-01-01"),  # updated in place
        (3, "c", "2024-01-02"),
        (5, "e", "2024-01-02"),  # inserted
        (4, "d", "2024-01-03"),  # untouched partition
    }
    after = _partition_mtimes(path)
    assert after["d=2024-01-03"] == before["d=2024-01-03"], (
        "untouched partition was rewritten"
    )
    assert after["d=2024-01-01"] > before["d=2024-01-01"]


def test_merge_upsert_is_idempotent(spark, tmp_path):
    """Re-applying the same batch (at-least-once delivery) is a no-op."""
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1")], "k bigint, v string, d string"
    ).write.partitionBy("d").parquet(path)
    updates = spark.createDataFrame(
        [(2, "B", "p1"), (3, "c", "p1")], "k bigint, v string, d string"
    )
    merge_upsert(spark, path, updates, keys=["k"], partition_col="d")
    once = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    merge_upsert(spark, path, updates, keys=["k"], partition_col="d")
    twice = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert once == twice


def test_merge_upsert_partition_moving_update_leaves_no_duplicate(
    spark, tmp_path
):
    """A key whose partition value CHANGES in the update batch must not
    survive as a stale copy in its old partition (the r4 key-migration
    staleness edge, closed by the key-locating semi-join scan)."""
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2"), (3, "c", "p3")],
        "k bigint, v string, d string",
    ).write.partitionBy("d").parquet(path)

    # key 1 migrates p1 -> p2; p1 is otherwise untouched by the batch
    updates = spark.createDataFrame(
        [(1, "A", "p2")], "k bigint, v string, d string"
    )
    merge_upsert(spark, path, updates, keys=["k"], partition_col="d")
    got = {(r.k, r.v, str(r.d)) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "A", "p2"), (2, "b", "p2"), (3, "c", "p3")}
    # exactly one row per key — the old p1 copy is gone
    ks = sorted(r.k for r in spark.read.parquet(path).collect())
    assert ks == sorted(set(ks))


def test_merge_upsert_rejects_duplicate_key_batches(spark, tmp_path):
    """MERGE's multiple-source-matches error: two update rows for one key
    must raise, not silently insert both."""
    import pytest

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a", "p1")], "k bigint, v string, d string"
    ).write.partitionBy("d").parquet(path)
    dup_updates = spark.createDataFrame(
        [(1, "x", "p1"), (1, "y", "p1")], "k bigint, v string, d string"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_upsert(spark, path, dup_updates, keys=["k"], partition_col="d")
    # target unchanged
    assert [(r.k, r.v) for r in spark.read.parquet(path).collect()] == [
        (1, "a")
    ]


def _rollup_canon(df):
    return sorted(
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in df.collect()
    )


def test_rollup_incremental_equals_full_recompute(spark, sf_dir, tmp_path):
    """init(first half) + refresh(second half) == rollup(all events),
    exactly — counts and DECIMAL sums, no float drift."""
    path = str(tmp_path / "rollup")
    ev = table(spark, sf_dir, "events")
    split = ev.agg(F.expr("percentile(cast(ts as double), 0.5)")).collect()[0][0]
    first = ev.filter(F.col("ts").cast("double") <= split)
    second = ev.filter(F.col("ts").cast("double") > split)
    assert first.count() > 0 and second.count() > 0

    rollup_init(spark, first, path)
    n_days = rollup_refresh(spark, path, second)
    assert n_days >= 1

    full = rollup_build(ev).select(
        "window_start",
        "event_type",
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    )
    assert _rollup_canon(rollup_read(spark, path)) == _rollup_canon(full)


def test_rollup_refresh_rewrites_only_touched_days(spark, tmp_path):
    path = str(tmp_path / "rollup")
    events = spark.createDataFrame(
        [
            ("2024-01-01 10:05:00", "view", 1.5),
            ("2024-01-01 10:20:00", "view", 2.5),
            ("2024-01-02 09:00:00", "click", 1.0),
        ],
        "ts_s string, event_type string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    rollup_init(spark, events, path)
    before = _partition_mtimes(path)

    batch = spark.createDataFrame(
        [("2024-01-02 11:00:00", "view", 4.0)],
        "ts_s string, event_type string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    assert rollup_refresh(spark, path, batch) == 1

    after = _partition_mtimes(path)
    assert after["d=2024-01-01"] == before["d=2024-01-01"]
    assert after["d=2024-01-02"] > before["d=2024-01-02"]
    # merged day has both the old click hour and the new view hour
    rows = {
        (r.window_start.isoformat(), r.event_type): (r.n_events, r.sum_value)
        for r in rollup_read(spark, path).collect()
    }
    assert rows[("2024-01-02T09:00:00", "click")] == (1, 1.0)
    assert rows[("2024-01-02T11:00:00", "view")] == (1, 4.0)
    assert rows[("2024-01-01T10:00:00", "view")] == (2, 4.0)


def test_rollup_snap_incremental_equals_full_recompute(
    spark, sf_dir, tmp_path
):
    """Snapshot-committed rollup: init(first half) + refresh(second half)
    == full recompute, with version isolation on top."""
    from mapreduce_grpc_spark.sources.maintenance import (
        rollup_init_snap,
        rollup_read_snap,
        rollup_refresh_snap,
    )
    from mapreduce_grpc_spark.sources.snapshots import current_version

    path = str(tmp_path / "rollup_snap")
    ev = table(spark, sf_dir, "events")
    split = ev.agg(
        F.expr("percentile(cast(ts as double), 0.5)")
    ).collect()[0][0]
    first = ev.filter(F.col("ts").cast("double") <= split)
    second = ev.filter(F.col("ts").cast("double") > split)

    rollup_init_snap(spark, first, path)
    v1 = rollup_read_snap(spark, path)  # resolved BEFORE the refresh
    v1_rows = _rollup_canon(v1)
    assert rollup_refresh_snap(spark, path, second) >= 1
    assert current_version(path) == 2

    full = rollup_build(ev).select(
        "window_start",
        "event_type",
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    )
    assert _rollup_canon(rollup_read_snap(spark, path)) == _rollup_canon(full)
    # the racing reader and explicit time travel both see v1 intact
    assert _rollup_canon(v1) == v1_rows
    assert _rollup_canon(rollup_read_snap(spark, path, version=1)) == v1_rows


def test_rollup_snap_refresh_carries_untouched_files(spark, tmp_path):
    """A refresh touching one day must carry files of other days BY
    REFERENCE — byte-identical, never read or rewritten."""
    from mapreduce_grpc_spark.sources.maintenance import (
        rollup_init_snap,
        rollup_read_snap,
        rollup_refresh_snap,
    )
    from mapreduce_grpc_spark.sources.snapshots import read_manifest

    path = str(tmp_path / "rollup_snap")
    events = spark.createDataFrame(
        [
            ("2024-01-01 10:05:00", "view", 1.5),
            ("2024-02-01 10:20:00", "view", 2.5),
            ("2024-03-01 09:00:00", "click", 1.0),
        ],
        "ts_s string, event_type string, value double",
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
    )
    rollup_init_snap(spark, events, path)
    m1 = read_manifest(path)
    mtimes = {
        f["name"]: os.path.getmtime(os.path.join(path, f["name"]))
        for f in m1["files"]
    }

    batch = spark.createDataFrame(
        [("2024-03-01 11:00:00", "view", 4.0)],
        "ts_s string, event_type string, value double",
    ).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
    )
    assert rollup_refresh_snap(spark, path, batch) == 1

    m2 = read_manifest(path)
    carried = set(f["name"] for f in m2["files"]) & set(mtimes)
    assert carried, "refresh must carry at least one untouched-day file"
    for name in carried:
        assert os.path.getmtime(os.path.join(path, name)) == mtimes[name]
    rows = {
        (r.window_start.isoformat(), r.event_type): (r.n_events, r.sum_value)
        for r in rollup_read_snap(spark, path).collect()
    }
    assert rows[("2024-03-01T09:00:00", "click")] == (1, 1.0)
    assert rows[("2024-03-01T11:00:00", "view")] == (1, 4.0)
    assert rows[("2024-01-01T10:00:00", "view")] == (1, 1.5)


def test_streaming_rollup_equals_batch_rollup(spark, sf_dir, tmp_path):
    """The continuous-aggregate loop end-to-end: a MULTI-micro-batch
    streamed run over a many-file events table folds into exactly the
    table the one-shot batch rollup builds — counts and DECIMAL sums
    bit-equal, because the mergeable state is associative.  Per-batch
    touched-day counts stay bounded by that batch's days (the refresh
    never rescans history)."""
    from mapreduce_grpc_spark.streaming.rollup import run_streaming_rollup

    ev = table(spark, sf_dir, "events")
    # a directory-shaped events table split into several files ->
    # maxFilesPerTrigger=1 gives one micro-batch per file
    src = tmp_path / "src"
    src.mkdir()
    ev.repartition(4).write.parquet(str(src / "events.parquet"))

    rollup_path = str(tmp_path / "rollup")
    final, touched = run_streaming_rollup(
        spark, str(src), rollup_path, str(tmp_path / "ck")
    )
    assert len(touched) >= 3, f"expected multi-batch run, got {touched}"

    src_days = ev.select(ev.ts.cast("date")).distinct().count()
    for _bid, n_days in touched:
        assert 1 <= n_days <= src_days

    full = rollup_build(ev).select(
        "window_start",
        "event_type",
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    )
    assert _rollup_canon(final) == _rollup_canon(full)


def test_scd2_history_oracle_parity(spark, sf_dir):
    from mapreduce_grpc_spark import registry
    from mapreduce_grpc_spark.operators.relational import scd2_history
    from tests.oracle import assert_oracle_match

    assert_oracle_match(
        scd2_history(spark, sf_dir),
        registry.AUX_ORACLES["scd2_history"],
        sf_dir,
        "scd2_history",
    )


def _scd2_canon(df):
    return sorted(
        (r.k, r.seg, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in df.collect()
    )


def test_scd2_apply_two_sequential_batches(spark):
    """Re-promotion closes the PROMOTED row correctly: after batch 2 the
    key carries THREE versions chained end-to-start, one current."""
    from mapreduce_grpc_spark.operators.relational import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "BUILDING", "2024-01-01", "9999-12-31", True),
            (2, "AUTO", "2024-01-01", "9999-12-31", True),
        ],
        "k bigint, seg string, valid_from string, valid_to string, "
        "is_current boolean",
    ).select(
        "k", "seg",
        F.to_date("valid_from").alias("valid_from"),
        F.to_date("valid_to").alias("valid_to"),
        "is_current",
    )
    b1 = spark.createDataFrame([(1, "PROMOTED")], "k bigint, seg string")
    v1 = scd2_apply(dim, b1, ["k"], ["seg"], "2024-06-01")
    b2 = spark.createDataFrame([(1, "VIP")], "k bigint, seg string")
    v2 = scd2_apply(v1, b2, ["k"], ["seg"], "2024-09-01")

    assert _scd2_canon(v2) == [
        (1, "BUILDING", "2024-01-01", "2024-06-01", False),
        (1, "PROMOTED", "2024-06-01", "2024-09-01", False),
        (1, "VIP", "2024-09-01", "9999-12-31", True),
        (2, "AUTO", "2024-01-01", "9999-12-31", True),
    ]


def test_scd2_apply_noop_and_insert(spark):
    """Identical attrs are a no-op (idempotent re-delivery); unseen keys
    insert a first current version."""
    from mapreduce_grpc_spark.operators.relational import scd2_apply

    dim = spark.createDataFrame(
        [(1, "AUTO", "2024-01-01", "9999-12-31", True)],
        "k bigint, seg string, valid_from string, valid_to string, "
        "is_current boolean",
    ).select(
        "k", "seg",
        F.to_date("valid_from").alias("valid_from"),
        F.to_date("valid_to").alias("valid_to"),
        "is_current",
    )
    batch = spark.createDataFrame(
        [(1, "AUTO"), (9, "NEWKEY")], "k bigint, seg string"
    )
    out = scd2_apply(dim, batch, ["k"], ["seg"], "2024-06-01")
    assert _scd2_canon(out) == [
        (1, "AUTO", "2024-01-01", "9999-12-31", True),
        (9, "NEWKEY", "2024-06-01", "9999-12-31", True),
    ]
    # re-applying the same batch changes nothing
    again = scd2_apply(out, batch, ["k"], ["seg"], "2024-07-01")
    assert _scd2_canon(again) == _scd2_canon(out)


def test_scd2_apply_broadcasts_stay_batch_bounded(spark):
    """The inserted branch must derive its broadcast from the batch-side
    join (O(|batch|)), never from dim.select(keys).distinct()
    (O(|dimension|)) — the physical plan's broadcast exchanges must all
    sit on batch-derived subtrees.  Also pins the re-activation edge the
    fix touches: a key whose only rows are historical (closed, no
    current version) re-inserts as a fresh current version instead of
    being silently dropped."""
    from mapreduce_grpc_spark.operators.relational import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "AUTO", "2024-01-01", "9999-12-31", True),
            # key 7: closed with NO current row (soft-deleted)
            (7, "GONE", "2024-01-01", "2024-03-01", False),
        ],
        "k bigint, seg string, valid_from string, valid_to string, "
        "is_current boolean",
    ).select(
        "k", "seg",
        F.to_date("valid_from").alias("valid_from"),
        F.to_date("valid_to").alias("valid_to"),
        "is_current",
    )
    batch = spark.createDataFrame([(7, "BACK")], "k bigint, seg string")
    out = scd2_apply(dim, batch, ["k"], ["seg"], "2024-06-01")
    assert _scd2_canon(out) == [
        (1, "AUTO", "2024-01-01", "9999-12-31", True),
        (7, "BACK", "2024-06-01", "9999-12-31", True),
        (7, "GONE", "2024-01-01", "2024-03-01", False),
    ]


def test_join_temporal_oracle_parity_and_coverage(spark, sf_dir):
    """AS-OF dimension lookup: DuckDB hash parity, plus the partition-of-
    time invariant — every order matches EXACTLY one dimension version
    (no drops, no fan-out)."""
    from mapreduce_grpc_spark import registry
    from mapreduce_grpc_spark.operators.relational import join_temporal
    from tests.oracle import assert_oracle_match

    df = join_temporal(spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["join_temporal"], sf_dir, "join_temporal"
    )
    n_orders = table(spark, sf_dir, "orders").count()
    rows = df.collect()
    assert len(rows) == n_orders
    assert len({r.o_orderkey for r in rows}) == n_orders
    # the promotion is visible: promoted keys' post-1998 orders say so
    assert any(r.promoted for r in rows)
    assert any(not r.promoted and r.o_custkey % 100 < 10 for r in rows), (
        "pre-promotion orders of changed keys must see the OLD segment"
    )


def test_scd2_history_invariants(spark, sf_dir):
    """Exactly one current version per key; closed versions end where
    their successor begins; unchanged keys have a single version."""
    from mapreduce_grpc_spark.operators.relational import scd2_history

    rows = scd2_history(spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    assert by_key
    saw_multi = False
    for k, versions in by_key.items():
        current = [v for v in versions if v.is_current]
        assert len(current) == 1, (k, versions)
        if len(versions) == 2:
            saw_multi = True
            closed = next(v for v in versions if not v.is_current)
            assert closed.valid_to == current[0].valid_from, (k, versions)
            assert current[0].segment == "PROMOTED"
        else:
            assert len(versions) == 1, (k, versions)
    assert saw_multi, "fixture must contain changed keys"


def test_grouping_sets_agg_oracle_parity_and_shape(spark, sf_dir):
    """Arbitrary GROUPING SETS: hash parity + the set-selection shape —
    per-priority subtotals exist (gid=2), per-status do NOT (gid=1
    absent, the ROLLUP-vs-sets difference), one grand total (gid=3)."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["grouping_sets_agg"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["grouping_sets_agg"],
        sf_dir,
        "grouping_sets_agg",
    )
    gids = [r.gid for r in df.collect()]
    assert 0 in gids and 2 in gids
    assert gids.count(3) == 1
    assert 1 not in gids


def test_window_ranks_oracle_parity(spark, sf_dir):
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["window_ranks"](spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["window_ranks"], sf_dir, "window_ranks"
    )
    rows = df.collect()
    assert rows
    # rank statistics well-formed per partition
    by_p = {}
    for r in rows:
        by_p.setdefault(r.o_orderpriority, []).append(r)
    for p, rs in by_p.items():
        assert all(0.0 <= r.prank <= 1.0 and 0.0 < r.cdist <= 1.0 for r in rs)
        assert min(r.drank for r in rs) == 1


def test_partition_merge_rejects_null_key(spark, sf_dir, tmp_path):
    """The partition-level merge shares the NULL-key hazard with the CoW
    path (anti-joins never match NULL) and must reject it the same way."""
    import pytest as _pytest

    from mapreduce_grpc_spark.sources.maintenance import merge_upsert

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1")], "k bigint, v string, p string"
    ).write.partitionBy("p").parquet(path)
    bad = spark.createDataFrame(
        [(None, "oops", "p1")], "k bigint, v string, p string"
    )
    with _pytest.raises(ValueError, match="NULL merge key"):
        merge_upsert(spark, path, bad, keys=["k"], partition_col="p")


def test_cdc_delete_that_empties_files_still_commits(spark, tmp_path):
    """Regression (round-10 find): a CDC delete wiping EVERY row of its
    overlapping files produces zero new data files — the round-9 no-op
    guard read that as "nothing changed" and silently skipped the
    commit, resurrecting the deleted rows.  The guard must only skip
    when nothing is added AND nothing is removed."""
    from pyspark.sql.types import StringType, StructField, StructType

    from mapreduce_grpc_spark.sources.snapshots import (
        apply_cdc_cow,
        current_version,
        read_manifest,
        snap_init,
        snap_read,
    )

    path = str(tmp_path / "t")
    # one row per file: a single-key delete empties a whole file
    df = spark.range(5).selectExpr(
        "CAST(id AS INT) AS k", "CAST(id * 2.0 AS DOUBLE) AS v"
    ).repartitionByRange(5, "k")
    snap_init(spark, df, path, stats_cols=["k"])
    assert len(read_manifest(path)["files"]) == 5
    schema = snap_read(spark, path).schema
    batch = spark.createDataFrame(
        [(2, None, "D")],
        StructType(list(schema.fields) + [StructField("_op", StringType())]),
    )
    res = apply_cdc_cow(spark, path, batch, keys=["k"])
    assert not res.get("skipped"), res
    assert res["version"] == 2 and current_version(path) == 2
    assert sorted(r.k for r in snap_read(spark, path).collect()) == [
        0, 1, 3, 4,
    ]
    # and the double-delete of the same key IS a clean no-op
    res2 = apply_cdc_cow(spark, path, batch, keys=["k"])
    assert res2.get("skipped") and current_version(path) == 2
