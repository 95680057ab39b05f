"""Hidden partitioning on snapshot tables (sources/partition.py).

Iceberg-style partition transforms — ``days(ts)``, ``hours(ts)``,
``bucket(N, col)``, ``truncate(N, col)``, identity — declared once at
``snap_init`` and invisible afterwards: every write path clusters
batches by the derived tuple and ``snap_scan`` prunes files from plain
predicates on the SOURCE columns.  These tests pin:

- the three derivation implementations agree value-for-value: the
  Spark expression (library writes), the python twin (predicate
  derivation on the driver), and the pandas twin (the Arrow
  batch/stream sink write path);
- scan answers are EXACTLY the plain filter's on every predicate shape
  (pruning is advisory and the row filter exact);
- pruning actually skips files on a clustered table: day ranges,
  bucket point lookups, truncate prefixes;
- every mutator preserves the spec and re-derives on rewrite: append,
  merge_into, update_where, MoR delete + scan, optimize;
- spec validation rejects unknown transforms / bad types / reserved
  names, and ``snap_drop_column`` refuses to orphan a partition source;
- a renamed source column (column mapping) still prunes — the spec
  pins PHYSICAL names;
- the batch DataSource writer and the streaming sink derive + track
  partition values so their files prune too;
- files from a pre-partitioning layout (no ``_sgp_*`` stats) are never
  pruned — conservative, not wrong.

Runs over both FS backends (``snapshot_fs``).
"""

from __future__ import annotations

import datetime
import os

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources import snapshots as snap
from mapreduce_grpc_spark.sources.partition import (
    derive_branch_preds,
    parse_partition_spec,
    partition_expr,
    partition_pandas,
    transform_value,
)
from mapreduce_grpc_spark.sources.snapshots import (
    merge_into,
    optimize_snapshot,
    prune_manifest,
    read_manifest,
    snap_append,
    snap_drop_column,
    snap_init,
    snap_read,
    snap_rename_column,
    snap_scan,
    update_where,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")

JAN = datetime.datetime(2024, 1, 1)


def _events(spark, n=400, days=20):
    """Deterministic events-shaped frame spanning ``days`` days."""
    return spark.range(n).selectExpr(
        "id AS event_id",
        # 1704067200 = 2024-01-01T00:00:00Z; timestamp_seconds is
        # timezone-free (an instant), unlike TIMESTAMP literals
        f"timestamp_seconds(1704067200 + CAST(id * ({days} * 86400.0 "
        f"/ {n}) AS BIGINT)) AS ts",
        "CAST(id % 37 AS BIGINT) AS user_id",
        "CASE WHEN id % 3 = 0 THEN 'click_view' WHEN id % 3 = 1 THEN "
        "'page_load' ELSE 'api_call' END AS event_type",
        "CAST(id AS DOUBLE) / 7.0 AS value",
    )


@pytest.fixture
def no_coalesce(spark):
    """Disable AQE partition coalescing so a 400-row fixture still
    fans out into multiple files (at real scale AQE right-sizing is
    exactly what we want; at test scale it folds everything into one
    file and there is nothing to prune)."""
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    yield
    spark.conf.set(key, prev)


def _mk(spark, tmp_path, partition_by, df=None, stats=("event_id",)):
    path = os.path.join(str(tmp_path), "t")
    df = _events(spark) if df is None else df
    snap_init(
        spark, df, path, stats_cols=list(stats), partition_by=partition_by
    )
    return path, df


def _counts_equal(spark, path, df, preds, cond):
    got = sorted(
        snap_scan(spark, path, preds).select("event_id").toPandas()[
            "event_id"
        ]
    )
    want = sorted(df.filter(cond).select("event_id").toPandas()["event_id"])
    assert got == want
    return len(got)


# --- transform agreement ---------------------------------------------


def test_three_implementations_agree(spark):
    df = _events(spark, n=120, days=40)
    pspec = parse_partition_spec(
        [
            "days(ts)",
            "hours(ts)",
            "bucket(8, user_id)",
            "truncate(4, event_type)",
            "bucket(5, event_type)",
            "user_id",
        ],
        df.schema,
    )
    probe = df
    for s in pspec:
        probe = probe.withColumn(s["name"], partition_expr(s))
    rows = probe.collect()
    src = {s["name"]: s["col"] for s in pspec}
    for r in rows:
        for s in pspec:
            assert r[s["name"]] == transform_value(s, r[src[s["name"]]]), (
                s,
                r[src[s["name"]]],
            )
    pdf = partition_pandas(pspec, df.toPandas())
    names = [s["name"] for s in pspec]
    got = sorted(map(tuple, pdf[["event_id"] + names].itertuples(False)))
    want = sorted((r["event_id"], *[r[n] for n in names]) for r in rows)
    assert got == want


def test_truncate_int_negative_safe(spark):
    df = spark.range(1).selectExpr("CAST(id AS BIGINT) AS k")
    pspec = parse_partition_spec(["truncate(10, k)"], df.schema)
    s = pspec[0]
    probe = spark.createDataFrame(
        [(-25,), (-20,), (-1,), (0,), (7,), (10,)], "k bigint"
    ).withColumn("p", partition_expr(s))
    for r in probe.collect():
        assert r["p"] == transform_value(s, r["k"])
        assert r["p"] % 10 == 0 and r["p"] <= r["k"] < r["p"] + 10


# --- spec validation --------------------------------------------------


def test_spec_validation(spark):
    schema = _events(spark).schema
    with pytest.raises(ValueError, match="unknown partition transform"):
        parse_partition_spec(["weeks(ts)"], schema)
    # months/years exist but only for DATE sources (calendar math is
    # session-TZ-dependent on timestamps)
    with pytest.raises(TypeError, match="does not support"):
        parse_partition_spec(["months(ts)"], schema)
    with pytest.raises(KeyError, match="no column"):
        parse_partition_spec(["days(nope)"], schema)
    with pytest.raises(TypeError, match="does not support"):
        parse_partition_spec(["days(user_id)"], schema)
    with pytest.raises(TypeError, match="does not support"):
        parse_partition_spec(["bucket(4, value)"], schema)  # double
    with pytest.raises(ValueError, match="positive integer"):
        parse_partition_spec(["bucket(user_id)"], schema)
    with pytest.raises(ValueError, match="takes no parameter"):
        parse_partition_spec(["days(3, ts)"], schema)
    clash = _events(spark).withColumnRenamed("value", "_sgp_0").schema
    with pytest.raises(ValueError, match="reserved"):
        parse_partition_spec(["days(ts)"], clash)


# --- scan parity + real pruning ---------------------------------------


def test_day_range_prunes_and_matches(spark, tmp_path, no_coalesce):
    path, df = _mk(spark, tmp_path, ["days(ts)", "bucket(8, user_id)"])
    m = read_manifest(path)
    assert m["partition_spec"] and len(m["files"]) > 3
    lo, hi = JAN + datetime.timedelta(days=3), JAN + datetime.timedelta(
        days=5
    )
    preds = [("ts", "between", lo, hi)]
    kept, skipped = prune_manifest(
        m, preds, snap._bloom_loader(path, None)
    )
    assert skipped, "a 2-day scan of a 20-day table must skip files"
    n = _counts_equal(
        spark, path, df, preds,
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )
    assert n > 0


def test_bucket_point_lookup_prunes(spark, tmp_path, no_coalesce):
    path, df = _mk(spark, tmp_path, ["bucket(8, user_id)", "days(ts)"])
    m = read_manifest(path)
    preds = [("user_id", "=", 11)]
    kept, skipped = prune_manifest(
        m, preds, snap._bloom_loader(path, None)
    )
    assert skipped, "a bucket point lookup must skip files"
    _counts_equal(spark, path, df, preds, F.col("user_id") == 11)
    # IN probes derive too
    preds = [("user_id", "in", [11, 23])]
    _counts_equal(
        spark, path, df, preds, F.col("user_id").isin([11, 23])
    )


def test_truncate_prefix_prunes(spark, tmp_path, no_coalesce):
    path, df = _mk(spark, tmp_path, ["truncate(4, event_type)"])
    m = read_manifest(path)
    preds = [("event_type", "=", "click_view")]
    kept, skipped = prune_manifest(
        m, preds, snap._bloom_loader(path, None)
    )
    assert skipped
    _counts_equal(
        spark, path, df, preds, F.col("event_type") == "click_view"
    )


def test_every_predicate_shape_matches(spark, tmp_path, no_coalesce):
    path, df = _mk(spark, tmp_path, ["days(ts)", "bucket(8, user_id)"])
    d4 = JAN + datetime.timedelta(days=4)
    cases = [
        ([("ts", ">=", d4)], F.col("ts") >= F.lit(d4)),
        ([("ts", "<", d4)], F.col("ts") < F.lit(d4)),
        (
            [("ts", ">", d4), ("user_id", "=", 3)],
            (F.col("ts") > F.lit(d4)) & (F.col("user_id") == 3),
        ),
        (  # DNF OR-tree with derivations on both branches
            [[("user_id", "=", 3)], "or", [("ts", "<=", JAN)]],
            (F.col("user_id") == 3) | (F.col("ts") <= F.lit(JAN)),
        ),
    ]
    for preds, cond in cases:
        _counts_equal(spark, path, df, preds, cond)


def test_unpartitioned_files_never_pruned(spark, tmp_path, no_coalesce):
    """Entries without _sgp stats (pre-partitioning writers) must be
    kept by derived predicates — pruning is advisory, never a filter."""
    path, df = _mk(spark, tmp_path, ["days(ts)"])
    m = read_manifest(path)
    stripped = dict(m)
    stripped["files"] = [
        {
            **e,
            "stats": {
                k: v for k, v in e["stats"].items() if k != "_sgp_0"
            },
            "rg": {k: v for k, v in e["rg"].items() if k != "_sgp_0"},
        }
        for e in m["files"]
    ]
    preds = [("ts", "between", JAN, JAN + datetime.timedelta(days=1))]
    kept, skipped = prune_manifest(stripped, preds, None)
    assert not skipped and len(kept) == len(m["files"])


# --- mutators preserve the spec ---------------------------------------


def test_append_clusters_and_prunes(spark, tmp_path, no_coalesce):
    path, df = _mk(spark, tmp_path, ["days(ts)"])
    extra = _events(spark, n=200, days=20).withColumn(
        "event_id", F.col("event_id") + 10_000
    )
    snap_append(spark, path, extra)
    m = read_manifest(path)
    assert m["partition_spec"], "append must carry the spec forward"
    new = [e for e in m["files"] if "_sgp_0" in e.get("stats", {})]
    assert len(new) == len(m["files"]), "appended files must carry stats"
    both = df.unionByName(extra)
    lo, hi = JAN + datetime.timedelta(days=2), JAN + datetime.timedelta(
        days=3
    )
    preds = [("ts", "between", lo, hi)]
    kept, skipped = prune_manifest(m, preds, None)
    assert skipped
    _counts_equal(
        spark, path, both, preds,
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )


def test_merge_update_rewrites_rederive(spark, tmp_path, no_coalesce):
    path, df = _mk(spark, tmp_path, ["days(ts)"])
    src = df.filter(F.col("event_id") % 5 == 0).withColumn(
        "value", F.col("value") + 100.0
    )
    merge_into(
        spark, path, src, keys=["event_id"],
        matched=[("update", None, {"value": "s.value"})],
        not_matched=[("insert", None, None)],
    )
    update_where(
        spark, path, [("user_id", "=", 7)], {"value": "CAST(-1.0 AS DOUBLE)"}
    )
    m = read_manifest(path)
    assert all("_sgp_0" in e.get("stats", {}) for e in m["files"]), (
        "every rewritten file must re-derive partition stats"
    )
    mutated = df.withColumn(
        "value",
        F.when(F.col("event_id") % 5 == 0, F.col("value") + 100.0)
        .otherwise(F.col("value")),
    ).withColumn(
        "value",
        F.when(F.col("user_id") == 7, F.lit(-1.0)).otherwise(
            F.col("value")
        ),
    )
    lo = JAN + datetime.timedelta(days=10)
    got = (
        snap_scan(spark, path, [("ts", ">=", lo)])
        .select("event_id", "value")
        .toPandas()
        .sort_values("event_id")
        .values.tolist()
    )
    want = (
        mutated.filter(F.col("ts") >= F.lit(lo))
        .select("event_id", "value")
        .toPandas()
        .sort_values("event_id")
        .values.tolist()
    )
    assert got == want


def test_optimize_preserves_spec_and_stats(spark, tmp_path, no_coalesce):
    path, df = _mk(spark, tmp_path, ["days(ts)"])
    optimize_snapshot(spark, path, target_bytes=1 << 30)
    m = read_manifest(path)
    assert m["partition_spec"]
    assert all("_sgp_0" in e.get("stats", {}) for e in m["files"])
    assert snap_read(spark, path).count() == df.count()


# --- schema evolution interplay ---------------------------------------


def test_drop_partition_source_refused(spark, tmp_path):
    path, _ = _mk(spark, tmp_path, ["days(ts)"])
    with pytest.raises(ValueError, match="partition source"):
        snap_drop_column(path, "ts")


def test_renamed_source_still_prunes(spark, tmp_path, no_coalesce):
    path, df = _mk(spark, tmp_path, ["days(ts)"])
    snap_rename_column(path, "ts", "event_time")
    m = read_manifest(path)
    lo, hi = JAN + datetime.timedelta(days=2), JAN + datetime.timedelta(
        days=3
    )
    preds = [("event_time", "between", lo, hi)]
    kept, skipped = prune_manifest(m, preds, None)
    assert skipped, "pruning must survive a source-column rename"
    got = snap_scan(spark, path, preds).count()
    want = df.filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    ).count()
    assert got == want > 0
    # appends under the new logical name still derive
    extra = _events(spark, n=40, days=20).withColumnRenamed(
        "ts", "event_time"
    )
    snap_append(spark, path, extra)
    m2 = read_manifest(path)
    assert all("_sgp_0" in e.get("stats", {}) for e in m2["files"])


# --- data source write paths ------------------------------------------


def test_batch_writer_derives_and_prunes(
    spark, tmp_path, no_coalesce, snapshot_fs
):
    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    path, df = _mk(spark, tmp_path, ["days(ts)"])
    extra = _events(spark, n=100, days=20).withColumn(
        "event_id", F.col("event_id") + 50_000
    )
    (
        extra.write.format("snapshot_table")
        .option("path", path)
        .option("fsImpl", snapshot_fs.spec)
        .mode("append")
        .save()
    )
    m = read_manifest(path)
    assert all("_sgp_0" in e.get("stats", {}) for e in m["files"]), (
        "batch-DataSource-written files must carry partition stats"
    )
    both = df.unionByName(extra)
    lo, hi = JAN + datetime.timedelta(days=1), JAN + datetime.timedelta(
        days=2
    )
    preds = [("ts", "between", lo, hi)]
    kept, skipped = prune_manifest(m, preds, None)
    assert skipped
    _counts_equal(
        spark, path, both, preds,
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )


def test_stream_sink_derives_and_prunes(
    spark, tmp_path, no_coalesce, snapshot_fs
):
    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    path, df = _mk(spark, tmp_path, ["days(ts)"])
    extra = _events(spark, n=100, days=20).withColumn(
        "event_id", F.col("event_id") + 90_000
    )
    src_dir = os.path.join(str(tmp_path), "src_parquet")
    extra.write.parquet(src_dir)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    q = (
        spark.readStream.schema(extra.schema)
        .parquet(src_dir)
        .writeStream.format("snapshot_table")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .option("txnAppId", "part-sink-test")
        .option("fsImpl", snapshot_fs.spec)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    m = read_manifest(path)
    assert all("_sgp_0" in e.get("stats", {}) for e in m["files"]), (
        "sink-written files must carry partition stats"
    )
    both = df.unionByName(extra)
    lo, hi = JAN + datetime.timedelta(days=1), JAN + datetime.timedelta(
        days=2
    )
    _counts_equal(
        spark, path, both, [("ts", "between", lo, hi)],
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )


# --- derivation unit checks -------------------------------------------


def test_derive_branch_preds_shapes(spark):
    df = _events(spark)
    pspec = parse_partition_spec(
        ["days(ts)", "bucket(8, user_id)"], df.schema
    )
    d = datetime.datetime(2024, 1, 10, 12, 0, 0)
    day = transform_value(pspec[0], d)
    out = derive_branch_preds(pspec, [("ts", "=", d)])
    # timestamp source: +-1 day slop -> a between, not an equality
    assert out == [("_sgp_0", "between", day - 1, day + 1)]
    out = derive_branch_preds(pspec, [("user_id", "=", 42)])
    assert out == [("_sgp_1", "=", transform_value(pspec[1], 42))]
    # bucket never derives ranges (hashing destroys order)
    assert derive_branch_preds(pspec, [("user_id", ">", 42)]) == []
    # untransformable value: skipped, not wrong
    assert derive_branch_preds(pspec, [("ts", "=", object())]) == []


# --- AUX oracle parity --------------------------------------------------


def test_snapshot_partitioned_scan_oracle(spark, sf_dir):
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    name = "snapshot_partitioned_scan"  # rotated into the contract r10
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() > 0
    assert_oracle_match(df, registry.ORACLES[name], sf_dir, name)


def test_optimize_reclusters_partitioned_table(
    spark, tmp_path, no_coalesce
):
    """Plain compaction on a partitioned table re-clusters by the
    tuple at the target file count: bin-packing must not smear days
    across files (pruning would silently degrade to full scans)."""
    path, df = _mk(spark, tmp_path, ["days(ts)"])
    parts = [df]
    for i in (1, 2):
        extra = _events(spark, n=120, days=20).withColumn(
            "event_id", F.col("event_id") + 10_000 * i
        )
        snap_append(spark, path, extra)
        parts.append(extra)
    total_bytes = sum(
        e["bytes"] for e in read_manifest(path)["files"]
    )
    res = optimize_snapshot(
        spark, path, target_bytes=max(total_bytes // 4, 1)
    )
    assert res["rewritten"] > 0
    m = read_manifest(path)
    assert len(m["files"]) > 1, "target_bytes must yield several files"
    assert all("_sgp_0" in e.get("stats", {}) for e in m["files"])
    lo, hi = JAN + datetime.timedelta(days=2), JAN + datetime.timedelta(
        days=3
    )
    preds = [("ts", "between", lo, hi)]
    kept, skipped = prune_manifest(m, preds, None)
    assert skipped, "compaction must keep the layout prunable"
    both = parts[0]
    for p in parts[1:]:
        both = both.unionByName(p)
    _counts_equal(
        spark, path, both, preds,
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )


def test_optimize_binpacks_within_partitions(
    spark, tmp_path, no_coalesce
):
    """A tight target_bytes budget (global file count 1 < n_days)
    must never merge two days into one file: compaction groups the
    rewrite set by partition tuple and bin-packs WITHIN groups, so
    the one-day-scan kept-file ratio survives OPTIMIZE — and a table
    already at one file per day demotes every group to carry (no-op)
    instead of re-smearing."""
    days, reps = 8, 2
    path = os.path.join(str(tmp_path), "t")
    frames = []
    for d in range(days):
        for rep in range(reps):
            fd = (
                _events(spark, n=25, days=1)
                .withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {d} DAYS")
                )
                .withColumn(
                    "event_id",
                    F.col("event_id") + 1000 * d + 100 * rep,
                )
                .coalesce(1)
            )
            if not frames:
                snap_init(
                    spark, fd, path, stats_cols=["event_id"],
                    partition_by=["days(ts)"],
                )
            else:
                snap_append(spark, path, fd)
            frames.append(fd)
    m0 = read_manifest(path)
    assert len(m0["files"]) == days * reps
    res = optimize_snapshot(spark, path, target_bytes=1 << 30)
    assert res["rewritten"] == days * reps
    assert res["added"] == days, "one output file per day, never fewer"
    m = read_manifest(path)
    assert len(m["files"]) == days
    for e in m["files"]:
        env = e["stats"]["_sgp_0"]
        assert env["min"] == env["max"], "outputs must stay tuple-pure"
    # one-day scan after the tight-budget OPTIMIZE: the derived day
    # pred widens by +-1 (timezone slop), so exactly 3 of 8 kept
    lo = JAN + datetime.timedelta(days=3)
    hi = JAN + datetime.timedelta(days=3, hours=23)
    preds = [("ts", "between", lo, hi)]
    kept, skipped = prune_manifest(m, preds, None)
    assert len(kept) == 3 and len(skipped) == days - 3
    both = frames[0]
    for p in frames[1:]:
        both = both.unionByName(p)
    _counts_equal(
        spark, path, both, preds,
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )
    # idempotent: every group already one file -> no commit at all
    v = m["version"]
    res2 = optimize_snapshot(spark, path, target_bytes=1 << 30)
    assert res2["rewritten"] == 0 and res2["added"] == 0
    assert read_manifest(path)["version"] == v


def test_optimize_partitioned_rewrites_residual_files(
    spark, tmp_path, no_coalesce
):
    """Files WITHOUT per-file _sgp stats (written before the spec
    existed) can't be tuple-grouped: they form the residual group,
    range-clustered at the exact tuple count (affordable here: 4 days
    within 4 input files) so the rewrite comes out day-PURE instead
    of day-smeared — and the second OPTIMIZE demotes everything."""
    from mapreduce_grpc_spark.sources.snapshots import (
        snap_set_partition_spec,
    )

    df = _events(spark, n=200, days=4)
    path = os.path.join(str(tmp_path), "t")
    # pre-spec history: two appends with NO partition columns at all
    half = df.filter(F.col("event_id") % 2 == 0)
    other = df.filter(F.col("event_id") % 2 == 1)
    snap_init(spark, half.coalesce(2), path, stats_cols=["event_id"])
    snap_append(spark, path, other.coalesce(2))
    snap_set_partition_spec(path, ["days(ts)"])
    assert all(
        "_sgp_0" not in (e.get("stats") or {})
        for e in read_manifest(path)["files"]
    )
    res = optimize_snapshot(spark, path, target_bytes=1 << 30)
    assert res["rewritten"] == 4
    m = read_manifest(path)
    # every rewritten file now carries tracked partition stats, one
    # tuple-pure file per day: a one-day scan must skip files
    assert all("_sgp_0" in e["stats"] for e in m["files"])
    assert len(m["files"]) == 4
    for e in m["files"]:
        env = e["stats"]["_sgp_0"]
        assert env["min"] == env["max"]
    lo = JAN + datetime.timedelta(days=1)
    hi = JAN + datetime.timedelta(days=1, hours=23)
    preds = [("ts", "between", lo, hi)]
    kept, skipped = prune_manifest(m, preds, None)
    assert skipped, "residual rewrite must restore prunability"
    _counts_equal(
        spark, path, df, preds,
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )
    # idempotent: the rewritten residual is quasi-disjoint at a width
    # a re-run could not shrink — it must DEMOTE, not churn forever
    v = m["version"]
    res2 = optimize_snapshot(spark, path, target_bytes=1 << 30)
    assert res2["rewritten"] == 0
    assert read_manifest(path)["version"] == v


def test_zorder_within_partitions(spark, tmp_path, no_coalesce):
    """ZORDER on a partitioned table applies the curve WITHIN each
    partition tuple (the Delta semantic): outputs stay tuple-pure, so
    the user keeps partition pruning AND gains key locality inside
    each day — user_id envelopes of a day's files narrow instead of
    spanning the domain."""
    days, reps = 4, 2
    path = os.path.join(str(tmp_path), "t")
    frames = []
    for d in range(days):
        for rep in range(reps):
            fd = (
                _events(spark, n=200, days=1)
                .withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {d} DAYS")
                )
                .withColumn(
                    "event_id",
                    F.col("event_id") + 10_000 * d + 1000 * rep,
                )
                .coalesce(1)
            )
            if not frames:
                snap_init(
                    spark, fd, path,
                    stats_cols=["event_id", "user_id"],
                    partition_by=["days(ts)"],
                )
            else:
                snap_append(spark, path, fd)
            frames.append(fd)
    res = optimize_snapshot(
        spark, path, target_bytes=8 * 1024,
        zorder=("user_id", "event_id"),
    )
    assert res["rewritten"] == days * reps
    m = read_manifest(path)
    assert len(m["files"]) > days, "budget should split each day"
    by_day: dict = {}
    for e in m["files"]:
        env = e["stats"]["_sgp_0"]
        assert env["min"] == env["max"], "zorder must stay tuple-pure"
        by_day.setdefault(env["min"], []).append(e)
    assert len(by_day) == days
    # key locality inside a day: with >1 file per day, at least one
    # file's user_id envelope must be a strict subrange of the domain
    # (0..36) — the pre-zorder layout had every file spanning it
    narrowed = 0
    for day, files in by_day.items():
        if len(files) < 2:
            continue
        for e in files:
            u = e["stats"]["user_id"]
            if u["max"] - u["min"] < 36:
                narrowed += 1
    assert narrowed > 0, "zorder produced no locality inside days"
    # pruning + answers exact
    lo = JAN + datetime.timedelta(days=1)
    hi = JAN + datetime.timedelta(days=1, hours=23)
    preds = [("ts", "between", lo, hi)]
    kept, skipped = prune_manifest(m, preds, None)
    assert skipped, "partition pruning must survive zorder"
    both = frames[0]
    for p in frames[1:]:
        both = both.unionByName(p)
    _counts_equal(
        spark, path, both, preds,
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )


def test_zorder_on_partitioned_table_keeps_answers(
    spark, tmp_path, no_coalesce
):
    """Z-order OPTIMIZE on a partitioned table whose files are NOT
    tuple-pure (the residual path): answers stay exact and the
    derived stats stay tracked; those rewritten envelopes may still
    span tuples — exactly what the inputs already were."""
    path, df = _mk(spark, tmp_path, ["days(ts)"])
    optimize_snapshot(
        spark, path, target_bytes=1 << 30,
        zorder=("user_id", "event_id"),
    )
    m = read_manifest(path)
    assert all("_sgp_0" in e.get("stats", {}) for e in m["files"])
    lo = JAN + datetime.timedelta(days=7)
    _counts_equal(
        spark, path, df, [("ts", ">=", lo)], F.col("ts") >= F.lit(lo)
    )


def test_partition_spec_evolution(spark, tmp_path, no_coalesce):
    """snap_set_partition_spec: fresh field ids, old files never
    mis-pruned, new writes cluster under the new spec, unpartition
    stops deriving — and every scan stays exactly correct."""
    from mapreduce_grpc_spark.sources.snapshots import (
        snap_set_partition_spec,
    )

    path, df = _mk(spark, tmp_path, ["days(ts)"])
    m0 = read_manifest(path)
    assert m0["partition_spec"][0]["name"] == "_sgp_0"

    # evolve to bucket-by-user: the new field MUST NOT reuse _sgp_0
    snap_set_partition_spec(path, ["bucket(8, user_id)"])
    m1 = read_manifest(path)
    assert m1["partition_spec"][0]["name"] == "_sgp_1"
    assert m1["partition_field_seq"] == 2

    extra = _events(spark, n=200, days=20).withColumn(
        "event_id", F.col("event_id") + 10_000
    )
    snap_append(spark, path, extra)
    m2 = read_manifest(path)
    new_files = [e for e in m2["files"] if "_sgp_1" in e.get("stats", {})]
    old_files = [e for e in m2["files"] if "_sgp_0" in e.get("stats", {})]
    assert new_files and old_files

    both = df.unionByName(extra)
    # bucket predicate: prunes among NEW files, keeps all OLD files
    preds = [("user_id", "=", 11)]
    kept, skipped = prune_manifest(m2, preds, None)
    assert all(e in kept for e in old_files), (
        "old-spec files must never be pruned by new-spec predicates"
    )
    assert skipped, "new-spec files must prune on the bucket"
    _counts_equal(spark, path, both, preds, F.col("user_id") == 11)

    # day predicate: the old spec's derived preds are gone (only
    # current-spec derivations fire) but answers stay exact
    lo, hi = JAN + datetime.timedelta(days=2), JAN + datetime.timedelta(
        days=3
    )
    _counts_equal(
        spark, path, both, [("ts", "between", lo, hi)],
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )

    # unpartition: future writes stop deriving
    snap_set_partition_spec(path, None)
    m3 = read_manifest(path)
    assert not m3.get("partition_spec")
    extra2 = _events(spark, n=50, days=20).withColumn(
        "event_id", F.col("event_id") + 50_000
    )
    snap_append(spark, path, extra2)
    m4 = read_manifest(path)
    newest = [
        e
        for e in m4["files"]
        if e["name"] not in {f["name"] for f in m3["files"]}
    ]
    assert newest and all(
        not any(k.startswith("_sgp") for k in e.get("stats", {}))
        for e in newest
    )
    all3 = both.unionByName(extra2)
    _counts_equal(
        spark, path, all3, [("user_id", "=", 11)], F.col("user_id") == 11
    )


def test_compaction_converges_layout_after_evolution(
    spark, tmp_path, no_coalesce
):
    """OPTIMIZE rewrites everything under the CURRENT spec, so one
    compaction after an evolution restores full pruning."""
    from mapreduce_grpc_spark.sources.snapshots import (
        snap_set_partition_spec,
    )

    path, df = _mk(spark, tmp_path, ["days(ts)"])
    snap_set_partition_spec(path, ["bucket(8, user_id)"])
    total = sum(e["bytes"] for e in read_manifest(path)["files"])
    optimize_snapshot(spark, path, target_bytes=max(total // 4, 1))
    m = read_manifest(path)
    assert all("_sgp_1" in e.get("stats", {}) for e in m["files"])
    preds = [("user_id", "=", 11)]
    kept, skipped = prune_manifest(m, preds, None)
    assert skipped, "post-compaction files must prune under the new spec"
    _counts_equal(spark, path, df, preds, F.col("user_id") == 11)


def test_batch_writer_creates_partitioned_table(
    spark, tmp_path, no_coalesce, snapshot_fs
):
    """format("snapshot_table").option("partitionBy", ...) on a fresh
    path creates a partitioned table: the spec lands in the manifest,
    the create's own files carry derived stats, later library appends
    cluster under it, and a divergent option on an existing table is
    refused loudly."""
    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    path = os.path.join(str(tmp_path), "t")
    df = _events(spark)
    (
        df.write.format("snapshot_table")
        .option("path", path)
        .option("fsImpl", snapshot_fs.spec)
        .option("statsCols", "event_id")
        .option("partitionBy", "days(ts), bucket(8, user_id)")
        .mode("append")
        .save()
    )
    m = read_manifest(path)
    assert [s["t"] for s in m["partition_spec"]] == ["days", "bucket"]
    assert all("_sgp_0" in e.get("stats", {}) for e in m["files"])
    lo, hi = JAN + datetime.timedelta(days=2), JAN + datetime.timedelta(
        days=3
    )
    _counts_equal(
        spark, path, df, [("ts", "between", lo, hi)],
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )
    # matching option on an existing table: accepted (idempotent script)
    extra = _events(spark, n=40, days=20).withColumn(
        "event_id", F.col("event_id") + 10_000
    )
    (
        extra.write.format("snapshot_table")
        .option("path", path)
        .option("fsImpl", snapshot_fs.spec)
        .option("partitionBy", "days(ts), bucket(8, user_id)")
        .mode("append")
        .save()
    )
    # divergent option: refused before anything publishes
    with pytest.raises(Exception, match="does not match"):
        (
            extra.write.format("snapshot_table")
            .option("path", path)
            .option("fsImpl", snapshot_fs.spec)
            .option("partitionBy", "days(ts)")
            .mode("append")
            .save()
        )
    both = df.unionByName(extra)
    _counts_equal(
        spark, path, both, [("user_id", "=", 5)], F.col("user_id") == 5
    )


def test_years_months_transforms(spark, tmp_path, no_coalesce):
    """years()/months() on DATE sources: three implementations agree,
    and a month-window scan prunes + matches exactly."""
    df = spark.range(400).selectExpr(
        "id AS event_id",
        "date_add(DATE '2022-01-01', CAST(id * 2 AS INT)) AS d",
        "CAST(id AS DOUBLE) AS value",
    )
    pspec = parse_partition_spec(["months(d)", "years(d)"], df.schema)
    probe = df
    for s in pspec:
        probe = probe.withColumn(s["name"], partition_expr(s))
    rows = probe.collect()
    for r in rows:
        for s in pspec:
            assert r[s["name"]] == transform_value(s, r["d"])
    pdf = partition_pandas(pspec, df.toPandas())
    got = sorted(
        map(tuple, pdf[["event_id"] + [s["name"] for s in pspec]]
            .itertuples(False))
    )
    want = sorted(
        (r["event_id"], *[r[s["name"]] for s in pspec]) for r in rows
    )
    assert got == want
    # timestamps are rejected for calendar transforms (TZ-dependent)
    ev = _events(spark)
    with pytest.raises(TypeError, match="does not support"):
        parse_partition_spec(["months(ts)"], ev.schema)

    path = os.path.join(str(tmp_path), "t")
    snap_init(
        spark, df, path, stats_cols=["event_id"],
        partition_by=["months(d)"],
    )
    m = read_manifest(path)
    lo, hi = datetime.date(2022, 7, 1), datetime.date(2022, 9, 30)
    preds = [("d", "between", lo, hi)]
    kept, skipped = prune_manifest(m, preds, None)
    assert skipped, "a 3-month window over ~27 months must skip files"
    _counts_equal(
        spark, path, df, preds,
        (F.col("d") >= F.lit(lo)) & (F.col("d") <= F.lit(hi)),
    )


def test_optimize_where_scopes_rewrite(spark, tmp_path, no_coalesce):
    """OPTIMIZE ... WHERE (r12): the predicate prunes the CANDIDATE
    set before grouping, so compacting the one hot day a streaming
    writer fragmented rewrites only that day's files — every other
    day is carried byte-identically (same manifest names) — and the
    scoped OPTIMIZE is idempotent like the global one."""
    days, reps = 8, 2
    path = os.path.join(str(tmp_path), "t")
    frames = []
    for d in range(days):
        for rep in range(reps):
            fd = (
                _events(spark, n=25, days=1)
                .withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {d} DAYS")
                )
                .withColumn(
                    "event_id",
                    F.col("event_id") + 1000 * d + 100 * rep,
                )
                .coalesce(1)
            )
            if not frames:
                snap_init(
                    spark, fd, path, stats_cols=["event_id"],
                    partition_by=["days(ts)"],
                )
            else:
                snap_append(spark, path, fd)
            frames.append(fd)
    m0 = read_manifest(path)
    assert len(m0["files"]) == days * reps
    lo = JAN + datetime.timedelta(days=3)
    hi = JAN + datetime.timedelta(days=3, hours=23)
    where = [("ts", "between", lo, hi)]
    in_scope, out_scope = prune_manifest(m0, where, None)
    assert len(in_scope) == 3 * reps  # day pred widens +-1 (tz slop)
    before = {e["name"] for e in out_scope}

    res = optimize_snapshot(
        spark, path, target_bytes=1 << 30, where=where
    )
    assert res["rewritten"] == 3 * reps
    assert res["added"] == 3, "one output per in-scope day"
    assert res["carried"] == (days - 3) * reps
    m = read_manifest(path)
    names = {e["name"] for e in m["files"]}
    assert before <= names, "out-of-scope files carried by NAME"
    # outputs stay tuple-pure: the scoped rewrite keeps pruning exact
    for e in m["files"]:
        env = e["stats"]["_sgp_0"]
        assert env["min"] == env["max"]
    both = frames[0]
    for p in frames[1:]:
        both = both.unionByName(p)
    _counts_equal(
        spark, path, both, where,
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )
    # full-table answer intact too
    assert snap_read(spark, path).count() == both.count()
    # scoped idempotence: the 3 in-scope days are now one file each
    v = m["version"]
    res2 = optimize_snapshot(
        spark, path, target_bytes=1 << 30, where=where
    )
    assert res2["rewritten"] == 0 and res2["added"] == 0
    assert read_manifest(path)["version"] == v
    # a predicate matching nothing is a no-op without a commit
    far = JAN + datetime.timedelta(days=400)
    res3 = optimize_snapshot(
        spark, path, target_bytes=1 << 30,
        where=[("ts", ">=", far)],
    )
    assert res3["rewritten"] == 0 and res3["added"] == 0


def test_optimize_where_zorder_scopes_rewrite(
    spark, tmp_path, no_coalesce
):
    """ZORDER ... WHERE: the curve rewrite applies only to matching
    files (per partition tuple, as always); the rest of the table is
    carried untouched."""
    days, reps = 4, 2
    path = os.path.join(str(tmp_path), "t")
    frames = []
    for d in range(days):
        for rep in range(reps):
            fd = (
                _events(spark, n=30, days=1)
                .withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {d} DAYS")
                )
                .withColumn(
                    "event_id",
                    F.col("event_id") + 1000 * d + 100 * rep,
                )
                .coalesce(1)
            )
            if not frames:
                snap_init(
                    spark, fd, path,
                    stats_cols=["event_id", "user_id"],
                    partition_by=["days(ts)"],
                )
            else:
                snap_append(spark, path, fd)
            frames.append(fd)
    m0 = read_manifest(path)
    lo = JAN + datetime.timedelta(days=1)
    hi = JAN + datetime.timedelta(days=1, hours=23)
    where = [("ts", "between", lo, hi)]
    in_scope, out_scope = prune_manifest(m0, where, None)
    before = {e["name"] for e in out_scope}
    res = optimize_snapshot(
        spark, path, zorder=("event_id", "user_id"), where=where
    )
    assert res["rewritten"] == len(in_scope)
    assert res["carried"] == len(out_scope)
    m = read_manifest(path)
    assert before <= {e["name"] for e in m["files"]}
    both = frames[0]
    for p in frames[1:]:
        both = both.unionByName(p)
    assert snap_read(spark, path).count() == both.count()
    _counts_equal(
        spark, path, both, where,
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
    )
