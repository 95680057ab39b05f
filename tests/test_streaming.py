"""Structured Streaming: streaming answers must equal batch answers, and
watermarks must actually drop late data."""

from __future__ import annotations

import glob
import os
import shutil
import uuid
from datetime import datetime

from pyspark.sql import functions as F

from mapreduce_grpc_spark.operators.windows import tumbling_window
from mapreduce_grpc_spark.streaming.events import run_streaming_tumbling


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream_rows = {
        tuple(r) for r in run_streaming_tumbling(spark, sf_dir).collect()
    }
    batch_rows = {
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in tumbling_window(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows


def _drop_file(spark, rows, dest, mtime):
    """Write rows as one parquet file with a controlled mtime."""
    staging = dest + ".stage"
    df = spark.createDataFrame(rows, "ts timestamp, k string")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
    shutil.move(part, dest)
    shutil.rmtree(staging)
    os.utime(dest, (mtime, mtime))


def test_watermark_drops_late_events(spark, tmp_path):
    """2-hour watermark, 1-hour tumbling append windows, three micro-batches:
    an event older than the established watermark must be discarded.

    batch 1: 10:00, 10:30, 13:00  -> max event time 13:00
    batch 2: 13:30               -> watermark 11:00 now in force
    batch 3: 09:30 (LATE, dropped), 14:00
    Emitted (closed) windows: [10:00) with 2 events and [13:00) with 1
    (closed once the final watermark passes 14:00-2h=12:00... it doesn't,
    so only [10:00) is guaranteed) — and crucially NO [09:00) window.  If
    the late event were accepted, a (09:00, 1) row would appear.  (The
    watermark visible to batch N is the one computed after batch N-2;
    batch 3 therefore filters against 11:00 > 09:30.)
    """
    src = str(tmp_path / "stream_in")
    os.makedirs(src)
    d = lambda s: datetime.fromisoformat(f"2024-03-01T{s}:00")
    _drop_file(
        spark,
        [(d("10:00"), "a"), (d("10:30"), "a"), (d("13:00"), "a")],
        os.path.join(src, "batch1.parquet"),
        1_000_000,
    )
    _drop_file(
        spark,
        [(d("13:30"), "a")],
        os.path.join(src, "batch2.parquet"),
        2_000_000,
    )
    _drop_file(
        spark,
        [(d("09:30"), "late"), (d("14:00"), "a")],
        os.path.join(src, "batch3.parquet"),
        3_000_000,
    )

    name = f"wm_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    got = {(r.ws, r.n) for r in spark.table(name).collect()}
    assert dropped == 1, f"late event not dropped (metrics: {dropped})"
    assert (d("09:00"), 1) not in got, got
    assert (d("10:00"), 2) in got, got


def test_streaming_dedup_equals_batch_on_unique_stream(spark, sf_dir):
    """On the fixture stream (unique event_ids) dedup passes every event
    through — the streaming answer must equal the batch scan."""
    from mapreduce_grpc_spark.streaming.dedup import run_streaming_dedup

    got = {r.event_id for r in run_streaming_dedup(spark, sf_dir).collect()}
    want = {
        r.event_id
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    }
    assert got == want and len(got) > 0


def test_streaming_dedup_drops_redeliveries(spark, tmp_path):
    """At-least-once re-delivery: the same event_id arriving again within
    the watermark is dropped; each id is emitted exactly once."""
    from mapreduce_grpc_spark.streaming.dedup import dedup_stream

    src = str(tmp_path / "dedup_in")
    os.makedirs(src)
    d = lambda s: datetime.fromisoformat(f"2024-03-01T{s}:00")
    # batch 1: ids 1,2 ; batch 2 re-delivers id 1 (same payload, later ts)
    # and introduces id 3
    _drop_file(
        spark,
        [(d("10:00"), "1"), (d("10:05"), "2")],
        os.path.join(src, "batch1.parquet"),
        1_000_000,
    )
    _drop_file(
        spark,
        [(d("10:10"), "1"), (d("10:15"), "3")],
        os.path.join(src, "batch2.parquet"),
        2_000_000,
    )

    name = f"dedup_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = (
        stream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["k"])
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    ids = sorted(r.k for r in rows)
    assert ids == ["1", "2", "3"], rows
    # the SURVIVING row for id 1 is the first delivery
    (first_one,) = [r for r in rows if r.k == "1"]
    assert first_one.ts == d("10:00"), first_one


def test_streaming_enrich_equals_batch_join(spark, sf_dir):
    """The stream-static enrichment join's complete-mode output equals
    the batch join, hash-checked against the DuckDB oracle."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["streaming_enrich"](spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["streaming_enrich"], sf_dir, "streaming_enrich"
    )


def test_streaming_interval_join_equals_batch(spark, sf_dir):
    """The stream-stream attribution join's append-mode output equals the
    batch interval join, hash-checked against the DuckDB oracle."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["streaming_interval_join"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["streaming_interval_join"],
        sf_dir,
        "streaming_interval_join",
    )


def test_streaming_interval_join_causal_and_bounded(spark, sf_dir):
    """Every emitted pair is strictly causal and within the attribution
    window; pairs are unique per (view, purchase)."""
    from mapreduce_grpc_spark import registry

    rows = registry.AUX_QUERIES["streaming_interval_join"](spark, sf_dir).collect()
    assert rows, "fixture has view->purchase pairs"
    seen = set()
    for r in rows:
        assert 0 < r.lag_ms <= 3_600_000, r
        key = (r.view_id, r.purchase_id)
        assert key not in seen
        seen.add(key)


def test_streaming_interval_join_drops_late_purchase(spark, tmp_path):
    """Bounded two-sided state: a purchase arriving below the established
    watermark must NOT produce a pair, even though its matching view was
    seen — the late row is dropped / the view state evicted.  An on-time
    purchase in the same batch still matches.

    batch 1: views u1@09:00, u2@11:00 + drivers view u9@13:00 AND
             purchase u8@13:00 (the global watermark is the MIN of the
             two sides' watermarks, so BOTH streams need advancing
             events; u8/u9 are single-sided so they never pair)
    batch 2: drivers u9@13:30, u8@13:30    -> watermark 11:00 in force
    batch 3: purchase u1@09:30 (LATE, below watermark -> no pair),
             purchase u2@11:30 (on time -> pairs with u2@11:00)
    """
    from mapreduce_grpc_spark.streaming.joins import attribution_join

    src = str(tmp_path / "ij_stream")
    os.makedirs(src)
    d = lambda s: datetime.fromisoformat(f"2024-03-01T{s}:00")

    def drop(rows, name, mtime):
        staging = os.path.join(src, name + ".stage")
        df = spark.createDataFrame(
            rows, "ts timestamp, user_id long, event_id long, "
            "event_type string, value double"
        )
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        shutil.move(part, os.path.join(src, name))
        shutil.rmtree(staging)
        os.utime(os.path.join(src, name), (mtime, mtime))

    drop(
        [
            (d("09:00"), 1, 100, "view", 0.0),
            (d("11:00"), 2, 200, "view", 0.0),
            (d("13:00"), 9, 900, "view", 0.0),
            (d("13:00"), 8, 800, "purchase", 0.0),
        ],
        "b1.parquet",
        1_000_000,
    )
    drop(
        [
            (d("13:30"), 9, 901, "view", 0.0),
            (d("13:30"), 8, 801, "purchase", 0.0),
        ],
        "b2.parquet",
        2_000_000,
    )
    drop(
        [
            (d("09:30"), 1, 101, "purchase", 5.0),
            (d("11:30"), 2, 201, "purchase", 7.0),
        ],
        "b3.parquet",
        3_000_000,
    )

    schema = "ts timestamp, user_id long, event_id long, event_type string, value double"

    def source():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    views = (
        source()
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        source()
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    name = f"ij_late_{uuid.uuid4().hex[:8]}"
    q = (
        attribution_join(views, purchases)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    pairs = {(r.view_id, r.purchase_id) for r in rows}
    assert (200, 201) in pairs, rows  # on-time pair emitted
    assert (100, 101) not in pairs, rows  # late pair suppressed


def test_streaming_temporal_enrich_oracle_parity(spark, sf_dir):
    """Stream-side AS-OF dimension lookup equals the batch temporal
    join oracle (AvailableNow + complete mode = batch semantics)."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["streaming_temporal_enrich"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["streaming_temporal_enrich"],
        sf_dir,
        "streaming_temporal_enrich",
    )
    # the promotion is visible in the streamed aggregate
    assert any(r.seg_at_event == "PROMOTED" for r in df.collect())


def test_streaming_anomaly_oracle_parity(spark, sf_dir):
    """transformWithState per-user running z-score: the streamed result
    hash-matches the batch window-function oracle."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["streaming_anomaly"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["streaming_anomaly"],
        sf_dir,
        "streaming_anomaly",
    )
    rows = df.collect()
    assert rows, "fixture must produce anomalies (12 expected at sf0.001)"
    assert all(abs(r.z) > 3.0 and r.prior_n >= 20 for r in rows)


def test_streaming_anomaly_batch_split_invariant(spark, sf_dir, tmp_path):
    """Prior-only scoring is prefix-decomposable: a time-ordered feed
    split across micro-batches yields the IDENTICAL anomaly set as the
    single-batch run — the property that makes the operator restartable
    state-wise."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_grpc_spark.catalog import table as _table
    from mapreduce_grpc_spark.streaming.anomaly import run_streaming_anomaly

    # re-shard events into 3 time-ordered files so maxFilesPerTrigger=1
    # forces 3 micro-batches whose union is time-ordered per user
    ev = _table(spark, sf_dir, "events").orderBy("ts", "event_id")
    n = ev.count()
    shard_dir = tmp_path / "evshards"
    rows = ev.collect()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        spark.createDataFrame(rows[cuts[i]:cuts[i + 1]], ev.schema).coalesce(
            1
        ).write.parquet(str(shard_dir / "events.parquet"), mode="append")

    fake_sf = tmp_path / "sf"
    os.makedirs(fake_sf)
    os.symlink(shard_dir / "events.parquet", fake_sf / "events.parquet")

    single = {
        (r.user_id, r.event_id, r.z)
        for r in run_streaming_anomaly(spark, str(fake_sf)).collect()
    }
    multi = {
        (r.user_id, r.event_id, r.z)
        for r in run_streaming_anomaly(
            spark, str(fake_sf), max_files_per_trigger=1
        ).collect()
    }
    assert single == multi and single
