"""Streaming event-window queries (readStream -> window agg -> sink).

The reference is strictly batch (hard map->reduce barrier,
/root/reference/src/master.h:297-299); streaming is a §2.B gap this module
fills with Structured Streaming.  The aggregation logic is shared with the
batch module (``operators.windows``): same ``window()`` /
``session_window()`` operators, which is the point — one definition, two
execution modes.

``run_streaming_tumbling`` executes the stream to completion with
``Trigger.AvailableNow`` (batch-equivalent semantics) into an in-memory
sink and returns the result table, so the driver can hash-check the
streaming engine's output against the same DuckDB oracle as the batch
tumbling query.

At scale: swap the parquet source dir for Kafka/files-arriving, keep the
watermark, and use update/append mode with a real sink; state store
(RocksDB) holds the open windows.
"""

from __future__ import annotations

import os
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum


@contextmanager
def _stateful_shuffle_partitions(spark: SparkSession, cap: int = 32):
    """Pin shuffle partitions for a streaming query's lifetime.

    The state-store partition count is fixed from
    ``spark.sql.shuffle.partitions`` when the first micro-batch plans; an
    externally-created session's default (200) means 200 state tasks per
    batch — for pandas-stateful operators that is 200 Python-worker
    Arrow round-trips.  Sized to the session's core count (capped) and
    restored after the stream finishes (planning happens async after
    ``start()``, so restore must wait for ``awaitTermination``).

    On a real cluster this is a deliberate knob: state partitions should
    track total cores, not the relational shuffle default.

    r15 optimization (guide §2.2 "fewer, larger partitions"): the
    JVM-state callers now pass ``cap=8`` — the same figure the interval
    join measured in r14 and for the same reason: at fixture-scale
    state volume the per-partition state-store commit dominates, and a
    32→8 sweep measured tumbling 3.0→1.2 s, dedup 5.7→1.5 s, enrich
    2.3→1.2 s with identical hashed outputs (cap=4 regressed the
    pandas-stateful queries — below 8 the lost parallelism outweighs
    the saved overhead).  The two PANDAS-stateful callers (sessionize,
    anomaly) pass ``cap=16``: their per-partition cost is a Python
    worker round-trip that overlaps across workers, and the warm
    interleaved A/B put 16 ahead of both 8 and 32 (anomaly 1.7 vs 2.1
    @32; sessionize 2.0 vs 2.2 @8 / 2.6 @32).  The cap still follows
    ``defaultParallelism`` downward, so a low-core driver bench scales
    the same way; deployments size it to state volume / executor
    memory, not core count.
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    target = max(1, min(int(spark.sparkContext.defaultParallelism), cap))
    spark.conf.set("spark.sql.shuffle.partitions", str(target))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


# (path, mtime) -> events schema.  Schema inference for the stream
# reader is a driver-side batch-reader round (~0.11 s measured) paid by
# EVERY streaming query invocation; the schema is scan-layout metadata
# (never data or results), so cache it like the catalog's row-group
# counts.  One entry per path, overwritten on mtime change.
_SCHEMA_CACHE: dict[str, tuple[float, object]] = {}


def _events_schema(spark: SparkSession, path: str):
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        return spark.read.parquet(path).schema  # let Spark raise/resolve
    hit = _SCHEMA_CACHE.get(path)
    if hit is None or hit[0] != mtime:
        _SCHEMA_CACHE[path] = hit = (
            mtime,
            spark.read.parquet(path).schema,
        )
    return hit[1]


def _events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over the events parquet (ns timestamps rebuilt to µs).

    ``max_files_per_trigger`` pins the file source's batching: callers
    whose correctness oracle assumes single-micro-batch processing (the
    interval join's batch self-join oracle) pass a high value so a
    many-file directory-shaped table cannot split across triggers."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = _events_schema(spark, path)
    if os.path.isdir(path):
        # directory-shaped table (the production layout): stream it as-is
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(path)
    else:
        # flat-file fixture: the streaming file source wants a directory,
        # so stream the sf dir with a glob pinned to the events file
        reader = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
        )
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(sf_dir)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # NTZ instants reinterpreted as UTC (session TZ is pinned UTC) —
        # watermarks/event-time ops require the TIMESTAMP type
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_agg(events: DataFrame, with_watermark: bool = False) -> DataFrame:
    """1-hour tumbling aggregation, streaming-safe.

    Same window/grouping as the batch query but without COUNT(DISTINCT)
    (unsupported on streams — the streaming-scale substitute is
    approx_count_distinct, demonstrated in the batch module).
    """
    if with_watermark:
        events = events.withWatermark("ts", "2 hours")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the tumbling window as a stream to completion; return results.

    AvailableNow processes all existing files then stops — the streaming
    engine's answer must equal the batch plan's, which the driver verifies
    against the batch oracle SQL.
    """
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    with _stateful_shuffle_partitions(spark, cap=8):
        q = (
            tumbling_agg(_events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def run_streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: events stream ⋈ customer dimension.

    The canonical streaming-ETL shape — a fact stream joined to a slowly-
    changing dimension read as a static table, then aggregated.  The
    static side is explicitly broadcast: each micro-batch probes the
    hashed dimension locally, no stream-side shuffle for the join (at
    scale the dimension refreshes by re-reading the table between
    triggers; for dimension tables beyond broadcast size, pre-bucket both
    sides).  AvailableNow + complete mode makes the streaming answer
    batch-equivalent, so the same DuckDB join oracle hash-checks it.
    """
    from ..catalog import table

    name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    with _stateful_shuffle_partitions(spark, cap=8):
        cust = table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
        enriched = _events_stream(spark, sf_dir).join(F.broadcast(cust), "user_id")
        agg = enriched.groupBy("segment", "event_type").agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def run_streaming_temporal_enrich(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-side AS-OF dimension lookup: each event resolves the
    dimension VERSION valid at its own event time — the streaming twin
    of the batch ``join_temporal`` and the correct way to enrich a
    stream against a slowly-changing dimension (joining only the
    CURRENT version silently rewrites history for late/replayed
    events).

    The two-version dimension is built with the reusable ``scd2_apply``
    (keys ``c_custkey % 100 < 10`` promoted effective 2024-01-15, mid
    events range) and BROADCASTS; the validity-interval predicate is a
    row-local filter after the hash probe, so the stream never
    shuffles for the join.  AvailableNow + complete mode makes the
    answer batch-equivalent for the DuckDB oracle."""
    from ..catalog import table as _table
    from ..operators.relational import SCD2_HI_DATE, scd2_apply

    name = f"stream_temporal_{uuid.uuid4().hex[:8]}"
    with _stateful_shuffle_partitions(spark, cap=8):
        cust = _table(spark, sf_dir, "customer").select(
            "c_custkey", F.col("c_mktsegment").alias("segment")
        )
        dim = cust.select(
            "c_custkey",
            "segment",
            F.to_date(F.lit("2024-01-01")).alias("valid_from"),
            F.to_date(F.lit(SCD2_HI_DATE)).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        batch = cust.filter(F.col("c_custkey") % 100 < 10).select(
            "c_custkey", F.lit("PROMOTED").alias("segment")
        )
        dim2 = scd2_apply(
            dim, batch, keys=["c_custkey"], attrs=["segment"],
            effective_date="2024-01-15",
        )
        ev = _events_stream(spark, sf_dir)
        joined = ev.join(
            F.broadcast(dim2),
            (ev.user_id == dim2.c_custkey)
            & (ev.ts >= dim2.valid_from.cast("timestamp"))
            & (ev.ts < dim2.valid_to.cast("timestamp")),
        )
        agg = joined.groupBy(
            F.col("segment").alias("seg_at_event"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


QUERIES = {
    "streaming_tumbling": run_streaming_tumbling,
}

# Oracle: the batch tumbling semantics minus the distinct agg — the
# streaming engine's complete-mode output must equal the batch answer.
from ..functions.numeric import dsum_sql  # noqa: E402

STREAMING_TUMBLING_SQL = f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""

STREAMING_ENRICH_SQL = f"""
SELECT c.c_mktsegment AS segment,
       e.event_type,
       count(*) AS n_events,
       {dsum_sql('e.value')} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""

ORACLES = {
    "streaming_tumbling": STREAMING_TUMBLING_SQL,
}

STREAMING_TEMPORAL_ENRICH_SQL = f"""
WITH cust AS (
  SELECT c_custkey, c_mktsegment AS segment FROM customer
),
dim AS (
  SELECT c_custkey, segment,
         DATE '2024-01-01' AS valid_from, DATE '9999-12-31' AS valid_to
  FROM cust WHERE c_custkey % 100 >= 10
  UNION ALL
  SELECT c_custkey, segment, DATE '2024-01-01', DATE '2024-01-15'
  FROM cust WHERE c_custkey % 100 < 10
  UNION ALL
  SELECT c_custkey, 'PROMOTED', DATE '2024-01-15', DATE '9999-12-31'
  FROM cust WHERE c_custkey % 100 < 10
)
SELECT d.segment AS seg_at_event,
       e.event_type,
       count(*) AS n_events,
       {dsum_sql('e.value')} AS sum_value
FROM events e JOIN dim d
  ON e.user_id = d.c_custkey
 AND e.ts >= CAST(d.valid_from AS TIMESTAMP)
 AND e.ts < CAST(d.valid_to AS TIMESTAMP)
GROUP BY 1, 2
"""

AUX_QUERIES = {
    "streaming_enrich": run_streaming_enrich,
    "streaming_temporal_enrich": run_streaming_temporal_enrich,
}

AUX_ORACLES = {
    "streaming_enrich": STREAMING_ENRICH_SQL,
    "streaming_temporal_enrich": STREAMING_TEMPORAL_ENRICH_SQL,
}
