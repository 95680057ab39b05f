"""Streaming exact deduplication (``dropDuplicatesWithinWatermark``).

A training-data ingest stream re-delivers records: at-least-once sources
(Kafka, file movers, the reference's own retry model — worker re-execution
emits duplicate map output, /root/reference/src/master.h:331-352) all
need a dedup stage.  Batch dedup is ``dedup_exact``; this is its
streaming twin with BOUNDED state: keys older than the watermark are
evicted from the state store, so memory is O(keys per watermark window),
not O(all keys ever seen) — the property that makes streaming dedup
viable at 100 TB/day (plain ``dropDuplicates`` on a stream retains state
forever).

``run_streaming_dedup`` executes to completion with AvailableNow into a
memory sink; on the driver fixtures (unique event_ids) the output equals
the full event set, which the AUX oracle hash-checks; the duplicate
-removal semantics are exercised with synthetic re-deliveries in
``tests/test_streaming.py``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from .events import _events_stream, _stateful_shuffle_partitions

DEDUP_WATERMARK = "2 hours"


def dedup_stream(events: DataFrame) -> DataFrame:
    """Drop re-deliveries of the same event_id within the watermark."""
    return events.withWatermark("ts", DEDUP_WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    with _stateful_shuffle_partitions(spark, cap=8):
        q = (
            dedup_stream(_events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


QUERIES: dict = {}
ORACLES: dict = {}

AUX_QUERIES = {
    "streaming_dedup": run_streaming_dedup,
}

# fixture event_ids are unique, so surviving-row choice is moot and the
# full row set hash-checks against a plain scan (tests/test_sampling.py
# runs AUX oracles; duplicate-removal is tested with synthetic streams)
STREAMING_DEDUP_SQL = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
"""

AUX_ORACLES = {
    "streaming_dedup": STREAMING_DEDUP_SQL,
}
