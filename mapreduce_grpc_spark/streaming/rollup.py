"""Streaming continuous aggregate: events stream -> incremental rollup.

Composes the engine's two halves end-to-end: Structured Streaming
micro-batches on the ingest side, and the mergeable-state rollup
(``sources/maintenance.py``) on the storage side.  Each micro-batch is
folded into the stored rollup inside ``foreachBatch`` — aggregate ONLY
the batch, read back ONLY the touched day partitions, merge the exact
mergeable states (BIGINT counts, DECIMAL sums — associative, so ANY
batch split of the stream yields the identical table), overwrite only
those partitions.  This is the materialized-view maintenance loop of a
streaming warehouse (same design as Delta Live Tables / Flink dynamic
tables), built from parts the engine already verifies separately.

``foreachBatch`` rather than a stateful streaming agg because the state
here must outlive the query and be READABLE mid-stream as a table: the
state IS the stored rollup.  Spark guarantees foreachBatch runs each
epoch exactly once per restart lineage (checkpointed batch ids); the
fold is idempotent per-day only at partition granularity, so the
production deployment pairs it with the snapshot-committed variant
(``rollup_refresh_snap``) when readers race refreshes.

At scale: per micro-batch work = O(batch rows) aggregation + a
partition-pruned read of the touched days — never rollup history; the
stream's watermark bounds nothing here because the fold is exact for
arbitrarily late data (late events simply touch old days, which the
refresh prunes to).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..sources.maintenance import rollup_init, rollup_read, rollup_refresh
from .events import _events_stream, _stateful_shuffle_partitions


def run_streaming_rollup(
    spark: SparkSession,
    sf_dir: str,
    rollup_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> tuple[DataFrame, list[tuple[int, int]]]:
    """Drive the incremental rollup from the events stream to completion.

    ``max_files_per_trigger=1`` forces one micro-batch per source file —
    the multi-batch shape a live stream would have.  Returns the final
    rollup reader view and the per-batch ``(batch_id, touched_days)``
    log so tests can assert the refresh stayed pruned."""
    touched: list[tuple[int, int]] = []

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if os.path.exists(rollup_path):
            n = rollup_refresh(spark, rollup_path, batch_df)
        else:
            rollup_init(spark, batch_df, rollup_path)
            n = batch_df.select(
                batch_df.ts.cast("date")
            ).distinct().count()
        touched.append((batch_id, n))

    with _stateful_shuffle_partitions(spark, cap=8):
        stream = _events_stream(
            spark, sf_dir, max_files_per_trigger=max_files_per_trigger
        )
        q = (
            stream.writeStream.foreachBatch(_fold)
            .option(
                "checkpointLocation",
                os.path.join(checkpoint_dir, f"ckpt-{uuid.uuid4().hex[:8]}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return rollup_read(spark, rollup_path), touched
