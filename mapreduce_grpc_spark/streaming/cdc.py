"""Streaming CDC ingestion: change stream -> snapshot table.

The companion to ``streaming/rollup.py`` on the mutation side: a
Debezium/DMS-shaped change feed (rows tagged I/U/D with a monotonic
``seq``) streams in micro-batches, and each batch lands on the snapshot
table (``sources/snapshots.py``) as ONE file-level copy-on-write commit
— readers see batch boundaries, never partial batches, and every commit
is time-travel auditable (version N = state after batch N).

**Restart safety** (the Delta ``txnAppId``/``txnVersion`` idempotence
rule): the checkpoint location is persistent and caller-named — NOT
regenerated per invocation — and every commit carries a
``(stream_id, batch_id)`` marker folded into the manifest's ``txns``
map.  A crashed-and-restarted ingest therefore cannot double-apply a
batch: Structured Streaming replays the failed micro-batch with the
SAME ``batch_id``, and ``apply_cdc_cow`` skips any marker the manifest
already records — final state AND the version audit trail are identical
to a crash-free run.  The audit log returned is reconstructed from the
manifests (``snapshot_audit``), never from driver memory, so it too
survives restarts.

Per micro-batch the feed is first COLLAPSED to its final per-key state
(row_number over seq descending — a key touched five times in a batch
lands once), which both satisfies ``apply_cdc_cow``'s one-op-per-key
contract and is the standard CDC compaction step.  A delete followed by
re-insert within one batch correctly nets out to the insert; an update
followed by delete nets to the delete.

At 100 TB: work per batch = key-statistics pruning (driver-side
manifest check) + rewrite of overlapping files only; keeping the table
clustered on the key (``optimize_snapshot(zorder=...)`` between
batches, or the ``auto_compact_files`` policy here) is what keeps the
overlap small.  The reference engine has no notion of mutation at all —
its output contract is write-once text buckets
(/root/reference/src/mr_tasks.h:131-174).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.snapshots import apply_cdc_cow, auto_compact, snapshot_audit


def collapse_cdc_batch(
    batch: DataFrame, keys: list[str], seq_col: str = "seq",
    op_col: str = "_op",
) -> DataFrame:
    """Final per-key state of a CDC slice: keep each key's highest-seq
    event (ties break on op for determinism)."""
    w = Window.partitionBy(*keys).orderBy(
        F.desc(seq_col), F.desc(op_col)
    )
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", seq_col)
    )


def run_streaming_cdc(
    spark: SparkSession,
    cdc_dir: str,
    table_path: str,
    keys: list[str],
    checkpoint_dir: str,
    stream_id: str = "cdc",
    max_files_per_trigger: int = 1,
    auto_compact_files: int | None = None,
    mor_deletes: bool = False,
) -> list[dict]:
    """Stream a directory-shaped CDC feed into the snapshot table.

    One ``apply_cdc_cow`` commit per non-empty micro-batch, marked with
    ``(stream_id, batch_id)`` for idempotent replay; the checkpoint at
    ``checkpoint_dir/stream_id`` is persistent, so re-invoking with the
    same arguments resumes exactly where the last (possibly crashed) run
    stopped.  With ``auto_compact_files`` set, the compaction policy
    runs after each applied batch to bound small-file accretion (and,
    with ``mor_deletes=True``, to fold accumulated deletion vectors —
    deletes landing outside the upsert-touched files then cost a
    sidecar append per batch instead of a file rewrite).
    Returns this stream's commit history reconstructed from the table's
    manifests (the restart-proof ingest audit log)."""
    schema = spark.read.parquet(cdc_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(cdc_dir)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        final = collapse_cdc_batch(batch_df, keys)
        apply_cdc_cow(
            spark, table_path, final, keys,
            txn_app=stream_id, txn_batch=batch_id,
            mor_deletes=mor_deletes,
        )
        if auto_compact_files is not None:
            auto_compact(spark, table_path, max_files=auto_compact_files)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option(
            "checkpointLocation", os.path.join(checkpoint_dir, stream_id)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [
        e
        for e in snapshot_audit(table_path)
        if e["commit_info"].get("txn", {}).get("app") == stream_id
    ]
