#!/usr/bin/env python
"""Table-to-table streaming demo: a snapshot table as BOTH ends of a
Structured Streaming pipeline.

    events (snapshot table, append-only ingest)
      --readStream format="snapshot_table"-->        (offsets = versions)
    per-source running counts
      --foreachBatch + snap_append(txn markers)-->   (exactly-once)
    counts (snapshot table, one commit per micro-batch)

Run:  python examples/streaming_lakehouse.py

What it demonstrates, end to end:
- `snap_append` commits land while the stream is (re)started; each
  availableNow pass picks up exactly the unconsumed versions from the
  checkpoint (no replay, no loss — shown by re-running the pass after
  more appends).
- The source plans per-file partitions from manifests (driver-side
  JSON) and executors read Arrow batches — check `.explain` on a real
  cluster to see no driver data path.
- The sink composes `foreachBatch` with `snap_append`'s
  ``(txn_app, txn_batch)`` idempotence markers, so a replayed
  micro-batch cannot double-append: streaming in AND out of the table
  layer is exactly-once together.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark
from mapreduce_grpc_spark.sources.snapshots import (
    snap_append,
    snap_init,
    snap_read,
    snapshot_audit,
)
from mapreduce_grpc_spark.sources.stream_source import (
    SnapshotTableStreamSource,
)


def main() -> None:
    spark = get_spark(app_name="streaming-lakehouse-demo", cpus=4,
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(SnapshotTableStreamSource)
    work = tempfile.mkdtemp(prefix="stream-lakehouse-")
    src = f"{work}/events"
    dst = f"{work}/counts"
    ck = f"{work}/ck"

    def batch(rows):
        return spark.createDataFrame(rows, "event_id long, source string")

    snap_init(spark, batch([(i, f"s{i % 3}") for i in range(30)]), src,
              stats_cols=["event_id"])
    snap_init(
        spark,
        spark.createDataFrame([], "source string, n long, batch_id long"),
        dst,
        stats_cols=["source"],
    )

    def drain(label: str) -> None:
        stream = (
            spark.readStream.format("snapshot_table")
            .option("path", src)
            .load()
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
        )

        def sink(bdf, bid):
            out = bdf.select(
                "source", "n", F.lit(bid).cast("long").alias("batch_id")
            )
            snap_append(
                spark, dst, out, txn_app="demo-sink", txn_batch=bid
            )

        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        latest = (
            snap_read(spark, dst)
            .orderBy(F.desc("batch_id"))
            .limit(3)
            .collect()
        )
        print(f"[{label}] counts table now: "
              f"{[(r.source, r.n) for r in latest]}")

    drain("initial")
    snap_append(spark, src, batch([(100 + i, "s0") for i in range(5)]))
    snap_append(spark, src, batch([(200 + i, "s9") for i in range(2)]))
    drain("after 2 appends")
    drain("drained (no new versions)")

    # the NATIVE sink: row-level table-to-table pipeline as ONE
    # streaming query — no foreachBatch, one txn-marked append commit
    # per micro-batch, with per-row commit provenance
    mirror = f"{work}/mirror"
    snap_init(
        spark,
        spark.createDataFrame(
            [], "event_id long, source string, _commit_version long"
        ),
        mirror,
        stats_cols=["event_id"],
    )
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", src)
        .option("withCommitVersion", "true")
        .load()
        .filter(F.col("source") != "s9")
        .writeStream.format("snapshot_table")
        .option("path", mirror)
        .option("txnAppId", "mirror-pipe")
        .option("checkpointLocation", f"{work}/ck2")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    mrows = snap_read(spark, mirror)
    print(
        "native-sink mirror:", mrows.count(), "rows;",
        "source versions seen:",
        sorted(
            r._commit_version
            for r in mrows.select("_commit_version").distinct().collect()
        ),
    )

    print("source audit:")
    for a in snapshot_audit(src):
        print("  ", a["version"], a["commit_info"].get("op", "init"),
              a["rows"], "rows")
    shutil.rmtree(work)
    spark.stop()


if __name__ == "__main__":
    main()
