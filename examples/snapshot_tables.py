#!/usr/bin/env python
"""Snapshot-table walkthrough: the engine's table-format layer end to end.

    init      -> versioned table (manifest + footer-stat envelopes)
    merge     -> file-level copy-on-write MERGE (only overlapping files
                 rewritten; the rest carried by reference)
    cdc       -> an I/U/D change batch applied atomically
    optimize  -> compaction + Z-order re-cluster as one CoW commit
    travel    -> read any committed version; a reader that resolved
                 before a commit keeps its consistent view
    txn       -> (stream, batch) markers make ingest replay idempotent
    evolve    -> add-column batches with null backfill of old files
    audit     -> commit history reconstructed from the manifests
    fsck      -> footer-only audit of the current manifest
    expire    -> GC files referenced only by expired versions

Run:  python examples/snapshot_tables.py [work_dir]   (default /tmp)

Every step prints the commit stats the API returns; the same behaviors
are pinned by tests/test_snapshots.py.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.snapshots import (
    apply_cdc_cow,
    current_version,
    expire_snapshots,
    merge_upsert_cow,
    optimize_snapshot,
    snap_init,
    snap_read,
    snapshot_audit,
    verify_snapshot,
)


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    path = os.path.join(work, "snapshot_demo")
    shutil.rmtree(path, ignore_errors=True)

    spark = get_spark(app_name="snapshot-demo")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    # -- init: 100k rows clustered on the key --------------------------
    df = (
        spark.range(100_000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).cast("double").alias("x"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k")
    )
    snap_init(spark, df, path, stats_cols=["k"])
    print(f"v{current_version(path)}: init  {verify_snapshot(path)}")

    # -- CoW merge: touches one key range ------------------------------
    updates = spark.createDataFrame(
        [(k, 0.0, f"U{k}") for k in range(500, 520)],
        "k bigint, x double, v string",
    )
    print("merge:", merge_upsert_cow(spark, path, updates, keys=["k"]))

    # -- CDC batch: update + delete + insert, atomically ---------------
    cdc = spark.createDataFrame(
        [
            (600, 0.0, "C600", "U"),
            (601, None, None, "D"),
            (200_000, 1.0, "NEW", "I"),
        ],
        "k bigint, x double, v string, _op string",
    )
    print("cdc:  ", apply_cdc_cow(spark, path, cdc, keys=["k"]))

    # -- OPTIMIZE: re-cluster on (k, x) as one commit ------------------
    print("optimize:", optimize_snapshot(
        spark, path, target_bytes=512 * 1024, zorder=("k", "x")
    ))

    # -- time travel + reader isolation --------------------------------
    v1 = snap_read(spark, path, version=1)
    cur = snap_read(spark, path)
    print(
        f"time travel: v1 rows={v1.count()} (has k=601: "
        f"{v1.filter(F.col('k') == 601).count() == 1}), "
        f"current rows={cur.count()} (601 deleted: "
        f"{cur.filter(F.col('k') == 601).count() == 0})"
    )

    # -- idempotent ingest: txn markers skip a replayed batch ----------
    replay = spark.createDataFrame(
        [(700, 0.0, "R700", "U")], "k bigint, x double, v string, _op string"
    )
    r1 = apply_cdc_cow(
        spark, path, replay, keys=["k"], txn_app="feed", txn_batch=0
    )
    r2 = apply_cdc_cow(  # crash-replay of the same batch id: skipped
        spark, path, replay, keys=["k"], txn_app="feed", txn_batch=0
    )
    print(f"txn: first={r1['version']} replay_skipped={r2.get('skipped')}")

    # -- schema evolution: the feed starts sending a new column --------
    evolved = spark.createDataFrame(
        [(800, 0.0, "E800", "eu")], "k bigint, x double, v string, region string"
    )
    print("evolve:", merge_upsert_cow(
        spark, path, evolved, keys=["k"], allow_schema_evolution=True
    ), "cols:", snap_read(spark, path).columns)

    # -- audit: commit history reconstructed from the manifests --------
    for e in snapshot_audit(path):
        print(f"  audit v{e['version']}: {e['commit_info']}")

    # -- fsck + GC ------------------------------------------------------
    print("fsck: ", verify_snapshot(path))
    deleted = expire_snapshots(path, keep_last=1, orphan_grace_seconds=0)
    print(f"expire: {len(deleted)} files/manifests GC'd; "
          f"current still reads {snap_read(spark, path).count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
