#!/usr/bin/env python
"""Hidden partitioning (Iceberg-style transforms) in one tour.

Run:  python examples/hidden_partitioning.py

What it demonstrates, end to end:
- `snap_init(..., partition_by=["days(ts)", "bucket(8, user_id)"])`
  declares the layout ONCE; afterwards the user only ever filters on
  the SOURCE columns — the engine derives the partition values, range-
  clusters every write by the tuple, and translates predicates into
  partition pruning behind the scenes.
- `snap_scan([("ts", "between", a, b)])` skips the files whose
  partition stats prove no match — O(matching files) scheduling, the
  100 TB lever — while the exact row filter keeps answers identical
  to an unpartitioned scan.
- Appends (library OR `format("snapshot_table")`) cluster under the
  declared spec automatically.
- `snap_set_partition_spec` EVOLVES the layout metadata-only: old
  files are never mis-pruned (never-reused field ids), and one
  `optimize_snapshot` converges everything to the new spec.
"""

from __future__ import annotations

import datetime
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.snapshots import (
    _bloom_loader,
    optimize_snapshot,
    prune_manifest,
    read_manifest,
    snap_append,
    snap_init,
    snap_scan,
    snap_set_partition_spec,
)


def events(spark, n=5000, days=30, offset=0):
    return spark.range(n).selectExpr(
        f"id + {offset} AS event_id",
        f"timestamp_seconds(1704067200 + CAST(id * ({days} * 86400.0 "
        f"/ {n}) AS BIGINT)) AS ts",
        "CAST(id % 97 AS BIGINT) AS user_id",
        "CAST(id AS DOUBLE) / 7.0 AS value",
    )


def show_prune(path, preds, label):
    m = read_manifest(path)
    kept, skipped = prune_manifest(m, preds, _bloom_loader(path, None))
    print(
        f"  {label}: {len(kept)}/{len(kept) + len(skipped)} files "
        f"scheduled ({len(skipped)} pruned)"
    )


def main() -> None:
    spark = tune_session(get_spark(app_name="hidden-partitioning-example"))
    spark.sparkContext.setLogLevel("ERROR")
    # tiny fixture: stop AQE folding everything into one file so the
    # pruning is visible (at real scale the right-sizing is desirable)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    tmp = tempfile.mkdtemp(prefix="partition-example-")
    path = f"{tmp}/events"
    try:
        # 1. declare the layout once
        snap_init(
            spark,
            events(spark),
            path,
            stats_cols=["event_id"],
            partition_by=["days(ts)", "bucket(8, user_id)"],
        )
        print("declared spec:", [
            f"{s['t']}({s['col']})" for s in read_manifest(path)["partition_spec"]
        ])

        # 2. scan with plain SOURCE-column predicates: pruning is hidden
        day5 = datetime.datetime(2024, 1, 5)
        day7 = datetime.datetime(2024, 1, 7)
        preds = [("ts", "between", day5, day7)]
        show_prune(path, preds, "2-day window")
        n = snap_scan(spark, path, preds).count()
        print(f"  rows: {n} (identical to an unpartitioned filter)")

        # 3. appends cluster under the spec automatically
        snap_append(spark, path, events(spark, n=2000, offset=100_000))
        show_prune(path, preds, "after append")

        # 4. evolve the layout: bucket-by-user becomes primary
        snap_set_partition_spec(path, ["bucket(8, user_id)", "days(ts)"])
        snap_append(spark, path, events(spark, n=2000, offset=200_000))
        u = [("user_id", "=", 42)]
        show_prune(path, u, "user probe (old files conservatively kept)")
        print("  rows:", snap_scan(spark, path, u).count())

        # 5. one OPTIMIZE converges everything to the current spec
        total = sum(e["bytes"] for e in read_manifest(path)["files"])
        optimize_snapshot(spark, path, target_bytes=max(total // 6, 1))
        show_prune(path, u, "user probe after OPTIMIZE")
        print("  rows:", snap_scan(spark, path, u).count())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
