#!/usr/bin/env python
"""Measure hidden partitioning: pruning effectiveness + write cost.

Builds the same events-shaped table twice at a replicated scale —
once unpartitioned (plain append layout), once with
``partition_by=["days(ts)", "bucket(16, user_id)"]`` — then times a
one-day scan and a (day-range AND user) point-slice on both, printing
files kept/skipped and wall time, plus the one-time write cost of the
clustering shuffle.

Usage: python tools/partition_scale.py [replication, default 20]
"""

from __future__ import annotations

import datetime
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import table
from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.snapshots import (
    _bloom_loader,
    optimize_snapshot,
    prune_manifest,
    read_manifest,
    snap_append,
    snap_init,
    snap_scan,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark(app_name="partition-scale")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    ev = table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    reps = spark.range(rep).select(F.col("id").alias("rep"))
    big = (
        ev.crossJoin(F.broadcast(reps))
        .withColumn(
            "event_id", F.col("event_id") * rep + F.col("rep")
        )
        .drop("rep")
    )
    n = big.count()
    print(f"rows: {n}")

    tmp = tempfile.mkdtemp(prefix="part-scale-")
    flat, part = os.path.join(tmp, "flat"), os.path.join(tmp, "part")
    try:
        # the flat baseline gets the SAME file count via a plain hash
        # scatter (realistic ingest arrival order) so the comparison
        # isolates pruning, not file-count effects
        t0 = time.perf_counter()
        snap_init(
            spark, big.repartition(16), flat, stats_cols=["event_id"]
        )
        t_flat = time.perf_counter() - t0
        t0 = time.perf_counter()
        snap_init(
            spark, big, part, stats_cols=["event_id"],
            partition_by=["days(ts)", "bucket(16, user_id)"],
        )
        t_part = time.perf_counter() - t0
        print(
            f"write: flat {t_flat:.2f}s, partitioned {t_part:.2f}s "
            f"({t_part / t_flat:.2f}x — the clustering shuffle)"
        )

        day = datetime.datetime(2024, 1, 9)
        cases = {
            "one-day scan": [
                ("ts", "between", day, day + datetime.timedelta(days=1))
            ],
            "day+user slice": [
                ("ts", "between", day, day + datetime.timedelta(days=2)),
                ("user_id", "=", 42),
            ],
        }
        for label, preds in cases.items():
            for name, path in (("flat", flat), ("part", part)):
                m = read_manifest(path)
                kept, skipped = prune_manifest(
                    m, preds, _bloom_loader(path, None)
                )
                t0 = time.perf_counter()
                c = snap_scan(spark, path, preds).count()
                dt = time.perf_counter() - t0
                print(
                    f"{label:15s} {name:5s}: kept {len(kept):3d}/"
                    f"{len(kept) + len(skipped):3d} files, {c} rows, "
                    f"{dt:.2f}s"
                )

        # partition-aware OPTIMIZE (r11 _compact_partitioned): first,
        # simulate streaming small-file accretion — two tiny single-day
        # appends per day for 8 days — then compact under a budget
        # implying ONE global output file.  Small files must merge
        # WITHIN their day, the already-clustered bulk must demote to
        # carry (not re-smear), and the one-day kept ratio must hold.
        day0 = datetime.datetime(2024, 1, 1)
        one = datetime.timedelta(days=1)
        for d in range(8):
            lo = day0 + one * d
            sl = (
                big.filter(
                    (F.col("ts") >= lo) & (F.col("ts") < lo + one)
                )
                .limit(4000)
                .coalesce(1)
            )
            for _rep in range(2):
                snap_append(spark, part, sl)
        m0 = read_manifest(part)
        t0 = time.perf_counter()
        res = optimize_snapshot(spark, part, target_bytes=4 << 20)
        t_opt = time.perf_counter() - t0
        m1 = read_manifest(part)
        preds = cases["one-day scan"]
        kept, skipped = prune_manifest(
            m1, preds, _bloom_loader(part, None)
        )
        t0 = time.perf_counter()
        c = snap_scan(spark, part, preds).count()
        dt = time.perf_counter() - t0
        print(
            f"optimize(4MB):    {len(m0['files'])} -> "
            f"{len(m1['files'])} files in {t_opt:.2f}s (rewritten "
            f"{res['rewritten']}, carried {res['carried']}); one-day "
            f"scan after: kept {len(kept)}/{len(kept) + len(skipped)} "
            f"files, {c} rows, {dt:.2f}s"
        )
        # idempotence: nothing left to gain, nothing rewritten
        res2 = optimize_snapshot(spark, part, target_bytes=4 << 20)
        print(
            f"optimize again:   rewritten {res2['rewritten']} "
            f"(idempotent no-op)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
