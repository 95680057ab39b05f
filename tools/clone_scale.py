"""Scale probe for shallow CLONE (snap_clone): the zero-copy claim,
measured.

Builds a source table with many files, then times:
- snap_clone itself (must be manifest-only — no data bytes move, so
  wall time must not scale with data size);
- a clone read vs a source read (same files, same plan);
- a small CoW merge on the clone (divergence cost = the merge's own
  cost, source untouched);
- expire_snapshots on the source with a live clone registered (the
  _clone_protected walk is O(clone versions x files) driver JSON).

Usage: python tools/clone_scale.py [--rows 400000] [--files 64]
Prints one JSON line.
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--files", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mapreduce_grpc_spark.sources.snapshots import (
        expire_snapshots,
        merge_upsert_cow,
        read_manifest,
        snap_clone,
        snap_init,
        snap_read,
        update_where,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("clone-scale")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    tmp = tempfile.mkdtemp(prefix="clone-scale-")
    src = os.path.join(tmp, "src")
    dst = os.path.join(tmp, "dst")
    out: dict = {"rows": args.rows, "files": args.files}
    try:
        df = (
            spark.range(args.rows)
            .select(
                F.col("id").alias("k"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
            .repartitionByRange(args.files, "k")
            .sortWithinPartitions("k")
        )
        t0 = time.time()
        snap_init(spark, df, src, stats_cols=["k"])
        out["init_s"] = round(time.time() - t0, 3)
        out["src_files"] = len(read_manifest(src)["files"])

        t0 = time.time()
        snap_clone(src, dst)
        out["clone_s"] = round(time.time() - t0, 3)
        out["clone_data_files_on_disk"] = len(
            [n for n in os.listdir(dst) if n.startswith("data-")]
        )

        t0 = time.time()
        n = snap_read(spark, dst).count()
        out["clone_read_s"] = round(time.time() - t0, 3)
        assert n == args.rows
        t0 = time.time()
        snap_read(spark, src).count()
        out["src_read_s"] = round(time.time() - t0, 3)

        batch = spark.range(1000).select(
            F.col("id").alias("k"), F.lit("patched").alias("v")
        )
        t0 = time.time()
        merge_upsert_cow(spark, dst, batch, keys=["k"])
        out["clone_merge_s"] = round(time.time() - t0, 3)

        # source rewrites everything, then GC with a live clone
        update_where(spark, src, [("k", ">=", 0)], {"v": "'x'"})
        t0 = time.time()
        deleted = expire_snapshots(
            src, keep_last=1, orphan_grace_seconds=0
        )
        out["src_gc_with_live_clone_s"] = round(time.time() - t0, 3)
        out["src_gc_deleted"] = len(
            [d for d in deleted if d.startswith("data-")]
        )
        n = snap_read(spark, dst).count()
        out["clone_rows_after_src_gc"] = n
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
