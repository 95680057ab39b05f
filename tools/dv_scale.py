#!/usr/bin/env python
"""Scale datapoint for merge-on-read deletes: a narrow delete's wall
time and write amplification under deletion vectors vs copy-on-write
rewrite, at 1x vs 10x table size, plus the read-side overhead a DV
adds to a full scan.

Run from the repo root:  python tools/dv_scale.py [out_dir]
Prints one JSON line:
  {"delete": {"mor": {"1x": {...}, "10x": {...}},
              "cow": {"1x": {...}, "10x": {...}}},
   "scan": {"clean_sec", "dv_sec", "rows"}}
per delete cell: {"sec", "bytes_written", "files_rewritten"}.

The claim under test (sources/snapshots.py docstring): a MoR delete's
write cost is O(matched positions) — a few-KB sidecar — independent of
table size, while the CoW path rewrites every overlapping file, so its
cost tracks file size.  The scan cell bounds the read-side debt: the
anti-join applies only to DV'd files.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.snapshots import (
    delete_keys_mor,
    merge_upsert_cow,
    snap_init,
    snap_read,
)

ROWS_1X = 200_000
FILES_1X = 8
N_DELETE = 20


def build(spark, path, rows, n_files):
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % 1000).cast("double").alias("x"),
    )
    snap_init(
        spark,
        df.repartitionByRange(n_files, "k").sortWithinPartitions("k"),
        path,
        stats_cols=["k"],
    )


def dir_bytes(path):
    return {
        os.path.basename(p): os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "*.parquet"))
    }


def cell_mor(spark, path, rows):
    keys = spark.createDataFrame(
        [(rows // 2 + i,) for i in range(N_DELETE)], "k: bigint"
    )
    before = dir_bytes(path)
    t0 = time.time()
    delete_keys_mor(spark, path, keys, ["k"])
    sec = round(time.time() - t0, 2)
    after = dir_bytes(path)
    new = {n: b for n, b in after.items() if n not in before}
    return {
        "sec": sec,
        "bytes_written": sum(new.values()),
        "files_rewritten": sum(1 for n in new if n.startswith("data-")),
    }


def cell_cow(spark, path, rows):
    # CoW "delete" = merge that rewrites the overlapping file minus the
    # keys (the pre-DV way to remove rows: rewrite without them); the
    # honest comparable is the rewrite cost of one overlapping file
    updates = spark.createDataFrame(
        [(rows // 2 + i, "DEAD", 0.0) for i in range(N_DELETE)],
        "k bigint, v string, x double",
    )
    before = dir_bytes(path)
    t0 = time.time()
    merge_upsert_cow(spark, path, updates, keys=["k"])
    sec = round(time.time() - t0, 2)
    after = dir_bytes(path)
    new = {n: b for n, b in after.items() if n not in before}
    return {
        "sec": sec,
        "bytes_written": sum(new.values()),
        "files_rewritten": sum(1 for n in new if n.startswith("data-")),
    }


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="dv-scale-"
    )
    spark = tune_session(get_spark())
    wpath = os.path.join(out_dir, "warmup")
    if os.path.exists(wpath):
        shutil.rmtree(wpath)
    build(spark, wpath, 10_000, 2)
    cell_mor(spark, wpath, 10_000)
    shutil.rmtree(wpath)

    result = {"delete": {"mor": {}, "cow": {}}, "scan": {}}
    for mode, cell in (("mor", cell_mor), ("cow", cell_cow)):
        for mult, tag in ((1, "1x"), (10, "10x")):
            path = os.path.join(out_dir, f"{mode}-{tag}")
            if os.path.exists(path):
                shutil.rmtree(path)
            build(spark, path, ROWS_1X * mult, FILES_1X * mult)
            result["delete"][mode][tag] = cell(
                spark, path, ROWS_1X * mult
            )
            shutil.rmtree(path)

    # read-side debt: full-scan count on a clean 10x table vs the same
    # table with one file's worth of rows masked
    path = os.path.join(out_dir, "scan-10x")
    if os.path.exists(path):
        shutil.rmtree(path)
    build(spark, path, ROWS_1X * 10, FILES_1X * 10)
    t0 = time.time()
    n_clean = snap_read(spark, path).count()
    clean_sec = round(time.time() - t0, 2)
    keys = spark.createDataFrame(
        [(i,) for i in range(0, ROWS_1X * 10, 100)], "k: bigint"
    )  # 1% of rows, spread over every file
    delete_keys_mor(spark, path, keys, ["k"])
    t0 = time.time()
    n_dv = snap_read(spark, path).count()
    dv_sec = round(time.time() - t0, 2)
    result["scan"] = {
        "clean_sec": clean_sec,
        "dv_sec": dv_sec,
        "rows_clean": n_clean,
        "rows_dv": n_dv,
    }
    shutil.rmtree(path)

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
