#!/usr/bin/env python
"""Scale datapoint for file-level CoW merge: rewritten/carried
fractions and wall time at 1x vs 10x table size, on a key-clustered
layout vs a round-robin (pruning-hostile) one, plus the sparse
wide-range batch that bounding-box pruning degrades on.

Run from the repo root:  python tools/cow_scale.py [out_dir]
Prints one JSON line:
  {"layouts": {"clustered": {"1x": {...}, "10x": {...}},
               "roundrobin": {...}},
   "sparse": {...}}
per cell: {"files", "rewritten", "carried", "sec"}.

The claim under test (sources/snapshots.py docstring): merge cost is
O(overlapping files + batch) when the table is clustered on the merge
key — so a 10x table with 10x files should rewrite the SAME number of
files for the same narrow batch, and wall time should grow far slower
than 10x.  Round-robin layout is the control: every file overlaps, so
cost tracks table size — the measured gap is the value of clustering.
"""

from __future__ import annotations

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
    merge_upsert_cow,
    read_manifest,
    snap_init,
)

ROWS_1X = 200_000
FILES_1X = 8


def build(spark, path, rows, n_files, clustered):
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % 1000).cast("double").alias("x"),
    )
    part = (
        df.repartitionByRange(n_files, "k").sortWithinPartitions("k")
        if clustered
        else df.repartition(n_files)
    )
    snap_init(spark, part, path, stats_cols=["k"])


def run_merge(spark, path, keys_lo, n_keys):
    updates = spark.createDataFrame(
        [(keys_lo + i, f"U{i}", 0.0) for i in range(n_keys)],
        "k bigint, v string, x double",
    )
    t0 = time.time()
    res = merge_upsert_cow(spark, path, updates, keys=["k"])
    sec = round(time.time() - t0, 2)
    m = read_manifest(path)
    return {
        "files": len(m["files"]),
        "rewritten": res["rewritten"],
        "carried": res["carried"],
        "sec": sec,
    }


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="cow-scale-"
    )
    spark = tune_session(get_spark())
    # warm-up: pay JVM/codegen startup outside the measured cells
    wpath = os.path.join(out_dir, "warmup")
    if os.path.exists(wpath):
        shutil.rmtree(wpath)
    build(spark, wpath, 10_000, 2, clustered=True)
    run_merge(spark, wpath, 5_000, 5)
    shutil.rmtree(wpath)

    result = {"layouts": {}, "sparse": {}}
    for layout in ("clustered", "roundrobin"):
        result["layouts"][layout] = {}
        for mult, tag in ((1, "1x"), (10, "10x")):
            path = os.path.join(out_dir, f"{layout}-{tag}")
            if os.path.exists(path):
                shutil.rmtree(path)
            build(
                spark, path, ROWS_1X * mult, FILES_1X * mult,
                clustered=(layout == "clustered"),
            )
            # narrow 20-key batch in the middle of the keyspace
            cell = run_merge(spark, path, (ROWS_1X * mult) // 2, 20)
            result["layouts"][layout][tag] = cell
            shutil.rmtree(path)

    # sparse wide-range batch at 10x clustered: 2 keys at the extremes —
    # the case bounding-box pruning degrades to a full rewrite on, and
    # per-row-group key-membership pruning must keep at O(keys) files
    path = os.path.join(out_dir, "sparse-10x")
    if os.path.exists(path):
        shutil.rmtree(path)
    build(spark, path, ROWS_1X * 10, FILES_1X * 10, clustered=True)
    updates = spark.createDataFrame(
        [(0, "LO", 0.0), (ROWS_1X * 10 - 1, "HI", 0.0)],
        "k bigint, v string, x double",
    )
    t0 = time.time()
    res = merge_upsert_cow(spark, path, updates, keys=["k"])
    result["sparse"] = {
        "files": FILES_1X * 10,
        "rewritten": res["rewritten"],
        "carried": res["carried"],
        "sec": round(time.time() - t0, 2),
    }
    shutil.rmtree(path)

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
