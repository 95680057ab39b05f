#!/usr/bin/env python
"""Scale datapoint for incremental materialized-view refresh: wall time
at 1x vs 10x SOURCE size for the SAME-sized change batch, vs the full
recompute each refresh replaces.

Run from the repo root:  python tools/mv_scale.py
Prints one JSON line:
  {"refresh": {"1x": sec, "10x": sec, "ratio": r},
   "recompute": {"1x": sec, "10x": sec, "ratio": r},
   "touched": {"1x": n, "10x": n}}

The claim under test (sources/matview.py docstring): refresh work is
O(changed rows + touched groups + overlapping MV files), INDEPENDENT of
source size — so a 10x source with the same 2k-row CDC batch should
refresh in ~1x time, while the full GROUP BY recompute it replaces
tracks source size.  The change feed reads only the commit's rewritten
file slice (clustered layout keeps that slice narrow), so neither the
delta aggregation nor the MV CoW commit ever scans the full source.
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
from mapreduce_grpc_spark.sources.matview import mv_init, mv_refresh
from mapreduce_grpc_spark.sources.snapshots import apply_cdc_cow, snap_init, snap_read

ROWS_1X = 200_000
FILES_1X = 8
BATCH = 2_000  # same absolute batch size at both scales
N_GROUPS = 500


def build(spark, path, rows, n_files):
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % N_GROUPS).cast("string").alias("g"),
        (F.col("id") % 1000).cast("double").alias("x"),
    )
    snap_init(
        spark,
        df.repartitionByRange(n_files, "k").sortWithinPartitions("k"),
        path,
        stats_cols=["k"],
    )


def cell(spark, scale):
    rows, files = ROWS_1X * scale, FILES_1X * scale
    tmp = tempfile.mkdtemp(prefix=f"mv-scale-{scale}x-")
    src, mv = os.path.join(tmp, "src"), os.path.join(tmp, "mv")
    try:
        build(spark, src, rows, files)
        mv_init(spark, src, mv, dims=["g"], agg_col="x")
        # one clustered 2k-key batch: updates moving rows between groups
        batch = spark.range(BATCH).select(
            F.col("id").alias("k"),
            F.concat(F.lit("moved"), (F.col("id") % 7)).alias("g"),
            F.lit(9.5).alias("x"),
            F.lit("U").alias("_op"),
        )
        apply_cdc_cow(spark, src, batch, keys=["k"])

        t0 = time.time()
        res = mv_refresh(spark, src, mv, keys=["k"], dims=["g"], agg_col="x")
        refresh_s = time.time() - t0

        t0 = time.time()
        snap_read(spark, src).groupBy("g").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("x").cast("decimal(38,6)")).alias("s"),
        ).write.mode("overwrite").parquet(os.path.join(tmp, "full"))
        recompute_s = time.time() - t0
        return refresh_s, recompute_s, res["touched"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    spark = tune_session(get_spark())
    cell(spark, 1)  # warmup: JVM/codegen first-call costs out of the 1x cell
    r1, f1, t1 = cell(spark, 1)
    r10, f10, t10 = cell(spark, 10)
    print(
        json.dumps(
            {
                "refresh": {
                    "1x": round(r1, 2),
                    "10x": round(r10, 2),
                    "ratio": round(r10 / r1, 2),
                },
                "recompute": {
                    "1x": round(f1, 2),
                    "10x": round(f10, 2),
                    "ratio": round(f10 / f1, 2),
                },
                "touched": {"1x": t1, "10x": t10},
            }
        )
    )


if __name__ == "__main__":
    main()
