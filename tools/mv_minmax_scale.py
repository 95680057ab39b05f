#!/usr/bin/env python
"""Scale datapoint for min/max materialized-view refresh: wall time at
1x vs 10x SOURCE size for the SAME-sized change batch, split by whether
the batch kills group extrema.

Run from the repo root:  python tools/mv_minmax_scale.py
Prints one JSON line:
  {"no_extremum_death": {"1x": sec, "10x": sec, "recomputed": 0},
   "extremum_death":    {"1x": sec, "10x": sec,
                          "recomputed_1x": n, "recomputed_10x": n}}

The claim under test (sources/matview.py docstring): min/max merge
incrementally on inserts, so a refresh whose deletes never beat a
stored extremum is as flat across source scale as the count/sum-only
view; when extrema DO die, only the affected groups are recomputed —
through snap_scan's dim-IN pruning — so the recompute cost tracks
affected-group data, not source size.
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
from mapreduce_grpc_spark.sources.snapshots import apply_cdc_cow, snap_init

ROWS_1X = 200_000
FILES_1X = 8
BATCH = 2_000
N_GROUPS = 500

AGGS = {
    "cnt": ("count", None),
    "total": ("sum", "x"),
    "lo": ("min", "x"),
    "hi": ("max", "x"),
}


def build(spark, path, rows, n_files):
    # x = (k % 1000) + 1 and g = k % 500: group g holds exactly two x
    # values, g+1 (its min) and g+501 (its max) — extrema are KNOWN, so
    # the death batch below can target them deterministically
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % N_GROUPS).cast("string").alias("g"),
        ((F.col("id") % 1000) + 1).cast("double").alias("x"),
    )
    snap_init(
        spark,
        df.repartitionByRange(n_files, "k").sortWithinPartitions("k"),
        path,
        stats_cols=["k", "g"],
    )


def one_scale(spark, root, factor):
    src = os.path.join(root, f"src{factor}")
    mv = os.path.join(root, f"mv{factor}")
    rows = ROWS_1X * factor
    build(spark, src, rows, FILES_1X * factor)
    mv_init(spark, src, mv, dims=["g"], aggs=AGGS)

    # batch A: pure inserts with mid-range values — min/max merge
    # forward (least/greatest), NOTHING recomputes, and the batch is
    # the same absolute size at both scales
    a = spark.range(BATCH).select(
        (F.col("id") + rows).alias("k"),
        ((F.col("id") + rows) % N_GROUPS).cast("string").alias("g"),
        F.lit(500.5).alias("x"),
        F.lit("U").alias("_op"),
    )
    apply_cdc_cow(spark, src, a, keys=["k"])
    t0 = time.monotonic()
    res_a = mv_refresh(spark, src, mv, keys=["k"], dims=["g"], aggs=AGGS)
    t_a = time.monotonic() - t0

    # batch B: delete one holder of group g's max (k = g+500 has
    # x = g+501) for 40 groups -> exactly those extrema die (ties are
    # conservatively recomputed) and must be recomputed from the source
    b = spark.range(40).select(
        (F.col("id") + 500).alias("k"),
        F.lit(None).cast("string").alias("g"),
        F.lit(None).cast("double").alias("x"),
        F.lit("D").alias("_op"),
    )
    apply_cdc_cow(spark, src, b, keys=["k"])
    t0 = time.monotonic()
    res_b = mv_refresh(spark, src, mv, keys=["k"], dims=["g"], aggs=AGGS)
    t_b = time.monotonic() - t0
    return {
        "flat_sec": round(t_a, 2),
        "flat_recomputed": res_a["recomputed_groups"],
        "death_sec": round(t_b, 2),
        "death_recomputed": res_b["recomputed_groups"],
    }


def main():
    spark = tune_session(get_spark(app_name="mv-minmax-scale"))
    root = tempfile.mkdtemp(prefix="mvmm-")
    try:
        r1 = one_scale(spark, root, 1)
        r10 = one_scale(spark, root, 10)
        print(
            json.dumps(
                {
                    "no_extremum_death": {
                        "1x": r1["flat_sec"],
                        "10x": r10["flat_sec"],
                        "recomputed": [
                            r1["flat_recomputed"],
                            r10["flat_recomputed"],
                        ],
                    },
                    "extremum_death": {
                        "1x": r1["death_sec"],
                        "10x": r10["death_sec"],
                        "recomputed_1x": r1["death_recomputed"],
                        "recomputed_10x": r10["death_recomputed"],
                    },
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
