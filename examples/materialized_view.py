#!/usr/bin/env python
"""Incremental materialized-view walkthrough: change data feed end to end.

    init     -> source snapshot table (clustered on the key)
    mv_init  -> GROUP BY dim -> (cnt, exact DECIMAL sum) materialized as
                its own snapshot table, recording the source version as
                its refresh high-water mark
    mutate   -> CDC batches land on the source as CoW commits
    refresh  -> ONE mv_refresh folds every commit since the high-water
                mark via the manifest-derived change feed (preimages
                subtract, postimages add) — work is O(changed rows +
                touched groups), independent of source size
    verify   -> the refreshed MV equals a from-scratch recompute
    replay   -> a second refresh at the same source version is a skip
                (the MV's manifest txn marker — exactly-once)

Run:  python examples/materialized_view.py [work_dir]   (default /tmp)

The same behaviors are pinned by tests/test_snapshots.py; the benched
`matview_orders` query is this walkthrough in hash-checked form.
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
from mapreduce_grpc_spark.sources.matview import mv_init, mv_read, mv_refresh
from mapreduce_grpc_spark.sources.snapshots import apply_cdc_cow, snap_init, snap_read


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    src = os.path.join(work, "mv_demo_src")
    mvp = os.path.join(work, "mv_demo_mv")
    for p in (src, mvp):
        shutil.rmtree(p, ignore_errors=True)

    spark = get_spark(app_name="matview-demo")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    # -- source: 50k keyed rows with a 7-way dimension -----------------
    base = spark.range(50_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.col("id") % 7).alias("dim"),
        (F.col("id") % 100).cast("double").alias("val"),
    )
    snap_init(
        spark, base.repartitionByRange(4, "k"), src, stats_cols=["k"]
    )
    mv_init(spark, src, mvp, dims=["dim"], agg_col="val")
    print("mv v1:", sorted(
        (r.dim, r.cnt, float(r.sum_val)) for r in mv_read(spark, mvp).collect()
    )[:3], "...")

    # -- two CDC commits: updates move keys between dims, deletes, and
    #    inserts that BIRTH a new dim -----------------------------------
    b1 = spark.createDataFrame(
        [(0, "d9", 500.0, "U"), (1, None, None, "D"), (2, "d9", 1.0, "U")],
        "k bigint, dim string, val double, _op string",
    )
    b2 = spark.createDataFrame(
        [(90_000, "d9", 2.5, "I"), (3, None, None, "D")],
        "k bigint, dim string, val double, _op string",
    )
    print("cdc 1:", apply_cdc_cow(spark, src, b1, keys=["k"]))
    print("cdc 2:", apply_cdc_cow(spark, src, b2, keys=["k"]))

    # -- one refresh folds BOTH commits' change feeds ------------------
    print("refresh:", mv_refresh(
        spark, src, mvp, keys=["k"], dims=["dim"], agg_col="val"
    ))

    # -- the incremental MV equals a full recompute --------------------
    mv = {
        (r.dim): (r.cnt, float(r.sum_val))
        for r in mv_read(spark, mvp).collect()
    }
    full = {
        (r.dim): (r.cnt, float(r.sum_val))
        for r in snap_read(spark, src)
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("val").cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .alias("sum_val"),
        )
        .collect()
    }
    print(f"incremental == recompute: {mv == full}; born dim d9 = {mv['d9']}")

    # -- replayed refresh at the same source version: a skip -----------
    print("replay:", mv_refresh(
        spark, src, mvp, keys=["k"], dims=["dim"], agg_col="val"
    ))
    spark.stop()


if __name__ == "__main__":
    main()
