#!/usr/bin/env python
"""Scale datapoint for incremental clustering: per-run cost stays
budget-bounded (not table-bounded) while range pruning converges, at
1x vs 10x table size.

Run from the repo root:  python tools/cluster_scale.py
Prints one JSON line:
  {"1x": {...}, "10x": {"rows", "files0", "kept0_frac",
   "runs": [{"rewritten", "sec"}...], "kept1_frac", "full_zorder_sec"}}

The claim under test (optimize_incremental docstring): each run's
rewrite is bounded by max_rewrite_bytes regardless of table size — the
alternative (optimize_snapshot zorder) rewrites the whole table, and
its cost column grows with the table while the incremental runs' does
not.
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
    optimize_incremental,
    prune_manifest,
    read_manifest,
    snap_init,
)

PROBE = ("k", "between", 100, 150)


def _mk(spark, path, n, n_files):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("v"),
    ).repartition(n_files)
    snap_init(spark, df, path, stats_cols=["k"])


def _kept_frac(path):
    m = read_manifest(path)
    kept, _ = prune_manifest(m, [PROBE])
    return len(kept) / len(m["files"])


def _bench(spark, n, n_files):
    d = tempfile.mkdtemp(prefix="clus-")
    path = os.path.join(d, "t")
    _mk(spark, path, n, n_files)
    total = sum(
        os.path.getsize(os.path.join(path, e["name"]))
        for e in read_manifest(path)["files"]
    )
    budget = max(total // 8, 1)  # fixed FRACTION so runs stay bounded
    out = {
        "rows": n,
        "files0": n_files,
        "kept0_frac": round(_kept_frac(path), 2),
        "runs": [],
    }
    for _ in range(6):
        t0 = time.time()
        res = optimize_incremental(
            spark, path, ["k"],
            target_bytes=max(budget // 2, 1), max_rewrite_bytes=budget,
        )
        dt = time.time() - t0
        if res["rewritten"] == 0:
            break
        out["runs"].append(
            {"rewritten": res["rewritten"], "sec": round(dt, 2)}
        )
    out["kept1_frac"] = round(_kept_frac(path), 2)

    # the full-rewrite alternative (unbounded budget = whole table in
    # one run), for the cost comparison column
    d2 = tempfile.mkdtemp(prefix="clusz-")
    p2 = os.path.join(d2, "t")
    _mk(spark, p2, n, n_files)
    t0 = time.time()
    optimize_incremental(
        spark, p2, ["k"],
        target_bytes=max(total // n_files, 1),
        max_rewrite_bytes=total * 2,
    )
    out["full_zorder_sec"] = round(time.time() - t0, 2)
    shutil.rmtree(d)
    shutil.rmtree(d2)
    return out


def main() -> None:
    spark = get_spark(app_name="cluster-scale")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    _bench(spark, 20_000, 4)  # warm
    print(
        json.dumps(
            {
                "1x": _bench(spark, 200_000, 8),
                "10x": _bench(spark, 2_000_000, 80),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
