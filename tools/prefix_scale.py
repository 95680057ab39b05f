#!/usr/bin/env python
"""Measure string-prefix data skipping at scale: a URL-keyed snapshot
table (truncate-partitioned + range-clustered by construction), probed
with `source LIKE 'hostNN/%'`-shaped prefixes.

Reports, for each table size: files total, files kept by the prefix
(manifest-level — zero footer reads for the skipped ones), and the
wall time of the pruned scan vs a full-scan-and-filter of the same
predicate.  The at-scale claim is the KEPT RATIO: it is set by the
selectivity of the prefix, not the table size, so the absolute files
skipped grows linearly with the table.

Run from the repo root:
    python tools/prefix_scale.py
Prints one JSON line:
    {"rows": [{"n": N, "files": F, "kept": K,
               "pruned_sec": a, "full_sec": b}, ...]}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.snapshots import (
    prune_manifest,
    read_manifest,
    snap_init,
    snap_scan,
)

SIZES = [100_000, 400_000, 1_600_000]


def main() -> None:
    spark = get_spark()
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    prev = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled", "true"
    )
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    rows_out = []
    try:
        for n in SIZES:
            tmp = tempfile.mkdtemp(prefix="prefix-scale-")
            path = os.path.join(tmp, "t")
            try:
                df = spark.range(n).selectExpr(
                    "id",
                    "concat('https://host', CAST(id % 64 AS STRING), "
                    "'/doc/', id) AS url",
                    "CAST(id % 1000 AS LONG) AS score",
                )
                snap_init(
                    spark, df, path, stats_cols=["id"],
                    partition_by=["truncate(18, url)"],
                )
                m = read_manifest(path)
                pred = [("url", "startswith", "https://host42/")]
                kept, skipped = prune_manifest(m, pred)
                t0 = time.perf_counter()
                c1 = snap_scan(spark, path, pred).count()
                pruned_sec = time.perf_counter() - t0
                t0 = time.perf_counter()
                c2 = (
                    snap_scan(spark, path, [("id", ">=", 0)])
                    .filter(F.col("url").startswith("https://host42/"))
                    .count()
                )
                full_sec = time.perf_counter() - t0
                assert c1 == c2, (c1, c2)
                rows_out.append(
                    {
                        "n": n,
                        "files": len(m["files"]),
                        "kept": len(kept),
                        "matched": c1,
                        "pruned_sec": round(pruned_sec, 2),
                        "full_sec": round(full_sec, 2),
                    }
                )
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", prev
        )
    print(json.dumps({"rows": rows_out}))


if __name__ == "__main__":
    main()
