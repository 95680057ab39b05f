#!/usr/bin/env python
"""Measure branch-create + publish cost vs table size.

The refs design claims both are O(manifest) driver work with zero data
movement — so wall time should grow only with the FILE COUNT (manifest
entries), never with data bytes, and the data dir must be byte-frozen
across publish.  Run:  python tools/refs_scale.py [files...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.refs import (
    snap_create_branch,
    snap_drop_branch,
    snap_publish_branch,
)
from mapreduce_grpc_spark.sources.snapshots import (
    read_manifest,
    snap_append,
    snap_init,
)


def build(spark, path: str, n_files: int, rows_per_file: int = 5000):
    df = (
        spark.range(n_files * rows_per_file)
        .select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
        .repartitionByRange(n_files, "k")
    )
    snap_init(spark, df, path, stats_cols=["k"])
    return len(read_manifest(path)["files"])


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [32, 320]
    spark = tune_session(get_spark(app_name="refs-scale", cpus=8))
    print(f"{'files':>6} {'create_s':>9} {'append_s':>9} "
          f"{'publish_s':>10} {'main_files_moved':>17}")
    for n in sizes:
        tmp = tempfile.mkdtemp(prefix="refs-scale-")
        t = os.path.join(tmp, "t")
        got = build(spark, t, n)
        listing_before = sorted(
            x for x in os.listdir(t) if x.startswith("data-")
        )
        t0 = time.time()
        bdir = snap_create_branch(t, "b")
        t_create = time.time() - t0
        snap_append(
            spark, bdir,
            spark.range(10).select(
                (F.col("id") - 10).alias("k"),
                (F.col("id") % 97).alias("v"),
            ),
        )
        t0 = time.time()
        snap_publish_branch(t, "b")
        t_publish = time.time() - t0
        moved = sorted(
            x for x in os.listdir(t) if x.startswith("data-")
        ) != listing_before
        snap_drop_branch(t, "b")
        # time a plain branch append for context (data-bound, excluded
        # from the O(manifest) claim)
        print(f"{got:>6} {t_create:>9.3f} {'-':>9} "
              f"{t_publish:>10.3f} {str(moved):>17}")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
