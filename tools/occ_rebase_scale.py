"""Measure what conflict-rebase saves vs re-run under a lost race.

Scenario (the hot-table compaction problem): a table of N files is
being compacted while an ingest stream keeps appending.  The OPTIMIZE
reads the manifest, rewrites every file, and loses the commit race to
an append that landed mid-rewrite.  Without logical conflict
resolution it must redo the whole rewrite (and can lose again);
with it (`_rebase_after_conflict`) it validates the winner's recorded
delta — an append never touches the compaction's inputs — and
re-commits its already-written files.

Run: python tools/occ_rebase_scale.py [rows_per_file]
Prints one line per mode: wall seconds + number of full rewrites paid.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark
from mapreduce_grpc_spark.sources import snapshots as S


def bench(spark, rows_per_file: int, n_files: int, rebase: bool) -> dict:
    path = os.path.join(tempfile.mkdtemp(prefix="occ_rebase_"), "t")
    df = (
        spark.range(rows_per_file * n_files)
        .select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("v"),
        )
        .repartitionByRange(n_files, "k")
        .sortWithinPartitions("k")
    )
    S.snap_init(spark, df, path, stats_cols=["k"])

    orig_commit = S._commit
    orig_rebase = S._rebase_after_conflict
    state = {"armed": True, "rewrites": 0}

    def inject(*a, **kw):
        if state["armed"]:
            state["armed"] = False
            S.snap_append(
                spark,
                path,
                spark.range(10**9, 10**9 + 100).select(
                    F.col("id").alias("k"),
                    F.sha2(F.col("id").cast("string"), 256).alias("v"),
                ),
            )
        return orig_commit(*a, **kw)

    orig_w = S._write_data_files

    def counting(*a, **kw):
        state["rewrites"] += 1
        return orig_w(*a, **kw)

    S._commit = inject
    S._write_data_files = counting
    if not rebase:
        S._rebase_after_conflict = lambda *a, **kw: None
    try:
        t0 = time.time()
        res = S.optimize_snapshot(spark, path, target_bytes=1 << 40)
        wall = time.time() - t0
    finally:
        S._commit = orig_commit
        S._write_data_files = orig_w
        S._rebase_after_conflict = orig_rebase
    assert res["rewritten"] >= n_files
    n = S.snap_read(spark, path).count()
    assert n == rows_per_file * n_files + 100, n
    # rewrites counted: optimize passes (1 or 2) + the injected append
    return {
        "mode": "rebase" if rebase else "re-run",
        "optimize_sec": round(wall, 3),
        "optimize_rewrites_paid": state["rewrites"] - 1,
        "result_version": res["version"],
    }


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    spark = get_spark(app_name="occ-rebase-scale")
    # full-size warmup: the first optimize pass at any size is
    # JVM/codegen-cold and dominates the mode difference otherwise
    bench(spark, rows, n_files=16, rebase=True)
    for rebase in (True, False):
        out = bench(spark, rows, n_files=16, rebase=rebase)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
