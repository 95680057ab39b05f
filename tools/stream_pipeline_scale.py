#!/usr/bin/env python
"""Scale datapoint for the native streaming table-to-table pipeline:
wall time and per-commit overhead at 1x vs 10x streamed rows, plus the
paced-vs-unpaced partition planning on a many-small-file span.

Run from the repo root:  python tools/stream_pipeline_scale.py
Prints one JSON line:
  {"pipeline": {"1x": {"rows", "sec"}, "10x": {...}, "ratio": r},
   "binning": {"files", "partitions"}}

The claim under test: the pipeline's fixed cost is micro-batch/commit
overhead (offset planning + one manifest commit), so 10x the rows
through the SAME number of commits should cost well under 10x the
wall; and a 100-small-file span plans into openCost-binned shared
partitions, not 100 tasks.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.snapshots import (
    read_manifest,
    snap_append,
    snap_count,
    snap_init,
)
from mapreduce_grpc_spark.sources.stream_source import (
    OPEN_COST_BYTES,
    PARTITION_TARGET_BYTES,
    SnapshotTableStreamSource,
    _SnapshotStreamReader,
)

ROWS_1X = 100_000
COMMITS = 4  # same commit count at both scales: overhead held constant


def run_pipeline(spark, root, factor):
    src = os.path.join(root, f"src{factor}")
    dst = os.path.join(root, f"dst{factor}")
    rows = ROWS_1X * factor
    per = rows // COMMITS
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("x"),
    )
    snap_init(
        spark,
        df.filter(F.col("id") < per).repartitionByRange(2, "k"),
        src,
        stats_cols=["k"],
    )
    for c in range(1, COMMITS):
        snap_append(
            spark,
            src,
            df.filter(
                (F.col("id") >= c * per) & (F.col("id") < (c + 1) * per)
            ).repartitionByRange(2, "k"),
        )
    snap_init(spark, df.limit(0), dst, stats_cols=["k"])
    spark.dataSource.register(SnapshotTableStreamSource)
    t0 = time.monotonic()
    q = (
        spark.readStream.format("snapshot_table")
        .option("path", src)
        .load()
        .filter(F.col("x") < 50.0)
        .writeStream.format("snapshot_table")
        .option("path", dst)
        .option("txnAppId", f"scale-{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", os.path.join(root, f"ck{factor}"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError(
            "scale run did not finish in 600s — a partial sink count "
            "must not be recorded as a valid datapoint"
        )
    sec = time.monotonic() - t0
    return {"rows": snap_count(dst), "sec": round(sec, 2)}


def binning_row(spark, root):
    path = os.path.join(root, "many")
    snap_init(
        spark,
        spark.range(100)
        .select(F.col("id").alias("k"))
        .repartition(100),
        path,
        stats_cols=["k"],
    )
    n_files = len(read_manifest(path)["files"])
    r = _SnapshotStreamReader(
        path,
        0,
        False,
        '{"type":"struct","fields":[{"name":"k","type":"long",'
        '"nullable":true,"metadata":{}}]}',
    )
    parts = r.partitions({"version": 0}, {"version": 1})
    return {
        "files": n_files,
        "partitions": len(parts),
        "per_bin": PARTITION_TARGET_BYTES // OPEN_COST_BYTES,
    }


def main():
    spark = tune_session(get_spark(app_name="stream-pipeline-scale"))
    root = tempfile.mkdtemp(prefix="spipe-")
    try:
        r1 = run_pipeline(spark, root, 1)
        r10 = run_pipeline(spark, root, 10)
        print(
            json.dumps(
                {
                    "pipeline": {
                        "1x": r1,
                        "10x": r10,
                        "ratio": round(r10["sec"] / max(r1["sec"], 1e-9), 2),
                    },
                    "binning": binning_row(spark, root),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
