#!/usr/bin/env python
"""Reproducible scale check: replicate the sf0.1 fixtures N-fold (with
key offsets, so no artificial duplicate keys) and compare per-query
runtimes at 1x vs Nx.

Run from the repo root:  python tools/scale_check.py [N] [out_dir]
Prints one JSON line: {"n": N, "queries": {name: {"t1": s, "tn": s,
"ratio": tn/t1}}}.  A ratio near N is linear scaling; well under N is
sublinear (fixed overheads amortizing); well over N means the operator
has super-linear work — for pair-producing dedup queries that is
expected when replication multiplies true duplicate PAIRS
quadratically, which is output growth, not per-pair cost (the README's
scale notes discuss this).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_grpc_spark import registry
from mapreduce_grpc_spark.session import get_spark, tune_session

BASE_SF = "/root/testdata/sf0.1"

# key column to offset per replica, per table (None = copy as-is)
KEYS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "customer": None,
    "supplier": None,
    "part": None,
    "nation": None,
    "region": None,
}
OFFSET = 100_000_000

QUERIES = [
    "wordcount",
    "per_key_agg",
    "minhash_signatures",
    "dedup_near",
    "dedup_simhash",
    "tumbling_window",
    "sample_stratified",
    "pack_sequences",
    "similarity_topk",
    "dedup_incremental",
    "bm25_topk",
    "repetition_stats",
    "unigram_logprob",
    "kmeans_clusters",
    "streaming_interval_join",
    "pagerank_neardup",
    "dedup_segments",
    "clean_segments",
    "sample_cluster_balanced",
    "grouping_sets_agg",
    "window_ranks",
]


def replicate(spark, n: int, out_dir: str) -> None:
    # Tables are written DIRECTORY-shaped (multiple part files) — the
    # realistic layout, and required for scan parallelism (a coalesce(1)
    # flat file has 1-2 row groups, so a 10x scan gets 1-2 tasks: measured
    # per_key_agg 1.3 s -> 10.2 s on a flat file vs 1.3 s on a directory).
    # The streaming source auto-detects directory tables (events.py).
    os.makedirs(out_dir, exist_ok=True)
    for t, key in KEYS.items():
        src = spark.read.parquet(f"{BASE_SF}/{t}.parquet")
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        if key is None or n == 1:
            df = src
        else:
            parts = [
                src.withColumn(key, F.col(key) + F.lit(i * OFFSET))
                for i in range(n)
            ]
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        df.write.parquet(dst)


def run(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    out = {}
    for name in names:
        fn = registry.QUERIES.get(name) or registry.AUX_QUERIES[name]
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def run_distributed_cc(spark, sf_dir: str) -> float:
    """Time dedup_components with the driver union-find DISABLED, so the
    distributed label-propagation loop — the actual 100 TB path — gets a
    measured wall-time row instead of only a correctness test.  min-of-2
    so the staged pair-graph build (first call) doesn't pollute the CC
    loop measurement."""
    from mapreduce_grpc_spark.operators import dedup as dd

    orig = dd.DRIVER_CC_MAX_PAIRS
    dd.DRIVER_CC_MAX_PAIRS = -1
    try:
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            dd.dedup_components(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)
    finally:
        dd.DRIVER_CC_MAX_PAIRS = orig


def run_interval_join_sweep(
    spark, sf_dir: str, partition_counts=(4, 8, 16)
) -> dict[int, float]:
    """Sweep the stream-stream join's state-store partition count — the
    knob streaming/joins.py documents a sizing rule for — so the rule
    carries measured datapoints at each scale instead of a one-off."""
    from mapreduce_grpc_spark.streaming.joins import (
        run_streaming_interval_join,
    )

    out = {}
    for p in partition_counts:
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run_streaming_interval_join(
                spark, sf_dir, state_partitions=p
            ).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[p] = round(best, 3)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf_scaled_x{n}"
    spark = get_spark(app_name="scale-check")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    replicate(spark, n, out_dir)
    t1 = run(spark, BASE_SF, QUERIES)
    tn = run(spark, out_dir, QUERIES)
    cc1 = run_distributed_cc(spark, BASE_SF)
    ccn = run_distributed_cc(spark, out_dir)
    sweep1 = run_interval_join_sweep(spark, BASE_SF)
    sweepn = run_interval_join_sweep(spark, out_dir)
    report = {
        "n": n,
        "queries": {
            q: {"t1": t1[q], "tn": tn[q], "ratio": round(tn[q] / t1[q], 2)}
            for q in QUERIES
        },
        "distributed_cc": {
            "t1": cc1,
            "tn": ccn,
            "ratio": round(ccn / cc1, 2),
        },
        "interval_join_state_partitions": {
            str(p): {
                "t1": sweep1[p],
                "tn": sweepn[p],
                "ratio": round(sweepn[p] / sweep1[p], 2),
            }
            for p in sweep1
        },
    }
    print(json.dumps(report))
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
