#!/usr/bin/env python
"""Scale datapoint for the IVF vector index on the table layer: search
wall time and files scanned with manifest pruning vs a full-table read,
at 1x vs 10x corpus size, plus insert cost.

Run from the repo root:  python tools/vindex_scale.py
Prints one JSON line:
  {"1x": {"rows", "files", "search_pruned_sec", "search_full_sec",
          "files_kept", "insert_sec", "insert_rewritten"},
   "10x": {...}}

The claim under test (sources/vector_index.py docstring): search I/O
is the probed cells' FILES (nprobe/K of a cell-clustered corpus), not
the table; fresh-id inserts are bloom-proven pure appends at any size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_grpc_spark.functions.vectors import cosine
from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.snapshots import (
    prune_manifest,
    read_manifest,
    snap_read,
)
from mapreduce_grpc_spark.sources.vector_index import (
    _postings_path,
    ivf_index_init,
    ivf_index_insert,
    ivf_search,
)

DIM = 32
N_CELLS = 8


def _emb(spark, n, seed=1):
    """n clustered vectors: 8 gaussian blobs in DIM dims (deterministic)."""
    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(N_CELLS)
    ]
    rows = []
    for i in range(n):
        c = centers[i % N_CELLS]
        rows.append(
            (i, [c[d] + rng.gauss(0, 0.15) for d in range(DIM)])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _bench(spark, n):
    d = tempfile.mkdtemp(prefix="vindex-")
    path = os.path.join(d, "idx")
    emb = _emb(spark, n)
    ivf_index_init(
        spark, emb, path, n_cells=N_CELLS, seed=42, pq_m=8, pq_k=32
    )
    m = read_manifest(_postings_path(path))

    q = (
        emb.orderBy("vec_id")
        .limit(10)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    q.collect()  # materialize queries outside the timed region

    t0 = time.time()
    pruned = ivf_search(spark, path, q, nprobe=2, top_k=10)
    n_pruned = pruned.count()
    t_pruned = time.time() - t0

    # IVF-PQ: same probes, candidate generation reads ONLY the code
    # column (column pruning), exact re-rank on a bloom-pruned fetch
    t0 = time.time()
    n_adc = ivf_search(
        spark, path, q, nprobe=2, top_k=10, method="adc"
    ).count()
    t_adc = time.time() - t0

    # full-read control: same probe logic but candidates come from an
    # unpruned read of every posting file
    t0 = time.time()
    cand = snap_read(spark, _postings_path(path))
    scored = (
        cand.join(F.broadcast(q), F.lit(True))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    n_full = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .count()
    )
    t_full = time.time() - t0

    # representative pruning fraction: one 2-cell probe
    kept, skipped = prune_manifest(m, [("cell", "in", [0, 1])])

    new = spark.createDataFrame(
        [(10_000_000 + i, [0.1] * DIM) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    t0 = time.time()
    ins = ivf_index_insert(spark, path, new)
    t_ins = time.time() - t0

    out = {
        "rows": n,
        "files": len(m["files"]),
        "search_pruned_sec": round(t_pruned, 2),
        "search_adc_sec": round(t_adc, 2),
        "search_full_sec": round(t_full, 2),
        "search_rows": [n_pruned, n_adc, n_full],
        "files_kept_2cell": [len(kept), len(kept) + len(skipped)],
        "insert_sec": round(t_ins, 2),
        "insert_rewritten": ins["rewritten"],
    }
    shutil.rmtree(d)
    return out


def main() -> None:
    spark = get_spark(app_name="vindex-scale")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    _bench(spark, 5_000)  # warm the JVM/codegen paths
    print(
        json.dumps(
            {"1x": _bench(spark, 50_000), "10x": _bench(spark, 500_000)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
