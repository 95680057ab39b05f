#!/usr/bin/env python
"""Measure what the OPQ learned rotation buys over plain PQ — on the
fixture embeddings AND on a correlated synthetic built to hit the
documented trigger condition (PLANS.md r12: variance smeared across
the subspace split).

Two numbers per dataset:
- sample quantization distortion ‖XR − Y‖² (lower = tighter codes;
  for plain PQ, R = I) — the objective OPQ optimizes;
- recall@5 of the ADC candidate stage vs exact brute-force cosine
  (the number users feel).

Run from the repo root:
    python tools/opq_gain.py [sf_dir]
Prints one JSON line:
    {"sf_dir": ..., "fixture": {"pq_dist": ..., "opq_dist": ...,
     "dist_gain_pct": ..., "pq_recall": ..., "opq_recall": ...,
     "pq_sec": ..., "opq_sec": ...},
     "synthetic": { same keys, "dim": D, "n": N }}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from mapreduce_grpc_spark.operators.pq import (
    _reconstruct,
    _sample_matrix,
    opq_fit,
    opq_topk,
    pq_fit,
    pq_topk,
)
from mapreduce_grpc_spark.operators.similarity import similarity_topk
from mapreduce_grpc_spark.session import get_spark, tune_session


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(int(r.q_id), set()).add(int(r.neighbor_id))
    return out


def _recall(approx: dict[int, set[int]], exact: dict[int, set[int]]):
    per_q = [
        len(approx.get(q, set()) & hits) / len(hits)
        for q, hits in exact.items()
    ]
    return sum(per_q) / len(per_q)


def _distortions(spark, df, m: int, k: int) -> tuple[float, float]:
    """(pq_dist, opq_dist) on the shared fit sample."""
    sample = _sample_matrix(df, 42, 50_000)
    sub = sample.shape[1] // m
    pq_books = [
        np.asarray(b, dtype=np.float64) for b in pq_fit(spark, df, m=m, k=k)
    ]
    pq_dist = float(
        ((sample - _reconstruct(sample, pq_books, sub)) ** 2).sum()
    )
    hist: list = []
    opq_fit(spark, df, m=m, k=k, history_out=hist)
    return pq_dist, hist[-1]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    spark = get_spark()
    tune_session(spark)
    report: dict = {"sf_dir": sf_dir}

    # --- fixture embeddings ---
    from mapreduce_grpc_spark.catalog import table

    emb = table(spark, sf_dir, "embeddings")
    pq_dist, opq_dist = _distortions(spark, emb, 32, 64)
    exact = _topk_sets(similarity_topk(spark, sf_dir))
    t0 = time.time()
    pq_rec = _recall(_topk_sets(pq_topk(spark, sf_dir)), exact)
    pq_sec = time.time() - t0
    t0 = time.time()
    opq_rec = _recall(_topk_sets(opq_topk(spark, sf_dir)), exact)
    opq_sec = time.time() - t0
    report["fixture"] = {
        "pq_dist": round(pq_dist, 4),
        "opq_dist": round(opq_dist, 4),
        "dist_gain_pct": round(100 * (1 - opq_dist / pq_dist), 2),
        "pq_recall": round(pq_rec, 4),
        "opq_recall": round(opq_rec, 4),
        "pq_sec": round(pq_sec, 2),
        "opq_sec": round(opq_sec, 2),
    }

    # --- correlated synthetic (the trigger case) ---
    rng = np.random.RandomState(7)
    n, dim, m, k = (20_000, 64, 32, 64)
    scales = np.exp(-np.arange(dim) / 8.0)
    Q, _ = np.linalg.qr(rng.randn(dim, dim))
    X = (rng.randn(n, dim) * scales) @ Q
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    df.count()
    s_pq, s_opq = _distortions(spark, df, m, k)
    report["synthetic"] = {
        "dim": dim,
        "n": n,
        "pq_dist": round(s_pq, 4),
        "opq_dist": round(s_opq, 4),
        "dist_gain_pct": round(100 * (1 - s_opq / s_pq), 2),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
