#!/usr/bin/env python
"""Measure PQ recall@5 as a function of the code budget (M x k), so
the shipped default sits on a curve instead of a guess.

The round-10 finding: at the then-default M=16/k=32 (80-bit codes),
recall@5 vs the exact twin declined 1.0 -> 0.98 -> 0.92 across
sf 0.001/0.01/0.1 — correct direction of concern for the next decade
of scale.  This tool sweeps (m, k) at a fixed sf_dir and reports
recall + wall seconds per config; the curve picks the default that
holds >= 0.95 at sf0.1 and records what it costs.

Run from the repo root:
    python tools/pq_recall_curve.py [sf_dir]
Prints one JSON line:
    {"sf_dir": ..., "k": 5, "n_queries": N,
     "configs": [{"m": M, "k": K, "bits": M*log2(K),
                  "recall": r, "sec": s}, ...]}
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from mapreduce_grpc_spark.operators.pq import pq_topk
from mapreduce_grpc_spark.operators.similarity import (
    TOP_K,
    similarity_topk,
)
from mapreduce_grpc_spark.session import get_spark, tune_session

# (m, k): subspace count x codebook size.  dim=64 so sub = 64/m.
CONFIGS = [
    (8, 32),    # 40-bit codes
    (8, 256),   # 64-bit
    (16, 32),   # 80-bit  (round-10 default)
    (16, 64),   # 96-bit
    (16, 256),  # 128-bit
    (32, 64),   # 192-bit
]


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.q_id, set()).add(r.neighbor_id)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="pq-recall-curve")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    exact = _topk_sets(similarity_topk(spark, sf_dir))
    report = {
        "sf_dir": sf_dir,
        "k": TOP_K,
        "n_queries": len(exact),
        "configs": [],
    }
    for m, k in CONFIGS:
        t0 = time.monotonic()
        approx = _topk_sets(pq_topk(spark, sf_dir, m=m, k=k))
        sec = time.monotonic() - t0
        per_q = [
            len(approx.get(q, set()) & hits) / len(hits)
            for q, hits in exact.items()
        ]
        report["configs"].append(
            {
                "m": m,
                "k": k,
                "bits": int(m * math.log2(k)),
                "recall": round(sum(per_q) / len(per_q), 4),
                "sec": round(sec, 2),
            }
        )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
