#!/usr/bin/env python
"""Measure ANN recall@k: the LSH- and IVF-pruned top-k against the
brute-force ground truth on the same embeddings.

Run from the repo root: ``python tools/ann_recall.py [sf_dir]``.
Prints one JSON line: {"k": K, "n_queries": N, "recall": {"ann_lsh_topk":
r, "ivf_topk": r}} where recall is |approx ∩ exact| / |exact| averaged
over queries.  The approximate indexes trade recall for pruning — this
records the trade instead of asserting it away (the correctness gate only
checks the approximate queries' own oracles, which replicate the same
pruning in SQL).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_grpc_spark.operators.pq import pq_topk
from mapreduce_grpc_spark.operators.similarity import (
    TOP_K,
    ann_lsh_topk,
    ivf_topk,
    similarity_topk,
)
from mapreduce_grpc_spark.session import get_spark, tune_session


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.q_id, set()).add(r.neighbor_id)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ann-recall")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    exact = _topk_sets(similarity_topk(spark, sf_dir))
    report = {"k": TOP_K, "n_queries": len(exact), "recall": {}}
    for name, fn in (
        ("ann_lsh_topk", ann_lsh_topk),
        ("ivf_topk", ivf_topk),
        ("pq_topk", pq_topk),
    ):
        approx = _topk_sets(fn(spark, sf_dir))
        per_q = [
            len(approx.get(q, set()) & hits) / len(hits)
            for q, hits in exact.items()
        ]
        report["recall"][name] = round(sum(per_q) / len(per_q), 4)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
