#!/usr/bin/env python
"""Time a subset of registered queries exactly like bench.py (noop sink,
warm session, min/median of N) without running the whole suite.

Usage: python tools/time_queries.py q1 q2 ... [--n=3] [--sf=DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_grpc_spark import registry
from mapreduce_grpc_spark.session import get_spark, tune_session


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    allq = {**registry.QUERIES, **registry.AUX_QUERIES}
    spark = get_spark(app_name="time-queries")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["wordcount"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        ts = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            allq[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: min {min(ts):.3f}  med {sorted(ts)[len(ts)//2]:.3f}"
            f"  all {ts}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
