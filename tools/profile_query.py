#!/usr/bin/env python
"""Profile ONE registered query end-to-end (r15 optimization round).

Runs the query the same way bench.py does (build + noop force) under
cProfile, printing total wall plus the top driver-side functions by
cumulative time.  Driver-side Python time vs JVM-job time is the first
split the optimization guide's §1 asks for: a query whose wall clock is
dominated by `socket.recv` is JVM/executor-bound; one dominated by
engine functions (bloom build, manifest JSON, numpy fits) is
driver-bound and a Spark-config change cannot help it.

Usage: python tools/profile_query.py <query> [reps] [--sf DIR]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_grpc_spark import registry
from mapreduce_grpc_spark.session import get_spark, tune_session


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    name = args[0]
    reps = int(args[1]) if len(args) > 1 else 1
    allq = {**registry.QUERIES, **registry.AUX_QUERIES}
    fn = allq[name]

    spark = get_spark(app_name=f"profile-{name}")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM/parquet once like bench.py
    registry.QUERIES["wordcount"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for rep in range(reps):
        spark.catalog.clearCache()
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        pr.disable()
        wall = time.perf_counter() - t0
        s = io.StringIO()
        st = pstats.Stats(pr, stream=s)
        st.sort_stats("cumulative").print_stats(35)
        print(f"=== {name} rep {rep}: wall {wall:.3f}s ===")
        print("\n".join(s.getvalue().splitlines()[4:50]))
    spark.stop()


if __name__ == "__main__":
    main()
