#!/usr/bin/env python
"""Dump .explain("formatted") for every registered query to plans/<tag>/.

Usage: python tools/dump_plans.py <tag-dir> [_before|_after suffix] [names...]

Writes plans/<tag>/<query><suffix>.txt for each query (default: every
contract + AUX query).  Queries that materialize internally (the
snapshot-table lifecycle demos return a LocalTableScan of collected
rows) still get their returned-plan recorded — the interesting physical
plans for those live in the phase tools (tools/profile_query.py) and
OPTIMIZATION notes, but the file proves what the driver-visible plan
was at capture time.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_grpc_spark import registry
from mapreduce_grpc_spark.plans.explain import formatted_plan
from mapreduce_grpc_spark.session import get_spark, tune_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "_before"
    names = sys.argv[3:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans-{tag}")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    allq = {**registry.QUERIES, **registry.AUX_QUERIES}
    todo = names or sorted(allq)
    for name in todo:
        try:
            df = allq[name](spark, SF_DIR)
            text = formatted_plan(df)
        except Exception as e:  # record the failure, don't abort the dump
            text = f"ERROR building plan: {e!r}\n"
        with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(text)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
