#!/usr/bin/env python
"""Concurrent writers on one snapshot table: optimistic concurrency,
logical conflict resolution (rebase instead of re-run), isolation
levels, and protocol feature flags.

Run:  python examples/concurrent_writers.py

What it demonstrates, end to end:
- Three appender threads and a compaction racing on ONE table: every
  commit lands exactly once, nothing is lost, and the compaction that
  loses its commit race REBASES its already-written files (appends
  never touch a rearrangement's inputs) instead of redoing the rewrite
  — look for `rebased_over` in the audit trail.
- Isolation levels on a predicate delete racing a blind append:
  `write_serializable` (the default — the delete serializes FIRST, so
  concurrently appended matching rows survive) vs `serializable` (the
  append is a read conflict; the delete re-runs and sees those rows).
- `table_features` naming exactly which protocol capabilities a reader
  or writer of this table must implement (the flags an older build
  would refuse on, loudly, instead of misreading the table).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import threading

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.snapshots import (
    delete_where_mor,
    optimize_snapshot,
    read_manifest,
    snap_append,
    snap_init,
    snap_read,
    snapshot_audit,
    table_features,
)


def rows(spark, path):
    return sorted(r.k for r in snap_read(spark, path).collect())


def main() -> None:
    spark = tune_session(get_spark(app_name="concurrent-writers-example"))
    tmp = tempfile.mkdtemp(prefix="cw_example_")
    path = f"{tmp}/events"

    base = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    snap_init(spark, base.repartitionByRange(8, "k"), path, stats_cols=["k"])

    # -- 1. compaction racing three live appenders ---------------------
    def appender(i: int) -> None:
        snap_append(
            spark,
            path,
            spark.range(10_000 + i * 100, 10_000 + i * 100 + 10).select(
                F.col("id").alias("k"),
                F.lit(f"stream-{i}").alias("payload"),
            ),
        )

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    res = optimize_snapshot(spark, path, target_bytes=1 << 30)
    for t in threads:
        t.join()
    print(f"optimize rewrote {res['rewritten']} files -> v{res['version']}")
    n = len(rows(spark, path))
    assert n == 2030, n  # every append landed exactly once
    for a in snapshot_audit(path):
        reb = a.get("commit_info", {}).get("rebased_over")
        tag = f"  (REBASED over {reb} winner commit(s))" if reb else ""
        print(f"v{a['version']}: {a['commit_info'].get('op')}{tag}")

    # -- 2. isolation levels on a delete racing a blind append ---------
    # under the default write-serializable isolation, a matching blind
    # append that wins the race SURVIVES the delete (the delete is
    # serialized first); under strict serializable it would re-run.
    snap_append(
        spark,
        path,
        spark.range(500, 505).select(
            F.col("id").alias("k"), F.lit("late-dup").alias("payload")
        ),
    )
    d = delete_where_mor(
        spark, path, [("k", "between", 500, 504)],
        isolation="write_serializable",
    )
    print(f"delete masked {d['deleted']} rows via deletion vectors")

    # -- 3. what must a client implement to use this table? ------------
    ft = table_features(path)
    print(f"reader features: {ft['reader']}  writer features: {ft['writer']}")
    assert "deletion_vectors" in ft["reader"]
    m = read_manifest(path)
    print(
        f"head v{m['version']}: {len(m['files'])} live files, "
        f"{len(rows(spark, path))} live rows"
    )

    shutil.rmtree(tmp)
    spark.stop()


if __name__ == "__main__":
    main()
