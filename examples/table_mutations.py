#!/usr/bin/env python
"""The table layer's mutation grammar in one tour: constraints, UPDATE,
conditional MERGE INTO, MoR delete, and RESTORE — each an atomic,
auditable commit on the same snapshot table.

Run:  python examples/table_mutations.py

What it demonstrates, end to end:
- `snap_add_constraint` gates every later write (the violating append
  below fails BEFORE any commit — the table never holds the bad rows).
- `update_where` rewrites ONLY the files whose key envelopes can match
  the predicate (watch `rewritten` vs `carried` in the result dicts).
- `merge_into` applies the full SQL MERGE grammar — conditional
  update, delete, and insert clauses, first match wins — in one commit.
- `delete_where_mor` masks rows via a deletion vector (no rewrite).
- `snap_restore` rolls all of it back as one metadata-only commit;
  `snapshot_audit` shows the whole story, including the rollback.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.snapshots import (
    ConstraintViolation,
    delete_where_mor,
    merge_into,
    snap_add_constraint,
    snap_append,
    snap_init,
    snap_read,
    snap_restore,
    snapshot_audit,
    update_where,
)


def main() -> None:
    spark = get_spark(app_name="table-mutations-demo")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="mutations-demo-")
    path = f"{tmp}/accounts"
    try:
        accounts = spark.range(1, 1001).select(
            F.col("id").alias("acct"),
            (F.col("id") % 500).cast("double").alias("balance"),
            F.when(F.col("id") % 3 == 0, "gold").otherwise("basic").alias(
                "tier"
            ),
        )
        snap_init(
            spark,
            accounts.repartitionByRange(4, "acct").sortWithinPartitions(
                "acct"
            ),
            path,
            stats_cols=["acct"],
        )
        snap_add_constraint(spark, path, "balance_ok", "balance >= 0.0")
        print("v2: table created, CHECK balance_ok installed")

        try:
            snap_append(
                spark, path,
                spark.createDataFrame(
                    [(9999, -5.0, "basic")], "acct long, balance double, tier string"
                ),
            )
        except ConstraintViolation as e:
            print(f"violating append REFUSED pre-commit: {str(e)[:80]}...")

        res = update_where(
            spark, path,
            [("acct", "between", 1, 250)],
            {"balance": "balance + 100.0"},
        )
        print(
            f"v{res['version']}: UPDATE band -> {res['updated']} rows, "
            f"rewrote {res['rewritten']} of "
            f"{res['rewritten'] + res['carried']} files"
        )

        changes = spark.range(200, 301).select(
            F.col("id").alias("acct"),
            F.lit(50.0).alias("bonus"),
        )
        res = merge_into(
            spark, path, changes, keys=["acct"],
            matched=[
                ("update", "t.tier = 'gold'",
                 {"balance": "t.balance + s.bonus"}),
                ("delete", "t.balance < 10.0"),
            ],
            not_matched=[],
        )
        print(
            f"v{res['version']}: MERGE -> updated {res['updated']}, "
            f"deleted {res['deleted']}"
        )

        res = delete_where_mor(spark, path, [("tier", "=", "basic"),
                                             ("acct", ">", 900)])
        print(
            f"v{res['version']}: MoR DELETE masked {res['deleted']} rows "
            "(no file rewritten)"
        )
        n_now = snap_read(spark, path).count()

        v = snap_restore(path, 2, spark=spark)
        n_restored = snap_read(spark, path).count()
        print(
            f"v{v}: RESTORE to v2 — {n_now} -> {n_restored} rows, "
            "metadata-only"
        )

        print("\naudit trail:")
        for h in snapshot_audit(path):
            print(
                f"  v{h['version']}: {h['commit_info'].get('op', 'init')}"
                f" ({h['live_rows']} live rows)"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
