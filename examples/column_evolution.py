#!/usr/bin/env python
"""Metadata-only column evolution (the Delta column-mapping model) in
one tour: rename, drop, re-add — zero data bytes rewritten at ANY
table size — plus the guarantees around them.

Run:  python examples/column_evolution.py

What it demonstrates, end to end:
- `snap_rename_column` is a pointer-sized commit: the data files are
  untouched (physical/storage names freeze at first write; the
  manifest's mapping redirects logical names onto them), and every
  earlier version still time-travels under ITS OWN names.
- Mutators keep working through the mapping: a CoW merge keyed on the
  RENAMED column still prunes files by the physical key statistics.
- `snap_drop_column` retires the physical name; `snap_add_column` of
  the same logical name gets a FRESH physical name, so the dropped
  values can never resurrect from the old files (untouched rows read
  NULL).
- Plain schema evolution into a retired name is rejected loudly.
- `snap_restore` below the rename reverts the names with the data.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.snapshots import (
    current_version,
    merge_upsert_cow,
    snap_add_column,
    snap_append,
    snap_drop_column,
    snap_init,
    snap_read,
    snap_rename_column,
    snap_restore,
)


def main() -> None:
    spark = tune_session(get_spark(app_name="column-evolution-example"))
    tmp = tempfile.mkdtemp(prefix="colmap-example-")
    path = f"{tmp}/accounts"
    try:
        snap_init(
            spark,
            spark.range(100).selectExpr(
                "id AS acct_id",
                "CAST(id * 10 AS DOUBLE) AS bal",
                "concat('tier-', id % 3) AS tier",
            ),
            path,
            stats_cols=["acct_id"],
        )
        v1 = current_version(path)

        # 1. rename: metadata-only, instant at any size
        snap_rename_column(path, "bal", "balance")
        print("after rename:", snap_read(spark, path).columns)
        print("v1 still reads:", snap_read(spark, path, v1).columns)

        # 2. merge THROUGH the mapping (pruning uses physical stats)
        r = merge_upsert_cow(
            spark,
            path,
            spark.range(5).selectExpr(
                "id AS acct_id",
                "CAST(0 AS DOUBLE) AS balance",
                "'tier-reset' AS tier",
            ),
            keys=["acct_id"],
        )
        print("merge on renamed key:", r)

        # 3. drop: the physical name is retired, the bytes stay (time
        # travel still reads them below the drop)
        snap_drop_column(path, "tier")

        # 4. plain schema evolution back into the retired name is
        # rejected — reading old files under it would resurrect the
        # dropped values
        try:
            snap_append(
                spark,
                path,
                spark.range(200, 202).selectExpr(
                    "id AS acct_id",
                    "CAST(1 AS DOUBLE) AS balance",
                    "'x' AS tier",
                ),
                allow_schema_evolution=True,
            )
        except ValueError as e:
            print("evolution guard:", str(e)[:88], "...")

        # 5. the sanctioned path: snap_add_column assigns a FRESH
        # physical name — old rows read NULL, never the dropped values
        snap_add_column(path, "tier", StringType())
        sample = (
            snap_read(spark, path)
            .filter(F.col("acct_id") < 3)
            .orderBy("acct_id")
            .collect()
        )
        print("tier after drop+re-add (must be NULLs):",
              [row["tier"] for row in sample])

        # 6. restore below the rename: names revert with the data
        snap_restore(path, v1, spark=spark)
        print("after restore to v1:", snap_read(spark, path).columns)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
