#!/usr/bin/env python
"""Table-level declarations in one tour: CLUSTER BY and GENERATED
ALWAYS AS — the layout and the derived values belong to the TABLE, not
to whichever job happens to write it.

Run:  python examples/table_declarations.py

What it demonstrates, end to end:
- `snap_init(..., cluster_by=["k"])` (or `snap_set_clustering` later):
  the clustering declaration lives in the manifest, the table is born
  range-clustered, and `auto_compact`/`optimize_*` default to the
  declared key — maintenance is self-driving.
- `snap_add_column(..., generated_as="expr", spark=...)`: appends that
  omit the column get it computed at write; a batch carrying WRONG
  values is rejected on every write path; `update_where` recomputes it
  for changed rows; history reads NULL (no backfill).
- Both declarations are writer-feature-gated: a legacy build refuses
  to write rather than silently stripping them.
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
    auto_compact,
    read_manifest,
    snap_add_column,
    snap_append,
    snap_init,
    snap_read,
    table_features,
    update_where,
)


def main() -> None:
    spark = tune_session(get_spark(app_name="table-declarations"))
    tmp = tempfile.mkdtemp(prefix="decl-example-")
    path = f"{tmp}/orders"
    try:
        # 1. born clustered: CREATE TABLE ... CLUSTER BY (k)
        snap_init(
            spark,
            spark.range(2000).selectExpr(
                "id * 7919 % 2000 AS k",
                "CAST(id % 400 AS DOUBLE) * 3.5 AS amount",
            ),
            path,
            stats_cols=["k"],
            cluster_by=["k"],
        )
        m = read_manifest(path)
        print("clustering:", m["clustering"])
        print("writer features:", table_features(path)["writer"])

        # 2. a GENERATED column: value is ALWAYS the expression
        snap_add_column(
            path, "band", "string",
            generated_as="CASE WHEN amount >= 700 THEN 'HIGH' ELSE 'LOW' END",
            spark=spark,
        )

        # history reads NULL — declarations never backfill
        nulls = snap_read(spark, path).filter(F.col("band").isNull()).count()
        print(f"pre-declaration rows with NULL band: {nulls}")

        # 3. appends OMITTING the column get it computed at write
        snap_append(
            spark, path,
            spark.range(2000, 2400).selectExpr(
                "id AS k", "CAST(id % 400 AS DOUBLE) * 3.5 AS amount"
            ),
        )
        print(
            "computed on append:",
            snap_read(spark, path)
            .filter(F.col("k") >= 2000)
            .groupBy("band").count().collect(),
        )

        # 4. divergent supplied values are rejected BEFORE commit
        try:
            snap_append(
                spark, path,
                spark.createDataFrame(
                    [(9999, 10.0, "HIGH")],
                    "k bigint, amount double, band string",
                ),
            )
        except ConstraintViolation as e:
            print("divergent batch rejected:", str(e)[:80], "...")

        # 5. UPDATE recomputes the generated column for changed rows
        update_where(
            spark, path, [("k", "between", 2000, 2099)],
            {"amount": "cast(amount + 1000.0 as double)"},
        )
        print(
            "after update, bands in [2000, 2099]:",
            snap_read(spark, path)
            .filter(F.col("k").between(2000, 2099))
            .groupBy("band").count().collect(),
        )

        # 6. self-driving maintenance: no key repeated at the call site
        for lo in (0, 500, 1000):
            snap_append(
                spark, path,
                spark.range(lo, lo + 500).selectExpr(
                    "id AS k", "CAST(id % 400 AS DOUBLE) * 3.5 AS amount"
                ),
            )
        res = auto_compact(
            spark, path, max_files=100, max_overlap_group=3,
            target_bytes=10**9,
        )
        print("auto_compact via the declaration:", res and {
            k: res[k] for k in ("rewritten", "added")
        })
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
