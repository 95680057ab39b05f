#!/usr/bin/env python
"""Row tracking (the Delta row-ID model) in one tour: stable row
identities as pure table metadata, preserved through every rewrite.

Run:  python examples/row_tracking.py

What it demonstrates, end to end:
- `snap_init(..., row_tracking=True)` (or `snap_enable_row_tracking`
  on an existing table): every data file gets a `row_id_base`
  watermark slice at commit — ids cost ZERO bytes at ingest.
- `snap_read(..., with_row_ids=True)` / the batch DataSource's
  `.option("withRowIds", "true")` surface the `_row_id` column.
- Identity survives everything: MERGE updates keep the old row's id
  under the new values, MoR deletes retire ids forever, OPTIMIZE
  materializes ids into the rewritten files, RESTORE re-publishes the
  historical assignment.
- The change feed needs NO declared keys on a tracked table:
  `table_changes(spark, path)` diffs by `_row_id` (inserts / deletes
  / update pre+post pairs) and a keys-less
  `readStream.option("readChangeFeed", "true")` streams the same rows.
- The streaming payoff: an OPTIMIZE commit is PROVABLY a pure
  rearrangement, so both the change feed and a plain append-mode
  stream skip it — streaming reads survive background compaction.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.snapshots import (
    apply_cdc_cow,
    delete_where_mor,
    merge_upsert_cow,
    optimize_snapshot,
    read_manifest,
    snap_init,
    snap_read,
    table_changes,
    table_features,
)
from mapreduce_grpc_spark.sources.stream_source import (
    SnapshotTableStreamSource,
)


def main() -> None:
    spark = tune_session(get_spark(app_name="row-tracking-example"))
    spark.dataSource.register(SnapshotTableStreamSource)
    tmp = tempfile.mkdtemp(prefix="rowid-example-")
    path = f"{tmp}/events"
    try:
        # 1. a TRACKED table: ids assigned as metadata, zero bytes
        snap_init(
            spark,
            spark.range(1000).selectExpr(
                "id AS k", "concat('v', id) AS payload"
            ).repartitionByRange(4, "k"),
            path,
            stats_cols=["k"],
            row_tracking=True,
        )
        m = read_manifest(path)
        print("writer features:", table_features(path)["writer"])
        print(
            "watermark:", m["next_row_id"],
            "| per-file bases:",
            sorted(e["row_id_base"] for e in m["files"]),
        )

        ids_before = {
            r.k: r._row_id
            for r in snap_read(spark, path, with_row_ids=True).collect()
        }

        # 2. mutate: update keeps identity, delete retires, insert
        #    draws fresh
        merge_upsert_cow(
            spark, path,
            spark.range(10).selectExpr(
                "id AS k", "'UPDATED' AS payload"
            ),
            keys=["k"],
        )
        delete_where_mor(spark, path, [("k", "between", 500, 509)])
        apply_cdc_cow(
            spark, path,
            spark.range(5000, 5003).selectExpr(
                "id AS k", "'NEW' AS payload", "'I' AS _op"
            ),
            keys=["k"],
        )
        ids_after = {
            r.k: r._row_id
            for r in snap_read(spark, path, with_row_ids=True).collect()
        }
        assert all(
            ids_after[k] == ids_before[k]
            for k in ids_after
            if k in ids_before
        )
        print(
            "updated row 3 keeps id", ids_after[3],
            "| fresh insert 5000 got id", ids_after[5000],
        )

        # 3. OPTIMIZE preserves ids (materialized column) and the
        #    change feed skips the commit entirely
        v_before = read_manifest(path)["version"]
        optimize_snapshot(spark, path, target_bytes=10**9)
        feed = table_changes(spark, path, from_version=v_before)
        print(
            "feed rows across the OPTIMIZE commit:", feed.count(),
            "(proven rearrangement — skipped without reading data)",
        )

        # 4. the identity change feed: NO keys declared
        feed = table_changes(spark, path, from_version=1)
        feed.groupBy("_change_type").count().orderBy(
            "_change_type"
        ).show()

        # 5. batch DataSource surface
        df = (
            spark.read.format("snapshot_table")
            .option("path", path)
            .option("withRowIds", "true")
            .load()
        )
        df.filter(F.col("k") < 3).orderBy("k").show()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
