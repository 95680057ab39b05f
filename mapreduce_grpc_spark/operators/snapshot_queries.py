"""DuckDB-checked query over the snapshot table layer.

The table-format layer (``sources/snapshots.py``) is otherwise verified
by invariant tests (races, time travel, GC, fsck, CoW pruning); this
module gives it one end-to-end HASH-checked query with the same
comparator discipline as every other operator: build a snapshot table
from fixture data, land one copy-on-write MERGE commit, and return the
v1-vs-CURRENT diff read back through time travel.  The oracle rebuilds
the identical diff in pure SQL from the fixture — if init, merge,
manifest resolution, or either version's read drifts by one row or one
value, the hash mismatches.

The reference engine's outputs are write-once text buckets
(/root/reference/src/mr_tasks.h:131-174) — it has no mutation layer;
this query documents the capability gap the snapshot layer closes.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..sources.snapshots import merge_upsert_cow, snap_init, snap_read


def snapshot_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Init a snapshot table from ``customer``, CoW-merge a deterministic
    promotion batch (keys ``c_custkey % 100 < 10``: +1000 balance,
    segment PROMOTED), then diff v1 against CURRENT via two time-travel
    reads.

    The result (one row per changed key: old/new balance + segment) is
    materialized and the table directory removed — the deliverable is
    the bounded diff (O(batch), ~1% of customers), not the table, so
    nothing leaks into temp space across bench runs.  At 100 TB the
    same diff stays a broadcast-or-shuffle join of two manifest-resolved
    file lists; only the demo's cleanup step is fixture-specific."""
    tmp = tempfile.mkdtemp(prefix="snap-tt-")
    path = os.path.join(tmp, "t")
    try:
        cust = table(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        )
        snap_init(
            spark,
            cust.repartitionByRange(4, "c_custkey"),
            path,
            stats_cols=["c_custkey"],
        )
        batch = cust.filter(F.col("c_custkey") % 100 < 10).select(
            "c_custkey",
            (F.col("c_acctbal") + F.lit(1000.0)).alias("c_acctbal"),
            F.lit("PROMOTED").alias("c_mktsegment"),
        )
        merge_upsert_cow(spark, path, batch, keys=["c_custkey"])

        v1 = snap_read(spark, path, version=1).alias("a")
        cur = snap_read(spark, path).alias("b")
        diff = (
            v1.join(cur, "c_custkey")
            .filter(
                (F.col("a.c_acctbal") != F.col("b.c_acctbal"))
                | (F.col("a.c_mktsegment") != F.col("b.c_mktsegment"))
            )
            .select(
                "c_custkey",
                F.col("a.c_acctbal").alias("old_bal"),
                F.col("b.c_acctbal").alias("new_bal"),
                F.col("a.c_mktsegment").alias("old_seg"),
                F.col("b.c_mktsegment").alias("new_seg"),
            )
        )
        rows = diff.collect()
        return spark.createDataFrame(rows, diff.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SNAPSHOT_TIMETRAVEL_SQL = """
SELECT c_custkey,
       c_acctbal AS old_bal,
       c_acctbal + 1000.0 AS new_bal,
       c_mktsegment AS old_seg,
       'PROMOTED' AS new_seg
FROM customer
WHERE c_custkey % 100 < 10
"""


QUERIES: dict = {}
ORACLES: dict = {}
AUX_QUERIES = {"snapshot_timetravel": snapshot_timetravel}
AUX_ORACLES = {"snapshot_timetravel": SNAPSHOT_TIMETRAVEL_SQL}
