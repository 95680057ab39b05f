"""Incremental materialized views over snapshot tables, maintained from
the change data feed.

The composition the table layer exists for: a grouped-aggregate MV
(``GROUP BY dims -> count + exact DECIMAL sum``) whose refresh reads
ONLY the source commits since its last refresh — ``table_changes``
yields the rewritten slice per commit, postimages/inserts add,
preimages/deletes subtract, and the folded per-group deltas land on the
MV table as one copy-on-write commit.  Work per refresh is
O(changed rows + touched groups + overlapping MV files), independent of
both source and MV size — the continuous-aggregate cost model
(``sources/maintenance.py``'s rollup) generalized to any keyed source
table, with the table layer's isolation and audit for free.

Exactly-once: each refresh commits with the source version as a
``(_mv_refresh, src_version)`` txn marker in the MV's manifest, so the
MV remembers its own high-water mark (read back by the next refresh)
and a crashed-and-retried refresh of the same source version is a
skip, never a double-application — the same Delta
``txnAppId``/``txnVersion`` rule the streaming CDC ingest uses.

Counts and sums are mergeable state: groups whose count reaches zero
are DELETED from the MV (a group must not linger with cnt=0), and sums
accumulate in DECIMAL(38,6) so increments commute exactly — no float
drift between an incremental and a recomputed MV (the equality the
tests pin on random workloads).

NULL dimension values are unsupported (coalesce them upstream before
aggregating): the dims act as the MV table's merge keys, and SQL
equi-joins never match NULLs, so a NULL group could not be maintained
incrementally.  The table layer rejects such a refresh loudly
(``apply_cdc_cow``'s NULL-key check) instead of corrupting the MV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshots import (
    LocalSnapshotFS,
    apply_cdc_cow,
    current_version,
    read_manifest,
    snap_init,
    snap_read,
    table_changes,
)

MV_TXN_APP = "_mv_refresh"
_SUM_DEC = "decimal(38,6)"


def _aggregate(src: DataFrame, dims: list[str], agg_col: str) -> DataFrame:
    return src.groupBy(*dims).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(agg_col).cast(_SUM_DEC)).cast(_SUM_DEC).alias("sum_val"),
    )


def mv_init(
    spark: SparkSession,
    src_path: str,
    mv_path: str,
    dims: list[str],
    agg_col: str,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """Materialize ``GROUP BY dims -> (cnt, sum(agg_col))`` of the
    source snapshot's CURRENT version as a snapshot table of its own,
    recording the source version as the refresh high-water mark."""
    src_v = current_version(src_path, fs)
    mv = _aggregate(snap_read(spark, src_path, fs=fs), dims, agg_col)
    version = snap_init(
        spark,
        mv.repartitionByRange(4, *dims),
        mv_path,
        stats_cols=list(dims),
        txns={MV_TXN_APP: src_v},
        fs=fs,
    )
    return version


def mv_refresh(
    spark: SparkSession,
    src_path: str,
    mv_path: str,
    keys: list[str],
    dims: list[str],
    agg_col: str,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Fold all source commits since the MV's high-water mark into the
    MV.  Returns ``{"from", "to", "touched", "skipped"}``."""
    last = int(read_manifest(mv_path, fs=fs).get("txns", {})[MV_TXN_APP])
    cur = current_version(src_path, fs)
    if cur <= last:
        return {"from": last, "to": cur, "touched": 0, "skipped": True}

    feed = table_changes(
        spark, src_path, keys, from_version=last, to_version=cur, fs=fs
    )
    sign = (
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("sign")
    )
    delta = (
        feed.select(*dims, sign, F.col(agg_col).cast(_SUM_DEC).alias("v"))
        .groupBy(*dims)
        .agg(
            F.sum("sign").alias("dcnt"),
            F.sum(F.col("sign") * F.col("v")).cast(_SUM_DEC).alias("dsum"),
        )
        # a key updated WITHIN one group contributes +1-1 and +v'-v:
        # zero-delta groups need no touch at all
        .filter((F.col("dcnt") != 0) | (F.col("dsum") != 0))
    )

    mv_cur = snap_read(spark, mv_path, fs=fs)
    j = delta.join(mv_cur, dims, "left")
    merged = j.select(
        *dims,
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.col("dcnt")).alias("new_cnt"),
        (
            F.coalesce(F.col("sum_val"), F.lit(0).cast(_SUM_DEC))
            + F.col("dsum")
        )
        .cast(_SUM_DEC)
        .alias("new_sum"),
    )
    batch = merged.select(
        *dims,
        F.col("new_cnt").alias("cnt"),
        F.when(F.col("new_cnt") > 0, F.col("new_sum"))
        .otherwise(F.lit(None))
        .cast(_SUM_DEC)
        .alias("sum_val"),
        F.when(F.col("new_cnt") > 0, F.lit("U"))
        .otherwise(F.lit("D"))
        .alias("_op"),
    )
    res = apply_cdc_cow(
        spark, mv_path, batch, keys=list(dims),
        txn_app=MV_TXN_APP, txn_batch=cur, fs=fs,
    )
    touched = 0 if res.get("skipped") else res["upserted"] + res["deleted"]
    return {
        "from": last,
        "to": cur,
        "touched": touched,
        "skipped": bool(res.get("skipped", False)),
    }


def mv_read(
    spark: SparkSession,
    mv_path: str,
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
) -> DataFrame:
    return snap_read(spark, mv_path, version, fs)
