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
from ..sources.matview import mv_init, mv_read, mv_refresh
from ..sources.snapshots import (
    apply_cdc_cow,
    delete_keys_mor,
    delete_where_mor,
    merge_upsert_cow,
    snap_append,
    snap_init,
    snap_read,
    snap_scan,
)


def _materialize(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Materialize a bounded result and detach it from its (about to
    be deleted) temp-table lineage.

    r15 optimization (guide §4 — the Python boundary): one Arrow batch
    transfer (``toArrow`` → ``createDataFrame``) instead of the pickled
    row path these queries used (``collect()`` +
    ``createDataFrame(rows, schema)``), measured 3.1x faster at the
    ~100k-row scale the table-lifecycle queries return (3.82 s → 1.23 s
    on streaming_table_pipeline's 105k-row surface).  The schema is
    pinned to the source plan's, so the driver-visible surface (names,
    types, nullability, values — checked row-identical before landing)
    is byte-for-byte what the row path produced."""
    return spark.createDataFrame(df.toArrow(), schema=df.schema)


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
    file lists; only the demo's cleanup step is fixture-specific.

    Numerics: ``c_acctbal`` is DOUBLE in the parquet and this query
    deliberately stays double END-TO-END (``+ F.lit(1000.0)`` is the
    same IEEE-754 add DuckDB performs, bit-identical) — unlike
    ``matview_orders`` there is no decimal cast anywhere in the
    lineage, so introducing one here would ADD a cross-engine rounding
    boundary, not remove one."""
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
        return _materialize(spark, diff)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def matview_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view maintained from the change data
    feed, hash-checked end-to-end against a pure-SQL recompute.

    Pipeline: ``orders`` → snapshot table → ``mv_init`` materializes
    ``GROUP BY o_orderpriority -> (cnt, sum(o_totalprice))`` as its own
    snapshot table → one deterministic CDC batch mutates the source
    (keys %10==0 repriced +1000 and repriced to RUSH, %10==1 deleted,
    %10==2 cloned as SYNTH inserts under shifted keys) → ``mv_refresh``
    folds ONLY that commit's change feed (preimages subtract,
    postimages add) into the MV as one CoW commit.  The oracle
    recomputes the aggregate from scratch over the mutated relation —
    if the CDF misses a preimage, double-counts a postimage, or the
    DECIMAL delta drifts from the full recompute by one micro-unit,
    the hash mismatches.  Refresh work is O(changed rows + touched
    groups), independent of source and MV size — the cost model that
    makes a 100 TB MV maintainable.

    Numerics (the r11 hash-flake hardening): ``o_totalprice`` is
    DOUBLE in the parquet, and Spark and DuckDB round double->decimal
    casts DIFFERENTLY near a half-unit boundary (Spark HALF_UPs the
    shortest decimal repr, DuckDB scales the exact binary value — a
    measured 126/134 one-micro-unit divergence on adversarial doubles
    at DECIMAL(38,6), ``tools/mv_flake.py --probe``).  So the pipeline
    casts to DECIMAL(15,2) ONCE at ingest — where the boundary margin
    is 5e-3, 10^4 wider than at scale 6, and identical across the
    whole fixture in both engines — and every mutation, CDC image,
    delta fold, and sum after that point is exact decimal arithmetic
    in BOTH engines.  No double ever re-enters the lineage.

    Hashed surface (the r13->r14 driver-red fix): the r13 trace proved
    the Spark rows equal both an independent Spark recompute AND the
    DuckDB-1.0.0 oracle output in the driver's own process, so the
    remaining red was a driver-environment DECIMAL canonicalization
    (or DuckDB-version) artifact — matview_orders was the only
    contract query with a DECIMAL output column.  The final SELECT
    therefore projects the sum to exact integer cents
    (``sum_cents BIGINT = CAST(sum_val * 100 AS BIGINT)``, exact: the
    lineage is scale-2 decimal end-to-end so ``* 100`` is an integer)
    in BOTH the query and the oracle; integers hash identically under
    any canonicalizer and any DuckDB version.  All MV internals stay
    decimal — the CDF fold, touched-group recompute, and exactly-once
    marker remain fully under the hash."""
    tmp = tempfile.mkdtemp(prefix="snap-mv-")
    src_path = os.path.join(tmp, "src")
    mv_path = os.path.join(tmp, "mv")
    try:
        dec = "decimal(15,2)"
        ords = table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice").cast(dec).alias("o_totalprice"),
        )
        snap_init(
            spark,
            ords.repartitionByRange(4, "o_orderkey"),
            src_path,
            stats_cols=["o_orderkey"],
        )
        mv_init(
            spark, src_path, mv_path,
            dims=["o_orderpriority"], agg_col="o_totalprice",
        )

        k = F.col("o_orderkey")
        upd = ords.filter(k % 10 == 0).select(
            k.alias("o_orderkey"),
            F.lit("RUSH").alias("o_orderpriority"),
            (F.col("o_totalprice") + F.lit("1000.00").cast(dec))
            .cast(dec)
            .alias("o_totalprice"),
            F.lit("U").alias("_op"),
        )
        dele = ords.filter(k % 10 == 1).withColumn("_op", F.lit("D"))
        ins = ords.filter(k % 10 == 2).select(
            (k + F.lit(10_000_000)).alias("o_orderkey"),
            F.lit("SYNTH").alias("o_orderpriority"),
            F.lit("42.00").cast(dec).alias("o_totalprice"),
            F.lit("I").alias("_op"),
        )
        batch = upd.unionByName(dele).unionByName(ins)
        apply_cdc_cow(spark, src_path, batch, keys=["o_orderkey"])
        mv_refresh(
            spark, src_path, mv_path,
            keys=["o_orderkey"],
            dims=["o_orderpriority"], agg_col="o_totalprice",
        )

        # Hashed surface: integer cents, no DECIMAL column (see the
        # docstring).  sum_val is decimal(38,6) with an exact scale-2
        # value, so cast-to-(20,2) then *100 is exact integer math in
        # both engines; the bigint cast cannot round.
        mv = mv_read(spark, mv_path).select(
            "o_orderpriority",
            "cnt",
            (F.col("sum_val").cast("decimal(20,2)") * F.lit(100))
            .cast("bigint")
            .alias("sum_cents"),
        )
        return _materialize(spark, mv)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def snapshot_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletes + predicate-pruned scan, hash-checked
    end-to-end: init a snapshot table from ``customer``, mask rows two
    ways without rewriting any data file — a predicate delete on an
    UNTRACKED column (``c_acctbal < 0``: no stats to prune by, still
    exact) stacked with a key-set delete (``c_custkey % 7 = 0``) — then
    read back through ``snap_scan`` with a key-range predicate that
    prunes files via manifest envelopes AND applies both deletion
    vectors.  If position capture, sidecar accumulation across the two
    delete commits, file pruning, or the read-side anti-join drops or
    resurrects one row, the hash mismatches.

    The result is O(range ∩ survivors); the table dir is removed after
    materializing — the deliverable is the query result, not the
    table."""
    tmp = tempfile.mkdtemp(prefix="snap-dv-")
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
        delete_where_mor(spark, path, [("c_acctbal", "<", 0.0)])
        dead_keys = cust.filter(F.col("c_custkey") % 7 == 0).select(
            "c_custkey"
        )
        delete_keys_mor(spark, path, dead_keys, keys=["c_custkey"])

        out = snap_scan(
            spark, path, [("c_custkey", "between", 1, 750)]
        ).select("c_custkey", "c_acctbal", "c_mktsegment")
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SNAPSHOT_DELETE_SCAN_SQL = """
SELECT c_custkey, c_acctbal, c_mktsegment
FROM customer
WHERE c_custkey BETWEEN 1 AND 750
  AND c_acctbal >= 0
  AND c_custkey % 7 <> 0
"""


# Mirrors the Spark pipeline's numerics exactly: ONE double->decimal
# cast at DECIMAL(15,2) (boundary margin 5e-3; Spark/DuckDB agree on
# the whole fixture), then pure decimal arithmetic — see the
# matview_orders docstring for the measured (38,6) divergence this
# layout avoids.  The hashed surface is integer cents (r14): the
# scale-2 sum times 100 is an exact integer in both engines, so no
# DECIMAL ever reaches the driver's canonicalizer.
MATVIEW_ORDERS_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(o_totalprice AS DECIMAL(15,2)) AS o_totalprice
  FROM orders
), mut AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN 'RUSH'
              ELSE o_orderpriority END AS o_orderpriority,
         CASE WHEN o_orderkey % 10 = 0
              THEN CAST(o_totalprice + CAST('1000.00' AS DECIMAL(15,2))
                        AS DECIMAL(15,2))
              ELSE o_totalprice END AS o_totalprice
  FROM base
  WHERE o_orderkey % 10 <> 1
  UNION ALL
  SELECT o_orderkey + 10000000, 'SYNTH', CAST('42.00' AS DECIMAL(15,2))
  FROM base
  WHERE o_orderkey % 10 = 2
)
SELECT o_orderpriority,
       COUNT(*) AS cnt,
       CAST(CAST(SUM(o_totalprice) AS DECIMAL(20,2)) * 100 AS BIGINT)
         AS sum_cents
FROM mut
GROUP BY o_orderpriority
"""


SNAPSHOT_TIMETRAVEL_SQL = """
SELECT c_custkey,
       c_acctbal AS old_bal,
       c_acctbal + 1000.0 AS new_bal,
       c_mktsegment AS old_seg,
       'PROMOTED' AS new_seg
FROM customer
WHERE c_custkey % 100 < 10
"""


def snapshot_column_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only column evolution end-to-end under the hash
    comparator: init from ``customer``, RENAME two columns (zero data
    bytes move — the mapping redirects logical names onto the frozen
    physical ones), DROP the segment column (its physical name is
    retired), RE-ADD the same logical name (fresh physical name — the
    dropped values must NOT resurrect from the old files, so untouched
    rows read NULL), then CoW-merge a deterministic refresh batch
    THROUGH the renamed key column (file pruning translates
    logical->physical against the manifest stats) and read the final
    state back.

    The oracle rebuilds the same final state in pure SQL from the
    fixture; any resurrection of dropped values, a rename leaking into
    the data path, or a merge mis-planned through the mapping flips
    the hash."""
    from pyspark.sql.types import StringType

    from ..sources.snapshots import (
        snap_add_column,
        snap_drop_column,
        snap_rename_column,
    )

    tmp = tempfile.mkdtemp(prefix="snap-colmap-")
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
        snap_rename_column(path, "c_custkey", "custkey")
        snap_rename_column(path, "c_acctbal", "balance")
        snap_drop_column(path, "c_mktsegment")
        snap_add_column(path, "segment", StringType())
        batch = (
            snap_scan(spark, path, [("custkey", ">=", 0)])
            .filter(F.col("custkey") % 50 < 5)
            .select(
                "custkey",
                (F.col("balance") + F.lit(500.0)).alias("balance"),
                F.lit("REFRESHED").alias("segment"),
            )
        )
        merge_upsert_cow(spark, path, batch, keys=["custkey"])
        out = snap_read(spark, path).select("custkey", "balance", "segment")
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SNAPSHOT_COLUMN_EVOLUTION_SQL = """
SELECT c_custkey AS custkey,
       CASE WHEN c_custkey % 50 < 5 THEN c_acctbal + 500.0
            ELSE c_acctbal END AS balance,
       CASE WHEN c_custkey % 50 < 5 THEN 'REFRESHED'
            ELSE NULL END AS segment
FROM customer
"""


def streaming_table_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native streaming loop, measured end to end: snapshot table
    --readStream ("snapshot_table" source)--> filter --writeStream
    ("snapshot_table" sink)--> snapshot table, one txn-marked append
    commit per micro-batch (exactly-once; a replayed batch is skipped
    by its marker).

    The source table is built in two commits (even keys at v1, odd at
    v2) so the stream genuinely spans multiple versions; the sink's
    result is read back through the ordinary batch reader and
    hash-checked against a one-line SQL filter of the fixture — the
    whole pipeline (source offsets, Arrow partition reads, sink
    commit protocol) sits between the two.  This is the benched cost
    of the per-micro-batch commit overhead the round-6 flagship
    introduced."""
    import uuid as _uuid

    from ..sources.snapshots import snap_append
    from ..sources.stream_source import SnapshotTableStreamSource

    tmp = tempfile.mkdtemp(prefix="snap-pipe-")
    src, dst = os.path.join(tmp, "src"), os.path.join(tmp, "dst")
    try:
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        )
        snap_init(
            spark,
            orders.filter(F.col("o_orderkey") % 2 == 0).repartitionByRange(
                2, "o_orderkey"
            ),
            src,
            stats_cols=["o_orderkey"],
        )
        snap_append(
            spark,
            src,
            orders.filter(F.col("o_orderkey") % 2 == 1).repartitionByRange(
                2, "o_orderkey"
            ),
        )
        snap_init(spark, orders.limit(0), dst, stats_cols=["o_orderkey"])
        spark.dataSource.register(SnapshotTableStreamSource)
        q = (
            spark.readStream.format("snapshot_table")
            .option("path", src)
            .load()
            .filter(F.col("o_totalprice") > 150000.0)
            .writeStream.format("snapshot_table")
            .option("path", dst)
            .option("txnAppId", f"pipe-{_uuid.uuid4().hex[:8]}")
            .option("checkpointLocation", os.path.join(tmp, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming_table_pipeline: availableNow drain exceeded "
                "300s — partial sink state must not be hash-compared"
            )
        out = snap_read(spark, dst)
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_TABLE_PIPELINE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice > 150000.0
"""


def snapshot_update_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE-by-predicate + RESTORE, hash-checked end-to-end.

    Pipeline: ``orders`` → snapshot table (key-clustered, CHECK
    constraint on price) → ``update_where`` with a DNF predicate bumps
    a deterministic band (file-pruned CoW, constraint-validated) →
    ``delete_where_mor`` wipes a key range → ``snap_restore`` rolls the
    table back to the post-update version, resurrecting the deleted
    rows as a metadata-only commit.  The returned sample therefore
    equals the pure-SQL CASE-WHEN update of the fixture — if pruning
    dropped a matching file, the update leaked into unmatched rows, or
    the restore failed to resurrect exactly the deleted band, the hash
    mismatches.  At 100 TB: the update rewrites only envelope-matching
    files, the delete writes O(matched) positions, the restore writes
    one manifest."""
    tmp = tempfile.mkdtemp(prefix="snap-ur-")
    path = os.path.join(tmp, "t")
    try:
        from ..sources.snapshots import (
            snap_add_constraint,
            snap_restore,
            update_where,
        )

        src = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority",
        )
        snap_init(
            spark,
            src.repartitionByRange(4, "o_orderkey"),
            path,
            stats_cols=["o_orderkey"],
        )
        snap_add_constraint(
            spark, path, "price_pos",
            "o_totalprice > cast(0.0 as double)",
            validate=False,
        )
        upd = update_where(
            spark, path,
            [("o_orderkey", "<=", 600), "or", ("o_orderstatus", "=", "P")],
            {
                "o_totalprice": "cast(o_totalprice + 500.0 as double)",
                "o_orderpriority": "'0-BUMPED'",
            },
        )
        # the committed post-update version (an empty fixture commits
        # nothing — update_where reports the unchanged CURRENT)
        post_update = upd["version"]
        delete_where_mor(
            spark, path, [("o_orderkey", "between", 100, 700)]
        )
        snap_restore(path, post_update, spark=spark)
        out = (
            snap_read(spark, path)
            .filter(F.col("o_orderkey") % 13 == 0)
            .select(
                "o_orderkey",
                F.col("o_totalprice").alias("upd_price"),
                F.col("o_orderpriority").alias("upd_priority"),
            )
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SNAPSHOT_UPDATE_RESTORE_SQL = """
SELECT o_orderkey,
       CASE WHEN (o_orderkey <= 600 OR o_orderstatus = 'P')
            THEN o_totalprice + 500.0 ELSE o_totalprice
       END AS upd_price,
       CASE WHEN (o_orderkey <= 600 OR o_orderstatus = 'P')
            THEN '0-BUMPED' ELSE o_orderpriority
       END AS upd_priority
FROM orders
WHERE o_orderkey % 13 = 0
"""


def snapshot_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full conditional MERGE INTO, hash-checked end-to-end.

    Target = ``customer`` as a key-clustered snapshot table; source = a
    deterministic change feed derived from the same fixture (existing
    keys %5==0 carrying a delta, brand-new shifted keys from %5==1).
    One ``merge_into`` commit applies the SQL:2003 grammar: matched
    BUILDING customers take the delta, remaining matched rows with
    negative balance are deleted, and only odd new keys insert.  The
    oracle rebuilds the identical final relation with a LEFT JOIN +
    CASE + UNION — if clause ordering, the delete filter, insert
    gating, or file pruning drops or doubles one row, the hash
    mismatches.  At 100 TB the merge rewrites only files whose key
    envelopes overlap the source keys."""
    tmp = tempfile.mkdtemp(prefix="snap-mi-")
    path = os.path.join(tmp, "t")
    try:
        from ..sources.snapshots import merge_into

        cust = table(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        )
        snap_init(
            spark,
            cust.repartitionByRange(4, "c_custkey"),
            path,
            stats_cols=["c_custkey"],
        )
        k = F.col("c_custkey")
        src = (
            cust.filter(k % 5 == 0)
            .select(
                k.alias("c_custkey"),
                F.lit(100.0).cast("double").alias("delta"),
            )
            .unionByName(
                cust.filter(k % 5 == 1).select(
                    (k + F.lit(10_000_000)).alias("c_custkey"),
                    F.lit(50.0).cast("double").alias("delta"),
                )
            )
        )
        merge_into(
            spark, path, src, keys=["c_custkey"],
            matched=[
                ("update", "t.c_mktsegment = 'BUILDING'",
                 {"c_acctbal": "t.c_acctbal + s.delta"}),
                ("delete", "t.c_acctbal < 0"),
            ],
            not_matched=[
                ("insert", "s.c_custkey % 2 = 1",
                 {"c_custkey": "s.c_custkey",
                  "c_acctbal": "s.delta",
                  "c_mktsegment": "'NEW'"}),
            ],
        )
        out = snap_read(spark, path).select(
            "c_custkey",
            F.col("c_acctbal").alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SNAPSHOT_MERGE_INTO_SQL = """
WITH src AS (
  SELECT c_custkey AS k, CAST(100.0 AS DOUBLE) AS delta
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey + 10000000, CAST(50.0 AS DOUBLE)
  FROM customer WHERE c_custkey % 5 = 1
)
SELECT t.c_custkey,
       CASE WHEN s.k IS NOT NULL AND t.c_mktsegment = 'BUILDING'
            THEN t.c_acctbal + s.delta ELSE t.c_acctbal END AS bal,
       t.c_mktsegment AS seg
FROM customer t LEFT JOIN src s ON t.c_custkey = s.k
WHERE NOT (s.k IS NOT NULL
           AND t.c_mktsegment <> 'BUILDING'
           AND t.c_acctbal < 0)
UNION ALL
SELECT s.k, s.delta, 'NEW'
FROM src s LEFT JOIN customer t ON t.c_custkey = s.k
WHERE t.c_custkey IS NULL AND s.k % 2 = 1
"""


def snapshot_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden partitioning end-to-end under the hash comparator: init a
    snapshot table from half of ``events`` with a declared partition
    spec (``days(ts)`` clustering + ``bucket(16, user_id)``), APPEND
    the other half (the spec must carry and the appended files must
    derive + cluster), then ``snap_scan`` a week x 3-user slice — the
    predicates are on the SOURCE columns only; the day-range and
    bucket-id pruning happen behind them (sources/partition.py).

    If spec parsing, write-side derivation/range-clustering, the
    implied-predicate translation, file pruning, or the exact row
    filter drops or leaks one row, the hash mismatches against the
    plain-SQL oracle.  At 100 TB the same scan schedules O(one week's
    files ∩ 3 buckets of 16) tasks instead of O(table)."""
    import datetime as _dt

    tmp = tempfile.mkdtemp(prefix="snap-part-")
    path = os.path.join(tmp, "t")
    try:
        ev = table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        snap_init(
            spark,
            ev.filter(F.col("event_id") % 2 == 0),
            path,
            stats_cols=["event_id"],
            partition_by=["days(ts)", "bucket(16, user_id)"],
        )
        snap_append(spark, path, ev.filter(F.col("event_id") % 2 == 1))
        out = snap_scan(
            spark,
            path,
            [
                (
                    "ts",
                    "between",
                    _dt.datetime(2024, 1, 5),
                    _dt.datetime(2024, 1, 12),
                ),
                ("user_id", "in", [7, 11, 23]),
            ],
        ).select("event_id", "ts", "user_id", "event_type", "value")
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SNAPSHOT_PARTITIONED_SCAN_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
             AND TIMESTAMP '2024-01-12 00:00:00'
  AND user_id IN (7, 11, 23)
"""


# snapshot_timetravel is IN the 50-query driver contract (rotated in
# round 7, replacing the redundant doc_fingerprint text query): the
# table layer is the engine's centerpiece and deserves the driver's
# own hash check, not just the pytest mirror.
def snapshot_prefix_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-prefix data skipping end-to-end under the hash
    comparator: init a snapshot table from ``documents`` partitioned
    by ``truncate(4, source)``, then ``snap_scan`` with a
    ``startswith`` predicate (``source LIKE 'src1%'`` — matches src1
    plus src10..src19, deliberately NOT equality-expressible).  The
    prefix prunes twice: the ``[p, next_prefix(p))`` range against
    per-file source envelopes, and the implied partition probe
    (prefix length == the truncate width pins the whole tuple value).
    If the boundary algebra, the derivation, or the exact row filter
    drops or leaks one row, the hash mismatches against the plain
    LIKE oracle.  At 100 TB this is the ``WHERE url LIKE
    'https://host/%'`` shape every web-corpus pipeline runs —
    O(matching files) tasks instead of O(table)."""
    tmp = tempfile.mkdtemp(prefix="snap-prefix-")
    path = os.path.join(tmp, "t")
    try:
        docs = table(spark, sf_dir, "documents").select(
            "doc_id", "source", "lang", "n_chars"
        )
        snap_init(
            spark,
            docs,
            path,
            stats_cols=["doc_id", "source"],
            partition_by=["truncate(4, source)"],
        )
        out = snap_scan(
            spark,
            path,
            [("source", "startswith", "src1"), ("n_chars", ">=", 100)],
        ).select("doc_id", "source", "lang", "n_chars")
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SNAPSHOT_PREFIX_SCAN_SQL = """
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE source LIKE 'src1%' AND n_chars >= 100
"""


def streaming_cdf_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming change-feed SOURCE under the hash comparator:
    ``readStream.format("snapshot_table").option("readChangeFeed",
    "true")`` — a continuous consumer of row-level deltas, the
    MV-maintenance shape as a real Structured Streaming query instead
    of a ``consume_changes`` poll loop.

    Pipeline: ``customer`` → snapshot table → one deterministic CDC
    commit (keys %10==0 re-segmented to VIP, %10==1 deleted, %10==2
    cloned as SYNTH inserts under shifted keys) → the change feed is
    STREAMED (startingVersion pinned past the initial load, memory
    sink, availableNow) and summarized per (change type, segment).
    The oracle reconstructs the expected feed rows in pure SQL — if
    the executor-side per-commit diff misclassifies one row, emits a
    carried row, or drops a preimage, a count flips and the hash
    mismatches.  Scale shape: the streamed micro-batch reads only the
    commit's rewritten slice (one task per commit today; the row-ID
    design note in PLANS.md is the lever that removes the per-commit
    join)."""
    import uuid as _uuid

    from ..sources.stream_source import SnapshotTableStreamSource

    tmp = tempfile.mkdtemp(prefix="snap-cdf-")
    path = os.path.join(tmp, "t")
    try:
        cust = table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        snap_init(
            spark,
            cust.repartitionByRange(4, "c_custkey"),
            path,
            stats_cols=["c_custkey"],
        )
        k = F.col("c_custkey")
        batch = (
            cust.filter(k % 10 == 0)
            .select(k.alias("c_custkey"),
                    F.lit("VIP").alias("c_mktsegment"),
                    F.lit("U").alias("_op"))
            .unionByName(
                cust.filter(k % 10 == 1).select(
                    "c_custkey", "c_mktsegment", F.lit("D").alias("_op")
                )
            )
            .unionByName(
                cust.filter(k % 10 == 2).select(
                    (k + 10_000_000).alias("c_custkey"),
                    F.lit("SYNTH").alias("c_mktsegment"),
                    F.lit("I").alias("_op"),
                )
            )
        )
        apply_cdc_cow(spark, path, batch, keys=["c_custkey"])

        spark.dataSource.register(SnapshotTableStreamSource)
        qn = f"cdf_{_uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.format("snapshot_table")
            .option("path", path)
            .option("readChangeFeed", "true")
            .option("keys", "c_custkey")
            .option("startingVersion", "2")
            .load()
            .writeStream.format("memory")
            .queryName(qn)
            .option("checkpointLocation", os.path.join(tmp, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming_cdf_feed: availableNow drain exceeded 300s"
                " — partial feed must not be hash-compared"
            )
        out = (
            spark.table(qn)
            .groupBy(
                F.col("_change_type").alias("change_type"),
                F.col("c_mktsegment").alias("seg"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# Mirrors the streamed feed's classification exactly: every %10==0 key
# yields a pre/post pair (fixture segments are TPC-H names, never VIP,
# so the update always differs), %10==1 keys delete, %10==2 keys insert
# under shifted identity.
STREAMING_CDF_FEED_SQL = """
WITH changes AS (
  SELECT 'update_preimage' AS change_type, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT 'update_postimage', 'VIP'
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT 'delete', c_mktsegment
  FROM customer WHERE c_custkey % 10 = 1
  UNION ALL
  SELECT 'insert', 'SYNTH'
  FROM customer WHERE c_custkey % 10 = 2
)
SELECT change_type, seg, COUNT(*) AS cnt
FROM changes
GROUP BY change_type, seg
"""


def snapshot_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row tracking (Delta row IDs) under the hash comparator: init a
    TRACKED snapshot table from ``customer``, capture every row's
    ``_row_id``, compact the whole table (``optimize_snapshot`` — an
    id-PRESERVING rewrite that materializes the ids as a physical
    column), and verify in-query that (a) ids are unique (distinct
    ids == rows per segment) and (b) no row's id changed across the
    rewrite (pre/post join on the key counts differing ids).  The
    oracle pins the invariant shape: per-segment row count, the same
    count again as the distinct-id count, and a zero changed column —
    if assignment duplicates an id, the rewrite drops or renumbers
    one row, or the materialized column diverges from the synthesized
    metadata ids, a count flips and the hash mismatches."""
    from ..sources.snapshots import optimize_snapshot

    tmp = tempfile.mkdtemp(prefix="snap-rowid-")
    path = os.path.join(tmp, "t")
    try:
        cust = table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        snap_init(
            spark,
            cust.repartitionByRange(4, "c_custkey"),
            path,
            stats_cols=["c_custkey"],
            row_tracking=True,
        )
        pre = snap_read(spark, path, with_row_ids=True).select(
            "c_custkey", F.col("_row_id").alias("_pre_id")
        )
        pre_df = _materialize(spark, pre)
        optimize_snapshot(spark, path, target_bytes=10**12)
        post = snap_read(spark, path, with_row_ids=True)
        out = (
            post.join(pre_df, "c_custkey")
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.countDistinct("_row_id").alias("n_ids"),
                F.sum(
                    F.when(
                        F.col("_row_id") != F.col("_pre_id"), 1
                    ).otherwise(0)
                ).alias("changed"),
            )
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SNAPSHOT_ROW_IDS_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS cnt,
       COUNT(*) AS n_ids,
       CAST(0 AS BIGINT) AS changed
FROM customer
GROUP BY c_mktsegment
"""


def snapshot_generated_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated columns (``GENERATED ALWAYS AS``) end-to-end under the
    hash comparator: init a snapshot table from the EVEN ``orders``
    keys, declare two generated columns (a CASE band over the price
    and a modulo bucket over the key), then append the ODD keys
    OMITTING both — the write path must compute them.  The read-back
    sample therefore splits exactly on parity: pre-declaration rows
    read NULL (declarations never backfill history), appended rows
    carry the computed values.  If the fill, the no-backfill rule, or
    the declaration carry drifts by one row, the hash mismatches
    against the plain CASE oracle.  Validation (divergent supplied
    values rejected on every write path incl. the session-free
    sink/batch validators) is pinned by tests/test_generated_columns.py.
    """
    from ..sources.snapshots import snap_add_column

    tmp = tempfile.mkdtemp(prefix="snap-gen-")
    path = os.path.join(tmp, "t")
    try:
        ords = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        k = F.col("o_orderkey")
        snap_init(
            spark,
            ords.filter(k % 2 == 0).repartitionByRange(4, "o_orderkey"),
            path,
            stats_cols=["o_orderkey"],
        )
        snap_add_column(
            path, "price_band", "string",
            generated_as=(
                "CASE WHEN o_totalprice >= 150000.0 THEN 'HIGH' "
                "ELSE 'LOW' END"
            ),
            spark=spark,
        )
        snap_add_column(
            path, "key_bucket", "int",
            generated_as="CAST(o_orderkey % 7 AS INT)",
            spark=spark,
        )
        snap_append(spark, path, ords.filter(k % 2 == 1))
        out = (
            snap_read(spark, path)
            .filter(F.col("o_orderkey") % 5 == 0)
            .select("o_orderkey", "o_totalprice", "price_band",
                    "key_bucket")
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SNAPSHOT_GENERATED_COLS_SQL = """
SELECT o_orderkey,
       o_totalprice,
       CASE WHEN o_orderkey % 2 = 1 THEN
            CASE WHEN o_totalprice >= 150000.0 THEN 'HIGH'
                 ELSE 'LOW' END
       END AS price_band,
       CASE WHEN o_orderkey % 2 = 1 THEN CAST(o_orderkey % 7 AS INTEGER)
       END AS key_bucket
FROM orders
WHERE o_orderkey % 5 = 0
"""


def snapshot_identity_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity columns (``GENERATED ALWAYS AS IDENTITY``) under the
    hash comparator: init from the EVEN ``orders`` keys, declare a
    surrogate-key column (start 10, step 2), then append the ODD keys
    as a range-partitioned, key-sorted batch — the allocator reserves
    the exact range and ``zipWithIndex`` numbers rows in partition
    order, so for a key-sorted batch the assigned value is a pure
    function of the key's rank.  The oracle reproduces the assignment
    with ``ROW_NUMBER() OVER (ORDER BY key)``; pre-declaration rows
    must read NULL.  If the allocator double-assigns, skips, or the
    ordering contract drifts, the hash mismatches.  Uniqueness under
    CONCURRENT appends (where assignment is unique but not a rank
    function) is pinned by tests/test_identity_columns.py."""
    from ..sources.snapshots import snap_add_column

    tmp = tempfile.mkdtemp(prefix="snap-ident-")
    path = os.path.join(tmp, "t")
    try:
        ords = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        k = F.col("o_orderkey")
        snap_init(
            spark,
            ords.filter(k % 2 == 0).repartitionByRange(4, "o_orderkey"),
            path,
            stats_cols=["o_orderkey"],
        )
        snap_add_column(path, "sid", "bigint", identity=(10, 2))
        snap_append(
            spark,
            path,
            ords.filter(k % 2 == 1)
            .repartitionByRange(4, "o_orderkey")
            .sortWithinPartitions("o_orderkey"),
        )
        out = (
            snap_read(spark, path)
            .filter(F.col("o_orderkey") % 9 == 0)
            .select("o_orderkey", "o_orderpriority", "sid")
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


SNAPSHOT_IDENTITY_COLS_SQL = """
WITH odd AS (
  SELECT o_orderkey,
         10 + 2 * (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) AS sid
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT o.o_orderkey, o.o_orderpriority, odd.sid
FROM orders o LEFT JOIN odd USING (o_orderkey)
WHERE o.o_orderkey % 9 = 0
"""


def snapshot_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish over named refs (``sources/refs.py``) under
    the hash comparator: init the table from the NON-urgent ``orders``
    (the published state), fork a ``staging`` branch (zero-copy,
    in-table shallow clone), stage the urgent rows on the branch, run
    an audit fix-up THERE (a merge-on-read delete of low keys — which
    lands deletion vectors on BORROWED files, the ``_dv_path``
    ownership case), then fast-forward publish THROUGH THE DECLARATIVE
    GATE: ``snap_publish_branch(audits=...)`` re-validates the staged
    expectations against the branch head (DV-aware, session-free)
    before the one commit on main adopts the branch's files by
    reference; the branch is dropped after (published bytes survive as
    a protected remnant).  Main never sees the un-audited intermediate
    state.  The oracle recomputes the final state from the fixture:
    all orders minus the audited-out keys.  Money is projected to
    exact integer cents per row before the sum, so the hashed surface
    carries no floating aggregate."""
    from ..sources.refs import (
        snap_create_branch,
        snap_drop_branch,
        snap_publish_branch,
    )
    from ..sources.snapshots import delete_where_mor

    tmp = tempfile.mkdtemp(prefix="snap-wap-")
    path = os.path.join(tmp, "t")
    try:
        ords = table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        urgent = F.col("o_orderpriority") == "1-URGENT"
        snap_init(
            spark,
            ords.filter(~urgent),
            path,
            stats_cols=["o_orderkey"],
        )
        bdir = snap_create_branch(path, "staging")
        snap_append(spark, bdir, ords.filter(urgent))
        # audit fix-up on the branch: DVs land on borrowed files too
        delete_where_mor(spark, bdir, [("o_orderkey", "<", 150)])
        # the declarative gate re-checks the expectations the fix-up
        # was meant to satisfy — publish happens iff they hold
        snap_publish_branch(
            path,
            "staging",
            audits={
                "no_low_keys": "o_orderkey >= 150",
                "priority_present": "o_orderpriority IS NOT NULL",
            },
        )
        snap_drop_branch(path, "staging")
        out = (
            snap_read(spark, path)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("cents").alias("sum_cents"),
            )
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def pipeline_ingest_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ingest gate END-TO-END under the hash — the
    composition the r14 verdict called out as mutually exclusive until
    r15: a ROW-TRACKED corpus table, a batch staged on a branch, exact
    dedup against the corpus + a quality gate as merge-on-read deletes
    ON THE BRANCH, a CONCURRENT corpus append (so publish must take
    the r15 REBASE arm, re-drawing branch row-id slices under main's
    moved watermark), and a publish through the declarative audit gate
    (row + aggregate expectations).

    Fixture split (all closed-form in ``doc_id``): corpus = ``%3=1``,
    concurrent append = ``%3=2``, batch = ``%3=0`` plus PLANTED exact
    duplicates of corpus docs re-submitted under shifted ids
    (``+10_000_000``).  Dedup = one ``delete_keys_mor`` whose key set
    is the broadcast-semi-join of batch text-hashes against corpus
    text-hashes (never all-pairs; DVs land only on branch-born
    files, so the branch stays rebase-publishable); the quality gate
    deletes batch rows under 100 chars the same way.  Audits pin the
    gate's postconditions (no planted ids remain, keys unique, batch
    rows meet the floor) — publish refuses if any fix-up missed.

    Hashed surface: per-source ``(n_docs, n_ids, sum_chars)`` of the
    FINAL corpus, where ``n_ids = count(DISTINCT _row_id)`` — the
    oracle emits ``count(*)``, so a single duplicated or lost row id
    anywhere in the tracked rebase publish mismatches the hash.  The
    oracle recomputes the final relation in pure SQL: corpus ∪
    concurrent ∪ (batch rows ≥100 chars whose md5(text) is absent
    from the corpus)."""
    from ..sources.refs import snap_create_branch, snap_publish_branch
    from ..sources.snapshots import delete_keys_mor

    tmp = tempfile.mkdtemp(prefix="snap-ingest-")
    path = os.path.join(tmp, "corpus")
    try:
        d = F.col("doc_id")
        docs = table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text", "n_chars"
        )
        corpus = docs.filter(d % 3 == 1)
        concurrent = docs.filter(d % 3 == 2)
        planted = corpus.filter(d % 5 == 2).select(
            (d + 10_000_000).alias("doc_id"), "source", "text", "n_chars"
        )
        batch = docs.filter(d % 3 == 0).unionByName(planted)

        snap_init(
            spark, corpus, path, stats_cols=["doc_id"],
            row_tracking=True,
        )
        bdir = snap_create_branch(path, "ingest")
        snap_append(spark, bdir, batch)
        snap_append(spark, path, concurrent)  # main moves -> rebase

        th = F.md5(F.encode(F.col("text"), "UTF-8"))
        corpus_h = corpus.select(th.alias("th")).distinct()
        dup_ids = (
            batch.withColumn("th", th)
            .join(corpus_h, "th", "left_semi")
            .select("doc_id")
        )
        lowq_ids = batch.filter(F.col("n_chars") < 100).select("doc_id")
        delete_keys_mor(
            spark, bdir, dup_ids.unionByName(lowq_ids).distinct(),
            keys=["doc_id"],
        )
        from ..sources.snapshots import snap_count

        if snap_count(bdir) > 0:
            snap_publish_branch(
                path,
                "ingest",
                audits={
                    "batch_quality":
                        "doc_id % 3 <> 0 OR n_chars >= 100",
                },
                agg_audits={
                    "no_planted_dups":
                        "count(*) FILTER (WHERE doc_id >= 10000000)"
                        " = 0",
                    "keys_unique":
                        "count(DISTINCT doc_id) = count(*)",
                },
            )
        if snap_count(path) == 0:
            # degenerate empty fixture: nothing staged, nothing read
            return spark.createDataFrame(
                [],
                "source string, n_docs long, n_ids long, "
                "sum_chars bigint",
            )
        out = (
            snap_read(spark, path, with_row_ids=True)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("_row_id").alias("n_ids"),
                F.sum("n_chars").cast("bigint").alias("sum_chars"),
            )
        )
        return _materialize(spark, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


PIPELINE_INGEST_WAP_SQL = """
WITH corpus AS (
  SELECT doc_id, source, text, n_chars FROM documents
  WHERE doc_id % 3 = 1
), final AS (
  SELECT doc_id, source, n_chars FROM corpus
  UNION ALL
  SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 3 = 2
  UNION ALL
  SELECT d.doc_id, d.source, d.n_chars FROM documents d
  WHERE d.doc_id % 3 = 0 AND d.n_chars >= 100
    AND md5(d.text) NOT IN (SELECT md5(text) FROM corpus)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_ids,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM final GROUP BY source
"""


SNAPSHOT_WAP_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT
       ) AS sum_cents
FROM orders
WHERE o_orderkey >= 150
GROUP BY o_orderpriority
"""


QUERIES = {
    "snapshot_timetravel": snapshot_timetravel,
    # rotated IN (round 7, replacing the redundant ngrams text query):
    # the full conditional MERGE grammar under the driver's own hash
    "snapshot_merge_into": snapshot_merge_into,
    # rotated IN (round 9, replacing the redundant text_stats row): a
    # REAL Structured Streaming query through the native source+sink
    # (offset pacing, Arrow write path, txn-marked commits) under the
    # driver's own comparator
    "streaming_table_pipeline": streaming_table_pipeline,
    # rotated IN (round 10, replacing the redundant sliding_window
    # row): hidden partitioning end-to-end — init with a declared
    # spec, append, implied-predicate pruned scan — under the driver's
    # own hash
    "snapshot_partitioned_scan": snapshot_partitioned_scan,
    # rotated IN (round 11, replacing the redundant events_json row):
    # the incremental materialized-view composition (base commits ->
    # delta-fold refresh -> serving read) is the most algorithmically
    # delicate thing in the repo and deserves the driver's own
    # comparator, not just the pytest mirror
    "matview_orders": matview_orders,
    # rotated IN (round 12, replacing the redundant nl_join row): the
    # merge-on-read deletion-vector path (predicate + key-set deletes,
    # DV anti-join at read, manifest-pruned scan) under the driver's
    # own hash — the last AUX-only table-layer composition next to
    # column evolution
    "snapshot_delete_scan": snapshot_delete_scan,
    # rotated IN (round 13, replacing the redundant tumbling_window
    # row): column mapping (rename/drop/re-add + merge through the
    # mapping) is the biggest table-layer path that was still
    # AUX-only — now under the driver's own hash
    "snapshot_column_evolution": snapshot_column_evolution,
    # rotated IN (round 14, replacing the redundant minhash_signatures
    # row — an intermediate of dedup_near, which stays): row tracking
    # is r13's flagship and the most algorithmically delicate surface
    # that was still outside the driver's comparator
    "snapshot_row_ids": snapshot_row_ids,
    # rotated IN (round 15, replacing the redundant dedup_simhash row —
    # its pair-graph twin stays): the refs lifecycle (branch fork,
    # borrowed-file DVs, declarative audit gate, zero-copy publish,
    # protected-remnant drop) is r14's flagship and the most delicate
    # new surface outside the driver's comparator
    "snapshot_wap": snapshot_wap,
}
ORACLES = {
    "snapshot_timetravel": SNAPSHOT_TIMETRAVEL_SQL,
    "snapshot_merge_into": SNAPSHOT_MERGE_INTO_SQL,
    "streaming_table_pipeline": STREAMING_TABLE_PIPELINE_SQL,
    "snapshot_partitioned_scan": SNAPSHOT_PARTITIONED_SCAN_SQL,
    "matview_orders": MATVIEW_ORDERS_SQL,
    "snapshot_delete_scan": SNAPSHOT_DELETE_SCAN_SQL,
    "snapshot_column_evolution": SNAPSHOT_COLUMN_EVOLUTION_SQL,
    "snapshot_row_ids": SNAPSHOT_ROW_IDS_SQL,
    "snapshot_wap": SNAPSHOT_WAP_SQL,
}
AUX_QUERIES = {
    "snapshot_update_restore": snapshot_update_restore,
    "snapshot_prefix_scan": snapshot_prefix_scan,
    "streaming_cdf_feed": streaming_cdf_feed,
    "snapshot_generated_cols": snapshot_generated_cols,
    "snapshot_identity_cols": snapshot_identity_cols,
    "pipeline_ingest_wap": pipeline_ingest_wap,
}
AUX_ORACLES = {
    "snapshot_identity_cols": SNAPSHOT_IDENTITY_COLS_SQL,
    "pipeline_ingest_wap": PIPELINE_INGEST_WAP_SQL,
    "snapshot_update_restore": SNAPSHOT_UPDATE_RESTORE_SQL,
    "snapshot_prefix_scan": SNAPSHOT_PREFIX_SCAN_SQL,
    "streaming_cdf_feed": STREAMING_CDF_FEED_SQL,
    "snapshot_generated_cols": SNAPSHOT_GENERATED_COLS_SQL,
}
