"""Table maintenance: small-file compaction.

Long-running ingest (micro-batch streaming sinks, per-task writers, the
reference's one-file-per-reduce-bucket output) accretes directories of
tiny files; at 100 TB the scan cost is then dominated by file-open
overhead and the driver's file listing, not bytes.  ``compact`` rewrites
a parquet/orc directory into ~target-sized files.

Sizing uses the files' actual on-disk bytes (not row counts — row width
varies), and the rewrite uses ``coalesce`` (narrow, no shuffle: each
output task concatenates whole input splits) unless the caller asks for
``repartition`` to also rebalance skewed file sizes.  The rewrite stages
into a sibling temp dir and swaps only after success, so a failed
compaction never corrupts the table (same publish-on-success discipline
as Spark's output committer; the reference's equivalent is the
delete-then-rename in /root/reference/src/master.h:143-165).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # match maxPartitionBytes default


def _data_bytes(path: str, suffix: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(suffix):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str, fmt: str = "parquet") -> int:
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(f".{fmt}")
    )


def compact(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_bytes: int = DEFAULT_TARGET_BYTES,
    rebalance: bool = False,
) -> int:
    """Rewrite ``path`` into ``ceil(bytes / target_bytes)`` files.

    Returns the new file count.  ``rebalance=True`` swaps the narrow
    ``coalesce`` for a full ``repartition`` shuffle — use when input
    file sizes are skewed enough that concatenation would leave uneven
    outputs.

    Concurrency contract: SINGLE WRITER, NO CONCURRENT READERS during the
    swap.  POSIX rename cannot exchange two directories atomically, so
    between the two renames below there is a window where ``path`` does
    not exist; a reader in that window fails its file listing, and a
    crash in that window leaves the data only in the ``*.pre-compact-*``
    backup.  Both failure modes are recoverable (nothing is deleted until
    the swap succeeds) and the raised error names the backup dir so
    recovery is discoverable; table formats with a transaction log
    (Iceberg/Delta) are the right tool where concurrent readers must see
    the table at all times.
    """
    size = _data_bytes(path, f".{fmt}")
    n_files = max(1, -(-size // target_bytes))  # ceil
    df = spark.read.format(fmt).load(path)
    df = df.repartition(n_files) if rebalance else df.coalesce(n_files)

    staging = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    df.write.format(fmt).mode("errorifexists").save(staging)
    # publish: swap the staged rewrite into place, keep nothing on failure
    backup = f"{path}.pre-compact-{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except OSError as e:
        try:
            os.rename(backup, path)  # restore the original on a failed swap
        except OSError:
            # restore also failed: surface where the data survives
            raise RuntimeError(
                f"compact swap failed and restore failed; original data is "
                f"intact at {backup!r}, staged rewrite at {staging!r}"
            ) from e
        raise
    shutil.rmtree(backup)
    return data_file_count(path, fmt)


# ---------------------------------------------------------------------------
# MERGE upsert + incremental rollup refresh (partition-overwrite mutations)
# ---------------------------------------------------------------------------

from contextlib import contextmanager  # noqa: E402

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


@contextmanager
def _dynamic_partition_overwrite(spark: SparkSession):
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str,
) -> int:
    """MERGE semantics onto a partitioned parquet table: rows in ``updates``
    replace target rows with the same key, new keys are inserted.

    Plain parquet has no row-level transaction log, so the scalable merge
    is rewrite-only-affected-partitions: list the partitions the batch
    touches (one bounded ``collect`` of distinct partition values — the
    batch's partition count, not its rows), anti-join those partitions'
    rows against the update keys, union the updates, and publish with
    DYNAMIC partition overwrite so untouched partitions are never
    rewritten or even read.  This is the parquet-native shape of
    Delta/Iceberg ``MERGE INTO`` with partition-level granularity; at
    100 TB the cost scales with the touched partitions, not the table.

    Requires the updates to carry ``partition_col``.  Partition-moving
    updates are handled by construction: the touched-partition set is the
    union of the batch's partitions AND every target partition currently
    holding an updated key (located with a key+partition column-pruned
    semi-join scan of the target), so a key's old copy is anti-joined out
    even when its partition value changed.  A batch with two rows for the
    same key is rejected (MERGE's multiple-matches error) rather than
    silently inserting both.  The extra key-locating scan reads only
    ``keys + partition_col`` (column-pruned); for key-stable partition
    columns it discovers nothing new, and the file-level variant
    (``sources/cow.py``) prunes it further with min-max envelopes.

    Non-atomicity note: the merged frame is MATERIALIZED (eager
    ``localCheckpoint``) before the dynamic overwrite, so the job never
    scans the same files it is deleting and a mid-write crash cannot
    corrupt the inputs of its own plan; but a crash between partition
    commits still leaves a partially refreshed table (no recovery
    marker).  The snapshot layer (``sources/snapshots.py``) is the
    committed fix for readers needing a consistent view.  Returns the
    number of partitions rewritten.
    """
    from .snapshots import _bad_key_rows

    tgt = spark.read.parquet(path)
    bad = _bad_key_rows(updates, keys)
    if bad:
        row = bad[0]
        if any(row[k] is None for k in keys):
            raise ValueError(
                f"merge_upsert: NULL merge key in batch row "
                f"{tuple(row[k] for k in keys)!r} — the anti-join can "
                "never match a NULL key, so the old row would survive "
                "alongside the new one; coalesce keys upstream"
            )
        raise ValueError(
            f"merge_upsert: update batch has multiple rows for key "
            f"{tuple(row[k] for k in keys)!r}; MERGE requires at most "
            "one source row per target key — dedup the batch first"
        )
    upd_keys = updates.select(*keys).distinct()
    batch_parts = {
        r[0] for r in updates.select(partition_col).distinct().collect()
    }
    # partitions where an updated key ALREADY lives (column-pruned scan of
    # keys + partition_col only; broadcast the batch's key set — a merge
    # batch is small relative to the table by assumption)
    old_parts = {
        r[0]
        for r in tgt.select(*keys, partition_col)
        .join(F.broadcast(upd_keys), keys, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    }
    # batch values keep their input type while values read back from the
    # target come type-inferred (e.g. str vs DateType for a date-shaped
    # partition dir) — dedup on the string form, keep native values for
    # the isin literals (Spark coerces them against the column type)
    parts_by_norm: dict[str, object] = {}
    for v in list(batch_parts) + list(old_parts):
        parts_by_norm.setdefault(str(v), v)
    parts = list(parts_by_norm.values())
    affected = tgt.filter(F.col(partition_col).isin(parts))
    remaining = affected.join(F.broadcast(upd_keys), keys, "left_anti")
    out = remaining.unionByName(updates.select(*tgt.columns))
    out = out.localCheckpoint(eager=True)
    with _dynamic_partition_overwrite(spark):
        (
            out.write.partitionBy(partition_col)
            .mode("overwrite")
            .parquet(path)
        )
    # dynamic overwrite replaces only partitions PRESENT in the output; a
    # partition fully emptied by the merge (every row's key migrated away)
    # writes zero rows and would silently survive — drop it explicitly.
    out_parts = {
        str(r[0]) for r in out.select(partition_col).distinct().collect()
    }
    for norm in parts_by_norm:
        if norm not in out_parts:
            pdir = os.path.join(path, f"{partition_col}={norm}")
            if os.path.isdir(pdir):
                shutil.rmtree(pdir)
    return len(parts)


# hourly rollup schema: the mergeable-state columns are exact (BIGINT
# count, DECIMAL sum) so incremental refresh composes associatively —
# storing a double sum would make refresh order observable in the low
# bits.  One fixed storage type everywhere (Spark's SUM widens decimals,
# so every write re-pins it or refreshed partitions would disagree with
# untouched ones and break parquet schema merge).
ROLLUP_DEC = "decimal(28,6)"
ROLLUP_STORE = "decimal(38,6)"


def rollup_build(events: DataFrame) -> DataFrame:
    """Hourly (window_start, event_type) rollup with mergeable state."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(ROLLUP_DEC))
            .cast(ROLLUP_STORE)
            .alias("sum_value_dec"),
        )
        .withColumn("d", F.to_date("window_start"))
    )


def rollup_init(spark: SparkSession, events: DataFrame, path: str) -> None:
    """Materialize the rollup, partitioned by day for pruned refresh."""
    rollup_build(events).write.partitionBy("d").mode(
        "errorifexists"
    ).parquet(path)


def rollup_refresh(
    spark: SparkSession, path: str, new_events: DataFrame
) -> int:
    """Incrementally fold a new event batch into the stored rollup.

    The continuous-aggregate refresh: aggregate ONLY the batch, read back
    ONLY the stored days the batch touches (partition-pruned scan), merge
    the mergeable states (counts add, DECIMAL sums add — exact and
    associative, so any refresh order yields the identical table), and
    dynamic-overwrite those day partitions.  Work scales with the batch
    and its touched days, never with rollup history.  Returns the number
    of day partitions rewritten.

    The merged frame is MATERIALIZED (eager ``localCheckpoint``) before
    the overwrite: without it the job would lazily re-scan the very
    partitions it is deleting, which happens to work because the scan
    stage finishes before commit but is fragile under stage retry /
    speculation.  A crash between partition commits still leaves a
    partially refreshed rollup; ``sources/snapshots.py`` gives readers a
    consistent committed view.
    """
    batch = rollup_build(new_events)
    days = [r[0] for r in batch.select("d").distinct().collect()]
    existing = spark.read.parquet(path).filter(F.col("d").isin(days))
    merged = (
        existing.unionByName(batch)
        .groupBy("window_start", "event_type", "d")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_dec").cast(ROLLUP_STORE).alias("sum_value_dec"),
        )
    )
    merged = merged.localCheckpoint(eager=True)
    with _dynamic_partition_overwrite(spark):
        merged.write.partitionBy("d").mode("overwrite").parquet(path)
    return len(days)


def rollup_read(spark: SparkSession, path: str) -> DataFrame:
    """Reader view over the stored rollup: exact state -> double."""
    return spark.read.parquet(path).select(
        "window_start",
        "event_type",
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Snapshot-committed rollup: the same continuous aggregate on the
# manifest layer (sources/snapshots.py), so refreshes are ISOLATED — a
# reader racing a refresh resolves one committed version, never a torn
# multi-partition state, and old versions stay time-travel readable.
# ---------------------------------------------------------------------------


def rollup_init_snap(
    spark: SparkSession, events: DataFrame, path: str
) -> int:
    """Materialize the rollup as a snapshot table, range-clustered on day
    so per-file ``d`` envelopes stay tight and refresh pruning works."""
    from .snapshots import snap_init

    r = rollup_build(events).repartitionByRange(8, "d")
    return snap_init(spark, r, path, stats_cols=["d"])


def rollup_refresh_snap(
    spark: SparkSession, path: str, new_events: DataFrame
) -> int:
    """Fold a new event batch into the snapshot rollup with file-level
    copy-on-write: only files whose day envelope intersects the batch's
    touched-day SET are read and rewritten (their untouched-day rows are
    carried through unchanged); every other file is carried by
    reference and stays byte-identical.  The commit is one atomic
    pointer swap, which closes the torn-reader race the
    dynamic-partition-overwrite refresh has.  Returns the number of
    touched days."""
    from .snapshots import _commit, _pspec, _write_data_files, read_manifest

    batch = rollup_build(new_events)
    days_native = [r[0] for r in batch.select("d").distinct().collect()]
    days_norm = sorted(str(d) for d in days_native)

    m = read_manifest(path)

    def _touches(entry: dict) -> bool:
        env = entry.get("stats", {}).get("d")
        if not env or env["min"] is None or env["max"] is None:
            return True  # no stats -> must assume the file is touched
        return any(env["min"] <= d <= env["max"] for d in days_norm)

    overlapping = [f for f in m["files"] if _touches(f)]
    carried = [f for f in m["files"] if not _touches(f)]

    if overlapping:
        old = spark.read.parquet(
            *[os.path.join(path, f["name"]) for f in overlapping]
        )
        pass_through = old.filter(~F.col("d").isin(days_native))
        to_merge = old.filter(F.col("d").isin(days_native))
        merged_days = (
            to_merge.unionByName(batch)
            .groupBy("window_start", "event_type", "d")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value_dec")
                .cast(ROLLUP_STORE)
                .alias("sum_value_dec"),
            )
        )
        out = pass_through.unionByName(merged_days)
    else:
        out = batch.select(
            "window_start", "event_type", "d", "n_events", "sum_value_dec"
        )
    new_entries = _write_data_files(
        spark, out.repartitionByRange(4, "d"), path, m["stats_cols"],
        pspec=_pspec(m),
    )
    _commit(
        path,
        carried + new_entries,
        m["stats_cols"],
        base_version=m["version"],
        schema_json=m.get("schema"),
        txns=dict(m.get("txns", {})),
        commit_info={"op": "rollup_refresh", "days": len(days_norm)},
        carry=m,
        adds=new_entries,
        removes=[f["name"] for f in overlapping],
    )
    return len(days_norm)


def rollup_read_snap(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Reader view over the snapshot rollup at a committed version."""
    from .snapshots import snap_read

    return snap_read(spark, path, version).select(
        "window_start",
        "event_type",
        "n_events",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    )
