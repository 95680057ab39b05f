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
