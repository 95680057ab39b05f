"""Output sinks, including the reference's partitioned sorted text sink.

Reference output contract (O7 + Appendix B of SURVEY.md):
 - ≤ ``n_output_files`` files, one per non-empty hash bucket
   (/root/reference/src/master.h:143-165);
 - rows routed by ``hash131(key) % R`` at write time
   (/root/reference/src/mr_tasks.h:24-32,45-47);
 - keys lexicographically sorted within each file
   (/root/reference/src/worker.h:108-117);
 - ``key,value`` lines (/root/reference/src/mr_tasks.h:114);
 - output directory must not pre-exist ≡ Spark's default
   mode("errorifexists") (/root/reference/src/mapreduce_spec.h:88-91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import hash131


def write_partitioned_sorted(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_buckets: int,
    path: str,
    mode: str = "errorifexists",
) -> None:
    """Materialize the reference's output: R hash buckets, sorted keys.

    ``repartition(R, bucket)`` co-locates each bucket in one task;
    ``partitionBy("bucket")`` writes one directory per bucket (so exactly
    one file per non-empty bucket); ``sortWithinPartitions`` delivers the
    within-bucket key order.  All engine-side — no driver collection.
    """
    # sort on the KEY column, not the concatenated line: for keys with
    # characters below ',' (e.g. '!'), line order and key order diverge
    # ('a!x,1' < 'a,1' as lines though 'a' < 'a!x' as keys) — the line is
    # only built after the sort
    out = (
        df.withColumn("bucket", hash131(F.col(key_col), n_buckets))
        .repartition(n_buckets, F.col("bucket"))
        .sortWithinPartitions("bucket", key_col, value_col)
        .select(
            "bucket",
            F.concat_ws(",", F.col(key_col), F.col(value_col)).alias("line"),
        )
    )
    out.write.mode(mode).partitionBy("bucket").text(path)


def write_parquet(df: DataFrame, path: str, mode: str = "errorifexists",
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted table for shuffle-free recurring joins.

    Both sides of a recurring equi-join written with the same bucket count
    and key join with ZERO exchanges (asserted in tests/test_bucketing.py)
    — at 100 TB this converts the nightly fact⋈fact join from the dominant
    shuffle into a co-located merge.  This is the durable version of the
    reference's hash-bucket layout (same idea as its R intermediate
    buckets, /root/reference/src/mr_tasks.h:45-76, but schema-aware and
    sorted for merge joins).
    """
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )


def write_orc(df: DataFrame, path: str, mode: str = "errorifexists") -> None:
    df.write.mode(mode).orc(path)
