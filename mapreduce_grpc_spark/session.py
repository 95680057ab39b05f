"""SparkSession factory.

The reference's "cluster spec" is a per-job ini file naming workers and shard
sizes (/root/reference/src/mapreduce_spec.h:13-21).  In Spark the cluster is
owned by the session, so the analogue is a tuned SparkSession builder.

Scale notes (100 TB target, local[32] test rig):
 - AQE on: runtime partition coalescing + skew-join splitting replace the
   reference's static one-task-per-shard plan (src/file_shard.h:43-89).
 - shuffle.partitions defaults to the core count locally; on a real cluster
   this should be ~2-3x total cores, or left to AQE's initialPartitionNum.
 - maxPartitionBytes is the analogue of the reference's `map_kilobytes`
   (src/mapreduce_spec.h:57-58) — 128 MB default is right for 100 TB parquet.
 - session timezone pinned to UTC so window/bucketing semantics are
   deterministic and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mapreduce_grpc_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession tuned for this engine."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # wide aggregates (e.g. the 60-vote SimHash) fall out of
        # WholeStageCodegen at the default 100-field cap — measured ~30%
        .config("spark.sql.codegen.maxFields", "300")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created session.

    The driver contract hands ``queries()`` callables an arbitrary session;
    these confs are the ones that affect query *semantics* (timezone) or are
    safe wins (AQE), and are all runtime-mutable.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet stores TIMESTAMP(NANOS) which vanilla Spark refuses to
    # read; read as long and let catalog.table() rebuild a micros timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.codegen.maxFields", "300"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-mutable on some builds; perf-only
    return spark
