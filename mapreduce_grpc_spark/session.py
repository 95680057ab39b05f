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
import tempfile
import zipfile

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
        # let Python data sources see query filters (snapshot_table's
        # batch reader prunes FILES from the manifest with them; the
        # exact row filter always stays with Spark)
        .config("spark.sql.python.filterPushdown.enabled", "true")
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
    # size shuffles to the session's actual cores instead of the 200-task
    # default an external session carries — purely a scheduling choice
    # (every registered query is order-insensitive), and on a cluster the
    # 2x-cores rule matches the scale notes above.  Only ever LOWER the
    # current value: a session someone already tuned (e.g. get_spark's
    # cores-sized setting) must not be second-guessed upward — measured
    # +20% suite cost from doubling task counts at fixture scale.
    try:
        cores = int(spark.sparkContext.defaultParallelism)
        current = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        target = max(8, min(2 * cores, 64))
        if target < current:
            spark.conf.set("spark.sql.shuffle.partitions", str(target))
    except Exception:
        pass
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.codegen.maxFields", "300"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-mutable on some builds; perf-only
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make the engine importable on executor Python workers.

    Cloudpickled closures (the RDD facade's mapper, UDTFs, pandas UDFs,
    streaming state functions) deserialize by module reference on the
    worker; workers inherit the driver JVM's environment, not the driver
    Python's sys.path, so unless the driver happens to run from the repo
    root the import fails.  Shipping the package once per SparkContext via
    addPyFile removes the working-directory dependency — the same
    mechanism used to deploy the engine to a real cluster.
    """
    sc = spark.sparkContext
    if getattr(sc, "_mrspark_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"mapreduce_grpc_spark-{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._mrspark_pkg_shipped = True
