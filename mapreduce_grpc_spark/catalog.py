"""Table catalog over the driver's parquet fixtures.

The reference's input model is an ordered list of newline-delimited text
files (/root/reference/src/mapreduce_spec.h:16,48-50); this engine's native
model is schema-first parquet (SURVEY.md §1.2).  Loaders here are thin
``spark.read.parquet`` wrappers so Catalyst keeps predicate pushdown and
column pruning — do NOT cache or materialize here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy parquet scan).

    ``events.ts`` is normalized to TIMESTAMP whatever the writer did:
    parquet TIMESTAMP(NANOS) (the driver fixtures — surfaced as a long
    via ``spark.sql.legacy.parquet.nanosAsLong`` and rebuilt as micros;
    no sub-microsecond values exist, and DuckDB's view of the same file
    is micros too) and TIMESTAMP_NTZ (writers that omit the UTC flag,
    e.g. DuckDB COPY — an NTZ instant is reinterpreted as UTC, matching
    how DuckDB itself reads it; the engine pins the UTC session TZ in
    ``tune_session``).  Event-time operators (watermarks, as-of joins)
    require the TIMESTAMP type, so without this normalization those
    queries fail on NTZ inputs.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table; also registers each as a temp view."""
    out = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
