"""Input connectors.

The reference reads exactly one format: newline-delimited text, split into
byte ranges (/root/reference/src/worker.h:74-77, src/file_shard.h:43-89).
``read_text`` covers that 1:1 (Hadoop TextInputFormat does the same
newline-aligned splitting; split size via spark.sql.files.maxPartitionBytes
≈ the reference's map_kilobytes).  The rest are the standard schema-first
connectors the reference lacks (SURVEY.md §2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """One row per line, column ``value`` — the reference's input model."""
    return spark.read.text(paths)


def read_text_kv(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Read the reference's ``key,value`` line format.

    First-comma split, mirroring /root/reference/src/worker.h:92-94: the
    key is everything before the first comma, the value everything after
    (values may contain commas, keys may not).
    """
    lines = spark.read.text(paths)
    key = F.substring_index("value", ",", 1)
    rest = F.expr("substring(value, length(substring_index(value, ',', 1)) + 2)")
    return lines.select(key.alias("key"), rest.alias("value"))


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC is the other columnar format large data estates hold; Spark's
    native reader gives the same pushdown/pruning as parquet (asserted in
    tests/test_sources.py)."""
    return spark.read.orc(path)
