"""Query/operator implementations.

Each module exposes query callables with signature
``(spark: SparkSession, sf_dir: str) -> DataFrame`` plus two dicts:
``QUERIES`` (name -> callable) and ``ORACLES`` (name -> equivalent DuckDB
ANSI-SQL).  ``mapreduce_grpc_spark.registry`` merges them all for the driver
contract in ``/root/repo/__spark_entry__.py``.

Rule: computed columns are aliased identically in the Spark plan and the
oracle SQL (the driver sorts columns by name before value-hashing), and any
order-sensitive double aggregation goes through an exact DECIMAL
accumulation then a final cast to double, so Spark's parallel aggregation
order cannot diverge from DuckDB's.
"""
