"""mapreduce_grpc_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of ``distribuitech/mapreduce_grpc`` (a C++11 MapReduce-over-gRPC
framework, surveyed in /root/repo/SURVEY.md), extended with the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) required at 100 TB scale.

Design stance (SURVEY.md §4.3): the reference has *no* optimizer, planner or
type system — its whole surface is map/shuffle/sort/reduce over string pairs.
Everything it computes is expressible with stock DataFrame operators, so this
engine is API + configuration on top of Catalyst/Tungsten, not a custom
execution engine.  UDFs appear only where Spark genuinely lacks an operator
(none so far); everything else is built-in `pyspark.sql.functions`, i.e.
JVM-side, codegen'd, Arrow-friendly.

Layout:
    session.py          SparkSession factory tuned for the fixture scales
    catalog.py          loaders for the /root/testdata parquet tables
    registry.py         central query + DuckDB-oracle registry (driver contract)
    functions/          reusable column expressions (hashes, tokenizer, vectors)
    operators/          query implementations (relational, text, dedup, ...)
    sources/            readers/writers incl. the reference's text KV format
    compat/             the MapReduce-compatible facade (map/reduce callables)
    streaming/          Structured Streaming variants of the event queries
    plans/              plan-inspection helpers (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"
