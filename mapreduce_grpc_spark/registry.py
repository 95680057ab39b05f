"""Central query + oracle registry (the driver contract's source of truth).

Mirrors the reference's UDF registry (O11, /root/reference/src/
mr_task_factory.cc:30-88): a process-global mapping from a job name to an
executable — except here the executable is a DataFrame-plan builder and each
entry carries an equivalent DuckDB SQL oracle for the driver's correctness
gate.

``QUERIES[name](spark, sf_dir) -> DataFrame``; ``ORACLES[name]`` is ANSI SQL
over views named region/nation/customer/supplier/part/orders/lineitem/
events/documents/embeddings.  Queries without an oracle entry are checked
rows-only by the driver (non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(module) -> None:
    for name, fn in module.QUERIES.items():
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
    for name, sql in module.ORACLES.items():
        if "--" in sql:
            # whitespace collapsing below would merge everything after a
            # line comment into it, truncating the query
            raise ValueError(f"oracle {name!r} contains a '--' SQL comment")
        ORACLES[name] = " ".join(sql.split())


def _load() -> None:
    from .operators import text

    for mod in (text,):
        _register(mod)
    for extra in ("relational", "dedup", "similarity", "windows", "multimodal",
                  "grouped", "udfs"):
        try:
            mod = __import__(f"mapreduce_grpc_spark.operators.{extra}", fromlist=[extra])
        except ImportError:
            continue
        _register(mod)
    from .streaming import events as streaming_events
    from .streaming import sessionize as streaming_sessionize

    _register(streaming_events)
    _register(streaming_sessionize)

    from .compat import mapreduce as compat_mapreduce

    _register(compat_mapreduce)


_load()
