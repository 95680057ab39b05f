"""Cross-engine-deterministic numeric aggregation helpers.

Floating-point sums are order-dependent, and Spark's parallel aggregation
order differs from DuckDB's sequential scan — so any double SUM/AVG would
diverge in the low bits and fail the driver's value-hash check.  Fix: cast
to DECIMAL first (exact, associative, order-independent), aggregate, then
cast the final result back to double.  Per-row double arithmetic (products,
differences) is IEEE-deterministic and needs no special handling.

Each Spark builder has a ``*_sql`` twin emitting the equivalent DuckDB
fragment so both sides are generated from one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"
DEC_SQL = "DECIMAL(18,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS {DEC_SQL})) AS DOUBLE)"


def davg(col: Column | str) -> Column:
    """Order-independent AVG as exact-sum/count in double."""
    return F.sum(_c(col).cast(DEC)).cast("double") / F.count(F.lit(1))


def davg_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS {DEC_SQL})) AS DOUBLE) / count(*)"
