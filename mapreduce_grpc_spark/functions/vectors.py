"""Vector expressions over array<float> embedding columns.

All folds are sequential left-to-right in both engines (Spark
``aggregate`` over array order; DuckDB ``list_reduce`` over a 0.0-prepended
list), with every element cast to double before multiplying — so dot
products and cosines are bit-identical across Spark and the DuckDB oracle,
and similarity rankings cannot diverge.

JVM-side but NOT codegen'd: ``zip_with``/``aggregate``/``transform``
lambdas run interpreted per-element with no common-subexpression
elimination (measured 20x on shingling — see operators/dedup.py).  They
are kept here because the sequential fold is what gives oracle
bit-parity; the measured alternative (Arrow pandas_udf numpy dot with
8 dp rounding on both engines) is recorded in PLANS.md — at dim=64
fixture scale the fold wins on total time (no serialization boundary),
at 100 TB the verification stage should switch to the pandas_udf path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<float|double> columns."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform({a}, "
        f"(x, i) -> CAST(x AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (s, v) -> s + v)"
    )


def norm_sq(a: Column) -> Column:
    return dot(a, a)


def norm_sq_sql(a: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform({a}, "
        f"(x, i) -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (s, v) -> s + v)"
    )


def cosine(a: Column, b: Column) -> Column:
    """dot / sqrt(|a|^2 * |b|^2) — single-sqrt form, used identically in SQL."""
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / sqrt({norm_sq_sql(a)} * {norm_sq_sql(b)}))"
