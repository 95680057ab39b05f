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


def sq_l2(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance (same bit-parity rationale as
    :func:`dot`: fixed left-to-right association in both engines)."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def sq_l2_sql(a: str, b: str) -> str:
    d = f"(CAST(x AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    return (
        f"list_reduce(list_prepend(0.0, list_transform({a}, "
        f"(x, i) -> {d} * {d})), (s, v) -> s + v)"
    )


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-batched numpy cosine, rounded to 8 dp — the 100 TB path.

    Measured at sf0.1 (PLANS.md "Measured experiments"): 2.7x faster than
    the interpreted fold on the blocked pair stage (0.84 s vs 2.24 s
    median) and produces the identical >=0.4 pair set after rounding.
    The contract queries keep the fold anyway: numpy's pairwise summation
    order differs from the sequential fold, so pre-rounding values differ
    in the low bits and an 8 dp round can land on the far side of a
    decimal boundary from DuckDB's — a tiny per-value flake risk the
    hash-based correctness gate must not carry.  Production deployments
    verifying billions of candidate pairs should swap this in (and bound
    results against the fold on a sample, as test_properties does).
    """
    return _cosine_arrow_udf()(a, b)


def _cosine_arrow_udf():
    import numpy as np
    import pandas

    from pyspark.sql.types import DoubleType

    def _cos(xs, ys):
        if len(xs) == 0:
            # np.stack raises on zero arrays; empty partitions/batches are
            # routine on a real cluster
            return pandas.Series([], dtype="float64")
        ma = np.stack(xs.to_numpy()).astype(np.float64)
        mb = np.stack(ys.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.sqrt(np.einsum("ij,ij->i", ma, ma) * np.einsum("ij,ij->i", mb, mb))
        return pandas.Series(np.round(num / den, 8))

    # annotations set explicitly (this module uses `from __future__ import
    # annotations`, under which inline hints become strings that pandas_udf's
    # signature inspection cannot resolve against function-local imports)
    _cos.__annotations__ = {
        "xs": pandas.Series,
        "ys": pandas.Series,
        "return": pandas.Series,
    }
    return F.pandas_udf(DoubleType())(_cos)
