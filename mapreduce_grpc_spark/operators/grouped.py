"""Grouped-map custom operators (``applyInPandas``).

Completes the Python-operator surface alongside ``mapInPandas``
(operators/multimodal.py) and ``applyInPandasWithState``
(streaming/sessionize.py): one whole group per pandas DataFrame, Arrow
transfer both ways, output schema declared up front.  This is the shape
for per-group logic Spark's built-ins can't express (custom models,
iterative per-key algorithms); the example here — per-user z-score
outlier detection — deliberately *is* SQL-expressible so the whole Python
path stays oracle-checked.

Determinism: group moments are computed with exact Decimal accumulation
(quantize each value to 6dp, exact sums of x and x²) and converted to
double only at the end, mirroring the engine's DECIMAL aggregation rule,
so Python, JVM, and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table

Z_THRESHOLD = 2.0

OUT_SCHEMA = (
    "user_id long, event_id long, value double, mean_v double, std_v double, "
    "z double"
)

_Q6 = Decimal("0.000001")


def _q6_int(v: float) -> int:
    """value -> integer micros with decimal HALF_UP semantics (exact)."""
    return int(Decimal(v).quantize(_Q6, rounding=ROUND_HALF_UP).scaleb(6))


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # Two-pass moments: quantized mean, then an EXACT sum of squared
    # deviations.  The one-pass E[x²]-mean² form differs from the oracle
    # in the last ulp (DuckDB fuses the multiply-subtract); the two-pass
    # form has no fused op to diverge on.  Arithmetic runs on integer
    # micros (exact, Python bigints for the sums — no int64 overflow);
    # Decimal appears only at the per-row quantization boundary and the
    # final exactly-rounded int->double conversions.
    import math

    vals = [_q6_int(v) for v in pdf["value"]]
    n = len(vals)
    s1 = sum(vals)  # exact integer micros
    mean = float(Decimal(s1).scaleb(-6)) / n
    mean6 = _q6_int(mean)
    var_num = sum((v - mean6) * (v - mean6) for v in vals)  # exact micros^2
    var = float(Decimal(var_num).scaleb(-12)) / n
    std = math.sqrt(var) if var > 0 else 0.0
    out = pdf[["user_id", "event_id", "value"]].copy()
    # emitted moments and z are rounded to 8dp: DuckDB's wide-DECIMAL ->
    # DOUBLE cast is not correctly rounded (1-ulp drift observed at scale
    # 12), so raw doubles cannot be hash-compared; rounding absorbs the
    # ulp on both sides.  The outlier filter uses the ROUNDED z so both
    # engines select identical row sets.
    out["mean_v"] = round(mean, 8)
    out["std_v"] = round(std, 8)
    if std > 0:
        out["z"] = ((out["value"] - mean) / std).round(8)
    else:
        out["z"] = 0.0
    return out[abs(out["z"]) > Z_THRESHOLD]


def zscore_outliers_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is >2 sigma from the user's mean (applyInPandas).

    Kept as the grouped-map *demonstration* twin (AUX, pytest-hash-checked):
    the driver-verified contract entry is the bit-identical JVM-native
    ``zscore_outliers`` below — at sf0.1 the Python grouped-map boundary
    costs ~6.7x the native plan (5.5 s vs 0.82 s, BENCH_r04), and the
    contract should hold the plan you'd run at 100x scale."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return ev.groupBy("user_id").applyInPandas(_zscore_group, OUT_SCHEMA)


# Oracle replicates the same arithmetic: 6dp-quantized values, exact sums,
# double conversion at the end.  The deviation is narrowed to DECIMAL(15,6)
# before squaring: a (19,6)x(19,6) product would need precision 39 > 38 and
# DuckDB silently falls back to DOUBLE there (observed as 1-ulp std drift);
# (15,6)x(15,6) -> (31,12) stays exact.  No '--' comments in oracle SQL —
# the registry collapses whitespace to one line.
ZSCORE_OUTLIERS_SQL = f"""
WITH q AS (
  SELECT user_id, event_id, value,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
),
mo AS (
  SELECT user_id,
         count(*) AS n,
         CAST(sum(v) AS DOUBLE) / count(*) AS mean_v,
         CAST(CAST(sum(v) AS DOUBLE) / count(*) AS DECIMAL(18,6)) AS mean6
  FROM q GROUP BY user_id
),
vr AS (
  SELECT q.user_id,
         CAST(sum(CAST(q.v - mo.mean6 AS DECIMAL(15,6))
                  * CAST(q.v - mo.mean6 AS DECIMAL(15,6))) AS DOUBLE) / mo.n
           AS var_v
  FROM q JOIN mo ON q.user_id = mo.user_id
  GROUP BY q.user_id, mo.n
),
stats AS (
  SELECT mo.user_id, mo.mean_v,
         CASE WHEN vr.var_v > 0 THEN sqrt(vr.var_v) ELSE 0.0 END AS std_v
  FROM mo JOIN vr ON mo.user_id = vr.user_id
)
SELECT q.user_id, q.event_id, q.value,
       round(stats.mean_v, 8) AS mean_v,
       round(stats.std_v, 8) AS std_v,
       CASE WHEN stats.std_v > 0
            THEN round((q.value - stats.mean_v) / stats.std_v, 8)
            ELSE 0.0 END AS z
FROM q JOIN stats ON q.user_id = stats.user_id
WHERE abs(CASE WHEN stats.std_v > 0
               THEN round((q.value - stats.mean_v) / stats.std_v, 8)
               ELSE 0.0 END)
      > {Z_THRESHOLD}
"""


def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-score semantics fully JVM-side — the 100 TB path (contract).

    This is the driver-verified contract entry (swapped in round 5 per the
    r4 verdict); the ``applyInPandas`` grouped-map twin above stays AUX as
    ``zscore_outliers_grouped`` with a path-equality test proving they are
    bit-identical.  Built-in expressions only (no Python worker, no Arrow
    boundary): two window passes over one hash partitioning on user_id —
    pass 1 the DECIMAL-exact mean, pass 2 the exact sum of squared 6dp
    deviations — mirroring the oracle's arithmetic term for term (cast
    double -> DECIMAL(18,6) is HALF_UP in both engines; (15,6)x(15,6) ->
    (31,12) products stay exact).  Measured 7.5x faster than the
    grouped-map form at sf0.1 (0.78 s vs 5.9 s min-of-3, noop sink; see
    PLANS.md); production pipelines should use this shape whenever the
    per-group logic is expressible, reserving applyInPandas for logic
    that is not.
    """
    from pyspark.sql import Window

    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    w = Window.partitionBy("user_id")
    v = F.col("value").cast("decimal(18,6)")
    stage1 = ev.select(
        "user_id",
        "event_id",
        "value",
        v.alias("v"),
        (F.sum(v).over(w).cast("double") / F.count("*").over(w)).alias("mean_v"),
        F.count("*").over(w).alias("n"),
    ).withColumn("mean6", F.col("mean_v").cast("decimal(18,6)"))
    dev = (F.col("v") - F.col("mean6")).cast("decimal(15,6)")
    stage2 = stage1.withColumn(
        "var_v", F.sum(dev * dev).over(w).cast("double") / F.col("n")
    )
    std = F.when(F.col("var_v") > 0, F.sqrt(F.col("var_v"))).otherwise(F.lit(0.0))
    z = F.when(
        F.col("std_v") > 0,
        F.round((F.col("value") - F.col("mean_v")) / F.col("std_v"), 8),
    ).otherwise(F.lit(0.0))
    return (
        stage2.withColumn("std_v", std)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > Z_THRESHOLD)
        .select(
            "user_id",
            "event_id",
            "value",
            F.round("mean_v", 8).alias("mean_v"),
            F.round("std_v", 8).alias("std_v"),
            "z",
        )
    )


QUERIES = {"zscore_outliers": zscore_outliers}
ORACLES = {"zscore_outliers": ZSCORE_OUTLIERS_SQL}

AUX_QUERIES = {"zscore_outliers_grouped": zscore_outliers_grouped}
AUX_ORACLES = {"zscore_outliers_grouped": ZSCORE_OUTLIERS_SQL}
