"""Skew-mitigation utilities: salting for hot keys.

AQE's skew-join splitting handles most cases at runtime; explicit salting
remains the tool when (a) a *aggregation* key is hot (AQE does not split
aggregations), or (b) the skew is known ahead of time and you want a
deterministic plan.  Both helpers preserve exact semantics — tests assert
equality with the unsalted plan.

The reference has no analogue: its hash131 partitioner sends every
occurrence of a hot key to one reducer and that reducer materializes the
whole group in memory (/root/reference/src/worker.h:83) — the precise
failure mode salting exists to prevent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase count per key: (key, salt) partial counts, then key totals.

    Phase 1 spreads a hot key over ``n_salts`` reducers; phase 2 merges
    ``n_salts`` partial rows per key — bounded, tiny.  Deterministic salt
    (hash of the whole row via monotonically varying spark_partition_id +
    a cheap hash) is unnecessary: any distribution works because counts
    are associative; we use a random-ish but cheap pmod of the row hash.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col(key), F.spark_partition_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("cnt"))


def salted_sum(df: DataFrame, key: str, value: Column | str,
               n_salts: int = 16) -> DataFrame:
    """Two-phase DECIMAL-exact sum per key under salting."""
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col(key), F.spark_partition_id()), F.lit(n_salts))
    ).withColumn("_v", v.cast("decimal(18,6)"))
    partial = salted.groupBy(key, "_salt").agg(F.sum("_v").alias("_s"))
    return partial.groupBy(key).agg(F.sum("_s").cast("double").alias("total"))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8) -> DataFrame:
    """Equi-join robust to hot keys on the big side.

    Big side gets a random-ish salt in [0, n_salts); the small side is
    replicated n_salts times with every salt value, so each (key, salt)
    pair still meets its match.  Shuffle load for a hot key spreads over
    n_salts tasks at the cost of replicating the small side.
    """
    b = big.withColumn(
        "_salt", F.pmod(F.hash(F.col(key), F.spark_partition_id()), F.lit(n_salts))
    )
    s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    joined = b.join(s, [key, "_salt"]).drop("_salt")
    return joined
