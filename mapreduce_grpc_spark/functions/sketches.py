"""Mergeable frequency sketch (count-min) over the token stream.

Completes the engine's approximate-aggregation trio — HLL distinct
counts (``distinct_count_approx``), t-digest percentiles
(``group_percentiles_approx``), and now point-frequency estimation —
with the one frequency structure that stays MERGEABLE: per-partition
(or per-micro-batch) sketches combine by counter addition, so the same
code path serves batch partial aggregation and streaming state.  The
exact ``heavy_hitters`` operator (operators/text.py) answers "which
words are heavy" exactly; the sketch answers "how often is word w"
for ANY w in O(eps⁻¹ · ln(1/δ)) fixed memory — at web vocabulary
sizes (10⁸+ words) that is the difference between a bounded-size
broadcastable summary and a vocabulary-sized shuffle.

Uses Spark's JVM-side ``count_min_sketch`` aggregate (one pass,
map-side partial sketches merged by the engine) and reads the sketch
back through ``org.apache.spark.util.sketch.CountMinSketch`` — no
Python-side counting anywhere.  Guarantees (seeded, so deterministic
here): estimate >= true count always (overcount-only), and
estimate <= true + eps * N with probability >= confidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CMS_EPS = 0.0001       # overcount bound: eps * total tokens
CMS_CONFIDENCE = 0.99
CMS_SEED = 42


def build_cms(
    df: DataFrame,
    col: str,
    eps: float = CMS_EPS,
    confidence: float = CMS_CONFIDENCE,
    seed: int = CMS_SEED,
) -> bytes:
    """One-pass mergeable count-min sketch of ``df[col]`` (serialized)."""
    row = df.agg(
        F.count_min_sketch(
            col, F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("s")
    ).collect()[0]
    return bytes(row.s)


def _read_cms(spark: SparkSession, sketch: bytes):
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(sketch)
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)


def cms_estimates(
    spark: SparkSession, sketch: bytes, items: list[str]
) -> dict[str, int]:
    """Point-frequency estimates for ``items`` from a serialized sketch."""
    cms = _read_cms(spark, sketch)
    return {it: int(cms.estimateCount(it)) for it in items}


def cms_total(spark: SparkSession, sketch: bytes) -> int:
    return int(_read_cms(spark, sketch).totalCount())


def merge_cms(spark: SparkSession, sketches: list[bytes]) -> bytes:
    """Combine sketches by counter addition (same eps/confidence/seed) —
    the property that lets per-shard / per-micro-batch sketches roll up
    into one corpus summary without touching the data again."""
    if not sketches:
        raise ValueError("merge_cms: no sketches")
    acc = _read_cms(spark, sketches[0])
    for s in sketches[1:]:
        acc.mergeInPlace(_read_cms(spark, s))
    jvm = spark._jvm
    bos = jvm.java.io.ByteArrayOutputStream()
    acc.writeTo(bos)
    return bytes(bos.toByteArray())
