"""Stream-stream interval join: view events ⋈ purchase events within 1 h.

The last Structured Streaming surface in the engine's matrix (stateless
transforms, windowed aggs, stateful sessionize, bounded-state dedup,
stream-static enrich — and now the double-ended stateful join).  The
reference engine cannot express this at all: its barrier model
(/root/reference/src/master.h:297-299) requires both inputs finished
before any reduce; a stream-stream join is precisely the workload where
neither input ever finishes.

Semantics: an attribution join — each ``view`` pairs with every
``purchase`` by the same user strictly after it and within
``ATTRIBUTION_WINDOW``.  Both sides carry watermarks, so the state store
evicts views once no purchase can still arrive inside the window
(Spark derives the view-side retention from the join's time bound plus
the purchase watermark) — bounded state on unbounded streams.

At 100 TB-a-day scale the join key is (user_id, time-bucket): Spark
hash-partitions both streams by the equality keys, so the state store
shards by user across executors; the range predicate prunes within a
shard.  Skewed users are the same salting problem as the batch joins
(functions/skew.py).  ``AvailableNow`` + append mode here makes the
streaming answer equal to the batch interval join, which is exactly what
the DuckDB oracle checks.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import _events_stream, _stateful_shuffle_partitions

ATTRIBUTION_WINDOW = "1 hour"
WATERMARK_DELAY = "2 hours"


def attribution_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """The watermarked interval-join plan over two prepared streams.

    ``views``: (user_id, view_id, view_ts) with a watermark on view_ts;
    ``purchases``: (user_id, purchase_id, purchase_ts, value) with a
    watermark on purchase_ts.  Factored out so tests can drive the same
    plan from a controlled multi-batch file source."""
    return views.join(
        purchases,
        [
            views.user_id == purchases.user_id,
            purchases.purchase_ts > views.view_ts,
            purchases.purchase_ts
            <= views.view_ts + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"),
        ],
    ).select(
        views.user_id,
        "view_id",
        "purchase_id",
        # integer milliseconds: exact cross-engine (no fractional-second
        # rounding divergence between epoch casts)
        (F.unix_millis("purchase_ts") - F.unix_millis("view_ts")).alias(
            "lag_ms"
        ),
        "value",
    )


def run_streaming_interval_join(
    spark: SparkSession, sf_dir: str, state_partitions: int = 8
) -> DataFrame:
    """Execute the view->purchase attribution join to completion.

    ``state_partitions`` exists so tools/scale_check.py can sweep the
    state-store sizing rule below with measured rows."""
    name = f"stream_ijoin_{uuid.uuid4().hex[:8]}"
    # the two-sided join state store pays a per-partition commit cost on
    # BOTH sides each micro-batch — far higher than aggregation state.
    # Measured at sf0.1 (~40k state rows): 7.3 s @32 partitions, 4.5 s @8,
    # 3.0 s @4 — the state work is partition-overhead-bound at fixture
    # scale.  8 balances that overhead against parallelism headroom; on a
    # real cluster size this knob to state volume / executor memory, not
    # core count.
    # The AUX oracle below is a plain batch self-join: it equals the
    # streaming answer only when each source processes all files in ONE
    # micro-batch (multi-batch runs may legitimately watermark-suppress
    # pairs the batch oracle includes — proven deliberately in the
    # multi-batch eviction test).  Pin maxFilesPerTrigger high so a
    # many-file directory-shaped events table cannot split across
    # triggers and flake oracle parity.
    single_batch = 1_000_000
    with _stateful_shuffle_partitions(spark, cap=state_partitions):
        views = (
            _events_stream(spark, sf_dir, max_files_per_trigger=single_batch)
            .filter(F.col("event_type") == "view")
            .select(
                "user_id",
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", WATERMARK_DELAY)
        )
        purchases = (
            _events_stream(spark, sf_dir, max_files_per_trigger=single_batch)
            .filter(F.col("event_type") == "purchase")
            .select(
                "user_id",
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
                "value",
            )
            .withWatermark("purchase_ts", WATERMARK_DELAY)
        )
        joined = attribution_join(views, purchases)
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


STREAMING_INTERVAL_JOIN_SQL = """
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       epoch_ms(p.ts) - epoch_ms(v.ts) AS lag_ms,
       p.value
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
"""


QUERIES: dict = {}
ORACLES: dict = {}

AUX_QUERIES = {"streaming_interval_join": run_streaming_interval_join}
AUX_ORACLES = {"streaming_interval_join": STREAMING_INTERVAL_JOIN_SQL}
