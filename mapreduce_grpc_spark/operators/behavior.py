"""User-behavior analytics over the ``events`` table: cohort retention,
conversion funnels, and event-transition (Markov) matrices.

The reference has no relational surface at all (SURVEY.md §2.B — its only
verbs are map/emit/reduce, /root/reference/external/include/
mr_task_factory.h:20-38), but each of these is a classic MapReduce workload
shape: retention is two chained group-bys, a funnel is a per-key staged
reduction, transitions are a per-key sorted scan — exactly the O5 "group +
sorted iteration" pattern (/root/reference/src/worker.h:83-117) that Spark
expresses with windows and co-partitioned joins instead of whole-bucket
in-memory maps.

Scale notes (100 TB events):

- Every per-user step (min-ts, lead(), staged mins) partitions by
  ``user_id`` — one hash shuffle each, reused across the chained steps by
  AQE/exchange-reuse where plans line up.  No step ever materializes
  per-user state on the driver.
- The final outputs are tiny (cohort-week x offset grid, 3 funnel rows,
  |event_type|² transition cells) — partial aggregation collapses them
  map-side.
- ``count(DISTINCT user_id)`` in retention runs as Spark's two-phase
  distinct-aggregate expansion; at extreme cardinality swap for
  ``approx_count_distinct`` (the engine's *_approx twins set the pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table

# funnel step order: strictly-later timestamps through these event types
FUNNEL_STEPS = ("view", "click", "purchase")


def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-event week, counted
    in each subsequent week they return.

    Shape: per-user min(ts) (shuffle on user_id) -> join back to events on
    user_id (co-partitioned, the join key reuses the aggregation's
    partitioning) -> count distinct users per (cohort_week, week_offset).
    Both engines truncate weeks to Monday and the offset is an exact
    multiple of 7 days, so the integer division is lossless.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    joined = ev.join(cohorts, "user_id")
    return (
        joined.select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_COHORT_SQL = """
WITH cohorts AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT c.cohort_week,
       CAST(datediff('day', c.cohort_week, date_trunc('week', e.ts)) / 7 AS INT)
         AS week_offset,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN cohorts c USING (user_id)
GROUP BY 1, 2
"""


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase.

    A user reaches step k when an event of step k's type exists strictly
    after their step-(k-1) reach time (first-touch semantics: each reach
    time is the *earliest* qualifying event).  Implemented as a chain of
    per-user min-aggregations; every join is on ``user_id`` against an
    already-user-grouped (hence deduplicated, user-unique) side, so each
    stage is one co-partitioned join + partial-agg — no window, no
    whole-history collection per user (the reference would buffer each
    user's full event list in its reduce map, /root/reference/src/
    worker.h:83).
    """
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    stages = [
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    ]
    for step in FUNNEL_STEPS[1:]:
        prev = stages[-1]
        stages.append(
            ev.filter(F.col("event_type") == step)
            .join(prev.select("user_id", F.col("t").alias("t_prev")), "user_id")
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
    out = None
    for i, (name, stage) in enumerate(zip(FUNNEL_STEPS, stages)):
        row = stage.agg(F.count("*").alias("n_users")).select(
            F.lit(f"{i + 1}_{name}").alias("stage"), "n_users"
        )
        out = row if out is None else out.unionAll(row)
    return out


FUNNEL_STEPS_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT '1_view' AS stage, count(*) AS n_users FROM s1
UNION ALL SELECT '2_click', count(*) FROM s2
UNION ALL SELECT '3_purchase', count(*) FROM s3
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams.

    ``lead()`` over (user_id, ordered by ts with event_id tie-break) pairs
    each event with its successor — one shuffle on user_id, then the
    |types|² count grid collapses map-side.  The transition probability is
    an exact bigint/bigint division, IEEE-identical across engines.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    grid = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    total = Window.partitionBy("from_type")
    return grid.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") / F.sum("n").over(total)).alias("p"),
    )


EVENT_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
),
grid AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
FROM grid
"""


QUERIES: dict = {}
ORACLES: dict = {}

AUX_QUERIES = {
    "retention_cohort": retention_cohort,
    "funnel_steps": funnel_steps,
    "event_transitions": event_transitions,
}

AUX_ORACLES = {
    "retention_cohort": RETENTION_COHORT_SQL,
    "funnel_steps": FUNNEL_STEPS_SQL,
    "event_transitions": EVENT_TRANSITIONS_SQL,
}
