"""Behavior-analytics operators (retention / funnel / transitions):
oracle parity + structural invariants.

AUX queries (the driver contract is at its 50-query cap), so the DuckDB
hash check the driver would run lives here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_grpc_spark import registry
from tests.oracle import assert_oracle_match

BEHAVIOR = ["retention_cohort", "funnel_steps", "event_transitions"]


@pytest.mark.parametrize("name", BEHAVIOR)
def test_behavior_oracle_parity(spark, sf_dir, name):
    df = registry.AUX_QUERIES[name](spark, sf_dir)
    assert_oracle_match(df, registry.AUX_ORACLES[name], sf_dir, name)


def test_funnel_counts_monotone_nonincreasing(spark, sf_dir):
    """Each funnel stage can only lose users (strictly-after semantics)."""
    rows = (
        registry.AUX_QUERIES["funnel_steps"](spark, sf_dir)
        .orderBy("stage")
        .collect()
    )
    assert [r.stage for r in rows] == ["1_view", "2_click", "3_purchase"]
    ns = [r.n_users for r in rows]
    assert ns[0] >= ns[1] >= ns[2]
    assert ns[0] > 0  # fixture has view events


def test_transition_probabilities_sum_to_one(spark, sf_dir):
    """p is a proper conditional distribution per from_type, and the pair
    count equals (events - users): every event except each user's last
    contributes exactly one transition."""
    from mapreduce_grpc_spark.catalog import table

    df = registry.AUX_QUERIES["event_transitions"](spark, sf_dir)
    sums = df.groupBy("from_type").agg(F.sum("p").alias("s")).collect()
    for r in sums:
        assert abs(r.s - 1.0) < 1e-9, r
    ev = table(spark, sf_dir, "events")
    expected_pairs = ev.count() - ev.select("user_id").distinct().count()
    total_n = df.agg(F.sum("n")).collect()[0][0]
    assert total_n == expected_pairs


def test_retention_offset_zero_equals_cohort_size(spark, sf_dir):
    """At week_offset 0 every cohort member is present (their first event
    is in that week), so n_users at offset 0 == cohort size."""
    from mapreduce_grpc_spark.catalog import table

    ev = table(spark, sf_dir, "events")
    cohort_sizes = {
        r.cohort_week: r.n
        for r in ev.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
        .groupBy("cohort_week")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        r.cohort_week: r.n_users
        for r in registry.AUX_QUERIES["retention_cohort"](spark, sf_dir)
        .filter(F.col("week_offset") == 0)
        .collect()
    }
    assert got == cohort_sizes
