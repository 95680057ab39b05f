"""Inspect physical plans for the properties that matter at 100 TB.

The reference has no optimizer to inspect (SURVEY.md §4.1); for this engine
the optimizer IS the product, so these helpers let tests pin the plan
properties each operator depends on:

 - predicate pushdown reached the parquet scan (``PushedFilters``),
 - column pruning reached the scan (``ReadSchema``),
 - small dimensions joined via broadcast, not shuffle,
 - aggregations run partial (map-side) before the exchange.

A plan regression (e.g. a refactor that inserts a UDF and silently kills
pushdown) then fails CI instead of shipping a 100x slowdown.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when HashAggregate runs in partial mode before the exchange."""
    plan = formatted_plan(df)
    return bool(re.search(r"Functions \[\d+\]: partial_", plan)) or "partial_" in plan
