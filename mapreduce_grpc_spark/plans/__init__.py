"""Physical-plan inspection helpers (scale-hygiene assertions)."""

from .explain import (  # noqa: F401
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregation,
    pushed_filters,
    read_schema_columns,
)
