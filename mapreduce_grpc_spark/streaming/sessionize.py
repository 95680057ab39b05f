"""Custom stateful streaming operator: sessionization with
``applyInPandasWithState``.

``session_window`` covers the built-in case (operators/windows.py); this
module is the pattern for session logic Spark's built-in can NOT express
(per-session custom accumulators, conditional session splits, etc.): a
user-defined state machine per key, state carried across micro-batches in
the state store, Arrow-batched data flow.

Semantics: per-user sessions with a 30-minute inactivity gap (identical to
the batch ``session_window`` query, which is what the oracle checks).
Emission is update-mode: sessions are (re)emitted when they grow; the
single-batch AvailableNow run therefore emits exactly the final sessions.

Determinism: per-session value sums replicate the engine's DECIMAL
routing (quantize each double to 6dp HALF_UP, exact Decimal accumulation,
one final float()) so the Python path hash-matches the DuckDB oracle just
like the JVM path does.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events import _events_stream, _stateful_shuffle_partitions

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds

OUT_SCHEMA = (
    "user_id long, session_start timestamp, n_events long, sum_value double"
)
# open-session carry: start/last as epoch micros, exact sum as string
STATE_SCHEMA = "start_us long, last_us long, n long, sum_str string"

_Q6 = Decimal("0.000001")


def _dec(v: float) -> Decimal:
    return Decimal(v).quantize(_Q6, rounding=ROUND_HALF_UP)


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    frames = list(pdfs)
    events = frames[0] if len(frames) == 1 else pd.concat(frames)
    ts_ns = events["ts"].to_numpy(dtype="int64", copy=False)
    values = events["value"].to_numpy(copy=False)
    # shuffle order within a group is arrival order (usually already
    # time-sorted from a sorted source); sort only when actually needed —
    # the O(n) monotonic check is ~free, the per-group sort is not
    if len(ts_ns) > 1 and not (ts_ns[:-1] <= ts_ns[1:]).all():
        order = np.argsort(ts_ns, kind="stable")
        ts_ns = ts_ns[order]
        values = values[order]
    ts_us = ts_ns // 1000

    sessions: list[tuple[int, int, Decimal]] = []  # (start_us, n, sum)
    if state.exists:
        start_us, last_us, n, sum_str = state.get
        cur = [start_us, last_us, n, Decimal(sum_str)]
    else:
        cur = None

    for t, v in zip(ts_us, values):
        if cur is not None and t - cur[1] >= SESSION_GAP_US:
            sessions.append((cur[0], cur[2], cur[3]))
            cur = None
        if cur is None:
            cur = [t, t, 0, Decimal(0)]
        cur[1] = t
        cur[2] += 1
        cur[3] += _dec(v)

    out_rows = sessions + ([(cur[0], cur[2], cur[3])] if cur else [])
    if cur:
        state.update((cur[0], cur[1], cur[2], str(cur[3])))

    n = len(out_rows)
    yield pd.DataFrame(
        {
            "user_id": np.full(n, user_id, dtype="int64"),
            "session_start": (
                np.fromiter((s[0] for s in out_rows), dtype="int64", count=n) * 1000
            ).view("datetime64[ns]"),
            "n_events": np.fromiter((s[1] for s in out_rows), dtype="int64", count=n),
            "sum_value": np.fromiter(
                (float(s[2]) for s in out_rows), dtype="float64", count=n
            ),
        }
    )


def run_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful sessionizer over the events stream to completion.

    The stateful stage's partition count is pinned while the stream runs:
    each state partition is an Arrow round-trip to a Python worker, so a
    200-partition default costs ~200 worker invocations per micro-batch
    for a handful of users each (measured 22.6 s -> ~5 s at sf0.1).
    """
    stream = _events_stream(spark, sf_dir)
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    with _stateful_shuffle_partitions(spark, cap=16):
        q = (
            stream.groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_group,
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


from ..operators.windows import SESSION_WINDOW_SQL  # noqa: E402

QUERIES = {"streaming_sessionize": run_streaming_sessionize}
ORACLES = {"streaming_sessionize": SESSION_WINDOW_SQL}
