"""Custom stateful streaming operator: per-user running anomaly
detection (``applyInPandasWithState``).

``streaming/sessionize.py`` is the session-shaped member of the custom-
stateful family; this is the SCORING-shaped one: a per-key state vector
of exact running moments (count, sum, sum-of-squares) carried across
micro-batches, each event scored against the moments of its PRIOR
events only — the online z-score an ingestion pipeline uses to flag
broken sensors / abusive users without a second pass.  (Spark 4's
successor API, ``transformWithStateInPandas``, expresses the same
operator with named state variables; its Python driver worker needs
``google.protobuf``, absent from this container, so the operator
targets the stable ``applyInPandasWithState`` surface — the state
model and semantics transfer 1:1.)

Semantics (what the oracle checks): events ordered by (ts, event_id)
per user; an event with at least ``MIN_PRIOR`` predecessors whose
|value - prior_mean| / prior_std exceeds ``Z_THRESH`` is an anomaly.
Scoring strictly against priors makes the result prefix-decomposable,
so ANY micro-batch split of a time-ordered feed yields the identical
answer — the property the two-run equality test pins.

Determinism: values quantize to 6dp Decimals; sums and sums-of-squares
accumulate exactly (the sessionize playbook), convert to double once,
and the float formula (mean = s/n; var = ss/n - mean²; z = (v-mean)/√var)
is mirrored operation-for-operation in the DuckDB oracle's window form,
so the hashes match bit-for-bit; z rounds by HALF_UP quantize (both
engines' ``round``), never Python's banker's ``round``.

At 100 TB: state is 3 scalars per user (RocksDB state store); each
micro-batch shuffles only its own events by user; scoring is one Arrow
round-trip per state partition.  The reference engine has no streaming
or state at all (SURVEY.md §2.B).
"""

from __future__ import annotations

import math
import uuid
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events import _events_stream, _stateful_shuffle_partitions

MIN_PRIOR = 20   # events needed before scoring starts
Z_THRESH = 3.0

OUT_SCHEMA = (
    "user_id long, event_id long, value double, z double, prior_n long"
)
_STATE_SCHEMA = "n long, sum_str string, sumsq_str string"

_Q6 = Decimal("0.000001")


def _dec6(v: float) -> Decimal:
    return Decimal(v).quantize(_Q6, rounding=ROUND_HALF_UP)


def _score_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    frames = list(pdfs)
    events = frames[0] if len(frames) == 1 else pd.concat(frames)
    # canonical per-user order: (ts, event_id) — within-batch arrival
    # order is shuffle order, not time order
    events = events.sort_values(["ts", "event_id"], kind="stable")
    ids = events["event_id"].to_numpy(dtype="int64", copy=False)
    values = events["value"].to_numpy(copy=False)

    if state.exists:
        n, sum_str, sumsq_str = state.get
        s, ss = Decimal(sum_str), Decimal(sumsq_str)
    else:
        n, s, ss = 0, Decimal(0), Decimal(0)

    out: list[tuple[int, float, float, int]] = []
    for eid, v in zip(ids, values):
        if n >= MIN_PRIOR:
            mean = float(s) / n
            var = float(ss) / n - mean * mean
            if var > 0.0:
                z = (float(v) - mean) / math.sqrt(var)
                if abs(z) > Z_THRESH:
                    zr = float(Decimal(z).quantize(_Q6, ROUND_HALF_UP))
                    out.append((int(eid), float(v), zr, n))
        q = _dec6(float(v))
        n += 1
        s += q
        ss += q * q
    state.update((n, str(s), str(ss)))

    m = len(out)
    yield pd.DataFrame(
        {
            "user_id": np.full(m, user_id, dtype="int64"),
            "event_id": np.fromiter(
                (r[0] for r in out), dtype="int64", count=m
            ),
            "value": np.fromiter(
                (r[1] for r in out), dtype="float64", count=m
            ),
            "z": np.fromiter((r[2] for r in out), dtype="float64", count=m),
            "prior_n": np.fromiter(
                (r[3] for r in out), dtype="int64", count=m
            ),
        }
    )


def run_streaming_anomaly(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run the stateful anomaly scorer over the events stream to
    completion (AvailableNow) and return the flagged events.

    ``max_files_per_trigger`` lets tests force a multi-micro-batch run;
    correctness is batch-split-invariant by construction (prior-only
    scoring over a time-ordered feed), which the streaming test asserts
    by equality."""
    stream = _events_stream(
        spark, sf_dir, max_files_per_trigger=max_files_per_trigger
    ).select("user_id", "event_id", "ts", "value")
    name = f"stream_anomaly_{uuid.uuid4().hex[:8]}"
    with _stateful_shuffle_partitions(spark, cap=16):
        q = (
            stream.groupBy("user_id")
            .applyInPandasWithState(
                _score_group,
                outputStructType=OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


STREAMING_ANOMALY_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, ts, value,
         CAST(round(value, 6) AS DECIMAL(18,6)) AS q
  FROM events
),
w AS (
  SELECT user_id, event_id, value,
         count(*) OVER wp AS prior_n,
         CAST(sum(q) OVER wp AS DOUBLE) AS ps,
         CAST(sum(q*q) OVER wp AS DOUBLE) AS pss
  FROM e
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, value,
       round((value - ps/prior_n)
             / sqrt(pss/prior_n - (ps/prior_n)*(ps/prior_n)), 6) AS z,
       CAST(prior_n AS BIGINT) AS prior_n
FROM w
WHERE prior_n >= {MIN_PRIOR}
  AND pss/prior_n - (ps/prior_n)*(ps/prior_n) > 0
  AND abs((value - ps/prior_n)
          / sqrt(pss/prior_n - (ps/prior_n)*(ps/prior_n))) > {Z_THRESH}
"""


QUERIES: dict = {}
ORACLES: dict = {}
AUX_QUERIES = {"streaming_anomaly": run_streaming_anomaly}
AUX_ORACLES = {"streaming_anomaly": STREAMING_ANOMALY_SQL}
