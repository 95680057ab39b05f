"""Structured Streaming: streaming answers must equal batch answers."""

from __future__ import annotations

from mapreduce_grpc_spark.operators.windows import tumbling_window
from mapreduce_grpc_spark.streaming.events import run_streaming_tumbling


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream_rows = {
        tuple(r) for r in run_streaming_tumbling(spark, sf_dir).collect()
    }
    batch_rows = {
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in tumbling_window(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows
