"""Degenerate-input robustness: every registered query must run (not
crash) on empty tables, and event-time operators must accept the common
timestamp physical types, not just the fixtures'.

The empty fixture is written by DuckDB, which also makes its ``ts``
column TIMESTAMP_NTZ — so this sweep doubles as the regression test for
normalizing NTZ event times (watermarks and as-of joins hard-require the
TIMESTAMP type; see catalog.table / streaming.events._events_stream).
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_grpc_spark import registry
from mapreduce_grpc_spark.catalog import TABLES


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory, sf_dir):
    """Schema-identical, zero-row copies of every fixture table.

    DuckDB's COPY writes ts as TIMESTAMP_NTZ (no UTC flag) — a physical
    type the real fixtures don't use, deliberately kept to pin the
    engine's type normalization.
    """
    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet' LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name", sorted({**registry.QUERIES, **registry.AUX_QUERIES})
)
def test_query_survives_empty_input(spark, empty_sf, name):
    fn = registry.QUERIES.get(name) or registry.AUX_QUERIES[name]
    if name == "table_stats":
        # a global profile legitimately describes an empty table: one row
        # per profiled column, zero counts, null min/max (oracle agrees)
        rows = fn(spark, empty_sf).collect()
        assert {(r.n_rows, r.n_nonnull, r.n_distinct) for r in rows} == {(0, 0, 0)}
        assert all(r.min_val is None and r.max_val is None for r in rows)
        return
    if name == "corr_matrix":
        # same shape: one row per pair, zero count, undefined (null) corr
        rows = fn(spark, empty_sf).collect()
        assert {(r.n_rows, r.corr) for r in rows} == {(0, None)}
        return
    if name == "funnel_steps":
        # a funnel over an empty stream is still a 3-stage report with zero
        # users per stage (global count(*) aggregates return one row on
        # empty input; the SQL oracle agrees)
        rows = fn(spark, empty_sf).collect()
        assert sorted((r.stage, r.n_users) for r in rows) == [
            ("1_view", 0), ("2_click", 0), ("3_purchase", 0)
        ]
        return
    assert fn(spark, empty_sf).count() == 0


def test_events_ntz_timestamps_joinable(spark, sf_dir, tmp_path):
    """A non-empty NTZ-written events table produces the same as-of join
    answer as the native fixture (NTZ instants reinterpreted as UTC)."""
    import os

    con = duckdb.connect()
    ntz_sf = tmp_path / "sf"
    ntz_sf.mkdir()
    for t in TABLES:
        if t == "events":
            con.execute(
                f"COPY (SELECT * FROM '{sf_dir}/events.parquet') "
                f"TO '{ntz_sf}/events.parquet' (FORMAT PARQUET)"
            )
        else:
            os.symlink(f"{sf_dir}/{t}.parquet", ntz_sf / f"{t}.parquet")
    con.close()

    fn = registry.QUERIES["join_asof"]
    native = {tuple(r) for r in fn(spark, sf_dir).collect()}
    ntz = {tuple(r) for r in fn(spark, str(ntz_sf)).collect()}
    assert native == ntz and len(native) > 0


def test_sliding_window_oracle_parity(spark, sf_dir):
    """sliding_window rotated from the driver contract to AUX in round
    10 (made room for snapshot_partitioned_scan) — it keeps the SAME
    DuckDB hash comparator here."""
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["sliding_window"](spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["sliding_window"], sf_dir,
        "sliding_window",
    )


def test_nl_join_oracle_parity(spark, sf_dir):
    """nl_join rotated from the driver contract to AUX in round 12
    (made room for snapshot_delete_scan) — it keeps the SAME DuckDB
    hash comparator here."""
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["nl_join"](spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["nl_join"], sf_dir, "nl_join",
    )


def test_tumbling_window_oracle_parity(spark, sf_dir):
    """tumbling_window rotated from the driver contract to AUX in
    round 13 (made room for snapshot_column_evolution) — it keeps the
    SAME DuckDB hash comparator here."""
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["tumbling_window"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["tumbling_window"],
        sf_dir,
        "tumbling_window",
    )


def test_minhash_signatures_oracle_parity(spark, sf_dir):
    """minhash_signatures rotated from the driver contract to AUX in
    round 14 (made room for snapshot_row_ids; it is an intermediate of
    dedup_near, which stays contract) — it keeps the SAME DuckDB hash
    comparator here."""
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["minhash_signatures"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["minhash_signatures"],
        sf_dir,
        "minhash_signatures",
    )


def test_scaling_probe_oracle_parity(spark, sf_dir):
    """scaling_probe (added r16) exists so the driver's low-core bench
    run has at least one COMPUTE-bound query whose runtime tracks the
    core count at sf0.1 (r15 PERF flagged `suspect_cpus_ignored`
    because every query was fixed-overhead bound).  Both engines chain
    sha256 the same number of rounds over the same seed strings, so
    the hash comparator pins the whole computation."""
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["scaling_probe"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["scaling_probe"],
        sf_dir,
        "scaling_probe",
    )


def test_dedup_simhash_oracle_parity(spark, sf_dir):
    """dedup_simhash rotated from the driver contract to AUX in round
    15 (made room for snapshot_wap; its pair-graph twin
    dedup_simhash_pairs stays contract and exercises the same
    fingerprints through the banded join) — it keeps the SAME DuckDB
    hash comparator here."""
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["dedup_simhash"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["dedup_simhash"],
        sf_dir,
        "dedup_simhash",
    )


def test_events_json_oracle_parity(spark, sf_dir):
    """events_json rotated from the driver contract to AUX in round
    11 (made room for matview_orders) — it keeps the SAME DuckDB hash
    comparator here."""
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["events_json"](spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["events_json"], sf_dir,
        "events_json",
    )
