"""Deterministic sampling operators: oracle parity + invariants.

These are AUX queries (the driver contract is at its 50-query cap), so
the DuckDB hash check that the driver would normally run lives here.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mapreduce_grpc_spark import registry
from mapreduce_grpc_spark.operators.sampling import (
    DEFAULT_RATE,
    FIXED_K,
    STRATA_RATES,
    sample_fixed_per_group,
    sample_stratified,
)
from tests.oracle import assert_oracle_match


@pytest.mark.parametrize("name", ["sample_stratified", "sample_fixed_per_group"])
def test_sampling_oracle_parity(spark, sf_dir, name):
    df = registry.AUX_QUERIES[name](spark, sf_dir)
    assert_oracle_match(df, registry.AUX_ORACLES[name], sf_dir, name)


def test_stratified_rates_within_tolerance(spark, sf_dir):
    """Observed keep-rate per language tracks the configured rate.

    The uniform is a pure hash of doc_id, so this is a fixed property of
    the fixture, not a flaky statistical assertion — the tolerance only
    absorbs small-stratum granularity (binomial sd at n≈100).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r.lang: r.n
        for r in sample_stratified(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, n in totals.items():
        rate = STRATA_RATES.get(lang, DEFAULT_RATE)
        observed = kept.get(lang, 0) / n
        sd = (rate * (1 - rate) / n) ** 0.5
        assert abs(observed - rate) <= 4 * sd + 1 / n, (
            f"{lang}: observed {observed:.3f} vs configured {rate} (n={n})"
        )


def test_stratified_is_partitioning_invariant(spark, sf_dir):
    """The same rows are selected regardless of input partitioning —
    the property df.sample cannot give (partition-seeded RNG)."""
    base = {r.doc_id for r in sample_stratified(spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # sample_stratified reads only the documents table
        docs.repartition(13).write.parquet(f"{td}/documents.parquet")
        rep = {r.doc_id for r in sample_stratified(spark, td).collect()}
    assert base == rep


def test_fixed_per_group_exact_k(spark, sf_dir):
    """Exactly min(k, stratum size) rows per language, ranks 1..k dense."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = sample_fixed_per_group(spark, sf_dir).collect()
    by_lang: dict[str, list[int]] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.pick)
    assert set(by_lang) == set(totals)
    for lang, picks in by_lang.items():
        expect = min(FIXED_K, totals[lang])
        assert sorted(picks) == list(range(1, expect + 1)), lang


def test_fixed_per_group_stable_under_resampling(spark, sf_dir):
    """Two runs select the identical doc_ids (pure function of the data)."""
    a = {(r.lang, r.doc_id) for r in sample_fixed_per_group(spark, sf_dir).collect()}
    b = {(r.lang, r.doc_id) for r in sample_fixed_per_group(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_aux_oracle_sql_is_duckdb_valid(sf_dir):
    """Every AUX oracle parses and runs in DuckDB (catches drift even for
    sketch queries whose values are not hash-compared)."""
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, sql in registry.AUX_ORACLES.items():
        con.execute(sql).fetchall()
    con.close()
