"""Every registered (query, oracle) pair must hash-match at sf0.001.

This replicates the driver's t2 correctness gate locally (driver runs at
sf0.01; we use sf0.001 for speed — same generator, same schemas).
"""

from __future__ import annotations

import pytest

from mapreduce_grpc_spark import registry
from tests.oracle import assert_oracle_match

ORACLE_CASES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert_oracle_match(df, registry.ORACLES[name], sf_dir, name)


def test_all_queries_run(spark, sf_dir):
    """Rows-only smoke for queries without an oracle."""
    for name, fn in registry.QUERIES.items():
        if name in registry.ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_every_contract_query_has_oracle():
    """Zero no-oracle contract entries (a no-oracle registration records a
    permanent err row in the driver's CORRECTNESS artifact)."""
    assert set(registry.QUERIES) == set(registry.ORACLES)
    assert len(registry.QUERIES) <= registry.MAX_CONTRACT_QUERIES


def test_distinct_count_approx_bound(spark, sf_dir):
    """HLL++ estimate within 2% relative error of the exact count per group
    (rsd=0.01 configured; 2% is a generous cross-check)."""
    from mapreduce_grpc_spark.operators.relational import (
        distinct_count,
        distinct_count_approx,
    )

    exact = {r["o_orderpriority"]: r["n_cust"] for r in distinct_count(spark, sf_dir).collect()}
    approx = {
        r["o_orderpriority"]: r["n_cust_approx"]
        for r in distinct_count_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(1, 0.02 * ex), (k, ex, approx[k])


def test_group_percentiles_approx_bound(spark, sf_dir):
    """approx_percentile (accuracy 10000) within 0.5% of the exact
    interpolated percentile per group."""
    from mapreduce_grpc_spark.operators.relational import (
        group_percentiles,
        group_percentiles_approx,
    )

    exact = {r["l_returnflag"]: (r["p50_price"], r["p90_price"])
             for r in group_percentiles(spark, sf_dir).collect()}
    approx = {r["l_returnflag"]: (r["p50_price"], r["p90_price"])
              for r in group_percentiles_approx(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for k, (e50, e90) in exact.items():
        a50, a90 = approx[k]
        assert abs(a50 - e50) <= 0.005 * abs(e50), (k, e50, a50)
        assert abs(a90 - e90) <= 0.005 * abs(e90), (k, e90, a90)


def test_decode_media_stub_raises(spark):
    """Real codecs are an explicit NotImplementedError seam."""
    from mapreduce_grpc_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"bytes", "image", codec="pil")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"word", "cnt"}
