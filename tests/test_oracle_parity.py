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
