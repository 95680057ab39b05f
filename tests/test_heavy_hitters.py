"""Exact heavy hitters (pre-shuffle candidate pruning): oracle parity,
superset guarantee, planted flood, and a printable-ASCII fuzz.

AUX query (the driver contract is at its 50-query cap), so the DuckDB
hash check the driver would run lives here.
"""

from __future__ import annotations

import os

import duckdb as _duck
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_grpc_spark import registry
from mapreduce_grpc_spark.catalog import TABLES
from mapreduce_grpc_spark.operators.text import HH_FRAC, heavy_hitters
from tests.oracle import assert_oracle_match


def test_heavy_hitters_oracle_parity(spark, sf_dir):
    df = heavy_hitters(spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["heavy_hitters"], sf_dir, "heavy_hitters"
    )


def test_heavy_hitters_excludes_rare_word(spark, sf_dir):
    """The fixture's planted rare token ('dup', ~0.1%) must be excluded
    while the ~3% bulk vocabulary is all included."""
    rows = {r.word: r for r in heavy_hitters(spark, sf_dir).collect()}
    assert "dup" not in rows
    assert len(rows) >= 25
    for r in rows.values():
        assert r.frac >= HH_FRAC


def _docs_dir(tmp_path, sf_dir, texts):
    d = tmp_path / "sf_fake"
    d.mkdir()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    con = _duck.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, 'en', 's', ?)",
        [(i, t, len(t)) for i, t in enumerate(texts)],
    )
    con.execute(f"COPY docs TO '{d}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


def test_heavy_hitters_planted_flood(spark, tmp_path, sf_dir):
    """One flooded word across many docs + a long tail of unique words:
    exactly the flood survives, even though every tail word is 'locally
    heavy' in whatever partition holds it (phase 2 must cull them)."""
    texts = ["flood flood flood flood"] * 25 + [
        f"tail{i} other{i}" for i in range(50)
    ]
    d = _docs_dir(tmp_path, sf_dir, texts)
    rows = {r.word: r for r in heavy_hitters(spark, d).collect()}
    # flood: 100 of 200 tokens = 50%
    assert set(rows) == {"flood"}, rows
    assert rows["flood"].cnt == 100
    assert_oracle_match(
        heavy_hitters(spark, d),
        registry.AUX_ORACLES["heavy_hitters"],
        d,
        "heavy_hitters_flood",
    )


_raw_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=60,
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_raw_text, min_size=1, max_size=12))
def test_heavy_hitters_fuzz_cross_engine(spark, tmp_path_factory, sf_dir, texts):
    """Arbitrary printable text: the two-phase result must equal the
    naive SQL answer — this is the test that would catch any divergence
    between the Python candidate tokenizer and the JVM tokenizer
    breaking the superset guarantee."""
    d = tmp_path_factory.mktemp("hh_fuzz")
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    con = _duck.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, 'en', 's', ?)",
        [(i, t, len(t)) for i, t in enumerate(texts)],
    )
    con.execute(f"COPY docs TO '{d}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    assert_oracle_match(
        heavy_hitters(spark, str(d)),
        registry.AUX_ORACLES["heavy_hitters"],
        str(d),
        "heavy_hitters_fuzz",
    )
