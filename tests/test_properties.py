"""Property-based invariants (hypothesis).

Spark jobs are slow per-invocation, so each property generates a whole
batch of values and runs ONE job per example, with few examples.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_grpc_spark.compat.mapreduce import MapReduceSpec, hash131, run_mapreduce
from mapreduce_grpc_spark.functions.hashes import hash131 as hash131_col
from mapreduce_grpc_spark.functions.hashes import hash131_sql

ascii_word = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters=",'\\\""),
    min_size=1,
    max_size=12,
)

SLOW = settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(st.lists(ascii_word, min_size=1, max_size=30, unique=True), st.integers(2, 16))
def test_hash131_python_spark_duckdb_agree(spark, words, r):
    """The facade's Python hash, the Spark expression, and the DuckDB SQL
    fragment all compute the same bucket for arbitrary ASCII keys."""
    py = {w: hash131(w, r) for w in words}
    df = spark.createDataFrame([(w,) for w in words], "w string")
    sp = {row.w: row.b for row in df.select("w", hash131_col("w", r).alias("b")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(w VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(w,) for w in words])
    dk = dict(con.execute(f"SELECT w, {hash131_sql('w', r)} FROM t").fetchall())
    assert sp == py
    assert dk == py


@SLOW
@given(
    st.lists(
        st.tuples(ascii_word, st.text(alphabet="abc,x", min_size=0, max_size=8)),
        min_size=1,
        max_size=25,
    )
)
def test_facade_matches_python_reference(spark, tmp_path_factory, pairs):
    """run_mapreduce(identity map over key<TAB>value lines, concat reduce)
    equals a plain-Python MapReduce over the same pairs."""
    tmp = tmp_path_factory.mktemp("prop")
    src = tmp / "in.txt"
    src.write_text("".join(f"{k}\t{v}\n" for k, v in pairs))

    def m(line):
        k, _, v = line.partition("\t")
        yield (k, v)

    def r(key, values):
        yield (key, "|".join(sorted(values)))

    expect: dict[str, list[str]] = {}
    for k, v in pairs:
        expect.setdefault(k, []).append(v)
    expected = {(k, "|".join(sorted(vs))) for k, vs in expect.items()}

    spec = MapReduceSpec(input_paths=[str(src)], n_output_files=4)
    got = {(row.key, row.value) for row in run_mapreduce(spark, spec, m, r).collect()}
    assert got == expected


@SLOW
@given(
    st.lists(
        st.tuples(ascii_word, st.text(alphabet="abc,123", min_size=0, max_size=10)),
        min_size=1,
        max_size=20,
    )
)
def test_kv_codec_roundtrip(spark, tmp_path_factory, pairs):
    """write key,value lines -> read_text_kv gives back exactly the pairs
    (first-comma split: keys comma-free, values may contain commas)."""
    from mapreduce_grpc_spark.sources.readers import read_text_kv

    tmp = tmp_path_factory.mktemp("kv")
    src = tmp / "kv.txt"
    src.write_text("".join(f"{k},{v}\n" for k, v in pairs))
    got = sorted(
        (row.key, row.value) for row in read_text_kv(spark, str(src)).collect()
    )
    assert got == sorted(pairs)

def test_cosine_arrow_matches_fold_at_8dp(spark, sf_dir):
    """The Arrow/numpy cosine (the 100 TB verification path) must agree
    with the contract's sequential fold to 8 dp on real fixture pairs —
    same values after rounding, so any pair-set threshold decision is
    identical between the two implementations."""
    from mapreduce_grpc_spark.functions.vectors import cosine, cosine_arrow

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
                   "label")
    b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
                   F.col("label").alias("lb"))
    pairs = a.join(b, (F.col("label") == F.col("lb")) & (F.col("va") < F.col("vb")))
    both = pairs.select(
        F.round(cosine(F.col("ea"), F.col("eb")), 8).alias("c_fold"),
        cosine_arrow(F.col("ea"), F.col("eb")).alias("c_arrow"),
    )
    bad = both.filter(
        F.abs(F.col("c_fold") - F.col("c_arrow")) > 1e-8
    ).count()
    n = both.count()
    assert n > 0 and bad == 0, f"{bad}/{n} pairs diverge beyond 1e-8"


# full printable-ASCII text INCLUDING the delimiter class and quote
# characters — the alphabet that exposed the r1 adjacent-literal bug in
# TOKEN_DELIM_RE_SQL (the oracle-side class had silently lost its
# apostrophe; no fixture contains one)
_raw_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=60,
)


@SLOW
@given(st.lists(_raw_text, min_size=1, max_size=20))
def test_tokenizer_spark_duckdb_agree(spark, texts):
    """Spark's tokens() and the DuckDB tokens_sql() fragment must split
    ARBITRARY printable text identically — delimiters, quotes,
    apostrophes, empty strings, runs of separators."""
    from pyspark.sql import functions as F

    from mapreduce_grpc_spark.functions.textfns import tokens, tokens_sql

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    sp = {
        r.i: list(r.w)
        for r in df.select("i", tokens("t").alias("w")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    dk = {
        i: list(w)
        for i, w in con.execute(
            f"SELECT i, {tokens_sql('t')} FROM t"
        ).fetchall()
    }
    con.close()
    assert sp == dk


@SLOW
@given(st.lists(_raw_text, min_size=1, max_size=15))
def test_md5_long_and_rolling_hash_agree(spark, texts):
    """The two shared hashes beneath MinHash/SimHash/fingerprint oracles
    must agree across engines on arbitrary printable text."""
    from mapreduce_grpc_spark.functions.hashes import (
        md5_long,
        md5_long_sql,
        rolling_hash,
        rolling_hash_sql,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    sp = {
        r.i: (r.m, r.rh)
        for r in df.select(
            "i", md5_long("t").alias("m"), rolling_hash("t").alias("rh")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    dk = {
        i: (m, rh)
        for i, m, rh in con.execute(
            f"SELECT i, {md5_long_sql('t')}, {rolling_hash_sql('t')} FROM t"
        ).fetchall()
    }
    con.close()
    assert sp == dk


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                       # user_id
            st.integers(0, 72 * 3600 - 1),           # offset seconds in 3 days
            st.booleans(),                           # snap to the exact hour?
            st.integers(0, 99_999),                  # value cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_resample_gapfill_spark_duckdb_agree(spark, tmp_path_factory, evs):
    """Gap-fill/forward-fill over arbitrary event sets — including events
    exactly on hour boundaries — matches the DuckDB oracle (date_trunc,
    generate_series spine, IGNORE NULLS locf all agree cross-engine)."""
    import os

    from mapreduce_grpc_spark import registry
    from mapreduce_grpc_spark.catalog import TABLES
    from mapreduce_grpc_spark.operators.windows import resample_events
    from tests.oracle import assert_oracle_match

    d = tmp_path_factory.mktemp("resample_fuzz")
    sf_src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for t in TABLES:
        src = f"{sf_src}/{t}.parquet"
        if t != "events" and os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    rows = []
    for eid, (user, off, snap, cents) in enumerate(evs):
        if snap:
            off = (off // 3600) * 3600
        rows.append((eid, off, user, cents / 100.0))
    con = duckdb.connect()
    con.execute("CREATE TABLE e (event_id BIGINT, off BIGINT, user_id BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?, ?)", rows)
    con.execute(
        f"""COPY (SELECT event_id,
                         TIMESTAMP '2024-01-01' + to_seconds(off) AS ts,
                         user_id, 'click' AS event_type, value,
                         '{{}}' AS props
                  FROM e)
            TO '{d}/events.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    assert_oracle_match(
        resample_events(spark, str(d)),
        registry.AUX_ORACLES["resample_events"],
        str(d),
        "resample_fuzz",
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=" abX.,\"'\t",  # delimiter-class chars + letters
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_segment_dedup_spark_duckdb_agree(spark, tmp_path_factory, texts):
    """Segment profile + cleaning transform over adversarial documents —
    empty docs, pure-delimiter docs, runs of delimiters, docs shorter
    than one segment, and forced cross-doc duplicates — hash-match the
    DuckDB oracles (tokenizer, slicing, grouping, and ordered
    reassembly all agree cross-engine)."""
    import os

    from mapreduce_grpc_spark import registry
    from mapreduce_grpc_spark.catalog import TABLES
    from mapreduce_grpc_spark.operators.dedup import (
        clean_segments,
        dedup_segments,
    )
    from tests.oracle import assert_oracle_match

    d = tmp_path_factory.mktemp("segfuzz")
    sf_src = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    for t in TABLES:
        src = f"{sf_src}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    # duplicate every other doc so shared segments actually occur
    docs = list(texts) + [t for i, t in enumerate(texts) if i % 2 == 0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, 'en', 'fuzz', ?)",
        [(i, t, len(t)) for i, t in enumerate(docs)],
    )
    con.execute(
        f"COPY docs TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()
    assert_oracle_match(
        dedup_segments(spark, str(d)),
        registry.AUX_ORACLES["dedup_segments"],
        str(d),
        "dedup_segments_fuzz",
    )
    assert_oracle_match(
        clean_segments(spark, str(d)),
        registry.AUX_ORACLES["clean_segments"],
        str(d),
        "clean_segments_fuzz",
    )


# --- bloom filter: no false negatives, ever --------------------------

from hypothesis import given as _given, settings as _settings, strategies as _st


@_settings(max_examples=200, deadline=None)
@_given(
    _st.lists(
        _st.one_of(
            _st.integers(min_value=-(2**62), max_value=2**62),
            _st.text(min_size=0, max_size=40),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_bloom_never_false_negative_property(vals):
    """Every value inserted into a bloom must probe True (false
    POSITIVES are the design trade; a false negative would silently
    leave stale rows after a CoW merge)."""
    import pyarrow as pa

    from mapreduce_grpc_spark.sources.snapshots import (
        _bloom_build,
        _bloom_contains,
    )

    # single-type columns (parquet columns are typed); test whichever
    # type dominates the draw
    ints = [v for v in vals if isinstance(v, int)]
    strs = [v for v in vals if isinstance(v, str)]
    for col in (ints, strs):
        if not col:
            continue
        bloom = _bloom_build(pa.array(col))
        assert bloom is not None
        for v in col:
            assert _bloom_contains(bloom, v), (v, len(col))


def test_bloom_build_rejects_untrackable_and_over_cardinality():
    import pyarrow as pa

    from mapreduce_grpc_spark.sources import snapshots as S

    # decimals/floats/dates are untrackable -> no bloom, never a lie
    import decimal

    assert S._bloom_build([decimal.Decimal("1.5")]) is None
    assert S._bloom_build([1.5]) is None
    # over-cardinality arrow column rejected before materialization
    import unittest.mock as mock

    with mock.patch.object(S, "_BLOOM_MAX_DISTINCT", 10):
        assert S._bloom_build(pa.array(list(range(50)))) is None
        assert S._bloom_build(pa.array(list(range(9)))) is not None


def test_bloom_hv2_int_fast_path_and_legacy_interop():
    """r15 optimization: arrow INTEGER columns build via the vectorized
    splitmix scheme (sidecar ``hv: 2``) — the md5-per-value loop was the
    measured top driver cost of every commit.  Pins:

    - arrow-int builds are hv2 and never false-negative, including the
      64-bit-wrap-adversarial band near 2^62 (the probe must combine
      h1 + i*h2 in WRAPPED arithmetic exactly like the numpy build);
    - a LEGACY filter (no ``hv`` — built from a plain list, the shape
      of every sidecar written before this round) still probes ints
      via md5, so pre-existing tables keep pruning correctly;
    - both schemes share the m/k sizing, so the FP budget is unchanged.
    """
    import pyarrow as pa

    from mapreduce_grpc_spark.sources import snapshots as S

    vals = (
        list(range(-5, 6))
        + [2**62 - 1, -(2**62), 2**31, -(2**31) - 1]
        + [k * 1_000_003 for k in range(2000)]
    )
    hv2 = S._bloom_build(pa.array(vals))
    assert hv2 is not None and hv2.get("hv") == 2 and hv2["t"] == "i"
    for v in vals:
        assert S._bloom_contains(hv2, v), v
    # a string probe against an int-typed filter is a conservative hit
    assert S._bloom_contains(hv2, "7")

    legacy = S._bloom_build(list(vals))  # plain list -> md5 loop
    assert legacy is not None and "hv" not in legacy
    for v in vals:
        assert S._bloom_contains(legacy, v), v

    # identical sizing maths: same n -> same (m, k)
    assert (hv2["m"], hv2["k"]) == (legacy["m"], legacy["k"])
