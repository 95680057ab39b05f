"""Quality operators (repetition stats / unigram log-prob): oracle parity,
structural invariants, and planted-document checks.

AUX queries (the driver contract is at its 50-query cap), so the DuckDB
hash check the driver would run lives here.
"""

from __future__ import annotations

import math
import os

import duckdb as _duck
import pytest

from mapreduce_grpc_spark import registry
from mapreduce_grpc_spark.catalog import TABLES
from mapreduce_grpc_spark.operators.quality import (
    MAX_DUP5GRAM_FRAC,
    MAX_TOP2GRAM_FRAC,
    repetition_stats,
    unigram_logprob,
)
from tests.oracle import assert_oracle_match

QUALITY = [
    "repetition_stats", "unigram_logprob", "bigram_logprob_kn",
    "span_dup_stats", "nb_quality_scores", "gopher_gate",
    "c4_filters",
]


@pytest.mark.parametrize("name", QUALITY)
def test_quality_oracle_parity(spark, sf_dir, name):
    df = registry.AUX_QUERIES[name](spark, sf_dir)
    assert_oracle_match(df, registry.AUX_ORACLES[name], sf_dir, name)


def test_repetition_fractions_bounded(spark, sf_dir):
    """Position-share fractions live in [0, 1]; the keep flag is exactly
    the thresholded conjunction; every fixture doc is scored."""
    from mapreduce_grpc_spark.catalog import table

    rows = repetition_stats(spark, sf_dir).collect()
    assert len(rows) == table(spark, sf_dir, "documents").count()
    for r in rows:
        assert 0.0 <= r.top2gram_frac <= 1.0, r
        assert 0.0 <= r.dup5gram_frac <= 1.0, r
        assert r.keep == (
            r.top2gram_frac <= MAX_TOP2GRAM_FRAC
            and r.dup5gram_frac <= MAX_DUP5GRAM_FRAC
        ), r


def _fake_docs_dir(tmp_path, sf_dir, rows_sql):
    fake_sf = tmp_path / "sf_fake"
    fake_sf.mkdir()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, fake_sf / f"{t}.parquet")
    con = _duck.connect()
    con.execute(f"COPY ({rows_sql}) TO '{fake_sf}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    return str(fake_sf)


def test_repetition_planted_docs(spark, tmp_path, sf_dir):
    """Hand-checkable documents: a pathological repeater, a clean doc, and
    a too-short doc."""
    fake_sf = _fake_docs_dir(
        tmp_path,
        sf_dir,
        """
        SELECT 1 AS doc_id, 'spam ham spam ham spam ham spam ham' AS text,
               'en' AS lang, 's' AS source, 35 AS n_chars
        UNION ALL SELECT 2, 'one two three four five six seven eight', 'en', 's', 39
        UNION ALL SELECT 3, 'tiny', 'en', 's', 4
        """,
    )
    rows = {r.doc_id: r for r in repetition_stats(spark, fake_sf).collect()}
    # doc 1: 8 tokens, 7 bigrams = 4x "spam ham" + 3x "ham spam"
    assert rows[1].n_tokens == 8
    assert rows[1].top2_cnt == 4
    assert rows[1].top2gram_frac == pytest.approx(4 / 7)
    # all 4 5-gram positions hold a 5-gram that repeats? 5-grams:
    # (spam ham spam ham spam) x2, (ham spam ham spam ham) x2 -> all dup
    assert rows[1].dup5gram_frac == 1.0
    assert not rows[1].keep
    # doc 2: all tokens distinct -> modal bigram count 1, no dup 5-grams
    assert rows[2].top2_cnt == 1
    assert rows[2].dup5gram_frac == 0.0
    assert rows[2].keep
    # doc 3: one token -> no bigrams, defined as non-repetitive
    assert rows[3].top2_cnt == 0
    assert rows[3].top2gram_frac == 0.0
    assert rows[3].keep
    assert_oracle_match(
        repetition_stats(spark, fake_sf),
        registry.AUX_ORACLES["repetition_stats"],
        fake_sf,
        "repetition_stats_synthetic",
    )


def test_unigram_logprob_invariants(spark, sf_dir):
    """avg/min log-probs are <= 0, min <= avg, and a doc of rarer tokens
    scores lower than one of common tokens (sanity on the fixture)."""
    rows = unigram_logprob(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.avg_logprob <= 1e-12, r
        assert r.min_logprob <= r.avg_logprob + 1e-12, r
        assert r.n_tokens > 0


def test_unigram_logprob_planted(spark, tmp_path, sf_dir):
    """Three-doc corpus with a hand-computable unigram distribution."""
    fake_sf = _fake_docs_dir(
        tmp_path,
        sf_dir,
        """
        SELECT 1 AS doc_id, 'a a a b' AS text, 'en' AS lang, 's' AS source,
               7 AS n_chars
        UNION ALL SELECT 2, 'a a a a', 'en', 's', 7
        UNION ALL SELECT 3, 'b c', 'en', 's', 3
        """,
    )
    # corpus: a=7, b=2, c=1, total=10
    lp = {w: math.log(c / 10) for w, c in {"a": 7, "b": 2, "c": 1}.items()}
    q = lambda x: round(x * 1e8) / 1e8  # micro-nat quantization
    rows = {r.doc_id: r for r in unigram_logprob(spark, fake_sf).collect()}
    assert rows[1].avg_logprob == pytest.approx(
        (3 * q(lp["a"]) + q(lp["b"])) / 4, abs=1e-9
    )
    assert rows[2].avg_logprob == pytest.approx(q(lp["a"]), abs=1e-9)
    assert rows[3].min_logprob == pytest.approx(q(lp["c"]), abs=1e-9)
    # doc of common tokens scores higher than the rare-token doc
    assert rows[2].avg_logprob > rows[3].avg_logprob
    assert_oracle_match(
        unigram_logprob(spark, fake_sf),
        registry.AUX_ORACLES["unigram_logprob"],
        fake_sf,
        "unigram_logprob_synthetic",
    )


def _kn_reference(docs: dict[int, str]):
    """Pure-Python interpolated-KN bigram scorer (Chen & Goodman eq.
    4.25, D=0.75) with the module's micro-nat quantization — the
    independent twin the Spark pipeline must reproduce."""
    import re
    from collections import Counter

    from mapreduce_grpc_spark.operators.quality import KN_DISCOUNT

    tok = lambda t: [w for w in re.split(r"[ ,.\"']+", t) if w]
    doc_bi = {
        d: list(zip(tok(t), tok(t)[1:])) for d, t in docs.items()
    }
    big = Counter(b for bs in doc_bi.values() for b in bs)
    c_u = Counter()
    n1p_u = Counter()
    nc_v = Counter()
    for (u, v), c in big.items():
        c_u[u] += c
        n1p_u[u] += 1
        nc_v[v] += 1
    nb = len(big)

    def lp(u, v):
        p = (big[(u, v)] - KN_DISCOUNT) / c_u[u] + (
            (KN_DISCOUNT * n1p_u[u]) / c_u[u]
        ) * (nc_v[v] / nb)
        return round(math.log(p) * 1e8) / 1e8

    out = {}
    for d, bs in doc_bi.items():
        if not bs:
            continue
        s = sum(lp(u, v) for u, v in bs)
        out[d] = (len(bs), s / len(bs))
    return out


def test_bigram_kn_planted(spark, tmp_path, sf_dir):
    """Hand-checkable KN corpus: a fluent doc made of the corpus's
    dominant phrase scores near-zero perplexity gap; a doc of one-off
    bigrams lands far lower, and every value matches the independent
    pure-Python KN scorer exactly (micro-nat quantized)."""
    from mapreduce_grpc_spark.operators.quality import bigram_logprob_kn

    docs = {
        1: "the cat sat on the mat and the cat sat on the mat",
        2: "the cat sat on the mat",
        3: "quantum marmalade debugging felicity oscilloscope raisin",
        4: "tiny",
    }
    fake_sf = _fake_docs_dir(
        tmp_path,
        sf_dir,
        " UNION ALL ".join(
            f"SELECT {d} AS doc_id, '{t}' AS text, 'en' AS lang, "
            f"'s' AS source, {len(t)} AS n_chars"
            for d, t in docs.items()
        ),
    )
    ref = _kn_reference(docs)
    rows = {r.doc_id: r for r in bigram_logprob_kn(spark, fake_sf).collect()}
    # one-token doc has no bigram and is not scored
    assert set(rows) == {1, 2, 3}
    for d, (n, avg) in ref.items():
        assert rows[d].n_bigrams == n, d
        assert rows[d].avg_logprob_kn == pytest.approx(avg, abs=1e-9), d
        assert rows[d].sum_lp_micro == round(avg * n * 1e8), d
    # the common-phrase doc is far more probable than the one-off doc
    # (equivalently: its perplexity exp(-avg) is lower)
    assert rows[2].avg_logprob_kn > rows[3].avg_logprob_kn
    assert math.exp(-rows[3].avg_logprob_kn) > math.exp(
        -rows[2].avg_logprob_kn
    )
    assert_oracle_match(
        bigram_logprob_kn(spark, fake_sf),
        registry.AUX_ORACLES["bigram_logprob_kn"],
        fake_sf,
        "bigram_logprob_kn_synthetic",
    )


def test_bigram_kn_invariants(spark, sf_dir):
    """Probabilities are proper: avg log-prob <= 0, min <= avg, the
    exact integer sum reproduces the double avg, and implied
    perplexity exp(-avg) >= 1."""
    import math as _m

    from mapreduce_grpc_spark.operators.quality import bigram_logprob_kn

    rows = bigram_logprob_kn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.avg_logprob_kn <= 1e-12, r
        assert r.min_logprob_kn <= r.avg_logprob_kn + 1e-12, r
        assert r.avg_logprob_kn == pytest.approx(
            r.sum_lp_micro / 1e8 / r.n_bigrams
        ), r
        assert _m.exp(-r.avg_logprob_kn) >= 1.0 - 1e-9, r


# -- cross-engine fuzz: arbitrary printable text through both quality ops --

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_raw_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=80,
)

_SLOW = settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SLOW
@given(st.lists(_raw_text, min_size=1, max_size=15))
def test_quality_ops_fuzz_cross_engine(spark, tmp_path_factory, sf_dir, texts):
    """repetition_stats and unigram_logprob agree with their oracles on
    ARBITRARY printable text — delimiters, quotes, apostrophes, empty
    strings, repeated tokens (the alphabet that exposed the r1
    tokenizer-class divergence)."""
    d = tmp_path_factory.mktemp("quality_fuzz")
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
    for name in QUALITY:
        assert_oracle_match(
            registry.AUX_QUERIES[name](spark, str(d)),
            registry.AUX_ORACLES[name],
            str(d),
            f"{name}_fuzz",
        )


def test_span_dup_planted_docs(spark, tmp_path, sf_dir):
    """Two documents sharing a verbatim 10-token boilerplate block score
    exactly the shared windows; a distinct doc and a too-short doc score
    0.0 and keep."""
    from mapreduce_grpc_spark.operators.quality import SPAN_K, span_dup_stats

    boiler = "a b c d e f g h i j"  # 10 tokens -> 3 shared 8-grams
    fake_sf = _fake_docs_dir(
        tmp_path,
        sf_dir,
        f"""
        SELECT 1 AS doc_id, '{boiler} unique1 text1 here1' AS text,
               'en' AS lang, 's' AS source, 10 AS n_chars
        UNION ALL SELECT 2, 'other2 words2 {boiler} tail2', 'en', 's', 10
        UNION ALL SELECT 3, 'totally different content with no shared blocks at all ok', 'en', 's', 10
        UNION ALL SELECT 4, 'short doc', 'en', 's', 9
        """,
    )
    rows = {r.doc_id: r for r in span_dup_stats(spark, fake_sf).collect()}
    # doc1: 13 tokens -> 6 windows; the 3 windows fully inside the
    # boilerplate appear in doc2 too
    assert rows[1].n_spans == 13 - (SPAN_K - 1)
    assert rows[1].dup_spans == 3
    # doc2: boilerplate offset by 2 tokens, same 3 shared windows
    assert rows[2].dup_spans == 3
    assert rows[3].dup_spans == 0 and rows[3].keep
    assert rows[4].n_spans == 0 and rows[4].span_dup_frac == 0.0
    assert rows[4].keep
    assert_oracle_match(
        span_dup_stats(spark, fake_sf),
        registry.AUX_ORACLES["span_dup_stats"],
        fake_sf,
        "span_dup_stats_synthetic",
    )


def test_compression_stats_orders_planted_docs(spark, tmp_path, sf_dir):
    """Repetitive text compresses below diverse prose; random-looking
    hex junk barely compresses; empty doc is defined as (0, 0.0, keep);
    z_bytes is exactly len(zlib.compress(utf8, 6))."""
    import zlib

    from mapreduce_grpc_spark.operators.quality import compression_stats

    rep = "spam " * 200
    prose = (
        "The quick brown fox jumps over the lazy dog while seventeen "
        "violinists rehearse an entirely different melody nearby, and "
        "the committee debates orthogonal matters of some importance."
    )
    import random as _r

    _rng = _r.Random(7)
    rnd = "".join(_rng.choice("0123456789abcdef") for _ in range(600))
    fake_sf = _fake_docs_dir(
        tmp_path,
        sf_dir,
        f"""
        SELECT 1 AS doc_id, '{rep}' AS text, 'en' AS lang, 's' AS source,
               {len(rep)} AS n_chars
        UNION ALL SELECT 2, '{prose}', 'en', 's', {len(prose)}
        UNION ALL SELECT 3, '{rnd}', 'en', 's', 600
        UNION ALL SELECT 4, '', 'en', 's', 0
        UNION ALL SELECT 5, 'Hello world', 'en', 's', 11
        """,
    )
    rows = {r.doc_id: r for r in compression_stats(spark, fake_sf).collect()}
    assert rows[1].z_bytes == len(zlib.compress(rep.encode(), 6))
    # repetition compresses far below both prose and hex noise (hex is
    # only 4 bits/char, so it lands between prose and true randomness —
    # no strict prose-vs-hex ordering is asserted)
    assert rows[1].compress_ratio < rows[2].compress_ratio
    assert rows[1].compress_ratio < rows[3].compress_ratio
    assert not rows[1].keep          # pathological repetition
    assert rows[2].keep              # normal prose
    assert rows[4].n_bytes == 0 and rows[4].compress_ratio == 0.0
    assert rows[4].keep
    # short legitimate snippets are exempt from the MAX gate (zlib's
    # fixed header makes their ratio meaningless)
    assert rows[5].compress_ratio > 1.0 and rows[5].keep
    for r in rows.values():
        assert 0.0 <= r.compress_ratio <= 2.5
        assert r.n_bytes >= 0 and r.z_bytes >= 0


def test_compression_stats_covers_fixture(spark, sf_dir):
    from mapreduce_grpc_spark.catalog import table
    from mapreduce_grpc_spark.operators.quality import compression_stats

    out = compression_stats(spark, sf_dir)
    assert out.count() == table(spark, sf_dir, "documents").count()


def test_dedup_spans_planted_boilerplate(spark, tmp_path, sf_dir):
    """The TRANSFORM companion to span_dup_stats: a verbatim 10-token
    boilerplate block shared by two docs is removed from both (all 10
    tokens — the union of its 3 shared 8-windows), the unique prose
    survives token-for-token, a distinct doc and a too-short doc pass
    through untouched — and the output hash-matches the DuckDB
    oracle."""
    from mapreduce_grpc_spark.operators.dedup import dedup_spans
    from mapreduce_grpc_spark.operators.quality import SPAN_K

    assert SPAN_K == 8, "planted expectations assume 8-token windows"
    boiler = "a b c d e f g h i j"  # 10 tokens -> 3 shared 8-grams
    fake_sf = _fake_docs_dir(
        tmp_path,
        sf_dir,
        f"""
        SELECT 1 AS doc_id, '{boiler} unique1 text1 here1' AS text,
               'en' AS lang, 's' AS source, 10 AS n_chars
        UNION ALL SELECT 2, 'other2 words2 {boiler} tail2', 'en', 's', 10
        UNION ALL SELECT 3, 'totally different content with no shared blocks at all ok', 'en', 's', 10
        UNION ALL SELECT 4, 'short doc', 'en', 's', 9
        """,
    )
    rows = {r.doc_id: r for r in dedup_spans(spark, fake_sf).collect()}
    assert rows[1].removed_tokens == 10
    assert rows[1].clean_text == "unique1 text1 here1"
    assert rows[2].removed_tokens == 10
    assert rows[2].clean_text == "other2 words2 tail2"
    assert rows[3].removed_tokens == 0
    assert rows[3].clean_text.startswith("totally different")
    assert rows[4].removed_tokens == 0 and rows[4].clean_text == "short doc"
    assert_oracle_match(
        dedup_spans(spark, fake_sf),
        registry.AUX_ORACLES["dedup_spans"],
        fake_sf,
        "dedup_spans_planted",
    )


def test_dedup_spans_matches_span_profile(spark, sf_dir):
    """Removal is consistent with the PROFILE query on the real fixture:
    a doc loses tokens iff span_dup_stats counts shared windows for it,
    and the removed count is bounded by the window geometry — d >= 1
    distinct K-windows cover between K + d - 1 (all consecutive) and
    K * d (all disjoint) tokens.  Plus fixture-level oracle parity."""
    from mapreduce_grpc_spark.operators.dedup import dedup_spans
    from mapreduce_grpc_spark.operators.quality import SPAN_K, span_dup_stats

    prof = {r.doc_id: r for r in span_dup_stats(spark, sf_dir).collect()}
    outs = {r.doc_id: r for r in dedup_spans(spark, sf_dir).collect()}
    assert set(prof) == set(outs)
    for doc_id, r in outs.items():
        d = prof[doc_id].dup_spans
        if d == 0:
            assert r.removed_tokens == 0, doc_id
        else:
            assert SPAN_K + d - 1 <= r.removed_tokens <= SPAN_K * d, doc_id
    assert_oracle_match(
        dedup_spans(spark, sf_dir),
        registry.AUX_ORACLES["dedup_spans"],
        sf_dir,
        "dedup_spans_fixture",
    )


def test_dedup_spans_keepfirst_owner_keeps_copy(spark, tmp_path, sf_dir):
    """The keep-one-copy policy: the owner doc (smallest doc_id per
    shared gram) keeps the boilerplate verbatim, non-owners lose it —
    and two IDENTICAL documents come out as one intact copy + one
    empty shell (no dedup_exact prerequisite), unlike plain
    dedup_spans which empties both."""
    from mapreduce_grpc_spark.operators.dedup import (
        dedup_spans,
        dedup_spans_keepfirst,
    )

    boiler = "a b c d e f g h i j"
    clone = "x1 y1 z1 w1 q1 r1 s1 t1 u1 v1 extra1 tail1"  # 12 tokens
    fake_sf = _fake_docs_dir(
        tmp_path,
        sf_dir,
        f"""
        SELECT 1 AS doc_id, '{boiler} unique1 text1 here1' AS text,
               'en' AS lang, 's' AS source, 10 AS n_chars
        UNION ALL SELECT 2, 'other2 words2 {boiler} tail2', 'en', 's', 10
        UNION ALL SELECT 3, '{clone}', 'en', 's', 12
        UNION ALL SELECT 4, '{clone}', 'en', 's', 12
        """,
    )
    rows = {
        r.doc_id: r for r in dedup_spans_keepfirst(spark, fake_sf).collect()
    }
    # doc1 owns every shared boilerplate gram (smallest id): intact
    assert rows[1].removed_tokens == 0
    assert rows[1].clean_text.startswith("a b c d e f g h i j")
    # doc2 loses exactly the shared block
    assert rows[2].removed_tokens == 10
    assert rows[2].clean_text == "other2 words2 tail2"
    # identical clones: first survives verbatim, second empties
    assert rows[3].removed_tokens == 0 and rows[3].clean_text == clone
    assert rows[4].removed_tokens == 12 and rows[4].clean_text == ""
    # contrast: plain dedup_spans empties BOTH clones
    plain = {r.doc_id: r for r in dedup_spans(spark, fake_sf).collect()}
    assert plain[3].clean_text == "" and plain[4].clean_text == ""
    assert_oracle_match(
        dedup_spans_keepfirst(spark, fake_sf),
        registry.AUX_ORACLES["dedup_spans_keepfirst"],
        fake_sf,
        "dedup_spans_keepfirst_planted",
    )


def test_dedup_spans_keepfirst_fixture_invariants(spark, sf_dir):
    """Fixture-level: keepfirst removes a subset of what dedup_spans
    removes (owners are spared), total corpus token loss is strictly
    smaller when anything was shared, and the oracle hash matches."""
    from mapreduce_grpc_spark.operators.dedup import (
        dedup_spans,
        dedup_spans_keepfirst,
    )

    plain = {r.doc_id: r.removed_tokens
             for r in dedup_spans(spark, sf_dir).collect()}
    kf = {r.doc_id: r.removed_tokens
          for r in dedup_spans_keepfirst(spark, sf_dir).collect()}
    assert set(plain) == set(kf)
    assert all(kf[d] <= plain[d] for d in kf)
    if sum(plain.values()) > 0:
        assert sum(kf.values()) < sum(plain.values())
    assert_oracle_match(
        dedup_spans_keepfirst(spark, sf_dir),
        registry.AUX_ORACLES["dedup_spans_keepfirst"],
        sf_dir,
        "dedup_spans_keepfirst_fixture",
    )


def test_dedup_spans_staged_plan_reads_corpus_once(spark, sf_dir):
    """r12 verdict stretch: with staging on, the double gram scan
    becomes two reads of the materialized span_grams relation — the
    executed plan holds exactly ONE documents scan (the rebuild side)
    and no posexplode Generate nodes; and the staged/un-staged paths
    return identical rows."""
    import os

    from mapreduce_grpc_spark.operators.dedup import dedup_spans

    if os.environ.get("SPARK_GRAFT_STAGING", "on").lower() in (
        "off", "0", "false",
    ):
        import pytest

        pytest.skip("staging disabled in this run")
    df = dedup_spans(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 1
    assert "Generate" not in plan
    staged = sorted(tuple(r) for r in df.collect())
    os.environ["SPARK_GRAFT_STAGING"] = "off"
    try:
        unstaged = sorted(
            tuple(r) for r in dedup_spans(spark, sf_dir).collect()
        )
    finally:
        os.environ.pop("SPARK_GRAFT_STAGING", None)
    assert staged == unstaged


def test_nb_quality_separates_planted_classes(spark):
    """The classifier half of the contract (the fixture's vocabularies
    overlap fully, so the AUX parity pins only determinism): on a
    corpus whose reference and junk classes use disjoint-ish token
    distributions, NB must predict every training doc's class and
    rank a mixed doc strictly between them."""
    from mapreduce_grpc_spark.operators.quality import nb_quality

    good = "the quick brown fox jumps over the lazy dog again and again"
    junk = "zzz qqq xxx zzz qqq xxx kkk zzz qqq xxx kkk vvv"
    rows = (
        [(i, good + f" extra{i % 3}", True) for i in range(8)]
        + [(100 + i, junk + f" noise{i % 3}", False) for i in range(8)]
        + [(500, good + " " + junk, True)]  # mixed, labelled reference
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, pos boolean")
    got = {r.doc_id: r for r in nb_quality(docs).collect()}
    assert all(got[i].pred_quality for i in range(8))
    assert all(not got[100 + i].pred_quality for i in range(8))
    mixed = got[500].avg_llr
    assert max(got[100 + i].avg_llr for i in range(8)) < mixed < min(
        got[i].avg_llr for i in range(8)
    ), "mixed doc must score strictly between the classes"
    # exact-integer surface: sum is the quantized evidence, the
    # prediction is the prior-shifted sign of it
    for r in got.values():
        assert r.n_tokens > 0
        assert abs(r.avg_llr - r.sum_llr_u / 1e8 / r.n_tokens) < 1e-12


def test_nb_quality_deterministic_under_partitioning(spark):
    """Integer micro-nat quantization before summation: scores are
    bit-identical no matter how the corpus is partitioned."""
    from mapreduce_grpc_spark.operators.quality import nb_quality

    rows = [
        (i, f"tok{i % 5} tok{(i * 3) % 7} common common", i % 2 == 0)
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, pos boolean")
    a = sorted(
        (r.doc_id, r.sum_llr_u, r.pred_quality)
        for r in nb_quality(docs.repartition(1)).collect()
    )
    b = sorted(
        (r.doc_id, r.sum_llr_u, r.pred_quality)
        for r in nb_quality(docs.repartition(16, "doc_id")).collect()
    )
    assert a == b


def test_gopher_gate_planted_docs(spark, tmp_path, sf_dir):
    """Each Gopher rule pinned on a hand-built document that violates
    EXACTLY that rule while a clean 60-word doc passes all seven
    (Rae et al. 2021 Table A1 semantics, integer-ratio arithmetic)."""
    from mapreduce_grpc_spark.operators.quality import gopher_gate

    clean = " ".join(
        "the quick brown fox jumps over that lazy dog with ease".split()
        * 6
    )  # 60 words, all alphabetic, stopword-rich, mean len in [3,10]
    short = "the fox and that dog with style"  # 7 words
    symbols = " ".join(["woah#tag the##big of### and that with"] * 9)
    bullets = "\n".join(["- the item of note and that thing"] * 10)
    ellipsis = "\n".join(["the story trails of and that way..."] * 10)
    numeric = " ".join(["12345 67890 00000 11111 22222 the of"] * 9)
    nostops = " ".join(["alpha beta gamma delta epsilon zeta eta"] * 9)
    rows_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text, 'en' AS lang, "
        f"'s' AS source, {len(t)} AS n_chars"
        for i, t in enumerate(
            [clean, short, symbols, bullets, ellipsis, numeric,
             nostops],
            start=1,
        )
    )
    fake_sf = _fake_docs_dir(tmp_path, sf_dir, rows_sql)
    got = {r.doc_id: r for r in gopher_gate(spark, fake_sf).collect()}
    assert got[1].keep, got[1]
    assert not got[2].keep_word_count and got[2].keep_stopwords
    assert not got[3].keep_symbol_ratio and got[3].keep_word_count
    assert not got[4].keep_bullets and got[4].keep_alpha
    assert not got[5].keep_ellipsis
    assert not got[6].keep_alpha and got[6].keep_word_count
    assert not got[7].keep_stopwords and got[7].keep_alpha
    # only the clean doc survives the combined gate
    assert [i for i, r in sorted(got.items()) if r.keep] == [1]
    assert_oracle_match(
        gopher_gate(spark, fake_sf),
        registry.AUX_ORACLES["gopher_gate"],
        fake_sf,
        "gopher_gate",
    )


def test_c4_filters_planted_docs(spark, tmp_path, sf_dir):
    """Each C4 rule pinned in isolation (Raffel et al. 2020 recipe):
    line retention needs terminal punctuation AND >=5 words; pages
    drop for <3 sentences, javascript, lorem ipsum, or braces."""
    from mapreduce_grpc_spark.operators.quality import c4_filters

    good = ("This is a perfectly fine sentence one.\n"
            "Here comes another proper sentence two!\n"
            "And a third full sentence closes it?")
    shortlines = "too short.\nalso tiny!\nnope?"  # <5 words each
    nopunct = ("this line has plenty of words but no mark\n"
               "another long line missing its terminal mark here")
    js = good + "\nPlease enable JavaScript to view this page."
    lorem = good + "\nLorem ipsum dolor sit amet consectetur elite."
    brace = good + "\nfunction f() returns nothing much really."
    brace = brace.replace("returns", "{ returns }")
    rows_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text, 'en' AS lang, "
        f"'s' AS source, {len(t)} AS n_chars"
        for i, t in enumerate(
            [good, shortlines, nopunct, js, lorem, brace], start=1
        )
    )
    fake_sf = _fake_docs_dir(
        tmp_path, sf_dir, rows_sql.replace("\n", "' || chr(10) || '")
    )
    got = {r.doc_id: r for r in c4_filters(spark, fake_sf).collect()}
    assert got[1].keep and got[1].kept_lines == 3
    assert got[1].n_sentences == 3
    assert not got[2].keep and got[2].kept_lines == 0, got[2]
    assert not got[3].keep and got[3].kept_lines == 0
    assert not got[4].keep and got[4].has_javascript
    assert not got[5].keep and got[5].has_lorem
    assert not got[6].keep and got[6].has_brace
    assert_oracle_match(
        c4_filters(spark, fake_sf),
        registry.AUX_ORACLES["c4_filters"],
        fake_sf,
        "c4_filters",
    )


def test_gates_null_text_cross_engine(spark, tmp_path, sf_dir):
    """A NULL text row through both gates reads as the EMPTY document
    — deterministic FALSE keep on both engines.  NULL-propagating
    booleans are the classic cross-engine trap (``FALSE AND NULL`` is
    FALSE in SQL but the Spark column stayed NULL end-to-end), so the
    gates coalesce at the source instead; the hash comparator proves
    the surfaces identical, and non-null rows are unaffected."""
    from mapreduce_grpc_spark.operators.quality import (
        c4_filters,
        gopher_gate,
    )

    fake_sf = _fake_docs_dir(
        tmp_path,
        sf_dir,
        """
        SELECT 1 AS doc_id, CAST(NULL AS VARCHAR) AS text,
               'en' AS lang, 's' AS source, 0 AS n_chars
        UNION ALL SELECT 2, 'the quick brown fox jumps over dogs.',
               'en', 's', 36
        """,
    )
    for name, fn in (
        ("gopher_gate", gopher_gate), ("c4_filters", c4_filters)
    ):
        rows = {r.doc_id: r for r in fn(spark, fake_sf).collect()}
        assert rows[1].keep is False, (name, rows[1])
        assert rows[2].keep is not None
        assert_oracle_match(
            fn(spark, fake_sf),
            registry.AUX_ORACLES[name],
            fake_sf,
            f"{name}_null",
        )
