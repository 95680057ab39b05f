"""Unigram-LM tokenizer (Kudo 2018): algorithmic invariants.

No SQL oracle by nature (iterative EM with data-dependent pruning) —
pinned instead by EM's own guarantee (non-decreasing likelihood while
the vocabulary is fixed), lattice-consistency of segmentations,
compression on a structured corpus, and deterministic re-training."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import table
from mapreduce_grpc_spark.operators.bpe import bpe_word_counts
from mapreduce_grpc_spark.operators.unigram import (
    EM_STEPS,
    _train_unigram_local,
    _viterbi,
    unigram_apply,
    unigram_pieces,
    unigram_train,
)

WC = [
    ("ababab", 100),
    ("abab", 60),
    ("banana", 40),
    ("bandana", 20),
    ("cd", 50),
    ("dcdc", 30),
]


def test_em_likelihood_nondecreasing_within_fixed_vocab():
    pieces, trace = _train_unigram_local(WC, vocab_size=12)
    assert len(trace) >= EM_STEPS
    # within each EM round the vocabulary is fixed, so the EM guarantee
    # applies to consecutive steps of the same round
    for r in range(0, len(trace) - 1, EM_STEPS):
        for i in range(r + 1, min(r + EM_STEPS, len(trace))):
            assert trace[i] >= trace[i - 1] - 1e-9, (
                f"EM step {i} decreased the likelihood: {trace}"
            )


def test_vocab_shape_probabilities_and_chars():
    pieces, _ = _train_unigram_local(WC, vocab_size=12)
    vocab = {d["piece"] for d in pieces}
    assert len(vocab) <= 12
    # every single character survives pruning (coverage guarantee)
    chars = {c for w, _ in WC for c in w}
    assert chars <= vocab
    # a proper distribution over the corpus-reachable pieces
    mass = sum(math.exp(d["logp"]) for d in pieces)
    assert mass <= 1.0 + 1e-6
    # the structured corpus forces multi-char pieces into the vocab
    assert any(len(p) > 1 for p in vocab)


def test_structured_corpus_compresses():
    pieces, _ = _train_unigram_local(WC, vocab_size=12)
    logp = {d["piece"]: d["logp"] for d in pieces}
    segs, _ = _viterbi("ababab", logp)
    assert "".join(segs) == "ababab"
    # a dominant repeated bigram must beat char-by-char segmentation
    assert len(segs) < 6


def test_vocab_size_below_chars_rejected():
    with pytest.raises(ValueError, match="single"):
        _train_unigram_local(WC, vocab_size=2)


def test_deterministic_retrain():
    a, _ = _train_unigram_local(WC, vocab_size=12)
    b, _ = _train_unigram_local(WC, vocab_size=12)
    assert a == b


def test_train_and_apply_on_fixture(spark, sf_dir):
    wc = bpe_word_counts(spark, sf_dir)
    pieces = unigram_train(spark, wc, vocab_size=40)
    vocab = {d["piece"] for d in pieces}
    docs = table(spark, sf_dir, "documents").limit(50)
    out = docs.select(
        F.col("text"),
        unigram_apply(docs, "text", pieces).alias("segs"),
    ).collect()
    import re

    from mapreduce_grpc_spark.functions.textfns import TOKEN_DELIM_RE

    for r in out:
        # the ENGINE's tokenizer semantics, not a hand-rolled regex —
        # the two must split identically or the test lies
        toks = [t for t in re.split(TOKEN_DELIM_RE, r.text) if t]
        assert len(r.segs) == len(toks)
        for word, segs in zip(toks, r.segs):
            assert "".join(segs) == word  # lattice consistency
            for p in segs:
                # vocab piece, or the unknown-char fallback
                assert p in vocab or len(p) == 1


def test_unigram_pieces_query(spark, sf_dir):
    df = unigram_pieces(spark, sf_dir)
    rows = df.collect()
    assert [f.name for f in df.schema.fields] == ["rank", "piece", "logp"]
    assert [r.rank for r in rows] == list(range(len(rows)))
    # ranks follow logp desc
    lps = [r.logp for r in rows]
    assert lps == sorted(lps, reverse=True)


def _enumerate_segmentations(word, vocab):
    """All segmentations of ``word`` into vocab pieces (brute force)."""
    if not word:
        return [[]]
    out = []
    for j in range(1, len(word) + 1):
        piece = word[:j]
        if piece in vocab:
            for rest in _enumerate_segmentations(word[j:], vocab):
                out.append([piece] + rest)
    return out


def test_forward_backward_matches_brute_force_enumeration():
    """The lattice marginal must equal the sum over ALL segmentations,
    and the expected counts must equal the posterior-weighted piece
    counts — checked against explicit enumeration on a small vocab."""
    from mapreduce_grpc_spark.operators.unigram import _forward_backward

    logp = {
        "a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
        "ba": math.log(0.15), "aba": math.log(0.1),
    }
    for word in ("ab", "aba", "abab", "ababa", "bab"):
        segs = _enumerate_segmentations(word, set(logp))
        probs = [
            math.exp(sum(logp[p] for p in seg)) for seg in segs
        ]
        total = sum(probs)
        expected: dict[str, float] = {}
        ll = _forward_backward(word, 1, logp, expected)
        assert math.isclose(ll, math.log(total), rel_tol=1e-12), word
        brute: dict[str, float] = {}
        for seg, pr in zip(segs, probs):
            for p in seg:
                brute[p] = brute.get(p, 0.0) + pr / total
        assert set(expected) == set(brute), word
        for p in brute:
            assert math.isclose(expected[p], brute[p], rel_tol=1e-10), (
                word, p
            )


def test_viterbi_matches_brute_force_argmax():
    from mapreduce_grpc_spark.operators.unigram import _viterbi

    logp = {
        "a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
        "ba": math.log(0.15), "aba": math.log(0.1),
    }
    for word in ("ab", "aba", "abab", "ababa", "bab", "aaaa"):
        segs = _enumerate_segmentations(word, set(logp))
        if not segs:
            with pytest.raises(ValueError):
                _viterbi(word, logp)
            continue
        best_seg, best_lp = _viterbi(word, logp)
        brute_best = max(
            (sum(logp[p] for p in seg), seg) for seg in segs
        )
        assert math.isclose(best_lp, brute_best[0], rel_tol=1e-12), word
        assert sum(logp[p] for p in best_seg) == best_lp
