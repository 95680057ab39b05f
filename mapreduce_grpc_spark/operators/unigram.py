"""Unigram-LM tokenizer training (Kudo 2018 — the SentencePiece
``model_type=unigram`` algorithm) over the corpus.

The second tokenizer family next to BPE (``operators/bpe.py``), sharing
its scale split exactly:

- **The corpus is touched once** (``bpe_word_counts``): the same
  wordcount-shaped collapse to the ``(word, count)`` type relation —
  the only distributed stage, one shuffle at any corpus size.  Since
  round 9 the cut is MASS COVERAGE (``bpe.BPE_TAIL_EPS``: keep the
  head covering 1-eps of tokens, ``bpe.MAX_WORD_TYPES`` as the memory
  bound), so the likelihood evidence lost to the cut is bounded by
  eps of the corpus — the unigram trainer inherits the same bound.
- **Training is driver-local over the capped relation**: seed a large
  candidate vocabulary from frequent substrings, then alternate
  EM (forward-backward expected piece counts over each word's
  segmentation lattice, in log space) with pruning (drop the pieces
  whose removal costs the least likelihood, never dropping single
  characters) until the target vocabulary size — Kudo's algorithm on
  a model-artifact-sized input (bounded by ``bpe.MAX_WORD_TYPES``).
- **Applying a model is row-local and distributed**
  (``unigram_apply``): an Arrow-batched pandas UDF running the
  Viterbi segmentation with per-word memoization — O(|word| ·
  max_piece_len) per new word, no Python loop over the vocab.

The reference engine could express only the wordcount stage
(/root/reference/external/include/mr_task_factory.h:20-47); the
EM/prune loop is iterative with data-dependent state — not
SQL-expressible, so like BPE it is pinned in pytest by algorithmic
invariants (non-decreasing EM likelihood, lattice-consistent
segmentations, deterministic re-train) instead of a DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import tokens
from .bpe import bpe_word_counts

VOCAB_SIZE = 64
MAX_PIECE_LEN = 8
# candidate seed vocabulary size (frequent-substring cut, like
# SentencePiece's seed_sentencepiece_size scaled to the capped input)
SEED_SIZE = 2_000
# fraction of prunable pieces KEPT per prune round
SHRINK_FACTOR = 0.75
# EM sub-iterations between prune rounds
EM_STEPS = 2


def _viterbi(word: str, logp: dict[str, float]) -> tuple[list[str], float]:
    """Best segmentation of ``word`` under piece log-probs (ties break
    toward fewer, longer pieces via strictly-better comparison)."""
    n = len(word)
    best = [(-math.inf, 0)] * (n + 1)
    best[0] = (0.0, 0)
    for j in range(1, n + 1):
        for i in range(max(0, j - MAX_PIECE_LEN), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or best[i][0] == -math.inf:
                continue
            cand = best[i][0] + lp
            if cand > best[j][0]:
                best[j] = (cand, i)
    if best[n][0] == -math.inf:
        raise ValueError(
            f"unigram: word {word!r} not coverable by the vocabulary"
        )
    out, j = [], n
    while j > 0:
        i = best[j][1]
        out.append(word[i:j])
        j = i
    return out[::-1], best[n][0]


def _forward_backward(
    word: str, count: int, logp: dict[str, float], expected: dict[str, float]
) -> float:
    """Accumulate ``count``-weighted expected piece counts over the
    word's full segmentation lattice; returns the word's marginal
    log-likelihood.  Log-space throughout (words are short, but a
    20-char word of 1e-4 pieces underflows doubles fast)."""
    n = len(word)
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    # lattice edges indexed by START position: O(n · max_piece_len)
    # once, reused by alpha, beta, and the posterior pass
    edges: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, min(i + MAX_PIECE_LEN, n) + 1):
            lp = logp.get(word[i:j])
            if lp is not None:
                edges[i].append((j, lp))

    def _lse(acc: float, x: float) -> float:
        if acc == -math.inf:
            return x
        return max(acc, x) + math.log1p(math.exp(-abs(acc - x)))

    for i in range(n):
        if alpha[i] == -math.inf:
            continue
        for j, lp in edges[i]:
            alpha[j] = _lse(alpha[j], alpha[i] + lp)
    if alpha[n] == -math.inf:
        raise ValueError(
            f"unigram: word {word!r} not coverable by the vocabulary"
        )
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = -math.inf
        for j, lp in edges[i]:
            if beta[j] != -math.inf:
                acc = _lse(acc, lp + beta[j])
        beta[i] = acc
    total = alpha[n]
    for i in range(n):
        if alpha[i] == -math.inf:
            continue
        for j, lp in edges[i]:
            if beta[j] == -math.inf:
                continue
            post = math.exp(alpha[i] + lp + beta[j] - total)
            if post > 0.0:
                expected[word[i:j]] = (
                    expected.get(word[i:j], 0.0) + count * post
                )
    return count * total


def _train_unigram_local(
    word_counts: list[tuple[str, int]],
    vocab_size: int,
    max_piece_len: int = MAX_PIECE_LEN,
    seed_size: int | None = None,
) -> tuple[list[dict], list[float]]:
    """Kudo's EM+prune loop over a ``(word, count)`` relation.

    Returns ``(pieces, ll_trace)``: pieces as ``[{"piece", "logp"},
    ...]`` sorted by logp desc then piece asc, and the corpus
    log-likelihood after each EM step (a non-decreasing-within-round
    trace the tests assert on)."""
    if seed_size is None:
        # the seed must comfortably exceed the target or pruning has
        # nothing to choose from (SentencePiece's seed is ~20x target)
        seed_size = max(SEED_SIZE, 4 * vocab_size)
    wc = sorted(word_counts)
    chars = sorted({c for w, _ in wc for c in w})
    if not chars:
        return [], []
    if vocab_size < len(chars):
        raise ValueError(
            f"vocab_size={vocab_size} below the {len(chars)} single "
            "characters needed for coverage"
        )
    # --- seed: frequent substrings scored by count*len, chars always in
    sub_counts: dict[str, float] = {}
    for w, c in wc:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                s = w[i:j]
                sub_counts[s] = sub_counts.get(s, 0.0) + c
    multi = sorted(
        (s for s in sub_counts if len(s) > 1),
        key=lambda s: (-sub_counts[s] * len(s), s),
    )[: max(0, seed_size - len(chars))]
    vocab = set(chars) | set(multi)
    total0 = sum(sub_counts[s] for s in vocab)
    logp = {
        s: math.log(sub_counts[s] / total0) for s in vocab
    }

    ll_trace: list[float] = []

    def e_pass() -> dict[str, float]:
        expected: dict[str, float] = {}
        ll = 0.0
        for w, c in wc:
            ll += _forward_backward(w, c, logp, expected)
        ll_trace.append(ll)
        return expected

    def m_step(expected: dict[str, float]) -> None:
        tot = sum(expected.values())
        floor = math.log(1e-12)
        log_tot = math.log(tot)
        for s in list(logp):
            e = expected.get(s, 0.0)
            # log(e) - log(tot), floored: a posterior so small that
            # e/tot underflows must not raise a domain error mid-EM
            logp[s] = (
                max(math.log(e) - log_tot, floor) if e > 0.0 else floor
            )

    while True:
        # the round's LAST E-pass is left un-M'd so its counts stay
        # consistent with the model the prune evaluates (and no extra
        # lattice pass is spent recomputing them)
        expected: dict[str, float] = {}
        for i in range(EM_STEPS):
            expected = e_pass()
            if i < EM_STEPS - 1:
                m_step(expected)
        if len(logp) <= vocab_size:
            m_step(expected)  # vocab is final: finish the round
            break
        # --- prune: loss of removing piece x ≈ its expected usage
        # times how much worse its own best ALTERNATIVE segmentation
        # is (Kudo's approximation); single chars are never dropped
        removable = [s for s in logp if len(s) > 1]
        losses = []
        for s in removable:
            use = expected.get(s, 0.0)
            if use == 0.0:
                losses.append((0.0, s))
                continue
            saved = logp.pop(s)
            try:
                _, alt = _viterbi(s, logp)
            except ValueError:
                alt = -math.inf
            finally:
                logp[s] = saved
            loss = (
                math.inf if alt == -math.inf
                else use * (saved - alt)
            )
            losses.append((loss, s))
        losses.sort(key=lambda t: (t[0], t[1]))
        keep_n = max(
            len(chars) + int(len(removable) * SHRINK_FACTOR),
            vocab_size,
        ) - len(chars)
        for loss, s in losses[: max(0, len(removable) - keep_n)]:
            if loss == math.inf:
                continue
            del logp[s]
    pieces = sorted(
        ({"piece": s, "logp": lp} for s, lp in logp.items()),
        key=lambda d: (-d["logp"], d["piece"]),
    )
    return pieces, ll_trace


def unigram_train(
    spark: SparkSession,
    word_counts: DataFrame,
    vocab_size: int = VOCAB_SIZE,
) -> list[dict]:
    """Train a unigram-LM vocabulary from a ``(w, cnt)`` relation
    (collects the already-capped table to the driver — the BPE
    contract: model input is artifact-sized, never the corpus)."""
    wc = [(r[0], r[1]) for r in word_counts.select("w", "cnt").collect()]
    pieces, _ = _train_unigram_local(wc, vocab_size)
    return pieces


def unigram_apply(
    df: DataFrame, text_col: str, pieces: list[dict]
) -> Column:
    """Viterbi-segment ``text_col``'s tokens under a trained model;
    returns ``array<array<string>>`` (pieces per token).  Arrow-batched
    pandas UDF with per-word memoization; unknown characters fall back
    to themselves at the floor probability (SentencePiece's
    character-coverage escape) so apply never throws on unseen text."""
    logp = {d["piece"]: float(d["logp"]) for d in pieces}
    floor = math.log(1e-12)
    # per-WORKER memo (closure state survives across Arrow batches in
    # each Python worker; the model is fixed for the UDF's lifetime)
    cache: dict[str, list[str]] = {}

    @F.pandas_udf("array<array<string>>")
    def seg_udf(token_arrays):
        def encode(word: str) -> list[str]:
            got = cache.get(word)
            if got is not None:
                return got
            lp = logp
            if any(c not in logp for c in word):
                lp = dict(logp)
                for c in word:
                    lp.setdefault(c, floor)
            segs, _ = _viterbi(word, lp)
            cache[word] = segs
            return segs

        return token_arrays.map(
            lambda toks: None
            if toks is None
            else [encode(w) for w in toks]
        )

    return seg_udf(tokens(text_col))


def unigram_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The benched entry: one corpus collapse, driver-local EM+prune,
    return the piece table."""
    pieces = unigram_train(spark, bpe_word_counts(spark, sf_dir))
    return spark.createDataFrame(
        [
            {"rank": i, "piece": d["piece"], "logp": float(d["logp"])}
            for i, d in enumerate(pieces)
        ],
        "rank int, piece string, logp double",
    ).select("rank", "piece", "logp")


QUERIES: dict = {}
ORACLES: dict = {}
# iterative EM with data-dependent pruning: no single-SQL oracle —
# pinned by algorithmic invariants in tests/test_unigram.py
AUX_QUERIES = {"unigram_pieces": unigram_pieces}
AUX_ORACLES: dict = {}
