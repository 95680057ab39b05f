"""BPE merge training: distributed trainer vs a pure-Python reference
implementation on identical word counts (exact merge-sequence equality
— the check an iterative data-dependent-argmax op gets instead of a
single-SQL DuckDB oracle)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from mapreduce_grpc_spark.operators.bpe import (
    N_MERGES,
    bpe_apply,
    bpe_merges,
    bpe_train,
    bpe_word_counts,
)


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Sennrich-style reference trainer: greedy argmax of adjacent-pair
    counts over word types, tie-break (count desc, pair asc)."""
    vocab = {tuple(w): c for w, c in word_counts.items() if w}
    merges = []
    for step in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, a + b, n))
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_trainer_on_fixture(spark, sf_dir):
    wc = {r.w: r.cnt for r in bpe_word_counts(spark, sf_dir).collect()}
    expected = _reference_bpe(wc, N_MERGES)
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_merges(spark, sf_dir).orderBy("step").collect()
    ]
    assert got == expected
    assert len(got) == N_MERGES
    # merge counts are non-increasing only per-round argmax, but every
    # count must be positive and merged == left + right
    for _s, left, right, merged, n in got:
        assert merged == left + right and n > 0


def test_bpe_planted_corpus_exact_merges(spark):
    """Hand-checkable: 'low' x5, 'lower' x2, 'newest' x6 — the classic
    worked example's first merges fall out exactly."""
    wc = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6)], "w string, cnt long"
    )
    got = bpe_train(spark, wc, n_merges=4)
    expected = _reference_bpe({"low": 5, "lower": 2, "newest": 6}, 4)
    assert [
        (m["step"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in got
    ] == expected
    # first merge must be the most frequent adjacent pair: 'es' (6+...)
    # -- verify against the hand count: pairs of newest*6 dominate
    assert got[0]["pair_count"] >= 6


def test_bpe_greedy_overlap_semantics(spark):
    """'aaaa' under merge (a,a) segments to [aa, aa] (left-to-right
    greedy), never [a, aa, a] — and bpe_apply reproduces the trainer's
    segmentation."""
    wc = spark.createDataFrame([("aaaa", 3)], "w string, cnt long")
    merges = bpe_train(spark, wc, n_merges=2)
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "a")
    assert (merges[1]["left"], merges[1]["right"]) == ("aa", "aa")
    df = spark.createDataFrame([("aaaa aaa",)], "text string")
    segs = df.select(
        bpe_apply(df, "text", merges).alias("s")
    ).collect()[0]["s"]
    assert segs[0] == ["aaaa"]  # aa+aa merged by step 2
    assert segs[1] == ["aa", "a"]  # greedy: [aa, a], step 2 no-op


def test_bpe_early_stop_on_single_symbols(spark):
    """A vocabulary of 1-char words has no adjacent pairs: training
    stops immediately instead of looping."""
    wc = spark.createDataFrame([("a", 9), ("b", 4)], "w string, cnt long")
    assert bpe_train(spark, wc, n_merges=5) == []


def test_bpe_thousand_merges_trains_fast_and_matches_reference(spark):
    """Real-vocabulary merge counts: 1000 merges over a synthetic vocab
    train driver-local (no per-merge Spark jobs) in seconds, with exact
    merge-sequence parity against the recompute-everything reference
    trainer."""
    import random
    import time

    from mapreduce_grpc_spark.operators.bpe import bpe_train

    rng = random.Random(11)
    letters = "abcdefghij"
    wc: dict[str, int] = {}
    for _ in range(600):
        w = "".join(
            rng.choice(letters) for _ in range(rng.randint(3, 12))
        )
        wc[w] = wc.get(w, 0) + rng.randint(1, 50)
    wdf = spark.createDataFrame(sorted(wc.items()), "w string, cnt long")
    t0 = time.monotonic()
    got = bpe_train(spark, wdf, n_merges=1000)
    dt = time.monotonic() - t0
    expected = _reference_bpe(wc, 1000)
    assert [
        (m["step"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in got
    ] == expected
    assert len(got) > 200  # the vocab genuinely supports deep training
    assert dt < 30, f"driver-local training took {dt:.1f}s"


def test_bpe_apply_pandas_path_matches_sequential_fold(spark):
    """Past BPE_EXPR_MAX_MERGES the apply path switches to the Arrow
    pandas encoder; it must produce EXACTLY the sequential in-training-
    order fold's segmentation (the small-model expression path is held
    to the same oracle)."""
    import random

    from mapreduce_grpc_spark.operators.bpe import (
        BPE_EXPR_MAX_MERGES,
        _fold_py,
        _train_merges_local,
        bpe_apply,
    )

    rng = random.Random(5)
    letters = "abcde"
    wc: dict[str, int] = {}
    for _ in range(200):
        w = "".join(
            rng.choice(letters) for _ in range(rng.randint(2, 10))
        )
        wc[w] = wc.get(w, 0) + rng.randint(1, 9)
    merges = _train_merges_local(sorted(wc.items()), 500)
    assert len(merges) > BPE_EXPR_MAX_MERGES

    def seq(word: str, ms) -> list[str]:
        syms = list(word)
        for m in ms:
            syms = _fold_py(syms, m["left"], m["right"], m["merged"])
        return syms

    texts = [" ".join(rng.sample(sorted(wc), 8)) for _ in range(10)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    big = df.select(bpe_apply(df, "text", merges).alias("s")).collect()
    for row, t in zip(big, texts):
        assert row.s == [seq(w, merges) for w in t.split()]

    small = merges[:BPE_EXPR_MAX_MERGES]
    small_rows = df.select(
        bpe_apply(df, "text", small).alias("s")
    ).collect()
    for row, t in zip(small_rows, texts):
        assert row.s == [seq(w, small) for w in t.split()]


def test_word_counts_mass_coverage_cut(spark, sf_dir):
    """The training-vocabulary cut is MASS coverage with an explicit
    eps bound (argmax evidence lost <= eps * total tokens), bounded by
    the max_types memory cap — not a blind fixed type count."""
    from mapreduce_grpc_spark.operators.bpe import bpe_word_counts

    full = bpe_word_counts(spark, sf_dir, eps=0.0)
    rows = sorted(
        ((r["w"], r["cnt"]) for r in full.collect()),
        key=lambda t: (-t[1], t[0]),
    )
    total = sum(c for _, c in rows)
    assert len(rows) > 5

    cut = bpe_word_counts(spark, sf_dir, eps=0.3)
    kept = {r["w"]: r["cnt"] for r in cut.collect()}
    # coverage: kept mass >= (1 - eps) of all tokens
    assert sum(kept.values()) >= 0.7 * total
    # the cut is a count threshold: every kept count >= every dropped
    dropped = [c for w, c in rows if w not in kept]
    if dropped:
        assert min(kept.values()) >= max(dropped)

    capped = bpe_word_counts(spark, sf_dir, eps=0.0, max_types=5)
    got = sorted(
        ((r["w"], r["cnt"]) for r in capped.collect()),
        key=lambda t: (-t[1], t[0]),
    )
    assert len(got) == 5
    assert got == rows[:5]  # deterministic head: count desc, word asc
