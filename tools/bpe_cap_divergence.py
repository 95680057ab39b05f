#!/usr/bin/env python
"""Quantify the BPE trainer's MAX_WORD_TYPES cap error.

The distributed stage of ``bpe_train`` collects only the most frequent
``MAX_WORD_TYPES`` word types (standard BPE-trainer practice — the
merge argmax is dominated by head types).  This measures what the cap
actually costs on a ZIPF-TAILED vocabulary — the fixture corpus has
only ~31 word types (synthetic text), so the honest measurement
synthesizes the trainer's input directly: W word types, counts
~ 1/rank^s (s=1.1, the natural-language shape), words drawn as random
letter strings from a seeded RNG (deterministic; the trainer consumes
``(word, count)`` pairs, no Spark needed).

Train the SAME merge count on the full relation and on top-C slices:

- ``first_divergence``: index of the first differing merge (the merge
  SEQUENCE is the model — agreement up to k means identical
  tokenization for any text whose pairs resolve within k),
- ``merge_jaccard``: Jaccard of the merge SETS,
- ``vocab_jaccard``: Jaccard of the produced subword vocabularies,
- ``tail_mass``: fraction of corpus TOKENS the cap discards (the
  a-priori bound on how much count evidence the argmax loses).

Run from the repo root:  python tools/bpe_cap_divergence.py [W]
Prints one JSON line per vocabulary size (default 200k and 2M types —
the 1x/10x row).
"""

from __future__ import annotations

import json
import os
import random
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_grpc_spark.operators.bpe import _train_merges_local

CAPS = [5_000, 10_000, 20_000, 50_000]
N_MERGES = 2_000


def _zipf_vocab(n_types: int, seed: int) -> list[tuple[str, int]]:
    rng = random.Random(seed)
    seen = set()
    words = []
    while len(words) < n_types:
        w = "".join(
            rng.choice(string.ascii_lowercase)
            for _ in range(rng.randint(3, 12))
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    s = 1.1
    return [
        (w, max(1, int(1e9 / ((i + 1) ** s))))
        for i, w in enumerate(words)
    ]


def run(n_types: int) -> dict:
    wc = _zipf_vocab(n_types, seed=48879)
    total = sum(c for _, c in wc)
    ref = _train_merges_local(wc, N_MERGES)
    ref_seq = [(m["left"], m["right"]) for m in ref]
    ref_set = set(ref_seq)
    ref_vocab = {m["merged"] for m in ref}

    def _metrics(prefix: list) -> dict:
        got = _train_merges_local(prefix, N_MERGES)
        seq = [(m["left"], m["right"]) for m in got]
        vocab = {m["merged"] for m in got}
        first = next(
            (i for i, (a, b) in enumerate(zip(ref_seq, seq)) if a != b),
            min(len(ref_seq), len(seq)),
        )
        ms = set(seq)
        return {
            "kept_types": len(prefix),
            "tail_mass": round(
                sum(c for _, c in wc[len(prefix):]) / total, 4
            ),
            "first_divergence": first,
            "merge_jaccard": round(
                len(ref_set & ms) / max(1, len(ref_set | ms)), 4
            ),
            "vocab_jaccard": round(
                len(ref_vocab & vocab) / max(1, len(ref_vocab | vocab)), 4
            ),
        }

    out = {}
    for cap in CAPS:
        out[f"types={cap}"] = (
            {"exact": True} if cap >= n_types else _metrics(wc[:cap])
        )
    # the shipped cut: mass coverage — keep the head covering (1-eps)
    # of tokens (what bpe_word_counts now does via the count histogram)
    for eps in (0.05, 0.01):
        target = (1.0 - eps) * total
        acc = 0
        k = 0
        for _, c in wc:
            if acc >= target:
                break
            acc += c
            k += 1
        out[f"eps={eps}"] = (
            {"exact": True, "kept_types": k}
            if k >= n_types
            else _metrics(wc[:k])
        )
    return {"word_types": n_types, "n_merges": N_MERGES, "cuts": out}


def main() -> None:
    sizes = (
        [int(sys.argv[1])] if len(sys.argv) > 1 else [200_000, 2_000_000]
    )
    for n in sizes:
        print(json.dumps(run(n)))


if __name__ == "__main__":
    main()
