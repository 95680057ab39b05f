"""Byte-pair-encoding merge training over the corpus (distributed).

The tokenizer-training stage of a pre-training pipeline: learn the
``n_merges`` most frequent adjacent-symbol merges (Sennrich et al.
2016) from corpus word counts.  The reference engine's vocabulary
(map/emit/reduce, /root/reference/external/include/mr_task_factory.h:
20-47) could express each ROUND as one MapReduce job; here each round
is one keyed aggregation plus a 1-row argmax collect.

Scale shape — the part that matters at 100 TB:

- The CORPUS is touched exactly once: a wordcount-shaped aggregation
  collapses it to the word-TYPE relation ``(word, count)`` (Zipf-
  compact, map-side partial agg).  Every merge round runs over word
  types, never re-reading the corpus — the classic BPE-trainer split.
- A round = explode adjacent symbol pairs (row-local ``transform``),
  ``groupBy(pair).sum(count)`` (partial agg), and a ``TakeOrdered(1)``
  argmax with a deterministic tie-break (count desc, pair asc) — the
  only driver state is the single winning pair per round.
- Applying a merge is a row-local left-to-right greedy fold
  (``F.aggregate`` over the symbol array, JVM-side, no Python), and
  the vocabulary is ``localCheckpoint``-ed each round so the plan
  doesn't accrete ``n_merges`` nested transforms.

Deliberately NOT SQL-expressible as one query (iterative, data-
dependent argmax each round), so ``bpe_merges`` is verified in pytest
against a pure-Python reference implementation on the same word
counts (exact merge-sequence equality) rather than a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.textfns import tokens

N_MERGES = 8
# materialize the evolving vocabulary every K applied merges: between
# checkpoints the merge folds stack as nested row-local expressions
# (cheap to recompute, but codegen size grows with nesting depth, so
# the interval is kept small); each checkpoint is one extra tiny job
CHECKPOINT_EVERY = 3
# training vocabulary cap: keep the per-round relation bounded by the
# most frequent word types (standard BPE-trainer practice; ties broken
# by word asc so the cut is deterministic)
MAX_WORD_TYPES = 50_000


def _fold_step(a: str, b: str, ab: str):
    """The one greedy left-to-right merge step, shared by the trainer
    and ``bpe_apply`` so their segmentation semantics cannot drift:
    fold symbols into an accumulator, replacing a trailing ``a`` when
    ``b`` arrives.  Overlaps resolve greedily ('aaa' under (a,a) ->
    ['aa','a']), matching the reference trainer."""

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return step


def _merge_fold(a: str, b: str):
    """Apply merge (a, b) to the ``syms`` column row-locally."""
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        _fold_step(a, b, a + b),
    )


def bpe_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one corpus pass: word-type counts, capped to the most
    frequent ``MAX_WORD_TYPES`` types (count desc, word asc)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(MAX_WORD_TYPES)
    )


def bpe_train(
    spark: SparkSession,
    word_counts: DataFrame,
    n_merges: int = N_MERGES,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from a ``(w, cnt)`` relation.

    Returns the ordered merge list ``[{"step", "left", "right",
    "merged", "pair_count"}, ...]`` (driver-held by nature — the model
    artifact is O(n_merges), not O(data)).  Stops early when no
    adjacent pair remains."""
    vocab = word_counts.select(
        F.col("cnt").cast("long").alias("cnt"),
        F.split(F.col("w"), "").alias("syms"),
    ).localCheckpoint()
    merges: list[dict] = []
    pair_structs = F.expr(
        "transform(slice(syms, 1, greatest(size(syms) - 1, 0)), "
        "(x, i) -> struct(x AS l, syms[i + 1] AS r))"
    )
    for step in range(1, n_merges + 1):
        best = (
            vocab.select("cnt", F.explode(pair_structs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0]["l"], best[0]["r"], best[0]["n"]
        merges.append(
            {
                "step": step,
                "left": a,
                "right": b,
                "merged": a + b,
                "pair_count": int(n),
            }
        )
        vocab = vocab.select("cnt", _merge_fold(a, b).alias("syms"))
        if step % CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    return merges


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The benched entry: train ``N_MERGES`` merges on the corpus and
    return the merge table."""
    merges = bpe_train(spark, bpe_word_counts(spark, sf_dir))
    return spark.createDataFrame(
        merges,
        "step int, left string, right string, merged string, "
        "pair_count bigint",
    ).select("step", "left", "right", "merged", "pair_count")


def bpe_apply(df: DataFrame, text_col: str, merges: list[dict]):
    """Column expression segmenting ``text_col``'s tokens with a learned
    merge list: per token, chars -> fold each merge in training order
    (row-local, JVM-side; expression depth = n_merges).  Returns an
    ``array<array<string>>`` column (symbols per token)."""
    tok = tokens(text_col)

    def seg(word_syms):
        acc = word_syms
        for m in merges:
            acc = F.aggregate(
                acc,
                F.array().cast("array<string>"),
                _fold_step(m["left"], m["right"], m["merged"]),
            )
        return acc

    return F.transform(tok, lambda w: seg(F.split(w, "")))


QUERIES: dict = {}
ORACLES: dict = {}

# iterative + data-dependent argmax per round: no single-SQL oracle —
# verified in pytest against a pure-Python reference trainer instead
AUX_QUERIES = {"bpe_merges": bpe_merges}
AUX_ORACLES: dict = {}
