"""Golden parity on the reference's OWN test corpus.

The reference ships 556 KB of word-count input
(/root/reference/test/input/testdata_{1,2,3}.txt) and its config reads
files 1+2 (/root/reference/test/config.ini:3).  The reference itself has
no golden outputs (SURVEY.md §5) — so we compute the expected counts with
an independent pure-Python implementation of its exact tokenizer semantics
(strtok with delimiter class `` ,."'``: case-sensitive, empty tokens
impossible, /root/reference/test/user_tasks.cc:15-20) and require both the
MapReduce facade and the declarative word-count expression to reproduce
them on the real corpus.
"""

from __future__ import annotations

import os
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mapreduce_grpc_spark.compat.mapreduce import MapReduceSpec, run_mapreduce
from mapreduce_grpc_spark.functions.textfns import tokens

REF_INPUT = "/root/reference/test/input"
FILES = ["testdata_1.txt", "testdata_2.txt"]  # what config.ini reads

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_INPUT), reason="reference corpus not present"
)

_DELIMS = re.compile(r"""[ ,."']+""")


def _expected() -> Counter:
    counts: Counter = Counter()
    for fn in FILES:
        with open(os.path.join(REF_INPUT, fn), encoding="utf-8", errors="surrogateescape") as fh:
            for line in fh:
                for tok in _DELIMS.split(line.rstrip("\n")):
                    if tok:
                        counts[tok] += 1
    return counts


def test_facade_wordcount_on_reference_corpus(spark):
    expected = _expected()
    paths = [os.path.join(REF_INPUT, f) for f in FILES]

    def m(line):
        for tok in _DELIMS.split(line):
            if tok:
                yield (tok, "1")

    def r(key, values):
        yield (key, str(sum(int(v) for v in values)))

    spec = MapReduceSpec(input_paths=paths, n_output_files=8)
    got = {row.key: int(row.value) for row in run_mapreduce(spark, spec, m, r).collect()}
    assert got == dict(expected)


def test_dataframe_wordcount_on_reference_corpus(spark):
    expected = _expected()
    paths = [os.path.join(REF_INPUT, f) for f in FILES]
    df = (
        spark.read.text(paths)
        .select(F.explode(tokens("value")).alias("word"))
        .groupBy("word")
        .count()
    )
    got = {row.word: row["count"] for row in df.collect()}
    assert got == dict(expected)
