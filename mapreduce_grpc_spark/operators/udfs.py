"""The Python UDF surface, demonstrated one tier at a time.

The reference's whole user API is two UDF points: ``map`` (a UDTF — one
line in, n pairs out) and ``reduce`` (a UDAF)
(/root/reference/external/include/mr_task_factory.h:20-38).  This engine
already exercises the scalable Python surfaces elsewhere (mapInPandas in
multimodal, grouped-map applyInPandas in grouped, stateful
applyInPandasWithState in streaming, raw RDD callables in compat); this
module adds the remaining two, each oracle-checked:

 - a Python **UDTF** (`SplitWords`) — the literal shape of the reference's
   mapper, consumed via a LATERAL table function;
 - an Arrow-vectorized scalar **pandas_udf** (`token_count_vec`) — the
   10-100x-faster replacement for row-at-a-time ``@udf``.

Row-at-a-time ``@udf`` is deliberately absent from the engine: every place
it could appear either has a built-in expression (preferred, codegen) or a
vectorized form (below).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..catalog import table
from .text import WORDCOUNT_SQL

_DELIMS = re.compile(r"""[ ,."']+""")


@udtf(returnType="word: string")
class SplitWords:
    """The reference mapper as a Python UDTF: one text in, n words out."""

    def eval(self, text: str):
        if text is None:
            return
        for tok in _DELIMS.split(text):
            if tok:
                yield (tok,)


def udtf_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the Python UDTF + lateral join path.

    Same answer as the declarative ``wordcount`` (same oracle); exists to
    pin the UDTF surface.  Row-based Python — the declarative plan is the
    production path.
    """
    spark.udtf.register("split_words", SplitWords)
    docs = table(spark, sf_dir, "documents", spread=True)
    view = "udtf_docs_view"
    docs.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT t.word, count(*) AS cnt "
        f"FROM {view}, LATERAL split_words(text) t GROUP BY t.word"
    )


def _token_count_vec():
    """Vectorized (Arrow-batched) token counter.  Built lazily: the
    pandas_udf decorator parses its DDL return type and needs an active
    session, so it cannot run at import time."""

    @pandas_udf("long")
    def token_count_vec(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: sum(1 for tok in _DELIMS.split(t) if tok)
        ).astype("int64")

    return token_count_vec


def pandas_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts via the scalar pandas_udf path.

    Must agree exactly with the JVM-side expression AND the DuckDB oracle
    — three tokenizer implementations, one answer.
    """
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", _token_count_vec()("text").alias("n_tokens"))


PANDAS_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(text, '[ ,."'']+'), w -> w <> ''))
            AS BIGINT) AS n_tokens
FROM documents
"""


def _grouped_agg_udfs():
    """Grouped-aggregate pandas UDFs (Series -> scalar), built lazily for
    the same session-dependency reason as _token_count_vec.

    All three aggregate int64 inputs to int64 outputs — pandas integer
    sums are exact, so the UDAF surface is demonstrated with bit-exact
    cross-engine semantics (no float accumulation order to diverge).
    """

    @pandas_udf("long")
    def sum_agg(v: pd.Series) -> int:
        return int(v.sum())

    @pandas_udf("long")
    def sumsq_agg(v: pd.Series) -> int:
        return int((v * v).sum())

    @pandas_udf("long")
    def count_agg(v: pd.Series) -> int:
        return int(v.count())

    return sum_agg, sumsq_agg, count_agg


def pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-count moments via grouped-agg pandas UDFs — the
    reference's ``reduce`` UDAF shape (/root/reference/external/include/
    mr_task_factory.h:37-38) on the Arrow-vectorized path.

    Completes the Python-surface matrix (UDTF, scalar pandas_udf,
    mapInPandas, grouped-map, stateful, and now grouped-agg): each group's
    int64 Series crosses to pandas as one Arrow batch, three UDAFs reduce
    it, the mean is a single division outside the UDF.  The token counts
    themselves are computed JVM-side before the shuffle — the UDF boundary
    carries one long per doc, not the text.
    """
    from ..functions.textfns import tokens

    docs = table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang", F.size(tokens("text")).cast("long").alias("n_tok")
    )
    sum_agg, sumsq_agg, count_agg = _grouped_agg_udfs()
    agg = per_doc.groupBy("lang").agg(
        count_agg("n_tok").alias("n_docs"),
        sum_agg("n_tok").alias("sum_tok"),
        sumsq_agg("n_tok").alias("sumsq_tok"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "sum_tok",
        "sumsq_tok",
        F.round(F.col("sum_tok").cast("double") / F.col("n_docs"), 8).alias(
            "mean_tok"
        ),
    )


def _pandas_grouped_agg_sql() -> str:
    from ..functions.textfns import tokens_sql

    return f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       CAST(sum(n_tok * n_tok) AS BIGINT) AS sumsq_tok,
       round(CAST(sum(n_tok) AS DOUBLE) / count(*), 8) AS mean_tok
FROM (
  SELECT lang, CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tok
  FROM documents
) t
GROUP BY lang
"""


QUERIES = {
    "udtf_wordcount": udtf_wordcount,
    "pandas_token_count": pandas_token_count,
}

ORACLES = {
    "udtf_wordcount": WORDCOUNT_SQL,
    "pandas_token_count": PANDAS_TOKEN_COUNT_SQL,
}

AUX_QUERIES = {
    "pandas_grouped_agg": pandas_grouped_agg,
}

AUX_ORACLES = {
    "pandas_grouped_agg": _pandas_grouped_agg_sql(),
}
