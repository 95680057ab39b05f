"""Text workloads: the reference's flagship word count and its extensions.

``wordcount`` reproduces the reference's shipped demo workload
(/root/reference/test/user_tasks.cc:9-35): tokenize on the delimiter class
`` ,."'`` (strtok semantics: case-sensitive, empty tokens dropped), group by
token, count.  In the reference that is map→shuffle→sort→reduce (operators
O1,O2,O3,O5,O6 of SURVEY.md §2.A); here it is a two-expression DataFrame
plan — ``explode(split(...))`` then ``groupBy().count()`` — which Catalyst
executes with map-side partial aggregation (the reference has none,
/root/reference/src/mr_tasks.h:113-115, so it shuffles one pair per token;
Spark shuffles one pair per distinct token per partition).

Scale: at 100 TB the wordcount shuffle is bounded by distinct-token
cardinality × partitions thanks to partial aggregation; skewed head words
are handled by AQE skew-split.  No Python crosses the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.textfns import (
    TOKEN_DELIM_RE_SQL,
    token_count,
    token_count_sql,
    tokens,
    tokens_sql,
)

_UNNEST_WORDS = (
    "SELECT doc_id, unnest({toks}) AS word FROM documents".format(
        toks=tokens_sql("text")
    )
)


def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: reference word count over documents.text (O1+O2+O3+O5+O6)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


WORDCOUNT_SQL = f"""
SELECT word, count(*) AS cnt
FROM ({_UNNEST_WORDS}) t
GROUP BY word
"""


def grep_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate filter = a map() emitting 0-or-1 pairs (SURVEY.md §2.B).

    Catalyst pushes both predicates into the parquet scan; the projection
    prunes `text` out of the read entirely when possible.
    """
    docs = table(spark, sf_dir, "documents")
    return docs.filter(
        (F.col("lang") == "en") & F.col("text").contains("join")
    ).select("doc_id", "lang", "source", "n_chars")


GREP_FILTER_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE lang = 'en' AND text LIKE '%join%'
"""


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic MapReduce workload: word -> sorted distinct doc ids.

    The collect-values shape of the reference's reduce group
    (/root/reference/src/worker.h:83-117).  Emitted as a comma-joined string
    so the value-hash check is representation-stable across engines.
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(
            F.array_join(F.sort_array(F.collect_set("doc_id")), ",").alias("doc_ids"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


INVERTED_INDEX_SQL = f"""
SELECT word,
       array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
       count(DISTINCT doc_id) AS n_docs
FROM ({_UNNEST_WORDS}) t
GROUP BY word
"""


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lang, source) corpus statistics: docs, tokens, char lengths.

    Token counting stays in the scan stage (no shuffle before the group-by);
    sums of the double-typed stats go through DECIMAL for cross-engine
    determinism.
    """
    docs = table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        "source",
        "n_chars",
        token_count("text").alias("n_tokens"),
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


TEXT_STATS_SQL = f"""
SELECT lang, source,
       count(*) AS n_docs,
       sum(n_tokens) AS sum_tokens,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM (
  SELECT lang, source, n_chars, {token_count_sql('text')} AS n_tokens
  FROM documents
) t
GROUP BY lang, source
"""


def ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top word-bigram counts (text-analysis building block).

    Bigrams are built array-side with ``transform`` over token indices —
    no self-join, no Python.  Deterministic top via count desc, bigram asc.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(tokens("text").alias("w"))
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
                lambda x, i: F.concat_ws(" ", x, F.element_at(F.col("w"), i + 2)),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(100)
    )


NGRAMS_SQL = f"""
WITH toks AS (SELECT {tokens_sql('text')} AS w FROM documents),
pairs AS (
  SELECT unnest(list_transform(w[1:len(w)-1],
                (x, i) -> concat(x, ' ', w[i + 1]))) AS bigram
  FROM toks
)
SELECT bigram, count(*) AS cnt
FROM pairs
GROUP BY bigram
ORDER BY cnt DESC, bigram ASC
LIMIT 100
"""


QUERIES = {
    "wordcount": wordcount,
    "grep_filter": grep_filter,
    "inverted_index": inverted_index,
    "text_stats": text_stats,
    "ngrams": ngrams,
}

ORACLES = {
    "wordcount": WORDCOUNT_SQL,
    "grep_filter": GREP_FILTER_SQL,
    "inverted_index": INVERTED_INDEX_SQL,
    "text_stats": TEXT_STATS_SQL,
    "ngrams": NGRAMS_SQL,
}
