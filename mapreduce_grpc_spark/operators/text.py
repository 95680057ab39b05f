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
    docs = table(spark, sf_dir, "documents", spread=True)
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
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
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
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    # posexplode + window lead keeps bigram construction in native
    # operators (the array-transform version runs interpreted — see
    # operators/dedup.py for the measured gap)
    tok = docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        tok.withColumn("w2", F.lead("w", 1).over(win))
        .filter(F.col("w2").isNotNull())
        .select(F.concat_ws(" ", "w", "w2").alias("bigram"))
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


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals for corpus filtering.

    Length, token stats, punctuation density, stopword ratio, and a
    composite score — all per-row arithmetic (deterministic doubles), all
    computed in the scan stage with zero shuffles.  The downstream use is
    ``filter(score >= t)`` before expensive pipeline stages.
    """
    docs = table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks).cast("long")
    sum_tok_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda a, b: a + b
    )
    n_stop = F.size(F.array_intersect(toks, F.array(F.lit("the"), F.lit("a"))))
    stop_cnt = F.size(
        F.filter(toks, lambda w: (w == F.lit("the")) | (w == F.lit("a")))
    )
    punct = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), """[,."']""", "")
    )
    return docs.select(
        "doc_id",
        "n_chars",
        n_tok.alias("n_tokens"),
        (sum_tok_len.cast("double") / n_tok).alias("avg_token_len"),
        (stop_cnt.cast("double") / n_tok).alias("stopword_ratio"),
        (punct.cast("double") / F.col("n_chars")).alias("punct_ratio"),
        (n_stop > 0).alias("has_stopwords"),
    )


TEXT_QUALITY_SQL = f"""
SELECT doc_id, n_chars,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(list_reduce(list_prepend(0, list_transform(w, t -> length(t))),
                        (a, b) -> a + b) AS DOUBLE) / len(w) AS avg_token_len,
       CAST(len(list_filter(w, t -> t = 'the' OR t = 'a')) AS DOUBLE) / len(w)
         AS stopword_ratio,
       CAST(length(text) - length(regexp_replace(text, '[,."'']', '', 'g'))
            AS DOUBLE) / n_chars AS punct_ratio,
       len(list_intersect(w, ['the', 'a'])) > 0 AS has_stopwords
FROM (SELECT doc_id, n_chars, text, {tokens_sql('text')} AS w FROM documents) t
"""

# Per-language marker words for the n-gram/stopword language-ID heuristic.
# The fixture corpus shares one vocabulary across langs, so the prediction
# is uniform — the operator is still the real scoring pipeline (see
# docstring).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "y"),
    "fr": ("le", "la", "les", "et"),
    "zh": (),
}


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language identification (argmax over languages).

    Scores each doc per language by marker-token hits / n_tokens; predicts
    the argmax with lexicographic tie-break.  On the synthetic fixture all
    docs share a vocabulary, so predictions are uniform — the pipeline
    (score vector -> argmax) is what this operator demonstrates; swap the
    marker lists for real per-language tables in production.
    """
    docs = table(spark, sf_dir, "documents")
    # explode + conditional-sum aggregates instead of one filter() lambda
    # per language: higher-order functions run interpreted, while this
    # shape is a single codegen'd aggregate over the exploded tokens.
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("w")
    )
    marker_sums = [
        F.sum(
            F.when(F.col("w").isin(*markers), 1).otherwise(0)
        ).alias(f"c_{lang}")
        for lang, markers in LANG_MARKERS.items()
        if markers
    ]
    # left-join the aggregated scores back onto documents: a doc whose text
    # tokenizes to zero tokens has no exploded rows, and a bare groupBy
    # would drop it while the oracle (per-doc expression) keeps it with
    # NULL scores.  NULL propagation then matches DuckDB exactly
    # (x/NULL -> NULL, NULL > x -> unknown -> first lang wins the fold).
    agg = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"), *marker_sums)
    agg = docs.select("doc_id", "lang").join(agg, "doc_id", "left")
    scores = {
        lang: (
            F.col(f"c_{lang}").cast("double") / F.col("n_tok")
            if markers
            else F.lit(0.0)
        )
        for lang, markers in LANG_MARKERS.items()
    }
    # argmax with lang-asc tie-break: fold over sorted langs, strict >
    pred = None
    best = None
    for lang in sorted(scores):
        s = scores[lang]
        if pred is None:
            pred, best = F.lit(lang), s
        else:
            pred = F.when(s > best, F.lit(lang)).otherwise(pred)
            best = F.when(s > best, s).otherwise(best)
    return agg.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        best.alias("best_score"),
    )


def _lang_score_sql(markers: tuple[str, ...]) -> str:
    if not markers:
        return "0.0"
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"CAST(len(list_filter(w, t -> list_contains([{lst}], t))) AS DOUBLE) / len(w)"


def _lang_id_sql() -> str:
    langs = sorted(LANG_MARKERS)
    score_cols = ", ".join(
        f"{_lang_score_sql(LANG_MARKERS[lang])} AS s_{lang}" for lang in langs
    )
    pred = f"'{langs[0]}'"
    best = f"s_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN s_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN s_{lang} > {best} THEN s_{lang} ELSE {best} END"
    return f"""
SELECT doc_id, labeled_lang, {pred} AS pred_lang, {best} AS best_score
FROM (
  SELECT doc_id, lang AS labeled_lang, {score_cols}
  FROM (SELECT doc_id, lang, {tokens_sql('text')} AS w FROM documents) t
) s
"""


LANG_ID_SQL = _lang_id_sql()


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash + md5 fingerprints per document.

    The rolling hash (fold of (h*131 + codepoint) mod p — the reference's
    bucket-hash polynomial, /root/reference/src/mr_tasks.h:24-32, widened
    to a large prime) detects exact duplicates cheaply and feeds
    shift-resistant chunking schemes; md5_long is the collision-safe twin.
    """
    from ..functions.hashes import md5_long, rolling_hash

    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        rolling_hash("text").alias("roll_fp"),
        md5_long("text").alias("md5_fp"),
    )


def _doc_fingerprint_sql() -> str:
    from ..functions.hashes import md5_long_sql, rolling_hash_sql

    return f"""
SELECT doc_id,
       {rolling_hash_sql('text')} AS roll_fp,
       {md5_long_sql('text')} AS md5_fp
FROM documents
"""


DOC_FINGERPRINT_SQL = _doc_fingerprint_sql()


def tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (doc, word) tf-idf over the corpus.

    tf and df are two aggregations over one exploded token pass; the
    corpus size N enters as a broadcast scalar subquery (no driver-side
    count).  idf = ln(N/df) rounded to 8 decimals before the multiply so
    last-ulp libm differences between engines cannot flip the hash.
    """
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))
    total = docs.agg(F.count("*").alias("n_docs"))
    idf = F.round(F.log(F.col("n_docs").cast("double") / F.col("df")), 8)
    return (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "word",
            "tf",
            idf.alias("idf"),
            (F.col("tf") * idf).alias("tfidf"),
        )
    )


TFIDF_SQL = f"""
WITH tok AS ({_UNNEST_WORDS}),
tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
total AS (SELECT count(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.word, tf.tf,
       round(ln(CAST(n_docs AS DOUBLE) / df.df), 8) AS idf,
       tf.tf * round(ln(CAST(n_docs AS DOUBLE) / df.df), 8) AS tfidf
FROM tf JOIN df ON tf.word = df.word CROSS JOIN total
"""


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline in one DataFrame program:
    quality gate -> exact dedup -> per-language corpus stats.

    The composition story: each stage is one of this engine's operators
    (text_quality's signals, dedup_exact's keep-min rule, text_stats'
    aggregation), fused by Catalyst into a single plan — the scan happens
    once, the quality predicates run before the dedup shuffle, and only
    surviving rows reach the final aggregation.
    """
    docs = table(spark, sf_dir, "documents")
    n_tok = token_count("text")
    gated = docs.withColumn("n_tokens", n_tok).filter(
        (F.col("n_tokens") >= 20) & (F.col("n_chars") >= 100)
    )
    # exact dedup: survivor = min doc_id per text
    from pyspark.sql import Window

    survivors = gated.withColumn(
        "keep",
        F.row_number().over(Window.partitionBy("text").orderBy("doc_id")),
    ).filter(F.col("keep") == 1)
    return survivors.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


PIPELINE_CLEAN_CORPUS_SQL = f"""
WITH gated AS (
  SELECT doc_id, text, lang, n_chars,
         {token_count_sql('text')} AS n_tokens
  FROM documents
  WHERE {token_count_sql('text')} >= 20 AND n_chars >= 100
),
survivors AS (
  SELECT * FROM (
    SELECT gated.*,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS keep
    FROM gated
  ) t WHERE keep = 1
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM survivors
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("join", "scan", "filter")  # fixed query over the fixture vocab
BM25_TOPK = 20


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked top-k documents for a fixed keyword query.

    Retrieval scoring over the corpus (the quality/relevance ranking stage
    of a data pipeline): Okapi BM25 with the +1 idf variant (always
    positive), k1=1.2, b=0.75.  Shapes for scale: term frequencies only for
    the query terms (the filter pushes into the exploded scan, so the tf
    shuffle carries query-term rows only), document length and corpus
    stats join back broadcast-sized, top-k is TakeOrderedAndProject —
    no global sort.

    Cross-engine determinism: idf and each per-term score are rounded to
    8 decimals, and the per-document total adds the (at most three) term
    scores in fixed query order via conditional aggregates — no
    accumulation-order ambiguity; final tie-break by doc_id.
    """
    docs = table(spark, sf_dir, "documents")
    dl = docs.select("doc_id", F.size(tokens("text")).cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    tf = (
        tok.filter(F.col("word").isin(*BM25_QUERY))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    joined = (
        tf.join(F.broadcast(dfreq), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    rel_dl = F.col("dl").cast("double") / avgdl
    idf = F.round(
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        8,
    )
    score_t = F.round(
        (idf * (F.col("tf") * (BM25_K1 + 1.0)))
        / (F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * rel_dl)),
        8,
    )
    per_term = joined.select("doc_id", "word", score_t.alias("s"))
    parts = [
        F.sum(F.when(F.col("word") == w, F.col("s"))).alias(f"s{i}")
        for i, w in enumerate(BM25_QUERY)
    ]
    total = None
    for i in range(len(BM25_QUERY)):
        term = F.coalesce(F.col(f"s{i}"), F.lit(0.0))
        total = term if total is None else total + term
    return (
        per_term.groupBy("doc_id")
        .agg(*parts)
        .select("doc_id", F.round(total, 8).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_TOPK)
    )


_BM25_TERMS_SQL = ", ".join(f"'{w}'" for w in BM25_QUERY)
_BM25_SUM_SQL = " + ".join(
    f"COALESCE(sum(CASE WHEN word = '{w}' THEN s END), 0.0)" for w in BM25_QUERY
)

BM25_TOPK_SQL = f"""
WITH dl AS (
  SELECT doc_id, CAST(len({tokens_sql('text')}) AS BIGINT) AS dl FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl
),
tok AS ({_UNNEST_WORDS}),
tf AS (
  SELECT doc_id, word, count(*) AS tf FROM tok
  WHERE word IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, word
),
dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
per_term AS (
  SELECT tf.doc_id, tf.word,
         round(
           (round(ln((n_docs - df + CAST(0.5 AS DOUBLE))
                     / (df + CAST(0.5 AS DOUBLE))
                     + CAST(1.0 AS DOUBLE)), 8)
            * (tf * CAST({BM25_K1 + 1.0} AS DOUBLE)))
           / (tf + CAST({BM25_K1} AS DOUBLE)
              * (CAST({1.0 - BM25_B} AS DOUBLE)
                 + CAST({BM25_B} AS DOUBLE)
                   * (CAST(dl AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / n_docs)))),
           8) AS s
  FROM tf
  JOIN dfreq ON tf.word = dfreq.word
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
)
SELECT doc_id, round({_BM25_SUM_SQL}, 8) AS score
FROM per_term GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {BM25_TOPK}
"""


QUERIES = {
    "wordcount": wordcount,
    "grep_filter": grep_filter,
    "inverted_index": inverted_index,
    "text_quality": text_quality,
    "lang_id": lang_id,
    "tfidf": tfidf,
    "pipeline_clean_corpus": pipeline_clean_corpus,
}



# ---------------------------------------------------------------------------
# Exact heavy hitters with pre-shuffle candidate pruning
# ---------------------------------------------------------------------------

HH_FRAC = 0.02  # a "heavy hitter" holds >= 2% of all corpus tokens


def _hh_candidates(batches):
    """Per-PARTITION candidate pass (mapInPandas, Arrow batches).

    Accumulates token counts across the partition's batches and emits the
    words whose local frequency is >= HH_FRAC of the partition's tokens.
    Weighted pigeonhole: if a word's GLOBAL frequency is >= f then at
    least one partition sees local_count >= f * local_tokens (otherwise
    summing the strict inequalities contradicts the global bound) — so
    the union of local candidates is a SUPERSET of the true heavy
    hitters, computed with zero cross-partition communication.  The
    Python tokenizer mirrors the JVM delimiter class exactly; the final
    answer never depends on this pass being tight, only on it being a
    superset (phase 2 recounts exactly, JVM-side).
    """
    import collections
    import re

    import pandas as pd

    from ..functions.textfns import TOKEN_DELIM_RE

    # Single source of truth with the JVM/SQL tokenizer: if the delimiter
    # class ever changes, both tokenizers move together and the superset
    # guarantee (hence exactness) is preserved by construction.
    splitter = re.compile(TOKEN_DELIM_RE)
    counts: collections.Counter = collections.Counter()
    total = 0
    for pdf in batches:
        for text in pdf["text"]:
            toks = [t for t in splitter.split(text or "") if t]
            counts.update(toks)
            total += len(toks)
    cand = [w for w, c in counts.items() if c >= HH_FRAC * total]
    yield pd.DataFrame({"word": pd.Series(cand, dtype="object")})


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Words holding >= HH_FRAC of all corpus tokens — EXACT, but with
    the shuffle bounded by the candidate set instead of the vocabulary.

    Plain wordcount shuffles one row per distinct word per partition; at
    web-corpus vocabulary sizes (10^8+) that shuffle dwarfs the handful
    of true heavy hitters.  Phase 1 prunes to local candidates inside
    each partition (Arrow ``mapInPandas``, no per-row Python) — the one
    aggregation shape Catalyst cannot express, since partial aggregation
    offers no pre-exchange HAVING.  Phase 2 broadcast-semi-joins the
    candidates into the token scan and recounts exactly, so the result
    is identical to the naive plan and carries a plain SQL oracle.
    """
    docs = table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens("text")).alias("word"))
    cand = (
        docs.select("text")
        .mapInPandas(_hh_candidates, "word string")
        .distinct()
    )
    totals = words.agg(F.count("*").alias("total"))
    return (
        words.join(F.broadcast(cand), "word")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("cnt") >= F.lit(HH_FRAC) * F.col("total"))
        .select(
            "word",
            "cnt",
            (F.col("cnt").cast("double") / F.col("total")).alias("frac"),
        )
    )


HEAVY_HITTERS_SQL = f"""
WITH w AS ({_UNNEST_WORDS}),
tot AS (SELECT count(*) AS total FROM w)
SELECT word, count(*) AS cnt,
       CAST(count(*) AS DOUBLE) / total AS frac
FROM w, tot
GROUP BY word, total
HAVING count(*) >= {HH_FRAC} * total
"""


AUX_QUERIES = {
    # rotated out (round 7, second rotation) for snapshot_merge_into —
    # still pytest-hash-checked and benched
    "ngrams": ngrams,
    "bm25_topk": bm25_topk,
    "heavy_hitters": heavy_hitters,
    # rotated out of the 50-query contract (round 7) to make room for
    # snapshot_timetravel — still pytest-hash-checked and benched here
    "doc_fingerprint": doc_fingerprint,
    # rotated out (round 9) for streaming_table_pipeline — the length/
    # token/line stats are the contract's most redundant text row
    # (text_quality hash-checks the same signal family)
    "text_stats": text_stats,
}

AUX_ORACLES = {
    "ngrams": NGRAMS_SQL,
    "bm25_topk": BM25_TOPK_SQL,
    "heavy_hitters": HEAVY_HITTERS_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "text_stats": TEXT_STATS_SQL,
}

ORACLES = {
    "tfidf": TFIDF_SQL,
    "pipeline_clean_corpus": PIPELINE_CLEAN_CORPUS_SQL,
    "wordcount": WORDCOUNT_SQL,
    "grep_filter": GREP_FILTER_SQL,
    "inverted_index": INVERTED_INDEX_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "lang_id": LANG_ID_SQL,
}
