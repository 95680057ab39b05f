"""Deterministic sampling operators for training-data pipelines.

Corpus curation needs reproducible sampling — rerunning the pipeline (or
re-executing a failed task) must select the same rows, which rules out
``df.sample`` (partition-seeded RNG: results change with partitioning).
Both operators here derive per-row uniforms from ``md5_long`` over the
row key, so the sample is a pure function of the data:

 - ``sample_stratified``      — per-language Bernoulli at configured
   rates (down-weight over-represented languages, the standard
   pre-training mix adjustment).  Scale shape: one scan, no shuffle —
   the filter is a row-local expression and pushes the rate lookup into
   a CASE expression.
 - ``sample_fixed_per_group`` — exactly-k-per-stratum (deterministic
   reservoir): rank rows by keyed hash within each stratum, keep the
   first k.  Scale shape: one hash-partition shuffle on the stratum key
   + WindowGroupLimit (rank <= k prunes map-side before the shuffle).

Both are SQL-expressible and hash-checked against DuckDB in
``tests/test_sampling.py`` (the driver contract is at its 50-query cap,
so they register as AUX: benched, pytest-oracle-checked).

Reference scope note: the reference engine (C++ MapReduce, /root/
reference/src/) has no sampling surface; these extend the north-star
training-pipeline inventory (SURVEY.md §2.C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.hashes import md5_long, md5_long_sql

# per-language keep rates (the pre-training mix adjustment)
STRATA_RATES: dict[str, float] = {
    "en": 0.50,
    "de": 0.30,
    "fr": 0.30,
    "es": 0.20,
    "zh": 0.10,
}
DEFAULT_RATE = 0.05     # unseen languages
SAMPLE_SALT = "strat1"  # changing the salt draws an independent sample
FIXED_K = 20            # rows kept per stratum by the reservoir
RESERVOIR_SALT = "resv1"

_HASH_SPACE = 1 << 60   # md5_long yields uniform integers in [0, 2^60)


def _rate_threshold(rate: float) -> int:
    """Integer acceptance threshold — keep iff hash < rate * 2^60.

    Integer comparison on both engines: no float rounding can flip a
    row's membership between Spark and the oracle.
    """
    return int(rate * _HASH_SPACE)


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Bernoulli sample of ``documents`` at STRATA_RATES."""
    docs = table(spark, sf_dir, "documents")
    u = md5_long(F.concat_ws(":", F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")))
    thresh = F.lit(_rate_threshold(DEFAULT_RATE))
    for lang, rate in STRATA_RATES.items():
        thresh = F.when(F.col("lang") == lang, F.lit(_rate_threshold(rate))).otherwise(
            thresh
        )
    return docs.filter(u < thresh).select("doc_id", "lang", "source", "n_chars")


_THRESH_SQL = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {_rate_threshold(rate)}"
    for lang, rate in STRATA_RATES.items()
) + f" ELSE {_rate_threshold(DEFAULT_RATE)} END"

SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {md5_long_sql(f"concat('{SAMPLE_SALT}', ':', CAST(doc_id AS VARCHAR))")}
      < {_THRESH_SQL}
"""


def sample_fixed_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-min(k, n) docs per language — deterministic reservoir.

    Rank by keyed hash (ties impossible: md5_long collisions over doc_ids
    would need a 60-bit collision; doc_id tie-break guards even that).
    """
    docs = table(spark, sf_dir, "documents")
    u = md5_long(
        F.concat_ws(":", F.lit(RESERVOIR_SALT), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("lang").orderBy(u.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= FIXED_K)
        .select("doc_id", "lang", F.col("pick").cast("int").alias("pick"))
    )


SAMPLE_FIXED_PER_GROUP_SQL = f"""
SELECT doc_id, lang, CAST(pick AS INTEGER) AS pick
FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {md5_long_sql(f"concat('{RESERVOIR_SALT}', ':', CAST(doc_id AS VARCHAR))")} ASC,
                    doc_id ASC
         ) AS pick
  FROM documents
) t
WHERE pick <= {FIXED_K}
"""


WEIGHTED_N = 100        # corpus subsample size (documents fixture: 500
                        # docs at sf<=0.01 — N must subsample, not engulf)
WEIGHTED_SALT = "wsamp1"


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample WITHOUT replacement of ``WEIGHTED_N``
    docs (weight = ``n_chars``: longer documents sampled more — the
    quality/length-weighted corpus subsampling step of a training mix).

    Deterministic Efraimidis–Spirakis: rank by ``ln(u)/w`` descending
    (the exponential-race key, equivalent to drawing without replacement
    with probability proportional to ``w``) where ``u`` is the
    ``md5_long`` per-row uniform — a pure function of the data, like
    every sampler here.  The key is rounded to 8 dp so the two engines'
    ``ln`` (which may differ in the last ulp) cannot reorder the
    boundary; ties break on doc_id.

    Scale shape: one scan, row-local key, global top-N via
    TakeOrderedAndProject — no shuffle of the corpus, O(N) driver
    result.  (The same key with a PARTITION BY source window is the
    per-source variant.)
    """
    docs = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = md5_long(
        F.concat_ws(":", F.lit(WEIGHTED_SALT), F.col("doc_id").cast("string"))
    )
    # (u+1)/2^60 in (0,1]: int->double is IEEE-nearest in both engines,
    # and the 2^60 scale is a power of two (exact)
    uu = (u.cast("double") + F.lit(1.0)) / F.lit(float(_HASH_SPACE))
    key = F.round(F.log(uu) / F.col("n_chars"), 8)
    return (
        docs.select("doc_id", "lang", "n_chars", key.alias("skey"))
        .orderBy(F.desc("skey"), F.asc("doc_id"))
        .limit(WEIGHTED_N)
    )


SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, lang, n_chars, skey FROM (
  SELECT doc_id, lang, n_chars,
         round(ln((CAST({md5_long_sql(
             f"concat('{WEIGHTED_SALT}', ':', CAST(doc_id AS VARCHAR))"
         )} AS DOUBLE) + 1.0) / {float(_HASH_SPACE)}) / n_chars, 8) AS skey
  FROM documents WHERE n_chars > 0
) t
ORDER BY skey DESC, doc_id ASC
LIMIT {WEIGHTED_N}
"""


PER_SOURCE_K = 50  # docs kept per source by the weighted reservoir


def sample_weighted_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly min(K, |source|) docs PER SOURCE, weight-proportional
    within each — the per-stratum form of ``sample_weighted`` (a
    training mix usually balances sources first, then samples by
    quality inside each).  Same ``ln(u)/w`` key, but ranked within a
    ``PARTITION BY source`` window: one hash-partition shuffle on
    source, WindowGroupLimit prunes to K per partition map-side."""
    docs = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = md5_long(
        F.concat_ws(":", F.lit(WEIGHTED_SALT), F.col("doc_id").cast("string"))
    )
    uu = (u.cast("double") + F.lit(1.0)) / F.lit(float(_HASH_SPACE))
    key = F.round(F.log(uu) / F.col("n_chars"), 8)
    w = Window.partitionBy("source").orderBy(
        F.desc("skey"), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("skey"))
        .withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= PER_SOURCE_K)
        .select(
            "doc_id", "source", "n_chars",
            F.col("pick").cast("int").alias("pick"),
        )
    )


_WSEED_SQL = md5_long_sql(
    f"concat('{WEIGHTED_SALT}', ':', CAST(doc_id AS VARCHAR))"
)
_WSKEY_SQL = (
    f"round(ln((CAST({_WSEED_SQL} AS DOUBLE) + 1.0)"
    f" / {float(_HASH_SPACE)}) / n_chars, 8)"
)

SAMPLE_WEIGHTED_PER_SOURCE_SQL = f"""
SELECT doc_id, source, n_chars, CAST(pick AS INTEGER) AS pick
FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_WSKEY_SQL} DESC, doc_id ASC
         ) AS pick
  FROM documents WHERE n_chars > 0
) t
WHERE pick <= {PER_SOURCE_K}
"""


CLUSTER_K_PER = 10       # vectors kept per semantic cluster
CLUSTER_SALT = "cbal1"


def sample_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-min(k, |cluster|) vectors per SEMANTIC cluster — the
    cluster-balanced subsample a pre-training mix uses to keep rare
    topics represented (uniform sampling over-draws the dominant
    cluster; per-cluster reservoirs flatten the topic distribution).

    Composition of two existing pieces: ``kmeans_clusters`` provides the
    assignment (broadcast-centroid scoring — no vector shuffle), then
    the deterministic keyed-hash reservoir from
    ``sample_fixed_per_group`` runs per cluster id.  Scale shape: one
    hash-partition shuffle on the cluster id + WindowGroupLimit map-side
    pruning — identical to the per-language reservoir, with the stratum
    computed by the model instead of read from a column.
    """
    from .clustering import kmeans_clusters

    assign = kmeans_clusters(spark, sf_dir).select("vec_id", "cluster")
    u = md5_long(
        F.concat_ws(
            ":", F.lit(CLUSTER_SALT), F.col("vec_id").cast("string")
        )
    )
    w = Window.partitionBy("cluster").orderBy(u.asc(), F.col("vec_id").asc())
    return (
        assign.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= CLUSTER_K_PER)
        .select("cluster", "vec_id", F.col("pick").cast("int").alias("pick"))
    )


def _sample_cluster_balanced_sql() -> str:
    from .clustering import KMEANS_CLUSTERS_SQL

    key = md5_long_sql(
        f"concat('{CLUSTER_SALT}', ':', CAST(vec_id AS VARCHAR))"
    )
    return f"""
WITH assign AS ({KMEANS_CLUSTERS_SQL})
SELECT cluster, vec_id, CAST(pick AS INTEGER) AS pick
FROM (
  SELECT cluster, vec_id,
         row_number() OVER (
           PARTITION BY cluster ORDER BY {key} ASC, vec_id ASC
         ) AS pick
  FROM assign
) t
WHERE pick <= {CLUSTER_K_PER}
"""


QUERIES: dict = {}
ORACLES: dict = {}

AUX_QUERIES = {
    "sample_stratified": sample_stratified,
    "sample_fixed_per_group": sample_fixed_per_group,
    "sample_weighted": sample_weighted,
    "sample_weighted_per_source": sample_weighted_per_source,
    "sample_cluster_balanced": sample_cluster_balanced,
}

# consumed by tests/test_sampling.py (NOT by oracle_sql(): the driver
# contract is capped at 50 — see registry.MAX_CONTRACT_QUERIES)
AUX_ORACLES = {
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "sample_fixed_per_group": SAMPLE_FIXED_PER_GROUP_SQL,
    "sample_weighted": SAMPLE_WEIGHTED_SQL,
    "sample_weighted_per_source": SAMPLE_WEIGHTED_PER_SOURCE_SQL,
    "sample_cluster_balanced": _sample_cluster_balanced_sql(),
}
