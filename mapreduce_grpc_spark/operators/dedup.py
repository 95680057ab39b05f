"""Deduplication operators for training-data pipelines.

The reference has no dedup surface — its substrate would express exact
dedup as map(emit(text, id)) + reduce(keep min id), which is exactly the
hash-groupBy plan Catalyst produces here.  Near-dup (MinHash+LSH, SimHash,
n-gram Jaccard) is the 100 TB-critical extension: all-pairs comparison is
O(n²) and impossible at scale, so every near-dup operator below goes
through a candidate-generation join (LSH band / simhash band / rare-shingle
inverted index) followed by exact verification on candidates only.

Everything is built-in expressions (md5, transform/aggregate/array ops) —
no Python in the row path — and every query has a DuckDB oracle generated
from the same constants, so the whole pipeline is value-hash-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.hashes import (
    MOD_P,
    affine_apply,
    affine_apply_sql,
    affine_hashes,
    md5_long,
    md5_long_sql,
)
from ..functions.textfns import tokens, tokens_sql
from ..sources.staging import staged_parquet, staging_enabled

# MinHash configuration (shared by Spark plan and generated oracle SQL).
SHINGLE_N = 5          # word 5-grams: rare enough that only true near-dups collide
N_HASHES = 12          # signature length
BAND_ROWS = 2          # rows per LSH band -> 6 bands; P(collide) = 1-(1-J^2)^6
JACCARD_THRESHOLD = 0.8
HASHES = affine_hashes(N_HASHES, seed=42)
N_BANDS = N_HASHES // BAND_ROWS


# ---------------------------------------------------------------------------
# Shingling (shared expression builders)
# ---------------------------------------------------------------------------


def shingles_sql(w: str = "w", n: int = SHINGLE_N) -> str:
    """DuckDB n-gram shingling (the oracle's side of _hashed_exploded)."""
    parts = ", ' ', ".join(f"{w}[i + {j}]" for j in range(1, n))
    return (
        f"list_distinct(list_transform({w}[1:greatest(len({w}) - {n - 1}, 0)], "
        f"(x, i) -> concat(x, ' ', {parts})))"
    )


_DOC_SHINGLES_SQL = f"""
SELECT doc_id, {shingles_sql('w')} AS sh
FROM (SELECT doc_id, {tokens_sql('text')} AS w FROM documents) toks
"""


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate grouping by full text: keep min doc_id per text.

    hash-groupBy with partial aggregation — at 100 TB group on
    md5(text) instead of the full text to cut shuffle width (semantically
    identical absent md5 collisions); here we group on text directly so the
    oracle is trivially equivalent.
    """
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("dup_cnt"),
    ).select("keep_id", "dup_cnt", F.md5("text").alias("text_md5"))


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS keep_id, count(*) AS dup_cnt, md5(text) AS text_md5
FROM documents
GROUP BY text
"""


# ---------------------------------------------------------------------------
# MinHash signatures + LSH candidate join + exact verification
# ---------------------------------------------------------------------------




def _hashed_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n, x): one row per distinct shingle hash per document.

    This is the shape MinHash wants at scale: the minhash of hash i is a
    plain ``min()`` aggregate over these rows — fully codegen'd with
    map-side partial aggregation.  The array formulation
    (array_min over transform) re-evaluates the md5 transform once per
    signature column because CollapseProject inlines it and higher-order
    functions opt out of subexpression elimination — measured 12x slower.
    """
    # Shingling via posexplode + window lead(): everything stays in
    # codegen'd/native operators.  The array-transform formulation
    # (nested element_at inside a transform() lambda) runs interpreted —
    # higher-order functions opt out of WholeStageCodegen — and measured
    # ~20x slower on the same data.  Cost here is one shuffle of token
    # rows by doc_id, which is also the 100 TB shape (bounded by document
    # length, not corpus size).
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "w0")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    leads = tok.select(
        "doc_id",
        "w0",
        *[F.lead("w0", j).over(win).alias(f"w{j}") for j in range(1, SHINGLE_N)],
    )
    gram = (
        leads.filter(F.col(f"w{SHINGLE_N - 1}").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", *[f"w{j}" for j in range(SHINGLE_N)]).alias("s"),
        )
        .dropDuplicates(["doc_id", "s"])
    )
    counted = gram.withColumn(
        "n", F.count("*").over(Window.partitionBy("doc_id")).cast("int")
    )
    # md5 as a TOP-LEVEL expression on exploded rows (codegen), not inside
    # a lambda.  Shingles are distinct per doc at this point, so n = |set|.
    return counted.select(
        "doc_id", "n", (md5_long("s") % F.lit(MOD_P)).alias("x")
    )


_EX_SQL = f"""
SELECT doc_id, n, {md5_long_sql('s')} % {MOD_P} AS x
FROM (
  SELECT doc_id, len(sh) AS n, unnest(sh) AS s
  FROM ({_DOC_SHINGLES_SQL}) t0
) t1
"""


def shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, n, x) distinct-shingle-hash relation, STAGED.

    Three independent consumers join this relation (the MinHash signature
    aggregate, both sides of the exact-Jaccard verify, and the n-gram
    inverted index), so it is computed once per corpus and published as a
    parquet intermediate (sources/staging.py) — ids + 60-bit hashes, tiny
    relative to the corpus.  At 100 TB this is "write the shingle-hash
    table, then join it"; with SPARK_GRAFT_STAGING=off it degrades to the
    in-plan computation.
    """
    return staged_parquet(
        spark,
        sf_dir,
        "shingle_hashes",
        build=lambda: _hashed_exploded(spark, sf_dir),
        params=f"v1-n{SHINGLE_N}-p{MOD_P}",
    )


def _minhash_aggs() -> list[Column]:
    """min((a*x + b) % p) per hash function — one aggregate each."""
    return [
        F.min(affine_apply(F.col("x"), a, b)).alias(f"mh{i}")
        for i, (a, b) in enumerate(HASHES)
    ]


def minhash_sig_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, n, mh0..mh{N-1}) signature relation, STAGED.

    One row per document — tiny at any corpus size — consumed by the
    minhash_signatures query, the pair-graph build, and every
    dedup_incremental ingest call, so the signature aggregation runs once
    per corpus instead of once per consumer.  Builds from the staged
    shingle-hash relation (one more small aggregate, not a corpus re-read).
    """

    def build() -> DataFrame:
        return (
            shingle_hashes(spark, sf_dir)
            .groupBy("doc_id", "n")
            .agg(*_minhash_aggs())
        )

    return staged_parquet(
        spark,
        sf_dir,
        "minhash_sig",
        build,
        params=f"v1-n{SHINGLE_N}-p{MOD_P}-h{N_HASHES}-seed42",
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature (the LSH building block), as columns.

    One scan -> explode distinct shingle hashes -> groupBy(doc) with
    N_HASHES min() aggregates.  The only shuffle is the tiny signature
    aggregation (partial mins computed map-side); the text itself never
    shuffles.  Reads the staged signature table when staging is on.
    """
    sig = (
        minhash_sig_table(spark, sf_dir)
        if staging_enabled()
        else _hashed_exploded(spark, sf_dir)
        .groupBy("doc_id", "n")
        .agg(*_minhash_aggs())
    )
    return sig.select(
        "doc_id", F.col("n").cast("int").alias("n_shingles"),
        *[F.col(f"mh{i}") for i in range(N_HASHES)],
    )


MINHASH_SIGNATURES_SQL = (
    "SELECT doc_id, CAST(n AS INTEGER) AS n_shingles, "
    + ", ".join(
        f"min({affine_apply_sql('x', a, b)}) AS mh{i}"
        for i, (a, b) in enumerate(HASHES)
    )
    + f" FROM ({_EX_SQL}) ex GROUP BY doc_id, n"
)


# skew guard for the LSH bucket join, same discipline as MAX_POSTING_DF:
# a band bucket larger than this is dropped from candidate generation
# (bounding any bucket's contribution to <= 64²/2 pairs).  A bucket only
# grows that hot when hundreds of documents share a signature band —
# i.e. exact or boilerplate duplicates, which the dedup_exact pre-pass
# and the quality gate own; LSH's job is the NEAR-duplicate tail.
# Fixture bucket sizes are single digits, so fixture results are
# unchanged.
MAX_BAND_BUCKET = 64


def _band_keys(sig: DataFrame) -> DataFrame:
    """(doc_id, band_key): one exploded row per LSH band per document."""
    band_cols = [
        F.concat_ws(
            ":",
            F.lit(str(i)),
            *[F.col(f"mh{i * BAND_ROWS + r}") for r in range(BAND_ROWS)],
        ).alias(f"band{i}")
        for i in range(N_BANDS)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band_key")
    )


def _drop_hot_bands(banded: DataFrame) -> DataFrame:
    """Exclude band buckets over MAX_BAND_BUCKET via a broadcast anti-join
    — by construction there are few such band keys, so the
    overwhelmingly-rare majority never shuffles for the size check."""
    hot = (
        banded.groupBy("band_key")
        .agg(F.count("*").alias("sz"))
        .filter(F.col("sz") > MAX_BAND_BUCKET)
        .select("band_key")
    )
    return banded.join(F.broadcast(hot), "band_key", "left_anti")


def _band_pairs(sig: DataFrame) -> DataFrame:
    """LSH band self-join -> distinct candidate pairs (da < db)."""
    banded = _drop_hot_bands(_band_keys(sig))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# band-key construction, oracle side (assumes BAND_ROWS == 2 like the
# Spark side's concat of the two row hashes)
_BAND_EXPRS_SQL = ", ".join(
    "concat('{i}', ':', mh{x}, ':', mh{y})".format(
        i=i, x=i * BAND_ROWS, y=i * BAND_ROWS + 1
    )
    for i in range(N_BANDS)
)


def _band_pairs_sql() -> str:
    band_exprs = _BAND_EXPRS_SQL
    return f"""
WITH sig AS ({MINHASH_SIGNATURES_SQL}),
banded0 AS (
  SELECT doc_id, unnest([{band_exprs}]) AS band_key FROM sig
),
hotband AS (
  SELECT band_key FROM banded0 GROUP BY band_key
  HAVING count(*) > {MAX_BAND_BUCKET}
),
banded AS (
  SELECT doc_id, band_key FROM banded0
  WHERE band_key NOT IN (SELECT band_key FROM hotband)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


def _jaccard_scored(ex: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact Jaccard on candidate pairs only, via the exploded relation.

    |A∩B| is a count over the shingle-hash join; Jaccard is int division
    in double — deterministic.  Candidate pairs sharing zero shingles drop
    out (inner join), which both engines agree on.
    """
    a = ex.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "x")
    b = ex.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "x")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "x"])
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    return inter.withColumn(
        "jaccard",
        F.col("inter").cast("double")
        / (F.col("na") + F.col("nb") - F.col("inter")),
    ).select("doc_a", "doc_b", "jaccard")


def _jaccard_verified(ex: DataFrame, cand: DataFrame) -> DataFrame:
    """Jaccard-scored candidates thresholded to verified near-dup pairs.
    Shared by dedup_near (LSH candidates) and dedup_ngram_jaccard
    (inverted-index candidates): same verify metric, different candidate
    generators."""
    return _jaccard_scored(ex, cand).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


# everything that changes the verified pair set keys the staged table
_PAIRS_PARAMS = (
    f"v1-n{SHINGLE_N}-h{N_HASHES}-r{BAND_ROWS}-j{JACCARD_THRESHOLD}"
    f"-cap{MAX_BAND_BUCKET}-seed42"
)


def near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified near-dup pair graph (doc_a, doc_b, jaccard), STAGED.

    The single most expensive shared intermediate in the engine: consumed
    by dedup_near, dedup_components, and pipeline_curate, so the
    shingle→MinHash→LSH→verify pipeline runs exactly once per corpus and
    every consumer joins the published parquet — the reference's analogue
    is its once-materialized intermediate bucket files
    (/root/reference/src/mr_tasks.h:45-76).
    """

    def build() -> DataFrame:
        ex = shingle_hashes(spark, sf_dir)
        sig = minhash_sig_table(spark, sf_dir)
        return _jaccard_verified(ex, _band_pairs(sig))

    return staged_parquet(
        spark, sf_dir, "near_dup_pairs", build, params=_PAIRS_PARAMS
    )


def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exactly verified.

    Pipeline: shingle -> minhash signature -> band keys -> self-join on
    band key (candidate generation, the only shuffle) -> exact Jaccard on
    candidates -> keep pairs >= threshold.  This is the scale path: the
    O(n²) comparison never happens; candidates are only docs agreeing on a
    full band.

    With staging on (default) this returns the published pair-graph table
    (near_dup_pairs); with SPARK_GRAFT_STAGING=off it computes in-session,
    persisting the exploded hash relation across its three consumers for
    the duration of the query (cache lifetime: the session).
    """
    if staging_enabled():
        return near_dup_pairs(spark, sf_dir)
    ex = _hashed_exploded(spark, sf_dir).persist()
    sig = ex.groupBy("doc_id", "n").agg(*_minhash_aggs())
    return _jaccard_verified(ex, _band_pairs(sig))


DEDUP_NEAR_SQL = f"""
WITH pairs AS ({_band_pairs_sql()}),
ex AS ({_EX_SQL}),
inter AS (
  SELECT pairs.doc_a, pairs.doc_b, a.n AS na, b.n AS nb, count(*) AS inter
  FROM pairs
  JOIN ex a ON pairs.doc_a = a.doc_id
  JOIN ex b ON pairs.doc_b = b.doc_id AND b.x = a.x
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
FROM inter
WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {JACCARD_THRESHOLD}
"""


# skew guard: a shingle held by more than this many documents is dropped
# from CANDIDATE GENERATION (never from the exact verify) — a df-64
# shingle still admits <= 64²/2 pairs, so one viral phrase can no longer
# produce O(corpus²) candidates.  Standard inverted-index/MinHash
# practice; the pigeonhole cost is recall only for pairs whose EVERY
# shared shingle is that common (at >= 0.8 Jaccard such docs are
# boilerplate the quality gate owns).  Fixture max df is 3-4, so fixture
# results are identical with or without the cap.
MAX_POSTING_DF = 64


def _ngram_candidates(ex: DataFrame) -> DataFrame:
    """Distinct candidate pairs from the posting-capped inverted index.

    The HOT side of the cap is what gets joined: shingles over the cap
    are by construction few (each one's postings alone would exceed the
    corpus duplicate rate), so the exclusion is a broadcast anti-join —
    the 99.9% rare postings never shuffle for the df check.
    """
    hot = (
        ex.groupBy("x")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > MAX_POSTING_DF)
        .select("x")
    )
    rare = ex.join(F.broadcast(hot), "x", "left_anti")
    a = rare.select(F.col("doc_id").alias("doc_a"), F.col("x").alias("s"))
    b = rare.select(F.col("doc_id").alias("doc_b"), F.col("x").alias("s"))
    return (
        a.join(b, ["s"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity join via rare-shingle inverted index.

    Candidate generation is the posting-capped inverted index (docs
    sharing at least one shingle rarer than MAX_POSTING_DF); the Jaccard
    verify then runs on the FULL shingle sets of candidates only, so
    reported similarities are exact.  Complements dedup_near: same
    verification metric, different (exact-index) candidate generator.
    """
    # join on the 60-bit shingle hash, not the 5-word string: the shuffle
    # key shrinks ~10x.  The exploded index comes from the staged
    # shingle_hashes table (computed once per corpus); with staging off it
    # is computed in-session and persisted across the join sides.
    if staging_enabled():
        ex = shingle_hashes(spark, sf_dir)
    else:
        ex = _hashed_exploded(spark, sf_dir).persist()
    return _jaccard_verified(ex, _ngram_candidates(ex))


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH ex AS ({_EX_SQL}),
rare AS (
  SELECT ex.doc_id, ex.x
  FROM ex JOIN (
    SELECT x FROM ex GROUP BY x HAVING count(*) <= {MAX_POSTING_DF}
  ) r ON ex.x = r.x
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b ON a.x = b.x AND a.doc_id < b.doc_id
),
inter AS (
  SELECT cand.doc_a, cand.doc_b, a.n AS na, b.n AS nb, count(*) AS inter
  FROM cand
  JOIN ex a ON cand.doc_a = a.doc_id
  JOIN ex b ON cand.doc_b = b.doc_id AND b.x = a.x
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
FROM inter
WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# Incremental (batch-vs-corpus) dedup
# ---------------------------------------------------------------------------

# The fixture has no separate ingest table, so the "incoming batch" is a
# fixed, oracle-expressible 10% slice of documents (doc_id % 10 == 7) —
# in production the batch side is the day's new files and the corpus side
# is the already-published index.
INC_MOD = 10
INC_SLOT = 7


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup an incoming batch AGAINST the existing corpus, incrementally.

    The 100 TB operating mode for dedup is not "re-run the all-corpus
    pipeline nightly" — it is "index once, then check each ingest batch
    against the published index".  This operator is that check: LSH band
    keys of the batch join the CORPUS side's band keys (a batch×corpus
    join, never corpus×corpus), candidates are exact-Jaccard-verified, and
    each batch document reports its best corpus match and a drop decision.
    The corpus side comes from the staged shingle-hash index
    (sources/staging.py) — the corpus text is never re-read, and the work
    per ingest scales with |batch|, not |corpus|.

    Hot corpus band buckets (> MAX_BAND_BUCKET docs) are dropped with the
    same broadcast anti-join discipline as dedup_near; batch docs sharing
    no band (or no shingle) with the corpus simply do not appear.
    Output: (batch_id, match_id, jaccard, is_duplicate), one row per batch
    doc with at least one verified candidate — ties broken by min
    match_id, so the result is deterministic.
    """
    if staging_enabled():
        ex = shingle_hashes(spark, sf_dir)
        sig = minhash_sig_table(spark, sf_dir)
    else:
        ex = _hashed_exploded(spark, sf_dir).persist()
        sig = ex.groupBy("doc_id", "n").agg(*_minhash_aggs())
    bands = _band_keys(sig)
    is_batch = (F.col("doc_id") % INC_MOD) == INC_SLOT
    batch_bands = bands.filter(is_batch)
    corpus_bands = _drop_hot_bands(bands.filter(~is_batch))
    cand = (
        batch_bands.alias("a")
        .join(corpus_bands.alias("b"), "band_key")
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    scored = _jaccard_scored(ex, cand)
    rn = F.row_number().over(
        Window.partitionBy("doc_a").orderBy(
            F.col("jaccard").desc(), F.col("doc_b").asc()
        )
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            F.col("doc_a").alias("batch_id"),
            F.col("doc_b").alias("match_id"),
            "jaccard",
            (F.col("jaccard") >= JACCARD_THRESHOLD).alias("is_duplicate"),
        )
    )


DEDUP_INCREMENTAL_SQL = f"""
WITH sig AS ({MINHASH_SIGNATURES_SQL}),
banded0 AS (
  SELECT doc_id, unnest([{_BAND_EXPRS_SQL}]) AS band_key FROM sig
),
batchb AS (
  SELECT doc_id, band_key FROM banded0 WHERE doc_id % {INC_MOD} = {INC_SLOT}
),
corpb0 AS (
  SELECT doc_id, band_key FROM banded0 WHERE doc_id % {INC_MOD} <> {INC_SLOT}
),
hotband AS (
  SELECT band_key FROM corpb0 GROUP BY band_key
  HAVING count(*) > {MAX_BAND_BUCKET}
),
corpb AS (
  SELECT doc_id, band_key FROM corpb0
  WHERE band_key NOT IN (SELECT band_key FROM hotband)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM batchb a JOIN corpb b ON a.band_key = b.band_key
),
ex AS ({_EX_SQL}),
inter AS (
  SELECT cand.doc_a, cand.doc_b, a.n AS na, b.n AS nb, count(*) AS inter
  FROM cand
  JOIN ex a ON cand.doc_a = a.doc_id
  JOIN ex b ON cand.doc_b = b.doc_id AND b.x = a.x
  GROUP BY 1, 2, 3, 4
),
scored AS (
  SELECT doc_a, doc_b,
         CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard,
         row_number() OVER (
           PARTITION BY doc_a
           ORDER BY CAST(inter AS DOUBLE) / (na + nb - inter) DESC, doc_b ASC
         ) AS rn
  FROM inter
)
SELECT doc_a AS batch_id, doc_b AS match_id, jaccard,
       jaccard >= {JACCARD_THRESHOLD} AS is_duplicate
FROM scored WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # md5_long yields 60 usable bits
SIMHASH_BAND_BITS = 15
SIMHASH_HAMMING_MAX = 3


def _simhash_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash fingerprint computation (see dedup_simhash)."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).withColumn("h", md5_long("token"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-doc fingerprint table, STAGED: one row per document, shared
    by dedup_simhash and both sides of dedup_simhash_pairs' band join."""
    return staged_parquet(
        spark,
        sf_dir,
        "simhash",
        build=lambda: _simhash_plan(spark, sf_dir),
        params=f"v1-b{SIMHASH_BITS}",
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 60-bit SimHash fingerprint.

    Token-frequency-weighted bit voting: bit b of the fingerprint is set
    iff sum over tokens of cnt * (+1 if bit b of md5(token) else -1) > 0.
    One explode + one groupBy(doc) with 60 conditional sums — all codegen.
    Returns the staged fingerprint table when staging is on.
    """
    if staging_enabled():
        return simhash_table(spark, sf_dir)
    return _simhash_plan(spark, sf_dir)


_SIMHASH_VOTES_SQL = ", ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(SIMHASH_BITS)
)
_SIMHASH_VALUE_SQL = " + ".join(
    f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
    for b in range(SIMHASH_BITS)
)

DEDUP_SIMHASH_SQL = f"""
WITH tok AS (
  SELECT doc_id, {md5_long_sql('token')} AS h
  FROM (SELECT doc_id, unnest({tokens_sql('text')}) AS token FROM documents) t
),
agg AS (SELECT doc_id, {_SIMHASH_VOTES_SQL} FROM tok GROUP BY doc_id)
SELECT doc_id, {_SIMHASH_VALUE_SQL} AS simhash FROM agg
"""


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash: band join + Hamming-distance verify.

    Pigeonhole: Hamming distance <= 3 over 4 bands of 15 bits guarantees at
    least one identical band, so the band equi-join finds all such pairs
    without an all-pairs scan.
    """
    # Both sides of the self-join reference the fingerprint relation; the
    # staged table makes that a cheap parquet re-read (one fingerprint row
    # per doc — tiny at any scale).  With staging off, persist instead:
    # without it the 60-vote aggregate runs twice (measured 6.6 s of the
    # pair query's 10.7 s at sf0.1); cache lifetime is the session.
    if staging_enabled():
        sim = simhash_table(spark, sf_dir)
    else:
        sim = _simhash_plan(spark, sf_dir).persist()
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(i)),
                        F.shiftright("simhash", i * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                        .cast("string"),
                    )
                    for i in range(SIMHASH_BITS // SIMHASH_BAND_BITS)
                ]
            )
        ).alias("band_key"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)


_SIMHASH_BAND_EXPRS = ", ".join(
    f"concat('{i}', ':', (simhash >> {i * SIMHASH_BAND_BITS}) & {(1 << SIMHASH_BAND_BITS) - 1})"
    for i in range(SIMHASH_BITS // SIMHASH_BAND_BITS)
)

DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH sim AS ({DEDUP_SIMHASH_SQL}),
bands AS (SELECT doc_id, simhash, unnest([{_SIMHASH_BAND_EXPRS}]) AS band_key FROM sim)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAMMING_MAX}
"""


# rounds = graph diameter reached; duplicate clusters are near-cliques
# (diameter 2-3); the cap only exists to bound adversarial graphs, and
# hitting it without convergence RAISES (a partial labeling is wrong).
MAX_CC_ROUNDS = 25

# truncate lineage every k propagation rounds: persist alone avoids
# recompute but each round still stacks join+agg operators on the logical
# plan, and a high-diameter graph (a chain of near-dups) would accrete an
# O(diameter)-deep lineage — localCheckpoint materializes the labels and
# cuts the plan back to a leaf.
CC_CHECKPOINT_EVERY = 5

# pair graphs at or below this size are solved with driver union-find
# instead of iterated joins: near-dup pairs are a vanishing fraction of
# any real corpus (they are the thing being removed), so even at 100 TB
# the pair list is usually million-scale — one collect beats 2-3 rounds
# of join+aggregate jobs.  Above the threshold the distributed
# label-propagation loop below takes over; both produce the identical
# min-label fixpoint.
DRIVER_CC_MAX_PAIRS = 1 << 20


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over the MinHash+LSH pairs.

    Pairwise dedup output is not yet a drop decision — documents chain
    (A~B, B~C) into clusters, and the pipeline keeps one canonical doc
    per cluster.  Min-label propagation over the pair graph, Pregel-style
    on DataFrames: each round a node takes the min of its own label and
    its neighbors' (one join + one aggregation per round), until a round
    changes nothing.  Rounds needed = graph diameter — for duplicate
    clusters (near-cliques) 2-3 in practice; each round is a bulk join,
    so the pattern scales as O(diameter) shuffles, the standard
    large-graph CC shape.  Driver involvement is one converged-count per
    round (an aggregate scalar, not data).

    Deterministic: the fixpoint is component = min(doc_id in component),
    independent of join order.  Output: one row per document that has at
    least one near-dup, its cluster id, and whether it is the cluster's
    canonical (minimum-id) member.
    """
    pairs = dedup_near(spark, sf_dir).select("doc_a", "doc_b")
    return components_from_pairs(spark, pairs)


def components_from_pairs(spark: SparkSession, pairs: DataFrame) -> DataFrame:
    """Connected components over an arbitrary (doc_a, doc_b) edge list.

    Adaptive: driver union-find at or below DRIVER_CC_MAX_PAIRS edges
    (bounded collect), distributed min-label propagation above it; both
    reach the identical min-label fixpoint (pinned by
    tests/test_sampling.py::test_dedup_components_distributed_path...).
    The distributed loop localCheckpoints labels every CC_CHECKPOINT_EVERY
    rounds (lineage stays O(k) deep regardless of graph diameter) and
    RAISES if MAX_CC_ROUNDS pass without the label sum converging — a
    partial labeling must never be returned as if it were components.
    """
    pairs = pairs.persist()
    if pairs.count() <= DRIVER_CC_MAX_PAIRS:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs.collect():
            a, b = r.doc_a, r.doc_b
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min so the fixpoint label is the min doc_id
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        pairs.unpersist()
        rows = [(d, find(d)) for d in parent]
        out = spark.createDataFrame(rows, "doc_id long, component long")
        return out.withColumn(
            "is_canonical", F.col("doc_id") == F.col("component")
        )

    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).toDF("src", "dst").persist()
    labels = edges.select(F.col("src").alias("doc_id")).distinct().withColumn(
        "component", F.col("doc_id")
    ).persist()

    # labels only ever decrease, so the label sum strictly decreases on
    # any change — an unchanged sum IS convergence.  One DECIMAL aggregate
    # per round (exact at any id range/corpus size) instead of a
    # join-the-old-labels-and-count job.
    _DEC = "decimal(38,0)"
    prev_sum = labels.agg(F.sum(F.col("component").cast(_DEC))).collect()[0][0]
    converged = False
    for round_no in range(MAX_CC_ROUNDS):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = labels.join(
            neighbor_min, labels.doc_id == neighbor_min.src, "left"
        ).select(
            "doc_id",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
        )
        if (round_no + 1) % CC_CHECKPOINT_EVERY == 0:
            # eager: materializes AND truncates lineage in one step
            new_labels = new_labels.localCheckpoint()
        else:
            new_labels = new_labels.persist()
        new_sum = new_labels.agg(F.sum(F.col("component").cast(_DEC))).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected components did not converge in {MAX_CC_ROUNDS} rounds "
            "(graph diameter exceeds the cap); raise MAX_CC_ROUNDS"
        )

    out = labels.withColumn(
        "is_canonical", (F.col("doc_id") == F.col("component"))
    )
    # edges/pairs caches are no longer referenced by the returned plan
    # (labels is materialized via checkpoint/persist)
    edges.unpersist()
    pairs.unpersist()
    return out


DEDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE
near AS (SELECT doc_a, doc_b FROM ({DEDUP_NEAR_SQL}) q),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM near
  UNION ALL
  SELECT doc_b, doc_a FROM near
),
reach(src, dst) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id, min(dst) AS component,
       (src = min(dst)) AS is_canonical
FROM reach GROUP BY src
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    # minhash_signatures rotated OUT to AUX in round 14: it is an
    # intermediate of dedup_near (which stays), so it was the most
    # redundant contract row — the pytest DuckDB-hash check keeps it
    # verified (tests/test_robustness.py::
    # test_minhash_signatures_oracle_parity); snapshot_row_ids took
    # the freed slot.
    "dedup_near": dedup_near,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    # dedup_simhash rotated OUT to AUX in round 15: its pair-graph twin
    # dedup_simhash_pairs stays (the same fingerprints through the
    # banded join), making it the most redundant contract pair; the
    # pytest DuckDB-hash check keeps it verified (tests/
    # test_robustness.py::test_dedup_simhash_oracle_parity).
    # snapshot_wap took the freed slot.
    "dedup_simhash_pairs": dedup_simhash_pairs,
}

EDIT_PREFIX = 256  # chars compared (the DP is O(len²) — bounded on purpose)
EDIT_MAX = 64      # keep pairs within this distance


def dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact character-level edit distance over the near-dup candidates
    — the char-granular member of the near-dup family (token Jaccard,
    SimHash bits, embedding cosine, and now Levenshtein), used to
    separate true re-typings/OCR variants from docs that merely share
    vocabulary.

    Never all-pairs: candidates are the staged banded pair graph (the
    same materialize-once table every dedup consumer joins), and the
    O(len²) DP runs on a bounded ``EDIT_PREFIX``-char prefix — both
    engines' ``levenshtein`` is the classic integer DP, so the result
    hash-matches exactly.  Plan shape: the pair relation broadcasts
    into two hash joins against the prefix projection of the documents
    scan; per-pair cost is constant, total cost O(pairs).
    """
    pairs = dedup_near(spark, sf_dir).select("doc_a", "doc_b")
    pref = table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, EDIT_PREFIX).alias("pref")
    )
    a = pref.select(
        F.col("doc_id").alias("doc_a"), F.col("pref").alias("pa")
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"), F.col("pref").alias("pb")
    )
    return (
        a.join(F.broadcast(pairs), "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pa", "pb").cast("long").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= EDIT_MAX)
    )


DEDUP_EDITDISTANCE_SQL = f"""
WITH near AS (SELECT doc_a, doc_b FROM ({DEDUP_NEAR_SQL}) q),
pref AS (SELECT doc_id, substr(text, 1, {EDIT_PREFIX}) AS pref
         FROM documents)
SELECT n.doc_a, n.doc_b,
       CAST(levenshtein(a.pref, b.pref) AS BIGINT) AS edit_dist
FROM near n
JOIN pref a ON n.doc_a = a.doc_id
JOIN pref b ON n.doc_b = b.doc_id
WHERE levenshtein(a.pref, b.pref) <= {EDIT_MAX}
"""


SEG_WORDS = 20  # tumbling segment width (the "line" of line-level dedup)


def dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document duplication profile: segment-level exact dedup
    (the CCNet/RefinedWeb "line-level dedup" shape, adapted to the
    fixture's unstructured text via tumbling ``SEG_WORDS``-word
    segments).  Doc-level near-dup misses boilerplate — headers,
    license blocks, navigation — repeated across otherwise-distinct
    documents; this measures, per document, how many of its segments
    appear verbatim in at least one OTHER document.

    Plan shape at 100 TB: segments are exploded row-locally in the scan
    stage (no shuffle — same as ``chunk_documents``) and pre-aggregated
    to (doc, segment, multiplicity) with map-side partial aggregation;
    the per-segment doc count derives from that relation (its rows are
    already distinct on (doc, segment), so ``count`` ≡
    ``countDistinct(doc_id)``) and the per-doc profile joins it back on
    segment — two column-pruned passes total, every shuffle carrying
    aggregated rows, never raw instances twice.  In production the join
    key is a 128-bit segment hash (same plan, narrower key) and a viral
    boilerplate segment is AQE skew-join territory — partial aggs bound
    everything else.  No all-pairs anything: cost is O(total segments),
    the same class as wordcount.

    Returns ``(doc_id, n_segs, n_dup_segs, dup_frac)`` for every
    non-empty document.
    """
    segs = _doc_segments(spark, sf_dir).drop("i")
    per = segs.groupBy("doc_id", "segment").agg(
        F.count(F.lit(1)).alias("m")
    )
    nd = per.groupBy("segment").agg(F.count(F.lit(1)).alias("nd"))
    return (
        per.join(nd, "segment")
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_segs"),
            F.sum(
                F.when(F.col("nd") > 1, F.col("m")).otherwise(F.lit(0))
            ).alias("n_dup_segs"),
        )
        .select(
            "doc_id",
            "n_segs",
            "n_dup_segs",
            F.round(
                F.col("n_dup_segs") / F.col("n_segs").cast("double"), 6
            ).alias("dup_frac"),
        )
    )


def _doc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, i, segment): tumbling ``SEG_WORDS``-word segments of
    every non-empty document — computed row-locally in the scan stage
    (tokenize once, explode an index sequence, slice)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("w")).withColumn(
        "n_tok", F.size("w").cast("bigint")
    )
    n_seg = F.ceil(F.col("n_tok") / F.lit(float(SEG_WORDS))).cast("bigint")
    return (
        toks.filter(F.col("n_tok") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), n_seg - 1)
            ).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            "i",
            F.array_join(
                F.slice(
                    F.col("w"),
                    (F.col("i") * SEG_WORDS + 1).cast("int"),
                    SEG_WORDS,
                ),
                " ",
            ).alias("segment"),
        )
    )


DEDUP_SEGMENTS_SQL = f"""
WITH t AS (
  SELECT doc_id, {tokens_sql('text')} AS w FROM documents
),
segs AS (
  SELECT doc_id,
         array_to_string(
           w[(i*{SEG_WORDS}+1):(i*{SEG_WORDS}+{SEG_WORDS})], ' '
         ) AS segment
  FROM t, LATERAL (
    SELECT unnest(generate_series(
      0, CAST(ceil(len(w) / {SEG_WORDS}.0) AS BIGINT) - 1
    )) AS i
  ) u
  WHERE len(w) > 0
),
shared AS (
  SELECT segment FROM segs GROUP BY segment
  HAVING count(DISTINCT doc_id) > 1
),
tot AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id),
dup AS (
  SELECT s.doc_id, count(*) AS n_dup
  FROM segs s JOIN shared USING (segment) GROUP BY s.doc_id
)
SELECT tot.doc_id,
       CAST(tot.n_segs AS BIGINT) AS n_segs,
       CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup_segs,
       round(coalesce(dup.n_dup, 0) / tot.n_segs, 6) AS dup_frac
FROM tot LEFT JOIN dup ON tot.doc_id = dup.doc_id
"""


def clean_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRANSFORM companion to ``dedup_segments``: rebuild each
    document with its cross-document duplicated segments REMOVED — the
    actual CCNet/RefinedWeb line-level cleaning step (strip boilerplate
    repeated verbatim across pages, keep the unique prose).

    Plan shape: the shared-segment counts derive from the same
    pre-aggregated (doc, segment) relation as the profile query; the
    instance-level segments join those counts on segment (INNER — every
    instance keeps its verdict as a row-local ``nd`` column, so no
    anti-join and no separate totals branch), and ONE per-doc
    aggregation computes the removed count and reassembles the kept
    text: kept segments collect as (index, text) structs
    (``collect_list`` skips the nulls ``when`` leaves for shared
    instances), ``array_sort`` restores document order row-locally,
    ``array_join`` re-concatenates.  No per-row Python, no all-pairs.
    A fully-boilerplate document survives as an empty string (its
    emptiness is then ``text_quality``'s signal to drop it — policy
    belongs to the gate, not the cleaner).
    """
    segs = _doc_segments(spark, sf_dir)
    nd = (
        segs.groupBy("doc_id", "segment")
        .agg(F.count(F.lit(1)).alias("m"))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    return (
        segs.join(nd, "segment")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("nd") > 1, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("nd") == 1,
                                F.struct("i", "segment"),
                            )
                        )
                    ),
                    lambda s: s["segment"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .select("doc_id", "n_removed", "clean_text")
    )


CLEAN_SEGMENTS_SQL = f"""
WITH t AS (
  SELECT doc_id, {tokens_sql('text')} AS w FROM documents
),
segs AS (
  SELECT doc_id, i,
         array_to_string(
           w[(i*{SEG_WORDS}+1):(i*{SEG_WORDS}+{SEG_WORDS})], ' '
         ) AS segment
  FROM t, LATERAL (
    SELECT unnest(generate_series(
      0, CAST(ceil(len(w) / {SEG_WORDS}.0) AS BIGINT) - 1
    )) AS i
  ) u
  WHERE len(w) > 0
),
shared AS (
  SELECT segment FROM segs GROUP BY segment
  HAVING count(DISTINCT doc_id) > 1
),
kept AS (
  SELECT s.doc_id, s.i, s.segment
  FROM segs s LEFT JOIN shared sh ON s.segment = sh.segment
  WHERE sh.segment IS NULL
),
ka AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(segment, ' ' ORDER BY i) AS clean_text
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id)
SELECT tot.doc_id,
       CAST(tot.n_segs - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(ka.clean_text, '') AS clean_text
FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id
"""


def span_gram_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``(doc_id, pos, gh)`` hashed SPAN_K-token-window relation,
    STAGED (the ``shingle_hashes`` pattern).

    Both span consumers (``dedup_spans``, ``dedup_spans_keepfirst``)
    scan this relation twice — once for the shared-gram aggregate,
    once for the position join — so staging it turns their double
    CORPUS scan (tokenize + posexplode, the dominant cost) into two
    reads of one materialized ids+positions+hashes table, tiny
    relative to the corpus.  Grams travel as ``xxhash64`` of the
    window text (64-bit — the same grammar the profile query
    ``span_dup_stats`` hashes with; a cross-doc collision at corpus
    scale is ~n^2/2^64 and only ever over-removes one window).  With
    ``SPARK_GRAFT_STAGING=off`` it degrades to the in-plan
    computation — identical rows either way, exactly like the other
    staged relations; staleness is keyed by fixture fingerprint +
    SPAN_K."""
    from .quality import SPAN_K

    def build() -> DataFrame:
        docs = table(spark, sf_dir, "documents", spread=True)
        base = docs.select("doc_id", tokens("text").alias("tk"))
        grams = F.expr(
            f"transform(slice(tk, 1, greatest(size(tk) - {SPAN_K - 1}, 0)), "
            f"(x, i) -> concat_ws(' ', "
            + ", ".join(["x"] + [f"tk[i+{j}]" for j in range(1, SPAN_K)])
            + "))"
        )
        return base.select(
            "doc_id", F.posexplode(grams).alias("pos", "gram")
        ).select("doc_id", "pos", F.xxhash64("gram").alias("gh"))

    return staged_parquet(
        spark,
        sf_dir,
        "span_grams",
        build,
        params=f"v1-k{SPAN_K}",
    )


def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup as a TRANSFORM: remove every token covered
    by a ``SPAN_K``-token window that also occurs verbatim in another
    document, and reassemble the surviving tokens — the removal step of
    Lee et al. 2021's suffix-array dedup, re-expressed as the gram
    shuffle ``span_dup_stats`` (operators/quality.py) already does.

    Plan: windows explode WITH their start position (``posexplode`` —
    the only addition over the profile query's gram relation); grams
    seen in >= 2 distinct docs come from the same two-level map-side
    agg; the shared windows' start positions fold back per doc as ONE
    ``collect_set`` (bounded by the doc's own window count); and the
    rebuild is entirely row-local — expand starts to covered token
    indices (``sequence``/``flatten``/``array_distinct``), keep the
    uncovered tokens (``filter`` with index), ``concat_ws`` back to
    text.  No per-row Python, no token-level shuffle: only grams and
    per-doc start-sets move.  The per-doc rebuild is O(tokens x
    covered) array scans — fine for real documents; a pathological
    fully-boilerplate doc degrades to O(n^2) row-local work, never a
    shuffle.

    Contract notes: (1) whitespace/punctuation normalize to single
    spaces (the transform is defined over the token stream — same as
    ``clean_segments``); (2) spans shared between documents are
    removed from BOTH — run ``dedup_exact`` FIRST so identical clones
    do not erase each other (the Lee et al. pipeline also removes
    exact duplicates before the substring pass; this operator targets
    cross-page boilerplate, not whole-document copies), or use
    ``dedup_spans_keepfirst``.

    Plan audit (``.explain``): the gram relation is consumed TWICE
    (the shared-gram agg branch and the position-join branch) —
    deliberate.  The one-pass alternative (``collect_list((doc_id,
    pos))`` per gram, filter, re-explode) saves the second pass but
    holds one gram's ENTIRE posting list in a single aggregation
    buffer — unbounded for a stop-phrase gram at corpus scale, the
    same hot-key hazard the LSH operators cap.  Since r13 the
    relation is STAGED (``span_gram_windows`` via
    ``sources/staging.py``): both passes read one materialized
    ids+positions+hashes parquet instead of re-tokenizing the corpus,
    so the double scan costs two cheap reads; with staging off the
    two in-plan scans remain — bounded memory either way, the
    scale-safe direction.

    Returns ``doc_id, n_tokens, removed_tokens, clean_text``."""
    from .quality import SPAN_K

    docs = table(spark, sf_dir, "documents", spread=True)
    base = docs.select("doc_id", tokens("text").alias("tk"))
    win = span_gram_windows(spark, sf_dir)
    shared = (
        win.groupBy("gh", "doc_id")
        .agg(F.count("*").alias("c"))
        .groupBy("gh")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    starts = (
        win.join(shared, "gh")
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("starts"))
    )
    return (
        base.join(starts, "doc_id", "left")
        .withColumn(
            "cov",
            F.expr(
                "array_distinct(flatten(transform("
                "coalesce(starts, CAST(array() AS ARRAY<INT>)), "
                f"s -> sequence(s, s + {SPAN_K - 1}))))"
            ),
        )
        .withColumn(
            "kept", F.expr("filter(tk, (x, i) -> NOT array_contains(cov, i))")
        )
        .select(
            "doc_id",
            F.size("tk").cast("long").alias("n_tokens"),
            (F.size("tk") - F.size("kept")).cast("long").alias(
                "removed_tokens"
            ),
            F.concat_ws(" ", F.col("kept")).alias("clean_text"),
        )
    )


def dedup_spans_keepfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_spans`` with Lee et al.'s keep-one-copy policy: each
    shared gram has an OWNER (the smallest doc_id containing it), and
    the covering windows are removed only from NON-owner documents —
    so boilerplate text always survives somewhere in the corpus, and
    two identical documents come out as one intact copy plus one empty
    shell instead of two empty shells (no dedup_exact prerequisite).

    Same plan as ``dedup_spans`` plus one column: the gram agg also
    takes ``min(doc_id)`` (free — same shuffle), and the start-set
    join filters ``doc_id != owner``.  Simplification vs the paper:
    the owner keeps ALL its occurrences of the span, not exactly one
    (intra-document repetition is ``repetition_stats``' signal).

    Returns ``doc_id, n_tokens, removed_tokens, clean_text``."""
    from .quality import SPAN_K

    docs = table(spark, sf_dir, "documents", spread=True)
    base = docs.select("doc_id", tokens("text").alias("tk"))
    win = span_gram_windows(spark, sf_dir)
    shared = (
        win.groupBy("gh", "doc_id")
        .agg(F.count("*").alias("c"))
        .groupBy("gh")
        .agg(
            F.count("*").alias("nd"),
            F.min("doc_id").alias("owner"),
        )
        .filter(F.col("nd") >= 2)
        .select("gh", "owner")
    )
    starts = (
        win.join(shared, "gh")
        .filter(F.col("doc_id") != F.col("owner"))
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("starts"))
    )
    return (
        base.join(starts, "doc_id", "left")
        .withColumn(
            "cov",
            F.expr(
                "array_distinct(flatten(transform("
                "coalesce(starts, CAST(array() AS ARRAY<INT>)), "
                f"s -> sequence(s, s + {SPAN_K - 1}))))"
            ),
        )
        .withColumn(
            "kept", F.expr("filter(tk, (x, i) -> NOT array_contains(cov, i))")
        )
        .select(
            "doc_id",
            F.size("tk").cast("long").alias("n_tokens"),
            (F.size("tk") - F.size("kept")).cast("long").alias(
                "removed_tokens"
            ),
            F.concat_ws(" ", F.col("kept")).alias("clean_text"),
        )
    )


def _dedup_spans_keepfirst_sql() -> str:
    from .quality import SPAN_K

    gram_cols = ", ".join(f"w[u.i + {j}]" for j in range(1, SPAN_K + 1))
    return f"""
WITH base AS (
  SELECT doc_id, {tokens_sql('text')} AS w FROM documents
),
win AS (
  SELECT doc_id, u.i AS pos, concat_ws(' ', {gram_cols}) AS gram
  FROM base, LATERAL (
    SELECT unnest(generate_series(0, len(w) - {SPAN_K})) AS i
  ) u
  WHERE len(w) >= {SPAN_K}
),
shared AS (
  SELECT gram, owner FROM (
    SELECT gram, count(DISTINCT doc_id) AS nd,
           min(doc_id) AS owner
    FROM win GROUP BY gram
  ) s WHERE nd >= 2
),
cov AS (
  SELECT DISTINCT d.doc_id, d.pos + g.j AS cp
  FROM (
    SELECT w2.doc_id, w2.pos
    FROM win w2 JOIN shared sh USING (gram)
    WHERE w2.doc_id <> sh.owner
  ) d,
       LATERAL (
         SELECT unnest(generate_series(0, {SPAN_K - 1})) AS j
       ) g
),
tok AS (
  SELECT doc_id, u.j AS p0, w[u.j + 1] AS tkn
  FROM base, LATERAL (
    SELECT unnest(generate_series(0, len(w) - 1)) AS j
  ) u
  WHERE len(w) > 0
),
ka AS (
  SELECT t.doc_id, count(*) AS n_kept,
         string_agg(t.tkn, ' ' ORDER BY t.p0) AS clean_text
  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p0 = c.cp
  WHERE c.cp IS NULL
  GROUP BY t.doc_id
),
ns AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM base)
SELECT ns.doc_id, ns.n_tokens,
       CAST(ns.n_tokens - coalesce(ka.n_kept, 0) AS BIGINT)
         AS removed_tokens,
       coalesce(ka.clean_text, '') AS clean_text
FROM ns LEFT JOIN ka USING (doc_id)
"""


DEDUP_SPANS_KEEPFIRST_SQL = _dedup_spans_keepfirst_sql()


def _dedup_spans_sql() -> str:
    from .quality import SPAN_K

    gram_cols = ", ".join(f"w[u.i + {j}]" for j in range(1, SPAN_K + 1))
    return f"""
WITH base AS (
  SELECT doc_id, {tokens_sql('text')} AS w FROM documents
),
win AS (
  SELECT doc_id, u.i AS pos, concat_ws(' ', {gram_cols}) AS gram
  FROM base, LATERAL (
    SELECT unnest(generate_series(0, len(w) - {SPAN_K})) AS i
  ) u
  WHERE len(w) >= {SPAN_K}
),
shared AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS nd FROM win GROUP BY gram
  ) s WHERE nd >= 2
),
cov AS (
  SELECT DISTINCT d.doc_id, d.pos + g.j AS cp
  FROM (SELECT w2.doc_id, w2.pos FROM win w2 JOIN shared USING (gram)) d,
       LATERAL (
         SELECT unnest(generate_series(0, {SPAN_K - 1})) AS j
       ) g
),
tok AS (
  SELECT doc_id, u.j AS p0, w[u.j + 1] AS tkn
  FROM base, LATERAL (
    SELECT unnest(generate_series(0, len(w) - 1)) AS j
  ) u
  WHERE len(w) > 0
),
ka AS (
  SELECT t.doc_id, count(*) AS n_kept,
         string_agg(t.tkn, ' ' ORDER BY t.p0) AS clean_text
  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p0 = c.cp
  WHERE c.cp IS NULL
  GROUP BY t.doc_id
),
ns AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM base)
SELECT ns.doc_id, ns.n_tokens,
       CAST(ns.n_tokens - coalesce(ka.n_kept, 0) AS BIGINT)
         AS removed_tokens,
       coalesce(ka.clean_text, '') AS clean_text
FROM ns LEFT JOIN ka USING (doc_id)
"""


DEDUP_SPANS_SQL = _dedup_spans_sql()


AUX_QUERIES = {
    "dedup_components": dedup_components,
    "dedup_incremental": dedup_incremental,
    "dedup_editdistance": dedup_editdistance,
    "dedup_segments": dedup_segments,
    "clean_segments": clean_segments,
    "dedup_spans": dedup_spans,
    "dedup_spans_keepfirst": dedup_spans_keepfirst,
    "minhash_signatures": minhash_signatures,
    "dedup_simhash": dedup_simhash,
}

AUX_ORACLES = {
    "minhash_signatures": MINHASH_SIGNATURES_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "dedup_components": DEDUP_COMPONENTS_SQL,
    "dedup_incremental": DEDUP_INCREMENTAL_SQL,
    "dedup_editdistance": DEDUP_EDITDISTANCE_SQL,
    "dedup_segments": DEDUP_SEGMENTS_SQL,
    "clean_segments": CLEAN_SEGMENTS_SQL,
    "dedup_spans": DEDUP_SPANS_SQL,
    "dedup_spans_keepfirst": DEDUP_SPANS_KEEPFIRST_SQL,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_near": DEDUP_NEAR_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD_SQL,
    "dedup_simhash_pairs": DEDUP_SIMHASH_PAIRS_SQL,
}
