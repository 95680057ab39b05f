"""Corpus-curation operators: PII redaction and sequence packing.

Two more stages a pre-training data pipeline runs between raw text and
the trainer, both shaped for 100 TB:

 - ``redact_pii``    — regex scrub of emails / phone numbers, entirely
   row-local (codegen'd ``regexp_replace``, no shuffle, no Python).
   Patterns stay in the Java-regex ∩ RE2 common subset (no lookaround)
   so the DuckDB oracle runs the very same expressions.
 - ``pack_sequences`` — assign documents to fixed-token-budget training
   sequences by running token count.  The exact greedy packer (reset the
   budget when it overflows) is an inherently sequential scan; the
   scalable form used here bins by ``floor(cumulative_tokens / budget)``
   over a deterministic document order — one window over one sort,
   mergeable at any scale, bins overflow the budget by at most one
   document (the standard approximation real packers make per shard).

Both are AUX queries (contract at its 50 cap): DuckDB-hash-checked in
``tests/test_sampling.py::test_curation_oracle_parity`` and benched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.hashes import md5_long, md5_long_sql
from ..functions.textfns import tokens, tokens_sql

# Java-regex ∩ RE2 subset (char classes, bounded quantifiers only)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 ()-]{7,}[0-9]"

SEQ_TOKEN_BUDGET = 512

# Sub-shard count for the packing window.  Partitioning by ``source``
# alone funnels a dominant source through ONE window task (a real corpus
# is mostly one crawl — at 100 TB that is billions of rows sorted and
# scanned on a single core).  ``pmod(doc_id, N_PACK_SHARDS)`` splits each
# source into N independent shards; bins become (source, pack_shard,
# seq_id) with seq_id SHARD-LOCAL, which the packing semantics accept
# (bins are dense within a shard, overflow still bounded by one document
# per bin).  On a real cluster size this ~(source rows / shard) to fit an
# executor; doc_id modulo is used (not a hash) so the DuckDB oracle
# computes the identical shard.
N_PACK_SHARDS = 8


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails then phones; report per-doc redaction counts."""
    docs = table(spark, sf_dir, "documents")
    no_email = F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
    n_emails = F.size(F.split(F.col("text"), EMAIL_RE)) - 1
    n_phones = F.size(F.split(no_email, PHONE_RE)) - 1
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_emails.cast("bigint").alias("n_emails"),
        n_phones.cast("bigint").alias("n_phones"),
    )


REDACT_PII_SQL = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       len(regexp_split_to_array(text, '{EMAIL_RE}')) - 1 AS n_emails,
       len(regexp_split_to_array(
             regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}')) - 1 AS n_phones
FROM documents
"""


def _pack_shard() -> F.Column:
    return F.pmod(F.col("doc_id"), F.lit(N_PACK_SHARDS)).cast("int")


_PACK_SHARD_SQL = f"CAST(((doc_id % {N_PACK_SHARDS}) + {N_PACK_SHARDS}) % {N_PACK_SHARDS} AS INTEGER)"


def _pack_window() -> Window:
    return (
        Window.partitionBy("source", "pack_shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each doc to a training-sequence bin by running token count.

    Packing runs independently WITHIN each (source, pack_shard) shard:
    one hash-partition shuffle on the shard key, then a per-shard sort —
    embarrassingly parallel, no global order, the shape that survives
    100 TB (a single global ORDER BY window — or a per-source window when
    one source dominates the corpus — would funnel the data through one
    task; see N_PACK_SHARDS).  Within a shard, deterministic doc_id
    order; ``seq_id = floor(tokens_before / budget)`` where tokens_before
    excludes the current doc — so a bin always accepts the document that
    crosses the budget boundary (bounded overflow) and every bin is
    dense within its shard.
    """
    docs = table(spark, sf_dir, "documents")
    with_n = docs.select(
        "doc_id",
        "source",
        _pack_shard().alias("pack_shard"),
        F.size(tokens("text")).cast("bigint").alias("n_tok"),
    )
    before = F.coalesce(F.sum("n_tok").over(_pack_window()), F.lit(0))
    return with_n.select(
        "doc_id",
        "source",
        "pack_shard",
        "n_tok",
        F.floor(before / SEQ_TOKEN_BUDGET).cast("bigint").alias("seq_id"),
    )


PACK_SEQUENCES_SQL = f"""
SELECT doc_id, source, pack_shard, n_tok,
       CAST(floor(
         (COALESCE(sum(n_tok) OVER (PARTITION BY source, pack_shard
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0)
          * 1.0) / {SEQ_TOKEN_BUDGET}) AS BIGINT) AS seq_id
FROM (
  SELECT doc_id, source, {_PACK_SHARD_SQL} AS pack_shard,
         CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tok
  FROM documents
) t
"""


CHUNK_SIZE = 64   # tokens per chunk (the model context-window unit)
CHUNK_STRIDE = 48  # overlap = CHUNK_SIZE - CHUNK_STRIDE tokens


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping fixed-token chunks.

    Long documents exceed the model context window; training prep slides
    a CHUNK_SIZE window by CHUNK_STRIDE (16-token overlap preserves
    cross-boundary context).  Row-local: tokenize once, ``explode`` a
    chunk-index sequence, ``slice`` the token array — no shuffle at all;
    chunk rows land in the same scan partition as their document.
    Zero-token documents produce no chunks (both engines agree).
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", tokens("text").alias("w")
    ).withColumn("n_tok", F.size("w").cast("bigint"))
    n_last = F.greatest(
        F.lit(0),
        F.ceil((F.col("n_tok") - CHUNK_SIZE) / F.lit(float(CHUNK_STRIDE))).cast(
            "bigint"
        ),
    )
    chunks = toks.filter(F.col("n_tok") > 0).select(
        "doc_id",
        "source",
        "n_tok",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_last)).alias("chunk_no"),
        F.col("w"),
    )
    piece = F.slice(
        F.col("w"), (F.col("chunk_no") * CHUNK_STRIDE + 1).cast("int"), CHUNK_SIZE
    )
    return chunks.select(
        "doc_id",
        "source",
        F.col("chunk_no").cast("int").alias("chunk_no"),
        F.size(piece).cast("bigint").alias("chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


CHUNK_DOCUMENTS_SQL = f"""
SELECT doc_id, source,
       CAST(i AS INTEGER) AS chunk_no,
       CAST(len(w[(i*{CHUNK_STRIDE}+1):(i*{CHUNK_STRIDE}+{CHUNK_SIZE})]) AS BIGINT)
         AS chunk_tokens,
       array_to_string(w[(i*{CHUNK_STRIDE}+1):(i*{CHUNK_STRIDE}+{CHUNK_SIZE})], ' ')
         AS chunk_text
FROM (
  SELECT doc_id, source, {tokens_sql('text')} AS w FROM documents
) t,
LATERAL (
  SELECT unnest(generate_series(
    0, greatest(0, CAST(ceil((len(w) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0) AS BIGINT))
  )) AS i
) u
WHERE len(w) > 0
"""


MIN_TOKENS = 10  # quality gate: drop degenerate documents


def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE composed plan: quality gate →
    near-dup cluster canonical-only → stratified language mix → sequence
    packing.

    This is the end-to-end shape a pre-training corpus actually runs;
    composing it as one DataFrame lets Catalyst pipeline the row-local
    stages (gate, hash filter) into the scan and schedule only the two
    unavoidable shuffles (the dedup pair graph; the per-shard packing
    sort).  The anti-join against non-canonical cluster members is
    broadcast-sized at any scale (near-dup losers are a tiny fraction of
    the corpus).
    """
    from .dedup import dedup_components
    from .sampling import (
        DEFAULT_RATE,
        SAMPLE_SALT,
        STRATA_RATES,
        _rate_threshold,
    )

    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "lang", "source",
        F.size(tokens("text")).cast("bigint").alias("n_tok"),
    )
    quality = base.filter(F.col("n_tok") >= MIN_TOKENS)

    losers = (
        dedup_components(spark, sf_dir)
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )
    survivors = quality.join(losers, "doc_id", "left_anti")

    u = md5_long(F.concat_ws(":", F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")))
    thresh = F.lit(_rate_threshold(DEFAULT_RATE))
    for lang, rate in STRATA_RATES.items():
        thresh = F.when(F.col("lang") == lang, F.lit(_rate_threshold(rate))).otherwise(
            thresh
        )
    sampled = survivors.filter(u < thresh).withColumn(
        "pack_shard", _pack_shard()
    )

    before = F.coalesce(F.sum("n_tok").over(_pack_window()), F.lit(0))
    return sampled.select(
        "doc_id", "lang", "source", "pack_shard", "n_tok",
        F.floor(before / SEQ_TOKEN_BUDGET).cast("bigint").alias("seq_id"),
    )


def _pipeline_curate_sql() -> str:
    from .dedup import DEDUP_NEAR_SQL
    from .sampling import _THRESH_SQL, SAMPLE_SALT

    return f"""
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
),
losers AS (
  SELECT src AS doc_id FROM reach GROUP BY src HAVING src <> min(dst)
),
base AS (
  SELECT doc_id, lang, source,
         CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tok
  FROM documents
),
sampled AS (
  SELECT * FROM base
  WHERE n_tok >= {MIN_TOKENS}
    AND doc_id NOT IN (SELECT doc_id FROM losers)
    AND {md5_long_sql(f"concat('{SAMPLE_SALT}', ':', CAST(doc_id AS VARCHAR))")}
        < {_THRESH_SQL}
)
SELECT doc_id, lang, source, {_PACK_SHARD_SQL} AS pack_shard, n_tok,
       CAST(floor(
         (COALESCE(sum(n_tok) OVER (PARTITION BY source, {_PACK_SHARD_SQL}
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0)
          * 1.0) / {SEQ_TOKEN_BUDGET}) AS BIGINT) AS seq_id
FROM sampled
"""


# ---------------------------------------------------------------------------
# Eval-set decontamination
# ---------------------------------------------------------------------------

# the fixture has no separate eval table, so the eval set is a fixed,
# oracle-expressible 5% slice of documents (doc_id % 100 < 5) — in
# production this is a join against the real benchmark/eval corpus
EVAL_MOD = 100
EVAL_SLOTS = 5
CONTAM_THRESHOLD = 0.5  # flag when half a doc's shingles appear in one eval doc


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram eval-set contamination check over the training corpus.

    Pre-training pipelines must drop training documents that overlap the
    evaluation benchmarks (the GPT-3/Llama n-gram decontamination step).
    For each training doc this reports the eval doc with the highest
    shingle-overlap fraction ``|shingles(train) ∩ shingles(eval)| /
    |shingles(train)|`` and flags it at CONTAM_THRESHOLD.

    Scale shape: joins the STAGED shingle-hash relation against its
    (tiny) eval-side slice on the 60-bit shingle hash — the corpus text
    never reshuffles, and hot eval shingles (df > MAX_POSTING_DF, i.e.
    boilerplate) are excluded via a broadcast anti-join with the same
    skew discipline as the dedup candidate generators.  Only docs sharing
    at least one rare shingle with the eval set appear in the output.
    """
    from .dedup import MAX_POSTING_DF, _hashed_exploded, shingle_hashes
    from ..sources.staging import staging_enabled

    ex = (
        shingle_hashes(spark, sf_dir)
        if staging_enabled()
        else _hashed_exploded(spark, sf_dir).persist()
    )
    eval_ex = ex.filter((F.col("doc_id") % EVAL_MOD) < EVAL_SLOTS).select(
        F.col("doc_id").alias("eval_id"), "x"
    )
    hot = (
        eval_ex.groupBy("x")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > MAX_POSTING_DF)
        .select("x")
    )
    eval_rare = eval_ex.join(F.broadcast(hot), "x", "left_anti")
    train = ex.filter((F.col("doc_id") % EVAL_MOD) >= EVAL_SLOTS)
    ov = (
        train.join(eval_rare, "x")
        .groupBy("doc_id", "eval_id", "n")
        .agg(F.count("*").alias("inter"))
    )
    ranked = ov.select(
        "doc_id",
        "eval_id",
        (F.col("inter").cast("double") / F.col("n")).alias("overlap"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.col("overlap").desc(), F.col("eval_id").asc()
            )
        ),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "doc_id",
        "eval_id",
        "overlap",
        (F.col("overlap") >= CONTAM_THRESHOLD).alias("is_contaminated"),
    )


def _decontaminate_sql() -> str:
    from .dedup import _EX_SQL, MAX_POSTING_DF

    return f"""
WITH ex AS ({_EX_SQL}),
evalx AS (
  SELECT doc_id AS eval_id, x FROM ex WHERE doc_id % {EVAL_MOD} < {EVAL_SLOTS}
),
hot AS (
  SELECT x FROM evalx GROUP BY x HAVING count(*) > {MAX_POSTING_DF}
),
eval_rare AS (
  SELECT eval_id, x FROM evalx WHERE x NOT IN (SELECT x FROM hot)
),
train AS (
  SELECT doc_id, n, x FROM ex WHERE doc_id % {EVAL_MOD} >= {EVAL_SLOTS}
),
ov AS (
  SELECT t.doc_id, e.eval_id, t.n, count(*) AS inter
  FROM train t JOIN eval_rare e ON t.x = e.x
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT doc_id, eval_id, CAST(inter AS DOUBLE) / n AS overlap,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY CAST(inter AS DOUBLE) / n DESC, eval_id ASC
         ) AS rn
  FROM ov
)
SELECT doc_id, eval_id, overlap,
       overlap >= {CONTAM_THRESHOLD} AS is_contaminated
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Source-mix weights
# ---------------------------------------------------------------------------


def mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token shares and the resampling weight that would make
    the training mix uniform across sources.

    Data-mixture rebalancing is a standard pre-training stage: the
    sampler multiplies each source's natural share by ``weight`` to hit
    the target mix (uniform here; any target vector substitutes the same
    way).  One partial+final aggregation over the corpus; the share
    window runs over the aggregated per-source rows — a handful at any
    corpus size, so the unpartitioned window is scale-safe.
    """
    docs = table(spark, sf_dir, "documents")
    agg = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens("text")).cast("bigint")).alias("n_tokens"),
    )
    w = Window.partitionBy()
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    target = F.lit(1.0) / F.count("*").over(w)
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("token_share"),
        (target / share).alias("weight"),
    )


MIX_WEIGHTS_SQL = f"""
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS token_share,
       (1.0 / count(*) OVER ())
         / (CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ()) AS weight
FROM (
  SELECT source, count(*) AS n_docs,
         CAST(sum(CAST(len({tokens_sql('text')}) AS BIGINT)) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
) agg
"""


# ---------------------------------------------------------------------------
# Deterministic training order
# ---------------------------------------------------------------------------

N_ORDER_SHARDS = 8
ORDER_SALT = "order1"


def training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle of the corpus for training.

    Trainers need the corpus in a reproducible pseudo-random order that
    no ingestion accident (source grouping, time locality) can bias.
    Each doc gets ``shard = md5(salt:doc_id) mod N`` and a dense position
    within its shard ordered by a second hash — the reader streams shard
    files round-robin.  Scale shape: one hash-partition shuffle into N
    shards and a per-shard sort; no global ORDER BY ever happens (same
    sub-shard discipline as pack_sequences), and the order is a pure
    function of (salt, doc_id) — rerun-stable, partitioning-invariant.
    """
    docs = table(spark, sf_dir, "documents")
    u = md5_long(
        F.concat_ws(":", F.lit(ORDER_SALT), F.col("doc_id").cast("string"))
    )
    based = docs.select(
        "doc_id",
        "source",
        F.pmod(u, F.lit(N_ORDER_SHARDS)).cast("int").alias("shard"),
        u.alias("u"),
    )
    w = Window.partitionBy("shard").orderBy("u", "doc_id")
    return based.select(
        "doc_id",
        "source",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


_ORDER_U_SQL = md5_long_sql(
    f"concat('{ORDER_SALT}', ':', CAST(doc_id AS VARCHAR))"
)

TRAINING_ORDER_SQL = f"""
SELECT doc_id, source,
       CAST((({_ORDER_U_SQL}) % {N_ORDER_SHARDS} + {N_ORDER_SHARDS})
            % {N_ORDER_SHARDS} AS INTEGER) AS shard,
       CAST(row_number() OVER (
         PARTITION BY (({_ORDER_U_SQL}) % {N_ORDER_SHARDS} + {N_ORDER_SHARDS})
                      % {N_ORDER_SHARDS}
         ORDER BY {_ORDER_U_SQL}, doc_id
       ) AS BIGINT) AS pos
FROM documents
"""


# ---------------------------------------------------------------------------
# Hashed n-gram importance weighting (DSIR-style data selection)
# ---------------------------------------------------------------------------

# feature-hash bucket count: the fixed model size that makes the method
# corpus-size-independent (DSIR uses 10k hashed buckets; 4096 here keeps
# the broadcast tiny at identical mechanics)
NB_IMPORTANCE = 4096
TARGET_LANG = "en"


def importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document importance weight for TARGETED data selection —
    the log-likelihood ratio of the document under a target-domain
    hashed-unigram model vs the raw-corpus model (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling":
    sample raw data proportionally to ``p_target(x)/p_raw(x)`` over
    hashed n-gram features).  Target here = the ``lang='en'`` slice;
    any predicate substitutes.

    Scale shape (the reason DSIR works at corpus scale): features are
    HASHED into ``NB_IMPORTANCE`` buckets, so both models are fixed-size
    regardless of vocabulary — one token-explode scan builds per-doc
    bucket counts (map-side partial agg), ONE second aggregation yields
    raw and target bucket counts together (no second corpus pass), the
    ±1-smoothed log-ratio table is a <=4096-row broadcast, and the
    per-doc score is an exact integer dot product.  Log-ratios are
    quantized to integer micro-nats BEFORE summation (the
    ``unigram_logprob`` playbook) so scores hash identically across
    engines.  Documents with zero tokens have no distribution and are
    absent (same contract as ``unigram_logprob``).

    Returns ``doc_id, lang, n_tokens, avg_llr`` — positive ``avg_llr``
    means "looks more like the target than the raw mix"; resampling
    keeps documents with probability proportional to ``exp(llr)``.
    """
    docs = table(spark, sf_dir, "documents", spread=True)
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("w")
    )
    doc_b = (
        tok.select(
            "doc_id",
            "lang",
            F.pmod(md5_long(F.col("w")), F.lit(NB_IMPORTANCE)).alias("b"),
        )
        .groupBy("doc_id", "lang", "b")
        .agg(F.count("*").alias("c"))
    )
    buckets = doc_b.groupBy("b").agg(
        F.sum("c").alias("cnt_r"),
        F.sum(
            F.when(F.col("lang") == TARGET_LANG, F.col("c")).otherwise(
                F.lit(0)
            )
        ).alias("cnt_t"),
    )
    totals = buckets.agg(
        F.sum("cnt_r").alias("tot_r"), F.sum("cnt_t").alias("tot_t")
    )
    nb = F.lit(float(NB_IMPORTANCE))
    llr = buckets.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.round(
                F.log(
                    (F.col("cnt_t") + F.lit(1)).cast("double")
                    / (F.col("tot_t").cast("double") + nb)
                )
                * F.lit(1e8),
                0,
            ).cast("long")
            - F.round(
                F.log(
                    (F.col("cnt_r") + F.lit(1)).cast("double")
                    / (F.col("tot_r").cast("double") + nb)
                )
                * F.lit(1e8),
                0,
            ).cast("long")
        ).alias("llr_u"),
    )
    per_doc = (
        doc_b.join(F.broadcast(llr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("llr_u")).alias("sum_llr_u"),
        )
    )
    return per_doc.select(
        "doc_id",
        "lang",
        "n_tokens",
        (
            F.col("sum_llr_u").cast("double")
            / F.lit(1e8)
            / F.col("n_tokens")
        ).alias("avg_llr"),
    )


_BUCKET_SQL = (
    f"(({md5_long_sql('w')}) % {NB_IMPORTANCE} + {NB_IMPORTANCE})"
    f" % {NB_IMPORTANCE}"
)

IMPORTANCE_WEIGHTS_SQL = f"""
WITH doc_b AS (
  SELECT doc_id, lang, {_BUCKET_SQL} AS b, count(*) AS c FROM (
    SELECT doc_id, lang, unnest({tokens_sql('text')}) AS w FROM documents
  ) t GROUP BY doc_id, lang, ({_BUCKET_SQL})
),
buckets AS (
  SELECT b, CAST(sum(c) AS BIGINT) AS cnt_r,
         CAST(sum(CASE WHEN lang = '{TARGET_LANG}' THEN c ELSE 0 END)
              AS BIGINT) AS cnt_t
  FROM doc_b GROUP BY b
),
tot AS (
  SELECT CAST(sum(cnt_r) AS BIGINT) AS tot_r,
         CAST(sum(cnt_t) AS BIGINT) AS tot_t
  FROM buckets
),
llr AS (
  SELECT b,
         CAST(round(ln(CAST(cnt_t + 1 AS DOUBLE)
                       / (CAST(tot_t AS DOUBLE) + {NB_IMPORTANCE}.0))
                    * 1e8, 0) AS BIGINT)
         - CAST(round(ln(CAST(cnt_r + 1 AS DOUBLE)
                         / (CAST(tot_r AS DOUBLE) + {NB_IMPORTANCE}.0))
                      * 1e8, 0) AS BIGINT) AS llr_u
  FROM buckets, tot
)
SELECT doc_id, lang,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(c * llr_u) AS DOUBLE) / 1e8 / CAST(sum(c) AS BIGINT)
         AS avg_llr
FROM doc_b JOIN llr USING (b)
GROUP BY doc_id, lang
"""


QUERIES: dict = {}
ORACLES: dict = {}

AUX_QUERIES = {
    "redact_pii": redact_pii,
    "pack_sequences": pack_sequences,
    "chunk_documents": chunk_documents,
    "pipeline_curate": pipeline_curate,
    "decontaminate": decontaminate,
    "mix_weights": mix_weights,
    "training_order": training_order,
    "importance_weights": importance_weights,
}

AUX_ORACLES = {
    "redact_pii": REDACT_PII_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    "pipeline_curate": _pipeline_curate_sql(),
    "decontaminate": _decontaminate_sql(),
    "mix_weights": MIX_WEIGHTS_SQL,
    "training_order": TRAINING_ORDER_SQL,
    "importance_weights": IMPORTANCE_WEIGHTS_SQL,
}
