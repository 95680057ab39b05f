"""Corpus-quality scoring beyond row-local signals: n-gram repetition
statistics (Gopher-style), unigram-LM log-probability scoring, and
Kneser-Ney-smoothed bigram-LM scoring (the CCNet-grade perplexity
gate).

These are the two classic pre-training quality gates the row-local
``text_quality`` signals can't express: repetition needs within-document
n-gram frequency (Rae et al. 2021, "Scaling Language Models" §A.1.1's
repetition filters), and LM scoring needs a corpus-level token
distribution (the CCNet / fastText-era "perplexity under a reference LM"
gate, here with the corpus itself as the unigram reference).  The
reference engine has no analysis operators at all (SURVEY.md §2.B — its
only verbs are map/emit/reduce, /root/reference/external/include/
mr_task_factory.h:20-38), but both shapes are classic MapReduce: per-doc
gram counting is a doc-keyed reduce, the LM is a token-keyed reduce
joined back to the corpus.

Cross-engine determinism:

- Repetition fractions are exact ``BIGINT / BIGINT`` divisions done once
  per row in double — bit-identical across engines.
- Log-probabilities are quantized to integer micro-nats
  (``round(ln(cnt / total) * 1e8)`` as BIGINT) *before* any aggregation,
  so per-doc sums are exact integer arithmetic — order-independent,
  hash-stable — and only the final per-row division returns to double.
  (Same playbook as tfidf's ``round(ln(x), 8)``, operators/text.py:362,
  hardened one step further because these values are summed.)

Scale (100 TB corpus):

- Every aggregation is keyed by ``doc_id`` or by token — partial
  aggregation collapses within-partition duplicates map-side before
  either shuffle; no window functions, no driver state.
- N-grams are built row-locally with array ``transform`` in the scan
  stage (no posexplode+window shuffle-and-sort pass; for *per-doc* stats
  the exploded rows of a doc are already co-located, so partial agg does
  the heavy lifting).
- The unigram vocabulary relation is Zipf-compact after its group-by; the
  doc-term ⋈ vocab join is keyed by token on two already-token-partitioned
  sides (exchange reuse), and the corpus-total scalar is a broadcast.
- Overflow headroom: micro-nat magnitudes are < 4e9; a per-doc sum
  ``c * lp_u`` stays inside int64 for documents up to ~1e8 tokens — far
  beyond any real document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.textfns import tokens, tokens_sql

# Gopher-style keep thresholds (token-position-based adaptation)
MAX_TOP2GRAM_FRAC = 0.20
MAX_DUP5GRAM_FRAC = 0.30


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram repetition signals + a keep flag.

    - ``top2gram_frac``: the fraction of bigram positions occupied by the
      document's single most frequent bigram (modal-bigram share).
    - ``dup5gram_frac``: the fraction of 5-gram positions whose 5-gram
      occurs more than once within the document.

    Both are the token-position form of Gopher's repetition filters
    (character-coverage in the paper; position-share here keeps the
    statistic an exact integer ratio).  ``keep`` applies the standard
    thresholds.  Documents too short to have a bigram (or 5-gram) score
    0.0 on that signal — too-short is not repetitive.
    """
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", tokens("text").alias("tk")
    ).withColumn("n_tokens", F.size("tk").cast("long"))

    # row-local gram construction: slice to the last valid start index,
    # index the token array 0-based inside transform
    g2 = F.expr(
        "transform(slice(tk, 1, greatest(size(tk) - 1, 0)), "
        "(x, i) -> concat(x, ' ', tk[i + 1]))"
    )
    g5 = F.expr(
        "transform(slice(tk, 1, greatest(size(tk) - 4, 0)), "
        "(x, i) -> concat_ws(' ', x, tk[i+1], tk[i+2], tk[i+3], tk[i+4]))"
    )

    top2 = (
        base.select("doc_id", F.explode(g2).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top2_cnt"))
    )
    dup5 = (
        base.select("doc_id", F.explode(g5).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
            .alias("dup5_cnt")
        )
    )

    joined = (
        base.select("doc_id", "n_tokens")
        .join(top2, "doc_id", "left")
        .join(dup5, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("top2_cnt", F.lit(0)).cast("long").alias("top2_cnt"),
            F.coalesce("dup5_cnt", F.lit(0)).cast("long").alias("dup5_cnt"),
        )
    )
    top2_frac = F.when(
        F.col("n_tokens") >= 2,
        F.col("top2_cnt").cast("double") / (F.col("n_tokens") - 1),
    ).otherwise(F.lit(0.0))
    dup5_frac = F.when(
        F.col("n_tokens") >= 5,
        F.col("dup5_cnt").cast("double") / (F.col("n_tokens") - 4),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "doc_id",
        "n_tokens",
        "top2_cnt",
        "dup5_cnt",
        top2_frac.alias("top2gram_frac"),
        dup5_frac.alias("dup5gram_frac"),
        (
            (top2_frac <= F.lit(MAX_TOP2GRAM_FRAC))
            & (dup5_frac <= F.lit(MAX_DUP5GRAM_FRAC))
        ).alias("keep"),
    )


REPETITION_STATS_SQL = f"""
WITH base AS (
  SELECT doc_id, {tokens_sql('text')} AS w FROM documents
),
nt AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM base
),
c2 AS (
  SELECT doc_id, max(cnt) AS top2_cnt FROM (
    SELECT doc_id, gram, count(*) AS cnt FROM (
      SELECT doc_id,
             unnest(list_transform(w[1:greatest(len(w) - 1, 0)],
                    (x, i) -> concat(x, ' ', w[i + 1]))) AS gram
      FROM base
    ) g GROUP BY doc_id, gram
  ) c GROUP BY doc_id
),
c5 AS (
  SELECT doc_id,
         sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup5_cnt
  FROM (
    SELECT doc_id, gram, count(*) AS cnt FROM (
      SELECT doc_id,
             unnest(list_transform(w[1:greatest(len(w) - 4, 0)],
                    (x, i) -> concat_ws(' ', x, w[i+1], w[i+2], w[i+3],
                                        w[i+4]))) AS gram
      FROM base
    ) g GROUP BY doc_id, gram
  ) c GROUP BY doc_id
),
j AS (
  SELECT nt.doc_id, nt.n_tokens,
         CAST(coalesce(c2.top2_cnt, 0) AS BIGINT) AS top2_cnt,
         CAST(coalesce(c5.dup5_cnt, 0) AS BIGINT) AS dup5_cnt
  FROM nt LEFT JOIN c2 USING (doc_id) LEFT JOIN c5 USING (doc_id)
)
SELECT doc_id, n_tokens, top2_cnt, dup5_cnt,
       CASE WHEN n_tokens >= 2
            THEN CAST(top2_cnt AS DOUBLE) / (n_tokens - 1) ELSE 0.0 END
         AS top2gram_frac,
       CASE WHEN n_tokens >= 5
            THEN CAST(dup5_cnt AS DOUBLE) / (n_tokens - 4) ELSE 0.0 END
         AS dup5gram_frac,
       (CASE WHEN n_tokens >= 2
             THEN CAST(top2_cnt AS DOUBLE) / (n_tokens - 1) ELSE 0.0 END)
         <= {MAX_TOP2GRAM_FRAC}
       AND
       (CASE WHEN n_tokens >= 5
             THEN CAST(dup5_cnt AS DOUBLE) / (n_tokens - 4) ELSE 0.0 END)
         <= {MAX_DUP5GRAM_FRAC}
         AS keep
FROM j
"""


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean (and min) log-probability under the corpus's own
    unigram LM — the cheap stand-in for reference-LM perplexity gating.

    Pipeline: doc-term counts (token-keyed partial agg) -> corpus vocab
    counts (second agg over the same key, exchange-reused) -> quantize
    ``ln(cnt / total)`` to integer micro-nats -> join back by token ->
    exact integer per-doc sums -> one double division per row.
    """
    docs = table(spark, sf_dir, "documents")
    doc_w = (
        docs.select("doc_id", F.explode(tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        # shared by the vocab branch and the per-doc probe: persist so
        # the tokenize+explode+agg pass runs once per action, not once
        # per consumer (see bigram_logprob_kn — same r16 finding)
        .persist()
    )
    vocab = doc_w.groupBy("w").agg(F.sum("c").alias("cnt")).persist()
    total = vocab.agg(F.sum("cnt").alias("total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "w",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("total")) * F.lit(1e8), 0
        )
        .cast("long")
        .alias("lp_u"),
    )
    per_doc = (
        doc_w.join(lp, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lp_u")).alias("sum_lp_u"),
            F.min("lp_u").alias("min_lp_u"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (
            F.col("sum_lp_u").cast("double")
            / F.lit(1e8)
            / F.col("n_tokens")
        ).alias("avg_logprob"),
        (F.col("min_lp_u").cast("double") / F.lit(1e8)).alias("min_logprob"),
    )


UNIGRAM_LOGPROB_SQL = f"""
WITH doc_w AS (
  SELECT doc_id, w, count(*) AS c FROM (
    SELECT doc_id, unnest({tokens_sql('text')}) AS w FROM documents
  ) t GROUP BY doc_id, w
),
vocab AS (
  SELECT w, CAST(sum(c) AS BIGINT) AS cnt FROM doc_w GROUP BY w
),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab
),
lp AS (
  SELECT w,
         CAST(round(ln(CAST(cnt AS DOUBLE) / total) * 1e8, 0) AS BIGINT)
           AS lp_u
  FROM vocab, tot
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(c * lp_u) AS DOUBLE) / 1e8 / CAST(sum(c) AS BIGINT)
         AS avg_logprob,
       CAST(min(lp_u) AS DOUBLE) / 1e8 AS min_logprob
FROM doc_w JOIN lp USING (w)
GROUP BY doc_id
"""


#: Kneser-Ney absolute discount.  Fixed (the textbook 0.75) rather than
#: estimated from n1/(n1+2*n2) so the model is a pure function of the
#: corpus counts — deterministic across engines and rounds.
KN_DISCOUNT = 0.75


def bigram_logprob_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document log-probability under an interpolated KNESER-NEY
    bigram LM trained on the corpus itself — the CCNet-grade
    perplexity gate (`unigram_logprob` is the cheap stand-in; real
    pipelines filter on an n-gram LM with smoothing, Wenzek et al.
    2020).

    Model (interpolated KN, Chen & Goodman 1999 eq. 4.25, fixed
    discount D=0.75):

        P(v|u) = (c(u,v) - D)/c(u)  +  (D * N1+(u,*)/c(u)) * Pcont(v)
        Pcont(v) = N1+(*,v) / N1+(*,*)

    Every count relation is exact-integer and keyed (bigram-type /
    context / continuation group-bys over the Zipf-compact bigram-type
    relation — partial agg before each shuffle, no windows, no driver
    state); the LM is trained on the same corpus it scores, so every
    document bigram has c(u,v) >= 1 > D and no OOV/backoff branch is
    ever taken.  Each bigram type's log-probability is quantized to
    integer micro-nats BEFORE the per-doc sum (the module's
    determinism playbook: integer sums are order-independent; the
    double math producing each lp is the identical IEEE expression
    tree in both engines).  Documents need >= 2 tokens to score.

    Returns ``doc_id, n_bigrams, sum_lp_micro (exact BIGINT
    micro-nats), avg_logprob_kn, min_logprob_kn``.  Perplexity is the
    monotone display transform ``exp(-avg_logprob_kn)`` and is
    deliberately NOT on the hashed surface: ``exp`` is not correctly
    rounded, and Spark's JVM and DuckDB's libm were measured 1 ulp
    apart on this very query — the log-domain stats carry the full
    information exactly."""
    docs = table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", tokens("text").alias("tk"))
    grams = F.expr(
        "transform(slice(tk, 1, greatest(size(tk) - 1, 0)), "
        "(x, i) -> named_struct('u', x, 'v', tk[i + 1]))"
    )
    doc_b = (
        tk.select("doc_id", F.explode(grams).alias("b"))
        .select("doc_id", F.col("b.u").alias("u"), F.col("b.v").alias("v"))
        .groupBy("doc_id", "u", "v")
        .agg(F.count("*").alias("c"))
        # the doc-bigram relation feeds BOTH the model branches and the
        # final per-doc probe; without a persist the plan recomputes
        # the tokenize+explode+agg pipeline for every consumer (r16:
        # the r15 plan had ZERO ReusedExchange nodes — five full
        # recomputes of the corpus pass inside one action, guide §5).
        # Within-query persist only: the bench clears cache per pass,
        # so nothing survives across runs.
        .persist()
    )
    big = (
        doc_b.groupBy("u", "v")
        .agg(F.sum("c").alias("c_uv"))
        # the bigram-type relation (Zipf-compact) feeds four branches
        # (lp, ctx, cont, nb) — same recompute problem one level up
        .persist()
    )
    ctx = big.groupBy("u").agg(
        F.sum("c_uv").alias("c_u"), F.count("*").alias("n1p_u")
    )
    cont = big.groupBy("v").agg(F.count("*").alias("nc_v"))
    nb = big.agg(F.count("*").alias("nb"))
    d = F.lit(KN_DISCOUNT)
    p = (
        (F.col("c_uv").cast("double") - d) / F.col("c_u").cast("double")
        + ((d * F.col("n1p_u").cast("double")) / F.col("c_u").cast("double"))
        * (F.col("nc_v").cast("double") / F.col("nb").cast("double"))
    )
    lp = (
        big.join(ctx, "u")
        .join(cont, "v")
        .crossJoin(F.broadcast(nb))
        .select(
            "u", "v",
            F.round(F.log(p) * F.lit(1e8), 0).cast("long").alias("lp_b"),
        )
    )
    per_doc = (
        doc_b.join(lp, ["u", "v"])
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("lp_b")).alias("sum_lp"),
            F.min("lp_b").alias("min_lp"),
        )
    )
    avg = (
        F.col("sum_lp").cast("double") / F.lit(1e8) / F.col("n_bigrams")
    )
    return per_doc.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("sum_lp").cast("long").alias("sum_lp_micro"),
        avg.alias("avg_logprob_kn"),
        (F.col("min_lp").cast("double") / F.lit(1e8)).alias(
            "min_logprob_kn"
        ),
    )


BIGRAM_LOGPROB_KN_SQL = f"""
WITH base AS (
  SELECT doc_id, {tokens_sql('text')} AS w FROM documents
),
db AS (
  SELECT doc_id, gram, count(*) AS c FROM (
    SELECT doc_id,
           unnest(list_transform(w[1:greatest(len(w) - 1, 0)],
                  (x, i) -> concat(x, ' ', w[i + 1]))) AS gram
    FROM base
  ) t GROUP BY doc_id, gram
),
db2 AS (
  SELECT doc_id, split_part(gram, ' ', 1) AS u,
         split_part(gram, ' ', 2) AS v, c
  FROM db
),
big AS (
  SELECT u, v, CAST(sum(c) AS BIGINT) AS c_uv FROM db2 GROUP BY u, v
),
ctx AS (
  SELECT u, CAST(sum(c_uv) AS BIGINT) AS c_u,
         CAST(count(*) AS BIGINT) AS n1p_u
  FROM big GROUP BY u
),
cont AS (
  SELECT v, CAST(count(*) AS BIGINT) AS nc_v FROM big GROUP BY v
),
nbt AS (
  SELECT CAST(count(*) AS BIGINT) AS nb FROM big
),
lp AS (
  SELECT u, v,
         CAST(round(ln(
           (CAST(c_uv AS DOUBLE) - {KN_DISCOUNT}) / CAST(c_u AS DOUBLE)
           + (({KN_DISCOUNT} * CAST(n1p_u AS DOUBLE))
              / CAST(c_u AS DOUBLE))
             * (CAST(nc_v AS DOUBLE) / CAST(nb AS DOUBLE))
         ) * 1e8, 0) AS BIGINT) AS lp_b
  FROM big JOIN ctx USING (u) JOIN cont USING (v) CROSS JOIN nbt
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(sum(c * lp_b) AS BIGINT) AS sum_lp_micro,
       CAST(sum(c * lp_b) AS DOUBLE) / 1e8 / CAST(sum(c) AS BIGINT)
         AS avg_logprob_kn,
       CAST(min(lp_b) AS DOUBLE) / 1e8 AS min_logprob_kn
FROM db2 JOIN lp USING (u, v)
GROUP BY doc_id
"""


# exact duplicated-span coverage (cross-document): span length in
# tokens, and the coverage threshold above which a document is mostly
# boilerplate shared with other documents
SPAN_K = 8
MAX_SPAN_DUP_FRAC = 0.5


def span_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document EXACT duplicated-span coverage across the corpus —
    the fraction of a document's ``SPAN_K``-token windows that also
    occur verbatim in at least one OTHER document.

    This is the signal behind exact-substring deduplication (Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models
    Better" — their suffix-array pass removes 50-token spans shared
    across documents): near-dup methods (MinHash/SimHash) score whole
    documents, while this catches templated boilerplate — headers,
    navigation, license blocks — pasted into otherwise-distinct pages.
    The suffix array is replaced by the shuffle the engine already
    does well: every k-token window becomes a gram row, grams are
    counted by DISTINCT document (token-keyed partial agg over a
    Zipf-compact domain), and windows of grams seen in >= 2 documents
    are summed back per doc through a gram-keyed join (exchange reuse
    with the gram agg).  No suffix array, no cross-doc pairs — cost is
    O(total windows), shuffle keys are grams.

    Returns ``doc_id, n_spans, dup_spans, span_dup_frac, keep`` —
    documents shorter than ``SPAN_K`` tokens have 0 spans, score 0.0,
    and keep (too-short is not boilerplate)."""
    docs = table(spark, sf_dir, "documents", spread=True)
    base = docs.select("doc_id", tokens("text").alias("tk"))
    grams = F.expr(
        f"transform(slice(tk, 1, greatest(size(tk) - {SPAN_K - 1}, 0)), "
        f"(x, i) -> concat_ws(' ', "
        + ", ".join(["x"] + [f"tk[i+{j}]" for j in range(1, SPAN_K)])
        + "))"
    )
    win = base.select("doc_id", F.explode(grams).alias("gram"))
    # grams occurring in >= 2 distinct documents; distinct doc count is
    # a two-level agg (gram,doc) -> gram, both map-side partial
    shared = (
        win.groupBy("gram", "doc_id")
        .agg(F.count("*").alias("c"))
        .groupBy("gram")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    dup = (
        win.join(shared, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("dup_spans"))
    )
    n_spans = (
        base.select(
            "doc_id",
            F.greatest(F.size("tk") - F.lit(SPAN_K - 1), F.lit(0))
            .cast("long")
            .alias("n_spans"),
        )
    )
    frac = F.when(
        F.col("n_spans") > 0,
        F.col("dup_spans").cast("double") / F.col("n_spans"),
    ).otherwise(F.lit(0.0))
    return (
        n_spans.join(dup, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "dup_spans",
            frac.alias("span_dup_frac"),
            (frac <= F.lit(MAX_SPAN_DUP_FRAC)).alias("keep"),
        )
    )


SPAN_DUP_STATS_SQL = f"""
WITH base AS (
  SELECT doc_id, {tokens_sql('text')} AS w FROM documents
),
win AS (
  SELECT doc_id,
         unnest(list_transform(w[1:greatest(len(w) - {SPAN_K - 1}, 0)],
                (x, i) -> concat_ws(' ', x, {", ".join(f"w[i+{j}]" for j in range(1, SPAN_K))})))
           AS gram
  FROM base
),
shared AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS nd FROM win GROUP BY gram
  ) s WHERE nd >= 2
),
dup AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_spans
  FROM win JOIN shared USING (gram) GROUP BY doc_id
),
ns AS (
  SELECT doc_id,
         CAST(greatest(len(w) - {SPAN_K - 1}, 0) AS BIGINT) AS n_spans
  FROM base
)
SELECT ns.doc_id, ns.n_spans,
       CAST(coalesce(dup.dup_spans, 0) AS BIGINT) AS dup_spans,
       CASE WHEN ns.n_spans > 0
            THEN CAST(coalesce(dup.dup_spans, 0) AS DOUBLE) / ns.n_spans
            ELSE 0.0 END AS span_dup_frac,
       (CASE WHEN ns.n_spans > 0
             THEN CAST(coalesce(dup.dup_spans, 0) AS DOUBLE) / ns.n_spans
             ELSE 0.0 END) <= {MAX_SPAN_DUP_FRAC} AS keep
FROM ns LEFT JOIN dup USING (doc_id)
"""


# compressibility gate thresholds: ratio below MIN = pathologically
# repetitive (machine-generated boilerplate compresses away); above
# MAX = near-incompressible (binary junk / encoded blobs posing as
# text).  Only the MAX gate is waived for docs under MIN_GATE_BYTES:
# zlib's ~11-byte fixed header pushes every short legitimate snippet's
# ratio past any sane ceiling (an 11-byte "Hello world" compresses to
# ~19 bytes), but the MIN gate applies at every length — a short
# pathologically repetitive doc still drops.  Empty docs keep
# (emptiness is gated elsewhere).
MIN_COMPRESS_RATIO = 0.20
MAX_COMPRESS_RATIO = 0.95
MIN_GATE_BYTES = 64


def compression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compressibility — the classic cheap junk
    detector (used alongside the Gopher-style gates in C4/RefinedWeb-
    lineage pipelines): highly repetitive spam compresses far below
    normal prose, while binary-ish noise barely compresses at all.

    The signal is inherently procedural (DEFLATE), so this is the
    measured Python path done right: ``mapInPandas`` over Arrow record
    batches — column-pruned input (doc_id + text only), one Python
    worker round-trip, ``zlib.compress`` on UTF-8 bytes per row inside
    the batch loop, no per-row UDF dispatch.  Scan-shaped: no shuffle,
    scales linearly with corpus bytes.  Verified by planted-document
    ordering and bound invariants (zlib output length has no SQL
    oracle).

    Returns ``doc_id, n_bytes, z_bytes, compress_ratio, keep`` (empty
    documents: ratio 0.0, keep — emptiness is gated elsewhere)."""
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_bytes", LongType()),
            StructField("z_bytes", LongType()),
            StructField("compress_ratio", DoubleType()),
            StructField("keep", BooleanType()),
        ]
    )

    def compute(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf["text"].fillna("").map(lambda t: t.encode("utf-8"))
            n = raw.map(len).astype("int64")
            z = raw.map(lambda b: len(zlib.compress(b, 6))).astype("int64")
            ratio = (z / n.where(n > 0, 1)).where(n > 0, 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n,
                    "z_bytes": z,
                    "compress_ratio": ratio,
                    "keep": (n == 0)
                    | (
                        (ratio >= MIN_COMPRESS_RATIO)
                        & ((n < MIN_GATE_BYTES) | (ratio <= MAX_COMPRESS_RATIO))
                    ),
                }
            )

    return docs.mapInPandas(compute, out_schema)


def nb_quality(docs: DataFrame, label_col: str = "pos") -> DataFrame:
    """Trainable quality classifier: multinomial Naive Bayes over the
    bag of tokens, trained on a boolean reference label and scoring
    every document by its class log-odds — the deterministic analogue
    of the linear quality classifiers real pipelines train (GPT-3's
    logistic regression over WebText-vs-crawl, Brown et al. 2020
    App. A; CCNet's fastText gate, Wenzek et al. 2019).  NB's
    decision function IS a linear bag-of-words scorer; using closed-
    form counts instead of SGD makes the model a pure function of the
    corpus, so it is exactly reproducible in SQL.

    ``docs`` carries ``doc_id``, ``text``, and boolean ``label_col``
    (True = reference/"curated" class).  Returns one row per document:
    ``n_tokens``, ``sum_llr_u`` (exact integer micro-nat sum of
    per-token Laplace-smoothed log-likelihood ratios), ``avg_llr``,
    and ``pred_quality`` (prior log-odds + evidence > 0).

    Numeric contract (the ``unigram_logprob`` scheme): each class
    log-probability is quantized to integer micro-nats BEFORE the
    subtraction and the per-doc sums, so aggregation order can never
    move a hash; the only doubles on the output are display columns.

    100 TB shape: two hash-partial aggregations over the Zipf-compact
    token-type relation (doc-term counts, then class counts), one
    broadcast totals row, one broadcast prior row, and a join back to
    doc terms — no all-pairs stage, no driver materialization; the
    model itself is O(vocab) and never leaves the cluster.  The plan
    is whole-stage-codegen end to end (zero Python); the declarative
    form re-derives the doc-term relation per consumer (Catalyst's
    exchange reuse collapses what it can), so a production run over a
    full corpus should stage doc-term counts once (the
    ``sources/staging.py`` pattern the dedup family uses) and train
    from the staged relation — tokenization then costs one pass."""
    pos = F.col(label_col)
    doc_w = (
        docs.select(
            "doc_id", pos.alias("pos"), F.explode(tokens("text")).alias("w")
        )
        .groupBy("doc_id", "pos", "w")
        .agg(F.count("*").alias("c"))
    )
    cls = doc_w.groupBy("w").agg(
        F.sum(F.when(F.col("pos"), F.col("c")).otherwise(0)).alias("c_pos"),
        F.sum(F.when(~F.col("pos"), F.col("c")).otherwise(0)).alias("c_neg"),
    )
    tot = cls.agg(
        F.sum("c_pos").alias("t_pos"),
        F.sum("c_neg").alias("t_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    # add-one smoothing on the PRIOR too: a one-class corpus (every
    # doc labelled reference, or none) must score, not divide by zero
    prior = docs.agg(
        F.round(
            F.log(
                (F.sum(pos.cast("long")) + 1).cast("double")
                / (F.sum((~pos).cast("long")) + 1)
            )
            * F.lit(1e8),
            0,
        )
        .cast("long")
        .alias("prior_u")
    )

    def _q(num, den):
        return (
            F.round(F.log(num.cast("double") / den) * F.lit(1e8), 0)
            .cast("long")
        )

    llr = cls.crossJoin(F.broadcast(tot)).select(
        "w",
        (
            _q(F.col("c_pos") + 1, F.col("t_pos") + F.col("v"))
            - _q(F.col("c_neg") + 1, F.col("t_neg") + F.col("v"))
        ).alias("llr_u"),
    )
    per_doc = (
        doc_w.join(llr, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("llr_u")).alias("sum_llr_u"),
        )
    )
    return per_doc.crossJoin(F.broadcast(prior)).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("sum_llr_u").cast("long").alias("sum_llr_u"),
        (
            F.col("sum_llr_u").cast("double")
            / F.lit(1e8)
            / F.col("n_tokens")
        ).alias("avg_llr"),
        (F.col("prior_u") + F.col("sum_llr_u") > 0).alias("pred_quality"),
    )


def nb_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nb_quality`` over the ``documents`` fixture with the
    deterministic stand-in label ``lang = 'en'`` (a curated reference
    corpus in a real pipeline)."""
    docs = table(spark, sf_dir, "documents")
    return nb_quality(
        docs.select(
            "doc_id", "text", (F.col("lang") == "en").alias("pos")
        )
    )


NB_QUALITY_SCORES_SQL = f"""
WITH lab AS (
  SELECT doc_id, (lang = 'en') AS pos, text FROM documents
),
doc_w AS (
  SELECT doc_id, pos, w, count(*) AS c FROM (
    SELECT doc_id, pos, unnest({tokens_sql('text')}) AS w FROM lab
  ) t GROUP BY doc_id, pos, w
),
cls AS (
  SELECT w,
         CAST(sum(CASE WHEN pos THEN c ELSE 0 END) AS BIGINT) AS c_pos,
         CAST(sum(CASE WHEN pos THEN 0 ELSE c END) AS BIGINT) AS c_neg
  FROM doc_w GROUP BY w
),
tot AS (
  SELECT CAST(sum(c_pos) AS BIGINT) AS t_pos,
         CAST(sum(c_neg) AS BIGINT) AS t_neg,
         CAST(count(*) AS BIGINT) AS v
  FROM cls
),
prior AS (
  SELECT CAST(round(ln(
           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1 AS DOUBLE)
           / (sum(CASE WHEN pos THEN 0 ELSE 1 END) + 1)) * 1e8, 0)
         AS BIGINT) AS prior_u
  FROM lab
),
llr AS (
  SELECT w,
         CAST(round(ln(CAST(c_pos + 1 AS DOUBLE) / (t_pos + v)) * 1e8, 0)
              AS BIGINT)
         - CAST(round(ln(CAST(c_neg + 1 AS DOUBLE) / (t_neg + v)) * 1e8, 0)
                AS BIGINT) AS llr_u
  FROM cls, tot
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(c * llr_u) AS BIGINT) AS sum_llr_u,
       CAST(sum(c * llr_u) AS DOUBLE) / 1e8 / CAST(sum(c) AS BIGINT)
         AS avg_llr,
       (prior_u + sum(c * llr_u)) > 0 AS pred_quality
FROM doc_w JOIN llr USING (w), prior
GROUP BY doc_id, prior_u
"""


def gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher document-quality rule set (Rae et al.
    2021, "Scaling Language Models: ... Gopher", Table A1 — the gate
    MassiveWeb/MassiveText shipped with, reused by many later
    corpora), each rule as its own boolean column plus the combined
    keep decision:

    - word count in [50, 100_000]
    - mean word length in [3, 10]
    - symbol-to-word ratio ('#' chars + '...'/ellipsis runs) < 0.1
    - <= 90% of lines start with a bullet; <= 30% end with an ellipsis
    - >= 80% of words contain at least one alphabetic character
    - at least 2 distinct members of the 8-word English stop list

    Fully JVM-side (split + higher-order array functions, no UDF) and
    DIVISION-FREE: every ratio threshold is an exact integer
    cross-multiplication (``10*symbols < n_words`` etc.), so the
    booleans are bit-stable and the DuckDB oracle reproduces them with
    the same integer arithmetic — no float epsilon anywhere.  Tokens
    are whitespace splits with empties dropped (both engines), lines
    are newline splits kept as-is.  At 100 TB this is one
    scan-shaped projection: no shuffle and no Python serialization
    boundary.  The higher-order lambdas evaluate interpreted inside
    the JVM (not codegen — the dedup.py 20x note is about JOIN-side
    hot paths); here each lambda does O(words-per-doc) string work
    per row, the same order as the split itself, so the scan stays
    I/O-bound.

    The reference has no quality gating of any kind (its pipeline
    vocabulary is map/emit/reduce —
    /root/reference/external/include/mr_task_factory.h); this is
    north-star LLM-pipeline surface from the public recipe."""
    # NULL text reads as the empty document (deterministic FALSE
    # gates on both engines — NULL-propagating booleans differ
    # between Spark and SQL once AND short-circuits touch them)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    words = F.filter(
        F.split(F.col("text"), r"\s+"), lambda w: w != F.lit("")
    )
    lines = F.split(F.col("text"), "\n")
    d = docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("word_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "#", ""))
            + (
                F.length("text")
                - F.length(F.regexp_replace("text", r"\.\.\.", ""))
            )
            / F.lit(3)
        ).cast("long").alias("symbols"),
        F.size(lines).alias("n_lines"),
        F.size(
            F.filter(
                lines,
                lambda ln: F.ltrim(ln).rlike("^[-*•]"),
            )
        ).alias("bullet_lines"),
        F.size(
            F.filter(lines, lambda ln: ln.rlike(r"\.\.\.$"))
        ).alias("ellipsis_lines"),
        F.size(
            F.filter(words, lambda w: w.rlike("[A-Za-z]"))
        ).alias("alpha_words"),
        F.size(
            F.array_intersect(
                F.array_distinct(
                    F.transform(words, lambda w: F.lower(w))
                ),
                F.array(
                    *[
                        F.lit(w)
                        for w in (
                            "the", "be", "to", "of", "and",
                            "that", "have", "with",
                        )
                    ]
                ),
            )
        ).alias("stop_hits"),
    )
    nw = F.col("n_words")
    keep_cols = {
        "keep_word_count": (nw >= 50) & (nw <= 100_000),
        "keep_mean_word_len": (F.col("word_chars") >= 3 * nw)
        & (F.col("word_chars") <= 10 * nw),
        "keep_symbol_ratio": (10 * F.col("symbols")) < nw,
        "keep_bullets": (10 * F.col("bullet_lines"))
        <= (9 * F.col("n_lines")),
        "keep_ellipsis": (10 * F.col("ellipsis_lines"))
        <= (3 * F.col("n_lines")),
        "keep_alpha": (5 * F.col("alpha_words")) >= (4 * nw),
        "keep_stopwords": F.col("stop_hits") >= 2,
    }
    import functools

    out = d
    for c, expr in keep_cols.items():
        out = out.withColumn(c, expr)
    keep = functools.reduce(
        lambda a, b: a & b, (F.col(c) for c in keep_cols)
    )
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        *keep_cols.keys(),
        keep.alias("keep"),
    )


GOPHER_GATE_SQL = """
WITH src AS (
  SELECT doc_id, coalesce(text, '') AS text FROM documents
), t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     w -> w <> '') AS words,
         string_split(text, chr(10)) AS lines,
         CAST(length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3
              AS BIGINT) AS symbols
  FROM src
), m AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(words,
                                               w -> length(w))), 0)
              AS BIGINT) AS word_chars,
         symbols,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lines,
              l -> regexp_matches(ltrim(l), '^[-*•]')))
              AS BIGINT) AS bullet_lines,
         CAST(len(list_filter(lines,
              l -> regexp_matches(l, '\\.\\.\\.$')))
              AS BIGINT) AS ellipsis_lines,
         CAST(len(list_filter(words,
              w -> regexp_matches(w, '[A-Za-z]')))
              AS BIGINT) AS alpha_words,
         CAST(len(list_intersect(
              list_distinct(list_transform(words, w -> lower(w))),
              ['the', 'be', 'to', 'of', 'and', 'that', 'have',
               'with'])) AS BIGINT) AS stop_hits
  FROM t
)
SELECT doc_id, n_words,
       n_words >= 50 AND n_words <= 100000 AS keep_word_count,
       word_chars >= 3 * n_words AND word_chars <= 10 * n_words
         AS keep_mean_word_len,
       10 * symbols < n_words AS keep_symbol_ratio,
       10 * bullet_lines <= 9 * n_lines AS keep_bullets,
       10 * ellipsis_lines <= 3 * n_lines AS keep_ellipsis,
       5 * alpha_words >= 4 * n_words AS keep_alpha,
       stop_hits >= 2 AS keep_stopwords,
       (n_words >= 50 AND n_words <= 100000)
         AND (word_chars >= 3 * n_words AND word_chars <= 10 * n_words)
         AND (10 * symbols < n_words)
         AND (10 * bullet_lines <= 9 * n_lines)
         AND (10 * ellipsis_lines <= 3 * n_lines)
         AND (5 * alpha_words >= 4 * n_words)
         AND (stop_hits >= 2) AS keep
FROM m
"""


def c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published C4 cleaning rules (Raffel et al. 2020, the
    Colossal Clean Crawled Corpus recipe — the other canonical public
    web-cleaning gate next to Gopher's): line-level retention plus
    page-level discards, each surfaced as its own column so a pipeline
    can tune rather than re-derive:

    - a line is RETAINED iff it ends in terminal punctuation
      (``. ! ? "``) and has at least 5 words;
    - page discarded if it has fewer than 3 retained sentences
      (terminal-mark count over retained lines), mentions
      ``javascript`` on any line (case-insensitive), contains the
      phrase ``lorem ipsum``, or contains a curly bracket.

    Same engineering stance as ``gopher_gate``: JVM-side higher-order
    array functions only (no UDF, no Python boundary; interpreted
    per-element, O(words) per row like the split itself), integer
    counts only (no float ratios), scan-shaped with no shuffle, and a
    DuckDB oracle running the identical arithmetic.  Emits per-doc
    ``n_lines``,
    ``kept_lines``, ``kept_words``, ``n_sentences``, the three discard
    flags, and ``keep``.  NULL text reads as the empty document (same
    rationale as ``gopher_gate``)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    lines = F.split(F.col("text"), "\n")

    def _words(ln):
        return F.filter(
            F.split(F.trim(ln), r"\s+"), lambda w: w != F.lit("")
        )

    def _retained(ln):
        return ln.rlike('[.!?"]\\s*$') & (F.size(_words(ln)) >= 5)

    kept = F.filter(lines, _retained)
    kept_text = F.array_join(kept, "\n")
    d = docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("kept_lines"),
        F.aggregate(
            F.transform(kept, lambda ln: F.size(_words(ln))),
            F.lit(0),
            lambda a, x: a + x,
        ).cast("long").alias("kept_words"),
        (
            F.length(kept_text)
            - F.length(F.regexp_replace(kept_text, "[.!?]", ""))
        ).cast("long").alias("n_sentences"),
        F.lower("text").contains("javascript").alias("has_javascript"),
        F.lower("text").contains("lorem ipsum").alias("has_lorem"),
        (
            F.col("text").contains("{") | F.col("text").contains("}")
        ).alias("has_brace"),
    )
    return d.withColumn(
        "keep",
        (F.col("n_sentences") >= 3)
        & ~F.col("has_javascript")
        & ~F.col("has_lorem")
        & ~F.col("has_brace"),
    )


C4_FILTERS_SQL = """
WITH src AS (
  SELECT doc_id, coalesce(text, '') AS text FROM documents
), t AS (
  SELECT doc_id, text,
         list_filter(
           string_split(text, chr(10)),
           l -> regexp_matches(l, '[.!?"]\\s*$')
                AND len(list_filter(
                      regexp_split_to_array(trim(l), '\\s+'),
                      w -> w <> '')) >= 5
         ) AS kept,
         CAST(len(string_split(text, chr(10))) AS INTEGER) AS n_lines
  FROM src
), m AS (
  SELECT doc_id, n_lines,
         CAST(len(kept) AS INTEGER) AS kept_lines,
         CAST(coalesce(list_sum(list_transform(kept,
              l -> len(list_filter(
                     regexp_split_to_array(trim(l), '\\s+'),
                     w -> w <> '')))), 0) AS BIGINT) AS kept_words,
         CAST(coalesce(
              length(array_to_string(kept, chr(10)))
              - length(regexp_replace(array_to_string(kept, chr(10)),
                                      '[.!?]', '', 'g')), 0)
              AS BIGINT) AS n_sentences,
         contains(lower(text), 'javascript') AS has_javascript,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         (contains(text, '{') OR contains(text, '}')) AS has_brace
  FROM t
)
SELECT doc_id, n_lines, kept_lines, kept_words, n_sentences,
       has_javascript, has_lorem, has_brace,
       n_sentences >= 3 AND NOT has_javascript AND NOT has_lorem
         AND NOT has_brace AS keep
FROM m
"""


QUERIES: dict = {}
ORACLES: dict = {}

AUX_QUERIES = {
    "gopher_gate": gopher_gate,
    "c4_filters": c4_filters,
    "repetition_stats": repetition_stats,
    "unigram_logprob": unigram_logprob,
    "bigram_logprob_kn": bigram_logprob_kn,
    "span_dup_stats": span_dup_stats,
    "compression_stats": compression_stats,
    "nb_quality_scores": nb_quality_scores,
}

AUX_ORACLES = {
    "gopher_gate": GOPHER_GATE_SQL,
    "c4_filters": C4_FILTERS_SQL,
    "repetition_stats": REPETITION_STATS_SQL,
    "unigram_logprob": UNIGRAM_LOGPROB_SQL,
    "bigram_logprob_kn": BIGRAM_LOGPROB_KN_SQL,
    "span_dup_stats": SPAN_DUP_STATS_SQL,
    "nb_quality_scores": NB_QUALITY_SCORES_SQL,
}
