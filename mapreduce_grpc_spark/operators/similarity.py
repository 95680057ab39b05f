"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

Three operators covering the scale spectrum:

 - ``similarity_topk``  — brute-force cosine top-k: exact baseline.  The
   query set is broadcast, so the big side streams through one scan with
   no shuffle of embeddings; per-query top-k via a window over the
   (small) query-id partitioning.
 - ``ann_lsh_topk``     — random-hyperplane LSH: sign-bit bucket as the
   candidate filter.  At 100 TB the bucket join prunes candidates by
   ~2^planes; recall is the standard SRP-LSH tradeoff.
 - ``ivf_topk``         — IVF-Flat: coarse cells with element-wise-mean
   centroids, nprobe=2.  The centroid pass is two narrow aggregations;
   the search probes only the chosen cells.

All distance math uses the sequential-fold builders in
``functions.vectors`` (bit-identical to the DuckDB oracle) and all
rankings carry a deterministic (score DESC, vec_id ASC) tie-break, so even
the approximate variants are value-hash-checked end-to-end.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.vectors import cosine, cosine_sql, dot, dot_sql, norm_sq

N_QUERIES = 10     # vec_id < 10 are the query vectors
TOP_K = 5
N_PLANES = 8       # SRP-LSH hyperplanes -> 256 buckets
N_PROBE = 2        # IVF cells searched per query
DIM = 64


def _planes(n: int = N_PLANES, dim: int = DIM, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n)]


PLANES = _planes()


def _plane_col(p: list[float]) -> Column:
    return F.array(*[F.lit(v) for v in p])


def _plane_sql(p: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in p) + "]"


def _queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for each of the first 10 vectors."""
    emb = table(spark, sf_dir, "embeddings", spread=True)
    q = _queries(spark, sf_dir)
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .withColumn("cos_sim", cosine(F.col("q_emb"), F.col("embedding")))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


SIMILARITY_TOPK_SQL = f"""
SELECT q_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
         {cosine_sql('q.embedding', 'e.embedding')} AS cos_sim,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {cosine_sql('q.embedding', 'e.embedding')} DESC, e.vec_id ASC
         ) AS rank
  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
) t
WHERE rank <= {TOP_K}
"""


def _bucket_col(emb: Column) -> Column:
    b = F.lit(0)
    for i, p in enumerate(PLANES):
        b = b + F.when(dot(_plane_col(p), emb) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b


def _bucket_sql(emb: str) -> str:
    terms = [
        f"CASE WHEN {dot_sql(_plane_sql(p), emb)} > 0 THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(PLANES)
    ]
    return "(" + " + ".join(terms) + ")"


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via MULTI-PROBE sign-random-projection buckets.

    Candidates = vectors in any bucket within Hamming distance 1 of the
    query's bucket (the query side explodes to N_PLANES+1 probe keys —
    standard multi-probe LSH, Lv et al. 2007): a true neighbor differs
    from the query in at most a few low-margin sign bits, so probing the
    1-bit-flip buckets recovers most of the recall single-bucket SRP
    loses, while the equi-join still prunes ~(255-8)/256 of all pairs.
    Probing multiplies only the (tiny, broadcast) query side; each
    candidate still matches exactly one probe key (a vector has one
    bucket), so no pair dedup is needed.  Queries whose probed buckets
    hold < k neighbors return fewer rows: honest ANN recall, measured in
    tools/ann_recall.py, deterministic either way.
    """
    emb = table(spark, sf_dir, "embeddings")
    bucketed = emb.withColumn("bucket", _bucket_col(F.col("embedding")))
    q = (
        bucketed.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << i))
                        for i in range(N_PLANES)
                    ],
                )
            ).alias("q_bucket"),
        )
    )
    cand = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
    )
    scored = cand.withColumn(
        "cos_sim", cosine(F.col("q_emb"), F.col("embedding"))
    ).select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


_PROBE_LIST_SQL = "[bucket, " + ", ".join(
    f"xor(bucket, {1 << i})" for i in range(N_PLANES)
) + "]"

ANN_LSH_TOPK_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
  FROM embeddings
),
probes AS (
  SELECT vec_id AS q_id, embedding AS q_emb,
         unnest({_PROBE_LIST_SQL}) AS q_bucket
  FROM bucketed WHERE vec_id < {N_QUERIES}
)
SELECT q_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT q.q_id, e.vec_id AS neighbor_id,
         {cosine_sql('q.q_emb', 'e.embedding')} AS cos_sim,
         row_number() OVER (
           PARTITION BY q.q_id
           ORDER BY {cosine_sql('q.q_emb', 'e.embedding')} DESC, e.vec_id ASC
         ) AS rank
  FROM probes q JOIN bucketed e
    ON e.bucket = q.q_bucket AND e.vec_id <> q.q_id
) t
WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# IVF-Flat: label-keyed cells, element-wise-mean centroids, nprobe=2.
# ---------------------------------------------------------------------------

_DEC = "decimal(32,20)"
_DEC_SQL = "DECIMAL(32,20)"


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN: probe the 2 nearest cells, exact search inside them.

    The coarse quantizer uses the 10 label clusters as cells; centroids are
    element-wise means computed with DECIMAL sums (order-independent, so
    the oracle agrees bit-for-bit).  Query->centroid dots are join-
    aggregations over (pos) with DECIMAL product sums for the same reason.
    """
    emb = table(spark, sf_dir, "embeddings")
    # centroids, exploded to (label, pos, c)
    expl = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent = expl.groupBy("label", "pos").agg(
        (F.sum(F.col("v").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("c")
    )
    cent_norm = cent.groupBy("label").agg(
        F.sum((F.col("c") * F.col("c")).cast(_DEC)).cast("double").alias("c_norm_sq")
    )
    # query -> centroid cosine via pos-join with exact product sums
    q = _queries(spark, sf_dir)
    q_expl = q.select(
        "q_id", F.posexplode("q_emb").alias("pos", "qv")
    ).withColumn("qv", F.col("qv").cast("double"))
    q_norm = q.select(
        "q_id",
        F.aggregate(
            F.transform("q_emb", lambda x: (x.cast("double") * x.cast("double")).cast(_DEC)),
            F.lit(0).cast(_DEC),
            lambda acc, v: (acc + v).cast(_DEC),
        )
        .cast("double")
        .alias("q_norm_sq"),
    )
    qc = (
        q_expl.join(cent, "pos")
        .groupBy("q_id", "label")
        .agg(F.sum((F.col("qv") * F.col("c")).cast(_DEC)).cast("double").alias("dot_qc"))
        .join(cent_norm, "label")
        .join(q_norm, "q_id")
        .withColumn(
            "cos_qc",
            F.col("dot_qc") / F.sqrt(F.col("c_norm_sq") * F.col("q_norm_sq")),
        )
    )
    wcell = Window.partitionBy("q_id").orderBy(F.desc("cos_qc"), F.asc("label"))
    probes = qc.withColumn("cell_rank", F.row_number().over(wcell)).filter(
        F.col("cell_rank") <= N_PROBE
    ).select("q_id", "label")
    # exact search within probed cells
    cand = (
        emb.join(probes, "label")
        .join(F.broadcast(q), "q_id")
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    scored = cand.withColumn(
        "cos_sim", cosine(F.col("q_emb"), F.col("embedding"))
    ).select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


IVF_TOPK_SQL = f"""
WITH expl AS (
  SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u
),
cent AS (
  SELECT label, pos,
         CAST(sum(CAST(v AS {_DEC_SQL})) AS DOUBLE) / count(*) AS c
  FROM expl GROUP BY label, pos
),
cent_norm AS (
  SELECT label, CAST(sum(CAST(c * c AS {_DEC_SQL})) AS DOUBLE) AS c_norm_sq
  FROM cent GROUP BY label
),
q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}),
q_expl AS (
  SELECT q_id, i - 1 AS pos, CAST(q_emb[i] AS DOUBLE) AS qv
  FROM q, LATERAL (SELECT unnest(generate_series(1, len(q_emb))) AS i) u
),
q_norm AS (
  SELECT q_id,
         CAST(list_reduce(list_prepend(CAST(0 AS {_DEC_SQL}),
              list_transform(q_emb, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS {_DEC_SQL}))),
              (s, v) -> s + v) AS DOUBLE) AS q_norm_sq
  FROM q
),
qc AS (
  SELECT e.q_id, c.label,
         CAST(sum(CAST(e.qv * c.c AS {_DEC_SQL})) AS DOUBLE) AS dot_qc
  FROM q_expl e JOIN cent c ON e.pos = c.pos
  GROUP BY e.q_id, c.label
),
cells AS (
  SELECT q_id, label
  FROM (
    SELECT qc.q_id, qc.label,
           row_number() OVER (
             PARTITION BY qc.q_id
             ORDER BY qc.dot_qc / sqrt(cn.c_norm_sq * qn.q_norm_sq) DESC,
                      qc.label ASC
           ) AS cell_rank
    FROM qc
    JOIN cent_norm cn ON qc.label = cn.label
    JOIN q_norm qn ON qc.q_id = qn.q_id
  ) r WHERE cell_rank <= {N_PROBE}
)
SELECT q_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT q.q_id, e.vec_id AS neighbor_id,
         {cosine_sql('q.q_emb', 'e.embedding')} AS cos_sim,
         row_number() OVER (
           PARTITION BY q.q_id
           ORDER BY {cosine_sql('q.q_emb', 'e.embedding')} DESC, e.vec_id ASC
         ) AS rank
  FROM q
  JOIN cells ON cells.q_id = q.q_id
  JOIN embeddings e ON e.label = cells.label AND e.vec_id <> q.q_id
) t
WHERE rank <= {TOP_K}
"""


NEARDUP_COS_THRESHOLD = 0.4


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with blocked candidates.

    Block on the cluster id (``label`` — in production the IVF cell id
    from the coarse quantizer), compare only within blocks, keep pairs
    with cosine >= threshold.  The block join is the scale lever: the
    all-pairs O(n²) never materializes, only O(Σ block²).
    """
    emb = table(spark, sf_dir, "embeddings", spread=True)
    # norms precomputed once per vector (N folds), not once per pair
    # (N² folds) — the pair stage then does a single dot fold
    with_norm = emb.withColumn("nsq", norm_sq(F.col("embedding")))
    a = with_norm.select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("nsq").alias("nsq_a"),
        "label",
    )
    b = with_norm.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("nsq").alias("nsq_b"),
        F.col("label").alias("label_b"),
    )
    pairs = a.join(
        b, (F.col("label") == F.col("label_b")) & (F.col("va") < F.col("vb"))
    ).withColumn(
        "cos_sim",
        dot(F.col("ea"), F.col("eb")) / F.sqrt(F.col("nsq_a") * F.col("nsq_b")),
    )
    return pairs.filter(F.col("cos_sim") >= NEARDUP_COS_THRESHOLD).select(
        "va", "vb", "label", "cos_sim"
    )


DEDUP_EMBEDDING_SQL = f"""
SELECT a.vec_id AS va, b.vec_id AS vb, a.label,
       {cosine_sql('a.embedding', 'b.embedding')} AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {cosine_sql('a.embedding', 'b.embedding')} >= {NEARDUP_COS_THRESHOLD}
"""


def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension profile of the embedding column: count, DECIMAL-exact
    mean, min, max.

    The normalization-stats primitive an ML pipeline computes before
    whitening / scaling a vector column (and the sanity check that no
    dimension is dead or exploding).  ``posexplode`` flattens rows to
    (dim, value) in the scan stage; the per-dim aggregation shuffles
    O(dim x partitions) partial rows — independent of corpus size.  Float
    values widen to double losslessly; the mean routes through DECIMAL so
    accumulation order cannot drift between engines.
    """
    emb = table(spark, sf_dir, "embeddings")
    flat = emb.select(
        F.posexplode("embedding").alias("dim", "val")
    ).select("dim", F.col("val").cast("double").alias("v"))
    flat = flat.withColumn("dim", F.col("dim").cast("bigint"))
    return flat.groupBy("dim").agg(
        F.count("*").alias("n_vecs"),
        F.round(
            F.sum(F.col("v").cast("decimal(38,8)")).cast("double")
            / F.count("*"),
            8,
        ).alias("mean_val"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )


EMBEDDING_STATS_SQL = """
SELECT dim, count(*) AS n_vecs,
       round(CAST(sum(CAST(v AS DECIMAL(38,8))) AS DOUBLE) / count(*), 8)
         AS mean_val,
       min(v) AS min_val,
       max(v) AS max_val
FROM (
  SELECT u.dim, u.v
  FROM embeddings,
       unnest(list_transform(embedding,
                             (x, i) -> {'dim': i - 1, 'v': CAST(x AS DOUBLE)}))
         AS t(u)
) flat
GROUP BY dim
"""


# --- SemDeDup: semantic dedup through learned clusters -------------------
# (Abbas et al. 2023, arXiv:2303.09540): k-means the embedding space,
# then find semantic-duplicate GROUPS only within each cluster and keep
# one representative per group — the member farthest from its centroid
# (the paper's keep-low-centroid-similarity rule: the most "extreme"
# exemplar carries the most information).  All-pairs work is bounded by
# O(sum cluster_size^2), never O(n^2), and the within-cluster pass is a
# chunked Arrow computation, not a pair join.

SEMANTIC_COS_THRESHOLD = 0.4
# rows above which a cluster's pairwise pass is refused: the O(n_c^2)
# within-cluster stage is the algorithm's documented cost, and a
# monster cluster means k is mis-sized for the corpus — raise k (the
# paper sizes k so clusters stay in the tens of thousands)
MAX_SEMANTIC_CLUSTER_ROWS = 100_000
# pairwise sims are computed in row-chunks of this size: peak memory
# O(chunk x cluster), never O(cluster^2) floats
_SEM_CHUNK = 1024


# driver-collected fit sample cap: the quantizer trains on at most
# this many hash-sampled vectors (k x dim centroids are the model; the
# sample only has to cover the density, not the corpus — the
# SemDeDup/faiss practice of fitting on a slice and assigning all)
SEMANTIC_FIT_SAMPLE = 50_000


def _semantic_clusters(
    spark: SparkSession,
    emb: DataFrame,
    k: int,
    seed: int,
) -> DataFrame:
    """Cluster assignment for SemDeDup: numpy k-means++ and Lloyd on a
    deterministic hash-sample DRIVER-LOCAL (bounded by
    ``SEMANTIC_FIT_SAMPLE`` — model-sized work, zero per-round Spark
    jobs), then ONE distributed broadcast-centroid assignment pass.
    Returns ``(vec_id, cluster, dist_sq)``.  The fit-on-sample /
    assign-all split is the 100 TB shape: the corpus is touched once
    for the sample sort-limit and once for assignment."""
    import numpy as np

    from .clustering import _assign

    sample = (
        emb.select(
            "vec_id", "embedding",
            F.xxhash64("vec_id", F.lit(seed)).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(SEMANTIC_FIT_SAMPLE)
        .collect()
    )
    if not sample:
        # empty relation: an empty assignment with the right schema
        # (the per-cluster dedup stage then has no groups to process)
        return spark.createDataFrame(
            [], "vec_id long, cluster int, dist_sq double"
        )
    X = np.stack([list(r.embedding) for r in sample]).astype(np.float64)
    rng = np.random.RandomState(seed)
    # k-means++ init
    cents = [X[rng.randint(len(X))]]
    for _ in range(1, min(k, len(X))):
        d2 = np.min(
            [((X - c) ** 2).sum(axis=1) for c in cents], axis=0
        )
        tot = d2.sum()
        if tot <= 0.0:
            break
        cents.append(X[rng.choice(len(X), p=d2 / tot)])
    C = np.stack(cents)
    x_sq = (X ** 2).sum(axis=1)
    for _ in range(100):  # Lloyd to fixpoint on the sample
        # ||x-c||^2 = x^2 + c^2 - 2xc: O(n·k) memory, no (n,k,dim) temp
        d = (
            x_sq[:, None] + (C ** 2).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        )
        lab = d.argmin(axis=1)
        newC = np.stack(
            [
                X[lab == j].mean(axis=0) if (lab == j).any() else C[j]
                for j in range(len(C))
            ]
        )
        if np.allclose(newC, C):
            break
        C = newC
    cent_df = spark.createDataFrame(
        [(int(j), [float(x) for x in C[j]]) for j in range(len(C))],
        "k long, carr array<double>",
    )
    return _assign(emb.select("vec_id", "embedding"), cent_df).select(
        "vec_id", F.col("k").cast("int").alias("cluster"), "dist_sq"
    )


def semantic_dedup(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 8,
    threshold: float = SEMANTIC_COS_THRESHOLD,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup over an ``(vec_id, embedding)`` relation.

    Returns one row per input vector: ``(vec_id, cluster, keep,
    group_size)`` where ``group_size`` is the size of the vector's
    semantic-duplicate group (1 = unique).  Deterministic: seeded
    sample-fit quantizer (``_semantic_clusters``), exact cosine,
    representative = max centroid distance with vec_id tie-break.
    """
    assign = _semantic_clusters(
        spark, emb.select("vec_id", "embedding"), k, seed
    )
    clustered = emb.select("vec_id", "embedding").join(assign, "vec_id")

    out_schema = (
        "vec_id long, cluster int, keep boolean, group_size int"
    )

    def _dedup_cluster(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n > MAX_SEMANTIC_CLUSTER_ROWS:
            raise ValueError(
                f"semantic_dedup: cluster of {n} rows exceeds "
                f"MAX_SEMANTIC_CLUSTER_ROWS={MAX_SEMANTIC_CLUSTER_ROWS}; "
                "the within-cluster pairwise pass is O(n^2) by design — "
                "refit with a larger k so clusters stay bounded"
            )
        # deterministic processing order regardless of Arrow batch order
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(E, axis=1)
        norms[norms == 0.0] = 1.0
        E = E / norms[:, None]
        parent = np.arange(n)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for lo in range(0, n, _SEM_CHUNK):
            hi = min(lo + _SEM_CHUNK, n)
            sims = E[lo:hi] @ E.T  # (chunk, n)
            ii, jj = np.nonzero(sims >= threshold)
            for a, b in zip(ii + lo, jj):
                if a < b:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(n)])
        dist = pdf["dist_sq"].to_numpy()
        keep = np.zeros(n, dtype=bool)
        sizes = np.zeros(n, dtype=np.int32)
        for r in np.unique(roots):
            members = np.nonzero(roots == r)[0]
            sizes[members] = len(members)
            # farthest from centroid wins; vec_id ascending breaks ties
            # (members are vec_id-sorted, argmax takes the first max)
            keep[members[int(np.argmax(dist[members]))]] = True
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cluster": pdf["cluster"].astype("int32"),
                "keep": keep,
                "group_size": sizes,
            }
        )

    return clustered.groupBy("cluster").applyInPandas(
        _dedup_cluster, out_schema
    )


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The benched SemDeDup entry over the ``embeddings`` fixture:
    cluster-bounded semantic dedup decisions for every vector.

    No SQL oracle by nature (k-means fit + union-find); pinned instead
    by exact keep-set equality against a pure-numpy reference
    implementation in ``tests/test_semantic_dedup.py`` plus structural
    invariants (one representative per group, cluster-local groups).
    """
    emb = table(spark, sf_dir, "embeddings")
    return semantic_dedup(spark, emb).orderBy("vec_id")


QUERIES = {
    "similarity_topk": similarity_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ivf_topk": ivf_topk,
    "dedup_embedding": dedup_embedding,
}

AUX_QUERIES = {
    "embedding_stats": embedding_stats,
    "dedup_semantic": dedup_semantic,
}

AUX_ORACLES = {
    "embedding_stats": EMBEDDING_STATS_SQL,
}

ORACLES = {
    "similarity_topk": SIMILARITY_TOPK_SQL,
    "ann_lsh_topk": ANN_LSH_TOPK_SQL,
    "ivf_topk": IVF_TOPK_SQL,
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
}
