"""K-means clustering over the embedding column (unrolled Lloyd, exact).

The semantic-clustering step of a training-data pipeline (cluster-balanced
sampling, near-dup triage, topic bucketing) — and the iterative-algorithm
surface of the engine alongside ``dedup_components``'s label propagation.
The reference engine could express this only as a chain of full map/reduce
jobs, one per Lloyd round with a driver-side centroid file between them
(its only verbs: map/emit/reduce, /root/reference/external/include/
mr_task_factory.h:20-38); here each round is one broadcast join + one
keyed aggregation inside a single Catalyst plan.

Determinism / oracle parity:

- Iterations are UNROLLED (a fixed ``N_ITERS`` assignment passes with a
  centroid update between consecutive passes), so the whole algorithm is
  one static DataFrame plan and one static SQL string — no driver loop,
  no Date/RNG.  Init centroids are the embeddings of the ``K``
  smallest-by-rank ``vec_id``s (deterministic; robust to ids not
  starting at 0 or having gaps).  ``kmeans_pp`` below adds the
  production seeded-k-means++ / convergence-loop variant.
- Distance is the sequential-fold squared L2 (``functions/vectors.sq_l2``)
  — fixed left-to-right association, bit-identical across engines.
- Updated centroids are per-dimension DECIMAL-sum means (the
  ``ivf_topk`` pattern, operators/similarity.py:207) rebuilt into arrays
  ordered by dimension, so iteration-2 scores see identical doubles.
- Argmin ties break on cluster id ascending via ``row_number``.

Scale (100 TB of vectors):

- Centroids are K x dim rows — always broadcast.  Assignment is a
  row-local cross join with K scored candidates per vector: one pass over
  the data, no shuffle of the vectors themselves.
- The centroid update shuffles only (K x dim) partial sums after map-side
  partial aggregation; the assignment relation joins the exploded vectors
  on ``vec_id`` co-partitioned.
- More rounds at scale = repeat the unrolled block (or loop with
  ``localCheckpoint`` every few rounds as ``dedup_components`` does —
  operators/dedup.py:894); the per-round cost model is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.vectors import sq_l2, sq_l2_sql

K = 8
N_ITERS = 2  # assignment passes; N_ITERS - 1 centroid updates between

_DEC = "decimal(32,20)"
_DEC_SQL = "DECIMAL(32,20)"


def _assign(emb: DataFrame, cent_arr: DataFrame) -> DataFrame:
    """One Lloyd assignment pass: broadcast the K centroid arrays, score
    row-locally, keep the argmin (ties -> smallest cluster id)."""
    scored = emb.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id",
        "k",
        sq_l2(F.col("embedding"), F.col("carr")).alias("dist_sq"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist_sq"), F.asc("k"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "k", "dist_sq")
    )


def _update(expl: DataFrame, assign: DataFrame) -> DataFrame:
    """Recompute centroids as per-dimension DECIMAL-exact means, rebuilt
    into dimension-ordered arrays."""
    # the DECIMAL sum is exact in both engines, but its cast to double can
    # differ by 1 ulp (DuckDB computes int128/10^scale with two roundings,
    # Java BigDecimal one) — observed on the fixture.  Rounding the mean to
    # 12 dp erases the sub-ulp divergence (the tfidf round(ln, 8) playbook,
    # operators/text.py:362) at precision far beyond clustering needs.
    cent = (
        expl.join(assign.select("vec_id", "k"), "vec_id")
        .groupBy("k", "pos")
        .agg(
            F.round(
                F.sum(F.col("v").cast(_DEC)).cast("double") / F.count(F.lit(1)),
                12,
            ).alias("c")
        )
    )
    return cent.groupBy("k").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("carr")
    )


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment after ``N_ITERS`` unrolled Lloyd passes."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    expl = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    # Seed from the K smallest vec_ids BY RANK, not by value: `vec_id < K`
    # silently under-seeds when ids don't start at 0 or have gaps below K.
    # orderBy().limit(K) compiles to TakeOrderedAndProject (no full sort);
    # the row_number window then runs over only K rows.
    seeds = emb.orderBy("vec_id").limit(K)
    wseed = Window.orderBy("vec_id")
    cent_arr = seeds.select(
        (F.row_number().over(wseed) - 1).cast("long").alias("k"),
        F.col("embedding").alias("carr"),
    )
    a = _assign(emb, cent_arr)
    for _ in range(N_ITERS - 1):
        a = _assign(emb, _update(expl, a))
    return a.select(
        "vec_id", F.col("k").cast("int").alias("cluster"), "dist_sq"
    )


KMEANS_CLUSTERS_SQL = f"""
WITH emb AS (SELECT vec_id, embedding FROM embeddings),
cent0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS k,
         embedding AS carr
  FROM emb ORDER BY vec_id LIMIT {K}
),
a1 AS (
  SELECT vec_id, k, dist_sq FROM (
    SELECT e.vec_id, c.k,
           {sq_l2_sql('e.embedding', 'c.carr')} AS dist_sq,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {sq_l2_sql('e.embedding', 'c.carr')} ASC, c.k ASC
           ) AS rn
    FROM emb e CROSS JOIN cent0 c
  ) t WHERE rn = 1
),
expl AS (
  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
  FROM emb, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u
),
cent1 AS (
  SELECT k, list(c ORDER BY pos) AS carr FROM (
    SELECT a1.k, expl.pos,
           round(CAST(sum(CAST(expl.v AS {_DEC_SQL})) AS DOUBLE) / count(*),
                 12) AS c
    FROM expl JOIN a1 USING (vec_id)
    GROUP BY a1.k, expl.pos
  ) m GROUP BY k
),
a2 AS (
  SELECT vec_id, k, dist_sq FROM (
    SELECT e.vec_id, c.k,
           {sq_l2_sql('e.embedding', 'c.carr')} AS dist_sq,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {sq_l2_sql('e.embedding', 'c.carr')} ASC, c.k ASC
           ) AS rn
    FROM emb e CROSS JOIN cent1 c
  ) t WHERE rn = 1
)
SELECT vec_id, CAST(k AS INTEGER) AS cluster, dist_sq FROM a2
"""


QUERIES: dict = {}
ORACLES: dict = {}

AUX_QUERIES = {"kmeans_clusters": kmeans_clusters}
AUX_ORACLES = {"kmeans_clusters": KMEANS_CLUSTERS_SQL}
