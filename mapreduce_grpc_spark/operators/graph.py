"""Graph analytics over the near-dup pair graph: PageRank centrality.

``dedup_components`` answers "which documents form one duplicate
cluster"; PageRank answers "which document is the cluster's most central
member" — a principled canonical pick (the member most-connected to
other members, transitively) instead of min-id, and the second iterative
graph algorithm in the engine after min-label propagation.  The
reference engine would need one full map/reduce job per iteration with a
driver-side score file between jobs (its only verbs are map/emit/reduce,
/root/reference/external/include/mr_task_factory.h:20-38); here the
unrolled iterations are one Catalyst plan.

Determinism / oracle parity: per-node scores stay IEEE-deterministic
doubles, and every cross-row aggregation is order-independent —
neighbor contributions are quantized to 12 dp (``round(pr/deg, 12)``),
cast to DECIMAL for the exact associative sum, and the damped update is
re-rounded to 12 dp.  Same playbook as ``unigram_logprob``'s micro-nat
sums (operators/quality.py).

Scale (the 100 TB near-dup graph):

- Edges come from the STAGED pair table (``near_dup_pairs`` — computed
  once per corpus, operators/dedup.py:360), so PageRank never re-runs
  shingle→MinHash→LSH.
- Each iteration is one (src-keyed) join + one (dst-keyed) aggregation —
  the standard bulk-synchronous PR shape; AQE handles hub-node skew the
  same way the CC loop's joins do.  The node-count scalar rides a
  broadcast column, not a driver collect.
- Degrees and edges are loop-invariant relations; at production scale
  persist them across iterations (the staged parquet read makes
  re-scans cheap here).  More rounds = repeat the unrolled block, or
  loop with periodic ``localCheckpoint`` exactly as
  ``components_from_pairs`` does (operators/dedup.py:894).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import DEDUP_NEAR_SQL, dedup_near

DAMPING = 0.85
N_ROUNDS = 3
_DEC = "decimal(32,12)"
_DEC_SQL = "DECIMAL(32,12)"


def pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized near-dup pair graph, 3 rounds."""
    pairs = dedup_near(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # symmetrized graph: every node appears as a src; n rides as a column
    # (broadcast one-row agg) so no driver collect enters the plan
    n_row = deg.agg(F.count("*").alias("n"))
    pr = deg.crossJoin(F.broadcast(n_row)).select(
        F.col("src").alias("doc_id"),
        "deg",
        "n",
        F.round(F.lit(1.0) / F.col("n"), 12).alias("pr"),
    )
    for _ in range(N_ROUNDS):
        rate = pr.select(
            "doc_id", F.round(F.col("pr") / F.col("deg"), 12).alias("rate")
        )
        inflow = (
            edges.join(rate, edges.src == rate.doc_id)
            .groupBy("dst")
            .agg(F.sum(F.col("rate").cast(_DEC)).cast("double").alias("s"))
        )
        pr = (
            pr.join(inflow, pr.doc_id == inflow.dst)
            .select(
                "doc_id",
                "deg",
                "n",
                F.round(
                    (F.lit(1.0) - F.lit(DAMPING)) / F.col("n")
                    + F.lit(DAMPING) * F.col("s"),
                    12,
                ).alias("pr"),
            )
        )
    return pr.select("doc_id", F.col("deg").cast("long").alias("degree"), "pr")


def _pr_iter_sql(i: int) -> str:
    return f"""
rate{i} AS (
  SELECT doc_id, round(pr / deg, 12) AS rate FROM pr{i}
),
pr{i + 1} AS (
  SELECT p.doc_id, p.deg, p.n,
         round((1.0 - {DAMPING}) / p.n + {DAMPING} * s.s, 12) AS pr
  FROM pr{i} p JOIN (
    SELECT e.dst,
           CAST(sum(CAST(r.rate AS {_DEC_SQL})) AS DOUBLE) AS s
    FROM edges e JOIN rate{i} r ON e.src = r.doc_id
    GROUP BY e.dst
  ) s ON p.doc_id = s.dst
)"""


PAGERANK_NEARDUP_SQL = (
    f"""
WITH near AS (SELECT doc_a, doc_b FROM ({DEDUP_NEAR_SQL}) q),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM near
  UNION ALL
  SELECT doc_b, doc_a FROM near
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
n_row AS (SELECT count(*) AS n FROM deg),
pr0 AS (
  SELECT src AS doc_id, deg, n, round(1.0 / n, 12) AS pr
  FROM deg, n_row
),"""
    + ",".join(_pr_iter_sql(i) for i in range(N_ROUNDS))
    + f"""
SELECT doc_id, CAST(deg AS BIGINT) AS degree, pr FROM pr{N_ROUNDS}
"""
)


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the near-dup pair graph —
    the local-clustering signal that separates "A≈B and B≈C by chance"
    from a genuinely mutually-duplicate group (triangle-dense regions
    are transitive duplicate clusters; sparse stars are often false
    positives of the banding).

    Classic ordered enumeration: the staged pair table is already
    canonical ``doc_a < doc_b``, so each triangle (a<b<c) is found
    EXACTLY once by joining (a,b)⋈(b,c) and closing with (a,c) — the
    ordering is what keeps the join from counting each triangle 6 ways
    (and at scale, from exploding hub nodes: a node's edges only join
    toward higher ids).  Two equi-joins over the staged graph, then one
    explode + count; no all-pairs work anywhere.
    """
    pairs = dedup_near(spark, sf_dir).select("doc_a", "doc_b")
    e1 = pairs.alias("e1")
    e2 = pairs.alias("e2")
    e3 = pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.doc_b") == F.col("e2.doc_a"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .select(
            F.col("e1.doc_a").alias("a"),
            F.col("e1.doc_b").alias("b"),
            F.col("e2.doc_b").alias("c"),
        )
    )
    return (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("doc_id")
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


GRAPH_TRIANGLES_SQL = f"""
WITH near AS (SELECT doc_a, doc_b FROM ({DEDUP_NEAR_SQL}) q),
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM near e1
  JOIN near e2 ON e1.doc_b = e2.doc_a
  JOIN near e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
),
member AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT doc_id, count(*) AS n_triangles FROM member GROUP BY doc_id
"""


QUERIES: dict = {}
ORACLES: dict = {}

AUX_QUERIES = {
    "pagerank_neardup": pagerank_neardup,
    "graph_triangles": graph_triangles,
}
AUX_ORACLES = {
    "pagerank_neardup": PAGERANK_NEARDUP_SQL,
    "graph_triangles": GRAPH_TRIANGLES_SQL,
}
