"""Relational core: the closure of the reference's MapReduce substrate.

The reference has no joins, aggregation variants, windows, sorts, or set
ops as first-class operators (SURVEY.md §2.B — its only verbs are map and
reduce, /root/reference/external/include/mr_task_factory.h:20-38), but the
substrate expresses them: filter = map emitting 0/1, join = tag + co-
partition + reduce, top-k = reduce over a bounded heap, etc.  This module
provides them as native Catalyst operators instead.

Scale notes per query are in the docstrings; the common rules:
 - small dimensions (region, nation, supplier) are explicitly broadcast —
   no shuffle of the fact side;
 - aggregates always run partial+final (Catalyst default) — the reference
   shuffles every raw pair (/root/reference/src/mr_tasks.h:113-115);
 - top-k uses TakeOrderedAndProject (per-partition heaps + driver merge),
   never a global sort;
 - double sums go through DECIMAL (see functions.numeric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.hashes import hash131, hash131_sql
from ..functions.numeric import davg, davg_sql, dsum, dsum_sql

# ---------------------------------------------------------------------------
# Grouped aggregation (TPC-H Q1 shape) — reference ops O5+O6 generalized.
# ---------------------------------------------------------------------------

Q1_CUTOFF = "1998-09-02 00:00:00"


def per_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sum/avg/count over lineitem (TPC-H Q1 shape).

    Replaces the reference's whole-group reduce (O6): Catalyst runs
    partial aggregation before the shuffle, so shuffle volume is
    O(groups x partitions), not O(rows) as in the reference.  The shipdate
    predicate and the 7-column projection both push into the parquet scan.
    """
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF))
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


PER_KEY_AGG_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       {davg_sql('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (absent from the reference, §2.B).

    Catalyst plans this as expand + two-phase aggregate — distinct keys are
    partially deduplicated map-side before the shuffle.
    """
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
    )


DISTINCT_COUNT_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_cust,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


def distinct_count_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — the 100 TB-scale variant of
    distinct_count.  Sketches merge associatively, so shuffle volume is
    O(groups), independent of key cardinality.  No oracle (DuckDB's HLL
    differs); driver records the rows-only check.
    """
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("n_cust_approx"),
        F.count("*").alias("n_orders"),
    )


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets aggregation (absent from reference, §2.B)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


ROLLUP_AGG_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# Joins — "reduce-side join" and friends (absent from reference, §2.B).
# ---------------------------------------------------------------------------


def reduce_side_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation ⋈ region with grouped revenue.

    In MapReduce terms: tag rows by source, co-partition on the key, join in
    the reducer.  Here: one shuffle join (orders⋈customer on custkey) plus
    two broadcast joins — nation and region are tiny dims, so the fact side
    never reshuffles for them.  At 100 TB the orders⋈customer join is the
    only real shuffle; AQE converts it to broadcast if customer fits.
    """
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
        F.countDistinct("o_custkey").alias("n_cust"),
    )


REDUCE_SIDE_JOIN_SQL = f"""
SELECT r_name, n_name,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price,
       count(DISTINCT o_custkey) AS n_cust
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers having at least one urgent order.

    Semi joins ship only the join key of the right side; with AQE the
    deduplicated key set is usually broadcast.
    """
    customer = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no orders at all."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# Sorts / top-k (absent from reference beyond per-bucket key order, §2.B).
# ---------------------------------------------------------------------------


def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by total order value, deterministic tie-break.

    orderBy+limit compiles to TakeOrderedAndProject: each partition keeps a
    10-element heap and the driver merges — no global sort, no single-
    partition window over the full data.  row_number runs only on the 10
    surviving rows.
    """
    orders = table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        dsum("o_totalprice").alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    top = rev.orderBy(F.desc("revenue"), F.asc("o_custkey")).limit(10)
    w = Window.orderBy(F.desc("revenue"), F.asc("o_custkey"))
    return top.withColumn("rank", F.row_number().over(w))


TOPK_SQL = f"""
SELECT o_custkey, revenue, n_orders,
       CAST(row_number() OVER (ORDER BY revenue DESC, o_custkey ASC) AS INTEGER) AS rank
FROM (
  SELECT o_custkey,
         {dsum_sql('o_totalprice')} AS revenue,
         count(*) AS n_orders
  FROM orders
  GROUP BY o_custkey
) t
ORDER BY revenue DESC, o_custkey ASC
LIMIT 10
"""


def partitioned_sorted_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact output contract as a queryable DataFrame.

    Reference semantics (O3+O5+O7): rows hash-bucketed into R=8 buckets by
    ``h = (h*131 + byte) % R`` (/root/reference/src/mr_tasks.h:24-32), keys
    lexicographically sorted within each bucket (/root/reference/src/
    worker.h:108-117).  The bucket id is computed with the same polynomial
    hash (per-step modulus — ring-homomorphic, so identical buckets without
    overflow).  ``sources.writers.write_partitioned_sorted`` materializes
    the same result as R sorted files.  Sort order itself is not hashable
    by the driver (order-insensitive check); the bucket column is.
    """
    wc = table(spark, sf_dir, "documents").select(
        F.explode(
            F.filter(
                F.split(F.col("text"), """[ ,."']+"""), lambda w: w != F.lit("")
            )
        ).alias("word")
    )
    counts = wc.groupBy("word").agg(F.count("*").alias("cnt"))
    return counts.withColumn("bucket", hash131("word", 8))


PARTITIONED_SORTED_OUTPUT_SQL = f"""
SELECT word, count(*) AS cnt, {hash131_sql('word', 8)} AS bucket
FROM (
  SELECT unnest(list_filter(string_split_regex(text, '[ ,."'']+'), w -> w <> '')) AS word
  FROM documents
) t
GROUP BY word
"""


# ---------------------------------------------------------------------------
# Set operations (absent from reference, §2.B).
# ---------------------------------------------------------------------------


def _seg_keys(spark, sf_dir, priority):
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == priority)
        .select("o_custkey")
    )


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two customer segments."""
    return _seg_keys(spark, sf_dir, "1-URGENT").union(
        _seg_keys(spark, sf_dir, "2-HIGH")
    ).distinct()


SET_UNION_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of the same two segments."""
    return _seg_keys(spark, sf_dir, "1-URGENT").intersect(
        _seg_keys(spark, sf_dir, "2-HIGH")
    )


SET_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — urgent-only customers."""
    return _seg_keys(spark, sf_dir, "1-URGENT").subtract(
        _seg_keys(spark, sf_dir, "2-HIGH")
    )


SET_EXCEPT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
"""


# ---------------------------------------------------------------------------
# Window functions (absent from reference, §2.B).
# ---------------------------------------------------------------------------


def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + running totals + lag per customer order history.

    One shuffle on o_custkey serves all three window functions (same
    partitioning+ordering spec).  Running sum uses an explicit ROWS frame
    and DECIMAL accumulation for cross-engine determinism.
    """
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(w).alias("order_seq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(wsum).cast("double").alias("running_spend"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
    )


WINDOW_ANALYTIC_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
       CAST(row_number() OVER w AS INTEGER) AS order_seq,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       lag(o_totalprice, 1) OVER w AS prev_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


QUERIES = {
    "per_key_agg": per_key_agg,
    "distinct_count": distinct_count,
    "distinct_count_approx": distinct_count_approx,
    "rollup_agg": rollup_agg,
    "reduce_side_join": reduce_side_join,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "topk": topk,
    "partitioned_sorted_output": partitioned_sorted_output,
    "set_union": set_union,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "window_analytic": window_analytic,
}

ORACLES = {
    "per_key_agg": PER_KEY_AGG_SQL,
    "distinct_count": DISTINCT_COUNT_SQL,
    "rollup_agg": ROLLUP_AGG_SQL,
    "reduce_side_join": REDUCE_SIDE_JOIN_SQL,
    "join_semi": JOIN_SEMI_SQL,
    "join_anti": JOIN_ANTI_SQL,
    "topk": TOPK_SQL,
    "partitioned_sorted_output": PARTITIONED_SORTED_OUTPUT_SQL,
    "set_union": SET_UNION_SQL,
    "set_intersect": SET_INTERSECT_SQL,
    "set_except": SET_EXCEPT_SQL,
    "window_analytic": WINDOW_ANALYTIC_SQL,
}
