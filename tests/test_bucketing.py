"""Bucketed tables join without exchanges (the co-located join path)."""

from __future__ import annotations

from mapreduce_grpc_spark.catalog import table
from mapreduce_grpc_spark.plans.explain import formatted_plan
from mapreduce_grpc_spark.sources.writers import write_bucketed_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    import shutil

    orders = table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    write_bucketed_table(orders, "orders_b", "custkey", 8)
    write_bucketed_table(cust, "customer_b", "custkey", 8)

    # force the shuffle-join path (a broadcast would bypass bucketing and
    # prove nothing); bucketed scans must then merge-join with NO shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(spark.table("customer_b"), "custkey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join should not shuffle:\n{plan}"
        )
        # sanity: result matches the plain join
        plain = orders.join(cust, "custkey").count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
