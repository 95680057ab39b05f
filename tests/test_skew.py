"""Salting preserves exact semantics (equality with unsalted plans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import table
from mapreduce_grpc_spark.functions.numeric import dsum
from mapreduce_grpc_spark.functions.skew import salted_count, salted_join, salted_sum


def test_salted_count_equals_plain(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag, r.cnt)
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("cnt")).collect()
    }
    salted = {(r.l_returnflag, r.cnt) for r in salted_count(li, "l_returnflag").collect()}
    assert salted == plain


def test_salted_sum_equals_plain(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag, r.total)
        for r in li.groupBy("l_returnflag")
        .agg(dsum("l_quantity").alias("total"))
        .collect()
    }
    salted = {
        (r.l_returnflag, r.total)
        for r in salted_sum(li, "l_returnflag", "l_quantity").collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    plain = {
        (r.o_orderkey, r.c_name)
        for r in orders.join(cust, "custkey").select("o_orderkey", "c_name").collect()
    }
    salted = {
        (r.o_orderkey, r.c_name)
        for r in salted_join(orders, cust, "custkey")
        .select("o_orderkey", "c_name")
        .collect()
    }
    assert salted == plain
