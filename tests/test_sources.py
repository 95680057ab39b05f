"""Readers/writers: the reference's text KV format round-trips."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import table
from mapreduce_grpc_spark.functions.hashes import hash131
from mapreduce_grpc_spark.sources.readers import read_text_kv
from mapreduce_grpc_spark.sources.writers import write_partitioned_sorted


def test_partitioned_sorted_sink_roundtrip(spark, sf_dir, tmp_path):
    wc = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", """[ ,."']+""")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
    )
    out = str(tmp_path / "buckets")
    write_partitioned_sorted(wc, "word", "count", 8, out)

    # one dir per non-empty bucket, <= 8
    bucket_dirs = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert 0 < len(bucket_dirs) <= 8

    # within-bucket key order + correct bucket routing
    spark_hash = {
        r.word: r.b
        for r in wc.select("word", hash131(F.col("word"), 8).alias("b")).collect()
    }
    for d in bucket_dirs:
        b = int(d.split("=")[1])
        files = [f for f in os.listdir(os.path.join(out, d)) if f.startswith("part-")]
        assert len(files) == 1  # one file per non-empty bucket
        with open(os.path.join(out, d, files[0])) as fh:
            keys = [ln.split(",", 1)[0] for ln in fh if ln.strip()]
        assert keys == sorted(keys)
        for k in keys:
            assert spark_hash[k] == b

    # read back through the first-comma-split reader: counts survive
    back = read_text_kv(spark, [os.path.join(out, d) for d in bucket_dirs])
    got = {(r.key, int(r.value)) for r in back.collect()}
    want = {(r.word, r["count"]) for r in wc.collect()}
    assert got == want


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    """CSV and JSON connectors: write orders, read back, same content."""
    from mapreduce_grpc_spark.sources.readers import read_csv, read_json

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    want = {tuple(r) for r in orders.collect()}

    csv_path = str(tmp_path / "orders_csv")
    orders.write.option("header", "true").csv(csv_path)
    got_csv = {
        tuple(r)
        for r in read_csv(
            spark, csv_path, "o_orderkey long, o_orderstatus string, o_totalprice double"
        ).collect()
    }
    assert got_csv == want

    json_path = str(tmp_path / "orders_json")
    orders.write.json(json_path)
    got_json = {
        tuple(r)
        for r in read_json(
            spark, json_path, "o_orderkey long, o_orderstatus string, o_totalprice double"
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()
    }
    assert got_json == want


def test_read_text_kv_first_comma_split(spark, tmp_path):
    p = tmp_path / "kv.txt"
    p.write_text("alpha,1,2,3\nbeta,x\n")
    rows = {r.key: r.value for r in read_text_kv(spark, str(p)).collect()}
    assert rows == {"alpha": "1,2,3", "beta": "x"}


def test_partitioned_sorted_sink_low_ascii_keys(spark, tmp_path):
    """Keys containing characters that sort below ',' (e.g. '!', '$' —
    producible by the reference tokenizer) must still come out in KEY
    order, not concatenated-line order: 'a!x,1' < 'a,1' as lines even
    though 'a' < 'a!x' as keys."""
    rows = [("a", "1"), ("a!x", "1"), ("a$", "2"), ("ab", "3"), ("!", "9")]
    df = spark.createDataFrame(rows, "key string, value string")
    out = str(tmp_path / "buckets")
    write_partitioned_sorted(df, "key", "value", 2, out)

    for d in os.listdir(out):
        if not d.startswith("bucket="):
            continue
        for f in os.listdir(os.path.join(out, d)):
            if not f.startswith("part-"):
                continue
            with open(os.path.join(out, d, f)) as fh:
                keys = [ln.split(",", 1)[0] for ln in fh if ln.strip()]
            assert keys == sorted(keys), (d, keys)


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC round-trip preserves schema + values, and the ORC scan gets
    filter pushdown and column pruning just like parquet."""
    from mapreduce_grpc_spark.sources.readers import read_orc
    from mapreduce_grpc_spark.sources.writers import write_orc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out)

    back = read_orc(spark, out)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.select("doc_id", "lang", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "lang", "n_chars").collect()}
    assert a == b

    plan = (
        back.filter(back.lang == "en")
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "orc" in plan.lower()
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters")[1][:80]
    assert "struct<doc_id:bigint,lang:string>" in plan.replace(" ", "") or "ReadSchema" in plan


def test_compact_small_files(spark, sf_dir, tmp_path):
    """200 tiny files -> a handful of target-sized ones, same rows."""
    from mapreduce_grpc_spark.sources.maintenance import compact, data_file_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frag = str(tmp_path / "fragmented")
    docs.repartition(200).write.parquet(frag)
    assert data_file_count(frag) == 200
    before = {tuple(r) for r in spark.read.parquet(frag).collect()}

    # ~64 KB target at fixture scale -> a few files, not 1, not 200
    n = compact(spark, frag, target_bytes=64 * 1024)
    assert n == data_file_count(frag)
    assert 1 <= n < 50
    after = {tuple(r) for r in spark.read.parquet(frag).collect()}
    assert before == after


def test_compact_rebalance_shuffles_evenly(spark, sf_dir, tmp_path):
    """rebalance=True produces even file sizes from skewed inputs."""
    import os

    from mapreduce_grpc_spark.sources.maintenance import compact

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    skew = str(tmp_path / "skewed")
    # one fat file + many near-empty ones
    docs.repartition(40, (docs.doc_id % 40 == 0).cast("int")).write.parquet(skew)
    before = {tuple(r) for r in spark.read.parquet(skew).collect()}
    compact(spark, skew, target_bytes=48 * 1024, rebalance=True)
    sizes = [
        os.path.getsize(os.path.join(skew, f))
        for f in os.listdir(skew)
        if f.endswith(".parquet")
    ]
    assert len(sizes) >= 2
    assert max(sizes) < 6 * min(sizes), sizes
    assert {tuple(r) for r in spark.read.parquet(skew).collect()} == before
