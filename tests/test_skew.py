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


def test_ngram_posting_cap_bounds_viral_phrase(spark, tmp_path):
    """A phrase shared by half the corpus must NOT explode candidate
    generation: the hot shingle is dropped from the index (df > cap),
    while true duplicate pairs — which also share rare shingles — are
    still found with exact Jaccard, and both engines agree."""
    import os

    import duckdb

    from mapreduce_grpc_spark import registry
    from mapreduce_grpc_spark.catalog import TABLES
    from mapreduce_grpc_spark.operators.dedup import (
        MAX_POSTING_DF,
        _hashed_exploded,
        _ngram_candidates,
        dedup_ngram_jaccard,
    )
    from tests.oracle import assert_oracle_match

    n_docs, viral = 400, "the cat sat on a mat"  # one shared 5+-gram source
    rows = []
    for i in range(n_docs):
        # unique filler gives every doc its own rare shingles
        filler = " ".join(f"w{i}x{j}" for j in range(8))
        text = f"{viral} {filler}" if i % 2 == 0 else filler
        rows.append((i, text))
    # one planted true duplicate pair, both containing the viral phrase
    rows.append((9001, f"{viral} alpha beta gamma delta epsilon zeta"))
    rows.append((9002, f"{viral} alpha beta gamma delta epsilon zeta"))

    fake_sf = tmp_path / "sf"
    fake_sf.mkdir()
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, fake_sf / f"{t}.parquet")
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    con.execute(
        f"""COPY (SELECT doc_id, text, 'en' AS lang, 'viral' AS source,
                        length(text) AS n_chars FROM d)
            TO '{fake_sf}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.close()

    ex = _hashed_exploded(spark, str(fake_sf))
    n_cand = _ngram_candidates(ex).count()
    # uncapped, the 201 viral-phrase docs alone would give 201*200/2 >
    # 20000 candidate pairs; the cap keeps it to the planted pair's scale
    assert n_cand < 1000, n_cand

    result = dedup_ngram_jaccard(spark, str(fake_sf))
    pairs = {(r.doc_a, r.doc_b) for r in result.collect()}
    assert (9001, 9002) in pairs
    assert_oracle_match(
        result,
        registry.ORACLES["dedup_ngram_jaccard"],
        str(fake_sf),
        "dedup_ngram_jaccard_viral",
    )
    # sanity on the premise: the viral shingles really exceed the cap
    from pyspark.sql import functions as F
    max_df = (
        ex.groupBy("x").agg(F.count("*").alias("df")).agg(F.max("df")).collect()[0][0]
    )
    assert max_df > MAX_POSTING_DF


def test_band_bucket_cap_bounds_identical_docs(spark, tmp_path):
    """300 byte-identical documents all but share every signature band —
    uncapped, one bucket alone would emit 300*299/2 ≈ 45k candidate
    pairs.  The bucket cap keeps the LSH stage bounded (exact duplicates
    are dedup_exact's job); a planted NEAR-duplicate pair with distinct
    signatures is still found, and the oracle agrees."""
    import os

    import duckdb

    from mapreduce_grpc_spark import registry
    from mapreduce_grpc_spark.catalog import TABLES
    from mapreduce_grpc_spark.operators.dedup import (
        _band_pairs,
        _hashed_exploded,
        _minhash_aggs,
        dedup_near,
    )
    from tests.oracle import assert_oracle_match

    same = "lorem ipsum dolor sit amet " * 8
    # 30 shared tokens + 1 differing tail: 27 vs 27 shingles, 26 shared
    # -> Jaccard 26/28 ≈ 0.93, above the 0.8 near-dup threshold
    common = " ".join(f"tok{j}" for j in range(30))
    near_a = f"{common} kappa"
    near_b = f"{common} lambda"
    rows = [(i, same) for i in range(300)]
    rows += [(9001, near_a), (9002, near_b)]

    fake_sf = tmp_path / "sf"
    fake_sf.mkdir()
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, fake_sf / f"{t}.parquet")
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    con.execute(
        f"""COPY (SELECT doc_id, text, 'en' AS lang, 'dup' AS source,
                        length(text) AS n_chars FROM d)
            TO '{fake_sf}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.close()

    ex = _hashed_exploded(spark, str(fake_sf))
    sig = ex.groupBy("doc_id", "n").agg(*_minhash_aggs())
    n_cand = _band_pairs(sig).count()
    assert n_cand < 1000, n_cand  # uncapped would be >= 45k

    result = dedup_near(spark, str(fake_sf))
    pairs = {(r.doc_a, r.doc_b) for r in result.collect()}
    assert (9001, 9002) in pairs
    assert_oracle_match(
        result, registry.ORACLES["dedup_near"], str(fake_sf), "dedup_near_identical"
    )


def test_salted_group_sum_oracle_parity(spark, sf_dir):
    """The benched salted-aggregation query hash-matches a plain
    GROUP BY in DuckDB — two-phase salting must be invisible in the
    values, not just set-equal on a sample."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["salted_group_sum"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["salted_group_sum"],
        sf_dir,
        "salted_group_sum",
    )
