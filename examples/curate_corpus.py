#!/usr/bin/env python
"""End-to-end corpus curation demo: the pipeline a pre-training dataset
actually runs, as one Spark plan.

    raw documents
      -> quality gate          (>= 10 tokens)
      -> near-dup clustering   (MinHash+LSH pairs -> connected components,
                                keep each cluster's canonical member)
      -> stratified mix        (per-language keep rates, deterministic
                                hash sampling)
      -> sequence packing      (token-budget bins per source shard)

Run:  python examples/curate_corpus.py [sf_dir]      (default sf0.01)

Prints per-stage survivor counts and a sample of packed sequences.  The
same composition is registered as the `pipeline_curate` query and
hash-checked against a composed DuckDB oracle in tests.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import table
from mapreduce_grpc_spark.functions.textfns import tokens
from mapreduce_grpc_spark.operators.curation import MIN_TOKENS, pipeline_curate
from mapreduce_grpc_spark.operators.dedup import dedup_components
from mapreduce_grpc_spark.operators.sampling import sample_stratified
from mapreduce_grpc_spark.session import get_spark, tune_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="curate-corpus")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    n_raw = docs.count()
    n_quality = docs.filter(F.size(tokens("text")) >= MIN_TOKENS).count()
    losers = dedup_components(spark, sf_dir).filter(~F.col("is_canonical"))
    n_losers = losers.count()
    n_sampled = sample_stratified(spark, sf_dir).count()

    packed = pipeline_curate(spark, sf_dir)
    rows = packed.count()
    n_seqs = packed.select("source", "seq_id").distinct().count()

    print(f"raw documents:            {n_raw}")
    print(f"pass quality gate:        {n_quality}")
    print(f"near-dup cluster losers:  {n_losers} (dropped, canonical kept)")
    print(f"stratified sample keeps:  {n_sampled} of raw")
    print(f"final curated docs:       {rows}")
    print(f"packed training sequences:{n_seqs}")
    print("\nsample packed rows:")
    for r in packed.orderBy("source", "seq_id", "doc_id").limit(8).collect():
        print(f"  {r.source:>6} seq {r.seq_id}: doc {r.doc_id} ({r.n_tok} tok, {r.lang})")
    spark.stop()


if __name__ == "__main__":
    main()
