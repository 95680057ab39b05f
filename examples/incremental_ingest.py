#!/usr/bin/env python
"""Incremental ingest demo: dedup a new batch AGAINST the existing corpus.

The 100 TB operating mode for dedup is not "re-run the all-corpus pipeline
nightly" — it is:

    once:        corpus -> shingle-hash index   (staged parquet,
                                                 sources/staging.py)
    per ingest:  batch LSH bands x corpus LSH bands -> exact-Jaccard
                 verify -> keep/drop decision per batch document

Work per ingest scales with the batch size (times band-bucket occupancy),
never with the corpus: the corpus side is a parquet scan of the published
index, and the band join compares batch docs to corpus docs only — no
corpus self-join anywhere in the plan.

Run:  python examples/incremental_ingest.py [sf_dir]      (default sf0.01)

The demo treats the fixture's ``doc_id % 10 == 7`` slice as the incoming
batch (in production: the day's new files).  The same computation is
registered as the ``dedup_incremental`` AUX query and hash-checked against
its DuckDB oracle in tests/test_sampling.py.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import table
from mapreduce_grpc_spark.operators.dedup import (
    INC_MOD,
    INC_SLOT,
    dedup_incremental,
)
from mapreduce_grpc_spark.session import get_spark, tune_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="incremental-ingest-demo")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    n_batch = docs.filter((F.col("doc_id") % INC_MOD) == INC_SLOT).count()
    n_corpus = docs.count() - n_batch
    print(f"corpus: {n_corpus} docs   incoming batch: {n_batch} docs")

    # first call builds + publishes the staged shingle index; the timed
    # second call is the steady-state ingest cost (index already staged)
    dedup_incremental(spark, sf_dir).count()
    t0 = time.perf_counter()
    result = dedup_incremental(spark, sf_dir)
    rows = result.collect()
    dt = time.perf_counter() - t0

    dups = [r for r in rows if r.is_duplicate]
    print(
        f"batch docs with a corpus candidate: {len(rows)}; "
        f"verified duplicates to drop: {len(dups)}  ({dt:.2f}s warm)"
    )
    for r in sorted(dups, key=lambda r: -r.jaccard)[:5]:
        print(
            f"  drop doc {r.batch_id}: duplicate of corpus doc "
            f"{r.match_id} (jaccard {r.jaccard:.3f})"
        )


if __name__ == "__main__":
    main()
