#!/usr/bin/env python
"""The production ingest gate, end to end — r15's composition tour.

Run:  python examples/ingest_gate.py

What it shows (each piece is its own feature; THIS is how they
compose into the thing a 100 TB training-data pipeline actually
runs):

1. a ROW-TRACKED corpus table (stable row ids, CDC without keys)
2. a batch staged on a BRANCH — including exact duplicates of
   corpus docs and low-quality rows, invisible to main
3. on-branch fix-ups: dedup-against-corpus and a quality floor as
   merge-on-read key-set deletes (broadcast semi-join on text
   hashes — never all-pairs; DVs land on branch-born files only)
4. main keeps moving concurrently — publish must take the REBASE
   arm, re-drawing the branch's row-id slices under main's
   advanced watermark (metadata-only)
5. the DECLARATIVE gate: `snap_publish_branch(audits=,
   agg_audits=)` re-checks the postconditions; `dry_run=True`
   previews the plan first with zero side effects
6. the change feed sees the publish as plain inserts with the NEW
   ids; `snap_history` shows the whole operation trail
7. retention retires the drained staging branch
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.refs import (
    snap_create_branch,
    snap_expire_refs,
    snap_publish_branch,
)
from mapreduce_grpc_spark.sources.snapshots import (
    delete_keys_mor,
    snap_append,
    snap_history,
    snap_init,
    snap_read,
    table_changes,
    current_version,
)


def main() -> None:
    spark = tune_session(get_spark(app_name="ingest-gate", cpus=4))
    tmp = tempfile.mkdtemp(prefix="ingest-gate-")
    t = f"{tmp}/corpus"

    def docs(a, b, src="web"):
        return spark.range(a, b).select(
            F.col("id").alias("doc_id"),
            F.lit(src).alias("source"),
            F.concat(F.lit("document body number "), F.col("id"))
            .alias("text"),
            (F.length(F.concat(F.lit("document body number "),
                               F.col("id")))).alias("n_chars"),
        )

    # 1. the corpus consumers read, row-tracked from birth
    snap_init(
        spark, docs(0, 1000), t, stats_cols=["doc_id"],
        row_tracking=True,
    )
    print("corpus:", snap_read(spark, t).count(), "docs")

    # 2. stage a batch on a branch: 200 fresh docs + 50 RE-SUBMITTED
    #    duplicates of corpus docs under new ids + 30 junk rows
    bdir = snap_create_branch(t, "ingest")
    dups = (
        docs(0, 50)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn(
            "text",
            F.concat(F.lit("document body number "),
                     F.col("doc_id") - 1_000_000),
        )
    )
    junk = docs(2000, 2030).withColumn("text", F.lit("x")).withColumn(
        "n_chars", F.lit(1)
    )
    snap_append(
        spark, bdir,
        docs(1200, 1400).unionByName(dups).unionByName(junk),
    )
    print("staged on branch:", snap_read(spark, t, ref="ingest").count())
    print("main still serves:", snap_read(spark, t).count())

    # 4. main moves concurrently (another ingest lane)
    snap_append(spark, t, docs(1000, 1100, src="books"))

    # 3. fix up ON THE BRANCH: dedup vs corpus + quality floor,
    #    as distributed key-set MoR deletes
    th = F.md5(F.encode(F.col("text"), "UTF-8"))
    corpus_h = (
        snap_read(spark, t).select(th.alias("th")).distinct()
    )
    staged = snap_read(spark, t, ref="ingest").filter(
        F.col("doc_id") >= 1200
    )
    dup_ids = (
        staged.withColumn("th", th)
        .join(corpus_h, "th", "left_semi")
        .select("doc_id")
    )
    junk_ids = staged.filter(F.col("n_chars") < 10).select("doc_id")
    r = delete_keys_mor(
        spark, bdir, dup_ids.unionByName(junk_ids).distinct(),
        keys=["doc_id"],
    )
    print("branch fix-up masked rows (MoR, nothing rewritten):", r)

    # 5. the declarative gate — preview, then publish
    AUD = {"quality_floor": "doc_id < 1200 OR n_chars >= 10"}
    AGG = {
        "no_resubmitted_dups":
            "count(*) FILTER (WHERE doc_id >= 1000000) = 0",
        "keys_unique": "count(DISTINCT doc_id) = count(*)",
    }
    print("dry run:", snap_publish_branch(
        t, "ingest", audits=AUD, agg_audits=AGG, dry_run=True))
    pub = snap_publish_branch(t, "ingest", audits=AUD, agg_audits=AGG)
    print("published:", pub)

    # 6. downstream: the feed sees plain inserts with fresh ids
    v = current_version(t)
    feed = table_changes(spark, t, None, v - 1, v)
    print(
        "CDF over the publish:",
        feed.groupBy("_change_type").count().collect(),
    )
    ids = snap_read(spark, t, with_row_ids=True).select("_row_id")
    assert ids.distinct().count() == ids.count()
    print("row ids unique across the rebase publish:", ids.count())
    print("history tail:")
    for row in snap_history(spark, t).orderBy("version").tail(3):
        print("  ", row.version, row.op, row.mode or "", row.live_rows)

    # 7. retention retires the drained staging branch
    print("retention:", snap_expire_refs(t, -1))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
