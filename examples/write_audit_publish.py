#!/usr/bin/env python
"""Write-audit-publish (WAP) with named refs, in one tour.

Run:  python examples/write_audit_publish.py

The problem this solves at 100 TB: a pipeline that ingests straight
into the table its consumers read has no audit gate — a bad batch is
visible the instant it commits.  With refs the flow becomes:

1. `snap_create_tag`      — pin the last-known-good version against GC
2. `snap_create_branch`   — fork a zero-copy, fully mutable staging
                            branch (shares the table's bytes)
3. write + fix up ON THE BRANCH — every table operation works there
                            unchanged (append, MERGE, MoR delete,
                            OPTIMIZE, even DDL)
4. audit declaratively    — `snap_publish_branch(audits=...,
                            agg_audits=...)` runs the expectations
                            against the branch head (DV-aware,
                            session-free) and refuses to publish
                            while any fails; `dry_run=True` previews
                            the whole gate + plan with zero side
                            effects
5. `snap_publish_branch`  — ONE commit on main adopts the branch's
                            files by reference (fast-forward; or an
                            append-only rebase if main moved — since
                            r15 row-tracked tables rebase too, ids
                            re-drawn under main's watermark)
   ... or, if the audit fails: fix up and re-audit, or
   `snap_drop_branch` — main never saw a thing.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources.refs import (
    PublishAuditFailed,
    PublishConflict,
    snap_branch_path,
    snap_create_branch,
    snap_create_tag,
    snap_drop_branch,
    snap_list_refs,
    snap_publish_branch,
)
from mapreduce_grpc_spark.sources.snapshots import (
    delete_where_mor,
    snap_add_constraint,
    snap_append,
    snap_init,
    snap_read,
)


def main() -> None:
    spark = tune_session(get_spark(app_name="wap-example", cpus=4))
    tmp = tempfile.mkdtemp(prefix="wap-")
    t = f"{tmp}/events"

    def rng(a, b):
        return spark.range(a, b).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )

    # the published table consumers read, with a quality constraint
    snap_init(spark, rng(0, 1000), t, stats_cols=["k"])
    snap_add_constraint(spark, t, "v_small", "v < 7")
    snap_create_tag(t, "last-good")
    print("published table:", snap_read(spark, t).count(), "rows")

    # ---- 1. stage this week's ingest on a branch -------------------
    bdir = snap_create_branch(t, "ingest-wk33")
    snap_append(spark, bdir, rng(1000, 1500))
    print("staged on branch:", snap_read(spark, t, ref="ingest-wk33").count())
    print("main still serves:", snap_read(spark, t).count())

    # ---- 2. the DECLARATIVE gate: publish refuses while audits fail --
    GATE = {"freshness": "k < 1000 OR k % 100 <> 0"}
    AGG = {"grew": "count(*) >= 1400",
           "keys_unique": "count(DISTINCT k) = count(*)"}
    try:
        snap_publish_branch(t, "ingest-wk33", audits=GATE, agg_audits=AGG)
    except PublishAuditFailed as e:
        print("gate refused (as designed):",
              sorted(e.violations), "- fixing up on the branch")
    # a merge-on-read delete: positions recorded, nothing rewritten
    delete_where_mor(spark, bdir, [("k", "in", [1000, 1100, 1200, 1300, 1400])])

    # preview first: audits + plan, zero side effects
    print("dry run:", snap_publish_branch(
        t, "ingest-wk33", audits=GATE, dry_run=True))

    # ---- 3. publish: one commit, zero bytes moved --------------------
    r = snap_publish_branch(t, "ingest-wk33", audits=GATE, agg_audits=AGG)
    print("published:", r)
    print("main now serves:", snap_read(spark, t).count(), "rows")
    snap_drop_branch(t, "ingest-wk33")

    # ---- the failure arm: a branch whose audit fails ------------------
    b2 = snap_create_branch(t, "ingest-wk34")
    snap_append(spark, b2, rng(2000, 2010))
    # ... imagine the audit failing here ...
    snap_drop_branch(t, "ingest-wk34")  # main never saw the batch
    print("after failed-audit drop, main:", snap_read(spark, t).count())

    # ---- conflicts are loud -------------------------------------------
    b3 = snap_create_branch(t, "late")
    delete_where_mor(spark, snap_branch_path(t, "late"), [("k", "=", 5)])
    snap_append(spark, t, rng(3000, 3010))  # main moves concurrently
    try:
        snap_publish_branch(t, "late")
    except PublishConflict as e:
        print("publish conflict (as designed):", str(e)[:88], "...")
    snap_drop_branch(t, "late")

    print("refs now:", snap_list_refs(t))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
