#!/usr/bin/env python
"""Measure branch-create + publish cost vs table size.

The refs design claims both are O(manifest) driver work with zero data
movement — so wall time should grow only with the FILE COUNT (manifest
entries), never with data bytes, and the data dir must be byte-frozen
across publish.  Two parent shapes are measured:

* plain rows (default 32 / 320 real files): delta-manifest parent;
* ``--ckpt N`` (default 100_000): a parent whose listing is only
  reachable through the multi-part CHECKPOINT + delta replay (the r8
  machinery) — entries past the real seed files are synthesized, a
  checkpoint is forced at the head, and a few deltas land on top, so
  branch create and publish pay the checkpointed reconstruction once
  and must still commit O(changed files).

Run:  python tools/refs_scale.py [files...] [--ckpt [entries]]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mapreduce_grpc_spark.session import get_spark, tune_session
from mapreduce_grpc_spark.sources import snapshots as snap
from mapreduce_grpc_spark.sources.refs import (
    snap_create_branch,
    snap_drop_branch,
    snap_publish_branch,
)
from mapreduce_grpc_spark.sources.snapshots import (
    _commit,
    current_version,
    read_manifest,
    snap_append,
    snap_enable_row_tracking,
    snap_init,
)


def build(spark, path: str, n_files: int, rows_per_file: int = 5000):
    df = (
        spark.range(n_files * rows_per_file)
        .select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
        .repartitionByRange(n_files, "k")
    )
    snap_init(spark, df, path, stats_cols=["k"])
    return len(read_manifest(path)["files"])


def _synth_entry(i: int) -> dict:
    # manifest-layer stand-in: never scanned, only listed/diffed
    return {
        "name": f"data-{uuid.uuid4().hex[:12]}-part-{i:06d}.parquet",
        "rows": 10_000,
        "bytes": 12_345_678,
        "stats": {"k": {"min": i * 10_000, "max": (i + 1) * 10_000 - 1}},
    }


def build_checkpointed(spark, path: str, n_entries: int) -> int:
    """A parent at checkpointed-manifest scale: 8 real files (so the
    branch append has a readable schema), ``n_entries`` synthesized
    entries, a FORCED multi-part checkpoint at the head, then a few
    deltas on top — reconstruction is checkpoint + replay, the shape a
    100 TB table's manifest actually has."""
    build(spark, path, 8, rows_per_file=1000)
    base = read_manifest(path)
    synth = [_synth_entry(i) for i in range(n_entries)]
    _commit(
        path, base["files"] + synth, base["stats_cols"],
        base_version=base["version"], schema_json=base.get("schema"),
        carry=base, adds=synth, removes=[],
    )
    v = current_version(path)
    snap._maybe_checkpoint(
        snap._fs(None), path, v, read_manifest(path)["files"], force=True
    )
    for j in range(3):
        b = read_manifest(path)
        add = [_synth_entry(n_entries + 10 + j)]
        _commit(
            path, b["files"] + add, b["stats_cols"],
            base_version=b["version"], schema_json=b.get("schema"),
            carry=b, adds=add, removes=[],
        )
    snap._RECON_CACHE.clear()  # branch/publish must pay the cold read
    return len(read_manifest(path)["files"])


def measure(
    spark, t: str, label: str, got: int, move_main: bool = False
) -> None:
    listing_before = sorted(
        x for x in os.listdir(t) if x.startswith("data-")
    )
    t0 = time.time()
    bdir = snap_create_branch(t, "b")
    t_create = time.time() - t0
    t0 = time.time()
    snap_append(
        spark, bdir,
        spark.range(10).select(
            (F.col("id") - 10).alias("k"),
            (F.col("id") % 97).alias("v"),
        ),
    )
    t_append = time.time() - t0
    if move_main:
        # main moves after the fork -> publish takes the REBASE arm
        snap_append(
            spark, t,
            spark.range(10).select(
                (F.col("id") - 100).alias("k"),
                (F.col("id") % 97).alias("v"),
            ),
        )
        listing_before = sorted(
            x for x in os.listdir(t) if x.startswith("data-")
        )
    t0 = time.time()
    r = snap_publish_branch(t, "b")
    t_publish = time.time() - t0
    moved = sorted(
        x for x in os.listdir(t) if x.startswith("data-")
    ) != listing_before
    snap_drop_branch(t, "b")
    print(
        f"{label:>8} {got:>7} {t_create:>9.3f} {t_append:>9.3f} "
        f"{t_publish:>10.3f} {r['adds']:>5} {str(moved):>17}"
    )


def main() -> None:
    args = sys.argv[1:]
    ckpt_entries = 0
    if "--ckpt" in args:
        i = args.index("--ckpt")
        args.pop(i)
        if i < len(args) and args[i].isdigit():
            ckpt_entries = int(args.pop(i))
        else:
            ckpt_entries = 100_000
    sizes = [int(a) for a in args] or [32, 320]
    spark = tune_session(get_spark(app_name="refs-scale", cpus=8))
    print(
        f"{'parent':>8} {'files':>7} {'create_s':>9} {'append_s':>9} "
        f"{'publish_s':>10} {'adds':>5} {'main_files_moved':>17}"
    )
    for n in sizes:
        tmp = tempfile.mkdtemp(prefix="refs-scale-")
        t = os.path.join(tmp, "t")
        got = build(spark, t, n)
        measure(spark, t, "plain", got)
        shutil.rmtree(tmp, ignore_errors=True)
    # row-tracked rebase (the r15 arm): branch ids re-drawn under
    # main's moved watermark at publish — metadata-only, so the cost
    # must match the plain rebase's O(manifest + changed files)
    tmp = tempfile.mkdtemp(prefix="refs-scale-")
    t = os.path.join(tmp, "t")
    got = build(spark, t, sizes[-1])
    snap_enable_row_tracking(t)
    measure(spark, t, "tracked", got, move_main=True)
    shutil.rmtree(tmp, ignore_errors=True)
    if ckpt_entries:
        tmp = tempfile.mkdtemp(prefix="refs-scale-")
        t = os.path.join(tmp, "t")
        got = build_checkpointed(spark, t, ckpt_entries)
        measure(spark, t, "ckpt", got)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
