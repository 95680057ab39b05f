#!/usr/bin/env python
"""Scale datapoint for the manifest layer: read + commit wall time at
1k / 10k / 100k-entry tables, delta-checkpoint format vs the pre-delta
one-full-JSON-listing-per-version format.

Run from the repo root:  python tools/manifest_scale.py
Prints one JSON line:
  {"entries": {"1000": {...}, ..., "1000000": {...}}}
per cell:
  {"legacy_roundtrip_sec":  parse+serialize of ONE full listing — the
                            old design's floor cost on EVERY read and
                            EVERY commit,
   "commit_sec":            a 4-file append commit via _commit with
                            EXPLICIT adds/removes (the mutator path) —
                            O(changed files), no diff,
   "commit_diff_sec":       the same commit through the fallback O(N)
                            dict-diff path (full-list-only callers),
   "read_cold_sec":         read_manifest with the process cache
                            cleared (checkpoint parse + delta replay),
   "read_warm_sec":         read_manifest again (cache hit),
   "delta_bytes":           size of the append's commit record,
   "full_bytes":            size of the full listing the old format
                            would have written for the same commit}

The claim under test (sources/snapshots.py manifest-scale block): with
delta commit records + compacted checkpoints, steady-state read cost is
O(1) cached / O(checkpoint + recent deltas) cold, and commit I/O is
O(changed files) — the old format paid the full-listing JSON round-trip
on every single operation, which at 10^6 files is a multi-GB string on
the driver.  Since round 9 every mutator passes its EXPLICIT
adds/removes, so the O(N) in-memory dict diff only runs for callers
that hold nothing but the full list — both paths are measured here.

No Spark needed: the layer under test is driver-side JSON + replay, so
entries are synthesized with realistic stats envelopes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_grpc_spark.sources import snapshots as snap
from mapreduce_grpc_spark.sources.snapshots import (
    _commit,
    current_version,
    read_manifest,
)

SIZES = [1_000, 10_000, 100_000, 1_000_000]


def _entry(i: int) -> dict:
    return {
        "name": f"data-{uuid.uuid4().hex[:12]}-part-{i:05d}.parquet",
        "rows": 10_000,
        "bytes": 12_345_678,
        "stats": {
            "k": {"min": i * 10_000, "max": (i + 1) * 10_000 - 1},
            "ts": {
                "min": "2026-01-01 00:00:00",
                "max": "2026-06-30 23:59:59",
            },
        },
        "rg": {"k": [[i * 10_000, (i + 1) * 10_000 - 1]]},
    }


def run_cell(n: int) -> dict:
    root = tempfile.mkdtemp(prefix="manifest-scale-")
    path = os.path.join(root, "t")
    os.makedirs(path)
    try:
        files = [_entry(i) for i in range(n)]
        # the old format's floor: one full listing serialized on commit
        # and parsed on read — measure the round-trip once
        t0 = time.perf_counter()
        blob = json.dumps({"version": 1, "files": files})
        json.loads(blob)
        legacy = time.perf_counter() - t0
        full_bytes = len(blob)

        _commit(path, files, ["k", "ts"], base_version=0)
        base = read_manifest(path)  # warm the cache like a real writer

        add = [_entry(n + j) for j in range(4)]
        # the real mutator path: EXPLICIT adds/removes — commit cost is
        # O(changed files), no in-memory diff of the full listing
        t0 = time.perf_counter()
        _commit(
            path,
            base["files"] + add,
            ["k", "ts"],
            base_version=base["version"],
            carry=base,
            adds=add,
            removes=[],
        )
        commit_sec = time.perf_counter() - t0
        # the fallback path (callers holding only the full list): the
        # residual O(N) dict diff the explicit path eliminates
        base2 = read_manifest(path)
        add2 = [_entry(2 * n + j) for j in range(4)]
        t0 = time.perf_counter()
        _commit(
            path,
            base2["files"] + add2,
            ["k", "ts"],
            base_version=base2["version"],
            carry=base2,
        )
        commit_diff_sec = time.perf_counter() - t0
        v = current_version(path)
        delta_bytes = os.path.getsize(
            os.path.join(path, "_manifests", f"v{v}.json")
        )

        # force a checkpoint at the head so the cold read measures the
        # steady state (checkpoint + 0 deltas), not a replay from v1 —
        # timed: past CHECKPOINT_SHARD_ENTRIES this is the multi-part
        # write (bounded memory per part)
        t0 = time.perf_counter()
        snap._maybe_checkpoint(
            snap._fs(None), path, v, read_manifest(path)["files"], force=True
        )
        ckpt_sec = time.perf_counter() - t0
        snap._RECON_CACHE.clear()
        t0 = time.perf_counter()
        m = read_manifest(path)
        read_cold = time.perf_counter() - t0
        assert len(m["files"]) == n + 8
        t0 = time.perf_counter()
        read_manifest(path)
        read_warm = time.perf_counter() - t0
        return {
            "legacy_roundtrip_sec": round(legacy, 4),
            "commit_sec": round(commit_sec, 4),
            "commit_diff_sec": round(commit_diff_sec, 4),
            "read_cold_sec": round(read_cold, 4),
            "read_warm_sec": round(read_warm, 5),
            "ckpt_sec": round(ckpt_sec, 4),
            "delta_bytes": delta_bytes,
            "full_bytes": full_bytes,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    out = {"entries": {str(n): run_cell(n) for n in SIZES}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
