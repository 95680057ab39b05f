"""Measure driver vs distributed scan planning on a big manifest.

Fabricates a snapshot table whose checkpoint holds N synthetic entries
(multi-part past CHECKPOINT_SHARD_ENTRIES) plus two post-checkpoint
delta commits, then times COLD planning of a selective predicate both
ways:

- driver:      read_manifest (parse every part on the driver, replay
               deltas) + prune_manifest's Python loop over N entries
- distributed: plan_scan_entries (each part parsed+pruned in its own
               Spark task; only survivors return)

No data files exist — planning never opens them, which is the point:
this isolates exactly the manifest-bound phase a 10^7-file table pays
per cold query.

Run: python tools/plan_scale.py [n_entries ...]   (default 100000 1000000)
Prints one JSON line per (n, mode).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_grpc_spark.session import get_spark
from mapreduce_grpc_spark.sources import plan_distributed as PD
from mapreduce_grpc_spark.sources import snapshots as S


def fabricate(path: str, n: int) -> None:
    f = S._fs(None)
    f.makedirs(os.path.join(path, S._MANIFEST_DIR))
    entries = [
        {
            "name": f"part-{i:08d}.parquet",
            "rows": 1000,
            "stats": {"k": {"min": i * 1000, "max": i * 1000 + 999}},
        }
        for i in range(n)
    ]
    shard = S.CHECKPOINT_SHARD_ENTRIES
    of = -(-n // shard)
    for i in range(of):
        f.create_exclusive(
            S._ckpt_part_path(path, 16, i, of),
            json.dumps(
                {
                    "version": 16,
                    "part": i,
                    "of": of,
                    "files": entries[i * shard:(i + 1) * shard],
                }
            ),
        )
    f.create_exclusive(
        S._ckpt_path(path, 16), json.dumps({"version": 16, "parts": of})
    )
    f.replace_atomic(S._last_ckpt_path(path), "16")
    base = {
        "stats_cols": ["k"],
        "schema": None,
        "txns": {},
        "commit_info": {"op": "append"},
    }
    f.create_exclusive(
        S._manifest_path(path, 16),
        json.dumps(
            dict(base, version=16, uid=uuid.uuid4().hex, adds=[], removes=[])
        ),
    )
    # two post-checkpoint deltas: an append and a remove
    f.create_exclusive(
        S._manifest_path(path, 17),
        json.dumps(
            dict(
                base,
                version=17,
                uid=uuid.uuid4().hex,
                adds=[
                    {
                        "name": "part-new.parquet",
                        "rows": 10,
                        "stats": {"k": {"min": 5, "max": 50}},
                    }
                ],
                removes=[],
            )
        ),
    )
    f.create_exclusive(
        S._manifest_path(path, 18),
        json.dumps(
            dict(
                base,
                version=18,
                uid=uuid.uuid4().hex,
                adds=[],
                removes=["part-00000007.parquet"],
            )
        ),
    )
    f.replace_atomic(S._current_path(path), "18")


def bench(spark, n: int) -> list[dict]:
    path = os.path.join(tempfile.mkdtemp(prefix="plan_scale_"), "t")
    fabricate(path, n)
    preds = [("k", "between", 10, 5009)]  # ~6 surviving files
    out = []

    S._RECON_CACHE.clear()
    t0 = time.time()
    planned = PD.plan_scan_entries(spark, path, preds, planner="distributed")
    assert planned is not None
    kept_d, _ = planned
    out.append(
        {
            "n_entries": n,
            "mode": "distributed",
            "plan_sec": round(time.time() - t0, 3),
            "survivors": len(kept_d),
        }
    )

    S._RECON_CACHE.clear()
    t0 = time.time()
    m = S.read_manifest(path)
    kept, _ = S.prune_manifest(m, preds)
    out.append(
        {
            "n_entries": n,
            "mode": "driver",
            "plan_sec": round(time.time() - t0, 3),
            "survivors": len(kept),
        }
    )
    assert sorted(e["name"] for e in kept) == sorted(
        e["name"] for e in kept_d
    )
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark(app_name="plan-scale")
    # warm the JVM/codegen paths (needs >1 shard to take the
    # distributed branch at all)
    bench(spark, S.CHECKPOINT_SHARD_ENTRIES * 2)
    for n in sizes:
        for row in bench(spark, n):
            print(json.dumps(row))


if __name__ == "__main__":
    main()
