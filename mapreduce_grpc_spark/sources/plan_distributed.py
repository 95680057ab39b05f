"""Distributed scan planning: prune the manifest WHERE THE CLUSTER IS.

The driver-side planner (``snap_scan``) materializes the full file
listing and prunes it in a Python loop — exactly right up to ~10^6
entries, but at 10^7 (a 100 TB table of 10 MB files) the listing is
gigabytes of entry dicts and the loop is tens of seconds PER QUERY,
all on the one machine that doesn't scale.  The multi-part compacted
checkpoint (``snapshots._maybe_checkpoint``) already shards the
listing into bounded JSON parts, so planning can be a Spark job
instead: each part is pruned in its own task with the exact same
``_entry_may_match`` conservatism, only the SURVIVING entries return
to the driver, and the ≤ ``CHECKPOINT_INTERVAL`` delta records since
the checkpoint replay driver-side (each is O(changed files) by the
delta-commit format).  This is Iceberg's distributed planning /
Delta's checkpoint-as-relation model: driver memory and wall stay
O(survivors + deltas) no matter how big the table gets.

Semantics are ``snap_scan``'s exactly — pruning stays strictly
conservative (stats prove non-match or the file is kept), survivors
still get bloom refinement and the exact row filter.  Equality with
the driver planner is pinned by ``tests/test_plan_distributed.py``;
the crossover is measured by ``tools/plan_scale.py``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from . import snapshots as S

# parts-count threshold for the "auto" planner, from tools/plan_scale.py:
# the driver loop wins to ~150k entries (0.5 s vs a Spark job's ~0.9 s
# floor), the job wins 3.2x at 1M and linearly more beyond — so auto
# distributes from 4 parts (~200k entries) up.  Explicit
# planner="distributed" bypasses the floor (2 parts minimum).
AUTO_MIN_PARTS = 4


def _meta_record(f, path: str, version: int) -> dict:
    """The version's raw commit record — metadata only, NO file-list
    reconstruction (the whole point is never materializing it)."""
    mp = S._manifest_path(path, version)
    if not f.exists(mp):
        raise FileNotFoundError(mp)
    raw = json.loads(f.read_text(mp))
    S._check_reader_features(raw, path)
    return raw


def _may_match(entry: dict, phys_branches: list[list[tuple]]) -> bool:
    return any(
        all(S._entry_may_match(entry, p) for p in b)
        for b in phys_branches
    )


def _checkpoint_parts(
    f, path: str, version: int, min_parts: int = 2
) -> list[str] | None:
    """Part paths of the checkpoint at ``version`` if it is multi-part
    with ``>= min_parts`` parts, else None — decided from the pointer
    file's SIZE first so a huge single-file checkpoint is never parsed
    just to be rejected."""
    cp = S._ckpt_path(path, version)
    try:
        if f.getsize(cp) > 1 << 20:
            return None  # single-file body: driver parses it once anyway
    except OSError:
        return None
    head = json.loads(f.read_text(cp))
    if "parts" not in head:
        return None
    of = int(head["parts"])
    if of < min_parts:
        return None
    return [S._ckpt_part_path(path, version, i, of) for i in range(of)]


def plan_scan_entries(
    spark: SparkSession,
    path: str,
    predicates,
    version: int | None = None,
    fs=None,
    planner: str = "auto",
) -> tuple[list[dict], dict] | None:
    """Predicate-surviving manifest entries at ``version`` planned as a
    Spark job over checkpoint parts, plus the version's metadata record.

    Returns ``None`` when the distributed path does not apply — no
    checkpoint, a single-part checkpoint under ``planner="auto"``, a
    legacy full-listing record, or a reconstruction already cached (the
    driver loop over a warm in-memory list beats a Spark job) — and the
    caller should plan on the driver."""
    if planner not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown planner {planner!r}")
    if planner == "driver":
        return None
    f = S._fs(fs)
    v = S.current_version(path, fs) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no committed snapshot at {path!r}")
    raw = _meta_record(f, path, v)
    if "files" in raw:
        return None  # legacy full manifest: already materialized
    key = S._recon_key(f, path, v, raw)
    if planner == "auto" and key is not None and key in S._RECON_CACHE:
        return None  # warm cache: the driver loop wins
    ckpt_v = S._find_checkpoint(f, path, v)
    if not ckpt_v:
        return None
    parts = _checkpoint_parts(
        f, path, ckpt_v,
        AUTO_MIN_PARTS if planner == "auto" else 2,
    )
    if parts is None:
        return None

    # physical-name translation + partition-spec derivation, shared
    # with the driver planner so both prune with identical conjunctions
    branches = S._physical_branches(raw, predicates)
    fs_cap = f  # stateless SnapshotFS: pickled into the tasks

    def prune_parts(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for part in pdf["part"]:
                body = json.loads(fs_cap.read_text(part))
                for e in body["files"]:
                    if _may_match(e, branches):
                        out.append(json.dumps(e))
            yield pd.DataFrame({"entry": out})

    parts_df = spark.createDataFrame(
        [(p,) for p in parts], "part string"
    ).repartition(len(parts))
    survivors = parts_df.mapInPandas(prune_parts, "entry string").collect()
    state = {}
    for r in survivors:
        e = json.loads(r.entry)
        state[e["name"]] = e
    # replay the delta chain since the checkpoint on the driver — each
    # record is O(its changed files); a re-added name re-prunes (its
    # new stats may now exclude it), a removed name drops even when the
    # checkpoint's copy was pruned away (pop of a missing key is a noop)
    for dv in range(ckpt_v + 1, v + 1):
        rec = raw if dv == v else json.loads(
            f.read_text(S._manifest_path(path, dv))
        )
        if "files" in rec:  # defensive: legacy record mid-chain
            state = {
                e["name"]: e for e in rec["files"] if _may_match(e, branches)
            }
            continue
        for n in rec.get("removes") or ():
            state.pop(n, None)
        for e in rec.get("adds") or ():
            state.pop(e["name"], None)
            if _may_match(e, branches):
                state[e["name"]] = e
    return list(state.values()), raw


def snap_scan_distributed(
    spark: SparkSession,
    path: str,
    predicates,
    version: int | None = None,
    fs=None,
) -> DataFrame:
    """``snap_scan`` with the planning phase forced onto the cluster
    (see the module docstring); survivors still get bloom refinement
    and the exact row filter, and the call falls back to the driver
    planner whenever the distributed path does not apply (no/single-
    part checkpoint, legacy record), so it is always safe."""
    return S.snap_scan(
        spark, path, predicates, version, fs, planner="distributed"
    )
