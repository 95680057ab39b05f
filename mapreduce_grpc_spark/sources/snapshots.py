"""Versioned snapshot tables + file-level copy-on-write MERGE.

The two mutation gaps left by ``sources/maintenance.py``'s
partition-overwrite writers, closed with machinery the engine already
uses elsewhere (fingerprint-keyed atomic publishes, ``sources/
staging.py``; per-file min-max envelopes, ``sources/layout.py``):

1. **Isolation.**  ``merge_upsert``/``rollup_refresh`` mutate partition
   directories in place, so a reader racing a refresh can see partition
   A from the old version and partition B from the new.  Here every
   mutation is a NEW immutable manifest — a JSON list of data files plus
   per-file key envelopes — and readers resolve the table through an
   atomically-swapped ``CURRENT`` pointer (``os.replace``), so a reader
   that has resolved a version keeps a consistent file list no matter
   how many commits land after it.  Old versions stay readable (time
   travel) until ``expire_snapshots``.

2. **Merge granularity.**  The partition-level MERGE rewrites whole
   partitions — a hot day-partition of a 100 TB table is terabytes, so
   merge cost is partition size, not update size.  ``merge_upsert_cow``
   rewrites only the FILES whose key envelope overlaps the update
   batch: envelopes come from parquet FOOTERS at commit time (pyarrow
   row-group stats — no data scan) and live in the manifest, so
   locating affected files is a driver-side interval check against the
   manifest, exactly Delta/Iceberg's data-skipping design.  Untouched
   files are carried into the new manifest BY REFERENCE — never read,
   never rewritten (the mtime test asserts byte-identical files).  The
   reference's analogue is reduce consuming only its own bucket's files
   (/root/reference/src/worker.h:81-119): work bounded by the relevant
   slice, not the table.

At 100 TB: the manifest is O(files) driver state — the same scaling
contract as Delta's JSON log segments (checkpointable if it ever grows
past memory); commits are one ``os.replace``; merge cost is
O(overlapping files + batch), and clustering the table on the merge key
(``zorder_write``/sorted writes) is what keeps the overlap small.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version}.json")


def _current_path(path: str) -> str:
    return os.path.join(path, _MANIFEST_DIR, "CURRENT")


def _json_val(v):
    """Normalize a stats/pruning value for JSON + cross-type compare:
    numbers stay numbers, everything else (dates, strings) becomes its
    string form — ISO date strings compare correctly as strings."""
    if v is None or isinstance(v, (int, float)):
        return v
    return str(v)


def _file_stats(file_path: str, stats_cols: list[str]) -> dict:
    """Per-file min-max envelopes from the parquet FOOTER (row-group
    statistics) — no data pages are read.  This is the scale-critical
    property: commit cost is O(files), not O(rows)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(file_path)
    schema_names = pf.schema_arrow.names
    mins: dict = {}
    maxs: dict = {}
    rows = pf.metadata.num_rows
    for rg in range(pf.metadata.num_row_groups):
        g = pf.metadata.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name not in stats_cols:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo, hi = _json_val(st.min), _json_val(st.max)
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    envelopes = {
        c: {"min": mins[c], "max": maxs[c]} for c in mins if c in maxs
    }
    _ = schema_names  # documented: stats_cols must name physical columns
    return {"rows": rows, "stats": envelopes}


def _write_data_files(
    spark: SparkSession, df: DataFrame, path: str, stats_cols: list[str]
) -> list[dict]:
    """Write ``df``'s rows as new immutable data files inside ``path``
    and return their manifest entries.  Files are written via a staging
    dir then renamed to unique names, so a crashed writer leaves only
    unreferenced orphans (removed by ``expire_snapshots``), never a
    half-visible table state."""
    staging = os.path.join(path, f"_stage-{uuid.uuid4().hex[:12]}")
    df.write.mode("errorifexists").parquet(staging)
    entries = []
    prefix = uuid.uuid4().hex[:12]
    for f in sorted(os.listdir(staging)):
        if not (f.startswith("part-") and f.endswith(".parquet")):
            continue
        final = f"data-{prefix}-{f}"
        os.rename(os.path.join(staging, f), os.path.join(path, final))
        entry = {"name": final}
        entry.update(_file_stats(os.path.join(path, final), stats_cols))
        entries.append(entry)
    shutil.rmtree(staging)
    return entries


def _commit(path: str, files: list[dict], stats_cols: list[str]) -> int:
    """Write manifest v(N+1) and atomically swap CURRENT to it."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    version = current_version(path) + 1
    manifest = {
        "version": version,
        "stats_cols": stats_cols,
        "files": files,
    }
    # 'x' mode: two racing writers cannot both claim version N — one
    # fails loudly (optimistic concurrency, the Delta protocol's rule)
    with open(_manifest_path(path, version), "x") as fh:
        json.dump(manifest, fh)
    tmp = os.path.join(mdir, f"CURRENT.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, _current_path(path))  # atomic on POSIX
    return version


def current_version(path: str) -> int:
    cur = _current_path(path)
    if not os.path.exists(cur):
        return 0
    with open(cur) as fh:
        return int(fh.read().strip())


def read_manifest(path: str, version: int | None = None) -> dict:
    v = current_version(path) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no committed snapshot at {path!r}")
    with open(_manifest_path(path, v)) as fh:
        return json.load(fh)


def snap_init(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    stats_cols: list[str],
) -> int:
    """Create a snapshot table at ``path`` from ``df`` (version 1).

    ``stats_cols`` are the columns whose per-file envelopes the manifest
    tracks — the merge keys and any pruning columns."""
    os.makedirs(path, exist_ok=True)
    if current_version(path) != 0:
        raise FileExistsError(f"snapshot table already exists at {path!r}")
    files = _write_data_files(spark, df, path, stats_cols)
    return _commit(path, files, stats_cols)


def snap_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table at a committed version (default: CURRENT).

    The returned plan holds the resolved version's exact file list, so
    it stays consistent even if commits land while it executes."""
    m = read_manifest(path, version)
    files = [os.path.join(path, f["name"]) for f in m["files"]]
    if not files:
        raise FileNotFoundError(f"snapshot v{m['version']} has no files")
    return spark.read.parquet(*files)


def _overlaps(entry: dict, lows: dict, highs: dict) -> bool:
    """Conservative file-level predicate: the file MAY hold an updated
    key iff for every key column its envelope intersects the batch's
    [min, max].  Missing stats -> must assume overlap."""
    for c, lo in lows.items():
        env = entry.get("stats", {}).get(c)
        if env is None or env["min"] is None or env["max"] is None:
            continue
        if env["max"] < lo or env["min"] > highs[c]:
            return False
    return True


def merge_upsert_cow(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
) -> dict:
    """File-level copy-on-write MERGE into a snapshot table.

    Rows in ``updates`` replace target rows with the same key; new keys
    are inserted.  Only files whose key envelope overlaps the batch are
    read and rewritten; all other files are carried by reference.  A
    batch with duplicate keys is rejected (MERGE's multiple-matches
    rule).  Partition/clustering migration cannot leave stale copies by
    construction: pruning is on KEY ranges, so every file that could
    hold an old copy of an updated key is rewritten.  Returns
    ``{"version", "rewritten", "carried", "added"}``.
    """
    m = read_manifest(path)
    stats_cols = m["stats_cols"]
    missing = [k for k in keys if k not in stats_cols]
    if missing:
        raise ValueError(
            f"merge keys {missing} not tracked in manifest stats_cols "
            f"{stats_cols}; re-init the table tracking them"
        )
    tgt_cols = snap_read(spark, path).columns
    if set(updates.columns) != set(tgt_cols):
        raise ValueError(
            f"merge_upsert_cow: batch columns {sorted(updates.columns)} != "
            f"table columns {sorted(tgt_cols)}; silent projection would "
            "mask typos and drop data"
        )
    dup = (
        updates.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"merge_upsert_cow: update batch has multiple rows for key "
            f"{tuple(dup[0][k] for k in keys)!r}; dedup the batch first"
        )
    bounds = updates.agg(
        *[F.min(k).alias(f"lo_{k}") for k in keys],
        *[F.max(k).alias(f"hi_{k}") for k in keys],
    ).collect()[0]
    lows = {k: _json_val(bounds[f"lo_{k}"]) for k in keys}
    highs = {k: _json_val(bounds[f"hi_{k}"]) for k in keys}

    overlapping = [f for f in m["files"] if _overlaps(f, lows, highs)]
    carried = [f for f in m["files"] if not _overlaps(f, lows, highs)]

    if overlapping:
        old = spark.read.parquet(
            *[os.path.join(path, f["name"]) for f in overlapping]
        )
        remaining = old.join(
            F.broadcast(updates.select(*keys).distinct()), keys, "left_anti"
        )
        out = remaining.unionByName(updates.select(*old.columns))
    else:
        tgt_cols = snap_read(spark, path).columns
        out = updates.select(*tgt_cols)
    # keep file count ≈ rewritten count: without this the union inherits
    # the shuffle partitioning and a 1-file rewrite fans out into dozens
    # of small files, compounding per merge (observed 21 for 1)
    out = out.coalesce(max(1, len(overlapping)))
    new_entries = _write_data_files(spark, out, path, stats_cols)
    version = _commit(path, carried + new_entries, stats_cols)
    return {
        "version": version,
        "rewritten": len(overlapping),
        "carried": len(carried),
        "added": len(new_entries),
    }


def apply_cdc_cow(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    keys: list[str],
    op_col: str = "_op",
) -> dict:
    """Apply one CDC batch (rows tagged I/U/D in ``op_col``) to a
    snapshot table with file-level copy-on-write.

    The change-data-capture ingest shape (Debezium/DMS feeds): upserts
    (I and U are the same idempotent operation against a keyed table)
    replace matching rows, D removes them.  One commit per batch — a
    reader sees the whole batch or none of it.  File pruning, envelope
    maintenance, and the duplicate-key rejection are shared with
    ``merge_upsert_cow``; a key may appear with at most ONE op per
    batch (conflicting I+D for a key is the upstream's bug to resolve,
    not ours to guess).  Returns the merge stats plus ``deleted``/
    ``upserted`` row counts.
    """
    tgt_cols = snap_read(spark, path).columns
    if set(batch.columns) - {op_col} != set(tgt_cols):
        raise ValueError(
            f"apply_cdc_cow: batch columns {sorted(batch.columns)} (minus "
            f"{op_col!r}) != table columns {sorted(tgt_cols)}"
        )
    ops = [
        r[0]
        for r in batch.select(F.upper(F.col(op_col)).alias("o"))
        .distinct()
        .collect()
    ]
    bad = set(ops) - {"I", "U", "D"}
    if bad:
        raise ValueError(f"apply_cdc_cow: unknown op codes {sorted(bad)}")
    dup = (
        batch.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"apply_cdc_cow: batch has multiple ops for key "
            f"{tuple(dup[0][k] for k in keys)!r}; collapse the batch to "
            "its final per-key state first"
        )
    upserts = batch.filter(F.upper(F.col(op_col)).isin("I", "U")).drop(
        op_col
    )
    n_upserts = upserts.count()
    deletes = batch.filter(F.upper(F.col(op_col)) == "D").select(*keys)
    n_deletes = deletes.count()

    m = read_manifest(path)
    stats_cols = m["stats_cols"]
    all_keys = batch.select(*keys).distinct()
    bounds = all_keys.agg(
        *[F.min(k).alias(f"lo_{k}") for k in keys],
        *[F.max(k).alias(f"hi_{k}") for k in keys],
    ).collect()[0]
    lows = {k: _json_val(bounds[f"lo_{k}"]) for k in keys}
    highs = {k: _json_val(bounds[f"hi_{k}"]) for k in keys}
    overlapping = [f for f in m["files"] if _overlaps(f, lows, highs)]
    carried = [f for f in m["files"] if not _overlaps(f, lows, highs)]

    if overlapping:
        old = spark.read.parquet(
            *[os.path.join(path, f["name"]) for f in overlapping]
        )
        remaining = old.join(F.broadcast(all_keys), keys, "left_anti")
        out = remaining.unionByName(upserts.select(*old.columns))
    else:
        out = upserts.select(*snap_read(spark, path).columns)
    out = out.coalesce(max(1, len(overlapping)))  # see merge_upsert_cow
    new_entries = _write_data_files(spark, out, path, stats_cols)
    version = _commit(path, carried + new_entries, stats_cols)
    return {
        "version": version,
        "rewritten": len(overlapping),
        "carried": len(carried),
        "added": len(new_entries),
        "upserted": n_upserts,
        "deleted": n_deletes,
    }


def optimize_snapshot(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    zorder: tuple[str, str] | None = None,
    equidepth: bool = False,
) -> dict:
    """OPTIMIZE for snapshot tables: compaction (and optionally Z-order
    re-clustering) as one copy-on-write manifest commit.

    Without ``zorder``: bin-packs only the files smaller than
    ``target_bytes`` into ~target-sized rewrites and carries full-sized
    files by reference — the Delta ``OPTIMIZE`` shape, fixing the
    small-file accretion of streaming/merge writers without touching
    healthy files.  With ``zorder``: rewrites the WHOLE table through
    ``layout.zorder_frame`` (clustered layout is a global property), so
    subsequent ``merge_upsert_cow`` batches overlap fewer files — the
    clustering is precisely what keeps CoW merge cost small.  Readers
    racing the optimize keep their resolved version (same isolation as
    every commit); old files survive until ``expire_snapshots``.

    Returns ``{"version", "rewritten", "carried", "added"}``
    (version is unchanged and no commit happens if nothing qualifies).
    """
    from .layout import zorder_frame

    m = read_manifest(path)
    stats_cols = m["stats_cols"]
    if zorder is not None:
        to_rewrite = list(m["files"])
        carried: list[dict] = []
    else:
        sizes = {
            f["name"]: os.path.getsize(os.path.join(path, f["name"]))
            for f in m["files"]
        }
        to_rewrite = [f for f in m["files"] if sizes[f["name"]] < target_bytes]
        carried = [f for f in m["files"] if sizes[f["name"]] >= target_bytes]
        if len(to_rewrite) < 2:
            return {
                "version": m["version"],
                "rewritten": 0,
                "carried": len(m["files"]),
                "added": 0,
            }
    df = spark.read.parquet(
        *[os.path.join(path, f["name"]) for f in to_rewrite]
    )
    if zorder is not None:
        total = sum(
            os.path.getsize(os.path.join(path, f["name"]))
            for f in to_rewrite
        )
        n_files = max(1, -(-total // target_bytes))  # ceil
        out = zorder_frame(df, zorder, n_files, equidepth)
    else:
        total = sum(sizes[f["name"]] for f in to_rewrite)
        out = df.coalesce(max(1, -(-total // target_bytes)))
    new_entries = _write_data_files(spark, out, path, stats_cols)
    version = _commit(path, carried + new_entries, stats_cols)
    return {
        "version": version,
        "rewritten": len(to_rewrite),
        "carried": len(carried),
        "added": len(new_entries),
    }


def verify_snapshot(path: str, version: int | None = None) -> dict:
    """fsck for a snapshot version: every manifest entry must exist on
    disk with a readable footer whose row count matches the manifest.

    Footer-only (no data pages) — O(files) driver work, the same cost
    class as commit.  Returns ``{"version", "files", "rows", "missing",
    "mismatched"}``; a non-empty ``missing``/``mismatched`` means the
    table dir was mutated outside the commit protocol (or a GC raced a
    pinned reader past its ``keep_last``)."""
    import pyarrow.parquet as pq

    m = read_manifest(path, version)
    missing: list[str] = []
    mismatched: list[dict] = []
    total_rows = 0
    for f in m["files"]:
        full = os.path.join(path, f["name"])
        if not os.path.exists(full):
            missing.append(f["name"])
            continue
        try:
            actual = pq.ParquetFile(full).metadata.num_rows
        except Exception as e:  # corrupt footer
            mismatched.append({"file": f["name"], "error": str(e)})
            continue
        if actual != f["rows"]:
            mismatched.append(
                {"file": f["name"], "manifest": f["rows"], "actual": actual}
            )
        total_rows += actual
    return {
        "version": m["version"],
        "files": len(m["files"]),
        "rows": total_rows,
        "missing": missing,
        "mismatched": mismatched,
    }


def expire_snapshots(path: str, keep_last: int = 1) -> list[str]:
    """Delete data files referenced only by expired versions (and the
    expired manifests).  Keeps the most recent ``keep_last`` versions;
    also removes orphaned ``data-*`` files from crashed writers.
    Returns the deleted file names."""
    cur = current_version(path)
    if cur == 0:
        return []
    keep_versions = set(range(max(1, cur - keep_last + 1), cur + 1))
    live: set[str] = set()
    for v in keep_versions:
        live.update(f["name"] for f in read_manifest(path, v)["files"])
    deleted = []
    for f in os.listdir(path):
        if f.startswith("data-") and f.endswith(".parquet") and f not in live:
            os.remove(os.path.join(path, f))
            deleted.append(f)
    for f in os.listdir(os.path.join(path, _MANIFEST_DIR)):
        if f.startswith("v") and f.endswith(".json"):
            v = int(f[1:-5])
            if v not in keep_versions:
                os.remove(os.path.join(path, _MANIFEST_DIR, f))
                deleted.append(f)
    return deleted
