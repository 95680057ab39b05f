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
   atomically-swapped ``CURRENT`` pointer, so a reader that has resolved
   a version keeps a consistent file list no matter how many commits
   land after it.  Old versions stay readable (time travel) until
   ``expire_snapshots``.

2. **Merge granularity.**  The partition-level MERGE rewrites whole
   partitions — a hot day-partition of a 100 TB table is terabytes, so
   merge cost is partition size, not update size.  ``merge_upsert_cow``
   rewrites only the FILES whose key statistics overlap the update
   batch: per-file envelopes AND per-row-group ranges come from parquet
   FOOTERS at commit time (no data scan) and live in the manifest, so
   locating affected files is a driver-side check against the manifest,
   exactly Delta/Iceberg's data-skipping design.  For bounded batches
   the batch's actual KEY SET is probed against the per-row-group
   ranges, so a sparse batch touching the min and max of the keyspace
   rewrites only the files that really hold those keys — not everything
   inside one global bounding box.  Range checks still degrade on an
   UNCLUSTERED table (every file's range spans the whole domain), so
   each new data file also gets per-key-column BLOOM FILTERS (sidecar
   ``bloom-*.json``, manifest-referenced — the Delta bloom-index /
   Iceberg parquet-bloom design): point batches and ``=``/``in`` scans
   prune by membership regardless of layout, with false positives
   costing only a spurious rewrite and false negatives impossible for
   tracked values.  Untouched files are carried into the
   new manifest BY REFERENCE — never read, never rewritten (the mtime
   test asserts byte-identical files).  The reference's analogue is
   reduce consuming only its own bucket's files
   (/root/reference/src/worker.h:81-119): work bounded by the relevant
   slice, not the table.

**Concurrency protocol** (the Delta optimistic-concurrency rule): every
mutator records the manifest version it READ, and commits version
``base+1`` with a create-exclusive manifest write.  Two writers that
both read v1 cannot both claim v2 — the loser gets ``CommitConflict``,
re-reads the winner's manifest, and re-derives its change from the new
state (bounded retries).  A writer can therefore never publish a
manifest derived from a stale file list, and GC can never break an
in-flight writer: a writer whose base version was expired loses its
commit race by construction.

**Idempotent ingest**: a commit may carry a ``(txn_app, txn_batch)``
marker; the manifest folds these into a ``txns`` map carried forward by
every subsequent commit (Delta's ``txnAppId``/``txnVersion``).  A
replayed micro-batch whose marker is already recorded is skipped, so a
crashed-and-restarted streaming CDC ingest cannot double-apply a batch
or duplicate the version audit trail.

**Merge-on-read deletes (deletion vectors)**: copy-on-write turns a
1-row delete in a 1 GB file into a 1 GB rewrite, so
``delete_where_mor``/``delete_keys_mor`` instead record the matched
rows' PHYSICAL POSITIONS (the parquet reader's ``_metadata.row_index``
— stable because data files are immutable) in a ``dv-*.parquet``
sidecar of ``(file_name, pos)`` and point the affected manifest entries
at it.  Write cost is O(matched positions); readers anti-join only the
DV'd files against their (broadcast) position sets; clean files keep
the plain pruned scan.  Positions only accumulate — a re-delete of a
dead row is a no-op, a file whose every row dies leaves the manifest —
and the debt is paid at compaction: any rewrite of a DV'd file
(``merge_upsert_cow``, ``apply_cdc_cow``, ``optimize_snapshot``) reads
through the vector and drops it; ``auto_compact`` fires on a masked-row
fraction threshold.  ``table_changes`` treats a DV change as a logical
rewrite of the file (same diff machinery), so MoR deletes surface in
the change feed as ordinary ``delete`` rows.

**Schema** is recorded in every manifest.  Batches must match the table
schema by (name, type) — same-name/different-type columns are rejected,
never silently cast.  With ``allow_schema_evolution=True`` a batch may
ADD columns: carried files are null-backfilled at read time by handing
the parquet reader the manifest's schema explicitly (no ``mergeSchema``
footer sweep), and old versions keep reading their own recorded schema.

**Portability**: all commit-protocol file ops route through a
``SnapshotFS`` seam (local POSIX implementation below).  On an object
store, ``create_exclusive`` maps to a conditional PUT (If-None-Match),
``replace_atomic`` for CURRENT maps to a conditional PUT with the read
version's ETag, and staging renames become direct writes to final
names; nothing else in the protocol assumes rename semantics.

At 100 TB: the manifest is O(files + row groups) driver state — the
same scaling contract as Delta's JSON log segments (checkpointable if
it ever grows past memory); commits are one pointer swap; merge cost is
O(overlapping files + batch), and clustering the table on the merge key
(``zorder_write``/sorted writes) is what keeps the overlap small.
"""

from __future__ import annotations

import decimal
import json
import os
import shutil
import time
import uuid
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_MANIFEST_DIR = "_manifests"
# shallow-clone markers INSIDE the source table dir (``snap_clone``):
# the source's GC discovers its clones here with no global catalog
_CLONES_DIR = "_clones"
# named refs (sources/refs.py): immutable tags live as files under
# ``_refs/``; writable branches are full tables under ``_branches/``
_REFS_DIR = "_refs"
_BRANCHES_DIR = "_branches"

# retries for a mutator that loses the commit race (each retry re-reads
# the winner's manifest and re-derives the change from current state)
COMMIT_RETRIES = 5

# largest update batch whose distinct key set is collected for exact
# per-row-group membership pruning; larger batches fall back to the
# conservative bounding-box check.  100k single-column keys ≈ a few MB
# of driver memory — the same order as the manifest itself.
KEY_PROBE_CAP = 100_000


class CommitConflict(FileExistsError):
    """Another writer committed the version this writer tried to claim.

    Subclasses ``FileExistsError`` because that is exactly what the
    local create-exclusive manifest write raises; callers (and the
    built-in mutators) re-read CURRENT and retry against the new base.
    """


class UnsupportedTableFeature(RuntimeError):
    """The table requires a protocol feature this build does not know.

    The Delta table-features model: a manifest names the capabilities a
    client MUST implement to read (``features``) or mutate
    (``writer_features``) the table correctly — e.g. a reader that
    ignores ``column_mapping`` returns all-NULL renamed columns, one
    that ignores ``deletion_vectors`` resurrects deleted rows, a writer
    that ignores ``check_constraints`` commits violating rows.  Rather
    than corrupt silently, an older build refuses loudly and names the
    missing feature."""


# Reader-required features this build implements.  ``features`` in a
# manifest outside this set makes the table unreadable here; outside
# SUPPORTED_WRITER_FEATURES (a superset: writers must also satisfy
# every reader feature) it is readable but immutable.  Feature flags
# are attached by ``_commit`` the first time a capability is used and
# deletion_vectors stays sticky (exact presence would cost O(table)).
SUPPORTED_READER_FEATURES = frozenset(
    {"column_mapping", "deletion_vectors"}
)
SUPPORTED_WRITER_FEATURES = SUPPORTED_READER_FEATURES | frozenset(
    {
        "check_constraints",
        "partition_spec",
        "column_defaults",
        "row_tracking",
        "clustering",
        "generated_columns",
        "identity_columns",
    }
)


def _check_reader_features(m: dict, path: str) -> None:
    unknown = set(m.get("features") or ()) - SUPPORTED_READER_FEATURES
    if unknown:
        raise UnsupportedTableFeature(
            f"table {path!r} (v{m.get('version')}) requires reader "
            f"feature(s) {sorted(unknown)} this build does not "
            "implement; reading it would return wrong rows — upgrade "
            "the library"
        )


def _check_writer_features(m: dict, path: str) -> None:
    unknown = (
        set(m.get("features") or ())
        | set(m.get("writer_features") or ())
    ) - SUPPORTED_WRITER_FEATURES
    if unknown:
        raise UnsupportedTableFeature(
            f"table {path!r} (v{m.get('version')}) requires writer "
            f"feature(s) {sorted(unknown)} this build does not "
            "implement; committing would break the table's invariants "
            "— upgrade the library"
        )


class ConstraintViolation(ValueError):
    """A write batch contains rows that fail a table CHECK constraint.

    Raised BEFORE the commit — a constrained table never becomes
    visible in a violating state (the Delta `delta.constraints.*`
    contract).  Carries the constraint name, its expression, and a
    small sample of violating rows for the error message."""


class LocalSnapshotFS:
    """POSIX implementation of the commit-protocol file operations.

    The snapshot layer's entire isolation story reduces to three
    primitives, each with a documented object-store mapping:

    - ``create_exclusive(path, text)`` — manifest claim.  Local: open
      mode ``'x'``.  Object store: conditional PUT (If-None-Match: *).
    - ``replace_atomic(src, dst)`` — CURRENT pointer swap.  Local:
      ``os.replace``.  Object store: conditional PUT of the pointer
      object keyed on the ETag read with the base version.
    - ``rename(src, dst)`` — staging publish of immutable data files.
      Local: ``os.rename``.  Object store: not needed — write data
      files directly under their final unique names (they are invisible
      until a manifest references them).
    """

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def makedirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def listdir(self, p: str) -> list[str]:
        return os.listdir(p)

    def remove(self, p: str) -> None:
        os.remove(p)

    def rmtree(self, p: str) -> None:
        shutil.rmtree(p)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def read_text(self, p: str) -> str:
        with open(p) as fh:
            return fh.read()

    def create_exclusive(self, p: str, text: str) -> None:
        """Create ``p`` with ``text`` iff it does not exist; raise
        ``CommitConflict`` if it does."""
        try:
            with open(p, "x") as fh:
                fh.write(text)
        except FileExistsError as e:
            raise CommitConflict(str(e)) from e

    def replace_atomic(self, p: str, text: str) -> None:
        """Atomically replace ``p``'s content with ``text``."""
        tmp = f"{p}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, p)

    def getsize(self, p: str) -> int:
        return os.path.getsize(p)

    def getmtime(self, p: str) -> float:
        return os.path.getmtime(p)


class ObjectStoreFS(LocalSnapshotFS):
    """Object-store-semantics backend (the S3/GCS/ABFS model), backed
    by the local filesystem so Spark and pyarrow can still read the
    data bytes in tests.  It restricts itself to the ONLY guarantees
    the commit protocol may rely on against a real object store:

    - ``create_exclusive`` is a **conditional PUT** (If-None-Match: *):
      the object body is fully staged first, then committed atomically
      iff the key does not exist — emulated with ``os.link``, whose
      EEXIST failure is exactly the conditional PUT's 412.  Losers get
      ``CommitConflict``; there is no create-then-write window.
    - ``replace_atomic`` is a **whole-object last-writer-wins PUT**
      (readers see the old or the new object, never a mix — the one
      atomicity every store gives).  Safe for CURRENT because the
      protocol orders pointer swaps through manifest claims: a writer
      can only claim ``base+1`` after reading base THROUGH CURRENT, so
      a stale pointer PUT can never be in flight once a later version
      has been claimed.
    - ``rename`` is **copy + delete** — object stores have no rename.
      Safe because the protocol only renames uniquely-named files that
      are invisible until a manifest references them (a crash mid-copy
      leaves an unreferenced orphan for ``expire_snapshots``).

    Data-file BYTES (Spark parquet writes, pyarrow footer/page reads)
    do not go through this seam: on a real object store they ride the
    Hadoop / pyarrow object-store connectors.  The seam owns the commit
    PROTOCOL — manifests, CURRENT, sidecar publishes, staging — which
    is the part whose semantics actually differ between POSIX and a
    conditional-PUT store."""

    def rename(self, src: str, dst: str) -> None:
        shutil.copyfile(src, dst)
        os.remove(src)

    def create_exclusive(self, p: str, text: str) -> None:
        tmp = f"{p}.upload-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(text)
        try:
            os.link(tmp, p)
        except FileExistsError as e:
            raise CommitConflict(str(e)) from e
        finally:
            os.remove(tmp)


_FS = LocalSnapshotFS()
# process-default FS, swappable for test parameterization / deployment
# (callers can still pass ``fs=`` per call, which always wins)
_DEFAULT_FS: LocalSnapshotFS | None = None


def set_default_fs(fs: LocalSnapshotFS | None) -> LocalSnapshotFS | None:
    """Set the process-default ``SnapshotFS`` used when a call passes
    ``fs=None``; returns the previous default (restore it when done)."""
    global _DEFAULT_FS
    prev = _DEFAULT_FS
    _DEFAULT_FS = fs
    return prev


def _fs(fs: LocalSnapshotFS | None) -> LocalSnapshotFS:
    if fs is not None:
        return fs
    return _DEFAULT_FS if _DEFAULT_FS is not None else _FS


def load_fs(spec: str | None) -> LocalSnapshotFS:
    """Build a ``SnapshotFS`` from an importable ``module:Class`` spec
    (the string form the streaming source's ``fsImpl`` option takes —
    data source readers/writers run in separate Python workers, so a
    live FS object cannot be handed to them)."""
    if not spec:
        return _fs(None)
    import importlib

    mod, _, cls = spec.partition(":")
    if not cls:
        raise ValueError(
            f"bad fsImpl {spec!r}: expected 'module.path:ClassName'"
        )
    return getattr(importlib.import_module(mod), cls)()


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version}.json")


def _current_path(path: str) -> str:
    return os.path.join(path, _MANIFEST_DIR, "CURRENT")


def _entry_path(path: str, e: dict) -> str:
    """Resolve a manifest entry's data file.  Entries born in this
    table resolve against the table dir; entries referenced by a
    SHALLOW CLONE carry ``"base"`` — the dir of the table that owns
    the bytes (``snap_clone``) — and resolve there, zero-copy."""
    return os.path.join(e.get("base") or path, e["name"])


def _sidecar_path(path: str, e: dict, name: str) -> str:
    """Resolve a BLOOM sidecar file recorded on entry ``e`` — blooms
    are built only when the data file is born, so they always live
    where the entry's data file lives."""
    return os.path.join(e.get("base") or path, name)


def _dv_path(path: str, e: dict) -> str:
    """Resolve entry ``e``'s deletion-vector sidecar.  Unlike blooms,
    a DV is written by the table that RECORDS the delete — which for
    a BORROWED entry (shallow clone / branch) is not the dir that
    owns the data bytes — so ``_delete_mor`` stamps the dv record
    with its own ``"base"`` whenever the two dirs differ.  A dv
    without a base lives with the data file (the common case)."""
    dv = e["dv"]
    return os.path.join(
        dv.get("base") or e.get("base") or path, dv["file"]
    )


# --------------------------------------------------------------------------
# Manifest scale: delta commits + compacted checkpoints
# --------------------------------------------------------------------------
# A commit record (``v{N}.json``) stores only the commit's CHANGE —
# ``adds`` (new or rewritten entries, full manifest entries) and
# ``removes`` (names no longer live, or rewritten in place) — plus the
# per-version table metadata (schema, txns, constraints, commit_info).
# Full table state is reconstructed by replaying deltas forward from the
# nearest compacted checkpoint (``checkpoint-v{N}.json``, written every
# ``CHECKPOINT_INTERVAL`` commits and discovered through the
# ``_last_checkpoint`` pointer — the Delta `_last_checkpoint` shape).
# Why: with one full JSON listing per version, a 10⁶-file table parses
# a multi-GB string on the driver for EVERY read and commit; with
# deltas the steady-state cost is O(changed files + one cached base).
# Version files with a ``files`` key (the pre-delta format) still read
# as self-contained full states, so old tables stay readable.

CHECKPOINT_INTERVAL = 16

# tables past this many entries write MULTI-PART checkpoints (the
# Delta multi-part checkpoint shape): each part serializes and lands
# as its own bounded JSON file, and the pointer record
# ``checkpoint-v{N}.json`` — written LAST, create-exclusive — names
# the part count, so a checkpoint "exists" only when every part does
# (readers and GC key on the pointer file alone).  Why: a single-blob
# checkpoint at 10^6 entries is a 233 MB / 4.3 s serialized string on
# the driver every 16 commits; parts bound the per-write memory and
# let an interrupted writer leave no half-visible checkpoint.
CHECKPOINT_SHARD_ENTRIES = 50_000

_LAST_CKPT = "_last_checkpoint"


def _ckpt_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"checkpoint-v{version}.json")


def _ckpt_part_path(path: str, version: int, i: int, of: int) -> str:
    return os.path.join(
        path,
        _MANIFEST_DIR,
        f"checkpoint-v{version}.part-{i:05d}-of-{of:05d}.json",
    )


def _load_checkpoint(
    f: LocalSnapshotFS, path: str, version: int
) -> list[dict]:
    """Full file list of a checkpoint — single-file or multi-part.
    A missing part is real corruption (the pointer is only written
    after every part): fail loudly, never silently under-list."""
    raw = json.loads(f.read_text(_ckpt_path(path, version)))
    if "files" in raw:
        return raw["files"]
    files: list[dict] = []
    of = int(raw["parts"])
    for i in range(of):
        part = json.loads(
            f.read_text(_ckpt_part_path(path, version, i, of))
        )
        files.extend(part["files"])
    return files


def _last_ckpt_path(path: str) -> str:
    return os.path.join(path, _MANIFEST_DIR, _LAST_CKPT)


# per-process reconstruction cache: (path, version, commit uid) of the
# immutable commit record -> reconstructed full file list.  Every
# delta-format commit record carries a random ``uid`` stamped at write
# time, so a table dir deleted and re-created at the same path can
# never serve a stale reconstruction (a (mtime, size) stat pair could
# collide under 1s-granularity filesystems when record sizes match —
# a wrong file list with no error).  Records predating the uid fall
# back to the stat pair.  Entries are shared, never mutated (every
# mutator builds new entry dicts); the outer list is copied on every
# read_manifest return.
_RECON_CACHE: dict = {}
_RECON_CACHE_MAX = 32


def _recon_key(
    f: LocalSnapshotFS, path: str, version: int, raw: dict | None = None
):
    uid = (raw or {}).get("uid")
    if uid:
        return (path, version, uid)
    mp = _manifest_path(path, version)
    try:
        return (path, version, f.getmtime(mp), f.getsize(mp))
    except OSError:
        return None


def _recon_put(key, files: list[dict]) -> None:
    if key is None:
        return
    if len(_RECON_CACHE) >= _RECON_CACHE_MAX:
        _RECON_CACHE.pop(next(iter(_RECON_CACHE)))
    _RECON_CACHE[key] = files


def _find_checkpoint(f: LocalSnapshotFS, path: str, version: int) -> int:
    """Largest checkpoint version ``<= version``, 0 if none.  Fast path
    is the ``_last_checkpoint`` pointer; time travel below it falls back
    to a directory scan (rare — only reads of pre-checkpoint history)."""
    lp = _last_ckpt_path(path)
    if f.exists(lp):
        try:
            c = int(f.read_text(lp).strip())
        except ValueError:
            c = 0
        if 0 < c <= version and f.exists(_ckpt_path(path, c)):
            return c
    best = 0
    try:
        names = f.listdir(os.path.join(path, _MANIFEST_DIR))
    except (FileNotFoundError, OSError):
        return 0
    for n in names:
        if n.startswith("checkpoint-v") and n.endswith(".json"):
            try:
                v = int(n[len("checkpoint-v"):-5])
            except ValueError:
                continue
            if v <= version:
                best = max(best, v)
    return best


def _replay_delta(by_name: dict, raw: dict) -> dict:
    """Apply one commit record to a name->entry state dict."""
    if "files" in raw:  # full-format record: self-contained state
        return {e["name"]: e for e in raw["files"]}
    for n in raw.get("removes") or ():
        by_name.pop(n, None)
    for e in raw.get("adds") or ():
        by_name[e["name"]] = e
    return by_name


def _reconstruct_files(
    f: LocalSnapshotFS, path: str, version: int, raw: dict
) -> list[dict]:
    """Full file list at ``version``, whose already-parsed commit record
    is ``raw``.  Starts from the nearest of (a) a cached reconstruction,
    (b) a compacted checkpoint, and replays the delta chain forward —
    O(deltas since checkpoint) reads, not O(history)."""
    key = _recon_key(f, path, version, raw)
    hit = _RECON_CACHE.get(key) if key else None
    if hit is not None:
        return hit
    if "files" in raw:  # pre-delta full manifest
        _recon_put(key, raw["files"])
        return raw["files"]
    start = _find_checkpoint(f, path, version)
    files: list[dict] = []
    if start:
        files = _load_checkpoint(f, path, start)
    # a cached neighbor below ``version`` beats the checkpoint; the
    # probe parses each candidate record to key on its uid (records the
    # forward replay would read anyway — ``parsed`` hands them over)
    parsed: dict[int, dict] = {}
    for v in range(version - 1, start, -1):
        try:
            rv = json.loads(f.read_text(_manifest_path(path, v)))
        except (FileNotFoundError, OSError):
            break
        parsed[v] = rv
        k = _recon_key(f, path, v, rv)
        cached = _RECON_CACHE.get(k) if k else None
        if cached is not None:
            files, start = cached, v
            break
    by_name = {e["name"]: e for e in files}
    for v in range(start + 1, version + 1):
        if v == version:
            rv = raw
        elif v in parsed:
            rv = parsed[v]
        else:
            rv = json.loads(f.read_text(_manifest_path(path, v)))
        by_name = _replay_delta(by_name, rv)
    out = list(by_name.values())
    _recon_put(key, out)
    return out


# consecutive interval-checkpoint write failures per table path — a
# PERSISTENTLY failing checkpoint writer degrades every future cold
# read to full-history replay, so repeated failures must not be silent
_CKPT_FAILURES: dict[str, int] = {}


def _maybe_checkpoint(
    f: LocalSnapshotFS,
    path: str,
    version: int,
    files: list[dict],
    force: bool = False,
) -> bool:
    """Write a compacted checkpoint of ``files`` at ``version`` (every
    ``CHECKPOINT_INTERVAL`` commits, or forced by GC at the retention
    boundary).  Returns True when the checkpoint file exists on exit.

    The interval path is best-effort — the commit already succeeded,
    and ONE missed checkpoint only lengthens the next cold replay —
    but never silent: consecutive failures per table are counted and
    warned, because a persistently failing writer (ENOSPC, broken
    object-store creds) would otherwise degrade every cold read to a
    full-history replay with zero signal.  With ``force=True`` (the GC
    retention floor) a failed checkpoint write PROPAGATES: deleting
    the delta chain below a floor whose checkpoint never landed would
    make every retained version unreconstructable."""
    if not force and version % CHECKPOINT_INTERVAL != 0:
        return False
    cp = _ckpt_path(path, version)
    try:
        if not f.exists(cp):
            if len(files) > CHECKPOINT_SHARD_ENTRIES:
                # multi-part: deterministic name order, so two racing
                # checkpointers of the same (immutable) version write
                # BYTE-IDENTICAL parts and can safely share them
                ordered = sorted(files, key=lambda e: e["name"])
                of = -(-len(ordered) // CHECKPOINT_SHARD_ENTRIES)
                for i in range(of):
                    pp = _ckpt_part_path(path, version, i, of)
                    if f.exists(pp):
                        continue
                    try:
                        f.create_exclusive(
                            pp,
                            json.dumps(
                                {
                                    "version": version,
                                    "part": i,
                                    "of": of,
                                    "files": ordered[
                                        i
                                        * CHECKPOINT_SHARD_ENTRIES:(i + 1)
                                        * CHECKPOINT_SHARD_ENTRIES
                                    ],
                                }
                            ),
                        )
                    except CommitConflict:
                        pass  # a racing writer's identical part
                record = {"version": version, "parts": of}
            else:
                record = {"version": version, "files": files}
            try:
                # the pointer lands LAST: the checkpoint exists only
                # when every part does
                f.create_exclusive(cp, json.dumps(record))
            except CommitConflict:
                pass  # a racing writer completed the same checkpoint
        _CKPT_FAILURES.pop(path, None)
    except Exception as e:
        if force:
            raise
        n = _CKPT_FAILURES.get(path, 0) + 1
        _CKPT_FAILURES[path] = n
        warnings.warn(
            f"snapshot checkpoint write failed at {cp!r} "
            f"({n} consecutive failure(s) for this table): {e!r}; cold "
            "reads replay the full delta chain until one succeeds",
            RuntimeWarning,
            stacklevel=2,
        )
        return False
    # pointer update stays best-effort even when forced: the checkpoint
    # exists, and _find_checkpoint falls back to a directory scan
    try:
        lp = _last_ckpt_path(path)
        last = 0
        if f.exists(lp):
            try:
                last = int(f.read_text(lp).strip())
            except ValueError:
                last = 0
        if version > last:
            f.replace_atomic(lp, str(version))
    except Exception:
        pass
    return True


def _json_val(v):
    """Normalize a stats/pruning value for JSON + cross-type compare:
    numbers (incl. ``Decimal`` — which would otherwise stringify and
    compare lexicographically, wrongly pruning e.g. '90.00' > '100.00')
    stay numbers; everything else (dates, strings) becomes its string
    form — ISO date strings compare correctly as strings."""
    if v is None or isinstance(v, (int, float)):
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    return str(v)


def _lt(a, b) -> bool | None:
    """Total-order compare for normalized stats values; ``None`` means
    the types are not comparable (mixed str/number after an engine or
    type change) — callers must treat that as "may overlap"."""
    try:
        return a < b
    except TypeError:
        return None


def _stat_minmax(st) -> tuple | None:
    """Normalized (min, max) from one column-chunk statistics object,
    or ``None`` when no usable stats exist (callers then assume the
    chunk may overlap anything — conservative, never wrong).

    Spark writes decimal(p<=18) as INT64 with a Decimal logical type,
    which pyarrow's logical accessor refuses ("Cannot extract
    statistics") — the RAW scaled integers are still in the footer, so
    decode them with the logical type's scale.  Stringified decimals
    are never used: they compare lexicographically ('90.00' > '100.00')
    and would wrongly PRUNE files, leaving stale copies after a merge."""
    if st is None or not st.has_min_max:
        return None
    try:
        return _json_val(st.min), _json_val(st.max)
    except Exception:
        pass
    try:
        lt = json.loads(st.logical_type.to_json())
        if lt.get("Type") == "Decimal" and isinstance(st.min_raw, int):
            scale = 10 ** int(lt.get("scale", 0))
            return st.min_raw / scale, st.max_raw / scale
    except Exception:
        pass
    return None


# manifest string stats are truncated to this many chars (the Delta
# dataSkippingStringPrefixLength shape): a 500-char URL stats column
# would otherwise cost ~1 KB per (file, column) in the manifest — a
# GB of metadata at 1M files.  Parquet itself omits footer stats past
# ~1-2 KB values, so this governs exactly the 100-1000 char band where
# verbatim stats are stored but wasteful.
STR_STAT_MAX = 64


def _trunc_lo(v):
    """Truncate a string MIN to STR_STAT_MAX chars — a prefix of the
    min is still a valid lower bound."""
    if isinstance(v, str) and len(v) > STR_STAT_MAX:
        return v[:STR_STAT_MAX]
    return v


def _trunc_hi(v):
    """Truncate a string MAX to STR_STAT_MAX chars and round UP
    (``_next_prefix``) so it stays a valid upper bound; an
    unroundable all-U+10FFFF prefix keeps the full value."""
    if isinstance(v, str) and len(v) > STR_STAT_MAX:
        up = _next_prefix(v[:STR_STAT_MAX])
        return up if up is not None else v
    return v


def _file_stats(file_path: str, stats_cols: list[str]) -> dict:
    """Per-file min-max envelopes AND per-row-group ranges from the
    parquet FOOTER (row-group statistics) — no data pages are read.
    This is the scale-critical property: commit cost is O(files), not
    O(rows); the row-group ranges are what let a sparse batch's key set
    prune files its bounding box would spuriously overlap.  Long
    string stats are truncated to ``STR_STAT_MAX`` chars (min down,
    max up via ``_next_prefix``) — the envelope widens to a superset,
    so every pruning decision stays conservative."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(file_path)
    mins: dict = {}
    maxs: dict = {}
    rg_ranges: dict[str, list[list]] = {}
    nulls: dict[str, int] = {}
    null_unknown: set[str] = set()
    rows = pf.metadata.num_rows
    for rg in range(pf.metadata.num_row_groups):
        g = pf.metadata.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name not in stats_cols:
                continue
            # null counts accumulate independently of min/max (an
            # all-null row group has no envelope but a definite null
            # count); any row group without one marks the column
            # unknown — conservative, the file is then never
            # null-pruned
            st = col.statistics
            nc = getattr(st, "null_count", None) if st is not None else None
            if nc is None:
                null_unknown.add(name)
            else:
                nulls[name] = nulls.get(name, 0) + int(nc)
            mm = _stat_minmax(st)
            if mm is None:
                continue
            lo, hi = _trunc_lo(mm[0]), _trunc_hi(mm[1])
            rg_ranges.setdefault(name, []).append([lo, hi])
            if name not in mins or _lt(lo, mins[name]):
                mins[name] = lo
            if name not in maxs or _lt(maxs[name], hi):
                maxs[name] = hi
    envelopes = {
        c: {"min": mins[c], "max": maxs[c]} for c in mins if c in maxs
    }
    return {
        "rows": rows,
        "bytes": os.path.getsize(file_path),
        "stats": envelopes,
        "rg": rg_ranges,
        "nulls": {
            c: n for c, n in nulls.items() if c not in null_unknown
        },
    }


# --- per-file key bloom filters -------------------------------------
#
# Row-group ranges prune perfectly on a CLUSTERED table, but on an
# unclustered one every file's range spans roughly the whole key
# domain, so a point batch overlaps every file and CoW merge degrades
# to a full rewrite.  A per-(file, key-column) bloom filter answers
# "does this file contain key v?" with a bounded false-positive rate
# regardless of layout — the Delta bloom-index / Iceberg parquet-bloom
# design.  Blooms live in one JSON sidecar per commit (not in the
# manifest: at 100 TB the manifest must stay O(files) small and most
# operations never probe), loaded lazily and cached per operation.
# False positives cost only a spurious rewrite; false negatives are
# impossible for tracked values, so pruning stays conservative.

BLOOM_FPP = 0.01
# cap per-(file, column) filter size at 128 KiB of bits: ~1% FPP up to
# ~110k distinct values per file.  Beyond the cap the effective FPP
# degrades; past BLOOM_MIN_EFFECTIVE it stops pruning anything, so the
# filter is dropped rather than stored dead weight.
BLOOM_MAX_BITS = 1 << 20
_LN2 = 0.6931471805599453


def _bloom_hashes(value_bytes: bytes) -> tuple[int, int]:
    import hashlib

    d = hashlib.md5(value_bytes).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:16], "little") | 1  # odd: full-period probe
    return h1, h2


# --- integer fast path (sidecar "hv": 2) -----------------------------
#
# The md5-per-value build loop was the single largest DRIVER cost of a
# commit at bench scale (r15 profile: 300k md5 calls ≈ 2.5 s inside one
# matview_orders run, repeated for every snapshot-table query).  For
# INTEGER key columns the whole build vectorizes: two splitmix64-style
# mixes of the raw 64-bit value give (h1, h2), computed for the entire
# column in a handful of numpy ops.  Determinism across processes and
# sessions is arithmetic, not library state, so build and probe always
# agree.  Sidecars built this way carry ``"hv": 2`` per column filter;
# probes dispatch on it, and legacy sidecars (no ``hv``) keep the md5
# path forever — no rewrite, no compat break.

_MIX_K1 = 0x9E3779B97F4A7C15
_MIX_K2 = 0xBF58476D1CE4E5B9
_MIX_K3 = 0x94D049BB133111EB
_U64 = (1 << 64) - 1


def _mix64_int(v: int) -> int:
    """splitmix64 finalizer over a 64-bit lane (scalar probe twin of
    the vectorized build below — MUST stay bit-identical to it)."""
    z = (v + _MIX_K1) & _U64
    z = ((z ^ (z >> 30)) * _MIX_K2) & _U64
    z = ((z ^ (z >> 27)) * _MIX_K3) & _U64
    return z ^ (z >> 31)


def _bloom_hashes_int(v: int) -> tuple[int, int]:
    """(h1, h2) for an integer key under the hv2 scheme."""
    u = v & _U64
    h1 = _mix64_int(u)
    h2 = _mix64_int(u ^ _MIX_K1) | 1  # odd: full-period probe
    return h1, h2


def _bloom_build_int_np(values) -> dict | None:
    """Vectorized hv2 build over a DISTINCT, null-free numpy int array.
    Same m/k sizing and same bit layout (LSB-first within each byte) as
    the md5 loop; only the per-value hash differs, declared by ``hv``."""
    import base64
    import math

    import numpy as np

    n = int(values.size)
    if n == 0:
        return None
    m = min(int(math.ceil(-n * math.log(BLOOM_FPP) / (_LN2**2))), BLOOM_MAX_BITS)
    k = max(1, round(m / n * _LN2))
    if (1 - math.exp(-k * n / m)) ** k > 0.5:
        return None  # oversized column: filter would prune ~nothing
    u = values.astype(np.uint64, copy=False)

    def mix(z):
        z = (z + np.uint64(_MIX_K1))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_MIX_K2)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_MIX_K3)
        return z ^ (z >> np.uint64(31))

    with np.errstate(over="ignore"):
        h1 = mix(u)
        h2 = mix(u ^ np.uint64(_MIX_K1)) | np.uint64(1)
        idx = (
            h1[:, None]
            + np.arange(k, dtype=np.uint64)[None, :] * h2[:, None]
        ) % np.uint64(m)
    bitarr = np.zeros(m, dtype=bool)
    bitarr[idx.ravel()] = True
    bits = np.packbits(bitarr, bitorder="little").tobytes()
    return {
        "m": m,
        "k": k,
        "t": "i",
        "hv": 2,
        "bits": base64.b64encode(bits).decode("ascii"),
    }


def _bloom_key_bytes(v) -> bytes | None:
    """Canonical byte form of a key value for bloom hashing.  Only
    int-like and string values are bloom-tracked (the common key
    types); anything else returns ``None`` and the column simply has
    no bloom — range pruning still applies.  The same function runs on
    BOTH sides (pyarrow column values at build, collected Spark rows at
    probe), which is what makes hits reliable."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return b"i" + str(v).encode()
    if isinstance(v, str):
        return b"s" + v.encode()
    return None


# distinct-value count beyond which the capped filter's effective FPP
# would exceed ~50% anyway: skip building (and never materialize the
# values into Python) past it
_BLOOM_MAX_DISTINCT = 750_000


def _bloom_build(values) -> dict | None:
    """Build one bloom filter over a key column; returns ``{"m", "k",
    "bits"(base64)}`` or ``None`` when the column's type is
    untrackable or the capped filter would be useless.  ``values`` may
    be a pyarrow (Chunked)Array — deduplication then runs C++-side
    (``pc.unique``) and an over-cardinality column is rejected BEFORE
    any per-value Python materialization, so commit-time driver memory
    is bounded even for 100M-row files."""
    import base64
    import math

    try:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.types as pt

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            uniq = pc.unique(
                values.combine_chunks()
                if isinstance(values, pa.ChunkedArray)
                else values
            )
            if len(uniq) > _BLOOM_MAX_DISTINCT:
                return None
            if pt.is_integer(uniq.type) and not pt.is_boolean(uniq.type):
                # hv2 fast path: the entire build stays in numpy — no
                # per-value Python, no md5 (the measured driver hot
                # spot of every commit, see _bloom_build_int_np)
                return _bloom_build_int_np(
                    uniq.drop_null().to_numpy(zero_copy_only=False)
                )
            values = uniq.to_pylist()
    except ImportError:
        pass

    keys = set()
    tags = set()
    for v in values:
        b = _bloom_key_bytes(v)
        if b is None:
            if v is not None:
                return None  # untrackable type in this column
            continue
        keys.add(b)
        tags.add(b[:1].decode())
    n = len(keys)
    if n == 0:
        return None
    m = min(int(math.ceil(-n * math.log(BLOOM_FPP) / (_LN2**2))), BLOOM_MAX_BITS)
    k = max(1, round(m / n * _LN2))
    if (1 - math.exp(-k * n / m)) ** k > 0.5:
        return None  # oversized column: filter would prune ~nothing
    bits = bytearray((m + 7) // 8)
    for kb in keys:
        h1, h2 = _bloom_hashes(kb)
        for i in range(k):
            bit = (h1 + i * h2) % m
            bits[bit >> 3] |= 1 << (bit & 7)
    return {
        "m": m,
        "k": k,
        # the stored values' type tag ("i"/"s"): a probe value of a
        # DIFFERENT type must not trust the filter — Spark's row filter
        # applies implicit casts (int 5 matches string '5'), so a
        # typed-hash miss would be a false negative, not a proof
        "t": "".join(sorted(tags)),
        "bits": base64.b64encode(bytes(bits)).decode("ascii"),
    }


def _bloom_contains(bloom: dict, v) -> bool:
    """Membership probe; unknown-typed values — and values whose type
    differs from what the filter indexed (cross-type predicates go
    through Spark's implicit casts) — conservatively hit."""
    import base64

    kb = _bloom_key_bytes(v)
    if kb is None:
        return True
    if kb[:1].decode() not in bloom.get("t", "is"):
        return True
    if bloom.get("hv") not in (None, 2):
        # sidecar built with a hash scheme this reader does not know:
        # treat as "no filter" (conservative hit).  Falling through to
        # an older hash would probe the wrong bits and could FALSE-
        # NEGATIVE — silently skipping a rewrite — which violates the
        # module invariant that bloom misses are proofs of absence.
        return True
    bits = bloom.get("_raw")
    if bits is None:
        bits = base64.b64decode(bloom["bits"])
        bloom["_raw"] = bits  # decode once per loaded sidecar
    m, k = bloom["m"], bloom["k"]
    if bloom.get("hv") == 2 and not isinstance(v, bool) and isinstance(v, int):
        # hv2 sidecars hashed integers with the splitmix scheme; the
        # tag guard above already bounced non-int probes as
        # conservative hits, so reaching here with an int is the only
        # typed case an hv2 filter ever answers.  The probe combines
        # (h1 + i·h2) in WRAPPED 64-bit arithmetic — the build side is
        # numpy uint64, and an unwrapped Python-int sum would land on a
        # different bit whenever it crosses 2^64 (a false negative).
        h1, h2 = _bloom_hashes_int(v)
        for i in range(k):
            bit = ((h1 + i * h2) & _U64) % m
            if not (bits[bit >> 3] >> (bit & 7)) & 1:
                return False
        return True
    h1, h2 = _bloom_hashes(kb)
    for i in range(k):
        bit = (h1 + i * h2) % m
        if not (bits[bit >> 3] >> (bit & 7)) & 1:
            return False
    return True


def _bloom_loader(path: str, fs: LocalSnapshotFS | None):
    """Returns ``bloom_of(entry) -> {col: bloom}`` with per-operation
    sidecar caching (one JSON read per sidecar, not per file probe).
    Entries without a bloom ref — pre-bloom commits, untrackable
    columns — resolve to ``{}`` (no bloom pruning, always safe)."""
    f = _fs(fs)
    cache: dict[str, dict] = {}

    def bloom_of(entry: dict) -> dict:
        ref = entry.get("bloom")
        if not ref:
            return {}
        sidecar = ref["file"]
        if sidecar not in cache:
            try:
                cache[sidecar] = json.loads(
                    f.read_text(os.path.join(path, sidecar))
                )
            except FileNotFoundError:
                cache[sidecar] = {}
        return cache[sidecar].get(entry["name"], {})

    return bloom_of


def _build_bloom_sidecar(
    path: str,
    entries: list[dict],
    stats_cols: list[str],
    fs: LocalSnapshotFS | None,
) -> None:
    """Build per-(file, key-column) blooms for freshly written data
    files and attach one ``bloom-*.json`` sidecar reference to each
    entry.  Reads ONLY bloom-trackable stats columns of the new files
    (pyarrow, column-pruned), gated by metadata first: untrackable
    column types and files beyond the useful-cardinality cap are
    skipped without touching a data page, and carried files are never
    read.  This is driver-side work proportional to the rewritten
    slice's key columns — the same cost class Delta pays computing its
    file stats; a deployment writing multi-GB files should move the
    build into the writer tasks (the sidecar format doesn't care who
    computes it)."""
    import pyarrow.parquet as pq

    f = _fs(fs)
    sidecar: dict[str, dict] = {}
    for e in entries:
        cols: dict[str, dict] = {}
        full = _entry_path(path, e)
        try:
            pf = pq.ParquetFile(full)
        except Exception:
            continue
        # metadata-only gates BEFORE any data read: a file too big for
        # a useful capped filter, or a column whose arrow type is not
        # bloom-trackable, never pulls its pages into the driver
        if pf.metadata.num_rows > 4 * _BLOOM_MAX_DISTINCT:
            continue
        arrow_schema = pf.schema_arrow
        import pyarrow.types as pt

        trackable = [
            c
            for c in stats_cols
            if c in arrow_schema.names
            and (
                pt.is_integer(arrow_schema.field(c).type)
                or pt.is_string(arrow_schema.field(c).type)
                or pt.is_large_string(arrow_schema.field(c).type)
                or pt.is_dictionary(arrow_schema.field(c).type)
            )
        ]
        if not trackable:
            continue
        try:
            t = pf.read(columns=trackable)
        except Exception:
            continue
        for c in trackable:
            bloom = _bloom_build(t.column(c))
            if bloom is not None:
                cols[c] = bloom
        if cols:
            sidecar[e["name"]] = cols
    if not sidecar:
        return
    name = f"bloom-{uuid.uuid4().hex[:12]}.json"
    # plain write, not create_exclusive: the name is unique and the
    # sidecar is invisible until a manifest references it
    f.replace_atomic(os.path.join(path, name), json.dumps(sidecar))
    for e in entries:
        if e["name"] in sidecar:
            e["bloom"] = {
                "file": name,
                "cols": sorted(sidecar[e["name"]]),
            }


def _pspec(m: dict | None) -> list[dict]:
    """The manifest's partition spec (hidden partitioning — see
    ``sources/partition.py``), or ``[]``."""
    return (m or {}).get("partition_spec") or []


def _write_data_files(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    stats_cols: list[str],
    fs: LocalSnapshotFS | None = None,
    cm: dict | None = None,
    pspec: list[dict] | None = None,
    pcluster: bool = True,
    pnum: int | None = None,
) -> list[dict]:
    """Write ``df``'s rows as new immutable data files inside ``path``
    and return their manifest entries.  Files are written via a staging
    dir then renamed to unique names, so a crashed writer leaves only
    unreferenced orphans (removed by ``expire_snapshots`` after the
    orphan grace period), never a half-visible table state.

    ``df`` carries LOGICAL column names; under a column mapping the
    bytes land under the PHYSICAL names (``stats_cols`` are already
    physical — they key the footer stats and bloom sidecars).

    On a partitioned table (``pspec``) the batch additionally grows the
    derived partition-value columns, is clustered by the tuple
    (``pcluster=False`` keeps a caller-shaped layout — OPTIMIZE's
    Z-order must not be re-shuffled away; ``pnum`` pins the exchange
    width to a target file count), and the derived names join
    ``stats_cols`` for THIS write — footer envelopes, row-group
    ranges, and bloom sidecars then cover the partition values with no
    extra machinery (see ``sources/partition.py``)."""
    if cm:
        df = _to_physical(df, cm)
    if pspec:
        from .partition import with_partition_columns

        df = with_partition_columns(df, pspec, pcluster, pnum)
        stats_cols = list(stats_cols) + [s["name"] for s in pspec]
    f = _fs(fs)
    staging = os.path.join(path, f"_stage-{uuid.uuid4().hex[:12]}")
    df.write.mode("errorifexists").parquet(staging)
    entries = []
    prefix = uuid.uuid4().hex[:12]
    for name in sorted(f.listdir(staging)):
        if not (name.startswith("part-") and name.endswith(".parquet")):
            continue
        final = f"data-{prefix}-{name}"
        f.rename(os.path.join(staging, name), os.path.join(path, final))
        entry = {"name": final}
        entry.update(_file_stats(os.path.join(path, final), stats_cols))
        if not entry.get("rows"):
            # an over-partitioned write emits zero-row part files; a
            # manifested empty file is pure liability — a scheduler
            # task per read and, having no stats, it defeats every
            # pruning path (incl. conflict-rebase invisibility proofs)
            f.remove(os.path.join(path, final))
            continue
        entries.append(entry)
    f.rmtree(staging)
    _build_bloom_sidecar(path, entries, stats_cols, fs)
    return entries


def _commit(
    path: str,
    files: list[dict],
    stats_cols: list[str],
    base_version: int,
    schema_json: str | None = None,
    txns: dict | None = None,
    commit_info: dict | None = None,
    fs: LocalSnapshotFS | None = None,
    carry: dict | None = None,
    adds: list[dict] | None = None,
    removes: list[str] | None = None,
    keep_row_ids: bool = False,
) -> int:
    """Write manifest v(base+1) and atomically swap CURRENT to it.

    ``keep_row_ids=True`` (snap_restore): adds that already carry a
    ``row_id_base`` re-publish a COMMITTED assignment verbatim instead
    of drawing fresh ids — the watermark carried from CURRENT is
    monotone, so historical bases can never collide forward.

    ``base_version`` MUST be the version of the manifest the caller
    actually read to derive ``files`` — claiming the version with a
    create-exclusive write is what makes two racing writers safe: if
    another writer committed after the caller's read, the claim raises
    ``CommitConflict`` and the caller re-reads and re-derives (a commit
    can never silently discard a concurrent writer's changes).

    ``carry`` is the base manifest the caller read: table-level
    metadata that every commit must preserve (``constraints``) is
    copied forward from it, so a write path can never silently drop a
    CHECK constraint just because it rebuilt the manifest dict.

    ``adds``/``removes`` (pass BOTH) are the caller's explicit delta vs
    the base — every mutator knows exactly what it rewrote, so handing
    the sets over makes commit cost O(changed files) with NO in-memory
    diff of the full listing (the residual O(table) the manifest-scale
    block notes).  ``files`` must still be the complete post-commit
    list (it seeds the reconstruction cache and checkpoints); an entry
    rewritten in place (new dv/bloom) appears in BOTH lists.  Omitting
    them falls back to the base diff — correct for callers that only
    hold the full list."""
    f = _fs(fs)
    mdir = os.path.join(path, _MANIFEST_DIR)
    f.makedirs(mdir)
    version = base_version + 1
    # the commit record stores the DELTA vs the base the caller read,
    # not the full listing — see the manifest-scale block above.  A
    # rewritten entry (same name, new dv/bloom) appears in BOTH lists.
    if adds is None or removes is None:
        if base_version == 0:
            base_files: list[dict] = []
        elif carry is not None and "files" in carry:
            base_files = carry["files"]
        else:
            base_files = read_manifest(path, base_version, fs)["files"]
        base_by_name = {e["name"]: e for e in base_files}
        new_names = {e["name"] for e in files}
        removes = [n for n in base_by_name if n not in new_names]
        adds = []
        for e in files:
            b = base_by_name.get(e["name"])
            if b is None:
                adds.append(e)
            elif b != e:
                removes.append(e["name"])
                adds.append(e)
    manifest = {
        "version": version,
        # random commit identity: what makes the reconstruction cache
        # safe against same-path table re-creation (see _RECON_CACHE)
        "uid": uuid.uuid4().hex,
        # committer wall clock (epoch seconds): what timestamp time
        # travel resolves against (``version_at_timestamp`` — raw
        # stamps may be non-monotone under clock skew; resolution
        # adjusts, commit never rewrites history)
        "ts": time.time(),
        "stats_cols": stats_cols,
        "adds": adds,
        "removes": removes,
        "schema": schema_json,
        "txns": txns or {},
        "commit_info": commit_info or {},
    }
    if carry:
        _check_writer_features(carry, path)
        for k in (
            "constraints", "column_mapping", "partition_spec",
            "partition_field_seq", "clone_of", "defaults",
            "row_tracking", "clustering", "generated", "identity",
        ):
            if carry.get(k):
                manifest[k] = carry[k]
    # row tracking (the Delta row-ID model, fresh-assignment phase):
    # every NEW data file gets a ``row_id_base`` watermark slice; its
    # rows are implicitly numbered base..base+rows-1 (no physical
    # column at ingest).  Assignment is deliberately here, at the one
    # commit choke point: a retried/rebased commit re-assigns against
    # the fresh watermark (entries are re-based, never left stale).
    # An add whose NAME is also in ``removes`` is a rewrite-in-place
    # (a MoR deletion vector grew) — same bytes, ids preserved, its
    # carried base stays.  Entries marked ``row_id_col`` materialized
    # their ids as a physical column during a CoW rewrite (OPTIMIZE
    # preservation) and are never re-assigned.
    if manifest.get("row_tracking"):
        next_id = int((carry or {}).get("next_row_id") or 0)
        rewritten = set(removes)
        for e in adds:
            if keep_row_ids and "row_id_base" in e:
                continue  # committed base re-published (snap_restore)
            if e.get("row_id_col"):
                continue
            if e["name"] in rewritten and "row_id_base" in e:
                continue
            e["row_id_base"] = next_id
            next_id += int(e.get("rows") or 0)
        manifest["next_row_id"] = next_id
    # protocol feature flags (see UnsupportedTableFeature): exact for
    # capabilities visible in the outgoing manifest, sticky-from-base
    # for deletion_vectors (exact presence would cost O(table))
    feats = set((carry or {}).get("features") or ())
    if manifest.get("column_mapping"):
        feats.add("column_mapping")
    else:
        feats.discard("column_mapping")
    if any(e.get("dv") for e in adds):
        feats.add("deletion_vectors")
    wfeats = set((carry or {}).get("writer_features") or ())
    if manifest.get("constraints"):
        wfeats.add("check_constraints")
    else:
        wfeats.discard("check_constraints")
    # a committed partition spec must flag WRITERS (not readers): a
    # pre-partitioning build whose carry loop only copies constraints/
    # column_mapping would otherwise silently strip the spec from the
    # manifest, permanently unpartitioning the table (sources/
    # partition.py module docstring) — readers stay unflagged because
    # un-pruned scans of _sgp-less files are merely slower, never wrong
    if manifest.get("partition_spec"):
        wfeats.add("partition_spec")
    else:
        wfeats.discard("partition_spec")
    # declared column DEFAULTs are writer-only state for the same
    # reason as partition_spec: a build whose carry loop predates the
    # "defaults" key would strip the declaration on its next commit,
    # after which omitting appends fail loudly (or NULL-fill) instead
    # of filling the declared value — Delta gates this behind the
    # allowColumnDefaults writer feature for exactly this hazard.
    # Readers stay unflagged: defaults are applied at write time, so
    # committed rows are already materialized.
    if manifest.get("defaults"):
        wfeats.add("column_defaults")
    else:
        wfeats.discard("column_defaults")
    # row tracking is writer-only state too: a build that ignored the
    # watermark would assign colliding ids (or strip the flag), so
    # legacy writers must refuse; readers stay unflagged — a reader
    # that ignores row IDs just doesn't surface them.
    if manifest.get("row_tracking"):
        wfeats.add("row_tracking")
    else:
        wfeats.discard("row_tracking")
    # declared clustering (liquid-clustering declaration) is writer-only
    # state like defaults/partition_spec: a carry loop that predates the
    # "clustering" key would silently strip the declaration, after which
    # auto_compact/optimize stop maintaining the layout the user asked
    # for — legacy writers must refuse.  Readers stay unflagged: the
    # declaration only steers maintenance, never read correctness.
    if manifest.get("clustering"):
        wfeats.add("clustering")
    else:
        wfeats.discard("clustering")
    # generated columns (GENERATED ALWAYS AS expr) are writer-only
    # state with TWO failure modes for a legacy writer: its carry loop
    # strips the declaration, and its append path neither fills an
    # omitted column nor validates a supplied one — so it must refuse.
    # Readers stay unflagged: committed rows are already materialized.
    if manifest.get("generated"):
        wfeats.add("generated_columns")
    else:
        wfeats.discard("generated_columns")
    # identity columns are writer-only state with the hardest failure
    # mode of all: a legacy writer neither fills the column nor bumps
    # the high-water mark, so its next append would either fail the
    # schema check or (worse) duplicate surrogate keys — refuse.
    if manifest.get("identity"):
        wfeats.add("identity_columns")
    else:
        wfeats.discard("identity_columns")
    if feats:
        manifest["features"] = sorted(feats)
    if wfeats - feats:
        manifest["writer_features"] = sorted(wfeats - feats)
    f.create_exclusive(_manifest_path(path, version), json.dumps(manifest))
    f.replace_atomic(_current_path(path), str(version))
    # the committer already holds the full state: seed the cache so the
    # next read/commit replays zero deltas
    _recon_put((path, version, manifest["uid"]), list(files))
    _maybe_checkpoint(f, path, version, files)
    return version


def current_version(path: str, fs: LocalSnapshotFS | None = None) -> int:
    f = _fs(fs)
    cur = _current_path(path)
    if not f.exists(cur):
        return 0
    return int(f.read_text(cur).strip())


def read_manifest(
    path: str,
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    f = _fs(fs)
    v = current_version(path, fs) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no committed snapshot at {path!r}")
    mp = _manifest_path(path, v)
    if not f.exists(mp):
        raise FileNotFoundError(mp)
    raw = json.loads(f.read_text(mp))
    _check_reader_features(raw, path)
    if "files" in raw:  # pre-delta full manifest: already materialized
        return raw
    files = _reconstruct_files(f, path, v, raw)
    m = {k: val for k, val in raw.items() if k not in ("adds", "removes")}
    m["files"] = list(files)  # fresh outer list; entries are immutable
    return m


def table_features(
    path: str,
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Inspect a version's protocol feature flags WITHOUT requiring
    this build to support them (the one read path that skips the
    reader-feature check — so an old build can still tell a user WHAT
    its upgrade is missing).  Returns ``{"reader": [...], "writer":
    [...]}``; writer features listed are those beyond the reader set."""
    f = _fs(fs)
    v = current_version(path, fs) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no committed snapshot at {path!r}")
    raw = json.loads(f.read_text(_manifest_path(path, v)))
    return {
        "reader": sorted(raw.get("features") or ()),
        "writer": sorted(raw.get("writer_features") or ()),
    }


def _manifest_schema(m: dict) -> StructType | None:
    s = m.get("schema")
    return StructType.fromJson(json.loads(s)) if s else None


# --------------------------------------------------------------------------
# Column mapping (rename / drop / re-add evolution)
# --------------------------------------------------------------------------
# The manifest's optional ``column_mapping`` is
# ``{"map": {logical: physical}, "retired": [physical, ...]}``.
# Data files and per-file statistics are keyed by PHYSICAL names,
# frozen at first write; renames and drops are metadata-only commits
# that edit the per-version logical schema + mapping (the Delta
# column-mapping model).  Readers translate physical -> logical after
# the scan, writers logical -> physical before it, and stats/bloom
# probes translate predicate columns logical -> physical — so a rename
# rewrites ZERO data bytes at any table size and time travel reads
# each version under that version's own names.  ``retired`` records
# physical names freed by drops: re-adding the same logical name gets
# a fresh physical name, so dropped values can never resurrect from
# old files.


def _cm(m: dict) -> dict:
    """Manifest's logical->physical map ({} = identity)."""
    cmx = m.get("column_mapping") or {}
    return cmx.get("map") or {}


def _phys(cm: dict, col: str) -> str:
    return cm.get(col, col)


def _phys_schema(schema: StructType, cm: dict) -> StructType:
    if not cm:
        return schema
    from pyspark.sql.types import StructField

    return StructType(
        [
            StructField(
                _phys(cm, f.name), f.dataType, f.nullable, f.metadata
            )
            for f in schema.fields
        ]
    )


def _to_logical(df: DataFrame, cm: dict) -> DataFrame:
    """Rename a physically-named frame back to logical names (extra
    non-mapped columns — ``_sg_file`` etc — pass through untouched)."""
    if not cm:
        return df
    inv = {p: l for l, p in cm.items()}
    return df.select(
        *[F.col(c).alias(inv.get(c, c)) for c in df.columns]
    )


def _to_physical(df: DataFrame, cm: dict) -> DataFrame:
    if not cm:
        return df
    return df.select(
        *[F.col(c).alias(_phys(cm, c)) for c in df.columns]
    )


def _logical_sort_cols(stats_cols: list[str], cm: dict) -> list[str]:
    """Physical stats_cols -> logical names (for sorting a logical
    frame before the physical write)."""
    if not cm:
        return list(stats_cols)
    inv = {p: l for l, p in cm.items()}
    return [inv.get(c, c) for c in stats_cols]


def _cm_retired(m: dict) -> list[str]:
    """Physical names freed by drops — never reusable (resurrection)."""
    return list((m.get("column_mapping") or {}).get("retired") or [])


def _constraints_referencing(m: dict, col: str) -> list[str]:
    """Names of CHECK constraints whose expression mentions ``col`` —
    bare (word-boundary) or backtick-quoted identifier; conservative
    match.  Renaming or dropping a referenced column would silently
    break (or worse, re-bind) the stored SQL string, so those ops
    reject loudly."""
    import re

    esc = re.escape(col)
    pat = re.compile(
        rf"(?i)(?:`{esc}`|(?<![A-Za-z0-9_]){esc}(?![A-Za-z0-9_]))"
    )
    return sorted(
        n
        for n, e in (m.get("constraints") or {}).items()
        if pat.search(e)
    )


def _generated_referencing(m: dict, col: str) -> list[str]:
    """Generated columns whose expression mentions ``col`` — same
    conservative word-boundary match as ``_constraints_referencing``,
    same reason: renaming/dropping a referenced column would silently
    break (or re-bind) the stored SQL string."""
    import re

    esc = re.escape(col)
    pat = re.compile(
        rf"(?i)(?:`{esc}`|(?<![A-Za-z0-9_]){esc}(?![A-Za-z0-9_]))"
    )
    return sorted(
        n
        for n, e in (m.get("generated") or {}).items()
        if n != col and pat.search(e)
    )


def _pack_cm(cmap: dict, retired: list[str]) -> dict | None:
    return {"map": cmap, "retired": retired} if (cmap or retired) else None


def _guard_new_columns(
    m: dict, target_schema: StructType, out_schema: StructType, op: str
) -> None:
    """Schema-evolution columns default to physical == logical; on a
    table carrying a column mapping that identity may collide with a
    LIVE physical name (a renamed column's frozen storage name) or a
    RETIRED one (a dropped column's) — either would resurrect old bytes
    under the new logical name.  Such additions must go through
    ``snap_add_column``, which assigns a fresh physical name."""
    if not m.get("column_mapping"):
        return
    have = {f.name for f in target_schema.fields}
    new = [f.name for f in out_schema.fields if f.name not in have]
    if not new:
        return
    cmap = _cm(m)
    used = {_phys(cmap, c) for c in have} | set(_cm_retired(m))
    bad = sorted(n for n in new if n in used)
    if bad:
        raise ValueError(
            f"{op}: new column(s) {bad} collide with a live or retired "
            "PHYSICAL column name of this mapped table (old files hold "
            "bytes under that name — reading them back would resurrect "
            "dropped/renamed data); add the column with snap_add_column "
            "(fresh physical name) and retry the write"
        )


def snap_rename_column(
    path: str,
    old: str,
    new: str,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """``ALTER TABLE ... RENAME COLUMN old TO new`` — a metadata-only
    commit: ZERO data bytes move at any table size.

    The column's PHYSICAL (storage) name is frozen at first write; the
    commit just rewrites the logical schema and the logical->physical
    ``column_mapping`` (the Delta column-mapping model).  Readers of
    this and later versions see ``new``; time travel below the commit
    still reads ``old`` (each version resolves its own mapping).
    Stats, row-group ranges, and bloom sidecars stay keyed by the
    physical name, so file pruning and CoW merge planning keep working
    unchanged.  Renaming a column referenced by a CHECK constraint is
    rejected (the stored SQL string would silently break)."""
    if not new or not new.isidentifier():
        raise ValueError(
            f"snap_rename_column: new name {new!r} must be a bare "
            "identifier"
        )
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        schema = _manifest_schema(m)
        if schema is None:
            raise ValueError(
                "snap_rename_column needs a manifest-recorded schema"
            )
        names = [f.name for f in schema.fields]
        if old not in names:
            raise KeyError(
                f"snap_rename_column: no column {old!r} in {names}"
            )
        if new in names:
            raise ValueError(
                f"snap_rename_column: column {new!r} already exists in "
                f"{names}"
            )
        refs = _constraints_referencing(m, old)
        if refs:
            raise ValueError(
                f"snap_rename_column: column {old!r} is referenced by "
                f"CHECK constraint(s) {refs}; drop them first and "
                "re-add against the new name"
            )
        grefs = _generated_referencing(m, old)
        if grefs:
            raise ValueError(
                f"snap_rename_column: column {old!r} is referenced by "
                f"GENERATED column expression(s) {grefs}; drop those "
                "columns first and re-declare against the new name"
            )
        cmap = dict(_cm(m))
        phys = cmap.pop(old, old)
        if phys != new:
            cmap[new] = phys
        from pyspark.sql.types import StructField

        new_schema = StructType(
            [
                StructField(new, f.dataType, f.nullable, f.metadata)
                if f.name == old
                else f
                for f in schema.fields
            ]
        )
        carry = dict(m)
        carry["column_mapping"] = _pack_cm(cmap, _cm_retired(m))
        dflts = dict(m.get("defaults") or {})
        if old in dflts:
            dflts[new] = dflts.pop(old)
            carry["defaults"] = dflts
        idd = dict(m.get("identity") or {})
        if old in idd:
            idd[new] = idd.pop(old)
            carry["identity"] = idd
        gens = dict(m.get("generated") or {})
        if old in gens:
            # renaming the generated column itself: the declaration
            # follows (its expression references OTHER columns — self
            # references are impossible by DDL-time construction)
            gens[new] = gens.pop(old)
            carry["generated"] = gens
        decl = m.get("clustering")
        if decl and old in decl.get("cols", []):
            # the declaration names LOGICAL columns; it follows the
            # rename (same rule as defaults — stats/envelopes stay
            # keyed by the frozen physical name underneath)
            carry["clustering"] = {
                **decl,
                "cols": [new if c == old else c for c in decl["cols"]],
            }
        try:
            return _commit(
                path, m["files"], m["stats_cols"],
                base_version=m["version"],
                schema_json=new_schema.json(),
                txns=dict(m.get("txns", {})),
                commit_info={
                    "op": "rename_column", "from": old, "to": new,
                },
                fs=fs, carry=carry, adds=[], removes=[],
            )
        except CommitConflict as e:
            last_err = e
            continue
    raise CommitConflict(
        f"snap_rename_column: lost the commit race {COMMIT_RETRIES} "
        f"times at {path!r}"
    ) from last_err


def snap_drop_column(
    path: str,
    col: str,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """``ALTER TABLE ... DROP COLUMN`` — metadata-only: the column
    leaves the logical schema and its physical name is RETIRED, while
    the bytes stay untouched in the existing files (time travel below
    the commit still reads them).  A later ``snap_add_column`` of the
    same logical name gets a FRESH physical name, so the dropped values
    can never resurrect from old files.  Dropping a column referenced
    by a CHECK constraint is rejected; dropping a pruning/stats column
    also removes it from ``stats_cols`` (future files stop tracking
    it)."""
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        schema = _manifest_schema(m)
        if schema is None:
            raise ValueError(
                "snap_drop_column needs a manifest-recorded schema"
            )
        names = [f.name for f in schema.fields]
        if col not in names:
            raise KeyError(
                f"snap_drop_column: no column {col!r} in {names}"
            )
        if len(names) == 1:
            raise ValueError(
                "snap_drop_column: cannot drop the table's only column"
            )
        refs = _constraints_referencing(m, col)
        if refs:
            raise ValueError(
                f"snap_drop_column: column {col!r} is referenced by "
                f"CHECK constraint(s) {refs}; drop them first"
            )
        grefs = _generated_referencing(m, col)
        if grefs:
            raise ValueError(
                f"snap_drop_column: column {col!r} is referenced by "
                f"GENERATED column expression(s) {grefs}; drop those "
                "columns first"
            )
        cmap = dict(_cm(m))
        phys = cmap.pop(col, col)
        part_refs = [
            s for s in _pspec(m) if s["col"] == phys
        ]
        if part_refs:
            raise ValueError(
                f"snap_drop_column: column {col!r} is a partition "
                f"source ({[s['t'] for s in part_refs]}); partitioned "
                f"tables cannot drop their partition columns"
            )
        if col in (m.get("clustering") or {}).get("cols", []):
            raise ValueError(
                f"snap_drop_column: column {col!r} is a declared "
                "clustering column; run snap_set_clustering(path, "
                "None) (or re-declare without it) first"
            )
        retired = _cm_retired(m) + [phys]
        new_schema = StructType(
            [f for f in schema.fields if f.name != col]
        )
        stats_cols = [c for c in m["stats_cols"] if c != phys]
        carry = dict(m)
        carry["column_mapping"] = _pack_cm(cmap, retired)
        # the dropped column's DEFAULT dies with it (a re-add gets a
        # fresh physical name and no default unless declared again);
        # so does its GENERATED declaration
        carry["defaults"] = {
            k: v for k, v in (m.get("defaults") or {}).items() if k != col
        }
        carry["generated"] = {
            k: v
            for k, v in (m.get("generated") or {}).items()
            if k != col
        }
        carry["identity"] = {
            k: v
            for k, v in (m.get("identity") or {}).items()
            if k != col
        }
        try:
            return _commit(
                path, m["files"], stats_cols,
                base_version=m["version"],
                schema_json=new_schema.json(),
                txns=dict(m.get("txns", {})),
                commit_info={
                    "op": "drop_column", "column": col, "physical": phys,
                },
                fs=fs, carry=carry, adds=[], removes=[],
            )
        except CommitConflict as e:
            last_err = e
            continue
    raise CommitConflict(
        f"snap_drop_column: lost the commit race {COMMIT_RETRIES} "
        f"times at {path!r}"
    ) from last_err


def _validate_default(name: str, default, dt) -> None:
    """Reject a column DEFAULT that cannot cast to the declared type —
    at DDL time, not at the first omitting append.

    Without this, ``default="oops"`` on an int column is accepted and
    only surfaces when ``snap_append`` evaluates
    ``F.lit(default).cast(dt)``: a runtime error under ANSI, or a
    silent NULL fill (divergent from the declaration) with ANSI off.
    Driver-side on purpose — no SparkSession needed at DDL time, and
    the rules mirror what the write-time cast will do."""
    import datetime as _dt
    import decimal as _decimal

    from pyspark.sql.types import (
        BooleanType,
        DateType,
        NumericType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    def _bad(why: str):
        return ValueError(
            f"snap_add_column: default {default!r} is not a valid "
            f"{dt.simpleString()} for column {name!r}: {why}"
        )

    if isinstance(dt, StringType):
        return
    if isinstance(dt, BooleanType):
        if not isinstance(default, bool):
            raise _bad("expected a bool")
        return
    if isinstance(dt, NumericType):
        if isinstance(default, bool):
            raise _bad("bool is not a numeric default")
        if isinstance(default, (int, float)):
            return
        try:
            _decimal.Decimal(str(default))
        except _decimal.InvalidOperation:
            raise _bad("not parseable as a number") from None
        return
    if isinstance(dt, DateType):
        try:
            _dt.date.fromisoformat(str(default))
        except ValueError:
            raise _bad("expected an ISO date string") from None
        return
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        try:
            _dt.datetime.fromisoformat(str(default))
        except ValueError:
            raise _bad("expected an ISO timestamp string") from None
        return
    # complex/binary/interval: a JSON-scalar default has no sensible
    # cast — refuse at declaration rather than NULL-fill at append
    raise _bad("defaults are only supported on scalar column types")


def snap_add_column(
    path: str,
    name: str,
    dtype,
    nullable: bool = True,
    fs: LocalSnapshotFS | None = None,
    default=None,
    generated_as: str | None = None,
    spark: SparkSession | None = None,
    identity: tuple[int, int] | bool | None = None,
) -> int:
    """``ALTER TABLE ... ADD COLUMN`` — metadata-only; existing files
    are null-backfilled at read (the reader scans under the manifest's
    declared schema, no footer sweep).  ``dtype`` is a
    ``pyspark.sql.types.DataType`` or a DDL type string (``"bigint"``;
    string form needs an active SparkSession to parse).  If the logical
    name's default physical identity is already taken — it was dropped
    earlier (retired) or another column's frozen storage name uses it —
    the column gets a FRESH physical name via the mapping, which is
    what makes drop-then-re-add safe against resurrection.

    ``default`` (a JSON scalar) records a COLUMN DEFAULT in the
    manifest: subsequent ``snap_append`` batches may omit the column
    and have it filled at WRITE time (cast to the column type).  The
    Delta default-values semantic exactly: existing rows still read
    NULL (defaults never backfill history), and only the append/ingest
    path fills — keyed mutators (merge/CDC/UPDATE) keep requiring
    explicit columns, where an implicit fill could silently corrupt a
    keyed rewrite.  Renames carry the default, drops remove it.

    ``generated_as`` (a SQL expression over the table's OTHER columns)
    declares a ``GENERATED ALWAYS AS (expr)`` column instead: appends
    that omit it get it computed at WRITE time; every write path that
    carries the column — append, merge, CDC, UPDATE, the streaming
    sink — validates supplied values null-safely EQUAL the expression
    and rejects the batch otherwise (Delta's generated-column
    contract; enforcement rides the CHECK machinery, see
    ``_generated_checks``, so keep expressions ANSI-portable on tables
    fed by the native sink).  Existing rows read NULL (declarations
    never backfill history — same rule as defaults).  Requires
    ``spark`` for DDL-time validation: the expression must resolve
    against the current schema and cast to ``dtype``, so a typo fails
    at declaration, not at 3 a.m. in an ingest job.  Mutually
    exclusive with ``default``.  Renames of the generated column
    follow; renaming/dropping a column its expression references is
    rejected (same rule as CHECK constraints).

    ``identity=(start, step)`` (or ``True`` for ``(1, 1)``) declares a
    ``GENERATED ALWAYS AS IDENTITY`` surrogate-key column (bigint
    only): ``snap_append`` assigns values from the manifest's
    allocator — one count job reserves the exact range, zipWithIndex
    numbers rows, and a lost commit race re-RUNS against the new
    high-water mark, so values are UNIQUE under any concurrency (gaps
    possible, the standard identity contract).  Writers may never
    supply the column; keyed mutators, overwrite, and the
    DataSource/streaming sinks refuse identity tables loudly (the
    allocator lives on the append path); deletes, UPDATE of other
    columns, OPTIMIZE, RESTORE, and CLONE carry assigned values
    untouched."""
    from pyspark.sql.types import DataType, StructField

    if not name or not name.isidentifier():
        raise ValueError(
            f"snap_add_column: name {name!r} must be a bare identifier"
        )
    if sum(x is not None for x in (default, generated_as)) + (
        identity is not None and identity is not False
    ) > 1:
        raise ValueError(
            "snap_add_column: default, generated_as, and identity are "
            "mutually exclusive — a GENERATED column's value is always "
            "the expression / the identity allocator"
        )
    if default is not None and not isinstance(
        default, (int, float, str, bool)
    ):
        raise ValueError(
            "snap_add_column: default must be a JSON scalar "
            f"(int/float/str/bool), got {type(default).__name__}"
        )
    if not nullable:
        raise ValueError(
            "snap_add_column: new columns must be nullable — every "
            "existing file null-backfills them at read"
        )
    if isinstance(dtype, DataType):
        dt = dtype
    else:
        dt = StructType.fromDDL(f"`{name}` {dtype}").fields[0].dataType
    if default is not None:
        _validate_default(name, default, dt)
    if generated_as is not None and spark is None:
        raise ValueError(
            "snap_add_column: generated_as needs spark= — the "
            "expression is validated against the schema at DDL time"
        )
    id_spec = None
    if identity is not None and identity is not False:
        start, step = (1, 1) if identity is True else identity
        start, step = int(start), int(step)
        if step == 0:
            raise ValueError("snap_add_column: identity step must be nonzero")
        from pyspark.sql.types import LongType as _Long

        if not isinstance(dt, _Long):
            raise ValueError(
                "snap_add_column: identity columns must be bigint "
                f"(got {dt.simpleString()}) — surrogate keys need the "
                "full 64-bit range"
            )
        id_spec = {"start": start, "step": step, "high": 0}
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        schema = _manifest_schema(m)
        if schema is None:
            raise ValueError(
                "snap_add_column needs a manifest-recorded schema"
            )
        names = [f.name for f in schema.fields]
        if name in names:
            raise ValueError(
                f"snap_add_column: column {name!r} already exists"
            )
        if generated_as is not None:
            # DDL-time validation: the expression must resolve against
            # the PRE-add schema (it may not reference itself) and the
            # result must cast to the declared type — analysis errors
            # surface here with the declaration's stack, not an ingest
            # job's
            try:
                spark.createDataFrame([], schema).select(
                    F.expr(generated_as).cast(dt).alias(name)
                ).schema
            except Exception as e:
                raise ValueError(
                    f"snap_add_column: generated_as {generated_as!r} "
                    f"does not resolve against schema {names} / cast "
                    f"to {dt.simpleString()}: {e}"
                ) from e
        cmap = dict(_cm(m))
        retired = _cm_retired(m)
        used = {_phys(cmap, c) for c in names} | set(retired)
        phys = name
        while phys in used:
            phys = f"{name}_{uuid.uuid4().hex[:8]}"
        if phys != name:
            cmap[name] = phys
        new_schema = StructType(
            list(schema.fields) + [StructField(name, dt, nullable)]
        )
        carry = dict(m)
        carry["column_mapping"] = _pack_cm(cmap, retired)
        if default is not None:
            carry["defaults"] = {
                **(m.get("defaults") or {}), name: default,
            }
        if generated_as is not None:
            carry["generated"] = {
                **(m.get("generated") or {}), name: generated_as,
            }
        if id_spec is not None:
            carry["identity"] = {
                **(m.get("identity") or {}), name: id_spec,
            }
        try:
            return _commit(
                path, m["files"], m["stats_cols"],
                base_version=m["version"],
                schema_json=new_schema.json(),
                txns=dict(m.get("txns", {})),
                commit_info={
                    "op": "add_column", "column": name, "physical": phys,
                },
                fs=fs, carry=carry, adds=[], removes=[],
            )
        except CommitConflict as e:
            last_err = e
            continue
    raise CommitConflict(
        f"snap_add_column: lost the commit race {COMMIT_RETRIES} "
        f"times at {path!r}"
    ) from last_err



# Lossless type widenings (the Delta ``typeWidening`` matrix, minus
# date->timestampNTZ): integer chain, float->double, the sub-long
# integers into double (<= 32 significant bits fits double's 53-bit
# mantissa exactly; long does NOT and is refused), and decimal growth
# that never shrinks scale or integer digits.  Integer->decimal needs
# enough integer digits for the source's full range.
_INT_WIDTH = {"byte": 0, "short": 1, "integer": 2, "long": 3}
_INT_DIGITS = {"byte": 3, "short": 5, "integer": 10, "long": 19}


def _is_widening(old, new) -> bool:
    """True iff every value of ``old`` is exactly representable in
    ``new`` (so a metadata-only type change can never corrupt data)."""
    from pyspark.sql.types import DecimalType

    if old == new:
        return False
    o, n = old.typeName(), new.typeName()
    if o in _INT_WIDTH and n in _INT_WIDTH:
        return _INT_WIDTH[n] > _INT_WIDTH[o]
    if n == "double" and o in ("float", "byte", "short", "integer"):
        return True
    if isinstance(new, DecimalType):
        if isinstance(old, DecimalType):
            return (
                new.scale >= old.scale
                and new.precision - new.scale >= old.precision - old.scale
            )
        digits = _INT_DIGITS.get(o)
        return digits is not None and new.precision - new.scale >= digits
    return False


def snap_widen_column(
    path: str,
    name: str,
    dtype,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """``ALTER TABLE ... ALTER COLUMN ... TYPE`` (the Delta type-
    widening shape) — metadata-only: the manifest's recorded schema
    changes to the wider type and ZERO bytes rewrite at any table
    size.  Only lossless widenings are accepted (``_is_widening``:
    byte->short->int->long, float->double, byte/short/int->double,
    decimal growth that shrinks neither scale nor integer digits,
    integer->decimal with room for the full source range) — anything
    else would silently corrupt rows and is refused.

    No protocol feature flag, deliberately (unlike Delta): every read
    path in this protocol — ``_read_entries``' schema-pinned parquet
    scan, the Arrow sources' per-column ``cast(field.type)``, stats
    pruning's float-normalized envelopes — derives types from the
    MANIFEST schema, never from file footers, and Spark 4's parquet
    reader upcasts narrow physical types under a wider read schema.
    An older build of this library therefore reads and mutates a
    widened table correctly with no new code, and a flag would only
    lock it out for nothing.  Time travel to pre-widening versions
    returns the narrow types (the schema rides the manifest).

    ``dtype`` is a ``pyspark.sql.types.DataType`` or DDL string
    (``"bigint"``; string form needs an active SparkSession)."""
    from pyspark.sql.types import DataType, StructField

    if isinstance(dtype, DataType):
        dt = dtype
    else:
        dt = StructType.fromDDL(f"`{name}` {dtype}").fields[0].dataType
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        schema = _manifest_schema(m)
        if schema is None:
            raise ValueError(
                "snap_widen_column needs a manifest-recorded schema"
            )
        by_name = {f.name: f for f in schema.fields}
        if name not in by_name:
            raise ValueError(
                f"snap_widen_column: no column {name!r} in "
                f"{sorted(by_name)}"
            )
        old = by_name[name].dataType
        if not _is_widening(old, dt):
            raise ValueError(
                f"snap_widen_column: {old.simpleString()} -> "
                f"{dt.simpleString()} is not a lossless widening "
                "(allowed: byte->short->int->long, float->double, "
                "byte/short/int->double, decimal growth keeping scale "
                "and integer digits, integer->decimal with room)"
            )
        new_schema = StructType(
            [
                StructField(name, dt, f.nullable, f.metadata)
                if f.name == name
                else f
                for f in schema.fields
            ]
        )
        carry = dict(m)
        try:
            return _commit(
                path, m["files"], m["stats_cols"],
                base_version=m["version"],
                schema_json=new_schema.json(),
                txns=dict(m.get("txns", {})),
                commit_info={
                    "op": "widen_column", "column": name,
                    "from": old.simpleString(), "to": dt.simpleString(),
                },
                fs=fs, carry=carry, adds=[], removes=[],
            )
        except CommitConflict as e:
            last_err = e
            continue
    raise CommitConflict(
        f"snap_widen_column: lost the commit race {COMMIT_RETRIES} "
        f"times at {path!r}"
    ) from last_err


def snap_set_partition_spec(
    path: str,
    partition_by: list[str] | None,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """Replace the table's hidden-partitioning spec (Iceberg partition
    evolution) — metadata-only: zero bytes rewritten at any size.

    The new spec governs FUTURE writes (they derive + cluster under
    it); files written under previous specs keep their old
    ``_sgp_<id>`` stats, which the new spec's derived predicates never
    reference — so scans stay exactly correct and old files simply
    fall back to conservative keep (their SOURCE-column stats, blooms,
    and row-group ranges still prune where tracked).  Field ids are
    drawn from a carried, never-reset sequence (``partition_field_seq``)
    precisely so an old file's day-transform stats can never be probed
    by a new bucket-transform predicate of the same name.  Pass
    ``None``/``[]`` to unpartition (future writes stop deriving).
    Compaction (``optimize_snapshot``) re-clusters everything it
    rewrites under the CURRENT spec, so the layout converges after an
    evolution without a dedicated rewrite."""
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        schema = _manifest_schema(m)
        if schema is None:
            raise ValueError(
                "snap_set_partition_spec needs a manifest-recorded schema"
            )
        old = _pspec(m)
        seq = int(
            m.get("partition_field_seq")
            or (
                max(
                    (int(s_["name"].rsplit("_", 1)[-1]) for s_ in old),
                    default=-1,
                )
                + 1
            )
        )
        pspec: list[dict] = []
        if partition_by:
            from .partition import parse_partition_spec

            # validate against the LOGICAL schema (what users see),
            # then pin the PHYSICAL source names like init does
            pspec = parse_partition_spec(partition_by, schema, seq)
            cm = _cm(m)
            for s_ in pspec:
                s_["col"] = _phys(cm, s_["col"])
        carry = dict(m)
        carry["partition_spec"] = pspec
        carry["partition_field_seq"] = seq + len(pspec)
        try:
            return _commit(
                path, m["files"], m["stats_cols"],
                base_version=m["version"],
                schema_json=m.get("schema"),
                txns=dict(m.get("txns", {})),
                commit_info={
                    "op": "set_partition_spec",
                    "fields": [s_["name"] for s_ in pspec],
                },
                fs=fs, carry=carry, adds=[], removes=[],
            )
        except CommitConflict as e:
            last_err = e
            continue
    raise CommitConflict(
        f"snap_set_partition_spec: lost the commit race "
        f"{COMMIT_RETRIES} times at {path!r}"
    ) from last_err


def snap_enable_row_tracking(
    path: str,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """Enable ROW TRACKING (the Delta row-ID model) on an existing
    table — one metadata-only commit, zero bytes rewritten.

    Every current data file gets a ``row_id_base`` watermark slice in
    manifest order (its rows are implicitly ``base..base+rows-1``),
    the manifest records the ``next_row_id`` high-water mark, and the
    ``row_tracking`` WRITER feature flags the table so a legacy build
    cannot assign colliding ids.  From then on every commit's fresh
    files extend the watermark (``_commit``), CoW rewrites that
    preserve ids materialize them as a physical ``_row_id`` column
    (``optimize_snapshot``), and ``snap_read(..., with_row_ids=True)``
    surfaces the id.

    What ids buy (PLANS.md round-13 design note, now built): a
    compaction's output rows carry the SAME ids as its input rows, so
    the streaming change feed can prove "rearrangement, no data
    change" and emit nothing instead of read-and-cancel.

    Caveat: to an APPEND-mode stream this commit looks like a change
    commit (every entry is republished with its base) — set
    ``skipChangeCommits`` or re-bootstrap; no data file changed.
    Idempotent: enabling twice is a no-op."""
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        if m.get("row_tracking"):
            return m["version"]
        nxt = int(m.get("next_row_id") or 0)
        updated = []
        for e in m["files"]:
            e2 = dict(e)
            e2["row_id_base"] = nxt
            nxt += int(e.get("rows") or 0)
            updated.append(e2)
        carry = dict(m)
        carry["row_tracking"] = True
        carry["next_row_id"] = nxt
        try:
            return _commit(
                path, updated, m["stats_cols"],
                base_version=m["version"],
                schema_json=m.get("schema"),
                txns=dict(m.get("txns", {})),
                commit_info={"op": "enable_row_tracking"},
                fs=fs, carry=carry,
                adds=updated,
                removes=[e["name"] for e in m["files"]],
            )
        except CommitConflict as e:
            last_err = e
            continue
    raise CommitConflict(
        f"snap_enable_row_tracking: lost the commit race "
        f"{COMMIT_RETRIES} times at {path!r}"
    ) from last_err


def snap_init(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    stats_cols: list[str],
    txns: dict | None = None,
    fs: LocalSnapshotFS | None = None,
    partition_by: list[str] | None = None,
    row_tracking: bool = False,
    cluster_by: list[str] | None = None,
    curve: str = "morton",
) -> int:
    """Create a snapshot table at ``path`` from ``df`` (version 1).

    ``row_tracking=True`` enables stable row IDs from birth (see
    ``snap_enable_row_tracking`` for the model — fresh files get
    watermark slices, rewrites preserve, ``snap_read(...,
    with_row_ids=True)`` surfaces ``_row_id``).

    ``stats_cols`` are the columns whose per-file envelopes and
    row-group ranges the manifest tracks — the merge keys and any
    pruning columns.  ``txns`` seeds the idempotence-marker map (e.g. a
    materialized view recording the source version it was built from).

    ``partition_by`` declares hidden partitioning — transform specs
    like ``["days(event_ts)", "bucket(16, user_id)", "country"]``
    (see ``sources/partition.py``): every write path clusters batches
    by the derived tuple and ``snap_scan`` prunes files from plain
    predicates on the SOURCE columns; the user never references a
    partition column.

    ``cluster_by`` declares CLUSTER BY at creation (the Delta
    ``CREATE TABLE ... CLUSTER BY`` shape): the declaration lands in
    the v1 manifest exactly as ``snap_set_clustering`` would record it
    (maintenance defaults to it from the first OPTIMIZE), and the
    initial write itself is range-clustered on the primary column so
    the table is born with tight envelopes instead of earning them at
    its first rewrite.  Validation matches ``snap_set_clustering``
    (1-2 columns, primary column stats-tracked, morton/hilbert)."""
    f = _fs(fs)
    if cluster_by:
        cluster_by = list(cluster_by)
        if curve not in ("morton", "hilbert"):
            raise ValueError(
                f"curve {curve!r}: use 'morton' or 'hilbert'"
            )
        if not 1 <= len(cluster_by) <= 2:
            raise ValueError(
                "cluster_by takes 1 (range) or 2 (curve) columns"
            )
        names = [fld.name for fld in df.schema.fields]
        missing = [c for c in cluster_by if c not in names]
        if missing:
            raise KeyError(
                f"snap_init: cluster_by column(s) {missing} not in "
                f"schema {names}"
            )
        if cluster_by[0] not in stats_cols:
            raise ValueError(
                f"snap_init: primary clustering column "
                f"{cluster_by[0]!r} must be in stats_cols "
                f"{stats_cols} — incremental re-clustering picks its "
                "rewrite groups from the stats envelopes"
            )
        # born clustered: range on the primary key (a one-column sort
        # is what keeps the very first envelopes disjoint; the curve
        # only matters once OPTIMIZE rewrites multi-column regions).
        # Partition count is left to the session default + AQE
        # coalescing — the declaration owns the layout now, not the
        # caller's incoming partitioning.
        df = df.repartitionByRange(
            F.col(cluster_by[0])
        ).sortWithinPartitions(*cluster_by)
    f.makedirs(path)
    if current_version(path, fs) != 0:
        raise FileExistsError(f"snapshot table already exists at {path!r}")
    pspec: list[dict] = []
    if partition_by:
        from .partition import parse_partition_spec

        pspec = parse_partition_spec(partition_by, df.schema)
    files = _write_data_files(spark, df, path, stats_cols, fs, pspec=pspec)
    carry: dict = {}
    if pspec:
        carry = {
            "partition_spec": pspec,
            "partition_field_seq": len(pspec),
        }
    if row_tracking:
        carry["row_tracking"] = True
    if cluster_by:
        carry["clustering"] = {"cols": cluster_by, "curve": curve}
    return _commit(
        path, files, stats_cols, base_version=0,
        schema_json=df.schema.json(), txns=txns, fs=fs,
        adds=files, removes=[],
        carry=carry or None,
    )


# deletion-vector side above which the positional anti-join is left to
# the planner instead of being broadcast-hinted (a table overdue for
# compaction can accrue more deleted positions than a driver should hold)
DV_BROADCAST_MAX_ROWS = 10_000_000


def _read_entries(
    spark: SparkSession,
    path: str,
    entries: list[dict],
    schema: StructType | None,
    cm: dict | None = None,
) -> DataFrame:
    """Read a set of manifest entries, applying their deletion vectors.

    Files without a DV get the plain pruned parquet scan.  Files WITH a
    DV are read with the parquet reader's per-file ``_metadata``
    (file_name, row_index) columns and anti-joined against their
    sidecars' ``(file_name, pos)`` sets — a broadcast hash anti-join
    (no scan shuffle) while the total deleted-position count stays
    under ``DV_BROADCAST_MAX_ROWS``.  Loading a sidecar can surface
    position sets it holds for OTHER files in the read; that is safe by
    construction: positions only accumulate, so any sidecar's set for a
    file is a subset of the newest one the file's entry points to, and
    the anti-join of the union is the same rows."""
    if not entries:
        raise FileNotFoundError("snapshot version has no files")
    cm = cm or {}
    if schema is not None:
        # files store PHYSICAL names: scan under them, rename at the end
        reader = spark.read.schema(_phys_schema(schema, cm))
    else:
        reader = spark.read
    clean = [e for e in entries if not e.get("dv")]
    dved = [e for e in entries if e.get("dv")]
    parts: list[DataFrame] = []
    if clean:
        parts.append(
            reader.parquet(*[_entry_path(path, e) for e in clean])
        )
    if dved:
        df = reader.parquet(
            *[_entry_path(path, e) for e in dved]
        ).withColumns(
            {
                "_sg_file": F.col("_metadata.file_name"),
                "_sg_pos": F.col("_metadata.row_index"),
            }
        )
        names = [e["name"] for e in dved]
        sidecars = sorted(
            {_dv_path(path, e) for e in dved}
        )
        dv = (
            spark.read.parquet(*sidecars)
            .filter(F.col("file_name").isin(names))
            .select(
                F.col("file_name").alias("_sg_file"),
                F.col("pos").alias("_sg_pos"),
            )
        )
        total_dv = sum(e["dv"]["rows"] for e in dved)
        if total_dv <= DV_BROADCAST_MAX_ROWS:
            dv = F.broadcast(dv)
        parts.append(
            df.join(dv, ["_sg_file", "_sg_pos"], "left_anti").drop(
                "_sg_file", "_sg_pos"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _to_logical(out, cm)


#: The surfaced / materialized row-ID column name (Delta's).
ROW_ID_COL = "_row_id"


def _read_entries_with_ids(
    spark: SparkSession,
    path: str,
    entries: list[dict],
    schema: StructType | None,
    cm: dict | None = None,
) -> DataFrame:
    """``_read_entries`` plus a stable ``_row_id`` column.

    Two id sources, the Delta row-tracking shape: fresh files
    synthesize ``row_id_base + row_index`` (ids are metadata, no bytes
    paid at ingest); files rewritten by an id-preserving CoW
    (``optimize_snapshot`` on a tracked table) MATERIALIZED the id as
    a physical ``_row_id`` column and are read from it
    (``row_id_col`` marker).  One scan serves both: the read schema
    appends a nullable ``_row_id`` (absent in fresh files -> null),
    and a broadcast (file_name -> base) map fills the synthesized
    side via ``coalesce``.  Deletion vectors apply exactly as in
    ``_read_entries`` — a masked row's id simply never surfaces, and
    never gets reused (the watermark only grows)."""
    from pyspark.sql.types import LongType, StructField

    if not entries:
        raise FileNotFoundError("snapshot version has no files")
    cm = cm or {}
    missing = [
        e["name"]
        for e in entries
        if not e.get("row_id_col") and "row_id_base" not in e
    ]
    if missing:
        raise ValueError(
            "with_row_ids=True needs row tracking enabled at or before"
            f" this version (entries without bases: {missing[:3]}...) —"
            " snap_enable_row_tracking(path)"
        )
    if schema is not None and ROW_ID_COL in schema.fieldNames():
        raise ValueError(
            f"table schema already has a `{ROW_ID_COL}` column — "
            "rename it before reading with row ids"
        )
    reader = spark.read
    if schema is not None:
        phys = _phys_schema(schema, cm)
        reader = spark.read.schema(
            StructType(
                list(phys.fields)
                + [StructField(ROW_ID_COL, LongType())]
            )
        )
    df = reader.parquet(
        *[_entry_path(path, e) for e in entries]
    ).withColumns(
        {
            "_sg_file": F.col("_metadata.file_name"),
            "_sg_pos": F.col("_metadata.row_index"),
        }
    )
    bmap = spark.createDataFrame(
        [
            (
                e["name"],
                None if e.get("row_id_col") else int(e["row_id_base"]),
            )
            for e in entries
        ],
        "_sg_file string, _sg_base long",
    )
    df = df.join(F.broadcast(bmap), "_sg_file", "left").withColumn(
        ROW_ID_COL,
        F.coalesce(
            F.col(ROW_ID_COL), F.col("_sg_base") + F.col("_sg_pos")
        ),
    )
    dved = [e for e in entries if e.get("dv")]
    if dved:
        names = [e["name"] for e in dved]
        sidecars = sorted(
            {_dv_path(path, e) for e in dved}
        )
        dv = (
            spark.read.parquet(*sidecars)
            .filter(F.col("file_name").isin(names))
            .select(
                F.col("file_name").alias("_sg_file"),
                F.col("pos").alias("_sg_pos"),
            )
        )
        total_dv = sum(e["dv"]["rows"] for e in dved)
        if total_dv <= DV_BROADCAST_MAX_ROWS:
            dv = F.broadcast(dv)
        df = df.join(dv, ["_sg_file", "_sg_pos"], "left_anti")
    df = df.drop("_sg_file", "_sg_pos", "_sg_base")
    return _to_logical(df, cm)


def _to_epoch(ts) -> float:
    """Epoch seconds from a timestamp query value: float/int epoch,
    ``datetime`` (NAIVE means UTC — matching the stats/partition
    convention everywhere else in this layer), or a string (numeric
    epoch — what a stringly-typed DataSource option carries — or
    ISO-8601)."""
    import datetime as _dt

    if isinstance(ts, str):
        try:
            return float(ts)
        except ValueError:
            ts = _dt.datetime.fromisoformat(ts)
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts.timestamp()
    return float(ts)


def version_at_timestamp(
    path: str,
    ts,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """Delta-style timestamp time travel resolution: the LAST version
    committed at-or-before ``ts`` (the table's state at that instant).

    Every ``_commit`` stamps its manifest with the committer's wall
    clock (``"ts"``, epoch seconds).  Raw stamps can be non-monotone
    under clock skew between committers, so resolution adjusts each
    version's effective timestamp to ``max(stamp, predecessors')`` —
    the Delta file-modification-time rule, applied at READ time
    because commits never rewrite history.  Versions from builds
    predating the stamp inherit their predecessor's adjusted value
    (the earliest defaults to 0.0, keeping pre-feature history
    reachable by any query timestamp).  Raises ``ValueError`` when
    ``ts`` precedes the earliest readable commit AND — Delta parity —
    when ``ts`` is after the latest adjusted commit time (resolving a
    future instant to CURRENT would silently mean different data
    after every new commit; ask for ``version=None`` / the latest
    commit's own timestamp instead).  O(readable versions)
    driver-side manifest-record reads, the ``snapshot_audit`` cost
    class."""
    qts = _to_epoch(ts)
    best: int | None = None
    earliest: float | None = None
    latest: float | None = None
    for v, adj in _adjusted_commit_times(path, fs):
        if earliest is None:
            earliest = adj
        latest = adj
        if adj <= qts:
            best = v
    if best is None:
        raise ValueError(
            f"timestamp {ts!r} precedes the earliest readable commit "
            f"of {path!r} (its adjusted commit time is {earliest}); "
            "older history is expired or was never committed"
        )
    if latest is not None and qts > latest:
        raise ValueError(
            f"timestamp {ts!r} is after the latest commit of {path!r} "
            f"(adjusted commit time {latest}); read CURRENT (no "
            "version/timestamp) or pass a timestamp at-or-before the "
            "latest commit"
        )
    return best


def _adjusted_commit_times(path: str, fs: LocalSnapshotFS | None):
    """Yield ``(version, adjusted_ts)`` over readable manifests in
    version order — the monotone timeline both timestamp-travel
    resolvers share (``version_at_timestamp`` has the rules)."""
    f = _fs(fs)
    cur = current_version(path, fs)
    if cur == 0:
        raise FileNotFoundError(f"no committed snapshot at {path!r}")
    adj = 0.0
    for v in range(1, cur + 1):
        mp = _manifest_path(path, v)
        if not f.exists(mp):
            continue  # expired history: unreadable either way
        raw = json.loads(f.read_text(mp))
        adj = max(adj, float(raw.get("ts") or 0.0))
        yield v, adj


def version_before_timestamp(
    path: str,
    ts,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """The LAST version whose adjusted commit time is strictly BEFORE
    ``ts`` (0 when none) — the exclusive streaming start offset behind
    ``startingTimestamp``: every commit at-or-after the instant
    streams, a future instant streams only commits yet to land.  A
    created-but-empty table (no commits yet) returns 0 — the stream
    plans and picks up commits as they land, exactly like
    ``startingVersion=0``."""
    qts = _to_epoch(ts)
    best = 0
    try:
        for v, adj in _adjusted_commit_times(path, fs):
            if adj < qts:
                best = v
    except FileNotFoundError:
        return 0
    return best


def snap_read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
    timestamp=None,
    with_row_ids: bool = False,
    ref: str | None = None,
) -> DataFrame:
    """Read the table at a committed version (default: CURRENT).

    ``with_row_ids=True`` (on a row-tracked table — see
    ``snap_enable_row_tracking``) appends the stable ``_row_id``
    column: metadata-synthesized for fresh files, read from the
    materialized column in id-preserving rewrites.

    The returned plan holds the resolved version's exact file list and
    that version's RECORDED schema (columns added by later evolution are
    invisible to a time-travel read; files written before an evolution
    are null-backfilled by the reader — no ``mergeSchema`` footer
    sweep), so it stays consistent even if commits land while it
    executes.  Rows masked by a file's deletion vector (merge-on-read
    deletes, ``delete_where_mor``/``delete_keys_mor``) are filtered at
    read time.

    ``timestamp`` (exclusive with ``version``) time-travels by commit
    time instead of version number — epoch seconds, ``datetime``
    (naive = UTC), or ISO-8601 string (``version_at_timestamp`` has
    the resolution rules).

    ``ref`` reads a NAMED ref (``sources/refs.py``): a tag resolves to
    its pinned version, a branch to the branch table's CURRENT."""
    if ref is not None:
        from .refs import resolve_ref

        if version is not None or timestamp is not None:
            raise ValueError(
                "snap_read: pass ref OR version/timestamp, not both"
            )
        kind, val = resolve_ref(path, ref, fs)
        if kind == "branch":
            return snap_read(
                spark, val, None, fs, None, with_row_ids
            )
        version = val
    if timestamp is not None:
        if version is not None:
            raise ValueError(
                "snap_read: pass version OR timestamp, not both"
            )
        version = version_at_timestamp(path, timestamp, fs)
    m = read_manifest(path, version, fs)
    schema = _manifest_schema(m)
    if not m["files"]:
        # legitimate after a delete that killed every row
        if schema is not None:
            if with_row_ids:
                from pyspark.sql.types import LongType, StructField

                schema = StructType(
                    list(schema.fields)
                    + [StructField(ROW_ID_COL, LongType())]
                )
            return spark.createDataFrame([], schema)
        raise FileNotFoundError(f"snapshot v{m['version']} has no files")
    if with_row_ids:
        return _read_entries_with_ids(
            spark, path, m["files"], schema, _cm(m)
        )
    return _read_entries(spark, path, m["files"], schema, _cm(m))


_PRED_OPS = {
    "=", "<", "<=", ">", ">=", "in", "between", "startswith",
    "isnull", "notnull",
}


def _next_prefix(p: str) -> str | None:
    """The smallest string strictly greater than EVERY string with
    prefix ``p`` (increment the last incrementable char, drop the
    maxed tail); ``None`` when no upper bound exists.  Strings with
    prefix p are exactly the range ``[p, _next_prefix(p))`` in code-
    point order — what turns a LIKE-prefix into min/max pruning."""
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i])
        if c < 0x10FFFF:
            return p[:i] + chr(c + 1)
    return None


def _entry_may_match(entry: dict, pred: tuple, bloom_of=None) -> bool:
    """Conservative per-file predicate check against the manifest's
    envelope (and, for ``=``/``in``, the per-row-group ranges — a point
    probe inside the file's bounding box can still miss every row
    group — plus the file's bloom filter when one exists, which is the
    only check that prunes point lookups on an unclustered table).
    Missing stats, untracked columns, or incomparable types mean "may
    match" — pruning is an optimization, never a filter."""
    col, op = pred[0], pred[1]
    if entry.get("rows") == 0:
        return False  # a zero-row file matches nothing, stats or not
    if op in ("isnull", "notnull"):
        # null-count skipping needs no min/max envelope — an all-null
        # file has none yet prunes a NOT NULL scan; unknown counts
        # (legacy manifests, footer without null_count) keep the file
        nulls = entry.get("nulls", {}).get(col)
        rows = entry.get("rows")
        if nulls is None or rows is None:
            return True
        if op == "isnull":
            return nulls > 0
        return nulls < rows
    stats = entry.get("stats", {})
    env = stats.get(col)
    if env is None or env["min"] is None or env["max"] is None:
        return True
    lo, hi = env["min"], env["max"]
    if op in ("=", "in"):
        vals = pred[2] if op == "in" else [pred[2]]
        ranges = entry.get("rg", {}).get(col) or [[lo, hi]]
        bloom = (bloom_of(entry) if bloom_of is not None else {}).get(col)
        return any(
            _value_in_ranges(_json_val(v), ranges)
            and (bloom is None or _bloom_contains(bloom, _json_val(v)))
            for v in vals
            if v is not None
        )
    if op == "between":
        plo, phi = _json_val(pred[2]), _json_val(pred[3])
        below = _lt(hi, plo)
        above = _lt(phi, lo)
        return not (below is True or above is True)
    if op == "startswith":
        pfx = pred[2]
        if not (
            isinstance(pfx, str)
            and isinstance(lo, str)
            and isinstance(hi, str)
        ):
            return True  # non-string stats or value: conservative keep
        # prefixed strings occupy [pfx, _next_prefix(pfx)): the file
        # may match iff its [lo, hi] envelope intersects that range
        if hi < pfx:
            return False
        np_ = _next_prefix(pfx)
        return np_ is None or lo < np_
    v = _json_val(pred[2])
    if op == "<":  # file may hold a row < v iff its min < v
        return _lt(lo, v) is not False
    if op == "<=":
        return _lt(v, lo) is not True
    if op == ">":
        return _lt(v, hi) is not False
    if op == ">=":
        return _lt(hi, v) is not True
    raise ValueError(f"unknown predicate op {op!r}")


def _check_predicates(predicates: list[tuple]) -> None:
    for p in predicates:
        if not isinstance(p, tuple) or len(p) < 2 or p[1] not in _PRED_OPS:
            raise ValueError(
                f"bad predicate {p!r}; expected (col, op, value...) with "
                f"op in {sorted(_PRED_OPS)}"
            )
        want = (
            4 if p[1] == "between"
            else 2 if p[1] in ("isnull", "notnull")
            else 3
        )
        if len(p) != want:
            raise ValueError(f"predicate {p!r} needs {want - 2} value(s)")


def _parse_dnf(predicates) -> list[list[tuple]]:
    """Normalize a predicate argument to DNF branches (OR of ANDs).

    Two accepted shapes:

    - a plain list of tuples — the original conjunction form: one
      branch, all predicates AND-ed;
    - an OR form ``[branch, "or", branch, ...]`` where each branch is
      a single predicate tuple or a LIST of tuples (a conjunction).

    In the OR form every branch must be separated by the literal
    string ``"or"`` — adjacent branches without it are rejected rather
    than guessed at."""
    if not isinstance(predicates, (list, tuple)):
        raise ValueError(
            f"predicates must be a list, got {type(predicates).__name__}"
        )
    if not any(isinstance(x, str) for x in predicates):
        preds = list(predicates)
        _check_predicates(preds)
        return [preds]
    branches: list[list[tuple]] = []
    expect = "branch"
    for item in predicates:
        if isinstance(item, str):
            if item != "or" or expect != "or":
                raise ValueError(
                    f"misplaced {item!r} in predicate tree; the OR form "
                    "is [branch, 'or', branch, ...]"
                )
            expect = "branch"
        else:
            if expect != "branch":
                raise ValueError(
                    "adjacent branches need 'or' between them"
                )
            b = [item] if isinstance(item, tuple) else list(item)
            _check_predicates(b)
            branches.append(b)
            expect = "or"
    if expect != "or":
        raise ValueError("predicate tree ends with a dangling 'or'")
    return branches


def _physical_branches(m: dict, predicates) -> list[list[tuple]]:
    """DNF branches of a predicate tree translated to PHYSICAL column
    names, each extended with the partition-value predicates the
    table's hidden-partitioning spec implies (``sources/partition.py``)
    — the one place scan planning (driver AND distributed) builds the
    conjunctions ``_entry_may_match`` prunes with."""
    branches = _parse_dnf(predicates)
    cm = _cm(m)
    if cm:
        branches = [
            [(_phys(cm, p[0]),) + tuple(p[1:]) for p in b]
            for b in branches
        ]
    pspec = _pspec(m)
    if pspec:
        from .partition import derive_branch_preds

        branches = [b + derive_branch_preds(pspec, b) for b in branches]
    return branches


def prune_manifest(
    m: dict, predicates, bloom_of=None
) -> tuple[list[dict], list[dict]]:
    """Split a manifest's file entries into (kept, skipped) under a
    predicate tree — the reader-side half of data skipping (the merge
    path's ``_overlaps`` is the writer-side half).  ``predicates`` is
    a conjunction list or the DNF OR form (``_parse_dnf``); a file is
    kept when ANY branch's conjunction may match it (the union of
    per-branch file sets), and skipped only when its footer statistics
    (or its bloom filter, for ``=``/``in``) PROVE no branch can
    match — still strictly conservative.  Predicate columns are
    LOGICAL names; file stats are keyed physical — translated here,
    and on a partitioned table each branch also gains the implied
    partition-value predicates (day range, bucket id, truncate
    prefix), which is what makes partition pruning exact on clustered
    files with zero extra manifest structure."""
    branches = _physical_branches(m, predicates)
    kept, skipped = [], []
    for e in m["files"]:
        if any(
            all(_entry_may_match(e, p, bloom_of) for p in b)
            for b in branches
        ):
            kept.append(e)
        else:
            skipped.append(e)
    return kept, skipped


def _conjunction_to_column(preds: list[tuple]):
    cond = F.lit(True)
    for p in preds:
        col, op = F.col(p[0]), p[1]
        if op == "=":
            c = col == F.lit(p[2])
        elif op == "in":
            c = col.isin(list(p[2]))
        elif op == "between":
            c = (col >= F.lit(p[2])) & (col <= F.lit(p[3]))
        elif op == "<":
            c = col < F.lit(p[2])
        elif op == "<=":
            c = col <= F.lit(p[2])
        elif op == ">":
            c = col > F.lit(p[2])
        elif op == "startswith":
            c = col.startswith(F.lit(p[2]))
        elif op == "isnull":
            c = col.isNull()
        elif op == "notnull":
            c = col.isNotNull()
        else:
            c = col >= F.lit(p[2])
        cond = cond & c
    return cond


def _predicates_to_column(predicates):
    """The exact row-level filter for a predicate tree (pruning is
    advisory; this is what guarantees correctness)."""
    branches = _parse_dnf(predicates)
    cond = F.lit(False)
    for b in branches:
        cond = cond | _conjunction_to_column(b)
    return cond


def snap_scan(
    spark: SparkSession,
    path: str,
    predicates: list[tuple],
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
    planner: str = "auto",
    ref: str | None = None,
) -> DataFrame:
    """Predicate-pruned read of a snapshot table: files whose manifest
    statistics cannot satisfy the conjunction of ``predicates`` are
    never handed to Spark at all (zero footer reads, zero scheduler
    tasks), and the surviving files still get the exact row filter —
    manifest-level data skipping layered UNDER Spark's own row-group
    pushdown, exactly Delta/Iceberg's scan planning.  Predicates are
    tuples ``(col, op, value)`` with op in ``= < <= > >= in between
    startswith`` (``between`` takes two values, ``in`` a list,
    ``startswith`` a string prefix — LIKE 'p%' pruned as the range
    ``[p, next_prefix(p))``), AND-ed together —
    or the DNF OR form ``[branch, "or", branch, ...]`` (each branch a
    tuple or a conjunction list), pruned with the UNION of the
    branches' file sets, so an OR-of-ranges audit scan is one pruned
    pass instead of two scans.

    At 100 TB this is the difference between a point lookup scheduling
    O(table) tasks and O(matching files): on a key-clustered table
    (``zorder_write`` / ``optimize_snapshot(zorder=...)``) a point
    predicate touches one file.  Returns an empty DataFrame with the
    table schema when every file is pruned.

    ``planner`` picks where the pruning loop runs: ``"driver"`` (the
    in-memory listing), ``"distributed"`` (a Spark job over multi-part
    checkpoint shards — see ``plan_distributed``), or ``"auto"`` (the
    default: distributed exactly when a multi-part checkpoint exists
    and no reconstruction is cached, i.e. when the listing is ≥ ~50k
    entries and cold — the regime where the driver loop is the
    planner's bottleneck).

    ``ref`` scans a NAMED ref (``sources/refs.py``): a tag resolves
    to its pinned version, a branch to the branch table's CURRENT."""
    if ref is not None:
        from .refs import resolve_ref

        if version is not None:
            raise ValueError(
                "snap_scan: pass ref OR version, not both"
            )
        kind, val = resolve_ref(path, ref, fs)
        if kind == "branch":
            return snap_scan(spark, val, predicates, None, fs, planner)
        version = val
    if planner != "driver":
        from .plan_distributed import plan_scan_entries

        planned = plan_scan_entries(
            spark, path, predicates, version, fs, planner
        )
        if planned is not None:
            entries, raw = planned
            meta = {
                "files": entries,
                "stats_cols": raw.get("stats_cols") or [],
                "column_mapping": raw.get("column_mapping"),
                "partition_spec": raw.get("partition_spec"),
            }
            kept, _ = prune_manifest(
                meta, predicates, _bloom_loader(path, fs)
            )
            schema = _manifest_schema(raw)
            cond = _predicates_to_column(predicates)
            if not kept:
                if schema is None:
                    return (
                        snap_read(spark, path, version, fs)
                        .filter(cond)
                        .limit(0)
                    )
                return spark.createDataFrame([], schema)
            return _read_entries(
                spark, path, kept, schema, _cm(raw)
            ).filter(cond)
    m = read_manifest(path, version, fs)
    kept, _ = prune_manifest(m, predicates, _bloom_loader(path, fs))
    schema = _manifest_schema(m)
    cond = _predicates_to_column(predicates)
    if not kept:
        if schema is None:
            return snap_read(spark, path, version, fs).filter(cond).limit(0)
        return spark.createDataFrame([], schema)
    return _read_entries(spark, path, kept, schema, _cm(m)).filter(cond)


def _read_entries_pos(
    spark: SparkSession,
    path: str,
    entries: list[dict],
    schema: StructType | None,
    cm: dict | None = None,
) -> DataFrame:
    """One scan over ``entries`` carrying each row's physical position
    (``_sg_file``, ``_sg_pos`` from the parquet reader's ``_metadata``),
    with existing deletion vectors already applied.  The position
    columns must be bound on the scan relation itself (``_metadata`` is
    a scan-level hidden column — it does not survive a union), which is
    why this is a separate single-scan path from ``_read_entries``."""
    cm = cm or {}
    if schema is not None:
        reader = spark.read.schema(_phys_schema(schema, cm))
    else:
        reader = spark.read
    df = reader.parquet(
        *[_entry_path(path, e) for e in entries]
    ).withColumns(
        {
            "_sg_file": F.col("_metadata.file_name"),
            "_sg_pos": F.col("_metadata.row_index"),
        }
    )
    dved = [e for e in entries if e.get("dv")]
    if dved:
        sidecars = sorted(
            {_dv_path(path, e) for e in dved}
        )
        dv = (
            spark.read.parquet(*sidecars)
            .filter(F.col("file_name").isin([e["name"] for e in dved]))
            .select(
                F.col("file_name").alias("_sg_file"),
                F.col("pos").alias("_sg_pos"),
            )
        )
        df = df.join(F.broadcast(dv), ["_sg_file", "_sg_pos"], "left_anti")
    return _to_logical(df, cm)


def _write_dv_sidecar(
    spark: SparkSession,
    positions: DataFrame,
    path: str,
    fs: LocalSnapshotFS | None = None,
) -> tuple[str, dict[str, int]]:
    """Write a ``(file_name, pos)`` deletion-vector sidecar as ONE
    parquet file under ``path`` and return its name plus the per-file
    position counts read back from it (one tiny scan of the sidecar —
    the counts become the manifest entries' ``dv.rows``, so they must
    describe what was actually written, not what was planned)."""
    f = _fs(fs)
    staging = os.path.join(path, f"_stage-{uuid.uuid4().hex[:12]}")
    positions.coalesce(1).write.mode("errorifexists").parquet(staging)
    name = None
    for n in sorted(f.listdir(staging)):
        if n.startswith("part-") and n.endswith(".parquet"):
            name = f"dv-{uuid.uuid4().hex[:12]}.parquet"
            f.rename(os.path.join(staging, n), os.path.join(path, name))
            break
    f.rmtree(staging)
    if name is None:  # zero-row frame wrote no part file
        return "", {}
    counts = {
        r["file_name"]: r["n"]
        for r in spark.read.parquet(os.path.join(path, name))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        f.remove(os.path.join(path, name))
        return "", {}
    return name, counts


def _delete_mor(
    spark: SparkSession,
    path: str,
    candidate_fn,
    match_fn,
    op_name: str,
    txn_app: str | None,
    txn_batch: int | None,
    fs: LocalSnapshotFS | None,
    isolation: str = "write_serializable",
) -> dict:
    """Shared merge-on-read DELETE core: find matching row POSITIONS in
    the candidate files, record them in a deletion-vector sidecar, and
    commit a manifest whose affected entries point at the sidecar — no
    data file is rewritten.  ``candidate_fn(manifest) -> entries`` picks
    the files that can hold matches (manifest-stats pruning);
    ``match_fn(df) -> df`` filters a DataFrame to the rows to delete."""
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        if _txn_already_applied(m, txn_app, txn_batch):
            return _skipped_result(m)
        schema = _manifest_schema(m)
        candidates = candidate_fn(m)
        if not candidates:
            return _skipped_result(m)
        # positions of NEWLY deleted rows: live rows (existing DVs
        # applied) in candidate files that match the delete condition
        cand_live = _read_entries_pos(
            spark, path, candidates, schema, _cm(m)
        )
        new_pos = match_fn(cand_live).select(
            F.col("_sg_file").alias("file_name"),
            F.col("_sg_pos").alias("pos"),
        )
        # carry forward the already-recorded positions of candidate
        # files so each affected entry points at ONE complete sidecar
        old_dved = [e for e in candidates if e.get("dv")]
        if old_dved:
            old_sidecars = sorted(
                {
                    _dv_path(path, e)
                    for e in old_dved
                }
            )
            old_pos = (
                spark.read.parquet(*old_sidecars)
                .filter(
                    F.col("file_name").isin([e["name"] for e in old_dved])
                )
                .select("file_name", "pos")
            )
            all_pos = new_pos.unionByName(old_pos).distinct()
        else:
            all_pos = new_pos
        sidecar, totals = _write_dv_sidecar(spark, all_pos, path, fs)
        old_rows = {
            e["name"]: e["dv"]["rows"] for e in candidates if e.get("dv")
        }
        if not totals or totals == old_rows:
            # nothing newly deleted: drop the redundant sidecar, no commit
            if sidecar:
                _fs(fs).remove(os.path.join(path, sidecar))
            return _skipped_result(m)

        files: list[dict] = []
        adds: list[dict] = []  # repointed entries (explicit commit delta)
        removes: list[str] = []
        fully_deleted = 0
        for e in m["files"]:
            t = totals.get(e["name"])
            if t is None:
                files.append(e)
            elif t >= e["rows"]:
                fully_deleted += 1  # every row dead: drop the entry
                removes.append(e["name"])
            else:
                e2 = {k: v for k, v in e.items() if k != "dv"}
                e2["dv"] = {"file": sidecar, "rows": t}
                # the sidecar landed in THIS table's dir; a borrowed
                # entry's data bytes live elsewhere, so the dv record
                # must carry its own resolution dir (_dv_path)
                if e2.get("base") and os.path.abspath(
                    e2["base"]
                ) != os.path.abspath(path):
                    e2["dv"]["base"] = os.path.abspath(path)
                files.append(e2)
                removes.append(e["name"])
                adds.append(e2)
        n_new = sum(totals.values()) - sum(old_rows.values())
        txns = dict(m.get("txns", {}))
        if txn_app is not None:
            txns[txn_app] = int(txn_batch)
        info = {
            "op": op_name,
            "deleted": n_new,
            "dv_files": len(totals),
            "dropped_files": fully_deleted,
        }
        if txn_app is not None:
            info["txn"] = {"app": txn_app, "batch": int(txn_batch)}
        try:
            version = _commit(
                path, files, m["stats_cols"],
                base_version=m["version"],
                schema_json=m.get("schema"),
                txns=txns, commit_info=info, fs=fs, carry=m,
                adds=adds, removes=removes,
            )
        except CommitConflict as e:
            version = _rebase_after_conflict(
                path, m, fs,
                adds=adds, removes=removes,
                read_files=[c["name"] for c in candidates],
                candidate_fn=candidate_fn, isolation=isolation,
                txn_app=txn_app, txn_batch=txn_batch,
                commit_info=info,
            )
            if version is None:
                last_err = e
                continue
        return {
            "version": version,
            "deleted": n_new,
            "dv_files": len(totals) - fully_deleted,
            "dropped_files": fully_deleted,
            "rewritten": 0,
            "carried": len(files),
        }
    raise CommitConflict(
        f"{op_name}: lost the commit race {COMMIT_RETRIES} times at "
        f"{path!r}"
    ) from last_err


def delete_where_mor(
    spark: SparkSession,
    path: str,
    predicates: list[tuple],
    txn_app: str | None = None,
    txn_batch: int | None = None,
    fs: LocalSnapshotFS | None = None,
    isolation: str = "write_serializable",
) -> dict:
    """Merge-on-read DELETE WHERE: rows matching the predicate
    conjunction (same grammar as ``snap_scan``) are masked by deletion
    vectors instead of rewriting their files.

    Copy-on-write turns a 1-row delete in a 1 GB file into a 1 GB
    rewrite; here the write cost is O(matched positions) — a sidecar
    parquet of ``(file_name, pos)`` — and the read cost is a broadcast
    positional anti-join on only the DV'd files.  The debt is paid at
    compaction: ``optimize_snapshot``/``auto_compact`` treat DV'd files
    as rewrite candidates and fold the vectors away.  Positions come
    from the parquet reader's ``_metadata.row_index``, which is the
    row's ordinal within its immutable file — stable by the layer's
    files-are-never-modified contract.  Pruning via ``prune_manifest``
    bounds the scan to files whose stats can match; commits carry the
    usual base-version claim, retry loop, and optional txn marker.
    Returns ``{"version", "deleted", "dv_files", "dropped_files", ...}``
    (``dropped_files`` counts files whose every row died — their
    entries leave the manifest entirely).

    ``isolation`` governs how a lost commit race against a concurrent
    BLIND APPEND resolves (see ``_rebase_after_conflict``): under
    ``"write_serializable"`` (the default, Delta's) the delete is
    serialized BEFORE the append — concurrently appended rows survive
    even when they match; ``"serializable"`` re-runs instead, so the
    delete also sees them.  Winner-added files whose statistics prove
    no match rebase without re-running under either level."""
    _check_predicates(predicates)
    _check_isolation(isolation)
    cond = _predicates_to_column(predicates)
    return _delete_mor(
        spark, path,
        candidate_fn=lambda m: prune_manifest(
            m, predicates, _bloom_loader(path, fs)
        )[0],
        match_fn=lambda df: df.filter(cond),
        op_name="delete_where_mor",
        txn_app=txn_app, txn_batch=txn_batch, fs=fs,
        isolation=isolation,
    )


def delete_keys_mor(
    spark: SparkSession,
    path: str,
    keys_df: DataFrame,
    keys: list[str],
    txn_app: str | None = None,
    txn_batch: int | None = None,
    fs: LocalSnapshotFS | None = None,
    isolation: str = "write_serializable",
) -> dict:
    """Merge-on-read DELETE by key set (the CDC-delete shape): every
    table row whose key appears in ``keys_df`` is masked by a deletion
    vector; no data file is rewritten.  File candidates come from the
    same key-membership pruning as the CoW merge (exact row-group probe
    for bounded batches); matching is a broadcast LEFT SEMI join on the
    keys.  NULL keys are rejected loudly — a NULL key can never match
    its target row (same rule as the CoW mutators).  ``isolation`` as
    in ``delete_where_mor``."""
    _check_isolation(isolation)
    kdf = keys_df.select(*keys).distinct()
    # kdf is already distinct, so the fused audit can only flag NULL
    # keys (duplicates are legal in a delete batch and collapse above)
    probe, bad = _batch_key_audit(kdf, keys)
    if bad:
        raise ValueError(
            "delete_keys_mor: NULL key in delete batch — SQL joins never "
            "match NULLs, so the delete would silently miss its target; "
            "coalesce keys upstream"
        )
    if probe.get("empty"):
        return _skipped_result(read_manifest(path, fs=fs))

    def _cands(m: dict) -> list[dict]:
        cm = _cm(m)
        missing = [
            k for k in keys if _phys(cm, k) not in m["stats_cols"]
        ]
        if missing:
            raise ValueError(
                f"delete keys {missing} not tracked in manifest stats_cols "
                f"{m['stats_cols']}; re-init the table tracking them"
            )
        bl = _bloom_loader(path, fs)
        return [
            e for e in m["files"] if _overlaps(e, probe, keys, bl, cm)
        ]

    return _delete_mor(
        spark, path,
        candidate_fn=_cands,
        match_fn=lambda df: df.join(F.broadcast(kdf), keys, "left_semi"),
        op_name="delete_keys_mor",
        txn_app=txn_app, txn_batch=txn_batch, fs=fs,
        isolation=isolation,
    )


def _batch_key_probe(batch_keys: DataFrame, keys: list[str]) -> dict:
    """Collect the batch's pruning probe in ONE action: distinct key
    rows up to ``KEY_PROBE_CAP`` (for exact row-group membership
    checks), falling back to bounding boxes only for oversized batches.
    Returns ``{"lows", "highs", "key_rows"}`` with values normalized by
    ``_json_val``; ``key_rows`` is ``None`` on fallback."""
    distinct = batch_keys.distinct().limit(KEY_PROBE_CAP + 1)
    # r15 optimization (guide §4/§5): for the common key types the
    # probe transfers as ONE Arrow batch instead of up to 100k pickled
    # Rows (measured 0.87 s of a single CDC commit's driver wall).
    # int/string arrow scalars convert to the same Python values a
    # collected Row carries, so the probe dict is byte-identical;
    # types with divergent canonical forms (timestamps, decimals,
    # bytes) keep the row path.
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    _simple = (ByteType, ShortType, IntegerType, LongType, StringType)
    if all(
        isinstance(batch_keys.schema[k].dataType, _simple) for k in keys
    ):
        tbl = distinct.toArrow()
        cols = {k: tbl.column(k).to_pylist() for k in keys}
        rows = [
            {k: cols[k][i] for k in keys} for i in range(tbl.num_rows)
        ]
    else:
        rows = [{k: r[k] for k in keys} for r in distinct.collect()]
    if not rows:
        return {"lows": {}, "highs": {}, "key_rows": [], "empty": True}
    if len(rows) > KEY_PROBE_CAP:
        bounds = batch_keys.agg(
            *[F.min(k).alias(f"lo_{k}") for k in keys],
            *[F.max(k).alias(f"hi_{k}") for k in keys],
        ).collect()[0]
        return {
            "lows": {k: _json_val(bounds[f"lo_{k}"]) for k in keys},
            "highs": {k: _json_val(bounds[f"hi_{k}"]) for k in keys},
            "key_rows": None,
        }
    key_rows = [{k: _json_val(r[k]) for k in keys} for r in rows]
    lows: dict = {}
    highs: dict = {}
    for k in keys:
        vals = [r[k] for r in key_rows if r[k] is not None]
        lows[k] = min(vals) if vals else None
        highs[k] = max(vals) if vals else None
    return {"lows": lows, "highs": highs, "key_rows": key_rows}


def _batch_key_audit(
    batch_keys: DataFrame, keys: list[str], op_col: str | None = None
):
    """ONE action serving both the pruning probe and the illegal-key
    validation every keyed mutator runs (r15 optimization, guide §1.2:
    the two separate actions each re-executed the batch lineage).

    ``groupBy(keys).count()`` carries exactly the distinct key rows the
    probe collects PLUS the per-key multiplicity and null-ness the
    validators need, so for batches under ``KEY_PROBE_CAP`` with
    int/string keys everything comes back in one Arrow transfer.
    Over-cap or non-simple-typed batches fall back to the classic two
    actions (a capped slice cannot prove the absence of duplicates) —
    never more work than before, one pass fewer on the common shape.

    ``op_col`` (r16, apply_cdc_cow): ride the upper-cased distinct op
    codes and per-op row counts on the SAME action (a
    ``collect_set``/``count`` pair per key group), replacing the
    separate ``groupBy(op)`` action the CDC path ran first.  When set,
    the return is a 3-tuple ``(probe, bad, opinfo)`` with ``opinfo``
    either ``{"ops": set, "counts": {op: rows}, "has_null_op": bool}``
    or ``None`` when this audit fell back to a classic path (the
    caller then runs its own op action, total actions as before).

    Returns ``(probe, bad)``: ``probe`` exactly as ``_batch_key_probe``
    returns it; ``bad`` is ``None`` or ``({key: value}, had_null)`` for
    one offending key (duplicate or NULL) — callers raise their own
    operation-specific message.
    """
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    def _ret(probe, bad, opinfo=None):
        return (probe, bad, opinfo) if op_col is not None else (probe, bad)

    _simple = (ByteType, ShortType, IntegerType, LongType, StringType)
    if all(
        isinstance(batch_keys.schema[k].dataType, _simple) for k in keys
    ):
        aggs = [F.count(F.lit(1)).alias("__n")]
        if op_col is not None:
            up = F.upper(F.col(op_col))
            aggs.append(F.collect_set(up).alias("__ops"))
            aggs.append(F.count(up).alias("__nn"))
        tbl = (
            batch_keys.groupBy(*keys)
            .agg(*aggs)
            .limit(KEY_PROBE_CAP + 1)
            .toArrow()
        )
        if tbl.num_rows > KEY_PROBE_CAP:
            # over-cap: this capped slice can prove neither
            # duplicate-freedom nor bounds — run the full dup/null
            # check and the bounding-box agg directly (total actions
            # equal the pre-fusion path's over-cap count)
            key_rel = batch_keys.select(*keys)
            rows = _bad_key_rows(key_rel, keys)
            bad = None
            if rows:
                r = rows[0]
                bad = (
                    {k: r[k] for k in keys},
                    any(r[k] is None for k in keys),
                )
            bounds = key_rel.agg(
                *[F.min(k).alias(f"lo_{k}") for k in keys],
                *[F.max(k).alias(f"hi_{k}") for k in keys],
            ).collect()[0]
            return _ret(
                {
                    "lows": {
                        k: _json_val(bounds[f"lo_{k}"]) for k in keys
                    },
                    "highs": {
                        k: _json_val(bounds[f"hi_{k}"]) for k in keys
                    },
                    "key_rows": None,
                },
                bad,
            )
        # at-or-under cap (the over-cap branch returned above): the
        # capped slice is the FULL distinct-key relation, so it serves
        # validation and probe in one pass
        cols = {k: tbl.column(k).to_pylist() for k in keys}
        ns = tbl.column("__n").to_pylist()
        opinfo = None
        if op_col is not None:
            ops_lists = tbl.column("__ops").to_pylist()
            nns = tbl.column("__nn").to_pylist()
            counts: dict = {}
            ops_all: set = set()
            for i in range(tbl.num_rows):
                ops_all.update(ops_lists[i])
                for o in ops_lists[i]:
                    # exact row counts only matter on the success path,
                    # where every group holds ONE row of ONE op; a bad
                    # batch raises before these counts are consumed
                    counts[o] = counts.get(o, 0) + ns[i]
            opinfo = {
                "ops": ops_all,
                "counts": counts,
                "has_null_op": any(
                    nns[i] < ns[i] for i in range(tbl.num_rows)
                ),
            }
        bad = None
        for i in range(tbl.num_rows):
            had_null = any(cols[k][i] is None for k in keys)
            if had_null or ns[i] > 1:
                bad = ({k: cols[k][i] for k in keys}, had_null)
                break
        if tbl.num_rows == 0:
            return _ret(
                {"lows": {}, "highs": {}, "key_rows": [],
                 "empty": True},
                None,
                opinfo,
            )
        key_rows = [
            {k: _json_val(cols[k][i]) for k in keys}
            for i in range(tbl.num_rows)
        ]
        lows: dict = {}
        highs: dict = {}
        for k in keys:
            vals = [r[k] for r in key_rows if r[k] is not None]
            lows[k] = min(vals) if vals else None
            highs[k] = max(vals) if vals else None
        return _ret(
            {"lows": lows, "highs": highs, "key_rows": key_rows},
            bad,
            opinfo,
        )
    # classic fallback: the full-relation dup/null check plus the
    # capped/bounding-box probe, two actions as before
    key_rel = batch_keys.select(*keys)
    rows = _bad_key_rows(key_rel, keys)
    bad = None
    if rows:
        r = rows[0]
        bad = (
            {k: r[k] for k in keys},
            any(r[k] is None for k in keys),
        )
    return _ret(_batch_key_probe(key_rel, keys), bad)


def _value_in_ranges(v, ranges: list[list]) -> bool:
    """Conservative membership of a normalized value in a list of
    [lo, hi] ranges (incomparable types count as inside)."""
    for lo, hi in ranges:
        if lo is None or hi is None:
            return True
        below = _lt(v, lo)
        above = _lt(hi, v)
        if below is None or above is None:
            return True
        if not below and not above:
            return True
    return False


def _overlaps(
    entry: dict, probe: dict, keys: list[str], bloom_of=None,
    cm: dict | None = None,
) -> bool:
    """Conservative file-level predicate: the file MAY hold an updated
    key.  First the envelope check (file [min,max] vs batch [min,max]);
    then, when the batch's key set was collected, an exact membership
    check of each key against the file's per-row-group ranges — this is
    what stops a 2-key batch at opposite ends of the keyspace from
    overlapping every file — and, when the file carries per-column
    bloom filters, a bloom probe per key (the layout-independent check:
    on an UNCLUSTERED table the ranges span everything and only the
    bloom can prune).  Missing stats or incomparable types -> must
    assume overlap."""
    cm = cm or {}
    stats = entry.get("stats", {})
    for c in keys:
        lo, hi = probe["lows"].get(c), probe["highs"].get(c)
        env = stats.get(_phys(cm, c))
        if env is None or env["min"] is None or env["max"] is None:
            continue
        if lo is None or hi is None:
            continue
        below = _lt(env["max"], lo)
        above = _lt(hi, env["min"])
        if below is None or above is None:
            continue
        if below or above:
            return False
    key_rows = probe.get("key_rows")
    if key_rows is None:
        return True
    # exact key-set membership against per-row-group ranges (fall back
    # to the whole-file envelope for columns without range info) and
    # per-column blooms; a key row hits the file only when EVERY
    # checkable column admits its value
    blooms = bloom_of(entry) if bloom_of is not None else {}
    checkable = []
    for c in keys:
        pc = _phys(cm, c)
        ranges = entry.get("rg", {}).get(pc)
        if not ranges and stats.get(pc) and stats[pc]["min"] is not None:
            ranges = [[stats[pc]["min"], stats[pc]["max"]]]
        bloom = blooms.get(pc)
        if ranges or bloom:
            checkable.append((c, ranges, bloom))
    if not checkable:
        return True
    for row in key_rows:
        hit = True
        for c, ranges, bloom in checkable:
            v = row[c]
            if v is None:
                continue
            if ranges and not _value_in_ranges(v, ranges):
                hit = False
                break
            if bloom is not None and not _bloom_contains(bloom, v):
                hit = False
                break
        if hit:
            return True
    return False


def _check_batch_schema(
    target: StructType,
    batch_schema: StructType,
    ignore: set[str],
    allow_schema_evolution: bool,
    op_name: str,
) -> StructType:
    """Validate a mutation batch's schema against the table schema by
    (name, type) and return the post-commit schema.  Existing columns
    must match exactly (same-name/different-type is rejected — silent
    casts would write a divergent physical schema into the table);
    missing columns are rejected (a dropped column is a typo until
    proven otherwise); NEW columns are accepted only under
    ``allow_schema_evolution`` and are appended to the schema."""
    tgt = {f.name: f.dataType for f in target.fields}
    batch_fields = [f for f in batch_schema.fields if f.name not in ignore]
    bat = {f.name: f.dataType for f in batch_fields}
    missing = sorted(set(tgt) - set(bat))
    if missing:
        raise ValueError(
            f"{op_name}: batch columns {sorted(bat)} != table columns "
            f"{sorted(tgt)} (missing {missing}); silent projection would "
            "mask typos and drop data"
        )
    mismatched = [
        (n, str(tgt[n]), str(bat[n]))
        for n in tgt
        if bat[n] != tgt[n]
    ]
    if mismatched:
        hint = ""
        if all(_is_widening(tgt[n], bat[n]) for n, _, _ in mismatched):
            # every mismatch is a lossless widening of the TABLE type:
            # the user probably wants the table widened, not the batch
            # narrowed — point at the metadata-only DDL
            hint = (
                "; these are lossless widenings of the table's types — "
                "run snap_widen_column first if the TABLE should widen "
                "(metadata-only), or cast the batch down"
            )
        raise ValueError(
            f"{op_name}: batch column types differ from table: "
            f"{mismatched}; cast the batch explicitly — a silent cast "
            f"would write a divergent physical schema{hint}"
        )
    new = [f for f in batch_fields if f.name not in tgt]
    if new and not allow_schema_evolution:
        raise ValueError(
            f"{op_name}: batch columns {sorted(bat)} != table columns "
            f"{sorted(tgt)} (new columns "
            f"{sorted(f.name for f in new)}); pass "
            "allow_schema_evolution=True to add them"
        )
    return StructType(list(target.fields) + new)


def _txn_already_applied(
    m: dict, txn_app: str | None, txn_batch: int | None
) -> bool:
    if txn_app is None or txn_batch is None:
        return False
    last = m.get("txns", {}).get(txn_app)
    return last is not None and int(last) >= int(txn_batch)


def _skipped_result(m: dict) -> dict:
    return {
        "version": m["version"],
        "rewritten": 0,
        "carried": len(m["files"]),
        "added": 0,
        "skipped": True,
    }


# --------------------------------------------------------------------------
# Logical conflict resolution (rebase instead of re-run)
# --------------------------------------------------------------------------
# A lost commit race does not have to mean redoing the operation's
# work.  Every commit record since round 8 stores its exact delta
# (``adds``/``removes`` vs the base), so after ``CommitConflict`` a
# mutator can examine what the winning commits actually changed and —
# when those changes provably do not interact with what it read or
# rewrote — re-commit its ALREADY-COMPUTED adds/removes against the
# new table head.  This is the Delta Lake conflict-detection protocol
# (Armbrust et al., VLDB 2020, §3.2): without it, an OPTIMIZE that
# rewrote gigabytes repeats the whole rewrite because a 1-row append
# won the race — at 1000-executor scale, background compaction on a
# hot append stream would never converge.
#
# Serial-order argument (why a rebased commit is correct):
#   the serial order is COMMIT order (winners first, us second).  Our
#   outcome is valid in that order iff our reads were unaffected by
#   the winners' writes: (a) no winner removed or re-pointed a file we
#   read or rewrote, and (b) no winner ADDED a file our operation
#   would have read.  (b) is decided by the operation's own candidate
#   pruning run against the winner's added entries — if their stats
#   prove the new files cannot hold a matching row, our candidate set
#   is unchanged and the rebase is fully SERIALIZABLE.  Two special
#   cases: a rearrangement (OPTIMIZE/cluster) reads nothing
#   semantically — its claim is "these input files' rows, reorganized"
#   — so winner adds never conflict; and under WRITE-SERIALIZABLE
#   isolation (Delta's default) a winner's blind append is tolerated
#   even when it might match, by serializing US first and the append
#   second — the one permitted anomaly is that a predicate mutation
#   does not see rows whose append committed concurrently.
#   Any table-metadata drift (schema, column mapping, constraints,
#   stats columns) always conflicts: our rewritten bytes were produced
#   under the old metadata.

_BLIND_APPEND_OPS = {"append", "stream_sink", "batch_append", "batch_create"}
_ISOLATION_LEVELS = ("serializable", "write_serializable")


def _check_isolation(level: str) -> None:
    if level not in _ISOLATION_LEVELS:
        raise ValueError(
            f"isolation must be one of {_ISOLATION_LEVELS}, got {level!r}"
        )


def _rebase_after_conflict(
    path: str,
    base_m: dict,
    fs: LocalSnapshotFS | None,
    *,
    adds: list[dict],
    removes: list[str],
    read_files,
    candidate_fn=None,
    rearrange_only: bool = False,
    isolation: str = "write_serializable",
    schema_json: str | None = None,
    txn_app: str | None = None,
    txn_batch: int | None = None,
    commit_info: dict | None = None,
) -> int | None:
    """Try to re-commit a conflicted operation's outcome on the new
    head without redoing its work (see the block comment above).

    ``base_m`` is the manifest the operation derived its outcome from;
    ``adds``/``removes`` its explicit delta; ``read_files`` the names
    of every file it read (its candidate set); ``candidate_fn`` the
    operation's own pruning (``manifest -> candidate entries``), used
    to prove winner-added files invisible; ``rearrange_only`` marks
    data rearrangements for which winner adds never conflict.  Returns
    the committed version, or ``None`` when the conflict is real and
    the caller must re-run."""
    f = _fs(fs)
    touched = set(read_files) | set(removes)
    for _ in range(COMMIT_RETRIES):
        try:
            m_now = read_manifest(path, fs=fs)
        except FileNotFoundError:
            return None
        if m_now["version"] <= base_m["version"]:
            return None  # stale CURRENT pointer mid-swap: re-run
        for k in ("schema", "column_mapping", "constraints", "stats_cols"):
            if base_m.get(k) != m_now.get(k):
                return None
        if _txn_already_applied(m_now, txn_app, txn_batch):
            return None  # caller's loop owns the skip semantics
        for v in range(base_m["version"] + 1, m_now["version"] + 1):
            try:
                rec = json.loads(f.read_text(_manifest_path(path, v)))
            except FileNotFoundError:
                return None
            if "files" in rec:
                return None  # legacy full-listing record: no delta
            w_rm = set(rec.get("removes") or ())
            w_add = rec.get("adds") or []
            if w_rm & touched:
                return None
            if any(e["name"] in touched for e in w_add):
                return None
            if w_add and not rearrange_only:
                invisible = False
                if candidate_fn is not None:
                    pseudo = {
                        "files": list(w_add),
                        "stats_cols": base_m["stats_cols"],
                        "column_mapping": base_m.get("column_mapping"),
                    }
                    try:
                        invisible = not candidate_fn(pseudo)
                    except Exception:
                        invisible = False
                if not invisible:
                    blind = (
                        isolation == "write_serializable"
                        and not w_rm
                        and (rec.get("commit_info") or {}).get("op")
                        in _BLIND_APPEND_OPS
                    )
                    if not blind:
                        return None
        rm_set = set(removes)
        files2 = [
            e for e in m_now["files"] if e["name"] not in rm_set
        ] + list(adds)
        txns2 = dict(m_now.get("txns", {}))
        if txn_app is not None:
            txns2[txn_app] = int(txn_batch)
        info = dict(commit_info or {})
        info["rebased_over"] = m_now["version"] - base_m["version"]
        try:
            return _commit(
                path, files2, m_now["stats_cols"],
                base_version=m_now["version"],
                schema_json=(
                    m_now.get("schema") if schema_json is None
                    else schema_json
                ),
                txns=txns2, commit_info=info, fs=fs, carry=m_now,
                adds=list(adds), removes=list(removes),
            )
        except CommitConflict:
            continue  # a newer winner: re-validate against the new head
    return None


def _bad_key_rows(batch: DataFrame, keys: list[str]) -> list:
    """One action catching BOTH illegal key shapes: duplicate keys
    (MERGE's multiple-matches rule) and NULL keys (equi/anti joins never
    match SQL NULL, so a NULL-keyed mutation would silently duplicate
    rows rather than replace them — the same reason Delta/Iceberg MERGE
    predicates on NULL keys match nothing).  Returns up to one
    offending key tuple's row."""
    null_pred = F.lit(False)
    for k in keys:
        null_pred = null_pred | F.isnull(F.col(k))
    return (
        batch.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) | null_pred)
        .limit(1)
        .collect()
    )


def merge_upsert_cow(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    allow_schema_evolution: bool = False,
    txn_app: str | None = None,
    txn_batch: int | None = None,
    fs: LocalSnapshotFS | None = None,
    isolation: str = "write_serializable",
) -> dict:
    """File-level copy-on-write MERGE into a snapshot table.

    Rows in ``updates`` replace target rows with the same key; new keys
    are inserted.  Only files whose key statistics overlap the batch are
    read and rewritten (exact key-set membership against per-row-group
    ranges for bounded batches; bounding boxes beyond
    ``KEY_PROBE_CAP``); all other files are carried by reference.  A
    batch with duplicate keys is rejected (MERGE's multiple-matches
    rule).  Partition/clustering migration cannot leave stale copies by
    construction: pruning is on KEY statistics, so every file that could
    hold an old copy of an updated key is rewritten.  A lost commit race
    re-reads the winner's manifest and re-derives the merge (bounded
    retries).  With ``txn_app``/``txn_batch`` the commit is idempotent:
    a marker already recorded in the manifest skips the batch.  Returns
    ``{"version", "rewritten", "carried", "added"}`` (+``skipped``).
    ``isolation`` as in ``delete_where_mor`` — a lost race whose
    winners provably don't overlap this batch's keys re-commits the
    already-written files instead of re-deriving the merge.
    """
    _check_isolation(isolation)
    # NOTE (r16, measured-and-rejected): persisting the batch lineage
    # for the call's 3 consumers (audit, key broadcast, CoW rewrite)
    # was A/B'd and REVERTED — building the InMemoryRelation cost more
    # than the re-scans it saved (matview_orders 3.96 -> 4.48 s).
    probe, bad = _batch_key_audit(updates.select(*keys), keys)
    if bad:
        row, had_null = bad
        if had_null:
            raise ValueError(
                f"merge_upsert_cow: NULL merge key in batch row "
                f"{tuple(row[k] for k in keys)!r} — SQL equi/anti joins "
                "never match NULLs, so a NULL-keyed merge would silently "
                "duplicate instead of replacing; coalesce keys upstream"
            )
        raise ValueError(
            f"merge_upsert_cow: update batch has multiple rows for key "
            f"{tuple(row[k] for k in keys)!r}; dedup the batch first"
        )
    if probe.get("empty"):
        # empty batch: a commit would only add an empty file per call —
        # an at-least-once upstream retrying empties must not grow the
        # version chain
        return _skipped_result(read_manifest(path, fs=fs))

    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        if _txn_already_applied(m, txn_app, txn_batch):
            return _skipped_result(m)
        stats_cols = m["stats_cols"]
        cm = _cm(m)
        _reject_identity(m, "merge_upsert_cow")
        missing = [k for k in keys if _phys(cm, k) not in stats_cols]
        if missing:
            raise ValueError(
                f"merge keys {missing} not tracked in manifest stats_cols "
                f"{stats_cols}; re-init the table tracking them"
            )
        target_schema = _manifest_schema(m) or snap_read(
            spark, path, m["version"], fs
        ).schema
        out_schema = _check_batch_schema(
            target_schema, updates.schema, set(), allow_schema_evolution,
            "merge_upsert_cow",
        )
        _guard_new_columns(m, target_schema, out_schema, "merge_upsert_cow")
        out_cols = [f.name for f in out_schema.fields]

        _enforce_constraints(
            m, updates.select(*out_cols), "merge_upsert_cow"
        )
        bl = _bloom_loader(path, fs)
        overlapping, carried = [], []
        for f_entry in m["files"]:
            (overlapping if _overlaps(f_entry, probe, keys, bl, cm)
             else carried).append(f_entry)

        track = bool(m.get("row_tracking"))
        ins_out = None  # tracked tables: true inserts, fresh ids
        if overlapping:
            # reading with the POST-commit schema null-backfills any
            # newly added columns in the old files; _read_entries
            # applies deletion vectors, so a rewrite folds them away
            if track:
                # id preservation (row-tracking phase 2): surviving
                # rows keep their ids; an UPDATED row keeps the OLD
                # row's id under its new values (it is the same
                # logical row — the Delta preserved-row-ID semantic);
                # true inserts split into their own files so the
                # watermark assigns them fresh ids as metadata
                old = _read_entries_with_ids(
                    spark, path, overlapping, out_schema, cm
                )
                remaining = old.join(
                    F.broadcast(updates.select(*keys).distinct()),
                    keys,
                    "left_anti",
                )
                # one id per key even if the target held duplicate
                # keys (the merge replaces the whole set with ONE
                # row): the surviving identity is the smallest id
                old_ids = (
                    old.select(*keys, ROW_ID_COL)
                    .groupBy(*keys)
                    .agg(F.min(ROW_ID_COL).alias(ROW_ID_COL))
                )
                updated = (
                    updates.select(*out_cols)
                    .join(old_ids, keys, "inner")
                )
                out = remaining.unionByName(updated)
                ins_out = updates.select(*out_cols).join(
                    old_ids.select(*keys), keys, "left_anti"
                )
            else:
                old = _read_entries(
                    spark, path, overlapping, out_schema, cm
                )
                remaining = old.join(
                    F.broadcast(updates.select(*keys).distinct()),
                    keys,
                    "left_anti",
                )
                out = remaining.unionByName(updates.select(*out_cols))
        else:
            out = updates.select(*out_cols)
        # keep file count ≈ rewritten count: without this the union
        # inherits the shuffle partitioning and a 1-file rewrite fans
        # out into dozens of small files, compounding per merge
        # key-sorted rewrite output: tight per-row-group key ranges in
        # the new files, so FUTURE merges' row-group membership probes
        # prune inside them (sort cost is row-local, no extra shuffle)
        out = out.coalesce(max(1, len(overlapping))).sortWithinPartitions(
            *keys
        )
        new_entries = _write_data_files(
            spark, out, path, stats_cols, fs, cm, pspec=_pspec(m)
        )
        if track and overlapping:
            for e in new_entries:
                e["row_id_col"] = True
            ins_entries = _write_data_files(
                spark,
                ins_out.coalesce(1).sortWithinPartitions(*keys),
                path, stats_cols, fs, cm, pspec=_pspec(m),
            )
            new_entries = new_entries + ins_entries
        txns = dict(m.get("txns", {}))
        if txn_app is not None:
            txns[txn_app] = int(txn_batch)
        info = {
            "op": "merge_upsert_cow",
            "rewritten": len(overlapping),
            "carried": len(carried),
            "added": len(new_entries),
        }
        if txn_app is not None:
            info["txn"] = {"app": txn_app, "batch": int(txn_batch)}
        try:
            version = _commit(
                path, carried + new_entries, stats_cols,
                base_version=m["version"],
                schema_json=out_schema.json(),
                txns=txns, commit_info=info, fs=fs, carry=m,
                adds=new_entries,
                removes=[e["name"] for e in overlapping],
            )
        except CommitConflict as e:
            version = _rebase_after_conflict(
                path, m, fs,
                adds=new_entries,
                removes=[x["name"] for x in overlapping],
                read_files=[x["name"] for x in overlapping],
                candidate_fn=lambda mm: [
                    x for x in mm["files"]
                    if _overlaps(x, probe, keys, bl, _cm(mm))
                ],
                isolation=isolation,
                schema_json=out_schema.json(),
                txn_app=txn_app, txn_batch=txn_batch,
                commit_info=info,
            )
            if version is None:
                # the freshly written files become expirable orphans;
                # the retry re-derives the merge from the winner's
                # manifest
                last_err = e
                continue
        return {
            "version": version,
            "rewritten": len(overlapping),
            "carried": len(carried),
            "added": len(new_entries),
        }
    raise CommitConflict(
        f"merge_upsert_cow: lost the commit race {COMMIT_RETRIES} times "
        f"at {path!r}"
    ) from last_err


def apply_cdc_cow(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    keys: list[str],
    op_col: str = "_op",
    allow_schema_evolution: bool = False,
    txn_app: str | None = None,
    txn_batch: int | None = None,
    mor_deletes: bool = False,
    fs: LocalSnapshotFS | None = None,
    isolation: str = "write_serializable",
) -> dict:
    """Apply one CDC batch (rows tagged I/U/D in ``op_col``) to a
    snapshot table with file-level copy-on-write.

    The change-data-capture ingest shape (Debezium/DMS feeds): upserts
    (I and U are the same idempotent operation against a keyed table)
    replace matching rows, D removes them.  One commit per batch — a
    reader sees the whole batch or none of it.  File pruning, envelope
    maintenance, duplicate-key rejection, commit retries, schema
    evolution, and txn idempotence are shared with ``merge_upsert_cow``;
    a key may appear with at most ONE op per batch (conflicting I+D for
    a key is the upstream's bug to resolve, not ours to guess).
    Returns the merge stats plus ``deleted``/``upserted`` row counts
    (derived from ONE ``groupBy(op)`` action, which also validates the
    op codes — no extra jobs on the hot ingest path).

    With ``mor_deletes=True``, deletes whose keys fall ONLY in files the
    upserts don't touch become deletion-vector appends instead of
    rewrites — still ONE atomic commit carrying both the rewritten
    files and the new sidecar (the Delta DV-enabled MERGE shape).
    Files rewritten for upserts apply their deletes during the rewrite
    as before; a delete-heavy feed stops paying file-size rewrite costs
    for its deletes and ``auto_compact`` folds the accumulated vectors.
    ``isolation`` as in ``delete_where_mor``.
    """
    _check_isolation(isolation)
    # ONE action validates op codes, validates keys, and feeds the
    # pruning probe (r16 — the op-code groupBy was a separate pass over
    # the batch lineage before).  The audit returns opinfo=None when it
    # took a classic fallback (over-cap / non-simple keys); the op
    # action then runs separately, total actions as before.
    probe, bad, opinfo = _batch_key_audit(
        batch.select(*keys, op_col), keys, op_col=op_col
    )
    if opinfo is not None:
        bad_ops = sorted(opinfo["ops"] - {"I", "U", "D"})
        if opinfo["has_null_op"]:
            bad_ops = [None] + bad_ops
        if bad_ops:
            raise ValueError(
                f"apply_cdc_cow: unknown op codes {bad_ops}"
            )
        n_upserts = opinfo["counts"].get("I", 0) + opinfo["counts"].get(
            "U", 0
        )
        n_deletes = opinfo["counts"].get("D", 0)
    else:
        op_counts = {
            r["o"]: r["n"]
            for r in batch.groupBy(F.upper(F.col(op_col)).alias("o"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        bad_ops = set(op_counts) - {"I", "U", "D"}
        if bad_ops:
            raise ValueError(
                f"apply_cdc_cow: unknown op codes {sorted(bad_ops)}"
            )
        n_upserts = op_counts.get("I", 0) + op_counts.get("U", 0)
        n_deletes = op_counts.get("D", 0)
    if bad:
        row, had_null = bad
        if had_null:
            raise ValueError(
                f"apply_cdc_cow: NULL key in batch row "
                f"{tuple(row[k] for k in keys)!r} — NULL-keyed changes "
                "can never match their target row; coalesce keys "
                "upstream (for MV dims: coalesce NULL dimension values "
                "before aggregating)"
            )
        raise ValueError(
            f"apply_cdc_cow: batch has multiple ops for key "
            f"{tuple(row[k] for k in keys)!r}; collapse the batch to "
            "its final per-key state first"
        )
    upserts = batch.filter(F.upper(F.col(op_col)).isin("I", "U")).drop(
        op_col
    )
    if probe.get("empty"):
        res = _skipped_result(read_manifest(path, fs=fs))
        res["upserted"] = 0
        res["deleted"] = 0
        return res
    all_keys = batch.select(*keys).distinct()
    del_keys = (
        batch.filter(F.upper(F.col(op_col)) == "D").select(*keys).distinct()
    )
    use_mor = mor_deletes and n_deletes > 0
    if use_mor:
        probe_up = _batch_key_probe(upserts.select(*keys), keys)
        probe_del = _batch_key_probe(del_keys, keys)

    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        if _txn_already_applied(m, txn_app, txn_batch):
            res = _skipped_result(m)
            res["upserted"] = 0
            res["deleted"] = 0
            return res
        stats_cols = m["stats_cols"]
        cm = _cm(m)
        _reject_identity(m, "apply_cdc_cow")
        target_schema = _manifest_schema(m) or snap_read(
            spark, path, m["version"], fs
        ).schema
        out_schema = _check_batch_schema(
            target_schema, batch.schema, {op_col}, allow_schema_evolution,
            "apply_cdc_cow",
        )
        _guard_new_columns(m, target_schema, out_schema, "apply_cdc_cow")
        out_cols = [f.name for f in out_schema.fields]
        if n_upserts:
            # deletes carry no row image to validate; I/U rows must pass
            _enforce_constraints(
                m, upserts.select(*out_cols), "apply_cdc_cow"
            )
        bl = _bloom_loader(path, fs)
        if use_mor:
            # rewrite only what the UPSERTS touch; deletes landing in
            # other files become deletion-vector appends below
            overlapping = (
                []
                if probe_up.get("empty")
                else [
                    f
                    for f in m["files"]
                    if _overlaps(f, probe_up, keys, bl, cm)
                ]
            )
            over_names = {e["name"] for e in overlapping}
            rest = [e for e in m["files"] if e["name"] not in over_names]
            dv_cands = [
                e for e in rest if _overlaps(e, probe_del, keys, bl, cm)
            ]
            dv_names = {e["name"] for e in dv_cands}
            carried = [e for e in rest if e["name"] not in dv_names]
        else:
            overlapping = [
                f for f in m["files"] if _overlaps(f, probe, keys, bl, cm)
            ]
            carried = [
                f for f in m["files"] if not _overlaps(f, probe, keys, bl, cm)
            ]
            dv_cands = []

        track = bool(m.get("row_tracking"))
        if overlapping or n_upserts:
            ins_out = None
            if overlapping:
                if track:
                    # row-tracking phase 2, same shape as
                    # merge_upsert_cow: survivors and U-rows keep
                    # their ids (materialized), I-rows split into
                    # fresh files for watermark assignment
                    old = _read_entries_with_ids(
                        spark, path, overlapping, out_schema, cm
                    )
                    remaining = old.join(
                        F.broadcast(all_keys), keys, "left_anti"
                    )
                    old_ids = (
                        old.select(*keys, ROW_ID_COL)
                        .groupBy(*keys)
                        .agg(F.min(ROW_ID_COL).alias(ROW_ID_COL))
                    )
                    updated = upserts.select(*out_cols).join(
                        old_ids, keys, "inner"
                    )
                    out = remaining.unionByName(updated)
                    ins_out = upserts.select(*out_cols).join(
                        old_ids.select(*keys), keys, "left_anti"
                    )
                else:
                    old = _read_entries(
                        spark, path, overlapping, out_schema, cm
                    )
                    remaining = old.join(
                        F.broadcast(all_keys), keys, "left_anti"
                    )
                    out = remaining.unionByName(
                        upserts.select(*out_cols)
                    )
            else:
                out = upserts.select(*out_cols)
            # see merge_upsert_cow: bounded file count + key-sorted rows
            out = out.coalesce(
                max(1, len(overlapping))
            ).sortWithinPartitions(*keys)
            new_entries = _write_data_files(
                spark, out, path, stats_cols, fs, cm, pspec=_pspec(m)
            )
            if track and overlapping:
                for e in new_entries:
                    e["row_id_col"] = True
                ins_entries = _write_data_files(
                    spark,
                    ins_out.coalesce(1).sortWithinPartitions(*keys),
                    path, stats_cols, fs, cm, pspec=_pspec(m),
                )
                new_entries = new_entries + ins_entries
        else:
            new_entries = []

        sidecar = ""
        dv_totals: dict[str, int] = {}
        if dv_cands:
            live = _read_entries_pos(
                spark, path, dv_cands, _manifest_schema(m), cm
            )
            new_pos = live.join(
                F.broadcast(del_keys), keys, "left_semi"
            ).select(
                F.col("_sg_file").alias("file_name"),
                F.col("_sg_pos").alias("pos"),
            )
            old_dved = [e for e in dv_cands if e.get("dv")]
            if old_dved:
                old_pos = (
                    spark.read.parquet(
                        *sorted(
                            {
                                _dv_path(path, e)
                                for e in old_dved
                            }
                        )
                    )
                    .filter(
                        F.col("file_name").isin(
                            [e["name"] for e in old_dved]
                        )
                    )
                    .select("file_name", "pos")
                )
                new_pos = new_pos.unionByName(old_pos).distinct()
            sidecar, dv_totals = _write_dv_sidecar(spark, new_pos, path, fs)
            old_rows = {
                e["name"]: e["dv"]["rows"] for e in dv_cands if e.get("dv")
            }
            if not dv_totals or dv_totals == old_rows:
                # deletes hit no live rows here: nothing to repoint
                if sidecar:
                    _fs(fs).remove(os.path.join(path, sidecar))
                sidecar, dv_totals = "", {}

        files_out = list(carried)
        adds = list(new_entries)  # explicit commit delta
        removes = [e["name"] for e in overlapping]
        dropped = 0
        for e in dv_cands:
            t = dv_totals.get(e["name"])
            if t is None:
                files_out.append(e)
            elif t >= e["rows"]:
                dropped += 1
                removes.append(e["name"])
            else:
                e2 = {k: v for k, v in e.items() if k != "dv"}
                e2["dv"] = {"file": sidecar, "rows": t}
                files_out.append(e2)
                removes.append(e["name"])
                adds.append(e2)
        files_out += new_entries

        if (
            not new_entries
            and not dv_totals
            and not removes
            and txn_app is None
        ):
            # the batch changed nothing and there is no idempotence
            # marker to record — don't grow the version chain.  The
            # ``removes`` check is load-bearing: a delete that kills
            # EVERY row of its overlapping files produces zero new
            # entries but must still drop those files — treating "no
            # new files" as "no change" silently resurrected the
            # deleted rows (caught by
            # test_merge_cells_removes_zero_posting_centroid after the
            # round-9 no-op-guard rework)
            res = _skipped_result(m)
            res["upserted"] = n_upserts
            res["deleted"] = 0
            return res

        txns = dict(m.get("txns", {}))
        if txn_app is not None:
            txns[txn_app] = int(txn_batch)
        info = {
            "op": "apply_cdc_cow",
            "rewritten": len(overlapping),
            "carried": len(carried),
            "added": len(new_entries),
            "upserted": n_upserts,
            "deleted": n_deletes,
        }
        if dv_totals:
            info["dv_files"] = len(dv_totals) - dropped
            info["dropped_files"] = dropped
        if txn_app is not None:
            info["txn"] = {"app": txn_app, "batch": int(txn_batch)}
        try:
            version = _commit(
                path, files_out, stats_cols,
                base_version=m["version"],
                schema_json=out_schema.json(),
                txns=txns, commit_info=info, fs=fs, carry=m,
                adds=adds, removes=removes,
            )
        except CommitConflict as e:
            version = _rebase_after_conflict(
                path, m, fs,
                adds=adds, removes=removes,
                read_files=[
                    x["name"] for x in overlapping
                ] + [x["name"] for x in dv_cands],
                candidate_fn=lambda mm: [
                    x for x in mm["files"]
                    if _overlaps(x, probe, keys, bl, _cm(mm))
                ],
                isolation=isolation,
                schema_json=out_schema.json(),
                txn_app=txn_app, txn_batch=txn_batch,
                commit_info=info,
            )
            if version is None:
                last_err = e
                continue
        res = {
            "version": version,
            "rewritten": len(overlapping),
            "carried": len(carried),
            "added": len(new_entries),
            "upserted": n_upserts,
            "deleted": n_deletes,
        }
        if dv_totals:
            res["dv_files"] = len(dv_totals) - dropped
            res["dropped_files"] = dropped
        return res
    raise CommitConflict(
        f"apply_cdc_cow: lost the commit race {COMMIT_RETRIES} times at "
        f"{path!r}"
    ) from last_err


def snap_append(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    allow_schema_evolution: bool = False,
    txn_app: str | None = None,
    txn_batch: int | None = None,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """APPEND-only commit: add ``batch``'s rows as new files, carry
    every existing file untouched — the cheap ingest path (Delta's
    ``mode=append``).  No key semantics, no pruning, no rewrite: cost
    is O(batch) regardless of table size, and because no file is ever
    removed, append commits are exactly what ``snapshot_stream`` can
    replay as a Structured Streaming source.  Schema checks, txn
    idempotence markers, commit retries, and stats/bloom collection are
    shared with the mutators.  A lost commit race re-commits the
    already-written files on the new head (appends commute; see
    ``_rebase_after_conflict``) instead of re-executing the write job —
    only table-metadata drift forces a re-run.  Returns ``{"version",
    "added", "carried"}`` (+``skipped``)."""
    if not batch.take(1):
        return _skipped_result(read_manifest(path, fs=fs))
    _orig_batch = batch
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        # retries re-derive every fill (defaults / generated /
        # identity) from the ORIGINAL batch against the fresh manifest
        batch = _orig_batch
        m = read_manifest(path, fs=fs)
        if _txn_already_applied(m, txn_app, txn_batch):
            return _skipped_result(m)
        target_schema = _manifest_schema(m) or snap_read(
            spark, path, m["version"], fs
        ).schema
        # COLUMN DEFAULTS (snap_add_column(default=...)): a batch may
        # omit a defaulted column; it is filled at WRITE time, before
        # validation and constraint checks.  Append/ingest only —
        # keyed mutators keep requiring explicit columns.
        defaults = m.get("defaults") or {}
        if defaults:
            have = set(batch.columns)
            for fld in target_schema.fields:
                if fld.name in defaults and fld.name not in have:
                    batch = batch.withColumn(
                        fld.name,
                        F.lit(defaults[fld.name]).cast(fld.dataType),
                    )
        # GENERATED ALWAYS AS (snap_add_column(generated_as=...)): an
        # omitted generated column is COMPUTED at write time from the
        # batch's other columns; a supplied one is validated against
        # the expression by _enforce_constraints below — either way no
        # divergent value can commit.
        gens = m.get("generated") or {}
        if gens:
            have = set(batch.columns)
            for fld in target_schema.fields:
                if fld.name in gens and fld.name not in have:
                    batch = batch.withColumn(
                        fld.name,
                        F.expr(gens[fld.name]).cast(fld.dataType),
                    )
        # GENERATED ALWAYS AS IDENTITY: values come from the table's
        # allocator, never the writer.  One count job reserves the
        # exact range from the manifest high-water mark; zipWithIndex
        # numbers rows by (partition, position) — deterministic for a
        # deterministic batch plan, contiguous, no global shuffle.  A
        # lost commit race re-RUNS the loop (see the conflict handler):
        # the winner may have consumed our range, so already-written
        # values can never be re-published blindly.
        idcols = m.get("identity") or {}
        n_new = 0
        if idcols:
            supplied = sorted(set(idcols) & set(batch.columns))
            if supplied:
                raise ValueError(
                    f"snap_append: column(s) {supplied} are GENERATED "
                    "ALWAYS AS IDENTITY — values are assigned by the "
                    "table; drop them from the batch"
                )
            from pyspark.sql.types import LongType as _Long
            from pyspark.sql.types import StructField as _SF

            n_new = batch.count()
            idx_schema = StructType(
                list(batch.schema.fields) + [_SF("_sg_idx", _Long())]
            )
            indexed = spark.createDataFrame(
                batch.rdd.zipWithIndex().map(
                    lambda t: tuple(t[0]) + (t[1],)
                ),
                idx_schema,
            )
            for cname, spec in sorted(idcols.items()):
                indexed = indexed.withColumn(
                    cname,
                    (
                        F.lit(int(spec["start"]))
                        + F.lit(int(spec["step"]))
                        * (F.lit(int(spec["high"])) + F.col("_sg_idx"))
                    ).cast("long"),
                )
            batch = indexed.drop("_sg_idx")
        out_schema = _check_batch_schema(
            target_schema, batch.schema, set(), allow_schema_evolution,
            "snap_append",
        )
        _guard_new_columns(m, target_schema, out_schema, "snap_append")
        out_cols = [f.name for f in out_schema.fields]
        _enforce_constraints(m, batch.select(*out_cols), "snap_append")
        new_entries = _write_data_files(
            spark, batch.select(*out_cols), path, m["stats_cols"], fs,
            _cm(m), pspec=_pspec(m),
        )
        txns = dict(m.get("txns", {}))
        if txn_app is not None:
            txns[txn_app] = int(txn_batch)
        info = {
            "op": "append",
            "added": len(new_entries),
            "carried": len(m["files"]),
        }
        if txn_app is not None:
            info["txn"] = {"app": txn_app, "batch": int(txn_batch)}
        carry_m = m
        if idcols:
            carry_m = {
                **m,
                "identity": {
                    c: {**spec, "high": int(spec["high"]) + n_new}
                    for c, spec in idcols.items()
                },
            }
        try:
            version = _commit(
                path, m["files"] + new_entries, m["stats_cols"],
                base_version=m["version"],
                schema_json=out_schema.json(),
                txns=txns, commit_info=info, fs=fs, carry=carry_m,
                adds=new_entries, removes=[],
            )
        except CommitConflict as e:
            if idcols:
                # the winner may have consumed our reserved identity
                # range — re-publishing these files could duplicate
                # surrogate keys.  Re-run the loop: re-read, re-reserve
                # from the new high-water mark, re-fill, re-write.
                last_err = e
                continue
            # an append reads nothing and removes nothing, so like a
            # rearrangement it can ALWAYS re-commit its already-written
            # files on the new head (metadata drift aside) — without
            # this, a lost race re-executes the whole Spark write job
            version = _rebase_after_conflict(
                path, m, fs,
                adds=new_entries, removes=[],
                read_files=[],
                rearrange_only=True,
                schema_json=out_schema.json(),
                txn_app=txn_app, txn_batch=txn_batch,
                commit_info=info,
            )
            if version is None:
                last_err = e
                continue
        return {
            "version": version,
            "added": len(new_entries),
            "carried": len(m["files"]),
        }
    raise CommitConflict(
        f"snap_append: lost the commit race {COMMIT_RETRIES} times at "
        f"{path!r}"
    ) from last_err


def snap_overwrite(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    txn_app: str | None = None,
    txn_batch: int | None = None,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Replace the table's ENTIRE file set with ``df``'s rows in one
    commit (``mode("overwrite")`` for the library API — the batch
    DataSource already exposes it via the format string).

    Old versions stay readable (time travel) until GC; schema must
    match the recorded schema by (name, type) — overwrite replaces
    DATA, not shape (evolve via snap_append/merge or the column DDL);
    CHECK constraints validate the incoming rows; the column mapping
    carries forward and the new files land under the physical names.
    Cost is O(new data) + an O(1) commit; the removed files become
    GC-collectable when their versions expire."""
    last_err: Exception | None = None
    written: list[dict] | None = None
    written_cm: dict = {}
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        if _txn_already_applied(m, txn_app, txn_batch):
            return _skipped_result(m)
        target_schema = _manifest_schema(m)
        if target_schema is not None:
            _check_batch_schema(
                target_schema, df.schema, set(), False, "snap_overwrite"
            )
        _reject_identity(m, "snap_overwrite")
        _enforce_constraints(m, df, "snap_overwrite")
        if written is not None and _cm(m) != written_cm:
            written = None  # a racing rename moved the physical names
        if written is None:  # files are commit-agnostic: write once
            written_cm = _cm(m)
            written = _write_data_files(
                spark, df, path, m["stats_cols"], fs, written_cm,
                pspec=_pspec(m),
            )
        txns = dict(m.get("txns", {}))
        if txn_app is not None:
            txns[txn_app] = int(txn_batch)
        info = {
            "op": "overwrite",
            "added": len(written),
            "removed": len(m["files"]),
        }
        if txn_app is not None:
            info["txn"] = {"app": txn_app, "batch": int(txn_batch)}
        try:
            version = _commit(
                path, written, m["stats_cols"],
                base_version=m["version"],
                schema_json=m.get("schema"),
                txns=txns, commit_info=info, fs=fs, carry=m,
                adds=written,
                removes=[e["name"] for e in m["files"]],
            )
        except CommitConflict as e:
            last_err = e
            continue
        return {
            "version": version,
            "added": len(written),
            "removed": len(m["files"]),
            "carried": 0,
        }
    raise CommitConflict(
        f"snap_overwrite: lost the commit race {COMMIT_RETRIES} times "
        f"at {path!r}"
    ) from last_err


def _group_by_tuple(
    entries: list[dict], pspec: list[dict]
) -> tuple[dict[tuple, list[dict]], list[dict]]:
    """Split manifest entries into tuple-PURE groups and a residual.

    The manifest's per-file ``_sgp_*`` envelopes identify each file's
    partition tuple for free: min == max on EVERY spec field means the
    file holds exactly one tuple, so merging same-tuple files can
    never widen an envelope.  Impure or stats-less files (pre-spec
    history, Arrow-writer files that sort within the file but span
    tuples) land in the residual."""
    names = [s["name"] for s in pspec]
    groups: dict[tuple, list[dict]] = {}
    residual: list[dict] = []
    for e in entries:
        st = e.get("stats") or {}
        key: list | None = []
        for n in names:
            env = st.get(n)
            if (
                key is None
                or not env
                or env.get("min") is None
                or env["min"] != env["max"]
            ):
                key = None
            else:
                key.append(env["min"])
        if key is None:
            residual.append(e)
        else:
            groups.setdefault(tuple(key), []).append(e)
    return groups, residual


def _quasi_disjoint(entries: list[dict], col: str) -> bool:
    """True when every entry has a ``col`` envelope and the envelopes
    are pairwise non-overlapping except possibly at shared boundary
    values (range-clustered outputs legitimately split one leading
    value across two files).  The residual-demotion test: such a
    layout already prunes a point scan to ~1-2 files, so rewriting it
    at the same width buys nothing."""
    ivals = []
    for e in entries:
        env = (e.get("stats") or {}).get(col)
        if not env or env.get("min") is None or env.get("max") is None:
            return False
        ivals.append((env["min"], env["max"]))
    try:
        ivals.sort(key=lambda t: (t[0], t[1]))
    except TypeError:
        return False  # mixed-type envelopes: cannot prove anything
    for (_lo1, hi1), (lo2, _hi2) in zip(ivals, ivals[1:]):
        if _lt(lo2, hi1) is True:  # next starts INSIDE the previous
            return False
    return True


def _compact_partitioned(
    spark: SparkSession,
    path: str,
    m: dict,
    candidates: list[dict],
    target_bytes: int,
    f: LocalSnapshotFS,
    fs: LocalSnapshotFS | None,
    cm: dict,
    zorder: tuple | None = None,
    equidepth: bool = False,
    curve: str = "morton",
) -> tuple[list[dict], list[dict], list[dict]]:
    """Partition-aware rewrite for ``optimize_snapshot`` (the
    Delta/Iceberg OPTIMIZE shape: compact — and Z-order — WITHIN
    partitions, never across them).

    Plain compaction (``zorder is None``):

    - tuple-pure files group by tuple (``_group_by_tuple``); each
      group bin-packs to its own ``ceil(group_bytes / target_bytes)``
      file count (``coalesce`` — no shuffle; within one tuple layout
      cannot affect pruning);
    - a group that is already optimal (at most one output per input,
      no deletion-vector debt) is DEMOTED to carry — OPTIMIZE on a
      well-compacted partitioned table is a no-op instead of a
      re-smear, and a one-file-per-day table never merges days just
      because the global budget said ``n_files < n_days``;
    - the residual is range-clustered by the tuple: one output slot
      per tuple when purity is affordable (tuple count within what
      bytes or the input count already demand — compaction must never
      emit more files than it consumed), else at the plain byte
      budget, producing range-CONTIGUOUS tuple spans a point scan
      still prunes to ~1-2 outputs; a residual already quasi-disjoint
      on the leading field that the rewrite could not shrink by at
      least a quarter DEMOTES instead (``_quasi_disjoint`` — OPTIMIZE
      is idempotent, not a perpetual rewriter of contiguous layouts).

    Z-order (``zorder=(colA, colB)``): the Delta semantic — the curve
    is applied PER PARTITION tuple, so the user keeps partition
    pruning AND gets key locality inside each partition; nothing
    demotes (an explicit re-layout request rewrites everything asked
    of it), and the residual is Z-ordered as one group with its
    derived columns still tracked (those envelopes may span tuples —
    exactly what the files already were).

    Group writes are independent Spark jobs and run on a small thread
    pool (the scheduler interleaves them; this is how OPTIMIZE keeps
    1000 partitions from serializing into 1000 sequential jobs).
    Returns ``(new_entries, rewritten, demoted)``; nothing is written
    when every group demotes."""
    from concurrent.futures import ThreadPoolExecutor

    from .layout import zorder_frame
    from .partition import partition_expr

    pspec = _pspec(m)
    schema = _manifest_schema(m)
    stats_cols = m["stats_cols"]
    track_ids = bool(m.get("row_tracking"))
    groups, residual = _group_by_tuple(candidates, pspec)

    def _dv(files: list[dict]) -> bool:
        return any(e.get("dv") for e in files)

    def _bytes(files: list[dict]) -> int:
        return sum(
            f.getsize(_entry_path(path, e)) for e in files
        )

    jobs: list[tuple[list[dict], int, str]] = []
    demoted: list[dict] = []
    for key in sorted(groups, key=lambda k: tuple(map(str, k))):
        files = groups[key]
        n_out = max(1, -(-_bytes(files) // target_bytes))  # ceil
        if zorder is not None:
            jobs.append((files, n_out, "zorder"))
        elif n_out >= len(files) and not _dv(files):
            demoted.extend(files)  # already optimal for this tuple
        else:
            jobs.append((files, n_out, "coalesce"))
    if residual:
        n_out = max(1, -(-_bytes(residual) // target_bytes))
        if zorder is not None:
            jobs.append((residual, n_out, "zorder"))
        elif len(residual) >= 2 or _dv(residual):
            # width: one output slot per tuple when purity is
            # AFFORDABLE — n_t within what bytes or the input count
            # already demand (compaction must never emit more files
            # than it consumed; a days x bucket(16) spec can have
            # 100x more tuples than files, and exploding 10 files
            # into 480 would be the opposite of OPTIMIZE).  Otherwise
            # fall back to the byte budget: range-contiguous tuple
            # spans, which a point scan still prunes to ~1-2 outputs
            # of whatever width.  The distinct count is one agg over
            # only the files being rewritten anyway.
            n_t = (
                _read_entries(spark, path, residual, schema, cm)
                .select(
                    *[
                        partition_expr(s).alias(s["name"])
                        for s in pspec
                    ]
                )
                .distinct()
                .count()
            )
            if n_t <= max(n_out, len(residual)):
                width = max(n_out, n_t, 1)
            else:
                width = max(n_out, 1)
            # demote when the files already sit on non-overlapping
            # leading-field ranges and the rewrite wouldn't shrink
            # the count by at least a quarter (min 1): this is what
            # makes OPTIMIZE idempotent instead of perpetually
            # rewriting a contiguous residual over parquet-size
            # rounding noise
            shrink_floor = len(residual) - max(1, len(residual) // 4)
            if (
                not _dv(residual)
                and width > shrink_floor
                and _quasi_disjoint(residual, pspec[0]["name"])
            ):
                demoted.extend(residual)
            else:
                jobs.append((residual, width, "recluster"))
        else:
            demoted.extend(residual)
    if not jobs:
        return [], [], demoted

    def _run(job: tuple[list[dict], int, str]) -> list[dict]:
        files, n_out, mode = job
        # on a row-tracked table the rewrite PRESERVES ids: read them
        # (synthesized or materialized), write them as a physical
        # column, and mark the entries so _commit never re-assigns
        if track_ids:
            dfg = _read_entries_with_ids(spark, path, files, schema, cm)
        else:
            dfg = _read_entries(spark, path, files, schema, cm)
        if mode == "zorder":
            out = _write_data_files(
                spark, zorder_frame(dfg, zorder, n_out, equidepth, curve),
                path, stats_cols, fs, cm, pspec=pspec, pcluster=False,
            )
        elif mode == "recluster":
            out = _write_data_files(
                spark, dfg, path, stats_cols, fs, cm,
                pspec=pspec, pcluster=True, pnum=n_out,
            )
        else:
            out = _write_data_files(
                spark, dfg.coalesce(n_out), path, stats_cols, fs, cm,
                pspec=pspec, pcluster=False,
            )
        if track_ids:
            for e in out:
                e["row_id_col"] = True
        return out

    if len(jobs) == 1:
        results = [_run(jobs[0])]
    else:
        with ThreadPoolExecutor(
            max_workers=min(4, len(jobs))
        ) as pool:
            results = list(pool.map(_run, jobs))
    new_entries = [e for r in results for e in r]
    rewritten = [e for job in jobs for e in job[0]]
    return new_entries, rewritten, demoted


def snap_set_clustering(
    path: str,
    cols: list[str] | tuple[str, ...] | None,
    curve: str = "morton",
    fs: LocalSnapshotFS | None = None,
) -> int:
    """Declare the table's clustering columns in the MANIFEST — the
    Delta liquid-clustering ``CLUSTER BY`` declaration (``ALTER TABLE
    ... CLUSTER BY (cols)``; ``cols=None`` is ``CLUSTER BY NONE``).

    Before this, the clustering key lived only in each maintenance
    CALL's arguments (``optimize_snapshot(cluster_by=...)``,
    ``auto_compact(cluster_by=...)``) — every scheduler invocation had
    to repeat it, and two jobs disagreeing would thrash the layout.
    The declaration makes maintenance self-driving:
    ``optimize_snapshot`` / ``optimize_incremental`` / ``auto_compact``
    default to the declared columns (and curve) when the caller passes
    none.  1 column clusters by range; 2 columns by the declared
    space-filling curve (``morton``/``hilbert``, equi-depth).

    Stored like constraints/defaults (carried by every commit) and
    writer-feature-gated as ``clustering``: a legacy build whose carry
    loop predates the key must refuse to write rather than silently
    strip the declaration (the `partition_spec` hazard,
    ``_commit``).  Metadata-only commit; returns the new version.

    Validation is DECLARATION-time so maintenance never fails at
    3 a.m.: columns must exist in the schema and the primary column
    must be stats-tracked (``optimize_incremental`` picks rewrite
    groups from its envelopes).  Renaming a clustered column follows
    the declaration; dropping one is rejected until it is undeclared.
    """
    if curve not in ("morton", "hilbert"):
        raise ValueError(f"curve {curve!r}: use 'morton' or 'hilbert'")
    cols = list(cols) if cols else []
    if cols and not 1 <= len(cols) <= 2:
        raise ValueError(
            "clustering takes 1 (range) or 2 (curve) columns; for "
            "wider keys cluster on the two highest-selectivity ones"
        )
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        if cols:
            schema = _manifest_schema(m)
            if schema is not None:
                names = [f.name for f in schema.fields]
                missing = [c for c in cols if c not in names]
                if missing:
                    raise KeyError(
                        f"snap_set_clustering: no column(s) {missing} "
                        f"in {names}"
                    )
            pcol = _phys(_cm(m), cols[0])
            if pcol not in m["stats_cols"]:
                raise ValueError(
                    f"snap_set_clustering: primary column {cols[0]!r} "
                    f"not tracked in manifest stats_cols "
                    f"{m['stats_cols']} — incremental re-clustering "
                    "picks its rewrite groups from the stats envelopes"
                )
        carry = dict(m)
        if cols:
            carry["clustering"] = {"cols": cols, "curve": curve}
        else:
            carry.pop("clustering", None)
        info = {
            "op": "set_clustering",
            "cols": cols,
            "curve": curve if cols else None,
        }
        try:
            return _commit(
                path, m["files"], m["stats_cols"],
                base_version=m["version"],
                schema_json=m.get("schema"),
                txns=dict(m.get("txns", {})),
                commit_info=info, fs=fs, carry=carry,
                adds=[], removes=[],
            )
        except CommitConflict as e:
            last_err = e
            continue
    raise CommitConflict(
        f"snap_set_clustering: lost the commit race {COMMIT_RETRIES} "
        f"times at {path!r}"
    ) from last_err


def _declared_clustering(m: dict) -> tuple[list[str], str | None]:
    decl = m.get("clustering") or {}
    return list(decl.get("cols") or []), decl.get("curve")


def optimize_snapshot(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    zorder: tuple | None = None,
    equidepth: bool = False,
    cluster_by: list[str] | None = None,
    where: list | None = None,
    fs: LocalSnapshotFS | None = None,
    curve: str = "morton",
) -> dict:
    """OPTIMIZE for snapshot tables: compaction (and optionally Z-order
    re-clustering) as one copy-on-write manifest commit.

    ``curve="hilbert"`` (with ``zorder=``) swaps the Morton interleave
    for the Hilbert index — tighter per-file envelopes at the same
    file count (``layout.zorder_frame`` has the why; measured in
    tests/test_layout.py).  Morton stays the default so existing
    layouts re-optimize to the same order.

    ``where`` scopes the rewrite (Delta's ``OPTIMIZE ... WHERE``): the
    same predicate grammar as ``snap_scan`` — a conjunction list or
    DNF OR form — filters the CANDIDATE files through
    ``prune_manifest`` (stats envelopes + implied partition-value
    predicates) before any grouping, so compacting (or Z-ordering) the
    one hot day a streaming writer just fragmented touches only that
    day's files; everything outside the scope is carried by reference,
    byte-untouched.  Files that MAY hold matching rows rewrite wholly
    (compaction moves bytes, never changes rows — conservative scope
    is correct, just possibly wider on unclustered files).  Unlike
    Delta the predicate is not restricted to partition columns: any
    stats-covered column prunes.

    Without ``zorder``: bin-packs only the files smaller than
    ``target_bytes`` into ~target-sized rewrites and carries full-sized
    files by reference — the Delta ``OPTIMIZE`` shape, fixing the
    small-file accretion of streaming/merge writers without touching
    healthy files.  On a partitioned table the packing is PER
    PARTITION TUPLE (``_compact_partitioned``): a tight budget can
    never merge two days into one file, and partitions that are
    already one-file stay carried.  With ``zorder``: rewrites the
    WHOLE table through ``layout.zorder_frame`` so subsequent
    ``merge_upsert_cow`` batches overlap fewer files — the clustering
    is precisely what keeps CoW merge cost small; on a partitioned
    table the curve is applied WITHIN each partition tuple (the Delta
    ``ZORDER BY`` semantic — key locality inside partitions with
    partition pruning intact).  Readers
    racing the optimize keep their resolved version (same isolation as
    every commit); old files survive until ``expire_snapshots``; txn
    markers and schema are carried forward (a compaction must never
    forget an ingest's idempotence state).

    Returns ``{"version", "rewritten", "carried", "added"}``
    (version is unchanged and no commit happens if nothing qualifies).
    """
    from .layout import zorder_frame

    f = _fs(fs)
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        stats_cols = m["stats_cols"]
        # declared clustering: when the caller names no layout, the
        # manifest's CLUSTER BY declaration drives the rewrite order
        # (and curve) — compaction must not destroy the layout the
        # table itself asked for
        eff_cluster, eff_curve = list(cluster_by or []), curve
        if zorder is None and not eff_cluster:
            dcols, dcurve = _declared_clustering(m)
            if dcols:
                eff_cluster = dcols
                if dcurve:
                    eff_curve = dcurve
        scope = list(m["files"])
        if where:
            # OPTIMIZE ... WHERE: out-of-scope files never qualify —
            # they are carried by reference below whatever happens
            scope, _out = prune_manifest(m, where)
            if not scope:
                return {
                    "version": m["version"],
                    "rewritten": 0,
                    "carried": len(m["files"]),
                    "added": 0,
                }
        if zorder is not None:
            to_rewrite = list(scope)
            carried = [e for e in m["files"] if e not in to_rewrite]
        else:
            sizes = {
                e["name"]: f.getsize(_entry_path(path, e))
                for e in scope
            }
            # a file qualifies when undersized OR carrying a deletion
            # vector — compaction is where merge-on-read debt is paid
            to_rewrite = [
                e
                for e in scope
                if sizes[e["name"]] < target_bytes or e.get("dv")
            ]
            carried = [e for e in m["files"] if e not in to_rewrite]
            if len(to_rewrite) < 2 and not any(
                e.get("dv") for e in to_rewrite
            ):
                return {
                    "version": m["version"],
                    "rewritten": 0,
                    "carried": len(m["files"]),
                    "added": 0,
                }
        cm = _cm(m)
        pspec = _pspec(m)
        if not eff_cluster and pspec:
            # partitioned table: bin-pack (or Z-order) WITHIN
            # partition tuples, the Delta/Iceberg shape — a tight
            # target_bytes budget must never merge two days into one
            # file (the next hot-day scan would lose the pruning the
            # user partitioned for), and ZORDER BY gives key locality
            # inside each partition while keeping partition pruning
            new_entries, to_rewrite, _demoted = _compact_partitioned(
                spark, path, m, to_rewrite, target_bytes, f, fs, cm,
                zorder=zorder, equidepth=equidepth, curve=curve,
            )
            carried = [
                e for e in m["files"] if e not in to_rewrite
            ]
            if not to_rewrite:
                return {
                    "version": m["version"],
                    "rewritten": 0,
                    "carried": len(m["files"]),
                    "added": 0,
                }
        else:
            track_ids = bool(m.get("row_tracking"))
            if track_ids:
                # id-preserving rewrite: carry _row_id through the
                # compaction/Z-order write as a physical column
                df = _read_entries_with_ids(
                    spark, path, to_rewrite, _manifest_schema(m), cm
                )
            else:
                df = _read_entries(
                    spark, path, to_rewrite, _manifest_schema(m), cm
                )
            total = sum(
                f.getsize(_entry_path(path, e))
                for e in to_rewrite
            )
            n_files = max(1, -(-total // target_bytes))  # ceil
            pcluster = True
            if zorder is not None:
                # Z-order wins over partition re-clustering: the caller
                # asked for THIS layout, and the derived columns keep
                # the partition stats tracked either way (ranges may
                # widen — pruning coarsens, stays correct)
                out = zorder_frame(df, zorder, n_files, equidepth, curve)
                pcluster = False
            elif eff_cluster:
                # key-ordered compaction: merging small files must not
                # destroy clustering the incremental re-clusterer paid
                # for (a bare coalesce mixes ranges and recreates
                # overlap debt).  Two columns take the (declared or
                # default) space-filling curve over just the rewrite
                # set — unlike zorder=, never a whole-table rewrite.
                if len(eff_cluster) == 2:
                    out = zorder_frame(
                        df, tuple(eff_cluster), n_files,
                        equidepth=True, curve=eff_curve,
                    )
                else:
                    out = df.repartitionByRange(
                        n_files, F.col(eff_cluster[0])
                    ).sortWithinPartitions(*eff_cluster)
                pcluster = False
            else:
                out = df.coalesce(n_files)
            new_entries = _write_data_files(
                spark, out, path, stats_cols, fs, cm,
                pspec=pspec, pcluster=pcluster,
            )
            if track_ids:
                for e in new_entries:
                    e["row_id_col"] = True
        info = {
            "op": "optimize",
            "rewritten": len(to_rewrite),
            "carried": len(carried),
            "added": len(new_entries),
        }
        try:
            version = _commit(
                path, carried + new_entries, stats_cols,
                base_version=m["version"],
                schema_json=m.get("schema"),
                txns=dict(m.get("txns", {})),
                commit_info=info, fs=fs, carry=m,
                adds=new_entries,
                removes=[e["name"] for e in to_rewrite],
            )
        except CommitConflict as e:
            # compaction is a pure rearrangement: a winner's appends
            # never conflict, only a winner touching OUR input files
            # forces a re-run — so background OPTIMIZE converges on a
            # hot append stream instead of redoing the rewrite forever
            version = _rebase_after_conflict(
                path, m, fs,
                adds=new_entries,
                removes=[x["name"] for x in to_rewrite],
                read_files=[],
                rearrange_only=True,
                commit_info=info,
            )
            if version is None:
                last_err = e
                continue
        return {
            "version": version,
            "rewritten": len(to_rewrite),
            "carried": len(carried),
            "added": len(new_entries),
        }
    raise CommitConflict(
        f"optimize_snapshot: lost the commit race {COMMIT_RETRIES} times "
        f"at {path!r}"
    ) from last_err


def _overlap_groups(entries: list[dict], col: str) -> list[list[int]]:
    """Indices of files grouped by pairwise key-range overlap on
    ``col`` (files without stats form their own singleton — can't be
    clustered, never selected).  Driver-side interval sweep over the
    manifest: O(files log files)."""
    ivals = []
    for i, e in enumerate(entries):
        env = e.get("stats", {}).get(col)
        if env and env["min"] is not None and env["max"] is not None:
            ivals.append((env["min"], env["max"], i))
    try:
        ivals.sort(key=lambda t: (t[0], t[1]))
    except TypeError:
        # mixed-type envelopes (engine/type change): no total order, so
        # conservatively treat every stat-ful file as one overlapping
        # group — the _lt "incomparable means may overlap" rule
        return [[i for _, _, i in ivals]] if ivals else []
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_hi = None
    for lo, hi, i in ivals:
        if cur and _lt(cur_hi, lo) is True:
            groups.append(cur)
            cur = []
            cur_hi = None
        cur.append(i)
        if cur_hi is None or _lt(cur_hi, hi):
            cur_hi = hi
    if cur:
        groups.append(cur)
    return groups


def optimize_incremental(
    spark: SparkSession,
    path: str,
    cluster_by: list[str] | tuple[str, ...] | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    max_rewrite_bytes: int = 512 * 1024 * 1024,
    fs: LocalSnapshotFS | None = None,
    curve: str | None = None,
    where: list | None = None,
) -> dict:
    """Budget-bounded INCREMENTAL re-clustering (the Delta liquid-
    clustering shape): rewrite only the worst-overlapping group of
    files, clustered on ``cluster_by``, carrying everything else.
    ``curve="hilbert"`` applies to the 2-column path (the actual
    liquid-clustering curve choice — ``layout.zorder_frame``).

    ``optimize_snapshot(zorder=...)`` rewrites the whole table (or the
    whole ``where=`` scope) because global clustering is a global
    property — correct, but at 100 TB a full rewrite per re-cluster is
    untenable.  This picks, from the
    manifest's envelopes alone (driver-side interval sweep, no data
    read), the largest group of mutually range-overlapping files on
    the primary cluster column, trims it to ``max_rewrite_bytes``, and
    range-partitions (1 column) or Z-orders (2 columns, equi-depth)
    just that group — its key region becomes internally disjoint in
    one commit.  Repeated invocations (e.g. after every K ingest
    batches) converge the layout region by region; each run's cost is
    bounded by the budget, never the table.  Returns ``{"version",
    "rewritten", "carried", "added", "groups_remaining"}``; a table
    with no overlapping group (already clustered, or nothing within
    budget) is a version-chain no-op.

    ``cluster_by=None`` uses the table's DECLARED clustering
    (``snap_set_clustering``) — the self-driving maintenance shape;
    with neither a declaration nor an argument the call fails loudly.
    ``curve=None`` likewise resolves declared > 'morton'.

    ``where`` scopes the overlap sweep (the ``OPTIMIZE ... WHERE``
    grammar of ``optimize_snapshot``, same ``snap_scan`` predicate
    forms): only files whose envelopes can match the predicate are
    candidates for grouping/rewriting, so re-clustering the one hot
    region a streaming writer just fragmented never pays attention to
    the rest of the table — out-of-scope overlap debt stays for a
    later pass and is NOT counted in ``groups_remaining``."""
    from .layout import zorder_frame

    cluster_by = list(cluster_by or [])
    if cluster_by and not 1 <= len(cluster_by) <= 2:
        raise ValueError("cluster_by takes 1 or 2 columns")
    f = _fs(fs)
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        cm = _cm(m)
        eff_cluster, eff_curve = list(cluster_by), curve
        if not eff_cluster:
            dcols, dcurve = _declared_clustering(m)
            if not dcols:
                raise ValueError(
                    f"optimize_incremental: no cluster_by argument and "
                    f"no declared clustering on {path!r} — declare one "
                    "with snap_set_clustering or pass cluster_by"
                )
            eff_cluster = dcols
            if eff_curve is None:
                eff_curve = dcurve
        eff_curve = eff_curve or "morton"
        col = eff_cluster[0]
        # envelopes/row-group ranges are keyed by the frozen PHYSICAL
        # name; the caller clusters on the logical one
        pcol = _phys(cm, col)
        if pcol not in m["stats_cols"]:
            raise ValueError(
                f"cluster column {col!r} not tracked in manifest "
                f"stats_cols {m['stats_cols']}"
            )
        pool = m["files"]
        if where:
            # OPTIMIZE ... WHERE: the sweep only ever sees in-scope
            # files; everything else is carried by reference below
            pool, _out = prune_manifest(m, where)
        groups = [
            g for g in _overlap_groups(pool, pcol) if len(g) >= 2
        ]
        if not groups:
            return {
                "version": m["version"],
                "rewritten": 0,
                "rewritten_bytes": 0,
                "carried": len(m["files"]),
                "added": 0,
                "groups_remaining": 0,
            }
        # size only the candidate files (multi-file groups) — the cost
        # contract is O(candidates), never O(table)
        cand = {i for g in groups for i in g}
        try:
            # _entry_path, not path-join: a shallow clone's entries
            # live under their owning base dir
            sizes = {
                pool[i]["name"]: f.getsize(_entry_path(path, pool[i]))
                for i in cand
            }
        except FileNotFoundError as e:
            # a concurrent commit + expire_snapshots can delete a
            # candidate between read_manifest and getsize — treat it
            # like a lost commit race (re-read the new manifest and
            # retry) rather than surfacing a spurious error; a missing
            # file with NO new commit is real corruption, so re-raise
            if current_version(path, fs) != m["version"]:
                last_err = e
                continue
            raise
        # worst group first: most files (then most bytes) — that's
        # where range pruning is losing the most
        groups.sort(
            key=lambda g: (
                len(g),
                sum(sizes[pool[i]["name"]] for i in g),
            ),
            reverse=True,
        )
        chosen = groups[0]
        # trim to budget, taking the files that overlap the MOST
        # others first (the wide-span offenders): each run then retires
        # maximal offenders, so repeated budgeted runs converge instead
        # of repeatedly re-clustering already-narrow files
        if len(chosen) <= 2048:

            def _env(i):
                s = pool[i]["stats"][pcol]
                return s["min"], s["max"]

            def _degree(i):
                lo_i, hi_i = _env(i)
                d = 0
                for j in chosen:
                    if j == i:
                        continue
                    lo_j, hi_j = _env(j)
                    if not (
                        _lt(hi_i, lo_j) is True or _lt(hi_j, lo_i) is True
                    ):
                        d += 1
                return d

            chosen = sorted(chosen, key=_degree, reverse=True)
        budgeted: list[int] = []
        total = 0
        for i in chosen:
            sz = sizes[pool[i]["name"]]
            # the budget is a target, not a straitjacket: a run must
            # always make progress, and the minimum useful re-cluster
            # is one PAIR of overlapping files
            if len(budgeted) >= 2 and total + sz > max_rewrite_bytes:
                break
            budgeted.append(i)
            total += sz
        # the trimmed group's leftover still mutually overlaps: it
        # remains clustering debt the NEXT run must see
        leftover_group = len(chosen) - len(budgeted) >= 2
        to_rewrite = [pool[i] for i in budgeted]
        names = {e["name"] for e in to_rewrite}
        carried = [e for e in m["files"] if e["name"] not in names]
        track_ids = bool(m.get("row_tracking"))
        if track_ids:
            # id-preserving rewrite (mirrors optimize_snapshot): a
            # re-cluster is a pure rearrangement, so every row must
            # keep its _row_id — reading without ids would let _commit
            # fresh-assign new ones, breaking stable identity and
            # making keys-less CDF see a mass delete+insert for a
            # layout-only commit
            df = _read_entries_with_ids(
                spark, path, to_rewrite, _manifest_schema(m), cm
            )
        else:
            df = _read_entries(
                spark, path, to_rewrite, _manifest_schema(m), cm
            )
        n_files = max(1, -(-total // target_bytes))  # ceil
        if len(eff_cluster) == 2:
            out = zorder_frame(
                df, tuple(eff_cluster), n_files, equidepth=True,
                curve=eff_curve,
            )
        else:
            out = df.repartitionByRange(
                n_files, F.col(col)
            ).sortWithinPartitions(col)
        new_entries = _write_data_files(
            spark, out, path, m["stats_cols"], fs, cm,
            # the caller-requested key clustering IS the layout; the
            # derived partition columns are still appended for stats
            pspec=_pspec(m), pcluster=False,
        )
        if track_ids:
            # marked before commit so the conflict-rebase path reuses
            # the same id-bearing entries
            for e in new_entries:
                e["row_id_col"] = True
        info = {
            "op": "optimize_incremental",
            "rewritten": len(to_rewrite),
            "carried": len(carried),
            "added": len(new_entries),
        }
        try:
            version = _commit(
                path, carried + new_entries, m["stats_cols"],
                base_version=m["version"],
                schema_json=m.get("schema"),
                txns=dict(m.get("txns", {})),
                commit_info=info, fs=fs, carry=m,
                adds=new_entries,
                removes=[e["name"] for e in to_rewrite],
            )
        except CommitConflict as e:
            version = _rebase_after_conflict(
                path, m, fs,
                adds=new_entries,
                removes=[x["name"] for x in to_rewrite],
                read_files=[],
                rearrange_only=True,
                commit_info=info,
            )
            if version is None:
                last_err = e
                continue
        return {
            "version": version,
            "rewritten": len(to_rewrite),
            "rewritten_bytes": total,
            "carried": len(carried),
            "added": len(new_entries),
            "groups_remaining": len(groups) - 1 + (1 if leftover_group else 0),
        }
    raise CommitConflict(
        f"optimize_incremental: lost the commit race {COMMIT_RETRIES} "
        f"times at {path!r}"
    ) from last_err


def auto_compact(
    spark: SparkSession,
    path: str,
    max_files: int = 32,
    target_bytes: int = 128 * 1024 * 1024,
    max_dv_fraction: float = 0.3,
    cluster_by: list[str] | None = None,
    max_overlap_group: int = 8,
    max_rewrite_bytes: int = 512 * 1024 * 1024,
    fs: LocalSnapshotFS | None = None,
) -> dict | None:
    """Maintenance POLICY hook: run ``optimize_snapshot`` when the
    CURRENT version references more than ``max_files`` files OR when
    deletion vectors mask more than ``max_dv_fraction`` of the table's
    physical rows (merge-on-read debt: every masked row is still read
    and anti-joined on every scan until a rewrite folds it away); and,
    with ``cluster_by``, run budgeted ``optimize_incremental`` when the
    worst range-overlap group on the cluster column exceeds
    ``max_overlap_group`` files (clustering debt: range scans and CoW
    merges over that key region stop pruning).

    The CoW coalesce bounds small-file accretion per commit but not
    cumulatively — N sequential 1-row merges each add a file.  Wiring
    this after every Kth ingest batch (see ``run_streaming_cdc``) keeps
    the file count AND the layout bounded without paying a rewrite on
    every batch.  Returns the optimize stats, or ``None`` when no
    policy fired.

    With ``cluster_by=None`` the table's DECLARED clustering
    (``snap_set_clustering``) drives both policies — schedulers stop
    repeating the key on every invocation (and can't disagree with
    each other about it)."""
    m = read_manifest(path, fs=fs)
    curve = "morton"
    if not cluster_by:
        dcols, dcurve = _declared_clustering(m)
        cluster_by = dcols or None
        if dcurve:
            curve = dcurve
    if cluster_by and _phys(_cm(m), cluster_by[0]) not in m["stats_cols"]:
        # silently never firing would let clustering debt grow
        # unbounded; fail as loudly as optimize_incremental does
        raise ValueError(
            f"cluster column {cluster_by[0]!r} not tracked in manifest "
            f"stats_cols {m['stats_cols']}"
        )
    rows = sum(e.get("rows", 0) for e in m["files"])
    dv_rows = sum(e["dv"]["rows"] for e in m["files"] if e.get("dv"))
    dv_debt = rows > 0 and dv_rows / rows > max_dv_fraction
    if len(m["files"]) > max_files or dv_debt:
        # cluster_by keeps the compaction key-ordered so the two
        # policies converge instead of undoing each other's work
        return optimize_snapshot(
            spark, path, target_bytes=target_bytes,
            cluster_by=cluster_by, fs=fs, curve=curve,
        )
    if cluster_by:
        col = _phys(_cm(m), cluster_by[0])
        worst = max(
            (len(g) for g in _overlap_groups(m["files"], col)), default=0
        )
        if worst > max_overlap_group:
            return optimize_incremental(
                spark, path, cluster_by,
                target_bytes=target_bytes,
                max_rewrite_bytes=max_rewrite_bytes, fs=fs,
                curve=curve,
            )
    return None


def table_changes(
    spark: SparkSession,
    path: str,
    keys: list[str] | None = None,
    from_version: int | None = None,
    to_version: int | None = None,
    fs: LocalSnapshotFS | None = None,
    from_timestamp=None,
    to_timestamp=None,
    from_ref: str | None = None,
    to_ref: str | None = None,
) -> DataFrame:
    """Row-level CHANGE DATA FEED between committed versions (the Delta
    CDF / Iceberg changelog surface), derived purely from the manifests
    — no change files are ever written.

    ``from_ref``/``to_ref`` accept TAG names (exclusive with the
    version/timestamp forms of the same endpoint): the release-diff
    use — "what changed between corpus tags v1 and v2" — without the
    caller resolving versions by hand.  Branch refs are refused: a
    branch is a different LINEAGE, and a cross-lineage row diff is
    publish's dry-run job, not the feed's.

    For each commit step the only files that can hold changed rows are
    the step's REMOVED and ADDED files (carried files are byte-identical
    by the CoW contract), so the diff reads exactly the rewritten slice
    of the table, never the whole of it: a full-outer join of the
    removed rows against the added rows on ``keys`` classifies each key
    as ``insert`` (new side only), ``delete`` (old side only), or — when
    any non-key column differs null-safely — an ``update_preimage`` /
    ``update_postimage`` pair; carried-through rows inside rewritten
    files compare equal and are dropped.  Rows carry ``_change_type``
    and ``_commit_version``; each side of a step reads with ITS
    version's recorded schema, so schema evolution surfaces as updates
    with null preimage columns.  Changes are emitted per commit, so a
    key touched in several commits appears once per commit — replaying
    the feed onto the ``from_version`` state reproduces ``to_version``
    exactly (the fold test), which is what makes downstream incremental
    materialized-view maintenance possible without rescanning the table.

    ``from_version`` is EXCLUSIVE (the state you already have);
    ``to_version`` inclusive, default CURRENT.  The Delta CDF
    timestamp forms compose on the same adjusted commit timeline:
    ``from_timestamp`` (exclusive with ``from_version``) means "every
    change AT or AFTER the instant" — resolved like the streaming
    ``startingTimestamp`` (the version strictly before it becomes the
    exclusive floor; 0 on a pre-history instant) — and
    ``to_timestamp`` (exclusive with ``to_version``) pins the
    inclusive end via ``version_at_timestamp``.  Cost at 100 TB:
    O(rewritten files across the range + join of their rows) — for a
    clustered table that is the update slice, not the table.
    """
    def _tag_version(ref: str, which: str) -> int:
        from .refs import resolve_ref

        kind, val = resolve_ref(path, ref, fs)
        if kind != "tag":
            raise ValueError(
                f"table_changes: {which} {ref!r} is a branch — the "
                "feed diffs THIS lineage's commits; use "
                "snap_publish_branch(dry_run=True) to preview a "
                "branch against main"
            )
        return int(val)

    if from_ref is not None:
        if from_version is not None or from_timestamp is not None:
            raise ValueError(
                "table_changes: pass ONE of from_version/"
                "from_timestamp/from_ref"
            )
        from_version = _tag_version(from_ref, "from_ref")
    if to_ref is not None:
        if to_version is not None or to_timestamp is not None:
            raise ValueError(
                "table_changes: pass ONE of to_version/"
                "to_timestamp/to_ref"
            )
        to_version = _tag_version(to_ref, "to_ref")
    if from_timestamp is not None:
        if from_version is not None:
            raise ValueError(
                "table_changes: pass from_version OR from_timestamp,"
                " not both"
            )
        from_version = version_before_timestamp(path, from_timestamp, fs)
    if from_version is None:
        raise ValueError(
            "table_changes: pass from_version, from_timestamp, or "
            "from_ref"
        )
    if to_timestamp is not None:
        if to_version is not None:
            raise ValueError(
                "table_changes: pass to_version OR to_timestamp,"
                " not both"
            )
        to_version = version_at_timestamp(path, to_timestamp, fs)
    to_v = current_version(path, fs) if to_version is None else to_version
    if from_version >= to_v:
        raise ValueError(
            f"table_changes: empty range ({from_version}, {to_v}]"
        )
    to_m = read_manifest(path, to_v, fs)
    out_schema = _manifest_schema(to_m)
    out_cols = (
        [f.name for f in out_schema.fields]
        if out_schema is not None
        else snap_read(spark, path, to_v, fs).columns
    )
    by_id = keys is None
    if by_id:
        # keys-less CDF (Delta's shape): diff by IDENTITY on a
        # row-tracked table — same id on both sides of a step with
        # differing content is an update pair, id only on the old
        # side a delete, only on the new an insert.  Sound because
        # phase-2 preservation makes every keyed mutator keep the
        # updated row's id; the feed exposes ``_row_id`` so a
        # consumer can fold by identity with no key declaration.
        if not to_m.get("row_tracking"):
            raise ValueError(
                "table_changes: keys=None needs row tracking — "
                "snap_enable_row_tracking(path), or pass the logical"
                " keys"
            )
        out_cols = out_cols + [ROW_ID_COL]
        keys = [ROW_ID_COL]
    attrs = [c for c in out_cols if c not in keys]

    def _sig(e: dict) -> tuple:
        # a file's LOGICAL content is (name, deletion vector): a commit
        # that only grew a file's DV changed its rows without renaming
        # it, and must surface in the diff exactly like a rewrite
        d = e.get("dv") or {}
        return (e["name"], d.get("file"), d.get("rows"))

    steps = []
    prev_m = read_manifest(path, from_version, fs)
    for v in range(from_version + 1, to_v + 1):
        cur_m = read_manifest(path, v, fs)
        prev_sigs = {_sig(e) for e in prev_m["files"]}
        cur_sigs = {_sig(e) for e in cur_m["files"]}
        removed = [e for e in prev_m["files"] if _sig(e) not in cur_sigs]
        added = [e for e in cur_m["files"] if _sig(e) not in prev_sigs]
        if (
            (cur_m.get("commit_info") or {}).get("op") == "optimize"
            and cur_m.get("row_tracking")
            and not any(e.get("dv") for e in removed)
            and added
            and all(e.get("row_id_col") for e in added)
        ):
            # row tracking proves this OPTIMIZE is a pure
            # rearrangement (ids preserved, no DV debt on inputs):
            # the diff would read the whole rewritten slice only to
            # cancel every row — skip it (same emitted rows: none)
            prev_m = cur_m
            continue

        def _read(entries: list[dict], m: dict) -> DataFrame | None:
            if not entries:
                return None
            reader = _read_entries_with_ids if by_id else _read_entries
            df = reader(
                spark, path, entries, _manifest_schema(m), _cm(m)
            )
            # align to the output schema (null-backfill evolved columns)
            have = set(df.columns)
            return df.select(
                *[
                    F.col(c) if c in have else F.lit(None).alias(c)
                    for c in out_cols
                ]
            )

        old = _read(removed, prev_m)
        new = _read(added, cur_m)
        prev_m = cur_m
        if old is None and new is None:
            continue

        def _tag(df: DataFrame, kind: str) -> DataFrame:
            return df.select(
                *out_cols,
                F.lit(kind).alias("_change_type"),
                F.lit(v).alias("_commit_version"),
            )

        if old is None:
            steps.append(_tag(new, "insert"))
            continue
        if new is None:
            steps.append(_tag(old, "delete"))
            continue

        o = old.select(
            *[F.col(k) for k in keys],
            *[F.col(a).alias(f"_old_{a}") for a in attrs],
            F.lit(True).alias("_in_old"),
        )
        n = new.select(
            *[F.col(k) for k in keys],
            *[F.col(a).alias(f"_new_{a}") for a in attrs],
            F.lit(True).alias("_in_new"),
        )
        j = o.join(n, keys, "full_outer")
        ins = j.filter(F.col("_in_old").isNull()).select(
            *keys,
            *[F.col(f"_new_{a}").alias(a) for a in attrs],
            F.lit("insert").alias("_change_type"),
            F.lit(v).alias("_commit_version"),
        )
        dele = j.filter(F.col("_in_new").isNull()).select(
            *keys,
            *[F.col(f"_old_{a}").alias(a) for a in attrs],
            F.lit("delete").alias("_change_type"),
            F.lit(v).alias("_commit_version"),
        )
        both = j.filter(
            F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()
        )
        if attrs:
            from functools import reduce as _reduce

            differ = _reduce(
                lambda x, y: x | y,
                [
                    ~F.col(f"_old_{a}").eqNullSafe(F.col(f"_new_{a}"))
                    for a in attrs
                ],
            )
            changed = both.filter(differ)
        else:
            changed = both.limit(0)
        pre = changed.select(
            *keys,
            *[F.col(f"_old_{a}").alias(a) for a in attrs],
            F.lit("update_preimage").alias("_change_type"),
            F.lit(v).alias("_commit_version"),
        )
        post = changed.select(
            *keys,
            *[F.col(f"_new_{a}").alias(a) for a in attrs],
            F.lit("update_postimage").alias("_change_type"),
            F.lit(v).alias("_commit_version"),
        )
        steps.append(ins.unionByName(dele).unionByName(pre).unionByName(post))

    if not steps:
        empty = snap_read(
            spark, path, to_v, fs, with_row_ids=by_id
        ).limit(0)
        return empty.select(
            *out_cols,
            F.lit("insert").alias("_change_type"),
            F.lit(0).alias("_commit_version"),
        ).limit(0)
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def snap_register(
    spark: SparkSession,
    path: str,
    name: str,
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
    ref: str | None = None,
    include_metadata: bool = False,
) -> None:
    """Expose a snapshot version to the SQL surface as a temp view:
    ``spark.sql("SELECT ... FROM name")`` then runs over that version's
    exact file list (reader isolation included — the view pins the
    resolved version, later commits don't leak in).  Re-register to
    pick up a newer version.  ``ref=`` registers a branch head or a
    tag-pinned version by name; ``include_metadata=True`` additionally
    registers ``<name>_history`` and ``<name>_files`` (the Delta
    ``table$history`` / Iceberg ``.files`` idea on the temp-view
    surface) so ops SQL can join data against operations and
    layout."""
    snap_read(
        spark, path, version, fs, ref=ref
    ).createOrReplaceTempView(name)
    if include_metadata:
        mpath, mver = path, version
        if ref is not None:
            from .refs import resolve_ref

            kind, val = resolve_ref(path, ref, fs)
            mpath, mver = (
                (val, None) if kind == "branch" else (path, int(val))
            )
        snap_history(spark, mpath, fs).createOrReplaceTempView(
            f"{name}_history"
        )
        snap_files(spark, mpath, mver, fs).createOrReplaceTempView(
            f"{name}_files"
        )


def snap_count(
    path: str,
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """``COUNT(*)`` from METADATA alone: the manifest's per-file row
    counts minus deletion-vector masks — zero files opened, zero Spark
    jobs (the Delta metadata-only count).  Exact by the layer's
    invariants: manifests record each immutable file's footer row
    count at commit, and DV position sets are deduplicated, so
    ``rows - dv_rows`` is the live count at any version."""
    m = read_manifest(path, version, fs)
    rows = sum(e.get("rows", 0) for e in m["files"])
    dv = sum(e["dv"]["rows"] for e in m["files"] if e.get("dv"))
    return rows - dv


def snapshot_audit(path: str, fs: LocalSnapshotFS | None = None) -> list[dict]:
    """The table's commit history, reconstructed from the MANIFESTS —
    not from any driver-side log, so it survives process restarts and is
    exactly what a crashed-and-restarted ingest left behind.  Returns
    one entry per still-readable version (expired manifests are gone by
    definition): ``{"version", "txns", "commit_info", "files",
    "rows"}``."""
    f = _fs(fs)
    cur = current_version(path, fs)
    out = []
    for v in range(1, cur + 1):
        if not f.exists(_manifest_path(path, v)):
            continue
        m = read_manifest(path, v, fs)
        rows = sum(e.get("rows", 0) for e in m["files"])
        dv_rows = sum(
            e["dv"]["rows"] for e in m["files"] if e.get("dv")
        )
        out.append(
            {
                "version": m["version"],
                "ts": m.get("ts"),  # committer clock; None pre-r11
                "txns": m.get("txns", {}),
                "commit_info": m.get("commit_info", {}),
                "files": len(m["files"]),
                "rows": rows,
                "dv_rows": dv_rows,
                "live_rows": rows - dv_rows,
            }
        )
    return out


def snap_history(
    spark: SparkSession,
    path: str,
    fs: LocalSnapshotFS | None = None,
) -> DataFrame:
    """``DESCRIBE HISTORY`` as a DataFrame — the commit log queryable
    with Spark SQL (join it against metrics, filter by op, chart
    live-row growth).  One row per still-readable version, flattening
    the fields ops tooling filters on (``op``, ``mode``, ``branch``)
    and carrying the full ``commit_info``/``txns`` as JSON strings.
    Built on ``snapshot_audit`` (manifest-reconstructed, so it
    survives restarts and shows exactly what a crashed ingest left);
    driver cost O(versions x files) — the audit cost class, not a
    scan."""
    rows = [
        (
            int(r["version"]),
            float(r["ts"]) if r.get("ts") is not None else None,
            (r["commit_info"] or {}).get("op"),
            (r["commit_info"] or {}).get("mode"),
            (r["commit_info"] or {}).get("branch"),
            int(r["files"]),
            int(r["rows"]),
            int(r["dv_rows"]),
            int(r["live_rows"]),
            json.dumps(r["commit_info"] or {}, sort_keys=True),
            json.dumps(r["txns"] or {}, sort_keys=True),
        )
        for r in snapshot_audit(path, fs)
    ]
    return spark.createDataFrame(
        rows,
        "version long, ts double, op string, mode string, "
        "branch string, files long, rows long, dv_rows long, "
        "live_rows long, commit_info string, txns string",
    )


def snap_files(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
    ref: str | None = None,
) -> DataFrame:
    """The files metadata table (the Iceberg ``.files`` shape) — one
    row per manifest entry of the resolved version/ref, as a DataFrame
    for SQL over table LAYOUT: file sizes for compaction planning, DV
    mask fractions for rewrite scheduling, row-id bases for tracking
    audits, stats envelopes as JSON for skew/pruning analysis.  Reads
    manifests only — no data file is opened."""
    if ref is not None:
        from .refs import resolve_ref

        if version is not None:
            raise ValueError("snap_files: pass ref OR version, not both")
        kind, val = resolve_ref(path, ref, fs)
        if kind == "branch":
            return snap_files(spark, val, None, fs)
        version = int(val)
    m = read_manifest(path, version, fs)
    rows = [
        (
            e["name"],
            e.get("base"),
            int(e.get("rows") or 0),
            int(e.get("bytes") or 0),
            int(e["dv"]["rows"]) if e.get("dv") else 0,
            int(e["row_id_base"]) if "row_id_base" in e else None,
            bool(e.get("row_id_col")),
            json.dumps(e.get("stats") or {}, sort_keys=True),
        )
        for e in m["files"]
    ]
    return spark.createDataFrame(
        rows,
        "name string, base string, rows long, bytes long, "
        "dv_rows long, row_id_base long, row_id_col boolean, "
        "stats string",
    )


def verify_snapshot(
    path: str,
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
    check_ids: bool = False,
    spark: SparkSession | None = None,
) -> dict:
    """fsck for a snapshot version: every manifest entry must exist on
    disk with a readable footer whose row count matches the manifest.

    Footer-only (no data pages) — O(files) driver work, the same cost
    class as commit.  Returns ``{"version", "files", "rows", "missing",
    "mismatched"}``; a non-empty ``missing``/``mismatched`` means the
    table dir was mutated outside the commit protocol (or a GC raced a
    pinned reader past its ``keep_last``).

    ``check_ids=True`` (tracked tables; needs ``spark``) adds the DEEP
    row-id audit the footer-free invariants cannot see: slice checks
    prove fresh-file ranges are disjoint, but ``row_id_col`` entries
    own their ids BY CONTENT, so a writer bug could only surface as
    duplicate ids inside the materialized column.  The audit is one
    distributed ``groupBy(_row_id)`` over the live view (DVs applied)
    — a shuffle of the id column, never a driver materialization, so
    it scales to any table size; run it at maintenance cadence, not
    per commit."""
    import pyarrow.parquet as pq

    f = _fs(fs)
    m = read_manifest(path, version, fs)
    missing: list[str] = []
    mismatched: list[dict] = []
    total_rows = 0
    dv_rows = 0
    for e in m["files"]:
        full = _entry_path(path, e)
        if not f.exists(full):
            missing.append(e["name"])
            continue
        try:
            actual = pq.ParquetFile(full).metadata.num_rows
        except Exception as err:  # corrupt footer
            mismatched.append({"file": e["name"], "error": str(err)})
            continue
        if actual != e["rows"]:
            mismatched.append(
                {"file": e["name"], "manifest": e["rows"], "actual": actual}
            )
        total_rows += actual
        bloom = e.get("bloom")
        if bloom and not f.exists(_sidecar_path(path, e, bloom["file"])):
            missing.append(bloom["file"])
        dv = e.get("dv")
        if dv:
            if not f.exists(_dv_path(path, e)):
                missing.append(dv["file"])
                continue
            if dv["rows"] > e["rows"]:
                mismatched.append(
                    {
                        "file": e["name"],
                        "error": f"dv masks {dv['rows']} of {e['rows']} rows",
                    }
                )
            dv_rows += dv["rows"]
    if m.get("row_tracking"):
        # row-ID invariants, same footer-free cost class: every
        # fresh-file slice [base, base+rows) must sit below the
        # watermark and never overlap another (materialized-column
        # entries own their ids by content, not by slice)
        nxt = int(m.get("next_row_id") or 0)
        slices = sorted(
            (int(e["row_id_base"]), int(e["rows"]))
            for e in m["files"]
            if not e.get("row_id_col") and "row_id_base" in e
        )
        for (b1, r1), (b2, _r2) in zip(slices, slices[1:]):
            if b2 < b1 + r1:
                mismatched.append(
                    {"error": f"row-id slices overlap at {b2}"}
                )
        if slices and slices[-1][0] + slices[-1][1] > nxt:
            mismatched.append(
                {
                    "error": "row-id slice exceeds next_row_id "
                    f"watermark {nxt}"
                }
            )
        untagged = [
            e["name"]
            for e in m["files"]
            if not e.get("row_id_col") and "row_id_base" not in e
        ]
        if untagged:
            mismatched.append(
                {
                    "error": "tracked table has entries without row-id"
                    f" state: {untagged[:3]}"
                }
            )
        if check_ids:
            if spark is None:
                raise ValueError(
                    "verify_snapshot(check_ids=True) needs a "
                    "SparkSession — the distinct-id audit is a "
                    "distributed groupBy, never driver-side"
                )
            dup = (
                snap_read(
                    spark, path, version=m["version"], fs=fs,
                    with_row_ids=True,
                )
                .groupBy(ROW_ID_COL)
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
                .limit(5)
                .collect()
            )
            if dup:
                mismatched.append(
                    {
                        "error": "duplicate live row ids (materialized "
                        "id column diverged from the slice "
                        "invariants): "
                        f"{sorted(int(r[0]) for r in dup)}"
                    }
                )
    return {
        "version": m["version"],
        "files": len(m["files"]),
        "rows": total_rows,
        "dv_rows": dv_rows,
        "live_rows": total_rows - dv_rows,
        "missing": missing,
        "mismatched": mismatched,
    }


def snap_clone(
    src: str,
    dst: str,
    version: int | None = None,
    timestamp=None,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """SHALLOW clone: create table ``dst`` whose v1 manifest references
    ``src``'s data files (at ``version``/``timestamp``, default
    CURRENT) — zero bytes copied, the Delta ``CLONE`` / Iceberg-ref
    shape.  A 100 TB table becomes a dev/test sandbox in one manifest
    write.

    Mechanics: every cloned entry gains ``"base"`` — the dir that OWNS
    the bytes (``_entry_path`` resolves reads there; a clone of a
    clone keeps the ORIGINAL base, so chains never indirect).  Schema,
    stats columns, column mapping, partition spec, CHECK constraints,
    column defaults, GENERATED declarations, and declared clustering
    carry over; txn markers do NOT (the clone is a new ingest
    surface).  Mutations diverge naturally: CoW rewrites write new
    files into ``dst`` and drop the borrowed references.

    GC safety (the interesting half): before the manifest commit, a
    marker lands under each referenced base's ``_clones/`` dir, and
    the source's ``expire_snapshots`` protects every file any live
    clone manifest still references (see ``_clone_protected``) — so a
    source vacuum can never break a clone, unlike Delta, where VACUUM
    on the source is documented to do exactly that.  The clone's own
    GC only ever lists its own dir, so it cannot touch source bytes.

    Returns the clone's version (1)."""
    f = _fs(fs)
    if current_version(dst, fs) != 0:
        raise ValueError(f"snap_clone: {dst!r} already exists")
    if timestamp is not None:
        if version is not None:
            raise ValueError("snap_clone: pass version OR timestamp")
        version = version_at_timestamp(src, timestamp, fs)
    m = read_manifest(src, version, fs)
    src_abs = os.path.abspath(src)
    entries: list[dict] = []
    bases: set[str] = set()
    for e in m["files"]:
        ce = dict(e)
        ce["base"] = os.path.abspath(e.get("base") or src_abs)
        bases.add(ce["base"])
        # a dv recorded by a BORROWING table lives in that table's
        # dir (dv["base"], see _dv_path) — its owner needs a marker
        # too, or ITS GC could reclaim a sidecar this clone reads
        dv = e.get("dv")
        if dv and dv.get("base"):
            bases.add(os.path.abspath(dv["base"]))
        entries.append(ce)
    # markers BEFORE the commit: GC must never miss a just-born clone
    # (a dangling marker for a never-committed dst is retired by the
    # next GC pass — it protects nothing once dst has no manifests)
    rec = json.dumps(
        {
            "dst": os.path.abspath(dst),
            "src_version": m["version"],
            "ts": time.time(),
        }
    )
    for b in sorted(bases):
        cdir = os.path.join(b, _CLONES_DIR)
        f.makedirs(cdir)
        f.create_exclusive(
            os.path.join(cdir, f"clone-{uuid.uuid4().hex[:12]}.json"),
            rec,
        )
    carry = {
        k: m[k]
        for k in (
            "constraints",
            "column_mapping",
            "partition_spec",
            "partition_field_seq",
            "features",
            "writer_features",
            # schema-level declarations travel with the schema: a
            # clone silently dropping column DEFAULTs would be the
            # carry-loop strip hazard all over again — and a clone
            # dropping GENERATED declarations would be worse (writes
            # to the clone would skip fill AND validation); declared
            # clustering likewise keeps the clone's maintenance
            # self-driving
            "defaults",
            "generated",
            "clustering",
            "identity",
            # row tracking carries as a property; the clone's entries
            # get FRESH bases from _commit (it is a new table — ids
            # are not shared with the source)
            "row_tracking",
        )
        if m.get(k)
    }
    carry["clone_of"] = {"path": src_abs, "version": m["version"]}
    if m.get("row_tracking"):
        # start the clone's watermark at the source's: entries with a
        # MATERIALIZED _row_id column keep those ids (the bytes are
        # shared), so fresh bases must begin above every source id
        carry["next_row_id"] = int(m.get("next_row_id") or 0)
    return _commit(
        dst,
        entries,
        m["stats_cols"],
        base_version=0,
        schema_json=m.get("schema"),
        txns={},
        commit_info={
            "op": "clone",
            "source": src_abs,
            "source_version": m["version"],
        },
        fs=fs,
        carry=carry,
        adds=entries,
        removes=[],
    )


def _clone_protected(
    path: str,
    f: LocalSnapshotFS,
    fs: LocalSnapshotFS | None,
    retire: bool = True,
) -> set[str]:
    """File names of ``path`` that some live clone still references —
    the source GC's do-not-delete set.  Walks every readable manifest
    of every registered clone (O(clones x versions x files) driver
    JSON reads — the ``snapshot_audit`` cost class; clones are
    sandboxes, not fleets).  Markers whose clone is gone, or whose
    clone no longer references this table from ANY readable version
    (fully diverged — a restore past its own GC floor is impossible,
    so dropped references can never come back), are retired here."""
    cdir = os.path.join(path, _CLONES_DIR)
    if not f.exists(cdir):
        return set()
    src_abs = os.path.abspath(path)
    protected: set[str] = set()
    seen_dst: set[str] = set()
    for name in sorted(f.listdir(cdir)):
        if not name.endswith(".json"):
            continue
        marker = os.path.join(cdir, name)
        try:
            rec = json.loads(f.read_text(marker))
        except (ValueError, FileNotFoundError):
            continue
        dst = rec.get("dst")
        if dst:
            # protection is per-DESTINATION: a duplicate marker for a
            # dst this pass already walked adds nothing but another
            # O(versions x files) manifest walk — retire it
            dst_abs = os.path.abspath(dst)
            if dst_abs in seen_dst:
                if retire:
                    f.remove(marker)
                continue
            seen_dst.add(dst_abs)
        refs: set[str] = set()
        if dst and f.exists(_current_path(dst)):
            mdir = os.path.join(dst, _MANIFEST_DIR)
            for mn in f.listdir(mdir):
                if not (mn.startswith("v") and mn.endswith(".json")):
                    continue
                try:
                    entries = read_manifest(dst, int(mn[1:-5]), fs)[
                        "files"
                    ]
                except (FileNotFoundError, ValueError):
                    continue
                for e in entries:
                    ebase = os.path.abspath(e.get("base") or dst)
                    if ebase == src_abs:
                        refs.add(e["name"])
                        if e.get("bloom"):
                            refs.add(e["bloom"]["file"])
                    # the dv sidecar may live in a DIFFERENT table's
                    # dir than the data bytes (_dv_path): protect it
                    # in whichever table owns it
                    dv = e.get("dv")
                    if dv and (
                        os.path.abspath(dv.get("base") or ebase)
                        == src_abs
                    ):
                        refs.add(dv["file"])
        if refs:
            protected |= refs
        elif retire:
            f.remove(marker)
    return protected


def _tagged_versions(path: str, f: LocalSnapshotFS) -> dict[str, int]:
    """Tag name -> pinned version, from ``_refs/tag-*.json``
    (``sources/refs.py``).  Unreadable markers are skipped — a tag
    protects history only while its record parses."""
    rdir = os.path.join(path, _REFS_DIR)
    if not f.exists(rdir):
        return {}
    out: dict[str, int] = {}
    for name in f.listdir(rdir):
        if not (name.startswith("tag-") and name.endswith(".json")):
            continue
        try:
            rec = json.loads(f.read_text(os.path.join(rdir, name)))
            out[name[4:-5]] = int(rec["version"])
        except (ValueError, KeyError, FileNotFoundError):
            continue
    return out


def expire_snapshots(
    path: str,
    keep_last: int = 1,
    orphan_grace_seconds: float = 600.0,
    fs: LocalSnapshotFS | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Delete data files referenced only by expired versions (and the
    expired manifests).  Keeps the most recent ``keep_last`` versions.

    ``dry_run=True`` (the Delta ``VACUUM ... DRY RUN`` shape) returns
    the same name list WITHOUT touching anything: no file or manifest
    deletion, no retention-floor checkpoint write, and no clone-marker
    retirement — a pure preview of what the real run would reclaim.

    Orphaned ``data-*`` files and ``_stage-*`` dirs (crashed or
    in-flight writers) are removed only when OLDER than
    ``orphan_grace_seconds`` — an in-flight writer publishes its data
    files before committing, so an age threshold is what stops GC from
    deleting files an imminent commit will reference.  (Files referenced
    by EXPIRED manifests need no grace: a writer still basing on an
    expired version loses its create-exclusive commit claim by
    construction, so its stale references can never become CURRENT.)
    Returns the deleted file names."""
    f = _fs(fs)
    cur = current_version(path, fs)
    if cur == 0:
        return []
    keep_versions = set(range(max(1, cur - keep_last + 1), cur + 1))
    v_min = min(keep_versions)
    # a TAG pins its version outside the keep_last window (sources/
    # refs.py): its manifest, checkpoint, and files all survive GC
    # until the tag is dropped — the Iceberg tag-retention contract
    tagged = {
        v
        for v in _tagged_versions(path, f).values()
        if f.exists(_manifest_path(path, v))
    }
    keep_versions |= tagged
    live: set[str] = set()
    referenced: set[str] = set()
    all_versions: list[int] = []
    for name in f.listdir(os.path.join(path, _MANIFEST_DIR)):
        if name.startswith("v") and name.endswith(".json"):
            all_versions.append(int(name[1:-5]))
    for v in sorted(all_versions):
        entries = read_manifest(path, v, fs)["files"]
        names = {e["name"] for e in entries}
        names |= {e["dv"]["file"] for e in entries if e.get("dv")}
        names |= {e["bloom"]["file"] for e in entries if e.get("bloom")}
        referenced |= names
        if v in keep_versions:
            live |= names
    # files a live shallow clone still references must survive this
    # table's GC no matter which versions HERE retained them
    live |= _clone_protected(path, f, fs, retire=not dry_run)
    # delta commit records below the retention floor are about to be
    # deleted, so the oldest retained version must become reconstructible
    # on its own: force a compacted checkpoint at exactly v_min BEFORE
    # any deletion (every retained v > v_min then replays from it).
    # force=True propagates a failed write, and the existence check is
    # re-verified independently — GC must NEVER delete the only
    # reconstruction path of the retained versions (permanent table
    # loss); aborting here leaves the table fully intact.
    if any(v < v_min for v in all_versions) and not dry_run:
        # every retained version below the contiguous floor (tags)
        # needs its OWN checkpoint: the delta chain beneath AND
        # between tagged versions is about to be deleted, so each
        # must become reconstructible standalone (_find_checkpoint
        # picks the exact-version checkpoint, replaying zero deltas)
        for v_keep in sorted(v for v in tagged if v < v_min) + [v_min]:
            _maybe_checkpoint(
                f, path, v_keep,
                read_manifest(path, v_keep, fs)["files"],
                force=True,
            )
            if not f.exists(_ckpt_path(path, v_keep)):
                raise RuntimeError(
                    f"expire_snapshots: retention checkpoint "
                    f"{_ckpt_path(path, v_keep)!r} is missing after a "
                    "forced write; aborting GC — deleting the delta "
                    "chain without it would make the retained version "
                    "unreconstructable"
                )
    now = time.time()
    deleted = []
    for name in f.listdir(path):
        full = os.path.join(path, name)
        if name.startswith("_stage-"):
            if now - f.getmtime(full) >= orphan_grace_seconds:
                if not dry_run:
                    f.rmtree(full)
                deleted.append(name)
            continue
        if not (
            (
                name.startswith(("data-", "dv-"))
                and name.endswith(".parquet")
            )
            or (name.startswith("bloom-") and name.endswith(".json"))
        ):
            continue
        if name in live:
            continue
        if name in referenced:  # expired-version file: safe, no grace
            if not dry_run:
                f.remove(full)
            deleted.append(name)
        elif now - f.getmtime(full) >= orphan_grace_seconds:
            if not dry_run:
                f.remove(full)
            deleted.append(name)
    for v in all_versions:
        if v not in keep_versions:
            if not dry_run:
                f.remove(_manifest_path(path, v))
            deleted.append(f"v{v}.json")
    # checkpoints strictly below the retention floor serve no retained
    # version (v_min has its own, just written above); multi-part
    # checkpoints' part files carry the version before the first dot
    for name in f.listdir(os.path.join(path, _MANIFEST_DIR)):
        if name.startswith("checkpoint-v") and name.endswith(".json"):
            try:
                v = int(name[len("checkpoint-v"):].split(".", 1)[0])
            except ValueError:
                continue
            if v < v_min and v not in keep_versions:
                if not dry_run:
                    f.remove(os.path.join(path, _MANIFEST_DIR, name))
                deleted.append(name)
    # dropped-branch remnants (sources/refs.py): a branch dir whose
    # manifests are gone but whose data files main still references
    # (zero-copy publish) lingers until main's own retention lets go;
    # each GC pass here reclaims whatever became unreferenced since
    broot = os.path.join(path, _BRANCHES_DIR)
    if f.exists(broot):
        for bname in f.listdir(broot):
            bd = os.path.join(broot, bname)
            if f.exists(_current_path(bd)):
                continue  # live branch: it runs its own GC
            protected = _clone_protected(bd, f, fs, retire=not dry_run)
            rel = f"{_BRANCHES_DIR}/{bname}"
            empty = True
            for n in f.listdir(bd):
                full = os.path.join(bd, n)
                if n.startswith("_stage-"):
                    if now - f.getmtime(full) >= orphan_grace_seconds:
                        if not dry_run:
                            f.rmtree(full)
                        deleted.append(f"{rel}/{n}")
                    else:
                        empty = False
                    continue
                if not (
                    (
                        n.startswith(("data-", "dv-"))
                        and n.endswith(".parquet")
                    )
                    or (n.startswith("bloom-") and n.endswith(".json"))
                ):
                    continue
                if n in protected:
                    empty = False
                    continue
                if now - f.getmtime(full) >= orphan_grace_seconds:
                    if not dry_run:
                        f.remove(full)
                    deleted.append(f"{rel}/{n}")
                else:
                    empty = False
            if empty and not protected and not dry_run:
                f.rmtree(bd)
    return deleted


# --------------------------------------------------------------------------
# CHECK constraints, UPDATE-by-predicate, RESTORE
# --------------------------------------------------------------------------
# The Delta-parity ring the reference never had (its tables are
# write-once text buckets, /root/reference/src/worker.cc): declarative
# row-quality gates enforced AT COMMIT on every write path, predicate
# UPDATE with file-level copy-on-write, and metadata-only rollback.

# violating rows quoted in a ConstraintViolation message
_CONSTRAINT_SAMPLE_ROWS = 3


def _generated_checks(m: dict) -> dict[str, str]:
    """Synthetic CHECK constraints enforcing GENERATED ALWAYS AS: a
    writer-supplied value must null-safely equal the declared
    expression.  ``IS NOT DISTINCT FROM`` evaluates identically in
    Spark (the batch writers' validator) and DuckDB (the streaming
    sink's session-free validator), so generated columns ride the
    existing constraint machinery on every write path."""
    # bare identifiers by construction (snap_add_column validates
    # ``name.isidentifier()``) — no quoting, because the sink's DuckDB
    # validator rejects backticks and Spark rejects double quotes here
    return {
        f"__generated_{c}": f"({c} IS NOT DISTINCT FROM ({e}))"
        for c, e in sorted((m.get("generated") or {}).items())
    }


def _reject_identity(m: dict, op: str) -> None:
    """Keyed/replacing mutators refuse tables with IDENTITY columns:
    this build's allocator lives on the append path only, so a merge
    INSERT (or overwrite) would have to invent surrogate keys — better
    loud than duplicated.  Rewrite-only maintenance (OPTIMIZE, deletes,
    UPDATE not touching the column) stays allowed: it carries the
    already-assigned physical values."""
    ids = m.get("identity") or {}
    if ids:
        raise ValueError(
            f"{op}: table declares IDENTITY column(s) {sorted(ids)} — "
            "identity tables are append-ingest surfaces in this build "
            "(snap_append assigns values); drop the declaration for "
            "keyed mutation"
        )


def _enforce_constraints(m: dict, df: DataFrame, op: str) -> None:
    """Raise ``ConstraintViolation`` if any row of ``df`` FAILS a CHECK
    constraint recorded in manifest ``m``.

    SQL CHECK semantics: a row violates only when the expression
    evaluates to FALSE — NULL passes (declare ``col IS NOT NULL`` to
    reject nulls).  One filter+limit job per constraint, and only on
    write paths of tables that declare constraints; the scan is over
    the incoming batch, never the table.  GENERATED ALWAYS AS columns
    validate here too (``_generated_checks``): a batch carrying a
    generated column with values that diverge from the declared
    expression is rejected before commit."""
    cons = {**(m.get("constraints") or {}), **_generated_checks(m)}
    for name, expr in sorted(cons.items()):
        bad = df.filter(
            ~F.coalesce(F.expr(expr), F.lit(True))
        ).limit(_CONSTRAINT_SAMPLE_ROWS).collect()
        if bad:
            sample = [r.asDict(recursive=True) for r in bad]
            raise ConstraintViolation(
                f"{op}: {len(sample)}+ row(s) violate CHECK constraint "
                f"{name!r} ({expr}); sample: {sample}"
            )


def _enforce_constraints_files(
    paths: list[str], cons: dict, op: str, cm: dict | None = None
) -> None:
    """Session-free CHECK validation over parquet files via DuckDB —
    for contexts with no SparkSession (the streaming sink's ``commit``
    runs in a dedicated Python worker, not the driver).  Same
    semantics as ``_enforce_constraints`` (violation = expression
    FALSE, NULL passes); an expression DuckDB cannot evaluate fails
    the batch LOUDLY rather than skipping the check — keep constraint
    expressions ANSI-portable on tables that are streamed into.
    ``cm`` (logical->physical) re-surfaces a mapped table's physical
    column names under the logical ones the expressions reference."""
    if not cons or not paths:
        return
    import duckdb

    con = duckdb.connect()
    files_sql = (
        "read_parquet(["
        + ", ".join("'" + p.replace("'", "''") + "'" for p in paths)
        + "])"
    )
    renames = [
        (p, l) for l, p in sorted((cm or {}).items()) if p != l
    ]
    if renames:
        # alias physical -> logical (star-EXCLUDE keeps the rest; the
        # column ORDER is irrelevant to constraint evaluation)
        aliased = ", ".join(f'"{p}" AS "{l}"' for p, l in renames)
        excluded = ", ".join(f'"{p}"' for p, _ in renames)
        files_sql = (
            f"(SELECT {aliased}, * EXCLUDE ({excluded}) "
            f"FROM {files_sql})"
        )
    for name, expr in sorted(cons.items()):
        try:
            bad = con.execute(
                f"SELECT * FROM {files_sql} "
                f"WHERE NOT coalesce(({expr}), TRUE) "
                f"LIMIT {_CONSTRAINT_SAMPLE_ROWS}"
            ).fetchall()
        except ConstraintViolation:
            raise
        except Exception as e:
            raise ConstraintViolation(
                f"{op}: CHECK constraint {name!r} ({expr}) could not be "
                f"evaluated by the session-free validator (ANSI SQL via "
                f"DuckDB): {e}; rewrite the expression portably or drop "
                "the constraint before streaming into this table"
            ) from e
        if bad:
            raise ConstraintViolation(
                f"{op}: {len(bad)}+ row(s) violate CHECK constraint "
                f"{name!r} ({expr}); sample: {bad}"
            )


def snap_add_constraint(
    spark: SparkSession,
    path: str,
    name: str,
    expr: str,
    validate: bool = True,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """Add a named CHECK constraint (a SQL boolean expression over the
    table's columns) to a snapshot table — ``ALTER TABLE ADD
    CONSTRAINT``.

    With ``validate=True`` (default, matching Delta) the CURRENT data
    must already satisfy the expression: one pruned-free scan, loud
    failure listing sample violators.  The constraint is stored in the
    manifest and carried forward by EVERY commit path (``_commit``'s
    ``carry`` contract), each of which validates incoming rows before
    its commit — so a constrained table can never become visible in a
    violating state (``snap_restore`` upholds this too: restoring a
    constrained table re-validates the restored version's rows).
    Tables consumed by the native streaming SINK evaluate constraints
    through a session-free ANSI-SQL validator — keep expressions
    portable (plain comparisons/boolean logic) on those tables.
    Metadata-only commit; returns the new version."""
    if not name or not name.isidentifier():
        raise ValueError(
            f"constraint name {name!r} must be a bare identifier"
        )
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        cons = dict(m.get("constraints") or {})
        if name in cons and cons[name] != expr:
            raise ValueError(
                f"constraint {name!r} already exists with a different "
                f"expression ({cons[name]!r}); drop it first"
            )
        if validate:
            current = snap_read(spark, path, m["version"], fs)
            # reuse the writer-side enforcement against a synthetic
            # one-constraint manifest: same semantics, same message
            _enforce_constraints(
                {"constraints": {name: expr}}, current, "snap_add_constraint"
            )
        cons[name] = expr
        carry = dict(m)
        carry["constraints"] = cons
        try:
            return _commit(
                path, m["files"], m["stats_cols"],
                base_version=m["version"],
                schema_json=m.get("schema"),
                txns=dict(m.get("txns", {})),
                commit_info={"op": "add_constraint", "name": name,
                             "expr": expr},
                fs=fs, carry=carry, adds=[], removes=[],
            )
        except CommitConflict as e:
            last_err = e
            continue
    raise CommitConflict(
        f"snap_add_constraint: lost the commit race {COMMIT_RETRIES} "
        f"times at {path!r}"
    ) from last_err


def snap_drop_constraint(
    path: str,
    name: str,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """Drop a named CHECK constraint (metadata-only commit)."""
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        cons = dict(m.get("constraints") or {})
        if name not in cons:
            raise KeyError(
                f"no constraint {name!r} on {path!r}; "
                f"have {sorted(cons)}"
            )
        del cons[name]
        carry = dict(m)
        carry["constraints"] = cons
        try:
            return _commit(
                path, m["files"], m["stats_cols"],
                base_version=m["version"],
                schema_json=m.get("schema"),
                txns=dict(m.get("txns", {})),
                commit_info={"op": "drop_constraint", "name": name},
                fs=fs, carry=carry, adds=[], removes=[],
            )
        except CommitConflict as e:
            last_err = e
            continue
    raise CommitConflict(
        f"snap_drop_constraint: lost the commit race {COMMIT_RETRIES} "
        f"times at {path!r}"
    ) from last_err


def update_where(
    spark: SparkSession,
    path: str,
    predicates,
    set_exprs: dict[str, str],
    txn_app: str | None = None,
    txn_batch: int | None = None,
    fs: LocalSnapshotFS | None = None,
    isolation: str = "write_serializable",
) -> dict:
    """``UPDATE table SET col = expr, ... WHERE <predicates>`` with
    file-level copy-on-write.

    ``predicates`` is the ``snap_scan`` grammar (conjunction list or
    DNF OR-tree); ``set_exprs`` maps column name -> SQL expression
    (evaluated against the PRE-update row, standard UPDATE semantics —
    ``{"a": "b", "b": "a"}`` swaps).  Only files whose manifest
    statistics (or blooms) can match the predicate are read and
    rewritten; everything else is carried by reference — the same
    pruning that bounds ``delete_where_mor``.  Rewrites fold deletion
    vectors and keep the file key-sorted on the table's stats columns
    (tight row-group envelopes for future pruning).  UPDATE never
    changes the schema: every assigned expression is cast-checked
    against the column's declared type and rejected on mismatch.
    Post-update rows are validated against the table's CHECK
    constraints.  Commit retries, txn idempotence, and empty-match
    no-ops follow the merge path.  Returns ``{"version", "updated",
    "rewritten", "carried", "added"}``.  ``isolation`` as in
    ``delete_where_mor``."""
    cond = _predicates_to_column(predicates)  # _parse_dnf validates
    _check_isolation(isolation)
    if not set_exprs:
        raise ValueError("update_where: empty set_exprs")
    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        if _txn_already_applied(m, txn_app, txn_batch):
            return _skipped_result(m)
        schema = _manifest_schema(m)
        if schema is not None:
            known = {f.name for f in schema.fields}
            missing = sorted(set(set_exprs) - known)
            if missing:
                raise ValueError(
                    f"update_where: SET columns {missing} not in table "
                    f"schema {sorted(known)}"
                )
        candidates, carried = prune_manifest(
            m, predicates, _bloom_loader(path, fs)
        )
        if not candidates:
            res = _skipped_result(m)
            res["updated"] = 0
            return res
        track = bool(m.get("row_tracking"))
        if track:
            # an UPDATE preserves every row's identity: carry _row_id
            # through the rewrite and materialize it (phase-2 of row
            # tracking — same mechanism as OPTIMIZE preservation)
            old = _read_entries_with_ids(
                spark, path, candidates, schema, _cm(m)
            )
        else:
            old = _read_entries(
                spark, path, candidates, schema, _cm(m)
            )
        if schema is not None:
            # UPDATE never evolves the schema: each assignment must
            # already be the column's declared type (loud reject beats
            # a silent lossy cast)
            probe = old.limit(0)
            by_name = {f.name: f.dataType for f in schema.fields}
            for col, expr in sorted(set_exprs.items()):
                got = probe.select(
                    F.expr(expr).alias(col)
                ).schema.fields[0].dataType
                if got != by_name[col]:
                    raise ValueError(
                        f"update_where: SET {col} = {expr!r} has type "
                        f"{got.simpleString()}, column is "
                        f"{by_name[col].simpleString()}; cast explicitly"
                    )
        iset = sorted(set(set_exprs) & set(m.get("identity") or {}))
        if iset:
            raise ValueError(
                f"update_where: column(s) {iset} are GENERATED ALWAYS "
                "AS IDENTITY — their values are immutable surrogate "
                "keys"
            )
        gens = m.get("generated") or {}
        gset = sorted(set(set_exprs) & set(gens))
        if gset:
            raise ValueError(
                f"update_where: column(s) {gset} are GENERATED ALWAYS "
                "AS — their value is recomputed automatically; SET the "
                "referenced columns instead"
            )
        # pre-update images feed every RHS (simultaneous-assignment
        # semantics), then the predicate picks which rows change
        assigned = {
            col: F.when(cond, F.expr(expr)).otherwise(F.col(col))
            for col, expr in set_exprs.items()
        }
        if gens:
            # GENERATED ALWAYS AS: recompute from the POST-update row
            # images, but only for rows the predicate CHANGES —
            # untouched rows keep their stored value (pre-declaration
            # history legally reads NULL and must not be "repaired" by
            # an unrelated update).  The change marker is computed on
            # the PRE-update images: re-evaluating the predicate after
            # assignment would mis-select when the update rewrites its
            # own predicate columns.
            by_name2 = {f.name: f.dataType for f in schema.fields} if schema else {}
            marked = old.withColumn(
                "_sg_chg", F.coalesce(cond, F.lit(False))
            )
            assigned_m = {
                col: F.when(F.col("_sg_chg"), F.expr(expr)).otherwise(
                    F.col(col)
                )
                for col, expr in set_exprs.items()
            }
            regen = {
                g: F.when(
                    F.col("_sg_chg"),
                    F.expr(e).cast(by_name2[g]) if g in by_name2
                    else F.expr(e),
                ).otherwise(F.col(g))
                for g, e in gens.items()
            }
            out = (
                marked.withColumns(assigned_m)
                .withColumns(regen)
                .drop("_sg_chg")
            )
        else:
            out = old.withColumns(assigned)
        # one bounded action over ONLY the candidate files for the
        # updated-row count (and it doubles as the constraint scan
        # input); the unchanged-row bulk is never counted row-by-row
        changed = old.filter(cond)
        post_changed = changed.withColumns(assigned)
        if gens:
            post_changed = post_changed.withColumns(
                {
                    g: F.expr(e).cast(by_name2[g]) if g in by_name2
                    else F.expr(e)
                    for g, e in gens.items()
                }
            )
        _enforce_constraints(m, post_changed, "update_where")
        n_updated = changed.count()
        if n_updated == 0:
            # conservative pruning kept files the rows dodge: nothing
            # to write, don't grow the version chain
            res = _skipped_result(m)
            res["updated"] = 0
            return res
        sort_cols = [
            c
            for c in _logical_sort_cols(m["stats_cols"], _cm(m))
            if c in out.columns
        ]
        out = out.coalesce(max(1, len(candidates)))
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        new_entries = _write_data_files(
            spark, out, path, m["stats_cols"], fs, _cm(m),
            pspec=_pspec(m),
        )
        if track:
            for e in new_entries:
                e["row_id_col"] = True
        txns = dict(m.get("txns", {}))
        if txn_app is not None:
            txns[txn_app] = int(txn_batch)
        info = {
            "op": "update_where",
            "updated": n_updated,
            "rewritten": len(candidates),
            "carried": len(carried),
            "added": len(new_entries),
        }
        if txn_app is not None:
            info["txn"] = {"app": txn_app, "batch": int(txn_batch)}
        try:
            version = _commit(
                path, carried + new_entries, m["stats_cols"],
                base_version=m["version"],
                schema_json=m.get("schema"),
                txns=txns, commit_info=info, fs=fs, carry=m,
                adds=new_entries,
                removes=[e["name"] for e in candidates],
            )
        except CommitConflict as e:
            version = _rebase_after_conflict(
                path, m, fs,
                adds=new_entries,
                removes=[x["name"] for x in candidates],
                read_files=[x["name"] for x in candidates],
                candidate_fn=lambda mm: prune_manifest(
                    mm, predicates, _bloom_loader(path, fs)
                )[0],
                isolation=isolation,
                txn_app=txn_app, txn_batch=txn_batch,
                commit_info=info,
            )
            if version is None:
                last_err = e
                continue
        return {
            "version": version,
            "updated": n_updated,
            "rewritten": len(candidates),
            "carried": len(carried),
            "added": len(new_entries),
        }
    raise CommitConflict(
        f"update_where: lost the commit race {COMMIT_RETRIES} times "
        f"at {path!r}"
    ) from last_err


def snap_restore(
    path: str,
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
    spark: SparkSession | None = None,
    timestamp=None,
    ref: str | None = None,
) -> int:
    """``RESTORE TABLE ... TO VERSION AS OF n`` (or ``TO TIMESTAMP AS
    OF t`` — pass ``timestamp``, exclusive with ``version``, resolved
    on the skew-adjusted commit timeline like every other time-travel
    read) — roll the table back (or forward) to an earlier version's
    exact file set as a NEW commit.

    Metadata-only on unconstrained tables: no data file is read or
    written; the new manifest simply references version ``n``'s files
    (and their deletion-vector sidecars), so history is preserved —
    the bad commits stay inspectable and the restore itself is one
    more auditable entry.  Fails loudly if any referenced file has
    already been removed by ``expire_snapshots`` (Delta's
    RESTORE-after-VACUUM rule); after a successful restore the files
    are live again and GC keeps them.  Idempotence markers (``txns``)
    and CHECK constraints are carried from CURRENT, not the restore
    target: a streaming writer's high-water mark must survive a
    rollback or replayed batches would double-apply.  When CURRENT
    carries constraints, the restored version's LIVE rows are
    re-validated before the commit (pass ``spark`` — required in that
    case) so a rollback cannot resurface rows a later constraint
    outlawed."""
    f = _fs(fs)
    if ref is not None:
        # the WAP failure arm: roll back to a pinned last-known-good
        # TAG (``snap_create_tag``).  Branch refs are refused — a
        # branch is a separate lineage; fold it in via publish.
        from .refs import resolve_ref

        if version is not None or timestamp is not None:
            raise ValueError(
                "snap_restore: pass ref OR version/timestamp, not both"
            )
        kind, val = resolve_ref(path, ref, fs)
        if kind != "tag":
            raise ValueError(
                f"snap_restore: ref {ref!r} is a branch — restore "
                "targets a committed version of THIS lineage; use "
                "snap_publish_branch to adopt branch state"
            )
        version = int(val)
    if timestamp is not None:
        if version is not None:
            raise ValueError(
                "snap_restore: pass version OR timestamp, not both"
            )
        version = version_at_timestamp(path, timestamp, fs)
    if version is None:
        raise ValueError("snap_restore: pass version or timestamp")
    try:
        target = read_manifest(path, version, fs)
    except FileNotFoundError as e:
        raise FileNotFoundError(
            f"snap_restore: version {version} of {path!r} has been "
            "garbage-collected (its manifest is gone — expire_snapshots "
            "kept fewer versions than that); restore past GC is "
            "impossible by design"
        ) from e
    missing = []
    for e in target["files"]:
        if not f.exists(_entry_path(path, e)):
            missing.append(e["name"])
        dv = e.get("dv")
        if dv and not f.exists(_dv_path(path, e)):
            missing.append(dv["file"])
    if missing:
        raise FileNotFoundError(
            f"snap_restore: version {version} references "
            f"{len(missing)} file(s) already garbage-collected "
            f"({sorted(missing)[:5]}...); restore past GC is impossible "
            "by design — expire_snapshots removed them"
        )
    last_err: Exception | None = None
    validated_for: dict | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        if m["version"] == version:
            return version  # restoring to where we already are: no-op
        cons = m.get("constraints") or {}
        if cons and cons != validated_for:
            # the rollback must not resurface rows a later constraint
            # outlawed: validate the target version's LIVE rows
            # (snap_read applies its deletion vectors) against the
            # constraints the restored table will carry
            if spark is None:
                raise ValueError(
                    f"snap_restore: {path!r} carries CHECK constraints "
                    f"{sorted(cons)}; restoring a constrained table "
                    "re-validates the restored rows — pass spark="
                )
            # generated-column checks are deliberately EXCLUDED here:
            # pre-declaration history legally reads NULL for a
            # generated column (declarations never backfill), and a
            # version below the add-column commit has no such column
            # at all — only user CHECK constraints gate the rollback
            _enforce_constraints(
                {**m, "generated": {}},
                snap_read(spark, path, version, fs),
                "snap_restore",
            )
            validated_for = cons
        # data-defining metadata (the column mapping) travels with the
        # restored FILE SET; operational metadata (txns, constraints)
        # stays CURRENT's — a restored version must read under its own
        # names, not whatever renames landed after it
        carry = dict(m)
        carry["column_mapping"] = target.get("column_mapping")
        restored_files = target["files"]
        if m.get("row_tracking"):
            # restored entries keep their HISTORICAL row-id bases (ids
            # are stable across a rollback; the watermark carried from
            # CURRENT is monotone, so no future assignment collides).
            # Copies, not the originals: _commit assigns bases to
            # entries from a PRE-tracking target version, and that
            # bookkeeping must never touch dicts the reconstruction
            # cache shares.
            restored_files = [dict(e) for e in target["files"]]
        try:
            return _commit(
                path, restored_files, target["stats_cols"],
                base_version=m["version"],
                schema_json=target.get("schema"),
                txns=dict(m.get("txns", {})),
                commit_info={"op": "restore",
                             "restored_version": int(version)},
                fs=fs, carry=carry,
                keep_row_ids=True,
            )
        except CommitConflict as e:
            last_err = e
            continue
    raise CommitConflict(
        f"snap_restore: lost the commit race {COMMIT_RETRIES} times "
        f"at {path!r}"
    ) from last_err


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    matched: list[tuple] | None = None,
    not_matched: list[tuple] | None = None,
    not_matched_by_source: list[tuple] | None = None,
    txn_app: str | None = None,
    txn_batch: int | None = None,
    fs: LocalSnapshotFS | None = None,
    isolation: str = "write_serializable",
) -> dict:
    """Full conditional ``MERGE INTO`` (the Delta/SQL:2003 grammar) with
    file-level copy-on-write.

    - ``matched``: ordered WHEN MATCHED clauses, each
      ``("update", condition, set_exprs)`` or ``("delete", condition)``
      — ``condition`` is a SQL boolean over ``t.*`` (target row) and
      ``s.*`` (source row), or ``None`` for always; ``set_exprs`` maps
      target column -> SQL expr over ``t.*``/``s.*``.  The FIRST clause
      whose condition holds wins (SQL MERGE semantics); a matched row
      hitting no clause stays unchanged.
    - ``not_matched``: ordered WHEN NOT MATCHED clauses
      ``("insert", condition, values)`` — ``values`` maps target
      column -> SQL expr over ``s.*`` (``None`` = insert the source
      row's same-named columns).  A source row hitting no clause is
      ignored.
    - ``not_matched_by_source``: ordered WHEN NOT MATCHED BY SOURCE
      clauses ``("update", condition, set_exprs)`` or
      ``("delete", condition)`` applying to TARGET rows with no source
      match — conditions and SET exprs may reference ``t.*`` only (no
      source row exists).  First-holds wins; a row hitting no clause
      carries unchanged.  This is the mirror-sync grammar: one commit
      can insert+update+delete a target into agreement with a source.

    Scale shape is ``merge_upsert_cow``'s: the source's key set probes
    per-file envelopes/row-group ranges/blooms, ONLY files that may
    hold a matching key are read and rewritten (every possible match
    lives in a candidate file — pruning is conservative on key
    statistics), everything else carries by reference.  **Scale
    asymmetry, stated honestly:** by-source clauses must scan EVERY
    target file — a row's ABSENCE from the source cannot be proven by
    any per-file key statistic — so pruning is disabled exactly when
    the clause family is present (a full-table sync costs a full
    table rewrite everywhere, including Delta) and unchanged when it
    is absent.  A source with
    duplicate keys is rejected (MERGE's multiple-matches rule); rows
    produced by update/insert clauses are cast-checked against the
    declared column types and validated against CHECK constraints.
    One tagged pass computes the update/delete/insert counts.  Returns
    ``{"version", "updated", "deleted", "inserted", "rewritten",
    "carried", "added"}``."""
    matched = list(matched or [])
    not_matched = list(not_matched or [])
    by_source = list(not_matched_by_source or [])
    if not matched and not not_matched and not by_source:
        raise ValueError("merge_into: no WHEN clauses")

    def _check_ud_clauses(clauses: list[tuple], family: str) -> None:
        for c in clauses:
            if c[0] == "update":
                if len(c) != 3 or not isinstance(c[2], dict) or not c[2]:
                    raise ValueError(
                        f"{family} update clause must be ('update', cond, "
                        f"set_exprs): {c!r}"
                    )
            elif c[0] == "delete":
                if len(c) != 2:
                    raise ValueError(
                        f"{family} delete clause must be "
                        f"('delete', cond): {c!r}"
                    )
            else:
                raise ValueError(f"unknown {family} clause {c[0]!r}")

    _check_ud_clauses(matched, "matched")
    _check_ud_clauses(by_source, "not_matched_by_source")
    for c in not_matched:
        if c[0] != "insert" or len(c) != 3 or not (
            c[2] is None or isinstance(c[2], dict)
        ):
            raise ValueError(
                f"not_matched clause must be ('insert', cond, "
                f"values|None): {c!r}"
            )

    probe, bad = _batch_key_audit(source.select(*keys), keys)
    if bad:
        row, had_null = bad
        if had_null:
            raise ValueError(
                f"merge_into: NULL merge key in source row "
                f"{tuple(row[k] for k in keys)!r}; coalesce keys upstream"
            )
        raise ValueError(
            f"merge_into: source has multiple rows for key "
            f"{tuple(row[k] for k in keys)!r} (MERGE's multiple-matches "
            "rule); collapse the source first"
        )
    _check_isolation(isolation)
    if probe.get("empty") and not by_source:
        # an empty source with by-source clauses is NOT a no-op: every
        # target row is not-matched-by-source (a full purge/sync)
        res = _skipped_result(read_manifest(path, fs=fs))
        res.update({
            "updated": 0, "deleted": 0, "inserted": 0,
            "updated_by_source": 0, "deleted_by_source": 0,
        })
        return res

    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        m = read_manifest(path, fs=fs)
        if _txn_already_applied(m, txn_app, txn_batch):
            res = _skipped_result(m)
            res.update({
                "updated": 0, "deleted": 0, "inserted": 0,
                "updated_by_source": 0, "deleted_by_source": 0,
            })
            return res
        stats_cols = m["stats_cols"]
        cm = _cm(m)
        _reject_identity(m, "merge_into")
        missing = [k for k in keys if _phys(cm, k) not in stats_cols]
        if missing:
            raise ValueError(
                f"merge keys {missing} not tracked in manifest stats_cols "
                f"{stats_cols}; re-init the table tracking them"
            )
        schema = _manifest_schema(m) or snap_read(
            spark, path, m["version"], fs
        ).schema
        tcols = [f.name for f in schema.fields]
        by_name = {f.name: f.dataType for f in schema.fields}
        for c in matched + by_source:
            if c[0] == "update":
                unknown = sorted(set(c[2]) - set(tcols))
                if unknown:
                    raise ValueError(
                        f"merge_into: update SET columns {unknown} not in "
                        f"table schema {tcols}"
                    )
        for c in not_matched:
            if c[2] is not None:
                missing_cols = sorted(set(tcols) - set(c[2]))
                if missing_cols:
                    raise ValueError(
                        f"merge_into: insert values missing target "
                        f"columns {missing_cols}"
                    )
                extras = sorted(set(c[2]) - set(tcols))
                if extras:
                    raise ValueError(
                        f"merge_into: insert values reference unknown "
                        f"columns {extras} (table schema {tcols})"
                    )

        bl = _bloom_loader(path, fs)
        overlapping, carried = [], []
        if by_source:
            # absence from the source is unprovable per-file: every
            # target file is a candidate (see the docstring's scale
            # asymmetry note); pruning stays fully active otherwise
            overlapping = list(m["files"])
        else:
            for f_entry in m["files"]:
                (overlapping if _overlaps(f_entry, probe, keys, bl, cm)
                 else carried).append(f_entry)

        track = bool(m.get("row_tracking"))
        if overlapping:
            # row-tracking phase 2: matched updates / by-source
            # updates / carried rows all keep their ids (threaded as a
            # t.* column through the clause engine and materialized);
            # inserts ride with a NULL id and split into fresh files
            if track:
                t = _read_entries_with_ids(
                    spark, path, overlapping, schema, cm
                )
            else:
                t = _read_entries(spark, path, overlapping, schema, cm)
        else:
            # no file can hold a matching key (e.g. an insert-only
            # merge of a brand-new key range): an empty target side —
            # every source row is NOT MATCHED
            t = spark.createDataFrame([], schema)
            if track:
                t = t.withColumn(
                    ROW_ID_COL, F.lit(None).cast("long")
                )
        t = t.alias("t")
        s = source.alias("s")
        join_cond = F.lit(True)
        for k in keys:
            join_cond = join_cond & (F.col(f"t.{k}") == F.col(f"s.{k}"))

        def _cond_col(cond: str | None):
            return F.lit(True) if cond is None else F.expr(cond)

        # first clause whose condition holds wins, per population
        clause_idx = F.lit(-1)
        for i, c in reversed(list(enumerate(matched))):
            clause_idx = F.when(_cond_col(c[1]), F.lit(i)).otherwise(
                clause_idx
            )
        ins_idx = F.lit(-1)
        for i, c in reversed(list(enumerate(not_matched))):
            ins_idx = F.when(_cond_col(c[1]), F.lit(i)).otherwise(ins_idx)
        bysrc_idx = F.lit(-1)
        for i, c in reversed(list(enumerate(by_source))):
            bysrc_idx = F.when(_cond_col(c[1]), F.lit(i)).otherwise(
                bysrc_idx
            )
        delete_idxs = [
            i for i, c in enumerate(matched) if c[0] == "delete"
        ]
        update_idxs = [
            i for i, c in enumerate(matched) if c[0] == "update"
        ]
        bysrc_delete_idxs = [
            i for i, c in enumerate(by_source) if c[0] == "delete"
        ]
        bysrc_update_idxs = [
            i for i, c in enumerate(by_source) if c[0] == "update"
        ]
        src_cols = set(source.columns)

        def _matched_col(col: str):
            expr = F.col(f"t.{col}")
            for i, c in enumerate(matched):
                if c[0] == "update" and col in c[2]:
                    expr = F.when(
                        F.col("_clause") == i, F.expr(c[2][col])
                    ).otherwise(expr)
            return expr

        def _insert_col(col: str):
            expr = F.lit(None).cast(by_name[col])
            for i, c in enumerate(not_matched):
                if c[2] is not None:
                    v = F.expr(c[2][col])
                elif col in src_cols:
                    v = F.col(f"s.{col}")
                else:
                    raise ValueError(
                        f"merge_into: default insert needs source column "
                        f"{col!r}; pass explicit insert values"
                    )
                expr = F.when(F.col("_ins") == i, v).otherwise(expr)
            return expr

        def _bysrc_col(col: str):
            # WHEN NOT MATCHED BY SOURCE update: exprs see t.* only
            expr = F.col(f"t.{col}")
            for i, c in enumerate(by_source):
                if c[0] == "update" and col in c[2]:
                    expr = F.when(
                        F.col("_bysrc") == i, F.expr(c[2][col])
                    ).otherwise(expr)
            return expr

        matched_action = (
            F.when(
                F.col("_clause").isin(delete_idxs or [-2]),
                F.lit("delete"),
            )
            .when(
                F.col("_clause").isin(update_idxs or [-2]),
                F.lit("update"),
            )
            .otherwise(F.lit("keep"))
        )
        bysrc_action = (
            F.when(
                F.col("_bysrc").isin(bysrc_delete_idxs or [-2]),
                F.lit("delete_bysrc"),
            )
            .when(
                F.col("_bysrc").isin(bysrc_update_idxs or [-2]),
                F.lit("update_bysrc"),
            )
            .otherwise(F.lit("carry"))
        )

        if probe["key_rows"] is not None:
            # BOUNDED source (≤ KEY_PROBE_CAP distinct keys): three
            # BROADCAST joins, zero shuffle of the candidate files —
            # with a small source the pruned candidates are small too,
            # so 3 cheap scans beat one scan plus a full shuffle (full
            # outer join cannot broadcast).
            sb = F.broadcast(s)
            id_keep = (
                [F.col(f"t.{ROW_ID_COL}").alias(ROW_ID_COL)]
                if track
                else []
            )
            id_null = (
                [F.lit(None).cast("long").alias(ROW_ID_COL)]
                if track
                else []
            )
            matched_tagged = (
                t.join(sb, join_cond, "inner")
                .withColumn("_clause", clause_idx)
                .select(
                    *[_matched_col(c).alias(c) for c in tcols],
                    *id_keep,
                    matched_action.alias("_action"),
                )
            )
            untouched = (
                t.join(sb, join_cond, "left_anti")
                .withColumn("_bysrc", bysrc_idx)
                .select(
                    *[_bysrc_col(c).alias(c) for c in tcols],
                    *id_keep,
                    bysrc_action.alias("_action"),
                )
            )
            inserts = (
                s.join(t, join_cond, "left_anti")
                .withColumn("_ins", ins_idx)
                .filter(F.col("_ins") >= 0)
                .select(
                    *[_insert_col(c).alias(c) for c in tcols],
                    *id_null,
                )
                .withColumn("_action", F.lit("insert"))
            )
            tagged = matched_tagged.unionByName(untouched).unionByName(
                inserts
            )
        else:
            # OVERSIZED source: ONE scan of the candidates + ONE
            # full-outer sort-merge join carries all three MERGE
            # populations (the Delta plan shape) — at corpus-sized
            # sources the candidates are the whole table, and one
            # shuffle beats three table scans.  Presence flags ride
            # non-null key columns (NULL keys were rejected above).
            # literal presence markers, NOT key nullability: the
            # TARGET may legally hold NULL-keyed rows (the join just
            # never matches them) and they must carry through the
            # rewrite, not be misread as source-only and dropped
            both = (
                t.withColumn("_t_present", F.lit(True))
                .alias("t")
                .join(
                    s.withColumn("_s_present", F.lit(True)).alias("s"),
                    join_cond,
                    "full_outer",
                )
            )
            t_here = F.col("_t_present").isNotNull()
            s_here = F.col("_s_present").isNotNull()
            both = both.withColumns(
                {
                    "_clause": F.when(
                        t_here & s_here, clause_idx
                    ).otherwise(F.lit(-1)),
                    "_ins": F.when(
                        s_here & ~t_here, ins_idx
                    ).otherwise(F.lit(-1)),
                    "_bysrc": F.when(
                        t_here & ~s_here, bysrc_idx
                    ).otherwise(F.lit(-1)),
                }
            )
            out_cols = [
                F.when(t_here & s_here, _matched_col(col))
                .when(t_here, _bysrc_col(col))
                .otherwise(_insert_col(col))
                .alias(col)
                for col in tcols
            ]
            if track:
                out_cols.append(
                    F.when(t_here, F.col(f"t.{ROW_ID_COL}"))
                    .otherwise(F.lit(None).cast("long"))
                    .alias(ROW_ID_COL)
                )
            action = (
                F.when(t_here & s_here, matched_action)
                .when(t_here, bysrc_action)
                .when(F.col("_ins") >= 0, F.lit("insert"))
                .otherwise(F.lit("drop"))  # source-only, no clause
            )
            tagged = both.select(
                *out_cols, action.alias("_action")
            ).filter(F.col("_action") != "drop")
        # cast-check every produced column against the declared type
        for f_ in tagged.select(*tcols).schema.fields:
            if f_.dataType != by_name[f_.name]:
                raise ValueError(
                    f"merge_into: produced column {f_.name!r} has type "
                    f"{f_.dataType.simpleString()}, table declares "
                    f"{by_name[f_.name].simpleString()}; cast explicitly"
                )
        tagged = tagged.persist()
        try:
            counts = {
                r["_action"]: r["n"]
                for r in tagged.groupBy("_action")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            changed = tagged.filter(
                F.col("_action").isin("update", "insert", "update_bysrc")
            )
            _enforce_constraints(m, changed.drop("_action"), "merge_into")
            keep = tagged.filter(
                ~F.col("_action").isin("delete", "delete_bysrc")
            ).drop("_action")
            sort_cols = [
                k
                for k in _logical_sort_cols(stats_cols, cm)
                if k in tcols
            ]
            if track:
                # id-preserving split: surviving/updated rows carry
                # their ids into marked files; inserted rows (NULL id)
                # go to fresh files for watermark assignment
                out = (
                    keep.filter(F.col(ROW_ID_COL).isNotNull())
                    .coalesce(max(1, len(overlapping)))
                    .sortWithinPartitions(*sort_cols)
                )
                new_entries = _write_data_files(
                    spark, out, path, stats_cols, fs, cm,
                    pspec=_pspec(m),
                )
                for e in new_entries:
                    e["row_id_col"] = True
                ins = (
                    keep.filter(F.col(ROW_ID_COL).isNull())
                    .drop(ROW_ID_COL)
                    .coalesce(1)
                    .sortWithinPartitions(*sort_cols)
                )
                new_entries = new_entries + _write_data_files(
                    spark, ins, path, stats_cols, fs, cm,
                    pspec=_pspec(m),
                )
            else:
                out = (
                    keep.coalesce(max(1, len(overlapping)))
                    .sortWithinPartitions(*sort_cols)
                )
                new_entries = _write_data_files(
                    spark, out, path, stats_cols, fs, cm,
                    pspec=_pspec(m),
                )
        finally:
            tagged.unpersist()
        txns = dict(m.get("txns", {}))
        if txn_app is not None:
            txns[txn_app] = int(txn_batch)
        info = {
            "op": "merge_into",
            "updated": counts.get("update", 0),
            "deleted": counts.get("delete", 0),
            "inserted": counts.get("insert", 0),
            "updated_by_source": counts.get("update_bysrc", 0),
            "deleted_by_source": counts.get("delete_bysrc", 0),
            "rewritten": len(overlapping),
            "carried": len(carried),
            "added": len(new_entries),
        }
        if txn_app is not None:
            info["txn"] = {"app": txn_app, "batch": int(txn_batch)}
        try:
            version = _commit(
                path, carried + new_entries, stats_cols,
                base_version=m["version"],
                schema_json=m.get("schema"),
                txns=txns, commit_info=info, fs=fs, carry=m,
                adds=new_entries,
                removes=[e["name"] for e in overlapping],
            )
        except CommitConflict as e:
            version = _rebase_after_conflict(
                path, m, fs,
                adds=new_entries,
                removes=[x["name"] for x in overlapping],
                read_files=[x["name"] for x in overlapping],
                # BY SOURCE clauses read the WHOLE table (absence
                # matters), so every winner-added file is a real read
                # conflict; otherwise the source-key probe decides
                candidate_fn=(
                    (lambda mm: list(mm["files"])) if by_source
                    else lambda mm: [
                        x for x in mm["files"]
                        if _overlaps(x, probe, keys, bl, _cm(mm))
                    ]
                ),
                isolation=isolation,
                txn_app=txn_app, txn_batch=txn_batch,
                commit_info=info,
            )
            if version is None:
                last_err = e
                continue
        info["version"] = version
        return {k: v for k, v in info.items() if k != "op" and k != "txn"}
    raise CommitConflict(
        f"merge_into: lost the commit race {COMMIT_RETRIES} times "
        f"at {path!r}"
    ) from last_err
