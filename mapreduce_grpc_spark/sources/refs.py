"""Named refs over snapshot tables: TAGS, BRANCHES, and zero-copy
PUBLISH — the Iceberg ref model (tags/branches) plus the
write-audit-publish (WAP) pattern, built on machinery the table layer
already has.

Why this exists at 100 TB: a pipeline that ingests straight into the
table its consumers read has no audit gate — a bad batch is visible
the instant it commits.  The WAP shape fixes that with ZERO data
movement: write to a **branch** (an isolated, fully mutable lineage
that shares the table's bytes), run audits against the branch, then
**publish** — one manifest commit on main that adopts the branch's
files by reference.  A 10 TB branch publish moves no data; a failed
audit costs main nothing.

Design (each piece reuses an existing invariant):

- A **tag** is an immutable named pointer to a committed version —
  one create-exclusive JSON under ``_refs/`` (the commit-claim
  primitive, so two racing creators of the same name cannot both
  win).  GC integration: ``expire_snapshots`` pins tagged versions
  outside ``keep_last`` and writes each its own retention checkpoint,
  so a tag keeps its version readable indefinitely (the Iceberg
  tag-retention contract).

- A **branch** is a SHALLOW CLONE living inside the table at
  ``_branches/<name>`` — so every existing mutator (append, CoW
  merge, MoR delete, OPTIMIZE, DDL) works on a branch unchanged, via
  ``snap_branch_path``.  Clone markers under the parent's
  ``_clones/`` make the parent's GC protect every file the branch
  still references (nothing new to build); the branch runs its own
  ``expire_snapshots`` for its private files.

- **Publish** (``snap_publish_branch``) folds the branch's state back
  into main as ONE optimistic-concurrency commit:

  * **fast-forward** — main hasn't moved past the fork point: main
    adopts the branch head verbatim.  Branch-born files are carried
    by reference (entry ``base`` = the branch dir, the shallow-clone
    mechanism in reverse), files main already owned are restored from
    the fork manifest so their row IDs and DV state stay main's, and
    branch DDL (schema evolution, new constraints) publishes with the
    data.  CDF sees the branch's NET change as one commit — squash
    semantics, exactly Iceberg's fast-forward.
  * **rebase** — main moved, but the branch only APPENDED files and
    the two heads agree on table metadata: the branch's new files are
    appended onto main's current state.  The diff runs against MAIN'S
    HEAD, so publish is idempotent and incremental — a branch staged
    further after an earlier publish re-lands only its delta, and an
    unchanged re-publish is a version-free no-op.  Row-TRACKED tables
    rebase by re-drawing the branch-born ``row_id_base`` slices under
    main's current watermark (ids are metadata — zero data movement;
    only branch files that MATERIALIZED ids physically refuse).
    IDENTITY tables rebase iff main's allocator advances since the
    fork are all attributable to this branch's own earlier publishes
    (physical surrogate keys cannot be re-mapped, so a foreign
    allocation overlapping the branch's range refuses).  Refused when
    the branch rewrote or removed shared files main still serves
    (the user must re-branch and replay).

  Publish optionally runs the AUDIT step itself:
  ``snap_publish_branch(..., audits={name: sql_bool_expr})``
  evaluates each expectation per row against the branch head —
  DV-aware and session-free (the streaming sink's ANSI evaluator
  shape) — and a failure raises ``PublishAuditFailed`` with the
  violating rows, main untouched.  The gate is part of the protocol,
  not caller convention.

  Before committing, publish registers main as a clone of the BRANCH
  (a ``_clones`` marker inside the branch dir), so the branch's own
  GC — and ``snap_drop_branch`` — can never reclaim bytes main now
  reads.  Dropped-branch remnants whose files main still references
  are swept incrementally by main's ``expire_snapshots`` as its
  retention lets go of them.

The reference has no refs/branching story at all — its tables are
write-once text buckets (/root/reference/src/worker.cc); this module
is north-star table-layer surface, shaped after the PUBLIC Iceberg
ref spec and Delta's CLONE semantics, implemented on this engine's
own commit protocol.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from .snapshots import (
    _BRANCHES_DIR,
    _CLONES_DIR,
    _REFS_DIR,
    COMMIT_RETRIES,
    CommitConflict,
    LocalSnapshotFS,
    _clone_protected,
    _commit,
    _current_path,
    _fs,
    _manifest_path,
    _tagged_versions,
    current_version,
    read_manifest,
    snap_clone,
    version_at_timestamp,
)

_REF_NAME = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")

# table metadata that publish treats as "DDL state": fast-forward
# carries the branch's, rebase requires NEITHER side changed it
_META_KEYS = (
    "schema",
    "constraints",
    "column_mapping",
    "partition_spec",
    "partition_field_seq",
    "defaults",
    "generated",
    "clustering",
    "identity",
    "row_tracking",
)

# manifest keys _commit carries forward (its carry loop) — publish
# hands it the branch head's values, with clone_of restored to main's
_CARRY_KEYS = (
    "constraints",
    "column_mapping",
    "partition_spec",
    "partition_field_seq",
    "defaults",
    "row_tracking",
    "clustering",
    "generated",
    "identity",
    "features",
    "writer_features",
    "next_row_id",
)


class PublishConflict(RuntimeError):
    """Publish could not fold the branch into main — main diverged in
    a way fast-forward/rebase cannot reconcile.  Re-branch from
    CURRENT and replay the change."""


class PublishAuditFailed(RuntimeError):
    """A declarative WAP audit failed against the branch head — main
    is untouched.  ``violations`` maps each failing audit name to its
    sample of violating rows (tuples in the branch head's column
    order)."""

    def __init__(self, msg: str, violations: dict[str, list]):
        super().__init__(msg)
        self.violations = violations


def _audit_branch_head(bdir: str, bm: dict, audits, agg_audits) -> None:
    """Run declarative expectations against the branch HEAD before
    publish — the audit step of write-audit-publish as part of the
    PROTOCOL instead of caller convention.

    ``audits`` is a mapping ``name -> SQL boolean expression`` (or an
    iterable of expressions, auto-named ``audit_1..n``) with CHECK
    semantics per row: a row fails only when the expression evaluates
    to FALSE (NULL passes — audit ``col IS NOT NULL`` to reject
    nulls).  ``agg_audits`` are whole-relation expectations — each
    expression must AGGREGATE to one boolean (``count(*) >= 1000``,
    ``count(DISTINCT k) = count(*)``, ``avg(score) > 0.5`` — the
    Iceberg-WAP audit shape); an aggregate audit fails when its value
    is FALSE or NULL.  Evaluation reuses the streaming sink's
    session-free ANSI-SQL evaluator shape (DuckDB over the head's
    parquet files, no SparkSession), extended to be DV-AWARE: rows
    masked by the branch's deletion vectors are excluded before
    evaluation, so the canonical gate flow — stage, MoR-delete the
    bad rows, re-audit, publish — sees exactly what a reader of the
    branch sees.  Column mapping re-surfaces physical names under
    their logical ones.  Raises ``PublishAuditFailed`` with per-audit
    violation samples (row audits) / evaluated values (aggregate
    audits); an inscrutable expression fails LOUDLY rather than
    skipping."""
    from .snapshots import _cm, _dv_path, _entry_path

    if isinstance(audits, dict):
        named = dict(audits)
    else:
        named = {
            f"audit_{i + 1}": a for i, a in enumerate(audits or ())
        }
    agg_named = dict(agg_audits or {})
    if not named and not agg_named:
        return
    entries = bm["files"]
    if not entries:
        if agg_named:
            raise PublishAuditFailed(
                "write-audit-publish gate failed — the branch head "
                "has no data files, so aggregate expectations "
                f"{sorted(agg_named)} cannot hold; main untouched",
                {k: [] for k in agg_named},
            )
        return
    import duckdb

    def _lit(paths):
        return ", ".join(
            "'" + p.replace("'", "''") + "'" for p in paths
        )

    data = [_entry_path(bdir, e) for e in entries]
    dved = [e for e in entries if e.get("dv")]
    if dved:
        sidecars = sorted({_dv_path(bdir, e) for e in dved})
        masked = _lit(e["name"] for e in dved)
        rel = (
            "(SELECT * EXCLUDE (filename, file_row_number) FROM "
            f"read_parquet([{_lit(data)}], filename=true, "
            "file_row_number=true) d ANTI JOIN "
            f"(SELECT file_name, pos FROM read_parquet([{_lit(sidecars)}]) "
            f"WHERE file_name IN ({masked})) v "
            "ON parse_filename(d.filename) = v.file_name "
            "AND d.file_row_number = v.pos)"
        )
    else:
        rel = f"read_parquet([{_lit(data)}])"
    cm = _cm(bm)
    renames = [(p, l) for l, p in sorted(cm.items()) if p != l]
    if renames:
        aliased = ", ".join(f'"{p}" AS "{l}"' for p, l in renames)
        excluded = ", ".join(f'"{p}"' for p, _ in renames)
        rel = f"(SELECT {aliased}, * EXCLUDE ({excluded}) FROM {rel})"
    con = duckdb.connect()
    violations: dict[str, list] = {}
    for aname, expr in sorted(named.items()):
        try:
            bad = con.execute(
                f"SELECT * FROM {rel} "
                f"WHERE NOT coalesce(({expr}), TRUE) LIMIT 20"
            ).fetchall()
        except Exception as e:
            raise PublishAuditFailed(
                f"audit {aname!r} ({expr}) could not be evaluated by "
                f"the session-free validator (ANSI SQL via DuckDB): "
                f"{e}; rewrite the expression portably",
                {aname: []},
            ) from e
        if bad:
            violations[aname] = bad
    for aname, expr in sorted(agg_named.items()):
        try:
            rows = con.execute(
                f"SELECT ({expr}) FROM {rel} LIMIT 2"
            ).fetchall()
        except Exception as e:
            raise PublishAuditFailed(
                f"aggregate audit {aname!r} ({expr}) could not be "
                "evaluated by the session-free validator (ANSI SQL "
                f"via DuckDB): {e}; the expression must aggregate the "
                "relation to ONE boolean",
                {aname: []},
            ) from e
        if len(rows) != 1:
            raise PublishAuditFailed(
                f"aggregate audit {aname!r} ({expr}) returned "
                f"{len(rows)} rows — it must AGGREGATE the relation "
                "to one boolean (use audits= for per-row checks)",
                {aname: []},
            )
        val = rows[0][0]
        if val is not True:
            violations[aname] = [(val,)]
    if violations:
        raise PublishAuditFailed(
            "write-audit-publish gate failed — main untouched; "
            "failing audits: "
            + ", ".join(
                f"{k!r} ({len(v)}+ rows, sample {v[:2]!r})"
                for k, v in sorted(violations.items())
            ),
            violations,
        )


def _wait_commit_visible(
    path: str,
    failed_base: int,
    fs: LocalSnapshotFS | None,
    timeout: float = 2.0,
) -> None:
    """A lost commit claim proves manifest v(failed_base+1) exists,
    but the winner may still sit between its ``create_exclusive`` and
    the CURRENT swap.  Publish attempts are MICROSECONDS of driver
    work — unlike the data mutators, whose Spark-job-sized retries
    amortize this window naturally — so without a bounded wait a
    loser can burn every retry against the same stale pointer.  The
    protocol invariant (commits only ever build on CURRENT — CURRENT
    never regresses) stays untouched: we wait for visibility, never
    build past the pointer."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if current_version(path, fs) > failed_base:
            return
        time.sleep(0.005)


def _check_ref_name(name: str) -> str:
    if not isinstance(name, str) or not _REF_NAME.match(name):
        raise ValueError(
            f"ref name {name!r} is invalid: use 1-64 chars of "
            "[A-Za-z0-9._-], starting alphanumeric"
        )
    return name


def _tag_path(path: str, name: str) -> str:
    return os.path.join(path, _REFS_DIR, f"tag-{name}.json")


def snap_branch_path(path: str, name: str) -> str:
    """The branch's table dir — hand it to ANY existing operation
    (``snap_append``, ``merge_upsert_cow``, ``optimize_snapshot``,
    ``snap_add_column``, streams, ...) to mutate the branch."""
    return os.path.join(path, _BRANCHES_DIR, _check_ref_name(name))


def _branch_exists(f: LocalSnapshotFS, path: str, name: str) -> bool:
    return f.exists(_current_path(os.path.join(path, _BRANCHES_DIR, name)))


def snap_create_tag(
    path: str,
    name: str,
    version: int | None = None,
    timestamp=None,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """Pin ``version`` (default CURRENT; or resolve ``timestamp``)
    under an immutable name.  The tagged version survives
    ``expire_snapshots`` regardless of ``keep_last`` until the tag is
    dropped.  Returns the pinned version."""
    _check_ref_name(name)
    f = _fs(fs)
    if timestamp is not None:
        if version is not None:
            raise ValueError("snap_create_tag: pass version OR timestamp")
        version = version_at_timestamp(path, timestamp, fs)
    m = read_manifest(path, version, fs)  # validates readability
    if _branch_exists(f, path, name):
        raise ValueError(
            f"ref {name!r} already names a branch at {path!r}"
        )
    rec = json.dumps(
        {
            "name": name,
            "version": m["version"],
            "uid": m.get("uid"),
            "ts": time.time(),
        }
    )
    f.makedirs(os.path.join(path, _REFS_DIR))
    try:
        f.create_exclusive(_tag_path(path, name), rec)
    except (CommitConflict, FileExistsError):
        raise ValueError(
            f"tag {name!r} already exists at {path!r} — tags are "
            "immutable; drop it first to retarget"
        ) from None
    # TOCTOU guard: a concurrent ``expire_snapshots`` that listed
    # ``_refs/`` BEFORE this file landed may have expired the version
    # we just pinned — re-verify the pin took, else undo the tag and
    # raise instead of leaving a silently dangling ref (GC skips
    # unresolvable tags, so without this the "tag survives GC"
    # contract would fail with no error at creation time).  A GC pass
    # that starts after the verify sees the tag and protects it.
    try:
        read_manifest(path, m["version"], fs)
    except (FileNotFoundError, ValueError):
        try:
            f.remove(_tag_path(path, name))
        except FileNotFoundError:
            pass
        raise ValueError(
            f"tag {name!r}: version v{m['version']} of {path!r} was "
            "expired concurrently with tag creation — the pin did not "
            "take; retry against a retained version"
        ) from None
    return m["version"]


def snap_drop_tag(
    path: str, name: str, fs: LocalSnapshotFS | None = None
) -> None:
    _check_ref_name(name)
    f = _fs(fs)
    tp = _tag_path(path, name)
    if not f.exists(tp):
        raise ValueError(f"no tag {name!r} at {path!r}")
    f.remove(tp)


def snap_create_branch(
    path: str,
    name: str,
    version: int | None = None,
    timestamp=None,
    fs: LocalSnapshotFS | None = None,
) -> str:
    """Fork a writable branch from ``version`` (default CURRENT).
    Zero-copy: the branch is a shallow clone under
    ``_branches/<name>`` sharing the table's bytes; the parent's GC
    protects whatever the branch references (clone markers).  Returns
    the branch's table dir (``snap_branch_path``)."""
    f = _fs(fs)
    bdir = snap_branch_path(path, name)  # validates the name
    if f.exists(_tag_path(path, name)):
        raise ValueError(f"ref {name!r} already names a tag at {path!r}")
    if f.exists(_current_path(bdir)):
        raise ValueError(f"branch {name!r} already exists at {path!r}")
    snap_clone(path, bdir, version=version, timestamp=timestamp, fs=fs)
    return bdir


def resolve_ref(
    path: str, ref: str, fs: LocalSnapshotFS | None = None
) -> tuple[str, object]:
    """``("branch", branch_dir)`` or ``("tag", version)``."""
    _check_ref_name(ref)
    f = _fs(fs)
    bdir = os.path.join(path, _BRANCHES_DIR, ref)
    if f.exists(_current_path(bdir)):
        return ("branch", bdir)
    tp = _tag_path(path, ref)
    if f.exists(tp):
        return ("tag", int(json.loads(f.read_text(tp))["version"]))
    raise ValueError(f"unknown ref {ref!r} at {path!r}")


def snap_list_refs(
    path: str, fs: LocalSnapshotFS | None = None
) -> list[dict]:
    """Every named ref: tags (name, pinned version) and branches
    (name, head version, fork version), sorted by name."""
    f = _fs(fs)
    out: list[dict] = []
    for name, v in _tagged_versions(path, f).items():
        out.append({"name": name, "type": "tag", "version": v})
    broot = os.path.join(path, _BRANCHES_DIR)
    if f.exists(broot):
        for name in f.listdir(broot):
            bd = os.path.join(broot, name)
            if not f.exists(_current_path(bd)):
                continue  # dropped-branch remnant, not a ref
            try:
                bm = read_manifest(bd, None, fs)
            except (FileNotFoundError, ValueError):
                continue
            out.append(
                {
                    "name": name,
                    "type": "branch",
                    "version": bm["version"],
                    "fork_version": (bm.get("clone_of") or {}).get(
                        "version"
                    ),
                }
            )
    return sorted(out, key=lambda r: (r["name"], r["type"]))


def _strip_ids(e: dict) -> dict:
    """Entry content minus lineage-local row-id assignment — the clone
    re-numbered borrowed entries against ITS watermark, so equality
    across lineages must ignore ``row_id_base``."""
    return {k: v for k, v in e.items() if k != "row_id_base"}


def _identity_rebase_carry(
    path: str,
    name: str,
    fork: int,
    fork_m: dict,
    bm: dict,
    mcur: dict,
    fs: LocalSnapshotFS | None,
) -> dict | None:
    """Reconcile GENERATED-ALWAYS-AS-IDENTITY allocators for an
    append-only rebase publish, or refuse.

    Identity values are PHYSICAL (written into the branch's parquet
    from the allocator's slot counter, ``snap_append``), so unlike row
    ids they cannot be re-mapped at publish.  The branch consumed
    slots ``[fork_high, branch_high)``.  Main's head may be past the
    fork for two very different reasons: its advances came from THIS
    branch's own earlier publishes (safe — those are the same physical
    values, and the incremental diff already skips their files), or a
    FOREIGN writer appended (its slots start at main's then-current
    counter, which sits inside the branch's range whenever it is below
    ``branch_high`` — physical surrogate keys would collide).  Walking
    the manifests between fork and head attributes every counter
    advance to its commit (driver JSON reads, O(versions since fork) —
    the cost class publish already pays for the fork diff).

    Returns the reconciled identity dict for the publish commit's
    carry (highs = max of both sides), ``None`` when the table has no
    identity columns, and raises ``PublishConflict`` when a foreign
    allocation overlaps the branch's range or the interleaving cannot
    be proven (expired mid-manifests)."""
    bid = bm.get("identity") or {}
    mid = mcur.get("identity") or {}
    if not bid and not mid:
        return None
    if set(bid) != set(mid) or any(
        (int(bid[c]["start"]), int(bid[c]["step"]))
        != (int(mid[c]["start"]), int(mid[c]["step"]))
        for c in bid
    ):
        raise PublishConflict(
            f"identity declarations differ between branch {name!r} "
            f"and main's head after the fork — identity DDL publishes "
            "only by fast-forward; re-branch and replay"
        )
    fid = fork_m.get("identity") or {}
    prev = {c: int((fid.get(c) or {}).get("high") or 0) for c in mid}
    foreign_floor: dict[str, int] = {}
    for v in range(fork + 1, int(mcur["version"]) + 1):
        try:
            mv = read_manifest(path, v, fs)
        except (FileNotFoundError, ValueError):
            raise PublishConflict(
                f"manifest v{v} of {path!r} between the fork and head "
                "was expired — publish cannot attribute main's "
                "identity allocation since the fork; re-branch from "
                "CURRENT and replay"
            ) from None
        ci = mv.get("commit_info") or {}
        own = (
            ci.get("op") == "publish_branch" and ci.get("branch") == name
        )
        vid = mv.get("identity") or {}
        for c in mid:
            h = int((vid.get(c) or {}).get("high") or 0)
            if h > prev[c] and not own:
                foreign_floor[c] = min(
                    foreign_floor.get(c, prev[c]), prev[c]
                )
            prev[c] = max(prev[c], h)
    out = {}
    for c, spec in mid.items():
        bh = int(bid[c]["high"])
        fl = foreign_floor.get(c)
        if fl is not None and fl < bh:
            raise PublishConflict(
                f"main allocated identity values for column {c!r} "
                f"after the fork (slots from {fl}) inside the range "
                f"branch {name!r} consumed (up to {bh}) — physical "
                "surrogate keys would collide; re-branch from CURRENT "
                "and replay"
            )
        out[c] = {**spec, "high": max(bh, int(spec["high"]))}
    return out


def snap_publish_branch(
    path: str,
    name: str,
    fs: LocalSnapshotFS | None = None,
    audits: dict | list | tuple | None = None,
    agg_audits: dict | None = None,
    dry_run: bool = False,
) -> dict:
    """Fold branch ``name`` into main as one commit (the WAP publish).

    ``audits`` makes the AUDIT step declarative: a mapping
    ``name -> SQL boolean expression`` (or a plain list of
    expressions) evaluated per row against the BRANCH HEAD — DV-aware
    and session-free (``_audit_branch_head``) — before anything else
    happens.  ``agg_audits`` adds whole-relation expectations (each
    expression aggregates to one boolean: ``count(*) >= 1000``,
    ``count(DISTINCT k) = count(*)`` — the Iceberg-WAP audit shape).
    A failing audit raises ``PublishAuditFailed`` carrying the
    violating rows / evaluated values; main is untouched (no marker,
    no commit).

    ``dry_run=True`` answers "what would publish do" with ZERO side
    effects: audits run, the fast-forward/rebase/noop plan and its
    add/remove counts are computed against CURRENT, conflicts raise
    exactly as a real publish would — but no clone marker lands and
    no commit happens.  The returned dict carries ``version=None``
    and ``dry_run=True``.

    Fast-forward when main is still at the fork point; append-only
    rebase when main moved, the two heads agree on table metadata,
    and every branch change main doesn't already serve is a pure
    addition.  Row-tracked tables rebase with branch-born row-id
    slices re-drawn under main's watermark (metadata-only); identity
    tables rebase unless a foreign allocation since the fork overlaps
    the branch's physical value range (``_identity_rebase_carry``).
    The rebase diff runs
    against MAIN'S HEAD, so publish is incremental and idempotent: a
    branch staged further after an earlier publish re-lands only its
    delta, and an unchanged re-publish returns ``mode="noop"`` with
    no version bump.  Raises ``PublishConflict`` otherwise.  Zero
    data movement either way: branch-born files are adopted by
    reference.

    Returns ``{"version", "mode", "adds", "removes"}``."""
    f = _fs(fs)
    bdir = snap_branch_path(path, name)
    if not f.exists(_current_path(bdir)):
        raise ValueError(f"no branch {name!r} at {path!r}")
    bm = read_manifest(bdir, None, fs)
    clone_of = bm.get("clone_of") or {}
    main_abs = os.path.abspath(path)
    bdir_abs = os.path.abspath(bdir)
    if os.path.abspath(clone_of.get("path") or "") != main_abs:
        raise ValueError(
            f"branch {name!r} does not fork from {path!r} "
            f"(clone_of={clone_of!r})"
        )
    if audits is not None or agg_audits is not None:
        _audit_branch_head(bdir, bm, audits, agg_audits)
    fork = int(clone_of["version"])
    try:
        fork_m = read_manifest(path, fork, fs)
    except FileNotFoundError:
        raise PublishConflict(
            f"fork version v{fork} of {path!r} was expired — publish "
            "cannot prove what the branch changed; re-branch from "
            "CURRENT and replay (tag fork points or raise keep_last "
            "to prevent this)"
        ) from None
    fork_by_name = {e["name"]: e for e in fork_m["files"]}

    # normalize the branch head's entries into main's frame: files
    # main already owned come home verbatim (ids/DV state stay
    # main's unless the branch changed the file), branch-born files
    # are adopted by reference
    head_entries: list[dict] = []
    for e in bm["files"]:
        b = e.get("base")
        eabs = os.path.abspath(b) if b else bdir_abs
        ne = dict(e)
        if eabs == main_abs:
            ne.pop("base", None)
            fe = fork_by_name.get(ne["name"])
            if fe is not None and _strip_ids(ne) == _strip_ids(fe):
                ne = fe  # untouched: main's own entry, main's ids
            else:
                if fe is not None and "row_id_base" in fe and not ne.get(
                    "row_id_col"
                ):
                    # same bytes, branch-local dv/state change: row
                    # identity follows the physical file — keep main's
                    ne["row_id_base"] = fe["row_id_base"]
        elif not b:
            ne["base"] = bdir_abs
        head_entries.append(ne)
    head_names = {e["name"] for e in head_entries}
    removed_from_fork = [
        n for n in fork_by_name if n not in head_names
    ]

    carry = {k: bm[k] for k in _CARRY_KEYS if bm.get(k)}
    # main is not a clone of its own branch; restore main's own
    # provenance (it may itself be a clone of another table)
    if fork_m.get("clone_of"):
        carry["clone_of"] = fork_m["clone_of"]

    # the marker lands BEFORE the commit (the snap_clone rule): once
    # main references branch bytes, the branch's GC must already know.
    # One marker per dst: protection is by DESTINATION (``_clone_protected``
    # walks the dst's manifests and never reads ``src_version``), so a
    # repeated incremental publish reuses the marker it already wrote
    # instead of accumulating duplicates that each add a full manifest
    # walk to every GC pass.
    if not dry_run:
        cdir = os.path.join(bdir, _CLONES_DIR)
        f.makedirs(cdir)
        have_marker = False
        for mn in f.listdir(cdir):
            if not mn.endswith(".json"):
                continue
            try:
                r0 = json.loads(f.read_text(os.path.join(cdir, mn)))
            except (ValueError, FileNotFoundError):
                continue
            if os.path.abspath(r0.get("dst") or "") == main_abs:
                have_marker = True
                break
        if not have_marker:
            rec = json.dumps(
                {
                    "dst": main_abs,
                    "src_version": bm["version"],
                    "ts": time.time(),
                }
            )
            f.create_exclusive(
                os.path.join(cdir, f"clone-{uuid.uuid4().hex[:12]}.json"),
                rec,
            )

    last_err: Exception | None = None
    for _attempt in range(COMMIT_RETRIES):
        cur = current_version(path, fs)
        if cur == fork:
            # -------- fast-forward: adopt the branch head verbatim
            adds = [
                e
                for e in head_entries
                if fork_by_name.get(e["name"]) != e
            ]
            removes = removed_from_fork + [
                e["name"]
                for e in adds
                if e["name"] in fork_by_name
            ]
            if dry_run:
                return {
                    "version": None,
                    "mode": "fast_forward",
                    "adds": len(adds),
                    "removes": len(removes),
                    "dry_run": True,
                }
            txns = dict(fork_m.get("txns") or {})
            for app, batch in (bm.get("txns") or {}).items():
                txns[app] = max(
                    int(batch), int(txns.get(app, int(batch)))
                )
            try:
                v = _commit(
                    path,
                    head_entries,
                    bm["stats_cols"],
                    base_version=cur,
                    schema_json=bm.get("schema"),
                    txns=txns,
                    commit_info={
                        "op": "publish_branch",
                        "branch": name,
                        "branch_version": bm["version"],
                        "mode": "fast_forward",
                    },
                    fs=fs,
                    carry=carry,
                    adds=adds,
                    removes=removes,
                    keep_row_ids=True,
                )
            except CommitConflict as err:
                last_err = err
                _wait_commit_visible(path, cur, fs)
                continue
            return {
                "version": v,
                "mode": "fast_forward",
                "adds": len(adds),
                "removes": len(removes),
            }

        # -------- main moved: append-only rebase or conflict.
        # The rebase diffs against main's HEAD, not the fork, so a
        # branch published before (and staged further since) re-lands
        # only its delta instead of double-adding already-published
        # files; an unchanged branch re-publish is a version-free
        # no-op (idempotent publish).
        mcur = read_manifest(path, cur, fs)
        for k in _META_KEYS:
            # rebase requires IDENTICAL current DDL state: branch DDL
            # main never saw, or main DDL the branch's files were
            # never validated against, both refuse (a previously
            # PUBLISHED branch DDL matches mcur and passes).  identity
            # is reconciled separately — its allocator high-water
            # moves with every append, so raw equality would refuse
            # every staged identity batch.
            if k == "identity":
                continue
            if (bm.get(k) or None) != (mcur.get(k) or None):
                raise PublishConflict(
                    f"table metadata ({k}) differs between branch "
                    f"{name!r} and main's head after the fork — DDL "
                    "publishes only by fast-forward; re-branch and "
                    "replay"
                )
        mcur_by_name = {e["name"]: e for e in mcur["files"]}
        # branch removals main still serves are unpublished rewrites
        unpublished_rm = [
            n for n in removed_from_fork if n in mcur_by_name
        ]
        if unpublished_rm:
            raise PublishConflict(
                f"main advanced past the fork (v{fork} -> v{cur}) and "
                f"branch {name!r} removed/rewrote shared files main "
                f"still serves ({unpublished_rm[:3]!r}...) — a rebase "
                "could lose main's concurrent changes; re-branch and "
                "replay"
            )
        new_entries = []
        for e in head_entries:
            me = mcur_by_name.get(e["name"])
            fe = fork_by_name.get(e["name"])
            if me is not None:
                if _strip_ids(me) == _strip_ids(e):
                    continue  # already on main (published or shared)
                if fe is not None and _strip_ids(e) == _strip_ids(fe):
                    # branch left the file at fork state and main
                    # changed it in place since (e.g. grew a DV):
                    # main's change wins — the exact analogue of the
                    # dropped/rewrote arm below
                    continue
                raise PublishConflict(
                    f"file {e['name']!r} diverged between branch "
                    f"{name!r} and main after the fork (concurrent "
                    "rewrite on one side); re-branch and replay"
                )
            if fe is not None:
                if _strip_ids(e) != _strip_ids(fe):
                    raise PublishConflict(
                        f"branch {name!r} changed shared file "
                        f"{e['name']!r} which main dropped/rewrote "
                        "after the fork; re-branch and replay"
                    )
                # shared file main dropped/rewrote since the fork and
                # the branch left untouched: main's change wins
                continue
            new_entries.append(e)
        if not new_entries:
            out = {
                "version": cur,
                "mode": "noop",
                "adds": 0,
                "removes": 0,
            }
            if dry_run:
                out["dry_run"] = True
            return out
        if bm.get("row_tracking"):
            # row ids are METADATA (implicit ``row_id_base`` slices),
            # so branch-born appends rebase cleanly: drop the ids the
            # branch drew under the FORK watermark — they may collide
            # with main's concurrent assignment — and let ``_commit``
            # re-draw each slice under MAIN'S current watermark.  The
            # one thing that cannot be re-mapped is a file that
            # MATERIALIZED its ids as a physical column (an OPTIMIZE
            # on the branch preserving pre-assigned ids): refuse it.
            pinned = [
                e["name"] for e in new_entries if e.get("row_id_col")
            ]
            if pinned:
                raise PublishConflict(
                    f"branch {name!r} materialized row ids as a "
                    f"physical column ({pinned[:3]!r}...) under the "
                    "fork watermark — physical ids cannot be re-mapped "
                    "at publish while main moved; publish before "
                    "compacting the branch, or re-branch and replay"
                )
            for e in new_entries:
                e.pop("row_id_base", None)
        id_carry = _identity_rebase_carry(
            path, name, fork, fork_m, bm, mcur, fs
        )
        if dry_run:
            return {
                "version": None,
                "mode": "rebase",
                "adds": len(new_entries),
                "removes": 0,
                "dry_run": True,
            }
        carry_m = mcur if id_carry is None else {
            **mcur, "identity": id_carry,
        }
        files = list(mcur["files"]) + new_entries
        txns = dict(mcur.get("txns") or {})
        for app, batch in (bm.get("txns") or {}).items():
            txns[app] = max(int(batch), int(txns.get(app, int(batch))))
        try:
            v = _commit(
                path,
                files,
                mcur["stats_cols"],
                base_version=mcur["version"],
                schema_json=mcur.get("schema"),
                txns=txns,
                commit_info={
                    "op": "publish_branch",
                    "branch": name,
                    "branch_version": bm["version"],
                    "mode": "rebase",
                },
                fs=fs,
                carry=carry_m,
                adds=new_entries,
                removes=[],
            )
        except CommitConflict as err:
            last_err = err
            _wait_commit_visible(path, mcur["version"], fs)
            continue
        return {
            "version": v,
            "mode": "rebase",
            "adds": len(new_entries),
            "removes": 0,
        }
    raise CommitConflict(
        f"snap_publish_branch: lost the commit race {COMMIT_RETRIES} "
        f"times at {path!r}"
    ) from last_err


def snap_expire_refs(
    path: str,
    max_branch_age_seconds: float,
    fs: LocalSnapshotFS | None = None,
    dry_run: bool = False,
) -> list[dict]:
    """Retire STALE branches (the Iceberg ``max-ref-age`` retention
    knob): a branch whose HEAD commit is older than the threshold is
    dropped via ``snap_drop_branch`` — published bytes main adopted
    survive as protected remnants, unpublished work is discarded (the
    audit gate's failure arm, now on a schedule).  Tags are never
    aged: a pin is an explicit promise, released only by
    ``snap_drop_tag``.  Abandoned staging branches are real
    operational debt at 100 TB — every live branch keeps clone
    markers that main's GC must walk, and keeps bytes alive that main
    no longer reads.

    Age is measured from the branch head's COMMITTER timestamp (the
    same clock time travel resolves against), so an actively-staged
    branch never ages out no matter how old its fork point is.
    ``dry_run=True`` reports without dropping.  Returns one record
    per considered-stale branch: ``{"name", "age_seconds",
    "action"}`` where action is ``"dropped"``, ``"would_drop"``, or
    ``"skipped: <reason>"`` (e.g. live sub-branches)."""
    out: list[dict] = []
    now = time.time()
    for r in snap_list_refs(path, fs):
        if r["type"] != "branch":
            continue
        bd = os.path.join(path, _BRANCHES_DIR, r["name"])
        try:
            bm = read_manifest(bd, None, fs)
        except (FileNotFoundError, ValueError):
            continue
        ts = bm.get("ts")
        if ts is None:
            continue  # pre-timestamp manifest: age unknowable
        age = now - float(ts)
        if age <= max_branch_age_seconds:
            continue
        rec = {"name": r["name"], "age_seconds": age}
        if dry_run:
            rec["action"] = "would_drop"
        else:
            try:
                snap_drop_branch(path, r["name"], fs)
                rec["action"] = "dropped"
            except ValueError as e:
                rec["action"] = f"skipped: {e}"
        out.append(rec)
    return out


def snap_drop_branch(
    path: str, name: str, fs: LocalSnapshotFS | None = None
) -> list[str]:
    """Delete branch ``name``: its manifests and every private file
    no OTHER table still reads.  Files main (or a clone) adopted via
    publish are kept in place — main's ``expire_snapshots`` sweeps
    them once its own retention lets go.  Unpublished branch work is
    discarded by design (that is the audit gate's failure arm).
    Returns the deleted names."""
    f = _fs(fs)
    bdir = snap_branch_path(path, name)
    if not f.exists(_current_path(bdir)):
        raise ValueError(f"no branch {name!r} at {path!r}")
    nested = os.path.join(bdir, _BRANCHES_DIR)
    if f.exists(nested):
        live = [
            n
            for n in f.listdir(nested)
            if f.exists(_current_path(os.path.join(nested, n)))
        ]
        if live:
            raise ValueError(
                f"branch {name!r} has live sub-branches {live!r}; "
                "drop them first"
            )
    protected = _clone_protected(bdir, f, fs, retire=True)
    deleted: list[str] = []
    # manifests first: the branch stops resolving (and stops being a
    # ref) even if a later deletion fails midway
    f.rmtree(os.path.join(bdir, "_manifests"))
    deleted.append("_manifests")
    for n in f.listdir(bdir):
        full = os.path.join(bdir, n)
        if n.startswith("_stage-"):
            f.rmtree(full)
            deleted.append(n)
            continue
        if not (
            (n.startswith(("data-", "dv-")) and n.endswith(".parquet"))
            or (n.startswith("bloom-") and n.endswith(".json"))
        ):
            continue
        if n in protected:
            continue
        f.remove(full)
        deleted.append(n)
    if not protected:
        f.rmtree(bdir)
    return deleted
