"""``snapshot_table`` — a Structured Streaming SOURCE over snapshot
tables (Spark 4 Python Data Source API).

Both directions of the table layer's streaming story as ONE format:
``spark.readStream.format("snapshot_table")`` streams OUT of a table
(offsets = versions) and ``df.writeStream.format("snapshot_table")``
streams INTO one (one append commit per micro-batch, txn-marked
exactly-once) — the real Structured Streaming contract (offset log,
replayable batches, checkpointing), not a hand-rolled poller, so a
table-to-table pipeline is a single streaming query end to end.

Design (the Delta streaming-source shape):

- **Offsets are table versions** (``{"version": N}``) — already
  monotonic, durable, and atomically published by the commit protocol,
  so the source needs no state of its own; Spark's checkpoint offset
  log plus the manifests ARE the replay contract.
- **A micro-batch is the files ADDED in ``(start, end]``**, planned
  driver-side from the MANIFESTS (pure JSON reads — no Spark job at
  planning time) as one ``InputPartition`` per data file; executors
  read their file with pyarrow and yield Arrow RecordBatches (no
  row-by-row Python, no driver data path).  This is
  ``DataSourceStreamReader`` (executor-partitioned), not the
  driver-bound ``SimpleDataSourceStreamReader``.
- **Append commits replay exactly**: an ``(start, end]`` span is a
  pure function of immutable manifests and immutable files, so a
  crash-restarted query re-reads the identical batch.
- **Change commits** (a commit that REMOVED files: merge, CDC,
  OPTIMIZE) break appended-rows-only semantics.  Default: raise with
  the remediation; ``skipChangeCommits=true`` skips those commits'
  rows exactly like Delta's option of the same name.  (Compaction adds
  files too — skipping the whole commit, not just removed files, is
  what keeps skipped semantics consistent.)  Deletion vectors added to
  a carried file are a removal for this purpose.

Partition planning bins SMALL files of a span into shared input
partitions (Spark's own openCost model: a file costs
``max(bytes, OPEN_COST_BYTES)``, bins close at
``PARTITION_TARGET_BYTES``), so a compacted history replay or a
100-small-file backlog doesn't schedule one task per tiny file; big
files still get a partition each.  DV-masked reads are not served here
(DVs only ever appear via change commits, which this source refuses or
skips).

Usage::

    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    spark.dataSource.register(SnapshotTableStreamSource)
    df = (
        spark.readStream.format("snapshot_table")
        .option("path", table_path)
        .load()
    )

Options:

- ``path`` (required).
- ``startingVersion`` (default: replay every append from the
  beginning).  **Inclusive, matching Delta's option of the same
  name**: ``N`` means version N's changes are in the first batch;
  ``"latest"`` starts from the table's CURRENT at query start (only
  commits after that point stream).
- ``skipChangeCommits`` (default false).
- ``maxVersionsPerTrigger`` / ``maxBytesPerTrigger``: best-effort
  pacing (the Delta ``maxFilesPerTrigger`` contract — only the first
  post-RESTART batch is unpaced).  Byte pacing rounds UP to commit
  boundaries like Delta: a single fat commit always lands whole in one
  micro-batch (an offset inside a commit would not be replayable).
- ``withCommitVersion`` (default false): append a ``_commit_version``
  provenance column naming the commit that added each row's file.
- ``fsImpl``: ``module:Class`` spec of the ``SnapshotFS`` the
  manifest/CURRENT reads and sink commit ops run through (default the
  process default — ``LocalSnapshotFS`` unless ``set_default_fs``
  changed it in THIS interpreter; data-source readers/writers run in
  separate Python workers, so the option string is how a non-default
  FS reaches them).  Data-file bytes ride pyarrow directly (the
  object-store connectors' job), same layering as the batch side.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class ChangeCommitError(RuntimeError):
    """A commit in the span removed or rewrote files — not replayable
    as appended rows.  Set skipChangeCommits=true to skip such
    commits, or consume the change feed (sources/feed.py) instead."""


# Spark's file-scan cost model (spark.sql.files.*): a file costs at
# least OPEN_COST_BYTES, and a partition's files close at
# PARTITION_TARGET_BYTES of cost — small files share a task, big files
# get their own
OPEN_COST_BYTES = 4 * 1024 * 1024
PARTITION_TARGET_BYTES = 128 * 1024 * 1024


class _FilePartition(InputPartition):
    def __init__(
        self,
        files: list[tuple[str, int]],
        schema_json: str,
        cm: dict | None = None,
    ):
        # [(file_path, commit_version)] — the version is the commit
        # that ADDED the file (provenance column); several small files
        # (possibly from different commits) may share one partition
        self.files = files
        # the DECLARED source schema (CURRENT at query planning) — each
        # file is aligned to it at read: columns an old pre-evolution
        # file lacks are null-backfilled, exactly like snap_read
        self.schema_json = schema_json
        # logical->physical column mapping at planning time: data files
        # store the frozen PHYSICAL names (a renamed column's bytes
        # must surface under its logical name, not null-backfill)
        self.cm = cm or {}


def _dv_sig(e: dict) -> tuple:
    d = e.get("dv") or {}
    return (e["name"], d.get("file"), d.get("rows"))


class _SnapshotStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        starting: int,
        skip_changes: bool,
        schema_json: str,
        max_versions: int | None = None,
        max_bytes: int | None = None,
        with_commit_version: bool = False,
        fs_spec: str | None = None,
        cm: dict | None = None,
        cm_version: int = 0,
    ):
        from .snapshots import load_fs

        self._with_version = with_commit_version
        self._path = path
        self._starting = starting
        self._skip_changes = skip_changes
        self._schema_json = schema_json
        self._max_versions = max_versions
        self._max_bytes = max_bytes
        self._cm = cm or {}
        # the version whose mapping/schema the query planned against:
        # spans at or below it replay safely under the plan-time cm
        # (physical names are frozen), spans beyond it are checked for
        # mapping drift in partitions()
        self._cm_version = cm_version
        # all manifest/CURRENT access goes through the FS seam (a
        # stateless, picklable object — the reader is shipped to
        # executors for read(), which itself only touches data bytes)
        self._fs = load_fs(fs_spec)
        # progress within THIS run, seeded by initialOffset (fresh
        # query) or the first partitions() call (restart replay):
        # lets latestOffset pace batches (maxVersionsPerTrigger /
        # maxBytesPerTrigger).  Best-effort like Delta's
        # maxFilesPerTrigger — only the first post-RESTART batch is
        # unpaced, because the engine asks for latestOffset before the
        # reader can learn the checkpointed position (pacing from a
        # guess below it would plan a backwards span).
        self._planned: int | None = None

    # -- manifest access (driver-side, via the FS seam — no Spark jobs)

    def _manifest(self, version: int) -> dict:
        p = os.path.join(self._path, "_manifests", f"v{version}.json")
        try:
            return json.loads(self._fs.read_text(p))
        except FileNotFoundError:
            raise ChangeCommitError(
                f"manifest v{version} of {self._path!r} is expired — "
                "the stream's offset predates the retention window "
                "(expire_snapshots keep_last). Re-bootstrap with a new "
                "checkpoint and startingVersion."
            ) from None

    def _current(self) -> int:
        p = os.path.join(self._path, "_manifests", "CURRENT")
        if not self._fs.exists(p):
            return 0
        return int(self._fs.read_text(p).strip())

    def _entry_bytes(self, e: dict) -> int:
        # manifests have recorded per-entry bytes since the pacing
        # option shipped; fall back to a stat for older tables
        b = e.get("bytes")
        if b is not None:
            return int(b)
        try:
            return self._fs.getsize(
                os.path.join(e.get("base") or self._path, e["name"])
            )
        except FileNotFoundError:
            return 0

    def _changes(self, version: int) -> tuple[list[dict], bool]:
        """``(entries added by commit v, did v remove/rewrite files)``.

        Delta-format commit records (snapshots.py manifest-scale block)
        carry their own ``adds``/``removes`` — reading ONE small record
        per version, no full-manifest diff.  A rewritten file (MoR
        deletion vector, compaction) appears in both lists, so
        ``removes`` non-empty is exactly the old dv-signature-diff's
        change-commit condition.  Pre-delta full manifests fall back to
        reconstructing both sides and diffing by dv signature."""
        raw = self._manifest(version)
        if "files" not in raw:
            return list(raw.get("adds") or []), bool(raw.get("removes"))
        from .snapshots import read_manifest

        prev_files = (
            read_manifest(self._path, version - 1, self._fs)["files"]
            if version > 1
            else []
        )
        prev_sigs = {_dv_sig(e) for e in prev_files}
        cur_sigs = {_dv_sig(e) for e in raw["files"]}
        added = [e for e in raw["files"] if _dv_sig(e) not in prev_sigs]
        return added, bool(prev_sigs - cur_sigs)

    def _is_pure_rearrangement(self, version: int) -> bool:
        """True when row tracking PROVES commit v moved bytes but no
        rows: an OPTIMIZE on a tracked table whose inputs carried no
        deletion-vector debt and whose outputs all materialized their
        preserved ids.  Such a commit's added files hold ONLY rows
        already emitted by earlier commits, so an append stream skips
        it silently instead of refusing — this is "streaming reads
        that survive compaction" (PLANS.md round-13 row-ID note).
        Cost: two manifest reconstructions, paid only on commits whose
        record says op=optimize."""
        from .snapshots import read_manifest

        raw = self._manifest(version)
        if (raw.get("commit_info") or {}).get("op") != "optimize":
            return False
        if not raw.get("row_tracking"):
            return False
        cur = (
            raw["files"]
            if "files" in raw
            else read_manifest(self._path, version, self._fs)["files"]
        )
        prev = (
            read_manifest(self._path, version - 1, self._fs)["files"]
            if version > 1
            else []
        )
        prev_sigs = {_dv_sig(e) for e in prev}
        cur_sigs = {_dv_sig(e) for e in cur}
        removed = [e for e in prev if _dv_sig(e) not in cur_sigs]
        added = [e for e in cur if _dv_sig(e) not in prev_sigs]
        return (
            bool(added)
            and all(e.get("row_id_col") for e in added)
            and not any(e.get("dv") for e in removed)
        )

    # -- streaming contract -------------------------------------------

    def initialOffset(self) -> dict:
        # only called for FRESH queries (no checkpoint), where the
        # start position is exactly startingVersion — seeding the pace
        # base here bounds even the first catch-up batch; restarts
        # learn their position from the replayed span's partitions()
        self._planned = self._starting
        return {"version": self._starting}

    def latestOffset(self) -> dict:
        cur = max(self._current(), self._starting)
        lo = self._planned
        if lo is None:
            return {"version": cur}
        if self._max_versions is not None:
            cur = min(cur, lo + self._max_versions)
        if self._max_bytes is not None and cur > lo + 1:
            # walk the span's commit records, accumulating each commit's
            # ADDED bytes; stop before the cap but always take one
            # commit (byte pacing rounds to commit boundaries — an
            # offset inside a commit would not be replayable).  Driver
            # cost is O(span) small-delta reads.  Change commits that
            # skipChangeCommits will drop in partitions() contribute 0
            # bytes, so pacing admits as many REAL versions as the cap
            # allows.
            total, end = 0, lo
            for v in range(lo + 1, cur + 1):
                added, removed = self._changes(v)
                if self._skip_changes and removed:
                    b = 0
                else:
                    b = sum(self._entry_bytes(e) for e in added)
                if end > lo and total + b > self._max_bytes:
                    break
                end, total = v, total + b
            cur = end
        return {"version": cur}

    def partitions(self, start: dict, end: dict):
        v0, v1 = int(start["version"]), int(end["version"])
        self._planned = max(self._planned or 0, v1)
        if v1 > self._cm_version:
            # a rename/drop landing MID-STREAM changes which physical
            # name a logical column resolves to; files added after it
            # would silently null-backfill under the stale plan-time
            # mapping.  (Replay spans <= the plan version are safe:
            # physical names are frozen, so the plan-time mapping
            # resolves every older file.)  Rename commits add/remove
            # no files, so the change-commit check cannot catch this.
            raw1 = self._manifest(v1)
            cm1 = (raw1.get("column_mapping") or {}).get("map") or {}
            if cm1 != self._cm:
                raise ChangeCommitError(
                    f"column mapping of {self._path!r} changed at "
                    f"v{v1} while the query was running (a rename/"
                    "drop); restart the query to re-plan under the "
                    "new schema"
                )
        files: list[tuple[str, int, int]] = []  # (path, version, bytes)
        for v in range(v0 + 1, v1 + 1):
            added, removed = self._changes(v)
            if removed:
                if self._skip_changes or self._is_pure_rearrangement(v):
                    continue
                raise ChangeCommitError(
                    f"commit v{v} of {self._path!r} removed/rewrote "
                    "file(s) — the span is not append-only. Set "
                    "skipChangeCommits=true or consume the change "
                    "feed (sources/feed.py). (OPTIMIZE commits on a "
                    "row-tracked table are proven rearrangements and "
                    "skipped automatically.)"
                )
            files += [
                (
                    os.path.join(e.get("base") or self._path, e["name"]),
                    v,
                    self._entry_bytes(e),
                )
                for e in added
            ]
        # openCost binning: small files share a partition, big files
        # get their own; commit order is preserved within a bin
        parts: list[_FilePartition] = []
        bin_files: list[tuple[str, int]] = []
        bin_cost = 0
        for p, v, b in files:
            cost = max(b, OPEN_COST_BYTES)
            if bin_files and bin_cost + cost > PARTITION_TARGET_BYTES:
                parts.append(
                    _FilePartition(bin_files, self._schema_json, self._cm)
                )
                bin_files, bin_cost = [], 0
            bin_files.append((p, v))
            bin_cost += cost
        if bin_files:
            parts.append(
                _FilePartition(bin_files, self._schema_json, self._cm)
            )
        return parts or [_FilePartition([], "", self._cm)]

    def read(self, partition: _FilePartition):
        # executor-side: the partition's parquet files -> Arrow batches
        for file_path, commit_version in partition.files:
            yield from self._read_one(
                file_path,
                commit_version,
                partition.schema_json,
                partition.cm,
            )

    def _read_one(
        self,
        file_path: str,
        commit_version: int,
        schema_json: str,
        cm: dict | None = None,
    ):
        import pyarrow.parquet as pq

        cm = cm or {}
        table = pq.read_table(file_path)
        if schema_json:
            # align to the DECLARED schema: null-backfill columns this
            # (pre-evolution) file lacks, drop extras, and cast to the
            # exact Arrow types — Spark writes INT96 timestamps by
            # default, which pyarrow reads as timestamp[ns] while the
            # data source API only accepts [us]
            import pyarrow as pa
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType

            spark_schema = StructType.fromJson(json.loads(schema_json))
            target = to_arrow_schema(spark_schema)
            add_version = (
                self._with_version
                and target.names
                and target.names[-1] == "_commit_version"
            )
            if add_version:
                # provenance column: synthesized below, not aligned
                # against the file (which cannot contain it)
                target = pa.schema(list(target)[:-1])
            have = set(table.schema.names)
            arrays = []
            for field in target:
                # files store PHYSICAL names (frozen at first write);
                # the declared schema is logical
                phys = cm.get(field.name, field.name)
                if phys in have:
                    arrays.append(table.column(phys).cast(field.type))
                else:
                    arrays.append(pa.nulls(table.num_rows, field.type))
            if add_version:
                arrays.append(
                    pa.array(
                        [commit_version] * table.num_rows,
                        type=pa.int64(),
                    )
                )
                target = target.append(
                    pa.field("_commit_version", pa.int64())
                )
            table = pa.table(arrays, schema=target)
        return iter(table.to_batches())

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint log; manifests are GC'd by
        # expire_snapshots under the caller's retention policy
        pass


class _CDFPartition(InputPartition):
    """One commit step of a change-feed read: the step's REMOVED and
    ADDED files (each with its optional DV sidecar and row-id base),
    each side's schema/column-mapping, and the plan-time output
    schema."""

    def __init__(
        self,
        version: int,
        old_files: list,
        new_files: list,
        old_schema_json: str,
        new_schema_json: str,
        old_cm: dict,
        new_cm: dict,
        keys: list,
        out_schema_json: str,
    ):
        self.version = version
        # [(data_path, dv_path|None, row_id_base|None), ...] — base
        # None means the file materialized its own _row_id column.
        # Identity mode is NOT carried per-partition: the pickled
        # reader's own _by_id drives read()/_load_side, so a partition
        # field would be dead state inviting drift.
        self.old_files = old_files
        self.new_files = new_files
        self.old_schema_json = old_schema_json
        self.new_schema_json = new_schema_json
        self.old_cm = old_cm
        self.new_cm = new_cm
        self.keys = keys
        self.out_schema_json = out_schema_json


class _SnapshotCDFStreamReader(_SnapshotStreamReader):
    """``readChangeFeed=true`` — stream ROW-LEVEL deltas instead of
    appended rows (Delta's streaming CDF mode).

    Same offset/pacing machinery as the append reader (offsets are
    versions, spans replay exactly), different batch contents: a
    micro-batch is the ``table_changes`` slice for ``(start, end]``,
    with ``_change_type`` (insert / delete / update_preimage /
    update_postimage) and ``_commit_version`` columns.  Semantics
    mirror ``snapshots.table_changes`` (the parity test pins streamed
    == batch): per commit, only the step's removed/added files can
    hold changed rows (CoW carries are byte-identical), a full-outer
    join on ``keys`` classifies each key, and carried-through rows
    inside rewritten files compare null-safe-equal and drop out.

    Execution shape: the diff needs all of one commit's rewritten
    slice co-located, so each commit is ONE input partition whose
    executor task joins the slice with pyarrow (vectorized kernels;
    per-column Python only as a fallback for types pyarrow cannot
    compare).  That bounds a task at the commit's rewritten slice —
    the update slice on a clustered table, never the table.  The 100x
    lever when single commits rewrite huge slices is row tracking
    (PLANS.md row-ID note): stable row IDs would let rearrangement
    commits emit nothing and keyed commits emit exact per-file deltas
    without the join."""

    def __init__(
        self,
        *args,
        keys: list | None = None,
        by_id: bool = False,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self._keys = list(keys or [])
        # keys-less mode on a row-tracked table: diff by _row_id (the
        # batch table_changes(keys=None) semantic); the feed schema
        # then carries _row_id so consumers fold by identity
        self._by_id = by_id

    def partitions(self, start: dict, end: dict):
        from .snapshots import read_manifest as _rm

        def read_manifest(path, version, fs):
            # reconstruction of an expired version must surface the
            # same remediation the append reader gives, not a bare
            # FileNotFoundError from deep inside the replay
            try:
                return _rm(path, version, fs)
            except FileNotFoundError:
                raise ChangeCommitError(
                    f"manifest v{version} of {path!r} is expired — the"
                    " change-feed offset predates the retention window"
                    " (expire_snapshots keep_last). Re-bootstrap with"
                    " a new checkpoint and startingVersion."
                ) from None

        v0, v1 = int(start["version"]), int(end["version"])
        self._planned = max(self._planned or 0, v1)
        if v1 > self._cm_version:
            # a rename/drop mid-stream changes logical->physical
            # resolution AND the logical output shape; aligning new
            # files under the stale plan-time schema would silently
            # null-backfill (same hazard as the append reader)
            raw1 = self._manifest(v1)
            cm1 = (raw1.get("column_mapping") or {}).get("map") or {}
            if cm1 != self._cm:
                raise ChangeCommitError(
                    f"column mapping of {self._path!r} changed at "
                    f"v{v1} while the change-feed query was running; "
                    "restart the query to re-plan under the new schema"
                )

        def _sig(e: dict) -> tuple:
            d = e.get("dv") or {}
            return (e["name"], d.get("file"), d.get("rows"))

        def _files(entries: list[dict]) -> list:
            out = []
            for e in entries:
                base = e.get("base") or self._path
                dv = e.get("dv")
                rid = None
                if self._by_id and not e.get("row_id_col"):
                    if "row_id_base" not in e:
                        raise ChangeCommitError(
                            f"change-feed by identity needs row "
                            f"tracking at every commit in the span — "
                            f"entry {e['name']!r} has no row-id state "
                            "(enable_row_tracking landed later?); "
                            "restart from a tracked version or pass "
                            ".option('keys', ...)"
                        )
                    rid = int(e["row_id_base"])
                out.append(
                    (
                        os.path.join(base, e["name"]),
                        # a dv recorded by a borrowing table carries
                        # its own dir — see snapshots._dv_path
                        os.path.join(dv.get("base") or base, dv["file"])
                        if dv
                        else None,
                        rid,
                    )
                )
            return out

        parts: list[_CDFPartition] = []
        prev_m = (
            read_manifest(self._path, v0, self._fs) if v0 > 0 else None
        )
        for v in range(v0 + 1, v1 + 1):
            cur_m = read_manifest(self._path, v, self._fs)
            prev_files = prev_m["files"] if prev_m else []
            prev_sigs = {_sig(e) for e in prev_files}
            cur_sigs = {_sig(e) for e in cur_m["files"]}
            removed = [
                e for e in prev_files if _sig(e) not in cur_sigs
            ]
            added = [
                e for e in cur_m["files"] if _sig(e) not in prev_sigs
            ]
            old_schema = prev_m.get("schema") if prev_m else None
            new_schema = cur_m.get("schema")
            old_cm = (
                ((prev_m.get("column_mapping") or {}).get("map") or {})
                if prev_m
                else {}
            )
            new_cm = (cur_m.get("column_mapping") or {}).get("map") or {}
            prev_m = cur_m
            if not removed and not added:
                continue  # metadata-only commit: no row changes
            if (
                (cur_m.get("commit_info") or {}).get("op") == "optimize"
                and cur_m.get("row_tracking")
                and not any(e.get("dv") for e in removed)
                and added
                and all(e.get("row_id_col") for e in added)
            ):
                # provable pure rearrangement (row tracking): an
                # OPTIMIZE on a tracked table preserves every id and,
                # with no deletion-vector debt on the inputs, every
                # row — skip the read-and-cancel diff entirely.  This
                # is what row IDs buy the feed (PLANS.md round 13).
                continue
            parts.append(
                _CDFPartition(
                    v,
                    _files(removed),
                    _files(added),
                    old_schema or "",
                    new_schema or "",
                    old_cm,
                    new_cm,
                    self._keys,
                    self._schema_json,
                )
            )
        return parts or [
            _CDFPartition(0, [], [], "", "", {}, {}, self._keys, "")
        ]

    # -- executor side -------------------------------------------------

    def _load_side(self, files: list, schema_json: str, cm: dict):
        """One side of a commit step as a pyarrow table aligned to its
        OWN version's logical schema (DV-masked), or None if empty."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from .batch_source import align_to_schema

        tabs = []
        for file_path, dv_path, rid in files:
            table = pq.read_table(file_path)
            ids = None
            if self._by_id:
                # identity BEFORE the DV mask: positions are physical
                if rid is not None:
                    ids = pa.array(
                        rid + np.arange(table.num_rows, dtype=np.int64)
                    )
                else:  # id-materializing rewrite: read the column
                    ids = table.column("_row_id").combine_chunks()
            if dv_path:
                dv = pq.read_table(dv_path, columns=["file_name", "pos"])
                fname = os.path.basename(file_path)
                mask = np.asarray(dv.column("file_name")) == fname
                pos = np.asarray(dv.column("pos"))[mask].astype(np.int64)
                if pos.size:
                    keep = np.ones(table.num_rows, dtype=bool)
                    keep[pos] = False
                    keep_arr = pa.array(keep)
                    table = table.filter(keep_arr)
                    if ids is not None:
                        ids = ids.filter(keep_arr)
            if schema_json:
                table = align_to_schema(table, schema_json, cm)
            if ids is not None:
                table = table.append_column(
                    pa.field("_row_id", pa.int64()),
                    ids.cast(pa.int64()),
                )
            if table.num_rows:
                tabs.append(table)
        if not tabs:
            return None
        return pa.concat_tables(tabs, promote_options="permissive")

    def _project(self, table, target):
        """Project a side onto the OUTPUT logical schema: evolved-away
        columns null-backfill, types cast exactly (table_changes'
        out_cols alignment)."""
        import pyarrow as pa

        have = set(table.schema.names)
        arrays = []
        for field in target:
            if field.name in have:
                arrays.append(table.column(field.name).cast(field.type))
            else:
                arrays.append(pa.nulls(table.num_rows, field.type))
        return pa.table(arrays, schema=target)

    def read(self, partition: _CDFPartition):
        import json as _json

        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        if not partition.out_schema_json:
            return
        full = to_arrow_schema(
            StructType.fromJson(_json.loads(partition.out_schema_json))
        )
        # last two fields are the synthesized _change_type /
        # _commit_version; data alignment targets the table columns
        target = pa.schema(list(full)[:-2])
        keys = partition.keys
        attrs = [f.name for f in target if f.name not in keys]
        v = partition.version

        old = self._load_side(
            partition.old_files, partition.old_schema_json,
            partition.old_cm,
        )
        new = self._load_side(
            partition.new_files, partition.new_schema_json,
            partition.new_cm,
        )
        if old is not None:
            old = self._project(old, target)
        if new is not None:
            new = self._project(new, target)

        def _emit(table, kind: str):
            n = table.num_rows
            if not n:
                return None
            cols = [table.column(f.name) for f in target]
            cols.append(pa.array([kind] * n, type=pa.string()))
            cols.append(pa.array([v] * n, type=pa.int64()))
            return pa.table(cols, schema=full)

        outs = []
        if old is None and new is None:
            return
        elif old is None:
            outs.append(_emit(new, "insert"))
        elif new is None:
            outs.append(_emit(old, "delete"))
        else:
            # full-outer join on keys, pyarrow kernels end to end —
            # the exact shape of table_changes' Spark join
            o = old.rename_columns(
                [
                    c if c in keys else f"__old_{c}"
                    for c in old.schema.names
                ]
            ).append_column("__in_old", pa.array([True] * old.num_rows))
            nw = new.rename_columns(
                [
                    c if c in keys else f"__new_{c}"
                    for c in new.schema.names
                ]
            ).append_column("__in_new", pa.array([True] * new.num_rows))
            j = o.join(nw, keys=keys, join_type="full outer")
            in_old = pc.fill_null(j.column("__in_old"), False)
            in_new = pc.fill_null(j.column("__in_new"), False)

            def _take(table, side: str, kind: str):
                cols = []
                for f in target:
                    name = (
                        f.name
                        if f.name in keys
                        else f"__{side}_{f.name}"
                    )
                    cols.append(table.column(name).cast(f.type))
                n = table.num_rows
                if not n:
                    return None
                cols.append(pa.array([kind] * n, type=pa.string()))
                cols.append(pa.array([v] * n, type=pa.int64()))
                return pa.table(cols, schema=full)

            ins = j.filter(pc.and_(in_new, pc.invert(in_old)))
            dele = j.filter(pc.and_(in_old, pc.invert(in_new)))
            both = j.filter(pc.and_(in_old, in_new))
            if both.num_rows and attrs:
                differ = None
                for a in attrs:
                    ca, cb = (
                        both.column(f"__old_{a}"),
                        both.column(f"__new_{a}"),
                    )
                    try:
                        eq = pc.fill_null(pc.equal(ca, cb), False)
                        same = pc.or_(
                            eq,
                            pc.and_(pc.is_null(ca), pc.is_null(cb)),
                        )
                        d = pc.invert(same)
                    except pa.ArrowNotImplementedError:
                        # types without an equality kernel (nested):
                        # exact python compare, this column only
                        la, lb = ca.to_pylist(), cb.to_pylist()
                        d = pa.array(
                            [x != y for x, y in zip(la, lb)],
                            type=pa.bool_(),
                        )
                    differ = d if differ is None else pc.or_(differ, d)
                changed = both.filter(differ)
            else:
                changed = both.slice(0, 0)
            outs += [
                _take(ins, "new", "insert"),
                _take(dele, "old", "delete"),
                _take(changed, "old", "update_preimage"),
                _take(changed, "new", "update_postimage"),
            ]
        for t in outs:
            if t is not None and t.num_rows:
                yield from t.to_batches()


class _FileCommit(WriterCommitMessage):
    def __init__(self, name: str | None):
        self.name = name


class _SnapshotStreamWriter(DataSourceStreamArrowWriter):
    """Native streaming SINK: each micro-batch lands as ONE append
    commit on the snapshot table.

    - ``write`` (executors): each task's ARROW RecordBatches (the
      engine ships columnar batches — no per-row Python conversion on
      the data path) stream into one immutable ``data-*.parquet``
      written DIRECTLY into the table dir via pyarrow (invisible until
      a manifest references it — the same publish-then-commit shape
      the batch writers use); the file name is the commit message.
    - ``commit`` (driver): footer stats + blooms for the new files,
      then one manifest commit carrying a ``(txnAppId, batchId)``
      marker — a replayed micro-batch (failure before the streaming
      checkpoint recorded the batch) finds its marker and SKIPS, so
      the sink is exactly-once end-to-end, the same rule
      ``run_streaming_cdc`` applies through foreachBatch.
    - ``abort`` (driver): deletes the published-but-uncommitted files
      (they were never visible; GC would also collect them).
    """

    def __init__(
        self,
        path: str,
        schema: StructType,
        txn_app: str,
        fs_spec: str | None = None,
        cm: dict | None = None,
        pspec: list[dict] | None = None,
    ):
        self._path = path
        self._schema_json = schema.json()
        self._txn_app = txn_app
        self._fs_spec = fs_spec
        # logical->physical mapping captured at query planning; each
        # micro-batch commit re-checks it (see commit())
        self._cm = cm or {}
        self._pspec = pspec or []

    def write(self, iterator) -> _FileCommit:
        # iterator of pyarrow RecordBatch (DataSourceStreamArrowWriter):
        # batches append straight into the parquet writer — executor
        # memory bounded at O(batch), zero per-row Python.  Shared with
        # the batch writer (batch_source.write_arrow_parquet).
        from .batch_source import write_arrow_parquet

        return _FileCommit(
            write_arrow_parquet(
                self._path, self._schema_json, iterator, self._cm,
                self._pspec,
            )
        )

    def commit(self, messages, batchId: int) -> None:
        from .snapshots import (
            CommitConflict,
            COMMIT_RETRIES,
            _build_bloom_sidecar,
            _check_batch_schema,
            _commit,
            _file_stats,
            _manifest_schema,
            _txn_already_applied,
            load_fs,
            read_manifest,
        )
        from pyspark.sql.types import StructType as _St

        names = [m.name for m in messages if m is not None and m.name]
        f = load_fs(self._fs_spec)
        if not names:
            # every row of the micro-batch was filtered out: committing
            # would only bump the version chain (snap_append's
            # empty-batch rule); skipping is replay-safe — an empty
            # batch replayed appends nothing either way
            return
        m0 = read_manifest(self._path, fs=f)
        if _txn_already_applied(m0, self._txn_app, batchId):
            for n in names:  # replayed batch: drop the duplicates
                if f.exists(os.path.join(self._path, n)):
                    f.remove(os.path.join(self._path, n))
            return
        from .snapshots import _cm as _cm_of

        if _cm_of(m0) != self._cm:
            # a rename/drop landed after the query planned: this
            # batch's files carry the OLD physical names — publishing
            # them would mis-name columns.  Fail the query loudly;
            # restarting re-plans against the new mapping.
            for n in names:
                if f.exists(os.path.join(self._path, n)):
                    f.remove(os.path.join(self._path, n))
            raise CommitConflict(
                f"snapshot_table sink: column mapping of {self._path!r} "
                "changed while the query was running (a concurrent "
                "rename/drop); restart the query to re-plan"
            )
        if m0.get("identity"):
            # the identity allocator lives on snap_append; a sink batch
            # can neither omit the column (schema check) nor safely
            # supply values — refuse before any manifest references
            for n in names:
                if f.exists(os.path.join(self._path, n)):
                    f.remove(os.path.join(self._path, n))
            raise ValueError(
                f"snapshot_table sink: {self._path!r} declares IDENTITY"
                f" column(s) {sorted(m0['identity'])} — stream into a"
                " staging table and snap_append into the identity table"
            )
        target_schema = _manifest_schema(m0)
        if target_schema is not None:
            # same validator as the batch writers: (name, type) match,
            # loud rejection — the sink offers no evolution path
            _check_batch_schema(
                target_schema,
                _St.fromJson(json.loads(self._schema_json)),
                set(),
                False,
                "snapshot_table sink",
            )
        from .snapshots import _enforce_constraints_files, _generated_checks

        def _validate(cons: dict) -> None:
            # CHECK constraints: validate the batch's freshly written
            # (still invisible) files BEFORE any manifest references
            # them; a violation drops the files and fails the batch, so
            # constrained tables stay clean even through the sink.
            # Session-free (DuckDB over the parquet files): this commit
            # runs in a dedicated Python worker with NO SparkSession
            # (pyspark/sql/worker/python_streaming_sink_runner.py).
            try:
                _enforce_constraints_files(
                    [os.path.join(self._path, n) for n in names],
                    cons,
                    "stream_sink",
                    self._cm,
                )
            except Exception:
                for n in names:
                    if f.exists(os.path.join(self._path, n)):
                        f.remove(os.path.join(self._path, n))
                raise

        # GENERATED ALWAYS AS columns validate through the same
        # session-free DuckDB path as CHECK constraints (the synthetic
        # IS-NOT-DISTINCT-FROM checks) — a sink batch carrying
        # divergent generated values must not commit
        validated_for: dict = {}
        cons0 = {
            **(m0.get("constraints") or {}), **_generated_checks(m0)
        }
        if cons0:
            _validate(cons0)
            validated_for = cons0
        # stats + blooms are a pure function of the immutable files:
        # compute ONCE, not per commit-race retry
        # partitioned table: the files carry derived partition values —
        # track their stats/blooms so the sink's files prune too
        stat_names = list(m0["stats_cols"]) + [
            s["name"] for s in self._pspec
        ]
        entries = []
        for n in names:
            e = {"name": n}
            e.update(
                _file_stats(os.path.join(self._path, n), stat_names)
            )
            entries.append(e)
        _build_bloom_sidecar(self._path, entries, stat_names, f)

        m = m0
        for _attempt in range(COMMIT_RETRIES):
            if _cm_of(m) != self._cm:
                # a rename/drop won a retry race: same guard as the
                # pre-loop check — the files hold the OLD physical
                # names and must never be published
                for n in names:
                    if f.exists(os.path.join(self._path, n)):
                        f.remove(os.path.join(self._path, n))
                raise CommitConflict(
                    f"snapshot_table sink: column mapping of "
                    f"{self._path!r} changed during the commit retries "
                    "(a concurrent rename/drop); restart the query to "
                    "re-plan"
                )
            if _txn_already_applied(m, self._txn_app, batchId):
                for n in names:
                    if f.exists(os.path.join(self._path, n)):
                        f.remove(os.path.join(self._path, n))
                return
            cons = {
                **(m.get("constraints") or {}), **_generated_checks(m)
            }
            if cons != validated_for:
                # a retried commit must honor constraints added by the
                # writer that beat us — re-validate against what THIS
                # manifest declares (the batch writers enforce inside
                # their retry loops for the same reason)
                _validate(cons)
                validated_for = cons
            txns = dict(m.get("txns", {}))
            txns[self._txn_app] = int(batchId)
            try:
                _commit(
                    self._path,
                    m["files"] + entries,
                    m["stats_cols"],
                    base_version=m["version"],
                    schema_json=m.get("schema"),
                    adds=entries,
                    removes=[],
                    txns=txns,
                    commit_info={
                        "op": "stream_sink",
                        "added": len(entries),
                        "txn": {"app": self._txn_app, "batch": int(batchId)},
                    },
                    fs=f,
                    carry=m,
                )
                return
            except CommitConflict:
                m = read_manifest(self._path, fs=f)
                continue
        raise CommitConflict(
            f"stream sink lost the commit race {COMMIT_RETRIES} times "
            f"at {self._path!r}"
        )

    def abort(self, messages, batchId: int) -> None:
        from .snapshots import load_fs

        f = load_fs(self._fs_spec)
        for m in messages:
            if m is not None and m.name:
                p = os.path.join(self._path, m.name)
                if f.exists(p):
                    f.remove(p)


class SnapshotTableStreamSource(DataSource):
    """``spark.readStream.format("snapshot_table")`` — register with
    ``spark.dataSource.register(SnapshotTableStreamSource)``."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("snapshot_table source requires .option('path', ...)")
        kind, val = self._ref()
        if kind == "branch":
            return val  # the branch's own table dir (sources/refs.py)
        return p

    def _ref(self) -> tuple[str | None, object]:
        """Resolve the ``ref`` / ``branch`` / ``tag`` options ONCE per
        DataSource instance (same caching rule as timestampAsOf:
        plan-time calls must all see one resolution even if the ref is
        retargeted mid-plan).  ``ref`` accepts either kind; the
        Iceberg-shaped ``branch`` / ``tag`` options additionally
        ASSERT the kind, so a pipeline wired to read a branch fails
        loudly if the name turns out to pin a tag (and vice versa).
        ``(None, None)`` without any option; else ``("branch", dir)``
        or ``("tag", version)``."""
        given = {
            k: self.options.get(k)
            for k in ("ref", "branch", "tag")
            if self.options.get(k)
        }
        if not given:
            return (None, None)
        if len(given) > 1:
            raise ValueError(
                "snapshot_table: pass ONE of ref/branch/tag, got "
                f"{sorted(given)}"
            )
        cached = getattr(self, "_ref_resolved", None)
        if cached is None:
            from .refs import resolve_ref

            (opt, name), = given.items()
            p = self.options.get("path")
            cached = resolve_ref(p, name, self._fs())
            if opt != "ref" and cached[0] != opt:
                raise ValueError(
                    f"snapshot_table: option('{opt}', {name!r}) but "
                    f"{name!r} names a {cached[0]} — use "
                    f".option('{cached[0]}', ...) or the kind-agnostic "
                    ".option('ref', ...)"
                )
            self._ref_resolved = cached
        return cached

    def _fs(self):
        from .snapshots import load_fs

        return load_fs(self.options.get("fsimpl"))

    def _flag(self, opt: str) -> bool:
        return str(self.options.get(opt, "false")).lower() in ("true", "1")

    def _cdf_by_id(self, m: dict) -> bool:
        """True when a readChangeFeed query runs in keys-less IDENTITY
        mode: no ``keys`` option and the table is row-tracked (the
        batch ``table_changes(keys=None)`` semantic)."""
        raw_keys = str(self.options.get("keys", "") or "")
        return not raw_keys.strip() and bool(m.get("row_tracking"))

    def _version_as_of(self) -> int | None:
        v = self.options.get("versionasof")
        t = self.options.get("timestampasof")
        kind, val = self._ref()
        if kind == "tag":
            if v is not None or t is not None:
                raise ValueError(
                    "snapshot_table: a tag ref already pins a version"
                    " — drop versionAsOf/timestampAsOf"
                )
            return int(val)
        if t is not None:
            # Delta-style timestamp time travel (epoch seconds or ISO
            # string; snapshots.version_at_timestamp has the rules).
            # Resolved ONCE per DataSource instance and cached:
            # schema(), _column_mapping(), and reader() each consult
            # the as-of version, and a commit landing between those
            # plan calls must not let them resolve DIFFERENT versions
            # (a schema/data mismatch within one read).
            if v is not None:
                raise ValueError(
                    "snapshot_table: pass versionAsOf OR timestampAsOf,"
                    " not both"
                )
            cached = getattr(self, "_ts_resolved_version", None)
            if cached is None:
                from .snapshots import version_at_timestamp

                cached = version_at_timestamp(self._path(), t, self._fs())
                self._ts_resolved_version = cached
            return cached
        return int(v) if v is not None else None

    def _column_mapping(self) -> tuple[dict, int]:
        """``(logical->physical map, version)`` of the planned version
        (same version ``schema()`` declares) — ``({}, 0)`` on
        fresh/unmapped tables."""
        from .snapshots import _current_path, _manifest_path

        path = self._path()
        fs = self._fs()
        v = self._version_as_of()
        try:
            if v is None:
                v = int(fs.read_text(_current_path(path)).strip())
            raw = json.loads(fs.read_text(_manifest_path(path, v)))
        except (FileNotFoundError, ValueError):
            return {}, 0
        return (raw.get("column_mapping") or {}).get("map") or {}, v

    def _partition_spec(self) -> list[dict]:
        """The table's hidden-partitioning spec (sources/partition.py)
        at CURRENT, or [] on fresh/unpartitioned tables — the sink
        derives + tracks the partition values so its files prune."""
        from .snapshots import _current_path, _manifest_path

        path = self._path()
        fs = self._fs()
        try:
            v = int(fs.read_text(_current_path(path)).strip())
            raw = json.loads(fs.read_text(_manifest_path(path, v)))
        except (FileNotFoundError, ValueError):
            return []
        return raw.get("partition_spec") or []

    def schema(self) -> StructType:
        path = self._path()
        fs = self._fs()
        v = self._version_as_of()
        if v is None:
            v = int(
                fs.read_text(
                    os.path.join(path, "_manifests", "CURRENT")
                ).strip()
            )
        # every commit record (delta or full) carries its own schema,
        # so time travel reads each version's own declared shape
        m = json.loads(
            fs.read_text(os.path.join(path, "_manifests", f"v{v}.json"))
        )
        if not m.get("schema"):
            raise ValueError(
                "snapshot_table source needs a manifest-recorded schema"
            )
        schema = StructType.fromJson(json.loads(m["schema"]))
        if self._flag("readchangefeed"):
            from pyspark.sql.types import LongType, StringType, StructField

            if self._flag("withcommitversion"):
                raise ValueError(
                    "readChangeFeed=true already emits _commit_version"
                    " — drop withCommitVersion"
                )
            clash = ["_change_type", "_commit_version"]
            if self._cdf_by_id(m):
                clash.append("_row_id")
            for c in clash:
                if c in schema.fieldNames():
                    raise ValueError(
                        f"readChangeFeed=true but the table schema "
                        f"already has a `{c}` column"
                    )
            fields = list(schema.fields)
            if self._cdf_by_id(m):
                # keys-less identity mode surfaces the row id (same
                # shape as batch table_changes(keys=None))
                fields.append(StructField("_row_id", LongType()))
            return StructType(
                fields
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                ]
            )
        if self._flag("withrowids"):
            from pyspark.sql.types import LongType, StructField

            if not m.get("row_tracking"):
                raise ValueError(
                    "withRowIds=true needs row tracking — "
                    "snap_enable_row_tracking(path)"
                )
            if "_row_id" in schema.fieldNames():
                raise ValueError(
                    "withRowIds=true but the table schema already has"
                    " a `_row_id` column"
                )
            schema = StructType(
                list(schema.fields)
                + [StructField("_row_id", LongType())]
            )
        if self._flag("withcommitversion"):
            from pyspark.sql.types import LongType, StructField

            if "_commit_version" in schema.fieldNames():
                # e.g. a mirror table that PERSISTED a provenance
                # column: appending the synthetic one would produce a
                # duplicate field name and ambiguous downstream refs
                raise ValueError(
                    "withCommitVersion=true but the table schema "
                    "already has a `_commit_version` column — rename "
                    "the physical column or drop the option"
                )
            schema = StructType(
                list(schema.fields)
                + [StructField("_commit_version", LongType())]
            )
        return schema

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if self._flag("withrowids") and not self._flag("readchangefeed"):
            raise ValueError(
                "withRowIds is a batch-read option (spark.read); the "
                "append stream plans partitions without id state — "
                "use readChangeFeed (identity mode) for streamed ids"
            )
        sv = self.options.get("startingversion")
        st = self.options.get("startingtimestamp")
        if st is not None:
            # Delta parity: stream every commit at-or-after the
            # instant (adjusted-monotone clock — see snapshots.
            # version_at_timestamp); a future instant streams only
            # commits yet to land instead of erroring
            if sv is not None:
                raise ValueError(
                    "snapshot_table stream: pass startingVersion OR "
                    "startingTimestamp, not both"
                )
            from .snapshots import version_before_timestamp

            starting = version_before_timestamp(
                self._path(), st, self._fs()
            )
        elif sv is None:
            starting = 0
        elif str(sv).lower() == "latest":
            # only commits AFTER the table's current version stream
            cur = os.path.join(self._path(), "_manifests", "CURRENT")
            fs = self._fs()
            starting = (
                int(fs.read_text(cur).strip()) if fs.exists(cur) else 0
            )
        else:
            # INCLUSIVE like Delta: version N's changes are in the
            # first batch, so the internal (exclusive) offset is N-1
            starting = max(0, int(sv) - 1)
        skip = self._flag("skipchangecommits")

        def _positive(opt: str, label: str) -> int | None:
            raw = self.options.get(opt)
            if not raw:
                return None
            val = int(raw)
            if val <= 0:
                raise ValueError(
                    f"{label} must be positive, got {raw!r} "
                    "(0 would freeze the offset and stall the stream)"
                )
            return val

        cm, cm_version = self._column_mapping()
        if self._flag("readchangefeed"):
            if skip:
                raise ValueError(
                    "readChangeFeed=true streams change commits as "
                    "row deltas — skipChangeCommits does not compose"
                )
            by_id = "_row_id" in schema.fieldNames()
            raw_keys = str(self.options.get("keys", "") or "")
            keys = [k.strip() for k in raw_keys.split(",") if k.strip()]
            if by_id:
                keys = ["_row_id"]
            elif not keys:
                raise ValueError(
                    "readChangeFeed=true requires .option('keys', "
                    "'k1,k2') — the logical key the per-commit diff "
                    "classifies rows by (same contract as "
                    "table_changes) — unless the table has row "
                    "tracking, where omitting keys diffs by identity"
                )
            else:
                fields = set(schema.fieldNames())
                missing = [k for k in keys if k not in fields]
                if missing:
                    raise ValueError(
                        f"readChangeFeed keys {missing} not in table "
                        f"schema {sorted(fields)}"
                    )
            return _SnapshotCDFStreamReader(
                self._path(),
                starting,
                False,
                schema.json(),
                max_versions=_positive(
                    "maxversionspertrigger", "maxVersionsPerTrigger"
                ),
                max_bytes=_positive(
                    "maxbytespertrigger", "maxBytesPerTrigger"
                ),
                fs_spec=self.options.get("fsimpl"),
                cm=cm,
                cm_version=cm_version,
                keys=keys,
                by_id=by_id,
            )
        return _SnapshotStreamReader(
            self._path(),
            starting,
            skip,
            schema.json(),
            max_versions=_positive(
                "maxversionspertrigger", "maxVersionsPerTrigger"
            ),
            max_bytes=_positive("maxbytespertrigger", "maxBytesPerTrigger"),
            with_commit_version=self._flag("withcommitversion"),
            fs_spec=self.options.get("fsimpl"),
            cm=cm,
            cm_version=cm_version,
        )

    def streamWriter(self, schema: StructType, overwrite: bool):
        if self._ref()[0] == "tag":
            raise ValueError(
                "cannot write to a TAG ref (immutable pointer) — "
                "write to a branch or to the table itself"
            )
        if overwrite:
            raise ValueError(
                "snapshot_table sink is append-only (one append commit "
                "per micro-batch); complete/update output modes are not "
                "supported — aggregate downstream or use foreachBatch "
                "with merge_upsert_cow"
            )
        txn_app = self.options.get("txnappid")
        if not txn_app:
            # a DEFAULT id would be shared by every query writing this
            # table: query B's batchId 0 would look like a replay of
            # query A's batch 0..N and be silently dropped (files
            # deleted).  The id must be stable across restarts of ONE
            # query and unique across queries — only the caller knows
            # both, so it is required (the Delta idempotent-write rule).
            raise ValueError(
                "snapshot_table sink requires .option('txnAppId', ...): "
                "a stable unique id for THIS streaming query (keep it "
                "when restarting from the same checkpoint; change it "
                "together with the checkpoint when reprocessing)"
            )
        return _SnapshotStreamWriter(
            self._path(),
            schema,
            txn_app,
            fs_spec=self.options.get("fsimpl"),
            cm=self._column_mapping()[0],
            pspec=self._partition_spec(),
        )

    # -- batch surface (same format string; see batch_source.py) ------

    def reader(self, schema: StructType):
        from .batch_source import SnapshotBatchReader

        return SnapshotBatchReader(
            self._path(),
            schema.json(),
            self._version_as_of(),
            self.options.get("fsimpl"),
            with_row_ids=self._flag("withrowids"),
        )

    def writer(self, schema: StructType, overwrite: bool):
        if self._ref()[0] == "tag":
            raise ValueError(
                "cannot write to a TAG ref (immutable pointer) — "
                "write to a branch or to the table itself"
            )
        from .batch_source import SnapshotBatchWriter

        raw = self.options.get("statscols", "")
        stats_cols = [c.strip() for c in raw.split(",") if c.strip()]
        import re as _re

        raw_pb = self.options.get("partitionby", "")
        # split on commas OUTSIDE parens: "days(ts), bucket(16, user_id)"
        # is two specs, not three
        partition_by = [
            p.strip()
            for p in _re.split(r",(?![^(]*\))", raw_pb)
            if p.strip()
        ]
        return SnapshotBatchWriter(
            self._path(),
            schema,
            overwrite,
            self.options.get("fsimpl"),
            stats_cols,
            partition_by or None,
        )
