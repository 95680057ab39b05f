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

Caveats (documented, honest): per-file partitions mean batch
parallelism = files in the span (append batches usually write a
handful — fine for ingest-rate streams); wildly wide rows and
DV-masked reads are not served here (DVs only ever appear via change
commits, which this source refuses or skips).

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

Options: ``path`` (required); ``startingVersion`` (default 0 — replay
every append from the beginning; ``N`` starts after version N, i.e.
first batch is ``(N, CURRENT]``); ``skipChangeCommits``
(default false).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class ChangeCommitError(RuntimeError):
    """A commit in the span removed or rewrote files — not replayable
    as appended rows.  Set skipChangeCommits=true to skip such
    commits, or consume the change feed (sources/feed.py) instead."""


class _FilePartition(InputPartition):
    def __init__(
        self, file_path: str, schema_json: str, commit_version: int = 0
    ):
        self.file_path = file_path
        # the DECLARED source schema (CURRENT at query planning) — each
        # file is aligned to it at read: columns an old pre-evolution
        # file lacks are null-backfilled, exactly like snap_read
        self.schema_json = schema_json
        # the version whose commit ADDED this file (provenance column)
        self.commit_version = commit_version


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
        with_commit_version: bool = False,
    ):
        self._with_version = with_commit_version
        self._path = path
        self._starting = starting
        self._skip_changes = skip_changes
        self._schema_json = schema_json
        self._max_versions = max_versions
        # progress within THIS run, seeded by initialOffset (fresh
        # query) or the first partitions() call (restart replay):
        # lets latestOffset pace batches to max_versions each
        # (maxVersionsPerTrigger).  Best-effort like Delta's
        # maxFilesPerTrigger — only the first post-RESTART batch is
        # unpaced, because the engine asks for latestOffset before the
        # reader can learn the checkpointed position (pacing from a
        # guess below it would plan a backwards span).
        self._planned: int | None = None

    # -- manifest access (driver-side, plain JSON — no Spark jobs) ----

    def _manifest(self, version: int) -> dict:
        p = os.path.join(self._path, "_manifests", f"v{version}.json")
        try:
            with open(p) as fh:
                return json.load(fh)
        except FileNotFoundError:
            raise ChangeCommitError(
                f"manifest v{version} of {self._path!r} is expired — "
                "the stream's offset predates the retention window "
                "(expire_snapshots keep_last). Re-bootstrap with a new "
                "checkpoint and startingVersion."
            ) from None

    def _current(self) -> int:
        p = os.path.join(self._path, "_manifests", "CURRENT")
        if not os.path.exists(p):
            return 0
        with open(p) as fh:
            return int(fh.read().strip())

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
        if self._max_versions is not None and self._planned is not None:
            cur = min(cur, self._planned + self._max_versions)
        return {"version": cur}

    def partitions(self, start: dict, end: dict):
        v0, v1 = int(start["version"]), int(end["version"])
        self._planned = max(self._planned or 0, v1)
        parts: list[_FilePartition] = []
        prev = self._manifest(v0) if v0 > 0 else {"files": []}
        for v in range(v0 + 1, v1 + 1):
            cur = self._manifest(v)
            prev_sigs = {_dv_sig(e) for e in prev["files"]}
            cur_sigs = {_dv_sig(e) for e in cur["files"]}
            removed = prev_sigs - cur_sigs
            added = [e for e in cur["files"] if _dv_sig(e) not in prev_sigs]
            prev = cur
            if removed:
                if self._skip_changes:
                    continue
                raise ChangeCommitError(
                    f"commit v{v} of {self._path!r} removed/rewrote "
                    f"{len(removed)} file(s) — the span is not append-"
                    "only. Set skipChangeCommits=true or consume the "
                    "change feed (sources/feed.py)."
                )
            parts += [
                _FilePartition(
                    os.path.join(self._path, e["name"]),
                    self._schema_json,
                    commit_version=v,
                )
                for e in added
            ]
        return parts or [_FilePartition("", "")]

    def read(self, partition: _FilePartition):
        # executor-side: one parquet file -> Arrow RecordBatches
        if not partition.file_path:
            return iter(())
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path)
        if partition.schema_json:
            # align to the DECLARED schema: null-backfill columns this
            # (pre-evolution) file lacks, drop extras, and cast to the
            # exact Arrow types — Spark writes INT96 timestamps by
            # default, which pyarrow reads as timestamp[ns] while the
            # data source API only accepts [us]
            import pyarrow as pa
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType

            spark_schema = StructType.fromJson(
                json.loads(partition.schema_json)
            )
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
                if field.name in have:
                    arrays.append(
                        table.column(field.name).cast(field.type)
                    )
                else:
                    arrays.append(pa.nulls(table.num_rows, field.type))
            if add_version:
                arrays.append(
                    pa.array(
                        [partition.commit_version] * table.num_rows,
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


class _FileCommit(WriterCommitMessage):
    def __init__(self, name: str | None):
        self.name = name


class _SnapshotStreamWriter(DataSourceStreamWriter):
    """Native streaming SINK: each micro-batch lands as ONE append
    commit on the snapshot table.

    - ``write`` (executors): each task's rows become one immutable
      ``data-*.parquet`` written DIRECTLY into the table dir via
      pyarrow (invisible until a manifest references it — the same
      publish-then-commit shape the batch writers use); the file name
      is the commit message.
    - ``commit`` (driver): footer stats + blooms for the new files,
      then one manifest commit carrying a ``(txnAppId, batchId)``
      marker — a replayed micro-batch (failure before the streaming
      checkpoint recorded the batch) finds its marker and SKIPS, so
      the sink is exactly-once end-to-end, the same rule
      ``run_streaming_cdc`` applies through foreachBatch.
    - ``abort`` (driver): deletes the published-but-uncommitted files
      (they were never visible; GC would also collect them).
    """

    def __init__(self, path: str, schema: StructType, txn_app: str):
        self._path = path
        self._schema_json = schema.json()
        self._txn_app = txn_app

    # rows per Arrow chunk flushed into the task's parquet file: bounds
    # executor memory at O(chunk), not O(partition)
    WRITE_CHUNK_ROWS = 65_536

    def write(self, iterator) -> _FileCommit:
        import itertools
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType as _St

        schema = _St.fromJson(json.loads(self._schema_json))
        target = to_arrow_schema(schema)
        name = f"data-sink-{_uuid.uuid4().hex[:16]}.parquet"
        full = os.path.join(self._path, name)
        writer = None
        try:
            while True:
                chunk = list(
                    itertools.islice(iterator, self.WRITE_CHUNK_ROWS)
                )
                if not chunk:
                    break
                table = pa.Table.from_pylist(
                    [r.asDict(recursive=True) for r in chunk],
                    schema=target,
                )
                if writer is None:
                    writer = pq.ParquetWriter(full, target)
                writer.write_table(table)
        finally:
            if writer is not None:
                writer.close()
        if writer is None:
            return _FileCommit(None)
        return _FileCommit(name)

    def commit(self, messages, batchId: int) -> None:
        from .snapshots import (
            CommitConflict,
            COMMIT_RETRIES,
            _build_bloom_sidecar,
            _check_batch_schema,
            _commit,
            _file_stats,
            _fs,
            _manifest_schema,
            _txn_already_applied,
            read_manifest,
        )
        from pyspark.sql.types import StructType as _St

        names = [m.name for m in messages if m is not None and m.name]
        f = _fs(None)
        if not names:
            # every row of the micro-batch was filtered out: committing
            # would only bump the version chain (snap_append's
            # empty-batch rule); skipping is replay-safe — an empty
            # batch replayed appends nothing either way
            return
        m0 = read_manifest(self._path)
        if _txn_already_applied(m0, self._txn_app, batchId):
            for n in names:  # replayed batch: drop the duplicates
                if f.exists(os.path.join(self._path, n)):
                    f.remove(os.path.join(self._path, n))
            return
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
        # stats + blooms are a pure function of the immutable files:
        # compute ONCE, not per commit-race retry
        entries = []
        for n in names:
            e = {"name": n}
            e.update(
                _file_stats(os.path.join(self._path, n), m0["stats_cols"])
            )
            entries.append(e)
        _build_bloom_sidecar(self._path, entries, m0["stats_cols"], None)

        m = m0
        for _attempt in range(COMMIT_RETRIES):
            if _txn_already_applied(m, self._txn_app, batchId):
                for n in names:
                    if f.exists(os.path.join(self._path, n)):
                        f.remove(os.path.join(self._path, n))
                return
            txns = dict(m.get("txns", {}))
            txns[self._txn_app] = int(batchId)
            try:
                _commit(
                    self._path,
                    m["files"] + entries,
                    m["stats_cols"],
                    base_version=m["version"],
                    schema_json=m.get("schema"),
                    txns=txns,
                    commit_info={
                        "op": "stream_sink",
                        "added": len(entries),
                        "txn": {"app": self._txn_app, "batch": int(batchId)},
                    },
                )
                return
            except CommitConflict:
                m = read_manifest(self._path)
                continue
        raise CommitConflict(
            f"stream sink lost the commit race {COMMIT_RETRIES} times "
            f"at {self._path!r}"
        )

    def abort(self, messages, batchId: int) -> None:
        from .snapshots import _fs

        f = _fs(None)
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
        return p

    def schema(self) -> StructType:
        path = self._path()
        cur_file = os.path.join(path, "_manifests", "CURRENT")
        with open(cur_file) as fh:
            v = int(fh.read().strip())
        with open(
            os.path.join(path, "_manifests", f"v{v}.json")
        ) as fh:
            m = json.load(fh)
        if not m.get("schema"):
            raise ValueError(
                "snapshot_table source needs a manifest-recorded schema"
            )
        schema = StructType.fromJson(json.loads(m["schema"]))
        if str(self.options.get("withcommitversion", "false")).lower() in (
            "true",
            "1",
        ):
            from pyspark.sql.types import LongType, StructField

            schema = StructType(
                list(schema.fields)
                + [StructField("_commit_version", LongType())]
            )
        return schema

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        starting = int(self.options.get("startingversion", 0))
        skip = str(
            self.options.get("skipchangecommits", "false")
        ).lower() in ("true", "1")
        mv = self.options.get("maxversionspertrigger")
        max_versions = None
        if mv:
            max_versions = int(mv)
            if max_versions <= 0:
                raise ValueError(
                    f"maxVersionsPerTrigger must be positive, got {mv!r} "
                    "(0 would freeze the offset and stall the stream)"
                )
        return _SnapshotStreamReader(
            self._path(),
            starting,
            skip,
            schema.json(),
            max_versions=max_versions,
            with_commit_version=str(
                self.options.get("withcommitversion", "false")
            ).lower()
            in ("true", "1"),
        )

    def streamWriter(self, schema: StructType, overwrite: bool):
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
        return _SnapshotStreamWriter(self._path(), schema, txn_app)
