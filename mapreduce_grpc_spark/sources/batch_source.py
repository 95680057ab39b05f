"""Batch DataSource surface for snapshot tables: the format-string
integration contract.

::

    spark.dataSource.register(SnapshotTableStreamSource)
    df = spark.read.format("snapshot_table").option("path", p).load()
    df.write.format("snapshot_table").option("path", p) \
        .mode("append").save()

The reference's tables are write-once text buckets a job reads by path
(/root/reference/src/worker.cc); here the same "hand a path to any
job" contract carries the full snapshot-table semantics — versioned
reads, deletion-vector masking, manifest-level file pruning — without
importing the package:

- **reader**: plans file splits from the MANIFEST (never a directory
  listing), honors ``versionAsOf`` time travel, applies deletion
  vectors in the Arrow path, and prunes files via ``pushFilters`` —
  translated leaf predicates skip files whose footer stats/blooms
  prove no match, while every filter is also returned to Spark so the
  exact row-level filter still runs (pruning stays advisory, the same
  two-layer contract as ``snap_scan``).
- **writer**: each task streams its Arrow batches into one immutable
  ``data-*.parquet`` (the streaming sink's write path, shared below);
  the driver commit computes footer stats + blooms, enforces CHECK
  constraints session-free (DuckDB over the written files — the batch
  commit runs in a Python worker with no SparkSession, like the sink),
  and claims the next version under the same OCC retry loop as every
  other mutator.  ``mode("append")`` adds files; ``mode("overwrite")``
  replaces the table's file set in one commit; appending to a missing
  table creates it (``statsCols`` option seeds the pruning columns).

At 100 TB the reader's scheduling cost is O(matching files) — manifest
pruning happens before Spark sees a single task — and the writer's
commit is O(batch files), independent of table size (delta commit
records, snapshots.py manifest-scale block).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)

# openCost binning shared with the streaming reader: small files share
# a split, big files get their own
OPEN_COST_BYTES = 4 * 1024 * 1024
PARTITION_TARGET_BYTES = 128 * 1024 * 1024


def write_arrow_parquet(
    path: str,
    schema_json: str,
    iterator,
    cm: dict | None = None,
    pspec: list[dict] | None = None,
) -> str | None:
    """One task's Arrow batches -> one immutable ``data-*.parquet``
    inside the table dir (invisible until a manifest references it).
    Shared by the streaming sink and the batch writer.  Returns the
    file name, or None when the task had zero rows.

    ``cm`` is the table's logical->physical column mapping: incoming
    batches carry LOGICAL names, the bytes land under the frozen
    PHYSICAL names (snapshots.py column-mapping block).

    On a partitioned table (``pspec``, sources/partition.py) each
    batch grows the derived partition-value columns (pandas twin of
    the Spark expressions) and the file is sorted by the tuple, so
    row-group ranges stay tight even though an executor task cannot
    repartition — the library write path's clustering, minus the
    shuffle the data source API doesn't own."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType as _St

    schema = _St.fromJson(json.loads(schema_json))
    target = to_arrow_schema(schema)
    cm = cm or {}
    phys_target = pa.schema(
        [f.with_name(cm.get(f.name, f.name)) for f in target]
    )
    pnames: list[str] = []
    if pspec:
        from .partition import partition_pandas  # noqa: F401

        pnames = [s["name"] for s in pspec]
    name = f"data-sink-{_uuid.uuid4().hex[:16]}.parquet"
    full = os.path.join(path, name)
    writer = None
    try:
        for batch in iterator:
            table = (
                pa.Table.from_batches([batch])
                .select(target.names)
                .cast(target)
                .rename_columns(phys_target.names)
            )
            if pspec:
                table = _append_partition_values(table, pspec)
                table = table.sort_by([(n, "ascending") for n in pnames])
            if writer is None:
                writer = pq.ParquetWriter(full, table.schema)
            writer.write_table(table)
    finally:
        if writer is not None:
            writer.close()
    if writer is None:
        return None
    return name


def _append_partition_values(table, pspec: list[dict]):
    """Grow an Arrow table (PHYSICAL names) by its derived partition
    columns via the pandas twin — value-identical to the Spark
    expressions (pinned by tests/test_partitioning.py)."""
    import pyarrow as pa

    from .partition import partition_pandas

    src_cols = sorted({s["col"] for s in pspec})
    pdf = table.select(src_cols).to_pandas()
    pdf = partition_pandas(pspec, pdf)
    for s in pspec:
        vals = pdf[s["name"]]
        # the arrow type is always pinned explicitly: letting pyarrow
        # infer per batch would make an int64 batch containing nulls
        # (float64 after the pandas round-trip) come back as double,
        # and an all-null batch as the null type — the ParquetWriter's
        # schema is frozen from the FIRST batch, so a later batch with
        # a different inferred type fails the write, and a double _sgp
        # column would fall outside bloom tracking
        if s["t"] == "identity":
            typ = table.schema.field(s["col"]).type
        elif s["t"] == "truncate" and s["src_type"] == "string":
            typ = pa.string()
        elif s["t"] == "truncate":
            typ = pa.int64()
        else:
            typ = pa.int32()
        arr = pa.array(vals, type=typ, from_pandas=True)
        table = table.append_column(s["name"], arr)
    return table


def align_to_schema(table, schema_json: str, cm: dict | None = None):
    """Align a pyarrow table to the table's DECLARED schema:
    null-backfill columns a (pre-evolution) file lacks, drop extras,
    and cast to the exact Arrow types — Spark writes INT96 timestamps
    by default, which pyarrow reads as timestamp[ns] while the data
    source API only accepts [us].  Files store PHYSICAL column names;
    ``cm`` (logical->physical) keys the lookup so a renamed column's
    bytes surface under its logical name instead of null-backfilling."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    cm = cm or {}
    target = to_arrow_schema(StructType.fromJson(json.loads(schema_json)))
    have = set(table.schema.names)
    arrays = []
    for field in target:
        phys = cm.get(field.name, field.name)
        if phys in have:
            arrays.append(table.column(phys).cast(field.type))
        else:
            arrays.append(pa.nulls(table.num_rows, field.type))
    return pa.table(arrays, schema=target)


def translate_filters(filters) -> list[tuple]:
    """Map the data source API's leaf filters onto the manifest
    predicate grammar (``snap_scan`` tuples) — FILE PRUNING only.
    Unsupported shapes (nested columns, contains/endswith...) are
    simply not translated; since every filter is also handed back to
    Spark for exact row filtering, skipping one is always safe."""
    preds: list[tuple] = []
    for flt in filters:
        attr = getattr(flt, "attribute", None)
        if not attr or len(attr) != 1:
            continue
        col = attr[0]
        if isinstance(flt, EqualTo):
            preds.append((col, "=", flt.value))
        elif isinstance(flt, LessThan):
            preds.append((col, "<", flt.value))
        elif isinstance(flt, LessThanOrEqual):
            preds.append((col, "<=", flt.value))
        elif isinstance(flt, GreaterThan):
            preds.append((col, ">", flt.value))
        elif isinstance(flt, GreaterThanOrEqual):
            preds.append((col, ">=", flt.value))
        elif isinstance(flt, In):
            preds.append((col, "in", list(flt.value)))
        elif isinstance(flt, StringStartsWith) and isinstance(
            flt.value, str
        ):
            # Catalyst rewrites LIKE 'p%' to StartsWith: prefix
            # pruning via the [p, next_prefix(p)) stats range
            preds.append((col, "startswith", flt.value))
        elif isinstance(flt, IsNull):
            preds.append((col, "isnull"))
        elif isinstance(flt, IsNotNull):
            # Spark pushes IsNotNull with almost every filter — on a
            # stats column this skips all-null files for free
            preds.append((col, "notnull"))
    return preds


class _BatchFilePartition(InputPartition):
    # files: [(data_path, dv_path|None, row_id_base|None), ...] —
    # base None means either row ids are off for this read or the
    # file materialized its own _row_id column (align picks it up)
    def __init__(
        self,
        files: list[tuple[str, str | None]],
        schema_json: str,
        cm: dict | None = None,
    ):
        # files: (absolute parquet path, absolute dv sidecar path|None)
        self.files = files
        self.schema_json = schema_json
        # logical->physical column mapping of the read version
        self.cm = cm or {}


class SnapshotBatchReader(DataSourceReader):
    """Manifest-planned batch read with DV masking and advisory file
    pruning.  Runs read() executor-side over plain data bytes (the FS
    seam owns only the commit protocol)."""

    def __init__(
        self,
        path: str,
        schema_json: str,
        version: int | None,
        fs_spec: str | None,
        with_row_ids: bool = False,
    ):
        self._path = path
        self._schema_json = schema_json
        self._version = version
        self._fs_spec = fs_spec
        self._with_row_ids = with_row_ids
        self._preds: list[tuple] = []

    def pushFilters(self, filters):
        # plain function, NOT a generator: the translation must happen
        # even if the engine never iterates the returned filters
        self._preds = translate_filters(filters)
        # hand EVERY filter back: pruning is advisory, Spark keeps the
        # exact row-level evaluation (same contract as snap_scan)
        return list(filters)

    def partitions(self):
        from .snapshots import (
            _bloom_loader,
            _cm,
            load_fs,
            prune_manifest,
            read_manifest,
        )

        f = load_fs(self._fs_spec)
        m = read_manifest(self._path, self._version, f)
        cm = _cm(m)
        entries = m["files"]
        if self._preds:
            try:
                entries, _ = prune_manifest(
                    m, self._preds, _bloom_loader(self._path, f)
                )
            except Exception:
                entries = m["files"]  # unprunable value shapes: keep all
        if self._with_row_ids and not m.get("row_tracking"):
            raise ValueError(
                "withRowIds=true needs row tracking — "
                "snap_enable_row_tracking(path)"
            )
        files: list[tuple[str, str | None, int, int | None]] = []
        for e in entries:
            dv = e.get("dv")
            base = e.get("base") or self._path
            rid = None
            if self._with_row_ids and not e.get("row_id_col"):
                if "row_id_base" not in e:
                    raise ValueError(
                        f"withRowIds=true but entry {e['name']!r} has "
                        "no row-id state (version predates "
                        "enable_row_tracking?)"
                    )
                rid = int(e["row_id_base"])
            files.append(
                (
                    os.path.join(base, e["name"]),
                    # a dv recorded by a borrowing table (clone/branch)
                    # carries its own dir — see snapshots._dv_path
                    os.path.join(dv.get("base") or base, dv["file"])
                    if dv
                    else None,
                    int(e.get("bytes") or 0),
                    rid,
                )
            )
        parts: list[_BatchFilePartition] = []
        bin_files: list[tuple[str, str | None, int | None]] = []
        bin_cost = 0
        for p, dvp, b, rid in files:
            cost = max(b, OPEN_COST_BYTES)
            if bin_files and bin_cost + cost > PARTITION_TARGET_BYTES:
                parts.append(
                    _BatchFilePartition(bin_files, self._schema_json, cm)
                )
                bin_files, bin_cost = [], 0
            bin_files.append((p, dvp, rid))
            bin_cost += cost
        if bin_files:
            parts.append(
                _BatchFilePartition(bin_files, self._schema_json, cm)
            )
        return parts or [_BatchFilePartition([], self._schema_json, cm)]

    def read(self, partition: _BatchFilePartition):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        for file_path, dv_path, rid in partition.files:
            dv_pos = None
            if dv_path:
                dv = pq.read_table(dv_path, columns=["file_name", "pos"])
                fname = os.path.basename(file_path)
                mask = np.asarray(dv.column("file_name")) == fname
                dv_pos = np.sort(
                    np.asarray(dv.column("pos"))[mask].astype(np.int64)
                )
                if dv_pos.size == 0:
                    dv_pos = None
            pf = pq.ParquetFile(file_path)
            offset = 0
            for batch in pf.iter_batches():
                table = pa.Table.from_batches([batch])
                n = table.num_rows
                ids = None
                if rid is not None:
                    # synthesized ids track PHYSICAL positions: built
                    # before the DV mask, filtered alongside the rows
                    ids = pa.array(
                        rid + offset + np.arange(n, dtype=np.int64)
                    )
                if dv_pos is not None:
                    lo = np.searchsorted(dv_pos, offset)
                    hi = np.searchsorted(dv_pos, offset + n)
                    dead = dv_pos[lo:hi] - offset
                    if dead.size:
                        keep = np.ones(n, dtype=bool)
                        keep[dead] = False
                        keep_arr = pa.array(keep)
                        table = table.filter(keep_arr)
                        if ids is not None:
                            ids = ids.filter(keep_arr)
                offset += n
                if table.num_rows:
                    aligned = align_to_schema(
                        table, partition.schema_json, partition.cm
                    )
                    if ids is not None:
                        # fresh file: replace the null-backfilled
                        # _row_id column (materialized files got the
                        # real column from align itself)
                        i = aligned.schema.get_field_index("_row_id")
                        aligned = aligned.set_column(
                            i, pa.field("_row_id", pa.int64()), ids
                        )
                    yield from aligned.to_batches()


class _BatchFileCommit(WriterCommitMessage):
    def __init__(self, name: str | None):
        self.name = name


class SnapshotBatchWriter(DataSourceArrowWriter):
    """Batch write path: publish-then-commit, OCC, session-free
    constraint enforcement — one visible version per save()."""

    def __init__(
        self,
        path: str,
        schema,
        overwrite: bool,
        fs_spec: str | None,
        stats_cols: list[str],
        partition_by: list[str] | None = None,
    ):
        self._path = path
        self._schema_json = schema.json()
        self._overwrite = overwrite
        self._fs_spec = fs_spec
        self._stats_cols = stats_cols
        # capture the table's logical->physical column mapping ONCE,
        # driver-side at plan time: write tasks land bytes under the
        # frozen physical names; commit() re-checks the mapping didn't
        # change underneath (a concurrent rename) before publishing
        from .snapshots import _cm, _pspec, load_fs, read_manifest

        try:
            m = read_manifest(path, fs=load_fs(fs_spec))
            self._cm = _cm(m)
            self._pspec = _pspec(m)
            exists = True
        except FileNotFoundError:
            self._cm = {}
            self._pspec = []
            exists = False
        self._create_pspec: list[dict] = []
        if partition_by:
            from .partition import parse_partition_spec

            want = parse_partition_spec(partition_by, schema)
            if exists:
                # idempotent scripts keep the option set: accept an
                # option matching the live spec, refuse divergence
                # (silently writing a different layout would be the
                # worst outcome — unpruned forever, no error)
                have = [
                    (s["t"], s["col"], s["n"]) for s in self._pspec
                ]
                asked = [
                    (
                        s["t"],
                        self._cm.get(s["col"], s["col"]),
                        s["n"],
                    )
                    for s in want
                ]
                if have != asked:
                    raise ValueError(
                        f"snapshot_table writer: partitionBy option "
                        f"{asked} does not match the table's declared "
                        f"spec {have}; evolve it with "
                        "snap_set_partition_spec instead"
                    )
            else:
                self._pspec = want
                self._create_pspec = want

    def write(self, iterator) -> _BatchFileCommit:
        os.makedirs(self._path, exist_ok=True)
        return _BatchFileCommit(
            write_arrow_parquet(
                self._path, self._schema_json, iterator, self._cm,
                self._pspec,
            )
        )

    def commit(self, messages):
        from .snapshots import (
            COMMIT_RETRIES,
            CommitConflict,
            _build_bloom_sidecar,
            _check_batch_schema,
            _commit,
            _enforce_constraints_files,
            _file_stats,
            _manifest_schema,
            current_version,
            load_fs,
            read_manifest,
        )
        from pyspark.sql.types import StructType as _St

        names = [m.name for m in messages if m is not None and m.name]
        f = load_fs(self._fs_spec)
        exists = current_version(self._path, f) != 0
        if not exists:
            # CREATE: first save() on a fresh path (either mode) — the
            # manifest seeds stats/pruning columns from the option
            if not names and not self._overwrite:
                return  # nothing written, nothing to create
            create_stats = list(self._stats_cols) + [
                sp["name"] for sp in self._create_pspec
            ]
            entries = []
            for n in names:
                e = {"name": n}
                e.update(
                    _file_stats(
                        os.path.join(self._path, n), create_stats
                    )
                )
                entries.append(e)
            _build_bloom_sidecar(self._path, entries, create_stats, f)
            try:
                _commit(
                    self._path,
                    entries,
                    self._stats_cols,
                    base_version=0,
                    schema_json=self._schema_json,
                    adds=entries,
                    removes=[],
                    commit_info={
                        "op": "batch_create", "added": len(entries)
                    },
                    fs=f,
                    carry=(
                        {
                            "partition_spec": self._create_pspec,
                            "partition_field_seq": len(
                                self._create_pspec
                            ),
                        }
                        if self._create_pspec
                        else None
                    ),
                )
                return
            except CommitConflict:
                # two concurrent first-writers (or a create racing
                # snap_init): the exists-check above was a TOCTOU probe,
                # not a claim — the loser falls through and retries as
                # an append/overwrite against the winner's v1 (schema
                # checked against the winner's manifest below)
                pass
        m0 = read_manifest(self._path, fs=f)
        from .snapshots import _cm as _cm_of
        from .snapshots import _pspec as _pspec_of

        if _cm_of(m0) != self._cm:
            # the table's column mapping changed between plan time (the
            # tasks wrote bytes under the OLD physical names) and this
            # commit — publishing would mis-name columns; drop the
            # never-visible files and fail loudly for a retry
            for n in names:
                if f.exists(os.path.join(self._path, n)):
                    f.remove(os.path.join(self._path, n))
            raise CommitConflict(
                f"snapshot_table batch writer: column mapping of "
                f"{self._path!r} changed during the write (a concurrent "
                "rename/drop); re-run the save()"
            )
        if _pspec_of(m0) != self._pspec:
            # same shape of guard for the partition spec: the written
            # files' derived _sgp_<id> columns/stats were computed under
            # THIS writer's spec.  Two racing first-writers with
            # divergent partitionBy both seed field ids at 0, so the
            # loser's _sgp_0 stats could mean days(ts) while the
            # winner's manifest binds _sgp_0 to bucket(16, user_id) —
            # later scans would derive predicates under the winner's
            # transform, probe the mismatched stats, and WRONGLY PRUNE
            # these files (silent row loss).  Refuse and make the
            # caller re-run under the live spec.
            for n in names:
                if f.exists(os.path.join(self._path, n)):
                    f.remove(os.path.join(self._path, n))
            raise CommitConflict(
                f"snapshot_table batch writer: partition spec of "
                f"{self._path!r} changed during the write (a create "
                "race with a different partitionBy, or a concurrent "
                "spec evolution); re-run the save()"
            )
        if m0.get("identity"):
            # identity values are allocator-assigned on snap_append;
            # a DataSource write can't reserve a range — refuse loudly
            for n in names:
                if f.exists(os.path.join(self._path, n)):
                    f.remove(os.path.join(self._path, n))
            raise ValueError(
                f"snapshot_table batch writer: {self._path!r} declares"
                f" IDENTITY column(s) {sorted(m0['identity'])} — write"
                " via snap_append, which assigns the values"
            )
        target_schema = _manifest_schema(m0)
        if target_schema is not None:
            _check_batch_schema(
                target_schema,
                _St.fromJson(json.loads(self._schema_json)),
                set(),
                False,
                "snapshot_table batch writer",
            )
        if not names and not self._overwrite:
            return  # empty append: version bump would carry no change

        def _validate(cons: dict) -> None:
            if not cons or not names:
                return
            # session-free like the streaming sink: this commit runs in
            # a Python worker with no SparkSession
            try:
                _enforce_constraints_files(
                    [os.path.join(self._path, n) for n in names],
                    cons,
                    "batch_write",
                    self._cm,
                )
            except Exception:
                for n in names:
                    if f.exists(os.path.join(self._path, n)):
                        f.remove(os.path.join(self._path, n))
                raise

        # generated columns validate like CHECK constraints (the
        # synthetic IS-NOT-DISTINCT-FROM checks): the batch writer has
        # no fill path — a DataSource batch must SUPPLY generated
        # values, and divergent ones must not commit
        from .snapshots import _generated_checks

        validated_for = {
            **(m0.get("constraints") or {}), **_generated_checks(m0)
        }
        _validate(validated_for)
        # on a partitioned table the written files carry derived
        # partition-value columns: track their footer stats + blooms so
        # partition pruning covers data-source-written files too
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
        op = "batch_overwrite" if self._overwrite else "batch_append"
        for _attempt in range(COMMIT_RETRIES):
            if _cm_of(m) != self._cm:
                # same guard as the pre-loop check, re-applied per
                # retry: a rename winning a commit race must not let
                # old-physical-named files publish
                for n in names:
                    if f.exists(os.path.join(self._path, n)):
                        f.remove(os.path.join(self._path, n))
                raise CommitConflict(
                    f"snapshot_table batch writer: column mapping of "
                    f"{self._path!r} changed during the commit retries "
                    "(a concurrent rename/drop); re-run the save()"
                )
            if _pspec_of(m) != self._pspec:
                # per-retry twin of the pre-loop spec guard: a spec
                # evolution winning a commit race must not let files
                # with old-spec-derived stats publish under it
                for n in names:
                    if f.exists(os.path.join(self._path, n)):
                        f.remove(os.path.join(self._path, n))
                raise CommitConflict(
                    f"snapshot_table batch writer: partition spec of "
                    f"{self._path!r} changed during the commit retries "
                    "(a concurrent spec evolution); re-run the save()"
                )
            cons = {
                **(m.get("constraints") or {}), **_generated_checks(m)
            }
            if cons != validated_for:
                _validate(cons)
                validated_for = cons
            files = entries if self._overwrite else m["files"] + entries
            try:
                _commit(
                    self._path,
                    files,
                    m["stats_cols"],
                    base_version=m["version"],
                    schema_json=m.get("schema"),
                    txns=dict(m.get("txns", {})),
                    commit_info={"op": op, "added": len(entries)},
                    fs=f,
                    carry=m,
                    adds=entries,
                    removes=(
                        [e["name"] for e in m["files"]]
                        if self._overwrite
                        else []
                    ),
                )
                return
            except CommitConflict:
                m = read_manifest(self._path, fs=f)
                continue
        raise CommitConflict(
            f"batch writer lost the commit race {COMMIT_RETRIES} times "
            f"at {self._path!r}"
        )

    def abort(self, messages):
        from .snapshots import load_fs

        f = load_fs(self._fs_spec)
        for m in messages:
            if m is not None and m.name:
                p = os.path.join(self._path, m.name)
                if f.exists(p):
                    f.remove(p)
