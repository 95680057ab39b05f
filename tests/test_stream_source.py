"""snapshot_table Structured Streaming source (Spark 4 Python Data
Source API): append replay, checkpoint-restart exactly-once, change-
commit refusal/skip semantics, and snap_append itself."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources.snapshots import (
    merge_upsert_cow,
    read_manifest,
    snap_append,
    snap_init,
    snap_read,
)
from mapreduce_grpc_spark.sources.stream_source import (
    SnapshotTableStreamSource,
)


# every test in this module runs under BOTH commit-protocol FS
# backends (POSIX + object-store semantics) — see conftest.snapshot_fs
pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _mk(spark, path, rows):
    df = spark.createDataFrame(rows, "k bigint, v string")
    snap_init(spark, df, path, stats_cols=["k"])


# the active FS backend's module:Class spec — the data source runs in a
# separate Python worker, so the test process's default FS is invisible
# to it and must travel as the fsImpl option
_ACTIVE_FS = {"spec": None}


@pytest.fixture(autouse=True)
def _fs_spec(snapshot_fs):
    _ACTIVE_FS["spec"] = snapshot_fs.spec
    yield
    _ACTIVE_FS["spec"] = None


def _read_stream(spark, path, **opts):
    spark.dataSource.register(SnapshotTableStreamSource)
    r = spark.readStream.format("snapshot_table").option("path", path)
    if _ACTIVE_FS["spec"]:
        r = r.option("fsImpl", _ACTIVE_FS["spec"])
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _drain(spark, df, checkpoint):
    """Run one availableNow pass into an in-memory list via
    foreachBatch; returns the collected (k, v) tuples."""
    got: list[tuple] = []

    def sink(batch_df, _bid):
        got.extend((r.k, r.v) for r in batch_df.collect())

    q = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    return got


# --- snap_append primitive -------------------------------------------


def test_snap_append_carries_everything_and_adds(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a"), (2, "b")])
    m1 = read_manifest(path)
    res = snap_append(
        spark,
        path,
        spark.createDataFrame([(3, "c")], "k bigint, v string").coalesce(1),
    )
    assert res["added"] >= 1 and res["carried"] == len(m1["files"])
    m2 = read_manifest(path)
    assert {e["name"] for e in m1["files"]} <= {e["name"] for e in m2["files"]}
    assert sorted((r.k, r.v) for r in snap_read(spark, path).collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    # empty append is a version-chain no-op
    v = res["version"]
    res2 = snap_append(
        spark, path, spark.createDataFrame([], "k bigint, v string")
    )
    assert res2.get("skipped") and res2["version"] == v
    # txn idempotence
    b = spark.createDataFrame([(4, "d")], "k bigint, v string")
    snap_append(spark, path, b, txn_app="ing", txn_batch=1)
    r3 = snap_append(spark, path, b, txn_app="ing", txn_batch=1)
    assert r3.get("skipped")
    assert snap_read(spark, path).filter("k = 4").count() == 1


def test_snap_append_rejects_schema_drift(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a")])
    bad = spark.createDataFrame([(2, 7)], "k bigint, v bigint")
    with pytest.raises(ValueError, match="types differ"):
        snap_append(spark, path, bad)


# --- the streaming source --------------------------------------------


def test_stream_replays_appends_exactly(spark, tmp_path):
    path = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    _mk(spark, path, [(1, "a"), (2, "b")])
    for i in range(3, 6):
        snap_append(
            spark,
            path,
            spark.createDataFrame([(i, f"v{i}")], "k bigint, v string"),
        )
    got = _drain(spark, _read_stream(spark, path), ck)
    expect = [(1, "a"), (2, "b")] + [(i, f"v{i}") for i in range(3, 6)]
    assert sorted(got) == sorted(expect)


def test_stream_checkpoint_restart_is_exactly_once(spark, tmp_path):
    path = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    _mk(spark, path, [(1, "a")])
    got1 = _drain(spark, _read_stream(spark, path), ck)
    assert sorted(got1) == [(1, "a")]
    # new appends AFTER the first drain; restart from the same
    # checkpoint must deliver ONLY them (no replay of v1)
    snap_append(
        spark,
        path,
        spark.createDataFrame([(2, "b"), (3, "c")], "k bigint, v string"),
    )
    got2 = _drain(spark, _read_stream(spark, path), ck)
    assert sorted(got2) == [(2, "b"), (3, "c")]
    # drained: a third run delivers nothing
    got3 = _drain(spark, _read_stream(spark, path), ck)
    assert got3 == []


def test_stream_starting_version_skips_history(spark, tmp_path):
    """startingVersion is INCLUSIVE (Delta's semantics): N means
    version N's changes are in the first batch; 'latest' streams only
    commits made after query start."""
    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a")])
    snap_append(
        spark, path, spark.createDataFrame([(2, "b")], "k bigint, v string")
    )
    snap_append(
        spark, path, spark.createDataFrame([(3, "c")], "k bigint, v string")
    )
    got = _drain(
        spark,
        _read_stream(spark, path, startingVersion="2"),
        str(tmp_path / "ck2"),
    )
    assert sorted(got) == [(2, "b"), (3, "c")]
    got3 = _drain(
        spark,
        _read_stream(spark, path, startingVersion="3"),
        str(tmp_path / "ck3"),
    )
    assert sorted(got3) == [(3, "c")]
    gotl = _drain(
        spark,
        _read_stream(spark, path, startingVersion="latest"),
        str(tmp_path / "ckl"),
    )
    assert gotl == []


def test_stream_starting_timestamp(spark, tmp_path):
    """startingTimestamp streams every commit at-or-after the instant
    (Delta parity, adjusted-monotone commit clock); a future instant
    streams only commits yet to land; exclusive with
    startingVersion."""
    from mapreduce_grpc_spark.sources.snapshots import snapshot_audit

    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a")])
    snap_append(
        spark, path, spark.createDataFrame([(2, "b")], "k bigint, v string")
    )
    snap_append(
        spark, path, spark.createDataFrame([(3, "c")], "k bigint, v string")
    )
    ts = [a["ts"] for a in snapshot_audit(path)]
    # exactly v2's stamp: v2 and v3 stream (at-or-after)
    got = _drain(
        spark,
        _read_stream(spark, path, startingTimestamp=repr(ts[1])),
        str(tmp_path / "ck_t2"),
    )
    assert sorted(got) == [(2, "b"), (3, "c")]
    # mid-gap instant: only v3
    got3 = _drain(
        spark,
        _read_stream(
            spark, path, startingTimestamp=repr((ts[1] + ts[2]) / 2)
        ),
        str(tmp_path / "ck_t3"),
    )
    assert sorted(got3) == [(3, "c")]
    # a future instant: nothing yet — then a new commit streams
    ckf = str(tmp_path / "ck_tf")
    stream_f = _read_stream(
        spark, path, startingTimestamp=repr(ts[2] + 3600)
    )
    assert _drain(spark, stream_f, ckf) == []
    snap_append(
        spark, path, spark.createDataFrame([(4, "d")], "k bigint, v string")
    )
    got4 = _drain(
        spark,
        _read_stream(spark, path, startingTimestamp=repr(ts[2] + 3600)),
        ckf,
    )
    assert sorted(got4) == [(4, "d")]
    with pytest.raises(Exception, match="not both"):
        _drain(
            spark,
            _read_stream(
                spark, path,
                startingVersion="2", startingTimestamp=repr(ts[1]),
            ),
            str(tmp_path / "ck_both"),
        )


def test_stream_refuses_change_commits_unless_skipped(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a"), (2, "b")])
    snap_append(
        spark, path, spark.createDataFrame([(3, "c")], "k bigint, v string")
    )
    # a MERGE rewrites a file -> the span is no longer append-only
    merge_upsert_cow(
        spark,
        path,
        spark.createDataFrame([(1, "A!")], "k bigint, v string"),
        keys=["k"],
    )
    snap_append(
        spark, path, spark.createDataFrame([(4, "d")], "k bigint, v string")
    )

    with pytest.raises(Exception, match="append-only|ChangeCommit"):
        _drain(
            spark,
            _read_stream(spark, path),
            str(tmp_path / "ck_fail"),
        )

    # skipChangeCommits: the merge commit's rows are skipped, every
    # append commit still arrives
    got = _drain(
        spark,
        _read_stream(spark, path, skipChangeCommits="true"),
        str(tmp_path / "ck_skip"),
    )
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_stream_then_aggregate_end_to_end(spark, tmp_path):
    """The source composes with ordinary streaming transforms: a
    grouped count over the streamed rows equals the batch answer."""
    path = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    _mk(spark, path, [(i, f"g{i % 3}") for i in range(30)])
    snap_append(
        spark,
        path,
        spark.createDataFrame(
            [(100 + i, f"g{i % 3}") for i in range(12)], "k bigint, v string"
        ),
    )
    stream = _read_stream(spark, path).groupBy("v").agg(
        F.count(F.lit(1)).alias("n")
    )
    got: dict = {}

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            got[r.v] = r.n

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = {
        r.v: r.n
        for r in snap_read(spark, path)
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == batch


def test_stream_source_timestamp_and_date_columns(spark, tmp_path):
    """Arrow round-trip of the awkward types: timestamp and date
    columns stream back exactly as the batch read sees them."""
    path = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    df = spark.sql(
        "SELECT id AS k, timestamp'2026-01-02 03:04:05.123456' + "
        "make_interval(0, 0, 0, 0, 0, 0, id) AS ts, "
        "date'2026-03-04' + CAST(id AS INT) AS d, "
        "CAST(id AS DOUBLE) / 7 AS x FROM range(10)"
    )
    snap_init(spark, df, path, stats_cols=["k"])
    snap_append(
        spark,
        path,
        spark.sql(
            "SELECT id + 100 AS k, timestamp'2027-06-07 08:09:10' AS ts, "
            "date'2027-01-01' AS d, CAST(1.5 AS DOUBLE) AS x FROM range(2)"
        ),
    )
    got = _drain_rows(
        spark, _read_stream(spark, path).selectExpr("k", "ts", "d", "x"), ck
    )
    batch = snap_read(spark, path).selectExpr("k", "ts", "d", "x").collect()
    key = lambda r: (r.k, r.ts, r.d, r.x)
    assert sorted(map(key, got)) == sorted(map(key, batch))


def _drain_rows(spark, df, checkpoint):
    rows = []

    def sink(batch_df, _bid):
        rows.extend(batch_df.collect())

    q = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def test_stream_null_backfills_pre_evolution_files(spark, tmp_path):
    """Files appended BEFORE a schema evolution stream back with the
    declared (current) schema, missing columns null — same contract as
    snap_read."""
    path = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    _mk(spark, path, [(1, "a")])
    snap_append(
        spark,
        path,
        spark.createDataFrame(
            [(2, "b", 9)], "k bigint, v string, extra bigint"
        ),
        allow_schema_evolution=True,
    )
    rows = _drain_rows(spark, _read_stream(spark, path), ck)
    got = sorted((r.k, r.v, r.extra) for r in rows)
    assert got == [(1, "a", None), (2, "b", 9)]


def test_stream_max_versions_per_trigger_paces_steady_state(
    spark, tmp_path
):
    """maxVersionsPerTrigger=1: after the (unpaced) first batch, a
    multi-version backlog appended WHILE the query runs drains one
    version per micro-batch — the Delta maxFilesPerTrigger best-effort
    contract — and the union is exact."""
    import time as _time

    path = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    _mk(spark, path, [(1, "a")])
    batches: list[list] = []

    def sink(bdf, _bid):
        batches.append([(r.k, r.v) for r in bdf.collect()])

    q = (
        _read_stream(spark, path, maxVersionsPerTrigger="1")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline and not batches:
            _time.sleep(0.2)
        assert batches, "first batch never arrived"
        # backlog lands while the query is running
        for i in range(2, 6):
            snap_append(
                spark,
                path,
                spark.createDataFrame(
                    [(i, f"v{i}")], "k bigint, v string"
                ),
            )
        expect = [(1, "a")] + [(i, f"v{i}") for i in range(2, 6)]
        deadline = _time.time() + 120
        while _time.time() < deadline:
            if sum(len(b) for b in batches) >= len(expect):
                break
            _time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert sorted(t for b in batches for t in b) == expect
    # steady state: every batch after the first holds at most ONE
    # version's rows (1 row per append here)
    later = [b for b in batches[1:] if b]
    assert len(later) >= 4, f"backlog must drain in paced batches: {batches}"
    assert all(len(b) <= 1 for b in later), batches


def test_native_sink_table_to_table_pipeline(spark, tmp_path):
    """The full native loop: snapshot table --readStream--> transform
    --writeStream format=snapshot_table--> snapshot table, one append
    commit per micro-batch with txn markers; re-running the drained
    query appends nothing."""
    from mapreduce_grpc_spark.sources.snapshots import snapshot_audit

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    _mk(spark, src, [(i, f"g{i % 2}") for i in range(20)])
    snap_init(
        spark,
        spark.createDataFrame([], "k bigint, v string"),
        dst,
        stats_cols=["k"],
    )

    def run():
        q = (
            _read_stream(spark, src)
            .filter(F.col("k") >= 10)
            .writeStream.format("snapshot_table")
            .option("path", dst)
            .option("fsImpl", _ACTIVE_FS["spec"])
            .option("txnAppId", "pipe1")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = sorted((r.k, r.v) for r in snap_read(spark, dst).collect())
    assert got == [(i, f"g{i % 2}") for i in range(10, 20)]
    audit = snapshot_audit(dst)
    assert audit[-1]["commit_info"]["op"] == "stream_sink"
    assert audit[-1]["txns"].get("pipe1") is not None

    v = len(audit)
    run()  # drained: no new source versions -> no new dst commits
    assert len(snapshot_audit(dst)) == v
    # new source data flows through end-to-end
    snap_append(
        spark,
        src,
        spark.createDataFrame([(99, "gX")], "k bigint, v string"),
    )
    run()
    assert (99, "gX") in {
        (r.k, r.v) for r in snap_read(spark, dst).collect()
    }


def test_native_sink_replayed_batch_is_skipped(spark, tmp_path):
    """A micro-batch replay (same txn batchId) must not double-append:
    the marker skips the commit and the duplicate files are removed."""
    from mapreduce_grpc_spark.sources.snapshots import (
        read_manifest as _rm,
        snap_count,
    )
    from mapreduce_grpc_spark.sources.stream_source import (
        _FileCommit,
        _SnapshotStreamWriter,
    )

    dst = str(tmp_path / "dst")
    base = spark.createDataFrame([(1, "a")], "k bigint, v string")
    snap_init(spark, base, dst, stats_cols=["k"])
    w = _SnapshotStreamWriter(dst, base.schema, "app1")

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    def fake_file(rows):
        import uuid

        name = f"data-sink-{uuid.uuid4().hex[:16]}.parquet"
        pq.write_table(
            pa.Table.from_pylist(rows, schema=to_arrow_schema(base.schema)),
            os.path.join(dst, name),
        )
        return name

    n1 = fake_file([{"k": 2, "v": "b"}])
    w.commit([_FileCommit(n1)], batchId=7)
    assert snap_count(dst) == 2
    v = _rm(dst)["version"]
    # replay of batch 7 with freshly-written duplicate files
    n2 = fake_file([{"k": 2, "v": "b"}])
    w.commit([_FileCommit(n2)], batchId=7)
    assert snap_count(dst) == 2 and _rm(dst)["version"] == v
    assert not os.path.exists(os.path.join(dst, n2))


def test_native_sink_rejects_schema_drift_and_complete_mode(spark, tmp_path):
    from mapreduce_grpc_spark.sources.stream_source import (
        _FileCommit,
        _SnapshotStreamWriter,
    )

    dst = str(tmp_path / "dst")
    snap_init(
        spark,
        spark.createDataFrame([(1, "a")], "k bigint, v string"),
        dst,
        stats_cols=["k"],
    )
    import pyarrow as pa
    import pyarrow.parquet as pq
    import uuid as _uuid
    from pyspark.sql.pandas.types import to_arrow_schema

    drifted = spark.createDataFrame([(1, 2)], "k bigint, v bigint")
    w = _SnapshotStreamWriter(dst, drifted.schema, "app1")
    name = f"data-sink-{_uuid.uuid4().hex[:16]}.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            [{"k": 1, "v": 2}], schema=to_arrow_schema(drifted.schema)
        ),
        os.path.join(dst, name),
    )
    with pytest.raises(ValueError, match="types differ"):
        w.commit([_FileCommit(name)], batchId=0)
    # an all-filtered micro-batch is a version-chain no-op
    from mapreduce_grpc_spark.sources.snapshots import current_version

    v = current_version(dst)
    ok = _SnapshotStreamWriter(
        dst,
        spark.createDataFrame([], "k bigint, v string").schema,
        "app2",
    )
    ok.commit([_FileCommit(None)], batchId=0)
    assert current_version(dst) == v

    ds = SnapshotTableStreamSource(options={"path": dst})
    with pytest.raises(ValueError, match="append-only"):
        ds.streamWriter(drifted.schema, overwrite=True)


def test_stream_with_commit_version_provenance(spark, tmp_path):
    """withCommitVersion=true appends a `_commit_version` column naming
    the commit that ADDED each row's file — exact per version."""
    path = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    _mk(spark, path, [(1, "a")])
    snap_append(
        spark, path, spark.createDataFrame([(2, "b")], "k bigint, v string")
    )
    snap_append(
        spark, path, spark.createDataFrame([(3, "c")], "k bigint, v string")
    )
    rows = _drain_rows(
        spark, _read_stream(spark, path, withCommitVersion="true"), ck
    )
    got = sorted((r.k, r.v, r._commit_version) for r in rows)
    assert got == [(1, "a", 1), (2, "b", 2), (3, "c", 3)]
    # option off: no synthetic column
    rows2 = _drain_rows(
        spark, _read_stream(spark, path), str(tmp_path / "ck2")
    )
    assert "_commit_version" not in rows2[0].asDict()


def test_with_commit_version_rejects_physical_column(spark, tmp_path):
    """A table that PERSISTED a `_commit_version` column cannot also
    ask for the synthetic provenance column — loud error, not a
    duplicate field name."""
    path = str(tmp_path / "t")
    snap_init(
        spark,
        spark.createDataFrame([(1, 5)], "k bigint, _commit_version bigint"),
        path,
        stats_cols=["k"],
    )
    with pytest.raises(Exception, match="_commit_version"):
        _drain_rows(
            spark,
            _read_stream(spark, path, withCommitVersion="true"),
            str(tmp_path / "ck"),
        )


def test_byte_pacing_rounds_to_commit_boundaries(spark, tmp_path):
    """maxBytesPerTrigger: a tiny budget drains one commit per trigger;
    a budget sized to two commits' added bytes takes exactly two; a fat
    commit always lands whole (rounds UP to commit boundaries)."""
    from mapreduce_grpc_spark.sources.stream_source import (
        _SnapshotStreamReader,
    )
    from mapreduce_grpc_spark.sources.snapshots import read_manifest

    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a")])
    for i in range(2, 6):
        snap_append(
            spark,
            path,
            spark.createDataFrame(
                [(i, f"v{i}")], "k bigint, v string"
            ).coalesce(1),
        )
    schema_json = snap_read(spark, path).schema.json()

    def spans(max_bytes):
        r = _SnapshotStreamReader(
            path, 0, False, schema_json, max_bytes=max_bytes
        )
        r.initialOffset()
        out = []
        for _ in range(10):
            start = r._planned
            end = r.latestOffset()["version"]
            if end == start:
                break
            out.append((start, end))
            r.partitions({"version": start}, {"version": end})
        return out

    # 1-byte budget: every commit exceeds it, so each trigger still
    # takes exactly one commit (whole — never a partial commit)
    assert spans(1) == [(i, i + 1) for i in range(5)]
    # unbounded-ish budget: one catch-up batch
    assert spans(10**9) == [(0, 5)]
    # budget of exactly commits v1+v2's added bytes: multi-commit
    # batches whose boundaries mirror the documented pacing rule —
    # accumulate added bytes, admit while total stays <= budget, always
    # take at least one commit.  The expectation is SIMULATED from the
    # measured per-commit sizes rather than hardcoded: parquet file
    # bytes drift (a 1-byte footer-stat difference between identical-
    # shape commits was observed between environments), and what this
    # test pins is the rounding contract, not specific file sizes.
    added = {}
    prev: set = set()
    for v in range(1, 6):
        m = read_manifest(path, version=v)
        names = {e["name"] for e in m["files"]}
        added[v] = sum(
            e["bytes"] for e in m["files"] if e["name"] not in prev
        )
        prev = names

    def expected(budget):
        out, lo = [], 0
        while lo < 5:
            total, end = 0, lo
            for v in range(lo + 1, 6):
                b = added[v]
                if end > lo and total + b > budget:
                    break
                total += b
                end = v
                if total >= budget:
                    break
            out.append((lo, end))
            lo = end
        return out

    budget = added[1] + added[2]
    want = expected(budget)
    assert spans(budget) == want
    # the budget spans v1+v2 exactly, so the first batch MUST be (0, 2]
    # whatever the later commits' exact sizes are
    assert want[0] == (0, 2) and len(want) >= 3


def test_partition_binning_coalesces_small_files(spark, tmp_path):
    """openCost binning: 70 tiny files plan into
    ceil(70 / (target/openCost)) shared partitions, not 70 tasks — and
    the drained rows are still exact."""
    import math

    from mapreduce_grpc_spark.sources.stream_source import (
        OPEN_COST_BYTES,
        PARTITION_TARGET_BYTES,
        _SnapshotStreamReader,
    )

    path = str(tmp_path / "t")
    df = spark.range(70).selectExpr(
        "id AS k", "CAST(id AS STRING) AS v"
    ).repartition(70)
    snap_init(spark, df, path, stats_cols=["k"])
    # round-robin leaves some target partitions empty (no file written),
    # so pin the binning math to the ACTUAL file count
    n_files = len(read_manifest(path)["files"])
    per_bin = PARTITION_TARGET_BYTES // OPEN_COST_BYTES
    assert n_files > per_bin, "fixture must overflow one bin"
    schema_json = snap_read(spark, path).schema.json()
    r = _SnapshotStreamReader(path, 0, False, schema_json)
    parts = r.partitions({"version": 0}, {"version": 1})
    assert sum(len(p.files) for p in parts) == n_files
    assert len(parts) == math.ceil(n_files / per_bin)
    got = _drain(spark, _read_stream(spark, path), str(tmp_path / "ck"))
    assert sorted(got) == [(i, str(i)) for i in range(70)]


def test_streaming_table_pipeline_oracle_parity(spark, sf_dir):
    """table -> readStream -> filter -> writeStream -> table,
    hash-checked against the one-line SQL equivalent (same comparator
    as the driver).  Rotated INTO the 50-query contract in round 9, so
    it resolves from the contract registry now."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    name = "streaming_table_pipeline"
    df = registry.QUERIES[name](spark, sf_dir)
    assert_oracle_match(df, registry.ORACLES[name], sf_dir, name)


def test_native_sink_enforces_check_constraints(spark, tmp_path):
    """A constrained table stays clean through the streaming sink: a
    violating micro-batch fails BEFORE its manifest commit, its files
    are dropped, and the table is untouched."""
    from mapreduce_grpc_spark.sources.snapshots import (
        ConstraintViolation,
        read_manifest as _rm,
        snap_add_constraint,
        snap_count,
        snap_init,
    )
    from mapreduce_grpc_spark.sources.stream_source import (
        _FileCommit,
        _SnapshotStreamWriter,
    )

    dst = str(tmp_path / "dst")
    base = spark.createDataFrame([(1, "a")], "k bigint, v string")
    snap_init(spark, base, dst, stats_cols=["k"])
    snap_add_constraint(spark, dst, "k_pos", "k > 0")
    w = _SnapshotStreamWriter(dst, base.schema, "app1")

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    def fake_file(rows):
        import uuid

        name = f"data-sink-{uuid.uuid4().hex[:16]}.parquet"
        pq.write_table(
            pa.Table.from_pylist(rows, schema=to_arrow_schema(base.schema)),
            os.path.join(dst, name),
        )
        return name

    v0 = _rm(dst)["version"]
    bad = fake_file([{"k": -1, "v": "z"}])
    with pytest.raises(ConstraintViolation, match="k_pos"):
        w.commit([_FileCommit(bad)], batchId=1)
    assert _rm(dst)["version"] == v0
    assert snap_count(dst) == 1
    assert not os.path.exists(os.path.join(dst, bad))
    # a clean batch still lands, and the constraint rides the commit
    good = fake_file([{"k": 2, "v": "b"}])
    w.commit([_FileCommit(good)], batchId=2)
    assert snap_count(dst) == 2
    assert _rm(dst)["constraints"] == {"k_pos": "k > 0"}


def test_native_sink_constraint_end_to_end_streaming(spark, tmp_path):
    """The REAL streaming path for constraint enforcement: the sink's
    ``commit`` runs in a dedicated Python worker with NO SparkSession
    (pyspark's python_streaming_sink_runner), so validation must be
    session-free.  A violating micro-batch fails the query and leaves
    the table untouched; a clean stream into the same constrained
    table lands."""
    from mapreduce_grpc_spark.sources.snapshots import (
        snap_add_constraint,
        snap_count,
        snap_init,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk(spark, src, [(i - 5, f"g{i}") for i in range(10)])  # ks -5..4
    snap_init(
        spark,
        spark.createDataFrame([], "k bigint, v string"),
        dst,
        stats_cols=["k"],
    )
    snap_add_constraint(spark, dst, "k_pos", "k >= 0", validate=False)
    pre_existing = set(os.listdir(dst))

    def run(ck, flt):
        q = (
            _read_stream(spark, src)
            .filter(flt)
            .writeStream.format("snapshot_table")
            .option("path", dst)
            .option("fsImpl", _ACTIVE_FS["spec"])
            .option("txnAppId", f"c-{ck}")
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    # violating rows -> the query fails, nothing lands, no file leaks
    with pytest.raises(Exception, match="k_pos"):
        run("ck-bad", F.col("k") < 0)
    assert snap_count(dst) == 0
    leaked = [
        n for n in set(os.listdir(dst)) - pre_existing
        if n.startswith("data-") and n.endswith(".parquet")
    ]
    assert leaked == []
    # a clean stream into the same constrained table works
    run("ck-good", F.col("k") >= 0)
    assert snap_count(dst) == 5


def test_timestamp_as_of_resolved_once_per_instance(
    spark, tmp_path, monkeypatch
):
    """timestampAsOf is resolved to a version ONCE per DataSource
    instance: schema(), _column_mapping(), and reader() all plan
    against that same version, and a commit landing between their
    calls cannot shift what any of them sees (the narrow race ADVICE
    r11 flagged)."""
    from mapreduce_grpc_spark.sources import snapshots as S
    from mapreduce_grpc_spark.sources.stream_source import (
        SnapshotTableStreamSource,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, [(1, "a")])
    snap_append(
        spark, path, spark.createDataFrame([(2, "b")], "k bigint, v string")
    )
    ts = [a["ts"] for a in S.snapshot_audit(path)]

    calls = {"n": 0}
    real = S.version_at_timestamp

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(S, "version_at_timestamp", counting)
    ds = SnapshotTableStreamSource(
        options={"path": path, "timestampasof": repr(ts[1])}
    )
    v_first = ds._version_as_of()
    ds.schema()
    _, v_map = ds._column_mapping()
    assert ds._version_as_of() == v_first == v_map == 2
    assert calls["n"] == 1, "resolution must happen exactly once"
    # a commit landing after planning must not shift the plan — even a
    # clock-skewed one whose ADJUSTED time ties the queried instant
    # (an uncached re-resolution would now return 3)
    import json as _json

    raw = _json.loads(S._fs(None).read_text(S._manifest_path(path, 2)))
    raw.update(version=3, ts=ts[1] - 100.0, adds=[], removes=[])
    raw.pop("files", None)
    S._fs(None).create_exclusive(
        S._manifest_path(path, 3), _json.dumps(raw)
    )
    S._fs(None).replace_atomic(S._current_path(path), "3")
    assert ds._version_as_of() == 2
    assert S.version_at_timestamp(path, ts[1]) == 3  # fresh instance would


def test_starting_timestamp_on_commitless_table(spark, tmp_path):
    """startingTimestamp on a created-but-empty table (no commits yet)
    plans like startingVersion=0 — version_before_timestamp returns 0
    instead of crashing, so the stream picks up commits as they land."""
    import os as _os

    from mapreduce_grpc_spark.sources.snapshots import (
        version_before_timestamp,
    )

    path = str(tmp_path / "t")
    _os.makedirs(path, exist_ok=True)
    assert version_before_timestamp(path, 1.0) == 0
    assert version_before_timestamp(str(tmp_path / "absent"), 1.0) == 0
