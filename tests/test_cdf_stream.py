"""Streaming change-feed SOURCE (Delta's ``readChangeFeed`` streaming
mode): ``spark.readStream.format("snapshot_table")
.option("readChangeFeed", "true").option("keys", ...)`` streams
row-level deltas — ``_change_type`` in insert / delete /
update_preimage / update_postimage plus ``_commit_version`` — instead
of appended rows.

The held invariant, per the batch CDF contract it mirrors
(``snapshots.table_changes``): streamed feed == batch feed as a row
multiset, and folding either onto the starting state reproduces the
final table exactly.  Runs under BOTH commit-protocol FS backends."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources.snapshots import (
    apply_cdc_cow,
    delete_where_mor,
    snap_add_constraint,
    snap_init,
    snap_read,
    table_changes,
)
from mapreduce_grpc_spark.sources.stream_source import (
    SnapshotTableStreamSource,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")

_ACTIVE_FS = {"spec": None}


@pytest.fixture(autouse=True)
def _fs_spec(snapshot_fs):
    _ACTIVE_FS["spec"] = snapshot_fs.spec
    yield
    _ACTIVE_FS["spec"] = None


def _mk(spark, path, n=60, n_files=2):
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        .repartitionByRange(n_files, "k")
    )
    snap_init(spark, df, path, stats_cols=["k"])


def _cdf_stream(spark, path, **opts):
    spark.dataSource.register(SnapshotTableStreamSource)
    r = (
        spark.readStream.format("snapshot_table")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("keys", "k")
    )
    if _ACTIVE_FS["spec"]:
        r = r.option("fsImpl", _ACTIVE_FS["spec"])
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _drain(spark, df, checkpoint):
    """One availableNow pass; returns (rows, batch_count)."""
    got: list[tuple] = []
    batches: list[int] = []

    def sink(batch_df, bid):
        rows = [tuple(r) for r in batch_df.collect()]
        if rows:
            batches.append(bid)
        got.extend(rows)

    q = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    return got, len(batches)


def _mutate(spark, path):
    """Three change commits: CDC U/D/I, a second CDC touching the same
    keys again, and a DV-only MoR delete (a rewrite the feed must
    surface as deletes without any file being replaced)."""
    def cdc(rows):
        apply_cdc_cow(
            spark, path,
            spark.createDataFrame(rows, "k bigint, v string, _op string"),
            keys=["k"],
        )

    cdc(
        [(3, "u3a", "U"), (7, None, "D"), (100, "i100", "I")]
    )  # v2
    cdc(
        [(3, "u3b", "U"), (100, None, "D"), (101, "i101", "I")]
    )  # v3
    delete_where_mor(spark, path, [("k", "<", 2)])  # v4: DV only


def test_cdf_stream_matches_batch_and_folds_to_final_state(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    _mk(spark, path)
    v1_state = {r.k: r.v for r in snap_read(spark, path).collect()}
    _mutate(spark, path)

    df = _cdf_stream(spark, path, startingVersion="2")
    assert df.columns == ["k", "v", "_change_type", "_commit_version"]
    got, _ = _drain(spark, df, str(tmp_path / "ck"))

    exp = [
        tuple(r)
        for r in table_changes(
            spark, path, keys=["k"], from_version=1
        ).collect()
    ]
    assert sorted(got) == sorted(exp)

    # fold the streamed feed onto v1 -> final state, exactly
    replay = dict(v1_state)
    for k, v, kind, _ver in sorted(got, key=lambda t: t[3]):
        if kind == "delete":
            del replay[k]
        elif kind in ("insert", "update_postimage"):
            replay[k] = v
    final = {r.k: r.v for r in snap_read(spark, path).collect()}
    assert replay == final


def test_cdf_from_beginning_emits_initial_load_as_inserts(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    _mk(spark, path, n=10, n_files=1)
    apply_cdc_cow(
        spark, path,
        spark.createDataFrame([(3, "x", "U")], "k bigint, v string, _op string"),
        keys=["k"],
    )
    got, _ = _drain(
        spark, _cdf_stream(spark, path), str(tmp_path / "ck")
    )
    v1 = [t for t in got if t[3] == 1]
    assert len(v1) == 10 and all(t[2] == "insert" for t in v1)
    kinds = {t[2] for t in got if t[3] == 2}
    assert kinds == {"update_preimage", "update_postimage"}


def test_cdf_checkpoint_restart_is_exactly_once(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=20, n_files=1)
    ck = str(tmp_path / "ck")
    apply_cdc_cow(
        spark, path,
        spark.createDataFrame([(5, "a", "U")], "k bigint, v string, _op string"),
        keys=["k"],
    )
    first, _ = _drain(spark, _cdf_stream(spark, path, startingVersion="2"), ck)
    assert {t[3] for t in first} == {2}
    # new commits land; a restarted query must emit ONLY them
    apply_cdc_cow(
        spark, path,
        spark.createDataFrame([(5, "b", "U"), (6, None, "D")],
                              "k bigint, v string, _op string"),
        keys=["k"],
    )
    second, _ = _drain(spark, _cdf_stream(spark, path, startingVersion="2"), ck)
    assert {t[3] for t in second} == {3}
    exp = [
        tuple(r)
        for r in table_changes(
            spark, path, keys=["k"], from_version=1
        ).collect()
    ]
    assert sorted(first + second) == sorted(exp)


def test_cdf_metadata_only_commits_emit_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=10, n_files=1)
    snap_add_constraint(spark, path, "k_pos", "k >= 0")  # v2: no files
    apply_cdc_cow(
        spark, path,
        spark.createDataFrame([(1, "x", "U")], "k bigint, v string, _op string"),
        keys=["k"],
    )  # v3
    got, _ = _drain(
        spark,
        _cdf_stream(spark, path, startingVersion="2"),
        str(tmp_path / "ck"),
    )
    assert {t[3] for t in got} == {3}


def test_cdf_pacing_one_commit_per_microbatch(spark, tmp_path):
    """maxVersionsPerTrigger=1 in steady state: a change-commit
    backlog landing WHILE the query runs drains one commit per
    micro-batch (first post-start batch is unpaced, like the append
    reader)."""
    import time as _time

    path = str(tmp_path / "t")
    _mk(spark, path, n=10, n_files=1)
    batches: list[list] = []

    def sink(bdf, _bid):
        rows = [tuple(r) for r in bdf.collect()]
        if rows:
            batches.append(rows)

    q = (
        _cdf_stream(spark, path, maxVersionsPerTrigger="1")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline and not batches:
            _time.sleep(0.2)
        assert batches, "first batch never arrived"
        for i in range(3):
            apply_cdc_cow(
                spark, path,
                spark.createDataFrame(
                    [(i, f"u{i}", "U")], "k bigint, v string, _op string"
                ),
                keys=["k"],
            )
        # 10 initial inserts + 3 commits x (pre+post) = 16 rows total
        deadline = _time.time() + 120
        while _time.time() < deadline:
            if sum(len(b) for b in batches) >= 10 + 6:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert sum(len(b) for b in batches) == 10 + 6
    # steady state: each later batch covers exactly one commit
    later = batches[1:]
    assert len(later) == 3, batches
    for b in later:
        assert len({t[3] for t in b}) == 1


def test_streaming_cdf_feed_oracle_parity(spark, sf_dir):
    """The AUX composition query under the DuckDB hash: stream the
    change feed of a CDC commit on the customer fixture, summarize per
    (change type, segment), hash-match the pure-SQL reconstruction."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["streaming_cdf_feed"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["streaming_cdf_feed"],
        sf_dir,
        "streaming_cdf_feed",
    )


def test_cdf_option_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=5, n_files=1)
    spark.dataSource.register(SnapshotTableStreamSource)

    def rs(**opts):
        r = (
            spark.readStream.format("snapshot_table")
            .option("path", path)
            .option("readChangeFeed", "true")
        )
        if _ACTIVE_FS["spec"]:
            r = r.option("fsImpl", _ACTIVE_FS["spec"])
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    with pytest.raises(Exception, match="keys"):
        rs().writeStream.format("noop").start().awaitTermination(30)
    with pytest.raises(Exception, match="skipChangeCommits"):
        rs(keys="k", skipChangeCommits="true").writeStream.format(
            "noop"
        ).start().awaitTermination(30)
    with pytest.raises(Exception, match="_commit_version"):
        rs(keys="k", withCommitVersion="true")
    with pytest.raises(Exception, match="not in table"):
        rs(keys="nope").writeStream.format("noop").start().awaitTermination(30)


def test_cdf_expired_span_raises_remediation(spark, tmp_path):
    """A change-feed offset below the GC floor must fail with the
    re-bootstrap remediation, not a bare FileNotFoundError from the
    manifest replay."""
    from mapreduce_grpc_spark.sources.snapshots import expire_snapshots
    from mapreduce_grpc_spark.sources.stream_source import (
        ChangeCommitError,
        _SnapshotCDFStreamReader,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, n=10, n_files=1)
    for i in range(4):
        apply_cdc_cow(
            spark, path,
            spark.createDataFrame(
                [(i, f"u{i}", "U")], "k bigint, v string, _op string"
            ),
            keys=["k"],
        )
    expire_snapshots(path, keep_last=2, orphan_grace_seconds=0)
    r = _SnapshotCDFStreamReader(
        path, 0, False, "", keys=["k"],
        fs_spec=_ACTIVE_FS["spec"],
    )
    with pytest.raises(ChangeCommitError, match="Re-bootstrap"):
        r.partitions({"version": 1}, {"version": 5})
