"""Declared clustering columns (the liquid-clustering declaration).

`snap_set_clustering` stores the table's CLUSTER BY in the manifest —
carried by every commit like constraints/defaults, writer-feature-gated
(`clustering`) so a legacy build strips nothing silently — and the
maintenance entry points (`optimize_snapshot`, `optimize_incremental`,
`auto_compact`) default to it when the caller names no layout.  Runs
under BOTH commit-protocol FS backends.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources import snapshots as S
from mapreduce_grpc_spark.sources.snapshots import (
    UnsupportedTableFeature,
    auto_compact,
    optimize_incremental,
    optimize_snapshot,
    read_manifest,
    snap_append,
    snap_drop_column,
    snap_init,
    snap_read,
    snap_rename_column,
    snap_set_clustering,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def _batch(spark, tag, n=200):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 100).alias("v"),
        F.concat(F.lit(tag), F.col("id")).alias("s"),
    ).repartitionByRange(2, "k")


def _mk_overlapping(spark, path, tags=("a", "b", "c")):
    """Every batch spans the full key range -> all files overlap on k."""
    snap_init(spark, _batch(spark, tags[0]), path, stats_cols=["k", "v"])
    for t in tags[1:]:
        snap_append(spark, path, _batch(spark, t))


def _k_envelopes(path):
    m = read_manifest(path)
    return sorted(
        (e["stats"]["k"]["min"], e["stats"]["k"]["max"])
        for e in m["files"]
    )


def _disjoint(envs):
    return all(b_lo > a_hi for (_, a_hi), (b_lo, _) in zip(envs, envs[1:]))


def test_declare_store_and_clear(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_overlapping(spark, path)
    v = snap_set_clustering(path, ["k"], curve="hilbert")
    m = read_manifest(path)
    assert m["version"] == v
    assert m["clustering"] == {"cols": ["k"], "curve": "hilbert"}
    assert "clustering" in (m.get("writer_features") or [])
    # the declaration survives an unrelated commit (carry contract)
    snap_append(spark, path, _batch(spark, "x"))
    m2 = read_manifest(path)
    assert m2["clustering"] == {"cols": ["k"], "curve": "hilbert"}
    assert "clustering" in (m2.get("writer_features") or [])
    # CLUSTER BY NONE clears declaration AND the writer gate
    snap_set_clustering(path, None)
    m3 = read_manifest(path)
    assert "clustering" not in m3
    assert "clustering" not in (m3.get("writer_features") or [])


def test_declaration_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_overlapping(spark, path)
    with pytest.raises(KeyError, match="nope"):
        snap_set_clustering(path, ["nope"])
    with pytest.raises(ValueError, match="1 .*or 2"):
        snap_set_clustering(path, ["k", "v", "s"])
    with pytest.raises(ValueError, match="curve"):
        snap_set_clustering(path, ["k"], curve="peano")
    with pytest.raises(ValueError, match="stats_cols"):
        snap_set_clustering(path, ["s"])  # s is not stats-tracked


def test_optimize_snapshot_defaults_to_declared_key(spark, tmp_path):
    """Plain OPTIMIZE (no layout args) on a declared table compacts
    key-ordered: the rewritten files' k-envelopes come out disjoint
    instead of each spanning the full range."""
    path = str(tmp_path / "t")
    _mk_overlapping(spark, path)
    assert not _disjoint(_k_envelopes(path))  # accreted overlap debt
    snap_set_clustering(path, ["k"])
    res = optimize_snapshot(spark, path, target_bytes=10**4)
    assert res["added"] >= 2
    envs = _k_envelopes(path)
    assert _disjoint(envs), envs
    # rows intact
    assert snap_read(spark, path).count() == 600
    # an EXPLICIT layout still wins over the declaration
    res2 = optimize_snapshot(
        spark, path, target_bytes=10**12, cluster_by=["v"]
    )
    assert res2["added"] >= 1


def test_optimize_incremental_defaults_to_declared_key(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_overlapping(spark, path)
    with pytest.raises(ValueError, match="no declared clustering"):
        optimize_incremental(spark, path)
    snap_set_clustering(path, ["k"])
    res = optimize_incremental(spark, path, target_bytes=10**9)
    assert res["rewritten"] >= 2 and res["added"] >= 1
    assert snap_read(spark, path).count() == 600


def test_optimize_incremental_declared_two_col_curve(spark, tmp_path, monkeypatch):
    """A declared 2-column key routes through the declared CURVE (spied
    at the zorder_frame seam — the layout itself is covered by
    test_layout)."""
    from mapreduce_grpc_spark.sources import layout as L

    path = str(tmp_path / "t")
    _mk_overlapping(spark, path)
    snap_set_clustering(path, ["k", "v"], curve="hilbert")
    seen = {}
    real = L.zorder_frame

    def spy(df, cols, n, equidepth=False, curve="morton"):
        seen["cols"], seen["curve"] = tuple(cols), curve
        return real(df, cols, n, equidepth, curve)

    monkeypatch.setattr(S, "zorder_frame", spy, raising=False)
    import mapreduce_grpc_spark.sources.layout as _lay

    monkeypatch.setattr(_lay, "zorder_frame", spy)
    res = optimize_incremental(spark, path, target_bytes=10**9)
    assert res["rewritten"] >= 2
    assert seen == {"cols": ("k", "v"), "curve": "hilbert"}


def test_auto_compact_uses_declared_clustering(spark, tmp_path):
    """The maintenance hook with NO cluster_by fires the overlap policy
    from the declaration alone — self-driving layout upkeep."""
    path = str(tmp_path / "t")
    _mk_overlapping(spark, path, tags=("a", "b", "c", "d", "e"))
    # undeclared: only the file-count policy could fire; with
    # max_files high, nothing does
    assert auto_compact(spark, path, max_files=100) is None
    snap_set_clustering(path, ["k"])
    res = auto_compact(
        spark, path, max_files=100, max_overlap_group=4,
        target_bytes=10**9,
    )
    assert res is not None and res["rewritten"] >= 2
    assert snap_read(spark, path).count() == 1000


def test_rename_follows_and_drop_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_overlapping(spark, path)
    snap_set_clustering(path, ["k", "v"])
    snap_rename_column(path, "k", "key")
    assert read_manifest(path)["clustering"]["cols"] == ["key", "v"]
    # maintenance keeps working through the renamed declaration
    res = optimize_incremental(spark, path, target_bytes=10**9)
    assert res["rewritten"] >= 2
    with pytest.raises(ValueError, match="declared clustering"):
        snap_drop_column(path, "v")
    snap_set_clustering(path, ["key"])  # re-declare without v
    snap_drop_column(path, "v")
    assert read_manifest(path)["clustering"]["cols"] == ["key"]


def test_snap_init_cluster_by(spark, tmp_path):
    """CREATE TABLE ... CLUSTER BY: the declaration lands in the v1
    manifest, the initial write is born range-clustered (disjoint
    envelopes from version 1), and maintenance picks the declaration
    up with no arguments."""
    path = str(tmp_path / "t")
    # deliberately shuffled input — the declaration must own the layout
    df = spark.range(600).select(
        (F.col("id") * 7919 % 600).alias("k"),
        F.col("id").alias("v"),
    )
    snap_init(
        spark, df, path, stats_cols=["k"], cluster_by=["k"],
        curve="hilbert",
    )
    m = read_manifest(path)
    assert m["clustering"] == {"cols": ["k"], "curve": "hilbert"}
    assert "clustering" in (m.get("writer_features") or [])
    if len(m["files"]) > 1:
        assert _disjoint(_k_envelopes(path))
    assert snap_read(spark, path).count() == 600
    # maintenance needs no arguments from birth
    for t in ("a", "b"):
        snap_append(spark, path, _batch(spark, t, n=600).select(
            F.col("k"), F.col("v").cast("bigint").alias("v")
        ))
    res = optimize_incremental(spark, path, target_bytes=10**9)
    assert res["rewritten"] >= 2
    # validation parity with snap_set_clustering
    with pytest.raises(ValueError, match="stats_cols"):
        snap_init(
            spark, df, str(tmp_path / "t2"), stats_cols=["v"],
            cluster_by=["k"],
        )
    with pytest.raises(KeyError, match="nope"):
        snap_init(
            spark, df, str(tmp_path / "t3"), stats_cols=["k"],
            cluster_by=["nope"],
        )


def test_optimize_incremental_where_scopes_the_sweep(spark, tmp_path):
    """OPTIMIZE ... WHERE for the budgeted re-clusterer: two
    fragmented key regions; a scoped run may only touch in-scope
    files, leaving the other region's overlap debt (and bytes)
    untouched for a later pass."""
    path = str(tmp_path / "t")

    def region(lo, tag):
        return spark.range(lo, lo + 100).select(
            F.col("id").alias("k"),
            F.concat(F.lit(tag), F.col("id")).alias("v")
            .cast("string").alias("v"),
        )

    snap_init(
        spark, region(0, "a").repartitionByRange(2, "k"), path,
        stats_cols=["k"],
    )
    # fragment BOTH regions: 3 overlapping files each in [0,100) and
    # [10000, 10100)
    for tag in ("b", "c"):
        snap_append(spark, path, region(0, tag))
    for tag in ("x", "y", "z"):
        snap_append(spark, path, region(10_000, tag))
    m0 = read_manifest(path)
    hi_names = {
        e["name"] for e in m0["files"]
        if e["stats"]["k"]["min"] >= 10_000
    }
    assert len(hi_names) >= 3
    res = optimize_incremental(
        spark, path, ["k"], target_bytes=10**9,
        where=[("k", "<", 5_000)],
    )
    assert res["rewritten"] >= 2
    m1 = read_manifest(path)
    # every high-region file is still there, byte-untouched
    assert hi_names <= {e["name"] for e in m1["files"]}
    # and no rewritten file came from the high region
    assert snap_read(spark, path).count() == 600
    # the scoped pass left the high region's debt: an unscoped run
    # still finds it
    res2 = optimize_incremental(spark, path, ["k"], target_bytes=10**9)
    assert res2["rewritten"] >= 2


def test_clone_carries_clustering_declaration(spark, tmp_path):
    """A shallow clone stays self-driving: the declaration carries and
    the clone's own maintenance uses it with no arguments."""
    from mapreduce_grpc_spark.sources.snapshots import snap_clone

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk_overlapping(spark, src)
    snap_set_clustering(src, ["k"], curve="hilbert")
    snap_clone(src, dst)
    m = read_manifest(dst)
    assert m["clustering"] == {"cols": ["k"], "curve": "hilbert"}
    assert "clustering" in (m.get("writer_features") or [])
    res = optimize_incremental(spark, dst, target_bytes=10**9)
    assert res["rewritten"] >= 2
    # the source's layout is untouched by the clone's rewrite
    assert len(read_manifest(src)["files"]) == 6


def test_legacy_writer_refuses_declared_table(spark, tmp_path, monkeypatch):
    """A build that predates the `clustering` key must refuse to COMMIT
    (its carry loop would strip the declaration) — simulated by
    shrinking the supported writer-feature set."""
    path = str(tmp_path / "t")
    _mk_overlapping(spark, path)
    snap_set_clustering(path, ["k"])
    legacy = S.SUPPORTED_WRITER_FEATURES - {"clustering"}
    monkeypatch.setattr(S, "SUPPORTED_WRITER_FEATURES", legacy)
    with pytest.raises(UnsupportedTableFeature, match="clustering"):
        snap_append(spark, path, _batch(spark, "z"))
    # reads stay allowed: the declaration never gates readers
    assert snap_read(spark, path).count() == 600
