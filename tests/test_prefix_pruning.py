"""String-prefix data skipping (``startswith`` in the predicate
grammar): ``LIKE 'p%'`` / ``startswith(p)`` prunes files whose string
min/max envelope cannot intersect ``[p, next_prefix(p))`` — the
Delta/Iceberg startsWith data-skipping shape.

Pinned here:
- ``_next_prefix`` boundary algebra (increment, maxed-char carry, no
  upper bound);
- ``_entry_may_match`` keep/prune decisions on crafted envelopes,
  including the conservative keep on non-string stats;
- ``snap_scan`` prunes files on a string-sorted table and still
  answers exactly; a miss prefix prunes everything and returns the
  empty-with-schema frame;
- the batch DataSource pushes ``LIKE 'p%'`` down (Catalyst rewrites it
  to StringStartsWith) and answers exactly;
- hidden-partitioning derivations: ``truncate(w, col)`` turns a
  prefix >= w into an exact partition-value probe, shorter prefixes
  and identity transforms propagate as prefixes.

Runs over both FS backends (``snapshot_fs``).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from mapreduce_grpc_spark.sources import snapshots as snap
from mapreduce_grpc_spark.sources.batch_source import translate_filters
from mapreduce_grpc_spark.sources.partition import (
    derive_branch_preds,
    parse_partition_spec,
)
from mapreduce_grpc_spark.sources.snapshots import (
    _entry_may_match,
    _next_prefix,
    prune_manifest,
    read_manifest,
    snap_init,
    snap_scan,
)
from mapreduce_grpc_spark.sources.stream_source import (
    SnapshotTableStreamSource,
)

pytestmark = pytest.mark.usefixtures("snapshot_fs")


def test_next_prefix_algebra():
    assert _next_prefix("ab") == "ac"
    assert _next_prefix("a") == "b"
    assert _next_prefix("az") == "a{"
    # maxed last char carries left and drops the tail
    top = chr(0x10FFFF)
    assert _next_prefix("a" + top) == "b"
    assert _next_prefix(top + top) is None
    assert _next_prefix("") is None  # empty prefix matches everything


def _entry(lo, hi, rows=10):
    return {"rows": rows, "stats": {"s": {"min": lo, "max": hi}}}


def test_entry_match_decisions():
    p = ("s", "startswith", "ban")
    assert _entry_may_match(_entry("bana", "bang"), p)
    assert _entry_may_match(_entry("app", "cat"), p)      # straddles
    assert _entry_may_match(_entry("ban", "ban"), p)      # exact prefix
    assert not _entry_may_match(_entry("app", "bam"), p)  # hi < prefix
    assert not _entry_may_match(_entry("bao", "cat"), p)  # lo >= next
    # envelope shorter than the prefix still compares correctly
    assert not _entry_may_match(_entry("a", "ba"), p)
    # non-string stats (engine/type change): conservative keep
    assert _entry_may_match(_entry(1, 9), p)
    # zero-row file never matches
    assert not _entry_may_match(_entry("ban", "ban", rows=0), p)


def _words_table(spark, tmp_path):
    """Three single-word-range files: apple* / banana* / cherry*."""
    path = os.path.join(str(tmp_path), "t")
    dfs = []
    for stem in ("apple", "banana", "cherry"):
        dfs.append(
            spark.range(5).selectExpr(
                "id AS k", f"concat('{stem}_', id) AS s"
            ).coalesce(1)
        )
    snap_init(spark, dfs[0], path, stats_cols=["k", "s"])
    from mapreduce_grpc_spark.sources.snapshots import snap_append

    for d in dfs[1:]:
        snap_append(spark, path, d)
    return path


def test_snap_scan_prefix_prunes_and_answers_exactly(spark, tmp_path):
    path = _words_table(spark, tmp_path)
    m = read_manifest(path)
    assert len(m["files"]) == 3
    kept, skipped = prune_manifest(m, [("s", "startswith", "ban")])
    assert len(kept) == 1 and len(skipped) == 2
    rows = snap_scan(spark, path, [("s", "startswith", "ban")]).collect()
    assert sorted(r.s for r in rows) == [f"banana_{i}" for i in range(5)]
    # prefix between two files' ranges: everything pruned, empty frame
    # with the table schema
    out = snap_scan(spark, path, [("s", "startswith", "bz")])
    assert out.columns == ["k", "s"] and out.count() == 0
    # prefix shorter than every value: keeps all files, exact rows
    rows = snap_scan(spark, path, [("s", "startswith", "")]).collect()
    assert len(rows) == 15


def test_batch_source_like_prefix_pushdown(spark, tmp_path, snapshot_fs):
    from pyspark.sql.datasource import StringStartsWith

    assert translate_filters(
        [StringStartsWith(("s",), "ban")]
    ) == [("s", "startswith", "ban")]
    path = _words_table(spark, tmp_path)
    spark.dataSource.register(SnapshotTableStreamSource)
    got = (
        spark.read.format("snapshot_table")
        .option("path", path)
        .option("fsImpl", snapshot_fs.spec)
        .load()
        .filter("s LIKE 'cherry%'")
        .collect()
    )
    assert sorted(r.s for r in got) == [f"cherry_{i}" for i in range(5)]


def test_truncate_and_identity_prefix_derivations(spark):
    df = spark.range(4).selectExpr("concat('ev_', id) AS code")
    pspec = parse_partition_spec(["truncate(4, code)"], df.schema)
    # prefix >= width pins the whole truncated value
    assert derive_branch_preds(
        pspec, [("code", "startswith", "click_view")]
    ) == [(pspec[0]["name"], "=", "clic")]
    # shorter prefix propagates as a prefix on the truncated column
    assert derive_branch_preds(
        pspec, [("code", "startswith", "cl")]
    ) == [(pspec[0]["name"], "startswith", "cl")]
    ispec = parse_partition_spec(["code"], df.schema)
    assert derive_branch_preds(
        ispec, [("code", "startswith", "cl")]
    ) == [(ispec[0]["name"], "startswith", "cl")]
    # non-string transforms derive nothing from a prefix
    bspec = parse_partition_spec(["bucket(8, code)"], df.schema)
    assert derive_branch_preds(
        bspec, [("code", "startswith", "cl")]
    ) == []


def test_partitioned_prefix_scan_exact(spark, tmp_path):
    """End-to-end on a truncate-partitioned table: a LIKE-prefix scan
    prunes via the implied partition probe and answers exactly."""
    df = spark.range(300).selectExpr(
        "id AS k",
        "CASE WHEN id % 3 = 0 THEN concat('click_view_', id) "
        "WHEN id % 3 = 1 THEN concat('page_load_', id) "
        "ELSE concat('api_call_', id) END AS s",
    )
    path = os.path.join(str(tmp_path), "t")
    prev = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled", "true"
    )
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        snap_init(
            spark, df, path, stats_cols=["k"],
            partition_by=["truncate(4, s)"],
        )
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", prev
        )
    m = read_manifest(path)
    kept, skipped = prune_manifest(
        m, [("s", "startswith", "page_load")],
        snap._bloom_loader(path, None),
    )
    assert skipped, "a prefix >= truncate width must skip files"
    got = sorted(
        r.k for r in snap_scan(
            spark, path, [("s", "startswith", "page_load")]
        ).collect()
    )
    want = sorted(
        r.k for r in df.filter(F.col("s").startswith("page_load")).collect()
    )
    assert got == want and len(got) == 100


def test_snapshot_prefix_scan_oracle_parity(spark, sf_dir):
    """The AUX query putting prefix data skipping (boundary algebra +
    truncate-partition derivation + exact row filter) under the
    driver's own hash comparator against the plain LIKE oracle."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    name = "snapshot_prefix_scan"
    df = registry.AUX_QUERIES[name](spark, sf_dir)
    assert_oracle_match(df, registry.AUX_ORACLES[name], sf_dir, name)


def test_string_stat_truncation_bounds_and_pruning(spark, tmp_path):
    """Long string stats truncate in the manifest (min down, max UP
    via _next_prefix) so metadata stays O(64 chars) per (file, column)
    while every decision stays conservative: scans on long-string
    columns answer exactly and disjoint-stem files still prune."""
    from mapreduce_grpc_spark.sources.snapshots import (
        STR_STAT_MAX,
        _trunc_hi,
        _trunc_lo,
        snap_append,
    )

    long = "x" * 100
    assert _trunc_lo(long) == "x" * STR_STAT_MAX
    assert _trunc_hi(long) == "x" * (STR_STAT_MAX - 1) + "y"
    assert _trunc_lo(long) <= long <= _trunc_hi(long)
    assert _trunc_lo("short") == "short" and _trunc_hi("short") == "short"
    assert _trunc_lo(42) == 42 and _trunc_hi(42) == 42

    path = os.path.join(str(tmp_path), "t")
    mk = lambda stem, lo: spark.range(lo, lo + 5).selectExpr(  # noqa: E731
        "id AS k", f"concat('{stem}', repeat('pad', 100), id) AS s"
    ).coalesce(1)
    snap_init(spark, mk("alpha_", 0), path, stats_cols=["k", "s"])
    snap_append(spark, path, mk("omega_", 100))
    m = read_manifest(path)
    for e in m["files"]:
        env = e["stats"]["s"]
        assert len(env["min"]) <= STR_STAT_MAX
        assert len(env["max"]) <= STR_STAT_MAX
    # disjoint stems still prune through the truncated envelopes
    kept, skipped = prune_manifest(m, [("s", "startswith", "omega")])
    assert len(kept) == 1 and len(skipped) == 1
    # exact answers on equality over the FULL (340-char) value
    probe = f"alpha_{'pad' * 100}3"
    rows = snap_scan(spark, path, [("s", "=", probe)]).collect()
    assert [r.k for r in rows] == [3]
    # a range predicate wholly inside one stem prunes the other
    kept, skipped = prune_manifest(
        m, [("s", "between", "omega_", "omega`")]
    )
    assert len(kept) == 1 and len(skipped) == 1


def test_prefix_through_mutators_and_scoped_hilbert(spark, tmp_path):
    """The new grammar ops flow through the shared predicate plumbing
    into the mutators and scoped OPTIMIZE: a prefix-scoped MoR delete,
    a prefix-scoped UPDATE, and OPTIMIZE ... WHERE <prefix> with the
    Hilbert curve — three r12 features composing on one table."""
    from mapreduce_grpc_spark.sources.snapshots import (
        delete_where_mor,
        optimize_snapshot,
        snap_append,
        update_where,
    )

    path = _words_table(spark, tmp_path)  # apple_/banana_/cherry_ files
    # MoR delete by prefix: only banana rows go
    delete_where_mor(spark, path, [("s", "startswith", "banana")])
    left = sorted(r.s for r in snap_scan(
        spark, path, [("s", "startswith", "")]
    ).collect())
    assert len(left) == 10 and not any(s.startswith("banana") for s in left)
    # UPDATE by prefix: cherry rows get flagged via k += 1000
    update_where(
        spark, path, [("s", "startswith", "cherry")],
        {"k": "k + 1000"},
    )
    ks = {r.s: r.k for r in snap_scan(
        spark, path, [("s", "startswith", "cherry")]
    ).collect()}
    assert all(v >= 1000 for v in ks.values()) and len(ks) == 5
    # fragment the apple stem, then scoped Hilbert OPTIMIZE touches
    # only in-scope files
    for i in range(2):
        snap_append(
            spark, path,
            spark.range(50 + i, 51 + i).selectExpr(
                "id AS k", "concat('apple_x', id) AS s"
            ).coalesce(1),
        )
    before = {e["name"] for e in read_manifest(path)["files"]}
    info = optimize_snapshot(
        spark, path, target_bytes=64 * 1024 * 1024,
        zorder=("k", "s"), equidepth=True, curve="hilbert",
        where=[("s", "startswith", "apple")],
    )
    assert info["rewritten"] >= 2
    after = {e["name"] for e in read_manifest(path)["files"]}
    # the out-of-scope cherry file carried BY NAME (banana's file was
    # legitimately dropped by the full-file MoR delete earlier)
    assert len(after & before) == 1
    rows = sorted(r.s for r in snap_scan(
        spark, path, [("s", "startswith", "apple")]
    ).collect())
    assert len(rows) == 7  # 5 originals + 2 fragments
