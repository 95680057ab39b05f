"""Staged-intermediate contract: build once, reuse everywhere, never stale."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import TABLES
from mapreduce_grpc_spark.sources.staging import (
    _input_fingerprint,
    staged_parquet,
    staging_root,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture()
def fake_sf(tmp_path):
    """A fresh corpus path (symlinked sf0.001 tables) so every test run
    gets its own staging fingerprint."""
    d = tmp_path / "sf"
    d.mkdir()
    for t in TABLES:
        src = f"{SF}/{t}.parquet"
        if os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    return str(d)


def test_staged_parquet_builds_once(spark, fake_sf):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).select(F.col("id").alias("v"))

    a = staged_parquet(spark, fake_sf, "t_once", build, params="p1")
    b = staged_parquet(spark, fake_sf, "t_once", build, params="p1")
    assert calls["n"] == 1
    assert sorted(r.v for r in a.collect()) == sorted(r.v for r in b.collect())


def test_staged_parquet_rekeys_on_params_and_input_change(spark, fake_sf, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3).select(F.col("id").alias("v"))

    staged_parquet(spark, fake_sf, "t_key", build, params="p1")
    staged_parquet(spark, fake_sf, "t_key", build, params="p2")
    assert calls["n"] == 2  # constants changed -> fresh build

    # regenerated input file -> different fingerprint
    fp1 = _input_fingerprint(fake_sf, ("documents",), "p")
    doc = os.path.join(fake_sf, "documents.parquet")
    real = os.path.realpath(doc)
    os.unlink(doc)
    shutil.copyfile(real, doc)
    os.utime(doc, ns=(1, 1))
    fp2 = _input_fingerprint(fake_sf, ("documents",), "p")
    assert fp1 != fp2


def test_staged_parquet_empty_result_roundtrips(spark, fake_sf):
    def build():
        return spark.range(1).select(F.col("id").alias("v")).filter(F.lit(False))

    out = staged_parquet(spark, fake_sf, "t_empty", build, params="p")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["v"]
    # second read (pure cache hit) keeps the schema too
    again = staged_parquet(spark, fake_sf, "t_empty", build, params="p")
    assert [f.name for f in again.schema.fields] == ["v"]


def test_staging_off_bypasses_disk(spark, fake_sf, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STAGING", "off")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(2).select(F.col("id").alias("v"))

    staged_parquet(spark, fake_sf, "t_off", build, params="p").collect()
    staged_parquet(spark, fake_sf, "t_off", build, params="p").collect()
    assert calls["n"] == 2
    root = staging_root(spark)
    assert not any(
        e.startswith("t_off-") for e in (os.listdir(root) if os.path.isdir(root) else [])
    )


def test_pair_graph_staged_once_across_consumers(spark, fake_sf, monkeypatch):
    """The VERDICT #1 contract: dedup_near, dedup_components and
    minhash_signatures must share ONE shingle->hash materialization and
    ONE pair-graph materialization — not recompute the pipeline each."""
    from mapreduce_grpc_spark.operators import dedup as dd

    shingle_builds = {"n": 0}
    orig = dd._hashed_exploded

    def counting(spark_, sf_dir_):
        shingle_builds["n"] += 1
        return orig(spark_, sf_dir_)

    monkeypatch.setattr(dd, "_hashed_exploded", counting)

    near = dd.dedup_near(spark, fake_sf)
    n_pairs = near.count()
    comp = dd.dedup_components(spark, fake_sf)
    comp.count()
    sig = dd.minhash_signatures(spark, fake_sf)
    sig.count()
    jac = dd.dedup_ngram_jaccard(spark, fake_sf)
    jac.count()

    # the raw shingle pipeline ran exactly once, for every consumer
    assert shingle_builds["n"] == 1

    # and the published pair graph is what components consumed
    root = staging_root(spark)
    staged = [e for e in os.listdir(root) if e.startswith("near_dup_pairs-")]
    assert staged, "pair graph was not published"
    pair_rows = sum(
        1
        for e in staged
        for r in spark.read.parquet(os.path.join(root, e)).collect()
        if True
    )
    assert pair_rows >= n_pairs

    # consistency: every doc in a component appears in the pair graph
    docs_in_pairs = {
        x
        for r in near.collect()
        for x in (r.doc_a, r.doc_b)
    }
    for r in comp.collect():
        assert r.doc_id in docs_in_pairs


def test_staging_falls_back_when_root_unwritable(spark, fake_sf, monkeypatch, tmp_path):
    """An unwritable staging root (read-only driver cwd, full disk) must
    degrade to the in-session plan, never fail the query.  chmod can't
    simulate this for a root process, so the root is a path UNDER A FILE
    — mkdir fails with ENOTDIR, the same failure class."""
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("")
    monkeypatch.setenv("SPARK_GRAFT_STAGING_DIR", str(blocker / "staged"))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(4).select(F.col("id").alias("v"))

    out = staged_parquet(spark, fake_sf, "t_ro", build, params="p")
    assert sorted(r.v for r in out.collect()) == [0, 1, 2, 3]
    assert calls["n"] >= 1


def test_staged_and_unstaged_paths_agree(spark, fake_sf, monkeypatch):
    """The staged read-back and the in-session fallback plan must produce
    identical rows for every staged operator family."""
    from mapreduce_grpc_spark.operators import dedup as dd

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    staged = {
        "near": rows(dd.dedup_near(spark, fake_sf)),
        "sim_pairs": rows(dd.dedup_simhash_pairs(spark, fake_sf)),
        "sig": rows(dd.minhash_signatures(spark, fake_sf)),
        "ngram": rows(dd.dedup_ngram_jaccard(spark, fake_sf)),
    }
    monkeypatch.setenv("SPARK_GRAFT_STAGING", "off")
    assert rows(dd.dedup_near(spark, fake_sf)) == staged["near"]
    assert rows(dd.dedup_simhash_pairs(spark, fake_sf)) == staged["sim_pairs"]
    assert rows(dd.minhash_signatures(spark, fake_sf)) == staged["sig"]
    assert rows(dd.dedup_ngram_jaccard(spark, fake_sf)) == staged["ngram"]
