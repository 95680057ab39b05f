"""Shared fixtures: one SparkSession per test run, sf0.001 data dir."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_grpc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mapreduce_grpc_spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


class FsBackend:
    """Active SnapshotFS backend for a parameterized test: the live
    object (installed as the process default) plus the ``module:Class``
    spec string the streaming source's ``fsImpl`` option needs (data
    source readers/writers run in separate Python workers where the
    process default of THIS interpreter is invisible)."""

    def __init__(self, name: str, fs, spec: str):
        self.name = name
        self.fs = fs
        self.spec = spec


@pytest.fixture(params=["local", "object"], ids=["localfs", "objectfs"])
def snapshot_fs(request):
    """Run the snapshot/MV/feed/stream-source suites over BOTH commit-
    protocol FS implementations: POSIX (rename/O_EXCL) and object-store
    semantics (conditional PUT, copy+delete rename).  The commit
    protocol is the 100 TB portability story — every suite marked
    ``usefixtures("snapshot_fs")`` proves it on both."""
    from mapreduce_grpc_spark.sources import snapshots as _snapshots

    cls = (
        _snapshots.LocalSnapshotFS
        if request.param == "local"
        else _snapshots.ObjectStoreFS
    )
    backend = FsBackend(
        request.param,
        cls(),
        f"mapreduce_grpc_spark.sources.snapshots:{cls.__name__}",
    )
    prev = _snapshots.set_default_fs(backend.fs)
    try:
        yield backend
    finally:
        _snapshots.set_default_fs(prev)
