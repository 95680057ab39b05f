"""MapReduce facade: reference semantics on Spark (SURVEY.md §7.1 M1)."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import table
from mapreduce_grpc_spark.compat import MapReduceSpec, register_job, run_mapreduce
from mapreduce_grpc_spark.compat.mapreduce import hash131

# the reference's strtok delimiter class (test/user_tasks.cc:15)
DELIMS = re.compile(r"""[ ,."']+""")


def wc_map(line: str):
    for tok in DELIMS.split(line):
        if tok:
            yield (tok, "1")


def wc_reduce(key: str, values: list[str]):
    yield (key, str(sum(int(v) for v in values)))


@pytest.fixture(scope="module")
def text_inputs(spark, sf_dir, tmp_path_factory):
    """documents.text dumped as newline text files (the reference's input
    model) so the facade reads genuine line-oriented input."""
    out = str(tmp_path_factory.mktemp("mr") / "input")
    table(spark, sf_dir, "documents").select("text").coalesce(2).write.text(out)
    return out


def test_wordcount_parity_with_dataframe_plan(spark, sf_dir, text_inputs):
    """Facade word count == native DataFrame word count (same tokenizer)."""
    spec = MapReduceSpec(input_paths=[text_inputs], n_output_files=8)
    got = run_mapreduce(spark, spec, wc_map, wc_reduce)
    facade = {(r.key, int(r.value)) for r in got.collect()}

    from mapreduce_grpc_spark.operators.text import wordcount

    native = {(r.word, r.cnt) for r in wordcount(spark, sf_dir).collect()}
    assert facade == native


def test_registry_lookup(spark, text_inputs):
    register_job("wc_test", wc_map, wc_reduce)
    spec = MapReduceSpec(input_paths=[text_inputs], n_output_files=4, user_id="wc_test")
    df = run_mapreduce(spark, spec)
    assert df.count() > 0


def test_output_contract(spark, text_inputs, tmp_path):
    """R files max, key,value lines, keys sorted within each file, output
    dir must not pre-exist (reference Appendix B invariants)."""
    out = str(tmp_path / "mr_out")
    spec = MapReduceSpec(input_paths=[text_inputs], n_output_files=8, output_dir=out)
    run_mapreduce(spark, spec, wc_map, wc_reduce)

    parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-")
    )
    assert 0 < len(parts) <= 8
    seen = {}
    for i, p in enumerate(parts):
        with open(os.path.join(out, p)) as fh:
            lines = [ln.rstrip("\n") for ln in fh if ln.strip()]
        keys = [ln.split(",", 1)[0] for ln in lines]
        assert keys == sorted(keys), f"keys not sorted within {p}"
        for k in keys:
            assert hash131(k, 8) == i, f"key {k} in wrong bucket file {p}"
            seen[k] = seen.get(k, 0) + 1
    assert all(c == 1 for c in seen.values())

    # output dir now exists -> rerun must refuse (mapreduce_spec.h:88-91)
    with pytest.raises(FileExistsError):
        run_mapreduce(spark, MapReduceSpec(input_paths=[text_inputs], output_dir=out),
                      wc_map, wc_reduce)


def test_comma_key_refused(spark, text_inputs):
    """The reference silently corrupts keys containing ',' (worker.h:92-94);
    the facade refuses them instead."""
    spec = MapReduceSpec(input_paths=[text_inputs], n_output_files=2)

    def bad_map(line: str):
        yield ("a,b", "1")

    with pytest.raises(Exception, match="key may not contain"):
        run_mapreduce(spark, spec, bad_map, wc_reduce).collect()


def test_value_commas_ok(spark, tmp_path):
    """Values may contain commas (first-comma split on read)."""
    src = tmp_path / "in.txt"
    src.write_text("x\n")
    spec = MapReduceSpec(input_paths=[str(src)], n_output_files=2)

    def m(line):
        yield ("k", "v1,v2,v3")

    def r(key, values):
        yield (key, "|".join(values))

    rows = run_mapreduce(spark, spec, m, r).collect()
    assert rows[0].value == "v1,v2,v3"


# ---------------------------------------------------------------------------
# from_ini: the reference's config format (mapreduce_spec.h:34-67)
# ---------------------------------------------------------------------------


def _write_ini(tmp_path, **overrides):
    """A config mirroring /root/reference/test/config.ini, with real files."""
    inputs = overrides.pop("input_files", None)
    if inputs is None:
        paths = []
        for i in (1, 2):
            p = tmp_path / f"testdata_{i}.txt"
            p.write_text("the quick fox\n")
            paths.append(str(p))
        inputs = ",".join(paths)
    fields = {
        "n_workers": "2",
        "worker_ipaddr_ports": "localhost:5001,localhost:5002",
        "input_files": inputs,
        "output_dir": str(tmp_path / "output"),
        "n_output_files": "8",
        "map_kilobytes": "500",
        "user_id": "cs6210",
    }
    fields.update(overrides)
    cfg = tmp_path / "config.ini"
    cfg.write_text("".join(f"{k}={v}\n" for k, v in fields.items() if v is not None))
    return str(cfg)


def test_from_ini_parses_reference_format(tmp_path):
    spec = MapReduceSpec.from_ini(_write_ini(tmp_path))
    assert len(spec.input_paths) == 2
    assert spec.n_output_files == 8
    assert spec.map_kilobytes == 500
    assert spec.user_id == "cs6210"
    assert spec.n_workers == 2 and len(spec.workers) == 2
    assert spec.output_dir.endswith("/output")


def test_from_ini_value_may_contain_equals(tmp_path):
    # reference splits at the FIRST '=' (mapreduce_spec.h:39-41)
    cfg = _write_ini(tmp_path, user_id="a=b")
    spec = MapReduceSpec.from_ini(cfg)
    assert spec.user_id == "a=b"


def test_from_ini_unknown_keys_ignored(tmp_path):
    spec = MapReduceSpec.from_ini(_write_ini(tmp_path, bogus_key="1"))
    assert "bogus_key" not in spec.extra


def test_from_ini_rejects_missing_input(tmp_path):
    cfg = _write_ini(tmp_path, input_files=str(tmp_path / "nope.txt"))
    with pytest.raises(FileNotFoundError):
        MapReduceSpec.from_ini(cfg)


def test_from_ini_rejects_worker_mismatch(tmp_path):
    cfg = _write_ini(tmp_path, n_workers="3")
    with pytest.raises(ValueError, match="n_workers"):
        MapReduceSpec.from_ini(cfg)


def test_from_ini_rejects_nonpositive_r(tmp_path):
    cfg = _write_ini(tmp_path, n_output_files="0")
    with pytest.raises(ValueError, match="n_output_files"):
        MapReduceSpec.from_ini(cfg)


def test_from_ini_rejects_existing_output_dir(tmp_path):
    out = tmp_path / "output"
    out.mkdir()
    with pytest.raises(FileExistsError):
        MapReduceSpec.from_ini(_write_ini(tmp_path))


def test_from_ini_runs_end_to_end(spark, tmp_path):
    """A reference-style config drives the facade end-to-end."""
    cfg = _write_ini(tmp_path, user_id="wordcount", n_output_files="2")
    spec = MapReduceSpec.from_ini(cfg)
    result = {(r.key, r.value) for r in run_mapreduce(spark, spec).collect()}
    assert result == {("the", "2"), ("quick", "2"), ("fox", "2")}
    assert os.path.isdir(spec.output_dir)


def test_from_ini_tolerates_crlf(tmp_path):
    """A Windows-edited config (CRLF line endings) must parse cleanly —
    '\r' must not leak into int fields or worker addresses."""
    p = tmp_path / "in.txt"
    p.write_text("a b\n")
    cfg = tmp_path / "crlf.ini"
    fields = [
        "n_workers=2",
        "worker_ipaddr_ports=localhost:5001,localhost:5002",
        f"input_files={p}",
        "n_output_files=8",
        "map_kilobytes=500",
        "user_id=cs6210",
    ]
    cfg.write_bytes(("\r\n".join(fields) + "\r\n").encode())
    spec = MapReduceSpec.from_ini(str(cfg))
    assert spec.map_kilobytes == 500
    assert spec.workers == ["localhost:5001", "localhost:5002"]


def test_write_and_read_runs_map_phase_once(spark, tmp_path):
    """With output_dir set, run_mapreduce both writes text AND returns a
    DataFrame; the map phase must run exactly once across the two
    consumers (the result is persisted), not once per action."""
    src = tmp_path / "in.txt"
    src.write_text("a b\nb c\n")
    calls = spark.sparkContext.accumulator(0)

    def m(line):
        calls.add(1)
        for tok in line.split():
            yield (tok, "1")

    def r(key, values):
        yield (key, str(sum(int(v) for v in values)))

    out = str(tmp_path / "mr_out")
    spec = MapReduceSpec(input_paths=[str(src)], n_output_files=2, output_dir=out)
    df = run_mapreduce(spark, spec, m, r)
    got = {(row.key, row.value) for row in df.collect()}
    assert got == {("a", "1"), ("b", "2"), ("c", "1")}
    assert os.path.isdir(out)
    # 2 input lines -> mapper invoked exactly twice TOTAL (write + read)
    assert calls.value == 2
