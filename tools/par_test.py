#!/usr/bin/env python
"""Parallel round-close test runner.

The full suite is ~55-60 min single-process and grows every round;
pytest-xdist is not installed in this environment, so this runner
gets the same effect with stdlib only: partition the test FILES into
N bins (longest-processing-time-first over measured per-file
durations), run one pytest subprocess per bin concurrently (each
builds its own local[8] SparkSession via tests/conftest.py — sessions
are fully independent: no metastore, per-pid package zips, tmp_path
isolation), and aggregate pass/fail from per-worker junit XML.

Measured durations persist to ``tools/.par_timings.json`` after every
run, so bin balance improves from run to run (first run falls back to
file-size weights, with a fixed multiplier for the suites that run
twice under both SnapshotFS backends).

Run from the repo root:  python tools/par_test.py [-n 4] [extra pytest args]
Exit code 0 iff every worker exits 0.  Per-worker logs land under
/tmp/par_test-<pid>/.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time
import xml.etree.ElementTree as ET

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMINGS = os.path.join(ROOT, "tools", ".par_timings.json")

# suites parameterized over both FS backends run ~2x their size
_HEAVY_HINT = {
    "test_snapshots.py": 2.0,
    "test_stream_source.py": 2.0,
    "test_mutations.py": 2.0,
    "test_vector_index.py": 2.0,
    "test_refs.py": 2.0,
    "test_row_tracking.py": 2.0,
    "test_cdf_stream.py": 2.0,
}


def _weights(files: list[str]) -> dict[str, float]:
    recorded = {}
    if os.path.exists(TIMINGS):
        try:
            with open(TIMINGS) as f:
                recorded = json.load(f)
        except ValueError:
            recorded = {}
    out = {}
    for p in files:
        base = os.path.basename(p)
        if base in recorded:
            out[p] = float(recorded[base])
        else:
            out[p] = (
                os.path.getsize(p) / 1000.0
            ) * _HEAVY_HINT.get(base, 1.0)
    return out


def _partition(files: list[str], weights, n: int) -> list[list[str]]:
    bins: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for p in sorted(files, key=lambda p: -weights[p]):
        i = min(range(n), key=lambda i: bins[i][0])
        w, fs = bins[i]
        bins[i] = (w + weights[p], fs + [p])
    return [fs for _w, fs in bins if fs]


def main() -> int:
    args = sys.argv[1:]
    n = 4
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
        del args[i : i + 2]
    files = sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    weights = _weights(files)
    bins = _partition(files, weights, n)
    logdir = tempfile.mkdtemp(prefix="par_test-")
    print(
        f"{len(files)} test files -> {len(bins)} workers "
        f"(logs: {logdir})"
    )
    procs = []
    t0 = time.time()
    for i, bin_files in enumerate(bins):
        xml_path = os.path.join(logdir, f"worker{i}.xml")
        log = open(os.path.join(logdir, f"worker{i}.log"), "w")
        est = sum(weights[p] for p in bin_files)
        print(
            f"  worker {i}: {len(bin_files)} files, est {est:.0f}  "
            f"({' '.join(os.path.basename(p) for p in bin_files[:4])}"
            f"{' ...' if len(bin_files) > 4 else ''})"
        )
        procs.append(
            (
                subprocess.Popen(
                    [
                        sys.executable, "-m", "pytest", "-q",
                        "-p", "no:cacheprovider",
                        f"--junitxml={xml_path}",
                        *args, *bin_files,
                    ],
                    cwd=ROOT,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                ),
                xml_path,
                log,
            )
        )
    rc = 0
    totals = {"tests": 0, "failures": 0, "errors": 0, "skipped": 0}
    new_timings = {}
    for i, (p, xml_path, log) in enumerate(procs):
        code = p.wait()
        log.close()
        if code not in (0, 5):  # 5 = nothing collected (a -k filter)
            rc = rc or code
        try:
            root = ET.parse(xml_path).getroot()
        except (OSError, ET.ParseError):
            print(f"  worker {i}: exit {code}, NO JUNIT XML (crashed?)")
            rc = rc or 1
            continue
        suites = (
            [root] if root.tag == "testsuite" else list(root)
        )
        for s in suites:
            for k in totals:
                totals[k] += int(s.get(k) or 0)
            for tc in s.iter("testcase"):
                base = (
                    (tc.get("classname") or "").split(".")[1] + ".py"
                    if "." in (tc.get("classname") or "")
                    else None
                )
                if base:
                    new_timings[base] = new_timings.get(base, 0.0) + float(
                        tc.get("time") or 0.0
                    )
        print(f"  worker {i}: exit {code}")
    wall = time.time() - t0
    if new_timings:
        old = {}
        if os.path.exists(TIMINGS):
            try:
                with open(TIMINGS) as f:
                    old = json.load(f)
            except ValueError:
                pass
        old.update({k: round(v, 2) for k, v in new_timings.items()})
        with open(TIMINGS, "w") as f:
            json.dump(old, f, indent=0, sort_keys=True)
    passed = totals["tests"] - totals["failures"] - totals["errors"] - totals["skipped"]
    print(
        f"TOTAL: {passed} passed, {totals['failures']} failed, "
        f"{totals['errors']} errors, {totals['skipped']} skipped "
        f"in {wall:.0f}s across {len(bins)} workers"
    )
    return 1 if (totals["failures"] or totals["errors"]) else rc


if __name__ == "__main__":
    sys.exit(main())
