#!/usr/bin/env python
"""Migration example: the reference's word-count job on this engine.

The reference user writes a C++ mapper/reducer pair, registers them under a
user id, and points a config at input files and an output directory
(/root/reference/test/{user_tasks.cc,config.ini}).  The same job here is
the Python below — identical semantics (tokenizer, hash buckets, sorted
per-bucket comma-pair output files, output dir must not pre-exist), Spark
execution underneath.

Run:  python examples/wordcount_facade.py <input.txt> [...] <output_dir>
      python examples/wordcount_facade.py --config <config.ini>

The --config form takes the reference's own ini format unchanged
(n_workers / worker_ipaddr_ports / input_files / output_dir /
n_output_files / map_kilobytes / user_id — /root/reference/test/config.ini);
cluster fields are consistency-checked and then superseded by the
SparkSession.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mapreduce_grpc_spark.compat import MapReduceSpec, register_job, run_mapreduce
from mapreduce_grpc_spark.session import get_spark

# the reference's tokenizer: strtok on " ,.\"'" (test/user_tasks.cc:15)
DELIMS = re.compile(r"""[ ,."']+""")


def wc_map(line: str):
    for token in DELIMS.split(line):
        if token:
            yield (token, "1")


def wc_reduce(key: str, values: list[str]):
    yield (key, str(sum(int(v) for v in values)))


register_job("wordcount", wc_map, wc_reduce)


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--config":
        spec = MapReduceSpec.from_ini(sys.argv[2])
        # the job id in the reference config names a C++ factory entry;
        # here the registered Python job is "wordcount"
        spec.user_id = "wordcount"
    elif len(sys.argv) >= 3:
        *inputs, output_dir = sys.argv[1:]
        spec = MapReduceSpec(
            input_paths=inputs,
            output_dir=output_dir,
            n_output_files=8,
            user_id="wordcount",
        )
    else:
        raise SystemExit(__doc__)
    spark = get_spark(app_name="wordcount-facade")
    result = run_mapreduce(spark, spec)
    print(f"{result.count()} distinct words -> {spec.output_dir}")


if __name__ == "__main__":
    main()
