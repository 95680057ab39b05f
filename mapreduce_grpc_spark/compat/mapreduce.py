"""The reference's MapReduce API surface, executed natively by Spark.

Reproduces the user-visible contract of ``distribuitech/mapreduce_grpc``:

 - user ``map(line) -> (key, value)*`` and ``reduce(key, values) ->
   (key, value)*`` callables over opaque strings
   (/root/reference/external/include/mr_task_factory.h:20-21,37-38);
 - a job registry keyed by user id (O11,
   /root/reference/src/mr_task_factory.cc:30-88);
 - hash-partitioning into ``n_output_files`` buckets with the reference's
   polynomial hash ``h=(h*131+byte)%R`` (/root/reference/src/mr_tasks.h:24-32);
 - keys lexicographically sorted within each bucket
   (/root/reference/src/worker.h:108-117), values in arrival order;
 - ``key,value`` line output, first-comma split on re-read
   (/root/reference/src/worker.h:92-94 — keys must not contain commas;
   we *validate* instead of silently corrupting);
 - output directory must not pre-exist
   (/root/reference/src/mapreduce_spec.h:88-91) ≡ mode("errorifexists").

Execution is one Spark job with a single shuffle:
``read.text -> flatMap(map) -> repartitionAndSortWithinPartitions(R,
hash131) -> per-partition streaming group -> flatMap(reduce) -> write``.
This is the only RDD code in the engine — the string-pair model with
arbitrary Python callables is genuinely per-row imperative, which is the
one case SURVEY.md §1.2 reserves for RDDs.  Unlike the reference, grouping
is streaming per sorted partition (no whole-bucket std::map in memory,
/root/reference/src/worker.h:83) and map outputs shuffle through Spark's
spillable sort shuffle.
"""

from __future__ import annotations

import itertools
import os
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Pair = tuple[str, str]
Mapper = Callable[[str], Iterable[Pair]]
Reducer = Callable[[str, list[str]], Iterable[Pair]]


def hash131(key: str, n_buckets: int) -> int:
    """Reference bucket hash over utf-8 bytes (mr_tasks.h:24-32 semantics)."""
    h = 0
    for byte in key.encode("utf-8"):
        h = (h * 131 + byte) % n_buckets
    return h


@dataclass
class MapReduceSpec:
    """The job spec — the fields of the reference's ini config
    (/root/reference/src/mapreduce_spec.h:13-21).  Cluster fields
    (n_workers, worker addresses) are parsed for config compatibility and
    consistency-checked, but execution capacity is owned by the
    SparkSession; ``map_kilobytes`` maps to
    ``spark.sql.files.maxPartitionBytes`` (set by session.get_spark)."""

    input_paths: list[str]
    output_dir: str | None = None
    n_output_files: int = 8
    user_id: str = "default"
    map_kilobytes: int = 500
    n_workers: int | None = None
    workers: list[str] = field(default_factory=list)
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_ini(cls, path: str) -> "MapReduceSpec":
        """Parse the reference's ``key=value`` config format
        (/root/reference/src/mapreduce_spec.h:34-67, test/config.ini).

        Same line semantics as the reference parser: split each line at
        the first '=', comma-split the list-valued keys, ignore unknown
        keys.  Validation (reference validate_mr_spec,
        mapreduce_spec.h:75-93) runs immediately, including the
        input-files-exist check the programmatic path skips (staged
        inputs may be URIs; ini inputs are local files by construction).
        """
        fields: dict[str, str] = {}
        with open(path) as f:
            for line in f:
                # tolerate CRLF configs: a bare rstrip('\n') would leave
                # '\r' in every value (int('500\r') raises opaquely)
                line = line.rstrip("\r\n")
                if "=" not in line:
                    continue
                key, _, value = line.partition("=")
                fields[key] = value
        spec = cls(
            input_paths=[p for p in fields.get("input_files", "").split(",") if p],
            output_dir=fields.get("output_dir") or None,
            n_output_files=int(fields.get("n_output_files", 0) or 0),
            user_id=fields.get("user_id", "default"),
            map_kilobytes=int(fields.get("map_kilobytes", 0) or 0),
            n_workers=int(fields["n_workers"]) if "n_workers" in fields else None,
            workers=[w for w in fields.get("worker_ipaddr_ports", "").split(",") if w],
        )
        spec.validate(check_inputs_exist=True)
        return spec

    def validate(self, check_inputs_exist: bool = False) -> None:
        """Reference validate_mr_spec semantics (mapreduce_spec.h:75-93)."""
        if self.n_output_files <= 0:
            raise ValueError("n_output_files must be positive")
        if not self.input_paths:
            raise ValueError("at least one input path required")
        if self.map_kilobytes <= 0:
            raise ValueError("map_kilobytes must be positive")
        if self.n_workers is not None and (
            self.n_workers <= 0 or self.n_workers != len(self.workers)
        ):
            raise ValueError(
                f"n_workers={self.n_workers} inconsistent with "
                f"{len(self.workers)} worker_ipaddr_ports"
            )
        if check_inputs_exist:
            for p in self.input_paths:
                if not os.path.exists(p):
                    raise FileNotFoundError(f"input file does not exist: {p}")
        if self.output_dir and os.path.exists(self.output_dir):
            # mapreduce_spec.h:88-91: output dir must not pre-exist
            raise FileExistsError(f"output_dir exists: {self.output_dir}")


_REGISTRY: dict[str, tuple[Mapper, Reducer]] = {}


def register_job(user_id: str, mapper: Mapper, reducer: Reducer) -> bool:
    """O11: global (mapper, reducer) registry keyed by user id."""
    _REGISTRY[user_id] = (mapper, reducer)
    return True


def get_job(user_id: str) -> tuple[Mapper, Reducer]:
    return _REGISTRY[user_id]


def _grouped(part: Iterator[Pair], reducer: Reducer) -> Iterator[Pair]:
    """Streaming group-by over a key-sorted partition (no dict in memory)."""
    for key, kvs in itertools.groupby(part, key=lambda kv: kv[0]):
        yield from reducer(key, [v for _, v in kvs])


def run_mapreduce(
    spark: SparkSession,
    spec: MapReduceSpec,
    mapper: Mapper | None = None,
    reducer: Reducer | None = None,
) -> DataFrame:
    """Run a MapReduce job; returns the result as DataFrame(key, value).

    If mapper/reducer are omitted they are looked up from the registry by
    ``spec.user_id`` (the reference's userid->factory flow,
    /root/reference/src/worker.h:38-39).  When ``spec.output_dir`` is set,
    also writes the reference's ``key,value`` text format, one file per
    non-empty bucket, keys sorted within bucket.
    """
    spec.validate()
    if mapper is None or reducer is None:
        mapper, reducer = get_job(spec.user_id)

    r = spec.n_output_files
    lines = spark.read.text(spec.input_paths).rdd.map(lambda row: row[0])

    def checked_map(line: str) -> Iterable[Pair]:
        for k, v in mapper(line):
            if "," in k:
                # worker.h:92-94 would corrupt this silently; we refuse.
                raise ValueError(f"key may not contain ',': {k!r}")
            yield (k, v)

    pairs = lines.flatMap(checked_map)
    shuffled = pairs.repartitionAndSortWithinPartitions(
        numPartitions=r,
        partitionFunc=lambda k: hash131(k, r),
        ascending=True,
    )
    reduced = shuffled.mapPartitions(lambda part: _grouped(part, reducer))

    if spec.output_dir:
        # persist across the two consumers: without it the text write and
        # any action on the returned DataFrame each re-run the whole
        # map->shuffle->reduce lineage.  MEMORY_AND_DISK so a big job
        # spills instead of evicting; cache lifetime is the returned
        # DataFrame's (the session cleans it with the RDD).
        from pyspark import StorageLevel

        reduced = reduced.persist(StorageLevel.MEMORY_AND_DISK)
        reduced.map(lambda kv: f"{kv[0]},{kv[1]}").saveAsTextFile(spec.output_dir)

    return spark.createDataFrame(reduced, schema="key string, value string")


# ---------------------------------------------------------------------------
# The facade as a registered, oracle-checked query: the reference's shipped
# word-count workload (test/user_tasks.cc:9-35) run through the full
# map->shuffle->sort->reduce path over real line-oriented text input.
# ---------------------------------------------------------------------------

import hashlib
import re

_DELIMS = re.compile(r"""[ ,."']+""")


def _wc_map(line: str) -> Iterable[Pair]:
    for tok in _DELIMS.split(line):
        if tok:
            yield (tok, "1")


def _wc_reduce(key: str, values: list[str]) -> Iterable[Pair]:
    yield (key, str(sum(int(v) for v in values)))


register_job("wordcount", _wc_map, _wc_reduce)


def mapreduce_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end facade run, driver-checkable.

    Stages documents.text as newline text (the reference's input model,
    /root/reference/src/worker.h:74-77) under the session's warehouse dir
    — shared storage that executors can read on a real cluster, unlike a
    driver-local /tmp path — then runs the registered word-count job
    through the RDD facade.  The stage is rewritten on every call (a few
    MB at bench scale), so regenerated fixtures can never be shadowed by
    a stale dump.  Output keeps the facade's string-pair schema; the
    oracle casts its count to VARCHAR to match.
    """
    from ..catalog import table

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    marker = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    stage = f"{warehouse.rstrip('/')}/mrspark_stage/documents_text_{marker}"
    table(spark, sf_dir, "documents").select("text").coalesce(4).write.mode(
        "overwrite"
    ).text(stage)
    spec = MapReduceSpec(input_paths=[stage], n_output_files=8, user_id="wordcount")
    return run_mapreduce(spark, spec)


MAPREDUCE_WORDCOUNT_SQL = """
SELECT word AS key, CAST(count(*) AS VARCHAR) AS value
FROM (
  SELECT unnest(list_filter(string_split_regex(text, '[ ,."'']+'), w -> w <> ''))
           AS word
  FROM documents
) t
GROUP BY word
"""

QUERIES = {"mapreduce_wordcount": mapreduce_wordcount}
ORACLES = {"mapreduce_wordcount": MAPREDUCE_WORDCOUNT_SQL}
