"""MapReduce-compatible facade: the reference's user API on Spark."""

from .mapreduce import MapReduceSpec, register_job, run_mapreduce  # noqa: F401
