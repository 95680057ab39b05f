"""Incremental materialized views over snapshot tables, maintained from
the change data feed.

The composition the table layer exists for: a grouped-aggregate MV
(``GROUP BY dims -> count / sum / min / max``) whose refresh reads ONLY
the source commits since its last refresh — ``table_changes`` yields
the rewritten slice per commit, postimages/inserts add, preimages/
deletes subtract, and the folded per-group deltas land on the MV table
as one copy-on-write commit.  Work per refresh is O(changed rows +
touched groups + overlapping MV files), independent of both source and
MV size — the continuous-aggregate cost model (``sources/
maintenance.py``'s rollup) generalized to any keyed source table, with
the table layer's isolation and audit for free.

**Aggregate algebra** (the Materialize/Delta-MV classification):

- ``count``/``sum`` are *invertible* mergeable state: deltas commute
  exactly (sums accumulate in DECIMAL(38,6), so there is no float
  drift between an incremental and a recomputed MV — the equality the
  tests pin on random workloads).  ``avg`` is derivable as sum/count;
  materialize both and divide at read.
- ``min``/``max`` are mergeable on INSERT (``least``/``greatest`` with
  the stored extremum) but *non-invertible* on DELETE: when a delete
  (or update preimage) removes a value that ties-or-beats the stored
  extremum, the new extremum is unknowable from the delta alone.  The
  refresh detects exactly those groups (``deleted_min <= stored_min``,
  conservatively including ties — multiplicity at the extremum is not
  tracked) and recomputes ONLY them, reading the source at the
  refresh's pinned version through ``snap_scan``'s manifest pruning
  (dim IN (affected keys) — on a dim-clustered source that touches the
  affected groups' files, not the table).  Every other group stays on
  the O(delta) path, so a workload whose deletes never kill an
  extremum refreshes as cheaply as a count/sum-only view.

Exactly-once: each refresh commits with the source version as a
``(_mv_refresh, src_version)`` txn marker in the MV's manifest, so the
MV remembers its own high-water mark (read back by the next refresh)
and a crashed-and-retried refresh of the same source version is a
skip, never a double-application — the same Delta
``txnAppId``/``txnVersion`` rule the streaming CDC ingest uses.

Groups whose count reaches zero are DELETED from the MV (a group must
not linger with cnt=0).  NULL dimension values are unsupported
(coalesce them upstream): the dims act as the MV table's merge keys,
and SQL equi-joins never match NULLs, so a NULL group could not be
maintained incrementally.  The table layer rejects such a refresh
loudly (``apply_cdc_cow``'s NULL-key check) instead of corrupting the
MV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshots import (
    LocalSnapshotFS,
    apply_cdc_cow,
    current_version,
    read_manifest,
    snap_init,
    snap_read,
    snap_scan,
    table_changes,
)

MV_TXN_APP = "_mv_refresh"
_SUM_DEC = "decimal(38,6)"
AGG_FUNCS = ("count", "sum", "min", "max")
# above this many affected groups the recompute path drops its
# per-dim IN pruning predicates (a driver-side list that large stops
# being a cheap manifest probe) and relies on the broadcast key join
RECOMPUTE_PRED_CAP = 1_000
# above this many affected groups the affected-dim relation is never
# COLLECTED at all: a mass extremum death (e.g. a delete sweeping the
# min of most groups) recomputes via a distributed join of the
# affected-dim relation against the pinned source version — driver
# memory stays O(1) no matter how many groups died
RECOMPUTE_COLLECT_CAP = 100_000


def _normalize_aggs(
    aggs: dict | None, agg_col: str | None
) -> dict[str, tuple[str, str | None]]:
    """Validate/shape the aggregate spec ``{out_name: (func, col)}``.
    ``None`` keeps the original two-column view (``cnt`` +
    ``sum_val(agg_col)``).  A ``count`` output is required: group
    death (count 0 -> DELETE row) is detected through it."""
    if aggs is None:
        if agg_col is None:
            raise ValueError("pass agg_col or an aggs spec")
        return {"cnt": ("count", None), "sum_val": ("sum", agg_col)}
    out: dict[str, tuple[str, str | None]] = {}
    has_count = False
    for name, spec in aggs.items():
        func, col = spec if isinstance(spec, tuple) else (spec, None)
        if func not in AGG_FUNCS:
            raise ValueError(
                f"unsupported aggregate {func!r} for {name!r}; "
                f"supported: {AGG_FUNCS} (avg = sum/count at read)"
            )
        if func == "count":
            has_count, col = True, None
        elif not col:
            raise ValueError(f"aggregate {name!r} ({func}) needs a column")
        out[name] = (func, col)
    if not has_count:
        raise ValueError(
            "aggs must include a count output — group death "
            "(count 0 -> DELETE) is detected through it"
        )
    return out


def _agg_exprs(spec: dict[str, tuple[str, str | None]]) -> list:
    exprs = []
    for name, (func, col) in spec.items():
        if func == "count":
            exprs.append(F.count(F.lit(1)).alias(name))
        elif func == "sum":
            exprs.append(
                F.sum(F.col(col).cast(_SUM_DEC)).cast(_SUM_DEC).alias(name)
            )
        elif func == "min":
            exprs.append(F.min(col).alias(name))
        else:
            exprs.append(F.max(col).alias(name))
    return exprs


def _aggregate(src: DataFrame, dims: list[str], spec: dict) -> DataFrame:
    return src.groupBy(*dims).agg(*_agg_exprs(spec))


def mv_init(
    spark: SparkSession,
    src_path: str,
    mv_path: str,
    dims: list[str],
    agg_col: str | None = None,
    aggs: dict | None = None,
    fs: LocalSnapshotFS | None = None,
) -> int:
    """Materialize ``GROUP BY dims`` of the source snapshot's CURRENT
    version as a snapshot table of its own, recording the source
    version as the refresh high-water mark.  Aggregates default to
    ``cnt + sum_val(agg_col)``; pass ``aggs={name: (func, col)}`` with
    funcs from ``AGG_FUNCS`` for multi-aggregate views."""
    spec = _normalize_aggs(aggs, agg_col)
    src_v = current_version(src_path, fs)
    mv = _aggregate(snap_read(spark, src_path, fs=fs), dims, spec)
    version = snap_init(
        spark,
        mv.repartitionByRange(4, *dims),
        mv_path,
        stats_cols=list(dims),
        txns={MV_TXN_APP: src_v},
        fs=fs,
    )
    return version


def mv_refresh(
    spark: SparkSession,
    src_path: str,
    mv_path: str,
    keys: list[str],
    dims: list[str],
    agg_col: str | None = None,
    aggs: dict | None = None,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Fold all source commits since the MV's high-water mark into the
    MV.  Returns ``{"from", "to", "touched", "recomputed_groups",
    "skipped"}``.  ``aggs`` must match the spec the MV was built
    with."""
    spec = _normalize_aggs(aggs, agg_col)
    count_name = next(n for n, (f, _) in spec.items() if f == "count")
    sums = {n: c for n, (f, c) in spec.items() if f == "sum"}
    mins = {n: c for n, (f, c) in spec.items() if f == "min"}
    maxs = {n: c for n, (f, c) in spec.items() if f == "max"}

    last = int(read_manifest(mv_path, fs=fs).get("txns", {})[MV_TXN_APP])
    cur = current_version(src_path, fs)
    if cur <= last:
        return {
            "from": last,
            "to": cur,
            "touched": 0,
            "recomputed_groups": 0,
            "skipped": True,
        }

    feed = table_changes(
        spark, src_path, keys, from_version=last, to_version=cur, fs=fs
    )
    add = F.col("_change_type").isin("insert", "update_postimage")
    delta_aggs = [
        F.sum(F.when(add, F.lit(1)).otherwise(F.lit(-1))).alias("_dcnt")
    ]
    for n, c in sums.items():
        v = F.col(c).cast(_SUM_DEC)
        delta_aggs.append(
            F.sum(F.when(add, v).otherwise(-v)).cast(_SUM_DEC).alias(f"_ds_{n}")
        )
    for n, c in mins.items():
        delta_aggs.append(F.min(F.when(add, F.col(c))).alias(f"_ins_{n}"))
        delta_aggs.append(F.min(F.when(~add, F.col(c))).alias(f"_del_{n}"))
    for n, c in maxs.items():
        delta_aggs.append(F.max(F.when(add, F.col(c))).alias(f"_ins_{n}"))
        delta_aggs.append(F.max(F.when(~add, F.col(c))).alias(f"_del_{n}"))
    delta = feed.groupBy(*dims).agg(*delta_aggs)

    # a key updated WITHIN one group can contribute a zero net delta
    # (+1-1, +v'-v with v'=v, same extremum): groups with no count/sum
    # movement AND no min/max evidence need no touch at all
    touched_cond = F.col("_dcnt") != 0
    for n in sums:
        touched_cond = touched_cond | (
            F.coalesce(F.col(f"_ds_{n}"), F.lit(0).cast(_SUM_DEC)) != 0
        )
    for n in list(mins) + list(maxs):
        touched_cond = (
            touched_cond
            | F.col(f"_ins_{n}").isNotNull()
            | F.col(f"_del_{n}").isNotNull()
        )
    delta = delta.filter(touched_cond)

    mv_cur = snap_read(spark, mv_path, fs=fs)
    j = delta.join(mv_cur, dims, "left")
    exists = F.col(count_name).isNotNull()

    out_cols = [F.col(d) for d in dims]
    new_cnt = (F.coalesce(F.col(count_name), F.lit(0)) + F.col("_dcnt"))
    out_cols.append(new_cnt.alias(count_name))
    for n in sums:
        out_cols.append(
            (
                F.coalesce(F.col(n), F.lit(0).cast(_SUM_DEC))
                + F.coalesce(F.col(f"_ds_{n}"), F.lit(0).cast(_SUM_DEC))
            )
            .cast(_SUM_DEC)
            .alias(n)
        )
    # min/max merge on insert; a delete that ties-or-beats the stored
    # extremum makes the group non-incrementable -> recompute it.  The
    # stored-extremum column is NULL both for an all-null group and for
    # a group BORN inside this (possibly multi-commit) span — in either
    # case any delete in the span forces the recompute: a born group's
    # ``_ins_`` is the min/max over ALL values inserted in the span,
    # including ones a later intra-span commit deleted again
    needs = F.lit(False)
    for n in mins:
        needs = needs | (
            F.col(f"_del_{n}").isNotNull()
            & (F.col(n).isNull() | (F.col(f"_del_{n}") <= F.col(n)))
        )
        out_cols.append(
            F.when(exists, F.least(F.col(n), F.col(f"_ins_{n}")))
            .otherwise(F.col(f"_ins_{n}"))
            .alias(n)
        )
    for n in maxs:
        needs = needs | (
            F.col(f"_del_{n}").isNotNull()
            & (F.col(n).isNull() | (F.col(f"_del_{n}") >= F.col(n)))
        )
        out_cols.append(
            F.when(exists, F.greatest(F.col(n), F.col(f"_ins_{n}")))
            .otherwise(F.col(f"_ins_{n}"))
            .alias(n)
        )
    # the delta/join lineage re-reads the change feed per action; it is
    # consumed by up to three actions below (recompute-key collect, the
    # incremental batch, the recompute union) — materialize ONCE
    # (O(touched groups) rows, the refresh's own cost class).  r16: for
    # refreshes under RECOMPUTE_COLLECT_CAP touched groups (the normal
    # case — the cap already bounds what this module will collect) the
    # materialization is ONE Arrow round-trip to a LOCAL relation, so
    # the three consumers plan local scans instead of re-reading
    # checkpointed blocks through the full distributed plan (measured
    # ~1.1 s of matview_orders' localCheckpoint + downstream planning).
    # A mass-extremum refresh over the cap keeps the distributed
    # checkpoint: driver memory stays O(cap) either way.
    merged_plan = j.select(*out_cols, needs.alias("_rec"))
    probe = merged_plan.limit(RECOMPUTE_COLLECT_CAP + 1).toArrow()
    if probe.num_rows <= RECOMPUTE_COLLECT_CAP:
        merged = spark.createDataFrame(probe, schema=merged_plan.schema)
    else:
        merged = merged_plan.localCheckpoint()

    agg_names = list(spec)

    def to_batch(df: DataFrame) -> DataFrame:
        alive = F.col(count_name) > 0
        cols = [F.col(d) for d in dims]
        for n in agg_names:
            if n == count_name:
                cols.append(F.col(n))
            else:
                cols.append(F.when(alive, F.col(n)).alias(n))
        cols.append(F.when(alive, F.lit("U")).otherwise(F.lit("D")).alias("_op"))
        return df.select(*cols)

    # non-invertible groups: recompute ONLY them from the source AT the
    # refresh's pinned version (later commits must not leak in), with
    # manifest pruning on the affected dim values
    rec = merged.filter(F.col("_rec"))
    n_rec = rec.count()  # merged is checkpointed: O(touched) local scan
    batch = to_batch(merged.filter(~F.col("_rec")))
    if n_rec:
        if n_rec <= RECOMPUTE_COLLECT_CAP:
            rec_rows = rec.select(*dims).collect()
            if len(rec_rows) <= RECOMPUTE_PRED_CAP:
                preds = [
                    (d, "in", sorted({r[d] for r in rec_rows}))
                    for d in dims
                ]
                src_cur = snap_scan(
                    spark, src_path, preds, version=cur, fs=fs
                )
            else:
                src_cur = snap_read(spark, src_path, version=cur, fs=fs)
            keys_df = spark.createDataFrame(
                [tuple(r[d] for d in dims) for r in rec_rows],
                mv_cur.select(*dims).schema,
            )
            joined = src_cur.join(F.broadcast(keys_df), list(dims))
        else:
            # mass extremum death: the affected-dim relation NEVER
            # lands on the driver — a distributed join against the
            # pinned source version (shuffle/AQE-planned; at this
            # group count the recompute touches most of the table, so
            # manifest pruning would keep everything anyway)
            keys_df = rec.select(*dims)
            src_cur = snap_read(spark, src_path, version=cur, fs=fs)
            joined = src_cur.join(keys_df, list(dims))
        rec_agg = _aggregate(joined, dims, spec)
        # a recomputed group with no surviving source rows is DEAD
        rec_full = keys_df.join(rec_agg, list(dims), "left").withColumn(
            count_name, F.coalesce(F.col(count_name), F.lit(0))
        )
        batch = batch.unionByName(to_batch(rec_full))

    res = apply_cdc_cow(
        spark, mv_path, batch, keys=list(dims),
        txn_app=MV_TXN_APP, txn_batch=cur, fs=fs,
    )
    touched = 0 if res.get("skipped") else res["upserted"] + res["deleted"]
    return {
        "from": last,
        "to": cur,
        "touched": touched,
        "recomputed_groups": n_rec,
        "skipped": bool(res.get("skipped", False)),
    }


def mv_read(
    spark: SparkSession,
    mv_path: str,
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
) -> DataFrame:
    return snap_read(spark, mv_path, version, fs)
