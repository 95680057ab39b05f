"""Hidden partitioning for snapshot tables (Iceberg-style transforms).

A partition spec declares how a table's rows cluster into files —
``days(event_ts)``, ``bucket(16, user_id)``, ``truncate(4, code)``,
or plain ``country`` (identity) — WITHOUT the user ever writing or
filtering on a derived column (Iceberg's "hidden partitioning" pitch;
the reference engine partitions only by ``hash(key) % R``,
/root/reference/src/master.h — buckets, no pruning semantics).

The implementation deliberately reuses the snapshot layer's existing
stats machinery instead of inventing a second pruning path:

- **Write side** (``snapshots._write_data_files``): every data-file
  write on a partitioned table derives one physical column per spec
  field (reserved names ``_sgp_<i>``), clusters the batch by the
  derived tuple (``repartition`` on the tuple + ``sortWithinPartitions``
  so row groups stay tuple-pure), and lands the derived values IN the
  data files.  Cost: one shuffle per write (the price every
  partitioned-write engine pays) plus a constant-per-file
  RLE-compressed column.  Because the derived columns join
  ``stats_cols`` at write time, the manifest's per-file envelopes,
  per-row-group ranges, and bloom sidecars all cover them with ZERO
  new manifest structure.
- **Read side** (``snapshots.prune_manifest`` / distributed planning):
  a user predicate on the SOURCE column is translated into a derived
  predicate on the partition value (``ts BETWEEN a AND b`` implies
  ``days(ts) BETWEEN days(a)-1 AND days(b)+1``; ``id = v`` implies
  ``bucket(id) = bucket(v)``) and appended to the conjunction, where
  the ordinary ``_entry_may_match`` stats/bloom checks prune files.
  Pruning stays strictly advisory: files written before the spec
  existed (or by a writer that ignores it) simply have no ``_sgp``
  stats and are never pruned — correct, just unpruned — which is why
  READERS need no protocol feature flag.  Writers are different: a
  legacy build's ``_commit`` carry loop would silently DROP the
  ``partition_spec`` key from the manifest, permanently unpartitioning
  the table (answers stay right, clustering and pruning are gone, no
  error) — so a committed spec raises the ``partition_spec`` WRITER
  feature flag, making pre-partitioning builds refuse loudly
  (``UnsupportedTableFeature``) instead, the same precedent as
  ``check_constraints``.
- **Readers never see the derived columns**: ``_read_entries`` scans
  with the recorded logical schema, so the extra physical columns in
  the files are simply not projected.

Timestamp transforms and timezones: naive datetimes are treated as
UTC everywhere (matching ``snapshots._json_val``'s ISO-string stats
convention), but the EXACT row filter interprets naive literals in
the Spark session's timezone — so a non-UTC driver session could
disagree with the pruning bound by up to ±14 h.  Derived day/hour
RANGE bounds are therefore widened by one transform unit per side
(``_TZ_SLOP``): a 30-day scan prunes to ~32 days instead of 30, and
correctness never depends on the session timezone.
"""

from __future__ import annotations

import datetime
import hashlib
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reserved physical-column prefix for derived partition values
PART_COL_PREFIX = "_sgp_"

_SPEC_RE = re.compile(
    r"^\s*(?:(?P<t>[a-z]+)\s*\(\s*(?:(?P<n>\d+)\s*,\s*)?"
    r"(?P<c1>\w+)\s*\)|(?P<c2>\w+))\s*$"
)

_TRANSFORMS = {
    "identity", "years", "months", "days", "hours", "bucket", "truncate",
}

# source-column Spark type names each transform accepts (simpleString
# prefixes); identity is restricted to types whose footer stats
# round-trip exactly through _json_val's number/ISO-string convention
_OK_TYPES = {
    "identity": ("string", "int", "bigint", "smallint", "date"),
    # years/months are calendar transforms: DATE sources only (dates
    # are timezone-free; a timestamp's calendar month depends on the
    # session timezone, which the epoch-floor days/hours transforms
    # deliberately avoid)
    "years": ("date",),
    "months": ("date",),
    "days": ("timestamp", "date"),
    "hours": ("timestamp",),
    "bucket": ("string", "int", "bigint", "smallint"),
    "truncate": ("string", "int", "bigint", "smallint"),
}

_EPOCH_DATE = datetime.date(1970, 1, 1)
# ± units of slop applied to derived day/hour range bounds on
# TIMESTAMP sources: session-timezone skew of the exact filter is at
# most ±14 h, under one day / covered by widening hours via the day
# math below (see module docstring)
_TZ_SLOP = {"days": 1, "hours": 15}


def parse_partition_spec(
    specs: list[str], schema, start_id: int = 0
) -> list[dict]:
    """Validate spec strings against a (logical == physical at init
    time) schema and return the manifest form: a list of
    ``{"t": transform, "col": source_physical_name, "n": param|None,
    "name": "_sgp_<field_id>", "src_type": simple_type}``.

    ``start_id`` seeds the per-field ids (Iceberg's partition field
    ids): spec EVOLUTION (``snap_set_partition_spec``) must hand every
    new field a NEVER-REUSED id, because a file written under an old
    spec carries ``_sgp_<old_id>`` stats computed by the old transform
    — if a new field reused the name with a different transform, its
    derived predicates would prune those files WRONGLY.  Fresh ids make
    old stats simply unreferenced: old files fall back to conservative
    keep."""
    by_name = {f.name: f.dataType.simpleString() for f in schema.fields}
    for name in by_name:
        if name.startswith(PART_COL_PREFIX):
            raise ValueError(
                f"column {name!r} collides with the reserved partition-"
                f"value prefix {PART_COL_PREFIX!r}"
            )
    out: list[dict] = []
    for i, raw in enumerate(specs):
        mm = _SPEC_RE.match(raw)
        if not mm:
            raise ValueError(f"bad partition spec {raw!r}")
        t = mm.group("t") or "identity"
        col = mm.group("c1") or mm.group("c2")
        n = mm.group("n")
        if t not in _TRANSFORMS:
            raise ValueError(
                f"unknown partition transform {t!r} in {raw!r} "
                f"(supported: {sorted(_TRANSFORMS)})"
            )
        if col not in by_name:
            raise KeyError(
                f"partition spec {raw!r}: no column {col!r} in "
                f"{sorted(by_name)}"
            )
        src_type = by_name[col]
        base = src_type.split("(")[0]
        if base == "timestamp_ntz":
            base = "timestamp"
        if base not in _OK_TYPES[t]:
            raise TypeError(
                f"partition spec {raw!r}: transform {t!r} does not "
                f"support column type {src_type!r}"
            )
        if t in ("bucket", "truncate"):
            if not n or int(n) <= 0:
                raise ValueError(
                    f"partition spec {raw!r}: {t} needs a positive "
                    f"integer parameter, e.g. {t}(16, {col})"
                )
            n = int(n)
        elif n:
            raise ValueError(
                f"partition spec {raw!r}: {t} takes no parameter"
            )
        else:
            n = None
        out.append(
            {
                "t": t,
                "col": col,
                "n": n,
                "name": f"{PART_COL_PREFIX}{start_id + i}",
                "src_type": base,
            }
        )
    return out


def _bucket_expr(col: Column, n: int) -> Column:
    """md5-derived bucket id, 0..n-1 — the same cross-engine hash family
    the rest of the codebase uses (functions/hashes.py), so the pandas
    twin below and a SQL oracle can agree bit-for-bit.  The value is
    hashed via its CAST(... AS STRING) form; NULL buckets to NULL."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
    return (h.cast("bigint") % F.lit(n)).cast("int")


def _bucket_py(v, n: int) -> int | None:
    if v is None:
        return None
    s = str(v)
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % n


def partition_expr(spec: dict) -> Column:
    """The Spark expression computing one spec field's partition value
    from the PHYSICAL source column."""
    c = F.col(spec["col"])
    t = spec["t"]
    if t == "identity":
        return c
    if t == "years":
        return (F.year(c) - F.lit(1970)).cast("int")
    if t == "months":
        return (
            (F.year(c) - F.lit(1970)) * F.lit(12) + F.month(c) - F.lit(1)
        ).cast("int")
    if t == "days":
        if spec["src_type"] == "date":
            return F.datediff(c, F.lit("1970-01-01").cast("date"))
        # cast timestamp -> double = UTC epoch seconds: timezone-free
        return F.floor(c.cast("double") / 86400.0).cast("int")
    if t == "hours":
        return F.floor(c.cast("double") / 3600.0).cast("int")
    if t == "bucket":
        return _bucket_expr(c, spec["n"])
    # truncate: ints floor to a multiple of n (negative-safe); strings
    # take the n-char prefix — both monotonic non-decreasing
    if spec["src_type"] == "string":
        return F.substring(c, 1, spec["n"])
    n = F.lit(spec["n"])
    return (c - ((c % n) + n) % n).cast("bigint")


def _to_epoch_utc(v) -> float:
    """Predicate value -> UTC epoch seconds; naive datetimes are UTC by
    the stats convention (snapshots._json_val stringifies footer
    datetimes, which pyarrow surfaces as naive UTC)."""
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return v.timestamp()
    if isinstance(v, datetime.date):
        return (v - _EPOCH_DATE).days * 86400.0
    if isinstance(v, str):
        s = v.replace("T", " ")
        try:
            dt = datetime.datetime.fromisoformat(s)
        except ValueError:
            raise TypeError(f"not a timestamp-like value: {v!r}")
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=datetime.timezone.utc)
        return dt.timestamp()
    raise TypeError(f"not a timestamp-like value: {v!r}")


def transform_value(spec: dict, v):
    """Python twin of ``partition_expr`` for a single predicate value —
    must agree with the Spark expression exactly (tested).  Raises
    ``TypeError`` on a value it cannot transform faithfully; callers
    must then SKIP the derivation (conservative), never guess."""
    if v is None:
        raise TypeError("cannot transform None")
    t = spec["t"]
    if t == "identity":
        return v
    if t in ("years", "months"):
        if isinstance(v, datetime.datetime):
            v = v.date()
        if isinstance(v, str):
            v = datetime.date.fromisoformat(v[:10])
        if not isinstance(v, datetime.date):
            raise TypeError(f"not a date: {v!r}")
        if t == "years":
            return v.year - 1970
        return (v.year - 1970) * 12 + v.month - 1
    if t == "days":
        if spec["src_type"] == "date":
            if isinstance(v, datetime.datetime):
                v = v.date()
            if isinstance(v, str):
                v = datetime.date.fromisoformat(v[:10])
            if not isinstance(v, datetime.date):
                raise TypeError(f"not a date: {v!r}")
            return (v - _EPOCH_DATE).days
        return int(_to_epoch_utc(v) // 86400)
    if t == "hours":
        return int(_to_epoch_utc(v) // 3600)
    if t == "bucket":
        if not isinstance(v, (str, int)) or isinstance(v, bool):
            raise TypeError(f"bucket needs str/int, got {type(v)}")
        return _bucket_py(v, spec["n"])
    if spec["src_type"] == "string":
        if not isinstance(v, str):
            raise TypeError(f"truncate(string) needs str, got {type(v)}")
        return v[: spec["n"]]
    if not isinstance(v, int) or isinstance(v, bool):
        raise TypeError(f"truncate(int) needs int, got {type(v)}")
    n = spec["n"]
    return v - ((v % n) + n) % n


def with_partition_columns(
    df: DataFrame,
    pspec: list[dict],
    cluster: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the derived partition-value columns to a PHYSICAL-named
    batch and RANGE-cluster it by the tuple (spec order = clustering
    order), sorting within tasks so row groups stay tuple-pure.

    Range clustering — not hash — is what makes the per-file
    ``_sgp_*`` envelopes tight: a hash repartition scatters adjacent
    days across every output file, so each file's day envelope spans
    the whole batch and stats pruning keeps everything (measured:
    0/8 files skipped hash vs 7/8 range on a day-range scan).  The
    range exchange costs one sampling pass on the batch — the price
    every clustered-write engine pays — and AQE still right-sizes the
    output partitions.

    Callers that already shaped the output (OPTIMIZE's Z-order /
    key-clustered compaction) pass ``cluster=False``: the derived
    columns are still appended (stats stay tracked) but the layout is
    theirs; ``num_partitions`` pins the exchange width when the caller
    has a target file count (compaction's ``target_bytes`` math)."""
    names = []
    for spec in pspec:
        df = df.withColumn(spec["name"], partition_expr(spec))
        names.append(spec["name"])
    if not cluster:
        return df
    if num_partitions:
        return df.repartitionByRange(
            num_partitions, *names
        ).sortWithinPartitions(*names)
    return df.repartitionByRange(*names).sortWithinPartitions(*names)


def partition_pandas(pspec: list[dict], pdf):
    """Pandas twin of the derived columns for the Arrow write paths
    (batch DataSource writer / streaming sink), which build parquet
    files on executors without a Spark plan.  Must agree with
    ``partition_expr`` exactly (tested value-by-value)."""
    import pandas as pd

    for spec in pspec:
        s = pdf[spec["col"]]
        t = spec["t"]
        if t == "identity":
            out = s
        elif t in ("years", "months"):
            dt = pd.to_datetime(s)
            if t == "years":
                out = (dt.dt.year - 1970).astype("Int64")
            else:
                out = (
                    (dt.dt.year - 1970) * 12 + dt.dt.month - 1
                ).astype("Int64")
        elif t in ("days", "hours"):
            unit = 86400 if t == "days" else 3600
            if spec["src_type"] == "date":
                dt = pd.to_datetime(s)
                out = (dt - pd.Timestamp("1970-01-01")).dt.days
            else:
                dt = pd.to_datetime(s)
                if dt.dt.tz is not None:
                    dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
                epoch = (
                    dt - pd.Timestamp("1970-01-01")
                ).dt.total_seconds()
                import numpy as np

                out = pd.Series(
                    np.floor(epoch / unit), index=s.index
                ).astype("Int64")
        elif t == "bucket":
            out = s.map(
                lambda v: None if pd.isna(v) else _bucket_py(v, spec["n"])
            ).astype("Int64" if spec["src_type"] != "string" else "Int64")
        elif spec["src_type"] == "string":
            out = s.str.slice(0, spec["n"])
        else:
            n = spec["n"]
            out = s.map(
                lambda v, n=n: None
                if pd.isna(v)
                else int(v) - ((int(v) % n) + n) % n
            ).astype("Int64")
        pdf[spec["name"]] = out
    return pdf


# range-style ops where a monotonic transform lets bounds carry over;
# bucket derives only =/in (hashing destroys order)
_RANGE_DERIVE = {"identity", "years", "months", "days", "hours", "truncate"}


def derive_branch_preds(
    pspec: list[dict], branch: list[tuple]
) -> list[tuple]:
    """Partition-value predicates implied by one conjunction branch of
    PHYSICAL-name user predicates.  Every derivation is implication-
    safe (user pred true => derived pred true), so appending them to
    the conjunction can only prune files the user predicate already
    excludes.  A value the python twin cannot transform faithfully
    skips that derivation (conservative)."""
    by_col: dict[str, list[dict]] = {}
    for spec in pspec:
        by_col.setdefault(spec["col"], []).append(spec)
    out: list[tuple] = []
    for p in branch:
        col, op = p[0], p[1]
        for spec in by_col.get(col, ()):
            t = spec["t"]
            slop = (
                _TZ_SLOP.get(t, 0)
                if spec["src_type"] == "timestamp"
                else 0
            )
            try:
                if op == "=":
                    tv = transform_value(spec, p[2])
                    if slop:
                        out.append(
                            (spec["name"], "between", tv - slop, tv + slop)
                        )
                    else:
                        out.append((spec["name"], "=", tv))
                elif op == "in":
                    tvs = [
                        transform_value(spec, v)
                        for v in p[2]
                        if v is not None
                    ]
                    if not tvs:
                        continue
                    if slop:
                        out.append(
                            (
                                spec["name"],
                                "between",
                                min(tvs) - slop,
                                max(tvs) + slop,
                            )
                        )
                    else:
                        out.append((spec["name"], "in", tvs))
                elif op == "startswith" and isinstance(p[2], str):
                    if t == "identity":
                        # s startswith p => identity(s) startswith p
                        out.append((spec["name"], "startswith", p[2]))
                    elif t == "truncate" and spec["src_type"] == "string":
                        w = spec["n"]
                        if len(p[2]) >= w:
                            # the whole truncation width is pinned
                            out.append((spec["name"], "=", p[2][:w]))
                        else:
                            # shorter prefix: the truncated value
                            # still starts with it
                            out.append(
                                (spec["name"], "startswith", p[2])
                            )
                elif t in _RANGE_DERIVE:
                    if op == "between":
                        lo = transform_value(spec, p[2])
                        hi = transform_value(spec, p[3])
                        out.append(
                            (spec["name"], "between", _sub(lo, slop),
                             _add(hi, slop))
                        )
                    elif op in ("<", "<="):
                        out.append(
                            (spec["name"], "<=",
                             _add(transform_value(spec, p[2]), slop))
                        )
                    elif op in (">", ">="):
                        out.append(
                            (spec["name"], ">=",
                             _sub(transform_value(spec, p[2]), slop))
                        )
            except TypeError:
                continue  # untransformable value: no derivation
    return out


def _add(v, slop: int):
    return v + slop if slop and isinstance(v, (int, float)) else v


def _sub(v, slop: int):
    return v - slop if slop and isinstance(v, (int, float)) else v
