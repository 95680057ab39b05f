"""Z-order data layout: multi-column locality clustering for file pruning.

At 100 TB the dominant read-path lever after partitioning is FILE
SKIPPING: parquet footers carry per-file/row-group min-max stats, and a
scan with a selective predicate prunes every file whose range doesn't
overlap.  Sorting by one column gives perfect pruning on that column and
none on any other; interleaving the bits of several columns (a Z-order /
Morton curve) gives each column a share of the locality, so filters on
ANY of the curve columns prune files.  This is Delta/Iceberg's
``OPTIMIZE ZORDER BY`` re-expressed with plain DataFrame ops:

1. normalize each curve column to an 8-bit bucket (min-max affine scale
   — one bounded stats collect per column),
2. interleave the bucket bits into a Morton key with shift/mask
   arithmetic (pure JVM expressions, no UDF),
3. ``repartitionByRange`` on the key (range exchange = one shuffle) +
   ``sortWithinPartitions`` and write.

Two bucketing modes feed the same bit-interleave: equi-width (min-max
affine — expression-only, two stats per column) and equi-depth
(``approxQuantile`` boundaries — one extra sketch pass per column).
Equi-width collapses on skewed columns: when most mass sits in a sliver
of the value range, nearly every row lands in a handful of buckets and
the curve degenerates to a sort on the OTHER column.  Equi-depth puts
~equal row mass in every bucket by construction, so the Morton tiling
survives any marginal distribution; it is the default choice for
long-tailed columns (ids, counts, prices) at 100 TB.

The effect is measured, not assumed: ``bounding_stats`` reads back
per-file min-max envelopes, and the test asserts the z-ordered layout's
average normalized envelope area is a fraction of a single-column sort's
(i.e. filters on either column skip most files).
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BITS = 8  # bucket bits per column (two columns -> 16-bit Morton key)


def _bucket(col: str, lo: float, hi: float) -> F.Column:
    """Affine min-max scale of ``col`` into [0, 2^BITS - 1]."""
    span = hi - lo
    if span <= 0:
        return F.lit(0)
    scaled = (F.col(col).cast("double") - F.lit(lo)) / F.lit(span)
    return F.least(
        F.lit((1 << BITS) - 1),
        F.floor(scaled * F.lit(1 << BITS)).cast("int"),
    )


def _bucket_equidepth(col: str, bounds: list) -> F.Column:
    """Bucket id = number of quantile boundaries strictly below the
    value — equal row mass per bucket regardless of skew.  One fold over
    a (2^BITS - 1)-element literal array per row; duplicate boundaries
    (heavy single values) simply merge buckets, which is the correct
    degeneration.  Works for numeric boundaries (value cast to double)
    and STRING boundaries (plain lexicographic compare) — the fold is
    the same, only the literals' type changes."""
    if not bounds:
        return F.lit(0)  # all-null column: one bucket, curve unaffected
    if isinstance(bounds[0], str):
        arr = F.array(*[F.lit(b) for b in bounds])
        v = F.col(col)
    else:
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        v = F.col(col).cast("double")
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(v > b, F.lit(1)).otherwise(F.lit(0)),
    )


def _string_bounds(df: DataFrame, col: str, n_bounds: int) -> list[str]:
    """Equi-depth boundaries for a STRING column from a deterministic
    hash-sample (``approxQuantile`` is numeric-only): sort a bounded
    sample, read the boundary at each quantile position.  Sample-based
    quantiles are approximate — bucket masses wobble with the sample —
    which is the same contract approxQuantile's epsilon already gives
    the numeric path."""
    rows = (
        df.select(
            F.col(col).alias("_v"),
            F.xxhash64(col, F.lit(7)).alias("_h"),
        )
        .filter(F.col("_v").isNotNull())
        .orderBy("_h", "_v")
        .limit(50_000)
        .collect()
    )
    vals = sorted(r._v for r in rows)
    if not vals:
        return []
    return [
        vals[min(len(vals) - 1, (i * len(vals)) // (n_bounds + 1))]
        for i in range(1, n_bounds + 1)
    ]


def _morton(buckets: list) -> F.Column:
    """Interleave K BITS-bit values into a K*BITS-bit Morton key: column
    j's bit i lands at position ``i*K + (K-1-j)`` (for K=2 exactly the
    classic a->2i+1 / b->2i interleave, so 2-column keys are
    bit-identical to the original implementation).  Buckets are cast to
    BIGINT before shifting so the key stays exact up to K*BITS <= 63
    bits (K <= 7 at 8 bits/column).  Pure shift/mask arithmetic,
    whole-stage-codegen friendly."""
    k = len(buckets)
    if k * BITS > 63:
        raise ValueError(
            f"zorder: at most {63 // BITS} columns at {BITS} bits each"
        )
    terms = []
    for j, b in enumerate(buckets):
        bl = b.cast("long")
        for i in range(BITS):
            terms.append(
                F.shiftleft(
                    F.shiftright(bl, i).bitwiseAND(F.lit(1)),
                    i * k + (k - 1 - j),
                )
            )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def _morton2(a: F.Column, b: F.Column) -> F.Column:
    """The classic two-column interleave — kept as the K=2 special case
    of :func:`_morton` (bit-identical by construction)."""
    return _morton([a, b])


def _hilbert_np(X, bits: int = BITS):
    """Axes -> Hilbert index over an ``(n, k)`` bucket matrix — the
    Skilling 2004 transpose algorithm (public domain, "Programming the
    Hilbert curve", AIP Conf. Proc. 707), vectorized over rows with
    boolean masks.  Returns ``(n,)`` int64 keys in ``[0, 2^(k*bits))``.
    Pinned in tests as a BIJECTION with the defining unit-step
    property: consecutive Hilbert indices differ by exactly 1 in
    exactly one coordinate — the locality guarantee Morton lacks (a
    Z-curve jumps across the space at bucket-boundary carries, which
    is precisely what widens file envelopes)."""
    import numpy as np

    X = X.astype(np.int64).copy()
    n, k = X.shape
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:  # inverse-undo excess work
        P = Q - 1
        for i in range(k):
            hit = (X[:, i] & Q) != 0
            X[hit, 0] ^= P
            nh = ~hit
            t = (X[nh, 0] ^ X[nh, i]) & P
            X[nh, 0] ^= t
            X[nh, i] ^= t
        Q >>= 1
    for i in range(1, k):  # Gray encode
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(n, dtype=np.int64)
    Q = M
    while Q > 1:
        hit = (X[:, k - 1] & Q) != 0
        t[hit] ^= Q - 1
        Q >>= 1
    X ^= t[:, None]
    # transpose -> flat index: bit q of coord i lands at q*k + (k-1-i)
    key = np.zeros(n, dtype=np.int64)
    for i in range(k):
        for q in range(bits):
            key |= ((X[:, i] >> q) & 1) << (q * k + (k - 1 - i))
    return key


def _hilbert(buckets: list) -> F.Column:
    """Hilbert key over K bucket expressions.  The state-dependent bit
    loops don't decompose into shift/mask expressions the way Morton
    does, so this is the one Arrow-batched UDF in the layout path —
    write-time only (keys are computed once per rewrite, never at
    read), numpy-vectorized inside the batch via ``_hilbert_np``."""
    import numpy as np
    import pandas as pd

    k = len(buckets)
    if k * BITS > 63:
        raise ValueError(
            f"zorder: at most {63 // BITS} columns at {BITS} bits each"
        )

    @F.pandas_udf("long")
    def hkey(*cols):
        n = len(cols[0])
        if n == 0:
            return pd.Series([], dtype="int64")
        X = np.stack(
            [c.to_numpy(dtype=np.int64, na_value=0) for c in cols], axis=1
        )
        return pd.Series(_hilbert_np(X), dtype="int64")

    return hkey(*[b.cast("long") for b in buckets])


def zorder_frame(
    df: DataFrame,
    cols,
    n_files: int,
    equidepth: bool = False,
    curve: str = "morton",
) -> DataFrame:
    """``df`` re-clustered along the Z-order curve of 2..7 numeric
    columns (the Delta ``ZORDER BY (a, b, ...)`` arity) into
    ``n_files`` range partitions — the transform behind
    ``zorder_write``, exposed so manifest-committed writers
    (``sources/snapshots.optimize_snapshot``) can cluster without the
    directory-write step.  Two-column keys are bit-identical to the
    original pairwise implementation, so existing layouts re-optimize
    to the same order.

    ``equidepth=True`` derives bucket boundaries from ``approxQuantile``
    (equal row mass per bucket) instead of the min-max affine scale —
    required for skewed columns, where equi-width buckets collapse and
    the curve degenerates (measured in tests/test_layout.py).

    ``curve="hilbert"`` swaps the Morton interleave for the Hilbert
    index (the Databricks liquid-clustering choice; Moon et al., TKDE
    1996 for why it prunes better): Hilbert's unit-step property
    removes the Z-curve's boundary jumps, so per-file envelopes are
    tighter at the same file count — measured in tests.  Bucketing,
    shuffle shape, and write path are identical; only the key
    changes, and Morton stays the default so existing layouts
    re-optimize to the same order."""
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("zorder needs at least two columns")
    if curve not in ("morton", "hilbert"):
        raise ValueError(f"zorder: unknown curve {curve!r}")
    _key = _morton if curve == "morton" else _hilbert
    dtypes = dict(df.dtypes)
    str_cols = {c for c in cols if dtypes.get(c) == "string"}
    if str_cols and not equidepth:
        raise ValueError(
            f"zorder: string column(s) {sorted(str_cols)} need "
            "equidepth=True (no affine scale exists for strings; "
            "sample-quantile boundaries do the bucketing)"
        )
    if equidepth:
        qs = [i / (1 << BITS) for i in range(1, 1 << BITS)]
        num = [c for c in cols if c not in str_cols]
        by_col: dict = {}
        if num:
            dfq = df.select(
                *[
                    F.col(c).cast("double").alias(f"_q{j}")
                    for j, c in enumerate(num)
                ]
            )
            res = dfq.approxQuantile(
                [f"_q{j}" for j in range(len(num))], qs, 0.001
            )
            by_col.update(zip(num, res))
        for c in str_cols:
            by_col[c] = _string_bounds(df, c, len(qs))
        z = _key([_bucket_equidepth(c, by_col[c]) for c in cols])
    else:
        aggs = []
        for j, c in enumerate(cols):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"_lo{j}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"_hi{j}"))
        stats = df.agg(*aggs).collect()[0]
        z = _key(
            [
                _bucket(c, stats[f"_lo{j}"], stats[f"_hi{j}"])
                for j, c in enumerate(cols)
            ]
        )
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def zorder_write(
    spark: SparkSession,
    df: DataFrame,
    cols,
    path: str,
    n_files: int,
    equidepth: bool = False,
    curve: str = "morton",
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Z-order
    curve of 2..7 numeric columns (see :func:`zorder_frame`)."""
    zorder_frame(df, cols, n_files, equidepth, curve).write.mode(
        "errorifexists"
    ).parquet(path)


def bounding_stats(
    spark: SparkSession, path: str, cols: tuple[str, str]
) -> list[dict]:
    """Per-file min-max envelope of ``cols`` — the information a pruning
    scan has.  Small file counts only (layout verification)."""
    ca, cb = cols
    out = []
    for f in sorted(os.listdir(path)):
        if not (f.startswith("part-") and f.endswith(".parquet")):
            continue
        r = (
            spark.read.parquet(os.path.join(path, f))
            .agg(
                F.min(F.col(ca).cast("double")).alias("a_lo"),
                F.max(F.col(ca).cast("double")).alias("a_hi"),
                F.min(F.col(cb).cast("double")).alias("b_lo"),
                F.max(F.col(cb).cast("double")).alias("b_hi"),
            )
            .collect()[0]
        )
        out.append(
            {
                "file": f,
                "a_lo": r.a_lo,
                "a_hi": r.a_hi,
                "b_lo": r.b_lo,
                "b_hi": r.b_hi,
            }
        )
    return out


def mean_envelope_extent(
    stats: list[dict], a_span: float, b_span: float
) -> float:
    """Average normalized per-column envelope width, averaged over both
    columns — the pruning proxy.  A filter on column c skips a file iff
    the file's c-envelope misses the predicate range, so expected
    skipping tracks the per-column widths; the *product* (area) is the
    wrong proxy — a layout with one zero-width column and one full-width
    column scores a perfect area while being unprunable on the second
    column."""
    if not stats:
        return 1.0
    total = 0.0
    for s in stats:
        wa = (s["a_hi"] - s["a_lo"]) / a_span if a_span else 0.0
        wb = (s["b_hi"] - s["b_lo"]) / b_span if b_span else 0.0
        total += (wa + wb) / 2
    return total / len(stats)
