"""IVF vector index persisted on the snapshot-table layer — the
"vector database on the lakehouse" composition.

``operators/similarity.py``'s ``ivf_topk`` demonstrates IVF-Flat as a
query; real pipelines need the index as a MAINTAINED artifact: built
once, appended to incrementally as new embeddings arrive, searched with
I/O proportional to the probed cells, and versioned so a re-build or a
bad batch can be time-traveled away.  Every piece is machinery this
engine already has, composed:

- **Build** (``ivf_index_init``): coarse quantizer = the deterministic
  seeded k-means++ of ``operators/clustering.py``; centroids and the
  posting table (vec_id, cell, embedding) land as snapshot tables.
  Postings are written ``repartitionByRange(cell)`` — cell-clustered
  files whose manifest envelopes make cell predicates prunable.
- **Search** (``ivf_search``): queries score against the broadcast
  K x dim centroids (row-local, no shuffle), pick ``nprobe`` cells, and
  the candidate read goes through ``snap_scan(cell IN probes)`` —
  unprobed cells' FILES are never scheduled (manifest pruning), which
  at 100 TB is the difference between reading nprobe/K of the corpus
  and all of it.  Exact cosine re-ranking inside the probed cells.
- **Insert** (``ivf_index_insert``): new vectors are assigned to their
  nearest EXISTING centroid (standard IVF append — the quantizer is
  frozen between re-trains) and merged by ``vec_id`` through the CoW
  MERGE.  Fresh ids are pure inserts: the per-file vec_id BLOOM
  filters prove no existing file holds them, so nothing is rewritten
  (cell-clustered layout makes vec_id ranges useless — this insert
  path is exactly what the blooms exist for).  Re-inserting an id
  replaces its old row wherever it lives (key-stats pruning), so the
  index can never hold two embeddings for one id.

Re-training the quantizer is ``ivf_index_init`` at a new path (or the
same path after a drop): centroid assignment is a model artifact, and
mixing two quantizers' cells in one posting table would silently
degrade recall — better to rebuild and swap than to patch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.vectors import cosine
from .snapshots import (
    LocalSnapshotFS,
    apply_cdc_cow,
    delete_keys_mor,
    merge_upsert_cow,
    snap_init,
    snap_overwrite,
    snap_read,
    snap_scan,
)

N_CELLS = 8
N_PROBE = 2
TOP_K = 10
# above this many query rows the per-query side stops being broadcast
# (a million-query batch scoring a billion-vector index should shuffle
# on cell, not ship the queries to every task twice)
QUERY_BROADCAST_MAX_ROWS = 100_000


def _centroids_path(path: str) -> str:
    return os.path.join(path, "centroids")


def _postings_path(path: str) -> str:
    return os.path.join(path, "postings")


def _meta_path(path: str) -> str:
    return os.path.join(path, "meta")


def _pq_books_path(path: str) -> str:
    return os.path.join(path, "pq")


def _mean_assign_dist(postings: DataFrame, cent: DataFrame) -> float:
    """Mean cosine DISTANCE (1 - cos) of each posting to its assigned
    centroid — the quantizer-quality scalar the drift trigger tracks.
    One joined scan, O(1)-row aggregate."""
    row = (
        postings.join(F.broadcast(cent), "cell")
        .agg(
            F.avg(
                F.lit(1.0) - cosine(F.col("embedding"), F.col("centroid"))
            ).alias("d")
        )
        .collect()[0]
    )
    return float(row["d"]) if row["d"] is not None else 0.0


def _write_meta(
    spark: SparkSession,
    path: str,
    baseline: float,
    n_cells: int,
    seed: int,
    fs: LocalSnapshotFS | None,
    create: bool,
    extra: dict | None = None,
) -> None:
    rows = [
        ("drift_baseline", float(baseline)),
        ("n_cells", float(n_cells)),
        ("seed", float(seed)),
    ] + [(k, float(v)) for k, v in (extra or {}).items()]
    df = spark.createDataFrame(rows, "key string, value double")
    if create:
        snap_init(spark, df, _meta_path(path), stats_cols=["key"], fs=fs)
    else:
        merge_upsert_cow(spark, _meta_path(path), df, keys=["key"], fs=fs)


def _read_meta(
    spark: SparkSession, path: str, fs: LocalSnapshotFS | None
) -> dict:
    try:
        return {
            r["key"]: r["value"]
            for r in snap_read(spark, _meta_path(path), fs=fs).collect()
        }
    except FileNotFoundError:
        return {}  # pre-drift-tracking index (round <= 8 layout)


def ivf_index_init(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    n_cells: int = N_CELLS,
    seed: int = 42,
    fs: LocalSnapshotFS | None = None,
    pq_m: int | None = None,
    pq_k: int = 64,
    opq: bool = False,
    payload_cols: list[str] | None = None,
) -> dict:
    """Train the coarse quantizer on ``emb`` (``vec_id``,
    ``embedding``) and persist the index: ``centroids`` (cell,
    centroid) and cell-clustered ``postings`` (vec_id, cell,
    embedding) snapshot tables under ``path``.

    ``opq=True`` (requires ``pq_m``) trains the OPQ learned rotation
    (``operators/pq.py:opq_fit`` — Ge et al. 2013) before the
    codebooks and persists it in the same model table as ``sub = -1``
    rows, one per rotation row; every posting encode and every ADC
    query LUT then rotates first.  R is orthogonal, so ADC still
    approximates the ORIGINAL-space cosine and the exact re-rank is
    untouched — the lever PLANS.md r12 prescribes when dims grow
    correlated or the recall curve sags.

    ``pq_m`` turns the index into IVF-PQ (the faiss ``IVFPQ`` shape):
    per-subspace codebooks (``pq_m`` subspaces x ``pq_k`` codes,
    operators/pq.py; the ``pq_k`` default follows the measured
    recall-vs-bits curve in ``tools/pq_recall_curve.py`` — more
    subspaces with 64-entry books beat bigger codebooks, so pass
    ``pq_m = dim/2`` where recall matters most) are fit on the same
    corpus and every posting
    additionally stores its ``pq_code`` (M small ints — bytes, vs the
    raw vector's KBs).  ``ivf_search(method="adc")`` then scans ONLY
    the code column inside the probed cells (parquet column pruning)
    and fetches raw vectors just for the re-rank candidates — at
    100 TB the probe read drops from cell-vectors to cell-codes.  The
    codebooks are a model artifact persisted as a third snapshot table
    (``pq``), independent of the coarse quantizer: rebalance, merge,
    and refit move postings between cells without re-encoding.

    ``payload_cols`` stores extra attribute columns from ``emb`` on
    every posting (label, source, timestamp...) and tracks their
    stats, enabling FILTERED vector search — ``ivf_search(where=...)``
    restricts candidates to matching rows BEFORE scoring (pre-filter
    semantics: the top-k is the true top-k of the filtered set, not a
    post-filtered top-k that can come back short).  Inserts must then
    carry the payload columns too."""
    from ..operators.clustering import kmeans_pp_fit

    payload_cols = list(payload_cols or [])
    reserved = {"vec_id", "cell", "embedding", "pq_code"}
    bad = [c for c in payload_cols if c in reserved]
    if bad:
        raise ValueError(f"ivf_index_init: reserved payload name {bad}")
    missing = [c for c in payload_cols if c not in emb.columns]
    if missing:
        raise ValueError(
            f"ivf_index_init: payload column(s) {missing} not in emb"
        )
    assign, _rounds, cent_rows = kmeans_pp_fit(
        spark, emb, k=n_cells, seed=seed, return_centroids=True
    )
    cent_df = spark.createDataFrame(
        cent_rows, "k long, carr array<double>"
    ).select(
        F.col("k").cast("int").alias("cell"), F.col("carr").alias("centroid")
    )
    postings = (
        emb.select("vec_id", "embedding", *payload_cols)
        .join(
            assign.select("vec_id", F.col("cluster").alias("cell")), "vec_id"
        )
        .select("vec_id", "cell", "embedding", *payload_cols)
    )
    books = None
    rotation = None
    if opq and not pq_m:
        raise ValueError("ivf_index_init: opq=True requires pq_m")
    if pq_m:
        from ..operators.pq import opq_fit, pq_encode, pq_fit

        if opq:
            rotation, books = opq_fit(spark, emb, m=pq_m, k=pq_k, seed=seed)
        else:
            books = pq_fit(spark, emb, m=pq_m, k=pq_k, seed=seed)
        postings = pq_encode(
            postings, "embedding", books, rotation=rotation
        )
    postings = postings.repartitionByRange(
        max(2, n_cells // 2), "cell"
    ).sortWithinPartitions("cell", "vec_id")
    cv = snap_init(
        spark, cent_df, _centroids_path(path), stats_cols=["cell"], fs=fs
    )
    pv = snap_init(
        spark,
        postings,
        _postings_path(path),
        stats_cols=["cell", "vec_id"] + payload_cols,
        fs=fs,
    )
    if books is not None:
        book_rows = [
            (j, c, vec)
            for j, B in enumerate(books)
            for c, vec in enumerate(B)
        ]
        if rotation is not None:
            # the rotation rides in the same model table as sub = -1
            # rows (code = row index): one table, one loader, and a
            # plain-PQ index stays byte-identical to pre-OPQ builds
            book_rows += [(-1, i, row) for i, row in enumerate(rotation)]
        snap_init(
            spark,
            spark.createDataFrame(
                book_rows, "sub int, code int, centroid array<double>"
            ),
            _pq_books_path(path),
            stats_cols=["sub"],
            fs=fs,
        )
    # fit-time assignment quality: the drift trigger's baseline
    baseline = _mean_assign_dist(
        snap_read(spark, _postings_path(path), fs=fs), cent_df
    )
    _write_meta(
        spark, path, baseline, n_cells, seed, fs, create=True,
        extra=(
            {"pq_m": pq_m, "pq_k": pq_k, "opq": opq} if pq_m else None
        ),
    )
    return {
        "cells": n_cells,
        "centroids_version": cv,
        "postings_version": pv,
        "drift_baseline": baseline,
        "pq": bool(pq_m),
        "opq": bool(pq_m and opq),
    }


def _load_pq_model(
    spark: SparkSession, path: str, fs: LocalSnapshotFS | None
) -> tuple[
    list[list[list[float]]] | None, list[list[float]] | None
]:
    """The persisted ``(codebooks, rotation)`` model — ``(None,
    None)`` on a flat IVF index, rotation ``None`` on plain PQ.
    ``sub = -1`` rows are the OPQ rotation (code = row index).
    Model-sized: collect is M x k (+ dim) rows."""
    try:
        rows = snap_read(spark, _pq_books_path(path), fs=fs).collect()
    except FileNotFoundError:
        return None, None
    by_sub: dict[int, dict[int, list[float]]] = {}
    rot_rows: dict[int, list[float]] = {}
    for r in rows:
        if int(r.sub) < 0:
            rot_rows[int(r.code)] = list(r.centroid)
        else:
            by_sub.setdefault(int(r.sub), {})[int(r.code)] = list(r.centroid)
    books = [
        [by_sub[j][c] for c in sorted(by_sub[j])]
        for j in sorted(by_sub)
    ]
    rotation = (
        [rot_rows[i] for i in sorted(rot_rows)] if rot_rows else None
    )
    # a model table holding only rotation rows (cannot be produced by
    # ivf_index_init, which always writes books with a rotation) must
    # not masquerade as a PQ model
    return (books or None), rotation


def _load_centroids(
    spark: SparkSession,
    path: str,
    version: int | None,
    fs: LocalSnapshotFS | None,
) -> DataFrame:
    return snap_read(spark, _centroids_path(path), version, fs)


def _postings_columns(path: str, fs: LocalSnapshotFS | None) -> list[str]:
    """The postings table's declared column names (one manifest JSON
    read — no data touched)."""
    from .snapshots import _manifest_schema, read_manifest

    schema = _manifest_schema(read_manifest(_postings_path(path), fs=fs))
    return [f.name for f in schema.fields] if schema is not None else []


def _and_where(base: list[tuple], where) -> list:
    """AND the ``base`` conjunction onto a user predicate tree —
    distributing over DNF branches when ``where`` is the OR form, so
    the probed-cells restriction applies to every branch."""
    if not where:
        return list(base)
    parts = list(where)
    if "or" in parts:
        out: list = []
        for part in parts:
            if part == "or":
                out.append("or")
            else:
                branch = part if isinstance(part, list) else [part]
                out.append(list(base) + list(branch))
        return out
    return list(base) + parts


def ivf_index_insert(
    spark: SparkSession,
    path: str,
    new_emb: DataFrame,
    txn_app: str | None = None,
    txn_batch: int | None = None,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Append/replace vectors: assign each to its nearest existing
    centroid (broadcast K x dim scoring, no shuffle) and CoW-merge into
    the postings by ``vec_id``.  Fresh ids rewrite nothing (bloom-
    proven inserts); re-used ids replace their old posting wherever it
    lives.  On a payload-carrying index (``payload_cols`` at init) the
    batch must bring the same attribute columns — a posting without
    its payload would silently fall out of every filtered search.
    Returns the merge stats."""
    cent = _load_centroids(spark, path, None, fs).select(
        F.col("cell").cast("long").alias("k"),
        F.col("centroid").alias("carr"),
    )
    from ..operators.clustering import _assign

    payload = [
        c
        for c in _postings_columns(path, fs)
        if c not in ("vec_id", "cell", "embedding", "pq_code")
    ]
    missing = [c for c in payload if c not in new_emb.columns]
    if missing:
        raise ValueError(
            f"ivf_index_insert: index stores payload column(s) "
            f"{payload}; the batch is missing {missing}"
        )
    assigned = _assign(new_emb.select("vec_id", "embedding"), cent)
    batch = (
        new_emb.select("vec_id", "embedding", *payload)
        .join(
            assigned.select("vec_id", F.col("k").cast("int").alias("cell")),
            "vec_id",
        )
        .select("vec_id", "cell", "embedding", *payload)
    )
    books, rotation = _load_pq_model(spark, path, fs)
    if books is not None:
        from ..operators.pq import pq_encode

        batch = pq_encode(batch, "embedding", books, rotation=rotation)
    return merge_upsert_cow(
        spark,
        _postings_path(path),
        batch,
        keys=["vec_id"],
        txn_app=txn_app,
        txn_batch=txn_batch,
        fs=fs,
    )


def ivf_index_delete(
    spark: SparkSession,
    path: str,
    vec_ids,
    txn_app: str | None = None,
    txn_batch: int | None = None,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Remove vectors from the index by id — a merge-on-read delete on
    the postings table (``delete_keys_mor``): matched rows are masked
    by a deletion vector, no cell file is rewritten, and searches stop
    returning them immediately (``snap_scan`` applies DVs).  The
    masked-row debt is paid by the next rewrite of those files
    (``ivf_index_insert`` re-using an id, ``ivf_rebalance``, or the
    table's own ``auto_compact``).  ``vec_ids`` is an iterable of ids
    or a DataFrame with a ``vec_id`` column."""
    if not isinstance(vec_ids, DataFrame):
        vec_ids = spark.createDataFrame(
            [(int(v),) for v in vec_ids], "vec_id long"
        )
    return delete_keys_mor(
        spark,
        _postings_path(path),
        vec_ids.select("vec_id"),
        keys=["vec_id"],
        txn_app=txn_app,
        txn_batch=txn_batch,
        fs=fs,
    )


def ivf_cell_stats(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    fs: LocalSnapshotFS | None = None,
) -> DataFrame:
    """Cell-occupancy audit: live posting count per cell (deletion
    vectors applied).  One scan + one K-row shuffle; cells whose count
    is far above the median are probe-cost hot spots —
    ``ivf_rebalance`` is the remedy."""
    return (
        snap_read(spark, _postings_path(path), version, fs)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def ivf_repair(
    spark: SparkSession,
    path: str,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Re-attach orphaned cells to the quantizer.

    A rebalance lands TWO commits on two tables (postings move, then
    centroid swap); a crash between them leaves postings assigned to
    cells the centroids table does not list — probes would never
    select those cells, silently hiding their vectors.  This repairs
    that window: any cell present in the postings but absent from the
    centroids gets a centroid recomputed as its postings' per-dimension
    mean (exactly the k-means update step, so the repaired quantizer
    is what the interrupted split was converging to).  Idempotent; a
    healthy index is a no-op.  ``ivf_rebalance`` runs it first, so a
    crashed rebalance is healed by the next one (or by calling this
    directly).

    Also heals an INTERRUPTED REFIT (``ivf_refit`` crash between its
    postings and centroids overwrites) — a window the orphan check
    cannot see when the cell count is unchanged: the refit's shared
    ``("ivf_refit", N)`` txn marker landing on the postings but not
    the centroids identifies it, and the centroids table is rebuilt
    as the per-cell means of the already-committed new assignments
    (the k-means update the crashed refit was about to write)."""
    from .snapshots import read_manifest

    p_txn = read_manifest(_postings_path(path), fs=fs).get(
        "txns", {}
    ).get("ivf_refit")
    c_txn = read_manifest(_centroids_path(path), fs=fs).get(
        "txns", {}
    ).get("ivf_refit")
    if p_txn is not None and (c_txn is None or int(c_txn) < int(p_txn)):
        post = snap_read(spark, _postings_path(path), fs=fs)
        means = (
            post.select("cell", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "cell",
                F.transform(F.col("pm"), lambda s: s["m"]).alias(
                    "centroid"
                ),
            )
        )
        cent_df = spark.createDataFrame(
            [
                (int(r["cell"]), [float(x) for x in r["centroid"]])
                for r in means.collect()
            ],
            snap_read(spark, _centroids_path(path), fs=fs).schema,
        )
        snap_overwrite(
            spark, _centroids_path(path), cent_df,
            txn_app="ivf_refit", txn_batch=int(p_txn), fs=fs,
        )
        return {
            "repaired_cells": sorted(
                int(r["cell"]) for r in cent_df.collect()
            ),
            "refit_completed": True,
        }
    post_cells = {
        r["cell"]
        for r in snap_read(spark, _postings_path(path), fs=fs)
        .select("cell")
        .distinct()
        .collect()
    }
    cent_cells = {
        r["cell"]
        for r in snap_read(spark, _centroids_path(path), fs=fs)
        .select("cell")
        .collect()
    }
    orphans = sorted(post_cells - cent_cells)
    if not orphans:
        return {"repaired_cells": []}
    means = (
        snap_scan(
            spark, _postings_path(path), [("cell", "in", orphans)], fs=fs
        )
        .select("cell", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("pm")
        )
        .select(
            "cell",
            F.transform(F.col("pm"), lambda s: s["m"]).alias("centroid"),
        )
    )
    cent_schema = snap_read(spark, _centroids_path(path), fs=fs).schema
    batch = spark.createDataFrame(
        [
            (int(r["cell"]), [float(x) for x in r["centroid"]], "U")
            for r in means.collect()
        ],
        StructType(
            list(cent_schema.fields) + [StructField("_op", StringType())]
        ),
    )
    apply_cdc_cow(spark, _centroids_path(path), batch, keys=["cell"], fs=fs)
    return {"repaired_cells": orphans}


def ivf_rebalance(
    spark: SparkSession,
    path: str,
    skew_factor: float = 4.0,
    max_splits: int = 2,
    seed: int = 43,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Budgeted re-cluster of overgrown cells (the
    ``optimize_incremental`` shape applied to the quantizer): cells
    holding more than ``skew_factor`` x the median posting count are
    split in two by a seeded k-means over JUST that cell's vectors —
    at most ``max_splits`` cells per run, so each invocation's cost is
    bounded by the offenders, never the index.  The split cell's
    centroid is replaced by the two sub-centroids (fresh cell ids) and
    its postings are CoW-merged to their new cells, so probe cost in
    that region is re-bounded while every other cell's files are
    carried untouched.  Inserts keep assigning to nearest-centroid —
    the quantizer stays frozen BETWEEN rebalances, exactly IVF's
    contract.  Repeated churn converges like repeated
    ``optimize_incremental`` runs: worst offender first, budget per
    run.  Returns ``{"split_cells", "new_cells", "median", "max_over_
    median_before", "repaired_cells"}``.

    Crash semantics: each split is two commits (postings move, then
    centroid swap — not atomic across tables).  A crash between them
    leaves the moved postings in cells the quantizer doesn't list yet;
    ``ivf_repair`` (run first thing here) re-attaches such orphan
    cells, so the window costs one healing pass, never silent recall
    loss.  A crash after the postings move can also leave the OLD
    centroid pointing at a now-empty cell — harmless (a probe of an
    empty cell reads nothing) and cleared by the completed retry."""
    import statistics

    from ..operators.clustering import kmeans_pp_fit

    repaired = ivf_repair(spark, path, fs=fs)["repaired_cells"]
    counts = {
        r["cell"]: r["n_vectors"]
        for r in ivf_cell_stats(spark, path, fs=fs).collect()
    }
    if not counts:
        return {
            "split_cells": [],
            "new_cells": [],
            "median": 0,
            "max_over_median_before": 0.0,
            "repaired_cells": repaired,
        }
    med = statistics.median(counts.values())
    ratio_before = max(counts.values()) / max(med, 1)
    skewed = sorted(
        (c for c, n in counts.items() if n > skew_factor * med),
        key=lambda c: -counts[c],
    )[:max_splits]
    if not skewed:
        return {
            "split_cells": [],
            "new_cells": [],
            "median": med,
            "max_over_median_before": ratio_before,
            "repaired_cells": repaired,
        }
    cent_schema = snap_read(spark, _centroids_path(path), fs=fs).schema
    next_id = (
        max(
            r["cell"]
            for r in snap_read(spark, _centroids_path(path), fs=fs)
            .select("cell")
            .collect()
        )
        + 1
    )
    new_cells: list[int] = []
    for c in skewed:
        cell_rows = snap_scan(
            spark, _postings_path(path), [("cell", "=", c)], fs=fs
        ).drop("cell")
        _assigned, _rounds, cents = kmeans_pp_fit(
            spark, cell_rows.select("vec_id", "embedding"), k=2,
            seed=seed, return_centroids=True,
        )
        ids = {int(k): next_id + i for i, (k, _arr) in enumerate(cents)}
        labels = {
            int(r["cluster"])
            for r in _assigned.select("cluster").distinct().collect()
        }
        if not labels <= set(ids):
            # a NULL-cell posting would never be probed — silent recall
            # loss; fail loudly instead (the fit returned centroids
            # that do not cover its own assignment's label set)
            raise RuntimeError(
                f"ivf_rebalance: split of cell {c} assigned labels "
                f"{sorted(labels - set(ids))} with no returned centroid"
            )
        cell_expr = F.lit(None).cast("int")
        for k, new_id in ids.items():
            cell_expr = F.when(
                F.col("_sub") == F.lit(k), F.lit(new_id)
            ).otherwise(cell_expr)
        carry = [col for col in cell_rows.columns if col != "vec_id"]
        batch = (
            cell_rows.join(
                _assigned.select(
                    "vec_id", F.col("cluster").alias("_sub")
                ),
                "vec_id",
            )
            .select(
                "vec_id",
                cell_expr.cast("int").alias("cell"),
                # pq_code and any future posting payload carries along:
                # moving a vector between cells never re-encodes it
                *carry,
            )
        )
        merge_upsert_cow(
            spark, _postings_path(path), batch, keys=["vec_id"], fs=fs
        )
        cent_batch = spark.createDataFrame(
            [(int(c), None, "D")]
            + [
                (ids[int(k)], [float(x) for x in arr], "U")
                for k, arr in cents
            ],
            StructType(
                list(cent_schema.fields)
                + [StructField("_op", StringType())]
            ),
        )
        apply_cdc_cow(
            spark, _centroids_path(path), cent_batch, keys=["cell"], fs=fs
        )
        new_cells += sorted(ids.values())
        next_id += len(ids)
    return {
        "split_cells": [int(c) for c in skewed],
        "new_cells": new_cells,
        "median": med,
        "max_over_median_before": ratio_before,
        "repaired_cells": repaired,
    }


def ivf_merge_cells(
    spark: SparkSession,
    path: str,
    sparse_factor: float = 0.25,
    max_merges: int = 2,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Budgeted merge of UNDER-occupied cells — ``ivf_rebalance``'s
    mirror image.  Churn (deletes, skewed inserts, past splits) leaves
    cells holding far fewer postings than the median; each one still
    costs a probe slot and a file-open on every query that selects it,
    so nprobe budget is spent reading near-empty cells instead of
    candidates (probe cost up, recall per probe down).

    Cells with fewer than ``sparse_factor`` x median postings (and
    cells with ZERO postings — pure quantizer litter) are merged into
    their NEAREST sibling centroid, at most ``max_merges`` per run (the
    ``optimize_incremental`` budget shape: each run's rewrite cost is
    bounded by the offenders' postings, never the index).  The
    surviving centroid moves to the posting-count-weighted mean of the
    pair — exactly the k-means update for the union cell.  Commit
    order matches the split path (postings move first, then the
    centroid CDC), so a crash mid-merge leaves only the already-listed
    target cell fatter plus a stale empty-cell centroid — harmless,
    finished by the retry; ``ivf_repair`` stays a no-op because no
    posting ever references a missing centroid.  Returns
    ``{"merged", "median"}`` with ``merged`` = [(source, target)]."""
    cent_rows = {
        int(r["cell"]): [float(x) for x in r["centroid"]]
        for r in snap_read(spark, _centroids_path(path), fs=fs).collect()
    }
    if len(cent_rows) < 2:
        return {"merged": [], "median": 0}
    counts = {
        int(r["cell"]): r["n_vectors"]
        for r in ivf_cell_stats(spark, path, fs=fs).collect()
    }
    import statistics

    med = statistics.median(
        [counts.get(c, 0) for c in cent_rows]
    )
    sparse = sorted(
        (
            c
            for c in cent_rows
            if counts.get(c, 0) < sparse_factor * max(med, 1)
        ),
        key=lambda c: counts.get(c, 0),
    )[:max_merges]
    cent_schema = snap_read(spark, _centroids_path(path), fs=fs).schema
    merged: list[tuple[int, int]] = []
    retired: set[int] = set()

    def _cos(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb) if na and nb else 0.0

    for c in sparse:
        if c in retired or len(cent_rows) - len(retired) < 2:
            continue
        # nearest surviving sibling (driver-side over K x dim — tiny)
        target = max(
            (t for t in cent_rows if t != c and t not in retired),
            key=lambda t: (_cos(cent_rows[c], cent_rows[t]), -t),
        )
        n_c, n_t = counts.get(c, 0), counts.get(target, 0)
        if n_c:
            src_rows = snap_scan(
                spark, _postings_path(path), [("cell", "=", c)], fs=fs
            )
            carry = [
                col for col in src_rows.columns
                if col not in ("vec_id", "cell")
            ]
            batch = src_rows.select(
                "vec_id",
                F.lit(int(target)).cast("int").alias("cell"),
                *carry,
            )
            merge_upsert_cow(
                spark, _postings_path(path), batch, keys=["vec_id"], fs=fs
            )
        if n_c:
            total = n_c + n_t
            new_t = [
                (n_c * a + n_t * b) / total
                for a, b in zip(cent_rows[c], cent_rows[target])
            ]
            ops = [(int(c), None, "D"), (int(target), new_t, "U")]
        else:
            # zero-posting source: pure quantizer litter — deleting its
            # centroid is the whole merge.  The target must NOT move
            # (an empty-into-empty merge would otherwise write an
            # all-zeros centroid: NaN cosine, silent quantizer
            # corruption)
            new_t = cent_rows[target]
            ops = [(int(c), None, "D")]
        cent_batch = spark.createDataFrame(
            ops,
            StructType(
                list(cent_schema.fields)
                + [StructField("_op", StringType())]
            ),
        )
        apply_cdc_cow(
            spark, _centroids_path(path), cent_batch, keys=["cell"], fs=fs
        )
        cent_rows[target] = new_t
        counts[target] = n_c + n_t
        retired.add(c)
        merged.append((int(c), int(target)))
    return {"merged": merged, "median": med}


def ivf_drift_stats(
    spark: SparkSession,
    path: str,
    refit_threshold: float = 1.25,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Quantizer drift check: mean assignment distance of the CURRENT
    postings vs the fit-time baseline recorded at ``ivf_index_init``.

    The quantizer is frozen between re-trains (IVF's contract), so a
    distribution shift in the inserted vectors shows up exactly here —
    vectors land ever farther from their nearest centroid, candidate
    lists get less selective, and recall at fixed nprobe decays.
    ``drift_ratio > refit_threshold`` recommends ``ivf_refit`` (the
    scheduled re-quantization); indexes created before drift tracking
    report ``baseline None`` and never recommend.  Cost: one joined
    scan + O(1)-row aggregate — cheap enough for a maintenance cron."""
    cent = snap_read(spark, _centroids_path(path), fs=fs)
    now = _mean_assign_dist(
        snap_read(spark, _postings_path(path), fs=fs), cent
    )
    meta = _read_meta(spark, path, fs)
    baseline = meta.get("drift_baseline")
    if baseline is None:
        ratio = None  # pre-drift-tracking index: never recommend
    elif baseline == 0.0:
        # a perfect fit (every vector on its centroid) is a legal
        # baseline: ANY positive drift is infinite relative drift
        ratio = float("inf") if now > 0.0 else 1.0
    else:
        ratio = now / baseline
    return {
        "mean_dist_now": now,
        "baseline": baseline,
        "drift_ratio": ratio,
        "refit_recommended": bool(
            ratio is not None and ratio > refit_threshold
        ),
    }


def ivf_refit(
    spark: SparkSession,
    path: str,
    n_cells: int | None = None,
    seed: int = 42,
    fs: LocalSnapshotFS | None = None,
) -> dict:
    """Scheduled re-quantization IN PLACE: re-train the coarse
    quantizer on the index's CURRENT live vectors and overwrite the
    centroids + postings tables as new committed versions (old
    versions stay time-travelable until GC — a bad refit is one
    ``snap_restore`` away, unlike the rebuild-at-new-path recipe).
    Resets the drift baseline to the fresh fit's assignment quality.
    This is the remedy ``ivf_drift_stats`` schedules; cost is a full
    re-cluster + full postings rewrite, which is exactly why it runs
    on the drift TRIGGER instead of a timer."""
    from ..operators.clustering import kmeans_pp_fit

    meta = _read_meta(spark, path, fs)
    if n_cells is None:
        n_cells = int(meta.get("n_cells") or N_CELLS)
    emb = snap_read(spark, _postings_path(path), fs=fs).drop("cell")
    assign, _rounds, cent_rows = kmeans_pp_fit(
        spark, emb.select("vec_id", "embedding"), k=n_cells, seed=seed,
        return_centroids=True,
    )
    cent_df = spark.createDataFrame(
        cent_rows, "k long, carr array<double>"
    ).select(
        F.col("k").cast("int").alias("cell"),
        F.col("carr").alias("centroid"),
    )
    carry = [col for col in emb.columns if col != "vec_id"]
    postings = (
        emb.join(
            assign.select("vec_id", F.col("cluster").alias("cell")),
            "vec_id",
        )
        .select(
            "vec_id", F.col("cell").cast("int").alias("cell"), *carry
        )
        .repartitionByRange(max(2, n_cells // 2), "cell")
        .sortWithinPartitions("cell", "vec_id")
    )
    # crash window: the two overwrites are separate commits on two
    # tables, and (unlike an interrupted split) a crash between them
    # leaves NO orphan cell when n_cells is unchanged — new assignments
    # under old centroids, silent recall loss.  A shared txn marker
    # makes the window DETECTABLE: postings commit first carrying
    # ("ivf_refit", N); the centroid overwrite carries the same N, so
    # marker inequality == interrupted refit, and ivf_repair finishes
    # the job by rebuilding every centroid from its postings' means.
    from .snapshots import current_version

    marker = current_version(_postings_path(path), fs) + 1
    pv = snap_overwrite(
        spark, _postings_path(path), postings,
        txn_app="ivf_refit", txn_batch=marker, fs=fs,
    )
    cv = snap_overwrite(
        spark, _centroids_path(path), cent_df,
        txn_app="ivf_refit", txn_batch=marker, fs=fs,
    )
    baseline = _mean_assign_dist(
        snap_read(spark, _postings_path(path), fs=fs), cent_df
    )
    _write_meta(
        spark, path, baseline, n_cells, seed, fs,
        create=not meta,
    )
    return {
        "cells": n_cells,
        "centroids_version": cv["version"],
        "postings_version": pv["version"],
        "drift_baseline": baseline,
    }


# ADC searches collect the query batch driver-side to build per-query
# lookup tables (M x k floats each, ~16 KB at the default M=32/k=64):
# bigger batches are sharded INTERNALLY into slices of this size, so no
# one UDF closure ever carries more than ~16 MB of LUTs — the scan runs
# once per slice against only that slice's probed cells, and the
# exact re-rank happens once over the union of candidates.  The whole
# batch is still driver-resident (LUTs are driver-built); a
# million-query workload should use method="exact", which never
# collects the query side.
ADC_QUERY_MAX = 1024

# ... and that driver residency needs a HARD ceiling: past it the
# accumulated candidate pairs (queries x rerank_factor x top_k rows)
# plus the query rows themselves stop being "driver-held bounded
# state" and become an OOM (16384 queries x a typical 4x50 re-rank is
# ~3.3M pair rows — the sane upper end).  Oversized batches fail fast
# with a pointer at method="exact" instead of killing the driver.
ADC_BATCH_HARD_MAX = 16384


def ivf_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = N_PROBE,
    top_k: int = TOP_K,
    version: int | None = None,
    broadcast_queries: bool | None = None,
    fs: LocalSnapshotFS | None = None,
    method: str = "exact",
    rerank_factor: int = 4,
    where: list | None = None,
) -> DataFrame:
    """Top-k cosine search: probe the ``nprobe`` nearest cells per
    query, read ONLY the probed cells' files (``snap_scan`` manifest
    pruning on the cell-clustered postings), exact re-rank inside.

    ``where`` (the ``snap_scan`` grammar, over payload columns stored
    at init via ``payload_cols``) makes the search FILTERED with
    pre-filter semantics: candidates are restricted to matching rows
    BEFORE any scoring, so the result is the true top-k of the
    filtered set — never a post-filtered top-k that comes back short.
    Works on both methods (the ADC codes scan carries the filter too);
    payload stats on the postings files let selective filters prune
    beyond the probed-cell pruning.

    ``queries`` is ``(q_id, q_emb)``; returns ``q_id, neighbor_id,
    cos_sim, rank`` (the query's own id is not excluded — filter
    downstream if self-matches are unwanted).  ``version`` time-travels
    the POSTINGS (the quantizer is read at its matching CURRENT).

    ``broadcast_queries``: the per-query side is broadcast into the
    candidate scan while it stays under ``QUERY_BROADCAST_MAX_ROWS``
    (one count of the small frame decides when ``None``); a huge query
    batch instead shuffle-joins on ``cell`` then ``q_id`` — shipping a
    million queries to every scan task would invert the win.

    ``method="adc"`` (IVF-PQ index only): the probed cells are scanned
    reading ONLY the ``pq_code`` column (parquet column pruning — at
    100 TB the probe read drops from cell-vectors to cell-codes, a
    ~KB->bytes per row shrink), candidates are scored by PQ lookup
    tables, the top ``rerank_factor * top_k`` per query fetch their
    raw vectors through a bloom-pruned ``vec_id IN`` point scan, and
    the emitted ranking is EXACT cosine over that candidate set —
    quantization only chooses candidates, like operators/pq.py.
    Query batches bigger than ``ADC_QUERY_MAX`` are sharded internally
    (one codes-only scan per slice, one union re-rank); the batch is
    driver-resident either way because the LUTs are driver-built —
    truly huge query sets belong on ``method="exact"``."""
    if method not in ("exact", "adc"):
        raise ValueError(f"unknown search method {method!r}")
    if where:
        from .snapshots import _parse_dnf

        post_cols = set(_postings_columns(path, fs))
        bad = sorted(
            {
                p[0]
                for b in _parse_dnf(where)
                for p in b
                if p[0] not in post_cols
            }
        )
        if bad:
            raise ValueError(
                f"ivf_search: filter column(s) {bad} not stored on the "
                "postings — build the index with ivf_index_init(..., "
                f"payload_cols={bad})"
            )
    cent = _load_centroids(spark, path, None, fs)
    probes = (
        queries.crossJoin(F.broadcast(cent))
        .select(
            "q_id",
            "cell",
            cosine(F.col("q_emb"), F.col("centroid")).alias("cos_qc"),
        )
        .withColumn(
            "cell_rank",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("cos_qc"), F.asc("cell")
                )
            ),
        )
        .filter(F.col("cell_rank") <= nprobe)
        .select("q_id", "cell")
    )
    probe_cells = sorted(
        {r["cell"] for r in probes.select("cell").distinct().collect()}
    )
    if not probe_cells:
        return (
            queries.select("q_id")
            .limit(0)
            .select(
                "q_id",
                F.lit(None).cast("long").alias("neighbor_id"),
                F.lit(None).cast("double").alias("cos_sim"),
                F.lit(None).cast("int").alias("rank"),
            )
        )
    if method == "adc":
        return _adc_search(
            spark, path, queries, probes, top_k,
            rerank_factor, version, fs, where,
        )
    cand = snap_scan(
        spark,
        _postings_path(path),
        _and_where([("cell", "in", probe_cells)], where),
        version=version,
        fs=fs,
    ).select("vec_id", "cell", "embedding")
    if broadcast_queries is None:
        # bounded probe, not a full count: deciding "over the
        # threshold?" must not scan an arbitrarily large query set
        broadcast_queries = (
            queries.limit(QUERY_BROADCAST_MAX_ROWS + 1).count()
            <= QUERY_BROADCAST_MAX_ROWS
        )
    if broadcast_queries:
        probes, queries = F.broadcast(probes), F.broadcast(queries)
    scored = (
        cand.join(probes, "cell")
        .join(queries, "q_id")
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_k
    )


def _adc_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    probes: DataFrame,
    top_k: int,
    rerank_factor: int,
    version: int | None,
    fs: LocalSnapshotFS | None,
    where: list | None = None,
) -> DataFrame:
    """The IVF-PQ scan half of ``ivf_search`` (see its docstring).
    ``where`` rides the codes scan (pre-filter: non-matching rows are
    never scored), so filtered ADC keeps the exact-cosine contract
    over the FILTERED candidate set.

    Batches past ``ADC_QUERY_MAX`` are sharded here: each slice of
    queries carries its own LUT closure and scans ONLY the cells that
    slice probes (codes-only, column-pruned), the per-slice top
    ``rerank_factor * top_k`` candidates accumulate driver-side
    (bounded: queries × rerank candidates), and the exact re-rank
    runs once over the union — answers are identical to running the
    slices as separate calls, minus the duplicate vector fetches."""
    from ..operators.pq import adc_tables, make_adc_scorer

    books, rotation = _load_pq_model(spark, path, fs)
    if books is None:
        raise ValueError(
            f"ivf_search(method='adc'): index at {path!r} has no PQ "
            "codebooks — build it with ivf_index_init(..., pq_m=...)"
        )
    # fail fast BEFORE any collect: a bounded limit(n+1).count() probe,
    # never a full count of an arbitrarily large query set
    if (
        queries.limit(ADC_BATCH_HARD_MAX + 1).count()
        > ADC_BATCH_HARD_MAX
    ):
        raise ValueError(
            f"ivf_search(method='adc'): query batch exceeds "
            f"ADC_BATCH_HARD_MAX={ADC_BATCH_HARD_MAX} (LUTs and "
            "candidate pairs are driver-built/driver-held); use "
            "method='exact' for huge batches — it never collects the "
            "query side"
        )
    q_rows = queries.collect()
    probe_rows = probes.collect()
    cells_by_q: dict = {}
    for r in probe_rows:
        cells_by_q.setdefault(int(r.q_id), []).append(r.cell)
    wc = Window.partitionBy("q_id").orderBy(
        F.desc("adc"), F.asc("vec_id")
    )
    pairs = []
    for lo in range(0, len(q_rows), ADC_QUERY_MAX):
        chunk = q_rows[lo : lo + ADC_QUERY_MAX]
        luts = {
            int(r.q_id): adc_tables(list(r.q_emb), books, rotation)
            for r in chunk
        }
        chunk_cells = sorted(
            {c for qid in luts for c in cells_by_q.get(qid, [])}
        )
        if not chunk_cells:
            continue
        chunk_probes = spark.createDataFrame(
            [
                (int(r.q_id), r.cell)
                for r in probe_rows
                if int(r.q_id) in luts
            ],
            probes.schema,
        )
        adc_score = make_adc_scorer(luts)
        # codes-only scan of this slice's probed cells: the wide
        # embedding column's bytes are never read here (parquet
        # column pruning)
        codes = snap_scan(
            spark,
            _postings_path(path),
            _and_where([("cell", "in", chunk_cells)], where),
            version=version,
            fs=fs,
        ).select("vec_id", "cell", "pq_code")
        cand = (
            codes.join(F.broadcast(chunk_probes), "cell")
            .withColumn(
                "adc", adc_score(F.col("q_id"), F.col("pq_code"))
            )
            .withColumn("crank", F.row_number().over(wc))
            .filter(F.col("crank") <= top_k * rerank_factor)
            .select("q_id", "vec_id")
        )
        # bounded by queries x rerank candidates: ONE materialization
        # of each slice's ADC scan (reused for the re-rank join), and
        # a driver-held id list turning the vector fetch into a
        # bloom/row-group-pruned point scan
        pairs.extend(cand.collect())
    cand = spark.createDataFrame(
        [(int(r.q_id), int(r.vec_id)) for r in pairs],
        "q_id long, vec_id long",
    )
    ids = sorted({int(r.vec_id) for r in pairs})
    if not ids:
        return (
            queries.select("q_id")
            .limit(0)
            .select(
                "q_id",
                F.lit(None).cast("long").alias("neighbor_id"),
                F.lit(None).cast("double").alias("cos_sim"),
                F.lit(None).cast("int").alias("rank"),
            )
        )
    vecs = snap_scan(
        spark,
        _postings_path(path),
        [("vec_id", "in", ids)],
        version=version,
        fs=fs,
    ).select("vec_id", "embedding")
    scored = (
        cand.join(vecs, "vec_id")
        .join(F.broadcast(queries), "q_id")
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_k
    )
