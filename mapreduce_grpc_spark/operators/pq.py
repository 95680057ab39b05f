"""Product quantization (PQ) ANN over the ``embeddings`` table.

The compression half of the 100 TB similarity story (Jégou et al.
2011, the faiss ``IVFPQ`` shape): a 64-dim float32 vector is 256 bytes;
its PQ code is one centroid id per subspace — at the shipped
``M = 32`` subspaces with ``k = 64``-entry codebooks that is a 192-bit
(6 bit × 32) code, a ~10.7x shrink vs the raw vector, far larger for
production 1024-dim configs.  The config sits on a measured
recall-vs-bits curve (``tools/pq_recall_curve.py``, PLANS.md r11):
the round-10 80-bit default's recall@5 declined 1.0/0.98/0.92 across
sf 0.001/0.01/0.1, while 192-bit codes hold 1.0 at sf0.1 for ~2.4x
the code bytes — still bytes per row where the raw vector is a
quarter KB.  At 100 TB of raw embeddings the ADC scan touches only
the code relation; the full vectors are read back ONLY for the top
candidates' exact re-rank.

Spark decomposition (fit-small / transform-all, the same split as
SemDeDup and k-means in this codebase):

- **fit** (``pq_fit``): per-subspace k-means codebooks trained
  driver-local on a deterministic hash-sample (codebooks are
  model-sized: M·k·(dim/M) floats); zero per-iteration Spark jobs.
- **encode** (``pq_encode``): ONE distributed pass; an Arrow-batched
  pandas UDF argmins each subvector against its codebook —
  vectorized numpy, O(rows · k · dim) flops, no shuffle.
- **search** (``pq_topk``): per query, an M×k lookup table of partial
  dot products / norms turns each candidate's approximate cosine into
  M table lookups (asymmetric distance computation — the query stays
  exact, only the database side is quantized).  The scored relation
  keeps the top ``RERANK_FACTOR × k`` candidates per query by ADC
  score, then re-ranks EXACTLY on the raw vectors — so the output
  ranking is always true cosine; PQ only chooses the candidate set.

No SQL oracle (k-means fit is iterative and data-dependent), so
``pq_topk`` is AUX with pytest pinning instead: ADC scores equal a
pure-numpy reference bit-for-bit, recall@5 against the exact
``similarity_topk`` is measured and bounded, and the query is
deterministic end-to-end (hash-seeded fit, (score DESC, id ASC)
tie-breaks).  Reference scope: the reference engine has no vector
surface at all (its values are strings, SURVEY.md §1.2) — this is
north-star LLM-pipeline capability, like the rest of this module's
neighbors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.vectors import cosine

# shipped config = the cheapest point holding recall@5 >= 0.95 at
# sf0.1 on the measured curve (tools/pq_recall_curve.py; PLANS.md r11)
M_SUBSPACES = 32    # subvectors per embedding (dim 64 -> 2 dims each)
K_CODES = 64        # centroids per subspace codebook
FIT_SAMPLE = 50_000  # driver-local fit cap (SemDeDup's bound)
N_QUERIES = 10
TOP_K = 5
RERANK_FACTOR = 10  # ADC keeps 10x top-k candidates for the exact pass


def _sample_rows(emb: DataFrame, seed: int, sample_cap: int) -> list:
    """Deterministic hash-sample of the embedding relation as collected
    rows (vec_id, embedding, h).  One distributed sort-limit; the
    result is model-fit-sized regardless of corpus size."""
    return (
        emb.select(
            "vec_id", "embedding",
            F.xxhash64("vec_id", F.lit(seed)).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(sample_cap)
        .collect()
    )


def _rows_matrix(sample: list):
    """The sample rows as a float64 matrix (rows = vectors)."""
    import numpy as np

    if not sample:
        raise ValueError("pq_fit: empty embedding relation")
    return np.stack([list(r.embedding) for r in sample]).astype(np.float64)


def _sample_matrix(emb: DataFrame, seed: int, sample_cap: int):
    """Deterministic hash-sample of the embedding relation as a
    float64 matrix (rows = vectors).  One distributed sort-limit; the
    result is model-fit-sized regardless of corpus size."""
    return _rows_matrix(_sample_rows(emb, seed, sample_cap))


def _lloyd(Xj, C, iters: int):
    """Lloyd's algorithm from the given centroids, at most ``iters``
    rounds.  Centroid update via per-dim bincount sums — O(n·sub) per
    iteration with no Python loop over the k centroids.  bincount
    accumulates sequentially where a masked ``.mean`` would use
    pairwise summation, so centroids can move in their LAST BITS vs
    older builds: fine — fit is deterministic run-to-run, and every
    downstream gate (ADC identity, recall, agreement) is a floor, not
    a bit-pin on the codebooks.

    r15 optimization: the iteration body reuses preallocated ``out=``
    buffers for the (n × k) distance matrix and the Gram product
    instead of allocating ~5 temporaries per round — the loop at
    fit-sample scale is allocator/overhead-bound, not flops-bound
    (measured 256 warm-start calls ≈ 2.3 s inside one opq fit).  Each
    element-wise op is the SAME op on the same operands in the same
    order, so the fixpoint is bit-identical to the allocating form
    (A/B-checked over the full opq fit before landing); the
    convergence check is ``np.allclose``'s documented formula inlined
    (|new − C| ≤ atol + rtol·|C|), skipping its wrapper overhead."""
    import numpy as np

    x_sq = (Xj**2).sum(axis=1)[:, None]
    n, subd = Xj.shape
    kk = len(C)
    D = np.empty((n, kk), dtype=np.float64)
    G = np.empty((n, kk), dtype=np.float64)
    sums = np.empty((kk, subd), dtype=np.float64)
    for _ in range(iters):
        np.matmul(Xj, C.T, out=G)
        np.multiply(G, 2.0, out=G)
        np.add(x_sq, (C**2).sum(axis=1)[None, :], out=D)
        np.subtract(D, G, out=D)
        lab = D.argmin(axis=1)
        counts = np.bincount(lab, minlength=kk).astype(np.float64)
        for dd in range(subd):
            sums[:, dd] = np.bincount(
                lab, weights=Xj[:, dd], minlength=kk
            )
        newC = np.where(
            (counts > 0)[:, None], sums / np.maximum(counts, 1.0)[:, None], C
        )
        # np.allclose(newC, C) inlined: same rtol/atol semantics
        if bool(
            (np.abs(newC - C) <= 1e-8 + 1e-5 * np.abs(C)).all()
        ):
            break
        C = newC
    return C


# below this many sample rows the batched Lloyd loses to the per-
# subspace loop (cache locality beats call-count, measured at n=2000:
# 0.73 s/loop vs 0.79-1.6 s/batch; at n=20000 the batch wins 71->60 s)
_LLOYD_BATCH_MIN_N = 10_000


def _lloyd_batch(X, books: list, iters: int, sub: int) -> list:
    """Run ``_lloyd`` for EVERY subspace of ``X`` in one batched loop
    (r16, guide §1.2 per-task work): one ufunc/argmin/bincount call per
    iteration over a ``(active, n, k)`` stack instead of ~16 small
    numpy calls × M subspaces × iterations — the fit at sample scale is
    Python-call-overhead bound, not flops-bound (measured 1.4 s of
    pure ``_lloyd`` frame time inside one opq fit).

    Bit-identical to the per-subspace ``_lloyd`` loop by construction,
    and A/B-gated on the real fixture before landing:

    - the matmul stays a PER-SLICE call on the same column views of
      ``X`` (byte-identical operands → the same BLAS kernel; a stacked
      3-D matmul may pick a different kernel and flip low bits),
    - every elementwise op broadcasts over the stack (same op, same
      operands, same order per slice),
    - the per-slice bincounts fuse via offset labels (each bin still
      accumulates its own slice's values in the same row order —
      bincount is sequential in input order),
    - convergence freezes a slice at its PRE-update centroids, exactly
      like ``_lloyd``'s break-before-assign, while the others keep
      iterating.
    """
    import numpy as np

    m = len(books)
    n = X.shape[0]
    out: list = [None] * m
    cur = [np.asarray(C) for C in books]
    kk = len(cur[0])
    if any(len(C) != kk for C in cur):
        # ragged codebooks (len(Xj) < k edge case): per-subspace path
        return [
            _lloyd(X[:, j * sub : (j + 1) * sub], C, iters)
            for j, C in enumerate(cur)
        ]
    # per-slice x_sq: same square + last-axis pairwise sum as _lloyd
    x_sq_all = np.stack(
        [
            (X[:, j * sub : (j + 1) * sub] ** 2).sum(axis=1)
            for j in range(m)
        ]
    )
    active = np.arange(m)
    G = np.empty((m, n, kk), dtype=np.float64)
    D = np.empty((m, n, kk), dtype=np.float64)
    for _ in range(iters):
        a = len(active)
        Ca = np.stack([cur[j] for j in active])
        Ga, Da = G[:a], D[:a]
        for i, j in enumerate(active):
            # same operands as _lloyd's np.matmul(Xj, C.T, out=G):
            # the identical column view of X and the identical C
            np.matmul(X[:, j * sub : (j + 1) * sub], cur[j].T, out=Ga[i])
        np.multiply(Ga, 2.0, out=Ga)
        np.add(
            x_sq_all[active][:, :, None],
            (Ca**2).sum(axis=2)[:, None, :],
            out=Da,
        )
        np.subtract(Da, Ga, out=Da)
        lab = Da.argmin(axis=2)
        offs = np.arange(a, dtype=np.intp)[:, None] * kk
        flat = (lab + offs).ravel()
        counts = (
            np.bincount(flat, minlength=a * kk)
            .reshape(a, kk)
            .astype(np.float64)
        )
        sums = np.empty((a, kk, sub), dtype=np.float64)
        for dd in range(sub):
            w = np.stack(
                [X[:, j * sub + dd] for j in active]
            ).ravel()
            sums[:, :, dd] = np.bincount(
                flat, weights=w, minlength=a * kk
            ).reshape(a, kk)
        newC = np.where(
            (counts > 0)[:, :, None],
            sums / np.maximum(counts, 1.0)[:, :, None],
            Ca,
        )
        conv = (np.abs(newC - Ca) <= 1e-8 + 1e-5 * np.abs(Ca)).all(
            axis=(1, 2)
        )
        still = []
        for i, j in enumerate(active):
            if conv[i]:
                out[j] = Ca[i]  # pre-update, like _lloyd's break
            else:
                cur[j] = newC[i]
                still.append(j)
        if not still:
            break
        active = np.asarray(still, dtype=np.intp)
    for j in range(m):
        if out[j] is None:
            out[j] = cur[j]
    return out


def _fit_books_np(X, m: int, k: int, seed: int) -> list:
    """Per-subspace k-means++ init + Lloyd on a sample matrix.
    Returns ``list[np.ndarray (k × dim/m)]`` — the numpy core shared
    by ``pq_fit`` and ``opq_fit`` (same arithmetic, bit-identical to
    the pre-refactor inline loop)."""
    import numpy as np

    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    sub = dim // m
    inits = []
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        rng = np.random.RandomState(seed * 1000 + j)
        cents = [Xj[rng.randint(len(Xj))]]
        # k-means++ with the standard incremental trick: keep the
        # running min-distance and fold in ONLY the newest center —
        # O(k·n) instead of the O(k²·n) recompute-all loop this
        # replaced.  min is exact in floating point, so d2 (and hence
        # every rng draw and the final books) is bit-identical.
        d2 = ((Xj - cents[0]) ** 2).sum(axis=1)
        # preallocated buffers for the per-center distance update —
        # the same ops on the same operands (subtract, square, axis-1
        # sum, running min), just without ~4 fresh allocations per
        # center; bit-identical by construction and A/B-checked over
        # the full fit (r15, same treatment as _lloyd)
        diff = np.empty_like(Xj)
        dnew = np.empty(len(Xj), dtype=np.float64)
        for _ in range(1, min(k, len(Xj))):
            tot = d2.sum()
            if tot <= 0.0:
                break
            c = Xj[rng.choice(len(Xj), p=d2 / tot)]
            cents.append(c)
            np.subtract(Xj, c, out=diff)
            np.multiply(diff, diff, out=diff)
            diff.sum(axis=1, out=dnew)
            np.minimum(d2, dnew, out=d2)
        inits.append(np.stack(cents))
    if len(X) >= _LLOYD_BATCH_MIN_N:
        # batched Lloyd across all subspaces (r16): bit-identical (A/B
        # gated) and ~15% faster at production sample sizes, but CACHE-
        # HOSTILE at fixture scale (the (m, n, k) stack evicts the
        # per-slice working set, measured neutral-to-slower at n=2000),
        # so it gates on sample size
        return _lloyd_batch(X, inits, 100, sub)
    return [
        _lloyd(X[:, j * sub : (j + 1) * sub], C, 100)
        for j, C in enumerate(inits)
    ]


def pq_fit(
    spark: SparkSession,
    emb: DataFrame,
    m: int = M_SUBSPACES,
    k: int = K_CODES,
    seed: int = 42,
    sample_cap: int = FIT_SAMPLE,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks on a deterministic hash-sample.

    Returns ``codebooks[m][k] -> centroid (list of dim/m floats)``.
    Driver-local numpy k-means per subspace (k-means++ init, Lloyd to
    fixpoint) over at most ``sample_cap`` vectors — the fit touches the
    corpus once for the sample sort-limit; the model is M·k·(dim/M)
    floats however big the table is."""
    X = _sample_matrix(emb, seed, sample_cap)
    return [
        [[float(v) for v in c] for c in C]
        for C in _fit_books_np(X, m, k, seed)
    ]


def _reconstruct(Xr, books, sub: int):
    """Quantize-then-decode ``Xr`` against the per-subspace books:
    returns the reconstruction matrix Y (same shape).  The OPQ inner
    step — assignments are the argmin-L2 codes, Y is their decoded
    concatenation."""
    import numpy as np

    Y = np.empty_like(Xr)
    for j, C in enumerate(books):
        Xj = Xr[:, j * sub : (j + 1) * sub]
        d = (
            (Xj**2).sum(axis=1)[:, None]
            + (C**2).sum(axis=1)[None, :]
            - 2.0 * (Xj @ C.T)
        )
        lab = d.argmin(axis=1)
        Y[:, j * sub : (j + 1) * sub] = C[lab]
    return Y


def opq_fit(
    spark: SparkSession,
    emb: DataFrame,
    m: int = M_SUBSPACES,
    k: int = K_CODES,
    seed: int = 42,
    sample_cap: int = FIT_SAMPLE,
    outer_iters: int = 8,
    lloyd_iters: int = 25,
    history_out: list | None = None,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Optimized PQ (Ge et al. 2013, CVPR — the non-parametric OPQ):
    learn an ORTHOGONAL rotation R that redistributes variance across
    the M subspaces before quantization, by alternating (a) PQ fit in
    the rotated space and (b) the orthogonal-Procrustes update
    ``R = UVᵀ where X ᵀY = UΣVᵀ`` (Y = the quantized reconstruction).
    Each step is non-increasing in ``‖XR − Y‖²``, so the recorded
    distortion history is monotone (pinned in tests).

    Returns ``(rotation, codebooks)`` — rotation as a dim×dim nested
    list (JSON-able, model-sized: 64² floats here, 8 MB at dim 1024).
    Because R is orthogonal it preserves inner products and norms:
    cosine in the rotated space IS cosine in the original, so OPQ
    changes only candidate quality, never the exact re-rank contract.
    Driver-local numpy like ``pq_fit`` (fit-small / transform-all);
    the first outer round does the full k-means++ fit, later rounds
    warm-start Lloyd from the previous books (standard OPQ practice —
    the codebooks track the rotation instead of refitting from
    scratch).  ``history_out`` (optional) receives the per-round
    distortion ``‖XR − Y‖²`` for curve tools and tests."""
    X = _sample_matrix(emb, seed, sample_cap)
    R, books = _opq_fit_np(
        X, m, k, seed, outer_iters, lloyd_iters, history_out
    )
    rotation = [[float(v) for v in row] for row in R]
    return rotation, [
        [[float(v) for v in c] for c in C] for C in books
    ]


def _opq_fit_np(
    X,
    m: int,
    k: int,
    seed: int,
    outer_iters: int = 8,
    lloyd_iters: int = 25,
    history_out: list | None = None,
):
    """The numpy core of ``opq_fit`` over an already-collected sample
    matrix — factored out (r16) so ``_pq_topk_impl`` reuses ONE sample
    collect for fit + query LUTs instead of re-sampling.  Arithmetic
    unchanged; returns ``(R ndarray, [codebook ndarray])``."""
    import numpy as np

    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"opq_fit: dim {dim} not divisible by m={m}")
    sub = dim // m
    R = np.eye(dim)
    books = None
    Y = None
    prev = None
    for t in range(outer_iters):
        if t > 0:
            # Procrustes update FIRST (so the returned books are
            # always the ones fit against the returned R):
            # R ← argmin_{RᵀR=I} ‖XR − Y‖² = UVᵀ where XᵀY = UΣVᵀ
            U, _, Vt = np.linalg.svd(X.T @ Y)
            R = U @ Vt
        Xr = X @ R
        if books is None:
            books = _fit_books_np(Xr, m, k, seed)
        elif len(Xr) >= _LLOYD_BATCH_MIN_N:
            # warm-start Lloyd for all M subspaces, batched (r16) —
            # same arithmetic as the per-subspace _lloyd loop (see
            # _LLOYD_BATCH_MIN_N for the gate's measurements)
            books = _lloyd_batch(Xr, books, lloyd_iters, sub)
        else:
            books = [
                _lloyd(Xr[:, j * sub : (j + 1) * sub], C, lloyd_iters)
                for j, C in enumerate(books)
            ]
        Y = _reconstruct(Xr, books, sub)
        dist = float(((Xr - Y) ** 2).sum())
        if history_out is not None:
            history_out.append(dist)
        if prev is not None and prev - dist <= 1e-9 * max(prev, 1.0):
            break
        prev = dist
    return R, books


def pq_encode(
    df: DataFrame,
    emb_col: str,
    codebooks: list[list[list[float]]],
    out_col: str = "pq_code",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """ONE distributed encode pass: each vector -> ``array<int>`` of M
    codebook ids (argmin L2 per subspace).  Arrow-batched pandas UDF;
    the codebooks ship in the closure (model-sized broadcast).

    Vectorized like ``make_adc_scorer``: the only Python loop runs
    over the M subspaces — per batch each subspace is ONE broadcast
    ``(rows × k × sub)`` squared-difference + argmin (kept in the same
    ``(B - x)²`` formulation as the scalar code it replaced, so codes
    are bit-identical — the dot-product expansion would perturb
    distance values and could flip near-tie assignments).  This is
    the hottest distributed stage of PQ at 100 TB: every row of the
    corpus passes through it exactly once.

    ``rotation`` (OPQ, from ``opq_fit``): an orthogonal dim×dim
    matrix applied to each vector BEFORE subspace argmin.  It ships
    in the closure beside the books (dim² floats — 32 KB at the
    fixture's 64 dims, ~8 MB at 1024; still a model-sized broadcast)
    and adds one ``(rows × dim) @ (dim × dim)`` matmul per batch."""
    import numpy as np
    import pandas as pd

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]
    m = len(books)
    R = (
        np.asarray(rotation, dtype=np.float64)
        if rotation is not None
        else None
    )

    @F.pandas_udf("array<int>")
    def encode(vecs):
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype="object")
        mask = vecs.notna().to_numpy()
        out = np.empty(n, dtype=object)
        if mask.any():
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in vecs[mask]]
            )
            if R is not None:
                X = X @ R
            codes = np.empty((X.shape[0], m), dtype=np.int32)
            for j, B in enumerate(books):
                Xj = X[:, j * sub : (j + 1) * sub]
                d = ((B[None, :, :] - Xj[:, None, :]) ** 2).sum(axis=2)
                codes[:, j] = d.argmin(axis=1)
            rows = pd.Series(codes.tolist(), dtype="object")
            out[np.flatnonzero(mask)] = rows.to_numpy()
        return pd.Series(out, index=vecs.index)

    return df.withColumn(out_col, encode(F.col(emb_col)))


def adc_tables(
    q: list[float],
    codebooks: list[list[list[float]]],
    rotation: list[list[float]] | None = None,
) -> tuple[list[list[float]], list[list[float]], float]:
    """Per-query ADC lookup tables: ``dots[m][k]`` = <q_sub, centroid>,
    ``nrms[m][k]`` = ||centroid||², plus ||q||² — approximate cosine of
    an encoded vector is then M lookups:
    Σ dots[j][code_j] / (sqrt(Σ nrms[j][code_j]) · sqrt(q_sq)).

    With an OPQ ``rotation`` the query is rotated into the codebook
    space first; R is orthogonal, so <qR, xR> = <q, x> and ‖qR‖ = ‖q‖
    — the ADC score still approximates the ORIGINAL-space cosine."""
    import numpy as np

    qa = np.asarray(q, dtype=np.float64)
    if rotation is not None:
        qa = qa @ np.asarray(rotation, dtype=np.float64)
    sub = len(codebooks[0][0])
    dots, nrms = [], []
    for j, B in enumerate(codebooks):
        Bj = np.asarray(B, dtype=np.float64)
        qj = qa[j * sub : (j + 1) * sub]
        dots.append([float(v) for v in Bj @ qj])
        nrms.append([float(v) for v in (Bj**2).sum(axis=1)])
    return dots, nrms, float((qa**2).sum())


def make_adc_scorer(luts: dict):
    """Arrow-batched ADC scoring UDF over per-query lookup tables
    (``luts[q_id] -> (dots, nrms, q_sq)`` as built by ``adc_tables``).

    Fully vectorized inside the batch: the only Python loops run over
    the ``M`` subspaces (32 by default) and the distinct query ids present in the
    batch — never over rows.  Per row the work is a numpy fancy-index
    gather ``DOTS[j, C[:, j]]`` over the M×k LUT matrices.  The
    subspace accumulation is a left-to-right ``+=`` chain (seeded with
    ``0.0 +`` like Python's ``sum``), so scores are bit-identical to
    the scalar ``sum(dots[j][c[j]] ...)`` loop this replaced — the
    candidate sets, and hence the exact re-ranked output, cannot
    drift."""
    import numpy as np
    import pandas as pd

    np_luts = {
        int(qid): (
            np.asarray(dots, dtype=np.float64),
            np.asarray(nrms, dtype=np.float64),
            float(q_sq),
        )
        for qid, (dots, nrms, q_sq) in luts.items()
    }

    @F.pandas_udf("double")
    def adc_score(q_ids, codes):
        n = len(q_ids)
        if n == 0:
            return pd.Series([], dtype="float64")
        C = np.stack([np.asarray(c, dtype=np.intp) for c in codes])
        q = q_ids.to_numpy()
        out = np.zeros(n, dtype=np.float64)
        for qid in pd.unique(q):
            DOTS, NRMS, q_sq = np_luts[int(qid)]
            mask = q == qid
            Cm = C[mask]
            dot = 0.0 + DOTS[0, Cm[:, 0]]
            nrm = 0.0 + NRMS[0, Cm[:, 0]]
            for j in range(1, Cm.shape[1]):
                dot += DOTS[j, Cm[:, j]]
                nrm += NRMS[j, Cm[:, j]]
            denom = np.sqrt(nrm * q_sq)
            ok = denom > 0.0
            res = np.zeros(len(dot), dtype=np.float64)
            np.divide(dot, denom, out=res, where=ok)
            out[mask] = res
        return pd.Series(out, dtype="float64")

    return adc_score


def _pq_topk_impl(
    spark: SparkSession,
    sf_dir: str,
    m: int,
    k: int,
    rerank_factor: int,
    rotate: bool,
) -> DataFrame:
    """Shared fit -> encode -> ADC scan -> exact re-rank body behind
    ``pq_topk`` (rotate=False) and ``opq_topk`` (rotate=True).

    r16 (guide §1.2 — don't run jobs whose answers you already have):
    ONE sample collect serves the emptiness check (empty sample ⇔
    empty relation), the fit matrix, and — whenever the sample is
    under its cap, i.e. it IS the whole relation — the query vectors,
    replacing the previous three driver actions (``take(1)``, the fit
    sample, the query collect).  Values are identical: the sample rows
    come from the same scan, and the fit consumes the same matrix."""
    emb = table(spark, sf_dir, "embeddings")
    sample = _sample_rows(emb, 42, FIT_SAMPLE)
    if not sample:
        # empty relation: empty result with the contract schema (the
        # robustness suite runs every query on zero-row fixtures)
        return spark.createDataFrame(
            [], "q_id long, neighbor_id long, cos_sim double, rank int"
        )
    X = _rows_matrix(sample)
    if rotate:
        R_np, books_np = _opq_fit_np(X, m, k, seed=42)
        rotation = [[float(v) for v in row] for row in R_np]
        books = [
            [[float(v) for v in c] for c in C] for C in books_np
        ]
    else:
        rotation = None
        books = [
            [[float(v) for v in c] for c in C]
            for C in _fit_books_np(X, m, k, 42)
        ]
    coded = pq_encode(
        emb.select("vec_id", "embedding"), "embedding", books,
        rotation=rotation,
    ).select("vec_id", "pq_code")

    if len(sample) < FIT_SAMPLE:
        # the sample is the whole relation: the query vectors are
        # already on the driver (same rows, same values)
        q_rows = sorted(
            (r for r in sample if r.vec_id < N_QUERIES),
            key=lambda r: r.vec_id,
        )
    else:
        q_rows = (
            emb.filter(F.col("vec_id") < N_QUERIES)
            .select("vec_id", "embedding")
            .collect()
        )
    luts = {
        int(r.vec_id): adc_tables(list(r.embedding), books, rotation)
        for r in q_rows
    }
    adc_score = make_adc_scorer(luts)

    q_ids = spark.createDataFrame(
        [(int(r.vec_id),) for r in q_rows], "q_id int"
    )
    scored = (
        coded.crossJoin(F.broadcast(q_ids))
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("adc", adc_score(F.col("q_id"), F.col("pq_code")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    cand = (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= TOP_K * rerank_factor)
        .select("q_id", "vec_id")
    )
    # exact re-rank on the raw vectors, candidates only
    q_emb = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    rer = (
        cand.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(q_emb), "q_id")
        .withColumn("cos_sim", cosine(F.col("q_emb"), F.col("embedding")))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    )
    w2 = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= TOP_K)
    )


def pq_topk(
    spark: SparkSession,
    sf_dir: str,
    m: int = M_SUBSPACES,
    k: int = K_CODES,
    rerank_factor: int = RERANK_FACTOR,
) -> DataFrame:
    """PQ-ANN top-5 for the first 10 vectors: fit -> encode -> ADC scan
    -> exact re-rank (module docstring has the scale shape).

    Output schema matches ``similarity_topk``: (q_id, neighbor_id,
    cos_sim, rank) with cos_sim the EXACT cosine — only the candidate
    set is approximate.  ``m``/``k``/``rerank_factor`` default to the
    shipped config; ``tools/pq_recall_curve.py`` sweeps them to place
    the recall-vs-bits trade on a measured curve."""
    return _pq_topk_impl(spark, sf_dir, m, k, rerank_factor, rotate=False)


def opq_topk(
    spark: SparkSession,
    sf_dir: str,
    m: int = M_SUBSPACES,
    k: int = K_CODES,
    rerank_factor: int = RERANK_FACTOR,
) -> DataFrame:
    """``pq_topk`` with the OPQ learned rotation (``opq_fit``) — same
    schema, same exact-cosine re-rank contract; only the quantizer
    changes.  PLANS.md r12 records the measured trigger conditions
    (dim ≳ 256 with correlated blocks, or recall@5 < 0.95 on the
    curve) under which the rotation earns its extra matmul; this
    query keeps the lever exercised end-to-end on the fixture, and
    ``tools/opq_gain.py`` measures the distortion/recall gain on a
    correlated synthetic where plain PQ's subspace split is
    deliberately misaligned."""
    return _pq_topk_impl(spark, sf_dir, m, k, rerank_factor, rotate=True)


QUERIES: dict = {}
ORACLES: dict = {}
# iterative k-means fit: no single-SQL oracle — pytest pins ADC math
# against numpy, recall against the exact twin, and determinism
AUX_QUERIES = {"pq_topk": pq_topk, "opq_topk": opq_topk}
AUX_ORACLES: dict = {}
