"""Deterministic sampling operators: oracle parity + invariants.

These are AUX queries (the driver contract is at its 50-query cap), so
the DuckDB hash check that the driver would normally run lives here.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mapreduce_grpc_spark import registry
from mapreduce_grpc_spark.operators.sampling import (
    DEFAULT_RATE,
    FIXED_K,
    STRATA_RATES,
    sample_fixed_per_group,
    sample_stratified,
)
from tests.oracle import assert_oracle_match


@pytest.mark.parametrize(
    "name",
    [
        "sample_stratified",
        "sample_fixed_per_group",
        "sample_weighted",
        "sample_weighted_per_source",
    ],
)
def test_sampling_oracle_parity(spark, sf_dir, name):
    df = registry.AUX_QUERIES[name](spark, sf_dir)
    assert_oracle_match(df, registry.AUX_ORACLES[name], sf_dir, name)


def test_weighted_sample_biases_toward_heavy_docs(spark, sf_dir):
    """P(selection) ∝ n_chars: the sampled set's mean n_chars must
    exceed the corpus mean, and the top length-quartile must be
    overrepresented relative to its corpus share.  Exactly WEIGHTED_N
    rows, no duplicates."""
    from mapreduce_grpc_spark.catalog import table
    from mapreduce_grpc_spark.operators.sampling import (
        WEIGHTED_N,
        sample_weighted,
    )

    docs = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    rows = sample_weighted(spark, sf_dir).collect()
    assert len(rows) == min(WEIGHTED_N, docs.count())
    assert len({r.doc_id for r in rows}) == len(rows)

    corpus = [r.n_chars for r in docs.select("n_chars").collect()]
    corpus_mean = sum(corpus) / len(corpus)
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)

    q3 = sorted(corpus)[3 * len(corpus) // 4]
    top_share_corpus = sum(1 for c in corpus if c >= q3) / len(corpus)
    top_share_sample = sum(1 for r in rows if r.n_chars >= q3) / len(rows)
    assert top_share_sample > top_share_corpus, (
        top_share_sample,
        top_share_corpus,
    )


def test_stratified_rates_within_tolerance(spark, sf_dir):
    """Observed keep-rate per language tracks the configured rate.

    The uniform is a pure hash of doc_id, so this is a fixed property of
    the fixture, not a flaky statistical assertion — the tolerance only
    absorbs small-stratum granularity (binomial sd at n≈100).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r.lang: r.n
        for r in sample_stratified(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, n in totals.items():
        rate = STRATA_RATES.get(lang, DEFAULT_RATE)
        observed = kept.get(lang, 0) / n
        sd = (rate * (1 - rate) / n) ** 0.5
        assert abs(observed - rate) <= 4 * sd + 1 / n, (
            f"{lang}: observed {observed:.3f} vs configured {rate} (n={n})"
        )


def test_stratified_is_partitioning_invariant(spark, sf_dir):
    """The same rows are selected regardless of input partitioning —
    the property df.sample cannot give (partition-seeded RNG)."""
    base = {r.doc_id for r in sample_stratified(spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # sample_stratified reads only the documents table
        docs.repartition(13).write.parquet(f"{td}/documents.parquet")
        rep = {r.doc_id for r in sample_stratified(spark, td).collect()}
    assert base == rep


def test_fixed_per_group_exact_k(spark, sf_dir):
    """Exactly min(k, stratum size) rows per language, ranks 1..k dense."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = sample_fixed_per_group(spark, sf_dir).collect()
    by_lang: dict[str, list[int]] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.pick)
    assert set(by_lang) == set(totals)
    for lang, picks in by_lang.items():
        expect = min(FIXED_K, totals[lang])
        assert sorted(picks) == list(range(1, expect + 1)), lang


def test_fixed_per_group_stable_under_resampling(spark, sf_dir):
    """Two runs select the identical doc_ids (pure function of the data)."""
    a = {(r.lang, r.doc_id) for r in sample_fixed_per_group(spark, sf_dir).collect()}
    b = {(r.lang, r.doc_id) for r in sample_fixed_per_group(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_aux_oracle_sql_is_duckdb_valid(sf_dir):
    """Every AUX oracle parses and runs in DuckDB (catches drift even for
    sketch queries whose values are not hash-compared)."""
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, sql in registry.AUX_ORACLES.items():
        con.execute(sql).fetchall()
    con.close()


@pytest.mark.parametrize("name", ["redact_pii", "pack_sequences", "chunk_documents"])
def test_curation_oracle_parity(spark, sf_dir, name):
    df = registry.AUX_QUERIES[name](spark, sf_dir)
    assert_oracle_match(df, registry.AUX_ORACLES[name], sf_dir, name)


def test_chunk_documents_overlap_invariants(spark, sf_dir):
    """Chunks tile each doc with the configured stride: full-size until
    the tail, consecutive chunks overlap by SIZE-STRIDE tokens, and the
    union of chunks covers every token exactly."""
    from mapreduce_grpc_spark.operators.curation import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        chunk_documents,
    )

    rows = chunk_documents(spark, sf_dir).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    saw_multi = False
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_no)
        assert [c.chunk_no for c in chunks] == list(range(len(chunks)))
        for c in chunks[:-1]:
            assert c.chunk_tokens == CHUNK_SIZE, (doc_id, c.chunk_no)
        if len(chunks) > 1:
            saw_multi = True
            a = chunks[0].chunk_text.split(" ")
            b = chunks[1].chunk_text.split(" ")
            assert a[CHUNK_STRIDE:] == b[: CHUNK_SIZE - CHUNK_STRIDE], doc_id
    assert saw_multi, "fixture should contain multi-chunk docs"


def test_redact_pii_scrubs_synthetic_pii(spark, sf_dir, tmp_path):
    """Planted emails/phones are replaced and counted; clean text passes
    through untouched."""
    import os

    import duckdb as _duck

    from mapreduce_grpc_spark.catalog import TABLES
    from mapreduce_grpc_spark.operators.curation import redact_pii

    fake_sf = tmp_path / "sf"
    fake_sf.mkdir()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, fake_sf / f"{t}.parquet")
    con = _duck.connect()
    con.execute(
        f"""
        COPY (
          SELECT 1 AS doc_id, 'reach me at jane.doe+spam@example.co.uk today' AS text,
                 'en' AS lang, 's' AS source, 44 AS n_chars
          UNION ALL SELECT 2, 'call +1-555-123-4567 or 555 123 4567 now', 'en', 's', 40
          UNION ALL SELECT 3, 'no pii here, just words', 'en', 's', 23
        ) TO '{fake_sf}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    rows = {r.doc_id: r for r in redact_pii(spark, str(fake_sf)).collect()}
    assert rows[1].clean_text == "reach me at <EMAIL> today"
    assert (rows[1].n_emails, rows[1].n_phones) == (1, 0)
    assert rows[2].clean_text == "call <PHONE> or <PHONE> now"
    assert (rows[2].n_emails, rows[2].n_phones) == (0, 2)
    assert rows[3].clean_text == "no pii here, just words"
    assert (rows[3].n_emails, rows[3].n_phones) == (0, 0)
    assert_oracle_match(
        redact_pii(spark, str(fake_sf)),
        registry.AUX_ORACLES["redact_pii"],
        str(fake_sf),
        "redact_pii_synthetic",
    )


def test_pack_sequences_invariants(spark, sf_dir):
    """Per (source, pack_shard) shard: bins are dense from 0, monotone over
    doc order, a bin's token total overflows the budget by at most its last
    doc, and the shard column really is doc_id mod N_PACK_SHARDS."""
    from mapreduce_grpc_spark.operators.curation import (
        N_PACK_SHARDS,
        SEQ_TOKEN_BUDGET,
        pack_sequences,
    )

    all_rows = pack_sequences(spark, sf_dir).collect()
    assert all_rows
    shards: dict[tuple, list] = {}
    for r in all_rows:
        assert r.pack_shard == r.doc_id % N_PACK_SHARDS
        shards.setdefault((r.source, r.pack_shard), []).append(r)
    for key, rows in shards.items():
        rows.sort(key=lambda r: r.doc_id)
        seq_ids = [r.seq_id for r in rows]
        assert seq_ids == sorted(seq_ids), key      # monotone in shard
        assert set(seq_ids) == set(range(max(seq_ids) + 1)), key  # dense
        totals: dict[int, int] = {}
        last_tok: dict[int, int] = {}
        for r in rows:
            totals[r.seq_id] = totals.get(r.seq_id, 0) + r.n_tok
            last_tok[r.seq_id] = r.n_tok
        for sid, tot in totals.items():
            assert tot < SEQ_TOKEN_BUDGET + last_tok[sid], (
                f"{key} bin {sid} exceeds budget by more than its last doc"
            )


def test_pack_sequences_skewed_source_fans_out(spark, tmp_path):
    """One source holding ~90% of the corpus must NOT funnel through a
    single window task: the sub-sharded window key spreads the hot source
    over multiple partitions (the 100 TB failure mode this guards is one
    core sorting a whole crawl)."""
    import os

    import duckdb
    from pyspark.sql import functions as F

    from mapreduce_grpc_spark.catalog import TABLES
    from mapreduce_grpc_spark.operators.curation import pack_sequences

    sf_src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    fake_sf = tmp_path / "sf"
    fake_sf.mkdir()
    for t in TABLES:
        src = f"{sf_src}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, fake_sf / f"{t}.parquet")
    rows = [
        (i, f"tok{i} " * 20, "en", "common-crawl" if i % 10 else "tiny", 80)
        for i in range(2000)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY d TO '{fake_sf}/documents.parquet' (FORMAT PARQUET)")
    con.close()

    # AQE would coalesce these tiny partitions back together and hide the
    # fan-out this asserts; the property under test is the PLAN's key
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        packed = pack_sequences(spark, str(fake_sf))
        # keep seq_id in the projection: dropping every window output would
        # let column pruning eliminate the window (and its exchange) entirely
        hot = packed.select(
            "source", "seq_id", F.spark_partition_id().alias("pid")
        ).collect()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    n_parts = len({r.pid for r in hot if r.source == "common-crawl"})
    assert n_parts > 1, "hot source funneled through a single window task"


def test_dedup_components_oracle_parity(spark, sf_dir):
    df = registry.AUX_QUERIES["dedup_components"](spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["dedup_components"], sf_dir, "dedup_components"
    )


def test_dedup_components_cluster_invariants(spark, sf_dir):
    """Every near-dup pair lands in one cluster; the canonical member is
    the cluster's minimum doc_id; exactly one canonical per cluster."""
    from mapreduce_grpc_spark.operators.dedup import dedup_components, dedup_near

    comp = {r.doc_id: r.component for r in dedup_components(spark, sf_dir).collect()}
    pairs = [(r.doc_a, r.doc_b) for r in dedup_near(spark, sf_dir).collect()]
    assert pairs, "fixture should contain planted near-dup pairs"
    for a, b in pairs:
        assert comp[a] == comp[b], (a, b)
    clusters: dict[int, list[int]] = {}
    for d, c in comp.items():
        clusters.setdefault(c, []).append(d)
    for c, members in clusters.items():
        assert c == min(members), (c, members)


def test_pipeline_curate_oracle_parity(spark, sf_dir):
    """The composed curation pipeline (quality gate -> canonical-only
    dedup -> stratified mix -> packing) hash-matches its composed SQL."""
    df = registry.AUX_QUERIES["pipeline_curate"](spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["pipeline_curate"], sf_dir, "pipeline_curate"
    )


def test_pipeline_curate_stage_semantics(spark, sf_dir):
    """Each stage's effect is visible: no short docs, no non-canonical
    cluster members, only sampled doc_ids, packing invariants hold."""
    from mapreduce_grpc_spark.operators.curation import MIN_TOKENS, pipeline_curate
    from mapreduce_grpc_spark.operators.dedup import dedup_components
    from mapreduce_grpc_spark.operators.sampling import sample_stratified

    rows = pipeline_curate(spark, sf_dir).collect()
    assert rows
    assert all(r.n_tok >= MIN_TOKENS for r in rows)
    losers = {
        r.doc_id
        for r in dedup_components(spark, sf_dir).collect()
        if not r.is_canonical
    }
    kept = {r.doc_id for r in rows}
    assert not (kept & losers)
    sampled = {r.doc_id for r in sample_stratified(spark, sf_dir).collect()}
    assert kept <= sampled


def test_dedup_components_distributed_path_matches_driver_path(
    spark, sf_dir, monkeypatch
):
    """The label-propagation loop (taken above DRIVER_CC_MAX_PAIRS) must
    produce the identical fixpoint as the driver union-find."""
    from mapreduce_grpc_spark.operators import dedup as dd

    small = {
        (r.doc_id, r.component, r.is_canonical)
        for r in dd.dedup_components(spark, sf_dir).collect()
    }
    monkeypatch.setattr(dd, "DRIVER_CC_MAX_PAIRS", 0)
    dist = {
        (r.doc_id, r.component, r.is_canonical)
        for r in dd.dedup_components(spark, sf_dir).collect()
    }
    assert small == dist and len(small) > 0


def test_components_distributed_chain_graph(spark, monkeypatch):
    """A path graph of diameter 12 through the FORCED distributed loop:
    needs 12+1 propagation rounds, crossing the localCheckpoint points at
    rounds 5 and 10 — lineage stays bounded and the fixpoint labels the
    whole chain with its minimum id."""
    from mapreduce_grpc_spark.operators import dedup as dd

    monkeypatch.setattr(dd, "DRIVER_CC_MAX_PAIRS", -1)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    out = dd.components_from_pairs(spark, chain).collect()
    assert len(out) == 13
    assert {r.component for r in out} == {0}
    assert [r.doc_id for r in out if r.is_canonical] == [0]


def test_components_nonconvergence_raises(spark, monkeypatch):
    """Hitting the round cap without convergence must raise — a partial
    labeling silently returned would be a wrong answer."""
    from mapreduce_grpc_spark.operators import dedup as dd

    monkeypatch.setattr(dd, "DRIVER_CC_MAX_PAIRS", -1)
    monkeypatch.setattr(dd, "MAX_CC_ROUNDS", 3)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.components_from_pairs(spark, chain)


def test_zscore_native_matches_grouped_map_and_oracle(spark, sf_dir):
    """The applyInPandas grouped-map twin (AUX since round 5) is
    bit-identical to the JVM-native contract query and to the shared
    oracle — this path equality is what licenses holding the native plan
    in the driver contract."""
    from mapreduce_grpc_spark.operators.grouped import (
        zscore_outliers,
        zscore_outliers_grouped,
    )

    a = {tuple(r) for r in zscore_outliers_grouped(spark, sf_dir).collect()}
    b = {tuple(r) for r in zscore_outliers(spark, sf_dir).collect()}
    assert a == b and a
    assert_oracle_match(
        zscore_outliers_grouped(spark, sf_dir),
        registry.AUX_ORACLES["zscore_outliers_grouped"],
        sf_dir,
        "zscore_outliers_grouped",
    )


@pytest.mark.parametrize(
    "name",
    ["decontaminate", "mix_weights", "training_order", "importance_weights"],
)
def test_new_curation_oracle_parity(spark, sf_dir, name):
    df = registry.AUX_QUERIES[name](spark, sf_dir)
    assert_oracle_match(df, registry.AUX_ORACLES[name], sf_dir, name)


def test_decontaminate_flags_planted_copy(spark, tmp_path):
    """A training doc that copies an eval doc verbatim must be flagged at
    overlap 1.0; unrelated docs with no shared rare shingles are absent."""
    import os

    import duckdb

    from mapreduce_grpc_spark.catalog import TABLES
    from mapreduce_grpc_spark.operators.curation import decontaminate

    sf_src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    fake_sf = tmp_path / "sf"
    fake_sf.mkdir()
    for t in TABLES:
        src = f"{sf_src}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, fake_sf / f"{t}.parquet")
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (3, eval_text),                      # eval set (3 % 100 < 5)
        (250, eval_text),                    # train: verbatim copy -> 1.0
        (251, " ".join(f"only{i}" for i in range(12))),  # train: clean
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    con.execute(
        f"""COPY (SELECT doc_id, text, 'en' AS lang, 's' AS source,
                        length(text) AS n_chars FROM d)
            TO '{fake_sf}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    got = {r.doc_id: r for r in decontaminate(spark, str(fake_sf)).collect()}
    assert 250 in got
    assert got[250].eval_id == 3
    assert got[250].overlap == 1.0
    assert got[250].is_contaminated
    assert 251 not in got
    assert_oracle_match(
        decontaminate(spark, str(fake_sf)),
        registry.AUX_ORACLES["decontaminate"],
        str(fake_sf),
        "decontaminate_planted",
    )


@pytest.mark.parametrize(
    "name",
    [
        "pandas_grouped_agg",
        "bm25_topk",
        "resample_events",
        "rolling_activity",
        "numeric_histogram",
        "table_stats",
        "corr_matrix",
        "embedding_stats",
    ],
)
def test_round3_aux_oracle_parity(spark, sf_dir, name):
    df = registry.AUX_QUERIES[name](spark, sf_dir)
    assert_oracle_match(df, registry.AUX_ORACLES[name], sf_dir, name)


def test_resample_gapfill_invariants(spark, sf_dir):
    """Per user the hourly spine is dense between first and last event,
    event counts reconcile with the raw table, and forward-fill leaves no
    null values (the first spine hour always has an event)."""
    from mapreduce_grpc_spark.operators.windows import resample_events

    rows = resample_events(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r.n_events for r in rows) == ev.count()
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.value_ff is not None
        by_user.setdefault(r.user_id, []).append(r.hour)
    for user, hours in by_user.items():
        hours.sort()
        span = int((hours[-1] - hours[0]).total_seconds()) // 3600 + 1
        assert len(hours) == len(set(hours)) == span, user


def test_numeric_histogram_invariants(spark, sf_dir):
    """Bucket ids are clamped to [0, max]; per-bucket min/max sit inside
    the bucket's edges (top bucket absorbs the tail); counts reconcile."""
    from mapreduce_grpc_spark.operators.relational import (
        HIST_MAX_BUCKET,
        HIST_WIDTH,
        numeric_histogram,
    )

    rows = numeric_histogram(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert sum(r.n_rows for r in rows) == li.count()
    for r in rows:
        assert 0 <= r.bucket <= HIST_MAX_BUCKET
        assert r.min_price >= r.bucket * HIST_WIDTH
        if r.bucket < HIST_MAX_BUCKET:
            assert r.max_price < (r.bucket + 1) * HIST_WIDTH
        assert r.min_price <= r.max_price


def test_bm25_ranking_invariants(spark, sf_dir):
    """Top-k is capped, scores strictly positive and non-increasing, and
    every ranked doc actually contains at least one query term."""
    from mapreduce_grpc_spark.operators.text import BM25_QUERY, BM25_TOPK, bm25_topk

    rows = bm25_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOPK
    scores = [r.score for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    docs = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("doc_id", "text")
        .collect()
        if any(w in r.text.split() for w in BM25_QUERY)
    }
    assert all(r.doc_id in docs for r in rows)


def test_corr_matrix_tracks_builtin_corr(spark, sf_dir):
    """The DECIMAL-moment correlation must agree with Spark's built-in
    (float-accumulating) corr to well past the rounding precision."""
    from pyspark.sql import functions as F

    from mapreduce_grpc_spark.operators.relational import corr_matrix

    rows = corr_matrix(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for r in rows:
        builtin = li.agg(F.corr(r.col_x, r.col_y)).collect()[0][0]
        assert abs(r.corr - builtin) < 1e-6, (r.col_x, r.col_y)
        assert -1.0 <= r.corr <= 1.0


def test_pandas_grouped_agg_matches_jvm_aggregation(spark, sf_dir):
    """The grouped-agg pandas UDAF path must agree exactly with the
    equivalent JVM-side built-in aggregation (int64 semantics, no float
    accumulation)."""
    from pyspark.sql import functions as F

    from mapreduce_grpc_spark.catalog import table
    from mapreduce_grpc_spark.functions.textfns import tokens
    from mapreduce_grpc_spark.operators.udfs import pandas_grouped_agg

    got = {
        r.lang: (r.n_docs, r.sum_tok, r.sumsq_tok)
        for r in pandas_grouped_agg(spark, sf_dir).collect()
    }
    jvm = (
        table(spark, sf_dir, "documents")
        .select("lang", F.size(tokens("text")).cast("long").alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("sum_tok"),
            F.sum(F.col("n_tok") * F.col("n_tok")).alias("sumsq_tok"),
        )
        .collect()
    )
    assert got == {r.lang: (r.n_docs, r.sum_tok, r.sumsq_tok) for r in jvm}


def test_dedup_incremental_oracle_parity(spark, sf_dir):
    df = registry.AUX_QUERIES["dedup_incremental"](spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["dedup_incremental"], sf_dir, "dedup_incremental"
    )


def test_dedup_incremental_flags_planted_batch_dup(spark, tmp_path):
    """A batch-slot doc copying a corpus doc verbatim must match it at
    jaccard 1.0 / is_duplicate; a unique batch doc is absent; corpus docs
    never appear as batch_id."""
    import os

    import duckdb

    from mapreduce_grpc_spark.catalog import TABLES
    from mapreduce_grpc_spark.operators.dedup import INC_MOD, INC_SLOT, dedup_incremental

    sf_src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    fake_sf = tmp_path / "sf"
    fake_sf.mkdir()
    for t in TABLES:
        src = f"{sf_src}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, fake_sf / f"{t}.parquet")
    corpus_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batch_dup = 10 + INC_SLOT       # 17 % 10 == 7 -> batch slice
    batch_clean = 20 + INC_SLOT
    rows = [
        (20, corpus_text),                                   # corpus
        (batch_dup, corpus_text),                            # batch: copy
        (batch_clean, " ".join(f"only{i}" for i in range(12))),  # batch: clean
    ]
    assert batch_dup % INC_MOD == INC_SLOT and 20 % INC_MOD != INC_SLOT
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    con.execute(
        f"""COPY (SELECT doc_id, text, 'en' AS lang, 's' AS source,
                        length(text) AS n_chars FROM d)
            TO '{fake_sf}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    got = {r.batch_id: r for r in dedup_incremental(spark, str(fake_sf)).collect()}
    assert set(got) == {batch_dup}
    assert got[batch_dup].match_id == 20
    assert got[batch_dup].jaccard == 1.0
    assert got[batch_dup].is_duplicate
    assert_oracle_match(
        dedup_incremental(spark, str(fake_sf)),
        registry.AUX_ORACLES["dedup_incremental"],
        str(fake_sf),
        "dedup_incremental_planted",
    )


def test_mix_weights_invariants(spark, sf_dir):
    """Shares sum to 1; weight * share is the uniform target for every
    source (so resampling by weight equalizes the mix)."""
    from mapreduce_grpc_spark.operators.curation import mix_weights

    rows = mix_weights(spark, sf_dir).collect()
    assert len(rows) > 1
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9
    target = 1.0 / len(rows)
    for r in rows:
        assert abs(r.weight * r.token_share - target) < 1e-9


def test_training_order_is_a_stable_permutation(spark, sf_dir):
    """Every doc appears exactly once; positions are dense per shard;
    the order is identical across reruns and input repartitioning."""
    import tempfile

    from mapreduce_grpc_spark.operators.curation import (
        N_ORDER_SHARDS,
        training_order,
    )

    rows = training_order(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(rows) == docs.count()
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < N_ORDER_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert len(by_shard) > 1
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard

    base = {(r.doc_id, r.shard, r.pos) for r in rows}
    with tempfile.TemporaryDirectory() as td:
        docs.repartition(13).write.parquet(f"{td}/documents.parquet")
        rep = {
            (r.doc_id, r.shard, r.pos)
            for r in training_order(spark, td).collect()
        }
    assert base == rep


def test_dedup_editdistance_oracle_parity_and_planted(spark, sf_dir, tmp_path):
    """Char-level verify over the banded candidates: DuckDB hash parity
    on the fixture, plus planted semantics — identical docs at distance
    0, a k-char perturbation at distance exactly k."""
    import os as _os

    from mapreduce_grpc_spark.catalog import TABLES
    from mapreduce_grpc_spark.operators.dedup import dedup_editdistance

    assert_oracle_match(
        dedup_editdistance(spark, sf_dir),
        registry.AUX_ORACLES["dedup_editdistance"],
        sf_dir,
        "dedup_editdistance",
    )

    # planted corpus: doc 1 == doc 2; doc 3 = doc 1 with 3 chars changed
    fake_sf = tmp_path / "sf_fake"
    fake_sf.mkdir()
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if t != "documents" and _os.path.exists(src):
            _os.symlink(src, fake_sf / f"{t}.parquet")
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the field towards the river bank every single morning"
    )
    mut = "THE" + base[3:50] + "XY" + base[52:]
    docs = spark.createDataFrame(
        [
            (1, "en", "web", len(base), base),
            (2, "en", "web", len(base), base),
            (3, "en", "web", len(mut), mut),
        ],
        "doc_id bigint, lang string, source string, n_chars bigint, "
        "text string",
    )
    docs.coalesce(1).write.parquet(str(fake_sf / "documents.parquet"))
    got = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in dedup_editdistance(spark, str(fake_sf)).collect()
    }
    assert got.get((1, 2)) == 0, got
    for pair in [(1, 3), (2, 3)]:
        if pair in got:  # present iff banding proposed the pair
            assert got[pair] == 5  # 'the'->'THE' (3) + 2 inserted chars


def test_weighted_per_source_exact_k_and_consistency(spark, sf_dir):
    """Exactly min(K, |source|) per source with dense pick ranks; the
    per-source pick order is consistent with the global weighted key
    (same u, same weight => same relative order)."""
    from mapreduce_grpc_spark.catalog import table
    from mapreduce_grpc_spark.operators.sampling import (
        PER_SOURCE_K,
        sample_weighted_per_source,
    )

    docs = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    totals = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    out = sample_weighted_per_source(spark, sf_dir).collect()
    by_src: dict[str, list[int]] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.pick)
    assert set(by_src) == set(totals)
    for src, picks in by_src.items():
        expect = min(PER_SOURCE_K, totals[src])
        assert sorted(picks) == list(range(1, expect + 1)), src


def test_dedup_segments_oracle_parity_and_signal(spark, sf_dir):
    """Segment-level (line-level) dedup profile: DuckDB hash parity,
    plus the fixture's planted duplicates must actually surface as
    shared segments (non-degenerate signal) while fully-unique docs
    report zero."""
    df = registry.AUX_QUERIES["dedup_segments"](spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["dedup_segments"], sf_dir, "dedup_segments"
    )
    rows = df.collect()
    assert sum(r.n_dup_segs for r in rows) > 0, (
        "planted near-dups must share verbatim segments"
    )
    assert any(r.n_dup_segs == 0 for r in rows)
    for r in rows:
        assert 0 <= r.n_dup_segs <= r.n_segs
        assert abs(r.dup_frac - round(r.n_dup_segs / r.n_segs, 6)) < 1e-9


def test_clean_segments_oracle_parity_and_reconstruction(spark, sf_dir):
    """Line-level cleaning transform: DuckDB hash parity, plus the
    reconstruction invariants — a doc with nothing removed rebuilds its
    exact tokenized text; removed counts agree with the profile query."""
    from mapreduce_grpc_spark.operators.dedup import dedup_segments

    df = registry.AUX_QUERIES["clean_segments"](spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["clean_segments"], sf_dir, "clean_segments"
    )
    cleaned = {r.doc_id: (r.n_removed, r.clean_text) for r in df.collect()}
    profile = {
        r.doc_id: r.n_dup_segs
        for r in dedup_segments(spark, sf_dir).collect()
    }
    assert set(cleaned) == set(profile)
    assert all(cleaned[d][0] == profile[d] for d in cleaned)
    assert sum(n for n, _ in cleaned.values()) > 0  # something was removed

    # untouched docs reconstruct their exact (tokenized) text
    from mapreduce_grpc_spark.catalog import table as _table
    from mapreduce_grpc_spark.functions.textfns import tokens as _tokens

    orig = {
        r.doc_id: r.toks
        for r in _table(spark, sf_dir, "documents")
        .select("doc_id", F.array_join(_tokens("text"), " ").alias("toks"))
        .collect()
    }
    untouched = [d for d, (n, _) in cleaned.items() if n == 0]
    assert untouched
    for d in untouched[:50]:
        assert cleaned[d][1] == orig[d], d


def test_sample_cluster_balanced_oracle_parity_and_quota(spark, sf_dir):
    """Cluster-balanced reservoir: DuckDB hash parity + exactly
    min(k, |cluster|) per cluster and picks are 1..n contiguous."""
    from collections import Counter

    from mapreduce_grpc_spark.operators.clustering import kmeans_clusters
    from mapreduce_grpc_spark.operators.sampling import CLUSTER_K_PER

    df = registry.AUX_QUERIES["sample_cluster_balanced"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["sample_cluster_balanced"],
        sf_dir,
        "sample_cluster_balanced",
    )
    rows = df.collect()
    sizes = Counter(
        r.cluster for r in kmeans_clusters(spark, sf_dir).collect()
    )
    got = Counter(r.cluster for r in rows)
    for c, n in sizes.items():
        assert got[c] == min(CLUSTER_K_PER, n), (c, n, got[c])
    picks = {}
    for r in rows:
        picks.setdefault(r.cluster, []).append(r.pick)
    for c, ps in picks.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), c


def test_importance_weights_separates_target_language(spark, sf_dir):
    """DSIR sanity: English documents (the target slice) must score a
    higher mean log-likelihood ratio than non-English ones, and every
    scored doc carries positive token mass."""
    from mapreduce_grpc_spark.operators.curation import (
        TARGET_LANG,
        importance_weights,
    )

    rows = importance_weights(spark, sf_dir).collect()
    assert rows
    tgt = [r.avg_llr for r in rows if r.lang == TARGET_LANG]
    rest = [r.avg_llr for r in rows if r.lang != TARGET_LANG]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)
    assert all(r.n_tokens > 0 for r in rows)
