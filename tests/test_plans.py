"""Plan-shape regression tests: the properties that matter at 100 TB.

Each assertion pins a physical-plan property an operator's scalability
depends on.  If a refactor breaks pushdown/pruning/broadcast/partial-agg,
these fail before the slowdown ships.
"""

from __future__ import annotations

from mapreduce_grpc_spark.operators.relational import (
    per_key_agg,
    reduce_side_join,
)
from mapreduce_grpc_spark.operators.text import grep_filter, wordcount
from mapreduce_grpc_spark.plans import (
    has_broadcast_join,
    has_partial_aggregation,
    pushed_filters,
    read_schema_columns,
)


def test_grep_filter_pushdown_and_pruning(spark, sf_dir):
    df = grep_filter(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "lang" in pushed, f"lang predicate not pushed: {pushed}"
    # the scan must not read every column — doc_id/lang/source/n_chars/text
    # are needed (text only for the Contains filter)
    (cols,) = read_schema_columns(df)
    assert set(cols) <= {"doc_id", "lang", "source", "n_chars", "text"}


def test_per_key_agg_scan_shape(spark, sf_dir):
    df = per_key_agg(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed, f"shipdate predicate not pushed: {pushed}"
    (cols,) = read_schema_columns(df)
    # 7 needed columns, not all 11
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert has_partial_aggregation(df)


def test_reduce_side_join_broadcasts_dims(spark, sf_dir):
    df = reduce_side_join(spark, sf_dir)
    assert has_broadcast_join(df), "nation/region should broadcast, not shuffle"


def test_wordcount_partial_aggregation(spark, sf_dir):
    assert has_partial_aggregation(wordcount(spark, sf_dir))


def test_repetition_stats_no_window_sort(spark, sf_dir):
    """Per-doc gram stats must not plan a Window (posexplode+lead would
    shuffle-and-sort the whole exploded corpus); grams are built
    row-locally and aggregated with partial agg."""
    from mapreduce_grpc_spark.operators.quality import repetition_stats
    from mapreduce_grpc_spark.plans import formatted_plan

    df = repetition_stats(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan, "repetition_stats planned a Window"
    assert has_partial_aggregation(df)


def test_unigram_logprob_broadcasts_total(spark, sf_dir):
    """The corpus-total scalar joins as a broadcast, and the token scan
    prunes to the text/doc_id columns."""
    from mapreduce_grpc_spark.operators.quality import unigram_logprob

    df = unigram_logprob(spark, sf_dir)
    assert has_broadcast_join(df)
    for cols in read_schema_columns(df):
        assert set(cols) <= {"doc_id", "text"}


def test_kmeans_broadcasts_centroids(spark, sf_dir):
    """Both Lloyd assignment passes broadcast the K-row centroid side —
    vectors are never shuffled for assignment."""
    from mapreduce_grpc_spark.operators.clustering import kmeans_clusters
    from mapreduce_grpc_spark.plans import formatted_plan

    df = kmeans_clusters(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastNestedLoopJoin") + plan.count(
        "BroadcastExchange"
    ) >= 2, "centroid sides should broadcast in both passes"


def test_join_temporal_broadcasts_dimension(spark, sf_dir):
    """The AS-OF lookup must broadcast the (small) dimension so facts
    are never shuffled — the property that makes it one fact scan at
    any fact volume."""
    from mapreduce_grpc_spark.operators.relational import join_temporal

    df = join_temporal(spark, sf_dir)
    assert has_broadcast_join(df)
    # the fact scan reads only the three needed order columns
    schemas = read_schema_columns(df)
    for cols in schemas:
        if "o_orderkey" in cols:
            assert set(cols) <= {"o_orderkey", "o_custkey", "o_orderdate"}


def test_sample_weighted_is_take_ordered(spark, sf_dir):
    """Global top-N by sampling key must compile to
    TakeOrderedAndProject (per-partition top-N + O(N) driver merge),
    never a full sort exchange."""
    from mapreduce_grpc_spark.operators.sampling import sample_weighted
    from mapreduce_grpc_spark.plans import formatted_plan

    plan = formatted_plan(sample_weighted(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_rolling_activity_single_shuffle_no_join(spark, sf_dir):
    """The rolling time-RANGE window must be one hash shuffle on
    user_id feeding WindowExec — never a time-range self-join (which
    would be O(events x window) at 100 TB) — and the scan must prune
    down to the four needed columns."""
    from mapreduce_grpc_spark.operators.windows import rolling_activity

    df = rolling_activity(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "Join" not in plan, "rolling window must not plan a self-join"
    assert plan.count("Exchange hashpartitioning") == 1, plan
    (cols,) = read_schema_columns(df)
    assert set(cols) <= {"event_id", "user_id", "ts", "value"}


def test_ivf_pq_adc_scan_reads_codes_not_vectors(spark, tmp_path):
    """The IVF-PQ claim at 100 TB: candidate generation scans ONLY the
    code column inside the probed cells.  Pin it in the physical plan —
    ReadSchema must exclude `embedding`, and the cell probe must be a
    pushed filter."""
    from mapreduce_grpc_spark.catalog import table
    from mapreduce_grpc_spark.sources.snapshots import snap_scan
    from mapreduce_grpc_spark.sources.vector_index import (
        _postings_path,
        ivf_index_init,
    )

    path = str(tmp_path / "idx")
    emb = table(
        spark, "/root/testdata/sf0.001", "embeddings"
    ).select("vec_id", "embedding")
    ivf_index_init(spark, emb, path, n_cells=4, pq_m=16, pq_k=32)
    codes = snap_scan(
        spark, _postings_path(path), [("cell", "in", [0, 1])]
    ).select("vec_id", "cell", "pq_code")
    schemas = read_schema_columns(codes)
    assert schemas and all("embedding" not in cols for cols in schemas), (
        f"ADC scan must not read the vector column: {schemas}"
    )
    pushed = " ".join(pushed_filters(codes))
    assert "cell" in pushed, f"cell probe not pushed: {pushed}"


def test_quality_gates_scan_shaped_no_python(spark, sf_dir):
    """The Gopher/C4 gates must stay one column-pruned scan: zero
    exchanges (no shuffle at any corpus size) and zero Python
    evaluation nodes (the lambdas are JVM higher-order functions, not
    UDFs).  If a refactor introduces either, the 100 TB plan breaks
    before the slowdown ships."""
    from mapreduce_grpc_spark.operators.quality import (
        c4_filters,
        gopher_gate,
    )

    for fn in (gopher_gate, c4_filters):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, (fn.__name__, plan)
        assert "Python" not in plan and "ArrowEval" not in plan, (
            fn.__name__
        )
        (cols,) = read_schema_columns(df)
        assert set(cols) == {"doc_id", "text"}, cols
