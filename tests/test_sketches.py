"""Count-min frequency sketch: the CMS guarantees as fixed (seeded)
properties of the fixture, plus mergeability — per-group sketches
combined by counter addition estimate identically to one global build."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_grpc_spark.catalog import table
from mapreduce_grpc_spark.functions.sketches import (
    CMS_EPS,
    build_cms,
    cms_estimates,
    cms_total,
    merge_cms,
)
from mapreduce_grpc_spark.functions.textfns import tokens


def _word_stream(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(F.explode(tokens("text")).alias("word"))


def test_cms_overcount_only_and_bounded(spark, sf_dir):
    words = _word_stream(spark, sf_dir)
    sketch = build_cms(words, "word")
    total = words.count()
    assert cms_total(spark, sketch) == total

    # probe the 20 most frequent + 5 rare words with exact counts
    exact = {
        r.word: r.n
        for r in words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
        .collect()
    }
    rare = {
        r.word: r.n
        for r in words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.asc("n"), F.asc("word"))
        .limit(5)
        .collect()
    }
    exact.update(rare)
    est = cms_estimates(spark, sketch, list(exact))
    for w, true_n in exact.items():
        assert est[w] >= true_n, (w, est[w], true_n)  # overcount-only
        assert est[w] <= true_n + CMS_EPS * total + 1, (w, est[w], true_n)
    # a word that never occurs estimates within the noise floor
    ghost = cms_estimates(spark, sketch, ["zzzz_not_a_word_zzzz"])
    assert ghost["zzzz_not_a_word_zzzz"] <= CMS_EPS * total + 1


def test_cms_merge_equals_global_build(spark, sf_dir):
    """Sketching each language slice separately and merging gives the
    SAME estimates as sketching the whole corpus — counter addition
    commutes, which is what makes the sketch a streaming/partial-agg
    state."""
    docs = table(spark, sf_dir, "documents")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    parts = [
        build_cms(
            docs.filter(F.col("lang") == lang).select(
                F.explode(tokens("text")).alias("word")
            ),
            "word",
        )
        for lang in langs
    ]
    merged = merge_cms(spark, parts)

    whole = build_cms(_word_stream(spark, sf_dir), "word")
    probes = [
        r.word
        for r in _word_stream(spark, sf_dir)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(25)
        .collect()
    ]
    assert cms_estimates(spark, merged, probes) == cms_estimates(
        spark, whole, probes
    )
    assert cms_total(spark, merged) == cms_total(spark, whole)


def test_cms_as_streaming_state(spark, sf_dir, tmp_path):
    """The sketch is valid STREAMING state: build one CMS per micro-batch
    in foreachBatch, fold with merge_cms, and the streamed result
    estimates identically to the one-shot batch sketch — exact
    equivalence, not approximation, because counter addition commutes
    across any batch split."""
    docs = table(spark, sf_dir, "documents")
    src = tmp_path / "docs_stream"
    docs.repartition(4).write.parquet(str(src))

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sketches: list[bytes] = []

    def _sketch_batch(batch_df, _bid):
        if batch_df.isEmpty():
            return
        words = batch_df.select(F.explode(tokens("text")).alias("word"))
        sketches.append(build_cms(words, "word"))

    q = (
        stream.writeStream.foreachBatch(_sketch_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(sketches) >= 2, "expected a multi-micro-batch run"

    streamed = merge_cms(spark, sketches)
    whole = build_cms(_word_stream(spark, sf_dir), "word")
    probes = [
        r.word
        for r in _word_stream(spark, sf_dir)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(25)
        .collect()
    ]
    assert cms_estimates(spark, streamed, probes) == cms_estimates(
        spark, whole, probes
    )
    assert cms_total(spark, streamed) == cms_total(spark, whole)
