"""End-to-end curation pipeline: stage composition, threshold behavior,
near-dedup representative selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdc_mapreduce_spark.catalog import load_table
from sdc_mapreduce_spark.pipeline import curate


def test_quality_threshold_filters(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    kept = curate(docs, min_quality=0.58).count()
    assert 0 < kept < total


def test_language_filter(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = curate(docs, min_quality=0.0, langs=("en",))
    langs = {r["lang_pred"] for r in out.select("lang_pred").distinct().collect()}
    assert langs == {"en"}


def test_near_dedup_keeps_one_representative_per_cluster(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # no quality/lang filtering — isolate the near-dedup stage
    kept = curate(docs, min_quality=0.0, near_dedup=True)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}

    from sdc_mapreduce_spark.functions.dedup import near_dup_clusters

    clusters = near_dup_clusters(docs).collect()
    reps = {r["rep_id"] for r in clusters}
    non_reps = {r["doc_id"] for r in clusters if r["doc_id"] != r["rep_id"]}
    assert non_reps, "fixture should contain near-dup clusters"
    assert kept_ids == reps
    assert not (kept_ids & non_reps)


def test_exact_dup_collapses_to_lowest_id(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "a completely different document about something else entirely ok"),
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in curate(docs, min_quality=0.0).collect()}
    assert kept == {1, 3}
