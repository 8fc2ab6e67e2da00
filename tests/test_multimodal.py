"""Multimodal plumbing: schemas, batched decode stubs, frame sampling —
the Spark-side contract is real even where the kernel is a stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdc_mapreduce_spark import multimodal as M
from sdc_mapreduce_spark.catalog import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(60)
    return M.synthesize_media(docs).cache()


def test_media_schema(media):
    dtypes = dict(media.dtypes)
    assert dtypes["content"] == "binary"
    assert dtypes["kind"] == "string"
    assert "n_bytes" in media.select("meta.n_bytes").columns


def test_decode_media_deterministic(media):
    a = {r["media_id"]: (r["width"], r["height"], r["n_channels"]) for r in M.decode_media(media).collect()}
    b = {r["media_id"]: (r["width"], r["height"], r["n_channels"]) for r in M.decode_media(media).collect()}
    assert a == b
    assert all(16 <= w < 256 and 16 <= h < 256 and 1 <= c <= 3 for w, h, c in a.values())


def test_decode_n_bytes_matches_meta(media):
    joined = (
        M.decode_media(media)
        .select("media_id", F.col("n_bytes").alias("decoded_bytes"))
        .join(media.select("media_id", F.col("meta.n_bytes").alias("meta_bytes")), "media_id")
    )
    assert joined.filter(F.col("decoded_bytes") != F.col("meta_bytes")).count() == 0


def test_extract_features_shape(media):
    feats = M.extract_features(media).collect()
    assert len(feats) == media.count()
    assert all(len(r["feature"]) == M.FEATURE_DIM for r in feats)


def test_sample_frames_expands_rows(media):
    vids = media.filter(F.col("kind") == "video")
    frames = M.sample_frames(media, n_frames=4)
    assert frames.count() == vids.count() * 4
    per = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in per)


def test_features_flow_into_similarity_search(media):
    """End-to-end multimodal pipeline: binary payload → Arrow feature
    kernel → cosine top-k over the extracted vectors. The feature column
    must be directly consumable by the simsearch operators (schema
    compatibility is the contract)."""
    from sdc_mapreduce_spark.functions.simsearch import cosine_topk_bruteforce

    feats = M.extract_features(media)
    qids = [r["media_id"] for r in feats.select("media_id").limit(2).collect()]
    top = cosine_topk_bruteforce(
        feats, qids, k=3, id_col="media_id", vec_col="feature"
    ).collect()
    assert {r["query_id"] for r in top} == set(qids)
    for r in top:
        assert r["neighbor_id"] != r["query_id"]
        assert 1 <= r["rank"] <= 3


def test_resize_stub_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        M.resize_stub(media).collect()
