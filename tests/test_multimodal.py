"""Multimodal image operators: resize, features, thumbnails, and the
ANN-recall property of the LSH bucketing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_scraper_spark import datagen, schemas
from web_scraper_spark.functions.imaging import decode_image
from web_scraper_spark.functions.multimodal import (
    decode_audio_batch,
    image_features,
    reencode_thumbnails,
    resize_mean_pool,
    sample_video_frames_batch,
)


def test_resize_mean_pool_shape_and_determinism():
    img = datagen.make_image(5, 64, 48)
    t1 = resize_mean_pool(img, 16, 12)
    t2 = resize_mean_pool(img, 16, 12)
    assert t1.shape == (12, 16, 3)
    np.testing.assert_array_equal(t1, t2)
    # uniform image stays uniform under mean-pool
    flat = np.full((48, 64, 3), 77, np.uint8)
    assert np.all(resize_mean_pool(flat, 8, 8) == 77)


def test_image_features_over_payload(spark):
    payload = spark.createDataFrame(
        datagen.gen_payload_pdf(24), schema=schemas.PAYLOAD_SCHEMA
    )
    feats = image_features(payload).collect()
    assert len(feats) == 24
    assert all(r["ok"] for r in feats)
    assert all(0 < r["brightness"] < 255 for r in feats)
    assert all(r["contrast"] > 0 for r in feats)
    # payload-table phash must match the recomputed one
    truth = {r["image_id"]: r["phash"] for r in payload.select("image_id", "phash").collect()}
    assert all(truth[r["image_id"]] == r["phash"] for r in feats)


def test_image_features_bad_bytes_flagged(spark):
    pdf = datagen.gen_payload_pdf(4)
    pdf.loc[1, "bytes"] = b"corrupt"
    payload = spark.createDataFrame(pdf, schema=schemas.PAYLOAD_SCHEMA)
    feats = {r["image_id"]: r for r in image_features(payload).collect()}
    assert not feats["00000001"]["ok"]
    assert sum(1 for r in feats.values() if r["ok"]) == 3


def test_reencode_thumbnails_roundtrip(spark):
    payload = spark.createDataFrame(
        datagen.gen_payload_pdf(6), schema=schemas.PAYLOAD_SCHEMA
    )
    thumbs = reencode_thumbnails(payload, 16, 12).collect()
    assert len(thumbs) == 6
    for r in thumbs:
        img = decode_image(bytes(r["thumb_bytes"]), "png")
        assert img.shape == (12, 16, 3)


def test_audio_video_stubs_raise():
    with pytest.raises(NotImplementedError):
        decode_audio_batch(pd.Series([b"x"]), pd.Series(["wav"]))
    with pytest.raises(NotImplementedError):
        sample_video_frames_batch(pd.Series([b"x"]))


def test_lsh_finds_planted_near_duplicates(spark):
    """Multi-table LSH must recover ≥90% of planted near-dup pairs
    (cos ≈ 0.998): the training-data dedup case LSH exists for. For
    near-identical vectors P(same bucket in ≥1 of 4 tables) ≈ 0.99+."""
    from web_scraper_spark.operators.similarity import lsh_topk

    rng = np.random.RandomState(7)
    base = rng.standard_normal((40, 32))
    dups = base + 0.02 * rng.standard_normal((40, 32))  # cos ≈ 0.998
    rows = [(i, base[i].tolist()) for i in range(40)] + [
        (100 + i, dups[i].tolist()) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = lsh_topk(df, df.filter(F.col("vec_id") < 40), dim=32, k=1)
    top1 = {r["q_id"]: r["neighbor_id"] for r in out.collect()}
    found = sum(1 for i in range(40) if top1.get(i) == 100 + i)
    assert found >= 36, f"only {found}/40 planted dups recovered"


def test_ivf_finds_planted_near_duplicates(spark):
    """IVF coarse quantization must recover planted near-dup pairs: a
    vector and its tiny perturbation (cos ≈ 0.998) land in the same cell
    (or within the query's nprobe=2 probed cells) essentially always —
    misses require the pair to straddle a cell boundary AND the second
    probe to miss, so a small miss budget is allowed."""
    from web_scraper_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(11)
    base = rng.standard_normal((40, 32))
    dups = base + 0.02 * rng.standard_normal((40, 32))
    rows = [(i, base[i].tolist()) for i in range(40)] + [
        (100 + i, dups[i].tolist()) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ivf_topk(df, df.filter(F.col("vec_id") < 40), dim=32, k=1)
    top1 = {r["q_id"]: r["neighbor_id"] for r in out.collect()}
    found = sum(1 for i in range(40) if top1.get(i) == 100 + i)
    assert found >= 36, f"only {found}/40 planted dups recovered"


def test_ivf_subset_of_exact_on_corpus(spark):
    """Every IVF result must carry the true cosine (exact re-rank of cell
    mates), so each (q, neighbor, cos) appears in the brute-force ranking
    with identical cos; and each query's hits must descend in rank order."""
    from web_scraper_spark import analytics
    from web_scraper_spark.operators.similarity import cosine_topk

    sf_dir = "/root/testdata/sf0.001"
    approx = analytics.q_embedding_knn_ivf(spark, sf_dir).collect()
    assert len(approx) > 0
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact_all = cosine_topk(e, e.filter(F.col("vec_id") < 20), k=499)
    truth = {
        (r["q_id"], r["neighbor_id"]): r["cos"] for r in exact_all.collect()
    }
    for r in approx:
        assert truth[(r["q_id"], r["neighbor_id"])] == r["cos"]


def test_lsh_subset_of_exact_on_corpus(spark):
    """On the sf corpus, every LSH result must carry the true cosine (it
    re-ranks exactly), so each (q, neighbor, cos) must appear in the
    brute-force ranking with identical cos."""
    from web_scraper_spark import analytics

    sf_dir = "/root/testdata/sf0.001"
    approx = analytics.q_embedding_knn_lsh(spark, sf_dir).collect()
    assert len(approx) > 0
    from web_scraper_spark.operators.similarity import cosine_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact_all = cosine_topk(e, e.filter(F.col("vec_id") < 20), k=499)
    truth = {
        (r["q_id"], r["neighbor_id"]): r["cos"] for r in exact_all.collect()
    }
    for r in approx:
        assert truth[(r["q_id"], r["neighbor_id"])] == r["cos"]
