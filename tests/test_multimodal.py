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
    audio_features,
    image_features,
    reencode_thumbnails,
    resize_mean_pool,
    video_frames,
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


# ------------------------------------------------------------ audio / video


def test_wav_codec_roundtrips_losslessly():
    from web_scraper_spark.functions.audio import decode_wav, encode_wav

    s = datagen.audio_samples_for(3)
    sr, out = decode_wav(encode_wav(s, datagen.AUDIO_SR))
    assert sr == datagen.AUDIO_SR
    np.testing.assert_array_equal(s, out)


def test_wav_decoder_rejects_non_pcm16_mono():
    """The stub boundary: stereo/float layouts raise, they don't garble."""
    import struct

    from web_scraper_spark.functions.audio import decode_wav, encode_wav

    blob = bytearray(encode_wav(datagen.audio_samples_for(1), 8000))
    # flip the channel count to stereo (RIFF 12 + chunk header 8 + codec 2)
    struct.pack_into("<H", blob, 22, 2)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(blob))


def test_compressed_audio_and_real_video_fail_soft(spark):
    """Non-decodable formats (mp3 / real mp4) classify, never crash: the
    batch UDFs emit ok=False / error rows (soundfile/pyav swap-in notes
    live in the raising codecs)."""
    audio = spark.createDataFrame(
        pd.DataFrame(
            [
                {"media_id": "a", "bytes": b"ID3" + bytes(200), "fmt": "mp3", "caption": ""},
            ]
        ),
        schema=schemas.AUDIO_PAYLOAD_SCHEMA,
    )
    rows = audio_features(audio).collect()
    assert len(rows) == 1 and not rows[0]["ok"] and rows[0]["error"]

    mp4ish = bytes(4) + b"ftyp" + bytes(100)
    video = spark.createDataFrame(
        pd.DataFrame([{"media_id": "v", "bytes": mp4ish, "caption": ""}]),
        schema=schemas.VIDEO_PAYLOAD_SCHEMA,
    )
    vrows = video_frames(video).collect()
    assert len(vrows) == 1 and vrows[0]["frame_idx"] is None and vrows[0]["error"]


def test_video_container_roundtrip_and_bounded_decode():
    """Live container is real MP4/MJPEG: sampled frames round-trip within
    the lossy PSNR window (≥40 dB, the payload contract); the legacy
    FVID stub stays bit-exact (lossless raw frames)."""
    from web_scraper_spark.functions.imaging import psnr
    from web_scraper_spark.functions.video import (
        decode_frames,
        encode_video,
        encode_video_fvid,
        video_meta,
    )

    frames = datagen.video_frames_for(0)  # 12 frames, has a planted cut
    blob = encode_video(frames, datagen.VIDEO_FPS)
    assert video_meta(blob) == (12, datagen.VIDEO_W, datagen.VIDEO_H, datagen.VIDEO_FPS)
    got = decode_frames(blob, [0, 7, 11])
    for idx, img in zip([0, 7, 11], got):
        assert psnr(frames[idx], img) >= 40.0

    legacy = encode_video_fvid(frames, datagen.VIDEO_FPS)
    assert video_meta(legacy) == (12, datagen.VIDEO_W, datagen.VIDEO_H, datagen.VIDEO_FPS)
    np.testing.assert_array_equal(decode_frames(legacy, [7])[0], frames[7])


def test_planted_scene_cuts_detected(spark):
    """Every 3rd fixture clip has a mid-clip scene change; the sampled-
    frame cut flag must find exactly those clips (ramp-only clips produce
    no false cuts — the brightness ramp is phash-stable by design)."""
    payload = spark.createDataFrame(
        datagen.gen_video_payload_pdf(12), schema=schemas.VIDEO_PAYLOAD_SCHEMA
    )
    cuts = {
        r["media_id"]: r["n_cuts"]
        for r in video_frames(payload, every_n=4)
        .groupBy("media_id")
        .agg(F.count_if(F.col("is_cut")).alias("n_cuts"))
        .collect()
    }
    for i in range(12):
        mid = datagen.media_id_for(i)
        if i % 3 == 0:
            assert cuts[mid] == 1, f"clip {i}: planted cut missed"
        else:
            assert cuts[mid] == 0, f"clip {i}: false cut"


def test_mixed_batch_preserves_hash_precision(spark):
    """Regression: a batch mixing ok and error rows must NOT round int64
    hashes — pandas infers float64 for int+None columns (53-bit mantissa),
    silently corrupting phash/ahash low bits unless the UDFs build their
    output through typed_frame."""
    pdf = datagen.gen_payload_pdf(4)
    pdf.loc[1, "bytes"] = b"corrupt"
    payload = spark.createDataFrame(pdf, schema=schemas.PAYLOAD_SCHEMA)
    feats = {r["image_id"]: r for r in image_features(payload).coalesce(1).collect()}
    for i in (0, 2, 3):
        iid = datagen.image_id_for(i)
        assert feats[iid]["phash"] == int(pdf.loc[i, "phash"]), "phash rounded"

    apdf = datagen.gen_audio_payload_pdf(12)  # row 0 and 11 are mp3
    audio = spark.createDataFrame(apdf, schema=schemas.AUDIO_PAYLOAD_SCHEMA)
    from web_scraper_spark.functions.audio import ahash64

    got = {r["media_id"]: r for r in audio_features(audio).coalesce(1).collect()}
    for i in range(1, 11):
        expect = ahash64(datagen.audio_samples_for(i))
        assert got[datagen.media_id_for(i)]["ahash"] == expect, "ahash rounded"


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
