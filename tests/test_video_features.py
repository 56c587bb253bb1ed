"""Video → vector bridge (operators/multimodal.py): real GIF frame
payloads out of sample_video_keyframes, per-frame features, the pooled
per-video embedding, and the end-to-end hop into the ANN stack."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowhere_spark.operators.multimodal import (
    _decode_frame_pixels,
    decode_payload,
    sample_video_keyframes,
    video_embedding,
    video_frame_features,
    video_frame_phashes,
)
from tests.test_gif import PALETTE4, encode_gif
from tests.test_mp4 import mux_mp4

META = {"width": 6, "height": 6, "n_frames": 0, "sample_rate": 0}


def _media_df(spark, rows):
    return spark.createDataFrame(
        [(i, "video", bytearray(p), META) for i, p in rows],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>",
    )


def test_gif_video_rows_emit_real_pnm_frames(spark):
    rng = np.random.default_rng(21)
    frames = [rng.integers(0, 4, (6, 6), dtype=np.uint8) for _ in range(3)]
    gif = encode_gif(frames, PALETTE4, controls=[(0, None, 50)] * 3)
    out = sample_video_keyframes(_media_df(spark, [(1, gif)])).collect()
    assert len(out) == 3
    pal = np.array(PALETTE4, dtype=np.float64) / 255.0
    for r in sorted(out, key=lambda r: r.frame_idx):
        assert r.is_container == "gif" and r.codec == "pnm"
        # the PNM payload decodes back to the REAL composited GIF frame
        arr = decode_payload(bytes(r.frame_payload), "image", dict(META))
        np.testing.assert_allclose(
            arr, pal[frames[r.frame_idx]], atol=1 / 255.0
        )
    # cumulative 0.5s delays become the timestamps
    assert [r.pts_sec for r in sorted(out, key=lambda r: r.frame_idx)] == \
        pytest.approx([0.0, 0.5, 1.0])


def test_gif_video_phashes_match_image_phash_of_frames(spark):
    """The overclaim fixed this session: GIF video rows must hash their
    REALLY-decoded frames, not a payload-seeded fake — so two GIFs with
    the same pixels but different byte streams (interlaced vs plain)
    must produce identical frame pHashes."""
    rng = np.random.default_rng(22)
    fr = rng.integers(0, 4, (16, 16), dtype=np.uint8)
    plain = encode_gif([fr], PALETTE4)
    inter = encode_gif([fr], PALETTE4, interlace=True)
    assert plain != inter   # genuinely different byte streams
    df = _media_df(spark, [(1, plain), (2, inter)])
    sig = video_frame_phashes(df).toPandas()
    assert len(sig) == 2
    h = set(sig.phash)
    assert len(h) == 1      # same pixels → same pHash, byte stream irrelevant


def test_video_frame_features_expected_values(spark):
    def codec_fn(payload, meta):
        rng = np.random.default_rng(payload[0])
        return rng.random((8, 8))

    fa = [bytes([3]), bytes([9])]
    mp4, _ = mux_mp4(fa)
    df = _media_df(spark, [(5, mp4)])
    out = video_frame_features(
        df, feature_dim=4, decoders={"avc1": codec_fn}
    ).collect()
    assert sorted(r.frame_idx for r in out) == [0, 1]
    for r in out:
        exp = codec_fn(fa[r.frame_idx], {}).ravel().reshape(4, -1).mean(axis=1)
        np.testing.assert_allclose(r.features, exp, rtol=1e-6)


def test_video_embedding_pools_and_normalizes(spark):
    def codec_fn(payload, meta):
        # constant image per frame → exact hand-computable pooling
        return np.full((4, 4), payload[0] / 10.0)

    frames = [bytes([2]), bytes([4]), bytes([6])]
    mp4, _ = mux_mp4(frames)
    df = _media_df(spark, [(7, mp4)])
    emb = video_embedding(
        df, feature_dim=4, decoders={"avc1": codec_fn}
    ).collect()
    assert len(emb) == 1
    vec = np.array(emb[0].vec)
    # mean over frames of constant images 0.2/0.4/0.6 → 0.4 per dim,
    # then L2 normalization → 1/sqrt(4) per dim
    np.testing.assert_allclose(vec, np.full(4, 0.5), rtol=1e-6)
    raw = video_embedding(
        df, feature_dim=4, normalize=False, decoders={"avc1": codec_fn}
    ).collect()[0].vec
    np.testing.assert_allclose(np.array(raw), np.full(4, 0.4), rtol=1e-6)


def test_video_embedding_into_ann_stack(spark):
    """End-to-end: near-copy GIF videos land nearest each other under
    brute-force COSINE over their pooled embeddings."""
    from knowhere_spark.operators.brute_force import BruteForce

    rng = np.random.default_rng(23)
    base = [rng.integers(0, 4, (8, 8), dtype=np.uint8) for _ in range(4)]
    near = [fr.copy() for fr in base]
    near[-1] = rng.integers(0, 4, (8, 8), dtype=np.uint8)   # one frame differs
    other = [rng.integers(0, 4, (8, 8), dtype=np.uint8) for _ in range(4)]
    df = _media_df(spark, [
        (1, encode_gif(base, PALETTE4)),
        (2, encode_gif(near, PALETTE4)),
        (3, encode_gif(other, PALETTE4)),
    ])
    emb = video_embedding(df, feature_dim=16).select(
        F.col("media_id").alias("id"), "vec"
    )
    qs = emb.filter(F.col("id") == 1).select(
        F.col("id").alias("query_id"), "vec"
    )
    res = BruteForce.search(emb, qs, 2, "COSINE").collect()
    ranked = [r.neighbor_id for r in sorted(res, key=lambda r: r.rank)]
    assert ranked == [1, 2]   # itself, then the near-copy — never video 3


def test_decode_frame_pixels_precedence():
    # injected codec wins over sniffable payload
    pnm = b"P5\n2 2\n255\n" + bytes([0, 64, 128, 255])
    out = _decode_frame_pixels(pnm, "avc1", 1, 0, {"avc1": lambda p, m: np.ones((2, 2))})
    np.testing.assert_allclose(out, np.ones((2, 2)))
    # without injection the PNM decodes for real
    out = _decode_frame_pixels(pnm, "pnm", 1, 0, None)
    np.testing.assert_allclose(out, np.array([[0, 64], [128, 255]]) / 255.0)
    # opaque bitstream falls back to the payload-seeded fake
    a = _decode_frame_pixels(b"\x00\x01\x02", "avc1", 1, 0, None)
    b = _decode_frame_pixels(b"\x00\x01\x02", "avc1", 2, 5, None)
    np.testing.assert_allclose(a, b)   # seeded by payload, not ids
    assert a.shape == (32, 32)
    # null payload (synthetic row) seeds by (media_id, frame_idx)
    c = _decode_frame_pixels(None, None, 1, 0, None)
    d = _decode_frame_pixels(None, None, 1, 1, None)
    assert not np.allclose(c, d)
