"""Multimodal plumbing: schema, batch shapes, determinism of the fake
codec, native frame sampling.  The codec is a documented stub; everything
Spark-side is real (mapInPandas pipeline over BINARY payload columns)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from knowhere_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_payload,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)
from knowhere_spark.sources.tables import load_table

TESTDATA = "/root/testdata/sf0.001"


def _media(spark):
    return synthesize_media(load_table(spark, TESTDATA, "documents"))


def _shape(schema):
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_media_schema_and_types(spark):
    media = _media(spark)
    assert _shape(media.schema) == _shape(MEDIA_SCHEMA)   # nullability aside
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types <= {"image", "audio", "video"}


def test_decode_deterministic():
    meta = {"width": 8, "height": 4, "n_frames": 3, "sample_rate": 16000}
    a = decode_payload(b"hello", "image", meta)
    b = decode_payload(b"hello", "image", meta)
    assert a.shape == (4, 8, 3)
    np.testing.assert_array_equal(a, b)
    c = decode_payload(b"other", "image", meta)
    assert not np.array_equal(a, c)


def test_extract_features_shapes(spark):
    media = _media(spark)
    feats = extract_features(media, feature_dim=16)
    rows = feats.collect()
    assert len(rows) == media.count()
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in extract_features(media, 16).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_resize_updates_meta(spark):
    media = _media(spark)
    resized = resize_images(media, 8, 6)
    assert _shape(resized.schema) == _shape(MEDIA_SCHEMA)
    imgs = resized.filter(F.col("media_type") == "image")
    bad = imgs.filter(
        (F.col("meta.width") != 8) | (F.col("meta.height") != 6)
    ).count()
    assert bad == 0
    # non-image rows untouched
    n_other = media.filter(F.col("media_type") != "image").count()
    assert resized.filter(F.col("media_type") != "image").count() == n_other


def test_sample_frames_native(spark):
    media = _media(spark)
    frames = sample_frames(media, every_n=2)
    rows = frames.collect()
    vids = {r["media_id"]: r["meta"]["n_frames"]
            for r in media.filter(F.col("media_type") == "video").collect()}
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(got) == set(vids)
    for mid, idxs in got.items():
        assert sorted(idxs) == list(range(0, vids[mid], 2))
