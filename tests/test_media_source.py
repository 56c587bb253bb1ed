"""Media ingestion source (sources/media.py): binaryFile directory →
MEDIA_SCHEMA with magic-byte typing and header-only metadata probing —
fixtures are a mix of in-test muxed payloads and the interpreter's real
stdlib images."""

import io
import shutil
import struct
import sysconfig
import wave

import numpy as np
import pytest

from knowhere_spark.functions.mp4 import encode_mp4
from knowhere_spark.operators.multimodal import encode_pnm
from knowhere_spark.sources.media import (
    probe_meta,
    read_media_directory,
)
from tests.test_gif import PALETTE4, encode_gif


def _wav_bytes(rate=8000, n=100, ch=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(b"\x00\x01" * (n * ch))
    return buf.getvalue()


@pytest.fixture()
def media_dir(tmp_path):
    rng = np.random.default_rng(41)
    d = tmp_path / "crawl"
    (d / "sub").mkdir(parents=True)
    (d / "img.pnm").write_bytes(
        encode_pnm(rng.random((12, 10, 3)))
    )
    (d / "anim.gif").write_bytes(
        encode_gif(
            [rng.integers(0, 4, (7, 9), dtype=np.uint8) for _ in range(3)],
            PALETTE4,
        )
    )
    (d / "still.gif").write_bytes(
        encode_gif([rng.integers(0, 4, (7, 9), dtype=np.uint8)], PALETTE4)
    )
    (d / "sub" / "clip.mp4").write_bytes(
        encode_mp4([rng.bytes(8) for _ in range(4)], width=20, height=10)
    )
    (d / "sub" / "tone.wav").write_bytes(_wav_bytes(rate=8000, n=100))
    (d / "notes.txt").write_bytes(b"just some text, not media")
    stdlib = sysconfig.get_path("stdlib")
    shutil.copy(stdlib + "/test/imghdrdata/python.png", d / "real.png")
    shutil.copy(stdlib + "/test/imghdrdata/python.jpg", d / "real.jpg")
    return str(d)


def test_read_media_directory_types_and_meta(spark, media_dir):
    rows = {r.media_id: r for r in read_media_directory(spark, media_dir).collect()}
    assert len(rows) == 8
    by_type = {}
    for r in rows.values():
        by_type.setdefault(r.media_type, []).append(r)
    assert len(by_type["image"]) == 4      # pnm, still gif, png, jpg
    assert len(by_type["video"]) == 2      # animated gif, mp4
    assert len(by_type["audio"]) == 1
    assert len(by_type["binary"]) == 1     # the .txt

    metas = {
        (r.media_type, r.meta.width, r.meta.height, r.meta.n_frames,
         r.meta.sample_rate)
        for r in rows.values()
    }
    assert ("image", 10, 12, 1, None) in metas        # pnm: 10 wide, 12 high
    assert ("video", 9, 7, 3, None) in metas          # animated gif
    assert ("image", 9, 7, 1, None) in metas          # still gif
    assert ("video", 20, 10, 4, None) in metas        # mp4
    assert ("audio", None, None, 100, 8000) in metas  # wav
    assert ("image", 16, 16, 1, None) in metas        # real png AND jpg
    # the unknown file survives with null meta
    (txt,) = by_type["binary"]
    assert txt.meta.width is None and txt.meta.n_frames is None


def test_read_media_directory_glob_and_drop_unknown(spark, media_dir):
    only_gif = read_media_directory(spark, media_dir, glob="*.gif")
    assert only_gif.count() == 2
    no_unknown = read_media_directory(spark, media_dir, keep_unknown=False)
    assert no_unknown.filter("media_type = 'binary'").count() == 0
    assert no_unknown.count() == 7
    flat = read_media_directory(spark, media_dir, recursive=False)
    assert flat.count() == 6               # sub/ excluded


def test_media_ids_stable_and_payloads_intact(spark, media_dir):
    a = {r.media_id for r in read_media_directory(spark, media_dir).collect()}
    b = {r.media_id for r in read_media_directory(spark, media_dir).collect()}
    assert a == b and len(a) == 8          # xxhash64(path): stable, distinct
    df = read_media_directory(spark, media_dir, glob="*.pnm", probe=False)
    (r,) = df.collect()
    assert r.meta is None                  # listing-speed pass: no probe
    assert bytes(r.payload)[:2] == b"P6"


def test_probe_meta_headers_only():
    rng = np.random.default_rng(42)
    # JPEG dims via SOF scan on a real stdlib file
    stdlib = sysconfig.get_path("stdlib")
    jpg = open(stdlib + "/test/imghdrdata/python.jpg", "rb").read()
    assert probe_meta(jpg)["width"] == 16
    # corrupt header → all-None, never a raise
    assert probe_meta(b"GIF89a\x01") == {
        "width": None, "height": None, "n_frames": None, "sample_rate": None
    }
    # a TRUNCATED mp4 whose moov is intact probes fine (headers only) —
    # chop the mdat payload bytes out and metadata still comes back
    clip = encode_mp4([rng.bytes(8) for _ in range(3)], width=6, height=4)
    meta = probe_meta(clip)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (6, 4, 3)


def test_source_feeds_video_pipeline(spark, media_dir):
    """End-to-end: directory → source → keyframe sampling over the real
    containers found on disk."""
    from knowhere_spark.operators.multimodal import sample_video_keyframes

    media = read_media_directory(spark, media_dir)
    frames = sample_video_keyframes(media).collect()
    by_container = {}
    for f in frames:
        by_container.setdefault(f.is_container, []).append(f)
    assert len(by_container["mp4"]) == 4   # every mp4 sample is sync
    assert len(by_container["gif"]) == 3   # the animated gif's frames
    assert all(f.frame_payload is not None for f in frames)


def test_media_source_progressive_jpeg_end_to_end(spark, tmp_path):
    """A progressive (SOF2) JPEG through the whole ingestion path:
    directory read → sniffed as jpeg → dims probed from the SOF2 header
    → REALLY decoded by image_phash (r9 — the decoder used to raise on
    progressive, dropping these rows to the deterministic fake)."""
    from knowhere_spark.operators.multimodal import image_phash
    from tests.test_jpeg import (
        _GRAY_SCRIPT,
        _prog_grid,
        encode_jpeg_progressive,
        Q_LUM,
    )

    rng = np.random.default_rng(43)
    grid = _prog_grid(rng, 3, 4)
    prog = encode_jpeg_progressive(
        [grid], 24, 32, [Q_LUM], [(1, 1)], _GRAY_SCRIPT
    )
    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "prog.jpg").write_bytes(prog)
    media = read_media_directory(spark, str(d))
    (row,) = media.collect()
    assert row.media_type == "image"
    assert (row.meta.width, row.meta.height) == (32, 24)
    (ph,) = image_phash(media).collect()
    # the pHash must come from the REAL decode: recompute it directly
    from knowhere_spark.functions.jpeg import decode_jpeg
    from knowhere_spark.operators.multimodal import (
        _dct_matrix,
        _phash64_arr,
    )

    expected = _phash64_arr(
        decode_jpeg(prog), _dct_matrix(32), 1 << np.arange(64, dtype=np.uint64)
    )
    assert ph.phash == expected
