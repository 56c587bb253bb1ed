"""Video near-dup via keyframe pHash overlap (operators/multimodal.py):
frame-signature extraction over real MP4 containers, the exact-hash
join path, the banded Hamming path, and an injected codec decoder —
expected pairs computed brute-force in-test with the same pHash kernel.
"""

import numpy as np
import pytest

from knowhere_spark.operators.multimodal import (
    _dct_matrix,
    _nn_resample,
    video_frame_phashes,
    video_neardup_pairs,
)
from tests.test_mp4 import mux_mp4

META = {"width": 32, "height": 32, "n_frames": 0, "sample_rate": 0}


def _media_df(spark, rows):
    return spark.createDataFrame(
        [(i, "video", bytearray(p), META) for i, p in rows],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>",
    )


def _phash64(arr: np.ndarray) -> int:
    D = _dct_matrix(32)
    if arr.ndim == 3:
        arr = arr.mean(axis=2)
    small = _nn_resample(arr, 32, 32)
    low = (D @ small @ D.T)[:8, :8].ravel()
    bits = low > np.median(low)
    w = 1 << np.arange(64, dtype=np.uint64)
    return int((w * bits).sum(dtype=np.uint64).astype(np.int64))


def test_video_frame_phashes_shared_frames_share_hashes(spark):
    rng = np.random.default_rng(3)
    frames = [rng.bytes(32) for _ in range(5)]
    a, _ = mux_mp4(frames)                       # all sync
    b, _ = mux_mp4(frames[:4] + [rng.bytes(32)])  # 4/5 shared
    df = _media_df(spark, [(1, a), (2, b)])
    sig = video_frame_phashes(df).toPandas()
    ha = set(sig[sig.media_id == 1].phash)
    hb = set(sig[sig.media_id == 2].phash)
    assert len(sig) == 10
    # identical payload bytes → identical fake pixels → identical pHash
    assert len(ha & hb) == 4


def test_video_neardup_exact_hash_join(spark):
    rng = np.random.default_rng(4)
    frames = [rng.bytes(32) for _ in range(6)]
    a, _ = mux_mp4(frames)
    b, _ = mux_mp4(frames[:5] + [rng.bytes(32)])   # 5/6 shared
    c, _ = mux_mp4([rng.bytes(32) for _ in range(6)])   # unrelated
    df = _media_df(spark, [(1, a), (2, b), (3, c)])
    out = video_neardup_pairs(df, min_overlap=0.5).collect()
    assert len(out) == 1
    (r,) = out
    assert (r.id_a, r.id_b, r.matches) == (1, 2, 5)
    assert r.overlap == pytest.approx(5 / 6, abs=1e-6)
    # tighter threshold drops the pair
    assert video_neardup_pairs(df, min_overlap=0.9).count() == 0


def test_video_neardup_injected_decoder_and_banding(spark):
    """Inject an avc1 'decoder' whose pixels come from the frame payload
    seed; compute the TRUE pHash overlap brute-force in-test and check
    both the exact path and the max_hamming-banded path against it."""

    def fake_codec(payload, meta):
        rng = np.random.default_rng(payload[0])
        img = rng.random((16, 16))
        # payload[1] perturbs a single pixel → small pHash hamming drift
        img[0, 0] += payload[1] / 255.0
        return img

    # videos share frame SEEDS; second byte differs → near-but-not-equal
    # pixels, so the exact join may miss what the banded join catches
    fa = [bytes([s, 0]) for s in range(5)]
    fb = [bytes([s, 3]) for s in range(5)]
    a, _ = mux_mp4(fa)
    b, _ = mux_mp4(fb)
    df = _media_df(spark, [(1, a), (2, b)])

    hash_a = [_phash64(fake_codec(p, {})) for p in fa]
    hash_b = [_phash64(fake_codec(p, {})) for p in fb]

    def expected_matches(max_h):
        # the operator's symmetric count: least(distinct matched a-side,
        # distinct matched b-side) — bounded by both denominators
        ma, mb = set(), set()
        for x in set(hash_a):
            for y in set(hash_b):
                if bin((x ^ y) & ((1 << 64) - 1)).count("1") <= max_h:
                    ma.add(x)
                    mb.add(y)
        return min(len(ma), len(mb))

    for max_h in (0, 8):
        exp = expected_matches(max_h)
        got = video_neardup_pairs(
            df, min_overlap=1e-9, max_hamming=max_h,
            decoders={"avc1": fake_codec},
        ).collect()
        if exp == 0:
            assert got == []
        else:
            assert len(got) == 1 and got[0].matches == exp
    # the perturbation is tiny → wide band must recover all 5 frames
    assert expected_matches(8) == 5


def test_video_neardup_validates_overlap(spark):
    df = _media_df(spark, [(1, b"x")])
    with pytest.raises(ValueError):
        video_neardup_pairs(df, min_overlap=0.0)


def test_video_neardup_stop_hash_cap(spark):
    """A frame hash shared by every video is a stop hash: with the cap
    it must not create pairs on its own, and overlap denominators use
    the post-drop signature sizes."""
    rng = np.random.default_rng(5)
    common = rng.bytes(32)                     # appears in ALL videos
    vids = []
    for i in range(4):
        frames = [common] + [rng.bytes(32) for _ in range(3)]
        vids.append((i + 1, mux_mp4(frames)[0]))
    # videos 1 and 2 additionally share two REAL frames
    shared = [rng.bytes(32), rng.bytes(32)]
    vids[0] = (1, mux_mp4([common] + shared + [rng.bytes(32)])[0])
    vids[1] = (2, mux_mp4([common] + shared + [rng.bytes(32)])[0])
    df = _media_df(spark, vids)
    out = video_neardup_pairs(df, min_overlap=0.4, max_hash_freq=3).collect()
    assert len(out) == 1
    (r,) = out
    # the common hash was dropped (freq 4 > cap 3): matches counts only
    # the two real shared frames, denominator is 3 post-drop hashes
    assert (r.id_a, r.id_b, r.matches) == (1, 2, 2)
    assert r.overlap == pytest.approx(2 / 3, abs=1e-6)
    # without the cap the common hash links EVERY pair
    uncapped = video_neardup_pairs(df, min_overlap=1e-9, max_hash_freq=None)
    assert uncapped.count() == 6


def test_video_neardup_overlap_never_exceeds_one(spark):
    """Banded matching where MANY of A's hashes fall within the bound of
    B's single hash must not produce overlap > 1 (regression: the a-side
    distinct count alone could exceed min(n_a, n_b))."""

    def codec_fn(payload, meta):
        # 3 near-identical noisy frames for A; B is one near frame
        rng = np.random.default_rng(99)
        img = rng.random((16, 16))
        img[0, 0] += payload[0] / 5000.0    # tiny per-frame drift
        return img

    fa = [bytes([1]), bytes([2]), bytes([3])]
    fb = [bytes([4])]
    a, _ = mux_mp4(fa)
    b, _ = mux_mp4(fb)
    df = _media_df(spark, [(1, a), (2, b)])
    out = video_neardup_pairs(
        df, min_overlap=1e-9, max_hamming=16, decoders={"avc1": codec_fn}
    ).collect()
    for r in out:
        assert 0.0 < r.overlap <= 1.0
        assert r.matches <= 1        # B has one distinct hash


def test_scene_change_frames(spark):
    """Repeated frame payloads (static shot) share a pHash → no
    boundary; payload changes (cuts) jump ~half the 64 bits → boundary.
    First frame always opens scene 0."""
    from knowhere_spark.operators.multimodal import scene_change_frames

    rng = np.random.default_rng(7)
    a, b, c = rng.bytes(24), rng.bytes(24), rng.bytes(24)
    v, _ = mux_mp4([a, a, a, b, b, c])
    df = _media_df(spark, [(1, v)])
    out = sorted(
        (r.frame_idx, r.scene_idx, r.hamming_prev)
        for r in scene_change_frames(df, min_hamming=16).collect()
    )
    assert [(f, s) for f, s, _ in out] == [(0, 0), (3, 1), (5, 2)]
    assert out[0][2] is None                  # first frame: no previous
    assert out[1][2] >= 16 and out[2][2] >= 16
    # a single-scene video yields exactly its first frame
    v2, _ = mux_mp4([a, a, a, a])
    out2 = scene_change_frames(_media_df(spark, [(2, v2)])).collect()
    assert [(r.frame_idx, r.scene_idx) for r in out2] == [(0, 0)]


def test_scene_change_kernel_equals_window_reference(spark):
    """r10: scene detection moved INTO the decode kernel (no per-video
    window shuffle).  Pin it against an independent lag-window reference
    computed over the frame-pHash table, across several videos and a
    non-default min_hamming; and the executed plan must carry no Window."""
    from knowhere_spark.operators.multimodal import (
        scene_change_frames,
        video_frame_phashes,
    )

    rng = np.random.default_rng(23)
    vids = []
    for i in range(6):
        frames = []
        for _ in range(rng.integers(2, 7)):
            shot = rng.bytes(24)
            frames += [shot] * rng.integers(1, 4)   # static-run per shot
        vids.append((i + 1, mux_mp4(frames)[0]))
    df = _media_df(spark, vids)
    got = sorted(
        (r.media_id, r.frame_idx, r.phash, r.hamming_prev, r.scene_idx)
        for r in scene_change_frames(df, min_hamming=10).collect()
    )
    # reference: lag over the phash table, computed driver-side
    sigs = sorted(
        (r.media_id, r.frame_idx, r.phash)
        for r in video_frame_phashes(df).collect()
    )
    exp, prev, scene, cur = [], None, -1, None
    for mid, fi, h in sigs:
        if mid != cur:
            cur, prev, scene = mid, None, -1
        ham = None if prev is None else bin((h ^ prev) & ((1 << 64) - 1)).count("1")
        if prev is None or ham >= 10:
            scene += 1
            exp.append((mid, fi, h, ham, scene))
        prev = h
    assert got == sorted(exp)
    plan = (
        scene_change_frames(df, min_hamming=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_video_neardup_scene_sampling(spark):
    """VERDICT r9 #7: sample='scenes' runs the diverse-frame sample
    through the near-dup pipeline.  At scene_min_hamming=0 every frame
    is a boundary, so the result must equal sample='every_n'; and with a
    planted cut structure (shared scenes under different static-shot run
    lengths), the boundary-only signatures must still find the pair."""
    rng = np.random.default_rng(17)
    cut1, cut2, cut3 = rng.bytes(24), rng.bytes(24), rng.bytes(24)
    # two videos share scenes (cut1, cut2) but pad them with DIFFERENT
    # static-shot run lengths; a third is unrelated
    a, _ = mux_mp4([cut1, cut1, cut1, cut2, cut2, cut3])
    b, _ = mux_mp4([cut1, cut2, cut2, cut2, cut2, rng.bytes(24)])
    c, _ = mux_mp4([rng.bytes(24) for _ in range(4)])
    df = _media_df(spark, [(1, a), (2, b), (3, c)])

    def pairs(**kw):
        return sorted(
            (r.id_a, r.id_b, r.matches, round(r.overlap, 6))
            for r in video_neardup_pairs(df, min_overlap=0.5, **kw).collect()
        )

    # equality pin: scene_min_hamming=0 ⇒ every frame is a boundary ⇒
    # identical signature set to the every_n sampling
    assert pairs(sample="scenes", scene_min_hamming=0) == pairs()
    # planted cuts: scene sampling keeps boundary frames only — the two
    # videos share 2 of their ≤3 scene hashes → a pair at 0.5
    scene = pairs(sample="scenes", scene_min_hamming=16)
    assert [(x[0], x[1]) for x in scene] == [(1, 2)]
    assert scene[0][2] == 2                      # cut1 + cut2 shared
    with pytest.raises(ValueError, match="sample"):
        video_neardup_pairs(df, sample="nope")
