"""Property-based tests (hypothesis) for the numpy kernel layer — the
engine's equivalent of the reference's SIMD-kernel equivalence suites
(tests/ut/test_distances.cc, test_simd.cc): every fast path must agree
with the naive definition on arbitrary inputs."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from knowhere_spark.config import MetricType
from knowhere_spark.functions.distance import (
    local_topk,
    numpy_kmeans,
    pairwise_distances,
)

_f = st.floats(min_value=-100, max_value=100, allow_nan=False, width=32)


def _mats(max_n=12, max_q=6, max_d=8):
    return st.integers(2, max_n).flatmap(
        lambda n: st.integers(1, max_q).flatmap(
            lambda q: st.integers(1, max_d).flatmap(
                lambda d: st.tuples(
                    arrays(np.float64, (n, d), elements=_f),
                    arrays(np.float64, (q, d), elements=_f),
                )
            )
        )
    )


@settings(max_examples=60, deadline=None)
@given(_mats())
def test_pairwise_l2_matches_naive(xy):
    X, Q = xy
    got = pairwise_distances(X, Q, MetricType.L2)
    naive = ((X[:, None, :] - Q[None, :, :]) ** 2).sum(axis=2)
    np.testing.assert_allclose(got, naive, rtol=1e-9, atol=1e-6)


@settings(max_examples=60, deadline=None)
@given(_mats())
def test_pairwise_ip_matches_naive(xy):
    X, Q = xy
    got = pairwise_distances(X, Q, MetricType.IP)
    np.testing.assert_allclose(got, X @ Q.T, rtol=1e-9, atol=1e-6)


@settings(max_examples=60, deadline=None)
@given(_mats())
def test_pairwise_cosine_bounded_and_symmetric_in_scale(xy):
    X, Q = xy
    got = pairwise_distances(X, Q, MetricType.COSINE)
    assert got.shape == (len(X), len(Q))
    finite = np.isfinite(got)
    assert np.all(np.abs(got[finite]) <= 1.0 + 1e-9)
    # cosine is scale-invariant on the nonzero rows
    nz = (np.linalg.norm(X, axis=1) > 1e-6) & True
    if nz.any():
        got2 = pairwise_distances(X[nz] * 3.0, Q, MetricType.COSINE)
        np.testing.assert_allclose(got2, got[nz], rtol=1e-6, atol=1e-9)


@settings(max_examples=60, deadline=None)
@given(_mats(), st.integers(1, 15), st.booleans())
def test_local_topk_matches_full_sort(xy, k, largest):
    X, Q = xy
    dist = pairwise_distances(X, Q, MetricType.L2)
    ids = np.arange(len(X)) * 7 + 3          # non-trivial id mapping
    qidx, nid, dd = local_topk(dist, ids, k, largest)
    kk = min(k, len(X))
    assert len(qidx) == kk * len(Q)
    for qi in range(len(Q)):
        mine = sorted(dd[qidx == qi], reverse=largest)
        key = -dist[:, qi] if largest else dist[:, qi]
        truth = dist[np.argsort(key, kind="stable")[:kk], qi].tolist()
        np.testing.assert_allclose(mine, truth, rtol=1e-12)


@settings(max_examples=20, deadline=None)
@given(
    arrays(np.float64, (30, 4), elements=_f),
    st.integers(1, 8),
    st.integers(0, 2**16),
)
def test_numpy_kmeans_deterministic_and_shaped(X, k, seed):
    C1 = numpy_kmeans(X, k, iters=5, seed=seed)
    C2 = numpy_kmeans(X, k, iters=5, seed=seed)
    np.testing.assert_array_equal(C1, C2)          # same seed → same model
    assert C1.shape[1] == X.shape[1]
    assert 1 <= C1.shape[0] <= min(k, len(X))
    assert np.isfinite(C1).all()


@settings(max_examples=30, deadline=None)
@given(_mats(max_n=20, max_q=1, max_d=6), st.integers(2, 6))
def test_kmeans_assign_is_nearest(xy, k):
    X, _ = xy
    C = numpy_kmeans(X, k, iters=5, seed=0)
    d = pairwise_distances(X, C, MetricType.L2)
    assign = d.argmin(axis=1)
    # every point's assigned centroid is at least as close as any other
    for i in range(len(X)):
        assert d[i, assign[i]] <= d[i].min() + 1e-9


def test_local_topk_k_zero_and_empty():
    dist = np.random.default_rng(0).random((10, 3))
    ids = np.arange(10)
    qidx, nid, dd = local_topk(dist, ids, 0, False)
    assert len(qidx) == len(nid) == len(dd) == 0
    qidx, nid, dd = local_topk(np.empty((10, 0)), ids, 5, False)
    assert len(qidx) == 0


# --- r11 media byte-surgery properties --------------------------------------
# The PII scrubbers promise best-effort-never-crash and length
# preservation on ARBITRARY bytes; the JPEG encoder promises a bounded
# round-trip on arbitrary pixel content.  Property-fuzz both.

_px8 = st.integers(0, 255)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
)
def test_encode_jpeg_gray_roundtrip_property(h, w, seed):
    from knowhere_spark.functions.jpeg import decode_jpeg, encode_jpeg_gray

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    data = encode_jpeg_gray(px)
    assert data[:3] == b"\xff\xd8\xff" and data[-2:] == b"\xff\xd9"
    assert encode_jpeg_gray(px) == data          # deterministic
    dec = decode_jpeg(data) * 255.0
    assert dec.shape == (h, w)
    # flat q=8 bounds each coefficient's error at 4; the IDCT mixes 64
    # of them — 16.0 holds empirically with wide margin on noise images
    assert np.abs(dec - px).max() < 16.0


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_media_pii_scrub_total_on_arbitrary_bytes(blob):
    """strip_media_pii / media_pii_tags must never raise and never
    change payload length, whatever bytes arrive (corrupt crawl data is
    the common case, not the exception)."""
    from knowhere_spark.functions.exif import (
        media_pii_tags,
        strip_media_gps,
        strip_media_pii,
    )

    for fn in (strip_media_pii, strip_media_gps):
        out = fn(blob)
        assert isinstance(out, bytes) and len(out) == len(blob)
    tags = media_pii_tags(blob)
    assert set(tags) == {
        "make", "model", "orientation", "datetime", "artist", "has_gps"
    }


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 12), st.integers(0, 399))
def test_strip_png_pii_survives_corruption(seed, nflips, limit):
    """Random byte flips / truncations of a REAL PII-bearing PNG must
    never crash the scrub or change the length — the walker bails
    silently on malformed structure (the _iter_app1 contract)."""
    import struct as _st
    import zlib as _zl

    from knowhere_spark.functions.exif import png_exif_tags, strip_png_pii

    def chunk(t, d):
        return _st.pack(">I", len(d)) + t + d + _st.pack(">I", _zl.crc32(t + d))

    tiff = (
        b"II" + _st.pack("<H", 42) + _st.pack("<I", 8)
        + _st.pack("<H", 1)
        + _st.pack("<HHI", 0x8825, 4, 1) + _st.pack("<I", 26)
        + _st.pack("<I", 0)
        + _st.pack("<H", 0)
    )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _st.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
        + chunk(b"eXIf", tiff)
        + chunk(b"iTXt", b"XML:com.adobe.xmp\x00\x00\x00\x00\x00"
                + b'<r exif:GPSLatitude="1"/>')
        + chunk(b"IDAT", _zl.compress(b"\x00" * 20))
        + chunk(b"IEND", b"")
    )
    rng = np.random.default_rng(seed)
    buf = bytearray(png[: max(1, min(len(png), limit + 1))])
    for _ in range(nflips):
        buf[rng.integers(len(buf))] = rng.integers(256)
    blob = bytes(buf)
    out = strip_png_pii(blob)
    assert isinstance(out, bytes) and len(out) == len(blob)
    png_exif_tags(blob)   # must not raise either


# ---------------------------------------------------------------------------
# r12: WARC wire-layer + FLAC totality fuzz
# ---------------------------------------------------------------------------

@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_parse_warc_total_on_arbitrary_bytes(blob):
    """parse_warc must never raise, whatever bytes arrive — a crawl
    segment with garbage must yield its intact prefix (possibly [])."""
    from knowhere_spark.sources.warc import parse_warc

    for rec in parse_warc(blob):
        assert isinstance(rec["body"], (bytes, bytearray))


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_warc_wire_helpers_total(blob):
    """_dechunk / _inflate / _decode_body are best-effort total
    functions over arbitrary bytes (never raise, bytes/str out)."""
    from knowhere_spark.sources.warc import _dechunk, _decode_body, _inflate

    assert isinstance(_dechunk(blob), bytes)
    for enc in ("gzip", "x-gzip", "deflate", "br", ""):
        assert isinstance(_inflate(blob, enc), bytes)
    for ct in (None, "text/html", "text/html; charset=windows-1252",
               "text/html; charset=bogus-charset"):
        assert isinstance(_decode_body(blob, ct), str)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=80), min_size=0, max_size=5),
    st.integers(0, 2**32 - 1),
)
def test_warc_encode_parse_roundtrip_property(bodies, seed):
    """encode_warc_record → parse_warc recovers every record's body and
    url in order, for arbitrary binary blocks."""
    from knowhere_spark.sources.warc import encode_warc_record, parse_warc

    data = b"".join(
        encode_warc_record("resource", b, url=f"http://p{seed}.example/{i}")
        for i, b in enumerate(bodies)
    )
    recs = list(parse_warc(data))
    assert [r["body"] for r in recs] == bodies
    assert [r["url"] for r in recs] == [
        f"http://p{seed}.example/{i}" for i in range(len(bodies))
    ]


@settings(max_examples=30, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 400),
    st.sampled_from([8, 16, 24]),
    st.sampled_from([1, 2]),
    st.booleans(),
)
def test_flac_roundtrip_property(seed, n, bps, n_ch, mid_side):
    """encode_flac → decode_flac is lossless for arbitrary PCM shapes."""
    from knowhere_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    x = rng.integers(lo, hi + 1, (n, n_ch)).astype(np.int64)
    if n_ch == 1:
        x = x[:, 0]
    data = encode_flac(x, 16000, bps, block_size=64, mid_side=mid_side)
    y, sr = decode_flac(data)
    assert sr == 16000
    assert np.array_equal(y.reshape(x.shape), x)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 10))
def test_flac_decode_survives_corruption(seed, nflips):
    """Random byte flips of a valid FLAC stream must either decode or
    raise ValueError — never any other exception, never a hang."""
    from knowhere_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    x = rng.integers(-2000, 2000, 256).astype(np.int32)
    data = bytearray(encode_flac(x, 8000, 16, block_size=64))
    for pos in rng.integers(0, len(data), nflips):
        data[pos] ^= int(rng.integers(1, 256))
    try:
        y, _ = decode_flac(bytes(data))
        assert y.ndim in (1, 2)
    except ValueError:
        pass
