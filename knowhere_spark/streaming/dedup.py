"""Streaming exact-dedup — the stateful streaming member of the dedup
family (operators/dedup.exact_duplicates is the batch form).

A training-data ingest stream wants each document exactly once, with
duplicates suppressed ACROSS micro-batches — state that outlives any
window, which is precisely the ``applyInPandasWithState`` contract
(Spark's arbitrary-stateful-processing API; the escape hatch for
operators the built-in windowed aggregations can't express).

State per ``group_key`` is a single seen-count; the first row of a key
ever observed is emitted, every later arrival (same batch or any later
batch) is dropped and counted.  At 100 TB-scale ingest the state store is
keyed by the content hash — O(distinct docs) tiny fixed-size entries,
partitioned by Spark's state-store sharding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: emitted row: the first-seen doc for the key
_OUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("doc_id", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def stream_dedup_first_seen(
    events: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalized: bool = True,
) -> DataFrame:
    """First-seen filter over a document stream: emits
    ``(group_key, doc_id)`` for the first occurrence of each normalized
    content hash; duplicates across micro-batches are suppressed by the
    keyed state store.  Keying mirrors the batch operator
    (operators/dedup.exact_duplicates): md5 over the token stream when
    ``normalized``, raw text otherwise.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from knowhere_spark.functions.text import tokens_expr

    key = (
        F.md5(F.concat_ws(" ", tokens_expr(F.col(text_col))))
        if normalized
        else F.md5(F.col(text_col))
    )
    keyed = events.select(
        key.alias("group_key"), F.col(id_col).cast("long").alias("doc_id")
    )

    def fn(key_tuple, pdfs, state):
        import pandas as pd

        seen = state.get[0] if state.exists else 0
        first = None
        n = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if seen == 0:
                # min doc_id across the WHOLE micro-batch (a large group can
                # arrive as several Arrow chunks) = the canonical row,
                # matching the batch operator's is_canonical tie-break
                cand = pdf.nsmallest(1, "doc_id")[["group_key", "doc_id"]]
                if first is None or cand["doc_id"].iloc[0] < first["doc_id"].iloc[0]:
                    first = cand
            n += len(pdf)
        state.update((seen + n,))
        if seen == 0 and first is not None:
            yield first

    return keyed.groupBy("group_key").applyInPandasWithState(
        fn,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming near-dup (MinHash-LSH with banded keyed state)
# ---------------------------------------------------------------------------

_PAIR_SCHEMA = StructType(
    [
        StructField("doc_a", LongType()),
        StructField("doc_b", LongType()),
        StructField("est_jaccard", DoubleType()),
    ]
)


def stream_neardup_minhash(
    docs: DataFrame,
    threshold: float,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
    state: str = "signatures",
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Streaming near-duplicate detection: each arriving document is
    MinHash-signed (the batch kernel, operators/dedup.minhash_signatures,
    runs unchanged on the micro-batch), banded, and matched against every
    document EVER seen in the same (band, band_hash) bucket — the bucket
    membership lives in the keyed state store, so near-dup pairs are found
    across micro-batches, the property the batch operator can't give an
    ingest pipeline.

    Emits ``(doc_a, doc_b, est_jaccard)`` with ``doc_a < doc_b`` and
    ``est_jaccard >= threshold``, where ``est_jaccard`` is the signature
    agreement fraction (the standard unbiased MinHash estimator; exact
    shingle verification would require keeping every shingle set in state —
    run the batch verifier over flagged pairs downstream when exactness is
    required).  A pair sharing several buckets is emitted once per sharing
    band in the batch it first matches; consumers dedupe with
    ``dropDuplicates([doc_a, doc_b])``.

    ``state`` picks the per-bucket state shape (r10, from the measured
    10k-doc probe — SCALE.md):

    - ``"signatures"`` (default): ``(ids, sigs flattened)`` —
      O(bucket population · num_perm) longs (~25 KB/doc measured at
      64 perms × 32 bands), buys the thresholded ``est_jaccard`` in the
      emitted rows.
    - ``"ids"``: ids only — the signature payload shrinks num_perm×;
      total state measured 3.3× smaller at 10k docs (251 → 76 MB —
      per-row state-store overhead dominates once signatures go).
      Emits every co-bucketed pair as a CANDIDATE with ``est_jaccard``
      null and ``threshold`` ignored; run the batch verifier (or exact
      Jaccard) over candidates downstream.  At 10⁹-doc ingest scale run
      ``state="ids"`` — the signature payload is the 25×-heavier shape
      (SCALE.md r10: 251 vs 76 MB state at 10k docs) and the estimator
      it buys is better recomputed by the batch verifier anyway.

    ``max_bucket`` (both modes) is the stop-bucket cap the media twins
    carry: a bucket at the cap stops accepting members (boilerplate
    band values cannot grow state or pair fan-out without bound).
    Defaults to ``10_000`` — the media twins' default (stop-hash cap in
    :func:`stream_video_neardup` / audio) — so the unbounded-state shape
    is opt-in (``max_bucket=None``), not the default.  Like the twins'
    cap it is not retroactive: members admitted before the cap stand.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from knowhere_spark.operators.dedup import minhash_signatures

    assert num_perm % bands == 0
    if state not in ("signatures", "ids"):
        raise ValueError("state must be 'signatures' or 'ids'")
    keep_sigs = state == "signatures"

    sigs = minhash_signatures(
        docs, id_col=id_col, text_col=text_col, num_perm=num_perm,
        shingle_n=shingle_n, seed=seed,
    )
    from knowhere_spark.operators.dedup import band_hash_explode_expr

    banded = sigs.select(
        "doc_id",
        *(["sig"] if keep_sigs else []),   # ids mode: no sigs shuffled
        F.posexplode(band_hash_explode_expr(num_perm, bands)).alias(
            "band", "band_hash"
        ),
    ).select(
        F.concat_ws(":", F.col("band").cast("string"), "band_hash").alias("bucket"),
        "doc_id",
        *(["sig"] if keep_sigs else []),
    )

    state_fields = [StructField("ids", ArrayType(LongType()))]
    if keep_sigs:
        state_fields.append(StructField("sigs", ArrayType(LongType())))
    state_schema = StructType(state_fields)
    cap = max_bucket

    def fn(key_tuple, pdfs, group_state):
        import numpy as np
        import pandas as pd

        if group_state.exists:
            ids = list(group_state.get[0])
            flat = list(group_state.get[1]) if keep_sigs else None
        else:
            ids, flat = [], ([] if keep_sigs else None)
        out_a, out_b, out_j = [], [], []
        for pdf in pdfs:
            if keep_sigs:
                arrivals = zip(pdf["doc_id"], pdf["sig"])
            else:
                arrivals = ((d, None) for d in pdf["doc_id"])
            for doc_id, sig in arrivals:
                doc_id = int(doc_id)
                if cap is not None and len(ids) >= cap:
                    break   # stop bucket: bounded state, no more matches
                if keep_sigs:
                    s = np.asarray(sig, dtype=np.int64)
                    if ids:
                        M = np.asarray(flat, dtype=np.int64).reshape(
                            len(ids), num_perm
                        )
                        est = (M == s[None, :]).mean(axis=1)
                        for j, other in zip(est, ids):
                            if j >= threshold and other != doc_id:
                                out_a.append(min(other, doc_id))
                                out_b.append(max(other, doc_id))
                                out_j.append(float(j))
                    flat.extend(int(x) for x in s)
                else:
                    for other in ids:
                        if other != doc_id:
                            out_a.append(min(other, doc_id))
                            out_b.append(max(other, doc_id))
                            out_j.append(None)
                ids.append(doc_id)
        group_state.update((ids, flat) if keep_sigs else (ids,))
        if out_a:
            yield pd.DataFrame(
                {"doc_a": out_a, "doc_b": out_b, "est_jaccard": out_j}
            )

    return banded.groupBy("bucket").applyInPandasWithState(
        fn,
        _PAIR_SCHEMA,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


#: match-evidence row for streaming video near-dup: one row per
#: (newly arrived video, prior owner, shared frame hash)
_VIDEO_MATCH_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("n_a", LongType()),
        StructField("n_b", LongType()),
        StructField("phash", LongType()),
    ]
)


def stream_video_neardup(
    media: DataFrame,
    *,
    every_n: int = 1,
    max_hash_freq: int = 10_000,
    decoders: dict | None = None,
) -> DataFrame:
    """Streaming video near-dup: each arriving video's keyframe-pHash
    signature (operators/multimodal.video_signatures — real MP4/GIF
    container parsing, per-video distinct hashes + denominator computed
    in the same kernel pass) is matched against every video EVER seen
    sharing a frame hash; the per-hash owner list lives in the keyed
    state store, so re-uploads are caught across micro-batches.

    Emits match EVIDENCE rows ``(id_a, id_b, n_a, n_b, phash)`` with
    ``id_a < id_b`` — one row per shared frame hash the pair first
    matches on.  Overlap aggregation (``count distinct phash /
    min(n_a, n_b) >= threshold``) is the consumer's move, e.g.
    :func:`video_match_overlap` inside ``foreachBatch`` or over the
    collected evidence — the same aggregate-downstream contract as
    :func:`stream_neardup_minhash`'s signature estimates.

    ``max_hash_freq`` is the streaming form of the batch stop-hash cap
    (operators/multimodal.video_neardup_pairs): once a frame hash has
    been seen in that many videos (black frames, intro logos), its
    owner list stops growing AND stops emitting matches — state per
    hash is bounded at ``max_hash_freq`` entries, so one corpus-wide
    frame cannot grow a state key without bound or emit O(freq²) rows.
    Unlike the batch cap it is not retroactive: pairs emitted before
    the hash hit the cap stand.

    **Denominator semantics vs batch**: ``n_a``/``n_b`` here are each
    video's FULL distinct-hash count — a streaming operator cannot
    retroactively know which hashes later hit the cap, so stop hashes
    stay in the denominator and dilute overlap.  The batch operator's
    default divides by the post-drop count instead; run it with
    ``denominator="pre_drop"`` when a batch backfill must agree with
    streaming verdicts, or set thresholds knowing streaming overlap for
    a pair with ``s`` stop hashes is ``post_drop_overlap · (n - s) /
    n``.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from knowhere_spark.operators.multimodal import video_signatures

    if max_hash_freq < 1:
        raise ValueError("max_hash_freq must be >= 1")
    sigs = video_signatures(media, every_n=every_n, decoders=decoders)

    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType())),
            StructField("counts", ArrayType(LongType())),
        ]
    )

    def fn(key_tuple, pdfs, state):
        import pandas as pd

        phash = int(key_tuple[0])
        if state.exists:
            ids, counts = list(state.get[0]), list(state.get[1])
        else:
            ids, counts = [], []
        rows = {"id_a": [], "id_b": [], "n_a": [], "n_b": [], "phash": []}
        for pdf in pdfs:
            for mid, n in zip(pdf["media_id"], pdf["n_hashes"]):
                mid, n = int(mid), int(n)
                if len(ids) >= max_hash_freq:
                    break   # stop hash: bounded state, no more matches
                for other, other_n in zip(ids, counts):
                    if other == mid:
                        continue
                    a, b = sorted((mid, other))
                    na, nb = (n, other_n) if a == mid else (other_n, n)
                    rows["id_a"].append(a)
                    rows["id_b"].append(b)
                    rows["n_a"].append(na)
                    rows["n_b"].append(nb)
                    rows["phash"].append(phash)
                ids.append(mid)
                counts.append(n)
        state.update((ids, counts))
        if rows["id_a"]:
            yield pd.DataFrame(rows)

    return sigs.groupBy("phash").applyInPandasWithState(
        fn,
        _VIDEO_MATCH_SCHEMA,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def video_match_overlap(evidence: DataFrame, min_overlap: float) -> DataFrame:
    """Aggregate :func:`stream_video_neardup` evidence rows into
    near-dup pairs: ``overlap = distinct shared hashes / min(n_a, n_b)``
    — a plain batch aggregation, runnable inside ``foreachBatch`` or
    over collected evidence.  Returns ``(id_a, id_b, matches,
    overlap)``."""
    if not 0.0 < min_overlap <= 1.0:
        raise ValueError("min_overlap must be in (0, 1]")
    return (
        evidence.groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.countDistinct("phash").alias("matches"))
        .withColumn(
            "overlap", F.col("matches") / F.least("n_a", "n_b")
        )
        .filter(F.col("overlap") >= min_overlap)
        .select(
            "id_a", "id_b", "matches", F.round("overlap", 6).alias("overlap")
        )
    )


def stream_neardup_images(
    media: DataFrame,
    *,
    max_hamming: int = 3,
    max_bucket: int = 10_000,
    decoders: dict | None = None,
) -> DataFrame:
    """Streaming image near-dup: each arriving image's pHash
    (operators/multimodal.image_phash — real decode of the built-in
    formats) is pigeonhole-banded (the EXACT banding shared with the
    batch join, operators/dedup.hamming64_band_exprs) and matched
    against every image EVER seen in the same (band, band_val) bucket —
    bucket membership lives in the keyed state store, so re-encoded
    copies arriving in later micro-batches are caught.

    Emits ``(id_a, id_b, hamming)`` with ``id_a < id_b`` and
    ``hamming <= max_hamming`` — exact (the banding guarantees a
    within-bound pair shares at least one bucket).  A pair sharing
    several buckets is emitted once per sharing band in the batch it
    first matches; consumers dedupe with ``dropDuplicates``, the same
    contract as :func:`stream_neardup_minhash`.

    ``max_bucket`` is the stop-hash guard every streaming near-dup op
    here carries (stream_video_neardup's ``max_hash_freq``): a bucket a
    corpus-common image lands in (all-black frames, logos, test cards —
    identical pHash, hence identical bands) would otherwise grow state
    without bound and emit O(population²) rows.  At the cap the bucket
    stops growing AND stops emitting; state per bucket is bounded at
    ``max_bucket`` ``(id, phash)`` longs."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from knowhere_spark.operators.dedup import hamming64_band_exprs
    from knowhere_spark.operators.multimodal import image_phash

    if max_bucket < 1:
        raise ValueError("max_bucket must be >= 1")
    return _stream_banded_hash64(
        image_phash(media, decoders=decoders),
        hash_col="phash",
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


def _stream_banded_hash64(
    sigs: DataFrame,
    *,
    hash_col: str,
    max_hamming: int,
    max_bucket: int,
) -> DataFrame:
    """The shared streaming banded-Hamming core: 64-bit signatures →
    pigeonhole bands → per-bucket keyed state matching every signature
    EVER seen in the bucket, ``max_bucket``-capped.  Backs the image
    (pHash) and audio (SRP-hash) streaming near-dup operators."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from knowhere_spark.operators.dedup import hamming64_band_exprs

    banded = sigs.select(
        "media_id",
        F.col(hash_col).alias("phash"),
        F.posexplode(
            # band exprs must reference the INPUT column: an alias
            # defined in the same select is not visible to siblings
            F.array(*hamming64_band_exprs(hash_col, max_hamming))
        ).alias("band", "band_val"),
    ).select(
        F.concat_ws(
            ":", F.col("band").cast("string"), F.col("band_val").cast("string")
        ).alias("bucket"),
        "media_id",
        "phash",
    )

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("hamming", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType())),
            StructField("phashes", ArrayType(LongType())),
        ]
    )

    def fn(key_tuple, pdfs, state):
        import pandas as pd

        if state.exists:
            ids, hashes = list(state.get[0]), list(state.get[1])
        else:
            ids, hashes = [], []
        rows = {"id_a": [], "id_b": [], "hamming": []}
        for pdf in pdfs:
            for mid, h in zip(pdf["media_id"], pdf["phash"]):
                mid, h = int(mid), int(h)
                if len(ids) >= max_bucket:
                    break   # stop bucket: bounded state, no more matches
                for other, oh in zip(ids, hashes):
                    if other == mid:
                        continue
                    d = bin((h ^ oh) & ((1 << 64) - 1)).count("1")
                    if d <= max_hamming:
                        rows["id_a"].append(min(mid, other))
                        rows["id_b"].append(max(mid, other))
                        rows["hamming"].append(d)
                ids.append(mid)
                hashes.append(h)
        state.update((ids, hashes))
        if rows["id_a"]:
            yield pd.DataFrame(rows)

    return banded.groupBy("bucket").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_neardup_audio(
    media: DataFrame,
    *,
    max_hamming: int = 6,
    max_bucket: int = 10_000,
    n_bands: int = 16,
    frame: int = 256,
    hop: int = 128,
    seed: int = 7,
    decoders: dict | None = None,
) -> DataFrame:
    """Streaming audio near-dup — the fourth modality's streaming twin
    (text MinHash, image pHash, video frame-pHash state ops above):
    each arriving clip's 64-bit SRP spectral hash
    (operators/multimodal.audio_srp_hash; E[hamming] ≈ 64·angle/π, so
    ``max_hamming=6`` ≈ cosine ≥ ~0.96) goes through the SAME banded
    bucket state as images — re-uploaded or level-changed audio
    arriving in later micro-batches is caught.  Emits
    ``(id_a, id_b, hamming)``; candidates are LSH-approximate in the
    usual direction (the batch operator's exact cosine —
    `audio_neardup_pairs(strategy="exact")` — is the verifier for
    flagged pairs; its default `strategy="banded"` is this stream's
    batch twin, same SRP hash + banding)."""
    from knowhere_spark.operators.multimodal import audio_srp_hash

    if max_bucket < 1:
        raise ValueError("max_bucket must be >= 1")
    return _stream_banded_hash64(
        audio_srp_hash(
            media, n_bands=n_bands, frame=frame, hop=hop, seed=seed,
            decoders=decoders,
        ),
        hash_col="ahash",
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )
