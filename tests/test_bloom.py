"""Bloom-filter corpus membership (operators/bloom.py) — planted-overlap
filtering, no-false-negative guarantee, FP rate vs theory, merge and
persistence roundtrips."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from knowhere_spark.operators.bloom import BloomFilter


def _docs(spark, ids, prefix="doc"):
    return spark.createDataFrame(
        [(i, f"{prefix} number {i} with its own content body") for i in ids],
        "doc_id long, text string",
    )


def test_history_dedup_no_false_negatives(spark):
    history = _docs(spark, range(200))
    bf = BloomFilter.build(history, m_bits=1 << 16, k=7)
    assert bf.n_items == 200
    # new corpus: 50 docs overlap history exactly, 50 are fresh
    new = _docs(spark, range(150, 250))
    kept = {r.doc_id for r in bf.filter_unseen(new).collect()}
    # every true duplicate (150..199) is GONE — no false negatives
    assert kept.isdisjoint(set(range(150, 200)))
    # nearly all fresh docs survive (fp_rate is tiny at this load)
    assert len(kept & set(range(200, 250))) >= 48
    flagged = bf.seen_expr_frame(new).filter(F.col("seen_before"))
    assert {r.doc_id for r in flagged.collect()} >= set(range(150, 200))


def test_fp_rate_tracks_theory(spark):
    history = _docs(spark, range(2000))
    bf = BloomFilter.build(history, m_bits=1 << 15, k=5)   # loaded filter
    fresh = _docs(spark, range(100000, 104000))
    hits = bf.seen_expr_frame(fresh).filter(F.col("seen_before")).count()
    observed = hits / 4000
    assert observed <= 3 * bf.fp_rate() + 0.01, (observed, bf.fp_rate())


def test_merge_and_persistence_roundtrip(spark, tmp_path):
    a = BloomFilter.build(_docs(spark, range(0, 100)), m_bits=1 << 14, k=5)
    b = BloomFilter.build(_docs(spark, range(100, 200)), m_bits=1 << 14, k=5)
    u = a.merge(b)
    both = _docs(spark, [5, 150])
    assert bf_all_seen(u, both)
    path = str(tmp_path / "bloom")
    u.save(path)
    u2 = BloomFilter.load(path)
    np.testing.assert_array_equal(u.bits, u2.bits)
    assert u2.k == u.k and u2.n_items == u.n_items
    assert bf_all_seen(u2, both)
    # geometry mismatch refuses to merge
    c = BloomFilter.build(_docs(spark, range(5)), m_bits=1 << 13, k=5)
    try:
        u.merge(c)
        raise AssertionError("expected geometry mismatch")
    except ValueError:
        pass


def bf_all_seen(bf, df) -> bool:
    out = bf.seen_expr_frame(df).collect()
    return all(r.seen_before for r in out)


def test_null_text_never_seen(spark):
    hist = _docs(spark, range(10))
    bf = BloomFilter.build(hist, m_bits=1 << 13, k=5)
    new = spark.createDataFrame(
        [(0, None), (1, "doc number 3 with its own content body")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.seen_before for r in bf.seen_expr_frame(new).collect()}
    assert out[0] is False and out[1] is True


def test_curate_corpus_with_history(spark):
    """The daily-ingest composition: curate_corpus(history=...) drops
    previously-ingested content before the LSH stage."""
    from knowhere_spark.operators.pipeline import curate_corpus

    yesterday = _docs(spark, range(100))
    bf = BloomFilter.build(yesterday, m_bits=1 << 15, k=7)
    today = _docs(spark, range(80, 160))   # 20 re-crawled + 60 fresh
    out = {r.doc_id for r in curate_corpus(today, min_tokens=2, history=bf).collect()}
    assert out.isdisjoint(set(range(80, 100)))       # re-ingests gone
    assert len(out & set(range(100, 160))) >= 58     # fresh survive (fp slack)
    # without history the re-crawls survive curation
    base = {r.doc_id for r in curate_corpus(today, min_tokens=2).collect()}
    assert set(range(80, 100)) <= base


def test_fp_staging_column_collision(spark):
    """ADVICE r5: a caller whose frame already carries a '__fp' column
    must get it back intact — the membership kernel's staging column is
    uniquified, not overwritten-then-dropped."""
    from pyspark.sql import functions as F

    from knowhere_spark.operators.bloom import BloomFilter

    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], "id long, text string")
    bf = BloomFilter.build(df, m_bits=1 << 12, k=3)
    withfp = df.withColumn("__fp", F.lit(123))
    out = bf.seen_expr_frame(withfp).collect()
    assert all(r["__fp"] == 123 for r in out)       # caller column survives
    assert all(r["seen_before"] for r in out)       # membership still works
