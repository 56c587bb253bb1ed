"""BPE train/encode (functions/bpe.py) — hand-traced merges, a pure-
Python reference encoder, round-trip and determinism properties."""

import pytest
from pyspark.sql import functions as F

from knowhere_spark.functions.bpe import (
    _merge_word,
    _word_symbols,
    bpe_encode,
    bpe_token_count,
    bpe_train,
)


def test_train_hand_traced_merges(spark):
    # classic toy corpus: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    m = bpe_train(docs, 4)
    got = [(r.left, r.right) for r in m.orderBy("rank").collect()]
    # counts: (e,s)=9, (s,t</w>)=9, (es,t</w>)=9 after merge1, ...
    # merge 1: ties (e,s) and (s,t</w>) at 9 → lexicographic min = (e, s)
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t</w>")   # 9
    # next: 'newest'->n e w est</w> x6, 'widest'->w i d est</w> x3,
    # 'low' x5 pairs (l,o)=7,(o,w</w>)=5,(o,w)=2 ... (l,o) wins at 7
    assert got[2] == ("l", "o")
    assert len(got) == 4


def test_encode_matches_reference_loop(spark):
    """Distributed encode == the pure-Python greedy loop on every doc."""
    rows = [
        (0, "the lowest new low prices for the newest widest wonders"),
        (1, "low lower lowest"),
        (2, ""),
        (3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    train = spark.createDataFrame(
        [(9, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3))],
        "doc_id long, text string",
    )
    merges = bpe_train(train, 8)
    ranks = {(r.left, r.right): r.rank for r in merges.collect()}
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}

    import re
    from knowhere_spark.functions.text import TOKEN_SPLIT_RE

    tok_re = re.compile(TOKEN_SPLIT_RE)
    for doc_id, text in rows:
        toks = [t for t in tok_re.split((text or "").lower()) if t]
        expect = []
        for w in toks:
            expect.extend(_merge_word(_word_symbols(w), ranks))
        assert list(out[doc_id].bpe_tokens) == expect, doc_id
        assert out[doc_id].n_bpe_tokens == len(expect)


def test_encode_compresses_trained_words(spark):
    """Words seen in training encode to fewer symbols than their length;
    a fully-merged training word becomes ONE token."""
    train = spark.createDataFrame(
        [(1, " ".join(["hello"] * 20))], "doc_id long, text string"
    )
    merges = bpe_train(train, 10)
    docs = spark.createDataFrame([(1, "hello stranger")], "doc_id long, text string")
    r = bpe_encode(docs, merges).first()
    assert r.bpe_tokens[0] == "hello" + "</w>"     # fully merged
    # 'stranger' is unseen: stays mostly character-level
    assert r.n_bpe_tokens >= 1 + 5


def test_token_count_only(spark):
    docs = spark.createDataFrame([(7, "aa aa bb")], "doc_id long, text string")
    merges = bpe_train(docs, 2)
    out = bpe_token_count(docs, merges).collect()
    assert len(out) == 1 and out[0].doc_id == 7
    assert out[0].n_bpe_tokens >= 3   # at most one token per word after merges


def test_train_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    a = [(r.rank, r.left, r.right) for r in bpe_train(docs, 12).orderBy("rank").collect()]
    b = [(r.rank, r.left, r.right) for r in bpe_train(docs, 12).orderBy("rank").collect()]
    assert a == b


def test_train_max_vocab_bounds_driver_collect(spark):
    """The scale contract (VERDICT r4 #1): with max_vocab=K the driver
    vocabulary is the count-ordered top-K regardless of how many distinct
    junk 'words' the crawl has — merges trained on a high-cardinality
    corpus with max_vocab equal the merges trained on just the frequent
    head, because the unique-tail is exactly what the clip drops."""
    head = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    # 400 distinct count-1 junk tokens (URL/typo stand-ins)
    junk_docs = [(100 + i, f"zz{i}qx{i}") for i in range(400)]
    dirty = spark.createDataFrame(
        [(1, head)] + junk_docs, "doc_id long, text string"
    )
    clean = spark.createDataFrame([(1, head)], "doc_id long, text string")
    capped = [
        (r.left, r.right)
        for r in bpe_train(dirty, 6, max_vocab=4).orderBy("rank").collect()
    ]
    head_only = [
        (r.left, r.right) for r in bpe_train(clean, 6).orderBy("rank").collect()
    ]
    assert capped == head_only
    # and the default cap is finite — an unbounded collect is opt-in only
    from knowhere_spark.functions.bpe import DEFAULT_MAX_VOCAB

    assert DEFAULT_MAX_VOCAB is not None and DEFAULT_MAX_VOCAB <= 2_000_000


def test_train_max_vocab_clip_deterministic_under_ties(spark):
    """All-count-1 vocabulary: the clip must break ties lexicographically,
    so two runs learn identical merges."""
    docs = spark.createDataFrame(
        [(i, f"w{i:03d}a w{i:03d}b") for i in range(50)], "doc_id long, text string"
    )
    a = [
        (r.rank, r.left, r.right)
        for r in bpe_train(docs, 5, max_vocab=10).orderBy("rank").collect()
    ]
    b = [
        (r.rank, r.left, r.right)
        for r in bpe_train(docs, 5, max_vocab=10).orderBy("rank").collect()
    ]
    assert a == b and len(a) > 0


def test_train_sample_docs_capped_mode(spark):
    """train_sample_docs mirrors the IVF capped-sample train contract:
    seeded, deterministic, and merges stay sane (dominant words still
    merge) when training on a fraction of the corpus."""
    rows = [(i, "low lower newest widest " * 3) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = [
        (r.rank, r.left, r.right)
        for r in bpe_train(docs, 6, train_sample_docs=40, seed=7)
        .orderBy("rank")
        .collect()
    ]
    b = [
        (r.rank, r.left, r.right)
        for r in bpe_train(docs, 6, train_sample_docs=40, seed=7)
        .orderBy("rank")
        .collect()
    ]
    assert a == b
    # every doc is identical, so the sampled merges == full-corpus merges
    full = [
        (r.rank, r.left, r.right)
        for r in bpe_train(docs, 6).orderBy("rank").collect()
    ]
    assert a == full


def test_train_exhausts_gracefully(spark):
    """Asking for more merges than exist stops early instead of looping."""
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    m = bpe_train(docs, 50).collect()
    # 'ab' -> a b</w> -> ab</w>: exactly one merge possible
    assert len(m) == 1


def test_merges_artifact_roundtrip(spark, tmp_path):
    """save_merges/load_merges: the reloaded tokenizer encodes byte-
    identically (the artifact IS the tokenizer)."""
    from knowhere_spark.functions.bpe import load_merges, save_merges

    train = spark.createDataFrame(
        [(9, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6))],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(0, "the lowest new low"), (1, "newest lows")], "doc_id long, text string"
    )
    merges = bpe_train(train, 6)
    path = str(tmp_path / "tokenizer")
    save_merges(merges, path)
    reloaded = load_merges(spark, path)
    a = {r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
         for r in bpe_encode(docs, merges).collect()}
    b = {r.doc_id: (list(r.bpe_tokens), r.n_bpe_tokens)
         for r in bpe_encode(docs, reloaded).collect()}
    assert a == b
