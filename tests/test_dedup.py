"""Dedup operators: exact, n-gram Jaccard oracle, MinHash-LSH vs the
exact oracle, SimHash, embedding cosine near-dup."""

from __future__ import annotations

import numpy as np
import pytest

from knowhere_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)

from tests.conftest import dense_df, gen_dense

WORDS = (
    "spark join window table row scan filter merge sort hash batch stream "
    "query value data key agg fast slow big small column line part"
).split()


def _mk_docs(seed=7, n=40):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        docs.append((i, " ".join(rng.choice(WORDS, size=30))))
    # exact dup (same normalized tokens, different case/punct)
    docs.append((100, docs[0][1].upper() + "!!"))
    # near dup: replace 2 of 30 words of doc 1
    toks = docs[1][1].split()
    toks[5], toks[20] = "zebra", "yak"
    docs.append((101, " ".join(toks)))
    # near dup of doc 2: append a few words
    docs.append((102, docs[2][1] + " extra words appended here"))
    return docs


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(_mk_docs(), "doc_id long, text string")


def test_exact_duplicates(docs_df):
    res = exact_duplicates(docs_df).collect()
    ids = sorted(r["doc_id"] for r in res)
    assert ids == [0, 100]
    canon = {r["doc_id"]: r["is_canonical"] for r in res}
    assert canon[0] and not canon[100]


def test_ngram_jaccard_finds_near_dups(docs_df):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs_df, 0.5).collect()}
    assert (0, 100) in pairs and pairs[(0, 100)] == 1.0
    assert (1, 101) in pairs
    assert (2, 102) in pairs


def test_minhash_lsh_matches_exact_oracle(docs_df):
    """LSH with 32 bands × 2 rows + exact verification == exact pairwise
    operator at threshold 0.5 (band-recall ≈ 1 at j ≥ 0.5 here)."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, 0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs_df, 0.5).collect()
    }
    assert set(lsh) == set(exact)
    for p in exact:
        assert lsh[p] == pytest.approx(exact[p], rel=1e-9)


def test_minhash_signature_similarity_estimates_jaccard(docs_df, spark):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs_df).collect()}
    est = np.mean(np.array(sigs[1]) == np.array(sigs[101]))
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, 0.0).collect()
        if (r["doc_a"], r["doc_b"]) == (1, 101)
    }
    true_j = exact[(1, 101)]
    assert abs(est - true_j) < 0.25   # 64 perms → σ ≈ 0.06, generous bound


def test_simhash_near_dups(docs_df):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs_df).collect()}
    assert sigs[0] == sigs[100]   # same token multiset → identical simhash
    ham = bin((sigs[1] ^ sigs[101]) & ((1 << 64) - 1)).count("1")
    assert ham <= 16
    # banding guarantee: any pair within hamming <= 3 shares a 16-bit band
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(docs_df, 3).collect()}
    assert (0, 100) in pairs and pairs[(0, 100)] == 0
    assert all(h <= 3 for h in pairs.values())


def test_embedding_neardup(spark):
    rng = np.random.default_rng(5)
    base = rng.normal(size=(50, 16)).astype(np.float32)
    base[10] = base[3] + rng.normal(scale=0.01, size=16)   # near-dup pair
    df = dense_df(spark, base)
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(df, 0.98).collect()}
    assert (3, 10) in pairs
    # no self-pairs, ordered ids
    assert all(a < b for a, b in pairs)


def test_embedding_neardup_ivf_recall(spark):
    """The IVF-routed scale path (distributed selfsearch) recovers the
    exact operator's planted pairs; precision is 1.0 by construction
    (true cosines reported)."""
    from knowhere_spark.operators.dedup import embedding_neardup_ivf

    rng = np.random.default_rng(6)
    base = rng.normal(size=(300, 16)).astype(np.float32)
    for a, b in [(3, 210), (47, 111), (90, 255)]:          # planted near-dups
        base[b] = base[a] + rng.normal(scale=0.01, size=16).astype(np.float32)
    df = dense_df(spark, base)
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(df, 0.98).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_ivf(df, 0.98, nlist=16, nprobe=8).collect()
    }
    assert set(got) <= set(exact)                           # precision 1.0
    recall = len(set(got) & set(exact)) / len(exact)
    assert recall >= 0.9, (recall, exact.keys(), got.keys())
    for p, c in got.items():
        assert c == pytest.approx(exact[p], rel=1e-9)


def test_simhash_trailing_empty_doc_batch(spark):
    """Regression: a doc that tokenizes to zero tokens at the END of a batch
    must not corrupt the previous doc's signature (reduceat boundary)."""
    from knowhere_spark.operators.dedup import simhash_signatures

    with_empty = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "?!")], "doc_id long, text string"
    ).coalesce(1)
    alone = spark.createDataFrame(
        [(0, "alpha beta gamma")], "doc_id long, text string"
    )
    sig_with = {r["doc_id"]: r["simhash"] for r in simhash_signatures(with_empty).collect()}
    sig_alone = {r["doc_id"]: r["simhash"] for r in simhash_signatures(alone).collect()}
    assert sig_with[0] == sig_alone[0]


# ---------------------------------------------------------------------------
# cross-corpus near-dup (minhash_lsh_pairs_cross / filter_against)
# ---------------------------------------------------------------------------

def _cross_corpora(spark):
    from pyspark.sql import functions as F
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "machine learning models require large curated corpora of natural text",
        "completely unrelated content about cooking pasta with garlic and olive oil",
        "distributed systems shuffle data between executors across the network",
    ]
    # left corpus: 12 docs; docs 0 and 1 are near-copies of eval docs
    left_rows = [
        (0, base[0] + " extra"),
        (1, base[1]),
        (2, base[2] + " completely different tail words here"),
        (3, base[3]),
    ] + [(10 + i, f"unique left doc number {i} " + " ".join(f"t{i}_{j}" for j in range(12))) for i in range(8)]
    right_rows = [
        (100, base[0]),                       # near-dups left 0
        (101, base[1] + " appended footnote"),  # near-dups left 1
        (102, "entirely separate evaluation question about astronomy and stars"),
    ]
    left = spark.createDataFrame(left_rows, "doc_id long, text string")
    right = spark.createDataFrame(right_rows, "doc_id long, text string")
    return left, right


def test_cross_pairs_planted(spark):
    from knowhere_spark.operators.dedup import minhash_lsh_pairs_cross

    left, right = _cross_corpora(spark)
    out = minhash_lsh_pairs_cross(left, right, 0.5, shingle_n=3)
    got = {(r.left_id, r.right_id) for r in out.collect()}
    assert got == {(0, 100), (1, 101)}
    for r in out.collect():
        assert 0.5 <= r.jaccard <= 1.0


def test_cross_pairs_match_exact_jaccard(spark):
    """Cross pairs at threshold equal the exact all-pairs shingle Jaccard."""
    from pyspark.sql import functions as F
    from knowhere_spark.functions.text import shingles_expr
    from knowhere_spark.operators.dedup import minhash_lsh_pairs_cross

    left, right = _cross_corpora(spark)
    lsh = {
        (r.left_id, r.right_id, round(r.jaccard, 6))
        for r in minhash_lsh_pairs_cross(left, right, 0.5).collect()
    }
    ls = left.select(F.col("doc_id").alias("left_id"), shingles_expr(F.col("text")).alias("sa"))
    rs = right.select(F.col("doc_id").alias("right_id"), shingles_expr(F.col("text")).alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size(F.array_union("sa", "sb")).cast("double")
    exact = {
        (r.left_id, r.right_id, round(r.j, 6))
        for r in ls.crossJoin(rs)
        .select("left_id", "right_id", (inter / union).alias("j"))
        .filter(F.col("j") >= 0.5)
        .collect()
    }
    assert lsh == exact


def test_filter_against_drops_contaminated(spark):
    from knowhere_spark.operators.dedup import filter_against

    left, right = _cross_corpora(spark)
    clean = filter_against(left, right, 0.5)
    kept = {r.doc_id for r in clean.collect()}
    assert 0 not in kept and 1 not in kept
    assert kept == {r.doc_id for r in left.collect()} - {0, 1}
    assert clean.columns == left.columns


def test_minhash_sig_chunked_equals_one_shot():
    """r12: the cache-blocked _minhash_sig must be bit-identical to the
    textbook one-shot reduceat over every chunk-boundary shape —
    single-doc batches, docs straddling the 8k chunk target, giant docs
    larger than one chunk, and tiny tail docs."""
    import numpy as np

    from knowhere_spark.operators.dedup import (
        _MERSENNE,
        _minhash_sig,
        _perm_constants,
    )

    rng = np.random.default_rng(5)
    a_, b_ = _perm_constants(128, 42)
    shapes = [
        [1],
        [5, 7, 3],
        [8192],
        [8191, 1, 8193],
        [20000, 3, 20000],
        list(rng.integers(1, 400, size=300)),
        list(rng.integers(1, 9000, size=12)),
    ]
    for counts in shapes:
        uniq_counts = np.array(counts, dtype=np.int64)
        total = int(uniq_counts.sum())
        hv = rng.integers(0, 1 << 28, size=total, dtype=np.int64)
        starts = np.zeros(len(uniq_counts), dtype=np.int64)
        starts[1:] = np.cumsum(uniq_counts)[:-1]
        ref = np.minimum.reduceat(
            (a_[:, None] * hv[None, :] + b_[:, None]) % _MERSENNE,
            starts,
            axis=1,
        ).T
        got = _minhash_sig(a_, b_, hv, uniq_counts)
        assert np.array_equal(got, ref), counts
