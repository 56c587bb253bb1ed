"""Sparse IP/BM25 vs a pure-python oracle — reference pattern
(tests/ut/test_sparse.cc: full evaluation exact; drop_ratio_search>0
recall-bounded)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StructField,
    StructType,
)

from knowhere_spark.config import MetricType, SparseConfig
from knowhere_spark.operators.sparse import SparseInvertedIndex, text_to_sparse

from tests.conftest import gen_sparse, recall_at_k

NB, DIM, NQ, K = 300, 500, 8, 10
SPARSITY = 0.95

SPARSE_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("vec", MapType(IntegerType(), FloatType()))]
)
SPARSE_QUERY_SCHEMA = StructType(
    [StructField("query_id", LongType()), StructField("vec", MapType(IntegerType(), FloatType()))]
)


@pytest.fixture(scope="module")
def data(spark):
    base = gen_sparse(NB, DIM, SPARSITY, seed=42)
    queries = gen_sparse(NQ, DIM, SPARSITY, seed=43)
    base_df = spark.createDataFrame(list(enumerate(base)), SPARSE_SCHEMA)
    query_df = spark.createDataFrame(list(enumerate(queries)), SPARSE_QUERY_SCHEMA)
    return base, queries, base_df, query_df


def py_ip_topk(base, queries, k):
    out = {}
    for qi, q in enumerate(queries):
        scores = []
        for di, d in enumerate(base):
            s = sum(qv * d.get(t, 0.0) for t, qv in q.items())
            if s > 0:
                scores.append((di, s))
        scores.sort(key=lambda x: (-x[1], x[0]))
        out[qi] = scores[:k]
    return out


def py_bm25_topk(base, queries, k, k1, b, avgdl):
    doc_lens = [sum(d.values()) for d in base]
    out = {}
    for qi, q in enumerate(queries):
        scores = []
        for di, d in enumerate(base):
            s = 0.0
            for t, qv in q.items():
                tf = d.get(t, 0.0)
                if tf > 0:
                    s += qv * tf * (k1 + 1) / (tf + k1 * (1 - b + b * doc_lens[di] / avgdl))
            if s > 0:
                scores.append((di, s))
        scores.sort(key=lambda x: (-x[1], x[0]))
        out[qi] = scores[:k]
    return out


def _collect(df):
    out = {}
    for r in df.orderBy("query_id", "rank").collect():
        out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    return out


def test_sparse_ip_exact(data):
    base, queries, base_df, query_df = data
    cfg = SparseConfig(metric_type="IP", inverted_index_algo="TAAT_NAIVE", k=K)
    idx = SparseInvertedIndex.build(base_df, cfg)
    res = _collect(idx.search(query_df, k=K))
    truth = py_ip_topk(base, queries, K)
    for q in truth:
        got = [(i, pytest.approx(s, rel=1e-6)) for i, s in res.get(q, [])]
        assert [i for i, _ in res.get(q, [])] == [i for i, _ in truth[q]]
        for (gi, gs), (ti, ts) in zip(res.get(q, []), truth[q]):
            assert gs == pytest.approx(ts, rel=1e-6)


def test_sparse_bm25_exact(data):
    base, queries, base_df, query_df = data
    cfg = SparseConfig(
        metric_type="BM25", inverted_index_algo="TAAT_NAIVE", k=K,
        bm25_k1=1.2, bm25_b=0.75,
    )
    idx = SparseInvertedIndex.build(base_df, cfg)
    res = _collect(idx.search(query_df, k=K))
    truth = py_bm25_topk(base, queries, K, 1.2, 0.75, idx.avgdl)
    for q in truth:
        assert [i for i, _ in res.get(q, [])] == [i for i, _ in truth[q]], q
        for (gi, gs), (ti, ts) in zip(res.get(q, []), truth[q]):
            assert gs == pytest.approx(ts, rel=1e-6)


def test_sparse_drop_ratio_recall(data):
    """drop_ratio_search prunes low-weight query terms; recall >= 0.9
    (BASELINE.md sparse target)."""
    base, queries, base_df, query_df = data
    cfg = SparseConfig(metric_type="IP", k=K)
    idx = SparseInvertedIndex.build(base_df, cfg)
    res = _collect(idx.search(query_df, k=K, drop_ratio_search=0.15))
    truth = py_ip_topk(base, queries, K)
    r = recall_at_k(res, {q: v for q, v in truth.items()}, K)
    assert r >= 0.9, r
    # heavier pruning degrades gracefully, never catastrophically
    res3 = _collect(idx.search(query_df, k=K, drop_ratio_search=0.3))
    assert recall_at_k(res3, truth, K) >= 0.75


def test_sparse_refine_factor_recovers_recall(data):
    """The approximate contract (sparse_inverted_index.h:440-459 +
    sparse_inverted_index_config.h:20-108): drop_ratio_search>0 generates
    refine_factor*k candidates with the pruned query, full re-score picks
    the final top-k.  Recall floor >= 0.9 under heavy pruning, mirroring
    test_sparse.cc's pattern, and refine must not lose to no-refine."""
    base, queries, base_df, query_df = data
    cfg = SparseConfig(
        metric_type="IP", inverted_index_algo="DAAT_MAXSCORE",
        k=K, drop_ratio_search=0.3, refine_factor=5,
    )
    idx = SparseInvertedIndex.build(base_df, cfg)
    truth = py_ip_topk(base, queries, K)
    refined = _collect(idx.search(query_df, k=K))
    unrefined = _collect(idx.search(query_df, k=K, refine_factor=1))
    r_ref = recall_at_k(refined, truth, K)
    r_unref = recall_at_k(unrefined, truth, K)
    assert r_ref >= 0.9, (r_ref, r_unref)
    assert r_ref >= r_unref
    # refined scores are FULL-query scores (exact for the docs returned)
    full = {(r["query_id"], r["doc_id"]): r["score"]
            for r in idx.search(query_df, k=K, drop_ratio_search=0.0).collect()}
    for r in idx.search(query_df, k=K).collect():
        key = (r["query_id"], r["doc_id"])
        if key in full:
            assert r["score"] == pytest.approx(full[key], rel=1e-9)


def test_sparse_bm25_refine_factor(data):
    """Refine under BM25 scoring: candidates from the pruned query,
    re-ranked by full BM25 (the k1/b/avgdl contract unchanged)."""
    base, queries, base_df, query_df = data
    k1, b = 1.2, 0.75
    cfg = SparseConfig(
        metric_type="BM25", inverted_index_algo="DAAT_WAND",
        k=K, bm25_k1=k1, bm25_b=b,
        drop_ratio_search=0.3, refine_factor=5,
    )
    idx = SparseInvertedIndex.build(base_df, cfg)
    doc_lens = [sum(d.values()) for d in base]
    avgdl = sum(doc_lens) / len(doc_lens)
    truth = py_bm25_topk(base, queries, K, k1, b, avgdl)
    refined = _collect(idx.search(query_df, k=K))
    assert recall_at_k(refined, truth, K) >= 0.9


def test_sparse_maxscore_pruning_still_topk(data):
    """DAAT_MAXSCORE stats pre-filter keeps the top-k intact on this corpus."""
    base, queries, base_df, query_df = data
    cfg = SparseConfig(metric_type="IP", inverted_index_algo="DAAT_MAXSCORE", k=K)
    idx = SparseInvertedIndex.build(base_df, cfg)
    res = _collect(idx.search(query_df, k=K))
    truth = py_ip_topk(base, queries, K)
    r = recall_at_k(res, truth, K)
    assert r >= 0.95, r


def test_sparse_filtered_search(data):
    from pyspark.sql import functions as F

    base, queries, base_df, query_df = data
    cfg = SparseConfig(metric_type="IP", k=K)
    idx = SparseInvertedIndex.build(base_df, cfg)
    res = _collect(idx.search(query_df, k=K, filter_expr=F.col("doc_id") % 2 == 0))
    for q, pairs in res.items():
        assert all(i % 2 == 0 for i, _ in pairs)


def test_sparse_save_load(data, spark, tmp_path):
    base, queries, base_df, query_df = data
    cfg = SparseConfig(metric_type="BM25", k=K)
    idx = SparseInvertedIndex.build(base_df, cfg)
    before = _collect(idx.search(query_df, k=K))
    idx.save(str(tmp_path / "sparse_idx"))
    idx2 = SparseInvertedIndex.load(spark, str(tmp_path / "sparse_idx"))
    after = _collect(idx2.search(query_df, k=K))
    assert {q: [i for i, _ in v] for q, v in before.items()} == {
        q: [i for i, _ in v] for q, v in after.items()
    }


def test_text_to_sparse(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "a dog; a DOG!")],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in text_to_sparse(df).collect()}
    assert rows[0]["vec"]["the"] == 2.0
    assert rows[0]["doc_len"] == 6.0
    assert rows[1]["vec"]["dog"] == 2.0 and rows[1]["vec"]["a"] == 2.0
    assert rows[1]["doc_len"] == 4.0


def test_brute_force_search_sparse_matches_index(spark):
    """Index-less SearchSparse (brute_force.h:44-50) == unpruned index search."""
    from knowhere_spark.config import SparseConfig
    from knowhere_spark.operators.brute_force import BruteForce
    from knowhere_spark.operators.sparse import SparseInvertedIndex

    from conftest import gen_sparse

    rows = gen_sparse(80, 400, 0.9, seed=91)
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "id long, vec map<int,float>"
    )
    qdf = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows[:3])], "query_id long, vec map<int,float>"
    )
    a = sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 6))
        for r in BruteForce.search_sparse(df, qdf, 5).collect()
    )
    idx = SparseInvertedIndex.build(df, SparseConfig(metric_type="IP"))
    b = sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 6))
        for r in idx.search(qdf, k=5, prune_terms=False).collect()
    )
    assert a == b


def test_sparse_range_search_ip(spark, data):
    """radius < score <= range_filter (similarity direction,
    range_util.h:22-25) against the python oracle."""
    base, queries, base_df, query_df = data
    idx = SparseInvertedIndex.build(base_df, SparseConfig(metric_type="IP"))
    radius, range_filter = 2.0, 100.0
    cfg = SparseConfig(metric_type="IP", radius=radius, range_filter=range_filter)
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in idx.range_search(query_df, cfg).collect()
    }
    expect = {}
    for qi, q in enumerate(queries):
        for di, d in enumerate(base):
            s = sum(qv * d.get(t, 0.0) for t, qv in q.items())
            if radius < s <= range_filter:
                expect[(qi, di)] = s
    assert set(got) == set(expect)
    for p in expect:
        assert got[p] == pytest.approx(expect[p], rel=1e-9)


def test_sparse_range_search_k_truncates(spark, data):
    base, queries, base_df, query_df = data
    idx = SparseInvertedIndex.build(base_df, SparseConfig(metric_type="IP"))
    cfg = SparseConfig(metric_type="IP", radius=0.5, range_filter=1e9, range_search_k=3)
    rows = idx.range_search(query_df, cfg).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["score"])
    full = idx.range_search(
        query_df, SparseConfig(metric_type="IP", radius=0.5, range_filter=1e9)
    ).collect()
    full_q = {}
    for r in full:
        full_q.setdefault(r["query_id"], []).append(r["score"])
    for q, scores in per_q.items():
        assert len(scores) <= 3
        # truncation keeps the best hits
        assert sorted(scores, reverse=True) == sorted(full_q[q], reverse=True)[: len(scores)]


# --- r5: exact set-based MaxScore (Turtle & Flood; the reference's
# DAAT_MAXSCORE lossless contract at drop_ratio=0) ----------------------------

def _pairs(df):
    return {
        (r.query_id, r.doc_id, round(float(r.score), 9), r.rank)
        for r in df.collect()
    }


def test_maxscore_exact_equals_full_ip(data):
    """search_maxscore_exact returns EXACTLY the full scoring's top-k —
    lossless pruning, row-for-row including tie order."""
    base, queries, base_df, query_df = data
    cfg = SparseConfig(metric_type="IP", inverted_index_algo="TAAT_NAIVE", k=K)
    idx = SparseInvertedIndex.build(base_df, cfg)
    full = _pairs(idx.search(query_df, k=K, prune_terms=False))
    pruned = _pairs(idx.search_maxscore_exact(query_df, k=K))
    assert pruned == full


def test_maxscore_exact_equals_full_bm25(data):
    base, queries, base_df, query_df = data
    cfg = SparseConfig(metric_type="BM25", inverted_index_algo="TAAT_NAIVE", k=K)
    idx = SparseInvertedIndex.build(base_df, cfg)
    full = _pairs(idx.search(query_df, k=K, prune_terms=False))
    pruned = _pairs(idx.search_maxscore_exact(query_df, k=K))
    assert pruned == full


def test_maxscore_exact_opt_in_and_filter(data):
    """prune_terms="exact" opts into the lossless MaxScore path (same
    rows as full scoring); filter_expr composes (theta comes from the
    filtered pool, still a valid lower bound)."""
    from pyspark.sql import functions as F

    base, queries, base_df, query_df = data
    cfg = SparseConfig(metric_type="IP", inverted_index_algo="DAAT_MAXSCORE", k=K)
    idx = SparseInvertedIndex.build(base_df, cfg)
    taat = SparseInvertedIndex.build(
        base_df, SparseConfig(metric_type="IP", inverted_index_algo="TAAT_NAIVE", k=K)
    )
    assert _pairs(idx.search(query_df, k=K, prune_terms="exact")) == _pairs(
        taat.search(query_df, k=K, prune_terms=False)
    )
    flt = F.col("doc_id") % 2 == 0
    assert _pairs(
        idx.search(query_df, k=K, prune_terms="exact", filter_expr=flt)
    ) == _pairs(taat.search(query_df, k=K, prune_terms=False, filter_expr=flt))


def test_maxscore_exact_degrades_when_seed_small(spark):
    """k larger than the seed pool -> theta=-inf -> no pruning, full
    scoring results (degrade to correct, never to wrong)."""
    base_df = spark.createDataFrame(
        [(0, {1: 1.0}), (1, {2: 5.0}), (2, {2: 4.0, 3: 1.0})], SPARSE_SCHEMA
    )
    q = spark.createDataFrame([(0, {1: 1.0, 2: 1.0, 3: 1.0})], SPARSE_QUERY_SCHEMA)
    cfg = SparseConfig(metric_type="IP", k=3)
    idx = SparseInvertedIndex.build(base_df, cfg)
    got = _pairs(idx.search_maxscore_exact(q, k=3))
    full = _pairs(idx.search(q, k=3, prune_terms=False))
    assert got == full and len(got) == 3


def test_maxscore_negative_query_values_stay_exact(spark):
    """Review regression: qval < 0 flips the per-term upper bound's
    direction — the exact path must fall back to full scoring, never
    prune a true top-k doc."""
    base_df = spark.createDataFrame(
        [(0, {1: 0.1}), (1, {1: 1.0})], SPARSE_SCHEMA
    )
    q = spark.createDataFrame([(0, {1: -1.0})], SPARSE_QUERY_SCHEMA)
    idx = SparseInvertedIndex.build(
        base_df, SparseConfig(metric_type="IP", k=1)
    )
    got = _pairs(idx.search_maxscore_exact(q, k=1))
    full = _pairs(idx.search(q, k=1, prune_terms=False))
    assert got == full and len(got) == 1
    # doc 0 (score -0.1) beats doc 1 (score -1.0)
    assert next(iter(got))[1] == 0
    # the DAAT_MAXSCORE default route is equally safe
    assert _pairs(idx.search(q, k=1)) == full


def test_scalar_filter_rejects_posting_level_predicates(spark):
    """Review regression: a predicate over per-posting columns (value/
    term) must NOT filter individual postings (partial doc scores) — it
    falls back to the doc_stats semi-join, which fails loudly for
    columns doc_stats lacks."""
    docs = spark.createDataFrame(
        [(i, "shared shared extra") for i in range(10)],
        "doc_id long, text string",
    )
    idx = SparseInvertedIndex.build_from_text(
        docs, SparseConfig(metric_type="IP", k=5), scalar_cols=[]
    )
    from pyspark.sql import functions as F

    idx2 = SparseInvertedIndex.build_from_text(
        docs.withColumn("lang", F.lit("en")),
        SparseConfig(metric_type="IP", k=5),
        scalar_cols=["lang"],
    )
    q = spark.createDataFrame(
        [(0, {"shared": 1.0, "extra": 1.0})], "query_id long, vec map<string,float>"
    )
    # per-posting predicate: scores must stay FULL-doc (never partial sums)
    import pytest

    with pytest.raises(Exception):
        idx2.search(q, k=5, filter_expr=F.col("value") >= 2).collect()
    # doc-level scalar predicate still join-free and correct
    ok = idx2.search(q, k=5, filter_expr=F.col("lang") == "en").collect()
    want = idx.search(q, k=5).collect()
    assert {(r.doc_id, round(r.score, 6)) for r in ok} == {
        (r.doc_id, round(r.score, 6)) for r in want
    }


def test_batched_search_equals_per_query(data, spark):
    """The amortized nq=100 bench entry's premise: one batched plan over
    the whole query set returns exactly the union of per-query searches
    (same (doc, score) lists per query)."""
    base, queries, base_df, query_df = data
    cfg = SparseConfig(metric_type="BM25", inverted_index_algo="DAAT_MAXSCORE",
                       k=K, bm25_k1=1.2, bm25_b=0.75)
    idx = SparseInvertedIndex.build(base_df, cfg)
    batched = _collect(idx.search(query_df, k=K))
    for qi in range(NQ):
        single_df = query_df.filter(f"query_id = {qi}")
        single = _collect(idx.search(single_df, k=K))
        assert [(d, round(s, 6)) for d, s in single.get(qi, [])] == [
            (d, round(s, 6)) for d, s in batched.get(qi, [])
        ]


def test_maxscore_exact_rejects_approximate_knobs(data):
    """ADVICE r5: prune_terms='exact' silently ignored
    drop_ratio_search/refine_factor — conflicting asks now raise."""
    from knowhere_spark.config import ConfigError

    base, queries, base_df, query_df = data
    idx = SparseInvertedIndex.build(
        base_df, SparseConfig(metric_type="IP", inverted_index_algo="TAAT_NAIVE", k=K)
    )
    for kw in ({"drop_ratio_search": 0.5}, {"refine_factor": 3}):
        try:
            idx.search(query_df, k=K, prune_terms="exact", **kw)
            raise AssertionError(f"expected ConfigError for {kw}")
        except ConfigError:
            pass


def test_build_caches_are_size_partitioned_not_core_partitioned(spark):
    """The cached postings/doc_stats layout must derive from DATA SIZE,
    not from spark.sql.shuffle.partitions — at high core counts a few-MB
    index otherwise caches as dozens of near-empty partitions and every
    search pays one scan task per partition (the r12 inverse-scaling
    signature: 32-core searches slower than 8-core).  Results must stay
    identical to an explicitly partitioned build up to sum
    reassociation (absorbed by the entry layer's round(4))."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta term{i % 7} term{i % 3}") for i in range(200)],
        "doc_id long, text string",
    )
    cfg = SparseConfig(
        metric_type="BM25", inverted_index_algo="TAAT_NAIVE",
        k=5, bm25_k1=1.2, bm25_b=0.75,
    )
    idx = SparseInvertedIndex.build_from_text(docs, cfg)
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_p = idx.postings.rdd.getNumPartitions()
    n_d = idx.doc_stats.rdd.getNumPartitions()
    # a ~1k-posting corpus must collapse to O(1) partitions regardless of
    # the session's shuffle partition count
    assert n_p <= max(1, shuffle_parts // 2) and n_p >= 1
    assert n_d == 1

    pinned = SparseInvertedIndex.build_from_text(docs, cfg, n_partitions=3)
    q = spark.createDataFrame(
        [(0, {"alpha": 1.0, "term1": 2.0})], "query_id long, vec map<string,float>"
    )
    a = idx.search(q, k=5).orderBy("query_id", "rank").collect()
    b = pinned.search(q, k=5).orderBy("query_id", "rank").collect()
    assert [(r["doc_id"], r["rank"]) for r in a] == [
        (r["doc_id"], r["rank"]) for r in b
    ]
    assert all(
        abs(x["score"] - y["score"]) < 1e-9 for x, y in zip(a, b)
    )
