"""AnnIterator paging: ordered, complete, no duplicates — relative-recall
pattern from tests/ut/test_iterator.cc adapted to the batch equivalent."""

from __future__ import annotations

import numpy as np

from knowhere_spark.config import MetricType
from knowhere_spark.operators.iterator import AnnIterator
from pyspark.sql import functions as F

from conftest import QUERY_SCHEMA, dense_df, gen_dense, np_distances


def test_iterator_pages_ordered_and_complete(spark):
    nb, nq = 200, 3
    base = gen_dense(nb, 8, seed=61)
    qs = gen_dense(nq, 8, seed=62)
    it = AnnIterator.brute_force(
        dense_df(spark, base), dense_df(spark, qs, QUERY_SCHEMA), "L2",
        page_size=60,
    )
    seen: dict[int, list[tuple[int, float]]] = {}
    n_pages = 0
    for page in it.pages():
        n_pages += 1
        for r in page.collect():
            seen.setdefault(r["query_id"], []).append(
                (r["neighbor_id"], r["distance"])
            )
    it.close()
    assert n_pages == 4   # ceil(200/60)
    d = np_distances(base, qs, "L2")
    for q in range(nq):
        ids = [i for i, _ in seen[q]]
        assert len(ids) == nb and len(set(ids)) == nb       # complete, no dups
        dists = [x for _, x in seen[q]]
        assert dists == sorted(dists)                        # globally ordered
        np.testing.assert_allclose(dists[0], d[:, q].min())


def test_refined_iterator_relative_recall(spark):
    """Quantized-first iterator + refine_ratio re-scoring
    (index_node.h:527-570), the relative-recall pattern of
    tests/ut/test_iterator.cc:250-251: the first k refined results must
    recover the true top-k well past the ANN floor."""
    from knowhere_spark.config import IvfSq8Config
    from knowhere_spark.operators.sq import IVFSq8Index

    nb, dim, nq, k = 400, 16, 4, 20
    base = gen_dense(nb, dim, seed=71)
    qs = gen_dense(nq, dim, seed=72)
    base_df = dense_df(spark, base)
    q_df = dense_df(spark, qs, QUERY_SCHEMA)

    sq = IVFSq8Index.build(
        base_df, IvfSq8Config(metric_type="L2", nlist=8, nprobe=8),
        with_raw_data=True,
    )
    approx = sq.search(q_df, k=nb, nprobe=8)   # full quantized ordering

    it = AnnIterator.quantized_refine(
        approx, sq.raw_vectors(), q_df, "L2",
        refine_ratio=2.0, retain_iterator_order=True, page_size=k,
    )
    first = it.next_batch()
    got = {}
    for r in first.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["distance"]))
    d = np_distances(base, qs, "L2")
    for q in range(nq):
        rows = sorted(got[q])
        assert len(rows) == k
        dists = [x for _, _, x in rows]
        assert dists == sorted(dists)            # strictly-ordered contract
        truth = set(np.argsort(d[:, q], kind="stable")[:k].tolist())
        rel_recall = len({nid for _, nid, _ in rows} & truth) / k
        assert rel_recall >= 0.9, rel_recall     # > reference 0.6 ANN floor
        # refined distances are exact raw distances
        for _, nid, dist in rows:
            np.testing.assert_allclose(dist, d[nid, q], rtol=1e-9)
    it.close()


def test_refined_iterator_unordered_mode(spark):
    """retain_iterator_order=False keeps the quantized order but reports
    exact refined distances — pages stay disjoint and complete."""
    from knowhere_spark.config import IvfSq8Config
    from knowhere_spark.operators.sq import IVFSq8Index

    nb, dim, nq = 150, 8, 2
    base = gen_dense(nb, dim, seed=73)
    qs = gen_dense(nq, dim, seed=74)
    base_df = dense_df(spark, base)
    q_df = dense_df(spark, qs, QUERY_SCHEMA)
    sq = IVFSq8Index.build(
        base_df, IvfSq8Config(metric_type="L2", nlist=4, nprobe=4),
        with_raw_data=True,
    )
    approx = sq.search(q_df, k=nb, nprobe=4)
    it = AnnIterator.quantized_refine(
        approx, sq.raw_vectors(), q_df, "L2",
        retain_iterator_order=False, page_size=60,
    )
    d = np_distances(base, qs, "L2")
    seen: dict[int, set[int]] = {}
    for page in it.pages():
        for r in page.collect():
            assert r["neighbor_id"] not in seen.setdefault(r["query_id"], set())
            seen[r["query_id"]].add(r["neighbor_id"])
            np.testing.assert_allclose(
                r["distance"], d[r["neighbor_id"], r["query_id"]], rtol=1e-9
            )
    assert all(len(s) == nb for s in seen.values())
    it.close()


def test_refined_iterator_ordered_pages_disjoint(spark):
    """Regression: strictly-ordered paging must never serve the same
    neighbor twice even when the growing lookahead pool re-ranks items."""
    from knowhere_spark.operators.iterator import RefinedAnnIterator

    rng = np.random.default_rng(7)
    base = gen_dense(60, 8, seed=7)
    raw = dense_df(spark, base)
    q = spark.createDataFrame(
        [(0, [float(x) for x in rng.random(8)])], QUERY_SCHEMA
    )
    # a deliberately noisy quantized ordering (random ranks) maximizes
    # re-rank churn between pages
    approx = spark.createDataFrame(
        [(0, int(i), float(r)) for i, r in enumerate(rng.permutation(60) + 1)],
        "query_id long, neighbor_id long, rank double",
    )
    it = RefinedAnnIterator(
        approx, raw, q.select("query_id", F.col("vec").alias("qvec")),
        MetricType.L2, refine_ratio=1.5, retain_iterator_order=True,
        page_size=7,
    )
    seen: set = set()
    for page in it.pages():
        rows = [(r["query_id"], r["neighbor_id"]) for r in page.collect()]
        assert not (set(rows) & seen), "duplicate emission across pages"
        seen.update(rows)
    it.close()
    assert len(seen) == 60   # every neighbor served exactly once


def test_refined_iterator_earlier_pages_stay_valid(spark):
    """Regression: previously-returned page DataFrames must remain
    collectable after further paging (and after close) — an eager page
    checkpoint must not be invalidated when later pages release the
    superseded emitted-set checkpoints."""
    from knowhere_spark.operators.iterator import RefinedAnnIterator

    base = gen_dense(30, 8, seed=11)
    raw = dense_df(spark, base)
    q = spark.createDataFrame(
        [(0, [float(x) for x in base[0]])], QUERY_SCHEMA
    )
    approx = spark.createDataFrame(
        [(0, int(i), float(i + 1)) for i in range(30)],
        "query_id long, neighbor_id long, rank double",
    )
    it = RefinedAnnIterator(
        approx, raw, q.select("query_id", F.col("vec").alias("qvec")),
        MetricType.L2, refine_ratio=2.0, retain_iterator_order=True,
        page_size=5,
    )
    p1 = it.next_batch()
    p2 = it.next_batch()
    p3 = it.next_batch()
    # collecting the EARLIER pages after later paging exercised the
    # checkpoint-release path
    r2 = {r["neighbor_id"] for r in p2.collect()}
    r1 = {r["neighbor_id"] for r in p1.collect()}
    r3 = {r["neighbor_id"] for r in p3.collect()}
    assert len(r1) == len(r2) == len(r3) == 5
    assert not (r1 & r2) and not (r2 & r3) and not (r1 & r3)
    it.close()
    assert len({r["neighbor_id"] for r in p1.collect()}) == 5  # still valid


def test_sparse_iterator_pages_match_search(spark):
    """VERDICT r4 #7: AnnIterator.from_sparse pages the sparse index's own
    ordering (sparse_index_node.cc:179-194 analog) — exact config: the
    union of the first pages equals the index's top-k search."""
    from knowhere_spark.config import SparseConfig
    from knowhere_spark.operators.sparse import SparseInvertedIndex
    from conftest import gen_sparse

    base = gen_sparse(60, 40, 0.8, seed=21)
    qs = gen_sparse(3, 40, 0.8, seed=22)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)], "id long, vec map<int,float>"
    )
    qdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(qs)], "query_id long, vec map<int,float>"
    )
    idx = SparseInvertedIndex.build(df, SparseConfig(metric_type="IP", k=10))
    it = AnnIterator.from_sparse(idx, qdf, page_size=5)
    got = []
    for _ in range(3):
        page = it.next_batch(5).collect()
        got.extend((r.query_id, r.doc_id, round(r.score, 6), r.rank) for r in page)
    it.close()
    want = {
        (r.query_id, r.doc_id, round(r.score, 6), r.rank)
        for r in idx.search(qdf, k=15).collect()
    }
    assert set(got) == want and len(got) == len(set(got))
    # pages arrive in strictly decreasing-score order per query
    by_q = {}
    for qid, did, sc, rk in sorted(got, key=lambda t: (t[0], t[3])):
        by_q.setdefault(qid, []).append(sc)
    for qid, scores in by_q.items():
        assert scores == sorted(scores, reverse=True), qid


def test_sparse_iterator_drop_ratio_relative_recall(spark):
    """drop_ratio_search interacts with the iterator exactly as with
    search: the pruned ordering keeps >= 0.9 relative recall vs the full
    sparse ordering at k=10 (the reference's approximate contract)."""
    from knowhere_spark.config import SparseConfig
    from knowhere_spark.operators.sparse import SparseInvertedIndex
    from conftest import gen_sparse

    base = gen_sparse(120, 30, 0.7, seed=31)
    qs = gen_sparse(5, 30, 0.5, seed=32)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)], "id long, vec map<int,float>"
    )
    qdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(qs)], "query_id long, vec map<int,float>"
    )
    idx = SparseInvertedIndex.build(df, SparseConfig(metric_type="IP", k=10))
    k = 10
    full = {}
    for r in idx.search(qdf, k=k).collect():
        full.setdefault(r.query_id, set()).add(r.doc_id)
    it = AnnIterator.from_sparse(idx, qdf, drop_ratio_search=0.3, page_size=k)
    first = it.next_batch(k).collect()
    it.close()
    approx = {}
    for r in first:
        approx.setdefault(r.query_id, set()).add(r.doc_id)
    recalls = [
        len(approx.get(q, set()) & docs) / len(docs) for q, docs in full.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_from_index_pages_ivf_exhaustive(spark):
    """from_index over IVF_FLAT at nprobe=nlist: the paged union equals
    exact brute force (the precomputed per-index iterator,
    index_node.h:451-526)."""
    from knowhere_spark.config import IvfConfig
    from knowhere_spark.operators.brute_force import BruteForce
    from knowhere_spark.operators.ivf import IVFFlatIndex

    mat = gen_dense(80, 8, seed=41)
    base = dense_df(spark, mat)
    qs = dense_df(spark, mat[:3], QUERY_SCHEMA)
    idx = IVFFlatIndex.build(base, IvfConfig(metric_type="L2", nlist=4, nprobe=4))
    it = AnnIterator.from_index(idx, qs, page_size=10, nprobe=4)
    got = []
    for _ in range(2):
        got.extend(
            (r.query_id, r.neighbor_id, round(r.distance, 6), r.rank)
            for r in it.next_batch(10).collect()
        )
    it.close()
    want = {
        (r.query_id, r.neighbor_id, round(r.distance, 6), r.rank)
        for r in BruteForce.search(base, qs, 20, "L2").collect()
    }
    assert set(got) == want and len(got) == len(set(got))
