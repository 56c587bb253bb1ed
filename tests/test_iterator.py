"""AnnIterator paging: ordered, complete, no duplicates — relative-recall
pattern from tests/ut/test_iterator.cc adapted to the batch equivalent."""

from __future__ import annotations

import numpy as np

from knowhere_spark.operators.iterator import AnnIterator

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
