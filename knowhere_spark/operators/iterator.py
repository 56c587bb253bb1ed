"""AnnIterator — the reference's lazily-ordered neighbor stream
(index_node.h:451-576 iterator framework; PrecomputedDistanceIterator
index_node.h:583-679 computes all distances once and partial-sorts in
blocks).

Spark has no lazy per-row iterator; the honest batch equivalent
(SURVEY.md §2.1) is the *precomputed* variant: one distributed job scores
and ranks all neighbors, then the driver pages through rank windows.
``refine_ratio`` (quantized-then-refine iteration, index_node.h:527-570)
composes with operators/refine.py by scoring on the quantized index first
and re-ranking each page exactly.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knowhere_spark.config import MetricType
from knowhere_spark.operators.brute_force import BruteForce


class AnnIterator:
    """Ordered neighbor stream per query, paged from a ranked DataFrame.

    The full ordering is materialized once (cached); ``next_batch``
    serves rank windows — the batch analog of the reference's 50k-block
    partial sort (index_node.h:583-679).
    """

    def __init__(self, ranked: DataFrame, *, page_size: int = 1000):
        self._ranked = ranked.cache()
        self.page_size = page_size
        self._pos = 0   # ranks [1.._pos] already served

    @classmethod
    def brute_force(
        cls,
        base_df: DataFrame,
        query_df: DataFrame,
        metric: MetricType | str,
        *,
        filter_expr: Column | str | None = None,
        page_size: int = 1000,
        **kw,
    ) -> "AnnIterator":
        """Iterator over ALL neighbors in distance order —
        ``BruteForce::AnnIterator`` (brute_force.h:26-55)."""
        n = base_df.count()
        ranked = BruteForce.search(
            base_df, query_df, n, metric, filter_expr=filter_expr, **kw
        )
        return cls(ranked, page_size=page_size)

    def next_batch(self, size: int | None = None) -> DataFrame:
        """The next ``size`` neighbors per query (empty when exhausted)."""
        size = size or self.page_size
        lo, hi = self._pos, self._pos + size
        self._pos = hi
        return self._ranked.filter(
            (F.col("rank") > lo) & (F.col("rank") <= hi)
        )

    def pages(self) -> Iterator[DataFrame]:
        """Generator of non-empty pages, in rank order."""
        while True:
            page = self.next_batch()
            if page.limit(1).count() == 0:
                break
            yield page

    def close(self) -> None:
        self._ranked.unpersist()