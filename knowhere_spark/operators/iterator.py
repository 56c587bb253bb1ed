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

    @classmethod
    def from_index(
        cls,
        index,
        query_df: DataFrame,
        *,
        page_size: int = 1000,
        k: int | None = None,
        **search_kw,
    ) -> "AnnIterator":
        """Iterator over ANY built index's ranked ordering — the
        reference's default per-index ``AnnIterator`` (index_node.h:
        451-526: every IndexNode serves an iterator; non-graph indexes go
        through the precomputed variant).  The ordering is the index's
        own search at ``k = count()`` (or a caller cap), so coverage
        follows the index's search contract — an IVF iterator only
        orders the probed cells' rows, exactly like the reference's
        iterator-on-IVF; pass ``nprobe=nlist`` for exhaustive paging.
        ``search_kw`` forward to ``index.search`` (nprobe/ef/
        filter_expr/strategy...)."""
        n = k if k is not None else index.count()
        ranked = index.search(query_df, k=n, **search_kw)
        return cls(ranked, page_size=page_size)

    @classmethod
    def from_sparse(
        cls,
        index,
        query_df: DataFrame,
        *,
        metric: MetricType | str | None = None,
        drop_ratio_search: float | None = None,
        filter_expr: Column | str | None = None,
        page_size: int = 1000,
        **kw,
    ) -> "AnnIterator":
        """Iterator over a ``SparseInvertedIndex``'s full score ordering —
        the reference's sparse-index AnnIterator
        (src/index/sparse/sparse_index_node.cc:179-194: one
        ``PrecomputedDistanceIterator`` per query over distances computed
        by the index's own computer, ``drop_ratio_search`` applied).

        The ordering is the index's top-ALL search (k = corpus size), so
        ``drop_ratio_search`` interacts exactly as in search: the pruned
        query scores every page, trading tail recall for a smaller
        postings join — pages after the first are every bit as
        approximate as the reference's (the dropped terms never score).
        Docs with no overlapping term never enter the ordering (score 0
        rows are absent, like the reference's DocValueComputer emitting
        only touched docs)."""
        n = index.count()
        ranked = index.search(
            query_df,
            k=n,
            metric=metric,
            drop_ratio_search=drop_ratio_search,
            filter_expr=filter_expr,
            **kw,
        )
        return cls(ranked, page_size=page_size)

    @classmethod
    def quantized_refine(
        cls,
        approx_ranked: DataFrame,
        raw_df: DataFrame,
        query_df: DataFrame,
        metric: MetricType | str,
        *,
        refine_ratio: float = 2.0,
        retain_iterator_order: bool = False,
        page_size: int = 1000,
        id_col: str = "id",
        vec_col: str = "vec",
        query_id_col: str = "query_id",
        query_vec_col: str = "vec",
    ) -> "RefinedAnnIterator":
        """Quantized-first iterator with exact refinement
        (index_node.h:527-570): the cheap full ordering comes from a
        quantized index (``approx_ranked``: the complete
        ``(query_id, neighbor_id, distance, rank)`` stream over codes);
        each consumed page is re-scored against the raw vectors.

        ``refine_ratio`` sizes the lookahead buffer: serving refined ranks
        up to ``hi`` exact-scores only the first ``hi·refine_ratio``
        quantized ranks — the scan saving that makes the quantized
        iterator worth it at scale.  ``retain_iterator_order=True``
        re-orders each served window by the refined distance (the
        strictly-ordered contract); ``False`` keeps the quantized order
        and only refines the reported distances.
        """
        return RefinedAnnIterator(
            approx_ranked,
            raw_df.select(
                F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
            ),
            query_df.select(
                F.col(query_id_col).cast("long").alias("query_id"),
                F.col(query_vec_col).alias("qvec"),
            ),
            MetricType(metric),
            refine_ratio=refine_ratio,
            retain_iterator_order=retain_iterator_order,
            page_size=page_size,
        )

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


class RefinedAnnIterator:
    """Quantized-then-refine neighbor stream (index_node.h:527-570).

    Pages are served from the cached quantized ordering; exact distances
    are computed only for the lookahead window (``hi·refine_ratio``
    quantized ranks), via a join against the raw-vector table — never a
    full re-scan."""

    def __init__(
        self,
        approx_ranked: DataFrame,
        raw_df: DataFrame,
        queries: DataFrame,
        metric: MetricType,
        *,
        refine_ratio: float = 2.0,
        retain_iterator_order: bool = False,
        page_size: int = 1000,
    ):
        if refine_ratio < 1.0:
            from knowhere_spark.config import ConfigError

            raise ConfigError(f"refine_ratio={refine_ratio} must be >= 1")
        self._approx = approx_ranked.cache()
        self._raw = raw_df
        self._queries = queries
        self._metric = metric
        self.refine_ratio = float(refine_ratio)
        self.retain_iterator_order = retain_iterator_order
        self.page_size = page_size
        self._pos = 0
        #: (query_id, neighbor_id) already served in strictly-ordered mode —
        #: the pool grows with the lookahead window, so without this an
        #: item re-ranked past ``lo`` would be emitted twice and an item
        #: newly ranked under ``lo`` would be silently lost
        self._emitted: DataFrame | None = None

    def _exact(self, cand: DataFrame) -> DataFrame:
        """Re-score candidate rows by true distance on raw vectors."""
        from knowhere_spark.functions.distance import distance_expr

        return (
            cand.join(
                self._raw.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
            )
            .join(F.broadcast(self._queries), "query_id")
            .select(
                "query_id",
                "neighbor_id",
                F.col("rank").alias("approx_rank"),
                distance_expr(self._metric, F.col("vec"), F.col("qvec")).alias(
                    "distance"
                ),
            )
        )

    def next_batch(self, size: int | None = None) -> DataFrame:
        """The next ``size`` neighbors per query with refined distances."""
        import math

        from knowhere_spark.operators.topk import topk_per_key

        size = size or self.page_size
        lo, hi = self._pos, self._pos + size
        self._pos = hi
        if not self.retain_iterator_order:
            # quantized order, refined distances (the cheap mode)
            page = self._approx.filter(
                (F.col("rank") > lo) & (F.col("rank") <= hi)
            )
            return self._exact(page).withColumnRenamed("approx_rank", "rank")
        # strictly-ordered mode — heap-pop semantics: exact-score the
        # lookahead buffer and serve the best ``size`` NOT-YET-EMITTED
        # candidates per query.  (A plain rank-window over the growing
        # pool would double-emit items pushed past ``lo`` by newly
        # included candidates, and skip items newly ranked under it.)
        lookahead = math.ceil(hi * self.refine_ratio)
        cand = self._approx.filter(F.col("rank") <= lookahead)
        scored = self._exact(cand).drop("approx_rank")
        if self._emitted is not None:
            scored = scored.join(
                self._emitted, ["query_id", "neighbor_id"], "left_anti"
            )
        # the page is handed out as an eager localCheckpoint, NOT a cache:
        # its blocks are self-contained (no lineage back to the emitted-set
        # checkpoint released below) and are freed by the ContextCleaner
        # when the caller drops the reference — so a long paging session
        # pins O(1) session-owned state instead of one cache per page.
        # Caveat (local checkpoints generally): blocks live on executors
        # without a recompute path, so on a cluster with executor churn a
        # long-held page can become uncollectable; callers needing pages to
        # survive executor loss should copy them out promptly.
        page = (
            topk_per_key(
                scored,
                "query_id",
                "distance",
                size,
                ascending=not self._metric.is_similarity,
                tie_breaker="neighbor_id",
            )
            .withColumn("rank", F.col("rank") + F.lit(lo))
            .localCheckpoint(eager=True)
        )
        served = page.select("query_id", "neighbor_id")
        grown = (
            served if self._emitted is None
            else self._emitted.unionByName(served)
        )
        # localCheckpoint truncates the lineage: without it every page's
        # anti-join nests ALL prior pages' join plans and analysis cost
        # grows quadratically (observed: planner stall by page ~6)
        prev_emitted = self._emitted
        self._emitted = grown.localCheckpoint(eager=True)
        # the new checkpoint is eager and the page is self-contained, so
        # the superseded emitted checkpoint can be released immediately
        if prev_emitted is not None:
            prev_emitted.unpersist()
        return page

    def pages(self) -> Iterator[DataFrame]:
        while True:
            page = self.next_batch()
            if page.limit(1).count() == 0:
                break
            yield page

    def close(self) -> None:
        self._approx.unpersist()
        if self._emitted is not None:
            self._emitted.unpersist()
            self._emitted = None