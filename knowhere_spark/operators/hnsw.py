"""HNSW re-expressed for Spark — graph *construction* as a distributed
batch job, batch *search* as bounded iterative frontier expansion.

Reference: src/index/hnsw/hnsw.h (hnswlib legacy) and
src/index/hnsw/faiss_hnsw.cc; params M (30) / efConstruction (360) /
``ef >= k`` from src/index/hnsw/base_hnsw_config.h:34-79.

SURVEY.md §2.3 is explicit about the design call: pointer-chasing greedy
serving is not Spark-shaped, so

- **Build** produces the graph artifact — a proximity graph with <= M
  out-edges per node — via *blocked* construction: rows are assigned to
  their top-2 nearest coarse cells (so boundary neighbors share a block),
  each cell computes its local exact KNN with ``applyInPandas`` (bounded
  cell population => bounded memory), and edges are symmetrized then
  re-pruned to M per node.  Every step is a DataFrame op; cells are the
  parallelism axis, so construction scales with executors.
- **Search** is an honest BFS-beam: per hop, frontier ⋈ edges expands
  candidates, exact distances re-rank, the per-query top-``ef`` become
  the next frontier (``ef >= k`` enforced like base_hnsw_config.h:55-79),
  bounded hop count.  Each hop is one shuffle join — batch-friendly, and
  the documented contract is recall-vs-hops, not graph-serving latency.
  For serving-style ANN use the IVF family; this operator exists for
  graph-artifact parity (and the edges table is itself a useful
  similarity-graph output for dedup/clustering pipelines).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from knowhere_spark.config import HnswConfig, IndexType, MetricType
from knowhere_spark.functions.distance import pairwise_distances
from knowhere_spark.operators.ivf import _assign_cells
from knowhere_spark.operators.topk import topk_per_key

_CELL_TARGET_ROWS = 512     # block population target for local-KNN build
_TRAIN_SAMPLE_MAX = 50_000

_EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("dist", DoubleType()),
    ]
)


class HNSWIndex:
    """Graph artifact: (id, vec) vectors + <=M out-edges per node."""

    def __init__(
        self,
        vectors: DataFrame,      # (id, vec)
        edges: DataFrame,        # (src, dst, dist)
        config: HnswConfig,
        entry_ids: list[int],
    ):
        self.vectors = vectors
        self.edges = edges
        self.config = config
        self.entry_ids = entry_ids
        self.index_type = IndexType.HNSW

    def count(self) -> int:
        return self.vectors.count()

    def type(self) -> str:
        return self.index_type.value

    def has_raw_data(self) -> bool:
        return True

    @classmethod
    def build(
        cls,
        base_df: DataFrame,
        config: HnswConfig,
        *,
        id_col: str = "id",
        vec_col: str = "vec",
    ) -> "HNSWIndex":
        metric = MetricType(config.metric_type)
        base = base_df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        )
        n = base.count()
        spark = base.sparkSession
        nlist = max(4, n // _CELL_TARGET_ROWS)

        # coarse cells from a bounded sample (same kernel family as IVF)
        sample = base
        if n > _TRAIN_SAMPLE_MAX:
            sample = base.sample(fraction=_TRAIN_SAMPLE_MAX / n, seed=42)
        S = np.array([r["vec"] for r in sample.select("vec").collect()], dtype=np.float64)
        rng = np.random.default_rng(42)
        centroids = S[rng.choice(len(S), size=min(nlist, len(S)), replace=False)]

        # top-2 cell assignment => boundary rows co-occur in both blocks
        bc = spark.sparkContext.broadcast(centroids)

        def assign2(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(list(pdf["vec"].to_numpy()), dtype=np.float64)
                d = pairwise_distances(X, C, MetricType.L2)
                top2 = np.argsort(d, axis=1, kind="stable")[:, :2]
                out = pd.concat(
                    [
                        pdf.assign(cell_id=top2[:, 0].astype(np.int32)),
                        pdf.assign(cell_id=top2[:, 1].astype(np.int32)),
                    ]
                )
                yield out[["id", "cell_id", "vec"]]

        vec_type = base.schema["vec"].dataType
        from knowhere_spark.session import ensure_parallelism

        blocks = ensure_parallelism(base).mapInPandas(
            assign2,
            StructType(
                [
                    StructField("id", LongType()),
                    StructField("cell_id", IntegerType()),
                    StructField("vec", vec_type),
                ]
            ),
        )

        M = config.M

        def local_knn(key, pdf):
            if len(pdf) < 2:
                return pd.DataFrame({"src": [], "dst": [], "dist": []}).astype(
                    {"src": np.int64, "dst": np.int64, "dist": np.float64}
                )
            ids = pdf["id"].to_numpy(dtype=np.int64)
            X = np.array(list(pdf["vec"].to_numpy()), dtype=np.float64)
            d = pairwise_distances(X, X, metric)
            sim = metric.is_similarity
            key_m = -d if sim else d
            np.fill_diagonal(key_m, np.inf)      # no self-edges
            kk = min(M, len(pdf) - 1)
            nbr = np.argsort(key_m, axis=1, kind="stable")[:, :kk]
            src = np.repeat(ids, kk)
            dst = ids[nbr.ravel()]
            dist = d[np.repeat(np.arange(len(ids)), kk), nbr.ravel()]
            return pd.DataFrame({"src": src, "dst": dst, "dist": dist})

        raw_edges = blocks.groupBy("cell_id").applyInPandas(local_knn, _EDGE_SCHEMA)
        # symmetrize, dedup (a pair can appear in 2 shared blocks), prune to M
        sym = raw_edges.unionByName(
            raw_edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "dist"
            )
        ).dropDuplicates(["src", "dst"])
        edges = (
            topk_per_key(
                sym.withColumnRenamed("dist", "distance"),
                "src",
                "distance",
                M,
                ascending=not metric.is_similarity,
                tie_breaker="dst",
            )
            .select("src", "dst", F.col("distance").alias("dist"))
        )

        # entry points: a small deterministic sample (multi-entry beam
        # replaces the hierarchy's zoom-out layers).  orderBy+limit(8)
        # compiles to TakeOrderedAndProject — per-partition top-8 then a
        # driver merge, never a global sort of the table.
        entry_ids = [
            int(r["id"])
            for r in base.orderBy(F.pmod(F.col("id"), F.lit(997)), "id").limit(8).collect()
        ]
        return cls(base, edges, config, entry_ids)

    # -- Add (incremental batch insert) ---------------------------------------
    def add(
        self, new_df: DataFrame, *, id_col: str = "id", vec_col: str = "vec"
    ) -> "HNSWIndex":
        """Batch insert (``IndexNode::Add``; hnswlib addPoint semantics,
        batched): each new node links to its best ``M-2`` neighbors over
        the grown table (exact candidates — stronger than an insert-time
        beam) PLUS its 2 nearest EXISTING nodes, and reverse edges attach
        it to the old graph.  The guaranteed old-graph links play the role
        of hnswlib's diversity heuristic: when an added batch forms its own
        tight cluster, pure top-M adjacency would be intra-batch only and
        the graph would disconnect.  Cross-side (old↔new) edges are exempt
        from the M-prune — the same laxer budget hnswlib gives layer 0
        (maxM0 = 2M).  Entry points are unchanged.  The candidate search
        uses the GEMM partial-top-k path, so the added batch is the only
        driver-resident piece (same nq contract as search)."""
        from knowhere_spark.operators.brute_force import BruteForce

        metric = MetricType(self.config.metric_type)
        M = self.config.M
        asc = not metric.is_similarity
        new = new_df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        )
        grown = self.vectors.unionByName(new)
        queries = new.select(F.col("id").alias("query_id"), "vec")

        def edges_of(cand):
            return cand.select(
                F.col("query_id").alias("src"),
                F.col("neighbor_id").alias("dst"),
                F.col("distance").alias("dist"),
            )

        near_all = BruteForce.search(
            grown, queries, max(M - 2, 1) + 1, metric, strategy="gemm"
        ).filter(F.col("neighbor_id") != F.col("query_id"))
        bridges = BruteForce.search(
            self.vectors, queries, 2, metric, strategy="gemm"
        )
        new_out = (
            edges_of(near_all.filter(F.col("rank") <= max(M - 2, 1)))
            .unionByName(edges_of(bridges))
            .dropDuplicates(["src", "dst"])
        )
        rev = new_out.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "dist"
        )
        merged = (
            self.edges.unionByName(new_out)
            .unionByName(rev)
            .dropDuplicates(["src", "dst"])
        )
        # prune same-side adjacencies to M; old<->new edges are exempt so a
        # boundary node's bridge never loses to its M closer same-side peers
        new_ids = new.select(F.col("id").alias("nid"))
        tagged = (
            merged.join(
                F.broadcast(new_ids.withColumnRenamed("nid", "src")).withColumn(
                    "src_new", F.lit(True)
                ),
                "src",
                "left",
            )
            .join(
                F.broadcast(new_ids.withColumnRenamed("nid", "dst")).withColumn(
                    "dst_new", F.lit(True)
                ),
                "dst",
                "left",
            )
            .select(
                "src", "dst", "dist",
                (
                    F.coalesce(F.col("src_new"), F.lit(False))
                    == F.coalesce(F.col("dst_new"), F.lit(False))
                ).alias("same_side"),
            )
        )
        same = tagged.filter("same_side").drop("same_side")
        cross = tagged.filter(~F.col("same_side")).drop("same_side")
        pruned_same = (
            topk_per_key(
                same.withColumnRenamed("dist", "distance"),
                "src", "distance", M, ascending=asc, tie_breaker="dst",
            )
            .select("src", "dst", F.col("distance").alias("dist"))
        )
        return HNSWIndex(
            grown, pruned_same.unionByName(cross), self.config, self.entry_ids
        )

    # -- graph refinement (NN-Descent step) -----------------------------------
    def refine(self, iterations: int = 1) -> "HNSWIndex":
        """NN-Descent-style improvement: each node considers its
        neighbors-of-neighbors as candidates and re-prunes to the best M —
        the distributed stand-in for efConstruction quality (the blocked
        build only sees within-cell candidates; 2-hop expansion recovers
        cross-cell edges).  Pure joins: edges ⋈ edges → score → top-M.
        """
        metric = MetricType(self.config.metric_type)
        M = self.config.M
        from knowhere_spark.functions.distance import distance_expr

        vec_s = self.vectors.select(
            F.col("id").alias("src"), F.col("vec").alias("vec_s")
        )
        vec_d = self.vectors.select(
            F.col("id").alias("dst"), F.col("vec").alias("vec_d")
        )
        edges = self.edges
        for _ in range(iterations):
            e = edges.select("src", "dst")
            hop2 = (
                e.alias("a")
                .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
                .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
                .filter(F.col("src") != F.col("dst"))
            )
            cand = e.unionByName(hop2).distinct()
            scored = (
                cand.join(vec_s, "src")
                .join(vec_d, "dst")
                .select(
                    "src",
                    "dst",
                    distance_expr(metric, F.col("vec_s"), F.col("vec_d")).alias(
                        "distance"
                    ),
                )
            )
            edges = (
                topk_per_key(
                    scored, "src", "distance", M,
                    ascending=not metric.is_similarity, tie_breaker="dst",
                )
                .select("src", "dst", F.col("distance").alias("dist"))
            )
        return HNSWIndex(self.vectors, edges, self.config, self.entry_ids)

    # -- Serialize / Deserialize (index_node.h:371-401): the graph is two
    #    plain tables — exactly the artifact role SURVEY.md §2.3 assigns ----
    def save(self, path: str) -> None:
        from knowhere_spark.sources.index_store import IndexStore

        store = IndexStore(path)
        store.write_manifest(
            {
                "index_type": self.index_type.value,
                "metric_type": self.config.metric_type.value,
                "M": self.config.M,
                "ef": self.config.ef,
                "count": self.count(),
                "entry_ids": self.entry_ids,
            }
        )
        store.write_table("vectors", self.vectors)
        store.write_table("edges", self.edges)

    @classmethod
    def load(cls, spark, path: str) -> "HNSWIndex":
        from knowhere_spark.sources.index_store import IndexStore

        store = IndexStore(path)
        m = store.read_manifest()
        cfg = HnswConfig(
            metric_type=MetricType(m["metric_type"]), M=int(m["M"]), ef=int(m["ef"])
        )
        return cls(
            store.read_table(spark, "vectors"),
            store.read_table(spark, "edges"),
            cfg,
            [int(e) for e in m["entry_ids"]],
        )

    def search(
        self,
        query_df: DataFrame,
        k: int | None = None,
        *,
        ef: int | None = None,
        max_hops: int = 4,
        query_id_col: str = "query_id",
        query_vec_col: str = "vec",
        score_fn=None,
    ) -> DataFrame:
        """Bounded BFS-beam over the edges table.

        Per hop: frontier ⋈ edges → new candidates → exact distance →
        per-query top-ef frontier; results are the best k over everything
        visited.  ``ef >= k`` (base_hnsw_config.h:55-79).

        ``score_fn(cand_df, queries_df) -> (query_id, node_id, distance)``
        replaces the exact-vector scorer — the hook the quantized variants
        use to run the beam over SQ/PQ codes (operators/hnsw_quant.py).
        """
        k = k if k is not None else self.config.k
        ef = max(ef if ef is not None else self.config.ef, k)
        metric = MetricType(self.config.metric_type)
        spark = self.vectors.sparkSession

        queries = query_df.select(
            F.col(query_id_col).cast("long").alias("query_id"),
            F.col(query_vec_col).alias("qvec"),
        ).cache()

        def exact_score(cand: DataFrame, queries: DataFrame) -> DataFrame:
            """(query_id, node_id) -> + exact distance (join vectors ⋈ broadcast queries)."""
            from knowhere_spark.functions.distance import distance_expr

            withvec = cand.join(
                self.vectors, cand["node_id"] == self.vectors["id"]
            ).select("query_id", "node_id", "vec")
            return withvec.join(F.broadcast(queries), "query_id").select(
                "query_id",
                "node_id",
                distance_expr(metric, F.col("vec"), F.col("qvec")).alias("distance"),
            )

        def score(cand: DataFrame) -> DataFrame:
            return (score_fn or exact_score)(cand, queries)

        entry_df = spark.createDataFrame(
            [(e,) for e in self.entry_ids], "node_id long"
        )
        frontier = queries.select("query_id").crossJoin(entry_df)
        visited = score(frontier).cache()
        visited.count()
        frontier = visited.select("query_id", "node_id")

        for _ in range(max_hops):
            expanded = (
                frontier.join(self.edges, frontier["node_id"] == self.edges["src"])
                .select("query_id", F.col("dst").alias("node_id"))
                .distinct()
                .join(visited.select("query_id", "node_id"), ["query_id", "node_id"], "left_anti")
            )
            scored = score(expanded)
            new_visited = visited.unionByName(scored).cache()
            new_visited.count()
            visited.unpersist()
            visited = new_visited
            # next frontier: per-query best ef among the newly scored nodes
            frontier = (
                topk_per_key(
                    scored, "query_id", "distance", ef,
                    ascending=not metric.is_similarity, tie_breaker="node_id",
                )
                .select("query_id", "node_id")
            )

        out = topk_per_key(
            visited.withColumnRenamed("node_id", "neighbor_id"),
            "query_id",
            "distance",
            k,
            ascending=not metric.is_similarity,
            tie_breaker="neighbor_id",
        )
        queries.unpersist()
        return out
