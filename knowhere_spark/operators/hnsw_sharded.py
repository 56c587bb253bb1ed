"""Sharded HNSW — the 100 TB shape for graph ANN.

The reference is an in-RAM single-node library; the system built on it
(segment-oriented vector databases) scales graph indexes by splitting the
corpus into bounded *segments*, building one graph per segment, searching
every segment, and merging per-query top-k.  This operator is that
architecture on Spark primitives:

- **Build**: rows hash-shard by id into ``n_shards`` groups sized so each
  shard's graph artifact fits the broadcast bound
  (:data:`knowhere_spark.operators.hnsw._BROADCAST_MAX_BYTES`); each
  shard builds an independent :class:`HNSWIndex` (itself a distributed
  batch job over that shard's rows).
- **Search**: shards are searched *sequentially*, each through the
  broadcast best-first beam; every per-shard result (nq×k rows — small)
  is materialized before the shard's graph broadcast is released, so
  peak executor memory is ONE shard artifact regardless of corpus size.
  The union then takes a final per-query top-k merge — the same
  partial-then-final shape every other top-k in this engine uses.

Recall note: searching every shard with the full beam is at least as
accurate as one graph over the union (each shard's beam is exact over a
smaller candidate space), at the cost of shards× beam work — exactly the
segment-count tradeoff the segment-oriented architecture makes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowhere_spark.config import HnswConfig, IndexType, MetricType
from knowhere_spark.operators.hnsw import _BROADCAST_MAX_BYTES, HNSWIndex
from knowhere_spark.operators.topk import topk_per_key


class ShardedHNSWIndex:
    """A list of per-segment HNSW graphs over a hash-sharded corpus."""

    def __init__(self, shards: list[HNSWIndex], config: HnswConfig):
        if not shards:
            raise ValueError("ShardedHNSWIndex needs at least one shard")
        self.shards = shards
        self.config = config
        self.index_type = IndexType.SHARDED_HNSW

    def count(self) -> int:
        return sum(s.count() for s in self.shards if s is not None)

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
        n_shards: int | None = None,
        target_shard_bytes: int = _BROADCAST_MAX_BYTES,
        id_col: str = "id",
        vec_col: str = "vec",
    ) -> "ShardedHNSWIndex":
        """``n_shards`` defaults to the smallest count keeping each
        shard's estimated artifact (vectors + M-degree CSR) under
        ``target_shard_bytes``."""
        base = base_df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        )
        if n_shards is None:
            n = base.count()
            head = base.select("vec").head()
            dim = len(head["vec"]) if head else 0
            per_row = dim * 4 + (int(config.M) + 1) * 4 + 16
            n_shards = max(1, math.ceil(n * per_row / target_shard_bytes))
        sharded = base.withColumn(
            "__shard", F.pmod(F.xxhash64("id"), F.lit(n_shards)).cast("int")
        )
        # a hash shard can come up empty (small/skewed id sets); keep a None
        # placeholder so the routing modulus (list length) is preserved —
        # building a graph over zero rows would crash the beam kernel
        counts = {
            int(r["__shard"]): int(r["cnt"])
            for r in sharded.groupBy("__shard").agg(F.count("*").alias("cnt")).collect()
        }
        shards: list[HNSWIndex | None] = []
        for s in range(n_shards):
            if counts.get(s, 0) == 0:
                shards.append(None)
                continue
            part = sharded.filter(F.col("__shard") == s).drop("__shard")
            shards.append(HNSWIndex.build(part, config))
        return cls(shards, config)

    def add(
        self, new_df: DataFrame, *, id_col: str = "id", vec_col: str = "vec"
    ) -> "ShardedHNSWIndex":
        """``Add`` (index_node.h:120-121): new rows route to their shard
        by the same id hash used at build, each shard takes its batch
        through :meth:`HNSWIndex.add` (bridge-link insert, no retrain)."""
        n_shards = len(self.shards)
        new = new_df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        ).withColumn(
            "__shard", F.pmod(F.xxhash64("id"), F.lit(n_shards)).cast("int")
        )
        hit = {
            int(r["__shard"])
            for r in new.select("__shard").distinct().collect()
        }
        shards = []
        for s, shard in enumerate(self.shards):
            if s in hit:
                part = new.filter(F.col("__shard") == s).drop("__shard")
                # first rows for a previously-empty shard: build its graph
                shards.append(
                    HNSWIndex.build(part, self.config) if shard is None
                    else shard.add(part)
                )
            else:
                shards.append(shard)
        return ShardedHNSWIndex(shards, self.config)

    def search(
        self,
        query_df: DataFrame,
        k: int | None = None,
        *,
        ef: int | None = None,
        query_id_col: str = "query_id",
        query_vec_col: str = "vec",
        filter_expr=None,
        strategy: str = "broadcast",
    ) -> DataFrame:
        """Per-shard beam (``strategy='broadcast'`` default — eager
        per-shard materialization so only one shard's graph is resident
        at a time; ``'bfs'`` routes each shard through the frontier-join
        path with the float64 exact scorer), final top-k merge.

        Ties across shards break by ``(distance, neighbor_id)`` — the
        engine-wide ordering contract (FIXTURES.md T7)."""
        k = k if k is not None else self.config.k
        metric = MetricType(self.config.metric_type)
        partials = []
        for shard in self.shards:
            if shard is None:
                continue
            res = shard.search(
                query_df, k, ef=ef, strategy=strategy,
                query_id_col=query_id_col, query_vec_col=query_vec_col,
                filter_expr=filter_expr,
            ).drop("rank")
            res = res.cache()
            res.count()                       # materialize before releasing
            bc = getattr(shard, "_bc_graph", None)
            if bc is not None:
                bc.unpersist()                # free executor copies
                shard._bc_graph = None        # next search re-broadcasts
            partials.append(res)
        if not partials:   # wholly-empty index: no neighbors
            from pyspark.sql.types import IntegerType, StructField, StructType

            from knowhere_spark.operators.brute_force import RESULT_SCHEMA

            # build a FRESH schema: StructType.add mutates in place, and
            # RESULT_SCHEMA is shared by every brute-force/IVF kernel
            ranked = StructType(
                list(RESULT_SCHEMA.fields) + [StructField("rank", IntegerType())]
            )
            return query_df.sparkSession.createDataFrame([], ranked)
        merged = partials[0]
        for p in partials[1:]:
            merged = merged.unionByName(p)
        out = topk_per_key(
            merged, "query_id", "distance", k,
            ascending=not metric.is_similarity, tie_breaker="neighbor_id",
        )
        # materialize the merged top-k, then drop the per-shard caches —
        # otherwise every search pins one result set per shard for the
        # session's lifetime
        out = out.localCheckpoint(eager=True)
        for p in partials:
            p.unpersist()
        return out

    def range_search(
        self,
        query_df: DataFrame,
        config=None,
        *,
        ef: int | None = None,
        filter_expr=None,
        query_id_col: str = "query_id",
        query_vec_col: str = "vec",
    ) -> DataFrame:
        """``RangeSearch`` across shards: per-shard beam + bounds, plain
        union (shards are id-disjoint so no dedup is needed);
        ``range_search_k`` truncation applies per query AFTER the union —
        a per-shard cap would overshoot the global contract."""
        import dataclasses

        cfg = config or self.config
        cap = int(getattr(cfg, "range_search_k", 0) or 0)
        shard_cfg = (
            dataclasses.replace(cfg, range_search_k=0) if cap > 0 else cfg
        )
        out = None
        parts: list = []
        for shard in self.shards:
            if shard is None:
                continue
            part = shard.range_search(
                query_df, shard_cfg, ef=ef, strategy="broadcast",
                filter_expr=filter_expr,
                query_id_col=query_id_col, query_vec_col=query_vec_col,
            )
            part = part.cache()
            part.count()
            parts.append(part)
            bc = getattr(shard, "_bc_graph", None)
            if bc is not None:
                bc.unpersist()
                shard._bc_graph = None
            out = part if out is None else out.unionByName(part)
        if out is None:   # wholly-empty index
            from knowhere_spark.operators.brute_force import RESULT_SCHEMA

            return query_df.sparkSession.createDataFrame([], RESULT_SCHEMA)
        if cap > 0:
            _, _, sim = cfg.range_bounds()
            out = topk_per_key(
                out, "query_id", "distance", cap,
                ascending=not sim, tie_breaker="neighbor_id",
            ).drop("rank")
        out = out.localCheckpoint(eager=True)
        for p in parts:
            p.unpersist()
        return out

    def get_vector_by_ids(self, ids_df: DataFrame, *, id_col: str = "id") -> DataFrame:
        """``GetVectorByIds`` across shards — each shard's raw table
        semi-joins the id list; ids are disjoint across shards by
        construction so the union is exact."""
        live = [s for s in self.shards if s is not None]
        if not live:
            return ids_df.sparkSession.createDataFrame(
                [], "id long, vec array<float>"
            )
        out = live[0].get_vector_by_ids(ids_df, id_col=id_col)
        for s in live[1:]:
            out = out.unionByName(s.get_vector_by_ids(ids_df, id_col=id_col))
        return out

    def save(self, path: str) -> None:
        from knowhere_spark.sources.index_store import IndexStore

        store = IndexStore(path)
        store.write_manifest(
            {
                "index_type": "SHARDED_HNSW",
                "metric_type": self.config.metric_type.value,
                "M": self.config.M,
                "ef": self.config.ef,
                "n_shards": len(self.shards),
                "empty_shards": [
                    i for i, s in enumerate(self.shards) if s is None
                ],
            }
        )
        for i, s in enumerate(self.shards):
            if s is not None:
                s.save(f"{path}/shard={i}")

    @classmethod
    def load(cls, spark, path: str) -> "ShardedHNSWIndex":
        from knowhere_spark.sources.index_store import IndexStore

        m = IndexStore(path).read_manifest()
        empty = set(m.get("empty_shards", []))
        shards = [
            None if i in empty else HNSWIndex.load(spark, f"{path}/shard={i}")
            for i in range(int(m["n_shards"]))
        ]
        cfg = HnswConfig(
            metric_type=MetricType(m["metric_type"]), M=int(m["M"]), ef=int(m["ef"])
        )
        return cls(shards, cfg)
