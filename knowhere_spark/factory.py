"""Index factory — ``IndexFactory::Create`` + ``Index::Build`` analog
(reference: src/index/index_factory.cc:45-90, include/knowhere/index/
index_node.h:70-74).

The reference keys its registry on ``name_dtype`` (utils.h:95-110) and
checks per-index dtype feature bits (operands.h:149-169).  Here the dtype
axis collapses into the DataFrame schema (fp16/bf16/int8 compute as fp32,
operands.h:180-198): dense indexes expect ``ARRAY<FLOAT/DOUBLE>``, binary
indexes ``BINARY``, sparse indexes ``MAP<INT,FLOAT>``.

Usage::

    idx = create_index("IVF_FLAT", {"metric_type": "L2", "nlist": 64})
    built = idx.build(base_df)            # Train + Add
    res = built.search(query_df, k=10)    # (query_id, neighbor_id, distance, rank)

``DISKANN`` is deliberately served by the IVF plan: a cell-partitioned
Parquet index scanned by probe *is* Spark's disk-resident ANN
(SURVEY.md §2.3 — index ≫ RAM, scan-what-you-probe); ``search_list_size``
maps onto ``nprobe``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from knowhere_spark.config import (
    BaseConfig,
    FlatConfig,
    IndexType,
    MetricType,
    VecType,
    load_config,
)
from knowhere_spark.operators.brute_force import BruteForce


class FlatIndex:
    """FLAT / BIN_FLAT — no train step (``NO_TRAIN`` feature,
    src/index/flat/flat.cc:398-414); the "index" is the raw table and every
    search is the exact kernel."""

    def __init__(self, base_df: DataFrame, config: BaseConfig, index_type: IndexType):
        self.base = base_df
        self.config = config
        self.index_type = index_type

    @classmethod
    def build(
        cls,
        base_df: DataFrame,
        config: BaseConfig,
        *,
        id_col: str = "id",
        vec_col: str = "vec",
        index_type: IndexType = IndexType.FLAT,
    ) -> "FlatIndex":
        base = base_df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        )
        return cls(base, config, index_type)

    def count(self) -> int:
        return self.base.count()

    def add(self, new_df: DataFrame, *, id_col: str = "id", vec_col: str = "vec") -> "FlatIndex":
        """Append rows (``IndexNode::Add``; NO_TRAIN, so add is a union)."""
        new = new_df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        )
        return FlatIndex(self.base.unionByName(new), self.config, self.index_type)

    def type(self) -> str:
        return self.index_type.value

    def has_raw_data(self) -> bool:
        return True   # flat.cc:257-285: FLAT always has raw data

    def search(
        self,
        query_df: DataFrame,
        k: int | None = None,
        *,
        filter_expr: Column | str | None = None,
        **kw,
    ) -> DataFrame:
        k = k if k is not None else self.config.k
        return BruteForce.search(
            self.base, query_df, k, self.config.metric_type,
            filter_expr=filter_expr, **kw,
        )

    def range_search(self, query_df: DataFrame, **kw) -> DataFrame:
        return BruteForce.range_search(self.base, query_df, self.config, **kw)

    def get_vector_by_ids(self, ids_df: DataFrame) -> DataFrame:
        return BruteForce.get_vector_by_ids(self.base, ids_df)

    def save(self, path: str) -> None:
        """Serialize (flat.cc serialization = the raw table + params)."""
        from knowhere_spark.sources.index_store import IndexStore

        store = IndexStore(path)
        store.write_manifest(
            {
                "index_type": self.index_type.value,
                "metric_type": self.config.metric_type.value,
                "k": self.config.k,
            }
        )
        store.write_table("base", self.base)

    @classmethod
    def load(cls, spark, path: str) -> "FlatIndex":
        from knowhere_spark.sources.index_store import IndexStore

        store = IndexStore(path)
        m = store.read_manifest()
        cfg = FlatConfig(metric_type=MetricType(m["metric_type"]), k=int(m["k"]))
        return cls(
            store.read_table(spark, "base"), cfg, IndexType(m["index_type"])
        )


class TypedIndex:
    """Reduced-precision storage wrapper (fp16/bf16/int8 axis).

    The reference stores vectors in the dataset's element type and widens
    to fp32 for compute (operands.h:53-147, 180-198).  Here the inner
    index is built over vectors ALREADY quantized to ``vec_type``'s
    representable values, and every incoming query is quantized the same
    way — so distances, stored raws, and serialized bytes are faithful to
    a reference index holding the same reduced-precision bytes, while
    every fp32 kernel is reused unchanged (fp16/bf16/int8 values widen to
    fp32 exactly).
    """

    def __init__(self, inner, vec_type: "VecType"):
        self.inner = inner
        self.vec_type = vec_type

    def _q(self, query_df: DataFrame, kw: dict) -> DataFrame:
        from knowhere_spark.functions.dtype import quantize_vec_col

        return quantize_vec_col(
            query_df, self.vec_type, kw.get("query_vec_col", "vec")
        )

    def search(self, query_df: DataFrame, *a, **kw):
        return self.inner.search(self._q(query_df, kw), *a, **kw)

    def range_search(self, query_df: DataFrame, *a, **kw):
        return self.inner.range_search(self._q(query_df, kw), *a, **kw)

    def add(self, new_df: DataFrame, *a, **kw):
        from knowhere_spark.functions.dtype import quantize_vec_col

        new = quantize_vec_col(new_df, self.vec_type, kw.get("vec_col", "vec"))
        return TypedIndex(self.inner.add(new, *a, **kw), self.vec_type)

    def save(self, path: str, *a, **kw):
        from knowhere_spark.sources.index_store import IndexStore

        out = self.inner.save(path, *a, **kw)
        store = IndexStore(path)
        m = store.read_manifest()
        m["vec_type"] = self.vec_type.value
        store.write_manifest(m)
        return out

    def type(self) -> str:
        return self.inner.type()

    def refine(self, *a, **kw):
        # index-returning methods must re-wrap, or the reduced-precision
        # contract is silently dropped for the returned index
        return TypedIndex(self.inner.refine(*a, **kw), self.vec_type)

    def __getattr__(self, name):
        # Count/Dim/Size/HasRawData/get_vector_by_ids/... delegate; the
        # inner tables already hold the quantized values
        return getattr(self.inner, name)


@dataclass
class IndexHandle:
    """Unbuilt index: validated config + build dispatch — what
    ``IndexFactory::Create`` returns before ``Build`` runs."""

    index_type: IndexType
    config: BaseConfig
    vec_type: "VecType | None" = None   # storage dtype; compute stays fp32

    def build(self, base_df: DataFrame, **kw):
        """Train + Add (index_node.h:70-74) → built index object."""
        from knowhere_spark.functions.dtype import (
            REDUCED_VEC_TYPES,
            quantize_vec_col,
        )

        if self.vec_type in REDUCED_VEC_TYPES:
            base_df = quantize_vec_col(
                base_df, self.vec_type, kw.get("vec_col", "vec")
            )
            return TypedIndex(self._build_inner(base_df, **kw), self.vec_type)
        return self._build_inner(base_df, **kw)

    def _build_inner(self, base_df: DataFrame, **kw):
        t = self.index_type
        if t in (IndexType.FLAT, IndexType.BIN_FLAT):
            return FlatIndex.build(base_df, self.config, index_type=t, **kw)
        if t == IndexType.IVF_FLAT:
            from knowhere_spark.operators.ivf import IVFFlatIndex

            return IVFFlatIndex.build(base_df, self.config, **kw)
        if t == IndexType.IVF_SQ8:
            from knowhere_spark.operators.sq import IVFSq8Index

            return IVFSq8Index.build(base_df, self.config, **kw)
        if t == IndexType.IVF_PQ:
            from knowhere_spark.operators.pq import IVFPqIndex

            return IVFPqIndex.build(base_df, self.config, **kw)
        if t == IndexType.SCANN:
            from knowhere_spark.operators.refine import ScannIndex

            return ScannIndex.build(base_df, self.config, **kw)
        if t == IndexType.BIN_IVF_FLAT:
            from knowhere_spark.operators.bin_ivf import BinaryIVFIndex

            return BinaryIVFIndex.build(base_df, self.config, **kw)
        if t == IndexType.HNSW:
            from knowhere_spark.operators.hnsw import (
                _BROADCAST_MAX_BYTES,
                HNSWIndex,
            )
            from knowhere_spark.operators.hnsw_sharded import ShardedHNSWIndex

            # over-broadcast-bound graphs route to the sharded build by
            # default: each shard bounds executor memory and reuses the
            # join-free broadcast beam, so the per-hop BFS table fallback
            # is opt-in (explicit HNSWIndex.build / custom scorers) rather
            # than a silent cliff at corpus scale
            import math

            vec_col = kw.get("vec_col", "vec")
            head = base_df.select(vec_col).head()
            dim = len(head[vec_col]) if head else 0
            per_row = dim * 4 + (int(self.config.M) + 1) * 4 + 16
            n = base_df.count()
            if n * per_row > _BROADCAST_MAX_BYTES:
                # pass the shard count computed from the count/dim we just
                # paid for — n_shards=None would make the sharded build
                # re-run the identical count() + head() on the same (possibly
                # expensive, un-cached) lineage
                kw.setdefault(
                    "n_shards",
                    max(1, math.ceil(n * per_row / _BROADCAST_MAX_BYTES)),
                )
                return ShardedHNSWIndex.build(base_df, self.config, **kw)
            return HNSWIndex.build(base_df, self.config, **kw)
        if t == IndexType.SHARDED_HNSW:
            from knowhere_spark.operators.hnsw_sharded import ShardedHNSWIndex

            return ShardedHNSWIndex.build(base_df, self.config, **kw)
        if t in (IndexType.HNSW_SQ, IndexType.HNSW_PQ, IndexType.HNSW_PRQ):
            from knowhere_spark.operators.hnsw_quant import QuantizedHNSWIndex

            # fp32 graph; SQ/PQ/PRQ codes score the beam, refine re-ranks
            return QuantizedHNSWIndex.build(base_df, self.config, index_type=t, **kw)
        if t == IndexType.DISKANN:
            from knowhere_spark.operators.diskann import DiskAnnIndex

            # DiskANN → cell-partitioned IVF on Parquet (operators/diskann
            # docstring); search_list_size/beamwidth size the probe breadth
            # and range search runs the doubling-k protocol
            # (diskann_config.h:150-159).
            return DiskAnnIndex.build(base_df, self.config, **kw)
        if t in (IndexType.SPARSE_INVERTED_INDEX, IndexType.SPARSE_WAND):
            from knowhere_spark.operators.sparse import SparseInvertedIndex

            return SparseInvertedIndex.build(base_df, self.config, **kw)
        if t == IndexType.KMEANS:
            from knowhere_spark.operators.cluster import KMeansCluster

            return KMeansCluster.train(base_df, self.config, **kw)
        raise NotImplementedError(f"index type {t.value} has no build path")


def estimate_index_size(
    index_type: IndexType | str, rows: int, dim: int, params: dict | None = None
) -> int:
    """``IndexStaticFaced::EstimateLoadResource`` analog
    (include/knowhere/index/index_static.h:52-140): rough bytes the index
    tables occupy, from row count + dim + params — used for capacity
    planning before a build, no data touched."""
    t = IndexType(index_type.upper()) if isinstance(index_type, str) else index_type
    p = dict(params or {})
    # storage bytes per element follow the dtype axis (operands.h:53-147);
    # pass params={"vec_type": "FP16"} (string or VecType) for
    # reduced-precision estimates
    from knowhere_spark.functions.dtype import ELEMENT_BYTES

    vt_raw = p.get("vec_type", VecType.FP32)
    vt = vt_raw if isinstance(vt_raw, VecType) else VecType(str(vt_raw).upper())
    fp = ELEMENT_BYTES.get(vt, 4)
    if t in (IndexType.FLAT, IndexType.IVF_FLAT, IndexType.DISKANN, IndexType.HNSW,
             IndexType.SHARDED_HNSW, IndexType.HNSW_SQ, IndexType.HNSW_PQ,
             IndexType.HNSW_PRQ):
        base = rows * (dim * fp + 8)
        if "HNSW" in t.value:
            base += rows * int(p.get("M", 30)) * 20   # edges (src,dst,dist)
        return base
    if t == IndexType.IVF_SQ8:
        return rows * (dim + 12) + 2 * dim * 8        # codes + min/max scales
    if t == IndexType.SCANN:
        # SQ8-quantized scan table + (with_raw_data default true) the raw
        # refine table (ivf_config.h:101-162)
        est = rows * (dim + 12) + 2 * dim * 8
        if p.get("with_raw_data", True):
            est += rows * (dim * fp + 8)
        return est
    if t == IndexType.IVF_PQ:
        m = int(p.get("m", 8))
        ksub = 1 << int(p.get("nbits", 8))
        return rows * (m * 2 + 12) + m * ksub * (dim // max(m, 1)) * 8
    if t in (IndexType.BIN_FLAT, IndexType.BIN_IVF_FLAT):
        return rows * (dim // 8 + 12)
    if t in (IndexType.SPARSE_INVERTED_INDEX, IndexType.SPARSE_WAND):
        nnz = int(p.get("avg_nnz", 64))
        return rows * nnz * 16                         # postings (term,doc,val)
    if t == IndexType.KMEANS:
        return int(p.get("num_clusters", 8)) * dim * 8 + rows * 12
    raise NotImplementedError(f"no size estimate for {t.value}")


def create_index(
    index_type: IndexType | str,
    params: dict | None = None,
    *,
    dtype: "VecType | str | None" = None,
) -> IndexHandle:
    """Validated factory entry — raises ``ConfigError`` on bad type/params
    exactly where the reference's ``Create`` + ``FormatAndCheck`` would.

    ``dtype`` is the reference factory's ``name_dtype`` axis
    (utils.h:95-110): checked against the index's supported set
    (operands.h:149-175); fp16/bf16/int8 compute as fp32 (the reference's
    MockData contract) so it gates compatibility, not kernels."""
    from knowhere_spark.config import check_vectype

    cfg = load_config(index_type, params)
    t = IndexType(index_type.upper()) if isinstance(index_type, str) else index_type
    vt = check_vectype(t, dtype) if dtype is not None else None
    return IndexHandle(t, cfg, vt)


def build_index(
    base_df: DataFrame, index_type: IndexType | str, params: dict | None = None, **kw
):
    """One-shot ``Create`` + ``Build``."""
    return create_index(index_type, params).build(base_df, **kw)


def load_index(spark: SparkSession, path: str):
    """``Deserialize`` dispatch: read the manifest, route to the index's
    loader (index_node.h:371-401 → SURVEY.md §1.4: deserialize = spark.read)."""
    from knowhere_spark.sources.index_store import IndexStore

    m = IndexStore(path).read_manifest()
    t = IndexType(m["index_type"])
    inner = _load_inner(spark, path, t)
    vt = m.get("vec_type")
    if vt is not None:
        from knowhere_spark.functions.dtype import REDUCED_VEC_TYPES

        vt = VecType(vt)
        if vt in REDUCED_VEC_TYPES:
            return TypedIndex(inner, vt)
    return inner


def _load_inner(spark: SparkSession, path: str, t: IndexType):
    if t in (IndexType.FLAT, IndexType.BIN_FLAT):
        return FlatIndex.load(spark, path)
    if t in (IndexType.IVF_FLAT, IndexType.DISKANN):
        from knowhere_spark.operators.ivf import IVFFlatIndex

        return IVFFlatIndex.load(spark, path)
    if t == IndexType.IVF_SQ8:
        from knowhere_spark.operators.sq import IVFSq8Index

        return IVFSq8Index.load(spark, path)
    if t == IndexType.IVF_PQ:
        from knowhere_spark.operators.pq import IVFPqIndex

        return IVFPqIndex.load(spark, path)
    if t == IndexType.SCANN:
        from knowhere_spark.operators.refine import ScannIndex

        return ScannIndex.load(spark, path)
    if t == IndexType.BIN_IVF_FLAT:
        from knowhere_spark.operators.bin_ivf import BinaryIVFIndex

        return BinaryIVFIndex.load(spark, path)
    if t == IndexType.HNSW:
        from knowhere_spark.operators.hnsw import HNSWIndex

        return HNSWIndex.load(spark, path)
    if t == IndexType.SHARDED_HNSW:
        from knowhere_spark.operators.hnsw_sharded import ShardedHNSWIndex

        return ShardedHNSWIndex.load(spark, path)
    if t in (IndexType.HNSW_SQ, IndexType.HNSW_PQ, IndexType.HNSW_PRQ):
        from knowhere_spark.operators.hnsw_quant import QuantizedHNSWIndex

        return QuantizedHNSWIndex.load(spark, path)
    if t in (IndexType.SPARSE_INVERTED_INDEX, IndexType.SPARSE_WAND):
        from knowhere_spark.operators.sparse import SparseInvertedIndex

        return SparseInvertedIndex.load(spark, path)
    raise NotImplementedError(f"no loader for {t.value}")
