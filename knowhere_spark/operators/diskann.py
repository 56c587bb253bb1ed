"""DISKANN — the disk-resident ANN regime, expressed as cell-partitioned
IVF over Parquet (SURVEY.md §2.3: an index larger than RAM whose probed
partitions are the reference's beam IOs; src/index/diskann/diskann.cc).

What survives of the DiskANN config surface (diskann_config.h:26-196):

- ``search_list_size`` plays nprobe's role (search breadth), ``beamwidth``
  widens it (each beam IO ≈ one probed cell's scan).
- range search follows the reference's **doubling-k** protocol
  (diskann_config.h:150-159): search top-``min_k``, and for every query
  whose k-th hit still lies inside the radius bound (meaning the range may
  extend past the horizon) double k and retry, up to ``max_k``.
- graph params (``max_degree``, DRAM/PQ budgets) size the IVF analog's
  nlist; they are validated (config.py DiskAnnConfig) and recorded, not
  emulated — there is no graph to build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knowhere_spark.config import DiskAnnConfig, MetricType
from knowhere_spark.operators.ivf import IVFFlatIndex


class DiskAnnIndex:
    """DiskANN API over the IVF-on-Parquet analog."""

    def __init__(self, ivf: IVFFlatIndex, config: DiskAnnConfig):
        self.ivf = ivf
        self.config = config
        self.index_type = ivf.index_type

    # delegate the introspection verbs
    def count(self) -> int:
        return self.ivf.count()

    def dim(self) -> int:
        return self.ivf.dim()

    def type(self) -> str:
        return self.ivf.type()

    def has_raw_data(self) -> bool:
        return self.ivf.has_raw_data()

    def _nprobe(self) -> int:
        # search breadth: search_list_size scans / beamwidth-wide IO
        base = max(8, int(self.config.search_list_size) // 8)
        return min(
            self.ivf.config.nlist, base * max(1, int(self.config.beamwidth) // 8 + 1)
        )

    def search(self, query_df: DataFrame, k: int | None = None, **kw) -> DataFrame:
        k = k if k is not None else self.config.k
        kw.setdefault("nprobe", self._nprobe())
        return self.ivf.search(query_df, k=k, **kw)

    def get_vector_by_ids(self, ids_df: DataFrame, **kw) -> DataFrame:
        return self.ivf.get_vector_by_ids(ids_df, **kw)

    def get_index_meta(self, **kw) -> DataFrame:
        """GetIndexMeta (feder/DiskANN.h:21-152): the reference renders the
        Vamana graph; the Spark analog's index view is its cell partition
        map — per-cell membership + centroid, exactly the IVF meta."""
        return self.ivf.get_index_meta(**kw)

    def range_search(
        self,
        query_df: DataFrame,
        config: DiskAnnConfig | None = None,
        *,
        filter_expr: Column | str | None = None,
        query_id_col: str = "query_id",
        query_vec_col: str = "vec",
    ) -> DataFrame:
        """Doubling-k range search (diskann_config.h:150-159).

        Iteration ``i`` searches top-``min_k·2^i`` for the still-open
        queries; a query closes when it returned fewer than k hits or its
        k-th hit already fell outside the radius bound (no more hits can
        qualify).  ``max_k`` caps the horizon.  The driver loop touches
        only per-query boundary stats (nq rows per round) — never result
        sets.
        """
        cfg = config or self.config
        lo, hi, sim = cfg.range_bounds()
        queries = query_df.select(
            F.col(query_id_col).cast("long").alias("query_id"),
            F.col(query_vec_col).alias("vec"),
        ).cache()
        nprobe = self._nprobe()

        k = max(1, int(cfg.min_k))
        max_k = max(k, int(cfg.max_k))
        pending = queries
        final_parts: list[DataFrame] = []
        cached: list[DataFrame] = [queries]
        while True:
            res = self.ivf.search(
                pending, k=k, nprobe=nprobe, filter_expr=filter_expr
            ).cache()
            cached.append(res)
            if k >= max_k:
                final_parts.append(res.drop("rank"))
                break
            # a query stays open iff it filled all k slots AND its worst
            # (rank-k) hit is still inside the bound — the range may extend
            # past this horizon
            worst = F.max("distance") if not sim else F.min("distance")
            stats = res.groupBy("query_id").agg(
                F.count("*").alias("n"), worst.alias("edge")
            )
            still_in = (
                (F.col("edge") < F.lit(hi))
                if not sim
                else (F.col("edge") > F.lit(lo))
            )
            open_q = stats.filter((F.col("n") >= k) & still_in).select("query_id")
            open_ids = [r["query_id"] for r in open_q.collect()]
            if not open_ids:
                final_parts.append(res.drop("rank"))
                break
            final_parts.append(
                res.join(
                    F.broadcast(open_q), "query_id", "left_anti"
                ).drop("rank")
            )
            pending = pending.join(F.broadcast(open_q), "query_id", "left_semi")
            k = min(k * 2, max_k)

        out = final_parts[0]
        for p in final_parts[1:]:
            out = out.unionByName(p)
        if sim:
            cond = (F.col("distance") > F.lit(lo)) & (F.col("distance") <= F.lit(hi))
        else:
            cond = (F.col("distance") >= F.lit(lo)) & (F.col("distance") < F.lit(hi))
        out = out.filter(cond).select("query_id", "neighbor_id", "distance")
        # materialize once, then release every per-round cache — repeated
        # range searches in a long-lived session must not accumulate
        # pinned storage blocks
        out = out.localCheckpoint(eager=True)
        for df in cached:
            df.unpersist()
        return out

    @classmethod
    def build(cls, base_df: DataFrame, config: DiskAnnConfig, **kw) -> "DiskAnnIndex":
        from knowhere_spark.config import IndexType, IvfConfig

        ivf_cfg = IvfConfig(
            metric_type=MetricType(config.metric_type),
            k=config.k,
            nlist=max(128, int(config.max_degree) * 4),
            nprobe=max(8, int(config.search_list_size) // 8),
            seed=getattr(config, "seed", 42),
        )
        ivf = IVFFlatIndex.build(
            base_df, ivf_cfg, index_type=IndexType.DISKANN, **kw
        )
        return cls(ivf, config)
