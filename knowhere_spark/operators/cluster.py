"""Standalone k-means clustering op — the reference's ``ClusterNode``
(include/knowhere/cluster/cluster_node.h:26-50: Train → id mapping,
Assign for new rows, GetCentroids), factory name ``KMEANS``
(index_param.h:64-66).

Train = MLlib KMeans fit; Assign = broadcast-centroid GEMM kernel (shared
with the IVF index).  Outputs follow FIXTURES.md T8: train mapping
``(id, cluster_id)``, assignment ``(query_id, cluster_id)``, centroids
``(cluster_id, vec)``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowhere_spark.config import KMeansConfig
from knowhere_spark.operators.ivf import _assign_cells


class KMeansCluster:
    def __init__(self, centroids: np.ndarray, train_mapping: DataFrame, config: KMeansConfig):
        self.centroids = centroids
        self.train_mapping = train_mapping   # (id, cluster_id)
        self.config = config

    @classmethod
    def train(
        cls, df: DataFrame, config: KMeansConfig, *, id_col: str = "id", vec_col: str = "vec"
    ) -> "KMeansCluster":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        base = df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        )
        feats = base.withColumn(
            "__features", array_to_vector(F.col("vec").cast("array<double>"))
        )
        km = KMeans(
            k=config.num_clusters,
            seed=config.seed,
            maxIter=config.max_iter,
            featuresCol="__features",
            predictionCol="cluster_id",
        )
        model = km.fit(feats)
        centroids = np.array([np.asarray(c) for c in model.clusterCenters()], dtype=np.float64)
        mapping = model.transform(feats).select("id", F.col("cluster_id").cast("int"))
        return cls(centroids, mapping, config)

    def assign(self, df: DataFrame, *, id_col: str = "id", vec_col: str = "vec") -> DataFrame:
        """Nearest-centroid assignment for new rows (``ClusterNode::Assign``)."""
        new = df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        )
        return _assign_cells(new, self.centroids).select(
            F.col("id"), F.col("cell_id").alias("cluster_id")
        )

    def get_centroids(self, spark) -> DataFrame:
        """``ClusterNode::GetCentroids`` as a DataFrame."""
        rows = [
            (int(i), [float(x) for x in c]) for i, c in enumerate(self.centroids)
        ]
        return spark.createDataFrame(rows, "cluster_id int, vec array<double>")
