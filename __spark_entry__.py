"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2,
run over the driver testdata tables; ``oracle_sql()`` holds the DuckDB
equivalent.  Exact operators carry an oracle; approximate (ANN) operators
are rows-only here and recall-checked in tests/ (the reference's own
strategy: recall floors vs brute force, tests/ut/test_search.cc:28-29).

Column-name and arithmetic parity notes: distances are computed in
float64 on both sides with structurally identical expressions and rounded
to 4 decimals at this entry layer only; ranks are 1-based with ties
broken by (distance, neighbor_id).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowhere_spark.config import BaseConfig, MetricType
from knowhere_spark.operators.brute_force import BruteForce
from knowhere_spark.operators.topk import topk_per_key
from knowhere_spark.sources.tables import embeddings_as_dataset, load_table

NQ = 10      # query count: embeddings with vec_id < NQ
K = 10


def _emb(spark: SparkSession, sf_dir: str):
    base = embeddings_as_dataset(spark, sf_dir)
    queries = base.filter(F.col("id") < NQ).select(
        F.col("id").alias("query_id"), F.col("vec")
    )
    return base, queries


def _knn_out(df: DataFrame) -> DataFrame:
    return df.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("distance"), 4).alias("distance"),
        F.col("rank").cast("int").alias("rank"),
    )


def _range_out(df: DataFrame) -> DataFrame:
    return df.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("distance"), 4).alias("distance"),
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_flat_knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAT / BruteForce::Search, metric L2 (brute_force.cc:166-179)."""
    base, queries = _emb(spark, sf_dir)
    return _knn_out(BruteForce.search(base, queries, K, "L2", strategy="sql"))


def q_flat_knn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, queries = _emb(spark, sf_dir)
    return _knn_out(BruteForce.search(base, queries, K, "IP", strategy="sql"))


def q_flat_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, queries = _emb(spark, sf_dir)
    return _knn_out(BruteForce.search(base, queries, K, "COSINE", strategy="sql"))


def q_flat_knn_l2_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search with a pre-filter — BitsetView analog (bitsetview.h:21-147);
    the filter is an ordinary predicate pushed into the scan."""
    base, queries = _emb(spark, sf_dir)
    return _knn_out(
        BruteForce.search(
            base, queries, K, "L2", strategy="sql",
            filter_expr=F.col("label") % 5 != 0,
        )
    )


def q_flat_range_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RangeSearch, L2 direction: range_filter <= d < radius (range_util.h:22-25)."""
    base, queries = _emb(spark, sf_dir)
    cfg = BaseConfig(metric_type="L2", radius=1.5, range_filter=0.0)
    return _range_out(BruteForce.range_search(base, queries, cfg))


def q_flat_range_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RangeSearch, similarity direction: radius < d <= range_filter."""
    base, queries = _emb(spark, sf_dir)
    cfg = BaseConfig(metric_type="COSINE", radius=0.25, range_filter=1.01)
    return _range_out(BruteForce.range_search(base, queries, cfg))


def q_get_vector_by_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetVectorByIds (index_node.h:340-350): fetch raw vectors by id."""
    base = embeddings_as_dataset(spark, sf_dir)
    ids = base.select("id").filter(F.col("id") % 7 == 0)
    out = BruteForce.get_vector_by_ids(base, ids)
    return out.select(
        "id",
        F.transform(F.col("vec").cast("array<double>"), lambda x: F.round(x, 4)).alias("vec"),
    )


def q_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result-shaping top-k-per-key on a big relational table (the per-query
    k-heap generalized, SURVEY.md §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = topk_per_key(
        li, "l_orderkey", "l_extendedprice", 3,
        ascending=False, tie_breaker="l_linenumber",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("l_extendedprice"),
        F.col("rank").cast("int").alias("rank"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact cosine top-k over the embeddings table at sf0.001."""
    return q_flat_knn_cosine(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flat_knn_l2": q_flat_knn_l2,
        "flat_knn_ip": q_flat_knn_ip,
        "flat_knn_cosine": q_flat_knn_cosine,
        "flat_knn_l2_filtered": q_flat_knn_l2_filtered,
        "flat_range_l2": q_flat_range_l2,
        "flat_range_cosine": q_flat_range_cosine,
        "get_vector_by_ids": q_get_vector_by_ids,
        "topk_per_key": q_topk_per_key,
    }


# --------------------------------------------------------------------------
# DuckDB oracles — arithmetic mirrors the Spark expressions 1:1
# --------------------------------------------------------------------------

_L2 = "list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])), x -> (x[1]-x[2])*(x[1]-x[2])))"
_IP = "list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), CAST(q.qvec AS DOUBLE[])), x -> x[1]*x[2]))"
_NORM_E = "sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x*x)))"
_NORM_Q = "sqrt(list_sum(list_transform(CAST(q.qvec AS DOUBLE[]), x -> x*x)))"
_COS = f"({_IP}) / ({_NORM_E} * {_NORM_Q})"

_Q_CTE = f"q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {NQ})"


def _knn_oracle(dist: str, order: str, base_filter: str = "TRUE") -> str:
    return f"""
WITH {_Q_CTE},
d AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {dist} AS dd
  FROM embeddings e, q WHERE {base_filter}
),
r AS (
  SELECT query_id, neighbor_id, dd,
         row_number() OVER (PARTITION BY query_id ORDER BY dd {order}, neighbor_id) AS rk
  FROM d
)
SELECT query_id, neighbor_id, ROUND(dd, 4) AS distance, CAST(rk AS INT) AS rank
FROM r WHERE rk <= {K}
"""


def _range_oracle(dist: str, cond: str) -> str:
    return f"""
WITH {_Q_CTE},
d AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {dist} AS dd
  FROM embeddings e, q
)
SELECT query_id, neighbor_id, ROUND(dd, 4) AS distance FROM d WHERE {cond}
"""


def oracle_sql() -> dict[str, str]:
    return {
        "flat_knn_l2": _knn_oracle(_L2, "ASC"),
        "flat_knn_ip": _knn_oracle(_IP, "DESC"),
        "flat_knn_cosine": _knn_oracle(_COS, "DESC"),
        "flat_knn_l2_filtered": _knn_oracle(_L2, "ASC", "e.label % 5 <> 0"),
        "flat_range_l2": _range_oracle(_L2, "dd >= 0.0 AND dd < 1.5"),
        "flat_range_cosine": _range_oracle(_COS, "dd > 0.25 AND dd <= 1.01"),
        "get_vector_by_ids": """
SELECT vec_id AS id,
       list_transform(CAST(embedding AS DOUBLE[]), x -> ROUND(x, 4)) AS vec
FROM embeddings WHERE vec_id % 7 = 0
""",
        "topk_per_key": """
WITH r AS (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber) AS rk
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS l_extendedprice,
       CAST(rk AS INT) AS rank
FROM r WHERE rk <= 3
""",
    }
