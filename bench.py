"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Mirrors the reference's QPS protocol (benchmark/hdf5/benchmark_float_qps.cpp:
VPS = nq/elapsed at fixed recall); here we record wall-clock per query
batch over the driver testdata tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_spark() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("knowhere-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def bench_queries(spark: SparkSession) -> dict[str, float]:
    """name -> callable returning a DataFrame to be fully consumed."""
    from knowhere_spark.config import BaseConfig
    from knowhere_spark.operators.brute_force import BruteForce
    from knowhere_spark.operators.topk import topk_per_key
    from knowhere_spark.sources.tables import embeddings_as_dataset, load_table

    emb = embeddings_as_dataset(spark, SF_DIR).cache()
    n_emb = emb.count()
    all_queries = emb.select(F.col("id").alias("query_id"), "vec")
    li = load_table(spark, SF_DIR, "lineitem")

    out = {}

    def q_bf_knn_cosine_all():
        # all-pairs batch KNN: every embedding queries the full table (GEMM path)
        return BruteForce.search(emb, all_queries, 100, "COSINE", strategy="gemm")

    def q_bf_knn_l2_all():
        return BruteForce.search(emb, all_queries, 100, "L2", strategy="gemm")

    def q_bf_range_l2():
        cfg = BaseConfig(metric_type="L2", radius=1.5, range_filter=0.0)
        return BruteForce.range_search(
            emb, all_queries.filter(F.col("query_id") < 100), cfg
        )

    def q_topk_per_key():
        return topk_per_key(
            li, "l_orderkey", "l_extendedprice", 3,
            ascending=False, tie_breaker="l_linenumber",
        )

    out["bf_knn_cosine_all"] = q_bf_knn_cosine_all
    out["bf_knn_l2_all"] = q_bf_knn_l2_all
    out["bf_range_l2"] = q_bf_range_l2
    out["topk_per_key"] = q_topk_per_key
    return out


def main() -> None:
    spark = build_spark()
    timings: dict[str, float] = {}
    for name, fn in bench_queries(spark).items():
        t0 = time.monotonic()
        df = fn()
        n = df.count()   # full consumption
        dt = time.monotonic() - t0
        timings[name] = round(dt, 3)
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
