"""Idle-box decomposition of the sharded_hnsw_semantic_build bench entry
(the most expensive bench line: 14.7 s best / 18.4 s r11 driver artifact).

Runs N builds of the exact bench shape in one session and prints the
per-phase wall recorded by ShardedHNSWIndex.build (build_stages), plus the
paired routed-search timings so search-side changes can be A/B'd here too.

Run: python tools/profile_sharded_semantic.py [n_runs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("prof-sharded-semantic")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from knowhere_spark.config import HnswConfig
    from knowhere_spark.operators.hnsw_sharded import ShardedHNSWIndex
    from knowhere_spark.sources.tables import embeddings_as_dataset

    emb = embeddings_as_dataset(spark, SF_DIR).cache()
    emb.count()
    big = (
        emb.crossJoin(spark.range(50).withColumnRenamed("id", "rep"))
        .select(
            (F.col("id") + F.col("rep") * 1_000_000).alias("id"),
            F.transform(
                "vec", lambda x: x + F.col("rep").cast("float") * F.lit(0.001)
            ).alias("vec"),
        )
        .cache()
    )
    n_big = big.count()
    big_queries = big.filter(F.col("id") < 100).select(
        F.col("id").alias("query_id"), "vec"
    )
    print(f"# corpus rows: {n_big}, loadavg: {os.getloadavg()}")

    # worker warmup (mirror bench)
    def _warm(b):
        import numpy  # noqa: F401

        for x in b:
            yield x

    spark.range(int(CPUS) * 4).repartition(int(CPUS)).mapInPandas(
        _warm, "id long"
    ).count()

    for run in range(N_RUNS):
        t0 = time.monotonic()
        idx = ShardedHNSWIndex.build(
            big, HnswConfig(metric_type="L2", M=16, ef=64),
            n_shards=8, shard_by="semantic",
        )
        idx.shards[0].edges.limit(1).write.format("noop").mode(
            "overwrite"
        ).save()
        total = time.monotonic() - t0
        print(f"## run {run}: build total {total:.2f}s")
        for k, v in getattr(idx, "build_stages", {}).items():
            print(f"   {k:28s} {v:7.3f}")
        t1 = time.monotonic()
        res = idx.search(big_queries, k=10, ef=160, probe_shards=2)
        res.write.format("noop").mode("overwrite").save()
        print(f"   routed_search_cold_sec       {time.monotonic() - t1:7.3f}")
        t2 = time.monotonic()
        res = idx.search(big_queries, k=10, ef=160, probe_shards=2)
        res.write.format("noop").mode("overwrite").save()
        print(f"   routed_search_warm_sec       {time.monotonic() - t2:7.3f}")
        idx.destroy()
    spark.stop()


if __name__ == "__main__":
    main()
