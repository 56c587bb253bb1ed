"""Idle-box decomposition of the ivf_100k_build and
ivf_100k_selfsearch_distributed bench entries (the two largest r12
baseline readings: 12.3 s / 21.5 s vs r10 bests 3.3 / 7.6).

Phases are timed by forcing each intermediate with count()/noop in the
same order the bench entry would, so the deltas attribute wall to the
stage that actually pays it.

Run: python tools/profile_ivf_100k.py [n_runs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 2


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("prof-ivf-100k")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    from knowhere_spark.config import IvfConfig
    from knowhere_spark.functions.distance import numpy_kmeans
    from knowhere_spark.operators.ivf import IVFFlatIndex
    from knowhere_spark.session import collect_vec_matrix, content_keyed_sample
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
    print(f"# corpus rows: {n_big}, loadavg: {os.getloadavg()}")

    def _warm(b):
        import numpy  # noqa: F401

        for x in b:
            yield x

    spark.range(int(CPUS) * 4).repartition(int(CPUS)).mapInPandas(
        _warm, "id long"
    ).count()

    for run in range(N_RUNS):
        print(f"## run {run} (load {os.getloadavg()[0]:.1f})")
        # ---- build decomposition --------------------------------------
        cfg = IvfConfig(metric_type="L2", nlist=128, nprobe=8)
        t0 = time.monotonic()
        base = big.select(F.col("id").cast("long").alias("id"), F.col("vec"))
        n = base.count()
        t1 = time.monotonic(); print(f"   count_sec                 {t1-t0:7.3f}")
        nlist = cfg.match_nlist(n)
        train_cap = 256 * nlist
        train_df = content_keyed_sample(base, n, train_cap, seed=cfg.seed)
        X = collect_vec_matrix(train_df, "vec")
        t2 = time.monotonic(); print(f"   sample_collect_sec        {t2-t1:7.3f}  rows={len(X)}")
        centroids = numpy_kmeans(X, nlist, iters=20, seed=cfg.seed)
        t3 = time.monotonic(); print(f"   kmeans_sec                {t3-t2:7.3f}")
        idx = IVFFlatIndex.build(big, cfg)
        t4 = time.monotonic(); print(f"   (full build replan)       {t4-t3:7.3f}")
        idx.assignments.cache()
        idx.assignments.count()
        t5 = time.monotonic(); print(f"   assign_cache_count_sec    {t5-t4:7.3f}")
        print(f"   BUILD_TOTAL               {t5-t0:7.3f}")

        # ---- selfsearch decomposition ---------------------------------
        qs = big.select(F.col("id").alias("query_id"), "vec")
        t0 = time.monotonic()
        probes = idx.probe_assign(
            qs.select("query_id", F.col("vec").alias("qvec")), 4
        ).cache()
        probes.count()
        t1 = time.monotonic(); print(f"   probe_assign_cache_sec    {t1-t0:7.3f}")
        out = idx._cogroup_topk(probes, 10, None)
        out.write.format("noop").mode("overwrite").save()
        t2 = time.monotonic(); print(f"   cogroup_topk_noop_sec     {t2-t1:7.3f}")
        probes.unpersist()
        res = idx.search(qs, k=10, nprobe=4, strategy="distributed")
        res.write.format("noop").mode("overwrite").save()
        t3 = time.monotonic(); print(f"   full_search_noop_sec      {t3-t2:7.3f}")
        print(f"   SEARCH_TOTAL              {t3-t0:7.3f}")
        idx.assignments.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
