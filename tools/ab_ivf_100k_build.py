"""Idle-box A/B for the ivf_100k_build bench entry (VERDICT r11 #3).

The r11 driver artifact read 9.9 s (2.98x r10) under loadavg 10.8-18.4;
the adjudication attributed it to box contention.  This probe closes the
question with controlled evidence: N full builds of the exact bench
shape in ONE quiet session, each decomposed into the stages the r11
content-keyed sample change could have affected:

  sample+collect — content_keyed_sample (cap 32768 < 100k, so the
                   xxhash64 filter + id orderBy BINDS) + Arrow collect
  kmeans         — driver numpy_kmeans over the sample
  assign+count   — _assign_cells plan + assignments.cache().count()

Run: python tools/ab_ivf_100k_build.py [n_runs]
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
        .appName("ab-ivf-100k-build")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from knowhere_spark.config import IvfConfig
    from knowhere_spark.functions.distance import numpy_kmeans
    from knowhere_spark.operators.ivf import IVFFlatIndex, _assign_cells
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

    # untimed warmup: spin up Arrow workers + codegen like bench.py's
    # pre-loop pass, so run 1 is comparable to runs 2..N
    t0 = time.monotonic()
    idx = IVFFlatIndex.build(big, IvfConfig(metric_type="L2", nlist=128, nprobe=8))
    idx.assignments.cache().count()
    idx.assignments.unpersist()
    warm = time.monotonic() - t0
    print(f"# n={n_big} warmup_build_sec={warm:.2f} load1={os.getloadavg()[0]:.1f}")

    cfg = IvfConfig(metric_type="L2", nlist=128, nprobe=8)
    train_cap = 256 * 128
    for r in range(1, N_RUNS + 1):
        load0 = os.getloadavg()[0]
        t0 = time.monotonic()
        train_df = content_keyed_sample(big, n_big, train_cap, seed=cfg.seed)
        X = collect_vec_matrix(train_df, "vec")
        t1 = time.monotonic()
        centroids = numpy_kmeans(X, 128, iters=20, seed=cfg.seed)
        t2 = time.monotonic()
        assignments = _assign_cells(big, centroids, ())
        assignments.cache()
        assignments.count()
        t3 = time.monotonic()
        assignments.unpersist()
        print(
            f"run{r}: total={t3 - t0:.2f}s sample+collect={t1 - t0:.2f}s "
            f"(rows={len(X)}) kmeans={t2 - t1:.2f}s assign+count={t3 - t2:.2f}s "
            f"load1={load0:.1f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
