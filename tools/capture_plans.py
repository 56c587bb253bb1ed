"""Capture .explain("formatted") for the bench-critical query paths into
<outdir>/<name>.txt — run once on the pre-change tree and once on the
optimized tree to produce the plans/r12/*_{before,after}.txt evidence.

Usage: python tools/capture_plans.py <outdir> [repo_root]
"""
import os
import sys

OUTDIR = sys.argv[1]
ROOT = sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
sys.path.insert(0, ROOT)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.makedirs(OUTDIR, exist_ok=True)


def save(name, df):
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(OUTDIR, f"{name}.txt"), "w") as f:
        f.write(plan)
    n_ex = plan.count("Exchange")
    print(f"{name}: {n_ex} Exchange nodes -> {OUTDIR}/{name}.txt")


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("capture-plans")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from knowhere_spark.config import HnswConfig, IvfConfig
    from knowhere_spark.operators.hnsw import HNSWIndex
    from knowhere_spark.operators.ivf import IVFFlatIndex
    from knowhere_spark.operators.semdedup import semdedup
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
    big.count()

    # ivf_100k build + distributed selfsearch
    idx = IVFFlatIndex.build(big, IvfConfig(metric_type="L2", nlist=128, nprobe=8))
    save("ivf_100k_build_assignments", idx.assignments)
    idx.assignments.cache().count()
    qs = big.select(F.col("id").alias("query_id"), "vec")
    save(
        "ivf_100k_selfsearch_distributed",
        idx.search(qs, k=10, nprobe=4, strategy="distributed"),
    )
    idx.assignments.unpersist()

    # hnsw build edge plan (the sym-agg + prune-window chain)
    hidx = HNSWIndex.build(emb, HnswConfig(metric_type="L2", M=16, ef=64))
    save("hnsw_build_edges", hidx.edges)

    # semdedup over the 100k corpus
    save("semdedup_100k", semdedup(big, eps=0.96, num_clusters=96, seed=11))
    spark.stop()


if __name__ == "__main__":
    main()
