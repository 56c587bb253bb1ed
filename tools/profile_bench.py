"""Stage-level profiling for the slow bench lines (dedup_minhash,
ivf_100k_build, sparse_bm25).  Not part of the driver contract — a dev tool.

Run: python tools/profile_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import SF_DIR, build_spark


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"## {label}: {time.monotonic() - t0:.3f}s", flush=True)
    return out


def main():
    spark = build_spark()
    from knowhere_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures
    from knowhere_spark.sources.tables import embeddings_as_dataset, load_table

    docs = load_table(spark, SF_DIR, "documents")
    docs.count()

    # warmup python workers
    minhash_signatures(docs.limit(64)).count()

    # --- minhash breakdown ---
    sigs = minhash_signatures(docs)
    t("minhash signatures only", lambda: sigs.count())
    t("minhash_lsh_pairs full", lambda: minhash_lsh_pairs(docs, 0.7, num_perm=64, bands=32).count())
    t("minhash_lsh_pairs no-verify", lambda: minhash_lsh_pairs(docs, 0.7, num_perm=64, bands=32, verify=False).count())

    # --- ivf 100k build breakdown ---
    from knowhere_spark.config import IvfConfig
    from knowhere_spark.operators.ivf import IVFFlatIndex

    emb = embeddings_as_dataset(spark, SF_DIR).cache()
    emb.count()
    big = (
        emb.crossJoin(spark.range(50).withColumnRenamed("id", "rep"))
        .select(
            (F.col("id") + F.col("rep") * 1_000_000).alias("id"),
            F.transform("vec", lambda x: x + F.col("rep").cast("float") * F.lit(0.001)).alias("vec"),
        )
        .cache()
    )
    big.count()

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = big.withColumn("__features", array_to_vector(F.col("vec").cast("array<double>"))).cache()
    t("feats materialize", lambda: feats.count())
    train = feats.sample(fraction=min(1.0, 256 * 128 / 100000), seed=42).cache()
    t("train sample materialize", lambda: train.count())
    model = t("mllib kmeans fit (k=128, 20 iter)", lambda: KMeans(k=128, seed=42, maxIter=20, featuresCol="__features", predictionCol="cell_id").fit(train))
    t("mllib transform assign", lambda: model.transform(feats).count())

    t("ivf build total (current impl)", lambda: IVFFlatIndex.build(big, IvfConfig(metric_type="L2", nlist=128, nprobe=8)).assignments.count())

    # --- sparse bm25 breakdown ---
    from knowhere_spark.config import SparseConfig
    from knowhere_spark.operators.sparse import SparseInvertedIndex, text_to_sparse

    sv = t("text_to_sparse", lambda: text_to_sparse(docs).cache())
    t("text_to_sparse materialize", lambda: sv.count())
    idx = t("sparse build", lambda: SparseInvertedIndex.build(sv, SparseConfig(metric_type="BM25"), id_col="id", vec_col="vec"))
    q = sv.limit(10).select(F.col("id").alias("query_id"), "vec")
    t("sparse bm25 search nq10", lambda: idx.search(q, k=10).count())

    spark.stop()


if __name__ == "__main__":
    main()
