"""Sub-phase decomposition of the sharded semantic build's dominant phase
(edges_build_write_sec, ~6-9 s warm of the ~9-15 s entry).

Builds the bench-shape index once to obtain the spill vectors table, then
re-times the edge chain prefix by prefix with a noop sink:

  scan        read the spill vectors parquet
  assign2     + the top-2-cell Arrow kernel
  local_knn   + the per-cell pairwise/diverse-neighbor Arrow kernel
  agg         + repartition(src) + dedup groupBy/agg
  window      + the sel_rank prune window
  write       + repartition(__shard) + parquet write (the real phase)

The assign2/local_knn bodies are line-for-line copies of the closures in
ShardedHNSWIndex.build (they are not importable); if the build changes,
re-copy before trusting the numbers.

Run: python tools/profile_semantic_edges.py [n_reps]
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("prof-semantic-edges")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from knowhere_spark.config import HnswConfig
    from knowhere_spark.functions.distance import pairwise_distances
    from knowhere_spark.operators.hnsw_sharded import (
        _CELL_TARGET_ROWS,
        _SHARD_EDGE_SCHEMA,
        ShardedHNSWIndex,
    )
    from knowhere_spark.config import MetricType
    from knowhere_spark.session import ensure_parallelism
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

    def _warm(b):
        import numpy  # noqa: F401

        for x in b:
            yield x

    spark.range(int(CPUS) * 4).repartition(int(CPUS)).mapInPandas(
        _warm, "id long"
    ).count()

    config = HnswConfig(metric_type="L2", M=16, ef=64)
    idx = ShardedHNSWIndex.build(
        big, config, n_shards=8, shard_by="semantic"
    )
    sharded = idx._vec_tbl
    metric = MetricType(config.metric_type)
    n = big.count()
    head = sharded.select("vec").head()
    dim = len(head["vec"])

    counts = {
        int(r["__shard"]): int(r["cnt"])
        for r in sharded.groupBy("__shard").agg(F.count("*").alias("cnt")).collect()
    }
    nlist = {s: max(4, c // _CELL_TARGET_ROWS) for s, c in counts.items() if c > 0}
    fractions = {s: min(1.0, max(4 * nlist[s], 64) / counts[s]) for s in nlist}
    _SCALE = 1 << 20
    thr_map = F.create_map(
        *[x for s in nlist for x in (F.lit(int(s)), F.lit(int(fractions[s] * _SCALE)))]
    )
    samp = sharded.filter(
        F.pmod(F.xxhash64(F.col("id"), F.lit(42)), F.lit(_SCALE))
        < thr_map[F.col("__shard")]
    )
    tbl = samp.select("__shard", "id", "vec").toArrow()
    s_arr = tbl.column(0).combine_chunks().to_numpy(zero_copy_only=False)
    id_arr = tbl.column(1).combine_chunks().to_numpy(zero_copy_only=False)
    flat = tbl.column(2).combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    S = flat.reshape(len(s_arr), -1) if len(s_arr) else flat.reshape(0, dim)
    order = np.lexsort((id_arr, s_arr))
    s_arr, S = s_arr[order], S[order]
    rng = np.random.default_rng(42)
    cents = {}
    for s in nlist:
        Ss = S[s_arr == s]
        pick = rng.choice(len(Ss), size=min(nlist[s], len(Ss)), replace=False)
        cents[s] = Ss[pick]
    bc = spark.sparkContext.broadcast(cents)

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    vec_type = sharded.schema["vec"].dataType

    def assign2(batches):
        import pyarrow as pa

        from knowhere_spark.functions.arrowio import list_matrix, scalar_column

        C_by_shard = bc.value
        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb])
            X_all = list_matrix(tbl, "vec")
            ids_all = scalar_column(tbl, "id", np.int64)
            s_all = scalar_column(tbl, "__shard", np.int64)
            vec_col = tbl.column("vec").combine_chunks()
            id_parts, s_parts, c_parts, take_parts = [], [], [], []
            for s in np.unique(s_all):
                rows = np.flatnonzero(s_all == s)
                C = C_by_shard[int(s)]
                d = pairwise_distances(X_all[rows], C, MetricType.L2)
                top2 = np.argsort(d, axis=1, kind="stable")[:, :2]
                ncopy = min(2, top2.shape[1])
                take_parts.append(np.tile(rows, ncopy))
                id_parts.append(np.tile(ids_all[rows], ncopy))
                s_parts.append(np.full(len(rows) * ncopy, s, dtype=np.int32))
                c_parts.append(top2[:, :ncopy].T.ravel().astype(np.int32))
            idx_a = pa.array(np.concatenate(take_parts))
            yield pa.record_batch(
                [
                    pa.array(np.concatenate(id_parts), type=pa.int64()),
                    pa.array(np.concatenate(s_parts), type=pa.int32()),
                    pa.array(np.concatenate(c_parts), type=pa.int32()),
                    vec_col.take(idx_a),
                ],
                names=["id", "__shard", "cell_id", "vec"],
            )

    blocks = ensure_parallelism(sharded).mapInArrow(
        assign2,
        StructType(
            [
                StructField("id", LongType()),
                StructField("__shard", IntegerType()),
                StructField("cell_id", IntegerType()),
                StructField("vec", vec_type),
            ]
        ),
    )

    M = config.M
    efC = int(config.efConstruction)

    import pyarrow as pa

    from knowhere_spark.functions.arrowio import list_matrix, scalar_column

    _edge_pa = pa.schema(
        [("__shard", pa.int32()), ("src", pa.int64()), ("dst", pa.int64()),
         ("dist", pa.float64()), ("sel_rank", pa.int32())]
    )

    def local_knn(key, tbl):
        if tbl.num_rows < 2:
            return _edge_pa.empty_table()
        ids = scalar_column(tbl, "id", np.int64)
        X = list_matrix(tbl, "vec")
        order = np.argsort(ids)
        ids, X = ids[order], X[order]
        d = pairwise_distances(X, X, metric)
        sim = metric.is_similarity
        key_m = -d if sim else d
        np.fill_diagonal(key_m, np.inf)
        kk = min(M, len(ids) - 1)
        from knowhere_spark.operators.hnsw import _REV_RANK, diverse_neighbors

        src_pos, dst_pos, sel_rank = diverse_neighbors(
            key_m, kk, cand_cap=max(2 * M, efC)
        )
        from knowhere_spark.operators.hnsw import _undominated_reverse_mask

        dd = d[src_pos, dst_pos]
        keep_rev = _undominated_reverse_mask(src_pos, dst_pos, dd)
        m_edges = len(src_pos)
        n_rev = int(keep_rev.sum())
        return pa.table(
            {
                "__shard": pa.array(
                    np.full(m_edges + n_rev, int(key[0].as_py()), dtype=np.int32),
                    type=pa.int32(),
                ),
                "src": pa.array(
                    np.concatenate([ids[src_pos], ids[dst_pos[keep_rev]]]),
                    type=pa.int64(),
                ),
                "dst": pa.array(
                    np.concatenate([ids[dst_pos], ids[src_pos[keep_rev]]]),
                    type=pa.int64(),
                ),
                "dist": pa.array(
                    np.concatenate([dd, dd[keep_rev]]), type=pa.float64()
                ),
                "sel_rank": pa.array(
                    np.concatenate(
                        [
                            sel_rank.astype(np.int32, copy=False),
                            np.full(n_rev, _REV_RANK, dtype=np.int32),
                        ]
                    ),
                    type=pa.int32(),
                ),
            }
        )

    raw_edges = blocks.groupBy("__shard", "cell_id").applyInArrow(
        local_knn, _SHARD_EDGE_SCHEMA
    )
    sym = (
        raw_edges.repartition("src")
        .groupBy("__shard", "src", "dst")
        .agg(F.min("dist").alias("dist"), F.min("sel_rank").alias("sel_rank"))
    )
    w_prune = Window.partitionBy("src").orderBy(
        F.col("sel_rank").asc(), F.col("dist").asc(), F.col("dst").asc()
    )
    pruned = (
        sym.withColumn("__r", F.row_number().over(w_prune))
        .filter(F.col("__r") <= F.lit(M))
        .select("__shard", "src", "dst", "dist")
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    stages = [
        ("scan", lambda: noop(sharded)),
        ("assign2", lambda: noop(blocks)),
        ("local_knn", lambda: noop(raw_edges)),
        ("agg", lambda: noop(sym)),
        ("window", lambda: noop(pruned)),
    ]
    n_write_parts = max(8, spark.sparkContext.defaultParallelism)
    import tempfile

    for name, act in stages:
        best = min(
            (lambda t0=time.monotonic(): (act(), time.monotonic() - t0)[1])()
            for _ in range(N_REPS)
        )
        print(f"{name:12s} {best:7.3f}s  loadavg={os.getloadavg()[0]:.1f}")
    wtimes = []
    for _ in range(N_REPS):
        out = tempfile.mkdtemp(prefix="prof_edges_")
        t0 = time.monotonic()
        pruned.repartition(n_write_parts, "__shard").write.mode(
            "overwrite"
        ).partitionBy("__shard").parquet(out)
        wtimes.append(time.monotonic() - t0)
        import shutil

        shutil.rmtree(out, ignore_errors=True)
    print(f"{'write':12s} {min(wtimes):7.3f}s  loadavg={os.getloadavg()[0]:.1f}")
    print(
        "rows: raw_edges={} pruned={}".format(
            raw_edges.count(), pruned.count()
        )
    )
    idx.destroy()
    spark.stop()


if __name__ == "__main__":
    main()
