"""Recommended SparkSession configuration for this engine.

One place encoding the scale decisions (SURVEY.md §4 / pyspark guide):
AQE on (runtime re-plan, skew-join splitting), Arrow on (every pandas-UDF
kernel in this engine is Arrow-batched), shuffle partitions sized to the
cluster, generous broadcast threshold (query sets / probe lists / stats
tables are all deliberately-broadcast small sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition *only when* the plan has fewer partitions
    than the cluster has task slots.

    Small parquet files arrive as a single split, which would serialize
    every downstream Arrow kernel onto one core; a 100 TB scan arrives as
    thousands of splits, where this is a no-op (no shuffle added).  Use at
    the entry of per-row Python kernels whose per-row cost dwarfs the
    one-time shuffle of a small input.
    """
    if df.isStreaming:
        # no static partition count to inspect; micro-batch parallelism is
        # the source's concern (maxFilesPerTrigger etc.)
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def collect_vec_matrix(df: DataFrame, col: str = "vec", dtype=None):
    """Collect a fixed-length array column into one ``(n, dim)`` numpy
    matrix via Arrow.

    Row-based ``collect()`` boxes every float as a Python object (~10×
    the memory of the final matrix) — at the 50-100k-row train-sample
    sizes the index builders use, that transient blow-up matters.  Falls
    back to the Row path when the plan can't be served by Arrow."""
    import numpy as np

    dtype = dtype or np.float64
    try:
        tbl = df.select(col).toArrow()
        lst = tbl.column(0).combine_chunks()
        flat = lst.flatten().to_numpy(zero_copy_only=False).astype(dtype)
        n = len(lst)
        return flat.reshape(n, -1) if n else flat.reshape(0, 0)
    except Exception:
        return np.array(
            [r[col] for r in df.select(col).collect()], dtype=dtype
        )


def collect_vec_matrix_sorted(
    df: DataFrame, key: str = "id", col: str = "vec", dtype=None
):
    """Collect ``(key, vec)`` and return the ``(n, dim)`` matrix sorted by
    ``key`` — the driver-side equivalent of ``df.orderBy(key)`` followed
    by :func:`collect_vec_matrix`.

    Trainers that must see id-ordered samples (content_keyed_sample's
    ``sort=True`` contract) previously paid a distributed total sort — a
    full shuffle of the sample — just to pin row order for the driver
    collect.  Sorting the collected arrays on the driver is a plain
    ``np.argsort`` over the (unique) keys and yields the bit-identical
    matrix with one less exchange (guide §2.4: remove shuffles whose only
    purpose is output determinism).  Falls back to the Row path when the
    plan can't be served by Arrow."""
    import numpy as np

    dtype = dtype or np.float64
    try:
        tbl = df.select(key, col).toArrow()
        keys = tbl.column(0).combine_chunks().to_numpy(zero_copy_only=False)
        lst = tbl.column(1).combine_chunks()
        flat = lst.flatten().to_numpy(zero_copy_only=False).astype(dtype)
        n = len(lst)
        M = flat.reshape(n, -1) if n else flat.reshape(0, 0)
    except Exception:
        rows = df.select(key, col).collect()
        keys = np.array([r[key] for r in rows])
        M = np.array([r[col] for r in rows], dtype=dtype)
        if len(M) == 0:
            M = M.reshape(0, 0)
    if len(keys):
        M = M[np.argsort(keys, kind="stable")]
    return M


def content_keyed_sample(
    df: DataFrame,
    n_rows: int,
    cap: int | None,
    *,
    key_col: str | list[str] = "id",
    seed: int = 42,
    sort: bool = True,
) -> DataFrame:
    """Bounded train-time sample whose membership depends only on the KEY
    VALUES: keep rows with ``xxhash64(key, seed) mod 2^20 < cap/n · 2^20``.

    ``key_col`` may list several columns (hashed together) — tables
    without a dedicated id should key on ALL columns, because rows
    sharing one key value are kept or dropped as a bloc (a duplicate-
    heavy corpus keyed on text alone would draw all-or-nothing).

    Spark's ``.sample()`` seeds per PARTITION, so the same data arriving
    in a different partition layout (a shuffled, checkpointed, or
    repartitioned input) draws a DIFFERENT sample — r10 root-caused a
    ±0.05 recall wobble in the sharded-HNSW build to exactly that.  Every
    trainer's subsample goes through this helper so the content-keyed
    rule is enforced in one place instead of a per-site comment
    (VERDICT r10 #7; first applied at hnsw.py's cell sampler and
    hnsw_sharded.py's router trainer in r10).

    When the cap does not bind (``n_rows <= cap`` or ``cap is None``) the
    input is returned untouched — sub-cap trains keep their exact train
    sets and row order, so existing artifacts are unchanged.  When it
    does bind, the sampled rows are additionally ``orderBy(key_col)``-ed
    (``sort=True``): position-seeded trainers (numpy k-means / Lloyd
    init) must not see shuffle-arrival row order either, or membership
    invariance alone wouldn't pin the artifact.  Pass ``sort=False``
    when the consumer is order-free (a groupBy count) or does its own
    sort — a distributed MLlib fit, whose kmeans|| init is inherently
    layout-sensitive, also skips the pointless total sort.

    Expected sample size ≈ ``cap`` (Bernoulli over the hash, matching
    ``.sample()``'s variance profile); trainers only need the bound,
    not exactness.
    """
    from pyspark.sql import functions as F

    import math

    if cap is None or n_rows <= cap:
        return df
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    _SC = 1 << 20
    # ceil, floored at 1: int() truncation would under-draw up to a full
    # 2^-20 of the corpus (~30% at 10^9 rows), and at n > cap·2^20 a
    # floor-to-zero threshold would keep NOTHING and crash the trainer
    # downstream — a tiny over-cap sample is the correct degradation
    threshold = max(1, math.ceil(cap / n_rows * _SC))
    out = df.filter(
        F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.lit(seed)), F.lit(_SC))
        < F.lit(threshold)
    )
    return out.orderBy(*keys) if sort else out


_SPILL_ROOT: str | None = None


def session_spill_dir(spark: SparkSession, tag: str = "t") -> str:
    """A fresh scratch directory for materialized intermediate tables —
    partitioned parquet an in-session index writes once and reads back
    partition-pruned (e.g. ShardedHNSW's per-shard vector/edge tables).

    Resolution order: ``spark.knowhere.spill.dir`` (set it to a
    cluster-visible path — HDFS/S3 — on a real deployment, where a
    driver-local tempdir would be unreadable from executors), else a
    process-local tempdir removed at interpreter exit.  Each call returns
    a unique subdirectory, so concurrent builds never collide.
    """
    import atexit
    import os
    import shutil
    import tempfile
    import uuid

    global _SPILL_ROOT
    root = None
    try:
        root = spark.conf.get("spark.knowhere.spill.dir", None)
    except Exception:
        root = None
    if not root:
        if _SPILL_ROOT is None:
            _SPILL_ROOT = tempfile.mkdtemp(prefix="knowhere_spark_spill_")
            atexit.register(shutil.rmtree, _SPILL_ROOT, ignore_errors=True)
        root = _SPILL_ROOT
    return os.path.join(root, f"{tag}_{uuid.uuid4().hex[:12]}")


def build_session(
    master: str | None = None,
    *,
    app_name: str = "knowhere-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """A SparkSession tuned for this engine's plan shapes.

    ``shuffle_partitions`` should track total executor cores (local runs)
    or 2-3x cores (clusters, letting AQE coalesce); defaults to Spark's
    AQE-managed behavior when unset.
    """
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    conf = {
        # runtime re-planning: partition coalescing, skew-join splitting,
        # plan switches at stage boundaries
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        # every custom kernel here is an Arrow-batched pandas UDF
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # probe lists / query sets / stats tables are small by contract
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # parquet scans: pushdown + pruning are load-bearing (see
        # tests/test_plan_quality.py)
        "spark.sql.parquet.filterPushdown": "true",
    }
    if shuffle_partitions:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.update(extra_conf or {})
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
