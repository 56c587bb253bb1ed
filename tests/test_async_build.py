"""BuildAsync + Interrupt (plans/async_build.py; reference index.cc:62-71)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from knowhere_spark.config import ConfigError
from knowhere_spark.plans.async_build import (
    AsyncBuildHandle,
    BuildInterruptedError,
    build_async,
)

from conftest import dense_df, gen_dense


def test_async_build_completes_and_searches(spark):
    base = dense_df(spark, gen_dense(300, 16, seed=41))
    h = build_async(base, "IVF_FLAT", {"metric_type": "L2", "nlist": 4, "nprobe": 4, "k": 5})
    idx = h.result(timeout=120)
    assert h.done()
    q = base.select(F.col("id").alias("query_id"), "vec").limit(3)
    assert idx.search(q, k=5).count() == 15


def test_async_build_config_errors_are_eager(spark):
    base = dense_df(spark, gen_dense(10, 8, seed=42))
    # Create-step validation fires synchronously, like the reference
    with pytest.raises(ConfigError):
        build_async(base, "IVF_FLAT", {"metric_type": "L2", "nlist": -3})


def test_async_build_timeout_then_completion(spark):
    base = dense_df(spark, gen_dense(2000, 32, seed=43))
    h = build_async(base, "IVF_FLAT", {"metric_type": "L2", "nlist": 16, "nprobe": 4})
    with pytest.raises(TimeoutError):
        h.result(timeout=0.001)
    idx = h.result(timeout=180)
    assert idx.count() == 2000


def test_interrupt_cancels_running_build(spark):
    # a build big enough to still be running when we cancel: HNSW over an
    # expanded corpus (graph construction is the slowest build here)
    base = dense_df(spark, gen_dense(1500, 32, seed=44)).crossJoin(
        spark.range(8).withColumnRenamed("id", "rep")
    ).select(
        (F.col("id") + F.col("rep") * 1_000_000).alias("id"),
        "vec",
    )
    h = build_async(base, "HNSW", {"metric_type": "L2", "M": 8, "ef": 16})
    time.sleep(1.0)                  # let the build submit real Spark jobs
    h.interrupt()
    with pytest.raises(BuildInterruptedError):
        h.result(timeout=120)
    assert h.done()


def test_interrupted_group_does_not_leak_to_session(spark):
    # after an interrupt, ordinary queries on the same session still run
    base = dense_df(spark, gen_dense(100, 8, seed=45))
    h = build_async(base, "IVF_FLAT", {"metric_type": "L2", "nlist": 4})
    h.result(timeout=120)
    assert spark.range(10).count() == 10


def test_handle_wraps_arbitrary_builder(spark):
    h = AsyncBuildHandle(spark, lambda: spark.range(100).count())
    assert h.result(timeout=60) == 100
