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


def test_interrupt_cancels_running_spark_work(spark):
    """Cancellation must abort a handle whose work is a genuinely
    long-running Spark job (an index build's Spark phases behave the
    same; driver-side-only phases are documented as non-preemptible)."""
    def long_job():
        # tens of seconds of codegen'd aggregation on local[4]
        # (id % 7: per-row work with no ANSI overflow, unlike id * id)
        return spark.range(200_000_000_000).selectExpr("sum(id % 7)").collect()

    h = AsyncBuildHandle(spark, long_job)
    time.sleep(1.5)                  # the job is definitely in flight
    assert not h.done()
    h.interrupt()
    with pytest.raises(BuildInterruptedError):
        h.result(timeout=60)
    assert h.done()


def test_interrupt_between_jobs_cancels_future_jobs(spark):
    """A multi-job build interrupted in a driver-side gap must NOT run its
    remaining Spark jobs to completion — the future-jobs cancellation
    (cancelJobGroupAndFutureJobs) covers the gap."""
    import threading

    gap = threading.Event()
    resume = threading.Event()

    def two_phase_build():
        spark.range(1000).count()        # job 1 completes
        gap.set()
        resume.wait(timeout=30)          # interrupt() fires in this gap
        return spark.range(1_000_000).count()   # job 2 must be cancelled

    h = AsyncBuildHandle(spark, two_phase_build)
    assert gap.wait(timeout=30)
    h.interrupt()
    resume.set()
    with pytest.raises(BuildInterruptedError):
        h.result(timeout=60)


def test_interrupted_group_does_not_leak_to_session(spark):
    # after an interrupt, ordinary queries on the same session still run
    base = dense_df(spark, gen_dense(100, 8, seed=45))
    h = build_async(base, "IVF_FLAT", {"metric_type": "L2", "nlist": 4})
    h.result(timeout=120)
    assert spark.range(10).count() == 10


def test_handle_wraps_arbitrary_builder(spark):
    h = AsyncBuildHandle(spark, lambda: spark.range(100).count())
    assert h.result(timeout=60) == 100
