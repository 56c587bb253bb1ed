"""BuildAsync + Interrupt (index.cc:62-71, include/knowhere/index/interrupt.h).

The reference builds an index on a thread pool and exposes an interrupt
handle; the Spark-native mapping is a build thread tagged with a *job
group* — Spark's own cancellation scope: every job submitted from the
thread inherits the group, and ``SparkContext.cancelJobGroup`` aborts its
running stages.  The handle mirrors the reference's future semantics:
``result()`` blocks (with optional timeout), ``done()`` polls,
``interrupt()`` cancels the in-flight Spark jobs and fails the future.
"""

from __future__ import annotations

import threading
import uuid
from typing import Any, Callable


class BuildInterruptedError(RuntimeError):
    """Build was cancelled via :meth:`AsyncBuildHandle.interrupt`."""


class AsyncBuildHandle:
    """Future-like handle for an in-flight index build."""

    def __init__(self, spark, fn: Callable[[], Any]):
        self._spark = spark
        self._group = f"knowhere-build-{uuid.uuid4().hex[:12]}"
        self._result: Any = None
        self._error: BaseException | None = None
        self._interrupted = False
        self._done = threading.Event()

        def _run():
            sc = spark.sparkContext
            # job-group tagging is thread-local in Spark: every job this
            # thread submits joins the cancellable group
            sc.setJobGroup(self._group, "knowhere_spark async index build",
                           interruptOnCancel=True)
            try:
                self._result = fn()
            except BaseException as exc:  # noqa: BLE001 — surfaced via result()
                self._error = exc
            finally:
                try:
                    sc.setJobGroup("", "")
                except Exception:
                    pass
                self._done.set()

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()

    def done(self) -> bool:
        return self._done.is_set()

    def interrupt(self) -> None:
        """Cancel the build: abort the group's running AND future Spark
        jobs.  ``cancelJobGroup`` alone only kills jobs active at that
        instant — a multi-job build interrupted in a driver-side gap
        between jobs would otherwise run to completion — so the
        future-jobs variant (Spark >= 3.5) is load-bearing here.

        The builder thread sees a cancellation error from its next (or
        current) action; ``result()`` then raises
        :class:`BuildInterruptedError`.  Interrupting after the build
        already completed is a no-op (future semantics).  Scope caveat:
        cancellation aborts the build's SPARK work; a build phase that is
        pure driver-side compute (e.g. an in-memory graph construction
        over an already-collected sample) is not preemptible and, if it
        needs no further Spark action, the build may still complete —
        mirroring the reference, where Interrupt is only observed at the
        build loop's check points (interrupt.h)."""
        self._interrupted = True
        sc = self._spark.sparkContext
        cancel = getattr(sc, "cancelJobGroupAndFutureJobs", None)
        if cancel is not None:
            cancel(self._group)
            return
        # the PySpark wrapper lags the JVM API here (present on the Scala
        # SparkContext since 3.5 but unexposed in some PySpark versions,
        # including 4.1): call through to the JVM, falling back to
        # active-jobs-only cancellation as a last resort
        try:
            sc._jsc.sc().cancelJobGroupAndFutureJobs(self._group)
        except Exception:  # pragma: no cover — very old Spark
            sc.cancelJobGroup(self._group)

    def result(self, timeout: float | None = None):
        """The built index; blocks until the build finishes.

        Raises :class:`BuildInterruptedError` after :meth:`interrupt`,
        ``TimeoutError`` if ``timeout`` elapses, or the build's own error.
        """
        if not self._done.wait(timeout):
            raise TimeoutError(
                f"index build still running after {timeout}s "
                f"(interrupt() to cancel)"
            )
        if self._error is not None:
            if self._interrupted:
                raise BuildInterruptedError(
                    "index build interrupted"
                ) from self._error
            raise self._error
        # no error: the build completed — a racing interrupt() after
        # completion is a no-op, and a legitimately-None builder result
        # must NOT read as "interrupted"
        return self._result


def build_async(
    base_df,
    index_type,
    params: dict | None = None,
    *,
    dtype=None,
    **kw,
) -> AsyncBuildHandle:
    """``BuildAsync``: validate eagerly (config errors surface HERE, like
    the reference's Create step), then run Train+Add on a cancellable
    build thread."""
    from knowhere_spark.factory import create_index

    handle_cfg = create_index(index_type, params, dtype=dtype)
    spark = base_df.sparkSession
    return AsyncBuildHandle(spark, lambda: handle_cfg.build(base_df, **kw))
