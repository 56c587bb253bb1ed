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
        """Cancel the build: abort the group's running Spark jobs.

        The builder thread sees a cancellation error from its next (or
        current) action; ``result()`` then raises
        :class:`BuildInterruptedError`."""
        self._interrupted = True
        self._spark.sparkContext.cancelJobGroup(self._group)

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
        if self._interrupted and self._result is None:
            raise BuildInterruptedError("index build interrupted")
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
