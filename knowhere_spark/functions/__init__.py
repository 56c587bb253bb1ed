"""Scalar/vector function layer: the Spark analog of the reference's
SIMD-dispatched distance kernels (src/simd/hook.h:21-99).

Dense metrics are built from native higher-order SQL functions (JVM-side,
whole-stage-codegen'd); binary metrics use Arrow-batched pandas UDFs over
``BinaryType``; GEMM batch kernels (numpy) back the ``mapInPandas`` fast
path — the Spark equivalent of the reference's BLAS-threshold batching
(include/knowhere/comp/knowhere_config.h:54-63: always take the GEMM path).
"""

from knowhere_spark.functions.distance import (
    cosine_expr,
    distance_expr,
    ip_expr,
    l2_sqr_expr,
    norm_expr,
    normalize_expr,
)

__all__ = [
    "cosine_expr",
    "distance_expr",
    "ip_expr",
    "l2_sqr_expr",
    "norm_expr",
    "normalize_expr",
]
