"""knowhere_spark — a PySpark-native vector-analytics engine.

Re-expresses the query/data-processing capabilities of the reference
vector-search core (zilliztech/Knowhere, see SURVEY.md) as idiomatic
PySpark: DataFrame/SQL logical plans that Catalyst optimizes, with
Arrow-batched pandas-UDF kernels only where built-in operators cannot
express the semantics (GEMM distance kernels, quantized scans).

Public surface (mirrors the reference verbs, index_node.h:39-441):

- :mod:`knowhere_spark.config` — typed per-index configs + validation
  (reference: include/knowhere/config.h).
- :class:`knowhere_spark.operators.brute_force.BruteForce` — exact
  Search / RangeSearch / GetVectorByIds (reference:
  src/common/comp/brute_force.cc).
- :func:`knowhere_spark.factory.create_index` — Build/Train/Add/
  Search/RangeSearch over FLAT, IVF_*, SCANN, SPARSE_* families
  (reference: src/index/index_factory.cc).
- :mod:`knowhere_spark.operators.dedup` / ``text`` / ``similarity`` —
  the large-scale training-data-pipeline extensions (dedup, language
  id, quality scoring, ANN over embedding columns).
"""

from knowhere_spark.config import IndexType, MetricType

__all__ = ["IndexType", "MetricType"]
__version__ = "0.1.0"
