"""Reference-bindings facade: the knowhere Python API over the Spark engine.

Mirrors the surface of the reference's SWIG bindings
(python/knowhere/__init__.py + knowhere.i IndexWrap) so a user of the
reference can run the same call sequence unchanged:

    import numpy as np
    from knowhere_spark import compat as knowhere

    idx = knowhere.CreateIndex("IVF_FLAT", knowhere.GetCurrentVersion())
    idx.Build(knowhere.ArrayToDataSet(base),
              '{"metric_type": "L2", "nlist": 16}')
    dis, ids = idx.Search(knowhere.ArrayToDataSet(queries),
                          '{"metric_type": "L2", "k": 10, "nprobe": 8}',
                          knowhere.CreateBitSet(len(base)))

Conventions preserved from the reference:

- datasets are numpy arrays (``ArrayToDataSet``), float32 dense / uint8
  binary / CSR sparse (``ArrayToSparseDataSet``); query row i gets id i
  (knowhere.i:320-347).
- ``Search`` returns ``(dis, ids)`` shaped ``(nq, k)`` — float32 / int32,
  with missing slots padded ``-1`` id + unreachable distance, the heap
  padding of brute_force.cc:149-151 (DataSetToArray, __init__.py:107-114).
- ``RangeSearch`` returns per-query lists (RangeSearchDataSetToArray,
  __init__.py:116-147 — the CSR lims flattened the same way).
- bitset bit SET = row FILTERED OUT (bitsetview.h semantics).
- fp16/bf16 datasets build reduced-precision indexes via the dtype axis
  (``CreateIndex(..., type=np.float16)``), computing in fp32 exactly like
  the reference (operands.h:180-198).

Spark session: taken from ``SparkSession.getActiveSession()`` or built as
``local[*]`` on first use; override with :func:`set_session`.
"""

from __future__ import annotations

import json as _json
from dataclasses import dataclass, field

import numpy as np

_SESSION = None


def set_session(spark) -> None:
    """Pin the SparkSession the facade uses (optional)."""
    global _SESSION
    _SESSION = spark


def _spark():
    global _SESSION
    if _SESSION is not None:
        return _SESSION
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        s = (
            SparkSession.builder.master("local[*]")
            .appName("knowhere-compat")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    _SESSION = s
    return s


def GetCurrentVersion() -> int:
    from knowhere_spark.sources.index_store import CURRENT_INDEX_VERSION

    return CURRENT_INDEX_VERSION


# --- datasets ---------------------------------------------------------------

@dataclass
class DataSet:
    """Dense/binary/id dataset (ArrayToDataSet, __init__.py:72-94)."""

    tensor: np.ndarray | None = None     # (rows, dim) float32 / uint8 rows
    ids: np.ndarray | None = None        # 1-D id vector (GetVectorByIds arg)
    binary: bool = False

    @property
    def rows(self) -> int:
        if self.tensor is not None:
            return len(self.tensor)
        return len(self.ids)


@dataclass
class SparseDataSet:
    """CSR sparse dataset (ArrayToSparseDataSet, __init__.py:95-106)."""

    data: np.ndarray
    indices: np.ndarray
    indptr: np.ndarray

    @property
    def rows(self) -> int:
        return len(self.indptr) - 1


def ArrayToDataSet(arr: np.ndarray) -> DataSet:
    arr = np.asarray(arr)
    if arr.ndim == 1:
        return DataSet(ids=arr.astype(np.int64))
    if arr.ndim == 2:
        if arr.dtype == np.uint8:
            return DataSet(tensor=arr, binary=True)
        if arr.dtype in (np.float32, np.float16, np.float64):
            return DataSet(tensor=arr.astype(np.float32))
    raise ValueError(
        "ArrayToDataSet only supports numpy array dtype float32/float16 "
        "(dense), uint8 (binary), or 1-D ids"
    )


def ArrayToSparseDataSet(data, indices, indptr) -> SparseDataSet:
    data, indices, indptr = (np.asarray(x) for x in (data, indices, indptr))
    if data.ndim == 1 and indices.ndim == 1 and indptr.ndim == 1:
        assert data.shape[0] == indices.shape[0]
        assert indptr.shape[0] > 1
        return SparseDataSet(data, indices, indptr)
    raise ValueError("ArrayToSparseDataSet input type wrong.")


# --- bitset (bit set = filtered out; bitsetview.h) ---------------------------

class BitSet:
    def __init__(self, bits_num: int):
        self.bits_num = bits_num
        self._blocked: set[int] = set()

    def set(self, i: int) -> None:
        self._blocked.add(int(i))

    def count(self) -> int:
        return len(self._blocked)

    #: above this, Column.isin's literal list would become a
    #: multi-hundred-thousand-node Catalyst expression (slow analysis,
    #: driver OOM risk at the reference's ~half-the-base bitset sizes)
    _ISIN_LITERAL_MAX = 4096

    def filter_expr(self, id_col: str = "id"):
        """Spark predicate keeping UNfiltered rows (None when empty).

        ``id_col`` names the row-id column the index filters on — dense
        tables use ``id``, the sparse doc-stats frame uses ``doc_id``.
        Small sets compile to a native (codegen'd, pushdown-able)
        ``NOT isin``; corpus-scale sets switch to an Arrow-batched
        membership kernel over a BROADCAST id array — O(1) plan size and
        executor-side ``Series.isin`` (hash probe) per batch."""
        from pyspark.sql import functions as F

        if not self._blocked:
            return None
        blocked = sorted(self._blocked)
        if len(blocked) <= self._ISIN_LITERAL_MAX:
            return ~F.col(id_col).isin([int(i) for i in blocked])
        arr = np.asarray(blocked, dtype=np.int64)
        bc = _spark().sparkContext.broadcast(arr)

        def keep(s):
            # match isin's SQL NULL semantics: `~col.isin(...)` is NULL (row
            # filtered out) for a NULL id, but pandas `~Series.isin` on NaN is
            # True (row kept) — without the notna() mask the same bitset would
            # keep/drop NULL-id rows depending only on which side of the
            # literal threshold its size lands
            return ~s.isin(bc.value) & s.notna()

        # no type hints on the kernel: string hints break pandas_udf under
        # `from __future__ import annotations`
        return F.pandas_udf(keep, "boolean")(F.col(id_col))


def CreateBitSet(bits_num: int) -> BitSet:
    return BitSet(bits_num)


# --- converters: datasets <-> Spark DataFrames ------------------------------

def _dense_df(spark, ds: DataSet, id_col: str = "id", vec_col: str = "vec"):
    M = ds.tensor
    if ds.binary:
        rows = [(i, bytes(r)) for i, r in enumerate(M)]
        return spark.createDataFrame(rows, f"{id_col} long, {vec_col} binary")
    rows = [(i, [float(x) for x in r]) for i, r in enumerate(M)]
    return spark.createDataFrame(rows, f"{id_col} long, {vec_col} array<float>")


def _sparse_df(spark, ds: SparseDataSet, id_col: str = "id", vec_col: str = "vec"):
    rows = []
    for i in range(ds.rows):
        lo, hi = int(ds.indptr[i]), int(ds.indptr[i + 1])
        rows.append(
            (i, {str(int(t)): float(v)
                 for t, v in zip(ds.indices[lo:hi], ds.data[lo:hi])})
        )
    return spark.createDataFrame(rows, f"{id_col} long, {vec_col} map<string,float>")


def _to_range_lists(rows, nq: int):
    """Long-form (query_id, neighbor_id, distance) rows -> the reference's
    per-query lists (RangeSearchDataSetToArray, __init__.py:116-147)."""
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(int(r["query_id"]), []).append(
            (float(r["distance"]), int(r["neighbor_id"]))
        )
    dis_list, ids_list = [], []
    for qi in range(nq):
        hits = sorted(per_q.get(qi, []))
        dis_list.append(np.array([d for d, _ in hits], dtype=np.float32))
        ids_list.append(np.array([i for _, i in hits], dtype=np.int32))
    return dis_list, ids_list


def _to_knn_arrays(result_rows, nq: int, k: int, largest: bool):
    """Long-form (query_id, neighbor_id, distance, rank) -> the reference's
    (nq, k) arrays with -1 id + unreachable-distance padding."""
    pad = -np.inf if largest else np.inf
    dis = np.full((nq, k), pad, dtype=np.float32)
    ids = np.full((nq, k), -1, dtype=np.int32)
    for r in result_rows:
        q, rk = int(r["query_id"]), int(r["rank"]) - 1
        if 0 <= rk < k:
            ids[q, rk] = int(r["neighbor_id"])
            dis[q, rk] = float(r["distance"])
    return dis, ids


# --- the IndexWrap analog -----------------------------------------------------

#: numpy dtype name -> engine storage-axis VecType (None = native fp32 /
#: binary path); unknown dtypes raise in CreateIndex rather than silently
#: degrading to full precision
_DTYPE_TO_VECTYPE = {
    "float32": None,
    "float64": None,
    "float16": "FP16",
    "bfloat16": "BF16",
    "int8": "INT8",
    "uint8": None,          # binary path (BIN_* indexes)
}


class IndexWrap:
    """knowhere.i IndexWrap: Build/Search/RangeSearch/GetVectorByIds/
    Serialize/Deserialize/Count/Dim/HasRawData over the Spark engine."""

    def __init__(self, name: str, version: int | None = None, dtype: str = "float32"):
        self.name = str(name).upper()
        self.version = version
        self.dtype = dtype
        self._index = None
        self._dim: int | None = None
        self._metric: str | None = None

    # -- Build (knowhere.i:169-186) ------------------------------------------
    def Build(self, dataset, json: str) -> None:
        from knowhere_spark.factory import create_index

        params = _json.loads(json) if isinstance(json, str) else dict(json)
        self._metric = params.get("metric_type", "L2")
        spark = _spark()
        if isinstance(dataset, SparseDataSet):
            df = _sparse_df(spark, dataset)
            self._dim = int(dataset.indices.max()) + 1 if len(dataset.indices) else 0
        else:
            df = _dense_df(spark, dataset)
            self._dim = (
                dataset.tensor.shape[1] * (8 if dataset.binary else 1)
            )
        self._binary = (not isinstance(dataset, SparseDataSet)) and dataset.binary
        dtype = _DTYPE_TO_VECTYPE.get(self.dtype)
        handle = create_index(self.name, params, dtype=dtype)
        self._index = handle.build(df)

    # -- Search (knowhere.i:187-215) -------------------------------------------
    def Search(self, dataset, json: str, bitset: BitSet | None = None):
        from knowhere_spark.config import MetricType

        params = _json.loads(json) if isinstance(json, str) else dict(json)
        k = int(params.get("k", 10))
        spark = _spark()
        sparse = isinstance(dataset, SparseDataSet)
        if sparse:
            q = _sparse_df(spark, dataset, id_col="query_id")
        else:
            q = _dense_df(spark, dataset, id_col="query_id")
        kw = {}
        if "nprobe" in params:
            kw["nprobe"] = int(params["nprobe"])
        if "ef" in params and hasattr(self._index, "config") and hasattr(
            self._index.config, "ef"
        ):
            kw["ef"] = int(params["ef"])
        # the sparse engine filters its (doc_id, doc_len) stats frame
        fe = (
            bitset.filter_expr("doc_id" if sparse else "id")
            if bitset is not None else None
        )
        if fe is not None:
            kw["filter_expr"] = fe
        out = self._index.search(q, k, **kw)
        if "doc_id" in out.columns:   # sparse shape: (query_id, doc_id, score)
            from pyspark.sql import functions as F

            out = out.select(
                "query_id",
                F.col("doc_id").alias("neighbor_id"),
                F.col("score").alias("distance"),
                "rank",
            )
        metric = MetricType(params.get("metric_type", self._metric or "L2"))
        return _to_knn_arrays(
            out.select("query_id", "neighbor_id", "distance", "rank").collect(),
            dataset.rows, k, metric.is_similarity,
        )

    # -- RangeSearch (knowhere.i:216-228) ---------------------------------------
    def RangeSearch(self, dataset, json: str, bitset: BitSet | None = None):
        import dataclasses

        params = _json.loads(json) if isinstance(json, str) else dict(json)
        spark = _spark()
        sparse = isinstance(dataset, SparseDataSet)
        if sparse:
            q = _sparse_df(spark, dataset, id_col="query_id")
        else:
            q = _dense_df(spark, dataset, id_col="query_id")
        cfg = dataclasses.replace(
            self._index.config,
            radius=float(params.get("radius", 0.0)),
            # ABSENT must stay None: range_bounds uses range_filter as the
            # LOWER bound for distance metrics (lo=0 when None), so a
            # +inf default would turn "radius only" into an empty range
            range_filter=(
                float(params["range_filter"])
                if params.get("range_filter") is not None else None
            ),
        )
        kw = {}
        fe = (
            bitset.filter_expr("doc_id" if sparse else "id")
            if bitset is not None else None
        )
        if fe is not None:
            kw["filter_expr"] = fe
        # per-call radius: some classes take the config positionally
        # (HNSW/sparse), others read self.config (FLAT/IVF) — swap-restore
        # on the UNWRAPPED index covers the latter (a TypedIndex wrapper
        # has no __setattr__ delegation; assigning through it would only
        # shadow the inner config)
        try:
            out = self._index.range_search(q, cfg, **kw)
        except TypeError:
            target = getattr(self._index, "inner", self._index)
            old_cfg = target.config
            try:
                target.config = cfg
                out = self._index.range_search(q, **kw)
            finally:
                target.config = old_cfg
        if "doc_id" in out.columns:   # sparse shape
            from pyspark.sql import functions as F

            out = out.select(
                "query_id",
                F.col("doc_id").alias("neighbor_id"),
                F.col("score").alias("distance"),
            )
        rows = out.select("query_id", "neighbor_id", "distance").collect()
        return _to_range_lists(rows, dataset.rows)

    # -- GetVectorByIds (knowhere.i:229-241) -------------------------------------
    def GetVectorByIds(self, dataset: DataSet) -> np.ndarray:
        spark = _spark()
        ids_df = spark.createDataFrame(
            [(int(i),) for i in dataset.ids], "id long"
        )
        rows = self._index.get_vector_by_ids(ids_df).collect()
        by_id = {int(r["id"]): r["vec"] for r in rows}
        ordered = [by_id[int(i)] for i in dataset.ids]
        if getattr(self, "_binary", False):
            # binary index: raw vectors are packed bytes -> uint8 rows
            # (GetBinaryVectorDataSetToArray, __init__.py:172-177); dtype
            # dispatch is by the INDEX, not the first element, so an
            # empty request still returns a (0, dim/8) uint8 matrix
            if not ordered:
                return np.zeros((0, (self._dim or 0) // 8), dtype=np.uint8)
            return np.stack(
                [np.frombuffer(bytes(v), dtype=np.uint8) for v in ordered]
            )
        if not ordered:
            return np.zeros((0, self._dim or 0), dtype=np.float32)
        return np.array(ordered, dtype=np.float32)

    # -- persistence (knowhere.i:248-264; paths instead of BinarySet blobs) ------
    def Serialize(self, path: str) -> None:
        self._index.save(path)

    def Deserialize(self, path: str, json: str = "{}") -> None:
        from knowhere_spark.factory import load_index
        from knowhere_spark.sources.index_store import IndexStore

        self._index = load_index(_spark(), path)
        # restore the wrapper state the reference's deserialized IndexWrap
        # keeps: without it Dim() returns -1, a Search whose query JSON
        # omits metric_type silently falls back to L2 on an IP/COSINE
        # index, and GetVectorByIds on a BIN_* index takes the float
        # branch (returning bytes as float32 rows)
        m = IndexStore(path).read_manifest()
        index_type = str(m.get("index_type", self.name or ""))
        self.name = index_type or self.name
        self._binary = index_type.startswith("BIN_")
        if m.get("metric_type") is not None:
            self._metric = str(m["metric_type"])
        if m.get("dim") is not None:
            self._dim = int(m["dim"])
        elif hasattr(self._index, "dim"):
            self._dim = int(self._index.dim())
        else:
            # FLAT/BIN_FLAT manifests carry no dim and the index has no
            # dim() — probe one stored row (dim is in BITS for binary,
            # the reference contract)
            base = getattr(self._index, "base", None)
            r = base.select("vec").first() if base is not None else None
            if r is not None:
                v = r["vec"]
                self._dim = (
                    len(bytes(v)) * 8 if isinstance(v, (bytes, bytearray)) else len(v)
                )

    DeserializeFromFile = Deserialize

    # -- introspection (knowhere.i:242-278) ---------------------------------------
    def Dim(self) -> int:
        return int(self._dim or -1)

    def Count(self) -> int:
        return int(self._index.count())

    def HasRawData(self, metric_type: str = "L2") -> bool:
        fn = getattr(self._index, "has_raw_data", None)
        return bool(fn()) if fn is not None else False


def CreateIndex(name: str, version: int | None = None, type=np.float32) -> IndexWrap:
    """__init__.py:13-21 — dtype selects the storage precision axis.

    ``type`` accepts numpy dtypes and the strings "bfloat16"/"bf16" (numpy
    has no bfloat16; the reference uses an external package for it)."""
    if isinstance(type, str) and type.lower() in ("bfloat16", "bf16"):
        dtype = "bfloat16"
    else:
        dtype = np.dtype(type).name
    if dtype not in _DTYPE_TO_VECTYPE:
        raise ValueError(
            f"CreateIndex: unsupported dtype {dtype!r} "
            f"(supported: {sorted(_DTYPE_TO_VECTYPE)})"
        )
    return IndexWrap(name, version, dtype=dtype)


# --- index-less statics (__init__.py:23-42) -----------------------------------

def BruteForceSearch(type, base: DataSet, queries: DataSet, json: str,
                     bitset: BitSet | None = None):
    from knowhere_spark.config import MetricType
    from knowhere_spark.operators.brute_force import BruteForce

    params = _json.loads(json) if isinstance(json, str) else dict(json)
    k = int(params.get("k", 10))
    metric = MetricType(params.get("metric_type", "L2"))
    spark = _spark()
    b = _dense_df(spark, base)
    q = _dense_df(spark, queries, id_col="query_id")
    fe = bitset.filter_expr("id") if bitset is not None else None
    out = BruteForce.search(b, q, k, metric, filter_expr=fe)
    return _to_knn_arrays(
        out.select("query_id", "neighbor_id", "distance", "rank").collect(),
        queries.rows, k, metric.is_similarity,
    )


def GetNullDataSet() -> DataSet:
    return DataSet(tensor=np.zeros((0, 0), dtype=np.float32))


def GetNullBitSetView() -> None:
    """The reference's empty bitset — our search paths take None."""
    return None


def DataSetToArray(ans) -> tuple[np.ndarray, np.ndarray]:
    """Identity passthrough: ``Search`` already returns (dis, ids) numpy
    arrays (the SWIG layer needed an explicit copy-out; we don't)."""
    return ans


def RangeSearchDataSetToArray(ans):
    """Identity passthrough for ``RangeSearch`` results (per-query lists)."""
    return ans


def GetVectorDataSetToArray(ans) -> np.ndarray:
    """Identity passthrough for ``GetVectorByIds`` results."""
    return ans


def Load(index: IndexWrap, file_name: str) -> IndexWrap:
    """BinarySet file load (__init__.py:52-54) — path-based here."""
    index.Deserialize(file_name)
    return index


def Dump(index: IndexWrap, file_name: str) -> None:
    """BinarySet file dump (__init__.py:56-58) — path-based here."""
    index.Serialize(file_name)


def ArrayToBinary(arr: np.ndarray) -> DataSet:
    """Binary DataSet from packed uint8 rows (__init__.py:63-71 — the
    reference's Array2Binary; here the binary DataSet IS the uint8
    tensor, so this is ArrayToDataSet with the dtype check enforced)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("ArrayToBinary only support numpy array dtype uint8.")
    return DataSet(tensor=arr, binary=True)


def WriteIndexToDisk(index: "IndexWrap", index_type: str, data_path: str) -> None:
    """Persist a built index to a disk layout (__init__.py:60-61) —
    parquet-directory form of the reference's BinarySet spill; the
    ``index_type`` argument is validated against the handle."""
    if index_type and index.name != str(index_type).upper():
        raise ValueError(
            f"index_type {index_type!r} does not match the handle's {index.name!r}"
        )
    index.Serialize(data_path)


def GetFloat16VectorDataSetToArray(ans) -> np.ndarray:
    """GetVectorByIds output at the fp16 storage tier (__init__.py:156-163):
    the engine computes in fp32 (exact widening, functions/dtype.py) and
    the facade narrows back to the caller's dtype."""
    return np.asarray(ans, dtype=np.float32).astype(np.float16)


def GetBFloat16VectorDataSetToArray(ans) -> np.ndarray:
    """bf16 twin of :func:`GetFloat16VectorDataSetToArray`
    (__init__.py:164-171).  numpy has no bfloat16: the round-trip through
    the engine's byte-exact bf16 encode (functions/dtype.bf16_round) is
    returned as the nearest-fp32 values, the same numerics the reference
    hands back after its bfloat16 cast."""
    from knowhere_spark.functions.dtype import _bf16_round

    return _bf16_round(np.asarray(ans, dtype=np.float32))


def GetBinaryVectorDataSetToArray(ans) -> np.ndarray:
    """GetVectorByIds output for binary indexes (__init__.py:172-178):
    rows of packed uint8 bytes (dim/8 per row)."""
    a = np.asarray(ans)
    if a.dtype != np.uint8:
        a = a.astype(np.uint8)
    return a


def SetSimdType(type) -> None:
    """No-op: SIMD dispatch belongs to numpy/JVM codegen in this engine."""


def SetBuildThreadPool(num_threads: int) -> None:
    """No-op: build parallelism is Spark's executor configuration."""


def SetSearchThreadPool(num_threads: int) -> None:
    """No-op: search parallelism is Spark's executor configuration."""


def BruteForceRangeSearch(type, base: DataSet, queries: DataSet, json: str,
                          bitset: BitSet | None = None):
    from knowhere_spark.config import BaseConfig
    from knowhere_spark.operators.brute_force import BruteForce

    params = _json.loads(json) if isinstance(json, str) else dict(json)
    spark = _spark()
    b = _dense_df(spark, base)
    q = _dense_df(spark, queries, id_col="query_id")
    cfg = BaseConfig(
        metric_type=params.get("metric_type", "L2"),
        radius=float(params.get("radius", 0.0)),
        range_filter=(
            float(params["range_filter"])
            if params.get("range_filter") is not None else None
        ),
    )
    fe = bitset.filter_expr("id") if bitset is not None else None
    out = BruteForce.range_search(b, q, cfg, filter_expr=fe)
    rows = out.select("query_id", "neighbor_id", "distance").collect()
    return _to_range_lists(rows, queries.rows)
