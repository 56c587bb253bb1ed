"""Typed config layer mirroring the reference's declarative config system.

Reference: ``include/knowhere/config.h:585-762`` (BaseConfig fields with
defaults/ranges), per-index ``CheckAndAdjust`` hooks (e.g. IVF_PQ requires
``dim % m == 0``, src/index/ivf/ivf_config.h:78-98; HNSW forces ``ef >= k``,
src/index/hnsw/base_hnsw_config.h:55-79), metric enum
``include/knowhere/comp/index_param.h:185-194`` and index-type names
``index_param.h:27-66``.

The reference validates a JSON config per-stage (TRAIN / SEARCH /
RANGE_SEARCH, config.h:90-100); here each stage maps to keyword-validated
dataclasses.  Invalid parameters raise :class:`ConfigError` — matching the
reference's strictness corpus (tests/ut/test_config.cc).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from enum import Enum


class ConfigError(ValueError):
    """Raised when a config value is out of range or inconsistent.

    Analog of ``Status::invalid_args`` / ``Status::out_of_range_in_json``
    (include/knowhere/expected.h).
    """


class MetricType(str, Enum):
    """Distance/score metrics (include/knowhere/comp/index_param.h:185-194)."""

    L2 = "L2"                       # squared euclidean; smaller = closer
    IP = "IP"                       # inner product; larger = closer
    COSINE = "COSINE"               # cosine similarity; larger = closer
    HAMMING = "HAMMING"             # binary; smaller = closer
    JACCARD = "JACCARD"             # binary distance 1-|and|/|or|; smaller = closer
    SUBSTRUCTURE = "SUBSTRUCTURE"   # binary containment (query ⊆ base)
    SUPERSTRUCTURE = "SUPERSTRUCTURE"  # binary containment (base ⊆ query)
    BM25 = "BM25"                   # sparse; larger = closer

    @property
    def is_similarity(self) -> bool:
        """True when larger score means closer (IP/COSINE/BM25).

        Reference: ``IsMetricType`` similarity handling in
        src/common/comp/brute_force.cc:180-211 and range direction flip
        include/knowhere/range_util.h:22-25.
        """
        return self in (MetricType.IP, MetricType.COSINE, MetricType.BM25)

    @property
    def is_binary(self) -> bool:
        return self in (
            MetricType.HAMMING,
            MetricType.JACCARD,
            MetricType.SUBSTRUCTURE,
            MetricType.SUPERSTRUCTURE,
        )


class VecType(str, Enum):
    """Vector element types (enum VecType,
    include/knowhere/comp/index_param.h:196-203).  Compute is fp32 for
    every reduced-precision dtype — the reference's own contract
    (``MockData`` promotes fp16/bf16/int8 to fp32, operands.h:180-198);
    the dtype axis here gates index compatibility (operands.h:149-175
    typeCheck) and documents the storage intent."""

    FP32 = "FP32"
    FP16 = "FP16"
    BF16 = "BF16"
    INT8 = "INT8"
    BIN1 = "BIN1"             # packed binary
    SPARSE_FP32 = "SPARSE_FP32"


class IndexType(str, Enum):
    """Index factory names (include/knowhere/comp/index_param.h:27-66)."""

    FLAT = "FLAT"
    BIN_FLAT = "BIN_FLAT"
    IVF_FLAT = "IVF_FLAT"
    IVF_SQ8 = "IVF_SQ8"
    IVF_PQ = "IVF_PQ"
    SCANN = "SCANN"
    BIN_IVF_FLAT = "BIN_IVF_FLAT"
    HNSW = "HNSW"
    # quantized HNSW variants (faiss_hnsw.cc registrations 2918-2939):
    # graph rides the fp32 build; beam scoring runs on SQ/PQ/PRQ codes
    # with optional exact refine (operators/hnsw_quant.py)
    HNSW_SQ = "HNSW_SQ"
    HNSW_PQ = "HNSW_PQ"
    HNSW_PRQ = "HNSW_PRQ"
    # engine extension (not in the reference): segment architecture over
    # per-shard HNSW graphs (operators/hnsw_sharded.py)
    SHARDED_HNSW = "SHARDED_HNSW"
    DISKANN = "DISKANN"
    SPARSE_INVERTED_INDEX = "SPARSE_INVERTED_INDEX"
    SPARSE_WAND = "SPARSE_WAND"
    KMEANS = "KMEANS"


#: metric compatibility per index family (feature flags,
#: include/knowhere/feature.h:21-31 + per-index registrations).
_DENSE_METRICS = frozenset({MetricType.L2, MetricType.IP, MetricType.COSINE})
_BINARY_METRICS = frozenset(
    {MetricType.HAMMING, MetricType.JACCARD, MetricType.SUBSTRUCTURE, MetricType.SUPERSTRUCTURE}
)
_SPARSE_METRICS = frozenset({MetricType.IP, MetricType.BM25})

SUPPORTED_METRICS: dict[IndexType, frozenset[MetricType]] = {
    IndexType.FLAT: _DENSE_METRICS,
    IndexType.BIN_FLAT: _BINARY_METRICS,
    IndexType.IVF_FLAT: _DENSE_METRICS,
    IndexType.IVF_SQ8: _DENSE_METRICS,
    IndexType.IVF_PQ: _DENSE_METRICS,
    IndexType.SCANN: _DENSE_METRICS,
    IndexType.BIN_IVF_FLAT: frozenset({MetricType.HAMMING, MetricType.JACCARD}),
    IndexType.HNSW: _DENSE_METRICS,
    IndexType.SHARDED_HNSW: _DENSE_METRICS,
    IndexType.HNSW_SQ: _DENSE_METRICS,
    IndexType.HNSW_PQ: _DENSE_METRICS,
    IndexType.HNSW_PRQ: _DENSE_METRICS,
    IndexType.DISKANN: _DENSE_METRICS,
    IndexType.SPARSE_INVERTED_INDEX: _SPARSE_METRICS,
    IndexType.SPARSE_WAND: _SPARSE_METRICS,
    IndexType.KMEANS: frozenset({MetricType.L2}),
}


def _check_range(name: str, value, lo, hi) -> None:
    if value is None or not (lo <= value <= hi):
        raise ConfigError(f"param '{name}'={value!r} out of range [{lo}, {hi}]")


@dataclass
class BaseConfig:
    """Common search-time params (include/knowhere/config.h:585-678)."""

    metric_type: MetricType = MetricType.L2
    k: int = 10                      # config.h 'k' default 10, range [1, 10000]
    radius: float = 0.0              # range-search bound (config.h:661-664)
    range_filter: float | None = None  # inner bound, default +inf (config.h:665-669)
    range_search_k: int = -1         # optional per-query truncation, -1 = all

    def __post_init__(self) -> None:
        if isinstance(self.metric_type, str) and not isinstance(self.metric_type, MetricType):
            try:
                self.metric_type = MetricType(self.metric_type.upper())
            except ValueError as exc:
                raise ConfigError(f"unknown metric_type {self.metric_type!r}") from exc
        self.check_and_adjust()

    def check_and_adjust(self) -> None:
        _check_range("k", self.k, 1, 10_000)
        if self.range_search_k < -1:
            raise ConfigError(f"range_search_k={self.range_search_k} must be >= -1")

    def validate_for(self, index_type: IndexType) -> None:
        allowed = SUPPORTED_METRICS[index_type]
        if self.metric_type not in allowed:
            raise ConfigError(
                f"metric {self.metric_type.value} not supported by {index_type.value} "
                f"(allowed: {sorted(m.value for m in allowed)})"
            )

    def range_bounds(self) -> tuple[float, float, bool]:
        """Return (lo, hi, similarity) half-open range semantics.

        L2-like: ``range_filter <= d < radius``; similarity metrics
        (IP/COSINE/BM25): ``radius < d <= range_filter``
        (include/knowhere/range_util.h:22-25).
        """
        sim = self.metric_type.is_similarity
        if sim:
            hi = self.range_filter if self.range_filter is not None else float("inf")
            return self.radius, hi, True
        lo = self.range_filter if self.range_filter is not None else 0.0
        return lo, self.radius, False


@dataclass
class FlatConfig(BaseConfig):
    """FLAT / BIN_FLAT: no build-time params (src/index/flat/flat.cc:398-414)."""


@dataclass
class IvfConfig(BaseConfig):
    """IVF family (src/index/ivf/ivf_config.h:21-51)."""

    nlist: int = 128
    nprobe: int = 8
    ensure_topk_full: bool = False   # probe-all w/ cap (ivf.cc:753-762)
    use_elkan: bool = True           # train-time kmeans variant (ivf_config.h:38-41)
    seed: int = 42                   # Spark-side determinism knob (not in reference)

    def check_and_adjust(self) -> None:
        super().check_and_adjust()
        _check_range("nlist", self.nlist, 1, 65_536)
        _check_range("nprobe", self.nprobe, 1, 65_536)
        # reference clamps nprobe <= nlist at search (ivf.cc MatchNprobe)
        if self.nprobe > self.nlist:
            self.nprobe = self.nlist

    def match_nlist(self, rows: int) -> int:
        """Auto-shrink nlist for tiny datasets (``MatchNlist``, ivf.cc)."""
        return max(1, min(self.nlist, rows))


@dataclass
class IvfSq8Config(IvfConfig):
    """IVF_SQ8: 8-bit scalar quantization (ivf.cc:587-606)."""

    code_size: int = 8

    def check_and_adjust(self) -> None:
        super().check_and_adjust()
        if self.code_size not in (4, 6, 8, 16):
            raise ConfigError(f"code_size={self.code_size} must be one of 4/6/8/16")


@dataclass
class IvfPqConfig(IvfConfig):
    """IVF_PQ: product quantization (ivf_config.h:68-98).

    ``refine_k > 0`` re-ranks the ADC top-``refine_k`` candidates by exact
    distance — the reference's answer to ADC error (SCANN ``reorder_k``,
    ivf_config.h:101-115; iterator ``refine_ratio``, index_node.h:527-570).
    Requires ``with_raw_data`` (refine needs the raw vectors)."""

    m: int = 4          # subquantizer count
    nbits: int = 8
    refine_k: int = 0   # 0 = no refine; else exact re-rank of top-refine_k
    with_raw_data: bool = False

    def check_and_adjust(self) -> None:
        super().check_and_adjust()
        _check_range("nbits", self.nbits, 1, 16)
        _check_range("m", self.m, 1, 65_536)
        if self.refine_k:
            if self.refine_k < self.k:
                raise ConfigError(
                    f"refine_k={self.refine_k} must be >= k={self.k} (or 0)"
                )
            if not self.with_raw_data:
                raise ConfigError("refine_k requires with_raw_data=True")

    def validate_dim(self, dim: int) -> None:
        # ivf_config.h:78-98 — dim must be divisible by m
        if dim % self.m != 0:
            raise ConfigError(f"dim={dim} not divisible by m={self.m} (IVF_PQ requirement)")


@dataclass
class ScannConfig(IvfConfig):
    """SCANN: quantize-then-refine (ivf_config.h:101-162)."""

    reorder_k: int = -1        # -1 → default to k; must be >= k
    with_raw_data: bool = True

    def check_and_adjust(self) -> None:
        super().check_and_adjust()
        if self.reorder_k == -1:
            self.reorder_k = self.k
        if self.reorder_k < self.k:
            raise ConfigError(f"reorder_k={self.reorder_k} must be >= k={self.k}")


@dataclass
class HnswConfig(BaseConfig):
    """HNSW (src/index/hnsw/base_hnsw_config.h:34-79).

    Serving-side graph traversal is not Spark-shaped; this config is kept
    for parity (build-side artifact + config validation). ``ef`` is
    adjusted to ``>= k`` exactly like the reference (base_hnsw_config.h:55-79).
    """

    M: int = 30
    efConstruction: int = 360
    ef: int | None = None
    # refine contract shared by the faiss-HNSW family
    # (src/index/hnsw/faiss_hnsw_config.h:22-93): `refine` keeps a raw/
    # higher-precision table at build, `refine_k >= 1` widens the candidate
    # set re-ranked exactly at search, `refine_type` names its storage.
    refine: bool = False
    refine_k: float = 1.0
    refine_type: str | None = None

    _REFINE_TYPES = ("sq6", "sq8", "fp16", "bf16", "fp32", "flat")

    def check_and_adjust(self) -> None:
        super().check_and_adjust()
        _check_range("M", self.M, 2, 2048)
        _check_range("efConstruction", self.efConstruction, 1, 65_536)
        if self.ef is None:
            self.ef = max(64, self.k)   # DEFAULT_EF pattern
        if self.ef < self.k:
            raise ConfigError(f"ef={self.ef} must be >= k={self.k}")
        if self.refine_k < 1.0:
            raise ConfigError(f"refine_k={self.refine_k} must be >= 1")
        if self.refine_type is not None and self.refine_type.lower() not in self._REFINE_TYPES:
            raise ConfigError(
                f"invalid refine type: {self.refine_type}, optional types are "
                f"{list(self._REFINE_TYPES)}"
            )
        if self.refine_type is not None:
            self.refine = True   # faiss_hnsw_config.h:86 — naming a type implies refine


@dataclass
class HnswSqConfig(HnswConfig):
    """HNSW over scalar-quantized codes
    (FaissHnswSqConfig, src/index/hnsw/faiss_hnsw_config.h:95-151)."""

    sq_type: str = "SQ8"

    _SQ_TYPES = ("sq6", "sq8", "fp16", "bf16")

    def check_and_adjust(self) -> None:
        super().check_and_adjust()
        if self.sq_type.lower() not in self._SQ_TYPES:
            raise ConfigError(
                f"invalid scalar quantizer type: {self.sq_type}, allowed {list(self._SQ_TYPES)}"
            )


@dataclass
class HnswPqConfig(HnswConfig):
    """HNSW over product-quantized codes
    (FaissHnswPqConfig, src/index/hnsw/faiss_hnsw_config.h:153-196).
    ``dim % m == 0`` is enforced at build, where dim is known."""

    m: int = 32
    nbits: int = 8

    def check_and_adjust(self) -> None:
        super().check_and_adjust()
        _check_range("m", self.m, 1, 65_536)
        _check_range("nbits", self.nbits, 1, 24)


@dataclass
class HnswPrqConfig(HnswPqConfig):
    """HNSW over product-residual-quantized codes
    (FaissHnswPrqConfig, src/index/hnsw/faiss_hnsw_config.h:198-230)."""

    m: int = 2
    nrq: int = 2

    def check_and_adjust(self) -> None:
        super().check_and_adjust()
        _check_range("nrq", self.nrq, 1, 16)


@dataclass
class DiskAnnConfig(BaseConfig):
    """DISKANN (src/index/diskann/diskann_config.h:26-196).

    The Spark analog is a disk-resident IVF over Parquet (SURVEY.md §2.3);
    these params are validated for API parity and mapped onto the IVF plan.
    """

    max_degree: int = 48
    search_list_size: int = 16
    beamwidth: int = 8
    min_k: int = 100          # doubling-k range search (diskann_config.h:150-159)
    max_k: int = 10_000

    def check_and_adjust(self) -> None:
        super().check_and_adjust()
        _check_range("max_degree", self.max_degree, 1, 512)
        _check_range("beamwidth", self.beamwidth, 1, 128)
        if self.search_list_size < self.k:
            self.search_list_size = self.k   # reference adjusts similarly
        if self.min_k > self.max_k:
            raise ConfigError(f"min_k={self.min_k} > max_k={self.max_k}")


@dataclass
class SparseConfig(BaseConfig):
    """Sparse inverted index (src/index/sparse/sparse_inverted_index_config.h:20-108)."""

    metric_type: MetricType = MetricType.IP
    inverted_index_algo: str = "DAAT_MAXSCORE"   # {TAAT_NAIVE, DAAT_WAND, DAAT_MAXSCORE}
    drop_ratio_build: float = 0.0                # deprecated no-op, accepted for
                                                 # parity (config.h:28-29: "won't
                                                 # change anything")
    drop_ratio_search: float = 0.0               # query-term pruning [0, 1)
    refine_factor: int = 1
    dim_max_score_ratio: float = 1.05            # WAND bound scaling [0.5, 1.3]
    bm25_k1: float = 1.2                          # config.h:613-622
    bm25_b: float = 0.75
    bm25_avgdl: float | None = None               # must be supplied for BM25 search

    def check_and_adjust(self) -> None:
        super().check_and_adjust()
        if self.inverted_index_algo not in ("TAAT_NAIVE", "DAAT_WAND", "DAAT_MAXSCORE"):
            raise ConfigError(f"unknown inverted_index_algo {self.inverted_index_algo!r}")
        if not (0.0 <= self.drop_ratio_search < 1.0):
            raise ConfigError(f"drop_ratio_search={self.drop_ratio_search} out of [0, 1)")
        if not (0.0 <= self.drop_ratio_build < 1.0):
            raise ConfigError(f"drop_ratio_build={self.drop_ratio_build} out of [0, 1)")
        _check_range("dim_max_score_ratio", self.dim_max_score_ratio, 0.5, 1.3)
        _check_range("bm25_k1", self.bm25_k1, 0.0, 3.0)
        _check_range("bm25_b", self.bm25_b, 0.0, 1.0)
        _check_range("refine_factor", self.refine_factor, 1, 100)

    def require_bm25(self) -> None:
        if self.metric_type == MetricType.BM25 and (
            self.bm25_avgdl is None or self.bm25_avgdl <= 0
        ):
            raise ConfigError("BM25 search requires bm25_avgdl > 0 (config.h:734-760)")


@dataclass
class KMeansConfig(BaseConfig):
    """Standalone clustering op (include/knowhere/cluster/cluster_node.h:26-50)."""

    num_clusters: int = 8
    max_iter: int = 20
    seed: int = 42

    def check_and_adjust(self) -> None:
        super().check_and_adjust()
        _check_range("num_clusters", self.num_clusters, 1, 1_048_576)
        _check_range("max_iter", self.max_iter, 1, 1000)


#: dtype compatibility per index family — the ``name_dtype`` registry key
#: + feature-bit check of the reference factory (utils.h:95-110,
#: index_factory.cc:76-90, operands.h:149-175).
_DENSE_VECTYPES = frozenset(
    {VecType.FP32, VecType.FP16, VecType.BF16, VecType.INT8}
)
SUPPORTED_VECTYPES: dict[IndexType, frozenset[VecType]] = {
    IndexType.FLAT: _DENSE_VECTYPES,
    IndexType.BIN_FLAT: frozenset({VecType.BIN1}),
    IndexType.IVF_FLAT: _DENSE_VECTYPES,
    IndexType.IVF_SQ8: _DENSE_VECTYPES,
    IndexType.IVF_PQ: _DENSE_VECTYPES,
    IndexType.SCANN: _DENSE_VECTYPES,
    IndexType.BIN_IVF_FLAT: frozenset({VecType.BIN1}),
    IndexType.HNSW: _DENSE_VECTYPES,
    IndexType.HNSW_SQ: _DENSE_VECTYPES,
    IndexType.HNSW_PQ: _DENSE_VECTYPES,
    IndexType.HNSW_PRQ: _DENSE_VECTYPES,
    IndexType.SHARDED_HNSW: _DENSE_VECTYPES,
    # DENSE_FLOAT_ALL registration — no int8 (diskann.cc:723-725,
    # test_index_check.cc:118-120)
    IndexType.DISKANN: frozenset({VecType.FP32, VecType.FP16, VecType.BF16}),
    IndexType.SPARSE_INVERTED_INDEX: frozenset({VecType.SPARSE_FP32}),
    IndexType.SPARSE_WAND: frozenset({VecType.SPARSE_FP32}),
    IndexType.KMEANS: frozenset({VecType.FP32}),
}


def check_vectype(index_type: IndexType, vec_type: VecType | str) -> VecType:
    """Feature-bit dtype check (index_factory.cc:76-90); raises
    :class:`ConfigError` on an unsupported (index, dtype) pair."""
    vt = VecType(vec_type.upper()) if isinstance(vec_type, str) else vec_type
    if index_type not in SUPPORTED_VECTYPES:
        raise ConfigError(f"no dtype registration for {index_type.value}")
    if vt not in SUPPORTED_VECTYPES[index_type]:
        raise ConfigError(
            f"{index_type.value} does not support dtype {vt.value} "
            f"(supported: {sorted(v.value for v in SUPPORTED_VECTYPES[index_type])})"
        )
    return vt


CONFIG_FOR_INDEX: dict[IndexType, type[BaseConfig]] = {
    IndexType.FLAT: FlatConfig,
    IndexType.BIN_FLAT: FlatConfig,
    IndexType.IVF_FLAT: IvfConfig,
    IndexType.IVF_SQ8: IvfSq8Config,
    IndexType.IVF_PQ: IvfPqConfig,
    IndexType.SCANN: ScannConfig,
    IndexType.BIN_IVF_FLAT: IvfConfig,
    IndexType.HNSW: HnswConfig,
    IndexType.SHARDED_HNSW: HnswConfig,
    IndexType.HNSW_SQ: HnswSqConfig,
    IndexType.HNSW_PQ: HnswPqConfig,
    IndexType.HNSW_PRQ: HnswPrqConfig,
    IndexType.DISKANN: DiskAnnConfig,
    IndexType.SPARSE_INVERTED_INDEX: SparseConfig,
    IndexType.SPARSE_WAND: SparseConfig,
    IndexType.KMEANS: KMeansConfig,
}


def _coerce_param(name: str, annotation: str, value):
    """String→typed coercion + type conflict checks, mirroring
    ``Config::FormatAndCheck`` (src/common/config.cc: stoll/stof with
    trailing-junk rejection) and ``Config::Load``'s type gates
    (config.h:345-556: a non-integer JSON number for an int param is a
    ``type_conflict_in_json``)."""
    ann = annotation.replace(" ", "").split("|")[0]
    if value is None:
        return value
    if ann == "bool":
        if isinstance(value, bool):
            return value
        if isinstance(value, str) and value.lower() in ("true", "false"):
            return value.lower() == "true"
        raise ConfigError(
            f"type conflict: param '{name}'={value!r} should be boolean"
        )
    if ann == "int":
        if isinstance(value, bool):
            raise ConfigError(f"type conflict: param '{name}'={value!r} should be integer")
        if isinstance(value, int):
            return value
        if isinstance(value, str):
            try:
                return int(value, 10)   # "128abc"/"1.5" rejected like stoll+sz check
            except ValueError as exc:
                raise ConfigError(
                    f"invalid integer value, key: '{name}', value: '{value}'"
                ) from exc
        # reference rejects JSON floats for int params even when integral
        raise ConfigError(f"type conflict: param '{name}'={value!r} should be integer")
    if ann == "float":
        if isinstance(value, bool):
            raise ConfigError(f"type conflict: param '{name}'={value!r} should be a number")
        if isinstance(value, (int, float)):
            return float(value)
        if isinstance(value, str):
            try:
                return float(value)
            except ValueError as exc:
                raise ConfigError(
                    f"invalid float value, key: '{name}', value: '{value}'"
                ) from exc
        raise ConfigError(f"type conflict: param '{name}'={value!r} should be a number")
    if ann == "str" and not isinstance(value, str):
        raise ConfigError(f"type conflict: param '{name}'={value!r} should be a string")
    return value


def load_config(index_type: IndexType | str, params: dict | None = None) -> BaseConfig:
    """``Config::FormatAndCheck`` + ``Load`` analog (config.h:345-556).

    Coerces a raw dict into the typed config for ``index_type`` — string
    values parse to the declared type, type conflicts raise — then applies
    defaults, range checks and CheckAndAdjust; raises :class:`ConfigError`.
    """
    if isinstance(index_type, str):
        try:
            index_type = IndexType(index_type.upper())
        except ValueError as exc:
            raise ConfigError(f"unknown index type {index_type!r}") from exc
    cls = CONFIG_FOR_INDEX[index_type]
    params = dict(params or {})
    fields_by_name = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(params) - set(fields_by_name)
    if unknown:
        raise ConfigError(f"unknown params for {index_type.value}: {sorted(unknown)}")
    for name, value in params.items():
        params[name] = _coerce_param(name, str(fields_by_name[name].type), value)
    cfg = cls(**params)
    cfg.validate_for(index_type)
    return cfg
