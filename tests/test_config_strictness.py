"""Config validation corpus — sampled from the reference's 1,055-line
strictness suite (tests/ut/test_config.cc) plus ``Config::FormatAndCheck``
string→typed coercion semantics (src/common/config.cc, config.h:345-556):
string values parse to the declared type (trailing junk rejected), type
conflicts raise, out-of-range raises."""

from __future__ import annotations

import pytest

from knowhere_spark.config import (
    ConfigError,
    IndexType,
    MetricType,
    VecType,
    check_vectype,
    load_config,
)


# --- FormatAndCheck string coercion (config.cc stoll/stof + sz check) ------

def test_string_int_coerces():
    cfg = load_config("IVF_FLAT", {"nlist": "128", "nprobe": "16"})
    assert cfg.nlist == 128 and cfg.nprobe == 16


def test_string_float_coerces():
    cfg = load_config("FLAT", {"metric_type": "L2", "radius": "1.5", "range_filter": "0.5"})
    assert cfg.radius == 1.5 and cfg.range_filter == 0.5


def test_string_bool_coerces():
    cfg = load_config("IVF_FLAT", {"ensure_topk_full": "true"})
    assert cfg.ensure_topk_full is True
    cfg = load_config("IVF_FLAT", {"ensure_topk_full": "False"})
    assert cfg.ensure_topk_full is False


def test_string_int_trailing_junk_rejected():
    # stoll parses "128" then sz < len → wrong data type (config.cc)
    with pytest.raises(ConfigError):
        load_config("IVF_FLAT", {"nlist": "128abc"})


def test_string_float_for_int_param_rejected():
    # test_config.cc "check invalid json values": k = "100.12"
    with pytest.raises(ConfigError):
        load_config("FLAT", {"k": "100.12"})


def test_json_float_for_int_param_rejected():
    # Load: is_number_integer() gate — 100.10 for an int param is a
    # type conflict even though coercible (test_config.cc efConstruction=100.10)
    with pytest.raises(ConfigError):
        load_config("HNSW", {"efConstruction": 100.10})


def test_bool_for_int_param_rejected():
    with pytest.raises(ConfigError):
        load_config("IVF_FLAT", {"nlist": True})


def test_list_for_int_param_rejected():
    # test_config.cc: ef = [20, 30, 40] → type conflict
    with pytest.raises(ConfigError):
        load_config("HNSW", {"ef": [20, 30, 40]})


def test_non_numeric_string_rejected():
    with pytest.raises(ConfigError):
        load_config("IVF_FLAT", {"nlist": "lots"})


def test_int_accepted_for_float_param():
    cfg = load_config("FLAT", {"metric_type": "L2", "radius": 2})
    assert cfg.radius == 2.0 and isinstance(cfg.radius, float)


# --- unknown keys / index / metric ----------------------------------------

def test_unknown_param_rejected():
    # invalid_key: 100 (test_config.cc:74-78)
    with pytest.raises(ConfigError):
        load_config("IVF_FLAT", {"invalid_key": 100})


def test_unknown_index_type_rejected():
    with pytest.raises(ConfigError):
        load_config("IVF_FLAT_TYPO", {})


def test_unknown_metric_rejected():
    with pytest.raises(ConfigError):
        load_config("FLAT", {"metric_type": "L3"})


def test_metric_index_compat():
    with pytest.raises(ConfigError):
        load_config("BIN_FLAT", {"metric_type": "L2"})
    with pytest.raises(ConfigError):
        load_config("SPARSE_INVERTED_INDEX", {"metric_type": "L2"})
    with pytest.raises(ConfigError):
        load_config("IVF_FLAT", {"metric_type": "HAMMING"})


# --- range corpus (config.h field ranges + CheckAndAdjust hooks) -----------

@pytest.mark.parametrize(
    "index_type,params",
    [
        ("FLAT", {"k": 0}),                      # k range [1, 10000]
        ("FLAT", {"k": 10_001}),
        ("FLAT", {"k": -1}),
        ("IVF_FLAT", {"nlist": 0}),              # nlist range [1, 65536]
        ("IVF_FLAT", {"nlist": 65_537}),
        ("IVF_FLAT", {"nprobe": 0}),
        ("IVF_FLAT", {"nprobe": -5}),
        ("IVF_PQ", {"nbits": 0}),                # nbits [1, 16]
        ("IVF_PQ", {"nbits": 17}),
        ("IVF_PQ", {"m": 0}),
        ("IVF_SQ8", {"code_size": 5}),           # {4, 6, 8, 16} only
        ("SCANN", {"k": 20, "reorder_k": 10}),   # reorder_k >= k
        ("HNSW", {"M": 1}),                      # M range
        ("HNSW", {"ef": -1}),                    # test_config.cc ef=-1
        ("HNSW", {"k": 50, "ef": 10}),           # ef >= k (base_hnsw_config.h:55-79)
        ("HNSW", {"refine_k": 0.5}),
        ("HNSW_SQ", {"sq_type": "SQ4"}),
        ("HNSW_PRQ", {"nrq": 0}),
        ("DISKANN", {"max_degree": 0}),
        ("DISKANN", {"beamwidth": 0}),
        ("DISKANN", {"min_k": 200, "max_k": 100}),
        ("SPARSE_INVERTED_INDEX", {"metric_type": "IP", "drop_ratio_search": 1.0}),
        ("SPARSE_INVERTED_INDEX", {"metric_type": "IP", "drop_ratio_search": -0.1}),
        ("SPARSE_INVERTED_INDEX", {"metric_type": "IP", "dim_max_score_ratio": 1.4}),
        ("SPARSE_INVERTED_INDEX", {"metric_type": "BM25", "bm25_k1": 3.1}),
        ("SPARSE_INVERTED_INDEX", {"metric_type": "BM25", "bm25_b": 1.5}),
        ("SPARSE_INVERTED_INDEX", {"metric_type": "IP", "refine_factor": 0}),
        ("SPARSE_INVERTED_INDEX", {"metric_type": "IP", "inverted_index_algo": "DAAT_BOGUS"}),
        ("KMEANS", {"num_clusters": 0}),
        ("FLAT", {"range_search_k": -2}),
    ],
)
def test_out_of_range_rejected(index_type, params):
    with pytest.raises(ConfigError):
        load_config(index_type, params)


# --- adjust (not reject) semantics ----------------------------------------

def test_nprobe_clamped_to_nlist():
    cfg = load_config("IVF_FLAT", {"nlist": 16, "nprobe": 64})
    assert cfg.nprobe == 16   # MatchNprobe clamp, not an error


def test_hnsw_ef_defaults_to_k_floor():
    cfg = load_config("HNSW", {"k": 100})
    assert cfg.ef >= cfg.k


def test_scann_reorder_k_defaults_to_k():
    cfg = load_config("SCANN", {"k": 25})
    assert cfg.reorder_k == 25


def test_diskann_search_list_adjusts_to_k():
    cfg = load_config("DISKANN", {"k": 200, "search_list_size": 16})
    assert cfg.search_list_size == 200


def test_refine_type_implies_refine():
    cfg = load_config("HNSW", {"refine_type": "sq8"})
    assert cfg.refine is True


# --- dtype feature bits (index_factory.cc:76-90) ---------------------------

def test_vectype_check():
    assert check_vectype(IndexType.IVF_FLAT, "fp16") == VecType.FP16
    with pytest.raises(ConfigError):
        check_vectype(IndexType.BIN_FLAT, VecType.FP32)
    with pytest.raises(ConfigError):
        check_vectype(IndexType.SPARSE_INVERTED_INDEX, VecType.FP32)
    with pytest.raises(ConfigError):
        check_vectype(IndexType.KMEANS, VecType.BIN1)


def test_valid_full_config_loads():
    cfg = load_config(
        "IVF_PQ",
        {"metric_type": "COSINE", "k": "100", "nlist": "128", "nprobe": 16,
         "m": "16", "nbits": 8},
    )
    assert (cfg.nlist, cfg.nprobe, cfg.m, cfg.nbits, cfg.k) == (128, 16, 16, 8, 100)
    assert cfg.metric_type == MetricType.COSINE


class TestIndexDtypeMatrix:
    """Mirror of the reference's index×dtype compatibility corpus
    (tests/ut/test_index_check.cc:24-128; registration macros define the
    truth: DENSE_ALL = fp32/fp16/bf16/int8, DENSE_FLOAT_ALL excludes
    int8, binary/sparse indexes are single-dtype)."""

    VALID = [
        ("BIN_FLAT", "bin1"), ("BIN_IVF_FLAT", "bin1"),
        *[(ix, dt)
          for ix in ("FLAT", "IVF_FLAT", "IVF_SQ8", "IVF_PQ", "SCANN",
                     "HNSW", "HNSW_SQ", "HNSW_PQ", "HNSW_PRQ")
          for dt in ("fp32", "fp16", "bf16", "int8")],
        ("DISKANN", "fp32"), ("DISKANN", "fp16"), ("DISKANN", "bf16"),
        ("SPARSE_INVERTED_INDEX", "sparse_fp32"), ("SPARSE_WAND", "sparse_fp32"),
    ]
    INVALID = [
        ("FLAT", "bin1"), ("BIN_FLAT", "fp32"), ("BIN_IVF_FLAT", "int8"),
        ("HNSW", "bin1"), ("HNSW", "sparse_fp32"),
        ("DISKANN", "int8"),
        ("SPARSE_INVERTED_INDEX", "fp32"), ("SPARSE_WAND", "bin1"),
        ("IVF_FLAT", "sparse_fp32"), ("KMEANS", "fp16"),
    ]

    def test_valid_pairs(self):
        from knowhere_spark.config import IndexType, check_vectype

        for ix, dt in self.VALID:
            check_vectype(IndexType(ix), dt)   # must not raise

    def test_invalid_pairs(self):
        from knowhere_spark.config import ConfigError, IndexType, check_vectype

        for ix, dt in self.INVALID:
            with pytest.raises(ConfigError):
                check_vectype(IndexType(ix), dt)


def test_sparse_drop_ratio_build_accepted_noop():
    # deprecated in the reference (sparse_inverted_index_config.h:28-29)
    # but still part of the accepted surface; out-of-range still rejects
    from knowhere_spark.config import ConfigError, SparseConfig

    cfg = SparseConfig(metric_type="IP", drop_ratio_build=0.3)
    cfg.check_and_adjust()
    import pytest
    with pytest.raises(ConfigError):
        SparseConfig(metric_type="IP", drop_ratio_build=1.5).check_and_adjust()
