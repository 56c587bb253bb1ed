"""Word-packed binary metrics (native bit ops) + BIN_IVF_FLAT recall +
factory dispatch — reference semantics from brute_force.cc:212-236 and
ivf.cc:607-620, test pattern from tests/ut/test_search.cc."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowhere_spark.config import ConfigError, IvfConfig, MetricType
from knowhere_spark.factory import build_index, create_index
from knowhere_spark.functions.binary import (
    hamming_np,
    hamming_words_expr,
    jaccard_np,
    jaccard_words_expr,
    pack_bits_expr,
    substructure_words_expr,
)
from knowhere_spark.operators.bin_ivf import BinaryIVFIndex

from conftest import (
    BIN_QUERY_SCHEMA,
    binary_df,
    gen_binary,
    gen_dense,
    dense_df,
    recall_at_k,
)


def _sign_pack_np(mat: np.ndarray) -> np.ndarray:
    """numpy oracle for pack_bits_expr: (n, ceil(dim/32)) int64 words."""
    bits = (mat > 0).astype(np.uint8)
    n, dim = bits.shape
    n_words = (dim + 31) // 32
    out = np.zeros((n, n_words), dtype=np.int64)
    for w in range(n_words):
        for i in range(min(32, dim - 32 * w)):
            out[:, w] |= bits[:, 32 * w + i].astype(np.int64) << i
    return out


def test_pack_bits_matches_numpy(spark):
    mat = gen_dense(50, 64) - 50.0   # mix of signs
    df = dense_df(spark, mat)
    got = {
        r["id"]: r["words"]
        for r in df.select("id", pack_bits_expr(F.col("vec"), 64).alias("words")).collect()
    }
    want = _sign_pack_np(mat)
    for i in range(len(mat)):
        assert got[i] == list(want[i])


def test_hamming_jaccard_words_vs_bytes_kernel(spark):
    base = gen_dense(40, 96, seed=1) - 50.0
    qs = gen_dense(5, 96, seed=2) - 50.0
    bw, qw = _sign_pack_np(base), _sign_pack_np(qs)
    rows = [
        (int(i), list(map(int, bw[i])), int(j), list(map(int, qw[j])))
        for i in range(len(base))
        for j in range(len(qs))
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<long>, qid long, b array<long>"
    )
    got = df.select(
        "id",
        "qid",
        hamming_words_expr(F.col("a"), F.col("b")).alias("h"),
        jaccard_words_expr(F.col("a"), F.col("b")).alias("j"),
    ).collect()
    # byte-level numpy kernels are the established oracle
    packed_b = np.packbits(
        np.stack([[(w >> i) & 1 for w in row for i in range(32)] for row in bw]).astype(np.uint8),
        axis=1, bitorder="little",
    )
    packed_q = np.packbits(
        np.stack([[(w >> i) & 1 for w in row for i in range(32)] for row in qw]).astype(np.uint8),
        axis=1, bitorder="little",
    )
    for r in got:
        i, j = r["id"], r["qid"]
        assert r["h"] == hamming_np(packed_b[i : i + 1], packed_q[j : j + 1])[0]
        assert r["j"] == pytest.approx(
            jaccard_np(packed_b[i : i + 1], packed_q[j : j + 1])[0]
        )


def test_substructure_words(spark):
    # a ⊃ q  when q's bits are a subset
    rows = [
        (1, [0b1111, 0b0011], [0b0101, 0b0011], True),
        (2, [0b1111, 0b0001], [0b0101, 0b0011], False),
    ]
    df = spark.createDataFrame(rows, "id int, base array<long>, q array<long>, want boolean")
    got = df.select(
        "id", "want", substructure_words_expr(F.col("base"), F.col("q")).alias("m")
    ).collect()
    for r in got:
        assert r["m"] == r["want"]


def test_bin_ivf_recall(spark):
    nb, dim, nq, k = 1000, 128, 10, 10
    base = gen_binary(nb, dim, seed=7)
    qs = gen_binary(nq, dim, seed=8)
    base_df = binary_df(spark, base)
    q_df = binary_df(spark, qs, BIN_QUERY_SCHEMA)

    # uniform-random binary has no cluster structure, so recall tracks the
    # probed fraction; nprobe=8/nlist=16 comfortably clears the 0.6 UT floor
    idx = BinaryIVFIndex.build(
        base_df, IvfConfig(metric_type=MetricType.HAMMING, nlist=16, nprobe=8)
    )
    res = idx.search(q_df, k=k)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["distance"]))

    d = hamming_np(
        np.repeat(base, nq, axis=0), np.tile(qs, (nb, 1))
    ).reshape(nb, nq)
    truth = {
        q: [(int(i), float(d[i, q])) for i in np.lexsort((np.arange(nb), d[:, q]))[:k]]
        for q in range(nq)
    }
    assert recall_at_k(got, truth, k) >= 0.6   # UT floor, test_search.cc:28


def test_factory_dispatch_and_validation(spark):
    mat = gen_dense(200, 16, seed=3)
    df = dense_df(spark, mat)
    qdf = dense_df(spark, gen_dense(3, 16, seed=4)).withColumnRenamed("id", "query_id")

    for t, params in [
        ("FLAT", {"metric_type": "L2"}),
        ("IVF_FLAT", {"metric_type": "L2", "nlist": 8, "nprobe": 8}),
        ("DISKANN", {"metric_type": "L2"}),
    ]:
        built = build_index(df, t, params)
        out = built.search(qdf, k=5)
        assert out.count() == 15
        assert set(out.columns) == {"query_id", "neighbor_id", "distance", "rank"}

    with pytest.raises(ConfigError):
        create_index("IVF_FLAT", {"metric_type": "L2", "bogus_param": 1})
    with pytest.raises(ConfigError):
        create_index("NO_SUCH_INDEX", {})
    with pytest.raises(ConfigError):
        # metric/index incompatibility (feature.h:21-31 flags)
        create_index("IVF_FLAT", {"metric_type": "HAMMING"})


def test_factory_dtype_axis():
    from knowhere_spark.config import VecType

    h = create_index("IVF_FLAT", {"metric_type": "L2"}, dtype="fp16")
    assert h.vec_type == VecType.FP16    # accepted; computes as fp32
    with pytest.raises(ConfigError):
        create_index("IVF_FLAT", {"metric_type": "L2"}, dtype="bin1")
    with pytest.raises(ConfigError):
        create_index("BIN_FLAT", {"metric_type": "HAMMING"}, dtype="fp32")
    with pytest.raises(ConfigError):
        create_index("SPARSE_INVERTED_INDEX", {"metric_type": "IP"}, dtype="int8")


def test_diskann_doubling_k_range_search(spark):
    """DiskANN range search doubles k from min_k until each query's
    horizon clears the radius bound (diskann_config.h:150-159); with an
    all-cells probe it must equal the brute-force range result."""
    import numpy as np

    from knowhere_spark.config import BaseConfig, DiskAnnConfig
    from knowhere_spark.operators.brute_force import BruteForce
    from knowhere_spark.operators.diskann import DiskAnnIndex

    nb, dim, nq = 300, 8, 5
    mat = gen_dense(nb, dim, seed=81)
    qs = gen_dense(nq, dim, seed=82)
    base_df = dense_df(spark, mat)
    q_df = dense_df(spark, qs).withColumnRenamed("id", "query_id")

    radius = float(np.quantile(
        ((mat[None, :, :] - qs[:, None, :]) ** 2).sum(-1), 0.15
    ))
    cfg = DiskAnnConfig(
        metric_type="L2", radius=radius, range_filter=0.0,
        min_k=4, max_k=nb, search_list_size=100_000,  # probe everything
    )
    idx = DiskAnnIndex.build(base_df, cfg)
    got = {
        (r["query_id"], r["neighbor_id"]): r["distance"]
        for r in idx.range_search(q_df).collect()
    }
    truth = {
        (r["query_id"], r["neighbor_id"]): r["distance"]
        for r in BruteForce.range_search(
            base_df, q_df, BaseConfig(metric_type="L2", radius=radius, range_filter=0.0)
        ).collect()
    }
    assert set(got) == set(truth)
    for p in truth:
        assert abs(got[p] - truth[p]) < 1e-9
    # max_k caps the horizon: with max_k=8 no query returns more than 8
    capped_cfg = DiskAnnConfig(
        metric_type="L2", radius=radius, range_filter=0.0,
        min_k=4, max_k=8, search_list_size=100_000,
    )
    capped = DiskAnnIndex(idx.ivf, capped_cfg).range_search(q_df)
    by_q = {}
    for r in capped.collect():
        by_q[r["query_id"]] = by_q.get(r["query_id"], 0) + 1
    assert all(v <= 8 for v in by_q.values())


def test_binary_gemm_matches_sql_path(spark):
    """The partial-then-final binary GEMM (LUT popcount kernel) equals the
    crossJoin+UDF path exactly, for HAMMING and JACCARD."""
    from conftest import BIN_QUERY_SCHEMA, gen_binary
    from knowhere_spark.operators.brute_force import BruteForce

    nb, dim, nq, k = 300, 64, 20, 10
    base = gen_binary(nb, dim, seed=91)
    qs = gen_binary(nq, dim, seed=92)
    base_df = spark.createDataFrame(
        [(i, bytes(r)) for i, r in enumerate(base)], "id long, vec binary"
    )
    q_df = spark.createDataFrame(
        [(i, bytes(r)) for i, r in enumerate(qs)], "query_id long, vec binary"
    )
    for metric in ("HAMMING", "JACCARD"):
        gemm = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["distance"])
            for r in BruteForce.search(base_df, q_df, k, metric, strategy="gemm").collect()
        )
        sql = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["distance"])
            for r in BruteForce.search(base_df, q_df, k, metric, strategy="sql").collect()
        )
        assert gemm == sql, metric


def test_search_dispatches_word_packed_columns(spark):
    """Regression: BruteForce.search over word-packed ARRAY<BIGINT> columns
    must route to the codegen'd bit_count path (the bytes UDF crashes on
    int arrays) and agree with the bytes path."""
    import numpy as np

    from knowhere_spark.functions.binary import pack_bits_expr
    from knowhere_spark.operators.brute_force import BruteForce

    rng = np.random.default_rng(11)
    dim = 64
    rows = [(i, [float(1 if x else -1) for x in rng.integers(0, 2, dim)]) for i in range(30)]
    fl = spark.createDataFrame(rows, "id long, vec array<float>")
    packed = fl.select("id", pack_bits_expr(F.col("vec"), 32).alias("vec"))
    q = packed.limit(3).select(F.col("id").alias("query_id"), "vec")

    got = BruteForce.search(packed, q, 5, "HAMMING")
    rowsd = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got.collect()}
    # rank-1 neighbor of each query is itself (distance 0)
    for qid in [r["query_id"] for r in q.collect()]:
        assert rowsd[(qid, 1)] == qid


def test_diskann_get_index_meta_delegates(spark):
    """GetIndexMeta on DISKANN (feder/DiskANN.h): the cell-partition map —
    same shape and totals as the underlying IVF meta."""
    from knowhere_spark.config import DiskAnnConfig
    from knowhere_spark.operators.diskann import DiskAnnIndex

    from conftest import dense_df, gen_dense

    base = gen_dense(300, 16, seed=5)
    idx = DiskAnnIndex.build(
        dense_df(spark, base),
        DiskAnnConfig(metric_type="L2", search_list_size=32, k=10),
    )
    meta = idx.get_index_meta(with_node_ids=False).collect()
    assert len(meta) == idx.ivf.centroids.shape[0]
    assert sum(r["size"] for r in meta) == 300


def test_unrolled_popcount_matches_hof_form(spark):
    """r11: passing n_words unrolls the popcount sum into flat codegen'd
    bit_counts (the HOF aggregate is a CodegenFallback, measured 3x
    slower at 2M pairs) — integer-exact, so both forms must agree bit-
    for-bit on hamming AND jaccard."""
    from knowhere_spark.functions.binary import (
        hamming_words_expr,
        jaccard_words_expr,
        pack_bits_expr,
    )

    nb, dim = 200, 96   # 3 words
    base = gen_dense(nb, dim, seed=91) - 50.0   # mixed signs
    df = dense_df(spark, base).select(
        "id", pack_bits_expr(F.col("vec"), dim).alias("w")
    )
    pairs = df.alias("a").crossJoin(
        df.select(F.col("id").alias("id_b"), F.col("w").alias("wb")).limit(20)
    )
    got = pairs.select(
        hamming_words_expr(F.col("w"), F.col("wb")).alias("h_hof"),
        hamming_words_expr(F.col("w"), F.col("wb"), n_words=3).alias("h_unr"),
        jaccard_words_expr(F.col("w"), F.col("wb")).alias("j_hof"),
        jaccard_words_expr(F.col("w"), F.col("wb"), n_words=3).alias("j_unr"),
    ).collect()
    assert len(got) == nb * 20
    for r in got:
        assert r["h_hof"] == r["h_unr"]
        assert r["j_hof"] == r["j_unr"]
