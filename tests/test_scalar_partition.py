"""Scalar-filter-aware index layout (SURVEY §4's MaterializedViewSearchInfo
analog, include/knowhere/comp/materialized_view.h:23-36): IVF built with
``scalar_cols`` carries hot payload fields in the assignments table, a
``filter_expr`` over them is evaluated join-free, and a saved layout
partitioned by the scalar prunes partitions at the scan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from knowhere_spark.config import IvfConfig
from knowhere_spark.operators.brute_force import BruteForce
from knowhere_spark.operators.ivf import IVFFlatIndex

from conftest import QUERY_SCHEMA, dense_df, gen_dense


def _labeled(spark, n=400, dim=16, seed=81, n_labels=4):
    mat = gen_dense(n, dim, seed=seed)
    rows = [
        (i, mat[i].tolist(), int(i % n_labels)) for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, vec array<float>, label int"), mat


def _exact_filtered(spark, base_df, qs, k, label):
    return {
        (r.query_id, r.neighbor_id)
        for r in BruteForce.search(
            base_df.filter(F.col("label") == label), qs, k, "L2"
        ).collect()
    }


def test_scalar_filtered_search_matches_filtered_brute_force(spark):
    base, _ = _labeled(spark)
    qs = dense_df(spark, gen_dense(5, 16, seed=82), QUERY_SCHEMA)
    idx = IVFFlatIndex.build(
        base, IvfConfig(metric_type="L2", nlist=8, nprobe=8), scalar_cols=["label"]
    )
    got = {
        (r.query_id, r.neighbor_id)
        for r in idx.search(qs, k=5, filter_expr=F.col("label") == 2).collect()
    }
    assert got == _exact_filtered(spark, base, qs, 5, 2)


def test_scalar_filtered_distributed_matches(spark):
    base, _ = _labeled(spark)
    qs = dense_df(spark, gen_dense(4, 16, seed=83), QUERY_SCHEMA)
    idx = IVFFlatIndex.build(
        base, IvfConfig(metric_type="L2", nlist=8, nprobe=8), scalar_cols=["label"]
    )
    got = {
        (r.query_id, r.neighbor_id)
        for r in idx.search(
            qs, k=5, filter_expr=F.col("label") == 1, strategy="distributed"
        ).collect()
    }
    assert got == _exact_filtered(spark, base, qs, 5, 1)


def test_saved_scalar_layout_prunes_partitions(spark, tmp_path):
    base, _ = _labeled(spark)
    qs = dense_df(spark, gen_dense(2, 16, seed=84), QUERY_SCHEMA)
    idx = IVFFlatIndex.build(
        base, IvfConfig(metric_type="L2", nlist=8, nprobe=2), scalar_cols=["label"]
    )
    path = str(tmp_path / "ivf_scalar")
    idx.save(path, scalar_partition_cols=["label"])
    loaded = IVFFlatIndex.load(spark, path)
    out = loaded.search(qs, k=3, filter_expr=F.col("label") == 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters:" in plan
    pf = plan.split("PartitionFilters:")[1][:400]
    # both pruning levels land in the partition filters: the hot scalar
    # AND the probed-cell IN-list
    assert "label" in pf and "cell_id" in pf
    # every hit respects the scalar predicate (labels are id % 4 here)
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    assert got and all(nid % 4 == 3 for _, nid in got)
    full = {
        (r.query_id, r.neighbor_id)
        for r in loaded.search(
            qs, k=3, nprobe=8, filter_expr=F.col("label") == 3
        ).collect()
    }
    assert full == _exact_filtered(spark, base, qs, 3, 3)


def test_add_carries_scalars_and_validates(spark):
    base, _ = _labeled(spark, n=200)
    idx = IVFFlatIndex.build(
        base, IvfConfig(metric_type="L2", nlist=4, nprobe=4), scalar_cols=["label"]
    )
    newmat = gen_dense(10, 16, seed=85)
    new = spark.createDataFrame(
        [(1000 + i, newmat[i].tolist(), 7) for i in range(10)],
        "id long, vec array<float>, label int",
    )
    idx2 = idx.add(new)
    qs = dense_df(spark, newmat[:2], QUERY_SCHEMA)
    hits = idx2.search(qs, k=1, filter_expr=F.col("label") == 7).collect()
    assert {r.neighbor_id for r in hits} == {1000, 1001}
    # an Add batch without the index's scalar column must raise, not
    # NULL-pad the layout
    bare = spark.createDataFrame(
        [(2000, newmat[0].tolist())], "id long, vec array<float>"
    )
    try:
        idx.add(bare)
        raise AssertionError("expected ValueError for missing scalar_cols")
    except ValueError as e:
        assert "scalar_cols" in str(e)


def test_scalar_col_name_clash_raises(spark):
    base, _ = _labeled(spark, n=50)
    try:
        IVFFlatIndex.build(
            base.withColumnRenamed("label", "cell_id"),
            IvfConfig(metric_type="L2", nlist=4),
            scalar_cols=["cell_id"],
        )
        raise AssertionError("expected ValueError for clashing scalar col")
    except ValueError as e:
        assert "collide" in str(e)


def test_saved_string_labels_roundtrip_types(spark, tmp_path):
    """Partition-column type inference must not coerce string labels:
    '01' and '1' are distinct partitions and must stay strings on load."""
    mat = gen_dense(40, 8, seed=91)
    rows = [(i, mat[i].tolist(), "01" if i % 2 else "1") for i in range(40)]
    base = spark.createDataFrame(rows, "id long, vec array<float>, label string")
    idx = IVFFlatIndex.build(
        base, IvfConfig(metric_type="L2", nlist=2, nprobe=2), scalar_cols=["label"]
    )
    path = str(tmp_path / "ivf_strlabel")
    idx.save(path, scalar_partition_cols=["label"])
    loaded = IVFFlatIndex.load(spark, path)
    assert dict(loaded.assignments.dtypes)["label"] == "string"
    got = {r.label for r in loaded.assignments.select("label").distinct().collect()}
    assert got == {"01", "1"}


# --- r5 (VERDICT r4 #3): the scalar layout extended beyond IVF_FLAT ---------

def _bin_labeled(spark, n=200, dim=64, seed=71, n_labels=4):
    from conftest import gen_binary

    mat = gen_binary(n, dim, seed=seed)
    rows = [(i, bytes(mat[i].tobytes()), int(i % n_labels)) for i in range(n)]
    return (
        spark.createDataFrame(rows, "id long, vec binary, label int"),
        mat,
    )


def test_bin_ivf_scalar_filtered_and_saved_layout(spark, tmp_path):
    from conftest import BIN_QUERY_SCHEMA, binary_df, gen_binary
    from knowhere_spark.operators.bin_ivf import BinaryIVFIndex

    base, _ = _bin_labeled(spark)
    qs = binary_df(spark, gen_binary(3, 64, seed=72), BIN_QUERY_SCHEMA)
    idx = BinaryIVFIndex.build(
        base, IvfConfig(metric_type="HAMMING", nlist=4, nprobe=4),
        scalar_cols=["label"],
    )
    got = {
        (r.query_id, r.neighbor_id)
        for r in idx.search(qs, k=5, filter_expr=F.col("label") == 2).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in BruteForce.search(
            base.filter(F.col("label") == 2), qs, 5, "HAMMING"
        ).collect()
    }
    assert got == exact

    path = str(tmp_path / "bin_scalar")
    idx.save(path, scalar_partition_cols=["label"])
    loaded = BinaryIVFIndex.load(spark, path)
    out = loaded.search(qs, k=3, nprobe=2, filter_expr=F.col("label") == 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters:" in plan
    pf = plan.split("PartitionFilters:")[1][:400]
    assert "label" in pf and "cell_id" in pf
    hits = {(r.query_id, r.neighbor_id) for r in out.collect()}
    assert hits and all(nid % 4 == 3 for _, nid in hits)


def test_sq8_scalar_filtered_and_saved_layout(spark, tmp_path):
    from knowhere_spark.config import IvfSq8Config
    from knowhere_spark.operators.sq import IVFSq8Index

    base, _ = _labeled(spark, n=300)
    qs = dense_df(spark, gen_dense(3, 16, seed=73), QUERY_SCHEMA)
    idx = IVFSq8Index.build(
        base, IvfSq8Config(metric_type="L2", nlist=4, nprobe=4),
        scalar_cols=["label"],
    )
    # every filtered hit respects the predicate (SQ distances are
    # quantized, so exactness is asserted through SCANN below)
    hits = idx.search(qs, k=5, filter_expr=F.col("label") == 1).collect()
    assert hits and all(r.neighbor_id % 4 == 1 for r in hits)

    path = str(tmp_path / "sq_scalar")
    idx.save(path, scalar_partition_cols=["label"])
    loaded = IVFSq8Index.load(spark, path)
    out = loaded.search(qs, k=3, nprobe=2, filter_expr=F.col("label") == 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters:" in plan
    pf = plan.split("PartitionFilters:")[1][:400]
    assert "label" in pf and "cell_id" in pf
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    assert got and all(nid % 4 == 2 for _, nid in got)


def test_scann_scalar_filtered_exact_and_saveload(spark, tmp_path):
    """SCANN at nprobe=nlist + reorder_k >= corpus is structurally exact
    (the scann_knn_exact gate's argument), so the filtered search must
    EQUAL filtered brute force — through build, save and load."""
    from knowhere_spark.config import ScannConfig
    from knowhere_spark.operators.refine import ScannIndex

    base, _ = _labeled(spark, n=200)
    qs = dense_df(spark, gen_dense(3, 16, seed=74), QUERY_SCHEMA)
    idx = ScannIndex.build(
        base,
        ScannConfig(metric_type="L2", nlist=4, nprobe=4, k=5, reorder_k=200),
        scalar_cols=["label"],
    )
    exact = _exact_filtered(spark, base, qs, 5, 0)
    got = {
        (r.query_id, r.neighbor_id)
        for r in idx.search(qs, k=5, filter_expr=F.col("label") == 0).collect()
    }
    assert got == exact

    path = str(tmp_path / "scann_scalar")
    idx.save(path, scalar_partition_cols=["label"])
    loaded = ScannIndex.load(spark, path)
    assert loaded.config.reorder_k == 200
    got2 = {
        (r.query_id, r.neighbor_id)
        for r in loaded.search(qs, k=5, filter_expr=F.col("label") == 0).collect()
    }
    assert got2 == exact
    plan = loaded.sq.assignments.filter(F.col("label") == 0)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters:" in plan and "label" in plan.split(
        "PartitionFilters:"
    )[1][:400]


def test_sparse_scalar_filtered_join_free_and_saved_layout(spark, tmp_path):
    from knowhere_spark.config import SparseConfig
    from knowhere_spark.operators.sparse import SparseInvertedIndex

    docs = spark.createDataFrame(
        [
            (i, f"term{i % 7} term{i % 5} shared word{i % 3}", "en" if i % 2 else "de")
            for i in range(60)
        ],
        "doc_id long, text string, lang string",
    )
    cfg = SparseConfig(metric_type="BM25", k=10)
    idx = SparseInvertedIndex.build_from_text(docs, cfg, scalar_cols=["lang"])
    q = spark.createDataFrame(
        [(0, {"shared": 1.0, "term1": 1.0})],
        "query_id long, vec map<string,float>",
    )
    direct = idx.search(q, k=10, filter_expr=F.col("lang") == "en").collect()
    assert direct and all(r.doc_id % 2 == 1 for r in direct)

    # the join-free path must score identically to the doc_stats
    # semi-join fallback (force it via a scalar-less twin on the same
    # postings/stats)
    twin = SparseInvertedIndex(
        idx.postings, idx.doc_stats, idx.term_stats, cfg,
        n_docs=idx._n_docs, avgdl=idx._avgdl, scalar_cols=(),
    )
    fallback = twin.search(q, k=10, filter_expr=F.col("lang") == "en").collect()
    assert {(r.doc_id, round(r.score, 6)) for r in direct} == {
        (r.doc_id, round(r.score, 6)) for r in fallback
    }

    # the join-free plan carries no Join on the scoring side's filter
    plan = idx.search(
        q, k=10, filter_expr=F.col("lang") == "en"
    )._jdf.queryExecution().executedPlan().toString()
    # fallback twin has one more join (the doc_id semi-join)
    plan_fb = fallback_plan = twin.search(
        q, k=10, filter_expr=F.col("lang") == "en"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") < plan_fb.count("Join")

    path = str(tmp_path / "sparse_scalar")
    idx.save(path, n_term_buckets=8, scalar_partition_cols=["lang"])
    loaded = SparseInvertedIndex.load(spark, path)
    assert loaded.scalar_cols == ("lang",)
    out = loaded.search(q, k=10, filter_expr=F.col("lang") == "en")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters:" in plan
    pf = plan.split("PartitionFilters:")[1][:400]
    assert "lang" in pf
    got = {(r.doc_id, round(r.score, 4)) for r in out.collect()}
    want = {(r.doc_id, round(r.score, 4)) for r in direct}
    assert got == want


def test_save_rejects_non_scalar_partition_cols(spark, tmp_path):
    base, _ = _labeled(spark, n=50)
    idx = IVFFlatIndex.build(
        base, IvfConfig(metric_type="L2", nlist=2), scalar_cols=["label"]
    )
    for bad in ("cell_id", "id", "vec"):
        try:
            idx.save(str(tmp_path / f"x_{bad}"), scalar_partition_cols=[bad])
            raise AssertionError(f"expected ValueError for {bad}")
        except ValueError as e:
            assert "scalar_cols" in str(e)


def test_bin_and_sq_add_carry_and_validate_scalars(spark):
    """Add on the r5 scalar-layout families: scalars ride along; a batch
    missing them raises instead of NULL-padding the layout."""
    from conftest import gen_binary
    from knowhere_spark.config import IvfSq8Config
    from knowhere_spark.operators.bin_ivf import BinaryIVFIndex
    from knowhere_spark.operators.sq import IVFSq8Index

    bbase, bmat = _bin_labeled(spark, n=100)
    bidx = BinaryIVFIndex.build(
        bbase, IvfConfig(metric_type="HAMMING", nlist=2, nprobe=2),
        scalar_cols=["label"],
    )
    newmat = gen_binary(2, 64, seed=75)
    new = spark.createDataFrame(
        [(1000 + i, bytes(newmat[i].tobytes()), 9) for i in range(2)],
        "id long, vec binary, label int",
    )
    bidx2 = bidx.add(new)
    assert bidx2.assignments.filter(F.col("label") == 9).count() == 2
    try:
        bidx.add(new.drop("label"))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "scalar_cols" in str(e)

    sbase, smat = _labeled(spark, n=120)
    sidx = IVFSq8Index.build(
        sbase, IvfSq8Config(metric_type="L2", nlist=2, nprobe=2),
        scalar_cols=["label"],
    )
    news = spark.createDataFrame(
        [(2000, smat[0].tolist(), 9)], "id long, vec array<float>, label int"
    )
    sidx2 = sidx.add(news)
    assert sidx2.assignments.filter(F.col("label") == 9).count() == 1
    try:
        sidx.add(news.drop("label"))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "scalar_cols" in str(e)
