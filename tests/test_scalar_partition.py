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
