"""Evaluation metrics (operators/metrics.py) vs hand-computed values and
the reference's conventions (utils.h:110-135, 214-244)."""

from pyspark.sql import functions as F

from knowhere_spark.operators.metrics import (
    knn_recall,
    pair_metrics,
    range_search_recall,
)


def _res(spark, rows, with_rank=False):
    schema = "query_id long, neighbor_id long" + (", rank int" if with_rank else "")
    return spark.createDataFrame(rows, schema)


def test_knn_recall_hand_computed(spark):
    gt = _res(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3),
                      (2, 20, 1), (2, 21, 2), (2, 22, 3)], with_rank=True)
    res = _res(spark, [(1, 10), (1, 99), (2, 20), (2, 21)])
    # matches at k=2: q1 -> {10} of {10,11}; q2 -> {20,21}; 3 / (2*2)
    assert abs(knn_recall(res, gt, 2) - 0.75) < 1e-12
    # k=3: 3 / 6
    assert abs(knn_recall(res, gt, 3) - 0.5) < 1e-12


def test_knn_recall_perfect_and_missing_query(spark):
    gt = _res(spark, [(1, 10, 1), (2, 20, 1)], with_rank=True)
    assert knn_recall(_res(spark, [(1, 10), (2, 20)]), gt, 1) == 1.0
    # query 2 absent from the result: zero matches for it
    assert knn_recall(_res(spark, [(1, 10)]), gt, 1) == 0.5


def test_range_recall_conventions(spark):
    gt = _res(spark, [(1, 10), (1, 11), (2, 20)])
    res = _res(spark, [(1, 10), (2, 20), (2, 99)])
    assert abs(range_search_recall(res, gt) - 2 / 3) < 1e-12
    empty = _res(spark, [])
    assert range_search_recall(empty, empty) == 1.0      # both-empty = 1
    assert range_search_recall(res, empty) == 0.0


def test_pair_metrics_orientation_and_f1(spark):
    truth = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "id_a long, id_b long")
    found = spark.createDataFrame([(2, 1), (3, 4), (7, 8)], "id_a long, id_b long")
    m = pair_metrics(found, truth)
    assert m["matched"] == 2.0          # (2,1) canonicalizes to (1,2)
    assert abs(m["precision"] - 2 / 3) < 1e-12
    assert abs(m["recall"] - 2 / 3) < 1e-12
    assert abs(m["f1"] - 2 / 3) < 1e-12


def test_pair_metrics_against_real_dedup_operators(spark):
    """LSH pairs vs exact pairs on planted dups must score precision 1.0
    and recall 1.0 at a high threshold (the oracle-gated equality)."""
    from knowhere_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = [(i, f"completely unique document number {i} " + " ".join(f"t{i}_{j}" for j in range(10))) for i in range(12)]
    docs += [(100, docs[0][1]), (101, docs[1][1])]     # exact dups
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = ngram_jaccard_pairs(df, 0.8).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    lsh = minhash_lsh_pairs(df, 0.8).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    m = pair_metrics(lsh, exact)
    assert m["precision"] == 1.0 and m["recall"] == 1.0
