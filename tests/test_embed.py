"""Hashed TF-IDF text embeddings (functions/embed.py) — similarity
ordering, determinism, frozen-IDF contract, and integration with the
engine's vector operators."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from knowhere_spark.functions.embed import hashed_idf_table, text_embedding_hashed


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "spark catalyst optimizes declarative dataframe plans"),
        (3, "completely unrelated text about quantum chromodynamics"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vecs(df):
    return {r.doc_id: np.array(r.vec, dtype=np.float64) for r in df.collect()}


def test_embedding_similarity_ordering(spark):
    v = _vecs(text_embedding_hashed(_docs(spark), dim=64))
    assert all(abs(np.linalg.norm(x) - 1.0) < 1e-6 for x in v.values())
    near = float(v[0] @ v[1])
    far = max(float(v[0] @ v[2]), float(v[0] @ v[3]))
    assert near > 0.7 and near > far + 0.2, (near, far)


def test_embedding_deterministic(spark):
    a = _vecs(text_embedding_hashed(_docs(spark), dim=32))
    b = _vecs(text_embedding_hashed(_docs(spark), dim=32))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_frozen_idf_contract(spark):
    """Embedding NEW docs with a pinned IDF table lands them in the same
    space: an identical text embeds to the identical vector."""
    docs = _docs(spark)
    idf = hashed_idf_table(docs)
    base = _vecs(text_embedding_hashed(docs, dim=32, idf_table=idf))
    new = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = _vecs(text_embedding_hashed(new, dim=32, idf_table=idf))
    np.testing.assert_allclose(out[100], base[0], rtol=1e-12)


def test_embedding_feeds_vector_ops(spark):
    """End-to-end text → vectors → exact KNN: the near-dup pair are each
    other's top non-self neighbor."""
    from knowhere_spark.operators.brute_force import BruteForce

    emb = text_embedding_hashed(_docs(spark), dim=64).cache()
    qs = emb.select(F.col("doc_id").alias("query_id"), "vec")
    hits = BruteForce.search(
        emb.withColumnRenamed("doc_id", "id"), qs, 2, "COSINE"
    ).collect()
    top_non_self = {}
    for r in sorted(hits, key=lambda r: (r.query_id, r.rank)):
        if r.neighbor_id != r.query_id and r.query_id not in top_non_self:
            top_non_self[r.query_id] = r.neighbor_id
    assert top_non_self[0] == 1 and top_non_self[1] == 0


def test_tf_only_mode_no_corpus_pass(spark):
    v = _vecs(text_embedding_hashed(_docs(spark), dim=32, use_idf=False))
    assert len(v) == 4 and all(abs(np.linalg.norm(x) - 1.0) < 1e-6 for x in v.values())


def test_text_to_semdedup_composition(spark):
    """The full model-free chain: documents → hashed embeddings →
    SemDeDup keeps one representative per near-duplicate text group —
    semantic dedup with no external model anywhere."""
    from knowhere_spark.operators.semdedup import semdedup

    rows = []
    # 5 groups x 3 near-copies; group-specific vocabulary dominates the
    # text so cross-group cosine stays low while within-group edits are a
    # small fraction of the tokens
    for g in range(5):
        core = " ".join(f"topic{g}w{i}" for i in range(12))
        rows.append((g * 10, core + " common filler"))
        rows.append((g * 10 + 1, core + " common filler indeed"))
        rows.append((g * 10 + 2, core + " shared filler"))
    for u in range(10):
        rows.append(
            (1000 + u, " ".join(f"unique{u}tok{i}" for i in range(10)))
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = text_embedding_hashed(docs, dim=64)
    out = semdedup(emb, eps=0.85, num_clusters=2, seed=3, id_col="doc_id").collect()
    assert len(out) == len(rows)
    kept = {r.id for r in out if r.keep}
    # every near-copy group collapses to exactly one survivor; every
    # unique survives
    for g in range(5):
        members = {g * 10, g * 10 + 1, g * 10 + 2}
        assert len(members & kept) == 1, (g, members & kept)
    assert all(1000 + u in kept for u in range(10))


def test_idf_is_document_frequency_not_collection_frequency(spark):
    """Review regression: a term occurring many times in few docs must
    not go negative-IDF (collection frequency would); IDF floor is 1."""
    import math

    from knowhere_spark.functions.embed import hashed_idf_table

    docs = spark.createDataFrame(
        [(0, "the the the the the the rare"), (1, "the the the the the the")],
        "doc_id long, text string",
    )
    idf = {r.term: r.idf for r in hashed_idf_table(docs).collect()}
    # df('the')=2, N=2 -> log(3/3)+1 = 1.0 exactly; cf would give log(3/13)+1 < 0
    assert abs(idf["the"] - 1.0) < 1e-12
    assert idf["rare"] == 1.0 + math.log(3 / 2)
    assert all(v >= 1.0 for v in idf.values())


def test_empty_and_null_text_keep_rows_with_zero_vectors(spark):
    docs = spark.createDataFrame(
        [(0, "real content here"), (1, ""), (2, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: list(r.vec) for r in text_embedding_hashed(docs, dim=8).collect()}
    assert set(out) == {0, 1, 2}
    assert out[1] == [0.0] * 8 and out[2] == [0.0] * 8
    assert any(v != 0.0 for v in out[0])
