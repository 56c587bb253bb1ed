"""Streaming surface: IVF_FLAT_CC search-while-insert analog (growing
segment via foreachBatch, ivf.cc:513-534) and watermarked window agg
equivalence against the batch expression."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowhere_spark.config import IvfConfig
from knowhere_spark.operators.events import window_agg
from knowhere_spark.streaming.cc import GrowingIVFIndex
from knowhere_spark.streaming.events import (
    run_available_now,
    stream_sessionize,
    stream_window_agg,
)

from conftest import QUERY_SCHEMA, DENSE_SCHEMA, dense_df, gen_dense


def test_cc_search_while_insert(spark, tmp_path):
    nb, dim, k = 400, 16, 5
    base = gen_dense(nb, dim, seed=21)
    extra = gen_dense(50, dim, seed=22) + 200.0   # shifted cluster, distinct ids

    idx = GrowingIVFIndex.build(
        dense_df(spark, base),
        IvfConfig(metric_type="L2", nlist=8, nprobe=8),
        str(tmp_path / "growing"),
    )
    assert idx.count() == nb

    # stream the extra rows in via a file source
    src = str(tmp_path / "src")
    extra_df = spark.createDataFrame(
        [(nb + i, [float(x) for x in row]) for i, row in enumerate(extra)],
        DENSE_SCHEMA,
    )
    extra_df.write.parquet(src)
    stream = spark.readStream.schema(DENSE_SCHEMA).parquet(src)
    q = idx.start_ingest(
        stream, str(tmp_path / "ckpt"), trigger={"availableNow": True}
    )
    q.awaitTermination()

    assert idx.count() == nb + 50
    # a query at the shifted cluster must hit streamed-in neighbors
    qdf = dense_df(spark, extra[:1] + 0.01, QUERY_SCHEMA)
    res = idx.search(qdf, k=k).collect()
    assert len(res) == k
    assert all(r["neighbor_id"] >= nb for r in res)

    # seal folds growing into sealed; search result is unchanged
    sealed = idx.seal()
    res2 = sealed.search(qdf, k=k).collect()
    assert sorted(r["neighbor_id"] for r in res2) == sorted(
        r["neighbor_id"] for r in res
    )


def test_stream_window_agg_matches_batch(spark, tmp_path):
    rows = [
        (i, f"2026-01-01 {h:02d}:{m:02d}:00", "click" if i % 2 else "view", float(i))
        for i, (h, m) in enumerate(
            [(0, 5), (0, 40), (1, 10), (1, 59), (2, 0), (2, 30), (3, 15)]
        )
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    src = str(tmp_path / "events_src")
    df.write.parquet(src)

    batch = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in window_agg(df).collect()
    }

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stream_window_agg(stream, watermark="1 minute")
    run_available_now(out, "win_agg_test", str(tmp_path / "ckpt2"))
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_agg_test").collect()
    }
    assert got == batch


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from knowhere_spark.operators.events import sessionize

    # two users; user 1 has a 40-minute gap → two sessions
    rows = [
        (1, "2026-01-01 10:00:00", 7),
        (2, "2026-01-01 10:10:00", 7),
        (3, "2026-01-01 10:55:00", 7),    # 45 min after prev → new session
        (4, "2026-01-01 11:00:00", 7),
        (5, "2026-01-01 10:00:00", 8),
        (6, "2026-01-01 10:20:00", 8),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id")
    src = str(tmp_path / "sess_src")
    df.write.parquet(src)

    batch = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], str(r["session_end"]))
        for r in sessionize(df, gap_minutes=30).collect()
    }

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stream_sessionize(stream, gap_minutes=30, watermark="1 minute")
    run_available_now(out, "sess_test", str(tmp_path / "ckpt3"))
    got = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], str(r["session_end"]))
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }
    assert got == batch


def test_sparse_cc_bucketed_sealed_union(spark, tmp_path):
    """Regression: a bucket-partitioned sealed index (save(n_term_buckets>0))
    carries a term_bucket column; the growing union must still work."""
    from knowhere_spark.config import SparseConfig
    from knowhere_spark.operators.sparse import SparseInvertedIndex
    from knowhere_spark.streaming.cc import GrowingSparseIndex

    from conftest import gen_sparse

    base = gen_sparse(60, 100, 0.9, seed=63)
    schema = "id long, vec map<int,float>"
    base_df = spark.createDataFrame(list(enumerate(base)), schema)
    idx0 = SparseInvertedIndex.build(base_df, SparseConfig(metric_type="IP"))
    p = str(tmp_path / "bucketed_idx")
    idx0.save(p, n_term_buckets=8)
    sealed = SparseInvertedIndex.load(spark, p)
    assert sealed._n_term_buckets == 8

    g = GrowingSparseIndex(sealed, str(tmp_path / "growing_b"))
    extra = gen_sparse(10, 100, 0.9, seed=64)
    src = str(tmp_path / "b_src")
    spark.createDataFrame(
        [(60 + i, r) for i, r in enumerate(extra)], schema
    ).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = g.start_ingest(stream, str(tmp_path / "b_ckpt"), trigger={"availableNow": True})
    q.awaitTermination()

    assert g.count() == 70
    qdf = spark.createDataFrame([(0, extra[0])], "query_id long, vec map<int,float>")
    res = g.search(qdf, k=3).collect()
    assert res and sorted(res, key=lambda r: r["rank"])[0]["doc_id"] == 60


def test_sparse_cc_readd_combines_doc_stats(spark, tmp_path):
    """A doc_id streamed in again (re-add) must not double its doc_stats
    row — the BM25 join would duplicate every posting and inflate scores;
    n_docs counts it once."""
    from knowhere_spark.config import SparseConfig
    from knowhere_spark.streaming.cc import GrowingSparseIndex

    schema = "id long, vec map<int,float>"
    base_df = spark.createDataFrame(
        [(0, {1: 2.0, 2: 1.0}), (1, {1: 1.0})], schema
    )
    g = GrowingSparseIndex.build(
        base_df, SparseConfig(metric_type="IP"), str(tmp_path / "growing_r")
    )
    src = str(tmp_path / "r_src")
    spark.createDataFrame([(0, {3: 5.0})], schema).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = g.start_ingest(stream, str(tmp_path / "r_ckpt"), trigger={"availableNow": True})
    q.awaitTermination()

    view = g.searchable()
    stats = {r["doc_id"]: r["doc_len"] for r in view.doc_stats.collect()}
    assert stats == {0: 8.0, 1: 1.0}   # doc 0: 3.0 sealed + 5.0 growing
    assert g.count() == 2
    # IP score for a query on term 1 sees doc 0's posting exactly once
    qdf = spark.createDataFrame([(0, {1: 1.0})], "query_id long, vec map<int,float>")
    res = {r["doc_id"]: r["score"] for r in view.search(qdf, k=5).collect()}
    assert res == {0: 2.0, 1: 1.0}


def test_sessionize_timestamp_ntz(spark):
    """Regression: driver parquet carries TIMESTAMP_NTZ; unix_micros requires
    TIMESTAMP, so sessionize must normalize before the gap comparison."""
    from knowhere_spark.operators.events import sessionize

    rows = [
        (1, "2026-01-01 10:00:00", 7),
        (2, "2026-01-01 10:10:00", 7),
        (3, "2026-01-01 10:55:00", 7),    # 45 min gap → new session
        (4, "2026-01-01 10:00:00", 8),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "user_id"
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == {(7, 1): 2, (7, 2): 1, (8, 1): 1}


def test_sparse_cc_search_while_insert(spark, tmp_path):
    """SparseInvertedIndexNodeCC analog: streamed-in docs are searchable,
    avgdl stays pinned until seal (sparse_index_node.cc:431-585)."""
    from knowhere_spark.config import SparseConfig
    from knowhere_spark.streaming.cc import GrowingSparseIndex

    from conftest import gen_sparse

    base = gen_sparse(100, 200, 0.9, seed=61)
    extra = gen_sparse(20, 200, 0.9, seed=62)
    schema = "id long, vec map<int,float>"
    base_df = spark.createDataFrame(list(enumerate(base)), schema)

    idx = GrowingSparseIndex.build(
        base_df, SparseConfig(metric_type="IP"), str(tmp_path / "growing_sp")
    )
    assert idx.count() == 100
    pinned_avgdl = idx.sealed.avgdl

    src = str(tmp_path / "sp_src")
    spark.createDataFrame(
        [(100 + i, r) for i, r in enumerate(extra)], schema
    ).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = idx.start_ingest(stream, str(tmp_path / "sp_ckpt"), trigger={"availableNow": True})
    q.awaitTermination()

    assert idx.count() == 120
    # a streamed doc queried by its own vector must rank itself first
    qdf = spark.createDataFrame([(0, extra[0])], "query_id long, vec map<int,float>")
    res = idx.search(qdf, k=3).collect()
    assert res and sorted(res, key=lambda r: r["rank"])[0]["doc_id"] == 100
    # avgdl pinned while growing
    assert idx.searchable().avgdl == pinned_avgdl

    # seal refreshes statistics and preserves results
    sealed = idx.seal()
    assert sealed.sealed.count() == 120
    assert sealed.sealed.avgdl != pinned_avgdl
    res2 = sealed.search(qdf, k=3).collect()
    assert {r["doc_id"] for r in res2} == {r["doc_id"] for r in res}


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    """applyInPandasWithState dedup: a duplicate arriving in a LATER
    micro-batch is suppressed by the keyed state store (the property no
    windowed aggregation gives you)."""
    from knowhere_spark.streaming.dedup import stream_dedup_first_seen

    schema = "doc_id long, text string"
    src = str(tmp_path / "dedup_src")
    # batch 1: docs 1..3 (2 and 3 duplicates of each other)
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "dup text here"), (3, "DUP, text: here!")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2 (separate file): doc 4 duplicates doc 1; doc 5 is new
    spark.createDataFrame(
        [(4, "Alpha beta GAMMA"), (5, "completely new")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)   # force one file per micro-batch
        .parquet(src)
    )
    out = stream_dedup_first_seen(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM dedup_stream").collect()
    emitted = sorted(r["doc_id"] for r in rows)
    # 1 first-seen; 2 first of its dup-pair; 5 new. 3 (same-batch dup) and
    # 4 (cross-batch dup of 1) suppressed.
    assert emitted == [1, 2, 5]


def test_stream_neardup_minhash_across_batches(spark, tmp_path):
    """Streaming MinHash-LSH: a near-duplicate arriving in a LATER
    micro-batch is matched against bucket state from earlier batches, and
    the emitted pair set agrees with the batch LSH operator run over the
    full corpus."""
    from knowhere_spark.operators.dedup import minhash_lsh_pairs
    from knowhere_spark.streaming.dedup import stream_neardup_minhash

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to the deep green forest near the old river bank"
    )
    schema = "doc_id long, text string"
    rows1 = [(1, base), (2, "totally unrelated content about spark plans")]
    # doc 3 (later batch) is a near-dup of doc 1; doc 4 is unrelated
    rows2 = [(3, base + " today"), (4, "another unrelated document entirely")]

    src = str(tmp_path / "nd_src")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_neardup_minhash(stream, 0.6)
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.sql("SELECT * FROM neardup_stream").collect()
    }
    assert got == {(1, 3)}

    # batch-operator agreement over the union corpus (signature estimate
    # vs exact verify can disagree only near the threshold; this pair is
    # far above it)
    batch = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            spark.createDataFrame(rows1 + rows2, schema), 0.6
        ).collect()
    }
    assert got == batch


def test_sq_cc_stream_equals_batch_add(spark, tmp_path):
    """IVF_SQ_CC analog (ivf.cc:621-648): rows streamed through the
    growing segment must encode byte-identically to the batch
    ``IVFSq8Index.add`` of the same rows (frozen centroids + frozen
    vmin/vdiff scale), so search results are EQUAL, not merely close —
    and seal() keeps them equal without retraining the quantizer."""
    from knowhere_spark.config import IvfSq8Config
    from knowhere_spark.operators.sq import IVFSq8Index
    from knowhere_spark.streaming.cc import GrowingSQIndex

    nb, dim, k = 300, 16, 5
    base = gen_dense(nb, dim, seed=61)
    extra = gen_dense(60, dim, seed=62) + 100.0
    extra_df = spark.createDataFrame(
        [(nb + i, [float(x) for x in row]) for i, row in enumerate(extra)],
        DENSE_SCHEMA,
    )

    cfg = IvfSq8Config(metric_type="L2", nlist=8, nprobe=8, k=k)
    g = GrowingSQIndex.build(
        dense_df(spark, base), cfg, str(tmp_path / "sq_growing")
    )
    src = str(tmp_path / "sq_src")
    extra_df.write.parquet(src)
    stream = spark.readStream.schema(DENSE_SCHEMA).parquet(src)
    q = g.start_ingest(
        stream, str(tmp_path / "sq_ckpt"), trigger={"availableNow": True}
    )
    q.awaitTermination()
    assert g.count() == nb + 60

    batch = g.sealed.add(extra_df)   # same frozen train state, batch API
    qdf = dense_df(spark, extra[:3] + 0.01, QUERY_SCHEMA)

    def result_set(idx):
        return sorted(
            (r["query_id"], r["neighbor_id"], round(r["distance"], 6))
            for r in idx.search(qdf, k=k).collect()
        )

    streamed = result_set(g)
    assert streamed == result_set(batch)
    assert all(nid >= nb for _, nid, _ in streamed)  # shifted cluster hit

    sealed = g.seal(str(tmp_path / "sq_sealed"))
    assert result_set(sealed) == streamed
    # the quantizer is frozen: sealed scale is the SAME object values
    import numpy as np
    np.testing.assert_array_equal(sealed.sealed.vmin, g.sealed.vmin)
    np.testing.assert_array_equal(sealed.sealed.vdiff, g.sealed.vdiff)


def test_sq_cc_cosine_normalizes_streamed_rows(spark, tmp_path):
    """COSINE ingest must normalize micro-batch rows exactly like the
    batch add path (normalize-at-train contract)."""
    from knowhere_spark.config import IvfSq8Config
    from knowhere_spark.streaming.cc import GrowingSQIndex

    base = gen_dense(200, 8, seed=63)
    extra = gen_dense(30, 8, seed=64) * 5.0       # badly scaled on purpose
    extra_df = spark.createDataFrame(
        [(200 + i, [float(x) for x in row]) for i, row in enumerate(extra)],
        DENSE_SCHEMA,
    )
    cfg = IvfSq8Config(metric_type="COSINE", nlist=4, nprobe=4, k=5)
    g = GrowingSQIndex.build(
        dense_df(spark, base), cfg, str(tmp_path / "sqc_growing")
    )
    src = str(tmp_path / "sqc_src")
    extra_df.write.parquet(src)
    stream = spark.readStream.schema(DENSE_SCHEMA).parquet(src)
    q = g.start_ingest(
        stream, str(tmp_path / "sqc_ckpt"), trigger={"availableNow": True}
    )
    q.awaitTermination()

    batch = g.sealed.add(extra_df)
    qdf = dense_df(spark, extra[:2], QUERY_SCHEMA)
    got_g = sorted(
        (r["query_id"], r["neighbor_id"]) for r in g.search(qdf, k=5).collect()
    )
    got_b = sorted(
        (r["query_id"], r["neighbor_id"]) for r in batch.search(qdf, k=5).collect()
    )
    assert got_g == got_b


def test_stream_curate_equals_batch_chain(spark, tmp_path):
    """stream_curate (quality gate -> repetition gate -> first-seen dedup)
    over a bounded stream emits exactly the batch chain's keep-set."""
    from knowhere_spark.functions.text import (
        quality_features_expr,
        repetition_features_expr,
        tokens_expr,
    )
    from knowhere_spark.streaming.pipeline import stream_curate

    rows = []
    for i in range(40):
        rows.append((i, f"clean document number {i} with plenty of distinct words here"))
    rows += [(100, "dup dup dup dup dup dup dup dup dup dup")]        # repetition-gated
    rows += [(101, "too short")]                                       # length-gated
    # exact dups of doc 3 (normalized): only doc 3 survives
    rows += [(102, "clean document number 3 with plenty of distinct words here")]
    rows += [(103, "Clean  document number 3 with plenty of DISTINCT words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "curate_src")
    # two batches so the first-seen state crosses micro-batches
    df.filter(F.col("doc_id") < 20).write.parquet(src + "/b1")
    df.filter(F.col("doc_id") >= 20).write.parquet(src + "/b2")

    stream = spark.readStream.schema(df.schema).parquet(src + "/*")
    out = stream_curate(stream, min_tokens=5)
    run_available_now(out, "curate_stream", str(tmp_path / "curate_ckpt"),
                      output_mode="append")
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM curate_stream").collect()}

    q = quality_features_expr(F.col("text"))
    r = repetition_features_expr(F.col("text"))
    gated = df.filter(
        (q["n_tokens"] >= 5) & (r["dup_line_frac"] <= 0.3) & (r["top_2gram_frac"] <= 0.2)
    )
    keyed = gated.select(
        F.md5(F.concat_ws(" ", tokens_expr(F.col("text")))).alias("k"), "doc_id"
    )
    expect = {
        r.doc_id
        for r in keyed.groupBy("k").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    assert got == expect
    assert 100 not in got and 101 not in got
    assert 3 in got and 102 not in got and 103 not in got


def test_stream_semdedup_cross_batch(spark, tmp_path):
    """Streaming SemDeDup suppresses semantic duplicates ACROSS
    micro-batches with first-seen-wins; unique embeddings all survive."""
    import numpy as np

    from knowhere_spark.functions.distance import numpy_kmeans
    from knowhere_spark.streaming.semdedup import stream_semdedup

    rng = np.random.default_rng(5)
    base = rng.normal(size=(20, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows, group = [], {}
    nid = 0
    for i in range(20):
        rows.append((nid, base[i].astype(np.float32).tolist())); group[nid] = i; nid += 1
    # near-copies of the first 6 vectors land in the SECOND batch
    for i in range(6):
        v = base[i] + rng.normal(scale=1e-3, size=16)
        v /= np.linalg.norm(v)
        rows.append((100 + i, v.astype(np.float32).tolist())); group[100 + i] = i
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    src = str(tmp_path / "sd_src")
    df.filter(F.col("id") < 100).write.parquet(src + "/b1")
    df.filter(F.col("id") >= 100).write.parquet(src + "/b2")

    cents = numpy_kmeans(base, 3, seed=1)
    stream = spark.readStream.schema(df.schema).parquet(src + "/*")
    out = stream_semdedup(stream, eps=0.99, centroids=cents)
    run_available_now(out, "sd_stream", str(tmp_path / "sd_ckpt"),
                      output_mode="append")
    got = {r.id: r for r in spark.sql("SELECT * FROM sd_stream").collect()}
    assert len(got) == len(rows)
    # originals all kept; every near-copy dropped (its original was seen
    # in an earlier batch — OR the same batch; either way one survivor)
    for i in range(6):
        members = [got[j] for j in got if group[j] == i]
        assert sum(1 for m in members if m.keep) == 1
        assert got[100 + i].keep is False or got[i].keep is False
    for i in range(6, 20):
        assert got[i].keep
    # first item of each cluster has NULL max_prior_cos
    assert any(r.max_prior_cos is None for r in got.values())


def test_stream_corpus_stats_matches_batch(spark, tmp_path):
    """r5 streaming corpus audit: two availableNow micro-batches merge
    into ONE state row whose final statistics equal the batch
    corpus_stats over the union (every stat is a mergeable sketch)."""
    from knowhere_spark.operators.pipeline import corpus_stats
    from knowhere_spark.streaming.pipeline import stream_corpus_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"cstats_{abs(hash(src)) % 10_000_000}"
    q = (
        stream_corpus_stats(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(got) == 1
    want = corpus_stats(docs).collect()[0]
    g = got[0]
    for c in ("n_docs", "n_docs_with_text", "n_tokens", "n_chars",
              "lang_en", "lang_unknown", "approx_distinct_docs"):
        assert g[c] == want[c], (c, g[c], want[c])
    # percentile sketches merge associatively but not bit-identically;
    # the medians must still land within the tight bracket
    assert abs(g["tokens_p50"] - want["tokens_p50"]) <= max(2, want["tokens_p50"] * 0.05)


def test_stream_stateless_embedding_matches_batch(spark, tmp_path):
    """r5: the TF-only hashed embedder (use_idf=False) is fully stateless
    per document, so running it inside foreachBatch over a stream yields
    exactly the batch vectors — the text→vector bridge works at ingest
    time with no model artifact."""
    import numpy as np

    from knowhere_spark.functions.embed import text_embedding_hashed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).limit(40).cache()
    src = str(tmp_path / "src")
    docs.coalesce(2).write.parquet(src)

    got = {}

    def sink(batch_df, _bid):
        for r in text_embedding_hashed(batch_df, dim=32, use_idf=False).collect():
            got[r.doc_id] = list(r.vec)

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    want = {
        r.doc_id: list(r.vec)
        for r in text_embedding_hashed(docs, dim=32, use_idf=False).collect()
    }
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6)


def test_stream_video_neardup_across_batches(spark, tmp_path):
    """Streaming video near-dup: a near-copy arriving in a LATER
    micro-batch matches frame-hash state from earlier batches; the
    aggregated overlap agrees with the batch operator over the union."""
    import numpy as np

    from knowhere_spark.functions.mp4 import encode_mp4
    from knowhere_spark.operators.multimodal import video_neardup_pairs
    from knowhere_spark.streaming.dedup import (
        stream_video_neardup,
        video_match_overlap,
    )

    rng = np.random.default_rng(31)
    frames1 = [rng.bytes(20) for _ in range(5)]
    frames3 = frames1[:4] + [rng.bytes(20)]     # 4/5 shared with video 1
    meta = {"width": 8, "height": 8, "n_frames": 5, "sample_rate": 0}
    schema = (
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>"
    )
    rows1 = [
        (1, "video", bytearray(encode_mp4(frames1)), meta),
        (2, "video", bytearray(encode_mp4([rng.bytes(20) for _ in range(5)])), meta),
    ]
    rows2 = [
        (3, "video", bytearray(encode_mp4(frames3)), meta),   # near-dup of 1
        (4, "video", bytearray(encode_mp4([rng.bytes(20) for _ in range(5)])), meta),
    ]
    src = str(tmp_path / "vid_src")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_video_neardup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("video_nd_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "vid_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    evidence = spark.sql("SELECT * FROM video_nd_stream")
    assert evidence.count() == 4                      # the 4 shared hashes
    pairs = video_match_overlap(evidence, 0.6).collect()
    assert [(r.id_a, r.id_b, r.matches) for r in pairs] == [(1, 3, 4)]
    assert pairs[0].overlap == 0.8

    # batch-operator agreement over the union corpus
    union = spark.createDataFrame(rows1 + rows2, schema)
    batch = {
        (r.id_a, r.id_b)
        for r in video_neardup_pairs(union, min_overlap=0.6).collect()
    }
    assert batch == {(1, 3)}


def test_stream_video_neardup_stop_hash_cap(spark, tmp_path):
    """A frame hash at its owner cap stops emitting matches and stops
    growing state: with max_hash_freq=2, three videos sharing one frame
    yield only the single pair the first two formed."""
    import numpy as np

    from knowhere_spark.functions.mp4 import encode_mp4
    from knowhere_spark.streaming.dedup import stream_video_neardup

    rng = np.random.default_rng(32)
    common = rng.bytes(20)
    meta = {"width": 8, "height": 8, "n_frames": 2, "sample_rate": 0}
    schema = (
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>"
    )
    rows = [
        (i, "video", bytearray(encode_mp4([common, rng.bytes(20)])), meta)
        for i in (1, 2, 3)
    ]
    src = str(tmp_path / "cap_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_video_neardup(stream, max_hash_freq=2)
    q = (
        out.writeStream.format("memory")
        .queryName("video_cap_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cap_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.id_a, r.id_b)
        for r in spark.sql("SELECT * FROM video_cap_stream").collect()
    }
    assert got == {(1, 2)}   # video 3 hit the capped hash: no new pairs


def test_stream_neardup_images_across_batches(spark, tmp_path):
    """Streaming image near-dup: a noisy re-encode arriving in a LATER
    micro-batch is matched via banded pHash bucket state, and the pair
    set equals the batch hamming64_pairs join over the union."""
    import numpy as np

    from knowhere_spark.operators.multimodal import (
        encode_pnm,
        phash_neardup_pairs,
    )
    from knowhere_spark.streaming.dedup import stream_neardup_images

    rng = np.random.default_rng(33)
    base = rng.random((24, 24, 3))
    noisy = np.clip(base + rng.normal(0, 0.005, base.shape), 0, 1)
    meta = {"width": 24, "height": 24, "n_frames": 1, "sample_rate": 0}
    schema = (
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>"
    )
    rows1 = [
        (1, "image", bytearray(encode_pnm(base)), meta),
        (2, "image", bytearray(encode_pnm(rng.random((24, 24, 3)))), meta),
    ]
    rows2 = [
        (3, "image", bytearray(encode_pnm(noisy)), meta),    # near-dup of 1
        (4, "image", bytearray(encode_pnm(rng.random((24, 24, 3)))), meta),
    ]
    src = str(tmp_path / "img_src")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_neardup_images(stream, max_hamming=8)
    q = (
        out.writeStream.format("memory")
        .queryName("img_nd_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "img_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.id_a, r.id_b)
        for r in spark.sql("SELECT * FROM img_nd_stream").collect()
    }
    union = spark.createDataFrame(rows1 + rows2, schema)
    batch = {
        (r.id_a, r.id_b)
        for r in phash_neardup_pairs(union, max_hamming=8).collect()
    }
    assert got == batch            # streaming == batch over the union
    assert (1, 3) in got           # and the cross-batch copy was caught


def test_stream_video_neardup_survives_query_restart(spark, tmp_path):
    """The 100 TB ops case the availableNow tests don't cover: a driver
    restart mid-ingest.  Batch 1 is processed by one query; a SECOND
    query object resumes from the same checkpoint and processes batch 2
    — the per-hash owner lists must come back from the state store, so
    a near-copy arriving AFTER the restart still matches a video seen
    BEFORE it, with no duplicated or lost evidence."""
    import os
    import time

    from tests.test_mp4 import mux_mp4
    from knowhere_spark.streaming.dedup import (
        stream_video_neardup,
        video_match_overlap,
    )

    rng = np.random.default_rng(41)
    frames1 = [rng.bytes(20) for _ in range(5)]
    meta = {"width": 8, "height": 8, "n_frames": 5, "sample_rate": 0}
    schema = (
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>"
    )
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_available(qname):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_video_neardup(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .queryName(qname)
            .start()
        )
        q.awaitTermination()

    rows1 = [
        (1, "video", bytearray(mux_mp4(frames1)[0]), meta),
        (2, "video", bytearray(mux_mp4([rng.bytes(20) for _ in range(5)])[0]), meta),
    ]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_available("restart_a")                 # query #1 processes batch 1

    # near-copy of video 1 arrives AFTER the "restart"
    frames3 = frames1[:4] + [rng.bytes(20)]
    rows2 = [
        (3, "video", bytearray(mux_mp4(frames3)[0]), meta),
        (4, "video", bytearray(mux_mp4([rng.bytes(20) for _ in range(5)])[0]), meta),
    ]
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    now = time.time()
    for e in os.scandir(src):                  # batch-2 file strictly newer
        if e.name.endswith(".parquet"):
            os.utime(e.path, (now, now))
    run_available("restart_b")                 # query #2, SAME checkpoint

    evidence = spark.read.parquet(sink)
    # cross-restart evidence: the 4 shared hashes of (1, 3), exactly once
    assert evidence.count() == 4
    assert evidence.distinct().count() == 4
    pairs = video_match_overlap(evidence, 0.6).collect()
    assert [(r.id_a, r.id_b, r.matches) for r in pairs] == [(1, 3, 4)]


def test_stream_neardup_audio_cross_batch(spark, tmp_path):
    """Streaming audio near-dup (the fourth modality's streaming twin):
    a level-changed copy arriving in a LATER micro-batch is caught via
    the banded SRP-hash bucket state; unrelated noise never pairs."""
    import os
    import time

    from tests.test_multimodal import _make_wav
    from knowhere_spark.streaming.dedup import stream_neardup_audio

    rng = np.random.default_rng(51)
    t = np.arange(2048) / 8000.0
    tone = np.sin(2 * np.pi * 440 * t) * 0.5
    noise = rng.uniform(-0.5, 0.5, 2048)
    meta = {"width": 0, "height": 0, "n_frames": 0, "sample_rate": 8000}
    schema = (
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>"
    )
    src = str(tmp_path / "asrc")
    spark.createDataFrame(
        [(1, "audio", bytearray(_make_wav(tone)), meta),
         (2, "audio", bytearray(_make_wav(noise)), meta)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, "audio", bytearray(_make_wav(tone * 0.7)), meta)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    files = sorted(os.scandir(src), key=lambda e: e.name)
    now = time.time()
    for i, e in enumerate(p for p in files if p.name.endswith(".parquet")):
        os.utime(e.path, (now - 240 + i * 120, now - 240 + i * 120))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_neardup_audio(stream, max_hamming=8)
        .writeStream.format("memory")
        .queryName("audio_nd_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "a_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pairs = {
        (r.id_a, r.id_b)
        for r in spark.sql(
            "SELECT DISTINCT id_a, id_b FROM audio_nd_stream"
        ).collect()
    }
    assert pairs == {(1, 3)}


def test_scene_change_frames_streams(spark, tmp_path):
    """r10: scene detection runs in ONE mapInPandas pass (no window), so
    the SAME operator works unchanged on a streaming DataFrame — per-row
    (whole-video) computation, no state needed.  Streamed output over
    two micro-batches must equal the batch run over the union."""
    import numpy as np

    from knowhere_spark.functions.mp4 import encode_mp4
    from knowhere_spark.operators.multimodal import scene_change_frames

    rng = np.random.default_rng(29)

    def vid(n_shots):
        frames = []
        for _ in range(n_shots):
            shot = rng.bytes(24)
            frames += [shot] * int(rng.integers(1, 4))
        return encode_mp4(frames)

    meta = {"width": 8, "height": 8, "n_frames": 0, "sample_rate": 0}
    schema = (
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,n_frames:int,sample_rate:int>"
    )
    rows1 = [(i, "video", bytearray(vid(3)), meta) for i in (1, 2)]
    rows2 = [(i, "video", bytearray(vid(2)), meta) for i in (3, 4)]
    src = str(tmp_path / "scene_src")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    batch_media = spark.read.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    want = sorted(
        (r.media_id, r.frame_idx, r.phash, r.scene_idx)
        for r in scene_change_frames(batch_media, min_hamming=10).collect()
    )

    stream = (
        spark.readStream.schema(batch_media.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        scene_change_frames(stream, min_hamming=10)
        .writeStream.format("memory")
        .queryName("scene_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "scene_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.media_id, r.frame_idx, r.phash, r.scene_idx)
        for r in spark.sql("SELECT * FROM scene_stream").collect()
    )
    assert got == want and len(want) > 4


def test_stream_neardup_minhash_ids_state_mode(spark, tmp_path):
    """r10: state='ids' keeps only bucket member ids (~num_perm x less
    state, the 10^9-doc shape) and emits every co-bucketed pair as a
    candidate with est_jaccard null — a SUPERSET of the signature
    mode's thresholded pairs; max_bucket stops a flooded bucket."""
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to the deep green forest near the old river bank"
    )
    schema = "doc_id long, text string"
    rows1 = [(1, base), (2, "totally unrelated content about spark plans")]
    rows2 = [(3, base + " today"), (4, "another unrelated document entirely")]
    src = str(tmp_path / "ids_src")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    from knowhere_spark.streaming.dedup import stream_neardup_minhash

    def run(name, **kw):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_neardup_minhash(stream, 0.6, **kw)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / (name + "_ckpt")))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.sql(f"SELECT * FROM {name}").collect()

    sig_pairs = {(r.doc_a, r.doc_b) for r in run("nd_sigs")}
    cand_rows = run("nd_ids", state="ids")
    cand = {(r.doc_a, r.doc_b) for r in cand_rows}
    assert sig_pairs <= cand                    # candidates are a superset
    assert (1, 3) in cand
    assert all(r.est_jaccard is None for r in cand_rows)
    # stop-bucket: cap=1 means the second bucket member is never admitted
    capped = {(r.doc_a, r.doc_b) for r in run("nd_cap", state="ids", max_bucket=1)}
    assert capped == set()
    import pytest

    with pytest.raises(ValueError, match="state"):
        stream_neardup_minhash(
            spark.readStream.schema(schema).parquet(src), 0.6, state="bits"
        )


def test_stream_neardup_minhash_flood_capped_by_default(spark, tmp_path):
    """r11: a boilerplate band value (here: identical docs, so EVERY band
    collides) must not grow state or pair fan-out without bound.  The cap
    is now ON by default (max_bucket=10_000, the media twins' value); with
    an explicit small cap, a 20-doc flood emits only C(cap,2) distinct
    pairs among the first-admitted ids, and max_bucket=None restores the
    unbounded C(n,2) shape for comparison."""
    import inspect

    from knowhere_spark.streaming.dedup import stream_neardup_minhash

    # the default itself is part of the contract (VERDICT r10 #2)
    assert (
        inspect.signature(stream_neardup_minhash).parameters["max_bucket"].default
        == 10_000
    )

    boiler = "exactly the same boilerplate footer text repeated on every page " * 3
    schema = "doc_id long, text string"
    n = 20
    src = str(tmp_path / "flood_src")
    # two micro-batches so the cap is exercised across batches too
    spark.createDataFrame(
        [(i, boiler) for i in range(10)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(i, boiler) for i in range(10, n)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    bands = 32

    def run(name, **kw):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_neardup_minhash(stream, 0.6, **kw)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / (name + "_ckpt")))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.sql(f"SELECT * FROM {name}").collect()

    # identical docs → identical signatures → every band's bucket floods.
    # With the cap, each of the 32 buckets admits exactly `cap` members and
    # emits C(cap,2) match rows, then goes quiet — emitted-row count is an
    # exact, arrival-order-free measure of both state and pair fan-out.
    cap = 5
    capped = run("flood_cap", max_bucket=cap)
    assert len(capped) == bands * cap * (cap - 1) // 2
    assert len({(r.doc_a, r.doc_b) for r in capped}) <= bands * cap * (cap - 1) // 2
    unbounded = run("flood_none", max_bucket=None)
    assert len(unbounded) == bands * n * (n - 1) // 2
    assert {(r.doc_a, r.doc_b) for r in unbounded} == {
        (a, b) for a in range(n) for b in range(a + 1, n)
    }
