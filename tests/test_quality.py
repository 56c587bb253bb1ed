"""Bigram-LM perplexity scoring (operators/quality.py) — the CCNet-style
quality tier above the ratio heuristics."""

from __future__ import annotations

import math
import random

import numpy as np
from pyspark.sql import functions as F

from knowhere_spark.operators.quality import NgramLM


def _train_corpus(spark):
    # a tiny "trusted" corpus with strong bigram regularities
    sents = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "the cat ate the fish",
        "the dog ate the bone",
        "a cat and a dog sat together",
    ] * 4
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sents)], "doc_id long, text string"
    )


def test_fluent_text_scores_lower_perplexity_than_shuffled(spark):
    lm = NgramLM.train(_train_corpus(spark))
    rng = random.Random(7)
    fluent = "the cat sat on the mat and the dog ate the bone"
    toks = fluent.split()
    rng.shuffle(toks)
    shuffled = " ".join(toks)
    gibberish = "zxq qqv plmk wrtx uvop zxq nnba"
    docs = spark.createDataFrame(
        [(0, fluent), (1, shuffled), (2, gibberish)], "doc_id long, text string"
    )
    s = {r["doc_id"]: r for r in lm.score(docs).collect()}
    assert s[0]["perplexity"] < s[1]["perplexity"] < s[2]["perplexity"]
    lm.release()


def test_score_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b a b")], "doc_id long, text string"
    )
    lm = NgramLM.train(docs, alpha=0.5, lam=0.7)
    # token counts: ct(a)=3, ct(b)=3, N=6, vocab=2 -> V=3
    # bigrams: doc0 (a,b); doc1 (a,b),(b,a),(a,b) -> C(a,b)=3, C(b,a)=1
    aV = 0.5 * 3
    p_bi_ab = (3 + 0.5) / (3 + aV)
    p_bi_ba = (1 + 0.5) / (3 + aV)
    p_uni_a = (3 + 0.5) / (6 + aV)
    p_uni_b = (3 + 0.5) / (6 + aV)
    p_ab = 0.7 * p_bi_ab + 0.3 * p_uni_b
    p_ba = 0.7 * p_bi_ba + 0.3 * p_uni_a
    s = {r["doc_id"]: r for r in lm.score(docs).collect()}
    want0 = math.log(p_ab)
    want1 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert abs(s[0]["avg_logprob"] - want0) < 1e-9
    assert abs(s[1]["avg_logprob"] - want1) < 1e-9
    assert abs(s[0]["perplexity"] - math.exp(-want0)) < 1e-9
    lm.release()


def test_short_and_empty_docs_score_null_and_survive_filter(spark):
    lm = NgramLM.train(_train_corpus(spark))
    docs = spark.createDataFrame(
        [(0, "one"), (1, ""), (2, "the cat sat on the mat")],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r for r in lm.score(docs).collect()}
    assert len(s) == 3                       # row-preserving
    assert s[0]["avg_logprob"] is None and s[0]["n_bigrams"] == 0
    assert s[1]["avg_logprob"] is None
    assert s[2]["perplexity"] is not None
    kept = lm.filter(docs, max_perplexity=1e9)
    assert kept.count() == 3                 # NULL-evidence docs kept
    lm.release()


def test_filter_drops_high_perplexity_docs(spark):
    lm = NgramLM.train(_train_corpus(spark))
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "zxq qqv plmk wrtx uvop")],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["perplexity"] for r in lm.score(docs).collect()}
    cut = (s[0] + s[1]) / 2
    kept = [r["doc_id"] for r in lm.filter(docs, max_perplexity=cut).collect()]
    assert kept == [0]
    lm.release()


def test_min_count_prunes_tail_but_scores_stay_finite(spark):
    lm = NgramLM.train(_train_corpus(spark), min_count=3)
    docs = spark.createDataFrame(
        [(0, "a cat and a dog sat together")], "doc_id long, text string"
    )
    r = lm.score(docs).collect()[0]
    assert r["perplexity"] is not None and np.isfinite(r["perplexity"])
    lm.release()


def test_plan_is_native_and_model_broadcasts(spark):
    lm = NgramLM.train(_train_corpus(spark))
    docs = _train_corpus(spark)
    plan = (
        lm.score(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan       # model side, never the corpus
    lm.release()


def _clf_corpora(spark):
    """Separable synthetic corpora: fluent English-ish vs token soup."""
    import random

    rng = random.Random(9)
    good_words = ("the quick brown fox jumps over a lazy dog and runs to "
                  "the river with great speed every morning").split()
    junk_words = ["zzq", "xv9", "q0q", "vvv", "9kx", "jjx", "0x0", "kqz"]
    good, junk = [], []
    for i in range(80):
        good.append((i, " ".join(rng.choice(good_words) for _ in range(30))))
        junk.append((1000 + i, " ".join(rng.choice(junk_words) for _ in range(30))))
    gdf = spark.createDataFrame(good, "doc_id long, text string")
    jdf = spark.createDataFrame(junk, "doc_id long, text string")
    return gdf, jdf


def test_quality_classifier_colliding_ids_and_null_text(spark):
    """The two corpora may carry independent id spaces (same ids on both
    sides) — each doc still trains with exactly its own label; a NULL
    text featurizes as the empty doc instead of NPE-ing HashingTF."""
    from knowhere_spark.operators.quality import QualityClassifier

    gdf, jdf = _clf_corpora(spark)
    # re-key junk onto the SAME id space as the good docs
    jdf_same_ids = jdf.withColumn("doc_id", F.col("doc_id") - 1000)
    clf = QualityClassifier.train(gdf, jdf_same_ids)
    held = spark.createDataFrame(
        [(0, " ".join("the quick brown fox runs to the river".split() * 4)),
         (1, " ".join("zzq xv9 q0q vvv jjx 9kx".split() * 5)),
         (2, None)],
        "doc_id long, text string",
    )
    scores = {r["doc_id"]: r["quality_score"] for r in clf.score(held).collect()}
    assert scores[0] > 0.8 and scores[1] < 0.2     # labels not corrupted
    assert 2 in scores                             # NULL text scored, no crash


def test_quality_classifier_separates(spark):
    """LR over hashed n-grams separates trusted text from token soup;
    scores order correctly on held-out docs."""
    from knowhere_spark.operators.quality import QualityClassifier

    gdf, jdf = _clf_corpora(spark)
    clf = QualityClassifier.train(gdf.filter("doc_id < 60"),
                                  jdf.filter("doc_id < 1060"))
    held = gdf.filter("doc_id >= 60").unionByName(jdf.filter("doc_id >= 1060"))
    scores = {r["doc_id"]: r["quality_score"] for r in clf.score(held).collect()}
    good_scores = [s for d, s in scores.items() if d < 1000]
    junk_scores = [s for d, s in scores.items() if d >= 1000]
    assert min(good_scores) > max(junk_scores)
    assert min(good_scores) > 0.8 and max(junk_scores) < 0.2


def test_quality_classifier_pareto_filter(spark):
    """The Pareto sampling rule keeps (nearly) all high-quality docs,
    only a small fraction of junk, and is deterministic per seed."""
    from knowhere_spark.operators.quality import QualityClassifier

    gdf, jdf = _clf_corpora(spark)
    clf = QualityClassifier.train(gdf.filter("doc_id < 60"),
                                  jdf.filter("doc_id < 1060"))
    pool = gdf.unionByName(jdf)
    kept = clf.pareto_filter(pool, alpha=9.0, seed=7)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    n_good = sum(1 for i in ids if i < 1000)
    n_junk = sum(1 for i in ids if i >= 1000)
    assert n_good >= 75          # of 80: quality is almost always kept
    assert n_junk <= 20          # of 80: junk survives rarely (tail diversity)
    again = {r["doc_id"] for r in
             clf.pareto_filter(pool, alpha=9.0, seed=7).select("doc_id").collect()}
    assert again == ids          # deterministic per (doc, seed)


def test_compression_signals_orders_redundancy(spark):
    from knowhere_spark.operators.quality import compression_signals

    rows = [
        (0, "the " * 500),                                     # pure repetition
        (1, " ".join(f"w{i}x{i*7%13}" for i in range(500))),   # varied prose-ish
        (2, ""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in compression_signals(df).collect()}
    assert out[0].zlib_ratio < 0.05            # boilerplate compresses away
    assert out[1].zlib_ratio > out[0].zlib_ratio * 5
    assert out[2].zlib_ratio == 1.0 and out[3].zlib_ratio == 1.0
    assert out[2].n_chars == 0 and out[3].n_chars == 0
    assert out[1].n_chars == len(rows[1][1])


def test_trigram_lm_hand_computed(spark):
    """Order-3 scoring: one trigram event hand-checked against the
    interpolation lam3*p_tri + (1-lam3)*(lam*p_bi + (1-lam)*p_uni)."""
    import math

    train = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b d")], "doc_id long, text string"
    )
    lm = NgramLM.train(train, order=3, alpha=0.1, lam=0.7, lam3=0.5)
    # counts: tri (a,b,c)=2, (a,b,d)=1; bi (a,b)=3, (b,c)=2, (b,d)=1;
    # uni a=3 b=3 c=2 d=1 -> vocab_size=5, N=9
    out = {r.doc_id: r for r in lm.score(
        spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    ).collect()}
    aV = 0.1 * 5
    p_tri = (2 + 0.1) / (3 + aV)          # c3(a,b,c) / c2ctx(a,b)
    p_bi = (2 + 0.1) / (3 + aV)           # c2(b,c) / c1(b)
    p_uni = (2 + 0.1) / (9 + aV)          # cu(c) / N
    want = math.log(0.5 * p_tri + 0.5 * (0.7 * p_bi + 0.3 * p_uni))
    r = out[9]
    assert r.n_events == 1
    assert abs(r.avg_logprob - want) < 1e-9
    assert abs(r.perplexity - math.exp(-want)) < 1e-9
    lm.release()


def test_trigram_lm_separates_indomain_from_shuffled(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog again and again")
            for i in range(30)]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    lm = NgramLM.train(train, order=3, min_count=1)
    test = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "dog the over quick lazy jumps fox brown the")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.perplexity for r in lm.score(test).collect()}
    assert got[0] < got[1] / 5, got
    lm.release()


def test_trigram_short_docs_row_preserving(spark):
    train = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    lm = NgramLM.train(train, order=3)
    out = {r.doc_id: r for r in lm.score(
        spark.createDataFrame([(0, "a b"), (1, "")], "doc_id long, text string")
    ).collect()}
    assert out[0].n_events == 0 and out[0].avg_logprob is None
    assert out[1].n_events == 0
    lm.release()


def test_perplexity_buckets_production_path_never_sorts_per_group(spark):
    """The CCNet bucket gate runs perplexity_buckets(exact=True) — a
    per-group rank window that is oracle-grade but is the 100 TB
    anti-pattern (a per-group sort of English).  The PRODUCTION default
    must stay the mergeable percentile_approx sketch, and the bench
    entry's scoring plan must never contain the gate's window.  Pins the
    two paths apart (VERDICT r12 #8)."""
    from knowhere_spark.operators.quality import perplexity_buckets

    lm = NgramLM.train(_train_corpus(spark))
    scored = lm.score(_train_corpus(spark)).withColumn("lang", F.lit("en"))

    # the bench entry's plan (NgramLM.score) carries no rank window
    bench_plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in bench_plan

    # production default: sketch, no per-group sort window
    prod = perplexity_buckets(scored)
    prod_plan = prod._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" in prod_plan
    assert "row_number" not in prod_plan

    # the gate's exact mode is the ONLY place the window appears
    gate = perplexity_buckets(scored, exact=True)
    gate_plan = gate._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in gate_plan
    lm.release()
