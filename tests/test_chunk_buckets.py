"""chunk_documents (pipeline.py) and perplexity_buckets (quality.py)."""

import pytest
from pyspark.sql import functions as F

from knowhere_spark.operators.pipeline import chunk_documents
from knowhere_spark.operators.quality import perplexity_buckets


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_chunk_disjoint_hand_example(spark):
    df = _doc(spark, "a b c d e f g h i j")   # 10 tokens
    out = chunk_documents(df, 4).orderBy("chunk_id").collect()
    assert [(r.chunk_id, r.start_token, r.n_chunk_tokens, r.chunk_text) for r in out] == [
        (0, 0, 4, "a b c d"),
        (1, 4, 4, "e f g h"),
        (2, 8, 2, "i j"),
    ]


def test_chunk_overlap_stride(spark):
    df = _doc(spark, "a b c d e f")           # 6 tokens
    out = chunk_documents(df, 4, stride=2).orderBy("chunk_id").collect()
    # NO chunk at start 4: "e f" is a strict sub-span of "c d e f" —
    # a pure-overlap window carries zero new content
    assert [(r.start_token, r.chunk_text) for r in out] == [
        (0, "a b c d"),
        (2, "c d e f"),
    ]


def test_chunk_overlap_never_emits_subspan_windows(spark):
    df = _doc(spark, " ".join(f"w{i}" for i in range(150)))
    out = chunk_documents(df, 64, stride=48).orderBy("chunk_id").collect()
    # starts 0, 48, 96 — NOT 144 (only 6 tokens remain <= 64-48 overlap)
    assert [r.start_token for r in out] == [0, 48, 96]
    # consecutive windows still tile the doc: each extends past the last
    ends = [r.start_token + r.n_chunk_tokens for r in out]
    assert ends[-1] == 150 and ends == sorted(ends)


def test_chunk_reassembly_property(spark):
    """Disjoint chunks concatenate back to the whitespace-normal text."""
    rows = [(i, f"tok{i}_" + " ".join(f"w{j}" for j in range(5 + i * 3))) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, 7)
    glued = (
        out.orderBy("id", "chunk_id")
        .groupBy("id")
        .agg(F.concat_ws(" ", F.collect_list("chunk_text")).alias("glued"))
    )
    orig = df.select(
        F.col("doc_id").alias("id"),
        F.concat_ws(
            " ", F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
        ).alias("norm"),
    )
    bad = glued.join(orig, "id").filter(F.col("glued") != F.col("norm"))
    assert bad.count() == 0


def test_chunk_whitespace_runs_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "  a   b\tc  \n d "), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, 3).collect()
    assert len(out) == 2   # doc 1 → 2 chunks; 2/3/4 → none
    assert {r.chunk_text for r in out} == {"a b c", "d"}


def test_chunk_min_tokens_drops_tiny_tail(spark):
    df = _doc(spark, "a b c d e")             # 5 tokens
    out = chunk_documents(df, 4, min_tokens=2).collect()
    assert [r.chunk_text for r in out] == ["a b c d"]


def test_chunk_validation(spark):
    df = _doc(spark, "a b")
    with pytest.raises(ValueError):
        chunk_documents(df, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 4, stride=0)


def _scores(spark):
    # two languages, 90 docs each, perplexity = rank so terciles are exact
    rows = []
    for li, lang in enumerate(("en", "de")):
        for i in range(90):
            rows.append((li * 1000 + i, lang, float(i + 1 + li * 500)))
    rows.append((9999, "en", None))            # no-evidence doc
    return spark.createDataFrame(rows, "doc_id long, lang string, perplexity double")


def test_buckets_per_language_terciles(spark):
    s = _scores(spark)
    out = perplexity_buckets(s, by_col="lang")
    counts = {
        (r.lang, r.ppl_bucket): r["count"]
        for r in out.filter(F.col("ppl_bucket").isNotNull())
        .groupBy("lang", "ppl_bucket").count().collect()
    }
    for lang in ("en", "de"):
        for b in ("head", "middle", "tail"):
            assert abs(counts[(lang, b)] - 30) <= 1, (lang, b, counts)
    # head docs are strictly more fluent than tail docs within a language
    en = out.filter((F.col("lang") == "en") & F.col("ppl_bucket").isNotNull())
    mx_head = en.filter(F.col("ppl_bucket") == "head").agg(F.max("perplexity")).first()[0]
    mn_tail = en.filter(F.col("ppl_bucket") == "tail").agg(F.min("perplexity")).first()[0]
    assert mx_head < mn_tail


def test_buckets_null_ppl_stays_null(spark):
    out = perplexity_buckets(_scores(spark), by_col="lang")
    r = out.filter(F.col("doc_id") == 9999).first()
    assert r.ppl_bucket is None


def test_buckets_global_mode(spark):
    out = perplexity_buckets(_scores(spark), by_col=None)
    assert out.filter(F.col("ppl_bucket") == "head").count() >= 50
    assert set(out.columns) >= {"doc_id", "lang", "perplexity", "ppl_bucket"}


def test_buckets_plan_is_broadcast_no_window(spark):
    out = perplexity_buckets(_scores(spark), by_col="lang")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan   # never a per-language single-task sort


def test_buckets_null_group_key_stays_null(spark):
    """A NULL language key must NOT fall through to 'tail' — the cuts
    join can't match NULL, so the bucket is honestly NULL."""
    rows = [(i, "en", float(i + 1)) for i in range(30)]
    rows += [(900, None, 1.0), (901, None, 999.0)]
    s = spark.createDataFrame(rows, "doc_id long, lang string, perplexity double")
    out = {r.doc_id: r.ppl_bucket for r in perplexity_buckets(s, by_col="lang").collect()}
    assert out[900] is None and out[901] is None
    assert out[0] == "head"
