"""Substring-level dedup (operators/substring.py): repeated token spans
detected by fixed-n gram fingerprinting and removed by covered-index
anti-join — the distributed stand-in for suffix-array substring dedup
(Lee et al. 2022 protocol at gram granularity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowhere_spark.operators.substring import (
    duplicate_spans,
    remove_duplicate_spans,
    repeated_ngrams,
)

BOILER = "all rights reserved redistribution permitted under licence terms"


def _docs(spark):
    rows = [
        # three docs share an 8-token boilerplate span at different offsets
        (0, f"alpha beta gamma {BOILER} delta epsilon"),
        (1, f"{BOILER} zeta eta theta iota kappa"),
        (2, f"one two three four five six {BOILER}"),
        # clean docs — no 8-gram repeats
        (3, "the quick brown fox jumps over the lazy dog tonight"),
        (4, "pack my box with five dozen liquor jugs again today"),
        # a doc with an INTERNAL repeat of the boilerplate (twice in one doc)
        (5, f"start {BOILER} middle {BOILER} end"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repeated_ngrams_finds_shared_span(spark):
    docs = _docs(spark)
    rep = repeated_ngrams(docs, 8, min_count=2).collect()
    # the boilerplate is exactly 8 tokens -> exactly one repeated 8-gram
    assert len(rep) == 1
    r = rep[0]
    assert r["n_docs"] == 4          # docs 0,1,2,5
    assert r["n_occurrences"] == 5   # doc 5 contains it twice


def test_duplicate_spans_positions(spark):
    docs = _docs(spark)
    got = {
        (r["doc_id"], r["pos"])
        for r in duplicate_spans(_docs(spark), 8, min_count=2).collect()
    }
    assert got == {(0, 3), (1, 0), (2, 6), (5, 1), (5, 10)}
    del docs


def test_remove_all_occurrences(spark):
    docs = _docs(spark)
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, 8).collect()}
    assert len(out) == 6                       # row-preserving
    # clean docs untouched (token-stream identical)
    assert out[3]["text"] == "the quick brown fox jumps over the lazy dog tonight"
    assert out[3]["n_tokens_removed"] == 0
    # contaminated docs lose exactly the 8 boilerplate tokens
    assert out[0]["text"] == "alpha beta gamma delta epsilon"
    assert out[0]["n_tokens_removed"] == 8
    assert out[1]["text"] == "zeta eta theta iota kappa"
    assert out[2]["text"] == "one two three four five six"
    # the double-occurrence doc loses both spans (16 tokens)
    assert out[5]["text"] == "start middle end"
    assert out[5]["n_tokens_removed"] == 16
    for r in out.values():
        assert BOILER not in r["text"]


def test_keep_first_preserves_one_occurrence(spark):
    docs = _docs(spark)
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, 8, keep_first=True).collect()
    }
    # smallest (doc_id, pos) = (0, 3): doc 0 keeps its copy, others lose it
    assert BOILER in out[0]["text"]
    assert out[0]["n_tokens_removed"] == 0
    for d in (1, 2, 5):
        assert BOILER not in out[d]["text"]
    assert out[5]["n_tokens_removed"] == 16    # both of doc 5's copies rank > 1


def test_overlapping_spans_merge(spark):
    # a 10-token repeated region yields three overlapping repeated 8-grams;
    # covered-index distinct must merge them into one 10-token cut, not 24
    span = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    docs = spark.createDataFrame(
        [
            (0, f"left {span} right"),
            (1, f"{span} tail one two"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, 8).collect()}
    assert out[0]["text"] == "left right"
    assert out[0]["n_tokens_removed"] == 10
    assert out[1]["text"] == "tail one two"
    assert out[1]["n_tokens_removed"] == 10


def test_fully_covered_doc_survives_as_empty(spark):
    docs = spark.createDataFrame(
        [(0, BOILER), (1, BOILER), (2, "an unrelated clean document here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, 8).collect()}
    assert out[0]["text"] == "" and out[0]["n_tokens_removed"] == 8
    assert out[1]["text"] == ""
    assert out[2]["text"] == "an unrelated clean document here"


def test_plan_has_no_udf_and_single_gram_shuffle(spark):
    # the 100 TB shape: everything native (no Python eval nodes)
    docs = _docs(spark)
    plan = (
        duplicate_spans(docs, 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("n", [2, 5])
def test_short_docs_yield_no_grams(spark, n):
    docs = spark.createDataFrame(
        [(0, "one"), (1, "one"), (2, "")], "doc_id long, text string"
    )
    # docs shorter than n produce no n-grams -> nothing repeated, no crash
    assert repeated_ngrams(docs, n + 1, min_count=2).count() == 0
    out = {r["doc_id"]: r["text"] for r in remove_duplicate_spans(docs, n + 1).collect()}
    assert out == {0: "one", 1: "one", 2: ""}


def test_remove_spans_matches_python_oracle_random(spark):
    """Randomized cross-check: the distributed covered-index construction
    must equal a straightforward single-machine implementation."""
    import random

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]
    n = 4
    for trial in range(5):
        docs = []
        for d in range(12):
            toks = [rng.choice(vocab) for _ in range(rng.randint(0, 18))]
            docs.append((d, " ".join(toks)))

        # python oracle: count n-grams globally, cover repeated positions
        grams: dict[tuple, int] = {}
        tok_lists = {d: t.split() if t else [] for d, t in docs}
        for d, toks in tok_lists.items():
            for p in range(len(toks) - n + 1):
                g = tuple(toks[p:p + n])
                grams[g] = grams.get(g, 0) + 1
        want = {}
        for d, toks in tok_lists.items():
            covered = set()
            for p in range(len(toks) - n + 1):
                if grams[tuple(toks[p:p + n])] >= 2:
                    covered.update(range(p, p + n))
            kept = [t for i, t in enumerate(toks) if i not in covered]
            want[d] = (" ".join(kept), len(covered))

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_tokens_removed"])
            for r in remove_duplicate_spans(df, n).collect()
        }
        assert got == want, f"trial {trial}"


def test_untouched_docs_keep_original_text_bytes(spark):
    """Docs with no repeated span must NOT round-trip through the
    normalized token stream — case, punctuation, URLs survive."""
    raw = "Hello, World! Visit https://example.com/Path?q=1 NOW."
    docs = spark.createDataFrame(
        [(0, raw), (1, f"aa bb cc {BOILER}"), (2, f"{BOILER} dd ee ff")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, 8).collect()}
    assert out[0]["text"] == raw                  # byte-for-byte original
    assert out[0]["n_tokens_removed"] == 0
    assert out[1]["text"] == "aa bb cc"           # modified docs reassemble
    assert out[2]["text"] == "dd ee ff"
