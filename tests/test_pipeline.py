"""Tests for duplicate-group resolution (operators/groups.py) and the
training-pipeline primitives (operators/pipeline.py).

Oracle style mirrors the reference's brute-force-oracle discipline
(tests/ut/test_search.cc pattern): every distributed result is compared
exactly against a straightforward single-process computation.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from knowhere_spark.operators.groups import (
    connected_components,
    dedup_filter,
    dedup_groups,
)
from knowhere_spark.operators.pipeline import (
    curate_corpus,
    deterministic_split,
    pack_sequences,
    scalable_cumsum,
)


def _naive_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


class TestConnectedComponents:
    def test_chain_pair_triangle(self, spark):
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
            "doc_a long, doc_b long",
        )
        got = {r["doc_id"]: r["group_id"] for r in connected_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    @pytest.mark.parametrize("strategy", ["driver", "distributed"])
    def test_matches_union_find_on_random_graph(self, spark, strategy):
        import random

        rng = random.Random(7)
        edges = [
            (rng.randrange(200), rng.randrange(200)) for _ in range(150)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["doc_id"]: r["group_id"]
            for r in connected_components(pairs, strategy=strategy).collect()
        }
        assert got == _naive_components(edges)

    def test_long_path_converges(self, spark):
        # a 64-node path is the worst case for plain propagation; path
        # compression keeps rounds logarithmic — must converge well inside
        # the iteration cap
        edges = [(i, i + 1) for i in range(64)]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["doc_id"]: r["group_id"]
            for r in connected_components(pairs, strategy="distributed").collect()
        }
        assert set(got.values()) == {0}
        assert len(got) == 65

    def test_dedup_groups_shapes(self, spark):
        pairs = spark.createDataFrame([(5, 9), (9, 7)], "doc_a long, doc_b long")
        rows = {r["doc_id"]: r for r in dedup_groups(pairs).collect()}
        assert rows[5]["is_canonical"] and rows[5]["group_size"] == 3
        assert not rows[9]["is_canonical"] and rows[9]["group_id"] == 5

    def test_dedup_filter_keeps_canonical_and_singletons(self, spark):
        corpus = spark.range(10).select(F.col("id").alias("doc_id"))
        pairs = spark.createDataFrame([(2, 4), (4, 6)], "doc_a long, doc_b long")
        kept = sorted(r["doc_id"] for r in dedup_filter(corpus, pairs).collect())
        assert kept == [0, 1, 2, 3, 5, 7, 8, 9]  # 4 and 6 dropped, 2 canonical

    def test_dedup_filter_best_keeps_top_scorer(self, spark):
        from knowhere_spark.operators.groups import dedup_filter_best

        corpus = spark.createDataFrame(
            [(i, float((i * 37) % 10)) for i in range(10)],
            "doc_id long, q double",
        )  # scores: 0->0, 2->4, 4->8, 6->2, 1->7, 3->1, 5->5, ...
        pairs = spark.createDataFrame(
            [(2, 4), (4, 6), (1, 3)], "doc_a long, doc_b long"
        )
        kept = sorted(
            r["doc_id"]
            for r in dedup_filter_best(corpus, pairs, "q").collect()
        )
        # group {2,4,6}: 4 has the best score (8.0); group {1,3}: 1 (7.0)
        assert kept == [0, 1, 4, 5, 7, 8, 9]
        # keep='min' flips the rule (perplexity-style scores)
        kept_min = sorted(
            r["doc_id"]
            for r in dedup_filter_best(corpus, pairs, "q", keep="min").collect()
        )
        assert kept_min == [0, 3, 5, 6, 7, 8, 9]
        # ties break to the smaller id, deterministically, in both modes
        tied = spark.createDataFrame(
            [(1, 1.0), (2, 1.0), (3, 1.0)], "doc_id long, q double"
        )
        tp = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
        for mode in ("max", "min"):
            got = [
                r["doc_id"]
                for r in dedup_filter_best(tied, tp, "q", keep=mode).collect()
            ]
            assert got == [1], mode
        # skew discipline: no Window in the plan (max_by aggregation)
        plan = (
            dedup_filter_best(corpus, pairs, "q")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        import pytest

        with pytest.raises(ValueError, match="keep"):
            dedup_filter_best(corpus, pairs, "q", keep="median")

    def test_dedup_filter_best_null_nan_never_win(self, spark):
        """r10 review: a NULL score must not beat real scores under
        keep='min' (Spark sorts NULL first) and a NaN must not beat
        them under keep='max' (NaN sorts above every double) — a failed
        scorer must never make its copy the 'best' survivor."""
        from knowhere_spark.operators.groups import dedup_filter_best

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "doc_a long, doc_b long"
        )
        with_null = spark.createDataFrame(
            [(1, 5.0), (2, None), (3, 7.0)], "doc_id long, q double"
        )
        kept_min = {r.doc_id for r in
                    dedup_filter_best(with_null, pairs, "q", keep="min").collect()}
        assert kept_min == {1}              # 5.0 wins; NULL loses
        with_nan = spark.createDataFrame(
            [(1, 5.0), (2, float("nan")), (3, 7.0)], "doc_id long, q double"
        )
        kept_max = {r.doc_id for r in
                    dedup_filter_best(with_nan, pairs, "q").collect()}
        assert kept_max == {3}              # 7.0 wins; NaN loses
        # all-missing group: deterministic smallest-id fallback
        all_null = spark.createDataFrame(
            [(1, None), (2, None), (3, None)], "doc_id long, q double"
        )
        for mode in ("max", "min"):
            got = {r.doc_id for r in
                   dedup_filter_best(all_null, pairs, "q", keep=mode).collect()}
            assert got == {1}, mode


class TestDeterministicSplit:
    def test_matches_reference_hash(self, spark):
        df = spark.range(500).select(F.col("id").alias("doc_id"))
        got = {r["doc_id"]: r["split"] for r in deterministic_split(df).collect()}
        for i in (0, 1, 17, 499):
            b = int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:7], 16) % 10_000
            exp = "train" if b < 9000 else ("val" if b < 9500 else "test")
            assert got[i] == exp

    def test_stable_under_corpus_growth(self, spark):
        small = spark.range(100).select(F.col("id").alias("doc_id"))
        big = spark.range(1000).select(F.col("id").alias("doc_id"))
        s = {r["doc_id"]: r["split"] for r in deterministic_split(small).collect()}
        b = {r["doc_id"]: r["split"] for r in deterministic_split(big).collect()}
        assert all(b[i] == s[i] for i in s)  # growth never reassigns

    def test_custom_weights(self, spark):
        df = spark.range(2000).select(F.col("id").alias("doc_id"))
        out = deterministic_split(df, weights={"a": 0.5, "b": 0.5})
        counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
        assert set(counts) == {"a", "b"}
        assert abs(counts["a"] - 1000) < 150


class TestScalableCumsum:
    @pytest.mark.parametrize("n_buckets", [1, 4, 32])
    def test_exact_prefix_sum(self, spark, n_buckets):
        df = spark.range(500).select(
            F.col("id").alias("k"), ((F.col("id") * 37) % 11 + 1).alias("v")
        )
        out = scalable_cumsum(
            df, order_col="k", value_col="v", n_buckets=n_buckets
        ).collect()
        got = {r["k"]: r["cum_before"] for r in out}
        acc = 0
        for i in range(500):
            assert got[i] == acc
            acc += (i * 37) % 11 + 1

    def test_no_global_single_partition_window(self, spark):
        # the plan must not sort the full data in one task: the only
        # unpartitioned window runs over the tiny per-bucket totals
        df = spark.range(1000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
        plan = scalable_cumsum(
            df, order_col="k", value_col="v", n_buckets=16
        )._jdf.queryExecution().executedPlan().toString()
        # local windows are partitioned by bucket; a full-data global window
        # would show "Window [... ORDER BY ...]" with no partition spec fed
        # by an Exchange SinglePartition of the main relation
        assert "__bkt" in plan

    def test_pack_sequences(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("doc_id"), ((F.col("id") % 7) + 1).alias("n_tokens")
        )
        out = {
            r["doc_id"]: (r["chunk_id"], r["chunk_offset"])
            for r in pack_sequences(df, 10, n_buckets=4).collect()
        }
        acc = 0
        for i in range(100):
            assert out[i] == (acc // 10, acc % 10)
            acc += i % 7 + 1


class TestCurateCorpus:
    def test_end_to_end(self, spark):
        rows = []
        base = "the quick brown fox jumps over the lazy dog near the river bank today"
        for i in range(40):
            rows.append((i, f"{base} variant {i}"))
        rows.append((100, rows[3][1]))          # exact dup of doc 3
        rows.append((101, "short"))             # fails min_tokens
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = curate_corpus(docs, min_tokens=5, jaccard_threshold=0.95)
        got = {r["doc_id"]: r["split"] for r in out.collect()}
        assert 101 not in got                   # quality-filtered
        assert 3 in got and 100 not in got      # dup dropped, canonical kept
        assert set(got.values()) <= {"train", "val", "test"}

    def test_dup_keep_best(self, spark):
        """r10: dup_keep='best' keeps the HIGHEST-scoring copy instead of
        the smallest id — doc 100 (score 9) beats its dup doc 3 (score
        1); everything else matches the min_id run."""
        import pytest

        base = "the quick brown fox jumps over the lazy dog near the river bank today"
        rows = [(i, f"{base} variant {i}", 1.0) for i in range(40)]
        rows.append((100, rows[3][1], 9.0))     # dup of doc 3, BETTER score
        docs = spark.createDataFrame(rows, "doc_id long, text string, q double")
        best = {
            r["doc_id"]
            for r in curate_corpus(
                docs, min_tokens=5, jaccard_threshold=0.95,
                dup_keep="best", score_col="q",
            ).collect()
        }
        assert 100 in best and 3 not in best
        min_id = {
            r["doc_id"]
            for r in curate_corpus(
                docs, min_tokens=5, jaccard_threshold=0.95
            ).collect()
        }
        assert min_id - best == {3} and best - min_id == {100}
        with pytest.raises(ValueError, match="score_col"):
            curate_corpus(docs, dup_keep="best")
        with pytest.raises(ValueError, match="dup_keep"):
            curate_corpus(docs, dup_keep="loudest")


def test_weighted_sample_stability_and_rates(spark):
    """Domain-weighted sampling: per-domain keep rates land near the
    configured fractions, membership is stable under corpus growth, and
    out-of-range rates are rejected."""
    import pytest

    from knowhere_spark.operators.pipeline import weighted_sample

    rows = [(i, f"src{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"src0": 0.2, "src1": 0.8}
    kept = weighted_sample(df, rates, default_rate=0.5)
    by_src = {
        r["source"]: r["cnt"]
        for r in kept.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert abs(by_src.get("src0", 0) / 1000 - 0.2) < 0.05
    assert abs(by_src.get("src1", 0) / 1000 - 0.8) < 0.05
    assert abs(by_src.get("src2", 0) / 1000 - 0.5) < 0.05

    # growth stability: the same ids stay selected when the corpus doubles
    big = spark.createDataFrame(
        rows + [(i + 10_000, f"src{i % 3}") for i in range(3000)],
        "doc_id long, source string",
    )
    kept_small = {r["doc_id"] for r in kept.collect()}
    kept_big = {
        r["doc_id"]
        for r in weighted_sample(big, rates, default_rate=0.5).collect()
        if r["doc_id"] < 10_000
    }
    assert kept_small == kept_big

    with pytest.raises(ValueError):
        weighted_sample(df, {"src0": 1.5})


def test_token_balanced_shards_balance_and_order(spark):
    from knowhere_spark.operators.pipeline import token_balanced_shards

    # heavy-tailed doc lengths: count-balanced sharding would skew tokens
    rows = [(i, 1000 if i % 97 == 0 else 10 + i % 7) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = token_balanced_shards(df, 8).collect()
    assert len(out) == 2000
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append((r["doc_id"], r["n_tokens"]))
    assert set(by_shard) == set(range(8))
    totals = {s: sum(t for _, t in v) for s, v in by_shard.items()}
    ideal = sum(totals.values()) / 8
    max_doc = max(t for _, t in [x for v in by_shard.values() for x in v])
    # every shard within one max-document of ideal
    assert all(abs(t - ideal) <= max_doc for t in totals.values()), totals
    # shards are contiguous cuts in doc_id order
    ranges = sorted((min(d for d, _ in v), max(d for d, _ in v), s)
                    for s, v in by_shard.items())
    for (lo1, hi1, _), (lo2, hi2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "shards must not interleave in id order"


def test_token_balanced_shards_edges(spark):
    from knowhere_spark.operators.pipeline import token_balanced_shards

    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert token_balanced_shards(empty, 4).count() == 0
    one = spark.createDataFrame([(7, 100)], "doc_id long, n_tokens long")
    got = token_balanced_shards(one, 4).collect()
    assert len(got) == 1 and 0 <= got[0]["shard"] < 4
    import pytest
    with pytest.raises(ValueError):
        token_balanced_shards(one, 0)


def test_write_sharded_corpus_roundtrip_and_balance(spark, tmp_path):
    from knowhere_spark.operators.pipeline import write_sharded_corpus

    rows = [(i, " ".join(["tok"] * (200 if i % 37 == 0 else 5 + i % 9)))
            for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "shards")
    stats = write_sharded_corpus(docs, p, 4).collect()
    assert {r["shard"] for r in stats} == {0, 1, 2, 3}
    totals = [r["n_tokens"] for r in stats]
    assert sum(r["n_docs"] for r in stats) == 400
    # token balance: every shard within one max-doc (200 tokens) of ideal
    ideal = sum(totals) / 4
    assert all(abs(t - ideal) <= 200 for t in totals), totals
    # content round-trips exactly
    back = spark.read.parquet(p)
    assert back.count() == 400
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert all(orig[r["doc_id"]] == r["text"] for r in back.collect())
    # shard partition pruning works on the written layout
    one = spark.read.parquet(p).filter(F.col("shard") == 2)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters:" in plan and "shard" in plan.split("PartitionFilters:")[1][:200]
    # stats agree with a from-scratch tokenize of what was written (the
    # pre-write assignment frame must BE the written truth)
    from knowhere_spark.functions.text import token_count_expr
    rescan = {
        r["shard"]: (r["nd"], r["nt"])
        for r in back.groupBy("shard")
        .agg(
            F.count("*").alias("nd"),
            F.sum(token_count_expr(F.col("text"))).alias("nt"),
        )
        .collect()
    }
    assert rescan == {r["shard"]: (r["n_docs"], r["n_tokens"]) for r in stats}


def test_write_sharded_corpus_stats_have_no_corpus_lineage(spark, tmp_path):
    """The r3 sink re-read and re-tokenized the whole written corpus for
    its stats frame — two extra full passes at 100 TB.  The stats must now
    be a local frame: deleting the written files after the call cannot
    break (or change) them."""
    import shutil

    from knowhere_spark.operators.pipeline import write_sharded_corpus

    rows = [(i, " ".join(["w"] * (3 + i % 7))) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "shards_gone")
    stats = write_sharded_corpus(docs, p, 2)
    shutil.rmtree(p)
    got = stats.collect()   # no re-scan of p — must not raise
    assert sum(r["n_docs"] for r in got) == 100
    assert sum(r["n_tokens"] for r in got) == sum(3 + i % 7 for i in range(100))


def test_token_shards_non_numeric_ids_raise(spark, tmp_path):
    """A string-id corpus used to cast to all-NULL order keys and silently
    write an EMPTY export (ADVICE r3) — it must raise instead."""
    import pytest

    from knowhere_spark.operators.pipeline import (
        token_balanced_shards,
        write_sharded_corpus,
    )

    docs = spark.createDataFrame(
        [("doc-a", "one two three"), ("doc-b", "four five")],
        "doc_id string, text string",
    )
    with pytest.raises(ValueError, match="cast to BIGINT"):
        write_sharded_corpus(docs, str(tmp_path / "never"), 2)
    t = docs.select("doc_id", F.lit(3).alias("n_tokens"))
    with pytest.raises(ValueError, match="cast to BIGINT"):
        token_balanced_shards(t, 2)


def test_corpus_stats_one_pass(spark):
    """corpus_stats: volume/quantiles/dup/lang columns correct on a
    corpus with planted exact duplicates, computed in ONE aggregation
    (plan has a single Aggregate pair, no Join, no Window)."""
    from knowhere_spark.operators.pipeline import corpus_stats

    rows = [(i, f"the quick brown fox number {i} runs fast") for i in range(80)]
    rows += [(100 + i, "the quick brown fox number 0 runs fast") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = corpus_stats(docs).collect()[0]
    assert r["n_docs"] == 100 and r["n_docs_with_text"] == 100
    assert r["n_tokens"] == 100 * 8
    assert r["tokens_p50"] == 8 and r["tokens_p99"] == 8
    # 81 distinct contents of 100 docs -> dup_fraction ~ 0.19 (HLL ±2%)
    assert abs(r["approx_distinct_docs"] - 81) <= 4
    assert 0.14 <= r["dup_fraction"] <= 0.24
    assert r["lang_en"] == 100 and r["lang_unknown"] == 0
    plan = corpus_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
    # NULL-text rows are reported separately, never counted as duplicates
    with_null = docs.unionByName(
        spark.createDataFrame([(500, None)], "doc_id long, text string")
    )
    r2 = corpus_stats(with_null).collect()[0]
    assert r2["n_docs"] == 101 and r2["n_docs_with_text"] == 100
    assert abs(r2["dup_fraction"] - r["dup_fraction"]) < 0.02


# --- r5: whole-document best-fit packing -------------------------------------

def test_bestfit_packing_respects_budget_and_beats_sequential(spark):
    from knowhere_spark.operators.pipeline import pack_sequences_bestfit

    # skewed lengths: first-fit-decreasing should pair 60s with 40s etc.
    rows = [(i, [60, 40, 30, 70, 10, 90][i % 6]) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").coalesce(2)
    out = pack_sequences_bestfit(df, 100).collect()
    assert len(out) == 120
    by_bin = {}
    for r in out:
        assert not r.truncated
        by_bin.setdefault(r.bin_id, []).append(r.n_tokens)
    for b, toks in by_bin.items():
        assert sum(toks) <= 100, (b, toks)
        fills = {r.bin_fill for r in out if r.bin_id == b}
        assert fills == {sum(toks)}
    # fragmentation: total bins near the token lower bound (ideal = 3.0
    # tokens/doc-avg 50 -> 60 bins); FFD on this mix packs 100-token bins
    # perfectly (60+40, 70+30, 90+10), sequential id-order packing cannot
    n_tokens = sum(r.n_tokens for r in out)
    assert len(by_bin) <= -(-n_tokens // 100) + 2   # per-partition margin


def test_bestfit_packing_oversize_and_strict(spark):
    from knowhere_spark.operators.pipeline import pack_sequences_bestfit

    df = spark.createDataFrame(
        [(0, 50), (1, 150), (2, 60)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: r for r in pack_sequences_bestfit(df, 100).collect()}
    assert out[1].truncated and out[1].bin_fill == 150
    assert not out[0].truncated and not out[2].truncated
    # distinct bins: 150 is a singleton; 50+60 > 100 so they split too
    assert len({r.bin_id for r in out.values()}) == 3
    try:
        pack_sequences_bestfit(df, 100, truncate_oversize=False).collect()
        raise AssertionError("expected failure on oversize doc")
    except Exception as e:
        assert "budget" in str(e)


def test_bestfit_packing_deterministic(spark):
    from knowhere_spark.operators.pipeline import pack_sequences_bestfit

    rows = [(i, 10 + (i * 7) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(4, "doc_id")
    a = sorted((r.doc_id, r.bin_id, r.bin_fill) for r in pack_sequences_bestfit(df, 128).collect())
    b = sorted((r.doc_id, r.bin_id, r.bin_fill) for r in pack_sequences_bestfit(df, 128).collect())
    assert a == b


def test_dedup_lines_within_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb\nd"),
            (2, "x\nx\nx"),
            (3, "only"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    from knowhere_spark.operators.pipeline import dedup_lines_within_doc

    out = {r.doc_id: r.text for r in dedup_lines_within_doc(docs).collect()}
    assert out == {1: "a\nb\nc\nd", 2: "x", 3: "only", 4: ""}
    # trimmed matching: '  a ' duplicates 'a', first form survives
    docs2 = spark.createDataFrame(
        [(1, "a\n  a \nb")], "doc_id long, text string"
    )
    (r,) = dedup_lines_within_doc(docs2).collect()
    assert r.text == "a\nb"
    # blank lines are structure, never deduped (ADVICE r9): every
    # paragraph separator survives, including whitespace-only lines
    docs3 = spark.createDataFrame(
        [(1, "p1\n\np2\n\np3"), (2, "a\n \n\t\na")], "doc_id long, text string"
    )
    out3 = {r.doc_id: r.text for r in dedup_lines_within_doc(docs3).collect()}
    assert out3[1] == "p1\n\np2\n\np3"
    assert out3[2] == "a\n \n\t"
    # r10 review: TAB-only separators are blank too (trim() strips
    # spaces alone — the r9 exemption missed them)
    docs4 = spark.createDataFrame(
        [(1, "p1\n\t\np2\n\t\np3")], "doc_id long, text string"
    )
    (r4,) = dedup_lines_within_doc(docs4).collect()
    assert r4.text == "p1\n\t\np2\n\t\np3"
    # plan: native only — no UDF, no Python kernel
    plan = dedup_lines_within_doc(docs)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_dedup_lines_across_corpus(spark):
    from knowhere_spark.operators.pipeline import dedup_lines_across_corpus

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal content one\n\nCOOKIE BANNER"),
            (2, "COOKIE BANNER\nreal content two"),
            (3, "real content three\nCOOKIE BANNER"),
            (4, "COOKIE BANNER"),
        ],
        "doc_id long, text string",
    )
    # the banner occurs 5 times >= 3 -> dropped everywhere; blank lines
    # are structure, never counted
    out = {
        r.doc_id: r.text
        for r in dedup_lines_across_corpus(docs, min_count=3).collect()
    }
    assert out == {
        1: "real content one\n",
        2: "real content two",
        3: "real content three",
        4: "",                          # row-preserving: empty, not gone
    }
    # keep="first": exactly one copy survives at the globally-first
    # occurrence (doc 1, position 0)
    out_f = {
        r.doc_id: r.text
        for r in dedup_lines_across_corpus(
            docs, min_count=3, keep="first"
        ).collect()
    }
    assert out_f[1].startswith("COOKIE BANNER\nreal content one")
    assert "COOKIE" not in out_f[2] and "COOKIE" not in out_f[3]
    assert out_f[4] == ""
    # skew-proofing (VERDICT r9 #6): keep="first" is a min_by aggregation
    # (map-side partial combine), never a window over the hot line's
    # occurrences — a corpus-wide banner line must not become a
    # single-partition straggler
    plan_f = (
        dedup_lines_across_corpus(docs, min_count=3, keep="first")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan_f
    # r10 review: a corpus-wide TAB-only separator is structure, never
    # boilerplate — it must survive in every document
    tabbed = spark.createDataFrame(
        [(i, f"para{i}a\n\t\npara{i}b") for i in range(4)],
        "doc_id long, text string",
    )
    out_t = {
        r.doc_id: r.text
        for r in dedup_lines_across_corpus(tabbed, min_count=3).collect()
    }
    for i in range(4):
        assert out_t[i] == f"para{i}a\n\t\npara{i}b", i
    # oracle cross-check (drop mode) in DuckDB over the same fixture
    import duckdb

    rows = [(r[0], r[1]) for r in docs.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    oracle = dict(
        con.execute("""
            WITH lines AS (
              SELECT doc_id, u.pos, u.line, trim(u.line) AS norm
              FROM d, LATERAL (
                SELECT unnest(string_split(text, chr(10))) AS line,
                       generate_subscripts(string_split(text, chr(10)), 1) AS pos
              ) u
            ),
            hot AS (
              SELECT norm FROM lines
              WHERE NOT regexp_matches(line, '^[ \t\r\f\x0B]*$')
              GROUP BY norm HAVING count(*) >= 3
            )
            SELECT doc_id,
                   coalesce(string_agg(line, chr(10) ORDER BY pos), '')
            FROM lines
            WHERE norm NOT IN (SELECT norm FROM hot)
            GROUP BY doc_id
        """).fetchall()
    )
    for d_id in out:
        assert out[d_id] == oracle.get(d_id, ""), d_id
