"""Exact substring-level deduplication: find and remove token spans that
repeat across (or within) documents.

Document-level dedup (exact / MinHash / SimHash, operators/dedup.py)
misses the pervasive *partial* duplication in web corpora — boilerplate
sentences, licence headers, templated paragraphs repeated across millions
of otherwise-distinct pages.  The standard remedy deduplicates at the
substring level: any span of >= ``n`` tokens that occurs more than once
in the corpus is removed from all-but-one (or all) occurrences
("Deduplicating Training Data Makes Language Models Better", Lee et al.
2022, uses a suffix array with a 50-token threshold).

A suffix array is a single-machine construction; the distributed
equivalent used here is fixed-``n`` gram fingerprinting, which detects
exactly the same spans at granularity ``n``: every repeated span of
length >= n contains a repeated n-gram at each of its offsets, so the
union of repeated n-gram positions covers precisely the maximal repeated
spans (with edge loss < n tokens at span boundaries).

Scale shape (everything native Catalyst, no UDFs):

1. ``posexplode`` tokens -> sliding n-gram per position, fingerprinted by
   TWO independent ``xxhash64`` values (plain + salted).  One 64-bit hash
   collides ~(N^2)/2^65 times over N grams — tens of thousands of
   false "repeats" (deleted innocent text) at the 1e12-gram corpus scale
   this module targets; the 128-bit pair drives that below 1e-14.
2. One ``groupBy(h1, h2)`` counts global occurrences -> the repeated set
   (one shuffle, map-side partial aggregation).
3. Positions join the repeated set on the hash pair (AQE broadcasts when
   the repeated set is small, which it is on clean corpora).
4. Span removal = covered-index expansion (``sequence(pos, pos+n-1)``)
   anti-joined against the token table, then ``concat_ws`` reassembly —
   interval merging falls out of the distinct covered-index set, no
   per-doc imperative code.  ``keep_first`` resolves each gram's surviving
   occurrence with a min-struct AGGREGATION, not a per-gram window — a
   boilerplate gram with 1e8 occurrences would put them all in one window
   task (straggler/OOM); the aggregation keeps map-side combining.

All passes shuffle on ``doc_id`` or the gram hash only — linear in corpus
size, no all-pairs stage anywhere.  The corpus is tokenized twice per
call (once for the gram side, once for the reassembly token table);
both are plain scans, never cached inside the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowhere_spark.functions.text import tokens_expr

_HASH_KEYS = ["h1", "h2"]


def _positional_grams(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, h1, h2) for every token position that starts a full
    n-gram; ``pos`` is 0-based, (h1, h2) is the 128-bit fingerprint."""
    toks = docs.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("_toks")
    )
    # sliding window via sequence + transform keeps everything in one
    # projection (no join): positions 0 .. len-n.  Docs shorter than n get
    # an EMPTY index array — sequence(0, -1) would auto-step DOWNWARD and
    # emit [0, -1], so the guard is load-bearing, not defensive
    idx = F.when(
        F.size("_toks") >= n, F.sequence(F.lit(0), F.size("_toks") - n)
    ).otherwise(F.array().cast("array<int>"))

    def _fp(i):
        gram = F.concat_ws(" ", F.slice("_toks", i + 1, n))
        return F.struct(
            i.alias("pos"),
            F.xxhash64(gram).alias("h1"),
            F.xxhash64(F.lit("ss-dedup-salt"), gram).alias("h2"),
        )

    grams = toks.select(id_col, F.explode(F.transform(idx, _fp)).alias("g"))
    return grams.select(
        id_col,
        F.col("g.pos").alias("pos"),
        F.col("g.h1").alias("h1"),
        F.col("g.h2").alias("h2"),
    )


def _repeated_from_grams(grams: DataFrame, id_col: str, min_count: int) -> DataFrame:
    return (
        grams.groupBy(*_HASH_KEYS)
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )


def repeated_ngrams(
    docs: DataFrame,
    n: int = 20,
    *,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Global (h1, h2, n_docs, n_occurrences) for n-grams occurring at
    least ``min_count`` times corpus-wide — the repeated-span index."""
    g = _positional_grams(docs, n, id_col, text_col)
    return _repeated_from_grams(g, id_col, min_count)


def duplicate_spans(
    docs: DataFrame,
    n: int = 20,
    *,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repeated-span starts: (doc_id, pos, h1, h2,
    n_occurrences).  A position appears when the n-gram starting there
    occurs >= ``min_count`` times corpus-wide."""
    g = _positional_grams(docs, n, id_col, text_col)
    rep = _repeated_from_grams(g, id_col, min_count).select(
        *_HASH_KEYS, "n_occurrences"
    )
    return g.join(rep, _HASH_KEYS).select(
        id_col, "pos", *_HASH_KEYS, "n_occurrences"
    )


def remove_duplicate_spans(
    docs: DataFrame,
    n: int = 20,
    *,
    min_count: int = 2,
    keep_first: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rebuild documents with their repeated spans cut out.

    ``keep_first=True`` spares the occurrence with the smallest
    ``(doc_id, pos)`` per repeated gram (the Lee et al. all-but-one
    setting); the default removes every occurrence (the conservative
    hygiene setting).  Keep-one is per-gram and best-effort at fixed-n
    granularity: a spared occurrence is never cut by its OWN gram, but a
    DIFFERENT overlapping repeated gram in the same document can still
    cover part of it (resolving such interactions exactly needs global
    span arbitration, which no longer decomposes into one aggregation).

    Output: ``(doc_id, text, n_tokens_removed)``.  Documents with no
    repeated span keep their ORIGINAL text byte-for-byte; documents that
    lose spans are reassembled from the kept tokens of the normalized
    token stream (single spaces, lowercased, punctuation-stripped — the
    same tokenization the span detection ran on; byte-range surgery on the
    raw text would need a char-offset tokenizer, out of scope here).
    """
    toks = docs.select(
        F.col(id_col), F.posexplode(tokens_expr(F.col(text_col)))
    ).select(id_col, F.col("pos").alias("tok_idx"), F.col("col").alias("token"))

    spans = duplicate_spans(
        docs, n, min_count=min_count, id_col=id_col, text_col=text_col
    )
    if keep_first:
        # min-struct AGGREGATION, not row_number over a per-gram window: a
        # hot boilerplate gram would otherwise pile every occurrence into
        # one window task; the aggregation keeps map-side combining
        firsts = spans.groupBy(*_HASH_KEYS).agg(
            F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
                "__first"
            )
        )
        spans = (
            spans.join(firsts, _HASH_KEYS)
            .filter(
                ~(
                    (F.col(id_col) == F.col("__first.i"))
                    & (F.col("pos") == F.col("__first.p"))
                )
            )
            .drop("__first")
        )
    # covered token indices: union of [pos, pos+n) — overlapping spans
    # merge for free in the distinct set
    covered = spans.select(
        id_col, F.explode(F.sequence("pos", F.col("pos") + F.lit(n - 1))).alias("tok_idx")
    ).distinct()

    kept = toks.join(covered, [id_col, "tok_idx"], "left_anti")
    removed_counts = covered.groupBy(id_col).agg(
        F.count("*").alias("n_tokens_removed")
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("tok_idx", "token"))
                    ),
                    lambda s: s["token"],
                ),
            ).alias("__rebuilt")
        )
    )
    # untouched documents keep their ORIGINAL text (no lossy re-tokenize/
    # reassemble round-trip for the — typical — majority of the corpus);
    # docs whose every token was covered vanish from `kept` and re-attach
    # as empty strings so the operator is row-preserving
    return (
        docs.select(id_col, F.col(text_col).alias("__orig"))
        .join(rebuilt, id_col, "left")
        .join(removed_counts, id_col, "left")
        .select(
            id_col,
            F.when(
                F.coalesce("n_tokens_removed", F.lit(0)) == 0, F.col("__orig")
            )
            .otherwise(F.coalesce("__rebuilt", F.lit("")))
            .alias(text_col),
            F.coalesce("n_tokens_removed", F.lit(0)).cast("long").alias(
                "n_tokens_removed"
            ),
        )
    )
