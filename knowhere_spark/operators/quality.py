"""N-gram language-model perplexity scoring — the CCNet-style quality
signal for training-data curation.

The ratio heuristics in :mod:`knowhere_spark.functions.text` (stopword /
punctuation / repetition fractions) catch structural junk; the standard
next tier scores each document under a language model trained on a
trusted corpus and filters by perplexity (CCNet, Wenzek et al. 2020, uses
a KenLM 5-gram; the Gopher/C4 pipelines use the same shape).  A full
KenLM is a native library; the distributed, dependency-free equivalent
here is an add-alpha-smoothed bigram model computed with two groupBys and
scored with three hash joins (the bigram table + two vocabulary-sized
unigram projections) plus a row-preserving join back to the docs — linear
in corpus size, no UDFs.  The unigram projections are forced broadcasts
(vocabulary-sized by construction); the bigram table scales with the
TRAINING corpus, so its join is left to AQE — forcing it would collect an
unbounded table onto the driver at exactly the trusted-corpus scale this
operator targets.

    lm = NgramLM.train(trusted_docs)
    scored = lm.score(candidate_docs)       # (doc_id, avg_logprob, perplexity, n_tokens)
    kept = lm.filter(candidate_docs, max_perplexity=1000.0)

Semantics: interpolated add-alpha bigram/unigram model,

    P(w2|w1) = lam * (C(w1 w2)+a)/(C(w1)+a*V) + (1-lam) * (C(w2)+a)/(N+a*V)

with V = |vocabulary| + 1 and N the training token count.  The unigram
interpolation is load-bearing, not a nicety: pure add-alpha scores an
UNSEEN context at exactly 1/V — better than fluent text with an
occasional novel continuation — so gibberish would outscore prose.  The
unigram term re-anchors unknown material to how (un)common its tokens
are.  Documents score the mean log-probability over their bigram
positions; ``perplexity = exp(-avg_logprob)``.  Everything stays finite
(smoothing floor, never -inf).  Documents with < 2 tokens carry no
bigram evidence and score NULL (callers decide; ``filter`` keeps them).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowhere_spark.functions.text import tokens_expr


def _bigram_index_expr(tok_col: str):
    """Index sequence over adjacent-pair starts of a token-array column —
    guarded for short arrays (``sequence(0, -1)`` would step DOWN and
    emit [0, -1]).  Shared by the LM's bigram extraction and the
    classifier's bigram terms: one copy of the off-by-one-prone idiom."""
    return F.when(
        F.size(tok_col) >= 2, F.sequence(F.lit(0), F.size(tok_col) - 2)
    ).otherwise(F.array().cast("array<int>"))


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) for every adjacent token pair."""
    toks = docs.select(F.col(id_col), tokens_expr(F.col(text_col)).alias("_t"))
    pairs = toks.select(
        id_col,
        F.explode(
            F.transform(
                _bigram_index_expr("_t"),
                lambda i: F.struct(
                    F.element_at("_t", i + 1).alias("w1"),
                    F.element_at("_t", i + 2).alias("w2"),
                ),
            )
        ).alias("g"),
    )
    return pairs.select(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))


def _doc_trigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, w1, w2, w3) for every adjacent token triple — the same
    guarded index idiom as the bigram extractor, one position shorter."""
    toks = docs.select(F.col(id_col), tokens_expr(F.col(text_col)).alias("_t"))
    idx = F.when(
        F.size("_t") >= 3, F.sequence(F.lit(0), F.size("_t") - 3)
    ).otherwise(F.array().cast("array<int>"))
    triples = toks.select(
        id_col,
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("_t", i + 1).alias("w1"),
                    F.element_at("_t", i + 2).alias("w2"),
                    F.element_at("_t", i + 3).alias("w3"),
                ),
            )
        ).alias("g"),
    )
    return triples.select(
        id_col,
        F.col("g.w1").alias("w1"),
        F.col("g.w2").alias("w2"),
        F.col("g.w3").alias("w3"),
    )


@dataclass
class NgramLM:
    """Trained n-gram LM (order 2 default — the CCNet-tier filter; order
    3 adds an interpolated trigram head, the KenLM-direction upgrade)."""

    unigrams: DataFrame          # (w, ct) token counts over the train corpus
    bigrams: DataFrame           # (w1, w2, c2)
    vocab_size: int              # |V| + 1 smoothing denominator term
    n_tokens: int                # N, total training tokens
    alpha: float
    lam: float                   # bigram weight in the bi/uni interpolation
    trigrams: DataFrame | None = None   # (w1, w2, w3, c3) — order=3 only
    lam3: float = 0.0                   # trigram weight when order=3

    @classmethod
    def train(
        cls,
        docs: DataFrame,
        *,
        alpha: float = 0.1,
        lam: float = 0.7,
        min_count: int = 1,
        id_col: str = "doc_id",
        text_col: str = "text",
        order: int = 2,
        lam3: float = 0.5,
    ) -> "NgramLM":
        """Count unigrams/bigrams (and trigrams at ``order=3``) over the
        (trusted) training corpus.

        ``min_count`` prunes the n-gram tables' long tail (hapax events
        dominate row count but carry almost no probability mass) —
        pruned events fall back to the smoothing floor at score time.
        The count tables are cached: ``score`` joins against them per
        call, and they are vocabulary-sized, not corpus-sized (the
        trigram table grows fastest — the same heavy-tail caveat as the
        bigram table, one order up; ``min_count >= 2`` is the sane
        default at crawl scale).

        ``order=3`` scores with the interpolation
        ``lam3·p_tri + (1-lam3)·(lam·p_bi + (1-lam)·p_uni)`` — a
        stronger context model in the KenLM direction while every piece
        stays a count join; ``order=2`` is byte-identical to the r4
        behavior (the lm_perplexity oracle pins it)."""
        if order not in (2, 3):
            raise ValueError(f"order={order} must be 2 or 3")
        g = _doc_bigrams(docs, id_col, text_col)
        toks = docs.select(
            F.explode(tokens_expr(F.col(text_col))).alias("w")
        )
        uni = toks.groupBy("w").agg(F.count("*").alias("ct")).cache()
        bi = (
            g.groupBy("w1", "w2")
            .agg(F.count("*").alias("c2"))
            .filter(F.col("c2") >= min_count)
            .cache()
        )
        tri = None
        if order == 3:
            tri = (
                _doc_trigrams(docs, id_col, text_col)
                .groupBy("w1", "w2", "w3")
                .agg(F.count("*").alias("c3"))
                .filter(F.col("c3") >= min_count)
                .cache()
            )
            tri.count()
        vocab = uni.count()           # materializes the cache lineage head
        # N = sum of the (already cached, vocab-sized) unigram counts — a
        # toks.count() here would re-scan and re-tokenize the full corpus
        n = uni.agg(F.coalesce(F.sum("ct"), F.lit(0))).collect()[0][0]
        bi.count()
        return cls(
            uni, bi, vocab + 1, int(n), float(alpha), float(lam),
            trigrams=tri, lam3=float(lam3) if order == 3 else 0.0,
        )

    def score(
        self,
        docs: DataFrame,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """(doc_id, n_bigrams, avg_logprob, perplexity) per document.

        Joins against the model tables; the corpus side never collects or
        broadcasts (and the bigram side's broadcast is AQE's call — see
        the module docstring).  OOV contexts use c1=0, unseen
        continuations c2=0 — both land on the smoothing floor.

        Order-3 models score trigram events instead and return
        ``(doc_id, n_events, avg_logprob, perplexity)`` — docs shorter
        than 3 tokens carry no trigram evidence (NULL scores), the same
        row-preserving contract as the bigram tier.
        """
        if self.trigrams is not None:
            return self._score_trigrams(docs, id_col=id_col, text_col=text_col)
        g = _doc_bigrams(docs, id_col, text_col)
        ctx = self.unigrams.select(F.col("w").alias("w1"), F.col("ct").alias("c1"))
        nxt = self.unigrams.select(F.col("w").alias("w2"), F.col("ct").alias("cu"))
        aV = self.alpha * self.vocab_size
        p_bi = (F.coalesce("c2", F.lit(0)) + F.lit(self.alpha)) / (
            F.coalesce("c1", F.lit(0)) + F.lit(aV)
        )
        p_uni = (F.coalesce("cu", F.lit(0)) + F.lit(self.alpha)) / (
            F.lit(self.n_tokens + aV)
        )
        scored = (
            g.join(self.bigrams, ["w1", "w2"], "left")
            .join(F.broadcast(ctx), "w1", "left")
            .join(F.broadcast(nxt), "w2", "left")
            .select(
                id_col,
                F.log(
                    F.lit(self.lam) * p_bi + F.lit(1.0 - self.lam) * p_uni
                ).alias("lp"),
            )
        )
        agg = scored.groupBy(id_col).agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg("lp").alias("avg_logprob"),
        )
        # row-preserving: < 2-token docs carry no bigram evidence -> NULLs
        return (
            docs.select(id_col)
            .join(agg, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                "avg_logprob",
                F.exp(-F.col("avg_logprob")).alias("perplexity"),
            )
        )

    def _score_trigrams(
        self, docs: DataFrame, *, id_col: str, text_col: str
    ) -> DataFrame:
        """Order-3 scoring: every trigram event interpolates
        ``lam3·p_tri + (1-lam3)·(lam·p_bi + (1-lam)·p_uni)``.  Model-table
        joins carry NO forced broadcast except the vocab-sized unigram
        projections — the trigram/bigram tables can be large and are
        AQE's call, same discipline as the bigram tier."""
        g = _doc_trigrams(docs, id_col, text_col)
        ctx2 = self.bigrams.select(
            F.col("w1"), F.col("w2"), F.col("c2").alias("c2ctx")
        )
        bi23 = self.bigrams.select(
            F.col("w1").alias("w2"), F.col("w2").alias("w3"),
            F.col("c2").alias("c2"),
        )
        ctx1 = self.unigrams.select(F.col("w").alias("w2"), F.col("ct").alias("c1"))
        nxt = self.unigrams.select(F.col("w").alias("w3"), F.col("ct").alias("cu"))
        aV = self.alpha * self.vocab_size
        p_tri = (F.coalesce("c3", F.lit(0)) + F.lit(self.alpha)) / (
            F.coalesce("c2ctx", F.lit(0)) + F.lit(aV)
        )
        p_bi = (F.coalesce("c2", F.lit(0)) + F.lit(self.alpha)) / (
            F.coalesce("c1", F.lit(0)) + F.lit(aV)
        )
        p_uni = (F.coalesce("cu", F.lit(0)) + F.lit(self.alpha)) / (
            F.lit(self.n_tokens + aV)
        )
        lower = F.lit(self.lam) * p_bi + F.lit(1.0 - self.lam) * p_uni
        scored = (
            g.join(self.trigrams, ["w1", "w2", "w3"], "left")
            .join(ctx2, ["w1", "w2"], "left")
            .join(bi23, ["w2", "w3"], "left")
            .join(F.broadcast(ctx1), "w2", "left")
            .join(F.broadcast(nxt), "w3", "left")
            .select(
                id_col,
                F.log(
                    F.lit(self.lam3) * p_tri + F.lit(1.0 - self.lam3) * lower
                ).alias("lp"),
            )
        )
        agg = scored.groupBy(id_col).agg(
            F.count("*").cast("long").alias("n_events"),
            F.avg("lp").alias("avg_logprob"),
        )
        return (
            docs.select(id_col)
            .join(agg, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_events", F.lit(0)).alias("n_events"),
                "avg_logprob",
                F.exp(-F.col("avg_logprob")).alias("perplexity"),
            )
        )

    def filter(
        self,
        docs: DataFrame,
        *,
        max_perplexity: float,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """``docs`` minus rows scoring above ``max_perplexity`` (the CCNet
        keep-the-head setting).  Docs with no bigram evidence are kept —
        length-based gates are a different filter's job."""
        s = self.score(docs, id_col=id_col, text_col=text_col)
        keep = s.filter(
            F.col("perplexity").isNull()
            | (F.col("perplexity") <= max_perplexity)
        ).select(id_col)
        return docs.join(keep, id_col, "leftsemi")

    def release(self) -> None:
        self.unigrams.unpersist()
        self.bigrams.unpersist()
        if self.trigrams is not None:
            self.trigrams.unpersist()


# ---------------------------------------------------------------------------
# linear quality classifier — the GPT-3 / CCNet filtering tier above the
# perplexity model
# ---------------------------------------------------------------------------

class QualityClassifier:
    """Document-quality classifier: logistic regression over hashed
    unigram+bigram token features — the fasttext-linear architecture the
    GPT-3 pipeline used (Brown et al. 2020, Appendix A: an LR trained to
    separate a trusted corpus from the raw crawl, then Pareto-thresholded
    to importance-sample documents; CCNet uses the same shape).

    Spark-first: tokenization is the shared native ``tokens_expr``,
    features are ``HashingTF`` (fixed-width, vocabulary-free — nothing to
    collect at 100 TB), training is MLlib ``LogisticRegression``
    (tree-aggregated distributed L-BFGS), and scoring is one JVM-side
    model transform — no Python in any hot path.

        clf = QualityClassifier.train(trusted_docs, crawl_docs)
        scored = clf.score(candidate_docs)    # (doc_id, quality_score)
        kept = clf.pareto_filter(candidate_docs)   # GPT-3's sampling rule
    """

    def __init__(self, model, num_features: int, id_col: str, text_col: str):
        self._model = model
        self.num_features = num_features
        self.id_col = id_col
        self.text_col = text_col

    # -- feature pipeline -----------------------------------------------------
    @staticmethod
    def _featurize(
        docs: DataFrame, num_features: int, id_col: str, text_col: str,
        keep: tuple = (),
    ):
        from pyspark.ml.feature import HashingTF

        toks = docs.select(
            F.col(id_col),
            *keep,
            # NULL text must featurize as the empty document, not NULL —
            # a NULL term array NPEs HashingTF and kills the whole stage
            # (a 100 TB crawl WILL have missing text fields)
            F.coalesce(
                tokens_expr(F.col(text_col)), F.array().cast("array<string>")
            ).alias("_t"),
        )
        # unigrams + joined bigrams in one term array: the bigram terms
        # carry the word-order signal a bag of unigrams loses
        terms = toks.select(
            id_col,
            *keep,
            F.concat(
                "_t",
                F.transform(
                    _bigram_index_expr("_t"),
                    lambda i: F.concat_ws(
                        "_", F.element_at("_t", i + 1), F.element_at("_t", i + 2)
                    ),
                ),
            ).alias("_terms"),
        )
        tf = HashingTF(inputCol="_terms", outputCol="_features",
                       numFeatures=num_features)
        return tf.transform(terms)

    @classmethod
    def train(
        cls,
        positive_docs: DataFrame,
        negative_docs: DataFrame,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_features: int = 1 << 18,
        max_iter: int = 30,
        reg_param: float = 1e-4,
    ) -> "QualityClassifier":
        """Fit on trusted (label 1) vs raw (label 0) documents."""
        from pyspark.ml.classification import LogisticRegression

        data = positive_docs.select(
            F.col(id_col), F.col(text_col), F.lit(1.0).alias("_label")
        ).unionByName(
            negative_docs.select(
                F.col(id_col), F.col(text_col), F.lit(0.0).alias("_label")
            )
        )
        # the label rides THROUGH featurization — joining it back on
        # id_col would be many-to-many when the two corpora carry
        # independent id spaces (the normal separately-ingested case),
        # silently training every colliding doc with both labels
        feats = cls._featurize(data, num_features, id_col, text_col,
                               keep=("_label",))
        lr = LogisticRegression(
            featuresCol="_features", labelCol="_label",
            maxIter=max_iter, regParam=reg_param, standardization=False,
        )
        return cls(lr.fit(feats), num_features, id_col, text_col)

    def score(self, docs: DataFrame) -> DataFrame:
        """(id_col, quality_score) — P(trusted | doc) in [0, 1]."""
        from pyspark.ml.functions import vector_to_array

        feats = self._featurize(docs, self.num_features, self.id_col, self.text_col)
        out = self._model.transform(feats)
        return out.select(
            self.id_col,
            vector_to_array("probability").getItem(1).alias("quality_score"),
        )

    def pareto_filter(
        self, docs: DataFrame, *, alpha: float = 9.0, seed: int = 42
    ) -> DataFrame:
        """GPT-3's stochastic quality sampling (Brown et al. 2020 App. A):
        keep a document iff ``pareto(alpha) > 1 - score`` — high-quality
        docs are almost always kept, low-quality docs survive with small
        probability (keeping the tail diverse instead of hard-thresholded).

        The Pareto draw is DETERMINISTIC per (doc, seed): a uniform from
        ``xxhash64(id, seed)`` inverted through the Pareto CDF — re-running
        the filter reproduces the same kept set, the reproducibility a
        training-data pipeline needs."""
        scored = self.score(docs)
        # u strictly inside (0,1): (h%p + 1)/(p + 2) — u=0 would make the
        # pareto draw exactly 0 and unconditionally drop that doc even at
        # quality_score 1.0 (one deterministic casualty per ~5e8 ids)
        p = 1_000_000_007
        u = (
            (F.abs(F.xxhash64(F.col(self.id_col), F.lit(seed))) % F.lit(p) + F.lit(1))
            .cast("double") / F.lit(float(p + 2))
        )
        pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
        kept = scored.filter(pareto > (F.lit(1.0) - F.col("quality_score")))
        return docs.join(kept.select(self.id_col), self.id_col, "left_semi")


# ---------------------------------------------------------------------------
# CCNet head/middle/tail perplexity bucketing
# ---------------------------------------------------------------------------

def perplexity_buckets(
    scores: DataFrame,
    *,
    by_col: str | None = "lang",
    ppl_col: str = "perplexity",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    accuracy: int = 10_000,
    exact: bool = False,
) -> DataFrame:
    """CCNet's corpus split (Wenzek et al. 2020 §4.3): per language,
    bucket documents into ``head`` / ``middle`` / ``tail`` by perplexity
    percentile (head = lowest perplexity = most fluent).  Input is a
    scored frame (e.g. ``NgramLM.score`` joined back to langid); output
    adds a ``ppl_bucket`` column.

    The 100 TB shape: ONE aggregation computes the two percentile
    thresholds per group (``percentile_approx`` — a mergeable sketch, so
    the pass is map-side combined), then a broadcast join assigns buckets
    at scan speed.  The naive ``ntile`` window would sort each language
    on a single task — English alone is most of a crawl.  NULL
    perplexity (no model evidence) stays NULL-bucketed; a length gate is
    a different filter's job.

    ``exact=True`` swaps the sketch for discrete order statistics — the
    cut is the value at rank ``ceil(q·n)`` per group (an ACTUAL data
    value, no interpolation), computed with a per-group sort.  That is
    oracle-grade determinism for gates and small corpora; production
    keeps the default sketch (a per-group sort of English is exactly
    the 100 TB anti-pattern the sketch exists to avoid)."""
    ppl = F.col(ppl_col)
    grp = [by_col] if by_col is not None else []
    if exact:
        from pyspark.sql import Window

        nn = scores.filter(ppl.isNotNull())
        w = Window.partitionBy(*grp).orderBy(F.col("__p").asc())
        # the r-th order statistic is tie-order-invariant, so no
        # tie-breaker is needed in the window; the group count rides the
        # SAME window partition (one stage, no second scan of the input
        # plan — which in gate use is a full LM-scoring DAG)
        ranked = (
            nn.select(*grp, ppl.alias("__p"))
            .withColumn("__rk", F.row_number().over(w))
            .withColumn(
                "__n", F.count("*").over(Window.partitionBy(*grp))
            )
        )
        cuts_df = ranked.groupBy(*grp).agg(
            F.max(
                F.when(
                    F.col("__rk")
                    == F.ceil(F.lit(float(cuts[0])) * F.col("__n")),
                    F.col("__p"),
                )
            ).alias("__c1"),
            F.max(
                F.when(
                    F.col("__rk")
                    == F.ceil(F.lit(float(cuts[1])) * F.col("__n")),
                    F.col("__p"),
                )
            ).alias("__c2"),
        )
    else:
        cuts_df = (
            scores.filter(ppl.isNotNull())
            .groupBy(*grp)
            .agg(
                F.percentile_approx(ppl, float(cuts[0]), accuracy).alias("__c1"),
                F.percentile_approx(ppl, float(cuts[1]), accuracy).alias("__c2"),
            )
        )
    joined = (
        scores.join(F.broadcast(cuts_df), on=grp, how="left")
        if grp
        else scores.crossJoin(F.broadcast(cuts_df))
    )
    bucket = (
        F.when(ppl.isNull(), F.lit(None).cast("string"))
        # a NULL group key never matches the cuts join (and a group whose
        # every row is NULL-ppl has no thresholds): without this guard such
        # rows fall through `ppl <= NULL` to 'tail' and the most fluent
        # unlabeled docs get silently discarded from head/middle splits
        .when(F.col("__c1").isNull(), F.lit(None).cast("string"))
        .when(ppl <= F.col("__c1"), F.lit("head"))
        .when(ppl <= F.col("__c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.withColumn("ppl_bucket", bucket).drop("__c1", "__c2")


# ---------------------------------------------------------------------------
# compression-ratio quality signal
# ---------------------------------------------------------------------------

_COMP_SCHEMA = "doc_id long, n_chars int, zlib_ratio double"


def compression_signals(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """``(doc_id, n_chars, zlib_ratio)`` — compressed/uncompressed byte
    ratio per document, the cheap redundancy detector production corpus
    filters use alongside the Gopher fractions: templated/boilerplate/
    repetitive pages compress far below prose (~<0.3 vs ~0.4-0.6), and
    near-random/binary junk sits near 1.0.

    Arrow-batched mapInPandas over stdlib ``zlib`` (no native SQL
    compressor exists) — per-row work, no shuffle.  Empty/NULL text
    scores ratio 1.0 (nothing to compress ≠ redundant)."""
    import pandas as pd
    import zlib

    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    lvl = int(level)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_chars, ratios = [], []
            for tx in pdf["text"]:
                b = (tx or "").encode("utf-8", errors="replace")
                n_chars.append(len(tx) if tx is not None else 0)
                ratios.append(
                    len(zlib.compress(b, lvl)) / len(b) if b else 1.0
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_chars": n_chars, "zlib_ratio": ratios}
            )

    return src.mapInPandas(kernel, _COMP_SCHEMA)
