"""Model-free text embeddings — the feature-hashing trick (Weinberger et
al. 2009, "Feature Hashing for Large Scale Multitask Learning"; public
literature) as a pure-DataFrame operator.

``text_embedding_hashed`` turns the documents table into L2-normalized
dense vectors entirely JVM-side (tokenize → signed hash into ``dim``
buckets → TF×smoothed-IDF → codegen'd dense-array build), so every
vector operator in the engine — BruteForce/IVF/HNSW search, SemDeDup,
embedding near-dup, fusion — runs straight off raw text without an
external model.  At 100 TB the plan is two groupBys (per-(doc,term)
counts, per-(doc,bucket) sums) plus one vocabulary-sized IDF join that
AQE broadcasts when small; no UDF, no collect, no model artifact beyond
the (term, idf) table.

The signed hash (±1 per term) makes colliding terms cancel in
expectation instead of biasing buckets upward — the property that makes
hashed embeddings usable at small ``dim``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowhere_spark.functions.text import tokens_expr


def hashed_idf_table(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(term, idf): smoothed IDF ``log((N+1)/(df+1)) + 1`` over the
    corpus — the reusable model half of the embedding (fit once on a
    reference corpus, apply to any stream/batch, like a tokenizer
    artifact).  ``df`` is DOCUMENT frequency (terms counted once per
    doc, never per occurrence — collection frequency would go NEGATIVE
    for any term averaging > e occurrences per doc and flip its signed
    hash, amplifying stopwords instead of damping them)."""
    # array_distinct BEFORE the explode: each doc contributes each term
    # once, so the groupBy count IS document frequency — no extra shuffle
    doc_terms = docs.select(
        F.explode(F.array_distinct(tokens_expr(F.col(text_col)))).alias("term")
    )
    n_docs = docs.count()
    return (
        doc_terms.groupBy("term")
        .agg(F.count("*").alias("__df"))
        .select(
            "term",
            (
                F.log((F.lit(float(n_docs + 1))) / (F.col("__df") + 1.0)) + 1.0
            ).alias("idf"),
        )
    )


def text_embedding_hashed(
    docs: DataFrame,
    dim: int = 64,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf_table: DataFrame | None = None,
    use_idf: bool = True,
) -> DataFrame:
    """(doc_id, vec ARRAY<FLOAT>): L2-normalized hashed TF-IDF embedding.

    ``idf_table``: pass a pinned :func:`hashed_idf_table` to embed new
    data in a FROZEN space (the train-once contract every index family
    here follows); by default the IDF fits on ``docs`` itself.
    ``use_idf=False`` gives plain signed-hash TF (no corpus pass at all —
    fully stateless, the streaming-friendly form)."""
    if dim < 1:
        raise ValueError(f"dim={dim} must be >= 1")
    tf = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(tokens_expr(F.col(text_col))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    if use_idf:
        idf = idf_table if idf_table is not None else hashed_idf_table(
            docs, text_col=text_col
        )
        # vocabulary-sized side: no forced hint — AQE broadcasts real
        # vocabularies, a pathological one still joins safely
        tf = tf.join(idf, "term", "left").withColumn(
            "tf", F.col("tf") * F.coalesce(F.col("idf"), F.lit(1.0))
        )
    sgn = F.when(
        F.pmod(F.xxhash64(F.col("term"), F.lit("sign")), F.lit(2)) == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    buckets = (
        tf.select(
            "doc_id",
            F.pmod(F.xxhash64("term"), F.lit(dim)).cast("int").alias("bucket"),
            (F.col("tf") * sgn).alias("w"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("w").alias("w"))
    )
    dense = buckets.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "w"))).alias("__m")
    )
    # materialize the raw array, THEN its norm, THEN divide: an aggregate
    # inlined into the per-element transform lambda would re-evaluate per
    # element (Spark HOF scope has no CSE — measured quadratic)
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("__m")[i], F.lit(0.0)),
    )
    staged = dense.select("doc_id", arr.alias("__v")).withColumn(
        "__n",
        F.sqrt(F.aggregate("__v", F.lit(0.0), lambda acc, x: acc + x * x)),
    )
    vecs = staged.select(
        "doc_id",
        F.when(F.col("__n") == 0.0, F.col("__v"))
        .otherwise(F.transform("__v", lambda x: x / F.col("__n")))
        .cast("array<float>")
        .alias("vec"),
    )
    # row-preserving: zero-token docs (NULL/empty text) produce no terms
    # and would vanish at the tf groupBy — re-join and give them the zero
    # vector so one vector exists per input row (the NgramLM.score
    # contract)
    zero = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)), lambda i: F.lit(0.0)
    ).cast("array<float>")
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(vecs, "doc_id", "left")
        .select("doc_id", F.coalesce("vec", zero).alias("vec"))
    )
