"""Text-analysis functions: tokenization contract, quality features,
language-ID heuristic, fingerprints, shingles."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowhere_spark.functions.text import (
    fingerprint_expr,
    langid_expr,
    quality_features_expr,
    shingles_expr,
    term_hash_expr,
    token_count_expr,
    tokens_expr,
)


def test_tokens_contract(spark):
    df = spark.createDataFrame([("Hello, World!  x2  ",)], "text string")
    [row] = df.select(tokens_expr(F.col("text")).alias("t")).collect()
    assert row["t"] == ["hello", "world", "x2"]


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [(0, "The cat, the dog: and a bird!"), (1, "")], "id long, text string"
    )
    feats = quality_features_expr(F.col("text"))
    rows = {r["id"]: r for r in df.select("id", *[v.alias(k) for k, v in feats.items()]).collect()}
    assert rows[0]["n_tokens"] == 7
    assert rows[0]["stopword_ratio"] == 4 / 7  # the, the, and, a
    assert rows[0]["punct_ratio"] > 0
    assert rows[1]["n_tokens"] == 0 and rows[1]["stopword_ratio"] == 0.0


def test_langid(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat is on the mat and it is happy"),
            (1, "el gato y la casa de los perros en un dia"),
            (2, "le chat et les maisons dans une ville"),
            (3, "xyzzy plugh"),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r["lang"] for r in df.select("id", langid_expr(F.col("text")).alias("lang")).collect()}
    assert rows[0] == "en" and rows[1] == "es" and rows[2] == "fr" and rows[3] == "unknown"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Spark JOIN window"), (1, "spark join... WINDOW!"), (2, "spark join windows")],
        "id long, text string",
    )
    rows = {r["id"]: r["fp"] for r in df.select("id", fingerprint_expr(F.col("text")).alias("fp")).collect()}
    assert rows[0] == rows[1] != rows[2]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    [row] = df.select(shingles_expr(F.col("text"), 3).alias("s")).collect()
    assert sorted(row["s"]) == ["a b c", "b c d"]


def test_term_hash_matches_duckdb(spark):
    """Cross-engine portability of the md5-based term hash."""
    import duckdb

    terms = ["spark", "join", "x1", "ünïcode"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["h"]
        for r in df.select("term", term_hash_expr(F.col("term")).alias("h")).collect()
    }
    con = duckdb.connect()
    for t in terms:
        [(want,)] = con.execute(
            "SELECT CAST(concat('0x', substr(md5(?), 1, 15)) AS BIGINT)", [t]
        ).fetchall()
        assert got[t] == want, t


def test_bpe_token_count(spark):
    from pyspark.sql import functions as F

    from knowhere_spark.functions.text import bpe_token_count_expr

    rows = [
        (1, "hello world"),          # 2 pieces, len 5 each -> 2*2 = 4
        (2, "it's fine"),            # it + 's + fine -> 1 + 1 + 1 = 3
        (3, ""),                     # empty -> 0
        (4, "a1b2!!"),               # a,1,b,2,!! -> 5
        (5, "internationalization"), # len 20 -> 1 + floor(19/4) = 5
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count_expr(F.col("text")).alias("n")
        ).collect()
    }
    assert got == {1: 4, 2: 3, 3: 0, 4: 5, 5: 5}


def test_pii_scrub_and_normalize(spark):
    from knowhere_spark.functions.text import normalize_text_expr, pii_scrub_expr

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.co or call +1 (555) 010-7788"),
            (2, "server at 192.168.10.255 \t has  logs\x01here"),
            (3, "no pii here"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["s"] for r in df.select(
        "id", pii_scrub_expr(F.col("text")).alias("s")).collect()}
    assert out[1] == "mail me at <EMAIL> or call <PHONE>"
    assert "<IP>" in out[2]
    assert out[3] == "no pii here"

    norm = {r["id"]: r["n"] for r in df.select(
        "id", normalize_text_expr(F.col("text")).alias("n")).collect()}
    assert norm[2] == "server at 192.168.10.255 has logs here"
    assert norm[3] == "no pii here"


def test_repetition_features(spark):
    from knowhere_spark.functions.text import repetition_features_expr

    df = spark.createDataFrame(
        [
            (0, "alpha beta\nalpha beta\ngamma delta"),       # 2/3 dup lines
            (1, "one two three four"),                         # clean
            (2, "spam spam spam spam spam"),                   # modal 2-gram
            (3, ""),                                           # empty
        ],
        "id long, text string",
    )
    feats = repetition_features_expr(F.col("text"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id", *[v.alias(k) for k, v in feats.items()]
        ).collect()
    }
    assert abs(rows[0]["dup_line_frac"] - 1 / 3) < 1e-9  # 1 - 2 distinct / 3
    # dup lines hold 2*len("alpha beta")=20 of 20+11=31 line chars
    assert abs(rows[0]["dup_line_char_frac"] - 20 / 31) < 1e-9
    assert rows[1]["dup_line_frac"] == 0.0
    assert rows[1]["top_2gram_frac"] == 1 / 3  # all 2-grams distinct
    assert rows[2]["top_2gram_frac"] == 1.0    # "spam spam" is every 2-gram
    assert rows[3]["dup_line_frac"] == 0.0
    assert rows[3]["top_2gram_frac"] == 0.0


def test_repetition_filter(spark):
    from knowhere_spark.operators.pipeline import repetition_filter

    df = spark.createDataFrame(
        [
            (0, "a clean document with distinct words here"),
            (1, "copy line\ncopy line\ncopy line\ncopy line"),
        ],
        "doc_id long, text string",
    )
    kept = repetition_filter(df)
    assert [r["doc_id"] for r in kept.collect()] == [0]


def test_decontaminate(spark):
    from knowhere_spark.operators.decontaminate import (
        contamination_report,
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "a completely unrelated document about spark plans"),
            (2, "prefix words then the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog",)],
        "doc_id long, text string",
    )
    report = {
        r["doc_id"]: r
        for r in contamination_report(docs, bench, n=5).collect()
    }
    # doc 0 and doc 2 share all the benchmark 5-grams; doc 1 shares none
    assert report[0]["n_hit_grams"] > 0
    assert report[2]["n_hit_grams"] > 0
    assert report[1]["n_hit_grams"] == 0
    assert report[0]["contamination"] > 0.5

    clean = decontaminate(docs, bench, n=5)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1]


def test_normalize_unicode_nfkc(spark):
    """NFKC collapses fullwidth/ligature/compatibility variants so crawl
    duplicates hash together; NULLs pass through; out_col adds a column."""
    from knowhere_spark.functions.text import fingerprint_expr, normalize_unicode

    rows = [
        (0, "hello world"),
        (1, "ｈｅｌｌｏ world"),   # ｈｅｌｌｏ fullwidth
        (2, "heﬂlo world"),                        # ﬂ ligature (different text)
        (3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in normalize_unicode(docs).collect()}
    assert out[0] == out[1] == "hello world"
    assert out[2] == "hefllo world"
    assert out[3] is None
    # post-normalization, 0 and 1 fingerprint identically (exact-dup ready)
    fps = {
        r.doc_id: r.fp
        for r in normalize_unicode(docs)
        .select("doc_id", fingerprint_expr(F.col("text")).alias("fp"))
        .collect()
    }
    assert fps[0] == fps[1]
    # out_col keeps the original column
    wide = normalize_unicode(docs, out_col="text_nfkc").collect()
    assert {"text", "text_nfkc"} <= set(wide[0].asDict())
    # NFC leaves compatibility forms alone
    nfc = {r.doc_id: r.text for r in normalize_unicode(docs, form="NFC").collect()}
    assert nfc[1] != "hello world"
