"""Text functions: tokenization, term-frequency sparse vectors, shingles,
fingerprints, quality/language heuristics.

These back (a) the sparse/BM25 operators (text → MAP<INT,FLOAT> term
vectors, the engine's sparse DataSet form, SURVEY.md §1.2) and (b) the
training-data-pipeline text-analysis ops (language-ID, quality scoring,
token counting, fingerprinting).

Everything here is native Spark SQL expressions (no Python UDFs) so the
same logic is expressible 1:1 in the DuckDB oracle and stays inside
whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tokenizer contract shared with the DuckDB oracles:
#: lower → split on non-alphanumeric runs → drop empties
TOKEN_SPLIT_RE = "[^a-z0-9]+"


from knowhere_spark.functions.distance import bind1 as _bind1  # shared HOF bind


def tokens_expr(text: Column) -> Column:
    """lowercased alnum tokens, empties removed."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


#: BPE-ish pre-tokenizer: the GPT-2 pattern's shape — contractions,
#: letter runs, digit runs, non-space symbol runs — approximated with
#: POSIX classes so DuckDB's regexp engine computes the identical split.
BPE_TOKEN_RE = r"'[a-z]+|[a-z]+|[0-9]+|[^a-z0-9\s]+"


def bpe_token_count_expr(text: Column) -> Column:
    """Subword-style token count: count of BPE-pre-tokenizer matches plus
    a length penalty for long pieces (every started 4-char chunk beyond
    the first counts again) — the cheap engine-portable stand-in for a
    real BPE vocab merge, good for corpus token budgeting."""
    pieces = F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_RE), 0)
    per_piece = F.transform(
        pieces,
        lambda p: F.lit(1) + F.floor((F.length(p) - 1) / F.lit(4)).cast("int"),
    )
    return F.aggregate(per_piece, F.lit(0), lambda acc, x: acc + x).cast("long")


def term_hash_expr(term: Column, dim: int | None = None) -> Column:
    """Stable term → int id via md5 (first 15 hex digits → bigint), optionally
    folded into [0, dim).  Engine-portable: DuckDB computes the identical
    value with ``CAST('0x'||substr(md5(t),1,15) AS BIGINT)``."""
    h = F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long")
    if dim is not None:
        return F.pmod(h, F.lit(dim)).cast("int")
    return h


def shingles_expr(text: Column, n: int = 3) -> Column:
    """Word-level n-gram shingles (distinct), the MinHash/Jaccard unit.
    Tokens are bound once (_bind1) — inlining them into the per-shingle
    slice re-tokenizes the document per shingle (O(T²), measured ~19x on
    2k-token docs)."""
    return _bind1(
        tokens_expr(text),
        lambda toks: F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    )


def fingerprint_expr(text: Column) -> Column:
    """Deterministic 64-bit-ish document fingerprint: md5 of the normalized
    token stream (rolling-hash analog, engine-portable)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(" ", tokens_expr(text))), 1, 15), 16, 10
    ).cast("long")


# --- quality scoring --------------------------------------------------------

_STOPWORDS = (
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that", "for", "on",
)


def quality_features_expr(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features for quality filtering
    (training-data-pipeline op; heuristics in the C4/Gopher tradition)."""
    toks = tokens_expr(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    mean_tok_len = F.when(n_tok > 0, F.length(F.concat_ws("", toks)) / n_tok).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "stopword_ratio": F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)),
        "mean_token_len": mean_tok_len.cast("double"),
    }


#: tiny per-language stopword panels for the n-gram/stopword language-ID
#: heuristic (scores are engine-portable counts, no model weights)
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "que", "dans"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
}


def langid_scores_expr(text: Column) -> dict[str, Column]:
    """Marker-stopword hit counts per language."""
    toks = tokens_expr(text)
    out = {}
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def langid_expr(text: Column, default: str = "unknown") -> Column:
    """argmax language with deterministic tie-break (lexicographic), or
    ``default`` when no marker hits."""
    scores = langid_scores_expr(text)
    # struct array ordered by (score, -rank-of-lang): ties resolve to the
    # lexicographically smallest language, deterministically
    ordered = sorted(scores.items())
    pairs = F.array(
        *[
            F.struct(s.alias("score"), F.lit(-i).alias("negprio"), F.lit(lang).alias("lang"))
            for i, (lang, s) in enumerate(ordered)
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit(default))


# --- cleaning ops (standard pre-training scrub passes) ----------------------

#: PII patterns kept to an engine-portable subset (no lookaround, POSIX
#: classes) so Spark's Java regex and DuckDB's RE2 agree byte-for-byte.
PII_PATTERNS: list[tuple[str, str]] = [
    # email
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    # ipv4
    ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    # phone-ish: +country/area groups with separators, 7+ digits total
    ("\\+?[0-9][0-9()\\-. ]{6,}[0-9]", "<PHONE>"),
]


def pii_scrub_expr(text: Column) -> Column:
    """Replace emails / IPv4s / phone-shaped digit runs with typed
    placeholder tags — the standard PII scrub pass of a pre-training
    pipeline.  Order matters (emails before phones, so digits inside an
    address aren't half-eaten); every pattern is global-replace."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def repetition_features_expr(text: Column) -> dict[str, Column]:
    """Gopher-style intra-document repetition signals (the "repetitious
    text" filters of the Gopher/MassiveText rules), as pure native SQL
    expressions — per-row column math, no shuffle, engine-portable:

    - ``dup_line_frac``: fraction of non-empty (trimmed) lines that are
      duplicates of another line (``1 - distinct/total``).
    - ``dup_line_char_frac``: fraction of line characters living in lines
      that occur more than once.
    - ``top_2gram_frac``: fraction of the document's token 2-grams taken
      by the single most frequent 2-gram.

    Per-doc work is O(L log L) in lines / 2-grams (sort + one
    equal-adjacent fold — NOT a rescan per distinct value, which was
    quadratic and blew up on book-length documents); all native
    expressions, values identical to the definitionally-quadratic form."""
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, l: acc + F.length(l)
    )
    # a sorted occurrence is a duplicate iff it equals a sorted neighbor —
    # O(L log L) instead of scanning all lines per line.  The sorted array
    # is BOUND ONCE as a lambda variable (_bind1): Spark has no CSE across
    # HOF lambda scope, so an inline array_sort would re-sort per
    # element_at.  The when-guards keep indices in [1, n] under ANSI.
    def _dup_chars(sl):
        n_sl = F.size(sl)
        return F.aggregate(
            F.when(n_sl > 0, F.sequence(F.lit(1), n_sl)).otherwise(
                F.array().cast("array<int>")
            ),
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                (
                    F.when(i > 1, F.element_at(sl, i) == F.element_at(sl, i - 1))
                    .otherwise(F.lit(False))
                )
                | (
                    F.when(i < n_sl, F.element_at(sl, i) == F.element_at(sl, i + 1))
                    .otherwise(F.lit(False))
                ),
                F.length(F.element_at(sl, i)),
            ).otherwise(F.lit(0)),
        )

    dup_line_chars = _bind1(F.array_sort(lines), _dup_chars)
    dup_line_char_frac = F.when(
        line_chars > 0, dup_line_chars.cast("double") / line_chars
    ).otherwise(F.lit(0.0))

    # tokens bound once — the per-gram slice must not re-tokenize (O(T²))
    grams = _bind1(
        tokens_expr(text),
        lambda toks: F.transform(
            F.when(
                F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)
            ).otherwise(F.array().cast("array<int>")),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    )
    # longest equal-adjacent run over the SORTED grams == the modal gram's
    # count — one O(G log G) sort + one linear fold, not a per-distinct-gram
    # rescan (O(G^2) blew up on book-length documents); sorted array bound
    # once (_bind1), same reason as above
    def _modal_run(sg):
        ng = F.size(sg)

        def _step(acc, i):
            newcur = F.when(
                F.element_at(sg, i) == F.element_at(sg, i - 1), acc["cur"] + 1
            ).otherwise(F.lit(1))
            return F.struct(
                newcur.alias("cur"), F.greatest(acc["best"], newcur).alias("best")
            )

        return F.aggregate(
            F.when(ng >= 2, F.sequence(F.lit(2), ng)).otherwise(
                F.array().cast("array<int>")
            ),
            F.struct(F.lit(1).alias("cur"), F.lit(1).alias("best")),
            _step,
            lambda acc: acc["best"],
        )

    max_cnt = _bind1(F.array_sort(grams), _modal_run)
    top_2gram_frac = F.when(
        F.size(grams) > 0, max_cnt.cast("double") / F.size(grams)
    ).otherwise(F.lit(0.0))
    return {
        "dup_line_frac": dup_line_frac.cast("double"),
        "dup_line_char_frac": dup_line_char_frac.cast("double"),
        "top_2gram_frac": top_2gram_frac.cast("double"),
    }


def normalize_text_expr(text: Column) -> Column:
    """Canonical text normalization: lowercase, strip control chars,
    collapse whitespace runs to single spaces, trim — the usual
    pre-dedup normalization so near-identical docs hash together."""
    out = F.lower(text)
    out = F.regexp_replace(out, "[\\x00-\\x1f]", " ")
    out = F.regexp_replace(out, "[ \\t]+", " ")
    return F.trim(out)


def normalize_unicode(
    docs, *, text_col: str = "text", form: str = "NFKC", out_col: str | None = None
):
    """Unicode normalization (NFKC default — the C4/CCNet pre-dedup pass:
    fullwidth forms, ligatures, compatibility codepoints collapse to
    canonical equivalents, so visually-identical crawl variants hash
    together).

    This is the one text stage that genuinely needs Python (Spark has no
    built-in Unicode normalizer): stdlib ``unicodedata.normalize`` inside
    an Arrow-batched ``mapInPandas`` — per-row, stateless, scan-speed, no
    shuffle.  Composes BEFORE :func:`normalize_text_expr` (casefold/
    whitespace are cheaper JVM-side)."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    target = out_col or text_col
    schema = (
        docs.schema
        if target in docs.columns
        else StructType(
            list(docs.schema.fields) + [StructField(target, StringType())]
        )
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            out[target] = pd.Series(
                [
                    unicodedata.normalize(form, t) if isinstance(t, str) else t
                    for t in pdf[text_col]
                ],
                index=pdf.index, dtype="object",
            )
            yield out

    return docs.mapInPandas(kernel, schema)
