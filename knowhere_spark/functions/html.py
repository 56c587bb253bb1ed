"""HTML → text extraction — the step BEFORE every text-quality /
dedup operator when the corpus arrives as crawl HTML (WARC responses,
scraped pages).

Curation-grade, not browser-grade: no DOM, no CSS layout — a chain of
regexp passes that (1) removes non-content blocks (script / style /
comments), (2) strips tags, (3) decodes the common named entities and
drops numeric ones, (4) collapses whitespace.  That is exactly the
fidelity C4/CCNet-class pipelines run before quality filtering, and it
keeps the whole operator INSIDE Spark's JVM codegen — `regexp_replace`
chains, no Python in the hot path (the 100 TB design rule).

The pass list is data (:data:`HTML_TEXT_STEPS`), shared with the DuckDB
oracle so the gate's mirror is generated from the same table rather
than hand-duplicated.  Patterns stay inside the RE2 ∩ Java-regex common
subset (no backreferences, inline ``(?is)`` flags, non-greedy ``.*?``)
so both engines execute them identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ordered (pattern, replacement) regexp passes.  Order is load-bearing:
#: non-content blocks go before the generic tag strip (their bodies must
#: vanish, not become text); entities decode after tags (so ``&lt;p&gt;``
#: never becomes a strippable tag — the classic double-decode hole);
#: ``&amp;`` decodes LAST among entities for the same reason; whitespace
#: collapse runs at the end.
HTML_TEXT_STEPS: tuple[tuple[str, str], ...] = (
    # 1. non-content blocks (case-insensitive, dot-matches-newline)
    (r"(?is)<script\b[^>]*>.*?</script[ \t\r\n\f]*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style[ \t\r\n\f]*>", " "),
    (r"(?s)<!--.*?-->", " "),
    # 2. every remaining tag (incl. multi-line attribute soup)
    (r"(?s)<[^>]*>", " "),
    # 3. entities: the common named set decodes, numeric ones drop
    #    (curation-grade: a lone &#8217; is not worth a per-row UDF)
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&apos;", "'"),
    (r"&#[0-9]+;|&#[xX][0-9a-fA-F]+;", ""),
    (r"&amp;", "&"),
    # 4. whitespace collapse (trim is applied by the expression builder).
    #    Explicit class, not \s: Java's \s includes \x0B, RE2's doesn't —
    #    the explicit class makes both engines byte-identical here.
    (r"[ \t\r\n\f]+", " "),
)


def html_to_text_expr(col: Column | str) -> Column:
    """Extracted visible text of an HTML column — one codegen'd
    `regexp_replace` chain (:data:`HTML_TEXT_STEPS`) plus a final trim.
    NULL-safe (regexp_replace propagates NULL)."""
    x = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_TEXT_STEPS:
        x = F.regexp_replace(x, pat, rep)
    return F.trim(x)


def html_text_steps_sql(expr: str) -> str:
    """The SAME pass chain as DuckDB SQL over ``expr`` — the oracle
    mirror is generated from :data:`HTML_TEXT_STEPS`, never duplicated
    by hand.  DuckDB's regexp engine is RE2; the step table stays inside
    the RE2 ∩ Java common subset by construction."""
    out = expr
    for pat, rep in HTML_TEXT_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"
