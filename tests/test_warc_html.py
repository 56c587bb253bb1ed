"""WARC crawl ingestion (sources/warc.py) + HTML→text extraction
(functions/html.py) — the pipeline's front door: Common-Crawl-shaped
files in, the documents shape out."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from knowhere_spark.functions.html import html_to_text_expr
from knowhere_spark.sources.warc import (
    encode_http_response,
    encode_warc_record,
    parse_warc,
    read_warc,
    warc_responses_to_documents,
)

_HTML = (
    b"<html><head><title>T</title>"
    b"<style>p { color: red; }</style>"
    b"<script>if (1 < 2) { alert('x'); }</script></head>"
    b"<body><h1>Hello</h1>\n<p>crawl &amp; <b>curate</b>&nbsp;"
    b"&lt;fast&gt;&#8217;</p><!-- hidden --></body></html>"
)
_WANT_TEXT = "T Hello crawl & curate <fast>"


def _warc_file() -> bytes:
    recs = [
        encode_warc_record(
            "warcinfo", b"software: test\r\n",
            content_type="application/warc-fields",
        ),
        encode_warc_record(
            "request", b"GET / HTTP/1.1\r\nHost: a\r\n\r\n",
            url="http://a.example/",
            content_type="application/http; msgtype=request",
        ),
        encode_warc_record(
            "response", encode_http_response(_HTML),
            url="http://a.example/", record_id="<urn:uuid:1>",
        ),
        encode_warc_record(
            "response",
            encode_http_response(b"not found", status=404),
            url="http://a.example/missing",
        ),
        encode_warc_record(
            "response",
            encode_http_response(b'{"a": 1}', content_type="application/json"),
            url="http://a.example/api",
        ),
    ]
    return b"".join(recs)


def test_parse_warc_plain_and_gzip_variants():
    data = _warc_file()
    recs = list(parse_warc(data))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response", "response"
    ]
    ok = recs[2]
    assert ok["url"] == "http://a.example/"
    assert ok["http_status"] == 200
    assert ok["http_content_type"] == "text/html"
    assert ok["body"] == _HTML                 # HTTP head split off
    assert recs[3]["http_status"] == 404
    # whole-file gzip
    assert [r["url"] for r in parse_warc(gzip.compress(data))] == [
        r["url"] for r in recs
    ]
    # per-RECORD gzip members (the Common Crawl layout)
    members = b"".join(
        gzip.compress(encode_warc_record("response",
                                         encode_http_response(_HTML),
                                         url=f"http://m{i}.example/"))
        for i in range(3)
    )
    assert [r["url"] for r in parse_warc(members)] == [
        f"http://m{i}.example/" for i in range(3)
    ]
    # truncation: the intact prefix survives, no exception
    assert len(list(parse_warc(data[: len(data) - 40]))) == 4
    assert list(parse_warc(b"garbage")) == []
    assert list(parse_warc(b"")) == []


def test_parse_warc_wire_layers_and_charsets():
    """Real Common Crawl captures: non-UTF-8 bodies, chunked transfer
    framing, gzip/deflate content compression — none may crash, none
    may leak framing bytes into the text."""
    import zlib

    html_1252 = "<html><body><p>café résumé</p></body></html>"
    body_1252 = html_1252.encode("windows-1252")   # 0xE9 bytes: invalid UTF-8

    def resp(body, extra_headers=b"", ctype=b"text/html"):
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n"
            + extra_headers
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
        )

    def chunked(raw):
        out = b""
        for i in range(0, len(raw), 7):
            c = raw[i : i + 7]
            out += b"%x\r\n" % len(c) + c + b"\r\n"
        return out + b"0\r\n\r\n"

    plain_html = b"<html><body><p>hello chunked world</p></body></html>"
    recs = [
        # charset honored from Content-Type; invalid-UTF-8 never raises
        encode_warc_record(
            "response",
            resp(body_1252, ctype=b"text/html; charset=windows-1252"),
            url="http://cp1252.example/",
        ),
        # same bytes mislabeled utf-8: errors='replace', still total
        encode_warc_record(
            "response", resp(body_1252), url="http://bad-utf8.example/"
        ),
        # chunked framing: the hex size lines must NOT reach the text
        encode_warc_record(
            "response",
            resp(
                chunked(plain_html),
                extra_headers=b"Transfer-Encoding: chunked\r\n",
            ),
            url="http://chunked.example/",
        ),
        # gzip content-encoding
        encode_warc_record(
            "response",
            resp(
                gzip.compress(plain_html),
                extra_headers=b"Content-Encoding: gzip\r\n",
            ),
            url="http://gzip.example/",
        ),
        # zlib-wrapped deflate AND the common raw-deflate server bug
        encode_warc_record(
            "response",
            resp(
                zlib.compress(plain_html),
                extra_headers=b"Content-Encoding: deflate\r\n",
            ),
            url="http://deflate.example/",
        ),
        encode_warc_record(
            "response",
            resp(
                (lambda c: c.compress(plain_html) + c.flush())(
                    zlib.compressobj(wbits=-15)
                ),
                extra_headers=b"Content-Encoding: deflate\r\n",
            ),
            url="http://raw-deflate.example/",
        ),
        # chunked + gzip stacked (transfer layer undone first)
        encode_warc_record(
            "response",
            resp(
                chunked(gzip.compress(plain_html)),
                extra_headers=(
                    b"Transfer-Encoding: chunked\r\n"
                    b"Content-Encoding: gzip\r\n"
                ),
            ),
            url="http://both.example/",
        ),
        # corrupt gzip: best-effort keeps raw bytes, never raises
        encode_warc_record(
            "response",
            resp(
                b"\x1f\x8bgarbage-not-gzip",
                extra_headers=b"Content-Encoding: gzip\r\n",
            ),
            url="http://corrupt.example/",
        ),
    ]
    got = {r["url"]: r for r in parse_warc(b"".join(recs))}
    assert len(got) == 8
    assert got["http://cp1252.example/"]["body_text"] == html_1252
    # mislabeled utf-8: 0xE9 becomes U+FFFD, no exception
    assert "caf�" in got["http://bad-utf8.example/"]["body_text"]
    for u in (
        "http://chunked.example/", "http://gzip.example/",
        "http://deflate.example/", "http://raw-deflate.example/",
        "http://both.example/",
    ):
        assert got[u]["body"] == plain_html, u
        assert got[u]["body_text"] == plain_html.decode(), u
    assert got["http://corrupt.example/"]["body"] == b"\x1f\x8bgarbage-not-gzip"
    # non-response records carry no body_text
    assert list(parse_warc(_warc_file()))[0]["body_text"] is None


def test_wire_layer_empty_bodies_and_binary_gate():
    """r12 review regressions: a legitimately empty chunked body and a
    valid gzip of empty content must both yield b'' (not the framing /
    header bytes), and binary content types get NO body_text copy."""
    from knowhere_spark.sources.warc import _dechunk, _inflate

    assert _dechunk(b"0\r\n\r\n") == b""
    assert _inflate(gzip.compress(b""), "gzip") == b""
    # not-actually-gzip under a gzip label keeps raw bytes (best-effort)
    assert _inflate(b"plainly not gzip", "gzip") == b"plainly not gzip"

    def resp(body, ctype):
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
        )

    recs = [
        encode_warc_record(
            "response", resp(b"\xff\xd8\xffJPEGBYTES", b"image/jpeg"),
            url="http://img.example/",
        ),
        encode_warc_record(
            "response", resp(b"<p>hi</p>", b"text/html"),
            url="http://page.example/",
        ),
        # undeclared content type: decode (undeclared != binary)
        encode_warc_record(
            "response",
            b"HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\ntext",
            url="http://bare.example/",
        ),
    ]
    got = {r["url"]: r for r in parse_warc(b"".join(recs))}
    assert got["http://img.example/"]["body_text"] is None
    assert got["http://page.example/"]["body_text"] == "<p>hi</p>"
    assert got["http://bare.example/"]["body_text"] == "text"


def test_bridge_survives_non_utf8_bodies(spark, tmp_path):
    """The exact ADVICE r11 failure: one 0xE9 byte in an HTML body must
    not kill warc_responses_to_documents under Spark 4.1 ANSI decode."""
    rec = encode_warc_record(
        "response",
        encode_http_response(
            "<html><body><p>café</p></body></html>".encode(
                "windows-1252"
            ),
            content_type="text/html; charset=windows-1252",
        ),
        url="http://cp1252.example/",
    )
    p = tmp_path / "cc"
    p.mkdir()
    (p / "seg.warc").write_bytes(rec + _warc_file())
    rows = warc_responses_to_documents(read_warc(spark, str(p))).collect()
    by_url = {r["url"]: r["text"] for r in rows}
    assert by_url["http://cp1252.example/"] == "café"
    assert by_url["http://a.example/"] == _WANT_TEXT


def test_read_warc_chunked_yields(spark, tmp_path):
    """Kernel streams records out in bounded chunks: a file with more
    records than _KERNEL_CHUNK_ROWS still parses completely."""
    from knowhere_spark.sources import warc as warc_mod

    n = warc_mod._KERNEL_CHUNK_ROWS + 40
    data = b"".join(
        encode_warc_record(
            "response", encode_http_response(b"<p>x</p>"),
            url=f"http://n{i}.example/",
        )
        for i in range(n)
    )
    p = tmp_path / "big"
    p.mkdir()
    (p / "seg.warc").write_bytes(data)
    df = read_warc(spark, str(p))
    assert df.count() == n
    assert df.select(F.min("record_idx"), F.max("record_idx")).collect()[
        0
    ] == (0, n - 1)


def test_read_warc_distributed_and_bridge(spark, tmp_path):
    p = tmp_path / "crawl"
    p.mkdir()
    (p / "seg0.warc").write_bytes(_warc_file())
    (p / "seg1.warc.gz").write_bytes(gzip.compress(_warc_file()))

    df = read_warc(spark, str(p)).cache()
    assert df.count() == 10                     # 5 records x 2 files
    by_type = {
        r["warc_type"]: r["cnt"]
        for r in df.groupBy("warc_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_type == {"warcinfo": 2, "request": 2, "response": 6}

    docs = warc_responses_to_documents(df)
    rows = docs.collect()
    # only the 200 HTML responses survive (404 + JSON filtered), per file
    assert len(rows) == 2
    for r in rows:
        assert r["url"] == "http://a.example/"
        assert r["text"] == _WANT_TEXT
        assert r["fetched_at"] == "2026-01-01T00:00:00Z"
    # doc_id is content-keyed on (path, record_idx): stable on re-read
    again = {r["doc_id"] for r in warc_responses_to_documents(df).collect()}
    assert again == {r["doc_id"] for r in rows} and len(again) == 2
    df.unpersist()


@pytest.mark.parametrize(
    "html,want",
    [
        (_HTML.decode(), _WANT_TEXT),
        ("plain text, no tags", "plain text, no tags"),
        ("<p>a</p><p>b</p>", "a b"),
        ("<SCRIPT>x</SCRIPT>ok<STYLE a=b>y</STYLE>", "ok"),
        # unclosed script block: the block pass can't match, the generic
        # tag pass strips just the tag — lossy but total
        ("<script>never closed... gone", "never closed... gone"),
        ("a &amp;lt; b", "a &lt; b"),          # no double decode
        ("x &#x1F600; y &#955; z", "x y z"),   # numeric entities drop
        ("  lots \t of\n\nspace  ", "lots of space"),
        ("", ""),
    ],
)
def test_html_to_text_cases(spark, html, want):
    got = (
        spark.createDataFrame([(html,)], "h string")
        .select(html_to_text_expr(F.col("h")).alias("t"))
        .collect()[0]["t"]
    )
    assert got == want


def test_html_to_text_null_safe(spark):
    row = (
        spark.createDataFrame([(None,)], "h string")
        .select(html_to_text_expr(F.col("h")).alias("t"))
        .collect()[0]
    )
    assert row["t"] is None


def test_warc_to_curated_corpus_end_to_end(spark, tmp_path):
    """The full front-to-back chain over raw crawl bytes: WARC segments
    → parse → HTML→text → curate_corpus (quality gate + MinHash-LSH
    dedup + split).  Plants 3 copies of one page under different URLs
    (one survivor), a sub-min_tokens junk page (dropped), and distinct
    real pages (all kept)."""
    import gzip

    from knowhere_spark.operators.pipeline import curate_corpus

    body = (
        "the quick brown fox jumps over the lazy dog and keeps going "
        "through the deep green forest toward the old river bank today"
    )
    uniq = [
        f"page number {i} talks about {w} systems and the way they "
        "interact with distributed query engines over many machines"
        for i, w in enumerate(["storage", "compute", "network", "cache"])
    ]
    pages = (
        [("http://dup.example/%d" % i, body) for i in range(3)]
        + [("http://junk.example/", "too short")]
        + [(f"http://uniq.example/{i}", t) for i, t in enumerate(uniq)]
    )
    recs = [
        encode_warc_record(
            "response",
            encode_http_response(
                ("<html><body><p>%s</p></body></html>" % t).encode()
            ),
            url=u,
        )
        for u, t in pages
    ]
    p = tmp_path / "cc"
    p.mkdir()
    (p / "seg.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs)
    )

    docs = warc_responses_to_documents(read_warc(spark, str(p)))
    kept = curate_corpus(docs, min_tokens=5, jaccard_threshold=0.7)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    by_url = {r["url"]: r["doc_id"] for r in docs.collect()}
    dup_ids = {v for k, v in by_url.items() if k.startswith("http://dup")}
    junk_id = by_url["http://junk.example/"]
    uniq_ids = {v for k, v in by_url.items() if k.startswith("http://uniq")}
    assert junk_id not in kept_ids
    assert len(kept_ids & dup_ids) == 1          # one survivor per group
    assert uniq_ids <= kept_ids
    assert kept_ids == uniq_ids | (kept_ids & dup_ids)
    # split column present and valid
    assert {r["split"] for r in kept.collect()} <= {"train", "val", "test"}
