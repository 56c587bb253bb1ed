"""WARC (Web ARChive, ISO 28500) source — crawl ingestion, the step
BEFORE everything else in a training-data pipeline.  Common Crawl — the
dominant public LLM pretraining source — ships as WARC, so an engine
claiming the pipeline end-to-end needs to read it natively.

Format (public spec, WARC/1.0-1.1): a file is a sequence of records,
each ``WARC/1.x CRLF``, header lines (``Name: value``), ``CRLF CRLF``,
``Content-Length`` bytes of block, ``CRLF CRLF``.  Common Crawl gzips
each record as its own gzip MEMBER so ranges stay seekable; plain
concatenated files and whole-file gzip exist too — the reader sniffs
and handles all three.  For ``response`` records the block is an HTTP/1
message; the parser splits status / headers / body so the pipeline gets
``(url, date, content_type, http_status, body)`` columns directly.

Spark shape: ``spark.read.format("binaryFile")`` lists the ``.warc`` /
``.warc.gz`` files (a distributed listing — thousands of CC segments
fan out across executors), and ONE ``mapInPandas`` kernel parses each
file's records.  Per-file memory is bounded by the file size (CC
segments are ~1 GB gzipped — set ``maxPartitionBytes``/file sizes
accordingly); records stream out of the kernel per batch.  Downstream:
:func:`knowhere_spark.functions.html.html_to_text_expr` turns response
bodies into the ``documents`` shape every dedup/quality operator eats.

Pure stdlib (zlib) + pandas — no external WARC library, mirroring the
repo's MP4/JPEG/GIF/PNG discipline: real parsers for public formats.
"""

from __future__ import annotations

import codecs
import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: output schema of :func:`read_warc` — one row per WARC record.
#: ``body`` is the raw (de-chunked, inflated) block; ``body_text`` is the
#: charset-aware best-effort decode for ``response`` records with a
#: text-ish Content-Type (NULL for other record types and for binary
#: payloads) — downstream text operators consume ``body_text``
#: so a single non-UTF-8 byte can never kill the job (Spark 4.1's ANSI
#: ``decode`` raises MALFORMED_CHARACTER_CODING; real Common Crawl bodies
#: are routinely windows-1252 / gbk / binary).
WARC_SCHEMA = (
    "path string, record_idx int, warc_type string, url string, "
    "date string, record_id string, content_type string, "
    "http_status int, http_content_type string, body binary, "
    "body_text string"
)

#: records per pandas batch out of the parse kernel — bounds per-task
#: peak memory at (decompressed file) + O(chunk) instead of
#: (decompressed file) + (all parsed records)
_KERNEL_CHUNK_ROWS = 512

_GZ_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL gzip members (Common Crawl: one member per
    record; ordinary files: one member)."""
    out = []
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == _GZ_MAGIC:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        tail = d.unused_data
        if not tail:
            pos = len(data)
        else:
            pos = len(data) - len(tail)
    return b"".join(out)


def _dechunk(body: bytes) -> bytes:
    """Undo ``Transfer-Encoding: chunked`` framing (hex size line CRLF
    data CRLF, terminated by a 0-size chunk).  Best-effort: a malformed
    size line before ANY chunk was parsed returns the body unchanged
    (mislabeled header); one mid-stream returns the intact prefix."""
    out: list[bytes] = []
    pos = 0
    n = len(body)
    parsed_any = False
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break
        token = body[pos:eol].split(b";")[0].strip()
        try:
            size = int(token, 16)
        except ValueError:
            if not parsed_any:
                return body
            break
        parsed_any = True
        if size == 0:
            break
        out.append(body[eol + 2 : eol + 2 + size])
        pos = eol + 2 + size + 2   # skip the chunk's trailing CRLF
    # a legitimately empty chunked body (b"0\r\n\r\n") must yield b"",
    # not the raw framing bytes
    return b"".join(out) if parsed_any else body


def _inflate(body: bytes, encoding: str) -> bytes:
    """Undo ``Content-Encoding`` gzip/x-gzip/deflate.  Best-effort: any
    decompression failure keeps the raw bytes (the downstream HTML
    filter drops binary garbage; never crash the segment)."""
    try:
        if encoding in ("gzip", "x-gzip"):
            # only fall back to raw bytes when the payload isn't gzip at
            # all — a VALID gzip of empty content must yield b"", and
            # `or body` would resurrect the 20-byte gzip header
            if body[:2] == _GZ_MAGIC:
                return _gunzip_members(body)
            return body
        if encoding == "deflate":
            try:
                return zlib.decompress(body)
            except zlib.error:
                # many servers send raw deflate without the zlib header
                return zlib.decompress(body, wbits=-15)
    except Exception:
        pass
    return body


_CHARSET_RE = re.compile(r"charset=[\"']?([\w.:+-]+)", re.IGNORECASE)

#: content types worth a text decode — everything else (images, PDFs,
#: video: MOST bytes of a real crawl) keeps ``body_text`` NULL instead
#: of carrying a replacement-char copy of a binary payload through Arrow
_TEXTISH_RE = re.compile(
    r"^text/|html|xml|json|javascript|ecmascript|charset=", re.IGNORECASE
)


def _is_textish(http_content_type: str | None) -> bool:
    # a missing Content-Type is undeclared, not binary — decode it (the
    # downstream HTML filter still decides what to keep)
    if not http_content_type:
        return True
    return bool(_TEXTISH_RE.search(http_content_type))


def _decode_body(body: bytes, http_content_type: str | None) -> str:
    """Charset-aware best-effort text decode: honor the Content-Type
    ``charset=`` parameter when Python knows the codec, else UTF-8;
    always ``errors='replace'`` — total over arbitrary bytes."""
    cs = "utf-8"
    if http_content_type:
        m = _CHARSET_RE.search(http_content_type)
        if m:
            try:
                codecs.lookup(m.group(1))
                cs = m.group(1)
            except LookupError:
                pass
    try:
        return body.decode(cs, errors="replace")
    except Exception:
        return body.decode("utf-8", errors="replace")


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1", "replace")
            )
    return headers


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record (see :data:`WARC_SCHEMA` fields,
    minus path/record_idx which the Spark reader adds).  Malformed
    trailing bytes end the walk silently — the media parsers' best-
    effort-never-crash contract; a truncated crawl segment yields its
    intact prefix."""
    if data[:2] == _GZ_MAGIC:
        try:
            data = _gunzip_members(data)
        except Exception:
            return
    pos = 0
    n = len(data)
    try:
        while pos < n:
            # skip inter-record padding
            while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
                pos += 1
            if not data[pos : pos + 5] == b"WARC/":
                return
            hdr_end = data.find(b"\r\n\r\n", pos)
            if hdr_end < 0:
                return
            headers = _parse_headers(data[pos:hdr_end])
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                return
            body_start = hdr_end + 4
            body_end = body_start + length
            if body_end > n:
                return   # truncated record: stop at the intact prefix
            block = data[body_start:body_end]
            rec: dict = {
                "warc_type": headers.get("warc-type"),
                "url": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "record_id": headers.get("warc-record-id"),
                "content_type": headers.get("content-type"),
                "http_status": None,
                "http_content_type": None,
                "body": block,
                "body_text": None,
            }
            if rec["warc_type"] == "response" and block[:5] in (
                b"HTTP/",
            ):
                # HTTP/1.x response: status line + headers + CRLF CRLF
                split = block.find(b"\r\n\r\n")
                if split >= 0:
                    head = block[:split]
                    status_line = head.split(b"\r\n", 1)[0].split(b" ")
                    if len(status_line) >= 2 and status_line[1].isdigit():
                        rec["http_status"] = int(status_line[1])
                    hh = _parse_headers(head)
                    rec["http_content_type"] = hh.get("content-type")
                    body = block[split + 4 :]
                    # undo the wire layers real CC captures carry:
                    # transfer framing first (outermost), then content
                    # compression — otherwise chunk-size hex lines leak
                    # into document text and gzip bodies reach the HTML
                    # extractor as binary garbage
                    if "chunked" in hh.get("transfer-encoding", "").lower():
                        body = _dechunk(body)
                    enc = hh.get("content-encoding", "").strip().lower()
                    if enc:
                        body = _inflate(body, enc)
                    rec["body"] = body
                    if _is_textish(rec["http_content_type"]):
                        rec["body_text"] = _decode_body(
                            body, rec["http_content_type"]
                        )
            yield rec
            pos = body_end
    except Exception:
        return


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: ``binaryFile`` listing → per-file
    ``mapInPandas`` parse → one row per record (:data:`WARC_SCHEMA`).
    Filter ``warc_type = 'response'`` and run
    :func:`~knowhere_spark.functions.html.html_to_text_expr` over
    ``body_text`` to reach the documents shape."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    rec_keys = (
        "warc_type", "url", "date", "record_id", "content_type",
        "http_status", "http_content_type", "body", "body_text",
    )

    def _empty() -> dict[str, list]:
        return {k: [] for k in ("path", "record_idx", *rec_keys)}

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        rows = _empty()
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(parse_warc(bytes(content))):
                    rows["path"].append(p)
                    rows["record_idx"].append(i)
                    for k in rec_keys:
                        rows[k].append(rec[k])
                    # stream records out per chunk so peak task memory is
                    # (decompressed file) + O(chunk), not + (all records)
                    if len(rows["path"]) >= _KERNEL_CHUNK_ROWS:
                        yield pd.DataFrame(rows)
                        rows = _empty()
        if rows["path"]:
            yield pd.DataFrame(rows)

    return files.mapInPandas(kernel, WARC_SCHEMA)


def warc_responses_to_documents(
    warc_df: DataFrame, *, min_status: int = 200, max_status: int = 299
) -> DataFrame:
    """The crawl → corpus bridge: HTTP responses with an HTML content
    type become ``(doc_id, url, fetched_at, text)`` rows via the
    codegen'd HTML extractor — the exact input shape of the dedup /
    quality / chunking operators.  ``doc_id`` is the xxhash64 of
    (path, record_idx): stable across re-reads, content-keyed per the
    sampling rule."""
    from knowhere_spark.functions.html import html_to_text_expr

    return (
        warc_df.filter(
            (F.col("warc_type") == "response")
            & F.col("http_status").between(min_status, max_status)
            & F.lower(F.coalesce("http_content_type", F.lit(""))).contains(
                "html"
            )
        )
        .select(
            F.xxhash64("path", "record_idx").alias("doc_id"),
            "url",
            F.col("date").alias("fetched_at"),
            # body_text is the kernel's charset-aware errors='replace'
            # decode — NOT SQL decode(body,'utf-8'), which under Spark
            # 4.1 ANSI raises on the first invalid byte and would let
            # one windows-1252 page kill a whole crawl segment
            html_to_text_expr(F.col("body_text")).alias("text"),
        )
    )


# ---------------------------------------------------------------------------
# writer half — fixtures and round-trip tests (the encode_mp4 discipline)
# ---------------------------------------------------------------------------

def encode_warc_record(
    warc_type: str,
    block: bytes,
    *,
    url: str | None = None,
    date: str = "2026-01-01T00:00:00Z",
    record_id: str = "<urn:uuid:0>",
    content_type: str = "application/http; msgtype=response",
) -> bytes:
    """One spec-conformant WARC/1.0 record."""
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Date: " + date.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(block)).encode(),
    ]
    if url is not None:
        lines.insert(2, b"WARC-Target-URI: " + url.encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + block + b"\r\n\r\n"


def encode_http_response(
    html: bytes, *, status: int = 200, content_type: str = "text/html"
) -> bytes:
    """The HTTP/1.1 block a ``response`` record carries."""
    return (
        b"HTTP/1.1 %d OK\r\nContent-Type: %s\r\nContent-Length: %d\r\n\r\n"
        % (status, content_type.encode(), len(html))
        + html
    )
