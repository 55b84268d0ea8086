"""WARC source: Common-Crawl-style archives -> the input_hint pages
shape (url, warc_ts, html, text, lang).

Parallelism model is the one the Common Crawl ecosystem actually uses
(cf. the public sparkcc pattern): ONE ARCHIVE FILE = one unit of work.
A crawl ships tens of thousands of ~1 GB WARC files, so file-grain
parallelism saturates any cluster while each task streams through its
file sequentially — no record-boundary splitting problem, no shuffle at
all: scan -> mapInPandas -> downstream.

Format handling (WARC/1.0, ISO 28500 — a public standard):
- records are ``WARC/1.0\\r\\n`` header blocks terminated by a blank
  line, a payload of exactly ``Content-Length`` bytes, then
  ``\\r\\n\\r\\n``;
- ``response`` records carry an HTTP envelope before the body — split at
  the first ``\\r\\n\\r\\n``; ``resource``/``conversion`` records (WET)
  carry the body directly;
- gzip members are detected by magic bytes and decompressed in-task
  (Common Crawl gzips per-record so ranges are seekable; decompressing
  the whole member stream is equivalent for full-file reads).

The parser is an iterator over byte offsets — O(1) state per record, so
a 1 GB archive never materializes more than one record at a time beyond
Arrow batching.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary"
)


def _split_records(data: bytes) -> Iterator[dict]:
    """Yield {'headers': dict, 'payload': bytes} per WARC record."""
    pos = 0
    n = len(data)
    while pos < n:
        head = data.find(b"WARC/", pos)
        if head < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", head)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[head:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        length = int(headers.get("content-length", 0))
        body_start = hdr_end + 4
        payload = data[body_start:body_start + length]
        yield {"headers": headers, "payload": payload}
        pos = body_start + length


def _http_body(payload: bytes) -> bytes:
    """response records: strip the HTTP envelope (status + headers)."""
    if payload.startswith(b"HTTP/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def parse_warc_bytes(
    data: bytes, record_types: tuple[str, ...]
) -> Iterator[tuple[str, pd.Timestamp, bytes]]:
    """(url, warc_ts, html) triples from one archive's bytes (gzip or
    plain)."""
    if data[:2] == b"\x1f\x8b":
        # multi-member gzip: GzipFile reads every member in sequence
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    for rec in _split_records(data):
        h = rec["headers"]
        if h.get("warc-type") not in record_types:
            continue
        url = h.get("warc-target-uri")
        if not url:
            continue
        ts = pd.to_datetime(h.get("warc-date"), utc=True, errors="coerce")
        body = (
            _http_body(rec["payload"])
            if h.get("warc-type") == "response"
            else rec["payload"]
        )
        yield url, None if ts is pd.NaT else ts.tz_convert(None), body


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response", "resource", "conversion"),
) -> DataFrame:
    """WARC archive dir/glob -> DataFrame(url, warc_ts, html binary).

    binaryFile scan (one row per archive) -> iterator mapInPandas; the
    64 MB whole-file rows never pass through a shuffle."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                recs = list(parse_warc_bytes(row["content"], record_types))
                if recs:
                    yield pd.DataFrame(
                        recs, columns=["url", "warc_ts", "html"]
                    )

    return files.select("content").mapInPandas(parse, schema=_PAGES_SCHEMA)


def pages_from_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response", "resource", "conversion"),
) -> DataFrame:
    """Full input_hint shape: read_warc + native byte-exact text
    extraction + n-gram language id — all inside one scan stage."""
    from pyspark.sql import functions as F

    from ..functions.html_extract import extract_text_expr
    from ..functions.text_analysis import lang_id

    pages = read_warc(spark, path, record_types)
    pages = pages.withColumn("text", extract_text_expr("html"))
    return pages.withColumn(
        "lang", F.when(F.col("text").isNotNull(), lang_id(F.col("text")))
    ).select("url", "warc_ts", "html", "text", "lang")


def write_warc_fixture(
    pages_pdf: pd.DataFrame, path: str, compress: bool = False
) -> None:
    """Deterministic WARC/1.0 writer for tests/benchmarks: one
    ``resource`` record per page row (url, warc_ts, html). Driver-side,
    fixture-sized by design."""
    out = io.BytesIO()
    for _, r in pages_pdf.iterrows():
        body: bytes = bytes(r["html"])
        ts = pd.Timestamp(r["warc_ts"])
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: resource\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(body)}\r\n"
            "\r\n"
        ).encode("utf-8")
        out.write(header)
        out.write(body)
        out.write(b"\r\n\r\n")
    data = out.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
