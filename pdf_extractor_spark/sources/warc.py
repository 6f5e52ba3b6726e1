"""WARC container source — how the Common-Crawl-style pages table gets
BUILT in the first place.

The input_hint table (url, warc_ts, html, text, lang) is the
*materialized* form; the raw crawl ships as WARC/1.0 container files
(one response record per capture: WARC headers + an HTTP response
whose body is the page payload). ``read_warc`` turns a directory of
WARC files into exactly that pages table: a ``binaryFile`` scan (one
task per file — CC WARCs are ~1 GB, a natural partition unit) feeding
ONE ``mapInPandas`` parse stage, stdlib-only.

Parsing is record-framed, not regex: each record's Content-Length
slices the payload exactly, so binary PDF bodies containing
``WARC/1.0``-lookalike bytes cannot desynchronize the scan. Records
with a ``text/plain`` HTTP payload land in the ``text`` column
(pre-extracted text), everything else in ``html`` (the extraction
pipeline's doctype detector takes it from there); ``lang`` is not a
WARC concept and stays null until lang-ID runs.

Compressed WARCs (.warc.gz, the CC on-disk form) are member-gzipped.
MEMBER-HANDLING POLICY: gzip member boundaries are TRANSPARENT — the
parser decompresses every member (``gzip.decompress`` concatenates
multi-member streams) and parses the result as ONE WARC byte stream.
Real Common Crawl writes one gzip member per record (enabling random
access by offset, which a whole-file scan does not need); a producer
that splits the stream at ANY byte boundary — mid-record, mid-header,
even mid-``WARC/1.0`` magic — parses identically, because record
framing happens on the decompressed stream, never per member
(property-pinned by tests/test_warc_source.py::TestGzipMembers).

``write_warc_files`` is the deterministic synthesis twin (same record
generator as ``synth_pages_df``) used by tests to prove the
round-trip: synth rows → WARC bytes → ``read_warc`` → the same rows.
"""

from __future__ import annotations

import gzip
from typing import Dict, Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

_CRLF = b"\r\n"


def _http_response(body: bytes, content_type: str) -> bytes:
    head = (b"HTTP/1.1 200 OK\r\nContent-Type: "
            + content_type.encode("ascii")
            + b"\r\nContent-Length: " + str(len(body)).encode("ascii")
            + b"\r\n\r\n")
    return head + body


def format_record(url: str, ts_iso: str, body: bytes,
                  content_type: str) -> bytes:
    """One WARC/1.0 response record (headers + HTTP payload)."""
    payload = _http_response(body, content_type)
    head = (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode("ascii") + _CRLF
            + b"WARC-Date: " + ts_iso.encode("ascii") + _CRLF
            + b"Content-Type: application/http;msgtype=response\r\n"
            + b"Content-Length: " + str(len(payload)).encode("ascii")
            + _CRLF + _CRLF)
    return head + payload + _CRLF + _CRLF


def parse_warc(blob: bytes) -> Iterator[Tuple[Dict[str, str], bytes]]:
    """Yield (warc_headers, http_payload) per record. Content-Length
    framing — never scans payload bytes for record starts."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    i = 0
    n = len(blob)
    while i < n:
        if not blob.startswith(b"WARC/", i):
            nxt = blob.find(b"WARC/1.0\r\n", i)
            if nxt < 0:
                return
            i = nxt
        hdr_end = blob.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            return
        headers: Dict[str, str] = {}
        for line in blob[i:hdr_end].decode("ascii",
                                           "replace").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        clen = int(headers.get("content-length", "0"))
        payload = blob[hdr_end + 4:hdr_end + 4 + clen]
        yield headers, payload
        i = hdr_end + 4 + clen + 4  # skip the record-final CRLF CRLF


def _split_http(payload: bytes) -> Tuple[str, bytes]:
    """(content_type, body) from an HTTP response payload."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return "application/octet-stream", payload
    ctype = "application/octet-stream"
    for line in payload[:sep].decode("ascii", "replace").split("\r\n"):
        if line.lower().startswith("content-type:"):
            ctype = line.split(":", 1)[1].strip()
    return ctype, payload[sep + 4:]


def read_warc(spark: SparkSession, warc_dir: str) -> DataFrame:
    """Directory of .warc / .warc.gz files → the pages table."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .option("recursiveFileLookup", "true")
             .load(warc_dir)
             .select("content"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: List[Dict] = []
            for blob in batch["content"]:
                for headers, payload in parse_warc(bytes(blob)):
                    if headers.get("warc-type") != "response":
                        continue
                    ctype, body = _split_http(payload)
                    is_text = ctype.startswith("text/plain")
                    ts = pd.Timestamp(headers.get("warc-date"))
                    if ts.tzinfo is not None:
                        ts = ts.tz_convert("UTC").tz_localize(None)
                    rows.append({
                        "url": headers.get("warc-target-uri"),
                        "warc_ts": ts,
                        "html": None if is_text else bytes(body),
                        "text": (body.decode("utf-8", "replace")
                                 if is_text else None),
                        "lang": None,
                    })
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return files.mapInPandas(parse, PAGES_SCHEMA)


def write_warc_files(out_dir: str, n_docs: int, n_files: int = 4,
                     seed: int = 42, skew_frac: float = 0.3,
                     compress: bool = False,
                     member_per_record: bool = False) -> int:
    """Deterministic WARC synthesis from the same record generator as
    ``synth_pages_df`` (driver-side helper for tests/CLI; real
    ingestion reads crawl-produced WARCs). Rows with pre-extracted
    text become text/plain records; payload rows keep their
    content type by magic bytes. ``member_per_record`` writes one gzip
    member PER RECORD — the byte shape real Common Crawl ships
    (implies compression). Returns records written."""
    import os

    from .pages import _records_for_ids

    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for f in range(n_files):
        ids = list(range(f, n_docs, n_files))
        chunks: List[bytes] = []
        for r in _records_for_ids(ids, seed, skew_frac):
            ts_iso = r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
            if r["text"] is not None:
                body = r["text"].encode("utf-8")
                ctype = "text/plain"
            else:
                body = r["html"]
                ctype = ("application/pdf"
                         if body[:5] == b"%PDF-" else "text/html")
            chunks.append(format_record(r["url"], ts_iso, body, ctype))
            written += 1
        if member_per_record:
            data = b"".join(gzip.compress(c) for c in chunks)
        else:
            data = b"".join(chunks)
            if compress:
                data = gzip.compress(data)
        ext = ("warc.gz" if compress or member_per_record
               else "warc")
        with open(os.path.join(out_dir, f"part-{f:03d}.{ext}"),
                  "wb") as fh:
            fh.write(data)
    return written
