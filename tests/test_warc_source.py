"""WARC container source: round-trip against the pages synthesis,
Content-Length framing under adversarial payloads, gzip variant, and
the extraction pipeline running straight off WARC input.
"""

import pytest

from pdf_extractor_spark.sources import warc
from pdf_extractor_spark.sources.pages import (_records_for_ids,
                                               synth_pages_df)

pytestmark = pytest.mark.spark

N = 40


def _expected_rows():
    """What read_warc should reproduce: text rows become text/plain
    records (html dropped — the record carries ONE payload), payload
    rows keep bytes verbatim."""
    out = {}
    for r in _records_for_ids(list(range(N)), 42, 0.3):
        if r["text"] is not None:
            out[r["url"]] = (None, r["text"])
        else:
            out[r["url"]] = (bytes(r["html"]), None)
    return out


class TestWarcRoundTrip:
    def test_rows_reproduced(self, spark, tmp_path):
        d = str(tmp_path / "warcs")
        n = warc.write_warc_files(d, N, n_files=3)
        assert n == N
        got = {r.url: (bytes(r.html) if r.html is not None else None,
                       r.text)
               for r in warc.read_warc(spark, d).collect()}
        assert got == _expected_rows()

    def test_gzip_variant(self, spark, tmp_path):
        d = str(tmp_path / "warcs_gz")
        warc.write_warc_files(d, 12, n_files=2, compress=True)
        assert warc.read_warc(spark, d).count() == 12

    def test_timestamps_survive(self, spark, tmp_path):
        d = str(tmp_path / "warcs_ts")
        warc.write_warc_files(d, 10, n_files=1)
        exp = {r["url"]: r["warc_ts"].replace(tzinfo=None, microsecond=0)
               for r in _records_for_ids(list(range(10)), 42, 0.3)}
        got = {r.url: r.warc_ts
               for r in warc.read_warc(spark, d).collect()}
        assert got == exp

    def test_framing_survives_warc_lookalike_bytes(self, tmp_path):
        # a payload CONTAINING record-start bytes must not split the
        # record: Content-Length framing, not scanning
        body = b"before WARC/1.0\r\n\r\n after"
        rec = warc.format_record("https://x.com/a",
                                 "2025-06-01T00:00:00Z", body,
                                 "text/html")
        rec += warc.format_record("https://x.com/b",
                                  "2025-06-01T00:00:01Z", b"second",
                                  "text/html")
        got = list(warc.parse_warc(rec))
        assert len(got) == 2
        assert warc._split_http(got[0][1])[1] == body
        assert got[1][0]["warc-target-uri"] == "https://x.com/b"


def test_extract_pages_runs_on_warc_input(spark, tmp_path):
    d = str(tmp_path / "warcs_ex")
    warc.write_warc_files(d, 20, n_files=2)
    from pdf_extractor_spark.pipeline.extract import extract_pages

    out = extract_pages(warc.read_warc(spark, d)).collect()
    assert len(out) == 20
    ok = [r for r in out if r.failure_reason is None]
    assert ok and all(r.text for r in ok)


class TestGzipMembers:
    """Member-handling policy (VERDICT r03 #9): gzip member boundaries
    are transparent — the decompressed concatenation is parsed as one
    WARC stream, so the real-CC one-member-per-record shape AND
    arbitrary mid-record member splits both parse identically."""

    def test_member_per_record_round_trip(self, spark, tmp_path):
        # the byte shape real Common Crawl ships
        src = str(tmp_path / "warc_members")
        n = warc.write_warc_files(src, N, n_files=3,
                                  member_per_record=True)
        assert n == N
        got = {r.url: (bytes(r.html) if r.html is not None else None,
                       r.text)
               for r in warc.read_warc(spark, src).collect()}
        assert got == _expected_rows()

    def test_records_straddling_members_property(self):
        """Property: for ANY byte-split of the WARC stream into gzip
        members — including splits inside headers, payloads, and the
        WARC/1.0 magic — parse_warc yields exactly the records of the
        uncompressed stream. 60 seeded-random splittings + adversarial
        fixed splits."""
        import gzip
        import random

        recs = list(_records_for_ids(list(range(12)), 7, 0.3))
        chunks = []
        for r in recs:
            ts = r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
            if r["text"] is not None:
                chunks.append(warc.format_record(
                    r["url"], ts, r["text"].encode(), "text/plain"))
            else:
                chunks.append(warc.format_record(
                    r["url"], ts, bytes(r["html"]),
                    "application/octet-stream"))
        stream = b"".join(chunks)
        want = [(h["warc-target-uri"], p)
                for h, p in warc.parse_warc(stream)]
        assert len(want) == 12

        def split_at(points):
            pts = sorted(set(p for p in points if 0 < p < len(stream)))
            parts, prev = [], 0
            for p in pts + [len(stream)]:
                parts.append(stream[prev:p])
                prev = p
            return b"".join(gzip.compress(part) for part in parts
                            if part)

        rng = random.Random(20260818)
        cases = []
        for _ in range(60):
            k = rng.randint(1, 40)
            cases.append([rng.randint(1, len(stream) - 1)
                          for _ in range(k)])
        first_hdr = stream.find(b"\r\n\r\n")
        cases += [
            [3],                                   # mid WARC/1.0 magic
            [first_hdr + 2],                       # mid header CRLFCRLF
            [len(stream) // 2],
            list(range(1, len(stream), 997)),      # many tiny members
            [len(stream) - 1],
        ]
        for points in cases:
            blob = split_at(points)
            got = [(h["warc-target-uri"], p)
                   for h, p in warc.parse_warc(blob)]
            assert got == want, f"split points {sorted(set(points))[:8]}"
