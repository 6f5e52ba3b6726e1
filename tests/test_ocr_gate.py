"""S4 OCR stage: the scanned-PDF gate routes correctly and degrades to
a per-row failure_reason (not a task abort) without a toolchain; the
oversized-payload cap does the same."""

import pytest

from pdf_extractor_spark.kernels import ocr, pdfgen
from pdf_extractor_spark.pipeline.extract import (MAX_PAYLOAD_BYTES,
                                                  extract_document)

LEVELS = ("raw",)


def test_needs_ocr_gate():
    assert ocr.needs_ocr("")
    assert ocr.needs_ocr("x" * 99)
    assert not ocr.needs_ocr("x" * 100)


def test_ocr_unavailable_raises():
    with pytest.raises(ocr.OcrUnavailableError):
        ocr.extract_via_ocr(b"%PDF-fake")


def test_scanned_pdf_routed_to_ocr_failure():
    scanned = pdfgen.simple_pdf(["tiny"])  # parse yields < 100 chars
    out = extract_document(scanned, None, "u", LEVELS,
                           use_ocr_fallback=True)
    assert out["failure_reason"] is not None
    assert "tesseract" in out["failure_reason"]


def test_scanned_pdf_without_flag_keeps_short_text():
    scanned = pdfgen.simple_pdf(["tiny"])
    out = extract_document(scanned, None, "u", LEVELS)
    assert out["failure_reason"] is None  # default path unchanged
    assert out["text"] is not None


def test_rich_pdf_never_routed_to_ocr():
    rich = pdfgen.simple_pdf(["long line of text " * 20] * 5)
    out = extract_document(rich, None, "u", LEVELS,
                           use_ocr_fallback=True)
    assert out["failure_reason"] is None
    assert len(out["text"]) >= 100


def test_oversized_payload_capped():
    out = extract_document(b"<" + b"x" * (MAX_PAYLOAD_BYTES + 1), None,
                           "u", LEVELS)
    assert out["failure_reason"] is not None
    assert "payload too large" in out["failure_reason"]
    assert out["text"] is None
