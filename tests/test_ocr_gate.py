"""S4 OCR stage: the scanned-PDF gate routes correctly; without a
toolchain the row keeps the short parsed text and records the skip in
ocr_status (never a task abort, never discarded text); with a (fake)
toolchain the real render+tesseract loop runs. Oversized payloads
degrade to failure_reason the same way."""

import sys
import types

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


def test_scanned_pdf_keeps_parsed_text_when_ocr_unavailable():
    """ADVICE r01: a successful-but-short parse must NOT become a
    failure when the OCR toolchain is absent — text is kept, the skip
    goes to ocr_status."""
    scanned = pdfgen.simple_pdf(["tiny"])  # parse yields < 100 chars
    out = extract_document(scanned, None, "u", LEVELS,
                           use_ocr_fallback=True)
    assert out["failure_reason"] is None
    assert out["text"] is not None and "tiny" in out["text"]
    assert out["ocr_status"].startswith("ocr_skipped")
    assert "tesseract" in out["ocr_status"]


def test_scanned_pdf_without_flag_keeps_short_text():
    scanned = pdfgen.simple_pdf(["tiny"])
    out = extract_document(scanned, None, "u", LEVELS)
    assert out["failure_reason"] is None  # default path unchanged
    assert out["text"] is not None
    assert "ocr_status" not in out


def test_rich_pdf_never_routed_to_ocr():
    rich = pdfgen.simple_pdf(["long line of text " * 20] * 5)
    out = extract_document(rich, None, "u", LEVELS,
                           use_ocr_fallback=True)
    assert out["failure_reason"] is None
    assert out["ocr_status"] is None  # gate not triggered
    assert len(out["text"]) >= 100


def test_ocr_loop_runs_with_fake_toolchain(monkeypatch):
    """VERDICT r01 #6: prove the render+tesseract loop executes when
    the toolchain exists — fake pytesseract module + fake renderer."""
    calls = []

    fake_tess = types.ModuleType("pytesseract")

    def image_to_string(image, lang=None, config=None):
        calls.append((image, lang, config))
        return f"text from {image}"

    fake_tess.image_to_string = image_to_string
    monkeypatch.setitem(sys.modules, "pytesseract", fake_tess)
    monkeypatch.setattr(ocr, "_render_page_images",
                        lambda payload, dpi=ocr.OCR_DPI:
                        iter(["page0", "page1"]))

    result = ocr.extract_via_ocr(b"%PDF-whatever")
    assert result == "text from page0\n\ntext from page1"
    # reference config: lang eng, --psm 1 --oem 3 (:32-41,:62-63)
    assert calls[0][1] == "eng"
    assert calls[0][2] == "--psm 1 --oem 3"


def test_ocr_applied_flows_into_pipeline(monkeypatch):
    fake_tess = types.ModuleType("pytesseract")
    fake_tess.image_to_string = (
        lambda image, lang=None, config=None: "ocr recovered text " * 10)
    monkeypatch.setitem(sys.modules, "pytesseract", fake_tess)
    monkeypatch.setattr(ocr, "_render_page_images",
                        lambda payload, dpi=ocr.OCR_DPI: iter(["p"]))
    scanned = pdfgen.simple_pdf(["tiny"])
    out = extract_document(scanned, None, "u", LEVELS,
                           use_ocr_fallback=True)
    assert out["failure_reason"] is None
    assert out["ocr_status"] == "ocr_applied"
    assert "ocr recovered text" in out["text"]


def test_page_range_filters_pages(monkeypatch):
    fake_tess = types.ModuleType("pytesseract")
    fake_tess.image_to_string = (
        lambda image, lang=None, config=None: str(image))
    monkeypatch.setitem(sys.modules, "pytesseract", fake_tess)
    monkeypatch.setattr(ocr, "_render_page_images",
                        lambda payload, dpi=ocr.OCR_DPI:
                        iter(["p0", "p1", "p2"]))
    assert ocr.extract_via_ocr(b"x", page_range=range(1, 3)) == "p1\n\np2"


def test_oversized_payload_capped():
    out = extract_document(b"<" + b"x" * (MAX_PAYLOAD_BYTES + 1), None,
                           "u", LEVELS)
    assert out["failure_reason"] is not None
    assert "payload too large" in out["failure_reason"]
    assert out["text"] is None
