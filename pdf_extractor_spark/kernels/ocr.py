"""OCR source stage (S4, image_text_extractor.py:71-153).

The reference renders each PDF page at dpi=300 via PyMuPDF
(``_process_pdf_page``, image_text_extractor.py:107-128) and runs
pytesseract with ``--psm 1 --oem 3`` lang ``eng`` (config :32-41,
:62-63); page texts join with ``"\\n\\n"`` (:100). This kernel runs the
SAME loop whenever the toolchain imports (``_ocr_available()``); in
containers without tesseract/PyMuPDF the stage degrades to
``OcrUnavailableError``, which the pipeline converts into a per-row
``failure_reason`` (or keeps the short parsed text — see
pipeline/extract.py) instead of a task failure.

The loop is decomposed so tests can prove it runs without the real
toolchain: ``_render_page_images`` (render) and ``_ocr_image``
(tesseract call) are module-level and monkeypatchable.
"""

from __future__ import annotations

from typing import Iterator, Optional

MIN_TEXT_LENGTH = 100   # pdf_extractor.py:40
OCR_DPI = 300           # image_text_extractor.py:34
OCR_LANG = "eng"        # image_text_extractor.py:33
OCR_PSM = 1             # image_text_extractor.py:36
OCR_OEM = 3             # image_text_extractor.py:37
OCR_CONFIG = f"--psm {OCR_PSM} --oem {OCR_OEM}"  # :62-63


class OcrUnavailableError(RuntimeError):
    """Raised when the OCR stage is requested but no engine exists."""


def _ocr_available() -> bool:
    try:
        import pytesseract  # noqa: F401
        return True
    except ImportError:
        return False


def needs_ocr(extracted_text: str) -> bool:
    """S6 scanned-PDF gate (pdf_extractor.py:192-206): a parse that
    yields less than ``min_text_length`` chars marks the doc scanned."""
    return len(extracted_text or "") < MIN_TEXT_LENGTH


def _render_page_images(payload: bytes, dpi: int = OCR_DPI) -> Iterator:
    """Render PDF pages to images (image_text_extractor.py:119-124,
    in-memory instead of the reference's temp-file round-trip).
    Requires PyMuPDF on the executor."""
    try:
        import fitz
    except ImportError as exc:
        raise OcrUnavailableError(
            "no page renderer (PyMuPDF) installed") from exc
    doc = fitz.open(stream=payload, filetype="pdf")
    try:
        for page in doc:
            yield page.get_pixmap(dpi=dpi)
    finally:
        # Generator consumers may stop early (page_range filtering);
        # close() on generator exit releases the native document rather
        # than waiting for GC on a long-lived executor.
        doc.close()


def _ocr_image(image, lang: str = OCR_LANG,
               config: str = OCR_CONFIG) -> str:
    """One tesseract call (image_text_extractor.py:62-63)."""
    import pytesseract
    return pytesseract.image_to_string(image, lang=lang, config=config)


def extract_via_ocr(payload: bytes,
                    page_range: Optional[range] = None) -> str:
    """Render + OCR each page, join with blank lines
    (image_text_extractor.py:71-105). Raises OcrUnavailableError in
    environments without the toolchain — the pipeline converts that
    into per-row handling, never a task failure."""
    if not _ocr_available():
        raise OcrUnavailableError(
            f"tesseract not installed (would run dpi={OCR_DPI}, "
            f"config='{OCR_CONFIG}' per reference)")
    texts = []
    for page_num, image in enumerate(_render_page_images(payload)):
        if page_range is not None and page_num not in page_range:
            continue
        texts.append(_ocr_image(image))
    return "\n\n".join(texts)
