"""Content-type detection from leading payload bytes (S6 generalized).

The reference's scanned-PDF classifier (pdf_extractor.py:192-206) is a
per-format predicate; the north-star engine needs per-row dispatch over
mixed Common-Crawl-style payloads: magic-byte detect → route to the PDF
layout parser or the HTML boilerplate stripper. Relational analog:
``F.when(F.substring(html,1,5)==b'%PDF-','pdf')...`` (SURVEY.md §2.1 S6).
"""

from __future__ import annotations

DOC_PDF = "pdf"
DOC_HTML = "html"
DOC_TEXT = "text"
DOC_EMPTY = "empty"


def detect_doctype(payload: bytes) -> str:
    """Classify a payload by magic bytes: ``%PDF-`` → pdf; a leading
    ``<`` (after whitespace/BOM) → html; empty → empty; else text.
    """
    if not payload:
        return DOC_EMPTY
    head = payload[:256].lstrip(b"\xef\xbb\xbf \t\r\n")
    if head.startswith(b"%PDF-"):
        return DOC_PDF
    if head.startswith(b"<"):
        return DOC_HTML
    return DOC_TEXT
