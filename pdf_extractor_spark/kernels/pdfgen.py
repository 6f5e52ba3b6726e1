"""Deterministic minimal PDF writer — fixture generation only.

Produces valid single-font, uncompressed PDF 1.4 bytes (catalog → page
tree → page objects → content streams → xref) so the synthetic ``pages``
corpus can route real ``%PDF-`` payloads through the layout parser
(kernels/pdfx.py) without external libraries. Layout knobs exercise the
parser's clustering, column detection, and header/footer stripping.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

PAGE_W, PAGE_H = 612, 792
MARGIN_X, TOP_Y = 72.0, 720.0
LINE_STEP = 16.0
COL2_X = 330.0
LINES_PER_PAGE = 40

Span = Tuple[float, float, str]  # (x, y, text)


def _escape(text: str) -> bytes:
    out = text.encode("latin-1", errors="replace")
    return out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _content_stream(spans: Sequence[Span]) -> bytes:
    parts = [b"BT /F1 12 Tf"]
    for x, y, text in spans:
        parts.append(b"1 0 0 1 %.1f %.1f Tm (%s) Tj" % (x, y, _escape(text)))
    parts.append(b"ET")
    return b"\n".join(parts)


def make_pdf(pages_spans: List[Sequence[Span]]) -> bytes:
    """Assemble a PDF from per-page positioned spans."""
    n_pages = len(pages_spans)
    font_id = 3 + 2 * n_pages
    objects: List[bytes] = []
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages))
    for i, spans in enumerate(pages_spans):
        page_id = 3 + 2 * i
        content_id = page_id + 1
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
            % (PAGE_W, PAGE_H, content_id, font_id)
        )
        stream = _content_stream(spans)
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, xref_at))
    return bytes(buf)


def layout_text(lines: List[str], two_column: bool = False,
                header: Optional[str] = None, footer: Optional[str] = None,
                page_numbers: bool = False) -> List[List[Span]]:
    """Flow lines into page span lists top-down (optionally two columns
    per page, repeated header/footer, bare page-number footers)."""
    per_col = LINES_PER_PAGE
    per_page = per_col * (2 if two_column else 1)
    chunks = [lines[i:i + per_page] for i in range(0, len(lines), per_page)] or [[]]
    pages: List[List[Span]] = []
    for pno, chunk in enumerate(chunks, start=1):
        spans: List[Span] = []
        if header:
            spans.append((MARGIN_X, TOP_Y + 36, header))
        for j, line in enumerate(chunk):
            if two_column and j >= per_col:
                x, row = COL2_X, j - per_col
            else:
                x, row = MARGIN_X, j
            spans.append((x, TOP_Y - row * LINE_STEP, line))
        if footer:
            spans.append((MARGIN_X, 40.0, footer))
        if page_numbers:
            spans.append((PAGE_W / 2.0, 24.0, str(pno)))
        pages.append(spans)
    return pages


def simple_pdf(lines: List[str], **layout_kwargs) -> bytes:
    """One-call fixture helper: lines → laid-out deterministic PDF."""
    return make_pdf(layout_text(lines, **layout_kwargs))
