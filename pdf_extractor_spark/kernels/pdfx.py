"""PDF text-layer extraction — pure-Python mini layout parser.

North-star component (BASELINE.json): "a PDF layout parser (page object
tree, text-line clustering by y-coordinate, column detection,
dehyphenation, header/footer stripping) for PDF bytes". The reference
delegates this to PyMuPDF/pypdf (S2/S3,
/root/reference/src/extraction/pdf_extractor.py:120-161); neither is
installed here, so this kernel implements the text-layer subset from
the public PDF 1.7 spec (ISO 32000-1 §9: text objects and positioning
operators), with optional FlateDecode streams via stdlib zlib.

Scope: uncompressed or Flate content streams, literal/hex strings,
``BT/ET``, ``Tm/Td/TD/T*/TL``, ``Tj/TJ/'/"``. That covers the synthetic
fixture corpus and simple real-world text PDFs; encrypted/CID-font PDFs
report a failure reason instead of text (the pipeline surfaces it in
lineage, mirroring the reference's blanket fallback chain S5).

If PyMuPDF/pypdf are importable on an executor they are preferred
(fallback chain S5: fitz → pypdf → builtin), keeping the reference's
first-non-empty-wins semantics.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

try:  # pragma: no cover - not installed in this environment
    import fitz  # type: ignore
except Exception:
    fitz = None
try:  # pragma: no cover
    import pypdf  # type: ignore
except Exception:
    pypdf = None

Y_TOLERANCE = 2.0          # text-line clustering tolerance (points)
COLUMN_GAP_MIN = 90.0      # minimum x gap to declare a column split
TJ_SPACE_THRESHOLD = -180  # TJ kerning (1/1000 em) treated as a space

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_CONTENTS_REF = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR = re.compile(rb"/Contents\s*\[(.*?)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)")
_PAGENUM_LINE = re.compile(r"^\d+$")


class PdfParseError(ValueError):
    """Raised when the payload has no extractable text layer."""


# ---------------------------------------------------------------------------
# Content-stream tokenizer
# ---------------------------------------------------------------------------

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


_LIT_SPECIAL = re.compile(rb"[\\()]")


def _read_literal_string(data: bytes, i: int) -> Tuple[bytes, int]:
    """Read a ``(...)`` literal string starting at index of ``(``.

    Ordinary bytes are bulk-copied up to the next ``\\ ( )`` (regex
    scan) instead of one byte at a time — identical output, ~2× on
    string-heavy streams; the escape/depth logic is unchanged."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        m = _LIT_SPECIAL.search(data, i)
        if m is None:
            out += data[i:]
            i = n
            break
        j = m.start()
        out += data[i:j]
        c = data[j]
        if c == 0x5C:  # backslash
            nxt = data[j + 1:j + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i = j + 2
            elif nxt.isdigit():
                oct_digits = data[j + 1:j + 4]
                m2 = re.match(rb"[0-7]{1,3}", oct_digits)
                digits = m2.group(0) if m2 else b"0"
                out.append(int(digits, 8) & 0xFF)
                i = j + 1 + len(digits)
            else:
                i = j + 2
        elif c == 0x28:  # (
            depth += 1
            out += b"("
            i = j + 1
        else:  # )
            depth -= 1
            if depth:
                out += b")"
            i = j + 1
    return bytes(out), i


_NAME_RE = re.compile(rb"/[^\s()<>\[\]{}/%]*")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")
_WS_SET = frozenset(b" \t\r\n\x00")  # iterating bytes yields ints


def _tokenize(stream: bytes):
    """Yield (kind, value) tokens: 'str', 'num', 'name', 'op', 'arr_open',
    'arr_close'.

    Token-identical rewrite of the byte-sliced original (pinned by the
    golden suite + round-trip property tests): integer indexing instead
    of 1-byte slices, and the name/op regexes anchor with
    ``pattern.match(stream, i)`` instead of matching against a COPY of
    the remaining stream — the old ``stream[i:]`` slice made the
    tokenizer quadratic on long content streams."""
    i, n = 0, len(stream)
    while i < n:
        b = stream[i]
        if b in _WS_SET:
            i += 1
        elif b == 0x25:  # %
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif b == 0x28:  # (
            s, i = _read_literal_string(stream, i)
            yield ("str", s)
        elif b == 0x3C and stream[i + 1:i + 2] != b"<":  # < but not <<
            j = stream.find(b">", i)
            hexs = re.sub(rb"[^0-9A-Fa-f]", b"", stream[i + 1:j if j > 0 else n])
            if len(hexs) % 2:
                hexs += b"0"
            yield ("str", bytes.fromhex(hexs.decode("ascii")))
            i = (j + 1) if j > 0 else n
        elif stream[i:i + 2] == b"<<":
            i += 2
        elif stream[i:i + 2] == b">>":
            i += 2
        elif b == 0x5B:  # [
            yield ("arr_open", None)
            i += 1
        elif b == 0x5D:  # ]
            yield ("arr_close", None)
            i += 1
        elif b == 0x2F:  # /
            m = _NAME_RE.match(stream, i)
            yield ("name", m.group(0))
            i = m.end()
        else:
            m = _NUM_RE.match(stream, i)
            if m and m.start() == i:
                yield ("num", float(m.group(0)))
                i = m.end()
            else:
                m = _OP_RE.match(stream, i)
                if m:
                    yield ("op", m.group(0))
                    i = m.end()
                else:
                    i += 1  # unknown byte — skip


# ---------------------------------------------------------------------------
# Text-object interpreter → positioned spans
# ---------------------------------------------------------------------------

def _decode_pdf_text(raw: bytes) -> str:
    """Decode a shown string: UTF-16BE when BOM'd, else PDFDocEncoding
    approximated by latin-1 (exact for ASCII, which our corpus is).
    """
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1", errors="replace")


def extract_spans(stream: bytes) -> List[Tuple[float, float, int, str]]:
    """Interpret text operators, returning spans ``(y, x, seq, text)``."""
    spans: List[Tuple[float, float, int, str]] = []
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 0.0
    seq = 0
    stack: List[Tuple[str, object]] = []
    in_array = False
    arr: List[object] = []

    def show(raw: bytes) -> None:
        nonlocal seq
        text = _decode_pdf_text(raw)
        if text:
            spans.append((y, x, seq, text))
            seq += 1

    for kind, value in _tokenize(stream):
        if kind == "arr_open":
            in_array, arr = True, []
            continue
        if kind == "arr_close":
            in_array = False
            stack.append(("arr", arr))
            continue
        if in_array:
            arr.append(value if kind == "num" else value)
            continue
        if kind in ("num", "str", "name", "arr"):
            stack.append((kind, value))
            continue

        op = value
        if op == b"Tm" and len(stack) >= 6:
            x = float(stack[-2][1])  # e
            y = float(stack[-1][1])  # f
            line_x, line_y = x, y
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            tx, ty = float(stack[-2][1]), float(stack[-1][1])
            line_x += tx
            line_y += ty
            x, y = line_x, line_y
            if op == b"TD":
                leading = -ty
        elif op == b"TL" and stack:
            leading = float(stack[-1][1])
        elif op == b"T*":
            line_y -= leading
            x, y = line_x, line_y
        elif op == b"Tj" and stack and stack[-1][0] == "str":
            show(stack[-1][1])
        elif op == b"'" and stack and stack[-1][0] == "str":
            line_y -= leading
            x, y = line_x, line_y
            show(stack[-1][1])
        elif op == b'"' and stack and stack[-1][0] == "str":
            line_y -= leading
            x, y = line_x, line_y
            show(stack[-1][1])
        elif op == b"TJ" and stack and stack[-1][0] == "arr":
            parts: List[str] = []
            for item in stack[-1][1]:  # type: ignore[union-attr]
                if isinstance(item, bytes):
                    parts.append(_decode_pdf_text(item))
                elif isinstance(item, float) and item <= TJ_SPACE_THRESHOLD:
                    parts.append(" ")
            show("".join(parts).encode("latin-1", errors="replace"))
        elif op in (b"BT", b"ET"):
            pass
        if kind == "op":
            stack.clear()
    return spans


# ---------------------------------------------------------------------------
# Layout: y-clustering, column detection
# ---------------------------------------------------------------------------

def _cluster_lines(spans: List[Tuple[float, float, int, str]]) -> List[str]:
    """Cluster spans into text lines by y (tolerance Y_TOLERANCE), top
    first; within a line sort by x then emission order."""
    lines: List[str] = []
    for group in _group_by_y(spans):
        group.sort(key=lambda s: (s[1], s[2]))
        text = " ".join(t for (_, _, _, t) in group if t.strip())
        if text.strip():
            lines.append(re.sub(r"\s+", " ", text).strip())
    return lines


def _group_by_y(spans: List[Tuple[float, float, int, str]]
                ) -> List[List[Tuple[float, float, int, str]]]:
    groups: List[List[Tuple[float, float, int, str]]] = []
    for span in sorted(spans, key=lambda s: (-s[0], s[1], s[2])):
        if groups and abs(groups[-1][0][0] - span[0]) <= Y_TOLERANCE:
            groups[-1].append(span)
        else:
            groups.append([span])
    return groups


def detect_column_split(spans: List[Tuple[float, float, int, str]]
                        ) -> Optional[float]:
    """Find a two-column x boundary: the largest gap between adjacent
    span-start x values where both sides hold >=25% of spans and the gap
    exceeds COLUMN_GAP_MIN."""
    xs = sorted({round(s[1], 1) for s in spans})
    if len(xs) < 2:
        return None
    n = len(spans)
    best: Optional[Tuple[float, float]] = None  # (gap, boundary)
    for a, b in zip(xs, xs[1:]):
        gap = b - a
        if gap < COLUMN_GAP_MIN:
            continue
        boundary = (a + b) / 2.0
        left = sum(1 for s in spans if s[1] < boundary)
        right = n - left
        if left >= 0.25 * n and right >= 0.25 * n:
            if best is None or gap > best[0]:
                best = (gap, boundary)
    return best[1] if best else None


def page_lines(spans: List[Tuple[float, float, int, str]]) -> List[str]:
    """Spans → reading-order lines, with column detection: when a
    two-column boundary exists, emit the left column top-to-bottom then
    the right column (reading order)."""
    if not spans:
        return []
    boundary = detect_column_split(spans)
    if boundary is None:
        return _cluster_lines(spans)
    left = [s for s in spans if s[1] < boundary]
    right = [s for s in spans if s[1] >= boundary]
    return _cluster_lines(left) + _cluster_lines(right)


# ---------------------------------------------------------------------------
# Document assembly: page tree, header/footer strip, dehyphenation
# ---------------------------------------------------------------------------

def _object_map(payload: bytes) -> Dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(payload)}

def _stream_of(body: bytes) -> Optional[bytes]:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    data = m.group(1)
    if b"/FlateDecode" in body[: m.start()]:
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None
    return data


def page_streams(payload: bytes) -> List[bytes]:
    """Walk the page object tree → ordered content streams. Falls back
    to all BT-bearing streams in file order for treeless payloads."""
    objs = _object_map(payload)
    page_ids: List[int] = []
    # Page tree via /Kids where present (document order).
    for body in objs.values():
        if b"/Type" in body and b"/Pages" in body:
            m = _KIDS_RE.search(body)
            if m:
                page_ids = [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
                break
    if not page_ids:
        page_ids = [oid for oid, body in objs.items()
                    if re.search(rb"/Type\s*/Page\b", body)]
        page_ids.sort(key=lambda oid: payload.find(b"%d 0 obj" % oid))

    streams: List[bytes] = []
    for pid in page_ids:
        body = objs.get(pid, b"")
        content_ids: List[int] = []
        m = _CONTENTS_ARR.search(body)
        if m:
            content_ids = [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
        else:
            m2 = _CONTENTS_REF.search(body)
            if m2:
                content_ids = [int(m2.group(1))]
        page_data = b""
        for cid in content_ids:
            s = _stream_of(objs.get(cid, b""))
            if s:
                page_data += s + b"\n"
        if page_data:
            streams.append(page_data)
    if not streams:
        streams = [s for body in objs.values()
                   if (s := _stream_of(body)) and b"BT" in s]
    return streams


def strip_headers_footers(pages: List[List[str]]) -> List[List[str]]:
    """Drop repeated per-page first/last lines (headers/footers) and
    bare page-number lines at page edges. Relational analog: group-by
    line, count(*) > k over URL-prefix (SURVEY.md A8 generalization).
    """
    # Bare page numbers at either edge first (any page count), so they
    # don't mask a repeated footer line behind them.
    trimmed: List[List[str]] = []
    for p in pages:
        if p and _PAGENUM_LINE.match(p[0]):
            p = p[1:]
        if p and _PAGENUM_LINE.match(p[-1]):
            p = p[:-1]
        trimmed.append(p)
    pages = trimmed

    n = len(pages)
    if n >= 2:
        threshold = max(2, n // 2 + 1)
        for _ in range(2):  # twice: catches stacked header+subheader
            firsts = [p[0] for p in pages if p]
            lasts = [p[-1] for p in pages if p]
            rep_first = {t for t in set(firsts) if firsts.count(t) >= threshold}
            rep_last = {t for t in set(lasts) if lasts.count(t) >= threshold}
            if not rep_first and not rep_last:
                break
            pages = [
                [ln for i, ln in enumerate(p)
                 if not (i == 0 and ln in rep_first)
                 and not (i == len(p) - 1 and ln in rep_last)]
                for p in pages
            ]
    return pages


def dehyphenate(lines: List[str]) -> List[str]:
    """Join hyphen-broken line pairs (``xxx-`` + lowercase start)."""
    out: List[str] = []
    skip = False
    for i, ln in enumerate(lines):
        if skip:
            skip = False
            continue
        if (ln.endswith("-") and i + 1 < len(lines)
                and lines[i + 1][:1].islower()):
            out.append(ln[:-1] + lines[i + 1])
            skip = True
        else:
            out.append(ln)
    return out


def extract_pdf_text_builtin(payload: bytes) -> str:
    """Builtin extraction: page streams → spans → layout → header/footer
    strip → dehyphenate → pages joined with ``\\n\\n`` (mirroring the
    reference's page join, pdf_extractor.py:137)."""
    streams = page_streams(payload)
    if not streams:
        raise PdfParseError("no content streams with a text layer")
    pages = [page_lines(extract_spans(s)) for s in streams]
    pages = strip_headers_footers(pages)
    pages = [dehyphenate(p) for p in pages]
    return "\n\n".join("\n".join(p) for p in pages)


def extract_pdf_text(payload: bytes) -> str:
    """S5 fallback chain: fitz → pypdf → builtin, first non-empty wins
    (pdf_extractor.py:50-54,73-81)."""
    if fitz is not None:  # pragma: no cover
        try:
            doc = fitz.open(stream=payload, filetype="pdf")
            text = "\n\n".join(page.get_text() for page in doc)
            if text.strip():
                return text
        except Exception:
            pass
    if pypdf is not None:  # pragma: no cover
        try:
            import io
            reader = pypdf.PdfReader(io.BytesIO(payload))
            text = "\n\n".join((pg.extract_text() or "") for pg in reader.pages)
            if text.strip():
                return text
        except Exception:
            pass
    return extract_pdf_text_builtin(payload)
