"""Property-based kernel tests (SURVEY.md §5.2 item 4 family).

Hypothesis drives arbitrary text/bytes through the kernels and checks
the invariants the Spark pipeline relies on: idempotence of the
normalizer, structural guarantees of the line ops, totality (no
exceptions — a poison document must become a failure_reason row, never
a task abort), and determinism.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.kernels import doctype, lines, spaced, textnorm
from pdf_extractor_spark.pipeline.extract import extract_document

# text-ish strategy: printable + whitespace + a few unicode letters
TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " \t\n.,;:!?•-&é",
    max_size=800)


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_normalize_idempotent(s):
    once = textnorm.normalize_raw_text(s)
    assert textnorm.normalize_raw_text(once) == once


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_process_lines_invariants(s):
    res = lines.process_lines(s)
    ls = res["lines"]
    assert all(ln == ln.strip() and ln for ln in ls)
    assert all("\n" not in ln for ln in ls)
    stats = res["stats"]
    assert stats["total_lines"] == len(ls)
    if ls:
        assert stats["max_line_length"] == max(len(ln) for ln in ls)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=string.ascii_letters + " .!?", min_size=1,
               max_size=6000))
def test_split_long_line_bounds(s):
    pieces = lines.split_long_line(s)
    # every piece within the cap unless it has no sentence boundary to
    # split at; and nothing is lost (joined content = original modulo
    # the split whitespace)
    for p in pieces:
        assert len(p) <= lines.MAX_LINE_LENGTH or "." not in p.rstrip(".")
    assert "".join(pieces).replace(" ", "") == s.replace(" ", "")


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_spaced_fixpoint_terminates_and_is_fixed(s):
    out = spaced.clean_spaced_text_doc(s)
    assert spaced.clean_spaced_text_doc(out) == out


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_doctype_total(b):
    assert doctype.detect_doctype(b) in {
        doctype.DOC_PDF, doctype.DOC_HTML, doctype.DOC_TEXT,
        doctype.DOC_EMPTY}


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=600), st.one_of(st.none(), TEXT))
def test_extract_document_never_raises(payload, pre_text):
    out = extract_document(payload, pre_text, "https://x.example/p",
                           ("raw", "lines", "chapters", "processed",
                            "markdown"))
    # totality: junk in → failure_reason or text out, never an exception
    assert ("failure_reason" in out) and ("text" in out)
    out2 = extract_document(payload, pre_text, "https://x.example/p",
                            ("raw", "lines", "chapters", "processed",
                             "markdown"))
    assert out == out2  # determinism
