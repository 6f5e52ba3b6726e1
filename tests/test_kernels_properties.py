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
    # The contract is the reference's (text_processor.py:128-168): the
    # REGEX-COLLAPSE loop runs to fixpoint; the cross-line join before it
    # runs ONCE. The whole function is deliberately NOT idempotent — the
    # join consumes alternate newlines only (non-overlapping matches), so
    # a second call can join the survivors: ref('A\na\nA') == 'Aa\nA' but
    # ref(ref(..)) == 'Aa A' (verified against the reference source).
    out = spaced.clean_spaced_text_doc(s)
    assert spaced._SPACED_DOC_PATTERN.sub(spaced._collapse_match, out) == out


def test_spaced_doc_clean_single_join_pass_quirk():
    """Named quirk: the once-only cross-line join skips alternate
    newlines, so the doc-level clean is not idempotent (reference
    text_processor.py:131 runs the join a single time before the loop).
    Pin the exact reference outputs for the minimal counterexample."""
    assert spaced.clean_spaced_text_doc("A\na\nA") == "Aa\nA"
    assert spaced.clean_spaced_text_doc("Aa\nA") == "Aa A"


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


# --- markdown/advanced validator + cleaner invariants (round 2) --------

MD_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " \t\n.,;:!?`'#-",
    max_size=600)


@settings(max_examples=150, deadline=None)
@given(MD_TEXT)
def test_extract_sections_partitions_lines(s):
    """Section split is a PARTITION of the input lines when code blocks
    are kept: every line lands in exactly one section, in order."""
    from pdf_extractor_spark.kernels.mdvalidator import extract_sections
    ls = s.split("\n")
    secs = extract_sections(ls, ignore_code_blocks=False)
    rebuilt = [line for sec in secs for line in sec["text"]]
    assert rebuilt == ls


@settings(max_examples=150, deadline=None)
@given(MD_TEXT)
def test_validate_markdown_total_and_deterministic(s):
    from pdf_extractor_spark.kernels.mdvalidator import validate_markdown
    a = validate_markdown(s)
    b = validate_markdown(s)
    assert a == b
    for e in a:  # positions are 1-based and inside the document
        assert e["line_num"] >= 1 and e["column"] >= 1
        assert e["line_num"] <= len(s.split("\n"))


@settings(max_examples=150, deadline=None)
@given(MD_TEXT)
def test_chapter_split_reassembles(s):
    from pdf_extractor_spark.kernels.advvalidator import \
        split_into_chapters
    chapters = split_into_chapters(s)
    assert "\n".join(chapters) == s


@settings(max_examples=100, deadline=None)
@given(MD_TEXT)
def test_fix_errors_total_and_idempotent_when_clean(s):
    """Auto-fix never crashes; applying it to already-fixed text with
    no remaining high-confidence errors is a no-op."""
    from pdf_extractor_spark.kernels.advvalidator import fix_errors
    fixed, n, _ = fix_errors(s)
    again, n2, _ = fix_errors(fixed)
    if n2 == 0:
        assert again == fixed


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_clean_text_total_and_line_preserving(s):
    from pdf_extractor_spark.kernels.textcleaner import clean_text
    out = clean_text(s)
    assert out.count("\n") == s.count("\n")
    assert clean_text(s) == out  # deterministic
