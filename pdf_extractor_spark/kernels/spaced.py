"""Spaced-out-text detection and collapse (operators P4, P5, P14).

Reproduces /root/reference/src/processing/chapter_processor.py:16-25,
179-204 (line level) and /root/reference/src/processing/
text_processor.py:128-168 (document-level fixpoint).
"""

from __future__ import annotations

import re
from typing import List

# P4 — patterns marking a line as containing spaced-out text
# (chapter_processor.py:16-25).
SPACED_LINE_PATTERNS = [
    re.compile(r"^C\s+h\s+a\s+p\s+t\s+e\s+r\s+\d+"),
    re.compile(r"^[A-Z](\s+[a-z])+$"),
    re.compile(r"^([A-Z](\s+[a-z])+\s+)+[A-Z](\s+[a-z])+$"),
]


def has_spaced_text(line: str) -> bool:
    """P4 predicate (chapter_processor.py:179-181)."""
    return any(p.search(line) for p in SPACED_LINE_PATTERNS)


def collapse_spaced_text(line: str) -> str:
    """P5 — join runs of single-letter tokens (chapter_processor.py:183-204).

    ``"R a c e s"`` → ``"Races"``; multi-letter tokens flush the buffer.
    """
    cleaned: List[str] = []
    run: List[str] = []
    for tok in line.split():
        if len(tok) == 1 and tok.isalpha():
            run.append(tok)
        else:
            if run:
                cleaned.append("".join(run))
                run = []
            cleaned.append(tok)
    if run:
        cleaned.append("".join(run))
    return " ".join(cleaned)


# P14 — document-level fixpoint (text_processor.py:128-168).
_JOIN_ACROSS_LINES = re.compile(r"([A-Za-z])\s*\n\s*([A-Za-z])")
_SPACED_DOC_PATTERN = re.compile(
    r"(?:[A-Z]\s+[a-z]+)|(?:[A-Z]\s+){2,}[A-Z]|[A-Z](?:\s*\n\s*[A-Z])+[A-Z]",
    re.MULTILINE,
)
_CAP_SP_LOWER = re.compile(r"^[A-Z]\s+[a-z]+$")


def _collapse_match(match: "re.Match[str]") -> str:
    word = match.group(0)
    parts = word.split()
    cleaned: List[str] = []
    run: List[str] = []
    for part in parts:
        if len(part) == 1 and part.isalpha():
            run.append(part)
        elif _CAP_SP_LOWER.match(part):
            cleaned.append(part.replace(" ", ""))
        else:
            if run:
                cleaned.append("".join(run))
                run = []
            cleaned.append(part)
    if run:
        cleaned.append("".join(run))
    return " ".join(cleaned)


def clean_spaced_text_doc(text: str) -> str:
    """P14 — iterate regex-driven collapse until fixpoint
    (text_processor.py:128-168), joining cross-line splits first.
    """
    text = _JOIN_ACROSS_LINES.sub(
        lambda m: m.group(1) + " " + m.group(2), text)
    prev = None
    while prev != text:
        prev = text
        text = _SPACED_DOC_PATTERN.sub(_collapse_match, text)
    return text
