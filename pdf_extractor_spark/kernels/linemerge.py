"""Line-merge fixpoint and vertical-text collector (P10, P11).

Both operators are DEAD CODE in the reference — defined on
ChapterProcessor but never called from ``process()`` (SURVEY.md §2.2
rows P10/P11) — so no golden can pin them and the live pipeline does
not invoke them. Implemented here as the documented intent, the same
treatment Q12 gives the unreachable table parser: the semantics exist,
are unit-tested, and stay OFF the default path exactly like the
reference's.

- ``should_merge_with_previous`` = ``_should_merge_with_previous``
  (/root/reference/src/processing/chapter_processor.py:342-361,
  patterns :28-33) — note this chapter-level predicate differs from
  the markdown converter's paragraph-merge predicate (P9,
  kernels/markdown.format_paragraphs): it is case-insensitive, has a
  longer conjunction list, and treats bullets as continuations.
- ``merge_lines``            = ``_merge_lines``          (:363-418) —
  pairwise merge fixpoint, dehyphenating on a trailing ``-``, at most
  10 iterations; a pass that merges nothing ends the loop.
- ``collect_vertical_text``  = ``_collect_vertical_text`` (:420-454) —
  runs of single-letter lines (lookahead capped at 5) joined into one
  word.
"""

from __future__ import annotations

import re
from typing import List, Tuple

# chapter_processor.py:28-33
CONTINUATION_PATTERNS = [
    r"^[a-z]",
    r"^(and|or|but|nor|for|yet|so|the|a|an|in|on|at|to|of|with|by|from)\b",
    r"^\s*[,;]\s*",
    r"^\s*[-•]\s*",
]
_CONTINUATION = [re.compile(p, re.IGNORECASE)
                 for p in CONTINUATION_PATTERNS]

VERTICAL_TEXT_PATTERN = re.compile(r"^[a-zA-Z]$")  # :36
MAX_VERTICAL_GAP = 5                               # :37
MAX_MERGE_ITERATIONS = 10                          # :363

_DANGLING = ("and", "or", "but", "the", "a", "an", "in", "on", "at",
             "to", "of", "with")                   # :352
_TERMINAL = re.compile(r"[.!?:;,]\s*$")            # :356
_LEADING_PUNCT = (",", ".", ";", ":", "?", "!")    # :398


def should_merge_with_previous(current: str, previous: str) -> bool:
    """P9 chapter-level predicate (chapter_processor.py:342-361)."""
    if not current or not previous:
        return False
    if any(p.match(current) for p in _CONTINUATION):
        return True
    if previous.rstrip().endswith(_DANGLING):
        return True
    if not _TERMINAL.search(previous):
        if not current[0].isupper() or current.startswith(
                ("and ", "or ", "but ")):
            return True
    return False


def merge_lines(lines: List[str],
                max_iterations: int = MAX_MERGE_ITERATIONS) -> List[str]:
    """P10 pairwise merge fixpoint (chapter_processor.py:363-418).

    Each pass walks the list once, merging flagged pairs (consuming
    both); a pass that changes nothing returns the CURRENT state, and
    hitting the iteration cap returns the ORIGINAL input — both quirks
    preserved from the reference (:407-409, :414-417)."""
    if not lines:
        return lines
    iteration = 0
    current_lines = list(lines)
    while iteration < max_iterations:
        if len(current_lines) <= 1:
            break
        merged: List[str] = []
        i = 0
        while i < len(current_lines):
            if i == len(current_lines) - 1:
                merged.append(current_lines[i])
                break
            current = current_lines[i]
            next_line = current_lines[i + 1]
            if should_merge_with_previous(next_line.strip(),
                                          current.strip()):
                if current.rstrip().endswith("-"):
                    merged_line = current.rstrip()[:-1] + next_line.lstrip()
                else:
                    space = "" if next_line.lstrip().startswith(
                        _LEADING_PUNCT) else " "
                    merged_line = current.rstrip() + space \
                        + next_line.lstrip()
                merged.append(merged_line)
                i += 2
            else:
                merged.append(current)
                i += 1
        if len(merged) == len(current_lines):
            return current_lines
        current_lines = merged
        iteration += 1
    if iteration >= max_iterations:
        return lines  # reference quirk: cap → ORIGINAL input (:414-417)
    return current_lines


def collect_vertical_text(lines: List[str],
                          start_idx: int) -> Tuple[str, int]:
    """P11 vertical-text collector (chapter_processor.py:420-454)."""
    if start_idx >= len(lines):
        return "", 0
    collected: List[str] = []
    i = start_idx
    lines_consumed = 0
    while i < len(lines) and lines_consumed < MAX_VERTICAL_GAP:
        line = lines[i].strip()
        if VERTICAL_TEXT_PATTERN.match(line):
            collected.append(line)
            lines_consumed += 1
            i += 1
        elif all(len(w) == 1 and w.isalpha() for w in line.split()):
            # vacuously true for BLANK lines — the reference consumes
            # them (empty split → all() is True, :433-436); reproduce
            collected.extend(line.split())
            lines_consumed += 1
            i += 1
        elif collected:
            break
        else:
            return "", 0
    if not collected:
        return "", 0
    return "".join(collected), lines_consumed
