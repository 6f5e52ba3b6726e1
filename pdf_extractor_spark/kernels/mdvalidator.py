"""Markdown diagnostics kernel (operators P21, O4, A6; quirk Q5).

Reproduces /root/reference/src/nlp/markdown_validator.py — the
reference's second-largest live module — as a pure per-document kernel:

- ``extract_sections``     = ``_extract_sections``       (:406-457, P21)
- ``validate_markdown``    = ``validate_markdown``        (:149-196) with
  the four check families: words (:198-260, J2 via kernels.wordcorr),
  phrases (:310-356), spacing (:262-308), word joins (:358-404), the
  per-section error cap ``[:max_errors_per_section]`` (:186-193, O4),
  and quirk Q5 ordering (family order word→phrase→spacing→join, then
  pattern-list order, then match order — what the cap truncates).
- ``get_position``         = ``_get_position``            (:459-481, O7)
- ``format_errors``        = ``format_errors``            (:483-523, A6)

Determinism: the word family calls ``kernels.wordcorr.correct_word``,
which scans the dictionary in sorted order (the documented Q7 fix);
everything else is pure ``re`` over the input string.

Reference quirks reproduced on purpose:
- suggestions carry the RAW replacement template (e.g. ``"\\1\\2"`` for
  the general split pattern :103) — the reference never expands group
  references into the suggestion string;
- on code-block START the current text section is appended even when
  empty (:438-439); the FINAL section is appended only when non-empty
  (:449-451);
- phrase and join patterns match case-insensitively (:334, :382),
  spacing patterns case-sensitively (:286);
- word positions advance via ``text.find(word, pos)`` (:228,:237,:258),
  so a word occurring earlier as a substring shifts reported columns
  exactly as the reference does.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from .wordcorr import MIN_WORD_LENGTH, correct_word

# (pattern, replacement, confidence) triples, verbatim semantics from
# markdown_validator.py:57-104 (spacing), :107-125 (joins), :128-147
# (phrases). Pattern literals necessarily match the reference — they ARE
# the semantics being reproduced.
SPACING_PATTERNS: List[Tuple[str, str, float]] = [
    (r"you\s+r\b", "your", 0.95),
    (r"you\s+rs\b", "yours", 0.95),
    (r"o\s+ur\b", "our", 0.95),
    (r"w\s+e\b", "we", 0.95),
    (r"th\s+ey\b", "they", 0.95),
    (r"th\s+em\b", "them", 0.95),
    (r"th\s+eir\b", "their", 0.95),
    (r"t\s+he\b", "the", 0.95),
    (r"a\s+nd\b", "and", 0.95),
    (r"o\s+f\b", "of", 0.95),
    (r"i\s+n\b", "in", 0.95),
    (r"o\s+n\b", "on", 0.95),
    (r"a\s+t\b", "at", 0.95),
    (r"b\s+ut\b", "but", 0.95),
    (r"f\s+or\b", "for", 0.95),
    (r"w\s+eapon", "weapon", 0.95),
    (r"ar\s+mor", "armor", 0.95),
    (r"c\s+haracter", "character", 0.95),
    (r"s\s+pell", "spell", 0.95),
    (r"m\s+agic", "magic", 0.95),
    (r"a\s+bility", "ability", 0.95),
    (r"s\s+kill", "skill", 0.95),
    (r"c\s+lass", "class", 0.95),
    (r"r\s+ace", "race", 0.95),
    (r"(\w{2,})-\s*\n\s*(\w{2,})", r"\1\2", 0.9),
    (r"som\s+e", "some", 0.95),
    (r"what\s+ever", "whatever", 0.95),
    (r"to\s+o", "too", 0.95),
    (r"with\s+in", "within", 0.95),
    (r"with\s+out", "without", 0.95),
    (r"any\s+one", "anyone", 0.95),
    (r"every\s+one", "everyone", 0.95),
    (r"some\s+one", "someone", 0.95),
    (r"no\s+one", "no one", 0.95),
    (r"\b(\w{2})\s+(\w{2,})\b", r"\1\2", 0.85),  # Q5: the noisy one
]

WORD_JOIN_PATTERNS: List[Tuple[str, str, float]] = [
    (r"weuse", "we use", 0.95),
    (r"youcan", "you can", 0.95),
    (r"youhave", "you have", 0.95),
    (r"youare", "you are", 0.95),
    (r"youmay", "you may", 0.95),
    (r"youmust", "you must", 0.95),
    (r"youmight", "you might", 0.95),
    (r"youshould", "you should", 0.95),
    (r"youdo", "you do", 0.95),
    (r"youget", "you get", 0.95),
    (r"it'sa", "it's a", 0.95),
    (r"that's(\w+)", r"that's \1", 0.95),
    (r"it's(\w+)", r"it's \1", 0.95),
    (r"there's(\w+)", r"there's \1", 0.95),
    (r"(\w+)'s(\w+)", r"\1's \2", 0.9),
]

PHRASE_PATTERNS: List[Tuple[str, str, float]] = [
    (r"characters?\s+sheet", "character's sheet", 0.9),
    (r"players?\s+handbook", "player's handbook", 0.9),
    (r"dungeon\s+masters?\s+guide", "dungeon master's guide", 0.9),
    (r"role\s+play", "roleplay", 0.9),
    (r"skill\s+check", "skill check", 0.9),
    (r"saving\s+throws?", "saving throw", 0.9),
    (r"hit\s+points?", "hit points", 0.9),
    (r"what ever", "whatever", 0.95),
    (r"which ever", "whichever", 0.95),
    (r"how ever", "however", 0.95),
    (r"when ever", "whenever", 0.95),
    (r"where ever", "wherever", 0.95),
    (r"who ever", "whoever", 0.95),
]

MIN_CONFIDENCE = 0.85          # markdown_validator.py:42
MAX_ERRORS_PER_SECTION = 10    # markdown_validator.py:44

_WORD_FINDALL = re.compile(r"\b(\w+)\b")

# MarkdownError as a plain dict; field set per markdown_validator.py:14-23.
MD_ERROR_FIELDS = ("line_num", "column", "text", "suggestion",
                   "confidence", "context", "error_type")


def _error(line_num: int, column: int, text: str, suggestion: str,
           confidence: float, context: str, error_type: str) -> Dict:
    return {"line_num": line_num, "column": column, "text": text,
            "suggestion": suggestion, "confidence": confidence,
            "context": context, "error_type": error_type}


def extract_sections(lines: List[str],
                     ignore_code_blocks: bool = True) -> List[Dict]:
    """P21 fenced-code section split (markdown_validator.py:406-457)."""
    sections: List[Dict] = []
    current: Dict = {"start_line": 0, "text": [], "type": "text"}
    in_code = False
    for i, line in enumerate(lines):
        if line.strip().startswith("```"):
            if in_code:
                in_code = False
                if not ignore_code_blocks:
                    current["end_line"] = i
                    current["text"].append(line)
                    sections.append(current)
                current = {"start_line": i + 1, "text": [], "type": "text"}
            else:
                current["end_line"] = i
                sections.append(current)  # appended even if empty (:439)
                in_code = True
                current = {"start_line": i, "text": [line], "type": "code"}
        else:
            current["text"].append(line)
    if current["text"]:
        current["end_line"] = len(lines)
        sections.append(current)
    if ignore_code_blocks:
        sections = [s for s in sections if s["type"] == "text"]
    return sections


def get_position(text: str, pos: int, line_offset: int) -> Tuple[int, int]:
    """O7 offset→(line_index, column) (markdown_validator.py:459-481)."""
    upto = text[:pos].split("\n")
    return len(upto) - 1 + line_offset, len(upto[-1])


def _validate_words(section: Dict, all_lines: List[str],
                    min_confidence: float) -> List[Dict]:
    """Word family (markdown_validator.py:198-260): findall words, run
    J2 correct_word, flag corrections at or above min_confidence."""
    errors: List[Dict] = []
    text = "\n".join(section["text"])
    pos = 0
    line_offset = section["start_line"]
    for word in _WORD_FINDALL.findall(text):
        if len(word) < MIN_WORD_LENGTH:
            pos = text.find(word, pos) + len(word)
            continue
        corrected, confidence = correct_word(word)
        if corrected != word and confidence >= min_confidence:
            word_pos = text.find(word, pos)
            line_index, column = get_position(text, word_pos, line_offset)
            context = all_lines[line_index] \
                if 0 <= line_index < len(all_lines) else ""
            errors.append(_error(line_index + 1, column + 1, word,
                                 corrected, confidence, context, "word"))
        pos = text.find(word, pos) + len(word)
    return errors


def _validate_patterns(section: Dict, all_lines: List[str],
                       patterns: List[Tuple[str, str, float]],
                       error_type: str, flags: int) -> List[Dict]:
    """Shared regex-family scan (markdown_validator.py:262-404): pattern
    list order then match order — the Q5 ordering the cap truncates."""
    errors: List[Dict] = []
    text = "\n".join(section["text"])
    line_offset = section["start_line"]
    for pattern, replacement, confidence in patterns:
        for match in re.finditer(pattern, text, flags):
            line_index, column = get_position(text, match.start(),
                                              line_offset)
            context = all_lines[line_index] \
                if 0 <= line_index < len(all_lines) else ""
            errors.append(_error(line_index + 1, column + 1,
                                 match.group(0), replacement, confidence,
                                 context, error_type))
    return errors


def validate_markdown(content: str, *,
                      min_confidence: float = MIN_CONFIDENCE,
                      max_errors_per_section: int = MAX_ERRORS_PER_SECTION,
                      enable_word_validation: bool = True,
                      enable_phrase_validation: bool = True,
                      enable_spacing_validation: bool = True,
                      ignore_code_blocks: bool = True) -> List[Dict]:
    """Full validation pass (markdown_validator.py:149-196): section
    split → per-section families in reference order → O4 cap."""
    lines = content.split("\n")
    sections = extract_sections(lines, ignore_code_blocks)
    errors: List[Dict] = []
    for section in sections:
        if section["type"] == "code" and ignore_code_blocks:
            continue  # :212-213 — unreachable when split already filters
        section_errors: List[Dict] = []
        if enable_word_validation:
            section_errors.extend(
                _validate_words(section, lines, min_confidence))
        if enable_phrase_validation:
            section_errors.extend(_validate_patterns(
                section, lines, PHRASE_PATTERNS, "phrase", re.IGNORECASE))
        if enable_spacing_validation:
            section_errors.extend(_validate_patterns(
                section, lines, SPACING_PATTERNS, "spacing", 0))
            section_errors.extend(_validate_patterns(
                section, lines, WORD_JOIN_PATTERNS, "joined_words",
                re.IGNORECASE))
        errors.extend(section_errors[:max_errors_per_section])
    return errors


def format_errors(errors: List[Dict], show_context: bool = True) -> str:
    """A6 grouped report (markdown_validator.py:483-523): counts per
    error_type in first-appearance order, then the numbered list with
    ``>>>text<<<`` context highlighting."""
    if not errors:
        return "No errors found!"
    by_type: Dict[str, List[Dict]] = {}
    for err in errors:
        by_type.setdefault(err["error_type"], []).append(err)
    report = [f"Found {len(errors)} potential errors:", ""]
    for error_type, type_errors in by_type.items():
        report.append(f"- {len(type_errors)} {error_type} issues")
    report.append("")
    for i, err in enumerate(errors, 1):
        label = f"[{err['error_type'].upper()}]"
        report.append(
            f"{i}. {label} Line {err['line_num']}, Col {err['column']}: "
            f"'{err['text']}' → '{err['suggestion']}' "
            f"({err['confidence']:.2f})")
        if show_context and err["context"]:
            highlighted = err["context"].replace(
                err["text"], f">>>{err['text']}<<<", 1)
            report.append(f"   {highlighted}")
            report.append("")
    return "\n".join(report)
