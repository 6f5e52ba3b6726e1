"""Advanced text validator: OCR split/joined-word detection + auto-fix
(operators A9, O6, O7, P22).

Reproduces the regex surface of /root/reference/src/nlp/
advanced_validator.py — the parts that need no heavy NLP runtime:

- ``check_split_words``    = ``_check_split_words``   (:566-683) with
  the specific pattern list (:96-132), the general ``\\w{2,} \\w{2,}``
  pattern with its 7 false-positive skip rules (:619-665), and the
  ignore-pattern list (:159-223);
- ``check_joined_words``   = ``_check_joined_words``  (:685-735,
  patterns :141-156);
- ``validate_text``        = ``validate_text``        (:737-798) —
  section split (shared with the markdown validator, :303-346 is a
  verbatim duplicate of markdown_validator._extract_sections) and the
  per-section cap of 20 (:50, O4);
- ``clean_markdown``       = ``_clean_markdown``      (:292-301) via
  markdown+BeautifulSoup when importable, else a documented regex
  fallback (the container ships neither lib);
- ``split_into_chapters``  = ``_split_into_chapters`` (:917-978, P22):
  ``^#{1,2}\\s`` heading breaks, 50k-char chunk fallback;
- ``fix_errors``           = the file-less core of
  ``fix_errors_in_file`` (:980-1083): per-chapter validation, global
  position mapping (chapter anchor search :1019-1022), REVERSE-ordered
  application (O6, :1061-1062) with the optimistic verify
  (:1065-1074) that skips any fix whose expected text has shifted;
- ``format_fix_report``    = the report tail (:1085-1101) including
  the reference's counting quirk: applied-fix counts are taken from
  the first ``num_applied`` entries of the reverse-sorted list, not
  from the fixes that actually applied.

Grammar (LanguageTool) and coherence (spaCy) checks are deliberately
out of scope — per-executor NLP server singletons, optional in the
reference itself (init failure → ``None`` → checks skipped).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

from .mdvalidator import extract_sections, get_position

MIN_CONFIDENCE = 0.7          # advanced_validator.py:48
MAX_ERRORS_PER_SECTION = 20   # advanced_validator.py:50
FIX_MIN_CONFIDENCE = 0.9      # advanced_validator.py:981
MAX_CHUNK_SIZE = 50_000       # advanced_validator.py:941

# advanced_validator.py:96-132 — specific split-word patterns.
SPLIT_WORD_PATTERNS: List[Tuple[str, str, float]] = [
    (r"w\s+eapon", "weapon", 0.95),
    (r"ar\s+mor", "armor", 0.95),
    (r"c\s+haracter", "character", 0.95),
    (r"s\s+pell", "spell", 0.95),
    (r"m\s+agic", "magic", 0.95),
    (r"a\s+bility", "ability", 0.95),
    (r"s\s+kill", "skill", 0.95),
    (r"c\s+lass", "class", 0.95),
    (r"r\s+ace", "race", 0.95),
    (r"d\s+amage", "damage", 0.95),
    (r"c\s+reature", "creature", 0.95),
    (r"a\s+ttack", "attack", 0.95),
    (r"you\s+r\b", "your", 0.95),
    (r"you\s+rs\b", "yours", 0.95),
    (r"o\s+ur\b", "our", 0.95),
    (r"w\s+e\b", "we", 0.95),
    (r"th\s+ey\b", "they", 0.95),
    (r"th\s+em\b", "them", 0.95),
    (r"th\s+eir\b", "their", 0.95),
    (r"(\w{2,})-\s*\n\s*(\w{2,})", r"\1\2", 0.9),
    (r"som\s+e", "some", 0.95),
    (r"wh\s+at", "what", 0.95),
    (r"th\s+at", "that", 0.95),
    (r"th\s+is", "this", 0.95),
    (r"th\s+an", "than", 0.95),
    (r"wh\s+en", "when", 0.95),
    (r"wh\s+ere", "where", 0.95),
    (r"th\s+ere", "there", 0.95),
]

# :136-138 — the general split pattern; replacement joins the groups.
GENERAL_SPLIT_PATTERN = (r"\b(\w{2,})\s+(\w{2,})\b", 0.85)

# :141-156 — joined-word patterns.
JOINED_WORD_PATTERNS: List[Tuple[str, str, float]] = [
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
]

# :159-223 — false-positive ignore patterns for split-word detection.
IGNORE_WORDS: List[str] = [
    r"\d{2,4}\s+\d{2,4}",
    r"\d+\s+\w+\s+\d+",
    r"Dungeons\s+Dragons",
    r"Dungeon\s+Master",
    r"Players\s+Handbook",
    r"Chapter\s+\d+",
    r"Table\s+\d+",
    r"Figure\s+\d+",
    r"Part\s+\d+",
    r"Appendix\s+\w+",
    r"Table\s+of",
    r"Index\s+of",
    r"List\s+of",
    r"hit\s+points",
    r"armor\s+class",
    r"ability\s+score",
    r"saving\s+throw",
    r"spell\s+slot",
    r"attack\s+roll",
    r"spell\s+casting",
    r"action\s+economy",
    r"bonus\s+action",
    r"damage\s+type",
    r"damage\s+roll",
    r"ability\s+check",
    r"character\s+sheet",
    r"character\s+class",
    r"character\s+level",
    r"skill\s+check",
    r"concentration\s+check",
    r"based\s+on",
    r"depends\s+on",
    r"focuses\s+on",
    r"relies\s+on",
    r"consists\s+of",
    r"made\s+of",
    r"part\s+of",
    r"type\s+of",
    r"kind\s+of",
    r"sort\s+of",
    r"bunch\s+of",
    r"group\s+of",
    r"set\s+of",
    r"lot\s+of",
    r"full\s+of",
    r"capable\s+of",
    r"Table\s+of\s+Contents",
    r"Extracted\s+on",
    r"Created\s+by",
    r"Written\s+by",
    r"Edited\s+by",
    r"Published\s+by",
    r"Illustrated\s+by",
]

_PREPOSITIONS = ["of", "on", "in", "at", "by", "for", "with", "to", "from"]
_CONJUNCTIONS = ["and", "or", "but", "nor", "yet", "so"]
_HEADING = re.compile(r"^#{1,2}\s+")

TEXT_ERROR_FIELDS = ("line_num", "column", "text", "suggestion",
                     "confidence", "context", "error_type", "description")


def _error(line_num, column, text, suggestion, confidence, context,
           error_type, description) -> Dict:
    return {"line_num": line_num, "column": column, "text": text,
            "suggestion": suggestion, "confidence": confidence,
            "context": context, "error_type": error_type,
            "description": description}


# One alternation instead of 52 sequential searches per candidate —
# boolean-equivalent to any(re.search(p) for p in IGNORE_WORDS) (none
# of the patterns carry anchors or flags of their own) and ~10× faster
# in the general-split hot loop.
_IGNORE_COMBINED = re.compile(
    "|".join(f"(?:{p})" for p in IGNORE_WORDS), re.IGNORECASE)


def _ignored(matched: str) -> bool:
    return _IGNORE_COMBINED.search(matched) is not None


def check_split_words(text: str, line_offset: int, all_lines: List[str],
                      min_confidence: float = MIN_CONFIDENCE) -> List[Dict]:
    """Split-word detection (:566-683): specific patterns first, then
    the general two-word pattern behind its 7 skip rules."""
    errors: List[Dict] = []
    if len(text.strip()) < 5:
        return errors
    for pattern, replacement, confidence in SPLIT_WORD_PATTERNS:
        for match in re.finditer(pattern, text, re.IGNORECASE):
            if confidence < min_confidence:
                continue
            matched = match.group(0)
            if _ignored(matched):
                continue
            # string replacements stay RAW templates (:609 only calls
            # callables; r'\1\2' is reported verbatim) — same quirk as
            # the markdown validator
            suggestion = replacement
            line_index, column = get_position(text, match.start(),
                                              line_offset)
            context = all_lines[line_index] \
                if 0 <= line_index < len(all_lines) else ""
            errors.append(_error(
                line_index + 1, column + 1, matched, suggestion,
                confidence, context, "split_word",
                f"Split word detected: '{matched}' → '{suggestion}'"))
    pattern, confidence = GENERAL_SPLIT_PATTERN
    for match in re.finditer(pattern, text, re.IGNORECASE):
        if confidence < min_confidence:
            continue
        matched = match.group(0)
        replacement = match.group(1) + match.group(2)  # :137 lambda
        if _ignored(matched):
            continue
        if re.search(r"\d", matched):                      # dates (:638)
            continue
        if re.match(r"[A-Z][a-z]+\s+\d+", matched):        # "Chapter 5"
            continue
        if re.match(r"[A-Z][a-z]+\s+[A-Z][a-z]+", matched):  # proper names
            continue
        if any(matched.lower().endswith(f" {p}") for p in _PREPOSITIONS):
            continue
        if any(matched.lower().endswith(f" {c}") for c in _CONJUNCTIONS):
            continue
        words = matched.split()
        if len(words) == 2 and words[1][0].isupper():       # sentence edge
            continue
        line_index, column = get_position(text, match.start(), line_offset)
        context = all_lines[line_index] \
            if 0 <= line_index < len(all_lines) else ""
        errors.append(_error(
            line_index + 1, column + 1, matched, replacement, confidence,
            context, "split_word",
            f"Split word detected: '{matched}' → '{replacement}'"))
    return errors


def check_joined_words(text: str, line_offset: int, all_lines: List[str],
                       min_confidence: float = MIN_CONFIDENCE
                       ) -> List[Dict]:
    """Joined-word detection (:685-735)."""
    errors: List[Dict] = []
    if len(text.strip()) < 5:
        return errors
    for pattern, replacement, confidence in JOINED_WORD_PATTERNS:
        for match in re.finditer(pattern, text, re.IGNORECASE):
            if confidence < min_confidence:
                continue
            matched = match.group(0)
            suggestion = replacement  # raw template, per reference :713
            line_index, column = get_position(text, match.start(),
                                              line_offset)
            context = all_lines[line_index] \
                if 0 <= line_index < len(all_lines) else ""
            errors.append(_error(
                line_index + 1, column + 1, matched, suggestion,
                confidence, context, "joined_word",
                f"Joined word detected: '{matched}' → '{suggestion}'"))
    return errors


GRAMMAR_MAX_TEXT = 100_000  # advanced_validator.py:385
_LANGUAGE_TOOL = None
_LANGUAGE_TOOL_TRIED = False


def _get_language_tool():
    """Per-process LanguageTool singleton (advanced_validator.py:65-71:
    init failure → None → grammar checks skipped). On a cluster this is
    a per-executor lazy singleton, initialized once per Python worker.
    Module-level so tests can monkeypatch a fake engine in."""
    global _LANGUAGE_TOOL, _LANGUAGE_TOOL_TRIED
    if not _LANGUAGE_TOOL_TRIED:
        _LANGUAGE_TOOL_TRIED = True
        try:  # pragma: no cover - container has no language_tool_python
            import language_tool_python
            _LANGUAGE_TOOL = language_tool_python.LanguageTool("en-US")
        except Exception:
            _LANGUAGE_TOOL = None
    return _LANGUAGE_TOOL


def check_grammar(text: str, line_offset: int, all_lines: List[str],
                  min_confidence: float = MIN_CONFIDENCE) -> List[Dict]:
    """Grammar/spelling via LanguageTool (:362-488): MORFOLOGIK_ rules
    are spelling (confidence 0.9), everything else grammar (0.7); text
    capped at 100k chars. Quirk Q10: the reference's timeout context is
    broken (the TimeoutError fires after the work completes), so checks
    effectively run unpreempted — this kernel runs them unpreempted on
    purpose. Returns [] when no engine is installed, exactly like the
    reference's ``language_tool = None`` path (:376-377)."""
    tool = _get_language_tool()
    if tool is None or len(text.strip()) < 5:
        return []
    if len(text) > GRAMMAR_MAX_TEXT:
        text = text[:GRAMMAR_MAX_TEXT]
    errors: List[Dict] = []
    for match in tool.check(text):
        rule_id = str(getattr(match, "ruleId",
                              getattr(match, "rule_id", "UNKNOWN")))
        is_spelling = rule_id.startswith("MORFOLOGIK_")
        confidence = 0.9 if is_spelling else 0.7
        if confidence < min_confidence:
            continue
        offset = getattr(match, "offset", 0)
        error_length = getattr(match, "errorLength",
                               len(getattr(match, "context", "?")))
        line_index, column = get_position(text, offset, line_offset)
        context = all_lines[line_index] \
            if 0 <= line_index < len(all_lines) else ""
        error_text = text[offset:offset + error_length] \
            if offset + error_length <= len(text) else "?"
        replacements = getattr(match, "replacements", None) or [""]
        errors.append(_error(
            line_index + 1, column + 1, error_text, replacements[0],
            confidence, context,
            "spelling" if is_spelling else "grammar",
            getattr(match, "message", "Grammar or spelling issue")))
    return errors


def validate_text(content: str,
                  enabled: Sequence[str] = ("split_word", "joined_word",
                                            "grammar"),
                  max_errors_per_section: int = MAX_ERRORS_PER_SECTION,
                  min_confidence: float = MIN_CONFIDENCE) -> List[Dict]:
    """Section-split + per-family checks + cap of 20 (:737-798).
    Grammar requires LanguageTool (per-executor singleton, [] when
    absent — the reference's own degradation); spaCy coherence remains
    out of scope."""
    lines = content.split("\n")
    errors: List[Dict] = []
    for section in extract_sections(lines):
        text = "\n".join(section["text"])
        line_offset = section["start_line"]
        section_errors: List[Dict] = []
        if "split_word" in enabled:
            section_errors.extend(
                check_split_words(text, line_offset, lines, min_confidence))
        if "joined_word" in enabled:
            section_errors.extend(
                check_joined_words(text, line_offset, lines,
                                   min_confidence))
        if "grammar" in enabled:
            section_errors.extend(
                check_grammar(text, line_offset, lines, min_confidence))
        errors.extend(section_errors[:max_errors_per_section])
    return errors


def clean_markdown(content: str) -> str:
    """Markdown → plain text (:292-301). Uses markdown+BeautifulSoup
    when importable (the reference path); else a regex strip that
    removes heading markers, emphasis, links, and fences — a documented
    stand-in for containers without the libs."""
    try:
        import markdown as md_lib
        from bs4 import BeautifulSoup
        return BeautifulSoup(md_lib.markdown(content),
                             "html.parser").get_text()
    except ImportError:
        text = re.sub(r"^#{1,6}\s+", "", content, flags=re.MULTILINE)
        text = re.sub(r"```[^`]*```", "", text, flags=re.DOTALL)
        text = re.sub(r"\*\*?|__?", "", text)
        text = re.sub(r"\[([^\]]*)\]\([^)]*\)", r"\1", text)
        return text


def validate_markdown(content: str, **kw) -> List[Dict]:
    """Clean markdown → validate (:800-815)."""
    return validate_text(clean_markdown(content), **kw)


def split_into_chapters(content: str) -> List[str]:
    """P22 (:917-978): split on ``^#{1,2}\\s`` headings; fall back to
    ≤50k-char chunks when fewer than two headings exist."""
    lines = content.split("\n")
    chapter_breaks = [i for i, line in enumerate(lines)
                      if _HEADING.match(line)]
    if len(chapter_breaks) <= 1:
        if len(content) > MAX_CHUNK_SIZE:
            chunks, current, size = [], [], 0
            for line in lines:
                line_size = len(line) + 1
                if size + line_size > MAX_CHUNK_SIZE and current:
                    chunks.append("\n".join(current))
                    current, size = [line], line_size
                else:
                    current.append(line)
                    size += line_size
            if current:
                chunks.append("\n".join(current))
            return chunks
        return [content]
    chapters = []
    for i, start in enumerate(chapter_breaks):
        end = chapter_breaks[i + 1] if i < len(chapter_breaks) - 1 \
            else len(lines)
        chapters.append("\n".join(lines[start:end]))
    if chapter_breaks[0] > 0:
        chapters.insert(0, "\n".join(lines[:chapter_breaks[0]]))
    return chapters


def collect_fixes(content: str,
                  min_confidence: float = FIX_MIN_CONFIDENCE,
                  types_to_fix: Sequence[str] = ("split_word",
                                                 "joined_word")
                  ) -> List[Dict]:
    """Chapter-wise error detection mapped to global offsets
    (:1008-1058). Positions come from the CLEANED chapter text mapped
    onto the raw content — exactly the reference's behavior; the
    optimistic verify in ``apply_fixes`` is what guards the mismatch."""
    chapters = split_into_chapters(content)
    all_fixes: List[Dict] = []
    for i, chapter in enumerate(chapters, 1):
        chapter_offset = 0 if i == 1 else content.find(chapter[:100])
        errors = validate_markdown(chapter)
        filtered = [e for e in errors
                    if e["error_type"] in types_to_fix
                    and e["confidence"] >= min_confidence]
        chapter_lines = chapter.split("\n")
        for error in filtered:
            line_in_chapter = error["line_num"] - 1
            char_offset = sum(len(line) + 1
                              for line in chapter_lines[:line_in_chapter])
            char_offset += error["column"] - 1
            global_pos = chapter_offset + char_offset
            all_fixes.append({
                "start": global_pos,
                "end": global_pos + len(error["text"]),
                "original": error["text"],
                "replacement": error["suggestion"],
                "confidence": error["confidence"],
                "type": error["error_type"],
            })
    return all_fixes


def apply_fixes(content: str, fixes: List[Dict]) -> Tuple[str, int]:
    """O6 reverse-ordered application with optimistic verify
    (:1061-1078): sort by start desc so earlier offsets stay valid;
    apply only where the expected original text is still in place."""
    fixes = sorted(fixes, key=lambda x: x["start"], reverse=True)
    fixed = content
    num_applied = 0
    for fix in fixes:
        at = fixed[fix["start"]:fix["end"]]
        if at == fix["original"]:
            fixed = fixed[:fix["start"]] + fix["replacement"] \
                + fixed[fix["end"]:]
            num_applied += 1
    return fixed, num_applied


def fix_errors(content: str,
               min_confidence: float = FIX_MIN_CONFIDENCE,
               types_to_fix: Sequence[str] = ("split_word", "joined_word")
               ) -> Tuple[str, int, List[Dict]]:
    """End-to-end auto-fix (:980-1083): detect → reverse-apply.
    Returns (fixed_content, num_applied, fixes)."""
    fixes = collect_fixes(content, min_confidence, types_to_fix)
    fixed, num_applied = apply_fixes(content, fixes)
    return fixed, num_applied, fixes


def format_fix_report(name: str, fixes: List[Dict], num_applied: int,
                      output_name: Optional[str] = None) -> str:
    """A9 fix accounting (:1085-1101) — reproducing the reference's
    quirk of counting the first ``num_applied`` fixes of the
    reverse-sorted list rather than the ones that actually applied."""
    ordered = sorted(fixes, key=lambda x: x["start"], reverse=True)
    fix_types: Dict[str, int] = {}
    for fix in ordered[:num_applied]:
        fix_types[fix["type"]] = fix_types.get(fix["type"], 0) + 1
    report = [f"Applied {num_applied} fixes to {name}", ""]
    for fix_type, count in fix_types.items():
        report.append(f"- Fixed {count} {fix_type} issues")
    report.append("")
    report.append(f"Corrected file saved to: {output_name or name}")
    return "\n".join(report)
