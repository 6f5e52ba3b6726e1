"""Document structuring (operators P13, P15-P19, O2).

Reproduces /root/reference/src/processing/text_processor.py (the
``TextProcessor`` fallback path, reachable via cli.py:306-308 when no
chapter structure exists — quirk Q8).

Quirk Q14 (new finding): ``_split_major_parts`` anchors on the FIRST
occurrence of ``Chapter 1:`` after the Contents heading
(text_processor.py:188-196) — when the TOC itself lists
``Chapter 1: ... <page>`` in standard format, the contents slice ends AT
that TOC entry, so the extracted TOC misses chapter 1 and the TOC tail
leaks into main_content. Reproduced as-is.

Quirk Q15 (new finding): ``_split_chapters``/``_split_appendices`` use
non-capturing ``re.split`` (text_processor.py:291-292,:298-299), which
CONSUMES the ``Chapter N`` / ``Appendix X`` marker; ``_process_chapter``
then requires ``chapter_pattern.match`` on the marker-less fragment
(:339) and returns None — so the reference's ``TextProcessor.process``
yields EMPTY ``chapters``/``appendices`` for standard-format documents.
Reproduced as-is (the live pipeline routes through the chapter fold +
cli Q8 reshaping, where this path is a rarely-hit fallback).

Quirk Q13 (new finding, beyond SURVEY §2.11): the reference's
``_process_blocks_to_sections`` path is dead code — it calls
``self.structure_analyzer.analyze_structure(...)`` (text_processor.py:355,
:402) which does not exist on ``TextStructureAnalyzer``
(src/nlp/text_structure.py defines ``analyze_document`` only) and would
raise AttributeError. Only the content-list branch
(text_processor.py:351-352) is reachable. This kernel implements the
documented *intent* with a deterministic heuristic block analyzer
(``analyze_blocks``) while matching reachable behavior on the goldens
(fixture chapters route through the content-list branch).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from .spaced import clean_spaced_text_doc

# Structure patterns (text_processor.py:42-55).
CHAPTER_PATTERN = re.compile(
    r"(?:C\s*h\s*a\s*p\s*t\s*e\s*r|CHAPTER)\s*(\d+)[:\s]+([^\n\.]+)|"
    r"(\d+)\.\s+([A-Za-z][^\n]*?(?:\s+[A-Za-z]){2,}[^\n]*)",
    re.IGNORECASE,
)
APPENDIX_PATTERN = re.compile(
    r"(?:A\s*p\s*p\s*e\s*n\s*d\s*i\s*x|APPENDIX)\s+([A-Z])[:\s]+([^\n\.]+)",
    re.IGNORECASE,
)
PAGE_NUMBER_PATTERN = re.compile(r"\s*(\d+)\s*$")

_NL_SPACE = re.compile(r"\s*\n\s*")
_MANY_NL = re.compile(r"\n{3,}")
_HYPHEN_BREAK = re.compile(r"(\w+)-\n(\w+)")
_DOT_LEADER = re.compile(r"\.{3,}")
_CONTENTS_HEAD = re.compile(
    r"(?:^|\n\n)C\s*o\s*n\s*t\s*e\s*n\s*t\s*s\s*(?:\n|$)", re.IGNORECASE
)
_CHAPTER_1 = re.compile(
    r"(?:^|\n)(?:C\s*h\s*a\s*p\s*t\s*e\s*r|CHAPTER)\s*1\s*:",
    re.IGNORECASE | re.MULTILINE,
)
_APPENDIX_HEAD = re.compile(
    r"(?:^|\n)(?:A\s*p\s*p\s*e\s*n\s*d\s*i\s*x|APPENDIX)\s+[A-Z]",
    re.IGNORECASE | re.MULTILINE,
)
_CHAPTER_SPLIT = re.compile(
    r"(?:^|\n)(?:C\s*h\s*a\s*p\s*t\s*e\s*r|CHAPTER)\s*\d+", re.IGNORECASE
)
_APPENDIX_SPLIT = re.compile(
    r"(?:^|\n)(?:A\s*p\s*p\s*e\s*n\s*d\s*i\s*x|APPENDIX)\s+[A-Z]", re.IGNORECASE
)
_CONTENT_LIST_HINT = re.compile(r"\.{3,}|\s+\d+\s*$", re.MULTILINE)
_BULLET_ITEM = re.compile(r"^(.*?)(?:\s*•\s*(\d+))?$")


def clean_text(text: str) -> str:
    """P13 — document-level cleanup (text_processor.py:104-126):
    newline tightening, ``o f``/``a n d``/``t h e`` fixes, spaced-text
    fixpoint (P14), dehyphenation, dotted leaders → bullets.
    """
    text = _NL_SPACE.sub("\n", text)
    text = text.replace("o f", "of")
    text = text.replace("a n d", "and")
    text = text.replace("t h e", "the")
    text = clean_spaced_text_doc(text)
    text = _MANY_NL.sub("\n\n", text)
    text = _HYPHEN_BREAK.sub(lambda m: m.group(1) + m.group(2), text)
    text = _DOT_LEADER.sub(" • ", text)
    return text.strip()


def split_major_parts(text: str) -> Dict[str, str]:
    """P15 — preface/contents/main_content/appendices string slices
    (text_processor.py:170-216), anchored on the Contents heading.
    """
    parts: Dict[str, str] = {}
    m = _CONTENTS_HEAD.search(text)
    if not m:
        return parts
    content_start = m.start()
    preface = text[:content_start].strip()
    if preface:
        parts["preface"] = preface
    remaining = text[content_start:]
    ch1 = _CHAPTER_1.search(remaining)
    if ch1:
        parts["contents"] = remaining[: ch1.start()].strip()
        remaining = remaining[ch1.start():]
        app = _APPENDIX_HEAD.search(remaining)
        if app:
            parts["main_content"] = remaining[: app.start()].strip()
            parts["appendices"] = remaining[app.start():].strip()
        else:
            parts["main_content"] = remaining.strip()
    else:
        parts["main_content"] = remaining.strip()
    return parts


def extract_page_number(text: str) -> Optional[int]:
    """Trailing page number (text_processor.py:278-286)."""
    m = PAGE_NUMBER_PATTERN.search(text)
    if m:
        try:
            return int(m.group(1))
        except ValueError:
            return None
    return None


def extract_toc(toc_text: str) -> List[Dict]:
    """P16 — TOC entry extraction (text_processor.py:218-276)."""
    entries: List[Dict] = []
    current_chapter: Optional[Dict] = None
    for raw in toc_text.split("\n"):
        line = raw.strip()
        if not line:
            continue
        cm = CHAPTER_PATTERN.search(line)
        if cm:
            g = cm.groups()
            if g[0] is not None:
                number, title = g[0], g[1]
            else:
                number, title = g[2], clean_spaced_text_doc(g[3])
            current_chapter = {
                "type": "chapter",
                "number": int(number),
                "title": title.strip(),
                "page": extract_page_number(line),
                "sections": [],
            }
            entries.append(current_chapter)
            continue
        am = APPENDIX_PATTERN.search(line)
        if am:
            letter, title = am.groups()
            entries.append({
                "type": "appendix",
                "letter": letter,
                "title": title.strip(),
                "page": extract_page_number(line),
            })
            current_chapter = None
            continue
        if current_chapter and "." in line:
            title, page_str = line.rsplit(".", 1)
            try:
                page = int(page_str.strip())
            except ValueError:
                continue
            current_chapter["sections"].append(
                {"title": title.strip(), "page": page}
            )
    return entries


def split_chapters(text: str) -> List[str]:
    """P17 — regex chapter split (text_processor.py:288-293)."""
    return [c.strip() for c in _CHAPTER_SPLIT.split(text) if c.strip()]


def split_appendices(text: str) -> List[str]:
    """P17 twin — appendix split (text_processor.py:295-300)."""
    return [a.strip() for a in _APPENDIX_SPLIT.split(text) if a.strip()]


def process_content_list(text: str) -> List[Dict]:
    """P18 — bullet-separated ``title • page`` items
    (text_processor.py:302-334); pure page-number lines skipped.
    """
    items: List[Dict] = []
    lines = text.split("\n")
    for raw in lines[1:]:
        line = raw.strip()
        if not line:
            continue
        m = _BULLET_ITEM.match(line)
        if m:
            title, page = m.groups()
            title = clean_spaced_text_doc(title.strip())
            if title and not title.isdigit():
                items.append({"title": title,
                              "page": int(page) if page else None})
    return items


# ---------------------------------------------------------------------------
# Heuristic block analyzer — the working implementation of the intent of
# TextStructureAnalyzer.analyze_structure (quirk Q13; no spaCy dependency).
# ---------------------------------------------------------------------------

_TITLE_CASE = re.compile(r"^(?:[A-Z][\w'&-]*)(?:\s+(?:[A-Z][\w'&-]*|of|the|and|a|an|in|on|to|for))*$")


def analyze_blocks(text: str) -> List[Tuple[str, str, int]]:
    """Classify lines into ``(text, block_type, level)`` blocks.

    Deterministic stand-in for the missing ``analyze_structure``: a line
    is a title when short (<=60 chars), without terminal punctuation, in
    title case; level 2 when <=30 chars else 3. Everything else is a
    paragraph block (level 0).
    """
    blocks: List[Tuple[str, str, int]] = []
    for raw in text.split("\n"):
        line = raw.strip()
        if not line:
            continue
        is_title = (
            len(line) <= 60
            and not re.search(r"[.!?,;:]$", line)
            and bool(_TITLE_CASE.match(line))
        )
        if is_title:
            blocks.append((line, "title", 2 if len(line) <= 30 else 3))
        else:
            blocks.append((line, "paragraph", 0))
    return blocks


def blocks_to_sections(blocks: List[Tuple[str, str, int]]) -> List[Dict]:
    """P19/O2 — fold a block stream into sections: a title (level<=3)
    starts a section, other blocks append (text_processor.py:364-390).
    Spark mapping: running ``sum(is_title)`` Window sessionization.
    """
    sections: List[Dict] = []
    current_title: Optional[str] = None
    content: List[str] = []
    for text, btype, level in blocks:
        if btype == "title" and level <= 3:
            if current_title:
                sections.append({"title": current_title,
                                 "content": "\n".join(content).strip()})
            current_title = text
            content = []
        else:
            content.append(text)
    if current_title:
        sections.append({"title": current_title,
                         "content": "\n".join(content).strip()})
    return sections


def process_chapter_text(chapter_text: str) -> Optional[Dict]:
    """Single-chapter structuring (text_processor.py:336-362)."""
    m = CHAPTER_PATTERN.match(chapter_text)
    if not m:
        return None
    g = m.groups()
    if g[0] is not None:
        number, title = g[0], g[1]
    else:
        number, title = g[2], clean_spaced_text_doc(g[3])
    if _CONTENT_LIST_HINT.search(chapter_text):
        sections = process_content_list(chapter_text)
    else:
        sections = blocks_to_sections(analyze_blocks(chapter_text))
    return {"number": int(number), "title": title.strip(), "sections": sections}


def process_appendix_text(appendix_text: str) -> Optional[Dict]:
    """Single-appendix structuring (text_processor.py:392-441)."""
    m = APPENDIX_PATTERN.match(appendix_text)
    if not m:
        return None
    letter, title = m.groups()
    sections = blocks_to_sections(analyze_blocks(appendix_text))
    if not sections:
        sections = [{"title": "Main Content", "content": appendix_text}]
    return {
        "letter": letter,
        "title": title.strip(),
        "content": appendix_text,
        "sections": sections,
    }


def process_document(text: str) -> Dict:
    """``TextProcessor.process`` equivalent (text_processor.py:59-102)."""
    text = clean_text(text)
    parts = split_major_parts(text)
    structured: Dict = {
        "metadata": {"title": "Player's Handbook", "type": "Core Rulebook"},
        "table_of_contents": extract_toc(parts.get("contents", "")),
        "chapters": [],
        "appendices": [],
    }
    if "main_content" in parts:
        for chapter_text in split_chapters(parts["main_content"]):
            ch = process_chapter_text(chapter_text)
            if ch:
                structured["chapters"].append(ch)
    if "appendices" in parts:
        for appendix_text in split_appendices(parts["appendices"]):
            ap = process_appendix_text(appendix_text)
            if ap:
                structured["appendices"].append(ap)
    return structured
