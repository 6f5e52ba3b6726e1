"""NLP text cleaner (quirk Q4 + the TextCleaner pass chain).

Reproduces /root/reference/src/nlp/text_cleaner.py — constructed by the
markdown converter (markdown_converter.py:36-38) behind the
``text_cleaning`` config. The chain (``clean_paragraph`` :67-93):

  _fix_spaced_words (:95-116) → _fix_common_dnd_terms (:118-128) →
  _fix_run_together_words (:130-143, quirk Q4) →
  _fix_common_spacing_issues (:145-174)

with the last two only at cleaning levels ``light``/``advanced``
(:85-87). ``clean_chapter`` (:191-220) maps the paragraph cleaner over
chapter main content and subchapter lines.

Q4 reproduced aggressively and on purpose: ``_fix_run_together_words``
inserts a space around EVERY embedded common word
("standstill" → "st and still", "together" → "to get her" style), with
words applied longest-first (:133). Determinism fix (same policy as
quirk Q7): the reference's ``sorted(set, key=len, reverse=True)`` is
stable on Python's hash-seed-dependent set order for equal-length
words, so this kernel ties deterministically by ``(-len, word)`` and
the goldens are generated with that fixed order.

Note: the cleaner has its OWN word sets (:35-56) — deliberately not
shared with kernels.wordcorr (word_correction.py:105-117 differs).
"""

from __future__ import annotations

import re
from typing import Dict, List, Set

# text_cleaner.py:35-46 — the cleaner's common-word set.
COMMON_WORDS: Set[str] = {
    "the", "and", "of", "to", "a", "in", "for", "is", "on", "that", "by",
    "this", "with", "you", "it", "not", "or", "be", "are", "from", "at",
    "as", "your", "have", "more", "an", "was", "we", "will", "can", "do",
    "use", "one", "they", "all", "their", "has", "been", "would", "make",
    "about", "if", "into", "time", "only", "how", "may", "its", "some",
    "what", "when", "out", "up", "no", "who", "see", "get", "which", "go",
    "than", "our", "know", "just", "any", "take", "give", "over", "think",
    "also", "back", "after", "other", "two", "these", "first", "way",
    "well", "even", "new", "want", "because", "most", "each", "look",
    "day", "could", "come", "both", "between", "must",
}

# text_cleaner.py:49-56 — the cleaner's domain-term set.
DND_TERMS: Set[str] = {
    "dungeons", "dragons", "character", "adventurer", "roleplaying",
    "fighter", "wizard", "cleric", "rogue", "barbarian", "druid",
    "halfling", "dwarf", "elf", "game", "dungeon", "spellcaster",
    "paladin", "bard", "sorcerer", "warlock", "ranger", "monk", "human",
    "gnome", "tiefling", "orc", "race", "class", "abilities", "skills",
    "combat", "spell", "magic", "weapon", "armor", "shield", "potion",
    "alignment", "creature", "monster",
}

# Q4 application order: longest-first (:133); equal lengths tie
# alphabetically (deterministic replacement for set-iteration order).
RUN_TOGETHER_ORDER: List[str] = sorted(
    COMMON_WORDS, key=lambda w: (-len(w), w))

_SPACED_WORD = re.compile(
    r"\b([A-Za-z])\s+([A-Za-z])\s+([A-Za-z])(?:\s+[A-Za-z])*\b")
_WS = re.compile(r"\s+")


def fix_spaced_words(text: str) -> str:
    """'D u n g e o n s' → 'Dungeons' (:95-116): matches collected
    first, replaced in reverse span order to keep indices stable."""
    matches = list(_SPACED_WORD.finditer(text))
    for match in reversed(matches):
        spaced = match.group(0)
        if len(spaced) >= 5 and all(c.isalpha() or c.isspace()
                                    for c in spaced):
            normalized = _WS.sub("", spaced)
            start, end = match.span()
            text = text[:start] + normalized + text[end:]
    return text


def fix_common_dnd_terms(text: str) -> str:
    """Domain-term respacing (:118-128)."""
    text = re.sub(r"D\s*&\s*D", "D&D", text)
    dungeons = r"Dun\s*g?e?o?n?s?\s*&\s*Dra\s*g?o?n?s?"
    if re.search(dungeons, text, re.IGNORECASE):
        text = re.sub(dungeons, "Dungeons & Dragons", text,
                      flags=re.IGNORECASE)
    return text


def fix_run_together_words(text: str) -> str:
    """Quirk Q4 (:130-143): for each common word (len >= 3),
    longest-first, insert a space before the word when preceded by a
    letter, then after it when followed by a letter. Both rewrites
    apply to every occurrence, so embedded words split aggressively —
    that IS the reference behavior the goldens pin."""
    for word in RUN_TOGETHER_ORDER:
        if len(word) >= 3:
            text = re.sub(r"(?<=[a-zA-Z])(" + re.escape(word) + r")",
                          f" {word}", text)
            text = re.sub(r"(" + re.escape(word) + r")(?=[a-zA-Z])",
                          f"{word} ", text)
    return text


def fix_common_spacing_issues(text: str) -> str:
    """Hardcoded spacing fixes (:145-174) — including the aggressive
    ``\\bof(\\w+)`` split (:169) that turns 'often' into 'of ten'."""
    text = re.sub(r"\byou\s+r\b", "your", text)
    text = re.sub(r"\bm\s+ore\b", "more", text)
    text = re.sub(r"\bDoyou\b", "Do you", text)
    text = re.sub(r"\bthe\s+se\b", "these", text)
    text = re.sub(r"\bwhat\s+ever\b", "whatever", text)
    text = re.sub(r"\bit\'s\s*a(\w+)", r"it's a \1", text)
    text = re.sub(r"\bsom\s+e\b", "some", text)
    text = re.sub(r"\bof(\w+)", r"of \1", text)
    text = re.sub(r"\s{2,}", " ", text)
    return text


def clean_paragraph(text: str, cleaning_level: str = "light") -> str:
    """The pass chain (:67-93); texts shorter than 5 chars untouched."""
    if not text or len(text) < 5:
        return text
    cleaned = fix_spaced_words(text)
    cleaned = fix_common_dnd_terms(cleaned)
    if cleaning_level in ("light", "advanced"):
        cleaned = fix_run_together_words(cleaned)
        cleaned = fix_common_spacing_issues(cleaned)
    return cleaned


def clean_chapter(chapter: Dict, cleaning_level: str = "light") -> Dict:
    """Map the paragraph cleaner over a chapter dict (:191-220):
    content.main_content lines and each subchapter's lines."""
    if "content" not in chapter:
        return chapter
    cleaned = dict(chapter)
    cleaned["content"] = dict(chapter["content"])
    if "main_content" in cleaned["content"]:
        cleaned["content"]["main_content"] = [
            clean_paragraph(line, cleaning_level)
            for line in cleaned["content"]["main_content"]]
    if "subchapters" in cleaned["content"]:
        subs = []
        for sub in cleaned["content"]["subchapters"]:
            s = dict(sub)
            if "lines" in s:
                s["lines"] = [clean_paragraph(line, cleaning_level)
                              for line in s["lines"]]
            subs.append(s)
        cleaned["content"]["subchapters"] = subs
    return cleaned


def clean_text(text: str, cleaning_level: str = "light") -> str:
    """Document-level convenience: the paragraph chain per line,
    newline structure preserved — what the pipeline's optional
    ``cleaned_text`` output column carries."""
    if not text:
        return text
    return "\n".join(clean_paragraph(line, cleaning_level)
                     for line in text.split("\n"))
