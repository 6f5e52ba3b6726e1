"""Lightweight text validation (operators J1, J3, J4, A4, A5, O5).

Reproduces the live validator /root/reference/src/nlp/text_validator.py
(the one imported by chapter_processor — NOT the dead
src/validation/text_validator.py:159-243 ``validate_chapter``, quirk Q6).

Determinism deltas, both documented in SURVEY.md:
- the 0.5s wall-clock budget (:33,:86-89) is dropped; the count cap of 10
  unknown words (:85) reproduces observed behavior at fixture sizes and
  is deterministic (§4 "time-budget cutoff").
- suggestion scans iterate the dictionary in sorted order (quirk Q7 fix).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Dict, List, Optional

from .wordcorr import (
    BASE_COMMON_WORDS,
    DOMAIN_TERMS,
    SORTED_COMMON_WORDS,
    correct_text,
)

MIN_WORD_LENGTH = 3
MAX_UNKNOWN_CHECKED = 10  # text_validator.py:85

_NON_WORD = re.compile(r"[^\w\s]")

# Prefix-2 index over the sorted common words (same pruning as
# wordcorr._PREFIX_BUCKETS; bucket order inherits the Q7 sorted order).
_COMMON_PREFIX: Dict[str, tuple] = {}
for _w in SORTED_COMMON_WORDS:
    _COMMON_PREFIX.setdefault(_w[:2], [])  # type: ignore[arg-type]
    _COMMON_PREFIX[_w[:2]].append(_w)      # type: ignore[attr-defined]
_COMMON_PREFIX = {k: tuple(v) for k, v in _COMMON_PREFIX.items()}


def simple_tokenize(text: str) -> List[str]:
    """Lowercase, strip punctuation, whitespace split (text_validator.py:35-41)."""
    text = _NON_WORD.sub(" ", text.lower())
    return [w for w in text.split() if w]


@lru_cache(maxsize=65536)
def simple_suggestion(word: str) -> Optional[str]:
    """First common word sharing a 2-char prefix with |len diff|<=2
    (J4, text_validator.py:112-124) — sorted scan for determinism (Q7).
    Memoized pure function; prefix-2 bucket skips the full dictionary.
    """
    if len(word) <= 3:
        return None
    for cand in _COMMON_PREFIX.get(word[:2], ()):
        if abs(len(cand) - len(word)) <= 2:
            return cand
    return None


def validate_text(text: str) -> Dict:
    """Per-line validation (text_validator.py:43-110).

    Correction pass → tokenize → unknown-word anti-join (J3) → capped
    suggestion lookups; returns the reference's result envelope.
    """
    if not text or len(text) < 10:
        return {"text": text, "issues": [], "valid": True}

    corrected = correct_text(text)
    was_corrected = corrected != text

    words = [w for w in simple_tokenize(corrected) if len(w) >= MIN_WORD_LENGTH]
    if len(words) < 3:
        return {"text": corrected, "issues": [], "valid": True}

    unknown = [w for w in words
               if w not in BASE_COMMON_WORDS and w not in DOMAIN_TERMS]

    issues = []
    for w in unknown[:MAX_UNKNOWN_CHECKED]:
        sug = simple_suggestion(w)
        if sug:
            issues.append({"word": w, "suggestion": sug, "confidence": 0.7})

    return {
        "text": corrected,
        "original_text": text if was_corrected else None,
        "issues": issues,
        "valid": len(issues) == 0,
        "metrics": {
            "total_words": len(words),
            "unknown_words": len(unknown),
            "was_corrected": was_corrected,
        },
    }


def validate_chapter(chapter: Dict) -> Dict:
    """Chapter validation with systematic sampling (O5,
    text_validator.py:126-225): at most 50 main-content lines at indices
    ``i*len//50``; first/last/middle line per subchapter.
    """
    results: Dict = {
        "chapter_number": chapter.get("number", 0),
        "chapter_title": chapter.get("title", "untitled"),
        "main_content": [],
        "subchapters": [],
        "tables": [],
    }
    if "content" not in chapter:
        return results

    main_content = chapter.get("content", {}).get("main_content", [])
    subchapters = chapter.get("content", {}).get("subchapters", [])

    if main_content:
        sample_size = min(50, len(main_content))
        idxs = [i * len(main_content) // sample_size for i in range(sample_size)]
        for i in idxs:
            if i < len(main_content):
                v = validate_text(main_content[i])
                if not v["valid"]:
                    results["main_content"].append(v)

    for sub in subchapters:
        lines = sub.get("lines") or []
        if not lines:
            continue
        sample = [lines[0]]
        if len(lines) > 1:
            sample.append(lines[-1])
        if len(lines) > 10:
            sample.append(lines[len(lines) // 2])
        sub_issues = []
        for ln in sample:
            v = validate_text(ln)
            if not v["valid"]:
                sub_issues.append(v)
        if sub_issues:
            results["subchapters"].append(
                {"title": sub.get("title", "Untitled"), "issues": sub_issues}
            )
    return results
