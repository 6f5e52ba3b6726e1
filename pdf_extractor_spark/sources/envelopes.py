"""Deterministic converter-stress envelopes (golden family 4).

Hand-authored output envelopes exercising the markdown converter's
corner cases (markdown_converter.py):

- title normalization (:465-509): spaced-out letters (pair-merge
  quirk), trailing dotted page numbers, CamelCase run-together
  ("Personalityand"), hyphen runs, ``D & D``;
- paragraph merge (:250-304): clause-end continuation, lowercase
  starts, conjunction starts, blank-line paragraph breaks, sentence
  ends;
- per-line cleanup (:306-371): spaced words, short-prefix gap fixes,
  run-together splits after common words;
- structure: sections vs chapter-fold content formats, tables,
  appendices (dict and sections forms), TOC from both shapes.

Pure data — no randomness; the golden generator freezes
``convert_to_markdown`` over these byte-for-byte.
"""

from __future__ import annotations

from typing import Dict, List

from ..kernels.envelope import make_envelope


def _ch(number, title, **content) -> Dict:
    return {"number": number, "title": title, "content": content}


def build_converter_envelopes() -> List[Dict]:
    """Envelope list; each carries a stable ``name`` used as the golden
    key."""
    cases = []

    cases.append(("titles", {
        "metadata": {"title": "Titles", "type": "book"},
        "table_of_contents": [],
        "chapters": [
            _ch(1, "C l a s s e s", main_content=["Plain sentence one."]),
            _ch(2, "Introduction.......12",
                main_content=["Body after dotted title."]),
            _ch(3, "Personalityand Background",
                main_content=["Camel runs split."]),
            _ch(4, "Using--  -This\t Book", main_content=["Hyphen runs."]),
            _ch(5, "D & D Basics", main_content=["Ampersand term."]),
        ],
        "appendices": [],
    }))

    cases.append(("paragraphs", {
        "metadata": {"title": "Paragraphs", "type": "book"},
        "table_of_contents": [],
        "chapters": [
            _ch(1, "Merging", main_content=[
                "This sentence continues,",
                "because the previous line ended with a comma.",
                "A complete sentence ends here.",
                "and this conjunction start still merges in.",
                "New paragraph starts after the sentence above ended.",
                "",
                "Blank line forced this paragraph break.",
                "lowercase start merges into the previous line.",
            ]),
        ],
        "appendices": [],
    }))

    cases.append(("cleanup", {
        "metadata": {"title": "Cleanup", "type": "book"},
        "table_of_contents": [],
        "chapters": [
            _ch(1, "Cleanup", main_content=[
                "The D u n g e o n s crawl begins.",
                "There is m ore treasure and s ome gold.",
                "Rules from D & D apply here.",
                "Read thebook carefully andcontinue onward.",
            ]),
        ],
        "appendices": [],
    }))

    cases.append(("structure", {
        "metadata": {"title": "Structure", "type": "book"},
        "table_of_contents": [
            {"type": "chapter", "number": 1, "title": "First",
             "sections": [{"title": "Alpha"}, {"title": "Main Content"}]},
            {"type": "appendix", "letter": "A", "title": "Notes",
             "sections": []},
        ],
        "chapters": [
            {"number": 1, "title": "First", "sections": [
                {"title": "Main Content",
                 "content": "Intro line one.\nIntro line two."},
                {"title": "Alpha", "content": "Alpha body text."},
            ]},
            _ch(2, "Second",
                main_content=["Fold-format body."],
                tables=[{"table_type": "ability_scores",
                         "columns": ["Score", "Modifier"],
                         "rows": [["10", "+0"], ["12", "+1"]]}],
                subchapters=[{"title": "H i l l D w a r f",
                              "lines": ["Sub body line one.",
                                        "continues in lowercase."]}]),
        ],
        "appendices": [
            {"letter": "A", "title": "Notes", "sections": [
                {"title": "Main Content", "content": "Appendix body."}]},
            {"letter": "B", "title": "Conditions",
             "content": "Raw appendix string content."},
        ],
    }))

    cases.append(("string-content", "Just a raw string content doc.\n"))

    return [
        {"name": name,
         "envelope": make_envelope(f"{name}_sample-doc.pdf", "processed",
                                   content,
                                   extraction_date="2025-01-01 00:00:00")}
        for name, content in cases
    ]
