"""TextCleaner kernel tests — quirk Q4 (run-together splitting) and
the rest of the text_cleaner.py pass chain, each pinned by name.
"""

import pytest

from pdf_extractor_spark.kernels.textcleaner import (
    RUN_TOGETHER_ORDER,
    clean_chapter,
    clean_paragraph,
    clean_text,
    fix_common_dnd_terms,
    fix_common_spacing_issues,
    fix_run_together_words,
    fix_spaced_words,
)


class TestQ4RunTogetherWords:
    """Quirk Q4 (text_cleaner.py:130-143): embedded common words split
    aggressively, longest-first."""

    def test_standstill_splits_on_and(self):
        assert fix_run_together_words("standstill") == "st and still"

    def test_notable_splits_on_not(self):
        # the SURVEY's "notable"-class error: 'not' is a common word
        assert fix_run_together_words("notable") == "not able"

    def test_longest_first_then_shorter_resplit(self):
        # 'their' (5) applies first ("x their y"), then 'the' (3)
        # re-splits the result — the reference's sequential rewrite
        # chain does exactly this
        assert fix_run_together_words("xtheiry") == "x the ir y"

    def test_short_words_skipped(self):
        # 'to'/'go'/'of' are len<3 → never split
        assert fix_run_together_words("togo") == "togo"

    def test_clean_text_untouched_without_embedded_words(self):
        assert fix_run_together_words("plain words here") == \
            "plain words here"

    def test_order_is_deterministic(self):
        # equal-length ties alphabetical (the Q7-style determinism fix
        # for the reference's set-iteration tie order)
        lens = [len(w) for w in RUN_TOGETHER_ORDER]
        assert lens == sorted(lens, reverse=True)
        for a, b in zip(RUN_TOGETHER_ORDER, RUN_TOGETHER_ORDER[1:]):
            if len(a) == len(b):
                assert a < b


class TestSpacedWords:
    def test_dungeons(self):
        assert fix_spaced_words("D u n g e o n s") == "Dungeons"

    def test_spaced_inside_sentence(self):
        assert fix_spaced_words("the R a c e s chapter") == \
            "the Races chapter"

    def test_two_letter_words_untouched(self):
        # no single-letter run exists in normal short-word text
        assert fix_spaced_words("go to it") == "go to it"


class TestDndTerms:
    def test_d_and_d(self):
        assert fix_common_dnd_terms("play D & D today") == "play D&D today"

    def test_dungeons_and_dragons_partial(self):
        assert fix_common_dnd_terms("Dun geons & Dra gons") == \
            "Dungeons & Dragons"


class TestSpacingIssues:
    def test_of_prefix_split(self):
        # text_cleaner.py:169 — aggressive: 'often' → 'of ten'
        assert fix_common_spacing_issues("often") == "of ten"

    def test_you_r(self):
        assert fix_common_spacing_issues("you r sword") == "your sword"

    def test_doyou(self):
        assert fix_common_spacing_issues("Doyou agree") == "Do you agree"


class TestCleanParagraph:
    def test_short_text_untouched(self):
        assert clean_paragraph("abc") == "abc"

    def test_basic_level_skips_q4(self):
        assert clean_paragraph("standstill", "basic") == "standstill"

    def test_light_level_runs_q4(self):
        assert clean_paragraph("heroes standstill.") == "heroes st and still."

    def test_clean_text_preserves_line_structure(self):
        out = clean_text("standstill\nplain line here")
        assert out.split("\n")[0] == "st and still"
        assert len(out.split("\n")) == 2


class TestCleanChapter:
    def test_maps_over_content(self):
        ch = {"number": 1, "title": "T",
              "content": {"main_content": ["heroes standstill."],
                          "subchapters": [{"title": "s",
                                           "lines": ["notable things."]}]}}
        out = clean_chapter(ch)
        assert out["content"]["main_content"] == ["heroes st and still."]
        assert out["content"]["subchapters"][0]["lines"] == \
            ["not able things."]
        # original untouched
        assert ch["content"]["main_content"] == ["heroes standstill."]

    def test_no_content_passthrough(self):
        assert clean_chapter({"number": 1}) == {"number": 1}
