"""Unit tests for the chapter fold (O1) and its pinned quirks Q1-Q3, Q12."""

import pytest

from pdf_extractor_spark.kernels import chapters as kch
from pdf_extractor_spark.kernels import tables as ktab


class TestChapterPredicates:
    def test_is_chapter_title(self):
        assert kch.is_chapter_title("Chapter 3: Equipment")
        assert kch.is_chapter_title("Races")
        assert kch.is_chapter_title("7")

    def test_toc_lines_rejected(self):
        assert not kch.is_chapter_title("Chapter 3: Equipment ....... 12")
        assert not kch.is_chapter_title("Chapter 3: Equipment 12")

    def test_extract_info_standard(self):
        info = kch.extract_chapter_info("Chapter 4: Personality and Background")
        assert (info["number"], info["title"]) == (4, "Personality and Background")

    def test_extract_info_personalityand_fix(self):
        info = kch.extract_chapter_info("Chapter 4: Personalityand Background")
        assert info["title"] == "Personality and Background"

    def test_extract_info_step_by_step(self):
        info = kch.extract_chapter_info("Step by Step Characters")
        assert (info["number"], info["title"]) == (1, "Step-by-Step Characters")

    def test_extract_info_bare_number(self):
        info = kch.extract_chapter_info("5")
        assert (info["number"], info["title"]) == (5, "Chapter 5")

    def test_extract_info_fallback(self):
        info = kch.extract_chapter_info("Some Random Heading")
        assert (info["number"], info["title"]) == (0, "Some Random Heading")


class TestSubchapter:
    def test_detect_spaced_subchapter(self):
        sub = kch.detect_subchapter("H i l l D w a r f")
        assert sub and sub["title"] == "Hill Dwarf"

    def test_too_long_rejected(self):
        line = " ".join(list("A" + "b" * 60))
        assert kch.detect_subchapter(line) is None

    def test_non_spaced_rejected(self):
        assert kch.detect_subchapter("Hill Dwarf") is None


class TestCleanContentLineQ3:
    def test_q3_alternating_lowercase_gap_delete(self):
        # Non-overlapping matches delete alternating boundaries:
        # "the cat sat" → "thecat sat" → wait: matches at (e,c) and (t,s)
        assert kch.clean_content_line("the cat sat") == "thecatsat"

    def test_spaced_segment_collapse_threshold(self):
        out = kch.clean_content_line("see D u n g e o n s now")
        assert "Dungeons" in out

    def test_dnd_fix(self):
        assert "D&D" in kch.clean_content_line("D & D")


class TestSegmentChapters:
    LINES = [
        "Welcome to the book.",
        "C h a p t e r 1 : R a c e s",
        "Everything here is about races.",
        "H i l l D w a r f",
        "Dwarves are stout.",
        "They live long.",
        "C h a p t e r 2 : Classes",
        "Classes matter greatly.",
    ]

    def test_front_matter_and_chapters(self):
        res = kch.segment_chapters(self.LINES, with_validation=False)
        chs = res["chapters"]
        assert [c["number"] for c in chs] == [0, 1, 2]
        assert chs[0]["title"] == "Front Matter"
        assert chs[1]["title"] == "Races"
        # Reference behavior: opening the FIRST subchapter does not flush
        # the buffer to main_content — buffered pre-subchapter lines ride
        # into the subchapter (chapter_processor.py:124-133 keeps
        # current_content when no previous subchapter exists).
        assert chs[1]["content"]["main_content"] == []
        sub = chs[1]["content"]["subchapters"][0]
        assert sub["title"] == "Hill Dwarf"
        assert sub["lines"] == ["Everything here is about races.",
                                "Dwarves are stout.", "They live long."]

    def test_q2_mid_doc_flush_is_raw(self):
        lines = ["C h a p t e r 1 : R a c e s", "m ore text here",
                 "C h a p t e r 2 : Classes", "end content"]
        res = kch.segment_chapters(lines, with_validation=False)
        # Mid-doc close: NO _process_content cleanup (raw buffer kept).
        assert res["chapters"][1]["content"]["main_content"] == ["m ore text here"]

    def test_q1_final_buffer_overwritten_with_raw(self):
        lines = ["C h a p t e r 1 : R a c e s", "the cat sat"]
        res = kch.segment_chapters(lines, with_validation=False)
        final = res["chapters"][-1]["content"]["main_content"]
        # Q1: cleaned lines ("thecatsat") are appended then OVERWRITTEN
        # by the raw buffer.
        assert final == ["the cat sat"]

    def test_q1_trailing_table_still_appended(self):
        # A detected trailing table survives the Q1 overwrite.
        table_lines = (["Barbarian", "d12", "Strength"] * 3)[:9]
        lines = ["C h a p t e r 1 : R a c e s"] + table_lines
        assert ktab.detect_table(table_lines)
        res = kch.segment_chapters(lines, with_validation=False)
        final = res["chapters"][-1]["content"]
        assert final["tables"] and final["tables"][0]["type"] == "table"
        assert final["main_content"] == table_lines  # Q1 raw overwrite

    def test_q12_strict_mode_raises_like_reference(self):
        table_lines = (["Barbarian", "d12", "Strength"] * 3)[:9]
        lines = ["C h a p t e r 1 : R a c e s"] + table_lines
        with pytest.raises(TypeError):
            kch.segment_chapters(lines, parse_tables=False,
                                 with_validation=False)

    def test_stats(self):
        res = kch.segment_chapters(self.LINES, with_validation=False)
        assert res["stats"]["total_chapters"] == 3


class TestTables:
    LEVEL_ROWS = ["1st", "+2", "Rage, Unarmored Defense",
                  "2nd", "+2", "Reckless Attack",
                  "3rd", "+2", "Primal Path"]

    def test_detect_table_true(self):
        assert ktab.detect_table(self.LEVEL_ROWS)

    def test_detect_table_below_min_rows(self):
        assert not ktab.detect_table(self.LEVEL_ROWS[:4])

    def test_identify_type(self):
        assert ktab.identify_table_type(self.LEVEL_ROWS) == "level_progression"

    def test_parse_level_table(self):
        t = ktab.parse_table(self.LEVEL_ROWS)
        assert t["type"] == "table"
        assert t["rows"][0][:2] == ["1st", "+2"]

    def test_parse_class_table(self):
        lines = ["Barbarian", "A fierce warrior", "d12", "Strength",
                 "Bard", "An inspiring magician", "d8", "Charisma",
                 "Cleric", "A priestly champion", "d8", "Wisdom"]
        t = ktab.parse_table(lines)
        assert t["table_type"] == "class_table"
        assert t["rows"][0][0] == "Barbarian"
