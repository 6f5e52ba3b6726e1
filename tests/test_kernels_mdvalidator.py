"""Unit tests for the markdown-validator kernel (P21/O4/A6, quirk Q5).

Pins the reference semantics of markdown_validator.py: section split
edge cases, family ordering (word → phrase → spacing → joined_words),
pattern-list order within a family, the per-section error cap, raw
replacement templates as suggestions, and the grouped report format.
"""

from pdf_extractor_spark.kernels.mdvalidator import (
    MAX_ERRORS_PER_SECTION,
    extract_sections,
    format_errors,
    get_position,
    validate_markdown,
)


class TestExtractSections:
    def test_no_code_blocks_single_section(self):
        secs = extract_sections(["alpha", "beta"])
        assert len(secs) == 1
        assert secs[0]["text"] == ["alpha", "beta"]
        assert secs[0]["start_line"] == 0 and secs[0]["type"] == "text"

    def test_code_block_dropped_by_default(self):
        lines = ["before", "```", "code here", "```", "after"]
        secs = extract_sections(lines)
        assert [s["text"] for s in secs] == [["before"], ["after"]]
        assert secs[1]["start_line"] == 4

    def test_code_block_kept_when_not_ignoring(self):
        lines = ["before", "```", "code here", "```", "after"]
        secs = extract_sections(lines, ignore_code_blocks=False)
        assert [s["type"] for s in secs] == ["text", "code", "text"]
        assert secs[1]["text"] == ["```", "code here", "```"]

    def test_leading_fence_appends_empty_text_section(self):
        # quirk: on code START the current text section is appended even
        # when empty (:438-439); it survives the type filter as a
        # zero-line text section
        secs = extract_sections(["```", "x", "```", "tail"])
        assert [s["text"] for s in secs] == [[], ["tail"]]

    def test_unclosed_code_block_final_section_dropped_if_empty(self):
        # final section appended only when text is non-empty (:449-451)
        secs = extract_sections(["head", "```"],
                                ignore_code_blocks=False)
        assert [s["type"] for s in secs] == ["text", "code"]
        assert secs[1]["text"] == ["```"]


class TestGetPosition:
    def test_first_line(self):
        assert get_position("hello world", 6, 0) == (0, 6)

    def test_multiline_with_offset(self):
        assert get_position("ab\ncd\nef", 6, 10) == (12, 0)


class TestQ5OrderingAndCap:
    def test_family_order_word_phrase_spacing_join(self):
        # one error of each family in one section; input order scrambled
        content = "peoplle word\nwhat ever phrase\nt he spacing\nyoucan join"
        errs = validate_markdown(content)
        fams = [e["error_type"] for e in errs]
        # word first (teh→the), then phrase, then spacing, then joins
        assert fams.index("word") < fams.index("phrase")
        assert fams.index("phrase") < fams.index("spacing")
        assert fams.index("spacing") < fams.index("joined_words")

    def test_pattern_list_order_within_family(self):
        # 't he' (pattern idx 7, conf .95) must precede the general
        # 2-letter split (last pattern, conf .85) even when the general
        # match occurs EARLIER in the text — Q5: pattern order wins
        content = "aa bbb comes first\nthen t he end"
        errs = [e for e in validate_markdown(content)
                if e["error_type"] == "spacing"]
        assert errs[0]["text"] == "t he"
        assert errs[0]["confidence"] == 0.95
        general = [e for e in errs if e["confidence"] == 0.85]
        assert general and general[0]["suggestion"] == "\\1\\2"  # raw template

    def test_cap_truncates_after_ordering(self):
        # >10 general split matches + one 't he' → the cap keeps 't he'
        # (earlier pattern) and drops the general-tail, not vice versa
        noisy = " ".join(f"ab cd{i}" for i in range(15))
        content = noisy + " t he"
        errs = validate_markdown(content, enable_word_validation=False,
                                 enable_phrase_validation=False)
        assert len(errs) == MAX_ERRORS_PER_SECTION
        assert errs[0]["text"] == "t he"

    def test_cap_is_per_section(self):
        sec = " ".join(f"ab cd{i}" for i in range(15))
        content = sec + "\n```\nx\n```\n" + sec
        errs = validate_markdown(content, enable_word_validation=False,
                                 enable_phrase_validation=False)
        assert len(errs) == 2 * MAX_ERRORS_PER_SECTION

    def test_code_block_content_not_validated(self):
        content = "clean line\n```\nt he youcan what ever\n```\nclean"
        assert validate_markdown(content,
                                 enable_word_validation=False) == []


class TestWordFamily:
    def test_word_error_positions_are_one_based(self):
        errs = [e for e in validate_markdown("xx peoplle yy")
                if e["error_type"] == "word"]
        assert errs and errs[0]["text"] == "peoplle"
        assert errs[0]["line_num"] == 1 and errs[0]["column"] == 4
        assert errs[0]["suggestion"] == "people"
        assert errs[0]["context"] == "xx peoplle yy"

    def test_dictionary_words_pass(self):
        clean = "the people would know about time and work"
        assert [e for e in validate_markdown(clean)
                if e["error_type"] == "word"] == []

    def test_line_num_counts_section_offset(self):
        content = "```\nx\n```\npeoplle here"
        errs = [e for e in validate_markdown(content)
                if e["error_type"] == "word"]
        assert errs and errs[0]["line_num"] == 4


class TestFormatErrors:
    def test_empty(self):
        assert format_errors([]) == "No errors found!"

    def test_grouped_counts_and_highlight(self):
        rep = format_errors(validate_markdown("xx peoplle yy\nt he zz"))
        assert rep.startswith("Found ")
        assert "word issues" in rep and "spacing issues" in rep
        assert ">>>peoplle<<<" in rep
        assert "[WORD] Line 1, Col 4: 'peoplle' → 'people'" in rep
