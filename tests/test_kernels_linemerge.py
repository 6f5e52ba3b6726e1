"""P10/P11 kernel tests — the reference's dead-code operators
implemented as documented intent (same policy as Q12), with the
reference's own quirks pinned by name."""

from pdf_extractor_spark.kernels.linemerge import (
    collect_vertical_text,
    merge_lines,
    should_merge_with_previous,
)


class TestMergePredicate:
    def test_lowercase_start_merges(self):
        assert should_merge_with_previous("continues here", "Something")

    def test_conjunction_start_merges_case_insensitive(self):
        assert should_merge_with_previous("And so on.", "It ended.")

    def test_dangling_conjunction_merges(self):
        assert should_merge_with_previous("Next part.", "It was the")

    def test_unterminated_prev_plus_non_capital(self):
        assert should_merge_with_previous("more words", "no punctuation")

    def test_ignorecase_quirk_any_letter_start_merges(self):
        # reference quirk (:348): IGNORECASE applies to ALL patterns,
        # so the "starts with lowercase" check ^[a-z] matches ANY
        # letter — even a fresh capitalized sentence merges. This
        # over-aggression is why _merge_lines stayed dead code.
        assert should_merge_with_previous("New sentence.", "Done.")

    def test_non_letter_start_after_terminal_does_not_merge(self):
        assert not should_merge_with_previous("123 numbers", "Done.")

    def test_empty_inputs(self):
        assert not should_merge_with_previous("", "x")
        assert not should_merge_with_previous("x", "")


class TestMergeLinesP10:
    def test_simple_merge(self):
        assert merge_lines(["The quick brown", "fox jumps."]) == \
            ["The quick brown fox jumps."]

    def test_dehyphenation_on_merge(self):
        assert merge_lines(["a wonder-", "ful example."]) == \
            ["a wonderful example."]

    def test_leading_punctuation_merges_without_space(self):
        assert merge_lines(["It was good", ", she said."]) == \
            ["It was good, she said."]

    def test_fixpoint_across_passes(self):
        # three fragments need two passes: pairwise per pass
        out = merge_lines(["one two", "three four", "five six."])
        assert out == ["one two three four five six."]

    def test_no_merge_returns_input(self):
        lines = ["Done.", "123 next"]
        assert merge_lines(lines) == lines

    def test_iteration_cap_returns_original(self):
        # reference quirk (:414-417): hitting the cap returns the
        # ORIGINAL lines, discarding partial merges
        lines = [f"frag {i}" for i in range(5000)]
        assert merge_lines(lines, max_iterations=2) == lines

    def test_empty(self):
        assert merge_lines([]) == []


class TestVerticalTextP11:
    def test_collects_single_letter_run(self):
        text, n = collect_vertical_text(["R", "a", "c", "e", "s"], 0)
        assert (text, n) == ("Races", 5)

    def test_lookahead_capped_at_five(self):
        text, n = collect_vertical_text(list("Dungeons"), 0)
        assert (text, n) == ("Dunge", 5)

    def test_multi_letter_line_consumed(self):
        text, n = collect_vertical_text(["a c", "e"], 0)
        assert (text, n) == ("ace", 2)

    def test_stops_at_word_after_collecting(self):
        text, n = collect_vertical_text(["a", "b", "word here"], 0)
        assert (text, n) == ("ab", 2)

    def test_no_letters_returns_empty(self):
        assert collect_vertical_text(["word here"], 0) == ("", 0)

    def test_blank_line_consumed_vacuously(self):
        # reference quirk (:433-436): all() over an empty split is
        # True, so a blank line inside the run is consumed silently
        text, n = collect_vertical_text(["a", "", "b"], 0)
        assert (text, n) == ("ab", 3)

    def test_out_of_range(self):
        assert collect_vertical_text(["a"], 5) == ("", 0)
