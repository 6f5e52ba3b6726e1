"""Advanced-validator kernel tests: split/joined-word detection with
the false-positive skip rules, P22 chapter split, and the O6
reverse-ordered auto-fix with optimistic verify."""

from pdf_extractor_spark.kernels.advvalidator import (
    MAX_ERRORS_PER_SECTION,
    apply_fixes,
    check_joined_words,
    check_split_words,
    collect_fixes,
    fix_errors,
    format_fix_report,
    split_into_chapters,
    validate_text,
)


def _split(text, min_confidence=0.7):
    return check_split_words(text, 0, text.split("\n"), min_confidence)


class TestSplitWords:
    def test_specific_pattern(self):
        errs = _split("a broken w eapon here")
        assert any(e["text"] == "w eapon" and e["suggestion"] == "weapon"
                   and e["confidence"] == 0.95 for e in errs)

    def test_general_pattern_expands_groups(self):
        # leftmost non-overlapping scan: the FIRST two-word pair wins
        # ("the qu", not "qu ick") — the general pattern flags nearly
        # every word pair, exactly as noisy as the reference
        errs = _split("the qu ick fix")
        gen = [e for e in errs if e["confidence"] == 0.85]
        assert gen and gen[0]["text"] == "the qu"
        assert gen[0]["suggestion"] == "thequ"  # lambda joins groups

    def test_ignore_patterns_skip_known_phrases(self):
        assert not [e for e in _split("it depends on context")
                    if e["text"] == "depends on"]
        # leftmost candidate "hit points" hits the ignore list
        assert not _split("hit points now")

    def test_proper_name_skipped(self):
        assert not [e for e in _split("ask Lorem Ipsum about it")
                    if e["text"] == "Lorem Ipsum"]

    def test_preposition_tail_skipped(self):
        assert not [e for e in _split("they walked to town")
                    if e["text"] == "walked to"]

    def test_sentence_boundary_skipped(self):
        errs = _split("sentence ends. Next starts")
        assert not [e for e in errs if e["text"] == "ends. Next"]

    def test_numbers_skipped(self):
        assert not [e for e in _split("released 2025 03 edition")
                    if "2025" in e["text"]]

    def test_short_text_skipped(self):
        assert _split("hi") == []


class TestJoinedWords:
    def test_joined_pattern(self):
        errs = check_joined_words("now youcan act", 0, ["now youcan act"])
        assert errs and errs[0]["text"] == "youcan"
        assert errs[0]["suggestion"] == "you can"
        assert errs[0]["error_type"] == "joined_word"

    def test_template_suggestion_stays_raw(self):
        errs = check_joined_words("well that'sgreat stuff", 0, [""])
        assert errs and errs[0]["suggestion"] == "that's \\1"


class TestValidateText:
    def test_cap_is_twenty_per_section(self):
        noisy = " ".join(
            f"qu ick{chr(97 + i)}{chr(97 + i)}" for i in range(30))
        errs = validate_text(noisy)
        assert len(errs) == MAX_ERRORS_PER_SECTION

    def test_code_blocks_skipped(self):
        content = "one\n```\nw eapon youcan\n```\ntwo"
        assert validate_text(content) == []


class TestGrammarGate:
    def test_no_engine_returns_empty(self):
        from pdf_extractor_spark.kernels import advvalidator as av
        assert av._get_language_tool() is None  # container has no LT
        assert av.check_grammar("some text with words", 0, [""]) == []

    def test_fake_engine_drives_full_loop(self, monkeypatch):
        """Prove the LanguageTool loop runs when an engine exists:
        MORFOLOGIK_ rules → spelling 0.9, others → grammar 0.7,
        offsets mapped to 1-based line/col."""
        from pdf_extractor_spark.kernels import advvalidator as av

        class Match:
            def __init__(self, rule, offset, length, repl, msg):
                self.ruleId = rule
                self.offset = offset
                self.errorLength = length
                self.replacements = repl
                self.message = msg

        class FakeTool:
            def check(self, text):
                return [
                    Match("MORFOLOGIK_RULE_EN_US", 5, 4, ["word"],
                          "Possible spelling mistake"),
                    Match("UPPERCASE_SENTENCE_START", 0, 4, ["This"],
                          "Sentence start"),
                ]

        monkeypatch.setattr(av, "_get_language_tool", lambda: FakeTool())
        errs = av.check_grammar("this wrod is here", 0,
                                ["this wrod is here"])
        spelling = [e for e in errs if e["error_type"] == "spelling"]
        grammar = [e for e in errs if e["error_type"] == "grammar"]
        assert spelling[0]["text"] == "wrod"
        assert spelling[0]["suggestion"] == "word"
        assert spelling[0]["confidence"] == 0.9
        assert spelling[0]["column"] == 6
        assert grammar[0]["confidence"] == 0.7

    def test_min_confidence_filters_grammar(self, monkeypatch):
        from pdf_extractor_spark.kernels import advvalidator as av

        class FakeTool:
            def check(self, text):
                m = type("M", (), {})()
                m.ruleId = "SOME_GRAMMAR_RULE"
                m.offset = 0
                m.errorLength = 4
                m.replacements = ["X"]
                m.message = "msg"
                return [m]

        monkeypatch.setattr(av, "_get_language_tool", lambda: FakeTool())
        assert av.check_grammar("text here", 0, [""],
                                min_confidence=0.8) == []

    def test_validate_text_includes_grammar_family(self, monkeypatch):
        from pdf_extractor_spark.kernels import advvalidator as av

        class FakeTool:
            def check(self, text):
                m = type("M", (), {})()
                m.ruleId = "MORFOLOGIK_RULE_EN_US"
                m.offset = 0
                m.errorLength = 5
                m.replacements = ["fixed"]
                m.message = "spell"
                return [m]

        monkeypatch.setattr(av, "_get_language_tool", lambda: FakeTool())
        errs = av.validate_text("wrodz in a clean sentence")
        assert any(e["error_type"] == "spelling" for e in errs)


class TestChapterSplit:
    def test_heading_split(self):
        content = "intro text\n# One\nbody one\n## Two\nbody two"
        chs = split_into_chapters(content)
        assert chs == ["intro text", "# One\nbody one", "## Two\nbody two"]

    def test_single_heading_returns_whole(self):
        content = "# Only\nbody"
        assert split_into_chapters(content) == [content]

    def test_chunk_fallback_for_large_headingless_text(self):
        content = "\n".join("line " + "x" * 95 for _ in range(1200))
        chunks = split_into_chapters(content)
        assert len(chunks) > 1
        assert all(len(c) <= 50_000 for c in chunks)
        assert "\n".join(chunks) == content


class TestAutoFix:
    def test_fixes_applied_in_reverse(self):
        content = "a w eapon and then youcan act"
        fixed, n, fixes = fix_errors(content)
        assert n == 2
        assert "weapon" in fixed and "you can" in fixed
        assert "w eapon" not in fixed

    def test_optimistic_verify_skips_overlapping_fix(self):
        """O6 verify semantics (:1069-1074): two fixes at the same span
        ('th ey' matches both the specific and the general pattern at
        min_confidence 0.8); the first applied rewrite changes the
        text, so the second fails its expected-text check and skips."""
        content = "th ey would come"
        fixes = collect_fixes(content, min_confidence=0.8)
        spans = [(f["start"], f["original"]) for f in fixes]
        assert spans.count((0, "th ey")) == 2  # specific AND general
        fixed, n = apply_fixes(content, fixes)
        # specific 'they' applies; the general twin then finds 'they w'
        # at its span and skips; 'would come' also merged (general)
        assert n == 2
        assert fixed == "they wouldcome"

    def test_low_confidence_fixes_filtered(self):
        # default fix threshold 0.9 excludes the general 0.85 pattern
        content = "the qu ick fix"
        _fixed, n, fixes = fix_errors(content)
        assert n == 0 and fixes == []

    def test_multichapter_offsets(self):
        content = "# One\na w eapon here\n# Two\nnow youcan act"
        fixed, n, _ = fix_errors(content)
        assert n == 2
        assert "weapon" in fixed and "you can" in fixed

    def test_report_format(self):
        content = "a w eapon and then youcan act"
        fixed, n, fixes = fix_errors(content)
        rep = format_fix_report("doc.md", fixes, n)
        assert rep.startswith("Applied 2 fixes to doc.md")
        assert "split_word" in rep and "joined_word" in rep
