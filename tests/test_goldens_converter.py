"""Fourth golden family: converter-focused (VERDICT r01 #10). Pins
title normalization and paragraph-merge corner cases byte-for-byte,
both in-kernel and through a Spark mapInPandas conversion stage at
arbitrary partitioning."""

import json
import os

import pytest

from pdf_extractor_spark.kernels.markdown import (convert_to_markdown,
                                                  normalize_title)
from pdf_extractor_spark.sources.envelopes import build_converter_envelopes
from tools.make_goldens import CONVERTER_DIR


def _load():
    out = {}
    with open(os.path.join(CONVERTER_DIR, "_index.json"),
              encoding="utf-8") as f:
        for name in json.load(f):
            with open(os.path.join(CONVERTER_DIR, f"{name}.json"),
                      encoding="utf-8") as g:
                out[name] = json.load(g)
    return out


def test_kernel_reproduces_goldens():
    goldens = _load()
    assert set(goldens) == {"titles", "paragraphs", "cleanup",
                            "structure", "string-content"}
    for name, g in goldens.items():
        assert convert_to_markdown(g["envelope"]) == g["markdown"], name


class TestTitleQuirks:
    """Corner cases of _normalize_title (markdown_converter.py:465-509)
    the goldens pin — including two genuine reference quirks."""

    def test_spaced_letters_merge_pairwise_not_whole(self):
        # the accumulator resets once it holds 2 chars, so spaced
        # letters merge in PAIRS — 'C l a s s e s' → 'Cl As Se S',
        # never 'Classes' (:478-492)
        assert normalize_title("C l a s s e s") == "Cl As Se S"

    def test_ampersand_swallows_next_single_letter(self):
        # '&' enters the word list via the else branch; the next 'D'
        # sees len(words[-1]) == 1 (no isalpha check on the
        # accumulator) and merges into '&D' → capitalize() → '&d'
        assert normalize_title("D & D Basics") == "D &d Basics"

    def test_dotted_page_number_stripped(self):
        assert normalize_title("Introduction.......12") == "Introduction"

    def test_hyphen_runs_collapse(self):
        assert normalize_title("Using--  -This\t Book") == \
            "Using This Book"

    def test_camel_boundary_splits(self):
        assert normalize_title("PersonalityAnd Background") == \
            "Personality And Background"

    def test_empty_title(self):
        assert normalize_title("") == "Untitled Section"


def test_paragraph_merge_golden_semantics():
    md = _load()["paragraphs"]["markdown"]
    body = md.split("## 1. Merging\n\n", 1)[1]
    paras = body.strip().split("\n\n")
    # comma-continuation + sentence + conjunction-start all in para 1
    assert paras[0].startswith("This sentence continues, because")
    assert "and this conjunction start still merges in." in paras[0]
    # sentence-boundary break and blank-line break each start new paras
    assert paras[1].startswith("New paragraph starts")
    assert paras[2].startswith("Blank line forced")
    # lowercase start merged into the blank-line paragraph
    assert "lowercase start merges" in paras[2]


@pytest.mark.spark
def test_spark_conversion_matches_goldens(spark):
    """The converter through one mapInPandas stage reproduces golden
    bytes at partitions=3 (arbitrary partitioning)."""
    import pandas as pd

    goldens = _load()
    rows = [(name, json.dumps(g["envelope"])) for name, g in
            goldens.items()]
    df = spark.createDataFrame(rows, "name string, envelope_json string") \
        .repartition(3)

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "name": pdf["name"],
                "markdown": [convert_to_markdown(json.loads(e))
                             for e in pdf["envelope_json"]]})

    got = {r.name: r.markdown
           for r in df.mapInPandas(run, "name string, markdown string")
           .collect()}
    assert got == {name: g["markdown"] for name, g in goldens.items()}
