"""Third golden family: TextCleaner enabled (quirk Q4) over the same
45-record corpus. Pins ``cleaned_text`` bytes under Spark at arbitrary
partitioning — the run_together class docs exercise the run-together
splitter byte-identically."""

import json
import os

import pytest

from pdf_extractor_spark.pipeline.extract import extract_pages
from pdf_extractor_spark.sources.pages import synth_pages_df
from tools.make_goldens import CLEANED_DIR, GOLDEN_N, GOLDEN_SEED

pytestmark = pytest.mark.spark


def _load():
    with open(os.path.join(CLEANED_DIR, "_index.json"),
              encoding="utf-8") as f:
        index = json.load(f)
    out = {}
    for h, url in index.items():
        with open(os.path.join(CLEANED_DIR, f"{h}.json"),
                  encoding="utf-8") as f:
            out[url] = json.load(f)
    return out


def test_cleaned_goldens_byte_identical(spark):
    goldens = _load()
    pages = synth_pages_df(spark, GOLDEN_N, seed=GOLDEN_SEED, partitions=9)
    rows = extract_pages(pages, levels=("raw",),
                         text_cleaning="light").collect()
    assert len(rows) == GOLDEN_N
    for r in rows:
        g = goldens[r.url]
        assert r.failure_reason is None, (r.url, r.failure_reason)
        assert r.text == g["text"], r.url
        assert r.cleaned_text == g["cleaned_text"], \
            f"cleaned text mismatch for {r.url}"


def test_run_together_family_exercises_q4():
    """The run_together docs must actually change under the cleaner —
    the splitter runs, byte-pinned (VERDICT r01 'What's wrong' #1)."""
    goldens = _load()
    rt = {u: g for u, g in goldens.items() if "/run_together/" in u}
    assert len(rt) == 5
    changed = [u for u, g in rt.items()
               if g["cleaned_text"] != g["text"]]
    assert changed, "Q4 splitter never fired on the run_together class"
    # the canonical fixture sentence splits on its embedded 'and'
    assert any("st and still" in g["cleaned_text"] for g in rt.values())


def test_cleaner_off_by_default():
    """Default pipeline output (first family) has no cleaned_text —
    mirroring the reference, where TextCleaner is constructed but the
    live path never calls it (markdown_converter.py:36-38)."""
    from tools.make_goldens import OUT_DIR
    with open(os.path.join(OUT_DIR, "_index.json"), encoding="utf-8") as f:
        h = next(iter(json.load(f)))
    with open(os.path.join(OUT_DIR, f"{h}.json"), encoding="utf-8") as f:
        assert "cleaned_text" not in json.load(f)
