"""Second golden family: adversarial classes added after the original
45 were frozen (unicode, empty HTML body, nested lists, whitespace
soup, mixed structural stress). Same byte-identity contract."""

import json
import os

import pandas as pd
import pytest

from pdf_extractor_spark.pipeline.extract import LEVELS, extract_pages
from pdf_extractor_spark.sources.pages import build_extra_records
from tools.make_goldens import EXTRA_DIR, EXTRA_N, EXTRA_SEED

pytestmark = pytest.mark.spark


def _load():
    with open(os.path.join(EXTRA_DIR, "_index.json"), encoding="utf-8") as f:
        index = json.load(f)
    out = {}
    for h, url in index.items():
        with open(os.path.join(EXTRA_DIR, f"{h}.json"),
                  encoding="utf-8") as f:
            out[url] = json.load(f)
    return out


def test_extra_goldens_byte_identical(spark):
    goldens = _load()
    pages = spark.createDataFrame(
        pd.DataFrame(build_extra_records(EXTRA_N, EXTRA_SEED)),
        schema=("url string, warc_ts timestamp, html binary, "
                "text string, lang string")).repartition(5)
    rows = extract_pages(pages, levels=LEVELS).collect()
    assert len(rows) == EXTRA_N
    for r in rows:
        g = goldens[r.url]
        assert r.failure_reason == g["failure_reason"], r.url
        assert r.text == g["text"], f"raw text mismatch for {r.url}"
        assert r.lines_json == g["lines_json"], r.url
        assert r.chapters_json == g["chapters_json"], r.url
        assert r.processed_json == g["processed_json"], r.url
        assert r.markdown == g["markdown"], r.url


def test_extra_covers_all_classes():
    classes = {u.split("/extra/")[1].split("/")[0] for u in _load()}
    assert classes == {"unicode", "empty_html", "nested_lists",
                       "whitespace_soup", "mixed_long"}


def test_unicode_survives_html_path():
    goldens = _load()
    uni_html = [g for u, g in goldens.items()
                if "/unicode/" in u and u.endswith(".html")]
    assert uni_html
    assert any("中文" in (g["text"] or "") for g in uni_html)
    assert any("déjà" in (g["text"] or "") for g in uni_html)
