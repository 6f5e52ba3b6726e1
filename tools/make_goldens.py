"""Generate frozen golden outputs for the extraction pipeline.

Single-node oracle: runs the SAME kernel chain
(pipeline.extract.extract_document) over the deterministic synthetic
corpus (sources.pages.build_pages_records) and freezes one JSON file per
url under fixtures/goldens/. The Spark pipeline must reproduce these
byte-for-byte per url at any partition count (SURVEY.md §5.2.1/5.2.5).

Run: ``python tools/make_goldens.py`` (idempotent; rewrites goldens).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_extractor_spark.kernels.markdown import convert_to_markdown
from pdf_extractor_spark.pipeline.extract import LEVELS, extract_document
from pdf_extractor_spark.sources.envelopes import build_converter_envelopes
from pdf_extractor_spark.sources.pages import (build_extra_records,
                                               build_pages_records)

GOLDEN_N = 45  # 5 docs per content class
GOLDEN_SEED = 42
EXTRA_N = 25   # 5 docs per extra class (second frozen family)
EXTRA_SEED = 137
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(_REPO, "fixtures", "goldens")
EXTRA_DIR = os.path.join(_REPO, "fixtures", "goldens_extra")
# Third family: TextCleaner enabled (quirk Q4 run-together splitting) —
# pins cleaned_text bytes over the same 45-record corpus, including the
# run_together class docs the splitter was built for.
CLEANED_DIR = os.path.join(_REPO, "fixtures", "goldens_cleaned")
# Fourth family: converter-focused (title normalization + paragraph
# merge corner cases) — envelope → markdown bytes.
CONVERTER_DIR = os.path.join(_REPO, "fixtures", "goldens_converter")


def url_hash(url: str) -> str:
    return hashlib.sha256(url.encode("utf-8")).hexdigest()[:16]


def _write_family(records, out_dir, levels=LEVELS, **extract_kwargs) -> int:
    os.makedirs(out_dir, exist_ok=True)
    for old in os.listdir(out_dir):
        os.unlink(os.path.join(out_dir, old))
    index = {}
    for rec in records:
        result = extract_document(rec["html"], rec["text"], rec["url"],
                                  levels, **extract_kwargs)
        result["url"] = rec["url"]
        h = url_hash(rec["url"])
        index[h] = rec["url"]
        with open(os.path.join(out_dir, f"{h}.json"), "w",
                  encoding="utf-8") as f:
            json.dump(result, f, ensure_ascii=False, sort_keys=True, indent=1)
    with open(os.path.join(out_dir, "_index.json"), "w",
              encoding="utf-8") as f:
        json.dump(index, f, ensure_ascii=False, sort_keys=True, indent=1)
    return len(index)


def main() -> None:
    n = _write_family(build_pages_records(GOLDEN_N, GOLDEN_SEED), OUT_DIR)
    print(f"wrote {n} goldens to {OUT_DIR}")
    n = _write_family(build_extra_records(EXTRA_N, EXTRA_SEED), EXTRA_DIR)
    print(f"wrote {n} goldens to {EXTRA_DIR}")
    n = _write_family(build_pages_records(GOLDEN_N, GOLDEN_SEED),
                      CLEANED_DIR, levels=("raw",), text_cleaning="light")
    print(f"wrote {n} goldens to {CLEANED_DIR}")

    os.makedirs(CONVERTER_DIR, exist_ok=True)
    for old in os.listdir(CONVERTER_DIR):
        os.unlink(os.path.join(CONVERTER_DIR, old))
    index = {}
    for rec in build_converter_envelopes():
        index[rec["name"]] = rec["name"]
        with open(os.path.join(CONVERTER_DIR, f"{rec['name']}.json"),
                  "w", encoding="utf-8") as f:
            json.dump({"name": rec["name"], "envelope": rec["envelope"],
                       "markdown": convert_to_markdown(rec["envelope"])},
                      f, ensure_ascii=False, sort_keys=True, indent=1)
    with open(os.path.join(CONVERTER_DIR, "_index.json"), "w",
              encoding="utf-8") as f:
        json.dump(index, f, ensure_ascii=False, sort_keys=True, indent=1)
    print(f"wrote {len(index)} goldens to {CONVERTER_DIR}")


if __name__ == "__main__":
    main()
