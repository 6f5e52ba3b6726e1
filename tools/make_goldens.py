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

from pdf_extractor_spark.pipeline.extract import LEVELS, extract_document
from pdf_extractor_spark.sources.pages import build_pages_records

GOLDEN_N = 45  # 5 docs per content class
GOLDEN_SEED = 42
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "fixtures", "goldens")


def url_hash(url: str) -> str:
    return hashlib.sha256(url.encode("utf-8")).hexdigest()[:16]


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for old in os.listdir(OUT_DIR):
        os.unlink(os.path.join(OUT_DIR, old))
    index = {}
    for rec in build_pages_records(GOLDEN_N, GOLDEN_SEED):
        result = extract_document(rec["html"], rec["text"], rec["url"], LEVELS)
        result["url"] = rec["url"]
        h = url_hash(rec["url"])
        index[h] = rec["url"]
        with open(os.path.join(OUT_DIR, f"{h}.json"), "w",
                  encoding="utf-8") as f:
            json.dump(result, f, ensure_ascii=False, sort_keys=True, indent=1)
    with open(os.path.join(OUT_DIR, "_index.json"), "w",
              encoding="utf-8") as f:
        json.dump(index, f, ensure_ascii=False, sort_keys=True, indent=1)
    print(f"wrote {len(index)} goldens to {OUT_DIR}")


if __name__ == "__main__":
    main()
