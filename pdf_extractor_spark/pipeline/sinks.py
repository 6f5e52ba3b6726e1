"""Interchange sinks/sources (S7/S8): per-document YAML/JSON envelope
files, mirroring the reference's ``save_output`` layout
(/root/reference/src/cli.py:323-352):

    <out_dir>/<output_type>/<url-stem>.<fmt>

and the loader the markdown converter uses
(markdown_converter.py:525-540). Writes happen executor-side via
``foreachPartition`` (one small file per document — the reference's
actual interchange unit); reads go through Spark's ``binaryFile``
source so the files scan in parallel and the parse runs in one
``mapInPandas`` stage.

Scale note: one-file-per-document is the REFERENCE's contract, kept
for compatibility; the pipeline's native bulk format stays partitioned
parquet (pipeline/lineage.py). At 10^12 docs you'd only emit these
files for the tiny human-audit slice, never the full corpus.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels.envelope import make_envelope
from ..kernels.yamlio import SERIALIZERS


def _stem(url: str) -> str:
    name = url.rsplit("/", 1)[-1]
    return name.rsplit(".", 1)[0] if "." in name else name


def save_envelopes(extracted: DataFrame, out_dir: str, fmt: str = "yaml",
                   output_type: str = "processed",
                   extraction_date: str = "") -> None:
    """S8: write one envelope file per successful document. Expects the
    ``processed_json`` column (run extract_pages with the ``processed``
    level). ``extraction_date`` is caller-supplied (quirk Q11: the
    reference stamps ``datetime.now()`` at :176 — excluded from
    identity, injected at write time here).

    Executors write with plain ``open()`` — this per-doc envelope layout
    (the reference's own output contract) assumes driver and executors
    share ``out_dir`` (local mode, NFS, or a fuse-mounted object store);
    ``write_partition`` re-creates the target dir executor-side so the
    assumption is only about the filesystem, not about mkdir ordering.
    For cluster-native output use the bulk parquet sink instead."""
    if fmt not in SERIALIZERS:
        raise ValueError(f"unsupported format: {fmt}")
    dump, _load = SERIALIZERS[fmt]
    target = os.path.join(out_dir, output_type)
    os.makedirs(target, exist_ok=True)
    rows = extracted.filter(extracted.failure_reason.isNull()) \
        .select("url", "processed_json")

    def write_partition(it) -> None:
        os.makedirs(target, exist_ok=True)  # executor-local view of out_dir
        for row in it:
            envelope = make_envelope(
                row.url.rsplit("/", 1)[-1], output_type,
                json.loads(row.processed_json), extraction_date)
            path = os.path.join(target, f"{_stem(row.url)}.{fmt}")
            with open(path, "w", encoding="utf-8") as f:
                f.write(dump(envelope))

    rows.foreachPartition(write_partition)


ENVELOPE_SCHEMA = ("path string, filename string, output_type string, "
                   "extraction_date string, content_json string")


def read_envelopes(spark: SparkSession, out_dir: str,
                   fmt: str = "yaml") -> DataFrame:
    """S7: scan envelope files in parallel (binaryFile source, glob
    pushdown on the extension) and parse each in one mapInPandas stage
    — the Spark twin of the converter's per-file load."""
    if fmt not in SERIALIZERS:
        raise ValueError(f"unsupported format: {fmt}")
    _dump, load = SERIALIZERS[fmt]
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", f"*.{fmt}")
             .option("recursiveFileLookup", "true")
             .load(out_dir)
             .select("path", "content"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for path, blob in zip(batch["path"], batch["content"]):
                env = load(bytes(blob).decode("utf-8"))
                out.append((path, env.get("filename"),
                            env.get("output_type"),
                            env.get("extraction_date"),
                            json.dumps(env.get("content"),
                                       ensure_ascii=False,
                                       separators=(",", ":"))))
            yield pd.DataFrame(out, columns=[
                "path", "filename", "output_type", "extraction_date",
                "content_json"])

    return files.mapInPandas(parse, ENVELOPE_SCHEMA)
