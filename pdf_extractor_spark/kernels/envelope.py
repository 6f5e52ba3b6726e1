"""Processed-level assembly and output envelopes (cli-stage semantics).

Reproduces the reference CLI's processed-stage reshaping
(/root/reference/src/cli.py:225-315 — the Q8 path that builds the
structured document from the chapter fold instead of TextProcessor) and
the table → markdown formatting (:354-383).

Q11: ``extraction_date`` is ``datetime.now()`` in the reference
(:176,:195,:216,:311) — non-deterministic, excluded from identity
checks; the engine stamps it at write time via a caller-supplied value.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from . import structure as _structure


def title_from_name(name: str) -> str:
    """Document title from the source name (cli.py:236):
    stem, underscores → spaces, title-case.
    """
    stem = name.rsplit("/", 1)[-1]
    if "." in stem:
        stem = stem.rsplit(".", 1)[0]
    return stem.replace("_", " ").title()


def format_table_content(table: Dict) -> str:
    """Markdown rendering of a parsed table (cli.py:354-383)."""
    if "columns" not in table or "rows" not in table:
        return "Table data unavailable"
    columns = table["columns"]
    rows = table["rows"]
    if not columns or not rows:
        return "Empty table"
    out = ["| " + " | ".join(columns) + " |",
           "| " + " | ".join(["---"] * len(columns)) + " |"]
    for row in rows:
        padded = row + [""] * (len(columns) - len(row))
        out.append("| " + " | ".join(str(c) for c in padded[: len(columns)]) + " |")
    return "\n".join(out)


def build_processed(chapter_content: Optional[Dict], raw_text: str,
                    doc_name: str) -> Dict:
    """Processed-level structured document (cli.py:229-308).

    With chapter content: reshape chapters → sections (main content,
    tables, subchapters) + a generated TOC (the Q8 path — title comes
    from the document name, TextProcessor is NOT run). Without: fall
    back to ``structure.process_document(raw_text)``.
    """
    if not chapter_content:
        return _structure.process_document(raw_text)

    result: Dict = {
        "metadata": {"title": title_from_name(doc_name), "type": "Core Rulebook"},
        "table_of_contents": [],
        "chapters": [],
        "appendices": [],
    }

    for chapter in chapter_content.get("chapters", []):
        processed: Dict = {
            "number": chapter.get("number", 0),
            "title": chapter.get("title", "Untitled Chapter"),
            "sections": [],
        }
        content = chapter.get("content")
        if content is not None:
            main = content.get("main_content")
            if main:
                joined = "\n\n".join(main)
                if joined.strip():
                    processed["sections"].append(
                        {"title": "Main Content", "content": joined}
                    )
            for table in content.get("tables") or []:
                table_title = table.get("table_type", "Table").replace("_", " ").title()
                processed["sections"].append({
                    "title": f"{table_title}",
                    "content": f"Table: {table_title}\n\n" + format_table_content(table),
                    "is_table": True,
                })
            for sub in content.get("subchapters", []):
                if "title" in sub and "lines" in sub:
                    joined = "\n\n".join(sub["lines"])
                    if joined.strip():
                        processed["sections"].append(
                            {"title": sub["title"], "content": joined}
                        )
        result["chapters"].append(processed)

    for chapter in result["chapters"]:
        if chapter["number"] > 0:
            toc_entry: Dict = {
                "type": "chapter",
                "number": chapter["number"],
                "title": chapter["title"],
                "sections": [],
            }
            for section in chapter["sections"]:
                if section["title"] != "Main Content":
                    toc_entry["sections"].append({"title": section["title"]})
            result["table_of_contents"].append(toc_entry)
    return result


def make_envelope(name: str, output_type: str, content,
                  extraction_date: str = "") -> Dict:
    """Output envelope (cli.py:173-180). ``extraction_date`` is supplied
    by the caller (write-time stamp) — see Q11.
    """
    return {
        "filename": name,
        "extraction_date": extraction_date,
        "output_type": output_type,
        "content": content,
    }


REQUIRED_ENVELOPE_FIELDS: List[str] = [
    "filename", "extraction_date", "output_type", "content",
]
REQUIRED_STRUCTURED_FIELDS: List[str] = [
    "metadata", "table_of_contents", "chapters", "appendices",
]


def validate_envelope(data: Dict) -> List[str]:
    """Schema checks mirroring SchemaValidator.validate_output
    (/root/reference/src/validation/schema_validator.py:22-123).
    Returns a list of issues (empty = valid). In Spark this is mostly
    free via the declared StructType; this covers the residual checks.
    """
    issues = [f"missing field: {f}" for f in REQUIRED_ENVELOPE_FIELDS
              if f not in data]
    content = data.get("content")
    if isinstance(content, dict) and data.get("output_type") == "processed":
        issues += [f"missing content field: {f}"
                   for f in REQUIRED_STRUCTURED_FIELDS if f not in content]
        for ch in (content.get("chapters") or []):
            issues += [f"chapter missing: {f}"
                       for f in ("number", "title", "sections") if f not in ch]
        for ap in (content.get("appendices") or []):
            issues += [f"appendix missing: {f}"
                       for f in ("letter", "title", "content", "sections")
                       if f not in ap]
    return issues
