"""Line-level processing (operators P2, P3, A1).

Reproduces the reference's ``LineProcessor`` (/root/reference/src/
processing/line_processor.py:14-83): newline split, per-line whitespace
collapse, long-line re-chunking at sentence boundaries, and per-document
line stats.
"""

from __future__ import annotations

import re
from typing import Dict, List

MAX_LINE_LENGTH = 2000  # line_processor.py:12

_WS = re.compile(r"\s+")
_SENT_SPLIT = re.compile(r"([.!?])\s+")


def clean_line(line: str) -> str:
    """Collapse all whitespace runs to single spaces (P2, :51-54)."""
    return _WS.sub(" ", line.strip())


def split_long_line(line: str, max_length: int = MAX_LINE_LENGTH) -> List[str]:
    """Greedy sentence-boundary re-chunking of over-long lines (P3, :56-83).

    Mirrors the reference's accounting exactly, including the ``+ 1``
    space allowance while filling and the capture-group split that keeps
    terminal punctuation tokens at odd indices.
    """
    if len(line) <= max_length:
        return [line]

    out: List[str] = []
    buf: List[str] = []
    buf_len = 0
    parts = _SENT_SPLIT.split(line)
    for i in range(0, len(parts), 2):
        sent = parts[i]
        punct = parts[i + 1] if i + 1 < len(parts) else ""
        if buf_len + len(sent) + len(punct) + 1 <= max_length:
            buf.append(sent + punct)
            buf_len += len(sent) + len(punct) + 1
        else:
            if buf:
                out.append(" ".join(buf))
            buf = [sent + punct]
            buf_len = len(sent) + len(punct)
    if buf:
        out.append(" ".join(buf))
    return out


def split_lines(text: str) -> List[str]:
    """Full line pass (P2+P3, :14-41): split, clean, drop empties, re-chunk."""
    out: List[str] = []
    for raw in text.split("\n"):
        ln = clean_line(raw)
        if not ln:
            continue
        if len(ln) > MAX_LINE_LENGTH:
            out.extend(split_long_line(ln))
        else:
            out.append(ln)
    return out


def line_stats(lines: List[str]) -> Dict:
    """Per-document line statistics (A1, :42-49)."""
    n = len(lines)
    return {
        "total_lines": n,
        "avg_line_length": (sum(len(l) for l in lines) / n) if n else 0,
        "max_line_length": max((len(l) for l in lines), default=0),
    }


def process_lines(text: str) -> Dict:
    """``LineProcessor.process`` equivalent: lines + stats envelope."""
    lines = split_lines(text)
    return {"lines": lines, "stats": line_stats(lines)}


# --- Q9 promotion: the JVM twin of split_lines/line_stats (P2+P3+A1) -------
#
# Same rule as textnorm's twin (VERDICT r03 #7): pure JVM expressions,
# promoted ONLY behind a value-identity gate vs the Python kernel
# (tests/test_jvm_lines.py — synth corpus + adversarial unicode + the
# whitespace codepoint sweep + >MAX_LINE_LENGTH sentence packing).
#
# P3's greedy sentence packing relies on a post-clean invariant: after
# clean_line every whitespace run is a single ' ', so Python's
# ``([.!?])\s+`` split is exactly a split at ``(?<=[.!?]) `` — the
# lookbehind keeps the punctuation inside the unit, which is precisely
# the ``sent + punct`` the Python kernel accumulates. The greedy
# packing itself (the +1 space allowance while filling,
# flush-on-overflow, no +1 on the overflow seed) is an ``aggregate``
# fold with struct(out, buf, blen) state; blen = 0 iff the buffer is
# empty (every unit is non-empty, and any append sets blen >= 1).

def _pack_long_line_expr(l):
    """P3 fold over one over-long cleaned line (a lambda Column)."""
    from pyspark.sql import functions as F

    units = F.split(l, "(?<=[.!?]) ", -1)
    init = F.expr("struct(cast(array() as array<string>) as out, "
                  "'' as buf, cast(0 as bigint) as blen)")

    def step(s, u):
        fits = (s["blen"] + F.length(u) + 1) <= MAX_LINE_LENGTH
        return F.when(fits, F.struct(
            s["out"].alias("out"),
            F.when(s["blen"] == 0, u)
             .otherwise(F.concat(s["buf"], F.lit(" "), u)).alias("buf"),
            (s["blen"] + F.length(u) + 1).alias("blen"),
        )).otherwise(F.struct(
            F.when(s["blen"] == 0, s["out"])
             .otherwise(F.array_append(s["out"], s["buf"])).alias("out"),
            u.alias("buf"),
            F.length(u).cast("bigint").alias("blen"),
        ))

    def fin(s):
        return F.when(s["blen"] == 0, s["out"]) \
                .otherwise(F.array_append(s["out"], s["buf"]))

    return F.aggregate(units, init, step, fin)


def split_lines_expr(col):
    """P2+P3 as a JVM expression: text column → array<string> of
    cleaned lines, value-identical to :func:`split_lines`."""
    from pyspark.sql import functions as F

    from .textnorm import _PY_WS_CLASS as WS

    cleaned = F.transform(
        F.split(col, "\n", -1),
        lambda l: F.btrim(F.regexp_replace(l, f"{WS}+", " "),
                          F.lit(" ")))
    nonempty = F.filter(cleaned, lambda l: l != F.lit(""))
    return F.flatten(F.transform(
        nonempty,
        lambda l: F.when(F.length(l) <= MAX_LINE_LENGTH, F.array(l))
                   .otherwise(_pack_long_line_expr(l))))


def line_stats_exprs(lines_col):
    """A1 as JVM expressions over a lines array column: returns the
    (total_lines, avg_line_length, max_line_length) Columns. avg is
    the same IEEE-754 double division the Python kernel performs
    (sum of int lengths / int count), so values match bit-for-bit;
    an empty array yields (0, 0.0, 0) like the kernel's defaults."""
    from pyspark.sql import functions as F

    n = F.size(lines_col).cast("long")
    lens = F.transform(lines_col, lambda l: F.length(l).cast("bigint"))
    total_len = F.aggregate(lens, F.lit(0).cast("bigint"),
                            lambda a, x: a + x)
    avg = F.when(n > 0, total_len.cast("double") / n.cast("double")) \
           .otherwise(F.lit(0.0))
    mx = F.coalesce(F.array_max(lens), F.lit(0).cast("bigint"))
    return (n.alias("total_lines"), avg.alias("avg_line_length"),
            mx.alias("max_line_length"))
