"""Determinism under task retries (VERDICT r04 #5).

The byte-identity claim is benched at two parallelism levels but a
real cluster also re-executes TASKS: the fused mapInPandas stage must
produce identical (url, text) bytes and exactly-once lineage counts
when attempt 0 of every task dies mid-stream (after yielding its first
Arrow batch — partial output a retry must replace, never append to).

Runs ``tools/retry_job.py`` twice in subprocesses (the session fixture
is local[32] with maxFailures=1; retries need a ``local[4,4]``
master): once clean, once with PDFX_RETRY_FAULT=1. Reference behavior
being matched: blanket per-document capture (reference
pdf_extractor.py:73-81) without duplicates.
"""

import json
import os
import subprocess
import sys

def _run(tmp_path, name: str, fault: bool) -> dict:
    env = dict(os.environ)
    env.pop("PDFX_RETRY_FAULT", None)
    if fault:
        env["PDFX_RETRY_FAULT"] = "1"
    out = str(tmp_path / name)
    proc = subprocess.run(
        [sys.executable, "tools/retry_job.py", out],
        capture_output=True, text=True, timeout=900, env=env,
        cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    rec["stderr"] = proc.stderr
    return rec


def test_retry_replays_are_byte_identical_and_exactly_once(tmp_path):
    clean = _run(tmp_path, "clean", fault=False)
    faulted = _run(tmp_path, "faulted", fault=True)

    # the fault actually fired (tasks really died and were retried)
    assert "injected retry fault" in faulted["stderr"]
    # ... and never fired on the clean run
    assert "injected retry fault" not in clean["stderr"]

    assert clean["n_rows"] == 3000
    assert faulted["n_rows"] == 3000
    assert faulted["digest"] == clean["digest"]
    # exactly-once lineage accounting survives re-execution
    for k in ("rows_in", "rows_out", "failures", "batches_ran"):
        assert faulted[k] == clean[k], k
    assert clean["rows_out"] + clean["failures"] == clean["rows_in"] == 3000
