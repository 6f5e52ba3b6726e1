"""Scaling bench for the composed rehearsal chain (VERDICT r04 #4).

One driver program: raw .warc.gz bytes → land → resumable hybrid
extraction → dedup_pipeline → curation_pipeline → budget selection →
packing/shard manifests (`pipeline/compose.run_rehearsal`), timed
end-to-end at two parallelism levels on the same ≥2M-doc synthetic
crawl. Efficiency = (docs_s_hi / docs_s_lo) / (cores_hi / cores_lo);
protocol and the un-oversubscribed 4→16 pair per BENCH/BASELINE.md.

The WARC corpus is synthesized DISTRIBUTED (one .warc.gz per input
partition, each partition's ids contiguous from spark.range — fully
deterministic), because the driver-side `write_warc_files` test helper
would serialize ~4 GB through one core.

Usage:
  python tools/rehearsal_bench.py --docs 2000000 --lo 4 --hi 16
  python tools/rehearsal_bench.py --worker 16 --warc-dir ... --job-dir ...
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)


def synth_warc_distributed(out_dir: str, n_docs: int, n_files: int = 128,
                           seed: int = 42, skew: float = 0.3) -> None:
    """Deterministic distributed twin of sources.warc.write_warc_files:
    one gzip'd WARC file per contiguous id range."""
    marker = os.path.join(out_dir, "_SYNTH_DONE")
    if os.path.exists(marker):
        return
    import pandas as pd

    from pdf_extractor_spark.session import get_spark, stop_spark

    spark = get_spark("warc-synth", extra={
        "spark.ui.showConsoleProgress": "false"})
    os.makedirs(out_dir, exist_ok=True)

    def gen(batches):
        import gzip

        from pdf_extractor_spark.sources.pages import _records_for_ids
        from pdf_extractor_spark.sources.warc import format_record
        ids = []
        for pdf in batches:
            ids.extend(int(i) for i in pdf["id"])
        if not ids:
            yield pd.DataFrame({"file": pd.Series([], dtype="string"),
                                "n": pd.Series([], dtype="int64")})
            return
        chunks = []
        for r in _records_for_ids(ids, seed, skew):
            ts_iso = r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
            if r["text"] is not None:
                body, ctype = r["text"].encode("utf-8"), "text/plain"
            else:
                body = r["html"]
                ctype = ("application/pdf" if body[:5] == b"%PDF-"
                         else "text/html")
            chunks.append(format_record(r["url"], ts_iso, body, ctype))
        name = os.path.join(out_dir, f"part-{min(ids):09d}.warc.gz")
        with open(name, "wb") as fh:
            fh.write(gzip.compress(b"".join(chunks)))
        yield pd.DataFrame({"file": [name], "n": [len(ids)]})

    written = (spark.range(0, n_docs, 1, n_files)
               .mapInPandas(gen, "file string, n long")
               .agg({"n": "sum"}).collect()[0][0])
    assert written == n_docs, (written, n_docs)
    with open(marker, "w") as fh:
        fh.write(str(n_docs))
    stop_spark()


def worker(cpus: int, warc_dir: str, job_dir: str, budget: int,
           num_batches: int, levels: str) -> int:
    from pdf_extractor_spark.pipeline.compose import run_rehearsal
    from pdf_extractor_spark.session import get_spark

    spark = get_spark(f"rehearsal-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    if os.path.exists(job_dir):
        shutil.rmtree(job_dir)
    t0 = time.time()
    counts = run_rehearsal(spark, warc_dir, job_dir, budget=budget,
                           num_batches=num_batches,
                           levels=tuple(levels.split(",")))
    sec = time.time() - t0
    print(json.dumps({"cpus": cpus, "sec": round(sec, 1),
                      "docs_per_sec": round(counts["rows_in"] / sec, 1),
                      **counts}), flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, help="internal: cpus")
    ap.add_argument("--warc-dir")
    ap.add_argument("--job-dir")
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--budget", type=int, default=0,
                    help="token budget (0 -> docs * 60, ~half the corpus)")
    ap.add_argument("--num-batches", type=int, default=4)
    ap.add_argument("--levels", default="raw",
                    help="comma list; 'raw' = hybrid JVM/Python fast "
                         "lane, the full protocol chain = "
                         "raw,lines,chapters,processed,markdown")
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--skip-warm", action="store_true",
                    help="skip the untimed warm-up chain run per level")
    args = ap.parse_args()
    budget = args.budget or args.docs * 60

    if args.worker:
        return worker(args.worker, args.warc_dir, args.job_dir, budget,
                      args.num_batches, args.levels)

    warc_dir = f"/tmp/rehearsal_warc_{args.docs}"
    synth_warc_distributed(warc_dir, args.docs)
    subprocess.run(["sync"], check=False)

    def run_level(cpus: int, tag: str) -> dict:
        job_dir = f"/tmp/rehearsal_job_{args.docs}_{tag}"
        # PYTHONPATH reaches the executor-side Python workers (the
        # chain's mapInPandas closures unpickle pdf_extractor_spark
        # there); driver-side sys.path alone is not enough.
        env = {**os.environ, "PYTHONPATH": REPO}
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(cpus), "--warc-dir", warc_dir,
             "--job-dir", job_dir, "--budget", str(budget),
             "--num-batches", str(args.num_batches),
             "--levels", args.levels],
            capture_output=True, text=True, cwd="/tmp", env=env)
        sys.stderr.write(proc.stderr[-3000:])
        if proc.returncode != 0:
            raise SystemExit(f"worker {tag} rc={proc.returncode}")
        out = json.loads(proc.stdout.strip().splitlines()[-1])
        print(json.dumps(out), flush=True)
        return out

    # Warm-up chain run per BASELINE.md protocol (page cache + JIT);
    # then the timed run at each level, low first.
    if not args.skip_warm:
        run_level(args.hi, f"warm{args.hi}")
    lo = run_level(args.lo, f"lo{args.lo}")
    hi = run_level(args.hi, f"hi{args.hi}")
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (args.hi / args.lo)
    print(json.dumps({
        "metric": "composed rehearsal chain docs/sec (warc->shards)",
        "docs": args.docs, "lo_cpus": args.lo, "hi_cpus": args.hi,
        "lo": lo, "hi": hi, "scaling_efficiency": round(eff, 3),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
