"""Vocab-scale evidence for batched BPE training (VERDICT r03 #5).

The sequential trainer's wall clock is rounds x a fixed per-round job
floor (~2.3s in local mode), one merge per round. The batched trainer
(queries/search.py bpe_train_batched) learns a symbol-disjoint BATCH
per round, so the target is: >= 100 merges learned in < 10x the wall
of the 6-merge sequential trainer.

Usage: python tools/bpe_scale_bench.py [--sf-dir /root/testdata/sf0.1]
       [--cpus 16] [--target 100] [--pool 200]
Prints one JSON line; results folded into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--target", type=int, default=100)
    ap.add_argument("--pool", type=int, default=200)
    args = ap.parse_args()

    from pdf_extractor_spark.queries.search import (_bpe_words,
                                                    _bpe_train,
                                                    bpe_train_batched)
    from pdf_extractor_spark.session import get_spark

    spark = get_spark("bpe-scale", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus * 2,
                      extra={"spark.ui.showConsoleProgress": "false"})

    words = _bpe_words(spark, args.sf_dir).localCheckpoint()
    n_words = words.count()
    print(f"vocab: {n_words} unique words", file=sys.stderr, flush=True)

    t0 = time.time()
    merges6, _ = _bpe_train(spark, args.sf_dir)
    out = merges6[0]
    for m in merges6[1:]:
        out = out.unionByName(m)
    n6 = out.count()
    w6 = time.time() - t0
    print(f"sequential: {n6} merges in {w6:.1f}s "
          f"({w6 / max(n6, 1):.2f}s/merge)", file=sys.stderr, flush=True)

    t0 = time.time()
    merges, _vocab = bpe_train_batched(words, pool=args.pool,
                                       target_merges=args.target)
    nb = merges.count()
    rounds = merges.select("round").distinct().count()
    wb = time.time() - t0
    print(f"batched: {nb} merges in {rounds} rounds, {wb:.1f}s "
          f"({wb / max(nb, 1):.3f}s/merge)", file=sys.stderr, flush=True)

    print(json.dumps({
        "sf_dir": args.sf_dir, "cpus": args.cpus,
        "n_unique_words": n_words,
        "sequential": {"merges": n6, "sec": round(w6, 1)},
        "batched": {"merges": nb, "rounds": rounds,
                    "sec": round(wb, 1), "pool": args.pool},
        "wall_ratio_vs_6merge": round(wb / w6, 2),
        "target_met": bool(nb >= args.target and wb < 10 * w6),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
