"""Fast CPU accuracy sweep for the divergence tail (round-5 task 2).

Runs the tree-progressive pipeline on CPU at a reduced scale of the 9-way
enterobacteria sweep (branch rates 3%..max_rate, inversions in half the
genomes) and prints per-pair sn/ppv + min/mean — the iteration harness for
LCA re-scoring experiments.

Usage: python scripts/sweep_accuracy_cpu.py [size] [k] [max_rate] [key=val...]
Extra key=val pairs are set on ProgressiveOptions (ints/floats/bools parsed).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if "=" not in a]
    kvs = [a for a in sys.argv[1:] if "=" in a]
    size = int(args[0]) if args else 120_000
    k = int(args[1]) if len(args) > 1 else 9
    max_rate = float(args[2]) if len(args) > 2 else 0.12

    from scripts.bench_enterobacteria import build_genomes
    from mauvealigner_tpu.analysis.score_alignment import pair_position_maps
    from mauvealigner_tpu.models.progressive import (
        ProgressiveMauve,
        ProgressiveOptions,
    )

    genomes, truths = build_genomes(size, k, max_rate)
    opts = ProgressiveOptions(use_sml_cache=False)
    for kv in kvs:
        key, val = kv.split("=", 1)
        cur = getattr(opts, key)
        if val in ("True", "False"):
            val = val == "True"
        elif isinstance(cur, bool):
            val = bool(int(val))
        elif isinstance(cur, int):
            val = int(val)
        elif isinstance(cur, float) or cur is None:
            val = float(val)
        setattr(opts, key, val)
    t0 = time.time()
    res = ProgressiveMauve(opts).align(genomes)
    wall = time.time() - t0

    lens = [len(g) for g in genomes]
    amaps = pair_position_maps(
        res.interval_list, lens, pairs=[(0, i) for i in range(1, k)]
    )
    acc = []
    for i, truth in enumerate(truths, start=1):
        cm = pair_position_maps(truth, [lens[0], lens[i]])[(0, 1)]
        a = amaps[(0, i)]
        tmask = cm != 0
        tp = int(np.sum(tmask & (a == cm)))
        fn = int(tmask.sum()) - tp
        fp = int(np.sum((a != 0) & (a != cm)))
        acc.append(
            {
                "pair": f"0-{i}",
                "sn": round(tp / max(tp + fn, 1), 4),
                "ppv": round(tp / max(tp + fp, 1), 4),
            }
        )
    sns = [a["sn"] for a in acc]
    print(
        json.dumps(
            {
                "size": size,
                "k": k,
                "max_rate": max_rate,
                "opts": kvs,
                "wall_s": round(wall, 1),
                "min_sn": min(sns),
                "mean_sn": round(float(np.mean(sns)), 4),
                "mean_ppv": round(
                    float(np.mean([a["ppv"] for a in acc])), 4
                ),
                "accuracy": acc,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
