"""Divergence-tail FN anatomy: where exactly do the worst pair's FN columns
live in the final n-way alignment?

For the worst oracle pair (0, k-1): classify FN truth positions into
UNALIGNED holes vs misplacements, then for sampled holes/misplacements print
the local pairwise projection (anc row vs derived row) so the mechanism is
visible — double-gap (UP+LEFT) holes, anchor-boundary holes, interval-edge
holes, or whole-region losses.

Usage: python scripts/diagnose_tail.py [size] [k] [max_rate] [key=val...]
"""

import os
import sys

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
    from mauvealigner_tpu.analysis.score_alignment import (
        _interval_positions,
        pair_position_maps,
    )
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
        elif isinstance(cur, int) and not isinstance(cur, bool):
            val = int(val)
        elif isinstance(cur, float) or cur is None:
            val = float(val)
        setattr(opts, key, val)
    res = ProgressiveMauve(opts).align(genomes)

    i = k - 1  # worst pair by construction (highest branch rate)
    lens = [len(g) for g in genomes]
    amap = pair_position_maps(res.interval_list, lens, pairs=[(0, i)])[(0, i)]
    cm = pair_position_maps(truths[i - 1], [lens[0], lens[i]])[(0, 1)]
    tmask = cm != 0
    fn_mask = tmask & (amap != cm)
    hole = fn_mask & (amap == 0)
    mis = fn_mask & (amap != 0)
    print(f"pair 0-{i}: truth cols {int(tmask.sum())}, FN {int(fn_mask.sum())} "
          f"(holes {int(hole.sum())}, misplacements {int(mis.sum())})")
    d = np.abs(np.abs(amap[mis]) - np.abs(cm[mis]))
    if len(d):
        print("misplacement |delta| percentiles [50,75,90,99]:",
              np.percentile(d, [50, 75, 90, 99]).round(1).tolist())
    # hole runs
    h = hole.astype(np.int8)
    dd = np.diff(np.concatenate([[0], h, [0]]))
    hs, he = np.nonzero(dd == 1)[0], np.nonzero(dd == -1)[0]
    runs = he - hs
    if len(runs):
        print(f"hole runs: {len(runs)}, length percentiles [50,90,99]:",
              np.percentile(runs, [50, 90, 99]).round(1).tolist())

    # locate each hole position in the n-way interval structure
    # build per-interval position maps for seqs 0 and i
    ivs = res.interval_list
    # map anc genome position -> (interval, column)
    where = {}
    for kk, iv in enumerate(ivs.intervals):
        if iv.starts[0] == 0:
            continue
        pos = _interval_positions(iv, 0)
        nz = np.nonzero(pos)[0]
        for c in nz:
            where.setdefault(abs(int(pos[c])), (kk, int(c)))
    rng = np.random.default_rng(0)
    sample = rng.choice(hs, size=min(12, len(hs)), replace=False) if len(hs) else []
    CODES = "ACGTN-"
    for s in sorted(sample):
        p = s + 1  # anc genome position (1-based index into amap = position)
        loc = where.get(p)
        if loc is None:
            print(f"pos {p}: anc position not in any interval (!)")
            continue
        kk, c = loc
        iv = ivs.intervals[kk]
        mult = iv.multiplicity()
        present_i = iv.starts[i] != 0
        lo, hi = max(0, c - 12), min(iv.n_cols, c + 13)
        rows = []
        for s2 in (0, i):
            if iv.starts[s2] == 0:
                rows.append("(absent)")
                continue
            txt = iv.aligned_text(ivs.genomes, s2)[lo:hi]
            rows.append(txt)
        print(f"pos {p}: interval {kk} (mult {mult}, n_cols {iv.n_cols}, "
              f"seq{i} present={present_i}) col {c}")
        print(f"   anc: {rows[0]}")
        print(f"   d{i-1}: {rows[1]}")


if __name__ == "__main__":
    main()
