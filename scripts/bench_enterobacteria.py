"""BASELINE config 3 at REAL enterobacteria scale: 9 x ~4.6 Mbp genomes,
10-20% pairwise divergence with inversions, full progressiveMauve on the
TPU.  Emits one JSON line: warm wall-clock, per-phase split, and the
simulation-oracle accuracy of every ancestor-derived pairwise projection
(the truth survives the inversions via apply_inversion_with_truth).

Usage: python scripts/bench_enterobacteria.py [genome_size] [n_genomes] [repeats]
Defaults: 4_600_000 9 2 (first run pays cold remote compiles: minutes/shape).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _cache_path(size, k, max_rate):
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".bench_logs")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"entero_{size}_{k}_{max_rate}.npz")


def _save_cache(path, genomes, truths):
    from mauvealigner_tpu.core.interval import IntervalList

    blobs = {"n_genomes": np.int64(len(genomes))}
    for i, g in enumerate(genomes):
        blobs[f"g{i}"] = g.seq
    for t_i, t in enumerate(truths):
        blobs[f"t{t_i}_n"] = np.int64(len(t.intervals))
        for j, iv in enumerate(t.intervals):
            blobs[f"t{t_i}_{j}_starts"] = iv.starts
            blobs[f"t{t_i}_{j}_aln"] = np.packbits(iv.aln, axis=1)
            blobs[f"t{t_i}_{j}_cols"] = np.int64(iv.aln.shape[1])
    np.savez_compressed(path, **blobs)


def _load_cache(path):
    from mauvealigner_tpu.core.interval import Interval, IntervalList
    from mauvealigner_tpu.genome.sequence import Genome

    z = np.load(path)
    n = int(z["n_genomes"])
    names = ["anc"] + [f"d{i}" for i in range(n - 1)]
    genomes = [Genome(z[f"g{i}"], name=names[i]) for i in range(n)]
    truths = []
    for t_i in range(n - 1):
        ivs = []
        for j in range(int(z[f"t{t_i}_n"])):
            cols = int(z[f"t{t_i}_{j}_cols"])
            aln = np.unpackbits(z[f"t{t_i}_{j}_aln"], axis=1)[:, :cols].astype(bool)
            ivs.append(Interval(z[f"t{t_i}_{j}_starts"], aln))
        truths.append(IntervalList(
            genomes=[genomes[0], genomes[t_i + 1]], intervals=ivs
        ))
    return genomes, truths


def build_genomes(size: int, k: int, max_rate: float = 0.08):
    from mauvealigner_tpu.utils import simulate

    cache = _cache_path(size, k, max_rate)
    if os.path.exists(cache):
        return _load_cache(cache)
    rng = np.random.default_rng(37)
    anc = simulate.random_genome(rng, size, name="anc")
    genomes, truths = [anc], []
    # per-branch substitution rates 3%..max_rate: pairwise divergence between
    # two derived genomes ~ sum of branch rates, plus indels
    rates = np.linspace(0.03, max_rate, k - 1)
    for i, s in enumerate(rates):
        d, t = simulate.evolve(
            anc, rng, sub_rate=float(s), ins_rate=float(s) / 10,
            del_rate=float(s) / 10, name=f"d{i}",
        )
        if i % 2 == 1:  # half the genomes carry 1-2 large inversions
            for _ in range(1 + (i % 3 == 1)):
                # redraw until the range sits inside one forward truth piece
                # (a second inversion must not overlap the first)
                for _attempt in range(20):
                    span = int(rng.integers(size // 80, size // 10))
                    lo = int(rng.integers(1000, len(d) - span - 1000))
                    try:
                        d, t = simulate.apply_inversion_with_truth(
                            d, t, lo, lo + span
                        )
                        break
                    except ValueError:
                        continue
        genomes.append(d)
        truths.append(t)
    try:
        _save_cache(cache, genomes, truths)
    except Exception:
        pass  # cache is an optimization only
    return genomes, truths


def main(size: int, k: int, repeats: int, max_rate: float = 0.08):
    from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
    from mauvealigner_tpu.utils import timing

    t0 = time.time()
    genomes, truths = build_genomes(size, k, max_rate)
    gen_s = time.time() - t0

    times = []
    res = None
    for r in range(repeats):
        timing.GLOBAL.reset()
        t0 = time.time()
        res = ProgressiveMauve(ProgressiveOptions(use_sml_cache=False)).align(genomes)
        times.append(time.time() - t0)
        print(json.dumps({"run": r, "wallclock_s": round(times[-1], 2)}),
              file=sys.stderr, flush=True)
        print(timing.GLOBAL.report(), file=sys.stderr, flush=True)

    t0 = time.time()
    # one pass over the n-way list extracts every (0, i) map at once —
    # per-pair projections re-walked the 40M-column alignment 8 times
    from mauvealigner_tpu.analysis.score_alignment import pair_position_maps

    lens = [len(g) for g in genomes]
    amaps = pair_position_maps(
        res.interval_list, lens, pairs=[(0, i) for i in range(1, len(genomes))]
    )
    acc = []
    for i, truth in enumerate(truths, start=1):
        cm = pair_position_maps(truth, [lens[0], lens[i]])[(0, 1)]
        a = amaps[(0, i)]
        tmask = cm != 0
        tp = int(np.sum(tmask & (a == cm)))
        fn = int(tmask.sum()) - tp
        fp = int(np.sum((a != 0) & (a != cm)))
        sn = tp / max(tp + fn, 1)
        ppv = tp / max(tp + fp, 1)
        acc.append({"pair": f"0-{i}", "sn": round(sn, 4), "ppv": round(ppv, 4)})
    score_s = time.time() - t0

    # measurement protocol (round-4 lesson: 36% same-session spread made
    # round-over-round deltas uninterpretable): the headline is the MEDIAN
    # of the in-process warm reps (run 0 is the cold rep), with the spread
    # recorded; claim deltas only beyond the spread.
    warm = sorted(times[1:]) if len(times) > 1 else times
    median = warm[len(warm) // 2] if len(warm) % 2 else (
        warm[len(warm) // 2 - 1] + warm[len(warm) // 2]
    ) / 2
    spread = (max(warm) - min(warm)) / median if median else 0.0
    # measured reference-class N-way denominator (task-4 round 5):
    # scripts/measure_baseline_nway.py writes it for the same generator
    vs_baseline = None
    bl_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "BASELINE_NWAY_MEASURED.json",
    )
    try:
        with open(bl_path) as fh:
            bl = json.load(fh)
        if bl.get("genome_size") == size and bl.get("n_genomes") == k:
            vs_baseline = {
                "baseline_architecture_s": bl["architecture_s"],
                "baseline_lower_bound_s": bl["lower_bound_s"],
                "vs_architecture": round(bl["architecture_s"] / median, 2),
                "vs_lower_bound": round(bl["lower_bound_s"] / median, 2),
            }
    except Exception:
        pass
    out = {
        "config": f"progressive_{k}way_{size//1000}kbp"
        + (f"_rate{max_rate}" if max_rate != 0.08 else ""),
        "wallclock_warm_s": round(median, 2),
        "warm_reps_s": [round(t, 2) for t in times[1:]],
        "warm_spread_frac": round(spread, 3),
        "wallclock_cold_s": round(times[0], 2),
        "phases": {p: round(t, 2) for p, t in timing.GLOBAL.phases.items()},
        "n_lcbs": len(res.lcbs),
        "n_anchors": len(res.mums),
        "n_backbone_rows": len(res.backbone_rows),
        "accuracy": acc,
        "mean_sn": round(float(np.mean([a["sn"] for a in acc])), 4),
        "mean_ppv": round(float(np.mean([a["ppv"] for a in acc])), 4),
        "vs_baseline": vs_baseline,
        "genome_gen_s": round(gen_s, 1),
        "scoring_s": round(score_s, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4_600_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    max_rate = float(sys.argv[4]) if len(sys.argv) > 4 else 0.08
    main(size, k, reps, max_rate)
