"""Measure all BASELINE.md evaluation configs on the current platform.

Usage: python scripts/bench_configs.py [config_ids...]
  1 pairwise 1Mbp           (same as bench.py)
  2 three-genome 500kbp with inversion, recursive + islands/backbone
  3 nine-way 250kbp progressive with HMM backbone (REAL-scale config 3 at
    9 x 4.6 Mbp lives in scripts/bench_enterobacteria.py)
  4 repeatoire on a 300kbp genome with planted repeat families
  5 draft workflow (sortContigs + 8-way progressive; sharded front half
    when >1 device is present)
Emits one JSON line per config.
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _genomes_pair(rng, n):
    from mauvealigner_tpu.utils import simulate

    anc = simulate.random_genome(rng, n)
    der, _ = simulate.evolve(anc, rng, sub_rate=0.01, ins_rate=0.0005, del_rate=0.0005)
    return [anc, der]


def config1(repeat=2):
    from mauvealigner_tpu.models.aligner import AlignerOptions, MauveAligner

    rng = np.random.default_rng(37)
    genomes = _genomes_pair(rng, 1_000_000)
    times = []
    res = None
    for _ in range(repeat):
        t0 = time.time()
        res = MauveAligner(AlignerOptions(use_sml_cache=False)).align(genomes)
        times.append(time.time() - t0)
    return {
        "config": "pairwise_1mbp",
        "wallclock_s": round(min(times), 3),
        "cold_s": round(times[0], 3),
        "n_lcbs": len(res.lcbs),
        "n_anchors": len(res.mums),
    }


def config2(repeat=2):
    from mauvealigner_tpu.analysis.islands import simple_find_backbone, simple_find_islands
    from mauvealigner_tpu.models.aligner import AlignerOptions, MauveAligner
    from mauvealigner_tpu.utils import simulate

    rng = np.random.default_rng(37)
    anc = simulate.random_genome(rng, 500_000)
    d1, _ = simulate.evolve(anc, rng, sub_rate=0.01, ins_rate=0.001, del_rate=0.001)
    d2, _ = simulate.evolve(anc, rng, sub_rate=0.02, ins_rate=0.001, del_rate=0.001)
    d2 = simulate.apply_inversion(d2, 150_000, 250_000)
    genomes = [anc, d1, d2]
    times = []
    out = None
    for _ in range(repeat):
        t0 = time.time()
        res = MauveAligner(AlignerOptions(use_sml_cache=False)).align(genomes)
        islands = simple_find_islands(res.interval_list, 50)
        bb = simple_find_backbone(res.interval_list, 50, 50)
        out = (res, islands, bb)
        times.append(time.time() - t0)
    res, islands, bb = out
    return {
        "config": "threeway_500kbp_inversion",
        "wallclock_s": round(min(times), 3),
        "cold_s": round(times[0], 3),
        "n_lcbs": len(res.lcbs),
        "n_islands": len(islands),
        "n_backbone": len(bb),
    }


def config3(repeat=2, n=250_000, k=9):
    from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
    from mauvealigner_tpu.utils import simulate

    rng = np.random.default_rng(37)
    anc = simulate.random_genome(rng, n)
    genomes = [anc]
    for _ in range(k - 1):
        d, _ = simulate.evolve(anc, rng, sub_rate=0.02, ins_rate=0.001, del_rate=0.001)
        genomes.append(d)
    times = []
    res = None
    for _ in range(repeat):
        t0 = time.time()
        res = ProgressiveMauve(ProgressiveOptions(use_sml_cache=False)).align(genomes)
        times.append(time.time() - t0)
    return {
        "config": f"progressive_{k}way_{n//1000}kbp",
        "wallclock_s": round(min(times), 3),
        "cold_s": round(times[0], 3),
        "n_lcbs": len(res.lcbs),
        "n_backbone_rows": len(res.backbone_rows),
    }


def config4(repeat=2):
    from mauvealigner_tpu.genome.sequence import Genome
    from mauvealigner_tpu.models.repeatoire import Repeatoire, RepeatoireOptions
    from mauvealigner_tpu.utils import simulate

    rng = np.random.default_rng(37)
    parts = [simulate.random_genome(rng, 30_000).seq]
    unit1 = simulate.random_genome(rng, 600).seq
    unit2 = simulate.random_genome(rng, 300).seq
    for i in range(8):
        parts.append(unit1.copy())
        parts.append(simulate.random_genome(rng, 20_000).seq)
        if i % 2 == 0:
            parts.append(unit2.copy())
            parts.append(simulate.random_genome(rng, 10_000).seq)
    g = Genome(np.concatenate(parts), name="repeats")
    times = []
    fams = None
    for _ in range(repeat):
        t0 = time.time()
        fams = Repeatoire(RepeatoireOptions()).find_repeats(g)
        times.append(time.time() - t0)
    return {
        "config": f"repeatoire_{len(g)//1000}kbp",
        "wallclock_s": round(min(times), 3),
        "cold_s": round(times[0], 3),
        "n_families": len(fams),
        "top_multiplicity": max((f.multiplicity for f in fams), default=0),
    }


def config5(repeat=2, n=150_000, k=8, n_contigs=6):
    """Draft-genome workflow: shuffled/inverted multi-contig drafts ->
    sortContigs against the reference -> progressive alignment (the
    pod-sharded draft config, run single-chip)."""
    from mauvealigner_tpu.genome.sequence import Contig, Genome, revcomp_ascii
    from mauvealigner_tpu.models.aligner import AlignerOptions, MauveAligner
    from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
    from mauvealigner_tpu.tools.manipulate import contig_placements_from_lcbs, sort_contigs
    from mauvealigner_tpu.utils import simulate

    rng = np.random.default_rng(37)
    ref = simulate.random_genome(rng, n, name="ref")

    def make_draft(evolved, name):
        cuts = np.sort(
            rng.choice(np.arange(2000, n - 2000), size=n_contigs - 1, replace=False)
        )
        edges = np.concatenate([[0], cuts, [len(evolved)]])
        pieces = []
        for i, (a, b) in enumerate(zip(edges[:-1], edges[1:])):
            chunk = evolved.seq[a:b]
            if rng.random() < 0.4:
                chunk = revcomp_ascii(chunk)
            pieces.append((f"{name}_c{i}", chunk))
        order = rng.permutation(len(pieces))
        contigs, parts, off = [], [], 0
        for idx in order:
            cname, chunk = pieces[idx]
            contigs.append(Contig(cname, len(chunk), off))
            parts.append(chunk)
            off += len(chunk)
        return Genome(np.concatenate(parts), contigs=contigs, name=name)

    drafts = []
    for i in range(k - 1):
        ev, _ = simulate.evolve(ref, rng, sub_rate=0.01, ins_rate=0.0005, del_rate=0.0005)
        drafts.append(make_draft(ev, f"d{i}"))

    import jax

    # pod axis: when the platform exposes >1 device, the per-draft MUM
    # searches shard over the mesh (sort_contigs_sharded); single-chip runs
    # the sequential flow.  Both paths are equivalence-tested
    # (tests/test_parallel.py, tests/test_draft_workflow.py).
    n_devices = len(jax.devices())
    use_sharded = n_devices > 1

    def front_half_sequential():
        reordered, placed = [], 0
        for d in drafts:
            al = MauveAligner(
                AlignerOptions(gapped=False, recursive=False, use_sml_cache=False)
            )
            ml = al.find_mums([ref, d])
            _, lcbs = al.determine_lcbs([ref, d], ml)
            placements = contig_placements_from_lcbs(d, lcbs, draft_seq_index=1)
            fixed, log = sort_contigs(d, placements)
            placed += sum(1 for _, s in log if s != 0)
            reordered.append(fixed)
        return reordered, placed

    def front_half_sharded():
        from mauvealigner_tpu.parallel import make_mesh, sort_contigs_sharded

        mesh = make_mesh()
        out = sort_contigs_sharded(ref, drafts, mesh)
        placed = sum(
            sum(1 for _, s in log if s != 0) for _, log in out
        )
        return [g for g, _ in out], placed

    times = []
    front_times = {"sequential": [], "sharded": []}
    res = None
    placed_total = 0
    for _ in range(repeat):
        t0 = time.time()
        if use_sharded:
            reordered, placed_total = front_half_sharded()
            front_times["sharded"].append(round(time.time() - t0, 3))
        else:
            reordered, placed_total = front_half_sequential()
            front_times["sequential"].append(round(time.time() - t0, 3))
        res = ProgressiveMauve(ProgressiveOptions(use_sml_cache=False)).align(
            [ref] + reordered
        )
        times.append(time.time() - t0)
    # when a mesh exists, also record the sequential front half once so the
    # config JSON carries the sharded-vs-sequential delta
    if use_sharded:
        t0 = time.time()
        front_half_sequential()
        front_times["sequential"].append(round(time.time() - t0, 3))
    return {
        "config": f"draft_workflow_{k}x{n//1000}kbp",
        "wallclock_s": round(min(times), 3),
        "cold_s": round(times[0], 3),
        "front_half": "sharded" if use_sharded else "sequential",
        "n_devices": n_devices,
        "front_half_s": {k2: v for k2, v in front_times.items() if v},
        "contigs_placed": placed_total,
        "n_lcbs": len(res.lcbs),
    }


CONFIGS = {"1": config1, "2": config2, "3": config3, "4": config4, "5": config5}

if __name__ == "__main__":
    which = sys.argv[1:] or list(CONFIGS)
    for c in which:
        print(json.dumps(CONFIGS[c]()), flush=True)
