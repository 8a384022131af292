"""Subset-LCB recovery: segments shared by a strict subset of genomes."""

import numpy as np
import pytest

from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
from mauvealigner_tpu.utils import simulate


def test_subset_segment_recovered(rng):
    # three genomes: a core 1500bp; g1/g2 additionally share a 600bp segment
    # appended after the core BEYOND the boundary-extension flank cap (an
    # unshared 1300bp spacer in each genome), so only the anchored subset
    # pass can align it
    core = simulate.random_genome(rng, 1500)
    seg = simulate.random_genome(rng, 600)
    junk1 = simulate.random_genome(rng, 1300)
    junk2 = simulate.random_genome(rng, 1300)
    g0 = Genome(core.seq.copy(), name="g0")
    d1, _ = simulate.evolve(core, rng, sub_rate=0.01)
    d2, _ = simulate.evolve(core, rng, sub_rate=0.01)
    seg1, _ = simulate.evolve(seg, rng, sub_rate=0.01)
    seg2, _ = simulate.evolve(seg, rng, sub_rate=0.01)
    g1 = Genome(np.concatenate([d1.seq, junk1.seq, seg1.seq]), name="g1")
    g2 = Genome(np.concatenate([d2.seq, junk2.seq, seg2.seq]), name="g2")

    pm = ProgressiveMauve(
        ProgressiveOptions(seed_weight=11, use_sml_cache=False, skip_backbone=True)
    )
    res = pm.align([g0, g1, g2])
    # intervals aligning the appended segment between g1 and g2 only must
    # cover most of the 600bp tail (may be split across several LCBs)
    tail_start = len(g1) - 600 + 1
    covered = 0
    for iv in res.interval_list.intervals:
        if iv.starts[0] != 0 or iv.starts[1] == 0 or iv.starts[2] == 0:
            continue
        l1 = abs(int(iv.starts[1]))
        r1 = l1 + int(iv.aln[1].sum()) - 1
        covered += max(0, min(r1, len(g1)) - max(l1, tail_start) + 1)
    assert covered > 300, f"subset segment not recovered (covered {covered}/600)"
    # coverage bookkeeping intact
    for s, g in enumerate(res.interval_list.genomes):
        total = sum(
            int(iv.aln[s].sum())
            for iv in res.interval_list.intervals
            if iv.starts[s] != 0
        )
        assert total == len(g)


def test_subset_pass_disabled(rng):
    core = simulate.random_genome(rng, 1000)
    g0 = Genome(core.seq.copy(), name="g0")
    d1, _ = simulate.evolve(core, rng, sub_rate=0.01)
    d2, _ = simulate.evolve(core, rng, sub_rate=0.01)
    pm = ProgressiveMauve(
        ProgressiveOptions(
            seed_weight=11, use_sml_cache=False, subset_lcbs=False, skip_backbone=True
        )
    )
    res = pm.align([g0, d1, d2])
    assert len(res.interval_list.intervals) >= 1
