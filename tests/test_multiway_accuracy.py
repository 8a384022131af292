"""Quantitative multi-way accuracy: pairwise projections of an n-way
alignment scored against per-genome simulation truth."""

import numpy as np
import pytest

from mauvealigner_tpu.analysis.score_alignment import score_alignment
from mauvealigner_tpu.core.interval import IntervalList
from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
from mauvealigner_tpu.utils import simulate


def test_four_way_pairwise_projections_accurate(rng):
    anc = simulate.random_genome(rng, 4000)
    derived = []
    truths = []
    for i in range(3):
        d, t = simulate.evolve(
            anc, rng, sub_rate=0.015, ins_rate=0.001, del_rate=0.001, name=f"d{i}"
        )
        derived.append(d)
        truths.append(t)
    genomes = [anc] + derived
    pm = ProgressiveMauve(ProgressiveOptions(seed_weight=11, use_sml_cache=False))
    res = pm.align(genomes)

    for i, (d, truth) in enumerate(zip(derived, truths), start=1):
        proj = res.interval_list.projection([0, i])
        proj.genomes = [anc, d]
        score = score_alignment(truth, proj, [len(anc), len(d)])
        assert score.sensitivity > 0.85, f"pair 0-{i}: {score.summary()}"
        assert score.ppv > 0.9, f"pair 0-{i}: {score.summary()}"
