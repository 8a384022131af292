"""apply_inversion_with_truth: the simulation oracle must survive
rearrangements (the truth alignment stays exact after inverting a derived
segment)."""

import numpy as np

from mauvealigner_tpu.analysis.score_alignment import score_alignment
from mauvealigner_tpu.models.aligner import AlignerOptions, MauveAligner
from mauvealigner_tpu.utils import simulate


def test_truth_self_score_perfect_after_inversion(rng):
    anc = simulate.random_genome(rng, 3000)
    der, truth = simulate.evolve(anc, rng, sub_rate=0.02, ins_rate=0.001, del_rate=0.001)
    der2, truth2 = simulate.apply_inversion_with_truth(der, truth, 1000, 2000)
    s = score_alignment(truth2, truth2, [len(anc), len(der2)])
    assert s.sensitivity == 1.0 and s.ppv == 1.0


def test_double_inversion_truth(rng):
    anc = simulate.random_genome(rng, 4000)
    der, truth = simulate.evolve(anc, rng, sub_rate=0.01)
    der, truth = simulate.apply_inversion_with_truth(der, truth, 500, 1200)
    der, truth = simulate.apply_inversion_with_truth(der, truth, 2500, 3300)
    s = score_alignment(truth, truth, [len(anc), len(der)])
    assert s.sensitivity == 1.0 and s.ppv == 1.0
    assert len(truth.intervals) == 5


def test_aligner_recovers_inversion_against_truth(rng):
    """End-to-end: aligned output scored against the rearranged truth."""
    anc = simulate.random_genome(rng, 12_000)
    der, truth = simulate.evolve(anc, rng, sub_rate=0.02, ins_rate=0.001, del_rate=0.001)
    der, truth = simulate.apply_inversion_with_truth(der, truth, 4000, 8000)
    res = MauveAligner(AlignerOptions(seed_size=11, use_sml_cache=False)).align([anc, der])
    s = score_alignment(truth, res.interval_list, [len(anc), len(der)])
    assert s.sensitivity > 0.9, s.summary()
    assert s.ppv > 0.9, s.summary()
