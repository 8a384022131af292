"""End-to-end aligner tests on simulated genomes with known truth
(the reference's QA strategy, SURVEY.md §4)."""

import io

import numpy as np
import pytest

from mauvealigner_tpu.analysis.score_alignment import score_alignment
from mauvealigner_tpu.core.interval import IntervalList
from mauvealigner_tpu.models.aligner import AlignerOptions, MauveAligner
from mauvealigner_tpu.utils import simulate


def _pairwise_case(rng, n=4000, sub=0.01, ins=0.001, dele=0.001):
    anc = simulate.random_genome(rng, n)
    der, truth = simulate.evolve(anc, rng, sub_rate=sub, ins_rate=ins, del_rate=dele)
    return anc, der, truth


def test_pairwise_identical(rng):
    g = simulate.random_genome(rng, 2000)
    g2 = simulate.random_genome(rng, 0)
    aligner = MauveAligner(AlignerOptions(seed_size=11, use_sml_cache=False))
    res = aligner.align([g, simulate.Genome(g.seq.copy(), name="copy")])
    assert len(res.lcbs) == 1
    ivl = res.interval_list
    assert len(ivl.intervals) == 1
    iv = ivl.intervals[0]
    assert iv.n_cols == 2000
    assert iv.aln.all()


def test_pairwise_mutated_high_accuracy(rng):
    anc, der, truth = _pairwise_case(rng)
    aligner = MauveAligner(AlignerOptions(seed_size=11, use_sml_cache=False))
    res = aligner.align([anc, der])
    score = score_alignment(truth, res.interval_list, [len(anc), len(der)])
    assert score.sensitivity > 0.95, score.summary()
    assert score.ppv > 0.95, score.summary()


def test_pairwise_inversion_two_lcbs(rng):
    anc = simulate.random_genome(rng, 6000)
    der, _ = simulate.evolve(anc, rng, sub_rate=0.005, ins_rate=0.0005, del_rate=0.0005)
    der_inv = simulate.apply_inversion(der, 2000, 3500)
    aligner = MauveAligner(AlignerOptions(seed_size=11, use_sml_cache=False))
    res = aligner.align([anc, der_inv])
    assert len(res.lcbs) >= 2
    strands = sorted(int(l.strands[1]) for l in res.lcbs)
    assert strands[0] == -1 and strands[-1] == 1


def test_three_way_alignment(rng):
    anc = simulate.random_genome(rng, 3000)
    d1, _ = simulate.evolve(anc, rng, sub_rate=0.01)
    d2, _ = simulate.evolve(anc, rng, sub_rate=0.01)
    aligner = MauveAligner(AlignerOptions(seed_size=9, use_sml_cache=False))
    res = aligner.align([anc, d1, d2])
    assert len(res.lcbs) >= 1
    ivl = res.interval_list
    total_cols = sum(iv.n_cols for iv in ivl.intervals)
    assert total_cols >= 2500
    # XMFA output is well-formed and round-trips
    buf = io.StringIO()
    ivl.write_xmfa(buf)
    back = IntervalList.read_xmfa(io.StringIO(buf.getvalue()), genomes=ivl.genomes)
    assert len(back.intervals) == len(ivl.intervals)
    for a, b in zip(ivl.intervals, back.intervals):
        assert np.array_equal(a.starts, b.starts)
        assert np.array_equal(a.aln, b.aln)


def test_ungapped_mode(rng):
    anc, der, truth = _pairwise_case(rng, n=2000)
    aligner = MauveAligner(
        AlignerOptions(seed_size=11, gapped=False, recursive=False, use_sml_cache=False)
    )
    res = aligner.align([anc, der])
    assert len(res.interval_list.intervals) >= 1


def test_scorer_self_consistency(rng):
    anc, der, truth = _pairwise_case(rng, n=1500)
    score = score_alignment(truth, truth, [len(anc), len(der)])
    assert score.sensitivity == 1.0
    assert score.ppv == 1.0
