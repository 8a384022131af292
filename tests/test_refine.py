import numpy as np
import pytest

from mauvealigner_tpu.analysis.sp import compute_sp_score, interval_column_codes
from mauvealigner_tpu.core.interval import Interval, IntervalList
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.models.refine import _window_bounds, refine_intervals
from mauvealigner_tpu.utils import simulate


def test_sp_score_identical_positive():
    g = Genome.from_string("ACGT" * 25)
    iv = Interval(np.array([1, 1], np.int64), np.ones((2, 100), bool))
    assert compute_sp_score(iv, [g, g]) > 0


def test_sp_score_gaps_penalized():
    g = Genome.from_string("ACGT" * 25)
    g2 = Genome.from_string("ACGT" * 24)
    aln = np.ones((2, 100), bool)
    aln[1, 50:54] = False
    iv = Interval(np.array([1, 1], np.int64), aln)
    full = Interval(np.array([1, 1], np.int64), np.ones((2, 100), bool))
    assert compute_sp_score(iv, [g, g2]) < compute_sp_score(full, [g, g])


def test_window_bounds_cover_all_columns(rng):
    aln = rng.random((3, 1000)) > 0.1
    iv = Interval(np.array([1, 1, 1], np.int64), aln)
    bounds = _window_bounds(iv, 128)
    assert bounds[0][0] == 0
    assert bounds[-1][1] == 1000
    for (a1, b1), (a2, b2) in zip(bounds[:-1], bounds[1:]):
        assert b1 == a2


def test_refine_improves_bad_alignment(rng):
    # construct a deliberately bad alignment of two identical sequences:
    # misplace a gap pair that refinement should remove
    seq = simulate.random_genome(rng, 120)
    g2 = Genome(seq.seq.copy(), name="copy")
    aln = np.ones((2, 124), bool)
    aln[0, 40:44] = False   # 4 gaps in row 0
    aln[1, 80:84] = False   # 4 gaps in row 1
    iv = Interval(np.array([1, 1], np.int64), aln)
    ivl = IntervalList(genomes=[seq, g2], intervals=[iv])
    before = compute_sp_score(iv, [seq, g2])
    refined, improved = refine_intervals(ivl, window=256)
    after = compute_sp_score(refined.intervals[0], [seq, g2])
    assert improved >= 1
    assert after > before
    # bases preserved
    assert refined.intervals[0].aln[0].sum() == 120
    assert refined.intervals[0].aln[1].sum() == 120


def test_refine_keeps_good_alignment(rng):
    anc = simulate.random_genome(rng, 500)
    g2 = Genome(anc.seq.copy(), name="c")
    iv = Interval(np.array([1, 1], np.int64), np.ones((2, 500), bool))
    ivl = IntervalList(genomes=[anc, g2], intervals=[iv])
    refined, improved = refine_intervals(ivl, window=128)
    assert compute_sp_score(refined.intervals[0], [anc, g2]) >= compute_sp_score(
        iv, [anc, g2]
    )


def test_refine_modes_sp_monotone_multiway(rng):
    """Both refinement modes only ever accept SP-improving windows, and the
    split mode preserves every base (5-way, gappy input)."""
    n = 5
    anc = simulate.random_genome(rng, 400)
    genomes = [anc] + [
        simulate.evolve(anc, rng, sub_rate=0.05, ins_rate=0.01, del_rate=0.01)[0]
        for _ in range(n - 1)
    ]
    # naive ragged stack: left-align every sequence, pad tails with gaps
    L = max(len(g) for g in genomes)
    aln = np.zeros((n, L), bool)
    for s, g in enumerate(genomes):
        aln[s, : len(g)] = True
    iv = Interval(np.ones(n, np.int64), aln)
    ivl = IntervalList(genomes=genomes, intervals=[iv])
    before = compute_sp_score(iv, genomes)
    for mode in ("split", "rebuild"):
        refined, _ = refine_intervals(ivl, window=128, mode=mode)
        out = refined.intervals[0]
        assert compute_sp_score(out, genomes) >= before, mode
        for s, g in enumerate(genomes):
            assert out.aln[s].sum() == len(g), mode  # bases preserved


def test_refine_split_falls_back_for_one_sided_windows(rng):
    """A subset interval whose present sequences all sit on one side of the
    root bipartition can't be profile-split at the root edge; split mode
    must fall back to the rebuild path instead of skipping it."""
    seq = simulate.random_genome(rng, 120)
    g1 = Genome(seq.seq.copy(), name="c1")
    g2 = simulate.random_genome(rng, 50)
    g3 = simulate.random_genome(rng, 50)
    genomes = [seq, g1, g2, g3]
    # misaligned pair interval present ONLY in genomes {0, 1}
    aln = np.zeros((4, 124), bool)
    aln[0] = aln[1] = True
    aln[0, 40:44] = False
    aln[1, 80:84] = False
    iv = Interval(np.array([1, 1, 0, 0], np.int64), aln)
    ivl = IntervalList(genomes=genomes, intervals=[iv])
    # root merge splits {0,1} | {2,3}: every window of iv is one-sided
    plan = [("n0", 0, 1), ("n1", 2, 3), ("root", "n0", "n1")]
    before = compute_sp_score(iv, genomes)
    refined, improved = refine_intervals(ivl, plan=plan, window=256, mode="split")
    after = compute_sp_score(refined.intervals[0], genomes)
    assert improved >= 1
    assert after > before
    assert refined.intervals[0].aln[0].sum() == 120
    assert refined.intervals[0].aln[1].sum() == 120
