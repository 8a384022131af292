"""Gapped LCB boundary extension (models/boundary.py): terminal and
inter-LCB flank recovery, tiling invariants, strand handling."""

import numpy as np
import pytest

from mauvealigner_tpu.analysis.score_alignment import score_alignment
from mauvealigner_tpu.core.interval import Interval, IntervalList
from mauvealigner_tpu.core.validate import validate_interval_list
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.models.boundary import extend_interval_boundaries
from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
from mauvealigner_tpu.utils import simulate


def _codes_genome(rng, n, name):
    return simulate.random_genome(rng, n, name=name)


def test_terminal_flanks_extend_and_tile(rng):
    # one LCB in the middle; both termini unanchored
    g0 = simulate.random_genome(rng, 3000, name="g0")
    g1 = Genome(g0.seq.copy(), name="g1")
    # interval covering positions 1001..2000 in both genomes
    aln = np.ones((2, 1000), dtype=bool)
    ivl = IntervalList(genomes=[g0, g1], intervals=[Interval(np.array([1001, 1001]), aln)])
    out = extend_interval_boundaries(ivl, [g0, g1], max_flank=4096)
    iv = out.intervals[0]
    assert iv.starts.tolist() == [1, 1]
    assert int(iv.aln[0].sum()) == 3000
    assert int(iv.aln[1].sum()) == 3000
    out.add_unaligned_intervals()
    validate_interval_list(out, [g0, g1])
    # identical flanks must align perfectly: no gap columns at all
    assert iv.aln.all()


def test_midpoint_split_between_neighbors(rng):
    g0 = simulate.random_genome(rng, 2000, name="g0")
    g1 = Genome(g0.seq.copy(), name="g1")
    a = Interval(np.array([1, 1]), np.ones((2, 400), dtype=bool))
    b = Interval(np.array([1601, 1601]), np.ones((2, 400), dtype=bool))
    ivl = IntervalList(genomes=[g0, g1], intervals=[a, b])
    out = extend_interval_boundaries(ivl, [g0, g1], max_flank=4096)
    ia, ib = out.intervals
    # run 401..1600 (1200bp) splits 600/600: a takes 401..1000, b 1001..1600
    assert int(ia.aln[0].sum()) == 1000 and abs(int(ia.starts[0])) == 1
    assert int(ib.aln[0].sum()) == 1000 and abs(int(ib.starts[0])) == 1001
    out.add_unaligned_intervals()
    validate_interval_list(out, [g0, g1])


def test_flank_cap_respected(rng):
    g0 = simulate.random_genome(rng, 5000, name="g0")
    g1 = Genome(g0.seq.copy(), name="g1")
    iv = Interval(np.array([2001, 2001]), np.ones((2, 1000), dtype=bool))
    ivl = IntervalList(genomes=[g0, g1], intervals=[iv])
    out = extend_interval_boundaries(ivl, [g0, g1], max_flank=256)
    ext = out.intervals[0]
    assert abs(int(ext.starts[0])) == 2001 - 256
    assert int(ext.aln[0].sum()) == 1000 + 2 * 256


def test_reverse_strand_row_extends_correct_side(rng):
    # g1's row is reverse strand: the alignment-left flank must come from
    # g1's genome-right side and vice versa
    fwd = simulate.random_genome(rng, 3000, name="g0")
    rc = Genome(simulate.revcomp_ascii(fwd.seq), name="g1")
    # LCB: g0 forward [1001,2000] <-> g1 reverse; g1 forward coords of that
    # block are [1001,2000] too (full revcomp of a 3000bp genome)
    aln = np.ones((2, 1000), dtype=bool)
    ivl = IntervalList(
        genomes=[fwd, rc], intervals=[Interval(np.array([1001, -1001]), aln)]
    )
    out = extend_interval_boundaries(ivl, [fwd, rc], max_flank=4096)
    iv = out.intervals[0]
    assert iv.starts.tolist() == [1, -1]
    assert int(iv.aln[0].sum()) == 3000 and int(iv.aln[1].sum()) == 3000
    # revcomp identity: perfect alignment, no gaps
    assert iv.aln.all()
    out.add_unaligned_intervals()
    validate_interval_list(out, [fwd, rc])


def test_progressive_termini_aligned_at_high_divergence(rng):
    # end-to-end: unanchorable divergent termini are recovered by extension
    anc = simulate.random_genome(rng, 20000)
    derived, truths = [], []
    for i in range(2):
        d, t = simulate.evolve(
            anc, rng, sub_rate=0.15, ins_rate=0.01, del_rate=0.01, name=f"d{i}"
        )
        derived.append(d)
        truths.append(t)
    genomes = [anc] + derived

    def sens(ext):
        pm = ProgressiveMauve(
            ProgressiveOptions(
                seed_weight=11, use_sml_cache=False, boundary_extension=ext
            )
        )
        res = pm.align(genomes)
        vals = []
        for i, (d, truth) in enumerate(zip(derived, truths), start=1):
            proj = res.interval_list.projection([0, i])
            proj.genomes = [anc, d]
            s = score_alignment(truth, proj, [len(anc), len(d)])
            vals.append(s.sensitivity)
        return float(np.mean(vals))

    assert sens(True) >= sens(False)
