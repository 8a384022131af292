"""Consensus-ladder progressive anchoring (models/tree_progressive.py)."""

import numpy as np

from mauvealigner_tpu.analysis.score_alignment import score_alignment
from mauvealigner_tpu.core.validate import validate_interval_list
from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
from mauvealigner_tpu.models.tree_progressive import (
    NodeProfile,
    _compose,
    consensus_codes,
    emit_intervals,
    leaf_profile,
)
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.utils import simulate


def test_compose_signs():
    colmap = np.array([5, 0, -7, 8], np.int64)
    node_pos = np.array([1, -3, 0, 4, -1], np.int64)
    out = _compose(colmap, node_pos)
    # -3 -> -colmap[2] = +7 (double inversion); -1 -> -colmap[0] = -5
    assert out.tolist() == [5, 7, 0, 8, -5]


def test_consensus_majority_and_revcomp():
    g0 = Genome.from_codes(np.array([0, 1, 2, 3], np.int64), name="g0")
    g1 = Genome.from_codes(np.array([0, 1, 2, 3], np.int64), name="g1")
    # member 1 maps reverse-strand onto the same columns: base at |pos|,
    # complemented
    prof = NodeProfile(
        [0, 1],
        None,
        {
            0: np.array([1, 2, 3, 4], np.int64),
            1: np.array([-4, -3, -2, -1], np.int64),
        },
    )
    cons = consensus_codes([g0, g1], prof)
    # g1 reversed: base at pos 4 = T -> complement A matches g0 col 0, etc.
    assert cons.tolist() == [0, 1, 2, 3]


def test_emit_patches_pruned_hole():
    """A forward jump whose skipped positions exist nowhere else (a pruned
    private-column hole) is PATCHED with member-only columns, not split."""
    g0 = Genome.from_codes(np.arange(10, dtype=np.int64) % 4, name="g0")
    g1 = Genome.from_codes(np.arange(10, dtype=np.int64) % 4, name="g1")
    prof = NodeProfile(
        [0, 1],
        None,
        {
            0: np.array([1, 2, 3, 7, 8], np.int64),   # jump 3 -> 7
            1: np.array([1, 2, 3, 4, 5], np.int64),
        },
    )
    ivl = emit_intervals([g0, g1], prof)
    assert len(ivl.intervals) == 1
    iv = ivl.intervals[0]
    assert iv.n_cols == 8  # 5 original + 3 patched member-0 columns
    assert iv.starts.tolist() == [1, 1]
    # member 0 contiguous 1..8; member 1 gapped over the patched columns
    from mauvealigner_tpu.analysis.score_alignment import _interval_positions

    p0 = _interval_positions(iv, 0)
    p1 = _interval_positions(iv, 1)
    assert p0[p0 != 0].tolist() == [1, 2, 3, 4, 5, 6, 7, 8]
    assert p1[p1 != 0].tolist() == [1, 2, 3, 4, 5]
    assert (p1[p0 == 4] == 0).all() and (p1[p0 == 6] == 0).all()


def test_emit_splits_on_rearrangement_jump():
    """A forward jump whose skipped positions live in ANOTHER segment (a
    real rearrangement) must still split, never duplicate content."""
    g0 = Genome.from_codes(np.arange(12, dtype=np.int64) % 4, name="g0")
    g1 = Genome.from_codes(np.arange(12, dtype=np.int64) % 4, name="g1")
    prof = NodeProfile(
        [0, 1],
        None,
        {
            # 1,2,3 then jump to 7,8, then the skipped 4,5,6 appear later
            0: np.array([1, 2, 3, 7, 8, 4, 5, 6], np.int64),
            1: np.array([1, 2, 3, 4, 5, 6, 7, 8], np.int64),
        },
    )
    ivl = emit_intervals([g0, g1], prof)
    assert len(ivl.intervals) == 3
    total0 = sum(int(iv.aln[0].sum()) for iv in ivl.intervals)
    assert total0 == 8  # every genome-0 base exactly once


def test_tree_progressive_end_to_end_with_inversion(rng):
    anc = simulate.random_genome(rng, 15_000)
    genomes, truths = [anc], []
    for i in range(3):
        d, t = simulate.evolve(
            anc, rng, sub_rate=0.10, ins_rate=0.006, del_rate=0.006, name=f"d{i}"
        )
        if i == 1:
            d, t = simulate.apply_inversion_with_truth(d, t, 5000, 9000)
        genomes.append(d)
        truths.append(t)
    res = ProgressiveMauve(
        ProgressiveOptions(use_sml_cache=False, tree_progressive=True)
    ).align(genomes)
    validate_interval_list(res.interval_list, genomes)
    for i, t in enumerate(truths, start=1):
        proj = res.interval_list.projection([0, i])
        proj.genomes = [anc, genomes[i]]
        s = score_alignment(t, proj, [len(anc), len(genomes[i])])
        assert s.sensitivity > 0.9, f"pair 0-{i}: {s.summary()}"
        assert s.ppv > 0.9, f"pair 0-{i}: {s.summary()}"


def test_auto_gate_selects_path_by_coverage(rng):
    """tree_progressive=None: extant path at low divergence (n-way anchors
    cover plenty), consensus-ladder when coverage collapses."""
    from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
    from mauvealigner_tpu.utils import timing

    anc = simulate.random_genome(rng, 12_000)

    def run(rate):
        genomes = [anc]
        for i in range(4):
            d, _ = simulate.evolve(anc, rng, sub_rate=rate, name=f"d{i}")
            genomes.append(d)
        timing.GLOBAL.reset()
        ProgressiveMauve(
            ProgressiveOptions(use_sml_cache=False, skip_backbone=True, refine=False)
        ).align(genomes)
        return "tree_progressive" in timing.GLOBAL.phases

    assert run(0.01) is False   # low divergence: extant pipeline
    assert run(0.14) is True    # high divergence: consensus ladder


def test_tree_progressive_handles_ambiguity_runs(rng):
    """N runs in an input genome must flow through consensus building and
    per-node alignment without corrupting coordinates."""
    from mauvealigner_tpu.genome.sequence import Genome

    anc = simulate.random_genome(rng, 8000)
    seq = anc.seq.copy()
    seq[3000:3050] = ord("N")
    g0 = Genome(seq, name="g0")
    d1, _ = simulate.evolve(anc, rng, sub_rate=0.10, name="d1")
    d2, _ = simulate.evolve(anc, rng, sub_rate=0.10, name="d2")
    res = ProgressiveMauve(
        ProgressiveOptions(use_sml_cache=False, tree_progressive=True,
                           skip_backbone=True, refine=False)
    ).align([g0, d1, d2])
    validate_interval_list(res.interval_list, [g0, d1, d2])


def test_profile_closure_mode(rng):
    """profile_closure=True (PSP-style profile-aware node-merge gap DP)
    runs the full ladder and produces a structurally valid alignment."""
    from mauvealigner_tpu.core.validate import validate_interval_list
    from mauvealigner_tpu.models.progressive import (
        ProgressiveMauve,
        ProgressiveOptions,
    )
    from mauvealigner_tpu.utils import simulate

    anc = simulate.random_genome(rng, 20_000)
    genomes = []
    for i in range(3):
        g, _ = simulate.evolve(anc, rng, sub_rate=0.06, ins_rate=0.002,
                               del_rate=0.002)
        g.name = f"g{i}"
        genomes.append(g)
    res = ProgressiveMauve(ProgressiveOptions(
        tree_progressive=True, profile_closure=True, use_sml_cache=False
    )).align(genomes)
    ivl = res.interval_list
    ivl.add_unaligned_intervals()
    validate_interval_list(ivl, genomes)
    aligned = sum(iv.n_cols for iv in ivl.intervals if iv.multiplicity() >= 2)
    assert aligned > 15_000
