"""Regression tests for pairwise-projection semantics.

The reference scores/decodes/scans PAIRWISE PROJECTIONS of a multiple
alignment (both-gap columns removed).  These tests pin the behaviors that
depend on that: island runs continuing across a third sequence's insertion,
gap-run starts in SP scoring, HMM emission neutrality of both-gap columns,
plus two strand-orientation fixes (extractSubalignments on reverse-strand
rows, bbBreakOnGenes on relatively-inverted members) and the unrooted
monophyly test in checkForLGT.
"""

import numpy as np
import pytest

from mauvealigner_tpu.analysis import backbone as bb
from mauvealigner_tpu.analysis import islands
from mauvealigner_tpu.analysis import sp
from mauvealigner_tpu.analysis.bb_analyze import break_on_genes
from mauvealigner_tpu.core.interval import Interval, IntervalList
from mauvealigner_tpu.genome.sequence import Feature, Genome
from mauvealigner_tpu.utils import simulate


@pytest.fixture
def rng():
    return np.random.default_rng(37)


def _threeway_with_insert(rng, flank=300, insert=300):
    """g0 == g1 (homologous throughout); g2 carries an `insert`-long novel
    region in the middle -> columns [flank, flank+insert) are both-gap for
    the (0, 1) pair."""
    anc = simulate.random_genome(rng, 2 * flank)
    junk = simulate.random_genome(rng, insert).seq
    g0 = Genome(anc.seq.copy(), name="g0")
    g1 = Genome(anc.seq.copy(), name="g1")
    g2 = Genome(
        np.concatenate([anc.seq[:flank], junk, anc.seq[flank:]]), name="g2"
    )
    n_cols = 2 * flank + insert
    aln0 = np.ones(n_cols, bool)
    aln0[flank : flank + insert] = False
    aln1 = aln0.copy()
    aln2 = np.ones(n_cols, bool)
    iv = Interval(np.array([1, 1, 1], np.int64), np.stack([aln0, aln1, aln2]))
    return IntervalList(genomes=[g0, g1, g2], intervals=[iv])


def test_column_symbols_both_gap_is_sym_none(rng):
    ivl = _threeway_with_insert(rng)
    sym = bb.column_symbols(ivl.intervals[0], ivl.genomes, 0, 1)
    assert (sym[300:600] == bb.SYM_NONE).all()
    assert (sym[:300] == bb.SYM_MATCH).all()
    assert (sym[600:] == bb.SYM_MATCH).all()


def test_third_seq_insert_does_not_break_pair_homology(rng):
    """A 300-column insertion private to g2 must not drive the (g0, g1)
    posterior into Unrelated: the reference decodes the pairwise projection,
    which does not contain those columns."""
    ivl = _threeway_with_insert(rng)
    params = bb.adapted_params(0.5, identity=0.95)
    posts = bb.pairwise_homology_posteriors(ivl, params)
    p01 = posts[(0, 0, 1)]
    assert p01.shape == (900,)
    assert p01.min() > 0.5
    assert p01.mean() > 0.9
    # the g2-vs-g0 pair DOES see the insert as one-sided gap columns
    p02 = posts[(0, 0, 2)]
    assert p02[320:580].mean() < 0.5


def test_islands_continue_across_third_seq_insert():
    """seq1's island against seq0 spans a region where seq2 inserted;
    the both-gap columns must not split the island run."""
    n_cols = 100
    aln0 = np.ones(n_cols, bool)
    aln0[40:60] = False          # g2's private insert: g0 and g1 both gapped
    aln1 = np.ones(n_cols, bool)
    aln1[30:70] = False          # g1's island vs g0: cols 30-40 and 60-70
    aln2 = np.ones(n_cols, bool)
    g0 = Genome.from_string("A" * int(aln0.sum()))
    g1 = Genome.from_string("A" * int(aln1.sum()))
    g2 = Genome.from_string("A" * n_cols)
    iv = Interval(np.array([1, 1, 1], np.int64), np.stack([aln0, aln1, aln2]))
    ivl = IntervalList(genomes=[g0, g1, g2], intervals=[iv])
    # projected (0,1) view: g1 gapped for 20 contiguous columns
    isl = [x for x in islands.simple_find_islands(ivl, island_size=15)
           if x.seq_i == 1 and x.seq_j == 0]
    assert len(isl) == 1
    # without projection the run splits into two 10-col runs < 15
    assert isl[0].right_j - isl[0].left_j + 1 == 20


def test_sp_gap_runs_projected():
    """One gap run of row1 interrupted by a both-gap column (row2 also
    gapped) counts as ONE open for the (1,2)-projected pair, and the both-gap
    column contributes no gap-extend for that pair."""
    col_codes = np.array(
        [
            [0, 0, 0, 0, 0],
            [0, 5, 5, 5, 0],
            [0, 0, 5, 0, 0],
        ],
        np.int8,
    )
    zero = np.zeros((5, 5))
    match, gap = sp.match_and_gap_scores(
        col_codes, subst=zero, gap_open=-10.0, gap_extend=-1.0
    )
    assert match == 0.0
    # run starts: (0,1) one run; (0,2) one run; (1,2) row1's run survives
    # projection as one contiguous run, row2's gap is projected out entirely
    # gap positions (gap x base pairs per column): col1=2, col2=2, col3=2
    assert gap == 3 * -10.0 + 6 * -1.0


def test_extract_subalignment_reverse_strand():
    """Selecting coordinates of a reverse-strand row must honor BOTH bounds
    (positions descend along columns)."""
    from mauvealigner_tpu.tools.manipulate import extract_subalignment

    g0 = Genome.from_string("ACGT" * 25)
    g1 = Genome.from_string("ACGT" * 25)
    iv = Interval(
        np.array([1, -1], np.int64), np.ones((2, 100), bool)
    )
    ivl = IntervalList(genomes=[g0, g1], intervals=[iv])
    subs = extract_subalignment(ivl, seq=1, left=30, right=50)
    assert len(subs) == 1
    assert subs[0].n_cols == 21
    assert subs[0].starts[1] == -30
    # the forward row keeps its own (ascending) sub-range
    assert subs[0].starts[0] == 100 - 50 + 1


def test_break_on_genes_mirrors_inverted_member():
    from mauvealigner_tpu.analysis.bb_analyze import genbank_gene_bounds
    from mauvealigner_tpu.core.interval import Interval, IntervalList

    ref = Genome.from_string("A" * 1000, name="ref")
    ref.features.append(Feature("CDS", 401, 600, 1, {"gene": "x"}))
    mem = Genome.from_string("A" * 1000, name="mem")
    ivl = IntervalList(
        genomes=[ref, mem],
        intervals=[
            Interval(np.array([1, -1], np.int64), np.ones((2, 1000), bool))
        ],
    )
    bounds = [genbank_gene_bounds(ref), np.zeros(0, np.int64)]
    out = break_on_genes(ivl, 20, bounds)
    out.sort(key=lambda r: int(r[0]))
    assert len(out) == 3
    # ref pieces ascend left-to-right; inverted member pieces mirror
    assert [int(r[0]) for r in out] == [1, 401, 601]
    assert [int(r[1]) for r in out] == [400, 600, 1000]
    pairs = [(int(r[2]), int(r[3])) for r in out]
    assert pairs[0] == (-601, -1000)
    assert pairs[1] == (-401, -600)
    assert pairs[2] == (-1, -400)
    # every member base is covered exactly once across the three pieces
    spans = sorted((min(-a, -b), max(-a, -b)) for a, b in pairs)
    assert spans[0][0] == 1 and spans[-1][1] == 1000
    for (a, b), (c, d) in zip(spans[:-1], spans[1:]):
        assert c == b + 1


def test_check_for_lgt_unrooted_complement():
    from mauvealigner_tpu.analysis.tree import parse_newick
    from mauvealigner_tpu.tools.tree_tools import check_for_lgt

    # {a,b} is not a rooted clade here but IS one side of an unrooted split
    t = parse_newick("(a,(b,(c,d)));")
    assert check_for_lgt(t, {"a", "b"}, {"c", "d"}) is False
    t2 = parse_newick("(a,(c,(b,d)));")
    assert check_for_lgt(t2, {"a", "b"}, {"c", "d"}) is True


def test_posteriors_invariant_to_both_gap_columns(rng):
    """Decoding the pair inside a 3-way interval (with a third-sequence
    insert producing SYM_NONE columns) must give EXACTLY the projected
    pairwise decode on the real columns: both-gap columns are removed
    before the HMM, not fed through as neutral time steps."""
    ivl3 = _threeway_with_insert(rng, flank=300, insert=300)
    iv3 = ivl3.intervals[0]
    # the same (g0, g1) pair as its own 2-way interval (insert columns gone)
    keep = iv3.aln[0] | iv3.aln[1]
    iv2 = Interval(iv3.starts[:2].copy(), iv3.aln[:2][:, keep])
    ivl2 = IntervalList(genomes=ivl3.genomes[:2], intervals=[iv2])
    params = bb.adapted_params(0.5, identity=0.95)
    p3 = bb.pairwise_homology_posteriors(ivl3, params)[(0, 0, 1)]
    p2 = bb.pairwise_homology_posteriors(ivl2, params)[(0, 0, 1)]
    real_cols = np.nonzero(keep)[0]
    np.testing.assert_allclose(p3[real_cols], p2, rtol=0, atol=0)
    # forward-fill across the removed run keeps the posterior meaningful
    assert p3[300:600].min() > 0.5
