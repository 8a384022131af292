"""Anchor scoring schemes (models/anchor_score.py)."""

import numpy as np
import pytest

from mauvealigner_tpu.core.match import MatchList
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.models import anchor_score
from mauvealigner_tpu.models.lcb import greedy_breakpoint_elimination
from mauvealigner_tpu.ops.dp import HOXD70


def test_hoxd_diag_is_complement_invariant():
    # the whole scheme rests on this: A<->T and C<->G diagonal equality
    assert HOXD70[0, 0] == HOXD70[3, 3]
    assert HOXD70[1, 1] == HOXD70[2, 2]


def _genomes_and_match():
    # g0: ACGTACGTAA ; anchor covers positions 3..6 (1-based), i.e. GTAC
    g0 = Genome.from_codes(np.array([0, 1, 2, 3, 0, 1, 2, 3, 0, 0]), name="g0")
    g1 = Genome.from_codes(np.array([2, 3, 0, 1, 2, 3, 0, 1, 1, 1]), name="g1")
    g2 = Genome.from_codes(np.array([3, 3, 2, 3, 0, 1, 3, 3, 3, 3]), name="g2")
    # 3-way anchor of length 4: starts (3, 1, -3): g2 reverse strand with
    # leftmost forward coordinate 3
    ml = MatchList(np.array([[3, 1, -3]], np.int64), np.array([4], np.int64))
    return [g0, g1, g2], ml


def test_sp_weight_matches_brute_force():
    genomes, ml = _genomes_and_match()
    w = anchor_score.anchor_weights(genomes, ml, "sp")
    # span in g0: codes[2:6] = G,T,A,C -> 100+91+91+100 = 382; 3 pairs
    assert w.shape == (1,)
    assert w[0] == pytest.approx(3 * 382.0)


def test_scheme_factors():
    genomes, ml = _genomes_and_match()
    w_sp = anchor_score.anchor_weights(genomes, ml, "sp")[0]
    w_anc = anchor_score.anchor_weights(genomes, ml, "ancestral")[0]
    w_spa = anchor_score.anchor_weights(genomes, ml, "sp_ancestral")[0]
    assert w_anc == pytest.approx(w_sp)        # k = 3 -> C(3,2) = 3 = k
    assert w_spa == pytest.approx(w_sp * 2 / 3)  # k-1 = 2


def test_pair_scales_shrink_distant_pairs():
    dist = np.array([[0.0, 0.1, 0.9], [0.1, 0.0, 0.5], [0.9, 0.5, 0.0]])
    s = anchor_score.pair_scales(dist)
    assert s[0, 1] > s[1, 2] > s[0, 2]
    assert np.all(np.diag(s) == 0.0)
    assert s[0, 2] >= anchor_score.SCALE_FLOOR**2

    genomes, ml = _genomes_and_match()
    w_flat = anchor_score.anchor_weights(genomes, ml, "sp")
    w_scaled = anchor_score.anchor_weights(genomes, ml, "sp", scales=s)
    assert w_scaled[0] < w_flat[0]
    expect = (s[0, 1] + s[0, 2] + s[1, 2]) * 382.0
    assert w_scaled[0] == pytest.approx(expect)


def test_weight_fn_tracks_crops_in_elimination():
    # two separated anchors; sp weights drive elimination: the GC-rich
    # anchor must survive a threshold the AT-rich one fails even though the
    # AT anchor is LONGER (length weights would keep the wrong one)
    at_codes = np.array([0, 3] * 6)  # ATAT... len 12, diag 91 each
    gc_codes = np.array([1, 2] * 5)  # CGCG... len 10, diag 100 each
    filler = np.array([4] * 3)
    codes = np.concatenate([at_codes, filler, gc_codes])
    g0 = Genome.from_codes(codes, name="g0")
    g1 = Genome.from_codes(codes, name="g1")
    # anchors: AT run at 1..12 vs GC run at 16..25, but reversed order in g1
    # so they form two LCBs and one must be eliminated
    ml = MatchList(
        np.array([[1, 16], [16, 1]], np.int64), np.array([12, 10], np.int64)
    )
    fn = anchor_score.make_weight_fn([g0, g1], "sp")
    # sp weights: AT anchor = 12*91 = 1092; GC anchor = 10*100 = 1000
    # threshold 1050: greedy drops the minimum-weight LCB (GC) first and
    # stops once all surviving LCBs meet the threshold
    kept, lcbs = greedy_breakpoint_elimination(ml, 1050.0, fn)
    assert len(lcbs) == 1
    assert lcbs[0].weight == pytest.approx(1092.0)
    assert int(kept.lengths[0]) == 12


def test_expected_diag_tracks_gc():
    at = Genome.from_codes(np.array([0, 3] * 50), name="at")
    gc = Genome.from_codes(np.array([1, 2] * 50), name="gc")
    assert anchor_score.expected_diag([at]) == pytest.approx(91.0)
    assert anchor_score.expected_diag([gc]) == pytest.approx(100.0)
    assert anchor_score.expected_diag([at, gc]) == pytest.approx(95.5)
