import numpy as np

from mauvealigner_tpu.core.match import MatchList
from mauvealigner_tpu.models.lcb import (
    build_lcbs,
    compute_lcb_boundaries,
    greedy_breakpoint_elimination,
)


def test_single_collinear_lcb():
    # three matches, collinear in both genomes
    starts = np.array([[1, 11], [100, 110], [300, 290]], np.int64)
    ml = MatchList(starts, np.array([50, 50, 50]))
    ids = compute_lcb_boundaries(ml.sort_by_sequence(0))
    assert len(set(ids.tolist())) == 1


def test_inversion_breaks_lcb():
    starts = np.array([[1, 11], [100, -400], [300, 290]], np.int64)
    ml = MatchList(starts, np.array([50, 50, 50]))
    ids = compute_lcb_boundaries(ml.sort_by_sequence(0))
    assert len(set(ids.tolist())) == 3


def test_transposition_breaks_lcb():
    # second genome order: m2, m1, m3 -> rank break
    starts = np.array([[1, 500], [100, 10], [300, 900]], np.int64)
    ml = MatchList(starts, np.array([50, 50, 50]))
    ids = compute_lcb_boundaries(ml.sort_by_sequence(0))
    assert len(set(ids.tolist())) == 3


def test_inverted_segment_one_lcb():
    # two matches both inverted and adjacent in reverse order: one LCB
    # seq0 order: m1 at 100, m2 at 200; in seq1 reversed segment:
    # m2 maps before m1 on the forward strand with - orientation
    starts = np.array([[100, -500], [200, -400]], np.int64)
    ml = MatchList(starts, np.array([50, 50]))
    ids = compute_lcb_boundaries(ml.sort_by_sequence(0))
    assert len(set(ids.tolist())) == 1


def test_greedy_elimination_removes_light_lcb():
    starts = np.array(
        [[1, 11], [100, 110], [300, 290], [500, -800]], np.int64
    )
    lengths = np.array([50, 50, 50, 20])
    ml = MatchList(starts, lengths)
    kept, lcbs = greedy_breakpoint_elimination(ml, min_weight=30)
    assert len(lcbs) == 1
    assert len(kept) == 3
    assert lcbs[0].weight == 150


def test_collinear_mode_single_lcb():
    starts = np.array(
        [[1, 11], [100, -700], [300, 290], [500, -500]], np.int64
    )
    lengths = np.array([50, 60, 50, 60])
    ml = MatchList(starts, lengths)
    kept, lcbs = greedy_breakpoint_elimination(ml, min_weight=-1)
    assert len(lcbs) == 1


def test_lcb_extents():
    starts = np.array([[10, -200], [60, -150]], np.int64)
    ml = MatchList(starts, np.array([20, 20])).sort_by_sequence(0)
    ids = compute_lcb_boundaries(ml)
    lcbs = build_lcbs(ml, ids)
    assert len(lcbs) == 1
    lcb = lcbs[0]
    assert lcb.lefts.tolist() == [10, 150]
    assert lcb.rights.tolist() == [79, 219]
    assert lcb.strands.tolist() == [1, -1]
