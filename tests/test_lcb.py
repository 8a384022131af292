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


def test_build_lcbs_orders_seq0_absent_members_by_first_present():
    """Subset LCBs absent in sequence 0 must keep chain order (first present
    sequence), not arbitrary input order — gap-region assembly crops
    misordered anchors to nothing."""
    from mauvealigner_tpu.core.match import NO_MATCH, MatchList
    from mauvealigner_tpu.models.lcb import build_lcbs, compute_lcb_boundaries

    starts = np.array(
        [[NO_MATCH, 300, 300], [NO_MATCH, 100, 100], [NO_MATCH, 200, 200]],
        np.int64,
    )
    ml = MatchList(starts, np.array([50, 50, 50], np.int64))
    ids = compute_lcb_boundaries(ml)
    assert int(ids.max()) == 0  # one collinear chain
    (lcb,) = build_lcbs(ml, ids)
    ordered = ml.select(lcb.match_indices)
    assert list(np.abs(ordered.starts[:, 1])) == [100, 200, 300]


def test_greedy_elimination_terminates_with_negative_weights():
    """A weight_fn returning weights <= -1 must not hang the cohort loop."""
    from mauvealigner_tpu.core.match import MatchList
    from mauvealigner_tpu.models.lcb import greedy_breakpoint_elimination

    starts = np.array([[100, 500], [600, 200]], np.int64)  # two LCBs
    ml = MatchList(starts, np.array([20, 20], np.int64))
    cur, lcbs = greedy_breakpoint_elimination(
        ml, 50.0, weight_fn=lambda m: np.full(len(m), -5.0)
    )
    assert len(cur) == 0 and lcbs == []
