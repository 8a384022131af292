import io

import numpy as np

from mauvealigner_tpu.core.interval import Interval, IntervalList
from mauvealigner_tpu.genome.sequence import Genome


def _simple_ivlist():
    g0 = Genome.from_string("AACCGGTTAACC", name="g0")
    g1 = Genome.from_string("TTAACCGGAA", name="g1")
    # align g0[3..8] (CCGGTT) with g1[3..8] (AACCGG) with one gap each
    starts = np.array([3, 3], np.int64)
    aln = np.array(
        [
            [True, True, True, False, True, True, True],
            [True, True, False, True, True, True, True],
        ]
    )
    iv = Interval(starts, aln)
    return IntervalList(genomes=[g0, g1], intervals=[iv], seq_filenames=["g0.fa", "g1.fa"])


def test_interval_basic():
    ivl = _simple_ivlist()
    iv = ivl.intervals[0]
    assert iv.seq_lengths().tolist() == [6, 6]
    assert iv.lefts().tolist() == [3, 3]
    assert iv.rights().tolist() == [8, 8]
    assert iv.aligned_text(ivl.genomes, 0) == "CCG-GTT"
    assert iv.aligned_text(ivl.genomes, 1) == "AA-CCGG"


def test_reverse_strand_text():
    g0 = Genome.from_string("AAACGTTT")
    # reverse match over [4,6] = CGT -> revcomp ACG
    iv = Interval(np.array([-4, 0]), np.array([[True, True, True], [False, False, False]]))
    assert iv.aligned_text([g0, g0], 0) == "ACG"
    assert iv.aligned_text([g0, g0], 1) == "---"


def test_column_position_roundtrip():
    ivl = _simple_ivlist()
    iv = ivl.intervals[0]
    # forward: column 0 -> pos 3
    assert iv.column_to_position(0, 0) == 3
    assert iv.column_to_position(0, 3) == 0  # gap
    assert iv.position_to_column(0, 3) == 0
    assert iv.position_to_column(0, 8) == 6
    # reverse strand interval
    g = Genome.from_string("AAACGTTT")
    iv2 = Interval(np.array([-4]), np.array([[True, True, True]]))
    assert iv2.column_to_position(0, 0) == -6
    assert iv2.column_to_position(0, 2) == -4
    assert iv2.position_to_column(0, 6) == 0


def test_xmfa_roundtrip():
    ivl = _simple_ivlist()
    buf = io.StringIO()
    ivl.write_xmfa(buf)
    text = buf.getvalue()
    assert "#FormatVersion Mauve1" in text
    assert "> 1:3-8 + g0.fa" in text
    back = IntervalList.read_xmfa(io.StringIO(text), genomes=ivl.genomes)
    assert len(back.intervals) == 1
    iv0, iv1 = ivl.intervals[0], back.intervals[0]
    assert np.array_equal(iv0.starts, iv1.starts)
    assert np.array_equal(iv0.aln, iv1.aln)
    assert back.seq_filenames == ["g0.fa", "g1.fa"]


def test_xmfa_reverse_strand_roundtrip():
    g0 = Genome.from_string("AAACGTTTGG", name="a")
    g1 = Genome.from_string("CCCACGTTT", name="b")
    iv = Interval(
        np.array([-4, 4], np.int64),
        np.array([[True, True, True], [True, True, True]]),
    )
    ivl = IntervalList(genomes=[g0, g1], intervals=[iv])
    buf = io.StringIO()
    ivl.write_xmfa(buf)
    back = IntervalList.read_xmfa(io.StringIO(buf.getvalue()), genomes=[g0, g1])
    assert np.array_equal(back.intervals[0].starts, iv.starts)


def test_add_unaligned_intervals():
    ivl = _simple_ivlist()
    ivl.add_unaligned_intervals()
    # g0: uncovered 1-2 and 9-12; g1: uncovered 1-2 and 9-10
    singles = [iv for iv in ivl.intervals if iv.multiplicity() == 1]
    assert len(singles) == 4
    cover = {(int(np.argmax(iv.starts != 0)), int(abs(iv.starts).max()), iv.n_cols) for iv in singles}
    assert (0, 1, 2) in cover
    assert (0, 9, 4) in cover
    assert (1, 9, 2) in cover


def test_projection():
    ivl = _simple_ivlist()
    proj = ivl.projection([1])
    # interval dropped (multiplicity < 2 requires ... single-seq keeps cols)
    assert proj.n_seqs == 1


def test_strip_gap_columns():
    iv = Interval(
        np.array([1, 1]),
        np.array([[True, False, True], [True, False, False]]),
    )
    stripped = iv.strip_gap_columns()
    assert stripped.n_cols == 2


def test_column_slice_forward_and_reverse():
    from mauvealigner_tpu.core.interval import Interval

    # fwd row positions 10..15 over 8 cols with gaps at cols 2,5
    aln0 = np.array([1, 1, 0, 1, 1, 0, 1, 1], bool)
    # rev row: |start|=50, len 5, gaps at cols 0,3,4 -> cols 1,2,5,6,7 are
    # genome coords 54,53,52,51,50 (right-to-left)
    aln1 = np.array([0, 1, 1, 0, 0, 1, 1, 1], bool)
    iv = Interval(np.array([10, -50], np.int64), np.stack([aln0, aln1]))
    sub = iv.column_slice(3, 7)
    # fwd: cols 3,4,6 carry bases 12,13,14 -> start 12
    assert sub.starts[0] == 12
    assert int(sub.aln[0].sum()) == 3
    # rev: cols 5,6 in the slice carry genome coords 52,51 -> leftmost 51
    assert sub.starts[1] == -51
    assert int(sub.aln[1].sum()) == 2
    # round-trip positions agree with the parent's column_to_position
    for s in range(2):
        for c in range(4):
            got = sub.column_to_position(s, c)
            want = iv.column_to_position(s, 3 + c)
            assert got == want, (s, c, got, want)


def test_column_slice_full_range_is_identity():
    from mauvealigner_tpu.core.interval import Interval

    aln = np.ones((2, 6), bool)
    iv = Interval(np.array([5, -9], np.int64), aln)
    sub = iv.column_slice(0, 6)
    assert (sub.starts == iv.starts).all()
    assert (sub.aln == iv.aln).all()
