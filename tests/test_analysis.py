import io

import numpy as np
import pytest

from mauvealigner_tpu.analysis import backbone as bb
from mauvealigner_tpu.analysis import islands
from mauvealigner_tpu.analysis.distance import (
    coverage_distance_matrix,
    identity_matrix,
)
from mauvealigner_tpu.analysis.tree import (
    neighbor_joining,
    parse_newick,
    reroot_with_outgroup,
    topologies_equal,
    write_newick,
)
from mauvealigner_tpu.core.interval import Interval, IntervalList
from mauvealigner_tpu.core.match import MatchList
from mauvealigner_tpu.genome.sequence import Genome


# ---------------- HMM ----------------

def test_forward_backward_posteriors_sane():
    import jax.numpy as jnp

    from mauvealigner_tpu.ops import hmm

    # 2-state chain, emissions strongly identify the state
    log_emit = np.log(
        np.array(
            [[[0.9, 0.1]] * 5 + [[0.1, 0.9]] * 5],  # first 5 steps state0, last 5 state1
        )
    )
    log_trans = np.log(np.array([[0.95, 0.05], [0.05, 0.95]]))
    log_init = np.log(np.array([0.5, 0.5]))
    post = np.asarray(
        hmm.forward_backward(
            jnp.asarray(log_emit), jnp.asarray(log_trans), jnp.asarray(log_init),
            jnp.asarray(np.array([10])),
        )
    )
    assert post.shape == (1, 10, 2)
    assert np.allclose(post.sum(axis=2), 1.0, atol=1e-5)
    assert (post[0, :4, 0] > 0.5).all()
    assert (post[0, 6:, 1] > 0.5).all()


def test_forward_backward_padding_ignored():
    import jax.numpy as jnp

    from mauvealigner_tpu.ops import hmm

    le = np.zeros((1, 8, 2))
    le[0, :4] = np.log(np.array([0.9, 0.1]))
    le[0, 4:] = np.log(np.array([1e-9, 1.0]))  # padding says state1 loudly
    log_trans = np.log(np.array([[0.99, 0.01], [0.01, 0.99]]))
    log_init = np.log(np.array([0.5, 0.5]))
    post = np.asarray(
        hmm.forward_backward(
            jnp.asarray(le), jnp.asarray(log_trans), jnp.asarray(log_init),
            jnp.asarray(np.array([4])),
        )
    )
    assert (post[0, :4, 0] > 0.5).all()  # padding did not leak backward


# ---------------- islands / backbone (simple) ----------------

def _iv_with_gap_island(gap_len=30):
    g0 = Genome.from_string("A" * 200)
    g1 = Genome.from_string("A" * (200 - gap_len))
    aln0 = np.ones(200, bool)
    aln1 = np.ones(200, bool)
    aln1[100 : 100 + gap_len] = False
    iv = Interval(np.array([1, 1], np.int64), np.stack([aln0, aln1]))
    return IntervalList(genomes=[g0, g1], intervals=[iv])


def test_simple_find_islands():
    ivl = _iv_with_gap_island(30)
    isl = islands.simple_find_islands(ivl, island_size=20)
    assert len(isl) == 1
    # seq_i is the gapped sequence (its island spans ~0 bases); seq_j carries
    # the 30 island bases
    assert isl[0].seq_i == 1 and isl[0].seq_j == 0
    assert isl[0].right_j - isl[0].left_j == 29


def test_simple_find_backbone_splits_on_big_gap():
    ivl = _iv_with_gap_island(30)
    segs = islands.simple_find_backbone(ivl, min_bb_length=10, max_gap_length=10)
    assert len(segs) == 2


def test_coverage_fraction():
    ivl = _iv_with_gap_island(30)
    cov = islands.coverage_fraction(ivl, [200, 170])
    assert cov[0] == 1.0
    assert cov[1] == 1.0


# ---------------- distance ----------------

def test_coverage_distance_matrix():
    ml = MatchList(np.array([[1, 1], [300, 200]], np.int64), np.array([100, 50]))
    d = coverage_distance_matrix(ml, [1000, 1000])
    assert d[0, 0] == 0
    assert d[0, 1] == pytest.approx(1 - 150 / 1000)


def test_coverage_distance_matrix_union_vs_bruteforce():
    # overlap-heavy random match lists: the vectorized cummax union must
    # equal a boolean-mask oracle (regression for the vectorized rewrite)
    rng = np.random.default_rng(7)
    for _ in range(25):
        m, n = int(rng.integers(1, 60)), int(rng.integers(2, 5))
        starts = rng.integers(-500, 500, size=(m, n))
        starts[rng.random((m, n)) < 0.3] = 0
        lengths = rng.integers(1, 40, size=m).astype(np.int64)
        ml = MatchList(starts.astype(np.int64), lengths)
        got = coverage_distance_matrix(ml, [600] * n)
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                mask = np.zeros(2000, bool)
                for k in range(m):
                    if starts[k, i] and starts[k, j]:
                        l = abs(starts[k, i])
                        mask[l : l + lengths[k]] = True
                assert got[i, j] == pytest.approx(1 - min(1.0, mask.sum() / 600))


def test_identity_matrix_identical():
    g = Genome.from_string("ACGT" * 50)
    iv = Interval(np.array([1, 1], np.int64), np.ones((2, 200), bool))
    ivl = IntervalList(genomes=[g, g], intervals=[iv])
    m = identity_matrix(ivl, [g, g])
    assert m[0, 1] == pytest.approx(1.0)


# ---------------- trees ----------------

def test_newick_roundtrip():
    t = parse_newick("((a:0.1,b:0.2):0.05,c:0.3);")
    assert sorted(t.leaf_names()) == ["a", "b", "c"]
    text = write_newick(t)
    t2 = parse_newick(text)
    assert topologies_equal(t, t2)


def test_nj_recovers_clear_topology():
    # a,b close; c,d close; the two pairs far apart
    d = np.array(
        [
            [0.0, 0.1, 1.0, 1.1],
            [0.1, 0.0, 1.1, 1.0],
            [1.0, 1.1, 0.0, 0.1],
            [1.1, 1.0, 0.1, 0.0],
        ]
    )
    t = neighbor_joining(d, ["a", "b", "c", "d"])
    expected = parse_newick("((a,b),(c,d));")
    assert topologies_equal(t, expected)


def test_reroot_with_outgroup():
    t = parse_newick("((a:1,b:1):1,(c:1,(d:1,e:1):1):1);")
    r = reroot_with_outgroup(t, {"d", "e"})
    # one child of the new root is exactly {d,e}
    kid_sets = [set(c.leaf_names()) for c in r.children]
    assert {"d", "e"} in kid_sets
    assert sorted(r.leaf_names()) == ["a", "b", "c", "d", "e"]


# ---------------- homology HMM backbone ----------------

def _diverged_pair_ivl(rng):
    from mauvealigner_tpu.utils import simulate

    # homologous 300bp + unrelated 150bp inserted + homologous 300bp
    anc = simulate.random_genome(rng, 600)
    der_seq = anc.seq.copy()
    # mutate lightly
    der = Genome(der_seq, name="der")
    junkA = simulate.random_genome(rng, 150).seq
    junkB = simulate.random_genome(rng, 150).seq
    # column structure: 300 match, 150 junkA vs gaps, 150 gaps vs junkB, 300 match
    g0 = Genome(np.concatenate([anc.seq[:300], junkA, anc.seq[300:]]), name="g0")
    g1 = Genome(np.concatenate([der.seq[:300], junkB, der.seq[300:]]), name="g1")
    aln0 = np.concatenate([np.ones(300, bool), np.ones(150, bool), np.zeros(150, bool), np.ones(300, bool)])
    aln1 = np.concatenate([np.ones(300, bool), np.zeros(150, bool), np.ones(150, bool), np.ones(300, bool)])
    iv = Interval(np.array([1, 1], np.int64), np.stack([aln0, aln1]))
    return IntervalList(genomes=[g0, g1], intervals=[iv])


def test_homology_posteriors_detect_junk(rng):
    ivl = _diverged_pair_ivl(rng)
    params = bb.adapted_params(0.5, identity=0.95)
    posts = bb.pairwise_homology_posteriors(ivl)\
        if False else bb.pairwise_homology_posteriors(ivl, params)
    p = posts[(0, 0, 1)]
    assert p[:250].mean() > 0.9          # homologous head
    assert p[320:580].mean() < 0.3       # double-gap junk region
    assert p[-250:].mean() > 0.9         # homologous tail


def test_detect_and_apply_backbone(rng):
    ivl = _diverged_pair_ivl(rng)
    params = bb.adapted_params(0.5, identity=0.95)
    segs = bb.detect_backbone(ivl, params, island_gap_size=20)
    assert len(segs) >= 2
    applied = bb.apply_backbone(ivl, segs)
    # all bases still accounted for
    for s, g in enumerate(applied.genomes):
        total = sum(int(iv.aln[s].sum()) for iv in applied.intervals if iv.starts[s] != 0)
        assert total == len(g)
    multi = [iv for iv in applied.intervals if iv.multiplicity() >= 2]
    singles = [iv for iv in applied.intervals if iv.multiplicity() == 1]
    assert len(multi) >= 2
    assert len(singles) >= 2


def test_backbone_file_roundtrip(rng):
    ivl = _diverged_pair_ivl(rng)
    params = bb.adapted_params(0.5, identity=0.95)
    segs = bb.detect_backbone(ivl, params, island_gap_size=20)
    rows = bb.backbone_seq_coordinates(ivl, segs)
    rows = bb.add_unique_segments(rows, ivl, [len(g) for g in ivl.genomes])
    buf = io.StringIO()
    bb.write_backbone_seq_file(rows, buf, ivl.n_seqs)
    back = bb.read_backbone_seq_file(io.StringIO(buf.getvalue()))
    assert len(back) == len(rows)
    buf2 = io.StringIO()
    bb.write_backbone_cols_file(segs, buf2)
    segs2 = bb.read_backbone_cols_file(io.StringIO(buf2.getvalue()))
    assert len(segs2) == len(segs)
    assert segs2[0].seqs == segs[0].seqs


def test_detect_backbone_big_gaps_splits_on_long_gap():
    # 3 seqs, 300 cols; seq1 gapped over cols 100-139 (run of 40 > 20):
    # that range is non-homologous for every pair involving seq1, but
    # seqs 0/2 stay homologous there -> membership changes -> 3 segments
    from mauvealigner_tpu.analysis.bb_analyze import gene_boundary_violations
    from mauvealigner_tpu.core.interval import Interval, IntervalList

    aln = np.ones((3, 300), bool)
    aln[1, 100:140] = False
    gs = [Genome.from_string("A" * int(aln[s].sum()), name=f"g{s}") for s in range(3)]
    ivl = IntervalList(
        genomes=gs,
        intervals=[Interval(np.array([1, 1, 1], np.int64), aln)],
    )
    segs = bb.detect_backbone_big_gaps(ivl, 20)
    assert [(s.col_start, s.col_end, tuple(s.seqs)) for s in segs] == [
        (0, 100, (0, 1, 2)),
        (100, 140, (0, 2)),
        (140, 300, (0, 1, 2)),
    ]
    # a short gap (<= gap size) does not split
    aln2 = np.ones((3, 300), bool)
    aln2[1, 100:120] = False
    ivl2 = IntervalList(
        genomes=[Genome.from_string("A" * int(aln2[s].sum()), name=f"g{s}") for s in range(3)],
        intervals=[Interval(np.array([1, 1, 1], np.int64), aln2)],
    )
    segs2 = bb.detect_backbone_big_gaps(ivl2, 20)
    assert len(segs2) == 1

    # violations audit: a row straddling a bound is reported
    rows = bb.backbone_seq_coordinates(ivl, segs)
    bounds = [np.array([150], np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64)]
    viol = gene_boundary_violations(rows, bounds)
    assert viol and "150" in viol[0]
    # after splitting at the bound, no violations remain
    segs_cut = bb.detect_backbone_big_gaps(ivl, 20, bounds)
    rows_cut = bb.backbone_seq_coordinates(ivl, segs_cut)
    assert not gene_boundary_violations(rows_cut, bounds)


def _random_apply_case(rng, n_seqs, n_ivs, n_cols):
    """Randomized IntervalList + segments exercising strands, absent seqs,
    all-gap ranges, memberships that include base-free seqs, and adjacent
    same-membership segments (the merge path)."""
    intervals = []
    next_left = np.ones(n_seqs, np.int64)
    segments = []
    for k in range(n_ivs):
        aln = rng.random((n_seqs, n_cols)) < 0.8
        starts = np.zeros(n_seqs, np.int64)
        for s in range(n_seqs):
            if rng.random() < 0.2:
                aln[s] = False
                continue
            if not aln[s].any():
                aln[s, rng.integers(0, n_cols)] = True
            sign = -1 if rng.random() < 0.5 else 1
            starts[s] = sign * next_left[s]
            next_left[s] += int(aln[s].sum())
        # drop all-gap columns to satisfy the interval invariant
        keep = aln.any(axis=0)
        aln = aln[:, keep]
        if not aln.shape[1]:
            continue
        intervals.append(Interval(starts, aln))
        c = 0
        ki = len(intervals) - 1
        while c < aln.shape[1]:
            w = int(rng.integers(1, 9))
            b = min(c + w, aln.shape[1])
            mem = np.nonzero(rng.random(n_seqs) < 0.7)[0]
            if len(mem) >= 2 and rng.random() < 0.9:
                segments.append(
                    bb.BackboneColumnSegment(ki, c, b, mem.tolist())
                )
            c = b
    genomes = [
        Genome.from_codes(
            rng.integers(0, 4, int(next_left[s]) + 1).astype(np.int64),
            name=f"g{s}",
        )
        for s in range(n_seqs)
    ]
    return IntervalList(genomes=genomes, intervals=intervals), segments


def test_apply_backbone_bulk_equivalence(rng):
    """The vectorized bulk apply path (and the raw_coords grouped-reduction
    variant) must match the per-segment loop reference byte for byte."""
    for trial in range(6):
        n_seqs = int(rng.integers(2, 6))
        ivl, segs = _random_apply_case(
            rng, n_seqs, n_ivs=int(rng.integers(1, 4)), n_cols=120
        )
        if not segs:
            continue
        got = bb.apply_backbone(ivl, segs)
        raw = bb.backbone_seq_coordinates(ivl, segs, as_matrix=True)
        got_raw = bb.apply_backbone(ivl, segs, raw_coords=raw)
        # loop reference over the same merged segments
        merged = bb.merge_adjacent_segments(segs, ivl.n_seqs)
        coords = bb._segment_seq_coordinates(ivl, merged)
        by_iv = {}
        for i, seg in enumerate(merged):
            by_iv.setdefault(seg.interval_index, []).append(i)
        want = []
        for k, iv in enumerate(ivl.intervals):
            sidx = sorted(by_iv.get(k, []), key=lambda i: merged[i].col_start)
            if not sidx:
                want.append(iv)
                continue
            bb._apply_backbone_interval_loop(iv, merged, sidx, coords, want)
        for out in (got, got_raw):
            assert len(out.intervals) == len(want), (trial, len(out.intervals), len(want))
            for x, y in zip(out.intervals, want):
                assert np.array_equal(x.starts, y.starts)
                assert np.array_equal(x.aln, y.aln)


def test_add_unique_segments_matrix_matches_list(rng):
    ivl, segs = _random_apply_case(rng, 3, 2, 150)
    rows_list = bb.backbone_seq_coordinates(ivl, segs)
    rows_mat = bb.backbone_seq_coordinates(ivl, segs, as_matrix=True)
    lens = [len(g) for g in ivl.genomes]
    out_list = bb.add_unique_segments(
        bb.merge_coordinate_rows(rows_list), ivl, lens
    )
    out_mat = bb.add_unique_segments(
        bb.merge_coordinate_rows(rows_mat), ivl, lens
    )
    assert isinstance(out_mat, np.ndarray)
    assert len(out_list) == len(out_mat)
    for r1, r2 in zip(out_list, out_mat):
        assert np.array_equal(r1, r2)
    buf1, buf2 = io.StringIO(), io.StringIO()
    bb.write_backbone_seq_file(out_list, buf1, ivl.n_seqs)
    bb.write_backbone_seq_file(out_mat, buf2, ivl.n_seqs)
    assert buf1.getvalue() == buf2.getvalue()
