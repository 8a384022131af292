import io
import os

import numpy as np
import pytest

from mauvealigner_tpu.genome.sequence import Genome, revcomp_ascii
from mauvealigner_tpu.models.repeatoire import (
    Repeatoire,
    RepeatoireOptions,
    write_highest_stats,
    write_repeats_xmfa,
    write_repeats_xml,
)
from mauvealigner_tpu.utils import simulate


def _genome_with_repeats(rng, n_copies=3, unit_len=120, spacer=300, mutate=0):
    unit = simulate.random_genome(rng, unit_len).seq
    parts = [simulate.random_genome(rng, spacer).seq]
    for i in range(n_copies):
        copy = unit.copy()
        for _ in range(mutate):
            p = rng.integers(0, unit_len)
            copy[p] = ord("ACGT"[rng.integers(0, 4)])
        parts.append(copy)
        parts.append(simulate.random_genome(rng, spacer).seq)
    return Genome(np.concatenate(parts), name="reps"), unit


def test_exact_repeat_family_found(rng):
    g, unit = _genome_with_repeats(rng, n_copies=3, unit_len=150)
    r = Repeatoire(RepeatoireOptions(z=9))
    fams = r.find_repeats(g)
    assert fams, "no repeat families found"
    top = fams[0]
    assert top.multiplicity == 3
    # each component covers the full unit (possibly slightly extended)
    assert (top.component_lengths() >= 150).all()
    spans = top.spans()
    expected_lefts = [301, 751, 1201]
    for l in expected_lefts:
        assert any(abs(int(s[0]) - l) <= 5 for s in spans), (spans, expected_lefts)


def test_inverted_repeat_found(rng):
    unit = simulate.random_genome(rng, 150).seq
    g = Genome(
        np.concatenate(
            [
                simulate.random_genome(rng, 200).seq,
                unit,
                simulate.random_genome(rng, 200).seq,
                revcomp_ascii(unit),
                simulate.random_genome(rng, 200).seq,
            ]
        )
    )
    r = Repeatoire(RepeatoireOptions(z=9))
    fams = r.find_repeats(g)
    assert fams
    top = max(fams, key=lambda f: f.n_cols)
    assert top.multiplicity == 2
    signs = set(np.sign(top.starts).tolist())
    assert signs == {1, -1}


def test_only_direct_excludes_inverted(rng):
    unit = simulate.random_genome(rng, 150).seq
    g = Genome(
        np.concatenate(
            [
                unit,
                simulate.random_genome(rng, 200).seq,
                revcomp_ascii(unit),
            ]
        )
    )
    r = Repeatoire(RepeatoireOptions(z=9, only_direct=True))
    fams = r.find_repeats(g)
    for f in fams:
        assert (np.sign(f.starts) > 0).all()


def test_mutated_repeat_extension(rng):
    # two copies with a point mutation in the middle: gapped extension should
    # bridge through the mismatch to recover most of the unit
    g, unit = _genome_with_repeats(rng, n_copies=2, unit_len=200, mutate=2)
    r = Repeatoire(RepeatoireOptions(z=9))
    fams = r.find_repeats(g)
    assert fams
    top = max(fams, key=lambda f: f.n_cols)
    assert top.n_cols >= 150


def test_outputs(rng, tmp_path):
    g, _ = _genome_with_repeats(rng, n_copies=3, unit_len=120)
    fams = Repeatoire(RepeatoireOptions(z=9)).find_repeats(g)
    xmfa = str(tmp_path / "r.xmfa")
    write_repeats_xmfa(fams, g, xmfa)
    text = open(xmfa).read()
    assert text.count("=") >= len(fams)
    buf = io.StringIO()
    write_repeats_xml(fams, g, buf)
    assert "<repeats" in buf.getvalue()
    buf2 = io.StringIO()
    write_highest_stats(fams, buf2)
    assert "multiplicity" in buf2.getvalue()


def test_zero_extension_rounds_matches_no_extend(rng):
    # max_extension_rounds=0 must behave like extend=False (the batched
    # wave loop once applied one extension before checking the cap)
    g, _ = _genome_with_repeats(rng, n_copies=3, unit_len=150)
    zero = Repeatoire(RepeatoireOptions(z=9, max_extension_rounds=0)).find_repeats(g)
    noext = Repeatoire(RepeatoireOptions(z=9, extend=False)).find_repeats(g)
    assert len(zero) == len(noext)
    for a, b in zip(zero, noext):
        assert np.array_equal(a.starts, b.starts)
        assert np.array_equal(a.aln, b.aln)


def test_novel_subsets(rng):
    # Y appears 4x; X appears 3x, with two X copies right-adjacent to two Y
    # copies.  With --novel-subsets the shared-component projection of Y
    # (multiplicity 2) is spawned as its own record
    # (processNovelSubsetMatches, src/repeatoire.cpp:1474-1608).
    Y = simulate.random_genome(rng, 300).seq
    X = simulate.random_genome(rng, 250).seq
    sp = lambda: simulate.random_genome(rng, 400).seq
    g = Genome(
        np.concatenate(
            [sp(), Y, X, sp(), Y, X, sp(), Y, sp(), Y, sp(), X, sp()]
        )
    )
    base = Repeatoire(RepeatoireOptions(z=9)).find_repeats(g)
    novel = Repeatoire(
        RepeatoireOptions(z=9, find_novel_subsets=True)
    ).find_repeats(g)

    def mult2_pairs(fams):
        return [
            f
            for f in fams
            if f.multiplicity == 2
            # spans near the two adjacent Y copies (left ends 401, 1351)
            and sorted(abs(int(s)) // 100 for s in f.starts) == [4, 13]
        ]

    assert not mult2_pairs(base)
    assert mult2_pairs(novel), [f.spans() for f in novel]


def test_repeatoire_cli(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    g, _ = _genome_with_repeats(rng, n_copies=3, unit_len=120)
    from mauvealigner_tpu.genome import write_fasta
    from mauvealigner_tpu.tools.cli import main

    write_fasta(g, "g.fa")
    rc = main(
        [
            "repeatoire",
            "--sequence=g.fa",
            "--z=9",
            "--output=reps.xmfa",
            "--xml=reps.xml",
            "--highest=procrast.highest",
        ]
    )
    assert rc == 0
    assert os.path.exists("reps.xmfa")
    assert os.path.exists("reps.xml")
    assert os.path.exists("procrast.highest")


def test_redundancy_removal_crops_overlaps(rng):
    # duplicated-chain scenario: multiple overlapping records of one family
    g, _ = _genome_with_repeats(rng, n_copies=4, unit_len=200, mutate=6)
    dup = Repeatoire(RepeatoireOptions(z=9, allow_redundant=True)).find_repeats(g)
    uniq = Repeatoire(RepeatoireOptions(z=9, allow_redundant=False)).find_repeats(g)

    def overclaim(fams):
        claimed = np.zeros(len(g) + 2, np.int32)
        for f in fams:
            for l, r in f.spans():
                claimed[l : r + 1] += 1
        return int(np.maximum(claimed - 1, 0).sum())

    # cropping is edge-only (reference :2596-2630): interior overlap may
    # survive, but total double-claimed territory must drop substantially
    assert overclaim(uniq) < overclaim(dup) * 0.5, (overclaim(uniq), overclaim(dup))
    # the family is still recovered
    assert uniq and uniq[0].multiplicity >= 4
    assert len(uniq) <= len(dup)


def test_redundancy_fully_subsumed_component_keeps_1bp_stub(rng):
    # a component entirely inside a higher-scoring family's territory is
    # cropped to a 1 bp stub at its genome-right end, never dropped
    # (CropLeft(Length-1), src/repeatoire.cpp:2607-2610)
    from mauvealigner_tpu.models.repeatoire import RepeatFamily

    g = simulate.random_genome(rng, 500)
    rep = Repeatoire(RepeatoireOptions(z=9))
    winner = RepeatFamily(
        np.array([101, 301], np.int64), np.ones((2, 50), bool), score=1000.0
    )
    # loser's first component [111,130] sits fully inside winner's [101,150];
    # second component [401,420] is untouched
    loser = RepeatFamily(
        np.array([111, 401], np.int64), np.ones((2, 20), bool), score=10.0
    )
    out = rep._remove_redundancy(g, [winner, loser])
    assert len(out) == 2
    cropped = out[1]
    assert cropped.multiplicity == 2  # row kept
    spans = cropped.spans()
    assert tuple(spans[0]) == (130, 130)  # 1 bp stub at genome-right end
    assert tuple(spans[1]) == (401, 420)  # untouched component intact

    # same for a reverse-strand fully-subsumed component
    loser_rc = RepeatFamily(
        np.array([-111, 401], np.int64), np.ones((2, 20), bool), score=10.0
    )
    out = rep._remove_redundancy(g, [winner, loser_rc])
    spans = out[1].spans()
    assert tuple(spans[0]) == (130, 130)
    assert out[1].starts[0] == -130


def test_tandem_detection_and_filter(rng):
    # tandem: back-to-back copies with no spacer
    unit = simulate.random_genome(rng, 150).seq
    parts = [simulate.random_genome(rng, 400).seq] + [unit.copy() for _ in range(3)]
    parts.append(simulate.random_genome(rng, 400).seq)
    g = Genome(np.concatenate(parts), name="tandem")
    fams = Repeatoire(RepeatoireOptions(z=9)).find_repeats(g)
    assert any(f.tandem for f in fams), "tandem flag not set"
    filtered = Repeatoire(RepeatoireOptions(z=9, allow_tandem=False)).find_repeats(g)
    assert not any(f.tandem for f in filtered)


def test_two_hits_and_window_override(rng):
    g, _ = _genome_with_repeats(rng, n_copies=3, unit_len=150, mutate=4)
    base = Repeatoire(RepeatoireOptions(z=9)).find_repeats(g)
    th = Repeatoire(RepeatoireOptions(z=9, two_hits=True)).find_repeats(g)
    assert th  # still finds the chained family
    w0 = Repeatoire(RepeatoireOptions(z=9, window=0)).find_repeats(g)
    # window=0 forbids any flank extension: components never exceed their
    # chained extent, so total columns cannot exceed the default run's
    assert max(f.n_cols for f in w0) <= max(f.n_cols for f in base)


def test_min_sp_and_only_extended_filters(rng):
    g, _ = _genome_with_repeats(rng, n_copies=3, unit_len=150)
    all_f = Repeatoire(RepeatoireOptions(z=9)).find_repeats(g)
    top_score = max(f.score for f in all_f)
    strict = Repeatoire(
        RepeatoireOptions(z=9, min_sp_score=top_score - 1)
    ).find_repeats(g)
    assert all(f.score > top_score - 1 for f in strict)
    ext_only = Repeatoire(
        RepeatoireOptions(z=9, only_extended=True)
    ).find_repeats(g)
    seed_len = Repeatoire(RepeatoireOptions(z=9))
    for f in ext_only:
        assert f.n_cols > 9  # longer than any seed


def test_repeatoire_cli_extended_flags(rng, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    g, _ = _genome_with_repeats(rng, n_copies=3, unit_len=120)
    from mauvealigner_tpu.genome import write_fasta
    from mauvealigner_tpu.tools.cli import main

    write_fasta(g, "g.fa")
    rc = main(
        [
            "repeatoire",
            "--sequence=g.fa",
            "--z=9",
            "--allow-redundant=0",
            "--tandem=1",
            "--two-hits=1",
            "--sp=0",
            "--w=30",
            "--window=40",
            "--h=0.008",
            "--u=0.001",
            "--seeds=seeds.mln",
            "--score-out=scores.txt",
            "--xmfa=out.xmfa",
        ]
    )
    assert rc == 0
    assert os.path.exists("out.xmfa")
    assert os.path.exists("seeds.mln")
    assert os.path.exists("scores.txt")
    assert os.path.exists("procrast.highest")  # reference default stat file
    assert "#procrastAlignment" in open("scores.txt").read()


def test_chain_seed_counts(rng):
    """chain_seed_matches reports the number of seed windows per chained
    match (chained_matches.size() analog): a repeat of exactly seed length
    chains 1 window; a longer one chains L-z+1."""
    from mauvealigner_tpu.seeds import get_seed

    z = 9
    r = Repeatoire(RepeatoireOptions(z=z))
    slen = get_seed(z, 0).length  # spaced seed: window length > weight
    unit_long = simulate.random_genome(rng, slen + 31).seq
    unit_short = simulate.random_genome(rng, slen).seq
    g = Genome(
        np.concatenate(
            [
                simulate.random_genome(rng, 200).seq,
                unit_long,
                simulate.random_genome(rng, 200).seq,
                unit_long,
                simulate.random_genome(rng, 200).seq,
                unit_short,
                simulate.random_genome(rng, 200).seq,
                unit_short,
                simulate.random_genome(rng, 200).seq,
            ]
        )
    )
    ml = r.seed_matches(g)
    ml2, counts = r.chain_seed_matches(ml, g)
    assert len(counts) == len(ml2)
    # the slen+31 bp unit chains 32 windows (maximal extension may grow
    # the final length, but the chained window count is fixed pre-extension)
    assert max(counts) >= 32
    # some match carries a single-window chain (the seed-length unit; its
    # extended length may exceed z, but its count stays 1)
    assert min(counts) == 1


def test_two_hits_gates_extension_by_seed_count(rng):
    """--two-hits must gate on the chained seed-window count, not on the
    post-extension length: a single-seed match grown past seed length by
    maximal extension is still a one-hit record."""
    z = 9
    r = Repeatoire(RepeatoireOptions(z=z, two_hits=True))
    g, _ = _genome_with_repeats(rng, n_copies=2, unit_len=150)
    ml = r.seed_matches(g)
    ml2, counts = r.chain_seed_matches(ml, g)
    fams = r.build_families(g, ml2, counts)
    for f in fams:
        assert f.seed_count >= 1
    # at least one family from the 150bp unit chains many windows
    assert any(f.seed_count > 1 for f in fams)


def test_sp_score_projects_both_gap_columns(rng):
    """A both-gap column inside one component's gap run must not split the
    run into two gap opens (pairwise-projection semantics)."""
    from mauvealigner_tpu.models.repeatoire import RepeatFamily

    g = Genome(simulate.random_genome(rng, 100).seq)
    r = Repeatoire(RepeatoireOptions())
    # 3 components, 10 columns; component 2 gapped at cols 4-6, component 1
    # gapped at col 5 only (the both-gap column vs component 2)
    aln = np.ones((3, 10), bool)
    aln[2, 4:7] = False
    aln[1, 5] = False
    starts = np.array([1, 30, 60], np.int64)
    fam = RepeatFamily(starts, aln)
    o = r.options
    score = r.sp_score(g, fam)
    # recompute by hand with explicit projection per pair
    from mauvealigner_tpu.analysis import sp as sp_mod
    from mauvealigner_tpu.ops import dp

    k = 3
    col_codes = np.full((3, 10), 5, np.int8)
    lens = fam.component_lengths()
    for i in range(3):
        codes = g.sub_codes_signed(int(starts[i]), int(lens[i]))
        col_codes[i, aln[i]] = np.minimum(codes, 4)
    expect = 0.0
    for i in range(k):
        for j in range(i + 1, k):
            a, b = col_codes[i], col_codes[j]
            keep = ~((a == 5) & (b == 5))
            a, b = a[keep], b[keep]
            both = (a < 5) & (b < 5)
            expect += float(dp.HOXD70[a[both], b[both]].sum())
            for gvec in (a == 5, b == 5):
                if gvec.any():
                    d = np.diff(np.concatenate([[0], gvec.view(np.int8), [0]]))
                    expect += int((d == 1).sum()) * o.gap_open
                    expect += int(gvec.sum()) * o.gap_extend
    assert score == pytest.approx(expect)
    # pair (1,2): one gap run in each sequence after projection -> exactly
    # two opens among them, not three


def test_chainable_cols_reference_segment_semantics():
    # reference ExtendMatch chaining (src/repeatoire.cpp:2166-2189): the
    # backbone segment nearest the record decides — chain iff it has full
    # multiplicity; <2-member junk never blocks; a subset segment does.
    from mauvealigner_tpu.models.repeatoire import Repeatoire

    cc = Repeatoire._chainable_cols
    aln = np.ones((3, 10), bool)
    full = np.ones((3, 10), bool)
    # full homology -> whole extension chains
    assert cc(aln, full) == 10
    # nearest segment is full-multiplicity behind 3 junk columns -> the
    # junk rides along as inter-chain fill
    h = np.ones((3, 10), bool)
    h[:, :3] = False
    h[0, :3] = True  # single homologous component = not a segment
    assert cc(aln, h) == 10
    # nearest segment is a 2-of-3 subset -> blocks chaining entirely
    h2 = np.ones((3, 10), bool)
    h2[2, :4] = False
    assert cc(aln, h2) == 0
    # full segment then subset tail: chain stops at the segment end
    h3 = np.ones((3, 10), bool)
    h3[2, 6:] = False
    assert cc(aln, h3) == 6
    # a posterior-homologous component with NO bases in the run doesn't
    # count toward segment multiplicity (copyRange drops empty components)
    aln2 = np.ones((3, 10), bool)
    aln2[2, :] = False
    assert cc(aln2, full) == 0
    # nothing homologous
    assert cc(aln, np.zeros((3, 10), bool)) == 0


def test_component_symbols_per_component_membership():
    from mauvealigner_tpu.models import repeatoire as rt
    from mauvealigner_tpu.analysis import backbone as bbmod

    # 3 components: 0 and 1 agree everywhere, 2 disagrees everywhere
    flanks = [np.zeros(8, np.int64), np.zeros(8, np.int64),
              np.full(8, 2, np.int64)]
    aln = np.ones((3, 8), bool)
    sym = rt._component_symbols(flanks, aln)
    assert (sym[0] == bbmod.SYM_MATCH).all()
    assert (sym[1] == bbmod.SYM_MATCH).all()
    assert (sym[2] == bbmod.SYM_TRANSVERSION).all()
    # gapped component columns are SYM_GAP
    aln2 = aln.copy()
    aln2[1, 3:5] = False
    sym2 = rt._component_symbols([flanks[0], np.zeros(6, np.int64), flanks[2]], aln2)
    assert (sym2[1, 3:5] == bbmod.SYM_GAP).all()


def test_component_symbols_batch_matches_single(rng):
    """The bucketed/slabbed batch classifier must reproduce
    _component_symbols exactly across ragged job shapes."""
    from mauvealigner_tpu.models import repeatoire as rt

    flanks_list, alns = [], []
    for _ in range(30):
        k = int(rng.integers(1, 9))
        T = int(rng.integers(0, 120))
        aln = rng.random((k, T)) < 0.7
        flanks = []
        for i in range(k):
            c = int(aln[i].sum())
            extra = int(rng.integers(0, 5))
            flanks.append(rng.integers(0, 6, size=c + extra).astype(np.int64))
        flanks_list.append(flanks)
        alns.append(aln)
    got = rt._component_symbols_batch(flanks_list, alns)
    for flanks, aln, g in zip(flanks_list, alns, got):
        want = rt._component_symbols(flanks, aln)
        assert np.array_equal(g, want), (aln.shape, g, want)


def test_novel_match_registration(rng):
    """A chain blocked by a subset-homologous segment must register that
    segment as a record of its own (use_novel_matches,
    src/repeatoire.cpp:2201-2221): two DIVERGED suffix copies (no shared
    exact seed), separated from the repeat unit by DISTINCT short junk
    spacers, are only discoverable through the blocking segment of the
    3-way extension — pairwise unit records are coverage-subsumed and the
    suffix pair itself is unseeded."""
    from mauvealigner_tpu.genome.sequence import Genome
    from mauvealigner_tpu.models.repeatoire import Repeatoire, RepeatoireOptions
    from mauvealigner_tpu.utils import simulate

    from mauvealigner_tpu.genome.sequence import encode_ascii

    unit = simulate.random_genome(rng, 300).seq
    y1 = simulate.random_genome(rng, 200).seq
    # substitute every 6th base: every weight-11 seed window provably hits a
    # substitution at a care position (no residue class mod 6 fits inside
    # the pattern's don't-care set), so y1/y2 share ZERO seeds, while the
    # 83% identity keeps them homologous to the extension HMM
    codes = encode_ascii(y1)
    sub = np.arange(3, len(codes), 6)
    codes2 = codes.copy()
    codes2[sub] = (codes2[sub] + 1) % 4
    y2 = np.frombuffer("ACGT".encode(), np.uint8)[codes2]
    junk1 = simulate.random_genome(rng, 20).seq
    junk2 = simulate.random_genome(rng, 20).seq
    parts = [
        simulate.random_genome(rng, 3000).seq,
        unit.copy(), junk1, y1,
        simulate.random_genome(rng, 3000).seq,
        unit.copy(), junk2, y2,
        simulate.random_genome(rng, 3000).seq,
        unit.copy(),
        simulate.random_genome(rng, 3000).seq,
    ]
    g = Genome(np.concatenate(parts), name="planted")
    y1_start = 3000 + 300 + 20 + 1
    y2_start = y1_start + 200 + 3000 + 300 + 20

    y1_mid, y2_mid = y1_start + 100, y2_start + 100

    def covers_y(fams):
        # the registered record may chain back over the unit, so test that
        # BOTH diverged suffixes are covered by one family's components
        for f in fams:
            spans = f.spans()
            hit1 = any(l <= y1_mid <= r for l, r in spans)
            hit2 = any(l <= y2_mid <= r for l, r in spans)
            if hit1 and hit2:
                return True
        return False

    base = dict(z=11, min_length=30)
    with_novel = Repeatoire(RepeatoireOptions(**base)).find_repeats(g)
    without = Repeatoire(
        RepeatoireOptions(use_novel_matches=False, **base)
    ).find_repeats(g)
    assert not covers_y(without), "suffix visible without novels: test construction broke"
    assert covers_y(with_novel), "novel-match registration failed to surface the suffix pair"
