import numpy as np
import pytest

from mauvealigner_tpu.core.match import MatchList
from mauvealigner_tpu.core.sml import build_sml
from mauvealigner_tpu.genome.sequence import Genome, revcomp_ascii
from mauvealigner_tpu.ops import matchops
from mauvealigner_tpu.seeds import SOLID_SEED, get_seed


def _mk(seqs):
    return [Genome.from_string(s, name=f"g{i}") for i, s in enumerate(seqs)]


def _find(genomes, seed, **kw):
    smls = [build_sml(g, seed) for g in genomes]
    return matchops.find_multi_mums(genomes, smls, **kw)


def test_exact_copy_single_mum(make_dna):
    seed = get_seed(9, SOLID_SEED)
    s = make_dna(400)
    genomes = _mk([s, s])
    ml = _find(genomes, seed)
    # identical sequences: ideally one full-length MUM
    assert len(ml) >= 1
    best = np.argmax(ml.lengths)
    assert ml.lengths[best] == 400
    assert ml.starts[best, 0] == 1 and ml.starts[best, 1] == 1


def test_shared_block_found(make_dna):
    seed = get_seed(9, SOLID_SEED)
    block = make_dna(120)
    a = make_dna(200) + block + make_dna(150)
    b = make_dna(80) + block + make_dna(300)
    ml = _find(_mk([a, b]), seed)
    hit = (ml.starts[:, 0] == 201) & (ml.starts[:, 1] == 81) & (ml.lengths >= 120)
    assert hit.any()


def test_reverse_strand_block(make_dna):
    seed = get_seed(9, 0)
    block = make_dna(150)
    rc = revcomp_ascii(np.frombuffer(block.encode(), np.uint8)).tobytes().decode()
    a = make_dna(100) + block + make_dna(100)
    b = make_dna(50) + rc + make_dna(60)
    ml = _find(_mk([a, b]), seed)
    # expect a reverse-strand match covering the block: seq0 forward region
    # [101,250], seq1 reverse region [51,200]; maximal extension may add a
    # few chance columns into the random flanks.
    l0, r0 = np.abs(ml.starts[:, 0]), np.abs(ml.starts[:, 0]) + ml.lengths - 1
    l1, r1 = np.abs(ml.starts[:, 1]), np.abs(ml.starts[:, 1]) + ml.lengths - 1
    hit = (
        (ml.starts[:, 0] > 0)
        & (ml.starts[:, 1] < 0)
        & (l0 <= 101) & (r0 >= 250)
        & (l1 <= 51) & (r1 >= 200)
    )
    assert hit.any(), f"{ml.starts[ml.lengths >= 100]}, lens {ml.lengths[ml.lengths >= 100]}"


def test_three_way_mum(make_dna):
    seed = get_seed(9, SOLID_SEED)
    block = make_dna(100)
    gs = _mk([make_dna(60) + block + make_dna(40),
              block + make_dna(90),
              make_dna(30) + block])
    ml = _find(gs, seed)
    hit = (
        (ml.starts[:, 0] == 61)
        & (ml.starts[:, 1] == 1)
        & (ml.starts[:, 2] == 31)
        & (ml.lengths >= 100)
    )
    assert hit.any()
    # n-way filter keeps it
    ml3 = ml.multiplicity_filter(3)
    assert len(ml3) >= 1


def test_repeat_copy_excluded_in_unique_mode(make_dna):
    seed = get_seed(9, SOLID_SEED)
    block = make_dna(80)
    # block appears twice in genome a -> not unique there
    a = block + make_dna(50) + block
    b = make_dna(20) + block + make_dna(20)
    ml = _find(_mk([a, b]), seed)
    # no match may use the duplicated block region of sequence a
    for i in range(len(ml)):
        if ml.lengths[i] >= 80:
            assert ml.starts[i, 0] == 0 or abs(ml.starts[i, 0]) > 80


def test_mutation_splits_mum(make_dna):
    seed = get_seed(9, SOLID_SEED)
    s = make_dna(300)
    mutated = s[:150] + ("A" if s[150] != "A" else "C") + s[151:]
    ml = _find(_mk([s, mutated]), seed)
    lens = sorted(ml.lengths.tolist(), reverse=True)
    assert lens[0] <= 151
    assert len(ml) >= 2


def test_repeat_matches_single_genome(make_dna):
    seed = get_seed(9, SOLID_SEED)
    unit = make_dna(60)
    g = Genome.from_string(make_dna(40) + unit + make_dna(70) + unit + make_dna(40))
    sml = build_sml(g, seed)
    groups = matchops.build_seed_groups([sml])
    ml = matchops.repeat_matches_from_groups(groups, seed.length, min_multi=2)
    assert len(ml) > 0
    assert (ml.multiplicity() >= 2).all()


def test_matchlist_crop_invert():
    ml = MatchList(np.array([[5, -10]]), np.array([20]))
    cl = ml.crop_left(np.array([3]))
    assert cl.starts[0, 0] == 8 and cl.starts[0, 1] == -10 and cl.lengths[0] == 17
    cr = ml.crop_right(np.array([4]))
    assert cr.starts[0, 0] == 5 and cr.starts[0, 1] == -14 and cr.lengths[0] == 16
    inv = ml.invert()
    assert inv.starts[0, 0] == -5 and inv.starts[0, 1] == 10


def test_merge_collinear_runs_interleaved_reference_windows():
    """Two diagonal runs whose reference-window ranges interleave (different
    component signatures) must each merge into ONE match: the run sort must
    be signature-primary, p0-secondary — p0-primary ordering alternates the
    rows and fragments both runs into per-window matches."""
    from mauvealigner_tpu.ops.matchops import merge_collinear_runs

    n_seqs, L = 3, 11
    rows, strands, refs = [], [], []
    # run A: genomes {0, 1}, ref genome 0, windows p0 = 10..15, same diagonal
    for p0 in range(10, 16):
        rows.append([p0, p0 + 100, -1])
        strands.append([0, 0, 0])
        refs.append(0)
    # run B: genomes {1, 2}, ref genome 1, windows p0 = 12..17 (interleaves A)
    for p0 in range(12, 18):
        rows.append([-1, p0, p0 + 200])
        strands.append([0, 0, 0])
        refs.append(1)
    ml = merge_collinear_runs(
        np.array(rows, np.int64),
        np.array(strands, np.int32),
        np.array(refs, np.int64),
        L,
    )
    assert len(ml) == 2, f"expected 2 merged runs, got {len(ml)}"
    assert sorted(int(x) for x in ml.lengths) == [5 + L, 5 + L]
