import io

import numpy as np
import pytest

from mauvealigner_tpu.genome import (
    Genome,
    read_fasta,
    write_fasta,
    read_genbank,
)
from mauvealigner_tpu.genome.fasta import read_fasta_records
from mauvealigner_tpu.genome.sequence import (
    CODE_N,
    encode_ascii,
    revcomp_ascii,
    transpose_positions,
)


def test_encode_decode_roundtrip():
    g = Genome.from_string("ACGTacgtNRYX")
    assert list(g.codes[:8]) == [0, 1, 2, 3, 0, 1, 2, 3]
    assert all(c == CODE_N for c in g.codes[8:])


def test_revcomp():
    seq = np.frombuffer(b"ACGTN", dtype=np.uint8)
    assert revcomp_ascii(seq).tobytes() == b"NACGT"


def test_subseq_signed():
    g = Genome.from_string("AACCGGTT")
    assert g.subseq_signed(3, 4) == "CCGG"
    assert g.subseq_signed(-3, 4) == "CCGG"  # palindromic region
    assert g.subseq_signed(-1, 4) == "GGTT"  # revcomp of AACC


def test_fasta_roundtrip(tmp_path):
    path = str(tmp_path / "x.fa")
    with open(path, "w") as fh:
        fh.write(">c1 first contig\nACGT\nACGT\n>c2\nTTTT\n")
    g = read_fasta(path)
    assert len(g) == 12
    assert [c.name for c in g.contigs] == ["c1 first contig", "c2"]
    assert g.global_to_local(9) == (1, 1)
    assert g.local_to_global(1, 4) == 12
    out = io.StringIO()
    write_fasta(g, out)
    g2 = read_fasta(io.StringIO(out.getvalue()))
    assert g2.to_string() == g.to_string()


def test_fasta_records():
    recs = read_fasta_records(io.StringIO(">a\nACGT\n>b\nGGGG\n"))
    assert len(recs) == 2
    assert recs[1].to_string() == "GGGG"


def test_mask_n_runs_and_transpose():
    g = Genome.from_string("ACGT" + "N" * 20 + "TTTTCCCC" + "N" * 15 + "GGGG")
    masked, regions = g.mask_n_runs(min_run=10)
    assert masked.to_string() == "ACGTTTTTCCCCGGGG"
    assert regions.shape == (2, 2)
    # a match at masked position 5 (the first T) maps back to original 25
    pos = np.array([5, -5, 13, 1])
    out = transpose_positions(pos, np.array([4, 4, 4, 4]), regions)
    assert out[0] == 25
    assert out[1] == -25
    assert out[2] == 13 + 35
    assert out[3] == 1


def test_genbank_minimal():
    gbk = """LOCUS       TEST                  24 bp    DNA     circular BCT 01-JAN-2000
FEATURES             Location/Qualifiers
     source          1..24
     CDS             complement(4..9)
                     /gene="abc"
                     /product="test protein"
     gene            10..15
                     /locus_tag="t1"
ORIGIN
        1 acgtacgtac gtacgtacgt acgt
//
"""
    g = read_genbank(io.StringIO(gbk))
    assert len(g) == 24
    cds = [f for f in g.features if f.kind == "CDS"]
    assert len(cds) == 1
    assert (cds[0].start, cds[0].end, cds[0].strand) == (4, 9, -1)
    assert cds[0].qualifiers["gene"] == "abc"
    assert g.to_string().startswith("acgtacgt")


def test_transpose_coordinates_splits_spanning_matches():
    # a match crossing a removed N-run junction must be split, not shifted
    # whole (it would otherwise claim the removed bases as aligned)
    from mauvealigner_tpu.core.match import MatchList
    from mauvealigner_tpu.tools.manipulate import transpose_coordinates

    # removed region in seq 0 only: original positions 11..30 (20 Ns);
    # masked coords are contiguous, junction at masked position 11
    regions = np.array([[11, 20]], np.int64)
    empty = np.zeros((0, 2), np.int64)
    ml = MatchList(
        np.array([[5, 5], [8, -8]], np.int64),  # second row: reverse comp in seq 1
        np.array([4, 8], np.int64),
    )
    out = transpose_coordinates(ml, [regions, empty])
    # row 0: [5..8] doesn't cross the junction -> unchanged
    assert (out.starts[0] == [5, 5]).all() and out.lengths[0] == 4
    # row 1: seq0 [8..15] crosses at 11 -> split at match offset 3:
    # [8..10] unshifted and [11..15] shifted by 20; the seq-1 reverse
    # component splits consistently (genome-left 13 for the match-left
    # segment, 8 for the match-right one)
    assert len(out) == 3
    rows = {tuple(out.starts[i]) + (int(out.lengths[i]),) for i in range(1, 3)}
    assert rows == {(8, -13, 3), (31, -8, 5)}


def test_fasta_interior_whitespace_matches_native(tmp_path):
    # interior whitespace in sequence lines must be dropped identically by
    # the python fallback and the native parser
    from mauvealigner_tpu import native
    from mauvealigner_tpu.genome.fasta import read_fasta

    p = str(tmp_path / "ws.fa")
    with open(p, "w") as fh:
        fh.write(">c1\nACGT ACGT\nTT TT\n")
    g_native = read_fasta(p)
    saved = native._module, native._tried
    native._module, native._tried = None, True
    try:
        g_py = read_fasta(p)
    finally:
        native._module, native._tried = saved
    assert g_native.to_string() == g_py.to_string() == "ACGTACGTTTTT"


def test_genbank_keyword_after_features_and_wrapped_qualifier(tmp_path):
    from mauvealigner_tpu.genome.genbank import read_genbank

    text = (
        "LOCUS       rec1 24 bp DNA\n"
        "FEATURES             Location/Qualifiers\n"
        "     CDS             1..12\n"
        '                     /product="hypothetical\n'
        '                     protein"\n'
        "CONTIG      join(XX01000001.1:1..2500000)\n"
        "ORIGIN\n"
        "        1 acgtacgtac gtacgtacgt acgt\n"
        "//\n"
    )
    p = str(tmp_path / "a.gbk")
    with open(p, "w") as fh:
        fh.write(text)
    g = read_genbank(p)
    assert len(g.features) == 1
    feat = g.features[0]
    assert (feat.start, feat.end) == (1, 12)  # CONTIG line must not extend it
    assert feat.qualifiers["product"] == "hypothetical protein"


def test_sml_cache_scratch_path_roundtrip(tmp_path):
    import os

    from mauvealigner_tpu.core import sml as sml_mod
    from mauvealigner_tpu.seeds import get_seed
    from mauvealigner_tpu.utils import simulate

    rng = np.random.default_rng(37)
    g = simulate.random_genome(rng, 3000)
    seed = get_seed(9, 0)
    # unwritable sequence "directory": a path that does not exist (chmod
    # tricks don't work under root)
    scratch = tmp_path / "scratch"
    scratch.mkdir()
    g.filename = str(tmp_path / "no_such_dir" / "g.fa")
    saved_paths = list(sml_mod._temp_paths)
    try:
        sml_mod._temp_paths[:] = [str(scratch)]
        s1 = sml_mod.load_sml(g, seed)
        cache_files = list(scratch.iterdir())
        assert cache_files, "cache not written to scratch path"
        mtime = cache_files[0].stat().st_mtime
        s2 = sml_mod.load_sml(g, seed)  # must READ the scratch cache
        assert cache_files[0].stat().st_mtime == mtime
        assert np.array_equal(s1.keys, s2.keys)
    finally:
        sml_mod._temp_paths[:] = saved_paths
