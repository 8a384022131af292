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
