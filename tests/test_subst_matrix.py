"""--substitution-matrix reader and plumbing (readSubstitutionMatrix parity,
src/progressiveMauve.cpp:666-687)."""

import numpy as np
import pytest

from mauvealigner_tpu.ops.dp import HOXD70, read_substitution_matrix

NCBI_HOXD = """\
# HOXD70-style file with ambiguity column
   A    C    G    T    N
A   91 -114  -31 -123  -44
C -114  100 -125  -31  -44
G  -31 -125  100 -114  -44
T -123  -31 -114   91  -44
N  -44  -44  -44  -44  -44
"""


def test_reads_ncbi_format(tmp_path):
    f = tmp_path / "m.txt"
    f.write_text(NCBI_HOXD)
    m = read_substitution_matrix(str(f))
    assert m.shape == (5, 5)
    assert np.array_equal(m, HOXD70)


def test_missing_ambiguity_defaults_to_worst_mismatch(tmp_path):
    f = tmp_path / "m.txt"
    f.write_text("  A  C  G  T\nA 5 -4 -4 -4\nC -4 5 -4 -4\nG -4 -4 5 -4\nT -4 -4 -4 5\n")
    m = read_substitution_matrix(str(f))
    assert m[4, 4] == -4
    assert m[0, 4] == -4


def test_extra_symbols_fold_to_minimum(tmp_path):
    # two ambiguity-ish columns: the harsher score wins for column 4
    f = tmp_path / "m.txt"
    f.write_text(
        "  A  C  G  T  N  X\n"
        "A 5 -4 -4 -4 -1 -9\nC -4 5 -4 -4 -1 -9\n"
        "G -4 -4 5 -4 -1 -9\nT -4 -4 -4 5 -1 -9\n"
        "N -1 -1 -1 -1 -1 -9\nX -9 -9 -9 -9 -9 -9\n"
    )
    m = read_substitution_matrix(str(f))
    assert m[0, 4] == -9
    assert m[4, 4] == -9


def test_missing_acgt_raises(tmp_path):
    f = tmp_path / "m.txt"
    f.write_text("  A  C  G\nA 5 -4 -4\nC -4 5 -4\nG -4 -4 5\n")
    with pytest.raises(ValueError):
        read_substitution_matrix(str(f))
