"""Native C++ host runtime: build, bind, and cross-validate vs numpy paths."""

import numpy as np
import pytest

from mauvealigner_tpu import native
from mauvealigner_tpu.core.match import MatchList
from mauvealigner_tpu.genome.sequence import encode_ascii, revcomp_ascii


@pytest.fixture(scope="module")
def mod():
    m = native.get()
    if m is None:
        pytest.skip("native toolchain unavailable")
    return m


def test_parse_fasta(mod):
    data = b">c1 desc\nACGT\nacgt\n>c2\nNNNN\nTT\n"
    seq, contigs = mod.parse_fasta(data)
    assert seq == b"ACGTacgtNNNNTT"
    assert contigs == [("c1 desc", 8), ("c2", 6)]


def test_encode_matches_numpy(mod, rng):
    raw = bytes(rng.integers(33, 126, size=500, dtype=np.uint8))
    a = np.frombuffer(mod.encode(raw), np.uint8)
    b = encode_ascii(np.frombuffer(raw, np.uint8))
    assert np.array_equal(a, b)


def test_revcomp_matches_numpy(mod):
    raw = b"ACGTURYKMBVDHacgtnN"
    a = np.frombuffer(mod.revcomp(raw), np.uint8)
    b = revcomp_ascii(np.frombuffer(raw, np.uint8))
    assert np.array_equal(a, b)


def test_extend_matches_native_vs_numpy(mod, rng):
    from mauvealigner_tpu.ops import matchops

    # construct genomes with a shared block and check both paths agree
    block = rng.integers(0, 4, size=200)
    a = np.concatenate([rng.integers(0, 4, size=100), block, rng.integers(0, 4, size=100)])
    rc = (3 - block)[::-1]
    b = np.concatenate([rng.integers(0, 4, size=50), rc, rng.integers(0, 4, size=60)])
    # seed matches strictly inside the block: for a-start p and length L the
    # consistent rc b-start is q = 352 - p - L (see block/rc construction)
    ml = MatchList(
        np.array([[131, -201], [151, -181]], np.int64),
        np.array([20, 20], np.int64),
    )
    native_result = matchops.extend_matches_maximal(ml, [a.astype(np.uint8), b.astype(np.uint8)])

    # force the numpy path
    saved = native._module, native._tried
    native._module, native._tried = None, True
    try:
        numpy_result = matchops.extend_matches_maximal(ml, [a.astype(np.uint8), b.astype(np.uint8)])
    finally:
        native._module, native._tried = saved

    na = np.concatenate([native_result.starts, native_result.lengths[:, None]], axis=1)
    nb = np.concatenate([numpy_result.starts, numpy_result.lengths[:, None]], axis=1)
    assert set(map(tuple, na.tolist())) == set(map(tuple, nb.tolist()))
    # both recover the full 200bp block
    assert (native_result.lengths >= 200).any()


def test_eliminate_overlaps_native_vs_numpy(mod, rng):
    # random overlapping match tables, mixed strands and absent components
    for trial in range(20):
        n = int(rng.integers(2, 40))
        n_seqs = int(rng.integers(2, 5))
        starts = np.zeros((n, n_seqs), np.int64)
        for j in range(n_seqs):
            pos = rng.integers(1, 500, size=n)
            sign = rng.choice([-1, 1], size=n)
            absent = rng.random(n) < 0.2
            starts[:, j] = np.where(absent, 0, sign * pos)
        # every row needs multiplicity >= 1
        starts[starts.sum(axis=1) == 0, 0] = 7
        lengths = rng.integers(5, 80, size=n).astype(np.int64)
        ml = MatchList(starts, lengths)

        native_result = ml.eliminate_overlaps()
        saved = native._module, native._tried
        native._module, native._tried = None, True
        try:
            numpy_result = ml.eliminate_overlaps()
        finally:
            native._module, native._tried = saved
        assert np.array_equal(native_result.starts, numpy_result.starts), trial
        assert np.array_equal(native_result.lengths, numpy_result.lengths), trial


def test_read_fasta_native_path(tmp_path, mod):
    path = str(tmp_path / "x.fa")
    with open(path, "w") as fh:
        fh.write(">c1\nACGTACGT\n>c2\nTTTT\n")
    from mauvealigner_tpu.genome import read_fasta

    g = read_fasta(path)
    assert g.to_string() == "ACGTACGTTTTT"
    assert [c.name for c in g.contigs] == ["c1", "c2"]
    assert g.global_to_local(9) == (1, 1)
