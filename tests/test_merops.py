import numpy as np
import pytest

from mauvealigner_tpu.core.sml import build_sml, load_sml
from mauvealigner_tpu.genome.sequence import Genome, revcomp_ascii
from mauvealigner_tpu.ops import merops
from mauvealigner_tpu.seeds import SOLID_SEED, get_seed


def brute_force_canonical(seq: str, pattern: str):
    """Reference implementation: canonical spaced mer per window."""
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    L = len(pattern)
    offs = [i for i, c in enumerate(pattern) if c == "1"]
    out = []
    for i in range(len(seq) - L + 1):
        win = seq[i : i + L]
        rc_win = "".join(comp.get(c, "N") for c in reversed(win))
        fwd = 0
        rc = 0
        bad = False
        for o in offs:
            if win[o] not in code or rc_win[o] not in code:
                bad = True
                break
            fwd = fwd * 4 + code[win[o]]
            rc = rc * 4 + code[rc_win[o]]
        if bad:
            out.append(None)
        else:
            out.append((min(fwd, rc) << 1) | (1 if rc < fwd else 0))
    return out


@pytest.mark.parametrize("rank", [0, SOLID_SEED])
def test_pack_canonical_vs_bruteforce(make_dna, rank):
    seed = get_seed(7, rank)
    seq = make_dna(300)
    g = Genome.from_string(seq)
    codes = merops.pad_codes(g.codes.astype(np.int32), seed.length, pad_to_multiple=512)
    keys = np.asarray(
        merops.pack_canonical_mers(
            codes, tuple(int(o) for o in seed.offsets), seed.length
        )
    )
    expected = brute_force_canonical(seq, seed.pattern)
    for i, e in enumerate(expected):
        assert keys[i] == e, f"window {i}: {keys[i]} != {e}"
    # padding windows are invalid
    assert (keys[len(expected) :] == merops.INVALID_KEY).all()


def test_canonical_strand_symmetry(make_dna):
    """A genome and its reverse complement share the same canonical mer set."""
    seed = get_seed(9, 0)
    seq = make_dna(500)
    rc = revcomp_ascii(np.frombuffer(seq.encode(), np.uint8)).tobytes().decode()
    sml_f = build_sml(Genome.from_string(seq), seed)
    sml_r = build_sml(Genome.from_string(rc), seed)
    assert np.array_equal(sml_f.keys >> 1, sml_r.keys >> 1)
    # strand bits complement each other mer-by-mer after sorting
    assert np.array_equal(np.sort(sml_f.keys >> 1), np.sort(sml_r.keys >> 1))


def test_build_sml_sorted_and_valid(make_dna):
    seed = get_seed(11, 0)
    seq = make_dna(2000) + "N" * 5 + "ACGT" * 10
    sml = build_sml(Genome.from_string(seq), seed)
    assert (np.diff(sml.keys) >= 0).all()
    assert len(sml.keys) <= len(seq) - seed.length + 1
    assert sml.positions.max() <= len(seq) - seed.length


def test_unique_mer_count(make_dna):
    seed = get_seed(5, SOLID_SEED)
    seq = make_dna(300)
    g = Genome.from_string(seq)
    sml = build_sml(g, seed)
    assert len(sml.keys) == 296
    # brute force: count canonical mers occurring exactly once
    from collections import Counter

    expected_counts = Counter(
        k >> 1 for k in brute_force_canonical(seq, seed.pattern) if k is not None
    )
    expected = sum(1 for v in expected_counts.values() if v == 1)
    assert sml.unique_mer_count() == expected


def test_sml_cache_roundtrip(tmp_path, make_dna):
    seed = get_seed(9, 0)
    fa = str(tmp_path / "g.fa")
    seq = make_dna(1000)
    with open(fa, "w") as fh:
        fh.write(">x\n" + seq + "\n")
    from mauvealigner_tpu.genome import read_fasta

    g = read_fasta(fa)
    s1 = load_sml(g, seed)
    import os

    assert os.path.exists(f"{fa}.{seed.pattern}.sslist.npz")
    s2 = load_sml(g, seed)
    assert np.array_equal(s1.keys, s2.keys)
    assert np.array_equal(s1.positions, s2.positions)
