"""Edge-case hardening: inputs that commonly crash alignment pipelines."""

import numpy as np
import pytest

from mauvealigner_tpu.genome.sequence import Contig, Genome
from mauvealigner_tpu.models.aligner import AlignerOptions, MauveAligner
from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
from mauvealigner_tpu.models.repeatoire import Repeatoire, RepeatoireOptions
from mauvealigner_tpu.utils import simulate


def test_n_heavy_genomes(rng):
    base = simulate.random_genome(rng, 1500)
    seq = base.seq.copy()
    seq[200:400] = ord("N")
    seq[900:950] = ord("N")
    a = Genome(seq, name="a")
    b = Genome(seq.copy(), name="b")
    res = MauveAligner(AlignerOptions(seed_size=11, use_sml_cache=False)).align([a, b])
    assert len(res.interval_list.intervals) >= 1
    # aligned columns exclude nothing structurally; N columns still tile
    for s in range(2):
        total = sum(
            int(iv.aln[s].sum())
            for iv in res.interval_list.intervals
            if iv.starts[s] != 0
        )
        assert total <= 1500


def test_tiny_genomes(rng):
    a = simulate.random_genome(rng, 60)
    b = Genome(a.seq.copy(), name="b")
    res = MauveAligner(AlignerOptions(seed_size=5, use_sml_cache=False)).align([a, b])
    assert len(res.mums) >= 1


def test_no_homology(rng):
    a = simulate.random_genome(rng, 800)
    b = simulate.random_genome(rng, 800)
    res = MauveAligner(AlignerOptions(seed_size=11, use_sml_cache=False)).align([a, b])
    # no shared content: no n-way LCBs (chance seeds are filtered by weight)
    assert len(res.lcbs) <= 1


def test_lowercase_input(rng):
    s = "".join(rng.choice(list("acgt"), size=600))
    a = Genome.from_string(s, name="a")
    b = Genome.from_string(s.upper(), name="b")
    res = MauveAligner(AlignerOptions(seed_size=9, use_sml_cache=False)).align([a, b])
    assert len(res.lcbs) == 1
    assert res.interval_list.intervals[0].n_cols == 600


def test_multi_contig_xmfa(rng, tmp_path):
    seq = simulate.random_genome(rng, 900)
    contigs = [Contig("c1", 400, 0), Contig("c2", 500, 400)]
    a = Genome(seq.seq.copy(), contigs=contigs, name="a")
    b = Genome(seq.seq.copy(), name="b")
    res = MauveAligner(AlignerOptions(seed_size=9, use_sml_cache=False)).align([a, b])
    out = str(tmp_path / "o.xmfa")
    res.interval_list.write_xmfa(out)
    text = open(out).read()
    assert "#FormatVersion Mauve1" in text
    # xmfa2maf splits at the contig boundary
    import io

    from mauvealigner_tpu.tools.convert import xmfa2maf

    buf = io.StringIO()
    xmfa2maf(res.interval_list, buf)
    assert buf.getvalue().count("a score=") >= 2


def test_repeatoire_no_repeats(rng):
    g = simulate.random_genome(rng, 2000)
    fams = Repeatoire(RepeatoireOptions(z=11)).find_repeats(g)
    # random sequence: no long repeat families
    assert all(f.n_cols < 60 for f in fams)


def test_progressive_two_identical(rng):
    a = simulate.random_genome(rng, 700)
    b = Genome(a.seq.copy(), name="b")
    res = ProgressiveMauve(
        ProgressiveOptions(seed_weight=9, use_sml_cache=False)
    ).align([a, b])
    multi = [iv for iv in res.interval_list.intervals if iv.multiplicity() == 2]
    assert sum(iv.n_cols for iv in multi) >= 690
