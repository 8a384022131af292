"""Determinism as a testability property (SURVEY.md §4.4): fixed seed 37,
stable sorts, and deterministic DP tie-breaking must make every pipeline
reproduce byte-identical outputs across runs (the reference pins
SetTwisterSeed(37), src/progressiveMauve.cpp:353-355)."""

import io

import numpy as np

from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.models.aligner import AlignerOptions, MauveAligner
from mauvealigner_tpu.models.progressive import ProgressiveMauve, ProgressiveOptions
from mauvealigner_tpu.models.repeatoire import Repeatoire, RepeatoireOptions, write_repeats_xmfa
from mauvealigner_tpu.utils import simulate


def _xmfa(ivl) -> str:
    buf = io.StringIO()
    ivl.write_xmfa(buf)
    return buf.getvalue()


def _pair(rng, n=20000):
    anc = simulate.random_genome(rng, n)
    der, _ = simulate.evolve(anc, rng, sub_rate=0.02, ins_rate=0.001, del_rate=0.001)
    c = der.codes.copy()
    c[8000:12000] = (3 - c[8000:12000])[::-1]
    der = Genome(np.frombuffer(b"ACGTN", np.uint8)[np.minimum(c, 4)], name="der")
    return [anc, der]


def test_mauve_aligner_deterministic(rng):
    genomes = _pair(rng)
    runs = [
        _xmfa(MauveAligner(AlignerOptions(seed_size=11, use_sml_cache=False))
              .align(genomes).interval_list)
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


def test_progressive_deterministic(rng):
    genomes = _pair(rng)
    runs = []
    for _ in range(2):
        res = ProgressiveMauve(
            ProgressiveOptions(seed_weight=11, use_sml_cache=False)
        ).align(genomes)
        runs.append(
            _xmfa(res.interval_list)
            + "|"
            + repr([r.tolist() for r in res.backbone_rows])
        )
    assert runs[0] == runs[1]


def test_repeatoire_deterministic(rng):
    unit = simulate.random_genome(rng, 200).seq
    parts = [simulate.random_genome(rng, 400).seq]
    for _ in range(3):
        parts.append(unit.copy())
        parts.append(simulate.random_genome(rng, 400).seq)
    g = Genome(np.concatenate(parts), name="reps")
    runs = []
    for _ in range(2):
        fams = Repeatoire(RepeatoireOptions(z=9)).find_repeats(g)
        buf = io.StringIO()
        write_repeats_xmfa(fams, g, buf)
        runs.append(buf.getvalue())
    assert runs[0] == runs[1]
