"""Sequence evolution simulator with known-truth alignments.

The reference validates aligners against simulated genomes with known
correct alignments (scoreAlignment's "correct alignment" input,
src/scoreAlignment.cpp:102-113).  This module provides that simulator:
it evolves an ancestor by substitutions/indels/inversions and emits the
true pairwise alignment as an IntervalList (one interval per collinear
segment, strand-aware).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from mauvealigner_tpu.core.interval import Interval, IntervalList
from mauvealigner_tpu.genome.sequence import Genome, revcomp_ascii

_BASES = np.frombuffer(b"ACGT", np.uint8)


def random_genome(rng: np.random.Generator, n: int, name: str = "anc") -> Genome:
    return Genome(_BASES[rng.integers(0, 4, size=n)], name=name)


def evolve(
    ancestor: Genome,
    rng: np.random.Generator,
    sub_rate: float = 0.01,
    ins_rate: float = 0.002,
    del_rate: float = 0.002,
    mean_indel: float = 3.0,
    name: str = "der",
) -> Tuple[Genome, IntervalList]:
    """Evolve a collinear descendant; returns (derived, truth alignment).

    The truth IntervalList covers the two genomes [ancestor, derived] with a
    single collinear interval.
    """
    anc = ancestor.seq
    out: List[np.ndarray] = []
    row_a: List[np.ndarray] = []
    row_d: List[np.ndarray] = []
    i = 0
    n = len(anc)
    while i < n:
        r = rng.random()
        if r < del_rate:
            k = 1 + rng.poisson(mean_indel)
            k = min(k, n - i)
            row_a.append(np.ones(k, bool))
            row_d.append(np.zeros(k, bool))
            i += k
        elif r < del_rate + ins_rate:
            k = 1 + rng.poisson(mean_indel)
            ins = _BASES[rng.integers(0, 4, size=k)]
            out.append(ins)
            row_a.append(np.zeros(k, bool))
            row_d.append(np.ones(k, bool))
        else:
            base = anc[i]
            if rng.random() < sub_rate:
                base = _BASES[(np.searchsorted(_BASES, base) + rng.integers(1, 4)) % 4]
            out.append(np.array([base], np.uint8))
            row_a.append(np.ones(1, bool))
            row_d.append(np.ones(1, bool))
            i += 1
    derived = Genome(np.concatenate(out) if out else np.zeros(0, np.uint8), name=name)
    aln = np.stack([np.concatenate(row_a), np.concatenate(row_d)])
    iv = Interval(np.array([1, 1], np.int64), aln)
    truth = IntervalList(genomes=[ancestor, derived], intervals=[iv])
    return derived, truth


def apply_inversion(genome: Genome, left: int, right: int) -> Genome:
    """Return a copy with [left, right] (1-based inclusive) reverse-complemented."""
    seq = genome.seq.copy()
    seq[left - 1 : right] = revcomp_ascii(seq[left - 1 : right])
    return Genome(seq, name=genome.name + "_inv")
