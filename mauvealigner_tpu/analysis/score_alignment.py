"""Alignment accuracy scoring against a known-correct alignment.

Reimplementation of the reference's scoreAlignment tool
(src/scoreAlignment.cpp:99-477), the dominant QA mechanism (SURVEY.md §4):
every aligned base pair of the correct alignment is classified TP/FN against
the calculated alignment, and every calculated pair not present in the
correct alignment is an FP; sensitivity = TP/(TP+FN), PPV = TP/(TP+FP).

Redesign: instead of the reference's per-column triple loop, each alignment
is converted into per-pair position maps (vectorized cumulative-sum ranks),
and classification is an elementwise comparison.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

from mauvealigner_tpu.core.interval import IntervalList


def _interval_positions(iv, seq: int) -> np.ndarray:
    """Signed 1-based genome position per alignment column (0 where gap)."""
    row = iv.aln[seq]
    s = int(iv.starts[seq])
    pos = np.zeros(iv.n_cols, np.int64)
    if s == 0 or not row.any():
        return pos
    rank = np.cumsum(row)
    length = int(rank[-1])
    left = abs(s)
    if s > 0:
        vals = left + rank - 1
    else:
        vals = -(left + length - rank)
    pos[row] = vals[row]
    return pos


def pair_position_maps(
    ivs: IntervalList, seq_lengths: Sequence[int]
) -> Dict[Tuple[int, int], np.ndarray]:
    """For each ordered pair (i<j): array of signed positions in j indexed by
    1-based position in i (0 = unaligned).  Sign encodes relative strand."""
    n = ivs.n_seqs
    maps = {
        (i, j): np.zeros(seq_lengths[i] + 1, np.int64)
        for i in range(n)
        for j in range(i + 1, n)
    }
    for iv in ivs.intervals:
        pres = [iv.starts[s] != 0 for s in range(iv.n_seqs)]
        pos_cache = {}
        for i in range(iv.n_seqs):
            if pres[i]:
                pos_cache[i] = _interval_positions(iv, i)
        for i in range(iv.n_seqs):
            if not pres[i]:
                continue
            for j in range(i + 1, iv.n_seqs):
                if not pres[j]:
                    continue
                pi, pj = pos_cache[i], pos_cache[j]
                both = (pi != 0) & (pj != 0)
                keys = np.abs(pi[both])
                # signed value: positive when both on same strand
                vals = np.where(np.sign(pi[both]) == np.sign(pj[both]), 1, -1) * np.abs(
                    pj[both]
                )
                maps[(i, j)][keys] = vals
    return maps


@dataclasses.dataclass
class PairScore:
    tp: int
    fn: int
    fp: int

    @property
    def sensitivity(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else 1.0

    @property
    def ppv(self) -> float:
        d = self.tp + self.fp
        return self.tp / d if d else 1.0


@dataclasses.dataclass
class AlignmentScore:
    pairs: Dict[Tuple[int, int], PairScore]

    @property
    def sensitivity(self) -> float:
        tp = sum(p.tp for p in self.pairs.values())
        fn = sum(p.fn for p in self.pairs.values())
        return tp / (tp + fn) if tp + fn else 1.0

    @property
    def ppv(self) -> float:
        tp = sum(p.tp for p in self.pairs.values())
        fp = sum(p.fp for p in self.pairs.values())
        return tp / (tp + fp) if tp + fp else 1.0

    def summary(self) -> str:
        return (
            f"Sensitivity: {self.sensitivity:.6f}\n"
            f"PPV: {self.ppv:.6f}\n"
            + "".join(
                f"pair {i},{j}: sn={p.sensitivity:.4f} ppv={p.ppv:.4f} "
                f"(tp={p.tp} fn={p.fn} fp={p.fp})\n"
                for (i, j), p in sorted(self.pairs.items())
            )
        )


def score_alignment(
    correct: IntervalList, calculated: IntervalList, seq_lengths: Sequence[int]
) -> AlignmentScore:
    cmaps = pair_position_maps(correct, seq_lengths)
    amaps = pair_position_maps(calculated, seq_lengths)
    pairs = {}
    for key in cmaps:
        c = cmaps[key]
        a = amaps.get(key, np.zeros_like(c))
        truth = c != 0
        pred = a != 0
        tp = int(np.sum(truth & (a == c)))
        fn = int(np.sum(truth) - tp)
        fp = int(np.sum(pred & (a != c)))
        pairs[key] = PairScore(tp, fn, fp)
    return AlignmentScore(pairs)
