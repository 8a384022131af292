"""Sum-of-pairs scoring of gapped alignments.

computeSPScore / computeMatchScores / computeGapScores equivalents
(reference call sites src/repeatoire.cpp:2511-2536, src/evd.cpp:29-31),
vectorized over alignment columns.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from mauvealigner_tpu.core.interval import Interval
from mauvealigner_tpu.genome.sequence import Genome
from mauvealigner_tpu.ops import dp


def interval_column_codes(iv: Interval, genomes: Sequence[Genome]) -> np.ndarray:
    """[n_seqs, n_cols] int8 codes in match-space orientation; 5 = gap/absent."""
    out = np.full((iv.n_seqs, iv.n_cols), 5, np.int8)
    for s in range(iv.n_seqs):
        if iv.starts[s] == 0:
            continue
        length = int(iv.aln[s].sum())
        codes = genomes[s].sub_codes_signed(int(iv.starts[s]), length)
        out[s, iv.aln[s]] = np.minimum(codes, 4)
    return out


def match_and_gap_scores(
    col_codes: np.ndarray,
    subst: np.ndarray = dp.HOXD70,
    gap_open: float = dp.DEFAULT_GAP_OPEN,
    gap_extend: float = dp.DEFAULT_GAP_EXTEND,
) -> Tuple[float, float]:
    """(substitution score, gap score) summed over all sequence pairs."""
    k = col_codes.shape[0]
    match_score = 0.0
    gap_score = 0.0
    for i in range(k):
        for j in range(i + 1, k):
            a, b = col_codes[i], col_codes[j]
            both = (a < 5) & (b < 5)
            if both.any():
                match_score += float(subst[a[both], b[both]].sum())
            gap = ((a == 5) ^ (b == 5)) & ((a < 5) | (b < 5))
            if gap.any():
                d = np.diff(np.concatenate([[0], gap.view(np.int8), [0]]))
                n_runs = int((d == 1).sum())
                gap_score += n_runs * gap_open + int(gap.sum()) * gap_extend
    return match_score, gap_score


def compute_sp_score(
    iv: Interval,
    genomes: Sequence[Genome],
    subst: np.ndarray = dp.HOXD70,
    gap_open: float = dp.DEFAULT_GAP_OPEN,
    gap_extend: float = dp.DEFAULT_GAP_EXTEND,
) -> float:
    m, g = match_and_gap_scores(interval_column_codes(iv, genomes), subst, gap_open, gap_extend)
    return m + g
