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
    """(substitution score, gap score) summed over all sequence pairs.

    The pairwise substitution sum is vectorized over columns via symbol
    counts: (m^T S m - sum_c n_c S_cc)/2 per column.  Gap-run opens are
    counted per sequence pair over the PAIRWISE PROJECTION (both-gap
    columns removed, so a run continues across them) — an O(k^2) loop over
    pairs, each O(T) vectorized.  Gap extensions reduce to the per-column
    count product n_gap*n_base (both-gap pairs contribute nothing, matching
    the projection).
    """
    k, T = col_codes.shape
    if T == 0 or k < 2:
        return 0.0, 0.0
    S5 = np.asarray(subst, dtype=np.float64)
    counts = np.zeros((5, T), np.int64)
    for c in range(5):
        counts[c] = (col_codes == c).sum(axis=0)
    term1 = np.einsum("ct,cd,dt->t", counts, S5, counts)
    term2 = np.einsum("ct,c->t", counts, np.diag(S5))
    match_score = float(((term1 - term2) / 2).sum())

    gapped = col_codes == 5
    n_gap = gapped.sum(axis=0)
    n_base = k - n_gap
    gap_positions = int((n_gap * n_base).sum())
    # gap-run starts per ordered pair, with both-gap columns projected out
    # (the pairwise projection the reference scores): a gap run of x against
    # y continues across columns where y is also gapped
    run_starts = 0
    for i in range(k):
        gi = gapped[i]
        for j in range(i + 1, k):
            gj = gapped[j]
            keep = ~(gi & gj)
            for g in (gi[keep], gj[keep]):
                if not g.any():
                    continue
                starts = g.copy()
                starts[1:] &= ~g[:-1]
                run_starts += int(starts.sum())
    gap_score = run_starts * gap_open + gap_positions * gap_extend
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
